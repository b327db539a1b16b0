"""YOLO11 building blocks in flax.linen, NHWC (TPU-native layout).

The reference delegates all detection compute to Ultralytics/PyTorch (SURVEY.md
section 2.2: Detector.py:35, train.py:3). This package re-provides the YOLO11
architecture natively. Module structure and hyperparameters follow the public
YOLO11 architecture (conv->BN->SiLU blocks, C3k2 cross-stage partials, SPPF,
C2PSA attention); parameter naming mirrors the Ultralytics state_dict layout
(``model.{i}.{...}``) so trained ``.pt`` checkpoints import losslessly
(weights.py).

Convolutions carry ``dtype=bfloat16``-capable annotations but default to f32;
XLA fuses the BN scale/shift and SiLU into the conv epilogue, so no manual
folding is needed for speed.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBNAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm(eps 1e-3, momentum 0.03) + SiLU.

    Mirrors Ultralytics ``Conv``; param names ``conv``/``bn`` match its
    state_dict children.
    """

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        # computation dtype follows the block (param_dtype stays f32): an
        # f32-pinned BN between bf16 convs inserts up/down casts at every
        # block boundary and breaks conv-epilogue fusion (measured on v5e:
        # bf16 serving 940 vs 920 imgs/s at batch 32 with BN in block dtype)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class Bottleneck(nn.Module):
    """Two convs with optional residual (Ultralytics ``Bottleneck``)."""

    features: int
    shortcut: bool = True
    kernels: tuple[int, int] = (3, 3)
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.expansion)
        y = ConvBNAct(c_, self.kernels[0], dtype=self.dtype, name="cv1")(x, train)
        y = ConvBNAct(self.features, self.kernels[1], dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C3k(nn.Module):
    """CSP bottleneck with 3 convs and a k-kernel bottleneck chain
    (Ultralytics ``C3k``, a ``C3`` with n inner Bottleneck(k,k, e=1.0))."""

    features: int
    n: int = 2
    shortcut: bool = True
    expansion: float = 0.5
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.expansion)
        a = ConvBNAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBNAct(c_, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                c_, self.shortcut, (self.kernel, self.kernel), 1.0,
                dtype=self.dtype, name=f"m_{i}",
            )(a, train)
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k2(nn.Module):
    """Ultralytics ``C3k2`` (a ``C2f`` whose inner blocks are C3k or
    Bottleneck): split after cv1, chain n blocks on the moving half, concat
    everything into cv2."""

    features: int
    n: int = 1
    c3k: bool = False
    expansion: float = 0.5
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.expansion)
        y = ConvBNAct(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                nxt = C3k(c, 2, self.shortcut, dtype=self.dtype, name=f"m_{i}")(
                    parts[-1], train
                )
            else:
                nxt = Bottleneck(
                    c, self.shortcut, (3, 3), 0.5, dtype=self.dtype, name=f"m_{i}"
                )(parts[-1], train)
            parts.append(nxt)
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 cascaded 5x5 max-pools."""

    features: int
    pool: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBNAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.pool // 2
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (self.pool, self.pool), strides=(1, 1),
                    padding=((p, p), (p, p)),
                )
            )
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


class Attention(nn.Module):
    """Position-sensitive multi-head attention over the spatial map
    (Ultralytics ``Attention`` inside C2PSA)."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        head_dim = C // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        h = C + 2 * key_dim * self.num_heads

        qkv = ConvBNAct(h, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        N = H * W
        qkv = qkv.reshape(B, N, self.num_heads, 2 * key_dim + head_dim)
        q = qkv[..., :key_dim]
        k = qkv[..., key_dim : 2 * key_dim]
        v = qkv[..., 2 * key_dim :]

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, C)
        pe = ConvBNAct(
            C, 3, groups=C, act=False, dtype=self.dtype, name="pe"
        )(v.reshape(B, H, W, C), train)
        out = out + pe
        return ConvBNAct(C, 1, act=False, dtype=self.dtype, name="proj")(out, train)


class PSABlock(nn.Module):
    """Attention + 2-conv FFN, both residual."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(x, train)
        y = ConvBNAct(self.dim * 2, 1, dtype=self.dtype, name="ffn_0")(x, train)
        y = ConvBNAct(self.dim, 1, act=False, dtype=self.dtype, name="ffn_1")(y, train)
        return x + y


class C2PSA(nn.Module):
    """Cross-stage partial with PSA attention blocks (Ultralytics ``C2PSA``)."""

    features: int
    n: int = 1
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.expansion)
        y = ConvBNAct(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        heads = max(c // 64, 1)
        for i in range(self.n):
            b = PSABlock(c, heads, dtype=self.dtype, name=f"m_{i}")(b, train)
        return ConvBNAct(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (NHWC)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)
