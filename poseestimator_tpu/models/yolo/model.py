"""YOLO11 segmentation model (backbone + PAN-FPN neck + decoupled
detect/segment head) in flax.linen, NHWC.

Graph parity with the public YOLO11 architecture at any compound scale
(n/s/m/l/x); the reference uses ``yolo11n-seg`` (train.py:3). Layer indices
``m0..m23`` mirror the Ultralytics ``model.{i}`` numbering so its state_dict
imports 1:1 (see weights.py).

Returns raw per-level head outputs (training) plus the mask prototypes; the
DFL/box decode lives in decode.py so the same graph serves train and predict.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import C2PSA, C3k2, ConvBNAct, SPPF, upsample2x

SCALES = {
    # depth, width, max_channels
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


class DetectBranchBox(nn.Module):
    """Detect box branch: Conv3 -> Conv3 -> 1x1 conv to 4*reg_max.

    Output bias initialized to 1.0 (the upstream Detect.bias_init trick:
    start boxes at ~1-cell distances for stable early training)."""

    mid: int
    reg_max: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBNAct(self.mid, 3, dtype=self.dtype, name="b0")(x, train)
        x = ConvBNAct(self.mid, 3, dtype=self.dtype, name="b1")(x, train)
        return nn.Conv(
            4 * self.reg_max, (1, 1), dtype=self.dtype, name="b2",
            bias_init=nn.initializers.constant(1.0),
        )(x)


class DetectBranchCls(nn.Module):
    """Detect class branch (YOLO11 non-legacy): (DWConv3, Conv1) x2 -> 1x1.

    Class bias initialized to log(5 / nc / (640/stride)^2) — the upstream
    prior of ~5 objects per 640px image, so early sigmoid scores start near
    the true positive rate instead of 0.5 (large spurious cls loss)."""

    mid: int
    nc: int
    stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c_in = x.shape[-1]
        x = ConvBNAct(c_in, 3, groups=c_in, dtype=self.dtype, name="c0_0")(x, train)
        x = ConvBNAct(self.mid, 1, dtype=self.dtype, name="c0_1")(x, train)
        x = ConvBNAct(self.mid, 3, groups=self.mid, dtype=self.dtype, name="c1_0")(x, train)
        x = ConvBNAct(self.mid, 1, dtype=self.dtype, name="c1_1")(x, train)
        import math

        prior = math.log(5.0 / self.nc / (640.0 / self.stride) ** 2)
        return nn.Conv(
            self.nc, (1, 1), dtype=self.dtype, name="c2",
            bias_init=nn.initializers.constant(prior),
        )(x)


class MaskCoeffBranch(nn.Module):
    """Segment mask-coefficient branch: Conv3 -> Conv3 -> 1x1 to nm."""

    mid: int
    nm: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBNAct(self.mid, 3, dtype=self.dtype, name="m0")(x, train)
        x = ConvBNAct(self.mid, 3, dtype=self.dtype, name="m1")(x, train)
        return nn.Conv(self.nm, (1, 1), dtype=self.dtype, name="m2")(x)


class Proto(nn.Module):
    """Mask prototype head: Conv3 -> 2x deconv -> Conv3 -> 1x1 to nm."""

    mid: int
    nm: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBNAct(self.mid, 3, dtype=self.dtype, name="cv1")(x, train)
        x = nn.ConvTranspose(
            self.mid, (2, 2), strides=(2, 2), dtype=self.dtype, name="upsample"
        )(x)
        x = ConvBNAct(self.mid, 3, dtype=self.dtype, name="cv2")(x, train)
        return ConvBNAct(self.nm, 1, dtype=self.dtype, name="cv3")(x, train)


class YOLO11Seg(nn.Module):
    """Full YOLO11-seg graph. ``__call__`` maps a letterboxed NHWC image batch
    to per-level raw head outputs + prototypes."""

    nc: int = 80
    scale: str = "n"
    reg_max: int = 16
    nm: int = 32  # mask coefficients
    npr: int = 256  # proto channels before width scaling
    dtype: Any = jnp.float32

    @property
    def strides(self):
        return (8, 16, 32)

    def _c(self, c):
        depth, width, max_ch = SCALES[self.scale]
        return make_divisible(min(c, max_ch) * width)

    def _n(self, n):
        depth, _, _ = SCALES[self.scale]
        return max(round(n * depth), 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self._c
        n = self._n
        dt = self.dtype
        csp_full = self.scale in ("m", "l", "x")  # c3k=True everywhere for m/l/x

        # --- backbone ---
        x = ConvBNAct(c(64), 3, 2, dtype=dt, name="m0")(x, train)  # P1/2
        x = ConvBNAct(c(128), 3, 2, dtype=dt, name="m1")(x, train)  # P2/4
        x = C3k2(c(256), n(2), csp_full, 0.25, dtype=dt, name="m2")(x, train)
        x = ConvBNAct(c(256), 3, 2, dtype=dt, name="m3")(x, train)  # P3/8
        x4 = C3k2(c(512), n(2), csp_full, 0.25, dtype=dt, name="m4")(x, train)
        x = ConvBNAct(c(512), 3, 2, dtype=dt, name="m5")(x4, train)  # P4/16
        x6 = C3k2(c(512), n(2), True, 0.5, dtype=dt, name="m6")(x, train)
        x = ConvBNAct(c(1024), 3, 2, dtype=dt, name="m7")(x6, train)  # P5/32
        x = C3k2(c(1024), n(2), True, 0.5, dtype=dt, name="m8")(x, train)
        x = SPPF(c(1024), 5, dtype=dt, name="m9")(x, train)
        x10 = C2PSA(c(1024), n(2), dtype=dt, name="m10")(x, train)

        # --- neck (PAN-FPN) ---
        x = jnp.concatenate([upsample2x(x10), x6], axis=-1)  # m11+m12
        x13 = C3k2(c(512), n(2), csp_full, 0.5, dtype=dt, name="m13")(x, train)
        x = jnp.concatenate([upsample2x(x13), x4], axis=-1)  # m14+m15
        p3 = C3k2(c(256), n(2), csp_full, 0.5, dtype=dt, name="m16")(x, train)
        x = ConvBNAct(c(256), 3, 2, dtype=dt, name="m17")(p3, train)
        x = jnp.concatenate([x, x13], axis=-1)  # m18
        p4 = C3k2(c(512), n(2), csp_full, 0.5, dtype=dt, name="m19")(x, train)
        x = ConvBNAct(c(512), 3, 2, dtype=dt, name="m20")(p4, train)
        x = jnp.concatenate([x, x10], axis=-1)  # m21
        p5 = C3k2(c(1024), n(2), True, 0.5, dtype=dt, name="m22")(x, train)

        # --- segment head (m23) ---
        feats = (p3, p4, p5)
        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, self.reg_max * 4)
        c3 = max(ch0, min(self.nc, 100))
        c4 = max(ch0 // 4, self.nm)

        boxes, classes, coeffs = [], [], []
        for i, f in enumerate(feats):
            boxes.append(
                DetectBranchBox(c2, self.reg_max, dtype=dt, name=f"m23_cv2_{i}")(f, train)
            )
            classes.append(
                DetectBranchCls(
                    c3, self.nc, stride=self.strides[i], dtype=dt, name=f"m23_cv3_{i}"
                )(f, train)
            )
            coeffs.append(
                MaskCoeffBranch(c4, self.nm, dtype=dt, name=f"m23_cv4_{i}")(f, train)
            )
        proto = Proto(self._c(self.npr), self.nm, dtype=dt, name="m23_proto")(
            feats[0], train
        )

        return {
            "box": tuple(boxes),  # per level (B, H, W, 4*reg_max)
            "cls": tuple(classes),  # per level (B, H, W, nc)
            "mc": tuple(coeffs),  # per level (B, H, W, nm)
            "proto": proto,  # (B, H/4, W/4, nm)
        }
