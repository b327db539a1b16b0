"""Head decode: anchors, distribution-focal-loss box regression, level
flattening — the arithmetic between raw head maps and (boxes, scores, masks).

Same decode law as the Ultralytics inference path (anchor points at cell
centers + 0.5, 16-bin DFL softmax expectation, lt/rb distances scaled by
stride), implemented as pure jnp so it lives inside the single fused
frame program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_anchors(shapes, strides, offset: float = 0.5):
    """Anchor cell centers for each level.

    shapes: list of (H, W); strides: matching list. Returns
    ``(anchors (A, 2) xy in feature units, stride_per_anchor (A,))``.
    """
    pts, sts = [], []
    for (h, w), s in zip(shapes, strides):
        xs = (jnp.arange(w, dtype=jnp.float32) + offset)
        ys = (jnp.arange(h, dtype=jnp.float32) + offset)
        gx, gy = jnp.meshgrid(xs, ys)
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        sts.append(jnp.full((h * w,), float(s), jnp.float32))
    return jnp.concatenate(pts, axis=0), jnp.concatenate(sts, axis=0)


def dfl_expectation(box_raw: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """(..., 4*reg_max) logits -> (..., 4) expected distances via softmax
    expectation over the bin distribution (the inference-time DFL conv)."""
    shape = box_raw.shape[:-1]
    x = box_raw.reshape(*shape, 4, reg_max)
    p = jax.nn.softmax(x, axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)


def dist2bbox(dist: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """(l, t, r, b) distances + anchor centers -> xyxy (feature units)."""
    lt = dist[..., :2]
    rb = dist[..., 2:]
    x1y1 = anchors - lt
    x2y2 = anchors + rb
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(bbox_xyxy: jnp.ndarray, anchors: jnp.ndarray, reg_max: int = 16):
    """Inverse mapping for training targets, clamped to the bin range."""
    lt = anchors - bbox_xyxy[..., :2]
    rb = bbox_xyxy[..., 2:] - anchors
    return jnp.clip(jnp.concatenate([lt, rb], axis=-1), 0.0, reg_max - 1 - 0.01)


def flatten_levels(per_level: tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """Tuple of (B, H, W, C) -> (B, sum(H*W), C), level-major (stride 8 first),
    row-major within each level — the anchor ordering of make_anchors."""
    return jnp.concatenate(
        [x.reshape(x.shape[0], -1, x.shape[-1]) for x in per_level], axis=1
    )


def decode_boxes(raw: dict, strides=(8, 16, 32), reg_max: int = 16):
    """Raw head outputs -> (boxes_xyxy_px (B, A, 4), cls_prob (B, A, nc),
    mask_coeffs (B, A, nm))."""
    shapes = [x.shape[1:3] for x in raw["box"]]
    anchors, stride_pa = make_anchors(shapes, strides)
    box_flat = flatten_levels(raw["box"])
    dist = dfl_expectation(box_flat, reg_max)
    boxes = dist2bbox(dist, anchors[None]) * stride_pa[None, :, None]
    cls = jax.nn.sigmoid(flatten_levels(raw["cls"]))
    mc = flatten_levels(raw["mc"])
    return boxes, cls, mc
