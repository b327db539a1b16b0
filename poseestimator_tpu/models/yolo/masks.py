"""Instance mask assembly from prototypes + per-detection coefficients, and
host-side polygon extraction for the ``masks.xy`` API surface the reference
consumes (Detector.py:42-52: polygons -> cv2.fillPoly binary masks).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .preprocess import LetterboxMeta


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def assemble_masks(
    proto: jnp.ndarray,
    coeffs: jnp.ndarray,
    boxes_letterbox: jnp.ndarray,
    det_valid: jnp.ndarray,
    meta: LetterboxMeta,
    out_h: int,
    out_w: int,
    threshold: float = 0.5,
):
    """proto (Hp, Wp, nm), coeffs (D, nm), boxes (D, 4) in letterbox pixels.

    Returns (D, out_h, out_w) bool masks in the ORIGINAL image frame
    (Ultralytics ``process_mask`` semantics: sigmoid(coef . proto), crop to
    box, upsample, threshold).
    """
    Hp, Wp, nm = proto.shape
    # (D, Hp, Wp) mask logits: one matmul on the MXU
    logits = jnp.einsum("dn,hwn->dhw", coeffs, proto)
    m = jax.nn.sigmoid(logits)

    # sample the proto-res masks at original-image pixel centers:
    # original px -> letterbox px -> proto px (proto is letterbox/4)
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * meta.scale + meta.pad_y
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * meta.scale + meta.pad_x
    py = ys / 4.0
    px = xs / 4.0
    y0 = jnp.clip(jnp.floor(py - 0.5).astype(jnp.int32), 0, Hp - 1)
    x0 = jnp.clip(jnp.floor(px - 0.5).astype(jnp.int32), 0, Wp - 1)
    y1 = jnp.clip(y0 + 1, 0, Hp - 1)
    x1 = jnp.clip(x0 + 1, 0, Wp - 1)
    wy = jnp.clip(py - 0.5 - y0, 0.0, 1.0)
    wx = jnp.clip(px - 0.5 - x0, 0.0, 1.0)

    # separable bilinear resize as two MXU matmuls instead of per-mask
    # gathers: Wy (out_h, Hp) and Wx (out_w, Wp) carry the two interpolation
    # taps per output row/col (at clipped borders y0==y1 the taps collapse
    # onto one index and the weights sum to 1 — identical to the gather
    # form). Gather-based upsampling of D full-res masks runs on the vector
    # unit; this form is ~1.6 GMAC of matmul, noise on the MXU.
    Wy = (1.0 - wy)[:, None] * jax.nn.one_hot(y0, Hp, dtype=m.dtype) \
        + wy[:, None] * jax.nn.one_hot(y1, Hp, dtype=m.dtype)
    Wx = (1.0 - wx)[:, None] * jax.nn.one_hot(x0, Wp, dtype=m.dtype) \
        + wx[:, None] * jax.nn.one_hot(x1, Wp, dtype=m.dtype)
    hp = jax.lax.Precision.HIGHEST  # mask values straddle the 0.5 threshold
    up = jnp.einsum("dhw,Hh->dHw", m, Wy, precision=hp)
    up = jnp.einsum("dHw,Ww->dHW", up, Wx, precision=hp)  # (D, out_h, out_w)

    # crop to each detection's box (in original-image pixels)
    bx = (boxes_letterbox - jnp.stack([meta.pad_x, meta.pad_y, meta.pad_x, meta.pad_y])) / meta.scale
    gx = jnp.arange(out_w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(out_h, dtype=jnp.float32)[None, :, None]
    inside = (
        (gx >= bx[:, 0, None, None])
        & (gx <= bx[:, 2, None, None])
        & (gy >= bx[:, 1, None, None])
        & (gy <= bx[:, 3, None, None])
    )
    return (up > threshold) & inside & det_valid[:, None, None]


def masks_to_polygons(mask: np.ndarray) -> list[np.ndarray]:
    """Binary (H, W) mask -> list of (K, 2) float32 polygons (largest-first).

    Host-side, mirroring how Ultralytics produces ``masks.xy`` (external
    contours of the thresholded mask).
    """
    import cv2

    m = (np.asarray(mask) > 0).astype(np.uint8)
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    polys = [c.reshape(-1, 2).astype(np.float32) for c in contours if len(c) >= 3]
    polys.sort(key=lambda p: -cv2.contourArea(p))
    return polys


def polygon_to_mask(poly: np.ndarray, h: int, w: int) -> np.ndarray:
    """Filled polygon -> (H, W) uint8 {0, 255} mask (Detector.py:48-52 parity)."""
    import cv2

    out = np.zeros((h, w), np.uint8)
    if len(poly) >= 3:
        cv2.fillPoly(out, [np.asarray(poly, np.int32)], 255)
    return out
