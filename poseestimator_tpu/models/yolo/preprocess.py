"""Letterbox preprocessing (Ultralytics inference contract): resize keeping
aspect ratio into a fixed square canvas, pad with 114-gray, normalize to
[0, 1]. Static output shape so the detect program compiles once.

Also the inverse mapping to carry boxes/masks back to original image pixels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LetterboxMeta:
    scale: jnp.ndarray  # ()
    pad_x: jnp.ndarray  # ()
    pad_y: jnp.ndarray  # ()
    orig_h: int = struct.field(pytree_node=False, default=0)
    orig_w: int = struct.field(pytree_node=False, default=0)


@partial(jax.jit, static_argnames=("size",))
def letterbox(img: jnp.ndarray, size: int = 640):
    """(H, W, 3) uint8/float BGR or RGB -> ((size, size, 3) float32 in [0,1],
    LetterboxMeta). Image is centered with symmetric padding (value 114)."""
    h, w = img.shape[:2]
    img = img.astype(jnp.float32)
    scale = jnp.minimum(size / h, size / w)
    new_h = jnp.round(h * scale).astype(jnp.int32)
    new_w = jnp.round(w * scale).astype(jnp.int32)

    # resize with jax.image at the static max shape, then shift into place:
    # compute source coordinates per output pixel (nearest-exact bilinear)
    pad_y = (size - new_h) // 2
    pad_x = (size - new_w) // 2
    ys = (jnp.arange(size, dtype=jnp.float32) - pad_y + 0.5) / scale - 0.5
    xs = (jnp.arange(size, dtype=jnp.float32) - pad_x + 0.5) / scale - 0.5
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :, None]

    g = img[y0][:, x0] * (1 - wy) * (1 - wx) \
        + img[y0][:, x1] * (1 - wy) * wx \
        + img[y1][:, x0] * wy * (1 - wx) \
        + img[y1][:, x1] * wy * wx

    in_y = (jnp.arange(size) >= pad_y) & (jnp.arange(size) < pad_y + new_h)
    in_x = (jnp.arange(size) >= pad_x) & (jnp.arange(size) < pad_x + new_w)
    inside = in_y[:, None] & in_x[None, :]
    out = jnp.where(inside[..., None], g, 114.0) / 255.0
    meta = LetterboxMeta(
        scale=scale, pad_x=pad_x.astype(jnp.float32), pad_y=pad_y.astype(jnp.float32),
        orig_h=h, orig_w=w,
    )
    return out, meta


def boxes_to_original(boxes_xyxy: jnp.ndarray, meta: LetterboxMeta) -> jnp.ndarray:
    """Map letterboxed-pixel boxes back to original image pixels (clipped)."""
    x1 = (boxes_xyxy[..., 0] - meta.pad_x) / meta.scale
    y1 = (boxes_xyxy[..., 1] - meta.pad_y) / meta.scale
    x2 = (boxes_xyxy[..., 2] - meta.pad_x) / meta.scale
    y2 = (boxes_xyxy[..., 3] - meta.pad_y) / meta.scale
    return jnp.stack(
        [
            jnp.clip(x1, 0, meta.orig_w),
            jnp.clip(y1, 0, meta.orig_h),
            jnp.clip(x2, 0, meta.orig_w),
            jnp.clip(y2, 0, meta.orig_h),
        ],
        axis=-1,
    )
