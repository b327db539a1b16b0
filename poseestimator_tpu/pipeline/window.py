"""Object-window rasterization: render/score only the object's neighborhood.

The predicted-view instrument (``render.raster.render_depth_mesh``) costs
tiles x faces; the tracked object typically covers a small fraction of the
frame, so rasterizing a fixed-size window that tracks the object cuts the
per-frame raster (and the downstream backproject/sample pools) several-fold
with NO change to the rendered depth inside the window (the raster's
``origin``/``out_hw`` support folds the shift into the face coefficients —
tests/test_raster.py::test_window_matches_full_crop). Matches the reference's
render-at-pose usage, which only ever needs the object's neighborhood
(EstimHelpers/PoseEstimator.py:118-140).

Window semantics (all STATIC shapes, jit-stable):
  - ``win_hw`` config: ``"auto"`` (window at product resolutions where the
    frame is >= 4x the default window area; full frame on tiny test
    cameras), ``None`` (always full frame), or an explicit ``(h, w)`` tuple
    (always windowed, clamped to the frame).
  - The window ORIGIN is dynamic: the projected bbox center of the CAD's
    vertices at the current pose, clamped so the window stays inside the
    frame. Predicted silhouettes larger than the window crop at the window
    edge (same failure shape as the frame edge); the default window is sized
    for objects up to ~2x the bench scene's projected extent.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geom3d.camera import Intrinsics
from ..geom3d.se3 import transform_points

# default (H, W) window at the HALF-RES render/scoring view (the tracking
# step's render_downscale=2 resolution): 256x256 full-res pixels around the
# object — 4 pallas tiles instead of 24 at 640x480
TRACK_WIN = (128, 128)


def window_dims(intr_r: Intrinsics, win_hw, default=TRACK_WIN):
    """Resolve the STATIC window config against a render-resolution camera.

    Returns ``(wh, ww)`` or ``None`` (= render the full frame). ``"auto"``
    enables the default window only when it buys >= 4x fewer pixels.
    """
    if win_hw is None:
        return None
    if win_hw == "auto":
        wh = min(default[0], intr_r.height)
        ww = min(default[1], intr_r.width)
        if intr_r.height * intr_r.width >= 4 * wh * ww:
            return (wh, ww)
        return None
    wh = min(int(win_hw[0]), intr_r.height)
    ww = min(int(win_hw[1]), intr_r.width)
    return (wh, ww)


def window_for_object(intr_r: Intrinsics, diag_m: float, z_m: float,
                      margin: float = 1.3, quantum: int = 64):
    """STATIC window bucket sized to an object of diameter ``diag_m`` at
    distance ``z_m`` — the product way to choose ``win_hw``.

    A fixed window silently CROPS objects that project larger than it, and
    the crop removes exactly the silhouette extremities that carry the
    rotational signal (measured: the 0.95 m eval L-shape projects ~138 px
    at the half-res view; a 128 px window degraded dense tracking ADD-S
    0.26 -> 0.63 cm). The required size is ``margin * f * diag / z``,
    rounded UP to coarse quanta (height to ``quantum``, width to the
    128-lane tile) so the jit cache sees a handful of shapes as distance
    varies; callers re-bucket at init / large distance changes, not per
    frame. Returns None (full frame) when the window would not save at
    least ~30% of the frame.
    """
    f = max(intr_r.fx, intr_r.fy)
    req = margin * f * float(diag_m) / max(float(z_m), 1e-3)
    h = int(min(-(-req // quantum) * quantum, intr_r.height))
    w = int(min(-(-req // 128) * 128, intr_r.width))
    h = max(h, 32)
    w = max(w, 128)
    if h * w >= 0.7 * intr_r.height * intr_r.width:
        return None
    return (h, w)


def merge_windows(wins):
    """Combine per-track window buckets into one batched-program bucket:
    the elementwise max; any None (full frame) dominates."""
    out = (0, 0)
    for w in wins:
        if w is None:
            return None
        out = (max(out[0], w[0]), max(out[1], w[1]))
    return out if out != (0, 0) else None


def window_origin(verts: jnp.ndarray, T_m2c: jnp.ndarray, intr_r: Intrinsics,
                  wh: int, ww: int) -> jnp.ndarray:
    """Integer (2,) ``[ox, oy]`` window origin at the render resolution: the
    projected vertex-bbox center of the CAD at ``T_m2c``, clamped so the
    ``(wh, ww)`` window lies inside the frame. Falls back to the frame center
    when no vertex is in front of the camera (the render is empty there
    anyway)."""
    vc = transform_points(T_m2c, verts)
    z = vc[:, 2]
    ok = z > 1e-3
    zs = jnp.where(ok, z, 1.0)
    u = intr_r.fx * vc[:, 0] / zs + intr_r.cx
    v = intr_r.fy * vc[:, 1] / zs + intr_r.cy
    big = jnp.float32(1e9)
    umin = jnp.min(jnp.where(ok, u, big))
    umax = jnp.max(jnp.where(ok, u, -big))
    vmin = jnp.min(jnp.where(ok, v, big))
    vmax = jnp.max(jnp.where(ok, v, -big))
    any_ok = jnp.any(ok)
    cu = jnp.where(any_ok, 0.5 * (umin + umax), intr_r.cx)
    cv = jnp.where(any_ok, 0.5 * (vmin + vmax), intr_r.cy)
    ox = jnp.clip(jnp.round(cu - ww / 2), 0, intr_r.width - ww)
    oy = jnp.clip(jnp.round(cv - wh / 2), 0, intr_r.height - wh)
    return jnp.stack([ox, oy]).astype(jnp.int32)
