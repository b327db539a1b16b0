"""Closed-form ray-cast depth camera — an observation instrument with NO
shared code with the render stack.

The tracker predicts views through ``render.raster`` and the synthetic
evals observe through the same rasterizer (``SyntheticCamera(mesh=...)``);
a shared convention bug (pixel-center, 1/z interpolation, near-plane
handling) would cancel end-to-end and be invisible to every accuracy gate
(VERDICT r4 missing-3). This module computes depth analytically in numpy —
per-pixel ray / axis-aligned-box (slab) intersection, exact up to fp — so
``tools/eval_tracking.py --observation analytic`` scores the whole pipeline
against an instrument that shares nothing with the code under test. The
reference's analog is externally captured BOP data (main_image.py:98-134).

Convention (must match ``geom3d.backproject_depth``): pixel (u, v) samples
the ray through ((u - cx)/fx, (v - cy)/fy, 1); ``depth`` is the camera-z of
the first hit, which equals the ray parameter t for that direction scaling.
"""
from __future__ import annotations

import numpy as np

from ..geom3d.camera import Intrinsics


def raycast_boxes_depth(intr: Intrinsics, T_m2c: np.ndarray,
                        boxes) -> np.ndarray:
    """(H, W) float32 depth of a union of axis-aligned MODEL-frame boxes
    under pose ``T_m2c``. ``boxes``: iterable of ``(center (3,), half (3,))``
    in the model frame. Zero where no box is hit.
    """
    T = np.asarray(T_m2c, np.float64)
    R, t = T[:3, :3], T[:3, 3]
    H, W = intr.height, intr.width
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    dirs_c = np.stack([(u - intr.cx) / intr.fx,
                       (v - intr.cy) / intr.fy,
                       np.ones_like(u)], axis=-1)  # (H, W, 3), z-normalized
    # camera ray -> model frame: p_m(t) = R^T (t * d_c - t_vec)
    o_m = -R.T @ t  # (3,)
    d_m = dirs_c @ R  # (H, W, 3)  == R^T applied to each direction

    depth = np.full((H, W), np.inf)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_d = 1.0 / d_m  # inf where parallel to a slab — handled below
        for center, half in boxes:
            lo = np.asarray(center, np.float64) - np.asarray(half, np.float64)
            hi = np.asarray(center, np.float64) + np.asarray(half, np.float64)
            t1 = (lo - o_m) * inv_d
            t2 = (hi - o_m) * inv_d
            # parallel rays (d ~ 0): inside the slab -> (-inf, +inf),
            # outside -> empty. The inf arithmetic of t1/t2 produces exactly
            # that once min/max are taken, EXCEPT the 0 * inf = nan case at
            # d == 0 with o on a slab face; nan-max/min resolve it safely.
            t_near = np.nanmax(np.minimum(t1, t2), axis=-1)
            t_far = np.nanmin(np.maximum(t1, t2), axis=-1)
            hit = (t_far >= t_near) & (t_far > 1e-9)
            t_enter = np.where(t_near > 1e-9, t_near, t_far)
            depth = np.where(hit, np.minimum(depth, t_enter), depth)
    return np.where(np.isfinite(depth), depth, 0.0).astype(np.float32)


def l_shape_boxes(scale: float = 1.0):
    """The analytic twin of ``tests/helpers.l_shape_mesh``: two fused
    axis-aligned boxes (full extents 0.6 x 0.2 x 0.2 at the origin and
    0.2 x 0.4 x 0.2 at (-0.2, 0.3, 0)), scaled by ``scale``."""
    s = float(scale)
    return [
        (np.array([0.0, 0.0, 0.0]) * s, np.array([0.3, 0.1, 0.1]) * s),
        (np.array([-0.2, 0.3, 0.0]) * s, np.array([0.1, 0.2, 0.1]) * s),
    ]


def make_lshape_raycaster(intr: Intrinsics, scale: float = 1.0):
    """``depth_fn`` for ``SyntheticCamera``: T_m2c -> (H, W) analytic depth
    of the eval L-shape."""
    boxes = l_shape_boxes(scale)

    def depth_fn(T_m2c: np.ndarray) -> np.ndarray:
        return raycast_boxes_depth(intr, T_m2c, boxes)

    return depth_fn
