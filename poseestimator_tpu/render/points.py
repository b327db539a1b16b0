"""Point-splat z-buffer depth rendering — the TPU-native replacement for the
Filament ``OffscreenRenderer`` depth path.

The reference renders the CAD mesh with a GPU graphics engine and consumes
only the depth image geometrically (PoseEstimator.py:118-140,
template_creation.py:215-233; SURVEY.md section 2.2 notes color is carried but
unused). Here the CAD surface is presampled densely once; each render is then
a pure device program: rigid transform -> pinhole projection -> scatter-min
z-buffer with a small pixel splat (hidden-point removal falls out of the
min-z semantics). No graphics stack, no host round-trip, jit-able inside the
tracking frame program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geom3d.camera import Intrinsics
from ..geom3d.se3 import transform_points

_INF = jnp.float32(1e30)


@partial(jax.jit, static_argnames=("intr", "splat"))
def render_depth(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    T_m2c: jnp.ndarray,
    intr: Intrinsics,
    near: float = 0.001,
    far: float = 100.0,
    splat: int = 1,
) -> jnp.ndarray:
    """Render presampled surface points to a (H, W) linear depth image.

    ``splat`` is the half-width in pixels of the square each point covers
    (1 -> 3x3): dense-enough sampling plus a small splat closes inter-sample
    holes so background points cannot leak through surfaces.
    Pixels with no coverage are 0 (the convention of the depth images the
    pipeline back-projects).
    """
    H, W = intr.height, intr.width
    cam = transform_points(T_m2c, points)
    z = cam[:, 2]
    ok = valid & (z > near) & (z < far)
    zs = jnp.where(ok, z, 1.0)
    u = jnp.round(intr.fx * cam[:, 0] / zs + intr.cx).astype(jnp.int32)
    v = jnp.round(intr.fy * cam[:, 1] / zs + intr.cy).astype(jnp.int32)

    zbuf = jnp.full((H * W + 1,), _INF)
    for du in range(-splat, splat + 1):
        for dv in range(-splat, splat + 1):
            ui = u + du
            vi = v + dv
            in_img = ok & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
            flat = jnp.where(in_img, vi * W + ui, H * W)  # spill slot
            zbuf = zbuf.at[flat].min(jnp.where(in_img, z, _INF))
    depth = zbuf[: H * W].reshape(H, W)
    return jnp.where(depth >= _INF * 0.5, 0.0, depth)


@partial(jax.jit, static_argnames=("intr", "splat"))
def vsd_metric(
    T_est: jnp.ndarray,
    T_gt: jnp.ndarray,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    intr: Intrinsics,
    tau: float = 0.02,
    scene_depth: jnp.ndarray | None = None,
    delta: float = 0.015,
    splat: int = 1,
    near: float = 0.001,
    far: float = 100.0,
) -> jnp.ndarray:
    """VSD: visible surface discrepancy (BOP challenge, Hodan et al. ECCV
    2020) — completes the BOP metric triad next to geom3d's MSSD/MSPD.

    Renders the presampled CAD surface at the estimated and ground-truth
    poses and averages a step cost over the union of their visibility masks:
    a pixel costs 1 if only one render covers it or their depths differ by
    more than ``tau`` (meters). With ``scene_depth`` (the real scene's depth
    image), visibility is occlusion-aware: a pixel counts as visible only
    where the object surface lies within ``delta`` of (or in front of) the
    measured scene surface — the BOP visibility test. Returns a scalar in
    [0, 1]; 0 when the object is invisible in both poses.
    """
    return vsd_multi_tau(
        T_est, T_gt, points, valid, intr, jnp.asarray([tau], jnp.float32),
        scene_depth=scene_depth, delta=delta, splat=splat, near=near, far=far,
    )[0]


@partial(jax.jit, static_argnames=("intr", "splat"))
def vsd_multi_tau(
    T_est: jnp.ndarray,
    T_gt: jnp.ndarray,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    intr: Intrinsics,
    taus: jnp.ndarray,
    scene_depth: jnp.ndarray | None = None,
    delta: float = 0.015,
    splat: int = 1,
    near: float = 0.001,
    far: float = 100.0,
) -> jnp.ndarray:
    """VSD at several misalignment tolerances from ONE render pair.

    ``near``/``far`` follow the caller's length unit (meters in the live
    pipeline; pass mm-scale clips for BOP mm-convention models).

    The BOP19 Average Recall sweeps tau over 5%..50% of the object diameter
    (Hodan et al. ECCV 2020, eq. 2); the two depth renders do not depend on
    tau, so evaluating the whole sweep costs one render pair plus a cheap
    per-tau step-cost reduction. ``taus``: (T,) tolerances in meters.
    Returns (T,) VSD values in [0, 1].
    """
    d_e = render_depth(points, valid, T_est, intr, near=near, far=far, splat=splat)
    d_g = render_depth(points, valid, T_gt, intr, near=near, far=far, splat=splat)
    v_e = d_e > 0.0
    v_g = d_g > 0.0
    if scene_depth is not None:
        measured = scene_depth > 0.0
        v_e &= ~measured | (d_e <= scene_depth + delta)
        v_g &= ~measured | (d_g <= scene_depth + delta)
    union = v_e | v_g
    inter = v_e & v_g
    gap = jnp.abs(d_e - d_g)[None]  # (1, H, W) vs taus (T, 1, 1)
    mismatch = jnp.where(inter[None], gap > taus[:, None, None], 1.0)
    n = jnp.sum(union.astype(jnp.float32))
    total = jnp.sum(jnp.where(union[None], mismatch, 0.0), axis=(1, 2))
    return jnp.where(n > 0, total / jnp.maximum(n, 1.0), 0.0)


@partial(jax.jit, static_argnames=("intr", "splat"))
def render_shaded(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    valid: jnp.ndarray,
    T_m2c: jnp.ndarray,
    intr: Intrinsics,
    base_color=(0.0, 0.0, 1.0),
    near: float = 0.001,
    far: float = 100.0,
    splat: int = 1,
):
    """Depth + a simple head-light Lambertian color image.

    The color render only feeds the PNG artifacts the reference writes next to
    each template (template_creation.py:224-226); all geometry consumes depth.
    Returns (depth (H, W), rgb (H, W, 3) float32 in [0,1], white background).
    """
    H, W = intr.height, intr.width
    depth = render_depth(points, valid, T_m2c, intr, near, far, splat)

    cam = transform_points(T_m2c, points)
    z = cam[:, 2]
    ok = valid & (z > near) & (z < far)
    zs = jnp.where(ok, z, 1.0)
    u = jnp.round(intr.fx * cam[:, 0] / zs + intr.cx).astype(jnp.int32)
    v = jnp.round(intr.fy * cam[:, 1] / zs + intr.cy).astype(jnp.int32)
    in_img = ok & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    flat = jnp.where(in_img, v * W + u, H * W)

    # second pass: points that won (or nearly won) the z-buffer write shading
    won = in_img & (z <= depth.reshape(-1)[jnp.clip(flat, 0, H * W - 1)] + 1e-4)
    n_cam = normals @ T_m2c[:3, :3].T
    lambert = jnp.clip(-n_cam[:, 2], 0.15, 1.0)  # headlight along +z view dir
    shade = jnp.where(won, lambert, 0.0)
    base = jnp.asarray(base_color, jnp.float32)

    img = jnp.ones((H * W + 1, 3))
    img = img.at[jnp.where(won, flat, H * W)].set(shade[:, None] * base[None, :])
    return depth, img[: H * W].reshape(H, W, 3)
