"""Point sampling: random, farthest-point, and voxel-grid downsampling.

Replaces reference sampling code: true FPS (registration_utils.py:98-128),
random "FPS" (HelpersRealtime.py:47-54), ``sample_n_points``
(template_creation.py:34-51), Open3D ``voxel_down_sample``
(PoseEstimator.py:87,93) and ``voxel_coverage`` (HelpersRealtime.py:108-110).
All fixed-shape and jit-safe.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .cloud import PointCloud

_SENTINEL = jnp.int32(2**30)


def random_sample(key, cloud: PointCloud, n: int) -> PointCloud:
    """Uniform sample of ``n`` valid points without replacement.

    If fewer than ``n`` points are valid, all of them are kept (output mask
    reflects the true count). Matches the semantics of
    ``np.random.choice(len(pts), n, replace=False)`` in the reference.
    ``n`` larger than the cloud capacity clamps to the capacity (the output
    could never hold more valid points anyway).
    """
    n = min(n, cloud.capacity)
    g = jax.random.gumbel(key, (cloud.capacity,))
    score = jnp.where(cloud.valid, g, -jnp.inf)
    if cloud.capacity >= 8 * n:
        # large pools (e.g. full-image back-projections): exact top_k at
        # this k is compile- and runtime-hostile on TPU; the approx_max_k
        # partial-sort unit takes per-bin maxima of the Gumbel scores,
        # which is a stratified uniform sample — exactly what we want
        vals, idx = jax.lax.approx_max_k(score, n)
    else:
        vals, idx = jax.lax.top_k(score, n)
    new_valid = jnp.isfinite(vals)
    take = lambda a: None if a is None else a[idx]
    return PointCloud(
        points=cloud.points[idx],
        valid=new_valid,
        colors=take(cloud.colors),
        normals=take(cloud.normals),
    )


def farthest_point_sampling(key, cloud: PointCloud, n: int) -> PointCloud:
    """True farthest-point sampling (reference registration_utils.py:98-128).

    Sequential by nature; each step is a fully vectorized distance update
    (O(n * N) total, the same asymptotics as the reference's python loop but
    as one fused device program per step under ``lax.fori_loop``).
    Starts from a random valid point, as the reference does.
    """
    pts = cloud.points
    N = cloud.capacity
    # random valid start
    g = jax.random.gumbel(key, (N,))
    first = jnp.argmax(jnp.where(cloud.valid, g, -jnp.inf))

    init_dist = jnp.where(cloud.valid, jnp.inf, -jnp.inf)
    sel0 = jnp.zeros((n,), jnp.int32).at[0].set(first.astype(jnp.int32))

    def body(i, carry):
        sel, dist = carry
        last = pts[sel[i - 1]]
        d = jnp.linalg.norm(pts - last, axis=1)
        dist = jnp.minimum(dist, d)
        nxt = jnp.argmax(dist).astype(jnp.int32)
        dist = dist.at[nxt].set(-jnp.inf)
        sel = sel.at[i].set(nxt)
        return sel, dist

    sel, _ = jax.lax.fori_loop(1, n, body, (sel0, init_dist.at[first].set(-jnp.inf)))
    n_valid = jnp.minimum(cloud.count(), n)
    new_valid = jnp.arange(n) < n_valid
    take = lambda a: None if a is None else a[sel]
    return PointCloud(
        points=pts[sel], valid=new_valid, colors=take(cloud.colors), normals=take(cloud.normals)
    )


def downsample_to(key, cloud: PointCloud, n: int, method: str = "fps") -> PointCloud:
    if method == "fps":
        return farthest_point_sampling(key, cloud, n)
    if method == "random":
        return random_sample(key, cloud, n)
    raise ValueError(f"unknown sampling method {method!r}")


def _voxel_coords(cloud: PointCloud, voxel_size: float, origin=None) -> jnp.ndarray:
    pts = cloud.points
    if origin is not None:
        pts = pts - origin
    coords = jnp.floor(pts / voxel_size).astype(jnp.int32)
    return jnp.where(cloud.valid[:, None], coords, _SENTINEL)


def voxel_down_sample(
    cloud: PointCloud, voxel_size: float, capacity: Optional[int] = None
) -> PointCloud:
    """Average points per occupied voxel (Open3D ``voxel_down_sample`` parity:
    voxel grid anchored at the cloud's min bound).

    Output padded to ``capacity`` (default: input capacity). Output ordering is
    lexicographic in voxel coordinates, which is deterministic.
    """
    cap = cloud.capacity if capacity is None else int(capacity)
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(cloud.valid[:, None], cloud.points, big), axis=0)
    coords = _voxel_coords(cloud, voxel_size, origin=lo)
    uniq, inv = jnp.unique(
        coords, axis=0, size=cap + 1, fill_value=_SENTINEL, return_inverse=True
    )
    inv = inv.reshape(-1)
    # capacity guard: when occupied voxels exceed `cap`, the truncated
    # voxels' points get arbitrary inverse indices — exclude them rather
    # than pollute surviving voxels' means
    hit = jnp.all(uniq[inv] == coords, axis=1)
    w = (cloud.valid & hit).astype(jnp.float32)
    counts = jax.ops.segment_sum(w, inv, num_segments=cap + 1)
    sums = jax.ops.segment_sum(cloud.points * w[:, None], inv, num_segments=cap + 1)
    means = sums / jnp.maximum(counts[:, None], 1.0)
    voxel_ok = (counts > 0) & jnp.any(uniq != _SENTINEL, axis=1)

    def seg_mean(a):
        if a is None:
            return None
        s = jax.ops.segment_sum(a * w[:, None], inv, num_segments=cap + 1)
        return s / jnp.maximum(counts[:, None], 1.0)

    out = PointCloud(
        points=means[:cap],
        valid=voxel_ok[:cap],
        colors=None if cloud.colors is None else seg_mean(cloud.colors)[:cap],
        normals=None if cloud.normals is None else seg_mean(cloud.normals)[:cap],
    )
    # compact valid voxels to the front for downstream top-k friendliness
    from .cloud import compact

    return compact(out, cap)


def voxel_coverage(points: jnp.ndarray, valid: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """Number of distinct occupied voxels (reference HelpersRealtime.py:108-110:
    ``floor(points / voxel)`` then count unique rows; grid anchored at origin)."""
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    coords = jnp.where(valid[:, None], coords, _SENTINEL)
    n = points.shape[0]
    uniq, counts = jnp.unique(
        coords, axis=0, size=n + 1, fill_value=_SENTINEL, return_counts=True
    )
    occupied = (counts > 0) & jnp.any(uniq != _SENTINEL, axis=1)
    return jnp.sum(occupied.astype(jnp.int32))
