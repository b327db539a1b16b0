"""Fixed-shape point cloud container for XLA.

The reference manipulates Open3D ``PointCloud`` objects (pointer-based, variable
size, C++ KD-trees). On TPU everything under ``jit`` must be static-shape, so a
cloud is a padded ``(N, 3)`` array plus a validity mask. Every geometry op in
this package consumes and produces this type; "removing" points means clearing
mask bits, "downsampling" means gathering into a smaller padded buffer.

Replaces the Open3D geometry core usage catalogued in SURVEY.md section 2.2
(reference/src/pose_estimator/EstimHelpers/registration_utils.py:54-95 etc.).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PointCloud:
    """Padded point cloud: ``points[i]`` is meaningful iff ``valid[i]``.

    Invalid rows are kept finite (zeros) so reductions never see NaN/inf from
    padding; ops must mask explicitly.
    """

    points: jnp.ndarray  # (N, 3) float32
    valid: jnp.ndarray  # (N,) bool
    colors: Optional[jnp.ndarray] = None  # (N, 3) float32 in [0, 1] or None
    normals: Optional[jnp.ndarray] = None  # (N, 3) float32 unit or None

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jnp.ndarray:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.valid.astype(jnp.int32))

    def centroid(self) -> jnp.ndarray:
        """Mean of valid points; zeros for an empty cloud."""
        w = self.valid.astype(self.points.dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)
        return jnp.sum(self.points * w[:, None], axis=0) / n

    def transform(self, T: jnp.ndarray) -> "PointCloud":
        """Apply a 4x4 rigid (or similarity) transform.

        Full-precision matmul: pose accuracy is the product here, bf16
        truncation of coordinates is not acceptable.
        """
        R = T[:3, :3]
        t = T[:3, 3]
        hp = jax.lax.Precision.HIGHEST
        pts = jnp.dot(self.points, R.T, precision=hp) + t
        normals = (
            None if self.normals is None else jnp.dot(self.normals, R.T, precision=hp)
        )
        return self.replace(points=pts, normals=normals)

    def translate(self, t: jnp.ndarray) -> "PointCloud":
        return self.replace(points=self.points + jnp.asarray(t))

    def scale(self, s, center=None) -> "PointCloud":
        c = jnp.zeros(3, self.points.dtype) if center is None else jnp.asarray(center)
        return self.replace(points=(self.points - c) * s + c)

    def mask_where(self, keep: jnp.ndarray) -> "PointCloud":
        """Intersect the validity mask with ``keep`` (no data movement)."""
        return self.replace(valid=self.valid & keep)


def from_points(
    points,
    capacity: Optional[int] = None,
    colors=None,
    normals=None,
) -> PointCloud:
    """Build a PointCloud from a dense (n, 3) array, padding to ``capacity``."""
    points = jnp.asarray(points, jnp.float32).reshape(-1, 3)
    n = points.shape[0]
    cap = n if capacity is None else int(capacity)
    if cap < n:
        raise ValueError(f"capacity {cap} < number of points {n}")

    def pad(a):
        if a is None:
            return None
        a = jnp.asarray(a, jnp.float32).reshape(-1, 3)
        return jnp.concatenate([a, jnp.zeros((cap - n, 3), jnp.float32)], axis=0)

    valid = jnp.concatenate(
        [jnp.ones((n,), bool), jnp.zeros((cap - n,), bool)], axis=0
    )
    return PointCloud(points=pad(points), valid=valid, colors=pad(colors), normals=pad(normals))


def to_numpy(cloud: PointCloud) -> np.ndarray:
    """Dense (n_valid, 3) numpy array of the valid points (host-side only)."""
    pts = np.asarray(cloud.points)
    mask = np.asarray(cloud.valid)
    return pts[mask]


def compact(cloud: PointCloud, capacity: int) -> PointCloud:
    """Gather valid points to the front of a ``capacity``-row buffer.

    Shape-stable: valid points beyond ``capacity`` are dropped. Ordering of
    valid points is preserved.
    """
    order = jnp.argsort(~cloud.valid, stable=True)  # valid first, stable
    take_n = min(capacity, cloud.capacity)
    idx = order[:take_n]
    pad = capacity - take_n

    def take(a):
        if a is None:
            return None
        g = a[idx]
        if pad:
            g = jnp.concatenate([g, jnp.zeros((pad,) + g.shape[1:], g.dtype)], axis=0)
        return g

    n_valid = jnp.minimum(cloud.count(), capacity)
    new_valid = jnp.arange(capacity) < n_valid
    return PointCloud(
        points=take(cloud.points) * new_valid[:, None].astype(cloud.points.dtype),
        valid=new_valid,
        colors=take(cloud.colors),
        normals=take(cloud.normals),
    )


def bounding_box(cloud: PointCloud):
    """(min_bound, max_bound) over valid points; zeros if empty."""
    big = jnp.float32(1e30)
    any_valid = jnp.any(cloud.valid)
    lo = jnp.min(jnp.where(cloud.valid[:, None], cloud.points, big), axis=0)
    hi = jnp.max(jnp.where(cloud.valid[:, None], cloud.points, -big), axis=0)
    zero = jnp.zeros(3, cloud.points.dtype)
    return (
        jnp.where(any_valid, lo, zero),
        jnp.where(any_valid, hi, zero),
    )
