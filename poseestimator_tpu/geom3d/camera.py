"""Pinhole camera model: projection, back-projection, distortion.

Replaces the Open3D RGBD->cloud path (RealSenseClass.py:56-69,
registration_utils.py:54-95, PoseEstimator.py:130-135, template_creation.py:
230-233), the reference's ``project_points`` (HelpersRealtime.py:252-264,
duplicated in main_image.py:23 and main_seibersdorf.py:41), and the
Brown-Conrady distorted projection (cv2.projectPoints, main_seibersdorf.py:76-78)
as pure-arithmetic XLA kernels.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .cloud import PointCloud


@struct.dataclass
class Intrinsics:
    """Pinhole intrinsics. Mirrors the fields consumed from
    ``rs.intrinsics`` / ``o3d.camera.PinholeCameraIntrinsic`` (fx, fy, ppx/cx,
    ppy/cy, width, height — RealSenseClass.py:45-51)."""

    fx: float = struct.field(pytree_node=False)
    fy: float = struct.field(pytree_node=False)
    cx: float = struct.field(pytree_node=False)
    cy: float = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            np.float32,
        )

    @classmethod
    def from_K(cls, K, width: int, height: int) -> "Intrinsics":
        K = np.asarray(K).reshape(3, 3)
        return cls(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
            width=int(width), height=int(height),
        )

    @classmethod
    def from_fov(cls, fov_deg: float, width: int, height: int) -> "Intrinsics":
        """FoV-60 template camera of the reference (template_creation.py:7-9,
        :188-191): fx = fy = 0.5*W / tan(fov/2), principal point at center."""
        f = 0.5 * width / np.tan(np.deg2rad(fov_deg) / 2.0)
        return cls(fx=f, fy=f, cx=width / 2.0, cy=height / 2.0, width=width, height=height)


def backproject_depth(
    depth: jnp.ndarray,
    intr: Intrinsics,
    color: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    depth_min: float = 1e-6,
    depth_max: float = jnp.inf,
    origin: Optional[jnp.ndarray] = None,
) -> PointCloud:
    """Depth image (H, W) in meters -> camera-frame PointCloud of capacity H*W.

    ``x = (u - cx) z / fx, y = (v - cy) z / fy`` — the arithmetic Open3D's
    ``PointCloud.create_from_rgbd_image`` performs in C++. Pixels outside
    [depth_min, depth_max] or with ``mask == 0`` are invalid.

    ``origin`` (2,) ``(ox, oy)`` (traced ok): ``depth`` is a WINDOW of the
    full image plane whose pixel (0, 0) sits at full-image pixel (ox, oy) —
    the counterpart of ``render.raster.render_depth_mesh(origin=, out_hw=)``,
    so windowed predicted views back-project to the same camera-frame
    geometry as a full-frame render.
    """
    H, W = depth.shape
    depth = depth.astype(jnp.float32)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    if origin is not None:
        u = u + origin[0].astype(jnp.float32)
        v = v + origin[1].astype(jnp.float32)
    z = depth
    x = (u - intr.cx) * z / intr.fx
    y = (v - intr.cy) * z / intr.fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = (depth > depth_min) & (depth < depth_max)
    if mask is not None:
        valid = valid & (mask != 0)
    valid = valid.reshape(-1)
    cols = None
    if color is not None:
        scale = 255.0 if jnp.issubdtype(color.dtype, jnp.integer) else 1.0
        cols = color.reshape(-1, 3).astype(jnp.float32) / scale
    return PointCloud(points=pts * valid[:, None], valid=valid, colors=cols)


def project_points(points: jnp.ndarray, K: jnp.ndarray, T_m2c: jnp.ndarray):
    """Project (N, 3) model points into pixels.

    Returns ``(uv (N, 2) float32, in_front (N,) bool)``. Behavior parity with
    reference ``project_points`` (HelpersRealtime.py:252-264): only points with
    z > 0 in the camera frame are meaningful (there they are filtered; here
    they are masked, shape-stable).
    """
    R = T_m2c[:3, :3]
    t = T_m2c[:3, 3]
    pc = points @ R.T + t
    z = pc[:, 2]
    in_front = z > 0
    zs = jnp.where(in_front, z, 1.0)
    u = K[0, 0] * pc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * pc[:, 1] / zs + K[1, 2]
    return jnp.stack([u, v], axis=-1), in_front


def project_points_distorted(
    points: jnp.ndarray, K: jnp.ndarray, D: jnp.ndarray, T: jnp.ndarray
):
    """Brown-Conrady distorted projection (cv2.projectPoints parity for
    4/5/8-term distortion vectors; main_seibersdorf.py:70-81).

    Returns ``(uv, in_front)``.
    """
    R = T[:3, :3]
    t = T[:3, 3]
    pc = points @ R.T + t
    z = pc[:, 2]
    in_front = z > 0.0
    zs = jnp.where(jnp.abs(z) > 1e-12, z, 1.0)
    xp = pc[:, 0] / zs
    yp = pc[:, 1] / zs
    D = jnp.concatenate([jnp.asarray(D, jnp.float32).reshape(-1), jnp.zeros(8)])[:8]
    k1, k2, p1, p2, k3, k4, k5, k6 = [D[i] for i in range(8)]
    r2 = xp * xp + yp * yp
    radial = (1 + k1 * r2 + k2 * r2**2 + k3 * r2**3) / (
        1 + k4 * r2 + k5 * r2**2 + k6 * r2**3
    )
    x2 = xp * radial + 2 * p1 * xp * yp + p2 * (r2 + 2 * xp * xp)
    y2 = yp * radial + p1 * (r2 + 2 * yp * yp) + 2 * p2 * xp * yp
    u = K[0, 0] * x2 + K[0, 2]
    v = K[1, 1] * y2 + K[1, 2]
    return jnp.stack([u, v], axis=-1), in_front
