"""Drop-in alias for reference EstimHelpers/HelpersRealtime.py: the free
functions main_realsense star-imports (``from ...HelpersRealtime import *``).

Array-consuming functions accept/return numpy for script compatibility;
they forward to the jitted TPU implementations.
"""
import jax.numpy as jnp
import numpy as np

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.utils.overlay import draw_model_projection_with_axes

__all__ = [
    "enforce_upright_pose_y_up",
    "camera_eye_lookat_up_from_H",
    "project_points",
    "draw_model_projection_with_axes",
    "alignment_score",
    "nn_residuals",
    "voxel_coverage",
    "cloud_resolution",
]


def enforce_upright_pose_y_up(T):
    """Reference HelpersRealtime.py:8-43."""
    return np.asarray(g3.enforce_upright_pose_y_up(jnp.asarray(np.asarray(T), jnp.float32)))


def camera_eye_lookat_up_from_H(H):
    """Reference HelpersRealtime.py:226-247."""
    eye, target, up = g3.camera_eye_lookat_up_from_H(jnp.asarray(np.asarray(H), jnp.float32))
    return np.asarray(eye), np.asarray(target), np.asarray(up)


def project_points(points_3d, K, T_m2c):
    """Reference HelpersRealtime.py:252-264: returns int pixel coords of the
    in-front points only."""
    uv, front = g3.project_points(
        jnp.asarray(np.asarray(points_3d), jnp.float32),
        jnp.asarray(np.asarray(K), jnp.float32),
        jnp.asarray(np.asarray(T_m2c), jnp.float32),
    )
    uv = np.asarray(uv)[np.asarray(front)]
    return uv.astype(int)


def _as_cloud(x):
    from poseestimator_tpu.geom3d.cloud import PointCloud, from_points

    if isinstance(x, PointCloud):
        return x
    return from_points(np.asarray(x, np.float32))


def nn_residuals(src_aligned, dst_cloud):
    """Reference HelpersRealtime.py:100-106 (without the stray debug print)."""
    d, m = g3.nn_residuals(_as_cloud(src_aligned), _as_cloud(dst_cloud))
    return np.asarray(d)[np.asarray(m)]


def voxel_coverage(points, voxel_size):
    """Reference HelpersRealtime.py:108-110."""
    pts = jnp.asarray(np.asarray(points, np.float32))
    return int(g3.voxel_coverage(pts, jnp.ones(len(pts), bool), voxel_size))


def alignment_score(src_aligned, src_down, dst_down, voxel_size):
    """Reference HelpersRealtime.py:112-130."""
    return float(
        g3.alignment_score(
            _as_cloud(src_aligned), _as_cloud(src_down), _as_cloud(dst_down), voxel_size
        )
    )


def cloud_resolution(pcd, k=8):
    """Reference HelpersRealtime.py:179-190."""
    return float(g3.cloud_resolution(_as_cloud(pcd), k=k))
