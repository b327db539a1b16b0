"""Drop-in alias for reference EstimHelpers/registration_utils.py (the
offline registration stack main_image consumes)."""
import jax.numpy as jnp
import numpy as np

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.pipeline.offline import find_best_template_teaser
from poseestimator_tpu.utils.bop import get_pointcloud, load_camera_intrinsics
from poseestimator_tpu.utils.metrics_log import TemplateMetrics

__all__ = [
    "TemplateMetrics",
    "get_angular_error",
    "load_camera_intrinsics",
    "get_pointcloud",
    "find_best_template_teaser",
    "chamfer_distance",
    "initial_align_centroid_pca",
    "pca_axes",
    "centroid_of",
    "cloud_resolution",
]


def get_angular_error(R_exp, R_est):
    """Reference registration_utils.py:21-23."""
    return float(
        g3.angular_error(
            jnp.asarray(np.asarray(R_exp), jnp.float32),
            jnp.asarray(np.asarray(R_est), jnp.float32),
        )
    )


def _as_cloud(x):
    from poseestimator_tpu.geom3d.cloud import PointCloud, from_points

    if isinstance(x, PointCloud):
        return x
    return from_points(np.asarray(x, np.float32))


def chamfer_distance(src, dst):
    """Reference registration_utils.py:276-280."""
    return float(g3.chamfer_distance(_as_cloud(src), _as_cloud(dst)))


def centroid_of(pcd):
    """Reference registration_utils.py:284-288."""
    return np.asarray(_as_cloud(pcd).centroid())


def pca_axes(pcd):
    """Reference registration_utils.py:290-310."""
    R, s = g3.pca_axes(_as_cloud(pcd))
    return np.asarray(R), np.asarray(s)


def initial_align_centroid_pca(src, dst):
    """Reference registration_utils.py:314-343."""
    return np.asarray(g3.initial_align_centroid_pca(_as_cloud(src), _as_cloud(dst)))


def cloud_resolution(pcd, k=8):
    """Reference registration_utils.py:229-240."""
    return float(g3.cloud_resolution(_as_cloud(pcd), k=k))
