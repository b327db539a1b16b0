"""Registration quality metrics.

Replaces: symmetric Chamfer (reference registration_utils.py:276-280),
NN residuals + alignment score (HelpersRealtime.py:100-130), cloud resolution
(registration_utils.py:229-240), plus ADD / ADD-S pose-accuracy metrics for
the evaluation harness (the reference only has angular error,
registration_utils.py:21-23 — see geom3d.se3.angular_error).
"""
from __future__ import annotations

import jax.numpy as jnp

from .cloud import PointCloud
from .knn import knn, nearest_neighbor
from .masked import masked_mean, masked_median, masked_percentile
from .sampling import voxel_coverage
from .se3 import transform_points


def nn_residuals(src: PointCloud, dst: PointCloud) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Distance from each valid src point to its nearest dst point.

    Returns (dists (N,), valid (N,)). Parity with HelpersRealtime.py:100-106
    (scipy cKDTree query).
    """
    d, _, found = nearest_neighbor(src.points, src.valid, dst.points, dst.valid)
    return d, src.valid & found


def chamfer_distance(a: PointCloud, b: PointCloud) -> jnp.ndarray:
    """Symmetric mean Chamfer: mean(NN(a->b)) + mean(NN(b->a)).

    Parity with reference registration_utils.py:276-280 (Open3D
    compute_point_cloud_distance both ways, sum of means).
    """
    d_ab, m_ab = nn_residuals(a, b)
    d_ba, m_ba = nn_residuals(b, a)
    return masked_mean(d_ab, m_ab) + masked_mean(d_ba, m_ba)


def alignment_score(
    src_aligned: PointCloud,
    src_down: PointCloud,
    dst_down: PointCloud,
    voxel_size: float,
) -> jnp.ndarray:
    """median + 0.3 * p90 of NN residuals + 0.5 * (1 - voxel-coverage ratio).

    Parity with reference HelpersRealtime.py:112-130. Lower is better.
    """
    d, m = nn_residuals(src_aligned, dst_down)
    med = masked_median(d, m)
    p90 = masked_percentile(d, m, 90.0)
    cov_aligned = voxel_coverage(src_aligned.points, src_aligned.valid, voxel_size)
    cov_full = voxel_coverage(src_down.points, src_down.valid, voxel_size)
    cov_norm = cov_aligned.astype(jnp.float32) / jnp.maximum(cov_full, 1).astype(jnp.float32)
    # clamp: a rotation can scatter the template over MORE voxels than its
    # rest pose (cov_norm > 1), which in the raw reference formula turns into
    # a negative-score bonus for wrong alignments; coverage can only penalize
    cov_norm = jnp.minimum(cov_norm, 1.0)
    return med + 0.3 * p90 + 0.5 * (1.0 - cov_norm)


def cloud_resolution(cloud: PointCloud, k: int = 8) -> jnp.ndarray:
    """Median distance to the k nearest neighbors over the cloud.

    Parity with reference registration_utils.py:229-240 (which subsamples for
    speed; dense is cheap here). Returns 0.005 for degenerate clouds, as the
    reference does.
    """
    dists, _, nb_valid = knn(cloud.points, cloud.valid, cloud.points, cloud.valid, k, exclude_self=True)
    med = masked_median(dists.reshape(-1), nb_valid.reshape(-1))
    enough = cloud.count() >= 2
    return jnp.where(enough, med, 0.005)


def add_metric(T_est: jnp.ndarray, T_gt: jnp.ndarray, model: PointCloud) -> jnp.ndarray:
    """ADD: mean distance between model points under estimated vs GT pose."""
    pe = transform_points(T_est, model.points)
    pg = transform_points(T_gt, model.points)
    return masked_mean(jnp.linalg.norm(pe - pg, axis=1), model.valid)


def adds_metric(T_est: jnp.ndarray, T_gt: jnp.ndarray, model: PointCloud) -> jnp.ndarray:
    """ADD-S (symmetric objects): mean nearest-point distance between the two
    transformed model clouds."""
    pe = model.transform(T_est)
    pg = model.transform(T_gt)
    d, m = nn_residuals(pg, pe)
    return masked_mean(d, m)
