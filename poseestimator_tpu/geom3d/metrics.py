"""Registration quality metrics.

Replaces: symmetric Chamfer (reference registration_utils.py:276-280),
NN residuals + alignment score (HelpersRealtime.py:100-130), cloud resolution
(registration_utils.py:229-240), plus ADD / ADD-S pose-accuracy metrics for
the evaluation harness (the reference only has angular error,
registration_utils.py:21-23 — see geom3d.se3.angular_error).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import project_points
from .cloud import PointCloud
from .knn import knn, nearest_neighbor
from .masked import masked_max, masked_mean, masked_median, masked_percentile
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


def mssd_metric(
    T_est: jnp.ndarray,
    T_gt: jnp.ndarray,
    model: PointCloud,
    symmetries: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MSSD: maximum symmetry-aware surface distance (BOP challenge,
    Hodan et al. ECCV 2020 — the standard metric family for the BOP-format
    scenes the offline app evaluates, utils/bop.py).

    ``min over symmetry S of max over model points x of
    || T_est x - T_gt S x ||``. ``symmetries``: (S, 4, 4) discrete object
    symmetry transforms; identity-only when omitted (asymmetric object).
    """
    if symmetries is None:
        symmetries = jnp.eye(4)[None]
    pe = transform_points(T_est, model.points)  # (N, 3)

    def per_sym(S):
        pg = transform_points(T_gt @ S, model.points)
        return masked_max(jnp.linalg.norm(pe - pg, axis=1), model.valid)

    return jnp.min(jax.vmap(per_sym)(symmetries))


def mspd_metric(
    T_est: jnp.ndarray,
    T_gt: jnp.ndarray,
    K: jnp.ndarray,
    model: PointCloud,
    symmetries: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MSPD: maximum symmetry-aware projection distance in pixels (BOP).

    ``min over symmetry S of max over model points x of
    || proj(T_est x) - proj(T_gt S x) ||``. Points behind either camera are
    excluded from the max (shape-stable masking instead of filtering).
    """
    if symmetries is None:
        symmetries = jnp.eye(4)[None]
    uv_e, front_e = project_points(model.points, K, T_est)

    def per_sym(S):
        uv_g, front_g = project_points(model.points, K, T_gt @ S)
        d = jnp.linalg.norm(uv_e - uv_g, axis=1)
        return masked_max(d, model.valid & front_e & front_g)

    return jnp.min(jax.vmap(per_sym)(symmetries))
