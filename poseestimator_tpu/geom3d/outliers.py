"""Statistical outlier removal (Open3D ``remove_statistical_outlier`` parity).

Used by the reference at RealSenseClass.py:68 (20 nn, std 1.0),
registration_utils.py:93 (20 nn, std 1.0) and main_seibersdorf.py:167-170
(30 nn, std 1.0). Algorithm: mean distance to the k nearest neighbors per
point; keep points whose mean distance <= global_mean + std_ratio * global_std.
"""
from __future__ import annotations

import jax.numpy as jnp

from .cloud import PointCloud
from .knn import knn
from .masked import masked_mean, masked_std


def remove_statistical_outlier(
    cloud: PointCloud, nb_neighbors: int = 20, std_ratio: float = 1.0
) -> PointCloud:
    """Returns the cloud with outliers masked out (no data movement)."""
    dists, _, nb_valid = knn(
        cloud.points, cloud.valid, cloud.points, cloud.valid, nb_neighbors, exclude_self=True
    )
    # mean distance over however many real neighbors each point has
    mean_d = masked_mean(dists, nb_valid, axis=1)
    mu = masked_mean(mean_d, cloud.valid)
    sigma = masked_std(mean_d, cloud.valid)
    keep = mean_d <= mu + std_ratio * sigma
    return cloud.mask_where(keep)
