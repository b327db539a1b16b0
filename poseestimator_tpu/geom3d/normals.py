"""Normal estimation via local PCA (vmapped 3x3 eigendecomposition).

Replaces Open3D ``estimate_normals`` with ``KDTreeSearchParamHybrid``
(reference registration_utils.py:163-165, HelpersRealtime.py:218-219): for
each point, the smallest-eigenvector of the covariance of its hybrid
(radius, max_nn) neighborhood.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .cloud import PointCloud
from .knn import radius_knn


def estimate_normals(
    cloud: PointCloud,
    radius: float = 0.05,
    max_nn: int = 30,
    orient_towards: Optional[jnp.ndarray] = jnp.zeros(3),
) -> PointCloud:
    """Returns the cloud with a ``normals`` field.

    ``orient_towards``: flip each normal to point toward this viewpoint
    (camera origin by default — clouds here come from depth images, so this
    resolves the tangent-plane sign ambiguity deterministically). Pass ``None``
    to keep raw eigenvector signs.
    """
    pts = cloud.points
    _, idx, nb_valid = radius_knn(
        pts, cloud.valid, pts, cloud.valid, radius=radius, max_nn=max_nn, exclude_self=False
    )
    nbrs = pts[idx]  # (N, K, 3)
    w = nb_valid.astype(jnp.float32)[..., None]  # (N, K, 1)
    n_nb = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # (N, 1)
    mean = jnp.sum(nbrs * w, axis=1) / n_nb  # (N, 3)
    centered = (nbrs - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / n_nb[..., None]

    # smallest eigenvector of each symmetric 3x3
    _, vecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    normals = vecs[:, :, 0]

    if orient_towards is not None:
        view_dir = jnp.asarray(orient_towards, jnp.float32) - pts
        sign = jnp.where(jnp.sum(normals * view_dir, axis=1, keepdims=True) < 0, -1.0, 1.0)
        normals = normals * sign

    normals = normals / jnp.maximum(jnp.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
    return cloud.replace(normals=normals * cloud.valid[:, None].astype(jnp.float32))
