"""Brute-force nearest neighbors as MXU-shaped dense distance computations.

Replaces every KD-tree in the reference (Open3D ``KDTreeFlann``
registration_utils.py:233-236, ``KDTreeSearchParamHybrid``
HelpersRealtime.py:218-223, scipy ``cKDTree`` HelpersRealtime.py:100-106).
At the working-set sizes of this pipeline (100-10k points) a dense
``|x|^2 + |y|^2 - 2 x.y^T`` distance matrix rides the MXU and beats
pointer-chasing trees by a wide margin on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.0e38)


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances, (N, 3) x (M, 3) -> (N, M).

    The cross term is a matmul (MXU); the norms fuse elementwise.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1)
    # full precision: NN residuals at millimeter scale must not be truncated
    cross = jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 + b2[None, :] - 2.0 * cross, 0.0)


def masked_sqdist(a, a_valid, b, b_valid) -> jnp.ndarray:
    """Pairwise squared distances with invalid rows/cols pushed to +inf."""
    d2 = pairwise_sqdist(a, b)
    d2 = jnp.where(b_valid[None, :], d2, _BIG)
    return jnp.where(a_valid[:, None], d2, _BIG)


def knn(
    query: jnp.ndarray,
    query_valid: jnp.ndarray,
    data: jnp.ndarray,
    data_valid: jnp.ndarray,
    k: int,
    exclude_self: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k nearest data points for each query point.

    Returns ``(dists, idx, neighbor_valid)`` each of shape (N, k); entries with
    ``neighbor_valid == False`` are padding (fewer than k valid data points).
    If ``exclude_self``, data point j is excluded for query i when i == j
    (caller guarantees query is data).
    """
    d2 = masked_sqdist(query, query_valid, data, data_valid)
    if exclude_self:
        n = d2.shape[0]
        eye = jnp.eye(n, d2.shape[1], dtype=bool)
        d2 = jnp.where(eye, _BIG, d2)
    neg, idx = jax.lax.top_k(-d2, k)
    nb_valid = -neg < (_BIG * 0.5)
    # The matmul form selects neighbors; recompute the selected distances
    # exactly to avoid |x|^2+|y|^2-2xy cancellation (sqrt amplifies the 1e-7
    # residual to ~1e-3, which would pollute mm-scale residuals).
    diff = query[:, None, :] - data[idx]
    d2k = jnp.sum(diff * diff, axis=-1)
    dists = jnp.sqrt(jnp.where(nb_valid, d2k, 0.0))
    return dists, idx, nb_valid


def radius_knn(
    query,
    query_valid,
    data,
    data_valid,
    radius: float,
    max_nn: int,
    exclude_self: bool = False,
):
    """Hybrid radius + max_nn search (Open3D ``KDTreeSearchParamHybrid``):
    the ``max_nn`` nearest neighbors, keeping only those within ``radius``."""
    dists, idx, nb_valid = knn(query, query_valid, data, data_valid, max_nn, exclude_self)
    nb_valid = nb_valid & (dists <= radius)
    return dists, idx, nb_valid


# above this many distance-matrix entries, chunk the query axis to bound
# peak memory (a 32k x 10k f32 matrix is 1.3 GB)
_NN_CHUNK_BUDGET = 64 * 1024 * 1024
# on TPU, problems at/above this size route to the fused Pallas kernel:
# measured 0.72 vs 0.83 ms at 4096^2 (and no 67 MB HBM matrix); below it the
# XLA dense path's fusion wins on kernel-launch granularity
_NN_PALLAS_MIN = 8 * 1024 * 1024


def nearest_neighbor(query, query_valid, data, data_valid):
    """Single nearest data point per query. Returns (dist, idx, found).

    On TPU, large problems run through the fused Pallas kernel (pallas_nn.py:
    data cloud resident in VMEM, running argmin — no (N, M) matrix in HBM).
    Elsewhere, query chunks under ``lax.map`` bound peak memory.
    """
    N, M = query.shape[0], data.shape[0]
    if N * M >= _NN_PALLAS_MIN and jax.default_backend() == "tpu":
        from .pallas_nn import nn_pallas

        return nn_pallas(query, query_valid, data, data_valid)
    if N * M <= _NN_CHUNK_BUDGET:
        return _nn_block(query, query_valid, data, data_valid)

    chunk = max(_NN_CHUNK_BUDGET // max(M, 1), 256)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    qp = jnp.concatenate([query, jnp.zeros((pad, 3), query.dtype)])
    qv = jnp.concatenate([query_valid, jnp.zeros((pad,), bool)])
    qp = qp.reshape(n_chunks, chunk, 3)
    qv = qv.reshape(n_chunks, chunk)
    d, i, f = jax.lax.map(
        lambda args: _nn_block(args[0], args[1], data, data_valid), (qp, qv)
    )
    return d.reshape(-1)[:N], i.reshape(-1)[:N], f.reshape(-1)[:N]


def _nn_block(query, query_valid, data, data_valid):
    d2 = masked_sqdist(query, query_valid, data, data_valid)
    idx = jnp.argmin(d2, axis=1)
    found = jnp.min(d2, axis=1) < (_BIG * 0.5)
    # exact recompute on the selected pair (see knn comment on cancellation)
    diff = query - data[idx]
    best = jnp.sum(diff * diff, axis=-1)
    return jnp.sqrt(jnp.where(found, best, 0.0)), idx, found
