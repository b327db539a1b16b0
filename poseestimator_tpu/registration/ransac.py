"""Fixed-iteration vmapped RANSAC over feature correspondences.

Replaces Open3D ``registration_ransac_based_on_feature_matching`` with
``ransac_n=3``, edge-length (0.9) and distance checkers (reference
registration_utils.py:177-196 == HelpersRealtime.py:194-213). The C++ version
runs up to 100k sequential iterations with early termination; here a fixed
budget of hypotheses is evaluated in parallel (chunked vmap — each hypothesis
is a 3-pair Horn solve plus a masked inlier count, so thousands of hypotheses
ride the VPU/MXU at once), which is the TPU-shaped equivalent.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .kabsch import kabsch
from ..geom3d.se3 import make_T


@struct.dataclass
class RansacResult:
    T: jnp.ndarray  # (4, 4)
    fitness: jnp.ndarray  # inlier fraction among candidate matches
    inlier_rmse: jnp.ndarray
    n_inliers: jnp.ndarray  # int32
    corr_mask: jnp.ndarray  # (N,) bool: matches within distance under best T
    found: jnp.ndarray  # bool: any valid hypothesis


def _hypothesis(key, src_c, dst_c, match_valid, max_corr_dist, edge_ratio):
    """One RANSAC hypothesis: sample 3 pairs, check, solve, score."""
    n = src_c.shape[0]
    p = match_valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    sel = jax.random.choice(key, n, shape=(3,), replace=False, p=p)
    s3 = src_c[sel]
    d3 = dst_c[sel]

    # edge-length checker (both directions, ratio 0.9)
    pairs = jnp.array([[0, 1], [1, 2], [2, 0]])
    es = jnp.linalg.norm(s3[pairs[:, 0]] - s3[pairs[:, 1]], axis=1)
    ed = jnp.linalg.norm(d3[pairs[:, 0]] - d3[pairs[:, 1]], axis=1)
    edge_ok = jnp.all((es > edge_ratio * ed) & (ed > edge_ratio * es))

    R, t = kabsch(s3, d3, jnp.ones(3))
    # distance checker on the sampled pairs
    moved3 = s3 @ R.T + t
    dist_ok = jnp.all(jnp.linalg.norm(moved3 - d3, axis=1) <= max_corr_dist)

    # score over all candidate matches
    moved = src_c @ R.T + t
    d = jnp.linalg.norm(moved - dst_c, axis=1)
    inl = match_valid & (d <= max_corr_dist)
    n_inl = jnp.sum(inl.astype(jnp.int32))
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(inl, d * d, 0.0)) / jnp.maximum(n_inl, 1)
    )
    ok = edge_ok & dist_ok
    # lexicographic (n_inliers, -rmse); count gaps are >= 1 so a < 1 tiebreak
    # term is safe
    score = jnp.where(
        ok, n_inl.astype(jnp.float32) + 0.5 * (1.0 - rmse / max_corr_dist), -1.0
    )
    return score, R, t, ok


@partial(
    jax.jit,
    static_argnames=("n_iters", "chunk"),
)
def ransac_registration(
    key,
    src_pts: jnp.ndarray,
    dst_pts: jnp.ndarray,
    match_idx: jnp.ndarray,
    match_valid: jnp.ndarray,
    max_corr_dist,
    edge_ratio: float = 0.9,
    n_iters: int = 4096,
    chunk: int = 256,
) -> RansacResult:
    """RANSAC rigid registration over precomputed matches.

    ``src_pts (N,3)``, ``dst_pts (M,3)``, ``match_idx (N,)`` mapping src->dst,
    ``match_valid (N,)``. Hypotheses are evaluated in ``chunk``-sized vmapped
    batches under ``lax.map`` to bound memory.
    """
    src_c = src_pts
    dst_c = dst_pts[match_idx]  # (N, 3) matched destination points
    max_corr_dist = jnp.float32(max_corr_dist)

    keys = jax.random.split(key, n_iters).reshape(n_iters // chunk, chunk, 2)

    def run_chunk(ks):
        return jax.vmap(
            lambda k: _hypothesis(k, src_c, dst_c, match_valid, max_corr_dist, edge_ratio)
        )(ks)

    scores, Rs, ts, oks = jax.lax.map(run_chunk, keys)
    scores = scores.reshape(-1)
    Rs = Rs.reshape(-1, 3, 3)
    ts = ts.reshape(-1, 3)
    oks = oks.reshape(-1)

    best = jnp.argmax(scores)
    found = scores[best] > 0.0
    R = jnp.where(found, Rs[best], jnp.eye(3))
    t = jnp.where(found, ts[best], jnp.zeros(3))

    moved = src_c @ R.T + t
    d = jnp.linalg.norm(moved - dst_c, axis=1)
    corr = match_valid & (d <= max_corr_dist) & found
    n_inl = jnp.sum(corr.astype(jnp.int32))
    n_cand = jnp.maximum(jnp.sum(match_valid.astype(jnp.int32)), 1)
    rmse = jnp.sqrt(jnp.sum(jnp.where(corr, d * d, 0.0)) / jnp.maximum(n_inl, 1))
    return RansacResult(
        T=make_T(R, t),
        fitness=n_inl.astype(jnp.float32) / n_cand.astype(jnp.float32),
        inlier_rmse=rmse,
        n_inliers=n_inl,
        corr_mask=corr,
        found=found,
    )


def get_correspondences(
    key,
    src_pts,
    dst_pts,
    match_idx,
    match_valid,
    distance_threshold,
    n_iters: int = 4096,
):
    """Threshold retry ladder of the reference (registration_utils.py:177-196):
    try ``[t, 2t, 0.5t]``, return the first correspondence set with >= 3
    members. All three candidate runs are traced; at runtime each runs only if
    the previous failed (lax.cond).
    """
    k1, k2, k3 = jax.random.split(key, 3)

    r1 = ransac_registration(
        k1, src_pts, dst_pts, match_idx, match_valid, distance_threshold, n_iters=n_iters
    )

    def try2(_):
        r2 = ransac_registration(
            k2, src_pts, dst_pts, match_idx, match_valid, distance_threshold * 2.0,
            n_iters=n_iters,
        )

        def try3(_):
            return ransac_registration(
                k3, src_pts, dst_pts, match_idx, match_valid, distance_threshold * 0.5,
                n_iters=n_iters,
            )

        return jax.lax.cond(r2.n_inliers >= 3, lambda _: r2, try3, None)

    return jax.lax.cond(r1.n_inliers >= 3, lambda _: r1, try2, None)
