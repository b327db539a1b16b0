"""Fixed-iteration vmapped RANSAC over feature correspondences.

Replaces Open3D ``registration_ransac_based_on_feature_matching`` with
``ransac_n=3``, edge-length (0.9) and distance checkers (reference
registration_utils.py:177-196 == HelpersRealtime.py:194-213). The C++ version
runs up to 100k sequential iterations with early termination; here a fixed
budget of hypotheses is evaluated in parallel (chunked vmap — each hypothesis
is a closed-form 3-pair triad alignment plus a masked inlier count, so
thousands of hypotheses ride the VPU/MXU at once, and the winner is LS-refit
with the exact Horn solve), which is the TPU-shaped equivalent.
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


def _triad_rt(s3, d3):
    """Closed-form rigid alignment of a 3-point sample via orthonormal frames.

    Build a right-handed frame from each centered triangle (first edge,
    orthogonalized second edge, their cross product); R maps the source frame
    onto the destination frame. For congruent triangles this IS the optimal
    rotation; under noise it deviates from the least-squares (Horn) solution
    by a fraction of the noise angle — measured 6.90 vs 6.36 deg mean error
    vs ground truth at 1 cm noise on 0.5 m triangles, identical (0.008 deg)
    on clean samples. RANSAC hypotheses only need to land inliers inside the
    correspondence gate, and this runs ~20x faster than the vmapped 4x4
    ``eigh`` of the full Horn solve (the winning sample is LS-refit once).
    Degenerate samples (repeated point, collinear triple) produce a garbage
    but finite frame; the edge-length checker rejects them.
    """
    cs = jnp.mean(s3, axis=0)
    cd = jnp.mean(d3, axis=0)

    def frame(x):
        e1 = x[1] - x[0]
        e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
        v = x[2] - x[0]
        e2 = v - jnp.dot(v, e1) * e1
        e2 = e2 / jnp.maximum(jnp.linalg.norm(e2), 1e-12)
        return jnp.stack([e1, e2, jnp.cross(e1, e2)], axis=1)  # columns

    R = jnp.matmul(
        frame(d3 - cd), frame(s3 - cs).T, precision=jax.lax.Precision.HIGHEST
    )
    return R, cd - jnp.matmul(R, cs, precision=jax.lax.Precision.HIGHEST)


def sample_triads(key, match_valid: jnp.ndarray, n_iters: int) -> jnp.ndarray:
    """(n_iters, 3) int32 indices into the match list, drawn uniformly over
    VALID matches only, with replacement, via one inverse-CDF searchsorted
    (cdf entries are exact small integers in f32 up to 2^24 matches).
    Collisions within a triad produce a zero-length edge the edge checker
    rejects downstream."""
    cdf = jnp.cumsum(match_valid.astype(jnp.float32))
    total = cdf[-1]
    u = jax.random.uniform(key, (n_iters, 3)) * total
    return jnp.clip(
        jnp.searchsorted(cdf, u, side="right"), 0, match_valid.shape[0] - 1
    ).astype(jnp.int32)


def _hypothesis(sel, src_c, dst_c, match_valid, max_corr_dist, edge_ratio):
    """One RANSAC hypothesis from presampled indices: check, solve, score."""
    s3 = src_c[sel]
    d3 = dst_c[sel]

    # edge-length checker (both directions, ratio 0.9); also rejects
    # degenerate samples (a repeated index gives a zero-length edge)
    pairs = jnp.array([[0, 1], [1, 2], [2, 0]])
    es = jnp.linalg.norm(s3[pairs[:, 0]] - s3[pairs[:, 1]], axis=1)
    ed = jnp.linalg.norm(d3[pairs[:, 0]] - d3[pairs[:, 1]], axis=1)
    edge_ok = jnp.all((es > edge_ratio * ed) & (ed > edge_ratio * es))

    R, t = _triad_rt(s3, d3)
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

    TPU-shaped sampling and solving (measured on v5e, 2048x5 hypotheses):
    3-point samples come from ONE inverse-CDF draw over the valid-match mask
    (``searchsorted`` on a cumulative count; WITH replacement — a collision
    produces a zero-length edge the edge checker rejects, at ~0.3% rate for
    1024 candidates), replacing per-hypothesis ``random.choice(replace=False,
    p=...)`` whose Gumbel top-k cost 6.2 ms; hypotheses are solved by the
    closed-form triad alignment (``_triad_rt``) instead of the 4x4-eigh Horn
    solve (41.8 -> 0.8 ms). The winning sample is then LS-refit with the
    exact Horn solve, so the returned ``T`` keeps the same least-squares
    semantics as before.
    """
    src_c = src_pts
    dst_c = dst_pts[match_idx]  # (N, 3) matched destination points
    max_corr_dist = jnp.float32(max_corr_dist)

    sel_all = sample_triads(key, match_valid, n_iters)
    sel_chunks = sel_all.reshape(n_iters // chunk, chunk, 3)

    def run_chunk(sels):
        score, _R, _t, _ok = jax.vmap(
            lambda s: _hypothesis(s, src_c, dst_c, match_valid, max_corr_dist, edge_ratio)
        )(sels)
        return score  # ok is encoded in score (-1); winner re-derived below

    scores = jax.lax.map(run_chunk, sel_chunks).reshape(-1)

    best = jnp.argmax(scores)
    found = scores[best] > 0.0
    # exact least-squares (Horn) refit of the winning 3-point sample: the
    # selection ran on the cheap triad solve; the returned transform keeps
    # LS semantics
    s3 = src_c[sel_all[best]]
    d3 = dst_c[sel_all[best]]
    R_ls, t_ls = kabsch(s3, d3, jnp.ones(3))
    R = jnp.where(found, R_ls, jnp.eye(3))
    t = jnp.where(found, t_ls, jnp.zeros(3))

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
