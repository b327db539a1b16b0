"""Weighted rigid alignment (Kabsch/Horn) — the 3-point solver inside RANSAC,
the per-iteration solver inside ICP and GNC-TLS.

Replaces Open3D's ``TransformationEstimationPointToPoint`` (SVD in C++).
Implementation: Horn's closed-form quaternion method — the optimal rotation is
the principal eigenvector of the symmetric 4x4 Davenport matrix built from the
weighted cross-covariance. The default extraction is QUEST-style (Shuster's
attitude-determination algorithm): the Davenport matrix is traceless, so its
characteristic polynomial is a depressed quartic whose largest root is found
by a short Newton iteration from a provable upper bound, and the eigenvector
is the largest column of adj(N - lambda I). That is branch-free elementwise
arithmetic — it fuses into the surrounding ICP/GNC loop body — where a
generic 4x4 ``eigh`` lowers to an iterative factorization that dominated
while_loop iteration latency on TPU (measured: the vmapped eigh was 41.8 ms
for 10240 solves vs sub-ms for closed forms). ``method="eigh"`` keeps the
LAPACK-parity path for verification.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom3d.se3 import make_T, quat_to_R

_HP = jax.lax.Precision.HIGHEST


def _davenport(S: jnp.ndarray) -> jnp.ndarray:
    """Davenport's 4x4 symmetric (traceless) quaternion matrix of a 3x3
    cross-covariance: its principal eigenvector is the optimal rotation."""
    sxx, sxy, sxz = S[0, 0], S[0, 1], S[0, 2]
    syx, syy, syz = S[1, 0], S[1, 1], S[1, 2]
    szx, szy, szz = S[2, 0], S[2, 1], S[2, 2]
    return jnp.array(
        [
            [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
            [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
            [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
            [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
        ]
    )


def _quest_q(N: jnp.ndarray) -> jnp.ndarray:
    """Principal eigenvector of the (traceless, symmetric) Davenport matrix.

    tr(N) = 0 makes the characteristic polynomial a depressed quartic
    ``l^4 + e2 l^2 - e3 l + e4`` with ``e2 = -tr(N^2)/2``, ``e3 = tr(N^3)/3``,
    ``e4 = det(N)``. ``lambda_max <= sqrt(tr(N^2))`` (sum of squared
    eigenvalues), and Newton from above the largest real root of a
    real-rooted polynomial converges monotonically and quadratically — 10
    fixed iterations reach f32 machine precision. The eigenvector is the
    largest column of ``adj(N - lambda I)`` (each column of the adjugate of a
    rank-3 symmetric matrix lies in its null space); column choice by norm
    keeps the extraction stable. Eigenvalue ties (e.g. a collinear
    correspondence set, where the rotation about the line is unobservable)
    yield an arbitrary member of the tie subspace — same contract as eigh.
    """
    # pinned precision: e2/e3 feed the Newton eigenvalue — at the TPU bf16
    # matmul default the quartic coefficients (and hence R) silently degrade
    N2 = jnp.matmul(N, N, precision=_HP)
    trN2 = jnp.trace(N2)
    e2 = -0.5 * trN2
    e3 = jnp.sum(N2 * N) / 3.0  # tr(N^3) for symmetric N
    e4 = jnp.linalg.det(N)
    lam0 = jnp.sqrt(jnp.maximum(trN2, 1e-30))

    def newton(lam, _):
        p = ((lam * lam + e2) * lam - e3) * lam + e4
        dp = (4.0 * lam * lam + 2.0 * e2) * lam - e3
        return lam - p / jnp.where(jnp.abs(dp) > 1e-30, dp, 1e-30), None

    lam, _ = jax.lax.scan(newton, lam0, None, length=10)

    M = N - lam * jnp.eye(4)
    # adjugate via cofactors: 3x3 minors of a 4x4, unrolled
    def minor(i, j):
        rows = [r for r in range(4) if r != i]
        cols = [c for c in range(4) if c != j]
        a, b, c = (M[rows[0], cols[0]], M[rows[0], cols[1]], M[rows[0], cols[2]])
        d, e, f = (M[rows[1], cols[0]], M[rows[1], cols[1]], M[rows[1], cols[2]])
        g, h, i_ = (M[rows[2], cols[0]], M[rows[2], cols[1]], M[rows[2], cols[2]])
        return a * (e * i_ - f * h) - b * (d * i_ - f * g) + c * (d * h - e * g)

    adj = jnp.array(
        [[((-1.0) ** (i + j)) * minor(j, i) for j in range(4)] for i in range(4)]
    )
    q = adj[:, jnp.argmax(jnp.sum(adj * adj, axis=0))]
    return q / jnp.maximum(jnp.linalg.norm(q), 1e-30)


def kabsch(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray,
    method: str = "quest",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best-fit rotation R and translation t mapping src -> dst.

    src, dst: (N, 3); weights: (N,) nonnegative (0 = ignore pair).
    Returns (R, t) minimizing sum_i w_i || R src_i + t - dst_i ||^2.
    Degenerate input (all-zero weights) returns identity.
    ``method``: "quest" (closed-form eigenvector, default — see module
    docstring) or "eigh" (generic symmetric eigendecomposition).
    """
    w = weights.astype(jnp.float32)
    wsum = jnp.sum(w)
    ok = wsum > 1e-12
    wn = w / jnp.where(ok, wsum, 1.0)
    cs = jnp.sum(src * wn[:, None], axis=0)
    cd = jnp.sum(dst * wn[:, None], axis=0)
    S = jnp.einsum(
        "ni,nj->ij", (src - cs) * wn[:, None], dst - cd, precision=_HP
    )  # 3x3 cross-covariance

    N = _davenport(S)
    if method == "quest":
        q = _quest_q(N)
    elif method == "eigh":
        _, vecs = jnp.linalg.eigh(N)  # ascending; principal = last column
        q = vecs[:, 3]
    else:
        raise ValueError(f"unknown kabsch method {method!r}")
    R = quat_to_R(q)
    t = cd - R @ cs
    R = jnp.where(ok, R, jnp.eye(3))
    t = jnp.where(ok, t, jnp.zeros(3))
    return R, t


def kabsch_T(src, dst, weights) -> jnp.ndarray:
    R, t = kabsch(src, dst, weights)
    return make_T(R, t)
