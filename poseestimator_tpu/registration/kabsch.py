"""Weighted rigid alignment (Kabsch/Horn) — the 3-point solver inside RANSAC,
the per-iteration solver inside ICP and GNC-TLS.

Replaces Open3D's ``TransformationEstimationPointToPoint`` (SVD in C++).
Implementation: Horn's closed-form quaternion method — the optimal rotation is
the principal eigenvector of a symmetric 4x4 built from the weighted
cross-covariance. A 4x4 ``eigh`` vmaps cleanly on TPU and avoids the sign
juggling of 3x3 SVD.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom3d.se3 import make_T, quat_to_R

_HP = jax.lax.Precision.HIGHEST


def kabsch(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best-fit rotation R and translation t mapping src -> dst.

    src, dst: (N, 3); weights: (N,) nonnegative (0 = ignore pair).
    Returns (R, t) minimizing sum_i w_i || R src_i + t - dst_i ||^2.
    Degenerate input (all-zero weights) returns identity.
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

    sxx, sxy, sxz = S[0, 0], S[0, 1], S[0, 2]
    syx, syy, syz = S[1, 0], S[1, 1], S[1, 2]
    szx, szy, szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.array(
        [
            [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
            [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
            [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
            [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
        ]
    )
    _, vecs = jnp.linalg.eigh(N)  # ascending; principal = last column
    q = vecs[:, 3]
    R = quat_to_R(q)
    t = cd - R @ cs
    R = jnp.where(ok, R, jnp.eye(3))
    t = jnp.where(ok, t, jnp.zeros(3))
    return R, t


def kabsch_T(src, dst, weights) -> jnp.ndarray:
    R, t = kabsch(src, dst, weights)
    return make_T(R, t)
