"""Point-to-point ICP as a jitted ``lax.while_loop``.

Replaces ``o3d.pipelines.registration.registration_icp`` with
``TransformationEstimationPointToPoint`` — used by the reference for tracking
(0.01 threshold, identity init, default 30 iterations, main_realsense.py:
112-115) and template refinement (0.05, TEASER init, <=1000 iterations,
PoseEstimator.py:97-101). Convergence criteria parity with Open3D defaults:
relative fitness/RMSE 1e-6.

Each iteration: masked NN (dense distance matrix, MXU), inlier gating at
``max_corr_dist``, weighted Horn alignment of the matched pairs — one fused
device program per iteration, no host round-trips.

The NN pass dominates (a 4096x4096 problem is ~67 MB of distances); the loop
carries each iteration's NN/convergence evaluation forward so the next
iteration aligns from it directly — ONE NN per iteration, not two
(align-then-check with a recheck at the top of the next iteration would
recompute the identical evaluation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .kabsch import kabsch
from ..geom3d.cloud import PointCloud
from ..geom3d.knn import nearest_neighbor
from ..geom3d.se3 import axis_angle_to_R, make_T


@struct.dataclass
class ICPResult:
    T: jnp.ndarray  # (4, 4) src -> dst
    fitness: jnp.ndarray  # inlier fraction of valid src points
    inlier_rmse: jnp.ndarray
    n_iters: jnp.ndarray
    # (6, 6) Gauss-Newton pose covariance of the LEFT-multiplied twist
    # delta = (omega, t) (T <- exp(delta^) T), in the dst/camera frame;
    # None unless the solver ran with with_cov=True. See _gn_covariance.
    cov: jnp.ndarray | None = None


def _gn_covariance(J, r_sq, w, n_inl, res_dim):
    """Pose covariance from the Gauss-Newton normal equations at convergence.

    ``J`` (N, res_dim, 6) stacks each pair's residual Jacobian wrt the
    left-multiplied twist (omega, t); ``r_sq`` (N,) the pair's squared
    residual; ``w`` (N,) the IRLS/inlier weight. The estimate is
    ``sigma^2 (J^T W J)^{-1}`` with ``sigma^2`` from the weighted residual
    sum over ``res_dim * n_inl - 6`` degrees of freedom.

    The information matrix captures the GEOMETRIC observability structure —
    e.g. points on a single plane constrain only the normal translation and
    in-plane rotations, and the corresponding covariance directions blow up.
    Like every ICP covariance it conditions on the final data association, so
    it underestimates when correspondences are themselves wrong; the
    measured calibration factor on the tracking eval is in
    docs/PERFORMANCE.md. Degenerate directions are Tikhonov-floored at
    1e-12 * trace so the inverse exists; their variances come out huge,
    which is the honest answer.
    """
    M = jnp.einsum("nri,n,nrj->ij", J, w, J,
                   precision=jax.lax.Precision.HIGHEST)
    dof = jnp.maximum(res_dim * n_inl.astype(jnp.float32) - 6.0, 1.0)
    sigma2 = jnp.sum(w * r_sq) / dof
    floor = 1e-12 * jnp.trace(M) + 1e-20
    return sigma2 * jnp.linalg.inv(M + floor * jnp.eye(6))


def _skew(x):
    z = jnp.zeros_like(x[..., 0])
    return jnp.stack([
        jnp.stack([z, -x[..., 2], x[..., 1]], axis=-1),
        jnp.stack([x[..., 2], z, -x[..., 0]], axis=-1),
        jnp.stack([-x[..., 1], x[..., 0], z], axis=-1),
    ], axis=-2)


def _robust_weights(d: jnp.ndarray, kernel: str, scale) -> jnp.ndarray:
    """IRLS weights for residuals d. ``none`` -> 1; ``huber`` -> min(1, s/d);
    ``tukey`` -> (1 - (d/s)^2)^2 inside s, 0 outside."""
    if kernel == "none":
        return jnp.ones_like(d)
    if kernel == "huber":
        return jnp.minimum(1.0, scale / jnp.maximum(d, 1e-12))
    if kernel == "tukey":
        r = jnp.clip(d / scale, 0.0, 1.0)
        return (1.0 - r * r) ** 2
    raise ValueError(f"unknown robust kernel {kernel!r}")


@partial(jax.jit, static_argnames=("max_iterations", "robust", "with_cov",
                                   "accel"))
def icp_point_to_point(
    src: PointCloud,
    dst: PointCloud,
    max_corr_dist,
    init_T=None,
    max_iterations: int = 30,
    relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6,
    robust: str = "none",
    with_cov: bool = False,
    accel: bool = False,
    accel_pose_tol: float = 2e-5,
) -> ICPResult:
    """``robust``: IRLS kernel over the per-pair residuals — 'none' (Open3D
    parity), 'huber', or 'tukey' (scale = max_corr_dist / 2). Robust kernels
    resist contamination inside the correspondence gate, e.g. background
    points bleeding through an imperfect detection mask (a failure mode the
    reference has no answer for).

    ``with_cov=True`` additionally returns the 6x6 Gauss-Newton pose
    covariance at convergence (see ``_gn_covariance``; negligible cost next
    to the NN pass). Static flag so covariance-free programs are unchanged.

    ``accel=True`` enables Besl-McKay-style step extrapolation (the 1992
    accelerated-ICP idea via Aitken's delta-squared): point-to-point ICP
    converges LINEARLY along tangential directions (correspondence slide on
    flat faces — measured contraction ~0.96/iter on the bench scene, i.e.
    ~23 NN passes for the last 1.5 mm), and when successive per-iteration
    twists are near-parallel the remaining series sums to
    ``gamma = 1/(1 - ratio)`` of the current step. The extrapolated pose is
    re-anchored by the next NN pass, so an overshoot self-corrects (the
    following twist flips direction and the gate disengages). Off by
    default: exact Open3D-parity iteration sequences stay pinned for the
    search/tests; the tracking step opts in.
    """
    if init_T is None:
        init_T = jnp.eye(4)
    max_corr_dist = jnp.float32(max_corr_dist)
    n_src = jnp.maximum(jnp.sum(src.valid.astype(jnp.int32)), 1)
    robust_scale = max_corr_dist * 0.5

    def evaluate(T):
        moved = src.transform(T)
        d, idx, found = nearest_neighbor(moved.points, moved.valid, dst.points, dst.valid)
        inl = src.valid & found & (d <= max_corr_dist)
        n_inl = jnp.sum(inl.astype(jnp.int32))
        fitness = n_inl.astype(jnp.float32) / n_src.astype(jnp.float32)
        rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d * d, 0.0)) / jnp.maximum(n_inl, 1))
        return moved.points, idx, inl, fitness, rmse

    def cond(carry):
        T, _, _, _, fitness, rmse, prev_fitness, prev_rmse, it, v_prev = carry
        keep = (jnp.abs(prev_fitness - fitness) > relative_fitness) | (
            jnp.abs(prev_rmse - rmse) > relative_rmse
        )
        if accel:
            # the rmse-delta exit is BLIND to tangential correspondence
            # slide (sliding barely moves rmse — the exact failure mode the
            # extrapolation targets), so accel mode also keeps iterating
            # while the last RAW per-iteration twist exceeds
            # ``accel_pose_tol`` (slot 6 flags an extrapolated step, whose
            # rmse jump must not trigger the exit either)
            keep = (keep | (v_prev[6] > 0.5)
                    | (jnp.linalg.norm(v_prev[:6]) > accel_pose_tol))
        return (it < max_iterations) & keep

    def body(carry):
        T, moved_pts, idx, inl, fitness, rmse, _, _, it, v_prev = carry
        w = inl.astype(jnp.float32)
        if robust != "none":
            d = jnp.linalg.norm(moved_pts - dst.points[idx], axis=1)
            w = w * _robust_weights(d, robust, robust_scale)
        R, t = kabsch(moved_pts, dst.points[idx], w)
        D = make_T(R, t)
        v_new = v_prev
        if accel:
            # small-angle twist of this iteration's delta: w ~ axis*angle
            wv = 0.5 * jnp.stack([R[2, 1] - R[1, 2],
                                  R[0, 2] - R[2, 0],
                                  R[1, 0] - R[0, 1]])
            v6 = jnp.concatenate([wv, t])
            nv = jnp.linalg.norm(v6)
            npv = jnp.linalg.norm(v_prev[:6])
            cosang = jnp.dot(v6, v_prev[:6]) / jnp.maximum(nv * npv, 1e-30)
            ratio = nv / jnp.maximum(npv, 1e-30)
            # geometric-series extrapolation, engaged only on an
            # established near-parallel contraction; clipped so a noisy
            # ratio estimate cannot catapult the pose
            engage = (cosang > 0.95) & (ratio < 0.999) & (npv > 1e-12)
            gamma = jnp.clip(1.0 / jnp.maximum(1.0 - ratio, 1e-3), 1.0, 8.0)
            g1 = jnp.where(engage, gamma - 1.0, 0.0)
            axis = wv / jnp.maximum(jnp.linalg.norm(wv), 1e-30)
            R_e = axis_angle_to_R(axis, g1 * jnp.linalg.norm(wv))
            D = make_T(R_e, g1 * t) @ D
            # carry the raw (unscaled) twist so the contraction pattern can
            # re-engage immediately if the tail is still crawling; slot 6
            # flags "this step extrapolated" for the exit criterion
            v_new = jnp.concatenate([v6, engage.astype(jnp.float32)[None]])
        T_new = D @ T
        new_pts, new_idx, new_inl, new_fitness, new_rmse = evaluate(T_new)
        return (T_new, new_pts, new_idx, new_inl, new_fitness, new_rmse,
                fitness, rmse, it + 1, v_new)

    pts0, idx0, inl0, fitness0, rmse0 = evaluate(init_T)
    # prev values seeded so the loop always runs at least one iteration
    init = (init_T, pts0, idx0, inl0, fitness0, rmse0,
            fitness0 + 1.0, rmse0 + 1.0, jnp.int32(0), jnp.zeros(7))
    T, pts, idx, inl, fitness, rmse, _, _, it, _ = jax.lax.while_loop(
        cond, body, init)
    cov = None
    if with_cov:
        # residual r_i = x_i - q_i, x = final transformed src; Jacobian wrt
        # the left twist (omega, t): d r / d delta = [-[x]x, I] (3, 6)
        q = dst.points[idx]
        w = inl.astype(jnp.float32)
        if robust != "none":
            w = w * _robust_weights(
                jnp.linalg.norm(pts - q, axis=1), robust, robust_scale)
        J = jnp.concatenate(
            [-_skew(pts), jnp.broadcast_to(jnp.eye(3), (pts.shape[0], 3, 3))],
            axis=-1,
        )  # (N, 3, 6)
        r_sq = jnp.sum((pts - q) ** 2, axis=1)
        cov = _gn_covariance(J, r_sq, w, jnp.sum(inl.astype(jnp.int32)), 3)
    return ICPResult(T=T, fitness=fitness, inlier_rmse=rmse, n_iters=it,
                     cov=cov)


@partial(jax.jit, static_argnames=("max_iterations", "robust", "with_cov"))
def icp_point_to_plane(
    src: PointCloud,
    dst: PointCloud,
    max_corr_dist,
    init_T=None,
    max_iterations: int = 30,
    relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6,
    robust: str = "none",
    with_cov: bool = False,
) -> ICPResult:
    """Point-to-plane ICP (capability extension over the reference, which only
    uses point-to-point): minimizes sum w_i (n_i . (R p_i + t - q_i))^2 via
    the small-angle linearization — each iteration solves one 6x6 system.
    Requires ``dst.normals`` (estimate_normals). Converges in ~3x fewer
    iterations on smooth surfaces. ``robust`` selects the same IRLS kernels
    as ``icp_point_to_point`` (weights on the plane-distance residuals).
    """
    if dst.normals is None:
        raise ValueError("icp_point_to_plane requires dst.normals")
    if init_T is None:
        init_T = jnp.eye(4)
    max_corr_dist = jnp.float32(max_corr_dist)
    n_src = jnp.maximum(jnp.sum(src.valid.astype(jnp.int32)), 1)

    def evaluate(T):
        moved = src.transform(T)
        d, idx, found = nearest_neighbor(moved.points, moved.valid, dst.points, dst.valid)
        inl = src.valid & found & (d <= max_corr_dist)
        n_inl = jnp.sum(inl.astype(jnp.int32))
        fitness = n_inl.astype(jnp.float32) / n_src.astype(jnp.float32)
        rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d * d, 0.0)) / jnp.maximum(n_inl, 1))
        return moved.points, idx, inl, fitness, rmse

    def cond(carry):
        T, _, _, _, fitness, rmse, pf, pr, it = carry
        keep = (jnp.abs(pf - fitness) > relative_fitness) | (
            jnp.abs(pr - rmse) > relative_rmse
        )
        return (it < max_iterations) & keep

    def body(carry):
        T, p, idx, inl, fitness, rmse, _, _, it = carry
        q = dst.points[idx]
        n = dst.normals[idx]
        w = inl.astype(jnp.float32)
        if robust != "none":
            pd = jnp.abs(jnp.sum(n * (q - p), axis=1))
            w = w * _robust_weights(pd, robust, max_corr_dist * 0.5)
        # rows: [p x n, n], residual: n . (q - p)
        J = jnp.concatenate([jnp.cross(p, n), n], axis=1)  # (N, 6)
        r = jnp.sum(n * (q - p), axis=1)  # (N,)
        Jw = J * w[:, None]
        A = jnp.dot(Jw.T, J, precision=jax.lax.Precision.HIGHEST)
        b = Jw.T @ r
        x = jnp.linalg.solve(A + 1e-9 * jnp.eye(6), b)  # (wx, wy, wz, tx, ty, tz)
        from ..geom3d.se3 import axis_angle_to_R

        angle = jnp.linalg.norm(x[:3])
        axis = jnp.where(angle > 1e-12, x[:3] / jnp.maximum(angle, 1e-12),
                         jnp.array([1.0, 0.0, 0.0]))
        R = axis_angle_to_R(axis, angle)
        T_new = make_T(R, x[3:]) @ T
        np_, ni, nl, nf, nr = evaluate(T_new)
        return T_new, np_, ni, nl, nf, nr, fitness, rmse, it + 1

    p0, i0, l0, f0, r0 = evaluate(init_T)
    init = (init_T, p0, i0, l0, f0, r0, f0 + 1.0, r0 + 1.0, jnp.int32(0))
    T, p, idx, inl, fitness, rmse, _, _, it = jax.lax.while_loop(
        cond, body, init)
    cov = None
    if with_cov:
        # scalar residual r_i = n_i . (x_i - q_i) with x the final
        # transformed src point; Jacobian wrt the left twist:
        # d r/d omega = x x n (since n . (omega x x) = omega . (x x n)),
        # d r/d t = n — the same rows the in-loop solve builds
        q = dst.points[idx]
        n = dst.normals[idx]
        r = jnp.sum(n * (p - q), axis=1)
        w = inl.astype(jnp.float32)
        if robust != "none":
            w = w * _robust_weights(jnp.abs(r), robust, max_corr_dist * 0.5)
        J = jnp.concatenate([jnp.cross(p, n), n], axis=1)[:, None, :]  # (N,1,6)
        cov = _gn_covariance(J, r * r, w, jnp.sum(inl.astype(jnp.int32)), 1)
    return ICPResult(T=T, fitness=fitness, inlier_rmse=rmse, n_iters=it,
                     cov=cov)
