"""TEASER-class certifiable robust registration, as fused JAX programs.

Re-provides the compute of the TEASER++ C++ solver (MIT-SPARK submodule; exact
API surface consumed by the reference catalogued in SURVEY.md section 2.2):
``RobustRegistrationSolver.Params`` knobs, ``solve(src 3xN, dst 3xN)``,
rotation/scale/translation inlier reporting. Reference call sites:
registration_utils.py:244-273 (GNC_TLS, cbar2=1, gnc_factor 1.4, <=100 iters,
cost threshold 1e-12) and HelpersRealtime.py:158-166 (PMC_EXACT inlier
selection + CHAIN TIM graph).

Decoupled solve (Yang, Shi, Carlone, "TEASER: Fast and Certifiable Point
Cloud Registration", T-RO 2020 — public algorithm):
  1. scale: TLS via adaptive voting over TIM-norm ratios (or fixed s=1 when
     ``estimate_scaling=False``, which is what the reference always uses);
  2. inlier selection: maximum clique of the pairwise-consistency graph
     ``| ||dst_i-dst_j|| - s*||src_i-src_j|| | <= 2*noise_bound`` — here a
     parallel greedy MXU kernel (see maxclique.py);
  3. rotation: GNC over translation-invariant measurements (CHAIN graph over
     the clique), each inner step a weighted Wahba/Horn solve. All three
     TEASER++ back-ends are provided: GNC_TLS (truncated least squares), FGR
     (Geman-McClure line process, Zhou et al. ECCV 2016), and QUATRO
     (yaw-only quasi-SO(3), Lim et al. ICRA 2022);
  4. translation: component-wise TLS by adaptive voting.

Everything is fixed-shape: correspondences are padded to K_max and masked, so
the whole solve jits once and reruns at camera rate with zero recompiles.
"""
from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from .maxclique import max_clique_greedy, max_kcore
from ..geom3d.se3 import make_T, quat_to_R

_HP = jax.lax.Precision.HIGHEST


class RotationEstimationAlgorithm(enum.IntEnum):
    GNC_TLS = 0
    FGR = 1
    QUATRO = 2


class InlierSelectionMode(enum.IntEnum):
    PMC_EXACT = 0
    PMC_HEU = 1
    KCORE_HEU = 2
    NONE = 3


class InlierGraphFormulation(enum.IntEnum):
    CHAIN = 0
    COMPLETE = 1


@struct.dataclass
class TeaserParams:
    """Mirror of ``teaserpp_python.RobustRegistrationSolver.Params`` (the knobs
    the reference sets; defaults follow TEASER++)."""

    noise_bound: float = 0.01
    cbar2: float = 1.0
    estimate_scaling: bool = struct.field(pytree_node=False, default=False)
    rotation_estimation_algorithm: int = struct.field(
        pytree_node=False, default=int(RotationEstimationAlgorithm.GNC_TLS)
    )
    rotation_gnc_factor: float = 1.4
    rotation_max_iterations: int = struct.field(pytree_node=False, default=100)
    rotation_cost_threshold: float = 1e-12
    rotation_tim_graph: int = struct.field(
        pytree_node=False, default=int(InlierGraphFormulation.CHAIN)
    )
    inlier_selection_mode: int = struct.field(
        pytree_node=False, default=int(InlierSelectionMode.PMC_EXACT)
    )
    # Beyond-reference: Kabsch refit on the translation-consensus inliers
    # after the decoupled solve. Set False to reproduce TEASER++'s raw
    # decoupled estimate in parity experiments.
    refit: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class TeaserSolution:
    rotation: jnp.ndarray  # (3, 3)
    translation: jnp.ndarray  # (3,)
    scale: jnp.ndarray  # ()
    valid: jnp.ndarray  # bool: solve produced a usable estimate
    clique_mask: jnp.ndarray  # (K,) bool: max-clique inliers
    rotation_inliers: jnp.ndarray  # (K,) bool over TIMs (chain edges)
    translation_inliers: jnp.ndarray  # (K,) bool over clique points

    @property
    def T(self) -> jnp.ndarray:
        return make_T(self.rotation, self.translation)


def _horn_rotation_only(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Wahba problem: R maximizing sum_i w_i dst_i . (R src_i) (no centroids —
    inputs are translation-invariant measurements)."""
    S = jnp.einsum("ni,nj->ij", src * w[:, None], dst, precision=_HP)
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
    _, vecs = jnp.linalg.eigh(N)
    return quat_to_R(vecs[:, 3])


def _yaw_rotation_only(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted Wahba restricted to rotations about +Z (quasi-SO(3)).

    The closed-form maximizer of ``sum_i w_i dst_i . (Rz(theta) src_i)`` is
    ``theta = atan2(sum w (sx*dy - sy*dx), sum w (sx*dx + sy*dy))``; the z
    components drop out of the objective under a pure yaw.
    """
    c = jnp.sum(w * (src[:, 0] * dst[:, 0] + src[:, 1] * dst[:, 1]))
    s = jnp.sum(w * (src[:, 0] * dst[:, 1] - src[:, 1] * dst[:, 0]))
    norm = jnp.sqrt(c * c + s * s)
    ok = norm > 1e-12
    cos = jnp.where(ok, c / jnp.maximum(norm, 1e-12), 1.0)
    sin = jnp.where(ok, s / jnp.maximum(norm, 1e-12), 0.0)
    zero = jnp.zeros_like(cos)
    one = jnp.ones_like(cos)
    return jnp.stack(
        [
            jnp.stack([cos, -sin, zero]),
            jnp.stack([sin, cos, zero]),
            jnp.stack([zero, zero, one]),
        ]
    )


def _gnc_tls_rotation(
    src_tims, dst_tims, tim_valid, params: TeaserParams, solve_fn=_horn_rotation_only
):
    """Graduated non-convexity with a truncated-least-squares cost.

    Fixed-iteration ``lax.while_loop`` (<= rotation_max_iterations), each step
    one weighted Wahba solve (``solve_fn``: full SO(3) Horn for GNC_TLS,
    yaw-only for QUATRO) — jit-able, no data-dependent shapes.
    """
    eps2 = (2.0 * params.noise_bound) ** 2 * params.cbar2
    w0 = tim_valid.astype(jnp.float32)

    def residual2(R):
        diff = dst_tims - jnp.dot(src_tims, R.T, precision=_HP)
        return jnp.sum(diff * diff, axis=1)

    R0 = solve_fn(src_tims, dst_tims, w0)
    r2_0 = residual2(R0)
    r2_max = jnp.max(jnp.where(tim_valid, r2_0, 0.0))
    # mu init per the GNC schedule: start strongly convex
    mu0 = jnp.maximum(eps2 / jnp.maximum(2.0 * r2_max - eps2, 1e-12), 1e-6)
    cost0 = jnp.sum(jnp.where(tim_valid, jnp.minimum(r2_0, eps2), 0.0))

    def cond(carry):
        R, w, mu, cost, prev_cost, it = carry
        return (it < params.rotation_max_iterations) & (
            jnp.abs(cost - prev_cost) > params.rotation_cost_threshold
        )

    def body(carry):
        R, w, mu, cost, prev_cost, it = carry
        r2 = residual2(R)
        th1 = (mu + 1.0) / mu * eps2  # above: weight 0
        th2 = mu / (mu + 1.0) * eps2  # below: weight 1
        w_new = jnp.where(
            r2 >= th1,
            0.0,
            jnp.where(
                r2 <= th2,
                1.0,
                jnp.sqrt(eps2 * mu * (mu + 1.0) / jnp.maximum(r2, 1e-20)) - mu,
            ),
        )
        w_new = jnp.clip(w_new, 0.0, 1.0) * tim_valid.astype(jnp.float32)
        R_new = solve_fn(src_tims, dst_tims, w_new)
        r2_new = residual2(R_new)
        new_cost = jnp.sum(w_new * jnp.minimum(r2_new, eps2))
        return R_new, w_new, mu * params.rotation_gnc_factor, new_cost, cost, it + 1

    init = (R0, w0, mu0, cost0, cost0 + 1.0, jnp.int32(0))
    R, w, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return R, (w > 0.5) & tim_valid


def _gnc_fgr_rotation(src_tims, dst_tims, tim_valid, params: TeaserParams):
    """Graduated non-convexity with the Geman-McClure cost (the FGR back-end).

    Public algorithm: Zhou, Park, Koltun, "Fast Global Registration" (ECCV
    2016), rotation-only as in TEASER++'s ``ROTATION_ESTIMATION_ALGORITHM::FGR``
    (the reference's solver ships it but never selects it,
    registration_utils.py:255). Surrogate cost ``mu*c^2*r^2 / (mu*c^2 + r^2)``
    with line-process weights ``w_i = (mu*c^2 / (r_i^2 + mu*c^2))^2``;
    ``mu`` anneals downward by ``rotation_gnc_factor`` per iteration from a
    strongly-convex start to 1 (the true GM cost), then iterates to a
    fixed point. Same knob semantics as GNC_TLS: ``rotation_max_iterations``
    bounds the loop, ``rotation_cost_threshold`` early-exits on a stationary
    cost.
    """
    eps2 = (2.0 * params.noise_bound) ** 2 * params.cbar2  # GM scale c^2
    w0 = tim_valid.astype(jnp.float32)

    def residual2(R):
        diff = dst_tims - jnp.dot(src_tims, R.T, precision=_HP)
        return jnp.sum(diff * diff, axis=1)

    def gm_cost(r2, mu):
        return jnp.sum(
            jnp.where(tim_valid, mu * eps2 * r2 / (mu * eps2 + r2), 0.0)
        )

    R0 = _horn_rotation_only(src_tims, dst_tims, w0)
    r2_0 = residual2(R0)
    r2_max = jnp.max(jnp.where(tim_valid, r2_0, 0.0))
    # start convex: mu*c^2 >> max residual^2 makes the surrogate ~quadratic
    mu0 = jnp.maximum(r2_max / jnp.maximum(eps2, 1e-20), 1.0)
    cost0 = gm_cost(r2_0, mu0)

    def cond(carry):
        R, w, mu, cost, prev_cost, it = carry
        annealing = mu > 1.0
        return (it < params.rotation_max_iterations) & (
            annealing | (jnp.abs(cost - prev_cost) > params.rotation_cost_threshold)
        )

    def body(carry):
        R, w, mu, cost, prev_cost, it = carry
        r2 = residual2(R)
        w_new = (mu * eps2 / (r2 + mu * eps2)) ** 2
        w_new = w_new * tim_valid.astype(jnp.float32)
        R_new = _horn_rotation_only(src_tims, dst_tims, w_new)
        mu_new = jnp.maximum(mu / params.rotation_gnc_factor, 1.0)
        new_cost = gm_cost(residual2(R_new), mu_new)
        return R_new, w_new, mu_new, new_cost, cost, it + 1

    init = (R0, w0, mu0, cost0, cost0 + 1.0, jnp.int32(0))
    R, w, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    # w = (c^2/(r^2+c^2))^2 at mu=1; w >= 0.25 <=> r^2 <= c^2 (inside the bound)
    return R, (w >= 0.25) & tim_valid


def _component_tls(values: jnp.ndarray, valid: jnp.ndarray, noise_bound):
    """1-D truncated-least-squares by adaptive voting (one translation axis).

    Candidate consensus centers are the interval endpoints; the estimate is
    the mean of the maximum consensus set. O(K^2) masked comparisons.
    """
    K = values.shape[0]
    lo = values - noise_bound
    hi = values + noise_bound
    cands = jnp.concatenate([lo, hi])  # (2K,) candidate stabbing points
    cand_valid = jnp.concatenate([valid, valid])
    # membership[c, i]: interval i covers candidate c
    member = (
        (cands[:, None] >= lo[None, :] - 1e-9)
        & (cands[:, None] <= hi[None, :] + 1e-9)
        & valid[None, :]
        & cand_valid[:, None]
    )
    counts = jnp.sum(member.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)
    inliers = member[best]
    n = jnp.maximum(jnp.sum(inliers.astype(jnp.float32)), 1.0)
    est = jnp.sum(jnp.where(inliers, values, 0.0)) / n
    return est, inliers


def _tls_scale(src_tims, dst_tims, tim_valid, params: TeaserParams):
    """TLS scale from TIM norm ratios (adaptive voting), TEASER step 1."""
    sn = jnp.linalg.norm(src_tims, axis=1)
    dn = jnp.linalg.norm(dst_tims, axis=1)
    ok = tim_valid & (sn > 1e-9)
    ratios = dn / jnp.maximum(sn, 1e-9)
    # per-TIM noise bound on the ratio: 2*noise_bound / ||src_tim||
    bounds = 2.0 * params.noise_bound / jnp.maximum(sn, 1e-9)
    # adaptive voting with per-interval widths
    lo = ratios - bounds
    hi = ratios + bounds
    cands = jnp.concatenate([lo, hi])
    cand_valid = jnp.concatenate([ok, ok])
    member = (
        (cands[:, None] >= lo[None, :] - 1e-12)
        & (cands[:, None] <= hi[None, :] + 1e-12)
        & ok[None, :]
        & cand_valid[:, None]
    )
    counts = jnp.sum(member.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)
    inliers = member[best]
    n = jnp.maximum(jnp.sum(inliers.astype(jnp.float32)), 1.0)
    s = jnp.sum(jnp.where(inliers, ratios, 0.0)) / n
    return s, inliers


def _chain_tims(pts: jnp.ndarray, mask: jnp.ndarray):
    """Translation-invariant measurements over a CHAIN graph of the masked
    points: v_i = p_{next(i)} - p_i over the compacted ordering, cyclic.

    Returns (tims (K, 3), tim_valid (K,), order (K,)) — ``order`` maps
    compacted slots back to original indices so the same chain can be built
    on the destination side.
    """
    K = pts.shape[0]
    order = jnp.argsort(~mask, stable=True)  # clique members first
    n = jnp.sum(mask.astype(jnp.int32))
    slot = jnp.arange(K)
    nxt = jnp.where(slot + 1 < n, slot + 1, 0)
    p = pts[order]
    tims = p[nxt] - p
    tim_valid = (slot < n) & (n >= 2)
    return tims, tim_valid, order


@partial(jax.jit, static_argnames=())
def teaser_solve(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: jnp.ndarray,
    params: TeaserParams = TeaserParams(),
) -> TeaserSolution:
    """Solve robust registration over padded correspondences.

    src, dst: (K, 3) corresponding points (row i of src matches row i of dst);
    valid: (K,) mask. Returns the solution with inlier reports. With fewer
    than 3 valid correspondences, returns identity with ``valid=False``
    (reference behavior: registration_utils.py:245-246).
    """
    algo = RotationEstimationAlgorithm(params.rotation_estimation_algorithm)

    K = src.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # --- step 1/2: pairwise consistency graph (complete TIM graph) ---
    ds = src[:, None, :] - src[None, :, :]
    dd = dst[:, None, :] - dst[None, :, :]
    sn = jnp.sqrt(jnp.sum(ds * ds, axis=-1))
    dn = jnp.sqrt(jnp.sum(dd * dd, axis=-1))

    if params.estimate_scaling:
        iu = jnp.triu_indices(K, k=1)
        flat_src = ds[iu]
        flat_dst = dd[iu]
        flat_valid = (valid[:, None] & valid[None, :])[iu]
        scale, _ = _tls_scale(flat_src, flat_dst, flat_valid, params)
    else:
        scale = jnp.float32(1.0)

    thresh = 2.0 * params.noise_bound * jnp.sqrt(params.cbar2)
    adj = jnp.abs(dn - scale * sn) <= thresh

    if params.inlier_selection_mode == int(InlierSelectionMode.NONE):
        clique = valid
        clique_size = n_valid
    elif params.inlier_selection_mode == int(InlierSelectionMode.KCORE_HEU):
        # k-core heuristic: the max k-core contains the max clique on
        # clique-dominated consistency graphs, without the clique search
        clique, _ = max_kcore(adj, valid)
        clique_size = jnp.sum(clique.astype(jnp.int32))
    else:
        clique, clique_size = max_clique_greedy(adj, valid)

    # fall back to all valid points if the clique degenerates
    use_clique = clique_size >= 3
    sel = jnp.where(use_clique, clique, valid)

    # --- step 3: rotation over chain TIMs of the selected set ---
    if params.rotation_tim_graph == int(InlierGraphFormulation.COMPLETE):
        # complete graph TIMs (K^2 rows is wasteful; sample the chain plus
        # all-pairs is only needed for tiny K) — use all pairs flattened.
        iu = jnp.triu_indices(K, k=1)
        pair_valid = (sel[:, None] & sel[None, :])[iu]
        src_tims = ds[iu] * scale
        dst_tims = dd[iu]
        tim_valid = pair_valid
        order = jnp.arange(K)
    else:
        src_tims, tim_valid, order = _chain_tims(src * scale, sel)
        dst_sorted = dst[order]
        n = jnp.sum(sel.astype(jnp.int32))
        slot = jnp.arange(K)
        nxt = jnp.where(slot + 1 < n, slot + 1, 0)
        dst_tims = dst_sorted[nxt] - dst_sorted

    if algo == RotationEstimationAlgorithm.GNC_TLS:
        R, rot_inl_sorted = _gnc_tls_rotation(src_tims, dst_tims, tim_valid, params)
    elif algo == RotationEstimationAlgorithm.FGR:
        R, rot_inl_sorted = _gnc_fgr_rotation(src_tims, dst_tims, tim_valid, params)
    elif algo == RotationEstimationAlgorithm.QUATRO:
        # quasi-SO(3): yaw-only Wahba inside the same GNC-TLS outer loop
        # (Lim et al., "A Single Correspondence Is Enough", ICRA 2022 —
        # avoids degeneracy on gravity-aligned, near-planar TIM sets)
        R, rot_inl_sorted = _gnc_tls_rotation(
            src_tims, dst_tims, tim_valid, params, solve_fn=_yaw_rotation_only
        )
    else:  # pragma: no cover - enum is exhaustive
        raise ValueError(f"unknown rotation_estimation_algorithm {algo}")

    # --- step 4: component-wise TLS translation over selected points ---
    moved = jnp.dot(src * scale, R.T, precision=_HP)
    diffs = dst - moved
    tx, ix = _component_tls(diffs[:, 0], sel, params.noise_bound)
    ty, iy = _component_tls(diffs[:, 1], sel, params.noise_bound)
    tz, iz = _component_tls(diffs[:, 2], sel, params.noise_bound)
    t = jnp.stack([tx, ty, tz])
    trans_inliers = ix & iy & iz & sel

    # scatter rotation inliers back to original index space (chain case)
    if params.rotation_tim_graph == int(InlierGraphFormulation.CHAIN):
        rot_inliers = jnp.zeros((K,), bool).at[order].set(rot_inl_sorted)
    else:
        rot_inliers = sel  # complete-graph TIMs don't map 1:1 to points

    if params.refit:
        # final least-squares refit on the translation inliers (the consensus
        # set of all three axes) — tightens the decoupled estimate like the
        # optional refinement TEASER++ users apply post-solve. Gated so
        # parity experiments can compare the raw decoupled solve.
        refit_w = (trans_inliers & sel).astype(jnp.float32)
        enough = jnp.sum(refit_w) >= 3
        if algo == RotationEstimationAlgorithm.QUATRO:
            # keep the quasi-SO(3) structure: yaw-only Wahba on centered
            # inliers, then the matching translation (a full Kabsch would
            # reintroduce the roll/pitch QUATRO exists to exclude)
            wsum = jnp.maximum(jnp.sum(refit_w), 1.0)
            cs = jnp.sum(src * scale * refit_w[:, None], axis=0) / wsum
            cd = jnp.sum(dst * refit_w[:, None], axis=0) / wsum
            R_fit = _yaw_rotation_only(src * scale - cs, dst - cd, refit_w)
            t_fit = cd - jnp.dot(R_fit, cs, precision=_HP)
        else:
            from .kabsch import kabsch

            R_fit, t_fit = kabsch(src * scale, dst, refit_w)
        R = jnp.where(enough, R_fit, R)
        t = jnp.where(enough, t_fit, t)

    ok = n_valid >= 3
    return TeaserSolution(
        rotation=jnp.where(ok, R, jnp.eye(3)),
        translation=jnp.where(ok, t, jnp.zeros(3)),
        scale=scale,
        valid=ok,
        clique_mask=sel & valid,
        rotation_inliers=rot_inliers & valid,
        translation_inliers=trans_inliers & valid,
    )
