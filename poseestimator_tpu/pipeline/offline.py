"""Offline single-frame template search — the registration_utils flavor.

Parity with reference registration_utils.find_best_template_teaser
(:346-410), the path main_image.py drives: FPS downsampling (not voxel),
per-template centroid+PCA pre-alignment, FPFH at the fixed 0.05/0.125 radii,
RANSAC correspondences with the >= 20 gate, TEASER with adaptive
noise_bound = 1.5 x cloud resolution (GNC_TLS / cbar2=1 parameterization),
Chamfer scoring on the FULL clouds under ``H @ T0``, argmin. Returns
``(best_idx, T, best_score, all_metrics)`` with the reference's metrics-dict
schema. Augmented (beyond the reference) with the same 4-way PCA sign
hypotheses used by the realtime search, scored identically by Chamfer.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import geom3d as g3
from ..geom3d.cloud import PointCloud
from ..registration import (
    InlierSelectionMode,
    TeaserParams,
    match_features,
    ransac_registration,
    teaser_solve,
)
from ..registration import native as _native

# host-side exact max-clique is O(exp) worst case; cap the problem size the
# offline path will hand it (the op point is target_points=100 << this)
_EXACT_CLIQUE_MAX_K = 512

_FPFH_NORMAL_RADIUS = 0.05  # registration_utils.py:161
_FPFH_RADIUS = 0.125  # 2.5 x 0.05, registration_utils.py:170


def _preprocess(cloud: PointCloud, target_points: int, key, cap: int):
    """FPS downsample + normals + FPFH (registration_utils.py:133-174)."""
    down = g3.farthest_point_sampling(key, cloud, min(target_points, cap))
    down = g3.estimate_normals(
        down, radius=_FPFH_NORMAL_RADIUS, max_nn=30, orient_towards=down.centroid()
    )
    down = down.replace(normals=-down.normals)  # outward
    feats, _ = g3.compute_fpfh(down, radius=_FPFH_RADIUS, max_nn=100)
    return down, feats


def find_best_template_teaser(
    dst_cloud: PointCloud,
    src_clouds: Sequence[PointCloud],
    target_points: int = 100,
    seed: int = 0,
    min_correspondences: int = 20,
    inlier_selection_mode: int = int(InlierSelectionMode.PMC_EXACT),
):
    """Offline flavor. See module docstring; signature parity with
    registration_utils.py:346 (src_clouds is a list of full template clouds).

    ``inlier_selection_mode`` mirrors the TEASER++ knob
    (registration_utils.py:244-273). In this host-driven flavor PMC_EXACT is
    honored literally: when the native exact solver is available and the
    correspondence count is <= 512, the maximum clique is computed by
    ``native/maxclique.cpp`` (branch-and-bound, certified) and fed into the
    solve; otherwise it falls back to the greedy TPU kernel the realtime
    path uses. Each template's metrics dict records which ran ("clique").
    """
    key = jax.random.PRNGKey(seed)
    key, kd = jax.random.split(key)
    cap = max(target_points, 64)
    dst_down, dst_feats = _preprocess(dst_cloud, target_points, kd, cap)

    res = float(g3.cloud_resolution(dst_down))
    noise_bound = 1.5 * res  # registration_utils.py:353
    match_max_dist = 4.0 * res  # :354
    use_exact = (
        inlier_selection_mode == int(InlierSelectionMode.PMC_EXACT)
        and _native.available()
        and cap <= _EXACT_CLIQUE_MAX_K
    )
    # with a host-computed exact clique, the in-solve selection is disabled
    # (NONE) and the clique arrives pre-applied through the validity mask
    params = TeaserParams(
        noise_bound=noise_bound, cbar2=1.0,
        inlier_selection_mode=(
            int(InlierSelectionMode.NONE) if use_exact else inlier_selection_mode
        ),
    )

    best = {"idx": -1, "T": np.eye(4), "score": np.inf}
    all_metrics = []
    for idx, src_cloud in enumerate(src_clouds):
        key, k1, k2 = jax.random.split(key, 3)
        T0 = g3.initial_align_centroid_pca(src_cloud, dst_cloud)
        src0 = src_cloud.transform(T0)
        src_down, src_feats = _preprocess(src0, target_points, k1, cap)

        midx, mok = match_features(src_feats, src_down.valid, dst_feats, dst_down.valid)
        r = ransac_registration(
            k2, src_down.points, dst_down.points, midx, mok, match_max_dist,
            n_iters=4096,
        )
        n_corr = int(r.n_inliers)
        if n_corr < min_correspondences:
            all_metrics.append(
                {"template_idx": idx, "num_corr": n_corr, "num_inliers": 0,
                 "inlier_ratio": 0.0, "geom": float("inf"),
                 "score": float("inf"), "note": "few_corr"}
            )
            continue

        solve_mask = r.corr_mask
        solve_params = params
        clique_kind = "greedy"
        if use_exact:
            # PMC_EXACT semantics: certified maximum clique of the pairwise
            # consistency graph |‖dst_i-dst_j‖ - ‖src_i-src_j‖| <= 2*nb
            # (HelpersRealtime.py:161), solved exactly on the host
            s_np = np.asarray(src_down.points)
            d_np = np.asarray(dst_down.points)[np.asarray(midx)]
            sn = np.linalg.norm(s_np[:, None] - s_np[None, :], axis=-1)
            dn = np.linalg.norm(d_np[:, None] - d_np[None, :], axis=-1)
            adj = np.abs(dn - sn) <= 2.0 * noise_bound
            cmask, csize = _native.max_clique_exact(adj, np.asarray(r.corr_mask))
            if csize >= 3:
                solve_mask = r.corr_mask & jnp.asarray(cmask)
                clique_kind = "exact"
            else:
                # degenerate exact clique: fall back to the greedy in-solve
                # selection (the TPU kernel) rather than solving with NO
                # inlier selection at all — the hard cases where the clique
                # collapses are exactly where selection matters most
                solve_params = params.replace(
                    inlier_selection_mode=int(InlierSelectionMode.PMC_EXACT)
                )

        sol = teaser_solve(
            src_down.points, dst_down.points[midx], solve_mask, solve_params
        )
        n_inl = int(jnp.sum(sol.rotation_inliers))
        T_full = np.asarray(sol.T @ jnp.asarray(T0))

        # rank candidates cheaply on the downsampled clouds, then score the
        # winner with full-cloud Chamfer (registration_utils.py:384-389 does
        # one full-cloud Chamfer per template)
        candidates = [T_full] + _pca_sign_candidates(src_cloud, dst_cloud)
        down_geoms = [
            float(
                g3.chamfer_distance(
                    src_cloud.transform(jnp.asarray(Tc)), dst_down
                )
            )
            for Tc in candidates
        ]
        ci = int(np.argmin(down_geoms))
        T_best = candidates[ci]
        geom_err = float(
            g3.chamfer_distance(src_cloud.transform(jnp.asarray(T_best)), dst_cloud)
        )
        score = geom_err  # alpha = 1 (registration_utils.py:386-392)

        all_metrics.append(
            {"template_idx": idx, "num_corr": n_corr, "num_inliers": n_inl,
             "inlier_ratio": n_inl / max(1, n_corr), "geom": geom_err,
             "score": score, "clique": clique_kind}
        )
        if score < best["score"]:
            best.update(idx=idx, T=np.asarray(T_best), score=score)

    return best["idx"], best["T"], best["score"], all_metrics


def _pca_sign_candidates(src: PointCloud, dst: PointCloud) -> list[np.ndarray]:
    """All four det=+1 PCA sign alignments (the reference fixes signs by a
    dot-product heuristic, registration_utils.py:327-333, which can pick the
    wrong branch on partial views; trying all four costs three extra Chamfer
    evaluations)."""
    c_s, c_d = np.asarray(src.centroid()), np.asarray(dst.centroid())
    R_s, _ = g3.pca_axes(src)
    R_d, _ = g3.pca_axes(dst)
    R_s, R_d = np.asarray(R_s), np.asarray(R_d)
    out = []
    for signs in [(1, 1, 1), (1, -1, -1), (-1, 1, -1), (-1, -1, 1)]:
        R0 = R_d @ np.diag(signs).astype(np.float64) @ R_s.T
        T = np.eye(4)
        T[:3, :3] = R0
        T[:3, 3] = c_d - R0 @ c_s
        out.append(T.astype(np.float32))
    return out
