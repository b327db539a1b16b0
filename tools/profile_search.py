"""Prefix-program profile of the template-search program (real TPU).

Mirrors bench.py's template-search stage inputs exactly; cumulative prefixes
of _search_templates' internal stages, pipelined timing, differences =
marginal device cost per stage (same methodology as tools/profile_stages.py).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

if os.environ.get("PROFILE_SEARCH_CPU"):
    # Local smoke-testing without touching the axon tunnel (the machine's
    # sitecustomize pins JAX_PLATFORMS=axon and ignores the env override,
    # so both knobs are needed — see CLAUDE.md).
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.geom3d.cloud import PointCloud
from poseestimator_tpu.pipeline import pose_estimator as PE
from poseestimator_tpu.registration import (
    TeaserParams, icp_point_to_point, match_features, ransac_registration,
    teaser_solve,
)
dev = jax.devices()[0]
print("device:", dev)

intr = g3.Intrinsics.from_fov(60.0, 640, 480)
rng = np.random.default_rng(0)
cad_full = jnp.asarray(rng.normal(size=(40_000, 3)).astype(np.float32) * 0.05)
cad_pts = cad_full[: PE.SEARCH_RENDER_SAMPLES]
cad_valid = jnp.ones(PE.SEARCH_RENDER_SAMPLES, bool)

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("reps", nargs="?", type=int, default=10)
_ap.add_argument("--realistic", action="store_true",
                 help="profile on the bench's realistic scene (rendered "
                 "template DB + observation one motion delta away) instead "
                 "of worst-case random clouds, which never converge and pin "
                 "every early-exit while_loop at its iteration cap")
_ap.add_argument("--hyp-split", action="store_true",
                 help="sub-profile the hypotheses block only: prefixes at "
                 "match / +RANSAC / +TEASER / +PCA instead of the full "
                 "stage ladder")
_ap.add_argument("--view-set", default="reduced",
                 choices=["reduced", "full"],
                 help="with --realistic: template coverage (full = the "
                 "26-view sphere, the init-accuracy operating point)")
_ap.add_argument("--no-window", action="store_true",
                 help="disable the object-window rasterization in the "
                 "profiled program (full-frame predicted views)")
_args = _ap.parse_args()

if _args.realistic:
    from tools._scene import make_scene

    _scene = make_scene(intr, rng)
    _est = _scene.estimator
    if _args.view_set == "full":
        from poseestimator_tpu.pipeline.pose_estimator import PoseEstimator

        _est = PoseEstimator(
            _scene.cad_ply,
            os.path.join(os.path.dirname(_scene.cad_ply), "views26"),
            intr, view_set="full",
        )
    tpl_pts, tpl_valid = _est._tpl_points, _est._tpl_valid
    tpl_fpfh = _est._tpl_fpfh
    _dst_cap = _est._search_cap  # the product's adaptive working cap
    dst_pts, dst_valid = _scene.dst_cloud.points, _scene.dst_cloud.valid
    sil = _scene.obj_sil
    # product predicted-view instrument: the exact triangle raster
    render_kind, ra, rb = "mesh", _est._mesh_v, _est._mesh_f
    voxel = jnp.float32(_est.voxel_size)
else:
    box = rng.uniform(-0.5, 0.5, (5, 1024, 3)).astype(np.float32)
    box[..., 2] = np.sign(box[..., 2]) * 0.5
    tpl_pts = jnp.asarray(box)
    tpl_valid = jnp.ones((5, 1024), bool)
    tpl_fpfh = jnp.asarray(rng.random((5, 1024, 33)).astype(np.float32))
    dst_pts = jnp.asarray(rng.uniform(-0.5, 0.5, (4096, 3)).astype(np.float32))
    dst_valid = jnp.ones(4096, bool)
    sil = jnp.ones((intr.height, intr.width), bool)
    # point-cloud-only CAD: the legacy splat instrument
    render_kind, ra, rb = "points", cad_pts, cad_valid
    voxel = jnp.float32(0.05)
    _dst_cap = 1024
have_mask = True

intr_r = PE._down_intr(intr, 2)
intr_q = PE._down_intr(intr, 4)


def build_prefix(n_stages, hyp_level=4):
    """n_stages: 1=prep, 2=+hypotheses, 3=+coarse, 4..6=+fine stages 1..3,
    7=+score+argmin (the full program). hyp_level (only used at n_stages==2)
    truncates the hypotheses block: 1=match, 2=+RANSAC, 3=+TEASER, 4=+PCA
    (full block)."""

    @jax.jit
    def prog(key):
        kd, kf, kn = jax.random.split(key, 3)
        prep = PE._prep_dst(dst_pts, dst_valid, intr, sil, have_mask, voxel,
                            kd, dst_cap=_dst_cap)
        (dd_pts, dd_valid, dh_pts, dh_valid, dw_pts, dw_valid, dst_feats,
         obs_depth, mask_sil_r) = prep
        if n_stages == 1:
            return obs_depth.sum()
        dst_dense = PointCloud(points=dd_pts, valid=dd_valid)
        dst_half = PointCloud(points=dh_pts, valid=dh_valid)
        dst_down = PointCloud(points=dw_pts, valid=dw_valid)
        obs_sil_r = obs_depth > 0

        noise_bound = voxel * 1.5
        corr_thresh = noise_bound * 1.5
        params = TeaserParams(noise_bound=noise_bound)
        n_tpl = tpl_pts.shape[0]
        keys_feat = jax.random.split(kf, n_tpl)
        keys_fine = jax.random.split(kn, n_tpl)

        def feature_hypotheses(tp, tv, tf, k):
            src = PointCloud(points=tp, valid=tv)
            midx, mok = match_features(tf, tv, dst_feats, dst_down.valid)
            if n_stages == 2 and hyp_level == 1:
                return midx.sum() + mok.sum()
            r = ransac_registration(
                k, tp, dst_down.points, midx, mok, corr_thresh, n_iters=2048
            )
            if n_stages == 2 and hyp_level == 2:
                return r.T.sum() + r.corr_mask.sum()
            sol = teaser_solve(tp, dst_down.points[midx], r.corr_mask, params)
            if n_stages == 2 and hyp_level == 3:
                return sol.T.sum()
            return jnp.concatenate(
                [PE._pca_hypotheses(src, dst_down), sol.T[None]], axis=0)

        hyps = jax.vmap(feature_hypotheses)(tpl_pts, tpl_valid, tpl_fpfh,
                                            keys_feat)
        if n_stages == 2:
            return hyps.sum()
        n_hyp = hyps.shape[1]
        flat_T0 = hyps.reshape(n_tpl * n_hyp, 4, 4)
        flat_tpl = jnp.repeat(jnp.arange(n_tpl), n_hyp)
        flat_pts = tpl_pts[flat_tpl]
        flat_val = tpl_valid[flat_tpl]

        def coarse(tp, tv, h):
            src = PointCloud(points=tp, valid=tv)
            # mirror _score_templates: relaxed early-exit under the
            # product-res gate (640x480 here -> 1e-4)
            res = icp_point_to_point(
                src, dst_down, max_corr_dist=3.0 * voxel, init_T=h,
                max_iterations=30, relative_fitness=1e-4,
                relative_rmse=1e-4)
            score = g3.alignment_score(src.transform(res.T), src, dst_down,
                                       voxel)
            return res.T, score

        T_c, s_c = jax.vmap(coarse)(flat_pts, flat_val, flat_T0)
        if n_stages == 3:
            return T_c.sum() + s_c.sum()

        bh_c = jnp.argmin(s_c.reshape(n_tpl, n_hyp), axis=1)
        top = jnp.arange(n_tpl) * n_hyp + bh_c

        from poseestimator_tpu.pipeline.window import (
            window_dims, window_origin)
        from poseestimator_tpu.render.raster import render_depth_mesh

        win_cfg = None if _args.no_window else "auto"
        win_r = (window_dims(intr_r, win_cfg)
                 if render_kind == "mesh" else None)
        win_q = (None if win_r is None
                 else window_dims(intr_q, (max(win_r[0] // 2, 16),
                                           max(win_r[1], 128))))
        n_obs_total = jnp.maximum(jnp.sum(obs_sil_r), 1)
        n_mask_total = jnp.sum(mask_sil_r)

        def _predicted_view(T, ri, k, n, win=None):
            if win is None:
                d_r = PE._render_predicted(render_kind, ra, rb, T, ri)
                view = g3.backproject_depth(d_r, ri, depth_min=0.01,
                                            depth_max=5.0)
            else:
                o = window_origin(ra, T, ri, win[0], win[1])
                d_r = render_depth_mesh(ra, rb, T, ri, near=0.01, far=5.0,
                                        origin=o.astype(jnp.float32),
                                        out_hw=win)
                view = g3.backproject_depth(d_r, ri, depth_min=0.01,
                                            depth_max=5.0, origin=o)
            return g3.random_sample(k, view, n)

        def _view_score(T):
            if win_r is None:
                dep = PE._render_predicted(render_kind, ra, rb, T, intr_r)
                od, msk = obs_depth, mask_sil_r
                out_mask = 0
            else:
                o = window_origin(ra, T, intr_r, win_r[0], win_r[1])
                dep = render_depth_mesh(ra, rb, T, intr_r, near=0.01,
                                        far=5.0, origin=o.astype(jnp.float32),
                                        out_hw=win_r)
                od = jax.lax.dynamic_slice(obs_depth, (o[1], o[0]), win_r)
                msk = jax.lax.dynamic_slice(mask_sil_r, (o[1], o[0]), win_r)
                out_mask = n_mask_total - jnp.sum(msk)
            silv = dep > 0
            obs_s = od > 0
            both = silv & obs_s
            n_both = jnp.maximum(jnp.sum(both), 1)
            dz = jnp.sum(jnp.where(both, jnp.abs(dep - od), 0.0)) / n_both
            inter = jnp.sum(silv & msk)
            union = jnp.maximum(jnp.sum(silv | msk) + out_mask, 1)
            return dz + 1.0 * (1.0 - inter / union)

        use_half = intr_q.width * intr_q.height >= 4096
        early_n = 1024 if use_half else 2048
        early_dst = dst_half if use_half else dst_dense
        early_tol = 1e-4 if use_half else 1e-6
        final_tol = 1e-5 if use_half else 1e-6
        ladder = (
            (1.0, 60, intr_q, early_n, early_dst, early_tol, win_q),
            (0.3, 60, intr_q, early_n, early_dst, early_tol, win_q),
            (0.1, 40, intr_r, 2048, dst_dense, final_tol, win_r),
        )[: n_stages - 3]

        def fine(i, kf_):
            T = T_c[i]
            for s, (dist, iters, ri, n_view, dst_s, tol,
                    win_s) in enumerate(ladder):
                view = _predicted_view(T, ri, jax.random.fold_in(kf_, s),
                                       n_view, win=win_s)
                d = icp_point_to_point(
                    view, dst_s, max_corr_dist=dist * voxel,
                    max_iterations=iters, relative_fitness=tol,
                    relative_rmse=tol)
                T = d.T @ T
            if n_stages >= 7:
                return T, _view_score(T)
            return T, jnp.float32(0)

        T_f, scores = jax.vmap(fine)(top, keys_fine)
        if n_stages < 7:
            return T_f.sum() + scores.sum()
        best = jnp.argmin(scores)
        return T_f[best].sum() + scores[best]

    return prog


if _args.hyp_split:
    STAGES = [
        ((1, 4), "prep (sample+voxel+FPFH dst, obs render)"),
        ((2, 1), "+match (mutual-NN FPFH x5)"),
        ((2, 2), "+RANSAC 2048 x5"),
        ((2, 3), "+TEASER x5"),
        ((2, 4), "+PCA hypotheses (full block)"),
    ]
else:
    STAGES = [
        ((1, 4), "prep (sample+voxel+FPFH dst, obs render)"),
        ((2, 4), "+hypotheses (match+RANSAC2048+TEASER x5)"),
        ((3, 4), "+coarse ICP (25 chains, 30 it)"),
        ((4, 4), "+fine polish stage 1 (q-res, r=1.0v)"),
        ((5, 4), "+fine polish stage 2 (q-res, r=0.3v)"),
        ((6, 4), "+fine polish stage 3 (h-res, r=0.1v)"),
        ((7, 4), "+score+argmin (FULL)"),
    ]

key = jax.random.PRNGKey(1)
reps = _args.reps
results = {}
prev = 0.0
for (n, lvl), label in STAGES:
    prog = build_prefix(n, lvl)
    t0 = time.time()
    jax.block_until_ready(prog(key))
    compile_s = time.time() - t0
    # warm a second call, then pipelined loop
    jax.block_until_ready(prog(jax.random.fold_in(key, 1)))
    t0 = time.time()
    for i in range(reps):
        out = prog(jax.random.fold_in(key, 100 + i))
    np.asarray(out)
    per = (time.time() - t0) / reps * 1000.0
    results[label] = per
    print(f"{label:48s} cum {per:8.2f} ms   marginal {per - prev:8.2f} ms"
          f"   (compile {compile_s:.1f}s)")
    prev = per

print(json.dumps({k: round(v, 2) for k, v in results.items()}))
