"""Drop-in PoseEstimator: template-matching global pose + render-at-pose.

Parity with reference EstimHelpers/PoseEstimator.py:
  - ctor(cad_path, pcd_path, intr, K, target_points) loads the CAD mesh,
    loads-or-renders the template DB (disk cache), and prepares the renderer
    (here: a presampled CAD surface + jitted point-splat programs instead of a
    Filament scene);
  - ``find_best_template_teaser(dst_cloud)`` -> (T, src_down): voxel 0.05
    downsample, FPFH + RANSAC correspondences, TEASER solve (PMC_EXACT/CHAIN
    parameterization of HelpersRealtime.run_teaser), ICP(0.05, <=1000) refine,
    alignment-score selection across all templates — the whole search is ONE
    jitted program with the template axis vmapped;
  - ``create_template_from_H(T_m2c, target_points)`` -> camera-frame cloud of
    the CAD rendered at the pose (PoseEstimator.py:118-140).

Note: the reference keeps the PRE-ICP transform of the best template
(PoseEstimator.py:113, flagged in SURVEY.md section 2.4 as refinement computed
then discarded). Default here returns the ICP-refined pose; pass
``keep_pre_icp=True`` for bit-behavior parity.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import geom3d as g3
from ..geom3d.cloud import PointCloud
from ..registration import (
    TeaserParams,
    icp_point_to_point,
    match_features,
    ransac_registration,
    teaser_solve,
)
from ..render.mesh import TriangleMesh, decimate_to_faces, pad_faces
from ..render.points import render_depth
from ..render.raster import render_depth_mesh
from ..templates.db import TemplateDB, load_templates
from .window import window_dims, window_for_object, window_origin

_SEARCH_CAP = 1024  # per-cloud point budget after voxel downsample
# CAD points splatted per search render: ~4x the object's pixel area at the
# half-res scoring view, dense enough for hole-free silhouettes at half the
# scatter cost of the tracking render set
SEARCH_RENDER_SAMPLES = 20_000
RENDER_SAMPLES = 150_000
TRACK_RENDER_SAMPLES = 40_000
# face budget for the triangle-raster predicted views (cost linear in faces);
# CADs above it are vertex-cluster decimated once at load
RASTER_FACE_CAP = 4096


def raster_assets(mesh: TriangleMesh, cap: int = RASTER_FACE_CAP):
    """(vertices (V,3) f32, faces (F,3) i32) device arrays for the exact
    predicted-view rasterizer, decimated to ``cap`` faces and padded to a
    256-multiple (per-CAD compile stability)."""
    m = decimate_to_faces(mesh, cap)
    f = pad_faces(m.faces, -(-max(len(m.faces), 1) // 256) * 256)
    return jnp.asarray(m.vertices), jnp.asarray(f)


def _render_predicted(render_kind: str, ra, rb, T, intr_r):
    """The predicted-view depth instrument, switched by STATIC kind:
    'mesh' -> exact triangle raster of (vertices, faces) — the product
    path (the splat biases the surface ~6 mm toward the camera via its
    3x3 scatter-min and dilates the silhouette 1 px; measured, see
    tests/test_raster.py); 'points' -> legacy splat of (points, valid)
    for point-cloud-only CADs (e.g. the synthetic sharded-search
    fixtures)."""
    if render_kind == "mesh":
        return render_depth_mesh(ra, rb, T, intr_r, near=0.01, far=5.0)
    return render_depth(ra, rb, T, intr_r, near=0.01, far=5.0)


def _extract_fpfh(cloud: PointCloud, voxel_size: float, outward: bool = False):
    """HelpersRealtime.extract_fpfh parity (HelpersRealtime.py:215-224):
    normals with radius=voxel, max_nn=30; FPFH with radius=5*voxel, max_nn=100.

    Normal sign convention (the reference leaves it arbitrary; we make it
    consistent so FPFH matches across frames): surface normals point AWAY from
    the object. For camera-frame clouds that is toward the camera origin; for
    model-frame template clouds (origin inside the object) it is away from the
    centroid — pass ``outward=True``.
    """
    if outward:
        c = g3.estimate_normals(cloud, radius=voxel_size, max_nn=30,
                                orient_towards=cloud.centroid())
        c = c.replace(normals=-c.normals)
    else:
        c = g3.estimate_normals(cloud, radius=voxel_size, max_nn=30,
                                orient_towards=jnp.zeros(3))
    feats, _ = g3.compute_fpfh(c, radius=voxel_size * 5.0, max_nn=100)
    return c, feats


class PoseEstimator:
    def __init__(
        self,
        cad_path: str,
        pcd_path: str,
        intr,
        K: Optional[np.ndarray] = None,
        target_points: int = 200,
        voxel_size: float = 0.05,
        seed: int = 0,
        view_set: str = "reduced",
        mesh_devices=None,
        shard_axis: str = "tp",
        search_window="auto",
        search_score_res: int = 2,
        search_polish: int = 1,
        search_final_topk: int = 6,
    ):
        if intr is None:
            return  # reference ctor bails on missing intrinsics (PoseEstimator.py:26)
        self.intr = _as_intrinsics(intr, K)
        self.K = self.intr.K if K is None else np.asarray(K).reshape(3, 3)
        self.target_points = target_points
        self.voxel_size = float(voxel_size)
        self._key = jax.random.PRNGKey(seed)
        # optional jax.sharding.Mesh: shard the template axis of the global
        # search over devices (SURVEY section 5 template-axis parallelism);
        # None = single-chip fused program. (``self.mesh`` is the CAD
        # TriangleMesh, reference-surface naming.)
        self.device_mesh = mesh_devices
        self.shard_axis = shard_axis
        # object-window rasterization config for the search's predicted
        # views ("auto" | None | (h, w) at the half-res scoring view — see
        # pipeline/window.py)
        self.search_window = search_window
        # scoring-view resolution (2 = half res, tracking parity; 1 = full
        # res silhouette/depth scoring) and per-template polish width (how
        # many coarse hypotheses get the render-ICP polish)
        self.search_score_res = int(search_score_res)
        self.search_polish = int(search_polish)
        # precision-grade final polish stage runs on this many best chains
        # only (the dominant per-template polish cost; losers keep their
        # early-polish pose/score). Applies to the single-chip path; the
        # sharded path polishes everything (partition independence). 0/None
        # disables the prune.
        self.search_final_topk = (int(search_final_topk)
                                  if search_final_topk else None)

        mesh = TriangleMesh.load(cad_path)
        if np.max(mesh.extent) >= 1.0:  # mm-scale CAD -> meters
            mesh = mesh.scale(0.001, center=np.zeros(3))
        self.mesh = mesh
        # exact-raster assets: the product predicted-view instrument
        self._mesh_v, self._mesh_f = raster_assets(mesh)
        pts, nrm = mesh.sample_points_uniformly(RENDER_SAMPLES, np.random.default_rng(seed))
        self._cad_pts = jnp.asarray(pts)
        self._cad_valid = jnp.ones(len(pts), bool)
        # lighter point set for the per-frame tracking render (the z-buffer
        # scatter scales with point count; 40k covers a half-res 640x480 view)
        n_track = min(TRACK_RENDER_SAMPLES, len(pts))
        self._cad_pts_track = self._cad_pts[:n_track]
        self._cad_valid_track = jnp.ones(n_track, bool)

        self.templates: TemplateDB = load_templates(pcd_path, cad_path, view_set=view_set)
        self._prepare_templates()

    # --- template preparation: voxel downsample + FPFH once, stacked ---
    def _prepare_templates(self):
        downs, feats = [], []
        for i in range(self.templates.count):
            tc = self.templates.cloud(i)
            down = g3.voxel_down_sample(tc, self.voxel_size, capacity=_SEARCH_CAP)
            down, f = _extract_fpfh(down, self.voxel_size, outward=True)
            downs.append(down)
            feats.append(f)
        # adaptive search capacity: every NN/FPFH/RANSAC/TEASER cost in the
        # search scales with the PADDED capacity, not the valid count —
        # a small CAD occupies ~1e2 voxels at the 5 cm grid yet would pay
        # full 1024-cap prices. Size the template axis to the largest real
        # voxel count (voxel_down_sample compacts valid to the front, so a
        # slice keeps every point), and the observation working set to 4x
        # that (mask bleed / close-range margin), both 128-aligned for
        # compile-cache stability.
        n_max = max(int(np.asarray(d.valid.sum())) for d in downs)
        tpl_cap = min(_SEARCH_CAP, max(128, -(-n_max // 128) * 128))
        self._tpl_points = jnp.stack(
            [d.points[:tpl_cap] for d in downs])  # (T, C, 3)
        self._tpl_valid = jnp.stack([d.valid[:tpl_cap] for d in downs])
        self._tpl_fpfh = jnp.stack(feats)[:, :tpl_cap]  # (T, C, 33)
        self._search_cap = int(min(_SEARCH_CAP, max(512, 4 * tpl_cap)))

    # --- global template search -------------------------------------------
    def find_best_template_teaser(self, dst_cloud: PointCloud, keep_pre_icp: bool = False,
                                  mask=None):
        """Best-template global registration. Returns ``(T (4,4) np.ndarray,
        src_down PointCloud)`` like the reference (PoseEstimator.py:116)."""
        H, src_down, _ = self.find_best_template_candidates(dst_cloud, keep_pre_icp, mask)
        return H, src_down

    def find_best_template_candidates(
        self, dst_cloud: PointCloud, keep_pre_icp: bool = False, mask=None
    ):
        """Like find_best_template_teaser, but also returns the full ranked
        candidate list ``[(score, T, template_idx), ...]`` (best first) so
        callers can disambiguate near-symmetric poses downstream (e.g. by
        temporal consistency) — single partial views of near-symmetric
        objects can rank a flipped pose first.

        ``mask``: optional (H, W) detection mask. When given, candidate
        scoring uses it as a DENSE observed silhouette (the splatted-cloud
        silhouette has sampling holes, which blinds the score to tangential
        pose slides — the dominant residual ambiguity on smooth faces)."""
        self._key, k = jax.random.split(self._key)
        if mask is not None:
            obs_sil = jnp.asarray(mask).astype(bool)
            have_mask = True
        else:
            obs_sil = jnp.zeros((self.intr.height, self.intr.width), bool)
            have_mask = False
        win = self.search_window
        if win == "auto":
            # size the static window bucket to THIS observation's distance
            # (a fixed window crops objects that project larger than it —
            # see window_for_object); re-picks per init call, so the jit
            # cache holds one program per distance bucket
            pts = np.asarray(dst_cloud.points)
            val = np.asarray(dst_cloud.valid)
            z = float(np.median(pts[val, 2])) if val.any() else 1.0
            diag = float(np.linalg.norm(self.mesh.extent))
            win = window_for_object(
                _down_intr(self.intr, self.search_score_res), diag, z)
        if self.device_mesh is not None:
            tp, tv, tf, n_real = self._padded_templates()
            Hp_all, Hr_all, scores = _search_templates_sharded(
                self.device_mesh, dst_cloud.points, dst_cloud.valid, tp, tv, tf,
                "mesh", self._mesh_v, self._mesh_f, self.intr,
                obs_sil, have_mask, jnp.float32(self.voxel_size), k,
                axis=self.shard_axis, win_hw=win,
                score_res=self.search_score_res, n_polish=self.search_polish,
                dst_cap=self._search_cap,
            )
            # drop pad copies; pick the winner over the real slice
            scores = np.asarray(scores)[:n_real]
            Ts_all = np.asarray(Hr_all)[:n_real]
            i = int(np.argmin(scores))
            H = np.asarray(Hp_all)[i] if keep_pre_icp else Ts_all[i]
        else:
            H_pre, H_ref, best_idx, scores, Ts_all = _search_templates(
                dst_cloud.points, dst_cloud.valid,
                self._tpl_points, self._tpl_valid, self._tpl_fpfh,
                "mesh", self._mesh_v, self._mesh_f, self.intr,
                obs_sil, have_mask,
                jnp.float32(self.voxel_size), k, win_hw=win,
                score_res=self.search_score_res, n_polish=self.search_polish,
                n_final=self.search_final_topk, dst_cap=self._search_cap,
            )
            H = H_pre if keep_pre_icp else H_ref
            i = int(best_idx)
            scores = np.asarray(scores)
            Ts_all = np.asarray(Ts_all)
        src_down = PointCloud(points=self._tpl_points[i], valid=self._tpl_valid[i])
        order = np.argsort(scores)
        candidates = [(float(scores[j]), Ts_all[j], int(j)) for j in order]
        return np.asarray(H), src_down, candidates

    def _padded_templates(self):
        """Template arrays padded (by repetition) to a multiple of the mesh's
        shard-axis size; returns (pts, valid, fpfh, n_real)."""
        n = self._tpl_points.shape[0]
        n_dev = self.device_mesh.shape[self.shard_axis]
        pad = (-n) % n_dev
        if pad == 0:
            return self._tpl_points, self._tpl_valid, self._tpl_fpfh, n
        # pad may exceed n (e.g. 5 templates on a 16-way axis): tile whole
        # copies, then slice — a single a[:pad] would under-pad there
        reps = -(-(n + pad) // n)
        rep = lambda a: jnp.concatenate([a] * reps, axis=0)[: n + pad]
        return (rep(self._tpl_points), rep(self._tpl_valid),
                rep(self._tpl_fpfh), n)

    # --- render CAD at pose, return sparse camera-frame cloud --------------
    def create_template_from_H(self, T_m2c, target_points: Optional[int] = None) -> PointCloud:
        n = int(target_points or self.target_points)
        self._key, k = jax.random.split(self._key)
        return _render_template(
            self._mesh_v, self._mesh_f, jnp.asarray(T_m2c, jnp.float32),
            self.intr, n, k,
        )


def _as_intrinsics(intr, K):
    if isinstance(intr, g3.Intrinsics):
        return intr
    # realsense-style object with fx/fy/ppx/ppy/width/height
    if hasattr(intr, "ppx"):
        return g3.Intrinsics(
            fx=float(intr.fx), fy=float(intr.fy), cx=float(intr.ppx), cy=float(intr.ppy),
            width=int(intr.width), height=int(intr.height),
        )
    raise TypeError(f"cannot interpret intrinsics {type(intr)}")


_PCA_SIGNS = jnp.array(
    [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], jnp.float32
)  # the 4 det=+1 axis-sign assignments of a PCA frame


def _pca_hypotheses(src: PointCloud, dst: PointCloud) -> jnp.ndarray:
    """(4, 4, 4) rigid hypotheses aligning src centroid+PCA axes to dst under
    every sign disambiguation (PCA axes have no canonical sign on partial
    views, so all four right-handed assignments are tried in parallel)."""
    c_s, c_d = src.centroid(), dst.centroid()
    R_s, _ = g3.pca_axes(src)
    R_d, _ = g3.pca_axes(dst)

    def mk(s):
        R0 = R_d @ (R_s * s[None, :]).T  # R_d diag(s) R_s^T
        return g3.make_T(R0, c_d - R0 @ c_s)

    return jax.vmap(mk)(_PCA_SIGNS)


def _down_intr(intr, r):
    return g3.Intrinsics(
        fx=intr.fx / r, fy=intr.fy / r, cx=intr.cx / r, cy=intr.cy / r,
        width=intr.width // r, height=intr.height // r,
    )


def _prep_dst(dst_pts, dst_valid, intr, mask_sil, have_mask, voxel, key,
              score_res: int = 2, dst_cap: int = _SEARCH_CAP):
    """Observation-side preparation, computed ONCE per search (replicated when
    the template axis is sharded): dense working set, voxel+FPFH downsample,
    and the splat-rendered observed depth the render-ICP polish scores
    against.

    ``score_res``: scoring-view downscale (2 = half res, the tracking step's
    render scale; 1 = full res — sharper silhouette IoU, no mask-pooling
    dilation, for the init-accuracy operating point)."""
    dst = PointCloud(points=dst_pts, valid=dst_valid)
    kd, kh = jax.random.split(key)
    # spatially-uniform 4096-point working set (compact() would truncate in
    # raster order and keep only the top of the object)
    dst_dense = g3.random_sample(kd, dst, 4096)
    # half-size working set for the WIDE-radius early polish stages: their
    # NN pass dominates the search's device time and a coarser target loses
    # nothing while the correspondence radius is >= the sampling gap (the
    # final sub-cm stage registers against the full dst_dense). Sampled from
    # the source cloud, NOT a prefix of dst_dense — the stratified sampler
    # gathers in raster-bin order, so a prefix would be the raster TOP.
    dst_half = g3.random_sample(kh, dst, 2048)
    # ``dst_cap``: padded capacity of the voxel working set. The NN/FPFH/
    # RANSAC/TEASER costs scale with the PADDED capacity, not the valid
    # count, so small objects pay 1024-cap prices for ~100 occupied voxels
    # unless the estimator passes its adaptive cap (see _prepare_templates).
    dst_down = g3.voxel_down_sample(dst, voxel, capacity=dst_cap)
    dst_down, dst_feats = _extract_fpfh(dst_down, voxel)

    intr_r = _down_intr(intr, score_res)  # scoring res (2 = tracking parity)
    # the observed cloud rendered with splat=0: each sample claims only its
    # own pixel, so the sparse observed depth is UNBIASED (a 3x3 splat's
    # scatter-min pulls the surface ~6 mm toward the camera — measured,
    # tests/test_raster.py). The predicted side is the exact triangle
    # raster; depth residuals are averaged over the both-covered pixels, so
    # sparse-but-unbiased observation coverage costs only variance
    obs_depth = render_depth(
        dst_dense.points, dst_dense.valid, jnp.eye(4), intr_r,
        near=0.01, far=5.0, splat=0,
    )
    # detection mask any-pooled to the scoring resolution (score_res=1:
    # the raw mask, no pooling dilation)
    Hr, Wr = intr_r.height, intr_r.width
    sr = score_res
    mask_sil_r = (
        mask_sil[: Hr * sr, : Wr * sr].reshape(Hr, sr, Wr, sr).any(axis=(1, 3))
        if have_mask else obs_depth > 0
    )
    return (dst_dense.points, dst_dense.valid, dst_half.points, dst_half.valid,
            dst_down.points, dst_down.valid, dst_feats, obs_depth, mask_sil_r)


def _score_templates(prep, tpl_pts, tpl_valid, tpl_fpfh, keys_feat, keys_fine,
                     render_kind, ra, rb, intr, have_mask, voxel,
                     win_hw="auto", score_res: int = 2, n_polish: int = 1,
                     n_final=None, strict: bool = False):
    """Score a SLICE of templates against the prepared observation — the
    per-template half of the search. This is the unit that shards over the
    template axis (SURVEY section 5 "template-axis parallelism"): all inputs
    except ``prep``/``cad_*`` carry a leading template dimension, per-template
    PRNG keys ride with their templates, so results are independent of how
    the axis is partitioned.

    ``render_kind``/``ra``/``rb``: the predicted-view instrument
    (see ``_render_predicted``) — ("mesh", vertices, faces) in the product,
    ("points", points, valid) for point-cloud-only CADs.

    Per template: 4 PCA-sign pre-alignments PLUS the FPFH->RANSAC->TEASER
    estimate (HelpersRealtime.run_teaser parameterization) give 5 hypotheses
    (FPFH alone is ambiguous on plane-dominated objects; the PCA hypotheses
    cover exactly that failure mode). The feature path and 30-iteration
    coarse ICP are vmapped across all (template x hypothesis) pairs — batched
    fixed-iteration MXU work — then only the coarse-best hypothesis of each
    template runs the visibility-aware render-ICP polish: the full CAD is
    rendered AT the hypothesis pose (exactly what the tracking step does each
    frame), the predicted view is registered to the dense observed cloud with
    a shrinking correspondence radius, and the hypothesis is re-scored on the
    (predicted view, observed cloud) pair. Only the true pose reproduces the
    observed view, so flipped near-symmetric hypotheses separate cleanly.

    Returns (H_pre (t, 4, 4), H_ref (t, 4, 4), scores (t,)).
    """
    (dd_pts, dd_valid, dh_pts, dh_valid, dw_pts, dw_valid, dst_feats,
     obs_depth, mask_sil_r) = prep
    dst_dense = PointCloud(points=dd_pts, valid=dd_valid)
    dst_half = PointCloud(points=dh_pts, valid=dh_valid)
    dst_down = PointCloud(points=dw_pts, valid=dw_valid)
    obs_sil_r = obs_depth > 0

    intr_r = _down_intr(intr, score_res)
    intr_q = _down_intr(intr, 4)  # cheap res for the early polish stages

    # object-window rasterization (pipeline/window.py): every predicted view
    # and view score renders only a fixed window around the hypothesis's
    # projected object — the dominant cost of the polish + scoring stages
    # scales with rendered tiles. The window score below is algebraically
    # EQUAL to the full-frame score whenever the window covers the predicted
    # silhouette (out-of-window observed/mask pixels enter the IoU/miss
    # terms through their full-frame totals). Static config; tiny test
    # cameras stay full-frame under "auto".
    win_default = (256 // score_res, 256 // score_res)
    win_r = (window_dims(intr_r, win_hw, default=win_default)
             if render_kind == "mesh" else None)
    # quarter-res window covering the same physical neighborhood as win_r
    # (win_r is at the score_res view; the polish's early stages render at
    # res 4); width floored at one 128-lane tile
    win_q = (None if win_r is None
             else window_dims(intr_q, (
                 max(win_r[0] * score_res // 4, 16),
                 max(win_r[1] * score_res // 4, 128))))
    n_obs_total = jnp.maximum(jnp.sum(obs_sil_r), 1)
    n_mask_total = jnp.sum(mask_sil_r)

    def _predicted_view(T, ri, k, n, win=None):
        if win is None:
            d_r = _render_predicted(render_kind, ra, rb, T, ri)
            view = g3.backproject_depth(d_r, ri, depth_min=0.01, depth_max=5.0)
        else:
            o = window_origin(ra, T, ri, win[0], win[1])
            d_r = render_depth_mesh(ra, rb, T, ri, near=0.01, far=5.0,
                                    origin=o.astype(jnp.float32), out_hw=win)
            view = g3.backproject_depth(d_r, ri, depth_min=0.01,
                                        depth_max=5.0, origin=o)
        # spatially-uniform working set (compact() would keep the raster-top
        # of objects covering more than n pixels)
        return g3.random_sample(k, view, n)

    def _view_score(T):
        if win_r is None:
            dep = _render_predicted(render_kind, ra, rb, T, intr_r)
            obs_d, obs_s, msk = obs_depth, obs_sil_r, mask_sil_r
            out_mask = 0
            out_obs = 0
        else:
            o = window_origin(ra, T, intr_r, win_r[0], win_r[1])
            dep = render_depth_mesh(ra, rb, T, intr_r, near=0.01, far=5.0,
                                    origin=o.astype(jnp.float32), out_hw=win_r)
            obs_d = jax.lax.dynamic_slice(obs_depth, (o[1], o[0]), win_r)
            obs_s = obs_d > 0
            msk = jax.lax.dynamic_slice(mask_sil_r, (o[1], o[0]), win_r)
            out_mask = n_mask_total - jnp.sum(msk)
            out_obs = n_obs_total - jnp.sum(obs_s)
        sil = dep > 0
        both = sil & obs_s
        n_both = jnp.maximum(jnp.sum(both), 1)
        dz = jnp.sum(jnp.where(both, jnp.abs(dep - obs_d), 0.0)) / n_both
        if have_mask:
            # dense detection-mask silhouette, compared at HALF resolution:
            # symmetric IoU sees tangential pose slides that depth
            # residuals on smooth faces cannot (the dominant residual
            # ambiguity). With the exact raster on the predicted side, dz
            # no longer floors at the old splat's ~1 cm quantization; the
            # silhouette term keeps weight 1.0 because it carries the
            # tangential-slide signal depth cannot. The any-pooled mask's
            # ~0.5 px dilation is the remaining (small, one-sided)
            # silhouette bias. Windowed: sil is zero outside the window, so
            # out-of-window mask pixels contribute to the union only.
            inter = jnp.sum(sil & msk)
            union = jnp.maximum(jnp.sum(sil | msk) + out_mask, 1)
            return dz + 1.0 * (1.0 - inter / union)
        # the splat=0 observed silhouette is sparse (sample pixels only):
        # only the one-sided penalty is meaningful (observed pixels the
        # dense prediction fails to cover); symmetric IoU would reward
        # smaller flipped views
        miss = (jnp.sum(obs_s & ~sil) + out_obs) / n_obs_total
        return dz + 0.25 * miss

    noise_bound = voxel * 1.5  # HelpersRealtime.py:139
    corr_thresh = noise_bound * 1.5  # :140
    params = TeaserParams(noise_bound=noise_bound)

    n_tpl = tpl_pts.shape[0]
    # static resolution gate shared by the coarse stage and the polish ladder
    # (see the `fine` docnotes): product-res cameras run relaxed early-exit
    # tolerances; tiny test cameras keep the strict bitwise-reproducible
    # regime (test_scores_independent_of_mesh_size).
    intr_q_px = _down_intr(intr, 4)
    # ``strict=True`` forces the Open3D-parity 1e-6 tolerance regime at ANY
    # resolution — the A/B instrument guarding the relaxed product regime
    # (tests/test_pipeline.py::test_relaxed_regime_winner_matches_strict)
    use_half = (not strict) and intr_q_px.width * intr_q_px.height >= 4096

    def feature_hypotheses(tp, tv, tf, k):
        src = PointCloud(points=tp, valid=tv)
        midx, mok = match_features(tf, tv, dst_feats, dst_down.valid)
        r = ransac_registration(
            k, tp, dst_down.points, midx, mok, corr_thresh, n_iters=2048
        )
        sol = teaser_solve(tp, dst_down.points[midx], r.corr_mask, params)
        # hypothesis set: 4 PCA sign alignments + TEASER
        return jnp.concatenate([_pca_hypotheses(src, dst_down), sol.T[None]], axis=0)

    hyps = jax.vmap(feature_hypotheses)(tpl_pts, tpl_valid, tpl_fpfh, keys_feat)
    n_hyp = hyps.shape[1]  # 5
    flat_T0 = hyps.reshape(n_tpl * n_hyp, 4, 4)
    flat_tpl = jnp.repeat(jnp.arange(n_tpl), n_hyp)
    flat_pts = tpl_pts[flat_tpl]  # (t*5, C, 3)
    flat_val = tpl_valid[flat_tpl]

    def coarse(tp, tv, h):
        src = PointCloud(points=tp, valid=tv)
        # relaxed early-exit under the product-res gate: all 25 chains run in
        # ONE vmapped while_loop that executes to its slowest member, and at
        # 1e-6 the wandering decoy hypotheses drag every chain to the 30-cap
        # (the polish re-registers the winner from scratch anyway, so coarse
        # only has to land the right basin — measured: winner unchanged,
        # coarse stage 15.5 -> ~halved on v5e)
        tol = 1e-4 if use_half else 1e-6
        res = icp_point_to_point(
            src, dst_down, max_corr_dist=3.0 * voxel, init_T=h,
            max_iterations=30, relative_fitness=tol, relative_rmse=tol,
        )
        score = g3.alignment_score(src.transform(res.T), src, dst_down, voxel)
        return res.T, score

    T_c, s_c = jax.vmap(coarse)(flat_pts, flat_val, flat_T0)

    # fine+polish the coarse-best hypothesis of EACH template (not a global
    # top-k: coarse scores on the sparse grids are noisy enough to starve a
    # whole template of refinement, and the cross-template decision must be
    # made on comparable dense re-scores). ``n_polish`` > 1 additionally
    # polishes the next-best coarse hypotheses of each template — the coarse
    # grid can misrank basins within a template — and keeps the better
    # polished result.
    s_t = s_c.reshape(n_tpl, n_hyp)
    if n_polish == 1:
        bh_c = jnp.argmin(s_t, axis=1)
        top = jnp.arange(n_tpl) * n_hyp + bh_c
    else:
        _, bh_k = jax.lax.top_k(-s_t, n_polish)  # (t, k) smallest coarse
        top = (jnp.arange(n_tpl)[:, None] * n_hyp + bh_k).reshape(-1)

    # render-ICP polish straight from the coarse result: register the
    # predicted view (the CAD rendered at the current pose estimate) to
    # the dense observed cloud, radius shrinking past the voxel floor;
    # deltas compose in camera frame. Early (wide-radius) stages render
    # at quarter resolution — the radius is far above the render
    # quantization there — and only the final sub-cm stage pays for half
    # resolution (init latency budget: bench template_search_ms).
    # working-set ladder: the wide-radius quarter-res stages run on
    # half-size clouds (their NN pass is the search's dominant device
    # cost and the correspondence radius far exceeds the sampling gap);
    # only the final sub-cm stage pays for the full 2048 x 4096 pairing.
    # Static gate: at tiny camera resolutions the quarter-res view has
    # too few pixels for the half sets to carry the basin (measured ADD
    # regression at 128x96), so the ladder engages only when the
    # quarter-res view is dense enough — 640x480 and up. (`use_half` is
    # the shared gate computed in the enclosing scope; the coarse stage
    # keys its relaxed tolerance off the same flag.)
    early_n = 1024 if use_half else 2048
    early_dst = dst_half if use_half else dst_dense
    # under the same gate, early stages run a relaxed 1e-4 convergence
    # tolerance: the vmapped while_loops run to the SLOWEST batch member,
    # and at 1e-6 (micron-scale changes) the slowly-wandering decoy
    # templates drag every chain to near the iteration caps (measured
    # 50/58/35 of 60/60/40 -> 36/12/16 relaxed, winner pose unchanged).
    # The final stage runs 1e-5 under the same gate — its per-iteration
    # rmse deltas at that point are <= 10 um, two orders below the
    # sub-cm accuracy target, and the strict tail cost 20.7 ms of the
    # realistic-scene search (tools/profile_search.py --realistic);
    # tiny-camera (test) configurations keep Open3D-parity 1e-6
    # end-to-end. Gated because an
    # early-exit decision near the threshold is sensitive to
    # batch-size-dependent fp rounding: in the strict regime sharded
    # scores are bitwise-independent of the partitioning
    # (test_scores_independent_of_mesh_size); relaxed, they agree to fp
    # noise only.
    early_tol = 1e-4 if use_half else 1e-6
    final_tol = 1e-5 if use_half else 1e-6
    ladder_early = (
        (1.0, 60, intr_q, early_n, early_dst, early_tol, win_q),
        (0.3, 60, intr_q, early_n, early_dst, early_tol, win_q),
    )
    ladder_final = ((0.1, 40, intr_r, 2048, dst_dense, final_tol, win_r),)

    def _polish(T, kf, stages, s0):
        # stage index s0 keeps the per-stage key folds identical whether the
        # ladder runs fused or split at the final-stage prune point
        for s, (dist, iters, ri, n_view, dst_s, tol, win_s) in enumerate(
                stages, s0):
            view = _predicted_view(T, ri, jax.random.fold_in(kf, s), n_view,
                                   win=win_s)
            d = icp_point_to_point(
                view, dst_s, max_corr_dist=dist * voxel,
                max_iterations=iters, relative_fitness=tol, relative_rmse=tol,
            )
            T = d.T @ T
        return T

    def fine_early(i, kf):
        return _polish(T_c[i], kf, ladder_early, 0)

    def fine_last(T, kf):
        T = _polish(T, kf, ladder_final, 2)
        return T, _view_score(T)

    def run_chains(tops, kfs):
        """Polish each chain; the precision-grade final stage (the dominant
        polish cost: full dense pairing at the scoring res) optionally runs
        only on the ``n_final`` best chains after a mid-ladder re-score —
        the rest keep their early-polish pose and score, which is plenty to
        rank them as losers. n_final=None (the sharded path, whose scores
        must be partition-independent) polishes every chain."""
        T12 = jax.vmap(fine_early)(tops, kfs)
        nc = tops.shape[0]
        if n_final is None or n_final >= nc:
            return jax.vmap(fine_last)(T12, kfs)
        s12 = jax.vmap(_view_score)(T12)
        _, sel = jax.lax.top_k(-s12, n_final)
        T3, s3 = jax.vmap(fine_last)(T12[sel], kfs[sel])
        return T12.at[sel].set(T3), s12.at[sel].set(s3)

    # one fine chain per (template x polished hypothesis) -> per-template
    # candidates are the BEST polished result of each template; render-based
    # scores are mutually comparable (coarse scores are a different,
    # sparser-scale instrument). vmapped: with capped iteration counts,
    # batching the while_loops (they run to the slowest member) beats
    # sequential chains. n_polish == 1 keeps the exact legacy key/consumer
    # pattern (bitwise shard-independence tests pin it).
    if n_polish == 1:
        T_f, scores = run_chains(top, keys_fine)
        return flat_T0[top], T_f, scores
    kf_k = jax.vmap(
        lambda kk: jax.vmap(lambda j: jax.random.fold_in(kk, j))(
            jnp.arange(n_polish))
    )(keys_fine).reshape((n_tpl * n_polish,) + keys_fine.shape[1:])
    T_f, sc = run_chains(top, kf_k)
    sc_t = sc.reshape(n_tpl, n_polish)
    pick = jnp.argmin(sc_t, axis=1)
    rows = jnp.arange(n_tpl)
    scores = sc_t[rows, pick]
    T_f = T_f.reshape(n_tpl, n_polish, 4, 4)[rows, pick]
    H_pre = flat_T0[top].reshape(n_tpl, n_polish, 4, 4)[rows, pick]
    return H_pre, T_f, scores


@partial(jax.jit, static_argnames=("render_kind", "intr", "have_mask",
                                   "win_hw", "score_res", "n_polish",
                                   "n_final", "dst_cap", "strict"))
def _search_templates(dst_pts, dst_valid, tpl_pts, tpl_valid, tpl_fpfh,
                      render_kind, ra, rb, intr, mask_sil, have_mask,
                      voxel, key, win_hw="auto", score_res: int = 2,
                      n_polish: int = 1, n_final=None,
                      dst_cap: int = _SEARCH_CAP, strict: bool = False):
    """The fused single-chip template-search program (one compile, reruns per
    init): ``_prep_dst`` + ``_score_templates`` over the full template set +
    winner argmin. The sharded variant (``_search_templates_sharded``) runs
    the SAME ``_score_templates`` body over template slices on a device mesh.
    """
    kd, kf, kn = jax.random.split(key, 3)
    prep = _prep_dst(dst_pts, dst_valid, intr, mask_sil, have_mask, voxel, kd,
                     score_res=score_res, dst_cap=dst_cap)
    n_tpl = tpl_pts.shape[0]
    H_pre, H_ref, scores = _score_templates(
        prep, tpl_pts, tpl_valid, tpl_fpfh,
        jax.random.split(kf, n_tpl), jax.random.split(kn, n_tpl),
        render_kind, ra, rb, intr, have_mask, voxel, win_hw=win_hw,
        score_res=score_res, n_polish=n_polish, n_final=n_final,
        strict=strict,
    )
    best = jnp.argmin(scores)
    return H_pre[best], H_ref[best], best, scores, H_ref


@partial(jax.jit, static_argnames=("intr", "have_mask", "n_tpl", "score_res",
                                   "dst_cap"))
def _prep_and_keys(dst_pts, dst_valid, mask_sil, voxel, key, intr, have_mask,
                   n_tpl, score_res: int = 2, dst_cap: int = _SEARCH_CAP):
    kd, kf, kn = jax.random.split(key, 3)
    prep = _prep_dst(dst_pts, dst_valid, intr, mask_sil, have_mask, voxel, kd,
                     score_res=score_res, dst_cap=dst_cap)
    return prep, jax.random.split(kf, n_tpl), jax.random.split(kn, n_tpl)


@lru_cache(maxsize=16)
def _sharded_slice_fn(mesh, axis, intr, have_mask, render_kind, win_hw,
                      score_res=2, n_polish=1):
    """jitted shard_map of ``_score_templates`` over template slices
    (cached so the product init path compiles once per configuration)."""
    from jax.sharding import PartitionSpec as P

    def slice_fn(prep, tp, tv, tf, kft, kfn, cp, cv, vox):
        H_pre, H_ref, scores = _score_templates(
            prep, tp, tv, tf, kft, kfn, render_kind, cp, cv, intr, have_mask,
            vox, win_hw=win_hw, score_res=score_res, n_polish=n_polish
        )
        gather = lambda a: jax.lax.all_gather(a, axis, tiled=True)
        return gather(H_pre), gather(H_ref), gather(scores)

    return jax.jit(
        jax.shard_map(
            slice_fn, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(), P(), P()),
            out_specs=(P(), P(), P()),
            # all_gather(tiled) makes outputs bitwise-replicated; the static
            # varying-axis check cannot infer that
            check_vma=False,
        )
    )


def _search_templates_sharded(mesh, dst_pts, dst_valid, tpl_pts, tpl_valid,
                              tpl_fpfh, render_kind, ra, rb, intr, mask_sil,
                              have_mask, voxel, key, axis: str = "tp",
                              win_hw="auto", score_res: int = 2,
                              n_polish: int = 1, dst_cap: int = _SEARCH_CAP):
    """Template-axis sharded search: the PRODUCT search program distributed
    over a device mesh. Observation prep is computed once (replicated); each
    device scores its template slice with ``_score_templates`` (per-template
    keys ride with their slice, so scores are independent of the
    partitioning — bitwise in the strict-tolerance regime, to fp-reduction
    noise at product resolutions where the polish's gated early-exit
    tolerance makes iteration counts sensitive to batch-size-dependent
    rounding); results ride ICI via a tiled all_gather.

    Returns the FULL per-template ``(H_pre (T,4,4), H_ref (T,4,4),
    scores (T,))`` (no winner selection — callers that pad the template axis
    slice to the real count first). The template count must be divisible by
    the mesh axis size (PoseEstimator pads with repeats).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_tpl = tpl_pts.shape[0]
    n_dev = mesh.shape[axis]
    assert n_tpl % n_dev == 0, (n_tpl, n_dev)

    prep, keys_feat, keys_fine = _prep_and_keys(
        dst_pts, dst_valid, mask_sil, voxel, key, intr, have_mask, n_tpl,
        score_res=score_res, dst_cap=dst_cap
    )
    fn = _sharded_slice_fn(mesh, axis, intr, have_mask, render_kind, win_hw,
                           score_res, n_polish)
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    put = lambda a, s: jax.tree.map(lambda x: jax.device_put(x, s), a)
    H_pre, H_ref, scores = fn(
        put(prep, repl),
        put(tpl_pts, shard), put(tpl_valid, shard), put(tpl_fpfh, shard),
        put(keys_feat, shard), put(keys_fine, shard),
        put(ra, repl), put(rb, repl), put(jnp.float32(voxel), repl),
    )
    return H_pre, H_ref, scores


@partial(jax.jit, static_argnames=("intr", "win_hw"))
def score_pose_candidates(mesh_v, mesh_f, Ts, depth, mask, intr,
                          win_hw="auto"):
    """Render-and-compare scores for K candidate poses against ONE observed
    frame's (depth, detection mask) — the search's depth + silhouette-IoU
    instrument (``_view_score``), packaged standalone for the tracker's
    multi-frame init rollout. Lower is better.

    Observation side: the full-res depth is stride-2 point-sampled (unbiased,
    like the search's splat=0 render of the observed cloud) and the mask is
    2x2 any-pooled to the half-res scoring view — the same conventions as
    ``_prep_dst``. Returns ``(K,) float32``.
    """
    intr_r = _down_intr(intr, 2)
    Hr, Wr = intr_r.height, intr_r.width
    d_s = depth[: Hr * 2 : 2, : Wr * 2 : 2]
    m_s = mask[: Hr * 2 : 2, : Wr * 2 : 2]
    obs_d = jnp.where(m_s & (d_s > 0), d_s, 0.0).astype(jnp.float32)
    mask_r = mask[: Hr * 2, : Wr * 2].reshape(Hr, 2, Wr, 2).any(axis=(1, 3))
    obs_s_full = obs_d > 0
    n_obs_total = jnp.maximum(jnp.sum(obs_s_full), 1)
    n_mask_total = jnp.sum(mask_r)
    win = window_dims(intr_r, win_hw)

    def score(T):
        if win is None:
            dep = render_depth_mesh(mesh_v, mesh_f, T, intr_r,
                                    near=0.01, far=5.0)
            od, msk = obs_d, mask_r
            out_mask = 0
        else:
            o = window_origin(mesh_v, T, intr_r, win[0], win[1])
            dep = render_depth_mesh(mesh_v, mesh_f, T, intr_r, near=0.01,
                                    far=5.0, origin=o.astype(jnp.float32),
                                    out_hw=win)
            od = jax.lax.dynamic_slice(obs_d, (o[1], o[0]), win)
            msk = jax.lax.dynamic_slice(mask_r, (o[1], o[0]), win)
            out_mask = n_mask_total - jnp.sum(msk)
        sil = dep > 0
        obs_s = od > 0
        both = sil & obs_s
        n_both = jnp.maximum(jnp.sum(both), 1)
        dz = jnp.sum(jnp.where(both, jnp.abs(dep - od), 0.0)) / n_both
        inter = jnp.sum(sil & msk)
        union = jnp.maximum(jnp.sum(sil | msk) + out_mask, 1)
        return dz + 1.0 * (1.0 - inter / union)

    return jax.vmap(score)(Ts)


@partial(jax.jit, static_argnames=("intr", "n"))
def _render_template(mesh_v, mesh_f, T_m2c, intr, n, key):
    """create_template_from_H device program (PoseEstimator.py:118-140) —
    exact triangle raster (the reference's Filament mesh render is exact
    too; the splat's scatter-min would bias the view ~6 mm closer).

    Samples directly from the full back-projection: a ``compact()`` squeeze
    to a fixed budget here would keep the raster TOP of any view with more
    valid pixels than the budget (a close-range object covers ~18k px at
    640x480) and silently bias the template's geometry — the exact sampling
    bug class behind round 1's tracking drift. ``random_sample`` is an exact
    stratified pass over the full pixel buffer."""
    depth = render_depth_mesh(mesh_v, mesh_f, T_m2c, intr, near=0.01, far=5.0)
    cloud = g3.backproject_depth(depth, intr, depth_min=0.01, depth_max=5.0)
    return g3.random_sample(key, cloud, n)
