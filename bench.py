"""Benchmark: end-to-end detect+register frame rate on one device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

The metric is the BASELINE.json north star: sustained end-to-end
(YOLO11n-seg detect @ 640 letterbox + fused render/backproject/ICP track
step @ 640x480) frames per second on a single chip. ``vs_baseline`` is
measured FPS / 30 (the reference's implied camera-rate target; the reference
itself publishes no numbers — BASELINE.md).

Run: python bench.py  [--frames N] [--json-only]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=50)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--json-only", action="store_true")
    p.add_argument("--skip-accuracy", action="store_true",
                   help="throughput only (skip the synthetic-GT ADD-S stage)")
    args = p.parse_args(argv)

    import jax

    # persistent compilation cache: repeat runs skip the multi-minute
    # first-compile (safe no-op where unsupported)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from poseestimator_tpu import geom3d as g3
    from poseestimator_tpu.models import yolo as Y
    from poseestimator_tpu.pipeline.tracking import _track_step

    dev = jax.devices()[0]
    log = (lambda *a: None) if args.json_only else print
    log(f"device: {dev}")

    # --- build the two per-frame programs --------------------------------
    intr = g3.Intrinsics.from_fov(60.0, 640, 480)
    model = Y.YOLO11Seg(nc=5, scale="n")
    img640 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img640, train=False)

    @jax.jit
    def detect_step(variables, frame_bgr):
        lb, meta = Y.letterbox(frame_bgr, 640)
        raw = model.apply(variables, lb[None], train=False)
        boxes, cls, mc = Y.decode_boxes(raw)
        det = Y.nms(boxes[0], cls[0], mc[0], conf_thres=0.25, iou_thres=0.7,
                    pre_nms=1024, max_det=32)
        masks = Y.assemble_masks(
            raw["proto"][0], det.coeffs, det.boxes, det.valid, meta, 480, 640
        )
        return det, masks

    # Synthetic frame + a REALISTIC object scene. Programs are fixed-shape,
    # but NOT content-independent: the ICP stages are lax.while_loops with
    # early exit, and on non-converging random clouds every chain runs to its
    # iteration cap — a worst case no product frame exhibits. The bench
    # therefore measures the tracking operating point: a box CAD observed
    # under one inter-frame motion delta (the synthetic-GT eval's ~0.01 rad/
    # frame), with the worst case kept in tools/profile_search.py.
    from tools._scene import make_scene

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (480, 640, 3), dtype=np.uint8))
    scene = make_scene(intr, rng)
    mesh_v, mesh_f = scene.mesh_v, scene.mesh_f
    T0, depth, obj_sil = scene.T0, scene.depth, scene.obj_sil
    key = jax.random.PRNGKey(0)

    # the product's object-sized window bucket (what Tracker._select_window
    # picks at init for this CAD/distance — pipeline/window.py)
    from poseestimator_tpu.pipeline.window import window_for_object

    intr_r = g3.Intrinsics(fx=intr.fx / 2, fy=intr.fy / 2, cx=intr.cx / 2,
                           cy=intr.cy / 2, width=320, height=240)
    _mv = np.asarray(mesh_v)
    diag_box = float(np.linalg.norm(_mv.max(0) - _mv.min(0)))
    track_win = window_for_object(intr_r, diag_box, float(np.asarray(T0)[2, 3]))
    log(f"track window bucket: {track_win}")

    @jax.jit
    def one_frame(k):
        # the product fused frame (Tracker._fused): detect + SINGLE mask
        # assembly + track in ONE dispatch
        lb, meta = Y.letterbox(frame, 640)
        raw = model.apply(variables, lb[None], train=False)
        boxes, cls, mc = Y.decode_boxes(raw)
        det = Y.nms(boxes[0], cls[0], mc[0], conf_thres=0.25, iou_thres=0.7,
                    pre_nms=1024, max_det=32)
        mask = Y.assemble_masks(
            raw["proto"][0], det.coeffs[:1], det.boxes[:1], det.valid[:1],
            meta, 480, 640,
        )[0]
        # the random-weight YOLO mask is noise on this synthetic frame; union
        # with the true silhouette keeps every detection op LIVE (no
        # dead-code elimination) while the track step sees the product's
        # object-dominated mask (depth is zero off the object, so extra mask
        # pixels contribute no points)
        T, fit, rmse, cov = _track_step(
            mesh_v, mesh_f, mask | obj_sil, depth, T0, intr, 0, k,
            icp_dist=jnp.float32(0.01),  # dense ICP mode
            win_hw=track_win,
        )
        return T

    # --- warmup (compile) -------------------------------------------------
    t0 = time.time()
    jax.block_until_ready(one_frame(key))
    log(f"compile + first frame: {time.time() - t0:.1f}s")
    for i in range(args.warmup):
        jax.block_until_ready(one_frame(jax.random.fold_in(key, i)))

    # --- timed loops ------------------------------------------------------
    # EVERY stage runs best-of-2 loops (VERDICT r3 weak-1/item-3): a single
    # loop through the dev tunnel occasionally lands in a service stall and
    # reports ~40-60% of the device's real rate (observed on identical
    # programs); the MIN per-op time of two loops is the device's number,
    # and the headline must be the driver-reproducible one.
    def best_of(n_loops, run_loop):
        per = np.inf
        for _ in range(max(2, n_loops)):
            t0 = time.time()
            run_loop()
            per = min(per, time.time() - t0)
        return per

    # sustained: frames pipeline through the dispatch queue (what a camera
    # loop achieves); latency: block on every frame (worst-case reaction)
    def _sustained():
        for i in range(args.frames):
            out = one_frame(jax.random.fold_in(key, 100 + i))
        np.asarray(out)  # host fetch: through the dev tunnel,
        # block_until_ready can ack before the queue drains; only
        # materialization proves execution

    dt = best_of(2, _sustained) / args.frames
    fps = 1.0 / dt

    def _latency():
        for i in range(args.frames):
            jax.block_until_ready(one_frame(jax.random.fold_in(key, 500 + i)))

    latency_ms = best_of(2, _latency) / args.frames * 1000.0

    # the FAST tracking profile (icp_pose_tol 1e-4: ~4 accel iterations vs
    # the accurate default's ~15) — the documented speed/accuracy frontier
    # point (dense ADD-S ~0.66 vs 0.26 cm; docs/PERFORMANCE.md round 5)
    @jax.jit
    def one_frame_fast(k):
        lb, meta = Y.letterbox(frame, 640)
        raw = model.apply(variables, lb[None], train=False)
        boxes, cls, mc = Y.decode_boxes(raw)
        det = Y.nms(boxes[0], cls[0], mc[0], conf_thres=0.25, iou_thres=0.7,
                    pre_nms=1024, max_det=32)
        mask = Y.assemble_masks(
            raw["proto"][0], det.coeffs[:1], det.boxes[:1], det.valid[:1],
            meta, 480, 640,
        )[0]
        T, fit, rmse, cov = _track_step(
            mesh_v, mesh_f, mask | obj_sil, depth, T0, intr, 0, k,
            icp_dist=jnp.float32(0.01), win_hw=track_win,
            icp_pose_tol=jnp.float32(1e-4),
        )
        return T

    jax.block_until_ready(one_frame_fast(key))

    def _sustained_fast():
        for i in range(args.frames):
            out = one_frame_fast(jax.random.fold_in(key, 700 + i))
        np.asarray(out)

    fps_fast = args.frames / best_of(2, _sustained_fast)

    # stage split (informational) — warm the standalone program first (it is
    # a separate compile from the fused one_frame), AND the tiny slice-fetch
    # program (a first-use remote compile of even `m[0, 240, :8]` costs
    # seconds through the dev tunnel and would be billed to the loop)
    d, m = detect_step(variables, frame)
    np.asarray(jax.device_get(m[0, 240, :8]))

    def _det_loop():
        for i in range(args.frames):
            d, m = detect_step(variables, frame)
        # host fetch (see above) of a SLICE: materializing any element
        # proves the queue drained, without billing the 9.8 MB full-mask
        # tunnel transfer to the device-rate number
        np.asarray(jax.device_get(m[0, 240, :8]))

    t_det = best_of(2, _det_loop) / args.frames

    # the fused track step alone (render + backproject + outlier + dense ICP);
    # per-frame keys precomputed so fold_in dispatches don't ride in the loop
    mask_full = jnp.ones((480, 640), bool)
    track_args = (mesh_v, mesh_f, mask_full, depth, T0, intr, 0)
    track_keys = list(jax.random.split(jax.random.fold_in(key, 900), args.frames))
    jax.block_until_ready(_track_step(*track_args, key, win_hw=track_win))

    def _track_loop():
        for i in range(args.frames):
            out_t = _track_step(*track_args, track_keys[i], win_hw=track_win)
        np.asarray(out_t[0])

    t_track = best_of(2, _track_loop) / args.frames

    # multi-object: the batched (vmapped-over-tracks) frame step — B
    # instances advanced in ONE device program (pipeline/multi_tracking.py).
    # ms/object collapsing below the B=1 track_ms is the object-axis
    # scaling story (the TPU way to scale instance count).
    from poseestimator_tpu.pipeline.multi_tracking import _batched_track

    multi = {}
    for B in (3, 8):
        args_b = (
            mesh_v, mesh_f, jnp.tile(mask_full[None], (B, 1, 1)), depth,
            jnp.tile(jnp.asarray(T0)[None], (B, 1, 1)), intr, 0,
            jax.random.split(jax.random.fold_in(key, 1000 + B), B),
            jnp.full((B,), 0.01, jnp.float32),
        )
        kw_b = dict(win_hw=track_win)
        jax.block_until_ready(_batched_track(*args_b, **kw_b)[0])
        if B == 8:
            # the PRODUCT multi-object op point (MultiTracker default
            # target_pts=100, sampled ICP) alongside the dense stress row
            args_100 = args_b[:6] + (100,) + args_b[7:]
            jax.block_until_ready(_batched_track(*args_100, **kw_b)[0])
            t0 = time.time()
            out_p = _batched_track(*args_100, **kw_b)
            np.asarray(out_p[0])
            once_p = max(time.time() - t0, 1e-4)
            reps_p = min(max(int(2.0 / once_p), 4), 64)
            per_p = np.inf
            for _ in range(2):
                t0 = time.time()
                for _ in range(reps_p):
                    out_p = _batched_track(*args_100, **kw_b)
                np.asarray(out_p[0])
                per_p = min(per_p, (time.time() - t0) / reps_p * 1000.0)
            multi["multi_track_b8_100pt_ms"] = round(per_p, 2)
        t0 = time.time()
        out_m = _batched_track(*args_b, **kw_b)
        np.asarray(out_m[0])
        once = max(time.time() - t0, 1e-4)
        reps = min(max(int(2.0 / once), 4), 64)
        t0 = time.time()
        for _ in range(reps):
            out_m = _batched_track(*args_b, **kw_b)
        np.asarray(out_m[0])  # host fetch: proves the queue drained
        per = (time.time() - t0) / reps * 1000.0
        multi[f"multi_track_b{B}_ms"] = round(per, 2)
        multi[f"multi_track_b{B}_ms_per_obj"] = round(per / B, 2)

    # global template search (the INIT path: 5 templates x 5 hypotheses,
    # FPFH + RANSAC + TEASER + coarse-to-fine ICP, one fused program).
    # Real inputs, not random clouds: the PRODUCT PoseEstimator renders the
    # box CAD's 5-view template DB (disk-cache path) and prepares the real
    # voxel+FPFH template arrays; the observation is the rendered view at
    # T_obs — the data an actual (re)init sees, so the polish's early-exit
    # while_loops run their true trip counts.
    from poseestimator_tpu.pipeline.pose_estimator import _search_templates

    estimator, dst_cloud = scene.estimator, scene.dst_cloud
    search_args = (dst_cloud.points, dst_cloud.valid,
                   estimator._tpl_points, estimator._tpl_valid,
                   estimator._tpl_fpfh,
                   "mesh", estimator._mesh_v, estimator._mesh_f,
                   intr, obj_sil, True,
                   jnp.float32(estimator.voxel_size), jax.random.PRNGKey(1))
    # mirror the PoseEstimator's own search configuration (adaptive working
    # caps, final-stage top-k, window config) — the product program, not a
    # default-parameter variant
    search_win = window_for_object(intr_r, diag_box, 0.5)
    search_kw = dict(win_hw=search_win,
                     n_final=estimator.search_final_topk,
                     dst_cap=estimator._search_cap)
    jax.block_until_ready(_search_templates(*search_args, **search_kw))
    n_search = 5

    def _search_loop():
        for _ in range(n_search):
            out_s = _search_templates(*search_args, **search_kw)
        np.asarray(out_s[-1])  # host fetch (see above)

    t_search = best_of(2, _search_loop) / n_search

    # 26-view template DB (view_set="full"): the full-coverage init path
    # (VERDICT r3 item 5) — same fused program, template axis 26 instead of
    # 5. Single-chip latency here; the template-axis sharding story for this
    # set is tools/scaling_eval.py --templates 26.
    from poseestimator_tpu.pipeline.pose_estimator import PoseEstimator as _PE26

    est26 = _PE26(
        scene.cad_ply,
        os.path.join(os.path.dirname(scene.cad_ply), "views26"),
        intr, view_set="full",
    )
    search26_args = (dst_cloud.points, dst_cloud.valid,
                     est26._tpl_points, est26._tpl_valid, est26._tpl_fpfh,
                     "mesh", est26._mesh_v, est26._mesh_f,
                     intr, obj_sil, True,
                     jnp.float32(est26.voxel_size), jax.random.PRNGKey(1))
    search26_kw = dict(win_hw=search_win,
                       n_final=est26.search_final_topk,
                       dst_cap=est26._search_cap)
    jax.block_until_ready(_search_templates(*search26_args, **search26_kw))

    def _search26_loop():
        for _ in range(n_search):
            out_s = _search_templates(*search26_args, **search26_kw)
        np.asarray(out_s[-1])

    t_search26 = best_of(2, _search26_loop) / n_search

    # batched detection serving (VERDICT r2 weak-5): predict_batch imgs/s on
    # this chip, batch 8 and 32 — the number behind the BASELINE.md serving row
    from poseestimator_tpu.pipeline.detector import Detector

    serving = {}

    def _serve_rows(det, tag=""):
        for B in (8, 32):
            imgs = jnp.asarray(
                rng.integers(0, 255, (B, 480, 640, 3), dtype=np.uint8)
            )
            out = det.predict_batch(imgs)
            jax.block_until_ready(out)
            # time-based rep count: a fixed handful of reps (~0.2 s) was
            # dominated by tunnel/service noise — size the loop to ~2 s
            t0 = time.time()
            out = det.predict_batch(imgs)
            jax.block_until_ready(out)
            once = max(time.time() - t0, 1e-4)
            # capped: if the ack-early path made `once` look absurdly fast,
            # an uncapped rep count would stretch the real drain to minutes
            reps = min(max(int(2.0 / once), 4), 64)
            # best-of-2 timed loops: a single loop occasionally lands in a
            # tunnel/service stall and reports ~40% of the real rate
            # (observed 461 vs 1200 imgs/s on identical programs); the MAX
            # of two loops is the device's throughput, the min is the noise
            per_img_ms = np.inf
            for _ in range(2):
                t0 = time.time()
                for _ in range(reps):
                    out = det.predict_batch(imgs)
                np.asarray(out[1])  # host fetch: see the frame-loop comment
                per_img_ms = min(
                    per_img_ms, (time.time() - t0) / (reps * B) * 1000.0
                )
            serving[f"serve_batch{B}{tag}_imgs_per_s"] = round(1000.0 / per_img_ms, 1)
            serving[f"serve_batch{B}{tag}_ms_per_img"] = round(per_img_ms, 3)

    _serve_rows(Detector(variables, nc=5, scale="n", imgsz=640))
    # bf16 serving: conv/MXU path in bfloat16 (the TPU-native inference
    # dtype; weight import promotes to the model dtype)
    _serve_rows(
        Detector(variables, nc=5, scale="n", imgsz=640, dtype="bfloat16"),
        tag="_bf16",
    )

    # exact-sampler invariant on the REAL device (advisor r2 medium): a
    # raster-clustered mask through the large-pool stratified path must keep
    # exactly min(count, n) points (the approx_max_k path this replaced
    # dropped points on TPU for exactly this input shape)
    from poseestimator_tpu.geom3d.cloud import PointCloud as _PC

    vm = np.zeros(480 * 640, bool)
    for r in range(200, 340):
        vm[r * 640 + 240 : r * 640 + 400] = True  # 22400 clustered pixels
    samp = g3.random_sample(
        jax.random.PRNGKey(9),
        _PC(points=jnp.zeros((480 * 640, 3)), valid=jnp.asarray(vm)),
        16384,
    )
    sampler_ok = int(jax.device_get(samp.count())) == 16384

    # accuracy alongside throughput (VERDICT r1 item 5, r2 items 1/7): the
    # checked-in synthetic-GT streaming evaluation (tools/eval_tracking.py) —
    # dense (product default) AND sparse (reference-op-point parity mode,
    # round 1's regression surface), plus a degraded-detection-mask dense run
    # (mask erosion/dilation/jitter — the pipeline-level error source the
    # perfect-mask rows exclude). Deterministic seeds — perf wins can't hide
    # correctness regressions.
    accuracy = {}
    if not args.skip_accuracy:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.eval_tracking import build_parser as _ev_parser
        from tools.eval_tracking import run as _ev_run

        # Instrument choice (round 4): the tracker predicts through the
        # EXACT triangle raster, so the synthetic camera must be exact too —
        # a real depth camera reports per-pixel surface depth, which is the
        # raster's semantics. The legacy point-splat camera's 3x3
        # scatter-min systematically pulls observed surfaces toward the
        # camera (mm-scale at 640x480, concentrated at silhouettes); the
        # splat-predicted tracker CANCELLED that bias (the closed loop
        # VERDICT r3 called out), the exact tracker faithfully reports it.
        # Primary rows therefore observe through the raster; one splat-
        # observation run is kept as a cross-instrument STRESS row (a
        # systematically biased observation the tracker never saw).
        log("accuracy stage: 30-frame synthetic-GT tracking (sparse+dense) ...")
        rows = _ev_run(
            _ev_parser().parse_args(
                ["--frames", "30", "--modes", "300,0", "--observation", "mesh"]
            ),
            quiet=True,
        )
        by_mode = {r["mode"]: r for r in rows}
        dense = by_mode.get("dense")
        sparse = by_mode.get("300pt")
        log("accuracy stage: degraded-mask (+-2 px + boundary jitter) ...")
        rows_deg = _ev_run(
            _ev_parser().parse_args(
                ["--frames", "30", "--modes", "0", "--detector", "degraded:2",
                 "--observation", "mesh"]
            ),
            quiet=True,
        )
        deg = rows_deg[0] if rows_deg else None
        log("accuracy stage: splat-observation cross-instrument stress ...")
        rows_splat = _ev_run(
            _ev_parser().parse_args(["--frames", "30", "--modes", "0"]),
            quiet=True,
        )
        splat = rows_splat[0] if rows_splat else None
        if dense:
            accuracy = {
                "adds_mean_cm": dense["adds_mean_cm"],
                "adds_p95_cm": dense["adds_p95_cm"],
                "adds_mean_vs_diag_pct": dense["adds_mean_vs_diag_pct"],
                # per-mode frame accounting (VERDICT r3 item 8 / r4 item 8):
                # each mode's camera serves camera_frames_per_mode frames
                # (12 static warm-up + frames_per_mode motion frames);
                # frames_tracked counts those scored in TRACK state — it can
                # exceed frames_per_mode (leftover warm-up frames track too)
                # or fall short (acquisition + misses)
                "frames_per_mode": 30,
                "camera_frames_per_mode": dense.get("camera_frames", 42),
                # legacy aggregate (sum over dense+sparse+degraded) kept for
                # cross-round comparability
                "accuracy_frames_tracked": (
                    dense["frames_tracked"]
                    + (sparse["frames_tracked"] if sparse else 0)
                    + (deg["frames_tracked"] if deg else 0)
                ),
                "frames_tracked_dense": dense["frames_tracked"],
                "frames_tracked_sparse": sparse["frames_tracked"] if sparse else 0,
                "frames_tracked_degraded": deg["frames_tracked"] if deg else 0,
                "frames_tracked_splat_stress": splat["frames_tracked"] if splat else 0,
                "adds_mean_cm_dense": dense["adds_mean_cm"],
                "adds_mean_cm_sparse": sparse["adds_mean_cm"] if sparse else None,
                "adds_p95_cm_sparse": sparse["adds_p95_cm"] if sparse else None,
                "adds_mean_cm_degraded_mask": deg["adds_mean_cm"] if deg else None,
                "adds_mean_cm_splat_stress": splat["adds_mean_cm"] if splat else None,
                "accuracy_observation_exact_instrument": True,
                # budget gates: dense is the product default; sparse guards
                # the reference parity op point (round 1's failure mode);
                # degraded bounds mask-error sensitivity; splat_stress
                # bounds robustness to a systematically biased observation
                # instrument (measured ~2 cm of pure instrument bias). A
                # MISSING row means that mode never started tracking — the
                # catastrophic case — so absence fails the gate rather than
                # skipping it.
                "accuracy_within_budget": bool(
                    dense["adds_mean_cm"] <= 1.5
                    and sparse is not None and sparse["adds_mean_cm"] <= 2.5
                    and deg is not None and deg["adds_mean_cm"] <= 3.0
                    # splat-stress budget tightened 3.5 -> 3.0 (VERDICT r4
                    # item 8; measured 2.44 — 3.5 would absorb a ~40%
                    # regression silently)
                    and splat is not None and splat["adds_mean_cm"] <= 3.0
                ),
            }
        else:
            accuracy = {"adds_mean_cm": None, "accuracy_within_budget": False}

    result = {
        "metric": "end_to_end_detect_plus_register_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "fps_fast_profile": round(fps_fast, 2),
        "frame_latency_ms": round(latency_ms, 2),
        "detect_ms": round(t_det * 1000, 2),
        "track_ms": round(t_track * 1000, 2),
        "template_search_ms": round(t_search * 1000, 2),
        "template_search_26_ms": round(t_search26 * 1000, 2),
        # init-latency gates (VERDICT r1 item 4, r4 item 2): warm search must
        # stay within ~3 camera periods at BOTH operating points — the
        # 5-view reference ring AND the 26-view full sphere (the
        # init-accuracy default; BASELINE.md BOP A/B)
        "template_search_budget_ms": 100,
        "template_search_within_budget": bool(t_search * 1000 <= 100),
        "template_search_26_within_budget": bool(t_search26 * 1000 <= 100),
        **serving,
        **multi,
        "sampler_invariant_ok": sampler_ok,
        **accuracy,
        "device": str(dev),
        "frames": args.frames,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
