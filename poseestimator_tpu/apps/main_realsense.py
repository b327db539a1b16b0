"""Realtime 6D pose tracking at camera rate.

CLI parity with reference src/pose_estimator/main_realsense.py (run as
``python -m poseestimator_tpu.apps.main_realsense``): warm-up detection,
template-based global pose, then the render-predict-ICP loop with
re-initialization on detection loss. The constants WEIGHTS_PATH / PCD_PATH /
CAD_PATH / TARGET_PTS / TRACK_EVERY (main_realsense.py:14-18) become flags
with the same defaults. ``--source replay:<dir>|synthetic`` runs headless
without RealSense hardware; ``--headless`` disables the GUI.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from .. import geom3d as g3
from ..camera import RealSenseCamera, ReplayCamera, SyntheticCamera
from ..pipeline import Detector, PoseEstimator, Tracker
from ..utils.overlay import draw_model_projection_with_axes, timer_print


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", default="./data/best.pt")
    p.add_argument("--pcd-path", default="./data/lego_views/")
    p.add_argument("--cad-path", default="./data/obj_000001.ply")
    p.add_argument(
        "--target-pts", type=int, default=0,
        help="points per cloud for the tracking ICP. Default 0 = DENSE mode "
        "(full 4096-point compacted clouds): measured 1.1 cm ADD-S with no "
        "drift vs 6.2 cm + compounding drift at the reference's 100-300-pt "
        "sampling (tools/eval_tracking.py, docs/PERFORMANCE.md). Pass 100 "
        "for behavior parity with reference main_realsense.py:17",
    )
    p.add_argument("--track-every", type=int, default=1)
    p.add_argument("--source", default="realsense",
                   help="realsense | replay:<dir with color_*.png/depth_*.npy> | synthetic")
    p.add_argument("--nc", type=int, default=5)
    p.add_argument(
        "--detector-dtype", default="float32",
        choices=["float32", "bfloat16"],
        help="YOLO forward dtype inside the fused frame program; bfloat16 "
        "runs the conv blocks on the MXU's native format (geometry stays "
        "float32 — only the detection mask is affected; measured accuracy "
        "delta: docs/PERFORMANCE.md)")
    p.add_argument("--conf", type=float, default=0.7)
    p.add_argument("--max-frames", type=int, default=0, help="0 = unlimited")
    p.add_argument("--headless", action="store_true")
    p.add_argument("--icp-dist", type=float, default=0.01)
    p.add_argument(
        "--icp-variant", default="p2p", choices=["p2p", "p2l"],
        help="tracking ICP estimator: point-to-point (reference parity, "
        "main_realsense.py:112-115) or point-to-plane on observed normals",
    )
    p.add_argument(
        "--icp-kernel", default="none", choices=["none", "huber", "tukey"],
        help="IRLS robust kernel on ICP residuals (resists background bleed "
        "through imperfect masks; measured in docs/PERFORMANCE.md)",
    )
    p.add_argument(
        "--motion-model", default="none", choices=["none", "constant_velocity"],
        help="render-predict pose: last estimate (reference parity) or "
        "constant-velocity extrapolation (extends trackable object speed; "
        "measured in docs/PERFORMANCE.md)",
    )
    p.add_argument(
        "--smooth-alpha", type=float, default=1.0,
        help="SE(3) alpha-beta OUTPUT pose filter gain (1 = off, reference "
        "parity): smooths the reported/overlaid pose stream under sensor "
        "noise without touching the tracking state; velocity gain "
        "--smooth-beta keeps steady motion lag-free",
    )
    p.add_argument("--smooth-beta", type=float, default=0.3)
    p.add_argument(
        "--reinit-fitness", type=float, default=0.0,
        help="sustained ICP fitness below this (for --reinit-patience frames) "
        "drops the FSM back to INIT for a fresh global search — recovers "
        "from kidnapped-object / diverged tracks (0 = reference parity: "
        "re-init on detection misses only)",
    )
    p.add_argument("--reinit-patience", type=int, default=8)
    p.add_argument(
        "--min-fitness", type=float, default=0.25,
        help="sustained ICP fitness below this switches to the next ranked "
        "init candidate (symmetric-pose rescue); 0 disables",
    )
    p.add_argument("--cad-overlay-points", type=int, default=200)
    p.add_argument("--view-set", default="full", choices=["reduced", "full"],
                   help="template DB coverage for the init search. Default "
                        "'full' (26-view sphere): init on unconstrained poses "
                        "is coverage-dominated (BASELINE.md BOP A/B: AR "
                        "0.328 -> 0.456) and the windowed+pruned search fits "
                        "the same <=100 ms budget (bench "
                        "template_search_26_within_budget). 'reduced' = the "
                        "reference's 5-view upper-arc ring "
                        "(template_creation.py:98-130 parity)")
    p.add_argument("--init-rollout", type=int, default=2,
                   help="multi-frame init: track the top candidate basins "
                        "through this many extra warm-up frames and select "
                        "by render score (near-symmetric disambiguation); "
                        "0 = reference parity (single-frame winner)")
    p.add_argument(
        "--multi-cad", action="append", default=None, metavar="ID:CAD:VIEWS",
        help="with --multi: register an extra class as "
        "'<class_id>:<cad.ply>:<template_views_dir>' (repeatable). The "
        "default --cad-path/--pcd-path pair serves class 0; every class's "
        "tracks advance in ONE batched device program")
    p.add_argument("--multi", action="store_true",
                   help="track every detected instance (MultiTracker)")
    p.add_argument("--metrics", default=None,
                   help="write per-frame JSONL metrics here")
    return p


def make_camera(args, intr_fallback):
    if args.source == "realsense":
        return RealSenseCamera()
    if args.source.startswith("replay:"):
        import cv2

        d = args.source.split(":", 1)[1]
        frames = []
        for f in sorted(os.listdir(d)):
            if f.startswith("color_") and f.endswith(".png"):
                idx = f[len("color_"):-len(".png")]
                depth_f = os.path.join(d, f"depth_{idx}.npy")
                frames.append((cv2.imread(os.path.join(d, f)), np.load(depth_f)))
        intr_file = os.path.join(d, "intrinsics.npy")
        if os.path.exists(intr_file):
            K, w, h = np.load(intr_file, allow_pickle=True)
            intr = g3.Intrinsics.from_K(K, int(w), int(h))
        else:
            intr = intr_fallback
        return ReplayCamera(frames, intr, loop=False)
    if args.source == "synthetic":
        from ..render.mesh import TriangleMesh

        mesh = TriangleMesh.load(args.cad_path)
        if np.max(mesh.extent) >= 1.0:
            mesh = mesh.scale(0.001, center=np.zeros(3))
        pts, nrm = mesh.sample_points_uniformly(100_000)
        diag = float(np.linalg.norm(mesh.extent))
        d = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
        F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        base = F @ np.asarray(g3.look_at(d * diag * 2.5, [0, 0, 0], [0, 1, 0]))

        def poses():
            import jax.numpy as jnp

            a = 0.0
            while True:
                P = np.eye(4, dtype=np.float32)
                P[:3, :3] = np.asarray(g3.rot_z(a))
                yield P @ base
                a += 0.01

        return SyntheticCamera(pts, nrm, poses(), intr_fallback)
    raise ValueError(f"unknown source {args.source}")


def main(argv=None):
    args = build_parser().parse_args(argv)
    intr_fallback = g3.Intrinsics.from_fov(60.0, 640, 480)
    cam = make_camera(args, intr_fallback)
    intr, K = cam.rs_get_intrinsics()

    estimator = PoseEstimator(args.cad_path, args.pcd_path, intr, K,
                              args.target_pts or 200, view_set=args.view_set)
    detector = Detector(args.weights, nc=args.nc, dtype=args.detector_dtype)
    cad_points, _ = estimator.mesh.sample_points_uniformly(args.cad_overlay_points)
    cad_points_by_cls = {0: cad_points}  # per-class overlay clouds (--multi-cad)

    from ..utils import MetricsLogger

    metrics = MetricsLogger(args.metrics) if args.metrics else None
    if args.multi:
        from ..pipeline import MultiTracker

        est_arg = estimator
        if args.multi_cad:
            ests = {0: estimator}
            for spec in args.multi_cad:
                cid, cad_p, views_p = spec.split(":", 2)
                ests[int(cid)] = PoseEstimator(
                    cad_p, views_p, intr, K, args.target_pts or 200,
                    view_set=args.view_set,
                )
                cad_points_by_cls[int(cid)], _ = ests[
                    int(cid)
                ].mesh.sample_points_uniformly(args.cad_overlay_points)
            est_arg = ests
        tracker = MultiTracker(
            cam, est_arg, detector, target_pts=args.target_pts,
            conf=args.conf, icp_dist=args.icp_dist,
            smooth_alpha=args.smooth_alpha, smooth_beta=args.smooth_beta,
            metrics=metrics,
        )
    else:
        tracker = Tracker(
            cam, estimator, detector, target_pts=args.target_pts,
            track_every=args.track_every, conf=args.conf, icp_dist=args.icp_dist,
            icp_variant=args.icp_variant, icp_kernel=args.icp_kernel,
            motion_model=args.motion_model,
            smooth_alpha=args.smooth_alpha, smooth_beta=args.smooth_beta,
            min_fitness=args.min_fitness, reinit_fitness=args.reinit_fitness,
            reinit_patience=args.reinit_patience,
            init_rollout=args.init_rollout, metrics=metrics,
        )

    n = 0
    try:
        while True:
            t_all = time.time()
            res = tracker.step()
            if res is None:
                break
            n += 1
            if args.multi:
                for tr in res.tracks:
                    draw_model_projection_with_axes(
                        res.color,
                        cad_points_by_cls.get(tr.class_id, cad_points), K,
                        tr.T_out)
                if not args.headless:
                    import cv2

                    cv2.imshow("Live Tracking", res.color)
                    if cv2.waitKey(1) & 0xFF == 27:
                        break
                if args.max_frames and n >= args.max_frames:
                    break
                continue
            if res.state == "track" and res.detected:
                for k, v in res.timings.items():
                    timer_print(time.time() - v, k)
                print(res.T_m2c)
                print("=" * 50)
                timer_print(t_all, "Full Time")
            if res.T_m2c is not None:
                draw_model_projection_with_axes(res.color, cad_points, K, res.T_m2c)
            if not args.headless:
                import cv2

                cv2.imshow("Live Tracking", res.color)
                if cv2.waitKey(1) & 0xFF == 27:  # ESC to quit
                    break
            if args.max_frames and n >= args.max_frames:
                break
    except KeyboardInterrupt:
        print("Stopped by user")
    finally:
        cam.stop()
        if metrics is not None:
            print(metrics.summary())
            metrics.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
