"""Reproducible synthetic-ground-truth streaming tracking evaluation.

Produces the ADD-S accuracy table quoted in BASELINE.md / docs/PERFORMANCE.md
("Accuracy under sustained tracking") from a checked-in script instead of ad
hoc profiling: an asymmetric L-shaped CAD object rotates at a fixed rate, the
full INIT -> TRACK loop runs with a perfect-mask detector (isolating the
registration/tracking stack from YOLO), and every tracked frame's pose is
scored against the renderer's ground truth with ADD-S.

Modes compare the reference's sparse-sampling ICP operating point
(main_realsense.py:17 TARGET_PTS=100, also 300) against the dense mode
(``target_pts=0``: full 4096-point compacted clouds), quantifying the
random-sampling noise floor that compounds through the per-frame delta.

Run (TPU or CPU):
    python tools/eval_tracking.py                     # 100 frames, 300 vs 0
    python tools/eval_tracking.py --modes 100,300,0 --frames 100
    python tools/eval_tracking.py --cpu --res 128x96 --frames 20   # smoke

Prints a markdown table and one JSON line per mode.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=100, help="tracked frames per mode")
    p.add_argument("--modes", default="300,0",
                   help="comma list of target_pts values (0 = dense ICP)")
    p.add_argument("--rot-per-frame", type=float, default=0.008,
                   help="object rotation per frame, radians")
    p.add_argument("--scale", type=float, default=1.0, help="object scale (m)")
    p.add_argument("--res", default="640x480", help="camera WxH")
    p.add_argument("--icp-dist", type=float, default=0.01,
                   help="tracking ICP correspondence distance (reference: 0.01)")
    p.add_argument("--noise-sigma", type=float, default=0.0,
                   help="synthetic depth noise (m)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (for CI / no TPU)")
    p.add_argument("--json-out", default=None, help="also write results here")
    return p


def run(args, quiet: bool = False):
    """Run the evaluation; returns the list of per-mode result rows.

    Importable (bench.py reuses it for the accuracy column of the bench
    artifact); ``main`` wraps it for CLI use.
    """
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tests"))
    from helpers import l_shape_mesh, write_mesh

    from poseestimator_tpu import geom3d as g3
    from poseestimator_tpu.camera import SyntheticCamera
    from poseestimator_tpu.models.yolo.nms import Detections
    from poseestimator_tpu.pipeline import PoseEstimator, Tracker

    W, H = (int(v) for v in args.res.split("x"))
    intr = g3.Intrinsics.from_fov(60.0, W, H)

    tmp = tempfile.mkdtemp(prefix="eval_tracking_")
    cad = write_mesh(os.path.join(tmp, "l.ply"), l_shape_mesh(args.scale))

    class PerfectMaskDetector:
        """mask = rendered depth > 0 — isolates tracking from detection."""

        def __init__(self, camera):
            self.camera = camera

        def __call__(self, img, conf=0.7, iou=0.7):
            mask = self.camera.depth > 0
            det = Detections(
                boxes=jnp.zeros((1, 4)), scores=jnp.ones(1),
                classes=jnp.zeros(1, jnp.int32), coeffs=jnp.zeros((1, 32)),
                valid=jnp.ones(1, bool),
            )
            return det, mask[None], jnp.zeros((1, 4))

    def make_camera(estimator, n_frames):
        diag = float(np.linalg.norm(estimator.mesh.extent))
        d = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
        F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        base = F @ np.asarray(g3.look_at(d * diag * 2.0, [0, 0, 0], [0, 1, 0]))

        def poses():
            a = 0.1
            # warm-up frames are static (detector warm-up), then rotate
            for _ in range(12):
                P = np.eye(4, dtype=np.float32)
                P[:3, :3] = np.asarray(g3.rot_z(a))
                yield (P @ base).astype(np.float32)
            for _ in range(n_frames):
                a += args.rot_per_frame
                P = np.eye(4, dtype=np.float32)
                P[:3, :3] = np.asarray(g3.rot_z(a))
                yield (P @ base).astype(np.float32)

        pts = np.asarray(estimator._cad_pts)
        return SyntheticCamera(
            pts, np.zeros_like(pts), poses(), intr,
            noise_sigma=args.noise_sigma,
            # noisy streams get the RealSense post-processing chain, like
            # the real camera path (clean streams stay raw for determinism)
            filter_depth=args.noise_sigma > 0,
        )

    results = []
    estimator = None
    for mode in [int(m) for m in args.modes.split(",")]:
        # fresh estimator per mode (deterministic PRNG stream per run)
        estimator = PoseEstimator(
            cad, os.path.join(tmp, "views"), intr, target_points=mode or 100,
            seed=0,
        )
        model_pts = g3.from_points(
            estimator.mesh.sample_points_uniformly(
                512, np.random.default_rng(0)
            )[0]
        )
        diag = float(np.linalg.norm(estimator.mesh.extent))
        cam = make_camera(estimator, args.frames)
        tracker = Tracker(
            cam, estimator, PerfectMaskDetector(cam), target_pts=mode,
            icp_dist=args.icp_dist, warmup_frames=3, max_init_frames=20,
        )
        adds = []
        while True:
            res = tracker.step()
            if res is None:
                break
            if res.state == "track" and res.detected and res.T_m2c is not None:
                adds.append(
                    float(
                        g3.adds_metric(
                            jnp.asarray(res.T_m2c),
                            jnp.asarray(cam.current_gt),
                            model_pts,
                        )
                    )
                )
        adds = np.asarray(adds)
        if len(adds) == 0:
            print(f"mode target_pts={mode}: tracking never started", file=sys.stderr)
            continue
        head = adds[: max(len(adds) // 10, 1)]
        tail = adds[-max(len(adds) // 10, 1):]
        row = {
            "mode": "dense" if mode == 0 else f"{mode}pt",
            "target_pts": mode,
            "frames_tracked": int(len(adds)),
            "adds_mean_cm": round(float(adds.mean()) * 100, 2),
            "adds_p95_cm": round(float(np.percentile(adds, 95)) * 100, 2),
            "adds_first10pct_cm": round(float(head.mean()) * 100, 2),
            "adds_last10pct_cm": round(float(tail.mean()) * 100, 2),
            "adds_mean_vs_diag_pct": round(float(adds.mean()) / diag * 100, 2),
            "icp_dist": args.icp_dist,
            "rot_per_frame": args.rot_per_frame,
        }
        results.append(row)
        if not quiet:
            print(json.dumps(row))

    if results and not quiet:
        print("\n| ICP mode | ADD-S mean | p95 | first 10% -> last 10% |")
        print("|---|---|---|---|")
        for r in results:
            print(
                f"| {r['mode']} | {r['adds_mean_cm']} cm "
                f"({r['adds_mean_vs_diag_pct']}% diag) | {r['adds_p95_cm']} cm "
                f"| {r['adds_first10pct_cm']} -> {r['adds_last10pct_cm']} cm |"
            )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    return results


def main(argv=None):
    return 0 if run(build_parser().parse_args(argv)) else 1


if __name__ == "__main__":
    sys.exit(main())
