"""Synthetic dataset generation — the BlenderProc step of the reference
workflow (reference README.md:1-16, step 1) as a framework-native CLI.

Renders domain-randomized scenes of one or more CAD models (mutual occlusion,
unlabeled distractor clutter, procedural backgrounds, photometric jitter) and
writes a ready-to-train YOLO-seg dataset (the detection/dataset.yaml schema +
``cls x1 y1 ...`` polygon labels that detection/train.py consumes), and
optionally a BOP-format scene (scene_gt.json / scene_camera.json / rgb /
depth / mask_visib) for pose evaluation with tools/eval_bop.py or
pose_estimator.main_image.

Usage:
    python detection/generate.py --cad lego=models/obj_000001.ply \
        --out /data/synth --train 256 --val 64 --bop
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cad", action="append", required=True,
                   help="CAD spec 'name=path.ply' (or bare path; repeatable — "
                   "each becomes one class, in order)")
    p.add_argument("--out", required=True, help="output dataset root")
    p.add_argument("--train", type=int, default=64, dest="n_train")
    p.add_argument("--val", type=int, default=16, dest="n_val")
    p.add_argument("--imgsz", default="640x480",
                   help="WxH (default 640x480, the camera operating point)")
    p.add_argument("--fov", type=float, default=60.0,
                   help="camera FoV deg (the template camera's 60)")
    p.add_argument("--max-objects", type=int, default=3)
    p.add_argument("--max-distractors", type=int, default=2)
    p.add_argument("--points", type=int, default=60_000,
                   help="surface samples per object (splat density)")
    p.add_argument("--min-visib-px", type=int, default=64)
    p.add_argument("--dist", default="1.6,3.2",
                   help="camera distance range in object diagonals")
    p.add_argument("--noise-sigma", type=float, default=3.0)
    p.add_argument("--bop", action="store_true",
                   help="also write a BOP scene (scene_gt/scene_camera/"
                   "depth/mask_visib) for pose eval")
    p.add_argument("--depth-instrument", default="splat",
                   choices=["splat", "mesh"],
                   help="'mesh': labeled objects render through the exact "
                        "triangle raster (<1 mm vs analytic depth) — BOP "
                        "artifacts carry no splat bias (use for "
                        "renderer-independent eval scenes)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from poseestimator_tpu.training.synth import SynthConfig, generate

    w, h = (int(v) for v in args.imgsz.lower().split("x"))
    d0, d1 = (float(v) for v in args.dist.split(","))
    cfg = SynthConfig(
        cad=args.cad, out=args.out, n_train=args.n_train, n_val=args.n_val,
        width=w, height=h, fov_deg=args.fov, max_objects=args.max_objects,
        max_distractors=args.max_distractors, points_per_object=args.points,
        min_visib_px=args.min_visib_px, dist_range=(d0, d1),
        noise_sigma=args.noise_sigma, bop=args.bop,
        depth_instrument=args.depth_instrument, seed=args.seed,
    )
    summary = generate(cfg)
    print(f"dataset.yaml: {summary['dataset_yaml']}")
    if args.bop:
        print(f"scene_gt: {summary['scene_gt']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
