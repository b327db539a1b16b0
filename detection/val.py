"""Validate a trained detector: COCO-style box (and optional mask) mAP over a
YOLO-format dataset split. Complements detection/train.py (the reference reads
mAP from Ultralytics internals; this is the standalone equivalent).

Usage: python detection/val.py --weights <ckpt> --data detection/dataset.yaml
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", required=True)
    p.add_argument("--data", default=str(Path(__file__).parent / "dataset.yaml"))
    p.add_argument("--split", default="val", choices=["train", "val"])
    p.add_argument("--conf", type=float, default=0.001)
    p.add_argument("--nc", type=int, default=None)
    p.add_argument("--scale", default="n")
    p.add_argument("--masks", action="store_true", help="also compute mask mAP")
    p.add_argument("--limit", type=int, default=0, help="max images (0=all)")
    args = p.parse_args(argv)

    from poseestimator_tpu.pipeline import Detector
    from poseestimator_tpu.training import list_samples, load_dataset_yaml
    from poseestimator_tpu.training.evaluate import evaluate_detector

    spec = load_dataset_yaml(args.data)
    nc = args.nc if args.nc is not None else max(spec.nc, 1)
    samples = list_samples(spec, args.split)
    if args.limit:
        samples = samples[: args.limit]
    if not samples:
        raise SystemExit(f"no {args.split} samples in {args.data}")

    det = Detector(args.weights, nc=nc, scale=args.scale)
    m = evaluate_detector(det, samples, conf=args.conf, use_masks=args.masks)
    print(json.dumps(m, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
