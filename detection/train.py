"""YOLO11-seg fine-tuning — drop-in for reference detection/train.py.

Same operating point (train.py:5-20): epochs=300, imgsz=640, batch=16, Adam,
lr0=0.001, patience=10, save + save_json, project/name run dirs, resume flag.
Runs on the TPU training path (data-parallel over the device mesh).

Usage: python detection/train.py --data detection/dataset.yaml [overrides]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from poseestimator_tpu.training import TrainConfig, Trainer


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default=str(Path(__file__).parent / "dataset.yaml"))
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--optimizer", default="Adam")
    p.add_argument("--lr0", type=float, default=0.001)
    p.add_argument("--device", default="0")  # accepted for parity; mesh-driven
    p.add_argument("--name", default="Legoblock")
    p.add_argument("--project", default=str(Path(__file__).parent / "output_runs"))
    p.add_argument("--exist-ok", action="store_true", default=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--scale", default="n")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mosaic", type=float, default=0.5,
                   help="4-image mosaic probability (Ultralytics default "
                        "recipe; 0 disables for A/B runs)")
    p.add_argument("--close-mosaic", type=int, default=10,
                   help="disable mosaic for the final N epochs "
                        "(Ultralytics close_mosaic)")
    args = p.parse_args(argv)

    cfg = TrainConfig(
        data=args.data, epochs=args.epochs, imgsz=args.imgsz, batch=args.batch,
        optimizer=args.optimizer, lr0=args.lr0, name=args.name,
        project=args.project, exist_ok=args.exist_ok, resume=args.resume,
        patience=args.patience, scale=args.scale, dtype=args.dtype, seed=args.seed,
        mosaic=args.mosaic, close_mosaic=args.close_mosaic,
        save=True, save_json=True,
    )
    trainer = Trainer(cfg)
    state, history = trainer.fit()
    print(f"finished: {len(history)} epochs, run dir {cfg.run_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
