"""Mosaic-augmentation A/B: train the product detector twice on the same
cluttered synthetic dataset — mosaic OFF vs ON — and report the val mAP50
delta (VERDICT r3 item 6; the reference trains under Ultralytics defaults,
which include mosaic — reference detection/train.py:5-20).

The dataset comes from detection/generate.py's scene generator (multi-object
+ distractor clutter + procedural backgrounds): the occlusion/scale-mixing
regime mosaic exists for. Both runs share data, seed, schedule; only the
``mosaic`` probability differs.

Usage:
    python tools/ab_mosaic.py --cpu --epochs 60 --train 48 --val 16
    python tools/ab_mosaic.py --epochs 120 --train 96       # real TPU
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--train", type=int, default=48)
    p.add_argument("--val", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr0", type=float, default=2e-3)
    p.add_argument("--mosaic", type=float, default=0.5,
                   help="mosaic probability for the ON arm")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json-out", default="")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from detection.generate import main as generate_main
    from poseestimator_tpu import training as TR
    from poseestimator_tpu.render.mesh import make_icosphere
    from poseestimator_tpu.utils.plyio import write_ply

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ))
    from helpers import l_shape_mesh  # the standard eval CAD

    tmp = tempfile.mkdtemp(prefix="ab_mosaic_")
    # two classes: the L-shape eval CAD + a sphere distractor-class
    l_ply = os.path.join(tmp, "l.ply")
    m = l_shape_mesh(1.0)
    write_ply(l_ply, m.vertices, faces=m.faces)
    s_ply = os.path.join(tmp, "s.ply")
    sp = make_icosphere(0.12, 3)
    write_ply(s_ply, sp.vertices, faces=sp.faces)

    data_root = os.path.join(tmp, "synth")
    generate_main([
        "--cad", f"lshape={l_ply}", "--cad", f"sphere={s_ply}",
        "--out", data_root, "--train", str(args.train),
        "--val", str(args.val), "--imgsz", f"{args.imgsz}x{args.imgsz}",
        "--max-objects", "3", "--max-distractors", "2",
        "--seed", str(args.seed),
    ])
    yml = os.path.join(data_root, "dataset.yaml")

    rows = {}
    for name, mosaic in (("off", 0.0), ("on", args.mosaic)):
        cfg = TR.TrainConfig(
            data=yml, epochs=args.epochs, imgsz=args.imgsz, batch=args.batch,
            lr0=args.lr0, warmup_epochs=3.0, patience=args.epochs,
            project=os.path.join(tmp, "runs"), name=f"mosaic_{name}",
            workers=2, augment=True, mosaic=mosaic, max_instances=8,
            seed=args.seed,
        )
        tr = TR.Trainer(cfg)
        t0 = time.time()
        state, _ = tr.fit(log=lambda *a: None, tensorboard=False)
        metrics = tr.evaluate_map(state)
        rows[name] = {
            "mosaic": mosaic,
            "map50": round(float(metrics["map50"]), 4),
            "map50_95": round(float(metrics.get("map50_95", np.nan)), 4),
            "train_s": round(time.time() - t0, 1),
        }
        print(f"mosaic={mosaic}: mAP50 {rows[name]['map50']:.3f} "
              f"({rows[name]['train_s']:.0f}s)")

    delta = rows["on"]["map50"] - rows["off"]["map50"]
    out = {"rows": rows, "map50_delta_on_minus_off": round(delta, 4),
           "epochs": args.epochs, "train_images": args.train,
           "imgsz": args.imgsz, "close_mosaic": 10}
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
