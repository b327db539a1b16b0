"""Single-frame init A/B harness: the BASELINE.md "Single-frame BOP-scene
init" experiment, reproducible in one command.

Generates the 12-frame random-orientation L-shape BOP scene (exact-raster
instrument, seed 7 — the round-4 recipe) once into a work dir, then sweeps
the requested product-search configurations through ``tools/eval_bop.py``
and prints one JSON line per config plus a final table. This is the harness
behind the init-accuracy numbers (BOP AR) in BASELINE.md.

Run:
    python tools/eval_init.py --cpu                     # default sweep
    python tools/eval_init.py --cpu --configs full:1:2  # view_set:polish:res
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work-dir", default=None,
                   help="scene/template cache dir (default: a temp dir; "
                        "pass a fixed path to reuse the generated scene)")
    p.add_argument("--configs", nargs="*",
                   default=["reduced:1:2", "full:1:2", "full:2:2", "full:1:1",
                            "full:2:1"],
                   help="view_set:polish:score_res triples to sweep")
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--json-out", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, root)
    import numpy as np

    from poseestimator_tpu.render.mesh import TriangleMesh  # noqa: F401
    from poseestimator_tpu.utils.plyio import write_ply

    work = args.work_dir
    if work is None:
        import tempfile

        work = tempfile.mkdtemp(prefix="init_ab_")
    os.makedirs(work, exist_ok=True)

    cad = os.path.join(work, "l.ply")
    if not os.path.exists(cad):
        sys.path.insert(0, os.path.join(root, "tests"))
        from helpers import l_shape_mesh

        m = l_shape_mesh(1.0)
        write_ply(cad, m.vertices, faces=m.faces)

    scene = os.path.join(work, "scene_mesh")
    if not os.path.exists(os.path.join(scene, "scene_gt.json")):
        # the round-4 recipe: 10 train + 2 val frames, one object, no
        # distractors, exact-raster depth, no sensor noise, seed 7
        from detection.generate import main as gen_main

        gen_args = [
            "--cad", f"lshape={cad}", "--out", scene,
            "--train", str(args.frames - 2), "--val", "2",
            "--imgsz", "640x480", "--max-objects", "1",
            "--max-distractors", "0", "--bop",
            "--depth-instrument", "mesh", "--noise-sigma", "0",
            "--seed", "7",
        ]
        if args.cpu:
            gen_args.append("--cpu")
        gen_main(gen_args)

    from tools.eval_bop import build_parser as bop_parser, run as bop_run

    results = []
    for cfg in args.configs:
        view_set, polish, score_res = cfg.split(":")
        tdir = os.path.join(work, f"views_{view_set}")
        bop_args = [
            "--scene-dir", scene, "--ply", cad, "--templates", tdir,
            "--mask", "visib", "--registration", "product",
            "--view-set", view_set, "--polish", polish,
            "--score-res", score_res,
        ]
        if args.cpu:
            bop_args.append("--cpu")
        summary = bop_run(bop_parser().parse_args(bop_args), quiet=True)
        row = {"config": cfg}
        if summary:
            row.update({k: summary[k] for k in
                        ("adds_mean_mm", "bop_ar", "ar_vsd", "ar_mssd",
                         "ar_mspd") if k in summary})
            if "ambiguous_frames" in summary:
                row["ambiguous_frames"] = summary["ambiguous_frames"]
        results.append(row)
        print(json.dumps(row), flush=True)

    print(f"{'config':>14} {'ADD-S mm':>10} {'BOP AR':>8} {'ambig':>6}")
    for r in results:
        print(f"{r['config']:>14} {r.get('adds_mean_mm', float('nan')):>10.1f} "
              f"{r.get('bop_ar', float('nan')):>8.3f} "
              f"{r.get('ambiguous_frames', '-'):>6}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
