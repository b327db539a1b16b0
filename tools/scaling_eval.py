"""Template-axis scaling evidence on a virtual device mesh.

Measures ``parallel.sharded_template_scores`` (coarse+fine ICP + alignment
scoring per template, template axis sharded, winners all_gathered over the
mesh axis) at mesh sizes 1/2/4/8 with FIXED total work, on the
``--xla_force_host_platform_device_count`` virtual CPU mesh. This is
correctness + scaling-shape evidence for the multi-chip design (SURVEY.md
section 5 "template-axis parallelism"); virtual CPU devices share host
cores, so wall-clock speedups here are a lower bound on what ICI-connected
TPU chips would show.

Run: python tools/scaling_eval.py [--templates 16] [--points 512] [--repeat 5]
Prints one JSON line per mesh size plus a markdown table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--templates", type=int, default=16)
    p.add_argument("--points", type=int, default=512)
    p.add_argument("--repeat", type=int, default=5)
    p.add_argument("--devices", default="1,2,4,8")
    args = p.parse_args(argv)

    n_dev = max(int(d) for d in args.devices.split(","))
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
    from poseestimator_tpu.parallel import sharded_template_scores

    rng = np.random.default_rng(0)
    T, C = args.templates, args.points
    base = rng.normal(size=(C, 3)).astype(np.float32) * 0.3
    tpls = np.stack(
        [base + rng.normal(size=(C, 3)).astype(np.float32) * 0.002 for _ in range(T)]
    )
    dst_p = jnp.asarray(base)
    dst_v = jnp.ones(C, bool)
    tpl_p = jnp.asarray(tpls)
    tpl_v = jnp.ones((T, C), bool)
    init_T = jnp.tile(jnp.eye(4)[None], (T, 1, 1))

    rows = []
    ref_scores = None
    for nd in (int(d) for d in args.devices.split(",")):
        mesh = Mesh(np.array(jax.devices()[:nd]), ("tp",))
        run = lambda: sharded_template_scores(
            mesh, dst_p, dst_v, tpl_p, tpl_v, init_T, voxel=0.05
        )
        Ts, scores = run()
        jax.block_until_ready(scores)  # compile + warm
        t0 = time.time()
        for _ in range(args.repeat):
            Ts, scores = run()
        jax.block_until_ready(scores)
        ms = (time.time() - t0) / args.repeat * 1000.0
        scores_np = np.asarray(scores)
        if ref_scores is None:
            ref_scores = scores_np
        # sharding must not change the math
        np.testing.assert_allclose(scores_np, ref_scores, atol=1e-5)
        row = {
            "mesh_devices": nd,
            "templates": T,
            "points": C,
            "wall_ms": round(ms, 2),
            "speedup_vs_1": round(rows[0]["wall_ms"] / ms, 2) if rows else 1.0,
        }
        rows.append(row)
        print(json.dumps(row))

    print("\n| mesh | wall ms | speedup |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['mesh_devices']}-way | {r['wall_ms']} | {r['speedup_vs_1']}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
