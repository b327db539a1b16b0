"""Template-axis scaling evidence on a virtual device mesh — over the
PRODUCT search program.

Measures ``parallel.sharded_template_search`` — the SAME
``pipeline.pose_estimator._score_templates`` body ``Tracker._initialize``
runs (5 hypotheses/template: FPFH->RANSAC->TEASER + PCA signs; coarse ICP;
render-ICP polish; depth/silhouette scoring) — at mesh sizes 1/2/4/8 with
FIXED total work, on the ``--xla_force_host_platform_device_count`` virtual
CPU mesh. This is correctness + scaling-shape evidence for the multi-chip
design (SURVEY.md section 5 "template-axis parallelism"); virtual CPU
devices share host cores, so wall-clock speedups here are a lower bound on
what ICI-connected TPU chips would show.

Run: python tools/scaling_eval.py [--templates 16] [--points 256] [--repeat 3]
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
    p.add_argument("--points", type=int, default=256)
    p.add_argument("--repeat", type=int, default=3)
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

    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
    from poseestimator_tpu.parallel import (
        make_synthetic_search_inputs,
        sharded_template_search,
    )

    from poseestimator_tpu import geom3d as g3

    inputs = make_synthetic_search_inputs(
        n_tpl=args.templates, C=args.points
    )
    good_idx = inputs.pop("good_idx")
    T_gt = inputs.pop("T_gt")
    model = g3.from_points(np.asarray(inputs["cad_points"]))
    key = jax.random.PRNGKey(0)

    import jax.numpy as _jnp

    n_real = args.templates

    def _padded_inputs(nd):
        """Template arrays padded (by repetition) to a multiple of the mesh
        axis — the PoseEstimator product-path padding, so non-divisible
        counts (e.g. the 26-view full set on 8 devices) shard too."""
        pad = (-n_real) % nd
        if pad == 0:
            return inputs
        reps = -(-(n_real + pad) // n_real)
        out = dict(inputs)
        for k in ("tpl_points", "tpl_valid", "tpl_fpfh"):
            out[k] = _jnp.concatenate([inputs[k]] * reps, axis=0)[: n_real + pad]
        return out

    rows = []
    ref_scores = None
    for nd in (int(d) for d in args.devices.split(",")):
        mesh = Mesh(np.array(jax.devices()[:nd]), ("tp",))
        pin = _padded_inputs(nd)
        run = lambda: sharded_template_search(mesh, key=key, **pin)
        Hp, Hr, scores = run()
        jax.block_until_ready(scores)  # compile + warm
        t0 = time.time()
        for _ in range(args.repeat):
            Hp, Hr, scores = run()
        jax.block_until_ready(scores)
        ms = (time.time() - t0) / args.repeat * 1000.0
        scores_np = np.asarray(scores)[:n_real]
        import jax.numpy as jnp

        w = int(np.argmin(scores_np))
        add = float(g3.add_metric(
            jnp.asarray(np.asarray(Hr)[w]), jnp.asarray(T_gt), model
        ))
        assert add < 0.15, (
            f"product search winner pose wrong on the {nd}-way mesh: "
            f"ADD {add:.4f}, scores {scores_np}"
        )
        if ref_scores is None:
            ref_scores = scores_np
        # sharding must not change the math
        np.testing.assert_allclose(scores_np, ref_scores, atol=1e-5)
        row = {
            "mesh_devices": nd,
            "templates": args.templates,
            "points": args.points,
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
