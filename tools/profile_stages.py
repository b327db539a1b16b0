"""Per-stage device-time profile of the fused frame program (real TPU).

Through the dev tunnel, per-dispatch round trips floor at ~1.2 ms, so timing
each stage as its own program misattributes the dispatch cost (CLAUDE.md).
Instead this profiles CUMULATIVE PREFIX programs of the fused frame — stage k's
program runs stages 1..k fused — each timed with a pipelined (non-blocking)
loop and a final tiny host fetch; the difference of consecutive prefix times
is that stage's marginal device cost, dispatch-floor free.

Stages (the product fused step, pipeline/tracking.py Tracker._build_fused_step
+ _track_step):

  0 dispatch_floor (near-empty program)   1 letterbox
  2 yolo_forward       3 decode+nms       4 assemble_mask(1)
  5 render_depth       6 tpl_backproj+sample4k (76.8k pool)
  7 obs_backproject    8 obs_sample4k (307k pool)
  9 outlier_removal   10 icp (dense, 30 it)

Run:  python tools/profile_stages.py [--frames 100]
Prints a per-stage table plus one JSON line. Results are recorded in
docs/PERFORMANCE.md's stage table.
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
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="YOLO forward dtype (the --detector-dtype axis)")
    args = p.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from poseestimator_tpu import geom3d as g3
    from poseestimator_tpu.models import yolo as Y
    from poseestimator_tpu.pipeline.window import window_dims, window_origin
    from poseestimator_tpu.registration import icp_point_to_point
    from poseestimator_tpu.render.raster import render_depth_mesh

    dev = jax.devices()[0]
    print(f"device: {dev}")

    intr = g3.Intrinsics.from_fov(60.0, 640, 480)
    r = 2  # render_downscale of the product step
    intr_r = g3.Intrinsics(
        fx=intr.fx / r, fy=intr.fy / r, cx=intr.cx / r, cy=intr.cy / r,
        width=intr.width // r, height=intr.height // r,
    )
    model = Y.YOLO11Seg(nc=5, scale="n", dtype=getattr(jnp, args.dtype))
    img640 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img640, train=False)

    # realistic tracking operating point (content matters: the ICP stage is
    # an early-exit while_loop — random depth would find zero inliers and
    # exit degenerately, undercounting it; see tools/_scene.py)
    from tools._scene import make_light_scene

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (480, 640, 3), dtype=np.uint8))
    (cad_pts, cad_valid, mesh_v, mesh_f, T0, _T_obs, depth,
     obj_sil) = make_light_scene(intr, rng)

    # ---- the fused frame, parameterized by how many stages run ------------
    # stage 0 is an (almost) empty program: its pipelined per-call time IS
    # the dispatch floor, so stage 1's marginal cost is floor-corrected
    def make_prefix(k):
        @jax.jit
        def prog(key):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            out = jax.random.uniform(k1, ())
            if k >= 1:
                lb, meta = Y.letterbox(frame, 640)
                out = out + lb[0, 0, 0]
            if k >= 2:
                raw = model.apply(variables, lb[None], train=False)
                # touch every head output so no branch is dead-code-eliminated
                out = out + sum(jnp.ravel(v)[0] for v in jax.tree.leaves(raw))
            if k >= 3:
                boxes, cls, mc = Y.decode_boxes(raw)
                det = Y.nms(boxes[0], cls[0], mc[0], conf_thres=0.25,
                            iou_thres=0.7, pre_nms=1024, max_det=32)
                out = out + det.scores[0]
            if k >= 4:
                mask = Y.assemble_masks(
                    raw["proto"][0], det.coeffs[:1], det.boxes[:1],
                    det.valid[:1], meta, 480, 640,
                )[0]
                # sum the FULL mask: a subsampled slice would let XLA compute
                # only the sliced elements of the elementwise crop/threshold
                out = out + jnp.sum(mask.astype(jnp.float32))
            # stages 5-8 mirror the WINDOWED product step (_track_step
            # win_hw="auto" at 640x480: a 128x128 half-res window around
            # the projected object; pipeline/window.py)
            win = window_dims(intr_r, "auto")
            if k >= 5:
                if win is not None:
                    orig_r = window_origin(mesh_v, T0, intr_r, *win)
                    dtpl = render_depth_mesh(
                        mesh_v, mesh_f, T0, intr_r, near=0.01, far=5.0,
                        origin=orig_r.astype(jnp.float32), out_hw=win)
                else:
                    dtpl = render_depth_mesh(mesh_v, mesh_f, T0, intr_r,
                                             near=0.01, far=5.0)
                out = out + dtpl[0, 0]
            if k >= 6:
                tpl = g3.backproject_depth(
                    dtpl, intr_r, depth_min=0.01, depth_max=5.0,
                    origin=None if win is None else orig_r)
                prev_down = g3.random_sample(k3, tpl, 4096)
                out = out + prev_down.points[0, 0]
            if k >= 7:
                # random-weight YOLO mask unioned with the true silhouette:
                # keeps the detection ops live while the geometry path sees
                # the product's object-dominated mask (bench.py's pattern)
                m_full = mask | obj_sil
                if win is not None:
                    orig_f = orig_r * r
                    fwin = (win[0] * r, win[1] * r)
                    dwin = jax.lax.dynamic_slice(
                        depth, (orig_f[1], orig_f[0]), fwin)
                    mwin = jax.lax.dynamic_slice(
                        m_full, (orig_f[1], orig_f[0]), fwin)
                    obs = g3.backproject_depth(dwin, intr, mask=mwin,
                                               depth_min=1e-6, origin=orig_f)
                else:
                    obs = g3.backproject_depth(depth, intr, mask=m_full,
                                               depth_min=1e-6)
                out = out + obs.points[0, 0]
            if k >= 8:
                obs = g3.random_sample(k4, obs, 4096)
                out = out + obs.points[0, 0]
            if k >= 9:
                dst_down = g3.remove_statistical_outlier(obs, 20, 1.0,
                                                         approx=True)
                out = out + dst_down.points[0, 0]
            if k >= 10:
                icp = icp_point_to_point(
                    prev_down, dst_down, max_corr_dist=jnp.float32(0.01),
                    max_iterations=30,
                )
                out = out + icp.T[0, 0] + icp.fitness
            return out

        return prog

    names = [
        "dispatch_floor", "letterbox", "yolo_forward", "decode+nms",
        "assemble_mask", "render_depth(win)", "tpl_backproj+sample4k",
        "obs_backproject(win)", "obs_sample4k", "outlier_removal",
        "icp_dense",
    ]
    key = jax.random.PRNGKey(7)
    keys = list(jax.random.split(key, args.frames))
    cum = []
    for k in range(0, 11):
        prog = make_prefix(k)
        t0 = time.time()
        jax.block_until_ready(prog(key))
        compile_s = time.time() - t0
        jax.block_until_ready(prog(keys[0]))  # second warm call
        t0 = time.time()
        for i in range(args.frames):
            out = prog(keys[i])
        np.asarray(out)  # host fetch: proves the queue drained
        per = (time.time() - t0) / args.frames * 1000.0
        cum.append(per)
        print(f"prefix {k} ({names[k]:>21}): {per:7.3f} ms/frame "
              f"(compile {compile_s:.1f}s)")

    stages = {}
    prev = 0.0
    print("\nmarginal per-stage device cost:")
    for name, c in zip(names, cum):
        stages[name] = round(c - prev, 3)
        print(f"  {name:>21}: {c - prev:7.3f} ms")
        prev = c
    print(json.dumps({"total_ms": round(cum[-1], 3), "stages_ms": stages,
                      "device": str(dev), "frames": args.frames}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
