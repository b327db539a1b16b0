"""Template-axis parallel registration via shard_map — the PRODUCT search
program distributed over a device mesh.

When the template DB grows past a handful of views (SURVEY.md section 5:
"template-axis parallelism for registration if the template DB grows"), the
per-template hypothesis search shards over devices: each device scores its
slice of templates against the (replicated) observed cloud with the SAME
``pipeline.pose_estimator._score_templates`` body that ``Tracker._initialize``
runs single-chip, and the results ride ICI via a tiled all_gather. Per-template
PRNG keys are sharded with their templates, so scores are independent of the
partitioning (asserted in tests/test_parallel.py and tools/scaling_eval.py).

Product entry points:
  - ``PoseEstimator(..., mesh_devices=mesh)`` — the tracker's init path uses
    the sharded search transparently;
  - ``sharded_template_search`` (below) — the functional form the dryrun and
    scaling harnesses call with raw arrays.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh

from ..geom3d import Intrinsics
from ..pipeline.pose_estimator import _search_templates_sharded


def sharded_template_search(
    mesh: Mesh,
    dst_points: jnp.ndarray,
    dst_valid: jnp.ndarray,
    tpl_points: jnp.ndarray,  # (T, C, 3), T divisible by mesh axis size
    tpl_valid: jnp.ndarray,
    tpl_fpfh: jnp.ndarray,  # (T, C, 33)
    cad_points: jnp.ndarray,
    cad_valid: jnp.ndarray,
    intr: Intrinsics,
    key,
    mask_sil=None,
    voxel: float = 0.05,
    axis: str = "tp",
    cad_faces: jnp.ndarray | None = None,
):
    """Run the product template search (5 hypotheses/template, coarse ICP,
    render-ICP polish, depth/silhouette scoring) with the template axis
    sharded over ``axis``. Returns ``(H_pre (T,4,4), H_ref (T,4,4),
    scores (T,))`` fully replicated; the argmin winner is a host-side pick.

    ``cad_faces`` switches the predicted-view instrument to the exact
    triangle raster (``cad_points`` is then the vertex array); without it
    the legacy point splat renders ``(cad_points, cad_valid)`` — the mode
    for point-cloud-only CADs like the synthetic fixtures below.
    """
    have_mask = mask_sil is not None
    if mask_sil is None:
        mask_sil = jnp.zeros((intr.height, intr.width), bool)
    if cad_faces is not None:
        render = ("mesh", cad_points, cad_faces)
    else:
        render = ("points", cad_points, cad_valid)
    return _search_templates_sharded(
        mesh, dst_points, dst_valid, tpl_points, tpl_valid, tpl_fpfh,
        *render, intr, jnp.asarray(mask_sil).astype(bool),
        have_mask, jnp.float32(voxel), key, axis=axis,
    )


def make_synthetic_search_inputs(n_tpl: int = 8, C: int = 256,
                                 n_cad: int = 3000, seed: int = 0,
                                 intr: Intrinsics = None, good_idx: int = 3):
    """Self-contained inputs for exercising the (sharded) product search
    without CAD files: an L-shaped model-frame point blob observed in camera
    frame, a matching template at ``good_idx``, geometrically-different
    decoys elsewhere, and the observed silhouette as the detection mask
    (the product always scores with a mask — Tracker passes the YOLO mask).
    Used by the driver dryrun, tools/scaling_eval.py, and
    tests/test_parallel.py.

    The meaningful correctness assertion for callers is on the WINNER'S POSE
    (``ADD(H_ref[argmin scores], T_gt)`` small), not the winning index —
    the product score measures pose quality against the observation, so a
    decoy that aligns part of its geometry into a good pose may legitimately
    rank close. Returns a dict of kwargs for ``sharded_template_search``
    (minus mesh/key) plus ``{"T_gt": ..., "good_idx": ...}``.
    """
    import numpy as np

    from .. import geom3d as g3
    from ..pipeline.pose_estimator import _extract_fpfh
    from ..geom3d.cloud import PointCloud
    from ..render.points import render_depth

    rng = np.random.default_rng(seed)
    if intr is None:
        intr = g3.Intrinsics.from_fov(60.0, 128, 96)

    def blob(r, n):
        a = r.uniform([-0.15, -0.05, -0.05], [0.15, 0.05, 0.05], (n // 2, 3))
        b = r.uniform([-0.15, -0.05, -0.05], [-0.05, 0.25, 0.05],
                      (n - n // 2, 3))
        return np.concatenate([a, b]).astype(np.float32)

    def decoy(r, n, kind):
        if kind == 0:  # thin rod
            return r.uniform([-0.3, -0.02, -0.02], [0.3, 0.02, 0.02],
                             (n, 3)).astype(np.float32)
        if kind == 1:  # flat plate
            return r.uniform([-0.2, -0.2, -0.01], [0.2, 0.2, 0.01],
                             (n, 3)).astype(np.float32)
        # hollow cube shell
        p = r.uniform(-0.12, 0.12, (n, 3)).astype(np.float32)
        ax = r.integers(0, 3, n)
        sgn = np.where(r.random(n) < 0.5, -0.12, 0.12).astype(np.float32)
        p[np.arange(n), ax] = sgn
        return p

    cad = blob(rng, n_cad)
    # ground-truth pose: object ~1.2 m in front of the camera, tilted
    F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    d = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    T_gt = (F @ np.asarray(
        g3.look_at(d * 1.2, [0, 0, 0], [0, 1, 0])
    )).astype(np.float32)
    dst = (cad @ T_gt[:3, :3].T + T_gt[:3, 3]).astype(np.float32)
    # the perfect-detector silhouette of the observation
    obs_depth = render_depth(
        jnp.asarray(dst), jnp.ones(len(dst), bool), jnp.eye(4), intr,
        near=0.01, far=5.0,
    )
    mask_sil = obs_depth > 0

    # clamp so small template sets (e.g. dryrun_multichip(1) builds 2) still
    # contain the matching template — otherwise every caller's winner-pose
    # assertion fails on an all-decoy set
    good_idx = min(good_idx, n_tpl - 1)
    tpls, valids, fpfhs = [], [], []
    for t in range(n_tpl):
        if t == good_idx:
            pts = cad[rng.choice(n_cad, C, replace=False)]
        else:
            pts = decoy(np.random.default_rng(seed + 100 + t), C, t % 3)
        cl = PointCloud(points=jnp.asarray(pts), valid=jnp.ones(C, bool))
        cl, f = _extract_fpfh(cl, 0.05, outward=True)
        tpls.append(cl.points)
        valids.append(cl.valid)
        fpfhs.append(f)
    return {
        "dst_points": jnp.asarray(dst), "dst_valid": jnp.ones(len(dst), bool),
        "tpl_points": jnp.stack(tpls), "tpl_valid": jnp.stack(valids),
        "tpl_fpfh": jnp.stack(fpfhs),
        "cad_points": jnp.asarray(cad), "cad_valid": jnp.ones(n_cad, bool),
        "intr": intr, "mask_sil": mask_sil,
        "T_gt": T_gt, "good_idx": good_idx,
    }
