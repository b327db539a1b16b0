"""Object-window rasterization (pipeline/window.py): origin/coverage
invariants, windowed backprojection parity, and windowed track/search
behavior parity against the full-frame paths.

The raster-level window == full-frame-crop identity is covered in
tests/test_raster.py::test_window_matches_full_crop; these tests cover the
pipeline wiring above it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import l_shape_mesh, write_mesh

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.pipeline import PoseEstimator
from poseestimator_tpu.pipeline.tracking import _track_step
from poseestimator_tpu.pipeline.window import TRACK_WIN, window_dims, window_origin
from poseestimator_tpu.render.raster import render_depth_mesh

INTR = g3.Intrinsics.from_fov(60.0, 128, 96)
_GL_TO_CV = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


def gt_pose(angle=0.1, dirv=(1.0, 1.0, 1.0), dist=2.0):
    d = np.asarray(dirv, np.float64)
    d = d / np.linalg.norm(d)
    T_gl = np.asarray(g3.look_at(d * dist, [0, 0, 0], [0, 1, 0]))
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = np.asarray(g3.rot_z(angle) @ g3.rot_x(angle * 0.5))
    return (P @ (_GL_TO_CV @ T_gl)).astype(np.float32)


@pytest.fixture(scope="module")
def estimator(tmp_path_factory):
    d = tmp_path_factory.mktemp("cad_win")
    cad = write_mesh(d / "l.ply", l_shape_mesh())
    return PoseEstimator(cad, str(d / "views"), INTR, target_points=100, seed=0)


class TestWindowConfig:
    def test_auto_gates_on_resolution(self):
        # tiny test camera: the default window buys < 4x -> full frame
        assert window_dims(INTR, "auto") is None
        # product half-res view: windowed
        half = g3.Intrinsics.from_fov(60.0, 320, 240)
        assert window_dims(half, "auto") == TRACK_WIN
        # explicit tuple always windows (clamped to the frame)
        assert window_dims(INTR, (48, 64)) == (48, 64)
        assert window_dims(INTR, (256, 256)) == (96, 128)
        # None always disables
        assert window_dims(half, None) is None

    def test_origin_covers_projected_object(self, estimator):
        T = jnp.asarray(gt_pose())
        wh, ww = 64, 64
        o = np.asarray(window_origin(estimator._mesh_v, T, INTR, wh, ww))
        # window inside the frame
        assert 0 <= o[0] <= INTR.width - ww
        assert 0 <= o[1] <= INTR.height - wh
        # the full-frame render's coverage lies inside the window
        d = np.asarray(render_depth_mesh(
            estimator._mesh_v, estimator._mesh_f, T, INTR, near=0.01, far=10.0
        ))
        vv, uu = np.nonzero(d > 0)
        assert uu.min() >= o[0] and uu.max() < o[0] + ww
        assert vv.min() >= o[1] and vv.max() < o[1] + wh

    def test_origin_clamps_at_frame_edge(self, estimator):
        # object projected near the left edge: origin clamps to 0
        T = gt_pose()
        T[0, 3] -= 1.1  # push far left
        o = np.asarray(window_origin(
            estimator._mesh_v, jnp.asarray(T), INTR, 48, 64))
        assert o[0] == 0

    def test_behind_camera_falls_back_to_center(self, estimator):
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = -2.0
        o = np.asarray(window_origin(
            estimator._mesh_v, jnp.asarray(T), INTR, 48, 64))
        assert 0 <= o[0] <= INTR.width - 64 and 0 <= o[1] <= INTR.height - 48


class TestBackprojectOrigin:
    def test_windowed_backprojection_matches_full(self, estimator):
        T = jnp.asarray(gt_pose())
        wh, ww = 64, 64
        o = window_origin(estimator._mesh_v, T, INTR, wh, ww)
        full_d = render_depth_mesh(
            estimator._mesh_v, estimator._mesh_f, T, INTR, near=0.01, far=10.0)
        win_d = render_depth_mesh(
            estimator._mesh_v, estimator._mesh_f, T, INTR, near=0.01,
            far=10.0, origin=o.astype(jnp.float32), out_hw=(wh, ww))
        full_c = g3.backproject_depth(full_d, INTR, depth_min=0.01,
                                      depth_max=10.0)
        win_c = g3.backproject_depth(win_d, INTR, depth_min=0.01,
                                     depth_max=10.0, origin=o)
        pf = np.asarray(full_c.points)[np.asarray(full_c.valid)]
        pw = np.asarray(win_c.points)[np.asarray(win_c.valid)]
        # identical point sets (window covers the whole silhouette); raster
        # order within the window matches the row-major full-frame order
        assert pf.shape == pw.shape
        # to fp rounding: the origin shift folds into the face coefficients,
        # so interpolated depth differs in the last ulp (~4e-6 m observed)
        np.testing.assert_allclose(
            np.sort(pf, axis=0), np.sort(pw, axis=0), atol=2e-5)


class TestWindowedTrackStep:
    def test_windowed_step_matches_full_frame_quality(self, estimator):
        """The windowed fused step must converge like the full-frame step on
        the same perturbed pose (not bitwise — the sampling pools differ)."""
        from poseestimator_tpu.camera import SyntheticCamera

        T_gt = gt_pose()
        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts),
            np.zeros_like(np.asarray(estimator._cad_pts)),
            [T_gt], INTR, mesh=estimator.mesh,
        )
        cam.get_rgbd()
        mask = cam.depth > 0
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = np.asarray(g3.rot_z(0.04))
        T_pert = P @ T_gt.copy()
        T_pert[:3, 3] += [0.02, -0.015, 0.02]
        model = g3.from_points(estimator.mesh.vertices)
        add_before = float(g3.add_metric(
            jnp.asarray(T_pert), jnp.asarray(T_gt), model))
        adds = {}
        for name, win in (("full", None), ("win", (64, 64))):
            T_new, fitness, rmse, cov = _track_step(
                estimator._mesh_v, estimator._mesh_f, mask, cam.depth,
                jnp.asarray(T_pert), INTR, 300, jax.random.PRNGKey(0),
                icp_dist=jnp.float32(0.05), win_hw=win,
            )
            adds[name] = float(g3.add_metric(T_new, jnp.asarray(T_gt), model))
            assert float(fitness) > 0.5, name
        assert adds["win"] < add_before * 0.7, adds
        assert adds["full"] < add_before * 0.7, adds
        # the two instruments must agree to well under the correction size
        assert abs(adds["win"] - adds["full"]) < 0.5 * add_before, adds

    def test_windowed_step_vmapped_tracks(self, estimator):
        """Per-track windows under vmap (the multi-object batched step):
        each track's dynamic window follows ITS pose."""
        from poseestimator_tpu.camera import SyntheticCamera

        poses = [gt_pose(0.1), gt_pose(0.3, dirv=(0.0, 1.0, 1.0), dist=2.3)]
        model = g3.from_points(estimator.mesh.vertices)
        masks, depths, perts = [], [], []
        for T_gt in poses:
            cam = SyntheticCamera(
                np.asarray(estimator._cad_pts),
                np.zeros_like(np.asarray(estimator._cad_pts)),
                [T_gt], INTR, mesh=estimator.mesh,
            )
            cam.get_rgbd()
            masks.append(np.asarray(cam.depth > 0))
            depths.append(np.asarray(cam.depth))
            P = np.eye(4, dtype=np.float32)
            P[:3, :3] = np.asarray(g3.rot_z(0.03))
            Tp = P @ T_gt.copy()
            Tp[:3, 3] += [0.015, -0.01, 0.015]
            perts.append(Tp)
        # one shared frame containing both objects (max-depth merge is fine
        # here: objects are disjoint in image space for these poses)
        depth = jnp.asarray(np.maximum(depths[0], depths[1]))
        step = jax.vmap(
            _track_step,
            in_axes=(None, None, 0, None, 0, None, None, 0, 0),
        )
        T_new, fit, rmse, cov = step(
            estimator._mesh_v, estimator._mesh_f,
            jnp.asarray(np.stack(masks)), depth,
            jnp.asarray(np.stack(perts), jnp.float32), INTR, 300,
            jax.random.split(jax.random.PRNGKey(1), 2),
            jnp.full((2,), 0.05, jnp.float32),
        )
        for i, T_gt in enumerate(poses):
            before = float(g3.add_metric(
                jnp.asarray(perts[i]), jnp.asarray(T_gt), model))
            after = float(g3.add_metric(T_new[i], jnp.asarray(T_gt), model))
            assert after < before, (i, before, after)


def test_windowed_search_finds_pose(estimator):
    """The windowed template search lands the same-quality pose as the
    full-frame search (sampling pools differ, so poses agree only to ICP
    noise — both must pass the module's ADD gate)."""
    from poseestimator_tpu.pipeline.pose_estimator import _search_templates

    T_gt = gt_pose()
    d = render_depth_mesh(
        estimator._mesh_v, estimator._mesh_f, jnp.asarray(T_gt), INTR,
        near=0.01, far=10.0)
    from poseestimator_tpu.geom3d.cloud import compact

    dst = compact(
        g3.backproject_depth(d, INTR, depth_min=0.01, depth_max=10.0), 16384)
    model = g3.from_points(estimator.mesh.vertices)
    diag = float(np.linalg.norm(estimator.mesh.extent))
    obs_sil = d > 0
    for win in ((64, 64), None):
        H_pre, H_ref, best, scores, Ts = _search_templates(
            dst.points, dst.valid,
            estimator._tpl_points, estimator._tpl_valid, estimator._tpl_fpfh,
            "mesh", estimator._mesh_v, estimator._mesh_f, INTR,
            obs_sil, True, jnp.float32(estimator.voxel_size),
            jax.random.PRNGKey(3), win_hw=win,
        )
        add = float(g3.add_metric(jnp.asarray(H_ref), jnp.asarray(T_gt),
                                  model))
        assert add < 0.1 * diag, (win, add, diag)
