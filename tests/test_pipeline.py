"""End-to-end pipeline tests: PoseEstimator template search on synthetic
observations (the main_image-style slice, minus YOLO), render-at-pose, camera
sources + depth filters, and the tracking FSM with a stub detector."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import l_shape_mesh, write_mesh

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.camera import (
    ReplayCamera,
    SyntheticCamera,
    hole_filling_filter,
    spatial_filter,
    temporal_filter,
)
from poseestimator_tpu.pipeline import PoseEstimator, Tracker
from poseestimator_tpu.pipeline.tracking import _track_step

INTR = g3.Intrinsics.from_fov(60.0, 128, 96)


@pytest.fixture(scope="module")
def estimator(tmp_path_factory):
    d = tmp_path_factory.mktemp("cad")
    cad = write_mesh(d / "l.ply", l_shape_mesh())
    return PoseEstimator(cad, str(d / "views"), INTR, target_points=100, seed=0)


_GL_TO_CV = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


def gt_pose(angle=0.1, dirv=(1.0, 1.0, 1.0), dist=2.0):
    """Model->camera pose: camera looking at the object from near a template
    view direction, perturbed by ``angle`` (the operating regime of the
    5-view template DB — views far outside its coverage are out of scope,
    matching the reference design)."""
    d = np.asarray(dirv, np.float64)
    d = d / np.linalg.norm(d)
    T_gl = np.asarray(g3.look_at(d * dist, [0, 0, 0], [0, 1, 0]))
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = np.asarray(g3.rot_z(angle) @ g3.rot_x(angle * 0.5))
    return (P @ (_GL_TO_CV @ T_gl)).astype(np.float32)


def observe(estimator, T_gt, key=0):
    """Render the CAD at T_gt and back-project: a synthetic observed cloud.

    Uses the EXACT triangle raster: at this module's coarse 128x96 camera a
    3x3 splat's scatter-min pulls the observed surface ~4 cm toward the
    camera (18 mm/px at 2 m; the bias scales with pixel size). The old
    splat-splat setup cancelled that bias against the splat-predicted
    views; with the product's exact raster predictions the observation
    must be unbiased too — as a real camera is."""
    from poseestimator_tpu.geom3d.cloud import compact
    from poseestimator_tpu.render.raster import render_depth_mesh

    d = render_depth_mesh(
        estimator._mesh_v, estimator._mesh_f, jnp.asarray(T_gt), INTR,
        near=0.01, far=10.0,
    )
    c = g3.backproject_depth(d, INTR, depth_min=0.01, depth_max=10.0)
    return compact(c, 16384)


class TestPoseEstimator:
    def test_templates_prepared(self, estimator):
        assert estimator.templates.count == 5
        assert estimator._tpl_fpfh.shape[0] == 5
        # each downsampled template has a healthy point count
        counts = np.asarray(estimator._tpl_valid.sum(axis=1))
        assert (counts > 50).all()

    def test_find_best_template(self, estimator):
        T_gt = gt_pose()
        dst = observe(estimator, T_gt)
        H, src_down = estimator.find_best_template_teaser(dst)
        model = g3.from_points(estimator.mesh.vertices)
        add = float(g3.add_metric(jnp.asarray(H), jnp.asarray(T_gt), model))
        diag = float(np.linalg.norm(estimator.mesh.extent))
        assert add < 0.1 * diag, f"ADD {add:.4f} vs diag {diag:.3f}"

    def test_find_best_template_second_pose(self, estimator):
        T_gt = gt_pose(angle=0.25, dirv=(0.0, 1.0, 1.0), dist=2.4)
        dst = observe(estimator, T_gt, key=1)
        H, _ = estimator.find_best_template_teaser(dst)
        model = g3.from_points(estimator.mesh.vertices)
        add = float(g3.add_metric(jnp.asarray(H), jnp.asarray(T_gt), model))
        diag = float(np.linalg.norm(estimator.mesh.extent))
        assert add < 0.1 * diag, f"ADD {add:.4f}"

    def test_create_template_from_H_close_range_unbiased(self, tmp_path):
        # Regression (round-2 verdict weak-1): _render_template used to
        # compact() the full-res back-projection to 16384 points before
        # sampling; any view with more valid pixels kept only the raster TOP
        # (the round-1 drift bug class). A close-range 640x480 view covers
        # far more than 16384 px; the sampled template's centroid/extent must
        # match the full back-projection's.
        from poseestimator_tpu.render import render_depth

        intr = g3.Intrinsics.from_fov(60.0, 640, 480)
        cad = write_mesh(tmp_path / "l.ply", l_shape_mesh())
        est = PoseEstimator(cad, str(tmp_path / "views"), intr, target_points=100, seed=0)
        T = jnp.asarray(gt_pose(dist=1.2))
        d = render_depth(est._cad_pts, est._cad_valid, T, intr, near=0.01, far=5.0)
        full = g3.backproject_depth(d, intr, depth_min=0.01, depth_max=5.0)
        n_px = int(full.count())
        assert n_px > 16384, f"test premise: close view must exceed the old cap ({n_px})"

        tpl = est.create_template_from_H(np.asarray(T), 4096)
        assert int(tpl.count()) == 4096
        c_full = np.asarray(full.centroid())
        c_tpl = np.asarray(tpl.centroid())
        assert np.linalg.norm(c_full - c_tpl) < 0.01, (c_full, c_tpl)
        from poseestimator_tpu.geom3d.cloud import bounding_box

        lo_f, hi_f = (np.asarray(a) for a in bounding_box(full))
        lo_t, hi_t = (np.asarray(a) for a in bounding_box(tpl))
        ext_f, ext_t = hi_f - lo_f, hi_t - lo_t
        assert np.all(np.abs(ext_t - ext_f) < 0.05 * np.linalg.norm(ext_f) + 1e-3)

    def test_create_template_from_H(self, estimator):
        T = gt_pose()
        tpl = estimator.create_template_from_H(T, 100)
        assert int(tpl.count()) == 100
        # template points live on the object's surface under T: compare with
        # an observation of the same pose
        obs = observe(estimator, T)
        d, m = g3.nn_residuals(tpl, obs)
        from poseestimator_tpu.geom3d.masked import masked_mean

        assert float(masked_mean(d, m)) < 0.02


class TestCameraSources:
    def test_synthetic_camera_frames(self, estimator):
        poses = [gt_pose(0.1), gt_pose(0.15)]
        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts), np.zeros_like(np.asarray(estimator._cad_pts)),
            poses, INTR,
        )
        c1 = cam.get_rgbd()
        assert c1.shape == (96, 128, 3) and c1.dtype == np.uint8
        assert np.asarray(cam.depth).max() > 0
        np.testing.assert_allclose(cam.current_gt, poses[0])
        assert cam.get_rgbd() is not None
        assert cam.get_rgbd() is None  # exhausted

    def test_synthetic_camera_cloud(self, estimator):
        T = gt_pose()
        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts), np.zeros_like(np.asarray(estimator._cad_pts)),
            [T], INTR, noise_sigma=0.0,
        )
        cam.get_rgbd()
        mask = (np.asarray(cam.depth) > 0).astype(np.uint8) * 255
        cloud = cam.get_pcd_from_rgbd(mask)
        assert int(cloud.count()) > 500
        # points at sensible range
        pts = g3.to_numpy(cloud)
        assert 1.0 < pts[:, 2].mean() < 4.0

    def test_synthetic_camera_multi_instance(self, estimator):
        """(N, 4, 4) pose stacks render N instances composited by nearest
        depth; object_masks are the per-instance visible silhouettes."""
        Ta = gt_pose(0.1).copy()
        Tb = gt_pose(0.4).copy()
        Ta[0, 3] -= 0.45
        Tb[0, 3] += 0.45
        pts = np.asarray(estimator._cad_pts)
        cam = SyntheticCamera(
            pts, np.zeros_like(pts), [np.stack([Ta, Tb])], INTR,
        )
        assert cam.get_rgbd() is not None
        assert cam.current_gt.shape == (2, 4, 4)
        ma, mb = np.asarray(cam.object_masks)
        d = np.asarray(cam.depth)
        # both instances visible, disjoint winners, union = object pixels
        assert ma.sum() > 50 and mb.sum() > 50
        assert not (ma & mb).any()
        assert ((ma | mb) == (d > 0)).all()
        assert (np.asarray(cam.object_mask) == (ma | mb)).all()
        # each instance's mask back-projects to points near ITS centroid x
        ca = g3.to_numpy(cam.get_pcd_from_rgbd(ma.astype(np.uint8) * 255))
        cb = g3.to_numpy(cam.get_pcd_from_rgbd(mb.astype(np.uint8) * 255))
        assert ca[:, 0].mean() < cb[:, 0].mean()

    def test_replay_camera(self):
        frames = [
            (np.zeros((8, 8, 3), np.uint8), np.full((8, 8), 1.0, np.float32)),
            (np.ones((8, 8, 3), np.uint8), np.full((8, 8), 2.0, np.float32)),
        ]
        intr = g3.Intrinsics.from_fov(60.0, 8, 8)
        cam = ReplayCamera(frames, intr, filter_depth=False, loop=False)
        assert cam.get_rgbd()[0, 0, 0] == 0
        assert cam.get_rgbd()[0, 0, 0] == 1
        assert cam.get_rgbd() is None
        cam2 = ReplayCamera(frames, intr, loop=True)
        for _ in range(5):
            assert cam2.get_rgbd() is not None


class TestDepthFilters:
    def test_spatial_smooths_noise(self, rng):
        d = 1.0 + rng.normal(size=(32, 32)).astype(np.float32) * 0.003
        out = np.asarray(spatial_filter(jnp.asarray(d)))
        assert out.std() < d.std()

    def test_spatial_preserves_edges(self):
        d = np.full((16, 16), 1.0, np.float32)
        d[:, 8:] = 2.0
        out = np.asarray(spatial_filter(jnp.asarray(d)))
        np.testing.assert_allclose(out[:, :7], 1.0, atol=1e-6)
        np.testing.assert_allclose(out[:, 9:], 2.0, atol=1e-6)

    def test_temporal_blend(self):
        prev = jnp.full((4, 4), 1.0)
        cur = jnp.full((4, 4), 1.01)
        out = np.asarray(temporal_filter(cur, prev, alpha=0.4, delta=0.02))
        np.testing.assert_allclose(out, 0.4 * 1.01 + 0.6 * 1.0, atol=1e-6)

    def test_temporal_keeps_prev_in_holes(self):
        prev = jnp.full((4, 4), 1.5)
        cur = jnp.zeros((4, 4))
        out = np.asarray(temporal_filter(cur, prev))
        np.testing.assert_allclose(out, 1.5)

    def test_hole_filling(self):
        d = np.full((8, 8), 2.0, np.float32)
        d[4, 4] = 0.0
        out = np.asarray(hole_filling_filter(jnp.asarray(d)))
        assert out[4, 4] == 2.0


class StubDetector:
    """Bypasses YOLO during pipeline tests: mask = rendered depth > 0."""

    def __init__(self, camera):
        self.camera = camera

    def __call__(self, img, conf=0.7, iou=0.7):
        from poseestimator_tpu.models.yolo.nms import Detections

        mask = self.camera.depth > 0
        det = Detections(
            boxes=jnp.zeros((1, 4)), scores=jnp.ones(1), classes=jnp.zeros(1, jnp.int32),
            coeffs=jnp.zeros((1, 32)), valid=jnp.ones(1, bool),
        )
        return det, mask[None], jnp.zeros((1, 4))


class TestTracking:
    def test_track_step_reduces_error(self, estimator):
        """One fused track step pulls a perturbed pose toward the truth.

        Exact-raster observation (``mesh=``): at 128x96 the splat camera's
        scatter-min biases the observed surface ~4 cm toward the camera and
        the raster-predicted ICP faithfully converges to that biased
        surface — a real camera is unbiased, so the test instrument must be
        too (see ``observe``)."""
        T_gt = gt_pose()
        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts), np.zeros_like(np.asarray(estimator._cad_pts)),
            [T_gt], INTR, mesh=estimator.mesh,
        )
        cam.get_rgbd()
        mask = cam.depth > 0
        # perturbation well above the random-sampling ICP noise floor
        # (~spacing/sqrt(N) = a few mm at 300 pts on this object)
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = np.asarray(g3.rot_z(0.04))
        T_pert = P @ T_gt.copy()
        T_pert[:3, 3] += [0.02, -0.015, 0.02]
        model = g3.from_points(estimator.mesh.vertices)
        add_before = float(g3.add_metric(jnp.asarray(T_pert), jnp.asarray(T_gt), model))
        T_new, fitness, rmse, cov = _track_step(
            estimator._mesh_v, estimator._mesh_f, mask, cam.depth,
            jnp.asarray(T_pert), INTR, 300, jax.random.PRNGKey(0),
            icp_dist=jnp.float32(0.05),
        )
        add_after = float(g3.add_metric(T_new, jnp.asarray(T_gt), model))
        assert add_after < add_before * 0.7, (add_before, add_after)
        assert float(fitness) > 0.5
        # the step's pose covariance: symmetric PSD 6x6, finite, and small
        # for this well-constrained full-view registration
        cov = np.asarray(cov)
        assert cov.shape == (6, 6) and np.all(np.isfinite(cov))
        assert np.allclose(cov, cov.T, atol=1e-10)
        assert np.all(np.linalg.eigvalsh(cov) > -1e-12)

    def test_predict_pose_cv_constant_twist(self):
        # a pose sequence generated by a constant camera-frame delta D must
        # be predicted exactly: T2 = D @ T1 = predict(T1, T0)
        from poseestimator_tpu.pipeline.tracking import predict_pose_cv

        T0 = gt_pose(0.2)
        D = np.eye(4, dtype=np.float32)
        D[:3, :3] = np.asarray(g3.rot_z(0.05))
        D[:3, 3] = [0.01, -0.02, 0.005]
        T1 = (D @ T0).astype(np.float32)
        T2 = (D @ T1).astype(np.float32)
        np.testing.assert_allclose(predict_pose_cv(T1, T0), T2, atol=1e-5)

    @pytest.mark.slow
    def test_fast_rotation_needs_motion_model(self, estimator):
        """At a per-frame rotation too fast for render-at-last-pose ICP, the
        constant-velocity motion model keeps the track accurate."""
        # 0.11 rad/frame (~14x the canonical eval speed) sits just past the
        # render-at-last-pose basin: measured final-frame ADD-S 14.5 cm
        # (track lost) vs 3.9 cm with constant-velocity prediction (sweep in
        # docs/PERFORMANCE.md "Motion model")
        step = 0.11
        angles = [0.1] * 12 + list(0.1 + step * np.arange(10))
        poses = [gt_pose(a) for a in angles]
        model = g3.from_points(estimator.mesh.vertices)
        diag = float(np.linalg.norm(estimator.mesh.extent))
        finals = {}
        for mm in ("none", "constant_velocity"):
            # exact-raster observation: the splat camera's ~4 cm scatter-min
            # bias at 128x96 otherwise lands on top of the CV model's true
            # residual (see test_track_step_reduces_error)
            cam = SyntheticCamera(
                np.asarray(estimator._cad_pts),
                np.zeros_like(np.asarray(estimator._cad_pts)),
                list(poses), INTR, mesh=estimator.mesh,
            )
            tracker = Tracker(
                cam, estimator, StubDetector(cam), target_pts=0, icp_dist=0.05,
                warmup_frames=3, max_init_frames=20, motion_model=mm,
            )
            last = None
            while True:
                res = tracker.step()
                if res is None:
                    break
                if res.state == "track" and res.detected:
                    last = (res.T_m2c, cam.current_gt)
            assert last is not None
            finals[mm] = float(
                g3.adds_metric(jnp.asarray(last[0]), jnp.asarray(last[1]), model)
            )
        # the CV model must hold an accurate track at this speed...
        assert finals["constant_velocity"] < 0.05 * diag, finals
        # ...and clearly beat render-at-last-pose, which lags/loses the object
        assert finals["constant_velocity"] < finals["none"] * 0.5, finals

    def test_rollout_init_recovers_wrong_first_candidate(self, estimator,
                                                         monkeypatch):
        """Multi-frame init (init_rollout > 0): when the single-frame search
        ranks a flipped basin FIRST, tracking the top candidates through the
        extra warm-up frames and re-scoring must select the true basin and
        report a positive ambiguity margin."""
        T_gt = gt_pose()
        # wrong basin: the object flipped 180 deg about its model Y axis —
        # a classic near-symmetric confusion whose render differs clearly
        F = np.eye(4, dtype=np.float32)
        F[:3, :3] = np.asarray(g3.rot_y(np.pi))
        T_wrong = (T_gt @ F).astype(np.float32)
        # slightly perturbed truth as the SECOND-ranked candidate
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = np.asarray(g3.rot_z(0.03))
        T_near = (P @ T_gt).astype(np.float32)
        T_near[:3, 3] += [0.01, -0.01, 0.01]

        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts),
            np.zeros_like(np.asarray(estimator._cad_pts)),
            [T_gt] * 12, INTR, mesh=estimator.mesh,
        )
        tracker = Tracker(
            cam, estimator, StubDetector(cam), target_pts=0, icp_dist=0.05,
            warmup_frames=2, max_init_frames=20, init_rollout=3,
        )
        monkeypatch.setattr(
            estimator, "find_best_template_candidates",
            lambda dst, keep_pre_icp=False, mask=None: (
                T_wrong, None,
                [(0.10, T_wrong, 0), (0.12, T_near, 1)],
            ),
        )
        res = tracker.step()
        assert res is not None and res.state == "init"
        assert res.init_margin > 0.0
        model = g3.from_points(estimator.mesh.vertices)
        diag = float(np.linalg.norm(estimator.mesh.extent))
        add_sel = float(g3.add_metric(
            jnp.asarray(res.T_m2c), jnp.asarray(T_gt), model))
        add_wrong = float(g3.add_metric(
            jnp.asarray(T_wrong), jnp.asarray(T_gt), model))
        assert add_sel < 0.15 * diag, (add_sel, add_wrong, diag)
        assert add_sel < 0.3 * add_wrong
        # the fallback ladder leads with the winner's basin
        assert tracker._candidates[0][2] == 1

    @pytest.mark.slow
    def test_full_fsm_loop(self, estimator):
        """INIT (warm-up + global registration) then TRACK across a moving
        trajectory, with a stub detector — the headless main_realsense loop."""
        angles = [0.1] * 12 + list(0.1 + 0.01 * np.arange(8))
        poses = [gt_pose(a) for a in angles]
        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts), np.zeros_like(np.asarray(estimator._cad_pts)),
            poses, INTR,
        )
        tracker = Tracker(
            cam, estimator, StubDetector(cam), target_pts=300, icp_dist=0.05,
            warmup_frames=3, max_init_frames=20,
        )
        model = g3.from_points(estimator.mesh.vertices)
        diag = float(np.linalg.norm(estimator.mesh.extent))
        results = []
        while True:
            res = tracker.step()
            if res is None:
                break
            results.append(res)
        states = [r.state for r in results]
        assert "init" in states
        track_results = [r for r in results if r.state == "track" and r.detected]
        assert len(track_results) >= 5
        # pose error against the ground truth of the LAST tracked frame
        final = track_results[-1]
        gt = cam.current_gt
        adds = float(g3.adds_metric(jnp.asarray(final.T_m2c), jnp.asarray(gt), model))
        assert adds < 0.15 * diag, f"ADD-S {adds:.4f} vs diag {diag:.3f}"

    @pytest.mark.slow
    def test_lost_state_reinit(self, estimator):
        """Misses flip the FSM to lost and then back to re-initialization."""
        T = gt_pose()
        poses = [T] * 40
        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts), np.zeros_like(np.asarray(estimator._cad_pts)),
            poses, INTR,
        )

        class FlakyDetector(StubDetector):
            def __init__(self, camera):
                super().__init__(camera)
                self.call = 0

            def __call__(self, img, conf=0.7, iou=0.7):
                self.call += 1
                det, masks, boxes = super().__call__(img, conf, iou)
                if 5 <= self.call < 12:  # a run of misses after init
                    from poseestimator_tpu.models.yolo.nms import Detections

                    det = Detections(
                        boxes=jnp.zeros((1, 4)), scores=jnp.zeros(1),
                        classes=jnp.zeros(1, jnp.int32), coeffs=jnp.zeros((1, 32)),
                        valid=jnp.zeros(1, bool),
                    )
                    return det, jnp.zeros_like(masks), boxes
                return det, masks, boxes

        tracker = Tracker(
            cam, estimator, FlakyDetector(cam), warmup_frames=2,
            max_init_frames=10, max_misses=2,
        )
        saw_lost = False
        reinit = 0
        while True:
            res = tracker.step()
            if res is None:
                break
            if res.state == "lost":
                saw_lost = True
            if res.state == "init":
                reinit += 1
        assert saw_lost
        assert reinit >= 2  # initial + at least one re-initialization


class TestPoseFilter:
    """SE(3) alpha-beta output filter (pipeline/tracking.py PoseFilter)."""

    def _traj(self, n, w, v, T0=None, noise=0.0, rng=None):
        from poseestimator_tpu.pipeline.tracking import _so3_exp

        T = np.eye(4) if T0 is None else T0.copy()
        out = []
        for _ in range(n):
            T = T.copy()
            T[:3, :3] = _so3_exp(w) @ T[:3, :3]
            T[:3, 3] += v
            M = T.copy()
            if noise:
                M[:3, :3] = _so3_exp(rng.normal(0, noise, 3)) @ M[:3, :3]
                M[:3, 3] += rng.normal(0, noise, 3)
            out.append((T.copy(), M))
        return out

    def test_alpha_one_is_passthrough(self):
        from poseestimator_tpu.pipeline.tracking import PoseFilter

        f = PoseFilter(alpha=1.0)
        T = np.diag([1.0, 1.0, 1.0, 1.0])
        T[:3, 3] = (0.1, 0.2, 0.3)
        np.testing.assert_allclose(f(T), T, atol=1e-7)

    def test_zero_steady_state_lag_under_constant_velocity(self):
        # the beta velocity term must absorb steady motion: after settling,
        # the filtered pose tracks the true moving pose with ~no lag (a plain
        # EMA at alpha=0.4 would trail by (1-a)/a ~ 1.5 steps forever)
        from poseestimator_tpu.pipeline.tracking import PoseFilter, _so3_log

        f = PoseFilter(alpha=0.4, beta=0.3)
        w, v = np.array([0.0, 0.0, 0.02]), np.array([0.002, 0, 0])
        errs = []
        for T_true, M in self._traj(120, w, v):
            Tf = np.asarray(f(M), np.float64)
            r = np.linalg.norm(_so3_log(Tf[:3, :3] @ T_true[:3, :3].T))
            t = np.linalg.norm(Tf[:3, 3] - T_true[:3, 3])
            errs.append((r, t))
        r_tail = np.mean([e[0] for e in errs[-20:]])
        t_tail = np.mean([e[1] for e in errs[-20:]])
        assert r_tail < 0.002, r_tail  # << the 0.02/frame rotation rate
        assert t_tail < 2e-4, t_tail   # << the 2 mm/frame translation rate

    def test_noise_suppression_on_static_pose(self):
        from poseestimator_tpu.pipeline.tracking import PoseFilter

        rng = np.random.default_rng(0)
        f = PoseFilter(alpha=0.3, beta=0.1)
        T0 = np.eye(4)
        T0[:3, 3] = (0, 0, 2.0)
        raw_err, fil_err = [], []
        for T_true, M in self._traj(150, np.zeros(3), np.zeros(3), T0,
                                    noise=0.004, rng=rng):
            Tf = np.asarray(f(M), np.float64)
            raw_err.append(np.linalg.norm(M[:3, 3] - T_true[:3, 3]))
            fil_err.append(np.linalg.norm(Tf[:3, 3] - T_true[:3, 3]))
        # settled tail: the filter must cut the translation error well below
        # the raw measurement noise
        assert np.mean(fil_err[30:]) < 0.6 * np.mean(raw_err[30:])


class TestPostInitLadder:
    def test_miss_does_not_consume_rung_and_floor_applies(self, estimator, monkeypatch):
        """Advisor r2: (a) a detection miss on the first post-init frame must
        not consume the wide 0.05 rung; (b) a configured icp_dist above a
        rung floors the ladder (never overridden downward)."""
        import poseestimator_tpu.pipeline.tracking as trk

        T = gt_pose()
        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts),
            np.zeros_like(np.asarray(estimator._cad_pts)),
            [T] * 8, INTR,
        )

        class MissOnceDetector(StubDetector):
            def __init__(self, camera):
                super().__init__(camera)
                self.call = 0

            def __call__(self, img, conf=0.7, iou=0.7):
                self.call += 1
                det, masks, boxes = super().__call__(img, conf, iou)
                if self.call == 1:  # miss exactly the first post-init frame
                    from poseestimator_tpu.models.yolo.nms import Detections

                    det = Detections(
                        boxes=jnp.zeros((1, 4)), scores=jnp.zeros(1),
                        classes=jnp.zeros(1, jnp.int32), coeffs=jnp.zeros((1, 32)),
                        valid=jnp.zeros(1, bool),
                    )
                    return det, jnp.zeros_like(masks), boxes
                return det, masks, boxes

        seen_dists = []
        real_step = trk._track_step

        def recording_step(*args, **kwargs):
            seen_dists.append(float(kwargs.get("icp_dist", 0.01)))
            return real_step(*args, **kwargs)

        monkeypatch.setattr(trk, "_track_step", recording_step)
        tracker = Tracker(
            cam, estimator, MissOnceDetector(cam), target_pts=300,
            icp_dist=0.03, warmup_frames=0, max_misses=5,
        )
        tracker.initialized = True
        tracker.T_m2c = T.copy()
        tracker._post_init = 2

        res = tracker.step()  # miss -> lost, rung NOT consumed
        assert res.state == "lost"
        assert tracker._post_init == 2
        tracker.step()  # tracked at rung 0.05
        assert tracker._post_init == 1
        tracker.step()  # rung 0.02 floored at icp_dist=0.03
        assert tracker._post_init == 0
        tracker.step()  # steady state
        assert seen_dists[0] == pytest.approx(0.05)
        assert seen_dists[1] == pytest.approx(0.03)  # max(0.02, icp_dist)
        assert seen_dists[2] == pytest.approx(0.03)


class TestFullViewSet:
    @pytest.mark.slow
    def test_out_of_coverage_pose_recovered(self, tmp_path):
        """A view direction outside the 5-view reduced arc fails there but is
        recovered with the 26-view full template set."""
        from helpers import l_shape_mesh, write_mesh

        cad = write_mesh(tmp_path / "l.ply", l_shape_mesh())
        est = PoseEstimator(
            cad, str(tmp_path / "views26"), INTR, target_points=100,
            view_set="full",
        )
        assert est.templates.count == 26
        # bottom-ish view, far from every reduced-set direction. The exposed
        # surface is near-symmetric, so the single-view TOP candidate may be
        # a flipped pose; the correct pose must appear in the top-ranked
        # candidates (coverage), which downstream temporal consistency can
        # then disambiguate.
        T_gt = gt_pose(angle=0.2, dirv=(0.3, -0.9, 0.6), dist=2.4)
        dst = observe(est, T_gt)
        H, _, candidates = est.find_best_template_candidates(dst)
        model = g3.from_points(est.mesh.vertices)
        diag = float(np.linalg.norm(est.mesh.extent))
        adds = [
            float(g3.add_metric(jnp.asarray(T), jnp.asarray(T_gt), model))
            for _, T, _ in candidates[:3]
        ]
        assert min(adds) < 0.12 * diag, f"top-3 ADDs {adds} vs diag {diag:.3f}"


class TestCandidateFallback:
    def test_switches_to_next_candidate_on_low_fitness(self, estimator):
        """Sustained low ICP fitness advances to the next ranked init pose."""
        T_good = gt_pose()
        T_bad = T_good.copy()
        T_bad[:3, 3] += [0.5, 0.5, 0.5]  # hopeless init
        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts),
            np.zeros_like(np.asarray(estimator._cad_pts)),
            [T_good] * 8, INTR,
        )
        tracker = Tracker(
            cam, estimator, StubDetector(cam), target_pts=300, icp_dist=0.05,
            min_fitness=0.5, fitness_patience=2, warmup_frames=1,
        )
        # inject a fake candidate ranking: bad first, good second
        tracker.initialized = True
        tracker.T_m2c = T_bad
        tracker._candidates = [(0.1, T_bad, 0), (0.2, T_good, 1)]
        tracker._candidate_idx = 0

        switched = False
        for _ in range(6):
            res = tracker.step()
            if res is None:
                break
            if tracker._candidate_idx == 1:
                switched = True
        assert switched, "tracker never fell back to the second candidate"
        model = g3.from_points(estimator.mesh.vertices)
        adds = float(g3.adds_metric(jnp.asarray(tracker.T_m2c), jnp.asarray(T_good), model))
        diag = float(np.linalg.norm(estimator.mesh.extent))
        assert adds < 0.3 * diag


class TestReinitOnLowFitness:
    def test_in_frame_divergence_triggers_global_reinit(self, estimator):
        """Failure detection beyond the reference FSM: the reference re-inits
        only on detection misses (main_realsense.py:100), so a diverged track
        with the object still detected is permanent. With
        ``reinit_fitness > 0`` sustained near-zero ICP fitness must declare
        the track lost (detected=True!) and drop back to INIT for a fresh
        global search."""
        T_good = gt_pose()
        T_bad = T_good.copy()
        T_bad[:3, 3] += [0.5, 0.5, 0.5]  # beyond any correspondence gate
        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts),
            np.zeros_like(np.asarray(estimator._cad_pts)),
            [T_good] * 14, INTR,
        )
        tracker = Tracker(
            cam, estimator, StubDetector(cam), target_pts=300, icp_dist=0.05,
            reinit_fitness=0.5, reinit_patience=2, warmup_frames=1,
            max_init_frames=10,
        )
        tracker.initialized = True
        tracker.T_m2c = T_bad

        results = []
        while True:
            res = tracker.step()
            if res is None:
                break
            results.append(res)
        states = [r.state for r in results]
        # the divergence is reported lost WITH a successful detection — the
        # distinguishing signal vs the reference's miss-counter path
        lost_detected = [r for r in results if r.state == "lost" and r.detected]
        assert lost_detected, f"no detected-lost frame in {states}"
        i_lost = states.index("lost")
        assert "init" in states[i_lost:], f"no re-init after lost: {states}"
        # the global search must put tracking back on the true pose
        model = g3.from_points(estimator.mesh.vertices)
        diag = float(np.linalg.norm(estimator.mesh.extent))
        tracked_after = [
            r for r in results[i_lost:] if r.state == "track" and r.detected
        ]
        assert tracked_after, f"never tracked again after lost: {states}"
        adds = float(g3.adds_metric(
            jnp.asarray(tracked_after[-1].T_m2c), jnp.asarray(cam.current_gt),
            model,
        ))
        assert adds < 0.3 * diag, f"post-recovery ADD-S {adds:.4f} vs diag {diag:.3f}"

    def test_disabled_by_default_keeps_reference_parity(self, estimator):
        """With reinit_fitness=0 (the default) a diverged-but-detected track
        never re-initializes — reference parity."""
        T_good = gt_pose()
        T_bad = T_good.copy()
        T_bad[:3, 3] += [0.5, 0.5, 0.5]
        cam = SyntheticCamera(
            np.asarray(estimator._cad_pts),
            np.zeros_like(np.asarray(estimator._cad_pts)),
            [T_good] * 6, INTR,
        )
        tracker = Tracker(
            cam, estimator, StubDetector(cam), target_pts=300, icp_dist=0.05,
            warmup_frames=1, max_init_frames=10,
        )
        tracker.initialized = True
        tracker.T_m2c = T_bad
        states = []
        while True:
            res = tracker.step()
            if res is None:
                break
            states.append(res.state)
        assert "init" not in states
        assert all(s == "track" for s in states), states


class TestSyntheticSceneClutter:
    """Occluder + background-wall options of SyntheticCamera (the
    occlusion/clutter robustness axes of tools/eval_tracking.py)."""

    def _cam(self, estimator, **kw):
        T = gt_pose()
        return SyntheticCamera(
            np.asarray(estimator._cad_pts),
            np.zeros_like(np.asarray(estimator._cad_pts)),
            [T], INTR, **kw,
        )

    def test_occluder_depth_and_object_mask(self, estimator):
        cam0 = self._cam(estimator)
        cam0.get_rgbd()
        full = np.asarray(cam0.object_mask)
        d0 = np.asarray(cam0.depth)
        # object straddles the image center; occlude the middle columns
        x0, x1, z = 60, 68, 1.0
        cam = self._cam(estimator, occluder=(x0, x1, z))
        cam.get_rgbd()
        d = np.asarray(cam.depth)
        vis = np.asarray(cam.object_mask)
        # the stripe is entirely at the plate depth (plate nearer than both
        # the object at ~2 m and the empty background)
        assert np.allclose(d[:, x0:x1], z)
        # outside the stripe the scene is untouched
        assert np.array_equal(d[:, :x0], d0[:, :x0])
        assert np.array_equal(d[:, x1:], d0[:, x1:])
        # object_mask = visible object only: nothing inside the stripe,
        # identical to the full silhouette outside it
        assert not vis[:, x0:x1].any()
        assert np.array_equal(vis[:, :x0], full[:, :x0])
        assert (full[:, x0:x1]).sum() > 0  # the stripe really hid something

    def test_background_wall_and_object_mask(self, estimator):
        cam = self._cam(estimator, background_depth=3.0)
        cam.get_rgbd()
        d = np.asarray(cam.depth)
        vis = np.asarray(cam.object_mask)
        assert (d > 0).all()  # wall fills every empty pixel
        assert np.allclose(d[~vis], 3.0)  # non-object pixels are the wall
        assert (d[vis] < 2.9).all()  # object pixels keep object depth
        # a 2-px dilated mask now bleeds wall points into the cloud
        import cv2

        dil = cv2.dilate(vis.astype(np.uint8), np.ones((5, 5), np.uint8)) > 0
        cloud = cam.get_pcd_from_rgbd(jnp.asarray(dil))
        zs = np.asarray(cloud.points)[np.asarray(cloud.valid), 2]
        assert (zs > 2.9).sum() > 0, "wall points must enter the bled cloud"
