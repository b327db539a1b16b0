"""Multi-object tracking: two instances tracked simultaneously through the
batched (vmapped) frame program, association, miss handling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import l_shape_mesh, write_mesh

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.camera.source import _BaseCamera
from poseestimator_tpu.pipeline import PoseEstimator
from poseestimator_tpu.pipeline.multi_tracking import MultiTracker
from poseestimator_tpu.render.points import render_depth

INTR = g3.Intrinsics.from_fov(60.0, 160, 120)
_F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


def pose(dirv, dist, offset_x=0.0):
    d = np.asarray(dirv, np.float64)
    d = d / np.linalg.norm(d)
    T = _F @ np.asarray(g3.look_at(d * dist, [0, 0, 0], [0, 1, 0]))
    T = T.astype(np.float32)
    T[0, 3] += offset_x
    return T


class TwoObjectCamera(_BaseCamera):
    """Renders two instances of the same CAD at different poses; exposes
    per-object GT poses + masks for the stub detector."""

    def __init__(self, cad_pts, poses_a, poses_b, intrinsics, cad_pts_b=None):
        self.intrinsics = intrinsics
        self._pts = jnp.asarray(cad_pts)
        self._valid = jnp.ones(len(cad_pts), bool)
        # optional second CAD: instance b renders a DIFFERENT model
        # (multi-class scenes)
        pb = cad_pts if cad_pts_b is None else cad_pts_b
        self._pts_b = jnp.asarray(pb)
        self._valid_b = jnp.ones(len(pb), bool)
        self._pa = iter(poses_a)
        self._pb = iter(poses_b)
        self.gt = None
        self.masks = None

    def get_rgbd(self):
        try:
            Ta, Tb = next(self._pa), next(self._pb)
        except StopIteration:
            return None
        da = render_depth(self._pts, self._valid, jnp.asarray(Ta), self.intrinsics,
                          near=0.01, far=10.0)
        db = render_depth(self._pts_b, self._valid_b, jnp.asarray(Tb), self.intrinsics,
                          near=0.01, far=10.0)
        big = 1e9
        za = jnp.where(da > 0, da, big)
        zb = jnp.where(db > 0, db, big)
        depth = jnp.minimum(za, zb)
        self.depth = jnp.where(depth >= big * 0.5, 0.0, depth)
        self.masks = ((da > 0) & (za <= zb), (db > 0) & (zb < za))
        self.gt = (Ta, Tb)
        c = (np.asarray(self.depth) > 0).astype(np.uint8) * 200
        self.color = np.stack([c, c, c], -1)
        return self.color


class TwoObjectStubDetector:
    def __init__(self, camera, max_det=8, classes=(0, 0)):
        self.camera = camera
        self.max_det = max_det
        self.classes = classes

    def __call__(self, img, conf=0.7, iou=0.7):
        from poseestimator_tpu.models.yolo.nms import Detections

        H, W = self.camera.depth.shape
        ma, mb = self.camera.masks
        masks = jnp.zeros((self.max_det, H, W), bool)
        masks = masks.at[0].set(ma).at[1].set(mb)

        def bbox(m):
            ys, xs = np.where(np.asarray(m))
            if len(xs) == 0:
                return np.zeros(4, np.float32)
            return np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)

        boxes = np.zeros((self.max_det, 4), np.float32)
        boxes[0] = bbox(ma)
        boxes[1] = bbox(mb)
        valid = np.zeros(self.max_det, bool)
        valid[:2] = True
        cls = np.zeros(self.max_det, np.int32)
        cls[0], cls[1] = self.classes
        det = Detections(
            boxes=jnp.asarray(boxes), scores=jnp.asarray(valid, jnp.float32),
            classes=jnp.asarray(cls), coeffs=jnp.zeros((self.max_det, 32)),
            valid=jnp.asarray(valid),
        )
        return det, masks, jnp.asarray(boxes)


@pytest.fixture(scope="module")
def estimator(tmp_path_factory):
    d = tmp_path_factory.mktemp("cad")
    cad = write_mesh(d / "l.ply", l_shape_mesh())
    return PoseEstimator(cad, str(d / "views"), INTR, target_points=100, seed=0)


class TestMultiTracker:
    def test_two_objects_tracked(self, estimator):
        n_frames = 8
        # two instances, laterally separated, slowly rotating
        poses_a = [pose((1, 1, 1), 2.4, offset_x=-0.55) for _ in range(n_frames)]
        poses_b = [pose((0, 1, 1), 2.6, offset_x=+0.55) for _ in range(n_frames)]
        cam = TwoObjectCamera(np.asarray(estimator._cad_pts), poses_a, poses_b, INTR)
        det = TwoObjectStubDetector(cam)
        mt = MultiTracker(
            cam, estimator, det, target_pts=300, icp_dist=0.05, conf=0.5,
        )
        results = []
        while True:
            r = mt.step()
            if r is None:
                break
            results.append(r)
        assert len(results) == n_frames
        # both instances become tracks (one spawn per frame -> by frame 2)
        assert len(results[-1].tracks) == 2
        ids = {t.track_id for t in results[-1].tracks}
        assert len(ids) == 2

        # each track's pose is near one of the GT poses (ADD-S)
        model = g3.from_points(estimator.mesh.vertices)
        diag = float(np.linalg.norm(estimator.mesh.extent))
        gts = cam.gt
        for tr in results[-1].tracks:
            errs = [
                float(g3.adds_metric(jnp.asarray(tr.T_m2c), jnp.asarray(gt), model))
                for gt in gts
            ]
            assert min(errs) < 0.2 * diag, f"track {tr.track_id}: {errs}"
        # and they lock onto DIFFERENT objects
        assignments = set()
        for tr in results[-1].tracks:
            errs = [
                float(g3.adds_metric(jnp.asarray(tr.T_m2c), jnp.asarray(gt), model))
                for gt in gts
            ]
            assignments.add(int(np.argmin(errs)))
        assert assignments == {0, 1}

    @pytest.mark.slow
    def test_track_death_on_misses(self, estimator):
        n_frames = 10
        poses_a = [pose((1, 1, 1), 2.4) for _ in range(n_frames)]
        poses_b = [pose((0, 1, 1), 2.6, offset_x=0.9) for _ in range(n_frames)]
        cam = TwoObjectCamera(np.asarray(estimator._cad_pts), poses_a, poses_b, INTR)

        class VanishingDetector(TwoObjectStubDetector):
            def __init__(self, camera):
                super().__init__(camera)
                self.n = 0

            def __call__(self, img, conf=0.7, iou=0.7):
                from poseestimator_tpu.models.yolo.nms import Detections

                self.n += 1
                det, masks, boxes = super().__call__(img, conf, iou)
                if self.n > 4:  # object B vanishes
                    valid = np.asarray(det.valid).copy()
                    valid[1] = False
                    det = det.replace(valid=jnp.asarray(valid))
                    masks = masks.at[1].set(False)
                return det, masks, boxes

        mt = MultiTracker(
            cam, estimator, VanishingDetector(cam), target_pts=300,
            icp_dist=0.05, max_misses=2,
        )
        counts = []
        while True:
            r = mt.step()
            if r is None:
                break
            counts.append(len(r.tracks))
        assert max(counts) == 2
        assert counts[-1] == 1  # vanished object's track retired

    @pytest.mark.slow
    def test_two_classes_two_cads(self, estimator, tmp_path):
        """Heterogeneous scene: instance a is the L-shape (class 0), instance
        b a DIFFERENT box CAD (class 1), each registered/rendered against its
        own model through the single batched multi-class frame program
        (_batched_track_multi). Cross-checks that classes did not swap by
        scoring every track against ITS OWN model only."""
        from helpers import box_mesh

        cad_b = write_mesh(tmp_path / "b.ply", box_mesh(0.5, 0.3, 0.2))
        est_b = PoseEstimator(cad_b, str(tmp_path / "views_b"), INTR,
                              target_points=100, seed=1)

        n_frames = 8
        poses_a = [pose((1, 1, 1), 2.4, offset_x=-0.55) for _ in range(n_frames)]
        poses_b = [pose((0, 1, 1), 2.6, offset_x=+0.55) for _ in range(n_frames)]
        cam = TwoObjectCamera(
            np.asarray(estimator._cad_pts), poses_a, poses_b, INTR,
            cad_pts_b=np.asarray(est_b._cad_pts),
        )
        det = TwoObjectStubDetector(cam, classes=(0, 1))
        mt = MultiTracker(
            cam, {0: estimator, 1: est_b}, det, target_pts=300,
            icp_dist=0.05, conf=0.5,
        )
        results = []
        while True:
            r = mt.step()
            if r is None:
                break
            results.append(r)
        assert len(results) == n_frames
        last = results[-1].tracks
        assert {t.class_id for t in last} == {0, 1}

        models = {
            0: g3.from_points(estimator.mesh.vertices),
            1: g3.from_points(est_b.mesh.vertices),
        }
        gts = {0: cam.gt[0], 1: cam.gt[1]}
        diags = {
            0: float(np.linalg.norm(estimator.mesh.extent)),
            1: float(np.linalg.norm(est_b.mesh.extent)),
        }
        for tr in last:
            err = float(g3.adds_metric(
                jnp.asarray(tr.T_m2c), jnp.asarray(gts[tr.class_id]),
                models[tr.class_id],
            ))
            assert err < 0.2 * diags[tr.class_id], (tr.class_id, err)
