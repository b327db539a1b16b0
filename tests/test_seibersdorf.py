"""main_seibersdorf CLI smoke test: synthetic LiDAR cloud + calib yaml +
stubbed detector, headless."""
import numpy as np
import pytest

from helpers import l_shape_mesh, write_mesh

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.templates import render_templates
from poseestimator_tpu.utils import write_ply


@pytest.fixture(scope="module")
def scene(tmp_path_factory, rng=np.random.default_rng(3)):
    d = tmp_path_factory.mktemp("seiber")
    mesh = l_shape_mesh()
    cad = write_mesh(d / "block.ply", mesh)
    views = str(d / "views")
    render_templates(cad, views)

    # LiDAR frame: object points in a "lidar" frame; camera extrinsic T maps
    # camera -> lidar. Choose camera 2.4 m from the object along a template
    # view direction.
    F = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    dirv = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    T_m2c = (F @ np.asarray(g3.look_at(dirv * 2.4, [0, 0, 0], [0, 1, 0]))).astype(np.float64)

    pts_model, _ = mesh.sample_points_uniformly(6000, np.random.default_rng(0))
    # lidar frame = model frame here; calib T (camera->lidar) = inv(T_m2c)
    T_calib = np.linalg.inv(T_m2c)
    write_ply(str(d / "cloud.ply"), pts_model.astype(np.float32))

    K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])
    import yaml

    with open(d / "calib.yaml", "w") as f:
        yaml.safe_dump(
            {"K": K.reshape(-1).tolist(), "D": [0.0, 0.0, 0.0, 0.0, 0.0],
             "T": T_calib.reshape(-1).tolist()}, f,
        )

    import cv2

    img = np.full((240, 320, 3), 40, np.uint8)
    # paint the projected object region so the mask covers it
    cam_pts = pts_model @ T_m2c[:3, :3].T + T_m2c[:3, 3]
    uv = (K @ cam_pts.T).T
    uv = (uv[:, :2] / uv[:, 2:3]).astype(int)
    ok = (uv[:, 0] >= 0) & (uv[:, 0] < 320) & (uv[:, 1] >= 0) & (uv[:, 1] < 240)
    img[uv[ok, 1], uv[ok, 0]] = (200, 160, 90)
    cv2.imwrite(str(d / "frame.png"), img)

    mask = np.zeros((240, 320), np.uint8)
    mask[uv[ok, 1], uv[ok, 0]] = 255
    mask = cv2.dilate(mask, np.ones((5, 5), np.uint8))
    return d, cad, views, mask, T_m2c, mesh


class TestSeibersdorfCLI:
    @pytest.mark.slow
    def test_headless(self, scene, tmp_path, monkeypatch):
        d, cad, views, mask, T_m2c, mesh = scene
        from poseestimator_tpu.apps import main_seibersdorf as app

        class StubDetector:
            def __init__(self, *a, **k):
                pass

            def detect_mask(self, img, class_id=0, conf=0.7):
                return [{"mask": mask, "class_id": 0, "conf": 0.99,
                         "bbox": [0, 0, 320, 240]}]

        monkeypatch.setattr(app, "Detector", StubDetector)
        overlay = str(tmp_path / "ov.png")
        rc = app.main([
            "--weights", "unused", "--ply-path", views, "--cad-path", cad,
            "--image", str(d / "frame.png"), "--cloud", str(d / "cloud.ply"),
            "--calib", str(d / "calib.yaml"), "--headless",
            "--save-overlay", overlay, "--target-points", "300",
        ])
        assert rc == 0
        import cv2

        assert cv2.imread(overlay) is not None

    def test_calib_loader_rpy(self, tmp_path):
        import yaml

        from poseestimator_tpu.apps.main_seibersdorf import load_calib

        with open(tmp_path / "c.yaml", "w") as f:
            yaml.safe_dump({"K": [float(v) for v in np.eye(3).reshape(-1)], "D": [],
                            "xyz": [1.0, 2.0, 3.0], "rpy": [0.1, 0.2, 0.3]}, f)
        K, D, T = load_calib(str(tmp_path / "c.yaml"))
        from scipy.spatial.transform import Rotation as R

        np.testing.assert_allclose(
            T[:3, :3], R.from_euler("xyz", [0.1, 0.2, 0.3]).as_matrix(), atol=1e-5
        )
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3])
