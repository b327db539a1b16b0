"""The drop-in ``pose_estimator`` compatibility namespace: reference import
paths and call signatures resolve to the TPU implementations."""
import numpy as np
import pytest


class TestCompatImports:
    def test_reference_import_surface(self):
        # the exact import lines the reference entry points use
        from pose_estimator.EstimHelpers.Detector import Detector
        from pose_estimator.EstimHelpers.PoseEstimator import PoseEstimator
        from pose_estimator.EstimHelpers.RealSenseClass import RealSenseCamera
        from pose_estimator.EstimHelpers.detection_utils import detect_mask
        from pose_estimator.EstimHelpers.HelpersRealtime import (
            alignment_score,
            camera_eye_lookat_up_from_H,
            draw_model_projection_with_axes,
            enforce_upright_pose_y_up,
            project_points,
        )
        from pose_estimator.EstimHelpers.registration_utils import (
            TemplateMetrics,
            chamfer_distance,
            find_best_template_teaser,
            get_angular_error,
            get_pointcloud,
            initial_align_centroid_pca,
            load_camera_intrinsics,
        )
        from pose_estimator.EstimHelpers.template_creation import (
            render_lego_views,  # the name the reference imports but never defined
            render_templates,
        )
        from pose_estimator import main_image, main_realsense, main_seibersdorf

        assert render_lego_views is render_templates
        assert callable(main_realsense.main)

    def test_numpy_surface(self, rng):
        """Compat functions consume/return plain numpy like the reference."""
        from pose_estimator.EstimHelpers.HelpersRealtime import (
            cloud_resolution,
            enforce_upright_pose_y_up,
            nn_residuals,
            project_points,
            voxel_coverage,
        )
        from pose_estimator.EstimHelpers.registration_utils import (
            chamfer_distance,
            get_angular_error,
        )

        T = np.diag([1.0, -1.0, -1.0, 1.0])
        out = enforce_upright_pose_y_up(T)
        assert isinstance(out, np.ndarray) and out.shape == (4, 4)

        pts = rng.normal(size=(50, 3)).astype(np.float64)
        K = np.array([[100.0, 0, 32], [0, 100, 32], [0, 0, 1]])
        Tc = np.eye(4)
        Tc[2, 3] = 2.0
        uv = project_points(pts, K, Tc)
        assert uv.dtype.kind == "i" and uv.shape[1] == 2

        assert get_angular_error(np.eye(3), np.eye(3)) < 1e-6
        assert chamfer_distance(pts, pts) < 1e-5
        r = nn_residuals(pts, pts + 0.001)
        assert len(r) == 50
        assert voxel_coverage(pts, 10.0) >= 1
        assert cloud_resolution(pts) > 0
