"""utils tests: config tree, metrics logger, overlay drawing, profiling."""
import json
import os

import numpy as np

from poseestimator_tpu import utils as U


class TestConfig:
    def test_defaults(self):
        cfg = U.load_config()
        assert cfg.detector.conf == 0.7
        assert cfg.tracker.icp_dist == 0.01

    def test_yaml_roundtrip(self, tmp_path):
        cfg = U.load_config()
        cfg.detector.nc = 7
        cfg.tracker.target_pts = 321
        p = str(tmp_path / "cfg.yaml")
        U.save_config(cfg, p)
        back = U.load_config(p)
        assert back.detector.nc == 7
        assert back.tracker.target_pts == 321

    def test_dotted_overrides(self):
        cfg = U.load_config(None, **{"tracker.icp_dist": 0.05, "detector.conf": 0.5})
        assert cfg.tracker.icp_dist == 0.05
        assert cfg.detector.conf == 0.5

    def test_unknown_key_raises(self):
        import pytest

        with pytest.raises(KeyError):
            U.load_config(None, **{"tracker.not_a_field": 1})


class TestMetricsLogger:
    def test_jsonl_and_summary(self, tmp_path):
        p = str(tmp_path / "m.jsonl")
        log = U.MetricsLogger(p)
        for i in range(5):
            log.log(U.FrameMetrics(
                frame_id=i, state="track", timings_ms={"detect": 5.0 + i},
                icp_fitness=0.9, detected=True,
            ))
        log.log(U.FrameMetrics(frame_id=5, state="lost"))
        log.close()
        lines = open(p).read().strip().splitlines()
        assert len(lines) == 6
        rec = json.loads(lines[0])
        assert rec["state"] == "track" and "ts" in rec
        s = log.summary()
        assert s["frames"] == 6
        assert abs(s["detect_ms_mean"] - 7.0) < 1e-6
        assert s["n_lost"] == 1

    def test_template_metrics_shape(self):
        t = U.TemplateMetrics(0, 10, 5, 5, 5)
        assert t.num_correspondences == 10


class TestOverlay:
    def test_draw_projection(self):
        from poseestimator_tpu.utils.overlay import draw_model_projection_with_axes

        img = np.zeros((100, 100, 3), np.uint8)
        pts = np.zeros((10, 3), np.float32)
        K = np.array([[100.0, 0, 50], [0, 100, 50], [0, 0, 1]])
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 1.0
        out = draw_model_projection_with_axes(img, pts, K, T)
        assert out[50, 50].any()  # red dot + axes at center


class TestProfiling:
    def test_stage_timer(self):
        import jax.numpy as jnp

        t = U.StageTimer()
        out = t.timed("square", lambda x: x * x, jnp.ones(16))
        assert "square" in t.timings_ms
        assert t.timings_ms["square"] >= 0
