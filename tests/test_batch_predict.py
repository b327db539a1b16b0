"""Batched detection path: predict_batch consistency with single-image
inference, and the predict.py --folder CLI."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from poseestimator_tpu.models.yolo.model import YOLO11Seg
from poseestimator_tpu.pipeline import Detector


def make_detector(nc=2, imgsz=128):
    model = YOLO11Seg(nc=nc, scale="n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)),
                           train=False)
    return Detector(variables, nc=nc, imgsz=imgsz)


class TestPredictBatch:
    def test_matches_single(self, rng):
        det = make_detector()
        imgs = rng.integers(0, 255, (3, 96, 128, 3), dtype=np.uint8)
        dets, boxes_orig = det.predict_batch(imgs, conf=0.0)
        # per-image single calls must agree on scores of the top detection
        for b in range(3):
            d1, _, bo1 = det(imgs[b], conf=0.0)
            np.testing.assert_allclose(
                np.asarray(dets.scores[b]), np.asarray(d1.scores), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(boxes_orig[b]), np.asarray(bo1), atol=1e-3
            )

    def test_with_masks_false_matches_boxes(self, rng):
        """The mask-free program (mAP sweeps at max_det=300 discard masks)
        must return identical detections/boxes, masks=None."""
        det = make_detector()
        img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        d1, m1, b1 = det(img, conf=0.0)
        d2, m2, b2 = det(img, conf=0.0, with_masks=False)
        assert m2 is None and m1 is not None
        np.testing.assert_array_equal(np.asarray(d1.scores), np.asarray(d2.scores))
        np.testing.assert_array_equal(np.asarray(d1.classes), np.asarray(d2.classes))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

    def test_bfloat16_close_to_float32(self, rng):
        """--detector-dtype bfloat16 (main_realsense / serving bench axis):
        the bf16 forward must produce scores consistent with f32 — params
        stay f32, conv blocks compute in the MXU-native format."""
        det32 = make_detector()
        det16 = Detector(det32.variables, nc=2, imgsz=128, dtype="bfloat16")
        img = np.asarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
        d32, m32, _ = det32(img, conf=0.0)
        d16, m16, _ = det16(img, conf=0.0)
        s32 = float(np.max(np.asarray(d32.scores)))
        s16 = float(np.max(np.asarray(d16.scores)))
        assert abs(s32 - s16) < 0.03, (s32, s16)
        assert np.asarray(m16).shape == np.asarray(m32).shape

    def test_folder_cli(self, tmp_path, rng):
        import cv2
        import sys

        sys.path.insert(0, "detection")
        import importlib

        predict = importlib.import_module("predict")

        folder = tmp_path / "imgs"
        folder.mkdir()
        for i in range(5):
            cv2.imwrite(str(folder / f"{i}.png"),
                        rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))

        # patch Detector to the small random-weight one (no weights file)
        small = make_detector()
        predict.Detector = lambda *a, **k: small
        rc = predict.main(["--weights", "unused", "--folder", str(folder),
                           "--batch", "2", "--conf", "0.9"])
        assert rc == 0
