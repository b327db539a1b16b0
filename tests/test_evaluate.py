"""mAP evaluator tests: closed-form AP cases."""
import numpy as np

from poseestimator_tpu.training.evaluate import ImageEval, compute_map


def img(pred_boxes, scores, pred_cls, gt_boxes, gt_cls):
    return ImageEval(
        pred_boxes=np.asarray(pred_boxes, np.float32).reshape(-1, 4),
        pred_scores=np.asarray(scores, np.float32),
        pred_classes=np.asarray(pred_cls, np.int64),
        gt_boxes=np.asarray(gt_boxes, np.float32).reshape(-1, 4),
        gt_classes=np.asarray(gt_cls, np.int64),
    )


class TestMAP:
    def test_perfect_detection(self):
        b = [[0, 0, 10, 10], [20, 20, 30, 30]]
        m = compute_map([img(b, [0.9, 0.8], [0, 0], b, [0, 0])])
        assert abs(m["map50"] - 1.0) < 1e-6
        assert abs(m["map50_95"] - 1.0) < 1e-6

    def test_no_predictions(self):
        m = compute_map([img(np.zeros((0, 4)), [], [], [[0, 0, 10, 10]], [0])])
        assert m["map50"] == 0.0

    def test_false_positive_halves_precision(self):
        # 1 GT, 2 preds: correct one at higher score -> AP stays 1.0;
        # correct one at LOWER score -> AP = 0.5
        gt = [[0, 0, 10, 10]]
        m_hi = compute_map([img([[0, 0, 10, 10], [50, 50, 60, 60]],
                                [0.9, 0.3], [0, 0], gt, [0])])
        assert abs(m_hi["map50"] - 1.0) < 1e-6
        m_lo = compute_map([img([[0, 0, 10, 10], [50, 50, 60, 60]],
                                [0.3, 0.9], [0, 0], gt, [0])])
        assert abs(m_lo["map50"] - 0.5) < 1e-6

    def test_iou_threshold_sweep(self):
        # prediction overlaps GT with IoU ~ 0.6: counts at 0.5, not at 0.75
        gt = [[0, 0, 10, 10]]
        pred = [[0, 0, 10, 7.5]]  # IoU = 0.75
        m = compute_map([img(pred, [0.9], [0], gt, [0])],
                        iou_thresholds=[0.5, 0.8])
        assert abs(m["map50"] - 1.0) < 1e-6
        assert abs(m["map50_95"] - 0.5) < 1e-6  # mean of AP@0.5=1, AP@0.8=0

    def test_class_confusion(self):
        gt = [[0, 0, 10, 10]]
        m = compute_map([img([[0, 0, 10, 10]], [0.9], [1], gt, [0])])
        assert m["map50"] == 0.0

    def test_multi_image_aggregation(self):
        a = img([[0, 0, 10, 10]], [0.9], [0], [[0, 0, 10, 10]], [0])
        b = img(np.zeros((0, 4)), [], [], [[5, 5, 15, 15]], [0])
        m = compute_map([a, b])
        # 1 of 2 GTs found at full precision -> AP = 0.5
        assert abs(m["map50"] - 0.5) < 1e-6


class TestMaskMAP:
    def test_mask_iou_decides(self):
        from poseestimator_tpu.training.evaluate import compute_map

        h, w = 32, 32
        gt_mask = np.zeros((h, w), bool)
        gt_mask[8:24, 8:24] = True
        good = gt_mask.copy()
        bad = np.zeros((h, w), bool)
        bad[0:4, 0:4] = True
        box = [8, 8, 24, 24]

        def im(pred_mask):
            return ImageEval(
                pred_boxes=np.asarray([box], np.float32),
                pred_scores=np.asarray([0.9], np.float32),
                pred_classes=np.asarray([0]),
                gt_boxes=np.asarray([box], np.float32),
                gt_classes=np.asarray([0]),
                pred_masks=pred_mask[None],
                gt_masks=gt_mask[None],
            )

        m_good = compute_map([im(good)], use_masks=True)
        m_bad = compute_map([im(bad)], use_masks=True)
        assert m_good["map50"] == 1.0
        assert m_bad["map50"] == 0.0
        # box mAP for the same bad-mask prediction would be perfect
        m_box = compute_map([im(bad)], use_masks=False)
        assert m_box["map50"] == 1.0
