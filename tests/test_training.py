"""Training stack tests: TAL assigner on constructed cases, loss properties,
dataset pipeline contract (dataset.yaml + YOLO-seg labels), and a smoke
fit() that overfits a tiny synthetic detection dataset."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseestimator_tpu.models import yolo as Y
from poseestimator_tpu import training as T


class TestAssigner:
    def test_assigns_inside_anchor(self):
        # one GT box; anchors on a coarse grid; predicted boxes == GT at the
        # inside anchors
        anchors_px = jnp.asarray(
            [[8.0, 8.0], [24.0, 8.0], [40.0, 8.0], [8.0, 24.0], [24.0, 24.0]]
        )
        gt = jnp.asarray([[16.0, 0.0, 48.0, 16.0]])  # covers anchors 1, 2
        gt_cls = jnp.asarray([0], jnp.int32)
        gt_valid = jnp.asarray([True])
        A = anchors_px.shape[0]
        cls_prob = jnp.full((A, 2), 0.6)
        pred = jnp.tile(gt, (A, 1))
        fg, idx, scores, boxes = T.assign(cls_prob, pred, anchors_px, gt, gt_cls, gt_valid)
        fg = np.asarray(fg)
        assert fg[1] and fg[2]
        assert not fg[0] and not fg[3] and not fg[4]
        np.testing.assert_allclose(np.asarray(boxes[1]), np.asarray(gt[0]))
        assert np.asarray(scores)[1, 0] > 0

    def test_multi_gt_conflict(self):
        # an anchor inside two GTs goes to the higher-metric one
        anchors_px = jnp.asarray([[10.0, 10.0]])
        gts = jnp.asarray([[0.0, 0.0, 20.0, 20.0], [5.0, 5.0, 15.0, 15.0]])
        gt_cls = jnp.asarray([0, 1], jnp.int32)
        gt_valid = jnp.asarray([True, True])
        pred = jnp.asarray([[5.0, 5.0, 15.0, 15.0]])  # IoU 1.0 with GT 1
        cls_prob = jnp.asarray([[0.5, 0.5]])
        fg, idx, scores, boxes = T.assign(cls_prob, pred, anchors_px, gts, gt_cls, gt_valid)
        assert bool(fg[0])
        assert int(idx[0]) == 1

    def test_no_valid_gt(self):
        anchors_px = jnp.asarray([[10.0, 10.0]])
        gts = jnp.zeros((2, 4))
        fg, idx, scores, boxes = T.assign(
            jnp.full((1, 3), 0.5), jnp.zeros((1, 4)), anchors_px, gts,
            jnp.zeros(2, jnp.int32), jnp.zeros(2, bool),
        )
        assert not bool(fg[0])
        assert float(jnp.sum(scores)) == 0.0


class TestLossMath:
    def test_ciou_perfect(self):
        b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        v = float(T.ciou(b, b)[0])
        assert abs(v - 1.0) < 1e-6

    def test_ciou_orders_overlap(self):
        b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        near = jnp.asarray([[1.0, 1.0, 11.0, 11.0]])
        far = jnp.asarray([[20.0, 20.0, 30.0, 30.0]])
        assert float(T.ciou(b, near)[0]) > float(T.ciou(b, far)[0])

    def test_bce_matches_definition(self, rng):
        x = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))
        t = jnp.asarray(rng.random(10).astype(np.float32))
        ref = -(t * jax.nn.log_sigmoid(x) + (1 - t) * jax.nn.log_sigmoid(-x))
        np.testing.assert_allclose(np.asarray(T.bce(x, t)), np.asarray(ref), atol=1e-5)

    def test_loss_runs_and_grads_finite(self, rng):
        model = Y.YOLO11Seg(nc=3, scale="n")
        x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        gt_boxes = jnp.asarray([[[8, 8, 40, 40]], [[16, 16, 48, 48]]], jnp.float32)
        gt_cls = jnp.zeros((2, 1), jnp.int32)
        gt_masks = jnp.ones((2, 1, 16, 16), jnp.float32)
        gt_valid = jnp.ones((2, 1), bool)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]}, x, train=False
            )
            total, parts = T.segmentation_loss(out, gt_boxes, gt_cls, gt_masks, gt_valid)
            return total

        val, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(val))
        flat = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        assert any(float(jnp.abs(g).sum()) > 0 for g in flat)


def make_synthetic_dataset(root, n_images=12, size=160, seed=0):
    """Bright ellipse (class 0) and rectangle (class 1) on dark noise."""
    import cv2

    rng = np.random.default_rng(seed)
    for split in ("train_split", "val_split"):
        os.makedirs(os.path.join(root, split, "images"), exist_ok=True)
        os.makedirs(os.path.join(root, split, "labels"), exist_ok=True)
        n = n_images if split == "train_split" else max(n_images // 3, 2)
        for i in range(n):
            img = (rng.random((size, size, 3)) * 40).astype(np.uint8)
            lines = []
            # ellipse, class 0
            cx, cy = rng.integers(40, size - 40, 2)
            ax_, bx = rng.integers(15, 28, 2)
            cv2.ellipse(img, (cx, cy), (ax_, bx), 0, 0, 360, (60, 220, 60), -1)
            th = np.linspace(0, 2 * np.pi, 16, endpoint=False)
            poly = np.stack([cx + ax_ * np.cos(th), cy + bx * np.sin(th)], 1) / size
            lines.append("0 " + " ".join(f"{v:.5f}" for v in poly.reshape(-1)))
            with open(os.path.join(root, split, "labels", f"{i:04d}.txt"), "w") as f:
                f.write("\n".join(lines))
            cv2.imwrite(os.path.join(root, split, "images", f"{i:04d}.jpg"), img)
    yaml_path = os.path.join(root, "dataset.yaml")
    with open(yaml_path, "w") as f:
        f.write(
            f"path: {root}\ntrain: train_split\nval: val_split\n"
            "names:\n    0: \"blob\"\n"
        )
    return yaml_path


class TestData:
    def test_dataset_yaml_and_loader(self, tmp_path):
        yml = make_synthetic_dataset(str(tmp_path), n_images=6, size=128)
        spec = T.load_dataset_yaml(yml)
        assert spec.nc == 1
        samples = T.list_samples(spec, "train")
        assert len(samples) == 6
        dl = T.DataLoader(samples, batch_size=2, imgsz=128, max_instances=4)
        batches = list(dl)
        assert len(batches) == 3
        b = batches[0]
        assert b.images.shape == (2, 128, 128, 3)
        assert b.boxes.shape == (2, 4, 4)
        assert b.masks.shape == (2, 4, 32, 32)
        assert b.inst_valid[:, 0].all()
        assert not b.inst_valid[:, 1].any()
        # mask is inside its box (proto res)
        m = b.masks[0, 0]
        ys, xs = np.where(m > 0)
        x1, y1, x2, y2 = b.boxes[0, 0] / 4.0
        assert xs.min() >= x1 - 1.5 and xs.max() <= x2 + 1.5
        assert ys.min() >= y1 - 1.5 and ys.max() <= y2 + 1.5

    def test_label_mirror_augment(self, tmp_path):
        yml = make_synthetic_dataset(str(tmp_path), n_images=4, size=128)
        spec = T.load_dataset_yaml(yml)
        samples = T.list_samples(spec, "train")
        img, boxes, cls, masks, valid = T.load_sample(*samples[0], 128, 4, flip_lr=True)
        img0, boxes0, *_ = T.load_sample(*samples[0], 128, 4, flip_lr=False)
        # flipped box mirrors around the canvas center
        np.testing.assert_allclose(boxes[0, 0], 128 - boxes0[0, 2], atol=1.0)


class TestFit:
    @pytest.mark.slow
    def test_overfits_tiny_dataset(self, tmp_path):
        yml = make_synthetic_dataset(str(tmp_path), n_images=8, size=160)
        cfg = T.TrainConfig(
            data=yml, epochs=6, imgsz=160, batch=4, lr0=0.002,
            warmup_epochs=1.0, patience=50, project=str(tmp_path / "runs"),
            name="smoke", workers=2, augment=False, max_instances=4,
        )
        tr = T.Trainer(cfg)
        state, history = tr.fit(log=lambda *a: None)
        first, last = history[0], history[-1]
        assert last["train/total"] < first["train/total"] * 0.8, (
            first["train/total"], last["train/total"])
        # artifacts: checkpoints + results.json (save/save_json parity)
        assert os.path.isdir(os.path.join(cfg.run_dir, "last"))
        assert os.path.isdir(os.path.join(cfg.run_dir, "best"))
        with open(os.path.join(cfg.run_dir, "results.json")) as f:
            assert len(json.load(f)) == len(history)

    @pytest.mark.slow
    def test_single_image_overfit_detects(self, tmp_path):
        """Optimization sanity for the full loss: overfitting one image must
        produce a confident, pixel-accurate detection (this is the test that
        caught the missing stop_gradient through the TAL targets)."""
        import optax

        from poseestimator_tpu.models.yolo.decode import decode_boxes
        from poseestimator_tpu.models.yolo.model import YOLO11Seg
        from poseestimator_tpu.models.yolo.nms import box_iou

        yml = make_synthetic_dataset(str(tmp_path), n_images=2, size=128)
        spec = T.load_dataset_yaml(yml)
        img, boxes, cls, masks, valid = T.load_sample(
            *T.list_samples(spec, "train")[0], 128, 4
        )
        B = {
            "images": jnp.asarray(img)[None], "boxes": jnp.asarray(boxes)[None],
            "cls": jnp.asarray(cls.astype(np.int32))[None],
            "masks": jnp.asarray(masks)[None], "valid": jnp.asarray(valid)[None],
        }
        model = YOLO11Seg(nc=1, scale="n")
        variables = model.init(jax.random.PRNGKey(0), B["images"], train=True)
        params, stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(6e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, stats, opt):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": stats}, B["images"], train=True,
                    mutable=["batch_stats"],
                )
                total, _ = T.segmentation_loss(
                    out, B["boxes"], B["cls"], B["masks"], B["valid"]
                )
                return total, mut["batch_stats"]

            (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            u, no = tx.update(g, opt, params)
            return optax.apply_updates(params, u), ns, no, l

        for _ in range(250):
            params, stats, opt, loss = step(params, stats, opt)

        out = model.apply({"params": params, "batch_stats": stats}, B["images"], train=False)
        bx, cl, _ = decode_boxes(out)
        scores = np.asarray(cl[0, :, 0])
        top = int(np.argmax(scores))
        assert scores[top] > 0.3, f"top score {scores[top]}"
        iou = float(box_iou(bx[0, top][None], jnp.asarray(boxes[0])[None])[0, 0])
        assert iou > 0.5, f"IoU {iou}"

    @pytest.mark.slow
    def test_resume(self, tmp_path):
        yml = make_synthetic_dataset(str(tmp_path), n_images=4, size=96)
        cfg = T.TrainConfig(
            data=yml, epochs=2, imgsz=96, batch=2, project=str(tmp_path / "runs"),
            name="resume", workers=1, augment=False, max_instances=4, patience=50,
        )
        tr = T.Trainer(cfg)
        tr.fit(log=lambda *a: None)
        cfg2 = T.TrainConfig(
            data=yml, epochs=4, imgsz=96, batch=2, project=str(tmp_path / "runs"),
            name="resume", workers=1, augment=False, max_instances=4,
            patience=50, resume=True,
        )
        tr2 = T.Trainer(cfg2)
        state, history = tr2.fit(log=lambda *a: None)
        assert history[0]["epoch"] == 2  # continued, not restarted
        # per-epoch mAP hook runs end-to-end on the EMA weights
        m = tr2.evaluate_map(state)
        assert 0.0 <= m["map50"] <= 1.0 and "map50_95" in m


class TestAugmentation:
    def test_scale_translate_labels_consistent(self, tmp_path):
        """Augmented boxes/masks stay mutually consistent and inside canvas."""
        yml = make_synthetic_dataset(str(tmp_path), n_images=2, size=160)
        spec = T.load_dataset_yaml(yml)
        samples = T.list_samples(spec, "train")
        rng = np.random.default_rng(7)
        for _ in range(5):
            img, boxes, cls, masks, valid = T.load_sample(
                *samples[0], 128, 4, False, rng=rng,
                scale_jitter=0.3, translate_jitter=0.1, hsv=True,
            )
            assert img.shape == (128, 128, 3)
            b = boxes[0]
            assert 0 <= b[0] <= b[2] <= 128 and 0 <= b[1] <= b[3] <= 128
            ys, xs = np.where(masks[0] > 0)
            assert len(xs) > 0
            # rasterized mask lives inside the (proto-res) box
            assert xs.min() >= b[0] / 4 - 1.5 and xs.max() <= b[2] / 4 + 1.5

    def test_hsv_changes_pixels_not_shape(self, tmp_path, rng):
        import cv2

        from poseestimator_tpu.training.data import augment_hsv

        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        out = augment_hsv(img, np.random.default_rng(1))
        assert out.shape == img.shape and out.dtype == img.dtype
        assert not np.array_equal(out, img)


class TestMosaic:
    def test_mosaic_labels_consistent(self, tmp_path):
        from poseestimator_tpu.training.data import load_mosaic

        yml = make_synthetic_dataset(str(tmp_path), n_images=6, size=128)
        spec = T.load_dataset_yaml(yml)
        samples = T.list_samples(spec, "train")
        rng = np.random.default_rng(0)
        img, boxes, cls, masks, valid = load_mosaic(samples, [0, 1, 2, 3], 128, 8, rng)
        assert img.shape == (128, 128, 3)
        assert valid.sum() == 4  # one instance per quadrant image
        for j in np.where(valid)[0]:
            b = boxes[j]
            assert 0 <= b[0] < b[2] <= 128 and 0 <= b[1] < b[3] <= 128
            ys, xs = np.where(masks[j] > 0)
            assert len(xs) > 0
            assert xs.min() >= b[0] / 4 - 1.5 and xs.max() <= b[2] / 4 + 1.5
        # the four boxes land in four different quadrants
        quads = {(int(b[0] // 64), int(b[1] // 64)) for b in boxes[valid]}
        assert len(quads) >= 3

    def test_loader_mixes_mosaic(self, tmp_path):
        yml = make_synthetic_dataset(str(tmp_path), n_images=8, size=96)
        spec = T.load_dataset_yaml(yml)
        dl = T.DataLoader(T.list_samples(spec, "train"), batch_size=4, imgsz=96,
                          max_instances=8, augment=True, mosaic=1.0)
        b = next(iter(dl))
        assert b.images.shape == (4, 96, 96, 3)
        assert b.inst_valid.sum() >= 8  # mosaics carry ~4 instances each
