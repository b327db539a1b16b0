"""YOLO11-seg tests: torch numerical parity of the building blocks (conv/BN/
SiLU conventions, depthwise, deconv), graph shapes, decode math, NMS behavior,
letterbox geometry, mask assembly, and weight-import round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseestimator_tpu.models import yolo as Y


def torch_conv_bn_silu(x_nhwc, kernel_hwio, bn_stats, stride=1, groups=1, act=True):
    """Reference computation with torch (CPU): returns NHWC numpy."""
    import torch
    import torch.nn.functional as F

    x = torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))
    w = torch.tensor(np.transpose(kernel_hwio, (3, 2, 0, 1)))
    k = kernel_hwio.shape[0]
    y = F.conv2d(x, w, stride=stride, padding=k // 2, groups=groups)
    scale, bias, mean, var = [torch.tensor(v) for v in bn_stats]
    y = F.batch_norm(y, mean, var, weight=scale, bias=bias, eps=1e-3)
    if act:
        y = F.silu(y)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


class TestBlockParity:
    @pytest.mark.parametrize("stride,k", [(1, 1), (1, 3), (2, 3)])
    def test_convbnact_matches_torch(self, rng, stride, k):
        cin, cout = 8, 16
        x = rng.normal(size=(2, 16, 16, cin)).astype(np.float32)
        kern = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1
        scale = rng.random(cout).astype(np.float32) + 0.5
        bias = rng.normal(size=cout).astype(np.float32)
        mean = rng.normal(size=cout).astype(np.float32) * 0.1
        var = rng.random(cout).astype(np.float32) + 0.5

        mod = Y.ConvBNAct(cout, k, stride)
        variables = {
            "params": {"conv": {"kernel": kern}, "bn": {"scale": scale, "bias": bias}},
            "batch_stats": {"bn": {"mean": mean, "var": var}},
        }
        ours = mod.apply(variables, jnp.asarray(x), train=False)
        ref = torch_conv_bn_silu(x, kern, (scale, bias, mean, var), stride)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_depthwise_matches_torch(self, rng):
        c = 8
        x = rng.normal(size=(1, 10, 10, c)).astype(np.float32)
        kern = rng.normal(size=(3, 3, 1, c)).astype(np.float32) * 0.2
        scale = np.ones(c, np.float32)
        bias = np.zeros(c, np.float32)
        mean = np.zeros(c, np.float32)
        var = np.ones(c, np.float32)
        mod = Y.ConvBNAct(c, 3, 1, groups=c)
        variables = {
            "params": {"conv": {"kernel": kern}, "bn": {"scale": scale, "bias": bias}},
            "batch_stats": {"bn": {"mean": mean, "var": var}},
        }
        ours = mod.apply(variables, jnp.asarray(x), train=False)
        ref = torch_conv_bn_silu(x, kern, (scale, bias, mean, var), groups=c)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_deconv_matches_torch(self, rng):
        """Proto upsample: flax ConvTranspose vs torch ConvTranspose2d(2,2)
        through the weight conversion used by the importer."""
        import torch

        cin, cout = 6, 6
        x = rng.normal(size=(1, 8, 8, cin)).astype(np.float32)
        tconv = torch.nn.ConvTranspose2d(cin, cout, 2, 2, 0, bias=True)
        with torch.no_grad():
            ref = tconv(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        ref = np.transpose(ref, (0, 2, 3, 1))

        from poseestimator_tpu.models.yolo.weights import _deconv_kernel
        import flax.linen as nn

        kernel = _deconv_kernel(tconv.weight.detach().numpy())
        bias = tconv.bias.detach().numpy()
        mod = nn.ConvTranspose(cout, (2, 2), strides=(2, 2))
        ours = mod.apply(
            {"params": {"kernel": jnp.asarray(kernel.copy()), "bias": jnp.asarray(bias)}},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_maxpool_sppf_shapes(self, rng):
        x = rng.normal(size=(1, 8, 8, 32)).astype(np.float32)
        mod = Y.SPPF(32)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = mod.apply(v, jnp.asarray(x))
        assert y.shape == (1, 8, 8, 32)


class TestModelGraph:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = Y.YOLO11Seg(nc=5, scale="n")
        x = jnp.zeros((1, 320, 320, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return model, variables

    def test_output_shapes(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.zeros((1, 320, 320, 3))
        out = model.apply(variables, x, train=False)
        assert [b.shape for b in out["box"]] == [
            (1, 40, 40, 64), (1, 20, 20, 64), (1, 10, 10, 64)]
        assert [c.shape for c in out["cls"]] == [
            (1, 40, 40, 5), (1, 20, 20, 5), (1, 10, 10, 5)]
        assert [m.shape for m in out["mc"]] == [
            (1, 40, 40, 32), (1, 20, 20, 32), (1, 10, 10, 32)]
        assert out["proto"].shape == (1, 80, 80, 32)

    def test_param_count_plausible(self, model_and_vars):
        # yolo11n-seg is ~2.9M params; ours should land in the same ballpark
        _, variables = model_and_vars
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        assert 2.0e6 < n < 4.0e6, f"param count {n}"

    def test_param_count_matches_published(self):
        # strong graph-fidelity check: published YOLO11-seg sizes at nc=80
        for scale, published in [("n", 2.9e6), ("s", 10.1e6)]:
            m = Y.YOLO11Seg(nc=80, scale=scale)
            v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
            n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
            assert abs(n - published) / published < 0.02, (scale, n)

    def test_decode_shapes(self, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((1, 320, 320, 3)), train=False)
        boxes, cls, mc = Y.decode_boxes(out)
        A = 40 * 40 + 20 * 20 + 10 * 10
        assert boxes.shape == (1, A, 4)
        assert cls.shape == (1, A, 5)
        assert mc.shape == (1, A, 32)
        assert bool(jnp.all((cls >= 0) & (cls <= 1)))


class TestDecodeMath:
    def test_dfl_peaked(self):
        logits = np.full((1, 64), -20.0, np.float32)
        # peak each of the 4 distributions at bin 7
        for d in range(4):
            logits[0, d * 16 + 7] = 20.0
        out = Y.dfl_expectation(jnp.asarray(logits.reshape(1, 4 * 16)))
        np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-4)

    def test_dist2bbox_roundtrip(self, rng):
        anchors = jnp.asarray(rng.uniform(2, 30, size=(50, 2)).astype(np.float32))
        dist = jnp.asarray(rng.uniform(0, 5, size=(50, 4)).astype(np.float32))
        boxes = Y.dist2bbox(dist, anchors)
        back = Y.bbox2dist(boxes, anchors)
        np.testing.assert_allclose(np.asarray(back), np.asarray(dist), atol=1e-5)

    def test_make_anchors(self):
        anchors, strides = Y.make_anchors([(2, 3), (1, 1)], [8, 16])
        assert anchors.shape == (7, 2)
        np.testing.assert_allclose(np.asarray(anchors[0]), [0.5, 0.5])
        np.testing.assert_allclose(np.asarray(anchors[2]), [2.5, 0.5])
        np.testing.assert_allclose(np.asarray(strides), [8, 8, 8, 8, 8, 8, 16])


class TestNMS:
    def test_suppression_same_class(self):
        boxes = jnp.asarray(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
        )
        cls = jnp.asarray([[0.9, 0.0], [0.8, 0.0], [0.0, 0.7]], jnp.float32)
        coeffs = jnp.zeros((3, 32))
        det = Y.nms(boxes, cls, coeffs, conf_thres=0.25, iou_thres=0.5, pre_nms=8, max_det=4)
        assert int(det.count()) == 2
        np.testing.assert_allclose(np.asarray(det.scores[:2]), [0.9, 0.7], atol=1e-6)
        assert list(np.asarray(det.classes[:2])) == [0, 1]

    def test_no_cross_class_suppression(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
        cls = jnp.asarray([[0.9, 0.0], [0.0, 0.8]], jnp.float32)
        det = Y.nms(boxes, cls, jnp.zeros((2, 32)), conf_thres=0.25, iou_thres=0.5,
                    pre_nms=4, max_det=4)
        assert int(det.count()) == 2

    def test_class_agnostic(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
        cls = jnp.asarray([[0.9, 0.0], [0.0, 0.8]], jnp.float32)
        det = Y.nms(boxes, cls, jnp.zeros((2, 32)), conf_thres=0.25, iou_thres=0.5,
                    pre_nms=4, max_det=4, class_agnostic=True)
        assert int(det.count()) == 1

    def test_conf_gate(self):
        boxes = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        cls = jnp.asarray([[0.2]], jnp.float32)
        det = Y.nms(boxes, cls, jnp.zeros((1, 32)), conf_thres=0.7, pre_nms=4, max_det=4)
        assert int(det.count()) == 0

    def test_fixpoint_matches_sequential_greedy(self, rng):
        """The parallel-fixpoint suppression must decide EXACTLY like the
        sequential greedy algorithm (torchvision semantics) on dense random
        crowds — deep suppression chains included."""
        from poseestimator_tpu.models.yolo.nms import box_iou

        for trial in range(8):
            n = 256
            # clustered centers force overlapping chains
            centers = rng.random((n, 2)).astype(np.float32) * 60.0
            wh = 8.0 + rng.random((n, 2)).astype(np.float32) * 20.0
            boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1)
            scores = rng.random((n, 1)).astype(np.float32) * 0.75 + 0.25
            det = Y.nms(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros((n, 32)),
                conf_thres=0.25, iou_thres=0.5, pre_nms=n, max_det=n,
            )
            # sequential greedy reference in numpy
            order = np.argsort(-scores[:, 0], kind="stable")
            iou = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
            kept = []
            for j in order:
                if all(iou[i, j] <= 0.5 for i in kept):
                    kept.append(j)
            ref_scores = np.sort(scores[kept, 0])[::-1]
            got = np.sort(np.asarray(det.scores[det.valid]))[::-1]
            np.testing.assert_allclose(got, ref_scores, atol=1e-6,
                                       err_msg=f"trial {trial}")

    def test_iou_values(self):
        a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        b = jnp.asarray([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]], jnp.float32)
        iou = np.asarray(Y.box_iou(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 1 / 3, 0.0], atol=1e-6)


class TestLetterbox:
    def test_geometry(self):
        img = np.zeros((480, 640, 3), np.uint8)
        img[:, :, 0] = 200
        out, meta = Y.letterbox(jnp.asarray(img), 640)
        assert out.shape == (640, 640, 3)
        assert float(meta.scale) == 1.0
        assert float(meta.pad_y) == 80.0 and float(meta.pad_x) == 0.0
        o = np.asarray(out)
        np.testing.assert_allclose(o[0, 0], 114 / 255.0, atol=1e-6)  # pad row
        np.testing.assert_allclose(o[320, 320, 0], 200 / 255.0, atol=1e-2)

    def test_boxes_roundtrip(self):
        img = np.zeros((480, 640, 3), np.uint8)
        _, meta = Y.letterbox(jnp.asarray(img), 640)
        lb_boxes = jnp.asarray([[100.0, 180.0, 300.0, 380.0]])
        orig = np.asarray(Y.boxes_to_original(lb_boxes, meta))[0]
        np.testing.assert_allclose(orig, [100, 100, 300, 300], atol=1e-4)


class TestMasks:
    def test_assemble_and_polygonize(self):
        # proto channel 0 active in the left half of the canvas
        proto = np.zeros((160, 160, 32), np.float32)
        proto[:, :80, 0] = 4.0
        proto[:, 80:, 0] = -4.0
        coeffs = np.zeros((2, 32), np.float32)
        coeffs[0, 0] = 1.0
        img = np.zeros((480, 640, 3), np.uint8)
        _, meta = Y.letterbox(jnp.asarray(img), 640)
        boxes = jnp.asarray([[0.0, 80.0, 320.0, 560.0], [0, 0, 640, 640]])
        masks = Y.assemble_masks(
            jnp.asarray(proto), jnp.asarray(coeffs), boxes,
            jnp.asarray([True, True]), meta, 480, 640,
        )
        m0 = np.asarray(masks[0])
        assert m0[240, 100]  # inside left half + box
        assert not m0[240, 500]  # right half: proto negative
        assert not np.asarray(masks[1]).any()  # zero coeffs -> sigmoid 0.5, not > thr

        polys = Y.masks_to_polygons(m0)
        assert len(polys) >= 1
        back = Y.polygon_to_mask(polys[0], 480, 640)
        inter = ((back > 0) & m0).sum()
        union = ((back > 0) | m0).sum()
        assert inter / union > 0.95

    def test_matmul_resize_matches_gather_form(self):
        # assemble_masks upsamples proto-res masks with a separable matmul
        # (MXU) formulation; it must match the direct gather-form bilinear
        # sample everywhere except pixels numerically AT the 0.5 threshold
        rng = np.random.default_rng(3)
        Hp = Wp = 160
        proto = rng.normal(size=(Hp, Wp, 32)).astype(np.float32)
        coeffs = rng.normal(size=(8, 32)).astype(np.float32)
        img = np.zeros((480, 640, 3), np.uint8)
        _, meta = Y.letterbox(jnp.asarray(img), 640)
        b = rng.uniform(0, 640, (8, 4)).astype(np.float32)
        boxes = np.concatenate(
            [np.minimum(b[:, :2], b[:, 2:]), np.maximum(b[:, :2], b[:, 2:])], 1
        )
        valid = np.ones(8, bool)
        masks = np.asarray(Y.assemble_masks(
            jnp.asarray(proto), jnp.asarray(coeffs), jnp.asarray(boxes),
            jnp.asarray(valid), meta, 480, 640,
        ))

        # reference: float64 gather-form bilinear + crop
        m = np.asarray(jax.nn.sigmoid(
            jnp.einsum("dn,hwn->dhw", coeffs, proto)), np.float64)
        scale, pad_y, pad_x = (
            float(meta.scale), float(meta.pad_y), float(meta.pad_x))
        py = ((np.arange(480) + 0.5) * scale + pad_y) / 4.0
        px = ((np.arange(640) + 0.5) * scale + pad_x) / 4.0
        y0 = np.clip(np.floor(py - 0.5).astype(int), 0, Hp - 1)
        x0 = np.clip(np.floor(px - 0.5).astype(int), 0, Wp - 1)
        y1 = np.clip(y0 + 1, 0, Hp - 1)
        x1 = np.clip(x0 + 1, 0, Wp - 1)
        wy = np.clip(py - 0.5 - y0, 0, 1)
        wx = np.clip(px - 0.5 - x0, 0, 1)
        up = (m[:, y0][:, :, x0] * (1 - wy)[:, None] * (1 - wx)[None, :]
              + m[:, y0][:, :, x1] * (1 - wy)[:, None] * wx[None, :]
              + m[:, y1][:, :, x0] * wy[:, None] * (1 - wx)[None, :]
              + m[:, y1][:, :, x1] * wy[:, None] * wx[None, :])
        bx = (boxes - np.array([pad_x, pad_y] * 2)) / scale
        gx = np.arange(640)[None, None, :]
        gy = np.arange(480)[None, :, None]
        inside = ((gx >= bx[:, 0, None, None]) & (gx <= bx[:, 2, None, None])
                  & (gy >= bx[:, 1, None, None]) & (gy <= bx[:, 3, None, None]))
        ref = (up > 0.5) & inside & valid[:, None, None]
        near_thr = int((np.abs(up - 0.5) < 1e-5).sum())
        assert int((masks != ref).sum()) <= near_thr


class TestWeightImport:
    def test_roundtrip(self):
        model = Y.YOLO11Seg(nc=5, scale="n")
        variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False)
        sd = Y.variables_to_state_dict(variables)
        assert any(k.startswith("model.0.conv") for k in sd)
        assert "model.23.proto.upsample.weight" in sd
        assert any(k.startswith("model.23.cv3.0.0.0.conv") for k in sd)
        back = Y.state_dict_to_variables(sd)

        flat_a = dict(jax.tree_util.tree_flatten_with_path(variables["params"])[0])
        flat_b = dict(jax.tree_util.tree_flatten_with_path(back["params"])[0])
        assert set(map(str, flat_a.keys())) == set(map(str, flat_b.keys()))
        for k in flat_a:
            np.testing.assert_allclose(
                np.asarray(flat_a[k]), np.asarray(flat_b[k]), atol=1e-6, err_msg=str(k)
            )
        flat_sa = dict(jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0])
        flat_sb = dict(jax.tree_util.tree_flatten_with_path(back["batch_stats"])[0])
        assert set(map(str, flat_sa.keys())) == set(map(str, flat_sb.keys()))

    def test_forward_after_roundtrip(self):
        model = Y.YOLO11Seg(nc=5, scale="n")
        x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(2), x, train=False)
        back = Y.state_dict_to_variables(Y.variables_to_state_dict(variables))
        y1 = model.apply(variables, x, train=False)
        y2 = model.apply(back, x, train=False)
        np.testing.assert_allclose(
            np.asarray(y1["proto"]), np.asarray(y2["proto"]), atol=1e-6
        )
        for a, b in zip(y1["cls"], y2["cls"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_torch_tensor_state_dict(self):
        import torch

        model = Y.YOLO11Seg(nc=2, scale="n")
        variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)), train=False)
        sd = {k: torch.tensor(v) for k, v in Y.variables_to_state_dict(variables).items()}
        back = Y.state_dict_to_variables(sd)
        assert "m0" in back["params"]
