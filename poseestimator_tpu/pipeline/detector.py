"""Drop-in Detector: YOLO11-seg inference with the reference's surface.

Parity with reference EstimHelpers/Detector.py (class) and
EstimHelpers/detection_utils.py (stateless twin): ``detect_mask`` returns
``[{"mask": HxW uint8 {0,255}, "class_id": int}, ...]`` /a single mask.
The whole predict path (letterbox -> YOLO11 -> decode -> NMS -> proto masks)
is ONE jitted device program with fixed shapes; only polygon extraction for
the ``masks.xy``-style API stays host-side (as it is upstream).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models import yolo as Y


class Detector:
    """YOLO11-seg detector.

    Args:
        yolo_weights: path to a trained checkpoint (Ultralytics ``.pt`` /
            raw state_dict / orbax dir saved by our trainer), OR a ready
            ``{"params", "batch_stats"}`` variables dict.
        nc: number of classes (must match the checkpoint).
        scale: YOLO11 compound scale.
        imgsz: square letterbox size (static; one compile per size).
    """

    def __init__(
        self,
        yolo_weights,
        nc: int = 5,
        scale: str = "n",
        imgsz: int = 640,
        max_det: int = 32,
        dtype: str = "float32",
        pre_nms: int = 1024,
    ):
        import jax.numpy as jnp_

        self.model = Y.YOLO11Seg(nc=nc, scale=scale, dtype=getattr(jnp_, dtype))
        self.imgsz = imgsz
        self.max_det = max_det
        # pre-NMS candidate pool. 1024 is plenty at product confidence
        # (0.25+); mAP-style sweeps at conf~0.001 need a larger pool or the
        # cap silently truncates low-score detections (Ultralytics uses 30k)
        self.pre_nms = pre_nms
        if isinstance(yolo_weights, dict) and "params" in yolo_weights:
            self.variables = yolo_weights
        else:
            self.variables = _load_variables(yolo_weights)
        self._predict = self._build_predict()

    def _build_predict(self):
        model = self.model
        imgsz = self.imgsz
        max_det = self.max_det
        pre_nms = self.pre_nms

        @partial(jax.jit, static_argnames=("orig_h", "orig_w"))
        def predict(variables, img, conf, iou, orig_h: int, orig_w: int):
            lb, meta = Y.letterbox(img, imgsz)
            raw = model.apply(variables, lb[None], train=False)
            boxes, cls, mc = Y.decode_boxes(raw)
            det = Y.nms(
                boxes[0], cls[0], mc[0], conf_thres=conf, iou_thres=iou,
                pre_nms=pre_nms, max_det=max_det,
            )
            masks = Y.assemble_masks(
                raw["proto"][0], det.coeffs, det.boxes, det.valid, meta, orig_h, orig_w
            )
            boxes_orig = Y.boxes_to_original(det.boxes, meta)
            return det, masks, boxes_orig

        return predict

    def __call__(self, img, conf: float = 0.25, iou: float = 0.7,
                 with_masks: bool = True):
        """Raw structured result: (Detections, masks (D, H, W) bool,
        boxes_orig (D, 4)).

        ``with_masks=False`` runs a mask-free program (masks is None) —
        box-only consumers (mAP sweeps at max_det=300) otherwise pay a
        (D, H, W) full-res mask assembly per image just to discard it."""
        img = jnp.asarray(img)
        h, w = img.shape[:2]
        if not with_masks:
            if not hasattr(self, "_predict_nomask"):
                model, imgsz, max_det = self.model, self.imgsz, self.max_det
                pre_nms = self.pre_nms

                @partial(jax.jit, static_argnames=("orig_h", "orig_w"))
                def predict_nomask(variables, img, conf, iou, orig_h: int, orig_w: int):
                    lb, meta = Y.letterbox(img, imgsz)
                    raw = model.apply(variables, lb[None], train=False)
                    boxes, cls, mc = Y.decode_boxes(raw)
                    det = Y.nms(
                        boxes[0], cls[0], mc[0], conf_thres=conf, iou_thres=iou,
                        pre_nms=pre_nms, max_det=max_det,
                    )
                    return det, Y.boxes_to_original(det.boxes, meta)

                self._predict_nomask = predict_nomask
            det, boxes_orig = self._predict_nomask(
                self.variables, img, jnp.float32(conf), jnp.float32(iou), h, w
            )
            return det, None, boxes_orig
        return self._predict(self.variables, img, jnp.float32(conf), jnp.float32(iou), h, w)

    def predict_batch(self, imgs, conf: float = 0.25, iou: float = 0.7):
        """Batched inference: imgs (B, H, W, 3) same-size batch -> per-image
        (Detections, boxes_orig) stacked along axis 0 (masks omitted — use
        __call__ per image when masks are needed). One compile per (B, H, W).
        """
        imgs = jnp.asarray(imgs)
        B, h, w = imgs.shape[:3]
        if not hasattr(self, "_predict_batch"):
            model, imgsz, max_det = self.model, self.imgsz, self.max_det
            pre_nms = self.pre_nms

            @partial(jax.jit, static_argnames=("orig_h", "orig_w"))
            def predict_batch(variables, imgs, conf, iou, orig_h: int, orig_w: int):
                lbs, metas = jax.vmap(lambda im: Y.letterbox(im, imgsz))(imgs)
                raw = model.apply(variables, lbs, train=False)
                boxes, cls, mc = Y.decode_boxes(raw)
                dets = jax.vmap(
                    lambda b, c, m: Y.nms(b, c, m, conf_thres=conf, iou_thres=iou,
                                          pre_nms=pre_nms, max_det=max_det)
                )(boxes, cls, mc)
                boxes_orig = jax.vmap(Y.boxes_to_original)(dets.boxes, metas)
                return dets, boxes_orig

            self._predict_batch = predict_batch
        return self._predict_batch(
            self.variables, imgs, jnp.float32(conf), jnp.float32(iou), h, w
        )

    def detect_mask(self, img_bgr, class_id: int = 0, conf: float = 0.7):
        """Reference Detector.detect_mask parity (Detector.py:9-60): list of
        ``{"mask", "class_id", "conf", "bbox"}`` dicts for ALL detections
        (the reference appends every detection regardless of class_id).

        Masks are produced via the polygon round-trip (device mask ->
        contours -> fillPoly) so the uint8 masks are bit-shaped like the
        reference's cv2.fillPoly output.
        """
        img = np.asarray(img_bgr)
        h, w = img.shape[:2]
        det, masks, boxes_orig = self(img, conf=conf)
        n = int(det.count())
        masks_np = np.asarray(masks[:n])
        classes = np.asarray(det.classes[:n])
        confs = np.asarray(det.scores[:n])
        boxes = np.asarray(boxes_orig[:n])

        detections = []
        for i in range(n):
            polys = Y.masks_to_polygons(masks_np[i])
            mask = (
                Y.polygon_to_mask(polys[0], h, w)
                if polys
                else np.zeros((h, w), np.uint8)
            )
            detections.append(
                {
                    "mask": mask,
                    "class_id": int(classes[i]),
                    "conf": float(confs[i]),
                    "bbox": boxes[i].tolist(),
                }
            )
        return detections


def detect_mask(weights_path, image, class_id: int = 0, nc: int = 5, scale: str = "n"):
    """Stateless single-mask variant (reference detection_utils.py:7-46
    parity): loads the model per call, imgsz=640, conf=0.7; returns the
    H x W uint8 mask of the FIRST detection matching ``class_id`` (all-zero
    if none)."""
    import cv2

    if isinstance(image, (str,)) or hasattr(image, "__fspath__"):
        img = cv2.imread(str(image))
        if img is None:
            raise FileNotFoundError(f"Image not found at {image}")
    elif isinstance(image, np.ndarray):
        img = image
    else:
        raise TypeError("Input must be a path or an image")
    h, w = img.shape[:2]
    det = Detector(weights_path, nc=nc, scale=scale)
    results = det.detect_mask(img, class_id=class_id, conf=0.7)
    for r in results:
        if r["class_id"] == class_id:
            return r["mask"]
    return np.zeros((h, w), np.uint8)


def _load_variables(source):
    """Resolve a weights source to flax variables: orbax dir, .pt, .npz."""
    import os

    if isinstance(source, (str, os.PathLike)):
        path = str(source)
        if os.path.isdir(path):
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            payload = ckptr.restore(os.path.abspath(path))
            # trainer checkpoints carry extras (epoch); keep model collections
            return {k: payload[k] for k in ("params", "batch_stats") if k in payload}
        if path.endswith(".npz"):
            data = np.load(path, allow_pickle=True)
            return data["variables"].item()
        return Y.load_checkpoint(path)
    return Y.load_checkpoint(source)
