"""Data-parallel batched detection serving over a device mesh.

The batch-inference scaling axis: a serving host shards the image batch
over a 1-D ``dp`` mesh (the same jax.sharding machinery as the trainer,
training/trainer.py:106-115) and runs the full jitted detect program —
letterbox -> YOLO11-seg -> decode -> per-image NMS — with parameters
replicated. XLA/GSPMD partitions the batched convolutions along the batch
axis, so per-chip work is batch/n_devices with zero cross-chip collectives
in the forward (the all-gather of results happens once at the output
boundary). The reference has no batch serving path at all (predict.py is
single-image, SURVEY section 2.1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import yolo as Y


class ShardedDetector:
    """Batched detector with the batch axis sharded over ``mesh``.

    Wraps the same model/variables as ``pipeline.Detector``; use
    ``from_detector`` to lift an existing single-chip detector onto a mesh.
    Batch size must be divisible by the mesh axis size.
    """

    def __init__(self, model, variables, mesh: Mesh, imgsz: int = 640,
                 max_det: int = 32, pre_nms: int = 1024, axis: str = "dp"):
        self.model = model
        self.mesh = mesh
        self.imgsz = imgsz
        self.max_det = max_det
        self.pre_nms = pre_nms
        self.axis = axis
        self.batch_sharding = NamedSharding(mesh, P(axis))
        self.repl_sharding = NamedSharding(mesh, P())
        self.variables = jax.device_put(variables, self.repl_sharding)
        self._predict = self._build()

    @classmethod
    def from_detector(cls, detector, mesh: Mesh, axis: str = "dp"):
        return cls(detector.model, detector.variables, mesh,
                   imgsz=detector.imgsz, max_det=detector.max_det,
                   pre_nms=detector.pre_nms, axis=axis)

    def _build(self):
        model, imgsz = self.model, self.imgsz
        max_det, pre_nms = self.max_det, self.pre_nms

        @partial(jax.jit, static_argnames=())
        def predict(variables, imgs, conf, iou):
            lbs, metas = jax.vmap(lambda im: Y.letterbox(im, imgsz))(imgs)
            raw = model.apply(variables, lbs, train=False)
            boxes, cls, mc = Y.decode_boxes(raw)
            dets = jax.vmap(
                lambda b, c, m: Y.nms(b, c, m, conf_thres=conf, iou_thres=iou,
                                      pre_nms=pre_nms, max_det=max_det)
            )(boxes, cls, mc)
            boxes_orig = jax.vmap(Y.boxes_to_original)(dets.boxes, metas)
            return dets, boxes_orig

        return predict

    def __call__(self, imgs, conf: float = 0.25, iou: float = 0.7):
        """imgs (B, H, W, 3), B divisible by the mesh axis size. Returns
        (Detections stacked over B, boxes in original coordinates)."""
        imgs = jnp.asarray(imgs)
        if imgs.shape[0] % self.mesh.devices.size:
            raise ValueError(
                f"batch {imgs.shape[0]} not divisible by mesh size "
                f"{self.mesh.devices.size}"
            )
        imgs = jax.device_put(imgs, self.batch_sharding)
        return self._predict(
            self.variables, imgs, jnp.float32(conf), jnp.float32(iou)
        )
