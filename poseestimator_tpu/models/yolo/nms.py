"""On-device non-maximum suppression with fixed output shapes.

Replaces torchvision's CUDA NMS inside the Ultralytics predict path. Strategy:
confidence-gate, take the top ``pre_nms`` candidates by score (lax.top_k),
then greedy suppression over that fixed-size set as a PARALLEL FIXPOINT on
the (pre_nms, pre_nms) IoU matrix: iterate ``keep[j] = ok[j] & no kept
higher-ranked box overlaps j`` on the whole vector until it stops changing.
The suppression dependency is strictly lower-triangular in rank order, so the
fixpoint is unique and equals the sequential greedy result; convergence takes
one iteration per level of the deepest suppression CHAIN (a handful in
practice) instead of one sequential ``fori_loop`` trip per candidate — a
~100x cut in loop-carried latency for pre_nms=1024 on TPU, where each trip
of a scalar loop costs far more than a full (N, N) VPU reduce.
No data-dependent shapes, so the tracking loop never recompiles.
Class-aware by the standard coordinate-offset trick.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Detections:
    """Fixed-capacity detections for one image (rows beyond ``n`` invalid)."""

    boxes: jnp.ndarray  # (max_det, 4) xyxy pixels
    scores: jnp.ndarray  # (max_det,)
    classes: jnp.ndarray  # (max_det,) int32
    coeffs: jnp.ndarray  # (max_det, nm) mask coefficients
    valid: jnp.ndarray  # (max_det,) bool

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes, (N, 4) x (M, 4) -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


@partial(jax.jit, static_argnames=("pre_nms", "max_det", "class_agnostic"))
def nms(
    boxes: jnp.ndarray,
    cls_prob: jnp.ndarray,
    coeffs: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    pre_nms: int = 1024,
    max_det: int = 300,
    class_agnostic: bool = False,
) -> Detections:
    """Single-image NMS. boxes (A, 4), cls_prob (A, nc), coeffs (A, nm).

    Per-anchor class = argmax (Ultralytics multi_label=False default).
    """
    nc = cls_prob.shape[-1]
    pre_nms = min(pre_nms, boxes.shape[0])
    max_det = min(max_det, pre_nms)
    scores_all = jnp.max(cls_prob, axis=-1)
    classes_all = jnp.argmax(cls_prob, axis=-1).astype(jnp.int32)
    gate = scores_all >= conf_thres

    cand_scores, order = jax.lax.top_k(jnp.where(gate, scores_all, -1.0), pre_nms)
    cand_boxes = boxes[order]
    cand_classes = classes_all[order]
    cand_coeffs = coeffs[order]
    cand_ok = cand_scores > 0.0

    if class_agnostic:
        off_boxes = cand_boxes
    else:
        # separate classes in coordinate space so cross-class IoU is 0
        span = jnp.max(jnp.abs(cand_boxes)) + 1.0
        off_boxes = cand_boxes + (cand_classes.astype(jnp.float32) * span)[:, None]

    iou = box_iou(off_boxes, off_boxes)
    ranks = jnp.arange(pre_nms)
    # sup[i, j]: higher-ranked candidate i overlaps j enough to suppress it
    sup = (iou > iou_thres) & (ranks[:, None] < ranks[None, :])

    # Parallel fixpoint of the greedy recurrence
    #   keep[j] = ok[j] & ~any_i(sup[i, j] & keep[i]).
    # sup is strictly lower-triangular in rank, so the fixpoint is unique and
    # equals sequential greedy NMS; each iteration stabilizes one more level
    # of the deepest suppression chain (see module docstring).
    def cond(state):
        _, changed, it = state
        return changed & (it < pre_nms)

    def body(state):
        keep, _, it = state
        new = cand_ok & ~jnp.any(sup & keep[:, None], axis=0)
        return new, jnp.any(new != keep), it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (cand_ok, jnp.bool_(True), jnp.int32(0)))

    # compact survivors into max_det slots, best-score first (already sorted)
    surv_scores = jnp.where(keep, cand_scores, -1.0)
    top_scores, sel = jax.lax.top_k(surv_scores, max_det)
    valid = top_scores > 0.0
    return Detections(
        boxes=cand_boxes[sel],
        scores=jnp.where(valid, top_scores, 0.0),
        classes=jnp.where(valid, cand_classes[sel], -1),
        coeffs=cand_coeffs[sel],
        valid=valid,
    )
