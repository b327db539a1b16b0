"""Task-aligned label assignment (TAL) — the assignment law used by the YOLO
v8/11 training pipeline the reference drives through Ultralytics
(detection/train.py; SURVEY.md section 2.2 calls for TAL + BCE/CIoU/DFL/mask
losses on the TPU training path).

For each GT box: candidate anchors are those whose center lies inside the
box; the alignment metric is ``score^alpha * IoU^beta``; the top-k candidates
are kept; anchors claimed by several GTs go to the GT with the highest metric.
Target scores are normalized per-GT by ``metric * iou_max / metric_max``.
Fully vectorized over (batch x anchors x max_instances), fixed shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.yolo.nms import box_iou

# Candidate anchors kept per GT box (Ultralytics TAL default). Consumers that
# bound positive counts (e.g. loss.segmentation_loss's mask top-K) derive
# from this constant so a future change cannot silently desynchronize them.
TAL_TOPK = 10


@partial(jax.jit, static_argnames=("topk",))
def assign(
    cls_prob: jnp.ndarray,  # (A, nc) sigmoid class scores
    pred_boxes: jnp.ndarray,  # (A, 4) xyxy (letterbox px)
    anchors_px: jnp.ndarray,  # (A, 2) anchor centers in px
    gt_boxes: jnp.ndarray,  # (M, 4) xyxy px
    gt_classes: jnp.ndarray,  # (M,) int32
    gt_valid: jnp.ndarray,  # (M,) bool
    topk: int = TAL_TOPK,
    alpha: float = 0.5,
    beta: float = 6.0,
):
    """Returns per-anchor assignment:
    ``(fg_mask (A,), target_gt_idx (A,), target_scores (A, nc), target_boxes
    (A, 4))``.
    """
    A = cls_prob.shape[0]
    M = gt_boxes.shape[0]
    nc = cls_prob.shape[1]

    # anchor center inside GT box
    ax = anchors_px[:, 0][None, :]  # (1, A)
    ay = anchors_px[:, 1][None, :]
    inside = (
        (ax > gt_boxes[:, 0:1])
        & (ax < gt_boxes[:, 2:3])
        & (ay > gt_boxes[:, 1:2])
        & (ay < gt_boxes[:, 3:4])
    ) & gt_valid[:, None]  # (M, A)

    iou = box_iou(gt_boxes, pred_boxes)  # (M, A)
    # predicted prob of each GT's class at each anchor: (M, A)
    cls_for_gt = cls_prob[:, jnp.clip(gt_classes, 0, nc - 1)].T
    metric = (cls_for_gt**alpha) * (jnp.clip(iou, 0.0) ** beta)
    metric = jnp.where(inside, metric, 0.0)

    # top-k anchors per GT
    topk = min(topk, A)
    kth = jax.lax.top_k(metric, topk)[0][:, -1:]  # (M, 1) k-th best value
    is_topk = (metric >= jnp.maximum(kth, 1e-12)) & (metric > 0)

    # resolve anchors claimed by multiple GTs: highest metric wins
    claimed = jnp.where(is_topk, metric, -1.0)  # (M, A)
    best_gt = jnp.argmax(claimed, axis=0)  # (A,)
    fg = jnp.max(claimed, axis=0) > 0  # (A,)

    t_metric = jnp.where(fg, claimed[best_gt, jnp.arange(A)], 0.0)
    t_iou = jnp.where(fg, iou[best_gt, jnp.arange(A)], 0.0)

    # per-GT normalization: score = metric / max_metric * max_iou
    pos_metric = jnp.where(is_topk & (best_gt[None, :] == jnp.arange(M)[:, None]), metric, 0.0)
    max_metric = jnp.max(pos_metric, axis=1)  # (M,)
    max_iou = jnp.max(jnp.where(pos_metric > 0, iou, 0.0), axis=1)
    norm = max_iou[best_gt] / jnp.maximum(max_metric[best_gt], 1e-9)
    t_score = jnp.clip(t_metric * norm, 0.0, 1.0)

    target_scores = (
        jax.nn.one_hot(gt_classes[best_gt], nc) * t_score[:, None] * fg[:, None]
    )
    target_boxes = gt_boxes[best_gt] * fg[:, None]
    return fg, best_gt, target_scores, target_boxes
