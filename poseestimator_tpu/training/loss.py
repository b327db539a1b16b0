"""YOLO11-seg training losses: BCE classification, CIoU + DFL box regression,
and prototype-mask BCE — the loss law of the v8/11 segmentation trainer the
reference invokes through Ultralytics (SURVEY.md section 2.2 replacement plan:
"TAL label assignment, BCE+CIoU+DFL+mask losses").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.yolo.decode import (
    bbox2dist,
    decode_boxes,
    dfl_expectation,
    dist2bbox,
    flatten_levels,
    make_anchors,
)
from .assigner import TAL_TOPK, assign


def ciou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU between aligned box pairs (..., 4) xyxy."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    w1 = jnp.clip(box1[..., 2] - box1[..., 0], 0)
    h1 = jnp.clip(box1[..., 3] - box1[..., 1], 0)
    w2 = jnp.clip(box2[..., 2] - box2[..., 0], 0)
    h2 = jnp.clip(box2[..., 3] - box2[..., 1], 0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(box1[..., 2], box2[..., 2]) - jnp.minimum(box1[..., 0], box2[..., 0])
    ch = jnp.maximum(box1[..., 3], box2[..., 3]) - jnp.minimum(box1[..., 1], box2[..., 1])
    c2 = cw * cw + ch * ch + eps
    rho2 = (
        ((box1[..., 0] + box1[..., 2]) - (box2[..., 0] + box2[..., 2])) ** 2
        + ((box1[..., 1] + box1[..., 3]) - (box2[..., 1] + box2[..., 3])) ** 2
    ) / 4.0
    v = (4 / jnp.pi**2) * (
        jnp.arctan(w2 / jnp.maximum(h2, eps)) - jnp.arctan(w1 / jnp.maximum(h1, eps))
    ) ** 2
    a = v / jnp.maximum(1.0 + eps - iou + v, eps)
    a = jax.lax.stop_gradient(a)
    return iou - rho2 / c2 - a * v


def _dfl_loss(box_logits: jnp.ndarray, target_dist: jnp.ndarray, reg_max: int = 16):
    """Distribution focal loss: CE against the two bins bracketing the target.

    box_logits (..., 4*reg_max), target_dist (..., 4) in [0, reg_max-1].
    """
    logits = box_logits.reshape(*box_logits.shape[:-1], 4, reg_max)
    tl = jnp.floor(target_dist).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - target_dist
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, jnp.clip(tr, 0, reg_max - 1)[..., None], axis=-1)[..., 0]
    return -(ll * wl + lr * wr).mean(axis=-1)  # mean over the 4 sides


def bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@partial(jax.jit, static_argnames=("reg_max",))
def segmentation_loss(
    raw: dict,
    gt_boxes: jnp.ndarray,  # (B, M, 4) xyxy letterbox px
    gt_classes: jnp.ndarray,  # (B, M)
    gt_masks: jnp.ndarray,  # (B, M, S/4, S/4)
    gt_valid: jnp.ndarray,  # (B, M)
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    reg_max: int = 16,
):
    """Total loss + component dict for one batch of raw head outputs."""
    strides = (8, 16, 32)
    shapes = [x.shape[1:3] for x in raw["box"]]
    anchors, stride_pa = make_anchors(shapes, strides)
    anchors_px = anchors * stride_pa[:, None]

    box_flat = flatten_levels(raw["box"])  # (B, A, 64) logits
    cls_flat = flatten_levels(raw["cls"])  # (B, A, nc) logits
    mc_flat = flatten_levels(raw["mc"])  # (B, A, nm)
    proto = raw["proto"]  # (B, Hp, Wp, nm)

    dist = dfl_expectation(box_flat, reg_max)  # (B, A, 4) feature units
    pred_boxes_px = dist2bbox(dist, anchors[None]) * stride_pa[None, :, None]
    cls_prob = jax.nn.sigmoid(cls_flat)

    fg, gt_idx, t_scores, t_boxes = jax.vmap(
        lambda cp, pb, gb, gc, gv: assign(cp, pb, anchors_px, gb, gc, gv)
    )(cls_prob, pred_boxes_px, gt_boxes, gt_classes, gt_valid)
    # The task-aligned targets are FUNCTIONS OF THE PREDICTIONS; they must be
    # constants w.r.t. the gradient (torch side runs the assigner under
    # no_grad) — otherwise the model minimizes the loss by shrinking its own
    # targets and never learns to score.
    fg = jax.lax.stop_gradient(fg)
    t_scores = jax.lax.stop_gradient(t_scores)
    t_boxes = jax.lax.stop_gradient(t_boxes)

    n_pos = jnp.maximum(jnp.sum(t_scores), 1.0)

    # classification
    l_cls = jnp.sum(bce(cls_flat, t_scores)) / n_pos

    # box: CIoU weighted by target score sum per anchor
    w = jnp.sum(t_scores, axis=-1)  # (B, A)
    iou_term = 1.0 - ciou(pred_boxes_px, t_boxes)
    l_box = jnp.sum(iou_term * w * fg) / n_pos

    # dfl: distances in feature units against the (per-anchor-stride) target
    t_dist = bbox2dist(t_boxes / stride_pa[None, :, None], anchors[None], reg_max)
    l_dfl = jnp.sum(_dfl_loss(box_flat, t_dist, reg_max) * w * fg) / n_pos

    # masks: BCE(proto . coeffs, gt_mask) inside the GT box, area-normalized.
    # Only foreground anchors carry mask supervision; evaluating all A
    # anchors would allocate (B, A, Hp, Wp) (~22 GB at 640/batch16), so each
    # image gathers its top-K weighted anchors first. K is the positive-count
    # bound — max_instances x the assigner's TAL top-k — so crowded images
    # cannot silently drop mask supervision even if TAL_TOPK changes.
    k_mask = min(gt_boxes.shape[1] * TAL_TOPK, w.shape[1])

    def mask_loss_img(mcoef, prt, gt_idx_i, fg_i, w_i, gm, gb):
        sel_w, sel = jax.lax.top_k(w_i * fg_i, k_mask)  # (K,)
        m_logits = jnp.einsum("kn,hwn->khw", mcoef[sel], prt)  # (K, Hp, Wp)
        tgt = gm[gt_idx_i[sel]]  # (K, Hp, Wp)
        bb = gb[gt_idx_i[sel]] / 4.0  # boxes at proto res
        Hp, Wp = prt.shape[0], prt.shape[1]
        gx = jnp.arange(Wp, dtype=jnp.float32)[None, None, :]
        gy = jnp.arange(Hp, dtype=jnp.float32)[None, :, None]
        inside = (
            (gx >= bb[:, 0, None, None])
            & (gx <= bb[:, 2, None, None])
            & (gy >= bb[:, 1, None, None])
            & (gy <= bb[:, 3, None, None])
        )
        per_pix = bce(m_logits, tgt) * inside
        area = jnp.clip((bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1]), 1.0)
        per_anchor = jnp.sum(per_pix, axis=(1, 2)) / area
        return jnp.sum(per_anchor * sel_w)

    l_seg = (
        jnp.sum(
            jax.vmap(mask_loss_img)(
                mc_flat, proto, gt_idx, fg.astype(jnp.float32), w, gt_masks, gt_boxes
            )
        )
        / n_pos
    )

    total = box_gain * l_box + cls_gain * l_cls + dfl_gain * l_dfl + box_gain * l_seg
    return total, {
        "box": l_box, "cls": l_cls, "dfl": l_dfl, "seg": l_seg, "total": total,
        "n_pos": n_pos,
    }
