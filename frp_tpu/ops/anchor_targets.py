"""Anchor-target assignment and box/landmark encoding for detector training.

The exact inverse of ``frp_tpu.ops.decode`` (standard RetinaFace/SSD
formulation, variances 0.1/0.2): training targets are computed per anchor by
IoU matching — every GT's best anchor is forced positive, plus any anchor
with IoU >= pos_thresh. Shape-static: GT boxes arrive padded [G, 4] with a
validity mask, outputs are per-anchor targets + class labels
(1 positive / 0 background / -1 ignore).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from frp_tpu.ops.anchors import RETINAFACE_CFG


def encode_boxes(gt: jnp.ndarray, priors: jnp.ndarray) -> jnp.ndarray:
    """gt [A, 4] xyxy (matched per anchor), priors [A, 4] cxcywh normalized
    -> loc targets [A, 4] (inverse of decode_boxes)."""
    v0, v1 = RETINAFACE_CFG["variances"]
    gt_cxy = (gt[..., :2] + gt[..., 2:]) / 2.0
    gt_wh = jnp.maximum(gt[..., 2:] - gt[..., :2], 1e-6)
    t_cxy = (gt_cxy - priors[..., :2]) / (v0 * priors[..., 2:])
    t_wh = jnp.log(gt_wh / priors[..., 2:]) / v1
    return jnp.concatenate([t_cxy, t_wh], axis=-1)


def encode_landmarks(gt_ldm: jnp.ndarray, priors: jnp.ndarray) -> jnp.ndarray:
    """gt_ldm [A, 10] (x1,y1..x5,y5) -> targets [A, 10] (inverse of
    decode_landmarks)."""
    v0, _ = RETINAFACE_CFG["variances"]
    pts = gt_ldm.reshape(*gt_ldm.shape[:-1], 5, 2)
    t = (pts - priors[..., None, :2]) / (v0 * priors[..., None, 2:])
    return t.reshape(*gt_ldm.shape[:-1], 10)


def _iou_anchors_gt(anchors_xyxy: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """[A, 4] x [G, 4] -> [A, G] IoU."""
    ax1, ay1, ax2, ay2 = (anchors_xyxy[:, i] for i in range(4))
    gx1, gy1, gx2, gy2 = (gt[:, i] for i in range(4))
    ix1 = jnp.maximum(ax1[:, None], gx1[None, :])
    iy1 = jnp.maximum(ay1[:, None], gy1[None, :])
    ix2 = jnp.minimum(ax2[:, None], gx2[None, :])
    iy2 = jnp.minimum(ay2[:, None], gy2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    a_area = jnp.maximum(ax2 - ax1, 0) * jnp.maximum(ay2 - ay1, 0)
    g_area = jnp.maximum(gx2 - gx1, 0) * jnp.maximum(gy2 - gy1, 0)
    return inter / jnp.maximum(a_area[:, None] + g_area[None, :] - inter, 1e-12)


def assign_targets(
    priors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_ldm: jnp.ndarray,
    gt_valid: jnp.ndarray,
    pos_thresh: float = 0.35,
    neg_thresh: float = 0.35,
):
    """Per-anchor training targets.

    Args:
        priors: [A, 4] cxcywh normalized (generate_anchors output).
        gt_boxes: [G, 4] xyxy normalized (0..1), zero-padded.
        gt_ldm: [G, 10] normalized landmark coords (0..1), zero-padded.
        gt_valid: [G] bool.
    Returns dict: labels [A] int32 (1 pos / 0 neg / -1 ignore),
        loc_targets [A, 4], ldm_targets [A, 10],
        ldm_valid [A] bool (positives whose GT has usable landmarks).
    """
    a = priors.shape[0]
    anchors_xyxy = jnp.concatenate(
        [priors[:, :2] - priors[:, 2:] / 2, priors[:, :2] + priors[:, 2:] / 2],
        axis=1,
    )
    iou = _iou_anchors_gt(anchors_xyxy, gt_boxes)  # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    best_gt_iou = jnp.max(iou, axis=1)          # [A]
    best_gt_idx = jnp.argmax(iou, axis=1)       # [A]

    # force-match: each GT's best anchor becomes positive for that GT.
    # Invalid (padded) GT columns are all -1 IoU, so they ALL argmax to
    # anchor 0 — a plain .set() scatter with those duplicate indices could
    # nondeterministically clobber a valid GT's forced match on anchor 0
    # (the face would lose its only positive anchor). Accumulate with
    # .max() instead: True/valid always wins, ties break to the highest
    # GT index, deterministically.
    best_anchor_idx = jnp.argmax(iou, axis=0)   # [G]
    g_idx = jnp.arange(gt_boxes.shape[0])
    forced = jnp.zeros((a,), bool).at[best_anchor_idx].max(gt_valid)
    forced_gt = (
        jnp.full((a,), -1, jnp.int32)
        .at[best_anchor_idx]
        .max(jnp.where(gt_valid, g_idx, -1).astype(jnp.int32))
    )
    best_gt_idx = jnp.where(forced_gt >= 0, forced_gt, best_gt_idx)

    positive = jnp.logical_or(best_gt_iou >= pos_thresh, forced)
    negative = jnp.logical_and(~positive, best_gt_iou < neg_thresh)
    labels = jnp.where(positive, 1, jnp.where(negative, 0, -1)).astype(jnp.int32)

    matched_boxes = jnp.take(gt_boxes, best_gt_idx, axis=0)
    matched_ldm = jnp.take(gt_ldm, best_gt_idx, axis=0)
    loc_targets = encode_boxes(matched_boxes, priors)
    ldm_targets = encode_landmarks(matched_ldm, priors)
    # landmark loss only where GT landmarks are meaningful (non-degenerate)
    ldm_ok = jnp.any(matched_ldm.reshape(-1, 5, 2).std(axis=1) > 1e-6, axis=-1)
    return {
        "labels": labels,
        "loc_targets": loc_targets,
        "ldm_targets": ldm_targets,
        "ldm_valid": jnp.logical_and(positive, ldm_ok),
    }


def multibox_loss(
    pred_loc: jnp.ndarray,
    pred_ldm: jnp.ndarray,
    pred_cls_logits: jnp.ndarray,
    targets: dict,
    neg_pos_ratio: float = 7.0,
):
    """Per-image RetinaFace loss: smooth-L1 loc + smooth-L1 landmarks + CE
    with hard-negative mining at neg:pos ratio (standard 7:1)."""
    labels = targets["labels"]
    pos = labels == 1

    def smooth_l1(x):
        ax = jnp.abs(x)
        return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)

    n_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
    loc_loss = jnp.sum(
        smooth_l1(pred_loc - targets["loc_targets"]).sum(-1) * pos
    ) / n_pos
    ldm_mask = targets["ldm_valid"].astype(jnp.float32)
    ldm_loss = jnp.sum(
        smooth_l1(pred_ldm - targets["ldm_targets"]).sum(-1) * ldm_mask
    ) / jnp.maximum(jnp.sum(ldm_mask), 1.0)

    ce = -jax.nn.log_softmax(pred_cls_logits, axis=-1)
    pos_ce = jnp.where(pos, ce[:, 1], 0.0)
    neg_ce_all = jnp.where(labels == 0, ce[:, 0], -jnp.inf)
    # hard-negative mining: top-k hardest backgrounds
    k = pred_cls_logits.shape[0]
    n_neg = jnp.minimum(
        neg_pos_ratio * n_pos, jnp.sum((labels == 0).astype(jnp.float32))
    )
    sorted_neg = jnp.sort(neg_ce_all)[::-1]
    rank = jnp.arange(k, dtype=jnp.float32)
    neg_ce = jnp.sum(jnp.where(rank < n_neg, jnp.where(
        jnp.isfinite(sorted_neg), sorted_neg, 0.0), 0.0))
    cls_loss = (jnp.sum(pos_ce) + neg_ce) / n_pos
    return {
        "loss": cls_loss + 2.0 * loc_loss + ldm_loss,
        "cls_loss": cls_loss,
        "loc_loss": loc_loss,
        "ldm_loss": ldm_loss,
        "n_pos": n_pos,
    }
