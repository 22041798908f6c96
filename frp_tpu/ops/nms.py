"""Fixed-shape IoU NMS that lives entirely under jit.

Replaces the NMS inside InsightFace's native detector (reference
``backend/app/utils/deepfake_utils.py:134-146``). Variable-length detections
don't exist on TPU: we keep the top ``pre_topk`` candidates by score (one
``lax.top_k``), build the dense [K, K] IoU matrix (one broadcasted VPU pass),
run greedy suppression as a K-step ``lax.fori_loop`` of vector ops, and emit a
**padded** [max_out] detection block with a validity mask — the mask is then
threaded through alignment, embedding, and matching (SURVEY.md section 7 "hard
parts": fixed-size padded detection slots + masking).

K defaults to 256, so the IoU matrix is 64K floats — VMEM-trivial.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Dense pairwise IoU. boxes: [K, 4] xyxy -> [K, K] float32."""
    return overlap_matrix(boxes, 1.0, 0.0)


def overlap_matrix(
    boxes: jnp.ndarray, iou_thresh: float, iom_thresh: float
) -> jnp.ndarray:
    """Dense pairwise *effective* overlap, normalized so the greedy pass
    suppresses at ``> 1.0``: max(IoU/iou_thresh, IoM/iom_thresh) where IoM is
    intersection over the smaller box's area ("NMS-min").

    Why IoM: a detector facing a face far above its trained scale emits a
    cluster of shifted, undersized duplicates whose pairwise IoU sits *below*
    any usable IoU threshold (measured ~0.35 on closeup enroll uploads) while
    their intersection covers most of the smaller box (IoM ~0.55+). Plain-IoU
    NMS keeps 5-8 boxes for one face, which breaks the single-face enroll
    contract (reference face_service semantics: dlib/InsightFace return one
    box per face). ``iom_thresh <= 0`` disables the IoM term (pure IoU,
    criterion still ``> 1.0``).
    """
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    iw = jnp.maximum(ix2 - ix1, 0.0)
    ih = jnp.maximum(iy2 - iy1, 0.0)
    inter = iw * ih
    union = area[:, None] + area[None, :] - inter
    eff = inter / jnp.maximum(union, 1e-12) / iou_thresh
    if iom_thresh > 0.0:
        min_area = jnp.minimum(area[:, None], area[None, :])
        iom = inter / jnp.maximum(min_area, 1e-12)
        eff = jnp.maximum(eff, iom / iom_thresh)
    return eff


@partial(
    jax.jit,
    static_argnames=("pre_topk", "max_out", "iou_thresh", "iom_thresh"),
)
def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    landmarks: jnp.ndarray,
    *,
    pre_topk: int = 256,
    max_out: int = 16,
    conf_thresh: float = 0.5,
    iou_thresh: float = 0.4,
    iom_thresh: float = 0.5,
):
    """Greedy NMS with fixed output slots.

    Suppression fires on IoU > iou_thresh OR intersection-over-min-area >
    iom_thresh (collapses nested/shifted duplicate clusters on oversized
    faces — see overlap_matrix; iom_thresh <= 0 for pure-IoU behavior).

    Args:
        boxes: [A, 4] xyxy. scores: [A]. landmarks: [A, 10].
    Returns dict with
        boxes [max_out, 4], scores [max_out], landmarks [max_out, 10],
        valid [max_out] bool, count scalar int32.
    Padded slots have score 0 and valid False.
    """
    k = min(pre_topk, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)  # descending
    top_boxes = jnp.take(boxes, top_idx, axis=0)
    top_ldm = jnp.take(landmarks, top_idx, axis=0)

    eff = overlap_matrix(top_boxes, iou_thresh, iom_thresh)
    above = top_scores >= conf_thresh
    rng = jnp.arange(k)

    def body(i, suppressed):
        # i is the i-th highest-scoring box; it suppresses lower-ranked
        # overlapping boxes only if it is itself alive.
        alive_i = jnp.logical_and(jnp.logical_not(suppressed[i]), above[i])
        hit = jnp.logical_and(eff[i] > 1.0, rng > i)
        return jnp.where(jnp.logical_and(alive_i, hit), True, suppressed)

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))
    keep = jnp.logical_and(jnp.logical_not(suppressed), above)

    return _select_slots(keep, top_scores, top_boxes, top_ldm, max_out, k)


def _select_slots(keep, top_scores, top_boxes, top_ldm, max_out, k):
    # rank kept boxes strictly above suppressed/padded ones regardless of
    # score, then validity comes from the KEEP mask — `score > 0` dropped a
    # kept box whose score is exactly 0.0 (conf_thresh <= 0, underflowed
    # softmax) even though it had already suppressed its neighbors
    # clamp the score term so kept boxes outrank suppressed ones even for
    # callers passing unnormalized/logit scores (> 2.0 would otherwise let a
    # suppressed candidate beat a kept one)
    sort_key = keep.astype(jnp.float32) * 2.0 + jnp.clip(top_scores, 0.0, 1.0)
    kept = keep
    if max_out > k:  # fewer candidates than output slots: pad the pool
        pad = max_out - k
        sort_key = jnp.concatenate([sort_key, jnp.zeros((pad,))])
        kept = jnp.concatenate([kept, jnp.zeros((pad,), bool)])
        top_scores = jnp.concatenate([top_scores, jnp.zeros((pad,))])
        top_boxes = jnp.concatenate([top_boxes, jnp.zeros((pad, 4))])
        top_ldm = jnp.concatenate([top_ldm, jnp.zeros((pad, top_ldm.shape[1]))])
    _, out_idx = jax.lax.top_k(sort_key, max_out)
    out_boxes = jnp.take(top_boxes, out_idx, axis=0)
    out_ldm = jnp.take(top_ldm, out_idx, axis=0)
    valid = jnp.take(kept, out_idx)
    out_scores = jnp.where(valid, jnp.take(top_scores, out_idx), 0.0)
    zeros = jnp.zeros_like(out_boxes)
    return {
        "boxes": jnp.where(valid[:, None], out_boxes, zeros),
        "scores": out_scores,
        "landmarks": jnp.where(valid[:, None], out_ldm, jnp.zeros_like(out_ldm)),
        "valid": valid,
        "count": jnp.sum(valid.astype(jnp.int32)),
    }


@partial(
    jax.jit,
    static_argnames=(
        "pre_topk", "max_out", "use_pallas", "conf_thresh", "iou_thresh",
        "iom_thresh",
    ),
)
def nms_padded_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    landmarks: jnp.ndarray,
    *,
    pre_topk: int = 256,
    max_out: int = 16,
    conf_thresh: float = 0.5,
    iou_thresh: float = 0.4,
    iom_thresh: float = 0.5,
    use_pallas: bool | None = None,
):
    """Batched NMS over [B, A, ...] with the greedy pass in a Pallas kernel.

    Identical outputs to vmap(nms_padded); the K-step suppression loop runs
    inside one Pallas program per frame (see ops/nms_pallas.py) instead of a
    K-step XLA loop — ~100x less dispatch overhead on v5e. Set
    use_pallas=False to force the XLA loop (CPU default).
    """
    b, a = scores.shape
    k = min(pre_topk, a)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    top_scores, top_idx = jax.lax.top_k(scores, k)  # [B, K]
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_ldm = jnp.take_along_axis(landmarks, top_idx[..., None], axis=1)

    eff = jax.vmap(
        lambda bx: overlap_matrix(bx, iou_thresh, iom_thresh)
    )(top_boxes)  # [B, K, K] effective overlap, suppress at > 1.0
    above = top_scores >= conf_thresh

    if use_pallas:
        from frp_tpu.ops.nms_pallas import greedy_suppress

        keep = greedy_suppress(eff, above, 1.0)
    else:
        rng = jnp.arange(k)

        def one(eff_f, above_f):
            def body(i, suppressed):
                alive_i = jnp.logical_and(jnp.logical_not(suppressed[i]), above_f[i])
                hit = jnp.logical_and(eff_f[i] > 1.0, rng > i)
                return jnp.where(jnp.logical_and(alive_i, hit), True, suppressed)

            suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
            return jnp.logical_and(jnp.logical_not(suppressed), above_f)

        keep = jax.vmap(one)(eff, above)

    def select(keep_f, scores_f, boxes_f, ldm_f):
        return _select_slots(keep_f, scores_f, boxes_f, ldm_f, max_out, k)

    return jax.vmap(select)(keep, top_scores, top_boxes, top_ldm)
