"""Fully fused RetinaFace detection head as ONE Pallas TPU kernel per frame:
anchor-decode + landmark-decode + score-filter + pairwise IoU + greedy NMS
suppression + output-slot selection — the complete "anchor decoding, NMS ...
fused into Pallas kernels" deliverable (BASELINE.json north star; the
reference delegates all of it to InsightFace's compiled ONNX graph,
``backend/app/utils/deepfake_utils.py:134-146``).

Division of labor with XLA (measured, not guessed):
  * ``lax.top_k`` over all A≈16.8k anchors stays in XLA — a VPU bitonic sort
    inside Pallas cannot beat XLA's native top-k, and pre-cutting to K=256
    candidates shrinks every downstream tensor 65x.
  * decode moves INSIDE the kernel and therefore runs on K=256 candidates
    instead of all 16.8k anchors (the XLA path decodes everything first).
  * The [K, K] IoU matrix never leaves VMEM (the XLA path materializes it
    in HBM between ops).
  * Slot selection (the old second ``top_k`` + gathers) becomes a one-hot
    [M, K] x [K, 16] matmul on the MXU.

Candidate payload layout (one [K, 19] f32 input):
    0:4   raw loc deltas        14:18  prior (cx, cy, w, h)
    4:14  raw landmark deltas   18     score
Output slots (one [M, 16] f32 output):
    0:4 boxes xyxy (px) | 4:14 landmarks (px) | 14 score | 15 valid flag
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from frp_tpu.ops.anchors import RETINAFACE_CFG

PAYLOAD = 19
OUT_COLS = 16


def _fused_head_kernel(
    *,
    conf_thresh: float,
    iou_thresh: float,
    iom_thresh: float,
    image_size: float,
    max_out: int,
    payload_ref,
    out_ref,
    iou_scratch,
    vals_scratch,
):
    k = payload_ref.shape[1]
    v0, v1 = RETINAFACE_CFG["variances"]
    p = payload_ref[0]  # [K, 19]

    # --- anchor decode (on K candidates only) ---
    prior_xy = p[:, 14:16]
    prior_wh = p[:, 16:18]
    cxy = prior_xy + p[:, 0:2] * v0 * prior_wh
    wh = prior_wh * jnp.exp(p[:, 2:4] * v1)
    tl = (cxy - wh * 0.5) * image_size
    br = (cxy + wh * 0.5) * image_size
    boxes = jnp.concatenate([tl, br], axis=1)  # [K, 4] xyxy px

    # --- landmark decode: out[2i] = px + d*v0*pw ; out[2i+1] = py + d*v0*ph
    prior_xy5 = jnp.concatenate([prior_xy] * 5, axis=1)  # [K, 10]
    prior_wh5 = jnp.concatenate([prior_wh] * 5, axis=1)
    ldm = (prior_xy5 + p[:, 4:14] * v0 * prior_wh5) * image_size

    score = p[:, 18:19]  # [K, 1]

    # --- pairwise IoU into VMEM scratch (never touches HBM) ---
    x1, y1, x2, y2 = boxes[:, 0:1], boxes[:, 1:2], boxes[:, 2:3], boxes[:, 3:4]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # [K, 1]
    x1r, y1r = jnp.transpose(x1), jnp.transpose(y1)  # [1, K]
    x2r, y2r = jnp.transpose(x2), jnp.transpose(y2)
    iw = jnp.maximum(jnp.minimum(x2, x2r) - jnp.maximum(x1, x1r), 0.0)
    ih = jnp.maximum(jnp.minimum(y2, y2r) - jnp.maximum(y1, y1r), 0.0)
    inter = iw * ih  # [K, K]
    union = area + jnp.transpose(area) - inter
    # effective overlap normalized to suppress at > 1.0: IoU/iou_thresh,
    # and (when enabled) intersection-over-min-area/iom_thresh — collapses
    # the shifted/nested duplicate clusters an oversized face produces
    # (ops/nms.py overlap_matrix is the XLA twin; tested equal)
    eff = inter / jnp.maximum(union, 1e-12) / iou_thresh
    if iom_thresh > 0.0:
        min_area = jnp.minimum(area, jnp.transpose(area))
        eff = jnp.maximum(eff, inter / jnp.maximum(min_area, 1e-12) / iom_thresh)
    iou_scratch[:, :] = eff

    # --- greedy suppression (rank order == row order: pre-sorted by score).
    # Pallas TPU can't dynamic-slice VALUES, so row i comes from the scratch
    # REF (pl.ds) and the scalar "is box i alive" is a one-hot reduction.
    above = jnp.transpose((score >= conf_thresh).astype(jnp.float32))  # [1, K]
    rank = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, suppressed):
        row = iou_scratch[pl.ds(i, 1), :]  # [1, K]
        onehot = (rank == i).astype(jnp.float32)
        alive_i = jnp.sum(onehot * (1.0 - suppressed) * above)
        hit = jnp.logical_and(row > 1.0, rank > i)
        return jnp.maximum(suppressed, jnp.where(hit, alive_i, 0.0))

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((1, k), jnp.float32))
    keep = (1.0 - suppressed) * above  # [1, K] 0/1

    # --- slot selection: rank-ordered compaction into max_out slots as a
    # one-hot matmul (replaces the old second top_k + gathers).
    # cum[i] = #kept among ranks 0..i  ->  via upper-triangular ones matmul.
    rr = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    upper = (rr <= cc).astype(jnp.float32)  # U[j, i] = 1 if j <= i
    cum = jnp.dot(keep, upper, preferred_element_type=jnp.float32)  # [1, K]
    slot = jnp.transpose(cum - 1.0)  # [K, 1] slot index of each kept box

    mcol = jax.lax.broadcasted_iota(jnp.int32, (k, max_out), 1).astype(jnp.float32)
    sel = (slot == mcol).astype(jnp.float32) * jnp.transpose(keep)  # [K, M]

    # Exact value selection: an MXU one-hot matmul would truncate the f32
    # box/landmark values to bf16 (measured: boxes rounded to integers on
    # device). Instead stage the values in VMEM scratch and copy the source
    # ROW per output slot via dynamic ref indexing — the only matmuls left
    # operate on 0/1 data (exact in bf16).
    valid = jnp.transpose(
        jnp.dot(keep, sel, preferred_element_type=jnp.float32)
    )  # [M, 1] 0/1
    ranks_f = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1).astype(jnp.float32)
    # src[m] = rank of the box landing in slot m (0 when slot empty)
    src = jnp.dot(ranks_f, sel, preferred_element_type=jnp.float32)  # [1, M]

    vals = jnp.concatenate([boxes, ldm, score], axis=1)  # [K, 15]
    vals_scratch[:, 0:15] = vals
    vals_scratch[:, 15:16] = jnp.zeros((k, 1), jnp.float32)
    mrank = jax.lax.broadcasted_iota(jnp.int32, (1, max_out), 1)

    flag_col = (
        jax.lax.broadcasted_iota(jnp.int32, (1, OUT_COLS), 1) == 15
    ).astype(jnp.float32)  # [1, 16]: one-hot on the valid column

    def copy_slot(mi, _):
        onehot_m = (mrank == mi).astype(jnp.float32)
        src_i = jnp.sum(onehot_m * src).astype(jnp.int32)
        valid_m = jnp.sum(onehot_m * jnp.transpose(valid))  # scalar 0/1
        row = vals_scratch[pl.ds(src_i, 1), :]  # [1, 16] exact copy
        out_ref[0, pl.ds(mi, 1), :] = row * valid_m + flag_col * valid_m
        return 0

    jax.lax.fori_loop(0, max_out, copy_slot, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pre_topk", "max_out", "conf_thresh", "iou_thresh", "iom_thresh",
        "image_size", "use_pallas",
    ),
)
def fused_detection_head(
    loc: jnp.ndarray,
    ldm: jnp.ndarray,
    scores: jnp.ndarray,
    priors: jnp.ndarray,
    *,
    pre_topk: int = 256,
    max_out: int = 16,
    conf_thresh: float = 0.5,
    iou_thresh: float = 0.4,
    iom_thresh: float = 0.5,
    image_size: float = 640.0,
    use_pallas: bool | None = None,
):
    """RetinaFace head post-processing: raw (loc, ldm, scores, priors) ->
    padded detection slots. Semantically identical to
    decode_boxes/decode_landmarks + nms_padded_batched (tested equal); one
    Pallas program per frame on TPU, interpreter on CPU.

    Args: loc [B, A, 4]; ldm [B, A, 10]; scores [B, A]; priors [A, 4].
    Returns dict: boxes [B, M, 4] px, landmarks [B, M, 10] px, scores
    [B, M], valid [B, M] bool, count [B].
    """
    b, a = scores.shape
    k = min(pre_topk, a)
    assert max_out <= k, (max_out, k)
    if k > 256:
        # the kernel's slot compaction feeds candidate RANKS through an MXU
        # matmul; bf16 represents integers exactly only up to 256, so
        # k > 256 would silently copy the WRONG candidate's box into a
        # "valid" slot — route to the XLA path instead of corrupting
        assert use_pallas is not True, (
            f"pre_topk={k} > 256 exceeds the kernel's exact-rank range"
        )
        use_pallas = False
    if use_pallas is False:
        # XLA reference path (same semantics, tested equal) — for kernel
        # debugging and apples-to-apples microbenchmarks; mirrors
        # nms_padded_batched's working use_pallas flag
        from frp_tpu.ops.decode import decode_boxes, decode_landmarks
        from frp_tpu.ops.nms import nms_padded_batched

        return nms_padded_batched(
            decode_boxes(loc, priors, image_size),
            scores,
            decode_landmarks(ldm, priors, image_size),
            pre_topk=pre_topk,
            max_out=max_out,
            conf_thresh=conf_thresh,
            iou_thresh=iou_thresh,
            iom_thresh=iom_thresh,
        )

    top_scores, top_idx = jax.lax.top_k(scores, k)  # [B, K] descending
    gather = lambda x: jnp.take_along_axis(x, top_idx[..., None], axis=1)
    payload = jnp.concatenate(
        [
            gather(loc),
            gather(ldm),
            jnp.take(priors, top_idx, axis=0),  # [B, K, 4]
            top_scores[..., None],
        ],
        axis=-1,
    ).astype(jnp.float32)  # [B, K, 19]

    kernel = functools.partial(
        _fused_head_kernel,
        conf_thresh=float(conf_thresh),
        iou_thresh=float(iou_thresh),
        iom_thresh=float(iom_thresh),
        image_size=float(image_size),
        max_out=int(max_out),
    )

    def wrapped(payload_ref, out_ref, iou_scratch, vals_scratch):
        kernel(
            payload_ref=payload_ref,
            out_ref=out_ref,
            iou_scratch=iou_scratch,
            vals_scratch=vals_scratch,
        )

    out = pl.pallas_call(
        wrapped,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, PAYLOAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, max_out, OUT_COLS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, max_out, OUT_COLS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, k), jnp.float32),
            pltpu.VMEM((k, OUT_COLS), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(payload)

    valid = out[..., 15] > 0.5
    zeros3 = jnp.zeros_like(out[..., 0:4])
    return {
        "boxes": jnp.where(valid[..., None], out[..., 0:4], zeros3),
        "landmarks": jnp.where(valid[..., None], out[..., 4:14], 0.0),
        "scores": jnp.where(valid, out[..., 14], 0.0),
        "valid": valid,
        "count": jnp.sum(valid.astype(jnp.int32), axis=-1),
    }
