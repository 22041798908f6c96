"""The fused recognition pipeline: frames -> detections -> aligned crops ->
embeddings (+ spoof) -> gallery matches, as ONE jitted XLA graph.

This replaces the reference's hottest path — per-camera Python threads calling
dlib detect + embed then numpy compare (``backend/app/routes/camera.py:
171-272`` + ``face_service.py:395-443``, SURVEY.md section 3.2) — with a
single device-resident graph over the whole multi-camera batch:

    frames   [B, H, W, 3] uint8          (B = streams x frames, mesh-sharded)
      └ preprocess: resize to det grid, normalize, bf16      (ops.image)
      └ RetinaFace forward                                   (models.retinaface)
      └ anchor decode -> per-frame padded NMS (vmap)         (ops.decode/nms)
      └ 5-pt similarity alignment + batched warp             (ops.align)
      └ MobileFaceNet embeddings [B, M, D]                   (models.mobilefacenet)
      └ optional MobileNetV3 spoof probs [B, M]              (models.mobilenetv3)
      └ gallery matmul match + quality scores                (ops.matching/quality)

Everything is shape-static: M = max_faces slots per frame with validity masks
threaded end-to-end. The batch axis B is sharded over the mesh 'data' axis;
all gathers stay frame-local (see ops.align.warp_crops_batched), so the graph
partitions with zero cross-device collectives in the forward pass.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

# Persistent compilation cache: the fused pipeline is a large program (~4 min
# cold compile on v5e); cache it across processes.
import os as _os
jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("FRP_COMPILE_CACHE", "/tmp/frp_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from frp_tpu.config import Config, get_config
from frp_tpu.engine.gallery import DeviceGallery
from frp_tpu.models.iresnet import init_iresnet, iresnet_forward
from frp_tpu.models.mobilefacenet import init_mobilefacenet, mobilefacenet_forward
from frp_tpu.models.mobilenetv3 import init_mobilenetv3_small, mobilenetv3_forward
from frp_tpu.models.retinaface import init_retinaface, retinaface_forward
from frp_tpu.ops.align import (
    ARCFACE_TEMPLATE_112,
    similarity_transform,
    warp_crops_batched,
)
from frp_tpu.ops.anchors import generate_anchors
from frp_tpu.ops.decode import decode_boxes, decode_landmarks
from frp_tpu.ops.image import (
    normalize_face,
    normalize_imagenet,
    preprocess_frames,
    yuv420_to_rgb,
)
from frp_tpu.ops.matching import gallery_match
from frp_tpu.utils.logger import get_logger

logger = get_logger("frp.engine")
from frp_tpu.ops.nms import nms_padded_batched
from frp_tpu.ops.quality import assess_quality_batch


def build_pipeline(
    *,
    det_size: int = 640,
    max_faces: int = 16,
    pre_nms_topk: int = 256,
    conf_thresh: float = 0.5,
    nms_thresh: float = 0.4,
    iom_thresh: float = 0.5,
    tolerance: float = 0.6,
    top_k: int = 5,
    with_spoof: bool = True,
    with_quality: bool = True,
    compute_dtype: str = "bfloat16",
    spoof_size: int = 112,
    distance_scale: float = 1.0,
):
    """Build the pure pipeline function (params, frames, gallery) -> results.

    The returned function is jit/pjit-able; all knobs above are baked in as
    static trace-time constants. ``priors`` must be passed as a device array
    argument — embedding the 16800x4 anchor table as a trace-time constant
    permanently degrades the serving runtime's dispatch path (measured: a
    single big-constant executable flips every later dispatch in the process
    from ~0.02 ms to ~2.5-50 ms on v5e).
    """

    def pipeline(params, frames, gallery, gallery_valid, priors):
        b, h, w, _ = frames.shape
        m = max_faces

        # --- detect on the resized grid ---
        if h == det_size and w == det_size:  # host already letterboxed
            x = ((frames.astype(jnp.float32) - 127.5) / 128.0).astype(
                jnp.dtype(compute_dtype)
            )
            scale = jnp.ones((b, 2), jnp.float32)
        else:
            x, scale = preprocess_frames(frames, det_size, compute_dtype)
        det = retinaface_forward(params["detector"], x)
        boxes_det = decode_boxes(det["loc"], priors, float(det_size))  # [B, A, 4]
        ldm_det = decode_landmarks(det["ldm"], priors, float(det_size))

        dets = nms_padded_batched(
            boxes_det,
            det["score"],
            ldm_det,
            pre_topk=pre_nms_topk,
            max_out=m,
            conf_thresh=conf_thresh,
            iou_thresh=nms_thresh,
            iom_thresh=iom_thresh,
        )
        valid = dets["valid"]  # [B, M]
        scores = dets["scores"]

        # --- map detector px back to frame px ---
        sxy = scale[:, None, :]  # [B, 1, 2]
        boxes = dets["boxes"] * jnp.concatenate([sxy, sxy], axis=-1)  # [B, M, 4]
        ldm = (dets["landmarks"].reshape(b, m, 5, 2) * sxy[:, :, None, :]).reshape(
            b, m, 10
        )

        frames_f = frames.astype(jnp.float32)

        # --- align + crop (frame-local gathers) ---
        mats = similarity_transform(
            ldm.reshape(b, m, 5, 2), jnp.asarray(ARCFACE_TEMPLATE_112)
        )  # [B, M, 2, 3]
        # padded slots have collapsed landmarks -> degenerate transforms;
        # replace with identity so downstream coords stay benign
        ident = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        mats = jnp.where(valid[..., None, None], mats, ident)
        crops = warp_crops_batched(frames_f, mats, out_size=112)  # [B, M, 112², 3]

        # --- embed ---
        flat = crops.reshape(b * m, 112, 112, 3)
        emb_in = normalize_face(flat).astype(jnp.dtype(compute_dtype))
        emb = mobilefacenet_forward(params["embedder"], emb_in)  # [B*M, D] f32
        # distance-scale calibration (see build_stages.embed_stage)
        emb = jnp.where(valid.reshape(-1, 1), emb * distance_scale, 0.0)

        # --- match ---
        match = gallery_match(
            emb, gallery, gallery_valid, tolerance=tolerance, top_k=top_k
        )
        out = {
            "boxes": boxes,
            "scores": scores,
            "landmarks": ldm,
            "valid": valid,
            "count": jnp.sum(valid.astype(jnp.int32), axis=1),
            "embeddings": emb.reshape(b, m, -1),
            "best_idx": match["best_idx"].reshape(b, m),
            "best_distance": jnp.where(
                valid, match["best_distance"].reshape(b, m), jnp.inf
            ),
            "is_match": jnp.logical_and(match["is_match"].reshape(b, m), valid),
            "topk_idx": match["topk_idx"].reshape(b, m, -1),
            "topk_distance": match["topk_distance"].reshape(b, m, -1),
        }

        # --- spoof (co-batched with recognition, reference config 4) ---
        if with_spoof:
            # Classify the aligned 112 crops already gathered for embedding
            # instead of re-gathering 224x224 bbox crops from the frames: the
            # second full-frame gather pass measured ~230 ms/batch on v5e —
            # 80% of total pipeline time. MobileNetV3 global-pools, so any
            # input size works; spoof_size > 112 upsamples densely (cheap,
            # fusible) when a caller wants reference-style 224 inputs.
            scrops = crops
            if spoof_size != 112:
                scrops = jax.image.resize(
                    crops.reshape(b * m, 112, 112, 3),
                    (b * m, spoof_size, spoof_size, 3),
                    method="bilinear",
                ).reshape(b, m, spoof_size, spoof_size, 3)
            sin = normalize_imagenet(scrops.reshape(b * m, spoof_size, spoof_size, 3))
            logits = mobilenetv3_forward(
                params["spoof"], sin.astype(jnp.dtype(compute_dtype))
            )
            fake_prob = jax.nn.softmax(logits, axis=-1)[:, 1].reshape(b, m)
            out["fake_prob"] = jnp.where(valid, fake_prob, 0.0)

        # --- quality (device replica of face_service.py:251-339) ---
        if with_quality:
            q = assess_quality_batch(
                crops.reshape(b * m, 112, 112, 3),
                boxes.reshape(b * m, 4),
                (h, w),
                valid.reshape(-1),
            )
            out["quality"] = q["score"].reshape(b, m)
            out["blur_score"] = q["blur_score"].reshape(b, m)

        return out

    return pipeline


def embed_compact_rungs(
    n: int, enabled: bool | None = None, rung_env: str | None = None
) -> list[int]:
    """Compact-batch sizes (ascending, all < n) for embed-stage valid-slot
    compaction; [] disables. Three rungs cover the serving regimes: sparse
    surveillance (few faces -> n/8), mixed (n/2), and the face-dense bench
    scene (~75% slots valid -> 13n/16). Override with FRP_EMBED_RUNGS
    ("16,64,104" style) or disable with FRP_EMBED_COMPACT=0. Small batches
    (enroll/compare uploads, n < 64) skip compaction — the win can't cover
    the gather/scatter and program-size cost there.

    ``enabled``/``rung_env``: explicit overrides of the env vars. jax.jit
    defers tracing to the first CALL, so anything reading the env inside a
    stage body sees whatever the env is THEN — build_stages captures the
    env once at build time and passes it through (a temporary env toggle
    around build_stages alone would otherwise be silently ineffective)."""
    if enabled is None:
        enabled = _os.getenv("FRP_EMBED_COMPACT", "1") != "0"
    if rung_env is None:
        rung_env = _os.getenv("FRP_EMBED_RUNGS")
    if not enabled or n < 64:
        return []
    if rung_env:
        rungs = sorted({int(x) for x in rung_env.split(",") if x.strip()})
    else:
        rungs = sorted({max(8, n // 8), n // 2, (13 * n) // 16})
    return [k for k in rungs if 0 < k < n]


def build_stages(
    *,
    det_size: int = 640,
    max_faces: int = 16,
    pre_nms_topk: int = 256,
    conf_thresh: float = 0.5,
    nms_thresh: float = 0.4,
    iom_thresh: float = 0.5,
    top_k: int = 5,
    with_spoof: bool = True,
    with_quality: bool = True,
    compute_dtype: str = "bfloat16",
    spoof_size: int = 112,
    embedder_forward=mobilefacenet_forward,
    flip_tta: bool = False,
):
    """The same pipeline as ``build_pipeline`` split into four chained jitted
    stages (detect -> crop -> embed -> match).

    Why not one fused program: on the v5e serving runtime, executables beyond
    the device program cache (~8 MB serialized) are re-shipped per dispatch —
    the fused 8.5 MB pipeline costs ~270 ms/batch while the same math as four
    1-3 MB resident programs dispatches in ~1 ms total (measured; see
    bench.py). Intermediates stay on device between stages, so the split
    costs no host traffic — only three extra dispatches. ``priors`` is an
    argument (not a baked constant) for the same reason documented on
    build_pipeline: big-constant executables poison the dispatch path.
    """
    cdtype = jnp.dtype(compute_dtype)

    def detect_stage(params, frames, priors):
        b, h, w, _ = frames.shape
        if h == det_size and w == det_size:
            x = ((frames.astype(jnp.float32) - 127.5) / 128.0).astype(cdtype)
            scale = jnp.ones((b, 2), jnp.float32)
        else:
            x, scale = preprocess_frames(frames, det_size, compute_dtype)
        det = retinaface_forward(params, x)
        if jax.default_backend() == "tpu":
            # fully fused Pallas head: decode + score-filter + IoU + greedy
            # suppress + slot-select in one kernel per frame — 3.3 ms/batch
            # vs 42.6 ms for the op-by-op path (benchmarks/micro_pallas.py;
            # on-device equality asserted there and in tests)
            from frp_tpu.ops.detection_pallas import fused_detection_head

            dets = fused_detection_head(
                det["loc"], det["ldm"], det["score"], priors,
                pre_topk=pre_nms_topk,
                max_out=max_faces,
                conf_thresh=conf_thresh,
                iou_thresh=nms_thresh,
                iom_thresh=iom_thresh,
                image_size=float(det_size),
            )
        else:
            boxes_det = decode_boxes(det["loc"], priors, float(det_size))
            ldm_det = decode_landmarks(det["ldm"], priors, float(det_size))
            dets = nms_padded_batched(
                boxes_det,
                det["score"],
                ldm_det,
                pre_topk=pre_nms_topk,
                max_out=max_faces,
                conf_thresh=conf_thresh,
                iou_thresh=nms_thresh,
                iom_thresh=iom_thresh,
            )
        sxy = scale[:, None, :]
        boxes = dets["boxes"] * jnp.concatenate([sxy, sxy], axis=-1)
        b_, m_ = dets["valid"].shape
        ldm = (
            dets["landmarks"].reshape(b_, m_, 5, 2) * sxy[:, :, None, :]
        ).reshape(b_, m_, 10)
        return {
            "boxes": boxes,
            "scores": dets["scores"],
            "landmarks": ldm,
            "valid": dets["valid"],
            "count": jnp.sum(dets["valid"].astype(jnp.int32), axis=1),
        }

    def crop_stage(frames, dets):
        b, h, w, _ = frames.shape
        m = dets["valid"].shape[1]
        frames_f = frames.astype(jnp.float32)
        mats = similarity_transform(
            dets["landmarks"].reshape(b, m, 5, 2), jnp.asarray(ARCFACE_TEMPLATE_112)
        )
        ident = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        mats = jnp.where(dets["valid"][..., None, None], mats, ident)
        from frp_tpu.ops.align_pallas import (
            LANE,
            WIN,
            warp_crops_auto,
            warp_crops_batched_pallas,
        )

        if (
            jax.default_backend() == "tpu"
            and min(h, w) >= WIN
            and w % LANE == 0
            and h % 8 == 0
        ):
            # two-pass shear warp in Pallas: 1.9 ms/batch vs 46.7 ms for the
            # XLA random-HBM-gather formulation (benchmarks/micro_pallas.py).
            # B=1 (enroll/compare uploads — where closeup faces exceeding the
            # kernel's window coverage actually occur) adds a per-batch
            # lax.cond fallback to the exact XLA warp. The multi-stream scan
            # keeps the pure kernel: embedding the XLA-warp branch in the
            # scan program measurably slows every dispatch (program size,
            # CLAUDE.md gotcha 6), and surveillance faces sit far below the
            # 252 px det-space coverage bound (oversized ones edge-clamp
            # gracefully) — see ops/align_pallas.py
            if b == 1:
                crops = warp_crops_auto(frames_f, mats, out_size=112)
            else:
                crops = warp_crops_batched_pallas(frames_f, mats, out_size=112)
        else:
            crops = warp_crops_batched(frames_f, mats, out_size=112)
        out = {"crops": crops}
        if with_quality:
            q = assess_quality_batch(
                crops.reshape(b * m, 112, 112, 3),
                dets["boxes"].reshape(b * m, 4),
                (h, w),
                dets["valid"].reshape(-1),
            )
            out["quality"] = q["score"].reshape(b, m)
            out["blur_score"] = q["blur_score"].reshape(b, m)
        return out

    def _embed_core(params, flat):
        """Embedder + spoof forward on a flat crop batch [K, 112, 112, 3].
        Returns (embeddings [K, D] f32, fake_prob [K] f32 | None)."""
        emb_in = normalize_face(flat).astype(cdtype)
        emb = embedder_forward(params["embedder"], emb_in)
        if flip_tta:
            # horizontal-mirror test-time augmentation (EMBED_FLIP_TTA):
            # the flipped crop is the same identity at mirrored yaw, so the
            # renormalized mean denoises pose — measured tier-2 e2e TPR
            # 0.755 -> 0.821 (benchmarks/flip_tta_profile.json). Costs one
            # extra embedder forward; spoof is NOT doubled (its decision
            # showed no pose sensitivity worth 2x the classifier).
            emb_f = embedder_forward(params["embedder"], emb_in[:, :, ::-1, :])
            s = emb + emb_f
            emb = s / jnp.maximum(
                jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-12)
        fake = None
        if with_spoof:
            scrops = flat
            if spoof_size != 112:
                scrops = jax.image.resize(
                    flat, (flat.shape[0], spoof_size, spoof_size, 3),
                    method="bilinear",
                )
            sin = normalize_imagenet(scrops).astype(cdtype)
            logits = mobilenetv3_forward(params["spoof"], sin)
            fake = jax.nn.softmax(logits, axis=-1)[:, 1]
        return emb, fake

    # compaction config is captured HERE (build time), not at trace time:
    # jit defers tracing to the first call, so reading the env inside the
    # stage body would see whatever the env happens to be then
    _compact_enabled = _os.getenv("FRP_EMBED_COMPACT", "1") != "0"
    _compact_rung_env = _os.getenv("FRP_EMBED_RUNGS")

    def embed_stage(params, crops, valid, scale=1.0):
        b, m = crops.shape[0], crops.shape[1]
        n = b * m
        flat = crops.reshape(n, 112, 112, 3)
        vflat = valid.reshape(-1)

        rungs = embed_compact_rungs(
            n, enabled=_compact_enabled, rung_env=_compact_rung_env
        )
        if rungs:
            # Valid-slot compaction (VERDICT r3 #3): the multi-stream scan
            # leaves ~25% of the B*M crop slots invalid (face count varies
            # per frame), and embed+spoof is the dominant device stage
            # (64.2 of 80.4 GF/batch) — so gather the valid crops into the
            # smallest compact rung that holds them, run the nets on that,
            # and scatter results back. The rung is picked ON DEVICE
            # (lax.switch on the true count): the host never learns the
            # count between stages — a host-side pick would need a blocking
            # fetch (~29 ms in the relay's degraded mode) and kill
            # pipelining. Each rung compiles its own net instance; keep the
            # ladder short (program size, CLAUDE.md gotcha 6) and
            # FRP_EMBED_COMPACT=0 disables outright.
            order = jnp.argsort(jnp.logical_not(vflat), stable=True)
            nv = jnp.sum(vflat.astype(jnp.int32))

            def compact_branch(k):
                def run(_):
                    take = order[:k]
                    emb_k, fake_k = _embed_core(params, flat[take])
                    emb = jnp.zeros((n, emb_k.shape[-1]), emb_k.dtype)
                    emb = emb.at[take].set(emb_k)
                    fake = (jnp.zeros((n,), fake_k.dtype).at[take].set(fake_k)
                            if fake_k is not None else None)
                    return emb, fake
                return run

            def full_branch(_):
                return _embed_core(params, flat)

            idx = sum((nv > k).astype(jnp.int32) for k in rungs)
            emb, fake = jax.lax.switch(
                idx, [compact_branch(k) for k in rungs] + [full_branch], 0
            )
        else:
            emb, fake = _embed_core(params, flat)

        # distance-scale calibration: scaling embeddings scales every
        # downstream euclidean distance (gallery match, dup check,
        # clustering) into the reference's 0.3/0.4/0.6 band geometry —
        # the constant is measured on a labeled pair set
        # (tools/calibrate_embedder.py, weights/calibration.json)
        emb = jnp.where(vflat[:, None], emb * scale, 0.0)
        out = {"embeddings_flat": emb}
        if with_spoof:
            out["fake_prob"] = jnp.where(valid, fake.reshape(b, m), 0.0)
        return out

    def match_stage(emb_flat, valid, gallery, gallery_valid, tol):
        b, m = valid.shape
        match = gallery_match(
            emb_flat, gallery, gallery_valid, tolerance=tol, top_k=top_k
        )
        return {
            "embeddings": emb_flat.reshape(b, m, -1),
            "best_idx": match["best_idx"].reshape(b, m),
            "best_distance": jnp.where(
                valid, match["best_distance"].reshape(b, m), jnp.inf
            ),
            "is_match": jnp.logical_and(match["is_match"].reshape(b, m), valid),
            "topk_idx": match["topk_idx"].reshape(b, m, -1),
            "topk_distance": match["topk_distance"].reshape(b, m, -1),
        }

    def delta_stage(prev_img, idx, blocks):
        """Block-sparse temporal delta reconstruction (the device half of
        batching.DeltaEncoder): the previous I420 batch stays RESIDENT on
        device and the host ships only changed K-byte blocks — one
        vectorized scatter rebuilds the current batch bit-exactly. Padded
        slots carry idx=-1 and are remapped PAST the buffer end before the
        scatter: JAX normalizes negative indices (numpy wrap semantics)
        BEFORE the out-of-bounds check, so a raw -1 under mode="drop" would
        silently overwrite the LAST block of every frame with zeros."""
        b, r, s = prev_img.shape
        k = blocks.shape[-1]
        n = r * s
        flat = prev_img.reshape(b, n)
        safe_idx = jnp.where(idx < 0, n, idx)  # genuinely OOB -> dropped
        fi = safe_idx[:, :, None] * k + jnp.arange(k, dtype=idx.dtype)[None, None, :]

        def upd(p, f, bl):
            return p.at[f.reshape(-1)].set(bl.reshape(-1), mode="drop")

        return jax.vmap(upd)(flat, fi, blocks).reshape(b, r, s)

    def ingest_stage(yuv):
        # I420 -> RGB uint8 once; detect + crop reuse the device-resident RGB.
        # Active-rows transfer (batching.build_batch_i420 active_rows): the
        # host ships only the letterboxed content rows; pad the dead rows
        # back to the det square HERE (black — bit-identical to the host
        # letterbox pad, which encodes black as Y=16/UV=128). Shapes are
        # static per compile, so the pad widths are trace-time constants.
        rgb = yuv420_to_rgb(yuv).astype(jnp.uint8)
        rows, size = rgb.shape[1], rgb.shape[2]
        if rows < size:
            top = (size - rows) // 2
            rgb = jnp.pad(rgb, ((0, 0), (top, size - rows - top), (0, 0), (0, 0)))
        return rgb

    def pack_stage(dets, crop_out, emb_out, match_out):
        """Concatenate every per-face scalar output into ONE [B, M, 22] f32
        array (layout: PACKED_LAYOUT). The serving relay charges ~29 ms per
        host sync in its degraded mode (measured, benchmarks/
        profile_transfer.py) — fetching one packed array instead of a
        14-leaf tree turns 14 potential syncs into exactly one."""
        b, m = dets["valid"].shape
        cols = [
            dets["boxes"],                                   # 0:4
            dets["landmarks"],                               # 4:14
            dets["scores"][..., None],                       # 14
            dets["valid"].astype(jnp.float32)[..., None],    # 15
            match_out["best_idx"].astype(jnp.float32)[..., None],   # 16
            match_out["best_distance"][..., None],           # 17
            match_out["is_match"].astype(jnp.float32)[..., None],   # 18
            emb_out.get(
                "fake_prob", jnp.zeros((b, m), jnp.float32)
            )[..., None],                                    # 19
            crop_out.get(
                "quality", jnp.zeros((b, m), jnp.float32)
            )[..., None],                                    # 20
            crop_out.get(
                "blur_score", jnp.zeros((b, m), jnp.float32)
            )[..., None],                                    # 21
        ]
        return jnp.concatenate(
            [c.astype(jnp.float32) for c in cols], axis=-1
        )

    def delta_ingest_stage(prev_img, idx, blocks):
        """Fused delta-reconstruct + I420->RGB ingest: returns (new resident
        I420 batch, ingested RGB frames). One dispatch instead of two — the
        serving relay's channel is sequential across all traffic, so every
        dispatch saved is ~1.1-1.4 ms/batch off the serving floor
        (benchmarks/serving_chain_profile.json: fusing the two CHEAP pairs
        cut the realistic loop 13.8 -> 11.3 ms/batch, while big-program
        fusions — detect+crop, front/back — regressed on program size)."""
        new_prev = delta_stage(prev_img, idx, blocks)
        return new_prev, ingest_stage(new_prev)

    def match_pack_stage(dets, crop_out, emb_out, gallery, gallery_valid, tol):
        """Fused gallery match + result packing (the packed serving path's
        tail): same dispatch-count rationale as delta_ingest_stage."""
        m = match_stage(
            emb_out["embeddings_flat"], dets["valid"], gallery, gallery_valid,
            tol,
        )
        return pack_stage(dets, crop_out, emb_out, m)

    return {
        "delta": jax.jit(delta_stage),
        "ingest": jax.jit(ingest_stage),
        "detect": jax.jit(detect_stage),
        "crop": jax.jit(crop_stage),
        "embed": jax.jit(embed_stage),
        "match": jax.jit(match_stage),
        "pack": jax.jit(pack_stage),
        "delta_ingest": jax.jit(delta_ingest_stage),
        "match_pack": jax.jit(match_pack_stage),
    }


# column layout of the pack_stage output (see engine.unpack_packed)
PACKED_LAYOUT = {
    "boxes": (0, 4),
    "landmarks": (4, 14),
    "scores": (14, 15),
    "valid": (15, 16),
    "best_idx": (16, 17),
    "best_distance": (17, 18),
    "is_match": (18, 19),
    "fake_prob": (19, 20),
    "quality": (20, 21),
    "blur_score": (21, 22),
}
PACKED_WIDTH = 22


def unpack_packed(arr: np.ndarray) -> dict:
    """Host-side inverse of pack_stage: [B, M, 22] f32 -> result dict with the
    same keys/dtypes as the full-tree path (embeddings/topk excluded)."""
    arr = np.asarray(arr)
    out: dict = {}
    for key, (lo, hi) in PACKED_LAYOUT.items():
        v = arr[..., lo:hi]
        out[key] = v if hi - lo > 1 else v[..., 0]
    out["valid"] = out["valid"] > 0.5
    out["is_match"] = out["is_match"] > 0.5
    out["best_idx"] = out["best_idx"].astype(np.int32)
    out["count"] = out["valid"].sum(axis=1).astype(np.int32)
    out["best_distance"] = np.where(out["valid"], out["best_distance"], np.inf)
    return out


@dataclass
class EngineMetrics:
    """Reference-parity runtime counters (face_service.py:67-77 semantics)."""

    total_batches: int = 0
    total_frames: int = 0
    total_faces: int = 0
    total_device_time: float = 0.0

    def as_dict(self) -> dict:
        avg = self.total_device_time / max(self.total_batches, 1)
        return {
            "total_batches": self.total_batches,
            "total_frames": self.total_frames,
            "total_faces_detected": self.total_faces,
            "total_processing_time": round(self.total_device_time, 4),
            "average_batch_time": round(avg, 4),
            "frames_per_second": round(
                self.total_frames / max(self.total_device_time, 1e-9), 2
            ),
        }


class RecognitionEngine:
    """Host-facing wrapper: params + gallery + jitted pipeline + metrics.

    Thread-safe for concurrent ``process_frames`` callers (the API layer's
    camera scan and enrollment paths share one engine).
    """

    def __init__(
        self,
        cfg: Config | None = None,
        mesh=None,
        seed: int = 0,
        with_spoof: bool = True,
        allow_stale_calibration: bool = False,
    ):
        self.cfg = cfg or get_config()
        self.mesh = mesh
        self.with_spoof = with_spoof
        # tools/calibrate_embedder.py measures RAW distances (the scale is
        # divided back out), so it may build an engine while the shipped
        # calibration is stale — that is the very state it exists to fix.
        # Serving keeps the default: stale calibration refuses to start.
        self._allow_stale_calibration = allow_stale_calibration
        self.preferred_fmt = "yuv420"  # halves host->device frame bytes
        # device-resident params: a numpy pytree passed through jit would be
        # re-uploaded leaf-by-leaf on EVERY dispatch (measured ~5 ms/call on
        # v5e vs 0.2 ms with committed arrays)
        arch = getattr(self.cfg, "embedder_arch", "mobilefacenet")
        if arch.startswith("iresnet"):
            embedder = init_iresnet(seed + 1, variant=arch, embed_dim=self.cfg.embed_dim)
            self._embedder_forward = iresnet_forward
        else:
            embedder = init_mobilefacenet(seed + 1, embed_dim=self.cfg.embed_dim)
            self._embedder_forward = mobilefacenet_forward
        host_params = {
            "detector": init_retinaface(seed),
            "embedder": embedder,
            "spoof": init_mobilenetv3_small(seed + 2, num_classes=2),
        }
        self.weights_loaded = self._load_weights(host_params, arch)
        self.distance_scale = self._load_calibration()
        self.params = jax.device_put(host_params)
        self.gallery = DeviceGallery(embed_dim=self.cfg.embed_dim)
        self.metrics = EngineMetrics()
        self._lock = threading.Lock()
        self._priors = jax.device_put(generate_anchors(self.cfg.det_size))
        self._stages = build_stages(
            det_size=self.cfg.det_size,
            max_faces=self.cfg.max_faces_per_frame,
            pre_nms_topk=self.cfg.pre_nms_topk,
            conf_thresh=self.cfg.det_conf_threshold,
            nms_thresh=self.cfg.det_nms_threshold,
            iom_thresh=self.cfg.det_nms_iom_threshold,
            with_spoof=self.with_spoof,
            compute_dtype=self.cfg.compute_dtype,
            embedder_forward=self._embedder_forward,
            flip_tta=getattr(self.cfg, "embed_flip_tta", False),
        )
        # device-resident previous I420 batch for delta transfer
        # (submit_encoded); None until the first raw keyframe
        self._delta_prev = None
        # (enc_id, seq) of the payload the resident batch came from; None
        # when it came from an untagged (hand-built) payload. Used to detect
        # interleaved encoders / dropped payloads — either would otherwise
        # silently reconstruct stale pixels forever (CLAUDE.md gotcha 8c).
        self._delta_src: tuple[int, int] | None = None
        # operator-visible desync counters (served on /debug/engine)
        self.delta_stats = {"keyframes": 0, "deltas": 0, "desyncs": 0}

    def _load_calibration(self) -> float:
        """Distance-scale constant from weights_dir/calibration.json (written
        by tools/calibrate_embedder.py; 1.0 when absent). Only applied when
        trained embedder weights actually loaded — the constant is keyed to
        them."""
        import json
        import os

        emb_path = self.weights_loaded.get("embedder")
        if not emb_path:
            return 1.0
        if emb_path.endswith(".onnx"):
            # the shipped constant was measured for the in-repo trained
            # embedder; applying it to user-provided pretrained weights
            # would silently distort every distance — re-measure instead
            logger.warning(
                "embedder loaded from %s: skipping shipped distance "
                "calibration; run tools/calibrate_embedder.py to measure a "
                "scale for these weights", emb_path,
            )
            return 1.0
        # arch-keyed calibration first (calibration_iresnet18.json for the
        # iresnet18 embedder, written by calibrate_embedder.py --arch): the
        # scale is a property of one embedder's distance distribution —
        # applying mobilefacenet's constant to another family would distort
        # every distance band
        arch = getattr(self.cfg, "embedder_arch", "mobilefacenet")
        wd = os.path.dirname(emb_path)
        # mode-keyed calibration: flip-TTA changes the embedding function,
        # so its distance distribution gets its OWN artifact — applying the
        # non-flip scale to flip-averaged embeddings (or vice versa) would
        # silently shift every distance band
        flip = bool(getattr(self.cfg, "embed_flip_tta", False))
        if flip:
            names = [f"calibration_{arch}_flip.json"]
        else:
            names = [f"calibration_{arch}.json"]
            if arch == "mobilefacenet":
                names.append("calibration.json")  # the shipped default's file
        for name in names:
            try:
                with open(os.path.join(wd, name)) as f:
                    cal = json.load(f)
                scale = float(cal["distance_scale"])
            except (OSError, KeyError, ValueError, TypeError):
                continue
            if bool(cal.get("flip_tta", False)) != flip:
                # belt-and-braces with the filename keying: a hand-renamed
                # artifact must not cross modes
                continue
            # stale-calibration guard (ADVICE r4 high): the scale is keyed
            # to the exact weights it was measured on — round 4 committed a
            # retrained npz under the old calibration and every distance
            # band silently drifted. Fail loudly instead.
            for key, path in (("weights_sha256", emb_path),
                              ("detector_sha256",
                               self.weights_loaded.get("detector"))):
                expect = cal.get(key)
                if not (expect and path):
                    continue
                from frp_tpu.utils.fingerprint import weights_fingerprint

                got = weights_fingerprint(path)
                if got != expect:
                    if getattr(self, "_allow_stale_calibration", False):
                        logger.warning(
                            "%s fingerprint mismatch (%s); running "
                            "UNCALIBRATED (scale 1.0) — re-measurement mode",
                            name, key,
                        )
                        return 1.0
                    raise RuntimeError(
                        f"{name} was calibrated for {key.split('_')[0]} "
                        f"weights sha256={expect[:12]}… but {path} has "
                        f"sha256={got[:12]}…: the distance scale does not "
                        "correspond to these weights. Re-run "
                        f"tools/calibrate_embedder.py --arch {arch}"
                        f"{' --flip' if flip else ''} (and "
                        f"tools/tiered_eval.py --arch {arch}"
                        f"{' --flip' if flip else ''}) and commit "
                        "weights + artifacts together."
                    )
            return scale
        if flip or arch != "mobilefacenet":
            flag = " --flip" if flip else ""
            logger.warning(
                "no %s beside %s: distances are on the raw embedder scale "
                "(run tools/calibrate_embedder.py --arch %s%s)",
                names[0], emb_path, arch, flag,
            )
        return 1.0

    def _load_weights(self, host_params: dict, arch: str) -> dict:
        """Load trained weights from cfg.weights_dir when present (the engine
        initializes deterministically otherwise). Candidates per model:
        retinaface.npz / retinaface_synthetic.npz, {arch}.npz / embedder.npz,
        spoof.npz / mobilenetv3.npz. Returns {model: filename|None}."""
        import glob
        import os

        from frp_tpu.models.params import load_params

        loaded: dict = {}
        wd = getattr(self.cfg, "weights_dir", "weights")
        # resolve relative to the repo root as well as cwd
        roots = [wd, os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), wd)]
        # ONNX exports are user-provided pretrained weights; they must WIN
        # over the shipped synthetic-bootstrap .npz files, or dropping e.g.
        # an InsightFace export into weights/ silently does nothing
        candidates = {
            "detector": ["retinaface.onnx", "retinaface.npz",
                         "retinaface_synthetic.npz"],
            "embedder": ["embedder.onnx", f"{arch}.npz", "embedder.npz"],
            "spoof": ["spoof.onnx", "spoof.npz", "mobilenetv3.npz"],
        }

        def _load_any(path, ref_tree):
            """npz -> load_params; onnx -> structural import into a copy of
            our init tree (real pretrained weights drop in when a user
            provides e.g. an InsightFace export; models/params.py)."""
            if path.endswith(".onnx"):
                import copy

                from frp_tpu.models.params import (
                    import_onnx_graph,
                    import_onnx_weights,
                    load_onnx_graph,
                )

                graph = load_onnx_graph(path)
                if graph is None:
                    raise ValueError("unreadable/empty onnx")
                # deepcopy, NOT tree_map: tree_map sorts dict keys, which
                # breaks the construction-order walk the structural importer
                # matches by
                new = copy.deepcopy(ref_tree)
                if graph["nodes"]:
                    # real exports: map by node execution order (immune to
                    # numeric initializer names / serialization order /
                    # onnxsim BN folding)
                    import_onnx_graph(new, graph)  # raises on mismatch
                else:  # node-free tensor dumps: dotted-name structural walk
                    import_onnx_weights(new, graph["initializers"])
                return new
            return load_params(path)

        for model, names in candidates.items():
            loaded[model] = None
            for root in roots:
                for name in names:
                    path = os.path.join(root, name)
                    if not os.path.exists(path):
                        continue
                    try:
                        new = _load_any(path, host_params[model])
                        ref = jax.tree_util.tree_leaves_with_path(
                            host_params[model])
                        got = jax.tree_util.tree_leaves_with_path(new)
                        # key PATHS must match, not just shapes: two
                        # shape-identical subtrees under different names
                        # (e.g. round-2 "fpn_merge" vs "fpn_td") would
                        # otherwise load silently crossed
                        if len(ref) != len(got) or any(
                            pa != pb or np.shape(a) != np.shape(b)
                            for (pa, a), (pb, b) in zip(ref, got)
                        ):
                            raise ValueError("structure mismatch")
                        host_params[model] = new
                        loaded[model] = path
                        break  # only stop at the first SUCCESSFUL load —
                        # a corrupt retinaface.npz must still fall through
                        # to retinaface_synthetic.npz
                    except (ValueError, OSError, KeyError) as e:
                        import logging

                        logging.getLogger("frp.engine").warning(
                            "weights %s not loaded: %s", path, e
                        )
                if loaded[model]:
                    break
        # Imported ONNX checkpoints were trained under torch's symmetric k//2
        # conv padding; running them under XLA-"same" shifts every stride-2
        # grid one pixel and silently degrades accuracy (models/nn.py
        # set_padding_mode contract). An explicit CONV_PADDING always wins.
        onnx_models = [m for m, p in loaded.items() if p and p.endswith(".onnx")]
        if onnx_models and "CONV_PADDING" not in os.environ:
            from frp_tpu.models import nn

            npz_models = [m for m, p in loaded.items()
                          if p and not p.endswith(".onnx")]
            if npz_models:
                # mixed provenance: one global mode cannot fit both; keep the
                # current mode but say loudly which models are mis-padded
                logger.warning(
                    "mixed weight provenance (onnx: %s, npz: %s): conv padding "
                    "mode stays '%s'; set CONV_PADDING=torch if the onnx "
                    "models matter more, or convert all weights to one format",
                    onnx_models, npz_models, nn._PADDING_MODE,
                )
            elif nn._PADDING_MODE != "torch":
                logger.warning(
                    "onnx checkpoints loaded (%s): switching conv padding to "
                    "'torch' before first trace (override with CONV_PADDING)",
                    onnx_models,
                )
                nn.set_padding_mode("torch")
        return loaded

    # -- staged dispatch ------------------------------------------------
    def _run_stages(
        self, frames_dev, tolerance: float, fmt: str = "rgb", packed: bool = False
    ):
        """Chain the four device-resident stages; returns (device_result,
        gallery_names) — names are the snapshot positionally tied to the
        gallery arrays THIS dispatch matched against (resolve best_idx
        through them, never live state; see DeviceGallery.device_view).
        Sharded variant: when a mesh is set, the frame batch is placed with a
        'data' NamedSharding before dispatch and every stage partitions over
        it automatically (all gathers are frame-local, see build_stages)."""
        gal, gal_valid, gal_names = self.gallery.device_view()
        if fmt == "yuv420":
            frames_dev = self._stages["ingest"](frames_dev)
        dets = self._stages["detect"](
            self.params["detector"], frames_dev, self._priors
        )
        cropped = self._stages["crop"](frames_dev, dets)
        emb = self._stages["embed"](
            {"embedder": self.params["embedder"], "spoof": self.params["spoof"]},
            cropped["crops"],
            dets["valid"],
            self.distance_scale,
        )
        if packed:
            # one [B, M, 22] array -> a batch fetch costs exactly ONE host
            # sync through the relay (see pack_stage docstring); match+pack
            # ride ONE fused dispatch (see match_pack_stage: the relay
            # channel charges per dispatch)
            return self._stages["match_pack"](
                dets, cropped, emb, gal, gal_valid, float(tolerance)
            ), gal_names
        matched = self._stages["match"](
            emb["embeddings_flat"], dets["valid"], gal, gal_valid,
            float(tolerance),  # python float: traced weak scalar, no eager op
        )
        out = {
            "boxes": dets["boxes"],
            "scores": dets["scores"],
            "landmarks": dets["landmarks"],
            "valid": dets["valid"],
            "count": dets["count"],
            **{k: v for k, v in cropped.items() if k != "crops"},
            **{k: v for k, v in emb.items() if k != "embeddings_flat"},
            **matched,
        }
        return out, gal_names

    # -- main entry ---------------------------------------------------------
    def process_frames(
        self,
        frames: np.ndarray,
        tolerance: float | None = None,
        fmt: str = "rgb",
        record_metrics: bool = True,
    ):
        """frames: [B, H, W, 3] uint8 RGB, or [B, H*3//2, W] uint8 I420 with
        fmt="yuv420" (halves host->device traffic; see ops.image.yuv420_to_rgb).
        Returns host-side result dict of numpy arrays (padded shapes + masks)."""
        tolerance = self.cfg.face_tolerance if tolerance is None else tolerance
        frames = np.ascontiguousarray(frames, dtype=np.uint8)
        if frames.ndim == 3 and fmt == "rgb":
            frames = frames[None]
        b = frames.shape[0]
        t0 = time.perf_counter()
        frames_dev = self._put_frames(frames)
        out, gal_names = self._run_stages(frames_dev, tolerance, fmt)
        # ONE batched fetch: per-leaf np.asarray costs a full host round-trip
        # per array (measured ~1 s/leaf through the TPU relay vs 0.1 ms for
        # a single device_get of the whole tree)
        out = jax.device_get(out)
        out["gallery_names"] = gal_names
        dt = time.perf_counter() - t0
        if record_metrics:
            with self._lock:
                self.metrics.total_batches += 1
                self.metrics.total_frames += b
                self.metrics.total_faces += int(out["count"].sum())
                self.metrics.total_device_time += dt
        out["processing_time"] = dt
        return out

    # -- convenience: single image encode (enrollment path) -----------------
    def encode_image(self, image: np.ndarray):
        """Detect + embed a single RGB image of ANY geometry. Returns list of
        face dicts (embedding, box, landmarks, quality, score) with box/
        landmark coordinates in ORIGINAL image pixels — the engine-side half
        of the reference's ``encode_face`` (face_service.py:87-219).

        Non-det-square images are letterboxed on the HOST to the one
        canonical [1, S, S, 3] geometry: otherwise every unique upload
        resolution traces a fresh program set (5-40 s remote compile per new
        phone-photo size, CLAUDE.md gotcha 9) and rides an on-device resize
        the distance calibration was never measured on."""
        size = self.cfg.det_size
        h, w = image.shape[:2]
        scale, off = 1.0, (0.0, 0.0)
        if (h, w) != (size, size):
            from frp_tpu.engine.batching import letterbox

            image, scale, off = letterbox(np.ascontiguousarray(image), size)
        out = self.process_frames(image[None])
        if scale != 1.0 or off != (0.0, 0.0):
            ox, oy = off
            off4 = np.array([ox, oy, ox, oy], np.float32)
            off10 = np.tile(np.array([ox, oy], np.float32), 5)
            out["boxes"] = np.clip(
                (out["boxes"] - off4) / scale, 0, [w, h, w, h]
            )
            out["landmarks"] = (out["landmarks"] - off10) / scale
        faces = []
        for i in range(out["valid"].shape[1]):
            if not out["valid"][0, i]:
                continue
            faces.append(
                {
                    "embedding": out["embeddings"][0, i],
                    "box": out["boxes"][0, i],
                    "landmarks": out["landmarks"][0, i],
                    "score": float(out["scores"][0, i]),
                    "quality": float(out["quality"][0, i]) if "quality" in out else 0.0,
                    "fake_prob": float(out["fake_prob"][0, i])
                    if "fake_prob" in out
                    else None,
                }
            )
        return faces

    def _put_frames(self, frames: np.ndarray):
        if self.mesh is not None:
            return jax.device_put(frames, NamedSharding(self.mesh, P("data")))
        return jnp.asarray(frames)

    def warmup(self, batch: int, h: int | None = None, w: int | None = None):
        """Pre-compile for a frame geometry (startup, not first-request)."""
        h = h or self.cfg.det_size
        w = w or self.cfg.det_size
        dummy = np.zeros((batch, h, w, 3), np.uint8)
        # compile time (minutes cold) must not pollute the served throughput
        # counters (reference parity metrics count processing, not tracing)
        self.process_frames(dummy, record_metrics=False)

    # -- async submission (overlaps h2d transfer + compute across batches) ---
    def submit(
        self,
        frames: np.ndarray,
        tolerance: float | None = None,
        fmt: str = "rgb",
        packed: bool = True,
    ):
        """Dispatch a batch without blocking; returns a handle for fetch().
        Used by the camera scan loop and bench to pipeline h2d transfer and
        device compute across consecutive batches. With ``packed=True``
        (default) the result rides back as one [B, M, 22] array — one host
        sync per fetch instead of one per tree leaf (the serving relay's
        degraded mode charges ~29 ms/sync; benchmarks/profile_transfer.py).
        Pass packed=False when embeddings/topk are needed (enrollment)."""
        tolerance = self.cfg.face_tolerance if tolerance is None else tolerance
        frames = np.ascontiguousarray(frames, dtype=np.uint8)
        if frames.ndim == 3 and fmt == "rgb":
            frames = frames[None]
        b = frames.shape[0]
        out, gal_names = self._run_stages(
            self._put_frames(frames), tolerance, fmt, packed
        )
        return out, b, packed, gal_names, time.perf_counter()

    def submit_encoded(
        self,
        enc,
        tolerance: float | None = None,
        packed: bool = True,
    ):
        """Submit a DeltaEncoder.encode() payload (I420 temporal delta
        transfer). "raw" keyframes upload the full batch and refresh the
        device-resident previous batch; "delta" payloads ship only changed
        blocks and reconstruct on device (bit-exact, engine delta stage) —
        the host->device wire is the serving bottleneck (~57 MB/s relay,
        CLAUDE.md gotcha 8b), so static surveillance backgrounds stop being
        re-shipped every scan. Returns a fetch()/fetch_many() handle."""
        tolerance = self.cfg.face_tolerance if tolerance is None else tolerance
        tag = (
            (enc.enc_id, enc.seq)
            if hasattr(enc, "enc_id") and hasattr(enc, "seq")
            else None
        )
        if enc[0] == "raw":
            if isinstance(enc[1], jax.Array):
                # pre-transferred by put_payload (a caller's transfer
                # thread); device arrays are immutable, no copy concern
                frames_dev = enc[1]
            else:
                # COPY, not ascontiguousarray: the result is retained as
                # _delta_prev, and jax.device_put on the CPU backend ALIASES
                # numpy memory — callers with persistent batch buffers
                # (batching.build_batch_i420_cached, the bench producer)
                # mutate them after submit, which would silently corrupt the
                # resident keyframe every delta reconstructs against.
                # Keyframes are rare; the copy is ~2.8 MB.
                frames_dev = self._put_frames(
                    np.array(enc[1], dtype=np.uint8, copy=True)
                )
            self.delta_stats["keyframes"] += 1
        else:
            _, idx, blocks = enc
            if self._delta_prev is None:
                raise RuntimeError(
                    "delta payload before any raw keyframe (encoder/engine "
                    "state out of sync — call DeltaEncoder.reset())"
                )
            # enforce the single-encoder invariant: a tagged delta must
            # continue the exact payload stream the resident batch came from
            # (same encoder, consecutive sequence). A mismatch means a second
            # encoder interleaved or a payload was dropped — reconstructing
            # anyway would silently serve stale pixels.
            if tag is not None and self._delta_src is not None:
                want_id, want_seq = self._delta_src
                if tag[0] != want_id or tag[1] != want_seq + 1:
                    self.delta_stats["desyncs"] += 1
                    raise RuntimeError(
                        f"delta payload desync: engine resident batch is from "
                        f"encoder {want_id} seq {want_seq}, payload is from "
                        f"encoder {tag[0]} seq {tag[1]} (expected seq "
                        f"{want_seq + 1}). Reset the encoder; the next encode "
                        "ships a raw keyframe."
                    )
            if self.mesh is not None:
                sh = NamedSharding(self.mesh, P("data"))
                # jax.Array inputs (put_payload) re-shard without a host
                # round-trip; ascontiguousarray on one would FETCH it
                if not isinstance(idx, jax.Array):
                    idx = np.ascontiguousarray(idx)
                if not isinstance(blocks, jax.Array):
                    blocks = np.ascontiguousarray(blocks)
                idx = jax.device_put(idx, sh)
                blocks = jax.device_put(blocks, sh)
            # fused reconstruct + ingest: one dispatch returns BOTH the new
            # resident I420 batch and the ingested RGB frames (the relay
            # channel charges per dispatch; see delta_ingest_stage)
            new_prev, rgb_dev = self._stages["delta_ingest"](
                self._delta_prev, idx, blocks
            )
            self.delta_stats["deltas"] += 1
            self._delta_prev = new_prev
            if tag is not None:
                self._delta_src = tag
            b = int(rgb_dev.shape[0])
            # frames are already ingested RGB — fmt "rgb" skips the ingest
            # stage in _run_stages
            out, gal_names = self._run_stages(rgb_dev, tolerance, "rgb", packed)
            return out, b, packed, gal_names, time.perf_counter()
        self._delta_prev = frames_dev
        if tag is not None:
            self._delta_src = tag
        # untagged payloads (precompile no-ops, hand-built tests) opt out of
        # validation and are content-preserving by contract — keep the live
        # chain's (enc_id, seq) so the guard survives a warmup precompile
        # running mid-stream (it would otherwise silently disarm for the
        # next tagged delta)
        b = int(frames_dev.shape[0])
        out, gal_names = self._run_stages(frames_dev, tolerance, "yuv420", packed)
        return out, b, packed, gal_names, time.perf_counter()

    def put_payload(self, enc):
        """Pre-transfer a DeltaEncoder payload's arrays to device, preserving
        the (enc_id, seq) tag. Returns a payload submit_encoded accepts.

        Why: through the serving relay the h2d upload of a delta payload
        costs ~7.7 ms at ~47 MB/s and runs synchronously inside the jit
        dispatch — on the main submit thread it serializes with dispatch and
        producer work (benchmarks/gil_profile.json). Calling this from a
        dedicated transfer thread moves that mostly-GIL-free socket wait off
        the submit path so it overlaps host prep + dispatch (bench.py's
        3-stage producer). Order still matters: payloads must reach
        submit_encoded in encode order (the seq guard enforces it)."""
        from frp_tpu.engine.batching import DeltaPayload

        tag = (
            (enc.enc_id, enc.seq)
            if hasattr(enc, "enc_id") and hasattr(enc, "seq")
            else None
        )
        if enc[0] == "raw":
            if isinstance(enc[1], jax.Array):
                return enc
            # same copy contract as submit_encoded's raw path (the array is
            # retained as the resident keyframe; CPU-backend device_put
            # aliases numpy memory)
            data = ("raw", self._put_frames(
                np.array(enc[1], dtype=np.uint8, copy=True)))
        else:
            _, idx, blocks = enc
            if self.mesh is not None:
                sh = NamedSharding(self.mesh, P("data"))
                idx = jax.device_put(np.ascontiguousarray(idx), sh)
                blocks = jax.device_put(np.ascontiguousarray(blocks), sh)
            else:
                idx = jax.device_put(np.ascontiguousarray(idx))
                blocks = jax.device_put(np.ascontiguousarray(blocks))
            data = ("delta", idx, blocks)
        return DeltaPayload(data, *tag) if tag is not None else data

    def precompile_delta_rungs(self, block: int | None = None) -> int:
        """Compile the delta-reconstruction stage at every DeltaEncoder
        ladder rung for the resident batch shape, using all-padding no-op
        payloads (idx=-1: reconstructs the resident batch bit-exactly).

        Without this the serving process compiles each rung lazily on its
        first live hit — a 5-40 s remote compile (CLAUDE.md gotcha 9) taken
        while holding the scan mutex, stalling the scan loop and any
        /camera/alerts request (advisor r3). Requires a prior raw keyframe
        through submit_encoded to establish the shape; returns the number of
        rungs compiled (0 when there is no resident batch or the shape does
        not block-align)."""
        if self._delta_prev is None or "delta" not in self._stages:
            return 0
        from frp_tpu.engine.batching import DeltaEncoder

        shape = self._delta_prev.shape
        b = int(shape[0])
        nbytes = int(np.prod(shape[1:]))
        block = block or int(_os.getenv("FRP_DELTA_BLOCK", "128"))
        if b == 0 or nbytes % block:
            return 0
        nblocks = nbytes // block
        done = 0
        for denom in DeltaEncoder.LADDER:
            cap = nblocks // denom
            if cap == 0:
                continue
            idx = np.full((b, cap), -1, np.int32)
            blocks = np.zeros((b, cap, block), np.uint8)
            self.fetch(self.submit_encoded(("delta", idx, blocks)))
            done += 1
        return done

    def fetch(self, handle):
        """Block on a submit() handle and return host-side results."""
        out, b, packed, gal_names, t_submit = handle
        out = unpack_packed(jax.device_get(out)) if packed else jax.device_get(out)
        out["gallery_names"] = gal_names
        with self._lock:
            self.metrics.total_batches += 1
            self.metrics.total_frames += b
            self.metrics.total_faces += int(out["count"].sum())
            # submit->fetch wall time: without it the pipelined path reported
            # total_frames over ~0 seconds (absurd fps in /metrics outputs)
            self.metrics.total_device_time += time.perf_counter() - t_submit
        return out

    def fetch_many(self, handles: list):
        """Fetch a GROUP of submit() handles with a single jax.device_get —
        the relay charges per sync, not per byte, for small results, so
        draining k batches together costs one sync instead of k. Returns a
        list of host-side result dicts in submission order."""
        devs = [h[0] for h in handles]
        got = jax.device_get(devs)
        now = time.perf_counter()
        outs = []
        for (_, b, packed, gal_names, t_submit), g in zip(handles, got):
            out = unpack_packed(g) if packed else g
            out["gallery_names"] = gal_names
            with self._lock:
                self.metrics.total_batches += 1
                self.metrics.total_frames += b
                self.metrics.total_faces += int(out["count"].sum())
                self.metrics.total_device_time += max(0.0, now - t_submit)
            outs.append(out)
        return outs
