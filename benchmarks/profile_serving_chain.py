"""Realistic serving-loop cost of dispatch-fusion variants (round 4).

The floor model assembled from gil_profile.json + dispatch_profile.json:
the relay channel is SEQUENTIAL across all traffic, so per batch
  floor ~= n_dispatches * per_dispatch_channel_ms
         + payload_h2d_ms (~7.7 at the bench's 0.36 MB)
         + amortized fetch
which lands exactly on the measured 17.6-18.5 ms bench floor with the
current 7-dispatch delta chain. profile_dispatch.py's front/back fusion
was a wash because BIG fused programs pay a per-dispatch size penalty —
this profiler tests fusing only the CHEAP stages, in the realistic loop
(payload h2d every iteration, grouped fetches), which the isolated
per-stage numbers provably do not predict.

Variants (delta serving mode):
  v7: delta | ingest | detect | crop | embed | match | pack   (current)
  v6: delta+ingest | detect | crop | embed | match | pack
  v5: delta+ingest | detect | crop | embed | match+pack
  v4: delta+ingest | detect+crop | embed | match+pack
  v2: delta+ingest+detect+crop | embed+match+pack

Run on the TPU host: python benchmarks/profile_serving_chain.py
Prints one JSON document; save as benchmarks/serving_chain_profile.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = int(os.getenv("FRP_PROFILE_REPS", "96"))
GROUP = int(os.getenv("FRP_PROFILE_GROUP", "12"))
DET = int(os.getenv("FRP_PROFILE_DET", "640"))
BATCH = 8


def main():
    import jax
    import jax.numpy as jnp

    from frp_tpu.config import load_config
    from frp_tpu.engine.batching import DeltaEncoder, active_rows_for
    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.train.synthetic import make_scene

    cfg = load_config(det_size=DET, max_faces_per_frame=16,
                      frames_per_batch=BATCH)
    eng = RecognitionEngine(cfg)
    rng = np.random.default_rng(0)
    for i in range(100):
        eng.gallery.add(f"p{i}", rng.normal(size=cfg.embed_dim))

    report: dict = {"batch": BATCH, "det_size": cfg.det_size,
                    "backend": jax.default_backend(), "reps": REPS,
                    "group": GROUP}

    frames = np.stack([
        np.asarray(make_scene(cfg.det_size, np.random.default_rng(50 + i),
                              max_faces=12)[0])
        for i in range(BATCH)
    ]).astype(np.uint8)
    rows = active_rows_for([(1080, 1920)] * BATCH, cfg.det_size) or cfg.det_size
    yuv = np.random.default_rng(1).integers(
        0, 255, (BATCH, rows * 3 // 2, cfg.det_size), np.uint8)

    # flip the process first (serving reality)
    out = eng.fetch(eng.submit(frames, fmt="rgb"))
    report["occupancy"] = int(out["count"].sum())

    # bench-sized delta payload (~0.36 MB)
    enc = DeltaEncoder(block_bytes=128)
    enc.encode(yuv)
    yuv2 = yuv.copy()
    yuv2[:, 40:80, :] ^= 255
    e = enc.encode(yuv2)
    assert e[0] == "delta"
    idx_np, blocks_np = np.asarray(e[1]), np.asarray(e[2])
    report["payload_mb"] = round((idx_np.nbytes + blocks_np.nbytes) / 1e6, 3)

    st = eng._stages
    dparams = eng.params["detector"]
    eparams = {"embedder": eng.params["embedder"], "spoof": eng.params["spoof"]}
    gal, gal_valid, _ = eng.gallery.device_view()
    scale = jnp.float32(eng.distance_scale)
    tol = jnp.float32(cfg.face_tolerance)
    prev0 = jax.device_put(yuv)

    # ---- fused building blocks (reusing the stage closures' math) ----
    def delta_ingest(prev, idx, blocks):
        new_prev = st["delta"].__wrapped__(prev, idx, blocks)
        return new_prev, st["ingest"].__wrapped__(new_prev)

    def match_pack(dets, crop_out, emb_out, g, g_valid, t_):
        m = st["match"].__wrapped__(
            emb_out["embeddings_flat"], dets["valid"], g, g_valid, t_)
        return st["pack"].__wrapped__(dets, crop_out, emb_out, m)

    def detect_crop(dp, fr, priors):
        d = st["detect"].__wrapped__(dp, fr, priors)
        return d, st["crop"].__wrapped__(fr, d)

    def front(dp, prev, idx, blocks, priors):
        new_prev, fr = delta_ingest(prev, idx, blocks)
        d, c = detect_crop(dp, fr, priors)
        return new_prev, d, c

    def back(ep, d, c, g, g_valid, s_, t_):
        e_ = st["embed"].__wrapped__(ep, c["crops"], d["valid"], s_)
        return match_pack(d, c, e_, g, g_valid, t_)

    j_delta_ingest = jax.jit(delta_ingest)
    j_match_pack = jax.jit(match_pack)
    j_detect_crop = jax.jit(detect_crop)
    j_front = jax.jit(front)
    j_back = jax.jit(back)

    def v7(prev, idx, blocks):
        new_prev = st["delta"](prev, idx, blocks)
        fr = st["ingest"](new_prev)
        d = st["detect"](dparams, fr, eng._priors)
        c = st["crop"](fr, d)
        e_ = st["embed"](eparams, c["crops"], d["valid"], scale)
        m = st["match"](e_["embeddings_flat"], d["valid"], gal, gal_valid, tol)
        return new_prev, st["pack"](d, c, e_, m)

    def v6(prev, idx, blocks):
        new_prev, fr = j_delta_ingest(prev, idx, blocks)
        d = st["detect"](dparams, fr, eng._priors)
        c = st["crop"](fr, d)
        e_ = st["embed"](eparams, c["crops"], d["valid"], scale)
        m = st["match"](e_["embeddings_flat"], d["valid"], gal, gal_valid, tol)
        return new_prev, st["pack"](d, c, e_, m)

    def v5(prev, idx, blocks):
        new_prev, fr = j_delta_ingest(prev, idx, blocks)
        d = st["detect"](dparams, fr, eng._priors)
        c = st["crop"](fr, d)
        e_ = st["embed"](eparams, c["crops"], d["valid"], scale)
        return new_prev, j_match_pack(d, c, e_, gal, gal_valid, tol)

    def v4(prev, idx, blocks):
        new_prev, fr = j_delta_ingest(prev, idx, blocks)
        d, c = j_detect_crop(dparams, fr, eng._priors)
        e_ = st["embed"](eparams, c["crops"], d["valid"], scale)
        return new_prev, j_match_pack(d, c, e_, gal, gal_valid, tol)

    def v2(prev, idx, blocks):
        new_prev, d, c = j_front(dparams, prev, idx, blocks, eng._priors)
        return new_prev, j_back(eparams, d, c, gal, gal_valid, scale, tol)

    def crop_embed(fr, d, ep, s_):
        c = st["crop"].__wrapped__(fr, d)
        e_ = st["embed"].__wrapped__(ep, c["crops"], d["valid"], s_)
        return c, e_

    def embed_match_pack(ep, d, c, g, g_valid, s_, t_):
        e_ = st["embed"].__wrapped__(ep, c["crops"], d["valid"], s_)
        return match_pack(d, c, e_, g, g_valid, t_)

    j_crop_embed = jax.jit(crop_embed)
    j_embed_match_pack = jax.jit(embed_match_pack)

    def v4b(prev, idx, blocks):
        new_prev, fr = j_delta_ingest(prev, idx, blocks)
        d = st["detect"](dparams, fr, eng._priors)
        c, e_ = j_crop_embed(fr, d, eparams, scale)
        return new_prev, j_match_pack(d, c, e_, gal, gal_valid, tol)

    def v4c(prev, idx, blocks):
        new_prev, fr = j_delta_ingest(prev, idx, blocks)
        d = st["detect"](dparams, fr, eng._priors)
        c = st["crop"](fr, d)
        return new_prev, j_embed_match_pack(
            eparams, d, c, gal, gal_valid, scale, tol)

    variants = {"v7_current": v7, "v6_dingest": v6, "v5_dingest_mpack": v5,
                "v4_also_detcrop": v4, "v2_front_back": v2,
                "v4b_cropembed": v4b, "v4c_embmpack": v4c}
    only = os.getenv("FRP_PROFILE_VARIANTS")
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only.split(",")}

    for name, fn in variants.items():
        # compile
        t0 = time.perf_counter()
        prev, packed = fn(prev0, idx_np, blocks_np)
        jax.block_until_ready(packed)
        compile_s = round(time.perf_counter() - t0, 1)

        # realistic loop: payload h2d each iteration, grouped fetch
        prev = prev0
        pend = []
        t0 = time.perf_counter()
        for k in range(REPS):
            ip = jax.device_put(idx_np)
            bp = jax.device_put(blocks_np)
            prev, packed = fn(prev, ip, bp)
            pend.append(packed)
            if len(pend) >= GROUP:
                jax.device_get(pend)
                pend = []
        if pend:
            jax.device_get(pend)
        ms = round((time.perf_counter() - t0) / REPS * 1000, 3)
        report[name] = {"compile_s": compile_s, "ms_per_batch": ms}
        print(f"{name}: {ms} ms/batch (compile {compile_s}s)",
              file=sys.stderr, flush=True)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
