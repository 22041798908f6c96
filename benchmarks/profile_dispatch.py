"""Dispatch-cost anatomy of the serving pipeline in the relay's degraded
dispatch mode (round 4).

Motivation: benchmarks/stage_profile.json showed per-stage times of
0.25-0.5 ms when measured BEFORE the process's first device->host fetch,
but 2.4-3.3 ms for the same embed program AFTER it — i.e. once the process
flips into the relay's degraded dispatch mode (CLAUDE.md gotchas #3/#4),
per-dispatch HOST cost dominates per-stage device compute. The serving
pipeline chains 7 resident programs per batch (delta, ingest, detect, crop,
embed, match, pack); if the degraded cost is ~flat per dispatch, that is
7 x ~2.5 ms = ~17.5 ms/batch of main-thread host time — exactly the gap
between the isolated producer (4.5 ms, benchmarks/hostprep_profile.json)
and the measured bench wall (18.7 ms, BENCH r4 first capture).

Everything here is measured AFTER deliberately flipping the process:
 - a tiny no-op program            -> the per-dispatch floor
 - each of the 7 stage programs   -> does cost scale with program size?
 - the current 6/7-dispatch chain -> serving reality
 - fused candidates:
     front = ingest+detect+crop        (one dispatch)
     back  = embed+match+pack          (one dispatch)
     mono  = ingest..pack in ONE program, compaction OFF to bound size
 - one device_get of the packed result -> the per-group fetch sync cost

Decision rules: flat per-dispatch cost => fuse stages (fewer dispatches);
mono >> front+back => the ~8 MB program-cache cliff (build_stages
docstring) still binds and two programs is the optimum.

Run on the TPU host: python benchmarks/profile_dispatch.py
Prints one JSON document; save as benchmarks/dispatch_profile.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = int(os.getenv("FRP_PROFILE_REPS", "30"))
DET = int(os.getenv("FRP_PROFILE_DET", "640"))
BATCH = 8


def _amortized_ms(fn, *args, reps=REPS):
    """Back-to-back dispatches, ONE final sync: measures max(per-dispatch
    host cost, device time) — the quantity that gates a pipelined producer."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / reps * 1000, 3)


def main():
    import jax
    import jax.numpy as jnp

    from frp_tpu.config import load_config
    from frp_tpu.engine.batching import DeltaEncoder, active_rows_for
    from frp_tpu.engine.pipeline import RecognitionEngine, build_stages
    from frp_tpu.train.synthetic import make_scene

    cfg = load_config(det_size=DET, max_faces_per_frame=16,
                      frames_per_batch=BATCH)
    eng = RecognitionEngine(cfg)
    rng = np.random.default_rng(0)
    for i in range(100):
        eng.gallery.add(f"p{i}", rng.normal(size=cfg.embed_dim))

    report: dict = {"batch": BATCH, "det_size": cfg.det_size,
                    "backend": jax.default_backend(), "reps": REPS}

    # production-shaped inputs: RGB frames at det size (content matters only
    # for occupancy, not dispatch cost) and the serving path's I420
    # active-rows batch (368 rows at det 640, 16:9 — bench.py geometry)
    frames = np.stack([
        np.asarray(make_scene(cfg.det_size, np.random.default_rng(50 + i),
                              max_faces=12)[0])
        for i in range(BATCH)
    ]).astype(np.uint8)
    rows = active_rows_for([(1080, 1920)] * BATCH, cfg.det_size) or cfg.det_size
    yuv = np.random.default_rng(1).integers(
        0, 255, (BATCH, rows * 3 // 2, cfg.det_size), np.uint8)

    # ---- flip the process into the degraded dispatch mode FIRST ----
    t0 = time.perf_counter()
    out = eng.fetch(eng.submit(frames, fmt="rgb"))
    report["first_roundtrip_s"] = round(time.perf_counter() - t0, 1)
    report["occupancy"] = int(out["count"].sum())

    st = eng._stages
    frames_dev = jax.device_put(frames)
    yuv_dev = jax.device_put(yuv)

    # delta payload at a realistic rung: mutate ~10% of rows, hintless encode
    enc = DeltaEncoder(block_bytes=128)
    enc.encode(yuv)
    yuv2 = yuv.copy()
    yuv2[:, 40:80, :] ^= 255
    e = enc.encode(yuv2)
    assert e[0] == "delta", e[0]
    idx_dev, blocks_dev = jax.device_put(e[1]), jax.device_put(e[2])

    # intermediates for per-stage timing
    dets = st["detect"](eng.params["detector"], frames_dev, eng._priors)
    cropped = st["crop"](frames_dev, dets)
    emb_params = {"embedder": eng.params["embedder"],
                  "spoof": eng.params["spoof"]}
    emb = st["embed"](emb_params, cropped["crops"], dets["valid"],
                      eng.distance_scale)
    gal, gal_valid, _ = eng.gallery.device_view()
    matched = st["match"](emb["embeddings_flat"], dets["valid"], gal,
                          gal_valid, jnp.float32(cfg.face_tolerance))
    packed = st["pack"](dets, cropped, emb, matched)
    jax.block_until_ready(packed)

    tiny = jax.jit(lambda x: x + 1)
    xs = jax.device_put(np.ones((8, 8), np.float32))

    stages_ms = {
        "tiny_noop": _amortized_ms(tiny, xs),
        "delta": _amortized_ms(st["delta"], yuv_dev, idx_dev, blocks_dev),
        "ingest": _amortized_ms(st["ingest"], yuv_dev),
        "detect": _amortized_ms(st["detect"], eng.params["detector"],
                                frames_dev, eng._priors),
        "crop": _amortized_ms(st["crop"], frames_dev, dets),
        "embed": _amortized_ms(st["embed"], emb_params, cropped["crops"],
                               dets["valid"], eng.distance_scale),
        "match": _amortized_ms(st["match"], emb["embeddings_flat"],
                               dets["valid"], gal, gal_valid,
                               jnp.float32(cfg.face_tolerance)),
        "pack": _amortized_ms(st["pack"], dets, cropped, emb, matched),
    }
    report["per_dispatch_ms"] = stages_ms
    report["chain_sum_ms"] = round(
        sum(v for k, v in stages_ms.items() if k not in ("tiny_noop",)), 3)

    # current serving chain (ingest..pack, 6 dispatches) amortized
    def chain(yuv_in):
        o, _ = eng._run_stages(yuv_in, cfg.face_tolerance, "yuv420", True)
        return o
    report["run_stages_yuv_ms"] = _amortized_ms(chain, yuv_dev)

    # ---- fused candidates ----
    def front_fn(dparams, yuv_in, priors):
        fr = st["ingest"](yuv_in)
        d = st["detect"](dparams, fr, priors)
        return d, st["crop"](fr, d)

    def back_fn(eparams, d, crop_out, g, g_valid, scale, tol):
        e_ = st["embed"](eparams, crop_out["crops"], d["valid"], scale)
        m_ = st["match"](e_["embeddings_flat"], d["valid"], g, g_valid, tol)
        return st["pack"](d, crop_out, e_, m_)

    front = jax.jit(front_fn)
    back = jax.jit(back_fn)

    t0 = time.perf_counter()
    fd, fc = front(eng.params["detector"], yuv_dev, eng._priors)
    jax.block_until_ready(fc)
    report["front_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    bp = back(emb_params, fd, fc, gal, gal_valid,
              jnp.float32(eng.distance_scale), jnp.float32(cfg.face_tolerance))
    jax.block_until_ready(bp)
    report["back_compile_s"] = round(time.perf_counter() - t0, 1)

    report["front_ms"] = _amortized_ms(front, eng.params["detector"], yuv_dev,
                                       eng._priors)
    report["back_ms"] = _amortized_ms(
        back, emb_params, fd, fc, gal, gal_valid,
        jnp.float32(eng.distance_scale), jnp.float32(cfg.face_tolerance))

    def two_fn(yuv_in):
        d, c = front(eng.params["detector"], yuv_in, eng._priors)
        return back(emb_params, d, c, gal, gal_valid,
                    jnp.float32(eng.distance_scale),
                    jnp.float32(cfg.face_tolerance))
    report["front_back_chain_ms"] = _amortized_ms(two_fn, yuv_dev)

    # mono: the whole pipeline as ONE program, compaction off (program size)
    os.environ["FRP_EMBED_COMPACT"] = "0"
    try:
        st_nc = build_stages(
            det_size=cfg.det_size,
            max_faces=cfg.max_faces_per_frame,
            pre_nms_topk=cfg.pre_nms_topk,
            conf_thresh=cfg.det_conf_threshold,
            nms_thresh=cfg.det_nms_threshold,
            iom_thresh=cfg.det_nms_iom_threshold,
            with_spoof=True,
            compute_dtype=cfg.compute_dtype,
            embedder_forward=eng._embedder_forward,
        )
    finally:
        os.environ.pop("FRP_EMBED_COMPACT", None)

    def mono_fn(params, yuv_in, priors, g, g_valid, scale, tol):
        fr = st_nc["ingest"](yuv_in)
        d = st_nc["detect"](params["detector"], fr, priors)
        c = st_nc["crop"](fr, d)
        e_ = st_nc["embed"]({"embedder": params["embedder"],
                             "spoof": params["spoof"]},
                            c["crops"], d["valid"], scale)
        m_ = st_nc["match"](e_["embeddings_flat"], d["valid"], g, g_valid, tol)
        return st_nc["pack"](d, c, e_, m_)

    mono = jax.jit(mono_fn)
    t0 = time.perf_counter()
    mp = mono(eng.params, yuv_dev, eng._priors, gal, gal_valid,
              jnp.float32(eng.distance_scale), jnp.float32(cfg.face_tolerance))
    jax.block_until_ready(mp)
    report["mono_compile_s"] = round(time.perf_counter() - t0, 1)
    report["mono_ms"] = _amortized_ms(
        mono, eng.params, yuv_dev, eng._priors, gal, gal_valid,
        jnp.float32(eng.distance_scale), jnp.float32(cfg.face_tolerance))

    # fetch sync cost (per group fetch in the bench/serving loop)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(packed)
    report["device_get_packed_ms"] = round(
        (time.perf_counter() - t0) / 10 * 1000, 3)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
