"""Per-stage device time + MFU at production shapes, plus two targeted
experiments on the measured bottleneck (VERDICT r3 #3: device compute is
now the lever — mfu_device 0.049, ~9.1 of ~12 ms/batch is device time):

1. embed-stage valid-slot compaction win: times the embed stage at each
   occupancy regime so the rung ladder's effect is measured, not assumed;
2. space-to-depth stem: a Conv(3x3, s2) on [S, S, 3] is exactly a
   Conv(2x2, s1) on the 2x2 space-to-depth rearrangement [S/2, S/2, 12]
   (the 3x3 window at even offsets fits inside a 2x2 block window) — the
   rearranged form feeds the MXU a 12-channel dense conv instead of a
   3-channel one. This times both at the detector stem's shape to decide
   whether restructuring the stem is worth a retrain.

Run on the TPU host: python benchmarks/profile_stages.py
Prints one JSON document; save it as the profile artifact for the round.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.getenv("FRP_PROFILE_BATCH", "8"))
DET = int(os.getenv("FRP_PROFILE_DET", "640"))  # small value = CPU smoke
REPS = int(os.getenv("FRP_PROFILE_REPS", "30"))


def _time_dispatch(fn, *args, reps=REPS):
    """Amortized per-dispatch seconds: back-to-back dispatches, ONE final
    sync (the relay charges ~29 ms per host sync in degraded mode)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from frp_tpu.config import load_config
    from frp_tpu.engine.pipeline import RecognitionEngine, embed_compact_rungs
    from frp_tpu.train.synthetic import make_scene
    from frp_tpu.utils.flops import PEAK_FLOPS_BF16, engine_stage_flops

    cfg = load_config(det_size=DET, max_faces_per_frame=16,
                      frames_per_batch=BATCH)
    eng = RecognitionEngine(cfg)
    rng = np.random.default_rng(0)
    for i in range(100):
        eng.gallery.add(f"p{i}", rng.normal(size=cfg.embed_dim))

    frames = np.stack([
        np.asarray(make_scene(cfg.det_size, np.random.default_rng(50 + i),
                              max_faces=12)[0])
        for i in range(BATCH)
    ]).astype(np.uint8)
    frames_dev = eng._put_frames(frames)
    report: dict = {"batch": BATCH, "det_size": cfg.det_size,
                    "backend": jax.default_backend()}

    # --- per-stage dispatch time ---
    dets = eng._stages["detect"](eng.params["detector"], frames_dev,
                                 eng._priors)
    cropped = eng._stages["crop"](frames_dev, dets)
    emb_params = {"embedder": eng.params["embedder"],
                  "spoof": eng.params["spoof"]}
    gal, gal_valid, _ = eng.gallery.device_view()
    emb = eng._stages["embed"](emb_params, cropped["crops"], dets["valid"],
                               eng.distance_scale)
    stage_s = {
        "detect": _time_dispatch(
            eng._stages["detect"], eng.params["detector"], frames_dev,
            eng._priors),
        "crop": _time_dispatch(eng._stages["crop"], frames_dev, dets),
        "embed": _time_dispatch(
            eng._stages["embed"], emb_params, cropped["crops"],
            dets["valid"], eng.distance_scale),
        "match": _time_dispatch(
            eng._stages["match"], emb["embeddings_flat"], dets["valid"],
            gal, gal_valid, jnp.float32(cfg.face_tolerance)),
    }
    occupancy = int(np.asarray(jax.device_get(dets["count"])).sum())
    fl = engine_stage_flops(eng, batch=BATCH, occupancy=occupancy)
    report["occupancy"] = occupancy
    report["stages"] = {
        k: {
            "ms": round(v * 1000, 3),
            "gflops": round((fl.get(k) or 0) / 1e9, 2),
            "mfu": round((fl.get(k) or 0) / v / PEAK_FLOPS_BF16, 4),
        }
        for k, v in stage_s.items()
    }

    # --- embed compaction: time at each occupancy regime ---
    n = BATCH * cfg.max_faces_per_frame
    rungs = embed_compact_rungs(n)
    emb_times = {}
    for nv in sorted({0, *(max(0, r - 1) for r in rungs), n}):
        valid = np.zeros(n, bool)
        valid[:nv] = True
        valid = jnp.asarray(valid.reshape(BATCH, cfg.max_faces_per_frame))
        emb_times[str(nv)] = round(_time_dispatch(
            eng._stages["embed"], emb_params, cropped["crops"], valid,
            eng.distance_scale) * 1000, 3)
    report["embed_ms_by_occupancy"] = emb_times
    report["embed_rungs"] = rungs

    # --- space-to-depth stem experiment ---
    s = cfg.det_size
    stem_w = np.asarray(eng.params["detector"]["stem"]["conv"]["w"])  # HWIO 3x3x3x8
    cout = stem_w.shape[-1]
    x = jnp.asarray(
        rng.uniform(-1, 1, (BATCH, s, s, 3)).astype(np.float32),
    ).astype(jnp.bfloat16)

    from jax import lax

    def stem_plain(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # exact rewrite (verified max-abs-err 2e-6 vs the plain conv): SAME for
    # k=3 s=2 on an even input pads (0, 1), and output pixel i reads
    # x[2i : 2i+3] — which spans S2D blocks i and i+1. So: space-to-depth
    # the RAW input, then a 2x2 stride-1 conv padded (0, 1) whose tap
    # (di, dj) of the 3x3 kernel lives in S2D cell (di//2, dj//2), channel
    # slot ((di%2)*2 + dj%2)*3 + c.
    w2 = np.zeros((2, 2, 12, cout), np.float32)
    for di in range(3):
        for dj in range(3):
            base = (di % 2) * 6 + (dj % 2) * 3
            w2[di // 2, dj // 2, base:base + 3, :] += stem_w[di, dj]

    def stem_s2d(x, w2):
        b, h, w, c = x.shape
        # 2x2 space-to-depth: [b, h/2, 2, w/2, 2, c] -> [b, h/2, w/2, 4c]
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, h // 2, w // 2, 4 * c)
        return lax.conv_general_dilated(
            xs, w2.astype(xs.dtype), (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    f_plain = jax.jit(stem_plain)
    f_s2d = jax.jit(stem_s2d)
    w_dev = jnp.asarray(stem_w)
    w2_dev = jnp.asarray(w2)
    y1 = np.asarray(jax.device_get(f_plain(x, w_dev)), np.float32)
    y2 = np.asarray(jax.device_get(f_s2d(x, w2_dev)), np.float32)
    err = float(np.abs(y1 - y2).max())
    report["stem_s2d"] = {
        "max_abs_err": err,
        "plain_ms": round(_time_dispatch(f_plain, x, w_dev) * 1000, 3),
        "s2d_ms": round(_time_dispatch(f_s2d, x, w2_dev) * 1000, 3),
    }

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
