"""Split the serving chain's amortized ms/batch into HOST-CPU dispatch cost
vs device-bound wait (round 4 follow-up to profile_dispatch.py).

Why: the host is ONE shared core (CLAUDE.md gotcha #16). The bench runs a
producer thread (banded letterbox + hinted delta encode, ~5.8 ms/batch
quiesced) CONCURRENTLY with the main thread's submit/fetch loop. If the
6.8 ms/batch chain cost (dispatch_profile.json run_stages_yuv_ms) is mostly
host CPU, the two threads serialize on the core and the pipeline floor is
producer + dispatch ≈ 12.6 ms/batch; if it is mostly device wait, the
threads overlap and the floor is max(producer, device) ≈ 7-8 ms.

Measures, after deliberately flipping the process into the relay's degraded
dispatch mode (gotchas #3/#4):
  - issue_wall_ms / issue_cpu_ms: N chains issued back-to-back, thread CPU
    time vs wall, one final sync — the CPU share is what contends with the
    producer thread.
  - chain_with_busy_producer_ms: same loop while a thread spins on real
    producer work (letterbox update + hinted delta encode of the bench's
    8x1080p scene) — the measured contention penalty.

Run on the TPU host: python benchmarks/profile_chain_host.py
Prints one JSON document; save as benchmarks/chain_host_profile.json.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = int(os.getenv("FRP_PROFILE_REPS", "60"))
DET = int(os.getenv("FRP_PROFILE_DET", "640"))
BATCH = 8


def main():
    import jax

    from frp_tpu.config import load_config
    from frp_tpu.engine.batching import (
        DeltaEncoder,
        LetterboxCache,
        active_rows_for,
    )
    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.train.synthetic import make_scene

    cfg = load_config(det_size=DET, max_faces_per_frame=16,
                      frames_per_batch=BATCH)
    eng = RecognitionEngine(cfg)
    rng = np.random.default_rng(0)
    for i in range(100):
        eng.gallery.add(f"p{i}", rng.normal(size=cfg.embed_dim))

    report: dict = {"batch": BATCH, "det_size": cfg.det_size,
                    "backend": jax.default_backend(), "reps": REPS}

    frames = np.stack([
        np.asarray(make_scene(cfg.det_size, np.random.default_rng(50 + i),
                              max_faces=12)[0])
        for i in range(BATCH)
    ]).astype(np.uint8)
    rows = active_rows_for([(1080, 1920)] * BATCH, cfg.det_size) or cfg.det_size
    yuv = np.random.default_rng(1).integers(
        0, 255, (BATCH, rows * 3 // 2, cfg.det_size), np.uint8)

    # flip the process (first computed fetch) so everything below measures
    # the serving-reality dispatch mode
    out = eng.fetch(eng.submit(frames, fmt="rgb"))
    report["occupancy"] = int(out["count"].sum())

    yuv_dev = jax.device_put(yuv)

    def chain(yuv_in):
        o, _ = eng._run_stages(yuv_in, cfg.face_tolerance, "yuv420", True)
        return o

    o = chain(yuv_dev)
    jax.block_until_ready(o)

    def measure(label, busy_producer=False):
        stop = threading.Event()
        prod = {"n": 0, "s": 0.0}
        t = None
        if busy_producer:
            # real producer work: 8x1080p banded letterbox + hinted encode
            cams = [np.random.default_rng(7 + i).integers(
                0, 255, (1080, 1920, 3), np.uint8) for i in range(BATCH)]
            cur = np.empty((BATCH, rows * 3 // 2, DET), np.uint8)
            caches = [LetterboxCache(DET, rows, buf=cur[i])
                      for i in range(BATCH)]
            for i, f in enumerate(cams):
                caches[i].update(f, None)
            enc = DeltaEncoder(block_bytes=128)
            enc.encode(cur)
            tick = [0]

            def producer():
                while not stop.is_set():
                    t0 = time.perf_counter()
                    y0 = 400 + (tick[0] % 8) * 24
                    tick[0] += 1
                    for i, f in enumerate(cams):
                        f[y0:y0 + 280] ^= 1
                        caches[i].update(f, [(y0, y0 + 280)])
                    enc.encode(cur, hints=[c.dirty_blocks(128)
                                           for c in caches])
                    prod["n"] += 1
                    prod["s"] += time.perf_counter() - t0

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            time.sleep(0.2)

        out = chain(yuv_dev)
        jax.block_until_ready(out)
        w0 = time.perf_counter()
        c0 = time.thread_time()
        for _ in range(REPS):
            out = chain(yuv_dev)
        issue_cpu = time.thread_time() - c0
        issue_wall = time.perf_counter() - w0
        jax.block_until_ready(out)
        total_wall = time.perf_counter() - w0
        stop.set()
        if t is not None:
            t.join(timeout=5.0)
        r = {
            "issue_wall_ms": round(issue_wall / REPS * 1000, 3),
            "issue_cpu_ms": round(issue_cpu / REPS * 1000, 3),
            "total_wall_ms": round(total_wall / REPS * 1000, 3),
        }
        if busy_producer and prod["n"]:
            r["producer_ms"] = round(prod["s"] / prod["n"] * 1000, 3)
            r["producer_iters"] = prod["n"]
        report[label] = r

    measure("chain_alone")
    measure("chain_with_busy_producer", busy_producer=True)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
