"""Does the relay client hold the GIL during h2d transfer / dispatch /
device_get? (round 4)

Why it matters: the bench producer thread measures ~6-7.7 ms/batch of work
in isolation but ~14 ms inside the serving loop (bench detail
host_producer_ms_per_batch) — on the one-core host that gap is either core
contention (fixable by reducing CPU work) or GIL serialization inside the
jax client's relay I/O (fixable only by reducing BYTES/SYNCS, since no
Python thread can run while the transfer blocks).

Method: a counter thread spins on a pure-Python increment loop (GIL-bound
by construction). Measure its rate alone, then while the main thread does
(a) h2d device_put of a bench-sized delta payload, (b) back-to-back chain
dispatches, (c) device_get of packed results. rate_ratio ~1.0 => the relay
releases the GIL (contention story); rate_ratio << 1 => GIL held
(byte-reduction story).

Run on the TPU host: python benchmarks/profile_gil.py
Prints one JSON document; save as benchmarks/gil_profile.json.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class Spinner:
    def __init__(self):
        self.count = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        c = 0
        while not self._stop.is_set():
            c += 1
            if c % 1000 == 0:
                self.count = c

    def __enter__(self):
        self._t.start()
        time.sleep(0.05)
        self._t0 = time.perf_counter()
        self._c0 = self.count
        return self

    def rate(self):
        dt = time.perf_counter() - self._t0
        return (self.count - self._c0) / max(dt, 1e-9)

    def __exit__(self, *a):
        self._stop.set()
        self._t.join(timeout=2.0)


def main():
    import jax

    from frp_tpu.config import load_config
    from frp_tpu.engine.batching import DeltaEncoder, active_rows_for
    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.train.synthetic import make_scene

    cfg = load_config(det_size=640, max_faces_per_frame=16,
                      frames_per_batch=8)
    eng = RecognitionEngine(cfg)
    rng = np.random.default_rng(0)
    for i in range(100):
        eng.gallery.add(f"p{i}", rng.normal(size=cfg.embed_dim))

    frames = np.stack([
        np.asarray(make_scene(640, np.random.default_rng(50 + i),
                              max_faces=12)[0])
        for i in range(8)
    ]).astype(np.uint8)
    rows = active_rows_for([(1080, 1920)] * 8, 640) or 640
    yuv = np.random.default_rng(1).integers(
        0, 255, (8, rows * 3 // 2, 640), np.uint8)

    # flip the process first (serving reality)
    out = eng.fetch(eng.submit(frames, fmt="rgb"))
    yuv_dev = jax.device_put(yuv)

    # bench-sized delta payload (~0.37 MB/batch measured): 366 blocks/frame
    enc = DeltaEncoder(block_bytes=128)
    enc.encode(yuv)
    yuv2 = yuv.copy()
    yuv2[:, 40:80, :] ^= 255
    e = enc.encode(yuv2)
    assert e[0] == "delta"
    idx_np, blocks_np = np.asarray(e[1]), np.asarray(e[2])

    def chain(y):
        o, _ = eng._run_stages(y, cfg.face_tolerance, "yuv420", True)
        return o

    packed = chain(yuv_dev)
    jax.block_until_ready(packed)

    report = {"backend": jax.default_backend(),
              "payload_mb": round((idx_np.nbytes + blocks_np.nbytes) / 1e6, 3)}

    with Spinner() as s:
        time.sleep(1.0)
        report["spin_rate_alone"] = s.rate()
    base = report["spin_rate_alone"]

    def ratio(fn, reps):
        with Spinner() as s:
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            jax.block_until_ready(out)
            wall = time.perf_counter() - t0
            r = s.rate()
        return round(r / base, 3), round(wall / reps * 1000, 3)

    report["h2d_payload"] = dict(zip(
        ("rate_ratio", "ms_per_op"),
        ratio(lambda: jax.device_put((idx_np, blocks_np)), 60)))
    report["h2d_raw_batch"] = dict(zip(
        ("rate_ratio", "ms_per_op"),
        ratio(lambda: jax.device_put(yuv), 20)))
    report["chain_dispatch"] = dict(zip(
        ("rate_ratio", "ms_per_op"),
        ratio(lambda: chain(yuv_dev), 60)))
    report["device_get_packed"] = dict(zip(
        ("rate_ratio", "ms_per_op"),
        ratio(lambda: jax.device_get(packed), 20)))

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
