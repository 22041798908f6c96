"""Decompose the serving batch time on the real chip: upload, per-stage
dispatch, fetch (full tree vs minimal tree), and the effect of stacking two
8-frame batches into one 16-frame dispatch. Run AFTER triggering the relay's
degraded mode (first fetch) so the numbers reflect serving reality.

Usage: python benchmarks/profile_transfer.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, n=20, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    import jax

    from frp_tpu.config import load_config
    from frp_tpu.engine.batching import letterbox
    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.train.synthetic import render_face

    import cv2

    cfg = load_config(det_size=640, max_faces_per_frame=16, frames_per_batch=8)
    eng = RecognitionEngine(cfg)
    rng = np.random.default_rng(0)
    for i in range(100):
        eng.gallery.add(f"person_{i}", rng.normal(size=cfg.embed_dim))

    cams = []
    for c in range(8):
        rgb = rng.integers(20, 110, size=(1080, 1920, 3), dtype=np.uint8)
        for gy in range(3):
            for gx in range(4):
                size = float(rng.uniform(150, 240))
                cx = gx * 480 + 240 + float(rng.uniform(-60, 60))
                cy = gy * 360 + 180 + float(rng.uniform(-40, 40))
                render_face(rgb, cx, cy, size, rng)
        cams.append(np.ascontiguousarray(rgb[..., ::-1]))

    def host_prep():
        out = np.empty((8, 960, 640), np.uint8)
        for i, frame in enumerate(cams):
            boxed, _, _ = letterbox(frame, 640)
            out[i] = cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)
        return out

    batch = host_prep()
    out = eng.process_frames(batch, fmt="yuv420")  # compile + trigger degraded mode
    print(f"faces/batch: {int(out['count'].sum())}", flush=True)

    # --- host prep ---
    print(f"host_prep (letterbox+I420 x8): {timeit(host_prep, 10):.2f} ms", flush=True)

    # --- upload alone ---
    def upload():
        d = jax.device_put(batch)
        d.block_until_ready()
        return d

    print(f"upload 4.9MB I420 (device_put+block): {timeit(upload, 10):.2f} ms", flush=True)

    # --- device-only stage chain on resident input ---
    dev = jax.device_put(batch)
    dev.block_until_ready()

    def stages_only():
        out = eng._run_stages(dev, 0.6, "yuv420")
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)

    print(f"stage chain on resident input (block, no fetch): {timeit(stages_only, 10):.2f} ms", flush=True)

    # --- individual dispatch cost: ingest alone ---
    def ingest_only():
        eng._stages["ingest"](dev).block_until_ready()

    print(f"ingest dispatch alone: {timeit(ingest_only, 10):.2f} ms", flush=True)

    # --- fetch cost: full tree vs minimal ---
    res = eng._run_stages(dev, 0.6, "yuv420")
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), res)
    nbytes = sum(np.prod(v.shape) * v.dtype.itemsize for v in jax.tree_util.tree_leaves(res))
    print(f"result tree: {len(jax.tree_util.tree_leaves(res))} leaves, {nbytes/1e3:.0f} KB", flush=True)

    def fetch_full():
        jax.device_get(res)

    print(f"fetch full tree: {timeit(fetch_full, 10):.2f} ms", flush=True)

    minimal = {k: res[k] for k in ("boxes", "scores", "valid", "count", "best_idx",
                                   "best_distance", "is_match", "fake_prob", "quality")
               if k in res}
    nbytes_min = sum(np.prod(v.shape) * v.dtype.itemsize for v in jax.tree_util.tree_leaves(minimal))
    print(f"minimal tree: {nbytes_min/1e3:.0f} KB", flush=True)

    def fetch_min():
        jax.device_get(minimal)

    print(f"fetch minimal tree: {timeit(fetch_min, 10):.2f} ms", flush=True)

    # --- end-to-end single submission (upload + stages + minimal fetch) ---
    def e2e_min():
        d = jax.device_put(batch)
        r = eng._run_stages(d, 0.6, "yuv420")
        m = {k: r[k] for k in minimal}
        jax.device_get(m)

    print(f"e2e blocking (upload+stages+min fetch): {timeit(e2e_min, 10):.2f} ms", flush=True)

    # --- pipelined depth sweep with minimal fetch ---
    def pipelined(depth, n=30):
        handles = []
        for _ in range(depth):
            d = jax.device_put(batch)
            r = eng._run_stages(d, 0.6, "yuv420")
            handles.append({k: r[k] for k in minimal})
        t0 = time.perf_counter()
        for _ in range(n):
            d = jax.device_put(batch)
            r = eng._run_stages(d, 0.6, "yuv420")
            handles.append({k: r[k] for k in minimal})
            jax.device_get(handles.pop(0))
        for h in handles:
            jax.device_get(h)
        return (time.perf_counter() - t0) / (n + depth) * 1000

    for depth in (2, 4, 6, 8):
        print(f"pipelined depth={depth}: {pipelined(depth):.2f} ms/batch", flush=True)

    # --- stacked 16-frame batch (two logical batches per dispatch) ---
    batch16 = np.concatenate([batch, batch], axis=0)
    d16 = jax.device_put(batch16)
    d16.block_until_ready()
    r16 = eng._run_stages(d16, 0.6, "yuv420")  # compile B=16
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r16)
    minimal16 = {k: r16[k] for k in minimal}

    def pipelined16(depth, n=15):
        handles = []
        for _ in range(depth):
            d = jax.device_put(batch16)
            r = eng._run_stages(d, 0.6, "yuv420")
            handles.append({k: r[k] for k in minimal16})
        t0 = time.perf_counter()
        for _ in range(n):
            d = jax.device_put(batch16)
            r = eng._run_stages(d, 0.6, "yuv420")
            handles.append({k: r[k] for k in minimal16})
            jax.device_get(handles.pop(0))
        for h in handles:
            jax.device_get(h)
        return (time.perf_counter() - t0) / (n + depth) * 1000 / 2  # per 8-frame batch

    for depth in (2, 4):
        print(f"stacked-16 pipelined depth={depth}: {pipelined16(depth):.2f} ms per 8-frame eq", flush=True)


if __name__ == "__main__":
    main()
