"""Test accuracy + speed of upload-byte-cutting variants on the real chip:
  1. det 512 vs 640 recall on rendered crowded scenes (12 faces/frame)
  2. Y-only (gray) ingest at 640 recall
  3. B=1 single-stream pipelined throughput (720p config)
Run: python benchmarks/profile_variants.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_cams(rng, n=8):
    from frp_tpu.train.synthetic import render_face

    cams = []
    for c in range(n):
        rgb = rng.integers(20, 110, size=(1080, 1920, 3), dtype=np.uint8)
        for gy in range(3):
            for gx in range(4):
                size = float(rng.uniform(150, 240))
                cx = gx * 480 + 240 + float(rng.uniform(-60, 60))
                cy = gy * 360 + 180 + float(rng.uniform(-40, 40))
                render_face(rgb, cx, cy, size, rng)
        cams.append(np.ascontiguousarray(rgb[..., ::-1]))
    return cams


def prep(cams, size):
    import cv2

    from frp_tpu.engine.batching import letterbox

    out = np.empty((len(cams), size * 3 // 2, size), np.uint8)
    for i, frame in enumerate(cams):
        boxed, _, _ = letterbox(frame, size)
        out[i] = cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)
    return out


def main():
    import jax

    from frp_tpu.config import load_config
    from frp_tpu.engine.pipeline import RecognitionEngine

    rng = np.random.default_rng(0)
    cams = make_cams(rng)

    # --- det 640 baseline ---
    cfg = load_config(det_size=640, max_faces_per_frame=16, frames_per_batch=8)
    eng = RecognitionEngine(cfg)
    for i in range(100):
        eng.gallery.add(f"p{i}", rng.normal(size=cfg.embed_dim))
    b640 = prep(cams, 640)
    out = eng.process_frames(b640, fmt="yuv420")
    print(f"det640 count: {int(out['count'].sum())}/96", flush=True)

    # --- Y-only at 640: zero chroma planes (U=V=128) ---
    bgray = b640.copy()
    bgray[:, 640:, :] = 128
    out = eng.process_frames(bgray, fmt="yuv420")
    print(f"det640 GRAY count: {int(out['count'].sum())}/96 "
          f"(would cut upload 33%)", flush=True)

    # --- det 512 ---
    cfg512 = load_config(det_size=512, max_faces_per_frame=16, frames_per_batch=8)
    eng512 = RecognitionEngine(cfg512)
    for i in range(100):
        eng512.gallery.add(f"p{i}", rng.normal(size=cfg512.embed_dim))
    b512 = prep(cams, 512)
    out = eng512.process_frames(b512, fmt="yuv420")
    print(f"det512 count: {int(out['count'].sum())}/96 (bytes x0.64)", flush=True)

    # --- det 448 ---
    cfg448 = load_config(det_size=448, max_faces_per_frame=16, frames_per_batch=8)
    eng448 = RecognitionEngine(cfg448)
    out = eng448.process_frames(prep(cams, 448), fmt="yuv420")
    print(f"det448 count: {int(out['count'].sum())}/96 (bytes x0.49)", flush=True)

    # --- single-stream 720p config: B=1 @ det 640 pipelined ---
    import cv2

    from frp_tpu.engine.batching import letterbox

    frame720 = cams[0][:720, :1280]
    def prep1():
        boxed, _, _ = letterbox(frame720, 640)
        return cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)[None]

    b1 = prep1()
    r = eng._run_stages(jax.device_put(b1), 0.6, "yuv420")  # compile B=1
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    keys = ("boxes", "scores", "valid", "count", "best_idx", "best_distance",
            "is_match", "fake_prob", "quality")

    def pipelined_b1(depth, n=60):
        handles = []
        for _ in range(depth):
            rr = eng._run_stages(jax.device_put(prep1()), 0.6, "yuv420")
            handles.append({k: rr[k] for k in keys if k in rr})
        t0 = time.perf_counter()
        for _ in range(n):
            rr = eng._run_stages(jax.device_put(prep1()), 0.6, "yuv420")
            handles.append({k: rr[k] for k in keys if k in rr})
            jax.device_get(handles.pop(0))
        for h in handles:
            jax.device_get(h)
        return (time.perf_counter() - t0) / (n + depth) * 1000

    for depth in (1, 2, 4):
        ms = pipelined_b1(depth)
        print(f"B=1 720p pipelined depth={depth}: {ms:.1f} ms/frame = {1000/ms:.1f} fps", flush=True)

    # blocking single-frame latency (detection-to-result)
    def blocking1():
        rr = eng._run_stages(jax.device_put(prep1()), 0.6, "yuv420")
        jax.device_get({k: rr[k] for k in keys if k in rr})

    ts = []
    for _ in range(15):
        t0 = time.perf_counter()
        blocking1()
        ts.append(time.perf_counter() - t0)
    print(f"B=1 blocking p50: {sorted(ts)[len(ts)//2]*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
