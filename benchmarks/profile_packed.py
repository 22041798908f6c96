"""Measure the packed-single-array pipeline on the real chip: depth sweep x
fetch-group sweep, plus B=1 720p single-stream at det 640 and 480.
Run: python benchmarks/profile_packed.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from benchmarks.profile_variants import make_cams, prep


def main():
    import jax

    from frp_tpu.config import load_config
    from frp_tpu.engine.pipeline import RecognitionEngine

    rng = np.random.default_rng(0)
    cams = make_cams(rng)

    cfg = load_config(det_size=640, max_faces_per_frame=16, frames_per_batch=8)
    eng = RecognitionEngine(cfg)
    for i in range(100):
        eng.gallery.add(f"p{i}", rng.normal(size=cfg.embed_dim))
    batch = prep(cams, 640)
    out = eng.fetch(eng.submit(batch, fmt="yuv420"))  # compile + degrade
    print(f"faces/batch: {int(out['count'].sum())}", flush=True)

    def run(depth, group, n=40):
        handles = [eng.submit(batch, fmt="yuv420") for _ in range(depth)]
        t0 = time.perf_counter()
        done = 0
        while done < n:
            for _ in range(group):
                handles.append(eng.submit(batch, fmt="yuv420"))
            eng.fetch_many(handles[:group])
            del handles[:group]
            done += group
        eng.fetch_many(handles)
        return (time.perf_counter() - t0) / (n + depth) * 1000

    for depth, group in ((4, 1), (6, 1), (4, 2), (6, 2), (6, 3), (8, 2), (8, 4)):
        ms = run(depth, group)
        print(f"packed depth={depth} group={group}: {ms:.1f} ms/batch "
              f"= {96/ms*1000:.0f} faces/s = {96/ms*1000/33.3:.1f}x", flush=True)

    # --- B=1 720p at det 640, packed ---
    import cv2

    from frp_tpu.engine.batching import letterbox

    frame720 = cams[0][:720, :1280]

    def prep1(size):
        boxed, _, _ = letterbox(frame720, size)
        return cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)[None]

    eng.fetch(eng.submit(prep1(640), fmt="yuv420"))  # compile B=1

    def run_b1(e, size, depth, n=80):
        handles = [e.submit(prep1(size), fmt="yuv420") for _ in range(depth)]
        t0 = time.perf_counter()
        for _ in range(n):
            handles.append(e.submit(prep1(size), fmt="yuv420"))
            e.fetch(handles.pop(0))
        for h in handles:
            e.fetch(h)
        return (time.perf_counter() - t0) / (n + depth) * 1000

    for depth in (2, 4):
        ms = run_b1(eng, 640, depth)
        print(f"B=1 720p det640 packed depth={depth}: {ms:.1f} ms = {1000/ms:.1f} fps", flush=True)

    # --- B=1 720p at det 480 ---
    cfg480 = load_config(det_size=480, max_faces_per_frame=16, frames_per_batch=8)
    eng480 = RecognitionEngine(cfg480)
    for i in range(100):
        eng480.gallery.add(f"p{i}", rng.normal(size=cfg480.embed_dim))
    out = eng480.fetch(eng480.submit(prep1(480), fmt="yuv420"))
    print(f"B=1 det480 sanity count: {int(out['count'].sum())}", flush=True)
    for depth in (2, 4):
        ms = run_b1(eng480, 480, depth)
        print(f"B=1 720p det480 packed depth={depth}: {ms:.1f} ms = {1000/ms:.1f} fps", flush=True)

    # det480 recall on the crowded 1080p scenes
    out = eng480.fetch(eng480.submit(prep(cams, 480), fmt="yuv420"))
    print(f"det480 crowded recall: {int(out['count'].sum())}/96", flush=True)


if __name__ == "__main__":
    main()
