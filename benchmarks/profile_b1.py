"""Single-stream (1x720p) tuning: grouped fetch + 2-frame micro-batches.
Run: python benchmarks/profile_b1.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from benchmarks.profile_variants import make_cams


def main():
    import cv2

    from frp_tpu.config import load_config
    from frp_tpu.engine.batching import letterbox
    from frp_tpu.engine.pipeline import RecognitionEngine

    rng = np.random.default_rng(0)
    cams = make_cams(rng, n=1)
    frame720 = cams[0][:720, :1280]

    cfg = load_config(det_size=640, max_faces_per_frame=16, frames_per_batch=8)
    eng = RecognitionEngine(cfg)
    for i in range(100):
        eng.gallery.add(f"p{i}", rng.normal(size=cfg.embed_dim))

    def prep(nstack=1):
        boxed, _, _ = letterbox(frame720, 640)
        yuv = cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)
        return np.repeat(yuv[None], nstack, axis=0)

    out = eng.fetch(eng.submit(prep(1), fmt="yuv420"))  # compile B=1 + degrade
    print(f"B=1 count: {int(out['count'].sum())}", flush=True)

    def run_grouped(depth, group, nstack=1, n=90):
        handles = [eng.submit(prep(nstack), fmt="yuv420") for _ in range(depth)]
        t0 = time.perf_counter()
        done = 0
        while done < n:
            for _ in range(group):
                handles.append(eng.submit(prep(nstack), fmt="yuv420"))
            eng.fetch_many(handles[:group])
            del handles[:group]
            done += group
        eng.fetch_many(handles)
        frames = (n + depth) * nstack
        return (time.perf_counter() - t0) / frames * 1000

    for depth, group in ((4, 2), (6, 3), (8, 4), (12, 6)):
        ms = run_grouped(depth, group)
        print(f"B=1 depth={depth} group={group}: {ms:.1f} ms/frame = {1000/ms:.1f} fps", flush=True)

    # 2-frame micro-batches (stack 2 consecutive frames per dispatch)
    eng.fetch(eng.submit(prep(2), fmt="yuv420"))  # compile B=2
    for depth, group in ((3, 1), (4, 2), (6, 3)):
        ms = run_grouped(depth, group, nstack=2, n=45)
        print(f"B=2-stack depth={depth} group={group}: {ms:.1f} ms/frame = {1000/ms:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
