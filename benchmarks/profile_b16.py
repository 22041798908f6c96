"""Does stacking two 8-frame batches per dispatch (B=16) beat B=8?

Per-frame upload bytes are fixed; the win would come from amortizing the
per-dispatch + per-sync overhead over more frames (VERDICT round-1 item 2
suggestion). Costs one extra frame-time of latency per camera.

Run on the TPU host: python benchmarks/profile_b16.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import cv2

    from frp_tpu.config import load_config
    from frp_tpu.engine.batching import letterbox
    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.train.synthetic import render_face

    rng = np.random.default_rng(0)
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

    rows = 368

    def pack(frames):
        out = np.empty((len(frames), rows * 3 // 2, 640), np.uint8)
        for i, frame in enumerate(frames):
            boxed, _, _ = letterbox(frame, 640, rows=rows)
            out[i] = cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)
        return out

    print(f"{'B':>4} {'depth':>6} {'group':>6} {'ms/batch':>9} {'ms/frame':>9} {'faces/s':>9}")
    for b, depth, group in [(8, 6, 3), (16, 4, 2), (16, 3, 2), (24, 3, 1)]:
        cfg = load_config(det_size=640, max_faces_per_frame=16, frames_per_batch=b)
        eng = RecognitionEngine(cfg)
        for i in range(100):
            eng.gallery.add(f"p{i}", rng.normal(size=cfg.embed_dim))
        frames = (cams * ((b + 7) // 8))[:b]
        batch = pack(frames)
        out = eng.fetch(eng.submit(batch, fmt="yuv420"))
        faces = int(out["count"].sum())
        n = 24
        handles = [eng.submit(batch, fmt="yuv420") for _ in range(depth)]
        t0 = time.perf_counter()
        done = 0
        while done < n:
            for _ in range(group):
                handles.append(eng.submit(batch, fmt="yuv420"))
            eng.fetch_many(handles[:group])
            del handles[:group]
            done += group
        dt = (time.perf_counter() - t0) / n
        eng.fetch_many(handles)
        print(f"{b:>4} {depth:>6} {group:>6} {dt*1e3:>9.1f} {dt*1e3/b:>9.2f} "
              f"{faces/dt:>9.0f}")
        del eng


if __name__ == "__main__":
    main()
