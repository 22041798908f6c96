"""Gallery-scale profile: end-to-end scan throughput vs gallery size.

The reference rebuilds a numpy matrix from a Python dict on EVERY compare
call and broadcasts float64 distances over it per detected face
(face_service.py:409-411 + state.py:78 ENCODINGS) — linear cost per face,
paid on the host, serialized. Here the gallery is a device-resident padded
[N, 128] matrix; matching all 96 faces of an 8-frame batch is ONE matmul on
the MXU + lax.top_k. This profile measures the full serving pipeline
(detect -> align -> embed -> spoof -> match) at gallery sizes 10^2..10^6 and
the reference-style numpy cost for the same work as the comparison.

Run on the TPU host: python benchmarks/profile_gallery.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZES = [100, 10_000, 100_000, 1_000_000]
BATCHES = 18
DEPTH = 6
GROUP = 3


def render_cams(rng):
    from frp_tpu.train.synthetic import render_face

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
    return cams


def main():
    import cv2

    from frp_tpu.config import load_config
    from frp_tpu.engine.batching import letterbox
    from frp_tpu.engine.pipeline import RecognitionEngine

    cfg = load_config(det_size=640, max_faces_per_frame=16, frames_per_batch=8)
    eng = RecognitionEngine(cfg)
    rng = np.random.default_rng(0)
    cams = render_cams(rng)

    rows = 368
    batch = np.empty((8, rows * 3 // 2, 640), np.uint8)
    for i, frame in enumerate(cams):
        boxed, _, _ = letterbox(frame, 640, rows=rows)
        batch[i] = cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)

    print(f"{'gallery':>9} {'load_s':>7} {'ms/batch':>9} {'faces/s':>9} "
          f"{'numpy_ref_ms/96q':>17}")
    for n in SIZES:
        eng.gallery.clear()
        t0 = time.perf_counter()
        mat = rng.normal(size=(n, cfg.embed_dim)).astype(np.float32)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True) + 1e-9
        eng.gallery.load_matrix([f"p{i}" for i in range(n)], mat)
        load_s = time.perf_counter() - t0

        # warm compile for this gallery capacity
        out = eng.fetch(eng.submit(batch, fmt="yuv420"))
        faces = int(out["count"].sum())

        handles = [eng.submit(batch, fmt="yuv420") for _ in range(DEPTH)]
        t0 = time.perf_counter()
        done = 0
        while done < BATCHES:
            for _ in range(GROUP):
                handles.append(eng.submit(batch, fmt="yuv420"))
            eng.fetch_many(handles[:GROUP])
            del handles[:GROUP]
            done += GROUP
        dt = (time.perf_counter() - t0) / BATCHES
        eng.fetch_many(handles)

        # reference-style host compare: f64 broadcast per face, Python loop
        # over the batch's 96 faces (face_service.py:409-439 semantics)
        ref_mat = mat.astype(np.float64)
        queries = rng.normal(size=(96, cfg.embed_dim))
        t0 = time.perf_counter()
        for q in queries:
            d = np.linalg.norm(ref_mat - q[None, :], axis=1)
            d.argmin()
        ref_ms = (time.perf_counter() - t0) * 1000

        print(f"{n:>9} {load_s:>7.2f} {dt*1e3:>9.1f} {faces/dt:>9.0f} "
              f"{ref_ms:>17.1f}")


if __name__ == "__main__":
    main()
