"""Sweep pipeline depth / fetch-group size for the delta-transfer serving
loop (round 3: the wire dropped from ~2.8 MB to ~0.7 MB per batch, which
shifts the optimum — per-sync cost is now a larger share of the budget).

Same scene/motion protocol as bench.py, shorter windows. Prints ms/batch
per (depth, group); pick the best and bake it into bench.py/serving.

Run on the TPU host: python benchmarks/profile_pipeline_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from frp_tpu.config import load_config
    from frp_tpu.engine.batching import (
        DeltaEncoder,
        active_rows_for,
        letterbox,
    )
    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.train.synthetic import render_face

    import cv2

    cfg = load_config(det_size=640, max_faces_per_frame=16, frames_per_batch=8)
    eng = RecognitionEngine(cfg)
    rng = np.random.default_rng(0)
    for i in range(100):
        eng.gallery.add(f"p{i}", rng.normal(size=cfg.embed_dim))

    cams = []
    sprites = []
    for c in range(8):
        rgb = rng.integers(20, 110, size=(1080, 1920, 3), dtype=np.uint8)
        for gy in range(3):
            for gx in range(4):
                if gy == 1 and gx == 1:
                    continue
                render_face(rgb, gx * 480 + 240, gy * 360 + 180,
                            float(rng.uniform(150, 240)), rng)
        bgr = np.ascontiguousarray(rgb[..., ::-1])
        y0, x0, sp = 400, 580, 280
        base = bgr.copy()
        srgb = np.ascontiguousarray(base[y0:y0 + sp, x0:x0 + sp][..., ::-1]).copy()
        render_face(srgb, sp // 2, sp // 2, 200.0, rng)
        sprites.append((base, np.ascontiguousarray(srgb[..., ::-1]), y0, x0))
        cams.append(bgr)
    tick = [0]

    def advance():
        t = tick[0]
        tick[0] += 1
        bands = []
        for cam, (base, sprite, y0, x0) in zip(cams, sprites):
            sp = sprite.shape[0]
            dx = (t % 8) * 24
            if t > 0:
                pdx = ((t - 1) % 8) * 24
                cam[y0:y0 + sp, x0 + pdx:x0 + pdx + sp] = base[
                    y0:y0 + sp, x0 + pdx:x0 + pdx + sp]
            cam[y0:y0 + sp, x0 + dx:x0 + dx + sp] = sprite
            bands.append([(y0, y0 + sp)])
        return bands

    rows = active_rows_for([f.shape[:2] for f in cams], 640) or 640

    # change-hint letterboxing, same as bench.py's producer (round 4)
    from frp_tpu.engine.batching import LetterboxCache

    cur = np.empty((8, rows * 3 // 2, 640), np.uint8)
    caches = [LetterboxCache(640, rows, buf=cur[i]) for i in range(8)]

    def prep(dirty=None):
        for i, frame in enumerate(cams):
            caches[i].update(frame, None if dirty is None else dirty[i])
        return cur

    blk = int(os.environ.get("SWEEP_BLOCK", "128"))
    enc = DeltaEncoder(block_bytes=blk)
    batch = prep()
    eng.fetch(eng.submit_encoded(("raw", batch)))
    eng.precompile_delta_rungs(block=blk)

    def window(depth, group, n=None):
        # n must dominate depth or the untimed prefill's device work
        # flatters deep pipelines (this biased the first (48,24) sweep —
        # bench.py's sustained windows are the ground truth)
        n = n or max(24, 2 * depth)
        import queue
        import threading

        enc.reset()
        q: queue.Queue = queue.Queue(maxsize=2)
        stop = threading.Event()

        def producer():
            while not stop.is_set():
                item = enc.encode(
                    prep(advance()),
                    hints=[c.dirty_blocks(blk) for c in caches])
                if item[0] == "raw":
                    # cur is mutated every tick while items queue: payloads
                    # that reference it must be copied (delta idx/blocks
                    # are fresh arrays already)
                    from frp_tpu.engine.batching import DeltaPayload

                    item = DeltaPayload(("raw", item[1].copy()),
                                        item.enc_id, item.seq)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            # timer before the prefill: all counted work inside the window
            # (advisor r3 accounting fix)
            t0 = time.perf_counter()
            handles = [eng.submit_encoded(q.get()) for _ in range(depth)]
            done = 0
            while done < n:
                for _ in range(group):
                    handles.append(eng.submit_encoded(q.get()))
                eng.fetch_many(handles[:group])
                del handles[:group]
                done += group
            eng.fetch_many(handles)
            # done overshoots n when group does not divide it; divide by
            # batches actually processed or large-group combos look
            # 9-20% faster than they are (this biased the first sweep)
            return (time.perf_counter() - t0) / (done + depth)
        finally:
            stop.set()
            t.join(timeout=5.0)

    print(f"{'depth':>6} {'group':>6} {'ms/batch':>9} {'faces/s':>9}")
    import ast
    combos = ast.literal_eval(os.environ.get("SWEEP_COMBOS", "[(6, 3), (6, 6), (8, 4), (9, 3), (12, 6), (12, 4), (8, 8), (16, 8)]"))
    for depth, group in combos:
        per = min(window(depth, group) for _ in range(2))
        print(f"{depth:>6} {group:>6} {per * 1e3:>9.1f} {96 / per:>9.0f}")


if __name__ == "__main__":
    main()
