"""Delta-transfer block-size sweep (host-side only, no TPU).

The temporal-delta wire cost per batch is cap * (K + 4) bytes/frame where K
is the block size and cap the ladder rung that fits the changed-block count.
Coarse blocks over-copy around the moving subject (a 256-byte block spans
0.4 of a 640-px active row); fine blocks pay 4 bytes of index per block and
a larger scatter index on device. This sweep measures the actual encoded
bytes under bench.py's exact motion model (8 cameras, 280-px sprite moving
24 px/scan) so the serving default can be chosen from data.

Usage: python benchmarks/profile_block_size.py [--scans 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=64)
    ap.add_argument("--blocks", type=int, nargs="*",
                    default=[64, 128, 256, 512, 1024])
    args = ap.parse_args()

    import cv2

    from frp_tpu.engine.batching import DeltaEncoder, active_rows_for, letterbox
    from frp_tpu.train.synthetic import render_face

    rng = np.random.default_rng(0)
    cams, sprites = [], []
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
        srgb = np.ascontiguousarray(
            base[y0:y0 + sp, x0:x0 + sp][..., ::-1]).copy()
        render_face(srgb, sp // 2, sp // 2, 200.0, rng)
        sprites.append((base, np.ascontiguousarray(srgb[..., ::-1]), y0, x0))
        cams.append(bgr)

    def advance(t):
        for cam, (base, sprite, y0, x0) in zip(cams, sprites):
            sp = sprite.shape[0]
            dx = (t % 8) * 24
            if t > 0:
                pdx = ((t - 1) % 8) * 24
                cam[y0:y0 + sp, x0 + pdx:x0 + pdx + sp] = base[
                    y0:y0 + sp, x0 + pdx:x0 + pdx + sp]
            cam[y0:y0 + sp, x0 + dx:x0 + dx + sp] = sprite

    rows = active_rows_for([f.shape[:2] for f in cams], 640) or 640

    def prep():
        out = np.empty((8, rows * 3 // 2, 640), np.uint8)
        for i, frame in enumerate(cams):
            boxed, _, _ = letterbox(frame, 640, rows=rows)
            out[i] = cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)
        return out

    raw_bytes = 8 * rows * 3 // 2 * 640
    print(f"raw active-rows batch: {raw_bytes/1e6:.2f} MB "
          f"({rows} rows x 640)", flush=True)

    # capture the batch sequence once so every block size sees identical input
    batches = []
    for t in range(args.scans):
        advance(t)
        batches.append(prep())

    print(f"{'K':>5} {'mean KB/batch':>14} {'ratio':>7} {'cap rungs used':>20}")
    for k in args.blocks:
        enc = DeltaEncoder(block_bytes=k)
        total = 0
        rungs: dict = {}
        for batch in batches:
            out = enc.encode(batch)
            if out[0] == "raw":
                total += raw_bytes
                rungs["raw"] = rungs.get("raw", 0) + 1
            else:
                _, idx, blocks = out
                total += idx.size * 4 + blocks.size
                rungs[blocks.shape[1]] = rungs.get(blocks.shape[1], 0) + 1
        mean = total / len(batches)
        print(f"{k:>5} {mean/1e3:>14.1f} {raw_bytes/mean:>7.2f} "
              f"{str(rungs):>20}", flush=True)


if __name__ == "__main__":
    main()
