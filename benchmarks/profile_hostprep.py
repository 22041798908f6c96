"""Host-producer cost profile (round 4): the quiesced numbers behind the
change-hint letterboxing design (BASELINE.md "Where the time goes").

Measures, on the serving host (no TPU needed — this is pure host work):
  * full letterbox+I420 of 8x1080p BGR frames (the round-3 producer);
  * banded letterbox updates from decoder change hints (LetterboxCache);
  * hinted delta encode vs full-diff encode (DeltaEncoder);
  * the native dirty-band source diff for hintless sources (framepack v4).

Run: python benchmarks/profile_hostprep.py   (prints one JSON document)
NOTE: results are meaningful only on a quiet host — pause trainers etc.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_CAMS = 8
DET, ROWS = 640, 368
BAND_Y0, BAND_H = 400, 280  # the bench's walking-sprite row band


def timeit(fn, n=60):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000


def main():
    import cv2

    from frp_tpu.engine.batching import DeltaEncoder, LetterboxCache, letterbox
    from frp_tpu.utils.native import dirty_bands, get_framepack

    rng = np.random.default_rng(0)
    cams = [np.ascontiguousarray(
        rng.integers(20, 110, (1080, 1920, 3), dtype=np.uint8))
        for _ in range(N_CAMS)]
    out = np.empty((N_CAMS, ROWS * 3 // 2, DET), np.uint8)
    report = {"n_cams": N_CAMS, "det": DET, "rows": ROWS}

    def full_prep():
        for i, f in enumerate(cams):
            boxed, _, _ = letterbox(f, DET, rows=ROWS)
            out[i] = cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)

    report["full_letterbox_i420_ms"] = round(timeit(full_prep), 2)

    cur = np.empty((N_CAMS, ROWS * 3 // 2, DET), np.uint8)
    caches = [LetterboxCache(DET, ROWS, buf=cur[i]) for i in range(N_CAMS)]
    for i in range(N_CAMS):
        caches[i].update(cams[i])
    band = [(BAND_Y0, BAND_Y0 + BAND_H)]

    def banded_prep():
        for i in range(N_CAMS):
            caches[i].update(cams[i], dirty=band)

    report["banded_letterbox_ms"] = round(timeit(banded_prep), 2)

    enc_full = DeltaEncoder(block_bytes=128)
    enc_full.encode(cur)
    report["full_diff_encode_ms"] = round(timeit(lambda: enc_full.encode(cur)), 2)
    enc_h = DeltaEncoder(block_bytes=128)
    enc_h.encode(cur)
    hints = [c.dirty_blocks(128) for c in caches]
    report["hinted_encode_ms"] = round(
        timeit(lambda: enc_h.encode(cur, hints=hints)), 2)
    report["producer_banded_hinted_ms"] = round(
        timeit(lambda: (banded_prep(),
                        enc_h.encode(cur, hints=[c.dirty_blocks(128)
                                                 for c in caches]))), 2)

    if get_framepack() is not None:
        prevs = [c.copy() for c in cams]
        for c, p in zip(cams, prevs):
            dirty_bands(c, p)

        def src_diff():
            for c, p in zip(cams, prevs):
                dirty_bands(c, p)

        report["source_dirty_band_diff_ms"] = round(timeit(src_diff), 2)
    else:
        report["source_dirty_band_diff_ms"] = None

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
