"""Change-hint letterboxing (round 4): LetterboxCache banded updates must be
BIT-IDENTICAL to the full letterbox+I420 path — host prep is the measured
one-core serving bottleneck (~27 ms/batch full vs ~4.4 ms banded at the
bench's motion pattern), and any divergence would silently corrupt detector
input. Reference host path: backend/app/routes/camera.py:284-341 (the
reference re-encodes every frame fully, every scan)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from frp_tpu.engine.batching import DeltaEncoder, LetterboxCache, letterbox


def full_ref(frame, size, rows):
    boxed, _, _ = letterbox(frame, size, rows=rows)
    return cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)


@pytest.mark.parametrize("hw", [(1080, 1920), (720, 1280)])
@pytest.mark.parametrize("interp", ["linear", "area"])
def test_banded_update_bit_exact(hw, interp, monkeypatch):
    """Both serving geometries (k=3 and k=2), both decimation kernels."""
    monkeypatch.setenv("FRP_RESIZE_INTERP", interp)
    h, w = hw
    rng = np.random.default_rng(0)
    size, rows = 640, 368
    cache = LetterboxCache(size, rows)
    f = np.ascontiguousarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    np.testing.assert_array_equal(cache.update(f), full_ref(f, size, rows))
    for trial in range(4):
        f2 = f.copy()
        bands = []
        for _ in range(int(rng.integers(1, 4))):
            y0 = int(rng.integers(0, h - 60))
            y1 = int(min(h, y0 + rng.integers(1, 300)))
            f2[y0:y1] = rng.integers(0, 255, (y1 - y0, w, 3), dtype=np.uint8)
            bands.append((y0, y1))
        out = cache.update(f2, dirty=bands)
        np.testing.assert_array_equal(
            out, full_ref(f2, size, rows), err_msg=f"{hw} trial {trial}")
        f = f2
    # dirty=[] with an unchanged frame: cache already current
    np.testing.assert_array_equal(cache.update(f, dirty=[]),
                                  full_ref(f, size, rows))


def test_band_edges_and_full_frame_band():
    """Boundary bands: first rows, last rows, odd offsets, whole frame."""
    rng = np.random.default_rng(1)
    h, w, size, rows = 1080, 1920, 640, 368
    cache = LetterboxCache(size, rows)
    f = np.ascontiguousarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    cache.update(f)
    for y0, y1 in [(0, 7), (h - 5, h), (1, 2), (0, h)]:
        f = f.copy()
        f[y0:y1] ^= 0x5A
        np.testing.assert_array_equal(
            cache.update(f, dirty=[(y0, y1)]), full_ref(f, size, rows),
            err_msg=f"band ({y0}, {y1})")


def test_non_integer_geometry_falls_back_exact():
    """900x1600 (k = 2.8125) cannot use banded updates; the cache must
    transparently run the full path and stay exact."""
    rng = np.random.default_rng(2)
    cache = LetterboxCache(640, 368)
    f = np.ascontiguousarray(rng.integers(0, 255, (900, 1600, 3), dtype=np.uint8))
    np.testing.assert_array_equal(cache.update(f), full_ref(f, 640, 368))
    f2 = f.copy()
    f2[100:200] = 0
    np.testing.assert_array_equal(cache.update(f2, dirty=[(100, 200)]),
                                  full_ref(f2, 640, 368))


def test_source_shape_change_rebuilds():
    rng = np.random.default_rng(3)
    cache = LetterboxCache(640, 368)
    f = np.ascontiguousarray(rng.integers(0, 255, (1080, 1920, 3), dtype=np.uint8))
    cache.update(f)
    g = np.ascontiguousarray(rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8))
    # hints refer to the OLD geometry; a shape change must force a rebuild
    np.testing.assert_array_equal(cache.update(g, dirty=[(0, 10)]),
                                  full_ref(g, 640, 368))


def test_external_buffer_binding():
    """buf= writes land in the caller's batch slot — zero copies on the
    producer path (bench.py host_prep)."""
    rng = np.random.default_rng(4)
    size, rows = 640, 368
    batch = np.zeros((2, rows * 3 // 2, size), np.uint8)
    caches = [LetterboxCache(size, rows, buf=batch[i]) for i in range(2)]
    frames = [np.ascontiguousarray(rng.integers(0, 255, (1080, 1920, 3),
                                                dtype=np.uint8))
              for _ in range(2)]
    for i in range(2):
        out = caches[i].update(frames[i])
        assert out.base is batch or out is batch[i]  # the slot itself
        np.testing.assert_array_equal(batch[i], full_ref(frames[i], size, rows))
    f2 = frames[0].copy()
    f2[400:680] ^= 7
    caches[0].update(f2, dirty=[(400, 680)])
    np.testing.assert_array_equal(batch[0], full_ref(f2, size, rows))
    np.testing.assert_array_equal(batch[1], full_ref(frames[1], size, rows))


def test_hints_chain_with_delta_encoder():
    """The serving composition: banded letterbox feeds the delta encoder;
    reconstructed host-side output equals the full-path frames at every
    tick (the same walking-sprite motion model as bench.py)."""
    rng = np.random.default_rng(5)
    size, rows = 640, 368
    h, w = 1080, 1920
    base = np.ascontiguousarray(rng.integers(20, 110, (h, w, 3), dtype=np.uint8))
    sprite = np.ascontiguousarray(rng.integers(0, 255, (280, 280, 3), dtype=np.uint8))
    y0, x0 = 400, 580
    cam = base.copy()

    cache = LetterboxCache(size, rows)
    enc = DeltaEncoder(block_bytes=128)
    prev_flat = None
    for t in range(6):
        dx = (t % 8) * 24
        if t > 0:
            pdx = ((t - 1) % 8) * 24
            cam[y0:y0 + 280, x0 + pdx:x0 + pdx + 280] = base[
                y0:y0 + 280, x0 + pdx:x0 + pdx + 280]
        cam[y0:y0 + 280, x0 + dx:x0 + dx + 280] = sprite
        i420 = cache.update(cam, dirty=None if t == 0 else [(y0, y0 + 280)])
        np.testing.assert_array_equal(i420, full_ref(cam, size, rows))
        e = enc.encode(i420[None])
        if e[0] == "raw":
            prev_flat = e[1].reshape(1, -1).copy()
        else:
            _, idx, blocks = e
            prev_flat = DeltaEncoder.apply_host(prev_flat, idx, blocks)
        np.testing.assert_array_equal(
            prev_flat.reshape(i420[None].shape), i420[None],
            err_msg=f"tick {t}")


def test_build_batch_i420_cached_matches_uncached():
    """The scan loop's cached builder must equal build_batch_i420 exactly
    across: cold start, hinted updates, a camera dropping out (slot blanks),
    its return (cache rebuild), and a camera-set change (state reset)."""
    from frp_tpu.engine.batching import (
        BatchMeta,
        build_batch_i420,
        build_batch_i420_cached,
    )

    rng = np.random.default_rng(6)
    size = 640
    mk = lambda h, w: np.ascontiguousarray(
        rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    f0, f1 = mk(1080, 1920), mk(720, 1280)
    state: dict = {}

    def check(frames, hints=None, rows=368):
        got, gm = build_batch_i420_cached(
            frames, size, state=state, hints=hints, active_rows=rows)
        want, wm = build_batch_i420(frames, size, active_rows=rows)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(gm.scales, wm.scales)
        np.testing.assert_array_equal(gm.offsets, wm.offsets)
        np.testing.assert_array_equal(gm.frame_ok, wm.frame_ok)
        assert gm.cam_ids == wm.cam_ids

    check({0: f0, 1: f1})                      # cold: full path both
    f0b = f0.copy(); f0b[300:500] ^= 0x21
    check({0: f0b, 1: f1}, hints={0: [(300, 500)], 1: []})
    check({0: f0b, 1: None}, hints={0: [], 1: None})   # cam 1 drops
    check({0: f0b, 1: f1}, hints={0: [], 1: [(0, 10)]})  # returns: rebuild
    f2 = mk(1080, 1920)
    check({0: f0b, 1: f1, 2: f2})              # camera-set change: reset
    f2b = f2.copy(); f2b[0:64] ^= 5
    check({0: f0b, 1: f1, 2: f2b},
          hints={0: [], 1: [], 2: [(0, 64)]})


def test_hinted_encode_equals_unhinted():
    """encode(batch, hints=...) with honest (over-reported) hints must ship
    byte-identical payloads to the unhinted full diff, and keep the
    internal previous-frame state equivalent across ticks."""
    rng = np.random.default_rng(7)
    shape = (3, 96 * 3 // 2, 128)  # nbytes % 128 == 0
    nblocks = int(np.prod(shape[1:])) // 128
    enc_h = DeltaEncoder(block_bytes=128)
    enc_f = DeltaEncoder(block_bytes=128)
    batch = rng.integers(0, 255, shape, dtype=np.uint8)
    assert enc_h.encode(batch.copy(), hints=[None] * 3)[0] == "raw"
    assert enc_f.encode(batch.copy())[0] == "raw"
    for t in range(5):
        batch = batch.copy()
        hints = []
        for i in range(3):
            if t % 2 == 0 and i == 1:
                hints.append([])  # frame untouched
                continue
            b0 = int(rng.integers(0, nblocks - 8))
            b1 = b0 + int(rng.integers(1, 8))
            flat = batch[i].reshape(-1)
            flat[b0 * 128 : b1 * 128] ^= 0x33
            # over-report by a couple of blocks each side
            hints.append([(max(0, b0 - 2), min(nblocks, b1 + 2))])
        out_h = enc_h.encode(batch, hints=hints)
        out_f = enc_f.encode(batch)
        assert out_h[0] == out_f[0] == "delta"
        np.testing.assert_array_equal(out_h[1], out_f[1], err_msg=f"t={t}")
        np.testing.assert_array_equal(out_h[2], out_f[2], err_msg=f"t={t}")
        np.testing.assert_array_equal(enc_h._prev, enc_f._prev)


def test_scan_composition_cached_builder_hinted_encoder():
    """The full host path the scan loop now runs: cached banded letterbox ->
    delta_hints_for -> hinted encode -> host-side reconstruction equals the
    from-scratch build at every tick, across a camera dropout."""
    from frp_tpu.engine.batching import (
        build_batch_i420,
        build_batch_i420_cached,
        delta_hints_for,
    )

    rng = np.random.default_rng(8)
    size = 640
    base = [np.ascontiguousarray(rng.integers(20, 110, (1080, 1920, 3),
                                              dtype=np.uint8))
            for _ in range(3)]
    frames = {i: f.copy() for i, f in enumerate(base)}
    state: dict = {}
    enc = DeltaEncoder(block_bytes=128)
    prev_flat = None
    for t in range(6):
        hints = {}
        for i in range(3):
            if t == 3 and i == 2:
                frames[i] = None  # camera drops for one scan
                hints[i] = None
                continue
            if frames[i] is None:
                frames[i] = base[i].copy()  # returns
                hints[i] = None
                continue
            y0 = 200 + 37 * t
            frames[i] = frames[i].copy()
            frames[i][y0:y0 + 120] ^= 0x11
            hints[i] = [(y0, y0 + 120)]
        batch, _ = build_batch_i420_cached(
            frames, size, state=state, hints=hints, active_rows=368)
        want, _ = build_batch_i420(frames, size, active_rows=368)
        np.testing.assert_array_equal(batch, want, err_msg=f"tick {t}")
        e = enc.encode(batch, hints=delta_hints_for(state, 128))
        if e[0] == "raw":
            prev_flat = e[1].reshape(3, -1).copy()
        else:
            prev_flat = DeltaEncoder.apply_host(prev_flat, e[1], e[2])
        np.testing.assert_array_equal(
            prev_flat.reshape(batch.shape), want, err_msg=f"tick {t}")


def test_hintless_source_auto_detector():
    """Sources with no read_hints still get banded prep: the builder diffs
    the raw frame against a native-kernel previous copy (framepack v4) and
    derives the bands itself — output equal to the uncached path, and the
    delta hints show the banded status after warm-up."""
    from frp_tpu.engine.batching import (
        build_batch_i420,
        build_batch_i420_cached,
        delta_hints_for,
    )
    from frp_tpu.utils.native import get_framepack

    if get_framepack() is None:
        pytest.skip("native framepack unavailable")
    rng = np.random.default_rng(9)
    f = np.ascontiguousarray(rng.integers(0, 255, (1080, 1920, 3), dtype=np.uint8))
    state: dict = {}

    def check(frames):
        got, _ = build_batch_i420_cached(
            frames, 640, state=state, hints=None, active_rows=368)
        want, _ = build_batch_i420(frames, 640, active_rows=368)
        np.testing.assert_array_equal(got, want)

    check({0: f})                     # cold: cache init (detector idle)
    check({0: f})                     # detector seeds (full rebuild)
    f2 = f.copy(); f2[500:600] ^= 0x44
    check({0: f2})                    # detector supplies bands
    hints = delta_hints_for(state, 128)
    assert hints is not None and hints[0] not in (None,), hints
    assert len(hints[0]) > 0          # banded: concrete block ranges
    check({0: f2})                    # no change: empty bands, still exact
    assert delta_hints_for(state, 128)[0] == []


def test_camera_wrapper_delegates_read_hints():
    """The scan loop probes the platform Camera wrapper, not the raw
    FrameSource — without delegation the whole hint path is dead in
    serving (round-4 review finding)."""
    from frp_tpu.platform.state import Camera

    cam = Camera(0, "c", source="synthetic:256x144")
    ok, frame = cam.read()
    assert ok and frame is not None
    hints = cam.read_hints()
    assert hints is not None and len(hints) >= 1
    y0, y1 = hints[-1]
    assert 0 <= y0 < y1 <= frame.shape[0]


def test_detector_dropped_with_blanked_slot():
    """A camera outage must drop the slot's SourceChangeDetector along with
    its cache: the detector's pre-outage previous copy would under-report
    any band that reverts to pre-outage content after the camera returns,
    ghosting stale pixels into the serving letterbox forever."""
    from frp_tpu.engine.batching import (
        build_batch_i420,
        build_batch_i420_cached,
    )
    from frp_tpu.utils.native import get_framepack

    if get_framepack() is None:
        pytest.skip("native framepack unavailable")
    rng = np.random.default_rng(10)
    base = np.ascontiguousarray(rng.integers(0, 255, (1080, 1920, 3),
                                             dtype=np.uint8))
    state: dict = {}

    def check(frames):
        got, _ = build_batch_i420_cached(
            frames, 640, state=state, hints=None, active_rows=368)
        want, _ = build_batch_i420(frames, 640, active_rows=368)
        np.testing.assert_array_equal(got, want)

    check({0: base})                 # cold
    check({0: base})                 # detector seeds with `base`
    ghost = base.copy()
    ghost[300:500] ^= 0x7F           # a "person" appears
    check({0: ghost})
    check({0: None})                 # outage: slot blanks
    check({0: ghost})                # returns mid-change (full rebuild)
    check({0: base})                 # scene reverts to pre-outage content:
    #                                  a stale detector would diff base vs
    #                                  its old `base` copy, see no change,
    #                                  and leave the ghost in the cache
