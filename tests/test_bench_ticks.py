"""Multi-tick stacked submissions (bench.py BENCH_TICKS): TICKS consecutive
scan ticks of the same cameras ride one [8*TICKS] device batch to amortize
the relay's fixed per-dispatch charge. The delta-transfer TRUST contract
must survive the stacking: slot t*N+i's previous content is camera i at
TICKS motion steps earlier (not one), so the banded hints must still cover
the full diff. bench.py's motion keeps the dirty row band fixed while the
subject's x position moves — these tests pin that the stacked encode stays
bit-exact under exactly that pattern (including the position wrap, where
old and new sprite locations are disjoint)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from frp_tpu.engine.batching import DeltaEncoder, LetterboxCache

SIZE, ROWS, BLOCK = 640, 368, 128
NCAM, TICKS = 2, 2
Y0, Y1 = 300, 428  # fixed dirty source row band (the walking subject's rows)


def _host_reconstruct(prev: np.ndarray, payload) -> np.ndarray:
    """Numpy reference of the device delta scatter (engine delta stage)."""
    if payload[0] == "raw":
        return np.array(payload[1], copy=True).reshape(prev.shape)
    _, idx, blocks = payload
    out = prev.copy()
    for b in range(idx.shape[0]):
        for j, ix in enumerate(idx[b]):
            if ix >= 0:
                out[b, ix * BLOCK : (ix + 1) * BLOCK] = blocks[b, j]
    return out


def test_stacked_two_tick_delta_bit_exact():
    rng = np.random.default_rng(7)
    cams = [
        np.ascontiguousarray(
            rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
        )
        for _ in range(NCAM)
    ]
    nbytes = ROWS * SIZE * 3 // 2
    assert nbytes % BLOCK == 0
    cur = np.empty((NCAM, ROWS * 3 // 2, SIZE), np.uint8)
    caches = [LetterboxCache(SIZE, ROWS, buf=cur[i]) for i in range(NCAM)]
    for i, f in enumerate(cams):
        caches[i].update(f)  # initial full build

    big = np.empty((NCAM * TICKS, ROWS * 3 // 2, SIZE), np.uint8)
    enc = DeltaEncoder(block_bytes=BLOCK)
    prev = None
    step = [0]

    def next_ticks():
        """bench.py's producer pattern: TICKS ticks stacked per payload,
        per-slot hints from each cache's LAST banded update."""
        hints = []
        for t in range(TICKS):
            s = step[0]
            step[0] += 1
            for i, f in enumerate(cams):
                # subject walks inside the fixed band; wraps to x=0 like the
                # bench sprite (old/new positions disjoint on the wrap tick)
                x = (s % 9) * 130
                f[Y0:Y1, x : x + 90] = rng.integers(
                    0, 255, (Y1 - Y0, 90, 3), dtype=np.uint8
                )
                caches[i].update(f, dirty=[(Y0, Y1)])
                big[t * NCAM + i] = cur[i]
                hints.append(caches[i].dirty_blocks(BLOCK))
        return big, hints

    deltas = shipped = raw_bytes = 0
    for sub in range(12):
        b, hints = next_ticks()
        payload = enc.encode(b, hints=hints)
        flat = b.reshape(NCAM * TICKS, -1)
        if payload[0] == "raw":
            got = _host_reconstruct(
                np.zeros_like(flat) if prev is None else prev, payload
            )
        else:
            assert prev is not None
            deltas += 1
            shipped += payload[1].nbytes + payload[2].nbytes
            raw_bytes += flat.nbytes
            got = _host_reconstruct(prev, payload)
        np.testing.assert_array_equal(
            got, flat, err_msg=f"submission {sub} reconstruction diverged"
        )
        prev = got
    # the pattern must actually exercise the delta path and beat raw bytes
    assert deltas >= 10
    assert shipped < raw_bytes / 2


def test_stacked_hints_cover_multi_step_diff():
    """Slot i's diff spans TICKS motion steps; the fixed-band hint's block
    ranges must cover EVERY differing block (under-coverage would ship
    stale pixels forever — the trap CLAUDE.md gotcha 8c documents)."""
    rng = np.random.default_rng(11)
    f = np.ascontiguousarray(rng.integers(0, 255, (720, 1280, 3), np.uint8))
    cache = LetterboxCache(SIZE, ROWS)
    before = cache.update(f).copy().reshape(-1)
    # two motion steps at disjoint x positions, one cache update per step
    for x in (0, 1040):
        f[Y0:Y1, x : x + 90] = rng.integers(0, 255, (Y1 - Y0, 90, 3), np.uint8)
        after = cache.update(f, dirty=[(Y0, Y1)]).copy().reshape(-1)
    hint = cache.dirty_blocks(BLOCK)  # LAST update's bands only
    assert hint is not None
    covered = np.zeros(before.size // BLOCK, bool)
    for b0, b1 in hint:
        covered[b0:b1] = True
    differing = (
        (before != after).reshape(-1, BLOCK).any(axis=1)
    )
    uncovered = np.flatnonzero(differing & ~covered)
    assert uncovered.size == 0, (
        f"{uncovered.size} changed blocks outside the hint ranges"
    )
