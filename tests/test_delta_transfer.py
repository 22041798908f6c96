"""Temporal delta transfer (round-3 wire compression, VERDICT r2 next #3):
host block-sparse encoder (native framepack v3 / numpy fallback) + device
reconstruction must be bit-exact against shipping the raw batch."""

import numpy as np
import pytest

from frp_tpu.config import load_config
from frp_tpu.engine.batching import (
    DeltaEncoder,
    active_rows_for,
    build_batch_i420,
)
from frp_tpu.engine.pipeline import RecognitionEngine

DET = 128


@pytest.fixture(scope="module")
def engine():
    cfg = load_config(det_size=DET, max_faces_per_frame=4, pre_nms_topk=64,
                      det_conf_threshold=0.3)
    return RecognitionEngine(cfg, seed=0)


def _batches(n=3, b=2, move=True):
    """A sequence of I420 batches from scenes with localized motion."""
    from frp_tpu.train.synthetic import render_face

    rng = np.random.default_rng(7)
    bg = [rng.integers(20, 110, (144, 256, 3), dtype=np.uint8) for _ in range(b)]
    seq = []
    for t in range(n):
        frames = {}
        for i in range(b):
            img = bg[i].copy()
            if move:
                render_face(img, 80 + 8 * t, 72, 28.0,
                            np.random.default_rng(i * 10))
            frames[i] = img[..., ::-1].copy()  # BGR
        rows = active_rows_for([f.shape[:2] for f in frames.values()], DET)
        batch, _ = build_batch_i420(frames, DET, active_rows=rows)
        seq.append(batch)
    return seq


def test_encoder_keyframe_then_delta_roundtrip():
    seq = _batches(3)
    enc = DeltaEncoder(block_bytes=128)
    k0 = enc.encode(seq[0])
    assert k0[0] == "raw"
    prev = seq[0].reshape(seq[0].shape[0], -1).copy()
    for t in (1, 2):
        out = enc.encode(seq[t])
        assert out[0] == "delta", "localized motion must not force a keyframe"
        _, idx, blocks = out
        rec = DeltaEncoder.apply_host(prev, idx, blocks)
        np.testing.assert_array_equal(
            rec, seq[t].reshape(seq[t].shape[0], -1))
        prev = rec
        # wire savings: delta payload strictly smaller than the raw batch
        assert idx.nbytes + blocks.nbytes < seq[t].nbytes


def test_encoder_full_change_ships_raw():
    enc = DeltaEncoder(block_bytes=128)
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (2, 96 * 3 // 2, 128), dtype=np.uint8)
    b = rng.integers(0, 255, (2, 96 * 3 // 2, 128), dtype=np.uint8)
    assert enc.encode(a)[0] == "raw"
    assert enc.encode(b)[0] == "raw"  # everything changed -> keyframe
    assert enc.encode(b)[0] == "delta"  # nothing changed -> tiny delta


def test_encoder_shape_change_resets():
    enc = DeltaEncoder(block_bytes=128)
    a = np.zeros((2, 96 * 3 // 2, 128), np.uint8)
    assert enc.encode(a)[0] == "raw"
    bigger = np.zeros((3, 96 * 3 // 2, 128), np.uint8)
    assert enc.encode(bigger)[0] == "raw"


def test_engine_delta_path_equals_raw_path(engine):
    """submit_encoded over a keyframe + deltas must produce identical
    results to processing each raw batch directly — the device
    reconstruction is bit-exact."""
    seq = _batches(3)
    enc = DeltaEncoder(block_bytes=128)
    for t, batch in enumerate(seq):
        handle = engine.submit_encoded(enc.encode(batch))
        got = engine.fetch(handle)
        ref = engine.process_frames(batch, fmt="yuv420")
        np.testing.assert_array_equal(got["valid"], ref["valid"])
        np.testing.assert_allclose(got["boxes"], ref["boxes"], atol=1e-3)
        np.testing.assert_allclose(
            got["best_distance"][got["valid"]],
            ref["best_distance"][ref["valid"]], atol=1e-3)


def test_engine_delta_before_keyframe_raises(engine):
    enc = DeltaEncoder(block_bytes=128)
    seq = _batches(2)
    enc.encode(seq[0])
    delta = enc.encode(seq[1])
    assert delta[0] == "delta"
    fresh_cfg = load_config(det_size=DET, max_faces_per_frame=4,
                            pre_nms_topk=64)
    fresh = RecognitionEngine(fresh_cfg, seed=0)
    with pytest.raises(RuntimeError, match="keyframe"):
        fresh.submit_encoded(delta)


def test_device_reconstruction_bytes_exact(engine):
    """The jitted delta stage's reconstructed BYTES must equal the raw batch
    exactly — including frames whose payload is all padding. Regression test
    for the negative-index wrap: JAX normalizes idx=-1 BEFORE the OOB check,
    so an unguarded scatter under mode='drop' silently zeroed the LAST block
    of every frame."""
    import jax

    seq = _batches(3)
    enc = DeltaEncoder(block_bytes=128)
    # keyframe primes the device state
    engine.fetch(engine.submit_encoded(enc.encode(seq[0])))
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(engine._delta_prev)), seq[0])
    # real delta payload
    e1 = enc.encode(seq[1])
    assert e1[0] == "delta"
    engine.fetch(engine.submit_encoded(e1))
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(engine._delta_prev)), seq[1])
    # an all-padding payload (no change at all) must be a byte-exact no-op
    nblocks = seq[1].reshape(seq[1].shape[0], -1).shape[1] // 128
    cap = nblocks // 16
    idx = np.full((seq[1].shape[0], cap), -1, np.int32)
    blocks = np.zeros((seq[1].shape[0], cap, 128), np.uint8)
    engine.fetch(engine.submit_encoded(("delta", idx, blocks)))
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(engine._delta_prev)), seq[1])
    enc.reset()


def test_encoder_first_keyframe_copies_not_aliases():
    """A caller reusing one preallocated batch buffer between scans must not
    alias the encoder's previous-frame state (it would diff each batch
    against itself and ship empty deltas forever)."""
    enc = DeltaEncoder(block_bytes=128)
    buf = np.zeros((1, 96 * 3 // 2, 128), np.uint8)
    assert enc.encode(buf)[0] == "raw"
    buf[:] = 37  # mutate the SAME buffer in place
    out = enc.encode(buf)
    assert out[0] == "raw", "full change must keyframe (state was aliased?)"


def test_encoder_empty_batch_returns_raw():
    """A zero-frame batch (empty camera set after filtering) must degrade to
    a raw no-op, not crash on reshape(0, -1) (advisor r3)."""
    enc = DeltaEncoder(block_bytes=128)
    empty = np.zeros((0, 96 * 3 // 2, 128), np.uint8)
    kind, payload = enc.encode(empty)
    assert kind == "raw" and payload.shape[0] == 0


def test_engine_rejects_interleaved_encoders(engine):
    """Two encoders feeding one engine would silently reconstruct against
    each other's resident batch; the tagged-payload check must raise instead
    (advisor r3: the single-encoder invariant was only documented)."""
    seq = _batches(2)
    enc1 = DeltaEncoder(block_bytes=128)
    enc2 = DeltaEncoder(block_bytes=128)
    engine.fetch(engine.submit_encoded(enc1.encode(seq[0])))  # enc1 keyframe
    enc2.encode(seq[0])          # enc2 seeds its own prev (not submitted)
    foreign = enc2.encode(seq[1])
    assert foreign[0] == "delta"
    before = engine.delta_stats["desyncs"]
    with pytest.raises(RuntimeError, match="desync"):
        engine.submit_encoded(foreign)
    assert engine.delta_stats["desyncs"] == before + 1
    # recovery: the original encoder's raw keyframe re-seeds the chain
    enc1.reset()
    engine.fetch(engine.submit_encoded(enc1.encode(seq[1])))


def test_engine_rejects_dropped_payload(engine):
    """encode() advances the encoder state; if a payload is dropped before
    submit, the next delta's sequence gap must raise rather than silently
    reconstructing stale pixels forever (CLAUDE.md gotcha 8c trap a)."""
    seq = _batches(3)
    enc = DeltaEncoder(block_bytes=128)
    engine.fetch(engine.submit_encoded(enc.encode(seq[0])))
    dropped = enc.encode(seq[1])  # encoded but never submitted
    assert dropped[0] == "delta"
    stale = enc.encode(seq[2])
    assert stale[0] == "delta"
    with pytest.raises(RuntimeError, match="desync"):
        engine.submit_encoded(stale)
    enc.reset()
    engine.fetch(engine.submit_encoded(enc.encode(seq[2])))


def test_put_payload_pretransfer_equals_direct(engine):
    """put_payload (the bench transfer thread's pre-upload of payload arrays,
    benchmarks/gil_profile.json) must be behavior-transparent: raw and delta
    payloads pre-transferred to device produce identical results to numpy
    payloads, the (enc_id, seq) tag survives so the desync guard still
    bites, and the raw path still copies (no aliasing of a reused buffer)."""
    import jax

    seq = _batches(3)
    enc_pre = DeltaEncoder(block_bytes=128)
    enc_ref = DeltaEncoder(block_bytes=128)
    ref_engine_out = []
    for batch in seq:
        ref_engine_out.append(engine.fetch(
            engine.submit_encoded(enc_ref.encode(batch))))
    for t, batch in enumerate(seq):
        p = engine.put_payload(enc_pre.encode(batch))
        if t == 0:
            assert p[0] == "raw" and isinstance(p[1], jax.Array)
        else:
            assert p[0] == "delta"
            assert isinstance(p[1], jax.Array) and isinstance(p[2], jax.Array)
        assert (p.enc_id, p.seq) == (enc_pre._enc_id, enc_pre._seq)
        got = engine.fetch(engine.submit_encoded(p))
        ref = ref_engine_out[t]
        np.testing.assert_array_equal(got["valid"], ref["valid"])
        np.testing.assert_allclose(got["boxes"], ref["boxes"], atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(engine._delta_prev)), seq[-1])
    # seq guard still enforced across pre-transferred payloads: encode one,
    # drop it, pre-transfer the next -> desync must raise
    dropped = enc_pre.encode(seq[0])
    assert dropped[0] == "delta"
    stale = engine.put_payload(enc_pre.encode(seq[1]))
    with pytest.raises(RuntimeError, match="desync"):
        engine.submit_encoded(stale)
    enc_pre.reset()
    engine.fetch(engine.submit_encoded(enc_pre.encode(seq[1])))


def test_precompile_delta_rungs(engine):
    """All four ladder rungs compile as byte-exact no-ops against the
    resident batch (the serving warmup path, advisor r3)."""
    import jax

    seq = _batches(1)
    enc = DeltaEncoder(block_bytes=128)
    engine.fetch(engine.submit_encoded(enc.encode(seq[0])))
    assert engine.precompile_delta_rungs(block=128) == 4
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(engine._delta_prev)), seq[0])


def test_scan_loop_keyframes_after_failed_submit(tmp_path):
    """Serving-edge fault injection (VERDICT r3 #6): a submit that dies
    mid-flight (after the encoder already advanced its state) must make the
    NEXT scan ship a raw keyframe — never a delta chained against frames the
    device never saw."""
    from frp_tpu.api.main import build_app
    from frp_tpu.platform.context import AppContext

    cfg = load_config(
        data_dir=str(tmp_path / "data"), log_dir=str(tmp_path / "logs"),
        det_size=DET, max_faces_per_frame=4, pre_nms_topk=64,
    )
    ctx = AppContext(cfg=cfg, camera_configs=[
        {"id": 0, "name": "Cam 0", "geo": (18.5, 73.8),
         "source": "synthetic:256x144"},
    ])
    try:
        build_app(ctx)
        eng = ctx.engine
        if getattr(eng, "preferred_fmt", "rgb") != "yuv420":
            pytest.skip("delta transfer needs the I420 path (cv2)")
        ctx.run_scan(0.6, 1, 10)  # keyframe
        d0 = eng.delta_stats["deltas"]
        ctx.run_scan(0.6, 1, 10)  # localized motion -> delta
        assert eng.delta_stats["deltas"] == d0 + 1

        orig = eng.submit_encoded
        eng.submit_encoded = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("injected mid-flight submit failure"))
        with pytest.raises(RuntimeError, match="injected"):
            ctx.run_scan(0.6, 1, 10)
        eng.submit_encoded = orig

        k0 = eng.delta_stats["keyframes"]
        out = ctx.run_scan(0.6, 1, 10)  # must keyframe (encoder was reset)
        assert eng.delta_stats["keyframes"] == k0 + 1
        assert eng.delta_stats["desyncs"] == 0
        assert out["scanned"] == 1
        d1 = eng.delta_stats["deltas"]
        ctx.run_scan(0.6, 1, 10)  # chain resumes with deltas
        assert eng.delta_stats["deltas"] == d1 + 1
    finally:
        ctx.shutdown()
