"""Engine tests on CPU: staged pipeline shape/mask contract, fused==staged
equivalence, YUV420 ingest fidelity, gallery integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frp_tpu.config import load_config
from frp_tpu.engine.gallery import DeviceGallery
from frp_tpu.engine.pipeline import RecognitionEngine, build_pipeline, build_stages
from frp_tpu.ops.anchors import generate_anchors
from frp_tpu.ops.image import yuv420_to_rgb

DET = 128  # small detector grid keeps CPU compiles quick


@pytest.fixture(scope="module")
def engine():
    cfg = load_config(
        det_size=DET, max_faces_per_frame=4, pre_nms_topk=64,
        det_conf_threshold=0.3,
    )
    return RecognitionEngine(cfg, seed=0)


def test_process_frames_contract(engine):
    frames = np.random.default_rng(0).integers(0, 255, (2, DET, DET, 3), np.uint8)
    out = engine.process_frames(frames)
    b, m = 2, 4
    assert out["boxes"].shape == (b, m, 4)
    assert out["landmarks"].shape == (b, m, 10)
    assert out["valid"].shape == (b, m)
    assert out["embeddings"].shape == (b, m, 128)
    assert out["fake_prob"].shape == (b, m)
    assert out["quality"].shape == (b, m)
    assert out["count"].shape == (b,)
    # invalid slots zeroed / masked
    inv = ~out["valid"]
    assert np.all(out["boxes"][inv] == 0)
    assert np.all(np.isinf(out["best_distance"][inv]))
    assert not np.any(out["is_match"][inv])
    # embeddings of valid faces are unit-normalized then multiplied by the
    # measured distance-scale calibration (weights/calibration.json)
    if out["valid"].any():
        norms = np.linalg.norm(out["embeddings"][out["valid"]], axis=-1)
        np.testing.assert_allclose(norms, engine.distance_scale, atol=1e-3)
    assert engine.metrics.total_frames >= 2


def test_gallery_match_integration(engine):
    # a rendered synthetic face: detectable by both the bootstrap weights and
    # (at conf 0.3) usually by deterministic-init weights; skip if neither
    from frp_tpu.train.synthetic import make_scene

    # portrait=True keeps the face at 0.45-0.75 of the square — inside the
    # shipped detector's trained pixel range even on this DET-size grid
    img, _, _, _ = make_scene(DET, np.random.default_rng(5), max_faces=1,
                              portrait=True)
    frames = img[None]
    out1 = engine.process_frames(frames)
    if not out1["valid"].any():
        pytest.skip("detector found no faces in the synthetic scene")
    i, j = np.argwhere(out1["valid"])[0]
    emb = out1["embeddings"][i, j]
    engine.gallery.add("someone", emb)
    out2 = engine.process_frames(frames)
    assert out2["is_match"][i, j]
    assert engine.gallery.name_of(int(out2["best_idx"][i, j])) == "someone"
    assert out2["best_distance"][i, j] < 0.1  # bf16 run-to-run jitter
    engine.gallery.clear()


def test_fused_equals_staged(engine):
    """build_pipeline (one program) and build_stages (four) compute the same."""
    frames = np.random.default_rng(2).integers(0, 255, (1, DET, DET, 3), np.uint8)
    kw = dict(
        det_size=DET, max_faces=4, pre_nms_topk=64,
        conf_thresh=0.3, with_spoof=True,
        distance_scale=engine.distance_scale,
    )
    priors = jax.device_put(generate_anchors(DET))
    fused = jax.jit(build_pipeline(**kw))(
        engine.params, jnp.asarray(frames), *engine.gallery.device_arrays(), priors
    )
    staged, _names = engine._run_stages(jnp.asarray(frames), 0.6)
    fused, staged = jax.device_get((fused, staged))
    np.testing.assert_array_equal(fused["valid"], staged["valid"])
    np.testing.assert_allclose(fused["boxes"], staged["boxes"], rtol=1e-4, atol=1e-3)
    # bf16 op-fusion differences between the one-program and four-program
    # builds move normalized embedding components by <1e-2
    np.testing.assert_allclose(
        fused["embeddings"], staged["embeddings"], atol=2e-2
    )
    np.testing.assert_allclose(fused["fake_prob"], staged["fake_prob"], atol=2e-2)


def test_yuv420_roundtrip_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    # smooth image: chroma subsampling error stays small (random noise would
    # measure the information lost to 4:2:0, not the converter)
    yy, xx = np.mgrid[0:64, 0:64]
    bgr = np.stack([yy * 2, xx * 2, (yy + xx)], axis=-1).astype(np.uint8)
    i420 = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)  # [96, 64]
    rgb_dev = np.asarray(yuv420_to_rgb(jnp.asarray(i420[None])))[0]
    rgb_cv = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32)
    err = np.abs(rgb_dev - rgb_cv)
    assert np.median(err) < 4.0
    assert np.mean(err) < 6.0


def test_engine_yuv_input_mode(engine):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    bgr = rng.integers(0, 255, (2, DET, DET, 3), np.uint8)
    yuv = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420) for f in bgr])
    rgb = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2RGB) for f in bgr])
    out_yuv = engine.process_frames(yuv, fmt="yuv420")
    out_rgb = engine.process_frames(rgb)
    # same shapes; detections close (not identical: chroma subsampling)
    assert out_yuv["boxes"].shape == out_rgb["boxes"].shape
    assert out_yuv["valid"].shape == out_rgb["valid"].shape


def test_submit_fetch_pipeline(engine):
    frames = np.random.default_rng(4).integers(0, 255, (1, DET, DET, 3), np.uint8)
    handles = [engine.submit(frames) for _ in range(3)]
    results = [engine.fetch(h) for h in handles]
    assert all(r["boxes"].shape == (1, 4, 4) for r in results)


def test_gallery_growth_and_swap_remove():
    g = DeviceGallery(embed_dim=8, capacity=2)
    for i in range(5):  # forces doubling growth
        g.add(f"p{i}", np.full(8, i, np.float32))
    assert len(g) == 5 and g.capacity >= 5
    mat, names = g.host_arrays()
    assert names == [f"p{i}" for i in range(5)]
    g.remove("p1")  # swap-remove: p4 moves into slot 1
    mat, names = g.host_arrays()
    assert set(names) == {"p0", "p2", "p3", "p4"}
    assert np.all(g.get("p4") == 4)
    dev_mat, dev_valid = g.device_arrays()
    assert int(np.asarray(dev_valid).sum()) == 4


def test_load_weights_falls_through_corrupt_candidate(tmp_path):
    """A corrupt first candidate (spoof.npz) must not stop the loader from
    trying the next one (mobilenetv3.npz) — round-1 'break' bug."""
    import types

    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.models.mobilenetv3 import init_mobilenetv3_small
    from frp_tpu.models.params import save_params

    params = init_mobilenetv3_small(0)
    (tmp_path / "spoof.npz").write_bytes(b"not an npz at all")
    save_params(str(tmp_path / "mobilenetv3.npz"), params)
    shim = types.SimpleNamespace(cfg=types.SimpleNamespace(weights_dir=str(tmp_path)))
    loaded = RecognitionEngine._load_weights(
        shim, {"spoof": params}, arch="mobilefacenet"
    )
    assert loaded["spoof"] is not None
    assert loaded["spoof"].endswith("mobilenetv3.npz")


def test_packed_results_match_full_tree(engine):
    """submit(packed=True) -> unpack must agree with the full-dict path on
    every shared key (the packed [B, M, 22] array is the serving fast path)."""
    frames = np.random.default_rng(7).integers(0, 255, (2, DET, DET, 3), np.uint8)
    full = engine.process_frames(frames)
    out = engine.fetch(engine.submit(frames, packed=True))
    for key in ("boxes", "landmarks", "scores", "valid", "best_idx",
                "is_match", "fake_prob", "quality", "count"):
        np.testing.assert_allclose(
            np.asarray(out[key], np.float64),
            np.asarray(full[key], np.float64),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )
    # best_distance: inf on invalid slots in both
    v = full["valid"]
    np.testing.assert_allclose(out["best_distance"][v], full["best_distance"][v],
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.isinf(out["best_distance"][~v]))


def test_fetch_many_groups_batches(engine):
    frames = np.random.default_rng(8).integers(0, 255, (1, DET, DET, 3), np.uint8)
    handles = [engine.submit(frames) for _ in range(3)]
    outs = engine.fetch_many(handles)
    assert len(outs) == 3
    for o in outs:
        assert o["boxes"].shape == (1, 4, 4) and o["count"].shape == (1,)


def test_active_rows_transfer_equivalence(engine):
    """Active-area I420 transfer (batching.build_batch_i420 active_rows=...)
    must feed the detector the same det square as the full-square path —
    bit-identical under FRP_RESIZE_INTERP=area; the linear default admits
    <=1 LSB of chroma on <0.01% of pixels (asserted below)."""
    import cv2

    from frp_tpu.engine.batching import (
        active_rows_for,
        build_batch_i420,
        unmap_results,
    )
    from frp_tpu.train.synthetic import render_face

    rng = np.random.default_rng(4)
    # 16:9 frames: DET=128 -> active rows 72 -> rounded to 80
    frames = {}
    for c in range(2):
        rgb = rng.integers(20, 110, size=(360, 640, 3), dtype=np.uint8)
        render_face(rgb, 320 + 40 * c, 180, 150.0, rng)
        frames[c] = np.ascontiguousarray(rgb[..., ::-1])

    rows = active_rows_for([f.shape[:2] for f in frames.values()], DET)
    assert rows is not None and rows % 16 == 0 and rows < DET

    full, meta_full = build_batch_i420(frames, DET)
    act, meta_act = build_batch_i420(frames, DET, active_rows=rows)
    assert act.shape == (2, rows * 3 // 2, DET)
    assert act.nbytes < full.nbytes
    # offsets are in full-square coordinates on both paths
    assert np.allclose(meta_act.scales, meta_full.scales)
    assert np.allclose(meta_act.offsets, meta_full.offsets, atol=1.0)

    # the device sees the same det square. Bit-equal under FRP_RESIZE_INTERP=
    # area; the linear default admits <=1 LSB of chroma: cvtColor's fixed-
    # point 2x2 chroma averaging can round a .5 boundary differently on the
    # two canvas heights (measured: one channel of one pixel).
    rgb_full = np.asarray(engine._stages["ingest"](jnp.asarray(full)))
    rgb_act = np.asarray(engine._stages["ingest"](jnp.asarray(act)))
    assert rgb_full.shape == rgb_act.shape == (2, DET, DET, 3)
    diff = np.abs(rgb_full.astype(np.int16) - rgb_act.astype(np.int16))
    assert diff.max() <= 1 and (diff != 0).mean() < 1e-4, (
        diff.max(), int((diff != 0).sum()))

    out_full = engine.process_frames(full, fmt="yuv420")
    out_act = engine.process_frames(act, fmt="yuv420")
    assert np.array_equal(out_full["valid"], out_act["valid"])
    assert np.allclose(out_full["boxes"], out_act["boxes"], atol=1e-4)
    # unmapped per-camera boxes land at the same original-frame coordinates
    res_full = unmap_results(out_full, meta_full)
    res_act = unmap_results(out_act, meta_act)
    for a, b in zip(res_full, res_act):
        assert len(a["faces"]) == len(b["faces"])
        for fa, fb in zip(a["faces"], b["faces"]):
            assert np.allclose(fa["box"], fb["box"], atol=1.0)


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_deepfake_classify_frames_i420_path(engine, monkeypatch):
    """DeepfakeService.classify_frames rides the active-rows I420 transfer
    when the engine prefers yuv420. Active-rows vs full-square i420 must be
    EXACTLY equal — the device pad reconstructs the identical det square.
    (The RGB path legitimately differs: the spoof head is trained on
    resample artifacts, and chroma subsampling is one.)"""
    import frp_tpu.platform.deepfake as dfmod
    from frp_tpu.platform.deepfake import DeepfakeService
    from frp_tpu.train.synthetic import render_face

    rng = np.random.default_rng(11)
    frames = []
    for i in range(3):
        rgb = rng.integers(20, 110, size=(288, 512, 3), dtype=np.uint8)
        # 220 px here -> ~55 px after the 512->128 letterbox: inside the
        # shipped detector's trained pixel range (det-640 fine-tune sees
        # >=38 px); 120 px (~30 px effective) went sub-scale after the
        # round-3 serving-scale retrain and detected 0/3
        render_face(rgb, 256 + 30 * i, 144, 220.0, rng)
        frames.append(np.ascontiguousarray(rgb[..., ::-1]))  # BGR

    svc = DeepfakeService(engine)
    assert getattr(engine, "preferred_fmt", "rgb") == "yuv420"
    res_active = svc.classify_frames(frames)
    # the DET=128 test grid is borderline for some renders; require that the
    # path works end-to-end, not that every render is detected
    assert len(res_active) == 3 and any(r["faces"] >= 1 for r in res_active)

    # force the full-square i420 path (active_rows=None) and re-run
    import frp_tpu.engine.batching as batching
    monkeypatch.setattr(batching, "active_rows_for", lambda shapes, size: None)
    monkeypatch.setattr(
        dfmod, "active_rows_for", lambda shapes, size: None, raising=False
    )
    res_full = svc.classify_frames(frames)

    assert len(res_full) == 3
    for a, b in zip(res_active, res_full):
        assert a["faces"] == b["faces"]
        if a["fake_prob"] is not None:
            assert abs(a["fake_prob"] - b["fake_prob"]) < 1e-5


def test_gallery_load_matrix(engine):
    from frp_tpu.engine.gallery import DeviceGallery

    g = DeviceGallery(embed_dim=8)
    rng = np.random.default_rng(0)
    m = rng.normal(size=(300, 8)).astype(np.float32)
    names = [f"p{i}" for i in range(300)]
    assert g.load_matrix(names, m) == 300
    assert len(g) == 300 and g.capacity >= 300
    assert np.allclose(g.get("p123"), m[123])
    # duplicates skipped, fresh appended
    m2 = rng.normal(size=(3, 8)).astype(np.float32)
    assert g.load_matrix(["p0", "q1", "q2"], m2) == 2
    assert len(g) == 302
    assert np.allclose(g.get("p0"), m[0])  # not overwritten
    assert np.allclose(g.get("q2"), m2[2])
    mat, valid = g.device_arrays()
    assert int(np.asarray(valid).sum()) == 302
    with pytest.raises(ValueError):
        g.load_matrix(["x"], np.zeros((1, 5), np.float32))


def test_active_rows_ladder_bounded():
    """active_rows_for snaps to a two-rung ladder so arbitrary aspect ratios
    can't trigger unbounded jit-shape compiles at request time."""
    from frp_tpu.engine.batching import active_rows_for

    size = 640
    assert active_rows_for([(1080, 1920)], size) == 368   # 16:9
    assert active_rows_for([(720, 1280)], size) == 368    # 16:9
    assert active_rows_for([(480, 640)], size) == 496     # 4:3
    assert active_rows_for([(800, 600)], size) is None    # portrait
    assert active_rows_for([(640, 640)], size) is None    # square
    # mixed batch takes the max need
    assert active_rows_for([(1080, 1920), (480, 640)], size) == 496
    # entire output domain is two values + None
    outs = {active_rows_for([(h, w)], size)
            for h in range(100, 1200, 37) for w in (640, 1280, 1920)}
    assert outs <= {368, 496, None}


def test_gallery_load_matrix_intra_batch_dup():
    from frp_tpu.engine.gallery import DeviceGallery

    g = DeviceGallery(embed_dim=4)
    m = np.arange(12, dtype=np.float32).reshape(3, 4)
    assert g.load_matrix(["a", "a", "b"], m) == 2
    assert len(g) == 2
    assert np.allclose(g.get("a"), m[0])  # first occurrence wins
    assert g.remove("a") and len(g) == 1
    mat, valid = g.host_arrays()[0], None
    # no orphaned valid row remains under the removed name
    assert g.get("a") is None


def test_encode_image_canonical_geometry_and_remap(engine):
    """encode_image letterboxes any geometry to the one det square and
    returns ORIGINAL-image coordinates — equal to hand-letterboxing and
    remapping, and the same face must be found at (almost) the same spot
    regardless of source geometry."""
    import cv2

    from frp_tpu.engine.batching import letterbox
    from frp_tpu.train.synthetic import make_identity, render_face

    rng = np.random.default_rng(21)
    ident = make_identity(5)
    img = rng.integers(20, 110, size=(288, 512, 3), dtype=np.uint8)
    # 220 px -> ~55 px after the 512->DET letterbox (trained pixel range)
    render_face(img, 256, 144, 220.0, rng, identity=ident)

    faces = engine.encode_image(img)
    if not faces:
        pytest.skip("detector found no face at this test size")
    box = np.asarray(faces[0]["box"], np.float32)
    # box is in ORIGINAL 512x288 coordinates around the rendered center
    cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
    assert abs(cx - 256) < 40 and abs(cy - 144) < 40
    assert 0 <= box[0] and box[2] <= 512 and box[3] <= 288

    # equals hand-letterbox + remap
    boxed, s, (ox, oy) = letterbox(img, DET)
    raw = engine.encode_image(boxed)
    assert raw, "letterboxed image must detect too"
    manual = (np.asarray(raw[0]["box"], np.float32) - [ox, oy, ox, oy]) / s
    np.testing.assert_allclose(box, np.clip(manual, 0, [512, 288, 512, 288]),
                               atol=1.0)
    # embeddings from both geometries describe the same identity
    d = np.linalg.norm(
        np.asarray(faces[0]["embedding"]) - np.asarray(raw[0]["embedding"])
    )
    assert d < 0.2, d


def test_gallery_snapshot_resolves_removed_identity(engine):
    """Match results must resolve identities against the names snapshot tied
    to the dispatched gallery arrays: a concurrent swap-remove reassigns the
    slot index, and live name_of() would blame whoever got swapped in."""
    from frp_tpu.train.synthetic import make_scene

    img, _, _, _ = make_scene(DET, np.random.default_rng(5), max_faces=1,
                              portrait=True)
    out0 = engine.process_frames(img[None])
    if not out0["valid"].any():
        pytest.skip("no detection at this size")
    i, j = np.argwhere(out0["valid"])[0]
    emb = out0["embeddings"][i, j]
    engine.gallery.clear()
    engine.gallery.add("alice", emb)
    engine.gallery.add("bob", np.roll(emb, 3))
    engine.gallery.add("carol", np.roll(emb, 7))

    out = engine.process_frames(img[None])
    names_snap = out["gallery_names"]
    bi = int(out["best_idx"][i, j])
    assert names_snap[bi] == "alice"
    # now alice is removed and carol swaps into her slot
    engine.gallery.remove("alice")
    assert engine.gallery.name_of(bi) == "carol"  # the live-state trap
    # the snapshot still resolves the in-flight result correctly
    assert names_snap[bi] == "alice"
    engine.gallery.clear()


def test_old_fpn_merge_checkpoint_rejected_loudly(tmp_path):
    """A round-2 checkpoint (fpn_merge/ keys, swapped merge order) must be
    REJECTED by the path-aware structure check — its two merge convs are
    shape-identical to ours, so a shape-only check would load them crossed
    with silent accuracy loss. tools/migrate_retinaface_npz.py converts."""
    import os
    import subprocess
    import sys
    import types

    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.models.params import _flatten, load_params, save_params
    from frp_tpu.models.retinaface import init_retinaface

    params = init_retinaface(0)
    save_params(str(tmp_path / "retinaface.npz"), params)
    # rewrite as a round-2-style file: fpn_td/ -> fpn_merge/ (swapped order)
    flat = _flatten(jax.device_get(load_params(str(tmp_path / "retinaface.npz"))))
    old = {}
    for k, v in flat.items():
        if k.startswith("fpn_td/0/"):
            k = "fpn_merge/1/" + k[len("fpn_td/0/"):]
        elif k.startswith("fpn_td/1/"):
            k = "fpn_merge/0/" + k[len("fpn_td/1/"):]
        old[k] = np.asarray(v)
    with open(tmp_path / "retinaface.npz", "wb") as f:
        np.savez(f, **old)

    shim = types.SimpleNamespace(cfg=types.SimpleNamespace(weights_dir=str(tmp_path)))
    loaded = RecognitionEngine._load_weights(
        shim, {"detector": init_retinaface(1)}, "mobilefacenet"
    )
    assert loaded["detector"] is None  # rejected, falls back loudly

    # the migration tool converts it and the load then succeeds
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(root, "tools", "migrate_retinaface_npz.py"),
         str(tmp_path / "retinaface.npz")],
        check=True, capture_output=True,
    )
    loaded2 = RecognitionEngine._load_weights(
        shim, {"detector": init_retinaface(1)}, "mobilefacenet"
    )
    assert loaded2["detector"] and loaded2["detector"].endswith("retinaface.npz")
    migrated = load_params(str(tmp_path / "retinaface.npz"))
    np.testing.assert_array_equal(
        np.asarray(migrated["fpn_td"][0]["conv"]["w"]),
        np.asarray(params["fpn_td"][0]["conv"]["w"]),
    )


def _tiny_embedder(p, x, train=False, normalize=True):
    """Drop-in embedder_forward whose value depends on the crop CONTENT and
    position-sensitively on nothing else — compiles in seconds, so the
    compaction ladder's 4-instance switch program doesn't cost the suite
    minutes of real-net compiles."""
    pooled = x.reshape(x.shape[0], -1, 3).mean(axis=1)  # [K, 3]
    emb = jnp.tanh(pooled @ p["w"] + p["b"])
    return (emb, {}) if train else emb


def test_embed_compaction_equivalence(monkeypatch):
    """Valid-slot compaction (VERDICT r3 #3) is a pure execution-strategy
    choice: at every occupancy — empty, sparse, exactly-on-a-rung, one-over,
    full — the compacted embed stage must produce what the uncompacted one
    does (embeddings, masking). Uses a tiny embedder so the ladder's
    4-branch switch compiles fast; real-net integration is pinned by
    test_embed_compaction_real_net_integration."""
    from frp_tpu.engine.pipeline import embed_compact_rungs

    assert embed_compact_rungs(32) == []          # small batches skip
    assert embed_compact_rungs(128) == [16, 64, 104]
    monkeypatch.setenv("FRP_EMBED_COMPACT", "0")
    assert embed_compact_rungs(128) == []         # kill switch
    monkeypatch.delenv("FRP_EMBED_COMPACT")

    rng = np.random.default_rng(0)
    params = {
        "embedder": {
            "w": rng.normal(size=(3, 16)).astype(np.float32),
            "b": rng.normal(size=(16,)).astype(np.float32),
        },
    }
    kw = dict(det_size=DET, max_faces=8, with_spoof=False,
              compute_dtype="float32", embedder_forward=_tiny_embedder)
    embed_c = build_stages(**kw)["embed"]
    b, m = 8, 8  # n = 64: rungs [8, 32, 52]
    rungs = embed_compact_rungs(b * m)
    assert rungs == [8, 32, 52]
    crops = rng.uniform(0, 255, (b, m, 112, 112, 3)).astype(np.float32)

    monkeypatch.setenv("FRP_EMBED_COMPACT", "0")
    embed_plain = build_stages(**kw)["embed"]
    monkeypatch.delenv("FRP_EMBED_COMPACT")

    # the kill switch must be captured at BUILD time (jit traces at first
    # call, which happens after delenv above): the plain build must carry
    # no lax.switch ladder while the compacted one does — without this the
    # whole comparison below would be a tautology of two compacted stages
    crops_j = jnp.asarray(crops)
    valid_j = jnp.zeros((b, m), bool)
    hlo_c = embed_c.lower(params, crops_j, valid_j, 1.3).as_text()
    hlo_p = embed_plain.lower(params, crops_j, valid_j, 1.3).as_text()
    assert "stablehlo.case" in hlo_c, "ladder missing"
    assert "stablehlo.case" not in hlo_p, (
        "FRP_EMBED_COMPACT=0 was not captured at build time")

    for nv in (0, 5, 8, 33, 52, 53, 64):
        valid = np.zeros(b * m, bool)
        valid[rng.permutation(b * m)[:nv]] = True
        valid = valid.reshape(b, m)
        out_c = jax.device_get(embed_c(params, crops, valid, 1.3))
        out_p = jax.device_get(embed_plain(params, crops, valid, 1.3))
        np.testing.assert_allclose(
            out_c["embeddings_flat"], out_p["embeddings_flat"],
            rtol=1e-4, atol=1e-5, err_msg=f"nv={nv}")
        inv = ~valid
        assert np.all(out_c["embeddings_flat"].reshape(b, m, -1)[inv] == 0)


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_embed_compaction_real_net_integration(monkeypatch):
    """One real-net case (MobileFaceNet + spoof, single compact rung via
    FRP_EMBED_RUNGS) proving the production embed stage takes the compact
    path and matches the plain build, spoof scatter included."""
    from frp_tpu.models.mobilefacenet import init_mobilefacenet
    from frp_tpu.models.mobilenetv3 import init_mobilenetv3_small

    params = {
        "embedder": init_mobilefacenet(1),
        "spoof": init_mobilenetv3_small(2),
    }
    kw = dict(det_size=DET, max_faces=8, with_spoof=True,
              compute_dtype="float32")
    rng = np.random.default_rng(0)
    b, m = 8, 8
    crops = rng.uniform(0, 255, (b, m, 112, 112, 3)).astype(np.float32)
    valid = np.zeros(b * m, bool)
    valid[rng.permutation(b * m)[:40]] = True  # < rung 48 -> compact branch
    valid = valid.reshape(b, m)

    monkeypatch.setenv("FRP_EMBED_RUNGS", "48")
    out_c = jax.device_get(build_stages(**kw)["embed"](params, crops, valid, 1.3))
    monkeypatch.setenv("FRP_EMBED_COMPACT", "0")
    out_p = jax.device_get(build_stages(**kw)["embed"](params, crops, valid, 1.3))
    np.testing.assert_allclose(
        out_c["embeddings_flat"], out_p["embeddings_flat"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        out_c["fake_prob"], out_p["fake_prob"], rtol=1e-4, atol=1e-5)
    assert np.all(out_c["fake_prob"][~valid] == 0)


def _flip_sensitive_embedder(p, x, train=False, normalize=True):
    """Tiny embedder whose value DEPENDS on left/right orientation (pools
    the left half only) — the mean-pool _tiny_embedder is flip-invariant,
    which would make a flip-TTA equivalence test a tautology."""
    left = x[:, :, : x.shape[2] // 2, :].reshape(x.shape[0], -1, 3).mean(axis=1)
    emb = jnp.tanh(left @ p["w"] + p["b"])
    return (emb, {}) if train else emb


def test_embed_stage_flip_tta_matches_manual(monkeypatch):
    """EMBED_FLIP_TTA: the embed stage must produce the renormalized mean
    of embed(crop) and embed(mirror(crop)) — for valid slots, scaled by the
    calibration constant, zero elsewhere — and compose with valid-slot
    compaction (the rung ladder runs the same _embed_core)."""
    rng = np.random.default_rng(1)
    params = {
        "embedder": {
            "w": rng.normal(size=(3, 16)).astype(np.float32),
            "b": rng.normal(size=(16,)).astype(np.float32),
        },
    }
    kw = dict(det_size=DET, max_faces=8, with_spoof=False,
              compute_dtype="float32",
              embedder_forward=_flip_sensitive_embedder)
    b, m = 8, 8
    crops = rng.uniform(0, 255, (b, m, 112, 112, 3)).astype(np.float32)
    scale = 1.3

    embed_flip = build_stages(**kw, flip_tta=True)["embed"]
    monkeypatch.setenv("FRP_EMBED_COMPACT", "0")
    embed_flip_plain = build_stages(**kw, flip_tta=True)["embed"]
    monkeypatch.delenv("FRP_EMBED_COMPACT")

    flat = crops.reshape(b * m, 112, 112, 3)
    x = (flat - 127.5) / 128.0
    e1 = np.asarray(_flip_sensitive_embedder(params["embedder"], jnp.asarray(x)))
    e2 = np.asarray(_flip_sensitive_embedder(
        params["embedder"], jnp.asarray(x[:, :, ::-1, :])))
    s = e1 + e2
    expect = s / np.maximum(np.linalg.norm(s, axis=-1, keepdims=True), 1e-12)
    assert not np.allclose(e1, e2)  # the probe embedder IS flip-sensitive

    for nv in (0, 7, 52, 64):  # empty, sparse rung, on-rung, full
        valid = np.zeros(b * m, bool)
        valid[rng.permutation(b * m)[:nv]] = True
        valid = valid.reshape(b, m)
        want = np.where(valid.reshape(-1, 1), expect * scale, 0.0)
        for stage in (embed_flip, embed_flip_plain):
            got = jax.device_get(stage(params, crops, valid, scale))
            np.testing.assert_allclose(
                got["embeddings_flat"], want, rtol=1e-4, atol=1e-5,
                err_msg=f"nv={nv}")
