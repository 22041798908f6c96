"""Unit tests: similarity alignment, warp sampling, gallery matching and the
reference's calibration formulas (face_service.py:486-506 semantics)."""

import numpy as np
import jax.numpy as jnp

from frp_tpu.ops.align import (
    ARCFACE_TEMPLATE_112,
    bbox_crop_matrices,
    invert_similarity,
    similarity_transform,
    warp_crops,
)
from frp_tpu.ops.matching import (
    calibrate_confidence,
    confidence_level,
    find_k_nearest,
    gallery_match,
    l2_normalize,
    pairwise_euclidean,
)


def _apply(m, pts):
    return pts @ np.asarray(m)[:2, :2].T + np.asarray(m)[:2, 2]


def test_similarity_recovers_known_transform(rng):
    theta = 0.3
    s = 1.7
    t = np.array([5.0, -3.0])
    rot = s * np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    src = ARCFACE_TEMPLATE_112
    dst = src @ rot.T + t
    m = np.asarray(similarity_transform(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(m[:, :2], rot, atol=1e-4)
    np.testing.assert_allclose(m[:, 2], t, atol=1e-3)
    # and it maps src onto dst
    np.testing.assert_allclose(_apply(m, src), dst, atol=1e-3)


def test_similarity_batched(rng):
    src = rng.uniform(0, 100, size=(7, 5, 2)).astype(np.float32)
    m = np.asarray(similarity_transform(jnp.asarray(src), jnp.asarray(ARCFACE_TEMPLATE_112)))
    assert m.shape == (7, 2, 3)
    # least-squares residual should not exceed the trivial (centroid) fit
    for i in range(7):
        pred = _apply(m[i], src[i])
        res = np.mean((pred - ARCFACE_TEMPLATE_112) ** 2)
        base = np.mean((ARCFACE_TEMPLATE_112 - ARCFACE_TEMPLATE_112.mean(0)) ** 2)
        assert res <= base + 1e-3


def test_invert_similarity_roundtrip(rng):
    src = rng.uniform(0, 100, size=(3, 5, 2)).astype(np.float32)
    m = similarity_transform(jnp.asarray(src), jnp.asarray(ARCFACE_TEMPLATE_112))
    inv = np.asarray(invert_similarity(m))
    for i in range(3):
        pts = _apply(np.asarray(m)[i], src[i])
        back = _apply(inv[i], pts)
        np.testing.assert_allclose(back, src[i], atol=1e-2)


def test_warp_identity_translation():
    # frame with a linear gradient; crop at offset (10, 20) with identity scale
    h = w = 64
    frame = np.zeros((1, h, w, 3), np.float32)
    frame[0, :, :, 0] = np.arange(w)[None, :]  # channel 0 = x coordinate
    frame[0, :, :, 1] = np.arange(h)[:, None]  # channel 1 = y coordinate
    m = jnp.asarray([[[1.0, 0.0, -10.0], [0.0, 1.0, -20.0]]])  # src -> dst shift
    crops = np.asarray(warp_crops(jnp.asarray(frame), m, jnp.asarray([0]), out_size=16))
    # output pixel (0,0) center 0.5 maps to source x=10.5 -> sample x-coord 10.0
    np.testing.assert_allclose(crops[0, 0, 0, 0], 10.0, atol=1e-4)
    np.testing.assert_allclose(crops[0, 0, 0, 1], 20.0, atol=1e-4)
    np.testing.assert_allclose(crops[0, 5, 3, 0], 13.0, atol=1e-4)
    np.testing.assert_allclose(crops[0, 5, 3, 1], 25.0, atol=1e-4)


def test_bbox_crop_matrices_maps_box_to_output():
    boxes = jnp.asarray([[10.0, 20.0, 110.0, 120.0]])  # 100x100 box
    m = np.asarray(bbox_crop_matrices(boxes, out_size=224))[0]
    # box center -> output center
    np.testing.assert_allclose(_apply(m, np.array([[60.0, 70.0]])), [[112.0, 112.0]], atol=1e-3)
    # box corner -> output corner
    np.testing.assert_allclose(_apply(m, np.array([[10.0, 20.0]])), [[0.0, 0.0]], atol=1e-3)


def test_pairwise_euclidean_matches_numpy(rng):
    q = rng.normal(size=(4, 128)).astype(np.float32)
    g = rng.normal(size=(9, 128)).astype(np.float32)
    got = np.asarray(pairwise_euclidean(jnp.asarray(q), jnp.asarray(g)))
    want = np.linalg.norm(q[:, None] - g[None, :], axis=-1)
    # the matmul identity loses a few mantissa bits in f32; 1e-3 relative is
    # far below anything that could flip a 0.6-threshold match decision
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


def test_gallery_match_semantics(rng):
    g = rng.normal(size=(8, 128)).astype(np.float32)
    g = np.asarray(l2_normalize(jnp.asarray(g)))
    # query = slightly perturbed gallery row 3
    q = g[3] + 0.01 * rng.normal(size=128).astype(np.float32)
    q = np.asarray(l2_normalize(jnp.asarray(q[None])))
    valid = np.ones(8, bool)
    out = gallery_match(jnp.asarray(q), jnp.asarray(g), jnp.asarray(valid), tolerance=0.6)
    assert int(out["best_idx"][0]) == 3
    assert bool(out["is_match"][0])
    assert float(out["best_distance"][0]) < 0.2


def test_gallery_match_masks_invalid_rows(rng):
    g = np.zeros((4, 16), np.float32)
    g[0] = 1.0
    q = np.ones((1, 16), np.float32)
    valid = np.array([False, True, True, True])
    out = gallery_match(jnp.asarray(q), jnp.asarray(g), jnp.asarray(valid))
    assert int(out["best_idx"][0]) != 0  # masked row can't win despite distance 0...
    # actually row 0 distance would be small; ensure it was excluded
    assert float(out["distances"][0, 0]) >= 1e5


def test_confidence_bands_reference_values():
    # reference face_service.py:486-492
    assert confidence_level(0.39) == "high"
    assert confidence_level(0.4) == "medium"
    assert confidence_level(0.59) == "medium"
    assert confidence_level(0.6) == "low"


def test_calibrated_confidence_reference_formula():
    # reference face_service.py:497-506: k=12, centered at x=0.5
    assert calibrate_confidence(0.5) == 50.0
    assert calibrate_confidence(0.0) == round(100.0 / (1.0 + np.exp(-6.0)), 2)
    assert calibrate_confidence(1.0) == round(100.0 / (1.0 + np.exp(6.0)), 2)
    assert calibrate_confidence(2.0) == calibrate_confidence(1.0)  # clipped


def test_find_k_nearest_ordering():
    d = np.array([0.5, 0.1, 0.9, 0.3])
    idx = find_k_nearest(d, 3)
    np.testing.assert_array_equal(idx, [1, 3, 0])
    assert len(find_k_nearest(d, 10)) == 4


def test_exact_topk_chunked_equals_direct():
    """The two-stage gallery top-k (matching._exact_topk, engaged above
    16384 rows) must be exactly equal to lax.top_k — including when several
    global winners land in the same chunk."""
    import jax
    import jax.numpy as jnp

    from frp_tpu.ops import matching

    rng = np.random.default_rng(0)
    n = matching._CHUNK_MIN_N  # engages the chunked path (divisible by _CHUNK)
    neg = rng.normal(size=(4, n)).astype(np.float32)
    # cluster winners: plant the global top-5 of row 0 inside ONE chunk
    neg[0, 100:105] = [9.0, 8.5, 8.0, 7.5, 7.0]
    got_v, got_i = jax.jit(matching._exact_topk, static_argnums=1)(
        jnp.asarray(neg), 5
    )
    want_v, want_i = jax.lax.top_k(jnp.asarray(neg), 5)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    assert list(np.asarray(got_i)[0]) == [100, 101, 102, 103, 104]


def test_gallery_match_large_gallery_chunked():
    """gallery_match at a chunk-path gallery size returns the same winners
    as a small-gallery scan restricted to the same live rows."""
    import jax.numpy as jnp

    from frp_tpu.ops.matching import gallery_match

    rng = np.random.default_rng(1)
    n, d = 16384, 32
    gal = rng.normal(size=(n, d)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    valid = np.zeros((n,), bool)
    valid[:5000] = True
    q = gal[[7, 4321]] + 0.01 * rng.normal(size=(2, d)).astype(np.float32)
    out = gallery_match(jnp.asarray(q), jnp.asarray(gal), jnp.asarray(valid))
    assert list(np.asarray(out["best_idx"])) == [7, 4321]
    assert np.all(np.asarray(out["best_distance"]) < 0.1)
    assert np.all(np.asarray(out["is_match"]))
    # invalid rows never win: query near an invalid row matches elsewhere
    q2 = gal[[6000]]
    out2 = gallery_match(jnp.asarray(q2), jnp.asarray(gal), jnp.asarray(valid))
    assert int(np.asarray(out2["best_idx"])[0]) < 5000
