"""Compat shim tests: the dlib/face_recognition API surface, backed by the
engine (FakeEngine keeps this device-free); sharded-gallery matching on the
8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frp_tpu.compat import face_recognition as fr
from tests.fakes import FakeEngine


@pytest.fixture(autouse=True)
def fake_engine():
    eng = FakeEngine()
    fr.set_engine(eng)
    yield eng
    fr.set_engine(None)  # don't leak into other tests


def test_face_locations_dlib_ordering(fake_engine):
    img = np.full((80, 80, 3), 120, np.uint8)
    locs = fr.face_locations(img)
    # FakeEngine box is (x1=10, y1=10, x2=50, y2=50) -> dlib (t, r, b, l)
    assert locs == [(10, 50, 50, 10)]


def test_face_encodings_and_distance(fake_engine):
    img = np.full((80, 80, 3), 120, np.uint8)
    encs = fr.face_encodings(img)
    assert len(encs) == 1 and encs[0].shape == (128,)
    same = fr.face_encodings(img)[0]
    np.testing.assert_allclose(fr.face_distance([encs[0]], same), [0.0], atol=1e-6)
    other = fr.face_encodings(np.full((80, 80, 3), 77, np.uint8))[0]
    d = fr.face_distance([encs[0], other], same)
    assert d.shape == (2,) and d[1] > 0.5
    assert fr.compare_faces([encs[0], other], same, tolerance=0.6) == [True, False]


def test_face_landmarks_names(fake_engine):
    img = np.full((80, 80, 3), 120, np.uint8)
    lms = fr.face_landmarks(img)
    assert set(lms[0]) == {"left_eye", "right_eye", "nose_tip", "mouth_left", "mouth_right"}


def test_known_locations_filter(fake_engine):
    img = np.full((80, 80, 3), 120, np.uint8)
    encs = fr.face_encodings(img, known_face_locations=[(10, 50, 50, 10)])
    assert len(encs) == 1
    assert fr.face_distance([], encs[0]).shape == (0,)


# ---------------------------------------------------------------------------
# sharded gallery matching: gallery rows distributed over the mesh; results
# identical to the replicated gallery (the SURVEY 2.4 "gallery exceeds one
# HBM" scaling path)
# ---------------------------------------------------------------------------

def test_gallery_match_sharded_over_mesh(rng):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from frp_tpu.ops.matching import gallery_match
    from frp_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8, n_model=1)
    n, d, b = 512, 128, 4
    gallery = rng.normal(size=(n, d)).astype(np.float32)
    valid = np.ones(n, bool)
    queries = gallery[[3, 77, 200, 511]] + 0.01 * rng.normal(size=(b, d)).astype(np.float32)

    ref = gallery_match(jnp.asarray(queries), jnp.asarray(gallery), jnp.asarray(valid))

    gal_sharded = jax.device_put(gallery, NamedSharding(mesh, P("data", None)))
    val_sharded = jax.device_put(valid, NamedSharding(mesh, P("data")))
    out = gallery_match(jnp.asarray(queries), gal_sharded, val_sharded)

    np.testing.assert_array_equal(np.asarray(ref["best_idx"]), np.asarray(out["best_idx"]))
    np.testing.assert_allclose(
        np.asarray(ref["best_distance"]), np.asarray(out["best_distance"]), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out["best_idx"]), [3, 77, 200, 511])


def test_gallery_match_sharded_chunked_topk(rng):
    """The chunked exact top-k (engaged at N>=16384) must stay correct when
    the gallery is row-sharded over the mesh — the reshape to
    [b, chunks, 1024] re-partitions but GSPMD keeps the math exact."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from frp_tpu.ops import matching
    from frp_tpu.ops.matching import gallery_match
    from frp_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8, n_model=1)
    n, d = matching._CHUNK_MIN_N, 32  # engages _exact_topk's chunked path
    gallery = rng.normal(size=(n, d)).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[: n // 2] = True
    picks = [3, 777, 8000]  # 8000 within the valid half
    queries = gallery[picks] + 0.001 * rng.normal(size=(3, d)).astype(np.float32)

    ref = gallery_match(jnp.asarray(queries), jnp.asarray(gallery), jnp.asarray(valid))
    gal_sharded = jax.device_put(gallery, NamedSharding(mesh, P("data", None)))
    val_sharded = jax.device_put(valid, NamedSharding(mesh, P("data")))
    out = gallery_match(jnp.asarray(queries), gal_sharded, val_sharded)

    np.testing.assert_array_equal(np.asarray(ref["best_idx"]), np.asarray(out["best_idx"]))
    np.testing.assert_array_equal(np.asarray(out["best_idx"]), picks)
    np.testing.assert_allclose(
        np.asarray(ref["topk_distance"]), np.asarray(out["topk_distance"]), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(ref["topk_idx"]), np.asarray(out["topk_idx"])
    )
