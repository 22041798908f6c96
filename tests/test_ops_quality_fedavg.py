"""Unit tests: quality-score parity with reference formulas and FedAvg tree
math semantics (federated.py:577-700)."""

import numpy as np
import jax.numpy as jnp
import pytest

from frp_tpu.ops.fedavg import (
    FedAvgError,
    check_layer_consistency,
    fedavg_combine,
    fedavg_tree,
    resolve_weights,
    validate_client_update,
)
from frp_tpu.ops.quality import assess_quality_batch, assess_quality_host


def _synthetic_face_image(rng):
    img = rng.integers(0, 255, size=(200, 200, 3), dtype=np.uint8)
    return img


def test_quality_host_golden_components(rng):
    img = _synthetic_face_image(rng)
    # centered face, exactly 25% of area -> size_score 100, position 100
    loc = (50, 150, 150, 50)  # top, right, bottom, left (dlib order)
    q = assess_quality_host(img, loc)
    assert q["size_score"] == 100.0
    assert q["position_score"] == 100.0
    assert q["aspect_score"] == 100.0
    assert 0 <= q["score"] <= 100
    weights_sum = 0.25 + 0.2 + 0.2 + 0.2 + 0.15
    recomputed = (
        q["size_score"] * 0.25
        + q["position_score"] * 0.2
        + q["aspect_score"] * 0.2
        + q["blur_score"] * 0.2
        + q["lighting_score"] * 0.15
    )
    assert abs(recomputed - q["score"]) < 0.01
    assert weights_sum == 1.0


def test_quality_host_issues():
    img = np.full((400, 400, 3), 128, np.uint8)
    # tiny off-center face
    q = assess_quality_host(img, (0, 20, 20, 0))
    assert any("too small" in i for i in q["issues"])
    assert any("not centered" in i for i in q["issues"])
    # uniform gray crop -> zero laplacian variance -> blurry
    assert any("blurry" in i for i in q["issues"])


def test_quality_batch_geometry_matches_host(rng):
    img = _synthetic_face_image(rng)
    top, right, bottom, left = 50, 150, 150, 50
    host = assess_quality_host(img, (top, right, bottom, left))
    crop = img[top:bottom, left:right].astype(np.float32)
    out = assess_quality_batch(
        jnp.asarray(crop[None]),
        jnp.asarray([[left, top, right, bottom]], jnp.float32),
        (200, 200),
        jnp.asarray([True]),
    )
    np.testing.assert_allclose(float(out["size_score"][0]), host["size_score"], atol=0.1)
    np.testing.assert_allclose(float(out["position_score"][0]), host["position_score"], atol=0.1)
    np.testing.assert_allclose(float(out["aspect_score"][0]), host["aspect_score"], atol=0.1)
    # same-resolution crop: blur/lighting should agree closely too
    np.testing.assert_allclose(float(out["lighting_score"][0]), host["lighting_score"], atol=1.0)
    np.testing.assert_allclose(float(out["blur_score"][0]), host["blur_score"], atol=5.0)


def test_quality_batch_masks_invalid():
    crops = jnp.zeros((2, 32, 32, 3))
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    out = assess_quality_batch(crops, boxes, (100, 100), jnp.asarray([True, False]))
    assert float(out["score"][1]) == 0.0


# --- FedAvg ---

def test_validate_rejects_nan_and_inf():
    with pytest.raises(FedAvgError, match="NaN or Inf"):
        validate_client_update({"w": [1.0, float("nan")]})
    with pytest.raises(FedAvgError, match="NaN or Inf"):
        validate_client_update({"w": [float("inf")]})
    info = validate_client_update({"a": [[1.0, 2.0]], "b": [3.0]})
    assert info["layers"] == ["a", "b"]
    assert info["total_params"] == 3


def test_layer_consistency():
    with pytest.raises(FedAvgError, match="mismatch"):
        check_layer_consistency({"c1": {"a": [1]}, "c2": {"b": [1]}})
    assert check_layer_consistency({"c1": {"a": [1], "b": [2]}, "c2": {"b": [3], "a": [4]}}) == ["a", "b"]


def test_fedavg_equal_weights_golden():
    updates = {
        "c1": {"w": np.array([1.0, 2.0]), "b": np.array([0.0])},
        "c2": {"w": np.array([3.0, 4.0]), "b": np.array([2.0])},
    }
    w = resolve_weights(["c1", "c2"])
    out = fedavg_combine(updates, w)
    np.testing.assert_allclose(out["w"], [2.0, 3.0])
    np.testing.assert_allclose(out["b"], [1.0])


def test_fedavg_proportional_weights():
    w = resolve_weights(["c1", "c2"], {"c1": 3, "c2": 1}, proportional=True)
    assert w == {"c1": 0.75, "c2": 0.25}
    updates = {"c1": {"w": np.array([4.0])}, "c2": {"w": np.array([0.0])}}
    out = fedavg_combine(updates, w)
    np.testing.assert_allclose(out["w"], [3.0])
    # zero contributions fall back to equal weighting (federated.py:605-612)
    w0 = resolve_weights(["c1", "c2"], {"c1": 0, "c2": 0}, proportional=True)
    assert w0 == {"c1": 0.5, "c2": 0.5}


def test_fedavg_shape_mismatch_raises():
    updates = {"c1": {"w": np.zeros(2)}, "c2": {"w": np.zeros(3)}}
    with pytest.raises(FedAvgError, match="shape mismatch"):
        fedavg_combine(updates, {"c1": 0.5, "c2": 0.5})


def test_fedavg_tree_matches_combine(rng):
    k = 4
    arrs = [rng.normal(size=(8, 16)).astype(np.float32) for _ in range(k)]
    stacked = {"w": jnp.asarray(np.stack(arrs))}
    weights = jnp.asarray([0.1, 0.2, 0.3, 0.4], jnp.float32)
    tree_out = np.asarray(fedavg_tree(stacked, weights)["w"])
    updates = {f"c{i}": {"w": arrs[i]} for i in range(k)}
    combined = fedavg_combine(updates, {f"c{i}": float(weights[i]) for i in range(k)})
    np.testing.assert_allclose(tree_out, combined["w"], rtol=1e-5)
