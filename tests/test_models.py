"""Model tests: output shapes line up with the anchor grid, embeddings are
normalized, spoof head follows the idx1=fake convention, params round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frp_tpu.models.mobilefacenet import init_mobilefacenet, mobilefacenet_forward
from frp_tpu.models.mobilenetv3 import init_mobilenetv3_small, mobilenetv3_forward
from frp_tpu.models.params import (
    count_params,
    deterministic_params,
    load_params,
    save_params,
)
from frp_tpu.models.retinaface import init_retinaface, retinaface_forward
from frp_tpu.ops.anchors import num_anchors

DET = 256  # small detector size for CPU tests: 2*(32^2+16^2+8^2) = 2688 anchors

# models are designed to run under jit (eager op-by-op dispatch on the
# 8-virtual-device CPU backend is pathologically slow and unrepresentative)
_retina_jit = jax.jit(retinaface_forward)
_mfn_jit = jax.jit(mobilefacenet_forward, static_argnames=("train", "normalize"))
_mnv3_jit = jax.jit(mobilenetv3_forward)


@pytest.fixture(scope="module")
def retina_params():
    return init_retinaface(0)


@pytest.fixture(scope="module")
def mfn_params():
    return init_mobilefacenet(1, embed_dim=128)


def test_retinaface_head_matches_anchor_grid(retina_params):
    x = jnp.zeros((2, DET, DET, 3), jnp.float32)
    out = _retina_jit(retina_params, x)
    a = num_anchors(DET)
    assert out["loc"].shape == (2, a, 4)
    assert out["ldm"].shape == (2, a, 10)
    assert out["score"].shape == (2, a)
    s = np.asarray(out["score"])
    assert np.all((s >= 0) & (s <= 1))


def test_retinaface_bf16_input(retina_params):
    x = jnp.zeros((1, DET, DET, 3), jnp.bfloat16)
    out = _retina_jit(retina_params, x)
    assert out["loc"].dtype == jnp.float32  # heads promote to f32


def test_mobilefacenet_normalized_embeddings(mfn_params):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 112, 112, 3)), jnp.float32)
    emb = _mfn_jit(mfn_params, x)
    assert emb.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-4)
    # ~1M params, the MobileFaceNet ballpark
    n = count_params(mfn_params)
    assert 0.7e6 < n < 2.5e6


def test_mobilefacenet_train_mode_returns_bn_stats(mfn_params):
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 112, 112, 3)), jnp.float32)
    emb, stats = _mfn_jit(mfn_params, x, train=True)
    assert emb.shape == (2, 128)
    assert len(stats) > 10
    some = next(iter(stats.values()))
    assert "mean" in some and "var" in some


def test_mobilenetv3_logits_and_fake_convention():
    params = init_mobilenetv3_small(2, num_classes=2)
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    logits = _mnv3_jit(params, x)
    assert logits.shape == (2, 2)
    probs = jax.nn.softmax(logits, axis=-1)
    fake_prob = np.asarray(probs[:, 1])  # idx1 = fake (deepfake_utils.py:195-197)
    assert np.all((fake_prob >= 0) & (fake_prob <= 1))


def test_deterministic_init_is_reproducible():
    p1 = deterministic_params(init_mobilenetv3_small, seed=7)
    p2 = deterministic_params(init_mobilenetv3_small, seed=7)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_npz_roundtrip(tmp_path, mfn_params):
    path = str(tmp_path / "mfn.npz")
    save_params(path, mfn_params)
    loaded = load_params(path)
    orig = jax.tree_util.tree_leaves(mfn_params)
    back = jax.tree_util.tree_leaves(loaded)
    assert len(orig) == len(back)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure preserved: forward works on loaded params
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    emb = _mfn_jit(loaded, x)
    np.testing.assert_allclose(
        np.asarray(emb), np.asarray(_mfn_jit(mfn_params, x)), atol=1e-6
    )


def test_import_torch_weights_structural_mapping():
    """Round-trip: serialize our MobileNetV3 params as a torch-style ordered
    state dict (with fresh values), import, and verify the mapping."""
    from frp_tpu.models.params import _collect_units, import_torch_weights

    params = init_mobilenetv3_small(5, num_classes=2)
    rng = np.random.default_rng(0)

    # build a torch-style state dict in module order with NEW values
    state = {}
    expected = []
    for i, (kind, node, path) in enumerate(_collect_units(params)):
        if kind == "conv":
            w = rng.normal(size=np.shape(node["w"])).astype(np.float32)
            state[f"m{i}.weight"] = w  # already HWIO (importer contract)
            expected.append((path + "w", w))
        elif kind == "bn":
            for ours, theirs in (("gamma", "weight"), ("beta", "bias"),
                                 ("mean", "running_mean"), ("var", "running_var")):
                v = rng.normal(size=np.shape(node[ours])).astype(np.float32)
                state[f"m{i}.{theirs}"] = v
                expected.append((path + ours, v))
            state[f"m{i}.num_batches_tracked"] = np.int64(7)  # must be ignored
        elif kind == "dense":
            w = rng.normal(size=np.shape(node["w"])).astype(np.float32)
            b = rng.normal(size=np.shape(node["b"])).astype(np.float32)
            state[f"m{i}.weight"] = w.T  # torch Linear layout
            state[f"m{i}.bias"] = b
            expected.append((path + "w", w))
            expected.append((path + "b", b))
        elif kind == "prelu":
            a = rng.normal(size=np.shape(node["alpha"])).astype(np.float32)
            state[f"m{i}.weight"] = a
            expected.append((path + "alpha", a))

    copied = import_torch_weights(params, state)
    assert copied == len(expected)
    # spot-check a few mapped tensors
    units = {path: node for kind, node, path in
             __import__("frp_tpu.models.params", fromlist=["x"])._collect_units(params)}
    checked = 0
    for full_path, val in expected[:20]:
        unit_path, key = full_path.rsplit("/", 1) if "/" in full_path else ("", full_path)
        node = units[unit_path + "/"] if unit_path + "/" in units else units.get(unit_path)
        if node is None:
            continue
        np.testing.assert_array_equal(np.asarray(node[key]), val)
        checked += 1
    assert checked > 5


def test_import_torch_weights_shape_mismatch_raises():
    from frp_tpu.models.params import import_torch_weights

    params = init_mobilenetv3_small(5, num_classes=2)
    with pytest.raises(ValueError, match="module-count"):
        import_torch_weights(params, {"m0.weight": np.zeros((3, 3, 3, 16), np.float32)})


def test_iresnet_variants_shapes():
    from frp_tpu.models.iresnet import init_iresnet, iresnet_forward

    params = init_iresnet(0, variant="iresnet18", embed_dim=128)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 112, 112, 3)), jnp.float32
    )
    emb = jax.jit(iresnet_forward)(params, x)
    assert emb.shape == (2, 128)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-4)
    n = count_params(params)
    assert 10e6 < n < 35e6  # r18 with a 128-d head (24M at 512-d)
    with pytest.raises(ValueError, match="unknown variant"):
        init_iresnet(0, variant="iresnet7")


def test_engine_with_iresnet_embedder(tmp_path):
    from frp_tpu.config import load_config
    from frp_tpu.engine.pipeline import RecognitionEngine

    cfg = load_config(det_size=128, max_faces_per_frame=2, pre_nms_topk=32,
                      embedder_arch="iresnet18", det_conf_threshold=0.3)
    eng = RecognitionEngine(cfg, seed=0)
    frames = np.random.default_rng(0).integers(0, 255, (1, 128, 128, 3), np.uint8)
    out = eng.process_frames(frames)
    assert out["embeddings"].shape == (1, 2, 128)
