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
