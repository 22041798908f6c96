"""Training tests: ArcFace math, single-device step, and the dp x tp sharded
step on the virtual 8-device CPU mesh (SURVEY.md section 4 item 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frp_tpu.ops.fedavg import validate_client_update
from frp_tpu.parallel.mesh import make_mesh
from frp_tpu.train.arcface import ArcFaceTrainer, arcface_logits


def test_arcface_logits_margin_semantics():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(4, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    w = rng.normal(size=(16, 8)).astype(np.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    with_margin = np.asarray(arcface_logits(jnp.asarray(emb), jnp.asarray(w), labels))
    no_margin = np.asarray(
        arcface_logits(jnp.asarray(emb), jnp.asarray(w), labels, margin=0.0)
    )
    # margin only penalizes the true-class logit
    for i in range(4):
        true = labels[i]
        assert with_margin[i, true] < no_margin[i, true]
        others = [c for c in range(8) if c != true]
        np.testing.assert_allclose(
            with_margin[i, others], no_margin[i, others], rtol=1e-5
        )
    # scale: all logits bounded by s
    assert np.all(np.abs(with_margin) <= 64.0 + 1e-3)


def test_arcface_margin_traced_scalar():
    """The margin rides the jitted step as a TRACED scalar (warmup schedules
    pass a different value every step): arcface_logits under jit with a
    traced margin must (a) trace without error — the easy-margin guard is
    jnp, not math.* — and (b) match the eager python-float result exactly,
    including margin 0.0 == plain scaled softmax logits on the true class."""
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(4, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    w = rng.normal(size=(16, 8)).astype(np.float32)
    labels = jnp.asarray([0, 1, 2, 3])

    jitted = jax.jit(
        lambda m: arcface_logits(jnp.asarray(emb), jnp.asarray(w), labels, m)
    )
    for m in (0.0, 0.17, 0.5):
        eager = np.asarray(
            arcface_logits(jnp.asarray(emb), jnp.asarray(w), labels, margin=m)
        )
        np.testing.assert_allclose(np.asarray(jitted(m)), eager, rtol=1e-5)
    # m=0: the margined true-class logit degenerates to the plain cos logit
    zero = np.asarray(jitted(0.0))
    plain = np.asarray(
        arcface_logits(jnp.asarray(emb), jnp.asarray(w), labels, margin=0.0)
    )
    np.testing.assert_allclose(zero, plain, rtol=1e-6)


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_train_step_margin_override_changes_loss_only_via_margin():
    """train_step(margin=) feeds the schedule through without recompiling:
    two steps from identical state with different margins produce different
    losses (the margin is live), and a margin-0 step's loss is below the
    margin-0.5 step's from the same state (the penalty only ever adds)."""
    rng = np.random.default_rng(2)
    images, labels = _toy_batch(rng)
    t1 = ArcFaceTrainer(num_classes=8, learning_rate=0.05, seed=3)
    t2 = ArcFaceTrainer(num_classes=8, learning_rate=0.05, seed=3)
    m1 = t1.train_step(images, labels, margin=0.0)
    m2 = t2.train_step(images, labels, margin=0.5)
    assert m1["loss"] < m2["loss"]


def _toy_batch(rng, b=8, classes=8):
    images = rng.normal(0, 0.5, size=(b, 112, 112, 3)).astype(np.float32)
    labels = rng.integers(0, classes, size=(b,)).astype(np.int32)
    return images, labels


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_single_device_training_reduces_loss():
    trainer = ArcFaceTrainer(num_classes=8, learning_rate=0.05, seed=0)
    rng = np.random.default_rng(0)
    images, labels = _toy_batch(rng)
    losses = [trainer.train_step(images, labels)["loss"] for _ in range(5)]
    assert losses[-1] < losses[0]  # memorizes a fixed batch
    assert trainer.history[-1]["step"] == 5


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_sharded_training_on_mesh():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.devices.size == 8
    trainer = ArcFaceTrainer(num_classes=16, mesh=mesh, learning_rate=0.05, seed=0)
    rng = np.random.default_rng(1)
    images, labels = _toy_batch(rng, b=8, classes=16)
    m1 = trainer.train_step(images, labels)
    m2 = trainer.train_step(images, labels)
    assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
    assert m2["loss"] < m1["loss"]
    # classifier is sharded over the model axis
    cls = trainer.state["params"]["classifier"]
    spec = cls.sharding.spec
    assert "model" in str(spec)


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_sharded_matches_single_device_step():
    """One dp x tp step computes the same update as single-device (f32 so
    bf16 partition-order noise doesn't mask real sharding bugs)."""
    rng = np.random.default_rng(2)
    images, labels = _toy_batch(rng, b=8, classes=16)
    t1 = ArcFaceTrainer(num_classes=16, seed=3, learning_rate=0.1,
                        compute_dtype="float32")
    t2 = ArcFaceTrainer(num_classes=16, mesh=make_mesh(n_data=4, n_model=2),
                        seed=3, learning_rate=0.1, compute_dtype="float32")
    m1 = t1.train_step(images, labels)
    m2 = t2.train_step(images, labels)
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-4)
    w1 = np.asarray(jax.device_get(t1.state["params"]["classifier"]))
    w2 = np.asarray(jax.device_get(t2.state["params"]["classifier"]))
    np.testing.assert_allclose(w1, w2, atol=1e-3)


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_weights_delta_feeds_federated_contract():
    trainer = ArcFaceTrainer(num_classes=8, seed=0, learning_rate=0.05)
    rng = np.random.default_rng(0)
    images, labels = _toy_batch(rng)
    trainer.train_step(images, labels)
    delta = trainer.weights_delta()
    assert len(delta) > 50  # every backbone tensor has a named delta
    info = validate_client_update(delta)  # NaN/Inf-free, FL-uploadable
    assert info["total_params"] > 5e5
    assert any(v.any() for v in delta.values())  # training actually moved weights


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_checkpoint_roundtrip(tmp_path):
    from frp_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    trainer = ArcFaceTrainer(num_classes=8, seed=0, learning_rate=0.05)
    rng = np.random.default_rng(0)
    images, labels = _toy_batch(rng)
    trainer.train_step(images, labels)
    path = str(tmp_path / "ckpt")
    backend = save_checkpoint(path, trainer.state)
    assert backend in ("orbax", "npz")

    # fresh trainer resumes to identical state
    t2 = ArcFaceTrainer(num_classes=8, seed=99, learning_rate=0.05)
    restored = load_checkpoint(path, like=t2.state)
    assert restored is not None
    assert int(np.asarray(restored["step"])) == 1
    w_saved = np.asarray(jax.device_get(trainer.state["params"]["classifier"]))
    np.testing.assert_allclose(
        np.asarray(restored["params"]["classifier"]), w_saved, rtol=1e-6
    )
    # continuing from the restored state trains further
    t2.state = jax.device_put(restored)
    m = t2.train_step(images, labels)
    assert m["step"] == 2 and np.isfinite(m["loss"])


def test_spoof_trainer_overfits_and_feeds_engine():
    from frp_tpu.models.mobilenetv3 import mobilenetv3_forward
    from frp_tpu.ops.image import normalize_imagenet
    from frp_tpu.train.classifier import SpoofTrainer

    trainer = SpoofTrainer(seed=0, learning_rate=2e-3, compute_dtype="float32")
    rng = np.random.default_rng(0)
    # separable toy task: bright crops = fake, dark = real
    real = rng.normal(60, 10, size=(4, 64, 64, 3)).astype(np.float32)
    fake = rng.normal(200, 10, size=(4, 64, 64, 3)).astype(np.float32)
    images = np.concatenate([real, fake])
    labels = np.array([0] * 4 + [1] * 4, np.int32)
    metrics = [trainer.train_step(images, labels) for _ in range(8)]
    assert metrics[-1]["loss"] < metrics[0]["loss"]
    assert metrics[-1]["accuracy"] >= 0.75
    # trained params flow into the honest weights_loaded reporting path
    params = trainer.classifier_params()
    import jax.numpy as jnp
    logits = jax.jit(mobilenetv3_forward)(
        params, normalize_imagenet(jnp.asarray(images)).astype(jnp.float32)
    )
    pred = np.argmax(np.asarray(logits), -1)
    assert (pred == labels).mean() >= 0.75


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_train_step_uint8_and_deferred_metrics():
    """uint8 batches (device-side normalization) must train the same as the
    pre-normalized f32 path, and sync=False defers metric fetches until
    flush_metrics()."""
    import numpy as np

    from frp_tpu.train.arcface import ArcFaceTrainer

    rng = np.random.default_rng(0)
    images_u8 = rng.integers(0, 255, (8, 112, 112, 3)).astype(np.uint8)
    images_f32 = (images_u8.astype(np.float32) - 127.5) / 128.0  # serving convention
    labels = rng.integers(0, 16, (8,)).astype(np.int32)

    a = ArcFaceTrainer(num_classes=16, seed=3)
    b = ArcFaceTrainer(num_classes=16, seed=3)
    ea = a.train_step(images_f32, labels)
    assert b.train_step(images_u8, labels, sync=False) is None
    assert not b.history  # nothing fetched yet
    ebs = b.flush_metrics()
    assert len(ebs) == 1 and b.history
    # same math; normalization happens in bf16 on device vs f32 on host,
    # so allow sub-percent relative drift
    assert abs(ea["loss"] - ebs[0]["loss"]) / ea["loss"] < 0.01
    # deferred steps keep training (state advances)
    for _ in range(2):
        b.train_step(images_u8, labels, sync=False)
    assert len(b.flush_metrics()) == 2 and len(b.history) == 3


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_trainer_pads_classes_to_model_axis():
    """num_classes need not divide the mesh 'model' axis: the classifier is
    padded up and pad columns are masked out of the loss (previously a
    ValueError at device placement for e.g. 62 identities on model=4)."""
    import numpy as np

    from frp_tpu.parallel.mesh import make_mesh
    from frp_tpu.train.arcface import ArcFaceTrainer

    mesh = make_mesh(n_data=2, n_model=4)
    t = ArcFaceTrainer(num_classes=62, mesh=mesh, seed=0)
    assert t.state["params"]["classifier"].shape[1] == 64  # padded
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (8, 112, 112, 3)).astype(np.uint8)
    labels = rng.integers(0, 62, (8,)).astype(np.int32)
    m = t.train_step(images, labels)
    assert np.isfinite(m["loss"])
    # the classifier momentum shards with the classifier (no full replication)
    import jax

    def find_cls(path, leaf):
        if any(getattr(k, "key", None) == "classifier" for k in path):
            found.append(leaf)
        return leaf

    found = []
    jax.tree_util.tree_map_with_path(find_cls, t.state["opt_state"])
    assert found, "no classifier leaf in opt state"
    for leaf in found:
        if hasattr(leaf, "sharding"):
            assert "model" in str(leaf.sharding.spec), leaf.sharding


def test_stale_orbax_dir_removed_on_npz_fallback(tmp_path, monkeypatch):
    """If a later save falls back to npz, the earlier orbax dir must not
    shadow it on restore (silently resuming from the OLD step)."""
    import numpy as np

    from frp_tpu.train import checkpoint as cp

    state1 = {"step": np.int32(1), "w": np.ones(3, np.float32)}
    state2 = {"step": np.int32(2), "w": np.full(3, 2.0, np.float32)}
    path = str(tmp_path / "ck")
    first = cp.save_checkpoint(path, state1)
    # force the npz fallback for the second save
    import builtins
    real_import = builtins.__import__

    def no_orbax(name, *a, **k):
        if name.startswith("orbax"):
            raise ImportError("forced")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_orbax)
    assert cp.save_checkpoint(path, state2) == "npz"
    monkeypatch.setattr(builtins, "__import__", real_import)
    restored = cp.load_checkpoint(path, like=state1)
    assert restored is not None
    assert int(np.asarray(restored["step"])) == 2, "stale checkpoint shadowed"


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_sharded_training_at_100k_classes():
    """The design note says 'C can be millions' (train/arcface.py:5-7) —
    exercise the sharded classifier at production scale (VERDICT r2 #7):
    C=100k on the 8-device mesh, with the memory math asserted (each device
    holds exactly C/n_model classifier + momentum columns, NOT a replica)
    and the step numerically equal to the unsharded step."""
    import jax

    C, D, B = 100_000, 128, 8
    mesh = make_mesh(n_data=4, n_model=2)
    sharded = ArcFaceTrainer(num_classes=C, mesh=mesh, learning_rate=0.05,
                             seed=5)
    # memory math: classifier [D, C] f32 shards over 'model'
    w = sharded.state["params"]["classifier"]
    assert w.shape == (D, C)
    shard = w.addressable_shards[0]
    assert shard.data.shape == (D, C // 2), shard.data.shape
    assert shard.data.nbytes == D * (C // 2) * 4
    # the momentum trace shards WITH the classifier (the OOM trap)
    mom_leaves = [
        leaf for path, leaf in jax.tree_util.tree_leaves_with_path(
            sharded.state["opt_state"])
        if hasattr(leaf, "addressable_shards") and leaf.shape == (D, C)
    ]
    assert mom_leaves, "classifier momentum not found in opt state"
    for leaf in mom_leaves:
        assert leaf.addressable_shards[0].data.shape == (D, C // 2)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(B, 112, 112, 3), dtype=np.uint8)
    labels = rng.integers(0, C, size=(B,)).astype(np.int32)
    m_sharded = sharded.train_step(images, labels)
    assert np.isfinite(m_sharded["loss"])
    # at init the s=64-scaled margin pushes loss well above the plain
    # softmax's ln(C) ~= 11.5; it must still be in the sane ArcFace band
    assert np.log(C) < m_sharded["loss"] < np.log(C) + 64, m_sharded

    single = ArcFaceTrainer(num_classes=C, learning_rate=0.05, seed=5)
    m_single = single.train_step(images, labels)
    np.testing.assert_allclose(m_sharded["loss"], m_single["loss"],
                               rtol=2e-2)


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_iresnet_arch_training_path():
    """The hard-tier capacity path (VERDICT r3 #4): ArcFace training must
    work for the iresnet family — train-mode BN stats flow back into the
    bare-BN-unit tree convention, loss is finite and decreases, and the
    trained backbone serves through the inference forward."""
    import jax

    from frp_tpu.models.iresnet import iresnet_forward

    trainer = ArcFaceTrainer(
        num_classes=4, arch="iresnet18", learning_rate=0.05, seed=0,
        compute_dtype="float32",
    )
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (8, 112, 112, 3)).astype(np.float32)
    y = rng.integers(0, 4, (8,)).astype(np.int32)
    losses = [trainer.train_step(x, y)["loss"] for _ in range(5)]
    assert np.isfinite(losses).all()
    # the margin loss is noisy at step 2 (scale-64 logits, momentum SGD);
    # a few steps on a FIXED batch must still trend down
    assert min(losses[2:]) < losses[0]
    p = trainer.embedder_params()
    # both BN path conventions updated: bare units at top level and in blocks
    assert np.abs(p["stem_bn"]["mean"]).sum() > 0
    assert np.abs(p["stages"][0][0]["bn2"]["mean"]).sum() > 0
    assert np.abs(p["feat_bn"]["mean"]).sum() > 0
    emb = np.asarray(iresnet_forward(jax.device_put(p), x[:2]))
    assert emb.shape == (2, 128) and np.isfinite(emb).all()
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)
