"""ArcFace training for the MobileFaceNet embedder, TPU-sharded.

Design (scaling-book style):
  * mesh axes: 'data' (batch) x 'model' (classifier classes).
  * The ArcFace classifier matrix W [D, C] is the one tensor that grows with
    the identity count (C can be millions in production face recognition), so
    it is sharded over 'model'; per-shard logits need only a global max and a
    global sum for the softmax normalizer — XLA inserts the two psums when it
    partitions the cross-entropy (we express the math globally and constrain
    shardings; no hand-written collectives needed on the forward/backward).
  * Backbone params are replicated; batch is sharded over 'data'; gradients
    all-reduce over 'data' automatically.
  * BatchNorm runs in batch-stats mode per step; running stats are updated
    from the (sharded) batch statistics — with the batch sharded over 'data'
    each device computes stats on its shard; we accept shard-local BN stats
    averaging (standard data-parallel BN) by psum-averaging via the same
    automatic partitioning.

ArcFace loss (standard): logits = s * cos(theta + m * onehot), margin m=0.5,
scale s=64, embeddings and class weights L2-normalized.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frp_tpu.models.mobilefacenet import init_mobilefacenet, mobilefacenet_forward
from frp_tpu.models import nn as fnn
from frp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def arcface_logits(
    emb: jnp.ndarray,
    w: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 0.5,
    scale: float = 64.0,
    num_real_classes: int | None = None,
) -> jnp.ndarray:
    """emb [B, D] (normalized), w [D, C] -> margined, scaled logits [B, C].

    ``num_real_classes`` < C marks the trailing columns as PADDING (the
    classifier is padded so C divides the mesh model axis) — their logits
    are driven to -inf so they never attract probability mass or gradient.
    """
    wn = w * jax.lax.rsqrt(jnp.maximum(jnp.sum(w * w, axis=0, keepdims=True), 1e-12))
    cos = jnp.clip(
        jnp.dot(emb, wn, preferred_element_type=jnp.float32), -1.0 + 1e-7, 1.0 - 1e-7
    )
    theta = jnp.arccos(cos)
    onehot = jax.nn.one_hot(labels, w.shape[1], dtype=cos.dtype)
    target = jnp.cos(theta + margin)
    # easy-margin guard: past theta = pi - m, cos(theta+m) INCREASES with
    # theta and the gradient would push hard samples further away; fall back
    # to the standard linear penalty there (cos - m*sin(m)). jnp (not
    # math.*) so margin may be a TRACED scalar — warmup schedules pass a
    # per-step margin without recompiling (deep backbones diverge if the
    # full 0.5 margin lands on random embeddings; see pretrain_embedder
    # --margin-warmup)
    guard = cos > jnp.cos(jnp.pi - margin)
    target = jnp.where(guard, target, cos - margin * jnp.sin(margin))
    out = scale * (onehot * target + (1.0 - onehot) * cos)
    if num_real_classes is not None and num_real_classes < w.shape[1]:
        col = jnp.arange(w.shape[1])
        out = jnp.where(col[None, :] < num_real_classes, out, -1e9)
    return out


def backbone_family(arch: str = "mobilefacenet"):
    """(init_fn(seed, embed_dim), forward_fn(params, x, train=)) for an
    embedder architecture name — "mobilefacenet" or an iresnet variant."""
    if arch == "mobilefacenet":
        return (
            lambda seed, embed_dim: init_mobilefacenet(seed, embed_dim=embed_dim),
            mobilefacenet_forward,
        )
    if arch.startswith("iresnet"):
        from frp_tpu.models.iresnet import init_iresnet, iresnet_forward

        return (
            lambda seed, embed_dim: init_iresnet(
                seed, variant=arch, embed_dim=embed_dim
            ),
            iresnet_forward,
        )
    raise ValueError(f"unknown embedder arch {arch!r}")


def init_train_state(
    num_classes: int,
    embed_dim: int = 128,
    seed: int = 0,
    learning_rate: float = 0.1,
    weight_decay: float = 5e-4,
    arch: str = "mobilefacenet",
):
    """Returns (state dict, optimizer). State leaves are host numpy (cheap to
    build); they land on device with the right shardings at the first step."""
    rng = np.random.default_rng(seed)
    init_fn, _fwd = backbone_family(arch)
    params = {
        "backbone": init_fn(seed, embed_dim),
        "classifier": (
            rng.normal(0, 0.01, size=(embed_dim, num_classes)).astype(np.float32)
        ),
    }
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate, momentum=0.9),
    )
    opt_state = tx.init(params)
    return {"params": params, "opt_state": opt_state, "step": np.int32(0)}, tx


def _apply_bn_updates(backbone: dict, stats: dict) -> dict:
    """Write train-mode BN stats back into the param tree (pure update).

    Two path conventions, one per embedder family: mobilefacenet stats paths
    index conv_bn composites (("blocks", 3, "dw") -> node has a "bn" child);
    iresnet paths END at a bare BN unit name (("stages", 0, 1, "bn2") ->
    node IS the bn dict)."""
    new = jax.tree_util.tree_map(lambda x: x, backbone)  # shallow-ish copy
    for path, update in stats.items():
        node = new
        for key in path:
            node = node[key]
        if "bn" in node:
            node["bn"] = {**node["bn"], "mean": update["mean"], "var": update["var"]}
        else:
            assert "mean" in node, f"bn-stats path {path} lands on {list(node)}"
            parent = new
            for key in path[:-1]:
                parent = parent[key]
            parent[path[-1]] = {
                **node, "mean": update["mean"], "var": update["var"],
            }
    return new


def make_train_step(
    tx,
    mesh: Mesh | None = None,
    scale: float = 64.0,
    compute_dtype: str = "bfloat16",
    num_real_classes: int | None = None,
    arch: str = "mobilefacenet",
):
    """Build the jitted train step. With a mesh, shards: batch over 'data',
    classifier over 'model'; everything else replicated (except the
    classifier's optimizer trace, which shards WITH the classifier)."""
    _init, backbone_forward = backbone_family(arch)

    def loss_fn(params, images, labels, margin_t):
        # uint8 batches normalize ON DEVICE: the host->device link is the
        # training bottleneck exactly as in serving (CLAUDE.md gotcha 8b) —
        # shipping uint8 instead of f32 cuts the per-step upload 4x
        if images.dtype == jnp.uint8:
            # SAME convention as serving (ops.image.normalize_face):
            # (x - 127.5) / 128 — /127.5 skewed train vs inference inputs
            images = (images.astype(jnp.dtype(compute_dtype)) - 127.5) / 128.0
        emb, bn_stats = backbone_forward(
            params["backbone"], images.astype(jnp.dtype(compute_dtype)), train=True
        )
        logits = arcface_logits(
            emb, params["classifier"], labels, margin_t, scale,
            num_real_classes=num_real_classes,
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
        return loss, (acc, bn_stats)

    def step(state, images, labels, margin_t):
        # margin_t: traced f32 scalar (weak-typed python float — distinct
        # values do NOT recompile), so warmup schedules are free
        params = state["params"]
        (loss, (acc, bn_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, labels, margin_t
        )
        updates, new_opt = tx.update(grads, state["opt_state"], params)
        new_params = optax.apply_updates(params, updates)
        new_params["backbone"] = _apply_bn_updates(new_params["backbone"], bn_stats)
        return (
            {
                "params": new_params,
                "opt_state": new_opt,
                "step": state["step"] + 1,
            },
            {"loss": loss, "accuracy": acc},
        )

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    cls_sharding = NamedSharding(mesh, P(None, MODEL_AXIS))

    def shard_tree(tree_proto):
        def leaf_sharding(path, _):
            if any(getattr(k, "key", None) == "classifier" for k in path):
                return cls_sharding
            return repl

        return jax.tree_util.tree_map_with_path(leaf_sharding, tree_proto)

    def state_shardings(state_proto):
        def opt_leaf(path, leaf):
            # optax traces mirror the param tree: the classifier momentum
            # ([D, C], the one tensor that grows with identity count) must
            # shard WITH the classifier or every device replicates it and
            # the design OOMs exactly at the scale sharding exists for
            if any(getattr(k, "key", None) == "classifier" for k in path):
                return cls_sharding
            return repl

        return {
            "params": shard_tree(state_proto["params"]),
            "opt_state": jax.tree_util.tree_map_with_path(
                opt_leaf, state_proto["opt_state"]
            ),
            "step": repl,
        }

    def make(state_proto):
        in_sh = (state_shardings(state_proto), data, data, repl)
        out_sh = (state_shardings(state_proto), repl)
        return jax.jit(
            step, in_shardings=in_sh, out_shardings=out_sh, donate_argnums=(0,)
        )

    return make


class ArcFaceTrainer:
    """Host-facing trainer: owns state, placement, and the FL delta contract.

    ``weights_delta()`` exports {layer_name: array} diffs in the flat JSON
    format the federated service's HTTP contract expects
    (``federated.py:150-265``) — clients train locally then upload.
    """

    def __init__(
        self,
        num_classes: int,
        embed_dim: int = 128,
        mesh: Mesh | None = None,
        seed: int = 0,
        learning_rate: float = 0.1,
        compute_dtype: str = "bfloat16",
        arch: str = "mobilefacenet",
        margin: float = 0.5,
    ):
        self.mesh = mesh
        self.margin = float(margin)  # default; train_step(margin=) overrides
        self.num_classes = num_classes
        self.arch = arch
        # the classifier's class axis must divide the mesh 'model' axis —
        # identity counts are arbitrary, so PAD the columns up and mask the
        # pad classes out of the loss (arcface_logits num_real_classes)
        n_model = int(mesh.shape[MODEL_AXIS]) if mesh is not None else 1
        padded = -(-num_classes // n_model) * n_model
        state, self.tx = init_train_state(
            padded, embed_dim, seed, learning_rate, arch=arch
        )
        self._initial_backbone = jax.tree_util.tree_map(
            np.copy, state["params"]["backbone"]
        )
        if mesh is None:
            self.state = jax.device_put(state)
            self._step = make_train_step(
                self.tx, None, compute_dtype=compute_dtype,
                num_real_classes=num_classes if padded != num_classes else None,
                arch=arch,
            )
        else:
            maker = make_train_step(
                self.tx, mesh, compute_dtype=compute_dtype,
                num_real_classes=num_classes if padded != num_classes else None,
                arch=arch,
            )
            self._step = maker(state)
            repl = NamedSharding(mesh, P())
            cls_sh = NamedSharding(mesh, P(None, MODEL_AXIS))

            def place_opt(path, leaf):
                if any(getattr(k, "key", None) == "classifier" for k in path):
                    return jax.device_put(leaf, cls_sh)
                return jax.device_put(leaf, repl)

            placed_params = {
                "backbone": jax.device_put(state["params"]["backbone"], repl),
                "classifier": jax.device_put(state["params"]["classifier"], cls_sh),
            }
            self.state = {
                "params": placed_params,
                "opt_state": jax.tree_util.tree_map_with_path(
                    place_opt, state["opt_state"]
                ),
                "step": jax.device_put(state["step"], repl),
            }
        self.history: list[dict] = []
        self._pending: list = []  # device metrics awaiting flush_metrics()

    def _place_batch(self, images, labels):
        if self.mesh is None:
            return jnp.asarray(images), jnp.asarray(labels)
        data = NamedSharding(self.mesh, P(DATA_AXIS))
        return jax.device_put(images, data), jax.device_put(labels, data)

    def train_step(
        self, images: np.ndarray, labels: np.ndarray, sync: bool = True,
        margin: float | None = None,
    ) -> dict | None:
        """images [B, 112, 112, 3]: float (-1..1 normalized) or uint8 (0..255,
        normalized on device — 4x less host->device traffic); labels [B] int.

        sync=False dispatches without fetching metrics (each fetch costs a
        ~29 ms relay sync); call flush_metrics() to drain them in ONE fetch.
        margin overrides the trainer default for THIS step (traced scalar, no
        recompile) — warmup schedules ramp it from 0 so deep backbones don't
        diverge on random embeddings.
        """
        arr = np.asarray(images)
        if arr.dtype != np.uint8:
            arr = np.asarray(arr, np.float32)
        images, labels = self._place_batch(arr, np.asarray(labels, np.int32))
        m_t = np.float32(self.margin if margin is None else margin)
        if self.mesh is not None:
            m_t = jax.device_put(m_t, NamedSharding(self.mesh, P()))
        self.state, metrics = self._step(self.state, images, labels, m_t)
        if not sync:
            self._pending.append(metrics)
            return None
        self.flush_metrics()  # keep history ordered if sync/async were mixed
        # ONE batched fetch for metrics + step (a second device_get costs
        # another ~29 ms relay sync); the device counter stays the source of
        # truth so checkpoint resume keeps counting correctly
        got_metrics, got_step = jax.device_get((metrics, self.state["step"]))
        entry = {k: float(v) for k, v in got_metrics.items()}
        entry["step"] = int(got_step)
        self.history.append(entry)
        return entry

    def flush_metrics(self) -> list[dict]:
        """Fetch all sync=False step metrics with a single device_get."""
        if not self._pending:
            return []
        got = jax.device_get(self._pending)
        self._pending = []
        entries = [{k: float(v) for k, v in m.items()} for m in got]
        self.history.extend(entries)
        return entries

    def embedder_params(self):
        return jax.device_get(self.state["params"]["backbone"])

    def weights_delta(self) -> dict:
        """Flat {name: delta array} vs initial backbone — the FL upload."""
        current = self.embedder_params()
        flat_now = _flatten_tree(current)
        flat_init = _flatten_tree(self._initial_backbone)
        return {k: (flat_now[k] - flat_init[k]) for k in flat_now}


def _flatten_tree(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_tree(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_tree(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out
