"""Sharded FedAvg: client updates distributed over the mesh, combined with a
psum — the ICI-native replacement for the reference's single-host numpy
accumulation loop (``backend/app/routes/federated.py:617-630``).

Shape contract: client updates are stacked on a leading K axis (K = number of
clients, padded to a multiple of the data-axis size with zero-weight entries);
each device holds K/ndev updates, computes its partial weighted sum, and one
``psum`` over the 'data' axis produces the identical FedAvg result on every
device — same math as ``frp_tpu.ops.fedavg.fedavg_tree``, verified in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frp_tpu.parallel.mesh import DATA_AXIS


_FN_CACHE: dict = {}


def _local_combine(shard, w):
    def one(leaf):
        # weight math in float32: astype(leaf.dtype) on an int leaf would
        # truncate 1/K weights to ZERO and silently null the average
        wl = w.reshape((-1,) + (1,) * (leaf.ndim - 1)).astype(jnp.float32)
        partial = jnp.sum(leaf.astype(jnp.float32) * wl, axis=0)
        return jax.lax.psum(partial, axis_name=DATA_AXIS).astype(leaf.dtype)

    return jax.tree_util.tree_map(one, shard)


def fedavg_sharded(mesh: Mesh, stacked, weights: jnp.ndarray):
    """FedAvg over a mesh.

    Args:
        mesh: mesh with a 'data' axis.
        stacked: pytree with [K, ...] leaves (K divisible by mesh 'data' size —
            pad with zero-weight clients if needed; see ``pad_clients``).
        weights: [K] float weights summing to 1.
    Returns pytree of [...] leaves, replicated on all devices.
    """
    # cache the compiled fn per (mesh, structure, shapes): rebuilding the
    # shard_map + jit wrapper per call misses jit's identity-keyed cache and
    # re-traced every FL round (remote compile is 5-40 s, CLAUDE.md gotcha 9)
    leaves, treedef = jax.tree_util.tree_flatten(stacked)
    key = (
        id(mesh),
        treedef,
        tuple((l.shape, str(getattr(l, "dtype", "?"))) for l in leaves),
    )
    fn = _FN_CACHE.get(key)
    if fn is None:
        in_specs = (
            jax.tree_util.tree_map(lambda _: P(DATA_AXIS), stacked),
            P(DATA_AXIS),
        )
        out_specs = jax.tree_util.tree_map(lambda _: P(), stacked)
        fn = jax.jit(jax.shard_map(
            _local_combine, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ))
        _FN_CACHE[key] = fn
    return fn(stacked, weights)


def pad_clients(stacked, weights, multiple: int):
    """Pad the client axis to a multiple of the mesh size with zero weights."""
    k = weights.shape[0]
    pad = (-k) % multiple
    if pad == 0:
        return stacked, weights
    padded = jax.tree_util.tree_map(
        lambda leaf: jnp.concatenate(
            [leaf, jnp.zeros((pad,) + leaf.shape[1:], leaf.dtype)], axis=0
        ),
        stacked,
    )
    w = jnp.concatenate([weights, jnp.zeros((pad,), weights.dtype)])
    return padded, w
