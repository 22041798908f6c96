"""Training checkpoint/resume.

The reference has no training loop, so its "checkpoints" are JSON weight
files and Mongo docs (SURVEY.md section 5). Here full train state (params +
optimizer + step) checkpoints through orbax when available, with a
self-contained npz fallback (same tree flattening as models/params.py), so
resume works in any image.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from frp_tpu.utils.logger import get_logger

logger = get_logger("frp.train.checkpoint")


def save_checkpoint(path: str, state: dict) -> str:
    """Save train state; returns the backend used ('orbax' or 'npz')."""
    host_state = jax.device_get(state)
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        target = os.path.abspath(path)
        ckpt.save(target, host_state, force=True)
        ckpt.wait_until_finished()
        return "orbax"
    except Exception as e:  # orbax missing or incompatible tree: npz fallback
        logger.info("orbax save unavailable (%s); using npz", e)
    # structure-agnostic fallback: save leaves by index; restore requires a
    # structurally-identical `like` state (always available on resume)
    target = os.path.abspath(path)
    if os.path.isdir(target):
        # a STALE orbax dir from an earlier successful save would shadow
        # this npz on restore (load prefers the dir) — training would
        # silently resume from the old step
        import shutil

        shutil.rmtree(target, ignore_errors=True)
    leaves = jax.tree_util.tree_leaves(host_state)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    tmp = path + ".npz.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    os.replace(tmp, path + ".npz")
    return "npz"


def load_checkpoint(path: str, like: dict | None = None) -> dict | None:
    """Load train state saved by save_checkpoint; None when absent.
    ``like`` (a state with the right structure) enables orbax restore."""
    target = os.path.abspath(path)
    if os.path.isdir(target) and like is not None:
        try:
            import orbax.checkpoint as ocp

            ckpt = ocp.StandardCheckpointer()
            return ckpt.restore(target, jax.device_get(like))
        except Exception as e:
            logger.info("orbax load failed (%s)", e)
    npz = path + ".npz"
    if os.path.exists(npz) and like is not None:
        with np.load(npz, allow_pickle=False) as data:
            leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
        host_like = jax.device_get(like)
        like_leaves, treedef = jax.tree_util.tree_flatten(host_like)
        if len(leaves) != len(like_leaves):
            logger.warning(
                "checkpoint %s has %d leaves but the target state has %d "
                "(different config?); refusing to restore",
                npz, len(leaves), len(like_leaves))
            return None
        for i, (a, b) in enumerate(zip(leaves, like_leaves)):
            if np.shape(a) != np.shape(b):
                # restoring by index with mismatched shapes would load a
                # checkpoint from a different run config (e.g. another
                # --identities count) and silently corrupt training — the
                # padded-class one_hot masks the error instead of raising
                logger.warning(
                    "checkpoint %s leaf %d shape %s != target %s "
                    "(different config?); refusing to restore",
                    npz, i, np.shape(a), np.shape(b))
                return None
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return None
