"""Pallas TPU kernel for greedy NMS suppression.

The XLA formulation in ``frp_tpu.ops.nms`` runs the greedy pass as a
K-step ``lax.fori_loop`` of [K]-vector ops — correct, but each step is a
separately scheduled tiny HLO loop body (~25 ms/batch at K=256 on v5e, the
single largest cost in the no-spoof pipeline). Here the whole suppression
loop runs INSIDE one Pallas kernel: the [K, K] IoU matrix sits in VMEM
(256 KB at K=256) and each iteration is a VPU mask update with zero
inter-step dispatch overhead. This is the "NMS fused into Pallas kernels"
deliverable named in BASELINE.json's north star.

Grid: one program per batch row (frame); outputs the keep mask.
Exact same greedy semantics as the XLA path (tested equal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _suppress_kernel(iou_thresh: float, iou_ref, above_ref, keep_ref):
    """iou_ref: [1, K, K] f32 block; above_ref/keep_ref: [1, 1, K] f32.

    Pallas TPU doesn't lower dynamic_slice on *values*, so the loop reads
    row i via dynamic REF indexing (pl.ds) and extracts the scalar
    "is box i alive" with a one-hot masked reduction over the carried vector.
    """
    k = iou_ref.shape[-1]
    above = above_ref[0]    # [1, K] value
    rank = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, suppressed):
        row = iou_ref[0, pl.ds(i, 1), :]  # [1, K] dynamic ref read
        onehot = (rank == i).astype(jnp.float32)
        alive_i = jnp.sum(onehot * (1.0 - suppressed) * above)  # scalar
        hit = jnp.logical_and(row > iou_thresh, rank > i)
        return jnp.maximum(suppressed, jnp.where(hit, alive_i, 0.0))

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((1, k), jnp.float32))
    keep_ref[0] = (1.0 - suppressed) * above


def greedy_suppress(
    iou: jnp.ndarray, above: jnp.ndarray, iou_thresh: float = 0.4
) -> jnp.ndarray:
    """Greedy-NMS keep mask.

    Args:
        iou: [B, K, K] pairwise IoU, rows sorted by score descending.
        above: [B, K] bool — score >= conf threshold.
    Returns [B, K] bool keep mask (identical to the sequential greedy pass).
    """
    b, k, _ = iou.shape
    kernel = functools.partial(_suppress_kernel, float(iou_thresh))
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(
        iou.astype(jnp.float32),
        above.astype(jnp.float32).reshape(b, 1, k),
    )
    return out.reshape(b, k) > 0.5
