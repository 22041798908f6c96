"""Pallas TPU kernel for the aligned-crop warp ("alignment fused into Pallas
kernels", BASELINE.json north star; VERDICT round-1 item 6b).

The XLA formulation (ops/align.py:warp_crops_batched) issues ~6.4M random
HBM gathers per 8-frame batch — measured 46.7 ms on v5e, the single largest
device-side cost in the pipeline (benchmarks/micro_pallas.py). Mosaic
supports only column-/row-preserving gathers (``take_along_axis`` with
indices shaped like the input), so an arbitrary 2-D bilinear gather cannot
be expressed directly. Instead each face is warped as:

  1. one dynamic-slice of a fixed [WIN, WIN] window around the face's
     source quad (dense VMEM reads, no gather);
  2. a horizontal shear-scale pass  tmp[r, x] = win[r, ax + br + c]
     (``take_along_axis`` along lanes, 2 bilinear taps);
  3. a vertical shear-scale pass    out[y, x] = tmp[dy + ex + f, x]
     (``take_along_axis`` along sublanes, 2 taps).

The horizontal/vertical composition reproduces the inverse similarity map
exactly in the continuous sense; interpolation is exactly bilinear for
rotation-free faces and within O(tan theta) sub-pixel of it under rotation
(faces are near-upright; the embedder is alignment-jitter trained). Faces
whose source extent exceeds WIN clamp to the window edge.

Kept because it measures faster than the XLA gather on the real chip — see
ARCHITECTURE.md's kernel microbench table for both numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from frp_tpu.ops.align import invert_similarity

WIN = 384   # source window side; faces larger than ~WIN-8 px edge-clamp
LANE = 128  # Mosaic dynamic_gather limit: source lane extent <= one vreg


def _gather_lanes_chunked(chunks: list, idx: jnp.ndarray) -> jnp.ndarray:
    """out[r, l] = src[r, idx[r, l]] where the source columns are supplied as
    LANE-wide chunks (Mosaic's lane gather handles only one vreg of source
    lanes; sublane gathers cap at 8 rows and are useless here — both limits
    measured on v5e). idx may index the full concatenated range."""
    out = jnp.zeros(idx.shape, jnp.float32)
    for ci, chunk in enumerate(chunks):
        lo = ci * LANE
        local = jnp.clip(idx - lo, 0, LANE - 1)
        hit = jnp.logical_and(idx >= lo, idx < lo + LANE)
        g = jnp.take_along_axis(chunk, local, axis=1)
        out = out + jnp.where(hit, g, 0.0)
    return out


def _warp_kernel(out_size: int, frame_ref, minv_ref, out_ref, tmp_s):
    """frame_ref: [1, 1, H, W] one channel plane (channels ride the grid —
    a trailing 3-channel dim would pad to 128 lanes and blow VMEM 42x,
    measured); minv_ref [1, 1, 2, 3]; out_ref [1, 1, 1, S, S]."""
    h, w = frame_ref.shape[2], frame_ref.shape[3]
    s = out_size
    n_chunks = WIN // LANE
    # inverse similarity (out px -> src px), read as SMEM scalars
    a, nb, tx = minv_ref[0, 0, 0, 0], minv_ref[0, 0, 0, 1], minv_ref[0, 0, 0, 2]
    bb, ay, ty = minv_ref[0, 0, 1, 0], minv_ref[0, 0, 1, 1], minv_ref[0, 0, 1, 2]
    # similarity: a == ay (s cos), nb == -bb (s sin)

    # --- window origin: CENTER the window on the mapped output square's
    # bbox, then snap to the nearest tile-aligned start (Mosaic: sublane
    # start %8, lane start %128). Centering + nearest-rounding guarantees
    # full coverage for source extents up to WIN-LANE-4 px horizontally and
    # WIN-8-4 vertically (floor-quantizing the LEFT edge, as round 1 did,
    # lost up to 127 px of reach on the right — corrupting crops of large /
    # right-edge faces; callers route bigger faces to the XLA warp, see
    # warp_crops_auto).
    def _min4(p, q, r_, t_):
        return jnp.minimum(jnp.minimum(p, q), jnp.minimum(r_, t_))

    def _max4(p, q, r_, t_):
        return jnp.maximum(jnp.maximum(p, q), jnp.maximum(r_, t_))

    xs = (tx, a * s + tx, nb * s + tx, a * s + nb * s + tx)
    ys = (ty, bb * s + ty, ay * s + ty, bb * s + ay * s + ty)
    cx = (_min4(*xs) + _max4(*xs)) * 0.5
    cy = (_min4(*ys) + _max4(*ys)) * 0.5
    ox_f = jnp.clip(cx - float(WIN) / 2.0, 0.0, float(w - WIN))
    oy_f = jnp.clip(cy - float(WIN) / 2.0, 0.0, float(h - WIN))
    # nearest aligned start, re-clipped into range (w-WIN/h-WIN are tile
    # multiples by the caller's geometry guard)
    ox = jnp.clip(
        jnp.floor(ox_f / LANE + 0.5) * LANE, 0.0, float(w - WIN)
    ).astype(jnp.int32)
    oy = jnp.clip(jnp.floor(oy_f / 8.0 + 0.5) * 8.0, 0.0, float(h - WIN)).astype(
        jnp.int32
    )
    oy = pl.multiple_of(oy, 8)
    ox = pl.multiple_of(ox, LANE)

    # --- exact index-space coordinates (mirrors ops.align's convention:
    # output pixel centers x+0.5, array-index sampling offset -0.5) ---
    # reference: sx_idx = a*(x+.5) + nb*(y+.5) + tx - .5  (window: -ox)
    #            sy_idx = bb*(x+.5) + ay*(y+.5) + ty - .5  (window: -oy)
    # pass 2 (vertical):   v(y, x) = ay*(y+.5) + bb*(x+.5) + ty2
    # pass 1 (horizontal): u(r, x) = alpha*(x+.5) + beta*r + gamma
    #   with beta = nb/ay, alpha = a - beta*bb, gamma = tx2 - beta*ty2
    # (substituting the continuous source row r for sy_idx)
    tx2 = tx - ox.astype(jnp.float32) - 0.5
    ty2 = ty - oy.astype(jnp.float32) - 0.5
    ay_safe = jnp.where(jnp.abs(ay) < 1e-3, jnp.where(ay < 0, -1e-3, 1e-3), ay)
    beta = nb / ay_safe
    alpha = a - beta * bb
    gamma = tx2 - beta * ty2

    # pass 1 produces tmp [WIN rows, LANE out-cols] (only s<=128 cols needed)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (WIN, LANE), 0).astype(jnp.float32)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (WIN, LANE), 1).astype(jnp.float32)
    u = alpha * (cols_w + 0.5) + beta * rows_w + gamma
    # clip to WIN-1 (not WIN-2): when the source quad runs past the frame
    # edge the window's last column IS the frame's last column, and the XLA
    # warp clamps samples there — WIN-2 landed one pixel short (visible on
    # noise at the exact boundary)
    u = jnp.clip(u, 0.0, float(WIN - 1))
    u0 = jnp.floor(u)
    fu = u - u0
    u0i = u0.astype(jnp.int32)

    # pass 2 gathers tmp ROWS; after transpose they are lanes. Output tile
    # is [LANE, LANE] (covers s<=128): vT[x, y] = ay*(y+.5) + bb*(x+.5) + ty2
    yy = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0).astype(jnp.float32)
    vt = ay * (yy + 0.5) + bb * (xx + 0.5) + ty2
    vt = jnp.clip(vt, 0.0, float(WIN - 1))  # see u's boundary note
    v0 = jnp.floor(vt)
    fv = vt - v0
    v0i = v0.astype(jnp.int32)

    # source chunks read densely from the frame ref (no window copy)
    chunks = [
        frame_ref[0, 0, pl.ds(oy, WIN), pl.ds(ox + ci * LANE, LANE)].astype(
            jnp.float32
        )
        for ci in range(n_chunks)
    ]
    tmp_s[:, :] = (
        _gather_lanes_chunked(chunks, u0i) * (1.0 - fu)
        + _gather_lanes_chunked(chunks, jnp.minimum(u0i + 1, WIN - 1)) * fu
    )
    tmp_t = jnp.transpose(tmp_s[:, :])  # [LANE, WIN]: rows become lanes
    tchunks = [tmp_t[:, ci * LANE : (ci + 1) * LANE] for ci in range(n_chunks)]
    crop_t = (
        _gather_lanes_chunked(tchunks, v0i) * (1.0 - fv)
        + _gather_lanes_chunked(tchunks, jnp.minimum(v0i + 1, WIN - 1)) * fv
    )  # [x, y] layout
    out_ref[0, 0, 0, :, :] = jnp.transpose(crop_t)[0:s, 0:s]


@functools.partial(jax.jit, static_argnames=("out_size",))
def warp_crops_batched_pallas(
    frames: jnp.ndarray, matrices: jnp.ndarray, out_size: int = 112
) -> jnp.ndarray:
    """Drop-in for ops.align.warp_crops_batched: frames [B, H, W, C],
    matrices [B, M, 2, 3] forward similarity -> [B, M, S, S, C] f32."""
    b, h, w, c = frames.shape
    m = matrices.shape[1]
    assert h >= WIN and w >= WIN, (h, w, WIN)
    # centered-window coverage math requires tile-multiple slice ranges
    assert w % LANE == 0 and h % 8 == 0, (h, w)
    assert out_size <= LANE, (out_size, LANE)
    inv = invert_similarity(matrices)  # [B, M, 2, 3]
    planar = jnp.moveaxis(frames.astype(jnp.float32), -1, 1)  # [B, C, H, W]
    kernel = functools.partial(_warp_kernel, out_size)
    out = pl.pallas_call(
        kernel,
        grid=(b, c, m),  # channel before face: frame plane reused across M
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, k, j: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, 3), lambda i, k, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, out_size, out_size), lambda i, k, j: (i, k, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, m, out_size, out_size), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WIN, LANE), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(planar, inv)
    return jnp.moveaxis(out, 1, -1)  # [B, M, S, S, C]


def pallas_coverage_ok(matrices: jnp.ndarray, out_size: int = 112) -> jnp.ndarray:
    """Scalar bool: every face's source extent fits the kernel's provable
    window coverage (centered start, nearest tile rounding): extent_x <=
    WIN-LANE-4, extent_y <= WIN-8-4. Oversized faces (a closeup selfie can
    fill the whole det square) must take the XLA warp or their crops
    edge-clamp."""
    inv = invert_similarity(matrices)  # out px -> src px
    s = float(out_size)
    ext_x = s * (jnp.abs(inv[..., 0, 0]) + jnp.abs(inv[..., 0, 1]))
    ext_y = s * (jnp.abs(inv[..., 1, 0]) + jnp.abs(inv[..., 1, 1]))
    return jnp.logical_and(
        jnp.all(ext_x <= float(WIN - LANE - 4)),
        jnp.all(ext_y <= float(WIN - 8 - 4)),
    )


def warp_crops_auto(
    frames: jnp.ndarray, matrices: jnp.ndarray, out_size: int = 112
) -> jnp.ndarray:
    """Pallas warp when every face provably fits the kernel window, exact
    XLA warp otherwise — ONE lax.cond per batch, so the 46.7 ms gather
    formulation only executes for batches that actually contain an
    oversized face (rare in surveillance scans; routine for enroll
    selfies, which the engine letterboxes to the det square)."""
    from frp_tpu.ops.align import warp_crops_batched

    return jax.lax.cond(
        pallas_coverage_ok(matrices, out_size),
        lambda fm: warp_crops_batched_pallas(fm[0], fm[1], out_size=out_size),
        lambda fm: warp_crops_batched(fm[0], fm[1], out_size=out_size),
        (frames, matrices),
    )
