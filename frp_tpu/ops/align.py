"""5-point similarity-transform face alignment, fully on-device.

Replaces dlib's shape-predictor alignment and InsightFace's skimage-based
``norm_crop`` (reference pipeline: ``face_recognition.face_encodings`` aligns
internally via dlib C++, ``backend/app/services/face_service.py:179``). Here:

1. ``similarity_transform`` — least-squares 4-parameter similarity (scale,
   rotation, translation; no reflection) from detected 5-point landmarks to the
   canonical ArcFace 112x112 template. Closed form, no SVD, so it vectorizes
   over thousands of faces as a handful of VPU reductions.
2. ``warp_crops`` — inverse-warp bilinear sampler: for each output pixel,
   compute source coords via the inverted transform and gather 4 neighbors.
   Expressed as one big gather per face (vmap'd), keeping the crop+align step
   on-device instead of a host round-trip (SURVEY.md section 7 "gather-heavy
   alignment").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Canonical ArcFace 112x112 landmark template (left eye, right eye, nose,
# left mouth, right mouth) — the de-facto standard for 112x112 face crops.
ARCFACE_TEMPLATE_112 = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)


def similarity_transform(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """LSQ similarity transform mapping src -> dst.

    Args:
        src: [..., P, 2] source landmarks.
        dst: [P, 2] or broadcastable [..., P, 2] destination template.
    Returns:
        [..., 2, 3] affine matrices M with dst ~= M[:, :2] @ src + M[:, 2].
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.broadcast_to(jnp.asarray(dst, jnp.float32), src.shape)
    mu_s = jnp.mean(src, axis=-2, keepdims=True)
    mu_d = jnp.mean(dst, axis=-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d
    var_s = jnp.sum(sc * sc, axis=(-2, -1))  # [...]
    var_s = jnp.maximum(var_s, 1e-12)
    a = jnp.sum(sc * dc, axis=(-2, -1)) / var_s
    b = jnp.sum(sc[..., 0] * dc[..., 1] - sc[..., 1] * dc[..., 0], axis=-1) / var_s
    rot = jnp.stack(
        [jnp.stack([a, -b], axis=-1), jnp.stack([b, a], axis=-1)], axis=-2
    )  # [..., 2, 2]
    t = mu_d[..., 0, :] - jnp.einsum("...ij,...j->...i", rot, mu_s[..., 0, :])
    return jnp.concatenate([rot, t[..., None]], axis=-1)  # [..., 2, 3]


def invert_similarity(m: jnp.ndarray) -> jnp.ndarray:
    """Invert [..., 2, 3] similarity matrices (closed form)."""
    a = m[..., 0, 0]
    b = m[..., 1, 0]
    det = jnp.maximum(a * a + b * b, 1e-12)
    ia = a / det
    ib = -b / det
    rot = jnp.stack(
        [jnp.stack([ia, -ib], axis=-1), jnp.stack([ib, ia], axis=-1)], axis=-2
    )
    t = -jnp.einsum("...ij,...j->...i", rot, m[..., :, 2])
    return jnp.concatenate([rot, t[..., None]], axis=-1)


def bbox_crop_matrices(boxes: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Similarity matrices mapping a bbox crop onto [0, out_size)^2.

    Non-uniform bbox aspect is handled by scaling the longer side (letterbox
    semantics match a plain resize of the square-expanded crop). Used for the
    spoof classifier path (reference crops bbox then resizes to 224:
    ``backend/app/utils/deepfake_utils.py:153-162``).
    """
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    w = jnp.maximum(x2 - x1, 1e-3)
    h = jnp.maximum(y2 - y1, 1e-3)
    side = jnp.maximum(w, h)
    s = out_size / side
    cx = (x1 + x2) / 2.0
    cy = (y1 + y2) / 2.0
    zeros = jnp.zeros_like(s)
    tx = out_size / 2.0 - s * cx
    ty = out_size / 2.0 - s * cy
    row0 = jnp.stack([s, zeros, tx], axis=-1)
    row1 = jnp.stack([zeros, s, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)  # [..., 2, 3]


def _bilinear_sample(frame: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample frame [H, W, C] at float coords xs, ys [S, S] -> [S, S, C].

    Coords are clamped in FLOAT space before the int conversion: degenerate
    alignment transforms (padded detection slots, collapsed landmarks) produce
    coordinates up to ~1e12, and feeding those through floor/convert/gather
    empirically drops the v5e gather into a ~50 ms slow path (47 ms vs 0.02 ms
    per batch for identical shapes). Clamping restores the fast path, and
    out-of-frame samples clamp to the border pixel (same semantics as the
    Pallas warp).
    """
    h, w = frame.shape[0], frame.shape[1]
    # clamp to the border in FLOAT space, BEFORE floor: weights computed
    # from an unclamped floor against clamped indices returned the
    # second-to-last pixel for samples at/past the edge (xs = w-1 gave
    # wx = 0 with x0 clamped to w-2) and extrapolated beyond it — the
    # Pallas warp clamps correctly, so the "tested equal" paths diverged
    # on edge faces
    xs = jnp.clip(xs, 0.0, float(w - 1))
    ys = jnp.clip(ys, 0.0, float(h - 1))
    x0 = jnp.minimum(jnp.floor(xs).astype(jnp.int32), w - 2)
    y0 = jnp.minimum(jnp.floor(ys).astype(jnp.int32), h - 2)
    # weights against the CLAMPED index (xs = w-1 -> x0 = w-2, wx = 1 ->
    # exactly the border pixel)
    wx = (xs - x0.astype(jnp.float32))[..., None]
    wy = (ys - y0.astype(jnp.float32))[..., None]
    x1 = x0 + 1
    y1 = y0 + 1
    flat = frame.reshape(h * w, -1)

    def gather(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=0)

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


@partial(jax.jit, static_argnames=("out_size",))
def warp_crops(
    frames: jnp.ndarray,
    matrices: jnp.ndarray,
    frame_idx: jnp.ndarray,
    out_size: int = 112,
) -> jnp.ndarray:
    """Inverse-warp crops from frames.

    Args:
        frames: [F, H, W, C] float source frames.
        matrices: [N, 2, 3] forward similarity (source px -> output px).
        frame_idx: [N] int32 — which frame each face came from.
        out_size: output crop side S.
    Returns:
        [N, S, S, C] bilinear-sampled crops.
    """
    inv = invert_similarity(matrices)  # output px -> source px
    grid = jnp.arange(out_size, dtype=jnp.float32) + 0.5  # pixel centers
    gy, gx = jnp.meshgrid(grid, grid, indexing="ij")  # [S, S]

    def one(minv, fidx):
        sx = minv[0, 0] * gx + minv[0, 1] * gy + minv[0, 2]
        sy = minv[1, 0] * gx + minv[1, 1] * gy + minv[1, 2]
        frame = jnp.take(frames, fidx, axis=0)
        return _bilinear_sample(frame, sx - 0.5, sy - 0.5)

    return jax.vmap(one)(inv, frame_idx.astype(jnp.int32))


@partial(jax.jit, static_argnames=("out_size",))
def warp_crops_batched(
    frames: jnp.ndarray, matrices: jnp.ndarray, out_size: int = 112
) -> jnp.ndarray:
    """SPMD-friendly variant: faces stay grouped under their frame.

    Args:
        frames: [B, H, W, C]; matrices: [B, M, 2, 3] (source px -> output px).
    Returns [B, M, S, S, C]. The leading B axis is the mesh 'data' axis —
    every gather reads only its own frame, so sharding B over devices keeps
    alignment entirely local (no cross-device gathers).
    """
    inv = invert_similarity(matrices)  # [B, M, 2, 3]
    grid = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(grid, grid, indexing="ij")

    def one_face(frame, minv):
        sx = minv[0, 0] * gx + minv[0, 1] * gy + minv[0, 2]
        sy = minv[1, 0] * gx + minv[1, 1] * gy + minv[1, 2]
        return _bilinear_sample(frame, sx - 0.5, sy - 0.5)

    per_frame = jax.vmap(one_face, in_axes=(None, 0))
    return jax.vmap(per_frame)(frames, inv)
