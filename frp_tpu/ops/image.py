"""On-device image preprocessing for the detection pipeline.

The reference does color conversion and resizing on the host with OpenCV
(``backend/app/routes/camera.py:225``, ``deepfake_utils.py:114-119``). Here the
host only decodes JPEG / acquires frames (cv2, C++); everything after the
uint8 frame tensor — dtype cast, resize to the detector grid, normalization —
runs on device inside the jitted graph so HBM bandwidth, not host Python, sets
the pace.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("det_size", "dtype_name"))
def preprocess_frames(
    frames: jnp.ndarray, det_size: int = 640, dtype_name: str = "bfloat16"
):
    """uint8 RGB frames [B, H, W, 3] -> detector input + scale metadata.

    Returns:
        x: [B, det_size, det_size, 3] normalized ((v - 127.5) / 128) in
           compute dtype.
        scale: [B, 2] (sx, sy) mapping detector-space px back to frame px.
    """
    b, h, w, _ = frames.shape
    dtype = jnp.dtype(dtype_name)
    f = frames.astype(jnp.float32)
    resized = jax.image.resize(f, (b, det_size, det_size, 3), method="bilinear")
    x = ((resized - 127.5) / 128.0).astype(dtype)
    scale = jnp.broadcast_to(
        jnp.array([w / det_size, h / det_size], jnp.float32), (b, 2)
    )
    return x, scale


def yuv420_to_rgb(yuv: jnp.ndarray) -> jnp.ndarray:
    """I420 planar frames -> RGB float32 (0..255), on device.

    The host->HBM link is the serving bottleneck (~50-80 MB/s once the relay
    leaves fast mode), so the host ships I420 (1.5 B/px, cv2 C++ conversion)
    instead of RGB (3 B/px) and the device does the BT.601 reconstruction as
    fused elementwise math.

    Args:
        yuv: [B, H*3//2, W] uint8 — standard I420 plane layout.
    Returns [B, H, W, 3] float32 RGB.
    """
    b, h15, w = yuv.shape
    h = (h15 * 2) // 3
    y = yuv[:, :h, :].astype(jnp.float32)
    quarter = h // 4
    u = yuv[:, h : h + quarter, :].reshape(b, h // 2, w // 2).astype(jnp.float32)
    v = yuv[:, h + quarter :, :].reshape(b, h // 2, w // 2).astype(jnp.float32)
    # nearest 2x chroma upsample
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
    # BT.601 studio swing (cv2's COLOR_BGR2YUV_I420 convention)
    yl = 1.164 * (y - 16.0)
    r = yl + 1.596 * v
    g = yl - 0.392 * u - 0.813 * v
    bl = yl + 2.017 * u
    return jnp.clip(jnp.stack([r, g, bl], axis=-1), 0.0, 255.0)


def normalize_imagenet(crops: jnp.ndarray) -> jnp.ndarray:
    """ImageNet normalization for the spoof classifier (reference
    ``deepfake_utils.py:114-119``). crops: [..., 3] in 0..255."""
    mean = jnp.array([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.array([0.229, 0.224, 0.225], jnp.float32) * 255.0
    return (crops - mean) / std


def normalize_face(crops: jnp.ndarray) -> jnp.ndarray:
    """ArcFace-style normalization for the embedder: (v - 127.5) / 128."""
    return (crops - 127.5) / 128.0
