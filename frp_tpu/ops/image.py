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


def normalize_imagenet(crops: jnp.ndarray) -> jnp.ndarray:
    """ImageNet normalization for the spoof classifier (reference
    ``deepfake_utils.py:114-119``). crops: [..., 3] in 0..255."""
    mean = jnp.array([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.array([0.229, 0.224, 0.225], jnp.float32) * 255.0
    return (crops - mean) / std


def normalize_face(crops: jnp.ndarray) -> jnp.ndarray:
    """ArcFace-style normalization for the embedder: (v - 127.5) / 128."""
    return (crops - 127.5) / 128.0
