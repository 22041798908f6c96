"""Minimal NN substrate: pure-function layers over dict param pytrees.

Conventions:
  * Activations are NHWC; conv weights are HWIO (XLA's native TPU layout).
  * Params are float32 masters; ``apply``-side code casts to the compute dtype
    (bfloat16 by default) so the MXU runs at full rate while BN statistics and
    residual adds stay accurate.
  * BatchNorm is inference-mode by default (scale/shift folded from running
    stats); ``train=True`` returns batch-stat outputs plus updated running
    stats for the training step (frp_tpu/train).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# init helpers — host-side numpy (deterministic, no per-layer XLA compiles;
# params transfer to device once, at first jitted call)
# ---------------------------------------------------------------------------

import numpy as np


def as_rng(rng_or_seed) -> np.random.Generator:
    if isinstance(rng_or_seed, np.random.Generator):
        return rng_or_seed
    return np.random.default_rng(rng_or_seed)


def conv_init(rng, kh, kw, cin, cout, groups: int = 1) -> dict:
    rng = as_rng(rng)
    fan_in = kh * kw * (cin // groups)
    std = math.sqrt(2.0 / fan_in)
    w = rng.normal(0.0, std, size=(kh, kw, cin // groups, cout)).astype(np.float32)
    return {"w": w}


def bn_init(c: int) -> dict:
    return {
        "gamma": np.ones((c,), np.float32),
        "beta": np.zeros((c,), np.float32),
        "mean": np.zeros((c,), np.float32),
        "var": np.ones((c,), np.float32),
    }


def prelu_init(c: int) -> dict:
    return {"alpha": np.full((c,), 0.25, np.float32)}


def dense_init(rng, cin, cout) -> dict:
    rng = as_rng(rng)
    std = math.sqrt(2.0 / cin)
    return {
        "w": rng.normal(0.0, std, size=(cin, cout)).astype(np.float32),
        "b": np.zeros((cout,), np.float32),
    }


# ---------------------------------------------------------------------------
# apply helpers
# ---------------------------------------------------------------------------

import os as _os

# "same" (XLA asymmetric) | "torch" (symmetric k//2) — see set_padding_mode
_PADDING_MODE = _os.getenv("CONV_PADDING", "same")


def set_padding_mode(mode: str) -> None:
    """Global conv padding semantics, set ONCE before building jitted fns.

    "same": XLA SAME — on stride-2 even inputs pads (0,1), the convention
    the in-repo-trained weights use. "torch": symmetric k//2 padding like
    torch Conv2d(padding=k//2) — REQUIRED for imported torch/ONNX
    checkpoints, whose stride-2 layers otherwise compute on a grid shifted
    one pixel from the one they were trained on (set CONV_PADDING=torch)."""
    global _PADDING_MODE
    assert mode in ("same", "torch"), mode
    _PADDING_MODE = mode


def make_divisible(v: int, divisor: int = 8) -> int:
    """torchvision _make_divisible: round to the nearest multiple, never
    dropping below 90% of the original value."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def conv(p: dict, x: jnp.ndarray, stride: int = 1, padding="SAME", groups: int = 1) -> jnp.ndarray:
    # Output follows the input dtype. The TPU MXU accumulates bf16 x bf16 in
    # f32 internally regardless; requesting preferred_element_type=f32 and
    # down-casting breaks lax's conv transpose rule under autodiff (cotangent
    # dtype mismatch), so we keep the conv dtype-uniform.
    w = p["w"].astype(x.dtype)
    if padding == "SAME" and _PADDING_MODE == "torch":
        kh, kw = w.shape[0], w.shape[1]
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:  # imported torch convs may carry a bias (no BN follows)
        out = out + p["b"].astype(out.dtype)
    return out


def batch_norm(p: dict, x: jnp.ndarray, train: bool = False, momentum: float = 0.9, eps: float = 1e-5):
    """Inference: fold running stats. Train: batch stats + updated running stats."""
    if not train:
        scale = (p["gamma"] * lax.rsqrt(p["var"] + eps)).astype(x.dtype)
        shift = (p["beta"] - p["mean"] * p["gamma"] * lax.rsqrt(p["var"] + eps)).astype(x.dtype)
        return x * scale + shift
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.var(xf, axis=axes)
    y = (xf - mean) * lax.rsqrt(var + eps) * p["gamma"] + p["beta"]
    new_stats = {
        "mean": momentum * p["mean"] + (1 - momentum) * mean,
        "var": momentum * p["var"] + (1 - momentum) * var,
    }
    return y.astype(x.dtype), new_stats


def prelu(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    a = p["alpha"].astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def hswish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hsigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def dense(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


# ---------------------------------------------------------------------------
# composite blocks
# ---------------------------------------------------------------------------

def conv_bn_init(rng, kh, kw, cin, cout, groups: int = 1) -> dict:
    return {"conv": conv_init(rng, kh, kw, cin, cout, groups), "bn": bn_init(cout)}


def conv_bn(p: dict, x, stride=1, groups=1, act=None, padding="SAME"):
    y = conv(p["conv"], x, stride=stride, groups=groups, padding=padding)
    y = batch_norm(p["bn"], y)
    return act(y) if act is not None else y


def se_init(rng, c: int, reduction: int = 4) -> dict:
    # torchvision SqueezeExcitation width (_make_divisible(c//4, 8)) so a
    # real mobilenet_v3_small checkpoint imports with matching shapes
    hidden = make_divisible(c // reduction, 8)
    return {"fc1": dense_init(rng, c, hidden), "fc2": dense_init(rng, hidden, c)}


def se_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    s = global_avg_pool(x)
    s = relu(dense(p["fc1"], s))
    s = hsigmoid(dense(p["fc2"], s))
    return x * s[:, None, None, :]


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-norm along the last axis — THE normalizer both embedder
    families share (matching distance = sqrt(2-2cos) depends on it)."""
    return x * lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


def upsample2x(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor upsample to the given spatial size (FPN top-down)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="nearest")
