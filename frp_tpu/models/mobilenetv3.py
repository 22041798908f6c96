"""MobileNetV3-Small spoof/deepfake classifier in JAX.

Replaces the torchvision MobileNetV3-Small the reference runs on CPU with its
final Linear swapped to 2 classes (``backend/app/utils/deepfake_utils.py:
58-88``). Class convention preserved: **index 1 = fake** (``deepfake_utils.py:
195-197``). The reference ships a 0-byte ``.pth`` (runs untrained and says so
at ``routes/deepfake.py:607-621``); we initialize deterministically and expose
a ``.pth`` state-dict importer in frp_tpu.models.params for real weights.

Standard small spec; SE blocks use hard-sigmoid gating, activations ReLU (RE)
or hard-swish (HS).
"""

from __future__ import annotations

import jax.numpy as jnp

from frp_tpu.models import nn

# (kernel, expanded, out, use_se, use_hs, stride)
_SPEC = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]
_LAST_CONV = 576
_HIDDEN = 1024


def _block_init(rng, cin, k, exp, cout, use_se):
    # dict INSERTION ORDER is the structural importer's traversal order:
    # torchvision InvertedResidual orders SE before the project conv, so we
    # must too or real mobilenet_v3_small checkpoints mis-align
    p = {
        "expand": nn.conv_bn_init(rng, 1, 1, cin, exp) if exp != cin else None,
        "dw": nn.conv_bn_init(rng, k, k, exp, exp, groups=exp),
    }
    if use_se:
        p["se"] = nn.se_init(rng, exp)
    p["project"] = nn.conv_bn_init(rng, 1, 1, exp, cout)
    return p


def init_mobilenetv3_small(rng_or_seed=0, num_classes: int = 2) -> dict:
    rng = nn.as_rng(rng_or_seed)
    params = {"stem": nn.conv_bn_init(rng, 3, 3, 3, 16), "blocks": []}
    cin = 16
    for k, exp, cout, use_se, _, _ in _SPEC:
        params["blocks"].append(_block_init(rng, cin, k, exp, cout, use_se))
        cin = cout
    params["last_conv"] = nn.conv_bn_init(rng, 1, 1, cin, _LAST_CONV)
    params["fc1"] = nn.dense_init(rng, _LAST_CONV, _HIDDEN)
    params["fc2"] = nn.dense_init(rng, _HIDDEN, num_classes)
    return params


def mobilenetv3_forward(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, 224, 224, 3] ImageNet-normalized crops. Returns [B, C] float32
    logits (softmax[..., 1] = fake probability, reference convention)."""
    y = nn.conv_bn(params["stem"], x, stride=2, act=nn.hswish)
    cin = 16
    for p, (k, exp, cout, use_se, use_hs, stride) in zip(params["blocks"], _SPEC):
        act = nn.hswish if use_hs else nn.relu
        inp = y
        if p["expand"] is not None:
            y = nn.conv_bn(p["expand"], y, act=act)
        y = nn.conv_bn(p["dw"], y, stride=stride, groups=y.shape[-1], act=act)
        if use_se:
            y = nn.se_block(p["se"], y)
        y = nn.conv_bn(p["project"], y)
        if stride == 1 and cin == cout:
            y = inp + y
        cin = cout
    y = nn.conv_bn(params["last_conv"], y, act=nn.hswish)
    y = nn.global_avg_pool(y)
    y = nn.hswish(nn.dense(params["fc1"], y))
    return nn.dense(params["fc2"], y).astype(jnp.float32)
