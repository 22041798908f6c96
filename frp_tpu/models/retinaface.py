"""RetinaFace (MobileNetV1-0.25 backbone + FPN + SSH) in pure JAX.

TPU-native replacement for the InsightFace ONNX RetinaFace the reference runs
through a CPUExecutionProvider at 640x640 (``backend/app/utils/
deepfake_utils.py:39-54``). Same three-stride anchor layout as
``frp_tpu.ops.anchors`` (strides 8/16/32, 2 anchors per cell), so head outputs
concatenate to exactly [A, 2]/[A, 4]/[A, 10] for A = 16800 at 640.

Design notes (tpu-first):
  * NHWC everywhere; convs map straight onto the MXU; depthwise convs use
    ``feature_group_count``.
  * Whole forward is shape-static — one compiled graph per (batch, det_size).
  * Leaky-ReLU 0.1 in the thin backbone (channels <= 64 at stride 8), the
    standard choice for the 0.25-width variant.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from frp_tpu.models import nn

# MobileNetV1-0.25 stage plan: (cout, stride), depthwise-separable after stem.
_STAGE1 = [(16, 1), (32, 2), (32, 1), (64, 2), (64, 1)]          # -> C1 stride 8
_STAGE2 = [(128, 2)] + [(128, 1)] * 5                            # -> C2 stride 16
_STAGE3 = [(256, 2), (256, 1)]                                   # -> C3 stride 32
FPN_CH = 64
NUM_ANCHORS = 2


# Activated conv+bn block: the in-repo-trained weights use weightless
# leaky-ReLU 0.1 (the standard 0.25-width choice); real InsightFace det
# exports carry learned per-channel PReLU slopes instead, so every activated
# block optionally holds an "act" {"alpha"} unit — structure selects the
# activation, keeping the forward jit-static and letting the ONNX structural
# importer (models/params.py) consume Conv->BN->PRelu unit runs in order.

def _cba_init(rng, kh, kw, cin, cout, groups: int = 1, prelu: bool = False):
    p = nn.conv_bn_init(rng, kh, kw, cin, cout, groups)
    if prelu:
        p["act"] = nn.prelu_init(cout)
    return p


def _cba(p, x, stride: int = 1, groups: int = 1):
    y = nn.conv_bn(p, x, stride=stride, groups=groups)
    return nn.prelu(p["act"], y) if "act" in p else nn.leaky_relu(y)


def _dw_sep_init(rng, cin, cout, prelu=False):
    return {
        "dw": _cba_init(rng, 3, 3, cin, cin, groups=cin, prelu=prelu),
        "pw": _cba_init(rng, 1, 1, cin, cout, prelu=prelu),
    }


def _dw_sep(p, x, stride):
    y = _cba(p["dw"], x, stride=stride, groups=x.shape[-1])
    return _cba(p["pw"], y)


def _ssh_init(rng, cin, cout, prelu=False):
    assert cout % 4 == 0
    half, quarter = cout // 2, cout // 4
    return {
        "conv3": nn.conv_bn_init(rng, 3, 3, cin, half),
        "conv5_1": _cba_init(rng, 3, 3, cin, quarter, prelu=prelu),
        "conv5_2": nn.conv_bn_init(rng, 3, 3, quarter, quarter),
        "conv7_2": _cba_init(rng, 3, 3, quarter, quarter, prelu=prelu),
        "conv7_3": nn.conv_bn_init(rng, 3, 3, quarter, quarter),
    }


def _ssh(p, x):
    c3 = nn.conv_bn(p["conv3"], x)
    c5_1 = _cba(p["conv5_1"], x)
    c5 = nn.conv_bn(p["conv5_2"], c5_1)
    c7_2 = _cba(p["conv7_2"], c5_1)
    c7 = nn.conv_bn(p["conv7_3"], c7_2)
    return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


def init_retinaface(rng_or_seed=0, act: str = "leaky") -> dict:
    """act="leaky" (weightless, the in-repo-trained default) or "prelu"
    (learned per-channel slopes on every activated block, the structure real
    InsightFace det exports need to import onto)."""
    assert act in ("leaky", "prelu"), act
    prelu = act == "prelu"
    rng = nn.as_rng(rng_or_seed)
    params = {"stem": _cba_init(rng, 3, 3, 3, 8, prelu=prelu)}

    def stage(cin, plan):
        blocks = []
        for cout, _ in plan:
            blocks.append(_dw_sep_init(rng, cin, cout, prelu=prelu))
            cin = cout
        return blocks, cin

    params["stage1"], c1 = stage(8, _STAGE1)
    params["stage2"], c2 = stage(c1, _STAGE2)
    params["stage3"], c3 = stage(c2, _STAGE3)

    params["fpn_lat"] = [
        _cba_init(rng, 1, 1, c, FPN_CH, prelu=prelu) for c in (c1, c2, c3)
    ]
    params["fpn_td"] = [
        _cba_init(rng, 3, 3, FPN_CH, FPN_CH, prelu=prelu) for _ in range(2)
    ]
    params["ssh"] = [_ssh_init(rng, FPN_CH, FPN_CH, prelu=prelu) for _ in range(3)]
    params["head_cls"] = [
        nn.conv_init(rng, 1, 1, FPN_CH, NUM_ANCHORS * 2) for _ in range(3)
    ]
    params["head_box"] = [
        nn.conv_init(rng, 1, 1, FPN_CH, NUM_ANCHORS * 4) for _ in range(3)
    ]
    params["head_ldm"] = [
        nn.conv_init(rng, 1, 1, FPN_CH, NUM_ANCHORS * 10) for _ in range(3)
    ]
    return params


def _head(convs, feats, dims):
    outs = []
    for p, f in zip(convs, feats):
        y = nn.conv(p, f)  # [B, H, W, A*dims]
        b, h, w, _ = y.shape
        outs.append(y.reshape(b, h * w * NUM_ANCHORS, dims))
    return jnp.concatenate(outs, axis=1)


def retinaface_forward(params: dict, x: jnp.ndarray) -> dict:
    """x: [B, S, S, 3] normalized frames. Returns raw head outputs:
    {"loc": [B, A, 4], "ldm": [B, A, 10], "score": [B, A]} in float32.
    """
    y = _cba(params["stem"], x, stride=2)
    feats = []
    for name, plan in (("stage1", _STAGE1), ("stage2", _STAGE2), ("stage3", _STAGE3)):
        for p, (_, stride) in zip(params[name], plan):
            y = _dw_sep(p, y, stride)
        feats.append(y)

    # FPN top-down
    lat = [_cba(p, f) for p, f in zip(params["fpn_lat"], feats)]
    p3 = lat[2]
    # fpn_td list order == execution order (p2's merge runs first): the ONNX
    # structural importer maps weights by execution order, and both merges
    # are shape-identical — a swapped convention would import silently
    # wrong. Renamed from round-2's "fpn_merge" (which executed [1] before
    # [0]) so pre-reorder checkpoints FAIL the engine's path-aware structure
    # check loudly instead of loading with the merges crossed;
    # tools/migrate_retinaface_npz.py converts old files.
    p2 = lat[1] + nn.upsample2x(p3, lat[1].shape[1:3])
    p2 = _cba(params["fpn_td"][0], p2)
    p1 = lat[0] + nn.upsample2x(p2, lat[0].shape[1:3])
    p1 = _cba(params["fpn_td"][1], p1)
    pyramid = [p1, p2, p3]

    feats = [_ssh(p, f) for p, f in zip(params["ssh"], pyramid)]
    cls = _head(params["head_cls"], feats, 2).astype(jnp.float32)
    loc = _head(params["head_box"], feats, 4).astype(jnp.float32)
    ldm = _head(params["head_ldm"], feats, 10).astype(jnp.float32)
    score = jax.nn.softmax(cls, axis=-1)[..., 1]
    return {"loc": loc, "ldm": ldm, "score": score, "cls_logits": cls}
