"""MobileFaceNet embedder — the TPU replacement for dlib's 128-d ResNet
(reference ``face_recognition.face_encodings``, ``backend/app/services/
face_service.py:179``).

Output embeddings are L2-normalized 128-d (EMBED_DIM-configurable), so the
reference's euclidean ``face_distance`` semantics and 0.4/0.6 thresholds carry
over (distance = sqrt(2-2cos) in [0, 2]; see frp_tpu.ops.matching docstring).

Standard MobileFaceNet plan for 112x112 inputs (~1M params):
    conv3x3 s2 64 -> dwconv3x3 64 -> bottlenecks
    (t=2, c=64,  n=5, s=2)
    (t=4, c=128, n=1, s=2) (t=2, c=128, n=6, s=1)
    (t=4, c=128, n=1, s=2) (t=2, c=128, n=2, s=1)
    conv1x1 512 -> linear GDConv7x7 (grouped) -> conv1x1 embed_dim -> BN

All blocks use PReLU, the trait that distinguishes MobileFaceNet's accuracy at
this size. The same forward serves inference (BN folded) and training
(``train=True`` threads batch-norm state for the ArcFace train step).
"""

from __future__ import annotations

import jax.numpy as jnp

from frp_tpu.models import nn

_BOTTLENECKS = [
    # (expansion t, out channels c, repeats n, first stride s)
    (2, 64, 5, 2),
    (4, 128, 1, 2),
    (2, 128, 6, 1),
    (4, 128, 1, 2),
    (2, 128, 2, 1),
]


def _bottleneck_init(rng, cin, cout, t):
    hidden = cin * t
    return {
        "expand": nn.conv_bn_init(rng, 1, 1, cin, hidden),
        "expand_prelu": nn.prelu_init(hidden),
        "dw": nn.conv_bn_init(rng, 3, 3, hidden, hidden, groups=hidden),
        "dw_prelu": nn.prelu_init(hidden),
        "project": nn.conv_bn_init(rng, 1, 1, hidden, cout),
    }


def _bottleneck(p, x, stride, residual, train=False, stats=None, path=None):
    def bn(block, y, sub):
        if not train:
            return nn.batch_norm(block["bn"], y), None
        out, new = nn.batch_norm(block["bn"], y, train=True)
        stats[path + (sub,)] = new
        return out, new

    y = nn.conv(p["expand"]["conv"], x)
    y, _ = bn(p["expand"], y, "expand")
    y = nn.prelu(p["expand_prelu"], y)
    y = nn.conv(p["dw"]["conv"], y, stride=stride, groups=y.shape[-1])
    y, _ = bn(p["dw"], y, "dw")
    y = nn.prelu(p["dw_prelu"], y)
    y = nn.conv(p["project"]["conv"], y)
    y, _ = bn(p["project"], y, "project")
    return x + y if residual else y


def init_mobilefacenet(rng_or_seed=0, embed_dim: int = 128) -> dict:
    rng = nn.as_rng(rng_or_seed)
    params = {
        "stem": nn.conv_bn_init(rng, 3, 3, 3, 64),
        "stem_prelu": nn.prelu_init(64),
        "dw1": nn.conv_bn_init(rng, 3, 3, 64, 64, groups=64),
        "dw1_prelu": nn.prelu_init(64),
        "blocks": [],
    }
    cin = 64
    for t, c, n, s in _BOTTLENECKS:
        for i in range(n):
            params["blocks"].append(_bottleneck_init(rng, cin, c, t))
            cin = c
    params["conv_head"] = nn.conv_bn_init(rng, 1, 1, cin, 512)
    params["head_prelu"] = nn.prelu_init(512)
    params["gdconv"] = nn.conv_bn_init(rng, 7, 7, 512, 512, groups=512)
    params["embed"] = nn.conv_bn_init(rng, 1, 1, 512, embed_dim)
    return params


def mobilefacenet_forward(
    params: dict, x: jnp.ndarray, train: bool = False, normalize: bool = True
):
    """x: [B, 112, 112, 3] normalized crops ((v-127.5)/128), any float dtype.

    Returns [B, D] float32 embeddings (L2-normalized unless normalize=False).
    With train=True returns (embeddings, bn_stats) where bn_stats maps
    tuple-paths to updated running statistics.
    """
    stats: dict = {} if train else None

    def bn(block, y, path):
        if not train:
            return nn.batch_norm(block["bn"], y)
        out, new = nn.batch_norm(block["bn"], y, train=True)
        stats[path] = new
        return out

    y = nn.conv(params["stem"]["conv"], x, stride=2)
    y = bn(params["stem"], y, ("stem",))
    y = nn.prelu(params["stem_prelu"], y)
    y = nn.conv(params["dw1"]["conv"], y, groups=64)
    y = bn(params["dw1"], y, ("dw1",))
    y = nn.prelu(params["dw1_prelu"], y)

    i = 0
    cin = 64
    for t, c, n, s in _BOTTLENECKS:
        for j in range(n):
            stride = s if j == 0 else 1
            residual = stride == 1 and cin == c
            y = _bottleneck(
                params["blocks"][i], y, stride, residual,
                train=train, stats=stats, path=("blocks", i),
            )
            cin = c
            i += 1

    y = nn.conv(params["conv_head"]["conv"], y)
    y = bn(params["conv_head"], y, ("conv_head",))
    y = nn.prelu(params["head_prelu"], y)
    y = nn.conv(params["gdconv"]["conv"], y, groups=512, padding="VALID")
    y = bn(params["gdconv"], y, ("gdconv",))
    y = nn.conv(params["embed"]["conv"], y)
    y = bn(params["embed"], y, ("embed",))
    emb = y.reshape(y.shape[0], -1).astype(jnp.float32)
    if normalize:
        emb = nn.l2_normalize(emb)
    return (emb, stats) if train else emb
