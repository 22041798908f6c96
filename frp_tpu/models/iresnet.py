"""IResNet (ArcFace's improved ResNet) — the production-accuracy embedder
family, config-selectable beside MobileFaceNet.

The reference's only embedder is dlib's fixed 128-d ResNet (SURVEY.md section
2.3); this provides the scaling path: iresnet18/34/50/100 at 112x112 with the
standard ArcFace head (BN -> flatten -> FC(embed_dim) -> BN). Blocks are the
"improved" residual unit: BN-Conv-BN-PReLU-Conv-BN with a stride-2 conv
shortcut — all NHWC pure functions over param pytrees, bf16-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from frp_tpu.models import nn

_DEPTHS = {
    "iresnet18": (2, 2, 2, 2),
    "iresnet34": (3, 4, 6, 3),
    "iresnet50": (3, 4, 14, 3),
    "iresnet100": (3, 13, 30, 3),
}
_WIDTHS = (64, 128, 256, 512)


def _block_init(rng, cin, cout, stride):
    p = {
        "bn1": nn.bn_init(cin),
        "conv1": nn.conv_init(rng, 3, 3, cin, cout),
        "bn2": nn.bn_init(cout),
        "prelu": nn.prelu_init(cout),
        "conv2": nn.conv_init(rng, 3, 3, cout, cout),
        "bn3": nn.bn_init(cout),
    }
    if stride != 1 or cin != cout:
        p["down_conv"] = nn.conv_init(rng, 1, 1, cin, cout)
        p["down_bn"] = nn.bn_init(cout)
    return p


def _block(p, x, stride, train=False, stats=None, path=None):
    def bn(name, y):
        if not train:
            return nn.batch_norm(p[name], y)
        out, new = nn.batch_norm(p[name], y, train=True)
        stats[path + (name,)] = new
        return out

    y = bn("bn1", x)
    y = nn.conv(p["conv1"], y)
    y = bn("bn2", y)
    y = nn.prelu(p["prelu"], y)
    y = nn.conv(p["conv2"], y, stride=stride)
    y = bn("bn3", y)
    if "down_conv" in p:
        x = bn("down_bn", nn.conv(p["down_conv"], x, stride=stride))
    return x + y


def init_iresnet(rng_or_seed=0, variant: str = "iresnet18", embed_dim: int = 128) -> dict:
    if variant not in _DEPTHS:
        raise ValueError(f"unknown variant {variant}; options: {sorted(_DEPTHS)}")
    rng = nn.as_rng(rng_or_seed)
    depths = _DEPTHS[variant]
    params = {
        "stem": nn.conv_init(rng, 3, 3, 3, 64),
        "stem_bn": nn.bn_init(64),
        "stem_prelu": nn.prelu_init(64),
        "stages": [],
    }
    cin = 64
    for width, n_blocks in zip(_WIDTHS, depths):
        stage = []
        for b in range(n_blocks):
            stride = 2 if b == 0 else 1
            stage.append(_block_init(rng, cin, width, stride))
            cin = width
        params["stages"].append(stage)
    # 112/2^4 = 7 -> feature map [7, 7, 512]
    params["head_bn"] = nn.bn_init(cin)
    params["fc"] = nn.dense_init(rng, cin * 7 * 7, embed_dim)
    params["feat_bn"] = nn.bn_init(embed_dim)
    return params


def iresnet_forward(
    params: dict, x: jnp.ndarray, normalize: bool = True, train: bool = False
):
    """x: [B, 112, 112, 3] normalized crops -> [B, D] float32 embeddings.

    With train=True returns (embeddings, bn_stats): bn_stats maps param-tree
    paths whose LAST element names a bare BN unit (e.g. ("stages", 0, 1,
    "bn2")) to updated running stats — the format train.arcface's
    _apply_bn_updates consumes for either embedder family."""
    stats: dict = {} if train else None

    def bn(name, y):
        if not train:
            return nn.batch_norm(params[name], y)
        out, new = nn.batch_norm(params[name], y, train=True)
        stats[(name,)] = new
        return out

    y = nn.conv(params["stem"], x)
    y = bn("stem_bn", y)
    y = nn.prelu(params["stem_prelu"], y)
    for si, stage in enumerate(params["stages"]):
        for b, block in enumerate(stage):
            y = _block(
                block, y, 2 if b == 0 else 1,
                train=train, stats=stats, path=("stages", si, b),
            )
    y = bn("head_bn", y)
    # flatten in torch NCHW order (c, h, w): real iresnet checkpoints'
    # fc weights index inputs that way — an NHWC flatten would silently
    # permute every fc input for imported weights (shapes match either way)
    y = jnp.transpose(y, (0, 3, 1, 2)).reshape(y.shape[0], -1)
    emb = nn.dense(params["fc"], y).astype(jnp.float32)
    emb = bn("feat_bn", emb)  # 1-D feature BN
    if normalize:
        emb = nn.l2_normalize(emb)
    return (emb, stats) if train else emb
