"""A GENUINE torch.onnx export through the importer (round 4).

The replica suite (test_onnx_real_export.py) proves the importer against
byte-level imitations of real exports; this goes one step further: torch
itself builds the ONNX bytes. The torchscript exporter constructs the full
ModelProto in C++ and only needs the `onnx` python package for a final
no-op post-processing pass (inserting custom onnxscript functions — our
plain nn graph has none), so that pass is shimmed to the identity and the
REAL exporter-built bytes flow through load_onnx_graph/import_onnx_graph.

The torch model mirrors models/iresnet.py's iresnet18 layer-for-layer
(the w600k_r50 family structure, reference deepfake_utils.py:39-54), so
the strongest check available closes the loop: our JAX forward on the
imported tree vs the torch module's own forward on the same input.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from frp_tpu.models import nn as fnn
from frp_tpu.models.iresnet import init_iresnet, iresnet_forward
from frp_tpu.models.params import import_onnx_graph, load_onnx_graph

VARIANT, EMBED = "iresnet18", 128


class _Block(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.bn1 = torch.nn.BatchNorm2d(cin)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.prelu = torch.nn.PReLU(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, stride, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(cout)
        self.down = (
            torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )
            if (stride != 1 or cin != cout)
            else None
        )

    def forward(self, x):
        y = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
        s = self.down(x) if self.down is not None else x
        return s + y


class _IResNet(torch.nn.Module):
    """Layer-for-layer mirror of models/iresnet.py (same traversal order)."""

    DEPTHS = {"iresnet18": (2, 2, 2, 2)}
    WIDTHS = (64, 128, 256, 512)

    def __init__(self, variant=VARIANT, embed_dim=EMBED):
        super().__init__()
        self.stem = torch.nn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.stem_bn = torch.nn.BatchNorm2d(64)
        self.stem_prelu = torch.nn.PReLU(64)
        blocks = []
        cin = 64
        for width, n in zip(self.WIDTHS, self.DEPTHS[variant]):
            for b in range(n):
                blocks.append(_Block(cin, width, 2 if b == 0 else 1))
                cin = width
        self.stages = torch.nn.ModuleList(blocks)
        self.head_bn = torch.nn.BatchNorm2d(cin)
        self.fc = torch.nn.Linear(cin * 7 * 7, embed_dim)
        self.feat_bn = torch.nn.BatchNorm1d(embed_dim)

    def forward(self, x):
        y = self.stem_prelu(self.stem_bn(self.stem(x)))
        for blk in self.stages:
            y = blk(y)
        y = self.head_bn(y)
        y = y.flatten(1)  # NCHW flatten == our torch-order flatten
        y = self.fc(y)
        return self.feat_bn(y)


def _realistic_stats(net: torch.nn.Module, rng):
    """Non-default BN stats + slopes so folding/plumbing errors can't hide."""
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.weight.copy_(torch.from_numpy(
                    rng.uniform(0.2, 0.5, m.weight.shape).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(
                    rng.normal(0, 0.1, m.bias.shape).astype(np.float32)))
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.3, m.running_mean.shape).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    (0.5 + rng.random(m.running_var.shape)).astype(np.float32)))
            elif isinstance(m, torch.nn.PReLU):
                m.weight.copy_(torch.from_numpy(
                    rng.uniform(0.1, 0.4, m.weight.shape).astype(np.float32)))


def _export(net: torch.nn.Module, path: str, fold: bool, hw: int = 112):
    """torch.onnx.export with the onnxscript post-pass shimmed out (it needs
    the absent `onnx` package but is a no-op for plain nn graphs). Skips on
    torch versions that relocate the private exporter module — this test's
    value is the REAL bytes, which require reaching that internal."""
    try:
        from torch.onnx._internal.torchscript_exporter import onnx_proto_utils
    except ImportError:
        pytest.skip("torchscript exporter internals moved in this torch "
                    "version; real-export shim unavailable")

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        torch.onnx.export(
            net, (torch.randn(1, 3, hw, hw),), path,
            opset_version=17, do_constant_folding=fold, dynamo=False,
        )
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


@pytest.mark.parametrize("fold", [True, False])
def test_real_torch_export_imports_and_matches_torch_forward(tmp_path, fold):
    rng = np.random.default_rng(3)
    net = _IResNet().eval()
    _realistic_stats(net, rng)
    path = str(tmp_path / f"real_iresnet18_fold{fold}.onnx")
    _export(net, path, fold)

    graph = load_onnx_graph(path)
    assert graph is not None and graph["nodes"], "exporter bytes unreadable"
    ops = {n["op"] for n in graph["nodes"]}
    assert "Conv" in ops and "Gemm" in ops, ops

    target = init_iresnet(9, variant=VARIANT, embed_dim=EMBED)
    copied = import_onnx_graph(target, graph)
    assert copied > 100

    x = rng.normal(0, 1, (2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    fnn.set_padding_mode("torch")
    try:
        got = np.asarray(iresnet_forward(target, x, normalize=False))
    finally:
        fnn.set_padding_mode("same")
    assert got.shape == ref.shape == (2, EMBED)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


class _DWSep(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.dw = torch.nn.Conv2d(cin, cin, 3, stride, 1, groups=cin, bias=False)
        self.dw_bn = torch.nn.BatchNorm2d(cin)
        self.dw_act = torch.nn.PReLU(cin)
        self.pw = torch.nn.Conv2d(cin, cout, 1, bias=False)
        self.pw_bn = torch.nn.BatchNorm2d(cout)
        self.pw_act = torch.nn.PReLU(cout)

    def forward(self, x):
        return self.pw_act(self.pw_bn(self.pw(
            self.dw_act(self.dw_bn(self.dw(x))))))


class _CBA(torch.nn.Module):
    def __init__(self, cin, cout, k, stride=1, act=True):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)
        self.act = torch.nn.PReLU(cout) if act else None

    def forward(self, x):
        y = self.bn(self.conv(x))
        return self.act(y) if self.act is not None else y


class _SSH(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        half, quarter = cout // 2, cout // 4
        self.conv3 = _CBA(cin, half, 3, act=False)
        self.conv5_1 = _CBA(cin, quarter, 3)
        self.conv5_2 = _CBA(quarter, quarter, 3, act=False)
        self.conv7_2 = _CBA(quarter, quarter, 3)
        self.conv7_3 = _CBA(quarter, quarter, 3, act=False)

    def forward(self, x):
        c3 = self.conv3(x)
        c5_1 = self.conv5_1(x)
        c5 = self.conv5_2(c5_1)
        c7 = self.conv7_3(self.conv7_2(c5_1))
        return torch.relu(torch.cat([c3, c5, c7], dim=1))


class _RetinaFace(torch.nn.Module):
    """Layer-for-layer mirror of models/retinaface.py act="prelu"."""

    S1 = [(16, 1), (32, 2), (32, 1), (64, 2), (64, 1)]
    S2 = [(128, 2)] + [(128, 1)] * 5
    S3 = [(256, 2), (256, 1)]

    def __init__(self):
        super().__init__()
        self.stem = _CBA(3, 8, 3, stride=2)

        def stage(cin, plan):
            blocks = []
            for cout, s in plan:
                blocks.append(_DWSep(cin, cout, s))
                cin = cout
            return torch.nn.ModuleList(blocks), cin

        self.stage1, c1 = stage(8, self.S1)
        self.stage2, c2 = stage(c1, self.S2)
        self.stage3, c3 = stage(c2, self.S3)
        self.fpn_lat = torch.nn.ModuleList(
            [_CBA(c, 64, 1) for c in (c1, c2, c3)])
        self.fpn_td = torch.nn.ModuleList([_CBA(64, 64, 3) for _ in range(2)])
        self.ssh = torch.nn.ModuleList([_SSH(64, 64) for _ in range(3)])
        self.head_cls = torch.nn.ModuleList(
            [torch.nn.Conv2d(64, 4, 1, bias=False) for _ in range(3)])
        self.head_box = torch.nn.ModuleList(
            [torch.nn.Conv2d(64, 8, 1, bias=False) for _ in range(3)])
        self.head_ldm = torch.nn.ModuleList(
            [torch.nn.Conv2d(64, 20, 1, bias=False) for _ in range(3)])

    def forward(self, x):
        y = self.stem(x)
        feats = []
        for blocks in (self.stage1, self.stage2, self.stage3):
            for blk in blocks:
                y = blk(y)
            feats.append(y)
        lat = [m(f) for m, f in zip(self.fpn_lat, feats)]
        p3 = lat[2]
        p2 = self.fpn_td[0](
            lat[1] + torch.nn.functional.interpolate(p3, scale_factor=2.0,
                                                     mode="nearest"))
        p1 = self.fpn_td[1](
            lat[0] + torch.nn.functional.interpolate(p2, scale_factor=2.0,
                                                     mode="nearest"))
        pyramid = [p1, p2, p3]
        feats = [m(f) for m, f in zip(self.ssh, pyramid)]
        cls = [m(f) for m, f in zip(self.head_cls, feats)]
        box = [m(f) for m, f in zip(self.head_box, feats)]
        ldm = [m(f) for m, f in zip(self.head_ldm, feats)]
        return (*cls, *box, *ldm)


@pytest.mark.parametrize("fold", [True, False])
def test_real_torch_detector_export_imports(tmp_path, fold):
    """A real torch export of the det-style net — FPN Resize nodes, Concat,
    per-channel PReLU, depthwise groups — imports onto the act="prelu"
    RetinaFace tree and our forward matches torch's raw heads."""
    from frp_tpu.models.retinaface import NUM_ANCHORS, init_retinaface, retinaface_forward

    rng = np.random.default_rng(5)
    net = _RetinaFace().eval()
    _realistic_stats(net, rng)
    path = str(tmp_path / f"real_det_fold{fold}.onnx")
    _export(net, path, fold, hw=128)

    graph = load_onnx_graph(path)
    assert graph is not None
    ops = {n["op"] for n in graph["nodes"]}
    assert "Resize" in ops and "Concat" in ops, ops

    target = init_retinaface(11, act="prelu")
    copied = import_onnx_graph(target, graph)
    assert copied > 100

    x = rng.normal(0, 1, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        heads = [t.numpy() for t in net(torch.from_numpy(x.transpose(0, 3, 1, 2)))]
    fnn.set_padding_mode("torch")
    try:
        got = retinaface_forward(target, x)
    finally:
        fnn.set_padding_mode("same")
    # our forward concatenates [level0, level1, level2] anchors; compare
    # each level segment against the matching torch head map
    sizes = [h.shape[2] * h.shape[3] * NUM_ANCHORS for h in heads[:3]]
    for key, dims, off in (("cls_logits", 2, 0), ("loc", 4, 3), ("ldm", 10, 6)):
        ours = np.asarray(got[key])
        start = 0
        for lvl in range(3):
            ref = heads[off + lvl]
            b, c, h, w = ref.shape
            ref = ref.transpose(0, 2, 3, 1).reshape(b, h * w * NUM_ANCHORS, dims)
            seg = ours[:, start : start + sizes[lvl], :]
            np.testing.assert_allclose(
                seg, ref, rtol=2e-3, atol=2e-3,
                err_msg=f"{key} level {lvl} fold={fold}")
            start += sizes[lvl]


class _SE(torch.nn.Module):
    """torchvision SqueezeExcitation layout: 1x1 convs (our tree uses dense
    — the importer coerces [1,1,i,o] conv weights onto dense units)."""

    def __init__(self, c, squeeze):
        super().__init__()
        self.fc1 = torch.nn.Conv2d(c, squeeze, 1)
        self.fc2 = torch.nn.Conv2d(squeeze, c, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.nn.functional.hardsigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s


class _MBV3Block(torch.nn.Module):
    def __init__(self, cin, k, exp, cout, use_se):
        super().__init__()
        if exp != cin:
            self.expand = torch.nn.Conv2d(cin, exp, 1, bias=False)
            self.expand_bn = torch.nn.BatchNorm2d(exp)
        else:
            self.expand = None
        self.dw = torch.nn.Conv2d(exp, exp, k, 1, k // 2, groups=exp, bias=False)
        self.dw_bn = torch.nn.BatchNorm2d(exp)
        if use_se:
            from frp_tpu.models.nn import make_divisible

            self.se = _SE(exp, make_divisible(exp // 4, 8))
        else:
            self.se = None
        self.project = torch.nn.Conv2d(exp, cout, 1, bias=False)
        self.project_bn = torch.nn.BatchNorm2d(cout)


class _MobileNetV3Small(torch.nn.Module):
    """State-dict mirror of models/mobilenetv3.py (same module order)."""

    def __init__(self, num_classes=2):
        super().__init__()
        from frp_tpu.models.mobilenetv3 import _HIDDEN, _LAST_CONV, _SPEC

        self.spec = _SPEC
        self.stem = torch.nn.Conv2d(3, 16, 3, 2, 1, bias=False)
        self.stem_bn = torch.nn.BatchNorm2d(16)
        blocks = []
        cin = 16
        for k, exp, cout, use_se, _hs, _s in _SPEC:
            blocks.append(_MBV3Block(cin, k, exp, cout, use_se))
            cin = cout
        self.blocks = torch.nn.ModuleList(blocks)
        self.last_conv = torch.nn.Conv2d(cin, _LAST_CONV, 1, bias=False)
        self.last_bn = torch.nn.BatchNorm2d(_LAST_CONV)
        self.fc1 = torch.nn.Linear(_LAST_CONV, _HIDDEN)
        self.fc2 = torch.nn.Linear(_HIDDEN, num_classes)

    def forward(self, x):
        hsw = torch.nn.functional.hardswish
        y = hsw(self.stem_bn(self.stem(x)))
        cin = 16
        for blk, (k, exp, cout, use_se, use_hs, stride) in zip(
            self.blocks, self.spec
        ):
            act = hsw if use_hs else torch.relu
            inp = y
            if blk.expand is not None:
                y = act(blk.expand_bn(blk.expand(y)))
            # stride applied functionally so the mirror's dw module keeps
            # torch's weight layout while matching our forward exactly
            y = torch.nn.functional.conv2d(
                y, blk.dw.weight, None, stride, k // 2, 1, blk.dw.in_channels)
            y = act(blk.dw_bn(y))
            if blk.se is not None:
                y = blk.se(y)
            y = blk.project_bn(blk.project(y))
            if stride == 1 and cin == cout:
                y = inp + y
            cin = cout
        y = hsw(self.last_bn(self.last_conv(y)))
        y = y.mean((2, 3))
        y = hsw(self.fc1(y))
        return self.fc2(y)


def test_real_torch_pth_state_dict_spoof(tmp_path):
    """The reference's ACTUAL deepfake checkpoint flow (deepfake_utils.py:
    91-105 loads a .pth state dict into MobileNetV3): a real torch-saved
    state dict round-trips through import_pth_state_dict +
    import_torch_weights and our forward matches the torch module."""
    from frp_tpu.models.mobilenetv3 import (
        init_mobilenetv3_small,
        mobilenetv3_forward,
    )
    from frp_tpu.models.params import import_pth_state_dict, import_torch_weights

    rng = np.random.default_rng(6)
    net = _MobileNetV3Small().eval()
    _realistic_stats(net, rng)
    path = str(tmp_path / "deepfake_mobilenet.pth")
    torch.save(net.state_dict(), path)

    state = import_pth_state_dict(path)
    assert state is not None and len(state) > 100
    target = init_mobilenetv3_small(13)
    copied = import_torch_weights(target, state)
    assert copied > 150

    x = rng.normal(0, 1, (2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    fnn.set_padding_mode("torch")
    try:
        got = np.asarray(mobilenetv3_forward(target, x))
    finally:
        fnn.set_padding_mode("same")
    assert got.shape == ref.shape == (2, 2)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
