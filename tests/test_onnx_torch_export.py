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


def _export(net: torch.nn.Module, path: str, fold: bool):
    """torch.onnx.export with the onnxscript post-pass shimmed out (it needs
    the absent `onnx` package but is a no-op for plain nn graphs)."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        torch.onnx.export(
            net, (torch.randn(1, 3, 112, 112),), path,
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
