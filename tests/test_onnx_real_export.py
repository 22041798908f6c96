"""Realistic-ONNX-export import proof (VERDICT r2 next-item #1).

Real InsightFace exports (det_10g / w600k_r50, reference deepfake_utils.py:
39-54) differ from hand-picked tensor dumps in exactly the ways that break a
name-based structural walk: initializers carry numeric names ("onnx::Conv_473"
style), are serialized in arbitrary order, and — after onnxsim — BatchNorms
are folded into biased convs. These tests build byte-level ONNX replicas with
all three properties from our own param trees, round-trip them through
load_onnx_graph/import_onnx_graph, and assert forward equivalence:

* the w600k_r50-style iresnet50 replica is additionally executed by an
  INDEPENDENT torch-functional interpreter of the graph's node list, so the
  equivalence check covers op semantics (conv padding, BN eps, PReLU
  broadcasting, Gemm transB) and not just tensor plumbing;
* the det_10g-style detector replica is emitted in true EXECUTION order
  (FPN top-down: p2's merge conv runs before p1's), which catches any
  divergence between our tree-walk order and the forward's execution order.
"""

import struct

import numpy as np
import pytest

from frp_tpu.models import nn
from frp_tpu.models.params import (
    _collect_units,
    import_onnx_graph,
    load_onnx_graph,
)

EPS = 1e-5  # ONNX BatchNormalization default epsilon == nn.batch_norm's


# --- protobuf writers (test-side mirror of the reader) ----------------------

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _fld(num: int, wire: int, payload) -> bytes:
    key = _varint((num << 3) | wire)
    if wire == 0:
        return key + _varint(payload)
    if wire == 5:
        return key + payload  # fixed32, payload already 4 bytes
    return key + _varint(len(payload)) + payload


def _tensor(name: str, arr: np.ndarray, int32_style: bool = False) -> bytes:
    arr = np.ascontiguousarray(arr)
    dt = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
          np.dtype(np.float16): 10}[arr.dtype]
    body = b"".join(_fld(1, 0, d) for d in arr.shape)
    body += _fld(2, 0, dt)
    body += _fld(8, 2, name.encode())
    if int32_style:
        # the ONNX spec's non-raw float16 encoding: uint16 bit patterns as
        # packed varints in int32_data (field 5)
        assert arr.dtype == np.float16
        bits = arr.reshape(-1).view(np.uint16)
        body += _fld(5, 2, b"".join(_varint(int(v)) for v in bits))
    else:
        body += _fld(9, 2, arr.tobytes())
    return body


def _attr_i(name: str, v: int) -> bytes:
    return _fld(1, 2, name.encode()) + _fld(3, 0, v)


def _attr_f(name: str, v: float) -> bytes:
    return _fld(1, 2, name.encode()) + _fld(2, 5, struct.pack("<f", v))


def _attr_ints(name: str, vals) -> bytes:
    body = _fld(1, 2, name.encode())
    for v in vals:
        body += _fld(8, 0, v)
    return body


def _attr_t(name: str, tensor_bytes: bytes) -> bytes:
    return _fld(1, 2, name.encode()) + _fld(5, 2, tensor_bytes)


def _attr_s(name: str, v: bytes) -> bytes:
    return _fld(1, 2, name.encode()) + _fld(4, 2, v)


def _node(op: str, inputs, outputs, *attrs) -> bytes:
    body = b"".join(_fld(1, 2, i.encode()) for i in inputs)
    body += b"".join(_fld(2, 2, o.encode()) for o in outputs)
    body += _fld(4, 2, op.encode())
    body += b"".join(_fld(5, 2, a) for a in attrs)
    return body


def _model(nodes: list, initializers: dict, shuffle_rng=None,
           fp16_rng=None) -> bytes:
    """fp16_rng: when given, ~half the float32 weight tensors are stored as
    float16 (real buffalo_l exports ship some), alternating between the raw
    and int32_data-bit-pattern encodings the spec allows. The graph's stored
    values ARE the fp16-rounded ones — every consumer (importer AND the torch
    cross-check interpreter) reads the same rounded weights."""
    names = list(initializers)
    if shuffle_rng is not None:  # real exports serialize in arbitrary order
        shuffle_rng.shuffle(names)
    graph = b"".join(_fld(1, 2, n) for n in nodes)
    for n in names:
        arr = initializers[n]
        int32_style = False
        if (fp16_rng is not None and arr.dtype == np.float32
                and arr.size > 0 and fp16_rng.random() < 0.5):
            arr = arr.astype(np.float16)
            int32_style = fp16_rng.random() < 0.5
        graph += _fld(5, 2, _tensor(n, arr, int32_style))
    return _fld(1, 0, 9) + _fld(7, 2, graph)


# --- graph emitters ---------------------------------------------------------

class _Emit:
    """Collects nodes + numerically-named initializers for a replica graph."""

    def __init__(self):
        self.nodes: list[bytes] = []
        self.inits: dict[str, np.ndarray] = {}
        self._n = 400  # numeric names like real constant-folded exports

    def name(self, tag="") -> str:
        self._n += 1
        return f"onnx::{tag}_{self._n}" if tag else str(self._n)

    def init(self, arr: np.ndarray, tag="") -> str:
        n = self.name(tag)
        self.inits[n] = arr
        return n

    def conv(self, x: str, w_hwio, b=None, stride=1, groups=1) -> str:
        kh, kw = w_hwio.shape[:2]
        out = self.name("Conv")
        ins = [x, self.init(np.ascontiguousarray(
            np.asarray(w_hwio, np.float32).transpose(3, 2, 0, 1)), "Conv")]
        if b is not None:
            ins.append(self.init(np.asarray(b, np.float32), "Conv"))
        self.nodes.append(_node(
            "Conv", ins, [out],
            _attr_ints("kernel_shape", [kh, kw]),
            _attr_ints("strides", [stride, stride]),
            _attr_ints("pads", [kh // 2, kw // 2, kh // 2, kw // 2]),
            _attr_i("group", groups),
        ))
        return out

    def bn(self, x: str, p: dict) -> str:
        out = self.name("Bn")
        self.nodes.append(_node(
            "BatchNormalization",
            [x, self.init(np.asarray(p["gamma"], np.float32)),
             self.init(np.asarray(p["beta"], np.float32)),
             self.init(np.asarray(p["mean"], np.float32)),
             self.init(np.asarray(p["var"], np.float32))],
            [out], _attr_f("epsilon", EPS),
        ))
        return out

    def prelu(self, x: str, alpha) -> str:
        out = self.name("PRelu")
        slope = np.asarray(alpha, np.float32).reshape(-1, 1, 1)  # [C,1,1]
        self.nodes.append(_node("PRelu", [x, self.init(slope)], [out]))
        return out

    def add(self, a: str, b: str) -> str:
        out = self.name("Add")
        self.nodes.append(_node("Add", [a, b], [out]))
        return out

    def flatten(self, x: str) -> str:
        out = self.name("Flatten")
        self.nodes.append(_node("Flatten", [x], [out], _attr_i("axis", 1)))
        return out

    def reshape_flat(self, x: str) -> str:
        out = self.name("Reshape")
        shape = self.init(np.asarray([0, -1], np.int64), "Shape")
        self.nodes.append(_node("Reshape", [x, shape], [out]))
        return out

    def gemm(self, x: str, w_io, b) -> str:
        out = self.name("Gemm")
        w_oi = np.ascontiguousarray(np.asarray(w_io, np.float32).T)
        self.nodes.append(_node(
            "Gemm", [x, self.init(w_oi), self.init(np.asarray(b, np.float32))],
            [out], _attr_i("transB", 1),
            _attr_f("alpha", 1.0), _attr_f("beta", 1.0),
        ))
        return out

    def resize2x(self, x: str) -> str:
        """Real-export Resize: roi + scales ride as initializers, mode/
        coordinate_transformation_mode as string attrs (torch.onnx upsample
        export shape)."""
        out = self.name("Resize")
        roi = self.init(np.zeros(0, np.float32), "Roi")
        scales = self.init(np.asarray([1.0, 1.0, 2.0, 2.0], np.float32),
                           "Scales")
        self.nodes.append(_node(
            "Resize", [x, roi, scales], [out],
            _attr_s("mode", b"nearest"),
            _attr_s("coordinate_transformation_mode", b"asymmetric"),
            _attr_s("nearest_mode", b"floor"),
        ))
        return out

    def folded_conv(self, x: str, conv_p, bn_p, stride=1, groups=1) -> str:
        """onnxsim-style conv+bn fusion: emits ONE biased Conv node."""
        scale = np.asarray(bn_p["gamma"], np.float64) / np.sqrt(
            np.asarray(bn_p["var"], np.float64) + EPS)
        w = np.asarray(conv_p["w"], np.float64) * scale[None, None, None, :]
        b = np.asarray(bn_p["beta"], np.float64) - np.asarray(
            bn_p["mean"], np.float64) * scale
        return self.conv(x, w.astype(np.float32), b.astype(np.float32),
                         stride=stride, groups=groups)


def _iresnet_graph(params: dict, folded: bool, shuffle_rng=None,
                   fp16_rng=None) -> bytes:
    """w600k_r50-style export of our iresnet tree, in execution order."""
    e = _Emit()
    if folded:
        t = e.folded_conv("input", params["stem"], params["stem_bn"])
    else:
        t = e.bn(e.conv("input", params["stem"]["w"]), params["stem_bn"])
    t = e.prelu(t, params["stem_prelu"]["alpha"])
    for stage in params["stages"]:
        for bi, blk in enumerate(stage):
            stride = 2 if bi == 0 else 1
            y = e.bn(t, blk["bn1"])
            if folded:
                y = e.folded_conv(y, blk["conv1"], blk["bn2"])
            else:
                y = e.bn(e.conv(y, blk["conv1"]["w"]), blk["bn2"])
            y = e.prelu(y, blk["prelu"]["alpha"])
            if folded:
                y = e.folded_conv(y, blk["conv2"], blk["bn3"], stride=stride)
            else:
                y = e.bn(e.conv(y, blk["conv2"]["w"], stride=stride), blk["bn3"])
            if "down_conv" in blk:
                if folded:
                    s = e.folded_conv(t, blk["down_conv"], blk["down_bn"],
                                      stride=stride)
                else:
                    s = e.bn(e.conv(t, blk["down_conv"]["w"], stride=stride),
                             blk["down_bn"])
            else:
                s = t
            t = e.add(s, y)
    t = e.bn(t, params["head_bn"])
    t = e.flatten(t) if folded else e.reshape_flat(t)
    t = e.gemm(t, params["fc"]["w"], params["fc"]["b"])
    e.bn(t, params["feat_bn"])
    return _model(e.nodes, e.inits, shuffle_rng, fp16_rng=fp16_rng)


def _retinaface_graph(params: dict, shuffle_rng=None, fp16_rng=None) -> bytes:
    """det-style export of our retinaface tree in TRUE execution order,
    onnxsim-folded, with the weightless plumbing ops real graphs carry.
    Trees built with act="prelu" additionally emit per-channel-[C,1,1]
    PRelu nodes after every activated conv — the real det_10g shape."""
    e = _Emit()

    def cb(x, p, stride=1, groups=1):
        y = e.folded_conv(x, p["conv"], p["bn"], stride=stride, groups=groups)
        if "act" in p:
            y = e.prelu(y, p["act"]["alpha"])
        return y

    t = cb("input", params["stem"], stride=2)
    feats = []
    from frp_tpu.models.retinaface import _STAGE1, _STAGE2, _STAGE3

    for name, plan in (("stage1", _STAGE1), ("stage2", _STAGE2),
                       ("stage3", _STAGE3)):
        for p, (_, stride) in zip(params[name], plan):
            t = cb(t, p["dw"], stride=stride,
                   groups=np.asarray(p["dw"]["conv"]["w"]).shape[3])
            t = cb(t, p["pw"])
        feats.append(t)
    lat = [cb(f, p) for p, f in zip(params["fpn_lat"], feats)]
    # FPN top-down: p2's merge conv executes BEFORE p1's; upsamples are
    # full real-export Resize nodes (roi/scales initializers + mode attrs)
    p2 = cb(e.add(lat[1], e.resize2x(lat[2])), params["fpn_td"][0])
    p1 = cb(e.add(lat[0], e.resize2x(p2)), params["fpn_td"][1])
    pyramid = [p1, p2, lat[2]]
    feats = []
    for p, f in zip(params["ssh"], pyramid):
        c3 = cb(f, p["conv3"])
        c5_1 = cb(f, p["conv5_1"])
        c5 = cb(c5_1, p["conv5_2"])
        c7_2 = cb(c5_1, p["conv7_2"])
        c7 = cb(c7_2, p["conv7_3"])
        cat = e.name("Concat")
        e.nodes.append(_node("Concat", [c3, c5, c7], [cat], _attr_i("axis", 1)))
        relu = e.name("Relu")
        e.nodes.append(_node("Relu", [cat], [relu]))
        feats.append(relu)
    for head in ("head_cls", "head_box", "head_ldm"):
        for p, f in zip(params[head], feats):
            e.conv(f, p["w"])  # plain unbiased 1x1 head convs
    return _model(e.nodes, e.inits, shuffle_rng, fp16_rng=fp16_rng)


# --- independent torch interpreter of the replica graph ---------------------

def _torch_run(graph: dict, x_nchw: np.ndarray) -> np.ndarray:
    import torch
    import torch.nn.functional as F

    inits = {k: torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
             for k, v in graph["initializers"].items()
             if v.dtype != np.int64}  # fp16 initializers compute in f32
    int_inits = {k: v for k, v in graph["initializers"].items()
                 if v.dtype == np.int64}
    np_inits = graph["initializers"]
    env = {"input": torch.from_numpy(x_nchw.astype(np.float32))}

    def get(n):
        return env[n] if n in env else inits[n]

    out = None
    for node in graph["nodes"]:
        op, ins, outs, attrs = (node["op"], node["inputs"], node["outputs"],
                                node["attrs"])
        if op == "Conv":
            pads = attrs.get("pads", [0, 0, 0, 0])
            assert pads[0] == pads[2] and pads[1] == pads[3]
            y = F.conv2d(
                get(ins[0]), get(ins[1]),
                get(ins[2]) if len(ins) > 2 else None,
                stride=tuple(attrs.get("strides", [1, 1])),
                padding=(pads[0], pads[1]),
                groups=attrs.get("group", 1),
            )
        elif op == "BatchNormalization":
            y = F.batch_norm(
                get(ins[0]), get(ins[3]), get(ins[4]),
                weight=get(ins[1]), bias=get(ins[2]),
                training=False, eps=attrs.get("epsilon", EPS),
            )
        elif op == "PRelu":
            y = F.prelu(get(ins[0]), get(ins[1]).reshape(-1))
        elif op == "Add":
            y = get(ins[0]) + get(ins[1])
        elif op == "Flatten":
            t = get(ins[0])
            y = t.reshape(t.shape[0], -1)
        elif op == "Reshape":
            t = get(ins[0])
            shape = [t.shape[i] if d == 0 else d
                     for i, d in enumerate(int_inits[ins[1]].tolist())]
            y = t.reshape(shape)
        elif op == "Gemm":
            w = get(ins[1])
            if attrs.get("transB", 0):
                w = w.t()
            y = get(ins[0]) @ w + get(ins[2])
        elif op == "Resize":
            assert attrs.get("mode") == b"nearest", attrs
            scales = np_inits[ins[2]].astype(np.float64)
            y = F.interpolate(get(ins[0]),
                              scale_factor=(scales[2], scales[3]),
                              mode="nearest")
        elif op == "Concat":
            y = torch.cat([get(i) for i in ins], dim=attrs.get("axis", 1))
        elif op == "Relu":
            y = torch.relu(get(ins[0]))
        else:
            raise AssertionError(f"torch interpreter hit unexpected op {op}")
        env[outs[0]] = y
        out = y
    return out.detach().numpy()


# --- tests ------------------------------------------------------------------

def _fresh_numpy_tree(init_fn, *args, **kw):
    # NOT tree_map(np.asarray): tree_map sorts dict keys, destroying the
    # construction-order walk the importer matches by; init fns already
    # return numpy leaves in insertion order
    return init_fn(*args, **kw)


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_w600k_r50_style_export_matches_independent_torch_trace(tmp_path):
    """Folded iresnet50/512-d replica (the real w600k_r50 shape): import it,
    then check our JAX forward on the imported tree against an independent
    torch execution OF THE GRAPH ITSELF."""
    from frp_tpu.models.iresnet import init_iresnet, iresnet_forward

    params = _fresh_numpy_tree(init_iresnet, 3, variant="iresnet50",
                               embed_dim=512)
    # realistic BN stats (nonzero means, non-unit vars) so folding is
    # exercised; small gammas keep 24 residual blocks' activations bounded
    # like a trained net's (exploding magnitudes would just measure f32
    # accumulation-order noise, not import correctness)
    rng = np.random.default_rng(0)
    for kind, node, _ in _collect_units(params):
        if kind == "bn":
            node["gamma"] = rng.uniform(0.1, 0.3, node["gamma"].shape).astype(np.float32)
            node["mean"] = rng.normal(0, 0.3, node["mean"].shape).astype(np.float32)
            node["var"] = (0.5 + rng.random(node["var"].shape)).astype(np.float32)
    path = tmp_path / "w600k_r50.onnx"
    # fp16_rng: ~half the initializers ship as float16 (raw and
    # int32_data-bit-pattern encodings mixed), like real buffalo_l exports
    path.write_bytes(_iresnet_graph(params, folded=True,
                                    shuffle_rng=np.random.default_rng(11),
                                    fp16_rng=np.random.default_rng(13)))

    graph = load_onnx_graph(str(path))
    assert graph is not None and graph["nodes"]
    dtypes = {v.dtype for v in graph["initializers"].values()}
    assert np.dtype(np.float16) in dtypes, "fp16 leg not exercised"
    target = _fresh_numpy_tree(init_iresnet, 9, variant="iresnet50",
                               embed_dim=512)
    copied = import_onnx_graph(target, graph)
    assert copied > 300

    x = rng.normal(0, 1, (1, 112, 112, 3)).astype(np.float32)
    ref = _torch_run(graph, x.transpose(0, 3, 1, 2))
    nn.set_padding_mode("torch")  # imported-checkpoint semantics
    try:
        got = np.asarray(iresnet_forward(target, x, normalize=False))
    finally:
        nn.set_padding_mode("same")
    assert ref.shape == got.shape == (1, 512)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_unfused_export_numeric_names_shuffled_initializers(tmp_path):
    """Unfolded replica with numeric names and shuffled initializer order:
    every leaf must land exactly where it came from."""
    import jax

    from frp_tpu.models.iresnet import init_iresnet

    params = _fresh_numpy_tree(init_iresnet, 5, variant="iresnet18",
                               embed_dim=128)
    path = tmp_path / "emb.onnx"
    path.write_bytes(_iresnet_graph(params, folded=False,
                                    shuffle_rng=np.random.default_rng(2)))
    graph = load_onnx_graph(str(path))
    target = _fresh_numpy_tree(init_iresnet, 6, variant="iresnet18",
                               embed_dim=128)
    import_onnx_graph(target, graph)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(target),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_det_style_execution_order_export_roundtrip(tmp_path):
    """Folded detector replica in true execution order (FPN p2-merge before
    p1-merge): imported weights must reproduce the original forward. Catches
    tree-walk-vs-execution-order divergence on shape-identical convs."""
    from frp_tpu.models.retinaface import init_retinaface, retinaface_forward

    params = _fresh_numpy_tree(init_retinaface, 4)
    rng = np.random.default_rng(1)
    for kind, node, _ in _collect_units(params):
        if kind == "bn":
            node["mean"] = rng.normal(0, 0.3, node["mean"].shape).astype(np.float32)
            node["var"] = (0.5 + rng.random(node["var"].shape)).astype(np.float32)
    path = tmp_path / "det.onnx"
    path.write_bytes(_retinaface_graph(params, shuffle_rng=np.random.default_rng(7)))
    graph = load_onnx_graph(str(path))
    target = _fresh_numpy_tree(init_retinaface, 8)
    copied = import_onnx_graph(target, graph)
    assert copied > 100

    x = rng.normal(0, 1, (1, 128, 128, 3)).astype(np.float32)
    ref = retinaface_forward(params, x)
    got = retinaface_forward(target, x)
    np.testing.assert_allclose(np.asarray(got["cls_logits"]),
                               np.asarray(ref["cls_logits"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["loc"]), np.asarray(ref["loc"]),
                               rtol=2e-3, atol=2e-3)


def test_det_style_prelu_fp16_resize_torch_crosscheck(tmp_path):
    """det_10g-style realism notch (VERDICT r3 #7): per-channel [C,1,1]
    PRelu slopes after every activated conv, real Resize nodes (roi/scales
    initializers + string mode attrs), fp16 initializers mixed in — imported
    onto the act="prelu" detector tree, checked two independent ways:

    1. forward equivalence: our JAX forward on the imported tree must match
       the graph-executing torch interpreter on the stride-32 landmark head
       (the final node, fed by the whole backbone+FPN+SSH graph);
    2. plumbing exactness is implied: any mis-landed tensor shifts that head.
    """
    from frp_tpu.models.retinaface import (
        NUM_ANCHORS,
        init_retinaface,
        retinaface_forward,
    )

    params = _fresh_numpy_tree(init_retinaface, 4, act="prelu")
    rng = np.random.default_rng(1)
    for kind, node, _ in _collect_units(params):
        if kind == "bn":
            node["mean"] = rng.normal(0, 0.3, node["mean"].shape).astype(np.float32)
            node["var"] = (0.5 + rng.random(node["var"].shape)).astype(np.float32)
        elif kind == "prelu":
            # learned, non-default slopes so a dropped/mis-landed alpha shows
            node["alpha"] = rng.uniform(0.05, 0.45,
                                        node["alpha"].shape).astype(np.float32)
    path = tmp_path / "det_10g.onnx"
    path.write_bytes(_retinaface_graph(
        params, shuffle_rng=np.random.default_rng(7),
        fp16_rng=np.random.default_rng(3)))
    graph = load_onnx_graph(str(path))
    dtypes = {v.dtype for v in graph["initializers"].values()}
    assert np.dtype(np.float16) in dtypes, "fp16 leg not exercised"
    assert any(n["op"] == "Resize" and len(n["inputs"]) == 3
               for n in graph["nodes"]), "realistic Resize leg not exercised"

    target = _fresh_numpy_tree(init_retinaface, 8, act="prelu")
    copied = import_onnx_graph(target, graph)
    n_prelu = sum(1 for k, _, _ in _collect_units(target) if k == "prelu")
    assert n_prelu > 20 and copied > 100

    x = rng.normal(0, 1, (1, 128, 128, 3)).astype(np.float32)
    ref = _torch_run(graph, x.transpose(0, 3, 1, 2))  # last node: ldm head @ s32
    nn.set_padding_mode("torch")  # the replica's conv pads are k//2 symmetric
    try:
        got = retinaface_forward(target, x)
    finally:
        nn.set_padding_mode("same")
    tail = ref.transpose(0, 2, 3, 1).reshape(1, -1, 10)  # NCHW -> [1,h*w*A,10]
    got_ldm = np.asarray(got["ldm"])[:, -tail.shape[1]:, :]
    assert tail.shape == got_ldm.shape
    np.testing.assert_allclose(got_ldm, tail, rtol=2e-3, atol=2e-3)


def test_structure_mismatch_is_loud(tmp_path):
    """A graph whose op sequence does not fit the target tree must raise."""
    from frp_tpu.models.iresnet import init_iresnet

    params = _fresh_numpy_tree(init_iresnet, 5, variant="iresnet18",
                               embed_dim=128)
    path = tmp_path / "emb.onnx"
    path.write_bytes(_iresnet_graph(params, folded=True))
    graph = load_onnx_graph(str(path))
    wrong = _fresh_numpy_tree(init_iresnet, 5, variant="iresnet34",
                              embed_dim=128)
    with pytest.raises(ValueError):
        import_onnx_graph(wrong, graph)


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_engine_end_to_end_iresnet50_onnx(tmp_path):
    """embedder_arch=iresnet50 + a w600k-style embedder.onnx drop-in: the
    engine imports it and enroll->compare works end to end on CPU."""
    import shutil

    from frp_tpu.config import load_config
    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.models.iresnet import init_iresnet
    from frp_tpu.train.synthetic import make_scene

    # shipped detector/spoof weights beside the user's embedder export
    import os

    wsrc = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights")
    for name in ("retinaface_synthetic.npz", "spoof.npz"):
        shutil.copy2(os.path.join(wsrc, name), tmp_path / name)
    params = _fresh_numpy_tree(init_iresnet, 12, variant="iresnet50",
                               embed_dim=512)
    (tmp_path / "embedder.onnx").write_bytes(_iresnet_graph(params, folded=True))

    cfg = load_config(
        det_size=128, max_faces_per_frame=2, pre_nms_topk=64,
        det_conf_threshold=0.3, embedder_arch="iresnet50", embed_dim=512,
        weights_dir=str(tmp_path),
    )
    engine = RecognitionEngine(cfg, seed=0)
    assert engine.weights_loaded["embedder"].endswith("embedder.onnx")
    assert engine.weights_loaded["detector"].endswith(".npz")

    # portrait=True keeps the face inside the shipped detector's trained
    # pixel range on this small grid — detection is then reliable across
    # seeds (probed 0..13: portrait 14/14, plain 8/14), so no skip needed
    img, _, _, _ = make_scene(128, np.random.default_rng(5), max_faces=1,
                              portrait=True)
    out1 = engine.process_frames(img[None])
    assert out1["valid"].any(), "shipped detector missed the portrait scene"
    i, j = np.argwhere(out1["valid"])[0]
    emb = out1["embeddings"][i, j]
    assert emb.shape == (512,)
    engine.gallery.add("person-512", emb)
    out2 = engine.process_frames(img[None])
    assert out2["is_match"][i, j]
    assert out2["best_distance"][i, j] < 0.1
