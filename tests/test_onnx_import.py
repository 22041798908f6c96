"""ONNX weight-import path (models/params.py): a hand-serialized ONNX
protobuf round-trips through load_onnx_tensors and maps structurally onto a
param pytree — the drop-in slot for real InsightFace/ArcFace exports
(reference deepfake_utils.py:39-54)."""

import numpy as np
import pytest

from frp_tpu.models.params import (
    import_onnx_weights,
    load_onnx_tensors,
)


# --- minimal protobuf writers (test-side mirror of the reader) -------------

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload) -> bytes:
    key = _varint((num << 3) | wire)
    if wire == 0:
        return key + _varint(payload)
    return key + _varint(len(payload)) + payload


def _tensorproto(name: str, arr: np.ndarray) -> bytes:
    body = b""
    for d in arr.shape:
        body += _field(1, 0, d)  # dims
    body += _field(2, 0, 1)  # data_type FLOAT
    body += _field(8, 2, name.encode())
    body += _field(9, 2, np.ascontiguousarray(arr, np.float32).tobytes())
    return body


def _onnx_bytes(tensors: dict) -> bytes:
    graph = b"".join(_field(5, 2, _tensorproto(n, a)) for n, a in tensors.items())
    model = _field(1, 0, 8)  # ir_version (arbitrary varint field)
    model += _field(7, 2, graph)
    return model


# --- tests ------------------------------------------------------------------

def test_load_onnx_tensors_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "conv1.weight": rng.normal(size=(8, 3, 3, 3)).astype(np.float32),  # OIHW
        "bn1.weight": rng.normal(size=(8,)).astype(np.float32),
        "fc.weight": rng.normal(size=(4, 8)).astype(np.float32),
    }
    path = tmp_path / "model.onnx"
    path.write_bytes(_onnx_bytes(tensors))
    got = load_onnx_tensors(str(path))
    assert set(got) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def test_import_onnx_weights_structural(tmp_path):
    rng = np.random.default_rng(1)
    # torch-style module naming: conv -> bn -> linear
    onnx_tensors = {
        "features.0.weight": rng.normal(size=(8, 3, 3, 3)).astype(np.float32),
        "features.1.weight": rng.normal(size=(8,)).astype(np.float32),
        "features.1.bias": rng.normal(size=(8,)).astype(np.float32),
        "features.1.running_mean": rng.normal(size=(8,)).astype(np.float32),
        "features.1.running_var": np.abs(rng.normal(size=(8,))).astype(np.float32),
        "classifier.weight": rng.normal(size=(4, 8)).astype(np.float32),
        "classifier.bias": rng.normal(size=(4,)).astype(np.float32),
    }
    path = tmp_path / "m.onnx"
    path.write_bytes(_onnx_bytes(onnx_tensors))

    params = {
        "stem": {"w": np.zeros((3, 3, 3, 8), np.float32)},
        "bn": {"gamma": np.zeros(8, np.float32), "beta": np.zeros(8, np.float32),
               "mean": np.zeros(8, np.float32), "var": np.ones(8, np.float32)},
        "head": {"w": np.zeros((8, 4), np.float32), "b": np.zeros(4, np.float32)},
    }
    copied = import_onnx_weights(params, load_onnx_tensors(str(path)))
    assert copied == 7
    # conv OIHW -> HWIO
    np.testing.assert_array_equal(
        params["stem"]["w"], onnx_tensors["features.0.weight"].transpose(2, 3, 1, 0)
    )
    np.testing.assert_array_equal(params["bn"]["mean"],
                                  onnx_tensors["features.1.running_mean"])
    # linear [out, in] -> [in, out]
    np.testing.assert_array_equal(params["head"]["w"],
                                  onnx_tensors["classifier.weight"].T)


def test_import_onnx_weights_shape_mismatch_raises(tmp_path):
    tensors = {"fc.weight": np.zeros((4, 9), np.float32),
               "fc.bias": np.zeros(4, np.float32)}
    path = tmp_path / "bad.onnx"
    path.write_bytes(_onnx_bytes(tensors))
    params = {"head": {"w": np.zeros((8, 4), np.float32), "b": np.zeros(4, np.float32)}}
    with pytest.raises(ValueError):
        import_onnx_weights(params, load_onnx_tensors(str(path)))


def test_load_onnx_tensors_absent_or_garbage(tmp_path):
    assert load_onnx_tensors(str(tmp_path / "missing.onnx")) is None
    p = tmp_path / "empty.onnx"
    p.write_bytes(b"")
    assert load_onnx_tensors(str(p)) is None
    p2 = tmp_path / "garbage.onnx"
    p2.write_bytes(b"\xff\xfe\x00definitely not protobuf")
    assert load_onnx_tensors(str(p2)) is None


def test_engine_loads_onnx_candidate(tmp_path):
    """Drop a structurally-matching spoof.onnx into weights_dir -> the engine
    imports it (the real-pretrained-weights drop-in path, VERDICT item 3a)."""
    import types

    import torch

    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.models.mobilenetv3 import init_mobilenetv3_small

    params = init_mobilenetv3_small(0)
    # serialize OUR param units as an ONNX file with torch-style names by
    # exporting through the same unit walk the importer uses
    from frp_tpu.models.params import _collect_units

    tensors = {}
    for idx, (kind, node, path) in enumerate(_collect_units(params)):
        base = f"m{idx:03d}"
        if kind == "conv":
            tensors[f"{base}.weight"] = np.asarray(node["w"]).transpose(3, 2, 0, 1)
        elif kind == "bn":
            tensors[f"{base}.weight"] = np.asarray(node["gamma"])
            tensors[f"{base}.bias"] = np.asarray(node["beta"])
            tensors[f"{base}.running_mean"] = np.asarray(node["mean"])
            tensors[f"{base}.running_var"] = np.asarray(node["var"])
        elif kind == "dense":
            tensors[f"{base}.weight"] = np.asarray(node["w"]).T
            tensors[f"{base}.bias"] = np.asarray(node["b"])
        elif kind == "prelu":
            tensors[f"{base}.weight"] = np.asarray(node["alpha"])
    (tmp_path / "spoof.onnx").write_bytes(_onnx_bytes(tensors))

    shim = types.SimpleNamespace(cfg=types.SimpleNamespace(weights_dir=str(tmp_path)))
    loaded = RecognitionEngine._load_weights(shim, {"spoof": params}, "mobilefacenet")
    assert loaded["spoof"] is not None and loaded["spoof"].endswith("spoof.onnx")


def test_int32_initializer_parsed_not_fatal(tmp_path):
    """An int32-typed initializer (TensorProto field 5, packed varints) must
    parse — previously one such tensor made load_onnx_tensors reject the
    whole file, discarding every float weight."""
    from frp_tpu.models.params import load_onnx_tensors

    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    # int32 tensor: dims + data_type INT32(6) + name + packed int32_data
    ints = [3, 1, 4]
    body = b""
    body += _field(1, 0, 3)          # dims [3]
    body += _field(2, 0, 6)          # data_type INT32
    body += _field(8, 2, b"shape_info")
    packed = b"".join(_varint(v) for v in ints)
    body += _field(5, 2, packed)     # int32_data
    graph = _field(5, 2, _tensorproto("w", w)) + _field(5, 2, body)
    model = _field(7, 2, graph)
    path = tmp_path / "m.onnx"
    path.write_bytes(model)
    tensors = load_onnx_tensors(str(path))
    assert tensors is not None
    np.testing.assert_array_equal(tensors["w"], w)
    np.testing.assert_array_equal(tensors["shape_info"], ints)


def test_user_onnx_outranks_shipped_npz(tmp_path):
    """A user-provided ONNX export must WIN over a shipped npz in the same
    weights dir (engine candidate order) — the importer's whole purpose."""
    import types

    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.models.mobilenetv3 import init_mobilenetv3_small
    from frp_tpu.models.params import _collect_units, save_params

    params = init_mobilenetv3_small(0)
    save_params(str(tmp_path / "spoof.npz"), params)
    tensors = {}
    for idx, (kind, node, path) in enumerate(_collect_units(params)):
        base = f"m{idx:03d}"
        if kind == "conv":
            tensors[f"{base}.weight"] = np.asarray(node["w"]).transpose(3, 2, 0, 1)
        elif kind == "bn":
            tensors[f"{base}.weight"] = np.asarray(node["gamma"])
            tensors[f"{base}.bias"] = np.asarray(node["beta"])
            tensors[f"{base}.running_mean"] = np.asarray(node["mean"])
            tensors[f"{base}.running_var"] = np.asarray(node["var"])
        elif kind == "dense":
            tensors[f"{base}.weight"] = np.asarray(node["w"]).T
            tensors[f"{base}.bias"] = np.asarray(node["b"])
        elif kind == "prelu":
            tensors[f"{base}.weight"] = np.asarray(node["alpha"])
    (tmp_path / "spoof.onnx").write_bytes(_onnx_bytes(tensors))
    shim = types.SimpleNamespace(cfg=types.SimpleNamespace(weights_dir=str(tmp_path)))
    loaded = RecognitionEngine._load_weights(shim, {"spoof": params}, "mobilefacenet")
    assert loaded["spoof"] and loaded["spoof"].endswith("spoof.onnx")


def test_torchvision_se_compatibility():
    """mobilenet_v3_small import compatibility: SE hidden widths follow
    torchvision's _make_divisible(exp//4, 8), the param-dict order puts SE
    before project (torchvision module order), and a torch-style 1x1-conv SE
    weight coerces onto our dense unit."""
    from frp_tpu.models import nn
    from frp_tpu.models.mobilenetv3 import _SPEC, init_mobilenetv3_small
    from frp_tpu.models.params import _collect_units, import_torch_weights

    # widths
    assert nn.make_divisible(240 // 4, 8) == 64
    assert nn.make_divisible(120 // 4, 8) == 32
    assert nn.make_divisible(144 // 4, 8) == 40
    params = init_mobilenetv3_small(0)
    for block, (k, exp, cout, use_se, _, _) in zip(params["blocks"], _SPEC):
        if use_se:
            assert block["se"]["fc1"]["w"].shape[1] == nn.make_divisible(exp // 4, 8)
            # order: se unit walks BEFORE project
            keys = [k2 for k2 in block if block[k2] is not None]
            assert keys.index("se") < keys.index("project")

    # dense <- 1x1 conv coercion: export our params with SE as 4-d conv
    # weights (as torchvision would) and re-import
    units = _collect_units(params)
    state = {}
    for idx, (kind, node, path) in enumerate(units):
        base = f"m{idx:03d}"
        if kind == "conv":
            state[f"{base}.weight"] = np.asarray(node["w"])
        elif kind == "bn":
            state[f"{base}.weight"] = np.asarray(node["gamma"])
            state[f"{base}.bias"] = np.asarray(node["beta"])
            state[f"{base}.running_mean"] = np.asarray(node["mean"])
            state[f"{base}.running_var"] = np.asarray(node["var"])
        elif kind == "dense" and "se" in path:
            w = np.asarray(node["w"])  # [i, o] -> HWIO [1, 1, i, o] conv
            state[f"{base}.weight"] = w[None, None]
            state[f"{base}.bias"] = np.asarray(node["b"])
        elif kind == "dense":
            state[f"{base}.weight"] = np.asarray(node["w"]).T
            state[f"{base}.bias"] = np.asarray(node["b"])
        elif kind == "prelu":
            state[f"{base}.weight"] = np.asarray(node["alpha"])
    fresh = init_mobilenetv3_small(1)
    copied = import_torch_weights(fresh, state)
    assert copied > 0
    np.testing.assert_allclose(
        fresh["blocks"][0]["se"]["fc1"]["w"], params["blocks"][0]["se"]["fc1"]["w"]
    )


def test_biased_conv_import_is_loud():
    """A torch checkpoint with biased convs mapping onto our bias-free
    conv+bn units must raise a descriptive error, not silently drop biases."""
    from frp_tpu.models import nn
    from frp_tpu.models.params import import_torch_weights

    ours = {"stem": nn.conv_init(np.random.default_rng(0), 3, 3, 3, 8)}
    state = {
        "stem.weight": np.zeros((3, 3, 3, 8), np.float32),
        "stem.bias": np.zeros((8,), np.float32),
    }
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bias"):
        import_torch_weights(ours, state)
