"""CI exercise of the one-command real-weights onramp (VERDICT r4 #6):
tools/import_real_weights.py --dry-run against a GENUINE torch.onnx export
(the same real exporter bytes test_onnx_torch_export.py proves fidelity
on). Dry-run validates the structural import + forward smoke without
touching weights/ or spawning chip subprocesses."""

import runpy
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_onnx_torch_export import _export, _IResNet, _realistic_stats

TOOL = "tools/import_real_weights.py"


def _run(argv, capsys):
    old = sys.argv
    sys.argv = [TOOL] + argv
    try:
        runpy.run_path(TOOL, run_name="__main__")
    finally:
        sys.argv = old
    return capsys.readouterr().out


def _make_export(tmp_path):
    net = _IResNet().eval()
    _realistic_stats(net, np.random.default_rng(7))
    path = str(tmp_path / "w600k_r18.onnx")
    _export(net, path, fold=False)
    return path


def test_dry_run_validates_real_export(tmp_path, capsys):
    out = _run(["--embedder", _make_export(tmp_path),
                "--arch", "iresnet18", "--dry-run"], capsys)
    assert "embedder: imported w600k_r18.onnx" in out
    assert "dry run: validation passed" in out


def test_wrong_arch_fails_loudly(tmp_path, capsys):
    """An iresnet export declared as mobilefacenet must not install — the
    structural walk mismatches and the tool exits nonzero."""
    with pytest.raises(SystemExit):
        _run(["--embedder", _make_export(tmp_path),
              "--arch", "mobilefacenet", "--dry-run"], capsys)


def test_garbage_file_rejected(tmp_path, capsys):
    bad = tmp_path / "bad.onnx"
    bad.write_bytes(b"not an onnx file")
    with pytest.raises(SystemExit):
        _run(["--detector", str(bad), "--dry-run"], capsys)
