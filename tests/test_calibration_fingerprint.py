"""Weights <-> calibration consistency (ADVICE r4 high/medium): the
distance scale is measured on exact weights; round 4 committed a retrained
iresnet18.npz under the previous weights' calibration and every distance
band silently drifted. Contract: calibration artifacts carry the sha256 of
the weights they were measured on, the engine refuses a mismatch, and the
shipped artifacts in weights/ must always match the shipped npz files."""

import glob
import hashlib
import json
import os
from types import SimpleNamespace

import pytest

from frp_tpu.engine.pipeline import RecognitionEngine
from frp_tpu.utils.fingerprint import weights_fingerprint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fake_engine(tmp_path, arch="iresnet18"):
    emb = tmp_path / f"{arch}.npz"
    emb.write_bytes(b"weights-as-shipped")
    eng = object.__new__(RecognitionEngine)
    eng.cfg = SimpleNamespace(embedder_arch=arch)
    eng.weights_loaded = {"embedder": str(emb)}
    return eng, emb


def test_mismatched_fingerprint_raises(tmp_path):
    eng, emb = _fake_engine(tmp_path)
    stale = hashlib.sha256(b"weights-as-measured-last-round").hexdigest()
    (tmp_path / "calibration_iresnet18.json").write_text(json.dumps(
        {"distance_scale": 0.82, "weights_sha256": stale}))
    with pytest.raises(RuntimeError, match="sha256"):
        eng._load_calibration()


def test_matching_fingerprint_loads_scale(tmp_path):
    eng, emb = _fake_engine(tmp_path)
    (tmp_path / "calibration_iresnet18.json").write_text(json.dumps(
        {"distance_scale": 0.82,
         "weights_sha256": weights_fingerprint(str(emb))}))
    assert eng._load_calibration() == pytest.approx(0.82)


def test_allow_stale_calibration_runs_uncalibrated(tmp_path):
    """tools/calibrate_embedder.py must be able to build an engine while
    the shipped calibration is stale (it measures raw distances and exists
    to replace the stale scale) — chicken-and-egg otherwise: the serving
    refusal would also block the re-measurement that fixes it."""
    eng, emb = _fake_engine(tmp_path)
    eng._allow_stale_calibration = True
    stale = hashlib.sha256(b"other-weights").hexdigest()
    (tmp_path / "calibration_iresnet18.json").write_text(json.dumps(
        {"distance_scale": 0.82, "weights_sha256": stale}))
    assert eng._load_calibration() == pytest.approx(1.0)


def test_legacy_artifact_without_fingerprint_still_loads(tmp_path):
    """Back-compat: user-generated calibration files from before the
    fingerprint field keep working (they cannot be verified)."""
    eng, emb = _fake_engine(tmp_path)
    (tmp_path / "calibration_iresnet18.json").write_text(json.dumps(
        {"distance_scale": 0.75}))
    assert eng._load_calibration() == pytest.approx(0.75)


def test_shipped_artifacts_match_shipped_weights():
    """Every calibration/tiered-eval artifact in weights/ must carry a
    fingerprint AND match its npz — the drift class that merged silently in
    round 4 now fails CI."""
    arts = sorted(glob.glob(os.path.join(REPO, "weights", "calibration*.json"))
                  + glob.glob(os.path.join(REPO, "weights", "tiered_eval*.json")))
    assert arts, "expected shipped calibration artifacts"
    for path in arts:
        with open(path) as f:
            art = json.load(f)
        arch = art.get("arch", "mobilefacenet")
        npz = os.path.join(REPO, "weights", f"{arch}.npz")
        assert os.path.exists(npz), f"{path}: no weights file {npz}"
        fp = art.get("weights_sha256")
        assert fp, f"{path}: missing weights_sha256 (stamp or regenerate)"
        assert fp == weights_fingerprint(npz), (
            f"{path} was measured on different weights than the shipped "
            f"{arch}.npz — re-run tools/calibrate_embedder.py and "
            "tools/tiered_eval.py and commit weights + artifacts together")
        det_fp = art.get("detector_sha256")
        if det_fp:  # e2e metrics also depend on the detector weights
            for cand in ("retinaface.npz", "retinaface_synthetic.npz"):
                det = os.path.join(REPO, "weights", cand)
                if os.path.exists(det):
                    break
            assert det_fp == weights_fingerprint(det), (
                f"{path} was measured with a different detector than the "
                f"shipped {os.path.basename(det)}")


def test_flip_mode_keyed_calibration(tmp_path):
    """Flip-TTA changes the embedding function, so the distance scale is
    mode-keyed: a flip engine loads ONLY calibration_{arch}_flip.json and a
    non-flip engine never loads it."""
    eng, emb = _fake_engine(tmp_path)
    fp = weights_fingerprint(str(emb))
    (tmp_path / "calibration_iresnet18.json").write_text(json.dumps(
        {"distance_scale": 0.82, "weights_sha256": fp}))
    (tmp_path / "calibration_iresnet18_flip.json").write_text(json.dumps(
        {"distance_scale": 0.64, "flip_tta": True, "weights_sha256": fp}))
    assert eng._load_calibration() == pytest.approx(0.82)
    eng.cfg.embed_flip_tta = True
    assert eng._load_calibration() == pytest.approx(0.64)


def test_flip_engine_refuses_cross_mode_artifact(tmp_path):
    """A flip engine with only a non-flip calibration runs on the raw scale
    (1.0) — and a hand-renamed non-flip artifact (missing flip_tta: true)
    must not cross modes either."""
    eng, emb = _fake_engine(tmp_path)
    fp = weights_fingerprint(str(emb))
    (tmp_path / "calibration_iresnet18.json").write_text(json.dumps(
        {"distance_scale": 0.82, "weights_sha256": fp}))
    eng.cfg.embed_flip_tta = True
    assert eng._load_calibration() == pytest.approx(1.0)
    (tmp_path / "calibration_iresnet18_flip.json").write_text(json.dumps(
        {"distance_scale": 0.82, "weights_sha256": fp}))  # renamed, no field
    assert eng._load_calibration() == pytest.approx(1.0)
