"""Response-envelope parity for every endpoint the reference React frontend
consumes. The round-1 contract tests verified paths/params; these verify the
RESPONSE fields the client code actually dereferences — the part that silently
breaks a real browser. Each test cites the consuming client line.
"""

import json

import numpy as np
import pytest

from frp_tpu.api.main import build_app
from frp_tpu.config import load_config
from frp_tpu.platform.context import AppContext
from tests.fakes import FakeEngine
from tests.test_api import _jpeg_bytes, _multipart, call


@pytest.fixture()
def app(tmp_path):
    cfg = load_config(
        data_dir=str(tmp_path / "data"),
        log_dir=str(tmp_path / "logs"),
        min_face_quality=0.0,
    )
    ctx = AppContext(
        cfg=cfg,
        engine=FakeEngine(),
        camera_configs=[
            {"id": 0, "name": "Cam A", "geo": (18.5, 73.8), "source": "synthetic:96x64"},
            {"id": 1, "name": "Cam B", "geo": (18.6, 73.9), "source": "synthetic:96x64"},
        ],
    )
    router, sio, ctx = build_app(ctx)
    yield router, ctx
    ctx.shutdown()


def _upload(router, target="alice", filename="alice.jpg"):
    body, ctype = _multipart({"target_name": target}, {"file": (filename, _jpeg_bytes(), "image/jpeg")})
    return call(router, "POST", "/face/upload", body=body, headers={"content-type": ctype})


def test_camera_status_envelope(app):
    """App.jsx:67 reads data.status; :214-222 filters entry.state === 'ok';
    CameraGrid.jsx:59-63 reads meta.name/geo/state."""
    router, _ = app
    status, data, _ = call(router, "GET", "/camera/status")
    assert status == 200 and "status" in data
    entry = data["status"]["0"]
    assert entry["state"] in ("ok", "error")
    assert entry["name"] == "Cam A"
    assert entry["geo"] == [18.5, 73.8]


def test_root_message(app):
    """reference main.py:105."""
    router, _ = app
    _, data, _ = call(router, "GET", "/")
    assert data["message"] == "FastAPI backend is running"


def test_upload_envelope(app):
    """App.jsx:97 / FaceUpload.jsx:247 key off data.status === 'success';
    the frontend posts target_name as a FORM field (App.jsx:91)."""
    router, _ = app
    status, data, _ = _upload(router)
    assert status == 200
    assert data["status"] == "success"
    assert data["target"] == "alice"
    assert "message" in data and "filename" in data
    assert data["quality"]["rating"] in ("excellent", "good", "acceptable")
    assert "file_size_kb" in data["metadata"] and "resolution" in data["metadata"]


def test_upload_target_defaults_to_filename(app):
    """reference face.py:133: no target_name -> filename stem."""
    router, _ = app
    body, ctype = _multipart({}, {"file": ("bob.jpg", _jpeg_bytes(), "image/jpeg")})
    status, data, _ = call(router, "POST", "/face/upload", body=body,
                           headers={"content-type": ctype})
    assert status == 200 and data["target"] == "bob"


def test_upload_query_params(app):
    """reference face.py:117-121: target_name/override/save_raw are QUERY
    params."""
    router, ctx = app
    body, ctype = _multipart({}, {"file": ("x.jpg", _jpeg_bytes(), "image/jpeg")})
    status, data, _ = call(router, "POST", "/face/upload", body=body,
                           query={"target_name": "carol", "save_raw": "true"},
                           headers={"content-type": ctype})
    assert status == 200 and data["target"] == "carol"
    assert data.get("raw_saved")
    import os
    assert os.path.isfile(data["raw_saved"])


def test_list_envelope(app):
    """FaceUpload.jsx:60 reads payload.targets."""
    router, _ = app
    _upload(router)
    status, data, _ = call(router, "GET", "/face/list")
    assert data["status"] == "success"
    assert data["targets"] == ["alice"]
    assert data["count"] == 1 and data["total"] == 1


def test_delete_envelope(app):
    """FaceUpload.jsx:126 keys off payload.status and payload.message."""
    router, _ = app
    _upload(router)
    status, data, _ = call(router, "DELETE", "/face/delete/alice")
    assert data["status"] == "success" and data["message"]


def test_compare_envelope(app):
    """reference face.py:697-705 envelope + the additive `comparisons` the
    client table renders (FaceUpload.jsx:497-546: target/match/distance)."""
    router, _ = app
    _upload(router)
    body, ctype = _multipart({}, {"file": ("probe.jpg", _jpeg_bytes(), "image/jpeg")})
    status, data, _ = call(router, "POST", "/face/compare", body=body,
                           headers={"content-type": ctype})
    assert status == 200 and data["status"] == "success"
    for key in ("filename", "threshold", "total_faces_checked", "matches_found",
                "top_matches", "comparisons"):
        assert key in data, key
    for comp in data["comparisons"]:
        assert {"target", "match", "distance"} <= set(comp)


def test_camera_alerts_envelope(app):
    """App.jsx:119-144: status === 'success', alerts list, history dict,
    movement_log LIST of {target, camera_id, camera_name, timestamp}."""
    router, ctx = app
    _upload(router)
    # drive one scan so tracking has something
    ctx.run_scan(0.99, 1, 10)
    status, data, _ = call(router, "GET", "/camera/alerts")
    assert data["status"] == "success"
    assert isinstance(data["alerts"], list)
    assert isinstance(data["history"], dict)
    assert isinstance(data["movement_log"], list)
    for entry in data["movement_log"]:
        assert {"target", "camera_id", "camera_name", "timestamp"} <= set(entry)
    # alerts grouped one-per-target (reference camera.py:358-362)
    targets = [a.get("target") for a in data["alerts"]]
    assert len(targets) == len(set(targets))


def test_fl_upload_envelope(app):
    """App.jsx:291 keys off status === 'success'; reference
    federated.py:248-258."""
    router, _ = app
    status, data, _ = call(router, "POST", "/face/fl/upload_weights",
                           json_body={"target": "client_1",
                                      "weights": {"layer1": [0.1, 0.2], "layer2": [0.3, 0.4]}})
    assert data["status"] == "success"
    for key in ("message", "client_id", "round", "layers", "total_parameters",
                "contribution_count", "global_model_version", "timestamp"):
        assert key in data, key


def test_fl_get_weights_envelope(app):
    """App.jsx:304-318 via api.js:218 (?target=): reads data.weights."""
    router, _ = app
    call(router, "POST", "/face/fl/upload_weights",
         json_body={"target": "client_1", "weights": {"layer1": [0.1, 0.2]}})
    status, data, _ = call(router, "GET", "/face/fl/get_weights",
                           query={"target": "client_1"})
    assert data["status"] == "success"
    assert data["weights"] == {"layer1": [0.1, 0.2]}
    # missing client is success-with-hint, not 404 (federated.py:335-344)
    status, data, _ = call(router, "GET", "/face/fl/get_weights",
                           query={"target": "nobody"})
    assert status == 200 and data["status"] == "success" and data["weights"] == {}


def test_fl_aggregate_envelope(app):
    """App.jsx:320-357: status, new_model_version (additive), model_version;
    reference federated.py:672-690 global_model/aggregation_details."""
    router, _ = app
    for c in ("a", "b"):
        call(router, "POST", "/face/fl/upload_weights",
             json_body={"target": c, "weights": {"layer1": [1.0, 2.0]}})
    status, data, _ = call(router, "POST", "/face/fl/aggregate", json_body={})
    assert data["status"] == "success"
    assert data["message"] == "Model aggregation completed successfully"
    assert data["new_model_version"] == data["global_model"]["version"] == 1
    assert data["global_model"]["layers"] == ["layer1"]
    assert data["global_model"]["total_parameters"] == 2
    det = data["aggregation_details"]
    assert det["clients_aggregated"] == 2 and set(det["client_ids"]) == {"a", "b"}
    assert det["weights_strategy"] == "equal"


def test_async_job_envelope(app):
    """FaceUpload.jsx:193 reads payload.job_id; pollJob (api.js:292-313)
    loops on data.status until finished/failed."""
    router, _ = app
    body, ctype = _multipart({}, {"file": ("q.jpg", _jpeg_bytes(), "image/jpeg")})
    status, data, _ = call(router, "POST", "/async/face/search", body=body,
                           headers={"content-type": ctype})
    assert status == 202 and data["job_id"]
    import time
    deadline = time.time() + 10
    while time.time() < deadline:
        status, job, _ = call(router, "GET", f"/async/jobs/{data['job_id']}")
        if job["status"] in ("finished", "failed"):
            break
        time.sleep(0.1)
    assert job["status"] == "finished"
    assert "result" in job


def test_snapshot_headers(app):
    """CameraGrid.jsx:137-148 reads X-Placeholder and X-Enhance-Requested."""
    router, ctx = app
    # live camera -> 200 with enhance hint when requested
    status, _, resp = call(router, "GET", "/api/camera/0/snapshot",
                           query={"enhance": "true"})
    assert status == 200
    assert resp.headers.get("X-Enhance-Requested") == "1"
    # unknown camera -> 404 placeholder with the header
    status, _, resp = call(router, "GET", "/api/camera/99/snapshot")
    assert status == 404
    assert resp.headers.get("X-Placeholder") == "1"


def test_blanket_status_success_envelope(app):
    """The reference stamps status:'success' on every 2xx JSON body (grep
    JSONResponse in its routes). Spot-check across subsystems."""
    router, ctx = app
    _upload(router)
    for method, path in [
        ("GET", "/camera/list"), ("GET", "/camera/stats"),
        ("GET", "/camera/movement/alice"), ("GET", "/camera/analyze/alice"),
        ("GET", "/alerts/"), ("GET", "/alerts/latest"),
        ("GET", "/alerts/watchlist"), ("GET", "/alerts/geofences"),
        ("GET", "/face/stats"), ("GET", "/face/search"),
        ("GET", "/deepfake/history"), ("GET", "/deepfake/stats"),
        ("GET", "/face/fl/stats"), ("GET", "/face/fl/global_model"),
    ]:
        status, data, _ = call(router, method, path)
        assert status == 200, path
        assert isinstance(data, dict) and "status" in data, path
    # count/cameras shape (reference camera.py:468)
    _, data, _ = call(router, "GET", "/camera/list")
    assert data["count"] == len(data["cameras"])
    # analysis shape (reference camera.py:436)
    _, data, _ = call(router, "GET", "/camera/analyze/alice")
    assert data["person"] == "alice" and "analysis" in data
