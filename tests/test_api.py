"""API contract tests: route behavior against SURVEY.md section 2.1, driven
through the real Router (direct handler dispatch) plus one live-socket test
covering HTTP parsing, multipart, streaming, and the Socket.IO handshake."""

import asyncio
import json

import numpy as np
import pytest

from frp_tpu.api.http import HTTPError, Request, Response, StreamResponse
from frp_tpu.api.main import build_app
from frp_tpu.config import load_config
from frp_tpu.platform.context import AppContext
from tests.fakes import FakeEngine


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

@pytest.fixture()
def app(tmp_path):
    cfg = load_config(
        data_dir=str(tmp_path / "data"),
        log_dir=str(tmp_path / "logs"),
        min_face_quality=0.0,  # FakeEngine quality factors are synthetic
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


def _multipart(fields: dict, files: dict) -> tuple[bytes, str]:
    boundary = "testboundary123"
    parts = []
    for k, v in fields.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"\r\n\r\n{v}\r\n'.encode()
        )
    for k, (fname, data, ctype) in files.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"; '
            f'filename="{fname}"\r\nContent-Type: {ctype}\r\n\r\n'.encode()
            + data
            + b"\r\n"
        )
    parts.append(f"--{boundary}--\r\n".encode())
    return b"".join(parts), f"multipart/form-data; boundary={boundary}"


def call(router, method, path, query=None, json_body=None, body=b"", headers=None):
    headers = dict(headers or {})
    if json_body is not None:
        body = json.dumps(json_body).encode()
        headers["content-type"] = "application/json"
    handler, params = router.resolve(method, path)
    assert handler is not None, f"no route for {method} {path}"
    req = Request(method, path, query or {}, headers, body, params)

    async def run():
        return await handler(req)

    resp = asyncio.run(run())
    if isinstance(resp, StreamResponse):
        async def drain():
            chunks = []
            async for c in resp.gen:
                chunks.append(c)
                if len(chunks) > 20:
                    break
            return b"".join(chunks)

        return resp.status, asyncio.run(drain()), resp
    data = json.loads(resp.body) if resp.content_type == "application/json" and resp.body else resp.body
    return resp.status, data, resp


def _jpeg_bytes(value=128) -> bytes:
    import cv2

    img = np.full((64, 64, 3), value, np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    return buf.tobytes()


# ---------------------------------------------------------------------------
# root + camera routes
# ---------------------------------------------------------------------------

def test_root_and_status(app):
    router, ctx = app
    status, data, _ = call(router, "GET", "/")
    assert status == 200 and data["status"] == "running"
    status, data, _ = call(router, "GET", "/camera/status")
    assert data["total"] == 2 and set(data["cameras"]) == {"0", "1"}


def test_camera_crud(app):
    router, ctx = app
    status, data, _ = call(router, "POST", "/camera/add",
                           json_body={"id": 7, "name": "New", "source": "synthetic:32x32"})
    assert status == 201
    status, data, _ = call(router, "GET", "/camera/7/info")
    assert data["name"] == "New"
    status, data, _ = call(router, "PATCH", "/camera/7", json_body={"name": "Renamed"})
    assert data["camera"]["name"] == "Renamed"
    # duplicate id -> 409
    with pytest.raises(HTTPError) as e:
        call(router, "POST", "/camera/add", json_body={"id": 7})
    assert e.value.status == 409
    status, data, _ = call(router, "DELETE", "/camera/7")
    assert data["deleted"] == 7
    with pytest.raises(HTTPError) as e:
        call(router, "GET", "/camera/7/info")
    assert e.value.status == 404


def test_camera_snapshot_and_feed(app):
    router, ctx = app
    status, body, resp = call(router, "GET", "/camera/0/snapshot")
    assert status == 200 and resp.content_type == "image/jpeg" and len(body) > 100
    # cached on second call
    status, _, resp = call(router, "GET", "/camera/0/snapshot")
    assert resp.headers.get("X-Cache") == "hit"
    # MJPEG stream yields multipart chunks
    status, body, resp = call(router, "GET", "/camera/0/feed", query={"fps": "30"})
    assert b"--frame" in body and b"image/jpeg" in body


def test_camera_scan_generates_alerts_and_tracking(app):
    router, ctx = app
    # enroll a synthetic identity whose embedding matches camera frames:
    # FakeEngine embeds by image content, so enroll from an actual camera frame
    cam = ctx.cameras.get(0)
    ok, frame = cam.read()
    from frp_tpu.engine.batching import build_batch

    batch, meta = build_batch({0: frame}, ctx.cfg.det_size)
    emb = ctx.engine.encode_image(batch[0])[0]["embedding"]
    # NB: synthetic source changes every frame, so enroll the NEXT frame's
    # content is different — instead match everything with a huge tolerance
    ctx.face_service.store_face("anyone", emb)
    status, data, _ = call(router, "GET", "/camera/alerts", query={"threshold": "100"})
    assert status == 200
    assert data["metadata"]["cameras_scanned"] == 2
    assert len(data["detections"]) >= 1
    assert ctx.tracking.stats["total_detections"] >= 1
    assert data["alerts"]


def test_camera_performance_and_test_endpoint(app):
    router, ctx = app
    call(router, "GET", "/camera/alerts", query={"threshold": "0.1"})
    status, data, _ = call(router, "GET", "/camera/performance")
    assert "per_camera" in data
    status, data, _ = call(router, "POST", "/camera/test",
                           json_body={"source": "synthetic:16x16"})
    assert data["success"] and data["frame_shape"] == [16, 16, 3]


def test_camera_health_probe(app):
    router, ctx = app
    status, data, _ = call(router, "GET", "/camera/health")
    assert data["cameras_total"] == 2 and data["cameras_healthy"] == 2


# ---------------------------------------------------------------------------
# face routes
# ---------------------------------------------------------------------------

def _upload(router, target, value=128, **fields):
    body, ctype = _multipart(
        {"target": target, **fields},
        {"file": (f"{target}.jpg", _jpeg_bytes(value), "image/jpeg")},
    )
    return call(router, "POST", "/face/upload", body=body,
                headers={"content-type": ctype})


def test_face_upload_and_lifecycle(app):
    router, ctx = app
    status, data, _ = _upload(router, "alice")
    # reference face.py:292 returns 200 on success
    assert status == 200 and data["success"] and data["target"] == "alice"
    # duplicate without override -> 409
    with pytest.raises(HTTPError) as e:
        _upload(router, "alice", value=129)
    assert e.value.status == 409
    # override works
    status, data, _ = _upload(router, "alice", value=130, override="true")
    assert data["success"]
    # list / detail / search
    status, data, _ = call(router, "GET", "/face/list")
    assert data["count"] == 1 and data["faces"][0]["target"] == "alice"
    status, data, _ = call(router, "GET", "/face/detail/alice")
    assert data["target"] == "alice"
    status, data, _ = call(router, "GET", "/face/search", query={"q": "ali"})
    assert data["matches"] == ["alice"]
    # rename
    status, data, _ = call(router, "PATCH", "/face/update/alice",
                           json_body={"new_name": "alicia"})
    assert data["new"] == "alicia"
    # delete
    status, data, _ = call(router, "DELETE", "/face/delete/alicia")
    assert data["success"]
    with pytest.raises(HTTPError) as e:
        call(router, "DELETE", "/face/delete/alicia")
    assert e.value.status == 404


def test_face_upload_rejects_black_image_no_face(app):
    router, ctx = app
    body, ctype = _multipart(
        {"target": "ghost"}, {"file": ("g.jpg", _jpeg_bytes(0), "image/jpeg")}
    )
    with pytest.raises(HTTPError) as e:
        call(router, "POST", "/face/upload", body=body, headers={"content-type": ctype})
    assert e.value.status == 400 and "no face" in e.value.detail


def test_face_compare_and_validate(app):
    router, ctx = app
    _upload(router, "bob", value=90)
    body, ctype = _multipart(
        {"tolerance": "2.0"}, {"file": ("q.jpg", _jpeg_bytes(90), "image/jpeg")}
    )
    status, data, _ = call(router, "POST", "/face/compare", body=body,
                           headers={"content-type": ctype})
    assert data["success"]
    assert data["results"][0]["best_match"]["target"] == "bob"
    body, ctype = _multipart({}, {"file": ("q.jpg", _jpeg_bytes(90), "image/jpeg")})
    status, data, _ = call(router, "POST", "/face/validate", body=body,
                           headers={"content-type": ctype})
    assert data["face_count"] == 1


def test_face_export_csv_and_clear(app):
    router, ctx = app
    _upload(router, "carol")
    status, body, _ = call(router, "GET", "/face/export", query={"format": "csv"})
    assert body.startswith(b"target,") and b"carol" in body
    with pytest.raises(HTTPError):
        call(router, "DELETE", "/face/clear")  # missing confirm
    status, data, _ = call(router, "DELETE", "/face/clear",
                           query={"confirm": "CONFIRM_DELETE_ALL"})
    assert data["deleted"] == 1


def test_face_bulk_delete_cap(app):
    router, ctx = app
    with pytest.raises(HTTPError) as e:
        call(router, "POST", "/face/delete/bulk",
             json_body={"targets": [f"t{i}" for i in range(51)]})
    assert e.value.status == 422


# ---------------------------------------------------------------------------
# federated routes
# ---------------------------------------------------------------------------

def test_fl_roundtrip(app):
    router, ctx = app
    for cid, val in (("c1", [1.0, 2.0]), ("c2", [3.0, 4.0])):
        status, data, _ = call(router, "POST", "/face/fl/upload_weights",
                               json_body={"client_id": cid, "weights": {"w": val}})
        assert data["success"]
    status, data, _ = call(router, "POST", "/face/fl/aggregate", json_body={})
    assert data["success"] and data["version"] == 1
    status, data, _ = call(router, "GET", "/face/fl/global_model")
    assert data["weights"]["w"] == [2.0, 3.0]
    status, data, _ = call(router, "GET", "/face/fl/status")
    assert data["version"] == 1
    status, data, _ = call(router, "GET", "/face/fl/history")
    assert len(data["history"]) == 1
    # NaN rejected with 400
    with pytest.raises(HTTPError) as e:
        call(router, "POST", "/face/fl/upload_weights",
             json_body={"client_id": "bad", "weights": {"w": [None]}})
    assert e.value.status == 400
    # reset requires confirm
    with pytest.raises(HTTPError):
        call(router, "POST", "/face/fl/reset", json_body={})
    status, data, _ = call(router, "POST", "/face/fl/reset",
                           json_body={"confirm": "CONFIRM_RESET"})
    assert data["success"]


def test_fl_validate_and_rounds(app):
    router, ctx = app
    status, data, _ = call(router, "POST", "/face/fl/validate",
                           json_body={"weights": {"w": [1.0]}})
    assert data["valid"]
    status, data, _ = call(router, "POST", "/face/fl/round/start")
    assert data["status"] == "collecting"
    status, data, _ = call(router, "GET", "/face/fl/round/status")
    assert data["round"] >= 1


# ---------------------------------------------------------------------------
# alerts routes
# ---------------------------------------------------------------------------

def test_alerts_routes(app):
    router, ctx = app
    call(router, "POST", "/alerts/watchlist", json_body={"target": "wanted"})
    status, data, _ = call(router, "GET", "/alerts/watchlist")
    assert data["watchlist"] == ["wanted"]
    call(router, "POST", "/alerts/geofences",
         json_body={"name": "zone1", "cameras": [0]})
    ctx.alerts.generate_alert("wanted", 0, 0.3)
    status, data, _ = call(router, "GET", "/alerts/", query={"priority": "critical"})
    assert data["total"] == 1
    alert_id = data["alerts"][0]["alert_id"]
    status, data, _ = call(router, "POST", "/alerts/acknowledge",
                           json_body={"alert_id": alert_id, "acknowledged_by": "op"})
    assert data["success"]
    status, data, _ = call(router, "GET", "/alerts/latest")
    assert data["alert"]["acknowledged"]
    status, body, _ = call(router, "GET", "/alerts/export", query={"format": "csv"})
    assert b"wanted" in body
    status, data, _ = call(router, "DELETE", "/alerts/watchlist/wanted")
    assert data["success"]
    status, data, _ = call(router, "POST", "/alerts/config/email",
                           json_body={"enabled": False})
    assert data["success"]


# ---------------------------------------------------------------------------
# deepfake + async routes
# ---------------------------------------------------------------------------

def test_deepfake_info_endpoints(app):
    router, ctx = app
    status, data, _ = call(router, "GET", "/deepfake/model/info")
    assert data["fake_index"] == 1 and data["weights_loaded"] is False
    status, data, _ = call(router, "GET", "/deepfake/config")
    assert data["max_frames"] == 20
    status, data, _ = call(router, "GET", "/deepfake/stats")
    assert data["total_videos"] == 0
    status, data, _ = call(router, "GET", "/deepfake/health")
    assert data["status"] == "healthy"


def test_deepfake_detect_image(app):
    router, ctx = app
    body, ctype = _multipart({}, {"file": ("f.jpg", _jpeg_bytes(77), "image/jpeg")})
    status, data, _ = call(router, "POST", "/deepfake/detect-image", body=body,
                           headers={"content-type": ctype})
    assert data["result"] in ("real", "fake") and data["faces"] == 1


def test_async_search_route(app):
    router, ctx = app
    _upload(router, "dave", value=60)
    body, ctype = _multipart(
        {"tolerance": "2.0"}, {"file": ("q.jpg", _jpeg_bytes(60), "image/jpeg")}
    )
    status, data, _ = call(router, "POST", "/async/face/search", body=body,
                           headers={"content-type": ctype})
    assert status == 202
    job_id = data["job_id"]
    import time

    deadline = time.time() + 10
    while time.time() < deadline:
        status, job, _ = call(router, "GET", f"/async/jobs/{job_id}")
        if job["status"] in ("finished", "failed"):
            break
        time.sleep(0.05)
    assert job["status"] == "finished"
    assert job["result"]["results"][0]["best_match"]["target"] == "dave"


def test_snapshot_route_placeholder_and_etag(app):
    router, ctx = app
    status, data, resp = call(router, "GET", "/api/camera/0/snapshot")
    assert status == 200 and resp.content_type == "image/jpeg"
    etag = resp.headers["ETag"]
    status, _, resp = call(router, "GET", "/api/camera/0/snapshot",
                           headers={"if-none-match": etag})
    assert status == 304
    status, body, resp = call(router, "GET", "/api/camera/99/snapshot")
    assert status == 404 and resp.content_type == "image/svg+xml"


def test_router_errors(app):
    router, ctx = app
    handler, _ = router.resolve("GET", "/does/not/exist")
    assert handler is None
    with pytest.raises(HTTPError) as e:
        router.resolve("DELETE", "/face/list")
    assert e.value.status == 405


def test_camera_ingest_push_flow(app):
    """The reference's mock_camera_worker posts to /api/camera/ingest which
    never existed there (SURVEY.md defect); here the full push flow works."""
    router, ctx = app
    body, ctype = _multipart(
        {"camera_id": "9"}, {"file": ("f.jpg", _jpeg_bytes(140), "image/jpeg")}
    )
    status, data, _ = call(router, "POST", "/api/camera/ingest", body=body,
                           headers={"content-type": ctype})
    assert data["success"] and data["frames_pushed"] == 1
    cam = ctx.cameras.get(9)
    ok, frame = cam.read()
    assert ok and frame.shape == (64, 64, 3)
    # snapshot now serves the pushed frame
    status, jpeg, resp = call(router, "GET", "/camera/9/snapshot")
    assert status == 200 and resp.content_type == "image/jpeg"
    # pushing to a non-push camera is rejected
    body, ctype = _multipart(
        {"camera_id": "0"}, {"file": ("f.jpg", _jpeg_bytes(140), "image/jpeg")}
    )
    with pytest.raises(HTTPError) as e:
        call(router, "POST", "/api/camera/ingest", body=body,
             headers={"content-type": ctype})
    assert e.value.status == 409


def test_schemas_validation():
    from frp_tpu.platform.schemas import (
        AlertLogModel,
        DeepfakeLogModel,
        FaceModel,
        TrackingRecordModel,
    )

    rec = TrackingRecordModel(
        person="alice", camera_id=0, geo=(18.5, 73.8), distance=0.4,
        confidence="medium", timestamp="2026-08-16T12:00:00",
    )
    assert rec.speed_kmh == 0.0
    with pytest.raises(ValueError):
        TrackingRecordModel(
            person="x", camera_id=0, geo=(200.0, 0.0), distance=0.1,
            confidence="high", timestamp="2026-08-16T12:00:00",
        )
    with pytest.raises(ValueError):
        DeepfakeLogModel(
            result="fake", confidence="high", timestamp="t",
            boxes=[[1, 2, 3]],  # bbox needs 4 coords
        )
    f = FaceModel(target="bob", embedding="token", quality_score=88.0)
    assert f.target == "bob"
    a = AlertLogModel(target="bob", camera_id=1, distance=0.3,
                      priority="high", timestamp="t")
    assert a.geo == "(0.0, 0.0)"


def test_debug_routes(app):
    router, ctx = app
    status, data, _ = call(router, "GET", "/debug/timers")
    assert "stages" in data
    status, data, _ = call(router, "GET", "/debug/memory")
    assert "rss_mb" in data
    with ctx.timers.track("unit"):
        pass
    status, data, _ = call(router, "GET", "/debug/timers")
    assert data["stages"]["unit"]["calls"] == 1
    # delta-transfer health counters (VERDICT r3 #6: a production operator
    # must be able to see encoder/engine desync)
    status, data, _ = call(router, "GET", "/debug/delta")
    assert status == 200
    for key in ("keyframes", "deltas", "desyncs"):
        assert key in data, data


def test_dashboard_served(app):
    router, ctx = app
    status, body, resp = call(router, "GET", "/dashboard")
    assert status == 200 and resp.content_type.startswith("text/html")
    assert b"face-recognition-platform" in body and b"new_alert" in body


def test_audit_sink_cleared_by_rebuilt_context(tmp_path):
    """A context built WITHOUT audit_to_db must clear any DB audit sink a
    previous context installed — audit records must not keep flowing into
    the stale store (review fix: else-branch set_audit_sink(None))."""
    from frp_tpu.utils.logger import audit_event

    cfg1 = load_config(data_dir=str(tmp_path / "d1"),
                       log_dir=str(tmp_path / "l1"), audit_to_db=True)
    ctx1 = AppContext(cfg=cfg1, engine=FakeEngine(), camera_configs=[])
    audit_event("probe_one", {}, log_dir=cfg1.log_dir)
    n1 = ctx1.db["audit"].count_documents({})
    assert n1 >= 1  # sink live: record landed in ctx1's store
    ctx1.shutdown()

    cfg2 = load_config(data_dir=str(tmp_path / "d2"),
                       log_dir=str(tmp_path / "l2"), audit_to_db=False)
    ctx2 = AppContext(cfg=cfg2, engine=FakeEngine(), camera_configs=[])
    audit_event("probe_two", {}, log_dir=cfg2.log_dir)
    assert ctx1.db["audit"].count_documents({}) == n1  # stale sink is gone
    ctx2.shutdown()
