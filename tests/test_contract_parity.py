"""Reference-contract parity tests for the route drift found by the round-1
advisor: the exact paths/params the reference backend and its frontend use
(reference federated.py:352, alerts.py:169, camera.py:684/749/785,
deepfake.py:535/758/795; frontend api.js:218-259) must work unchanged."""

import pytest

from frp_tpu.api.http import HTTPError, Router
from tests.test_api import app, call  # noqa: F401  (fixture + helper reuse)


# ---------------------------------------------------------------------------
# router semantics
# ---------------------------------------------------------------------------

def test_router_prefers_literal_over_param():
    r = Router()

    async def by_id(req):
        return "by_id"

    async def bulk(req):
        return "bulk"

    # param route registered FIRST must not shadow the literal one
    r.post("/camera/{cam_id}/restart")(by_id)
    r.post("/camera/bulk/restart")(bulk)
    handler, params = r.resolve("POST", "/camera/bulk/restart")
    assert handler is bulk and params == {}
    handler, params = r.resolve("POST", "/camera/7/restart")
    assert handler is by_id and params == {"cam_id": "7"}


# ---------------------------------------------------------------------------
# federated: reference param names and paths (api.js:218-227)
# ---------------------------------------------------------------------------

def test_fl_upload_accepts_target_field(app):
    router, ctx = app
    status, data, _ = call(router, "POST", "/face/fl/upload_weights",
                           json_body={"target": "edge1", "weights": {"w": [1.0, 2.0]}})
    assert data["success"] and data["client_id"] == "edge1"


def test_fl_get_weights_target_param(app):
    router, ctx = app
    call(router, "POST", "/face/fl/upload_weights",
         json_body={"target": "edge1", "weights": {"w": [1.0, 2.0]}})
    status, data, _ = call(router, "GET", "/face/fl/get_weights",
                           query={"target": "edge1"})
    # reference shape: status/client_id/weights/layers/client_info/metrics
    assert data["status"] == "success"
    assert data["client_id"] == "edge1"
    assert data["weights"]["w"] == [1.0, 2.0]
    assert data["layers"] == ["w"]
    assert data["client_info"]["contribution_count"] == 1
    # missing client is success-with-hint, not 404 (federated.py:336-346)
    status, data, _ = call(router, "GET", "/face/fl/get_weights",
                           query={"target": "ghost"})
    assert data["weights"] == {} and "suggestion" in data
    # no target at all -> 422
    with pytest.raises(HTTPError) as e:
        call(router, "GET", "/face/fl/get_weights")
    assert e.value.status == 422


def test_fl_status_per_client(app):
    router, ctx = app
    call(router, "POST", "/face/fl/upload_weights",
         json_body={"target": "edge2", "weights": {"b": [5.0]}})
    status, data, _ = call(router, "GET", "/face/fl/status",
                           query={"client_id": "edge2"})
    assert data["client_id"] == "edge2" and data["weights"]["b"] == [5.0]
    # the no-param system summary remains available
    status, data, _ = call(router, "GET", "/face/fl/status")
    assert "round" in data and "registered_clients" in data


def test_fl_reference_alias_paths(app):
    router, ctx = app
    status, data, _ = call(router, "POST", "/face/fl/register",
                           json_body={"client_id": "r1", "client_name": "Edge R1"})
    assert data["success"]
    status, data, _ = call(router, "GET", "/face/fl/list")
    assert any(c["client_id"] == "r1" for c in data["clients"])
    call(router, "POST", "/face/fl/upload_weights",
         json_body={"target": "r1", "weights": {"w": [1.0]}})
    call(router, "POST", "/face/fl/upload_weights",
         json_body={"target": "r2", "weights": {"w": [3.0]}})
    status, data, _ = call(router, "POST", "/face/fl/aggregate", json_body={})
    assert data["success"]
    status, data, _ = call(router, "GET", "/face/fl/aggregation/history")
    assert len(data["history"]) == 1
    status, data, _ = call(router, "GET", "/face/fl/client/r1/metrics")
    assert data["uploads"] == 1
    status, data, _ = call(router, "DELETE", "/face/fl/unregister/r1")
    assert data["success"]


def test_fl_aggregate_reference_config_fields(app):
    router, ctx = app
    for cid, v in (("a", [0.0]), ("b", [4.0])):
        call(router, "POST", "/face/fl/upload_weights",
             json_body={"target": cid, "weights": {"w": v}})
    # reference AggregationConfig: client_selection + weights_strategy
    status, data, _ = call(router, "POST", "/face/fl/aggregate",
                           json_body={"client_selection": ["a", "b"],
                                      "weights_strategy": "equal"})
    assert data["success"]
    status, data, _ = call(router, "GET", "/face/fl/global_model")
    assert data["weights"]["w"] == [2.0]


# ---------------------------------------------------------------------------
# alerts: POST /alerts/watchlist/{target} (alerts.py:169, api.js:249)
# ---------------------------------------------------------------------------

def test_watchlist_add_path_param(app):
    router, ctx = app
    status, data, _ = call(router, "POST", "/alerts/watchlist/wanted-person")
    assert data["success"]
    status, data, _ = call(router, "GET", "/alerts/watchlist")
    assert "wanted-person" in data["watchlist"]
    status, data, _ = call(router, "DELETE", "/alerts/watchlist/wanted-person")
    assert data["success"]


# ---------------------------------------------------------------------------
# camera: reference paths (camera.py:684, :749, :785)
# ---------------------------------------------------------------------------

def test_camera_reference_alias_paths(app):
    router, ctx = app
    status, data, _ = call(router, "GET", "/camera/performance/all")
    assert "per_camera" in data and "engine" in data
    status, data, _ = call(router, "POST", "/camera/bulk/restart")
    assert data["success"] and set(data["results"]) == {"0", "1"}
    status, data, _ = call(router, "DELETE", "/camera/performance/clear")
    assert data["success"]


# ---------------------------------------------------------------------------
# deepfake: DELETE /history, DELETE /cache, POST /stats/reset
# (deepfake.py:535, :758, :795)
# ---------------------------------------------------------------------------

def test_deepfake_reference_maintenance_paths(app):
    router, ctx = app
    ctx.deepfake.history.append({"result": "real"})
    ctx.deepfake.stats["total_videos"] = 3
    status, data, _ = call(router, "DELETE", "/deepfake/history")
    assert data["cleared"] == 1 and not ctx.deepfake.history
    status, data, _ = call(router, "POST", "/deepfake/stats/reset")
    assert data["stats"]["total_videos"] == 0
    status, data, _ = call(router, "DELETE", "/deepfake/cache")
    assert "cleared" in data


# ---------------------------------------------------------------------------
# schema wiring: pydantic models gate the store boundary (VERDICT weak #5)
# ---------------------------------------------------------------------------

def test_tracking_store_rejects_malformed_record(app):
    router, ctx = app
    from frp_tpu.platform.dbops import make_save_detection

    save = make_save_detection(ctx.db)
    before = len(list(ctx.db["tracking"].find({})))
    save({"person": "x", "camera_id": -3, "distance": 0.2,
          "confidence": "high", "timestamp": "2026-01-01T00:00:00"})  # bad id
    save({"person": "x", "camera_id": 0, "geo": (999.0, 0.0), "distance": 0.2,
          "confidence": "high", "timestamp": "t"})  # geo out of range
    save({"person": "x", "camera_id": 0, "distance": 0.2,
          "confidence": "certain", "timestamp": "t"})  # bad enum
    assert len(list(ctx.db["tracking"].find({}))) == before
    save({"person": "x", "camera_id": 0, "geo": (18.5, 73.8), "distance": 0.2,
          "confidence": "high", "timestamp": "2026-01-01T00:00:00"})
    assert len(list(ctx.db["tracking"].find({}))) == before + 1


def test_alert_log_document_is_schema_shaped(app):
    router, ctx = app
    ctx.alerts.generate_alert("schema-check", 0, 0.35)
    docs = list(ctx.db["logs"].find({"target": "schema-check"}))
    assert docs, "alert was not logged"
    doc = docs[-1]
    assert doc["priority"] in ("critical", "high", "medium", "low")
    assert isinstance(doc["geo"], str)  # legacy geo-as-string (person.py:159)
    assert doc["distance"] == 0.35


def test_face_store_document_is_schema_shaped(app):
    router, ctx = app
    from tests.test_api import _upload

    _upload(router, "schema_face", value=90)
    doc = ctx.db["faces"].find_one({"target": "schema_face"})
    assert doc is not None and isinstance(doc["embedding"], str)
    assert "updated_at" in doc
