"""Frontend rebuild checks (frontend/ — SURVEY.md section 2.1 items 23-26).

No JS engine ships in this image, so correctness is enforced three ways:
1. static serving: every asset the page needs is served with the right MIME
   (ES modules require text/javascript) and path traversal is rejected;
2. module-graph integrity: every relative import in frontend/src resolves to
   a served file, and every named import exists as an export in its target;
3. contract linking: every endpoint the rebuilt api.js client calls (the
   reference contract, frontend/src/api.js:187-317) resolves in the live
   Router — client/server drift fails here, not in a user's browser.
"""

import os
import re

import pytest

from frp_tpu.api.main import build_app
from frp_tpu.api.routes.frontend import frontend_dir
from frp_tpu.config import load_config
from frp_tpu.platform.context import AppContext
from tests.fakes import FakeEngine
from tests.test_api import call


@pytest.fixture()
def app(tmp_path):
    cfg = load_config(data_dir=str(tmp_path / "data"), log_dir=str(tmp_path / "logs"))
    ctx = AppContext(cfg=cfg, engine=FakeEngine(), camera_configs=[
        {"id": 0, "name": "Cam A", "geo": (18.5, 73.8), "source": "synthetic:96x64"},
    ])
    router, sio, ctx = build_app(ctx)
    yield router, ctx
    ctx.shutdown()


SRC = os.path.join(frontend_dir(), "src")
MODULES = ["main.js", "api.js", "sio.js", "dom.js", "app.js", "face_upload.js", "camera_grid.js"]


def read_module(name: str) -> str:
    with open(os.path.join(SRC, name)) as f:
        return f.read()


# ---------------------------------------------------------------------------
# 1. static serving
# ---------------------------------------------------------------------------

def test_index_served_with_assets(app):
    router, _ = app
    status, body, resp = call(router, "GET", "/app")
    assert status == 200 and resp.content_type.startswith("text/html")
    html = body.decode()
    assert '/app/src/main.js' in html and '/app/app.css' in html
    assert 'type="module"' in html

    status, _, resp = call(router, "GET", "/app/app.css")
    assert status == 200 and resp.content_type.startswith("text/css")

    for name in MODULES:
        status, body, resp = call(router, "GET", f"/app/src/{name}")
        assert status == 200, name
        # ES modules are refused by browsers without a JS MIME type
        assert resp.content_type.startswith("text/javascript"), name


def test_path_traversal_rejected(app):
    router, _ = app
    for path in ["/app/src/..", "/app/..", "/app/src/..%2f..%2fCLAUDE.md"]:
        handler, params = router.resolve("GET", path)
        if handler is None:
            continue
        status, _, _ = call(router, "GET", path)
        assert status == 404, path


# ---------------------------------------------------------------------------
# 2. module graph
# ---------------------------------------------------------------------------

def test_every_import_resolves_and_names_exist():
    import_re = re.compile(
        r'import\s+(?:\{([^}]*)\}|(\w+))?\s*(?:,\s*\{([^}]*)\})?\s*from\s+"\./([\w.]+)"'
    )
    export_re = re.compile(
        r"export\s+(?:const|let|function|class|async function)\s+(\w+)"
        r"|export\s+\{([^}]*)\}"
        r"|export\s+default\s+(\w+)?"
    )
    for mod in MODULES:
        src = read_module(mod)
        for m in import_re.finditer(src):
            named = (m.group(1) or "") + "," + (m.group(3) or "")
            default = m.group(2)
            target = m.group(4)
            target_path = os.path.join(SRC, target)
            assert os.path.isfile(target_path), f"{mod} imports missing module {target}"
            tsrc = read_module(target)
            exported = set()
            has_default = "export default" in tsrc
            for em in export_re.finditer(tsrc):
                if em.group(1):
                    exported.add(em.group(1))
                if em.group(2):
                    for piece in em.group(2).split(","):
                        piece = piece.strip()
                        if " as " in piece:
                            piece = piece.split(" as ")[1].strip()
                        if piece:
                            exported.add(piece)
            for name in named.split(","):
                name = name.strip()
                if not name:
                    continue
                if " as " in name:
                    name = name.split(" as ")[0].strip()
                assert name in exported, f"{mod}: '{name}' not exported by {target}"
            if default:
                assert has_default, f"{mod}: {target} has no default export"


def test_reference_client_surface_present():
    """The rebuilt api.js keeps the reference's export surface
    (reference frontend/src/api.js:187-320)."""
    src = read_module("api.js")
    for name in [
        "safeRequest", "createSocket", "socket", "getStatus", "getCameraStatus",
        "uploadFace", "compareFaces", "listFaces", "deleteFace", "getCameraAlerts",
        "getCameraFeed", "getTrackingStats", "getPersonMovement", "analyzePatterns",
        "getFederatedStatus", "getFLWeights", "uploadFLWeights", "aggregateWeights",
        "detectDeepfakeImage", "detectDeepfakeCCTV", "getAlerts", "getLatestAlert",
        "getWatchlist", "addToWatchlist", "removeFromWatchlist", "getGeofences",
        "createGeofence", "getAlertStats", "configureEmail", "configureSms",
        "uploadWithProgress", "fetchCameraSnapshot", "enqueueAsyncFaceSearch",
        "pollJob", "getAggregatedModel",
    ]:
        assert re.search(rf"export (?:const|function|async function|\{{[^}}]*\b{name}\b)", src) or \
            re.search(rf"export\s+\{{[^}}]*\b{name}\b", src), f"api.js missing export {name}"


# ---------------------------------------------------------------------------
# 3. contract linking: every client URL resolves in the Router
# ---------------------------------------------------------------------------

def client_endpoints():
    """Extract (method, path) pairs from the rebuilt api.js source."""
    src = read_module("api.js")
    pairs = set()
    helper_method = {"get": "GET", "del": "DELETE", "postJson": "POST", "postForm": "POST"}
    for m in re.finditer(r'\b(get|del|postJson|postForm)\((?:"([^"]+)"|`([^`]+)`)', src):
        url = m.group(2) or m.group(3)
        pairs.add((helper_method[m.group(1)], url))
    for m in re.finditer(r'doFetch\("(\w+)",\s*(?:"([^"]+)"|`([^`]+)`)', src):
        pairs.add((m.group(1), m.group(2) or m.group(3)))
    # uploadWithProgress callers pass literal URLs
    for m in re.finditer(r'uploadWithProgress\("([^"]+)"', src):
        pairs.add(("POST", m.group(1)))
    for other in ["app.js", "face_upload.js", "camera_grid.js"]:
        osrc = read_module(other)
        for m in re.finditer(r'uploadWithProgress\("([^"]+)"', osrc):
            pairs.add(("POST", m.group(1)))
    return sorted(pairs)


def test_client_endpoints_resolve_in_router(app):
    router, _ = app
    endpoints = client_endpoints()
    assert len(endpoints) >= 28, f"extraction regressed: {endpoints}"
    for method, raw in endpoints:
        # normalize JS template params `${encodeURIComponent(x)}` -> literal
        path = re.sub(r"\$\{[^}]*\}", "testvalue", raw)
        path = path.split("?")[0]
        if not path:
            path = "/"
        handler, _params = router.resolve(method, path)
        assert handler is not None, f"client calls {method} {raw} but no route matches {path}"


def test_snapshot_alias_route_resolves(app):
    """fetchCameraSnapshot hits /api/camera/{id}/snapshot (reference
    api.js:275-279 + CameraGrid.jsx:130)."""
    router, _ = app
    handler, _ = router.resolve("GET", "/api/camera/0/snapshot")
    assert handler is not None
