"""Exhaustive API-surface coverage: parse every @router.<method>("<path>")
decorator in the reference's route modules (plus its app-level endpoints) and
assert OUR Router resolves each (method, path). This mechanically locks the
SURVEY.md §2.1 endpoint tables — if the reference contract and this repo ever
drift (a rename, a missed endpoint), this fails with the exact route.

The reference tree is only present on the build machine; skip elsewhere.
"""

import os
import re

import pytest

from frp_tpu.api.main import build_app
from frp_tpu.config import load_config
from frp_tpu.platform.context import AppContext
from tests.fakes import FakeEngine

REF = "/root/reference/backend/app"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

# module -> URL prefix (reference main.py:90-98 + each APIRouter(prefix=...))
PREFIXES = {
    "camera.py": "/camera",
    "federated.py": "/face/fl",
    "deepfake.py": "/deepfake",
    "alerts.py": "/alerts",
    "face.py": "/face",
    "snapshot.py": "/api/camera",
    "async_tasks.py": "/async",
}

DECORATOR = re.compile(
    r'@router\.(get|post|put|patch|delete)\(\s*["\']([^"\']*)["\']'
)
APP_DECORATOR = re.compile(r'@api\.(get|post|put|patch|delete)\(\s*["\']([^"\']*)["\']')


def reference_endpoints():
    endpoints = []
    for fname, prefix in PREFIXES.items():
        with open(os.path.join(REF, "routes", fname)) as f:
            src = f.read()
        for m in DECORATOR.finditer(src):
            method, path = m.group(1).upper(), m.group(2)
            full = (prefix + path).rstrip("/") or "/"
            endpoints.append((method, full, fname))
    with open(os.path.join(REF, "main.py")) as f:
        src = f.read()
    for m in APP_DECORATOR.finditer(src):
        endpoints.append((m.group(1).upper(), m.group(2).rstrip("/") or "/", "main.py"))
    return sorted(set(endpoints))


@pytest.fixture(scope="module")
def router(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cov")
    cfg = load_config(data_dir=str(tmp / "data"), log_dir=str(tmp / "logs"))
    ctx = AppContext(cfg=cfg, engine=FakeEngine(), camera_configs=[
        {"id": 0, "name": "Cam A", "geo": (18.5, 73.8), "source": "synthetic:96x64"},
    ])
    r, sio, ctx = build_app(ctx)
    yield r
    ctx.shutdown()


def test_reference_endpoint_extraction_sane():
    eps = reference_endpoints()
    # SURVEY §2.1: camera 18, face 15, fl 17, deepfake 15, alerts 11,
    # snapshot 1, async 2, app-level 2 => ~81; guard the extractor
    assert len(eps) >= 75, f"extractor regressed: found only {len(eps)}"
    assert ("GET", "/camera/alerts", "camera.py") in eps
    assert ("POST", "/face/fl/aggregate", "federated.py") in eps


def test_every_reference_endpoint_resolves(router):
    missing = []
    for method, path, fname in reference_endpoints():
        # bind path params with plausible literals ({cam_id} etc. match [^/]+)
        concrete = re.sub(r"\{[^}]+\}", "0", path)
        try:
            handler, _ = router.resolve(method, concrete)
        except Exception as e:  # 405 -> wrong-method drift, count as missing
            handler = None
        if handler is None:
            missing.append(f"{method} {path} ({fname})")
    assert not missing, "reference endpoints without a matching route:\n" + "\n".join(missing)
