"""Env-var contract coverage, parsed from the REFERENCE SOURCE (the same
mechanical-lock approach as tests/test_endpoint_coverage.py): every env key
the reference backend actually reads via os.getenv must be honored by our
config — mapped in frp_tpu.config._ENV_MAP (as a primary name or an alias)
or listed in config.ENV_EXEMPT with a reason. A reference deployment's
.env must keep working after switching to this framework
(SURVEY.md §5 "Config / flag system": keep env-compat names)."""

import os
import re

import pytest

from frp_tpu import config as cfg_mod
from frp_tpu.config import Config, load_config

REF = "/root/reference/backend"


def _reference_env_keys() -> set:
    keys = set()
    for root, _dirs, files in os.walk(REF):
        if "node_modules" in root:
            continue
        for fn in files:
            if not fn.endswith(".py"):
                continue
            with open(os.path.join(root, fn), errors="replace") as f:
                src = f.read()
            keys.update(re.findall(r'getenv\(\s*"([A-Z_0-9]+)"', src))
            keys.update(re.findall(r'environ\[\s*"([A-Z_0-9]+)"\s*\]', src))
    return keys


def _our_env_names() -> set:
    names = set()
    for env, _cast in cfg_mod._ENV_MAP.values():
        if isinstance(env, str):
            names.add(env)
        else:
            names.update(env)
    return names


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
def test_every_reference_env_key_is_mapped_or_exempt():
    ref = _reference_env_keys()
    assert len(ref) > 50, "reference getenv parse looks broken"
    ours = _our_env_names()
    unhandled = sorted(ref - ours - set(cfg_mod.ENV_EXEMPT))
    assert not unhandled, (
        "reference code reads env keys our config neither maps nor exempts "
        f"(add to _ENV_MAP or ENV_EXEMPT with a reason): {unhandled}")


def test_reference_alias_names_reach_config(monkeypatch):
    """A verbatim reference .env fragment must land in the typed config."""
    monkeypatch.setenv("SMTP_SERVER", "smtp.example.com")
    monkeypatch.setenv("SENDER_EMAIL", "ops@example.com")
    monkeypatch.setenv("TWILIO_ACCOUNT_SID", "AC123")
    monkeypatch.setenv("ALERT_COOLDOWN_SECONDS", "11")
    monkeypatch.setenv("EMAIL_RECIPIENTS", "a@x,b@y")
    monkeypatch.setenv("THUMB_CACHE_MEM_TTL", "7.5")
    monkeypatch.setenv("LOG_FORMAT_JSON", "true")
    c = load_config()
    assert c.smtp_host == "smtp.example.com"
    assert c.smtp_user == "ops@example.com"
    assert c.twilio_sid == "AC123"
    assert c.alert_cooldown == 11.0
    assert c.alert_email_to == "a@x,b@y"
    assert c.snapshot_ttl == 7.5
    assert c.log_json is True


def test_our_primary_name_wins_over_alias(monkeypatch):
    monkeypatch.setenv("SMTP_HOST", "ours.example.com")
    monkeypatch.setenv("SMTP_SERVER", "ref.example.com")
    assert load_config().smtp_host == "ours.example.com"


def test_derived_directory_defaults():
    c = Config()
    assert c.uploads_path().endswith(os.path.join("data", "uploads"))
    assert c.encryption_key_file().endswith(".encryption_key")
    assert c.thumb_disk_quota_bytes() == c.snapshot_cache_mb * 1024 * 1024


def test_directory_overrides(monkeypatch):
    monkeypatch.setenv("UPLOAD_DIR", "/srv/uploads")
    monkeypatch.setenv("THUMB_MAX_DISK_BYTES", str(123 * 1024))
    c = load_config()
    assert c.uploads_path() == "/srv/uploads"
    assert c.thumb_disk_quota_bytes() == 123 * 1024


# --- the wired knobs actually change behavior (not accept-and-ignore) ------

def test_disable_encryption_stores_marked_plaintext(tmp_path):
    from frp_tpu.utils.crypto import EmbeddingCipher

    c = EmbeddingCipher(str(tmp_path), disabled=True)
    token = c.encrypt_embedding([0.25] * 4)
    assert token.startswith("plain:")  # explicit, never silent
    assert not (tmp_path / ".encryption_key").exists()


def test_encryption_key_path_override(tmp_path):
    from frp_tpu.utils.crypto import EmbeddingCipher

    key_file = tmp_path / "keys" / "fernet.key"
    c = EmbeddingCipher(str(tmp_path), key_path=str(key_file))
    if not c.available:  # cryptography missing in some envs
        return
    assert key_file.exists()
    token = c.encrypt_embedding([1.0, 2.0])
    import numpy as np

    np.testing.assert_allclose(c.decrypt_embedding(token), [1.0, 2.0])


def test_model_manager_memory_cap_evicts_lru():
    from frp_tpu.platform.state import ModelManager

    mm = ModelManager(max_memory_mb=0.001)  # any real RSS exceeds this
    mm.register_loader("a", lambda: "A")
    mm.register_loader("b", lambda: "B")
    mm.get_model("a")
    mm.get_model("b")  # cap enforcement evicts the LRU other model ("a")
    assert mm.loaded() == ["b"]
    # unlimited keeps both
    mm2 = ModelManager(max_memory_mb=0)
    mm2.register_loader("a", lambda: "A")
    mm2.register_loader("b", lambda: "B")
    mm2.get_model("a")
    mm2.get_model("b")
    assert sorted(mm2.loaded()) == ["a", "b"]


def test_enhancer_knobs_change_output():
    import numpy as np

    pytest.importorskip("cv2")
    import cv2

    from frp_tpu.platform.enhancer import enhance_snapshot_bytes

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    data = buf.tobytes()
    big = enhance_snapshot_bytes(data, upscale=2.0, quality=95)
    small = enhance_snapshot_bytes(data, upscale=1.0, quality=30,
                                   sharpen=False)
    assert big and small and len(big) > len(small)
    arr_big = cv2.imdecode(np.frombuffer(big, np.uint8), cv2.IMREAD_COLOR)
    arr_small = cv2.imdecode(np.frombuffer(small, np.uint8), cv2.IMREAD_COLOR)
    assert arr_big.shape[0] == 128 and arr_small.shape[0] == 64


def test_health_backoff_knobs_apply():
    from frp_tpu.platform.health import HealthMonitor

    class _Cam:
        id, name, healthy, last_seen = 1, "c", False, None
        consecutive_failures = 3

        def read(self):
            return False, None

    class _Reg:
        def all(self):
            return [_Cam()]

    hm = HealthMonitor(_Reg(), interval=5.0, backoff_base=2.0,
                       backoff_cap=7.0)
    import time

    t0 = time.time()
    hm.probe_all()
    delay = hm._next_probe[1] - t0
    assert 6.5 <= delay <= 7.5  # min(cap=7, 2*2^3=16) = 7


def test_cors_origin_allowlist():
    from frp_tpu.api.http import HTTPServer, Router

    srv = HTTPServer(Router(), allowed_origins="http://a.example,http://b.example")
    assert srv.allowed_origins == ["http://a.example", "http://b.example"]
    srv_all = HTTPServer(Router())
    assert srv_all.allowed_origins == ["*"]


def _dispatch_headers(allowed_origins: str, origin: str | None = None) -> dict:
    """Run one request through HTTPServer._dispatch, return response headers."""
    import asyncio

    from frp_tpu.api.http import HTTPServer, Request, Router

    srv = HTTPServer(Router(), allowed_origins=allowed_origins)
    headers = {"origin": origin} if origin else {}
    req = Request("GET", "/nope", {}, headers, b"")

    class _W:
        def __init__(self):
            self.buf = b""

        def write(self, b):
            self.buf += b

        async def drain(self):
            pass

    w = _W()
    asyncio.run(srv._dispatch(req, w))
    lines = w.buf.split(b"\r\n\r\n", 1)[0].decode().split("\r\n")[1:]
    return {k.lower(): v for k, v in (ln.split(": ", 1) for ln in lines)}


def test_cors_vary_on_all_allowlist_variants():
    """Allowlist mode must send Vary: Origin on EVERY response variant —
    allowed, denied, and no-Origin — or a shared cache keyed by URL alone
    can serve the ACAO-less variant to an allowlisted browser (review fix)."""
    h = _dispatch_headers("http://a.example", "http://a.example")
    assert h["access-control-allow-origin"] == "http://a.example"
    assert h.get("vary") == "Origin"
    h = _dispatch_headers("http://a.example", "http://evil.example")
    assert "access-control-allow-origin" not in h
    assert h.get("vary") == "Origin"
    h = _dispatch_headers("http://a.example")  # curl / CDN probe, no Origin
    assert "access-control-allow-origin" not in h
    assert h.get("vary") == "Origin"
    # wildcard mode: one cacheable variant, no Vary needed
    h = _dispatch_headers("*", "http://a.example")
    assert h["access-control-allow-origin"] == "*"
    assert "vary" not in h


# --- FRP_PROFILE one-knob serving presets (round 5) ------------------------

def test_profile_accuracy_selects_ir18_flip(monkeypatch):
    monkeypatch.setenv("FRP_PROFILE", "accuracy")
    c = load_config()
    assert c.embedder_arch == "iresnet18"
    assert c.embed_flip_tta is True


def test_profile_explicit_env_wins_over_preset(monkeypatch):
    monkeypatch.setenv("FRP_PROFILE", "accuracy")
    monkeypatch.setenv("EMBED_FLIP_TTA", "0")
    c = load_config()
    assert c.embedder_arch == "iresnet18"  # preset still fills the unset key
    assert c.embed_flip_tta is False       # explicit env wins


def test_profile_throughput_is_defaults(monkeypatch):
    monkeypatch.setenv("FRP_PROFILE", "throughput")
    c = load_config()
    assert c.embedder_arch == "mobilefacenet"
    assert c.embed_flip_tta is False


def test_profile_unknown_fails_loudly(monkeypatch):
    monkeypatch.setenv("FRP_PROFILE", "acuracy")
    with pytest.raises(ValueError, match="FRP_PROFILE"):
        load_config()
