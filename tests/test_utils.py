"""Utils tests: embedded docstore pymongo-surface, thumbnail cache tiers,
logging/audit redaction, dbops dedup window."""

import json
import os
import time
from datetime import datetime, timedelta

import pytest

from frp_tpu.platform.dbops import make_log_alert
from frp_tpu.utils.docstore import DocStore
from frp_tpu.utils.logger import audit_event, redact_sensitive
from frp_tpu.utils.thumbnail_cache import ThumbnailCache


def test_docstore_crud(tmp_path):
    db = DocStore(str(tmp_path))
    coll = db["faces"]
    coll.insert_one({"target": "a", "v": 1})
    coll.insert_one({"target": "b", "v": 2})
    assert coll.count_documents({}) == 2
    assert coll.find_one({"target": "a"})["v"] == 1
    coll.update_one({"target": "a"}, {"$set": {"v": 10}, "$inc": {"n": 1}})
    assert coll.find_one({"target": "a"})["v"] == 10
    assert coll.find_one({"target": "a"})["n"] == 1
    # upsert
    coll.update_one({"target": "c"}, {"$set": {"v": 3}}, upsert=True)
    assert coll.count_documents({}) == 3
    assert coll.delete_one({"target": "b"}).deleted_count == 1
    assert sorted(d["target"] for d in coll.find({})) == ["a", "c"]


def test_docstore_query_operators(tmp_path):
    coll = DocStore(str(tmp_path))["logs"]
    for i in range(5):
        coll.insert_one({"i": i, "tag": "x" if i % 2 else "y"})
    assert coll.count_documents({"i": {"$gte": 3}}) == 2
    assert coll.count_documents({"i": {"$lt": 2}}) == 2
    assert coll.count_documents({"tag": {"$in": ["x"]}}) == 2
    assert coll.count_documents({"i": {"$ne": 0}}) == 4
    docs = list(coll.find({}).sort("i", -1).limit(2))
    assert [d["i"] for d in docs] == [4, 3]
    assert sorted(coll.distinct("tag")) == ["x", "y"]


def test_docstore_aggregate(tmp_path):
    coll = DocStore(str(tmp_path))["tracking"]
    for i in range(10):
        coll.insert_one({"person": "a" if i < 7 else "b", "ts": i})
    out = list(
        coll.aggregate(
            [{"$match": {"person": "a"}}, {"$sort": {"ts": -1}}, {"$limit": 3}]
        )
    )
    assert [d["ts"] for d in out] == [6, 5, 4]


def test_docstore_persistence(tmp_path):
    db1 = DocStore(str(tmp_path))
    db1["faces"].insert_one({"target": "persist"})
    db2 = DocStore(str(tmp_path))
    assert db2["faces"].find_one({"target": "persist"}) is not None


def test_thumbnail_cache_tiers(tmp_path):
    cache = ThumbnailCache(str(tmp_path / "thumbs"), ttl=100)
    cache.set("cam0", b"jpegbytes")
    assert cache.get("cam0") == b"jpegbytes"
    # evict memory tier, still served from disk
    cache._mem.clear()
    assert cache.get("cam0") == b"jpegbytes"
    cache.delete("cam0")
    assert cache.get("cam0") is None
    stats = cache.stats()
    assert stats["disk_entries"] == 0 and not stats["redis"]


def test_thumbnail_cache_ttl(tmp_path):
    cache = ThumbnailCache(str(tmp_path / "t"), ttl=0.05)
    cache.set("k", b"x")
    # within TTL: memory hit, then (after dropping memory) a disk hit
    assert cache.get("k") == b"x"
    cache._mem.clear()
    assert cache.get("k") == b"x"  # served from disk, re-promoted
    time.sleep(0.1)
    # past TTL the DISK tier must expire too — a TTL-free disk read froze
    # the first-ever snapshot frame forever (snapshot routes re-capture
    # only on a cache miss)
    assert cache.get("k") is None


def test_redact_sensitive_nested():
    data = {
        "target": "alice",
        "embedding": [1, 2, 3],
        "nested": {"image": "...", "ok": 1},
        "list": [{"frame": "..."}],
    }
    red = redact_sensitive(data)
    assert red["embedding"] == "[REDACTED]"
    assert red["nested"]["image"] == "[REDACTED]"
    assert red["list"][0]["frame"] == "[REDACTED]"
    assert red["target"] == "alice" and red["nested"]["ok"] == 1


def test_audit_event_writes_jsonl(tmp_path, monkeypatch):
    rec = audit_event("test_event", {"embedding": [1], "who": "x"}, log_dir=str(tmp_path))
    assert rec["payload"]["embedding"] == "[REDACTED]"
    assert rec["type"] == "test_event"


def test_log_alert_dedup_window(tmp_path):
    db = DocStore(str(tmp_path))
    log_alert = make_log_alert(db, log_dir=str(tmp_path / "logs"))
    r1 = log_alert(0, "Cam A", "(0,0)", "alice", 0.3)
    assert r1["logged"]
    r2 = log_alert(0, "Cam A", "(0,0)", "alice", 0.31)
    assert not r2["logged"] and r2["deduplicated"]
    # different target not deduped
    r3 = log_alert(0, "Cam A", "(0,0)", "bob", 0.3)
    assert r3["logged"]
    # per-target txt/json logs created
    assert os.path.exists(tmp_path / "logs" / "alice.txt")
    with open(tmp_path / "logs" / "alice.json") as f:
        assert len(json.load(f)) == 1


def test_docstore_sort_tolerates_missing_fields(tmp_path):
    """One doc without the sort field must not TypeError the whole query
    (Mongo sorts missing-first)."""
    from frp_tpu.utils.docstore import connect

    db, backend = connect("", str(tmp_path / "store"))
    coll = db["tracking"]
    coll.insert_one({"person": "a", "timestamp": "2026-01-01T00:00:00"})
    coll.insert_one({"person": "b"})  # no timestamp
    coll.insert_one({"person": "c", "timestamp": "2026-01-02T00:00:00"})
    docs = list(coll.aggregate([{"$sort": {"timestamp": 1}}]))
    assert [d["person"] for d in docs] == ["b", "a", "c"]  # missing first
    docs = list(coll.find().sort("timestamp", -1))
    assert docs[0]["person"] == "c"


def test_docstore_append_inserts_survive_reload(tmp_path):
    """insert_one appends (no full rewrite); reload sees every doc, and a
    torn trailing line doesn't discard the rest."""
    from frp_tpu.utils.docstore import connect

    path = str(tmp_path / "store")
    db, _ = connect("", path)
    for i in range(5):
        db["tracking"].insert_one({"i": i})
    # simulate a torn write (crash mid-append)
    import glob
    files = glob.glob(f"{path}/tracking*")
    assert files, "no collection file written"
    with open(files[0], "a") as f:
        f.write('{"i": 99, "_id": "torn')  # no newline, invalid JSON
    db2, _ = connect("", path)
    docs = list(db2["tracking"].find())
    assert len(docs) == 5  # torn line skipped, rest intact


def test_docstore_returns_deep_copies(tmp_path):
    from frp_tpu.utils.docstore import connect

    db, _ = connect("", str(tmp_path / "store"))
    coll = db["faces"]
    src = {"target": "a", "nested": {"vals": [1, 2]}}
    coll.insert_one(src)
    src["nested"]["vals"].append(3)  # caller mutation after insert
    got = coll.find_one({"target": "a"})
    assert got["nested"]["vals"] == [1, 2]
    got["nested"]["vals"].append(4)  # mutation of a returned doc
    again = coll.find_one({"target": "a"})
    assert again["nested"]["vals"] == [1, 2]


def test_connect_missing_pymongo_falls_back_instantly(tmp_path):
    """With MONGO_URI set but pymongo not importable, connect() must fall
    back to the embedded store immediately — retrying an ImportError with
    backoff sleeps burned seconds of startup for nothing (review fix)."""
    import importlib.util
    import time as _time

    from frp_tpu.utils import docstore

    if importlib.util.find_spec("pymongo") is not None:
        pytest.skip("pymongo installed — ImportError path unreachable")
    t0 = _time.monotonic()
    db, kind = docstore.connect("mongodb://nope:27017", str(tmp_path),
                                retries=3, backoff=2.0)
    elapsed = _time.monotonic() - t0
    assert kind == "embedded"
    assert elapsed < 1.0  # no retry/backoff sleeps on ImportError
