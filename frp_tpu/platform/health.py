"""Background camera health loop — reference ``backend/app/health_checks.py``:
poll every camera each interval, track consecutive_failures, exponential
backoff 10 s * 2^n capped at 1 h, persist healthy/last_seen to the cameras
collection. Probes the frame source directly instead of HTTP-ing our own
snapshot endpoint (the reference loops back through its own API).
"""

from __future__ import annotations

import threading
import time

from frp_tpu.utils.logger import get_logger

logger = get_logger("frp.platform.health")

BACKOFF_BASE = 10.0
BACKOFF_CAP = 3600.0


class HealthMonitor:
    def __init__(self, registry, cameras_collection=None, interval: float = 30.0):
        self.registry = registry
        self._coll = cameras_collection
        self.interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._next_probe: dict[int, float] = {}
        self.probes = 0

    def start(self):
        if self._thread is not None:
            return
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2)
            self._thread = None

    def _loop(self):
        while not self._stop.wait(self.interval):
            try:
                self.probe_all()
            except Exception:
                logger.exception("health loop iteration failed")

    def probe_all(self) -> dict:
        now = time.time()
        results = {}
        for cam in self.registry.all():
            if now < self._next_probe.get(cam.id, 0):
                results[cam.id] = {"skipped": True, "healthy": cam.healthy}
                continue
            ok, _ = cam.read()
            self.probes += 1
            if ok:
                self._next_probe[cam.id] = now + self.interval
            else:
                # exponential backoff on consecutive failures; the exponent
                # must be clamped — consecutive_failures grows unbounded
                # (one per scan tick on a dead camera), and 2**1024
                # overflows the float multiply, killing the whole probe loop
                delay = min(
                    BACKOFF_CAP,
                    BACKOFF_BASE * (2 ** min(cam.consecutive_failures, 16)),
                )
                self._next_probe[cam.id] = now + delay
            results[cam.id] = {
                "healthy": cam.healthy,
                "consecutive_failures": cam.consecutive_failures,
                "last_seen": cam.last_seen,
            }
            if self._coll is not None:
                try:
                    self._coll.update_one(
                        {"camera_id": cam.id},
                        {
                            "$set": {
                                "camera_id": cam.id,
                                "name": cam.name,
                                "healthy": cam.healthy,
                                "last_seen": cam.last_seen,
                                "consecutive_failures": cam.consecutive_failures,
                            }
                        },
                        upsert=True,
                    )
                except Exception:
                    logger.exception("camera health persistence failed (non-fatal)")
        return results
