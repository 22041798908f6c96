"""Device tracing — the profiling vertical the reference never had.

SURVEY.md section 5: the reference only hand-rolls timing counters (which we
keep for API parity, EngineMetrics / CameraScanStats / FaceService.metrics).
This adds the TPU-native layer: ``jax.profiler`` trace capture around the
device pipeline, written as TensorBoard-compatible traces, plus lightweight
per-stage wall timers.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict

import jax

from frp_tpu.utils.logger import get_logger

logger = get_logger("frp.utils.profiling")


class StageTimers:
    """Cheap named wall-clock accumulators (host-side view of stage costs)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._acc: dict[str, list] = defaultdict(lambda: [0, 0.0])

    @contextlib.contextmanager
    def track(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                entry = self._acc[name]
                entry[0] += 1
                entry[1] += dt

    def summary(self) -> dict:
        with self._lock:
            return {
                name: {
                    "calls": count,
                    "total_s": round(total, 4),
                    "mean_ms": round(total / max(count, 1) * 1000, 3),
                }
                for name, (count, total) in self._acc.items()
            }

    def reset(self):
        with self._lock:
            self._acc.clear()


class DeviceTracer:
    """jax.profiler trace sessions (one at a time), TensorBoard format."""

    def __init__(self, trace_dir: str = "data/traces"):
        self.trace_dir = trace_dir
        self._lock = threading.Lock()
        self._active: str | None = None

    def start(self, label: str = "trace") -> dict:
        with self._lock:
            if self._active is not None:
                return {"success": False, "message": "trace already running"}
            path = os.path.join(self.trace_dir, f"{label}_{int(time.time())}")
            os.makedirs(path, exist_ok=True)
            try:
                jax.profiler.start_trace(path)
            except Exception as e:
                return {"success": False, "message": str(e)}
            self._active = path
            return {"success": True, "trace_dir": path}

    def stop(self) -> dict:
        with self._lock:
            if self._active is None:
                return {"success": False, "message": "no trace running"}
            path = self._active
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                # keep _active set: clearing it while the JAX session is
                # still live wedges the tracer (stop says "not running",
                # start says "already tracing") until process restart
                return {"success": False, "message": str(e)}
            self._active = None
            return {"success": True, "trace_dir": path}

    @contextlib.contextmanager
    def annotate(self, name: str):
        """Named region visible in the device trace."""
        with jax.profiler.TraceAnnotation(name):
            yield
