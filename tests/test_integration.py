"""Cross-subsystem integration: the full federated round with real local
trainers as clients (BASELINE config 5), fault injection + health recovery,
and thread-safety stress on the shared state."""

import threading
import time
from datetime import datetime

import numpy as np
import pytest

from frp_tpu.platform.federated import FederatedService
from frp_tpu.platform.health import HealthMonitor
from frp_tpu.platform.state import Camera, CameraRegistry, FrameSource
from frp_tpu.engine.gallery import DeviceGallery
from frp_tpu.train.arcface import ArcFaceTrainer


# ---------------------------------------------------------------------------
# BASELINE config 5: FedAvg round fed by real local training
# ---------------------------------------------------------------------------

def test_federated_round_with_real_trainers(tmp_path):
    """Two clients train locally (ArcFace on the device mesh of this process),
    upload weight deltas through the FL service, aggregate, and the global
    model equals the element-wise average of the client deltas."""
    fl = FederatedService(weights_dir=str(tmp_path / "fl"), min_clients=2)
    rng = np.random.default_rng(0)

    deltas = {}
    for cid, seed in (("client_a", 1), ("client_b", 2)):
        trainer = ArcFaceTrainer(
            num_classes=4, seed=seed, learning_rate=0.05, compute_dtype="float32"
        )
        images = rng.normal(0, 0.5, size=(4, 112, 112, 3)).astype(np.float32)
        labels = rng.integers(0, 4, size=(4,)).astype(np.int32)
        trainer.train_step(images, labels)
        delta = trainer.weights_delta()
        # ship a subset of layers (full backbone = ~1M params; keep test fast)
        subset = {k: delta[k] for k in sorted(delta)[:8]}
        deltas[cid] = subset
        result = fl.upload_weights(cid, subset)
        assert result["success"]

    agg = fl.aggregate()
    assert agg["success"] and agg["version"] == 1
    _, model = fl.get_global_model()
    for layer in deltas["client_a"]:
        want = (np.asarray(deltas["client_a"][layer])
                + np.asarray(deltas["client_b"][layer])) / 2.0
        np.testing.assert_allclose(model[layer], want, rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# fault injection: flaky camera -> health degradation -> backoff -> recovery
# ---------------------------------------------------------------------------

class FlakySource(FrameSource):
    """Fails for `fail_reads` reads, then recovers — fault injection the
    reference lacks entirely (SURVEY.md section 5)."""

    def __init__(self, fail_reads: int):
        self.fail_reads = fail_reads
        self.reads = 0

    def read(self):
        self.reads += 1
        if self.reads <= self.fail_reads:
            return False, None
        return True, np.zeros((16, 16, 3), np.uint8)


def test_camera_failure_detection_and_recovery():
    reg = CameraRegistry()
    cam = reg.add(0, "flaky", source="synthetic")
    cam.source = FlakySource(fail_reads=4)

    monitor = HealthMonitor(reg, cameras_collection=None, interval=0.01)
    r1 = monitor.probe_all()
    assert r1[0]["consecutive_failures"] == 1
    # consecutive failures mark unhealthy after 3
    monitor._next_probe.clear(); monitor.probe_all()
    monitor._next_probe.clear(); monitor.probe_all()
    assert not cam.healthy
    # backoff: next probe scheduled in the future
    assert monitor._next_probe[0] > time.time()
    # recovery once the source comes back
    monitor._next_probe.clear()
    monitor.probe_all()  # 4th failing read
    monitor._next_probe.clear()
    r = monitor.probe_all()  # source recovered
    assert r[0]["healthy"] and cam.consecutive_failures == 0


def test_camera_restart_resets_failures():
    reg = CameraRegistry()
    cam = reg.add(1, "flaky2", source="synthetic")
    cam.source = FlakySource(fail_reads=10**9)
    for _ in range(3):
        cam.read()
    assert not cam.healthy
    # restart swaps nothing here (FlakySource.restart -> True) but must clear
    # the failure counter, matching the reference's restart endpoints
    assert cam.restart()
    assert cam.consecutive_failures == 0


# ---------------------------------------------------------------------------
# thread-safety stress (the reference's known unguarded races, SURVEY sec. 5)
# ---------------------------------------------------------------------------

def test_gallery_concurrent_mutation_stress():
    g = DeviceGallery(embed_dim=16)
    errors = []

    def writer(base):
        try:
            for i in range(200):
                g.add(f"p{base}_{i % 20}", np.full(16, i, np.float32))
                if i % 7 == 0:
                    g.remove(f"p{base}_{(i - 3) % 20}")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader():
        try:
            for _ in range(200):
                mat, names = g.host_arrays()
                assert mat.shape[0] == len(names)
                g.device_arrays()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(4)]
    threads += [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # invariant: index consistent with names
    mat, names = g.host_arrays()
    assert len(set(names)) == len(names)
    for name in names:
        assert g.get(name) is not None


def test_registry_concurrent_add_update_remove():
    reg = CameraRegistry()
    errors = []

    def churn(base):
        try:
            for i in range(100):
                cid = base * 1000 + (i % 10)
                try:
                    reg.add(cid, f"cam{cid}", source="synthetic:16x16")
                except ValueError:
                    pass
                reg.update(cid, name=f"cam{cid}_{i}")
                if i % 3 == 0:
                    reg.remove(cid)
                reg.metadata()
                reg.ids()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=churn, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_meshed_serving_scan(tmp_path):
    """The --mesh auto serving path: AppContext(mesh=...) with the real
    engine sharding the 8-camera scan batch over the 8-device CPU mesh —
    the full run_scan loop (batch -> detect -> match -> track) executes and
    returns the digest. (CLAUDE.md: production equivalent is
    `python -m frp_tpu.api.main --mesh auto`.)"""
    from frp_tpu.api.main import build_app
    from frp_tpu.config import load_config
    from frp_tpu.parallel.mesh import distributed_initialize, make_mesh
    from frp_tpu.platform.context import AppContext

    assert distributed_initialize()["num_processes"] == 1  # no-op single host
    mesh = make_mesh(n_data=8, n_model=1)
    cfg = load_config(
        data_dir=str(tmp_path / "data"), log_dir=str(tmp_path / "logs"),
        det_size=128, max_faces_per_frame=4, pre_nms_topk=64,
        frames_per_batch=8,
    )
    ctx = AppContext(cfg=cfg, camera_configs=[
        {"id": i, "name": f"Cam {i}", "geo": (18.5 + i * 0.01, 73.8),
         "source": "synthetic:128x96"}
        for i in range(8)
    ], mesh=mesh)
    try:
        router, sio, ctx = build_app(ctx)
        out = ctx.run_scan(0.6, 1, 10)
        assert out["scanned"] == 8
        assert isinstance(out["detections"], list)
        # engine really carries the mesh
        assert ctx.engine.mesh is mesh
    finally:
        ctx.shutdown()
