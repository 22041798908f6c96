"""Video-path coverage: deepfake video processing (sampling, caching,
labeling), VideoFileSource looping, CCTV sweep — on generated clips."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from frp_tpu.platform.deepfake import DeepfakeService
from frp_tpu.platform.state import CameraRegistry, VideoFileSource
from frp_tpu.train.synthetic import render_face
from tests.fakes import FakeEngine


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vids") / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (160, 120))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for i in range(30):
        rgb = rng.integers(20, 110, (120, 160, 3), dtype=np.uint8)
        render_face(rgb, 80.0, 60.0, 40.0, np.random.default_rng(1))
        w.write(np.ascontiguousarray(rgb[..., ::-1]))
    w.release()
    return path


def _service(**kw):
    return DeepfakeService(FakeEngine(), max_frames=8, **kw)


def test_probe_and_sampling(video_path):
    svc = _service()
    info = svc.probe_video(video_path)
    assert info["frame_count"] == 30 and info["width"] == 160
    idx = svc._sample_indices(30, random_sampling=False)
    assert len(idx) == 8 and idx[0] == 0 and idx[-1] < 30
    assert np.all(np.diff(idx) > 0)  # uniform ascending
    assert len(svc._sample_indices(5, False)) == 5  # short video: all frames


def test_process_video_labels_and_stats(video_path):
    svc = _service()
    result = svc.process_video(video_path)
    assert result["frames_sampled"] == 8
    assert result["frames_with_faces"] == 8  # FakeEngine: one face per frame
    # FakeEngine fake_prob = 0.12 -> real at threshold 0.5
    assert result["result"] == "real" and result["confidence"] == "high"
    assert result["model_trained"] is False
    stats = svc.get_statistics()
    assert stats["total_videos"] == 1 and stats["real_detected"] == 1
    assert len(svc.get_history()) == 1


def test_process_video_cached_dedup(video_path):
    svc = _service()
    r1 = svc.process_video_cached(video_path)
    r2 = svc.process_video_cached(video_path)
    assert r1["cached"] is False and r2["cached"] is True
    assert svc.get_statistics()["total_videos"] == 1  # second hit served from cache
    assert svc.clear_cache() == 1


def test_video_file_source_loops(video_path):
    src = VideoFileSource(video_path)
    assert src.opened
    for _ in range(35):  # beyond the 30-frame clip: must wrap
        ok, frame = src.read()
        assert ok and frame.shape == (120, 160, 3)
    assert src.restart()
    src.release()


def test_cctv_sweep_tallies(video_path):
    svc = _service()
    reg = CameraRegistry()
    reg.init_cameras([
        {"id": 0, "name": "A", "source": f"file:{video_path}"},
        {"id": 1, "name": "B", "source": "synthetic:64x48"},
    ])
    out = svc.sweep_cameras(reg.all(), max_frames_per_cam=2)
    assert set(out["cameras"]) == {0, 1}
    for cam_id, tally in out["cameras"].items():
        assert tally["frames"] == 2
        assert tally["real"] + tally["fake"] + tally["no_faces"] == 2
    reg.close_all()


def test_event_log_bounded_and_tolerant_of_foreign_content(video_path, tmp_path):
    """The deepfake event-log file must not grow without bound (capped like
    the in-memory history) and must survive non-list JSON content (review
    fix: lock + bound + isinstance guard)."""
    import json
    import os

    logs = str(tmp_path / "logs")
    svc = _service(logs_dir=logs)
    path = os.path.join(logs, "deepfake_events.json")
    os.makedirs(logs, exist_ok=True)
    with open(path, "w") as f:
        f.write('{"foreign": true}')  # valid JSON, wrong shape
    svc.process_video(video_path)
    with open(path) as f:
        events = json.load(f)
    assert isinstance(events, list) and len(events) == 1
    cap = svc.history.maxlen
    with open(path, "w") as f:
        json.dump(events * (cap + 50), f)
    svc.process_video(video_path)
    with open(path) as f:
        events = json.load(f)
    assert len(events) == cap  # bounded, newest entry appended
