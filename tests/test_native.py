"""Native framepack tests: fused C++ letterbox+I420 vs the cv2 reference
path; skipped cleanly where no toolchain/library exists."""

import numpy as np
import pytest

from frp_tpu.engine.batching import letterbox
from frp_tpu.utils.native import get_framepack, letterbox_i420_batch

pytestmark = pytest.mark.skipif(
    get_framepack() is None, reason="native framepack unavailable"
)


def _cv2_reference(frame, size):
    import cv2

    boxed, s, (ox, oy) = letterbox(frame, size)
    return cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420), s, (ox, oy)


def test_framepack_matches_cv2_geometry_and_pixels():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    # smooth frame so resampler differences stay small
    yy, xx = np.mgrid[0:360, 0:640]
    frame = np.stack([yy % 256, xx % 256, (yy + xx) % 256], axis=-1).astype(np.uint8)
    out, scales, offsets = letterbox_i420_batch([frame], 256)
    ref, s, (ox, oy) = _cv2_reference(frame, 256)
    assert out.shape == (1, 384, 256)
    np.testing.assert_allclose(scales[0], s, rtol=1e-3)
    np.testing.assert_allclose(offsets[0], [ox, oy], atol=1.0)
    # Y plane close to cv2's (different resamplers: allow small error)
    y_native = out[0, :256].astype(np.float32)
    y_cv = ref[:256].astype(np.float32)
    assert np.mean(np.abs(y_native - y_cv)) < 3.0


def test_framepack_batch_multiresolution():
    rng = np.random.default_rng(1)
    frames = [
        rng.integers(0, 255, (240, 320, 3), np.uint8),
        rng.integers(0, 255, (480, 640, 3), np.uint8),
        rng.integers(0, 255, (720, 1280, 3), np.uint8),
    ]
    out, scales, offsets = letterbox_i420_batch(frames, 128, n_threads=3)
    assert out.shape == (3, 192, 128)
    assert np.all(scales > 0)
    # every frame produced non-trivial luma content
    for i in range(3):
        assert out[i, :128].std() > 5


def test_framepack_ingests_through_device_path():
    """Native-packed I420 decodes to sane RGB via the device converter."""
    import jax.numpy as jnp

    from frp_tpu.ops.image import yuv420_to_rgb

    frame = np.full((100, 100, 3), 128, np.uint8)  # mid-gray
    out, _, _ = letterbox_i420_batch([frame], 64)
    rgb = np.asarray(yuv420_to_rgb(jnp.asarray(out)))
    # center of the letterboxed region should be ~128 gray
    center = rgb[0, 32, 32]
    np.testing.assert_allclose(center, 128.0, atol=6.0)


def test_native_active_rows_matches_cv2_path():
    """framepack v2 rows-mode must agree with the cv2 active-rows path:
    same shapes, offsets in full-square coordinates, near-equal pixels."""
    cv2 = pytest.importorskip("cv2")
    from frp_tpu.engine.batching import build_batch_i420, letterbox
    from frp_tpu.utils.native import get_framepack, letterbox_i420_batch

    if get_framepack() is None:
        pytest.skip("native framepack unavailable")

    size, rows = 128, 80
    # smooth gradients: cv2 downscales with INTER_AREA, the native kernel is
    # bilinear — on noise that measures the resamplers, not the packer
    yy, xx = np.mgrid[0:90, 0:160]
    frames = [
        np.ascontiguousarray(
            np.stack([(yy + 17 * k) % 256, (xx + 31 * k) % 256,
                      (yy + xx + 7 * k) % 256], axis=-1).astype(np.uint8)
        )
        for k in range(3)
    ]
    packed = letterbox_i420_batch(frames, size, rows=rows)
    assert packed is not None
    out, scales, offsets = packed
    assert out.shape == (3, rows * 3 // 2, size)

    # cv2 reference for the same geometry
    oy_pad = (size - rows) // 2
    for i, f in enumerate(frames):
        boxed, s, (ox, oy) = letterbox(f, size, rows=rows)
        ref = cv2.cvtColor(boxed, cv2.COLOR_BGR2YUV_I420)
        assert abs(scales[i] - s) < 1e-6
        assert offsets[i][0] == ox and offsets[i][1] == oy + oy_pad
        # bilinear + integer-rounding differences stay small on the Y plane
        diff = np.abs(out[i, :rows].astype(int) - ref[:rows].astype(int))
        assert np.median(diff) <= 1.0 and np.mean(diff) < 3.0
