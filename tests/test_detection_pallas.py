"""Fused Pallas detection head == the reference XLA path
(decode_boxes/decode_landmarks + nms_padded_batched) on identical inputs."""

import numpy as np
import jax.numpy as jnp
import pytest

from frp_tpu.ops.anchors import generate_anchors
from frp_tpu.ops.decode import decode_boxes, decode_landmarks
from frp_tpu.ops.detection_pallas import fused_detection_head
from frp_tpu.ops.nms import nms_padded_batched


def _random_head(rng, b, a):
    loc = rng.normal(0, 0.4, size=(b, a, 4)).astype(np.float32)
    ldm = rng.normal(0, 0.4, size=(b, a, 10)).astype(np.float32)
    # a handful of confident candidates per frame, rest near zero
    scores = rng.uniform(0, 0.25, size=(b, a)).astype(np.float32)
    for i in range(b):
        hot = rng.choice(a, size=24, replace=False)
        scores[i, hot] = rng.uniform(0.5, 1.0, size=24)
    return loc, ldm, scores


@pytest.mark.parametrize("det_size", [128])
def test_fused_head_matches_xla_path(det_size):
    rng = np.random.default_rng(0)
    priors = generate_anchors(det_size)
    a = priors.shape[0]
    b = 3
    loc, ldm, scores = _random_head(rng, b, a)
    kw = dict(pre_topk=64, max_out=8, conf_thresh=0.5, iou_thresh=0.4)

    boxes = decode_boxes(jnp.asarray(loc), priors, float(det_size))
    ldm_px = decode_landmarks(jnp.asarray(ldm), priors, float(det_size))
    ref = nms_padded_batched(boxes, jnp.asarray(scores), ldm_px, **kw)

    got = fused_detection_head(
        jnp.asarray(loc), jnp.asarray(ldm), jnp.asarray(scores), priors,
        image_size=float(det_size), **kw,
    )

    np.testing.assert_array_equal(np.asarray(got["valid"]), np.asarray(ref["valid"]))
    np.testing.assert_array_equal(np.asarray(got["count"]), np.asarray(ref["count"]))
    v = np.asarray(ref["valid"])
    for key, tol in (("boxes", 1e-3), ("landmarks", 1e-3), ("scores", 1e-5)):
        np.testing.assert_allclose(
            np.asarray(got[key])[v], np.asarray(ref[key])[v], rtol=1e-4, atol=tol,
            err_msg=key,
        )
    # padded slots zeroed in both
    for key in ("boxes", "landmarks", "scores"):
        assert np.all(np.asarray(got[key])[~v] == 0), key


def test_fused_head_empty_and_full():
    rng = np.random.default_rng(1)
    priors = generate_anchors(128)
    a = priors.shape[0]
    loc = np.zeros((2, a, 4), np.float32)
    ldm = np.zeros((2, a, 10), np.float32)
    scores = np.zeros((2, a), np.float32)
    scores[1, :40] = 0.9  # frame 1: many overlapping anchors -> NMS dedups
    out = fused_detection_head(
        jnp.asarray(loc), jnp.asarray(ldm), jnp.asarray(scores), priors,
        pre_topk=64, max_out=8, image_size=128.0,
    )
    assert int(out["count"][0]) == 0
    assert np.all(~np.asarray(out["valid"][0]))
    assert int(out["count"][1]) >= 1  # at least the top anchor survives


# ---------------------------------------------------------------------------
# Pallas two-pass shear warp == XLA bilinear warp (ops/align_pallas.py)
# ---------------------------------------------------------------------------

def _rot_template(tmpl, deg):
    th = np.deg2rad(deg)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    ctr = tmpl.mean(0)
    return (tmpl - ctr) @ rot.T + ctr


def test_pallas_warp_upright_matches_to_coordinate_ties():
    """No rotation -> the shear decomposition degenerates to separable
    bilinear. Bit-exactness with the XLA warp is NOT attainable: the
    similarity fit leaves a ~1e-7 rotation residual whose different f32
    association shifts sample coordinates by ~1e-5 px, flipping floor() at
    integer-coordinate ties. On noise frames a tie reads as a full-value
    diff, so the correct contract is: only a small fraction of pixels may
    differ, and they must be isolated ties."""
    from frp_tpu.ops.align import (
        ARCFACE_TEMPLATE_112,
        similarity_transform,
        warp_crops_batched,
    )
    from frp_tpu.ops.align_pallas import warp_crops_batched_pallas

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 512, 512, 3)).astype(np.float32)
    tmpl = np.asarray(ARCFACE_TEMPLATE_112, np.float32)
    ldm = np.stack([[tmpl * 0.8 + 100, tmpl * 1.3 + 220, tmpl + 40]] * 2)
    mats = similarity_transform(jnp.asarray(ldm.astype(np.float32)),
                                jnp.asarray(tmpl))
    ref = np.asarray(warp_crops_batched(jnp.asarray(frames), mats, 112))
    got = np.asarray(warp_crops_batched_pallas(jnp.asarray(frames), mats, 112))
    mismatch = np.mean(np.abs(ref - got) > 2.0)
    assert mismatch < 0.05, mismatch


def test_pallas_warp_rotated_subpixel():
    """Rotated faces: the two-pass interpolation differs from true bilinear
    by O(tan theta) sub-pixel — small on smooth images."""
    from frp_tpu.ops.align import (
        ARCFACE_TEMPLATE_112,
        similarity_transform,
        warp_crops_batched,
    )
    from frp_tpu.ops.align_pallas import warp_crops_batched_pallas

    rng = np.random.default_rng(1)
    f = rng.normal(128, 60, size=(2, 512, 512, 3)).astype(np.float32)
    for _ in range(3):
        f = (np.roll(f, 1, 1) + f + np.roll(f, -1, 1)) / 3
        f = (np.roll(f, 1, 2) + f + np.roll(f, -1, 2)) / 3
    tmpl = np.asarray(ARCFACE_TEMPLATE_112, np.float32)
    ldm = np.asarray(
        [[_rot_template(tmpl, rng.uniform(-10, 10)) * rng.uniform(0.5, 1.5)
          + rng.uniform(80, 300, 2) for _ in range(3)] for _ in range(2)],
        np.float32,
    )
    mats = similarity_transform(jnp.asarray(ldm), jnp.asarray(tmpl))
    ref = np.asarray(warp_crops_batched(jnp.asarray(f), mats, 112))
    got = np.asarray(warp_crops_batched_pallas(jnp.asarray(f), mats, 112))
    err = np.abs(ref - got)
    assert float(err.mean()) < 0.1 and float(err.max()) < 5.0, (
        err.max(), err.mean())


def _similarity_forward(scale, cx, cy, out_size=112):
    """Forward matrix mapping source px -> out px: out = s*(src-c) + S/2."""
    s = out_size / scale  # map a `scale`-px source extent onto the crop
    return np.array(
        [[s, 0.0, out_size / 2 - s * cx], [0.0, s, out_size / 2 - s * cy]],
        np.float32,
    )


def test_align_pallas_right_edge_face_exact():
    """Round-1's floor-quantized window start lost up to 127 px of reach:
    a face near the RIGHT edge (or any det grid where w-WIN < 128) produced
    edge-smeared crops. The centered nearest-aligned start must be
    sub-pixel-equal to the XLA warp for all extents within coverage."""
    import jax.numpy as jnp

    from frp_tpu.ops.align import warp_crops_batched
    from frp_tpu.ops.align_pallas import warp_crops_batched_pallas

    rng = np.random.default_rng(0)
    h = w = 640
    frame = rng.integers(0, 255, (1, h, w, 3)).astype(np.float32)
    cases = [
        (240.0, 500.0, 320.0),  # large face near the right edge
        (200.0, 108.0, 540.0),  # bottom-left
        (252.0, 320.0, 320.0),  # max covered extent, center
        (80.0, 596.0, 60.0),    # small face flush against the right edge
    ]
    mats = np.stack([
        _similarity_forward(scale, cx, cy) for scale, cx, cy in cases
    ])[None]
    got = np.asarray(warp_crops_batched_pallas(jnp.asarray(frame), jnp.asarray(mats)))
    want = np.asarray(warp_crops_batched(jnp.asarray(frame), jnp.asarray(mats)))
    err = np.abs(got - want)
    assert err.max() < 1.0, err.max()  # sub-pixel everywhere, incl. edges

    # a quad partially OUTSIDE the frame: both paths clamp to the border
    # pixel now (the XLA sampler previously extrapolated with unclamped
    # bilinear weights — fixed in ops/align.py _bilinear_sample), so the
    # two warps agree everywhere including the out-of-frame region
    m_out = _similarity_forward(80.0, 620.0, 20.0)[None, None]  # cols beyond 640
    got = np.asarray(warp_crops_batched_pallas(jnp.asarray(frame), jnp.asarray(m_out)))
    want = np.asarray(warp_crops_batched(jnp.asarray(frame), jnp.asarray(m_out)))
    assert np.abs(got - want).max() < 1.0


def test_align_auto_falls_back_for_oversized_faces():
    """warp_crops_auto: a face whose source extent exceeds the kernel's
    provable coverage (e.g. a closeup selfie filling the det square) must
    take the exact XLA warp via the per-batch lax.cond."""
    import jax.numpy as jnp

    from frp_tpu.ops.align import warp_crops_batched
    from frp_tpu.ops.align_pallas import pallas_coverage_ok, warp_crops_auto

    rng = np.random.default_rng(1)
    h = w = 640
    frame = rng.integers(0, 255, (1, h, w, 3)).astype(np.float32)
    big = _similarity_forward(560.0, 320.0, 320.0)  # face fills the square
    small = _similarity_forward(120.0, 200.0, 200.0)
    mats = np.stack([big, small])[None]
    assert not bool(pallas_coverage_ok(jnp.asarray(mats)))
    got = np.asarray(warp_crops_auto(jnp.asarray(frame), jnp.asarray(mats)))
    want = np.asarray(warp_crops_batched(jnp.asarray(frame), jnp.asarray(mats)))
    np.testing.assert_allclose(got, want, atol=1e-3)
    # and an all-small batch keeps the fast path (coverage ok)
    mats_small = np.stack([small, small])[None]
    assert bool(pallas_coverage_ok(jnp.asarray(mats_small)))
