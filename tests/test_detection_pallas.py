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
