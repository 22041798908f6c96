"""Detector training tests: target encoding inverts decoding, anchor matching
semantics, multibox loss behavior, and an end-to-end overfit step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frp_tpu.ops.anchor_targets import (
    assign_targets,
    encode_boxes,
    encode_landmarks,
    multibox_loss,
)
from frp_tpu.ops.anchors import generate_anchors
from frp_tpu.ops.decode import decode_boxes, decode_landmarks
from frp_tpu.train.detector import DetectorTrainer


def test_encode_decode_roundtrip(rng):
    priors = jnp.asarray(generate_anchors(128)[200:220])
    # synthetic GT boxes near the priors
    p = np.asarray(priors)
    gt_c = p[:, :2] + rng.normal(0, 0.01, (20, 2)).astype(np.float32)
    gt_wh = p[:, 2:] * np.exp(rng.normal(0, 0.2, (20, 2))).astype(np.float32)
    gt = np.concatenate([gt_c - gt_wh / 2, gt_c + gt_wh / 2], axis=1)
    enc = encode_boxes(jnp.asarray(gt), priors)
    dec = decode_boxes(enc, priors, image_size=1.0)
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-5)

    ldm = rng.uniform(0, 1, (20, 10)).astype(np.float32)
    enc_l = encode_landmarks(jnp.asarray(ldm), priors)
    dec_l = decode_landmarks(enc_l, priors, image_size=1.0)
    np.testing.assert_allclose(np.asarray(dec_l), ldm, atol=1e-5)


def test_assign_targets_semantics():
    priors = jnp.asarray(generate_anchors(128))
    p = np.asarray(priors)
    # GT exactly equal to anchor 100's box -> that anchor must be positive
    a = p[100]
    gt = np.zeros((4, 4), np.float32)
    gt[0] = [a[0] - a[2] / 2, a[1] - a[3] / 2, a[0] + a[2] / 2, a[1] + a[3] / 2]
    ldm = np.zeros((4, 10), np.float32)
    valid = np.array([True, False, False, False])
    t = assign_targets(priors, jnp.asarray(gt), jnp.asarray(ldm), jnp.asarray(valid))
    labels = np.asarray(t["labels"])
    assert labels[100] == 1
    # the matched anchor's loc target decodes back to the GT box
    dec = decode_boxes(t["loc_targets"][100], priors[100], image_size=1.0)
    np.testing.assert_allclose(np.asarray(dec), gt[0], atol=1e-5)
    # padded (invalid) GTs create no positives beyond GT 0's matches
    assert labels.sum() < 50  # only a handful of anchors near the one face
    # all-invalid GT -> no positives at all
    t0 = assign_targets(priors, jnp.asarray(gt), jnp.asarray(ldm),
                        jnp.zeros(4, bool))
    assert np.asarray(t0["labels"]).max() == 0


def test_multibox_loss_prefers_correct_predictions(rng):
    priors = jnp.asarray(generate_anchors(128))
    a = priors.shape[0]
    p = np.asarray(priors)
    gt = np.array([[0.3, 0.3, 0.6, 0.6]], np.float32)
    ldm = np.full((1, 10), 0.45, np.float32) + rng.normal(0, 0.02, (1, 10)).astype(np.float32)
    t = assign_targets(priors, jnp.asarray(gt), jnp.asarray(ldm), jnp.asarray([True]))
    pos = np.asarray(t["labels"]) == 1
    assert pos.any()
    # perfect predictions -> near-zero loss; wrong class -> large loss
    perfect_logits = np.zeros((a, 2), np.float32)
    perfect_logits[:, 0] = 8.0
    perfect_logits[pos] = [0.0, 8.0]
    good = multibox_loss(
        t["loc_targets"], t["ldm_targets"], jnp.asarray(perfect_logits), t
    )
    bad_logits = perfect_logits[:, ::-1].copy()
    bad = multibox_loss(
        jnp.zeros_like(t["loc_targets"]), jnp.zeros_like(t["ldm_targets"]),
        jnp.asarray(bad_logits), t,
    )
    assert float(good["loss"]) < 0.1
    assert float(bad["loss"]) > float(good["loss"]) + 1.0


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_detector_overfits_fixed_batch():
    trainer = DetectorTrainer(det_size=128, seed=0, learning_rate=1e-3,
                              compute_dtype="float32")
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.float32)
    gt = np.zeros((2, 4, 4), np.float32)
    gt[:, 0] = [0.25, 0.25, 0.75, 0.75]
    ldm = np.full((2, 4, 10), 0.5, np.float32) + \
        rng.normal(0, 0.05, (2, 4, 10)).astype(np.float32)
    valid = np.zeros((2, 4), bool)
    valid[:, 0] = True
    losses = [trainer.train_step(images, gt, ldm, valid)["loss"] for _ in range(6)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_force_match_not_clobbered_by_padded_gts():
    """Padded (invalid) GT slots all argmax to anchor 0; the force-match
    scatter must not let them clobber a valid GT whose best anchor IS
    anchor 0 (a face would lose its only positive anchor)."""
    import jax.numpy as jnp

    from frp_tpu.ops.anchor_targets import assign_targets
    from frp_tpu.ops.anchors import generate_anchors

    priors = jnp.asarray(generate_anchors(128))
    # a tiny box overlapping anchor 0 (stride-8 cell at the origin) with
    # IoU below pos_thresh so ONLY force-match can make it positive
    gt_boxes = jnp.asarray([[0.0, 0.0, 6.0, 6.0]] + [[0.0, 0.0, 0.0, 0.0]] * 3) / 128.0
    gt_ldm = jnp.zeros((4, 10))
    gt_valid = jnp.asarray([True, False, False, False])
    out = assign_targets(priors, gt_boxes, gt_ldm, gt_valid)
    labels = np.asarray(out["labels"])
    best_idx = np.asarray(out["best_gt_idx"]) if "best_gt_idx" in out else None
    iou_argmax_anchor = 0  # by construction the box sits in the first cell
    assert labels[iou_argmax_anchor] == 1, (
        "valid GT's forced anchor was clobbered by padded GT scatter"
    )
