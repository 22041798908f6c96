"""Unit tests: anchors, decode, NMS — golden values from the standard
RetinaFace formulation the reference consumes via InsightFace ONNX."""

import numpy as np
import jax.numpy as jnp

from frp_tpu.ops.anchors import generate_anchors, num_anchors
from frp_tpu.ops.decode import decode_boxes, decode_landmarks
from frp_tpu.ops.nms import iou_matrix, nms_padded


def test_anchor_count_640():
    a = generate_anchors(640)
    assert a.shape == (16800, 4)  # 2*(80^2 + 40^2 + 20^2)
    assert num_anchors(640) == 16800


def test_anchor_first_cells():
    a = generate_anchors(640)
    # first cell of stride-8 level: center (0.5*8/640), sizes 16/640 then 32/640
    np.testing.assert_allclose(a[0], [0.00625, 0.00625, 0.025, 0.025], rtol=1e-6)
    np.testing.assert_allclose(a[1], [0.00625, 0.00625, 0.05, 0.05], rtol=1e-6)
    # second cell is one step right in x
    np.testing.assert_allclose(a[2][0], 0.00625 + 8 / 640, rtol=1e-6)
    assert np.all(a[:, 2:] > 0)


def test_decode_zero_deltas_is_prior():
    priors = jnp.asarray(generate_anchors(640)[:8])
    loc = jnp.zeros((8, 4))
    boxes = np.asarray(decode_boxes(loc, priors, image_size=640.0))
    expected_tl = (priors[:, :2] - priors[:, 2:] / 2) * 640
    expected_br = (priors[:, :2] + priors[:, 2:] / 2) * 640
    np.testing.assert_allclose(boxes[:, :2], expected_tl, rtol=1e-5)
    np.testing.assert_allclose(boxes[:, 2:], expected_br, rtol=1e-5)


def test_decode_matches_manual_formula(rng):
    priors = jnp.asarray(generate_anchors(640)[100:110])
    loc = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    got = np.asarray(decode_boxes(loc, priors, image_size=1.0))
    p = np.asarray(priors)
    l = np.asarray(loc)
    cxy = p[:, :2] + l[:, :2] * 0.1 * p[:, 2:]
    wh = p[:, 2:] * np.exp(l[:, 2:] * 0.2)
    want = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_decode_landmarks_formula(rng):
    priors = jnp.asarray(generate_anchors(640)[:6])
    ldm = jnp.asarray(rng.normal(size=(6, 10)).astype(np.float32))
    got = np.asarray(decode_landmarks(ldm, priors, image_size=640.0))
    p = np.asarray(priors)
    l = np.asarray(ldm).reshape(6, 5, 2)
    want = (p[:, None, :2] + l * 0.1 * p[:, None, 2:]).reshape(6, 10) * 640.0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_iou_matrix_golden():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
        jnp.float32,
    )
    iou = np.asarray(iou_matrix(boxes))
    assert iou[0, 1] == 1.0
    np.testing.assert_allclose(iou[0, 2], 25.0 / 175.0, rtol=1e-6)
    assert iou[0, 3] == 0.0
    np.testing.assert_allclose(np.diag(iou), 1.0)


def _numpy_greedy_nms(boxes, scores, conf, iou_t, iom_t=0.5):
    """Mirror of ops/nms.py semantics: suppress on IoU > iou_t OR (when
    iom_t > 0) intersection-over-min-area > iom_t."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i] or scores[i] < conf:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            bi, bj = boxes[i], boxes[j]
            ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            ai = (bi[2] - bi[0]) * (bi[3] - bi[1])
            aj = (bj[2] - bj[0]) * (bj[3] - bj[1])
            hit = inter / (ai + aj - inter + 1e-12) > iou_t
            if iom_t > 0:
                hit = hit or inter / (min(ai, aj) + 1e-12) > iom_t
            if scores[j] <= scores[i] and hit:
                suppressed[j] = True
    return sorted(keep, key=lambda i: -scores[i])


def test_nms_suppresses_duplicates():
    boxes = np.array(
        [
            [0, 0, 10, 10],
            [1, 1, 11, 11],   # heavy overlap with box 0, lower score
            [50, 50, 60, 60],
            [100, 100, 110, 110],  # below conf threshold
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.3], np.float32)
    ldm = np.zeros((4, 10), np.float32)
    out = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(ldm),
        pre_topk=4, max_out=8, conf_thresh=0.5, iou_thresh=0.4,
    )
    assert int(out["count"]) == 2
    valid = np.asarray(out["valid"])
    kept_boxes = np.asarray(out["boxes"])[valid]
    np.testing.assert_allclose(kept_boxes[0], boxes[0])
    np.testing.assert_allclose(kept_boxes[1], boxes[2])
    # padded slots zeroed
    assert np.all(np.asarray(out["boxes"])[~valid] == 0)


def test_nms_matches_numpy_reference(rng):
    n = 120
    centers = rng.uniform(20, 600, size=(n, 2)).astype(np.float32)
    sizes = rng.uniform(10, 60, size=(n, 1)).astype(np.float32)
    boxes = np.concatenate([centers - sizes, centers + sizes], axis=1)
    scores = rng.uniform(0, 1, size=n).astype(np.float32)
    ldm = np.zeros((n, 10), np.float32)
    out = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(ldm),
        pre_topk=128, max_out=64, conf_thresh=0.3, iou_thresh=0.4,
    )
    want = _numpy_greedy_nms(boxes, scores, 0.3, 0.4)
    got_scores = np.asarray(out["scores"])[np.asarray(out["valid"])]
    np.testing.assert_allclose(np.sort(got_scores), np.sort(scores[want][:64]), rtol=1e-6)


def test_nms_empty_when_all_below_threshold():
    boxes = jnp.ones((10, 4))
    scores = jnp.full((10,), 0.1)
    ldm = jnp.zeros((10, 10))
    out = nms_padded(boxes, scores, ldm, pre_topk=10, max_out=4, conf_thresh=0.5)
    assert int(out["count"]) == 0
    assert not bool(np.any(np.asarray(out["valid"])))


def test_nms_padded_batched_matches_single(rng):
    from frp_tpu.ops.nms import nms_padded_batched

    b, n = 3, 100
    centers = rng.uniform(20, 600, size=(b, n, 2)).astype(np.float32)
    sizes = rng.uniform(10, 60, size=(b, n, 1)).astype(np.float32)
    boxes = np.concatenate([centers - sizes, centers + sizes], axis=2)
    scores = rng.uniform(0, 1, size=(b, n)).astype(np.float32)
    ldm = rng.normal(size=(b, n, 10)).astype(np.float32)
    batched = nms_padded_batched(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(ldm),
        pre_topk=64, max_out=16, conf_thresh=0.3, iou_thresh=0.4,
        use_pallas=False,
    )
    for i in range(b):
        single = nms_padded(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]), jnp.asarray(ldm[i]),
            pre_topk=64, max_out=16, conf_thresh=0.3, iou_thresh=0.4,
        )
        np.testing.assert_allclose(batched["scores"][i], single["scores"], rtol=1e-6)
        np.testing.assert_array_equal(batched["valid"][i], single["valid"])
        np.testing.assert_allclose(batched["boxes"][i], single["boxes"], rtol=1e-6)


def test_nms_pallas_interpret_matches_xla(rng):
    """The Pallas greedy-suppress kernel (interpret mode on CPU) must produce
    the exact greedy keep mask."""
    from frp_tpu.ops.nms import nms_padded_batched

    b, n = 2, 80
    centers = rng.uniform(20, 400, size=(b, n, 2)).astype(np.float32)
    sizes = rng.uniform(10, 80, size=(b, n, 1)).astype(np.float32)
    boxes = np.concatenate([centers - sizes, centers + sizes], axis=2)
    scores = rng.uniform(0, 1, size=(b, n)).astype(np.float32)
    ldm = np.zeros((b, n, 10), np.float32)
    kw = dict(pre_topk=64, max_out=32, conf_thresh=0.3, iou_thresh=0.4)
    xla = nms_padded_batched(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(ldm),
        use_pallas=False, **kw)
    pls = nms_padded_batched(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(ldm),
        use_pallas=True, **kw)
    np.testing.assert_array_equal(np.asarray(xla["valid"]), np.asarray(pls["valid"]))
    np.testing.assert_allclose(np.asarray(xla["scores"]), np.asarray(pls["scores"]), rtol=1e-6)


def test_bilinear_border_pixel_exact():
    """Samples at/past the frame edge return the BORDER pixel (the old
    weight-vs-clamped-index mismatch returned the second-to-last one)."""
    import jax.numpy as jnp

    from frp_tpu.ops.align import _bilinear_sample

    w = 8
    frame = jnp.arange(w, dtype=jnp.float32)[None, :, None].repeat(4, axis=0)
    xs = jnp.array([[float(w - 1)], [float(w) + 1.5], [float(w - 2) + 0.25]])
    ys = jnp.zeros_like(xs)
    out = np.asarray(_bilinear_sample(frame, xs, ys))[..., 0]
    assert out[0, 0] == w - 1          # exactly the last column
    assert out[1, 0] == w - 1          # past the edge clamps, no extrapolation
    np.testing.assert_allclose(out[2, 0], w - 2 + 0.25, atol=1e-5)


def test_nms_zero_score_kept_box_stays_valid():
    """conf_thresh=0: a kept box whose score is exactly 0.0 must come out
    VALID (it already suppressed its neighbors); validity is keep-based,
    not score>0."""
    import jax.numpy as jnp

    from frp_tpu.ops.nms import nms_padded

    boxes = jnp.asarray([[10.0, 10, 50, 50], [200.0, 200, 240, 240]])
    scores = jnp.asarray([0.9, 0.0])  # disjoint boxes, one zero score
    ldm = jnp.zeros((2, 10))
    out = nms_padded(boxes, scores, ldm, pre_topk=2, max_out=4, conf_thresh=0.0)
    assert int(np.asarray(out["count"])) == 2
    assert np.asarray(out["valid"])[:2].all()


def test_fused_head_large_pre_topk_routes_to_xla():
    """pre_topk > 256 exceeds the kernel's exact bf16 rank range — it must
    take the XLA path (same results as nms reference), not corrupt slots."""
    import jax.numpy as jnp

    from frp_tpu.ops.anchors import generate_anchors
    from frp_tpu.ops.decode import decode_boxes, decode_landmarks
    from frp_tpu.ops.detection_pallas import fused_detection_head
    from frp_tpu.ops.nms import nms_padded_batched

    rng = np.random.default_rng(0)
    priors = jnp.asarray(generate_anchors(128))
    a = priors.shape[0]
    loc = jnp.asarray(rng.normal(size=(1, a, 4)).astype(np.float32) * 0.1)
    ldm = jnp.asarray(rng.normal(size=(1, a, 10)).astype(np.float32) * 0.1)
    scores = jnp.asarray(rng.uniform(size=(1, a)).astype(np.float32))
    out = fused_detection_head(
        loc, ldm, scores, priors, pre_topk=512, max_out=8,
        conf_thresh=0.9, image_size=128.0,
    )
    ref = nms_padded_batched(
        decode_boxes(loc, priors, 128.0), scores,
        decode_landmarks(ldm, priors, 128.0),
        pre_topk=512, max_out=8, conf_thresh=0.9,
    )
    np.testing.assert_array_equal(np.asarray(out["valid"]), np.asarray(ref["valid"]))
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), np.asarray(ref["boxes"]), atol=1e-4
    )
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        fused_detection_head(
            loc, ldm, scores, priors, pre_topk=512, max_out=8,
            conf_thresh=0.9, image_size=128.0, use_pallas=True,
        )


def test_fedavg_empty_updates_raise_fedavg_error():
    import pytest as _pytest

    from frp_tpu.ops.fedavg import FedAvgError, check_layer_consistency

    with _pytest.raises(FedAvgError):
        check_layer_consistency({})


def test_nms_iom_collapses_nested_duplicates():
    """Intersection-over-min-area suppression (the closeup enroll fix): a
    shifted undersized duplicate whose IoU with the main box is below the
    IoU threshold but whose area mostly nests inside it must be suppressed;
    a genuinely separate face must survive; iom_thresh=0 restores the old
    pure-IoU behavior."""
    boxes = np.array(
        [
            [100, 100, 300, 340],   # main face
            [130, 150, 230, 260],   # nested part-box: IoU ~0.23, IoM 1.0
            [400, 100, 520, 240],   # separate second face
        ],
        np.float32,
    )
    scores = np.array([0.99, 0.8, 0.95], np.float32)
    ldm = np.zeros((3, 10), np.float32)
    out = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(ldm),
        pre_topk=3, max_out=4, conf_thresh=0.5, iou_thresh=0.4,
    )
    kept = np.asarray(out["boxes"])[np.asarray(out["valid"])]
    assert int(out["count"]) == 2
    np.testing.assert_allclose(np.sort(kept[:, 0]), [100, 400])

    out_pure = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(ldm),
        pre_topk=3, max_out=4, conf_thresh=0.5, iou_thresh=0.4,
        iom_thresh=0.0,
    )
    assert int(out_pure["count"]) == 3  # old behavior kept the duplicate
