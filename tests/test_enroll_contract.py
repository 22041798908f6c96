"""Enroll-upload contract: ONE closeup face must yield ONE detection.

Regression for the round-3 closeup bug: a detector trained only at det 320
pixel scales (faces <= 240 px) fragments a 300-530 px letterboxed portrait
into 4-16 shifted part-boxes with pairwise IoU below any usable NMS
threshold, which breaks `/face/upload`'s single-face contract (reference
face.py upload semantics: one face per enrollment photo, the same behavior
dlib/InsightFace give the reference). Fixed by (a) intersection-over-min-area
suppression in every NMS path (ops/nms.py overlap_matrix,
ops/detection_pallas.py) and (b) training at serving pixel scale with
portrait scenes (train/synthetic.py make_scene(portrait=True),
tools/pretrain_synthetic.py --det-size 640 --portrait-frac).

Uses the SHIPPED weights at the production det size — this is an accuracy
property of the released checkpoint, like tests/test_parity.py.
"""

import numpy as np
import pytest

from frp_tpu.config import load_config
from frp_tpu.engine.pipeline import RecognitionEngine
from frp_tpu.train.synthetic import make_identity, render_face


@pytest.fixture(scope="module")
def engine():
    eng = RecognitionEngine(load_config(det_size=640, max_faces_per_frame=16))
    if eng.weights_loaded.get("detector") is None:
        pytest.skip("shipped detector weights not present")
    return eng


def _closeup(seed: int, flat_bg: bool, size: int = 480) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if flat_bg:  # plain-wall enrollment photo
        img = np.full((size, size, 3), int(rng.integers(40, 200)), np.uint8)
    else:  # textured background with clutter
        img = rng.integers(20, 120, size=(size, size, 3), dtype=np.uint8)
        for _ in range(rng.integers(2, 6)):
            x0, y0 = rng.integers(0, size, 2)
            w, h = rng.integers(5, size // 3, 2)
            img[y0:y0 + h, x0:x0 + w] = rng.integers(0, 255, 3)
    ident = make_identity(int(rng.integers(1 << 30)))
    fs = float(rng.uniform(size * 0.5, size * 0.75))
    render_face(img, size / 2, size / 2, fs, rng, identity=ident)
    return img


@pytest.mark.slow  # >=15 s measured; see pytest.ini
def test_closeup_portrait_detects_exactly_one(engine):
    counts = [
        len(engine.encode_image(_closeup(8600 + s, flat_bg=bool(s % 2))))
        for s in range(5)
    ]
    assert all(c >= 1 for c in counts), f"missed closeup face: {counts}"
    # allow one scene a stray duplicate so a future retrain with a hairline
    # regression fails loudly but a single unlucky draw does not flake CI
    assert sum(1 for c in counts if c == 1) >= 4, (
        f"closeup duplicate boxes are back (counts={counts}); see module "
        "docstring for the NMS + training-scale fix")


def test_surveillance_scene_recall_intact(engine):
    # the closeup fix must not cost crowded-scene recall (bench geometry:
    # 12 faces at 150-240 px on a 1080p frame)
    rng = np.random.default_rng(4200)
    rgb = rng.integers(20, 110, size=(1080, 1920, 3), dtype=np.uint8)
    n = 0
    for gy in range(3):
        for gx in range(4):
            render_face(rgb, gx * 480 + 240, gy * 360 + 180,
                        float(rng.uniform(150, 240)), rng)
            n += 1
    assert len(engine.encode_image(rgb)) == n


def test_overlapping_distinct_faces_both_survive(engine):
    """The IoM suppression term must not delete a genuinely distinct
    smaller face that partially overlaps a larger one (near/far subjects).
    Boxes here overlap ~25-35% of the smaller face's area — above the IoU
    threshold's reach but below the 0.5 IoM default."""
    rng = np.random.default_rng(77)
    img = rng.integers(20, 120, size=(720, 1280, 3), dtype=np.uint8)
    # large near face and a smaller face shifted so bodies overlap partially
    render_face(img, 540, 360, 340.0, rng, identity=make_identity(1))
    render_face(img, 800, 300, 170.0, rng, identity=make_identity(2))
    faces = engine.encode_image(img)
    assert len(faces) == 2, [
        ([round(v) for v in f["box"]], round(f["score"], 2)) for f in faces
    ]
