"""Synthetic face-scene generation for detector/embedder bootstrap training.

Channel convention: scenes are RGB (the pipeline's on-device convention).
Camera-like sources must deliver BGR and let the batching layer flip it.

No face dataset ships with this repo (zero-egress build), so the demo and
test weights are trained on procedurally rendered "faces": a skin-tone
ellipse head with two dark eyes, a nose point and a mouth bar over textured
background — enough signal for RetinaFace to learn localization + 5-point
landmarks, making the live demo loop (synthetic cameras -> detect -> track ->
alert) produce real positives. Production deployments fine-tune on real data
through the same DetectorTrainer.
"""

from __future__ import annotations

import numpy as np


def make_identity(seed: int) -> dict:
    """Stable per-person render parameters — the 'identity' an embedder can
    learn to separate: skin tone + facial geometry ratios."""
    rng = np.random.default_rng(seed)
    return {
        "skin": np.array(
            [rng.integers(140, 230), rng.integers(100, 190), rng.integers(80, 170)]
        ),
        "eye_dx": float(rng.uniform(0.13, 0.23)),
        "eye_dy": float(rng.uniform(0.08, 0.16)),
        "eye_r": float(rng.uniform(0.035, 0.065)),
        "eye_color": np.array([rng.integers(10, 60)] * 2 + [rng.integers(20, 90)]),
        "mouth_w": float(rng.uniform(0.09, 0.17)),
        "mouth_y": float(rng.uniform(0.18, 0.26)),
        "mouth_color": np.array(
            [rng.integers(40, 90), rng.integers(20, 60), rng.integers(80, 150)]
        ),
        "head_ax": float(rng.uniform(0.38, 0.46)),
        "head_ay": float(rng.uniform(0.50, 0.60)),
    }


def render_face(canvas: np.ndarray, cx, cy, size, rng, identity: dict | None = None):
    """Draw one synthetic face; returns (bbox xyxy px, landmarks 10 px).
    With ``identity`` (see make_identity) the face is person-stable; otherwise
    colors come from ``rng`` with the standard geometry."""
    h, w = canvas.shape[:2]
    ident = identity or {}
    ax = size * ident.get("head_ax", 0.42)
    ay = size * ident.get("head_ay", 0.55)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    mask = ((xx - cx) / ax) ** 2 + ((yy - cy) / ay) ** 2 <= 1.0
    skin = ident.get(
        "skin",
        np.array([rng.integers(150, 220), rng.integers(110, 180), rng.integers(90, 160)]),
    )
    canvas[mask] = (0.8 * skin + 0.2 * canvas[mask]).astype(np.uint8)

    def blob(bx, by, r, color):
        m = (xx - bx) ** 2 + (yy - by) ** 2 <= r * r
        canvas[m] = color

    eye_dx = size * ident.get("eye_dx", 0.18)
    eye_dy = size * ident.get("eye_dy", 0.12)
    eye_r = max(1.5, size * ident.get("eye_r", 0.05))
    eye_color = ident.get("eye_color", (30, 30, 40))
    mouth_w = ident.get("mouth_w", 0.13)
    mouth_y = ident.get("mouth_y", 0.22)
    mouth_color = ident.get("mouth_color", (60, 40, 120))
    le = (cx - eye_dx, cy - eye_dy)
    re = (cx + eye_dx, cy - eye_dy)
    nose = (cx, cy + size * 0.05)
    ml = (cx - size * mouth_w * 0.92, cy + size * mouth_y)
    mr = (cx + size * mouth_w * 0.92, cy + size * mouth_y)
    blob(*le, eye_r, eye_color)
    blob(*re, eye_r, eye_color)
    blob(*nose, max(1.0, size * 0.03), (110, 80, 80))
    mouth = (np.abs(xx - cx) <= size * mouth_w) & (
        np.abs(yy - (cy + size * mouth_y)) <= max(1.0, size * 0.025)
    )
    canvas[mouth] = mouth_color

    box = [cx - ax, cy - ay, cx + ax, cy + ay]
    ldm = [*le, *re, *nose, *ml, *mr]
    return box, ldm


def make_identity_crop(identity: dict, rng, size: int = 112) -> np.ndarray:
    """A 112x112 aligned-style crop of one identity with nuisance variation
    (background, lighting jitter, sub-pixel position/scale) — ArcFace
    training samples. Returns RGB uint8."""
    canvas = rng.integers(20, 110, (size, size, 3), dtype=np.uint8)
    cx = size / 2 + float(rng.uniform(-4, 4))
    cy = size / 2 + float(rng.uniform(-4, 4))
    fsize = size * float(rng.uniform(0.82, 1.0))
    render_face(canvas, cx, cy, fsize, rng, identity)
    # lighting jitter
    gain = float(rng.uniform(0.8, 1.2))
    bias = float(rng.uniform(-15, 15))
    return np.clip(canvas.astype(np.float32) * gain + bias, 0, 255).astype(np.uint8)


def make_scene(size: int, rng, max_faces: int = 3):
    """One training scene. Returns (image [S,S,3] uint8, boxes [G,4] norm,
    ldm [G,10] norm, valid [G]) with G = max_faces padding."""
    img = rng.integers(20, 120, size=(size, size, 3), dtype=np.uint8)
    # background clutter
    for _ in range(rng.integers(2, 6)):
        x0, y0 = rng.integers(0, size, 2)
        wdt, hgt = rng.integers(5, size // 3, 2)
        img[y0 : y0 + hgt, x0 : x0 + wdt] = rng.integers(0, 255, 3)

    # 20% of scenes are face-free negatives — without them the detector
    # hallucinates extra boxes on background texture
    n = 0 if rng.random() < 0.2 else int(rng.integers(1, max_faces + 1))
    boxes = np.zeros((max_faces, 4), np.float32)
    ldms = np.zeros((max_faces, 10), np.float32)
    valid = np.zeros((max_faces,), bool)
    placed = []
    for k in range(n):
        fsize = float(rng.uniform(size * 0.12, size * 0.4))
        for _ in range(10):  # rejection-sample non-overlapping placement
            cx = float(rng.uniform(fsize * 0.6, size - fsize * 0.6))
            cy = float(rng.uniform(fsize * 0.7, size - fsize * 0.7))
            if all(abs(cx - px) + abs(cy - py) > fsize + ps for px, py, ps in placed):
                break
        else:
            continue
        placed.append((cx, cy, fsize))
        box, ldm = render_face(img, cx, cy, fsize, rng)
        boxes[k] = np.asarray(box, np.float32) / size
        ldms[k] = np.asarray(ldm, np.float32) / size
        valid[k] = True
    return img, boxes, ldms, valid


def make_batch(batch: int, size: int, rng, max_faces: int = 3):
    """Half the batch renders at 1.5-2x and downsamples — cameras deliver
    resampled (softened) frames through the letterbox path, and a detector
    trained only on crisp native-res renders fails on them (measured: score
    0.995 native vs 0.007 after bilinear downscale before this augmentation).
    """
    imgs, boxes, ldms, valids = [], [], [], []
    for k in range(batch):
        scale = 1.0 if k % 2 == 0 else float(rng.uniform(1.5, 2.0))
        render = int(size * scale)
        i, b, l, v = make_scene(render, rng, max_faces)
        if render != size:
            i = _resize_bilinear(i, size)
        imgs.append(i)
        boxes.append(b)   # normalized coords are scale-invariant
        ldms.append(l)
        valids.append(v)
    return (
        np.stack(imgs).astype(np.float32),
        np.stack(boxes),
        np.stack(ldms),
        np.stack(valids),
    )


def _resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
    except ImportError:
        # real 2x2 box average, not nearest subsampling: the downsample's
        # SOFTNESS is the augmentation signal (a detector trained on crisp
        # renders scores ~0.007 on resampled frames) — nearest picks crisp
        # pixels and silently turns the augmentation into a no-op
        yi = np.clip(np.linspace(0, img.shape[0] - 2, size), 0, None)
        xi = np.clip(np.linspace(0, img.shape[1] - 2, size), 0, None)
        y0, x0 = yi.astype(np.int64), xi.astype(np.int64)
        acc = (
            img[y0][:, x0].astype(np.float32)
            + img[y0 + 1][:, x0]
            + img[y0][:, x0 + 1]
            + img[y0 + 1][:, x0 + 1]
        )
        return (acc / 4.0).astype(img.dtype)
