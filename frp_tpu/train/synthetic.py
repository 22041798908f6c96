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

# ---------------------------------------------------------------------------
# difficulty tiers (round-3 domain widening)
# ---------------------------------------------------------------------------
# Tier 0 is the round-2 domain (near-frontal, clean light). Tiers 1/2 add the
# nuisances the reference's real-world models face (pose to +-60 deg yaw,
# partial occlusion, backlight/low light, motion blur) so threshold-transfer
# claims are measured beyond the easy distribution (VERDICT r2 weak #2).
# Angles in degrees, occ = max face-area fraction occluded, gain = lighting
# gain range, blur = max motion-blur length px, backlit_p = probability of a
# strong illumination gradient across the scene.
TIERS = {
    0: dict(yaw=15, pitch=8, roll=6, occ=0.0, gain=(0.8, 1.2), blur=0,
            backlit_p=0.0),
    1: dict(yaw=35, pitch=22, roll=14, occ=0.15, gain=(0.5, 1.25), blur=3,
            backlit_p=0.25),
    2: dict(yaw=60, pitch=40, roll=22, occ=0.30, gain=(0.25, 1.3), blur=7,
            backlit_p=0.45),
    # tier 3 (round-4 widening): codec degradation — real camera streams
    # arrive JPEG/H.264-compressed with sensor read noise. Pose kept at
    # tier-1 level so the eval attributes its degradation to the
    # compression axis, not to harder pose. jpeg = quality range,
    # noise = Gaussian sigma range (uint8 domain).
    3: dict(yaw=35, pitch=22, roll=14, occ=0.15, gain=(0.5, 1.25), blur=3,
            backlit_p=0.25, jpeg=(30, 75), noise=(2.0, 6.0)),
}
# training mix over tiers — mostly easy/moderate so bootstrap capacity is
# spent where serving traffic lives, with enough hard-tier exposure to learn
# the invariances (tier 3's 10% teaches compression robustness)
TIER_MIX = (0.40, 0.32, 0.18, 0.10)


def sample_pose(rng, tier: int):
    """(yaw, pitch, roll) radians drawn for a difficulty tier."""
    t = TIERS[tier]
    d = np.pi / 180.0
    return (
        float(rng.uniform(-t["yaw"], t["yaw"])) * d,
        float(rng.uniform(-t["pitch"], t["pitch"])) * d,
        float(rng.uniform(-t["roll"], t["roll"])) * d,
    )


def _pick_tier(rng, difficulty):
    """None -> tier-0-compatible frontal render (no pose machinery at all,
    byte-identical to the round-2 renderer); int -> that tier; "mix" ->
    sampled from TIER_MIX; a sequence of floats -> sampled from that custom
    tier distribution (hard-biased fine-tunes: pretrain_embedder
    --difficulty 0.15,0.25,0.45,0.15)."""
    if difficulty is None:
        return None
    if difficulty == "mix":
        return int(rng.choice(len(TIER_MIX), p=TIER_MIX))
    if isinstance(difficulty, (tuple, list, np.ndarray)):
        p = np.asarray(difficulty, dtype=np.float64)
        assert p.shape == (len(TIER_MIX),) and abs(p.sum() - 1.0) < 1e-6, (
            f"custom tier mix must be {len(TIER_MIX)} probabilities summing "
            f"to 1, got {difficulty!r}")
        return int(rng.choice(len(p), p=p))
    return int(difficulty)


def apply_photometric(img: np.ndarray, rng, tier: int) -> np.ndarray:
    """Scene-level lighting + motion blur for a difficulty tier. Returns a
    new uint8 array; geometry (boxes/landmarks) is unaffected."""
    t = TIERS[tier]
    out = img.astype(np.float32)
    if t["backlit_p"] > 0 and rng.random() < t["backlit_p"]:
        # backlight / hard side-light: linear illumination ramp across the
        # frame, up to ~4x contrast between the bright and dark edge
        h, w = out.shape[:2]
        theta = float(rng.uniform(0, 2 * np.pi))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        proj = (xx * np.cos(theta) + yy * np.sin(theta))
        proj = (proj - proj.min()) / max(proj.max() - proj.min(), 1e-6)
        lo = float(rng.uniform(0.25, 0.6))
        out *= (lo + (1.0 - lo) * proj)[..., None]
    gain = float(rng.uniform(*t["gain"]))
    bias = float(rng.uniform(-18, 18))
    out = out * gain + bias
    blur_len = int(rng.integers(0, t["blur"] + 1)) if t["blur"] else 0
    if blur_len >= 2:
        out = _motion_blur(out, blur_len, float(rng.uniform(0, np.pi)))
    noise = t.get("noise")
    if noise:
        sigma = float(rng.uniform(*noise))
        out = out + rng.normal(0.0, sigma, out.shape).astype(np.float32)
    img8 = np.clip(out, 0, 255).astype(np.uint8)
    jq = t.get("jpeg")
    if jq:
        img8 = jpeg_roundtrip(img8, int(rng.integers(jq[0], jq[1] + 1)))
    return img8


def jpeg_roundtrip(rgb: np.ndarray, quality: int) -> np.ndarray:
    """Encode-decode through JPEG at the given quality (the codec
    degradation real camera streams carry). No-op without cv2."""
    try:
        import cv2
    except ImportError:
        return rgb
    ok, buf = cv2.imencode(
        ".jpg", np.ascontiguousarray(rgb[..., ::-1]),
        [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)],
    )
    if not ok:
        return rgb
    dec = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    return np.ascontiguousarray(dec[..., ::-1])


def _motion_blur(img: np.ndarray, length: int, angle: float) -> np.ndarray:
    """Average `length` copies shifted along `angle` (camera/subject motion).
    Pure-numpy edge-clamped shifts — no cv2 dependency."""
    acc = np.zeros_like(img, np.float32)
    for k in range(length):
        f = k - (length - 1) / 2.0
        dy, dx = int(round(f * np.sin(angle))), int(round(f * np.cos(angle)))
        shifted = np.roll(img, (dy, dx), axis=(0, 1))
        # clamp the wrapped edges to the border rows/cols instead
        if dy > 0:
            shifted[:dy] = shifted[dy : dy + 1]
        elif dy < 0:
            shifted[dy:] = shifted[dy - 1 : dy]
        if dx > 0:
            shifted[:, :dx] = shifted[:, dx : dx + 1]
        elif dx < 0:
            shifted[:, dx:] = shifted[:, dx - 1 : dx]
        acc += shifted
    return acc / length


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


def render_face(
    canvas: np.ndarray, cx, cy, size, rng,
    identity: dict | None = None,
    pose: tuple | None = None,
    occlusion: float = 0.0,
):
    """Draw one synthetic face; returns (bbox xyxy px, landmarks 10 px).

    With ``identity`` (see make_identity) the face is person-stable; otherwise
    colors come from ``rng`` with the standard geometry. ``pose`` is
    (yaw, pitch, roll) radians: features are placed by projecting their 3-D
    head offsets (eyes/nose/mouth protrude from the head sphere, so yaw slides
    them toward the turn direction and foreshortens lateral spacing — the same
    geometry a rotated real head projects to). ``occlusion`` > 0 covers that
    fraction of the face box with an opaque patch (scarf/pole/hand stand-in);
    landmarks still report the unoccluded positions, as real annotations do.
    ``pose=None`` is byte-identical to the round-2 frontal renderer."""
    h, w = canvas.shape[:2]
    ident = identity or {}
    yaw, pitch, roll = pose if pose is not None else (0.0, 0.0, 0.0)
    cyaw, cpitch = np.cos(yaw), np.cos(pitch)
    sroll, croll = np.sin(roll), np.cos(roll)
    ax = size * ident.get("head_ax", 0.42) * (0.70 + 0.30 * cyaw)
    ay = size * ident.get("head_ay", 0.55) * (0.88 + 0.12 * cpitch)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # head ellipse in roll-rotated coordinates
    u = (xx - cx) * croll + (yy - cy) * sroll
    v = -(xx - cx) * sroll + (yy - cy) * croll
    mask = (u / ax) ** 2 + (v / ay) ** 2 <= 1.0
    skin = ident.get(
        "skin",
        np.array([rng.integers(150, 220), rng.integers(110, 180), rng.integers(90, 160)]),
    )
    canvas[mask] = (0.8 * skin + 0.2 * canvas[mask]).astype(np.uint8)

    def project(x_off, y_off, depth):
        """3-D feature offset -> screen position under (yaw, pitch, roll)."""
        px = x_off * cyaw + depth * np.sin(yaw)
        py = y_off * cpitch - depth * np.sin(pitch)
        return (cx + px * croll - py * sroll, cy + px * sroll + py * croll)

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
    z_eye, z_nose, z_mouth = size * 0.22, size * 0.40, size * 0.26
    le = project(-eye_dx, -eye_dy, z_eye)
    re = project(eye_dx, -eye_dy, z_eye)
    nose = project(0.0, size * 0.05, z_nose)
    ml = project(-size * mouth_w * 0.92, size * mouth_y, z_mouth)
    mr = project(size * mouth_w * 0.92, size * mouth_y, z_mouth)
    blob(*le, eye_r, eye_color)
    blob(*re, eye_r, eye_color)
    blob(*nose, max(1.0, size * 0.03), (110, 80, 80))
    mc = project(0.0, size * mouth_y, z_mouth)
    um = (xx - mc[0]) * croll + (yy - mc[1]) * sroll
    vm = -(xx - mc[0]) * sroll + (yy - mc[1]) * croll
    mouth = (np.abs(um) <= size * mouth_w * cyaw) & (
        np.abs(vm) <= max(1.0, size * 0.025)
    )
    canvas[mouth] = mouth_color

    # bbox of the rotated head ellipse
    bx = float(np.sqrt((ax * croll) ** 2 + (ay * sroll) ** 2))
    by = float(np.sqrt((ax * sroll) ** 2 + (ay * croll) ** 2))
    box = [cx - bx, cy - by, cx + bx, cy + by]
    ldm = [*le, *re, *nose, *ml, *mr]

    if occlusion > 0.0:
        frac = float(rng.uniform(0.4, 1.0)) * occlusion
        area = (2 * bx) * (2 * by) * frac
        aspect = float(rng.uniform(0.3, 3.0))
        ow = max(2.0, np.sqrt(area * aspect))
        oh = max(2.0, area / ow)
        ox = float(rng.uniform(cx - bx, cx + bx - ow * 0.5))
        oy = float(rng.uniform(cy - by, cy + by - oh * 0.5))
        x0, x1 = max(0, int(ox)), min(w, int(ox + ow))
        y0, y1 = max(0, int(oy)), min(h, int(oy + oh))
        if x1 > x0 and y1 > y0:
            shade = rng.integers(0, 90) if rng.random() < 0.7 else rng.integers(160, 255)
            canvas[y0:y1, x0:x1] = np.clip(
                int(shade) + rng.integers(-15, 16, 3), 0, 255
            ).astype(np.uint8)
    return box, ldm


def make_identity_crop(
    identity: dict, rng, size: int = 112, difficulty=None
) -> np.ndarray:
    """A 112x112 aligned-style crop of one identity with nuisance variation
    (background, lighting jitter, sub-pixel position/scale) — ArcFace
    training samples. Returns RGB uint8. ``difficulty`` (None | tier int |
    "mix") adds pose / occlusion / photometric nuisances per TIERS; None is
    the round-2 behavior."""
    canvas = rng.integers(20, 110, (size, size, 3), dtype=np.uint8)
    cx = size / 2 + float(rng.uniform(-4, 4))
    cy = size / 2 + float(rng.uniform(-4, 4))
    fsize = size * float(rng.uniform(0.82, 1.0))
    tier = _pick_tier(rng, difficulty)
    if tier is None:
        render_face(canvas, cx, cy, fsize, rng, identity)
        gain = float(rng.uniform(0.8, 1.2))
        bias = float(rng.uniform(-15, 15))
        return np.clip(
            canvas.astype(np.float32) * gain + bias, 0, 255
        ).astype(np.uint8)
    occ = TIERS[tier]["occ"]
    render_face(
        canvas, cx, cy, fsize, rng, identity,
        pose=sample_pose(rng, tier),
        occlusion=occ if (occ and rng.random() < 0.5) else 0.0,
    )
    return apply_photometric(canvas, rng, tier)


def make_serving_crop(
    identity: dict, rng, size: int = 112, difficulty=None,
    lm_noise_px: float = 2.2,
) -> np.ndarray:
    """A 112x112 training crop that matches the SERVING distribution instead
    of the pristine 112-render distribution: the face is rendered at scene
    scale (170-240 px, as 1080p surveillance frames carry), the tier's
    photometric nuisance (backlight gradient, motion blur) is applied at
    that scale, the canvas is decimated by the serving letterbox ratio
    (1080p -> det 640 = 1/3, mixed area/linear like the detector's
    augmentation), and the crop is the GT-landmark similarity warp with
    detector-grade landmark jitter (~2.2 px at det scale; the measured
    serving mean is 6.65 px at 640 for the whole 5-point set —
    benchmarks/e2e_gap_profile.json).

    Why: tier-2 e2e TPR trails crop TPR by ~0.14 and the gap diagnostic
    attributes it to scene-scale photometrics the 112-render crops never
    exhibit (tools/diagnose_e2e_gap.py). Training on this distribution
    teaches the invariance where serving actually operates. Requires cv2
    for the warp; falls back to make_identity_crop without it."""
    try:
        import cv2
    except ImportError:
        return make_identity_crop(identity, rng, size=size, difficulty=difficulty)
    from frp_tpu.ops.align import ARCFACE_TEMPLATE_112

    tier = _pick_tier(rng, difficulty)
    fsize = float(rng.uniform(170, 240))
    canvas_hw = int(fsize * float(rng.uniform(1.5, 1.9)))
    canvas = rng.integers(20, 110, (canvas_hw, canvas_hw, 3), dtype=np.uint8)
    kw = {}
    if tier is not None:
        occ = TIERS[tier]["occ"]
        kw = dict(
            pose=sample_pose(rng, tier),
            occlusion=occ if (occ and rng.random() < 0.5) else 0.0,
        )
    _box, lm10 = render_face(
        canvas,
        canvas_hw / 2 + float(rng.uniform(-8, 8)),
        canvas_hw / 2 + float(rng.uniform(-8, 8)),
        fsize, rng, identity, **kw,
    )
    if tier is not None:
        canvas = apply_photometric(canvas, rng, tier)
    # serving letterbox decimation: 1080p -> det 640 is a uniform 1/3
    s = 1.0 / 3.0
    dec = int(round(canvas_hw * s))
    canvas = _resize_bilinear(canvas, dec, linear=bool(rng.random() < 0.5))
    lm = np.asarray(lm10, np.float32).reshape(5, 2) * (dec / canvas_hw)
    lm = lm + rng.normal(0.0, lm_noise_px, size=lm.shape).astype(np.float32)
    # host similarity warp (same LSQ as ops.align.similarity_transform)
    dst = np.asarray(ARCFACE_TEMPLATE_112, np.float32) * (size / 112.0)
    mu_s, mu_d = lm.mean(0), dst.mean(0)
    sc, dc = lm - mu_s, dst - mu_d
    var_s = max(float((sc * sc).sum()), 1e-12)
    a = float((sc * dc).sum()) / var_s
    b = float((sc[:, 0] * dc[:, 1] - sc[:, 1] * dc[:, 0]).sum()) / var_s
    rot = np.array([[a, -b], [b, a]], np.float32)
    t = mu_d - rot @ mu_s
    m = np.concatenate([rot, t[:, None]], axis=1)
    return cv2.warpAffine(canvas, m, (size, size), flags=cv2.INTER_LINEAR)


def make_scene(size: int, rng, max_faces: int = 3, difficulty=None,
               portrait: bool = False):
    """One training scene. Returns (image [S,S,3] uint8, boxes [G,4] norm,
    ldm [G,10] norm, valid [G]) with G = max_faces padding. ``difficulty``
    (None | tier int | "mix") adds pose/occlusion/lighting/blur per TIERS;
    None renders the round-2 frontal domain unchanged. ``portrait`` forces
    the enroll-upload shape: exactly one face at 0.45-0.75 of the square,
    plain background half the time (closeup-localization training)."""
    tier = _pick_tier(rng, difficulty)
    # 25% plain backgrounds (flat wall / soft gradient): the enroll-upload
    # domain. Trained only on noise+clutter, the detector emits clusters of
    # shifted undersized duplicates on a flat-background portrait (measured:
    # 4-16 boxes for one face) — plain scenes teach localization without
    # texture anchoring.
    plain = rng.random() < (0.5 if portrait else 0.25)
    if plain:
        base = int(rng.integers(25, 215))
        img = np.full((size, size, 3), base, np.uint8)
        if rng.random() < 0.5:  # soft vertical illumination gradient
            g = np.linspace(
                0, float(rng.uniform(-40, 40)), size, dtype=np.float32
            )[:, None, None]
            img = np.clip(img.astype(np.float32) + g, 0, 255).astype(np.uint8)
    else:
        img = rng.integers(20, 120, size=(size, size, 3), dtype=np.uint8)
    # background clutter (plain scenes stay mostly clean — at most one patch)
    for _ in range(rng.integers(0, 2) if plain else rng.integers(2, 6)):
        x0, y0 = rng.integers(0, size, 2)
        wdt, hgt = rng.integers(5, size // 3, 2)
        img[y0 : y0 + hgt, x0 : x0 + wdt] = rng.integers(0, 255, 3)

    # 20% of scenes are face-free negatives — without them the detector
    # hallucinates extra boxes on background texture
    if portrait:
        n = 1
    else:
        n = 0 if rng.random() < 0.2 else int(rng.integers(1, max_faces + 1))
    boxes = np.zeros((max_faces, 4), np.float32)
    ldms = np.zeros((max_faces, 10), np.float32)
    valid = np.zeros((max_faces,), bool)
    placed = []
    for k in range(n):
        # single-face scenes span up to closeup-portrait scale (enroll
        # uploads letterbox a mostly-face photo to the det square — round-3
        # probe: the 0.12-0.4 training cap made 300px+ faces miss or
        # double-detect); crowded scenes keep the surveillance range
        hi = 0.75 if n == 1 else 0.4
        if n == 1 and (portrait or rng.random() < 0.4):
            # portrait band oversampled: uniform(0.12, 0.75) gives closeups
            # only ~40% of single-face scenes and the 300px+ regression stays
            # sloppy (shifted duplicate clusters; see the plain-bg note above)
            fsize = float(rng.uniform(size * 0.45, size * hi))
        else:
            fsize = float(rng.uniform(size * 0.12, size * hi))
        for _ in range(10):  # rejection-sample non-overlapping placement
            # closeup faces can invert the placement band (0.7*fsize >
            # size - 0.7*fsize); order the bounds so the center just sits
            # in the middle band instead of raising
            x_lo, x_hi = sorted((fsize * 0.6, size - fsize * 0.6))
            y_lo, y_hi = sorted((fsize * 0.7, size - fsize * 0.7))
            cx = float(rng.uniform(x_lo, x_hi))
            cy = float(rng.uniform(y_lo, y_hi))
            if all(abs(cx - px) + abs(cy - py) > fsize + ps for px, py, ps in placed):
                break
        else:
            continue
        placed.append((cx, cy, fsize))
        if tier is None:
            box, ldm = render_face(img, cx, cy, fsize, rng)
        else:
            occ = TIERS[tier]["occ"]
            box, ldm = render_face(
                img, cx, cy, fsize, rng,
                pose=sample_pose(rng, tier),
                occlusion=occ if (occ and rng.random() < 0.5) else 0.0,
            )
        boxes[k] = np.asarray(box, np.float32) / size
        ldms[k] = np.asarray(ldm, np.float32) / size
        valid[k] = True
    if tier is not None:
        img = apply_photometric(img, rng, tier)
    return img, boxes, ldms, valid


def make_batch(batch: int, size: int, rng, max_faces: int = 3, difficulty=None,
               portrait_frac: float = 0.0):
    """Half the batch renders at 1.5-2x and downsamples — cameras deliver
    resampled (softened) frames through the letterbox path, and a detector
    trained only on crisp native-res renders fails on them (measured: score
    0.995 native vs 0.007 after bilinear downscale before this augmentation).
    ``difficulty`` flows to make_scene (None | tier | "mix");
    ``portrait_frac`` is the fraction of scenes forced to the single-face
    closeup enroll shape (make_scene portrait=True).
    """
    imgs, boxes, ldms, valids = [], [], [], []
    for k in range(batch):
        # up to 3x: serving letterboxes 1080p -> det 640 at scale 1/3, so the
        # augmentation must cover that decimation ratio (with both area and
        # linear kernels, below) or landmark localization degrades on the
        # aliased serving input
        scale = 1.0 if k % 2 == 0 else float(rng.uniform(1.5, 3.0))
        render = int(size * scale)
        i, b, l, v = make_scene(render, rng, max_faces, difficulty=difficulty,
                                portrait=bool(rng.random() < portrait_frac))
        if render != size:
            # alternate box-filter and bilinear decimation: serving letterboxes
            # with INTER_LINEAR by default (throughput) but can be switched to
            # INTER_AREA — the detector must be scale-robust to both
            i = _resize_bilinear(i, size, linear=bool(rng.random() < 0.5))
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


def _resize_bilinear(img: np.ndarray, size: int, linear: bool = False) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(
            img, (size, size),
            interpolation=cv2.INTER_LINEAR if linear else cv2.INTER_AREA,
        )
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
