"""Snapshot enhancer — bicubic upscale (capped 4 MP) + unsharp mask + JPEG
re-encode, reference ``backend/app/services/enhancer.py:49-89`` semantics.
Pillow when present, cv2 fallback, no-op otherwise.
"""

from __future__ import annotations

import io

from frp_tpu.utils.logger import get_logger

logger = get_logger("frp.platform.enhancer")

MAX_PIXELS = 4_000_000
UPSCALE = 2
JPEG_QUALITY = 85


def enhance_snapshot_bytes(data: bytes) -> bytes | None:
    """Returns enhanced JPEG bytes, or None when no enhancement is possible."""
    try:
        from PIL import Image, ImageFilter

        img = Image.open(io.BytesIO(data)).convert("RGB")
        w, h = img.size
        scale = UPSCALE
        if w * h * scale * scale > MAX_PIXELS:
            scale = max(1.0, (MAX_PIXELS / (w * h)) ** 0.5)
        if scale > 1.0:
            img = img.resize(
                (int(w * scale), int(h * scale)), Image.Resampling.BICUBIC
            )
        img = img.filter(ImageFilter.UnsharpMask(radius=2, percent=120, threshold=2))
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=JPEG_QUALITY)
        return buf.getvalue()
    except ImportError:
        pass
    except Exception:
        logger.exception("PIL enhancement failed")
        return None
    try:
        import cv2
        import numpy as np

        arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if arr is None:
            return None
        h, w = arr.shape[:2]
        scale = UPSCALE if w * h * 4 <= MAX_PIXELS else max(1.0, (MAX_PIXELS / (w * h)) ** 0.5)
        if scale > 1.0:
            arr = cv2.resize(arr, (int(w * scale), int(h * scale)), interpolation=cv2.INTER_CUBIC)
        blur = cv2.GaussianBlur(arr, (0, 0), 2)
        sharp = cv2.addWeighted(arr, 1.0 + 1.2, blur, -1.2, 0)
        ok, buf = cv2.imencode(".jpg", sharp, [cv2.IMWRITE_JPEG_QUALITY, JPEG_QUALITY])
        return buf.tobytes() if ok else None
    except Exception:
        logger.exception("cv2 enhancement failed")
        return None
