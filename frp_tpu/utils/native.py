"""ctypes bindings for the native C++ components (no pybind11 in the image).

``framepack``: fused letterbox + BGR->I420 batch packer
(native/framepack.cpp). Loads a prebuilt ``libframepack.so`` next to the
source, builds it with g++ on first use when a toolchain is present, and
reports unavailable otherwise — callers fall back to the cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from frp_tpu.utils.logger import get_logger

logger = get_logger("frp.utils.native")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframepack.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "framepack.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    if not os.path.exists(_SRC_PATH):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH,
             "-lpthread"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.info("framepack build unavailable (%s); using cv2 path", e)
        return False


def get_framepack():
    """Returns the loaded library handle or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            try:
                lib.framepack_version.restype = ctypes.c_int
                version = lib.framepack_version()
            except AttributeError:  # pre-versioning build
                version = 0
            if version < 4 and _build():
                # dlopen caches by path: re-CDLL(_LIB_PATH) would return the
                # OLD mapping and the version check would fail forever. Load
                # the rebuilt library through a unique copy instead.
                import shutil
                import tempfile

                fd, tmp = tempfile.mkstemp(suffix=".so")
                os.close(fd)
                shutil.copy2(_LIB_PATH, tmp)
                lib = ctypes.CDLL(tmp)
                # the mapping stays valid after unlink on Linux; without this
                # each process start with a stale v1 on disk leaks one temp .so
                os.unlink(tmp)
                lib.framepack_version.restype = ctypes.c_int
            lib.framepack_letterbox_i420_rows.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            lib.framepack_dirty_bands.restype = ctypes.c_int
            lib.framepack_dirty_bands.argtypes = [
                ctypes.c_void_p,   # cur
                ctypes.c_void_p,   # prev (updated in place at dirty bands)
                ctypes.c_int,      # h
                ctypes.c_long,     # row_bytes
                ctypes.c_int,      # band
                ctypes.c_void_p,   # flags out [nbands] uint8
            ]
            lib.framepack_delta_blocks.restype = ctypes.c_int
            lib.framepack_delta_blocks.argtypes = [
                ctypes.c_void_p,   # cur
                ctypes.c_void_p,   # prev
                ctypes.c_int,      # n
                ctypes.c_long,     # frame_bytes
                ctypes.c_int,      # block
                ctypes.c_int,      # cap
                ctypes.c_void_p,   # idx out
                ctypes.c_void_p,   # blocks out
                ctypes.c_int,      # n_threads
            ]
            assert lib.framepack_version() == 4
            _lib = lib
        except (OSError, AttributeError, AssertionError) as e:
            logger.info("framepack load failed (%s); using cv2 path", e)
            _lib = None
        return _lib


def letterbox_i420_batch(
    frames: list[np.ndarray], size: int, n_threads: int = 4,
    rows: int | None = None,
):
    """Fused native path: list of HxWx3 BGR uint8 -> ([N, rows*3//2, size]
    I420 uint8, scales [N], offsets [N, 2] in full-square coordinates).
    ``rows`` < size packs only the active letterbox area (the engine's
    ingest stage pads the rest on device). Returns None when the native
    library is unavailable (caller falls back to cv2)."""
    lib = get_framepack()
    if lib is None or not frames:
        return None
    rows = size if rows is None else rows
    n = len(frames)
    contiguous = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    ptrs = (ctypes.c_void_p * n)(
        *[f.ctypes.data_as(ctypes.c_void_p).value for f in contiguous]
    )
    heights = (ctypes.c_int * n)(*[f.shape[0] for f in contiguous])
    widths = (ctypes.c_int * n)(*[f.shape[1] for f in contiguous])
    out = np.empty((n, rows * 3 // 2, size), np.uint8)
    scales = np.empty((n,), np.float32)
    offsets = np.empty((n, 2), np.float32)
    lib.framepack_letterbox_i420_rows(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        heights,
        widths,
        n,
        size,
        rows,
        out.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out, scales, offsets


def delta_blocks(
    cur: np.ndarray,
    prev: np.ndarray,
    block: int,
    cap: int,
    idx: np.ndarray | None = None,
    blocks: np.ndarray | None = None,
    n_threads: int = 4,
) -> int | None:
    """Native block-sparse temporal delta (framepack v3).

    cur/prev: [B, NBYTES] uint8 (NBYTES % block == 0). With cap == 0 this is
    a count-only pass returning the max changed-block count across frames;
    with cap > 0 it fills idx [B, cap] int32 (-1 padded) and blocks
    [B, cap, block] uint8. Returns None when the native library is
    unavailable (caller uses the numpy fallback in engine.batching)."""
    lib = get_framepack()
    if lib is None:
        return None
    b, nbytes = cur.shape
    assert prev.shape == cur.shape and nbytes % block == 0
    if cap > 0:
        assert idx is not None and blocks is not None
        assert idx.shape == (b, cap) and blocks.shape == (b, cap, block)
    return int(
        lib.framepack_delta_blocks(
            cur.ctypes.data_as(ctypes.c_void_p),
            prev.ctypes.data_as(ctypes.c_void_p),
            b,
            nbytes,
            block,
            cap,
            idx.ctypes.data_as(ctypes.c_void_p) if cap > 0 else None,
            blocks.ctypes.data_as(ctypes.c_void_p) if cap > 0 else None,
            n_threads,
        )
    )


def dirty_bands(cur: np.ndarray, prev: np.ndarray, band: int = 16) -> list | None:
    """Row bands of ``cur`` that differ from ``prev`` (both [H, W, C] uint8,
    C-contiguous, same shape); ``prev`` is updated IN PLACE at the dirty
    bands so it tracks the last-seen frame. Returns a merged list of
    half-open (y0, y1) source row bands, or None when the native library is
    unavailable (callers fall back to treating everything as dirty)."""
    lib = get_framepack()
    if lib is None:
        return None
    assert cur.shape == prev.shape and cur.dtype == prev.dtype == np.uint8
    assert cur.flags.c_contiguous and prev.flags.c_contiguous
    h = cur.shape[0]
    row_bytes = cur.nbytes // max(1, h)
    nbands = -(-h // band)
    flags = np.zeros(nbands, np.uint8)
    n = int(lib.framepack_dirty_bands(
        cur.ctypes.data_as(ctypes.c_void_p),
        prev.ctypes.data_as(ctypes.c_void_p),
        h, row_bytes, band,
        flags.ctypes.data_as(ctypes.c_void_p),
    ))
    if n == 0:
        return []
    out: list = []
    for i in np.flatnonzero(flags):
        y0, y1 = int(i) * band, min(h, (int(i) + 1) * band)
        if out and out[-1][1] == y0:
            out[-1] = (out[-1][0], y1)  # merge adjacent bands
        else:
            out.append((y0, y1))
    return out
