"""ctypes loader for the native JPEG decode + resize (native/image.cpp).

Opportunistic acceleration of the ImageProcessor host hot path (reference
C2 decode + Resize, our preprocessing.py): when the shared library exists
(or builds with g++ in seconds), JPEG bytes are decoded with libjpeg and
resized with a Pillow-BILINEAR-equivalent triangle filter in one native
call; otherwise PIL runs. Outputs match PIL within 1 LSB per channel
(float vs Pillow's int16 fixed-point accumulation) — enforced by
tests/test_native_image.py. ``prescale`` (off by default) additionally
enables libjpeg's DCT-domain downscale (Pillow ``draft`` semantics): much
faster on large photos, not byte-comparable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SOURCE = Path(__file__).resolve().parents[2] / "native" / "image.cpp"
_CACHE_DIR = Path(os.environ.get("PGICA_CACHE_DIR", Path.home() / ".cache" / "pgica_tpu"))
_LIB_PATH = _CACHE_DIR / "libimage.so"

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build_library() -> Optional[Path]:
    if not _SOURCE.exists():
        return None
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SOURCE), "-ljpeg", "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception as e:
        logger.debug("native image build failed: %s", e)
        return None


def get_library() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    path = _LIB_PATH
    try:
        if not path.exists() or (_SOURCE.exists() and _SOURCE.stat().st_mtime > path.stat().st_mtime):
            built = _build_library()
            if built is None:
                return None
        lib = ctypes.CDLL(str(path))
        lib.pgica_decode_resize_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.pgica_decode_resize_jpeg.restype = ctypes.c_int
        lib.pgica_resize_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.pgica_resize_rgb.restype = ctypes.c_int
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.debug("native image load failed: %s", e)
        _lib = None
    return _lib


def decode_resize_jpeg(data: bytes, size: int, prescale: bool = False) -> Optional[np.ndarray]:
    """JPEG bytes -> (size, size, 3) u8 RGB, or None (caller falls back)."""
    lib = get_library()
    if lib is None:
        return None
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.pgica_decode_resize_jpeg(
        data, len(data), size, int(prescale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out


def resize_rgb(image_u8: np.ndarray, size: int) -> Optional[np.ndarray]:
    """(H, W, 3) u8 -> (size, size, 3) u8 with PIL-BILINEAR semantics."""
    lib = get_library()
    if lib is None:
        return None
    img = np.ascontiguousarray(image_u8, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.pgica_resize_rgb(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out
