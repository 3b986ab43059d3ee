"""ctypes loader for the native C++ BPE encoder (native/bpe.cpp).

Opportunistic acceleration of the tokenizer hot path: if the shared library
exists (or can be built with g++ in a few seconds; rebuilt automatically when
bpe.cpp is newer), text is encoded natively; otherwise the pure-Python path
in tokenizer.py is used. Both paths produce identical ids for all inputs —
enforced by tests/test_native_bpe.py.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)

_SOURCE = Path(__file__).resolve().parents[2] / "native" / "bpe.cpp"
_HEADER = _SOURCE.parent / "unicode_classes.h"
_CACHE_DIR = Path(os.environ.get("PGICA_CACHE_DIR", Path.home() / ".cache" / "pgica_tpu"))
_LIB_PATH = _CACHE_DIR / "libbpe.so"

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build_library() -> Optional[Path]:
    if not _SOURCE.exists():
        return None
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(_SOURCE), "-o", str(_LIB_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception as e:
        logger.debug("native BPE build failed: %s", e)
        return None


def get_library() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    newest_src = max(
        (f.stat().st_mtime for f in (_SOURCE, _HEADER) if f.exists()), default=0.0
    )
    stale = _LIB_PATH.exists() and newest_src > _LIB_PATH.stat().st_mtime
    path = _LIB_PATH if _LIB_PATH.exists() and not stale else _build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
        lib.bpe_new.restype = ctypes.c_void_p
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_add_token.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32]
        lib.bpe_add_merge.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
        ]
        lib.bpe_set_unk.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.bpe_encode.restype = ctypes.c_int32
        _lib = lib
    except OSError as e:
        logger.debug("native BPE load failed: %s", e)
    return _lib


class NativeBPE:
    """Handle to a configured native encoder; None-safe constructor."""

    def __init__(
        self,
        vocab: dict,
        merges: Sequence[Tuple[str, str]],
        unk_id: int,
    ):
        self._lib = get_library()
        self._handle = None
        if self._lib is None:
            return
        handle = self._lib.bpe_new()
        for sym, idx in vocab.items():
            self._lib.bpe_add_token(handle, sym.encode("utf-8"), int(idx))
        for rank, (a, b) in enumerate(merges):
            self._lib.bpe_add_merge(handle, a.encode("utf-8"), b.encode("utf-8"), rank)
        self._lib.bpe_set_unk(handle, int(unk_id))
        self._handle = handle

    @property
    def available(self) -> bool:
        return self._handle is not None

    def encode(self, text: str, max_tokens: int = 4096) -> Optional[List[int]]:
        """Encode text natively; returns None when the library is unavailable.

        The C++ byte-class pretokenizer matches the Python path for all
        inputs (non-ASCII codepoints are letters in both) — enforced by
        tests/test_native_bpe.py."""
        if self._handle is None:
            return None
        buf = (ctypes.c_int32 * max_tokens)()
        n = self._lib.bpe_encode(self._handle, text.encode("utf-8"), buf, max_tokens)
        if n > max_tokens:
            return None  # truncated; caller should use the Python path
        return list(buf[:n])

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            try:
                self._lib.bpe_free(self._handle)
            except Exception:
                pass
