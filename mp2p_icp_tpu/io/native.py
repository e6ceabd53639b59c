"""ctypes bindings for the native host-side loading kernels.

The device compute path is JAX/XLA; host-side data feeding keeps native
code where it pays (the reference is C++ end-to-end — SURVEY.md §2). The
shared library builds with ``make -C native``; all entry points fall back
to numpy transparently when it is absent, and auto-build is attempted once
when a compiler is available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libfastload.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=60,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.parse_floats.restype = ctypes.c_int64
        lib.parse_floats.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.detect_columns.restype = ctypes.c_int32
        lib.detect_columns.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_float_table(text: bytes) -> np.ndarray:
    """Whitespace/comma-separated float table -> [N, cols] float32.
    Native strtof loop (~50x np.loadtxt); numpy fallback."""
    lib = _load()
    if lib is None:
        import io

        # the native strtof loop treats commas as separators; np.loadtxt's
        # default is whitespace-only, so normalise before falling back or
        # comma-separated tables parse on one path and crash on the other
        if b"," in text:
            text = text.replace(b",", b" ")
        return np.loadtxt(io.BytesIO(text), dtype=np.float32, ndmin=2)
    n_bytes = len(text)
    cols = lib.detect_columns(text, n_bytes)
    if cols <= 0:
        return np.zeros((0, 3), np.float32)
    # upper bound on value count: one value per 2 bytes is conservative
    max_vals = n_bytes // 2 + cols
    out = np.empty(max_vals, np.float32)
    n = lib.parse_floats(
        text, n_bytes, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_vals,
    )
    n_rows = n // cols
    return out[: n_rows * cols].reshape(n_rows, cols).copy()
