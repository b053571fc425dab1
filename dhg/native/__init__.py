"""Native (C++) data-path kernels, built lazily with g++ and bound via ctypes.

The offline IAM cache build spends its CPU time in stroke simplification
(3x combine pass per line over ~10k lines). dhg_simplify_strokes runs the
whole pipeline in one native call. Falls back to the numpy implementation in
dhg.data.strokes when no compiler is available (DHG_NATIVE=0 disables).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "stroke_ops.cpp"
_LIB = Path(__file__).parent / "_stroke_ops.so"
_lib: ctypes.CDLL | None = None
_tried = False
_load_lock = threading.Lock()  # parallel cache-build workers race here


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:  # pragma: no cover
        logger.warning("native build unavailable: %s", e)
        return False
    if res.returncode != 0:  # pragma: no cover
        logger.warning("native build failed:\n%s", res.stderr)
        return False
    return True


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None. Thread-safe:
    concurrent first callers (parallel cache build) serialize on a lock so
    only one g++ invocation writes the .so."""
    if _lib is not None or _tried:
        return _lib
    with _load_lock:
        return _get_lib_locked()


def _get_lib_locked() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("DHG_NATIVE", "1") != "1":
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.dhg_parse_and_simplify  # noqa: B018 — probe for a stale binary
    except (OSError, AttributeError):
        # Missing library OR a stale .so predating newer exports (mtimes
        # lie after a fresh checkout): rebuild once from source.
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:  # pragma: no cover
            logger.warning("native load failed: %s", e)
            return None

    dbl_p = ctypes.POINTER(ctypes.c_double)
    lib.dhg_simplify_strokes.argtypes = [
        dbl_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_double,
        dbl_p,
    ]
    lib.dhg_simplify_strokes.restype = ctypes.c_int64
    lib.dhg_combine_strokes.argtypes = [dbl_p, ctypes.c_int64, ctypes.c_int64, dbl_p]
    lib.dhg_combine_strokes.restype = ctypes.c_int64
    lib.dhg_parse_strokes_xml.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        dbl_p,
        ctypes.c_int64,
    ]
    lib.dhg_parse_strokes_xml.restype = ctypes.c_int64
    lib.dhg_parse_and_simplify.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_double,
        dbl_p,
        ctypes.c_int64,
    ]
    lib.dhg_parse_and_simplify.restype = ctypes.c_int64
    _lib = lib
    return _lib


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def simplify_strokes_native(xyz: np.ndarray, passes: int = 3, frac: float = 0.2):
    """Native full pipeline; returns None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float64)
    out = np.empty_like(xyz)
    n_out = lib.dhg_simplify_strokes(_as_c(xyz), xyz.shape[0], passes, frac, _as_c(out))
    return out[:n_out].copy()


def combine_strokes_native(xyz: np.ndarray, n_merge: int):
    """Single native combine pass; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float64)
    out = np.empty_like(xyz)
    n_out = lib.dhg_combine_strokes(_as_c(xyz), xyz.shape[0], n_merge, _as_c(out))
    return out[:n_out].copy()


def parse_strokes_xml_native(path, passes: int | None = None, frac: float = 0.2):
    """Native IAM stroke-XML parse -> [N, 3] normalized (dx, -dy, pen) deltas.

    passes=None parses only (pre-simplify stage of utils/io.py:11-59);
    passes=k runs parse + k combine passes in ONE native call. Returns None
    when the library is unavailable OR the file surprises the targeted
    scanner (no StrokeSet, malformed tag/coordinate, <2 points) — the
    caller then falls back to the ElementTree reference path, so the
    native fast path can never silently diverge on odd input.
    """
    lib = get_lib()
    if lib is None:
        return None
    data = Path(path).read_bytes()
    max_rows = data.count(b"<Point") + 1  # upper bound (may count comments)
    if max_rows < 2:
        return None
    out = np.empty((max_rows, 3), dtype=np.float64)
    if passes is None:
        n = lib.dhg_parse_strokes_xml(data, len(data), _as_c(out), max_rows)
    else:
        n = lib.dhg_parse_and_simplify(data, len(data), passes, frac, _as_c(out), max_rows)
    if n < 0:
        return None
    return out[:n].copy()
