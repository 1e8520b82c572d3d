"""ctypes bindings for the native (C++) runtime components.

The reference's host-side runtime is C++ (HIT parsing, FParser expression
evaluation for deck constants); here the equivalent native piece is
``native/expr_eval.cpp`` — a scalar expression evaluator for `${fparse}`
brace expansion and constant evaluation, built on demand with g++ and loaded
via ctypes.  The pure-Python engine remains the reference implementation;
the native one is the fast path and a differential-testing oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmarlin_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # ALWAYS run the (incremental) build: a prebuilt .so may be stale
        # after source edits or built for a different arch/glibc
        _build()
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.marlin_eval.restype = ctypes.c_double
        lib.marlin_eval.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.marlin_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


class NativeError(Exception):
    pass


def eval_scalar(expr: str, env: Optional[Dict[str, float]] = None) -> float:
    """Evaluate a scalar expression with the native engine.

    Raises NativeError when the library is unavailable or evaluation fails
    (callers fall back to the Python engine)."""
    lib = get_lib()
    if lib is None:
        raise NativeError("native library unavailable")
    env = env or {}
    names = (ctypes.c_char_p * len(env))(*[k.encode() for k in env])
    values = (ctypes.c_double * len(env))(*[float(v) for v in env.values()])
    err = ctypes.c_int(0)
    out = lib.marlin_eval(
        expr.encode(),
        ctypes.cast(names, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(values, ctypes.POINTER(ctypes.c_double)),
        len(env),
        ctypes.byref(err),
    )
    if err.value:
        raise NativeError(lib.marlin_last_error().decode(errors="replace"))
    return float(out)


def available() -> bool:
    return get_lib() is not None
