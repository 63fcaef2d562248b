"""Native host-runtime tier: C implementations of host-side hot loops.

The TPU compute path is XLA/Pallas; the host runtime around it (decode,
NMS, box bookkeeping) is numpy + OpenCV C++ — except where a Python-level
loop is itself the hot spot. First case: the greedy NMS recurrence
(``nms.c``), ~0.75 ms/call in numpy at candidate load × ~45 calls per
8-frame batch.

Build model: compiled on first import with the system C compiler
(``gcc -O2 -shared -fPIC``) into ``~/.cache/mintime_tpu``, keyed by a
source hash — no pip/pybind11 dependency, loaded via ctypes. When no
compiler is available the import degrades to ``greedy_nms = None`` and
callers keep their numpy fallback (which is also the test oracle —
tests/test_native_nms.py asserts bit-equal keep sets).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "nms.c")


def _build() -> str | None:
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "mintime_tpu"
        )
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"nms_{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True,
            )
            os.replace(tmp, so)  # atomic under concurrent builders
        return so
    except Exception:
        return None


_lib = None
_so_path = _build()
if _so_path is not None:
    try:
        _lib = ctypes.CDLL(_so_path)
        for name in ("nms_greedy_f32", "nms_greedy_f64"):
            fn = getattr(_lib, name)
            fn.restype = ctypes.c_long
            fn.argtypes = [
                ctypes.c_void_p,  # boxes
                ctypes.c_void_p,  # order (mutated: suppressed -> -1)
                ctypes.c_long,  # n
                ctypes.c_double if name.endswith("f64") else ctypes.c_float,
                ctypes.c_int,  # method_min
                ctypes.c_int,  # plus_one
                ctypes.c_void_p,  # keep_out
            ]
    except Exception:
        _lib = None


def greedy_nms(
    boxes: np.ndarray,
    order: np.ndarray,
    threshold: float,
    method_min: bool,
    plus_one: bool,
) -> np.ndarray | None:
    """Run the greedy suppression recurrence in C. ``boxes`` (n, 4) f32/f64
    C-contiguous; ``order`` the caller's traversal order (argsort tie
    semantics live with the caller; never mutated — the C kernel works on
    a private copy). Returns kept indices in traversal order, or None when
    the native library is unavailable (caller falls back to its numpy
    loop)."""
    if _lib is None:
        return None
    n = len(order)
    if n == 0:
        return np.zeros(0, dtype=int)
    if boxes.dtype == np.float32:
        fn = _lib.nms_greedy_f32
    elif boxes.dtype == np.float64:
        fn = _lib.nms_greedy_f64
    else:
        return None
    boxes = np.ascontiguousarray(boxes[:, :4])
    # ALWAYS copy: the kernel overwrites suppressed slots with -1, and
    # ascontiguousarray would alias an already-contiguous caller array
    work = np.array(order, dtype=np.int64)
    keep = np.empty(n, dtype=np.int64)
    kept = fn(
        boxes.ctypes.data, work.ctypes.data, n,
        boxes.dtype.type(threshold), int(method_min), int(plus_one),
        keep.ctypes.data,
    )
    return keep[:kept]
