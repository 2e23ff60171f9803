"""Native (C++) runtime components, bound via ctypes.

The reference's only native-code dependency is the external SIFTflow
MATLAB/mex toolbox its offline metrics require
(``matlab_code/run_benchmark.m:20-44``).  Here the equivalent lives
in-tree: ``src/siftflow.cpp`` is a dense-descriptor coarse-to-fine
registration engine compiled on first use with the system ``g++``
(OpenMP-parallel), loaded with ctypes — no pybind11 needed.

Public API:
- :func:`available` — True if the shared library could be built/loaded.
- :func:`sift_flow(im1, im2)` — dense flow im1 -> im2, (H, W, 2) float32.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "siftflow.cpp")
_LIB_PATH = os.path.join(_HERE, "_siftflow.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string on failure."""
    # -ffp-contract=off pins FMA contraction so the flow field is
    # reproducible across hosts/compilers (the engine's outputs feed the
    # calibrated LD/AD bounds in docs/registration_calibration.json).
    cmd = [
        "g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
        "-fPIC", "-fopenmp", "-std=c++17", _SRC, "-o", _LIB_PATH,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:  # no g++ etc.
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.sift_flow.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ]
        lib.sift_flow.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def sift_flow(im1: np.ndarray, im2: np.ndarray, *, coarse_radius: int = 8,
              alpha: float = 0.02, n_threads: int = 0) -> np.ndarray:
    """Dense registration flow im1 -> im2.

    im1/im2: (H, W) grayscale, any float/uint dtype, value range [0, 255].
    Returns (H, W, 2) float32 with ``flow[..., 0] = dx``.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native siftflow unavailable: {_build_error}")
    if im1.shape != im2.shape or im1.ndim != 2:
        raise ValueError(f"bad shapes {im1.shape} vs {im2.shape}")
    h, w = im1.shape
    a = np.ascontiguousarray(im1, np.float32)
    b = np.ascontiguousarray(im2, np.float32)
    out = np.empty((h, w, 2), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.sift_flow(
        a.ctypes.data_as(fp), b.ctypes.data_as(fp), h, w,
        out.ctypes.data_as(fp), coarse_radius, alpha, n_threads,
    )
    return out
