"""On-demand build + ctypes binding of the native C++ host runtime
(unet_studio_tpu/native/*.cpp).

The reference's host runtime is C++ (TIPL); here the hot host-side ops are
native too, compiled once into a cached shared object.  Callers fall back
to scipy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_lib = None
_tried = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "native", "cc3d.cpp")


def _build() -> str | None:
    src = _source_path()
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "unet_studio_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, f"cc3d_{digest}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".build{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return so
    except (subprocess.SubprocessError, OSError):
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.cc3d_label.restype = ctypes.c_int32
    lib.cc3d_label.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def cc3d_label(mask: np.ndarray):
    """Native 6-connected components.  Returns (labels int32, counts int64)
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask.astype(np.uint8))
    d, h, w = m.shape
    labels = np.zeros(m.shape, np.int32)
    max_components = int(m.sum()) + 1  # exact upper bound: 1 voxel/component
    counts = np.zeros(max_components + 1, np.int64)
    n = lib.cc3d_label(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        d,
        h,
        w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_components,
    )
    if n < 0:
        return None
    return labels, counts[: n + 1]
