"""Native (C++) host-side kernels, built on demand and bound via ctypes.

The library is compiled once per machine into a cache directory with g++
(-O3); loading falls back to None when no toolchain is available, and every
caller has a numpy fallback, so the framework works without native support —
it is an input-pipeline accelerator (see augment.cpp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["get_library", "paired_crop_augment", "native_available"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "augment.cpp")


def _build() -> Optional[str]:
    # Default to a USER-OWNED cache, not the shared tempdir: a predictable
    # world-writable /tmp path lets any local user pre-plant a .so that the
    # training process would dlopen (the mtime freshness check cannot tell).
    default_cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "studiosr_tpu_native",
    )
    cache_dir = os.environ.get("STUDIOSR_NATIVE_CACHE", default_cache)
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, "libstudiosr_augment.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def get_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("STUDIOSR_DISABLE_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.paired_crop_augment.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, u8p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                f32p, f32p,
            ]
            lib.paired_crop_augment.restype = None
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return get_library() is not None


def paired_crop_augment(
    lq: np.ndarray,
    gt: np.ndarray,
    size: int,
    scale: int,
    xs: int,
    ys: int,
    fliplr: bool,
    flipud: bool,
    rot90: bool,
) -> Tuple[np.ndarray, np.ndarray]:
    """C++ fast path for crop+augment+normalize; raises if unavailable."""
    lib = get_library()
    assert lib is not None, "native library unavailable"
    lq = np.ascontiguousarray(lq)
    gt = np.ascontiguousarray(gt)
    # The C++ kernel derives the GT row stride from the LQ width and trusts
    # the crop offsets — mismatched inputs would read out of bounds (garbage
    # pixels or a segfault) with no Python-level error. Validate here, the
    # public boundary, not only at the one internal call site.
    if lq.dtype != np.uint8 or gt.dtype != np.uint8:
        raise TypeError(f"paired_crop_augment: uint8 inputs required, got {lq.dtype}/{gt.dtype}")
    if lq.ndim != 3 or lq.shape[2] != 3 or gt.ndim != 3 or gt.shape[2] != 3:
        raise ValueError(f"paired_crop_augment: HWC RGB inputs required, got {lq.shape}/{gt.shape}")
    if gt.shape[0] != lq.shape[0] * scale or gt.shape[1] != lq.shape[1] * scale:
        raise ValueError(
            f"paired_crop_augment: gt {gt.shape[:2]} is not lq {lq.shape[:2]} x{scale}"
        )
    if not (0 <= xs <= lq.shape[1] - size and 0 <= ys <= lq.shape[0] - size):
        raise ValueError(
            f"paired_crop_augment: crop ({ys},{xs})+{size} outside lq {lq.shape[:2]}"
        )
    out_lq = np.empty((size, size, 3), np.float32)
    out_gt = np.empty((size * scale, size * scale, 3), np.float32)
    flags = (1 if fliplr else 0) | (2 if flipud else 0) | (4 if rot90 else 0)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.paired_crop_augment(
        lq.ctypes.data_as(u8p), lq.shape[0], lq.shape[1],
        gt.ctypes.data_as(u8p), size, scale, xs, ys, flags,
        out_lq.ctypes.data_as(f32p), out_gt.ctypes.data_as(f32p),
    )
    return out_lq, out_gt
