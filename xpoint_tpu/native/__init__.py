"""ctypes bindings for the native augmentation engine (augment.cpp).

Auto-builds with g++ on first import if the shared library is missing;
callers fall back to the cv2 path when unavailable
(data/augmentation.py)."""
import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libxpoint_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(os.path.dirname(__file__), "augment.cpp")
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-ffast-math",
                 "-funroll-loops", "-fPIC", "-shared", "-std=c++17",
                 "-o", _LIB_PATH, src],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.homographic_augment.restype = ctypes.c_int
    lib.homographic_augment.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.warp_keypoints.restype = None
    lib.warp_keypoints.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def homographic_augment(image, homography, border_reflect=True,
                        erosion_radius=0, mask_border=True):
    """Fused warp + valid mask (+ erosion). image: (H, W) float.
    Returns (warped float32 (H, W), mask float64 (H, W)) or None if the
    native engine is unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(image, np.float32)
    H, W = src.shape
    dst = np.empty((H, W), np.float32)
    mask = np.empty((H, W), np.uint8)
    scratch = np.empty(2 * (H + 2) * (W + 2), np.uint8)
    h = np.ascontiguousarray(homography, np.float64)
    lib.homographic_augment(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H, W, h.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        1 if border_reflect else 0, int(erosion_radius),
        1 if mask_border else 0)
    return dst, mask.astype(np.float64)


def warp_keypoints(keypoints, homography):
    """(n, 2) float (row, col) keypoints through the native engine."""
    lib = _load()
    if lib is None or len(keypoints) == 0:
        return None
    kps = np.ascontiguousarray(keypoints, np.float64)
    out = np.empty_like(kps)
    h = np.ascontiguousarray(homography, np.float64)
    lib.warp_keypoints(
        kps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(kps), h.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
