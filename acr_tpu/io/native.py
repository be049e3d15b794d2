"""ctypes bridge to the native C++ runtime library (native/acr_native.cpp).

Builds on demand (``make -C native``) and degrades gracefully: every
entry point has a pure-Python/JAX equivalent, so the framework runs
without a compiler — the native paths are the host-side counterparts of
the reference's native dependencies (cv2.solvePnPRansac, pyrender —
SURVEY.md §2.7).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libacr_native.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.acr_estimate_translation.restype = ctypes.c_int
        lib.acr_estimate_translation.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, f32p]
        lib.acr_estimate_translation_ransac.restype = ctypes.c_int
        lib.acr_estimate_translation_ransac.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int, ctypes.c_float, ctypes.c_uint, f32p]
        lib.acr_rasterize.restype = None
        lib.acr_rasterize.argtypes = [
            f32p, ctypes.c_int, i32p, ctypes.c_int, f32p, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, f32p]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def estimate_translation(j3d: np.ndarray, uv: np.ndarray,
                         focal: float = 1265.0, cx: float = 256.0,
                         cy: float = 256.0,
                         ransac: bool = True,
                         iterations: int = 100,
                         reproj_thresh: float = 20.0,
                         seed: int = 0) -> np.ndarray:
    """Host translation solve; RANSAC matches the reference's robustness
    contract (reprojectionError=20, iterationsCount=100 —
    acr/utils.py:421-422)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    j3d = np.ascontiguousarray(j3d, np.float32)
    uv = np.ascontiguousarray(uv, np.float32)
    out = np.zeros(3, np.float32)
    if ransac:
        rc = lib.acr_estimate_translation_ransac(
            _fp(j3d), _fp(uv), len(j3d), focal, cx, cy, iterations,
            reproj_thresh, seed, _fp(out))
    else:
        rc = lib.acr_estimate_translation(
            _fp(j3d), _fp(uv), len(j3d), focal, cx, cy, _fp(out))
    if rc != 0:
        raise ValueError("translation solve failed (singular system)")
    return out


def rasterize(verts: np.ndarray, faces: np.ndarray, face_colors: np.ndarray,
              size: int = 512, focal: float = 1265.0,
              ambient: float = 0.3, directional: float = 1.5) -> np.ndarray:
    """Host z-buffer render -> (size, size, 4) float RGBA."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    face_colors = np.ascontiguousarray(face_colors, np.float32)
    out = np.zeros((size, size, 4), np.float32)
    lib.acr_rasterize(
        _fp(verts), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
        _fp(face_colors), size, size, focal, size / 2.0, size / 2.0,
        ambient, directional, _fp(out))
    return out
