"""ctypes bindings to the native host-ops library (csrc/host_ops.cpp).

Builds ``libhost_ops.so`` on first import (g++ -O3, cached next to the
source) and exposes the off-GIL radar decode path used by
:mod:`omnihd_scenes_tpu.data.radar_loading` when available.  All entry
points have pure-NumPy fallbacks, so the native library is an
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), 'csrc')


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = osp.join(_CSRC, 'host_ops.cpp')
    so = osp.join(_CSRC, 'libhost_ops.so')
    if not osp.exists(src):
        return None
    if (not osp.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        try:
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-o', so, src],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    if not hasattr(lib, 'nms_rotated_multiclass'):
        # Stale library built from an older source (mtime-preserving
        # copy, clock skew): force a rebuild once; if the fresh build
        # still lacks the symbol, fall back to NumPy rather than crash
        # ("an accelerator, never a requirement").
        try:
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-o', so, src],
                check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so)
        except Exception:
            return None
        if not hasattr(lib, 'nms_rotated_multiclass'):
            return None

    f64p = np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS')
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    u8p = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')

    lib.load_f32_bin.argtypes = [ctypes.c_char_p, f32p, ctypes.c_long]
    lib.load_f32_bin.restype = ctypes.c_long
    lib.radar_compensate.argtypes = [f32p, ctypes.c_long, f64p, f64p, f64p,
                                     f64p, ctypes.c_double, ctypes.c_double,
                                     f32p]
    lib.radar_compensate.restype = None
    lib.range_crop.argtypes = [f32p, ctypes.c_long, ctypes.c_long, f64p,
                               f64p]
    lib.range_crop.restype = ctypes.c_long
    lib.remap_bilinear_u8.argtypes = [u8p, ctypes.c_long, ctypes.c_long,
                                      ctypes.c_long, f32p, f32p, u8p]
    lib.remap_bilinear_u8.restype = None
    i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    lib.nms_rotated_multiclass.argtypes = [
        f32p, f32p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_double, ctypes.c_double, ctypes.c_long, f32p, f32p, i32p]
    lib.nms_rotated_multiclass.restype = ctypes.c_long
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_and_load()
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def radar_sweep_native(path: str, inv_s2e_rot: np.ndarray,
                       s2l_rot: np.ndarray, s2l_trans: np.ndarray,
                       ego_vel: np.ndarray, time_diff: float,
                       radar_id: float,
                       max_points: int = 100000) -> Optional[np.ndarray]:
    """Load + compensate one radar sweep natively; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.empty((max_points, 8), np.float32)
    n = lib.load_f32_bin(path.encode(), raw.reshape(-1), max_points * 8)
    if n < 0:
        return None
    n //= 8
    out = np.empty((n, 10), np.float32)
    lib.radar_compensate(
        np.ascontiguousarray(raw[:n]), n,
        np.ascontiguousarray(inv_s2e_rot, np.float64).reshape(-1),
        np.ascontiguousarray(s2l_rot, np.float64).reshape(-1),
        np.ascontiguousarray(s2l_trans, np.float64).reshape(-1),
        np.ascontiguousarray(ego_vel, np.float64).reshape(-1),
        float(time_diff), float(radar_id), out)
    return out


def range_crop_native(points: np.ndarray, lo, hi) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    n = lib.range_crop(pts, pts.shape[0], pts.shape[1],
                       np.asarray(lo, np.float64),
                       np.asarray(hi, np.float64))
    return pts[:n]
