"""ctypes bindings for the native OpenMP sweep baseline
(csrc/sweep_baseline.cpp).

A C++/OpenMP implementation of the exact computation the LW candidate
sweep kernel performs (cost_kernel.py CandidateCostLw, "transmission"
method), parallelized the reference's way — one OpenMP task per
candidate (Equipartition::calc_error_all, equipartition.h:100-104).
Used by bench.py as the measured all-cores host-CPU baseline (the
reference publishes no numbers, BASELINE.md) and by tests as a second
independent implementation to cross-check the JAX kernel.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .. import logs

_LIB_NAME = "libsweepbaseline.so"
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        _LIB_NAME)


def _build() -> bool:
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc",
        "sweep_baseline.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-Wall",
             "-fopenmp", "-shared", "-o", _lib_path(), src],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logs.detail(f"Native sweep baseline build failed: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building on demand) the native library, or None."""
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_lib_path()):
        if _build_attempted:
            return None
        _build_attempted = True
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_lib_path())
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.sweep_lw_cost_transmission.restype = ctypes.c_int
    lib.sweep_lw_cost_transmission.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f64p, f32p, f32p, f32p, f32p, f32p, f32p, f32p, f32p,
        i32p, i32p, ctypes.c_float, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def sweep_lw_cost_transmission(layer_weight, pressure_hl, surf_emissivity,
                               surf_planck, flux_dn_surf, flux_up_toa,
                               planck_hl, bg_od, metric, hr, i1, i2,
                               flux_weight: float) -> np.ndarray:
    """Candidate costs from the native kernel; see CandidateCostLw._kernel.

    All spectral arrays are rank-ordered over the band's wavenumbers;
    i1/i2 are inclusive rank bounds per candidate. Raises RuntimeError if
    the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native sweep baseline unavailable")
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    bg_od = f32(bg_od)
    nlay, nwav = bg_od.shape
    i1 = np.ascontiguousarray(i1, np.int32)
    i2 = np.ascontiguousarray(i2, np.int32)
    nseg = i1.shape[0]
    costs = np.empty(nseg, np.float32)
    rc = lib.sweep_lw_cost_transmission(
        nlay, nwav, nseg, f32(layer_weight),
        np.ascontiguousarray(pressure_hl, np.float64),
        f32(surf_emissivity), f32(surf_planck), f32(flux_dn_surf),
        f32(flux_up_toa), f32(planck_hl), bg_od, f32(metric), f32(hr),
        i1, i2, float(flux_weight), costs)
    if rc <= 0:
        raise RuntimeError(f"native sweep baseline failed (rc={rc})")
    if np.any(costs < 0):
        raise ValueError("candidate bounds out of range")
    return costs.astype(np.float64)
