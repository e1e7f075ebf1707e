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
    csrc = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc")
    srcs = [os.path.join(csrc, "sweep_baseline.cpp"),
            os.path.join(csrc, "crosscheck.cpp")]
    if not all(os.path.exists(s) for s in srcs):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-Wall",
             "-fopenmp", "-shared", "-o", _lib_path()] + srcs,
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
    # Independent f64 cross-check oracles (csrc/crosscheck.cpp)
    lib.sw_cost_transmission.restype = ctypes.c_int
    lib.sw_cost_transmission.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        f64p, f64p, f64p, f64p, f64p, f64p, f64p, f64p, f64p,
        i32p, i32p, ctypes.c_double, f64p]
    lib.sw_cost_total_transmission.restype = ctypes.c_int
    lib.sw_cost_total_transmission.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        f64p, f64p, f64p, f64p, f64p, f64p,
        f64p, f64p, f64p, f64p, f64p, f64p,
        ctypes.c_double, ctypes.c_double,
        i32p, i32p, ctypes.c_double, f64p]
    lib.gpoint_average.restype = ctypes.c_int
    lib.gpoint_average.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        i32p, f64p, f64p, ctypes.c_void_p, f64p, f64p, f64p]
    _lib = lib
    return _lib


_GPOINT_METHOD_IDS = {
    "linear": 0, "transmission": 1, "transmission-2": 2,
    "transmission-3": 3, "transmission-10": 4, "square-root": 5,
    "logarithmic": 6, "hybrid-logarithmic-transmission-3": 7,
}


def sw_cost_transmission(cos_sza, layer_weight, pressure_hl, ssi, albedo,
                         flux_dn_surf, flux_up_toa, bg_od, metric, hr,
                         i1, i2, flux_weight: float) -> np.ndarray:
    """f64 SW candidate cost, "transmission" averaging — independent
    second implementation (csrc/crosscheck.cpp) of
    CandidateCostSw._kernel for validation."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native cross-check unavailable")
    f64 = lambda a: np.ascontiguousarray(a, np.float64)
    bg_od = f64(bg_od)
    nlay, nwav = bg_od.shape
    i1 = np.ascontiguousarray(i1, np.int32)
    i2 = np.ascontiguousarray(i2, np.int32)
    nseg = i1.shape[0]
    albedo = np.broadcast_to(np.asarray(albedo, np.float64), (nwav,))
    costs = np.empty(nseg, np.float64)
    rc = lib.sw_cost_transmission(
        nlay, nwav, nseg, float(cos_sza), f64(layer_weight),
        f64(pressure_hl), f64(ssi), f64(albedo), f64(flux_dn_surf),
        f64(flux_up_toa), bg_od, f64(metric), f64(hr), i1, i2,
        float(flux_weight), costs)
    if rc <= 0:
        raise RuntimeError(f"native sw cross-check failed (rc={rc})")
    return costs


def sw_cost_total_transmission(cos_sza, layer_weight, pressure_hl, ssi,
                               albedo, bg_od, od, extras, i1, i2,
                               flux_weight: float) -> np.ndarray:
    """f64 SW candidate cost, total-transmission method — independent
    second implementation (ref find_g_points.cpp:173-204,340-394
    semantics)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native cross-check unavailable")
    f64 = lambda a: np.ascontiguousarray(a, np.float64)
    bg_od = f64(bg_od)
    nlay, nwav = bg_od.shape
    i1 = np.ascontiguousarray(i1, np.int32)
    i2 = np.ascontiguousarray(i2, np.int32)
    nseg = i1.shape[0]
    albedo = np.broadcast_to(np.asarray(albedo, np.float64), (nwav,))
    costs = np.empty(nseg, np.float64)
    rc = lib.sw_cost_total_transmission(
        nlay, nwav, nseg, float(cos_sza), f64(layer_weight),
        f64(pressure_hl), f64(ssi), f64(albedo), bg_od, f64(od),
        f64(extras["hr_low"]), f64(extras["flux_dn_surf_low"]),
        f64(extras["flux_up_toa_low"]),
        f64(extras["hr_high"]), f64(extras["flux_dn_surf_high"]),
        f64(extras["flux_up_toa_high"]),
        float(extras["min_scaling"]), float(extras["max_scaling"]),
        i1, i2, float(flux_weight), costs)
    if rc <= 0:
        raise RuntimeError(f"native sw-tt cross-check failed (rc={rc})")
    return costs


def gpoint_average(ng, g_point, od, weight, averaging_method,
                   pressure_fl=None):
    """f64 g-point LUT averaging, all 8 methods — independent second
    implementation of ops.average.average_od_to_gpoints (ref
    average_optical_depth.cpp:120-197 semantics)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native cross-check unavailable")
    method = _GPOINT_METHOD_IDS[averaging_method]
    od = np.ascontiguousarray(od, np.float64)
    nz, nwav = od.shape
    weight = np.ascontiguousarray(
        np.broadcast_to(np.asarray(weight, np.float64), od.shape))
    gp = np.ascontiguousarray(g_point, np.int32)
    fit = np.empty((nz, ng), np.float64)
    mn = np.empty((nz, ng), np.float64)
    mx = np.empty((nz, ng), np.float64)
    pf = None
    if pressure_fl is not None:
        pf = np.ascontiguousarray(pressure_fl, np.float64)
    rc = lib.gpoint_average(
        nz, nwav, int(ng), method, gp, od, weight,
        pf.ctypes.data if pf is not None else None, fit, mn, mx)
    if rc <= 0:
        raise RuntimeError(f"native gpoint_average failed (rc={rc})")
    return fit, mn, mx


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
