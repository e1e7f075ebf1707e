"""Cross-check the native OpenMP sweep baseline against the JAX kernel.

Two independent implementations of the LW candidate cost (transmission
method): csrc/sweep_baseline.cpp and partition/cost_kernel.CandidateCostLw.
Agreement on random inputs validates both (the native one feeds bench.py's
vs_baseline; the JAX one drives find_g_points).
"""

import numpy as np
import pytest

from ecckd_tpu.partition import cost_kernel
from ecckd_tpu.partition import native_baseline

needs_native = pytest.mark.skipif(not native_baseline.available(),
                                  reason="native baseline unavailable")


def build_problem(nlay=9, nwav=257, nseg=7, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    pressure_hl = np.exp(np.linspace(np.log(100.0), np.log(1.0e5), nlay + 1))
    k = np.sort(10.0 ** rng.uniform(-3, 1.5, nwav))
    col = (pressure_hl[1:] - pressure_hl[:-1]) / pressure_hl[-1]
    od = np.outer(col, k)
    bg_od = 0.05 * col[:, None] * np.ones((1, nwav))
    planck_hl = np.abs(rng.normal(0.3, 0.05, (nlay + 1, nwav))) + 0.05
    surf_planck = planck_hl[-1] * 1.05
    emis = np.full(nwav, 0.98)
    metric = -np.expm1(-1.66 * od)
    hr = rng.normal(0.0, 1e-5, (nlay, nwav))
    layer_weight = np.sqrt(pressure_hl[1:]) - np.sqrt(pressure_hl[:-1])
    layer_weight /= layer_weight.sum()
    flux_dn_surf = np.abs(rng.normal(0.2, 0.02, nwav))
    flux_up_toa = np.abs(rng.normal(0.25, 0.02, nwav))
    edges = np.sort(rng.choice(np.arange(1, nwav), nseg - 1,
                               replace=False))
    i1 = np.concatenate([[0], edges]).astype(np.int32)
    i2 = np.concatenate([edges - 1, [nwav - 1]]).astype(np.int32)
    seg_of_wav = np.repeat(np.arange(nseg, dtype=np.int32), i2 - i1 + 1)
    cast = lambda a: np.asarray(a, dtype)
    return dict(layer_weight=cast(layer_weight),
                pressure_hl=np.asarray(pressure_hl, np.float64),
                surf_emissivity=cast(emis), surf_planck=cast(surf_planck),
                flux_dn_surf=cast(flux_dn_surf),
                flux_up_toa=cast(flux_up_toa), planck_hl=cast(planck_hl),
                bg_od=cast(bg_od), metric=cast(metric), hr=cast(hr),
                i1=i1, i2=i2, seg_of_wav=seg_of_wav)


@needs_native
class TestNativeBaseline:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_jax_kernel(self, seed):
        p = build_problem(seed=seed)
        kernel = cost_kernel.CandidateCostLw(
            "transmission", 0.02, p["layer_weight"], p["pressure_hl"],
            p["surf_emissivity"], p["surf_planck"], p["flux_dn_surf"],
            p["flux_up_toa"], p["planck_hl"], p["bg_od"], p["metric"],
            p["hr"], use_pallas=False)
        jax_costs = kernel.costs(p["i1"], p["i2"], p["seg_of_wav"])
        native_costs = native_baseline.sweep_lw_cost_transmission(
            p["layer_weight"], p["pressure_hl"], p["surf_emissivity"],
            p["surf_planck"], p["flux_dn_surf"], p["flux_up_toa"],
            p["planck_hl"], p["bg_od"], p["metric"], p["hr"],
            p["i1"], p["i2"], 0.02)
        # Two f32 implementations with different reduction orders; the
        # pytest CPU path runs the JAX kernel in f64 via conftest x64, so
        # compare at f32-accumulation tolerance.
        np.testing.assert_allclose(native_costs, jax_costs, rtol=2e-4,
                                   atol=1e-7)

    def test_out_of_range_bounds_raise(self):
        p = build_problem()
        i1 = np.array([0], np.int32)
        i2 = np.array([10 ** 6], np.int32)
        with pytest.raises(ValueError, match="out of range"):
            native_baseline.sweep_lw_cost_transmission(
                p["layer_weight"], p["pressure_hl"], p["surf_emissivity"],
                p["surf_planck"], p["flux_dn_surf"], p["flux_up_toa"],
                p["planck_hl"], p["bg_od"], p["metric"], p["hr"],
                i1, i2, 0.02)
