"""Golden tests: CKD cost functions vs independent NumPy ports.

The NumPy implementations below are written directly from
calc_cost_function_lw.cpp:115-232 and calc_cost_function_sw.cpp:115-277,
keeping the reference's exact weight structure (20x SW TOA-up factor, the
LW unconditional broadband block, interface weights).
"""

import numpy as np
import pytest

from ecckd_tpu import constants as c
from ecckd_tpu.ops import CostWeights, cost_ckd_lw, cost_ckd_sw
from ecckd_tpu.ops import rt_lw, rt_direct_sw, rt_norayleigh_sw


def np_rt_lw(planck_hl, od, emis, surf_planck):
    nlay, ng = od.shape
    e = 1.0 - np.exp(-c.LW_DIFFUSIVITY * od)
    factor = np.where(e > 1e-5,
                      1.0 - e / c.LW_DIFFUSIVITY / np.where(od > 0, od, 1.0),
                      0.5 * e)
    fd = np.zeros((nlay + 1, ng))
    for i in range(nlay):
        fd[i + 1] = (fd[i] * (1 - e[i]) + planck_hl[i] * (e[i] - factor[i])
                     + planck_hl[i + 1] * factor[i])
    fu = np.zeros((nlay + 1, ng))
    fu[nlay] = surf_planck * emis + (1 - emis) * fd[nlay]
    for i in range(nlay - 1, -1, -1):
        fu[i] = (fu[i + 1] * (1 - e[i]) + planck_hl[i + 1] * (e[i] - factor[i])
                 + planck_hl[i] * factor[i])
    return fd, fu


def np_cost_ckd_lw(pressure_hl, planck_hl, emis_g, surf_planck, od,
                   flux_dn, flux_up, hr, layer_weight, band_mapping,
                   flux_weight, flux_profile_weight, broadband_weight,
                   spectral_boundary_weight=0.0, sdn=None, sup=None):
    """Direct port of calc_cost_function_ckd_lw (calc_cost_function_lw.cpp)."""
    hw = c.HR_WEIGHT
    nlay = len(pressure_hl) - 1
    fd_orig, fu_orig = np_rt_lw(planck_hl, od, emis_g, surf_planck)
    nband = band_mapping.max() + 1
    onehot = (band_mapping[:, None] == np.arange(nband)).astype(float)
    fd = fd_orig @ onehot
    fu = fu_orig @ onehot
    conv = -(c.ACCEL_GRAVITY / c.SPECIFIC_HEAT_AIR) / np.diff(pressure_hl)
    hr_fwd = conv[:, None] * (np.diff(fd, axis=0) - np.diff(fu, axis=0))

    cost = 0.0
    iw = flux_profile_weight * 0.5 * (layer_weight[:-1] + layer_weight[1:])
    for ib in range(nband):
        cost += (hw * hw * np.sum(layer_weight * (hr_fwd[:, ib]
                                                  - hr[:, ib]) ** 2)
                 + flux_weight * ((fd[-1, ib] - flux_dn[-1, ib]) ** 2
                                  + (fu[0, ib] - flux_up[0, ib]) ** 2))
        if flux_profile_weight > 0:
            cost += np.sum(iw * ((fd[1:-1, ib] - flux_dn[1:-1, ib]) ** 2
                                 + (fu[1:-1, ib] - flux_up[1:-1, ib]) ** 2))
    # Broadband block is UNCONDITIONAL in LW (calc_cost_function_lw.cpp:207)
    bb_hr = (hr_fwd - hr).sum(1)
    cost = (cost * (1 - broadband_weight)) / nband \
        + broadband_weight * hw * hw * np.sum(layer_weight * bb_hr ** 2) \
        + broadband_weight * flux_weight * ((fd[-1] - flux_dn[-1]).sum() ** 2
                                            + (fu[0] - flux_up[0]).sum() ** 2)
    if flux_profile_weight > 0:
        dn_err = (fd[1:-1] - flux_dn[1:-1]).sum(1)
        up_err = (fu[1:-1] - flux_up[1:-1]).sum(1)
        cost += broadband_weight * np.sum(iw * (dn_err ** 2 + up_err ** 2))
    if spectral_boundary_weight > 0 and sdn is not None:
        cost += spectral_boundary_weight * np.sum(
            (fd_orig[-1] - sdn) ** 2 + (fu_orig[0] - sup) ** 2)
    return cost


@pytest.fixture
def lw_inputs():
    rng = np.random.default_rng(0)
    nlay, ng, nband = 10, 12, 3
    pressure_hl = np.linspace(100.0, 1e5, nlay + 1)
    planck_hl = np.abs(rng.normal(5, 1, (nlay + 1, ng)))
    od = rng.gamma(0.5, 0.5, (nlay, ng))
    emis_g = np.ones(ng) * 0.98
    surf_planck = np.abs(rng.normal(8, 1, ng))
    band_mapping = np.repeat(np.arange(nband), ng // nband)
    fd = np.abs(rng.normal(10, 2, (nlay + 1, nband)))
    fu = np.abs(rng.normal(10, 2, (nlay + 1, nband)))
    hr = rng.normal(0, 1e-5, (nlay, nband))
    lw = np.sqrt(np.diff(pressure_hl))
    lw /= lw.sum()
    sdn = np.abs(rng.normal(3, 1, ng))
    sup = np.abs(rng.normal(3, 1, ng))
    return dict(pressure_hl=pressure_hl, planck_hl=planck_hl, od=od,
                emis_g=emis_g, surf_planck=surf_planck,
                band_mapping=band_mapping, fd=fd, fu=fu, hr=hr,
                layer_weight=lw, sdn=sdn, sup=sup)


class TestCostCkdLw:
    @pytest.mark.parametrize("fw,fpw,bw,sbw", [
        (0.02, 0.0, 0.5, 0.0),
        (0.1, 0.05, 0.0, 0.0),     # bb weight 0: LW block still applies
        (0.02, 0.0, 1.0, 0.0),
        (0.02, 0.01, 0.5, 0.3),    # spectral boundary term
    ])
    def test_matches_numpy_port(self, lw_inputs, fw, fpw, bw, sbw):
        d = lw_inputs
        nband = d["band_mapping"].max() + 1
        onehot = (d["band_mapping"][:, None]
                  == np.arange(nband)).astype(float)
        weights = CostWeights(flux_weight=fw, flux_profile_weight=fpw,
                              broadband_weight=bw,
                              spectral_boundary_weight=sbw)
        got = float(cost_ckd_lw(
            d["pressure_hl"], d["planck_hl"], d["emis_g"], d["surf_planck"],
            d["od"], d["fd"], d["fu"], d["hr"], d["layer_weight"], onehot,
            weights,
            spectral_flux_dn_surf=d["sdn"] if sbw > 0 else None,
            spectral_flux_up_toa=d["sup"] if sbw > 0 else None))
        expected = np_cost_ckd_lw(
            d["pressure_hl"], d["planck_hl"], d["emis_g"], d["surf_planck"],
            d["od"], d["fd"], d["fu"], d["hr"], d["layer_weight"],
            d["band_mapping"], fw, fpw, bw, sbw, d["sdn"], d["sup"])
        np.testing.assert_allclose(got, expected, rtol=1e-9)

    def test_zero_at_perfect_fit(self, lw_inputs):
        """Cost vanishes when truths equal the forward model."""
        d = lw_inputs
        ng = d["od"].shape[1]
        onehot = np.eye(ng)
        fd, fu = np_rt_lw(d["planck_hl"], d["od"], d["emis_g"],
                          d["surf_planck"])
        conv = (-(c.ACCEL_GRAVITY / c.SPECIFIC_HEAT_AIR)
                / np.diff(d["pressure_hl"]))
        hr = conv[:, None] * (np.diff(fd, axis=0) - np.diff(fu, axis=0))
        weights = CostWeights(0.02, 0.01, 0.5, 0.0)
        got = float(cost_ckd_lw(
            d["pressure_hl"], d["planck_hl"], d["emis_g"], d["surf_planck"],
            d["od"], fd, fu, hr, d["layer_weight"], onehot, weights))
        assert abs(got) < 1e-18

    def test_sw_20x_toa_up_weight(self, lw_inputs):
        """The SW cost weights the per-band TOA upwelling error 20x
        (calc_cost_function_sw.cpp:214)."""
        d = lw_inputs
        rng = np.random.default_rng(1)
        ng = d["od"].shape[1]
        nband = d["band_mapping"].max() + 1
        onehot = (d["band_mapping"][:, None]
                  == np.arange(nband)).astype(float)
        ssi_g = np.abs(rng.normal(2, 0.5, ng))
        albedo_g = np.full(ng, 0.2)
        weights = CostWeights(0.02, 0.0, 0.0, 0.0)

        def sw_cost(fu_perturb):
            fu = d["fu"] + fu_perturb
            return float(cost_ckd_sw(
                0.5, d["pressure_hl"], ssi_g, albedo_g, d["od"],
                d["fd"], fu, d["hr"], d["layer_weight"], onehot, weights,
                with_upwelling=True))

        # Perturb ONLY the TOA upwelling truth of band 0 and check the
        # quadratic coefficient is flux_weight * 20
        base = sw_cost(np.zeros_like(d["fu"]))
        pert = np.zeros_like(d["fu"])
        eps = 7.0
        # construct perturbation at TOA only
        fd0, fu0 = rt_norayleigh_sw(0.5, ssi_g, d["od"], albedo_g)
        fu0b = np.asarray(fu0) @ onehot
        delta_to_exact = fu0b[0, 0] - d["fu"][0, 0]
        pert[0, 0] = delta_to_exact  # makes band-0 TOA error zero
        zeroed = sw_cost(pert)
        pert2 = pert.copy()
        pert2[0, 0] += eps
        shifted = sw_cost(pert2)
        # cost difference from the eps perturbation = fw * 20 * eps^2
        np.testing.assert_allclose(shifted - zeroed, 0.02 * 20.0 * eps ** 2,
                                   rtol=1e-6)
