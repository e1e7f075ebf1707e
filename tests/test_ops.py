"""Golden-value and property tests for the physics kernels.

Reference formulas from src/ecckd: planck_function.cpp, heating_rate.h,
radiative_transfer_lw.cpp, radiative_transfer_sw.cpp, rayleigh_scattering.h.
NumPy re-derivations here are written independently (straight from the
formulas) so they cross-check the JAX kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecckd_tpu import constants as c
from ecckd_tpu.ops import (planck_function, rayleigh_molar_scattering_coeff,
                           heating_rate, rt_lw, rt_lw_bb, rt_lw_bb_intervals,
                           rt_direct_sw, rt_norayleigh_sw, rt_direct_sw_bb,
                           rt_norayleigh_sw_bb, rt_sw_bb_intervals,
                           interval_sum)


def make_atmosphere(nlay=10, nwav=32, seed=0):
    rng = np.random.default_rng(seed)
    pressure_hl = np.linspace(100.0, 1000e2, nlay + 1)
    wav = np.linspace(200.0, 2000.0, nwav)
    dwav = np.full(nwav, wav[1] - wav[0])
    t_hl = np.linspace(220.0, 290.0, nlay + 1)
    od = rng.gamma(0.4, 1.0, size=(nlay, nwav))
    return pressure_hl, wav, dwav, t_hl, od


def np_planck(t, wav, dwav):
    h, cc, k = c.PLANCK_H, c.SPEED_OF_LIGHT, c.BOLTZMANN_K
    freq = wav * 100.0 * cc
    pref = dwav * 2.0 * h * 100.0 * cc * np.pi / cc ** 2 * freq ** 3
    return pref / (np.exp(h / k * freq / t[:, None]) - 1.0)


class TestPlanck:
    def test_matches_formula(self):
        _, wav, dwav, t_hl, _ = make_atmosphere()
        ans = planck_function(t_hl, wav, dwav)
        np.testing.assert_allclose(np.asarray(ans), np_planck(t_hl, wav, dwav),
                                   rtol=1e-12)

    def test_integral_approaches_stefan_boltzmann(self):
        # Integrating over the full spectrum approaches sigma*T^4
        wav = np.linspace(1.0, 10000.0, 20000)
        dwav = np.full_like(wav, wav[1] - wav[0])
        t = np.array([260.0, 300.0])
        total = np.asarray(planck_function(t, wav, dwav)).sum(axis=1)
        sigma = 5.670374419e-8
        np.testing.assert_allclose(total, sigma * t ** 4, rtol=1e-3)


class TestRayleigh:
    def test_values_positive_and_decreasing(self):
        wav = np.array([2500.0, 10000.0, 25000.0, 50000.0])
        coeff = np.asarray(rayleigh_molar_scattering_coeff(wav))
        assert np.all(coeff > 0)
        assert np.all(np.diff(coeff) > 0)  # increases with wavenumber

    def test_branch_continuity(self):
        # Bucholtz branches meet near 0.5 um = 20000 cm-1
        wav = np.array([19999.0, 20001.0])
        coeff = np.asarray(rayleigh_molar_scattering_coeff(wav))
        assert abs(coeff[1] / coeff[0] - 1.0) < 0.01


class TestHeatingRate:
    def test_formula(self):
        p = np.array([1e4, 5e4, 1e5])
        fd = np.array([[1.0, 2.0], [3.0, 1.0], [2.0, 5.0]])
        fu = np.array([[0.5, 0.2], [0.1, 0.3], [0.0, 0.1]])
        hr = np.asarray(heating_rate(p, fd, fu))
        conv = -(c.ACCEL_GRAVITY / c.SPECIFIC_HEAT_AIR) / np.diff(p)
        expected = conv[:, None] * (np.diff(fd, axis=0) - np.diff(fu, axis=0))
        np.testing.assert_allclose(hr, expected, rtol=1e-12)

    def test_no_upwelling(self):
        p = np.array([1e4, 1e5])
        fd = np.array([[1.0], [0.5]])
        hr = np.asarray(heating_rate(p, fd))
        assert hr.shape == (1, 1)
        assert hr[0, 0] > 0  # absorption heats


def np_rt_lw(planck_hl, od, emis, surf_planck):
    """Independent NumPy port of radiative_transfer_lw.cpp:25-63."""
    nlay, nwav = od.shape
    e = 1.0 - np.exp(-c.LW_DIFFUSIVITY * od)
    factor = np.where(e > 1e-5,
                      1.0 - e / c.LW_DIFFUSIVITY / np.where(od > 0, od, 1.0),
                      0.5 * e)
    fd = np.zeros((nlay + 1, nwav))
    for i in range(nlay):
        fd[i + 1] = (fd[i] * (1 - e[i]) + planck_hl[i] * (e[i] - factor[i])
                     + planck_hl[i + 1] * factor[i])
    fu = np.zeros((nlay + 1, nwav))
    fu[nlay] = surf_planck * emis + (1 - emis) * fd[nlay]
    for i in range(nlay - 1, -1, -1):
        fu[i] = (fu[i + 1] * (1 - e[i]) + planck_hl[i + 1] * (e[i] - factor[i])
                 + planck_hl[i] * factor[i])
    return fd, fu


class TestRtLw:
    def setup_method(self):
        p, wav, dwav, t_hl, od = make_atmosphere()
        self.p = p
        self.planck_hl = np_planck(t_hl, wav, dwav)
        self.od = od
        self.emis = np.full(od.shape[1], 0.97)
        self.surf_planck = np_planck(np.array([292.0]), wav, dwav)[0]

    def test_matches_reference_recurrence(self):
        fd, fu = rt_lw(self.planck_hl, self.od, self.emis, self.surf_planck)
        efd, efu = np_rt_lw(self.planck_hl, self.od, self.emis,
                            self.surf_planck)
        np.testing.assert_allclose(np.asarray(fd), efd, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(fu), efu, rtol=1e-9, atol=1e-12)

    def test_energy_bounds(self):
        fd, fu = rt_lw(self.planck_hl, self.od, self.emis, self.surf_planck)
        assert np.all(np.asarray(fd) >= 0)
        assert np.all(np.asarray(fu) >= 0)

    def test_opaque_limit(self):
        # With huge optical depth, downwelling flux at surface approaches the
        # local Planck function
        od = np.full_like(self.od, 1.0e4)
        fd, fu = rt_lw(self.planck_hl, od, self.emis, self.surf_planck)
        np.testing.assert_allclose(np.asarray(fd)[-1], self.planck_hl[-1],
                                   rtol=1e-3)

    def test_bb_matches_spectral_sum(self):
        grey = np.linspace(0.0, 0.2, self.od.shape[0])
        fd_bb, fu_bb = rt_lw_bb(self.planck_hl, self.od, grey, self.emis,
                                self.surf_planck)
        fd, fu = rt_lw(self.planck_hl, self.od + grey[:, None], self.emis,
                       self.surf_planck)
        np.testing.assert_allclose(np.asarray(fd_bb)[1:],
                                   np.asarray(fd).sum(1)[1:], rtol=1e-9)
        np.testing.assert_allclose(np.asarray(fu_bb),
                                   np.asarray(fu).sum(1), rtol=1e-9)

    def test_interval_variant(self):
        nwav = self.od.shape[1]
        i1 = np.array([0, 10, 20], np.int32)
        i2 = np.array([9, 19, nwav - 1], np.int32)
        seg = np.repeat([0, 1, 2], [10, 10, nwav - 20]).astype(np.int32)
        grey_prof = np.abs(np.random.default_rng(1).normal(
            0.1, 0.05, (self.od.shape[0], 3)))
        grey_wav = grey_prof[:, seg]
        fd, fu = rt_lw_bb_intervals(self.planck_hl, self.od, grey_wav,
                                    self.emis, self.surf_planck, i1, i2)
        # Each interval must equal an independent bb run on its slice
        for k in range(3):
            sl = slice(i1[k], i2[k] + 1)
            fd_k, fu_k = rt_lw_bb(self.planck_hl[:, sl], self.od[:, sl],
                                  grey_prof[:, k], self.emis[sl],
                                  self.surf_planck[sl])
            np.testing.assert_allclose(np.asarray(fd)[:, k],
                                       np.asarray(fd_k), rtol=1e-9)
            np.testing.assert_allclose(np.asarray(fu)[:, k],
                                       np.asarray(fu_k), rtol=1e-9)

    def test_interval_strategies_identical(self):
        """The materialized (one big membership matmul per direction) and
        in-scan (memory-lean `_bb`) strategies must agree to rounding:
        same recurrence and tiling; the backend may order intra-tile
        matmul accumulation differently for matrix vs vector operands."""
        nwav = self.od.shape[1]
        i1 = np.array([0, 10, 20], np.int32)
        i2 = np.array([9, 19, nwav - 1], np.int32)
        seg = np.repeat([0, 1, 2], [10, 10, nwav - 20]).astype(np.int32)
        grey_wav = np.abs(np.random.default_rng(1).normal(
            0.1, 0.05, (self.od.shape[0], 3)))[:, seg]
        out_m = rt_lw_bb_intervals(self.planck_hl, self.od, grey_wav,
                                   self.emis, self.surf_planck, i1, i2,
                                   materialize=True)
        out_s = rt_lw_bb_intervals(self.planck_hl, self.od, grey_wav,
                                   self.emis, self.surf_planck, i1, i2,
                                   materialize=False)
        for a, b in zip(out_m, out_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12)

    def test_gradient_flows(self):
        def loss(od):
            fd, fu = rt_lw(self.planck_hl, od, self.emis, self.surf_planck)
            return jnp.sum(fd) + jnp.sum(fu)

        g = jax.grad(loss)(jnp.asarray(self.od))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)


class TestRtSw:
    def setup_method(self):
        p, wav, dwav, t_hl, od = make_atmosphere(seed=3)
        self.p = p
        self.ssi = np.linspace(0.5, 2.0, od.shape[1])
        self.od = od * 0.1
        self.albedo = np.full(od.shape[1], 0.3)

    def test_direct_beer_lambert(self):
        fd = np.asarray(rt_direct_sw(0.5, self.ssi, self.od))
        expected_surface = 0.5 * self.ssi * np.exp(
            -self.od.sum(0) / 0.5)
        np.testing.assert_allclose(fd[-1], expected_surface, rtol=1e-12)
        np.testing.assert_allclose(fd[0], 0.5 * self.ssi, rtol=1e-15)

    def test_norayleigh_up(self):
        fd, fu = rt_norayleigh_sw(0.5, self.ssi, self.od, self.albedo)
        fu = np.asarray(fu)
        np.testing.assert_allclose(
            fu[-1], np.asarray(fd)[-1] * self.albedo, rtol=1e-12)
        expected_toa_up = fu[-1] * np.exp(-2.0 * self.od.sum(0))
        np.testing.assert_allclose(fu[0], expected_toa_up, rtol=1e-12)

    def test_bb_matches_spectral(self):
        grey = np.linspace(0.0, 0.05, self.od.shape[0])
        fd_bb = np.asarray(rt_direct_sw_bb(0.5, self.ssi, self.od, grey))
        fd = np.asarray(rt_direct_sw(0.5, self.ssi, self.od + grey[:, None]))
        np.testing.assert_allclose(fd_bb, fd.sum(1), rtol=1e-9)

        fdb, fub = rt_norayleigh_sw_bb(0.5, self.ssi, self.od, grey, 0.3)
        fd2, fu2 = rt_norayleigh_sw(0.5, self.ssi, self.od + grey[:, None],
                                    self.albedo)
        np.testing.assert_allclose(np.asarray(fdb), np.asarray(fd2).sum(1),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(fub), np.asarray(fu2).sum(1),
                                   rtol=1e-9)

    def test_interval_variant(self):
        nlay, nwav = self.od.shape
        i1 = np.array([0, 16], np.int32)
        i2 = np.array([15, nwav - 1], np.int32)
        seg = np.repeat([0, 1], [16, nwav - 16]).astype(np.int32)
        grey_prof = np.abs(np.random.default_rng(2).normal(
            0.02, 0.01, (nlay, 2)))
        fd, fu = rt_sw_bb_intervals(0.5, self.ssi, self.od,
                                    grey_prof[:, seg], 0.3, i1, i2)
        for k in range(2):
            sl = slice(i1[k], i2[k] + 1)
            fdk, fuk = rt_norayleigh_sw_bb(0.5, self.ssi[sl], self.od[:, sl],
                                           grey_prof[:, k], 0.3)
            np.testing.assert_allclose(np.asarray(fd)[:, k], np.asarray(fdk),
                                       rtol=1e-9)
            np.testing.assert_allclose(np.asarray(fu)[:, k], np.asarray(fuk),
                                       rtol=1e-9)

    def test_interval_strategies_identical(self):
        nlay, nwav = self.od.shape
        i1 = np.array([0, 16], np.int32)
        i2 = np.array([15, nwav - 1], np.int32)
        seg = np.repeat([0, 1], [16, nwav - 16]).astype(np.int32)
        grey = np.abs(np.random.default_rng(2).normal(
            0.02, 0.01, (nlay, 2)))[:, seg]
        out_m = rt_sw_bb_intervals(0.5, self.ssi, self.od, grey, 0.3,
                                   i1, i2, materialize=True)
        out_s = rt_sw_bb_intervals(0.5, self.ssi, self.od, grey, 0.3,
                                   i1, i2, materialize=False)
        for a, b in zip(out_m, out_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12)


class TestIntervalSum:
    def test_basic(self):
        v = np.arange(20.0).reshape(2, 10)
        i1 = np.array([0, 3], np.int32)
        i2 = np.array([2, 9], np.int32)
        out = np.asarray(interval_sum(v, i1, i2))
        np.testing.assert_allclose(out[:, 0], v[:, 0:3].sum(1))
        np.testing.assert_allclose(out[:, 1], v[:, 3:10].sum(1))

    def test_overlapping_intervals(self):
        v = np.arange(10.0)
        i1 = np.array([0, 0], np.int32)
        i2 = np.array([9, 4], np.int32)
        out = np.asarray(interval_sum(v, i1, i2))
        np.testing.assert_allclose(out, [45.0, 10.0])
