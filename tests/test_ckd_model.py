"""Tests for the CkdModel container, interpolation, and run_ckd tool."""

import numpy as np
import pytest

from ecckd_tpu.config import Config
from ecckd_tpu.constants import MOLES_PER_PA
from ecckd_tpu.io import NcFile
from ecckd_tpu.models import CkdModel, ConcDependence, temperature_fl_from_hl
from synth import synth_lw_ckd_model, synth_sw_ckd_model, synth_scenario_file


def np_interp_od_linear(model, gas, pressure_hl, temperature_fl, vmr_fl):
    """Brute-force NumPy port of CkdModel::calc_optical_depth
    (ckd_model.cpp:923-1102), LINEAR/NONE/RELATIVE_LINEAR paths."""
    g = model.gas(gas)
    logp = model.log_pressure
    temp = model.temperature
    d_log_p = logp[1] - logp[0]
    d_t = temp[1, 0] - temp[0, 0]
    ncol, nlev1 = pressure_hl.shape
    nlay = nlev1 - 1
    ng = model.ng
    od = np.zeros((ncol, nlay, ng))
    for icol in range(ncol):
        for ip in range(nlay):
            lpf = np.log(0.5 * (pressure_hl[icol, ip + 1]
                                + pressure_hl[icol, ip]))
            pidx = min(max((lpf - logp[0]) / d_log_p, 0.0), len(logp) - 1.0001)
            ip0 = int(pidx)
            pw1 = pidx - ip0
            t_0 = (1 - pw1) * temp[0, ip0] + pw1 * temp[0, ip0 + 1]
            tidx = min(max((temperature_fl[icol, ip] - t_0) / d_t, 0.0),
                       temp.shape[0] - 1.0001)
            it0 = int(tidx)
            tw1 = tidx - it0
            sw = MOLES_PER_PA * (pressure_hl[icol, ip + 1]
                                 - pressure_hl[icol, ip])
            if g.conc_dependence == ConcDependence.NONE:
                weight = sw
            elif g.conc_dependence == ConcDependence.RELATIVE_LINEAR:
                weight = sw * (vmr_fl[icol, ip] - g.reference_vmr)
            else:
                weight = sw * vmr_fl[icol, ip]
            k = ((1 - tw1) * ((1 - pw1) * g.molar_abs[it0, ip0]
                              + pw1 * g.molar_abs[it0, ip0 + 1])
                 + tw1 * ((1 - pw1) * g.molar_abs[it0 + 1, ip0]
                          + pw1 * g.molar_abs[it0 + 1, ip0 + 1]))
            od[icol, ip] = weight * k
    return od


@pytest.fixture(scope="module")
def lw_model():
    return synth_lw_ckd_model()


class TestInterpolation:
    def _atmosphere(self, ncol=2, nlay=12):
        pressure_hl = np.stack([np.linspace(150.0, 9.5e4, nlay + 1),
                                np.linspace(120.0, 1.01e5, nlay + 1)][:ncol])
        temperature_hl = np.stack([np.linspace(215.0, 290.0, nlay + 1),
                                   np.linspace(220.0, 280.0, nlay + 1)][:ncol])
        tfl = np.asarray(temperature_fl_from_hl(pressure_hl, temperature_hl))
        return pressure_hl, tfl

    def test_linear_gas(self, lw_model):
        p, t = self._atmosphere()
        vmr = np.full(t.shape, 5e-3)
        od = np.asarray(lw_model.calc_optical_depth("h2o", p, t, vmr))
        expected = np_interp_od_linear(lw_model, "h2o", p, t, vmr)
        np.testing.assert_allclose(od, expected, rtol=1e-12)

    def test_composite_gas(self, lw_model):
        p, t = self._atmosphere()
        od = np.asarray(lw_model.calc_optical_depth("composite", p, t))
        expected = np_interp_od_linear(lw_model, "composite", p, t, None)
        np.testing.assert_allclose(od, expected, rtol=1e-12)

    def test_relative_linear_gas(self, lw_model):
        p, t = self._atmosphere()
        vmr = np.full(t.shape, 8e-4)   # above reference 4e-4
        od = np.asarray(lw_model.calc_optical_depth("co2", p, t, vmr))
        expected = np_interp_od_linear(lw_model, "co2", p, t, vmr)
        np.testing.assert_allclose(od, expected, rtol=1e-12)
        # At the reference concentration the optical depth must vanish
        vmr_ref = np.full(t.shape, 4e-4)
        od0 = np.asarray(lw_model.calc_optical_depth("co2", p, t, vmr_ref))
        np.testing.assert_allclose(od0, 0.0, atol=1e-18)

    def test_gradient_through_lut(self, lw_model):
        import jax
        import jax.numpy as jnp
        p, t = self._atmosphere()
        vmr = np.full(t.shape, 5e-3)

        def loss(table):
            od = lw_model.calc_optical_depth("h2o", p, t, vmr,
                                             molar_abs_override=table)
            return jnp.sum(od)

        g = jax.grad(loss)(jnp.asarray(lw_model.gas("h2o").molar_abs))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.asarray(g).max() > 0

    def test_planck_lut(self, lw_model):
        temps = np.array([[100.0, 150.0, 250.0, 400.0]])
        out = np.asarray(lw_model.calc_planck_function(temps))
        assert out.shape == (1, 4, lw_model.ng)
        # Below table start (120 K): linear to zero
        frac = 100.0 / lw_model.temperature_planck[0]
        np.testing.assert_allclose(out[0, 0],
                                   frac * lw_model.planck_function[0],
                                   rtol=1e-12)
        # Monotone increasing with T
        assert np.all(np.diff(out[0].sum(-1)) > 0)


class TestRoundtrip:
    def test_lw_write_read(self, lw_model, tmp_path):
        path = str(tmp_path / "lw_model.nc")
        lw_model.write(path, argv=["test_write"], config_str="key value")
        model2 = CkdModel.read(path)
        assert model2.molecules == lw_model.molecules
        assert not model2.is_sw()
        assert model2.ng == lw_model.ng
        np.testing.assert_allclose(np.exp(model2.log_pressure),
                                   np.exp(lw_model.log_pressure), rtol=1e-6)
        for g1, g2 in zip(lw_model.single_gas_data, model2.single_gas_data):
            assert g1.conc_dependence == g2.conc_dependence
            np.testing.assert_allclose(g2.molar_abs, g1.molar_abs, rtol=1e-6)
            np.testing.assert_allclose(g2.min_molar_abs, g1.min_molar_abs,
                                       rtol=1e-6)
        # Provenance
        f = NcFile(path)
        assert "test_write" in f.attribute("history")
        assert "key value" in f.attribute("config")
        assert f.attribute("summary")
        f.close()

    def test_sw_write_read(self, tmp_path):
        sw = synth_sw_ckd_model()
        path = str(tmp_path / "sw_model.nc")
        sw.write(path, argv=["t"], config_str="")
        model2 = CkdModel.read(path)
        assert model2.is_sw()
        np.testing.assert_allclose(model2.solar_irradiance,
                                   sw.solar_irradiance, rtol=1e-6)
        np.testing.assert_allclose(model2.rayleigh_molar_scat,
                                   sw.rayleigh_molar_scat, rtol=1e-6)

    def test_active_gas_selection(self, lw_model, tmp_path):
        path = str(tmp_path / "lw_model2.nc")
        lw_model.write(path, argv=["t"], config_str="")
        m = CkdModel.read(path, active_gas_list=["h2o"])
        assert m.gas("h2o").is_active
        assert not m.gas("co2").is_active
        tree = m.active_lut_pytree()
        assert set(tree.keys()) == {"h2o"}
        m_all = CkdModel.read(path, active_gas_list=[])
        assert all(g.is_active for g in m_all.single_gas_data)


class TestPriorMachinery:
    def test_covariances_and_background_cost(self, lw_model, tmp_path):
        path = str(tmp_path / "m.nc")
        lw_model.write(path, argv=["t"], config_str="")
        m = CkdModel.read(path, active_gas_list=["h2o"])
        m.create_error_covariances(prior_error=1.0, pressure_corr=0.5,
                                   temperature_corr=0.5, conc_corr=0.5)
        g = m.gas("h2o")
        nx = m.nt * m.np_
        assert g.inv_background_shape.shape == (nx, nx)
        # Inverse of a correlation matrix acts as identity on it
        corr = np.linalg.inv(g.inv_background_shape
                             + np.eye(nx) * 0.0)  # may be sparsified
        delta = {"h2o": np.ones_like(g.molar_abs) * 0.1}
        cost, grads = m.calc_background_cost_function(delta)
        assert float(cost) > 0
        assert grads["h2o"].shape == g.molar_abs.shape
        # Quadratic form consistency: cost == 0.5 * sum(delta * grad)
        np.testing.assert_allclose(
            float(cost), 0.5 * np.sum(np.asarray(delta["h2o"])
                                      * np.asarray(grads["h2o"])), rtol=1e-9)

    def test_prior_error_estimated_from_min_max(self, lw_model, tmp_path):
        path = str(tmp_path / "m2.nc")
        lw_model.write(path, argv=["t"], config_str="")
        m = CkdModel.read(path, active_gas_list=["h2o"])
        m.create_error_covariances(prior_error=-1.0, prior_error_scaling=1.0)
        g = m.gas("h2o")
        # min=0.2k, max=5k -> 0.25*log(25) ~ 0.8 everywhere
        np.testing.assert_allclose(g.background_error,
                                   0.25 * np.log(25.0), rtol=1e-4)


class TestRunCkd:
    def test_lw_end_to_end(self, lw_model, tmp_path):
        from ecckd_tpu.tools.run_ckd import run_ckd
        model_path = str(tmp_path / "model.nc")
        lw_model.write(model_path, argv=["t"], config_str="")
        scen_path = synth_scenario_file(str(tmp_path / "scen.nc"))
        out_path = str(tmp_path / "out_lw.nc")
        cfg = Config({"ckd_model": model_path, "input": scen_path,
                      "output": out_path})
        run_ckd(cfg, argv=["run_ckd", "test"])

        f = NcFile(out_path)
        od = f.read("optical_depth")
        ncol = 3
        assert od.shape[0] == ncol and od.shape[2] == lw_model.ng
        assert np.all(od >= 0)
        flux_dn = f.read("flux_dn_lw")
        flux_up = f.read("flux_up_lw")
        spec_dn = f.read("spectral_flux_dn_lw")
        # Broadband = sum of spectral
        np.testing.assert_allclose(flux_dn, spec_dn.sum(-1), rtol=1e-5)
        # LW down at TOA is zero; up at surface = surface Planck (emis=1)
        np.testing.assert_allclose(flux_dn[:, 0], 0.0, atol=1e-10)
        planck_surf = f.read("planck_surf")
        np.testing.assert_allclose(flux_up[:, -1], planck_surf.sum(-1),
                                   rtol=1e-5)
        assert "run_ckd" in f.attribute("history")
        assert f.attribute("experiment") == "synthetic test scenario"
        f.close()

    def test_sw_end_to_end(self, tmp_path):
        from ecckd_tpu.tools.run_ckd import run_ckd
        sw = synth_sw_ckd_model()
        model_path = str(tmp_path / "model_sw.nc")
        sw.write(model_path, argv=["t"], config_str="")
        scen_path = synth_scenario_file(str(tmp_path / "scen.nc"))
        out_path = str(tmp_path / "out_sw.nc")
        cfg = Config({"ckd_model": model_path, "input": scen_path,
                      "output": out_path, "tsi": "1361.0"})
        run_ckd(cfg, argv=["run_ckd"])
        f = NcFile(out_path)
        inc = f.read("incoming_sw")
        np.testing.assert_allclose(inc.sum(-1), 1361.0, rtol=1e-5)
        fdd = f.read("flux_dn_direct_sw")
        # TOA direct flux = mu0 * TSI
        np.testing.assert_allclose(fdd[:, 0], 0.5 * 1361.0, rtol=1e-5)
        # Monotone decreasing downward
        assert np.all(np.diff(fdd, axis=1) <= 1e-10)
        assert f.exist("rayleigh_optical_depth")
        f.close()

    def test_gas_subset_and_scaling(self, lw_model, tmp_path):
        from ecckd_tpu.tools.run_ckd import run_ckd
        model_path = str(tmp_path / "model.nc")
        lw_model.write(model_path, argv=["t"], config_str="")
        scen_path = synth_scenario_file(str(tmp_path / "scen.nc"))
        out1 = str(tmp_path / "o1.nc")
        out2 = str(tmp_path / "o2.nc")
        run_ckd(Config({"ckd_model": model_path, "input": scen_path,
                        "output": out1, "gases": "h2o"}), argv=["r"])
        run_ckd(Config({"ckd_model": model_path, "input": scen_path,
                        "output": out2}), argv=["r"])
        f1, f2 = NcFile(out1), NcFile(out2)
        od1 = f1.read("optical_depth")
        od2 = f2.read("optical_depth")
        assert od1.sum() < od2.sum()   # subset has less absorption
        np.testing.assert_allclose(f1.read("h2o_optical_depth"),
                                   f2.read("h2o_optical_depth"), rtol=1e-6)
        f1.close(); f2.close()
