"""Full SW pipeline end-to-end: reorder -> find_g_points (total-transmission)
-> create_lut -> optimize_lut -> run_ckd with Rayleigh + solar spectrum."""

import numpy as np
import pytest

from ecckd_tpu.config import Config
from ecckd_tpu.io import NcFile, read_spectrum
from ecckd_tpu.io.lbl_fluxes import LblFluxes
from ecckd_tpu.models import CkdModel
from ecckd_tpu.tools.reorder_spectrum import reorder_spectrum
from ecckd_tpu.tools.find_g_points import find_g_points
from ecckd_tpu.tools.create_lut import create_lut
from ecckd_tpu.tools.optimize_lut import optimize_lut
from ecckd_tpu.tools.run_ckd import run_ckd
from synth import (synth_spectrum_file, synth_ssi_file,
                   synth_sw_lbl_flux_file, synth_scenario_file)


@pytest.fixture(scope="module")
def sw_chain(tmp_path_factory):
    d = tmp_path_factory.mktemp("sw")
    h2o = synth_spectrum_file(str(d / "h2o.h5"), molecule="h2o",
                              nwav=1024, ncol=6, seed=11, is_sw=True)
    sp = read_spectrum(h2o, 0)
    ssi_path, ssi = synth_ssi_file(str(d / "ssi.h5"), sp.wavenumber)

    order = str(d / "order.h5")
    reorder_spectrum(Config({"input": h2o, "output": order,
                             "ssi": ssi_path,
                             "threshold_optical_depth": "0.25"}),
                     argv=["reorder_spectrum"])

    gpoints = str(d / "gpoints.h5")
    find_g_points(Config({
        "output": gpoints, "gases": "h2o", "ssi": ssi_path,
        "heating_rate_tolerance": "0.8",
        "averaging_method": "total-transmission",
        "h2o.reordering_input": order, "h2o.input": h2o,
        "h2o.min_scaling": "0.5", "h2o.max_scaling": "2.0",
    }), argv=["find_g_points"])

    lut = str(d / "lut_sw.nc")
    create_lut(Config({
        "input": gpoints, "output": lut, "gases": "h2o",
        "ssi": ssi_path, "averaging_method": "transmission",
        "h2o.conc_dependence": "linear", "h2o.input": h2o,
    }), argv=["create_lut"])

    training = str(d / "training_sw.nc")
    synth_sw_lbl_flux_file(training, [h2o], gpoints, ["h2o"], ssi,
                           iprofiles=(0, 3))
    return dict(d=d, h2o=h2o, ssi=ssi_path, order=order, gpoints=gpoints,
                lut=lut, training=training)


class TestSwReorder:
    def test_order_uses_od_threshold(self, sw_chain):
        from ecckd_tpu.io import read_order
        order = read_order(sw_chain["order"])
        assert np.all(np.isfinite(order.sorting_variable))
        nwav = len(order.wavenumber)
        assert sorted(order.rank.tolist()) == list(range(nwav))


class TestSwGpoints:
    def test_gpoint_file(self, sw_chain):
        f = NcFile(sw_chain["gpoints"])
        assert f.exist("solar_irradiance")
        si = f.read("solar_irradiance")
        assert np.all(si > 0)
        ng = f.size("band_number")[0]
        assert ng >= 2
        f.close()


class TestSwLut:
    def test_sw_model(self, sw_chain):
        model = CkdModel.read(sw_chain["lut"])
        assert model.is_sw()
        assert model.rayleigh_molar_scat is not None
        assert np.all(model.rayleigh_molar_scat >= 0)
        assert model.reference_total_solar_irradiance > 0
        # Per-g solar irradiance sums to ~TSI
        np.testing.assert_allclose(model.solar_irradiance.sum(), 1361.0,
                                   rtol=0.02)


class TestSwLblFluxes:
    def test_sza_expansion(self, sw_chain):
        lbl = LblFluxes.read(sw_chain["training"])
        assert lbl.is_sw
        # 2 profiles x 3 SZA indices {0, 2, 4}
        assert lbl.ncol == 6
        np.testing.assert_allclose(lbl.mu0[:3], [0.9, 0.5, 0.1])
        assert lbl.tsi > 0
        # Effective albedo = up/dn at surface
        assert np.all(lbl.effective_spectral_albedo >= 0)

    def test_rayleigh_masking(self, sw_chain):
        lbl = LblFluxes.read(sw_chain["training"])
        nspec = lbl.nspec()
        # Pretend the spectral axis is bands: half below, half above the
        # no-Rayleigh limit
        lbl.have_band_fluxes = True
        lbl.band_wavenumber1 = np.linspace(250.0, 40000.0, nspec)
        lbl.band_wavenumber2 = lbl.band_wavenumber1 + 9000.0
        lbl.effective_spectral_albedo = np.full(nspec, 0.15)
        lbl.mask_rayleigh_up(10000.0)
        masked = lbl.band_wavenumber2 > 10000.0
        assert np.all(lbl.spectral_flux_up[:, :, masked] == 0.0)
        assert np.all(lbl.effective_spectral_albedo[masked] == 0.0)
        assert np.all(lbl.effective_spectral_albedo[~masked] == 0.15)
        assert np.any(~masked) and np.any(masked)


class TestSwOptimize:
    def test_sw_optimization(self, sw_chain, tmp_path):
        out = str(tmp_path / "lut_sw_opt.nc")
        rc = optimize_lut(Config({
            "input": sw_chain["lut"], "output": out, "gases": "h2o",
            "training_input": sw_chain["training"],
            "max_iterations": "30", "prior_error": "4.0",
        }), argv=["optimize_lut"])
        assert rc == 0
        model = CkdModel.read(out)
        assert model.is_sw()
        g = model.gas("h2o")
        assert np.all(np.isfinite(g.molar_abs))
        assert np.all(g.molar_abs >= 0)

    def test_sw_rayleigh_optimization(self, sw_chain, tmp_path):
        out = str(tmp_path / "lut_sw_ray.nc")
        rc = optimize_lut(Config({
            "input": sw_chain["lut"], "output": out, "gases": "h2o",
            "training_input": sw_chain["training"],
            "max_iterations": "5", "prior_error": "4.0",
            "rayleigh_prior_error": "0.5",
        }), argv=["optimize_lut"])
        assert rc == 0
        before = CkdModel.read(sw_chain["lut"])
        after = CkdModel.read(out)
        # Rayleigh coefficients were part of the state (may shift slightly)
        assert after.rayleigh_molar_scat.shape == \
            before.rayleigh_molar_scat.shape
        assert np.all(np.isfinite(after.rayleigh_molar_scat))


class TestSwRunCkd:
    def test_evaluation(self, sw_chain, tmp_path):
        scen = synth_scenario_file(str(tmp_path / "scen.nc"))
        out = str(tmp_path / "fluxes_sw.nc")
        run_ckd(Config({"ckd_model": sw_chain["lut"], "input": scen,
                        "output": out}), argv=["run_ckd"])
        f = NcFile(out)
        fdd = f.read("flux_dn_direct_sw")
        np.testing.assert_allclose(fdd[:, 0], 0.5 * 1361.0, rtol=1e-4)
        assert np.all(np.diff(fdd, axis=1) <= 1e-9)
        assert f.exist("rayleigh_optical_depth")
        f.close()


class TestDebugPartition:
    def test_debug_partition_dumps_components(self, sw_chain, tmp_path,
                                              capfd):
        """debug_partition re-evaluates the final partition and dumps
        per-g-point cost components to stderr (ref find_g_points.cpp:
        1416-1423, calc_cost_function_sw.cpp:93-105), with LOW/HIGH/MID
        sections for the total-transmission method."""
        out = str(tmp_path / "gpoints_dbg.h5")
        find_g_points(Config({
            "output": out, "gases": "h2o", "ssi": sw_chain["ssi"],
            "heating_rate_tolerance": "0.8",
            "averaging_method": "total-transmission",
            "debug_partition": "1",
            "h2o.reordering_input": sw_chain["order"],
            "h2o.input": sw_chain["h2o"],
            "h2o.min_scaling": "0.5", "h2o.max_scaling": "2.0",
        }), argv=["find_g_points"])
        err = capfd.readouterr().err
        assert "debug_partition_H2O_band = 0" in err
        for tag in ("LOW", "HIGH", "MID"):
            assert f"debug_partition_{tag}" in err
        for key in ("flux_dn_surf_true", "flux_dn_surf_fit", "hr_fit",
                    "cf_hr", "cf_flux"):
            assert f"debug_partition.{key} = " in err

    def test_debug_partition_plain_method(self, sw_chain, tmp_path, capfd):
        """Non-total-transmission methods dump a single (MID) component
        set per g-point, without LOW/HIGH sections."""
        out = str(tmp_path / "gpoints_dbg_lin.h5")
        find_g_points(Config({
            "output": out, "gases": "h2o", "ssi": sw_chain["ssi"],
            "heating_rate_tolerance": "0.8",
            "averaging_method": "transmission",
            "debug_partition": "1",
            "h2o.reordering_input": sw_chain["order"],
            "h2o.input": sw_chain["h2o"],
        }), argv=["find_g_points"])
        err = capfd.readouterr().err
        assert "debug_partition_H2O_band = 0" in err
        assert "debug_partition_LOW" not in err
        assert "debug_partition.cf_hr = " in err
