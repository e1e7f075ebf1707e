"""Tests for merge_spectra, lw_spectra, scale_lut, reorder_cloud_spectrum."""

import os

import numpy as np
import pytest

from ecckd_tpu.config import Config
from ecckd_tpu.io import NcFile, NcWriter
from ecckd_tpu.models import CkdModel
from ecckd_tpu.tools.merge_spectra import merge_spectra
from ecckd_tpu.tools.lw_spectra import lw_spectra
from ecckd_tpu.tools.scale_lut import scale_lut
from ecckd_tpu.tools.reorder_cloud_spectrum import reorder_cloud_spectrum
from synth import synth_spectrum_file, synth_sw_ckd_model


@pytest.fixture(scope="module")
def spectra(tmp_path_factory):
    d = tmp_path_factory.mktemp("aux")
    h2o = synth_spectrum_file(str(d / "h2o.h5"), molecule="h2o",
                              nwav=512, ncol=3, seed=3)
    o3 = synth_spectrum_file(str(d / "o3.h5"), molecule="o3",
                             nwav=512, ncol=3, seed=7, vmr_value=1e-6)
    return dict(d=d, h2o=h2o, o3=o3)


class TestMergeSpectra:
    def test_merge(self, spectra, tmp_path):
        out = str(tmp_path / "merged.h5")
        merge_spectra(Config({
            "output": out,
            "input": f"{spectra['h2o']} {spectra['o3']}",
        }), argv=["merge_spectra"])
        f = NcFile(out)
        od = f.read("optical_depth")
        assert od.shape[0] == 3    # all profiles
        assert f.attribute("molecule").startswith("hybrid:")
        # Sum of individual gases
        f1, f2 = NcFile(spectra["h2o"]), NcFile(spectra["o3"])
        expected = (f1.read("optical_depth", index=0)
                    + f2.read("optical_depth", index=0))
        np.testing.assert_allclose(od[0], expected, rtol=1e-6)
        f.close(); f1.close(); f2.close()

    def test_merge_with_scaling(self, spectra, tmp_path):
        out = str(tmp_path / "merged_scaled.h5")
        merge_spectra(Config({
            "output": out,
            "input": f"{spectra['h2o']} {spectra['o3']}",
            "scaling": "0.5 1.0",
        }), argv=["merge_spectra"])
        f = NcFile(out)
        f1, f2 = NcFile(spectra["h2o"]), NcFile(spectra["o3"])
        expected = (0.5 * f1.read("optical_depth", index=0)
                    + f2.read("optical_depth", index=0))
        np.testing.assert_allclose(f.read("optical_depth", index=0),
                                   expected, rtol=1e-6)
        f.close(); f1.close(); f2.close()


class TestLwSpectra:
    def test_full_resolution(self, spectra, tmp_path):
        out = str(tmp_path / "lbl_fluxes.h5")
        lw_spectra(Config({
            "output": out, "input": spectra["h2o"],
        }), argv=["lw_spectra"])
        f = NcFile(out)
        fd = f.read("flux_dn_lw")
        sfd = f.read("spectral_flux_dn_lw")
        assert fd.shape[0] == 3
        np.testing.assert_allclose(fd, sfd.sum(-1), rtol=1e-5)
        assert np.all(fd[:, 0] == 0.0)    # no downwelling at TOA
        f.close()

    def test_single_profile(self, spectra, tmp_path):
        out = str(tmp_path / "lbl_one.h5")
        lw_spectra(Config({
            "output": out, "input": spectra["h2o"], "iprofile": "1",
        }), argv=["lw_spectra"])
        f = NcFile(out)
        assert f.read("flux_up_lw").shape[0] == 1
        f.close()

    def test_gpoint_collapse_blockwise(self, spectra, tmp_path):
        """The g-point-collapsed branch streams wavenumber blocks; it must
        match the dense one-hot reduction and be block-size invariant."""
        from ecckd_tpu.io.spectrum import read_merged_spectrum
        from ecckd_tpu.ops import planck_function, rt_lw
        from ecckd_tpu.ops.average import average_od_to_gpoints

        # Non-saturating od: saturated transmission means (1 - mean ~ 1e-16)
        # amplify summation-order noise through -log1p(-mean), which would
        # test float noise rather than the blockwise execution
        spec = synth_spectrum_file(str(tmp_path / "h2o_thin.h5"),
                                   molecule="h2o", nwav=512, ncol=1,
                                   seed=3, od_scale=1e-3)
        nwav, ng = 512, 4
        gp = np.repeat(np.arange(ng), nwav // ng)
        gfile = str(tmp_path / "gp.h5")
        with NcWriter(gfile) as w:
            w.define_dimension("wavenumber", nwav)
            w.define_variable("g_point", "short", "wavenumber")
            w.write(gp.astype(np.int16), "g_point")

        outs = []
        for block in ("100", "512"):
            out = str(tmp_path / f"lbl_g_{block}.h5")
            lw_spectra(Config({
                "output": out, "input": spec, "iprofile": "0",
                "gpoints": gfile, "streaming_block_wav": block,
            }), argv=["lw_spectra"])
            outs.append(out)

        sp = read_merged_spectrum(Config({"input": spec}), 0)
        planck_hl = np.asarray(planck_function(
            sp.temperature_hl, sp.wavenumber, sp.d_wavenumber))
        fd, fu = map(np.asarray, rt_lw(planck_hl, sp.optical_depth,
                                       np.ones(nwav), planck_hl[-1]))
        onehot = (gp[:, None] == np.arange(ng)[None, :]).astype(np.float64)
        pressure_fl = 0.5 * (sp.pressure_hl[:-1] + sp.pressure_hl[1:])
        t_x_p = sp.temperature_hl * sp.pressure_hl
        t_fl = 0.5 * (t_x_p[:-1] + t_x_p[1:]) / pressure_fl
        planck_fl = np.asarray(planck_function(t_fl, sp.wavenumber,
                                               sp.d_wavenumber))
        od_ref, _, _ = average_od_to_gpoints(
            ng, gp, sp.optical_depth, planck_fl, "transmission")

        for out in outs:
            f = NcFile(out)
            # Output variables are f32 on disk -> f32-rounding tolerance
            np.testing.assert_allclose(f.read("spectral_flux_dn_lw",
                                              index=0), fd @ onehot,
                                       rtol=1e-5)
            np.testing.assert_allclose(f.read("spectral_flux_up_lw",
                                              index=0), fu @ onehot,
                                       rtol=1e-5)
            np.testing.assert_allclose(f.read("flux_dn_lw", index=0),
                                       fd.sum(1), rtol=1e-5)
            np.testing.assert_allclose(f.read("optical_depth", index=0),
                                       np.asarray(od_ref), rtol=1e-5)
            f.close()


class TestReorderCloud:
    def test_cloud_ordering(self, spectra, tmp_path):
        # Synthetic Mie file: ssa/asymmetry vs wavenumber for 2 size bins
        cloud = str(tmp_path / "mie.nc")
        ncwav = 50
        cw = np.linspace(100.0, 2500.0, ncwav)
        with NcWriter(cloud) as w:
            w.define_dimension("size", 2)
            w.define_dimension("wavenumber", ncwav)
            w.define_variable("wavenumber", "double", "wavenumber")
            w.define_variable("single_scattering_albedo", "double", "size",
                              "wavenumber")
            w.define_variable("asymmetry_factor", "double", "size",
                              "wavenumber")
            w.write(cw, "wavenumber")
            ssa = 0.5 + 0.45 * np.sin(cw / 400.0) ** 2
            w.write(np.vstack([ssa, ssa * 0.9]), "single_scattering_albedo")
            w.write(np.full((2, ncwav), 0.85), "asymmetry_factor")
        out = str(tmp_path / "cloud_order.h5")
        reorder_cloud_spectrum(Config({
            "input": cloud, "isize": "0",
            "wavenumber_input": spectra["h2o"], "output": out,
        }), argv=["reorder_cloud_spectrum"])
        from ecckd_tpu.io import read_order
        order = read_order(out)
        assert order.molecule == "cloud"
        nwav = len(order.wavenumber)
        assert sorted(order.rank.tolist()) == list(range(nwav))
        # Sorting variable is the absorptance in [0, 1]
        assert order.sorting_variable.min() >= 0.0
        assert order.sorting_variable.max() <= 1.0


class TestScaleLut:
    def test_scaling_makes_direct_flux_exact(self, tmp_path):
        """After scale_lut, the CKD direct flux of the median profile must
        match the LBL g-point fluxes exactly (within interpolation error)."""
        import jax
        model = synth_sw_ckd_model()
        ng = model.ng
        model_path = str(tmp_path / "sw.nc")
        # Need a g-point map: assign contiguous blocks of a synthetic
        # spectrum to g-points
        nwav_hr = 400
        wav_hr = np.linspace(300.0, 49000.0, nwav_hr)
        g_point = np.minimum((np.arange(nwav_hr) * ng) // nwav_hr, ng - 1)
        model.wavenumber_hr = wav_hr
        model.g_point = g_point.astype(np.int32)
        model.write(model_path, argv=["t"], config_str="")

        # Build an LBL file whose spectral direct fluxes imply specific od
        nlay = 12
        pressure_hl = np.exp(np.linspace(np.log(100.0), np.log(1e5),
                                         nlay + 1))
        temperature_hl = np.linspace(220.0, 290.0, nlay + 1)
        mu0 = 0.5
        rng = np.random.default_rng(5)
        od_true = rng.gamma(0.5, 0.3, (nlay, nwav_hr))
        flux = np.empty((nlay + 1, nwav_hr))
        flux[0] = 1.0
        for i in range(nlay):
            flux[i + 1] = flux[i] * np.exp(-od_true[i] / mu0)
        lbl_path = str(tmp_path / "lbl.nc")
        with NcWriter(lbl_path) as w:
            w.define_dimension("column", 1)
            w.define_dimension("mu0", 1)
            w.define_dimension("half_level", nlay + 1)
            w.define_dimension("level", nlay)
            w.define_dimension("gas", 1)
            w.define_dimension("wavenumber", nwav_hr)
            w.define_variable("mu0", "double", "mu0")
            w.define_variable("pressure_hl", "double", "column",
                              "half_level")
            w.define_variable("temperature_hl", "double", "column",
                              "half_level")
            w.define_variable("mole_fraction_fl", "double", "column", "gas",
                              "level")
            w.define_variable("spectral_flux_dn_direct_sw", "double",
                              "column", "half_level", "wavenumber")
            w.write(np.array([mu0]), "mu0")
            w.write(pressure_hl[None], "pressure_hl")
            w.write(temperature_hl[None], "temperature_hl")
            w.write(np.full((1, 1, nlay), 5e-3), "mole_fraction_fl")
            w.write(flux[None], "spectral_flux_dn_direct_sw")
            w.write_attribute("h2o", "constituent_id")
        out = str(tmp_path / "sw_scaled.nc")
        scale_lut(Config({
            "input": model_path, "output": out, "lblfile": lbl_path,
        }), argv=["scale_lut"])

        # Verify: total od of scaled model matches od_best per (layer, g)
        scaled = CkdModel.read(out)
        t_fl = 0.5 * (temperature_hl[:-1] + temperature_hl[1:])
        od_tot = np.zeros((nlay, ng))
        for gas in ("composite", "h2o"):
            idx = scaled.get_gas_index(gas)
            if idx < 0:
                continue
            vmr = (np.full((1, nlay), 5e-3) if gas == "h2o" else None)
            od_tot += np.asarray(scaled.calc_optical_depth(
                idx, pressure_hl[None], t_fl[None], vmr))[0]
        onehot = (g_point[:, None] == np.arange(ng)[None, :]).astype(float)
        flux_g = flux @ onehot
        od_best = -mu0 * np.log(flux_g[1:] / flux_g[:-1])
        # Where scaling was possible and not clamped by min/max bounds, the
        # scaled model's od should approximate od_best
        ratio = od_tot / od_best
        good = (od_best > 1e-6)
        # min/max clamping limits some entries; median ratio should be ~1
        assert abs(np.median(ratio[good]) - 1.0) < 0.5


class TestExportTools:
    """summarize_g_points + export_ckdmip (test/summarize_g_points.sh,
    rename_ckd_definition.sh, copy_to_ckdmip_{lw,sw}.sh equivalents)."""

    @pytest.fixture(scope="class")
    def artifacts(self, tmp_path_factory):
        from ecckd_tpu.tools.reorder_spectrum import reorder_spectrum
        from ecckd_tpu.tools.find_g_points import find_g_points
        from ecckd_tpu.tools.create_lut import create_lut
        d = tmp_path_factory.mktemp("export")
        h2o = synth_spectrum_file(str(d / "h2o.h5"), nwav=512, ncol=3)
        order = str(d / "o.h5")
        reorder_spectrum(Config({"input": h2o, "output": order}),
                         argv=["r"])
        gp = str(d / "g.h5")
        find_g_points(Config({
            "output": gp, "gases": "h2o",
            "heating_rate_tolerance": "0.4",
            "averaging_method": "transmission",
            "h2o.reordering_input": order, "h2o.input": h2o}), argv=["f"])
        lut = str(d / "lw_ckd-definition_climate_fsck-tol0.4.nc")
        create_lut(Config({
            "input": gp, "output": lut, "gases": "h2o",
            "averaging_method": "transmission",
            "h2o.conc_dependence": "linear", "h2o.input": h2o}),
            argv=["c"])
        return dict(d=d, gp=gp, lut=lut)

    def test_summarize_g_points(self, artifacts, capsys):
        from ecckd_tpu.tools.summarize_g_points import (main,
                                                        summarize_g_points)
        lines = summarize_g_points([artifacts["gp"], artifacts["lut"]])
        assert "g_point =" in lines[0]
        assert "h2o =" in lines[0]
        assert "bands =" in lines[0]
        assert "g_point =" in lines[1]
        assert main([artifacts["gp"]]) == 0
        assert artifacts["gp"] in capsys.readouterr().out
        assert main([]) == 1

    def test_export_ckdmip(self, artifacts, tmp_path):
        from ecckd_tpu.io import NcFile
        from ecckd_tpu.tools.export_ckdmip import export_ckdmip
        # A companion flux file named with the tolerance model code
        comp_dir = tmp_path / "fluxes"
        comp_dir.mkdir()
        comp = comp_dir / ("ecckd_evaluation1_lw_climate_fsck-tol0.4_"
                           "fluxes-4angle_present.nc")
        import shutil
        shutil.copyfile(artifacts["lut"], comp)
        results = str(tmp_path / "results")
        written = export_ckdmip(Config({
            "input": artifacts["lut"], "results_dir": results,
            "mode": "lw", "application": "climate",
            "band_structure": "fsck", "tolerance": "0.4",
            "companions": str(comp_dir)}), argv=["e"])
        with NcFile(artifacts["lut"]) as f:
            ng = f.size("band_number")[0]
        expect_def = os.path.join(
            results, "lw_spectral-definition",
            f"ecckd_lw_climate_fsck-{ng}_spectral-definition.nc")
        assert expect_def in written and os.path.exists(expect_def)
        expect_flux = os.path.join(
            results, "lw_fluxes",
            f"ecckd_evaluation1_lw_climate_fsck-{ng}_"
            "fluxes-4angle_present.nc")
        assert expect_flux in written and os.path.exists(expect_flux)
