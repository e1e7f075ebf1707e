"""Tests for the evaluation-figure layer (reference plot/*.m equivalents)."""

import json
import os

import numpy as np
import pytest

from ecckd_tpu.config import Config
from ecckd_tpu.evaluate import plots
from ecckd_tpu.io.ncio import NcWriter
from ecckd_tpu.tools.plot_ckd import plot_ckd


@pytest.fixture(scope="module")
def flux_files(tmp_path_factory):
    """Two small LW flux files: an LBL 'truth' and a perturbed CKD run."""
    d = tmp_path_factory.mktemp("plots")
    rng = np.random.default_rng(7)
    ncol, nhl = 4, 12
    p_hl = np.exp(np.linspace(np.log(100.0), np.log(1.013e5), nhl))
    p_hl = np.tile(p_hl, (ncol, 1))
    flux_dn = np.cumsum(rng.uniform(2, 8, (ncol, nhl)), axis=1)
    flux_up = flux_dn + rng.uniform(20, 40, (ncol, 1))

    def write(path, up, dn):
        with NcWriter(path) as w:
            w.define_dimension("column", ncol)
            w.define_dimension("half_level", nhl)
            for name in ("pressure_hl", "flux_up_lw", "flux_dn_lw"):
                w.define_variable(name, "double", "column", "half_level")
            w.write(p_hl, "pressure_hl")
            w.write(up, "flux_up_lw")
            w.write(dn, "flux_dn_lw")
        return path

    ref = write(str(d / "lbl.nc"), flux_up, flux_dn)
    ckd = write(str(d / "ckd.nc"), flux_up + rng.normal(0, 0.5, (ncol, nhl)),
                flux_dn + rng.normal(0, 0.5, (ncol, nhl)))
    return dict(d=d, ref=ref, ckd=ckd)


@pytest.fixture(scope="module")
def gpoint_file(tmp_path_factory):
    """Minimal g-point file with two gases over two bands."""
    d = tmp_path_factory.mktemp("gp")
    path = str(d / "gpoints.h5")
    with NcWriter(path) as w:
        w.define_dimension("wavenumber", 100)
        w.define_dimension("band", 2)
        w.define_dimension("h2o_g_point", 4)
        w.define_dimension("o3_g_point", 3)
        w.define_variable("wavenumber", "double", "wavenumber")
        w.define_variable("wavenumber1_band", "double", "band")
        w.define_variable("wavenumber2_band", "double", "band")
        for gas, ng in (("h2o", 4), ("o3", 3)):
            w.define_variable(f"{gas}_n_g_points", "int", "band")
            for v in ("rank1", "rank2", "band_number"):
                w.define_variable(f"{gas}_{v}", "int", f"{gas}_g_point")
        w.write(np.linspace(1, 2000, 100), "wavenumber")
        w.write([0.0, 1000.0], "wavenumber1_band")
        w.write([1000.0, 2000.0], "wavenumber2_band")
        w.write([3, 1], "h2o_n_g_points")
        w.write([0, 20, 40, 0], "h2o_rank1")
        w.write([19, 39, 49, 49], "h2o_rank2")
        w.write([0, 0, 0, 1], "h2o_band_number")
        w.write([2, 1], "o3_n_g_points")
        w.write([0, 25, 0], "o3_rank1")
        w.write([24, 49, 49], "o3_rank2")
        w.write([0, 0, 1], "o3_band_number")
    return path


def _check_png(path):
    assert os.path.exists(path)
    assert os.path.getsize(path) > 2000
    with open(path, "rb") as f:
        assert f.read(4) == b"\x89PNG"


class TestPlots:
    def test_plot_gpoints(self, gpoint_file, tmp_path):
        out = plots.plot_gpoints(gpoint_file, str(tmp_path / "gp.png"))
        _check_png(out)

    def test_discover_gases(self, gpoint_file):
        from ecckd_tpu.io import NcFile
        with NcFile(gpoint_file) as f:
            assert plots.discover_gases(f.names()) == ["h2o", "o3"]

    def test_plot_evaluation(self, flux_files, tmp_path):
        out = plots.plot_evaluation(flux_files["ref"], flux_files["ckd"],
                                    str(tmp_path / "eval.png"))
        _check_png(out)

    def test_plot_flux_profiles(self, flux_files, tmp_path):
        out = plots.plot_flux_profiles(flux_files["ref"],
                                       flux_files["ckd"],
                                       str(tmp_path / "prof.png"))
        _check_png(out)

    def test_plot_accuracy_efficiency(self, tmp_path):
        tables = {
            "narrow": [{"n_g_points": 16, "heating_rate_low_rmse": 0.2},
                       {"n_g_points": 64, "heating_rate_low_rmse": 0.05}],
            "wide": [{"n_g_points": 32, "heating_rate_low_rmse": 0.1}],
        }
        out = plots.plot_accuracy_efficiency(tables,
                                             str(tmp_path / "acc.png"))
        _check_png(out)

    def test_plot_averaging_methods(self, tmp_path):
        stats = {
            "linear": {"heating_rate_low_rmse": 0.3,
                       "heating_rate_high_rmse": 0.5},
            "transmission": {"heating_rate_low_rmse": 0.1,
                             "heating_rate_high_rmse": 0.2},
        }
        out = plots.plot_averaging_methods(stats,
                                           str(tmp_path / "avg.png"))
        _check_png(out)


class TestPlotCkdTool:
    def test_cli_evaluation(self, flux_files, tmp_path):
        out = str(tmp_path / "eval.png")
        plot_ckd(Config({"plot": "evaluation",
                         "ref_fluxes": flux_files["ref"],
                         "ckd_fluxes": flux_files["ckd"],
                         "output": out}))
        _check_png(out)

    def test_cli_gpoints(self, gpoint_file, tmp_path):
        out = str(tmp_path / "gp.png")
        plot_ckd(Config({"plot": "gpoints", "input": gpoint_file,
                         "output": out}))
        _check_png(out)

    def test_cli_averaging_methods(self, flux_files, tmp_path):
        out = str(tmp_path / "avg.png")
        plot_ckd(Config({"plot": "averaging-methods",
                         "ref_fluxes": flux_files["ref"],
                         "ckd_fluxes": f"{flux_files['ckd']} "
                                       f"{flux_files['ckd']}",
                         "methods": "linear transmission",
                         "output": out}))
        _check_png(out)

    def test_cli_accuracy_efficiency(self, flux_files, tmp_path):
        stats = {"models": [
            {"n_g_points": 16, "heating_rate_low_rmse": 0.2},
            {"n_g_points": 64, "heating_rate_low_rmse": 0.05}]}
        sfile = str(tmp_path / "s.json")
        with open(sfile, "w") as f:
            json.dump(stats, f)
        out = str(tmp_path / "acc.png")
        plot_ckd(Config({"plot": "accuracy-efficiency", "input": sfile,
                         "labels": "narrow", "output": out}))
        _check_png(out)

    def test_cli_unknown_plot(self, tmp_path):
        with pytest.raises(ValueError, match="not understood"):
            plot_ckd(Config({"plot": "pie", "output": "x.png"}))

    def test_orchestrator_plots_stage(self, tmp_path):
        """plots=1 adds figure stages to the workflow pipeline."""
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from synth import synth_spectrum_file
        from ecckd_tpu.pipeline.orchestrator import build_pipeline
        h2o = synth_spectrum_file(str(tmp_path / "h2o.h5"),
                                  molecule="h2o", nwav=256, ncol=6, seed=3)
        work = str(tmp_path / "work")
        cfg = Config({
            "mode": "lw", "work_dir": work, "application": "test",
            "band_structure": "fsck", "tolerance": "0.3", "gases": "h2o",
            "plots": "1", "averaging_method": "transmission",
            "h2o.input": h2o, "h2o.conc_dependence": "linear",
        })
        pipe = build_pipeline(cfg)
        names = [s.name for s in pipe.steps]
        assert "plot_gpoints" in names
        pipe.steps = [s for s in pipe.steps if s.name in
                      ("reorder_h2o", "find_g_points", "plot_gpoints")]
        pipe.run()
        _check_png(os.path.join(work, "lw_gpoints_lw_test_fsck.png"))

    def test_cli_missing_ngpoints(self, tmp_path):
        sfile = str(tmp_path / "bad.json")
        with open(sfile, "w") as f:
            json.dump({"models": [{"heating_rate_low_rmse": 0.2}]}, f)
        with pytest.raises(ValueError, match="n_g_points"):
            plot_ckd(Config({"plot": "accuracy-efficiency", "input": sfile,
                             "output": str(tmp_path / "acc.png")}))
