"""Tests for the intricate find_g_points/optimize_lut feature paths:
g_split sub-bands, relative-to forcing mode, band-mapped LW fluxes."""

import numpy as np
import pytest

from ecckd_tpu.config import Config
from ecckd_tpu.io import NcFile, NcWriter, read_spectrum
from ecckd_tpu.io.lbl_fluxes import LblFluxes
from ecckd_tpu.models import CkdModel
from ecckd_tpu.tools.reorder_spectrum import reorder_spectrum
from ecckd_tpu.tools.find_g_points import find_g_points
from ecckd_tpu.tools.create_lut import create_lut
from ecckd_tpu.tools.optimize_lut import optimize_lut
from synth import synth_spectrum_file, synth_lbl_flux_file


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv")
    h2o = synth_spectrum_file(str(d / "h2o.h5"), molecule="h2o",
                              nwav=1024, ncol=6, seed=3)
    order = str(d / "order.h5")
    reorder_spectrum(Config({"input": h2o, "output": order}), argv=["r"])
    return dict(d=d, h2o=h2o, order=order)


class TestGSplit:
    def test_g_split_subbands(self, base, tmp_path):
        """g_split partitions the optically thin part of the band into
        wavenumber sub-bands (ref find_g_points.cpp:788-870)."""
        out = str(tmp_path / "gp_gsplit.h5")
        find_g_points(Config({
            "output": out, "gases": "h2o",
            "heating_rate_tolerance": "0.5",
            "averaging_method": "transmission",
            "h2o.reordering_input": base["order"],
            "h2o.input": base["h2o"],
            "h2o.g_split": "0.5",
            "h2o.subband_wavenumber_boundary": "1000",
        }), argv=["find_g_points"])
        f = NcFile(out)
        ng = f.size("h2o_rank1")[0]
        # Sub-band machinery: at least 2 sub-bands x >=1 g-point each plus
        # the overarching upper part
        assert ng >= 3
        r1 = f.read("h2o_rank1")
        r2 = f.read("h2o_rank2")
        assert np.all(r2 >= r1)
        assert np.all(r1[1:] <= r2[:-1] + 1)   # no gaps
        gp = f.read("h2o_g_point")
        assert gp.min() >= 0 and gp.max() == ng - 1
        # The sub-band split means the optically thin g-points separate by
        # wavenumber: g-point 0's wavenumbers all below the boundary
        wav = f.read("wavenumber")
        wav_g0 = wav[gp == 0]
        wav_g1 = wav[gp == 1]
        assert (wav_g0.max() <= 1000.0) or (wav_g1.max() <= 1000.0)
        f.close()

    def test_g_split_requires_boundary(self, base, tmp_path):
        with pytest.raises(ValueError, match="subband_wavenumber_boundary"):
            find_g_points(Config({
                "output": str(tmp_path / "x.h5"), "gases": "h2o",
                "heating_rate_tolerance": "0.5",
                "h2o.reordering_input": base["order"],
                "h2o.input": base["h2o"],
                "h2o.g_split": "0.5",
            }), argv=["find_g_points"])


@pytest.fixture(scope="module")
def lut_chain(base, tmp_path_factory):
    d = tmp_path_factory.mktemp("lutc")
    gpoints = str(d / "gp.h5")
    find_g_points(Config({
        "output": gpoints, "gases": "h2o",
        "heating_rate_tolerance": "0.3",
        "averaging_method": "transmission",
        "h2o.reordering_input": base["order"], "h2o.input": base["h2o"],
    }), argv=["find_g_points"])
    lut = str(d / "lut.nc")
    create_lut(Config({
        "input": gpoints, "output": lut, "gases": "h2o",
        "averaging_method": "transmission",
        "h2o.conc_dependence": "linear", "h2o.input": base["h2o"],
    }), argv=["create_lut"])
    return dict(d=d, gpoints=gpoints, lut=lut)


class TestRelativeTo:
    def test_forcing_mode(self, base, lut_chain, tmp_path):
        """relative_to: optimize against flux DIFFERENCES between a
        perturbed and a reference scenario (ref optimize_lut.cpp:195-237)."""
        d = tmp_path
        # Reference scenario: the plain training file; perturbed scenario:
        # same columns (here identical file is allowed; the differences are
        # then zero and the optimizer should keep coefficients ~unchanged)
        training = str(d / "train.nc")
        synth_lbl_flux_file(training, [base["h2o"]], lut_chain["gpoints"],
                            ["h2o"], iprofiles=(0, 2))
        out = str(d / "opt_rel.nc")
        rc = optimize_lut(Config({
            "input": lut_chain["lut"], "output": out, "gases": "h2o",
            "training_input": training,
            "relative_to": training,
            "max_iterations": "10", "prior_error": "4.0",
        }), argv=["optimize_lut"])
        assert rc == 0
        before = CkdModel.read(lut_chain["lut"])
        after = CkdModel.read(out)
        # Identical scenario differences are all zero, so only the prior
        # acts: coefficients stay very close to the prior
        rel = np.abs(np.log(
            np.maximum(after.gas("h2o").molar_abs, 1e-300)
            / np.maximum(before.gas("h2o").molar_abs, 1e-300)))
        pos = before.gas("h2o").molar_abs > 0
        assert np.median(rel[pos]) < 0.05


class TestBandMappedLw:
    def test_band_flux_reading_and_mapping(self, lut_chain, base, tmp_path):
        """LW band fluxes (band_flux_up_lw) with narrow->wide band_mapping
        (ref lbl_fluxes.cpp:263-298)."""
        # Build a file with 4 narrow bands
        rng = np.random.default_rng(0)
        ncol, nlay, nnarrow = 2, 8, 4
        path = str(tmp_path / "band_fluxes.nc")
        p_hl = np.tile(np.linspace(100.0, 1e5, nlay + 1), (ncol, 1))
        t_hl = np.tile(np.linspace(220.0, 290.0, nlay + 1), (ncol, 1))
        up = np.abs(rng.normal(5, 1, (ncol, nlay + 1, nnarrow)))
        dn = np.abs(rng.normal(5, 1, (ncol, nlay + 1, nnarrow)))
        with NcWriter(path) as w:
            w.define_dimension("column", ncol)
            w.define_dimension("half_level", nlay + 1)
            w.define_dimension("level", nlay)
            w.define_dimension("gas", 1)
            w.define_dimension("band", nnarrow)
            for name, data in (("pressure_hl", p_hl),
                               ("temperature_hl", t_hl)):
                w.define_variable(name, "double", "column", "half_level")
                w.write(data, name)
            w.define_variable("mole_fraction_fl", "double", "column", "gas",
                              "level")
            w.write(np.full((ncol, 1, nlay), 1e-3), "mole_fraction_fl")
            w.define_variable("flux_up_lw", "double", "column", "half_level")
            w.define_variable("flux_dn_lw", "double", "column", "half_level")
            w.write(up.sum(-1), "flux_up_lw")
            w.write(dn.sum(-1), "flux_dn_lw")
            w.define_variable("band_flux_up_lw", "double", "column",
                              "half_level", "band")
            w.define_variable("band_flux_dn_lw", "double", "column",
                              "half_level", "band")
            w.write(up, "band_flux_up_lw")
            w.write(dn, "band_flux_dn_lw")
            w.define_variable("band_wavenumber1_lw", "double", "band")
            w.define_variable("band_wavenumber2_lw", "double", "band")
            w.write(np.array([0.0, 500.0, 1000.0, 1500.0]),
                    "band_wavenumber1_lw")
            w.write(np.array([500.0, 1000.0, 1500.0, 2000.0]),
                    "band_wavenumber2_lw")
            w.write_attribute("h2o", "constituent_id")

        band_mapping = np.array([0, 0, 1, 1])
        lbl = LblFluxes.read(path, band_mapping)
        assert lbl.have_band_fluxes
        assert lbl.nspec() == 2
        np.testing.assert_allclose(
            lbl.spectral_flux_up[..., 0], up[..., :2].sum(-1), rtol=1e-12)
        np.testing.assert_allclose(lbl.band_wavenumber1, [0.0, 1000.0])
        np.testing.assert_allclose(lbl.band_wavenumber2, [1000.0, 2000.0])
        # iband_per_g consistency check: a fullband model's g-points span
        # the whole spectrum, so they cannot nest inside narrow bands and
        # the reference's validation must reject them (ckd_model.h:287-305)
        model = CkdModel.read(lut_chain["lut"])
        with pytest.raises(ValueError, match="entirely within"):
            model.iband_per_g(lbl.band_wavenumber1, lbl.band_wavenumber2)
        # With the model's own band bounds it succeeds and maps all to 0
        iband = model.iband_per_g(model.wavenumber1_band,
                                  model.wavenumber2_band)
        assert np.all(iband == 0)
