"""Tests for the L4 preset layer (band structures, applications).

Reference semantics: test/config.h:138-168 band definitions,
test/check_configuration.h:16-57 validation and application settings,
find_g_points_{lw,sw}.sh hardwired per-gas tweaks.
"""

import pytest

from ecckd_tpu.config import Config
from ecckd_tpu.pipeline import presets
from ecckd_tpu.pipeline.orchestrator import build_pipeline


def test_lw_band_structures():
    wn1, wn2 = presets.band_boundaries("lw", "narrow")
    assert len(wn1) == len(wn2) == 13
    assert wn1[0] == 0 and wn2[-1] == 3260
    # contiguous bands: each upper bound is the next lower bound
    assert wn1[1:] == wn2[:-1]

    wn1, wn2 = presets.band_boundaries("lw", "wide")
    assert len(wn1) == 5 and wn2[-1] == 3260

    assert presets.band_boundaries("lw", "fsck") == ([], [])


def test_sw_band_structures():
    for name, nband, last in [("narrow", 13, 50000), ("wide", 5, 50000),
                              ("double", 2, 50000), ("rgb", 5, 50000),
                              ("gb", 5, 50000), ("fine", 25, 50000),
                              ("vfine", 44, 50000), ("window", 19, 50000),
                              ("window-uv", 20, 86000),
                              ("photolysis", 16, 86000)]:
        wn1, wn2 = presets.band_boundaries("sw", name)
        assert len(wn1) == len(wn2) == nband, name
        assert wn2[-1] == last, name
        assert wn1[1:] == wn2[:-1], name  # contiguous


def test_unknown_band_structure_raises():
    with pytest.raises(ValueError, match="not understood"):
        presets.band_boundaries("lw", "rgb")  # rgb is SW-only
    with pytest.raises(ValueError, match="not understood"):
        presets.band_boundaries("sw", "nonexistent")


def test_application_settings():
    # check_configuration.h:36-57
    assert presets.application_settings("climate")["min_pressure"] == 2.0
    assert presets.application_settings("global-nwp")["min_pressure"] == 2.0
    lim = presets.application_settings("limited-area-nwp")
    assert lim["min_pressure"] == 400.0
    assert lim["app"] == "nwp"
    # do_all_lw.sh:40-44 multi-pass order for climate
    assert presets.application_settings("climate")["optimize_modes"] == [
        "relative-base", "relative-ch4", "relative-n2o", "relative-cfc"]
    with pytest.raises(ValueError, match="not understood"):
        presets.application_settings("mesoscale")


def test_lw_fsck_gas_tweaks():
    # find_g_points_lw.sh:342-358: thresholds on the tolerance
    opts = presets.gas_preset_options("lw", "fsck", 0.01)
    assert opts["ch4"]["min_g_points"] == "3"
    assert opts["h2o"]["base_split"] == "2"
    opts = presets.gas_preset_options("lw", "fsck", 0.02)
    assert "ch4" not in opts  # only below 0.018
    assert opts["h2o"]["base_split"] == "2"
    opts = presets.gas_preset_options("lw", "fsck", 0.05)
    assert opts == {}


def test_sw_gas_tweaks():
    # find_g_points_sw.sh:56-78
    opts = presets.gas_preset_options("sw", "rgb", 0.05)
    assert opts["o3"]["min_g_points"] == "1 1 1 1 3"
    opts = presets.gas_preset_options("sw", "window", 0.04)
    assert opts["ch4"]["min_g_points"] == "2"
    assert opts["o3"]["min_g_points"].split().count("4") == 1
    assert len(opts["o3"]["min_g_points"].split()) == 19


def test_check_configuration_requires_tolerance():
    with pytest.raises(ValueError, match="tolerance"):
        presets.check_configuration("lw", "climate", "narrow", None)
    with pytest.raises(ValueError, match="mode"):
        presets.check_configuration("mw", "climate", "narrow", 0.01)


def test_orchestrator_expands_presets(tmp_path):
    cfg = Config({
        "mode": "lw", "work_dir": str(tmp_path),
        "application": "climate", "band_structure": "narrow",
        "tolerance": "0.013", "gases": "h2o ch4",
        "h2o.input": "dummy.h5", "ch4.input": "dummy.h5",
    })
    build_pipeline(cfg)
    assert cfg.exist("wavenumber1")
    assert cfg.read_floats("wavenumber1")[0] == 0.0
    assert cfg.read_floats("wavenumber2")[-1] == 3260.0
    assert cfg.read_float("min_pressure") == 2.0


def test_orchestrator_fsck_tweaks(tmp_path):
    cfg = Config({
        "mode": "lw", "work_dir": str(tmp_path),
        "application": "climate", "band_structure": "fsck",
        "tolerance": "0.0161", "gases": "h2o ch4",
        "h2o.input": "dummy.h5", "ch4.input": "dummy.h5",
    })
    build_pipeline(cfg)
    # fsck = single full-spectrum band: no boundary lists
    assert not cfg.exist("wavenumber1")
    assert cfg.read_string("ch4.min_g_points") == "3"
    assert cfg.read_string("h2o.base_split") == "2"


def test_orchestrator_explicit_keys_win(tmp_path):
    cfg = Config({
        "mode": "lw", "work_dir": str(tmp_path),
        "application": "limited-area-nwp", "band_structure": "wide",
        "tolerance": "0.0083", "gases": "h2o",
        "h2o.input": "dummy.h5",
        "min_pressure": "100", "wavenumber1": "0 1000",
        "wavenumber2": "1000 3260",
    })
    build_pipeline(cfg)
    assert cfg.read_float("min_pressure") == 100.0
    assert cfg.read_floats("wavenumber1") == [0.0, 1000.0]


def test_orchestrator_unknown_application_skips(tmp_path):
    # ad-hoc application names (used by the test pipeline) skip expansion
    cfg = Config({
        "mode": "lw", "work_dir": str(tmp_path),
        "application": "test", "band_structure": "fsck",
        "tolerance": "0.04", "gases": "h2o",
        "h2o.input": "dummy.h5",
    })
    build_pipeline(cfg)
    assert not cfg.exist("min_pressure")


def test_reference_tolerance_tables():
    # do_all_lw.sh:59-75 comments
    assert presets.LW_REFERENCE_TOLERANCES["narrow"][64] == 0.013
    assert presets.LW_REFERENCE_TOLERANCES["fsck"][32] == 0.0161
    assert presets.SW_REFERENCE_TOLERANCES["narrow"][64] == 0.019


def test_radiance_band_structures():
    """Channel (radiance) band structures: do_all_lw_radiance.sh:28-44,
    do_all_sw_radiance.sh:20-29.  Bands are per-channel and follow the
    reference's channel order (not ascending wavenumber)."""
    wn1, wn2 = presets.band_boundaries("lw", "microwave")
    assert wn1 == [1.03071, 5.47379] and wn2 == [1.03738, 5.60054]
    wn1, wn2 = presets.band_boundaries("lw", "msi")
    assert len(wn1) == 3 and all(a < b for a, b in zip(wn1, wn2))
    wn1, wn2 = presets.band_boundaries("lw", "modis")
    assert len(wn1) == 4
    wn1, wn2 = presets.band_boundaries("sw", "msi")
    assert len(wn1) == 4
    wn1, wn2 = presets.band_boundaries("sw", "modis")
    assert len(wn1) == 8
    for a, b in zip(wn1, wn2):
        assert a < b


def test_nwp_microwave_application():
    """do_all_lw_radiance.sh:12-14 + find_g_points_lw.sh:286-320:
    monochromatic models, zero flux weight, no optimize pass."""
    s = presets.application_settings("nwp-microwave")
    assert s["monochromatic"] is True
    assert s["optimize_modes"] == []
    assert s["defaults"]["flux_weight"] == "0.0"
    assert s["defaults"]["tolerance_tolerance"] == "0.015"


def test_monochromatic_pipeline_skips_optimize(tmp_path):
    """An nwp-microwave workflow must not contain optimize steps; the
    final ckd-definition is the raw LUT (finalize copy)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import synth_spectrum_file
    h2o = synth_spectrum_file(str(tmp_path / "h2o.h5"), nwav=512, ncol=3)
    cfg = Config({
        "mode": "lw", "application": "nwp-microwave",
        "band_structure": "fsck", "work_dir": str(tmp_path / "w"),
        "gases": "h2o", "tolerance": "0.5",
        "h2o.input": h2o, "h2o.conc_dependence": "linear",
    })
    pipe = build_pipeline(cfg)
    names = [s.name for s in pipe.steps]
    assert "finalize" in names
    assert not any(n.startswith("optimize") for n in names)
    # Application defaults landed without overriding anything explicit
    assert cfg.read_string("flux_weight") == "0.0"
    assert cfg.read_string("averaging_method") == "transmission"
    pipe.run()
    final = os.path.join(str(tmp_path / "w"),
                         "lw_ckd-definition_lw_nwp-microwave_fsck.nc")
    assert os.path.exists(final)
