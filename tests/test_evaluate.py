"""Tests of the evaluation-metrics subsystem (ecckd_tpu/evaluate/),
the equivalent of the reference's Matlab acceptance-test layer
(plot/calc_hr.m, plot/calc_hr_error.m, plot/evaluate_ckd_lw_fluxes.m)."""

import json

import numpy as np
import pytest

from ecckd_tpu.evaluate import (accuracy_efficiency_table, calc_hr,
                                calc_hr_error, evaluate_fluxes, flux_stats,
                                format_stats)
from ecckd_tpu.io import NcWriter


def _profiles(ncol=4, nlay=20, seed=0):
    rng = np.random.default_rng(seed)
    # Log-spaced half-level pressure 1 hPa -> 1000 hPa, in Pa
    p_hl = np.exp(np.linspace(np.log(100.0), np.log(1.0e5), nlay + 1))
    p_hl = np.broadcast_to(p_hl, (ncol, nlay + 1)).copy()
    flux_dn = np.cumsum(rng.uniform(0.5, 2.0, (ncol, nlay + 1)), axis=1)
    flux_up = flux_dn + rng.uniform(0.0, 5.0, (ncol, nlay + 1))
    return p_hl, flux_dn, flux_up


def test_calc_hr_matches_formula():
    """hr = -86400 * (g/cp) * d(dn-up)/dp with the Matlab constants
    (plot/calc_hr.m:6-8 uses g=9.81, cp=1004)."""
    p_hl, flux_dn, flux_up = _profiles()
    hr = calc_hr(flux_dn, flux_up, p_hl)
    net = flux_dn - flux_up
    expect = (-86400.0 * 9.81 / 1004.0 * np.diff(net, axis=1)
              / np.diff(p_hl, axis=1))
    np.testing.assert_allclose(hr, expect, rtol=1e-14)


def test_calc_hr_error_constant_offset():
    """Weights are normalized per profile (plot/calc_hr_error.m:19-22), so
    a constant heating-rate offset d gives RMS error exactly |d|."""
    p_hl, flux_dn, flux_up = _profiles()
    hr_ref = calc_hr(flux_dn, flux_up, p_hl)
    err = calc_hr_error(0.01 * p_hl, hr_ref + 0.37, hr_ref)
    assert err == pytest.approx(0.37, rel=1e-12)


def test_calc_hr_error_pressure_range_masking():
    """Errors outside the pressure range must not contribute
    (plot/calc_hr_error.m:15-17, lower-inclusive upper-exclusive on the
    full-level pressure)."""
    p_hl, flux_dn, flux_up = _profiles(ncol=2)
    p_hl_hpa = 0.01 * p_hl
    p_fl = 0.5 * (p_hl_hpa[:, :-1] + p_hl_hpa[:, 1:])
    hr_ref = calc_hr(flux_dn, flux_up, p_hl)
    # Corrupt only layers with p_fl >= 100 hPa; evaluate below 100 hPa
    hr = hr_ref + np.where(p_fl >= 100.0, 123.0, 0.0)
    assert calc_hr_error(p_hl_hpa, hr, hr_ref, (0.0, 100.0)) == \
        pytest.approx(0.0, abs=1e-12)
    # ... and the corrupted range sees exactly the constant offset
    assert calc_hr_error(p_hl_hpa, hr, hr_ref, (100.0, np.inf)) == \
        pytest.approx(123.0, rel=1e-12)


def test_flux_stats_bias_rmse():
    p_hl, flux_dn, flux_up = _profiles(ncol=3)
    ref = {"pressure_hl": p_hl, "flux_up_lw": flux_up,
           "flux_dn_lw": flux_dn}
    # TOA up shifted by +2, surface down by column-dependent offsets
    offsets = np.array([1.0, -1.0, 3.0])
    flux_up2 = flux_up.copy()
    flux_up2[:, 0] += 2.0
    flux_dn2 = flux_dn.copy()
    flux_dn2[:, -1] += offsets
    ckd = {"pressure_hl": p_hl, "flux_up_lw": flux_up2,
           "flux_dn_lw": flux_dn2}
    s = flux_stats(ref, ckd, band="lw")
    assert s["toa_up_bias"] == pytest.approx(2.0)
    assert s["toa_up_rmse"] == pytest.approx(2.0)
    assert s["surf_dn_bias"] == pytest.approx(offsets.mean())
    assert s["surf_dn_rmse"] == pytest.approx(
        np.sqrt(np.mean(offsets ** 2)))
    assert "RMSE heating rate" in format_stats(s)


def _write_flux_file(path, p_hl, flux_dn, flux_up, band="lw"):
    ncol, nhl = p_hl.shape
    with NcWriter(str(path)) as w:
        w.define_dimension("column", ncol)
        w.define_dimension("half_level", nhl)
        for name, data in [("pressure_hl", p_hl),
                           (f"flux_up_{band}", flux_up),
                           (f"flux_dn_{band}", flux_dn)]:
            w.define_variable(name, "double", "column", "half_level")
            w.write(data, name)


def test_evaluate_fluxes_files_and_cli(tmp_path):
    p_hl, flux_dn, flux_up = _profiles(ncol=3, seed=4)
    ref_path = tmp_path / "lbl.nc"
    ckd_path = tmp_path / "ckd.nc"
    _write_flux_file(ref_path, p_hl, flux_dn, flux_up)
    _write_flux_file(ckd_path, p_hl, flux_dn + 0.5, flux_up - 0.25)
    s = evaluate_fluxes(str(ref_path), str(ckd_path))
    assert s["surf_dn_bias"] == pytest.approx(0.5)
    assert s["toa_up_bias"] == pytest.approx(-0.25)

    rows = accuracy_efficiency_table(str(ref_path),
                                     [str(ckd_path), str(ref_path)])
    assert rows[1]["toa_up_rmse"] == pytest.approx(0.0, abs=1e-12)

    from ecckd_tpu.tools.evaluate_ckd import main
    out = tmp_path / "stats.json"
    rc = main([f"ref_fluxes={ref_path}", f"ckd_fluxes={ckd_path}",
               "model_names=test-model", f"output={out}"])
    assert rc == 0
    blob = json.loads(out.read_text())
    assert blob["models"][0]["model"] == "test-model"
    assert blob["models"][0]["surf_dn_bias"] == pytest.approx(0.5)
