"""End-to-end tests for find_g_points on synthetic spectra."""

import numpy as np
import pytest

from ecckd_tpu.config import Config
from ecckd_tpu.io import NcFile
from ecckd_tpu.partition.gas_data import (SingleGasData, overlap_g_points,
                                          merged_g_point_map)
from ecckd_tpu.tools.reorder_spectrum import reorder_spectrum
from ecckd_tpu.tools.find_g_points import find_g_points
from synth import synth_spectrum_file


@pytest.fixture(scope="module")
def pipeline_inputs(tmp_path_factory):
    """Synthetic spectra + reorderings for two gases."""
    d = tmp_path_factory.mktemp("fgp")
    h2o = synth_spectrum_file(str(d / "h2o.h5"), molecule="h2o",
                              nwav=1024, seed=3)
    o3 = synth_spectrum_file(str(d / "o3.h5"), molecule="o3",
                             nwav=1024, seed=7, vmr_value=1e-6)
    h2o_order = str(d / "h2o_order.h5")
    o3_order = str(d / "o3_order.h5")
    reorder_spectrum(Config({"input": h2o, "output": h2o_order}), argv=["r"])
    reorder_spectrum(Config({"input": o3, "output": o3_order}), argv=["r"])
    return dict(d=d, h2o=h2o, o3=o3, h2o_order=h2o_order, o3_order=o3_order)


class TestOverlap:
    def test_hogan_2010_counts(self):
        """ng per band = 1 - ngas + sum(ng_i) (Hogan 2010 Eq. 7)."""
        g1 = SingleGasData("a", np.array([3, 2]), np.array([0, 0, 0, 1, 1]),
                           np.arange(5), np.arange(5) + 1,
                           np.ones(5), np.array([0.1, 0.5, 0.9, 0.2, 0.8]))
        g2 = SingleGasData("b", np.array([2, 2]), np.array([0, 0, 1, 1]),
                           np.arange(4), np.arange(4) + 1,
                           np.ones(4), np.array([0.3, 0.7, 0.4, 0.6]))
        band_number = overlap_g_points([g1, g2])
        # band 0: 1-2+(3+2)=4; band 1: 1-2+(2+2)=3
        assert len(band_number) == 7
        np.testing.assert_array_equal(band_number,
                                      [0, 0, 0, 0, 1, 1, 1])
        # First merged point per band intersects both gases' weakest
        assert g1.g_min[0] == 0 and g2.g_min[0] == 0
        # Advancement follows smallest next sorting variable:
        # candidates after merged point 0: g1 next sv=0.5, g2 next sv=0.7
        assert g1.g_min[1] == 1 and g1.g_max[1] == 1   # g1 advanced
        assert g2.g_min[1] == 0 and g2.g_max[1] == 0   # g2 not yet advanced
        # g_min/g_max monotone non-decreasing within a band
        for g in (g1, g2):
            assert np.all(np.diff(g.g_max[:4]) >= 0)

    def test_single_gas_overlap_is_identity(self):
        g = SingleGasData("a", np.array([4]), np.zeros(4, int),
                          np.array([0, 3, 6, 9]), np.array([2, 5, 8, 11]),
                          np.ones(4), np.linspace(0, 1, 4))
        band_number = overlap_g_points([g])
        assert len(band_number) == 4
        np.testing.assert_array_equal(g.g_min, np.arange(4))
        np.testing.assert_array_equal(g.g_max, np.arange(4))


class TestFindGPointsLw:
    @pytest.fixture(scope="class")
    def output(self, pipeline_inputs, tmp_path_factory):
        d = pipeline_inputs["d"]
        out = str(tmp_path_factory.mktemp("out") / "gpoints_lw.h5")
        cfg = Config({
            "output": out,
            "gases": "h2o o3",
            "heating_rate_tolerance": "0.4",
            "tolerance_tolerance": "0.02",
            "max_iterations": "30",
            "averaging_method": "transmission",
            "flux_weight": "0.02",
            "h2o.reordering_input": pipeline_inputs["h2o_order"],
            "h2o.input": pipeline_inputs["h2o"],
            "h2o.background_input": pipeline_inputs["o3"],
            "o3.reordering_input": pipeline_inputs["o3_order"],
            "o3.input": pipeline_inputs["o3"],
            "o3.background_input": pipeline_inputs["h2o"],
        })
        find_g_points(cfg, argv=["find_g_points", "test"])
        return out

    def test_block_size_invariance(self, pipeline_inputs, output,
                                   tmp_path):
        """Streamed rank-order reads and blockwise truth fluxes must be
        invariant to the block size: a tiny streaming_block_wav reproduces
        the default output's g-point map exactly."""
        out2 = str(tmp_path / "gpoints_blocked.h5")
        find_g_points(Config({
            "output": out2,
            "gases": "h2o o3",
            "heating_rate_tolerance": "0.4",
            "tolerance_tolerance": "0.02",
            "max_iterations": "30",
            "averaging_method": "transmission",
            "flux_weight": "0.02",
            "streaming_block_wav": "37",     # pathological block size
            "h2o.reordering_input": pipeline_inputs["h2o_order"],
            "h2o.input": pipeline_inputs["h2o"],
            "h2o.background_input": pipeline_inputs["o3"],
            "o3.reordering_input": pipeline_inputs["o3_order"],
            "o3.input": pipeline_inputs["o3"],
            "o3.background_input": pipeline_inputs["h2o"],
        }), argv=["find_g_points"])
        a, b = NcFile(output), NcFile(out2)
        np.testing.assert_array_equal(a.read("g_point"), b.read("g_point"))
        for gas in ("h2o", "o3"):
            np.testing.assert_array_equal(a.read(f"{gas}_rank1"),
                                          b.read(f"{gas}_rank1"))
            np.testing.assert_array_equal(a.read(f"{gas}_rank2"),
                                          b.read(f"{gas}_rank2"))
            np.testing.assert_allclose(a.read(f"{gas}_error"),
                                       b.read(f"{gas}_error"), rtol=1e-12)
        a.close(); b.close()

    def test_output_structure(self, output):
        f = NcFile(output)
        assert f.read_scalar("n_gases") == 2
        assert f.attribute("constituent_id") == "h2o o3"
        ng = f.size("band_number")[0]
        assert ng >= 1
        for m in ("h2o", "o3"):
            ngm = f.size(f"{m}_rank1")[0]
            r1 = f.read(f"{m}_rank1")
            r2 = f.read(f"{m}_rank2")
            assert np.all(r2 >= r1)
            # contiguous coverage: next rank1 == previous rank2 + 1
            assert np.all(r1[1:] == r2[:-1] + 1)
            assert r1[0] == 0
            gmin = f.read(f"{m}_g_min")
            gmax = f.read(f"{m}_g_max")
            assert np.all(gmax >= gmin)
            assert gmax.max() == ngm - 1
            err = f.read(f"{m}_error")
            assert np.all(err >= 0)
        # merged ng consistent with Hogan 2010
        ng_h2o = f.size("h2o_rank1")[0]
        ng_o3 = f.size("o3_rank1")[0]
        assert ng == 1 - 2 + ng_h2o + ng_o3
        f.close()

    def test_gpoint_map(self, output):
        f = NcFile(output)
        gp = f.read("g_point")
        ng = f.size("band_number")[0]
        # Every wavenumber assigned, all g-points occupied
        assert gp.min() >= 0
        assert set(np.unique(gp)) == set(range(ng))
        # Per-gas maps consistent with merged map
        h2o_gp = f.read("h2o_g_point")
        h2o_gmin = f.read("h2o_g_min")
        h2o_gmax = f.read("h2o_g_max")
        for ig in range(ng):
            sel = gp == ig
            assert np.all(h2o_gp[sel] >= h2o_gmin[ig])
            assert np.all(h2o_gp[sel] <= h2o_gmax[ig])
        f.close()

    def test_errors_below_tolerance_scale(self, output):
        f = NcFile(output)
        for m in ("h2o", "o3"):
            err = f.read(f"{m}_error")
            # Per-g-point heating-rate error should be of order the
            # tolerance (the search is conservative so may be well below)
            assert err.max() < 0.4 * 2.0
        f.close()

    def test_min_g_points_override(self, pipeline_inputs, tmp_path):
        out = str(tmp_path / "gp_min.h5")
        cfg = Config({
            "output": out, "gases": "h2o",
            "heating_rate_tolerance": "1000.0",   # huge => 1 interval
            "h2o.min_g_points": "5",
            "averaging_method": "transmission",
            "h2o.reordering_input": pipeline_inputs["h2o_order"],
            "h2o.input": pipeline_inputs["h2o"],
        })
        find_g_points(cfg, argv=["f"])
        f = NcFile(out)
        assert f.size("h2o_rank1")[0] == 5
        f.close()

    def test_base_split(self, pipeline_inputs, tmp_path):
        out = str(tmp_path / "gp_split.h5")
        cfg = Config({
            "output": out, "gases": "h2o",
            "heating_rate_tolerance": "0.4",
            "averaging_method": "transmission",
            "h2o.base_split": "3",
            "h2o.reordering_input": pipeline_inputs["h2o_order"],
            "h2o.input": pipeline_inputs["h2o"],
        })
        find_g_points(cfg, argv=["f"])
        f = NcFile(out)
        r1 = f.read("h2o_rank1")
        r2 = f.read("h2o_rank2")
        # ceil/floor index mapping permits single-point overlaps but no gaps
        # (ref find_g_points.cpp:282-287)
        assert np.all(r1[1:] <= r2[:-1] + 1)
        assert np.all(r2 >= r1)
        # base_split 3 must increase the g-point count vs the plain run
        assert f.size("h2o_rank1")[0] >= 3
        f.close()
