"""Unit tests of repartition_g_points (ref single_gas_data.cpp:129-284):
error-density-based re-splitting of an existing g-point distribution."""

import numpy as np
import pytest

from ecckd_tpu.partition.gas_data import SingleGasData, repartition_g_points


def _gas(n_g_points, rank1, rank2, error, nband=1):
    n_g_points = np.asarray(n_g_points, np.int32)
    band = np.repeat(np.arange(nband, dtype=np.int32), n_g_points)
    return SingleGasData(
        molecule="h2o", n_g_points=n_g_points, band_number=band,
        rank1=np.asarray(rank1, np.int64), rank2=np.asarray(rank2, np.int64),
        error=np.asarray(error, np.float64),
        sorting_variable=np.zeros(len(rank1)))


class TestRepartition:
    def test_uniform_density_equal_weights_splits_evenly(self):
        """With uniform weights and equal per-g errors the error density is
        flat, so re-splitting 2 -> 4 g-points gives ~equal-width ranges."""
        nwav = 400
        src = _gas([2], [0, 200], [199, 399], [1.0, 1.0])
        weight = np.ones(nwav)
        rank = np.arange(nwav)
        dest = repartition_g_points(src, weight, rank,
                                    n_g_points=np.array([4]))
        assert dest.ng() == 4
        # Bounds contiguous and monotone, covering the full range
        assert dest.rank1[0] == 0 and dest.rank2[-1] == nwav - 1
        np.testing.assert_array_equal(dest.rank1[1:], dest.rank2[:-1] + 1)
        widths = dest.rank2 - dest.rank1 + 1
        assert widths.min() >= 80 and widths.max() <= 120

    def test_density_gradient_shifts_bounds(self):
        """A g-point with higher error (denser error) gets split finer."""
        nwav = 400
        src = _gas([2], [0, 200], [199, 399], [3.0, 1.0])
        weight = np.ones(nwav)
        rank = np.arange(nwav)
        dest = repartition_g_points(src, weight, rank,
                                    n_g_points=np.array([4]))
        widths = dest.rank2 - dest.rank1 + 1
        # More g-points concentrate where error density is high (low ranks)
        assert widths[0] < widths[-1]
        assert dest.rank2[-1] == nwav - 1

    def test_default_keeps_g_point_counts(self):
        nwav = 300
        src = _gas([3], [0, 100, 200], [99, 199, 299], [1.0, 2.0, 1.5])
        dest = repartition_g_points(src, np.ones(nwav), np.arange(nwav))
        assert dest.ng() == src.ng()
        np.testing.assert_array_equal(dest.n_g_points, src.n_g_points)
        assert dest.rank1[0] == 0 and dest.rank2[-1] == nwav - 1

    def test_multiband_preserves_band_structure(self):
        nwav = 200
        src = _gas([2, 2], [0, 50, 100, 150], [49, 99, 149, 199],
                   [1.0, 1.0, 2.0, 2.0], nband=2)
        dest = repartition_g_points(src, np.ones(nwav), np.arange(nwav),
                                    n_g_points=np.array([3, 1]))
        assert dest.ng() == 4
        np.testing.assert_array_equal(dest.band_number, [0, 0, 0, 1])
        # Band boundaries respected
        assert dest.rank2[2] == 99
        assert dest.rank1[3] == 100 and dest.rank2[3] == 199
