"""Pallas sweep kernel vs the XLA reference implementation (interpret mode)."""

import numpy as np
import pytest

from ecckd_tpu.ops.rt_lw import rt_lw_bb_intervals
from ecckd_tpu.ops.pallas.sweep_lw import rt_lw_bb_intervals_pallas


class TestPallasSweepLw:
    def _inputs(self, nlay=12, nwav=2500, nseg=5, seed=0, dtype=np.float32):
        rng = np.random.default_rng(seed)
        planck = np.abs(rng.normal(5, 1, (nlay + 1, nwav))).astype(dtype)
        bg_od = rng.gamma(0.5, 0.4, (nlay, nwav)).astype(dtype)
        od_fit = rng.gamma(0.5, 0.4, (nlay, nseg)).astype(dtype)
        emis = np.ones(nwav, dtype)
        surfp = np.abs(rng.normal(8, 1, nwav)).astype(dtype)
        edges = np.linspace(0, nwav, nseg + 1).astype(np.int32)
        i1 = edges[:-1]
        i2 = edges[1:] - 1
        seg = np.repeat(np.arange(nseg, dtype=np.int32), np.diff(edges))
        return planck, bg_od, od_fit, emis, surfp, i1, i2, seg

    def test_matches_xla(self):
        planck, bg_od, od_fit, emis, surfp, i1, i2, seg = self._inputs()
        grey = od_fit[:, seg]
        fd_ref, fu_ref = rt_lw_bb_intervals(planck, bg_od, grey, emis,
                                            surfp, i1, i2)
        fd, fu = rt_lw_bb_intervals_pallas(planck, bg_od, od_fit, seg,
                                           emis, surfp, i1, i2,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(fd), np.asarray(fd_ref),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(fu), np.asarray(fu_ref),
                                   rtol=2e-5)

    def test_non_tile_aligned(self):
        # nwav not a multiple of the tile: padding must not contribute
        planck, bg_od, od_fit, emis, surfp, i1, i2, seg = self._inputs(
            nwav=1333, nseg=3, seed=4)
        grey = od_fit[:, seg]
        fd_ref, fu_ref = rt_lw_bb_intervals(planck, bg_od, grey, emis,
                                            surfp, i1, i2)
        fd, fu = rt_lw_bb_intervals_pallas(planck, bg_od, od_fit, seg,
                                           emis, surfp, i1, i2,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(fd), np.asarray(fd_ref),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(fu), np.asarray(fu_ref),
                                   rtol=2e-5)

    def test_overlapping_boundary_index(self):
        # Shared boundary index belongs to both intervals (ceil/floor map)
        planck, bg_od, od_fit, emis, surfp, i1, i2, seg = self._inputs(
            nwav=2048, nseg=4, seed=7)
        i1 = np.array([0, 500, 1000, 1500], np.int32)
        i2 = np.array([500, 1000, 1500, 2047], np.int32)  # overlaps
        grey = od_fit[:, seg]
        fd_ref, fu_ref = rt_lw_bb_intervals(planck, bg_od, grey, emis,
                                            surfp, i1, i2)
        fd, fu = rt_lw_bb_intervals_pallas(planck, bg_od, od_fit, seg,
                                           emis, surfp, i1, i2,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(fd), np.asarray(fd_ref),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(fu), np.asarray(fu_ref),
                                   rtol=2e-5)


class TestPallasSweepSw:
    def _inputs(self, nlay=10, nwav=2100, nseg=4, seed=2,
                dtype=np.float32):
        rng = np.random.default_rng(seed)
        ssi = np.abs(rng.normal(2, 0.5, nwav)).astype(dtype)
        bg_od = rng.gamma(0.4, 0.2, (nlay, nwav)).astype(dtype)
        od_fit = rng.gamma(0.4, 0.2, (nlay, nseg)).astype(dtype)
        edges = np.linspace(0, nwav, nseg + 1).astype(np.int32)
        i1, i2 = edges[:-1], edges[1:] - 1
        seg = np.repeat(np.arange(nseg, dtype=np.int32), np.diff(edges))
        return ssi, bg_od, od_fit, i1, i2, seg

    def test_matches_xla_with_up(self):
        from ecckd_tpu.ops.rt_sw import rt_sw_bb_intervals
        from ecckd_tpu.ops.pallas.sweep_sw import rt_sw_bb_intervals_pallas
        ssi, bg_od, od_fit, i1, i2, seg = self._inputs()
        grey = od_fit[:, seg]
        fd_ref, fu_ref = rt_sw_bb_intervals(0.5, ssi, bg_od, grey, 0.15,
                                            i1, i2, with_upwelling=True)
        fd, fu = rt_sw_bb_intervals_pallas(ssi, bg_od, od_fit, seg, i1, i2,
                                           cos_sza=0.5, albedo=0.15,
                                           with_upwelling=True,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(fd), np.asarray(fd_ref),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(fu), np.asarray(fu_ref),
                                   rtol=2e-5)

    def test_matches_xla_direct_only(self):
        from ecckd_tpu.ops.rt_sw import rt_sw_bb_intervals
        from ecckd_tpu.ops.pallas.sweep_sw import rt_sw_bb_intervals_pallas
        ssi, bg_od, od_fit, i1, i2, seg = self._inputs(seed=9, nwav=1024)
        grey = od_fit[:, seg]
        fd_ref, _ = rt_sw_bb_intervals(0.5, ssi, bg_od, grey, 0.0,
                                       i1, i2, with_upwelling=False)
        fd, fu = rt_sw_bb_intervals_pallas(ssi, bg_od, od_fit, seg, i1, i2,
                                           cos_sza=0.5, albedo=0.0,
                                           with_upwelling=False,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(fd), np.asarray(fd_ref),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(fu), 0.0)
