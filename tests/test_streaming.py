"""Tests for the native shard loader, shard format, and streaming averaging."""

import numpy as np
import pytest

from ecckd_tpu.io.native import NativeFile, PrefetchPool, get_lib
from ecckd_tpu.io.shards import (write_shard, convert_spectrum_file,
                                 ShardReader)
from ecckd_tpu.io import read_spectrum
from ecckd_tpu.ops.streaming import streaming_average_od_to_gpoints
from ecckd_tpu.ops.average import average_od_to_gpoints
from synth import synth_spectrum_file


class TestNativeLoader:
    def test_library_builds(self):
        assert get_lib() is not None, "native shard loader failed to build"

    def test_sync_read(self, tmp_path):
        path = str(tmp_path / "data.bin")
        data = np.arange(10000, dtype=np.float32)
        data.tofile(path)
        with NativeFile(path) as f:
            assert f.native
            assert f.size == data.nbytes
            out = f.read(400, 800).view(np.float32)
            np.testing.assert_array_equal(out, data[100:300])

    def test_async_pool(self, tmp_path):
        path = str(tmp_path / "data.bin")
        data = np.arange(65536, dtype=np.float64)
        data.tofile(path)
        with NativeFile(path) as f, PrefetchPool(2) as pool:
            assert pool.native
            # Submit several overlapping requests, retrieve out of order
            for tag in range(4):
                pool.submit(f, tag * 1024 * 8, 1024 * 8, tag)
            for tag in (2, 0, 3, 1):
                out = pool.wait(tag).view(np.float64)
                np.testing.assert_array_equal(
                    out, data[tag * 1024:(tag + 1) * 1024])

    def test_python_fallback(self, tmp_path):
        path = str(tmp_path / "data.bin")
        np.arange(100, dtype=np.uint8).tofile(path)
        f = NativeFile(path)
        f._handle = None   # force fallback
        f._py_file = open(path, "rb")
        out = f.read(10, 20)
        np.testing.assert_array_equal(out, np.arange(10, 30, dtype=np.uint8))
        f.close()


class TestShards:
    @pytest.fixture(scope="class")
    def shard(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("shards")
        h5 = synth_spectrum_file(str(d / "h2o.h5"), nwav=2048, ncol=2)
        paths = convert_spectrum_file(h5, str(d / "h2o"), iprofiles=[0])
        return dict(h5=h5, shard=paths[0])

    def test_roundtrip(self, shard):
        sp = read_spectrum(shard["h5"], 0)
        with ShardReader(shard["shard"]) as r:
            assert r.nwav == len(sp.wavenumber)
            assert r.nlay == sp.optical_depth.shape[0]
            np.testing.assert_allclose(r.wavenumber, sp.wavenumber)
            np.testing.assert_allclose(r.pressure_hl, sp.pressure_hl)
            block = r.read_block(100, 50)
            np.testing.assert_allclose(
                block, sp.optical_depth[:, 100:150], rtol=1e-6)

    def test_blocked_iteration_covers_spectrum(self, shard):
        sp = read_spectrum(shard["h5"], 0)
        with ShardReader(shard["shard"]) as r:
            total = np.zeros(r.nlay)
            count = 0
            for iwav0, block in r.iter_blocks(block_wav=300):
                total += block.sum(axis=1)
                count += block.shape[1]
            assert count == r.nwav
            np.testing.assert_allclose(total, sp.optical_depth.sum(1),
                                       rtol=1e-5)

    def test_streaming_average_matches_dense(self, shard, tmp_path):
        # Use a float64 shard: the -log(1 - mean) inversion of transmission
        # averaging is ill-conditioned for saturated layers, matching the
        # reference's double precision (average_optical_depth.cpp)
        sp = read_spectrum(shard["h5"], 0)
        shard64 = write_shard(str(tmp_path / "f64.spbin"), sp,
                              dtype=np.float64)
        nwav = len(sp.wavenumber)
        ng = 6
        rng = np.random.default_rng(0)
        g_point = rng.integers(0, ng, nwav)
        weight = np.abs(rng.normal(5, 1, (sp.optical_depth.shape[0], nwav)))

        fit_d, min_d, max_d = average_od_to_gpoints(
            ng, g_point, sp.optical_depth, weight, "transmission")
        with ShardReader(shard64) as r:
            fit_s, min_s, max_s = streaming_average_od_to_gpoints(
                r, ng, g_point, lambda i0, n: weight[:, i0:i0 + n],
                "transmission", block_wav=500)
        fit_d = np.asarray(fit_d)
        # Saturated layers (transmission mean ~= 1) are ill-conditioned in
        # the -log(1-mean) inversion: summation-order differences at the
        # 1e-16 level amplify, so compare those loosely
        saturated = fit_d > 2.5
        np.testing.assert_allclose(fit_s[~saturated], fit_d[~saturated],
                                   rtol=1e-9)
        np.testing.assert_allclose(fit_s[saturated], fit_d[saturated],
                                   rtol=0.05)
        np.testing.assert_allclose(min_s, np.asarray(min_d), rtol=1e-9)
        np.testing.assert_allclose(max_s, np.asarray(max_d), rtol=1e-9)


class TestShardInputsInTools:
    def test_open_spectrum_profile_spbin(self, tmp_path):
        """.spbin inputs ride the native loader through the same
        ProfileBlocks interface as NetCDF spectra."""
        from ecckd_tpu.io.spectrum import (open_spectrum_profile,
                                           read_spectrum)
        h5 = synth_spectrum_file(str(tmp_path / "h2o.h5"), nwav=1024,
                                 ncol=2, seed=9)
        paths = convert_spectrum_file(h5, str(tmp_path / "h2o"),
                                      iprofiles=[0, 1], dtype=np.float64)
        for iprof in (0, 1):
            sp = read_spectrum(h5, iprof)
            with open_spectrum_profile(paths[0], iprof) as pb:
                assert pb.ncol == 2
                assert pb.molecule == sp.molecule
                np.testing.assert_allclose(pb.wavenumber, sp.wavenumber)
                got = pb.materialize()
                np.testing.assert_allclose(got.optical_depth,
                                           sp.optical_depth, rtol=1e-12)

    def test_find_g_points_accepts_spbin(self, tmp_path):
        """The hot tool consumes converted shards with identical output
        to the NetCDF path (f64 shards; reads via pread + prefetch)."""
        from ecckd_tpu.config import Config
        from ecckd_tpu.io import NcFile
        from ecckd_tpu.tools.find_g_points import find_g_points
        from ecckd_tpu.tools.reorder_spectrum import reorder_spectrum

        h5 = synth_spectrum_file(str(tmp_path / "h2o.h5"), nwav=1024,
                                 ncol=1, seed=3)
        shard = convert_spectrum_file(h5, str(tmp_path / "h2o"),
                                      iprofiles=[0], dtype=np.float64)[0]
        order = str(tmp_path / "order.h5")
        reorder_spectrum(Config({"input": h5, "output": order}), argv=["r"])

        def run(tag, spec):
            out = str(tmp_path / f"gp_{tag}.h5")
            find_g_points(Config({
                "output": out, "gases": "h2o",
                "heating_rate_tolerance": "0.4",
                "averaging_method": "transmission", "sharded": "0",
                "h2o.reordering_input": order, "h2o.input": spec,
            }), argv=["find_g_points"])
            return out

        a, b = NcFile(run("h5", h5)), NcFile(run("spbin", shard))
        np.testing.assert_array_equal(a.read("g_point"), b.read("g_point"))
        np.testing.assert_allclose(a.read("h2o_error"),
                                   b.read("h2o_error"), rtol=1e-12)
        a.close(); b.close()
