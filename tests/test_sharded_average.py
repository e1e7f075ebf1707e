"""Mesh-sharded g-point averaging vs the single-host streaming result.

Validates the psum/pmin/pmax-combined wavenumber-sharded reduction
(parallel/sharded_average.py) on the 8-virtual-device CPU mesh against
the streaming single-host path, which is itself validated against the
dense ops.average in tests/test_streaming.py.
"""

import numpy as np
import pytest

from ecckd_tpu.parallel import make_mesh, sharded_average_od_to_gpoints
from ecckd_tpu.ops.streaming import _block_accumulate  # noqa: F401 (import check)


def build_problem(nz=7, nwav=1000, ng=5, seed=0):
    rng = np.random.default_rng(seed)
    od = 10.0 ** rng.uniform(-4, 1, (nz, nwav))
    # A few exact zeros exercise unassigned/min handling
    od[:, rng.integers(0, nwav, 10)] = 1e-6
    weight = np.abs(rng.normal(1.0, 0.2, (nz, nwav)))
    g_point = rng.integers(-1, ng, nwav).astype(np.int32)  # -1 = unassigned
    return od, weight, g_point


def reference_result(od, weight, g_point, ng, method):
    """Single-host equivalent via the streaming path's block math."""
    from ecckd_tpu.ops.streaming import streaming_average_od_to_gpoints

    class FakeReader:
        def iter_blocks(self, block_wav):
            for i0 in range(0, od.shape[1], block_wav):
                yield i0, od[:, i0:i0 + block_wav]

    return streaming_average_od_to_gpoints(
        FakeReader(), ng, g_point,
        lambda i0, nb: weight[:, i0:i0 + nb], method, block_wav=256)


class TestShardedAverage:
    @pytest.mark.parametrize("method", ["linear", "transmission",
                                        "transmission-3", "square-root"])
    def test_matches_streaming(self, method):
        od, weight, g_point, = build_problem()[0:3]
        ng = 5
        mesh = make_mesh(data_parallel=1)
        assert mesh.shape["spectral"] > 1  # conftest provides 8 devices
        fit_s, min_s, max_s = sharded_average_od_to_gpoints(
            mesh, ng, g_point, od, weight, method)
        fit_r, min_r, max_r = reference_result(od, weight, g_point, ng,
                                               method)
        np.testing.assert_allclose(fit_s, fit_r, rtol=1e-10)
        np.testing.assert_allclose(min_s, min_r, rtol=1e-12)
        np.testing.assert_allclose(max_s, max_r, rtol=1e-12)

    def test_unpadded_divisible(self):
        # nwav divisible by the mesh: no padding branch
        od, weight, g_point = build_problem(nwav=1024)
        mesh = make_mesh(data_parallel=1)
        fit_s, _, _ = sharded_average_od_to_gpoints(
            mesh, 5, g_point, od, weight, "linear")
        fit_r, _, _ = reference_result(od, weight, g_point, 5, "linear")
        np.testing.assert_allclose(fit_s, fit_r, rtol=1e-10)

    def test_unsupported_method_raises(self):
        od, weight, g_point = build_problem()
        mesh = make_mesh(data_parallel=1)
        with pytest.raises(ValueError, match="does not support"):
            sharded_average_od_to_gpoints(mesh, 5, g_point, od, weight,
                                          "logarithmic")

    def test_empty_gpoint(self):
        od, weight, g_point = build_problem()
        g_point[g_point == 3] = 0   # g-point 3 gets no wavenumbers
        mesh = make_mesh(data_parallel=1)
        fit_s, min_s, max_s = sharded_average_od_to_gpoints(
            mesh, 5, g_point, od, weight, "transmission")
        assert np.all(fit_s[:, 3] == 0.0)
        assert np.all(min_s[:, 3] == 0.0)
        assert np.all(max_s[:, 3] == 0.0)
