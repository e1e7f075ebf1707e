"""Validation of the ECCKD_SPLIT_DOT=fast knob (VERDICT r4 weak #3).

"fast" computes the sweep kernels' 0/1-matrix reductions in ONE bf16 MXU
pass (~2^-8 relative) instead of the default two-pass split (~2^-16).
These tests quantify the fidelity loss on the actual kernels and check
whether partition decisions (the discrete-sensitivity concern, SURVEY §7)
move on the synthetic rig, in interpret mode on CPU where bf16 rounding
is emulated faithfully.
"""

import numpy as np
import pytest

import ecckd_tpu.ops.pallas.sweep_lw as sweep_lw
from ecckd_tpu.ops.pallas.sweep_lw import rt_lw_bb_intervals_pallas
from ecckd_tpu.ops.rt_lw import rt_lw_bb_intervals
from ecckd_tpu.partition.cost_kernel import (CandidateCostLw,
                                             CkdEquipartition)
from test_sharded_sweep import lw_args


@pytest.fixture
def split_mode(monkeypatch):
    """Set the split-dot mode and clear the jit caches that baked the
    previous mode in at trace time."""

    def set_mode(mode):
        monkeypatch.setattr(sweep_lw, "SPLIT_DOT_MODE", mode)
        rt_lw_bb_intervals_pallas._clear_cache()
        from ecckd_tpu.ops.segments import _interval_sum_fused_pallas
        _interval_sum_fused_pallas.clear_cache()

    yield set_mode
    set_mode("split")


def _sweep_inputs(nlay=12, nwav=3000, nseg=5, seed=0):
    rng = np.random.default_rng(seed)
    planck = np.abs(rng.normal(5, 1, (nlay + 1, nwav))).astype(np.float32)
    bg = rng.gamma(0.5, 0.4, (nlay, nwav)).astype(np.float32)
    od_fit = rng.gamma(0.5, 0.4, (nlay, nseg)).astype(np.float32)
    emis = np.ones(nwav, np.float32)
    surfp = np.abs(rng.normal(8, 1, nwav)).astype(np.float32)
    edges = np.linspace(0, nwav, nseg + 1).astype(np.int32)
    i1, i2 = edges[:-1], edges[1:] - 1
    seg = np.repeat(np.arange(nseg, dtype=np.int32), np.diff(edges))
    return planck, bg, od_fit, emis, surfp, i1, i2, seg


def test_fast_mode_fidelity_bounded(split_mode):
    """fast-mode fluxes stay within the documented ~2^-8 envelope of the
    f64-ish XLA reference, while split mode stays ~2^-16."""
    planck, bg, od_fit, emis, surfp, i1, i2, seg = _sweep_inputs()
    grey = od_fit[:, seg]
    fd_ref, fu_ref = (np.asarray(a, np.float64) for a in
                      rt_lw_bb_intervals(planck.astype(np.float64),
                                         bg.astype(np.float64),
                                         grey.astype(np.float64),
                                         emis.astype(np.float64),
                                         surfp.astype(np.float64), i1, i2))

    def rel(got, ref):
        m = np.abs(ref) > 0          # TOA downwelling row is exactly zero
        return np.max(np.abs(np.asarray(got, np.float64)[m] - ref[m])
                      / np.abs(ref[m]))

    def err(mode):
        split_mode(mode)
        fd, fu = rt_lw_bb_intervals_pallas(planck, bg, od_fit, seg, emis,
                                           surfp, i1, i2, interpret=True)
        return max(rel(fd, fd_ref), rel(fu, fu_ref))

    e_split = err("split")
    e_fast = err("fast")
    assert e_split < 5e-5, e_split
    assert e_fast < 2e-2, e_fast
    assert e_fast > 2 * e_split     # the knob genuinely changes precision


def test_fast_mode_partition_rig(split_mode):
    """Partition refinement on the synthetic rig: measure how far bounds
    move under fast mode vs the split default (both interpret-mode Pallas
    with the prefix fit path, i.e. the production TPU configuration).

    The documented expectation: with the r5 prefix path the fit/truth
    sums are NOT affected by the knob (they are double-float gathers), so
    only the flux reduction feels the bf16 truncation — bound movement
    must stay within a couple of ranks on this rig.  If this assertion
    ever fails, fast mode moves g-point decisions and must not be
    enabled for production runs.
    """
    from ecckd_tpu.tools.find_g_points import _sqrt_bounds
    args64, _ = lw_args("transmission", 512, seed=3)
    args = tuple(np.asarray(a, np.float32)
                 if isinstance(a, np.ndarray)
                 and a.dtype == np.float64 else a for a in args64)

    def refine(mode):
        split_mode(mode)
        kern = CandidateCostLw(*args, use_pallas=True,
                               pallas_interpret=True, use_prefix=True)
        eq = CkdEquipartition(kern)
        eq.set_verbose(False)
        eq.set_partition_max_iterations(6)
        bounds = _sqrt_bounds(5)
        errors = np.zeros(5)
        eq.equipartition_n(bounds, errors)
        idx = np.array([eq.lower_index(b) for b in bounds])
        return idx, np.asarray(errors)

    idx_split, err_split = refine("split")
    idx_fast, err_fast = refine("fast")
    move = np.max(np.abs(idx_fast - idx_split))
    assert move <= 2, (idx_split, idx_fast)
    np.testing.assert_allclose(err_fast, err_split, rtol=5e-2)
