"""Optimizer-state checkpoint/resume tests.

SURVEY.md §5: the reference's checkpointing is artifact-per-stage only (an
L-BFGS run is atomic); the new framework adds optional optimizer-state
checkpoints every N iterations so long optimizations survive preemption.
"""

import os

import numpy as np
import pytest

from ecckd_tpu.config import Config
from ecckd_tpu.optimize import solver
from ecckd_tpu.tools.create_lut import create_lut
from ecckd_tpu.tools.find_g_points import find_g_points
from ecckd_tpu.tools.optimize_lut import optimize_lut
from ecckd_tpu.tools.reorder_spectrum import reorder_spectrum
from synth import synth_spectrum_file, synth_lbl_flux_file


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    h2o = synth_spectrum_file(str(d / "h2o.h5"), molecule="h2o",
                              nwav=1024, ncol=6, seed=3)
    order = str(d / "order.h5")
    reorder_spectrum(Config({"input": h2o, "output": order}), argv=["r"])
    gpoints = str(d / "gpoints.h5")
    find_g_points(Config({
        "output": gpoints, "gases": "h2o",
        "heating_rate_tolerance": "0.2",
        "averaging_method": "transmission",
        "h2o.reordering_input": order, "h2o.input": h2o,
    }), argv=["find_g_points"])
    lut = str(d / "lut_raw.nc")
    create_lut(Config({
        "input": gpoints, "output": lut, "gases": "h2o",
        "averaging_method": "transmission",
        "h2o.conc_dependence": "linear", "h2o.input": h2o,
    }), argv=["create_lut"])
    training = str(d / "training.nc")
    synth_lbl_flux_file(training, [h2o], gpoints, ["h2o"],
                        iprofiles=(0, 2, 4))
    return dict(lut=lut, training=training)


def _run(pipeline, out, ck, max_iter, every, criterion="1e-12"):
    return optimize_lut(Config({
        "input": pipeline["lut"], "output": out, "gases": "h2o",
        "training_input": pipeline["training"],
        "max_iterations": str(max_iter),
        "convergence_criterion": criterion,
        "prior_error": "4.0", "flux_weight": "0.02",
        "broadband_weight": "0.5",
        "checkpoint_file": ck, "checkpoint_every": str(every),
    }), argv=["optimize_lut"])


class TestCheckpoint:
    def test_written_and_resumed(self, pipeline, tmp_path):
        ck = str(tmp_path / "opt.ckpt")
        out1 = str(tmp_path / "o1.nc")
        # Unreachable criterion -> MAX_ITERATIONS; checkpoint survives
        rc = _run(pipeline, out1, ck, max_iter=9, every=4)
        assert rc != 0 or os.path.exists(ck)  # nonzero exit allowed on
        assert os.path.exists(ck)             # MAX_ITERATIONS status
        with np.load(ck) as f:
            it1 = int(f["_n_iter"])
            assert it1 in (4, 8)
            assert any(k.startswith("state_") for k in f.files)

        # Second run resumes: max_iterations is a TOTAL budget, so a
        # larger budget continues past the first run's count and the
        # checkpoint it writes carries the cumulative iteration number.
        out2 = str(tmp_path / "o2.nc")
        _run(pipeline, out2, ck, max_iter=it1 + 4, every=2)
        with np.load(ck) as f:
            it2 = int(f["_n_iter"])
        assert it2 > it1

        # A budget already exhausted by the resumed count performs zero
        # further iterations (total-budget semantics) but still succeeds.
        _run(pipeline, str(tmp_path / "o3.nc"), ck, max_iter=4, every=2)
        with np.load(ck) as f:
            assert int(f["_n_iter"]) == it2

    def test_mismatched_checkpoint_ignored(self, pipeline, tmp_path):
        ck = str(tmp_path / "bad.ckpt")
        solver._save_checkpoint(ck, {"h2o": np.zeros(3)}, 5, 1.0)
        out = str(tmp_path / "o.nc")
        _run(pipeline, out, ck, max_iter=3, every=2)
        assert os.path.exists(out)
        # The bad checkpoint was ignored and overwritten from iteration 0
        with np.load(ck) as f:
            assert int(f["_n_iter"]) == 2

    def test_removed_on_success(self, pipeline, tmp_path):
        ck = str(tmp_path / "done.ckpt")
        out = str(tmp_path / "o.nc")
        # Trivially satisfiable criterion -> SUCCESS -> checkpoint removed
        rc = _run(pipeline, out, ck, max_iter=50, every=1,
                  criterion="1e6")
        assert rc == 0
        assert not os.path.exists(ck)

    def test_save_load_roundtrip(self, tmp_path):
        ck = str(tmp_path / "rt.ckpt")
        tree = {"h2o": np.arange(12.0).reshape(3, 4), "o3": np.ones(5)}
        solver._save_checkpoint(ck, tree, 42, 3.14)
        loaded = solver._load_checkpoint(ck, tree)
        assert loaded is not None
        tree2, it = loaded
        assert it == 42
        np.testing.assert_array_equal(tree2["h2o"], tree["h2o"])
        # Shape mismatch -> None
        assert solver._load_checkpoint(
            ck, {"h2o": np.zeros((3, 4)), "o3": np.zeros(6)}) is None
        # Key mismatch -> None
        assert solver._load_checkpoint(ck, {"h2o": np.zeros((3, 4))}) is None
        solver._remove_checkpoint(ck)
        assert not os.path.exists(ck)
        solver._remove_checkpoint(ck)  # idempotent
