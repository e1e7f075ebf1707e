"""Orchestrator test: full LW pipeline from one workflow config, with
artifact-existence resume."""

import os
import numpy as np
import pytest

from ecckd_tpu.config import Config
from ecckd_tpu.io import NcFile
from ecckd_tpu.pipeline.orchestrator import build_pipeline
from synth import synth_spectrum_file, synth_lbl_flux_file, \
    synth_scenario_file


@pytest.fixture(scope="module")
def workflow(tmp_path_factory):
    d = tmp_path_factory.mktemp("wf")
    h2o = synth_spectrum_file(str(d / "h2o.h5"), molecule="h2o",
                              nwav=512, ncol=6, seed=3)
    scen = synth_scenario_file(str(d / "scen.nc"))
    work = str(d / "work")
    cfg = Config({
        "mode": "lw",
        "application": "test",
        "band_structure": "fsck",
        "work_dir": work,
        "gases": "h2o",
        "tolerance": "0.3",
        "averaging_method": "transmission",
        "h2o.input": h2o,
        "h2o.conc_dependence": "linear",
        "optimize_passes": "1",
        "pass1.gases": "h2o",
        "pass1.max_iterations": "10",
        "pass1.prior_error": "4.0",
        "evaluation_input": scen,
        # LBL benchmark for the accuracy-stats stage: the run_ckd output
        # itself (self-comparison -> exactly zero errors), which validates
        # the evaluate wiring without external LBL data.
        "lbl_evaluation_fluxes": os.path.join(
            work, "lw_fluxes_lw_test_fsck_0.nc"),
    })
    return dict(d=d, cfg=cfg, work=work, h2o=h2o)


class TestPipeline:
    def test_full_lw_pipeline(self, workflow):
        cfg = workflow["cfg"]
        work = workflow["work"]
        # Training file needs the g-point file; run pipeline in two stages:
        # first up to create_lut...
        pipe = build_pipeline(cfg)
        # Drop the optimize/eval steps for stage 1
        pipe.steps = [s for s in pipe.steps
                      if not s.name.startswith(("optimize", "run_ckd",
                                                "evaluate"))]
        pipe.run()
        gpoints = os.path.join(work, "lw_gpoints_lw_test_fsck.h5")
        assert os.path.exists(gpoints)
        # ...then build training data and run the rest
        training = os.path.join(work, "training.nc")
        synth_lbl_flux_file(training, [workflow["h2o"]], gpoints, ["h2o"],
                            iprofiles=(0, 2))
        cfg.set("pass1.training_input", training)
        pipe2 = build_pipeline(cfg)
        pipe2.run()
        final = os.path.join(work, "lw_ckd-definition_lw_test_fsck.nc")
        assert os.path.exists(final)
        f = NcFile(final)
        # Full provenance chain in one file
        hist = f.attribute("history")
        for step in ("find_g_points", "create_lut", "optimize_lut"):
            assert step in hist
        assert f.attribute("model_id") == "lw_test_fsck"
        # min/max stripped on the final pass
        assert not f.exist("h2o_molar_absorption_coeff_min")
        f.close()
        # Evaluation fluxes produced
        assert os.path.exists(os.path.join(work,
                                           "lw_fluxes_lw_test_fsck_0.nc"))
        # Accuracy-stats stage ran (self-comparison: all errors zero)
        import json
        stats_path = os.path.join(work, "lw_stats_lw_test_fsck_0.json")
        assert os.path.exists(stats_path)
        stats = json.load(open(stats_path))["models"][0]
        assert stats["toa_up_rmse"] == pytest.approx(0.0, abs=1e-12)
        assert stats["heating_rate_low_rmse"] == pytest.approx(0.0,
                                                               abs=1e-12)
        assert stats["n_g_points"] >= 1

    def test_resume_skips_existing(self, workflow, capsys):
        pipe = build_pipeline(workflow["cfg"])
        pipe.run()
        out = capsys.readouterr().out
        assert "skipping" in out
        # Nothing should have re-run
        assert "running" not in out
