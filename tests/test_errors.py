"""ESA exit-code semantics (Error.h:20-65 + EsaExitCodes.h:16-51): the
reference treats tool exit codes as API; every CLI main routes through
errors.run_tool."""

import numpy as np
import pytest

from ecckd_tpu import errors


def test_error_code_messages():
    assert errors.error_code_msg(errors.EXIT_OK) == "OK"
    assert errors.error_code_msg(errors.PARAMETER_ERROR) == "Parameter error"
    assert errors.error_code_msg(errors.OUT_OF_MEMORY) == "Out of memory"
    assert "Unknown" in errors.error_code_msg(200)


def test_exit_code_mapping():
    assert errors.exit_code_for(FileNotFoundError("x")) == \
        errors.CANNOT_OPEN_MANDATORY_FILE
    assert errors.exit_code_for(ValueError("x")) == errors.PARAMETER_ERROR
    assert errors.exit_code_for(MemoryError()) == errors.OUT_OF_MEMORY
    assert errors.exit_code_for(KeyboardInterrupt()) == \
        errors.PREMATURE_TERMINATION
    assert errors.exit_code_for(RuntimeError("x")) == \
        errors.PROCESSING_ERROR
    e = OSError("disk full"); e.errno = 28
    assert errors.exit_code_for(e) == errors.DISK_FULL
    assert errors.exit_code_for(errors.Interrupt()) == \
        errors.PREMATURE_TERMINATION
    assert errors.exit_code_for(Exception()) == \
        errors.UNEXPECTED_EXCEPTION


def test_run_tool_success_and_rc_passthrough():
    assert errors.run_tool(lambda: None) == errors.EXIT_OK
    assert errors.run_tool(lambda: 7) == 7       # optimize_lut status rc


def test_run_tool_catches_and_reports(capsys):
    def boom():
        raise FileNotFoundError("missing.nc")
    rc = errors.run_tool(boom, name="create_lut")
    assert rc == errors.CANNOT_OPEN_MANDATORY_FILE
    err = capsys.readouterr().err
    assert "create_lut" in err and "Cannot open mandatory file" in err
    assert "139" in err


def test_tool_main_exit_codes(tmp_path, capsys):
    """End-to-end: a tool main returns the ESA code for a missing
    mandatory file and for a bad parameter."""
    from ecckd_tpu.tools.reorder_spectrum import main as reorder_main
    rc = reorder_main(["input=/nonexistent/spectrum.h5",
                       f"output={tmp_path}/o.h5"])
    assert rc == errors.CANNOT_OPEN_MANDATORY_FILE

    from ecckd_tpu.tools.create_lut import main as lut_main
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import synth_spectrum_file
    h2o = synth_spectrum_file(str(tmp_path / "h2o.h5"), nwav=128, ncol=2)
    # A spectrum file is not a g-point file -> ValueError -> PARAMETER_ERROR
    rc = lut_main([f"input={h2o}", f"output={tmp_path}/l.nc",
                   "gases=h2o", f"h2o.input={h2o}"])
    assert rc == errors.PARAMETER_ERROR


def test_debug_nans_traps_and_maps_to_processing_error(tmp_path):
    """debug_nans=1 is the reference's enable_floating_point_exceptions()
    (floating_point_exceptions.h:20-25): a NaN produced inside a jitted
    computation must raise, and the raised FloatingPointError maps to the
    ESA PROCESSING_ERROR code via run_tool semantics."""
    import jax
    import jax.numpy as jnp
    from ecckd_tpu.config import Config
    from ecckd_tpu.tools.common import setup_jax

    setup_jax(Config({"debug_nans": "1"}))
    try:
        def produce_nan():
            z = jnp.asarray(0.0)
            return float(jax.jit(lambda a: a / a)(z))
        with pytest.raises(FloatingPointError):
            produce_nan()
        # FloatingPointError is an ArithmeticError -> PROCESSING_ERROR
        rc = errors.run_tool(produce_nan, name="optimize_lut")
        assert rc == errors.PROCESSING_ERROR
    finally:
        jax.config.update("jax_debug_nans", False)

    # Without the trap the same computation returns a quiet NaN.
    val = float(jax.jit(lambda a: a / a)(jnp.asarray(0.0)))
    assert np.isnan(val)


def test_signal_handlers_installed():
    import signal
    errors.install_interrupt_handler()
    assert signal.getsignal(signal.SIGINT) is errors.handle_interrupt
    with pytest.raises(errors.Interrupt):
        errors.handle_interrupt(signal.SIGINT, None)
    errors.install_segmentation_fault_handler()   # faulthandler.enable
    import faulthandler
    assert faulthandler.is_enabled()
