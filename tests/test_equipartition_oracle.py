"""Cross-validate the equipartition port against the REFERENCE C++ algorithm.

Compiles /root/reference/src/ecckd/equipartition.cpp (standard-library-only)
at test time with an original driver (oracle_equipartition_driver.cpp) and
compares partitions on the synthetic exponential ramp.  This directly tests
the 'equipartition fidelity' risk called out in SURVEY.md §7: small numeric
drift changes g-point counts discretely.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF_DIR = "/root/reference/src/ecckd"
HERE = os.path.dirname(os.path.abspath(__file__))


def build_oracle(tmp_dir):
    exe = os.path.join(tmp_dir, "oracle")
    src = os.path.join(HERE, "oracle_equipartition_driver.cpp")
    ref = os.path.join(REF_DIR, "equipartition.cpp")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{REF_DIR}", "-o", exe, src, ref],
        check=True, capture_output=True, timeout=120)
    return exe


needs_reference = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DIR, "equipartition.cpp"))
    or shutil.which("g++") is None,
    reason="reference source or g++ unavailable")


@needs_reference
class TestOracle:
    @pytest.fixture(scope="class")
    def oracle(self, tmp_path_factory):
        exe = build_oracle(str(tmp_path_factory.mktemp("oracle")))
        out = subprocess.run([exe, "100000", "16", "0.01"],
                             capture_output=True, text=True, check=True,
                             timeout=300).stdout
        # The reference prints unguarded progress lines (e.g. "Shuffle"),
        # so keep only the driver's own key-value lines
        keys = ("status", "bounds", "error", "status_e", "bounds_e")
        lines = {}
        for l in out.splitlines():
            parts = l.split()
            if parts and parts[0] in keys:
                lines[parts[0]] = parts[1:]
        return lines

    def _run_python(self, npoints=100000, ni=16, tol=0.01):
        import sys
        sys.path.insert(0, HERE)
        from test_equipartition import RampEquipartition
        te = RampEquipartition(npoints)
        te.set_partition_max_iterations(200)
        te.set_line_search_max_iterations(15)
        te.set_partition_tolerance(tol)
        te.set_resolution(1.0 / npoints)
        bounds = np.linspace(0.0, 1.0, ni + 1)
        error = np.zeros(ni)
        status = te.equipartition_n(bounds, error)
        return status, bounds, error, te

    def test_partition_matches_reference(self, oracle):
        status, bounds, error, te = self._run_python()
        ref_bounds = np.array([float(x) for x in oracle["bounds"]])
        ref_error = np.array([float(x) for x in oracle["error"]])
        # SURVEY §7: tolerance on "same partition" rather than bitwise —
        # both implementations must land on the same bounds to high accuracy
        np.testing.assert_allclose(bounds, ref_bounds, atol=2e-3)
        np.testing.assert_allclose(error, ref_error, rtol=0.1)

    def test_target_error_interval_count_matches(self, oracle):
        """equipartition_e must find the same number of intervals as the
        reference for the same target error."""
        _, bounds, error, te = self._run_python()
        target = error[0]
        status, bounds_e, error_e = te.equipartition_e(target, 0.0, 1.0)
        ref_ne = int(oracle["status_e"][2])   # line: "status_e <s> ne <n>"
        assert abs(len(error_e) - ref_ne) <= 1
        ref_bounds_e = np.array([float(x) for x in oracle["bounds_e"]])
        if len(bounds_e) == len(ref_bounds_e):
            np.testing.assert_allclose(bounds_e, ref_bounds_e, atol=5e-3)
