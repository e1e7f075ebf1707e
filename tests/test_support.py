"""Tests of the L1 support layer: file search path (ref file_manager.cpp),
named-activity timer (ref Timer.h), log levels (ref Logging.h)."""

import os
import time

import pytest

from ecckd_tpu import logs
from ecckd_tpu.tools import common


class TestFileManager:
    def setup_method(self):
        # isolate the module-level search path
        self._saved = list(common._search_path)
        common._search_path.clear()

    def teardown_method(self):
        common._search_path[:] = self._saved

    def test_search_path_order(self, tmp_path):
        """prepend beats append (ref file_manager.cpp:20-50: directories
        searched in order, prepended dirs first)."""
        d1 = tmp_path / "a"
        d2 = tmp_path / "b"
        d1.mkdir(); d2.mkdir()
        (d2 / "f.nc").write_text("b")
        common.append_search_directory(str(d2))
        assert common.find_file("f.nc") == str(d2 / "f.nc")
        (d1 / "f.nc").write_text("a")
        common.prepend_search_directory(str(d1))
        assert common.find_file("f.nc") == str(d1 / "f.nc")

    def test_existing_and_absolute_paths_win(self, tmp_path):
        f = tmp_path / "x.nc"
        f.write_text("x")
        common.append_search_directory(str(tmp_path))
        # absolute path untouched; nonexistent name returned as-is
        assert common.find_file(str(f)) == str(f)
        assert common.find_file("nonexistent.nc") == "nonexistent.nc"

    def test_prologue_sets_search_path(self, tmp_path):
        d = tmp_path / "data"
        d.mkdir()
        (d / "in.nc").write_text("x")
        common.tool_prologue([f"prepend_path={d}"])
        assert common.find_file("in.nc") == str(d / "in.nc")


class TestTimer:
    def test_accumulates_named_activities(self):
        t = logs.Timer()
        t.start("a")
        time.sleep(0.01)
        t.start("b")   # switching activities stops the previous one
        time.sleep(0.01)
        t.stop()
        assert t.total("a") >= 0.005
        assert t.total("b") >= 0.005
        rep = t.report()
        assert "a" in rep and "b" in rep

    def test_timed_context(self):
        t = logs.Timer()
        with logs.timed(t, "block"):
            time.sleep(0.005)
        assert t.total("block") >= 0.002


class TestLogLevels:
    def test_set_log_level_filters(self, capsys):
        logs.set_log_level("warning")
        try:
            logs.log("should not appear")
            logs.warning("should appear")
            out = capsys.readouterr()
            text = out.out + out.err
            assert "should not appear" not in text
            assert "should appear" in text
        finally:
            logs.set_log_level("info")

    def test_unknown_level_raises(self):
        with pytest.raises(Exception):
            logs.set_log_level("bogus-level")

    def test_log_file_sink_duplicates_messages(self, tmp_path, capsys):
        """log_file config key mirrors every message into a file
        (reference optional file output, src/include/Logging.h:36-155)."""
        sink = tmp_path / "run.log"
        logs.set_log_file(str(sink))
        try:
            logs.log("to both streams")
            logs.warning("warned")
            logs.progress("iter 1 of 3")
        finally:
            logs.set_log_file(None)
        text = sink.read_text()
        assert "to both streams" in text
        assert "warned" in text
        assert "iter 1 of 3" in text
        out = capsys.readouterr()
        assert "to both streams" in out.out

    def test_progress_respects_level(self, capsys):
        logs.set_log_level("warning")
        try:
            logs.progress("hidden progress")
        finally:
            logs.set_log_level("info")
        out = capsys.readouterr()
        assert "hidden progress" not in out.out + out.err

    def test_prologue_log_file_key(self, tmp_path):
        sink = tmp_path / "tool.log"
        common.tool_prologue([f"log_file={sink}"])
        try:
            logs.log("from tool")
        finally:
            logs.set_log_file(None)
        assert "from tool" in sink.read_text()


class TestMaybeProfile:
    def test_noop_without_key(self):
        with common.maybe_profile(None):
            pass  # must not require jax or a trace dir
