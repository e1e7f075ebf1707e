"""Leveled logging and a named-activity timer.

Functional equivalents of the reference's Logging.h streams
(src/include/Logging.h:36-155: LOG/DETAIL/DEBUG/WARNING/ERROR with a
``log_level`` config key) and Timer.h (src/include/Timer.h:27-173: named
wall-clock activities, report on demand).
"""

from __future__ import annotations

import sys
import time
from contextlib import contextmanager
from typing import Dict, Optional

_LEVELS = {"error": 0, "warning": 1, "info": 2, "progress": 2,
           "detail": 3, "debug": 4}
_current_level = 2


def set_log_level(level: str) -> None:
    global _current_level
    key = level.lower()
    if key not in _LEVELS:
        raise ValueError(f"Unknown log level {level!r}; choose from {sorted(_LEVELS)}")
    _current_level = _LEVELS[key]


def _emit(level: int, prefix: str, *args) -> None:
    if level <= _current_level:
        msg = " ".join(str(a) for a in args)
        stream = sys.stderr if prefix else sys.stdout
        print(f"{prefix}{msg}", file=stream, flush=True)


def log(*args) -> None:
    _emit(2, "", *args)


def detail(*args) -> None:
    _emit(3, "", *args)


def debug(*args) -> None:
    _emit(4, "", *args)


def warning(*args) -> None:
    _emit(1, "*** Warning: ", *args)


def error(*args) -> None:
    _emit(0, "*** Error: ", *args)


class Timer:
    """Accumulate wall-clock time in named activities.

    ``start(name)`` switches accumulation to that activity (ending the
    previous one); ``report()`` returns a formatted table.
    """

    def __init__(self):
        self._totals: Dict[str, float] = {}
        self._active: Optional[str] = None
        self._t0 = 0.0

    def start(self, name: str) -> None:
        now = time.perf_counter()
        if self._active is not None:
            self._totals[self._active] = (
                self._totals.get(self._active, 0.0) + now - self._t0)
        self._active = name
        self._t0 = now

    def stop(self) -> None:
        if self._active is not None:
            now = time.perf_counter()
            self._totals[self._active] = (
                self._totals.get(self._active, 0.0) + now - self._t0)
            self._active = None

    def total(self, name: str) -> float:
        return self._totals.get(name, 0.0)

    def report(self) -> str:
        self.stop()
        lines = ["Elapsed times:"]
        for name, t in self._totals.items():
            lines.append(f"  {name:30s} {t:10.3f} s")
        lines.append(f"  {'Total':30s} {sum(self._totals.values()):10.3f} s")
        return "\n".join(lines)


@contextmanager
def timed(timer: Timer, name: str):
    timer.start(name)
    try:
        yield
    finally:
        timer.stop()
