"""bench.py `--record` host-load guard (r12, VERDICT r11 item 7):
the io record is the cross-round perf contract and idle-machine-only
by protocol — twice-confirmed ±20% single-session windows on a
loaded host make a contaminated record look like a regression.  The
guard turns the protocol rule into a refusal."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_record_refuses_loaded_host(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (99.0, 1.0, 1.0))
    with pytest.raises(SystemExit, match="refusing --record"):
        bench.check_record_load(["bench.py", "--record"])
    # a non-record run measures regardless (scratch file only)
    assert bench.check_record_load(["bench.py"])[0] == 99.0
    # the explicit override records anyway
    bench.check_record_load(["bench.py", "--record", "--force-record"])
    # the env threshold is honored
    monkeypatch.setenv("SPARK_GRAFT_RECORD_MAX_LOAD", "200")
    bench.check_record_load(["bench.py", "--record"])


def test_record_passes_idle_host(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.5, 0.4, 0.3))
    assert bench.check_record_load(["bench.py", "--record"]) == [
        0.5,
        0.4,
        0.3,
    ]
