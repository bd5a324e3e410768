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


def test_scratch_root_env_override():
    """Concurrent processes sharing one checkout must be able to
    take private artifact scratch roots (SPARK_GRAFT_SCRATCH — the
    parallel sweep's isolation mechanism; without it two sessions
    both decide "not built yet" and overwrite each other's
    artifacts mid-read).  The override binds at import, so probe it
    in a subprocess; the default stays repo-local."""
    import subprocess

    # resolve() to match catalog's Path(...).resolve() default — an
    # abspath-based expectation fails spuriously on a symlinked
    # checkout
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "from stampede_to_fresco_etl_spark.catalog import _SCRATCH; "
        "print(_SCRATCH)" % repo
    )
    out = subprocess.run(
        [sys.executable, "-c", probe],
        env={**os.environ, "SPARK_GRAFT_SCRATCH": "/tmp/scratch_probe"},
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    assert out == "/tmp/scratch_probe"
    out = subprocess.run(
        [sys.executable, "-c", probe],
        env={k: v for k, v in os.environ.items()
             if k != "SPARK_GRAFT_SCRATCH"},
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    assert out == os.path.join(repo, ".scratch")
