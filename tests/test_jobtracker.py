"""S13 manifest/status shim lifecycle tests."""

from __future__ import annotations

import json

import pytest

from stampede_to_fresco_etl_spark.sources.jobtracker import JobTracker


@pytest.fixture()
def tracker(tmp_path):
    return JobTracker(tmp_path / "input", tmp_path / "complete")


def test_manifest_lifecycle(tracker):
    p = tracker.create_manifest(
        "process_2013-03_abc123", "2013-03",
        ["sorted_2013-03-01.parquet"], ["2013-03.csv"], timestamp=100.0,
    )
    assert p.name == "process_2013-03_abc123.manifest.json"
    data = json.loads(p.read_text())
    assert data["year_month"] == "2013-03"
    assert data["complete_month"] is True

    tracker.create_manifest(
        "process_2013-02_def", "2013-02", [], [], timestamp=50.0
    )
    pending = tracker.pending_manifests()
    # oldest first
    assert [m["job_id"] for m in pending] == [
        "process_2013-02_def", "process_2013-03_abc123",
    ]

    tracker.save_status(
        "process_2013-02_def", "2013-02", "processing", "2013-03-01T00:00:00"
    )
    assert [m["job_id"] for m in tracker.pending_manifests()] == [
        "process_2013-03_abc123"
    ]

    tracker.save_status(
        "process_2013-02_def", "2013-02", "completed", "2013-03-01T01:00:00",
        metadata={"rows": 123},
    )
    st = tracker.get_status("process_2013-02_def")
    assert st["status"] == "completed" and st["rows"] == 123

    assert tracker.skip_set() == {"2013-02", "2013-03"}

    tracker.finalize("process_2013-02_def")
    assert tracker.get_status("process_2013-02_def") is None
    assert tracker.load_manifest("process_2013-02_def") is None
    assert tracker.skip_set() == {"2013-03"}


def test_invalid_status_rejected(tracker):
    with pytest.raises(ValueError):
        tracker.save_status("j", "2013-01", "exploded", "t")
