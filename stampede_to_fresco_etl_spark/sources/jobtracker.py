"""Manifest/status job-tracker shim — SURVEY §2.1 S13.

The reference coordinates its three stages through JSON control files
on a shared filesystem: `<job_id>.manifest.json` job descriptors
(step-2/sender.py:284-332) and `<job_id>.status` lifecycle files
(step-2/consumer.py:135-156; statuses `processing` / `completed` /
`completed_no_data` / `failed`).  This shim keeps that JSON surface
(field-compatible) so existing tooling can interoperate, while the
data plane runs as Spark jobs.

This is driver-side orchestration metadata, deliberately NOT a Spark
dataflow: a job queue of O(thousands) entries needs a filesystem (or
a real scheduler), not a shuffle.  Timestamps are injected by the
caller to keep the module deterministic and testable.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import Any

#: Lifecycle states used by the reference consumer/retriever
#: (step-2/consumer.py:135-156, step-2/retriever.py:265-389).
STATUSES = ("processing", "completed", "completed_no_data", "failed")


class JobTracker:
    """File-based manifest queue, reference-compatible.

    manifest: {job_id, year_month, metric_files, accounting_files,
               complete_month, timestamp}
    status:   {job_id, year_month, status, timestamp, **metadata}
    """

    def __init__(self, input_dir: str | Path, complete_dir: str | Path):
        self.input_dir = Path(input_dir)
        self.complete_dir = Path(complete_dir)
        self.input_dir.mkdir(parents=True, exist_ok=True)
        self.complete_dir.mkdir(parents=True, exist_ok=True)

    # -- sender side --------------------------------------------------

    def create_manifest(
        self,
        job_id: str,
        year_month: str,
        metric_files: list[str],
        accounting_files: list[str],
        timestamp: float,
        complete_month: bool = True,
    ) -> Path:
        """Atomic manifest write (temp + rename — readers never see a
        partial file, mirroring the shared-filesystem discipline the
        reference needed)."""
        data = {
            "job_id": job_id,
            "year_month": year_month,
            "metric_files": list(metric_files),
            "accounting_files": list(accounting_files),
            "complete_month": complete_month,
            "timestamp": timestamp,
        }
        path = self.input_dir / f"{job_id}.manifest.json"
        fd, tmp = tempfile.mkstemp(dir=self.input_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=4)
        os.replace(tmp, path)
        return path

    # -- consumer side ------------------------------------------------

    def pending_manifests(self) -> list[dict[str, Any]]:
        """Manifests with no status file yet, oldest first
        (consumer poll loop, step-2/consumer.py:815-866)."""
        out = []
        for p in sorted(self.input_dir.glob("*.manifest.json")):
            data = json.loads(p.read_text())
            if self.get_status(data["job_id"]) is None:
                out.append(data)
        out.sort(key=lambda d: d.get("timestamp", 0.0))
        return out

    def load_manifest(self, job_id: str) -> dict[str, Any] | None:
        p = self.input_dir / f"{job_id}.manifest.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def save_status(
        self,
        job_id: str,
        year_month: str,
        status: str,
        timestamp: str,
        metadata: dict[str, Any] | None = None,
    ) -> Path:
        if status not in STATUSES:
            raise ValueError(f"unknown status {status!r}; use {STATUSES}")
        data = {
            "job_id": job_id,
            "year_month": year_month,
            "status": status,
            "timestamp": timestamp,
            **(metadata or {}),
        }
        path = self.complete_dir / f"{job_id}.status"
        fd, tmp = tempfile.mkstemp(dir=self.complete_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=4)
        os.replace(tmp, path)
        return path

    def get_status(self, job_id: str) -> dict[str, Any] | None:
        p = self.complete_dir / f"{job_id}.status"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    # -- retriever side ----------------------------------------------

    def finalize(self, job_id: str) -> None:
        """Remove control files once results are shipped
        (step-2/retriever.py:265-389 cleanup)."""
        (self.input_dir / f"{job_id}.manifest.json").unlink(missing_ok=True)
        (self.complete_dir / f"{job_id}.status").unlink(missing_ok=True)

    def skip_set(self) -> set[str]:
        """year_months already submitted or done — the sender's
        pending ∪ processing ∪ completed skip set (U3,
        step-2/sender.py:347-357)."""
        months = set()
        for p in self.input_dir.glob("*.manifest.json"):
            months.add(json.loads(p.read_text()).get("year_month"))
        for p in self.complete_dir.glob("*.status"):
            months.add(json.loads(p.read_text()).get("year_month"))
        months.discard(None)
        return months
