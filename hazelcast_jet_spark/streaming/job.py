"""Job handle — Jet's Job API over StreamingQuery.

Reference: hazelcast-jet-core/src/main/java/com/hazelcast/jet/Job.java
(suspend/resume/cancel/restart, exportSnapshot → JobStateSnapshot) and
impl/MasterJobContext.java.

Spark mapping: a named StreamingQuery + its checkpoint directory.
suspend = stop (state persists in the checkpoint); resume/restart =
start the same plan from the checkpoint; cancel = stop and delete the
checkpoint; exportSnapshot = copy the checkpoint (a named, restorable
point — Jet's JobStateSnapshot.java).
"""

from __future__ import annotations

import os
import shutil
from enum import Enum
from typing import Callable


class JobStatus(Enum):
    """Job.getStatus() values (core/JobStatus.java subset)."""

    RUNNING = "RUNNING"
    SUSPENDED = "SUSPENDED"
    COMPLETED = "COMPLETED"
    FAILED = "FAILED"


class Job:
    """jet.newJob(pipeline) analog for streaming pipelines.

    ``start_fn(checkpoint_dir) -> StreamingQuery`` encapsulates the plan;
    the Job owns lifecycle + snapshots.
    """

    def __init__(self, start_fn: Callable[[str], "object"], checkpoint_dir: str,
                 name: str = "job"):
        self._start_fn = start_fn
        self.checkpoint_dir = checkpoint_dir
        self.name = name
        self._query = start_fn(checkpoint_dir)

    @property
    def status(self) -> JobStatus:
        if self._query is None:
            return JobStatus.SUSPENDED
        if self._query.isActive:
            return JobStatus.RUNNING
        return JobStatus.FAILED if self._query.exception() else JobStatus.COMPLETED

    def suspend(self) -> None:
        """Job.suspend — Job.java: stop processing, keep state."""
        if self._query is not None:
            self._query.stop()
            self._query = None

    def resume(self) -> None:
        """Job.resume — restart from the checkpoint (exactly-once)."""
        if self._query is None:
            self._query = self._start_fn(self.checkpoint_dir)

    def restart(self) -> None:
        """Job.restart — suspend + resume (Jet uses this for rescaling;
        Spark picks up new shuffle/cluster settings the same way)."""
        self.suspend()
        self.resume()

    def cancel(self) -> None:
        """Job.cancel — stop and discard state."""
        self.suspend()
        shutil.rmtree(self.checkpoint_dir, ignore_errors=True)

    def export_snapshot(self, name: str) -> str:
        """Job.exportSnapshot(name) — JobStateSnapshot: named copy of the
        state so a new job can start from it.  The job must be suspended
        (Jet requires the same for a consistent cut)."""
        if self._query is not None:
            raise RuntimeError("suspend the job before exporting a snapshot")
        target = os.path.join(os.path.dirname(self.checkpoint_dir.rstrip("/")),
                              f"snapshot__{name}")
        shutil.rmtree(target, ignore_errors=True)
        # ignore in-flight temp files: the stopped query's executor threads
        # may still be cleaning `.tmp` spill/commit files, which would make
        # copytree race a vanishing file (.tmp files are not part of the
        # committed checkpoint state)
        ignore = shutil.ignore_patterns(".*.tmp", "*.tmp")
        try:
            shutil.copytree(self.checkpoint_dir, target, ignore=ignore)
        except shutil.Error:
            shutil.rmtree(target, ignore_errors=True)
            shutil.copytree(self.checkpoint_dir, target, ignore=ignore)
        return target

    @staticmethod
    def from_snapshot(start_fn: Callable[[str], "object"], snapshot_dir: str,
                      new_checkpoint_dir: str, name: str = "job") -> "Job":
        """newJob(pipeline, cfg.setInitialSnapshotName(...)) analog.

        NOTE: Spark's *file* sink keeps its commit log inside the OUTPUT
        directory (_spark_metadata), keyed by the checkpoint's batch ids —
        a cloned checkpoint pointed at a fresh output directory would have
        inconsistent ids.  Jobs that should be snapshot-clonable must use
        a foreachBatch sink (commits tracked in the checkpoint alone),
        e.g. ``Sinks.for_each_batch``."""
        shutil.rmtree(new_checkpoint_dir, ignore_errors=True)
        shutil.copytree(snapshot_dir, new_checkpoint_dir)
        return Job(start_fn, new_checkpoint_dir, name)

    def join(self, timeout: float | None = None) -> None:
        """Job.join — await termination (bounded sources complete)."""
        if self._query is not None:
            self._query.awaitTermination(timeout)
