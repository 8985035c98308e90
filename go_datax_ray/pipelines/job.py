"""Async Job handle: Start / Wait / Status / Cancel lifecycle.

Mirrors the reference's exec.Cmd-style Job (/root/reference/core/job/
job.go:27-200): non-blocking Start, Wait joins, Status snapshots live
progress, states CREATED -> RUNNING -> SUCCEEDED / FAILED / CANCELLED.
The heavy pipeline runs on a driver thread (Ray Data drives its own
distributed execution underneath); Status() reads the shared metrics
actor like the reference reads its Communication snapshots
(job.go:146-151)."""

from __future__ import annotations

import threading
import time
import traceback
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable


class JobState(str, Enum):
    CREATED = "CREATED"
    RUNNING = "RUNNING"
    SUCCEEDED = "SUCCEEDED"
    FAILED = "FAILED"
    CANCELLED = "CANCELLED"


@dataclass
class JobStatus:
    state: JobState
    elapsed_s: float
    counters: dict[str, int] = field(default_factory=dict)
    error: str | None = None


class Job:
    """Wrap any runnable pipeline (a callable returning its result)."""

    def __init__(self, fn: Callable[[], Any], *, metrics_actor=None):
        self._fn = fn
        self._metrics = metrics_actor
        self._state = JobState.CREATED
        self._result: Any = None
        self._error: str | None = None
        self._t0: float | None = None
        self._t1: float | None = None
        self._thread: threading.Thread | None = None
        self._cancel = threading.Event()

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "Job":
        if self._state is not JobState.CREATED:
            raise RuntimeError(f"job already {self._state}")
        self._state = JobState.RUNNING
        self._t0 = time.perf_counter()

        def run() -> None:
            try:
                self._result = self._fn()
                if self._state is JobState.RUNNING:
                    self._state = JobState.SUCCEEDED
            except Exception:  # noqa: BLE001
                self._error = traceback.format_exc()
                if self._state is JobState.RUNNING:
                    self._state = JobState.FAILED
            finally:
                self._t1 = time.perf_counter()

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self

    def wait(self, timeout: float | None = None) -> Any:
        if self._thread is None:
            raise RuntimeError("job not started")
        self._thread.join(timeout)
        if self._thread.is_alive():
            raise TimeoutError("job still running")
        if self._state is JobState.FAILED:
            raise RuntimeError(self._error or "job failed")
        return self._result

    def run(self) -> Any:  # Start + Wait (job.go:117-123)
        return self.start().wait()

    def cancel(self) -> None:
        """Best-effort cancel: marks CANCELLED; the epoch loop between
        commits is the safe cancellation point (committed epochs stay,
        exactly-once preserved)."""
        if self._state is JobState.RUNNING:
            self._state = JobState.CANCELLED
            self._cancel.set()

    @property
    def cancelled(self) -> threading.Event:
        return self._cancel

    # -- inspection --------------------------------------------------------
    def done(self) -> bool:
        return self._state in (JobState.SUCCEEDED, JobState.FAILED, JobState.CANCELLED)

    def status(self) -> JobStatus:
        elapsed = 0.0
        if self._t0 is not None:
            elapsed = (self._t1 or time.perf_counter()) - self._t0
        counters: dict[str, int] = {}
        if self._metrics is not None:
            import ray

            try:
                counters = ray.get(self._metrics.snapshot.remote(), timeout=5)
            except Exception:  # noqa: BLE001
                pass
        return JobStatus(self._state, elapsed, counters, self._error)
