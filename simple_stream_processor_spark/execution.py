"""Async execution, cancellation, and outcome classification — the Spark
re-expression of the reference's ExecutionHandle / CancellationToken /
RuntimeControl (reference Execution.scala:13-92) and the async run entry
points (reference Node.scala:44-117).

Mapping:
- ``ExecutionHandle`` → a thread driving the action inside a Spark job
  group; ``cancel()`` = ``sc.cancelJobGroup`` (cooperative, like the
  reference's token checks between elements); outcome classified
  Completed / Failed / Cancelled exactly as reference Execution.scala:77-82.
- ``CancellableIterator`` (reference Execution.scala:19-24) →
  ``toLocalIterator`` + the same job-group cancel.
- streaming: ``StreamingQuery.stop()`` is the idempotent cancel;
  ``query.exception()`` the failure channel.
- per-execution metric scoping (reference Metrics.scala:96-111): each
  handle owns a scoped Collector; unhandled errors increment
  ``ssp_unhandled_error_total`` on that scope (and the global).
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable
from enum import Enum
from typing import Any

from pyspark.sql import SparkSession

from simple_stream_processor_spark import metrics


class Outcome(Enum):
    COMPLETED = "completed"
    FAILED = "failed"
    CANCELLED = "cancelled"


class ExecutionHandle:
    """Handle over an asynchronously running Spark action.

    ``outcome()`` blocks until done and returns (Outcome, result-or-error).
    ``cancel()`` is idempotent and cooperative: it cancels the job group,
    so running stages abort at the next task boundary (the reference checks
    its token between elements — same granularity idea, reference
    Node.scala:52-55)."""

    def __init__(
        self,
        spark: SparkSession,
        action: Callable[[], Any],
        group: str | None = None,
        pool: str | None = None,
    ):
        self._spark = spark
        self._group = group or f"ssp-exec-{uuid.uuid4().hex[:12]}"
        self._cancelled = threading.Event()
        self._done = threading.Event()
        self._result: Any = None
        self._error: BaseException | None = None
        self.metrics = metrics.Collector()

        def run() -> None:
            sc = spark.sparkContext
            sc.setJobGroup(self._group, "ssp execution", interruptOnCancel=True)
            if pool is not None:
                # FAIR pool placement (reference JobManager slot scheduling,
                # JobManager.scala:11-20): local properties are thread-local,
                # and each handle owns its thread, so pools never leak
                # between concurrent executions.
                sc.setLocalProperty("spark.scheduler.pool", pool)
            try:
                self._result = action()
            except BaseException as e:  # noqa: BLE001
                self._error = e
                if not self._cancelled.is_set():
                    self.metrics.incr("ssp_unhandled_error_total")
                    metrics.GLOBAL.incr("ssp_unhandled_error_total")
            finally:
                self._done.set()

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def cancel(self) -> None:
        if self._cancelled.is_set():
            return  # idempotent (reference Execution.scala:32-39)
        self._cancelled.set()
        self._spark.sparkContext.cancelJobGroup(self._group)

    def outcome(self, timeout_s: float | None = None) -> tuple[Outcome, Any]:
        """Outcome classification parity (reference Execution.scala:77-82):
        cancelled-before-finish wins over the cancellation-induced error."""
        if not self._done.wait(timeout_s):
            raise TimeoutError(f"execution {self._group} still running after {timeout_s}s")
        if self._cancelled.is_set() and self._error is not None:
            return (Outcome.CANCELLED, self._error)
        if self._error is not None:
            return (Outcome.FAILED, self._error)
        return (Outcome.COMPLETED, self._result)

    def metrics_snapshot(self) -> metrics.Snapshot:
        return self.metrics.snapshot()


def run_to_list_async(df, spark: SparkSession | None = None, pool: str | None = None) -> ExecutionHandle:
    """reference runToListAsync (Node.scala:44-65): collect on a background
    thread with a cancellable handle. ``pool`` places the job in a FAIR
    scheduler pool (conf/fairscheduler.xml) for slot-sharing with other
    concurrent handles."""
    return ExecutionHandle(spark or df.sparkSession, lambda: df.collect(), pool=pool)


def run_foreach_async(df, fn: Callable[[Any], None], spark: SparkSession | None = None) -> ExecutionHandle:
    """reference runForeachAsync (Node.scala:67-90)."""
    return ExecutionHandle(spark or df.sparkSession, lambda: df.foreach(fn))


class CancellableIterator:
    """reference runCancellableIterator (Node.scala:92-117): pull results
    lazily; ``cancel()`` aborts the producing job group. Spark's
    ``toLocalIterator`` fetches one partition at a time, so memory stays
    bounded by a partition — the reference's bounded-queue property."""

    def __init__(self, df):
        self._spark = df.sparkSession
        self._group = f"ssp-iter-{uuid.uuid4().hex[:12]}"
        self._df = df
        self._cancelled = False
        self._spark.sparkContext.setJobGroup(self._group, "ssp cancellable iterator", interruptOnCancel=True)
        self._it = df.toLocalIterator(prefetchPartitions=True)

    def __iter__(self):
        return self

    def __next__(self):
        if self._cancelled:
            raise StopIteration
        return next(self._it)

    def cancel(self) -> None:
        self._cancelled = True
        self._spark.sparkContext.cancelJobGroup(self._group)
