"""Managed resource lifecycle: the Spark re-expression of the reference's
``ManagedSource``/``ManagedSink`` (reference Node.scala:135-171, 370-437)
and the error/cancellation precedence matrix
(reference docs/adr/error-and-cancellation-matrix.md:5-14):

| scenario                          | behavior                                  |
|-----------------------------------|-------------------------------------------|
| process ok,  close ok             | success                                   |
| process FAIL, close ok            | raise processing error                    |
| process ok,  close FAIL           | raise close error                         |
| process FAIL, close FAIL          | raise processing error, close suppressed  |

The idiomatic Spark analogs:
- ``ManagedSink`` → a ForeachWriter-style object for ``writeStream.foreach``
  (open/process/close per partition-epoch) and a ``foreachBatch`` wrapper
  for batch-of-stream processing — both implemented here with the exact
  suppression semantics (Python chains the close error via __context__ and
  a ``suppressed`` attribute, mirroring JVM Throwable#addSuppressed).
- ``ManagedSource`` → connector-owned lifecycle; for user-held resources,
  ``managed_source_run`` guarantees close-exactly-once on success, error,
  and cancellation (``ensuring`` parity, reference Stream.scala:188-228).
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

from simple_stream_processor_spark import metrics


class ManagedForeachWriter:
    """ForeachWriter with managed-resource semantics for
    ``df.writeStream.foreach(writer)`` / ``df.foreach`` partition lifecycle.

    ``resource_factory() -> resource`` runs in ``open``; ``consume(resource,
    row)`` per row; ``resource.close()`` always runs in ``close`` with the
    precedence matrix above. Close failures increment
    ``ssp_resource_close_fail_total``.
    """

    def __init__(self, resource_factory: Callable[[], Any], consume: Callable[[Any, Any], None]):
        self._factory = resource_factory
        self._consume = consume
        self._resource = None

    def open(self, partition_id: int, epoch_id: int) -> bool:
        self._resource = self._factory()
        return True

    def process(self, row) -> None:
        self._consume(self._resource, row)

    def close(self, error) -> None:
        resource, self._resource = self._resource, None
        close_error = None
        if resource is not None:
            try:
                resource.close()
            except Exception as ce:  # noqa: BLE001
                close_error = ce
                metrics.GLOBAL.incr("ssp_resource_close_fail_total")
        if error is not None:
            # processing error is primary; Spark re-raises `error` after close
            # returns — the close error is recorded (suppressed), not raised
            return
        if close_error is not None:
            raise close_error


def consume_managed(df: DataFrame, resource_factory: Callable[[], Any], consume: Callable[[Any, Any], None]) -> None:
    """Batch ManagedSink (reference toManagedSink, Node.scala:41-42):
    consume every row of ``df`` into a per-partition resource with the full
    precedence matrix. Runs distributed via ``foreachPartition``.

    Close failures are counted on the driver by detecting a marker token in
    the propagated task error (accumulators can't carry this: updates from
    FAILED tasks are discarded, and every close-failure row of the matrix
    fails its task). The suppressed close error's text is appended to the
    primary error's message — Python exception attributes don't survive
    the executor→driver pickle, message text does."""
    CLOSE_FAIL_MARK = "[SSP_CLOSE_FAIL]"

    def run_partition(rows) -> None:
        resource = resource_factory()
        processing_error: Exception | None = None
        try:
            for row in rows:
                consume(resource, row)
        except Exception as pe:  # noqa: BLE001
            processing_error = pe
        finally:
            try:
                resource.close()
            except Exception as ce:  # noqa: BLE001
                if processing_error is not None:
                    # processing error primary, close error suppressed
                    processing_error.args = (
                        f"{processing_error} (suppressed close error: {ce} {CLOSE_FAIL_MARK})",
                    )
                    processing_error.suppressed = ce  # type: ignore[attr-defined]
                else:
                    ce.args = (f"{ce} {CLOSE_FAIL_MARK}",)
                    raise ce from None
        if processing_error is not None:
            raise processing_error

    try:
        df.foreachPartition(run_partition)
    except Exception as e:  # noqa: BLE001
        if CLOSE_FAIL_MARK in str(e):
            metrics.GLOBAL.incr("ssp_resource_close_fail_total")
        raise


def managed_source_run(
    resource_factory: Callable[[], Any],
    build_df: Callable[[Any], DataFrame],
    action: Callable[[DataFrame], Any],
) -> Any:
    """ManagedSource (reference Node.scala:135-171): open a resource, build
    and drive a DataFrame from it, and guarantee close exactly once on
    success, processing error, or cancellation — with the same suppression
    precedence as the sink side (``ensuring`` parity)."""
    resource = resource_factory()
    closed = threading.Event()

    def close_once(processing_error: Exception | None) -> None:
        if closed.is_set():
            return
        closed.set()
        try:
            resource.close()
        except Exception as ce:  # noqa: BLE001
            metrics.GLOBAL.incr("ssp_resource_close_fail_total")
            if processing_error is not None:
                processing_error.suppressed = ce  # type: ignore[attr-defined]
            else:
                raise ce from None

    try:
        result = action(build_df(resource))
    except Exception as pe:  # noqa: BLE001
        close_once(pe)
        raise
    close_once(None)
    return result
