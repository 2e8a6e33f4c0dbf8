"""Fluent pipeline API mirroring the reference's Node surface
(reference Node.scala:14-127: ``Source(stream).map(f).filter(g)
.parMap(n)(f).asyncBoundary(b).windowByCount(k).toSink(f, zero)``).

The chain *is* the logical plan: each call adds a DataFrame transformation,
so the Node tree the reference builds explicitly (its only IR,
JobGraph.scala:25-68) is literally the Catalyst logical plan here —
``run`` ≈ an action triggering QueryExecution (SURVEY §3). The pipeline
also records an operator trail for ``topology()`` (reference
JobGraph.printTopology golden, SimpleStreamProcessorTest.scala:603-627)
and carries managed resources so terminals close them with the reference's
error-precedence matrix (docs/adr/error-and-cancellation-matrix.md:5-14).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simple_stream_processor_spark.operators import core, errors, parallel, windows
from simple_stream_processor_spark.streaming import lifecycle


class Pipeline:
    """Immutable fluent builder: every operator returns a NEW Pipeline over
    the transformed DataFrame (structural sharing, like the reference's
    case-class Node tree)."""

    def __init__(self, df: DataFrame, ops: tuple[str, ...], resources: tuple[Any, ...] = ()):
        self._df = df
        self._ops = ops
        self._resources = resources

    # -- sources ------------------------------------------------------------

    @classmethod
    def source(cls, df: DataFrame) -> "Pipeline":
        """reference Source (Node.scala:129-133)."""
        return cls(df, (f"Source[{len(df.columns)} cols]",))

    @classmethod
    def managed_source(
        cls, resource_factory: Callable[[], Any], build_df: Callable[[Any], DataFrame]
    ) -> "Pipeline":
        """reference ManagedSource (Node.scala:135-171): the resource opens
        now and is closed exactly once by whichever terminal drives the
        pipeline (success, error, or cancel), close-error suppressed under a
        processing error."""
        resource = resource_factory()
        df = build_df(resource)
        return cls(df, (f"ManagedSource[{type(resource).__name__}]",), (resource,))

    # -- stateless transforms (§2.2) -----------------------------------------

    def map(self, *cols: Column) -> "Pipeline":
        return self._step(core.map_transform(self._df, *cols), "Map")

    def filter(self, predicate: Column) -> "Pipeline":
        return self._step(core.filter_where(self._df, predicate), "Filter")

    def flat_map(self, out_cols: Sequence[Column], array_col: Column, alias: str) -> "Pipeline":
        return self._step(core.flat_map_explode(self._df, out_cols, array_col, alias), "FlatMap")

    def append(self, other: "Pipeline | DataFrame") -> "Pipeline":
        other_df = other._df if isinstance(other, Pipeline) else other
        other_res = other._resources if isinstance(other, Pipeline) else ()
        return Pipeline(
            core.append_union(self._df, other_df), (*self._ops, "Append"), (*self._resources, *other_res)
        )

    # -- error channel (§2.4) -------------------------------------------------

    def with_error_channel(self, value_expr: Column, order_col: str) -> "Pipeline":
        return self._step(errors.with_error_channel(self._df, value_expr, order_col), "ErrorChannel")

    def recover(self, fallback: DataFrame) -> "Pipeline":
        """reference recover (Stream.scala:90-93): prefix before the first
        in-band error, then ONE fallback row, then halt."""
        return self._step(errors.recover_value(self._df, fallback), "Recover")

    def recover_with(self, fallback_stream: DataFrame) -> "Pipeline":
        """reference recoverWith (Stream.scala:95-101)."""
        return self._step(errors.recover_with_stream(self._df, fallback_stream), "RecoverWith")

    # -- parallelism & boundaries (§2.3) ---------------------------------------

    def par_map(
        self,
        order_col: str,
        fn: Callable,
        in_col: str,
        out_col: str,
        out_type: str,
        parallelism: int | None = None,
    ) -> "Pipeline":
        df = parallel.par_map_ordered(self._df, order_col, fn, in_col, out_col, out_type, parallelism)
        return self._step(df, f"ParMap[{parallelism if parallelism is not None else 'inherit'}]")

    def async_boundary(self, buffer_size: int) -> "Pipeline":
        return self._step(parallel.async_boundary(self._df, buffer_size), f"AsyncBoundary[{buffer_size}]")

    # -- windows (§2.5) ---------------------------------------------------------

    def window_by_count(self, order_col: str, size: int) -> "Pipeline":
        return self._step(windows.count_window(self._df, order_col, size), f"CountWindow[{size}]")

    def with_watermarks(self, order_col: str, ts_col: str, emit_every_n: int) -> "Pipeline":
        return self._step(
            windows.watermark_cadence(self._df, order_col, ts_col, emit_every_n), f"Watermarks[{emit_every_n}]"
        )

    def window_by_event_time(self, ts_col: str, size: str, value_col: str) -> "Pipeline":
        """reference windowByEventTime (Node.scala:315-356): tumbling windows
        emitting (start, end, values). Batch scope = the reference's
        end-of-stream Watermark(MaxValue) flush (ADR-0006:18-19)."""
        df = (
            self._df.groupBy(windows.tumbling_window(self._df, ts_col, size).alias("w"))
            .agg(F.sort_array(F.collect_list(F.col(value_col))).alias("values"))
            .select(F.col("w.start").alias("start"), F.col("w.end").alias("end"), "values")
        )
        return self._step(df, f"EventTimeWindow[{size}]")

    # -- terminals (§2.1 S6-S8, §2.6) -------------------------------------------

    def to_sink(self, *aggs: Column) -> DataFrame:
        """reference toSink/fold (Node.scala:39, 439-468): terminal monoid
        fold. Managed resources close before the result returns."""
        return self._terminal(lambda: core.fold_agg(self._df, *aggs))

    def to_list(self) -> list:
        """reference toList (Stream.scala:81-88)."""
        return self._terminal(lambda: self._df.collect())

    def to_managed_sink(self, resource_factory: Callable[[], Any], consume: Callable[[Any, Any], None]) -> None:
        """reference toManagedSink (Node.scala:41-42, 370-437): per-partition
        resource, close-always, processing error primary."""
        return self._terminal(lambda: lifecycle.consume_managed(self._df, resource_factory, consume))

    def run_to_list_async(self):
        """reference runToListAsync (Node.scala:44-65) → ExecutionHandle."""
        from simple_stream_processor_spark import execution

        return execution.run_to_list_async(self._df)

    def run_cancellable_iterator(self):
        """reference runCancellableIterator (Node.scala:92-117)."""
        from simple_stream_processor_spark import execution

        return execution.CancellableIterator(self._df)

    # -- plan access -------------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._df

    def topology(self) -> str:
        """Operator-trail rendering (reference JobGraph.printTopology,
        JobGraph.scala:25-68): one line per node, source first."""
        return " -> ".join(self._ops)

    def explain_topology(self) -> str:
        """The physical plan Catalyst actually chose — the reference has to
        render its Node tree verbatim (no optimizer); here the interesting
        topology is the optimized one."""
        return self._df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            self._df._jdf.queryExecution(), "simple"
        )

    # -- internals -----------------------------------------------------------------

    def _step(self, df: DataFrame, op: str) -> "Pipeline":
        return Pipeline(df, (*self._ops, op), self._resources)

    def _terminal(self, action: Callable[[], Any]) -> Any:
        processing_error: Exception | None = None
        try:
            return action()
        except Exception as pe:  # noqa: BLE001
            processing_error = pe
            raise
        finally:
            self._close_resources(processing_error)

    def _close_resources(self, processing_error: Exception | None) -> None:
        from simple_stream_processor_spark import metrics

        close_error: Exception | None = None
        for r in self._resources:
            try:
                r.close()
            except Exception as ce:  # noqa: BLE001
                metrics.GLOBAL.incr("ssp_resource_close_fail_total")
                close_error = close_error or ce
        if close_error is not None:
            if processing_error is not None:
                processing_error.suppressed = close_error  # type: ignore[attr-defined]
            else:
                raise close_error
