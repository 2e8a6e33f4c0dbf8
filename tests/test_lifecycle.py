"""Managed resource lifecycle + async execution/cancellation tests —
the reference's suppression matrix and outcome classification
(reference docs/adr/error-and-cancellation-matrix.md:5-14,
SimpleStreamProcessorTest.scala:157-266, 355-498).
"""

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from simple_stream_processor_spark import metrics
from simple_stream_processor_spark.execution import (
    CancellableIterator,
    ExecutionHandle,
    Outcome,
    run_to_list_async,
)
from simple_stream_processor_spark.streaming.lifecycle import consume_managed, managed_source_run
from simple_stream_processor_spark.streaming.runner import TMP_ROOT


def _marker_dir() -> str:
    d = os.path.join(TMP_ROOT, "markers", uuid.uuid4().hex[:12])
    os.makedirs(d, exist_ok=True)
    return d


class FileResource:
    """AutoCloseable stand-in writing rows + lifecycle markers to disk
    (executor-side side effects must be observable from the driver)."""

    def __init__(self, d: str, fail_close: bool = False):
        self.d = d
        self.fail_close = fail_close
        self.path = os.path.join(d, f"r-{uuid.uuid4().hex[:8]}")
        self._f = open(self.path + ".rows", "w")

    def write(self, value) -> None:
        self._f.write(f"{value}\n")

    def close(self) -> None:
        self._f.close()
        open(self.path + ".closed", "w").close()
        if self.fail_close:
            raise OSError("close failed")


def _rows_written(d: str) -> list[str]:
    out = []
    for name in os.listdir(d):
        if name.endswith(".rows"):
            out.extend(line.strip() for line in open(os.path.join(d, name)) if line.strip())
    return out


def _n_closed(d: str) -> int:
    return sum(1 for n in os.listdir(d) if n.endswith(".closed"))


def _n_opened(d: str) -> int:
    return sum(1 for n in os.listdir(d) if n.endswith(".rows"))


def test_managed_sink_success_closes_all(spark):
    # matrix row 1: processing ok, close ok → success, resource closed
    d = _marker_dir()
    df = spark.range(0, 100).repartition(4)
    consume_managed(df, lambda: FileResource(d), lambda r, row: r.write(row["id"]))
    assert sorted(int(v) for v in _rows_written(d)) == list(range(100))
    assert _n_closed(d) == _n_opened(d) > 0


def test_managed_sink_processing_error_primary_close_runs(spark):
    # matrix row 2: processing fails, close ok → processing error raised,
    # close still ran on the failing partition
    d = _marker_dir()
    df = spark.range(0, 100).coalesce(1)

    def consume(r, row):
        if row["id"] == 50:
            raise ValueError("boom at 50")
        r.write(row["id"])

    with pytest.raises(Exception, match="boom at 50"):
        consume_managed(df, lambda: FileResource(d), consume)
    assert _n_closed(d) == _n_opened(d) > 0


def test_managed_sink_close_error_raised_when_processing_ok(spark):
    # matrix row 3: processing ok, close fails → close error raised + metric
    d = _marker_dir()
    before = metrics.GLOBAL.snapshot().values["ssp_resource_close_fail_total"]
    df = spark.range(0, 10).coalesce(1)
    with pytest.raises(Exception, match="close failed"):
        consume_managed(df, lambda: FileResource(d, fail_close=True), lambda r, row: r.write(row["id"]))
    assert metrics.GLOBAL.snapshot().values["ssp_resource_close_fail_total"] == before + 1


def test_managed_sink_both_fail_processing_error_wins(spark):
    # matrix row 4: both fail → processing error primary, close suppressed
    d = _marker_dir()
    df = spark.range(0, 10).coalesce(1)

    def consume(r, row):
        if row["id"] == 5:
            raise ValueError("processing boom")
        r.write(row["id"])

    with pytest.raises(Exception, match="processing boom"):
        consume_managed(df, lambda: FileResource(d, fail_close=True), consume)


def test_managed_source_close_on_success_and_error(spark):
    closed = []

    class Res:
        def close(self):
            closed.append(1)

    out = managed_source_run(Res, lambda r: spark.range(5), lambda df: df.count())
    assert out == 5 and len(closed) == 1

    def bad_action(df):
        raise RuntimeError("action boom")

    with pytest.raises(RuntimeError, match="action boom"):
        managed_source_run(Res, lambda r: spark.range(5), bad_action)
    assert len(closed) == 2  # closed exactly once more, despite the error


def test_execution_completed(spark):
    h = run_to_list_async(spark.range(1, 11).select(F.sum("id").alias("s")))
    outcome, result = h.outcome(timeout_s=60)
    assert outcome == Outcome.COMPLETED
    assert result[0].s == 55  # reference fold-sum golden


def test_execution_failed_counts_unhandled_error(spark):
    before = metrics.GLOBAL.snapshot().values["ssp_unhandled_error_total"]
    df = spark.range(1).select(F.expr("raise_error('deliberate')").alias("x"))
    h = ExecutionHandle(spark, lambda: df.collect())
    outcome, err = h.outcome(timeout_s=60)
    assert outcome == Outcome.FAILED
    assert "deliberate" in str(err)
    assert h.metrics_snapshot().values["ssp_unhandled_error_total"] == 1  # scoped
    assert metrics.GLOBAL.snapshot().values["ssp_unhandled_error_total"] == before + 1


def test_execution_cancelled(spark):
    # a deliberately slow job: per-row sleep via pandas_udf across few tasks
    import pandas as pd

    @F.pandas_udf("long")
    def slow(s: pd.Series) -> pd.Series:
        time.sleep(2)
        return s

    df = spark.range(0, 64, 1, 8).select(slow(F.col("id")).alias("x"))
    h = ExecutionHandle(spark, lambda: df.collect())
    time.sleep(1.0)  # let tasks start
    h.cancel()
    h.cancel()  # idempotent (reference Execution.scala:32-39)
    outcome, err = h.outcome(timeout_s=120)
    assert outcome == Outcome.CANCELLED


def test_cancellable_iterator(spark):
    it = CancellableIterator(spark.range(0, 1000, 1, 10).select("id"))
    first = next(it)
    assert first["id"] == 0
    it.cancel()
    with pytest.raises(StopIteration):
        next(it)


def test_observed_metrics_ride_the_job(spark):
    # reference metric-scoping golden (SimpleStreamProcessorTest.scala:527-546):
    # metrics are per-execution, computed by the executing job itself
    from pyspark.sql import functions as F

    from simple_stream_processor_spark import metrics as M

    df = spark.range(1, 101).select(F.col("id").alias("v"))
    rows, m = M.observed_action(
        df,
        lambda d: d.where(F.col("v") > 50).collect(),
        n_input=F.count(F.lit(1)),
        sum_input=F.sum("v"),
    )
    assert len(rows) == 50
    assert m == {"n_input": 100, "sum_input": 5050}


def test_observed_metrics_scoped_per_execution(spark):
    # two executions over different data: each observation sees only its own
    from pyspark.sql import functions as F

    from simple_stream_processor_spark import metrics as M

    _, m1 = M.observed_action(spark.range(10), lambda d: d.collect(), n=F.count(F.lit(1)))
    _, m2 = M.observed_action(spark.range(33), lambda d: d.collect(), n=F.count(F.lit(1)))
    assert (m1["n"], m2["n"]) == (10, 33)


def test_concurrent_executions_both_complete(spark):
    """X5 scheduler parity (reference JobManager slot scheduling,
    JobManager.scala:6-24; behavior test SimpleStreamProcessorTest.scala:
    567-601): two pipelines submitted concurrently run in independent job
    groups on Spark's scheduler and both complete with isolated results
    and isolated metric scopes."""
    from pyspark.sql import functions as F

    from simple_stream_processor_spark import execution

    df_a = spark.range(1, 1001).select(F.sum("id").alias("s"))
    df_b = spark.range(1, 101).select(F.sum("id").alias("s"))
    ha = execution.run_to_list_async(df_a, spark)
    hb = execution.run_to_list_async(df_b, spark)
    oa, ra = ha.outcome(120)
    ob, rb = hb.outcome(120)
    assert oa == execution.Outcome.COMPLETED and ra[0].s == 500500
    assert ob == execution.Outcome.COMPLETED and rb[0].s == 5050
    assert ha.metrics_snapshot().as_dict()["ssp_unhandled_error_total"] == 0
    assert hb.metrics_snapshot().as_dict()["ssp_unhandled_error_total"] == 0


def test_parmap_inflight_gauge_nonzero_during_slow_parmap(spark):
    """X7 gauge parity (reference metric schema docs/adr/metric-schema.md:
    5-13): ssp_parmap_inflight observes tasks currently executing inside
    parMap. A deliberately slow Arrow-batched map across all slots must be
    seen by the statusTracker sampler: peak in-flight > 0 while the job
    runs, bounded by the session's task slots, and the gauge returns to 0
    at quiescence."""
    import time

    from simple_stream_processor_spark import metrics as M
    from simple_stream_processor_spark.operators.parallel import par_map_ordered

    def slow_double(s):
        time.sleep(0.5)
        return s * 2

    df = spark.range(0, 64).withColumnRenamed("id", "v")
    out = par_map_ordered(df, "v", slow_double, "v", "doubled", "long", parallelism=8)
    coll = M.Collector()
    with M.track_inflight(spark, coll, interval=0.02) as t:
        # the action must CONSUME the UDF column: a bare count() lets
        # Catalyst prune the ArrowEvalPython node and the job finishes in
        # milliseconds with nothing in flight
        assert out.agg(F.sum("doubled")).collect()[0][0] == sum(2 * v for v in range(64))
    # the sampler reads per-stage counters non-atomically, so a stage handoff
    # can transiently double-count — bound loosely, the signal is peak > 0
    slots = spark.sparkContext.defaultParallelism
    assert 1 <= t.peak <= 2 * slots
    snap = coll.snapshot().as_dict()
    assert snap["ssp_parmap_inflight"] == 0  # quiescent after the action


def test_fair_pools_interleave_concurrent_executions(spark):
    """X5 scheduler parity, demonstrated (reference JobManager.scala:11-20
    greedy slot placement; scheduler golden SimpleStreamProcessorTest.scala:
    567-601): under FAIR pools, a short job submitted while a long job
    occupies every slot still gets its share at the next task boundary —
    its stages interleave with the long job's instead of FIFO-queueing
    behind all of its pending tasks.

    The workloads sleep JVM-side (Thread.sleep via reflect), which isolates
    the property under test: task *scheduling*. (A Python-UDF sleep would
    measure the Python worker pool on top of the scheduler — a different
    layer.) Sleeps also make the timing robust to ambient CPU load. FIFO
    floor: the short job would queue behind both 3 s waves of the long
    job (>= 6 s); FAIR must land well under half of that."""
    import time

    from pyspark.sql import functions as F

    from simple_stream_processor_spark import execution

    assert spark.sparkContext.getConf().get("spark.scheduler.mode") == "FAIR"

    slots = spark.sparkContext.defaultParallelism  # 4 in the test session
    slow = F.expr("reflect('java.lang.Thread','sleep', 3000L)")
    fast = F.expr("reflect('java.lang.Thread','sleep', 100L)")
    # long job: 2 waves of sleep(3) tasks filling every slot (~6 s minimum)
    long_df = spark.range(0, 2 * slots, numPartitions=2 * slots).select(slow.alias("x"), "id")
    # short job: one wave of sleep(0.1) tasks
    short_df = spark.range(0, slots, numPartitions=slots).select(fast.alias("x"), "id")

    ha = execution.run_to_list_async(long_df, spark, pool="batch")
    time.sleep(0.4)  # let the long job occupy the slots first
    t0 = time.perf_counter()
    hb = execution.run_to_list_async(short_df, spark, pool="interactive")
    ob, rb = hb.outcome(60)
    short_wall = time.perf_counter() - t0
    oa, ra = ha.outcome(60)
    assert oa == execution.Outcome.COMPLETED and sorted(r.id for r in ra) == list(range(2 * slots))
    assert ob == execution.Outcome.COMPLETED and sorted(r.id for r in rb) == list(range(slots))
    assert short_wall < 4.0, f"short job took {short_wall:.2f}s — not interleaved (FIFO floor ~6s)"
