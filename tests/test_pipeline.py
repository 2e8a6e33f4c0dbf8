"""Fluent Pipeline API tests (reference Node surface, Node.scala:14-127;
topology golden, SimpleStreamProcessorTest.scala:603-627; managed-resource
terminals, docs/adr/error-and-cancellation-matrix.md)."""

import pytest
from pyspark.sql import functions as F

from simple_stream_processor_spark.pipeline import Pipeline


def src(spark, n=10):
    return spark.range(1, n + 1).select(F.col("id").alias("value"))


def test_fluent_map_filter_sink(spark):
    # reference README.md pipeline shape: source.map.filter.toSink
    out = (
        Pipeline.source(src(spark))
        .map(F.col("value"), (F.col("value") * 2).alias("doubled"))
        .filter(F.col("doubled") > 4)
        .to_sink(F.sum("doubled").alias("s"))
        .collect()
    )
    assert out[0].s == sum(2 * i for i in range(3, 11))


def test_topology_golden(spark):
    p = (
        Pipeline.source(src(spark))
        .map((F.col("value") * 2).alias("doubled"))
        .filter(F.col("doubled") > 0)
        .async_boundary(16)
        .window_by_count("doubled", 3)
    )
    assert p.topology() == "Source[1 cols] -> Map -> Filter -> AsyncBoundary[16] -> CountWindow[3]"


def test_explain_topology_shows_physical_plan(spark):
    p = Pipeline.source(src(spark)).filter(F.col("value") > 5)
    plan = p.explain_topology()
    assert "Physical Plan" in plan and "Filter" in plan


def test_fluent_parmap_chain(spark):
    out = (
        Pipeline.source(src(spark, 100))
        .par_map("value", lambda s: s * 2, "value", "mapped", "long", parallelism=8)
        .async_boundary(16)
        .to_sink(F.sum("mapped").alias("s"))
        .collect()
    )
    assert out[0].s == 100 * 101  # 2 * N(N+1)/2


def test_fluent_event_time_window(spark):
    rows = [(i, f"2024-01-01 0{i // 4}:0{i % 4}:00") for i in range(8)]
    df = spark.createDataFrame(rows, "v long, ts_s string").select("v", F.col("ts_s").cast("timestamp").alias("ts"))
    p = Pipeline.source(df).window_by_event_time("ts", "1 hour", "v")
    got = {r.start.hour: list(r.values) for r in p.to_list()}
    assert got == {0: [0, 1, 2, 3], 1: [4, 5, 6, 7]}


class _Resource:
    def __init__(self, fail_close=False):
        self.closed = 0
        self.fail_close = fail_close

    def close(self):
        self.closed += 1
        if self.fail_close:
            raise OSError("close boom")


def test_managed_source_closes_once_on_success(spark):
    holder = {}

    def factory():
        holder["r"] = _Resource()
        return holder["r"]

    p = Pipeline.managed_source(factory, lambda r: src(spark)).filter(F.col("value") > 8)
    assert sorted(r.value for r in p.to_list()) == [9, 10]
    assert holder["r"].closed == 1


def test_managed_source_close_error_raised_when_processing_ok(spark):
    p = Pipeline.managed_source(lambda: _Resource(fail_close=True), lambda r: src(spark))
    with pytest.raises(OSError, match="close boom"):
        p.to_list()


def test_managed_source_processing_error_primary(spark):
    p = Pipeline.managed_source(lambda: _Resource(fail_close=True), lambda r: src(spark)).map(
        F.assert_true(F.col("value") < 5).alias("boom"), F.col("value")
    )
    with pytest.raises(Exception) as exc_info:
        p.to_list()
    # processing error is primary; close error suppressed onto it
    assert not isinstance(exc_info.value, OSError)
    assert isinstance(getattr(exc_info.value, "suppressed", None), OSError)


def test_fluent_recover_golden(spark):
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0), (3, 4)], "ord int, d int")
    fallback = spark.createDataFrame([(-1, -1.0)], "ord int, value double")
    out = (
        Pipeline.source(df)
        .with_error_channel(F.try_divide(F.lit(10), F.col("d")), "ord")
        .map(F.col("ord"), F.col("value"), F.col("is_err"), F.col("_ord"))
        .recover(fallback)
        .to_list()
    )
    assert sorted(r.value for r in out) == [-1.0, 5.0, 10.0]
