"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — the declared-operator registry from
``simple_stream_processor_spark.queries`` (SURVEY.md §2 coverage).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: scan events → filter →
    tumbling 1-hour event-time window → aggregate → deterministic order.
    Exercises the full lifecycle: pushdown-eligible filter, epoch-aligned
    window bucketing, partial+final agg, top-level sort."""
    from simple_stream_processor_spark.tables import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    return (
        ev.where(F.col("event_type").isin("purchase", "checkout", "view", "click"))
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start_s"), "event_type", "n", "sum_value")
        .orderBy("window_start_s", "event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import simple_stream_processor_spark.queries  # noqa: F401  (registers core)
    import simple_stream_processor_spark.queries_llmdata  # noqa: F401  (registers LLM-data)
    import simple_stream_processor_spark.queries_relational_ext  # noqa: F401  (registers asof/range/rollup/cube/pivot)
    import simple_stream_processor_spark.queries_tpch  # noqa: F401  (registers TPC-H shapes + SQL surface)
    import simple_stream_processor_spark.queries_streaming  # noqa: F401  (registers streaming/lifecycle)
    from simple_stream_processor_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    queries()  # ensure all query modules are registered
    from simple_stream_processor_spark.registry import ORACLES

    return dict(ORACLES)
