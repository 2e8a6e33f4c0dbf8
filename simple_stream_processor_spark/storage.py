"""Write-side storage layout: bucketed tables for shuffle-free fact-fact
joins and sorted-within-bucket layout for data skipping.

This is the materialization of SCALE.md §2's write-side strategy: the
lineitem x orders join (the one unavoidable shuffle in the TPC-H-shaped
workload) disappears entirely when both tables are bucketed on the join
key at write time — each bucket pairs 1:1, the join runs bucket-local,
and .explain shows NO Exchange on either fact side. At 100 TB this is the
difference between re-shuffling 100 TB per query and never shuffling it
again after ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted-within-bucket)
    managed parquet table. Bucket count rule of thumb at scale:
    total-size / n_buckets ≈ 100-200 MB per bucket file per partition."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_key)
    if sort_key is not None:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; Catalyst sees the bucket spec and plans
    bucket-local joins/aggregations when keys line up
    (spark.sql.sources.bucketing.enabled, on by default)."""
    return spark.table(table)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    partition_col: str = "event_date",
    mode: str = "overwrite",
) -> None:
    """Persist a time-series table hive-partitioned by calendar date —
    SCALE.md §2's layout for event data: a time-window query then prunes
    to the matching date directories at PLANNING time (`PartitionFilters`
    in the scan, untouched dates never opened). At 100 TB with ~3 years
    of events, a one-week dashboard query reads ~0.6% of the files
    instead of all of them.

    The partition column is DERIVED (date(ts)) and additive — the
    original timestamp stays in the data files, so intra-day predicates
    still push down as ordinary row-group filters."""
    from pyspark.sql import functions as F

    df.withColumn(partition_col, F.to_date(F.col(ts_col))).write.mode(mode).partitionBy(
        partition_col
    ).parquet(path)


def read_date_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a date-partitioned table. Filters on the partition column
    (or expressions Catalyst can rewrite onto it) prune directories before
    any I/O is scheduled."""
    return spark.read.parquet(path)
