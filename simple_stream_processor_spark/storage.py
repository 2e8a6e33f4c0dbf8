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
