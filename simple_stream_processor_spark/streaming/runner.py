"""Streaming execution helpers: file-based sources over the testdata
parquet (rate-limited = backpressure boundary) and memory-sink collection.

``Stream.fromBlockingQueue`` (reference Stream.scala:330-348) maps to a
rate-limited ``readStream``: the queue's end-of-stream signal becomes
``Trigger.AvailableNow`` (drain everything, then stop), the error signal
becomes a source exception failing the query, and the bounded-queue
admission becomes ``maxFilesPerTrigger``/``maxOffsetsPerTrigger``.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

TMP_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".tmp")

# Streaming audit capture (r9 judge task #5): when SPARK_GRAFT_STREAM_AUDIT=1,
# every stream this module (or a foreachBatch query) runs appends one record
# here — the final micro-batch physical plan plus all progress dicts — so
# tools/stream_audit.py can assert the Python-boundary and state-bound
# disciplines over the LIVE micro-batch plans, which tools/plan_audit.py
# (batch-only) structurally skips. Off by default: zero overhead on the
# driver/bench paths.
AUDIT_LOG: list[dict] = []


def _audit_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_STREAM_AUDIT", "0") == "1"


def audit_record(query, progress: list[dict] | None = None) -> None:
    """Append a (plan, progress) audit record for a finished StreamingQuery.
    Safe on any query state; never raises into the caller."""
    if not _audit_enabled():
        return
    rec: dict = {"plan": "", "progress": progress or []}
    try:
        if progress is None:
            rec["progress"] = [
                p.asDict() if hasattr(p, "asDict") else p for p in query.recentProgress
            ]
    except Exception:
        pass
    try:
        # the last executed micro-batch's physical plan; every batch of an
        # AvailableNow drain compiles the same shape, so one is representative
        rec["plan"] = query._jsq.explainInternal(False)
    except Exception as exc:
        rec["plan_error"] = f"{type(exc).__name__}: {exc}"[:200]
    AUDIT_LOG.append(rec)


def _tmpdir(kind: str) -> str:
    path = os.path.join(TMP_ROOT, kind, uuid.uuid4().hex[:12])
    os.makedirs(path, exist_ok=True)
    return path


# r11 (guide §1.2 "don't compute things you throw away"): the file streaming
# source needs an explicit schema, which every twin probed with a fresh
# spark.read.parquet(...).schema — a driver-side footer read (~0.1 s here)
# repeated 43 times across the twins and once per drain in every harness
# sweep. The schema is METADATA, invalidated by file mtime+size — caching it
# is not result caching (no query output is memoized; a changed fixture
# busts the key). One probe per (path, mtime, size) per process.
_SCHEMA_CACHE: dict = {}


def stream_schema(spark: SparkSession, sf_dir: str, table: str):
    """Memoized parquet schema probe for the streaming twins' readStream."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (path, None, None)
    if key not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return _SCHEMA_CACHE[key]


def stream_events(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Unbounded view of the events table via the file streaming source.
    ``max_files_per_trigger`` is the admission-control knob — the Spark
    form of the reference's bounded queue capacity (ADR-0004: block, never
    drop: unread files simply wait for the next trigger)."""
    from simple_stream_processor_spark.tables import _normalize_timestamps

    # the parquet file stores ts with isAdjustedToUTC=false → TIMESTAMP_NTZ
    # (or long under legacy nanosAsLong); reconstruct the plain-TIMESTAMP
    # column identically on the streaming path (see tables._normalize_timestamps)
    raw_schema = stream_schema(spark, sf_dir, "events")
    # the file streaming source requires a directory; narrow to the events
    # file with a glob filter
    reader = spark.readStream.schema(raw_schema).option("pathGlobFilter", "events.parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    return _normalize_timestamps(spark, df)


def run_stream_to_memory(
    sdf: DataFrame,
    output_mode: str = "append",
    timeout_s: int = 120,
) -> tuple[DataFrame, list[dict]]:
    """Run a streaming DataFrame to completion (AvailableNow) into a memory
    sink; return (result DataFrame, progress dicts). The progress list is
    the metrics surface — ``stateOperators[].numRowsDroppedByWatermark``
    is the reference's ``ssp_late_event_dropped_total``."""
    spark = sdf.sparkSession
    # State-store partition count is frozen to spark.sql.shuffle.partitions at
    # first checkpoint, and AQE never applies to streaming — under a
    # default-config session every micro-batch would pay 200 state tasks.
    # r10: size it to the STATE, not the core count — every stateful twin
    # here keeps bounded state (types x days, sources x bins: hundreds of
    # rows), and each state partition pays fixed open/commit checkpoint
    # overhead per micro-batch; 32 stores for 150 state rows measured 1.1 s
    # per drain vs 0.63 s with 8 (sf0.1, warm). min() keeps lower-core
    # driver runs identical; a real deployment with large keyed state
    # raises SPARK_GRAFT_STREAM_STATE_PARTITIONS instead (state volume /
    # target partition size), which is the same sizing rule expressed as a
    # knob. Value RESTORED after start so batch queries are untouched.
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    # r11: the default moved 8 -> 2 and is now DERIVED from the documented
    # state bound rather than clamped to it: every drained twin here keeps
    # O(types x days) ≈ 150-200 state rows, and the sizing rule is
    # ceil(state_rows / target_rows_per_store) with ~100 rows per store —
    # 2 stores. Measured (4-twin alternating A/B, sf0.1): 8 -> 2 is −8%
    # per drain; each extra store pays fixed open/commit checkpoint I/O
    # per micro-batch for a handful of rows. Production keyed state sizes
    # the same rule through SPARK_GRAFT_STREAM_STATE_PARTITIONS (state
    # volume / target partition size), unchanged.
    state_parts = int(
        os.environ.get(
            "SPARK_GRAFT_STREAM_STATE_PARTITIONS",
            str(min(spark.sparkContext.defaultParallelism, 2)),
        )
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(state_parts))
    name = "mem_" + uuid.uuid4().hex[:12]
    try:
        query = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", _tmpdir("chk"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_s)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    progress = [p.asDict() if hasattr(p, "asDict") else p for p in query.recentProgress]
    audit_record(query, progress)
    return spark.table(name), progress
