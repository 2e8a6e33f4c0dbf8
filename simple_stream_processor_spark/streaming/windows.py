"""Streaming event-time windows (reference windowByEventTime,
Node.scala:315-356) and stateful count windows (reference windowByCount,
Node.scala:276-280) on Structured Streaming.

Semantic mapping (ADR-0006/0007 parity):
- window assignment (ts/size)*size ≡ ``F.window`` epoch-aligned buckets;
- late-record drop below the watermark is engine-native (visible as
  ``numRowsDroppedByWatermark`` ≙ ``ssp_late_event_dropped_total``);
- watermark monotonicity is by construction (a regressing watermark is
  impossible — the reference counts and ignores them, Node.scala:344-346);
- the reference's explicit ``Watermark(MaxValue)`` end-of-stream flush
  (ADR-0006:18-19) ≈ ``complete`` output mode (all windows, open + closed)
  or AvailableNow final-batch watermark advance in ``append`` mode
  (closed windows only).
- count windows need per-key arrival state → ``applyInPandasWithState``:
  full chunks emit as they fill; the in-progress remainder stays in state
  (the reference emits the final partial chunk at halt — a streaming query
  has no halt, so the remainder emits on timeout/stop; divergence noted).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def streaming_tumbling_window(sdf: DataFrame, ts_col: str, size: str, delay: str) -> DataFrame:
    """Tumbling event-time aggregation with watermark-driven late dropping.
    State is bounded: windows older than (watermark - delay) are evicted
    after emission — the property that lets this run forever at any rate."""
    return (
        sdf.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), size).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_session_window(sdf: DataFrame, ts_col: str, gap: str, delay: str, key: str = "user_id") -> DataFrame:
    """Session windows (gap-merged) per key — reference non-goal
    (ADR-0006:50-53) supplied natively; state bounded by the watermark."""
    return (
        sdf.withWatermark(ts_col, delay)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(key, F.expr("unix_micros(w.start) div 1000").alias("session_start_ms"), "n")
    )


COUNT_WINDOW_OUTPUT = "user_id long, window_no long, n long, first_id long, last_id long"


def streaming_count_window(sdf: DataFrame, size: int, key: str = "user_id") -> DataFrame:
    """Per-key count windows over arrival order (reference
    windowByCount/grouped): buffer rows in group state, emit a window row
    every ``size`` arrivals, keep the remainder buffered.

    State per key is O(size) ids — bounded regardless of stream length
    (the scale property the reference gets from its single-process
    ListBuffer, here distributed across the state store)."""
    if size <= 0:
        raise ValueError(f"size must be > 0, got {size}")  # fail-fast parity (reference Stream.scala:234)

    state_schema = StructType(
        [
            StructField("emitted", LongType()),
            StructField("n_buf", LongType()),
            StructField("buf_first", LongType()),
            StructField("buf_last", LongType()),
        ]
    )

    def chunk(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (uid,) = key_tuple
        if state.exists:
            emitted, n_buf, buf_first, buf_last = state.get
        else:
            emitted, n_buf, buf_first, buf_last = 0, 0, None, None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("event_id")
            for eid in pdf["event_id"]:
                eid = int(eid)
                if n_buf == 0:
                    buf_first = eid
                buf_last = eid
                n_buf += 1
                if n_buf == size:
                    out.append((uid, emitted, n_buf, buf_first, buf_last))
                    emitted += 1
                    n_buf, buf_first, buf_last = 0, None, None
        state.update((emitted, n_buf, buf_first, buf_last))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "window_no", "n", "first_id", "last_id"])

    return sdf.groupBy(F.col(key)).applyInPandasWithState(
        chunk, COUNT_WINDOW_OUTPUT, state_schema, "append", GroupStateTimeout.NoTimeout
    )


CADENCE_OUTPUT = "{order_col} long, ts_ms long, wm_ms long, is_late boolean"


def streaming_watermark_cadence(sdf: DataFrame, order_col: str, ts_col: str, emit_every_n: int, key: str | None = None) -> DataFrame:
    """W1 streaming twin — the reference's per-N-record watermark CADENCE,
    not just its policy (reference WatermarkPipe, Node.scala:289-313):
    watermark = max event time seen, (re)emitted after every N records; a
    record is late iff its ts is below the watermark in force when it
    arrives (drop policy ADR-0007:13-14; initial watermark Long.MinValue →
    null wm_ms here). Spark's engine advances watermarks per *trigger*, so
    the per-N cadence runs in keyed group state instead
    (applyInPandasWithState) — count, running max, and the in-force
    watermark survive across micro-batches.

    ``key=None`` reproduces the reference exactly: ONE cadence for the
    whole stream (a single state key — inherently sequential, same as the
    reference's single-threaded pipe; bounded control streams only).
    Passing a column name gives per-key cadences — the form that
    distributes across the state store at scale.

    Output: (event_id, ts_ms, wm_ms, is_late); late records are FLAGGED,
    not swallowed, so callers choose drop vs audit and the late count is
    ``sum(is_late)`` ≙ ssp_late_event_dropped_total."""
    if emit_every_n <= 0:
        raise ValueError(f"emit_every_n must be > 0, got {emit_every_n}")  # parity Node.scala:291

    state_schema = StructType(
        [
            StructField("count", LongType()),
            StructField("max_ts", LongType()),
            StructField("wm", LongType()),
        ]
    )

    def cadence(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            count, max_ts, wm = state.get
        else:
            count, max_ts, wm = 0, None, None
        rows = []
        for pdf in pdfs:
            # arrival order: batch sequence between triggers, order_col within
            pdf = pdf.sort_values(order_col)
            for eid, ts in zip(pdf[order_col], pdf["_ts_ms"]):
                eid, ts = int(eid), int(ts)
                rows.append((eid, ts, wm, wm is not None and ts < wm))
                count += 1
                max_ts = ts if max_ts is None else max(max_ts, ts)
                if count % emit_every_n == 0:
                    wm = max_ts
        state.update((count, max_ts, wm))
        if rows:
            yield pd.DataFrame(rows, columns=[order_col, "ts_ms", "wm_ms", "is_late"])

    ts_ms = F.unix_millis(F.col(ts_col)).alias("_ts_ms")  # exact ms; double*1000 truncates
    group = F.col(key) if key is not None else F.lit(0)
    prepared = sdf.select(F.col(order_col), ts_ms, group.alias("_g"))
    return prepared.groupBy("_g").applyInPandasWithState(
        cadence, CADENCE_OUTPUT.format(order_col=order_col), state_schema, "append", GroupStateTimeout.NoTimeout
    )
