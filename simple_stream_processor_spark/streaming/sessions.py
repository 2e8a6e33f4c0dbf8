"""Production stateful sessionizer — gap sessions finalized by EVENT-TIME
TIMEOUT, the one ``applyInPandasWithState`` capability the other stateful
families (count windows, funnel, watermark cadence, OHLC bars) do not
exercise: state EVICTION driven by the watermark, not by new data.

Why this matters at scale: the drain-a-commutative-aggregate twins and the
NoTimeout stateful ops hold state until the query ends — correct for
bounded replays, but a 100 TB continuous sessionization would accumulate
one state row per user forever.  Here a session row leaves the state store
the moment the watermark passes ``session_end + gap``:

- a session CLOSED BY DATA (a later event from the same user arrives
  beyond the gap) emits immediately in that micro-batch (closed_by='gap');
- a session CLOSED BY SILENCE emits when its event-time timeout fires
  (closed_by='timeout') and its state row is REMOVED — the state store
  holds only the currently-open sessions, bounded by |active users within
  one gap|, regardless of total users ever seen.

Semantics mirror the batch ``q_session_window`` (queries.py:405, reference
non-goal docs/adr/0006:50-53 delivered as an extension): an event with
``ts_ms - end_ms < gap_ms`` extends the open session, ``>= gap_ms`` closes
it — the same boundary as ``F.session_window(ts, '10 minutes')`` (an event
exactly at ``end + gap`` starts a new session).  Sums are exact integer
cents so cross-batch folding is bit-identical to a batch recomputation.

Timeout timestamps are clamped one ms above the current watermark:
``GroupState.setTimeoutTimestamp`` rejects timestamps the watermark has
already passed (a session that SHOULD have closed mid-batch still gets a
one-tick timeout and evicts on the next trigger).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n", LongType()),
        StructField("cents", LongType()),
        StructField("closed_by", StringType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n", LongType()),
        StructField("cents", LongType()),
    ]
)


def prepare_session_events(sdf: DataFrame, watermark: str = "1 minute") -> DataFrame:
    """Project a streaming events relation to the sessionizer inputs and
    attach the watermark the event-time timeout runs on.  Integer cents
    (the ohlc_projection discipline) keep cross-batch sums exact."""
    return sdf.withWatermark("ts", watermark).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.col("event_id").cast("long").alias("event_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


def sessionize_stateful(prepared: DataFrame, gap_ms: int = 600_000) -> DataFrame:
    """Gap-session assembly on explicit per-user state with event-time
    timeout eviction (append mode: each session emits exactly once)."""

    def step(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple] = []

        if state.hasTimedOut:
            # silence-closed: the watermark passed end + gap with no new
            # event — finalize and EVICT the state row
            start_ms, end_ms, n, cents = state.get
            out.append((user_id, start_ms, end_ms, n, cents, "timeout"))
            state.remove()
            yield pd.DataFrame(out, columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields])
            return

        cur = state.get if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        # deterministic within-batch order: the same (ts, event_id) order
        # the batch oracle's gaps-and-islands window uses
        rows = rows.sort_values(["ts_ms", "event_id"], kind="mergesort")
        for ts_ms, cents in zip(rows["ts_ms"].to_numpy(), rows["cents"].to_numpy()):
            ts_ms, cents = int(ts_ms), int(cents)
            if cur is None:
                cur = (ts_ms, ts_ms, 1, cents)
            elif ts_ms - cur[1] < gap_ms:
                cur = (min(cur[0], ts_ms), max(cur[1], ts_ms), cur[2] + 1, cur[3] + cents)
            else:
                # data-closed: the next event itself proves the gap
                out.append((user_id, cur[0], cur[1], cur[2], cur[3], "gap"))
                cur = (ts_ms, ts_ms, 1, cents)

        state.update(cur)
        state.setTimeoutTimestamp(max(cur[1] + gap_ms, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields])

    return prepared.groupBy("user_id").applyInPandasWithState(
        step,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def expected_sessions_batch(events: DataFrame, gap_ms: int = 600_000) -> DataFrame:
    """Batch recomputation of the same session semantics (the test oracle):
    gaps-and-islands over (ts, event_id) with the identical >= gap_ms
    boundary and integer-cents sums."""
    w_ord = "PARTITION BY user_id ORDER BY ts_ms, event_id"
    flagged = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.col("event_id").cast("long").alias("event_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).selectExpr(
        "user_id",
        "ts_ms",
        "event_id",
        "cents",
        f"CASE WHEN lag(ts_ms) OVER ({w_ord}) IS NULL"
        f"       OR ts_ms - lag(ts_ms) OVER ({w_ord}) >= {gap_ms}"
        "      THEN 1 ELSE 0 END AS new_session",
    )
    sessions = flagged.selectExpr(
        "user_id",
        "ts_ms",
        "cents",
        f"sum(new_session) OVER ({w_ord} "
        "ROWS UNBOUNDED PRECEDING) AS session_id",
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("cents"),
    )
