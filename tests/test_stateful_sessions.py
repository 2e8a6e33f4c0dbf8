"""Event-time-timeout sessionizer (streaming/sessions.py): the state-
EVICTION capability none of the other stateful families exercise.

Pins, over a 3-micro-batch time-ordered replay of the sf0.001 events:

1. EXACTLY-ONCE, EXACT-VALUE EMISSION: every emitted session (data- or
   timeout-closed) matches the batch gaps-and-islands recomputation
   bit-for-bit (integer cents), with no duplicates.
2. PARTITION OF THE SESSION SET: emitted sessions + final state rows ==
   all batch sessions — nothing lost, nothing invented.
3. EVICTION REALLY FIRES: some sessions close by watermark timeout
   (closed_by='timeout') and the state store's numRowsRemoved metric
   records their removal; the final state holds only still-open sessions
   (bounded by |users|, not |sessions|).
"""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from simple_stream_processor_spark.streaming.runner import run_stream_to_memory
from simple_stream_processor_spark.streaming.sessions import (
    expected_sessions_batch,
    prepare_session_events,
    sessionize_stateful,
)
from simple_stream_processor_spark.tables import _normalize_timestamps

GAP_MS = 600_000


@pytest.fixture(scope="module")
def time_split_events_dir(tmp_path_factory):
    """sf0.001 events split into 3 parquet files by ts tercile, written in
    time order — with maxFilesPerTrigger=1 the replay is time-monotone
    across batches (the condition real ingestion gives the watermark)."""
    from simple_stream_processor_spark.session import get_spark

    spark = get_spark("pytest", cpus="4")
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    ev = _normalize_timestamps(spark, ev)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    root = str(tmp_path_factory.mktemp("session_split"))
    flat = os.path.join(root, "flat")
    os.makedirs(flat, exist_ok=True)
    for i in range(3):
        left = lo + span * i
        right = lo + span * (i + 1)
        part = ev.filter(
            (F.col("ts") >= F.lit(left)) & (F.col("ts") < F.lit(right) if i < 2 else F.lit(True))
        )
        tmp = os.path.join(root, f"tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        (src_file,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        # sequential copy => strictly increasing mtimes => deterministic
        # file-source admission order
        shutil.copy(src_file, os.path.join(flat, f"events_{i}.parquet"))
    return flat


def _session_rows(df):
    return sorted(
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n"], r["cents"])
        for r in df.collect()
    )


def test_sessionizer_eviction_and_exactness(spark, time_split_events_dir):
    schema = spark.read.parquet(time_split_events_dir).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(time_split_events_dir)
    )
    sdf = _normalize_timestamps(spark, sdf).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize_stateful(prepare_session_events(sdf), gap_ms=GAP_MS)
    drained, progress = run_stream_to_memory(out, output_mode="append")

    batch_ev = spark.read.parquet(time_split_events_dir)
    batch_ev = _normalize_timestamps(spark, batch_ev).withColumn("ts", F.col("ts").cast("timestamp"))
    expected = expected_sessions_batch(batch_ev, gap_ms=GAP_MS)

    emitted = _session_rows(drained)
    all_sessions = _session_rows(expected.select("user_id", "session_start_ms", "session_end_ms", "n", "cents"))

    # 1. exactly-once, exact values: emitted is a duplicate-free subset
    assert len(emitted) == len(set(emitted)), "duplicate session emission"
    assert set(emitted) <= set(all_sessions), "emitted session not in batch recomputation"

    # >= 3 micro-batches with data actually ran
    with_rows = [p for p in progress if p.get("numInputRows", 0) > 0]
    assert len(with_rows) >= 3, f"expected >=3 micro-batches, got {len(with_rows)}"

    # 2. partition: emitted + still-open state rows == all sessions
    state_totals = [
        so.get("numRowsTotal")
        for p in progress
        for so in p.get("stateOperators", [])
        if so.get("numRowsTotal") is not None
    ]
    assert state_totals, "no state operator metrics"
    final_state = state_totals[-1]
    assert len(emitted) + final_state == len(all_sessions), (
        f"emitted {len(emitted)} + state {final_state} != sessions {len(all_sessions)}"
    )

    # the still-open rows are exactly the sessions NOT emitted, and there is
    # at most one open session per user
    missing = set(all_sessions) - set(emitted)
    assert len(missing) == final_state
    n_users = batch_ev.select("user_id").distinct().count()
    assert final_state <= n_users

    # 3. eviction fired: timeout-closed sessions exist and the state store
    # recorded removals
    by_close = {r["closed_by"]: 0 for r in drained.collect()}
    for r in drained.collect():
        by_close[r["closed_by"]] += 1
    assert by_close.get("timeout", 0) > 0, "no session closed by event-time timeout"
    removed = sum(
        so.get("numRowsRemoved", 0) or 0
        for p in progress
        for so in p.get("stateOperators", [])
    )
    assert removed >= by_close["timeout"], (
        f"state removals {removed} < timeout emissions {by_close['timeout']}"
    )

    # every NON-last session per user is data-closed and emitted (a later
    # event proves its gap, no watermark needed)
    import collections

    last_per_user = {}
    for u, s, e, n, c in all_sessions:
        if u not in last_per_user or e > last_per_user[u][2]:
            last_per_user[u] = (u, s, e, n, c)
    non_last = [t for t in all_sessions if t != last_per_user[t[0]]]
    assert set(non_last) <= set(emitted), "a data-closable session was not emitted"
    counts = collections.Counter(t[0] for t in missing)
    assert all(v == 1 for v in counts.values()), "more than one open session per user in state"
