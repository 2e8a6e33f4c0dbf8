"""Production stateful OHLC path (streaming/ohlc.py — r8 judge task #8).

Pins the three properties the drain-a-commutative-aggregate twins don't
exercise end-to-end:

1. CROSS-BATCH STATE MERGE: the events table split into 3 files and
   streamed with maxFilesPerTrigger=1 forces >= 3 micro-batches, so bars
   spanning batches must merge through the state store, not inside one
   Arrow batch.
2. STATE BOUND: the state operator holds exactly one row per bar
   (|types| x |days|), never raw events — asserted from the streaming
   progress metrics (numRowsTotal == n_bars).
3. LATEST-WINS DRAIN: the update-mode sink accumulates one row per
   (key, touching batch); the max-n_events projection recovers the final
   bars bit-identically to the batch q_ohlc_bars.

The transformWithStateInPandas port (same state machine, StatefulProcessor
API) is container-gated on google.protobuf: here we pin the loud gate; the
live test self-activates wherever protobuf exists.
"""

import os

import pytest
from pyspark.sql import functions as F

from simple_stream_processor_spark.streaming.ohlc import (
    _merge_bars,
    ohlc_bars_stateful,
    ohlc_bars_tws,
    ohlc_latest_bars,
    prepare_ohlc_events,
    tws_available,
)
from simple_stream_processor_spark.streaming.runner import run_stream_to_memory
from simple_stream_processor_spark.tables import _normalize_timestamps


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def split_events_dir(tmp_path_factory):
    """sf0.001 events re-written as 3 parquet files so maxFilesPerTrigger=1
    yields 3 micro-batches (deterministic split on event_id mod 3)."""
    from simple_stream_processor_spark.session import get_spark

    spark = get_spark("pytest", cpus="4")
    root = str(tmp_path_factory.mktemp("ohlc_split"))
    ev = spark.read.parquet(os.path.join(os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"), "events.parquet"))
    for i in range(3):
        (
            ev.filter(F.col("event_id") % 3 == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(root, f"slice={i}"))
        )
    # flatten: the file source needs plain files under one dir
    import glob
    import shutil

    flat = os.path.join(root, "flat")
    os.makedirs(flat, exist_ok=True)
    for i, part in enumerate(sorted(glob.glob(os.path.join(root, "slice=*", "part-*.parquet")))):
        shutil.copy(part, os.path.join(flat, f"events_{i}.parquet"))
    return flat


def test_stateful_ohlc_cross_batch_merge_and_state_bound(spark, split_events_dir, sf_dir):
    schema = spark.read.parquet(split_events_dir).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events_dir)
    )
    sdf = _normalize_timestamps(spark, sdf).withColumn("ts", F.col("ts").cast("timestamp"))
    bars = ohlc_bars_stateful(prepare_ohlc_events(sdf))
    drained, progress = run_stream_to_memory(bars, output_mode="update")

    from simple_stream_processor_spark.queries_relational_ext import q_ohlc_bars

    expected = q_ohlc_bars(spark, sf_dir)
    got = ohlc_latest_bars(drained)
    assert _rows(got) == _rows(expected)

    # >= 3 micro-batches actually ran (the cross-batch merge was exercised)
    batches_with_rows = [p for p in progress if p.get("numInputRows", 0) > 0]
    assert len(batches_with_rows) >= 3, f"expected >=3 micro-batches, got {len(batches_with_rows)}"

    # state bound: one state row per bar, never raw events
    n_bars = expected.count()
    totals = [
        so.get("numRowsTotal")
        for p in progress
        for so in p.get("stateOperators", [])
        if so.get("numRowsTotal") is not None
    ]
    assert totals, "no state operator metrics in progress"
    assert max(totals) == n_bars, f"state rows {max(totals)} != bars {n_bars}"

    # the update-mode sink re-emitted touched bars per batch: more sink rows
    # than final bars proves per-batch update emission (not a single drain)
    assert drained.count() > n_bars


def test_merge_bars_commutative_associative():
    bars = [
        (10, 1, 5, 20, 2, 7, 5, 7, 2, 12),
        (5, 9, 3, 15, 4, 9, 3, 9, 3, 21),
        (12, 0, 8, 12, 0, 8, 8, 8, 1, 8),
    ]
    a, b, c = bars
    assert _merge_bars(a, b) == _merge_bars(b, a)
    assert _merge_bars(_merge_bars(a, b), c) == _merge_bars(a, _merge_bars(b, c))
    # identity on self-merge of counts is NOT expected (counts add);
    # witnesses are: open/close of the merged bar come from the operands
    m = _merge_bars(a, b)
    assert m[0:3] == b[0:3]  # b has the earlier (ts, id)
    assert m[3:6] == a[3:6]  # a has the later close witness
    assert m[8] == a[8] + b[8] and m[9] == a[9] + b[9]


@pytest.mark.skipif(tws_available(), reason="protobuf present: live TWS path covered below")
def test_tws_gate_raises_without_protobuf(spark, sf_dir):
    from simple_stream_processor_spark.streaming.runner import stream_events

    sdf = stream_events(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(NotImplementedError, match="google.protobuf"):
        ohlc_bars_tws(prepare_ohlc_events(sdf))


@pytest.mark.skipif(not tws_available(), reason="google.protobuf not installed in this container")
def test_tws_ohlc_matches_batch(spark, sf_dir):
    """Self-activates wherever protobuf exists: the StatefulProcessor port
    must produce the same final bars as the batch query."""
    from simple_stream_processor_spark.queries_relational_ext import q_ohlc_bars
    from simple_stream_processor_spark.streaming.runner import stream_events

    old = None
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        try:
            old = spark.conf.get(key)
        except Exception:
            old = None
        spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        sdf = stream_events(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))
        bars = ohlc_bars_tws(prepare_ohlc_events(sdf))
        drained, _ = run_stream_to_memory(bars, output_mode="update")
        assert _rows(ohlc_latest_bars(drained)) == _rows(q_ohlc_bars(spark, sf_dir))
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
