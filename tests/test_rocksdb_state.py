"""RocksDB state-store compatibility: SCALE.md §4 sizes streaming state
for RocksDB (the disk-backed provider a 100 TB deployment runs instead of
the default in-memory HDFS-backed store), so the stateful twins must run
unchanged — and produce identical results — under it.

Two state-machine families are covered: engine-native watermarked window
state (q_streaming_tumbling) and Arrow-batched arbitrary state
(applyInPandasWithState, q_streaming_count_window). Each runs once under
the default provider and once under RocksDB; the results must match
row-for-row, and the RocksDB run must actually engage RocksDB (asserted
via the rocksdb* custom metrics in the streaming progress)."""

import pytest

from simple_stream_processor_spark.streaming.runner import run_stream_to_memory, stream_events
from simple_stream_processor_spark.streaming.windows import (
    streaming_count_window,
    streaming_tumbling_window,
)

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


@pytest.fixture()
def rocksdb_provider(spark):
    try:
        old = spark.conf.get(_PROVIDER_KEY)
    except Exception:
        old = None
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    yield
    if old is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, old)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def _assert_rocksdb_engaged(progress):
    metrics = [
        k
        for p in progress
        for op in p.get("stateOperators", [])
        for k in op.get("customMetrics", {})
    ]
    assert any("rocksdb" in k.lower() for k in metrics), f"no rocksdb metrics in {metrics[:10]}"


def test_tumbling_window_state_matches_on_rocksdb(spark, sf_dir, rocksdb_provider):
    sdf = streaming_tumbling_window(stream_events(spark, sf_dir), "ts", "1 hour", "0 seconds")
    rocks_out, progress = run_stream_to_memory(sdf, output_mode="complete")
    rocks_rows = _rows(rocks_out)
    _assert_rocksdb_engaged(progress)

    spark.conf.unset(_PROVIDER_KEY)
    sdf2 = streaming_tumbling_window(stream_events(spark, sf_dir), "ts", "1 hour", "0 seconds")
    default_out, _ = run_stream_to_memory(sdf2, output_mode="complete")
    assert rocks_rows == _rows(default_out)


def test_count_window_arbitrary_state_matches_on_rocksdb(spark, sf_dir, rocksdb_provider):
    sdf = streaming_count_window(stream_events(spark, sf_dir), 5)
    rocks_out, progress = run_stream_to_memory(sdf, output_mode="append")
    rocks_rows = _rows(rocks_out)
    _assert_rocksdb_engaged(progress)

    spark.conf.unset(_PROVIDER_KEY)
    sdf2 = streaming_count_window(stream_events(spark, sf_dir), 5)
    default_out, _ = run_stream_to_memory(sdf2, output_mode="append")
    assert rocks_rows == _rows(default_out)
