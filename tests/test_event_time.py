"""Event-time semantics goldens (reference ADR-0006/0007,
SimpleStreamProcessorTest.scala:277-310, docs/adr/event-time-example.md).

Batch emulation of the reference's per-N-record watermark cadence + tumbling
window close/late-drop policy, on the exact micro-fixtures from FIXTURES.md.
"""

from pyspark.sql import functions as F

from simple_stream_processor_spark.operators import windows


def ts_df(spark, rows):
    # rows: (value, epoch_ms); arrival order = list position, NOT event time
    # (late events arrive after records with larger timestamps)
    return spark.createDataFrame(
        [(i, v, ms) for i, (v, ms) in enumerate(rows)], "arrival long, value string, ts_ms long"
    ).select("arrival", "value", F.timestamp_millis(F.col("ts_ms")).alias("ts"))


def test_watermark_cadence_golden(spark):
    # reference :277-292 — (a,1),(b,3),(c,7),(d,8), emitEveryN=2, window 5ms:
    # WM after (a,b) = 3; WM after (c,d) = 8 → closed window [0,5) = [a,b], wm 8
    df = ts_df(spark, [("a", 1), ("b", 3), ("c", 7), ("d", 8)])
    out = windows.watermark_cadence(df, "arrival", "ts", 2)
    rows = {r.value: r for r in out.collect()}
    # block 0 (a,b): initial watermark = MinValue → null wm, never late
    assert rows["a"].wm_ms is None and not rows["a"].is_late
    assert rows["b"].wm_ms is None and not rows["b"].is_late
    # block 1 (c,d): wm = max ts of block 0 = 3
    assert rows["c"].wm_ms == 3 and not rows["c"].is_late
    assert rows["d"].wm_ms == 3 and not rows["d"].is_late
    # final watermark (all blocks) = 8 → tumbling window [0,5) closes, [5,10) open
    final_wm = out.agg(F.max("_ts_ms").alias("wm")).collect()[0].wm
    assert final_wm == 8
    windowed = out.withColumn("wstart", F.expr("_ts_ms div 5 * 5"))
    closed = windowed.where(F.col("wstart") + 5 <= final_wm)
    assert sorted(r.value for r in closed.collect()) == ["a", "b"]


def test_late_event_dropped_golden(spark):
    # reference :294-310 / event-time-example.md — Record(a,1), WM 8 (via block),
    # Record(late,4): 4 < 8 → dropped, late-drop counter +1
    df = ts_df(spark, [("a", 1), ("hi", 8), ("late", 4), ("hi2", 9)])
    out = windows.watermark_cadence(df, "arrival", "ts", 2)
    rows = {r.value: r for r in out.collect()}
    assert rows["late"].is_late  # 4 < wm 8
    assert not rows["hi2"].is_late
    late_total = out.where("is_late").count()
    assert late_total == 1  # ≙ ssp_late_event_dropped_total golden


def test_watermark_cadence_fail_fast(spark):
    import pytest

    df = ts_df(spark, [("a", 1)])
    with pytest.raises(ValueError):
        windows.watermark_cadence(df, "arrival", "ts", 0)


def test_tumbling_assignment_epoch_aligned(spark):
    # reference Node.scala:327 — start = (ts/size)*size, here via F.window
    df = ts_df(spark, [("a", 1000), ("b", 4999), ("c", 5000)])
    out = (
        df.groupBy(F.window("ts", "5 seconds").alias("w"))
        .agg(F.sort_array(F.collect_list("value")).alias("vals"))
        .select(F.unix_timestamp("w.start").alias("start_s"), "vals")
        .orderBy("start_s")
        .collect()
    )
    assert [(r.start_s, list(r.vals)) for r in out] == [(0, ["a", "b"]), (5, ["c"])]
