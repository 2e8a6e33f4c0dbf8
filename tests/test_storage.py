"""Bucketed-layout tests: the write-side strategy SCALE.md promises,
verified against the physical plan — a fact-fact join over co-bucketed
tables must run with NO shuffle exchange on either side."""

import pytest
from pyspark.sql import functions as F

from simple_stream_processor_spark import storage
from simple_stream_processor_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_extendedprice", "l_discount")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    storage.write_bucketed(li, "li_bucketed", "l_orderkey", 8)
    storage.write_bucketed(o, "o_bucketed", "o_orderkey", 8)
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = storage.read_table(spark, li_t)
    o = storage.read_table(spark, o_t)
    # disable broadcast so the plan MUST choose a co-bucketed join strategy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._sc._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "extended")
        phys = plan.split("== Physical Plan ==")[-1]
        assert "Exchange hashpartitioning" not in phys, "bucketed join still shuffles"
        assert "SortMergeJoin" in phys or "ShuffledHashJoin" in phys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_values_match_plain_join(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = storage.read_table(spark, li_t)
    o = storage.read_table(spark, o_t)
    bucketed_rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("r"))
        .collect()[0]
        .r
    )
    li_p = load_table(spark, "lineitem", sf_dir)
    o_p = load_table(spark, "orders", sf_dir)
    plain_rev = (
        li_p.join(o_p, li_p.l_orderkey == o_p.o_orderkey)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("r"))
        .collect()[0]
        .r
    )
    assert bucketed_rev == plain_rev


def test_bucketed_agg_avoids_exchange(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    li = storage.read_table(spark, li_t)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_extendedprice").alias("s"))
    plan = agg._sc._jvm.PythonSQLUtils.explainString(agg._jdf.queryExecution(), "extended")
    phys = plan.split("== Physical Plan ==")[-1]
    assert "Exchange hashpartitioning" not in phys, "groupBy on bucket key still shuffles"


def test_date_partitioned_write_prunes_at_planning_time(spark, sf_dir, tmp_path):
    """SCALE.md §2: a date filter on the partition column must become a
    PartitionFilter (directory pruning), not a data filter — and the
    pruned read must agree with the unpartitioned read."""
    from pyspark.sql import functions as F

    from simple_stream_processor_spark import storage
    from simple_stream_processor_spark.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    path = str(tmp_path / "events_by_date")
    storage.write_date_partitioned(ev, path)

    back = storage.read_date_partitioned(spark, path)
    lo, hi = "2024-01-08", "2024-01-15"
    pruned = back.where((F.col("event_date") >= lo) & (F.col("event_date") < hi))

    plan = pruned._sc._jvm.PythonSQLUtils.explainString(pruned._jdf.queryExecution(), "formatted")
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and "event_date" in scan[0], plan
    # no residual event_date predicate on the data side
    data_filters = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert all("event_date" not in ln for ln in data_filters)

    expect = ev.where((F.to_date("ts") >= F.lit(lo)) & (F.to_date("ts") < F.lit(hi))).count()
    assert pruned.count() == expect and expect > 0


def _row_group_ranges(path: str, col: str) -> list[int]:
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        pf = pq.ParquetFile(f)
        for i in range(pf.metadata.num_row_groups):
            rg = pf.metadata.row_group(i)
            for j in range(rg.num_columns):
                c = rg.column(j)
                if c.path_in_schema == col:
                    out.append(c.statistics.max - c.statistics.min)
    return out


def test_zorder_write_tightens_stats_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered layout must yield parquet row-group min/max stats that
    are tight in BOTH clustering columns (≈ sqrt(n_rg) cells per dim),
    where a single-column sort leaves the other column at ~full domain —
    the quantitative basis for two-dimensional row-group skipping."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.col("value").cast("int").alias("val")
    )
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("val"), F.max("val")
    ).collect()[0]
    zp, sp = str(tmp_path / "z"), str(tmp_path / "s")
    storage.write_zordered(
        ev, zp, "user_id", "val", n_files=8, x_domain=hi_u + 1, y_domain=hi_v + 1
    )
    ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id").write.parquet(sp)

    def mean(xs):
        return sum(xs) / len(xs)

    zu, zv = mean(_row_group_ranges(zp, "user_id")), mean(_row_group_ranges(zp, "val"))
    su, sv = mean(_row_group_ranges(sp, "user_id")), mean(_row_group_ranges(sp, "val"))
    du, dv = hi_u - lo_u, hi_v - lo_v
    # z-order: useful skipping on BOTH dims
    assert zu < 0.5 * du and zv < 0.5 * dv, (zu, du, zv, dv)
    # single-column sort: great on its key, none on the other
    assert su < 0.2 * du and sv > 0.6 * dv, (su, sv)
    # layout change must not change the data
    back = spark.read.parquet(zp)
    assert back.count() == ev.count()
    assert back.groupBy().agg(F.sum("user_id"), F.sum("val")).collect() == \
        ev.groupBy().agg(F.sum("user_id"), F.sum("val")).collect()


def test_snapshot_versions_pin_reads(spark, sf_dir, tmp_path):
    """Append creates a new version without disturbing pinned reads;
    overwrite starts the visible set fresh while older versions stay
    readable; a pinned DataFrame built BEFORE a later commit still
    resolves to its own file set."""
    from simple_stream_processor_spark.storage import (
        snapshot_read,
        snapshot_versions,
        snapshot_write,
    )
    from simple_stream_processor_spark.tables import load_table

    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    path = str(tmp_path / "snap")

    v1 = snapshot_write(spark, nation.where("n_nationkey < 10"), path)
    pinned_v1 = snapshot_read(spark, path, version=v1)
    v2 = snapshot_write(spark, nation.where("n_nationkey >= 10"), path)  # append

    assert snapshot_versions(path) == [v1, v2] == [1, 2]
    assert snapshot_read(spark, path, version=1).count() == 10
    assert snapshot_read(spark, path).count() == nation.count()  # latest = union
    assert pinned_v1.count() == 10  # a commit AFTER the read changes nothing

    v3 = snapshot_write(spark, nation.where("n_nationkey = 0"), path, mode="overwrite")
    assert snapshot_read(spark, path).count() == 1
    assert snapshot_read(spark, path, version=2).count() == nation.count()  # history intact
    assert snapshot_versions(path) == [1, 2, 3] and v3 == 3


def test_snapshot_read_unknown_version_raises(spark, sf_dir, tmp_path):
    import pytest

    from simple_stream_processor_spark.storage import snapshot_read, snapshot_write
    from simple_stream_processor_spark.tables import load_table

    path = str(tmp_path / "snap2")
    snapshot_write(spark, load_table(spark, "region", sf_dir), path)
    with pytest.raises(FileNotFoundError, match="not in"):
        snapshot_read(spark, path, version=99)


def test_snapshot_vacuum_preserves_kept_versions(spark, sf_dir, tmp_path):
    """Vacuum retires old versions and their unreachable files, but every
    file a kept manifest references (including append-carried ones)
    survives and the kept version still reads identically."""
    from simple_stream_processor_spark.storage import (
        snapshot_read,
        snapshot_vacuum,
        snapshot_versions,
        snapshot_write,
    )
    from simple_stream_processor_spark.tables import load_table

    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    path = str(tmp_path / "snapv")
    snapshot_write(spark, nation.where("n_nationkey < 10"), path)
    snapshot_write(spark, nation.where("n_nationkey >= 10"), path)  # v2 carries v1 files
    snapshot_write(spark, nation.where("n_nationkey = 3"), path, mode="overwrite")  # v3 orphans both

    out = snapshot_vacuum(path, keep_last=2)  # keep v2 (full union) and v3
    assert out["retired_versions"] == [1] and out["removed_files"] == 0  # v2 still needs v1's files
    assert snapshot_versions(path) == [2, 3]
    assert snapshot_read(spark, path, version=2).count() == nation.count()

    out2 = snapshot_vacuum(path, keep_last=1)  # only v3 survives
    assert out2["retired_versions"] == [2] and out2["removed_files"] > 0
    assert snapshot_read(spark, path).count() == 1


def test_snapshot_batch_sink_exactly_once(spark, sf_dir, tmp_path):
    """foreachBatch → snapshot_write_batch is an exactly-once sink: a
    real stream commits its micro-batches, and replaying an
    already-committed batch id (what Structured Streaming does after a
    failure) is a no-op — versions, files, and row counts unchanged."""
    from simple_stream_processor_spark.storage import (
        snapshot_read,
        snapshot_versions,
        snapshot_write_batch,
    )
    from simple_stream_processor_spark.streaming.runner import stream_events

    path = str(tmp_path / "snap_stream")
    sdf = stream_events(spark, sf_dir).select("event_id", "event_type", "value")
    q = (
        sdf.writeStream.foreachBatch(
            lambda batch, bid: snapshot_write_batch(spark, batch, path, bid)
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    versions = snapshot_versions(path)
    assert versions, "stream committed no batches"
    total = snapshot_read(spark, path).count()
    from simple_stream_processor_spark.tables import load_table

    assert total == load_table(spark, "events", sf_dir).count()

    # replay every committed batch id with fresh (even different) data:
    # all must no-op because the ids are already in the manifest log
    replay = load_table(spark, "events", sf_dir).limit(5).select("event_id", "event_type", "value")
    for bid in range(len(versions)):
        v = snapshot_write_batch(spark, replay, path, bid)
        assert v in versions  # returned the existing commit, minted nothing
    assert snapshot_versions(path) == versions
    assert snapshot_read(spark, path).count() == total
