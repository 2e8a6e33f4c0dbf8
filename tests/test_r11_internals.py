"""Round-11 internal-rewrite parity pins (the r10 session-2 discipline):
each r11 rewrite that changed an operator's INTERNALS keeps a test that
pins the new form against the old form's semantics on a hostile fixture —
so the equivalence argument is executable, not only prose.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _old_bpe_fold(left: str, right: str):
    """The pre-r11 per-op Column construction of the merge fold."""
    fold = F.aggregate(
        F.slice("syms", 2, F.size("syms") - 1),
        F.slice("syms", 1, 1),
        lambda acc, s: F.when(
            (F.element_at(acc, -1) == F.lit(left)) & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return F.when(F.size("syms") >= 2, fold).otherwise(F.col("syms"))


def test_bpe_fold_expr_matches_old_column_form(spark):
    """bpe_fold_expr (one SQL expr) must fold identically to the old
    lambda-built Column on adversarial symbol arrays: overlapping pair
    runs (aaa), the merged pair recurring, single symbols, empties, and
    merge targets containing SQL-hostile characters (quote, backslash)."""
    from simple_stream_processor_spark.operators.text import bpe_fold_expr

    rows = [
        (["a", "a", "a", "a"],),
        (["a", "b", "a", "b", "a"],),
        (["x"],),
        ([],),
        (["a", "b"],),
        (["b", "a", "b", "b", "a"],),
        (["'", "\\", "'", "\\"],),
    ]
    df = spark.createDataFrame(rows, "syms array<string>")
    for left, right in [("a", "a"), ("a", "b"), ("b", "a"), ("'", "\\")]:
        old = [r[0] for r in df.select(_old_bpe_fold(left, right).alias("s")).collect()]
        new = [r[0] for r in df.select(bpe_fold_expr(left, right).alias("s")).collect()]
        assert old == new, f"fold divergence for merge ({left!r},{right!r})"


def test_grubbs_argmax_aggregate_matches_window_rank(spark):
    """grubbs_tail's max(struct(ad, -day)) aggregate must pick exactly the
    row_number()-over-(ad DESC, day ASC) rank-1 row — pinned on a fixture
    with ad TIES inside a group (the tie-break is the risky part) and a
    group where the extreme day comes last."""
    from pyspark.sql.window import Window

    rows = [
        # type, day, cents — 'a' has two days tied on |n*x - S|
        ("a", 1, 100), ("a", 2, 300), ("a", 3, 200),
        ("b", 1, 5), ("b", 2, 5), ("b", 3, 500),
        ("c", 7, 42),
    ]
    daily = spark.createDataFrame(rows, "event_type string, day long, cents long")
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
    )
    stats = g.select(F.col("event_type").alias("st_type"), "n_days", "s")
    joined = (
        daily.join(F.broadcast(stats), F.col("event_type") == F.col("st_type"))
        .drop("st_type")
        .select(
            "event_type", "day", "n_days", "s",
            F.abs(
                F.col("n_days").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)")
                - F.col("s")
            ).alias("ad"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(F.col("ad").desc(), F.col("day").asc())
    want = sorted(
        (r["event_type"], r["day"], str(r["ad"]))
        for r in joined.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).collect()
    )
    got = sorted(
        (r["event_type"], r["day"], str(r["ad"]))
        for r in (
            joined.groupBy("event_type", "n_days", "s")
            .agg(F.max(F.struct(F.col("ad"), (-F.col("day")).alias("md"))).alias("m"))
            .select("event_type", F.col("m.ad").alias("ad"), (-F.col("m.md")).alias("day"))
        ).collect()
    )
    assert want == got


def test_bpe_merges_frees_old_round_checkpoints(spark):
    """The r11 eager release must leave at most TWO vocab-sized round
    checkpoints cached when the merge table materializes (was: one per
    round until driver GC)."""
    from simple_stream_processor_spark.operators.text import bpe_merges
    from simple_stream_processor_spark.registry import release_scoped_caches

    def n_cached():
        sc = spark.sparkContext
        return sum(
            1 for i in sc._jsc.sc().getRDDStorageInfo() if i.memSize() + i.diskSize() > 0
        )

    release_scoped_caches()
    before = n_cached()  # whatever earlier suite fixtures left behind
    docs = spark.createDataFrame(
        [(i, "abcdef abcde abcd abc ab xyz xy " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    out = bpe_merges(docs, rounds=6)
    assert out.count() >= 4  # the corpus supports several merges
    # the DELTA this query adds: the scoped word persist + at most TWO live
    # round checkpoints (pre-r11: one cached checkpoint PER round, 6 here)
    assert n_cached() - before <= 3, (before, n_cached())
    release_scoped_caches()
