"""Reference unit-test goldens reproduced on tiny in-memory DataFrames
(FIXTURES.md §A; reference SimpleStreamProcessorTest.scala).

Each test pins the exact expected output the reference's suite asserts, so
operator semantics are provably carried over, not just API names.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from simple_stream_processor_spark.operators import core, errors, parallel, windows


def ints(spark, n=10):
    return spark.range(1, n + 1).select(F.col("id").alias("value"))


def test_map_filter_golden(spark):
    # reference SimpleStreamProcessorTest.scala:22-28 — map(_*2) over 1..10
    df = core.map_transform(ints(spark), (F.col("value") * 2).alias("doubled"))
    df = core.filter_where(df, F.col("doubled") > 0)
    assert [r.doubled for r in df.orderBy("doubled").collect()] == [2, 4, 6, 8, 10, 12, 14, 16, 18, 20]


def test_fold_sum_golden(spark):
    # reference :30-35 — fold (0)(+) over 1..10 == 55
    out = core.fold_agg(ints(spark), F.sum("value").alias("s")).collect()
    assert out[0].s == 55


def test_flatmap_empty_substreams_skipped(spark):
    # reference :37-43 — flatMap emitting 0..N elements; empties skipped
    df = spark.createDataFrame([(1, [1, 1]), (2, []), (3, [3])], "k int, xs array<int>")
    out = core.flat_map_explode(df, [F.col("k")], F.col("xs"), "x")
    assert sorted((r.k, r.x) for r in out.collect()) == [(1, 1), (1, 1), (3, 3)]


def test_recover_golden_10_5_minus1(spark):
    # reference :45-53 — [1,2,0,4] → 10/i, recover(-1) → [10, 5, -1]
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0), (3, 4)], "ord int, d int")
    withe = df.select(
        F.col("ord"), F.try_divide(F.lit(10), F.col("d")).alias("value")
    ).withColumn("is_err", F.col("value").isNull()).withColumn("_ord", F.col("ord"))
    fallback = spark.createDataFrame([(-1, -1.0)], "ord int, value double")
    out = errors.recover_value(withe, fallback)
    got = [r.value for r in out.orderBy(F.col("ord").asc_nulls_last()).collect()]
    assert sorted(got) == sorted([10.0, 5.0, -1.0])


def test_recover_with_stream_golden_sum_209(spark):
    # reference :73-80 / docs/examples.md:142 — [1,0,2] → 10/i,
    # recoverWith [99,100] → [10, 99, 100], sum 209
    df = spark.createDataFrame([(0, 1), (1, 0), (2, 2)], "ord int, d int")
    withe = df.select(
        F.col("ord"), F.try_divide(F.lit(10), F.col("d")).alias("value")
    ).withColumn("is_err", F.col("value").isNull()).withColumn("_ord", F.col("ord"))
    fb = spark.createDataFrame([(100, 99.0), (101, 100.0)], "ord int, value double")
    out = errors.recover_with_stream(withe, fb)
    vals = [r.value for r in out.collect()]
    assert sorted(vals) == [10.0, 99.0, 100.0]
    assert sum(vals) == 209.0


def test_no_error_no_fallback(spark):
    # recover on a clean stream passes everything through, no fallback row
    df = spark.createDataFrame([(0, 1), (1, 2)], "ord int, d int")
    withe = df.select(
        F.col("ord"), F.try_divide(F.lit(10), F.col("d")).alias("value")
    ).withColumn("is_err", F.col("value").isNull()).withColumn("_ord", F.col("ord"))
    fallback = spark.createDataFrame([(-1, -1.0)], "ord int, value double")
    out = errors.recover_value(withe, fallback)
    assert sorted(r.value for r in out.collect()) == [5.0, 10.0]


def test_count_window_golden_partial_final(spark):
    # reference :268-275 — 1..7 grouped(3) → [[1,2,3],[4,5,6],[7]]
    df = ints(spark, 7)
    out = windows.count_window(df, "value", 3)
    groups = (
        out.groupBy("window_no")
        .agg(F.sort_array(F.collect_list("value")).alias("vals"))
        .orderBy("window_no")
        .collect()
    )
    assert [list(r.vals) for r in groups] == [[1, 2, 3], [4, 5, 6], [7]]


def test_count_window_fail_fast(spark):
    import pytest

    with pytest.raises(ValueError):
        windows.count_window(ints(spark), "value", 0)
    with pytest.raises(ValueError):
        windows.count_window_scalable(ints(spark), "value", -1)


def test_parmap_ordered_golden(spark):
    # reference :82-94 — ordered reassembly under parallel execution:
    # output in input order regardless of per-element latency
    df = ints(spark, 300)

    def f(s):
        return s * 2

    out = parallel.par_map_ordered(df, "value", f, "value", "mapped", "long", parallelism=8)
    got = [r.mapped for r in out.orderBy("value").collect()]
    assert got == [2 * i for i in range(1, 301)]


def test_parmap_fail_fast(spark):
    import pytest

    with pytest.raises(ValueError):
        parallel.par_map_ordered(ints(spark), "value", lambda s: s, "value", "m", "long", parallelism=0)


def test_async_boundary_value_transparent(spark):
    # reference :130-138 — pipeline with boundary == pipeline without
    df = ints(spark, 100).select("value", (F.col("value") * 3).alias("tripled"))
    out = parallel.async_boundary(df, 16)
    assert sorted((r.value, r.tripled) for r in out.collect()) == [(i, 3 * i) for i in range(1, 101)]
    import pytest

    with pytest.raises(ValueError):
        parallel.async_boundary(df, 0)


def test_append_order_and_content(spark):
    a = spark.createDataFrame([(1,), (2,)], "v int")
    b = spark.createDataFrame([(3,)], "v int")
    assert sorted(r.v for r in core.append_union(a, b).collect()) == [1, 2, 3]


def test_take_ordered(spark):
    out = core.take_ordered(ints(spark, 100), [F.col("value").desc()], 5)
    assert [r.value for r in out.collect()] == [100, 99, 98, 97, 96]


def test_salted_join_equals_plain_join(spark):
    from simple_stream_processor_spark.operators import relational

    fact = spark.createDataFrame([(i % 3, i) for i in range(100)], "k int, v int")
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    salted = sorted((r.k, r.v, r.name) for r in relational.salted_join(fact, dim, "k", salt_n=4).collect())
    plain = sorted((r.k, r.v, r.name) for r in fact.join(dim, "k").collect())
    assert salted == plain


def test_map_with_error_capture_golden(spark):
    # arbitrary-Python form of the recover golden: f raises on 0
    def f(s):
        if (s == 0).any():
            raise ValueError("div by zero")
        return 10 / s

    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0), (3, 4)], "ord int, d int")
    withe = errors.map_with_error_capture(df, f, "d", "value", "double", "ord")
    rows = {r.ord: (r.value, r.err) for r in withe.collect()}
    assert rows[0][0] == 10.0 and rows[0][1] is None
    assert rows[1][0] == 5.0
    assert rows[2][0] is None and "ValueError" in rows[2][1]
    # and it composes with recover: prefix + one fallback
    fallback = spark.createDataFrame([(-1, -1.0)], "ord int, value double")
    out = errors.recover_value(withe.select("ord", "value", "is_err", "_ord"), fallback)
    assert sorted(r.value for r in out.collect()) == [-1.0, 5.0, 10.0]
