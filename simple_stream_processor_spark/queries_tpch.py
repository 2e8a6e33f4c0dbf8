"""Classic TPC-H query shapes (Q1/Q3/Q6) as declared queries — the
canonical analytics-engine workload, exercising date-predicate pushdown,
multi-aggregate grouping, and join+agg+topk in one plan — plus the SQL
entry point (spark.sql over registered views), proving the engine's SQL
surface produces the identical plans/results as the DataFrame surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_stream_processor_spark.registry import query
from simple_stream_processor_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary): one scan with a pushed date predicate,
    partial+final hash agg over a 4-6 key group. The widest aggregate list
    in the suite — all in one codegen span, one tiny exchange."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS orderdate_ms
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1997-06-01' AND l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (top revenue orders): both date filters push to their
    scans BEFORE the join, the filtered orders side broadcasts, and the
    top-10 is TakeOrderedAndProject — no global sort."""
    cutoff = F.lit("1997-06-01").cast("timestamp")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000").alias("orderdate_ms"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure scan-filter-fold. Every
    predicate reaches the parquet reader; the whole query is one codegen
    span plus a one-row combine."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@query(
    "q_sql_surface",
    oracle="""
    SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: registered temp views + ``spark.sql`` — the
    same Catalyst plans as the DataFrame surface (broadcast join picked by
    the optimizer from the view stats), proving a reference user can bring
    plain SQL to this engine unchanged."""
    from simple_stream_processor_spark.tables import register_views

    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): date-pruned orders
    LEFT SEMI join lineitem on the EXISTS condition — the semi join stops
    probing at first match and never widens the row."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi"
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q_tpch_q14",
    oracle="""
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): date-pruned lineitem, broadcast part
    dim, conditional aggregation ratio in one pass."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0.0))
    return j.agg(F.round(100.0 * F.sum(promo) / F.sum(disc), 4).alias("promo_revenue"))


@query(
    "q_tpch_q10",
    oracle="""
    SELECT c_custkey, n_name,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))::BIGINT
             AS revenue_cents
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, n_name
    ORDER BY revenue_cents DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): both filters pushed to
    their scans, quarter-pruned orders and the two dims broadcast, top-20
    via TakeOrderedAndProject. Revenue is summed in integer cents
    (per-term round, exact integer sum) — double-sum order differs between
    engines and a 2dp round of the float total can flip on a .005
    boundary; integer cents are order-independent."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")
    return (
        j.groupBy("c_custkey", "n_name")
        .agg(F.sum(cents).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 90
    )
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM orders
    JOIN big ON o_orderkey = big.l_orderkey
    JOIN lineitem ON lineitem.l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_custkey, o_totalprice
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the HAVING subquery is a
    pre-aggregation whose (small) result broadcasts back against both
    facts — the aggregate acts as its own semi-join filter, so the wide
    join only ever sees qualifying orders."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).where(F.col("q") > 90).select("l_orderkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    j = li.join(F.broadcast(big), "l_orderkey").join(
        F.broadcast(o), F.col("l_orderkey") == o.o_orderkey
    )
    return j.groupBy("o_orderkey", "o_custkey", "o_totalprice").agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty")
    ).select(
        "o_orderkey", "o_custkey", F.round(F.col("o_totalprice"), 2).alias("totalprice"), "total_qty"
    )
