"""Relational extensions (SURVEY §2.8 N1-N9): keyed aggregation, joins,
sort/top-k, distinct/set ops, ranking windows, scalar functions.

The reference has none of these (SURVEY §2.7 — explicitly absent); they are
the north-star extensions that make the engine a usable analytics surface
over the TPC-H-ish testdata. Everything here is pure DataFrame API so
Catalyst supplies pushdown, join selection (broadcast vs sort-merge), and
AQE runtime re-planning.

Scale notes per operator are in each docstring; the common rules:
- dims (region/nation/supplier at TPC-H shape) are broadcast — no shuffle
  of the fact side;
- fact-fact joins (lineitem x orders) shuffle on the join key; at 100 TB
  you bucket both tables on orderkey at write time to eliminate it;
- keyed aggs are partial+final (map-side combine) automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Keyed hash aggregation (N1). Physical: HashAggregate(partial) →
    Exchange(hash keys) → HashAggregate(final). Low-cardinality keys like
    (l_returnflag, l_linestatus) reduce to a handful of rows before the
    exchange — the shuffle moves only #distinct-keys rows per partition."""
    return df.groupBy(*keys).agg(*aggs)


def join_broadcast_dim(fact: DataFrame, dim: DataFrame, on: Column | list[str], how: str = "inner") -> DataFrame:
    """Equi-join with an explicitly broadcast dimension (N2). The hint keeps
    the plan a BroadcastHashJoin even if stats mislead Catalyst; the fact
    side never shuffles."""
    return fact.join(F.broadcast(dim), on, how)


def join_shuffle(left: DataFrame, right: DataFrame, on: Column | list[str], how: str = "inner") -> DataFrame:
    """Fact-fact equi-join (N3): both sides exchange on the key; AQE converts
    to broadcast at runtime if one side turns out small, and splits skewed
    partitions (skewJoin.enabled)."""
    return left.join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on: Column | list[str]) -> DataFrame:
    """EXISTS (N4): left_semi keeps left columns only, stops probing on
    first match — strictly cheaper than inner join + distinct."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column | list[str]) -> DataFrame:
    """NOT EXISTS (N4)."""
    return left.join(right, on, "left_anti")


def distinct_rows(df: DataFrame) -> DataFrame:
    """Distinct (N6) = group-by-all-columns; partial dedup per partition
    before the exchange bounds shuffle volume by distinct count."""
    return df.distinct()


def set_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def set_except(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b).distinct() if False else a.subtract(b)  # subtract == EXCEPT DISTINCT


def rank_window(df: DataFrame, partition: Sequence[str], order: Sequence[Column]) -> Column:
    """Ranking window spec (N7). Partition-local sort after one hash
    exchange; no global sort. Callers attach row_number/rank/lag over it."""
    from pyspark.sql import Window

    return Window.partitionBy(*partition).orderBy(*order)
