"""Focused parity tests for the round-10 session-2 internal rewrites
(the round rule: an optimization that changes an operator's internals
gets a focused test):

* q_equidepth_hist — boundary ranks now resolve via a collected coarse
  histogram + driver cumsum + bucket-filtered distinct counts. The
  fixtures never place a boundary rank on the LAST distinct value of a
  coarse 65536-cent bucket (v_hi in the NEXT bucket), never run a
  single-value domain, and never run n=1 — these frames do, with full
  Spark-vs-DuckDB oracle parity (the driver's compare).
* q_k_core — round 1 now aggregates the raw edge table (identity
  membership joins removed) and an empty core skips the induced-edge
  count. The empty-graph frame (no basket carries two parts twice) hits
  the zero path end-to-end; the small-graph frame hits the join path.
* _copurchase_pairs — the pair emit moved from a nested higher-order
  transform to chained generators; the small-graph frame pins the pair
  set through three consumers (market basket, pagerank, triangles).
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from test_oracle_fuzz import _SF0001, _TABLES, _check_parity, _write_table

if not os.path.isdir(_SF0001):
    pytest.skip(f"fixture dir {_SF0001} missing", allow_module_level=True)


def _mk_lineitem(rows):
    """rows: (orderkey, partkey, extendedprice)."""
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": pd.array([o for o, _, _ in rows], dtype="int64"),
            "l_partkey": pd.array([p for _, p, _ in rows], dtype="int64"),
            "l_suppkey": pd.array([1 + i % 5 for i in range(n)], dtype="int64"),
            "l_linenumber": pd.array([1 + i % 7 for i in range(n)], dtype="int32"),
            "l_quantity": [float(1 + i % 50) for i in range(n)],
            "l_extendedprice": [float(x) for _, _, x in rows],
            "l_discount": [0.01 * (i % 10) for i in range(n)],
            "l_tax": [0.01 * (i % 8) for i in range(n)],
            "l_returnflag": [("A", "N", "R")[i % 3] for i in range(n)],
            "l_linestatus": [("O", "F")[i % 2] for i in range(n)],
            "l_shipdate": pd.to_datetime([1_700_000_000_000 + 86_400_000 * (i % 90) for i in range(n)], unit="ms"),
        }
    )


def _materialize_lineitem(tmpdir: str, li: pd.DataFrame) -> str:
    for t in _TABLES:
        if t != "lineitem":
            shutil.copy(os.path.join(_SF0001, f"{t}.parquet"), os.path.join(tmpdir, f"{t}.parquet"))
    _write_table(tmpdir, "lineitem", li)
    return tmpdir


# 65536 cents = $655.36 — the coarse radix bucket edge the rewrite indexes by.
_EDGE = 655.36

LINEITEM_SHAPES = {
    # n=1: every boundary rank collapses to the single value (frac paths
    # with lo == hi == 1, and rank 2 is skipped as past-the-end)
    "single_row": _mk_lineitem([(1, 1, 123.45)]),
    # one distinct value: all 15 boundaries equal it; every row lands in
    # bucket 0 (cents > bound is false at the boundary)
    "all_equal": _mk_lineitem([(1 + i // 4, 1 + i % 4, 99.99) for i in range(12)]),
    # 32 distinct cents straddling the 65536-cent edge: with n=32 the i=8
    # boundary sits at ranks (16, 17) — the LAST value of coarse bucket 0
    # and the FIRST of bucket 1, so v_lo and v_hi resolve in DIFFERENT
    # coarse buckets (the cross-bucket grid-row path)
    "bucket_straddle": _mk_lineitem(
        [(1 + i, 1 + i, round(_EDGE - 0.16 + 0.01 * i, 2)) for i in range(32)]
    ),
    # 17 rows with duplicate values: multiplicity-weighted ranks (c > 1 in
    # the in-bucket prefix sums)
    "dup_values": _mk_lineitem(
        [(1 + i % 5, 1 + i % 3, 10.00 + (i % 4)) for i in range(17)]
    ),
}

EQUIDEPTH_POOL = ["q_equidepth_hist", "q_bisect_median", "q_weighted_median", "q_histogram"]


@pytest.mark.parametrize("shape", sorted(LINEITEM_SHAPES))
def test_equidepth_radix_degenerate_parity(spark, tmp_path_factory, shape):
    tmpdir = str(tmp_path_factory.mktemp(f"li_{shape}"))
    _materialize_lineitem(tmpdir, LINEITEM_SHAPES[shape])
    _check_parity(spark, tmpdir, EQUIDEPTH_POOL)


def test_k_core_empty_graph_and_pair_emit_parity(spark, tmp_path_factory):
    # every order carries ONE part: the co-purchase pair set is EMPTY, the
    # w>=2 graph doubly so — k-core must return n_core=0/core_edges=0 via
    # the shortcut, converged, without touching the edge join
    tmpdir = str(tmp_path_factory.mktemp("li_empty_graph"))
    _materialize_lineitem(tmpdir, _mk_lineitem([(i, i, 50.0 + i) for i in range(1, 9)]))
    _check_parity(spark, tmpdir, ["q_k_core"])


def test_small_graph_pair_emit_parity(spark, tmp_path_factory):
    # two overlapping baskets + one repeated pair: exercises the chained
    # generator pair emit (x < y, weight rollup) through three consumers
    tmpdir = str(tmp_path_factory.mktemp("li_small_graph"))
    li = _mk_lineitem(
        [(1, 1, 10.0), (1, 2, 11.0), (1, 3, 12.0),
         (2, 2, 13.0), (2, 3, 14.0), (2, 4, 15.0),
         (3, 2, 16.0), (3, 3, 17.0)]
    )
    _materialize_lineitem(tmpdir, li)
    _check_parity(spark, tmpdir, ["q_market_basket", "q_pagerank", "q_triangle_count", "q_k_core"])
