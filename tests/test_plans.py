"""Physical-plan property regression tests: the scale-critical plan shapes
(SCALE.md §1) pinned as assertions, so a refactor that silently loses a
pushdown, broadcast, or top-k strategy fails here instead of at 100 TB."""

import pytest

import __spark_entry__ as _entry

QUERIES = _entry.queries()


def plan_of(spark, sf_dir, name, mode: str = "extended") -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_filter_predicates_reach_parquet_scan(spark, sf_dir):
    # "formatted" prints each scan's PushedFilters on its own untruncated
    # line ("extended" elides long attribute lists once exprIds grow)
    plan = plan_of(spark, sf_dir, "q_filter_predicate", "formatted")
    assert "GreaterThan(l_quantity,45.0)" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_tpch_q6_all_predicates_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_tpch_q6", "formatted")
    for pushed in (
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
        "GreaterThanOrEqual(l_shipdate,",
    ):
        assert pushed in plan, f"missing pushed predicate {pushed}"


def test_multiway_join_is_all_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_join_multiway")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan  # dims must never trigger a fact shuffle


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_topk")
    assert "TakeOrderedAndProject" in plan


def test_projection_prunes_scan_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_map_project")
    # ReadSchema must carry only the projected columns, not all 11
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "l_extendedprice" in read[0] and "l_returnflag" not in read[0]


def test_group_agg_has_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_group_agg")
    assert "partial_" in plan  # map-side combine before the exchange


def test_parmap_uses_arrow_not_row_python(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_parmap_ordered")
    assert "ArrowEvalPython" in plan  # vectorized, never BatchEvalPython
    assert "BatchEvalPython" not in plan
