"""Regression tests for the local oracle gate's canonicalizer.

Round-5 postmortem: ``normalize()`` canonicalized via ``df.iterrows()``,
and pandas ``iterrows()`` upcasts each ROW to a common dtype — in an
all-numeric result frame Spark's BIGINT ``15000`` silently became
``15000.0``, so an int-vs-float engine mismatch (the DuckDB HUGEINT cast
bug that made ``q_skew_report`` the round-5 driver's only red) passed the
local gate. These tests seed exactly that mismatch and require the gate
to catch it.
"""

from __future__ import annotations

import importlib.util
import os

import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_check_oracles():
    spec = importlib.util.spec_from_file_location(
        "check_oracles_gate_test", os.path.join(_REPO, "tools", "check_oracles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


normalize = _load_check_oracles().normalize


def test_int_vs_float_mismatch_detected_in_all_numeric_frame():
    # Spark side: BIGINT total_rows. Oracle side: DuckDB HUGEINT fetched as
    # float. Both columns numeric — the historic iterrows() blind spot.
    spark_df = pd.DataFrame({"n_keys": [10], "total_rows": [15000]})
    oracle_df = pd.DataFrame({"n_keys": [10], "total_rows": [15000.0]})
    _, srows = normalize(spark_df)
    _, orows = normalize(oracle_df)
    assert srows != orows, "gate must flag int 15000 vs float 15000.0"
    assert srows == [("10", "15000")]
    assert orows == [("10", "15000.000000")]


def test_per_column_dtypes_preserved_across_mixed_rows():
    # An int column must stay int even when a float column sits beside it
    # (iterrows would have upcast the whole row to float64).
    df = pd.DataFrame({"a": [1, 2], "b": [0.5, 1.5]})
    cols, rows = normalize(df)
    assert cols == ["a", "b"]
    assert rows == [("1", "0.500000"), ("2", "1.500000")]


def test_matching_frames_still_match():
    a = pd.DataFrame({"k": ["x", "y"], "v": [1, 2]})
    b = pd.DataFrame({"v": [2, 1], "k": ["y", "x"]})  # column/row order differs
    assert normalize(a) == normalize(b)


def test_null_nan_and_negative_zero_canon():
    df = pd.DataFrame({"s": [None, "ok"], "f": [float("nan"), -0.0]})
    cols, rows = normalize(df)
    assert cols == ["f", "s"]
    assert sorted(rows) == sorted([("<nan>", "<null>"), ("0.000000", "ok")])


def test_empty_frame():
    df = pd.DataFrame({"a": [], "b": []})
    cols, rows = normalize(df)
    assert cols == ["a", "b"]
    assert rows == []
