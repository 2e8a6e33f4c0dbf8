"""External anchors for the round-10 operators: independent plain-Python
replays of each statistic, so a transcription error mirrored into the
DuckDB oracle cannot hide behind the parity gate (the class the round-10
review caught in the first CvM cut: both engines agreed on a value n·m
smaller than the Anderson-1962 criterion its 0.461 threshold refers to).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_cvm_report_hand_computed(spark):
    """Worked example: A = {bins 1,2}, B = {bins 3,4}, one doc each.
    Pooled ECDFs give gaps [.5, 1, .5, 0], Σ cn·gap² = 1.5,
    T = (n·m/N²)·1.5 = (4/16)·1.5 = 0.375 — and a fully disjoint 5-vs-5
    split must cross the 0.461 critical value ('drift' is reachable)."""
    from simple_stream_processor_spark.queries_llmdata import cvm_report

    cnt = spark.createDataFrame(
        [("A", 1, 1), ("A", 2, 1), ("B", 3, 1), ("B", 4, 1)],
        "source string, b long, n long",
    )
    rows = {r["source"]: r for r in cvm_report(cnt).collect()}
    assert rows["A"]["cvm_t"] == pytest.approx(0.375, abs=1e-9)
    assert rows["B"]["cvm_t"] == pytest.approx(0.375, abs=1e-9)
    assert rows["A"]["verdict"] == "stable"

    disjoint = spark.createDataFrame(
        [("A", 1, 5), ("B", 2, 5)], "source string, b long, n long"
    )
    rows = {r["source"]: r for r in cvm_report(disjoint).collect()}
    # bin1: gap 1 with pooled weight 5 -> T = (25/100)*5 = 1.25
    assert rows["A"]["cvm_t"] == pytest.approx(1.25, abs=1e-9)
    assert rows["A"]["verdict"] == "drift"


def _daily(spark, series):
    return spark.createDataFrame(
        [("t", d, c) for d, c in enumerate(series)],
        "event_type string, day long, cents long",
    )


def test_macd_matches_python_reference(spark):
    from simple_stream_processor_spark.queries_relational_ext import macd_tail

    xs = [100.0, 140.0, 90.0, 200.0, 180.0, 160.0, 220.0, 130.0]
    a12, a26, a9 = 2.0 / 13.0, 2.0 / 27.0, 0.2
    e12 = e26 = xs[0]
    sig = 0.0
    for x in xs[1:]:
        e12 = a12 * x + (1 - a12) * e12
        e26 = a26 * x + (1 - a26) * e26
        sig = a9 * (e12 - e26) + (1 - a9) * sig
    row = macd_tail(_daily(spark, [int(x) for x in xs])).collect()[0]
    assert row["macd"] == pytest.approx(round(e12 - e26, 4), abs=1e-9)
    assert row["signal"] == pytest.approx(round(sig, 4), abs=1e-9)
    assert row["histogram"] == pytest.approx(round((e12 - e26) - sig, 4), abs=1e-9)


def test_theta_matches_python_reference(spark):
    from simple_stream_processor_spark.queries_relational_ext import theta_tail

    xs = [120.0, 90.0, 150.0, 170.0, 130.0, 210.0]
    n = len(xs)
    sx = sum(xs)
    st = n * (n + 1) // 2
    st2 = n * (n + 1) * (2 * n + 1) // 6
    stx = sum((i + 1) * x for i, x in enumerate(xs))
    b = (n * stx - st * sx) / (n * st2 - st * st)
    a = (sx - b * st) / n
    z = [2 * x - (a + b * (i + 1)) for i, x in enumerate(xs)]
    l = z[0]
    for v in z[1:]:
        l = 0.3 * v + 0.7 * l
    fc = 0.5 * (l + (a + b * (n + 1)))
    row = theta_tail(_daily(spark, [int(x) for x in xs])).collect()[0]
    assert row["trend_slope"] == pytest.approx(round(b, 6), abs=1e-9)
    assert row["theta2_ses"] == pytest.approx(round(l, 4), abs=1e-9)
    assert row["forecast_next"] == pytest.approx(round(fc, 4), abs=1e-9)


def _phi(z: float) -> float:
    x = abs(z) / math.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t
    erf = 1.0 - poly * math.exp(-(x * x))
    phi = 0.5 * (1.0 + math.copysign(1.0, z) * erf) if z != 0 else 0.5
    return max(1e-10, min(1.0 - 1e-10, phi))


def test_anderson_darling_matches_python_reference(spark):
    from simple_stream_processor_spark.queries_relational_ext import anderson_tail

    xs = [105, 98, 120, 87, 140, 110, 95, 133, 102, 117]
    n = len(xs)
    mean = sum(xs) / n
    sd = math.sqrt((n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1)))
    zs = sorted((x - mean) / sd for x in xs)
    big_s = sum(
        (2 * (i + 1) - 1) * math.log(_phi(z)) + (2 * (n - i) - 1) * math.log(_phi(-z))
        for i, z in enumerate(zs)
    )
    a2 = -n - big_s / n
    a2_star = a2 * (1 + 0.75 / n + 2.25 / (n * n))
    row = anderson_tail(_daily(spark, xs)).collect()[0]
    assert row["a2"] == pytest.approx(round(a2, 6), abs=1e-6)
    assert row["a2_star"] == pytest.approx(round(a2_star, 6), abs=1e-6)


def test_adamic_adar_matches_python_reference(spark, sf_dir):
    """Replay the wedge/score pipeline in plain Python over the same
    edge set and compare the full top-20."""
    from simple_stream_processor_spark.queries_relational_ext import (
        _repeat_copurchase_edges,
    )
    from simple_stream_processor_spark.registry import QUERIES

    edges = {(r["x"], r["y"]) for r in _repeat_copurchase_edges(spark, sf_dir).collect()}
    adj: dict = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    scores: dict = {}
    for mid, nbrs in adj.items():
        term = round(1e12 / math.log(len(nbrs)))
        for u in nbrs:
            for v in nbrs:
                if u < v:
                    cn, aa = scores.get((u, v), (0, 0))
                    scores[(u, v)] = (cn + 1, aa + term)
    cand = [
        (u, v, cn, aa) for (u, v), (cn, aa) in scores.items() if (u, v) not in edges
    ]
    cand.sort(key=lambda r: (-r[3], r[0], r[1]))
    expected = [
        (u, v, cn, round(aa / 1e12, 9)) for u, v, cn, aa in cand[:20]
    ]
    got = [
        (r["part_a"], r["part_b"], r["common_neighbors"], r["aa_score"])
        for r in QUERIES["q_adamic_adar"](spark, sf_dir).collect()
    ]
    assert got == expected
