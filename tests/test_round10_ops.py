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


def test_grubbs_matches_python_reference(spark):
    """Replay the G statistic AND the t-quantile critical value
    (A&S 26.2.23 normal quantile + 26.7.5 Cornish-Fisher) in plain
    Python; a constructed series with one gross spike must flag."""
    from simple_stream_processor_spark.queries_relational_ext import grubbs_tail

    xs = [100, 104, 98, 101, 99, 103, 97, 102, 100, 500]  # day 9 is the spike
    n = len(xs)
    s = sum(xs)
    ss = sum(x * x for x in xs)
    sd = math.sqrt((n * ss - s * s) / (n * (n - 1)))
    ads = [abs(n * x - s) for x in xs]
    ad = max(ads)
    suspect = ads.index(ad)
    g = ad / (n * sd)
    q = 0.05 / (2.0 * n)
    sq = math.sqrt(-2.0 * math.log(q))
    z = sq - (
        (2.515517 + 0.802853 * sq + 0.010328 * sq * sq)
        / (1.0 + 1.432788 * sq + 0.189269 * sq * sq + 0.001308 * sq * sq * sq)
    )
    nu = n - 2.0
    t = (
        z
        + (z * z * z + z) / (4.0 * nu)
        + (5.0 * z ** 5 + 16.0 * z ** 3 + 3.0 * z) / (96.0 * nu * nu)
        + (3.0 * z ** 7 + 19.0 * z ** 5 + 17.0 * z ** 3 - 15.0 * z) / (384.0 * nu ** 3)
    )
    crit = ((n - 1.0) / math.sqrt(n)) * math.sqrt((t * t) / (nu + t * t))
    row = grubbs_tail(_daily(spark, xs)).collect()[0]
    assert row["suspect_day"] == suspect
    assert row["g_stat"] == pytest.approx(round(g, 6), abs=1e-9)
    assert row["g_crit"] == pytest.approx(round(crit, 6), abs=1e-9)
    assert row["verdict"] == "outlier"
    # sanity on the quantile machinery itself: for n=10, nu=8 the exact
    # t_{0.0025, 8} is 3.83252; the expansion must land within 1%
    assert abs(t - 3.83252) / 3.83252 < 0.01

    calm = grubbs_tail(_daily(spark, [100, 104, 98, 101, 99, 103, 97, 102])).collect()[0]
    assert calm["verdict"] == "clean"


def test_pacf_matches_python_reference(spark):
    """Replay the exact-integer ACF sums and the unrolled Durbin-Levinson
    recursion; an AR(1)-ish alternating series must close the loop."""
    from simple_stream_processor_spark.queries_relational_ext import pacf_tail

    xs = [120, 95, 130, 88, 141, 90, 135, 92, 128, 85, 138, 94]
    n = len(xs)
    s = sum(xs)
    ss = sum(x * x for x in xs)
    den = n * n * ss - n * s * s

    def r(k):
        p = sum(xs[i] * xs[i - k] for i in range(k, n))
        a = sum(xs[:-k])
        b = sum(xs[k:])
        return (n * n * p - n * s * (a + b) + (n - k) * s * s) / den

    r1, r2, r3 = r(1), r(2), r(3)
    phi11 = r1
    phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    phi21 = phi11 - phi22 * phi11
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (1.0 - phi21 * r1 - phi22 * r2)
    row = pacf_tail(_daily(spark, xs)).collect()[0]
    assert row["pacf1"] == pytest.approx(round(phi11, 6), abs=1e-9)
    assert row["pacf2"] == pytest.approx(round(phi22, 6), abs=1e-9)
    assert row["pacf3"] == pytest.approx(round(phi33, 6), abs=1e-9)
    thr = 1.96 / math.sqrt(n)
    expected_order = 3 if abs(phi33) > thr else 2 if abs(phi22) > thr else 1 if abs(phi11) > thr else 0
    assert row["ar_order"] == expected_order
    # the alternating construction has strong negative lag-1 memory
    assert row["pacf1"] < -0.5


def test_chow_matches_python_reference(spark):
    """Replay the segment/pooled OLS sums and the closed-form F(2, n-4)
    critical value; a constructed slope break must flag 'break' and a
    single clean trend must not."""
    from simple_stream_processor_spark.queries_relational_ext import chow_tail

    # days 0..9: slope +2 around 100; days 10..19: slope +30 around 140;
    # the small alternating jitter keeps every SSR strictly positive
    xs = [100 + 2 * i + (1 if i % 2 else -1) for i in range(10)] + [
        140 + 30 * (i - 10) + (2 if i % 2 else -2) for i in range(10, 20)
    ]

    def ssr(pts):
        m = len(pts)
        sd_ = sum(d for d, _ in pts)
        sc_ = sum(c for _, c in pts)
        sdd = sum(d * d for d, _ in pts)
        sdc = sum(d * c for d, c in pts)
        scc = sum(c * c for _, c in pts)
        sxx = m * sdd - sd_ * sd_
        sxy = m * sdc - sd_ * sc_
        syy = m * scc - sc_ * sc_
        return (sxx * syy - sxy * sxy) / (m * sxx)

    pts = list(enumerate(xs))
    split = (0 + 19) // 2
    seg1 = [p for p in pts if p[0] <= split]
    seg2 = [p for p in pts if p[0] > split]
    n = len(pts)
    ssr_p, ssr1, ssr2 = ssr(pts), ssr(seg1), ssr(seg2)
    f = ((ssr_p - ssr1 - ssr2) / 2.0) / ((ssr1 + ssr2) / (n - 4.0))
    m_ = n - 4.0
    crit = (m_ / 2.0) * (math.exp((-2.0 / m_) * math.log(0.05)) - 1.0)
    row = chow_tail(_daily(spark, xs)).collect()[0]
    assert row["split_day"] == split
    assert row["f_stat"] == pytest.approx(round(f, 6), abs=1e-9)
    assert row["f_crit"] == pytest.approx(round(crit, 6), abs=1e-9)
    assert row["verdict"] == "break"
    # closed-form F(2, m) check against the textbook value F(2, 16) = 3.634
    assert crit == pytest.approx(3.6337, abs=0.001)

    clean = chow_tail(
        _daily(spark, [100 + 3 * i + (1 if i % 2 else -1) for i in range(20)])
    ).collect()[0]
    assert clean["verdict"] == "stable"


def test_chow_tiny_groups_are_na(spark):
    """n = 4 makes the F denominator's df hit zero: Spark's double
    division yields NULL while DuckDB's IEEE division yields inf (and
    f = x/inf = 0.0) — the explicit n < 5 guard must keep both engines
    at NULL/'n/a'.  Same for n = 3 (a degenerate one-point segment)."""
    from simple_stream_processor_spark.queries_relational_ext import chow_tail

    for xs in ([100, 150, 90, 160], [100, 150, 90]):
        row = chow_tail(_daily(spark, xs)).collect()[0]
        assert row["f_stat"] is None
        assert row["verdict"] == "n/a"
