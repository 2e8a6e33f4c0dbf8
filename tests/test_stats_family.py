"""Round-7 stats-family replays: each operator's output re-derived in plain
Python (O(n²) loops, textbook formulas) from the same daily rollup — the
engine must match the obviously-correct implementation, not just DuckDB."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from simple_stream_processor_spark.registry import QUERIES
import simple_stream_processor_spark.queries_relational_ext  # noqa: F401
import simple_stream_processor_spark.queries_streaming  # noqa: F401


@pytest.fixture(scope="module")
def daily(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    rows = (
        ev.groupBy("event_type", F.expr("unix_millis(ts) div 86400000").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        .collect()
    )
    return [(r.event_type, r.day, r.cents) for r in rows]


def test_kendall_tau_matches_pairwise_replay(spark, sf_dir, daily):
    x = {d: c for t, d, c in daily if t == "view"}
    y = {d: c for t, d, c in daily if t == "purchase"}
    days = sorted(set(x) & set(y))
    pairs = [(x[d], y[d]) for d in days]
    nc = nd = 0
    for i in range(len(pairs)):
        for j in range(i + 1, len(pairs)):
            p = (pairs[i][0] - pairs[j][0]) * (pairs[i][1] - pairs[j][1])
            nc += p > 0
            nd += p < 0
    n0 = len(pairs) * (len(pairs) - 1) // 2
    from collections import Counter

    n1 = sum(t * (t - 1) // 2 for t in Counter(v for v, _ in pairs).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(v for _, v in pairs).values())
    tau = (nc - nd) / math.sqrt((n0 - n1) * (n0 - n2))
    got = QUERIES["q_kendall_tau"](spark, sf_dir).collect()[0]
    assert (got.n_days, got.n_concordant, got.n_discordant) == (len(pairs), nc, nd)
    assert got.tau_b == pytest.approx(round(tau, 6), abs=1e-6)


def test_pettitt_matches_cumsum_replay(spark, sf_dir, daily):
    got = {r.event_type: r for r in QUERIES["q_pettitt_changepoint"](spark, sf_dir).collect()}
    by_type: dict = {}
    for t, d, c in daily:
        by_type.setdefault(t, []).append((d, c))
    for t, series in by_type.items():
        series.sort()
        n = len(series)
        if n < 2:
            assert t not in got
            continue
        xs = [c for _, c in series]
        best_k, best_day = -1, None
        for ti in range(n):  # U_t after position ti (1-based t = ti+1)
            u = sum(
                (xs[i] > xs[j]) - (xs[i] < xs[j])
                for i in range(ti + 1)
                for j in range(ti + 1, n)
            )
            if abs(u) > best_k:
                best_k, best_day = abs(u), series[ti][0]
        # the engine includes the degenerate U_n = 0 row; K >= 0 either way
        r = got[t]
        assert r.n_days == n
        assert r.k_stat == best_k
        assert r.change_day == best_day
        p = min(1.0, 2.0 * math.exp(-6.0 * best_k * best_k / (n**3 + n**2)))
        assert r.p_approx == pytest.approx(round(p, 6), abs=1e-6)


def _midranks(values):
    """value -> doubled midrank (2*rank_min + t - 1)."""
    from collections import Counter

    cnt = Counter(values)
    out, below = {}, 0
    for v in sorted(cnt):
        out[v] = 2 * (below + 1) + cnt[v] - 1
        below += cnt[v]
    return out


def test_kruskal_matches_rank_replay(spark, sf_dir, daily):
    xs = [c for _, _, c in daily]
    rk2 = _midranks(xs)
    groups: dict = {}
    for t, _, c in daily:
        groups.setdefault(t, []).append(rk2[c])
    n = len(xs)
    srr = sum(sum(g) ** 2 / len(g) for _, g in sorted(groups.items()))
    h = 3.0 * srr / (n * (n + 1)) - 3.0 * (n + 1)
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(xs).values())
    c = 1.0 - tie / (n**3 - n)
    got = QUERIES["q_kruskal_wallis"](spark, sf_dir).collect()[0]
    assert (got.k_groups, got.n_days) == (len(groups), n)
    assert got.h_stat == pytest.approx(round(h, 4), abs=2e-4)
    assert got.h_corrected == pytest.approx(round(h / c, 4), abs=2e-4)
    crit = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070, 6: 12.592}.get(len(groups) - 1, 14.067)
    assert got.groups_differ == ("true" if h / c > crit else "false")


def test_anova_matches_moment_replay(spark, sf_dir, daily):
    groups: dict = {}
    for t, _, c in daily:
        groups.setdefault(t, []).append(c)
    n = sum(len(g) for g in groups.values())
    s = sum(sum(g) for g in groups.values())
    q = sum(v * v for g in groups.values() for v in g)
    sr = sum(sum(g) ** 2 / len(g) for _, g in sorted(groups.items()))
    ssb, ssw, sst = sr - s * s / n, q - sr, q - s * s / n
    k = len(groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = QUERIES["q_anova"](spark, sf_dir).collect()[0]
    assert (got.k_groups, got.n_days) == (k, n)
    assert got.f_stat == pytest.approx(round(f, 4), rel=1e-3)
    assert got.eta_sq == pytest.approx(round(ssb / sst, 6), abs=2e-6)


def test_cramers_v_matches_contingency_replay(spark, sf_dir):
    from collections import Counter

    from simple_stream_processor_spark.tables import load_table

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", F.hour("ts").alias("hr")
    ).collect()
    cells = Counter((r.event_type, r.hr) for r in ev)
    row = Counter()
    col = Counter()
    for (t, h), c in cells.items():
        row[t] += c
        col[h] += c
    n = sum(cells.values())
    chi2 = sum(
        (c - row[t] * col[h] / n) ** 2 / (row[t] * col[h] / n)
        for (t, h), c in cells.items()
    )
    v = math.sqrt(chi2 / (n * min(len(row) - 1, len(col) - 1)))
    got = QUERIES["q_cramers_v"](spark, sf_dir).collect()[0]
    assert (got.n_rows, got.n_cols, got.n_events) == (len(row), len(col), n)
    assert got.chi2 == pytest.approx(round(chi2, 4), rel=1e-6)
    assert got.cramers_v == pytest.approx(round(v, 6), abs=2e-6)


def test_tukey_fences_match_quartile_replay(spark, sf_dir, daily):
    got = {r.event_type: r for r in QUERIES["q_tukey_fences"](spark, sf_dir).collect()}
    by_type: dict = {}
    for t, d, c in daily:
        by_type.setdefault(t, []).append(c)
    for t, xs in by_type.items():
        xs.sort()
        n = len(xs)

        def quartile_x4(p_num):  # p = p_num/4 of (n-1)
            idx, rem = divmod(p_num * (n - 1), 4)
            lo = xs[idx]
            hi = xs[min(idx + 1, n - 1)]
            return 4 * lo + rem * (hi - lo)

        q1x4, q3x4 = quartile_x4(1), quartile_x4(3)
        lo8, hi8 = 2 * q1x4 - 3 * (q3x4 - q1x4), 2 * q3x4 + 3 * (q3x4 - q1x4)
        r = got[t]
        assert r.n_days == n
        assert r.q1 == pytest.approx(q1x4 / 4.0, abs=1e-9)
        assert r.q3 == pytest.approx(q3x4 / 4.0, abs=1e-9)
        assert r.n_low == sum(8 * x < lo8 for x in xs)
        assert r.n_high == sum(8 * x > hi8 for x in xs)


def test_streaming_twins_match_batch(spark, sf_dir):
    for b, s in [
        ("q_kendall_tau", "q_streaming_kendall"),
        ("q_kruskal_wallis", "q_streaming_kruskal"),
        ("q_anova", "q_streaming_anova"),
        ("q_cramers_v", "q_streaming_cramers"),
        ("q_pettitt_changepoint", "q_streaming_pettitt"),
        ("q_tukey_fences", "q_streaming_tukey"),
    ]:
        bb = sorted(map(tuple, QUERIES[b](spark, sf_dir).collect()))
        ss = sorted(map(tuple, QUERIES[s](spark, sf_dir).collect()))
        assert bb == ss, f"{s} != {b}"
