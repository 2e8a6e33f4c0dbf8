"""Round-8 Python replays and property pins: HHI/Theil concentration,
McNemar, Brown-Forsythe, OHLC bars, Page-Hinkley, bot forensics,
time-decay attribution, PIT join, session stats, DTW, isotonic PAVA,
log-rank, PSI, kappa, Gopher rules, mojibake, TextRank, embedding
discrimination, IVF nprobe curve."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from simple_stream_processor_spark.registry import QUERIES
import simple_stream_processor_spark.queries_llmdata  # noqa: F401
import simple_stream_processor_spark.queries_relational_ext  # noqa: F401


def _events(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    return load_table(spark, "events", sf_dir).select(
        "event_id", F.unix_millis("ts").alias("ts_ms"), "user_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).collect()


def test_hhi_matches_python_replay(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    ).collect()
    seg_of = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment").collect()
    }
    rev = defaultdict(int)
    for r in orders:
        if r.o_custkey in seg_of:
            rev[(seg_of[r.o_custkey], r.o_custkey)] += r.cents
    by_seg = defaultdict(list)
    for (s, _c), v in rev.items():
        by_seg[s].append(v)
    got = {r.segment: r for r in QUERIES["q_hhi_concentration"](spark, sf_dir).collect()}
    assert set(got) == set(by_seg)
    for s, vals in by_seg.items():
        tot = sum(vals)
        hhi = round(float(sum(v * v for v in vals)) * 10000.0 / (float(tot) * tot), 4)
        assert got[s].n_custs == len(vals)
        assert got[s].total_cents == tot
        assert abs(got[s].hhi - hhi) < 1e-9
        # bounds: uniform floor 10000/n <= HHI <= 10000 (monopoly)
        assert 10000.0 / len(vals) - 1e-6 <= got[s].hhi <= 10000.0 + 1e-6


def test_theil_nonnegative_and_between_row_present(spark, sf_dir):
    rows = QUERIES["q_theil_index"](spark, sf_dir).collect()
    segs = {r.segment for r in rows}
    assert "(between)" in segs and len(segs) >= 2
    for r in rows:
        # Theil T >= 0 up to the picounit quantization of each term
        assert r.theil >= -1e-6


def test_mcnemar_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    days = [r.ts_ms // 86400000 for r in ev]
    mid = (min(days) + max(days)) // 2
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        d = r.ts_ms // 86400000
        key = (r.event_type, r.user_id)
        if d <= mid:
            per[key][0] = 1
        else:
            per[key][1] = 1
    bc = defaultdict(lambda: [0, 0, 0])
    for (et, _u), (x, y) in per.items():
        bc[et][2] += 1
        if x and not y:
            bc[et][0] += 1
        if y and not x:
            bc[et][1] += 1
    got = {r.event_type: r for r in QUERIES["q_mcnemar"](spark, sf_dir).collect()}
    assert set(got) == set(bc)
    for et, (b, c, n) in bc.items():
        assert (got[et].b, got[et].c, got[et].n_users) == (b, c, n)
        if b + c:
            chi = (max(abs(b - c) - 1, 0) ** 2) / (b + c)
            assert abs(got[et].chi2_cc - round(chi, 4)) < 1e-9
        else:
            assert got[et].verdict == "n/a"


def test_ohlc_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    bars = defaultdict(list)
    for r in ev:
        bars[(r.event_type, r.ts_ms // 86400000)].append((r.ts_ms, r.event_id, r.cents))
    got = {(r.event_type, r.day): r for r in QUERIES["q_ohlc_bars"](spark, sf_dir).collect()}
    assert set(got) == set(bars)
    for k, rows in bars.items():
        rows.sort()
        g = got[k]
        assert g.open_cents == rows[0][2] and g.close_cents == rows[-1][2]
        cents = [c for _, _, c in rows]
        assert g.low_cents == min(cents) and g.high_cents == max(cents)
        assert g.n_events == len(rows) and g.total_cents == sum(cents)
        assert g.low_cents <= g.open_cents <= g.high_cents
        assert g.low_cents <= g.close_cents <= g.high_cents


def test_page_hinkley_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts_ms // 86400000] += r.cents
    xs = [daily[d] for d in sorted(daily)]
    dayl = sorted(daily)
    sm, m, minm, best, bday = 0, 0.0, 0.0, 0.0, None
    for t, (d, x) in enumerate(zip(dayl, xs), start=1):
        sm += x
        m = m + x - sm / t
        minm = m if t == 1 else min(minm, m)
        gap = m - minm
        if t == 1 or gap > best:
            if t == 1:
                bday = d
            elif gap > best:
                bday = d
        best = max(best, gap)
    row = QUERIES["q_page_hinkley"](spark, sf_dir).collect()[0]
    assert row.n_days == len(xs)
    assert abs(row.ph_stat - round(m - minm, 4)) < 1e-9
    assert abs(row.max_drift - round(best, 4)) < 1e-9
    assert row.drift_day == bday
    assert row.ph_stat >= 0 and row.max_drift >= row.ph_stat - 1e-9


def test_dtw_leq_lockstep_and_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    prof = {"view": [0] * 24, "purchase": [0] * 24}
    for r in ev:
        if r.event_type in prof:
            prof[r.event_type][(r.ts_ms // 3600000) % 24] += r.cents
    a, b = prof["view"], prof["purchase"]
    INF = 1 << 50
    prev = [0] + [INF] * 24
    for i in range(1, 25):
        cur = [INF]
        for j in range(1, 25):
            cost = abs(a[i - 1] - b[j - 1])
            cur.append(cost + min(prev[j], prev[j - 1], cur[j - 1]))
        prev = cur
    lock = sum(abs(x - y) for x, y in zip(a, b))
    row = QUERIES["q_dtw_distance"](spark, sf_dir).collect()[0]
    assert row.dtw_cost == prev[24]
    assert row.lockstep_cost == lock
    assert row.dtw_cost <= lock  # warping can only help


def test_isotonic_fit_is_monotone_and_pools_correctly(spark, sf_dir):
    rows = sorted(QUERIES["q_isotonic_calibration"](spark, sf_dir).collect(), key=lambda r: r.bin)
    fitted = [r.fitted_rate for r in rows]
    assert all(fitted[i] <= fitted[i + 1] + 1e-9 for i in range(len(fitted) - 1))
    # PAVA replay: pool adjacent violators over (n, pos) bins
    segs = [[r.n, r.pos] for r in rows]
    stack = []
    for n, p in segs:
        stack.append([n, p])
        while len(stack) > 1 and stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]:
            n2, p2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
    expect = []
    for n, p in stack:
        expect.extend([p / n] * 0)  # lengths reconstructed below
    # expand: walk original bins assigning pooled averages
    pooled = []
    it = iter(stack)
    cur_n, cur_p = next(it)
    used = 0
    for n, _p in segs:
        if used == cur_n:
            cur_n, cur_p = next(it)
            used = 0
        pooled.append(cur_p / cur_n)
        used += n
    assert all(abs(f - round(p, 6)) < 1e-6 for f, p in zip(fitted, pooled))


def test_logrank_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    per_user = {}
    for r in sorted(ev, key=lambda r: (r.ts_ms // 86400000, r.event_type)):
        d = r.ts_ms // 86400000
        u = per_user.setdefault(r.user_id, {"d0": d, "dlast": d, "dp": None, "first": r.event_type})
        u["d0"] = min(u["d0"], d)
        u["dlast"] = max(u["dlast"], d)
        if r.event_type == "purchase" and (u["dp"] is None or d < u["dp"]):
            u["dp"] = d
    users = []
    for u in per_user.values():
        g = 1 if u["first"] == "view" else 0
        t = (u["dp"] - u["d0"]) if u["dp"] is not None else (u["dlast"] - u["d0"])
        users.append((g, t, 1 if u["dp"] is not None else 0))
    times = sorted({t for _g, t, _e in users})
    o1 = e1 = vv = 0.0
    for t in times:
        d1 = sum(e for g, tt, e in users if tt == t and g == 1)
        d = sum(e for _g, tt, e in users if tt == t)
        if d == 0:
            continue
        n1 = sum(1 for g, tt, _e in users if tt >= t and g == 1)
        n = sum(1 for _g, tt, _e in users if tt >= t)
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            vv += d * n1 * (n - n1) * (n - d) / (n * n * (n - 1))
    row = QUERIES["q_logrank_test"](spark, sf_dir).collect()[0]
    assert row.observed_g1 == int(o1)
    assert abs(row.expected_g1 - round(e1, 4)) < 1e-6
    if vv > 0:
        assert abs(row.chi2 - round((o1 - e1) ** 2 / vv, 4)) < 1e-6


def test_psi_nonnegative_with_clamped_cells(spark, sf_dir):
    rows = QUERIES["q_psi_drift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # (p-q)ln(p/q) >= 0 per cell, so PSI >= 0 up to display rounding
        assert r.psi >= -1e-9
        assert r.verdict in ("stable", "moderate", "shifted")


def test_kappa_bounds_and_agreement_consistency(spark, sf_dir):
    rows = QUERIES["q_cohens_kappa"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.kappa is not None:
            assert r.kappa <= 1.0 + 1e-9
        assert 0.0 <= r.pct_agree <= 100.0


def test_gopher_rule_counts_consistent(spark, sf_dir):
    rows = QUERIES["q_gopher_rules"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_pass <= r.n_docs
        for f in (r.fail_wordcount, r.fail_wordlen, r.fail_alpha, r.fail_stopwords):
            assert 0 <= f <= r.n_docs
        # a doc failing any rule is not in n_pass
        assert r.n_pass <= r.n_docs - max(
            r.fail_wordcount, r.fail_wordlen, r.fail_alpha, r.fail_stopwords
        ) + 0  # max single-rule failures lower-bounds total failures


def test_mojibake_clean_fixture_is_all_ascii(spark, sf_dir):
    rows = QUERIES["q_mojibake_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.docs_replacement_char == 0
        assert r.docs_control_chars == 0
        assert r.non_ascii_chars == 0
        assert r.ascii_pct == 100.0


def test_textrank_matches_python_replay(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    texts = [r.text for r in load_table(spark, "documents", sf_dir).select("text").collect()]
    adj = set()
    for t in texts:
        ws = [w for w in t.split(" ") if w]
        for x, y in zip(ws, ws[1:]):
            if x != y:
                adj.add((x, y))
    edges = set()
    for x, y in adj:
        edges.add((x, y))
        edges.add((y, x))
    deg = Counter(s for s, _d in edges)
    nodes = sorted(deg)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        nxt = defaultdict(float)
        for s, d in edges:
            nxt[d] += r[s] / deg[s]
        r = {v: round(0.15 / n + 0.85 * nxt[v], 9) for v in nodes}
    top = sorted(((rv, w) for w, rv in r.items()), key=lambda x: (-x[0], x[1]))[:20]
    got = QUERIES["q_textrank_keywords"](spark, sf_dir).collect()
    assert [(g.word, g.degree) for g in got] == [(w, deg[w]) for rv, w in top]
    for g, (rv, _w) in zip(got, top):
        assert abs(g.textrank - rv) < 1e-12


def test_discrimination_margin_consistency(spark, sf_dir):
    rows = QUERIES["q_embedding_discrimination"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-6 <= r.intra_cos <= 1.0 + 1e-6
        if r.best_other_cos is not None:
            assert abs((r.intra_cos - r.best_other_cos) - r.margin) < 2e-6


def test_nprobe_curve_is_monotone(spark, sf_dir):
    rows = sorted(QUERIES["q_ivf_nprobe_curve"](spark, sf_dir).collect(), key=lambda r: r.nprobe)
    assert [r.nprobe for r in rows] == [1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert a.n_candidates <= b.n_candidates
        assert a.recall_at_10 <= b.recall_at_10 + 1e-9
    assert rows[-1].recall_at_10 <= 1.0 + 1e-9


def test_bot_detection_verdicts_partition_users(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    n_users = load_table(spark, "events", sf_dir).select("user_id").distinct().count()
    rows = QUERIES["q_bot_detection"](spark, sf_dir).collect()
    assert sum(r.n_users for r in rows) == n_users
    assert {r.verdict for r in rows} <= {"bot-regular", "bot-rate", "human"}


def test_time_decay_credit_bounded_by_purchases(spark, sf_dir):
    ev = _events(spark, sf_dir)
    n_purch_with_touch = 0
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    for rows in by_user.values():
        purchases = [r for r in rows if r.event_type == "purchase"]
        touches = [r for r in rows if r.event_type != "purchase"]
        for p in purchases:
            if any(t.ts_ms < p.ts_ms and p.ts_ms - t.ts_ms <= 30 * 86400000 for t in touches):
                n_purch_with_touch += 1
    got = QUERIES["q_time_decay_attribution"](spark, sf_dir).collect()
    total_ppm = sum(r.credit_ppm_total for r in got)
    # each credited purchase contributes <= 1e6 ppm (floor division loses
    # at most n_touches ppm per purchase), never more
    assert total_ppm <= n_purch_with_touch * 1_000_000
    assert total_ppm > n_purch_with_touch * 1_000_000 - sum(r.n_touches for r in got)


def test_pit_join_covers_every_purchase_once(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    n_purchases = (
        load_table(spark, "events", sf_dir).where(F.col("event_type") == "purchase").count()
    )
    rows = QUERIES["q_pit_join"](spark, sf_dir).collect()
    assert sum(r.n_purchases for r in rows) == n_purchases  # exactly one interval matches each


def test_session_stats_consistency(spark, sf_dir):
    ev = _events(spark, sf_dir)
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts_ms, r.event_id, r.event_type))
    n_sessions = 0
    for rows in by_user.values():
        rows.sort()
        last = None
        for ts, _eid, _et in rows:
            if last is None or ts - last > 1800000:
                n_sessions += 1
            last = ts
    got = QUERIES["q_session_stats"](spark, sf_dir).collect()
    assert sum(r.n_sessions for r in got) == n_sessions
    for r in got:
        assert 0.0 <= r.bounce_pct <= 100.0 and r.avg_dwell_s >= 0.0


def test_brown_forsythe_scale_invariance_of_f(spark, sf_dir):
    # the statistic is computed from |2x - m2| deviations; verify directly
    # against a python replay of the same doubled-median construction
    ev = _events(spark, sf_dir)
    daily = defaultdict(int)
    for r in ev:
        daily[(r.event_type, r.ts_ms // 86400000)] += r.cents
    groups = defaultdict(list)
    for (et, _d), v in daily.items():
        groups[et].append(v)
    zs = {}
    for et, vals in groups.items():
        sv = sorted(vals)
        n = len(sv)
        m2 = sv[(n - 1) // 2] + sv[n // 2]
        zs[et] = [abs(2 * v - m2) for v in vals]
    k = len(zs)
    n = sum(len(v) for v in zs.values())
    s = sum(sum(v) for v in zs.values())
    q = sum(float(x) * x for et in sorted(zs) for x in zs[et])
    sr = sum(float(sum(v)) ** 2 / len(v) for et, v in sorted(zs.items()))
    ssb = sr - float(s) * s / n
    ssw = q - sr
    if k > 1 and n > k and ssw > 0:
        f = (ssb / (k - 1)) / (ssw / (n - k))
        row = QUERIES["q_brown_forsythe"](spark, sf_dir).collect()[0]
        assert abs(row.f_bf - round(f, 4)) < 1e-6


# ---------------------------------------------------------------------------
# wave 2
# ---------------------------------------------------------------------------


def test_cochran_q_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    days = [r.ts_ms // 86400000 for r in ev]
    dmin, dmax = min(days), max(days)
    per = defaultdict(lambda: [0, 0, 0])
    for r in ev:
        d = r.ts_ms // 86400000
        p = min(2, ((d - dmin) * 3) // (dmax - dmin + 1))
        per[(r.event_type, r.user_id)][p] = 1
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # c0 c1 c2 sum_r2 n
    for (et, _u), xs in per.items():
        a = agg[et]
        for j in range(3):
            a[j] += xs[j]
        a[3] += sum(xs) ** 2
        a[4] += 1
    got = {r.event_type: r for r in QUERIES["q_cochran_q"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for et, (c0, c1, c2, sr2, n) in agg.items():
        s = c0 + c1 + c2
        den = 3 * s - sr2
        assert (got[et].c0, got[et].c1, got[et].c2, got[et].n_users) == (c0, c1, c2, n)
        if den:
            q = 2 * (3 * (c0 * c0 + c1 * c1 + c2 * c2) - s * s) / den
            assert abs(got[et].q_stat - round(q, 4)) < 1e-9
        else:
            assert got[et].verdict == "n/a"


def test_fleiss_kappa_bounds(spark, sf_dir):
    rows = QUERIES["q_fleiss_kappa"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.kappa_fleiss is not None:
            assert r.kappa_fleiss <= 1.0 + 1e-9
        assert 0.0 <= r.pos_rate_pct <= 100.0


def test_price_index_base_month_is_10000(spark, sf_dir):
    rows = {r.month: r for r in QUERIES["q_price_index"](spark, sf_dir).collect()}
    m0 = min(rows)
    # the base month prices against its own basket: exactly 10000 bp
    assert rows[m0].laspeyres_bp == 10000
    assert rows[m0].paasche_bp == 10000
    for r in rows.values():
        assert r.laspeyres_bp > 0 and r.paasche_bp > 0
        # Fisher is the geometric mean of the two
        assert abs(r.fisher_bp - round(math.sqrt(float(r.laspeyres_bp) * r.paasche_bp), 4)) < 1e-9


def test_ndcg_bounds_and_idcg_dominance(spark, sf_dir):
    row = QUERIES["q_ndcg_eval"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.ndcg <= 1.0 + 1e-9
    assert row.dcg <= row.idcg + 1e-9
    assert row.k_eval <= 10


def test_rbo_bounds_and_overlap_consistency(spark, sf_dir):
    row = QUERIES["q_rbo_rankings"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.rbo <= 1.0 + 1e-9
    assert 0 <= row.overlap_at_20 <= 20
    # full agreement at every depth would give rbo == 1; overlap 20 of 20
    if row.overlap_at_20 == 20:
        assert row.rbo <= 1.0 + 1e-9


def test_burrows_delta_symmetric_nonnegative(spark, sf_dir):
    rows = QUERIES["q_burrows_delta"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b  # canonical pair order, no dupes
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert r.delta >= 0.0


def test_hurst_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts_ms // 86400000] += r.cents
    xs = [daily[d] for d in sorted(daily)]
    pts = []
    for m in (8, 16, 32):
        if len(xs) < m:
            continue
        lnrs = []
        for b in range(len(xs) // m):
            blk = xs[b * m:(b + 1) * m]
            mean = sum(blk) / m
            devs = []
            run = 0
            for x in blk:
                run += x
                devs.append(run - (len(devs) + 1) * mean)
            rr = max(devs) - min(devs)
            ss = math.sqrt(sum((x - mean) ** 2 for x in blk) / m)
            if ss > 0:
                lnrs.append(math.log(rr / ss))
        if lnrs:
            pts.append((math.log(m), sum(lnrs) / len(lnrs)))
    rows = QUERIES["q_hurst_exponent"](spark, sf_dir).collect()
    if not pts:
        assert rows == []
        return
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = sxx - sx * sx / n
    row = rows[0]
    assert row.n_scales == n
    if den:
        assert abs(row.hurst - round((sxy - sx * sy / n) / den, 4)) < 1e-6


def test_weibull_fit_reasonable(spark, sf_dir):
    row = QUERIES["q_weibull_fit"](spark, sf_dir).collect()[0]
    assert row.n_points <= row.n_obs
    if row.shape_k is not None:
        assert row.scale_days is None or row.scale_days > 0


def test_croston_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily = defaultdict(int)
    types = set()
    for r in ev:
        daily[(r.event_type, r.ts_ms // 86400000)] += r.cents
        types.add(r.event_type)
    days = [d for (_t, d) in daily]
    dmin, dmax = min(days), max(days)
    got = {r.event_type: r for r in QUERIES["q_croston"](spark, sf_dir).collect()}
    assert set(got) == types
    for et in types:
        z = p = 0.0
        gap, started, nd = 1, False, 0
        for d in range(dmin, dmax + 1):
            q = daily.get((et, d), 0)
            if q > 0:
                z = z + 0.2 * (q - z) if started else float(q)
                p = p + 0.2 * (gap - p) if started else float(gap)
                gap, started = 1, True
                nd += 1
            else:
                gap += 1
        g = got[et]
        assert g.n_days == dmax - dmin + 1
        assert g.n_demand_days == nd
        assert abs(g.smoothed_size - round(z, 4)) < 1e-9
        assert abs(g.smoothed_interval - round(p, 4)) < 1e-9


# ---------------------------------------------------------------------------
# wave 3
# ---------------------------------------------------------------------------


def test_abc_xyz_matrix_partitions_parts(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    n_parts = load_table(spark, "lineitem", sf_dir).select("l_partkey").distinct().count()
    rows = QUERIES["q_abc_xyz_matrix"](spark, sf_dir).collect()
    assert sum(r.n_parts for r in rows) == n_parts
    assert {r.abc_class for r in rows} <= {"A", "B", "C"}
    assert {r.xyz_class for r in rows} <= {"X", "Y", "Z", "n/a"}
    total_pct = sum(r.revenue_pct for r in rows)
    assert abs(total_pct - 100.0) < 0.01


def test_seasonal_mk_consistent_with_plain_mk_inputs(spark, sf_dir):
    row = QUERIES["q_seasonal_mann_kendall"](spark, sf_dir).collect()[0]
    assert row.n_strata <= 7
    assert row.trend in ("increasing", "decreasing", "no_trend")
    # |S| can never exceed the number of within-stratum pairs
    max_pairs = row.n_days * (row.n_days - 1) // 2
    assert abs(row.s_stat) <= max_pairs


def test_code_switch_counts_partition_docs(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    n_docs = load_table(spark, "documents", sf_dir).count()
    rows = QUERIES["q_code_switch_audit"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.n_mixed <= r.n_docs
        assert 0 <= r.n_unidentified <= r.n_docs


def test_token_budget_fill_respects_budget_and_greedy_rule(spark, sf_dir):
    rows = QUERIES["q_token_budget_fill"](spark, sf_dir).collect()
    assert rows
    total = sum(r.tokens_selected for r in rows)
    assert total <= 8000
    share = sum(r.budget_share_pct for r in rows)
    assert abs(share - 100.0) < 0.01


def test_poisson_rate_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily = defaultdict(int)
    for r in ev:
        daily[(r.event_type, r.ts_ms // 86400000)] += 1
    days = [d for (_t, d) in daily]
    dmin, dmax = min(days), max(days)
    mid = (dmin + dmax) // 2
    agg = defaultdict(lambda: [0, 0])
    for (et, d), k in daily.items():
        agg[et][0 if d <= mid else 1] += k
    t1, t2 = mid - dmin + 1, dmax - mid
    got = {r.event_type: r for r in QUERIES["q_poisson_rate_test"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for et, (k1, k2) in agg.items():
        g = got[et]
        assert (g.k1, g.k2, g.t1, g.t2) == (k1, k2, t1, t2)
        if t1 > 0 and t2 > 0 and k1 + k2 > 0:
            z = (k1 / t1 - k2 / t2) / math.sqrt(k1 / (t1 * t1) + k2 / (t2 * t2))
            assert abs(g.z_stat - round(z, 4)) < 1e-9


def test_friedman_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily = defaultdict(int)
    for r in ev:
        daily[(r.event_type, r.ts_ms // 86400000)] += r.cents
    types = sorted({t for (t, _d) in daily})
    k = len(types)
    days = sorted({d for (_t, d) in daily})
    blocks = [d for d in days if all((t, d) in daily for t in types)]
    r2sum = defaultdict(int)
    for d in blocks:
        vals = {t: daily[(t, d)] for t in types}
        for t in types:
            rank2 = sum(2 for u in types if vals[u] < vals[t]) + sum(
                1 for u in types if vals[u] == vals[t]
            ) + 1
            r2sum[t] += rank2
    row = QUERIES["q_friedman_test"](spark, sf_dir).collect()[0]
    assert row.k_treatments == k and row.n_blocks == len(blocks)
    if blocks:
        chi2 = 3.0 * sum(v * v for v in r2sum.values()) / (len(blocks) * k * (k + 1)) - 3.0 * len(blocks) * (k + 1)
        assert abs(row.chi2 - round(chi2, 4)) < 1e-6


def test_keyword_trend_score_is_rate_ratio_monotone(spark, sf_dir):
    rows = sorted(QUERIES["q_keyword_trend"](spark, sf_dir).collect(), key=lambda r: r.rank)
    assert len(rows) <= 20
    scores = [r.trend_ppm for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.c1 >= 0 and r.c2 >= 0 and r.trend_ppm >= 0


def test_bm25_sweep_default_k1_matches_bm25_search_ranking(spark, sf_dir):
    rows = QUERIES["q_bm25_k1_sweep"](spark, sf_dir).collect()
    by_k1 = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.k1_x10, r.rank)):
        by_k1[r.k1_x10].append(r)
    assert set(by_k1) <= {9, 12, 15}
    # the k1 = 1.2 slice must agree with q_bm25_search's top ranking prefix
    search = QUERIES["q_bm25_search"](spark, sf_dir).collect()
    top_search = [r.doc_id for r in search][: len(by_k1.get(12, []))]
    assert [r.doc_id for r in by_k1.get(12, [])] == top_search
    for rs in by_k1.values():
        scores = [r.bm25 for r in rs]
        assert scores == sorted(scores, reverse=True)
