"""Round-9 Python replays and property pins: Jarque-Bera, Cox-Stuart,
Bollinger bands, Durbin-Watson, Cutler's RSI, Jonckheere-Terpstra, VWAP,
newsvendor, promo DiD, Flesch readability, OOV rate, Matryoshka probe."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from pyspark.sql import functions as F

from simple_stream_processor_spark.registry import QUERIES
import simple_stream_processor_spark.queries_llmdata  # noqa: F401
import simple_stream_processor_spark.queries_relational_ext  # noqa: F401


def _daily(spark, sf_dir):
    """(event_type -> [(day, cents)] sorted by day) exact-integer replay."""
    from simple_stream_processor_spark.tables import load_table

    rows = load_table(spark, "events", sf_dir).select(
        F.expr("unix_millis(ts) div 86400000").alias("day"), "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).collect()
    agg = defaultdict(int)
    for r in rows:
        agg[(r.event_type, r.day)] += r.cents
    by_type = defaultdict(list)
    for (et, day), c in sorted(agg.items()):
        by_type[et].append((day, c))
    return by_type


def test_jarque_bera_matches_python_replay(spark, sf_dir):
    by_type = _daily(spark, sf_dir)
    got = {r.event_type: r for r in QUERIES["q_jarque_bera"](spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for et, series in by_type.items():
        xs = [c for _, c in series]
        n = len(xs)
        mean = float(sum(xs)) / n
        s2 = s3 = s4 = 0.0
        for x in xs:  # day-sorted sequential fold, same order as the engines
            d = x - mean
            s2 += d * d
            s3 += (d * d) * d
            s4 += (d * d) * (d * d)
        r = got[et]
        assert r.n_days == n
        if s2 == 0.0:
            assert r.skewness is None and r.verdict == "n/a"
            continue
        m2 = s2 / n
        skew = (s3 / n) / (math.sqrt(m2) * m2)
        kurt = (s4 / n) / (m2 * m2)
        jb = n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
        assert abs(r.skewness - round(skew, 6)) < 1e-9
        assert abs(r.kurtosis - round(kurt, 6)) < 1e-9
        assert abs(r.jb_stat - round(jb, 6)) < 1e-9
        assert r.verdict == ("non-normal" if jb > 5.991 else "normal")


def test_cox_stuart_matches_python_replay(spark, sf_dir):
    by_type = _daily(spark, sf_dir)
    got = {r.event_type: r for r in QUERIES["q_cox_stuart"](spark, sf_dir).collect()}
    for et, series in by_type.items():
        xs = [c for _, c in series]
        n = len(xs)
        shift = (n + 1) // 2
        pairs = [(xs[i], xs[i + shift]) for i in range(n // 2)]
        if not pairs:
            assert et not in got
            continue
        plus = sum(1 for x, y in pairs if y > x)
        minus = sum(1 for x, y in pairs if y < x)
        r = got[et]
        assert (r.n_plus, r.n_minus) == (plus, minus)
        if plus + minus == 0:
            assert r.verdict == "n/a"
        else:
            z = (2 * plus - (plus + minus)) / math.sqrt(plus + minus)
            assert abs(r.z - round(z, 6)) < 1e-9


def test_bollinger_exact_breach_flags(spark, sf_dir):
    by_type = _daily(spark, sf_dir)
    got = {(r.event_type, r.day): r for r in QUERIES["q_bollinger_bands"](spark, sf_dir).collect()}
    n_breach = 0
    for et, series in by_type.items():
        for i, (day, x) in enumerate(series):
            win = [c for _, c in series[max(0, i - 6): i + 1]]
            n, s, ss = len(win), sum(win), sum(c * c for c in win)
            m = n * ss - s * s
            l = n * x - s
            r = got[(et, day)]
            assert r.win_n == n
            assert abs(r.mean_cents - round(s / n, 2)) < 1e-9
            assert abs(r.sd_cents - round(math.sqrt(m) / n, 2)) < 1e-9
            assert r.breach_upper == (l > 0 and l * l > 4 * m)
            assert r.breach_lower == (l < 0 and l * l > 4 * m)
            n_breach += int(r.breach_upper) + int(r.breach_lower)
    # the band flags must fire somewhere on the fixture, else the test is vacuous
    assert n_breach > 0


def test_durbin_watson_matches_python_replay(spark, sf_dir):
    by_type = _daily(spark, sf_dir)
    got = {r.event_type: r for r in QUERIES["q_durbin_watson"](spark, sf_dir).collect()}
    for et, series in by_type.items():
        xs = [c for _, c in series]
        n = len(xs)
        num = sum((xs[i] - xs[i - 1]) ** 2 for i in range(1, n))
        m = n * sum(x * x for x in xs) - sum(xs) ** 2
        r = got[et]
        assert r.n_days == n
        if m == 0 or n < 2:
            assert r.verdict == "n/a"
        else:
            dw = (n * num) / m
            assert abs(r.dw - round(dw, 6)) < 1e-9
            # DW lives in [0, 4]
            assert -1e-9 <= r.dw <= 4.0 + 1e-9


def test_rsi_matches_python_replay(spark, sf_dir):
    by_type = _daily(spark, sf_dir)
    got = {(r.event_type, r.day): r for r in QUERIES["q_rsi_cutler"](spark, sf_dir).collect()}
    for et, series in by_type.items():
        diffs = [(series[i][0], series[i][1] - series[i - 1][1]) for i in range(1, len(series))]
        for i, (day, _) in enumerate(diffs):
            win = [d for _, d in diffs[max(0, i - 6): i + 1]]
            gains = sum(d for d in win if d > 0)
            losses = sum(-d for d in win if d < 0)
            r = got[(et, day)]
            assert (r.gains, r.losses) == (gains, losses)
            if gains + losses == 0:
                assert r.signal == "n/a"
            else:
                rsi = 100.0 * gains / (gains + losses)
                assert abs(r.rsi - round(rsi, 4)) < 1e-9
                assert 0.0 <= r.rsi <= 100.0


def test_jonckheere_matches_python_replay(spark, sf_dir):
    by_type = _daily(spark, sf_dir)
    got = {r.event_type: r for r in QUERIES["q_jonckheere"](spark, sf_dir).collect()}
    for et, series in by_type.items():
        groups = defaultdict(list)
        for day, c in series:
            groups[day // 7].append(c)
        weeks = sorted(groups)
        jt = ties = 0
        for i, w1 in enumerate(weeks):
            for w2 in weeks[i + 1:]:
                for x in groups[w1]:
                    for y in groups[w2]:
                        jt += int(y > x)
                        ties += int(y == x)
        nn = len(series)
        sizes = [len(groups[w]) for w in weeks]
        e = (nn * nn - sum(s * s for s in sizes)) / 4.0
        var = (nn * nn * (2 * nn + 3) - sum(s * s * (2 * s + 3) for s in sizes)) / 72.0
        r = got[et]
        assert (r.jt, r.ties, r.n_groups) == (jt, ties, len(weeks))
        if var == 0:
            assert r.verdict == "n/a"
        else:
            z = (jt + 0.5 * ties - e) / math.sqrt(var)
            assert abs(r.z - round(z, 6)) < 1e-9


def test_vwap_matches_python_replay(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    rows = load_table(spark, "lineitem", sf_dir).select(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("long").alias("ym"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        F.col("l_quantity").cast("long").alias("qty"),
    ).collect()
    pv, qv, nv = defaultdict(int), defaultdict(int), defaultdict(int)
    for r in rows:
        pv[r.ym] += r.pc * r.qty
        qv[r.ym] += r.qty
        nv[r.ym] += 1
    got = {r.ym: r for r in QUERIES["q_vwap"](spark, sf_dir).collect()}
    assert set(got) == set(pv)
    for ym in pv:
        assert got[ym].n_lines == nv[ym] and got[ym].sum_qty == qv[ym]
        assert abs(got[ym].vwap_cents - round(pv[ym] / qv[ym], 4)) < 1e-9


def test_newsvendor_is_ceiling_order_statistic(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    rows = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    ).collect()
    by_flag = defaultdict(list)
    for r in rows:
        by_flag[r.l_returnflag].append(r.qty)
    got = {r.l_returnflag: r for r in QUERIES["q_newsvendor"](spark, sf_dir).collect()}
    assert set(got) == set(by_flag)
    for flag, qs in by_flag.items():
        qs.sort()
        k = (3 * len(qs) + 3) // 4
        r = got[flag]
        assert r.n_lines == len(qs) and r.k_rank == k
        assert r.optimal_qty == qs[k - 1]
        # the critical-fractile property: F(q*) >= 0.75, F(q*-1) < 0.75
        at_or_below = sum(1 for q in qs if q <= r.optimal_qty)
        below = sum(1 for q in qs if q <= r.optimal_qty - 1)
        assert at_or_below * 4 >= 3 * len(qs)
        assert below * 4 < 3 * len(qs)


def test_promo_uplift_matches_python_replay(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    rows = load_table(spark, "lineitem", sf_dir).select(
        F.expr("unix_millis(l_shipdate) div 86400000").alias("day"),
        (F.col("l_discount") >= 0.05).alias("treat"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).collect()
    mid = (min(r.day for r in rows) + max(r.day for r in rows) + 1) // 2
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        cell = cells[(r.treat, r.day >= mid)]
        cell[0] += 1
        cell[1] += r.cents
    got = QUERIES["q_promo_uplift"](spark, sf_dir).collect()[0]
    assert got.n_treat_pre == cells[(True, False)][0]
    assert got.n_ctrl_post == cells[(False, True)][0]
    if all(cells[k][0] for k in [(True, False), (True, True), (False, False), (False, True)]):
        m = {k: v[1] / v[0] for k, v in cells.items()}
        did = (m[(True, True)] - m[(True, False)]) - (m[(False, True)] - m[(False, False)])
        assert abs(got.did_cents - round(did, 4)) < 1e-9
        assert got.verdict == ("positive-uplift" if did > 0 else "no-uplift")


def test_flesch_matches_python_replay(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    docs = load_table(spark, "documents", sf_dir).select("source", "text").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in docs:
        words = [w for w in r.text.split(" ") if w]
        w = len(words)
        s = max(len(re.findall(r"[.!?]", r.text)), 1)
        vg = len(re.findall(r"[aeiouy]+", r.text.lower()))
        syl = max(vg, w)
        a = agg[r.source]
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += syl
    got = {r.source: r for r in QUERIES["q_flesch_reading"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for src, (nd, w, s, syl) in agg.items():
        r = got[src]
        assert (r.n_docs, r.n_words, r.n_sentences, r.n_syllables) == (nd, w, s, syl)
        if w == 0:
            assert r.verdict == "n/a"
        else:
            ease = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
            assert abs(r.flesch_ease - round(ease, 4)) < 1e-9


def test_oov_rate_matches_python_replay(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table
    from collections import Counter

    docs = load_table(spark, "documents", sf_dir).select("source", "text").collect()
    tf = Counter()
    per_source = defaultdict(list)
    for r in docs:
        toks = [w for w in r.text.split(" ") if w]
        tf.update(toks)
        per_source[r.source].extend(toks)
    vocab = {t for t, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]}
    got = {r.source: r for r in QUERIES["q_oov_rate"](spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    for src, toks in per_source.items():
        oov = sum(1 for t in toks if t not in vocab)
        r = got[src]
        assert (r.n_tokens, r.n_oov) == (len(toks), oov)
        if toks:
            assert r.oov_ppm == (1000000 * oov) // len(toks)


def test_matryoshka_matches_python_replay(spark, sf_dir):
    from simple_stream_processor_spark.tables import load_table

    rows = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    vecs = {r.vec_id: r.v for r in rows}
    pv = vecs[0]

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    sims = [
        (vid, cos(v, pv), cos(v[:16], pv[:16]))
        for vid, v in sorted(vecs.items()) if vid != 0
    ]
    top_f = sorted(sims, key=lambda t: (-t[1], t[0]))[:10]
    top_p = sorted(sims, key=lambda t: (-t[2], t[0]))[:10]
    f_ids = {t[0] for t in top_f}
    p_ids = {t[0] for t in top_p}
    got = QUERIES["q_matryoshka"](spark, sf_dir).collect()[0]
    assert got.k_eval == len(top_f)
    assert got.n_overlap == len(f_ids & p_ids)
    if top_f:
        mean_f = sum(c for _, c, _ in sorted(top_f)) / len(top_f)
        assert abs(got.mean_full_cos - round(mean_f, 6)) < 1e-6
        # truncation can only lose information: overlap is at most k
        assert 0 <= got.n_overlap <= got.k_eval


def test_rrf_fusion_matches_python_replay(spark, sf_dir):
    """Full-stack RRF replay: BM25 (k1=1.2, b=0.75, the q_bm25_search
    contract) and brute-force cosine vs probe 0 re-derived in pure
    Python, fused with exact integer 1e9 div (60+rank) — row-for-row
    against the declared query."""
    from simple_stream_processor_spark.tables import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text").collect()
    terms = ("join", "scan", "vector")
    dl, tf = {}, defaultdict(int)
    for r in docs:
        toks = [w for w in r.text.split(" ") if w]
        if toks:
            dl[r.doc_id] = len(toks)
            for w in toks:
                if w in terms:
                    tf[(r.doc_id, w)] += 1
    n = len(dl)
    avgdl = sum(dl.values()) / n
    df = defaultdict(set)
    for (d, w) in tf:
        df[w].add(d)
    score = defaultdict(list)
    for (d, w), c in tf.items():
        idf = math.log((n - len(df[w]) + 0.5) / (len(df[w]) + 0.5) + 1.0)
        score[d].append((w, idf * (c * 2.2) / (c + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))))
    bm25 = {}
    for d, parts in score.items():
        acc = 0.0
        for _, s in sorted(parts):  # term-sorted fold from 0.0 (engine contract)
            acc += s
        bm25[d] = acc
    lex_cut = sorted(bm25, key=lambda d: (-bm25[d], d))[:20]
    lex_rank = {
        d: i + 1
        for i, d in enumerate(sorted(lex_cut, key=lambda d: (-round(bm25[d], 6), d)))
    }

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    pv = vecs[0]
    pnorm = math.sqrt(sum(x * x for x in pv))
    cos = {
        v: sum(a * b for a, b in zip(vec, pv)) / (math.sqrt(sum(a * a for a in vec)) * pnorm)
        for v, vec in vecs.items()
        if v != 0
    }
    sem_cut = sorted(cos, key=lambda v: (-cos[v], v))[:20]
    sem_rank = {
        v: i + 1
        for i, v in enumerate(sorted(sem_cut, key=lambda v: (-round(cos[v], 6), v)))
    }

    fused = {}
    for d in set(lex_rank) | set(sem_rank):
        fused[d] = (1_000_000_000 // (60 + lex_rank[d]) if d in lex_rank else 0) + (
            1_000_000_000 // (60 + sem_rank[d]) if d in sem_rank else 0
        )
    expect = [
        (d, lex_rank.get(d), sem_rank.get(d), fused[d])
        for d in sorted(fused, key=lambda d: (-fused[d], d))[:20]
    ]
    got = [
        (r.doc_id, r.lex_rank, r.sem_rank, r.rrf_ppb)
        for r in QUERIES["q_rrf_fusion"](spark, sf_dir).collect()
    ]
    assert got == expect


def test_streaming_rrf_sentinel_survives_negative_doc_id(spark, sf_dir, tmp_path):
    """Pin for the review's sentinel-collision finding: a document with
    doc_id = -1 (the old magic sentinel value) must behave as a normal
    document — counted in the corpus totals, rankable as a hit — because
    the state key is (key, is_corp), not a magic id. Full Spark-vs-DuckDB
    parity on the mutated corpus."""
    import os
    import shutil

    import duckdb
    import pandas as pd

    import tools.check_oracles as co
    import simple_stream_processor_spark.queries_streaming  # noqa: F401  (registers the twin)
    from simple_stream_processor_spark.registry import ORACLES

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = str(tmp_path)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        shutil.copy(os.path.join(src, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    docs = pd.read_parquet(os.path.join(d, "documents.parquet"))
    # give the first doc the sentinel-colliding id and force a query-term hit
    docs.loc[docs.index[0], "doc_id"] = -1
    docs.loc[docs.index[0], "text"] = "join scan vector join"
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)

    sdf = QUERIES["q_streaming_rrf"](spark, d).toPandas()
    con = duckdb.connect()
    try:
        for t in ("documents", "embeddings"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
        odf = con.execute(ORACLES["q_rrf_fusion"]).fetchdf()
    finally:
        con.close()
    scols, srows = co.normalize(sdf)
    ocols, orows = co.normalize(odf)
    assert scols == ocols and srows == orows
    # the -1 doc actually participated (4 query-term tokens => a hit);
    # normalize() stringifies cells, so match the canonical form
    assert any("-1" in r for r in srows), "doc_id=-1 should rank as a hit"
