"""Property-based tests (Hypothesis): operator equivalence against
brute-force references on randomized inputs. The reference repo has no
property tests (SURVEY §5); these guard the operators whose correctness
argument is an equivalence ("salted == plain", "bucketed == naive",
"carry-forward == per-row max") rather than a golden value."""

import bisect

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from simple_stream_processor_spark.operators import dedup, relational, windows

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    rows=st.lists(st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=0, max_size=60),
    salt_n=st.integers(1, 6),
)
@settings(**SETTINGS)
def test_salted_join_equivalence(spark, rows, salt_n):
    fact = spark.createDataFrame(rows or [(None, None)], "k int, v int").where(F.col("k").isNotNull())
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(6)], "k int, name string")
    salted = sorted((r.k, r.v, r.name) for r in relational.salted_join(fact, dim, "k", salt_n).collect())
    plain = sorted((r.k, r.v, r.name) for r in fact.join(dim, "k").collect())
    assert salted == plain


@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=30),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 99)), min_size=0, max_size=30),
)
@settings(**SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right):
    # the operator gets the RAW right side, duplicates and all; only the
    # brute-force reference dedups to max-per-(key, ts) — this property IS
    # the operator's determinism contract for duplicate right rows
    rdedup = {}
    for k, ts, v in right:
        rdedup[(k, ts)] = max(rdedup.get((k, ts), v), v)
    l_df = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "lid long, k int, ts long"
    )
    r_df = spark.createDataFrame(
        right or [(None, None, None)],
        "k int, ts long, val int",
    ).where(F.col("k").isNotNull())
    got = {
        r.lid: r.asof_val
        for r in relational.asof_join(l_df, r_df, on="k", ts="ts", value_col="val", out_col="asof_val").collect()
    }
    by_key = {}
    for (k, ts), v in rdedup.items():
        by_key.setdefault(k, []).append((ts, v))
    for lst in by_key.values():
        lst.sort()
    for i, (k, ts) in enumerate(left):
        cands = [(t, v) for t, v in by_key.get(k, []) if t <= ts]
        expect = max(cands)[1] if cands else None  # greatest ts <= left ts
        assert got[i] == expect, (i, k, ts, got[i], expect)


@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 3000)), min_size=1, max_size=25),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 3000)), min_size=0, max_size=25),
    range_s=st.sampled_from([60, 600]),
)
@settings(**SETTINGS)
def test_range_join_bucketed_matches_naive(spark, left, right, range_s):
    l_df = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "lid long, k int, ts_s long"
    ).select("lid", "k", F.timestamp_seconds(F.col("ts_s")).alias("ts"))
    r_df = spark.createDataFrame(
        [(j, k, ts) for j, (k, ts) in enumerate(right)] or [(None, None, None)], "rid long, k int, ts_s long"
    ).where(F.col("k").isNotNull()).select("rid", "k", F.timestamp_seconds(F.col("ts_s")).alias("ts"))
    j = relational.range_join_bucketed(l_df, r_df, on="k", ts="ts", range_s=range_s)
    got = sorted(
        (r["l.lid"] if "l.lid" in r else r.lid, r.rid)
        for r in j.select(F.col("l.lid").alias("lid"), F.col("r.rid").alias("rid")).collect()
        if r.rid is not None
    )
    expect = sorted(
        (i, jdx)
        for i, (lk, lts) in enumerate(left)
        for jdx, (rk, rts) in enumerate(right)
        if lk == rk and lts < rts <= lts + range_s
    )
    assert got == expect


@given(n=st.integers(1, 40), size=st.integers(1, 7))
@settings(**SETTINGS)
def test_count_window_chunks(spark, n, size):
    df = spark.range(1, n + 1).select(F.col("id").alias("value"))
    out = windows.count_window(df, "value", size).groupBy("window_no").agg(
        F.count(F.lit(1)).alias("c"), F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    rows = sorted((r.window_no, r.c, r.lo, r.hi) for r in out.collect())
    expect = []
    for w in range((n + size - 1) // size):
        lo, hi = w * size + 1, min((w + 1) * size, n)
        expect.append((w, hi - lo + 1, lo, hi))
    assert rows == expect


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(2, 3),
)
@settings(**SETTINGS)
def test_word_shingles_match_python(spark, texts, k):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        r.doc_id: sorted(r.sh)
        for r in df.select("doc_id", dedup.word_shingles(F.col("text"), k).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")  # includes empty tokens, same as F.split
        expect = sorted({" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}) if len(toks) >= k else []
        assert got[i] == expect, (i, t, got[i], expect)


@given(
    events=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 50), st.integers(0, 2)),
        min_size=0,
        max_size=80,
    ),
)
@settings(**SETTINGS)
def test_funnel_matches_bruteforce(spark, events):
    """funnel == per-user brute-force stage walk: t_i is the first ts of
    stage i strictly after t_{i-1} (None once the funnel breaks)."""
    stages = ["s0", "s1", "s2"]
    rows = [(u, ts, stages[k]) for u, ts, k in events]
    if not rows:
        return
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {
        r.user_id: (r.t_s0, r.t_s1, r.t_s2)
        for r in relational.funnel(df, stages).collect()
    }
    expected = {}
    for u in {r[0] for r in rows}:
        mine = sorted((ts, s) for uu, ts, s in rows if uu == u)
        prev, out = None, []
        for s in stages:
            cand = [ts for ts, ss in mine if ss == s and (prev is None or ts > prev)] if (
                prev is not None or s == stages[0]
            ) else []
            t = min(cand) if cand and (s == stages[0] or prev is not None) else None
            out.append(t)
            prev = t
        expected[u] = tuple(out)
    assert got == expected


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    ),
)
@settings(**SETTINGS)
def test_cohort_retention_matches_bruteforce(spark, events):
    """cohort_retention == brute-force: cohort by first-event week,
    distinct actives per (cohort, offset)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)  # a Monday
    rows = [(u, base + datetime.timedelta(days=d)) for u, d in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_ms, r.week_offset): r.active_users
        for r in relational.cohort_retention(df).collect()
    }
    def week(dt):
        monday = dt.date() - datetime.timedelta(days=dt.weekday())
        return datetime.datetime.combine(monday, datetime.time())
    first = {}
    for u, ts in rows:
        w = week(ts)
        if u not in first or w < first[u]:
            first[u] = w
    expected = {}
    for u, ts in rows:
        cw = first[u]
        off = (week(ts) - cw).days // 7
        key = (int(cw.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000), off)
        expected.setdefault(key, set()).add(u)
    assert got == {k: len(v) for k, v in expected.items()}


@given(xy=st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_zorder_value_matches_python_interleave(spark, xy):
    """zorder_value == reference Python bit interleave (x even bits,
    y odd bits)."""
    from simple_stream_processor_spark.storage import zorder_value

    df = spark.createDataFrame(xy, "x long, y long")
    got = [r.z for r in df.select(zorder_value(F.col("x"), F.col("y")).alias("z")).collect()]

    def interleave(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == [interleave(x, y) for x, y in xy]


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50_000), st.integers(0, 20_000)),  # (start_ms, dur_ms)
        min_size=1,
        max_size=40,
    ),
    bucket_s=st.integers(1, 20),
)
@settings(**SETTINGS)
def test_sweep_concurrency_matches_bruteforce(spark, rows, bucket_s):
    """Two-level prefix sum == textbook global running sum, for any tie
    pattern and any bucket width (including buckets holding one boundary
    and buckets holding all of them)."""
    from pyspark.sql.types import StructType, StructField, LongType, TimestampType
    import datetime

    data = [
        (i, datetime.datetime.utcfromtimestamp(start / 1000.0), start, dur)
        for i, (start, dur) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        [(i, ts, dur) for i, ts, start, dur in data], "iid long, ts timestamp, dur_ms long"
    )
    got = {
        (r.t_ms, r.delta, r.iid): r.concurrency
        for r in windows.sweep_concurrency(df, "ts", F.col("dur_ms"), "iid", bucket_s=bucket_s).collect()
    }
    bounds = sorted(
        [(start, 1, i) for i, _, start, dur in data] + [(start + dur, -1, i) for i, _, start, dur in data]
    )
    running, want = 0, {}
    for t, delta, i in bounds:
        running += delta
        want[(t, delta, i)] = running
    assert got == want


@given(
    perm=st.permutations(range(12)),
    gaps=st.booleans(),
    n=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_watermark_cadence_dense_and_fallback_agree(spark, perm, gaps, n):
    """The arithmetic (dense-key) block path and the rank fallback must
    implement the same cadence: blocks of N in order-key order, watermark =
    running max of completed blocks. With gaps forced into the key space the
    operator takes the fallback path; both must match the brute force."""
    ids = [i * 3 + 1 for i in perm] if gaps else list(perm)
    rows = [(iid, float(((iid * 7) % 13) + 1)) for iid in ids]
    df = spark.createDataFrame(rows, "arrival long, ts double").select(
        "arrival", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        r.arrival: (r.block, r.wm_ms, r.is_late)
        for r in windows.watermark_cadence(df, "arrival", "ts", n).collect()
    }
    want = {}
    ordered = sorted(rows)
    wm = None
    block_max = {}
    for rank, (iid, ts) in enumerate(ordered):
        block = rank // n
        wm_in_force = max((m for b, m in block_max.items() if b < block), default=None)
        ts_ms = int(ts * 1000)
        want[iid] = (block, wm_in_force, wm_in_force is not None and ts_ms < wm_in_force)
        block_max[block] = max(block_max.get(block, 0), ts_ms)
    assert out == want


@given(
    vecs=st.lists(
        st.tuples(st.integers(0, 2), st.lists(st.integers(-5, 5), min_size=8, max_size=8)),
        min_size=2,
        max_size=12,
    ),
)
@settings(**SETTINGS)
def test_pq_assignment_matches_bruteforce(spark, vecs):
    """PQ code assignment == numpy brute force: per-label subspace
    codebooks (means rounded to 6dp), argmin by squared distance with
    label tie-break, for random small vector sets."""
    rows = [(i, lbl, [float(x) for x in v]) for i, (lbl, v) in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")
    m, w = 2, 4

    subs = df.select(
        "vec_id",
        "label",
        F.explode(
            F.array(*[F.struct(F.lit(s).alias("s"), F.slice("v", s * w + 1, w).alias("sv")) for s in range(m)])
        ).alias("t"),
    ).select("vec_id", "label", F.col("t.s").alias("s"), F.col("t.sv").alias("sv"))
    ex = subs.select("label", "s", F.posexplode("sv").alias("pos", "x"))
    cbl = ex.groupBy("label", "s", "pos").agg(F.round(F.avg("x"), 6).alias("c"))
    cb = (
        cbl.groupBy("label", "s")
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda t: t["c"]).alias("cv"))
        .select(F.col("label").alias("cb_label"), "s", "cv")
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v_: acc + v_)

    d2 = dot(F.col("sv"), F.col("sv")) - F.lit(2.0) * dot(F.col("sv"), F.col("cv")) + dot(F.col("cv"), F.col("cv"))
    from pyspark.sql import Window as W

    rw = W.partitionBy("vec_id", "s").orderBy(F.col("d2").asc(), F.col("cb_label").asc())
    got = {
        (r.vec_id, r.s): r.cb_label
        for r in subs.join(F.broadcast(cb), "s")
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") == 1)
        .collect()
    }

    # numpy brute force with the same rounding + tie-break
    import numpy as np

    labels = sorted({lbl for _, lbl, _ in rows})
    books = {}
    for s in range(m):
        for lbl in labels:
            members = np.array([v[s * w : (s + 1) * w] for _, l2, v in rows if l2 == lbl])
            books[(lbl, s)] = np.round(members.mean(axis=0), 6)
    for i, _, v in rows:
        for s in range(m):
            sv = np.array(v[s * w : (s + 1) * w])
            best = min(labels, key=lambda lbl: (float(((sv - books[(lbl, s)]) ** 2).sum()), lbl))
            assert got[(i, s)] == best, (i, s, got[(i, s)], best)


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=24), min_size=1, max_size=8
    ),
    rounds=st.integers(1, 4),
)
@settings(**SETTINGS)
def test_bpe_merges_match_python_reference(spark, texts, rounds):
    """Distributed BPE == textbook single-node trainer on arbitrary tiny
    corpora: same merges, same order, same counts (greedy left-to-right,
    (count desc, pair asc) tie-break)."""
    from collections import Counter

    from simple_stream_processor_spark.operators import text as T

    words = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) for w in words}
    expected = []
    for r in range(1, rounds + 1):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        (l, rgt), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((r, l, rgt, l + rgt, cnt))
        for w, syms in vocab.items():
            merged = []
            for s in syms:
                if merged and merged[-1] == l and s == rgt:
                    merged[-1] = l + rgt
                else:
                    merged.append(s)
            vocab[w] = merged

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["round"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in T.bpe_merges(df, rounds=rounds).collect()
    ]
    assert got == expected


def test_cms_never_underestimates(spark, sf_dir):
    """Count-min guarantee: est >= true for EVERY token (not just the
    probed top-10) — checked by probing all tokens at sf0.001."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                     FROM read_parquet('{sf_dir}/documents.parquet')),
        exact AS (SELECT token, count(*) AS true_n FROM tok GROUP BY 1),
        tb AS (SELECT (('0x' || substr(md5(token), 1 + 8 * i, 8))::BIGINT) % 1024 AS bucket, i
               FROM tok, (SELECT unnest([0, 1, 2, 3]) AS i)),
        cms AS (SELECT i, bucket, count(*) AS cnt FROM tb GROUP BY 1, 2),
        probe AS (SELECT e.token, e.true_n, i,
                         (('0x' || substr(md5(e.token), 1 + 8 * i, 8))::BIGINT) % 1024 AS bucket
                  FROM exact e, (SELECT unnest([0, 1, 2, 3]) AS i))
        SELECT p.token, p.true_n, min(c.cnt) AS est
        FROM probe p JOIN cms c ON p.i = c.i AND p.bucket = c.bucket
        GROUP BY 1, 2
        """
    ).fetchall()
    assert rows, "corpus produced no tokens"
    for token, true_n, est in rows:
        assert est >= true_n, (token, true_n, est)


def test_entity_match_complete_within_blocks(spark, sf_dir):
    """Every same-block distinct-name pair within the edit-distance
    threshold appears exactly once (a < b), with the right distance —
    brute-forced in Python over the distinct names."""
    import itertools
    import re

    import duckdb

    from simple_stream_processor_spark.registry import QUERIES
    import simple_stream_processor_spark.queries_relational_ext  # noqa: F401

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    names = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT DISTINCT p_name FROM read_parquet('{sf_dir}/part.parquet')")
        .fetchall()
    ]
    blocks = {}
    for n in names:
        m = re.search(r"([a-z]+)$", n)
        blocks.setdefault(m.group(1) if m else "", []).append(n)
    expected = set()
    for block, ns in blocks.items():
        for a, b in itertools.combinations(sorted(ns), 2):
            d = lev(a, b)
            if d <= 4:
                expected.add((a, b, block, d))
    got = {
        (r["name_a"], r["name_b"], r["block"], r["dist"])
        for r in QUERIES["q_entity_match"](spark, sf_dir).collect()
    }
    assert got == expected


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 5),        # user_id
            st.integers(0, 29),       # day offset from 2024-01-01
            st.sampled_from(["view", "purchase", "error", "click"]),
            st.integers(0, 500),      # value in whole units
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_merge_upsert_matches_dict_replay(spark, events):
    """MERGE semantics == a per-key dict replay: base is the pre-cut
    latest per key, the change batch is the post-cut latest per key
    ('error' = tombstone), and the surviving rows carry the right
    status labels."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    cut_day = 16
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d, seconds=i),
            u,
            t,
            float(v),
        )
        for i, (u, d, t, v) in enumerate(events)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    cut = datetime.datetime(2024, 1, cut_day)

    base, upd = {}, {}
    for eid, ts, u, t, v in rows:
        side = base if ts < cut else upd
        if u not in side or (ts, eid) > (side[u][0], side[u][1]):
            side[u] = (ts, eid, t, v)
    expected = {}
    for u, (ts, eid, t, v) in base.items():
        expected[u] = (v, "unchanged")
    for u, (ts, eid, t, v) in upd.items():
        if t == "error":
            expected.pop(u, None)
        else:
            expected[u] = (v, "updated" if u in base else "inserted")

    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )

    def latest(side):
        return (
            side.select("user_id", "value", "ts", "event_type", rn.alias("rn"))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    cut_lit = F.lit(cut.strftime("%Y-%m-%d")).cast("timestamp")
    b = latest(ev.where(F.col("ts") < cut_lit)).alias("b")
    u = (
        latest(ev.where(F.col("ts") >= cut_lit))
        .select(
            "user_id",
            "value",
            F.when(F.col("event_type") == "error", F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
        )
        .alias("u")
    )
    got = {
        r.user_id: (r.value, r.status)
        for r in (
            b.join(u, F.col("b.user_id") == F.col("u.user_id"), "full_outer")
            .where(F.col("u.op").isNull() | (F.col("u.op") != "delete"))
            .select(
                F.coalesce(F.col("u.user_id"), F.col("b.user_id")).alias("user_id"),
                F.coalesce(F.col("u.value"), F.col("b.value")).alias("value"),
                F.when(F.col("u.user_id").isNull(), F.lit("unchanged"))
                .when(F.col("b.user_id").isNull(), F.lit("inserted"))
                .otherwise(F.lit("updated"))
                .alias("status"),
            )
            .collect()
        )
    }
    assert got == {u_: (v, s) for u_, (v, s) in expected.items()}


@given(payload=st.binary(min_size=0, max_size=200))
@settings(**SETTINGS)
def test_binary_codecs_never_raise_on_fuzz(spark, payload):
    """The netpbm and WAV parsers must classify arbitrary bytes as
    malformed (decode_ok falsy) rather than raise — one bad blob must
    not fail a 100 TB scan. Valid-prefix mutations are covered by the
    codec goldens; this pins the no-throw contract on random input."""
    from simple_stream_processor_spark.operators.multimodal import (
        _parse_bmp,
        _parse_netpbm,
        _parse_png,
        _parse_ppm_p6_raw,
        _parse_wav,
    )

    out = _parse_netpbm(payload)
    assert isinstance(out, tuple)
    raw = _parse_ppm_p6_raw(payload)
    assert raw is None or len(raw) == 5
    wav = _parse_wav(payload)
    assert isinstance(wav, tuple)
    assert isinstance(_parse_bmp(payload), tuple)
    assert isinstance(_parse_png(payload), tuple)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 5)),  # (label, score bucket)
        min_size=2,
        max_size=30,
    ).filter(lambda r: any(l for l, _ in r) and any(1 - l for l, _ in r))
)
@settings(**SETTINGS)
def test_auc_two_level_matches_bruteforce(spark, rows):
    """The two-level-prefix-sum AUC must equal the O(n^2) pairwise
    definition (P(score_pos > score_neg) + 0.5 P(=)) including ties."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    pos_scores = [s for l, s in rows if l == 1]
    neg_scores = [s for l, s in rows if l == 0]
    wins = sum(1 for p in pos_scores for n in neg_scores if p > n)
    ties = sum(1 for p in pos_scores for n in neg_scores if p == n)
    expected = (wins + 0.5 * ties) / (len(pos_scores) * len(neg_scores))

    df = spark.createDataFrame(rows, "pos int, score int")
    g = (
        df.groupBy("score")
        .agg(
            F.sum("pos").cast("long").alias("n_pos_s"),
            (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("n_neg_s"),
        )
        .withColumn("bucket", (F.col("score") / 2).cast("long"))
    )
    offsets = (
        g.groupBy("bucket")
        .agg(F.sum("n_neg_s").alias("bn"))
        .select(
            "bucket",
            F.coalesce(
                F.sum("bn").over(
                    Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("offset"),
        )
    )
    intra = (
        Window.partitionBy("bucket")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.join(F.broadcast(offsets), "bucket").select(
        "n_pos_s",
        "n_neg_s",
        (F.col("offset") + F.coalesce(F.sum("n_neg_s").over(intra), F.lit(0)))
        .cast("long")
        .alias("neg_below"),
    )
    row = (
        c.agg(
            F.sum("n_pos_s").alias("np"),
            F.sum("n_neg_s").alias("nn"),
            F.sum(F.col("n_pos_s") * (2 * F.col("neg_below") + F.col("n_neg_s"))).alias("numer2"),
        )
        .select((F.col("numer2") * 1.0 / (2 * F.col("np") * F.col("nn"))).alias("auc"))
        .collect()[0]
    )
    assert abs(row.auc - expected) < 1e-12


def test_pagerank_matches_python_power_iteration(spark):
    """operators/relational.py:pagerank equals a pure-Python power
    iteration with the identical per-round 9dp rounding on a small
    irregular graph — guards the share-broadcast/dst-aggregate plumbing
    and the teleport arithmetic."""
    from simple_stream_processor_spark.operators import relational

    und = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (1, 5)]
    directed = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(directed, "src long, dst long")
    got = {r.node: r.r for r in relational.pagerank(edges, rounds=3).collect()}

    out = {}
    for a, b in directed:
        out.setdefault(a, set()).add(b)
    nodes = sorted(out)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        new = {}
        for v in nodes:
            contrib = sum(r[u] / len(out[u]) for u in nodes if v in out[u])
            new[v] = round(0.15 / n + 0.85 * contrib, 9)
        r = new
    assert got == r

    # rank mass is conserved (no dangling nodes): sum ~ 1 up to rounding
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pca_matches_numpy_eigendecomposition(spark, sf_dir):
    """The 3-round power-iteration eigenvalue is a Rayleigh quotient: it
    must not exceed numpy's top eigenvalue of the same (rounded) covariance
    and should be close to it; the loading vector is unit-norm."""
    import numpy as np

    from simple_stream_processor_spark.queries_llmdata import q_pca_top_component
    from simple_stream_processor_spark.tables import load_table

    rows = q_pca_top_component(spark, sf_dir).collect()
    v = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    est = rows[0].eigval
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4

    X = np.array(load_table(spark, "embeddings", sf_dir).select("embedding").toPandas()["embedding"].tolist(), dtype=np.float64)
    C = np.round(np.cov(X, rowvar=False, ddof=1), 6)
    l1 = float(np.linalg.eigvalsh(C)[-1])
    assert est <= l1 + 1e-3
    assert est >= 0.75 * l1  # 3 rounds from a uniform start get close to the top


def test_triangle_count_matches_bruteforce(spark):
    """Degree-ordered orientation counts each triangle exactly once —
    verified against a brute-force itertools count on a small irregular
    graph (includes a 4-clique = 4 triangles, plus a pendant)."""
    import itertools

    from pyspark.sql import functions as SF

    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (1, 6)]
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(
        1
        for x, y, z in itertools.combinations(sorted(adj), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )

    e = spark.createDataFrame(und, "x long, y long")
    deg = (
        e.select(SF.col("x").alias("node"))
        .unionAll(e.select(SF.col("y").alias("node")))
        .groupBy("node")
        .agg(SF.count(SF.lit(1)).alias("d"))
    )
    dx = deg.select(SF.col("node").alias("nx"), SF.col("d").alias("dxv"))
    dy = deg.select(SF.col("node").alias("ny"), SF.col("d").alias("dyv"))
    lower = (SF.col("dxv") < SF.col("dyv")) | ((SF.col("dxv") == SF.col("dyv")) & (SF.col("x") < SF.col("y")))
    o = (
        e.join(dx, SF.col("x") == SF.col("nx"))
        .join(dy, SF.col("y") == SF.col("ny"))
        .select(
            SF.when(lower, SF.col("x")).otherwise(SF.col("y")).alias("u"),
            SF.when(lower, SF.col("y")).otherwise(SF.col("x")).alias("v"),
            SF.when(lower, SF.col("dyv")).otherwise(SF.col("dxv")).alias("dv"),
        )
    )
    e1 = o.select(SF.col("u").alias("u1"), SF.col("v").alias("v1"), SF.col("dv").alias("dv1"))
    e2 = o.select(SF.col("u").alias("u2"), SF.col("v").alias("v2"), SF.col("dv").alias("dv2"))
    fl = (SF.col("dv1") < SF.col("dv2")) | ((SF.col("dv1") == SF.col("dv2")) & (SF.col("v1") < SF.col("v2")))
    wedge = (
        e1.join(e2, (SF.col("u1") == SF.col("u2")) & (SF.col("v1") < SF.col("v2")))
        .select(
            SF.when(fl, SF.col("v1")).otherwise(SF.col("v2")).alias("w1"),
            SF.when(fl, SF.col("v2")).otherwise(SF.col("v1")).alias("w2"),
        )
    )
    o3 = o.select(SF.col("u").alias("u3"), SF.col("v").alias("v3"))
    got = wedge.join(o3, (SF.col("w1") == SF.col("u3")) & (SF.col("w2") == SF.col("v3"))).count()
    assert got == want == 4  # the 4-clique contributes C(4,3) triangles


def test_cusum_changepoint_localizes_planted_shift(spark):
    """A series flat at 100 then flat at 200 must put the max-|CUSUM| day
    exactly at the end of the first regime."""
    import datetime

    from pyspark.sql import functions as SF
    from simple_stream_processor_spark.queries_relational_ext import q_changepoint_cusum  # noqa: F401

    rows = [
        (i, datetime.datetime(2024, 1, 1 + i, 12, 0), 1, "a", 100.0 if i < 10 else 200.0, "{}")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = q_changepoint_cusum(spark, d).collect()
    assert len(out) == 1
    assert out[0].cp_day == "2024-01-10"  # last day of the 100-regime (i=9)


def test_survival_curve_matches_manual_km(spark):
    """KM estimator on a hand-built cohort: 4 users churn at known
    lifetimes, 2 censored at the horizon — survival values equal the
    textbook product computed by hand."""
    import datetime

    from simple_stream_processor_spark.queries_relational_ext import q_survival_curve

    base = datetime.datetime(2024, 1, 1, 12, 0)

    def ev(eid, uid, day):
        return (eid, base + datetime.timedelta(days=day), uid, "view", 1.0, "{}")

    rows = [
        # u1: days 0-1 (churn, lifetime 1); u2: days 0-2 (churn, lt 2)
        ev(1, 1, 0), ev(2, 1, 1),
        ev(3, 2, 0), ev(4, 2, 2),
        # u3, u4: churn at lifetime 5
        ev(5, 3, 0), ev(6, 3, 5),
        ev(7, 4, 0), ev(8, 4, 5),
        # u5, u6: active through day 10 (the horizon) -> censored, lt 10
        ev(9, 5, 0), ev(10, 5, 10),
        ev(11, 6, 0), ev(12, 6, 10),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import os, tempfile
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r.day: r for r in q_survival_curve(spark, d).collect()}
    # risk sets: day1: 6 at risk, 1 churns -> S=5/6; day2: 5 at risk, 1 churns
    # -> S=5/6*4/5; day5: 4 at risk, 2 churn -> S=...*2/4; day10: censored only
    assert got[1].n_risk == 6 and got[1].n_churned == 1
    assert abs(got[1].survival - round(5 / 6, 6)) < 1e-9
    assert abs(got[2].survival - round(5 / 6 * 4 / 5, 6)) < 1e-9
    assert abs(got[5].survival - round(5 / 6 * 4 / 5 * 2 / 4, 6)) < 1e-9
    assert got[10].n_censored == 2 and got[10].n_churned == 0
    assert abs(got[10].survival - got[5].survival) < 1e-9  # censoring alone doesn't drop S


@given(
    und=st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    ),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_densest_peel_matches_python_replay(spark, und):
    """The distributed Charikar peel equals a pure-Python replay of the
    identical rule (remove node iff deg·n < Σdeg, exact integers) on a
    random small graph — per-round node/edge counts match exactly."""
    from simple_stream_processor_spark.queries_relational_ext import densest_peel_rounds

    edges = sorted({(min(a, b), max(a, b)) for a, b in und})

    expect = []
    cur = set(edges)
    for r in range(3):
        deg = {}
        for x, y in cur:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        n, sd = len(deg), sum(deg.values())
        expect.append((r, n, sd // 2))
        if r == 2:
            break
        keep = {v for v, d in deg.items() if d * n >= sd}
        cur = {(x, y) for x, y in cur if x in keep and y in keep}

    e = spark.createDataFrame(edges, "x long, y long")
    got = sorted(
        (r.round, r.n_nodes, r.n_edges)
        for r in densest_peel_rounds(e, 3).collect()
    )
    assert got == sorted(expect)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 60), st.integers(0, 9)),
        min_size=0,
        max_size=30,
    ),
    bucket_days=st.integers(4, 20),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_interval_overlap_join_matches_naive(spark, rows, bucket_days):
    """Grid-bucketed interval-overlap join equals the naive O(n²) pairing
    for any interval set and any bucket width (intervals may span many
    buckets; the later-first-bucket rule must still emit each pair
    exactly once)."""
    import datetime

    from simple_stream_processor_spark.operators.relational import interval_overlap_join

    base = datetime.date(2024, 1, 1)
    iv = [
        (i, k, base + datetime.timedelta(days=s), base + datetime.timedelta(days=s + ln))
        for i, (k, s, ln) in enumerate(rows)
    ]
    want = sorted(
        (a[0], b[0])
        for a in iv
        for b in iv
        if a[1] == b[1] and a[2] <= b[3] and b[2] <= a[3] and a[0] != b[0]
    )

    df = spark.createDataFrame(iv or [(None, None, None, None)], "id long, k long, s date, e date").where(
        F.col("id").isNotNull()
    )
    got = sorted(
        (r["l"]["id"], r["r"]["id"])
        for r in interval_overlap_join(df, df, on="k", start="s", end="e", bucket_days=bucket_days)
        .where(F.col("l.id") != F.col("r.id"))
        .collect()
    )
    assert got == want


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=30).map(lambda ws: " ".join(ws)),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(2, 4),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_dup_span_coverage_matches_python_replay(spark, texts, n):
    """Per-source dup-span totals equal a pure-Python replay: find grams
    occurring in ≥2 docs, mark covered positions as an explicit set
    union (the ground truth the lead() interval math must reproduce,
    including overlapping and repeated grams)."""
    from collections import Counter

    from simple_stream_processor_spark.operators.dedup import dup_span_coverage

    docs = [(i, f"s{i % 2}", t) for i, t in enumerate(texts)]
    gram_docs = {}
    toks = {i: t.split(" ") for i, _, t in docs}
    for i, _, _t in docs:
        w = toks[i]
        for p in range(len(w) - n + 1):
            gram_docs.setdefault(tuple(w[p : p + n]), set()).add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    expect = Counter()
    for i, src, _t in docs:
        w = toks[i]
        covered = set()
        for p in range(len(w) - n + 1):
            if tuple(w[p : p + n]) in dup:
                covered.update(range(p, p + n))
        expect[src] += len(covered)

    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {r.source: r.dup_tokens for r in dup_span_coverage(df, n=n).collect()}
    for src in got:
        assert got[src] == expect[src], (src, got[src], expect[src])


@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 8)), min_size=0, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 8)), min_size=0, max_size=15),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_interval_overlap_join_two_tables_matches_naive(spark, left, right):
    """Same exactly-once guarantee when the two sides are DIFFERENT
    tables (the later-first-bin rule is symmetric in the sides)."""
    import datetime

    from simple_stream_processor_spark.operators.relational import interval_overlap_join

    base = datetime.date(2024, 1, 1)

    def mk(rows, off):
        return [
            (off + i, k, base + datetime.timedelta(days=s), base + datetime.timedelta(days=s + ln))
            for i, (k, s, ln) in enumerate(rows)
        ]

    li, ri = mk(left, 0), mk(right, 1000)
    want = sorted(
        (a[0], b[0]) for a in li for b in ri if a[1] == b[1] and a[2] <= b[3] and b[2] <= a[3]
    )
    schema = "id long, k long, s date, e date"
    ldf = spark.createDataFrame(li or [(None,) * 4], schema).where(F.col("id").isNotNull())
    rdf = spark.createDataFrame(ri or [(None,) * 4], schema).where(F.col("id").isNotNull())
    got = sorted(
        (r["l"]["id"], r["r"]["id"])
        for r in interval_overlap_join(ldf, rdf, on="k", start="s", end="e", bucket_days=6).collect()
    )
    assert got == want


@given(
    vecs=st.lists(
        st.lists(st.integers(-5, 5), min_size=4, max_size=4),
        min_size=3,
        max_size=16,
    ),
    labels=st.data(),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_semantic_dedup_keep_rule_matches_bruteforce(spark, vecs, labels):
    """semantic_dedup's prune/keep decisions == brute force: given the
    operator's OWN cluster assignment, a vector must be pruned iff a
    smaller-id same-cluster vector has cosine >= tau, with dup_of the
    smallest such id — validates the pair-join and keep rule
    independently of the Lloyd clustering (whose parity the SQL oracle
    already pins)."""
    import math

    from simple_stream_processor_spark.operators.similarity import semantic_dedup

    rows = []
    for i, v in enumerate(vecs):
        vv = [float(x) for x in v]
        if all(x == 0 for x in vv):
            vv[0] = 1.0  # zero-norm vectors are outside the embedding contract
        rows.append((i, vv, labels.draw(st.integers(0, 2), label=f"label{i}")))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    tau = 0.9
    out = {r.vec_id: r for r in semantic_dedup(df, rounds=2, tau=tau).collect()}
    assert set(out) == {i for i, _, _ in rows}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    by_id = {i: v for i, v, _ in rows}
    for i, r in out.items():
        same_cluster = [j for j in out if out[j].cluster == r.cluster and j < i]
        dups = sorted(j for j in same_cluster if cos(by_id[i], by_id[j]) >= tau - 1e-9)
        near = [j for j in same_cluster if abs(cos(by_id[i], by_id[j]) - tau) < 1e-9]
        if near:
            continue  # frontier within float tolerance of tau — either verdict is consistent
        if dups:
            assert not r.kept and r.dup_of == dups[0], (i, r, dups)
        else:
            assert r.kept and r.dup_of is None, (i, r)


@given(
    docs=st.lists(
        st.tuples(
            st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]), min_size=1, max_size=12),
            st.sampled_from(["src0", "src1", "src2"]),
        ),
        min_size=2,
        max_size=20,
    ),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_dsir_scores_match_python_reference(spark, docs):
    """q_dsir_select's scores == a pure-Python DSIR reference: identical
    md5 bucketing, add-one smoothing from exact integer counts, and the
    sorted-bucket fold — validates the whole importance-ratio pipeline
    against an implementation that shares no code with the Spark path."""
    import hashlib
    import math

    from simple_stream_processor_spark.queries_llmdata import dsir_tail, dsir_tokens

    B = 4096
    rows = [(i, " ".join(toks), "xx", src, len(" ".join(toks))) for i, (toks, src) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    tok = dsir_tokens(df)
    counts = tok.groupBy((F.col("source") == "src0").alias("is_target"), "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    got = {r.doc_id: r for r in dsir_tail(counts, tok.where(F.col("source") != "src0")).collect()}

    def bucket(w):
        return int(hashlib.md5(f"dsir:{w}".encode()).hexdigest()[:8], 16) % B

    tcnt, scnt = {}, {}
    tt = ts = 0
    per_doc = {}
    for i, (toks, src) in enumerate(docs):
        if src == "src0":
            for w in toks:
                tcnt[bucket(w)] = tcnt.get(bucket(w), 0) + 1
                tt += 1
        else:
            d = per_doc.setdefault(i, {})
            for w in toks:
                b = bucket(w)
                d[b] = d.get(b, 0) + 1
                scnt[b] = scnt.get(b, 0) + 1
                ts += 1
    expect = {}
    for i, d in per_doc.items():
        score = 0.0
        for b in sorted(d):
            lr = math.log(((tcnt.get(b, 0) + 1) * (ts + B)) / float((scnt[b] + 1) * (tt + B)))
            score += d[b] * lr
        expect[i] = (sum(d.values()), round(score, 6))
    top = sorted(expect.items(), key=lambda kv: (-kv[1][1], kv[0]))[:100]
    assert set(got) == {i for i, _ in top}
    for i, (n_tokens, score) in top:
        assert got[i].n_tokens == n_tokens, (i, got[i], n_tokens)
        assert abs(got[i].dsir_score - score) < 1e-6, (i, got[i].dsir_score, score)
