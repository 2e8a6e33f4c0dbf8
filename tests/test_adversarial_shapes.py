"""Deterministic degenerate-shape parity sweep (round-7; the r6 judge's
division-sweep task generalized): handcrafted worst-case events/documents
tables — all values zero, every doc empty, single-language corpus, no
conversions, constant series — run through the division-sensitive declared
queries with full Spark-vs-DuckDB parity checks.

Random fuzz (test_oracle_fuzz.py) explores these shapes with low
probability; this hits them every run.  Round-7 finds, all fixed with
``F.try_divide`` (DuckDB's /0 -> NULL already matched): q_lift_table
(zero responders), q_period_over_period (zero-revenue prior week),
q_dedup_savings (all-empty corpus), q_classifier_report (pe=1 kappa),
q_auc_eval (single-class corpus), q_ks_drift / q_wasserstein_drift
(single-source corpus — empty rest), plus the r6-judge pair
q_mann_whitney (n=1) and q_block_maxima (sd=0).

Set SPARK_GRAFT_ADVERSARIAL=full to sweep the ENTIRE fuzz pools
(~115 queries x 10 shapes, ~13 min); default covers the sensitive set.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

# round 11: degenerate-shape parity sweeps over the whole registry — slow tier (driver runs -m 'not slow'; the gate runs both)
pytestmark = pytest.mark.slow

from test_oracle_fuzz import (
    EVENT_QUERIES,
    DOC_QUERIES,
    EVENT_TYPES,
    WORDS,
    _EPOCH_2024,
    _check_parity,
    _materialize,
)

_EPOCH_MS = _EPOCH_2024 * 1000
_DAY = 86_400_000


def _mk_events(rows):
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": pd.array(range(n), dtype="int64"),
            "ts": pd.to_datetime([_EPOCH_MS + ms for ms, *_ in rows], unit="ms"),
            "user_id": pd.array([u for _, u, *_ in rows], dtype="int64"),
            "event_type": [t for _, _, t, _ in rows],
            "value": [float(v) for *_, v in rows],
            "props": [json.dumps({"k": i % 100}) for i in range(n)],
        }
    )


def _mk_docs(texts, langs=None, srcs=None):
    n = len(texts)
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(n), dtype="int64"),
            "text": texts,
            "lang": langs or ["en"] * n,
            "source": srcs or [f"src{i % 5}" for i in range(n)],
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )


_BASE_EVENTS = _mk_events(
    [((i * 3777) % (5 * _DAY), 1 + i % 6, EVENT_TYPES[i % 5], round(0.07 * i, 2)) for i in range(20)]
)
_BASE_DOCS = _mk_docs(
    [" ".join(WORDS[(i + j) % len(WORDS)] for j in range(1 + i % 9)) for i in range(10)],
    langs=["en", "de", "zh", "fr", "es"] * 2,
)

SHAPES = {
    "single_event": (_mk_events([(0, 1, "click", 3.0)]), _BASE_DOCS),
    "all_zero_values": (
        _mk_events([((i % 7) * _DAY, 1 + i % 3, EVENT_TYPES[i % 5], 0.0) for i in range(18)]),
        _BASE_DOCS,
    ),
    "all_identical": (_mk_events([(1000, 1, "view", 5.0)] * 16), _BASE_DOCS),
    "no_conversions": (
        _mk_events([((i % 9) * _DAY + i, 1 + i % 4, "error", 1.0 + i) for i in range(16)]),
        _BASE_DOCS,
    ),
    "constant_weekly": (
        _mk_events([(i * 7 * _DAY, 1 + i, "click", 100.0) for i in range(4)]),
        _BASE_DOCS,
    ),
    "all_empty_docs": (_BASE_EVENTS, _mk_docs([""] * 9)),
    "single_doc": (_BASE_EVENTS, _mk_docs(["spark join window"])),
    "identical_docs": (
        _BASE_EVENTS,
        _mk_docs(["the spark table scan"] * 10, langs=["en"] * 10, srcs=["src0"] * 10),
    ),
    "one_char_docs": (_BASE_EVENTS, _mk_docs(["a"] * 8)),
    "half_empty_docs": (_BASE_EVENTS, _mk_docs(["", "key"] * 5)),
}

# The division-sensitive set: every query whose denominator an adversarial
# frame zeroed (the round-7 finds) plus the ratio-heavy neighbors that share
# their shapes. The full-pool sweep runs under SPARK_GRAFT_ADVERSARIAL=full.
SENSITIVE = [
    "q_lift_table", "q_period_over_period", "q_dedup_savings",
    "q_classifier_report", "q_auc_eval", "q_ks_drift", "q_wasserstein_drift",
    "q_mann_whitney", "q_block_maxima", "q_welch_ttest", "q_runs_test",
    "q_overdispersion", "q_spearman", "q_cuped", "q_qini_curve",
    "q_srm_check", "q_good_turing", "q_bpe_fertility", "q_quality_trend",
    "q_char_bigram_entropy", "q_calibration", "q_user_saturation",
    # round-7 stats family — rank/moment machinery with degenerate-zero
    # denominators by construction (all guarded with try_divide)
    "q_kendall_tau", "q_pettitt_changepoint", "q_kruskal_wallis",
    "q_anova", "q_cramers_v", "q_tukey_fences",
    # round-7 wave 2 — doc-shape-sensitive (empty texts, single docs)
    "q_rake_keyphrases", "q_winnowing_fingerprint", "q_audio_loudness",
    "q_kneser_ney_surprisal", "q_holt_winters", "q_sax_words",
    # round-8 — ratio/fold machinery over degenerate frames (single event,
    # all-identical series, empty docs): every division rides try_divide
    # or an exact-integer guard
    "q_mcnemar", "q_brown_forsythe", "q_ohlc_bars", "q_page_hinkley",
    "q_bot_detection", "q_time_decay_attribution", "q_pit_join",
    "q_session_stats", "q_dtw_distance", "q_isotonic_calibration",
    "q_logrank_test",
    "q_psi_drift", "q_cohens_kappa", "q_gopher_rules", "q_mojibake_audit",
    "q_textrank_keywords",
    # round-8 wave 2
    "q_cochran_q", "q_hurst_exponent", "q_weibull_fit", "q_croston",
    "q_fleiss_kappa", "q_rbo_rankings", "q_burrows_delta",
    # round-8 wave 3
    "q_seasonal_mann_kendall", "q_code_switch_audit", "q_token_budget_fill",
    "q_poisson_rate_test", "q_friedman_test", "q_keyword_trend",
    "q_bm25_k1_sweep",
    # round-9 — moment/sign/window machinery over degenerate daily frames
    # (constant series, n=1, all-tied pairs) plus the doc-audit pair
    "q_jarque_bera", "q_cox_stuart", "q_bollinger_bands", "q_durbin_watson",
    "q_rsi_cutler", "q_jonckheere", "q_flesch_reading", "q_oov_rate",
    # round-9 wave 2 — doc-shape-sensitive: PNG encode needs non-empty
    # text (the builder filter must agree with the oracle's), RRF's
    # lexical leg can be empty (no query-term hits) or disjoint from the
    # fixed embeddings id domain
    "q_multimodal_png", "q_rrf_fusion",
]


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_degenerate_shapes_match_duckdb(spark, tmp_path_factory, shape):
    ev, docs = SHAPES[shape]
    tmpdir = str(tmp_path_factory.mktemp(f"adv_{shape}"))
    _materialize(tmpdir, ev, docs)
    if os.environ.get("SPARK_GRAFT_ADVERSARIAL") == "full":
        pool = EVENT_QUERIES + DOC_QUERIES
    else:
        pool = SENSITIVE
    _check_parity(spark, tmpdir, pool)


# Degenerate EMBEDDINGS shapes (round-9; the r8 ADVICE zero-candidate find):
# probe-only corpora make the IVF candidate set empty — q_ndcg_eval's
# unguarded idcg fold hit Spark's sequence(1, 0) step -1 default and threw
# DIVIDE_BY_ZERO on 1/log2(1) while the DuckDB oracle's empty range returned
# idcg = 0.  These shapes hit that frame (and its tie/identical-vector
# neighbors) every run.
EMB_SHAPES = {
    # only the probe vector exists: every vec_id <> 0 derivation is empty
    "probe_only": ([[0.5] + [0.0] * 63], [0]),
    # a single non-probe candidate: k=1 frontiers, rank-1-only folds
    "probe_plus_one": ([[0.5] + [0.0] * 63, [0.4] + [0.1] * 63], [0, 1]),
    # all-identical vectors: every cosine ties at 1.0, one label per vector
    "identical_vecs": ([[0.5] + [0.1] * 63] * 5, [0, 1, 2, 3, 4]),
}

EMB_SENSITIVE = [
    "q_ndcg_eval", "q_ivf_nprobe_curve", "q_embedding_discrimination",
    "q_nearest_centroid", "q_silhouette", "q_cosine_topk", "q_batch_ann",
    "q_ann_ivf", "q_embedding_norm_audit", "q_jl_recall", "q_srp_simhash",
    "q_embedding_dedup", "q_matryoshka",
]


@pytest.mark.parametrize("shape", sorted(EMB_SHAPES))
def test_degenerate_embeddings_match_duckdb(spark, tmp_path_factory, shape):
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from test_oracle_fuzz import _SF0001, _TABLES

    vecs, labels = EMB_SHAPES[shape]
    tmpdir = str(tmp_path_factory.mktemp(f"adv_emb_{shape}"))
    for t in _TABLES:
        if t != "embeddings":
            shutil.copy(os.path.join(_SF0001, f"{t}.parquet"), os.path.join(tmpdir, f"{t}.parquet"))
    tbl = pa.Table.from_pydict(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(tmpdir, "embeddings.parquet"))
    _check_parity(spark, tmpdir, EMB_SENSITIVE)
