"""Cross-engine property fuzz (SURVEY §5 stretch letter): Hypothesis
generates tiny random `events` / `documents` tables, writes them as parquet
next to the fixed sf0.001 copies of the other tables, and checks a random
sample of declared queries on Spark against their DuckDB oracles over the
SAME files — columns, row count, and canonical values must match.

This hardens oracle parity beyond the fixed driver fixtures: duplicate
timestamps, empty-ish groups, single-user streams, and adversarial text are
all shapes the deterministic seed-42 testdata never produces.

The query pools below are exactly the declared queries whose Spark side
reads ONLY events/documents and whose oracle is declared (verified by a
source scan); results are compared with the same canonicalization as
``tools/check_oracles.py`` so a fuzz failure here is a real parity bug.
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil

import duckdb
import pandas as pd
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF0001 = "/root/testdata/sf0.001"
_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")


def _load_check_oracles():
    spec = importlib.util.spec_from_file_location("check_oracles", os.path.join(_REPO, "tools", "check_oracles.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_co = _load_check_oracles()
normalize = _co.normalize


def _registry():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


# Queries reading ONLY the events table (all oracle-declared).
EVENT_QUERIES = [
    "q_tumbling_window", "q_session_window", "q_sliding_window",
    "q_transition_matrix", "q_funnel", "q_histogram", "q_dedup",
    "q_scalar_funcs", "q_gap_fill", "q_absence_pattern",
    "q_watermark_cadence", "q_acf_daily", "q_data_freshness",
    "q_active_users", "q_weekday_profile", "q_cohort_retention",
    "q_retention_curve", "q_time_to_convert", "q_rolling_time_window",
    "q_dynamic_session_window",
]
# Queries reading ONLY the documents table (all oracle-declared).
DOC_QUERIES = [
    "q_token_stats", "q_lang_id", "q_dedup_text_exact", "q_text_normalize",
    "q_quality_score", "q_repetition_filter", "q_doc_fingerprint",
    "q_flatmap_explode",
]

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
WORDS = [
    "spark", "group", "query", "row", "data", "slow", "small", "filter",
    "the", "join", "window", "stream", "sort", "merge", "key", "scan",
    "a", "batch", "value", "customer", "line", "fast", "table", "part",
]

_EPOCH_2024 = 1_704_067_200  # 2024-01-01T00:00:00Z, matches the fixture range


@st.composite
def _events_frame(draw):
    n = draw(st.integers(min_value=15, max_value=45))
    ts_off = draw(st.lists(st.integers(0, 5 * 86_400_000), min_size=n, max_size=n))
    users = draw(st.lists(st.integers(1, 6), min_size=n, max_size=n))
    types = draw(st.lists(st.sampled_from(EVENT_TYPES), min_size=n, max_size=n))
    values = draw(st.lists(st.floats(0, 500, allow_nan=False, allow_infinity=False), min_size=n, max_size=n))
    ks = draw(st.lists(st.integers(0, 99), min_size=n, max_size=n))
    return pd.DataFrame(
        {
            "event_id": pd.array(range(n), dtype="int64"),
            "ts": pd.to_datetime([_EPOCH_2024 * 1000 + ms for ms in ts_off], unit="ms"),
            "user_id": pd.array(users, dtype="int64"),
            "event_type": types,
            "value": [round(v, 2) for v in values],
            "props": [json.dumps({"k": k}) for k in ks],
        }
    )


@st.composite
def _documents_frame(draw):
    n = draw(st.integers(min_value=8, max_value=25))
    texts = draw(
        st.lists(
            st.lists(st.sampled_from(WORDS), min_size=0, max_size=40).map(" ".join),
            min_size=n,
            max_size=n,
        )
    )
    langs = draw(st.lists(st.sampled_from(LANGS), min_size=n, max_size=n))
    srcs = draw(st.lists(st.sampled_from([f"src{i}" for i in range(5)]), min_size=n, max_size=n))
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(n), dtype="int64"),
            "text": texts,
            "lang": langs,
            "source": srcs,
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )


def _materialize(tmpdir: str, events: pd.DataFrame, documents: pd.DataFrame) -> str:
    """Write the fuzzed tables + fixed sf0.001 copies of everything else."""
    for t in _TABLES:
        if t not in ("events", "documents"):
            shutil.copy(os.path.join(_SF0001, f"{t}.parquet"), os.path.join(tmpdir, f"{t}.parquet"))
    events.to_parquet(os.path.join(tmpdir, "events.parquet"), index=False)
    documents.to_parquet(os.path.join(tmpdir, "documents.parquet"), index=False)
    return tmpdir


def _check_parity(spark, sf_dir: str, names: list[str]) -> None:
    queries, oracles = _registry()
    con = duckdb.connect()
    try:
        for t in _TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        for name in names:
            sdf = queries[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
            scols, srows = normalize(sdf)
            ocols, orows = normalize(odf)
            assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
            assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
            assert srows == orows, f"{name}: value mismatch\nspark={srows[:5]}\noracle={orows[:5]}"
    finally:
        con.close()


# One Spark query ≈ 0.3-1.5 s on the 4-cpu pytest session; 10 queries per
# example × 3 examples keeps the suite's fuzz cost ~1 min while still
# exploring shapes the fixed fixtures can't. derandomize pins CI stability;
# crank max_examples locally when hunting (see docs/EVIDENCE.md).
_FUZZ_SETTINGS = dict(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "3")),
    deadline=None,
    derandomize="SPARK_GRAFT_FUZZ_EXAMPLES" not in os.environ,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@settings(**_FUZZ_SETTINGS)
@given(
    events=_events_frame(),
    documents=_documents_frame(),
    picks=st.permutations(EVENT_QUERIES + DOC_QUERIES),
)
def test_random_tables_match_duckdb_oracles(spark, tmp_path_factory, events, documents, picks):
    tmpdir = str(tmp_path_factory.mktemp("fuzz_sf"))
    _materialize(tmpdir, events, documents)
    _check_parity(spark, tmpdir, list(picks[:10]))
