"""Unicode parity for the text->media payload contract (round-9 review
find): the synthetic PPM/BMP/PNG/WAV builders cycle TEXT into payload
bytes while their DuckDB oracles replay per-CHAR ord() — with raw
multibyte text one char encodes to several UTF-8 bytes, so the two sides
silently diverge (wrong-but-decode_ok pixel stats vs the oracle's
codepoint stats). Both sides now define the contract over the
printable-ASCII projection of the text ('[^ -~]' stripped), which this
test pins by running every media query AND its declared oracle over a
corpus of mixed ASCII / multibyte / all-multibyte / control-char
documents and asserting value parity — exactly the driver's compare.
"""

from __future__ import annotations

import importlib.util
import os
import shutil

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF0001 = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
if not os.path.isdir(_SF0001):  # no fixture on this checkout — skip, don't error
    pytest.skip(f"fixture dir {_SF0001} missing", allow_module_level=True)
_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")

MEDIA_QUERIES = [
    "q_multimodal_decode",
    "q_multimodal_bmp",
    "q_multimodal_png",
    "q_multimodal_gif",
    "q_multimodal_resize",
    "q_image_phash_dedup",
    "q_image_dhash_dedup",
    "q_multimodal_audio",
    "q_audio_loudness",
]

DOCS = [
    # plain ASCII — the baseline contract
    "the quick brown fox jumps over the lazy dog 0123",
    # mixed: multibyte chars interleaved with ASCII (the divergence shape:
    # 'é' is 2 UTF-8 bytes but ord() = 233 — one oracle sample)
    "café naïve résumé über ASCII tail",
    # CJK + emoji: 3- and 4-byte sequences
    "日本語 corpus \U0001f600 mixed 中文 text",
    # all-multibyte: the ASCII projection is EMPTY -> both sides must DROP
    # the row (WHERE length(t) > 0), not emit a divergent one
    "ééé中文日本語",
    # control chars: newline/tab are outside [ -~] and must strip
    "line one\nline two\ttabbed end",
    # single char (repeat/ceil edge after projection)
    "x",
]


def _normalize():
    spec = importlib.util.spec_from_file_location(
        "check_oracles", os.path.join(_REPO, "tools", "check_oracles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.normalize


def _compare_media(spark, sf_dir: str) -> None:
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    normalize = _normalize()
    con = duckdb.connect()
    try:
        for t in _TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in MEDIA_QUERIES:
            sdf = queries[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
            scols, srows = normalize(sdf)
            ocols, orows = normalize(odf)
            assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
            assert len(srows) == len(orows), (
                f"{name}: row count {len(srows)} vs {len(orows)}"
            )
            assert srows == orows, (
                f"{name}: value mismatch\nspark={srows[:4]}\noracle={orows[:4]}"
            )
    finally:
        con.close()


def _write_docs(sf_dir: str, texts: list[str]) -> None:
    for t in _TABLES:
        if t != "documents":
            dst = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(dst):
                shutil.copy(os.path.join(_SF0001, f"{t}.parquet"), dst)
    pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["srcU"] * len(texts),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    ).to_parquet(os.path.join(sf_dir, "documents.parquet"), index=False)


# Mixed alphabet: printable ASCII, 2-byte (é/ß), 3-byte (CJK), 4-byte
# (emoji), and stripped control chars — random interleavings exercise the
# projection/repeat/ceil boundaries the fixed corpus can't (e.g. an ASCII
# projection whose length divides the raster size exactly).
_ALPHABET = "ab z09.~!é ß中日\U0001f600\n\t"


@settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "3")),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    texts=st.lists(
        st.text(alphabet=_ALPHABET, min_size=0, max_size=60),
        min_size=4,
        max_size=16,
    )
)
def test_media_oracle_parity_fuzzed_unicode(spark, tmp_path_factory, texts):
    sf_dir = str(tmp_path_factory.mktemp("uni"))
    _write_docs(sf_dir, texts)
    _compare_media(spark, sf_dir)


def test_media_queries_match_oracles_on_unicode_corpus(spark, tmp_path):
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    normalize = _normalize()

    sf_dir = str(tmp_path)
    for t in _TABLES:
        if t != "documents":
            shutil.copy(os.path.join(_SF0001, f"{t}.parquet"), os.path.join(sf_dir, f"{t}.parquet"))
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(DOCS)), dtype="int64"),
            "text": DOCS,
            "lang": ["en"] * len(DOCS),
            "source": ["srcU"] * len(DOCS),
            "n_chars": pd.array([len(t) for t in DOCS], dtype="int64"),
        }
    )
    docs.to_parquet(os.path.join(sf_dir, "documents.parquet"), index=False)

    con = duckdb.connect()
    try:
        for t in _TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in MEDIA_QUERIES:
            sdf = queries[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
            scols, srows = normalize(sdf)
            ocols, orows = normalize(odf)
            assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
            # the all-multibyte doc must vanish from BOTH sides; everything
            # else must survive (5 of the 6 docs carry ASCII)
            assert len(srows) == len(orows), (
                f"{name}: row count {len(srows)} vs {len(orows)}"
            )
            assert srows == orows, (
                f"{name}: value mismatch\nspark={srows[:4]}\noracle={orows[:4]}"
            )
    finally:
        con.close()
