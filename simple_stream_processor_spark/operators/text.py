"""Text-analysis operators for training-data pipelines (SURVEY §2.8 N11 +
north-star extensions): tokenization, language-ID heuristic, quality
scoring, token counting, document fingerprinting.

All pure built-in column expressions — JVM-side, whole-stage-codegen'd, no
Python in the hot path — so a 100 TB documents table processes at scan
speed with zero shuffles until the (optional) aggregation.

Determinism contract: every function here has an exact DuckDB-SQL
equivalent (used by the oracle gate), so hashing/scoring must avoid
engine-specific behavior: md5 (identical hex output), integer arithmetic,
IEEE double division — no locale-dependent ops, no round() on
midpoint-prone products.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simple_stream_processor_spark.registry import scoped_persist

# Marker stopword sets for the n-gram/stopword language heuristic.
# Tiny by design: the operator demonstrates the blocking pattern (per-language
# marker hit counts → argmax with deterministic tie-break), which is what a
# real fastText-style scorer would slot into.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "le", "shi", "bu", "wo"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text_col: Column) -> Column:
    """Whitespace tokenization (the corpus is pre-normalized; a BPE-ish
    regex split is in ``regex_tokens``)."""
    return F.split(text_col, " ")


def regex_tokens(text_col: Column) -> Column:
    """BPE-ish alnum-run tokenization: split on any non-alphanumeric run."""
    return F.split(text_col, "[^a-z0-9]+")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counting: whitespace tokens, regex tokens,
    distinct tokens, char length. One narrow projection."""
    t = tokens(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(regex_tokens(F.col(text_col))).alias("n_regex_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.length(F.col(text_col)).alias("n_chars_text"),
    )


def lang_score(text_col: Column, lang: str) -> Column:
    """Marker-hit count for one language: |tokens ∩ markers| including
    repeats (frequency-weighted, like an n-gram profile score)."""
    markers = LANG_MARKERS[lang]
    t = tokens(text_col)
    return F.size(F.filter(t, lambda x: x.isin(*markers)))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-hit counts with
    deterministic tie-break on language code ascending (so empty/ambiguous
    docs resolve stably). Emits the per-language scores too, so downstream
    filters can threshold on confidence."""
    scored = df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[lang_score(F.col(text_col), lg).alias(f"score_{lg}") for lg in sorted(LANG_MARKERS)],
    )
    # argmax via greatest + case chain in lang-code order (deterministic)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):  # build CASE so FIRST (asc) match wins ties
        pred = F.when(F.col(f"score_{lg}") == best, F.lit(lg)).otherwise(pred)
    return scored.withColumn("pred_lang", pred).withColumn(
        "lang_match", (F.col("pred_lang") == F.col("labeled_lang"))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length/stopword/diversity ratios + a composite.
    All IEEE-double arithmetic on integer counts — bit-identical across
    engines, no rounding needed."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    n_dist = F.size(F.array_distinct(t))
    n_chars = F.length(F.col(text_col))
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (n_chars.cast("double") / n_tok.cast("double")).alias("avg_token_len"),
        (n_stop.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
        (n_dist.cast("double") / n_tok.cast("double")).alias("type_token_ratio"),
        (
            (n_dist.cast("double") / n_tok.cast("double"))
            * (1 - n_stop.cast("double") / n_tok.cast("double"))
        ).alias("quality"),
    )


def word_ngrams(text_col: Column, n: int) -> Column:
    """Positional word n-grams (``array<string>``, duplicates preserved —
    order matters for repetition metrics; wrap in ``array_distinct`` for
    set semantics). Documents shorter than ``n`` words yield an empty
    array (``sequence`` would otherwise run descending)."""
    w = tokens(text_col)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.array_join(F.slice(w, i + F.lit(1), F.lit(n)), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document: top-word
    fraction (most frequent word's share of tokens) and duplicate-bigram
    fraction (1 - distinct/total bigrams). Mirrors the repetition filters
    of Rae et al. 2021 (Gopher) §A1.1, applied before LLM training.

    Entirely narrow array higher-order functions — zero shuffle, scan
    speed at 100 TB. The flag thresholds are exact integer comparisons
    (100·top > 14·n ; 100·dup > 8·n_bigrams), so the decision is
    bit-identical across engines; the reported fractions are IEEE-double
    ratios of exact integers, safe to round.

    Reference parity: generalizes the reference's per-element `filter`
    (Stream.scala:36-47) to a content-quality predicate family.
    """
    w = tokens(F.col(text_col))
    n_words = F.size(w)
    top_word_n = F.array_max(
        F.transform(F.array_distinct(w), lambda d: F.size(F.filter(w, lambda x: x == d)))
    )
    bi = word_ngrams(F.col(text_col), 2)
    n_bi = F.size(bi)
    dist_bi = F.size(F.array_distinct(bi))
    dup_bi = n_bi - dist_bi
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        top_word_n.alias("top_word_n"),
        n_bi.alias("n_bigrams"),
        dist_bi.alias("distinct_bigrams"),
        # try_divide: a ≤1-token doc has 0 bigrams; ANSI (driver default)
        # would raise DIVIDE_BY_ZERO where DuckDB's 0/0.0 yields NULL
        F.round(F.try_divide(top_word_n.cast("double"), n_words.cast("double")), 4).alias("top_word_frac"),
        F.round(F.try_divide(dup_bi.cast("double"), n_bi.cast("double")), 4).alias("dup_bigram_frac"),
        ((F.lit(100) * top_word_n > F.lit(14) * n_words) | (F.lit(100) * dup_bi > F.lit(8) * n_bi)).alias(
            "flagged"
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: full-content md5 plus a shingle-anchored
    min-hash fingerprint (min/max md5 over word 3-shingles) — the rolling-
    hash analog that survives small edits at the ends. All string-domain
    (hex), engine-portable."""
    from simple_stream_processor_spark.operators.dedup import word_shingles

    # distinct shingles give the same min/max anchors as the raw sequence
    sh_hashes = F.transform(word_shingles(F.col(text_col), 3), lambda s: F.md5(F.encode(s, "UTF-8")))
    return df.select(
        "doc_id",
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("content_md5"),
        F.array_min(sh_hashes).alias("min_shingle_md5"),
        F.array_max(sh_hashes).alias("max_shingle_md5"),
    )


def chunk_words_udtf():
    """Python UDTF (Arrow-batched) chunking a document into fixed-size
    word windows — the context-window chunking step of an LLM training
    pipeline, and the engine's arbitrary-1→N-function surface (reference
    ``flatMap``, Stream.scala:25-34, generalized to a table function
    usable from SQL via LATERAL).

    Built-in ``explode`` covers array expansion (q_flatmap_explode); a
    UDTF is the escape hatch when the expansion logic is imperative
    Python. Per-row cost stays Arrow-batched; the expansion is a narrow
    operation — no shuffle at any corpus size."""
    from pyspark.sql.functions import udtf

    # useArrow: without it Spark plans BatchEvalPythonUDTF (pickled rows one
    # at a time over the Python boundary); Arrow batches are the 10-100x path
    @udtf(returnType="doc_id: bigint, chunk_id: bigint, chunk_text: string, n_words: bigint", useArrow=True)
    class ChunkWords:
        def eval(self, doc_id, text, size):  # noqa: ANN001
            words = (text or "").split(" ")
            for i in range(0, len(words), size):
                chunk = words[i : i + size]
                yield doc_id, i // size, " ".join(chunk), len(chunk)

    return ChunkWords


PII_PATTERNS = {
    # character-class-only patterns — identical semantics in Java regex
    # (Spark) and RE2 (DuckDB); no lookaround, no \b, no unicode classes
    "email": ("[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[a-zA-Z]", "<EMAIL>"),
    "phone": ("[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    "id16": ("[0-9]{16}", "<ID>"),
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing: mask emails, phone numbers, and 16-digit IDs with
    typed placeholder tokens, reporting per-document match counts — the
    pre-training privacy pass every LLM corpus pipeline runs (cf. the
    C4/Dolma PII masking steps).

    Entirely narrow regexp_replace/regexp_count column expressions —
    zero shuffle, scan speed at 100 TB; patterns restricted to plain
    character classes so the masking is byte-identical across regex
    engines (no lookaround/boundary constructs, which RE2 and Java
    disagree on).

    Reference parity: the per-element rewrite family of `Stream.map`
    (Stream.scala:14-23) applied to a compliance transform.
    """
    out = F.col(text_col)
    counts = []
    for name, (pat, token) in PII_PATTERNS.items():
        counts.append(F.regexp_count(out, F.lit(pat)).alias(f"n_{name}"))
        out = F.regexp_replace(out, pat, token)
    return df.select("doc_id", *counts, out.alias("redacted"), F.md5(out).alias("redacted_md5"))


def _sql_str(s: str) -> str:
    """Escape a Python string as a Spark SQL single-quoted literal
    (backslash-style escapes are on by default in Spark's parser)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_fold_expr(left: str, right: str):
    """The greedy adjacent-pair merge fold as ONE SQL expression.

    Identical operator tree to the previous per-op Column construction
    (aggregate / CASE WHEN / element_at / concat / slice — the SQL parser
    produces the same Catalyst nodes), but built with a single py4j call
    instead of ~30: at ~1 ms per py4j round trip here, the old form cost
    ~0.2 s of driver time PER MERGE ROUND in every BPE query (guide §5 —
    the driver should do almost no work; r11). Returns the full
    size-guarded CASE so callers replace their whole per-round projection."""
    merged = _sql_str(left + right)
    fold = (
        "aggregate(slice(syms, 2, size(syms) - 1), slice(syms, 1, 1), "
        "(acc, s) -> CASE WHEN element_at(acc, -1) = {l} AND s = {r} "
        "THEN concat(slice(acc, 1, size(acc) - 1), array({m})) "
        "ELSE concat(acc, array(s)) END)"
    ).format(l=_sql_str(left), r=_sql_str(right), m=merged)
    return F.expr(f"CASE WHEN size(syms) >= 2 THEN {fold} ELSE syms END")


def bpe_merges(df: DataFrame, text_col: str = "text", rounds: int = 5) -> DataFrame:
    """Byte-pair-encoding vocabulary induction: learn the first ``rounds``
    BPE merges from the corpus (most-frequent adjacent symbol pair per
    round, greedy left-to-right application, deterministic (count desc,
    pair asc) tie-break). Returns one row per learned merge:
    (round, left, right, merged, pair_count).

    Scale design — the textbook BPE trainer maps onto Spark exactly as
    the classic single-node algorithm maps onto a hash map:
    - The corpus collapses ONCE to the distinct-word frequency table
      (100 TB of text -> vocab-sized table, the only thing the loop
      touches). That exchange is the same one every tokenizer trainer
      pays; afterwards frequency weights stand in for corpus re-scans.
    - Each round is one pair-explode + pair-count aggregate over the
      word table (map-side combine; the exchange carries distinct
      adjacent pairs, bounded by vocab x max_word_len), then a one-row
      argmax collect — the same bounded driver witness the dedup
      convergence loop uses (operators/dedup.py).
    - The merge application is a JVM-side F.aggregate fold over each
      word's symbol array (greedy adjacent-pair rewrite) — no Python
      UDF in the loop.
    The word table is persisted and re-checkpointed each round so the
    lineage stays O(1) across rounds rather than O(rounds).

    Not SQL-expressible (iterative argmax-dependent rewriting), so the
    declared query is rows-only; tests/test_llmdata.py pins the full
    merge table against a pure-Python reference BPE trainer on the same
    corpus."""
    spark = df.sparkSession
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        # limit=-1 keeps Java-split trailing empties; drop them — a ""
        # symbol would otherwise join pair counts after the first merge
        .select(
            F.filter(F.split("word", "(?!^)"), lambda s: s != "").alias("syms"),
            "freq",
        )
    )
    words = scoped_persist(words)
    # the per-round jobs touch only the vocab table: when it is small,
    # 32-task stages are pure scheduler overhead (16+ micro-jobs at 8
    # rounds) — collapse to a handful of partitions (not ONE: the per-round
    # symbol fold then runs on a few cores instead of serially, and near the
    # 100k-row gate a single partition folds the whole vocab in one task); a
    # 100 TB corpus with a many-million-word vocab keeps its parallelism
    if words.count() < 100_000:
        words = words.coalesce(min(8, spark.sparkContext.defaultParallelism))

    # r11 (r10 advisor): with lazy checkpoints the round RDDs accumulated in
    # executor storage until driver GC — rounds x vocab of cache at the
    # claimed many-million-word scale. Round r's argmax job fully
    # materializes checkpoint r-1, after which checkpoint r-2 has no
    # possible consumer (lineage is truncated AT r-1) — free it eagerly, so
    # at most TWO vocab-sized checkpoints are ever live. Best-effort: a
    # failure to free must never fail the query.
    ckpts: list = []

    def _free_oldest_ckpt():
        if len(ckpts) >= 2:
            df_old = ckpts.pop(0)
            try:
                df_old._jdf.queryExecution().logical().rdd().unpersist(False)
            except Exception:
                pass

    out_rows = []
    for r in range(1, rounds + 1):
        n = F.size("syms")
        pairs = words.where(n >= 2).select(
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, n - 1).alias("l"),
                    F.slice("syms", 2, n - 1).alias("r"),
                )
            ).alias("p"),
            "freq",
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        _free_oldest_ckpt()  # the argmax just materialized checkpoint r-1
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["pair_count"])
        out_rows.append((r, left, right, left + right, cnt))
        # LAZY checkpoint (r10, guide §1.2): the fold materializes inside the
        # NEXT round's argmax job instead of as its own eager job — one Spark
        # job per merge round rather than two (8 jobs saved at rounds=8), and
        # the final round's fold (whose output no consumer reads) never runs.
        # Lineage stays O(1): each checkpoint is one fold above the previous.
        # The round-1 corpus persist must outlive the first lazy fold, so no
        # per-round unpersist — the scoped persist releases at the query
        # boundary as every other query-scoped cache does.
        words = words.select(
            bpe_fold_expr(left, right).alias("syms"),
            "freq",
        ).localCheckpoint(eager=False)  # O(1) lineage per round; vocab-sized
        ckpts.append(words)
    schema = "round INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    return spark.createDataFrame(out_rows, schema=schema)


def bpe_encode_counts(df: DataFrame, merges: list, text_col: str = "text") -> DataFrame:
    """Apply a learned BPE merge list (from ``bpe_merges``) and count the
    resulting tokens per document: (doc_id, n_words, n_bpe_tokens) — the
    encode half of the tokenizer loop, which is what sequence packing and
    mixture weighting actually consume. Scale design: the merges are
    applied to the DISTINCT-WORD vocabulary (vocab-sized, same collapse
    as training), each merge as a JVM-side array fold, and the per-word
    symbol count broadcasts back into the (doc, word) stream — the
    corpus is never re-folded, only joined against the vocab-sized
    lookup. 100 TB of text pays one token exchange for the per-doc sum;
    the fold work is vocab x merges, independent of corpus size."""
    tok = df.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where(F.length("word") > 0)
    vocab = tok.select("word").distinct().select(
        "word",
        F.filter(F.split("word", "(?!^)"), lambda s: s != "").alias("syms"),
    )
    for left, right in merges:
        vocab = vocab.select("word", bpe_fold_expr(left, right).alias("syms"))
    lut = vocab.select("word", F.size("syms").alias("n_syms"))
    return (
        tok.join(F.broadcast(lut), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
    )
