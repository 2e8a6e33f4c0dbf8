"""Tests for the LLM-training-data operators: dedup family, similarity
search, text analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from simple_stream_processor_spark.operators import dedup, multimodal, similarity, text
from simple_stream_processor_spark.tables import load_table


def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir)


def test_minhash_finds_planted_near_dups(spark, sf_dir):
    pairs = dedup.minhash_dedup(docs(spark, sf_dir), threshold=0.5).collect()
    assert len(pairs) > 0  # the corpus has planted near-duplicates
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert 0.5 <= r.jaccard <= 1.0


def test_minhash_candidates_superset_of_verified(spark, sf_dir):
    sh = dedup.shingle_table(docs(spark, sf_dir))
    sigs = dedup.minhash_signatures(sh)
    cands = dedup.candidate_pairs(dedup.lsh_band_table(sigs))
    verified = dedup.verify_jaccard(cands, sh, 0.5)
    assert cands.count() >= verified.count()


def test_simhash_signature_deterministic(spark, sf_dir):
    s1 = {r.doc_id: r.simhash for r in dedup.simhash(docs(spark, sf_dir)).collect()}
    s2 = {r.doc_id: r.simhash for r in dedup.simhash(docs(spark, sf_dir)).collect()}
    assert s1 == s2
    assert all(0 <= v < (1 << 60) for v in s1.values())


def test_simhash_near_dup_pairs_have_close_signatures(spark, sf_dir):
    sigs = dedup.simhash(docs(spark, sf_dir))
    pairs = dedup.simhash_pairs(sigs, max_hamming=3).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r.hamming <= 3


def test_identical_texts_identical_signatures(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "x y z w v u t")], "doc_id long, text string"
    )
    sigs = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    mh = dedup.minhash_signatures(dedup.shingle_table(df)).collect()
    by_id = {r.doc_id: tuple(r[f"sig{i}"] for i in range(dedup.N_MINHASH)) for r in mh}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]


def test_embedding_near_dup_blocked(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    out = dedup.embedding_near_dup(emb, threshold=0.4)
    rows = out.collect()
    for r in rows:
        assert r.vec_a < r.vec_b and r.cos_sim >= 0.4


def test_cosine_topk_baseline(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    top = similarity.cosine_topk(emb, probe_id=0, k=10).collect()
    assert len(top) == 10
    sims = [r.cos_sim for r in top]
    assert sims == sorted(sims, reverse=True)
    assert all(r.vec_id != 0 for r in top)


def test_ann_results_are_subset_quality(spark, sf_dir):
    """ANN top-k cosines can't exceed brute-force; overlap should be
    nonzero (probe's own bucket contains its neighbors more often than
    random)."""
    emb = load_table(spark, "embeddings", sf_dir)
    brute = similarity.cosine_topk(emb, probe_id=0, k=10).collect()
    ann = similarity.ann_bucketed_topk(emb, probe_id=0, k=10).collect()
    assert len(ann) >= 1
    assert max(r.cos_sim for r in ann) <= max(r.cos_sim for r in brute) + 1e-12


def test_lang_id_deterministic_tiebreak(spark):
    # no marker hits → all scores 0 → tie → lowest lang code wins ('de')
    df = spark.createDataFrame([(1, "zzz qqq www", "en")], "doc_id long, text string, lang string")
    out = text.lang_id(df).collect()[0]
    assert out.pred_lang == "de"
    # clear German markers win
    df2 = spark.createDataFrame([(2, "der und das ist der", "de")], "doc_id long, text string, lang string")
    out2 = text.lang_id(df2).collect()[0]
    assert out2.pred_lang == "de" and out2.lang_match


def test_quality_score_ranges(spark, sf_dir):
    rows = text.quality_score(docs(spark, sf_dir)).collect()
    for r in rows:
        assert 0 <= r.stopword_ratio <= 1
        assert 0 < r.type_token_ratio <= 1
        assert 0 <= r.quality <= 1


def test_multimodal_stub_raises_without_fake(spark):
    df = multimodal.documents_as_media(
        spark.createDataFrame([(1, "hello world", "en", "s", 11)], "doc_id long, text string, lang string, source string, n_chars long")
    )
    out = multimodal.decode_features(df, fake=False)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        out.collect()


def test_multimodal_fake_decoder_features(spark):
    df = multimodal.documents_as_media(
        spark.createDataFrame(
            [(1, "ab", "en", "s", 2), (2, "", "en", "s", 0)], "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    rows = {r.media_id: r for r in multimodal.decode_features(df, fake=True).collect()}
    assert rows[1].n_bytes == 2
    assert rows[1].byte_min == ord("a") and rows[1].byte_max == ord("b")
    assert rows[1].byte_mean == (ord("a") + ord("b")) / 2
    assert rows[1].feature_ok
    assert rows[2].n_bytes == 0 and not rows[2].feature_ok


def test_media_metadata_prunes_payload(spark):
    df = multimodal.documents_as_media(
        spark.createDataFrame([(1, "hello", "en", "s", 5)], "doc_id long, text string, lang string, source string, n_chars long")
    )
    meta = multimodal.media_metadata(df)
    assert "payload" not in meta.columns
    assert meta.collect()[0].duration_ms == 5


def test_dedup_clusters_transitive(spark):
    # A~B and B~C (A never compared to C) must land in one cluster, rep = min
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_rep for r in dedup.dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_clusters_chain_converges(spark):
    # a path graph is the worst-case diameter; force the DISTRIBUTED
    # label-propagation path (driver_threshold=0) and check it converges
    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_rep for r in dedup.dedup_clusters(pairs, driver_threshold=0).collect()}
    assert set(got.values()) == {0} and len(got) == 13
    # the convergence witness must report the distributed path and a
    # diameter-bounded round count (the sf0.1 soak in docs/EVIDENCE.md
    # reads the same record)
    assert dedup.LAST_RUN_INFO["path"] == "distributed"
    assert 1 <= dedup.LAST_RUN_INFO["rounds"] <= 20


def test_dedup_clusters_distributed_matches_driver_on_real_pairs(spark, sf_dir):
    """Both execution paths on the REAL MinHash pair set (not a synthetic
    chain): identical (doc_id, cluster_rep) output — the sf0.001-sized
    twin of the sf0.1 soak recorded in docs/EVIDENCE.md."""
    import simple_stream_processor_spark.queries_llmdata as ql

    pairs = ql._minhash_pairs(spark, sf_dir)
    n = pairs.count()
    assert n >= 2, "fixture produces a non-trivial near-dup pair set"
    dist = {(r.doc_id, r.cluster_rep) for r in dedup.dedup_clusters(pairs, driver_threshold=1).collect()}
    assert dedup.LAST_RUN_INFO["path"] == "distributed"
    drv = {(r.doc_id, r.cluster_rep) for r in dedup.dedup_clusters(pairs).collect()}
    assert dedup.LAST_RUN_INFO["path"] == "driver"
    assert dist == drv


def test_resize_stub_deterministic_shape(spark):
    df = multimodal.documents_as_media(
        spark.createDataFrame(
            [(1, "hello world payload", "en", "s", 19), (2, "", "en", "s", 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    rows = {r.media_id: r for r in multimodal.resize_images(df, 4, 3, fake=True).collect()}
    assert len(rows[1].payload) == 12 and rows[1].resize_ok
    assert len(rows[2].payload) == 12 and not rows[2].resize_ok
    again = {r.media_id: r for r in multimodal.resize_images(df, 4, 3, fake=True).collect()}
    assert bytes(rows[1].payload) == bytes(again[1].payload)  # deterministic


def test_frame_sample_one_to_n_and_empty_skip(spark):
    df = multimodal.documents_as_media(
        spark.createDataFrame(
            [(1, "abcdefghij", "en", "s", 10), (2, "", "en", "s", 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    frames = multimodal.sample_frames(df, 4, fake=True).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    assert len(by_media.get(1, [])) == 4  # 1 -> N rows
    assert 2 not in by_media  # empty payload -> zero rows (flatMap skip)
    assert b"".join(bytes(r.frame_payload) for r in sorted(by_media[1], key=lambda r: r.frame_idx)) != b""


def test_frame_sample_raises_without_fake(spark):
    df = multimodal.documents_as_media(
        spark.createDataFrame([(1, "abc", "en", "s", 3)], "doc_id long, text string, lang string, source string, n_chars long")
    )
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        multimodal.sample_frames(df, 2, fake=False).collect()


def test_ann_ivf_quality_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    brute = similarity.cosine_topk(emb, probe_id=0, k=10).collect()
    ivf = similarity.ann_ivf_topk(emb, probe_id=0, k=10, nprobe=3).collect()
    assert 1 <= len(ivf) <= 10
    assert max(r.cos_sim for r in ivf) <= max(r.cos_sim for r in brute) + 1e-12
    # nprobe = all clusters degenerates to exact search over all assigned vecs
    ivf_all = similarity.ann_ivf_topk(emb, probe_id=0, k=10, nprobe=10).collect()
    assert [r.vec_id for r in ivf_all] == [r.vec_id for r in brute]


def test_quantize_error_bounded_by_half_scale(spark, sf_dir):
    """SQ8 guarantee: round-to-nearest level => |x' - x| <= scale/2."""
    import __spark_entry__ as _entry

    rows = _entry.queries()["q_embedding_quantize"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.max_abs_err <= r.scale / 2 + 1e-9, (r.vec_id, r.max_abs_err, r.scale)


def test_udtf_chunks_reassemble_to_documents(spark, sf_dir):
    """Chunking is lossless: concatenating chunks in order rebuilds text."""
    from pyspark.sql import functions as F

    import __spark_entry__ as _entry
    from simple_stream_processor_spark.tables import load_table

    chunks = _entry.queries()["q_udtf_chunks"](spark, sf_dir)
    # collect_list order is NOT preserved across the groupBy shuffle —
    # sort the (chunk_id, text) structs inside the row instead
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))).alias("cs"))
        .select(
            "doc_id",
            F.concat_ws(" ", F.transform(F.col("cs"), lambda c: c.chunk_text)).alias("rebuilt"),
        )
    )
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n_bad = rebuilt.join(docs, "doc_id").where(F.col("rebuilt") != F.col("text")).count()
    assert n_bad == 0


def test_repetition_signals_golden(spark):
    """Hand-computed metrics: 'a a a b' → top_word_n=3, bigrams
    [aa,aa,ab] → 2 distinct, dup frac 1/3; both thresholds exceeded."""
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c d e f g h")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text.repetition_signals(df).collect()}
    r1 = out[1]
    assert (r1.n_words, r1.top_word_n, r1.n_bigrams, r1.distinct_bigrams) == (4, 3, 3, 2)
    assert r1.top_word_frac == 0.75 and r1.flagged
    r2 = out[2]  # 8 distinct words: top frac 0.125 < 0.14, no dup bigrams
    assert r2.top_word_n == 1 and r2.dup_bigram_frac == 0.0 and not r2.flagged


def test_repetition_signals_zero_shuffle(spark, sf_dir):
    """The quality filter must stay narrow: no Exchange in the plan."""
    plan = text.repetition_signals(docs(spark, sf_dir))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c d")], "doc_id long, text string")
    out = {r.doc_id: r.g for r in df.select("doc_id", text.word_ngrams(F.col("text"), 3).alias("g")).collect()}
    assert out[1] == []
    assert out[2] == ["a b c", "b c d"]


def test_decontaminate_flags_known_overlap(spark):
    """Doc 10 shares the benchmark 4-gram 'a b c d'; doc 11 shares none."""
    train = spark.createDataFrame(
        [(10, "x a b c d y"), (11, "p q r s t u")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(99, "a b c d e")], "doc_id long, text string")
    rows = dedup.decontaminate(train, bench, n=4).collect()
    assert [(r.doc_id, r.n_overlap) for r in rows] == [(10, 1)]


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """Scale shape: the benchmark gram set must be broadcast — the corpus
    side must not shuffle for the join."""
    d = docs(spark, sf_dir)
    bench = d.where(F.col("doc_id") % 97 == 0)
    train = d.where(F.col("doc_id") % 97 != 0)
    plan = dedup.decontaminate(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_redact_pii_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.com and c@y.org, call 555-123-4567, card 1234567812345678"),
            (2, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.redact_pii(df).collect()}
    r1 = out[1]
    assert (r1.n_email, r1.n_phone, r1.n_id16) == (2, 1, 1)
    assert r1.redacted == "mail <EMAIL> and <EMAIL>, call <PHONE>, card <ID>"
    r2 = out[2]
    assert (r2.n_email, r2.n_phone, r2.n_id16) == (0, 0, 0)
    assert r2.redacted == "clean text only"


def test_redact_pii_zero_shuffle(spark, sf_dir):
    plan = text.redact_pii(docs(spark, sf_dir))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_netpbm_parser_goldens():
    """The real codec (operators/multimodal.py:_parse_netpbm) against
    hand-built binary netpbm images: P6 rgb, P5 gray, header comments,
    16-bit maxval (big-endian samples), and the malformed family — every
    bad payload classifies decode_ok=False instead of raising."""
    from simple_stream_processor_spark.operators.multimodal import _parse_netpbm

    # 2x1 P6: red, green
    fmt, w, h, npx, mean, lo, hi, ok = _parse_netpbm(b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0]))
    assert (fmt, w, h, npx, ok) == ("P6", 2, 1, 2, True)
    assert (lo, hi) == (0, 255) and abs(mean - 510 / 6) < 1e-9

    # 3x2 P5 grayscale with a header comment
    gray = bytes([10, 20, 30, 40, 50, 60])
    fmt, w, h, npx, mean, lo, hi, ok = _parse_netpbm(b"P5\n# a comment\n3 2\n255\n" + gray)
    assert (fmt, w, h, npx, lo, hi, ok) == ("P5", 3, 2, 6, 10, 60, True)
    assert abs(mean - 35.0) < 1e-9

    # 1x1 P5 16-bit: one big-endian sample 0x0102 = 258
    fmt, w, h, npx, mean, lo, hi, ok = _parse_netpbm(b"P5\n1 1\n65535\n" + bytes([1, 2]))
    assert (npx, lo, hi, ok) == (1, 258, 258, True)

    bad = [
        b"",  # empty
        b"JFIF....",  # wrong magic
        b"P6\n2 1\n255\n" + bytes([255, 0, 0]),  # truncated raster
        b"P6\n2 x\n255\n" + bytes(6),  # non-numeric dimension
        b"P6\n2 1\n",  # header cut short
        b"P6\n0 1\n255\n",  # zero width
    ]
    assert all(_parse_netpbm(p)[-1] is False for p in bad)


def test_decode_image_real_codec_distributed(spark):
    """decode_image over a mixed DataFrame: valid PPMs decode with exact
    stats; a malformed payload in the same batch comes back decode_ok=False
    without poisoning its neighbors."""
    from simple_stream_processor_spark.operators import multimodal

    rows = [
        (1, bytearray(b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0]))),
        (2, bytearray(b"P5\n2 2\n255\n" + bytes([1, 2, 3, 4]))),
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in multimodal.decode_image(df).collect()}
    assert got[1].decode_ok and (got[1].width, got[1].height, got[1].px_max) == (2, 1, 255)
    assert got[2].decode_ok and (got[2].format, got[2].n_pixels, got[2].px_mean) == ("P5", 4, 2.5)
    assert not got[3].decode_ok and got[3].format == "invalid"


def test_resize_ppm_real_nearest_neighbor(spark):
    """Real resize: a 2x2 P6 image upsampled to 4x4 must repeat each source
    pixel in a 2x2 block (nearest neighbor), come back as a VALID P6 that
    decode_image accepts, and downsample back to the original corners."""
    from simple_stream_processor_spark.operators import multimodal

    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 0])  # R G / B Y
    src = b"P6\n2 2\n255\n" + px
    df = spark.createDataFrame(
        [(1, "image", bytearray(src)), (2, "image", bytearray(b"junk"))],
        "media_id long, media_type string, payload binary",
    )
    up = {r.media_id: r for r in multimodal.resize_ppm(df, 4, 4).collect()}
    assert not up[2].resize_ok and bytes(up[2].payload) == b""
    assert up[1].resize_ok
    dec = {r.media_id: r for r in multimodal.decode_image(
        spark.createDataFrame([(1, bytearray(up[1].payload))], "media_id long, payload binary")
    ).collect()}
    assert (dec[1].format, dec[1].width, dec[1].height, dec[1].decode_ok) == ("P6", 4, 4, True)
    raster = bytes(up[1].payload)[len(b"P6\n4 4\n255\n"):]
    # row 0 must be R R G G
    assert raster[:12] == bytes([255, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0])

    # downsample 4x4 -> 2x2 returns the original corner pixels
    down = multimodal.resize_ppm(
        spark.createDataFrame([(1, "image", bytearray(up[1].payload))], "media_id long, media_type string, payload binary"),
        2,
        2,
    ).collect()[0]
    assert bytes(down.payload) == src


def test_sample_ppm_frames_ppm_pipe(spark):
    """Real frame sampling: a ppm-pipe payload of 4 concatenated 1x1 P6
    frames — sampling 2 picks evenly-spaced standalone frames, each a
    valid P6; an unparseable payload yields zero rows."""
    from simple_stream_processor_spark.operators import multimodal

    def frame(r):
        return b"P6\n1 1\n255\n" + bytes([r, 0, 0])

    pipe = b"".join(frame(r) for r in (10, 20, 30, 40))
    df = spark.createDataFrame(
        [(1, bytearray(pipe)), (2, bytearray(b"not ppm"))],
        "media_id long, payload binary",
    )
    rows = multimodal.sample_ppm_frames(df, 2).collect()
    assert {r.media_id for r in rows} == {1}
    got = sorted((r.frame_idx, bytes(r.frame_payload)[-3]) for r in rows)
    assert [r.n_frames for r in rows] == [4, 4]
    assert got == [(0, 10), (1, 30)]  # frames 0 and 2 of 4


def test_wav_parser_goldens():
    """The real WAV parser against hand-packed RIFF bytes: a valid PCM16
    file parses exactly; the malformed family (bad magic, truncated chunk,
    non-PCM format, odd data length) classifies decode_ok=False."""
    import struct

    from simple_stream_processor_spark.operators.multimodal import _parse_wav

    def wav(samples, rate=44100, channels=1, audio_format=1, bits=16):
        data = b"".join(struct.pack("<h", s) for s in samples)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, audio_format, channels, rate, rate * 2 * channels, 2 * channels, bits)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    rate, ch, n, lo, hi, mean, ok = _parse_wav(wav([-100, 0, 300], rate=8000))
    assert (rate, ch, n, lo, hi, ok) == (8000, 1, 3, -100, 300, True)
    assert abs(mean - 200 / 3) < 1e-9

    # stereo: n_samples is per channel
    assert _parse_wav(wav([1, 2, 3, 4], channels=2))[2] == 2

    bad = [
        b"",
        b"RIFX" + b"\x00" * 40,  # wrong magic
        wav([1, 2, 3])[:30],  # truncated
        wav([1, 2], audio_format=3),  # non-PCM
        wav([1, 2], bits=8),  # non-16-bit
    ]
    assert all(_parse_wav(p)[-1] is False for p in bad)


def test_text_to_wav_roundtrip(spark):
    """Build→decode round trip on a tiny corpus: the decoded sample stats
    equal the (byte-128)*256 arithmetic computed in plain Python."""
    from simple_stream_processor_spark.operators import multimodal

    docs = spark.createDataFrame([(1, "AB"), (2, "~")], "doc_id long, text string")
    got = {r.media_id: r for r in multimodal.decode_audio(multimodal.text_to_wav(docs)).collect()}
    a = [(ord(c) - 128) * 256 for c in "AB"]
    assert (got[1].n_samples, got[1].amp_min, got[1].amp_max) == (2, min(a), max(a))
    assert got[1].sample_rate == 8000 and got[1].decode_ok
    assert got[2].n_samples == 1 and got[2].amp_min == (ord("~") - 128) * 256


def test_bpe_merges_match_reference_trainer(spark, sf_dir):
    """The distributed BPE trainer must reproduce the textbook single-node
    algorithm exactly: same merges, same order, same counts (greedy
    left-to-right application, (count desc, pair asc) tie-break)."""
    from collections import Counter

    import duckdb

    from simple_stream_processor_spark.operators import text

    rounds = 8
    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    ]
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}

    def ref_merges():
        out = []
        for r in range(1, rounds + 1):
            pairs = Counter()
            for w, syms in vocab.items():
                f = words[w]
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] += f
            if not pairs:
                break
            (l, rgt), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((r, l, rgt, l + rgt, cnt))
            for w, syms in vocab.items():
                merged, i = [], 0
                while i < len(syms):
                    if merged and merged[-1] == l and syms[i] == rgt:
                        merged[-1] = l + rgt
                    else:
                        merged.append(syms[i])
                    i += 1
                vocab[w] = merged
        return out

    expected = ref_merges()
    got = [
        (r["round"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in text.bpe_merges(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), rounds=rounds
        ).collect()
    ]
    assert got == expected


def test_ahash_images_known_answer_and_malformed(spark):
    """Bit-level known answer: a 16x8 P6 whose left half is bright and
    right half dark must set exactly the 4x4 left-grid bits of each row
    (blocks 0-3, 8-11, 16-19, 24-27); malformed and non-grid payloads
    classify decode_ok=false instead of raising."""
    import numpy as np

    from simple_stream_processor_spark.operators import multimodal as M

    raster = np.zeros((8, 16, 3), dtype=np.uint8)
    raster[:, :8, :] = 200  # bright left half
    payload = b"P6\n16 8\n255\n" + raster.tobytes()
    bad = b"P6\n16 8\n255\nshort"
    nongrid = b"P6\n3 3\n255\n" + bytes(27)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(bad)), (3, bytearray(nongrid))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in M.ahash_images(df).collect()}
    expected = sum(1 << j for j in range(32) if (j % 8) < 4)
    assert rows[1].decode_ok and rows[1].phash == expected
    assert not rows[2].decode_ok and rows[2].phash == 0
    assert not rows[3].decode_ok  # 3x3 not a multiple of the 8x4 grid


def test_bpe_encode_matches_reference(spark, sf_dir):
    """Learn merges, encode the corpus, compare per-doc BPE token counts
    against a pure-Python train+encode on the same text."""
    from collections import Counter

    import duckdb

    from simple_stream_processor_spark.operators import text as T

    rounds = 8
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    words = Counter(w for _, t in docs for w in t.split(" ") if w)
    vocab = {w: list(w) for w in words}
    merge_list = []
    for _ in range(rounds):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        (l, r), _cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merge_list.append((l, r))
        for w, syms in vocab.items():
            merged = []
            for s in syms:
                if merged and merged[-1] == l and s == r:
                    merged[-1] = l + r
                else:
                    merged.append(s)
            vocab[w] = merged
    expected = {
        did: (
            len([w for w in t.split(" ") if w]),
            sum(len(vocab[w]) for w in t.split(" ") if w),
        )
        for did, t in docs
    }

    sdf = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = [(r["left"], r["right"]) for r in T.bpe_merges(sdf, rounds=rounds).collect()]
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in T.bpe_encode_counts(sdf, merges).collect()
    }
    assert got == expected


def test_bloom_no_false_negatives(spark, sf_dir):
    """Bloom's contract: a key that was inserted ALWAYS probes as present
    (all k bits set) in its own group's filter."""
    d = docs(spark, sf_dir).where(F.col("source") == "src0")
    words = dedup.bloom_words(d, F.col("text"), F.col("source"))
    probe = dedup.bloom_probe(words, d.select("text"), F.col("text"))
    rows = probe.where(F.col("bloom_group") == "src0").collect()
    assert len(rows) == d.select("text").distinct().count()
    assert all(r.n_ok == dedup.BLOOM_K for r in rows)


def test_bloom_merged_filter_is_superset(spark, sf_dir):
    """OR-merging word tables yields a filter whose bit set contains every
    source's bits — the mergeability that makes rollups 32 integer ORs."""
    words = dedup.bloom_words(docs(spark, sf_dir), F.col("text"), F.col("source"))
    merged = words.groupBy("word").agg(F.bit_or("bits").alias("mbits"))
    viol = (
        words.join(merged, "word")
        .where(F.col("bits").bitwiseAND(F.col("mbits")) != F.col("bits"))
        .count()
    )
    assert viol == 0


def test_kmeans_refinement_does_not_increase_inertia(spark, sf_dir):
    """Lloyd monotonicity: after one update+reassign round, total inertia
    is <= the inertia of the initial (per-label-mean) assignment, modulo
    the 6dp centroid rounding."""
    from pyspark.sql import functions as SF
    from simple_stream_processor_spark.tables import load_table, spread

    emb = load_table(spark, "embeddings", sf_dir)
    e = spread(emb, "vec_id").select("vec_id", SF.col("embedding").cast("array<double>").alias("v"))
    init = similarity.ivf_centroids(emb).select(SF.col("c_label").cast("long").alias("cid"), "cv")
    j0 = similarity.kmeans_assign(e, init).agg(SF.sum("d2")).collect()[0][0]
    j1 = similarity.kmeans_refine(emb, rounds=2).agg(SF.sum("d2")).collect()[0][0]
    assert j1 <= j0 + 1e-3


def test_semantic_dedup_pair_cost_shrinks_with_k(spark, sf_dir):
    """SemDeDup's 100 TB cost argument is executable: k is a real knob, and
    raising it caps the within-cluster pair cost Σₖn_k². At k=40 the cost
    must be strictly below the k=10 cost, every vector must keep exactly
    one assignment at both settings, and the k=40 clustering must actually
    use more than the fixtures' 10 labels' worth of clusters."""
    from pyspark.sql import functions as SF
    from simple_stream_processor_spark.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()

    def pair_cost(k):
        sizes = (
            similarity.kmeans_refine(emb, rounds=2, k=k)
            .groupBy("cluster").agg(SF.count(SF.lit(1)).alias("nk"))
            .collect()
        )
        assert sum(r.nk for r in sizes) == n  # partition: every vector exactly once
        return len(sizes), sum(r.nk * r.nk for r in sizes)

    k10_clusters, cost10 = pair_cost(10)
    k40_clusters, cost40 = pair_cost(40)
    assert cost40 < cost10
    assert k40_clusters > k10_clusters


def test_semantic_dedup_k_seeding_matches_default_keep_semantics(spark, sf_dir):
    """semantic_dedup(k=40) returns one row per vector with the same
    (kept ⇔ dup_of IS NULL) contract as the default-seeded variant."""
    from simple_stream_processor_spark.tables import load_table

    out = similarity.semantic_dedup(
        load_table(spark, "embeddings", sf_dir), rounds=2, tau=0.4, k=40
    ).collect()
    assert len(out) == len({r.vec_id for r in out})
    for r in out:
        assert r.kept == (r.dup_of is None)
        if r.dup_of is not None:
            assert r.dup_of < r.vec_id


def test_training_order_is_a_permutation(spark, sf_dir):
    """The two-level prefix-sum ordinal is a bijection onto 1..n and every
    batch holds at most 64 docs (exactly 64 for all but the last)."""
    from simple_stream_processor_spark.queries_llmdata import q_training_order

    out = q_training_order(spark, sf_dir).collect()
    n = len(out)
    assert sorted(r.ordinal for r in out) == list(range(1, n + 1))
    sizes = {}
    for r in out:
        sizes[r.batch_id] = sizes.get(r.batch_id, 0) + 1
    last = max(sizes)
    assert all(v == 64 for b, v in sizes.items() if b != last)
    assert sizes[last] <= 64


def test_weighted_sample_matches_python_reference(spark, sf_dir):
    """The Efraimidis-Spirakis top-50 equals a pure-Python replay of the
    same md5-derived uniforms and ln(u)/w keys — guards the hash/key
    arithmetic and the (key desc, doc_id) tie-break."""
    import hashlib
    import math

    from simple_stream_processor_spark.queries_llmdata import q_weighted_sample

    got = [r.doc_id for r in q_weighted_sample(spark, sf_dir).collect()]
    rows = docs(spark, sf_dir).select("doc_id", "n_chars").collect()
    keyed = []
    for r in rows:
        v = int(hashlib.md5(f"wsample:{r.doc_id}".encode()).hexdigest()[:8], 16)
        u = (v + 1) / 4294967297
        keyed.append((math.log(u) / r.n_chars, r.doc_id))
    want = [d for _, d in sorted(keyed, key=lambda t: (-t[0], t[1]))[:50]]
    assert got == want


def test_corpus_entropy_information_inequalities(spark, sf_dir):
    """Entropy is non-negative and bounded by ln(vocab); KL vs the corpus
    mix obeys Gibbs' inequality (>= 0 up to the 6dp rounding)."""
    import math

    from simple_stream_processor_spark.queries_llmdata import q_corpus_entropy

    for r in q_corpus_entropy(spark, sf_dir).collect():
        assert -1e-6 <= r.entropy <= math.log(r.vocab_size) + 1e-6
        assert r.kl_vs_corpus >= -1e-6


def test_ks_drift_bounds_and_self_consistency(spark, sf_dir):
    """KS D is a probability-scale statistic: 0 <= D <= 1, and n_source +
    n_rest equals the corpus size for every row."""
    from simple_stream_processor_spark.queries_llmdata import q_ks_drift

    rows = q_ks_drift(spark, sf_dir).collect()
    n_tot = docs(spark, sf_dir).count()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.ks_d <= 1.0
        assert r.n_source + r.n_rest == n_tot


def test_label_noise_bounds(spark, sf_dir):
    from simple_stream_processor_spark.queries_llmdata import q_label_noise

    rows = q_label_noise(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r.suspicion <= 1.0
        assert 0 <= r.n_diff <= 10


def test_minhash_recall_consistency(spark, sf_dir):
    """Caught counts can never exceed truth; high-J subset nests inside
    the full truth set; banding catches the planted true duplicates."""
    from simple_stream_processor_spark.queries_llmdata import q_minhash_recall

    r = q_minhash_recall(spark, sf_dir).collect()[0]
    assert 0 <= r.n_caught <= r.n_true
    assert r.n_caught_high <= r.n_true_high <= r.n_true
    assert 0.0 <= r.recall <= 1.0
    if r.n_true_high:
        assert r.recall_high >= 0.5  # high-similarity pairs are what banding is tuned for


def test_decision_stump_matches_python_histogram(spark, sf_dir):
    """The distributed stump equals a pure-Python replay of the identical
    32-bin histogram method (same binning arithmetic, same Gini, same
    tie-break) for every feature."""
    from simple_stream_processor_spark.queries_llmdata import q_decision_stump

    got = {r.feature: (r.best_bin, r.n_left, r.pos_left) for r in q_decision_stump(spark, sf_dir).collect()}

    rows = docs(spark, sf_dir).select("text", "lang", "n_chars").collect()
    stop = {"the", "a", "of", "and", "to", "in", "is", "it"}
    feats = {"n_chars": [], "n_tokens": [], "n_distinct": [], "n_stop": []}
    labels = []
    for r in rows:
        t = r.text.split(" ")
        feats["n_chars"].append(r.n_chars)
        feats["n_tokens"].append(len(t))
        feats["n_distinct"].append(len(set(t)))
        feats["n_stop"].append(sum(1 for x in t if x in stop))
        labels.append(1 if r.lang == "en" else 0)

    def gini(p, n):
        return 1.0 - (p / n) ** 2 - ((n - p) / n) ** 2

    for fname, vals in feats.items():
        lo, hi = min(vals), max(vals)
        bins = [((v - lo) * 32) // (hi - lo + 1) for v in vals]
        nt, pt = len(vals), sum(labels)
        hist = {}
        for b, y in zip(bins, labels):
            n, p = hist.get(b, (0, 0))
            hist[b] = (n + 1, p + y)
        best = None
        nl = pl = 0
        for b in sorted(hist):
            n, p = hist[b]
            nl, pl = nl + n, pl + p
            if 0 < nl < nt:
                g = gini(pt, nt) - (nl / nt) * gini(pl, nl) - ((nt - nl) / nt) * gini(pt - pl, nt - nl)
                cand = (round(g, 12), -b)
                if best is None or cand > best[0]:
                    best = (cand, b, nl, pl)
        assert got[fname] == (best[1], best[2], best[3]), fname


def test_dup_span_coverage_interval_union(spark):
    """Known fixture: doc 1 and doc 2 share a 10-token passage (three
    overlapping dup 8-grams → union = 10 tokens each, NOT 24), doc 3 is
    disjoint. Majority flag fires only where 2·dup ≥ n_tok."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, "s1", shared + " kilo lima mike november oscar papa quebec romeo sierra tango umber"),
        (2, "s2", "uniform victor whiskey xray yankee zulu one two " + shared),
        (3, "s1", "red orange yellow green blue indigo violet cyan magenta maroon"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r for r in dedup.dup_span_coverage(docs, n=8).collect()}

    # doc 1: 21 tokens, dup span = the 10 shared positions -> not majority
    # (2*10 < 21; NB exactly-half WOULD count: the flag is 2*dup >= n_tok)
    # doc 2: 18 tokens, dup span = 10 -> majority (2*10 >= 18)
    # doc 3: 10 tokens, 0 dup
    assert (got["s1"].n_docs, got["s1"].n_docs_dup, got["s1"].n_docs_majority) == (2, 1, 0)
    assert got["s1"].dup_tokens == 10 and got["s1"].total_tokens == 31
    assert (got["s2"].n_docs, got["s2"].n_docs_dup, got["s2"].n_docs_majority) == (1, 1, 1)
    assert got["s2"].dup_tokens == 10 and got["s2"].total_tokens == 18


def test_group_split_never_splits_a_duplicate_group(spark, sf_dir):
    """The leakage invariant: every content-digest group lands entirely
    on one side, and the assignment is deterministic across reruns."""
    from simple_stream_processor_spark.queries_llmdata import q_group_split

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.md5(F.encode(F.col("text"), "UTF-8")).alias("digest")
    )
    from pyspark.sql.window import Window

    rep = docs.select(
        "digest", F.min("doc_id").over(Window.partitionBy("digest")).alias("grp")
    ).distinct()
    sides = rep.select(
        "digest",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("split:"), F.col("grp").cast("string"))), 1, 8),
                16,
                10,
            ).cast("long")
            % 10
            < 8
        ).alias("is_train"),
    )
    # one side per digest by construction of the rep window; cross-check:
    assert sides.groupBy("digest").agg(F.countDistinct("is_train").alias("k")).where(
        F.col("k") > 1
    ).count() == 0

    a = {tuple(r) for r in q_group_split(spark, sf_dir).collect()}
    b = {tuple(r) for r in q_group_split(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_random_projection_sign_matrix_matches_sql():
    """The JL sign matrix both engines derive independently is the same
    matrix: Python hashlib parity == DuckDB md5 parity, and the ±1
    entries are near-balanced (a degenerate all-one matrix would make
    the projection a scaled sum, not a JL embedding)."""
    import duckdb

    from simple_stream_processor_spark.queries_llmdata import RP_IN_DIM, RP_OUT_DIM, _rp_signs

    signs = _rp_signs()
    sql = duckdb.sql(
        "SELECT i.range AS i, j.range AS j,"
        " CASE WHEN (('0x' || substr(md5('rp:' || i.range || ':' || j.range), 1, 8))::BIGINT % 2) = 0"
        " THEN 1.0 ELSE -1.0 END AS sgn"
        " FROM range(64) i, range(16) j"
    ).fetchall()
    for i, j, sgn in sql:
        assert signs[j][i] == sgn, (i, j)
    n_pos = sum(1 for row in signs for s in row if s > 0)
    total = RP_IN_DIM * RP_OUT_DIM
    assert 0.4 * total < n_pos < 0.6 * total


def test_random_projection_matches_python_replay(spark, sf_dir):
    """Projected coordinates == a pure-Python sequential-fold replay of
    v·s/√m for every vector (same index order, same 0.0 seed), and the
    plan is shuffle-free (narrow map over the scan)."""
    from simple_stream_processor_spark.queries_llmdata import (
        RP_OUT_DIM,
        _rp_signs,
        q_random_projection,
    )
    from simple_stream_processor_spark.tables import load_table

    out = {r.vec_id: r for r in q_random_projection(spark, sf_dir).collect()}
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, "embeddings", sf_dir).collect()
    }
    signs = _rp_signs()
    assert set(out) == set(vecs)
    for vid in list(sorted(vecs))[:50]:
        v = vecs[vid]
        for j in range(RP_OUT_DIM):
            acc = 0.0
            for a, b in zip(v, signs[j]):
                acc += a * b
            assert abs(out[vid][f"y{j}"] - round(acc / 4.0, 6)) < 1e-9, (vid, j)
    # narrow map: the only exchange allowed is spread()'s deliberate
    # small-file fan-out (REPARTITION_BY_NUM); no distribution-required
    # exchange (agg/join/window) may appear
    plan = q_random_projection(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ENSURE_REQUIREMENTS" not in plan, plan


def test_bm25_search_matches_python_replay(spark, sf_dir):
    """Top-20 BM25 hits == a textbook Python BM25 (k1=1.2, b=0.75,
    Lucene-style +1 idf) over the same corpus, including the ranking
    order."""
    import math

    from simple_stream_processor_spark.queries_llmdata import BM25_QUERY_TERMS, q_bm25_search
    from simple_stream_processor_spark.tables import load_table

    docs = {
        r.doc_id: [w for w in r.text.split(" ") if w]
        for r in load_table(spark, "documents", sf_dir).collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in BM25_QUERY_TERMS
    }
    expect = []
    for did, toks in docs.items():
        score, hits = 0.0, 0
        for t in sorted(BM25_QUERY_TERMS):
            tf = toks.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            score += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        if hits:
            expect.append((-score, did, hits))
    expect.sort()
    got = q_bm25_search(spark, sf_dir).collect()
    assert len(got) == min(20, len(expect))
    for row, (neg_s, did, hits) in zip(got, expect[:20]):
        assert row.doc_id == did and row.n_terms_hit == hits
        assert abs(row.bm25 - round(-neg_s, 6)) < 1e-9


def test_bigram_surprisal_matches_python_replay(spark, sf_dir):
    """Per-doc average surprisal == a pure-Python add-one bigram LM over
    the same corpus (identical counts, vocab, position-ordered fold)."""
    import math

    from simple_stream_processor_spark.queries_llmdata import q_bigram_surprisal
    from simple_stream_processor_spark.tables import load_table

    docs = {
        r.doc_id: [w for w in r.text.split(" ") if w]
        for r in load_table(spark, "documents", sf_dir).collect()
    }
    c2, c1, vocab = {}, {}, set()
    for toks in docs.values():
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    out = {r.doc_id: r for r in q_bigram_surprisal(spark, sf_dir).collect()}
    for did, toks in docs.items():
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            assert did not in out
            continue
        acc = 0.0
        for a, b in pairs:
            acc += -math.log((c2[(a, b)] + 1) / float(c1[a] + len(vocab)))
        r = out[did]
        assert r.n_bigrams == len(pairs)
        assert abs(r.avg_surprisal - round(acc / len(pairs), 6)) < 1e-9, did


def test_conformal_threshold_coverage_guarantee(spark, sf_dir):
    """The conformal guarantee, empirically: for every alpha the eval-side
    coverage is >= 1 - alpha (finite-sample, distribution-free), the
    threshold is an actual calibration score, and splits partition the
    corpus."""
    from simple_stream_processor_spark.queries_llmdata import q_conformal_threshold
    from simple_stream_processor_spark.tables import load_table

    rows = q_conformal_threshold(spark, sf_dir).collect()
    assert len(rows) == 3
    n_docs = load_table(spark, "documents", sf_dir).count()
    cal_scores = {
        r.n_chars
        for r in load_table(spark, "documents", sf_dir).where("doc_id % 2 = 0").select("n_chars").collect()
    }
    for r in rows:
        assert r.coverage >= 1 - r.alpha - 1e-9, (r.alpha, r.coverage)
        assert r.n_cal + r.n_eval == n_docs
        assert r.threshold in cal_scores


def test_jl_recall_sane_and_projection_preserves_neighbors(spark, sf_dir):
    """The JL harness returns one row per probe with recall in [0, 1],
    and the 16-d projection preserves enough geometry that mean
    recall@10 clearly beats the ~10/n random-overlap floor (the fixture
    embeddings are near-uniform, the hardest case for JL top-k
    preservation — the harness exists to MEASURE exactly this)."""
    from simple_stream_processor_spark.queries_llmdata import q_jl_recall
    from simple_stream_processor_spark.tables import load_table

    rows = q_jl_recall(spark, sf_dir).collect()
    assert len(rows) == 5
    n = load_table(spark, "embeddings", sf_dir).count()
    for r in rows:
        assert 0 <= r.n_hits <= 10
        assert abs(r.recall_at_10 - r.n_hits / 10.0) < 1e-9
    mean_recall = sum(r.recall_at_10 for r in rows) / len(rows)
    assert mean_recall > 3 * 10.0 / n, (mean_recall, n)


def test_wasserstein_drift_matches_python_and_bounds(spark, sf_dir):
    """W1 per source == a pure-Python EMD over the same binned ECDFs
    (same grid, same rest-of-corpus contrast), and 0 <= W1 <= 1 (the
    score axis is [0, 1] after the /1e4 rescale)."""
    from simple_stream_processor_spark.queries_llmdata import ks_score_bin, q_wasserstein_drift

    docs_df = docs(spark, sf_dir).select("source", ks_score_bin().alias("b")).collect()
    from collections import Counter, defaultdict

    per_src = defaultdict(Counter)
    for r in docs_df:
        per_src[r.source][r.b] += 1
    all_bins = sorted({r.b for r in docs_df})
    corpus = Counter()
    for c in per_src.values():
        corpus.update(c)
    n_tot = sum(corpus.values())
    expect = {}
    for src, c in per_src.items():
        n_s = sum(c.values())
        s_cum = c_cum = 0
        acc = 0.0
        for i, b in enumerate(all_bins):
            s_cum += c.get(b, 0)
            c_cum += corpus.get(b, 0)
            if i + 1 < len(all_bins):
                gap = abs(s_cum / n_s - (c_cum - s_cum) / (n_tot - n_s))
                acc += gap * (all_bins[i + 1] - b)
        expect[src] = round(acc / 10000.0, 6)
    got = {r.source: r.w1 for r in q_wasserstein_drift(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for src in got:
        assert abs(got[src] - expect[src]) < 1e-9, src
        assert 0.0 <= got[src] <= 1.0


def test_benford_audit_detects_uniform_prices(spark, sf_dir):
    """The audit works as an audit: the fixtures' uniform prices must
    FAIL Benford (summed chi2 far above the chi2_8 99th percentile of
    20.09), probabilities sum to ~1 on both sides, and the per-digit
    counts total the positive-price rows."""
    from simple_stream_processor_spark.queries_relational_ext import q_benford_audit
    from simple_stream_processor_spark.tables import load_table

    rows = q_benford_audit(spark, sf_dir).collect()
    assert [r.digit for r in sorted(rows, key=lambda r: r.digit)] == list(range(1, 10))
    n_pos = load_table(spark, "lineitem", sf_dir).where("l_extendedprice > 0").count()
    assert sum(r.n for r in rows) == n_pos
    assert abs(sum(r.observed_p for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_p for r in rows) - 1.0) < 1e-4
    assert sum(r.chi2_term for r in rows) > 20.09


def test_gini_matches_python_and_bounds(spark, sf_dir):
    """Gini per segment == the textbook formula computed in Python over
    the same per-customer cent sums, and 0 <= G < 1."""
    from collections import defaultdict

    from simple_stream_processor_spark.queries_relational_ext import q_gini_concentration
    from simple_stream_processor_spark.tables import load_table

    rows = load_table(spark, "orders", sf_dir).select(
        "o_orderpriority", "o_custkey", F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c")
    ).collect()
    per = defaultdict(lambda: defaultdict(int))
    for r in rows:
        per[r.o_orderpriority][r.o_custkey] += r.c
    got = {r.seg: r for r in q_gini_concentration(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for seg, cust in per.items():
        xs = sorted(cust.values())
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        expect = round(2.0 * six / (n * float(sx)) - (n + 1.0) / n, 6)
        assert abs(got[seg].gini - expect) < 1e-9, seg
        assert 0.0 <= got[seg].gini < 1.0
        assert got[seg].n_customers == n


def test_time_weighted_avg_matches_python(spark, sf_dir):
    """TWAP per (type, day) == a Python replay of the hold-until-next
    integral over the same millisecond timestamps."""
    from collections import defaultdict

    from simple_stream_processor_spark.queries_relational_ext import q_time_weighted_avg
    from simple_stream_processor_spark.tables import load_table

    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.unix_millis(F.date_trunc("day", F.col("ts"))).alias("day_ms"),
        F.unix_millis("ts").alias("t"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    ).collect()
    groups = defaultdict(list)
    for r in ev:
        groups[(r.event_type, r.day_ms)].append((r.t, r.event_id, r.c))
    got = {(r.event_type, r.day_ms): r for r in q_time_weighted_avg(spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for key, readings in groups.items():
        readings.sort()
        t_last = max(t for t, _, _ in readings)
        num = den = 0
        for i, (t, _, c) in enumerate(readings):
            t_next = readings[i + 1][0] if i + 1 < len(readings) else t_last
            num += c * (t_next - t)
            den += t_next - t
        r = got[key]
        assert r.n_readings == len(readings)
        if den == 0:
            assert r.twap is None
        else:
            assert abs(r.twap - round(num / (den * 100.0), 6)) < 1e-9, key


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    """Skyline == the O(n²) brute-force dominance filter: a part survives
    iff no other part has (price <=, size >=) with at least one strict."""
    from simple_stream_processor_spark.queries_relational_ext import q_skyline
    from simple_stream_processor_spark.tables import load_table

    pts = [
        (r.p_partkey, int(round(r.p_retailprice * 100)), r.p_size)
        for r in load_table(spark, "part", sf_dir).collect()
    ]
    expect = {
        pk
        for pk, pc, sz in pts
        if not any(
            (pc2 <= pc and sz2 >= sz and (pc2 < pc or sz2 > sz))
            for pk2, pc2, sz2 in pts
            if pk2 != pk
        )
    }
    got = {r.p_partkey for r in q_skyline(spark, sf_dir).collect()}
    assert got == expect
    # frontier property: sorted by price, sizes never decrease (equal
    # only for exact (price, size) twins, which neither dominate)
    rows = sorted(q_skyline(spark, sf_dir).collect(), key=lambda r: (r.price, r.size))
    sizes = [r.size for r in rows]
    assert sizes == sorted(sizes)


def test_bmp_parser_goldens():
    """The round-9 real codec (operators/multimodal.py:_parse_bmp) against
    hand-built BMPs: stride-unaligned width (padding excluded from stats),
    stride-aligned width, top-down (negative height), and the malformed
    family — every bad payload classifies decode_ok=False instead of
    raising."""
    import struct

    from simple_stream_processor_spark.operators.multimodal import (
        _bmp_header,
        _parse_bmp,
    )

    def bmp(width, height, rows, height_field=None):
        hdr = bytearray(_bmp_header(width, abs(height_field or height)))
        if height_field is not None:
            hdr[22:26] = struct.pack("<i", height_field)
        stride = ((width * 3 + 3) // 4) * 4
        body = b"".join(bytes(r) + b"\x00" * (stride - len(r)) for r in rows)
        return bytes(hdr) + body

    # 1x2 (3-byte rows pad to 4): padding zeros must NOT drag px_min/mean
    fmt, w, h, npx, mean, lo, hi, ok = _parse_bmp(
        bmp(1, 2, [[10, 20, 30], [40, 50, 60]])
    )
    assert (fmt, w, h, npx, lo, hi, ok) == ("BMP", 1, 2, 2, 10, 60, True)
    assert abs(mean - 35.0) < 1e-9

    # 4x1 stride-aligned (12-byte row, no padding)
    fmt, w, h, npx, mean, lo, hi, ok = _parse_bmp(bmp(4, 1, [list(range(12))]))
    assert (fmt, w, h, npx, lo, hi, ok) == ("BMP", 4, 1, 4, 0, 11, True)

    # top-down BMP: height field -2, same stats as the bottom-up twin
    td = _parse_bmp(bmp(1, 2, [[10, 20, 30], [40, 50, 60]], height_field=-2))
    assert td[:4] == ("BMP", 1, 2, 2) and td[-1] is True
    assert abs(td[4] - 35.0) < 1e-9

    good = bmp(1, 1, [[1, 2, 3]])
    bad = [
        b"",  # empty
        b"PNG" + good[3:],  # wrong magic
        good[:-2],  # truncated raster
        good[:28] + struct.pack("<H", 8) + good[30:],  # 8bpp (palette) unsupported
        good[:30] + struct.pack("<I", 1) + good[34:],  # BI_RLE8 compression
        good[:18] + struct.pack("<i", 0) + good[22:],  # zero width
        good[:10] + struct.pack("<I", 10) + good[14:],  # offset inside the headers
    ]
    assert all(_parse_bmp(p)[-1] is False for p in bad)


def test_decode_bmp_real_codec_distributed(spark):
    """decode_bmp over a mixed DataFrame: documents_as_bmp payloads decode
    with exact stats (padding stripped); a malformed payload in the same
    batch classifies decode_ok=False without failing the scan."""
    from simple_stream_processor_spark.operators.multimodal import (
        decode_bmp,
        documents_as_bmp,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "zz")], "doc_id long, text string"
    )
    media = documents_as_bmp(docs, width=15, height=8)
    rows = {r.media_id: r for r in decode_bmp(media).collect()}
    r1 = rows[1]
    assert (r1.format, r1.width, r1.height, r1.n_pixels, r1.decode_ok) == ("BMP", 15, 8, 120, True)
    # 'abc' cycled to 360 bytes: mean = (97+98+99)/3, min=97, max=99
    assert abs(r1.px_mean - 98.0) < 1e-9 and (r1.px_min, r1.px_max) == (97, 99)
    assert rows[2].px_min == 122 and rows[2].px_max == 122

    mixed = spark.createDataFrame(
        [(7, bytearray(b"not a bmp"))], "media_id long, payload binary"
    )
    bad = decode_bmp(mixed).collect()[0]
    assert bad.decode_ok is False and bad.format == "invalid"


def test_png_parser_goldens():
    """The round-9 compressed codec (operators/multimodal.py:_parse_png)
    against hand-built PNGs: Sub-filter roundtrip (unfiltering is load-
    bearing), None/Up filter rows, CRC verification, and the malformed
    family — every bad payload classifies decode_ok=False, never raises."""
    import struct
    import zlib

    import numpy as np

    from simple_stream_processor_spark.operators.multimodal import (
        _parse_png,
        _png_chunk,
        _PNG_SIG,
        encode_png,
    )

    rng = np.random.default_rng(42)
    s = rng.integers(0, 256, 13 * 9 * 3, dtype=np.uint8)
    good = encode_png(s, 13, 9)
    fmt, w, h, npx, mean, lo, hi, ok = _parse_png(good)
    assert (fmt, w, h, npx, ok) == ("PNG", 13, 9, 117, True)
    assert abs(mean - s.mean()) < 1e-9 and (lo, hi) == (int(s.min()), int(s.max()))

    # hand-built stream with filter types 0 (None) then 2 (Up): row2 = raw2 + row1
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    row1 = bytes([10, 20, 30, 40, 50, 60])
    row2_raw = bytes([1, 2, 3, 4, 5, 6])  # decodes to 11,22,33,44,55,66
    scan = b"\x00" + row1 + b"\x02" + row2_raw
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    fmt, w, h, npx, mean, lo, hi, ok = _parse_png(payload)
    expect = list(row1) + [11, 22, 33, 44, 55, 66]
    assert (fmt, w, h, npx, ok) == ("PNG", 2, 2, 4, True)
    assert abs(mean - sum(expect) / 12.0) < 1e-9 and (lo, hi) == (min(expect), max(expect))

    # corrupt one IDAT byte -> CRC mismatch must classify, not raise
    idat_pos = good.index(b"IDAT") + 4
    corrupted = good[:idat_pos] + bytes([good[idat_pos] ^ 0xFF]) + good[idat_pos + 1 :]
    bad = [
        b"",
        b"BM" + good[2:],  # wrong magic
        good[:-6],  # truncated IEND
        corrupted,  # CRC mismatch
        _PNG_SIG + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)),  # palette
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", b"not zlib")
        + _png_chunk(b"IEND", b""),  # inflate failure
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x05" + row1 + b"\x00" + row2_raw))
        + _png_chunk(b"IEND", b""),  # unsupported filter type 5
    ]
    assert all(_parse_png(p)[-1] is False for p in bad)


def test_decode_png_real_codec_distributed(spark):
    """decode_png over a mixed DataFrame: documents_as_png payloads survive
    the full compress -> CRC -> inflate -> unfilter roundtrip with exact
    stats; a malformed payload in the same batch classifies decode_ok=False
    without failing the scan."""
    from simple_stream_processor_spark.operators.multimodal import (
        decode_png,
        documents_as_png,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "zz")], "doc_id long, text string"
    )
    media = documents_as_png(docs, width=13, height=9)
    rows = {r.media_id: r for r in decode_png(media).collect()}
    r1 = rows[1]
    assert (r1.format, r1.width, r1.height, r1.n_pixels, r1.decode_ok) == ("PNG", 13, 9, 117, True)
    # 'abc' cycled to 351 bytes = 117 full cycles: mean = 98 exactly
    assert abs(r1.px_mean - 98.0) < 1e-9 and (r1.px_min, r1.px_max) == (97, 99)
    assert rows[2].px_min == 122 and rows[2].px_max == 122

    mixed = spark.createDataFrame(
        [(7, bytearray(b"\x89PNG but not really"))], "media_id long, payload binary"
    )
    bad = decode_png(mixed).collect()[0]
    assert bad.decode_ok is False and bad.format == "invalid"


def test_png_bomb_and_multibyte_guards(spark):
    """Review findings pinned: (1) a DEFLATE bomb (valid 2x2 IHDR, ~200 MB
    of compressed zeros) must CLASSIFY decode_ok=False via the bounded
    decompressobj, not inflate to gigabytes; (2) a document with multibyte
    text must not crash the encode scan — the builder truncates to the
    exact byte budget (the BMP degrade-don't-crash behavior)."""
    import struct
    import time
    import zlib

    from simple_stream_processor_spark.operators.multimodal import (
        _parse_png,
        _png_chunk,
        _PNG_SIG,
        decode_png,
        documents_as_png,
    )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (200 * 1024 * 1024), 9))
        + _png_chunk(b"IEND", b"")
    )
    t0 = time.time()
    assert _parse_png(bomb)[-1] is False
    # Generous bound: actually inflating the ~200 MB bomb takes well over
    # this on any host, while the max_length-guarded reject is <1 ms — the
    # slack absorbs loaded-CI scheduling noise without weakening the pin.
    assert time.time() - t0 < 10.0, "bomb guard must reject without inflating"

    # absurd declared dimensions reject before any allocation
    huge = _PNG_SIG + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0))
    assert _parse_png(huge)[-1] is False

    docs = spark.createDataFrame([(1, "café"), (2, "plain")], "doc_id long, text string")
    rows = {r.media_id: r for r in decode_png(documents_as_png(docs, width=13, height=9)).collect()}
    assert rows[2].decode_ok is True  # ascii neighbor unaffected
    assert rows[1].decode_ok is True  # multibyte doc encodes (truncated), scan survives


def test_gif_lzw_goldens():
    """The round-10 LZW pair (operators/multimodal.py:_lzw_compress_gif /
    _lzw_decompress_gif) against an INDEPENDENTLY computed bit-packing
    golden: codes [CLEAR, 65, 66, 66, 65, EOI] at 9 bits, LSB-first — the
    literal below was produced by a separate packer implementation, so a
    convention drift (MSB-first, early-change width growth) breaks here
    even though encoder+decoder would stay self-consistent.  Plus the
    roundtrip soak: width growth past 9 bits, dictionary reset at 4096,
    KwKwK chains, and the decode-side expansion (bomb) guard."""
    import random

    from simple_stream_processor_spark.operators.multimodal import (
        _lzw_compress_gif,
        _lzw_decompress_gif,
    )

    golden = bytes.fromhex("00830811122420")
    assert _lzw_compress_gif(b"ABBA") == golden
    assert _lzw_decompress_gif(golden, max_out=4) == b"ABBA"

    rng = random.Random(7)
    for n in (0, 1, 5, 360, 5000, 120_000):  # 120k random forces 12-bit + reset
        data = bytes(rng.randrange(256) for _ in range(n))
        assert _lzw_decompress_gif(_lzw_compress_gif(data), max_out=n) == data
    for pat in (b"a" * 100_000, b"ab" * 50_000, bytes(range(256)) * 400):
        assert _lzw_decompress_gif(_lzw_compress_gif(pat), max_out=len(pat)) == pat
    # expansion guard: the same stream with a smaller cap must classify
    assert _lzw_decompress_gif(_lzw_compress_gif(b"x" * 10_000), max_out=100) is None
    # truncated stream (no EOI) must classify
    enc = _lzw_compress_gif(b"hello world hello world")
    assert _lzw_decompress_gif(enc[:-2], max_out=64) is None


def test_gif_parser_goldens():
    """The round-10 GIF87a container (operators/multimodal.py:_parse_gif)
    against encode_gif roundtrips and the malformed family — every bad
    payload classifies decode_ok=False, never raises."""
    import random
    import struct

    import numpy as np

    from simple_stream_processor_spark.operators.multimodal import (
        _parse_gif,
        encode_gif,
    )

    rng = random.Random(7)
    idx = np.frombuffer(bytes(rng.randrange(256) for _ in range(360)), dtype="u1")
    good = encode_gif(idx, 20, 18)
    fmt, w, h, npx, mean, lo, hi, ok = _parse_gif(good)
    assert (fmt, w, h, npx, ok) == ("GIF", 20, 18, 360, True)
    assert abs(mean - float(idx.mean())) < 1e-9 and (lo, hi) == (int(idx.min()), int(idx.max()))

    desc = 13 + 768  # magic + logical screen descriptor + 256-entry palette
    assert good[desc] == 0x2C
    bad = [
        b"",
        b"GIF89a" + good[6:],                     # wrong version magic
        good[:40],                                # truncated in the palette
        good[:-1],                                # missing trailer
        good[:desc] + b"\x2d" + good[desc + 1:],  # clobbered image descriptor
        good[:desc + 9] + b"\x40" + good[desc + 10:],   # interlace flag
        good[:desc + 10] + b"\x07" + good[desc + 11:],  # wrong min code size
        good[:13] + good[13 + 768:],              # palette ripped out
    ]
    # absurd declared dimensions: the 16 Mpx guard classifies pre-decode
    huge = bytearray(good)
    huge[desc + 5 : desc + 9] = struct.pack("<HH", 65535, 65535)
    bad.append(bytes(huge))
    # one flipped LZW byte: classifies (stream or index-count invalid)
    flip = bytearray(good)
    flip[desc + 15] ^= 0xFF
    bad.append(bytes(flip))
    assert all(_parse_gif(p)[-1] is False for p in bad)


def test_decode_gif_real_codec_distributed(spark):
    """decode_gif over a mixed DataFrame: documents_as_gif payloads survive
    the full LZW compress -> sub-block -> decode roundtrip with exact
    stats; a malformed payload in the same batch classifies
    decode_ok=False without failing the scan."""
    from simple_stream_processor_spark.operators.multimodal import (
        decode_gif,
        documents_as_gif,
    )

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog", "en", "s0", 44),
         (1, "zzzzzzzz", "en", "s0", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = documents_as_gif(docs, width=20, height=18)
    rows = {r.media_id: r for r in decode_gif(media).collect()}
    assert rows[0].decode_ok is True and rows[0].n_pixels == 360
    # doc 1 cycles 'z' (=122): constant raster, stats pin the palette map
    assert rows[1].px_min == 122 and rows[1].px_max == 122 and rows[1].decode_ok

    mixed = media.unionByName(
        spark.createDataFrame([(99, bytearray(b"NOTAGIF"))], "media_id long, payload binary")
    )
    out = {r.media_id: r for r in decode_gif(mixed).collect()}
    assert out[99].decode_ok is False and out[99].format == "invalid"
    assert out[0].decode_ok is True
