"""Similarity search over embedding columns (SURVEY §2.8 N12).

Two paths, same result contract (top-k by cosine, deterministic tie-break):
- **Brute force** (baseline): cosine against every vector. Correct at any
  recall; O(n·d) per probe. Fine for reranking or tiny corpora; at 100 TB
  it is the *verification* path, not the serving path.
- **Bucketed ANN** (scale path): deterministic sign-LSH — bucket id =
  sign bits of the first B dimensions (axis-aligned hyperplanes). Probe
  searches its own bucket plus all buckets within Hamming distance 1
  (B+1 buckets), i.e. `nprobe = B+1` in IVF terms. Candidates shrink by
  ~2^B/(B+1); recall is partial by design — the oracle runs the SAME
  algorithm, so the check verifies the distributed implementation, not
  exhaustive recall.

Both paths keep the arithmetic in sequential-fold doubles so Spark and
DuckDB produce bit-identical similarities (no round needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simple_stream_processor_spark.registry import scoped_persist

from simple_stream_processor_spark.operators.dedup import cosine
from simple_stream_processor_spark.tables import spread

N_LSH_BITS = 6


def probe_vector(emb: DataFrame, probe_id: int) -> DataFrame:
    """One-row DataFrame with the probe's embedding as array<double> —
    broadcast into the scan side, so the probe never forces a shuffle."""
    return emb.where(F.col("vec_id") == probe_id).select(F.col("embedding").cast("array<double>").alias("probe_v"))


def cosine_topk(emb: DataFrame, probe_id: int, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k vs one probe vector. Plan: broadcast
    1-row probe → narrow map computing cosine → TakeOrderedAndProject.
    No shuffle of the corpus at any scale."""
    probe = probe_vector(emb, probe_id)
    scored = (
        spread(emb, "vec_id").where(F.col("vec_id") != probe_id)
        .join(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            cosine(F.col("embedding").cast("array<double>"), F.col("probe_v")).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def lsh_bucket(vec: Column, n_bits: int = N_LSH_BITS) -> Column:
    """Deterministic sign-LSH bucket: bit i = (v[i] >= 0). Axis-aligned
    hyperplanes — engine-portable (no RNG), and at scale replaced by a
    learned rotation with the same bucket-arithmetic shape."""
    bucket = None
    for i in range(n_bits):
        term = F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = term if bucket is None else bucket + term
    return bucket


def ann_bucketed_topk(emb: DataFrame, probe_id: int, k: int = 10, n_bits: int = N_LSH_BITS) -> DataFrame:
    """Bucketed ANN top-k: search the probe's bucket plus Hamming-1
    neighbors. Candidate filter is a broadcast semi-join on bucket id —
    the corpus is scanned once, with (n_bits+1)/2^n_bits selectivity."""
    e = spread(emb, "vec_id").select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v")).withColumn(
        "bucket", lsh_bucket(F.col("v"), n_bits)
    )
    probe = e.where(F.col("vec_id") == probe_id).select(
        F.col("v").alias("probe_v"), F.col("bucket").alias("probe_bucket")
    )
    cand = (
        e.where(F.col("vec_id") != probe_id)
        .join(F.broadcast(probe))
        .where(F.bit_count(F.col("bucket").bitwiseXOR(F.col("probe_bucket"))) <= 1)
    )
    scored = cand.select("vec_id", "label", "bucket", cosine(F.col("v"), F.col("probe_v")).alias("cos_sim"))
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def ivf_centroids(emb: DataFrame) -> DataFrame:
    """Deterministic coarse-quantizer centroids: per-label dimension means
    (the label is the training assignment a k-means would produce; using it
    keeps the quantizer engine-portable — no RNG, no iteration — while the
    query shape is exactly IVF). posexplode → (label, pos) mean → ordered
    re-assembly. The n×d explode never crosses the wire: the per-(label,
    pos) average combines map-side, so the exchange carries k×d partials —
    the same bytes a d-wide aggregate would move, without the d-wide
    codegen (measured ~2.5s of compile for d=64, paid per plan). Centroid
    components round to 6dp so Spark's partial-agg summation order and the
    oracle's sequential sum agree exactly."""
    ex = spread(emb, "vec_id").select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"))
    long = ex.groupBy("label", "pos").agg(F.round(F.avg("x"), 6).alias("c"))
    return (
        long.groupBy("label")
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]).alias("cv"))
        .select(F.col("label").alias("c_label"), "cv")
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Inverted lists: each vector joins its nearest centroid (cosine,
    c_label tie-break). Centroids broadcast (they are k rows); the argmax
    is one keyed window — at petabyte scale swap for a max-by-struct
    aggregation to skip the per-key sort."""
    from pyspark.sql import Window

    e = spread(emb, "vec_id").select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    sims = e.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "label", "v", "c_label", cosine(F.col("v"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("c_label").asc())
    return sims.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select(
        "vec_id", "label", "v", "c_label"
    )


def ann_ivf_topk(emb: DataFrame, probe_id: int, k: int = 10, nprobe: int = 3) -> DataFrame:
    """IVF ANN top-k: rank centroids against the probe, search only the
    ``nprobe`` nearest inverted lists, exact cosine within them.

    This is the serving shape that scales: the corpus is scanned once to
    build lists (amortized across probes in production — the lists are the
    index), and each probe touches nprobe/k_clusters of the data. Recall
    is partial by design; the oracle runs the identical algorithm, so the
    gate verifies the distributed implementation."""
    cents = scoped_persist(ivf_centroids(emb))
    inv = ivf_assign(emb, cents)
    probe = emb.where(F.col("vec_id") == probe_id).select(
        F.col("embedding").cast("array<double>").alias("pv")
    )
    pc = (
        cents.crossJoin(F.broadcast(probe))
        .select("c_label", cosine(F.col("cv"), F.col("pv")).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("c_label").asc())
        .limit(nprobe)
        .select("c_label")
    )
    cand = inv.join(F.broadcast(pc), "c_label").where(F.col("vec_id") != probe_id)
    scored = cand.crossJoin(F.broadcast(probe)).select(
        "vec_id", "label", cosine(F.col("v"), F.col("pv")).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def quantize_int8_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector scalar quantization (8-bit min/max) with reconstruction
    error — the storage-compression step for embedding columns at corpus
    scale (4 bytes/dim float32 → 1 byte/dim, 4x smaller shuffle/scan for
    the ANN paths that tolerate ~scale/2 absolute error).

    Every operand is cast to double BEFORE any arithmetic: float32 math
    then promotion gives different bits than promotion then math, and the
    oracle compare needs bit-identical doubles across engines. Pure
    column expressions (transform/aggregate) — narrow, scan-speed, no
    Python boundary."""
    d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mn, mx = F.array_min(d), F.array_max(d)
    scale = (mx - mn) / F.lit(255.0)
    q = F.transform(d, lambda x: F.round((x - mn) / scale, 0))
    errs = F.zip_with(q, d, lambda qi, xi: F.abs(mn + qi * scale - xi))
    n = F.size(errs).cast("double")
    return emb.select(
        "vec_id",
        F.round(scale, 9).alias("scale"),
        F.round(F.array_max(errs), 9).alias("max_abs_err"),
        F.round(F.aggregate(errs, F.lit(0.0), lambda acc, x: acc + x) / n, 9).alias("mean_abs_err"),
    )


def batch_cosine_topk(emb: DataFrame, n_probes: int = 5, k: int = 3) -> DataFrame:
    """Batch-probe cosine top-k: score ``n_probes`` query vectors against
    the corpus in ONE pass, returning each probe's top-``k`` — the
    online-serving shape (requests arrive in batches; scoring the batch
    amortizes the corpus scan across all probes).

    Plan: the probe set broadcasts (rows × dim floats — KB), the corpus
    side computes all probe scores in a narrow crossJoin stage (corpus
    never shuffles), and the per-probe top-k is a WindowGroupLimit rank
    filter — per-partition heaps per probe, no global sort. Scaling in
    batch size is linear in FLOPs, constant in data movement.
    """
    probes = (
        emb.where(F.col("vec_id") < n_probes)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").cast("array<double>").alias("probe_v"),
        )
    )
    scored = (
        spread(emb, "vec_id").where(F.col("vec_id") >= n_probes)
        .crossJoin(F.broadcast(probes))
        .select(
            "probe_id",
            "vec_id",
            "label",
            cosine(F.col("embedding").cast("array<double>"), F.col("probe_v")).alias("cos_sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def hard_negatives(emb: DataFrame, n_probes: int = 5, k: int = 3) -> DataFrame:
    """Hard-negative mining for contrastive training: per probe, the top-k
    most-similar corpus vectors whose label DIFFERS from the probe's — the
    near-miss examples a retrieval/embedding trainer wants in the batch.

    Same scale shape as batch_cosine_topk (probes broadcast, corpus never
    shuffles, per-probe top-k is a WindowGroupLimit rank filter); the label
    inequality rides the narrow scoring stage, so mining cost equals one
    corpus scan regardless of probe count."""
    probes = emb.where(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("embedding").cast("array<double>").alias("probe_v"),
    )
    scored = (
        spread(emb, "vec_id")
        .where(F.col("vec_id") >= n_probes)
        .crossJoin(F.broadcast(probes))
        .where(F.col("label") != F.col("probe_label"))
        .select(
            "probe_id",
            "probe_label",
            "vec_id",
            "label",
            cosine(F.col("embedding").cast("array<double>"), F.col("probe_v")).alias("cos_sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — the same left-to-right expression tree
    DuckDB's list_dot_product evaluates, so both engines produce
    bit-identical doubles (the q_pq_codes determinism contract)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, t: acc + t)


def kmeans_assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Narrow Lloyd assignment: pack the k centroids into ONE row
    (array<struct<cid,cv,cc>>), broadcast it, and argmin per vector with
    array_sort over the per-centroid (d2, cid) structs — struct ordering
    gives the deterministic (distance asc, cid asc) tie-break.

    Distances use the 3-dot expansion |v-c|² = v·v − 2 v·c + c·c with the
    loop-invariant dots hoisted: v·v once per row, c·c once per centroid at
    packing time — bit-identical to recomputing them (same value, fewer
    folds), so the oracle can still write plain list_dot_product three
    times. Per-row work is k fold-dots instead of 3k.

    Unlike the rank-window argmin in ivf_assign, this never shuffles the
    corpus: assignment is pure array math in the scan stage, so each Lloyd
    round costs one corpus scan plus a k×d aggregate. The packing aggregate
    is the plan's only single-partition exchange and carries k rows.

    ``e`` must have columns (vec_id, v: array<double>); ``cents`` must have
    (cid: long, cv: array<double>)."""
    with_cc = cents.select("cid", "cv", _dot(F.col("cv"), F.col("cv")).alias("cc"))
    packed = with_cc.agg(F.array_sort(F.collect_list(F.struct("cid", "cv", "cc"))).alias("cs"))
    best = F.element_at(
        F.array_sort(
            F.transform(
                F.col("cs"),
                lambda c: F.struct(
                    (F.col("vv") - F.lit(2.0) * _dot(F.col("v"), c["cv"]) + c["cc"]).alias("d2"),
                    c["cid"].alias("cid"),
                ),
            )
        ),
        1,
    )
    return (
        e.crossJoin(F.broadcast(packed))
        .withColumn("vv", _dot(F.col("v"), F.col("v")))
        .withColumn("best", best)
        .select("vec_id", "v", F.col("best.cid").alias("cluster"), F.col("best.d2").alias("d2"))
    )


def kmeans_update(assigned: DataFrame) -> DataFrame:
    """Lloyd update: new centroid = per-cluster dimension mean, built with
    the ivf_centroids posexplode shape (the n×d explode combines map-side;
    the exchange carries k×d partial rows). Components round to 6dp so
    Spark's partial-sum order and the oracle's sequential sum agree
    exactly. Clusters that lost every member disappear (both engines drop
    empty groups — deterministic)."""
    ex = assigned.select(F.col("cluster").alias("cid"), F.posexplode("v").alias("pos", "x"))
    long = ex.groupBy("cid", "pos").agg(F.round(F.avg("x"), 6).alias("c"))
    return long.groupBy("cid").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]).alias("cv")
    )


def kmeans_seed_buckets(emb: DataFrame, k: int) -> DataFrame:
    """Deterministic seeds for ARBITRARY k: bucket each vector by
    ``vec_id % k`` and take per-bucket dimension means (6dp, the shared
    engine-portable rounding). No RNG, no iteration, and — unlike the
    per-label means of ivf_centroids — k is a free knob, which is what
    lets SemDeDup cap its within-cluster pair cost (Σₖn_k²) at corpus
    scale by raising k. The modular buckets are near-uniform over a dense
    id space, so every seed is a mean of ~n/k spread-out vectors — a
    standard sharded-mean init. Plan shape identical to ivf_centroids:
    narrow posexplode, map-side-combined (cid, pos) average, k×d partial
    rows on the wire, k-row output."""
    ex = spread(emb, "vec_id").select(
        (F.col("vec_id") % F.lit(k)).cast("long").alias("cid"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    long = ex.groupBy("cid", "pos").agg(F.round(F.avg("x"), 6).alias("c"))
    return long.groupBy("cid").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]).alias("cv")
    )


def kmeans_refine(emb: DataFrame, rounds: int = 2, k: int | None = None) -> DataFrame:
    """Distributed k-means (Lloyd) refinement: seed deterministically —
    per-label means (ivf_centroids) when ``k`` is None (the engine-portable
    init that needs no RNG and matches the IVF coarse quantizer), or
    ``vec_id % k`` bucket means (kmeans_seed_buckets) for an arbitrary
    caller-chosen k — then run ``rounds`` genuine assign→update iterations
    and return the final per-vector assignment (vec_id, cluster, d2).

    This is the semantic-clustering primitive (SemDeDup-style curation,
    IVF codebook training) at its 100 TB shape: centroids are always k
    rows broadcast outward; each round reads the corpus once for the
    narrow assignment and once for the k×d update aggregate; nothing
    record-level ever shuffles. Unrolling a fixed round count keeps the
    whole refinement one declarative plan (no driver loop state), and
    determinism end-to-end (mean rounding + struct tie-breaks) makes the
    result hash-checkable against a SQL oracle that unrolls the same
    rounds."""
    e = spread(emb, "vec_id").select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    if k is None:
        cents = ivf_centroids(emb).select(F.col("c_label").cast("long").alias("cid"), "cv")
    else:
        cents = kmeans_seed_buckets(emb, k)
    # rounds=2 ≡ assign(c0) → update → final assign: the returned d2 is
    # measured against the last-updated centroids
    for _ in range(rounds - 1):
        cents = kmeans_update(kmeans_assign(e, cents))
    return kmeans_assign(e, cents)


def semantic_dedup(emb: DataFrame, rounds: int = 2, tau: float = 0.4, k: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-partition
    the embedding space, then prune near-duplicates WITHIN each cluster by
    pairwise cosine — the semantic analog of MinHash dedup for training
    data, catching paraphrases exact/fuzzy text dedup misses.

    Keep rule (deterministic): a vector is pruned iff some same-cluster
    vector with a SMALLER vec_id has cosine >= tau; ``dup_of`` records the
    smallest such id. Lowest-id-wins needs no rank window and cannot
    flicker under ties.

    100 TB shape: the clustering reuses kmeans_refine (centroids broadcast,
    corpus never shuffles during assignment); the pairwise stage shuffles
    ONCE on cluster id and compares only within clusters — cost is
    sum_k(n_k^2)/2, bounded by the cluster granularity. ``k`` is a real
    knob (kmeans_seed_buckets gives deterministic seeds for any k):
    raising it caps the pair cost — SemDeDup's paper runs k in the tens
    of thousands for exactly this reason; k=None falls back to the
    per-label seeding shared with q_kmeans. Never all-pairs over the
    corpus. Cosines are sequential-fold dots on both engines, so the tau
    frontier is bit-stable.

    Returns (vec_id, cluster, kept, dup_of)."""
    assigned = (
        kmeans_refine(emb, rounds=rounds, k=k)
        .select(
            "vec_id",
            "v",
            "cluster",
            # norm hoisted per VECTOR: computing it inside the pair join
            # would redo each 64-dim fold n_k times per cluster
            F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nv"),
        )
        # three consumers below (pair-join both sides + keep-rule join);
        # without lineage truncation each re-executes the Lloyd rounds
        .localCheckpoint(eager=False)
    )
    a = assigned.select("cluster", F.col("vec_id").alias("a_id"), F.col("v").alias("va"), F.col("nv").alias("na"))
    b = assigned.select("cluster", F.col("vec_id").alias("b_id"), F.col("v").alias("vb"), F.col("nv").alias("nb"))
    # try_divide: a zero-norm vector is outside the embedding contract,
    # but ANSI (the driver default) must degrade to SQL NULL (pair simply
    # not a duplicate — DuckDB's x/0.0), never crash the job
    cos = F.try_divide(_dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb"))
    dup = (
        a.join(b, "cluster")
        .where(F.col("b_id") < F.col("a_id"))
        .where(cos >= F.lit(tau))
        .groupBy("a_id")
        .agg(F.min("b_id").alias("dup_of"))
    )
    return (
        assigned.join(dup, assigned.vec_id == dup.a_id, "left")
        .select(
            "vec_id",
            "cluster",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
    )


def pq_subspaces(emb: DataFrame, m: int = 4, w: int = 16) -> DataFrame:
    """Split each embedding into M contiguous subvectors: one row per
    (vec_id, label, s, sv). Narrow explode of an M-element array."""
    e = spread(emb, "vec_id").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return e.select(
        "vec_id",
        "label",
        F.explode(
            F.array(*[F.struct(F.lit(s).alias("s"), F.slice("v", s * w + 1, w).alias("sv")) for s in range(m)])
        ).alias("t"),
    ).select("vec_id", "label", F.col("t.s").alias("s"), F.col("t.sv").alias("sv"))


def pq_codebooks(subs: DataFrame) -> DataFrame:
    """Per-(label, subspace) codebook centroids — deterministic per-label
    subvector means (the engine-portable k-means stand-in shared with
    IVF). One posexplode aggregate builds all M codebooks map-side; the
    exchange carries k×M×d partial rows. Components round to 6dp so both
    engines agree exactly."""
    ex = subs.select("label", "s", F.posexplode("sv").alias("pos", "x"))
    cbl = ex.groupBy("label", "s", "pos").agg(F.round(F.avg("x"), 6).alias("c"))
    return (
        cbl.groupBy("label", "s")
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda st: st["c"]).alias("cv"))
        .select(F.col("label").alias("cb_label"), "s", "cv")
    )


def pq_assign(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """Assign each (vec, subspace) to its nearest codebook entry (3-dot
    expansion, (d2, cb_label) tie-break): returns (vec_id, s, code,
    sq_err). Codebooks broadcast; the argmin is a per-(vec, s) rank
    window."""
    from pyspark.sql import Window

    d2 = (
        _dot(F.col("sv"), F.col("sv"))
        - F.lit(2.0) * _dot(F.col("sv"), F.col("cv"))
        + _dot(F.col("cv"), F.col("cv"))
    )
    scored = subs.join(F.broadcast(cb), "s").withColumn("d2", d2)
    rw = Window.partitionBy("vec_id", "s").orderBy(F.col("d2").asc(), F.col("cb_label").asc())
    return (
        scored.withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") == 1)
        .select("vec_id", "s", F.col("cb_label").alias("code"), F.col("d2").alias("sq_err"))
    )
