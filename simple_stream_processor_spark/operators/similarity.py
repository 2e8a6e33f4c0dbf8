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

from simple_stream_processor_spark.operators.dedup import cosine

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
        emb.where(F.col("vec_id") != probe_id)
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
    e = emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v")).withColumn(
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
