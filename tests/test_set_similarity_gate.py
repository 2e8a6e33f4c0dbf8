"""The r6-judge perf-weak fix (task #4): q_set_similarity_join's per-doc
size table must only broadcast through the gated hint, never
unconditionally — at 100 TB the table is doc-cardinality and an
unconditional ``F.broadcast`` OOMs the driver.  With the gate threshold
forced to 0 rows (and Spark's own auto-broadcast disabled so the hint is
the only broadcast source), the physical plan must contain NO
BroadcastExchange, and the output must stay value-identical to the
default (broadcast-hinted) plan.
"""

from __future__ import annotations

import pytest

from simple_stream_processor_spark.registry import QUERIES
import simple_stream_processor_spark.queries_llmdata  # noqa: F401  (registers)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_size_table_broadcast_is_gated(spark, sf_dir):
    q = QUERIES["q_set_similarity_join"]
    baseline = _rows(q(spark, sf_dir))
    # The query persists csets/prefix; the baseline run materialized those
    # caches with broadcast-hinted plans, and a cache HIT would splice that
    # stored plan (BroadcastExchange included) into the gated run below.
    # Clear so the gated run compiles fresh — the gate is a compile-time
    # property, not a cache-reuse property.
    spark.catalog.clearCache()

    confs = {
        "spark.graft.broadcast_gate_rows": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        df = q(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, (
            "gate_rows=0 must drop every broadcast hint; plan still has one:\n" + plan[:2000]
        )
        assert _rows(df) == baseline, "gated (shuffle-join) plan changed the result"
    finally:
        spark.catalog.clearCache()
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_gated_broadcast_helper_contract():
    from pyspark.sql import functions as F

    from simple_stream_processor_spark.operators.dedup import gated_broadcast

    assert gated_broadcast(10, 10) is F.broadcast
    hint = gated_broadcast(11, 10)
    assert hint is not F.broadcast
    sentinel = object()
    assert hint(sentinel) is sentinel  # identity past the threshold
