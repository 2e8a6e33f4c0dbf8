"""Streaming-plan + state-bound audit over the live micro-batch plans
(r9 judge task #5 — the blind spot tools/plan_audit.py leaves by design:
a drained memory-sink's batch plan says nothing about what the incremental
engine executed).

For every declared ``q_streaming_*`` query this tool runs the query with
SPARK_GRAFT_STREAM_AUDIT=1, drains the runner's AUDIT_LOG (one record per
stream the query started: the final micro-batch PHYSICAL plan + all
progress dicts), and asserts:

(a) Python-boundary discipline: no ``BatchEvalPython`` (row-at-a-time
    Python UDF) in any micro-batch plan. Arrow-batched boundaries
    (ArrowEvalPython, FlatMapGroupsInPandasWithState, MapInPandas,
    FlatMapGroupsInPandas, TransformWithStateInPandas) are the sanctioned
    slow path and are allowed.
(b) State is data-bounded: for every stateful operator in the final
    progress, ``numRowsTotal`` <= factor x total input rows the stream
    admitted (summed numInputRows across batches; factor defaults to 1 —
    keys/windows/sessions/buffered join rows never outnumber inputs —
    with documented STATE_BOUND_FACTORS overrides for derived-unit state
    like ngram vocabularies, covariance cells, and overlapping windows).
    State past its factor means an eviction or keying bug; lifetime-keyed
    state (the failure class this audit exists for) blows ANY fixed
    factor as the stream runs.
(c) Eviction actually evicts: for the families whose whole point is
    removing state (event-time sessionizer, dropDuplicatesWithinWatermark
    under a multi-batch feed), the summed ``numRowsRemoved`` must be > 0.
    Single-batch AvailableNow drains cannot evict mid-run (the watermark
    only advances between batches), so this is asserted for the declared
    multi-batch queries plus the sessionizer harness from
    tests/test_stateful_sessions.py's feed shape.

Exit 0 and a one-line JSON summary on success; exit 1 with per-query
failures otherwise.

Usage: python tools/stream_audit.py [SF_DIR] [name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["SPARK_GRAFT_STREAM_AUDIT"] = "1"

# Row-at-a-time Python eval — never allowed anywhere in this repo.
FORBIDDEN = ("BatchEvalPython",)

# State-bound overrides: numRowsTotal <= factor * total input rows.  The
# default factor 1 holds for key/window/session-grained state; these
# queries legitimately keep DERIVED-UNIT state whose cardinality exceeds
# the document/event count but is still data-bounded (it cannot grow with
# stream LIFETIME, which is what this audit exists to catch — a per-event
# key that never evicts would blow any of these factors as the stream ran):
STATE_BOUND_FACTORS = {
    # distinct word-ngram vocabulary cells (<= corpus token count, ~100
    # tokens/doc at the fixture shapes; vocab saturates sublinearly with SF)
    "q_streaming_novelty": 60,
    # sources x vocabulary word cells (entropy/OOV/stylometry panels)
    "q_streaming_entropy": 3,
    "q_streaming_oov": 3,
    "q_streaming_burrows": 3,
    "q_streaming_textrank": 3,   # word-vertex + co-occurrence edge state
    "q_streaming_bloom": 3,      # per-source filter-partial cells
    # d x d covariance + d mean cells: CONSTANT (64^2 + margins) regardless
    # of corpus size — the factor only bites at the tiny sf0.001 fixture
    "q_streaming_pca": 9,
    # overlapping windows: window/slide = 2 open windows per event bucket
    "q_streaming_sliding": 2,
}
# The eviction families: queries that feed multiple micro-batches and whose
# state store must shrink (numRowsRemoved > 0) as the watermark passes keys.
EVICTING = {
    "q_streaming_merge_upsert",  # 4 day-sliced batches, foreachBatch CDC
}


def _state_ops(progress: list[dict]) -> list[dict]:
    ops = []
    for p in progress:
        for so in p.get("stateOperators", []) or []:
            ops.append(so if isinstance(so, dict) else json.loads(so.json()))
    return ops


def _audit_one(name, fn, spark, sf_dir, failures):
    from simple_stream_processor_spark.streaming.runner import AUDIT_LOG

    AUDIT_LOG.clear()
    t0 = time.perf_counter()
    try:
        n_rows = fn(spark, sf_dir).count()
    except Exception as exc:
        failures.append((name, f"query raised {type(exc).__name__}: {exc}"[:300]))
        return 0, 0
    wall = time.perf_counter() - t0
    if not AUDIT_LOG:
        failures.append((name, "no stream audited — query started no stream through the runner"))
        return 0, wall

    n_streams = len(AUDIT_LOG)
    removed_total = 0
    for i, rec in enumerate(list(AUDIT_LOG)):
        plan = rec.get("plan", "") or ""
        if "plan_error" in rec:
            failures.append((name, f"stream {i}: plan capture failed: {rec['plan_error']}"))
        for bad in FORBIDDEN:
            if bad in plan:
                failures.append((name, f"stream {i}: {bad} in micro-batch plan"))
        progress = rec.get("progress", []) or []
        total_in = sum(int(p.get("numInputRows", 0) or 0) for p in progress)
        # final-batch state per operator: the LAST progress carries the
        # closing numRowsTotal for each state store
        final_ops = _state_ops(progress[-1:]) if progress else []
        factor = STATE_BOUND_FACTORS.get(name, 1)
        for so in final_ops:
            total_state = int(so.get("numRowsTotal", 0) or 0)
            if total_in and total_state > factor * total_in:
                failures.append(
                    (name, f"stream {i}: state rows {total_state} exceed "
                           f"{factor}x input rows {total_in} "
                           f"(operator {so.get('operatorName', '?')})")
                )
        removed_total += sum(
            int(so.get("numRowsRemoved", 0) or 0) for so in _state_ops(progress)
        )
    if name in EVICTING and removed_total == 0:
        # foreachBatch CDC keeps its state driver-side (localCheckpoint), not
        # in a state store — only flag when the query HAS state operators
        if any(_state_ops(rec.get("progress", []) or []) for rec in AUDIT_LOG):
            failures.append((name, "eviction family reported numRowsRemoved == 0"))
    AUDIT_LOG.clear()
    print(f"# {name}: {n_streams} stream(s), {n_rows} rows, {wall:.1f}s", file=sys.stderr)
    return n_streams, wall


def _run_sessionizer_feed(spark, sf_dir: str):
    """3-file time-ordered replay of the events table through the
    event-time-timeout sessionizer (the feed shape
    tests/test_stateful_sessions.py pins); returns
    (sum numRowsRemoved, final numRowsTotal, distinct users)."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from simple_stream_processor_spark.streaming.runner import AUDIT_LOG, run_stream_to_memory
    from simple_stream_processor_spark.streaming.sessions import (
        prepare_session_events,
        sessionize_stateful,
    )
    from simple_stream_processor_spark.tables import _normalize_timestamps

    root = tempfile.mkdtemp(prefix="stream_audit_sessions_")
    try:
        ev = _normalize_timestamps(spark, spark.read.parquet(os.path.join(sf_dir, "events.parquet")))
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        span = (hi - lo) / 3
        flat = os.path.join(root, "flat")
        os.makedirs(flat, exist_ok=True)
        for i in range(3):
            left = lo + span * i
            right = lo + span * (i + 1)
            part = ev.filter(
                (F.col("ts") >= F.lit(left)) & (F.col("ts") < F.lit(right) if i < 2 else F.lit(True))
            )
            tmp = os.path.join(root, f"tmp{i}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            (src_file,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            shutil.copy(src_file, os.path.join(flat, f"events_{i}.parquet"))
        schema = spark.read.parquet(flat).schema
        sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(flat)
        sdf = _normalize_timestamps(spark, sdf).withColumn("ts", F.col("ts").cast("timestamp"))
        out = sessionize_stateful(prepare_session_events(sdf), gap_ms=600_000)
        AUDIT_LOG.clear()
        _, progress = run_stream_to_memory(out, output_mode="append")
        AUDIT_LOG.clear()
        ops = _state_ops(progress)
        removed = sum(int(so.get("numRowsRemoved", 0) or 0) for so in ops)
        finals = _state_ops(progress[-1:])
        final_state = sum(int(so.get("numRowsTotal", 0) or 0) for so in finals)
        n_users = ev.select("user_id").distinct().count()
        return removed, final_state, n_users
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from simple_stream_processor_spark.session import get_spark

    queries = entry.queries()
    # q_managed_source / q_managed_sink are lifecycle-managed RESOURCE
    # queries (plan_audit also classifies them streaming): they exercise
    # open/close-once semantics, not a Structured Streaming query — no
    # micro-batch plan or state store exists to audit, so they stay out
    # of this walk (their lifecycle invariants are pytest-pinned in
    # tests/test_lifecycle.py).
    names = [n for n in queries if re.match(r"q_stream", n)]
    if only:
        names = [n for n in names if n in only]
    spark = get_spark("stream_audit")

    failures: list[tuple[str, str]] = []
    audited = 0
    t0 = time.perf_counter()
    for name in names:
        n_streams, _ = _audit_one(name, queries[name], spark, sf_dir, failures)
        audited += 1 if n_streams else 0
    wall = time.perf_counter() - t0

    # The event-time-timeout sessionizer's eviction contract, exercised on
    # the same multi-batch time-split feed shape
    # tests/test_stateful_sessions.py pins: closed sessions must LEAVE the
    # store (numRowsRemoved > 0) and final state stays <= |users|.
    if not only or "sessionizer" in only:
        try:
            removed, final_state, n_users = _run_sessionizer_feed(spark, sf_dir)
            print(
                f"# sessionizer feed: numRowsRemoved={removed} "
                f"final_state={final_state} users={n_users}",
                file=sys.stderr,
            )
            if removed <= 0:
                failures.append(("sessionizer", "multi-batch feed evicted nothing"))
            if final_state > n_users:
                failures.append(
                    ("sessionizer", f"final state {final_state} exceeds user count {n_users}")
                )
            audited += 1
        except Exception as exc:
            failures.append(("sessionizer", f"{type(exc).__name__}: {exc}"[:300]))

    summary = {
        "audited": audited,
        "n_queries": len(names),
        "failures": len(failures),
        "wall_s": round(wall, 1),
    }
    for name, why in failures:
        print(f"FAIL  {name}: {why}")
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
