"""Benchmark runner — the driver's per-round feedback loop (BENCH_r{N}.json).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "headline_total", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end: plan build + execution + a driver-side
count-style materialization (foreach-noop via count on the result), i.e. the
full lifecycle a user pays for. A warmup query first amortizes JVM/session
startup so the numbers measure the engine, not process spin-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__
from simple_stream_processor_spark.session import get_spark

QUERIES = __spark_entry__.queries()

HEADLINE = [
    "q_sink_fold_sum",
    "q_map_project",
    "q_filter_predicate",
    "q_group_agg",
    "q_join_orders_customer",
    "q_join_multiway",
    "q_rank_window",
    "q_tumbling_window",
    "q_session_window",
    "q_count_window",
    "q_dedup",
    "q_parmap_ordered",
    "q_text_tokens",
    "q_cosine_topk",
    "q_minhash_dedup",
    "q_topk",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark("bench")
    # warmup: JVM + parquet footer caches
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
