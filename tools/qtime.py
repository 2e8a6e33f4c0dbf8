"""Per-query measurement harness for optimization work (guide §1).

Times individual declared queries in isolation with the same methodology as
bench.py (plan build + execution + count materialization, min of N reps,
scoped caches released between queries), and optionally:

  * --noop      time a noop-sink write instead of count() (guide §1.4) —
                forces every column of every row, so column-pruning can't
                flatter a query; reported alongside, never replacing, the
                count-based number.
  * --explain FILE_PREFIX
                dump each query's .explain("formatted") to
                FILE_PREFIX<query>.txt (the plans/r10/ evidence files).
  * --explain-rounds FILE_PREFIX
                (r11, r10 judge task #9) additionally capture the plan of
                EVERY localCheckpoint call made while the query builds —
                the per-round plans that the final .explain truncates for
                iterative queries (BFS / label-prop / PCA / bisect class).
                Written to FILE_PREFIX<query>_round<k>.txt.

Usage: python tools/qtime.py [--reps N] [--noop] [--explain PREFIX]
           [--explain-rounds PREFIX] [--sf DIR] q_a q_b ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__
from simple_stream_processor_spark.registry import release_scoped_caches
from simple_stream_processor_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default=None)
    ap.add_argument("--explain-rounds", default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    queries = __spark_entry__.queries()
    spark = get_spark("qtime")
    # same warmup as bench.py: parquet footers + codegen + Arrow round-trip
    for t in ("nation", "region", "supplier", "customer", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(os.path.join(args.sf, f"{t}.parquet")).count()
        except Exception:
            pass
    try:
        import pandas as pd  # noqa: F401
        from pyspark.sql import functions as F

        warm = F.pandas_udf(lambda s: s * 2, "long")
        spark.range(0, 1000, numPartitions=1).select(warm(F.col("id"))).count()
    except Exception:
        pass

    for name in args.queries:
        if name not in queries:
            print(f"{name}: NOT DECLARED", flush=True)
            continue
        runs = []
        n = 0
        for _ in range(args.reps):
            release_scoped_caches()
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            df = queries[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        best = min(runs)
        print(f"{name}: {best:.3f}s min of {len(runs)} (spread +{max(runs)-best:.3f}s, {n} rows)", flush=True)
        if args.explain:
            release_scoped_caches()
            df = queries[name](spark, args.sf)
            with open(f"{args.explain}{name}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
        if args.explain_rounds:
            release_scoped_caches()
            _capture_round_plans(spark, queries[name], args.sf, args.explain_rounds, name)
        release_scoped_caches()
    return 0


def _capture_round_plans(spark, fn, sf_dir, prefix, name):
    """Build the query once with DataFrame.localCheckpoint patched to dump
    the plan ABOVE each checkpoint — the per-round plans the final explain
    cannot show for iterative queries. Capture-only: the checkpoint then
    proceeds unchanged, so the query's behavior is identical."""
    # Spark 4: concrete sessions build pyspark.sql.classic.dataframe.DataFrame,
    # which OVERRIDES localCheckpoint — patch the class whose method actually
    # dispatches, falling back to the facade for older layouts.
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover - pre-4.0 layout
        from pyspark.sql import DataFrame

    counter = [0]
    orig = DataFrame.localCheckpoint

    def patched(self, eager=True):
        counter[0] += 1
        try:
            txt = self._sc._jvm.PythonSQLUtils.explainString(
                self._jdf.queryExecution(), "formatted"
            )
            with open(f"{prefix}{name}_round{counter[0]}.txt", "w") as fh:
                fh.write(txt)
        except Exception as exc:  # capture must never break the query
            print(f"# round-plan capture failed: {type(exc).__name__}: {exc}")
        return orig(self, eager=eager)

    DataFrame.localCheckpoint = patched
    try:
        fn(spark, sf_dir).count()
    finally:
        DataFrame.localCheckpoint = orig
    print(f"{name}: captured {counter[0]} round plans -> {prefix}{name}_round*.txt")


if __name__ == "__main__":
    raise SystemExit(main())
