"""Local stand-in for the driver's correctness gate: run every declared
query in Spark and its oracle in DuckDB at a given sf, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
Env:   ORACLE_VANILLA=1  — use a default-config SparkSession (like the
       driver's harness) instead of our tuned factory, to catch bugs that
       only appear without our session confs (e.g. timestamp_ntz reads).
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_stream_processor_spark.session import get_spark
from simple_stream_processor_spark.tables import TABLES


def _vanilla_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("oracle_check_vanilla")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def normalize(df):
    """Sort columns by name, canonicalize cell values, return sorted row tuples."""

    def canon(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<nan>"
            s = f"{v:.6f}"
            # IEEE -0.0 (and -1e-7..0) formats as "-0.000000": numerically
            # equal to zero, so canonicalize — DuckDB's round() preserves the
            # sign bit where Spark's does not (found by cross-engine fuzz)
            return "0.000000" if s == "-0.000000" else s
        if isinstance(v, bool):
            return str(bool(v))
        return str(v)

    cols = sorted(df.columns)
    # Canonicalize COLUMN-wise: pandas iterrows() upcasts each row to a
    # common dtype, so in an all-numeric frame Spark's BIGINT 15000 becomes
    # 15000.0 and an int-vs-float engine mismatch vanishes — exactly the
    # blind spot that let the q_skew_report HUGEINT bug pass the local gate
    # while the round-5 driver flagged it red. Series.tolist() preserves the
    # per-column dtype (ints stay ints), matching the driver's strictness.
    col_vals = [[canon(v) for v in df[c].tolist()] for c in cols]
    rows = list(zip(*col_vals)) if cols else []
    return cols, sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = _vanilla_spark() if os.environ.get("ORACLE_VANILLA") else get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    t_all = time.perf_counter()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}", flush=True)
            continue
        dt = time.perf_counter() - t0
        # the driver's canonicalizer sorts the pandas frame by every column;
        # list/array cells make that throw — treat as a failure here. Scan
        # every row, not just the first: a null in row 0 of an array column
        # must not let the column slip past.
        if len(sdf) and any(
            sdf[c].map(lambda v: isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray").any()
            for c in sdf.columns
        ):
            failures.append(name)
            print(f"FAIL  {name}: array-typed output column (unhashable for driver canon)", flush=True)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{dt:.1f}s]", flush=True)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        scols, srows = normalize(sdf)
        ocols, orows = normalize(odf)
        if scols != ocols:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(srows)} oracle={len(orows)}")
            continue
        if srows != orows:
            failures.append(name)
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}", flush=True)
            continue
        print(f"OK    {name}: {len(srows)} rows [{dt:.1f}s]", flush=True)
    print(f"\ntotal wall: {time.perf_counter() - t_all:.1f}s")
    print(f"{len(failures)} failures: {failures}" if failures else "all green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
