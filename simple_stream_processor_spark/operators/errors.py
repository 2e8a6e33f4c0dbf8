"""In-band error channel + recovery (SURVEY §2.4, reference ADR-0003).

The reference threads errors *through the stream* (``Error`` is a stream
state, reference Stream.scala:313), and ``recover`` replaces the first
matching error with ONE fallback value then halts — elements before the
error pass through untouched (golden [10, 5, -1],
SimpleStreamProcessorTest.scala:45-53). ``recoverWith`` splices in a whole
fallback stream (golden sum 209).

Spark's engine-level policy is fail-fast (task exception → job failure),
which matches the reference's *terminal* behavior (E3). The in-band channel
is re-expressed **as data**:

1. Per-row error capture: compute with ``try_*`` expressions (try_divide,
   try_cast, …) or a (value, err) struct from a pandas_udf — a row-level
   Either, errors flow as nulls/structs instead of exceptions.
2. Stream truncation: "everything strictly before the first error" is a
   window over the error flag — min(error_position) then filter. Bounded
   state, no collect.
3. Fallback splice: unionAll of the fallback (one synthetic row for
   ``recover``, an arbitrary DataFrame for ``recoverWith``).

Scale notes: the min-over-errors is a global aggregate (one-row exchange);
truncation is then a broadcast of that single row into the filter — no
full-stream shuffle at any size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_error_channel(df: DataFrame, value_expr: Column, order_col: str) -> DataFrame:
    """Attach the row-level Either: ``value`` (null on failure) + ``is_err``.
    ``value_expr`` should be a try_* expression (null = error), the Spark
    analog of an exception inside the reference's map f (Stream.scala:17-18)."""
    return df.withColumn("value", value_expr).withColumn("is_err", F.col("value").isNull()).withColumn(
        "_ord", F.col(order_col)
    )


def truncate_at_first_error(df_with_err: DataFrame) -> tuple[DataFrame, Column]:
    """Split at the first in-band error in arrival order.

    Returns (prefix_df, had_error_condition): rows strictly before the first
    error, plus a 1-row DataFrame-usable condition for whether any error
    occurred (drives whether the fallback is appended — the reference emits
    the fallback only when an error actually arrives)."""
    first_err = df_with_err.where(F.col("is_err")).agg(F.min("_ord").alias("first_err_ord"))
    prefix = (
        df_with_err.join(F.broadcast(first_err), how="cross")
        .where(F.col("first_err_ord").isNull() | (F.col("_ord") < F.col("first_err_ord")))
        .drop("first_err_ord")
    )
    return prefix, first_err


def recover_value(df_with_err: DataFrame, fallback: DataFrame) -> DataFrame:
    """reference ``recover`` (Stream.scala:90-93): prefix before first error,
    then exactly one fallback row, then halt. ``fallback`` must have the
    same schema as the prefix projection."""
    prefix, first_err = truncate_at_first_error(df_with_err)
    out_cols = [c for c in df_with_err.columns if c not in ("is_err", "_ord")]
    fallback_if_err = fallback.join(F.broadcast(first_err), how="cross").where(F.col("first_err_ord").isNotNull()).drop(
        "first_err_ord"
    )
    return prefix.select(*out_cols).unionAll(fallback_if_err.select(*out_cols))


def recover_with_stream(df_with_err: DataFrame, fallback_stream: DataFrame) -> DataFrame:
    """reference ``recoverWith`` (Stream.scala:95-101): prefix before first
    error, then the whole fallback stream."""
    return recover_value(df_with_err, fallback_stream)


def map_with_error_capture(df, fn, in_col: str, out_col: str, out_type: str, order_col: str):
    """In-band error capture for ARBITRARY Python functions — the general
    form of the reference's "exception inside map's f becomes an in-band
    Error" (reference Stream.scala:17-18), where ``try_*`` expressions only
    cover SQL-expressible computations.

    Runs ``fn`` element-wise inside an Arrow-batched pandas UDF, catching
    per-element exceptions into an error-message column instead of failing
    the task: the row-level Either as a (value, err) pair. Feeds directly
    into ``truncate_at_first_error``/``recover_value`` via the same
    ``is_err`` convention. Batch stays vectorized when ``fn`` is; the
    per-element fallback path only pays for rows near an error."""

    @F.pandas_udf(f"struct<value:{out_type},err:string>")
    def capture(s: pd.Series) -> pd.DataFrame:
        try:
            # fast path: whole-batch vectorized apply
            return pd.DataFrame({"value": fn(s), "err": [None] * len(s)})
        except Exception:  # noqa: BLE001 — fall back to per-element capture
            values, errs = [], []
            for x in s:
                try:
                    values.append(fn(pd.Series([x])).iloc[0])
                    errs.append(None)
                except Exception as e:  # noqa: BLE001
                    values.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            return pd.DataFrame({"value": values, "err": errs})

    out = df.withColumn("_r", capture(F.col(in_col)))
    return (
        out.withColumn(out_col, F.col("_r.value"))
        .withColumn("err", F.col("_r.err"))
        .withColumn("is_err", F.col("err").isNotNull())
        .withColumn("_ord", F.col(order_col))
        .drop("_r")
    )
