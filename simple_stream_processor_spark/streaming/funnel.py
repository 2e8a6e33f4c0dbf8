"""Streaming funnel: incremental sequence-pattern matching with per-user
group state (`applyInPandasWithState`) — the streaming twin of
operators/relational.py:funnel.

Each user's state holds the sorted per-stage timestamp lists seen so far
(bounded by that user's event count, never stream length — the same
state-size argument as the reference's per-window accumulation,
Node.scala:315-356). Every micro-batch the operator re-walks the stage
progression from state and emits the user's current funnel row, so the
LAST update per user (highest n_seen) equals the batch funnel over the
full history — out-of-order arrival WITHIN the retained history is
handled exactly, because the walk always runs over the sorted lists, not
arrival order.

At scale: state lives in the executor state store keyed by user — the
shuffle is the same single user-keyed exchange as the batch funnel, paid
incrementally per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType


def streaming_funnel(
    sdf: DataFrame,
    stages: Sequence[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user incremental funnel. Emits one row per user per
    micro-batch: (user, n_seen, t_<stage>... as epoch micros); take the
    row with the highest ``n_seen`` per user for the current answer."""
    if not stages:
        raise ValueError("streaming_funnel requires at least one stage")
    stages = list(stages)

    out_cols = [key, "n_seen"] + [f"t_{s}" for s in stages]
    output_schema = ", ".join([f"{key} long", "n_seen long"] + [f"t_{s} long" for s in stages])
    state_schema = StructType(
        [StructField("n_seen", LongType())]
        + [StructField(f"arr_{i}", ArrayType(LongType())) for i in range(len(stages))]
    )

    def walk(lists: list[list[int]]) -> list[int | None]:
        ts: list[int | None] = []
        prev: int | None = None
        for i, lst in enumerate(lists):
            if i == 0:
                cur = min(lst) if lst else None
            elif prev is None:
                cur = None
            else:
                later = [t for t in lst if t > prev]
                cur = min(later) if later else None
            ts.append(cur)
            prev = cur
        return ts

    def step(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (uid,) = key_tuple
        if state.exists:
            row = state.get
            n_seen, lists = row[0], [sorted(a) if a is not None else [] for a in row[1:]]
        else:
            n_seen, lists = 0, [[] for _ in stages]
        for pdf in pdfs:
            n_seen += len(pdf)
            micros = pdf[ts_col].astype("int64")
            types = pdf[type_col]
            for i, s in enumerate(stages):
                lists[i].extend(int(m) for m, t in zip(micros, types) if t == s)
        lists = [sorted(l) for l in lists]
        state.update(tuple([n_seen] + lists))
        yield pd.DataFrame([[uid, n_seen] + walk(lists)], columns=out_cols)

    ev = sdf.where(F.col(type_col).isin(stages)).select(
        F.col(key), F.unix_micros(F.col(ts_col)).alias(ts_col), F.col(type_col)
    )
    return ev.groupBy(F.col(key)).applyInPandasWithState(
        step, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
