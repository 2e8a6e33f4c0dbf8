"""Declared-query registry: name → Spark callable + DuckDB oracle SQL.

Query modules (queries.py, queries_llmdata.py, …) register via the
``query`` decorator at import time; ``__spark_entry__`` re-exports the
dicts to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        # fail loud on double registration: a silent last-wins overwrite
        # hides dead code and can swap in a subtly different twin
        if name in QUERIES:
            raise ValueError(f"query {name!r} registered twice")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
