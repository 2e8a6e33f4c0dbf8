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
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
