"""Query-scoped cache hygiene (r9 judge task #3).

The dedup / set-similarity family persists multi-consumer intermediates
(shingle tables, candidate pairs, collected-set tables) that the CALLER
materializes — historically those persists outlived the query and taxed
every later query in the session with heap/GC pressure (measured: the r9
sf1 study's 16 spurious super-linear flags vanished under cache clearing).
Round 10 scopes them: ``registry.scoped_persist`` registers each persist,
``release_scoped_caches`` drops them, every declared query auto-releases
the previous query's scoped caches on entry, and bench.py releases after
every timed action.

Pinned here, per family member: after materializing the query's result and
releasing, the session-wide CacheManager is EMPTY — no persisted
DataFrame survives its own query.  (localCheckpoint blocks are out of
scope: they are RDD-level, ContextCleaner-owned, bounded vocab/state-sized,
and their lineage truncation is load-bearing for the iterative operators.)
"""

from __future__ import annotations

import pytest

import simple_stream_processor_spark.queries_llmdata  # noqa: F401  (registers)
import simple_stream_processor_spark.queries  # noqa: F401  (registers)
from simple_stream_processor_spark.registry import (
    QUERIES,
    release_scoped_caches,
    scoped_persist,
)

# Every query the r9 verdict named in the persist-leak finding
# (operators/dedup.py:186-304 + the set-similarity pipeline), plus the
# memoized-index consumers and the IVF centroid persists.
_LEAK_FAMILY = [
    "q_minhash_dedup",
    "q_ngram_jaccard",
    "q_ngram_containment",
    "q_set_similarity_join",
    "q_dedup_clusters",
    "q_dedup_keep_rule",
    "q_minhash_recall",
    "q_ann_ivf",
    "q_ivf_nprobe_curve",
]


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture(autouse=True)
def _clean_slate(spark):
    spark.catalog.clearCache()
    release_scoped_caches()
    yield
    spark.catalog.clearCache()
    release_scoped_caches()


@pytest.mark.parametrize("name", _LEAK_FAMILY)
def test_no_cached_dataframe_survives_its_query(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # materialize: caches fill during the action
    release_scoped_caches()  # what bench.py / the next query's entry does
    assert _cache_manager_empty(spark), (
        f"{name} left persisted DataFrames behind after release — "
        "an unscoped .persist() crept back in"
    )


def test_next_query_entry_releases_previous_scoped_caches(spark, sf_dir):
    """The registry wrapper is the driver-path guarantee: invoking ANY
    declared query drops the previous query's scoped caches, so in the
    driver's sequential correctness/bench harness no cache outlives its
    query slot even though the driver never calls release explicitly."""
    df = QUERIES["q_minhash_dedup"](spark, sf_dir)
    df.count()
    assert not _cache_manager_empty(spark), "minhash should cache while live"
    QUERIES["q_topk"](spark, sf_dir)  # entry alone must release; no action needed
    assert _cache_manager_empty(spark)


def test_same_query_reinvocation_keeps_its_own_warm_index(spark, sf_dir):
    """Re-invoking the SAME query must not drop its own scoped caches:
    min-of-reps benchmarking and the production shared-index pattern both
    measure the warm path; only a DIFFERENT query taking over releases."""
    QUERIES["q_minhash_dedup"](spark, sf_dir).count()
    assert not _cache_manager_empty(spark)
    QUERIES["q_minhash_dedup"](spark, sf_dir)  # same owner: no release
    assert not _cache_manager_empty(spark), "same-query rep dropped its own index"
    QUERIES["q_topk"](spark, sf_dir)  # different owner: releases
    assert _cache_manager_empty(spark)


def test_release_is_idempotent_and_counts(spark):
    assert release_scoped_caches() == 0
    df = scoped_persist(spark.range(10).toDF("x"))
    df.count()
    assert release_scoped_caches() == 1
    assert release_scoped_caches() == 0
    assert _cache_manager_empty(spark)


def test_memoized_pair_index_recaches_on_reuse(spark, sf_dir):
    """The shared minhash pair index memoizes the PLAN; its cache is
    re-registered scoped on each access, so a consumer query that runs
    after a release still gets within-query caching — and still leaks
    nothing once released."""
    from simple_stream_processor_spark.queries_llmdata import _minhash_pairs

    p1 = _minhash_pairs(spark, sf_dir)
    p1.count()
    release_scoped_caches()
    assert _cache_manager_empty(spark)
    p2 = _minhash_pairs(spark, sf_dir)
    assert p2 is p1  # same plan object — the memo held
    lvl = p2.storageLevel
    assert lvl.useMemory or lvl.useDisk  # re-registered as cached
    release_scoped_caches()
    assert _cache_manager_empty(spark)
