"""Repo-wide physical-plan linter: build every declared query's plan and
flag scale anti-patterns before they reach a cluster.

Rules (SCALE.md §1 discipline):
- FORBIDDEN  BatchEvalPython      — row-at-a-time Python UDF in any plan
                                    (Arrow/pandas is the only sanctioned
                                    Python boundary: ArrowEvalPython,
                                    MapInPandas, FlatMapGroupsInPandas*).
- FORBIDDEN  CartesianProduct     — a non-broadcast cross join; every
                                    intentional cross join in this repo
                                    broadcasts one side
                                    (BroadcastNestedLoopJoin).
- BUDGETED   Exchange SinglePartition ≤ 1 — at most one single-partition
                                    exchange per plan, and only for
                                    provably-small inputs (final global
                                    aggregates, block/bucket tables).

Streaming queries are skipped: they execute a stream into a memory sink
inside the builder, so their returned "plan" is a local table scan (their
plan discipline is asserted by the streaming tests instead).

Usage: python tools/plan_audit.py [sf_dir]    # default /root/testdata/sf0.001
Exit 1 if any rule fails; one JSON summary line on stdout.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("BatchEvalPython", "CartesianProduct")
SINGLE_PARTITION_BUDGET = 1

# Explicit, justified allowances above the default budget. Every entry must
# be a plan whose single-partition exchanges each carry only
# partial-aggregated rows (#tasks rows or one row), never record-level data.
SINGLE_PARTITION_ALLOWANCE = {
    # four one-row aggregates over the days-bounded joined series (pair
    # sign counts, two tie rollups, the n/n0 count) — never event-level;
    # the days^2 pair join itself shuffles normally
    "q_kendall_tau": 4,
    "q_streaming_kendall": 4,
    # the pooled doubled-midrank window over the days x types daily table
    # (budgeted, the q_spearman stance) + the one-row ties/moments folds
    "q_kruskal_wallis": 2,
    "q_streaming_kruskal": 2,
    # the corpus-total window over the types x 24 cell table + the one-row
    # sorted chi-square fold
    "q_cramers_v": 2,
    "q_streaming_cramers": 2,
    # the users-bounded activity-quintile ntile (documented swap to
    # approx-quantile bounds at corpus scale) plus the final one-row ATE
    # fold over the 5 stratum terms — never event-level data
    "q_stratified_ate": 2,
    # two FK audits union two one-row aggregates (each final agg is a
    # SinglePartition exchange over #tasks partial rows)
    "q_integrity_audit": 2,
    # the scalar first-day aggregate feeds two consumers (probe build +
    # exclusion filter); exchange reuse does not fire across the differing
    # filters, so the one-row agg materializes twice
    "q_timeseries_similarity": 2,
    # the one-row first-error aggregate is joined into the prefix filter
    # AND projected into the fallback row — two one-row exchanges
    "q_recover_value": 2,
    "q_recover_with_stream": 2,
    # one expectation-suite scalar aggregate PER TABLE (orders, lineitem,
    # events) — each is a one-row final agg over #tasks partial rows;
    # adding a check reuses an existing table's aggregate
    "q_expectations": 3,
    # reference-date one-row agg + the quantile-bounds one-row agg (itself
    # consumed via broadcast) + the final segment rollup's one-row side —
    # all over partial rows, never customer data
    "q_rfm_segmentation": 3,
    # two-level prefix sum: the bucket-table offset window (bounded at
    # ~1000 score-range rows) plus the final one-row AUC aggregate
    "q_auc_eval": 2,
    # the distinct-frequency running sum (heavy-tailed: far smaller than
    # the vocab) plus the final one-row regression aggregate
    "q_zipf_fit": 2,
    # one k-row centroid packing per Lloyd round (collect_list of the k
    # centroids into the broadcast struct array) — never record-level data
    "q_kmeans": 2,
    # the two corpus-token totals (target and pool) — each a one-row count
    # over #tasks partial rows, broadcast into the 4096-row log-ratio table
    "q_dsir_select": 2,
    # the two PMI normalizers (unigram total, bigram total) — each a
    # one-row sum over vocab-bounded partials, broadcast into the pair
    # table; never record-level data
    "q_pmi_collocations": 2,
    # the one-row grand-total aggregate plus the final one-row MI/entropy
    # fold — both over the bounded type×24 cell grid, never events
    "q_mutual_information": 2,
    # the one-row corpus-token total plus the one-row removable-token
    # rollup (over the component-bounded cluster table) — never docs
    "q_dedup_savings": 2,
    # the global decile window + gains cumsum run over the user rollup
    # and the 10-row decile table; plus the one-row base-rate aggregate —
    # never events
    "q_lift_table": 2,
    # one one-row stat aggregate PER TABLE (six dims/facts profiled) —
    # the q_expectations per-table pattern; each over #tasks partials
    "q_join_advisor": 6,
    # compaction planning runs entirely on the 64-row file-count table:
    # the prefix-sum window over it plus the one-row target aggregate —
    # both metadata-sized, never data
    "q_compaction_plan": 2,
    # the days-bounded global RANGE window feeds two consumers (the slot
    # rollup and the final join); exchange reuse does not fire across the
    # differing projections, so the days-sized exchange materializes twice
    "q_seasonal_decompose": 2,
    # three one-row aggregates: the split-day bounds, the user-moment
    # rollup, and the theta scalar consumed via broadcast — each over
    # #tasks partial rows (days / user-rollup partials), never raw events
    "q_cuped": 3,
    # one global ntile sort per candidate layout (3) + the one-row span
    # aggregate — the advisor deliberately MATERIALIZES each layout to
    # measure it on a narrow 4-int projection; at 100 TB the same numbers
    # read from parquet footer min/max stats (docstring), no sort at all
    "q_sort_key_advisor": 4,
    # the same 2 k-row Lloyd packings, but the final assignment feeds THREE
    # consumers (pair-join left, pair-join right, keep-rule join back), and
    # exchange reuse does not fire across them — 2 x 3 k-row exchanges,
    # never record-level data
    "q_semantic_dedup": 6,
    # verdict-contract form (r6): the global sketch-UNION rollup (5
    # per-type sketches → 1 row) plus the global exact-distinct rollup
    # (#tasks partial counts → 1 row) — two one-row aggregates, never
    # record-level data
    "q_hll_mergeable": 2,
    # the r10 distributed-percentile rewrite: the bucket-offset window over
    # the value-domain-bounded bucket table (cents div 65536 — ≤~170 rows at
    # any data size; printed twice as a shared subtree under two consumers)
    # + the one-row total aggregate + the 15-row boundary collect — all
    # metadata-sized, never record-level data (the cents table itself hashes)
    "q_equidepth_hist": 4,
    # the corpus-ECDF running sum over the bounded 1e4-bin grid plus the
    # one-row grand-total aggregate — both over binned partials, never docs
    "q_ks_drift": 2,
    # same grid machinery as q_ks_drift (shared cnt/ccum/tot shape): the
    # corpus-ECDF running sum over the bounded bin grid + the one-row total
    "q_wasserstein_drift": 2,
    # same grid machinery again (cvm_report reuses the cnt/ccum/tot shape):
    # the corpus-ECDF running sum over the bounded 1e4-bin grid + the
    # one-row grand-total aggregate — binned partials, never docs
    "q_cvm_drift": 2,
    # the n_vec scalar, the last round's norm scalar, and the Rayleigh
    # eigenvalue — one-row aggregates over d- and d²-bounded tables
    "q_pca_top_component": 3,
    # three one-row aggregates (triangle count, edge count, node/wedge
    # stats) crossed into the single summary row — all over partials
    "q_triangle_count": 3,
    # the horizon scalar plus the lifetime-table windows (suffix risk sum
    # and the ln-product running sum) — all over the ≤observation-days table
    "q_survival_curve": 2,
    # same shape as q_survival_curve (shared lifetime derivation): horizon
    # scalar + the hazard running sums over the ≤observation-days table
    "q_nelson_aalen": 2,
    # the N100 decomposition's days-bounded centered RANGE window plus the
    # final one-row strength aggregate — never event-level data
    "q_seasonality_strength": 2,
    # the N100 days-bounded RANGE window plus the two even-median rank
    # windows (residual median + MAD) — all over the days-bounded table
    "q_seasonal_anomaly": 3,
    # the advisor-stance global value rank (approx-quantile threshold at
    # corpus scale, docstring) plus the one-row tail aggregate
    "q_hill_tail_index": 2,
    # the languages^2-bounded confusion matrix feeds the one-row total and
    # the one-row kappa-marginal aggregates — both matrix-sized, never docs
    "q_classifier_report": 2,
    # the one-row base (users, total) aggregate plus the one-row CI
    # percentile over the 100-row replicate-means table
    "q_bootstrap_ci": 2,
    # the 8-row coalition table feeds one exposure aggregate and one
    # Shapley-rate aggregate (both stacked to 3 rows) — never events
    "q_shapley_attribution": 2,
    # the one-row transition total plus the one-row double-entropy fold —
    # both over the types^2-bounded matrix, never events
    "q_markov_entropy_rate": 2,
    # one (n_nodes, Σdeg) one-row rollup per peeling round (4 unrolled
    # rounds); each serves both the stats row and the peel threshold and
    # carries only #tasks partial rows, never edges
    "q_densest_subgraph": 4,
    # the one-row horizon aggregate rides `eligible`, which feeds BOTH the
    # hits probe and the final left join — exchange reuse does not fire
    # across the two consumers, so the scalar materializes twice (the
    # q_recover_value / q_timeseries_similarity pattern)
    "q_retention_curve": 2,
    # head-day scalar + the final one-row summary — both over partial rows
    "q_active_users": 2,
    # two one-row counts (catalog size, sold-key semi-join) cross into the
    # one-row summary — never fact rows
    "q_dim_coverage": 2,
    # the decile ntile sort (the q_stratified_ate stance: approx-quantile
    # bounds at corpus scale) + the 10-row prefix-sum window, which feeds
    # three consumers (lo/hi segment sides + the final join) — all
    # deciles-bounded after the ntile, never event-level twice
    "q_isotonic_calibration": 4,
    # the days-bounded at-risk prefix window plus the one-row O/E/V fold
    # and the one-row group-totals aggregate — all over the event-time
    # table (≤ observation days) or #tasks partials, never user rows
    "q_logrank_test": 3,
    # two global top-20 rank windows (frequency ranking + the TextRank
    # re-rank, both over vocab-bounded score tables)
    "q_rbo_rankings": 2,
    # the global sign-pair one-row aggregate plus the one-row stratum
    # variance rollup — both over days-bounded partials, never events
    "q_seasonal_mann_kendall": 2,
    # the days-bounded distinct-lifetime prefix window, the one-row
    # uncensored-count aggregate, and the one-row regression fold —
    # all over <= observation-days rows or #tasks partials
    "q_weibull_fit": 3,
    # the one-row ship-date-range bounds scalar plus the one-row 2x2
    # DiD cell aggregate — both over #tasks partials, never line-level
    "q_promo_uplift": 2,
    # the one-row type-count scalar, the one-row moment fold, and the
    # blocks-bounded block-filter rollup — all over types/days partials
    "q_friedman_test": 3,
    # the two one-row week-total scalars, the one-row max-week bound,
    # and the global top-20 rank window over the vocab-bounded score
    # table (the q_rbo_rankings class)
    "q_keyword_trend": 4,
}

STREAMING_PREFIXES = ("q_stream", "q_streaming", "q_managed")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "extended")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from simple_stream_processor_spark.session import get_spark

    spark = get_spark("plan_audit")
    qs = entrymod.queries()

    failures: dict[str, list[str]] = {}
    skipped: list[str] = []
    t0 = time.perf_counter()
    for name, fn in qs.items():
        if name.startswith(STREAMING_PREFIXES):
            skipped.append(name)
            continue
        try:
            plan = plan_of(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            failures[name] = [f"plan build error: {type(e).__name__}: {e}"[:200]]
            continue
        problems = [pat for pat in FORBIDDEN if pat in plan]
        n_single = len(re.findall(r"Exchange SinglePartition", plan))
        budget = SINGLE_PARTITION_ALLOWANCE.get(name, SINGLE_PARTITION_BUDGET)
        if n_single > budget:
            problems.append(f"{n_single} single-partition exchanges (budget {budget})")
        if problems:
            failures[name] = problems
            print(f"FAIL  {name}: {problems}", file=sys.stderr)
        else:
            print(f"ok    {name}", file=sys.stderr)
    print(
        json.dumps(
            {
                "audited": len(qs) - len(skipped),
                "skipped_streaming": len(skipped),
                "failures": failures,
                "wall_s": round(time.perf_counter() - t0, 1),
            }
        )
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
