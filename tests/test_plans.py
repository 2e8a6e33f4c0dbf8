"""Physical-plan property regression tests: the scale-critical plan shapes
(SCALE.md §1) pinned as assertions, so a refactor that silently loses a
pushdown, broadcast, or top-k strategy fails here instead of at 100 TB."""

import pytest

import __spark_entry__ as _entry

QUERIES = _entry.queries()


def plan_of(spark, sf_dir, name, mode: str = "extended") -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_filter_predicates_reach_parquet_scan(spark, sf_dir):
    # "formatted" prints each scan's PushedFilters on its own untruncated
    # line ("extended" elides long attribute lists once exprIds grow)
    plan = plan_of(spark, sf_dir, "q_filter_predicate", "formatted")
    assert "GreaterThan(l_quantity,45.0)" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_tpch_q6_all_predicates_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_tpch_q6", "formatted")
    for pushed in (
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
        "GreaterThanOrEqual(l_shipdate,",
    ):
        assert pushed in plan, f"missing pushed predicate {pushed}"


def test_multiway_join_is_all_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_join_multiway")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan  # dims must never trigger a fact shuffle


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_topk")
    assert "TakeOrderedAndProject" in plan


def test_projection_prunes_scan_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_map_project")
    # ReadSchema must carry only the projected columns, not all 11
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "l_extendedprice" in read[0] and "l_returnflag" not in read[0]


def test_group_agg_has_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_group_agg")
    assert "partial_" in plan  # map-side combine before the exchange


def test_parmap_uses_arrow_not_row_python(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_parmap_ordered")
    assert "ArrowEvalPython" in plan  # vectorized, never BatchEvalPython
    assert "BatchEvalPython" not in plan


def test_tpch_q5_is_all_broadcast_single_fact_scan(spark, sf_dir):
    """Q5's five dims (pruned orders, customer, supplier, ASIA nations)
    must all broadcast — one lineitem scan, no SortMergeJoin, and the
    only exchange after the joins is the tiny per-nation aggregate."""
    plan = plan_of(spark, sf_dir, "q_tpch_q5")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_tpch_q19_derives_pushed_conjuncts_from_disjunction(spark, sf_dir):
    """The three-branch OR spans both join sides; Catalyst must still
    derive the lineitem-only bound (l_quantity <= 30 appears in every
    branch) and push it into the scan rather than evaluating the whole
    OR post-join."""
    plan = plan_of(spark, sf_dir, "q_tpch_q19", "formatted")
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_quantity,30.0)" in plan


def test_tpch_q21_single_shuffle_decorrelation(spark, sf_dir):
    """EXISTS + NOT EXISTS are decorrelated into one per-order aggregate:
    exactly one set of exchanges keyed on l_orderkey, never two semi-join
    passes (no left-semi/anti operators in the plan)."""
    plan = plan_of(spark, sf_dir, "q_tpch_q21")
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "TakeOrderedAndProject" in plan  # top-10, not a global sort


def test_tpch_q15_scans_lineitem_once(spark, sf_dir):
    """The scalar-max filter is a window over the aggregated rev table,
    so the fact is scanned exactly once (the naive max-subquery form
    duplicates the whole rev subplan when exchange reuse doesn't fire)."""
    plan = plan_of(spark, sf_dir, "q_tpch_q15")
    assert plan.count("lineitem.parquet]") == 1


def test_hash_sample_filter_is_scan_side(spark, sf_dir):
    """The md5-bucket sample must evaluate in the scan stage (narrow,
    pre-shuffle): the plan has exactly one exchange — the final per-flag
    aggregate — so sampling cost is scan speed at any corpus size."""
    plan = plan_of(spark, sf_dir, "q_hash_sample")
    import re

    n_exchanges = len(re.findall(r"Exchange (?:hashpartitioning|SinglePartition)", plan))
    assert n_exchanges <= 2  # partial->final agg exchange only (AQE may print both specs)
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_funnel_is_single_user_shuffle(spark, sf_dir):
    """The 3-stage funnel must cost exactly one data shuffle (groupBy
    user collects all stage arrays at once) plus the 1-row final-count
    exchange — no per-stage passes, no self-joins."""
    plan = plan_of(spark, sf_dir, "q_funnel")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "user_id" in plan.split("Exchange hashpartitioning", 1)[1].split("\n", 1)[0]


def test_cohort_retention_no_self_join(spark, sf_dir):
    """Cohorting uses a partition-only window, not the naive first-event
    self-join: no Join nodes, two exchanges total (user window + final
    weeks-squared aggregate)."""
    plan = plan_of(spark, sf_dir, "q_cohort_retention")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_heavy_hitters_topk_is_take_ordered(spark, sf_dir):
    """Corpus top-20 bigrams: partial (map-side) aggregation before the
    gram exchange, then TakeOrderedAndProject — never a global sort."""
    plan = plan_of(spark, sf_dir, "q_ngram_heavy_hitters")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan or "partial count" in plan


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Runtime bloom-filter join pruning (SCALE.md §6): when a fact-fact
    join's build side carries a selective predicate, Catalyst injects a
    bloom filter of the build keys into the probe side's scan stage —
    at 100 TB this drops most fact rows BEFORE the shuffle instead of
    after it. The default thresholds target cluster sizes (probe scan
    > 10 GB); pinned here with thresholds scaled to the fixture so the
    injection machinery itself is proven."""
    from simple_stream_processor_spark.tables import load_table
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100GB")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        li = load_table(spark, "lineitem", sf_dir)
        orders = load_table(spark, "orders", sf_dir).where(F.col("o_orderpriority") == "1-URGENT")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._sc._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "extended")
        assert "might_contain" in plan  # bloom probe injected into the fact scan stage
        # and it must sit below the join, filtering l_orderkey
        probe_line = next(ln for ln in plan.splitlines() if "might_contain" in ln)
        assert "l_orderkey" in probe_line
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """Grouped top-k must engage WindowGroupLimit: the rank filter is
    pushed into the sort as per-partition group limits, so no partition
    materializes fully sorted at 100 TB."""
    plan = plan_of(spark, sf_dir, "q_topk_per_group")
    assert "WindowGroupLimit" in plan


@pytest.mark.parametrize(
    "name,max_data_exchanges",
    [
        ("q_scd2_intervals", 1),    # one user/type shuffle, no final agg
        ("q_latest_snapshot", 1),   # one shuffle + in-partition top-1
        ("q_rolling_time_window", 1),
        ("q_topk_per_group", 1),
        ("q_funnel_by_segment", 2),  # funnel exchange + segment agg (dim broadcasts)
        ("q_linear_attribution", 3),  # two event slices by user + click agg
    ],
)
def test_exchange_budget(spark, sf_dir, name, max_data_exchanges):
    """Shuffle budgets for the event-analytics family: a refactor that
    adds a hidden exchange (lost broadcast, re-partition, second scan)
    fails here instead of at 100 TB."""
    plan = plan_of(spark, sf_dir, name)
    n = plan.count("Exchange hashpartitioning")
    assert n <= max_data_exchanges, f"{name}: {n} > {max_data_exchanges}"
    if name == "q_funnel_by_segment":
        assert "BroadcastHashJoin" in plan  # the dim must never shuffle the funnel side


def test_spread_noops_when_scan_already_parallel(spark, sf_dir):
    """tables.spread must add its exchange ONLY below the parallelism floor:
    on a cluster (scan already split across >= cores partitions) the
    similarity/gram operators stay genuinely narrow. A spread that
    repartitions an already-parallel input would silently add a corpus
    shuffle at 100 TB."""
    from pyspark.sql import functions as F

    from simple_stream_processor_spark.tables import spread

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000).repartition(target, F.col("id"))
    assert spread(wide, "id") is wide  # no new plan node at all
    narrow = spark.range(0, 10_000).coalesce(1)
    assert spread(narrow, "id").rdd.getNumPartitions() == target


def test_sequence_pack_single_fact_exchange(spark, sf_dir):
    """Packing = one hash exchange on source; the running-sum window and the
    (source, bin) aggregate both reuse it (subset-key distribution). A
    second fact exchange would double the corpus shuffle at scale."""
    plan = plan_of(spark, sf_dir, "q_sequence_pack")
    n = plan.count("Exchange hashpartitioning")
    assert n <= 2  # spread's id exchange + the source window exchange
    assert "Exchange rangepartitioning" not in plan  # never a global sort


def test_corpus_delta_shuffles_digests_only(spark, sf_dir):
    """The snapshot anti join must move 16-byte digests, not text: no plan
    stage may carry the text column past its md5 projection."""
    plan = plan_of(spark, sf_dir, "q_corpus_delta", "formatted")
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", plan):
        assert "text" not in m.group(1)


def test_watermark_cadence_no_global_rank(spark, sf_dir):
    """Block assignment on the dense event_id testdata must be arithmetic
    (count_window_scalable trick), never a global row_number: the
    record-level path has no rank window, and the only single-partition
    exchange is the per-block running max over the N×-smaller block
    table (VERDICT r2 "What's wrong" #1)."""
    plan = plan_of(spark, sf_dir, "q_watermark_cadence")
    import re

    assert "row_number" not in plan
    assert len(re.findall(r"Exchange SinglePartition", plan)) <= 1


def test_source_cap_single_exchange_window_group_limit(spark, sf_dir):
    """Per-source cap: the rank filter must stay WindowGroupLimit-eligible
    (per-source totals broadcast in from a separate aggregate — stacking a
    count window on top would disable the pushdown and fully sort every
    group), with only the source-keyed window + tiny agg exchanges."""
    plan = plan_of(spark, sf_dir, "q_source_cap")
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_hard_negatives_corpus_never_shuffles(spark, sf_dir):
    """Hard-negative mining: probes broadcast into a nested-loop scoring
    stage; the only hash exchange is the per-probe top-k window on the
    (tiny) scored side — the corpus itself never hash-partitions."""
    plan = plan_of(spark, sf_dir, "q_hard_negatives")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_bm25_has_mapside_combine(spark, sf_dir):
    """BM25: term frequencies must combine map-side before the (doc,token)
    exchange; df and corpus stats broadcast back."""
    plan = plan_of(spark, sf_dir, "q_bm25_topterms")
    assert "partial_count" in plan or "partial count" in plan
    assert "BroadcastHashJoin" in plan


def test_pq_codebooks_broadcast_into_assignment(spark, sf_dir):
    """Product quantization: the posexplode codebook aggregate must combine
    map-side, and the k×M codebook table must broadcast into the narrow
    assignment stage — the corpus subvectors never hash-shuffle for it."""
    plan = plan_of(spark, sf_dir, "q_pq_codes")
    assert "partial_avg" in plan or "partial avg" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sweep_concurrency_no_global_running_sum(spark, sf_dir):
    """Interval concurrency must use the two-level prefix sum: the only
    single-partition window is over the per-bucket table (rows/bucket_size
    rows); record-level running sums are partition-local per bucket."""
    plan = plan_of(spark, sf_dir, "q_interval_concurrency")
    import re

    assert len(re.findall(r"Exchange SinglePartition", plan)) <= 1
    assert "row_number" not in plan


@pytest.mark.slow  # r11: ~100 s whole-registry sweep; the gate runs plan_audit standalone anyway
def test_plan_audit_whole_repo(spark, sf_dir):
    """Global plan lint (tools/plan_audit.py) over every non-streaming
    declared query: no row-at-a-time Python eval, no non-broadcast
    cartesian product, and single-partition exchanges within the
    per-query budget (default 1; explicit justified allowances only)."""
    import re as _re

    from tools.plan_audit import (
        FORBIDDEN,
        SINGLE_PARTITION_ALLOWANCE,
        SINGLE_PARTITION_BUDGET,
        STREAMING_PREFIXES,
    )

    failures = {}
    for name in QUERIES:
        if name.startswith(STREAMING_PREFIXES):
            continue
        plan = plan_of(spark, sf_dir, name)
        problems = [pat for pat in FORBIDDEN if pat in plan]
        n_single = len(_re.findall(r"Exchange SinglePartition", plan))
        budget = SINGLE_PARTITION_ALLOWANCE.get(name, SINGLE_PARTITION_BUDGET)
        if n_single > budget:
            problems.append(f"{n_single} single-partition exchanges > {budget}")
        if problems:
            failures[name] = problems
    assert not failures, failures


def test_aqe_splits_skewed_sort_merge_join(spark):
    """AQE skew-join handling, proven live (SCALE.md §3): a fact table
    where ONE key owns half the rows, sort-merge-joined under thresholds
    scaled to the fixture, must come out of adaptive execution with the
    skewed partition split (skew=true in the final plan) — the runtime
    half of the skew story (salting, q_salted_join, is the deterministic
    half)."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        n = 200_000
        fact = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
            # the payload must SURVIVE the join (max(pay) below): column
            # pruning would otherwise shrink the hot partition under the
            # skew threshold and nothing would trigger
            F.concat(F.lit("payload_"), F.col("id"), F.lit("x" * 40)).alias("pay"),
        )
        dim = spark.range(1000).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))
        j = fact.join(dim, "k").groupBy("name").agg(F.count(F.lit(1)).alias("c"), F.max("pay").alias("mp"))
        rows = j.collect()  # execute THIS plan so AQE finalizes it
        assert sum(r.c for r in rows) == n  # correctness under the split
        final_plan = j._sc._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "simple")
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_plan_audit_rules_are_not_vacuous(spark):
    """The linter must actually fire: a deliberately row-at-a-time Python
    UDF plan contains BatchEvalPython, and a non-broadcast cross join
    contains CartesianProduct — the two patterns tools/plan_audit.py
    forbids across the registry."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    def explain(df):
        return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "extended")

    bad_udf = F.udf(lambda x: x + 1, LongType(), useArrow=False)
    assert "BatchEvalPython" in explain(spark.range(5).select(bad_udf(F.col("id"))))

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert "CartesianProduct" in explain(spark.range(3).crossJoin(spark.range(3)))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_top_paths_one_timeline_exchange(spark, sf_dir):
    """All three window passes (sessionize lag, sid prefix sum, per-session
    rank) must ride the single user-keyed exchange — the user-hash
    partitioning satisfies the (user, sid) window's clustered-distribution
    requirement, so adding a second timeline shuffle is a regression. The
    rn <= 3 filter must also stay WindowGroupLimit-pushed."""
    plan = plan_of(spark, sf_dir, "q_top_paths")
    assert plan.count("Exchange hashpartitioning") == 2  # timeline + path counts
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan


def test_unigram_surprisal_corpus_never_shuffles_for_scoring(spark, sf_dir):
    """The unigram table must broadcast back into the token stream: the
    scoring join must be broadcast (corpus side stays narrow), with the
    only exchanges being the vocab count aggregate and the per-doc avg."""
    plan = plan_of(spark, sf_dir, "q_unigram_surprisal")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_merge_upsert_rank_filters_push_to_window_group_limit(spark, sf_dir):
    """Both sides' latest-per-key compactions must stay rank-filter
    (WindowGroupLimit) eligible so the merge join carries key cardinality,
    not history."""
    plan = plan_of(spark, sf_dir, "q_merge_upsert")
    assert plan.count("WindowGroupLimit") >= 2


def test_kmeans_assignment_is_narrow_no_rank_window(spark, sf_dir):
    """Lloyd assignment must stay an argmin over the broadcast packed
    centroid array — a rank-window argmin (the ivf_assign shape) would
    re-shuffle the corpus once per iteration. The only joins are the
    one-row packed-centroid broadcasts."""
    plan = plan_of(spark, sf_dir, "q_kmeans")
    assert "Window" not in plan  # no rank-window argmin anywhere
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 2  # one packed-centroid row per assignment pass


def test_bloom_index_probes_broadcast(spark, sf_dir):
    """Filter/probe joins ride word- and group-cardinality tables — a
    SortMergeJoin would mean something record-level is shuffling."""
    plan = plan_of(spark, sf_dir, "q_bloom_index")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # decoy probe + ndocs + hits


def test_training_order_single_partition_is_bucket_table_only(spark, sf_dir):
    """The global ordinal must come from the two-level prefix sum: exactly
    ONE single-partition exchange (the 256-row bucket offset window), with
    the intra-bucket rank partition-local and offsets broadcast back."""
    plan = plan_of(spark, sf_dir, "q_training_order")
    assert plan.count("Exchange SinglePartition") == 1
    assert "BroadcastHashJoin" in plan


def test_pagerank_rank_joins_broadcast_and_edges_checkpointed(spark, sf_dir):
    """Every per-iteration join must broadcast the node-cardinality side
    (shares/deg) — a SortMergeJoin would re-shuffle the edge table each
    round; the basket self-join runs once into the checkpointed edge RDD
    and the scalar node count crosses one partition exactly once."""
    plan = plan_of(spark, sf_dir, "q_pagerank")
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange SinglePartition") == 1
    assert "ExistingRDD" in plan  # edges materialized once, not per iteration
    assert "TakeOrderedAndProject" in plan


def test_ann_pq_lookup_is_broadcast_take_ordered(spark, sf_dir):
    """ADC serving: the probe's distance table and the codebooks must
    broadcast (the corpus side never SortMergeJoins), and the top-10 is a
    TakeOrdered head, never a global sort."""
    plan = plan_of(spark, sf_dir, "q_ann_pq")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan


def test_runtime_bloom_filter_prunes_shuffle_join_probe_side(spark, sf_dir):
    """Runtime row-level filtering, proven live (the third runtime lever
    beside AQE coalescing and skew-split): when a selective dimension
    filter feeds a SHUFFLE join, Spark's runtime bloom-filter injection
    (spark.sql.optimizer.runtime.bloomFilter.*) must build a bloom
    aggregate on the filtered side and push a might_contain probe into
    the fact scan — at 100 TB this is the difference between shuffling
    every lineitem row and shuffling only the ~5% that can join. The
    session disables broadcast for the test (a broadcast join would get
    DPP-style pruning for free; bloom is the SMJ/SHJ story) and restores
    every conf after."""
    from pyspark.sql import functions as F

    from simple_stream_processor_spark.tables import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, "lineitem", sf_dir)
        o = load_table(spark, "orders", sf_dir).where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), f"no bloom filter injected:\n{plan[:1500]}"
        rows = j.collect()
        # value check: the bloom filter must not change the join result
        exact = (
            load_table(spark, "lineitem", sf_dir)
            .join(
                load_table(spark, "orders", sf_dir).where(
                    F.col("o_orderpriority") == "1-URGENT"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert rows[0]["n"] == exact
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
