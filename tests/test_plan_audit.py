"""Physical-plan regression tests: the scale properties we audit with
.explain("formatted") — pushdown, pruning, join strategy, top-k shape,
shuffle counts — asserted mechanically so a refactor that silently
degrades a plan (drops a pushed filter, widens a scan, turns a
broadcast join into a shuffle join) fails CI, not a 100 TB run.

These read plans, not data: each test builds the query at sf0.01 and
inspects the executedPlan string. Assertions target plan SHAPE (which
operators appear / how many exchanges), not costs — shapes are stable
across Spark versions at fixed data scale; costs are not.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


@pytest.fixture(scope="module")
def registry(spark):
    # earlier suites may have persist()ed frames derived from the same
    # parquet; a cached InMemoryRelation replaces the parquet scan node
    # and hides ReadSchema/PushedFilters — audit plans against cold scans
    spark.catalog.clearCache()
    from covsonar_spark.registry import REGISTRY
    return REGISTRY


def test_q1_filter_pushed_and_schema_pruned(spark, registry):
    plan = _plan(registry["q1_pricing_summary"][0](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # scan must NOT read the 11-column table for a 7-column aggregate
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" not in read and "l_suppkey" not in read


def test_documents_scans_prune_to_two_columns(spark, registry):
    plan = _plan(registry["text_token_stats"][0](spark, SF))
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "source" not in read and "n_chars" not in read


def test_q5_dimension_joins_broadcast_no_sort_merge(spark, registry):
    plan = _plan(registry["q5_local_supplier_volume"][0](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q18_aggregates_before_join_with_topk(spark, registry):
    plan = _plan(registry["q18_large_orders"][0](spark, SF))
    assert "TakeOrderedAndProject" in plan          # top-k, not global sort
    # the lineitem aggregate must sit BELOW the first join: find operator
    # order in the tree rendering (HashAggregate line before any join line)
    lines = plan.splitlines()
    first_agg = next(i for i, l in enumerate(lines) if "HashAggregate" in l)
    first_join = next(i for i, l in enumerate(lines) if "Join" in l)
    assert first_join < first_agg  # tree prints top-down: join consumes agg


def test_anti_join_build_side_projected_to_key(spark, registry):
    plan = _plan(registry["join_parts_never_ordered"][0](spark, SF))
    assert "LeftAnti" in plan
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    li_read = [l for l in reads if "l_partkey" in l][0]
    assert "l_extendedprice" not in li_read and "l_quantity" not in li_read


def test_asof_join_is_single_window_exchange(spark, registry):
    plan = _plan(registry["events_asof_attribution"][0](spark, SF))
    tree = plan.split("\n\n")[0]
    # one Exchange for the union+window join; the trailing orderBy of the
    # registry wrapper adds one more — anything beyond that is regression
    assert tree.count("Exchange") <= 2
    assert "Window" in tree
    assert "SortMergeJoin" not in tree and "BroadcastNestedLoopJoin" not in tree


def test_interval_join_no_nested_loop_no_distinct(spark, registry):
    plan = _plan(registry["events_concurrent_sessions"][0](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_match_metadata_filters_pushed(spark, registry):
    plan = _plan(registry["match_metadata_filters"][0](spark, SF))
    assert "PushedFilters" in plan and "PushedFilters: []" not in plan.split(
        "PushedFilters", 1)[1][:2]


def test_bigram_lm_two_explodes_windowed_context_count(spark, registry):
    plan = _plan(registry["text_bigram_lm"][0](spark, SF))
    assert "Generate" in plan
    # exactly three reads of documents: model explode, score explode,
    # vocab — and c(w1,·) comes from a window over the aggregated model
    # frame, NOT a third explode + full-corpus shuffle
    assert plan.count("documents.parquet") <= 3
    assert ") Window" in plan


def test_salted_collect_two_phase(spark, registry):
    plan = _plan(registry["agg_salted_collect"][0](spark, SF))
    # two aggregation levels (partial per (key, salt), final per key) —
    # at least two ObjectHashAggregate/HashAggregate pairs in the tree
    assert plan.count("Aggregate") >= 4
    assert "CartesianProduct" not in plan


def test_hybrid_search_no_full_sort_of_corpus(spark, registry):
    plan = _plan(registry["hybrid_search_rrf"][0](spark, SF))
    # final top-10 via TakeOrderedAndProject, not a global Sort+Limit
    assert "TakeOrderedAndProject" in plan


def test_bigram_lm_no_cartesian(spark, registry):
    plan = _plan(registry["text_bigram_lm"][0](spark, SF))
    assert "CartesianProduct" not in plan
    # the one-row vocab frame joins via broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# --- round-2 join suite (operators/tpch.py) -------------------------------

def test_q2_catalog_and_window_share_one_shuffle(spark, registry):
    plan = _plan(registry["q2_min_cost_supplier"][0](spark, SF))
    tree = plan.split("\n\n")[0]
    # one Exchange for repartition(l_partkey) — reused by the groupBy
    # (subset-key clustering) and the window — plus one for the final
    # orderBy's range partitioning; broadcasts don't count (different node)
    non_broadcast = [l for l in tree.splitlines()
                     if "Exchange" in l and "Broadcast" not in l]
    assert len(non_broadcast) <= 2, non_broadcast
    assert "Window" in tree
    assert "SortMergeJoin" not in tree
    # the part-slice semi-join prunes the fact BELOW the aggregate:
    # in top-down print, the first (partial) HashAggregate appears
    # above a broadcast LeftSemi join on the lineitem branch, so the
    # repartition/groupBy never shuffles partkeys the slice discards
    lines = tree.splitlines()
    first_agg = next(i for i, l in enumerate(lines)
                     if "HashAggregate" in l)
    semis = [i for i, l in enumerate(lines)
             if "BroadcastHashJoin" in l and "LeftSemi" in l]
    assert any(s > first_agg for s in semis), (first_agg, semis)


def test_q10_aggregates_fact_before_reporting_join(spark, registry):
    plan = _plan(registry["q10_returned_items"][0](spark, SF))
    lines = plan.splitlines()
    # the customer reporting join must consume the per-custkey aggregate:
    # in top-down tree print, a join appears above the (partial) aggregate
    first_agg = next(i for i, l in enumerate(lines) if "HashAggregate" in l)
    joins = [i for i, l in enumerate(lines) if "Join" in l]
    assert any(j < first_agg for j in joins)
    assert "TakeOrderedAndProject" in plan  # top-20, not a global sort


def test_q13_outer_join_preserves_customers_filter_pushed(spark, registry):
    plan = _plan(registry["q13_customer_distribution"][0](spark, SF))
    assert "LeftOuter" in plan
    # the priority filter reaches the orders scan, not a post-join Filter
    assert "PushedFilters: [IsNotNull(o_orderpriority), Not(EqualTo(o_orderpriority" in plan


def test_q19_shared_conjunct_pushed_disjunction_residual(spark, registry):
    plan = _plan(registry["q19_disjunctive"][0](spark, SF))
    # factored-out conjunct pushed into the lineitem scan
    assert "Not(EqualTo(l_returnflag,R))" in plan
    # the equi-join survives (no nested-loop fallback for the OR residual)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q22_anti_join_build_side_pruned_and_filtered(spark, registry):
    plan = _plan(registry["q22_global_sales"][0](spark, SF))
    assert "LeftAnti" in plan
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    orders_read = [l for l in reads if "o_custkey" in l][0]
    # anti-join build side reads exactly the key + pushed date column
    assert "o_totalprice" not in orders_read and "o_orderstatus" not in orders_read
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q7_all_dims_broadcast_single_fact_shuffle_pair(spark, registry):
    plan = _plan(registry["q7_volume_shipping"][0](spark, SF))
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan
    # ship-date window pushed to the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_q6_pure_scan_agg_everything_pushed(spark, registry):
    plan = _plan(registry["q6_forecast_revenue"][0](spark, SF))
    # every predicate lands in the parquet scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24" in plan
    # scan reads only the 4 referenced columns of 11
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_partkey", "l_suppkey", "l_returnflag", "l_tax"):
        assert col not in read
    # no wide shuffle at all: the only exchange is the single-partition final agg
    tree = plan.split("\n\n")[0]
    assert "hashpartitioning" not in tree


def test_q9_single_fact_scan_all_dims_broadcast(spark, registry):
    plan = _plan(registry["q9_product_profit"][0](spark, SF))
    assert plan.count("lineitem.parquet") == 1
    # part's name filter pushed as a string-contains into its scan
    assert "StringContains(p_name,red)" in plan
    assert "BroadcastHashJoin" in plan


def test_q11_threshold_via_window_one_fact_scan(spark, registry):
    # the scalar-subquery threshold must NOT duplicate the aggregate subtree
    plan = _plan(registry["q11_important_stock"][0](spark, SF))
    assert plan.count("lineitem.parquet") == 1
    assert ") Window" in plan


def test_q12_lateness_residual_single_pass_counts(spark, registry):
    plan = _plan(registry["q12_shipping_priority_classes"][0](spark, SF))
    # cross-table lateness predicate cannot push; it must not force a
    # nested-loop join — the orderkey equi-join survives with a residual
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("lineitem.parquet") == 1 and plan.count("orders.parquet") == 1


def test_q16_distinct_catalog_below_joins_anti_broadcast(spark, registry):
    plan = _plan(registry["q16_parts_supplier_relationship"][0](spark, SF))
    lines = plan.splitlines()
    # the (partkey, suppkey) distinct collapses the fact BEFORE any join:
    # top-down, every join sits above the deepest HashAggregate pair
    tree = plan.split("\n\n")[0]
    assert "LeftAnti" in plan
    read = [l for l in lines if "ReadSchema" in l and "l_partkey" in l][0]
    # catalog scan reads exactly the two key columns
    assert "l_extendedprice" not in read and "l_shipdate" not in read


def test_q20_rollup_and_window_share_partkey_shuffle(spark, registry):
    plan = _plan(registry["q20_excess_stock_suppliers"][0](spark, SF))
    assert plan.count("lineitem.parquet") == 1
    assert ") Window" in plan
    tree = plan.split("\n\n")[0]
    # shuffles: repartition(l_partkey) + distinct(l_suppkey) + final sort —
    # the groupBy and the window both reuse the repartition's clustering
    non_broadcast = [l for l in tree.splitlines()
                     if "Exchange" in l and "Broadcast" not in l]
    assert len(non_broadcast) <= 3, non_broadcast


def test_q21_decorrelated_single_scan_single_orderkey_shuffle(spark, registry):
    # the EXISTS/NOT-EXISTS pair is decorrelated into window counts: the
    # literal self-join form scans the fact three times (lineage is a tree)
    plan = _plan(registry["q21_waiting_suppliers"][0](spark, SF))
    assert plan.count("lineitem.parquet") == 1
    assert "SortMergeJoin" not in plan
    assert ") Window" in plan


# ---------------------------------------------------------------------------
# round-3 families: OLAP surface, time-series, graph, sketches, fuzzy
# ---------------------------------------------------------------------------

def test_cube_expands_once_single_wide_shuffle(spark, registry):
    plan = _plan(registry["agg_cube_revenue"][0](spark, SF))
    # CUBE = Expand (4 grouping sets) + partial agg BELOW one exchange —
    # never four separate scans
    assert "Expand" in plan
    assert plan.count("orders.parquet") == 1
    tree = plan.split("\n\n")[0]
    non_broadcast = [l for l in tree.splitlines()
                     if "Exchange" in l and "Broadcast" not in l]
    assert len(non_broadcast) <= 2, non_broadcast  # agg + final sort


def test_pivot_no_value_discovery_scan_dims_broadcast(spark, registry):
    plan = _plan(registry["pivot_revenue_matrix"][0](spark, SF))
    # explicit pivot values -> exactly one fact scan (no distinct-values
    # pre-job materializes in this plan), dims broadcast
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_histogram_bounds_broadcast_scan_pruned(spark, registry):
    plan = _plan(registry["agg_histogram"][0](spark, SF))
    # the min/max bounds row is broadcast into the binning scan — the
    # big scan is never range-partitioned or windowed
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert all("o_orderdate" not in r and "o_orderpriority" not in r
               for r in reads)  # both scans pruned to o_totalprice


def test_stats_moments_are_partial_aggregates(spark, registry):
    plan = _plan(registry["agg_stats_profile"][0](spark, SF))
    # corr/covar/stddev/regr_slope all merge map-side: partial + final
    # HashAggregate pair around exactly one wide exchange
    tree = plan.split("\n\n")[0]
    non_broadcast = [l for l in tree.splitlines()
                     if "Exchange" in l and "Broadcast" not in l]
    assert len(non_broadcast) <= 2, non_broadcast
    assert plan.count("lineitem.parquet") == 1


def test_ewma_fold_stays_jvm_side(spark, registry):
    plan = _plan(registry["ts_ewma"][0](spark, SF))
    # the EWMA recurrence runs as a codegen'd higher-order function —
    # not a Python UDF round-trip
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "aggregate(" in plan or "Aggregate" in plan


def test_zscore_stats_broadcast_one_fact_pass_per_stage(spark, registry):
    plan = _plan(registry["ts_anomaly_zscore"][0](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_ranks_broadcast_per_iteration(spark, registry):
    plan = _plan(registry["graph_pagerank"][0](spark, SF))
    # rank vectors are tiny (#nations) — every iteration joins them
    # broadcast; the fact is scanned once to build weighted edges
    assert "BroadcastHashJoin" in plan


def test_hll_registers_merge_map_side(spark, registry):
    plan = _plan(registry["sketch_hll_distinct"][0](spark, SF))
    # register build is a partial-mergeable (group, bucket) max — no
    # Python anywhere, no sort-based aggregation fallback for the sketch
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fuzzy_join_blocked_not_cartesian(spark, registry):
    plan = _plan(registry["join_fuzzy_levenshtein"][0](spark, SF))
    # candidate generation is equi-join on blocking keys — the verify
    # step must never degrade to a cross product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_dedup_single_window_shuffle_no_python(spark, registry):
    plan = _plan(registry["text_chunk_dedup"][0](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert ") Window" in plan


def test_skew_diagnose_topk_no_global_sort(spark, registry):
    plan = _plan(registry["skew_diagnose"][0](spark, SF))
    # heavy-key report must use per-partition top-k heaps, never rank
    # the full key-count frame through one window task
    assert "TakeOrderedAndProject" in plan


def test_trailing_range_single_custkey_shuffle(spark, registry):
    plan = _plan(registry["window_trailing_range"][0](spark, SF))
    assert plan.count("orders.parquet") == 1
    assert ") Window" in plan


def test_profiler_single_scan(spark, registry):
    plan = _plan(registry["profile_table_stats"][0](spark, SF))
    # all per-column stats come from ONE pass (Expand for the multiple
    # DISTINCTs), not one scan per column
    assert plan.count("orders.parquet") == 1


def test_basket_rules_item_supports_broadcast(spark, registry):
    plan = _plan(registry["basket_association_rules"][0](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_forecast_regression_partial_aggregates(spark, registry):
    plan = _plan(registry["forecast_linear_trend"][0](spark, SF))
    assert plan.count("orders.parquet") == 1
    assert "BatchEvalPython" not in plan


def test_runtime_bloom_filter_prunes_fact_probe(spark):
    """Spark's runtime bloom-filter join pruning — the mechanism that
    makes a selective-dim ⋈ huge-fact SortMergeJoin viable at 100 TB:
    the dim side's keys aggregate into a bloom filter that filters the
    fact scan BEFORE the shuffle (might_contain on the probe side).
    Local thresholds are sized for multi-GB inputs, so the audit
    lowers them to prove the plan rewrite fires on our join shape."""
    from pyspark.sql import functions as F

    saved = {k: spark.conf.get(k) for k in (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = (spark.read.parquet(f"{SF}/orders.parquet")
             .where(F.col("o_orderpriority") == "1-URGENT"))
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = _plan(j)
        assert "might_contain" in plan          # probe-side pruning filter
        assert "bloom_filter_agg" in plan       # build-side filter creation
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_new_family_plan_shapes(spark, registry):
    """Pin the documented plan shapes of the quality/sampling/sketch
    additions: scan counts and shuffle inventory match the docstrings."""
    from covsonar_spark.plans import plan_report

    # dq audit: scalar rules fused into ONE orders pass + the FK
    # anti-join's second pass — never one scan per rule
    r = plan_report(registry["dq_constraint_audit"][0](spark, SF))
    assert r.scan_count("orders") == 2 and r.scan_count("customer") == 1
    assert r.python_free

    # priority sampling: pure codegen scan + top-k, zero shuffles
    r = plan_report(registry["sample_weighted_priority"][0](spark, SF))
    assert (r.scan_count("documents"), r.wide_exchanges, r.top_k) == (1, 0, 1)
    assert r.python_free

    # normalized dedup: exactly the cost of exact dedup — one scan
    r = plan_report(registry["dedup_normalized"][0](spark, SF))
    assert r.scan_count("documents") == 1 and r.python_free

    # HLL set algebra: register table materialized once; only the
    # exact-answer comparison re-reads the fact
    r = plan_report(registry["sketch_hll_setops"][0](spark, SF))
    assert r.scan_count("orders") <= 1   # exact side; regs are checkpointed

    # PQ: scoring plan reads the vectors once and top-k's twice
    # (pool + re-rank), no wide shuffle of the vectors
    r = plan_report(registry["ann_pq_topk"][0](spark, SF))
    assert r.scan_count("embeddings") == 1
    assert r.top_k >= 1


def test_dynamic_partition_pruning_on_month_layout(spark, tmp_path):
    """The store's partition-by-month layout must benefit from Spark's
    dynamic partition pruning: joining the month-partitioned fact to a
    filtered dim injects a runtime dynamicpruning subquery into the
    fact's PartitionFilters — only the dim's surviving months are
    scanned, the join-driven analogue of the static month pruning
    store.essence() does for date predicates."""
    from pyspark.sql import functions as F

    d = str(tmp_path)
    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .withColumn("month", F.date_format("o_orderdate", "yyyy-MM")))
    o.write.partitionBy("month").mode("overwrite").parquet(d + "/fact")
    (o.select("month", "o_orderpriority").distinct()
     .withColumnRenamed("o_orderpriority", "dim_priority")
     .write.mode("overwrite").parquet(d + "/dim"))
    fact = spark.read.parquet(d + "/fact")
    dim = (spark.read.parquet(d + "/dim")
           .where(F.col("dim_priority") == "1-URGENT"))
    plan = _plan(fact.join(dim, "month").groupBy("dim_priority").count())
    assert "dynamicpruningexpression" in plan


def test_lsh_knn_pair_generation_single_shuffle_no_cache(spark):
    """Candidate pairs come from ONE hash-aggregate shuffle over the
    24-byte bucket rows (collect_list) + JVM-side explodes — no
    self-join of the Python bucket stage, no InMemoryRelation."""
    from covsonar_spark.operators.similarity import lsh_knn_join

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(lsh_knn_join(emb, k=2, n_planes=4, rerank="join"))
    assert "InMemoryTableScan" not in plan
    assert plan.count("Generate") >= 2          # the two pair explodes
    # the rerank joins pairs back to the vector table twice on id
    assert plan.count("Scan parquet") >= 3      # buckets + va + vb


def test_cosine_grid_no_broadcast_no_cartesian(spark):
    """The grid path must contain no broadcast of the corpus, no
    cartesian product, and exactly one wide shuffle into the cell
    aggregation (plus AQE reads)."""
    from covsonar_spark.operators.similarity import cosine_pairs_exact

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import re

    plan = _plan(cosine_pairs_exact(emb, 0.3, mode="grid", n_blocks=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" not in plan
    assert "FlatMapGroupsInPandas" in plan      # per-cell scoring
    # exactly one shuffle, on (ci, cj) — count the detail headers
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_in_filter_flips_to_semijoin_at_threshold(spark, monkeypatch):
    """apply_in_filter: literal isin below IN_SEMIJOIN_THRESHOLD (no
    join in the plan), broadcast left_semi/left_anti above it, with
    identical results — including NOT-IN's NULL semantics (NULL field
    values match neither side)."""
    from pyspark.sql import functions as F

    from covsonar_spark.operators import predicates as P

    df = spark.range(500).select(
        F.col("id"),
        F.when(F.col("id") % 50 == 0, None).otherwise(
            F.concat(F.lit("L."), (F.col("id") % 40).cast("string")))
        .alias("lineage"))
    values = [f"L.{k}" for k in range(0, 40, 2)]

    lit_in = P.apply_in_filter(df, "lineage", values)
    lit_not = P.apply_in_filter(df, "lineage", values, negate=True)
    assert "Join" not in _plan(lit_in) and "Join" not in _plan(lit_not)

    monkeypatch.setattr(P, "IN_SEMIJOIN_THRESHOLD", 10)
    semi = P.apply_in_filter(df, "lineage", values)
    anti = P.apply_in_filter(df, "lineage", values, negate=True)
    p_semi, p_anti = _plan(semi), _plan(anti)
    assert "LeftSemi" in p_semi and "BroadcastHashJoin" in p_semi
    assert "LeftAnti" in p_anti and "BroadcastHashJoin" in p_anti

    key = lambda frame: sorted(r["id"] for r in frame.collect())  # noqa: E731
    assert key(semi) == key(lit_in) and key(lit_in)
    assert key(anti) == key(lit_not) and key(lit_not)
    # NULL lineage rows appear in NEITHER result (NOT IN is NULL, and
    # the anti path filters NULLs explicitly)
    nulls = {r["id"] for r in df.where(F.col("lineage").isNull()).collect()}
    assert not nulls & set(key(semi)) and not nulls & set(key(anti))


def test_match_engine_lineage_semijoin_identical(spark, monkeypatch):
    """The match engine's lineage IN-list goes through the same flip:
    forcing the threshold low turns the lineage filter into a
    broadcast semi-join with byte-identical match results."""
    from pyspark.sql import functions as F

    from covsonar_spark.operators import predicates as P
    from covsonar_spark.operators.match import MatchEngine, MatchQuery
    from covsonar_spark.schemas import ESSENCE_COLUMNS

    base = spark.range(200).select(
        F.concat(F.lit("ACC"), F.col("id").cast("string")).alias("accession"),
        F.concat(F.lit("L."), (F.col("id") % 8).cast("string")).alias("lineage"))
    for c in ESSENCE_COLUMNS:
        if c in ("accession", "lineage"):
            continue
        if c in ("dna_profile", "aa_profile", "fs_profile"):
            base = base.withColumn(c, F.array().cast("array<string>"))
        elif c in ("date", "submission_date"):
            base = base.withColumn(c, F.lit(None).cast("date"))
        elif c == "ct":
            base = base.withColumn(c, F.lit(None).cast("double"))
        elif c == "imported":
            base = base.withColumn(c, F.lit(None).cast("timestamp"))
        else:
            base = base.withColumn(c, F.lit(None).cast("string"))
    essence = base.select(*ESSENCE_COLUMNS)

    q = MatchQuery(lineages=["L.1", "L.3", "L.5"])
    before = sorted(r["accession"]
                    for r in MatchEngine(essence).run(q).collect())
    monkeypatch.setattr(P, "IN_SEMIJOIN_THRESHOLD", 2)
    plan_df = MatchEngine(essence).run(q)
    assert "LeftSemi" in _plan(plan_df)
    after = sorted(r["accession"] for r in plan_df.collect())
    assert after == before and before


# --- registry-wide invariant sweep (round 8) ------------------------------

# Rows whose plan legitimately contains a BroadcastNestedLoopJoin: every
# one broadcasts a SCALAR or tiny derived frame (a corpus-wide average,
# a quantile threshold, a one-row vocab size) where no equi-key exists —
# the broadcast side is O(1) rows by construction.  Derived by
# tools/plan_sweep.py; a NEW name appearing here must be justified the
# same way before being added.
BNLJ_ALLOWED = {
    "q22_global_sales", "basket_association_rules", "text_bigram_lm",
    "agg_histogram", "hybrid_search_rrf",
    "sample_dsir", "text_tfidf_topk", "text_quality_gate",
    "text_pmi_collocations", "sketch_histogram_quantile",
    "skew_diagnose", "dedup_substring", "dq_constraint_audit",
    # r10 §20: the node census is a broadcast 1-row aggregate crossed
    # into each rank frame (the SQL twin's CROSS JOIN nn) — O(1) rows
    # by construction, replacing an eager count() job
    "graph_pagerank",
}

_WIDE = ("lineitem", "orders", "documents", "events")


def _scan_reads(plan):
    """[(table, set(cols))] for every parquet FileScan in the plan."""
    import re
    out = []
    for m in re.finditer(
            r"Location:.*?\[([^\]]*)\][\s\S]*?ReadSchema: struct<([^>]*)>",
            plan):
        tm = re.search(r"/(\w+)\.parquet", m.group(1))
        if tm:
            out.append((tm.group(1),
                        {c.split(":")[0].strip()
                         for c in m.group(2).split(",") if c.strip()}))
    return out


def test_registry_plan_invariants_sweep(spark, registry):
    """Every registry plan, four invariants the per-query audits above
    don't cover row-by-row (a silent plan regression — lost pushdown,
    new cartesian — would pass the value-correctness gates):

      1. no CartesianProduct anywhere;
      2. BroadcastNestedLoopJoin only on the scalar-broadcast allowlist;
      3. every scan of a WIDE fact table (lineitem/orders/documents/
         events) is column-pruned — a scan reading every column for a
         narrower projection means pruning silently broke;
      4. no SortMergeJoin keyed on the always-tiny nation/region dims
         (25/5 rows at ANY scale factor — those joins must broadcast).
    """
    full = {t: set(spark.read.parquet(f"{SF}/{t}.parquet").columns)
            for t in _WIDE}
    bad = {}
    for name, (fn, _sql) in registry.items():
        plan = _plan(fn(spark, SF))
        row = []
        if "CartesianProduct" in plan:
            row.append("cartesian")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            row.append("bnlj")
        unpruned = [t for t, cols in _scan_reads(plan)
                    if t in full and cols >= full[t]]
        if unpruned:
            row.append(f"unpruned:{sorted(set(unpruned))}")
        if any("SortMergeJoin" in l
               and ("n_nationkey" in l or "r_regionkey" in l)
               for l in plan.splitlines()):
            row.append("smj_on_tiny_dim")
        if row:
            bad[name] = row
    assert not bad, bad


def test_semantic_dedup_single_pass_labeling_no_fact_join(spark, registry):
    """Round-8 shape: cluster labels come from ONE vector-carrying
    assign pass over the driver-held centroids — there is no big-big
    label join (the old shape shuffled the fact on both sides of a
    SortMergeJoin to re-attach labels the assign pass already had);
    the only join is the broadcast of the tiny per-cluster size frame."""
    plan = _plan(registry["dedup_semantic"][0](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
