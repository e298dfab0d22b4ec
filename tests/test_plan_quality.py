"""Physical-plan quality gates (the 100 TB contract, SURVEY.md §4.2).

Correctness tests prove WHAT each query computes; these prove HOW —
that Catalyst produced the plan we designed for scale: dimension joins
broadcast, filters reach the parquet scan, projections prune columns,
top-k never does a global sort, and range/as-of joins never degrade to
a cartesian product.  A regression here is a 100× cost bug at scale
even when every value still hash-matches.
"""

from __future__ import annotations

import pytest

import frizzle_spark.operators.chunking  # noqa: F401 - populate registry
import frizzle_spark.plans.joins_extra  # noqa: F401
import frizzle_spark.plans.multimodal_queries  # noqa: F401
import frizzle_spark.plans.relational  # noqa: F401
import frizzle_spark.operators.similarity  # noqa: F401
import frizzle_spark.operators.graph  # noqa: F401
import frizzle_spark.plans.sql_surface  # noqa: F401
import frizzle_spark.plans.text_queries  # noqa: F401
import frizzle_spark.plans.windows  # noqa: F401
from frizzle_spark.plans.registry import REGISTRY


def _plan(df) -> str:
    return df._jdf.queryExecution().toString()


@pytest.fixture()
def plan_of(spark, sf_dir):
    def get(name: str) -> str:
        return _plan(REGISTRY[name].fn(spark, sf_dir))

    return get


def test_q1_filter_pushed_to_scan(plan_of):
    plan = plan_of("q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_column_pruning(plan_of):
    plan = plan_of("q1_pricing_summary")
    scan = plan[plan.rindex("ReadSchema") :]
    # 7 of 11 lineitem columns are needed; l_orderkey/partkey/suppkey must not be read
    assert "l_orderkey" not in scan and "l_partkey" not in scan


def test_q2_dimension_joins_broadcast(plan_of):
    plan = plan_of("q2_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2, "region/nation must broadcast"
    assert "CartesianProduct" not in plan


def test_q3_topk_is_take_ordered(plan_of):
    # LIMIT 10 over a sort must compile to per-partition heap + merge,
    # never a global sort of the full join result
    assert "TakeOrderedAndProject" in plan_of("q3_top_orders")


def test_q4_semi_anti_join_types(plan_of):
    plan = plan_of("q4_semi_anti")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_range_join_keeps_equi_key(plan_of):
    # user_id equality must be the join key (hash/sort-merge); the time
    # bounds ride along as post-join condition — never a nested-loop
    plan = plan_of("q16_range_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_single_window_no_join(plan_of):
    # the union+window as-of must not contain ANY join operator
    plan = plan_of("q16_asof_join")
    phys = plan[plan.index("== Physical Plan ==") :]
    assert "Join" not in phys
    assert phys.count("Exchange hashpartitioning(key") == 1


def test_cosine_topk_broadcasts_probes(plan_of):
    plan = plan_of("q12_cosine_topk")
    assert "BroadcastNestedLoopJoin BuildRight" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_subqueries_decorrelate_to_joins(plan_of):
    # every subquery must rewrite to a join — IN/EXISTS → left-semi,
    # NOT EXISTS → left-anti, correlated scalar → aggregate+outer join;
    # a CartesianProduct or per-row re-execution would be the 100× bug
    plan = plan_of("q20_subqueries")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_range_frame_single_exchange(plan_of):
    # one hash partition on event_type, one sort, a linear frame scan —
    # no second shuffle, no join
    plan = plan_of("q20_range_frame")
    phys = plan[plan.index("== Physical Plan ==") :]
    assert phys.count("Exchange") == 1
    assert "RangeFrame" in phys and "Join" not in phys


def test_q1_whole_stage_codegen(spark, sf_dir):
    # agg over the scan must fuse into codegen stages, not interpreted ops
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    codegen = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "WholeStageCodegen" in codegen


def test_blocklist_dedup_is_broadcast_anti_join(plan_of):
    import frizzle_spark.operators.dedup  # noqa: F401 - populate registry

    plan = plan_of("q11_blocklist_dedup")
    assert "LeftAnti" in plan, "blocklist exclusion must be an anti join"
    assert "BroadcastHashJoin" in plan, "small blocklist side must broadcast"
    assert "SortMergeJoin" not in plan


def test_keep_latest_single_exchange_no_global_sort(plan_of):
    import frizzle_spark.operators.dedup  # noqa: F401

    plan = plan_of("q11_keep_latest")
    phys = plan[plan.index("== Physical Plan ==") :]
    # one hash partition on user_id; the per-key sort is partition-local
    assert phys.count("Exchange hashpartitioning(user_id") == 1
    assert "Exchange rangepartitioning" not in phys, "no global sort"


def test_grouping_sets_single_expand_single_shuffle(plan_of):
    plan = plan_of("q24_grouping_sets")
    phys = plan[plan.index("== Physical Plan ==") :]
    assert phys.count("Expand") == 1, "grouping sets = one Expand node"
    # dims broadcast; the only hash exchange is the grouping aggregate's
    assert "BroadcastHashJoin" in phys
    assert "SortMergeJoin" not in phys


def test_rank_stats_single_exchange(plan_of):
    plan = plan_of("q5_rank_stats")
    phys = plan[plan.index("== Physical Plan ==") :]
    assert phys.count("Exchange hashpartitioning") == 1
    assert "Join" not in phys


def test_ann_lsh_all_joins_broadcast(plan_of):
    """The corpus-derived LSH path must keep the corpus map-side: bucket
    probe and re-rank joins broadcast the (tiny, probe-bounded) side —
    never a SortMergeJoin that shuffles the corpus by candidate key."""
    plan = plan_of("qz12_ann_lsh")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_all_joins_broadcast(plan_of):
    """IVF candidate generation is a broadcast join on cluster id over
    the map-side-assigned corpus — the inverted-list layout IS the
    partitioning, so no corpus reshuffle may appear."""
    plan = plan_of("qz12_ivf")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_all_joins_broadcast(plan_of):
    """IVF-PQ candidate generation reuses IVF's broadcast join on
    cluster id over the map-side-ENCODED corpus (16-byte codes) — the
    coded stream must never reshuffle or fall into a nested-loop."""
    plan = plan_of("qz12_ivfpq")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_neardup_lsh_bucket_join_is_equi(plan_of):
    """The near-dup blocker's probe⋈coded self-join must stay a hash
    EQUI-join on (table_id, code) — both sides are corpus-sized, so a
    BroadcastNestedLoopJoin or CartesianProduct here would be the n²
    scan the blocker exists to avoid.  (A shuffle on the bucket key is
    the expected, correct shape — it carries 3-scalar code rows, never
    vectors.)"""
    plan = plan_of("qz11_embedding_neardup_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bm25_topk_heap_and_broadcast_stats(plan_of):
    """BM25's top-k must be per-partition heap + driver merge (never a
    global sort of scored documents), and the one-row corpus-stats join
    must broadcast — the corpus itself never shuffles."""
    plan = plan_of("qz14_bm25")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", ["qz10_sessionize", "qz5_scd2"])
def test_event_window_queries_single_exchange(plan_of, name):
    """Sessionize stacks two window passes, SCD2 one lead() — both over
    the same (user, ts) sort, so Catalyst must plan exactly ONE shuffle
    and ONE sort; a second Exchange would mean the shared partitioning
    was lost between window passes."""
    plan = plan_of(name)
    phys = plan[plan.index("== Physical Plan ==") :]
    assert phys.count("Exchange") == 1, phys
    assert phys.count("Sort ") == 1, phys


def test_phash_neardup_band_join_is_equi(plan_of):
    """The phash blocker's self-join must stay a hash EQUI-join on
    (band_id, band_val) — both sides are corpus-sized, so a nested-loop
    or cartesian here is the all-pairs scan banding exists to avoid."""
    plan = plan_of("qz15_phash_neardup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_source_cap_uses_window_group_limit(plan_of):
    """The per-source cap must plan as WindowGroupLimit: rank-then-filter
    pushes the top-N below the window sort so tasks keep a bounded heap
    per group (and prune map-side before the shuffle) instead of
    materializing and fully sorting every source's rows."""
    assert "WindowGroupLimit" in plan_of("qz22_source_cap")


def test_cdc_chunk_is_map_only(plan_of):
    """qz14_cdc_chunk must introduce NO shuffle: scan → project →
    Arrow-kernel fan-out, embarrassingly parallel end to end."""
    plan = plan_of("qz14_cdc_chunk")
    phys = plan[plan.rindex("== Physical Plan ==") :]
    assert "Exchange" not in phys, "CDC chunking must stay map-side"
    assert "MapInPandas" in phys


def test_chunk_dedup_single_join_bounded_kernel_runs(plan_of):
    """qz11_chunk_dedup: candidate pairs expand IN-ROW from fp-grouped
    doc lists (no self-join), the one real join streams the corpus-
    sized chunk-count table against the BROADCAST pair set, and the
    Arrow kernel may appear at most twice (pairs branch + per-doc-count
    branch) — a first cut consumed the chunk stream five times, five
    full corpus passes."""
    plan = plan_of("qz11_chunk_dedup")
    phys = plan[plan.rindex("== Physical Plan ==") :]
    assert phys.count("MapInPandas") <= 2, "chunk kernel must not fan out"
    assert phys.count("BroadcastHashJoin") == 1, "exactly the stats join"
    assert "SortMergeJoin" not in phys, "pair-stat join must broadcast"
    assert "CartesianProduct" not in phys


def test_sq8_single_exchange_for_topk(plan_of):
    """qz12_sq8 is a flat scan: one Arrow kernel over the corpus, then
    exactly ONE exchange (the probe-partitioned window top-k over the
    per-batch-pruned candidate stream).  More exchanges would mean the
    corpus itself is being reshuffled."""
    plan = plan_of("qz12_sq8")
    phys = plan[plan.rindex("== Physical Plan ==") :]
    assert "MapInPandas" in phys
    assert phys.count("Exchange hashpartitioning") == 1, phys.count("Exchange")
    assert "Join" not in phys, "flat scan has no join"


def test_hll_mergeable_partial_final_aggregation(plan_of):
    """qz9_hll_mergeable: both aggregations must be two-phase (map-side
    partial sketches, one narrow shuffle of sketch bytes) — the whole
    point of a mergeable sketch is that the exchange carries kilobyte
    sketches, not user ids."""
    plan = plan_of("qz9_hll_mergeable")
    phys = plan[plan.rindex("== Physical Plan ==") :]
    assert "partialhllsketchagg" in phys.lower().replace("_", ""), phys[:500]
    assert "ObjectHashAggregate" in phys or "HashAggregate" in phys
    assert "CartesianProduct" not in phys and "SortMergeJoin" not in phys


def test_windowed_topk_uses_window_group_limit(plan_of):
    """qz10_windowed_topk: the rnk <= K filter must push into the window
    sort (WindowGroupLimit keeps a K-row heap per window) and the only
    corpus-sized stage is the first aggregation's exchange."""
    plan = plan_of("qz10_windowed_topk")
    phys = plan[plan.rindex("== Physical Plan ==") :]
    assert "WindowGroupLimit" in phys
    assert "Join" not in phys and "CartesianProduct" not in phys


def test_rate_anomaly_window_over_reduced_rows(plan_of):
    """qz10_rate_anomaly: raw events feed exactly one aggregation
    exchange; the RANGE-frame window then partitions the already-
    reduced hourly table — its exchange must hash on event_type, and
    no join may appear."""
    plan = plan_of("qz10_rate_anomaly")
    phys = plan[plan.rindex("== Physical Plan ==") :]
    assert "RangeFrame" in phys
    assert "Join" not in phys and "CartesianProduct" not in phys
    assert phys.count("Exchange hashpartitioning") == 2  # agg + window


def test_skew_agg_two_exchanges_narrow_rows(plan_of):
    """qz19_skew_agg: exactly two hash exchanges — (key, salt) partial
    then key-final — and no join; the corpus-sized stage is only the
    first partial aggregation."""
    plan = plan_of("qz19_skew_agg")
    phys = plan[plan.rindex("== Physical Plan ==") :]
    assert phys.count("Exchange hashpartitioning") == 2
    assert "Join" not in phys and "CartesianProduct" not in phys


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Runtime-filter machinery for the 100 TB fact⋈filtered-dim shape:
    when the dim side carries a selective predicate and broadcast is
    off (too big to broadcast at scale), Catalyst should inject a bloom
    filter — build `bloom_filter_agg` over the dim keys, apply
    `might_contain` on the fact scan — so the big side is pruned
    BEFORE the shuffle.  Thresholds are scoped down because the local
    corpus is tiny; at production scale the defaults (10 MB creation /
    10 GB application) gate it to exactly this shape."""
    from pyspark.sql import functions as F

    from frizzle_spark.sources.tables import load_table

    scoped = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in scoped}
    try:
        for k, v in scoped.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().toString()
        assert "bloom_filter_agg" in plan, "no bloom filter built on the dim side"
        assert "might_contain" in plan, "bloom filter not applied to the fact side"
        assert j.count() > 0  # and the filtered plan still answers
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Hive-layout complement to the bloom-filter gate: when the fact
    table is directory-partitioned on the join key and the dim side
    carries a filter on another column, Catalyst must inject a
    dynamicpruning#N subquery into the fact SCAN — at 100 TB this skips
    whole partition directories at file-listing time, before any IO.
    (The dim must be a real scan — a local-relation dim defeats DPP's
    benefit estimation; that shape is itself pinned here by contrast.)"""
    from pyspark.sql import functions as F

    from frizzle_spark.sources.tables import load_table

    d = str(tmp_path)
    load_table(spark, sf_dir, "events").write.partitionBy("event_type").parquet(
        f"{d}/ev"
    )
    spark.createDataFrame(
        [(t, i) for i, t in enumerate(["purchase", "signup", "view", "click", "error"])],
        "event_type string, type_id long",
    ).write.parquet(f"{d}/dim")
    part = spark.read.parquet(f"{d}/ev")
    dim = spark.read.parquet(f"{d}/dim").where(F.col("type_id") == 0)
    j = part.join(dim, "event_type").agg(F.count(F.lit(1)).alias("n"))
    plan = j._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan.lower(), "DPP subquery not injected"
    # and the pruned plan still answers exactly: only 'purchase' rows
    want = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert j.collect()[0]["n"] == want


def test_weighted_sample_is_take_ordered(plan_of):
    """Weighted sampling must be a top-N heap (TakeOrderedAndProject),
    never a global sort shuffle."""
    plan = plan_of("qz22_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_tfidf_topk_uses_window_group_limit_and_broadcasts(plan_of):
    """Per-doc top-3 must push the rank limit into the shuffle
    (WindowGroupLimit) and the vocabulary df join must broadcast."""
    plan = plan_of("qz14_tfidf_keywords")
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_lateness_audit_single_exchange(plan_of):
    """Window and groupBy share the user_id key — AQE must plan ONE
    exchange, not two."""
    plan = plan_of("qz10_lateness_audit")
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("Exchange hashpartitioning") == 1, phys


def test_forward_fill_single_exchange(plan_of):
    """LOCF is one window pass: exactly one hash exchange by key."""
    plan = plan_of("qz5_forward_fill")
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("Exchange hashpartitioning") == 1, phys


def test_length_buckets_boundary_join_is_broadcast_single_row(plan_of):
    """The quantile-boundary join must be a broadcast of ONE stats row
    (BNLJ on a 1-row side — the qz14_bm25-class deliberate shape),
    never a shuffle of the corpus against its own aggregate."""
    plan = plan_of("qz22_length_buckets")
    phys = plan.split("== Physical Plan ==")[1]
    assert "BroadcastNestedLoopJoin" in phys or "BroadcastHashJoin" in phys
    assert phys.count("Exchange hashpartitioning") <= 1  # only the final groupBy


def test_spark4_surface_queries_are_map_only(plan_of):
    """variant/try/collation scoring are single codegen scans — no
    exchange anywhere before the (collation) final 1-row aggregate."""
    for name in ("qz8_variant", "qz8_try_errors"):
        phys = plan_of(name).split("== Physical Plan ==")[1]
        assert "Exchange" not in phys, f"{name} shuffles:\n{phys}"


def test_sql_udf_inlines_to_plain_aggregate(plan_of):
    """CREATE FUNCTION scalar UDFs must vanish at plan time — no
    python worker, no UDF node; the plan is the same HashAggregate the
    inline expression produces."""
    phys = plan_of("qz21_sql_udf").split("== Physical Plan ==")[1]
    assert "HashAggregate" in phys
    assert "BatchEvalPython" not in phys and "PythonUDF" not in phys


def test_range_search_zero_shuffle_broadcast_probes(plan_of):
    """qz12_range_search: broadcast probes + per-row predicate — NO
    exchange anywhere (the whole operator is one corpus scan)."""
    plan = plan_of("qz12_range_search")
    tail = plan[plan.index("== Physical Plan =="):]
    assert "BroadcastExchange" in tail
    import re
    shuffles = len(re.findall(r"Exchange (?:hash|range|Single)", tail))
    assert shuffles == 0, f"expected zero shuffles, plan has {shuffles}"


def test_mips_broadcasts_probes(plan_of):
    plan = plan_of("qz12_mips")
    tail = plan[plan.index("== Physical Plan =="):]
    assert "BroadcastExchange" in tail
    assert "CartesianProduct" not in tail


def test_chi2_single_corpus_scan(plan_of):
    """qz23_chi2: row/col/grand totals re-aggregate the checkpointed
    cell table — the events parquet must appear in NO scan of the
    downstream plan (the one corpus read happened at checkpoint
    time)."""
    plan = plan_of("qz23_chi2")
    tail = plan[plan.index("== Physical Plan =="):]
    assert "events.parquet" not in tail
    assert "ExistingRDD" in tail or "Scan ExistingRDD" in tail


def test_temporal_split_filter_pushed(plan_of):
    """The embargo predicate must reach the parquet scan."""
    plan = plan_of("qz22_temporal_split")
    assert "PushedFilters" in plan and "ts" in plan[plan.index("PushedFilters"):][:200]


def test_snapshot_diff_single_join(plan_of):
    """One full-outer join on the key, no extra exchanges beyond its
    two sides + AQE final."""
    plan = plan_of("qz17_snapshot_diff")
    tail = plan[plan.index("== Physical Plan =="):]
    join_lines = [ln for ln in tail.splitlines() if "Join" in ln]
    assert len(join_lines) == 1 and "FullOuter" in join_lines[0], join_lines
    assert "CartesianProduct" not in tail


def test_bitmap_semijoin_never_shuffles_fact(plan_of):
    """The whole point of the bitmap semi-join reduction: the fact
    table reaches the aggregate through BROADCAST joins only — the
    sole hash exchanges are the ≤1024-row bitmap build (by word) and
    the final tiny priority aggregate.  No sort-merge join anywhere."""
    plan = plan_of("qz26_bitmap_semijoin")
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("BroadcastHashJoin") == 2, phys
    assert "SortMergeJoin" not in phys
    assert phys.count("Exchange hashpartitioning") == 2, phys
    assert "bit_or" in phys  # the bitmap build is a real aggregate


def test_cusum_single_corpus_scan_no_join(plan_of):
    """CUSUM touches raw events exactly once (the daily aggregate);
    the prefix-scan closed form is windows over the derived table —
    no join, no second scan."""
    plan = plan_of("qz23_cusum")
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("FileScan parquet") == 1, phys
    assert "Join" not in phys, phys


def test_autocorr_single_corpus_scan_no_join(plan_of):
    """ACF = one corpus aggregate + lag window + final aggregate —
    a no-join plan with a single events scan."""
    plan = plan_of("qz10_autocorr")
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("FileScan parquet") == 1, phys
    assert "Join" not in phys, phys


def test_triangles_edge_joins_never_cartesian(plan_of):
    """Triangle counting must stay equi-join algebra over the skinny
    edge list — a theta/cartesian fallback would be the n² disaster
    the ordered two-path formulation exists to avoid."""
    plan = plan_of("qz25_triangles")
    phys = plan.split("== Physical Plan ==")[1]
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_mad_outliers_single_exchange_no_join(plan_of):
    """Median and MAD window aggregates share the event_type
    partitioning: ONE physical exchange, one corpus scan, no join."""
    plan = plan_of("qz23_mad_outliers")
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("Exchange hashpartitioning") == 1, phys
    assert phys.count("FileScan parquet") == 1, phys
    assert "Join" not in phys, phys


def test_copurchase_basket_table_materialized_once(plan_of):
    """The basket self-join must stay equi-join algebra (the only
    nested-loop is the sanctioned 1-row basket-count fold), and the
    five basket consumers must read the checkpointed skinny table,
    not re-scan lineitem⋈part per consumer (≤2 file scans total;
    0 once the lazy checkpoint has materialized)."""
    plan = plan_of("qz26_copurchase")
    phys = plan.split("== Physical Plan ==")[1]
    assert "CartesianProduct" not in phys
    assert phys.count("BroadcastNestedLoopJoin") <= 1, phys
    assert phys.count("FileScan parquet") <= 2, phys


def test_band_join_is_bucketed_equi_join(plan_of):
    """The ±δ band join must run as an equi-join on the δ-width bucket
    key (2× expansion via explode) — never a theta-join cartesian/
    nested-loop fallback."""
    plan = plan_of("qz16_band_join")
    phys = plan.split("== Physical Plan ==")[1]
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys
    assert "Explode" in phys or "Generate" in phys, phys


# ---------------------------------------------------------------------------
# TPC-H completion block (plans/tpch_extra.py) — representatives.  The
# block's 100 TB contract: every dimension side broadcasts, exactly ONE
# exchange carries fact rows per fact pass, filters (including the Q19
# disjunction) reach the parquet scan, and top-k compiles to a heap.
# ---------------------------------------------------------------------------
def _phys(plan: str) -> str:
    return plan[plan.index("== Physical Plan ==") :]


def test_tpch_volume_shipping_one_fact_shuffle_all_dims_broadcast(plan_of):
    phys = _phys(plan_of("qz27_volume_shipping"))
    assert phys.count("BroadcastHashJoin") == 5, "supplier/customer/n1/n2 + orders side must broadcast"
    assert phys.count("Exchange hashpartitioning") == 1, "only the groupBy may shuffle"
    assert "CartesianProduct" not in phys
    assert "GreaterThanOrEqual(l_shipdate" in phys, "ship-date filter must reach the scan"


def test_tpch_disjunctive_rev_pushes_or_filter(plan_of):
    phys = _phys(plan_of("qz27_disjunctive_rev"))
    # the three OR'd quantity bands must reach the lineitem scan as one
    # pushed Or(...) — the difference between scanning 1/3 and 3/3 of
    # the fact table at 100 TB
    assert "Or(Or(" in phys
    assert phys.count("BroadcastHashJoin") == 1
    assert phys.count("Exchange hashpartitioning") == 0, "map-only up to the 1-row agg"


def test_tpch_returned_items_topk_is_heap(plan_of):
    phys = _phys(plan_of("qz27_returned_items"))
    assert "TakeOrderedAndProject" in phys, "LIMIT 20 must be heap+merge, not a global sort"
    assert "EqualTo(l_returnflag,R)" in phys, "returnflag filter must reach the scan"
    assert phys.count("Exchange hashpartitioning") == 1


def test_tpch_big_orders_agg_side_broadcasts_back(plan_of):
    phys = _phys(plan_of("qz27_big_orders"))
    # the >190 survivor set is tiny: it must broadcast into orders and
    # customer joins — the fact table shuffles once (the orderkey agg)
    assert phys.count("BroadcastHashJoin") == 2
    assert phys.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in phys


def test_tpch_idle_customers_anti_join_and_1row_threshold(plan_of):
    phys = _phys(plan_of("qz27_idle_customers"))
    assert "LeftAnti" in phys
    # the avg-acctbal threshold is a guaranteed-1-row broadcast fold —
    # the ONLY tolerated nested-loop shape
    assert phys.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in phys
    assert "GreaterThanOrEqual(o_orderdate,2000-06-01" in phys, "recency filter must prune orders at the scan"


def test_tpch_small_qty_rev_brand_filter_pushed(plan_of):
    phys = _phys(plan_of("qz27_small_qty_rev"))
    assert "EqualTo(p_brand,Brand#1)" in phys
    assert "CartesianProduct" not in phys and "BroadcastNestedLoopJoin" not in phys


def test_bpe_pairs_vocab_fold_then_heap(plan_of):
    phys = _phys(plan_of("qz14_bpe_pairs"))
    # two shuffles exactly: the word-occurrence fold and the pair fold
    # (pairs expand from the DISTINCT word table, corpus-size-independent)
    assert phys.count("Exchange hashpartitioning") == 2
    assert "TakeOrderedAndProject" in phys, "top-50 must be heap+merge"
    assert "Python" not in phys, "pair expansion must stay in codegen"


def test_repeated_ngrams_md5_shuffle_no_python(plan_of):
    phys = _phys(plan_of("qz11_repeated_ngrams"))
    # window expansion in codegen; the only shuffles are the two-phase
    # distinct-doc count over (fp, doc_id) — text never crosses the wire
    assert phys.count("Exchange hashpartitioning") == 2
    assert "Python" not in phys
    assert "md5" in phys, "shuffle key must be the fingerprint, not the window text"


def test_ordered_set_aggs_one_sort_per_group_pass(plan_of):
    phys = _phys(plan_of("qz28_ordered_set_aggs"))
    # exact order statistics need one hash-partitioned sort per group —
    # and nothing more (no global sort, no cartesian fallback)
    assert phys.count("Exchange hashpartitioning") == 3
    assert "CartesianProduct" not in phys
    assert phys.count("BroadcastHashJoin") == 1, "mode side must broadcast"


def test_attribution_band_join_keeps_equi_key(plan_of):
    phys = _phys(plan_of("qz10_attribution"))
    # user_id must be the hash key; the 7-day band rides as a post-join
    # predicate — never a nested loop over purchases×touches
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_asof_forward_is_single_window_no_join(plan_of):
    phys = _phys(plan_of("qz16_asof_forward"))
    assert "Join" not in phys, "forward as-of must stay union+window"
    assert phys.count("Exchange hashpartitioning") == 1


def test_contribution_one_fact_shuffle_windows_over_grid(plan_of):
    phys = _phys(plan_of("qz7_contribution"))
    assert phys.count("BroadcastHashJoin") == 4, "all dims must broadcast"
    assert phys.count("Exchange hashpartitioning") == 1, "one fact shuffle; shares are windows over the 25-row grid"
    assert "CartesianProduct" not in phys


def test_sliding_distinct_band_join_broadcasts_anchors(plan_of):
    phys = _phys(plan_of("qz10_sliding_distinct"))
    # the ≤|active-days|-row anchor list is the broadcast side of the
    # band join (nested-loop over a tiny broadcast IS the design);
    # activity must never be the build side
    assert phys.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in phys


def test_division_two_shrinking_aggregations_no_join(plan_of):
    phys = _phys(plan_of("qz20_division"))
    assert "Join" not in phys, "count-matching division needs no join at all"
    assert phys.count("Exchange hashpartitioning") == 2
    assert "GreaterThanOrEqual(o_orderdate" in phys, "year filter must reach the scan"


def test_basket_rules_no_cartesian(plan_of):
    phys = _phys(plan_of("qz26_basket_rules"))
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_tpch_priority_check_semi_join_short_circuits(plan_of):
    phys = _phys(plan_of("qz27_priority_check"))
    # EXISTS must decorrelate to a LeftSemi (first-match short-circuit),
    # never a pair-materializing inner join + distinct
    assert "LeftSemi" in phys
    assert "CartesianProduct" not in phys
    assert phys.count("Exchange hashpartitioning") <= 2, (
        "semi join + priority histogram only; no extra repartitions"
    )


def test_tpch_waiting_suppliers_decorrelated_no_self_join_blowup(plan_of):
    phys = _phys(plan_of("qz27_waiting_suppliers"))
    # the EXISTS / NOT EXISTS pair must run as ONE per-order aggregate,
    # not the l1×l2×l3 three-way self-join (quadratic per hot order)
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys
    assert phys.count("Exchange hashpartitioning") <= 4, (
        "per-order agg + candidate join + final groupBy; a self-join "
        "translation adds pair-blowup shuffles beyond this budget"
    )


def test_peak_concurrency_single_partition_only_on_hour_spine(plan_of):
    phys = _phys(plan_of("qz10_peak_concurrency"))
    # the running sum must be partitioned by hour; the ONLY total order
    # allowed is the calendar-bounded hour spine (≤ |hours| rows)
    assert phys.count("Exchange SinglePartition") == 1
    assert "CartesianProduct" not in phys
    assert phys.count("Window") == 2, "in-hour running sum + hour-offset prefix"


def test_ref_integrity_six_folded_joins_no_cartesian(plan_of):
    phys = _phys(plan_of("qz23_ref_integrity"))
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys
    # six FK edges = six outer joins, each folded to a 1-row aggregate
    assert phys.count("LeftOuter") == 6
    assert "Union" in phys


def test_streaks_window_partitioned_by_user(plan_of):
    phys = _phys(plan_of("qz10_streaks"))
    # the gaps-and-islands window must be per-user, never a global sort
    assert "Exchange SinglePartition" not in phys
    assert "CartesianProduct" not in phys


def test_source_overlap_inverted_index_no_cartesian(plan_of):
    phys = _phys(plan_of("qz14_source_overlap"))
    # pairwise intersection must ride the token equi-join (inverted
    # index), never a source×source cross product over vocabularies
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys
