"""Physical-plan regression guards: the scale-critical plan properties
(pushdown, broadcast, partial agg, top-k) must not silently degrade."""

from __future__ import annotations

import pytest

import rc_rag_spark.queries as q


def plan_of(spark, sf_dir, name: str) -> str:
    df = q.REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q02_revenue_forecast")
    # plan toString truncates the filter list — presence of pushed
    # predicates on the scan is the guard
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q07_customer_geography")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    assert "partial_sum" in plan or "partial_count" in plan


def test_global_topk_avoids_full_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q19_top20_orders")
    assert "TakeOrderedAndProject" in plan


def test_column_pruning(spark, sf_dir):
    """A 3-column projection must not scan all 11 lineitem columns."""
    plan = plan_of(spark, sf_dir, "q28_slice_scan")
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" not in scan_line
    assert "l_shipdate" not in scan_line


def test_semi_and_anti_join_operators(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "q10_big_spenders")
    assert "LeftAnti" in plan_of(spark, sf_dir, "q11_inactive_customers")


def test_no_cartesian_in_nonequi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q14_premium_lineitems")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exchange_reuse_on_identical_subplans(spark, sf_dir):
    """A self-join over the identical aggregate subplan must execute
    ONE shuffle and reuse it (ReusedExchange / reused ShuffleQueryStage).
    (Two *different* aggregates over the same base do NOT reuse — column
    pruning specializes each scan, which is the better trade.)"""
    from pyspark.sql import functions as F

    from rc_rag_spark.sources import table

    o = table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    left = agg.alias("l")
    right = agg.withColumnRenamed("n", "n2").alias("r")
    j = left.join(right.hint("merge"), "o_custkey")
    j.collect()  # finalize the adaptive plan
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "reuse" in plan.lower(), plan[:1500]


def test_multires_rollup_reuses_cascade_stages(spark, sf_dir):
    """q93's three union branches share the minute-agg lineage; AQE
    must execute the scan + minute shuffle ONCE and reuse it (and the
    hour shuffle) instead of re-scanning per branch."""
    import rc_rag_spark.queries as q

    df = q.REGISTRY["q93_multires_rollup"].fn(spark, sf_dir)
    df.collect()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 2, plan[:1500]


def test_fact_table_never_broadcast_built(spark, sf_dir):
    """q08/q98 pin shuffle_hash on lineitem: the fact table must join
    via ShuffledHashJoin, never become a broadcast build side (locally
    its file size sits under the broadcast threshold and Catalyst
    would otherwise build the whole fact hash relation in one task)."""
    for name in ("q08_regional_revenue", "q98_small_quantity_revenue"):
        plan = plan_of(spark, sf_dir, name)
        assert "ShuffledHashJoin" in plan, name


def test_q108_decorrelated_exists_shapes(spark, sf_dir):
    """Q21 shape: the EXISTS/NOT EXISTS pair must decorrelate into
    LeftSemi + LeftAnti hash joins keyed on orderkey — never a
    nested-loop over the fact table."""
    plan = plan_of(spark, sf_dir, "q108_waiting_sole_late_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q110_disjunction_implies_scan_filters(spark, sf_dir):
    """Q19 shape: the OR-of-conjunctions must contribute implied
    single-side filters that push into the part scan (brand IN ...)
    rather than evaluating the whole disjunction only post-join."""
    plan = plan_of(spark, sf_dir, "q110_disjunctive_part_bands")
    scan_lines = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("p_brand" in l for l in scan_lines), plan[:2000]
    assert "BroadcastHashJoin" in plan


def test_q111_scalar_subquery_single_row_broadcast(spark, sf_dir):
    """Q22 shape: the average-balance scalar must arrive via a one-row
    broadcast join, and the NOT EXISTS via LeftAnti."""
    plan = plan_of(spark, sf_dir, "q111_rich_inactive_segments")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q112_single_fact_scan_window_reuses_agg(spark, sf_dir):
    """Q2-shape: the correlated MIN decorrelates to a window over the
    aggregated table — lineitem is scanned ONCE, and no join back to a
    second lineitem pass exists."""
    plan = plan_of(spark, sf_dir, "q112_min_cost_supplier")
    assert plan.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan


def test_q122_interpolation_single_exchange(spark, sf_dir):
    """Gap interpolation: mirrored unbounded frames over one window
    sort — exactly one hash exchange, never a self-join."""
    plan = plan_of(spark, sf_dir, "q122_interpolate_gaps")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_q123_nearest_asof_single_exchange(spark, sf_dir):
    """Nearest as-of: both directional matches from ONE exchange of
    the union (two in-partition sorts are fine; a second shuffle or a
    join is not)."""
    plan = plan_of(spark, sf_dir, "q123_nearest_view_match")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_q125_q126_no_theta_join(spark, sf_dir):
    """Sliding distinct and PassJoin: candidates come from equi-joins
    with bounded explode fan-out — never a cartesian/nested-loop."""
    for name in ("q125_rolling_distinct_users", "q126_edit_distance_pairs"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q132_hll_sketch_partial_agg(spark, sf_dir):
    """HLL rolling distinct: sketches built and merged via the
    aggregate path (partial per-day sketch, union merge), no
    cartesian anywhere."""
    plan = plan_of(spark, sf_dir, "q132_rolling_distinct_hll")
    assert "CartesianProduct" not in plan
    assert "hll_sketch_agg" in plan and "hll_union_agg" in plan


def test_q72a_features_no_cartesian(spark, sf_dir):
    """Feature build is explode->partial-agg joins; the only
    nested-loop is the broadcast of the single-row pair count."""
    plan = plan_of(spark, sf_dir, "q72a_retrieval_features")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_q134_salted_join_no_cartesian(spark, sf_dir):
    """Salting must stay pure equi-join on (key, salt): the dim
    explode is bounded S-way fan-out, never a nested loop."""
    plan = plan_of(spark, sf_dir, "q134_salted_skew_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "q138_cohort_retention",
        "q139_pagerank_trade_graph",
        "q140_copurchase_lift",
        "q142_referential_audit",
    ],
)
def test_round3_queries_no_cartesian(spark, sf_dir, name):
    """Round-3 breadth queries: every join is an equi-join (the only
    tolerated nested-loop is a broadcast single-row scalar attach)."""
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert plan.count("BroadcastNestedLoopJoin") <= 1, name


@pytest.mark.parametrize(
    "name",
    [
        "q145_triangle_count",
        "q146_khop_neighborhood",
        "q148_scd_merge",
        "q149_session_funnel",
        "q150_mad_outliers",
        "q153_entropy_profile",
    ],
)
def test_analytics_queries_no_cartesian(spark, sf_dir, name):
    """Analytics batch: graph joins, merge, funnel, profiling — all
    equi-joins; tolerated nested-loops are only the broadcast attach
    of ≤3 single-row scalar aggregates (q145's count fold)."""
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert plan.count("BroadcastNestedLoopJoin") <= 2, name


def test_q152_priority_sample_topk(spark, sf_dir):
    """Weighted sampling must be per-partition top-k + k-row merge,
    never a global sort."""
    plan = plan_of(spark, sf_dir, "q152_priority_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q147_decay_single_exchange(spark, sf_dir):
    """8-lag decayed score: ONE hash exchange on user_id, one window
    sort — no self-join, no explode."""
    plan = plan_of(spark, sf_dir, "q147_decayed_event_score")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_q154_rrf_arm_truncation_topk(spark, sf_dir):
    """Each RRF arm must truncate via per-partition top-k (TakeOrdered)
    before the rank window — never a corpus-wide rank sort."""
    plan = plan_of(spark, sf_dir, "q154_rrf_hybrid_fusion")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q156_incremental_merge_no_cartesian(spark, sf_dir):
    """Base+delta merge is one full-outer hash join on the key."""
    plan = plan_of(spark, sf_dir, "q156_incremental_agg")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "q164_range_bucket_join",
        "q165_weighted_median",
        "q166_monthly_churn",
        "q167_ab_welch_t",
    ],
)
def test_final_batch_no_cartesian(spark, sf_dir, name):
    """Closing batch: boundary range-probe and the two-arm stat attach
    are the only tolerated broadcast nested loops (≤10-row broadcast
    side); no cartesian products."""
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert plan.count("BroadcastNestedLoopJoin") <= 2, name


def test_profile_and_corr_are_single_scan(spark, sf_dir):
    """q189/q197 unpivot via stack() from ONE aggregate row — a union
    of per-column selects would rescan the table per branch (AQE does
    not reuse aggregate exchanges across union children)."""
    for name in ("q189_column_profile", "q197_correlation_matrix"):
        plan = plan_of(spark, sf_dir, name)
        assert plan.count("Scan parquet") == 1, name


def test_kmv_topk_limit_pushdown(spark, sf_dir):
    """q196's literal rank<=K filter must push a per-partition
    LocalLimit below the global ordering (TakeOrdered shape) — the
    non-literal rk==ke comparison alone would single-partition-sort
    every distinct hash."""
    df = q.REGISTRY["q196_kmv_distinct"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalLimit" in opt


def test_weighted_reservoir_takeordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q207_weighted_reservoir")
    assert "TakeOrderedAndProject" in plan


def test_kmv_sketch_only_has_no_exact_join(spark, sf_dir):
    """q283's production path (sketch_only=True) must contain NO join
    keyed on raw column values — the exact distinct-join audit (one
    shuffle per candidate pair, dead on a 500-table warehouse) is the
    thing the flag removes. The audit variant keeps it, proving the
    assertion has teeth. The sketch merges remain TakeOrdered-shaped
    and Window-free in both variants."""
    import re

    from rc_rag_spark.queries.discovery import kmv_joinability

    exact_key = re.compile(r"Join.*\[k#\d+")

    prod = kmv_joinability(spark, sf_dir, sketch_only=True)
    plan = prod._jdf.queryExecution().executedPlan().toString()
    assert not any(exact_key.search(l) for l in plan.splitlines())
    assert "n_common" not in prod.columns
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan

    audit = kmv_joinability(spark, sf_dir, sketch_only=False)
    aplan = audit._jdf.queryExecution().executedPlan().toString()
    assert any(exact_key.search(l) for l in aplan.splitlines())
    assert "n_common" in audit.columns
    assert "Window" not in aplan

    # the estimates themselves are identical across variants
    est_cols = [c for c in prod.columns]
    assert sorted(map(tuple, prod.collect())) == sorted(
        map(tuple, audit.select(*est_cols).collect())
    )


def test_q287_partial_window_group_limit(spark, sf_dir):
    """The skewed dedup window's rn=1 filter must keep planning a
    PARTIAL WindowGroupLimit below the exchange — losing it
    single-tasks the mega domain (SCALING.md r11)."""
    plan = plan_of(spark, sf_dir, "q287_skewed_domain_quota")
    assert "WindowGroupLimit" in plan


def test_q288_aqe_skew_split_fires(spark, sf_dir):
    """VERDICT r13 #5: prove AQE's OptimizeSkewedJoin actually splits
    the mega-key partition of q288's join when the probe side is too
    big to broadcast. Forced regime: broadcast off, AQE skew
    thresholds scaled to the sandbox data (8KB — defaults target
    256MB partitions); the probe side is checkpointed so both join
    children are bare shuffle stages (the rule's eligibility shape),
    and the build side is spread over 16 mappers because AQE splits
    a skewed partition at MAP-BLOCK boundaries — a single-mapper
    shuffle is unsplittable no matter how skewed (measured here;
    at 100 TB there are thousands of mappers, so splits are always
    available). Asserts the executed final plan carries
    SortMergeJoin(skew=true) AND the result equals the default-plan
    run — the split must not change a single row."""
    from pyspark.sql import functions as F

    from rc_rag_spark.sources import table

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
    }

    def build(sprk):
        li = (
            table(sprk, sf_dir, "lineitem")
            .where(F.col("l_linenumber") <= 4)
            .select(
                (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias(
                    "doc_id"
                )
            )
        )
        is_mega = F.col("doc_id") % 2 == 0
        pages = li.select(
            "doc_id",
            F.when(is_mega, F.lit("mega-site.com"))
            .otherwise(
                F.concat(
                    F.lit("site-"),
                    (F.col("doc_id") % 4999).cast("string"),
                    F.lit(".org"),
                )
            )
            .alias("registrable"),
            (F.col("doc_id") % 97).alias("weight"),
        ).repartition(16, F.col("doc_id"))
        dom = (
            table(sprk, sf_dir, "orders")
            .select(
                F.when(
                    F.col("o_orderkey") % 2 == 0, F.lit("mega-site.com")
                )
                .otherwise(
                    F.concat(
                        F.lit("site-"),
                        (F.col("o_orderkey") % 4999).cast("string"),
                        F.lit(".org"),
                    )
                )
                .alias("registrable")
            )
            .groupBy("registrable")
            .agg(F.count("*").alias("n_orders"))
        ).localCheckpoint()
        return (
            pages.join(dom, "registrable")
            .groupBy()
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("weight") * F.col("n_orders")).alias("w"),
            )
        )

    baseline = build(spark).collect()

    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        df = build(spark)
        got = df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    final = plan.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final
    assert "SortMergeJoin(skew=true)" in final, final[:2000]
    assert "skewed" in final  # the AQEShuffleRead carries split specs
    assert got == baseline
