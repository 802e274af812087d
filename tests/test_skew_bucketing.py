"""Skew utilities + bucketed-layout tests: salted joins must be
result-identical to plain joins; bucketed tables must join without an
exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rc_rag_spark.operators import skew as SK
from rc_rag_spark.sources import table


def _canon(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey")
    salted = SK.salted_join(li, o, "l_orderkey", salt_buckets=4)
    cols = ["l_orderkey", "l_quantity", "o_totalprice"]
    assert _canon(salted, cols) == _canon(plain, cols)


def test_split_salted_join_equals_plain(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    hot = [r["l_orderkey"] for r in SK.key_histogram(li, "l_orderkey", fraction=0.5, top=5).collect()]
    assert hot
    plain = li.join(o, "l_orderkey")
    hybrid = SK.split_salted_join(li, o, "l_orderkey", hot_keys=hot)
    cols = ["l_orderkey", "l_quantity", "o_totalprice"]
    assert _canon(hybrid, cols) == _canon(plain, cols)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    SK.write_bucketed(
        o, "b_orders", "o_orderkey", 8, path=str(tmp_path / "b_orders")
    )
    SK.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8, path=str(tmp_path / "b_li"),
    )
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders").hint("merge"), "o_orderkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert joined.count() == li.count()


def test_approx_distinct_error_bound(spark, sf_dir):
    import rc_rag_spark.queries as q

    rows = q.REGISTRY["q44_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["within_5pct"] is True, r["l_returnflag"]
        assert r["exact_parts"] > 0


def test_window_over_bucketed_scan_has_no_exchange(spark, sf_dir, tmp_path):
    """A window partitioned on the bucket key runs exchange-FREE over
    a bucketed scan; the as-of union, however, does not inherit the
    distribution (Union output partitioning is unknown) and keeps its
    single exchange — both facts pinned here because SCALE.md cites
    them."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from rc_rag_spark.operators.temporal import asof_join
    from rc_rag_spark.sources import table

    spark.sql("DROP TABLE IF EXISTS b_ev_windowtest")
    e = table(spark, sf_dir, "events")
    SK.write_bucketed(
        e, "b_ev_windowtest", "user_id", 8, path=str(tmp_path / "b_ev")
    )
    b = spark.table("b_ev_windowtest")
    w = Window.partitionBy("user_id").orderBy("ts")
    plan = (
        b.select("user_id", F.lag("ts").over(w).alias("prev"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 0

    clicks = b.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("cts")
    )
    views = b.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    plan2 = (
        asof_join(clicks, views, ["user_id"], "cts", "vts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan2.count("Exchange hashpartitioning") == 1


def test_aqe_skew_join_engages_on_hot_key(spark):
    """AQE's runtime skew-join split must actually engage on a
    pathological key distribution — the automatic complement to the
    explicit salting tools. One key carries ~95% of the rows; with the
    skew thresholds lowered to fixture scale, the post-execution
    adaptive plan must mark the sort-merge join skew=true."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.shuffle.partitions", "8")
        n = 60_000
        big = spark.range(n).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("payload"),
        )
        small = spark.range(3_000).select(
            F.col("id").alias("k"),
            F.col("id").cast("string").alias("dim"),
        )
        joined = big.join(small, "k")
        # collect() drives THIS DataFrame's QueryExecution (count()
        # would build a different one whose final plan we can't read)
        assert len(joined.collect()) > 0
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """With thresholds scoped down, a selective dim filter must inject
    a bloom_filter_agg (creation side) + might_contain probe
    (application side) into the fact⋈dim shuffle join, and the result
    must equal the unfiltered join's."""
    from rc_rag_spark.operators.skew import runtime_bloom_thresholds
    from rc_rag_spark.sources import table

    conf = spark.conf
    saved_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        baseline = {tuple(r) for r in j.collect()}
        with runtime_bloom_thresholds(spark):
            j2 = (
                li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .count()
            )
            rows = j2.collect()
            plan = j2._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:1500]
        assert "might_contain" in plan
        assert {tuple(r) for r in rows} == baseline
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bc)


def test_mega_domain_window_group_limit_under_skew(spark, sf_dir):
    """The q280/q282/q284 rank-filter windows under the real web's
    shape — ONE registrable domain holding half of all documents. The
    mega-domain must not single-task the window: the literal rn = 1 /
    rn <= K filters plan a PARTIAL WindowGroupLimit BELOW the
    exchange, so each map task forwards at most K rows per domain and
    the hot key's shuffle input is bounded by K x n_map_tasks instead
    of n_docs/2. Asserted on the executed plan (Partial limits under
    both the canonical-dedup and quota exchanges) and on the skewed
    result (the mega domain is capped at exactly K, every other
    domain at min(n, K)). Reference semantics:
    queries/curation.py q284's dedup/quota stages."""
    from pyspark.sql import Window

    from rc_rag_spark.queries.curation import (
        _Q282_QUOTA,
        _with_registrable,
        canonical_url_col,
        parse_urls,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    mega = F.concat(
        F.lit("https://www.mega-site.com/p/"),
        F.col("doc_id").cast("string"),
    )
    tail = F.concat(
        F.lit("https://site-"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".org/p/"),
        F.col("doc_id").cast("string"),
    )
    skewed = docs.select(
        "doc_id", "source",
        F.when(F.col("doc_id") % 2 == 0, mega).otherwise(tail).alias("url"),
    )

    reg = _with_registrable(parse_urls(skewed)).repartition(8, "doc_id")
    c = reg.select("doc_id", "registrable", canonical_url_col())
    dedup = (
        c.select(
            "doc_id", "registrable",
            F.row_number()
            .over(Window.partitionBy("canonical").orderBy("doc_id"))
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    quota = (
        dedup.select(
            "doc_id", "registrable",
            F.row_number()
            .over(
                Window.partitionBy("registrable").orderBy(
                    F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") <= _Q282_QUOTA)
        .drop("rn")
    )

    plan = quota._jdf.queryExecution().executedPlan().toString()
    partials = [
        l for l in plan.splitlines()
        if "WindowGroupLimit" in l and "Partial" in l
    ]
    assert len(partials) >= 2, plan[:2000]  # dedup AND quota windows
    assert sum(
        1 for l in plan.splitlines()
        if "WindowGroupLimit" in l and "Final" in l
    ) >= 2

    kept = {
        r["registrable"]: r["n"]
        for r in quota.groupBy("registrable")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    sizes = {
        r["registrable"]: r["n"]
        for r in dedup.groupBy("registrable")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_docs = docs.count()
    assert sizes["mega-site.com"] >= n_docs // 2  # the skew is real
    assert kept == {
        d: min(n, _Q282_QUOTA) for d, n in sizes.items()
    }
