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
