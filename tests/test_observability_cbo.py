"""Operational-surface coverage: DataFrame.observe() execution
metrics and ANALYZE TABLE statistics feeding the cost-based
optimizer. Both are how a production pipeline watches itself —
observe() gives per-run row/value metrics without a second pass;
ANALYZE-collected stats are what let Catalyst pick broadcast sides
on tables whose file size alone would mislead it."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Observation
from pyspark.sql import functions as F

from rc_rag_spark.sources import table


def test_observe_metrics_match_direct_aggregate(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
    )
    # one action drives both the query AND the metrics: no second scan
    n_out = observed.where(F.col("l_quantity") > 25).count()
    got = obs.get
    direct = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
    ).first()
    assert got["n_rows"] == direct["n_rows"]
    assert got["qty_sum"] == direct["qty_sum"]
    assert got["n_returned"] == direct["n_returned"]
    assert 0 < n_out <= got["n_rows"]


def test_analyze_table_stats_reach_the_optimizer(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    # external path: a stale managed-table directory from an aborted
    # run would make managed CREATE throw LOCATION_ALREADY_EXISTS
    table(spark, sf_dir, "nation").write.mode("overwrite").option(
        "path", os.path.join(tempfile.gettempdir(), "cbo_nation")
    ).saveAsTable("cbo_nation")
    spark.sql(
        "ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR COLUMNS "
        "n_nationkey, n_name"
    )
    # row count lands in table-level stats
    stats_rows = spark.sql("DESCRIBE TABLE EXTENDED cbo_nation").collect()
    stat_line = next(
        (r["data_type"] for r in stats_rows if r["col_name"] == "Statistics"),
        "",
    )
    n = table(spark, sf_dir, "nation").count()
    assert f"{n} rows" in stat_line, stat_line
    # column-level stats: distinct count for the key column
    col_stats = spark.sql(
        "DESCRIBE EXTENDED cbo_nation n_nationkey"
    ).collect()
    kv = {r["info_name"]: r["info_value"] for r in col_stats}
    assert kv.get("distinct_count") not in (None, "NULL"), kv
    # with CBO on, the analyzed row count shows up in plan statistics
    old = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        plan = (
            spark.table("cbo_nation")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .toString()
        )
        assert "rowCount" in plan and str(n) in plan, plan
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old)
        spark.sql("DROP TABLE IF EXISTS cbo_nation")
