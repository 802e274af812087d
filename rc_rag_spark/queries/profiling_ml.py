"""Warehouse profiling + closed-form model-induction batch.

  - q189: full column-profile sweep (null fraction, distinct count,
    min/max) over lineitem — the data-quality report every ingest
    pipeline runs before training jobs read a table.
  - q190: maximum drawdown of the cumulative daily revenue curve per
    order-year — the running-peak/trough window shape shared by every
    "worst regression from a high-water mark" question.
  - q191: 2-D Pareto frontier (skyline) of parts — minimize retail
    price, maximize size — computed with the sort + running-max
    linear-scan shape, checked against the quadratic NOT-EXISTS
    dominance oracle.
  - q192: decision-stump induction on events — the best single
    threshold on `value` separating purchases from the rest by
    weighted Gini impurity, from cumulative class counts on the
    sorted distinct-value grid. A whole (depth-1) model fit as one
    declarative plan.

All four hash-checked. Scale notes (100 TB):
  - q189 is one pass with `count`/`min`/`max` partial aggregates per
    column — no shuffle of raw rows, only the 1-row partials; the
    distinct counts go through per-column hash partials.
  - q190 reduces to a per-day grid before any window; per-year
    windows then see ≤366 rows.
  - q191's scan shape is sort + lag(running-max) over DISTINCT price
    groups — O(n log n), no self-join; the oracle's NOT EXISTS is the
    small-n ground truth only.
  - q192's candidate grid is the distinct-value set; cumulative
    counts come from one window over that grid, so the fit cost is
    O(distinct values), not O(rows × candidates).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table


# --------------------------------------------------------------------------
# q189 — column profiling sweep


@register(
    "q189_column_profile",
    sql="""
    SELECT 'l_quantity' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           round(MIN(l_quantity), 9) AS min_v,
           round(MAX(l_quantity), 9) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           round(MIN(l_extendedprice), 9), round(MAX(l_extendedprice), 9)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           round(MIN(l_discount), 9), round(MAX(l_discount), 9)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
           COUNT(DISTINCT l_tax),
           round(MIN(l_tax), 9), round(MAX(l_tax), 9)
    FROM lineitem
    UNION ALL
    SELECT 'l_linenumber', COUNT(*), COUNT(*) - COUNT(l_linenumber),
           COUNT(DISTINCT l_linenumber),
           round(MIN(l_linenumber), 9), round(MAX(l_linenumber), 9)
    FROM lineitem
    """,
    tags=("profiling", "data-quality", "columns"),
)
def q189_column_profile(spark, sf_dir):
    """Column-profile sweep over lineitem's numeric columns: row/null
    counts, distinct cardinality, min/max — the pre-training
    data-quality report. All five columns' aggregates ride ONE
    aggregate over ONE scan (the q197 moment-sum pattern; the five
    countDistincts share the scan through Catalyst's Expand, a 5×
    row fan-out of the single pass — at 100 TB one scan plus Expand
    beats five scans outright); per-column rows unpivot from the
    single result row. Numeric min/max are rounded identically on
    both engines; counts are exact integers."""
    li = table(spark, sf_dir, "lineitem")
    cols = [
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_linenumber",
    ]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"cnt_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.round(F.min(c).cast("double"), 9).alias(f"min_{c}"),
            F.round(F.max(c).cast("double"), 9).alias(f"max_{c}"),
        ]
    one = li.agg(*aggs)
    # stack() unpivots the single aggregate row in ONE projection — a
    # union of per-column selects would give each branch its own copy
    # of the whole agg+scan subtree (verified: no exchange reuse even
    # under AQE), i.e. five scans instead of one.
    stack_args = ", ".join(
        f"'{c}', CAST(n_rows AS BIGINT),"
        f" CAST(n_rows - cnt_{c} AS BIGINT),"
        f" CAST(nd_{c} AS BIGINT), min_{c}, max_{c}"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_rows, n_null, n_distinct, min_v, max_v)"
    )


# --------------------------------------------------------------------------
# q190 — max drawdown of cumulative daily revenue per year


@register(
    "q190_max_drawdown",
    sql="""
    WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
                          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                   FROM orders GROUP BY 1),
    cum AS (SELECT CAST(date_part('year', day) AS INTEGER) AS yr, day,
                   SUM(rev) OVER (PARTITION BY date_part('year', day)
                                  ORDER BY day) AS crev
            FROM daily),
    dd AS (SELECT yr, day, crev,
                  MAX(crev) OVER (PARTITION BY yr ORDER BY day) AS peak
           FROM cum),
    d2 AS (SELECT yr, day, peak - crev AS draw FROM dd),
    r AS (SELECT yr, day, draw,
                 ROW_NUMBER() OVER (PARTITION BY yr
                                    ORDER BY draw DESC, day) AS rk
          FROM d2)
    SELECT yr, day AS trough_day,
           CAST(draw AS DOUBLE) AS max_drawdown
    FROM r WHERE rk = 1
    """,
    tags=("timeseries", "drawdown", "window"),
)
def q190_max_drawdown(spark, sf_dir):
    """Maximum drawdown of the cumulative daily revenue curve within
    each order-year: running cumulative sum, running peak, and the
    day where (peak − cumulative) is largest. Everything stays exact
    DECIMAL through the windows (sums, running max, difference), so
    the argmax comparison and the reported drawdown are exact; only
    the final output casts to DOUBLE. The orders scan reduces to a
    per-day grid before any window runs."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    yr = F.year("day").cast("int")
    wc = Window.partitionBy(yr).orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = daily.select(
        yr.alias("yr"),
        "day",
        F.sum("rev").over(wc).alias("crev"),
        F.max(F.sum("rev").over(wc)).over(
            Window.partitionBy(yr)
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).alias("peak"),
    )
    d2 = cum.select(
        "yr", "day", (F.col("peak") - F.col("crev")).alias("draw")
    )
    rk = Window.partitionBy("yr").orderBy(F.col("draw").desc(), F.col("day"))
    return (
        d2.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select(
            "yr",
            F.col("day").alias("trough_day"),
            F.col("draw").cast("double").alias("max_drawdown"),
        )
    )


# --------------------------------------------------------------------------
# q191 — 2-D Pareto frontier (skyline) of parts


@register(
    "q191_pareto_frontier",
    sql="""
    SELECT p.p_partkey, p.p_name, round(p.p_retailprice, 9) AS price,
           CAST(p.p_size AS INTEGER) AS size
    FROM part p
    WHERE p.p_retailprice IS NOT NULL AND p.p_size IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM part s
        WHERE s.p_retailprice <= p.p_retailprice
          AND s.p_size >= p.p_size
          AND (s.p_retailprice < p.p_retailprice
               OR s.p_size > p.p_size))
    """,
    tags=("relational", "skyline", "pareto"),
)
def q191_pareto_frontier(spark, sf_dir):
    """2-D skyline: parts not dominated on (lower retail price,
    larger size). The engine computes it linearly — max size per
    distinct price, a lag-of-running-max over the sorted distinct
    price grid, then a semi-join back — O(n log n) with no self-join,
    while the oracle states the quadratic NOT-EXISTS dominance
    definition directly. A part survives iff its size beats every
    strictly-cheaper part's best size AND ties the best size at its
    own price (equal (price, size) twins all survive: dominance
    needs a strict inequality)."""
    p = table(spark, sf_dir, "part")
    # best size at each distinct price
    dp = p.groupBy("p_retailprice").agg(F.max("p_size").alias("best_size"))
    wprev = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    grid = dp.withColumn(
        "prev_best", F.max("best_size").over(wprev)
    )
    j = p.join(F.broadcast(grid), "p_retailprice")
    frontier = j.where(
        (F.col("prev_best").isNull() | (F.col("prev_best") < F.col("p_size")))
        & (F.col("p_size") == F.col("best_size"))
    )
    return frontier.select(
        "p_partkey",
        "p_name",
        F.round("p_retailprice", 9).alias("price"),
        F.col("p_size").cast("int").alias("size"),
    )


# --------------------------------------------------------------------------
# q192 — decision-stump induction on event values


@register(
    "q192_decision_stump",
    sql="""
    WITH lab AS (SELECT value,
                        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                            AS pos
                 FROM events
                 WHERE value IS NOT NULL),
    tot AS (SELECT COUNT(*) AS n, SUM(pos) AS np FROM lab),
    grid AS (SELECT value AS thr, COUNT(*) AS c, SUM(pos) AS cp
             FROM lab GROUP BY value),
    cumgrid AS (SELECT thr,
                       SUM(c) OVER (ORDER BY thr) AS nl,
                       SUM(cp) OVER (ORDER BY thr) AS lp
                FROM grid),
    scored AS (SELECT g.thr, g.nl, g.lp, t.n, t.np,
                      round(((CAST(g.lp AS DOUBLE) * CAST(g.lp AS DOUBLE)
                              + CAST(g.nl - g.lp AS DOUBLE)
                                * CAST(g.nl - g.lp AS DOUBLE))
                             / CAST(g.nl AS DOUBLE)
                             + (CAST(t.np - g.lp AS DOUBLE)
                                * CAST(t.np - g.lp AS DOUBLE)
                                + CAST((t.n - g.nl) - (t.np - g.lp)
                                       AS DOUBLE)
                                  * CAST((t.n - g.nl) - (t.np - g.lp)
                                         AS DOUBLE))
                               / CAST(t.n - g.nl AS DOUBLE)), 9)
                          AS purity
               FROM cumgrid g CROSS JOIN tot t
               WHERE g.nl < t.n),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY purity DESC, thr) AS rk
          FROM scored)
    SELECT round(thr, 9) AS threshold,
           CAST(nl AS BIGINT) AS n_left,
           CAST(lp AS BIGINT) AS pos_left,
           CAST(np - lp AS BIGINT) AS pos_right,
           round(purity, 9) AS purity
    FROM r WHERE rk = 1
    """,
    tags=("ml", "decision-stump", "induction"),
)
def q192_decision_stump(spark, sf_dir):
    """Depth-1 decision-tree induction: the split `value <= t` that
    best separates purchase events from the rest by weighted Gini
    impurity. Minimizing weighted Gini is equivalent to maximizing
    sum_side (pos² + neg²)/n_side, which needs only cumulative class
    counts over the sorted distinct-value grid — a whole model fit
    with one grouped count, one window, and an argmax (cost
    O(distinct values), not O(rows × candidates)). The squared class
    counts are computed in DOUBLE on both engines (int64 squares wrap
    past ~3·10⁹ positives; DuckDB would widen to HUGEINT and diverge
    from Spark), the score rounds at 1e-9 before the argmax, and
    ties break toward the smaller threshold. NULL values are dropped
    before the grid: a NULL can't be a threshold, and an ordering
    window over a nullable column would otherwise split on engine
    defaults (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST)."""
    e = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    lab = e.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    tot = lab.agg(F.count("*").alias("n"), F.sum("pos").alias("np"))
    grid = lab.groupBy(F.col("value").alias("thr")).agg(
        F.count("*").alias("c"), F.sum("pos").alias("cp")
    )
    wt = Window.orderBy("thr").rowsBetween(Window.unboundedPreceding, 0)
    cumgrid = grid.select(
        "thr",
        F.sum("c").over(wt).alias("nl"),
        F.sum("cp").over(wt).alias("lp"),
    )
    g = cumgrid.crossJoin(F.broadcast(tot)).where(F.col("nl") < F.col("n"))
    # squares computed in DOUBLE on both engines: int64 lp·lp wraps
    # past ~3e9 positives (DuckDB would widen to HUGEINT and diverge)
    lp = F.col("lp").cast("double")
    ln_ = (F.col("nl") - F.col("lp")).cast("double")
    rp = (F.col("np") - F.col("lp")).cast("double")
    rn = ((F.col("n") - F.col("nl")) - (F.col("np") - F.col("lp"))).cast(
        "double"
    )
    purity = F.round(
        (lp * lp + ln_ * ln_) / F.col("nl").cast("double")
        + (rp * rp + rn * rn) / (F.col("n") - F.col("nl")).cast("double"),
        9,
    )
    scored = g.withColumn("purity", purity)
    rk = Window.orderBy(F.col("purity").desc(), F.col("thr"))
    return (
        scored.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select(
            F.round("thr", 9).alias("threshold"),
            F.col("nl").cast("bigint").alias("n_left"),
            F.col("lp").cast("bigint").alias("pos_left"),
            (F.col("np") - F.col("lp")).cast("bigint").alias("pos_right"),
            F.round("purity", 9).alias("purity"),
        )
    )
