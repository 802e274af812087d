"""Relational core query corpus (SURVEY.md §2.2 rows 1–8).

Every query is implemented twice: idiomatic DataFrame code (what the
engine runs) and an independent DuckDB SQL formulation (the oracle).
Column names and numeric determinism discipline (see core.py) match on
both sides.

Scale notes are inline; the common ones:
  - dimension joins (region/nation/supplier) are explicit broadcasts;
  - aggregates are partial+final hash aggs (map-side combine is free);
  - per-group top-k uses window row_number, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import davg, dec, dsum, register, sql_davg, sql_dsum
from rc_rag_spark.sources import load_tables, table, wide_table


# --- aggregation ---------------------------------------------------------

@register(
    "q01_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(3,2))) AS DECIMAL(14,4))
                    * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
               AS sum_charge,
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q01_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped rollup: scan→filter→hash-agg, no join.

    At 100 TB this is the canonical map-side-combine agg: the
    (returnflag, linestatus) grouping has cardinality 6, so partial
    aggregation collapses each input partition to ≤6 rows before the
    shuffle — the shuffle moves O(partitions), not O(rows).

    wide_table's rebalance is CONDITIONAL: it fires only on the local
    single-row-group fixture (where the decimal fold would otherwise
    run as one task) and adds no exchange on a splittable multi-file
    layout, so the O(partitions) shuffle story above holds at scale.
    """
    li = wide_table(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice", 12, 2)
    disc_price = price * (F.lit(1) - dec("l_discount", 3, 2))
    charge = disc_price.cast("decimal(14,4)") * (F.lit(1) + dec("l_tax", 3, 2))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q02_revenue_forecast",
    sql="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter"),
)
def q02_revenue_forecast(spark, sf_dir):
    """TPC-H-Q6 shape: all three predicates push down to the parquet
    scan (verify with .explain → PushedFilters)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice", 12, 2) * dec("l_discount", 3, 2))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q03_distinct_parts",
    sql="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q03_distinct_parts(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("distinct_parts"),
        F.count_distinct("l_suppkey").alias("distinct_supps"),
        F.count("*").alias("n"),
    )


@register(
    "q04_rollup",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q04_rollup(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        dsum("l_quantity", "sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q05_cube",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def q05_cube(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count("*").alias("n"),
        F.sum(dec("o_totalprice", 12, 2)).cast("double").alias("sum_price"),
    )


@register(
    "q06_grouping_sets",
    sql="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "sql"),
)
def q06_grouping_sets(spark, sf_dir):
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --- joins ---------------------------------------------------------------

@register(
    "q07_customer_geography",
    sql="""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("join", "broadcast"),
)
def q07_customer_geography(spark, sf_dir):
    """Star join: both dims explicitly broadcast — zero shuffle on the
    fact side until the final (tiny) aggregation."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("sum_bal"),
        )
    )


@register(
    "q08_regional_revenue",
    sql="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("join",),
)
def q08_regional_revenue(spark, sf_dir):
    """TPC-H-Q5 shape. The orders⋈lineitem join is the only real
    shuffle (both sides hashed on orderkey); supplier/nation/region are
    broadcast. AQE will coalesce the post-join partitions.

    shuffle_hash hint on lineitem: the fact table must never be the
    broadcast build side — locally its file size sits under the
    broadcast threshold and Catalyst would otherwise build a 600k-row
    hash relation in one task per run; at cluster scale a shuffled hash
    join on orderkey is the right strategy anyway (no sort of the big
    side, AQE skew-split still applies)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").hint("shuffle_hash")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    revenue = dec("l_extendedprice", 12, 2) * (F.lit(1) - dec("l_discount", 3, 2))
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, (n.n_regionkey == r.r_regionkey) & (r.r_name == "ASIA"))
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q09_orders_per_customer",
    sql="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_cust,
           CAST(SUM(COALESCE(o.cnt, 0)) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN COALESCE(o.cnt, 0) = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inactive
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "outer"),
)
def q09_orders_per_customer(spark, sf_dir):
    """Left join with pre-aggregation pushed below the join — the
    orders side is reduced to one row per customer *before* joining,
    so the join input is minimal at any scale."""
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    joined = c.join(o, c.c_custkey == o.o_custkey, "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        F.sum("cnt").cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("cnt") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_inactive"),
    )


@register(
    "q10_big_spenders",
    sql="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 250000)
    """,
    tags=("join", "semi"),
)
def q10_big_spenders(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q11_inactive_customers",
    sql="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def q11_inactive_customers(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q12_nation_coverage",
    sql="""
    SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
           COUNT(c.c_custkey) AS n_cust_rows,
           COUNT(s.s_suppkey) AS n_supp_rows,
           COUNT(*) AS n_rows
    FROM customer c
    FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
    GROUP BY COALESCE(c.c_nationkey, s.s_nationkey)
    """,
    tags=("join", "outer"),
)
def q12_nation_coverage(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.groupBy(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey")
    ).agg(
        F.count("c_custkey").alias("n_cust_rows"),
        F.count("s_suppkey").alias("n_supp_rows"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q13_status_matrix",
    sql="""
    SELECT r.r_name, st.o_orderstatus, COUNT(*) AS n
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) st
    GROUP BY r.r_name, st.o_orderstatus
    """,
    tags=("join", "cross"),
)
def q13_status_matrix(spark, sf_dir):
    r = table(spark, sf_dir, "region")
    st = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(st).groupBy("r_name", "o_orderstatus").agg(
        F.count("*").alias("n")
    )


@register(
    "q14_premium_lineitems",
    sql="""
    SELECT p.p_brand, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_price
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
               AND l.l_extendedprice > p.p_retailprice * 20
    GROUP BY p.p_brand
    """,
    tags=("join", "theta"),
)
def q14_premium_lineitems(spark, sf_dir):
    """Equi-key + non-equi residual: Catalyst keeps the hash join on
    partkey and evaluates the range predicate as a join residual —
    never a cartesian product."""
    li = table(spark, sf_dir, "lineitem")
    p = F.broadcast(table(spark, sf_dir, "part"))
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey)
            & (li.l_extendedprice > p.p_retailprice * 20),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("l_extendedprice", 12, 2)).cast("double").alias("sum_price"),
        )
    )


# --- window functions ----------------------------------------------------

@register(
    "q15_top_orders_per_customer",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def q15_top_orders_per_customer(spark, sf_dir):
    """Per-group top-k: one shuffle on the partition key, no global
    sort. The orderkey tiebreak makes row_number deterministic."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q16_running_spend",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
    FROM orders
    """,
    tags=("window",),
)
def q16_running_spend(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", 12, 2))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).cast("int").alias("order_seq"),
    )


@register(
    "q17_order_gaps",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                CAST(LAG(o_orderdate) OVER w AS DATE),
                CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev,
           LEAD(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "lag"),
)
def q17_order_gaps(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date"),
        )
        .cast("bigint")
        .alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "q18_price_quartiles",
    sql="""
    SELECT quartile, COUNT(*) AS n,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
    FROM (
        SELECT o_totalprice,
               CAST(NTILE(4) OVER (ORDER BY o_totalprice NULLS FIRST, o_orderkey)
                    AS INTEGER) AS quartile
        FROM orders
    ) GROUP BY quartile
    """,
    tags=("window",),
)
def q18_price_quartiles(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_totalprice", F.ntile(4).over(w).cast("int").alias("quartile")
        )
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "q19_top20_orders",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("sort", "topk"),
)
def q19_top20_orders(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge, never a full sort at scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- set operations ------------------------------------------------------

@register(
    "q20_set_ops",
    sql="""
    WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT 'union_all' AS op, COUNT(*) AS n FROM (
        SELECT o_custkey FROM f UNION ALL SELECT o_custkey FROM o)
    UNION ALL
    SELECT 'union_distinct', COUNT(*) FROM (
        SELECT o_custkey FROM f UNION SELECT o_custkey FROM o)
    UNION ALL
    SELECT 'intersect', COUNT(*) FROM (
        SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
    UNION ALL
    SELECT 'except', COUNT(*) FROM (
        SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
    """,
    tags=("setop",),
)
def q20_set_ops(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()

    def counted(name, df):
        return df.agg(F.count("*").alias("n")).select(
            F.lit(name).alias("op"), "n"
        )

    return (
        counted("union_all", f.unionAll(o))
        .unionByName(counted("union_distinct", f.union(o).distinct()))
        .unionByName(counted("intersect", f.intersect(o)))
        .unionByName(counted("except", f.exceptAll(o).distinct()))
    )


# --- scalar function surface --------------------------------------------

@register(
    "q21_string_functions",
    sql="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 8) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           replace(p_type, 'E', '_') AS type_repl,
           CAST(length(p_name) AS INTEGER) AS name_len,
           CAST(levenshtein(p_brand, 'Brand#10') AS INTEGER) AS brand_dist,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           CAST(position('#' IN p_brand) AS INTEGER) AS hash_pos
    FROM part
    """,
    tags=("scalar", "string"),
)
def q21_string_functions(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("E"), F.lit("_")).alias("type_repl"),
        F.length("p_name").cast("int").alias("name_len"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#10"))
        .cast("int")
        .alias("brand_dist"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.instr(F.col("p_brand"), "#").cast("int").alias("hash_pos"),
    )


@register(
    "q22_datetime_functions",
    sql="""
    SELECT event_id,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(day(ts) AS INTEGER) AS d,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(isodow(ts) AS INTEGER) AS iso_dow,
           date_trunc('day', ts) AS day_start,
           date_trunc('hour', ts) AS hour_start,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER)
               AS days_into_jan
    FROM events
    """,
    tags=("scalar", "datetime"),
)
def q22_datetime_functions(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
        F.date_trunc("day", "ts").alias("day_start"),
        F.date_trunc("hour", "ts").alias("hour_start"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_into_jan"),
    )


@register(
    "q23_math_functions",
    sql="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           round(pow(l_quantity, 2), 2) AS qty_sq,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def q23_math_functions(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_bucket"),
        F.ceil(F.col("l_quantity") / 7).cast("bigint").alias("qty_bucket"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )


@register(
    "q24_json_extract",
    sql="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
    """,
    tags=("scalar", "json"),
)
def q24_json_extract(spark, sf_dir):
    """JSON prop extraction over the events stream table (reference
    stores semi-structured props the same way; SURVEY §2.2 scalar
    row)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value", 12, 2)).cast("double").alias("sum_value"),
        )
    )


@register(
    "q25_status_pivot",
    sql="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY year(o_orderdate)
    """,
    tags=("agg", "pivot"),
)
def q25_status_pivot(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    piv = (
        o.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "order_year",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("n_p"),
    )


@register(
    "q26_above_nation_average",
    sql="""
    SELECT c.c_custkey, c.c_acctbal, na.nation_avg
    FROM customer c
    JOIN (
        SELECT c_nationkey,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   / COUNT(c_acctbal) AS nation_avg
        FROM customer GROUP BY c_nationkey
    ) na ON na.c_nationkey = c.c_nationkey
    WHERE c.c_acctbal > na.nation_avg
    """,
    tags=("join", "subquery"),
)
def q26_above_nation_average(spark, sf_dir):
    """Correlated-scalar-subquery semantics, decorrelated into an
    aggregate+join (what Catalyst would do anyway)."""
    c = table(spark, sf_dir, "customer")
    na = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        davg("c_acctbal", "nation_avg", scale=2)
    )
    return (
        c.join(F.broadcast(na), c.c_nationkey == na.nk)
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_acctbal", "nation_avg")
    )


@register(
    "q27_quantity_histogram",
    sql="""
    SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decade,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CAST(floor(l_quantity / 10) AS BIGINT)
    """,
    tags=("agg", "bucket"),
)
def q27_quantity_histogram(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_decade")
        )
        .agg(F.count("*").alias("n"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "q28_slice_scan",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey >= 100 AND o_orderkey < 500
    """,
    tags=("scan", "slice"),
)
def q28_slice_scan(spark, sf_dir):
    """Range/slice scan (reference S3: rows [start, end) —
    /root/reference/code/run_llm_ours.py:50-51,227). The key predicate
    pushes down to the parquet scan → row-group pruning at scale."""
    o = table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 500)
    ).select("o_orderkey", "o_custkey", "o_totalprice")


# --- percentile / frames / predicates / misc ----------------------------

@register(
    "q29_quantity_percentiles",
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 9) AS p50,
           round(quantile_cont(l_quantity, 0.9), 9) AS p90,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q29_quantity_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 9).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 9).alias("p90"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "q133_quantiles_sketch",
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 9) AS p50,
           round(quantile_cont(l_quantity, 0.9), 9) AS p90,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           CASE WHEN quantile_cont(l_quantity, 0.5) IS NULL THEN NULL
                ELSE TRUE END AS p50_within,
           CASE WHEN quantile_cont(l_quantity, 0.9) IS NULL THEN NULL
                ELSE TRUE END AS p90_within
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "sketch"),
)
def q133_quantiles_sketch(spark, sf_dir):
    """Sketch twin of q29: approx_percentile builds a constant-memory
    quantile summary per group instead of buffering every group value
    the way exact `percentile` does — at 100 TB the exact aggregate
    concentrates each group's full value multiset in one aggregation
    buffer, while the sketch path stays O(accuracy) per group with
    ordinary partial merges. accuracy=10000 bounds rank error at
    1/10000 of the group size.

    Driver-checkable form (r3): emits the exact percentiles
    (hash-checked, same expressions as q29) plus `p50_within` /
    `p90_within` booleans asserting the sketch value lands inside the
    exact [q-0.01, q+0.01] quantile envelope — rank width 2% vs rank
    error 0.01%, so a correct sketch always passes, and the oracle's
    literal TRUE makes any sketch regression a hash failure (the
    q130/q131 bound discipline)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_quantity, array(0.5, 0.9), 10000)"
        ).alias("_q"),
        F.expr(
            "percentile(l_quantity, array(0.49, 0.5, 0.51, 0.89, 0.9, 0.91))"
        ).alias("_e"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    ).select(
        "l_returnflag",
        F.round(F.col("_e")[1], 9).alias("p50"),
        F.round(F.col("_e")[4], 9).alias("p90"),
        "min_qty",
        "max_qty",
        (
            (F.col("_q")[0] >= F.col("_e")[0])
            & (F.col("_q")[0] <= F.col("_e")[2])
        ).alias("p50_within"),
        (
            (F.col("_q")[1] >= F.col("_e")[3])
            & (F.col("_q")[1] <= F.col("_e")[5])
        ).alias("p90_within"),
    )


@register(
    "q43_range_frame_spend",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_similar_cheaper
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def q43_range_frame_spend(spark, sf_dir):
    """RANGE frame over a numeric ordering (value-based window)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).cast("bigint").alias("n_similar_cheaper"),
    )


@register(
    "q44_approx_distinct",
    sql="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
               <= 0.05 * COUNT(DISTINCT l_partkey) AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def q44_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL) next to the exact count. Raw sketch
    estimates are engine-specific, so the oracle checks the CONTRACT:
    each engine's own estimate lands within 5% of the exact count."""
    li = table(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey", rsd=0.02)
    exact = F.count_distinct("l_partkey")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("within_5pct"),
    )


@register(
    "q45_predicate_surface",
    sql="""
    SELECT p_partkey,
           p_type LIKE 'PRO%' AS is_promo,
           p_type IN ('ECONOMY', 'STANDARD') AS is_cheap_tier,
           p_size BETWEEN 10 AND 30 AS is_mid_size,
           p_retailprice IS NULL AS no_price,
           (p_size % 2 = 0 AND p_retailprice > 500.0)
               OR p_brand = 'Brand#1' AS complex_pred,
           NOT (p_type = 'PROMO') AS not_promo
    FROM part
    """,
    tags=("filter", "predicates"),
)
def q45_predicate_surface(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_type").like("PRO%").alias("is_promo"),
        F.col("p_type").isin("ECONOMY", "STANDARD").alias("is_cheap_tier"),
        F.col("p_size").between(10, 30).alias("is_mid_size"),
        F.col("p_retailprice").isNull().alias("no_price"),
        (
            ((F.col("p_size") % 2 == 0) & (F.col("p_retailprice") > 500.0))
            | (F.col("p_brand") == "Brand#1")
        ).alias("complex_pred"),
        (~(F.col("p_type") == "PROMO")).alias("not_promo"),
    )


@register(
    "q46_union_mixed_sources",
    sql="""
    SELECT 'order' AS src, o_orderkey AS key,
           CAST(o_totalprice AS DECIMAL(12,2))::DOUBLE AS amount
    FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT 'lineitem', l_orderkey,
           CAST(l_extendedprice AS DECIMAL(12,2))::DOUBLE
    FROM lineitem WHERE l_extendedprice > 99000
    """,
    tags=("setop", "union"),
)
def q46_union_mixed_sources(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    a = o.where(F.col("o_totalprice") > 400000).select(
        F.lit("order").alias("src"),
        F.col("o_orderkey").alias("key"),
        dec("o_totalprice", 12, 2).cast("double").alias("amount"),
    )
    b = li.where(F.col("l_extendedprice") > 99000).select(
        F.lit("lineitem").alias("src"),
        F.col("l_orderkey").alias("key"),
        dec("l_extendedprice", 12, 2).cast("double").alias("amount"),
    )
    return a.unionByName(b)


@register(
    "q47_date_trunc_grid",
    sql="""
    SELECT date_trunc('week', o_orderdate) AS wk,
           date_trunc('month', o_orderdate) AS mo,
           date_trunc('quarter', o_orderdate) AS qtr,
           date_trunc('year', o_orderdate) AS yr,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
    tags=("scalar", "datetime"),
)
def q47_date_trunc_grid(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("week", "o_orderdate").alias("wk"),
        F.date_trunc("month", "o_orderdate").alias("mo"),
        F.date_trunc("quarter", "o_orderdate").alias("qtr"),
        F.date_trunc("year", "o_orderdate").alias("yr"),
    ).agg(F.count("*").alias("n"))


@register(
    "q48_string_agg",
    sql="""
    SELECT n_regionkey,
           coalesce(array_to_string(list_sort(
               list(n_name) FILTER (WHERE n_name IS NOT NULL)), ','), '')
               AS nations,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "collect"),
)
def q48_string_agg(spark, sf_dir):
    """Order-canonicalized string aggregation (collect_list is
    unordered in a distributed agg — always sort before joining)."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations"
        ),
        F.count("*").alias("n"),
    )


@register(
    "q49_conditional_aggs",
    sql="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_value,
           CAST(MAX(CASE WHEN o_orderstatus = 'P'
                    THEN o_totalprice END) AS DOUBLE) AS max_pending,
           round(avg(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END), 9)
               AS finished_ratio
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "conditional"),
)
def q49_conditional_aggs(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.sum(
            F.when(F.col("o_orderstatus") == "O", dec("o_totalprice", 12, 2))
        )
        .cast("double")
        .alias("open_value"),
        F.max(
            F.when(F.col("o_orderstatus") == "P", F.col("o_totalprice"))
        )
        .cast("double")
        .alias("max_pending"),
        F.round(
            F.avg(F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)), 9
        ).alias("finished_ratio"),
    )


@register(
    "q58_array_operations",
    sql="""
    WITH src AS (
        SELECT doc_id, text, string_split(text, ' ')[1:8] AS words
        FROM documents
    )
    SELECT doc_id,
           len(words) AS n_words,
           array_to_string(list_sort(list_distinct(words)), '|')
               AS sorted_distinct,
           array_to_string(list_reverse(words), '|') AS reversed_join,
           CAST(list_position(words, 'spark') AS INTEGER) AS spark_pos,
           CASE WHEN text IS NULL THEN NULL
                ELSE coalesce(array_to_string(
                    list_filter(words, w -> length(w) > 4), '|'), '')
               END AS long_words,
           array_to_string(list_transform(words, w -> upper(w)), '|')
               AS upper_words,
           words[2] AS second_word,
           CASE WHEN text IS NULL THEN NULL
                ELSE coalesce(len(list_filter(words, w -> w = 'the')) > 0,
                              false)
               END AS has_the
    FROM src
    """,
    tags=("scalar", "array"),
)
def q58_array_operations(spark, sf_dir):
    """Array-function surface: slice/sort/distinct/reverse/position/
    filter/transform/indexing/contains."""
    d = table(spark, sf_dir, "documents")
    words = F.slice(F.split("text", " "), 1, 8)
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_join(F.array_sort(F.array_distinct(words)), "|").alias(
            "sorted_distinct"
        ),
        F.array_join(F.reverse(words), "|").alias("reversed_join"),
        F.array_position(words, "spark").cast("int").alias("spark_pos"),
        F.array_join(
            F.filter(words, lambda w: F.length(w) > 4), "|"
        ).alias("long_words"),
        F.array_join(
            F.transform(words, lambda w: F.upper(w)), "|"
        ).alias("upper_words"),
        F.element_at(words, 2).alias("second_word"),
        F.array_contains(words, "the").alias("has_the"),
    )


@register(
    "q59_first_last_values",
    sql="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order,
           CAST(NTH_VALUE(o_orderkey, 2) OVER w AS BIGINT) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "first-last"),
)
def q59_first_last_values(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).cast("bigint").alias("second_order"),
    )


@register(
    "q77_shipping_priority",
    sql="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tags=("join", "topk"),
)
def q77_shipping_priority(spark, sf_dir):
    """TPC-H-Q3 shape: selective dim filter → join → agg → top-k
    (TakeOrdered, no global sort)."""
    c = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = dec("l_extendedprice", 12, 2) * (F.lit(1) - dec("l_discount", 3, 2))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q78_returned_items",
    sql="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("join", "topk"),
)
def q78_returned_items(spark, sf_dir):
    """TPC-H-Q10 shape: returned-item revenue per customer."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    revenue = dec("l_extendedprice", 12, 2) * (F.lit(1) - dec("l_discount", 3, 2))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select("c_custkey", "c_name", "n_name", "revenue", "n_items")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- SQL-entry-path queries: ONE ANSI-SQL string runs verbatim on both
# Spark SQL and DuckDB (exercises the engine's SQL front door).

_Q79_SQL = """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    )
"""


@register("q79_sql_exists", sql=_Q79_SQL, tags=("sql", "subquery"))
def q79_sql_exists(spark, sf_dir):
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(_Q79_SQL)


_Q80_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_acctbal < 0
    )
    GROUP BY o_orderpriority
"""


@register("q80_sql_in_subquery", sql=_Q80_SQL, tags=("sql", "subquery"))
def q80_sql_in_subquery(spark, sf_dir):
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(_Q80_SQL)


_Q81_SQL = """
    WITH bal AS (
        SELECT c_nationkey,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM customer GROUP BY c_nationkey
    ),
    ranked AS (
        SELECT n.n_name, b.total,
               CAST(RANK() OVER (ORDER BY b.total DESC, n.n_name) AS INTEGER)
                   AS rnk
        FROM bal b JOIN nation n ON n.n_nationkey = b.c_nationkey
    )
    SELECT n_name, total, rnk FROM ranked WHERE rnk <= 10
"""


@register("q81_sql_cte_rank", sql=_Q81_SQL, tags=("sql", "cte"))
def q81_sql_cte_rank(spark, sf_dir):
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(_Q81_SQL)


@register(
    "q82_explode_words",
    sql="""
    SELECT doc_id, w.word, CAST(w.pos AS INTEGER) AS pos
    FROM documents,
         LATERAL (SELECT unnest(string_split(text, ' ')[1:6]) AS word,
                         generate_subscripts(string_split(text, ' ')[1:6], 1)
                             AS pos) w
    WHERE w.word != ''
    """,
    tags=("reshape", "explode"),
)
def q82_explode_words(spark, sf_dir):
    """posexplode (lateral flatten) — one row per array element with
    its 1-based position."""
    d = table(spark, sf_dir, "documents")
    words = F.slice(F.split("text", " "), 1, 6)
    return (
        d.select("doc_id", F.posexplode(words).alias("pos0", "word"))
        .where(F.col("word") != "")
        .select("doc_id", "word", (F.col("pos0") + 1).cast("int").alias("pos"))
    )


@register(
    "q83_unpivot_balances",
    sql="""
    SELECT n_regionkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
        SELECT n_regionkey,
               CAST(COUNT(*) AS DOUBLE) AS n_nations,
               CAST(MIN(n_nationkey) AS DOUBLE) AS min_key,
               CAST(MAX(n_nationkey) AS DOUBLE) AS max_key
        FROM nation GROUP BY n_regionkey
    ) UNPIVOT (val FOR metric IN (n_nations, min_key, max_key))
    """,
    tags=("reshape", "unpivot"),
)
def q83_unpivot_balances(spark, sf_dir):
    """Wide→long unpivot (melt)."""
    n = table(spark, sf_dir, "nation")
    wide = n.groupBy("n_regionkey").agg(
        F.count("*").cast("double").alias("n_nations"),
        F.min("n_nationkey").cast("double").alias("min_key"),
        F.max("n_nationkey").cast("double").alias("max_key"),
    )
    return wide.unpivot(
        ["n_regionkey"], ["n_nations", "min_key", "max_key"], "metric", "val"
    )


@register(
    "q84_date_spine_gapfill",
    sql="""
    WITH spine AS (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                      TIMESTAMP '2024-01-30 00:00:00',
                                      INTERVAL 1 DAY)) AS day
    ),
    daily AS (
        SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
        FROM events GROUP BY date_trunc('day', ts)
    )
    SELECT s.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
    tags=("reshape", "gapfill"),
)
def q84_date_spine_gapfill(spark, sf_dir):
    """Gap-filled daily counts: generated date spine LEFT JOIN actuals
    (F.sequence + explode — the idiomatic Spark date spine)."""
    e = table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-30").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events")
    )


@register(
    "q85_statistical_aggs",
    sql="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(stddev_samp(l_quantity), 6) AS qty_stddev,
           round(var_samp(l_quantity), 6) AS qty_var
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q85_statistical_aggs(spark, sf_dir):
    """Statistical moments (corr/covar/stddev/var). Both engines
    accumulate doubles in different orders — results agree to ~1e-12
    relative, rounded well above that. (skewness is deliberately
    absent: Spark computes population g1, DuckDB the bias-corrected
    sample G1 — different definitions, not float noise.)"""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
    )


@register(
    "q86_rank_distributions",
    sql="""
    SELECT o_orderkey,
           round(PERCENT_RANK() OVER w, 9) AS pct_rank,
           round(CUME_DIST() OVER w, 9) AS cume,
           CAST(RANK() OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderpriority
           ) AS INTEGER) AS prio_rank,
           CAST(DENSE_RANK() OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderpriority
           ) AS INTEGER) AS prio_dense_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "rank"),
)
def q86_rank_distributions(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wd = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.rank().over(wd).cast("int").alias("prio_rank"),
        F.dense_rank().over(wd).cast("int").alias("prio_dense_rank"),
    )


@register(
    "q87_map_functions",
    sql="""
    WITH src AS (
        SELECT doc_id,
               map(string_split(text, ' ')[1:3],
                   [1 * CAST(doc_id AS INTEGER),
                    2 * CAST(doc_id AS INTEGER),
                    3 * CAST(doc_id AS INTEGER)]) AS m,
               string_split(text, ' ')[2] AS probe_key
        FROM documents
        WHERE len(list_distinct(string_split(text, ' ')[1:3])) = 3
    )
    SELECT doc_id,
           array_to_string(list_sort(map_keys(m)), '|') AS keys_sorted,
           CAST(cardinality(m) AS INTEGER) AS map_size,
           map_extract(m, probe_key)[1] AS probe_value
    FROM src
    """,
    tags=("scalar", "map"),
)
def q87_map_functions(spark, sf_dir):
    """Map-type surface: construct from arrays, keys/size/lookup.
    (Rows with duplicate first-3 words are excluded — map key
    uniqueness; output keys are sorted since map iteration order is
    engine-specific.)"""
    d = table(spark, sf_dir, "documents")
    words3 = F.slice(F.split("text", " "), 1, 3)
    k = F.col("doc_id").cast("int")
    m = F.map_from_arrays(words3, F.array(k, 2 * k, 3 * k))
    probe = F.element_at(F.split("text", " "), 2)
    return (
        d.where(F.size(F.array_distinct(words3)) == 3)
        .select(
            "doc_id",
            F.array_join(F.array_sort(F.map_keys(m)), "|").alias(
                "keys_sorted"
            ),
            F.size(m).cast("int").alias("map_size"),
            F.element_at(m, probe).alias("probe_value"),
        )
    )


@register(
    "q98_small_quantity_revenue",
    sql="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_limit
        FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE l.l_quantity < t.qty_limit
    GROUP BY p.p_brand
    """,
    tags=("join", "subquery"),
)
def q98_small_quantity_revenue(spark, sf_dir):
    """TPC-H-Q17 shape: per-part average-quantity scalar subquery
    decorrelated into an aggregate + equi-join (what Catalyst produces
    for the correlated form). The per-part aggregate collapses lineitem
    to one row per part BEFORE the join, so the join's right side is
    |part| rows at any scale; the fact side shuffle-hashes on partkey
    (never broadcast-built)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    limits = (
        li.groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        li.hint("shuffle_hash")
        .join(limits, li.l_partkey == limits.t_partkey)
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .join(p, p.p_partkey == li.l_partkey)
        .groupBy("p_brand")
        .agg(
            (F.sum(dec("l_extendedprice", 12, 2)).cast("double") / 7.0)
            .alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q100_top_revenue_supplier",
    sql="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    tags=("join", "subquery", "view"),
)
def q100_top_revenue_supplier(spark, sf_dir):
    """TPC-H-Q15 shape: quarterly per-supplier revenue view, the
    supplier(s) hitting its max. The view aggregate collapses lineitem
    to |supplier| rows before anything joins; the max is a one-row
    broadcast (no global sort, no second scan of lineitem); equality
    on the DECIMAL-exact revenue is deterministic, so ties surface
    identically on engine and oracle."""
    li = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(dec("l_extendedprice", 12, 2)
                  * (F.lit(1) - dec("l_discount", 3, 2)))
            .cast("double")
            .alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx._mx)
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q104_null_functions",
    sql="""
    WITH src AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END
                   AS bal,
               CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END
                   AS seg
        FROM customer
    )
    SELECT c_custkey,
           coalesce(bal, 0.0) AS bal_or_zero,
           nullif(seg, 'BUILDING') AS seg_not_building,
           coalesce(seg, 'UNKNOWN') AS seg_or_unknown,
           CASE WHEN bal IS NULL THEN 'missing'
                WHEN bal < 0 THEN 'negative' ELSE 'ok' END AS bal_class,
           (bal IS NULL) AS bal_missing,
           (bal IS NOT NULL AND seg IS NOT NULL) AS complete,
           CASE WHEN bal IS NOT NULL THEN round(bal, 1) END AS bal_rounded,
           coalesce(CAST(bal AS VARCHAR), seg, 'neither') AS first_present
    FROM src
    """,
    tags=("scalar", "null"),
)
def q104_null_functions(spark, sf_dir):
    """NULL-handling scalar surface: coalesce/nullif/conditional
    classification/IS [NOT] NULL algebra over synthesized NULLs (the
    fixture has none). Narrow per-row expressions — codegen'd, no
    shuffle."""
    c = table(spark, sf_dir, "customer")
    bal = F.when(F.col("c_custkey") % 3 != 0, F.col("c_acctbal"))
    seg = F.when(F.col("c_custkey") % 5 != 0, F.col("c_mktsegment"))
    src = c.select("c_custkey", bal.alias("bal"), seg.alias("seg"))
    b, s = F.col("bal"), F.col("seg")
    return src.select(
        "c_custkey",
        F.coalesce(b, F.lit(0.0)).alias("bal_or_zero"),
        F.nullif(s, F.lit("BUILDING")).alias("seg_not_building"),
        F.coalesce(s, F.lit("UNKNOWN")).alias("seg_or_unknown"),
        F.when(b.isNull(), "missing")
        .when(b < 0, "negative")
        .otherwise("ok")
        .alias("bal_class"),
        b.isNull().alias("bal_missing"),
        (b.isNotNull() & s.isNotNull()).alias("complete"),
        F.when(b.isNotNull(), F.round(b, 1)).alias("bal_rounded"),
        F.coalesce(b.cast("string"), s, F.lit("neither")).alias(
            "first_present"
        ),
    )


# --- classic decorrelated-subquery shapes (TPC-H Q4/Q7/Q18/Q19/Q21/Q22) --

@register(
    "q106_late_shipment_priority",
    sql="""
    SELECT o.o_orderpriority, COUNT(*) AS n_late_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "semi", "subquery"),
)
def q106_late_shipment_priority(spark, sf_dir):
    """TPC-H-Q4 shape: correlated EXISTS with a non-equi residual
    (l_shipdate > o_orderdate + 60 days), decorrelated to a left-semi
    join. The semi join keeps the equi key (orderkey) as the hash key
    and evaluates the date residual post-probe, so the shuffle is a
    plain equi-exchange; the order-date filter pushes into the orders
    scan and prunes before the join at any scale."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
    )


@register(
    "q107_large_volume_customers",
    sql="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(t.sum_qty AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN (SELECT l_orderkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
          FROM lineitem GROUP BY l_orderkey) t
      ON t.l_orderkey = o.o_orderkey
    WHERE t.sum_qty > 150
    """,
    tags=("join", "subquery", "having"),
)
def q107_large_volume_customers(spark, sf_dir):
    """TPC-H-Q18 shape: orders whose total quantity clears a threshold
    (the IN-subquery-with-HAVING form, decorrelated to agg + join).
    The per-order aggregate collapses lineitem to |orders| rows and
    the threshold prunes it BEFORE the joins, so customer/orders join
    against a tiny filtered set; at scale only the per-orderkey agg
    shuffles O(orders) pre-aggregated rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    t = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 18, 2)).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        o.join(t, o.o_orderkey == t.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


@register(
    "q108_waiting_sole_late_supplier",
    sql="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate >
                            o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
    tags=("join", "semi", "anti", "subquery"),
)
def q108_waiting_sole_late_supplier(spark, sf_dir):
    """TPC-H-Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier finished order — correlated EXISTS + NOT EXISTS on
    the same fact table, decorrelated to a left-semi then a left-anti
    join, both keyed on orderkey with suppkey/date residuals. All
    three lineitem sides shuffle on the same key, so at scale the two
    subquery probes co-partition with the base (one exchange shape,
    reused); the anti join's date residual references the outer
    order's date, which rides along from the first join."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")

    base = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > late_cut)
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    base = base.join(
        l2,
        (F.col("l2_orderkey") == F.col("l_orderkey"))
        & (F.col("l2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    base = base.join(
        l3,
        (F.col("l3_orderkey") == F.col("l_orderkey"))
        & (F.col("l3_suppkey") != F.col("l_suppkey"))
        & (F.col("l3_shipdate") > late_cut),
        "left_anti",
    )
    return (
        base.join(s, base.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q109_nation_trade_flows",
    sql="""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(YEAR(l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lines
    FROM customer c
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, YEAR(l.l_shipdate)
    """,
    tags=("join", "multiway", "agg"),
)
def q109_nation_trade_flows(spark, sf_dir):
    """TPC-H-Q7 shape: cross-border revenue by (customer nation,
    supplier nation, year). Five-way join with the SAME dimension
    joined twice under different roles (nation as n1 and n2) — both
    broadcast, as are supplier and (via customer's small size at this
    SF in real TPC-H terms) the customer→nation side. The only
    fact-fact exchange is orders⋈lineitem on orderkey; the nation
    inequality is a post-broadcast residual; group cardinality is
    |nations|²·years, so partial agg collapses everything map-side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    ))
    n2 = F.broadcast(n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    ))
    return (
        li.join(o.select("o_orderkey", "o_custkey"),
                li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.sum(dec("l_extendedprice", 12, 2)
                  * (F.lit(1) - dec("l_discount", 3, 2)))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q110_disjunctive_part_bands",
    sql="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "disjunctive", "pushdown"),
)
def q110_disjunctive_part_bands(spark, sf_dir):
    """TPC-H-Q19 shape: OR-of-conjunctions over a join. The planner
    splits the disjunction into single-side implied filters — part
    rows must be one of the three brands, lineitem rows must be in
    the union of quantity bands — which push into both scans, while
    the full cross-side disjunction stays as a join residual. part
    (pre-filtered to 3 brands) broadcasts; lineitem never shuffles."""
    li = table(spark, sf_dir, "lineitem")
    p = F.broadcast(table(spark, sf_dir, "part"))
    q, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((brand == "Brand#12") & size.between(1, 15) & q.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 25) & q.between(10, 20))
        | ((brand == "Brand#34") & size.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.sum(dec("l_extendedprice", 12, 2)
                  * (F.lit(1) - dec("l_discount", 3, 2)))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q111_rich_inactive_segments",
    sql="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS a
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "anti", "scalar-subquery"),
)
def q111_rich_inactive_segments(spark, sf_dir):
    """TPC-H-Q22 shape: above-average-balance customers with no
    orders, by segment. The scalar average is a one-row broadcast (a
    cross join against a single aggregated row — no second scan
    pattern, no collect), the NOT EXISTS decorrelates to a left-anti
    join on custkey. The average is computed with the exact-decimal
    discipline so the > boundary is bit-identical on both engines."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal", 18, 2)).cast("double")
              / F.count("*")).alias("_avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            dsum("c_acctbal", "total_bal", 2),
        )
    )


# --- remaining classic shapes (TPC-H Q2/Q8/Q9/Q11/Q13/Q14/Q16/Q20),
# adapted to the fixture star schema: there is no partsupp table, so
# supply relationships and costs derive from lineitem's
# (l_partkey, l_suppkey) pairs and exact-decimal revenue sums. ------------

@register(
    "q112_min_cost_supplier",
    sql="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS tot
        FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT p.p_partkey, p.p_name, s.s_name,
           CAST(c.tot AS DOUBLE) AS supply_cost
    FROM cost c
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    WHERE c.tot = (SELECT MIN(c2.tot) FROM cost c2
                   WHERE c2.l_partkey = c.l_partkey)
    """,
    tags=("join", "scalar-subquery", "window"),
)
def q112_min_cost_supplier(spark, sf_dir):
    """TPC-H-Q2 shape: per part, the supplier with the minimum total
    supply cost (correlated scalar-MIN subquery in the oracle). The
    engine decorrelates it into a window MIN over the aggregated
    (part, supplier) table: one shuffle for the groupBy, and the
    window's partitionBy(l_partkey) re-uses a prefix of that grouping
    so AQE plans it off the already-reduced (~|part|x|supplier|) rows,
    never a second pass over lineitem. part and supplier are broadcast
    dims. Cost is an exact-decimal sum, so the = MIN() boundary (and
    its ties, which both engines keep) is bit-identical."""
    li = table(spark, sf_dir, "lineitem")
    p = F.broadcast(table(spark, sf_dir, "part"))
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_extendedprice", 18, 2)).alias("_tot")
    )
    w = Window.partitionBy("l_partkey")
    best = (
        cost.withColumn("_min_tot", F.min("_tot").over(w))
        .where(F.col("_tot") == F.col("_min_tot"))
    )
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey", "p_name", "s_name",
            F.col("_tot").cast("double").alias("supply_cost"),
        )
    )


@register(
    "q113_market_share",
    sql="""
    WITH vol AS (
        SELECT year(o.o_orderdate) AS o_year,
               CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
                    AS DECIMAL(18,4)) AS v,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = cn.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA')
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN v
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(v) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM vol GROUP BY o_year
    """,
    tags=("join", "agg", "ratio"),
)
def q113_market_share(spark, sf_dir):
    """TPC-H-Q8 shape: NATION_7 suppliers' share of revenue to ASIA
    customers, per order year. Plan: the two fact joins
    (lineitem⋈orders on orderkey, ⋈customer on custkey) are the only
    shuffles; nation/region/supplier are broadcasts, and the ASIA
    filter is applied on the customer side BEFORE the fact join so
    the shuffled build side shrinks ~5x. Numerator and denominator
    are exact-decimal sums; the final share divides two
    bit-identical doubles, so the ratio is deterministic."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    asia_cust = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, (n.n_regionkey == r.r_regionkey) & (r.r_name == "ASIA"))
        .select("c_custkey")
    )
    supp_nation = s.join(
        n.withColumnRenamed("n_name", "supp_nation"),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    v = dec("l_extendedprice", 12, 2) * (F.lit(1) - dec("l_discount", 3, 2))
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(asia_cust, o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            v.cast("decimal(18,4)").alias("_v"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", F.col("_v"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("_v").cast("double")
            ).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q114_profit_by_nation",
    sql="""
    SELECT sn.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(SUM(
               CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
                    AS DECIMAL(18,6))
               - CAST(CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2))
                      * CAST(0.10 AS DECIMAL(3,2))
                      AS DECIMAL(18,6))
           ) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY sn.n_name, year(o.o_orderdate)
    """,
    tags=("join", "agg"),
)
def q114_profit_by_nation(spark, sf_dir):
    """TPC-H-Q9 shape: widget-part profit by supplier nation and
    order year. No partsupp in the fixtures, so unit supply cost is
    modeled as 10% of p_retailprice — the join/agg topology (4-way
    fact-dim star, two fact shuffles) is what the shape exercises.
    The p_name filter prunes part BEFORE its broadcast, and because
    the part join is inner, it implicitly prunes lineitem too —
    Catalyst pushes nothing through a UDF here, it's all built-ins.
    Every money term is exact DECIMAL(18,6) before the sum."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = F.broadcast(
        table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    )
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    revenue = (
        dec("l_extendedprice", 12, 2) * (F.lit(1) - dec("l_discount", 3, 2))
    ).cast("decimal(18,6)")
    supply_cost = (
        dec("p_retailprice", 12, 2)
        * dec("l_quantity", 12, 2)
        * F.lit(0.10).cast("decimal(3,2)")
    ).cast("decimal(18,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(revenue - supply_cost).cast("double").alias("profit"))
    )


@register(
    "q115_important_parts",
    sql="""
    WITH pv AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
        FROM lineitem GROUP BY l_partkey)
    SELECT p.p_partkey, p.p_name, CAST(pv.val AS DOUBLE) AS part_value
    FROM pv JOIN part p ON p.p_partkey = pv.l_partkey
    WHERE pv.val > (SELECT SUM(val) * 0.00065 FROM pv)
    """,
    tags=("agg", "scalar-subquery"),
)
def q115_important_parts(spark, sf_dir):
    """TPC-H-Q11 shape: parts whose revenue exceeds a fraction of the
    GLOBAL total (uncorrelated scalar subquery). The per-part
    aggregate is computed once and reused for both the threshold (a
    one-row re-aggregation, broadcast via crossJoin — never collect)
    and the filter — at 100 TB that reuse halves the fact-scan work
    vs the naive two-pass SQL. Threshold compare stays in exact
    decimal; only the output is a double."""
    li = table(spark, sf_dir, "lineitem")
    p = F.broadcast(table(spark, sf_dir, "part"))
    pv = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice", 18, 2)).alias("_val")
    )
    threshold = pv.agg(
        (F.sum("_val") * F.lit(0.00065).cast("decimal(6,5)")).alias("_thr")
    )
    return (
        pv.crossJoin(F.broadcast(threshold))
        .where(F.col("_val") > F.col("_thr"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            "p_partkey", "p_name",
            F.col("_val").cast("double").alias("part_value"),
        )
    )


@register(
    "q116_order_count_distribution",
    sql="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    tags=("join", "outer", "agg"),
)
def q116_order_count_distribution(spark, sf_dir):
    """TPC-H-Q13 shape: the orders-per-customer histogram, keeping
    zero-order customers via the left outer join (COUNT of the right
    key, not COUNT(*)). Two cascaded aggs: the first shuffles on
    custkey (same key as the join, so AQE coalesces into one
    exchange), the second shuffles the tiny (c_count, custdist)
    domain — O(distinct counts) rows, trivial at any scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q117_promo_revenue_share",
    sql="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
                         AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
                    AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE)
               AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    tags=("join", "agg", "ratio"),
)
def q117_promo_revenue_share(spark, sf_dir):
    """TPC-H-Q14 shape: PROMO-type revenue share for one ship month.
    The month predicate pushes into the lineitem parquet scan
    (row-group pruning on l_shipdate min/max at scale); part
    broadcasts. Single-row output: partial aggregation collapses
    every partition to one row pre-shuffle."""
    li = table(spark, sf_dir, "lineitem")
    p = F.broadcast(table(spark, sf_dir, "part"))
    v = (
        dec("l_extendedprice", 12, 2) * (F.lit(1) - dec("l_discount", 3, 2))
    ).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", v).otherwise(zero)
                ).cast("double")
                / F.sum(v).cast("double")
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q118_supplier_part_variety",
    sql="""
    SELECT p.p_brand, p.p_type,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    """,
    tags=("join", "anti", "distinct-agg"),
)
def q118_supplier_part_variety(spark, sf_dir):
    """TPC-H-Q16 shape: distinct-supplier counts per (brand, type)
    with a NOT IN exclusion list. NOT IN over a provably
    NULL-free key column decorrelates to a left-anti join (broadcast
    — the exclusion list is tiny); the brand/size filters prune part
    before ITS broadcast. COUNT(DISTINCT) expands to a two-phase
    agg (distinct on (brand,type,suppkey), then count) — Spark does
    this rewrite itself; no explicit dropDuplicates needed."""
    li = table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        table(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
    )
    bad = table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q119_excess_promo_shippers",
    sql="""
    WITH shipped AS (
        SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_type = 'PROMO')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_name, n.n_name AS nation, CAST(sh.qty AS DOUBLE) AS promo_qty
    FROM shipped sh
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE sh.qty > 400
    """,
    tags=("join", "semi", "agg"),
)
def q119_excess_promo_shippers(spark, sf_dir):
    """TPC-H-Q20 shape: suppliers who shipped an outsized quantity of
    PROMO parts in 1996 (nested IN subqueries). The part IN-list
    decorrelates to a broadcast left-semi join (prunes lineitem
    before its only shuffle, the suppkey agg); the HAVING-style
    threshold applies post-agg on ~|supplier| rows. Quantity sums
    are exact decimal so the > 400 boundary can't flap."""
    li = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    promo = table(spark, sf_dir, "part").where(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(promo), li.l_partkey == promo.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity", 18, 2)).alias("_qty"))
        .where(F.col("_qty") > 400)
    )
    return (
        shipped.join(s, shipped.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select(
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("_qty").cast("double").alias("promo_qty"),
        )
    )


@register(
    "q140_copurchase_lift",
    sql="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    supp AS (SELECT l_partkey, COUNT(*) AS n_a FROM items
             GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_ab
        FROM items a JOIN items b
          ON b.l_orderkey = a.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey)
    SELECT part_a, part_b, n_ab,
           round(CAST(n_ab AS DOUBLE) * n.n_orders
                 / (sa.n_a * CAST(sb.n_a AS DOUBLE)), 9) AS lift
    FROM pairs
    JOIN supp sa ON sa.l_partkey = part_a
    JOIN supp sb ON sb.l_partkey = part_b
    CROSS JOIN n
    WHERE n_ab >= 2
    """,
    tags=("basket", "cooccurrence"),
)
def q140_copurchase_lift(spark, sf_dir):
    """Market-basket co-occurrence: part pairs appearing in the same
    order, with lift = P(ab) / (P(a)·P(b)) = n_ab·N / (n_a·n_b).
    The pair generation is a SELF EQUI-JOIN on orderkey — fan-out is
    bounded by items-per-order (≤7 in this schema ⇒ ≤21 pairs/order),
    so at 100 TB this shuffles O(orders·pairs_per_order), never a
    cross product over the part dimension; the support tables are
    part-keyed partial aggs and the tiny order-count attaches as a
    broadcast scalar. min-support n_ab ≥ 2 prunes the long tail
    before the lift join."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = items.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    supp = items.groupBy("l_partkey").agg(F.count("*").alias("n_a"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    sa = supp.select(
        F.col("l_partkey").alias("part_a"), F.col("n_a").alias("na")
    )
    sb = supp.select(
        F.col("l_partkey").alias("part_b"), F.col("n_a").alias("nb")
    )
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "n_ab",
            F.round(
                F.col("n_ab").cast("double") * F.col("n_orders")
                / (F.col("na") * F.col("nb").cast("double")),
                9,
            ).alias("lift"),
        )
    )


@register(
    "q142_referential_audit",
    sql="""
    SELECT 'lineitem_without_order' AS check_name,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'order_without_customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer_without_nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
    UNION ALL
    SELECT 'supplier_without_nation',
           CAST((SELECT COUNT(*) FROM supplier s
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = s.s_nationkey))
                AS BIGINT)
    """,
    tags=("quality", "audit", "anti-join"),
)
def q142_referential_audit(spark, sf_dir):
    """Referential-integrity audit across the star schema: each check
    is a LEFT ANTI join (fact rows whose FK misses the dimension)
    collapsed to a count. Anti joins broadcast the key column of the
    smaller side where possible; each check is one shuffle at most,
    and the four checks run as independent branches of one union —
    the standard pre-ingest data-quality gate for a 100 TB load."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")

    def check(name, big, dim, bk, dk, bcast=False):
        d = dim.select(dk).distinct()
        if bcast:
            d = F.broadcast(d)
        return (
            big.join(d, big[bk] == d[dk], "left_anti")
            .agg(F.count("*").alias("n_violations"))
            .select(
                F.lit(name).alias("check_name"),
                F.col("n_violations"),
            )
        )

    return (
        check("lineitem_without_order", li, o, "l_orderkey", "o_orderkey")
        .unionByName(
            check("order_without_customer", o, c, "o_custkey", "c_custkey")
        )
        .unionByName(
            check("customer_without_nation", c, n, "c_nationkey",
                  "n_nationkey", bcast=True)
        )
        .unionByName(
            check("supplier_without_nation", s, n, "s_nationkey",
                  "n_nationkey", bcast=True)
        )
    )
