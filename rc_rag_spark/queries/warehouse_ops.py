"""Warehouse-analytics batch: gaps-and-islands streaks, ABC
classification, month-over-month movers, and a KMV distinct sketch.

  - q193: longest consecutive-day activity streak per user — the
    canonical gaps-and-islands shape (row_number difference trick).
  - q194: ABC inventory classification — parts bucketed by cumulative
    revenue share (A ≤ 80 %, B ≤ 95 %, C rest) with the thresholds
    compared in exact integer-scaled DECIMAL, not floats.
  - q195: top revenue movers per month — lag + percent change +
    per-month rank.
  - q196: KMV (k-minimum-values) distinct-count sketch — the
    mergeable sketch underlying Theta/HLL-style cardinality
    estimation, built from deterministic md5-derived 60-bit hashes so
    the estimate itself is hash-checkable against SQL, alongside the
    exact count and relative error.

Scale notes (100 TB):
  - q193 reduces events to (user, day) distinct pairs first; the
    streak window is per-user over that reduced grid.
  - q194 is one agg + one global ordered window over parts (the
    per-part aggregate is the reduced table; a 100 TB lineitem scan
    reduces to |parts| rows before the sort).
  - q195 windows run on the (month, nation) grid — tiny.
  - q196's top-k smallest hashes compile to TakeOrdered: each
    partition keeps its local k, the driver merges k·partitions
    values — the textbook distributed-sketch shape (and the sketch
    is mergeable by construction).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table


# --------------------------------------------------------------------------
# q193 — gaps-and-islands: longest daily-activity streak per user


@register(
    "q193_activity_streaks",
    sql="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                FROM events),
    g AS (SELECT user_id, day,
                 day - INTERVAL (ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day)) DAY AS grp
          FROM ud),
    streaks AS (SELECT user_id, grp, COUNT(*) AS len,
                       MIN(day) AS start_day
                FROM g GROUP BY user_id, grp)
    SELECT user_id,
           CAST(MAX(len) AS INTEGER) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM streaks GROUP BY user_id
    """,
    tags=("window", "gaps-islands", "streaks"),
)
def q193_activity_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user via the
    gaps-and-islands row_number difference trick: within a user,
    consecutive days share (day − row_number) as a group key. The
    event log reduces to distinct (user, day) pairs before any
    window; the streak window is per-user over ≤31 rows here and
    O(active days) in general."""
    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = ud.withColumn("grp", F.date_sub("day", F.row_number().over(w)))
    streaks = g.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("int").alias("longest_streak"),
        F.count("*").cast("bigint").alias("n_streaks"),
        F.sum("len").cast("bigint").alias("active_days"),
    )


# --------------------------------------------------------------------------
# q194 — ABC classification by cumulative revenue share


@register(
    "q194_abc_classification",
    sql="""
    WITH rev AS (SELECT l_partkey,
                        SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
                 FROM lineitem GROUP BY 1),
    tot AS (SELECT SUM(r) AS t FROM rev),
    c AS (SELECT l_partkey, r,
                 SUM(r) OVER (ORDER BY r DESC, l_partkey) AS cum
          FROM rev),
    cls AS (SELECT l_partkey, r,
                   CASE WHEN cum * 100 <= t * 80 THEN 'A'
                        WHEN cum * 100 <= t * 95 THEN 'B'
                        ELSE 'C' END AS abc
            FROM c, tot)
    SELECT abc,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(r) AS DOUBLE) AS revenue
    FROM cls GROUP BY abc
    """,
    tags=("warehouse", "abc", "pareto-share"),
)
def q194_abc_classification(spark, sf_dir):
    """ABC (80/95) classification of parts by cumulative revenue
    share: parts sorted by revenue descending, class boundaries
    tested as exact integer-scaled DECIMAL comparisons
    (cum·100 ≤ total·80) so no float boundary can flip a part's
    class between engines. The lineitem scan reduces to one row per
    part before the global ordered window — the standard
    contribution-analysis shape."""
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r")
    )
    tot = rev.agg(F.sum("r").alias("t"))
    w = Window.orderBy(F.col("r").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = rev.withColumn("cum", F.sum("r").over(w)).crossJoin(F.broadcast(tot))
    abc = (
        F.when(F.col("cum") * 100 <= F.col("t") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("t") * 95, "B")
        .otherwise("C")
    )
    return (
        c.withColumn("abc", abc)
        .groupBy("abc")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("r").cast("double").alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# q195 — month-over-month top revenue movers per nation


@register(
    "q195_top_movers",
    sql="""
    WITH m AS (SELECT n.n_name,
                      date_trunc('month', o.o_orderdate) AS mon,
                      SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
               FROM orders o
               JOIN customer c ON c.c_custkey = o.o_custkey
               JOIN nation n ON n.n_nationkey = c.c_nationkey
               GROUP BY 1, 2),
    lagged AS (SELECT n_name, mon, rev,
                      LAG(rev) OVER (PARTITION BY n_name
                                     ORDER BY mon) AS prev
               FROM m),
    pct AS (SELECT n_name, mon, rev, prev,
                   CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE)
                       AS change
            FROM lagged WHERE prev IS NOT NULL AND prev <> 0),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY mon
                                       ORDER BY abs(change) DESC, n_name)
                    AS rk
          FROM pct)
    SELECT mon, n_name, CAST(rev AS DOUBLE) AS revenue,
           round(change, 9) AS pct_change, CAST(rk AS INTEGER) AS rank
    FROM r WHERE rk <= 3
    """,
    tags=("analytics", "movers", "mom"),
)
def q195_top_movers(spark, sf_dir):
    """Top-3 month-over-month revenue movers per month across
    customer nations: per-(nation, month) exact-DECIMAL revenue, lag
    window for the previous month, percent change as one double
    division, per-month rank on |change| (identical float op chain
    on both engines, nation tie-break). Windows run on the
    (nation, month) grid — the fact scan reduces first."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    wl = Window.partitionBy("n_name").orderBy("mon")
    lagged = m.withColumn("prev", F.lag("rev").over(wl))
    pct = lagged.where(
        F.col("prev").isNotNull() & (F.col("prev") != 0)
    ).withColumn(
        "change",
        (F.col("rev") - F.col("prev")).cast("double")
        / F.col("prev").cast("double"),
    )
    wr = Window.partitionBy("mon").orderBy(
        F.abs(F.col("change")).desc(), F.col("n_name")
    )
    return (
        pct.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 3)
        .select(
            "mon",
            "n_name",
            F.col("rev").cast("double").alias("revenue"),
            F.round("change", 9).alias("pct_change"),
            F.col("rk").cast("int").alias("rank"),
        )
    )


# --------------------------------------------------------------------------
# q196 — KMV (k-minimum-values) distinct-count sketch


_KMV_K = 64


@register(
    "q196_kmv_distinct",
    sql=f"""
    WITH h AS (SELECT DISTINCT
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 15)) AS BIGINT) AS hv
               FROM events WHERE user_id IS NOT NULL),
    k AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk FROM h),
    keff AS (SELECT LEAST({_KMV_K}, COUNT(*)) AS ke FROM h),
    kth AS (SELECT k.hv AS kth_hash, keff.ke
            FROM k, keff WHERE k.rk = keff.ke),
    exact AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM events)
    SELECT CAST(ke AS INTEGER) AS k,
           CAST(kth_hash AS BIGINT) AS kth_hash,
           round((ke - 1)
                 / (kth_hash / CAST(1152921504606846976 AS DOUBLE)), 9)
               AS estimate,
           CAST(n_exact AS BIGINT) AS n_exact,
           round(abs((ke - 1)
                     / (kth_hash / CAST(1152921504606846976 AS DOUBLE))
                     - n_exact) / n_exact, 9) AS rel_error
    FROM kth, exact
    """,
    tags=("sketch", "kmv", "distinct"),
)
def q196_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values) cardinality sketch over event users:
    hash each distinct user to a 60-bit md5-derived value, keep the
    k=64 smallest, estimate distinct = (k−1)/u_k with u_k the k-th
    smallest hash normalized to [0,1) by 2^60 (k degrades to the
    distinct-hash count when the table has fewer than 64 keys, the
    regime where the sketch holds everything and is near-exact). The hash is
    deterministic, so the ESTIMATE itself hash-matches SQL — the
    check most sketch implementations can't offer — and the exact
    count plus relative error ride along. The k smallest hashes
    compile to a per-partition top-k merge (TakeOrdered shape), and
    two KMV sketches union by keeping the k smallest of the merged
    sets, which is what makes this the backbone of distributed
    distinct estimation."""
    e = table(spark, sf_dir, "events")
    # a NULL user has no hash: without the filter the NULL hv rides
    # the sketch at a NULLS-FIRST/LAST-dependent rank (sfnulls gate)
    h = e.where(F.col("user_id").isNotNull()).select(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("hv")
    ).distinct()
    w = Window.orderBy("hv")
    keff = h.agg(
        F.least(F.lit(_KMV_K), F.count("*")).alias("ke")
    )
    # Literal rk <= K first: a literal bound compiles to
    # WindowGroupLimit (per-partition top-K before the final window),
    # where filtering on the non-literal ke column alone would force
    # a single-partition global sort of every distinct hash.
    kth = (
        h.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _KMV_K)
        .crossJoin(F.broadcast(keff))
        .where(F.col("rk") == F.col("ke"))
        .select(F.col("hv").alias("kth_hash"), "ke")
    )
    exact = e.agg(F.countDistinct("user_id").alias("n_exact"))
    two60 = F.lit(1152921504606846976).cast("double")
    est = (F.col("ke") - 1) / (F.col("kth_hash") / two60)
    return kth.crossJoin(F.broadcast(exact)).select(
        F.col("ke").cast("int").alias("k"),
        F.col("kth_hash").cast("bigint").alias("kth_hash"),
        F.round(est, 9).alias("estimate"),
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(
            F.abs(est - F.col("n_exact")) / F.col("n_exact"), 9
        ).alias("rel_error"),
    )


# --------------------------------------------------------------------------
# q245 — compaction planner: size-ordered next-fit bin packing per partition


@register(
    "q245_compaction_binpack",
    sql="""
    WITH files AS (
        SELECT date_trunc('month', l_shipdate) AS part,
               l_suppkey % 40 AS file_id,
               CAST(128 * COUNT(*) + SUM(CAST(l_quantity AS BIGINT))
                    AS BIGINT) AS size_bytes
        FROM lineitem
        GROUP BY 1, 2),
    tgt AS (
        SELECT part, COUNT(*) AS n_files,
               CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
               4 * CAST(ceil(CAST(SUM(size_bytes) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS target
        FROM files GROUP BY part),
    packed AS (
        SELECT f.part, f.file_id, f.size_bytes, t.target,
               SUM(f.size_bytes) OVER (
                   PARTITION BY f.part
                   ORDER BY f.size_bytes DESC, f.file_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM files f JOIN tgt t ON f.part = t.part),
    binned AS (
        SELECT part, file_id, size_bytes, target,
               CAST(floor(CAST(cum - size_bytes AS DOUBLE) / target)
                    AS BIGINT) AS bin
        FROM packed),
    bins AS (
        SELECT part, bin, COUNT(*) AS files_in_bin,
               CAST(SUM(size_bytes) AS BIGINT) AS bin_bytes
        FROM binned GROUP BY part, bin)
    SELECT t.part,
           CAST(t.n_files AS INTEGER) AS n_files,
           t.total_bytes,
           t.target,
           CAST(COUNT(*) AS INTEGER) AS n_bins,
           MAX(b.bin_bytes) AS max_bin_bytes,
           CAST(MAX(b.files_in_bin) AS INTEGER) AS max_files_per_bin,
           round(CAST(t.total_bytes AS DOUBLE)
                 / (COUNT(*) * t.target), 6) AS fill_ratio
    FROM bins b JOIN tgt t ON b.part = t.part
    GROUP BY t.part, t.n_files, t.total_bytes, t.target
    """,
    tags=("maintenance", "compaction", "binpack"),
)
def q245_compaction_binpack(spark, sf_dir):
    """Small-file compaction planner — the table-MAINTENANCE operator
    behind OPTIMIZE/rewriteDataFiles on 100 TB tables: given a file
    inventory (simulated here as one pseudo-file per (month partition,
    suppkey residue) with an integer-exact size proxy), pack each
    partition's files into target-sized output bins and report the
    before/after shape the maintenance scheduler acts on.

    The packing is size-descending NEXT-FIT: order files largest
    first, running-sum their sizes, bin = floor((cum - size)/target).
    That is exactly what a windowed engine can do in ONE pass with no
    sequential driver loop — first-fit-decreasing needs a mutable
    per-bin state and cannot be expressed as a window; next-fit on a
    size-sorted stream is the standard compromise (every bin except
    the last per partition is filled past `target - max_remaining
    file`, and a file never splits). The adaptive target (4x mean
    file size) keeps the plan meaningful at every scale factor.

    Scale shape: files-per-partition is the only window partition —
    the inventory is |partitions|x|files| rows (metadata-scale, not
    data-scale), so the whole plan costs one shuffle over the file
    manifest, the same input Delta/Iceberg compaction planners read.
    Skewed partitions (many files) are bounded by the manifest size,
    never by table bytes."""
    li = table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("part"),
        (F.col("l_suppkey") % 40).alias("file_id"),
    ).agg(
        (
            128 * F.count("*")
            + F.sum(F.col("l_quantity").cast("bigint"))
        ).alias("size_bytes")
    )
    tgt = files.groupBy("part").agg(
        F.count("*").alias("n_files"),
        F.sum("size_bytes").alias("total_bytes"),
    ).select(
        "part", "n_files", "total_bytes",
        (
            4
            * F.ceil(
                F.col("total_bytes").cast("double") / F.col("n_files")
            ).cast("bigint")
        ).alias("target"),
    )
    wpack = Window.partitionBy("part").orderBy(
        F.col("size_bytes").desc(), "file_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    binned = (
        files.join(tgt.select("part", "target"), "part")
        .select(
            "part", "file_id", "size_bytes", "target",
            F.sum("size_bytes").over(wpack).alias("cum"),
        )
        .select(
            "part", "size_bytes", "target",
            F.floor(
                (F.col("cum") - F.col("size_bytes")).cast("double")
                / F.col("target")
            ).cast("bigint").alias("bin"),
        )
    )
    bins = binned.groupBy("part", "bin").agg(
        F.count("*").alias("files_in_bin"),
        F.sum("size_bytes").alias("bin_bytes"),
    )
    return (
        bins.join(tgt, "part")
        .groupBy("part", "n_files", "total_bytes", "target")
        .agg(
            F.count("*").cast("int").alias("n_bins"),
            F.max("bin_bytes").alias("max_bin_bytes"),
            F.max("files_in_bin").cast("int").alias("max_files_per_bin"),
        )
        .select(
            "part",
            F.col("n_files").cast("int").alias("n_files"),
            "total_bytes", "target", "n_bins", "max_bin_bytes",
            "max_files_per_bin",
            F.round(
                F.col("total_bytes").cast("double")
                / (F.col("n_bins") * F.col("target")),
                6,
            ).alias("fill_ratio"),
        )
    )


# --------------------------------------------------------------------------
# q257 — zone-map (min/max file stats) pruning evaluator


@register(
    "q257_zonemap_pruning",
    sql="""
    WITH files AS (
        SELECT date_trunc('month', l_shipdate) AS part,
               l_suppkey % 40 AS file_id,
               CAST(MIN(l_orderkey) AS BIGINT) AS ok_min,
               CAST(MAX(l_orderkey) AS BIGINT) AS ok_max,
               CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_min,
               CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_max,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY 1, 2),
    span AS (SELECT CAST(MAX(ok_max) AS BIGINT) AS okm FROM files),
    preds AS (
        SELECT f.*,
               p.pred,
               COALESCE(CASE p.pred
                    WHEN 'orderkey_band' THEN
                        NOT (f.ok_max < s.okm // 10
                             OR f.ok_min > s.okm // 5)
                    WHEN 'quantity_gt_45' THEN f.q_max > 45
                    WHEN 'orderkey_point' THEN
                        s.okm // 2 BETWEEN f.ok_min AND f.ok_max
               END, TRUE) AS must_scan
        FROM files f
        CROSS JOIN span s
        CROSS JOIN (SELECT unnest(['orderkey_band', 'quantity_gt_45',
                                   'orderkey_point']) AS pred) p)
    SELECT pred,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN must_scan THEN 0 ELSE 1 END)
                AS BIGINT) AS n_skipped,
           CAST(SUM(CASE WHEN must_scan THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_scanned,
           round(CAST(SUM(CASE WHEN must_scan THEN 0 ELSE 1 END)
                      AS DOUBLE) / COUNT(*), 6) AS skip_ratio
    FROM preds GROUP BY pred
    """,
    tags=("maintenance", "zonemap", "pruning"),
)
def q257_zonemap_pruning(spark, sf_dir):
    """Zone-map pruning evaluator — the metadata-only planning step a
    lakehouse scan runs BEFORE touching data: every file carries
    min/max column stats (parquet footers / Iceberg-Delta manifests);
    a predicate skips a file when its stat range proves emptiness.
    Using the q245 pseudo-file inventory (month x suppkey-residue)
    with min/max over orderkey and quantity, three predicate shapes
    are evaluated against the zone maps alone:

      - a selective orderkey BAND (relative to the key span, so the
        test is meaningful at every SF),
      - a high-quantity filter (q_max > 45 — quantities are uniform
        per file, so zone maps prune ~nothing: the classic
        'stats exist but layout doesn't help' case),
      - an orderkey POINT lookup (prunes every file whose range
        misses the key).

    The skip ratios are the empirical argument FOR the q171 Z-order
    layout: orderkey is uncorrelated with the (month, supplier)
    file grain, so even the band predicate scans most files — sort
    or cluster by the predicate column and the same evaluator
    reports the win. Scale shape: runs entirely on the file manifest
    (|files| rows), the same input the real planner reads; the
    fact-table scan cost is what it AVOIDS."""
    li = table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("part"),
        (F.col("l_suppkey") % 40).alias("file_id"),
    ).agg(
        F.min("l_orderkey").cast("bigint").alias("ok_min"),
        F.max("l_orderkey").cast("bigint").alias("ok_max"),
        F.min(F.col("l_quantity").cast("bigint")).alias("q_min"),
        F.max(F.col("l_quantity").cast("bigint")).alias("q_max"),
        F.count("*").cast("bigint").alias("n_rows"),
    )
    span = files.agg(F.max("ok_max").alias("okm"))
    preds = spark.createDataFrame(
        [("orderkey_band",), ("quantity_gt_45",), ("orderkey_point",)],
        "pred STRING",
    )
    j = files.crossJoin(F.broadcast(span)).crossJoin(F.broadcast(preds))
    okm = F.col("okm")
    # NULL zone-map stats can't prove a file empty -> must scan (the
    # coalesce is what a real planner does with a stats-less footer)
    must_scan = F.coalesce(
        F.when(
            F.col("pred") == "orderkey_band",
            ~(
                (F.col("ok_max") < F.expr("okm div 10"))
                | (F.col("ok_min") > F.expr("okm div 5"))
            ),
        )
        .when(F.col("pred") == "quantity_gt_45", F.col("q_max") > 45)
        .when(
            F.col("pred") == "orderkey_point",
            F.expr("okm div 2").between(F.col("ok_min"), F.col("ok_max")),
        ),
        F.lit(True),
    )
    return (
        j.select("pred", "n_rows", must_scan.alias("must_scan"))
        .groupBy("pred")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum((~F.col("must_scan")).cast("long"))
            .cast("bigint")
            .alias("n_skipped"),
            F.sum(
                F.when(F.col("must_scan"), F.col("n_rows")).otherwise(0)
            ).cast("bigint").alias("rows_scanned"),
            F.round(
                F.sum((~F.col("must_scan")).cast("long")).cast("double")
                / F.count("*"),
                6,
            ).alias("skip_ratio"),
        )
    )
