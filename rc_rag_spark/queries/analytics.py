"""Round-3 analytics breadth: graph topology, time-decayed scores,
warehouse maintenance (SCD merge), session funnels, robust outliers,
equi-depth profiling, weighted sampling, and distribution entropy.

Every query here is DuckDB-hash-checked. Determinism discipline follows
queries/core.py: exact-integer counts wherever possible; doubles only
via single IEEE ops (one multiply / one divide) with round(_, 9) on
both engines; decayed sums quantize each term to DECIMAL before the
order-independent exact SUM.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table


# --------------------------------------------------------------------------
# Shared co-purchase edge set (the q140 pair construction, min-support 2).
# a < b orientation; support >= 2 keeps the edge set sparse enough that
# the wedge join below is bounded at any scale where repeated co-purchase
# is rare (random pairs almost never repeat).

_EDGES_SQL = """
    items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS a, b.l_partkey AS b
        FROM items a JOIN items b
          ON b.l_orderkey = a.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING COUNT(*) >= 2)
"""


def _copurchase_edges(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("a"),
            F.col("b.l_partkey").alias("b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
        .select("a", "b")
    )


@register(
    "q145_triangle_count",
    sql=f"""
    WITH {_EDGES_SQL},
    wedges AS (
        SELECT e1.a AS a, e1.b AS b, e2.b AS c
        FROM edges e1 JOIN edges e2 ON e2.a = e1.b),
    tris AS (
        SELECT w.a, w.b, w.c FROM wedges w
        JOIN edges e3 ON e3.a = w.a AND e3.b = w.c)
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM wedges) AS BIGINT) AS n_wedges,
           CAST((SELECT COUNT(*) FROM tris) AS BIGINT) AS n_triangles
    """,
    tags=("graph", "triangle"),
)
def q145_triangle_count(spark, sf_dir):
    """Triangle counting over the co-purchase graph (q140's edge set,
    min-support 2). Classic two-equi-join formulation on the a<b<c
    oriented edge list: wedges = edges ⋈ edges on the middle vertex,
    triangles = wedges semi-joined against the closing edge. The a<b
    orientation is exactly the degree-bounding trick that makes
    distributed triangle counting feasible — every triangle is counted
    once, and the wedge fan-out is sum(out-degree²) of the ORIENTED
    graph, far below the unoriented degree² sum on skewed graphs. All
    shuffles are equi-joins on vertex keys; counts are exact integers,
    folded lazily (three scalar aggregates cross-joined — no driver
    action inside the query). edges/wedges are persist()ed: each is
    consumed twice, and the cache turns the plan's repeated subtrees
    into single-execution InMemoryTableScans (measured 4× faster than
    relying on AQE ReusedExchange alone). Lifecycle: the blocks are
    MEMORY_AND_DISK (LRU-evictable under pressure) and reclaimed by
    the ContextCleaner once the caller releases the returned plan —
    the query function itself cannot unpersist a lazy result it
    hasn't executed."""
    edges = _copurchase_edges(spark, sf_dir).persist()
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    wedges = e1.join(
        e2, F.col("e2.a") == F.col("e1.b")
    ).select(
        F.col("e1.a").alias("a"),
        F.col("e1.b").alias("b"),
        F.col("e2.b").alias("c"),
    ).persist()
    tris = wedges.join(
        edges.select(
            F.col("a").alias("ta"), F.col("b").alias("tc")
        ),
        (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
    )
    return (
        edges.agg(F.count("*").cast("bigint").alias("n_edges"))
        .crossJoin(
            wedges.agg(F.count("*").cast("bigint").alias("n_wedges"))
        )
        .crossJoin(
            tris.agg(F.count("*").cast("bigint").alias("n_triangles"))
        )
    )


@register(
    "q146_khop_neighborhood",
    sql=f"""
    WITH {_EDGES_SQL},
    sym AS (SELECT a AS s, b AS d FROM edges
            UNION SELECT b, a FROM edges),
    deg AS (SELECT s, COUNT(*) AS degree FROM sym GROUP BY s),
    seeds AS (SELECT s AS seed FROM deg
              ORDER BY degree DESC, s LIMIT 3),
    hop1 AS (SELECT DISTINCT seeds.seed, sym.d AS v
             FROM seeds JOIN sym ON sym.s = seeds.seed),
    hop2_raw AS (SELECT DISTINCT h.seed, sym.d AS v
                 FROM hop1 h JOIN sym ON sym.s = h.v),
    hop2 AS (
        SELECT r.seed, r.v FROM hop2_raw r
        LEFT JOIN hop1 h ON h.seed = r.seed AND h.v = r.v
        WHERE h.v IS NULL AND r.v != r.seed)
    SELECT s.seed,
           CAST((SELECT COUNT(*) FROM hop1 WHERE hop1.seed = s.seed)
                AS BIGINT) AS n_hop1,
           CAST((SELECT COUNT(*) FROM hop2 WHERE hop2.seed = s.seed)
                AS BIGINT) AS n_hop2
    FROM seeds s
    """,
    tags=("graph", "bfs", "khop"),
)
def q146_khop_neighborhood(spark, sf_dir):
    """2-hop BFS frontier sizes from the 3 highest-degree vertices of
    the co-purchase graph (ties broken by key). Each hop is one
    equi-join frontier-expansion + distinct — the standard distributed
    BFS step — and the hop-2 frontier subtracts hop-1 and the seed via
    a left-anti join, never a collected set. At 100 TB the frontier
    tables shuffle on vertex id; nothing returns to the driver."""
    edges = _copurchase_edges(spark, sf_dir)
    sym = (
        edges.select(F.col("a").alias("s"), F.col("b").alias("d"))
        .union(edges.select(F.col("b").alias("s"), F.col("a").alias("d")))
        .distinct()
        .persist()
    )
    seeds = (
        sym.groupBy("s")
        .agg(F.count("*").alias("degree"))
        .orderBy(F.col("degree").desc(), F.col("s"))
        .limit(3)
        .select(F.col("s").alias("seed"))
    )
    hop1 = (
        seeds.join(sym, seeds.seed == sym.s)
        .select("seed", F.col("d").alias("v"))
        .distinct()
        .persist()
    )
    hop2 = (
        hop1.join(sym, hop1.v == sym.s)
        .select("seed", F.col("d").alias("v"))
        .distinct()
        .join(hop1, ["seed", "v"], "left_anti")
        .where(F.col("v") != F.col("seed"))
    )
    out = (
        seeds.join(
            hop1.groupBy("seed").agg(F.count("*").alias("n_hop1")),
            "seed",
            "left",
        )
        .join(
            hop2.groupBy("seed").agg(F.count("*").alias("n_hop2")),
            "seed",
            "left",
        )
        .select(
            "seed",
            F.coalesce("n_hop1", F.lit(0)).cast("bigint").alias("n_hop1"),
            F.coalesce("n_hop2", F.lit(0)).cast("bigint").alias("n_hop2"),
        )
    )
    return out


# Python-evaluated IEEE doubles for 0.9^k, passed as literals to BOTH
# engines so neither side computes pow() (libm last-ulp divergence).
_DECAY = [0.9 ** k for k in range(8)]


@register(
    "q147_decayed_event_score",
    sql=f"""
    WITH lagged AS (
        SELECT event_id, user_id,
               {", ".join(
                   f"lag(value, {k}) OVER (PARTITION BY user_id "
                   f"ORDER BY ts, event_id) AS v{k}"
                   for k in range(8))}
        FROM events)
    SELECT event_id, user_id,
           CAST({" + ".join(
               f"coalesce(CAST(round(v{k} * {c!r}, 9) AS DECIMAL(24,9)),"
               f" CAST(0 AS DECIMAL(24,9)))"
               for k, c in enumerate(_DECAY))} AS DOUBLE) AS decayed
    FROM lagged
    """,
    tags=("window", "timeseries", "decay"),
)
def q147_decayed_event_score(spark, sf_dir):
    """Exponentially decayed event score: at every event, the
    0.9-decayed sum of the user's last 8 event values. EMA-style
    recursive state is inexpressible as a closed-form window in any
    engine, but a truncated kernel (0.9⁸ ≈ 0.43 — for real pipelines
    widen to 32 lags where 0.9³² ≈ 0.03) is 8 lag() reads inside ONE
    window sort — no self-join, no explode, one shuffle on user_id.
    Determinism: decay coefficients are Python-evaluated IEEE literals
    (identical in both engines — no libm pow), each term is one IEEE
    multiply rounded to 1e-9 and quantized to DECIMAL, and the 8-term
    sum is exact, so partial-agg order can't drift the hash."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [
        F.lag("value", k).over(w).alias(f"v{k}") for k in range(8)
    ]
    lagged = e.select("event_id", "user_id", *lags)
    zero = F.lit(0).cast("decimal(24,9)")
    terms = [
        F.coalesce(
            F.round(F.col(f"v{k}") * F.lit(c), 9).cast("decimal(24,9)"),
            zero,
        )
        for k, c in enumerate(_DECAY)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return lagged.select(
        "event_id", "user_id", total.cast("double").alias("decayed")
    )


@register(
    "q148_scd_merge",
    sql="""
    WITH changes AS (
        SELECT c_custkey AS custkey, round(c_acctbal + 100, 2) AS new_bal
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT -c_custkey, round(c_acctbal - 250, 2)
        FROM customer WHERE c_custkey % 31 = 0)
    SELECT coalesce(ch.custkey, b.c_custkey) AS custkey,
           b.c_acctbal AS old_bal, ch.new_bal,
           CASE WHEN b.c_custkey IS NULL THEN 'insert'
                WHEN ch.custkey  IS NULL THEN 'carry'
                ELSE 'update' END AS action
    FROM customer b FULL OUTER JOIN changes ch ON ch.custkey = b.c_custkey
    WHERE b.c_custkey IS NULL OR ch.custkey IS NOT NULL
    """,
    tags=("warehouse", "merge", "scd"),
)
def q148_scd_merge(spark, sf_dir):
    """Dimension-maintenance MERGE (the SCD upsert shape): a change
    set (updates keyed on existing customers, inserts with fresh keys)
    full-outer-joined against the base dimension, classifying every
    key as insert / update / carry and emitting the non-carry rows —
    exactly what `MERGE INTO` compiles to on engines without it. One
    hash shuffle on the key; at 100 TB the scale lever is partitioning
    the base dim on the merge key so only changed partitions rewrite
    (the dynamic-partition-overwrite sink in sources/registry.py)."""
    c = table(spark, sf_dir, "customer")
    updates = c.where(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.round(F.col("c_acctbal") + 100, 2).alias("new_bal"),
    )
    # acctbal sits at hundredths; +100/-250 keep it there, so round(_, 2)
    # never lands on a .xx5 tie (Spark rounds half-up, DuckDB half-even).
    # insert keys are NEGATED base keys: customer keys are positive at
    # every scale factor, so the synthetic insert domain can never
    # collide with a real key (a fixed +10M offset would collide once
    # sf*150k keys exceed it)
    inserts = c.where(F.col("c_custkey") % 31 == 0).select(
        (-F.col("c_custkey")).alias("custkey"),
        F.round(F.col("c_acctbal") - 250, 2).alias("new_bal"),
    )
    changes = updates.unionByName(inserts)
    base = c.select("c_custkey", "c_acctbal")
    merged = base.join(
        changes, changes.custkey == base.c_custkey, "full_outer"
    )
    return merged.select(
        F.coalesce(changes.custkey, base.c_custkey).alias("custkey"),
        base.c_acctbal.alias("old_bal"),
        "new_bal",
        F.when(base.c_custkey.isNull(), "insert")
        .when(changes.custkey.isNull(), "carry")
        .otherwise("update")
        .alias("action"),
    ).where(
        base.c_custkey.isNull() | changes.custkey.isNotNull()
    )



# Shared 30-minute-gap sessionization (used by q149 and q163): both the
# SQL CTE pair and the Spark window chain live HERE so a session-policy
# change (gap, tiebreak) has exactly one home per engine.
_SESSION_CTES = """
    o AS (
        SELECT user_id, ts, event_id, event_type,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events),
    s AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM o)
"""


def _sessionized(e):
    """(user_id, ts, event_id, event_type, session_id) with 30-minute
    inactivity sessions; every window ordered by (ts, event_id) so the
    assignment is total-order deterministic under tied timestamps."""
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_sum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Exact interval comparison (the q103 idiom): casting to long
    # would truncate to whole seconds and mis-bucket a gap whose true
    # microsecond length straddles the 30-minute boundary, diverging
    # from the oracle's `ts - prev_ts > INTERVAL 30 MINUTE`.
    boundary = (
        F.col("prev_ts").isNull()
        | (
            F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 30 MINUTES")
        )
    ).cast("int")
    return e.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("ts").over(w_lag).alias("prev_ts"),
    ).select(
        "user_id", "ts", "event_id", "event_type",
        F.sum(boundary).over(w_sum).alias("session_id"),
    )


@register(
    "q149_session_funnel",
    sql=f"""
    WITH {_SESSION_CTES},
    per_session AS (
        SELECT user_id, session_id,
               MIN(ts) FILTER (WHERE event_type = 'view') AS t_view,
               MIN(ts) FILTER (WHERE event_type = 'click') AS t_click,
               MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_buy
        FROM s GROUP BY user_id, session_id)
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS with_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS view_click,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_buy > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
    FROM per_session
    """,
    tags=("sessionization", "funnel"),
)
def q149_session_funnel(spark, sf_dir):
    """Funnel WITHIN sessions: the shared 30-minute sessionization
    (_sessionized — one home for the session policy on each engine)
    composed with q89's ordered-stage funnel, evaluated per session
    instead of per user — the form product analytics actually ships.
    Two window passes over one user_id shuffle, then a per-session
    conditional-MIN agg and a scalar fold; every window orders by
    (ts, event_id) so session assignment is total-order deterministic
    even under tied timestamps."""
    s = _sessionized(table(spark, sf_dir, "events"))

    def first(evt):
        return F.min(F.when(F.col("event_type") == evt, F.col("ts")))

    per_session = s.groupBy("user_id", "session_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    return per_session.agg(
        F.count("*").alias("n_sessions"),
        F.sum(viewed.cast("int")).cast("bigint").alias("with_view"),
        F.sum(clicked.cast("int")).cast("bigint").alias("view_click"),
        F.sum(bought.cast("int")).cast("bigint").alias("full_funnel"),
    )


@register(
    "q150_mad_outliers",
    sql="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON m.event_type = e.event_type),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type)
    SELECT d.event_type,
           round(any_value(d.med), 9) AS med,
           round(any_value(m.mad), 9) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           COUNT(*) AS n
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type
    """,
    tags=("profiling", "robust", "outliers"),
)
def q150_mad_outliers(spark, sf_dir):
    """Robust outlier profiling: per-event-type median and MAD (median
    absolute deviation), flagging |x − med| > 3·MAD. Two grouped exact
    percentiles with a broadcast-joined median between them — the
    z-score twin (q88) uses moment sums; MAD is what survives heavy
    tails. Exact `percentile` matches DuckDB `quantile_cont` bit-wise
    (proven by q29); deviations and the 3·MAD boundary are single IEEE
    ops, so the outlier counts are deterministic integers."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 9).alias("med"),
            F.round(F.first("mad"), 9).alias("mad"),
            F.sum((F.col("adev") > 3 * F.col("mad")).cast("int"))
            .cast("bigint")
            .alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q151_equidepth_histogram",
    sql="""
    WITH t AS (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice NULLS FIRST,
                               o_orderkey)
                   AS bucket
        FROM orders)
    SELECT bucket, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM t GROUP BY bucket
    """,
    tags=("profiling", "histogram", "equidepth"),
)
def q151_equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH histogram (q141 is equi-width): decile boundaries of
    o_totalprice via ntile over a total order — the structure behind
    optimizer statistics and range-partitioner boundary picking. The
    (value, key) tiebreak makes bucket membership deterministic under
    any partitioning. This exact form needs one global sort; the 100 TB
    variant computes boundaries from approx_percentile (q133's sketch)
    and buckets with a broadcast range lookup instead — the contract
    (counts per decile, lo/hi per decile) is identical, which is what
    the hash check pins."""
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "q152_priority_sample",
    sql="""
    WITH keyed AS (
        SELECT o_orderkey, o_totalprice,
               o_totalprice /
                   ((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                          1, 8)) AS BIGINT) + 0.5)
                    / 4294967296.0) AS priority
        FROM orders)
    SELECT o_orderkey, o_totalprice, priority
    FROM (SELECT * FROM keyed
          ORDER BY priority DESC, o_orderkey LIMIT 32) top
    """,
    tags=("sampling", "weighted", "priority"),
)
def q152_priority_sample(spark, sf_dir):
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield–Lund–Thorup): each row gets priority w/u with u uniform
    in (0,1); the top-k by priority is a weight-proportional sample
    with provably near-optimal subset-sum variance. u is md5-derived
    (same 32-bit construction as the MinHash oracle) so the 'random'
    stream is reproducible on both engines — sampling becomes a pure
    deterministic query. Scale shape: one map + TakeOrdered(k) —
    per-partition top-k then a k-row driver merge, no global sort, no
    shuffle of the data itself. Priorities are emitted RAW: they're a
    chain of single IEEE ops over identical operands (bit-identical on
    both engines), whereas decimal re-rounding of a billion-scale
    double at 1e-6 is implementation-defined and measurably diverges
    (Spark BigDecimal half-up vs DuckDB multiply-round-divide)."""
    o = table(spark, sf_dir, "orders")
    u = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = o.select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_totalprice") / u).alias("priority"),
    )
    return keyed.orderBy(F.col("priority").desc(), "o_orderkey").limit(32)


@register(
    "q153_entropy_profile",
    sql="""
    WITH src AS (
        SELECT 'events.event_type' AS col_name, event_type AS v FROM events
        UNION ALL
        SELECT 'lineitem.l_returnflag', l_returnflag FROM lineitem
        UNION ALL
        SELECT 'orders.o_orderpriority', o_orderpriority FROM orders),
    counts AS (
        SELECT col_name, v, COUNT(*) AS c FROM src GROUP BY col_name, v),
    tot AS (SELECT col_name, SUM(c) AS n FROM counts GROUP BY col_name)
    SELECT c.col_name,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           round(CAST(-SUM(CAST(round((c.c / CAST(t.n AS DOUBLE))
                                      * ln(c.c / CAST(t.n AS DOUBLE)), 12)
                                AS DECIMAL(24,12)))
                      AS DOUBLE),
                 9) AS entropy_nats
    FROM counts c JOIN tot t ON t.col_name = c.col_name
    GROUP BY c.col_name
    """,
    tags=("profiling", "entropy", "skew"),
)
def q153_entropy_profile(spark, sf_dir):
    """Key-distribution entropy per candidate partition column — the
    skew diagnostic behind choosing shuffle keys and salting factors
    (low entropy = hot keys; ln(n_distinct) = perfectly uniform). One
    grouped count per column plus a broadcast total; the per-key
    p·ln(p) term is quantized to DECIMAL(24,12) before the exact SUM
    so the fold order can't drift the hash (ln parity with DuckDB is
    already load-bearing in the BM25/TF-IDF oracles). The multi-column
    union scans each table once, projecting a single column — at
    100 TB this is 3 column-pruned scans, each a partial-agg
    shuffle of (col, key) counts."""
    e = table(spark, sf_dir, "events").select(
        F.lit("events.event_type").alias("col_name"),
        F.col("event_type").alias("v"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem.l_returnflag").alias("col_name"),
        F.col("l_returnflag").alias("v"),
    )
    o = table(spark, sf_dir, "orders").select(
        F.lit("orders.o_orderpriority").alias("col_name"),
        F.col("o_orderpriority").alias("v"),
    )
    src = e.unionByName(li).unionByName(o)
    counts = src.groupBy("col_name", "v").agg(F.count("*").alias("c"))
    tot = counts.groupBy("col_name").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    return (
        counts.join(F.broadcast(tot), "col_name")
        .groupBy("col_name")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct"),
            F.round(
                (
                    -F.sum(
                        F.round(p * F.log(p), 12).cast("decimal(24,12)")
                    )
                ).cast("double"),
                9,
            ).alias("entropy_nats"),
        )
    )


@register(
    "q156_incremental_agg",
    sql="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_spend,
           MAX(o_orderdate) AS last_order_ts
    FROM orders GROUP BY o_custkey
    """,
    tags=("warehouse", "incremental", "materialized-view"),
)
def q156_incremental_agg(spark, sf_dir):
    """Materialized-view maintenance: the per-customer order aggregate
    is computed as BASE (orders before 1999) + DELTA (orders from
    1999 on), each aggregated independently and then MERGED by
    combining the partial states (count: +, decimal sum: +, max:
    greatest) — the algebraic-aggregate refresh that avoids
    recomputing the base at every batch. The oracle aggregates the
    whole table directly, so the hash check IS the proof that
    merge-of-partials ≡ recompute (the property incremental pipelines
    rely on).

    plan-change: round 13 made the merge NULL-SAFE (eqNullSafe join
    key + null-safe base/delta split — the sfnulls gate caught
    NULL-date rows vanishing from the view). The join key is now an
    expression, so both partial aggregates re-partition on the
    null-safe key: 2 extra hash exchanges. At 100 TB the base side is
    a STORED table that is re-read per refresh either way; the
    normalize-key shuffle is the real price of a merge that cannot
    lose NULL-keyed groups. Allowed: hash-exchanges<=4
    shuffle-joins<=1. All states here are mergeable (no AVG in state — it
    derives from sum/count); at 100 TB the base agg is a stored table
    and each refresh shuffles only the delta."""
    o = table(spark, sf_dir, "orders")
    cutoff = F.lit("1999-01-01").cast("timestamp")

    def agg(df):
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
            F.max("o_orderdate").alias("m"),
        )

    # the base/delta predicates must PARTITION the table: a NULL
    # order date fails both `< cutoff` and `>= cutoff`, so the naive
    # split silently dropped such rows from the refreshed view
    # (caught by the sfnulls value gate, round 13) — route them into
    # the delta with a null-safe complement
    base = agg(o.where(F.col("o_orderdate") < cutoff))
    delta = agg(
        o.where(F.coalesce(F.col("o_orderdate") >= cutoff, F.lit(True)))
    )
    b = base.select(
        F.col("o_custkey").alias("b_custkey"),
        F.col("n").alias("bn"),
        F.col("s").alias("bs"),
        F.col("m").alias("bm"),
    )
    d = delta.select(
        F.col("o_custkey").alias("d_custkey"),
        F.col("n").alias("dn"),
        F.col("s").alias("ds"),
        F.col("m").alias("dm"),
    )
    # null-safe merge key: the NULL-custkey partials must combine into
    # ONE output group (plain equi-join never matches NULL keys and
    # would emit two)
    return b.join(
        d, b["b_custkey"].eqNullSafe(d["d_custkey"]), "full_outer"
    ).select(
        F.coalesce("b_custkey", "d_custkey").alias("o_custkey"),
        (
            F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))
        ).alias("n_orders"),
        F.when(
            F.col("bs").isNull() & F.col("ds").isNull(),
            F.lit(None).cast("double"),
        )
        .otherwise(
            (
                F.coalesce(F.col("bs"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(18,2)"))
            ).cast("double")
        )
        .alias("total_spend"),
        F.greatest(
            F.coalesce("bm", "dm"), F.coalesce("dm", "bm")
        ).alias("last_order_ts"),
    )


@register(
    "q160_position_attribution",
    sql="""
    WITH touches AS (
        SELECT event_id, user_id, ts,
               ['email','search','social','direct']
                   [1 + CAST(json_extract(props, '$.k') AS INTEGER) % 4]
                   AS channel
        FROM events WHERE event_type = 'click'),
    conv AS (
        SELECT event_id AS conv_id, user_id, ts AS conv_ts
        FROM events WHERE event_type = 'purchase'),
    journey AS (
        SELECT c.conv_id, t.channel, t.ts, t.event_id,
               row_number() OVER (PARTITION BY c.conv_id
                                  ORDER BY t.ts, t.event_id) AS pos,
               COUNT(*) OVER (PARTITION BY c.conv_id) AS n
        FROM conv c JOIN touches t
          ON t.user_id = c.user_id
         AND t.ts >= c.conv_ts - INTERVAL 7 DAY
         AND t.ts < c.conv_ts),
    credited AS (
        SELECT channel,
               CAST(round(CASE
                   WHEN n = 1 THEN 1.0
                   WHEN n = 2 THEN 0.5
                   WHEN pos = 1 OR pos = n THEN 0.4
                   ELSE 0.2 / (n - 2) END, 12) AS DECIMAL(24,12))
                   AS credit
        FROM journey)
    SELECT channel, COUNT(*) AS n_touches,
           round(CAST(SUM(credit) AS DOUBLE), 9) AS total_credit
    FROM credited GROUP BY channel
    """,
    tags=("attribution", "marketing", "window"),
)
def q160_position_attribution(spark, sf_dir):
    """Position-based (U-shaped) multi-touch attribution: every
    purchase distributes 1.0 credit over the user's clicks in the
    prior 7 days — 40% first touch, 40% last, 20% split across the
    middle (100%/50-50 for 1–2 touch journeys) — rolled up per
    channel. The journey build is an equi-join on user_id with a
    range residual (never a theta join across users); position/count
    come from one window over each (conversion) group; per-touch
    credits are rational numbers quantized to DECIMAL before the
    exact channel sum, so the totals are partition-independent."""
    e = table(spark, sf_dir, "events")
    channel = F.element_at(
        F.array(
            F.lit("email"), F.lit("search"), F.lit("social"), F.lit("direct")
        ),
        (
            F.get_json_object("props", "$.k").cast("int") % 4 + 1
        ),
    )
    touches = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", channel.alias("channel")
    )
    conv = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("cuser"),
        F.col("ts").alias("conv_ts"),
    )
    journey = touches.join(
        conv,
        (F.col("user_id") == F.col("cuser"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAYS"))
        & (F.col("ts") < F.col("conv_ts")),
    )
    wpos = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    wcnt = Window.partitionBy("conv_id")
    j = journey.select(
        "channel",
        F.row_number().over(wpos).alias("pos"),
        F.count("*").over(wcnt).alias("n"),
    )
    credit = F.round(
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2)),
        12,
    ).cast("decimal(24,12)")
    return (
        j.select("channel", credit.alias("credit"))
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_touches"),
            F.round(F.sum("credit").cast("double"), 9).alias("total_credit"),
        )
    )


@register(
    "q161_nested_order_export",
    sql="""
    WITH it AS (
        SELECT l_orderkey,
               CAST(l_linenumber AS VARCHAR) || ':'
               || CAST(l_partkey AS VARCHAR) || 'x'
               || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS item
        FROM lineitem)
    SELECT l_orderkey AS o_orderkey, COUNT(*) AS n_items,
           coalesce(array_to_string(list_sort(
               list(item) FILTER (WHERE item IS NOT NULL)), ';'), '')
               AS items
    FROM it GROUP BY l_orderkey
    """,
    tags=("export", "nesting", "denormalize"),
)
def q161_nested_order_export(spark, sf_dir):
    """Document assembly — the denormalizing export that turns a
    normalized fact table into one nested record per parent (the shape
    LLM training-data writers and JSON/document sinks consume): all of
    an order's line items collected into a deterministically-ordered
    array on one groupBy shuffle. The hash check pins membership AND
    order via the serialized item list. At 100 TB collect_list is safe
    here because group size is bounded by schema (≤7 items/order);
    for unbounded groups, cap with slice() after sort_array — the
    contract stays checkable."""
    li = table(spark, sf_dir, "lineitem")
    item = F.concat(
        F.col("l_linenumber").cast("string"),
        F.lit(":"),
        F.col("l_partkey").cast("string"),
        F.lit("x"),
        F.col("l_quantity").cast("bigint").cast("string"),
    )
    return (
        li.select(F.col("l_orderkey").alias("o_orderkey"), item.alias("it"))
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.array_join(
                F.array_sort(F.collect_list("it")), ";"
            ).alias("items"),
        )
    )


@register(
    "q162_cdc_latest",
    sql="""
    WITH chg AS (
        SELECT event_id, user_id AS pk, ts, value,
               CASE WHEN event_type IN ('error') THEN 'delete'
                    ELSE 'upsert' END AS op
        FROM events),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY pk ORDER BY ts DESC, event_id DESC) AS rn
        FROM chg)
    SELECT pk, event_id AS last_event_id, ts AS last_ts, value AS last_value
    FROM ranked WHERE rn = 1 AND op != 'delete'
    """,
    tags=("warehouse", "cdc", "dedup"),
)
def q162_cdc_latest(spark, sf_dir):
    """CDC compaction — 'latest record wins' per primary key: a change
    stream (events as upserts, error-rows standing in for deletes) is
    reduced to current state by taking the max-(ts, id) record per key
    and dropping keys whose latest op is a delete. One window over the
    pk shuffle (or max_by in a plain agg — same exchange); this is the
    canonical merge step of log-structured ingestion at any scale."""
    e = table(spark, sf_dir, "events")
    chg = e.select(
        "event_id",
        F.col("user_id").alias("pk"),
        "ts",
        "value",
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("upsert")
        .alias("op"),
    )
    w = Window.partitionBy("pk").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        chg.select("*", F.row_number().over(w).alias("rn"))
        .where((F.col("rn") == 1) & (F.col("op") != "delete"))
        .select(
            "pk",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "q163_journey_paths",
    sql=f"""
    WITH {_SESSION_CTES},
    seq AS (
        SELECT user_id, session_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM s
        WINDOW w AS (PARTITION BY user_id, session_id
                     ORDER BY ts, event_id)),
    paths AS (
        SELECT event_type || '>' || e2 || '>' || e3 AS path
        FROM seq WHERE e3 IS NOT NULL)
    SELECT path, n
    FROM (SELECT path, COUNT(*) AS n,
                 row_number() OVER (ORDER BY COUNT(*) DESC, path) AS rk
          FROM paths GROUP BY path)
    WHERE rk <= 20
    """,
    tags=("sessionization", "sequence", "paths"),
)
def q163_journey_paths(spark, sf_dir):
    """Journey mining: the 20 most common in-session event-type
    trigram paths ('view>click>purchase', …). Extends q144's
    first-order transition matrix to order-3 sequences WITHOUT
    exploding arrays: two lead() reads inside the per-session window
    that the shared sessionization (_sessionized) already sorted, then
    a plain path count — one user-shuffle, one path-shuffle, top-k
    over the tiny path vocabulary. The sliding window over sequences
    is lag/lead's job, not a self-join's, at any scale."""
    s = _sessionized(table(spark, sf_dir, "events"))
    w_seq = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    paths = (
        s.select(
            "event_type",
            F.lead("event_type", 1).over(w_seq).alias("e2"),
            F.lead("event_type", 2).over(w_seq).alias("e3"),
        )
        .where(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count("*").alias("n"))
    w_rank = Window.orderBy(F.col("n").desc(), "path")
    return (
        counts.select("*", F.row_number().over(w_rank).alias("rk"))
        .where(F.col("rk") <= 20)
        .drop("rk")
    )


@register(
    "q164_range_bucket_join",
    sql="""
    WITH b AS (
        SELECT bucket, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        FROM (SELECT o_totalprice,
                     ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                         AS bucket
              FROM orders)
        GROUP BY bucket),
    edges AS (
        SELECT bucket, lo,
               lead(lo) OVER (ORDER BY bucket) AS next_lo
        FROM b),
    assigned AS (
        SELECT l.l_orderkey, l.l_extendedprice, e.bucket
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN edges e
          ON o.o_totalprice >= e.lo
         AND (e.next_lo IS NULL OR o.o_totalprice < e.next_lo)
    )
    SELECT bucket, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM assigned GROUP BY bucket
    """,
    tags=("profiling", "histogram", "range-join"),
)
def q164_range_bucket_join(spark, sf_dir):
    """The 100 TB path q151's docstring promises, implemented: decile
    BOUNDARIES come from the (small) bucket summary, fan out as a
    broadcast range lookup, and the FACT table is bucketed with a
    range predicate against ≤10 broadcast rows — no global sort of the
    facts, no ntile over lineitem. Assignment uses half-open
    [lo, next_lo) intervals derived via lead(), so every price lands
    in exactly one bucket even when duplicate boundary values make
    ntile's own row-split non-reconstructible from values alone. The
    broadcast nested loop against a 10-row boundary table is the ONE
    tolerated BNLJ shape (PLANS.md); per-bucket revenue is
    decimal-exact."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    b = (
        o.select(
            "o_totalprice", F.ntile(10).over(w).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.min("o_totalprice").alias("lo"))
    )
    edges = b.select(
        "bucket", "lo",
        F.lead("lo").over(Window.orderBy("bucket")).alias("next_lo"),
    )
    assigned = (
        li.join(o.select("o_orderkey", "o_totalprice"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(edges),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("next_lo").isNull()
               | (F.col("o_totalprice") < F.col("next_lo"))),
        )
    )
    return assigned.groupBy("bucket").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "q165_weighted_median",
    sql="""
    WITH w AS (
        SELECT l_returnflag, l_extendedprice AS price,
               CAST(l_quantity AS DECIMAL(12,2)) AS wt,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS cum_wt,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
                   PARTITION BY l_returnflag) AS tot_wt
        FROM lineitem)
    SELECT l_returnflag,
           MIN(price) AS weighted_median,
           CAST(MAX(tot_wt) AS DOUBLE) AS total_weight
    FROM w
    WHERE cum_wt * 2 >= tot_wt
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "weighted"),
)
def q165_weighted_median(spark, sf_dir):
    """Weighted median (quantity-weighted median extended price per
    return flag) — the robust statistic no engine ships natively.
    Formulation: one in-partition cumulative DECIMAL weight sum over a
    total order, then the first row whose cumulative weight reaches
    half the group total. Exact decimal weights make the crossing
    deterministic under any partitioning; the tiebreak carries
    (orderkey, linenumber). One window shuffle + one partial agg."""
    li = table(spark, sf_dir, "lineitem")
    wt = F.col("l_quantity").cast("decimal(12,2)")
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    staged = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.sum(wt).over(w_cum).alias("cum_wt"),
        F.sum(wt).over(w_tot).alias("tot_wt"),
    )
    return (
        staged.where(F.col("cum_wt") * 2 >= F.col("tot_wt"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median"),
            F.max("tot_wt").cast("double").alias("total_weight"),
        )
    )


@register(
    "q166_monthly_churn",
    sql="""
    WITH mu AS (
        SELECT DISTINCT date_trunc('month', ts) AS m, user_id
        FROM events WHERE ts IS NOT NULL),
    months AS (SELECT DISTINCT m FROM mu),
    pairs AS (
        SELECT m, lead(m) OVER (ORDER BY m) AS next_m FROM months),
    churned AS (
        SELECT p.m, cur.user_id
        FROM pairs p
        JOIN mu cur ON cur.m = p.m
        LEFT JOIN mu nxt ON nxt.m = p.next_m
                        AND nxt.user_id = cur.user_id
        WHERE p.next_m IS NOT NULL AND nxt.user_id IS NULL)
    SELECT p.m AS month,
           CAST((SELECT COUNT(*) FROM mu WHERE mu.m = p.m) AS BIGINT)
               AS active_users,
           CAST(coalesce((SELECT COUNT(*) FROM churned c
                          WHERE c.m = p.m), 0) AS BIGINT) AS churned_users
    FROM pairs p WHERE p.next_m IS NOT NULL
    """,
    tags=("product", "churn", "anti-join"),
)
def q166_monthly_churn(spark, sf_dir):
    """Monthly churn: users active in month m with no activity in
    m+1. The month spine carries its successor via lead(); churn is a
    LEFT-ANTI join of month-m actives against month-(m+1) actives on
    (user, month) — one distinct pass over events, two hash joins on
    bounded keys, never a per-user window over history. The classic
    retention complement to q138's cohort matrix."""
    e = table(spark, sf_dir, "events")
    # an event with no event-time belongs to no month (the shared
    # event-time contract; NULLS-FIRST lead() would otherwise pair
    # the NULL pseudo-month with the first real one)
    mu = (
        e.where(F.col("ts").isNotNull())
        .select(F.date_trunc("month", F.col("ts")).alias("m"), "user_id")
        .distinct()
    )
    months = mu.select("m").distinct()
    pairs = months.select(
        "m", F.lead("m").over(Window.orderBy("m")).alias("next_m")
    ).where(F.col("next_m").isNotNull())
    cur = mu.join(F.broadcast(pairs), "m")
    nxt = mu.select(
        F.col("m").alias("next_m"), F.col("user_id").alias("nuser")
    )
    churned = cur.join(
        nxt,
        (cur.next_m == nxt.next_m) & (cur.user_id == nxt.nuser),
        "left_anti",
    )
    active = mu.groupBy("m").agg(
        F.count("*").cast("bigint").alias("active_users")
    )
    churn = churned.groupBy("m").agg(
        F.count("*").cast("bigint").alias("churned_users")
    )
    return (
        pairs.select(F.col("m").alias("month"))
        .join(active.withColumnRenamed("m", "month"), "month")
        .join(churn.withColumnRenamed("m", "month"), "month", "left")
        .select(
            "month", "active_users",
            F.coalesce("churned_users", F.lit(0))
            .cast("bigint")
            .alias("churned_users"),
        )
    )


@register(
    "q167_ab_welch_t",
    sql="""
    WITH g AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               CAST(value AS DECIMAL(14,2)) AS v
        FROM events WHERE event_type = 'purchase'),
    m AS (
        SELECT arm, COUNT(*) AS n,
               CAST(SUM(v) AS DOUBLE) AS s1,
               CAST(SUM(v * v) AS DOUBLE) AS s2
        FROM g GROUP BY arm),
    stats AS (
        SELECT arm, n, s1 / n AS mean,
               (s2 - s1 * (s1 / n)) / (n - 1) AS var_s
        FROM m)
    SELECT a.n AS n_a, b.n AS n_b,
           round(a.mean, 9) AS mean_a, round(b.mean, 9) AS mean_b,
           round((a.mean - b.mean)
                 / sqrt(a.var_s / a.n + b.var_s / b.n), 9) AS t_stat
    FROM stats a JOIN stats b ON a.arm = 'A' AND b.arm = 'B'
    """,
    tags=("stats", "abtest", "welch"),
)
def q167_ab_welch_t(spark, sf_dir):
    """A/B experiment readout: Welch's t-statistic between two arms
    (users split by key parity) on purchase values. Everything derives
    from exact DECIMAL moment sums (n, Σv, Σv²) — one partial-agg
    scan — so mean, sample variance, and the t-stat are
    partition-independent; the variance uses the numerically-stable
    (Σv² − Σv·mean)/(n−1) form with the exact sums. This is the
    evaluation step every experimentation pipeline bolts onto event
    data."""
    e = table(spark, sf_dir, "events")
    g = e.where(F.col("event_type") == "purchase").select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.col("value").cast("decimal(14,2)").alias("v"),
    )
    m = g.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("v").cast("double").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("s2"),
    )
    stats = m.select(
        "arm", "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        (
            (F.col("s2") - F.col("s1") * (F.col("s1") / F.col("n")))
            / (F.col("n") - 1)
        ).alias("var_s"),
    )
    a = stats.where(F.col("arm") == "A").alias("a")
    b = stats.where(F.col("arm") == "B").alias("b")
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(F.col("a.mean"), 9).alias("mean_a"),
        F.round(F.col("b.mean"), 9).alias("mean_b"),
        F.round(
            (F.col("a.mean") - F.col("b.mean"))
            / F.sqrt(
                F.col("a.var_s") / F.col("a.n")
                + F.col("b.var_s") / F.col("b.n")
            ),
            9,
        ).alias("t_stat"),
    )
