"""Sequence-model + data-discovery batch.

  - q208: stationary distribution of the user clickstream's Markov
    chain — three power-iteration steps of π·P over the q144
    transition matrix (the q200 unrolling pattern applied to a
    row-stochastic matrix): where sessions spend their time in the
    long run.
  - q209: windowed funnel conversion — users who purchase within one
    hour of a preceding view (the time-bounded twin of the q206
    any-time conversion lag), via a banded interval join.
  - q210: joinability audit over the schema's candidate key pairs —
    distinct cardinalities, intersection size, and containment in
    each direction; the data-catalog primitive behind "which columns
    can I join?" and FK discovery.

Scale notes (100 TB):
  - q208's chain runs entirely on the |states|² transition aggregate
    (25 rows here): after the one clickstream window + count shuffle,
    each iteration is a broadcast join over the tiny matrix.
  - q209's interval join is an equi-join on user_id with a banded
    time residual — never a cross product; per-user event lists
    bound the pair volume.
  - q210 computes each pair with distinct-project + inner-join
    counts: column-pruned scans, partial-agg shuffles of the
    deduplicated keyspace. For very wide audits you'd swap the exact
    intersection for the q196 KMV sketch union/intersection — same
    output schema, sketch-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table
from rc_rag_spark.checkpoints import ckpt as _ckpt


# --------------------------------------------------------------------------
# q208 — Markov stationary distribution by unrolled power iteration


_MKV_STEPS = 3

_MKV_BASE = """
    ordered AS (SELECT user_id, event_type, ts, event_id,
                       LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS prev_type
                FROM events),
    counts AS (SELECT prev_type, event_type AS next_type, COUNT(*) AS n
               FROM ordered WHERE prev_type IS NOT NULL
               GROUP BY 1, 2),
    p AS (SELECT prev_type, next_type,
                 n / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE)
                     AS p
          FROM counts),
    states AS (SELECT DISTINCT prev_type AS s FROM counts),
    ns AS (SELECT COUNT(*) AS k FROM states),
    pi0 AS (SELECT s, 1.0 / (SELECT k FROM ns) AS pi FROM states)"""


def _mkv_sql() -> str:
    ctes = [_MKV_BASE]
    prev = "pi0"
    for k in range(1, _MKV_STEPS + 1):
        ctes.append(f"""
    pi{k} AS (SELECT p.next_type AS s,
                     CAST(SUM(CAST(round(v.pi * p.p, 12)
                                   AS DECIMAL(24,12))) AS DOUBLE) AS pi
              FROM {prev} v JOIN p ON p.prev_type = v.s
              GROUP BY p.next_type)""")
        prev = f"pi{k}"
    return (
        "WITH " + ",".join(ctes) + f"""
    SELECT s AS state, round(pi, 9) AS pi FROM {prev}"""
    )


@register(
    "q208_markov_stationary",
    sql=_mkv_sql(),
    tags=("sequence", "markov", "power-iteration"),
)
def q208_markov_stationary(spark, sf_dir):
    """Approximate stationary distribution of the clickstream Markov
    chain: three unrolled steps of π ← π·P starting uniform, over
    the q144-style row-normalized transition matrix. Each π(i)·P(i,j)
    product is quantized to DECIMAL before the per-state sum, so all
    three iterations hash-match the chained-CTE oracle. After the
    one clickstream window + transition count, every step is a
    broadcast join over the |states|² matrix — the q200 Gram-free
    iteration pattern on a stochastic matrix."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    counts = ordered.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    wn = Window.partitionBy("prev_type")
    p = counts.select(
        "prev_type",
        "next_type",
        (F.col("n").cast("double") / F.sum("n").over(wn)).alias("p"),
    ).transform(_ckpt)
    states = p.select(F.col("prev_type").alias("s")).distinct()
    ns = states.agg(F.count("*").alias("k"))
    pi = states.crossJoin(F.broadcast(ns)).select(
        "s", (F.lit(1.0) / F.col("k")).alias("pi")
    )
    for _ in range(_MKV_STEPS):
        pi = (
            F.broadcast(pi.withColumnRenamed("s", "prev_type"))
            .join(p, "prev_type")
            .select(
                F.col("next_type").alias("s"),
                F.round(F.col("pi") * F.col("p"), 12)
                .cast("decimal(24,12)")
                .alias("term"),
            )
            .groupBy("s")
            .agg(F.sum("term").cast("double").alias("pi"))
        )
    return pi.select(F.col("s").alias("state"), F.round("pi", 9).alias("pi"))


# --------------------------------------------------------------------------
# q209 — windowed funnel: purchase within 1 hour of a preceding view


@register(
    "q209_windowed_funnel",
    sql="""
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    viewers AS (SELECT COUNT(DISTINCT user_id) AS n_viewers FROM v),
    conv AS (SELECT DISTINCT p.user_id
             FROM events p JOIN v
               ON v.user_id = p.user_id
              AND p.ts > v.ts
              AND p.ts <= v.ts + INTERVAL 1 HOUR
             WHERE p.event_type = 'purchase'),
    nc AS (SELECT COUNT(*) AS n_converted FROM conv)
    SELECT CAST(n_viewers AS BIGINT) AS n_viewers,
           CAST(n_converted AS BIGINT) AS n_converted,
           round(n_converted / CAST(n_viewers AS DOUBLE), 9) AS rate_1h
    FROM viewers, nc
    """,
    tags=("product-analytics", "funnel", "windowed"),
)
def q209_windowed_funnel(spark, sf_dir):
    """Time-bounded funnel conversion: distinct users with a purchase
    at most one hour after one of their views, over distinct viewers
    — the windowed twin of q206's any-time conversion lag. The
    interval join is an equi-join on user_id with a banded time
    residual (never a cross product), then two scalar counts."""
    e = table(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        p.join(v, "user_id")
        .where(
            (F.col("pts") > F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("user_id")
        .distinct()
    )
    viewers = v.agg(F.countDistinct("user_id").alias("n_viewers"))
    nc = conv.agg(F.count("*").alias("n_converted"))
    return nc.crossJoin(F.broadcast(viewers)).select(
        F.col("n_viewers").cast("bigint").alias("n_viewers"),
        F.col("n_converted").cast("bigint").alias("n_converted"),
        # try_divide: zero viewers (empty events) yields NULL like the
        # oracle, not an ANSI DIVIDE_BY_ZERO
        F.round(
            F.try_divide(
                F.col("n_converted"), F.col("n_viewers").cast("double")
            ),
            9,
        ).alias("rate_1h"),
    )


# --------------------------------------------------------------------------
# q210 — joinability audit over candidate key pairs


_J_PAIRS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
]


def _j_sql() -> str:
    parts = []
    for ta, ca, tb, cb in _J_PAIRS:
        parts.append(f"""
    SELECT '{ta}.{ca}' AS col_a, '{tb}.{cb}' AS col_b,
           (SELECT COUNT(DISTINCT {ca}) FROM {ta}) AS nd_a,
           (SELECT COUNT(DISTINCT {cb}) FROM {tb}) AS nd_b,
           (SELECT COUNT(*) FROM
               (SELECT DISTINCT {ca} FROM {ta}) a
               JOIN (SELECT DISTINCT {cb} FROM {tb}) b
                 ON b.{cb} = a.{ca}) AS n_common""")
    return (
        "SELECT col_a, col_b, CAST(nd_a AS BIGINT) AS nd_a,"
        " CAST(nd_b AS BIGINT) AS nd_b,"
        " CAST(n_common AS BIGINT) AS n_common,"
        " round(n_common / CAST(nd_a AS DOUBLE), 9) AS containment_a,"
        " round(n_common / CAST(nd_b AS DOUBLE), 9) AS containment_b"
        " FROM (" + " UNION ALL ".join(parts) + ")"
    )


@register(
    "q210_joinability_audit",
    sql=_j_sql(),
    tags=("discovery", "joinability", "catalog"),
)
def q210_joinability_audit(spark, sf_dir):
    """Joinability audit over the schema's candidate key pairs:
    distinct cardinality on each side, exact intersection size, and
    containment in both directions — the data-catalog / FK-discovery
    primitive (containment_a = 1.0 means every left key joins). Each
    pair is a column-pruned distinct-project plus one equi-join
    count; a wide-schema audit would swap the exact intersection for
    KMV-sketch unions (q196) at the same output schema."""
    rows = []
    for ta, ca, tb, cb in _J_PAIRS:
        a = table(spark, sf_dir, ta).select(F.col(ca).alias("k")).distinct()
        b = table(spark, sf_dir, tb).select(F.col(cb).alias("k")).distinct()
        # count(k), not count(*): COUNT(DISTINCT col) in the oracle
        # excludes NULL, so a nullable key column must not count its
        # NULL as a distinct value here either
        nd_a = a.agg(F.count("k").alias("nd_a"))
        nd_b = b.agg(F.count("k").alias("nd_b"))
        common = a.join(b, "k").agg(F.count("*").alias("n_common"))
        rows.append(
            common.crossJoin(F.broadcast(nd_a))
            .crossJoin(F.broadcast(nd_b))
            .select(
                F.lit(f"{ta}.{ca}").alias("col_a"),
                F.lit(f"{tb}.{cb}").alias("col_b"),
                F.col("nd_a").cast("bigint").alias("nd_a"),
                F.col("nd_b").cast("bigint").alias("nd_b"),
                F.col("n_common").cast("bigint").alias("n_common"),
                # try_divide: an empty key column (0 distinct values)
                # reports NULL containment, as the oracle does
                F.round(
                    F.try_divide(
                        F.col("n_common"), F.col("nd_a").cast("double")
                    ),
                    9,
                ).alias("containment_a"),
                F.round(
                    F.try_divide(
                        F.col("n_common"), F.col("nd_b").cast("double")
                    ),
                    9,
                ).alias("containment_b"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --------------------------------------------------------------------------
# q283 — KMV-sketch joinability (the approximate swap q210 promised)

_KMVJ_K = 128
_KMVJ_SCALE = "CAST(1152921504606846976 AS DOUBLE)"  # 2^60


def _kmvj_sql() -> str:
    """Per pair: build both columns' deterministic KMV sketches (k
    smallest 60-bit md5 hashes over DISTINCT values), merge-sketch the
    union, and estimate nd/Jaccard/intersection — with the exact
    numbers riding along for the error audit."""
    parts = []
    for ta, ca, tb, cb in _J_PAIRS:
        parts.append(f"""
    SELECT '{ta}.{ca}' AS col_a, '{tb}.{cb}' AS col_b, * FROM (
        WITH ah AS (SELECT DISTINCT
                CAST(('0x' || substr(md5(CAST({ca} AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
            FROM {ta} WHERE {ca} IS NOT NULL),
        ak AS (SELECT hv FROM (
                SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk FROM ah)
               WHERE rk <= {_KMVJ_K}),
        bh AS (SELECT DISTINCT
                CAST(('0x' || substr(md5(CAST({cb} AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
            FROM {tb} WHERE {cb} IS NOT NULL),
        bk AS (SELECT hv FROM (
                SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk FROM bh)
               WHERE rk <= {_KMVJ_K}),
        uk AS (SELECT hv FROM (
                SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk
                FROM (SELECT hv FROM ak UNION SELECT hv FROM bk))
               WHERE rk <= {_KMVJ_K}),
        astat AS (SELECT MAX(hv) AS kth_a, COUNT(*) AS ke_a FROM ak),
        bstat AS (SELECT MAX(hv) AS kth_b, COUNT(*) AS ke_b FROM bk),
        ustat AS (SELECT MAX(hv) AS kth_u, COUNT(*) AS ke_u FROM uk),
        inter AS (SELECT COUNT(*) AS n_i FROM uk
                  WHERE hv IN (SELECT hv FROM ak)
                    AND hv IN (SELECT hv FROM bk)),
        ex AS (SELECT
                (SELECT COUNT(DISTINCT {ca}) FROM {ta}) AS nd_a,
                (SELECT COUNT(DISTINCT {cb}) FROM {tb}) AS nd_b,
                (SELECT COUNT(*) FROM
                    (SELECT DISTINCT {ca} FROM {ta}) a
                    JOIN (SELECT DISTINCT {cb} FROM {tb}) b
                      ON b.{cb} = a.{ca}) AS n_common)
        SELECT CAST(ke_u AS INTEGER) AS ke_u,
               round(CASE WHEN ke_a < {_KMVJ_K} THEN CAST(ke_a AS DOUBLE)
                          ELSE (ke_a - 1) / (kth_a / {_KMVJ_SCALE}) END, 9)
                   AS est_nd_a,
               round(CASE WHEN ke_b < {_KMVJ_K} THEN CAST(ke_b AS DOUBLE)
                          ELSE (ke_b - 1) / (kth_b / {_KMVJ_SCALE}) END, 9)
                   AS est_nd_b,
               round(n_i / CAST(ke_u AS DOUBLE), 9) AS est_jaccard,
               round((n_i / CAST(ke_u AS DOUBLE))
                     * (CASE WHEN ke_u < {_KMVJ_K} THEN CAST(ke_u AS DOUBLE)
                             ELSE (ke_u - 1) / (kth_u / {_KMVJ_SCALE}) END),
                     9) AS est_n_common,
               CAST(nd_a AS BIGINT) AS nd_a,
               CAST(nd_b AS BIGINT) AS nd_b,
               CAST(n_common AS BIGINT) AS n_common
        FROM astat, bstat, ustat, inter, ex)""")
    return (
        "SELECT * FROM (" + " UNION ALL ".join(parts) + ")"
    )


@register(
    "q283_kmv_joinability",
    sql=_kmvj_sql(),
    tags=("discovery", "joinability", "sketch", "kmv"),
)
def q283_kmv_joinability(spark, sf_dir):
    """KMV-sketch joinability — the approximate swap q210's docstring
    promised for wide-schema audits: instead of an exact distinct-join
    per candidate pair (a shuffle per pair — dead when auditing every
    column pair of a 500-table warehouse), each column is summarized
    ONCE into a k=128 KMV sketch (the k smallest 60-bit md5 hashes of
    its distinct values — a per-partition top-k merge, TakeOrdered
    shape, constant bytes per column), and every pair statistic comes
    from merging two 128-row sketches: union cardinality from the
    merged sketch's k-th smallest (Beyer et al. 2007), Jaccard as the
    fraction of the merged sketch present in both sides, intersection
    as their product, plus the exact numbers for the error audit
    (estimates land within ~1/sqrt(k) ≈ 9% relative). Because the
    hash is deterministic md5, the ESTIMATES THEMSELVES hash-match
    the oracle — the sketch's arithmetic is pinned, not just bounded.
    NULL keys are excluded from sketches exactly as COUNT(DISTINCT)
    excludes them.

    Plan note: "k smallest" is expressed as orderBy().limit(k), which
    Spark plans directly as TakeOrderedAndProject — each partition
    keeps its local top-k and only k rows per partition reach the
    merge. The r10 first cut spelled it row_number() OVER (ORDER BY
    hv) + literal rk <= k; on Spark 4.1 the optimizer rescues that
    shape (limit-pushdown-through-window plants a TakeOrdered below
    the Window), but the rescue is pattern-sensitive — a non-literal
    bound, or the rank aliased through another projection, regresses
    to an empty-frame global window, i.e. every distinct hash of the
    column sorted in ONE task. The direct top-k plan has no Window
    node to rescue (plan-asserted: 50 TakeOrderedAndProject, 0
    Window) and measured ~1.4x faster at sf1 across closing runs
    (15.0 s -> 10.3 s, growth per 10x 2.57x -> 1.59x). Same rows
    either way (hv values are distinct, no tie ambiguity).

    Estimator: the standard KMV branch — when a sketch is UNSATURATED
    (ke < k: the column has fewer distinct values than sketch slots)
    it holds every distinct hash, so ke IS the exact count and is
    reported directly; the ratio form (ke-1)/(kth/2^60) with its
    ~1/sqrt(k) ≈ 9% relative error applies only to saturated
    sketches. Both engines branch identically, so the published
    estimates stay hash-pinned AND correct for small-cardinality
    columns (nationkey: est == 25 exactly).

    This is the AUDIT variant (exact distinct-joins ride along as
    nd_a/nd_b/n_common so the error is measurable). Production use on
    a wide warehouse wants kmv_joinability(sketch_only=True), which
    drops the exact columns — and with them every join keyed on raw
    column values — leaving only the TakeOrdered sketch merges."""
    return kmv_joinability(spark, sf_dir, sketch_only=False)


def kmv_joinability(spark, sf_dir, sketch_only=False):
    """The joinability operator behind q283. sketch_only=True is the
    production path the q283 docstring's 500-table-warehouse claim
    needs: no exact distinct-join per pair (those are a shuffle per
    pair), only constant-size sketch merges — plan-asserted in
    tests/test_plans.py::test_kmv_sketch_only_has_no_exact_join."""
    rows = []
    for ta, ca, tb, cb in _J_PAIRS:

        def sketch(t, c):
            h = (
                table(spark, sf_dir, t)
                .where(F.col(c).isNotNull())
                .select(
                    F.conv(
                        F.substring(F.md5(F.col(c).cast("string")), 1, 15),
                        16,
                        10,
                    ).cast("bigint").alias("hv")
                )
                .distinct()
            )
            return h.orderBy("hv").limit(_KMVJ_K)

        ak = sketch(ta, ca)
        bk = sketch(tb, cb)
        uk = ak.union(bk).distinct().orderBy("hv").limit(_KMVJ_K)
        astat = ak.agg(F.max("hv").alias("kth_a"), F.count("*").alias("ke_a"))
        bstat = bk.agg(F.max("hv").alias("kth_b"), F.count("*").alias("ke_b"))
        ustat = uk.agg(F.max("hv").alias("kth_u"), F.count("*").alias("ke_u"))
        inter = (
            uk.join(ak, "hv", "left_semi")
            .join(bk, "hv", "left_semi")
            .agg(F.count("*").alias("n_i"))
        )
        scale = F.lit(1152921504606846976).cast("double")

        def est(ke, kth):
            # unsaturated sketch (ke < k) holds every distinct hash:
            # ke is exact; the (ke-1)/(kth/2^60) ratio is for ke == k
            return F.when(
                F.col(ke) < _KMVJ_K, F.col(ke).cast("double")
            ).otherwise((F.col(ke) - 1) / (F.col(kth) / scale))

        union_est = est("ke_u", "kth_u")
        # try_divide: an empty union sketch (both columns empty) gives
        # NULL jaccard, mirroring the oracle's NULL-on-zero division
        jacc = F.try_divide(F.col("n_i"), F.col("ke_u").cast("double"))
        base = (
            astat.crossJoin(F.broadcast(bstat))
            .crossJoin(F.broadcast(ustat))
            .crossJoin(F.broadcast(inter))
        )
        cols = [
            F.lit(f"{ta}.{ca}").alias("col_a"),
            F.lit(f"{tb}.{cb}").alias("col_b"),
            F.col("ke_u").cast("int").alias("ke_u"),
            F.round(est("ke_a", "kth_a"), 9).alias("est_nd_a"),
            F.round(est("ke_b", "kth_b"), 9).alias("est_nd_b"),
            F.round(jacc, 9).alias("est_jaccard"),
            F.round(jacc * union_est, 9).alias("est_n_common"),
        ]
        if not sketch_only:
            a_ex = (
                table(spark, sf_dir, ta)
                .select(F.col(ca).alias("k"))
                .distinct()
            )
            b_ex = (
                table(spark, sf_dir, tb)
                .select(F.col(cb).alias("k"))
                .distinct()
            )
            ex = (
                a_ex.join(b_ex, "k")
                .agg(F.count("*").alias("n_common"))
                .crossJoin(F.broadcast(a_ex.agg(F.count("k").alias("nd_a"))))
                .crossJoin(F.broadcast(b_ex.agg(F.count("k").alias("nd_b"))))
            )
            base = base.crossJoin(F.broadcast(ex))
            cols += [
                F.col("nd_a").cast("bigint").alias("nd_a"),
                F.col("nd_b").cast("bigint").alias("nd_b"),
                F.col("n_common").cast("bigint").alias("n_common"),
            ]
        rows.append(base.select(*cols))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --------------------------------------------------------------------------
# q250 — declarative data-quality rule engine (the Deequ/dbt-test shape)


@register(
    "q250_dq_rules",
    sql="""
    WITH rowlocal AS (
        SELECT
            SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS r1,
            SUM(CASE WHEN o_totalprice <= 0
                       OR o_totalprice > 1000000 THEN 1 ELSE 0 END) AS r2,
            SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                     THEN 1 ELSE 0 END) AS r3,
            SUM(CASE WHEN o_orderdate > TIMESTAMP '1998-08-02'
                     THEN 1 ELSE 0 END) AS r6,
            COUNT(*) - COUNT(DISTINCT o_orderkey) AS r5
        FROM orders),
    refint AS (
        SELECT COUNT(*) AS r4
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL),
    report AS (
        SELECT 1 AS rule_id, 'not_null:o_custkey' AS rule_name,
               CAST(r1 AS BIGINT) AS n_violations FROM rowlocal
        UNION ALL
        SELECT 2, 'range:o_totalprice(0,1e6]', CAST(r2 AS BIGINT)
        FROM rowlocal
        UNION ALL
        SELECT 3, 'enum:o_orderstatus{O,F,P}', CAST(r3 AS BIGINT)
        FROM rowlocal
        UNION ALL
        SELECT 4, 'ref:o_custkey->customer', CAST(r4 AS BIGINT)
        FROM refint
        UNION ALL
        SELECT 5, 'unique:o_orderkey', CAST(r5 AS BIGINT) FROM rowlocal
        UNION ALL
        SELECT 6, 'freshness:o_orderdate<=1998-08-02', CAST(r6 AS BIGINT)
        FROM rowlocal)
    SELECT rule_id, rule_name, n_violations,
           CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM report
    """,
    tags=("quality", "validation", "governance"),
)
def q250_dq_rules(spark, sf_dir):
    """Declarative data-quality rule engine — the Deequ / dbt-test /
    Great-Expectations shape: a fixed rule set evaluated into a
    (rule, violations, status) report in as few passes as the rule
    classes allow. Rule classes and their plan cost:

      - ROW-LOCAL rules (not-null, range, enum membership, freshness
        cutoff) all fold into ONE conditional aggregate — a single
        scan regardless of how many such rules are registered;
      - UNIQUENESS is the same scan's COUNT(*) - COUNT(DISTINCT pk)
        (Spark computes it in the same Aggregate node);
      - REFERENTIAL integrity is the one rule that genuinely needs a
        join: a null-producing left join (anti-join shape) against
        the dimension's key projection.

    At 100 TB the engine runs the row-local bundle map-side-combined,
    broadcasts the dimension keyset when it fits, and the report is
    six rows however wide the table — checks cost scans, not rules.
    The 1998-08-02 freshness cutoff is TPC-H's dataset end date, so
    the rule passes on clean fixtures and trips on future-dated
    rows."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    rowlocal = o.agg(
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("r1"),
        F.sum(
            (
                (F.col("o_totalprice") <= 0)
                | (F.col("o_totalprice") > 1000000)
            ).cast("long")
        ).alias("r2"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
        ).alias("r3"),
        F.sum(
            (F.col("o_orderdate") > F.lit("1998-08-02").cast("timestamp"))
            .cast("long")
        ).alias("r6"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("r5"),
    )
    r4 = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("r4"))
    )
    rules = [
        (1, "not_null:o_custkey", "r1", rowlocal),
        (2, "range:o_totalprice(0,1e6]", "r2", rowlocal),
        (3, "enum:o_orderstatus{O,F,P}", "r3", rowlocal),
        (4, "ref:o_custkey->customer", "r4", r4),
        (5, "unique:o_orderkey", "r5", rowlocal),
        (6, "freshness:o_orderdate<=1998-08-02", "r6", rowlocal),
    ]
    parts = [
        src.select(
            F.lit(rid).alias("rule_id"),
            F.lit(name).alias("rule_name"),
            F.col(col).cast("bigint").alias("n_violations"),
        )
        for rid, name, col, src in rules
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule_id", "rule_name", "n_violations",
        F.when(F.col("n_violations") == 0, "pass")
        .otherwise("fail")
        .alias("status"),
    )


# --------------------------------------------------------------------------
# q251 — k-anonymity audit across a generalization ladder (GROUPING SETS)


_K_ANON = 5


@register(
    "q251_k_anonymity",
    sql=f"""
    WITH q AS (
        SELECT c_nationkey AS nat, c_mktsegment AS seg,
               CAST(floor(c_acctbal / 100) AS BIGINT) AS band100,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS band1000
        FROM customer),
    g AS (
        SELECT nat, seg, band100, band1000, COUNT(*) AS cnt,
               GROUPING(band100) AS g100, GROUPING(band1000) AS g1000
        FROM q
        GROUP BY GROUPING SETS ((nat, seg, band100),
                                (nat, seg, band1000),
                                (nat, seg))),
    lv AS (
        SELECT CASE WHEN g100 = 0 THEN 'L0:band100'
                    WHEN g1000 = 0 THEN 'L1:band1000'
                    ELSE 'L2:no_band' END AS level,
               cnt
        FROM g)
    SELECT level,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN cnt < {_K_ANON} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_small_groups,
           CAST(SUM(CASE WHEN cnt < {_K_ANON} THEN cnt ELSE 0 END)
                AS BIGINT) AS n_rows_at_risk,
           CAST(MIN(cnt) AS BIGINT) AS min_group_size
    FROM lv GROUP BY level
    """,
    tags=("privacy", "governance", "groupingsets"),
)
def q251_k_anonymity(spark, sf_dir):
    """k-anonymity audit over a GENERALIZATION LADDER — the privacy
    gate a training-data release runs before shipping: every
    quasi-identifier combination (nation, segment, account-balance
    band) must describe at least k=5 (_K_ANON) people, else those rows
    re-identify. The ladder evaluates three generalization levels —
    fine bands (/100), coarse bands (/1000), no band — in ONE scan
    via GROUPING SETS: Catalyst expands the sets inside a single
    Expand + Aggregate pair, so adding ladder rungs costs a constant
    factor on one shuffle, never extra scans (the same trick as the
    q04/q05/q06 rollup family, pointed at governance instead of BI).
    GROUPING() bits identify each rung. Per level: group count,
    groups below k, rows at risk, and the worst (smallest) group —
    the release decision reads off whichever rung first drives
    rows-at-risk to an acceptable floor. At 100 TB this is one
    Expand(3x) aggregate on the quasi-identifier key space; the
    report is |levels| rows."""
    c = table(spark, sf_dir, "customer")
    q = c.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 100).cast("bigint").alias("band100"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band1000"),
    )
    q.createOrReplaceTempView("q251_quasi")
    g = spark.sql(
        """
        SELECT nat, seg, band100, band1000, COUNT(*) AS cnt,
               GROUPING(band100) AS g100, GROUPING(band1000) AS g1000
        FROM q251_quasi
        GROUP BY GROUPING SETS ((nat, seg, band100),
                                (nat, seg, band1000),
                                (nat, seg))
        """
    )
    lv = g.select(
        F.when(F.col("g100") == 0, "L0:band100")
        .when(F.col("g1000") == 0, "L1:band1000")
        .otherwise("L2:no_band")
        .alias("level"),
        "cnt",
    )
    k = F.lit(_K_ANON)
    return lv.groupBy("level").agg(
        F.count("*").alias("n_groups"),
        F.sum((F.col("cnt") < k).cast("long")).cast("bigint").alias(
            "n_small_groups"
        ),
        F.sum(F.when(F.col("cnt") < k, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("cnt").cast("bigint").alias("min_group_size"),
    )


# --------------------------------------------------------------------------
# q259 — dataset version manifest (order-independent content hashing)


@register(
    "q259_dataset_manifest",
    sql="""
    WITH h AS (
        SELECT source, n_chars,
               CAST(('0x' || substr(md5(
                        coalesce(CAST(doc_id AS VARCHAR), chr(0)) || ':'
                        || coalesce(text, chr(0)) || ':'
                        || coalesce(lang, chr(0))), 1, 15))
                    AS BIGINT) AS rh
        FROM documents)
    SELECT COALESCE(source, 'ALL') AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
           CAST(bit_xor(rh) AS BIGINT) AS content_hash
    FROM h GROUP BY ROLLUP (source)
    """,
    tags=("governance", "versioning", "manifest"),
)
def q259_dataset_manifest(spark, sf_dir):
    """Dataset version MANIFEST — the reproducibility primitive a
    training run records before it starts: an order-independent
    content hash per source plus a corpus-level hash, so "did the
    data change since the last run?" is one manifest diff, never a
    re-read. Each row hashes to a 60-bit md5 digest over its identity
    AND content (doc_id, text, lang); rows combine with BIT_XOR — the
    associative/commutative fold that makes the digest independent of
    partitioning, task order, and file layout (any engine, any
    parallelism, same hash), and incrementally maintainable: XOR the
    hash of added/removed rows into the stored manifest and the new
    version id is exact without touching the rest (the same algebra
    as q156's incremental aggregate, applied to content identity).
    ROLLUP emits per-source rows and the 'ALL' corpus row from one
    aggregate. At 100 TB this is a single map-side-combined scan;
    the manifest (|sources|+1 rows) is the entire artifact."""
    d = table(spark, sf_dir, "documents")
    h = d.select(
        "source", "n_chars",
        F.conv(
            F.substring(
                # NULL fields hash as a NUL marker, DISTINCT from
                # empty string: a missing value must CHANGE the
                # manifest, not silently alias '' (concat_ws would
                # drop it) or vanish from the XOR (NULL-propagating
                # concat would)
                F.md5(
                    F.concat_ws(
                        ":",
                        F.coalesce(
                            F.col("doc_id").cast("string"), F.lit("\x00")
                        ),
                        F.coalesce(F.col("text"), F.lit("\x00")),
                        F.coalesce(F.col("lang"), F.lit("\x00")),
                    )
                ),
                1, 15,
            ),
            16, 10,
        ).cast("bigint").alias("rh"),
    )
    return h.rollup("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        F.bit_xor("rh").cast("bigint").alias("content_hash"),
    ).select(
        F.coalesce(F.col("source"), F.lit("ALL")).alias("source"),
        "n_docs", "n_chars_total", "content_hash",
    )


# --------------------------------------------------------------------------
# q260 — join-key skew diagnosis (the report you run BEFORE salting)


def _skew_audit_sql(col: str, table_name: str) -> str:
    return f"""
        SELECT '{col}' AS key_col,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(MAX(cnt) AS BIGINT) AS max_per_key,
               round(CAST(MAX(cnt) AS DOUBLE) * COUNT(*) / SUM(cnt), 6)
                   AS key_skew_factor,
               CAST(MAX(bucket_rows) AS BIGINT) AS max_bucket_rows,
               round(CAST(MAX(bucket_rows) AS DOUBLE) * 32 / SUM(cnt), 6)
                   AS bucket_imbalance
        FROM (
            SELECT cnt,
                   SUM(cnt) OVER (PARTITION BY k % 32) AS bucket_rows
            FROM (SELECT {col} AS k, COUNT(*) AS cnt
                  FROM {table_name} GROUP BY {col}))"""


@register(
    "q260_skew_diagnosis",
    sql=f"""
    {_skew_audit_sql('l_suppkey', 'lineitem')}
    UNION ALL
    {_skew_audit_sql('l_orderkey', 'lineitem')}
    """,
    tags=("scale", "skew", "diagnosis"),
)
def q260_skew_diagnosis(spark, sf_dir):
    """Join-key SKEW DIAGNOSIS — the metadata report that decides,
    before any 100 TB join runs, whether a key needs salting (q134),
    AQE skew splitting, or nothing. For each candidate join key it
    computes, from one per-key count aggregate:

      - key_skew_factor = max_per_key / mean_per_key — how hot the
        hottest KEY is (drives the salting decision: a factor near 1
        means uniform, q134's stress key hit ~80,000x);
      - bucket_imbalance = max over 32 hash buckets of bucket rows /
        mean bucket rows — how hot the hottest REDUCER would be under
        a 32-partition hash shuffle; this is the number that actually
        predicts the straggler, because many warm keys can pile into
        one bucket even when no single key is hot.

    Both audited columns come from the same fact table on purpose:
    l_suppkey (low cardinality, many rows per key) vs l_orderkey
    (high cardinality, few rows per key) bracket the two regimes a
    planner meets. Cost: one groupBy per key column over the fact
    table — the same partial-agg shuffle any count runs; the
    diagnosis output is 2 rows. The bucket sum rides a window over
    the per-key grid, never the raw rows."""
    li = table(spark, sf_dir, "lineitem")

    def audit(col):
        cnt = li.groupBy(F.col(col).alias("k")).agg(
            F.count("*").alias("cnt")
        )
        wb = Window.partitionBy(F.col("k") % 32)
        g = cnt.select("cnt", F.sum("cnt").over(wb).alias("bucket_rows"))
        return g.agg(
            F.lit(col).alias("key_col"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.max("cnt").cast("bigint").alias("max_per_key"),
            F.round(
                F.max("cnt").cast("double") * F.count("*") / F.sum("cnt"), 6
            ).alias("key_skew_factor"),
            F.max("bucket_rows").cast("bigint").alias("max_bucket_rows"),
            F.round(
                F.max("bucket_rows").cast("double") * 32 / F.sum("cnt"), 6
            ).alias("bucket_imbalance"),
        ).select(
            "key_col", "n_keys", "n_rows", "max_per_key",
            "key_skew_factor", "max_bucket_rows", "bucket_imbalance",
        )

    return audit("l_suppkey").unionByName(audit("l_orderkey"))
