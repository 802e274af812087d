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
    ).localCheckpoint(eager=True)
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
        F.round(
            F.col("n_converted") / F.col("n_viewers").cast("double"), 9
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
                F.round(
                    F.col("n_common") / F.col("nd_a").cast("double"), 9
                ).alias("containment_a"),
                F.round(
                    F.col("n_common") / F.col("nd_b").cast("double"), 9
                ).alias("containment_b"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
