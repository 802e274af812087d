"""Retrieval-side operator batch: diversity-aware reranking,
conversion-lag percentiles, and weighted reservoir sampling.

  - q205: maximal-marginal-relevance (MMR) reranking — the standard
    diversity-aware top-k used between ANN retrieval and prompt
    assembly in RAG serving: greedily pick the candidate maximizing
    λ·sim(query, c) − (1−λ)·max_{s∈selected} sim(c, s). Five greedy
    steps unrolled into one declarative plan (the q200 unrolling
    pattern), hash-checked including every cosine.
  - q206: view→purchase conversion-lag percentiles — the funnel
    latency metric (how long until users convert).
  - q207: Efraimidis–Spirakis weighted sampling with DETERMINISTIC
    hash-uniforms: key = ln(u)/w with u derived from md5(orderkey),
    top-k by key — the weighted-reservoir shape (A-Res) with an
    RNG-free twist that makes the sample hash-checkable and
    re-run-stable.

Scale notes (100 TB):
  - q205 runs on a top-N candidate set (N=20 here) produced by the
    ANN/exact retrieval stage — MMR cost is O(N·k) pair scores per
    query, independent of corpus size; candidates ride a constant-key
    broadcast join, never a cartesian.
  - q206 reduces events to per-user first-view/first-purchase rows
    before the percentile agg.
  - q207 is a single scan + TakeOrdered top-k: each partition keeps
    its local k, the driver merges k·partitions — the same shape as
    q196's KMV sketch, and the weighted analog of hash split (q96).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.functions.vectors import cosine
from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table
from rc_rag_spark.checkpoints import ckpt as _ckpt

_MMR_LAMBDA = 0.7
_MMR_N_CAND = 20
_MMR_K = 5


def _mmr_sql() -> str:
    """Chained-CTE MMR: top-20 cosine candidates for query vec 0,
    then 4 unrolled greedy steps after seeding with the top-1."""
    head = f"""
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
          WHERE vec_id = 0),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
          WHERE vec_id >= 1),
    scored AS (SELECT c.vec_id, c.cv,
                      list_dot_product(c.cv, q.qv)
                      / (sqrt(list_dot_product(c.cv, c.cv))
                         * sqrt(list_dot_product(q.qv, q.qv))) AS qsim
               FROM c, q),
    cand AS (SELECT vec_id, cv, qsim,
                    ROW_NUMBER() OVER (ORDER BY qsim DESC, vec_id) AS rk
             FROM scored
             QUALIFY rk <= {_MMR_N_CAND}),
    sel1 AS (SELECT vec_id, cv, qsim, 1 AS pick FROM cand WHERE rk = 1)"""
    steps = []
    prev_sel = "sel1"
    for k in range(2, _MMR_K + 1):
        steps.append(f"""
    rem{k} AS (SELECT * FROM cand
               WHERE vec_id NOT IN (SELECT vec_id FROM {prev_sel})),
    pen{k} AS (SELECT r.vec_id, r.cv, r.qsim,
                      MAX(list_dot_product(r.cv, s.cv)
                          / (sqrt(list_dot_product(r.cv, r.cv))
                             * sqrt(list_dot_product(s.cv, s.cv))))
                          AS maxsim
               FROM rem{k} r, {prev_sel} s
               GROUP BY r.vec_id, r.cv, r.qsim),
    best{k} AS (SELECT vec_id, cv, qsim, {k} AS pick
                FROM pen{k}
                ORDER BY {_MMR_LAMBDA} * qsim
                         - {1 - _MMR_LAMBDA} * maxsim DESC, vec_id
                LIMIT 1),
    sel{k} AS (SELECT * FROM {prev_sel} UNION ALL SELECT * FROM best{k})""")
        prev_sel = f"sel{k}"
    return (
        "WITH " + head + "," + ",".join(s.lstrip("\n") for s in steps) + f"""
    SELECT CAST(pick AS INTEGER) AS pick, vec_id,
           round(qsim, 9) AS qsim
    FROM {prev_sel}"""
    )


@register(
    "q205_mmr_rerank",
    sql=_mmr_sql(),
    tags=("retrieval", "mmr", "diversity"),
)
def q205_mmr_rerank(spark, sf_dir):
    """Maximal-marginal-relevance rerank of the top-20 cosine
    candidates for query vector 0: seed with the most similar, then
    4 greedy steps each maximizing λ·sim(q,c) − (1−λ)·max sim(c,
    selected), λ=0.7 — the diversity-aware top-k between retrieval
    and prompt assembly in a RAG stack. The greedy loop is unrolled
    into one plan (q200's pattern); every cosine is the proven
    sequential fold, the penalty join is a constant-key broadcast of
    the ≤5 selected rows (never a cartesian), and the argmax orders
    on identically-computed doubles with vec_id tie-break, so all
    five picks hash-match the chained-CTE oracle."""
    e = table(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    c = e.where(F.col("vec_id") >= 1).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("cv")
    )
    scored = c.crossJoin(F.broadcast(qv)).select(
        "vec_id",
        "cv",
        cosine("cv", "qv").alias("qsim"),
    )
    # localCheckpoint: the greedy loop references cand/sel several
    # times per step; without a lineage barrier the plan triples per
    # iteration (the q169 k-means / GD-weights discipline). cand is
    # 20 rows, sel ≤ 5 — the checkpoints are trivially cheap.
    cand = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("qsim").desc(), F.col("vec_id"))
            ),
        )
        .where(F.col("rk") <= _MMR_N_CAND)
        .drop("rk")
        .withColumn("one", F.lit(1))
    ).transform(_ckpt)
    sel = cand.orderBy(F.col("qsim").desc(), F.col("vec_id")).limit(1).select(
        "vec_id", "cv", "qsim", F.lit(1).alias("pick"), "one"
    ).transform(_ckpt)
    for k in range(2, _MMR_K + 1):
        rem = cand.join(
            sel.select(F.col("vec_id").alias("_sid")),
            cand.vec_id == F.col("_sid"),
            "left_anti",
        )
        s_side = F.broadcast(
            sel.select(
                F.col("cv").alias("sv"), F.lit(1).alias("one")
            )
        )
        pen = (
            rem.join(s_side, "one")
            .select(
                "vec_id",
                "cv",
                "qsim",
                "one",
                cosine("cv", "sv").alias("ssim"),
            )
            .groupBy("vec_id", "cv", "qsim", "one")
            .agg(F.max("ssim").alias("maxsim"))
        )
        best = (
            pen.orderBy(
                (
                    F.lit(_MMR_LAMBDA) * F.col("qsim")
                    - F.lit(1 - _MMR_LAMBDA) * F.col("maxsim")
                ).desc(),
                F.col("vec_id"),
            )
            .limit(1)
            .select("vec_id", "cv", "qsim", F.lit(k).alias("pick"), "one")
        )
        sel = sel.unionByName(best).transform(_ckpt)
    return sel.select(
        F.col("pick").cast("int").alias("pick"),
        "vec_id",
        F.round("qsim", 9).alias("qsim"),
    )


# --------------------------------------------------------------------------
# q206 — view→purchase conversion-lag percentiles


@register(
    "q206_time_to_convert",
    sql="""
    WITH fv AS (SELECT user_id, MIN(ts) AS first_view FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    fp AS (SELECT e.user_id, MIN(e.ts) AS first_buy
           FROM events e JOIN fv ON fv.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts > fv.first_view
           GROUP BY e.user_id),
    lag AS (SELECT fv.user_id,
                   epoch(fp.first_buy) - epoch(fv.first_view) AS sec
            FROM fv JOIN fp ON fp.user_id = fv.user_id),
    u AS (SELECT COUNT(*) AS n_users FROM fv)
    SELECT CAST(u.n_users AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           round(quantile_cont(sec, 0.25), 6) AS p25_sec,
           round(quantile_cont(sec, 0.50), 6) AS p50_sec,
           round(quantile_cont(sec, 0.75), 6) AS p75_sec,
           round(quantile_cont(sec, 0.90), 6) AS p90_sec
    FROM lag, u
    GROUP BY u.n_users
    """,
    tags=("product-analytics", "funnel", "latency"),
)
def q206_time_to_convert(spark, sf_dir):
    """Conversion-latency percentiles: per user, the lag from first
    view to the first purchase after it, summarized at p25/50/75/90 —
    the funnel-latency companion to the conversion-rate funnels
    (q89/q149). Lags are epoch-second doubles (microsecond-exact on
    both engines); exact `percentile` matches DuckDB `quantile_cont`
    bit-wise. Events reduce to per-user first-event rows before the
    percentile aggregate."""
    e = table(spark, sf_dir, "events")
    fv = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        e.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_buy"))
    )
    lag = fv.join(fp, "user_id").select(
        (
            F.col("first_buy").cast("double")
            - F.col("first_view").cast("double")
        ).alias("sec")
    )
    u = fv.agg(F.count("*").alias("n_users"))
    return lag.crossJoin(F.broadcast(u)).groupBy("n_users").agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(sec, 0.25)"), 6).alias("p25_sec"),
        F.round(F.expr("percentile(sec, 0.50)"), 6).alias("p50_sec"),
        F.round(F.expr("percentile(sec, 0.75)"), 6).alias("p75_sec"),
        F.round(F.expr("percentile(sec, 0.90)"), 6).alias("p90_sec"),
    ).select(
        F.col("n_users").cast("bigint").alias("n_users"),
        "n_converted",
        "p25_sec",
        "p50_sec",
        "p75_sec",
        "p90_sec",
    )


# --------------------------------------------------------------------------
# q207 — deterministic Efraimidis–Spirakis weighted sample


_ES_K = 10
_TWO60 = 1152921504606846976


@register(
    "q207_weighted_reservoir",
    sql=f"""
    WITH h AS (SELECT o_orderkey, o_totalprice,
                      (CAST(('0x' || substr(md5(CAST(o_orderkey
                                                     AS VARCHAR)), 1, 15))
                            AS BIGINT) + 1)
                      / CAST({_TWO60} AS DOUBLE) AS u
               FROM orders WHERE o_totalprice > 0),
    keyed AS (SELECT o_orderkey, o_totalprice,
                     ln(u) / o_totalprice AS es_key
              FROM h),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY es_key DESC, o_orderkey)
                    AS rank
          FROM keyed)
    SELECT CAST(rank AS INTEGER) AS rank, o_orderkey,
           round(o_totalprice, 2) AS weight,
           round(es_key, 9) + 0 AS es_key
    FROM r WHERE rank <= {_ES_K}
    """,
    tags=("sampling", "weighted", "reservoir"),
)
def q207_weighted_reservoir(spark, sf_dir):
    """Efraimidis–Spirakis weighted sample of 10 orders with
    probability ∝ o_totalprice, using DETERMINISTIC uniforms
    u = (md5₆₀(orderkey)+1)/2⁶⁰: rank by key = ln(u)/w descending
    (the log-space equivalent of u^(1/w)) and keep the top-k. RNG-
    free, so the sample is reproducible across retries/engines and
    hash-checks exactly — the weighted analog of the q96 hash split.
    Plan shape is a single scan + TakeOrdered: each partition keeps
    a local top-k, the driver merges k·partitions keys — the A-Res
    reservoir shape."""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    u = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(float(_TWO60))
    keyed = o.select(
        "o_orderkey",
        "o_totalprice",
        (F.log(u) / F.col("o_totalprice")).alias("es_key"),
    )
    r = keyed.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("es_key").desc(), F.col("o_orderkey"))
        ),
    ).where(F.col("rank") <= _ES_K)
    return r.select(
        F.col("rank").cast("int").alias("rank"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("weight"),
        # + 0 folds IEEE negative zero to +0.0 (DuckDB's round keeps
        # -0.0 for tiny negative keys; Spark's does not — the only
        # value-level formatting divergence between the engines)
        (F.round("es_key", 9) + F.lit(0.0)).alias("es_key"),
    )
