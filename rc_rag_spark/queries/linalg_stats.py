"""Distributed linear-algebra + model-evaluation batch.

  - q197: Pearson correlation matrix of lineitem's numeric columns
    from one single-pass moment aggregate (the profiling step before
    any feature-selection / multicollinearity decision).
  - q198: Herfindahl–Hirschman concentration index of supplier
    revenue within each nation — the market-concentration twin of
    the Gini query (q184).
  - q199: calibration report for the naive-Bayes classifier (q186):
    softmax confidence of the argmax class binned into deciles with
    per-bin accuracy — reliability-diagram data, fully hash-checked
    including the softmax.
  - q200: top principal component of the embedding corpus by THREE
    unrolled power-iteration steps, computing A·v as two aggregation
    passes (s_i = x_i·v, then Σ s_i·x_i) so the 64×64 covariance/Gram
    matrix is never materialized — the canonical distributed-PCA
    step.

Scale notes (100 TB):
  - q197 is one scan + one 1-row aggregate (all 14 moment sums ride
    the same partial agg); pair rows are unpivoted from that single
    row. Shuffle = O(partitions).
  - q198 reduces lineitem to (nation, supplier) revenue before the
    share math; both aggs are standard partial+final.
  - q199 adds two tiny windows on the per-(doc, lang) score grid the
    NB model already produces.
  - q200 does 3 × (map + 64-group aggregate): per step the shuffle
    carries 64 quantized partial sums per partition; v (64 numbers)
    rides along as a broadcast. Gram-free A·v is what makes power
    iteration viable at 10⁹ vectors.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import register
from rc_rag_spark.queries.linkage import _NB_CTES, nb_posteriors
from rc_rag_spark.sources import table


# --------------------------------------------------------------------------
# q197 — Pearson correlation matrix from one pass of moment sums


_Q197_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _q197_sql() -> str:
    sums = ["COUNT(*) AS n"]
    for c in _Q197_COLS:
        sums.append(f"SUM(CAST({c} AS DECIMAL(12,2))) AS s_{c}")
        sums.append(
            f"SUM(CAST({c} AS DECIMAL(12,2))"
            f" * CAST({c} AS DECIMAL(12,2))) AS s_{c}_{c}"
        )
    pairs = []
    for i, a in enumerate(_Q197_COLS):
        for b in _Q197_COLS[i + 1:]:
            sums.append(
                f"SUM(CAST({a} AS DECIMAL(12,2))"
                f" * CAST({b} AS DECIMAL(12,2))) AS s_{a}_{b}"
            )
            # The exact-DECIMAL sums are cast to DOUBLE *before*
            # combining: n·Sxy would overflow Spark's 38-digit DECIMAL
            # cap (silent scale reduction ⇒ cross-engine drift), while
            # identical double casts of identical decimals followed by
            # identical IEEE ops stay bit-equal.
            # greatest(·, 0): at n=1 the variance terms are x²−x² —
            # double rounding can land an ulp BELOW zero, where
            # DuckDB's sqrt ERRORS (Spark's yields NaN). Clamped, a
            # zero/negative variance divides by 0 → NULL on both
            # engines (DuckDB x/0 is NULL; Spark side uses
            # try_divide). Positive variance is untouched.
            pairs.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b,\n"
                f"  round((CAST(n AS DOUBLE) * CAST(s_{a}_{b} AS DOUBLE)\n"
                f"         - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))\n"
                f"        / sqrt(greatest((CAST(n AS DOUBLE) * CAST(s_{a}_{a}"
                f" AS DOUBLE)\n"
                f"                - CAST(s_{a} AS DOUBLE) * CAST(s_{a}"
                f" AS DOUBLE))\n"
                f"               * (CAST(n AS DOUBLE) * CAST(s_{b}_{b}"
                f" AS DOUBLE)\n"
                f"                  - CAST(s_{b} AS DOUBLE) * CAST(s_{b}"
                f" AS DOUBLE)), CAST(0 AS DOUBLE))), 9) AS r\n"
                f"FROM m"
            )
    return (
        "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(pairs)
    )


@register(
    "q197_correlation_matrix",
    sql=_q197_sql(),
    tags=("profiling", "correlation", "moments"),
)
def q197_correlation_matrix(spark, sf_dir):
    """Pearson correlation for every pair of lineitem's numeric
    columns, computed from a SINGLE pass of exact-DECIMAL moment sums
    (n, Σx, Σx², Σxy): r = (n·Σxy − Σx·Σy) / √((n·Σx²−Σx²)(n·Σy²−Σy²)).
    The moment sums are exact DECIMAL; they are cast to DOUBLE before
    being combined (n·Σxy would overflow the 38-digit DECIMAL cap,
    where Spark silently reduces scale and drifts from DuckDB), and
    every subsequent op is the same IEEE chain on both engines. One
    scan, one 1-row aggregate, pair rows unpivoted from that row —
    the multicollinearity screen before feature selection, at
    O(partitions) shuffle cost."""
    li = table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("n")]
    for c in _Q197_COLS:
        d = F.col(c).cast("decimal(12,2)")
        aggs.append(F.sum(d).alias(f"s_{c}"))
        aggs.append(F.sum(d * d).alias(f"s_{c}_{c}"))
    for i, a in enumerate(_Q197_COLS):
        for b in _Q197_COLS[i + 1:]:
            da = F.col(a).cast("decimal(12,2)")
            db = F.col(b).cast("decimal(12,2)")
            aggs.append(F.sum(da * db).alias(f"s_{a}_{b}"))
    m = li.agg(*aggs)

    def _dd(name):
        return f"CAST({name} AS DOUBLE)"

    # stack() unpivots all 6 pair correlations from the single moment
    # row in one projection — one scan, one aggregate (a union of
    # per-pair selects would re-scan lineitem per pair; AQE does not
    # reuse the aggregate exchange across union branches).
    terms = []
    for i, a in enumerate(_Q197_COLS):
        for b in _Q197_COLS[i + 1:]:
            num = (f"({_dd('n')} * {_dd(f's_{a}_{b}')}"
                   f" - {_dd(f's_{a}')} * {_dd(f's_{b}')})")
            va = (f"({_dd('n')} * {_dd(f's_{a}_{a}')}"
                  f" - {_dd(f's_{a}')} * {_dd(f's_{a}')})")
            vb = (f"({_dd('n')} * {_dd(f's_{b}_{b}')}"
                  f" - {_dd(f's_{b}')} * {_dd(f's_{b}')})")
            # try_divide + greatest(·, 0): a degenerate input (n=1 or
            # a constant column) has zero variance — correlation is
            # undefined, NULL on both engines (see the oracle-side
            # comment in _q197_sql), not an ANSI DIVIDE_BY_ZERO or a
            # NaN from an ulp-negative variance product
            terms.append(
                f"'{a}', '{b}', "
                f"round(try_divide({num}, sqrt(greatest({va} * {vb}, "
                f"CAST(0 AS DOUBLE)))), 9)"
            )
    return m.selectExpr(
        f"stack({len(terms)}, {', '.join(terms)}) AS (col_a, col_b, r)"
    )


# --------------------------------------------------------------------------
# q198 — Herfindahl–Hirschman concentration of supplier revenue


@register(
    "q198_market_hhi",
    sql="""
    WITH rev AS (SELECT n.n_name, s.s_suppkey,
                        SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                            AS r
                 FROM lineitem l
                 JOIN supplier s ON s.s_suppkey = l.l_suppkey
                 JOIN nation n ON n.n_nationkey = s.s_nationkey
                 GROUP BY 1, 2),
    tot AS (SELECT n_name, SUM(r) AS t, COUNT(*) AS n_suppliers
            FROM rev GROUP BY 1)
    SELECT r.n_name,
           CAST(MAX(t.n_suppliers) AS BIGINT) AS n_suppliers,
           round(CAST(SUM(CAST(round(
                     (CAST(r.r AS DOUBLE) / CAST(t.t AS DOUBLE))
                     * (CAST(r.r AS DOUBLE) / CAST(t.t AS DOUBLE)), 12)
                     AS DECIMAL(24,12))) AS DOUBLE), 9) AS hhi
    FROM rev r JOIN tot t ON t.n_name = r.n_name
    GROUP BY r.n_name
    """,
    tags=("analytics", "hhi", "concentration"),
)
def q198_market_hhi(spark, sf_dir):
    """Herfindahl–Hirschman index of supplier revenue concentration
    within each nation: Σ share² over suppliers, share = supplier
    revenue / nation revenue. Each squared share is two identical
    IEEE ops quantized to DECIMAL before the exact SUM. 1/HHI is the
    'effective number of suppliers'; together with q184's Gini this
    covers both standard concentration diagnostics. lineitem reduces
    to (nation, supplier) rows before any share math."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r"))
    )
    tot = rev.groupBy("n_name").agg(
        F.sum("r").alias("t"), F.count("*").alias("n_suppliers")
    )
    share = F.col("r").cast("double") / F.col("t").cast("double")
    return (
        rev.join(F.broadcast(tot), "n_name")
        .groupBy("n_name")
        .agg(
            F.max("n_suppliers").cast("bigint").alias("n_suppliers"),
            F.round(
                F.sum(
                    F.round(share * share, 12).cast("decimal(24,12)")
                ).cast("double"),
                9,
            ).alias("hhi"),
        )
    )


# --------------------------------------------------------------------------
# q199 — calibration bins for the naive-Bayes classifier


@register(
    "q199_nb_calibration",
    sql=f"""
    WITH {_NB_CTES},
    mx AS (SELECT doc_id, lang_true, lang, post,
                  MAX(post) OVER (PARTITION BY doc_id) AS m,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY post DESC, lang) AS rk
           FROM wp),
    soft AS (SELECT doc_id, lang_true, lang, rk,
                    CAST(round(exp(CAST(post - m AS DOUBLE)), 12)
                         AS DECIMAL(24,12)) AS eterm
             FROM mx),
    den AS (SELECT doc_id, SUM(eterm) AS z FROM soft GROUP BY doc_id),
    conf AS (SELECT s.doc_id,
                    CASE WHEN s.lang = s.lang_true THEN 1 ELSE 0 END
                        AS correct,
                    1 / CAST(d.z AS DOUBLE) AS p
             FROM soft s JOIN den d ON d.doc_id = s.doc_id
             WHERE s.rk = 1),
    binned AS (SELECT LEAST(9, CAST(floor(round(p, 9) * 10) AS INTEGER))
                          AS bin,
                      correct, p
               FROM conf)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(correct) AS BIGINT) AS n_correct,
           round(SUM(correct) / CAST(COUNT(*) AS DOUBLE), 9) AS accuracy,
           round(CAST(SUM(CAST(round(p, 12) AS DECIMAL(24,12)))
                      AS DOUBLE) / COUNT(*), 9) AS mean_conf
    FROM binned GROUP BY bin
    """,
    tags=("ml", "calibration", "naive-bayes"),
)
def q199_nb_calibration(spark, sf_dir):
    """Reliability-diagram data for the q186 naive-Bayes model: the
    argmax class's softmax confidence p = 1/Σ_l exp(post_l − post_max)
    binned into deciles, with per-bin count, accuracy, and mean
    confidence — the standard calibration check run after any batch
    classifier. The softmax itself is hash-checked: exp terms are
    quantized to DECIMAL before the per-doc sum, the max/argmax
    compare exact DECIMAL posteriors, and the bin boundary uses the
    1e-9-rounded confidence. Cost on top of the model: two windows
    over the per-(doc, lang) score grid."""
    wp = nb_posteriors(spark, sf_dir)
    wdoc = Window.partitionBy("doc_id")
    mx = wp.select(
        "doc_id",
        "lang_true",
        "lang",
        "post",
        F.max("post").over(wdoc).alias("m"),
        F.row_number()
        .over(wdoc.orderBy(F.col("post").desc(), F.col("lang")))
        .alias("rk"),
    )
    soft = mx.select(
        "doc_id",
        "lang_true",
        "lang",
        "rk",
        F.round(F.exp((F.col("post") - F.col("m")).cast("double")), 12)
        .cast("decimal(24,12)")
        .alias("eterm"),
    )
    den = soft.groupBy("doc_id").agg(F.sum("eterm").alias("z"))
    conf = (
        soft.where(F.col("rk") == 1)
        .join(den, "doc_id")
        .select(
            "doc_id",
            F.when(F.col("lang") == F.col("lang_true"), 1)
            .otherwise(0)
            .alias("correct"),
            (F.lit(1) / F.col("z").cast("double")).alias("p"),
        )
    )
    binned = conf.select(
        F.least(
            F.lit(9), F.floor(F.round("p", 9) * 10).cast("int")
        ).alias("bin"),
        "correct",
        "p",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("correct").cast("bigint").alias("n_correct"),
        F.round(
            F.sum("correct") / F.count("*").cast("double"), 9
        ).alias("accuracy"),
        F.round(
            F.sum(F.round("p", 12).cast("decimal(24,12)")).cast("double")
            / F.count("*"),
            9,
        ).alias("mean_conf"),
    )


# --------------------------------------------------------------------------
# q200 — top principal component via unrolled power iteration


_PI_STEPS = 3
_DIM = 64


def _pi_sql() -> str:
    """Chained-CTE power iteration: v0 = uniform 1/8 (unit 64-vector);
    each step computes s_i = x_i·v, Av_d = Σ round(s_i·x_i[d], 12),
    then normalizes. Mirrors the Spark staging op-for-op."""
    ctes = [
        "x AS (SELECT vec_id, embedding::DOUBLE[] AS xv FROM embeddings)",
        "v0 AS (SELECT d, 0.125 AS v FROM generate_series(1, 64) AS t(d))",
    ]
    prev = "v0"
    for k in range(1, _PI_STEPS + 1):
        ctes.append(
            f"s{k} AS (SELECT x.vec_id, x.xv, "
            f"SUM(CAST(round(x.xv[p.d] * p.v, 12) AS DECIMAL(24,12))) "
            f"AS sdec FROM x, {prev} p GROUP BY x.vec_id, x.xv)"
        )
        ctes.append(
            f"av{k} AS (SELECT t.d, "
            f"SUM(CAST(round(CAST(s.sdec AS DOUBLE) * s.xv[t.d], 12) "
            f"AS DECIMAL(24,12))) AS av "
            f"FROM s{k} s, generate_series(1, 64) AS t(d) GROUP BY t.d)"
        )
        ctes.append(
            f"n{k} AS (SELECT sqrt(CAST(SUM(CAST(round("
            f"CAST(av AS DOUBLE) * CAST(av AS DOUBLE), 12) "
            f"AS DECIMAL(24,12))) AS DOUBLE)) AS nrm FROM av{k})"
        )
        ctes.append(
            f"v{k} AS (SELECT a.d, "
            f"round(CAST(a.av AS DOUBLE) / n.nrm, 12) AS v "
            f"FROM av{k} a, n{k} n)"
        )
        prev = f"v{k}"
    return (
        "WITH " + ",\n".join(ctes) + f"\n"
        f"SELECT CAST(d AS INTEGER) AS dim, round(v, 6) AS component\n"
        f"FROM v{_PI_STEPS}"
    )


@register(
    "q200_power_iteration_pc1",
    sql=_pi_sql(),
    tags=("linalg", "pca", "power-iteration"),
)
def q200_power_iteration_pc1(spark, sf_dir):
    """Top principal direction of the embedding Gram matrix XᵀX by
    three unrolled power-iteration steps, computing A·v WITHOUT
    materializing A: per step, s_i = x_i·v (a 64-term quantized-
    DECIMAL sum per row), then Av_d = Σ_i round(s_i·x_i[d], 12)
    (a 64-group aggregate), then normalize. The covariance never
    exists as data — only v (64 numbers, broadcast) and per-partition
    partial sums move, which is what keeps the step at O(n·d) compute
    and O(partitions·d) shuffle for 10⁹ vectors. Every float op is a
    single IEEE op quantized before every cross-row sum, so the
    eigenvector hash-matches the chained-CTE oracle exactly."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("xv")
    )
    dims = spark.range(1, _DIM + 1).select(F.col("id").cast("int").alias("d"))
    v = dims.select("d", F.lit(0.125).alias("v"))
    for _ in range(_PI_STEPS):
        # s_i = x_i · v as an exact-DECIMAL sum of quantized products
        sx = (
            e.crossJoin(F.broadcast(v))
            .select(
                "vec_id",
                "xv",
                F.round(
                    F.element_at("xv", F.col("d")) * F.col("v"), 12
                ).cast("decimal(24,12)").alias("term"),
            )
            .groupBy("vec_id", "xv")
            .agg(F.sum("term").alias("sdec"))
        )
        # Av_d = Σ_i round(s_i · x_i[d], 12)
        av = (
            sx.crossJoin(F.broadcast(dims))
            .select(
                "d",
                F.round(
                    F.col("sdec").cast("double")
                    * F.element_at("xv", F.col("d")),
                    12,
                ).cast("decimal(24,12)").alias("term"),
            )
            .groupBy("d")
            .agg(F.sum("term").alias("av"))
        )
        nrm = av.agg(
            F.sqrt(
                F.sum(
                    F.round(
                        F.col("av").cast("double")
                        * F.col("av").cast("double"),
                        12,
                    ).cast("decimal(24,12)")
                ).cast("double")
            ).alias("nrm")
        )
        v = av.crossJoin(F.broadcast(nrm)).select(
            "d",
            F.round(F.col("av").cast("double") / F.col("nrm"), 12).alias("v"),
        )
    return v.select(
        F.col("d").cast("int").alias("dim"),
        F.round("v", 6).alias("component"),
    )
