"""Statistical evaluation batch: corpus law fitting, classifier
confusion, distribution testing, and a deterministic bootstrap.

  - q201: Zipf's-law fit of the token frequency distribution —
    log-log OLS slope over the top-1000 ranks, the standard corpus
    sanity check (natural text ≈ −1; synthetic/templated corpora
    flatten).
  - q202: confusion matrix of the naive-Bayes classifier (q186) with
    row-normalized rates — completes the model-eval trio
    (predictions q186, calibration q199, confusion q202).
  - q203: Kolmogorov–Smirnov statistic of event values against the
    uniform distribution on [min, max] per event type — the
    distribution-drift test over an ECDF window.
  - q204: bootstrap confidence interval for mean daily revenue using
    HASH-BASED resampling: resample indices come from md5(b, i) mod n
    instead of an RNG, so the whole bootstrap — resample means and
    the percentile CI — is deterministic and hash-checkable. The
    resample is a join, not a loop.

Scale notes (100 TB):
  - q201 reduces the corpus to (token, freq) then takes the top-1000
    ranks (TakeOrdered); the OLS runs on 1000 rows.
  - q202/q203 run on grids the model/agg already produces (per-doc
    scores; per-type sorted values — the ECDF sort is the one real
    cost, rangepartition-able like any global sort).
  - q204's resample join fans out B×n rows where n is the DAY count
    (tiny), never the raw fact table: the fact scan reduces to the
    daily grid first, bootstrap happens on the reduced series.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import register
from rc_rag_spark.queries.linkage import _NB_CTES, nb_posteriors
from rc_rag_spark.sources import table


# --------------------------------------------------------------------------
# q201 — Zipf's-law log-log OLS fit over token ranks


@register(
    "q201_zipf_fit",
    sql="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t
                 FROM documents),
    freq AS (SELECT t, COUNT(*) AS f FROM tok WHERE t <> '' GROUP BY t),
    ranked AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, t) AS rk
               FROM freq),
    top AS (SELECT rk, f FROM ranked WHERE rk <= 1000),
    xy AS (SELECT CAST(round(ln(rk), 12) AS DECIMAL(16,12)) AS x,
                  CAST(round(ln(f), 12) AS DECIMAL(16,12)) AS y
           FROM top),
    m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM xy)
    SELECT CAST(n AS BIGINT) AS n_ranks,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
               AS slope,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept
    FROM m
    """,
    tags=("textstats", "zipf", "ols"),
)
def q201_zipf_fit(spark, sf_dir):
    """Zipf's-law fit: OLS slope/intercept of ln(freq) on ln(rank)
    over the top-1000 token ranks. ln terms are quantized to
    DECIMAL(16,12) so Σx/Σy/Σxy/Σx² are exact; the sums are cast to
    DOUBLE before the closed-form OLS combination (q197's rule — the
    cross products would blow the 38-digit DECIMAL cap). The corpus
    reduces to (token, freq), then a top-1000 rank window; the fit
    itself touches 1000 rows. Natural corpora slope ≈ −1."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("t")).where(
        F.col("t") != ""
    )
    freq = tok.groupBy("t").agg(F.count("*").alias("f"))
    ranked = freq.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), F.col("t")))
        .alias("rk"),
    ).where(F.col("rk") <= 1000)
    xy = ranked.select(
        F.round(F.log("rk"), 12).cast("decimal(16,12)").alias("x"),
        F.round(F.log("f"), 12).cast("decimal(16,12)").alias("y"),
    )
    m = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return m.select(
        F.col("n").cast("bigint").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / nd, 6).alias("intercept"),
    )


# --------------------------------------------------------------------------
# q202 — naive-Bayes confusion matrix


@register(
    "q202_nb_confusion",
    sql=f"""
    WITH {_NB_CTES},
    r AS (SELECT doc_id, lang_true, lang AS lang_pred,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY post DESC, lang) AS rk
          FROM wp),
    pred AS (SELECT lang_true, lang_pred FROM r WHERE rk = 1),
    cm AS (SELECT lang_true, lang_pred, COUNT(*) AS n
           FROM pred GROUP BY 1, 2),
    rt AS (SELECT lang_true, SUM(n) AS row_n FROM cm GROUP BY 1)
    SELECT c.lang_true, c.lang_pred,
           CAST(c.n AS BIGINT) AS n,
           round(c.n / CAST(r.row_n AS DOUBLE), 9) AS rate
    FROM cm c JOIN rt r ON r.lang_true = c.lang_true
    """,
    tags=("ml", "confusion-matrix", "naive-bayes"),
)
def q202_nb_confusion(spark, sf_dir):
    """Confusion matrix for the q186 naive-Bayes classifier:
    (true, predicted) counts with row-normalized rates — the third
    leg of the model-eval surface (predictions q186, calibration
    q199). Reuses the shared posterior stage; the only additional
    work is one argmax window and two grouped counts over the
    per-doc prediction grid."""
    wp = nb_posteriors(spark, sf_dir)
    rk = Window.partitionBy("doc_id").orderBy(
        F.col("post").desc(), F.col("lang")
    )
    pred = (
        wp.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select("lang_true", F.col("lang").alias("lang_pred"))
    )
    cm = pred.groupBy("lang_true", "lang_pred").agg(
        F.count("*").alias("n")
    )
    rt = cm.groupBy("lang_true").agg(F.sum("n").alias("row_n"))
    return cm.join(F.broadcast(rt), "lang_true").select(
        "lang_true",
        "lang_pred",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("row_n").cast("double"), 9).alias("rate"),
    )


# --------------------------------------------------------------------------
# q203 — Kolmogorov–Smirnov uniformity statistic per event type


@register(
    "q203_ks_uniformity",
    sql="""
    WITH ev AS (SELECT event_id, event_type, value
                FROM events WHERE value IS NOT NULL),
    b AS (SELECT event_type, MIN(value) AS lo, MAX(value) AS hi,
                 COUNT(*) AS n
          FROM ev GROUP BY 1),
    r AS (SELECT e.event_type, e.value, b.lo, b.hi, b.n,
                 ROW_NUMBER() OVER (PARTITION BY e.event_type
                                    ORDER BY e.value, e.event_id) AS i
          FROM ev e JOIN b ON b.event_type = e.event_type),
    d AS (SELECT event_type, n,
                 CAST(round(greatest(
                     abs(i / CAST(n AS DOUBLE)
                         - CASE WHEN hi = lo THEN 1.0
                                ELSE (value - lo) / (hi - lo) END),
                     abs((i - 1) / CAST(n AS DOUBLE)
                         - CASE WHEN hi = lo THEN 1.0
                                ELSE (value - lo) / (hi - lo) END)), 12)
                      AS DECIMAL(16,12)) AS dev
          FROM r)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(CAST(MAX(dev) AS DOUBLE), 9) AS ks_stat
    FROM d GROUP BY event_type, n
    """,
    tags=("stats", "ks-test", "drift"),
)
def q203_ks_uniformity(spark, sf_dir):
    """Kolmogorov–Smirnov distance between each event type's value
    distribution and the uniform distribution on its own [min, max] —
    the drift test run when a feed's values stop looking like the
    reference shape. ECDF comes from one per-type sort window; both
    one-sided deviations are single IEEE chains quantized to DECIMAL
    before the exact MAX, so the statistic hash-matches. The sort is
    the only real cost — range-partitionable like any global sort.
    NULL values are dropped first: they carry no ECDF position, and
    an ordering window over a nullable column would split on engine
    null-ordering defaults (Spark NULLS FIRST vs DuckDB NULLS LAST)."""
    e = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = e.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("*").alias("n"),
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = e.join(F.broadcast(b), "event_type").withColumn(
        "i", F.row_number().over(w)
    )
    # hi == lo (a single-valued type) is a point mass: F(v) = 1.
    # Unguarded 0/0 would be NaN in Spark but NULL in DuckDB — a
    # parity break (and an ANSI-mode crash at the DECIMAL cast).
    fcdf = F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
        (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    )
    dev = F.greatest(
        F.abs(F.col("i") / F.col("n").cast("double") - fcdf),
        F.abs((F.col("i") - 1) / F.col("n").cast("double") - fcdf),
    )
    d = r.select(
        "event_type",
        "n",
        F.round(dev, 12).cast("decimal(16,12)").alias("dev"),
    )
    return d.groupBy("event_type", "n").agg(
        F.round(F.max("dev").cast("double"), 9).alias("ks_stat")
    ).select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        "ks_stat",
    )


# --------------------------------------------------------------------------
# q204 — deterministic hash-based bootstrap CI for mean daily revenue


_BOOT_B = 200


@register(
    "q204_bootstrap_ci",
    sql=f"""
    WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
                          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                   FROM orders GROUP BY 1),
    idx AS (SELECT day, rev,
                   ROW_NUMBER() OVER (ORDER BY day) AS i,
                   COUNT(*) OVER () AS n
            FROM daily),
    grid AS (SELECT b.b, s.i
             FROM generate_series(1, {_BOOT_B}) AS b(b),
                  (SELECT i, n FROM idx) AS s),
    draw AS (SELECT g.b,
                    CAST(('0x' || substr(md5(CAST(g.b AS VARCHAR) || '_'
                                             || CAST(g.i AS VARCHAR)),
                                         1, 15)) AS BIGINT)
                        % (SELECT MAX(n) FROM idx) + 1 AS j
             FROM grid g),
    means AS (SELECT d.b,
                     CAST(SUM(i2.rev) AS DOUBLE) / COUNT(*) AS m
              FROM draw d JOIN idx i2 ON i2.i = d.j
              GROUP BY d.b),
    pt AS (SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS point FROM daily)
    SELECT CAST({_BOOT_B} AS INTEGER) AS n_resamples,
           round(point, 9) AS point_estimate,
           round(quantile_cont(m, 0.025), 9) AS ci_lo,
           round(quantile_cont(m, 0.975), 9) AS ci_hi
    FROM means, pt
    GROUP BY point
    """,
    tags=("stats", "bootstrap", "deterministic"),
)
def q204_bootstrap_ci(spark, sf_dir):
    """95 % bootstrap confidence interval for mean daily revenue with
    HASH-BASED resampling: resample b draws index
    j = md5(b, i) mod n + 1 — a pure function of (b, i), so the
    entire bootstrap (200 resample means and the percentile CI) is
    deterministic and hash-checked against SQL, something an
    RNG-based bootstrap cannot offer. The resample is expressed as a
    generate-grid → hash → join, not a driver loop; the fact table
    reduces to the daily grid before any resampling, so the fan-out
    is B×days regardless of raw scale. Exact `percentile` matches
    DuckDB `quantile_cont` bit-wise (the q29-proven pairing)."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    idx = daily.select(
        "rev",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    nrow = idx.agg(F.max("n").alias("n"))
    bs = spark.range(1, _BOOT_B + 1).select(F.col("id").alias("b"))
    grid = bs.crossJoin(idx.select("i"))
    j = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("b").cast("string"),
                        F.lit("_"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.col("n")
        + 1
    )
    draw = grid.crossJoin(F.broadcast(nrow)).select("b", j.alias("j"))
    means = (
        draw.join(idx.select(F.col("i").alias("j"), "rev"), "j")
        .groupBy("b")
        .agg((F.sum("rev").cast("double") / F.count("*")).alias("m"))
    )
    pt = daily.agg(
        (F.sum("rev").cast("double") / F.count("*")).alias("point")
    )
    return means.crossJoin(F.broadcast(pt)).groupBy("point").agg(
        F.lit(_BOOT_B).cast("int").alias("n_resamples"),
        F.round(F.first("point"), 9).alias("point_estimate"),
        F.round(F.expr("percentile(m, 0.025)"), 9).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975)"), 9).alias("ci_hi"),
    ).drop("point")


@register(
    "q240_psi_drift",
    sql="""
    WITH binned AS (
        SELECT source,
               CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS epoch,
               least(CAST(n_chars // 200 AS INTEGER), 9) AS bin
        FROM documents),
    cells AS (
        SELECT source, epoch, bin, COUNT(*) AS n
        FROM binned GROUP BY source, epoch, bin),
    grid AS (
        SELECT s.source, b.bin,
               coalesce(a.n, 0) AS na, coalesce(bb.n, 0) AS nb
        FROM (SELECT DISTINCT source FROM binned) s
        CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) b
        LEFT JOIN cells a  ON a.source = s.source AND a.bin = b.bin
                           AND a.epoch = 'a'
        LEFT JOIN cells bb ON bb.source = s.source AND bb.bin = b.bin
                           AND bb.epoch = 'b'),
    tot AS (
        SELECT source,
               SUM(na) AS ta, SUM(nb) AS tb,
               COUNT(*) AS nbins
        FROM grid GROUP BY source),
    props AS (
        SELECT g.source, g.bin,
               (CAST(g.na AS DOUBLE) + 0.5)
                   / (CAST(t.ta AS DOUBLE) + 0.5 * t.nbins) AS pa,
               (CAST(g.nb AS DOUBLE) + 0.5)
                   / (CAST(t.tb AS DOUBLE) + 0.5 * t.nbins) AS pb
        FROM grid g JOIN tot t ON t.source = g.source)
    SELECT source,
           round(SUM((pa - pb) * ln(pa / pb)), 6) AS psi,
           CAST(SUM(CASE WHEN (pa - pb) * ln(pa / pb) > 0.01 THEN 1
                         ELSE 0 END) AS INTEGER) AS n_hot_bins
    FROM props
    GROUP BY source
    """,
    tags=("stats", "drift", "quality"),
)
def q240_psi_drift(spark, sf_dir):
    """Population Stability Index per source — the standard
    data-drift monitor a training pipeline runs between ingestion
    epochs (here: even vs odd doc_id as epochs A/B, n_chars binned
    into 10 fixed-width buckets): PSI = Σ_bins (p_A − p_B)·ln(p_A/p_B),
    with Laplace +0.5 smoothing so empty bins contribute finitely.
    The full (source × bin) grid is densified BEFORE the ratio (a
    missing bin in one epoch is exactly the drift signal — dropping
    it, the classic PSI bug, understates drift); n_hot_bins counts
    bins contributing > 0.01. Plan: one count shuffle over the fact,
    then a tiny (sources × 10) grid of arithmetic — the monitor costs
    one aggregation at any corpus size. Thresholds in practice:
    < 0.1 stable, 0.1–0.25 drifting, > 0.25 investigate."""
    d = table(spark, sf_dir, "documents")
    binned = d.select(
        "source",
        F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b").alias(
            "epoch"
        ),
        F.least(
            F.floor(F.col("n_chars") / 200).cast("int"), F.lit(9)
        ).alias("bin"),
    )
    cells = binned.groupBy("source", "epoch", "bin").agg(
        F.count("*").alias("n")
    )
    sources = binned.select("source").distinct()
    bins = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    grid = (
        sources.crossJoin(F.broadcast(bins))
        .join(
            cells.where(F.col("epoch") == "a").select(
                "source", "bin", F.col("n").alias("na")
            ),
            ["source", "bin"],
            "left",
        )
        .join(
            cells.where(F.col("epoch") == "b").select(
                "source", "bin", F.col("n").alias("nb")
            ),
            ["source", "bin"],
            "left",
        )
        .fillna(0, ["na", "nb"])
    )
    tot = grid.groupBy("source").agg(
        F.sum("na").alias("ta"),
        F.sum("nb").alias("tb"),
        F.count("*").alias("nbins"),
    )
    props = grid.join(tot, "source").select(
        "source",
        "bin",
        (
            (F.col("na").cast("double") + 0.5)
            / (F.col("ta").cast("double") + 0.5 * F.col("nbins"))
        ).alias("pa"),
        (
            (F.col("nb").cast("double") + 0.5)
            / (F.col("tb").cast("double") + 0.5 * F.col("nbins"))
        ).alias("pb"),
    )
    term = (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))
    return props.groupBy("source").agg(
        F.round(F.sum(term), 6).alias("psi"),
        F.sum((term > 0.01).cast("int")).cast("int").alias("n_hot_bins"),
    )
