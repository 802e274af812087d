"""Statistical time-series batch: survival analysis, change-point
detection, seasonal decomposition, concentration (Gini), and a
Benford first-digit audit.

These are the classic "analyst asks of the event log / order history"
operators a warehouse engine is expected to own. Every query is
DuckDB-hash-checked; determinism discipline follows queries/core.py:
counts stay exact integers; every float term is produced by a short,
explicitly-ordered chain of IEEE ops written identically on both
engines; cumulative/grouped float sums quantize each term to DECIMAL
before the order-independent exact SUM (the q153 entropy pattern).

Scale notes (100 TB):
  - q181/q182/q183 reduce the fact table to a per-key/per-day grid
    first (one partial-agg shuffle); every window after that runs on
    the tiny reduced grid, so window state never sees raw rows.
  - q184 shuffles once on custkey then once on nation — both standard
    hash-agg shapes; the per-nation sort inside the window is bounded
    by customers-per-nation.
  - q185 is a single scan + 9-row aggregate: partial map-side combine
    moves O(partitions · 9) rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table
from rc_rag_spark.checkpoints import ckpt as _ckpt, ckpt_lazy as _ckpt_lazy


# --------------------------------------------------------------------------
# q181 — Kaplan-Meier survival of customer reorder gaps


@register(
    "q181_survival_km",
    sql="""
    WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d
               FROM orders),
    mx AS (SELECT MAX(d) AS mxd FROM o),
    seq AS (SELECT o_custkey, d,
                   LEAD(d) OVER (PARTITION BY o_custkey
                                 ORDER BY d, o_orderkey) AS nd
            FROM o),
    dur AS (SELECT CASE WHEN nd IS NULL
                        THEN date_diff('day', d, (SELECT mxd FROM mx))
                        ELSE date_diff('day', d, nd) END AS t,
                   CASE WHEN nd IS NULL THEN 0 ELSE 1 END AS ev
            FROM seq),
    grid AS (SELECT t, SUM(ev) AS d_events, COUNT(*) AS n_all
             FROM dur GROUP BY t),
    risk AS (SELECT t, d_events, n_all,
                    (SELECT COUNT(*) FROM dur)
                      - (SUM(n_all) OVER (ORDER BY t) - n_all) AS n_risk
             FROM grid),
    km AS (SELECT t, d_events, n_risk,
                  SUM(CAST(CASE WHEN d_events > 0 AND d_events < n_risk
                                THEN round(ln(1 - d_events
                                              / CAST(n_risk AS DOUBLE)), 12)
                                ELSE 0 END AS DECIMAL(24,12)))
                      OVER (ORDER BY t) AS cum
           FROM risk)
    SELECT CAST(t AS INTEGER) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_events AS BIGINT) AS d_events,
           CASE WHEN d_events >= n_risk THEN 0.0
                ELSE round(exp(CAST(cum AS DOUBLE)), 9) END AS survival
    FROM km WHERE d_events > 0
    """,
    tags=("timeseries", "survival", "km"),
)
def q181_survival_km(spark, sf_dir):
    """Kaplan-Meier estimator over customer reorder gaps: each
    consecutive-order gap is an observed event, the tail from a
    customer's last order to the corpus max date is right-censored.
    S(t) = prod_{u<=t}(1 - d_u/n_u) computed as exp of a cumulative
    exact-DECIMAL sum of quantized ln factors, so the running product
    cannot drift between engines. The duration table is one window
    over orders partitioned by customer; the KM grid is tiny
    (distinct gap lengths), so the final ordered cumsum is a
    single-partition window over O(distinct t) rows — the standard
    two-level reduce shape at any scale."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("d")
    )
    mx = o.agg(F.max("d").alias("mxd"))
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    seq = o.withColumn("nd", F.lead("d").over(w))
    dur = (
        seq.crossJoin(F.broadcast(mx))
        .select(
            F.when(F.col("nd").isNull(), F.datediff("mxd", "d"))
            .otherwise(F.datediff("nd", "d"))
            .alias("t"),
            F.when(F.col("nd").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("ev"),
        )
    ).transform(_ckpt_lazy)
    n_total = dur.agg(F.count("*").alias("n_total"))
    grid = dur.groupBy("t").agg(
        F.sum("ev").alias("d_events"), F.count("*").alias("n_all")
    )
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = grid.crossJoin(F.broadcast(n_total)).withColumn(
        "n_risk",
        F.col("n_total") - (F.sum("n_all").over(wt) - F.col("n_all")),
    )
    d_over_n = F.col("d_events") / F.col("n_risk").cast("double")
    term = F.when(
        (F.col("d_events") > 0) & (F.col("d_events") < F.col("n_risk")),
        F.round(F.log(F.lit(1) - d_over_n), 12),
    ).otherwise(F.lit(0.0))
    km = risk.withColumn(
        "cum", F.sum(term.cast("decimal(24,12)")).over(wt)
    )
    return km.where(F.col("d_events") > 0).select(
        F.col("t").cast("int").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d_events").cast("bigint").alias("d_events"),
        F.when(F.col("d_events") >= F.col("n_risk"), F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cum").cast("double")), 9))
        .alias("survival"),
    )


# --------------------------------------------------------------------------
# q182 — CUSUM change-point detection on daily event counts


@register(
    "q182_cusum_changepoint",
    sql="""
    WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
                          COUNT(*) AS n
                   FROM events GROUP BY 1, 2),
    m AS (SELECT event_type,
                 CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu,
                 COUNT(*) AS n_days
          FROM daily GROUP BY 1),
    c AS (SELECT d.event_type, d.day, d.n, m.n_days,
                 SUM(CAST(round(d.n - m.mu, 12) AS DECIMAL(24,12)))
                     OVER (PARTITION BY d.event_type ORDER BY d.day)
                     AS cusum
          FROM daily d JOIN m ON m.event_type = d.event_type),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY abs(cusum) DESC, day)
                    AS rk
          FROM c)
    SELECT event_type, day AS peak_day,
           CAST(n AS BIGINT) AS day_count,
           round(CAST(cusum AS DOUBLE), 9) AS cusum_peak,
           CAST(n_days AS BIGINT) AS n_days
    FROM r WHERE rk = 1
    """,
    tags=("timeseries", "changepoint", "cusum"),
)
def q182_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point scan per event type: cumulative sum of
    (daily count − type mean), peak |CUSUM| day is the most likely
    level-shift point. Deviations are quantized to DECIMAL before the
    running sum and the argmax orders on the exact DECIMAL |cusum|
    (no float comparisons), tie-broken by earliest day. The raw scan
    reduces to a (type, day) grid first; every window after that is
    per-type over ~30 rows."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    m = daily.groupBy("event_type").agg(
        (F.sum("n").cast("double") / F.count("*")).alias("mu"),
        F.count("*").alias("n_days"),
    )
    wd = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = daily.join(F.broadcast(m), "event_type").withColumn(
        "cusum",
        F.sum(
            F.round(F.col("n") - F.col("mu"), 12).cast("decimal(24,12)")
        ).over(wd),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("day")
    )
    return (
        c.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("peak_day"),
            F.col("n").cast("bigint").alias("day_count"),
            F.round(F.col("cusum").cast("double"), 9).alias("cusum_peak"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
    )


# --------------------------------------------------------------------------
# q183 — STL-lite seasonal decomposition of the daily value series


@register(
    "q183_seasonal_decompose",
    sql="""
    WITH daily AS (SELECT date_trunc('day', ts) AS day,
                          SUM(CAST(value AS DECIMAL(18,6))) AS total_dec
                   FROM events GROUP BY 1),
    tr AS (SELECT day, total_dec,
                  CAST(SUM(total_dec) OVER w AS DOUBLE)
                    / (COUNT(*) OVER w) AS trend
           FROM daily
           WINDOW w AS (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    res AS (SELECT day, total_dec, trend,
                   dayofweek(day) + 1 AS dow,
                   CAST(total_dec AS DOUBLE) - trend AS resid
            FROM tr),
    sea AS (SELECT dow,
                   CAST(SUM(CAST(round(resid, 12) AS DECIMAL(24,12)))
                        AS DOUBLE) / COUNT(*) AS seasonal
            FROM res GROUP BY dow)
    SELECT r.day, CAST(r.dow AS INTEGER) AS dow,
           round(CAST(r.total_dec AS DOUBLE), 9) AS total,
           round(r.trend, 9) AS trend,
           round(s.seasonal, 9) AS seasonal,
           round(r.resid - s.seasonal, 9) AS remainder
    FROM res r JOIN sea s ON s.dow = r.dow
    """,
    tags=("timeseries", "seasonal", "decomposition"),
)
def q183_seasonal_decompose(spark, sf_dir):
    """Additive STL-lite decomposition of the daily event-value
    series: trend = centered 7-ROW moving average over the observed
    daily grid (rowsBetween(-3, 3) on the one-row-per-day aggregate;
    days absent from the data are NOT densified, so on a sparse grid
    the window spans more than 7 calendar days — exact DECIMAL window
    sum / count), seasonal = mean residual per day-of-week
    (quantized-DECIMAL mean), remainder = (total − trend) − seasonal
    with that exact operation order on both engines. Spark dayofweek
    is 1-based Sunday=1; the oracle shifts DuckDB's 0-based dayofweek
    to match. The raw scan reduces to one row per day before any
    window runs."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total_dec")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.withColumn(
        "trend",
        F.sum("total_dec").over(w).cast("double") / F.count("*").over(w),
    )
    res = tr.select(
        "day",
        "total_dec",
        "trend",
        F.dayofweek("day").alias("dow"),
        (F.col("total_dec").cast("double") - F.col("trend")).alias("resid"),
    )
    sea = res.groupBy("dow").agg(
        (
            F.sum(F.round(F.col("resid"), 12).cast("decimal(24,12)")).cast(
                "double"
            )
            / F.count("*")
        ).alias("seasonal")
    )
    return res.join(F.broadcast(sea), "dow").select(
        "day",
        F.col("dow").cast("int").alias("dow"),
        F.round(F.col("total_dec").cast("double"), 9).alias("total"),
        F.round("trend", 9).alias("trend"),
        F.round("seasonal", 9).alias("seasonal"),
        F.round(F.col("resid") - F.col("seasonal"), 9).alias("remainder"),
    )


# --------------------------------------------------------------------------
# q184 — Gini concentration of customer spend per nation


@register(
    "q184_gini_concentration",
    sql="""
    WITH spend AS (SELECT o_custkey,
                          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
                   FROM orders GROUP BY 1),
    j AS (SELECT n.n_name, c.c_custkey, sp.s
          FROM spend sp
          JOIN customer c ON c.c_custkey = sp.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey),
    r AS (SELECT n_name, s,
                 ROW_NUMBER() OVER (PARTITION BY n_name
                                    ORDER BY s, c_custkey) AS i,
                 COUNT(*) OVER (PARTITION BY n_name) AS n
          FROM j)
    SELECT n_name, CAST(MAX(n) AS BIGINT) AS n_customers,
           round(CAST(2 * SUM(i * s) - (MAX(n) + 1) * SUM(s) AS DOUBLE)
                 / CAST(MAX(n) * SUM(s) AS DOUBLE), 9) AS gini
    FROM r GROUP BY n_name
    """,
    tags=("analytics", "gini", "concentration"),
)
def q184_gini_concentration(spark, sf_dir):
    """Gini coefficient of customer order spend within each nation —
    the revenue-concentration diagnostic. Uses the sorted-rank
    identity G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) with ranks
    assigned by (spend, custkey): the whole numerator/denominator is
    exact DECIMAL arithmetic, one final double division. Shuffles:
    custkey agg, then nation window — both standard; the per-nation
    sort is bounded by customers-per-nation (salt or pre-bucket if a
    single nation dominated)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    )
    j = (
        spend.join(c, spend.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey", "s")
    )
    wp = Window.partitionBy("n_name")
    r = j.select(
        "n_name",
        "s",
        F.row_number().over(wp.orderBy("s", "c_custkey")).alias("i"),
        F.count("*").over(wp).alias("n"),
    )
    num = 2 * F.sum(F.col("i") * F.col("s")) - (F.max("n") + 1) * F.sum("s")
    den = F.max("n") * F.sum("s")
    return r.groupBy("n_name").agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(num.cast("double") / den.cast("double"), 9).alias("gini"),
    )


# --------------------------------------------------------------------------
# q185 — Benford first-digit audit of order totals


@register(
    "q185_benford_audit",
    sql="""
    WITH t AS (SELECT substr(CAST(CAST(CAST(o_totalprice
                                  AS DECIMAL(18,2)) * 100 AS BIGINT)
                             AS VARCHAR), 1, 1) AS d
               FROM orders WHERE o_totalprice > 0),
    c AS (SELECT CAST(d AS INTEGER) AS digit, COUNT(*) AS n
          FROM t GROUP BY 1),
    tot AS (SELECT SUM(n) AS nt FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n,
           round(n / CAST(nt AS DOUBLE), 9) AS obs_freq,
           round(log10(1 + 1.0 / digit), 9) AS exp_freq,
           round(((n - nt * log10(1 + 1.0 / digit))
                  * (n - nt * log10(1 + 1.0 / digit)))
                 / (nt * log10(1 + 1.0 / digit)), 6) AS chi2_term
    FROM c, tot
    """,
    tags=("profiling", "benford", "audit"),
)
def q185_benford_audit(spark, sf_dir):
    """Benford's-law first-significant-digit audit of o_totalprice:
    per-digit observed frequency vs log10(1+1/d) expectation plus the
    chi-square contribution, the classic fabricated-data screen. The
    first digit is extracted WITHOUT floating log10: prices are exact
    at 2 decimals, so scale to integer cents (DECIMAL x 100 -> BIGINT,
    exact) and take the first character of the decimal string — both
    engines agree bit-for-bit, where floor(log10(x)) can flip by 1 ulp
    at exact powers of 10 (java.lang.Math vs libm) and emit a bogus
    digit-10 bucket. chi2 rounds at 1e-6 to absorb last-bit noise in
    the longer float chain. Single scan, 9-group aggregate — map-side
    combine makes the shuffle O(partitions·9)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * F.lit(100)
    ).cast("bigint")
    d = F.substring(cents.cast("string"), 1, 1)
    c = o.select(d.cast("int").alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    tot = c.agg(F.sum("n").alias("nt"))
    e = F.log10(F.lit(1) + F.lit(1.0) / F.col("digit"))
    dev = F.col("n") - F.col("nt") * e
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("nt").cast("double"), 9).alias("obs_freq"),
        F.round(e, 9).alias("exp_freq"),
        F.round((dev * dev) / (F.col("nt") * e), 6).alias("chi2_term"),
    )


# --------------------------------------------------------------------------
# q211 — Holt double-exponential smoothing of the daily revenue series


_HOLT_ALPHA, _HOLT_BETA = 0.5, 0.3

# Ceiling for single-row sequential folds (collect_list -> F.aggregate):
# the folded series lives in ONE row, so its size is an executor-memory
# bound, not a parallelism bound. 100k state steps ~ 270 years of daily
# data — generous for any real reduce-then-fold series, tiny vs memory.
FOLD_SERIES_CEILING = 100_000


def guarded_series(s_col, ceiling: int = FOLD_SERIES_CEILING, what: str = "series"):
    """Cardinality guard for sequential folds: passes `s_col` through
    unchanged while the array is within `ceiling`, else raises inside
    the plan (no separate count job). Sequential F.aggregate folds are
    only honest on a cluster when the series is pre-reduced and small;
    if this fires, the upstream reduce is missing or too coarse —
    aggregate to a coarser grain (or window the recursion) instead of
    raising the ceiling."""
    check = F.assert_true(
        F.size(s_col) <= F.lit(ceiling),
        F.concat(
            F.lit(
                f"sequential-fold {what} exceeds ceiling {ceiling} "
                f"(got "
            ),
            F.size(s_col).cast("string"),
            F.lit(
                " elements): pre-reduce the series to a bounded grain "
                "before folding"
            ),
        ),
    )
    # assert_true yields NULL when the predicate holds, so this when()
    # returns the array itself — and evaluates the check first
    return F.when(check.isNull(), s_col)

# State quantizer: explicit floor-based round-half-up at 1e-6,
# written as the SAME IEEE op chain on both engines. round(_, 6)
# would NOT do: alpha = 0.5 puts every level update exactly on a
# rounding midpoint (half of an odd multiple of 1e-6), where Spark
# rounds HALF_UP but DuckDB's cast rounds HALF_EVEN — with an
# explicit floor(v*1e6 + 0.5)/1e6 both engines execute identical
# doubles ops and MUST agree, ties included.
_Q6_SQL = "floor(({v}) * 1000000 + 0.5) / 1000000"


def _q6(col):
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


@register(
    "q211_holt_linear_trend",
    sql=f"""
    WITH RECURSIVE daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS x
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
    idx AS (SELECT day, x,
                   ROW_NUMBER() OVER (ORDER BY day) AS i
            FROM daily),
    holt AS (
        SELECT i, day, x, x AS l, CAST(0.0 AS DOUBLE) AS b
        FROM idx WHERE i = 1
        UNION ALL
        SELECT s.i, s.day, s.x,
               {_Q6_SQL.format(v=f"{_HOLT_ALPHA} * s.x"
                                 f" + {1 - _HOLT_ALPHA} * (h.l + h.b)")}
                   AS l,
               {_Q6_SQL.format(v=f"{_HOLT_BETA}"
                                 f" * ({_Q6_SQL.format(v=f'{_HOLT_ALPHA} * s.x + {1 - _HOLT_ALPHA} * (h.l + h.b)')}"
                                 f" - h.l)"
                                 f" + {1 - _HOLT_BETA} * h.b")}
                   AS b
        FROM holt h JOIN idx s ON s.i = h.i + 1)
    SELECT day, round(x, 6) AS x, round(l, 6) AS level,
           round(b, 6) AS trend,
           {_Q6_SQL.format(v="l + b")} AS forecast_next
    FROM holt
    """,
    tags=("timeseries", "holt", "smoothing"),
)
def q211_holt_linear_trend(spark, sf_dir):
    """Holt double-exponential smoothing of the daily revenue series
    (level+trend state, alpha=0.5 / beta=0.3, one-step-ahead
    forecast). The recursion that windows cannot express runs as ONE
    sequential fold (F.aggregate) over the collected day-ordered
    series with a struct accumulator carrying the state history; the
    oracle states the same recurrence as a recursive CTE. State is
    quantized every step with an explicit floor-based half-up round
    at 1e-6 — the identical IEEE chain on both engines, immune to
    the HALF_UP-vs-HALF_EVEN tie split that built-in round()/decimal
    casts have exactly at alpha=0.5's structural midpoints. Scale
    shape: the fact scan reduces to the daily grid FIRST — the fold
    touches only the bounded series (365 rows per year), which is the
    honest way to run bounded recursions (EWMA / Holt / Kalman-style
    state) on a cluster: reduce, then fold the small series, never
    iterate over raw rows. The series is wrapped in guarded_series(),
    which raises in-plan past FOLD_SERIES_CEILING elements instead of
    letting a mis-reduced series balloon the single state row."""
    o = table(spark, sf_dir, "orders")
    # an order with no date sits outside any daily series (shared
    # event-time contract; a NULL-day group would otherwise enter the
    # fold at a NULLS-FIRST/LAST-dependent position)
    daily = (
        o.where(F.col("o_orderdate").isNotNull())
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("x")
        )
    )
    series = daily.agg(
        guarded_series(
            F.array_sort(
                F.collect_list(F.struct(F.col("day"), F.col("x")))
            ),
            what="daily revenue series",
        ).alias("s")
    )
    a, a1 = _HOLT_ALPHA, 1 - _HOLT_ALPHA
    bt, bt1 = _HOLT_BETA, 1 - _HOLT_BETA

    def _lnew(acc, e):
        return _q6(a * e["x"] + a1 * (acc["l"] + acc["b"]))

    def _bnew(acc, e):
        return _q6(bt * (_lnew(acc, e) - acc["l"]) + bt1 * acc["b"])

    fold = F.aggregate(
        F.col("s"),
        F.expr(
            "struct(CAST(NULL AS DOUBLE) AS l, CAST(NULL AS DOUBLE) AS b, "
            "CAST(array() AS ARRAY<STRUCT<day: TIMESTAMP, x: DOUBLE, "
            "l: DOUBLE, b: DOUBLE>>) AS hist)"
        ),
        lambda acc, e: F.when(
            acc["l"].isNull(),
            F.struct(
                e["x"].alias("l"),
                F.lit(0.0).alias("b"),
                F.array(
                    F.struct(
                        e["day"].alias("day"),
                        e["x"].alias("x"),
                        e["x"].alias("l"),
                        F.lit(0.0).alias("b"),
                    )
                ).alias("hist"),
            ),
        ).otherwise(
            F.struct(
                _lnew(acc, e).alias("l"),
                _bnew(acc, e).alias("b"),
                F.concat(
                    acc["hist"],
                    F.array(
                        F.struct(
                            e["day"].alias("day"),
                            e["x"].alias("x"),
                            _lnew(acc, e).alias("l"),
                            _bnew(acc, e).alias("b"),
                        )
                    ),
                ).alias("hist"),
            )
        ),
    )
    return (
        series.select(F.explode(fold["hist"]).alias("h"))
        .select(
            F.col("h.day").alias("day"),
            F.round("h.x", 6).alias("x"),
            F.round("h.l", 6).alias("level"),
            F.round("h.b", 6).alias("trend"),
            _q6(F.col("h.l") + F.col("h.b")).alias("forecast_next"),
        )
    )
