"""Dataset-governance + training-data-selection batch (round 9).

  - q261: snapshot DIFF between two dataset versions — the operator a
    data platform runs between q259 manifests when the corpus hash
    changed: per-source added/removed/changed/unchanged counts from a
    full-outer join on the document key with content hashing.
  - q262: Gopher-style quality-rule filter (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", table A1) — the five
    rules that apply to single-line documents, integer-exact.
  - q263: Bradley-Terry strength fit over pairwise comparisons mined
    from co-occurrence (suppliers racing inside the same order),
    aggregated to nation level and solved by the MM update in
    fixed-point integer arithmetic — bit-stable across engines.
  - q264: DSIR-style importance selection (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"):
    hashed-bigram log-likelihood ratio between a target slice and
    the raw corpus, quantized to integer micro-nats.
  - q266: bucketed co-located join — both sides persisted with
    ``bucketBy`` on the join key so the join runs with NO exchange
    on either side (storage-partitioned join; the layout decision
    that amortizes one shuffle across every future join at 100 TB).
  - q269: dynamic partition pruning — a year-partitioned fact scan
    whose partition filter arrives at RUNTIME from the joined dim's
    values (Catalyst's dynamicpruning subquery), so unselected
    partition directories are never opened.
  - q270: fill-in-the-middle (FIM) transform — PSM/SPM re-serialization
    at deterministic third-points (Bavarian et al. 2022), pure
    codegen'd string arithmetic.
  - q271: vocabulary coverage / OOV-rate audit per source against a
    top-k global vocab (broadcast back; the corpus never re-shuffles).
  - q272: boilerplate-prefix mining — 4-word-prefix grouping, the
    cheap template detector that runs before any pairwise dedup.

Scale notes (100 TB):
  - q261 is one full-outer hash join on the primary key with
    map-side-combined conditional counts — the same cost as any
    key-diff; at petabyte scale you run it per partition-date and
    union the reports.
  - q262/q264 are single-scan, shuffle-free per-document expression
    pipelines followed by one partial-agg shuffle (q262) or one
    1024-row bucket-stat broadcast (q264's lambda table is tiny by
    construction and joins back broadcast).
  - q263's pair mining self-joins the fact table on its clustering
    key (order) — per-group fan-out is bounded by lines-per-order
    (<= 7 in TPC-H), never a cross product; the MM iterations then
    run on a |nations|^2 aggregate (broadcast-sized).
  - q266 writes both sides bucketed; every later join/groupBy on the
    bucket key is exchange-free. The 8-bucket local fixture stands in
    for the 4096-bucket layout a warehouse would pick.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table, wide_table
from rc_rag_spark.checkpoints import ckpt as _ckpt


# --------------------------------------------------------------------------
# q261 — dataset snapshot diff (manifest follow-up: WHAT changed)

# Deterministic simulated "next version" of documents, identical in
# both engines: drop ids % 97 == 0, revise text of ids % 89 == 0,
# add a fresh doc (id + 10,000,000) for ids % 101 == 0.
_DIFF_B_SQL = """
        SELECT doc_id,
               source,
               md5(CASE WHEN doc_id % 89 = 0
                        THEN text || ' [rev2]' ELSE text END
                   || '|' || lang || '|' || source) AS h
        FROM documents WHERE doc_id % 97 != 0
        UNION ALL
        SELECT doc_id + 10000000 AS doc_id,
               source,
               md5(text || '|' || lang || '|' || source) AS h
        FROM documents WHERE doc_id % 101 = 0"""


@register(
    "q261_snapshot_diff",
    sql=f"""
    WITH a AS (
        SELECT doc_id, source,
               md5(text || '|' || lang || '|' || source) AS h
        FROM documents),
    b AS ({_DIFF_B_SQL}),
    j AS (
        SELECT COALESCE(a.source, b.source) AS source,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'removed'
                    WHEN a.h != b.h THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
    SELECT source,
           CAST(COUNT(CASE WHEN status = 'added' THEN 1 END)
                AS BIGINT) AS n_added,
           CAST(COUNT(CASE WHEN status = 'removed' THEN 1 END)
                AS BIGINT) AS n_removed,
           CAST(COUNT(CASE WHEN status = 'changed' THEN 1 END)
                AS BIGINT) AS n_changed,
           CAST(COUNT(CASE WHEN status = 'unchanged' THEN 1 END)
                AS BIGINT) AS n_unchanged
    FROM j GROUP BY source
    """,
    tags=("governance", "versioning", "diff"),
)
def q261_snapshot_diff(spark, sf_dir):
    """Dataset snapshot DIFF — when two q259 manifests disagree, this
    is the operator that answers WHAT changed: a full-outer join of
    version A and version B on the document key, with a content hash
    deciding changed-vs-unchanged, folded to per-source
    added/removed/changed/unchanged counts. Version B is simulated
    deterministically (1/97 of ids deleted, 1/89 revised, 1/101
    cloned under a new id) so both engines diff the same pair of
    snapshots. Scale shape: one hash join on the primary key — the
    join both sides would already be bucketed on in a real lakehouse
    (q266) — then a map-side-combined conditional count; the report
    is |sources| rows. The content hash makes the diff text-content
    exact without ever shipping the text twice: 32 bytes per row
    cross the shuffle, not documents."""
    d = table(spark, sf_dir, "documents")

    def content_hash(text_col):
        return F.md5(
            F.concat_ws("|", text_col, F.col("lang"), F.col("source"))
        )

    a = d.select("doc_id", "source", content_hash(F.col("text")).alias("h"))
    revised = F.when(
        F.col("doc_id") % 89 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
    ).otherwise(F.col("text"))
    b = (
        d.where(F.col("doc_id") % 97 != 0)
        .select("doc_id", "source", content_hash(revised).alias("h"))
        .unionByName(
            d.where(F.col("doc_id") % 101 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                "source",
                content_hash(F.col("text")).alias("h"),
            )
        )
    )
    j = a.alias("a").join(
        b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.h") != F.col("b.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    j = j.select(
        F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
        status.alias("status"),
    )
    return j.groupBy("source").agg(
        *[
            F.count(F.when(F.col("status") == s, 1))
            .cast("bigint")
            .alias(f"n_{s}")
            for s in ("added", "removed", "changed", "unchanged")
        ]
    )


# --------------------------------------------------------------------------
# q262 — Gopher quality rules (Rae et al. 2021, appendix A1 subset)

_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


@register(
    "q262_gopher_quality_rules",
    sql=f"""
    WITH m AS (
        SELECT source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS nw,
               length(regexp_replace(trim(text), '\\s', '', 'g')) AS sumlen,
               length(trim(text))
                 - length(replace(trim(text), '#', '')) AS n_hash,
               (length(trim(text))
                 - length(replace(trim(text), '...', ''))) // 3 AS n_ell,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               x -> regexp_matches(x, '[A-Za-z]')))
                   AS n_alpha,
               {" + ".join(
                   f"(CASE WHEN ' ' || lower(trim(text)) || ' ' "
                   f"LIKE '% {w} %' THEN 1 ELSE 0 END)"
                   for w in _STOPWORDS
               )} AS n_stop
        FROM documents WHERE length(trim(text)) > 0)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN nw BETWEEN 50 AND 100000 THEN 1 END)
                AS BIGINT) AS pass_wordcount,
           CAST(COUNT(CASE WHEN 3 * nw <= sumlen AND sumlen <= 10 * nw
                           THEN 1 END) AS BIGINT) AS pass_meanlen,
           CAST(COUNT(CASE WHEN 10 * (n_hash + n_ell) <= nw THEN 1 END)
                AS BIGINT) AS pass_symbol,
           CAST(COUNT(CASE WHEN 5 * n_alpha >= 4 * nw THEN 1 END)
                AS BIGINT) AS pass_alpha,
           CAST(COUNT(CASE WHEN n_stop >= 2 THEN 1 END)
                AS BIGINT) AS pass_stopwords,
           CAST(COUNT(CASE WHEN nw BETWEEN 50 AND 100000
                            AND 3 * nw <= sumlen AND sumlen <= 10 * nw
                            AND 10 * (n_hash + n_ell) <= nw
                            AND 5 * n_alpha >= 4 * nw
                            AND n_stop >= 2 THEN 1 END)
                AS BIGINT) AS pass_all
    FROM m GROUP BY source
    """,
    tags=("curation", "quality", "gopher"),
)
def q262_gopher_quality_rules(spark, sf_dir):
    """Gopher quality-rule filter — the published rule set LLM data
    pipelines actually ship (Rae et al. 2021 table A1; reused by
    FineWeb/Dolma), restricted to the five rules meaningful for
    single-line documents: word count in [50, 100000], mean word
    length in [3, 10], symbol-to-word ratio ('#' or '...') <= 0.1,
    >= 80% of words containing an alphabetic character, and >= 2 of
    the 8 canonical stop words present. Every threshold is evaluated
    in INTEGER cross-multiplied form (3*nw <= sumlen, 5*alpha >=
    4*nw, 10*symbols <= nw) so no ratio ever touches a double and
    the engines can never disagree on a boundary document. Output is
    the per-source rule-pass audit — the report a curation run emits
    before dropping anything. Scale shape: one scan, all rules are
    codegen'd string/array expressions (split / regexp / filter
    lambda), one partial-agg shuffle on source; nothing is
    quadratic in document length."""
    d = table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    ws = F.split(t, r"\s+")
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    m = d.where(F.length(t) > 0).select(
        "source",
        F.size(ws).alias("nw"),
        F.length(F.regexp_replace(t, r"\s", "")).alias("sumlen"),
        (F.length(t) - F.length(F.replace(t, F.lit("#")))).alias("n_hash"),
        (
            (F.length(t) - F.length(F.replace(t, F.lit("..."))))
            / F.lit(3)
        ).cast("int").alias("n_ell"),
        F.size(
            F.filter(ws, lambda w: w.rlike("[A-Za-z]"))
        ).alias("n_alpha"),
        sum(
            F.when(padded.like(f"% {w} %"), 1).otherwise(0)
            for w in _STOPWORDS
        ).alias("n_stop"),
    )
    r_wc = F.col("nw").between(50, 100000)
    r_ml = (3 * F.col("nw") <= F.col("sumlen")) & (
        F.col("sumlen") <= 10 * F.col("nw")
    )
    r_sym = 10 * (F.col("n_hash") + F.col("n_ell")) <= F.col("nw")
    r_al = 5 * F.col("n_alpha") >= 4 * F.col("nw")
    r_st = F.col("n_stop") >= 2

    def n(cond, alias):
        return F.count(F.when(cond, 1)).cast("bigint").alias(alias)

    return m.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        n(r_wc, "pass_wordcount"),
        n(r_ml, "pass_meanlen"),
        n(r_sym, "pass_symbol"),
        n(r_al, "pass_alpha"),
        n(r_st, "pass_stopwords"),
        n(r_wc & r_ml & r_sym & r_al & r_st, "pass_all"),
    )


# --------------------------------------------------------------------------
# q263 — Bradley-Terry strength fit (fixed-point MM iterations)

_BT_SCALE = 1_000_000          # strengths live in micro-units
_BT_SC2 = _BT_SCALE * _BT_SCALE
_BT_ITERS = 3


def _bt_iteration_sql(k: int) -> str:
    """One MM update in integer arithmetic: D_i = sum_j n_ij*SC^2 //
    (s_i + s_j); s_i' = W_i*SC^2 // D_i.

    The two products run in 128-bit integers (HUGEINT here,
    DECIMAL(38,0) on the Spark side — identical values, both exact):
    the round-15 sf100 decade probe hit the BIGINT ceiling the
    docstring's headroom analysis predicted — wins*SC^2 ≈ 8.6e7*1e12
    ≈ 8.6e19 > 2^63 at just 1000x the bench SF. Quotients and
    strengths still fit BIGINT comfortably (s <= SC * state count)."""
    prev = f"s{k - 1}"
    return f"""
    t{k} AS (
        SELECT si.i AS i,
               SUM((CAST(sym.n AS HUGEINT) * {_BT_SC2})
                   // GREATEST(si.s + sj.s, 1)) AS d
        FROM sym
        JOIN {prev} si ON sym.i = si.i
        JOIN {prev} sj ON sym.j = sj.i
        GROUP BY si.i),
    s{k} AS (
        SELECT t.i,
               CAST((CAST(w.wins AS HUGEINT) * {_BT_SC2})
                    // GREATEST(t.d, 1) AS BIGINT) AS s
        FROM t{k} t JOIN w ON w.i = t.i)"""


@register(
    "q263_bradley_terry",
    sql=f"""
    WITH raw AS (
        SELECT CASE WHEN l1.l_shipdate < l2.l_shipdate
                    THEN n1.n_name ELSE n2.n_name END AS win_n,
               CASE WHEN l1.l_shipdate < l2.l_shipdate
                    THEN n2.n_name ELSE n1.n_name END AS lose_n
        FROM lineitem l1
        JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                         AND l1.l_suppkey < l2.l_suppkey
        JOIN supplier s1 ON l1.l_suppkey = s1.s_suppkey
        JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        JOIN nation n1 ON s1.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        WHERE l1.l_shipdate != l2.l_shipdate
          AND n1.n_name != n2.n_name),
    dir AS (SELECT win_n AS i, lose_n AS j, CAST(COUNT(*) AS BIGINT) AS n
            FROM raw GROUP BY 1, 2),
    sym AS (SELECT i, j, CAST(SUM(n) AS BIGINT) AS n FROM (
                SELECT i, j, n FROM dir
                UNION ALL
                SELECT j AS i, i AS j, n FROM dir)
            GROUP BY i, j),
    states AS (SELECT DISTINCT i FROM sym),
    w AS (SELECT st.i, CAST(COALESCE(SUM(d.n), 0) AS BIGINT) AS wins
          FROM states st LEFT JOIN dir d ON d.i = st.i GROUP BY st.i),
    s0 AS (SELECT i, CAST({_BT_SCALE} AS BIGINT) AS s FROM states),
    {",".join(_bt_iteration_sql(k) for k in range(1, _BT_ITERS + 1))}
    SELECT f.i AS nation,
           w.wins AS n_wins,
           CAST((SELECT SUM(n) FROM sym sy WHERE sy.i = f.i) AS BIGINT)
               AS n_comparisons,
           CAST(f.s AS BIGINT) AS strength_fp,
           CAST(row_number() OVER (ORDER BY f.s DESC, f.i) AS INTEGER)
               AS rnk
    FROM s{_BT_ITERS} f JOIN w ON w.i = f.i
    """,
    tags=("training", "preference", "ranking", "iterative"),
)
def q263_bradley_terry(spark, sf_dir):
    """Bradley-Terry strength fit — the model behind reward-model /
    arena-style ranking (Chatbot-Arena Elo's batch cousin): mine
    pairwise comparisons, then solve for latent strengths with the
    classic MM update s_i' = W_i / sum_j n_ij/(s_i + s_j) (Hunter
    2004). Comparisons come from co-occurrence: two suppliers racing
    inside the same order, earlier ship date wins, aggregated to
    nation level (ties and same-nation pairs dropped).

    The fit runs {_BT_ITERS} unrolled MM iterations entirely in
    FIXED-POINT INTEGER arithmetic (strengths in micro-units, the
    update in BIGINT `div`), so the result is bit-identical across
    engines — no float summation-order, no transcendental, no
    rounding mode anywhere (same discipline as q238's checksum). The
    two MM products run 128-bit (DECIMAL(38,0) / oracle HUGEINT): the
    round-15 sf100 probe hit the predicted BIGINT ceiling — wins*SC^2
    overflows 2^63 at 1000x bench scale, long before petabytes —
    quotients and strengths stay BIGINT. Scale shape: the self-join is on
    the fact table's clustering key with fan-out bounded by
    lines-per-order (<= 7), so pair volume is O(rows * 21), never
    quadratic; after one groupBy the MM iterations touch only the
    |nations|^2 symmetric matrix — broadcast-sized joins against a
    25-row strength vector, exactly how you'd iterate at 100 TB.

    Optimization round 16 (guide §2.6/§5, VERDICT r15 item 6): the
    r15 profile attributed ~70% of the anchor to driver-side plan
    analysis — each iteration's localCheckpoint job rebuilt the sym /
    wins subtrees (union + three tiny exchanges) and two broadcast
    exchanges of the 25-row strength vector. Now ``sym`` is
    checkpointed ONCE, the per-nation wins/comparison totals and the
    |nations|^2-row matrix are collected once (bounded by the nation
    dimension at any corpus scale), and the MM fixed-point runs as
    exact nonnegative-integer arithmetic in the driver — identical
    values to the DECIMAL(38,0) expressions (`div` == floor `//` on
    nonnegatives, integer sums exact in any order), so the result is
    bit-identical; the DuckDB oracle is unchanged. Distributed work
    (pair mining, matrix aggregation) stays in Spark.

    resource-change: the conditional hash rebalance of the
    under-split lineitem scan adds one narrow 3-column exchange on
    single-file fixture layouts (sf0.01 measured: read 2.19 MB /
    write 1.32 MB vs the old 143 KB matrix-only shuffles) in trade
    for the pair-mine stage parallelizing 3 -> 32 tasks; on a
    splittable multi-file layout the rebalance (and these bytes) do
    not fire. Caps: shuffle-read<=4194304 / shuffle-write<=2621440 /
    spill<=2097152."""
    # Conditional HASH rebalance on the self-join key (round 16,
    # guide §6/§2.5): the whole pair-mine (scan + broadcast joins +
    # partial agg) ran as ONE 3-task stage on the single-row-group
    # fixture — 0.95 s of the 3.4 s anchor (stage profile). A
    # round-robin wide_table rebalance was measured NO better (its
    # sort-before-repartition pass, SPARK-23207, costs on the same 3
    # scan tasks what the rebalance saves); hashing on l_orderkey
    # needs no sort, spreads the mine, and is skew-safe here (orders
    # have <= 7 lines). No exchange fires on splittable multi-file
    # layouts.
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    if li.rdd.getNumPartitions() * 2 < spark.sparkContext.defaultParallelism:
        li = li.repartition(
            spark.sparkContext.defaultParallelism, "l_orderkey"
        )
    su = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    na = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = F.broadcast(
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey).select(
            "s_suppkey", "n_name"
        )
    )
    l1 = li.alias("l1").join(sn.alias("m1"),
                             F.col("l1.l_suppkey") == F.col("m1.s_suppkey"))
    pairs = (
        l1.join(
            li.alias("l2"),
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") < F.col("l2.l_suppkey")),
        )
        .join(sn.alias("m2"),
              F.col("l2.l_suppkey") == F.col("m2.s_suppkey"))
        .where(
            (F.col("l1.l_shipdate") != F.col("l2.l_shipdate"))
            & (F.col("m1.n_name") != F.col("m2.n_name"))
        )
        .select(
            F.when(
                F.col("l1.l_shipdate") < F.col("l2.l_shipdate"),
                F.col("m1.n_name"),
            ).otherwise(F.col("m2.n_name")).alias("win_n"),
            F.when(
                F.col("l1.l_shipdate") < F.col("l2.l_shipdate"),
                F.col("m2.n_name"),
            ).otherwise(F.col("m1.n_name")).alias("lose_n"),
        )
    )
    # ONE distributed job (round 16, guide §2.6/§5): the aggregated
    # comparison matrix is bounded by |nations|^2 rows at ANY corpus
    # scale — 625 rows is model state, not data. The r15/r16 shapes
    # still ran 4-5 driver-visible jobs (direct ckpt, sym ckpt, stats
    # collect, one job per MM iteration), and the per-job driver gap
    # dominated the anchor (stage profile: ~1.7 s outside any stage).
    # Now the fact-table pair mining + matrix aggregation — all the
    # distributed work — runs once, its bounded result is collected,
    # and symmetrization, win/comparison totals and the MM fixed-point
    # are exact nonnegative-integer arithmetic in the driver:
    # identical values to the old DECIMAL(38,0)/bigint expressions
    # (`div` == floor `//` on nonnegatives, greatest == max, integer
    # sums exact in any order; wins for never-winning nations default
    # 0 exactly like the old left join) — the oracle hash is
    # unchanged (re-checked at sf0.001/sf0.01).
    direct_rows = (
        pairs.groupBy(
            F.col("win_n").alias("i"), F.col("lose_n").alias("j")
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .collect()
    )
    if not direct_rows:
        return spark.createDataFrame(
            [],
            "nation string, n_wins bigint, n_comparisons bigint, "
            "strength_fp bigint, rnk int",
        )
    sym_d: dict[tuple[str, str], int] = {}
    wins_d: dict[str, int] = {}
    for r in direct_rows:
        i, j, n = r["i"], r["j"], r["n"]
        sym_d[(i, j)] = sym_d.get((i, j), 0) + n
        sym_d[(j, i)] = sym_d.get((j, i), 0) + n
        wins_d[i] = wins_d.get(i, 0) + n
    states = sorted({i for i, _ in sym_d})
    wins = {i: wins_d.get(i, 0) for i in states}
    ncomp = {i: 0 for i in states}
    for (i, _j), n in sym_d.items():
        ncomp[i] += n
    scores = {i: _BT_SCALE for i in states}
    for _ in range(_BT_ITERS):
        d = {i: 0 for i in scores}
        for (i, j), n in sym_d.items():
            d[i] += (n * _BT_SC2) // max(scores[i] + scores[j], 1)
        scores = {
            i: (wins[i] * _BT_SC2) // max(d[i], 1) for i in scores
        }
    out = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("nation"),
                        F.lit(wins[i]).cast("bigint").alias("n_wins"),
                        F.lit(ncomp[i]).cast("bigint").alias(
                            "n_comparisons"
                        ),
                        F.lit(scores[i]).cast("bigint").alias(
                            "strength_fp"
                        ),
                    )
                    for i in sorted(scores)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return out.withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy(F.col("strength_fp").desc(), F.col("nation")))
        .cast("int"),
    )


# --------------------------------------------------------------------------
# q264 — DSIR importance selection (hashed-bigram log-likelihood ratio)

_DSIR_BUCKETS = 1024
_DSIR_TOPK = 100


@register(
    "q264_dsir_selection",
    sql=f"""
    WITH w AS (
        SELECT doc_id, lang, source,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
        FROM documents WHERE length(trim(text)) > 1),
    bg AS (
        SELECT doc_id, lang, source,
               CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i + 1]), 1, 15))
                    AS BIGINT) % {_DSIR_BUCKETS} AS bucket
        FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS g(i)),
    tot AS (
        SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS r
        FROM bg),
    tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c
            FROM bg WHERE lang = 'en' GROUP BY bucket),
    rawc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c
             FROM bg GROUP BY bucket),
    lam AS (
        SELECT rawc.bucket,
               CAST(floor(1000000.0 * ln(
                   CAST((COALESCE(tgt.c, 0) + 1)
                        * (tot.r + {_DSIR_BUCKETS}) AS DOUBLE)
                   / CAST((rawc.c + 1)
                          * (tot.t + {_DSIR_BUCKETS}) AS DOUBLE)))
                    AS BIGINT) AS lam
        FROM rawc LEFT JOIN tgt ON rawc.bucket = tgt.bucket, tot)
    SELECT bg.doc_id, ANY_VALUE(bg.lang) AS lang,
           ANY_VALUE(bg.source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lam.lam) AS BIGINT) AS importance_score
    FROM bg JOIN lam ON bg.bucket = lam.bucket
    GROUP BY bg.doc_id
    ORDER BY importance_score DESC, bg.doc_id
    LIMIT {_DSIR_TOPK}
    """,
    tags=("curation", "selection", "dsir"),
)
def q264_dsir_selection(spark, sf_dir):
    """DSIR importance selection (Xie et al. 2023): score every raw
    document by how target-like its hashed-bigram profile is —
    lambda_b = ln((ct_b+1)/(T+B) / ((cr_b+1)/(R+B))), the
    Laplace-smoothed log-likelihood ratio of target vs raw counts in
    each of {_DSIR_BUCKETS} hash buckets — and keep the top
    {_DSIR_TOPK} by summed score. The target slice is lang='en'; the
    bucket hash is the md5 prefix (identical on any engine).

    Cross-engine determinism: the only transcendental, ln, is
    evaluated ONCE PER BUCKET on an exact integer-ratio double and
    immediately QUANTIZED to integer micro-nats (floor(1e6*ln)); the
    per-document score is then an exact BIGINT sum of those
    micro-nats, so float accumulation order is out of the picture
    entirely — the one place engines could disagree is a last-ulp
    libm difference landing exactly on a floor boundary
    (~1e-10/bucket odds). Scale shape: bigram hashing is a codegen'd
    transform over the split array (no UDF); the bucket-stat tables
    are at most {_DSIR_BUCKETS} rows — broadcast back to the compact
    per-doc table — and the final selection is a top-k, not a global
    sort. That is the whole DSIR pipeline: 100 TB in, two tiny
    histograms, one broadcast join, top-k out.

    plan-change: round 11 made the corpus scan SINGLE-PASS — the
    explode+md5 stream is collapsed once into a checkpointed
    (doc_id, bucket, cnt) table that feeds BOTH the histogram and the
    scoring join (the r10 formulation replayed the full explode+md5
    for each: hist built it, then scored rebuilt it). The new
    (doc_id, bucket) exchange is partial-aggregated (docs are
    contiguous in their input split, so map-side combine emits
    ~distinct-buckets-per-doc rows) and costs less than the second
    hashing pass it replaces: measured 13.9 s -> 9.6 s warm at sf1,
    2.0 s -> 1.7 s at sf0.1, output identical (fourth-decade growth
    7.06x -> ~5.8x per 10x). Allowed: hash-exchanges<=3
    shuffle-joins<=0."""
    d = table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    w = d.where(F.length(F.trim(F.col("text"))) > 1).select(
        "doc_id", "lang", "source", ws.alias("ws")
    )
    bigram = F.expr(
        "transform(slice(ws, 1, size(ws) - 1),"
        " (x, k) -> concat(x, ' ', ws[k + 1]))"
    )
    bg = w.select(
        "doc_id", "lang", "source", F.explode(bigram).alias("bigram")
    ).select(
        "doc_id", "lang", "source",
        (
            F.conv(F.substring(F.md5("bigram"), 1, 15), 16, 10)
            .cast("bigint") % _DSIR_BUCKETS
        ).alias("bucket"),
    )
    # ONE pass over the bigram stream builds EVERYTHING: the stream
    # collapses to a checkpointed (doc, bucket, cnt) table (map-side
    # combine — docs are contiguous in their split), and both the
    # 1024-row histogram and the per-doc scores fold from it. Earlier
    # formulations re-evaluated the explode+md5 per consumer: one agg
    # per statistic was the measured 6.5x-at-10x hazard fixed in r7;
    # hist-then-rescore was the 2-pass shape fixed in r11 (see
    # plan-change note).
    dbc = (
        bg.groupBy("doc_id", "lang", "source", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .transform(_ckpt)
    )
    hist = dbc.groupBy("bucket").agg(
        F.sum("cnt").cast("bigint").alias("cr"),
        F.sum(F.when(F.col("lang") == "en", F.col("cnt")).otherwise(0))
        .cast("bigint").alias("ct"),
    )
    tot = hist.agg(
        F.sum("ct").cast("bigint").alias("t"),
        F.sum("cr").cast("bigint").alias("r"),
    )
    lam = (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(
                1000000.0
                * F.log(
                    (
                        (F.col("ct") + 1) * (F.col("r") + _DSIR_BUCKETS)
                    ).cast("double")
                    / (
                        (F.col("cr") + 1) * (F.col("t") + _DSIR_BUCKETS)
                    ).cast("double")
                )
            ).cast("bigint").alias("lam"),
        )
    )
    scored = (
        dbc.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.any_value("source").alias("source"),
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("lam") * F.col("cnt"))
            .cast("bigint").alias("importance_score"),
        )
    )
    return scored.orderBy(
        F.col("importance_score").desc(), "doc_id"
    ).limit(_DSIR_TOPK)


# --------------------------------------------------------------------------
# q266 — bucketed co-located join (storage-partitioned, exchange-free)


def _bucket_db_name(sf_dir: str) -> str:
    return "bkt_" + re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir).strip("_").lower()


@register(
    "q266_bucketed_colocated_join",
    sql="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("scale", "bucketing", "layout"),
)
def q266_bucketed_colocated_join(spark, sf_dir):
    """Bucketed co-located join — the storage-layout decision that
    deletes the shuffle from every future join: orders and customer
    are persisted with ``bucketBy(8, custkey)`` (operators/skew.py
    write_bucketed) into a per-SF database, then joined straight from
    the bucketed tables. Because both sides share bucket count and
    key, Catalyst plans the sort-merge join with NO Exchange on
    either side (asserted in tests/test_governance_ops.py with
    broadcast disabled); at 100 TB this is the difference between
    re-shuffling the fact table on every query and paying one
    layout-time shuffle that all downstream joins and groupBys on
    the key reuse. The 8-bucket fixture stands in for the ~4096
    buckets a warehouse would choose (size buckets so one bucket =
    one task's worth of data, ~128-512 MB). Table writes are
    idempotent (mode=overwrite), so re-running the query — the
    driver benches repeat it — always reads its own fresh layout.
    The aggregate itself also benefits: groupBy on the bucket key
    side rides the same co-location."""
    db = _bucket_db_name(sf_dir)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    from rc_rag_spark.operators import skew as SK

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    # external paths + drop-first: a fresh session's catalog forgets
    # managed tables but their warehouse directories survive, and
    # managed CREATE refuses an existing location — external tables
    # with mode=overwrite are rerun-safe across sessions.
    base = os.path.join(tempfile.gettempdir(), db)
    spark.sql(f"DROP TABLE IF EXISTS {db}.orders_b")
    spark.sql(f"DROP TABLE IF EXISTS {db}.customer_b")
    SK.write_bucketed(o, f"{db}.orders_b", "o_custkey", 8,
                      sort_key="o_custkey",
                      path=os.path.join(base, "orders_b"))
    SK.write_bucketed(c, f"{db}.customer_b", "c_custkey", 8,
                      sort_key="c_custkey",
                      path=os.path.join(base, "customer_b"))
    ob = spark.table(f"{db}.orders_b")
    cb = spark.table(f"{db}.customer_b")
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# q269 — dynamic partition pruning (runtime scan elimination)


@register(
    "q269_dynamic_partition_pruning",
    sql="""
    WITH dim AS (
        SELECT CAST(year(l_shipdate) AS INTEGER) AS o_year
        FROM lineitem
        WHERE l_returnflag = 'R'
        GROUP BY 1
        ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2))) DESC,
                 o_year
        LIMIT 2)
    SELECT o.o_year, o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 o_orderpriority, o_totalprice
          FROM orders) o
    JOIN dim ON o.o_year = dim.o_year
    GROUP BY o.o_year, o.o_orderpriority
    """,
    tags=("scale", "partitioning", "dpp"),
)
def q269_dynamic_partition_pruning(spark, sf_dir):
    """Dynamic partition pruning — the runtime scan eliminator that
    matters most at 100 TB: the fact table is PHYSICALLY partitioned
    by year (written once per SF, drop-first/overwrite like q266's
    buckets), the dimension side is only known at RUNTIME (the top-2
    revenue years, computed from lineitem), and Catalyst pushes the
    dim's join-key values into the fact scan's PartitionFilters as a
    dynamicpruning subquery — so five of the seven year-directories
    are never opened, let alone read (plan asserted in
    tests/test_governance_ops.py). Static predicate pushdown can't do
    this: the years aren't literals in the query. At warehouse scale
    this is the difference between scanning 100 TB and scanning the
    two partitions the dim actually selects; it composes with
    broadcast (the 2-row dim broadcasts, and the same broadcast
    feeds the pruning subquery — reuse, not a second job). The
    oracle replays the semantics partition-free from the raw
    table."""
    base = os.path.join(
        tempfile.gettempdir(), _bucket_db_name(sf_dir) + "_dpp"
    )
    o = table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        "o_orderpriority",
        "o_totalprice",
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(base)
    # explicit schema: skips the footer-inference job, and an EMPTY
    # orders table (whose partitioned write leaves only _SUCCESS)
    # still reads back as a typed empty fact table instead of
    # UNABLE_TO_INFER_SCHEMA
    fact = spark.read.schema(o.schema).parquet(base)
    li = table(spark, sf_dir, "lineitem")
    # the dim side needs a genuinely SELECTIVE Filter for Catalyst's
    # PartitionPruning rule to fire (aggregate + limit alone don't
    # qualify as `hasSelectivePredicate`): top returned-revenue years
    dim = (
        li.where(F.col("l_returnflag") == "R")
        .groupBy(F.year("l_shipdate").cast("int").alias("o_year"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "rev"
            )
        )
        .orderBy(F.col("rev").desc(), "o_year")
        .limit(2)
        .select("o_year")
    )
    return (
        fact.join(F.broadcast(dim), "o_year")
        .groupBy("o_year", "o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# q270 — fill-in-the-middle (FIM) transform


@register(
    "q270_fim_transform",
    sql="""
    WITH p AS (
        SELECT doc_id,
               text AS s,
               length(text) AS n,
               length(text) // 3 AS p1,
               (2 * length(text)) // 3 AS p2
        FROM documents WHERE length(text) >= 9)
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode,
           CAST(p1 AS BIGINT) AS len_prefix,
           CAST(p2 - p1 AS BIGINT) AS len_middle,
           CAST(n - p2 AS BIGINT) AS len_suffix,
           md5(CASE WHEN doc_id % 2 = 0
                    THEN '<PRE>' || substr(s, 1, p1)
                         || '<SUF>' || substr(s, p2 + 1)
                         || '<MID>' || substr(s, p1 + 1, p2 - p1)
                    ELSE '<SUF>' || substr(s, p2 + 1)
                         || '<PRE>' || substr(s, 1, p1)
                         || '<MID>' || substr(s, p1 + 1, p2 - p1)
               END) AS fim_hash
    FROM p
    """,
    tags=("training", "transform", "fim"),
)
def q270_fim_transform(spark, sf_dir):
    """Fill-in-the-middle (FIM) transform — the data-prep rewrite
    behind infilling-capable code/text models (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"):
    split each document at deterministic third-points into
    (prefix, middle, suffix) and re-serialize with the middle moved
    to the END, in PSM order for even ids and SPM for odd — the
    50/50 mode mix the paper recommends. The emitted md5 pins the
    exact transformed string per mode without shipping it; length
    bookkeeping pins the split. Scale shape: pure per-row codegen'd
    string arithmetic — no shuffle, no UDF; at 100 TB this transform
    runs at scan speed and is exactly the kind of map a curation
    pipeline fuses onto the final write."""
    d = table(spark, sf_dir, "documents")
    p = d.where(F.length("text") >= 9).select(
        "doc_id",
        F.col("text").alias("s"),
        F.length("text").alias("n"),
        F.expr("length(text) div 3").alias("p1"),
        F.expr("(2 * length(text)) div 3").alias("p2"),
    )
    pre = F.expr("substr(s, 1, p1)")
    mid = F.expr("substr(s, p1 + 1, p2 - p1)")
    suf = F.expr("substr(s, p2 + 1)")
    psm = F.concat(
        F.lit("<PRE>"), pre, F.lit("<SUF>"), suf, F.lit("<MID>"), mid
    )
    spm = F.concat(
        F.lit("<SUF>"), suf, F.lit("<PRE>"), pre, F.lit("<MID>"), mid
    )
    even = F.col("doc_id") % 2 == 0
    return p.select(
        "doc_id",
        F.when(even, F.lit("psm")).otherwise(F.lit("spm")).alias("mode"),
        F.col("p1").cast("bigint").alias("len_prefix"),
        (F.col("p2") - F.col("p1")).cast("bigint").alias("len_middle"),
        (F.col("n") - F.col("p2")).cast("bigint").alias("len_suffix"),
        F.md5(F.when(even, psm).otherwise(spm)).alias("fim_hash"),
    )


# --------------------------------------------------------------------------
# q271 — vocabulary coverage / OOV rate per source

_VOCAB_SIZE = 256


@register(
    "q271_vocab_coverage",
    sql=f"""
    WITH tok AS (
        SELECT source, unnest(regexp_split_to_array(trim(lower(text)),
                                                    '\\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0),
    vocab AS (
        SELECT w FROM (
            SELECT w, COUNT(*) AS c FROM tok GROUP BY w
            ORDER BY c DESC, w LIMIT {_VOCAB_SIZE})),
    m AS (
        SELECT t.source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(v.w) AS BIGINT) AS n_covered,
               CAST(COUNT(DISTINCT CASE WHEN v.w IS NULL THEN t.w END)
                    AS BIGINT) AS n_oov_types
        FROM tok t LEFT JOIN vocab v ON t.w = v.w
        GROUP BY t.source)
    SELECT source, n_tokens, n_covered, n_oov_types,
           CAST(n_tokens - n_covered AS DOUBLE) / n_tokens AS oov_rate
    FROM m
    """,
    tags=("textstats", "tokenizer", "coverage"),
)
def q271_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage / OOV audit — the report that decides
    whether a tokenizer's vocab serves a new source: build the
    top-{_VOCAB_SIZE} word vocabulary from global counts
    (deterministic count-then-word ordering), then measure, per
    source, how many token OCCURRENCES the vocab covers and how many
    distinct out-of-vocab TYPES remain. High OOV-rate sources either
    need vocab expansion or produce fertility blow-ups downstream
    (every OOV word splits into many subwords). The rate is one
    exact integer division per source. Scale shape: one token
    explode feeding two partial-agg shuffles (vocab build, per-source
    fold); the vocab itself is top-k — {_VOCAB_SIZE} rows, broadcast
    back against the token stream, so the coverage join never
    shuffles the corpus."""
    d = table(spark, sf_dir, "documents")
    tok = d.where(F.length(F.trim("text")) > 0).select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(_VOCAB_SIZE)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    m = (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.count("in_vocab").cast("bigint").alias("n_covered"),
            F.countDistinct(
                F.when(F.col("in_vocab").isNull(), F.col("w"))
            ).cast("bigint").alias("n_oov_types"),
        )
    )
    return m.select(
        "source", "n_tokens", "n_covered", "n_oov_types",
        (
            (F.col("n_tokens") - F.col("n_covered")).cast("double")
            / F.col("n_tokens")
        ).alias("oov_rate"),
    )


# --------------------------------------------------------------------------
# q272 — boilerplate prefix mining


@register(
    "q272_boilerplate_prefixes",
    sql="""
    WITH p AS (
        SELECT doc_id, source,
               array_to_string(regexp_split_to_array(trim(lower(text)),
                                                     '\\s+')[1:4], ' ')
                   AS prefix
        FROM documents
        WHERE len(regexp_split_to_array(trim(lower(text)), '\\s+')) >= 4)
    SELECT prefix,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS example_doc
    FROM p GROUP BY prefix HAVING COUNT(*) >= 3
    """,
    tags=("curation", "boilerplate", "templates"),
)
def q272_boilerplate_prefixes(spark, sf_dir):
    """Boilerplate-prefix mining — the cheap template detector web
    pipelines run before near-dup: group documents by their first
    four (lowercased) words; any prefix shared by >= 3 documents is
    a boilerplate candidate (cookie banners, licence headers, forum
    signatures — content that inflates n-gram counts and leaks
    across train/test). Reported with how many sources it spans
    (cross-source prefixes are template-library boilerplate;
    single-source ones are site chrome) and a deterministic example
    id. Scale shape: a 4-word prefix is a bounded-size key — one
    partial-agg shuffle over ~30 bytes/doc, no explode, no pairwise
    anything; the q188/q222 chunk-level machinery only runs on what
    survives this filter."""
    d = table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.lower("text")), r"\s+")
    p = d.where(F.size(ws) >= 4).select(
        "doc_id", "source",
        F.array_join(F.slice(ws, 1, 4), " ").alias("prefix"),
    )
    return (
        p.groupBy("prefix")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("example_doc"),
        )
        .where(F.col("n_docs") >= 3)
    )
