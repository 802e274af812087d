"""MLlib + multimodal query corpus entries (rows-only driver checks;
exact behavior covered in tests/test_multimodal_retrieval.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rc_rag_spark.operators import multimodal as MM
from rc_rag_spark.operators import retrieval as R
from rc_rag_spark.queries.core import register
from rc_rag_spark.checkpoints import ckpt as _ckpt


@register("q72_retrieval_scoring", tags=("ml", "retrieval"))
def q72_retrieval_scoring(spark, sf_dir):
    """TF-IDF + overlap-feature logistic-regression relevance model:
    train on synthesized (question, passage, label) pairs, batch-score
    them (north-star 'MLlib retrieval model + batch inference')."""
    # localCheckpoint: the IDF fits + LR iterations each re-trigger the
    # input lineage; materialize the (small) training table once
    pairs = R.synthesize_training_pairs(spark, sf_dir, limit=200).transform(
        _ckpt
    )
    if pairs.isEmpty():
        # no documents -> no training pairs: MLlib's IDF/LR cannot fit
        # on zero rows ("Haven't seen any document yet"); an empty
        # corpus scores an empty batch
        return spark.createDataFrame(
            [], "pair_id bigint, label double, predicted_relevant boolean"
        )
    model = R.train_relevance_model(pairs)
    return R.score_pairs(model, pairs).select(
        "pair_id", "label", (F.col("relevance") > 0.5).alias("predicted_relevant")
    )


# Shared retrieval feature-matrix SQL (q72a hash-checks it; q168
# trains on it — one home for the oracle-side formulation).
_RETRIEVAL_FEATURES_SQL = """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents WHERE doc_id < 200),
    pos AS (SELECT doc_id AS pair_id,
                   'what is ' || array_to_string(words[1:3], ' ')
                       || ' about entity' || CAST(doc_id % 50 AS VARCHAR)
                       AS question,
                   array_to_string(words[1:12], ' ') || ' entity'
                       || CAST(doc_id % 50 AS VARCHAR) AS passage,
                   1.0 AS label
            FROM d),
    negsrc AS (SELECT doc_id AS _nid,
                      -- array_to_string([]) is NULL in DuckDB but
                      -- array_join([]) is '' in Spark: coalesce so
                      -- short docs (<13 words) build ' entityNN'
                      coalesce(array_to_string(words[13:24], ' '), '')
                          || ' entity'
                          || CAST((doc_id + 17) % 50 AS VARCHAR)
                          AS neg_passage
               FROM d),
    neg AS (SELECT p.pair_id + 1000000 AS pair_id, p.question,
                   n.neg_passage AS passage, 0.0 AS label
            FROM pos p JOIN negsrc n ON p.pair_id = (n._nid + 1) % 200),
    pairs AS (SELECT * FROM pos UNION ALL SELECT * FROM neg),
    base AS (SELECT pair_id, label,
                    regexp_split_to_array(lower(question), '\\s+') AS qt,
                    regexp_split_to_array(lower(passage), '\\s+') AS pt
             FROM pairs),
    qtf AS (SELECT pair_id, unnest(qt) AS tok FROM base),
    qtc AS (SELECT pair_id, tok, COUNT(*) AS tfq FROM qtf
            GROUP BY pair_id, tok),
    ptf AS (SELECT pair_id, unnest(pt) AS tok FROM base),
    ptc AS (SELECT pair_id, tok, COUNT(*) AS tfp FROM ptf
            GROUP BY pair_id, tok),
    df AS (SELECT tok, COUNT(DISTINCT pair_id) AS dfreq FROM ptf
           GROUP BY tok),
    n AS (SELECT COUNT(*) AS n_pairs FROM pairs),
    dot AS (SELECT q.pair_id,
                   CAST(SUM(q.tfq * p.tfp) AS BIGINT) AS tf_dot,
                   CAST(SUM(CASE WHEN f.dfreq * 10 <= n.n_pairs
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS rare_overlap
            FROM qtc q
            JOIN ptc p ON p.pair_id = q.pair_id AND p.tok = q.tok
            JOIN df f ON f.tok = q.tok CROSS JOIN n
            GROUP BY q.pair_id)
    SELECT b.pair_id, b.label,
           CAST(len(b.qt) AS INTEGER) AS n_q_toks,
           CAST(len(b.pt) AS INTEGER) AS n_p_toks,
           CAST(len(list_intersect(b.qt, b.pt)) AS INTEGER) AS overlap,
           CAST(len(list_intersect(b.qt, b.pt)) AS DOUBLE)
               / greatest(len(list_distinct(list_concat(b.qt, b.pt))), 1)
               AS jaccard,
           coalesce(d.tf_dot, 0) AS tf_dot,
           coalesce(d.rare_overlap, 0) AS rare_overlap
    FROM base b LEFT JOIN dot d USING (pair_id)
    """


@register(
    "q72a_retrieval_features",
    sql=_RETRIEVAL_FEATURES_SQL,
    tags=("ml", "retrieval", "features"),
)
def q72a_retrieval_features(spark, sf_dir):
    """Hash-checked twin of q72's feature stage (r2 judge item: q72
    was rows-only end to end). MLlib's HashingTF buckets are murmur3-
    hashed and not SQL-reproducible, so the checkable formulation is
    the EXACT-token feature matrix over the same synthesized pairs:
    token counts, set overlap, Jaccard, the integer TF dot-product
    (order-independent, so hash-stable), and an IDF-flavored
    rare-token overlap (document frequency <= 10% of pairs). All
    explode->groupBy partial aggregations — the same shuffle shape at
    any scale; the q72 scoring entry stays the MLlib path."""
    pairs = R.synthesize_training_pairs(spark, sf_dir, limit=200)
    qt = F.split(F.lower(F.col("question")), r"\s+")
    pt = F.split(F.lower(F.col("passage")), r"\s+")
    base = pairs.select("pair_id", "label", qt.alias("qt"), pt.alias("pt"))
    inter = F.array_intersect("qt", "pt")
    feats = base.select(
        "pair_id", "label",
        F.size("qt").cast("int").alias("n_q_toks"),
        F.size("pt").cast("int").alias("n_p_toks"),
        F.size(inter).cast("int").alias("overlap"),
        (
            F.size(inter).cast("double")
            / F.greatest(F.size(F.array_union("qt", "pt")), F.lit(1))
        ).alias("jaccard"),
    )
    qtc = (
        base.select("pair_id", F.explode("qt").alias("tok"))
        .groupBy("pair_id", "tok")
        .agg(F.count("*").alias("tfq"))
    )
    ptok = base.select("pair_id", F.explode("pt").alias("tok"))
    ptc = ptok.groupBy("pair_id", "tok").agg(F.count("*").alias("tfp"))
    df = ptok.groupBy("tok").agg(F.count_distinct("pair_id").alias("dfreq"))
    n = base.agg(F.count("*").alias("n_pairs"))
    dot = (
        qtc.join(ptc, ["pair_id", "tok"])
        .join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .groupBy("pair_id")
        .agg(
            F.sum(F.col("tfq") * F.col("tfp")).alias("tf_dot"),
            F.sum(
                F.when(F.col("dfreq") * 10 <= F.col("n_pairs"), 1).otherwise(0)
            ).alias("rare_overlap"),
        )
    )
    return feats.join(dot, "pair_id", "left").select(
        "pair_id", "label", "n_q_toks", "n_p_toks", "overlap", "jaccard",
        F.coalesce("tf_dot", F.lit(0)).alias("tf_dot"),
        F.coalesce("rare_overlap", F.lit(0)).alias("rare_overlap"),
    )


# The q73/q74/q99 oracles recompute operators/multimodal.py's
# DETERMINISTIC kernels from first principles in SQL — synthesize_media
# payload byte j of media i is (i*31+j)%256, length 128+i, kinds cycle
# image/audio/video, meta is pure i-arithmetic — so the Arrow-batched
# mapInPandas plumbing is hash-checked end-to-end, not just rows-only.
# The recipes here and in synthesize_media/_fake_feature/sample_frames/
# resize_images must stay in lockstep.

@register(
    "q73_media_features",
    sql="""
    WITH hexes AS (
        SELECT i, array_to_string(
            [printf('%02x', (i*31 + j) % 256)
             for j in generate_series(0, 127 + i)], '') AS hx
        FROM generate_series(0, 95) t(i)
    ),
    feat AS (
        SELECT CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                          ELSE 'video' END AS kind,
               128 + i AS n_bytes,
               -- _fake_feature f0: first 4 sha256 bytes of 'hex-0' as a
               -- /2^32 fraction, stored by Spark as FLOAT32 — the cast
               -- mirrors that truncation before averaging
               CAST(CAST(('0x' || substr(sha256(hx || '-0'), 1, 8))
                         AS BIGINT) / 4294967296.0 AS FLOAT) AS f0
        FROM hexes
    )
    SELECT kind, COUNT(*) AS n, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           round(AVG(f0), 6) AS avg_f0
    FROM feat GROUP BY kind
    """,
    tags=("multimodal",),
)
def q73_media_features(spark, sf_dir):
    """Multimodal plumbing: synthetic binary media → Arrow-batched
    feature extraction → per-kind stats. The decode kernel is a
    deterministic fake (sha256 of the payload hex), so the oracle
    recomputes the whole pipeline in SQL."""
    media = MM.synthesize_media(spark, n=96)
    return MM.media_stats(MM.extract_features(media))


@register(
    "q74_video_frame_sample",
    sql="""
    WITH m AS (
      SELECT i AS media_id, 128 + i AS len,
             greatest(1, (4000 + 500 * (i % 5)) // 1000) AS nf
      FROM generate_series(0, 95) t(i) WHERE i % 3 = 2
    ),
    s AS (SELECT media_id, len, nf, greatest(1, len // nf) AS step FROM m),
    fr AS (SELECT media_id, unnest(generate_series(0, nf - 1)) AS k,
                  len, step
           FROM s)
    SELECT media_id, COUNT(*) AS n_frames,
           CAST(SUM(greatest(0, least(len, (k+1)*step)
                                - least(len, k*step))) AS BIGINT)
               AS total_bytes
    FROM fr GROUP BY media_id
    """,
    tags=("multimodal",),
)
def q74_video_frame_sample(spark, sf_dir):
    """Frame-sampling explode pattern over video rows. Frames are
    byte slices [k*step, (k+1)*step) of the payload; the oracle
    reproduces the slice-length arithmetic per sampled frame."""
    media = MM.synthesize_media(spark, n=96)
    frames = MM.sample_frames(media, every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.length("frame_payload")).cast("bigint").alias("total_bytes"),
    )


@register(
    "q99_image_resize",
    sql="""
    WITH m AS (
      SELECT i, 128 + i AS len,
             greatest(1, (64 + i % 32) * (48 + i % 16)) AS src_px
      FROM generate_series(0, 95) t(i) WHERE i % 3 = 0
    )
    SELECT 'image' AS kind, COUNT(*) AS n,
           CAST(32 AS INTEGER) AS min_w, CAST(32 AS INTEGER) AS max_h,
           CAST(SUM(greatest(1, len * 1024 // src_px)) AS BIGINT)
               AS total_bytes
    FROM m
    """,
    tags=("multimodal",),
)
def q99_image_resize(spark, sf_dir):
    """Resize pipeline over image rows: metadata-pruned decode →
    resize → re-encode (kernel import-gated on PIL, deterministic fake
    otherwise), then a relational stage over the rewritten metadata —
    the downstream proof that meta travels with the payload. Synthetic
    payloads are never decodable images, so both PIL and no-PIL
    environments take the fake kernel (payload length scaled by the
    32×32/src pixel ratio) that the oracle reproduces."""
    media = MM.synthesize_media(spark, n=96)
    resized = MM.resize_images(media, width=32, height=32)
    return resized.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.min(F.col("meta.width")).cast("int").alias("min_w"),
        F.max(F.col("meta.height")).cast("int").alias("max_h"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
    )


@register("q75_knn_ivf", tags=("ml", "similarity", "ivf"))
def q75_knn_ivf(spark, sf_dir):
    """IVF (KMeans cells + probe) approximate top-5 — recall vs the
    brute-force q64 asserted in tests."""
    from rc_rag_spark.operators.ann import ivf_topk
    from rc_rag_spark.sources import table

    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.where(F.col("vec_id") >= 5)
    # 16 cells / probe 10 rather than 8/4: the synthetic embeddings are
    # near-uniform (no cluster structure), so coarse cells scatter true
    # neighbors; this configuration holds recall >= 0.8 at every gate
    # SF (bounded by q131) while still skipping ~40% of the corpus.
    out = ivf_topk(corpus, queries, k=5, n_clusters=16, n_probe=10)
    return out.select(
        "query_id", "neighbor_id",
        F.round("similarity", 9).alias("similarity"), "rank",
    )


@register(
    "q76_quality_zscore",
    sql="""
    WITH t AS (
        SELECT lang, CAST(n_chars AS DOUBLE) AS n_chars FROM documents
    ),
    s AS (
        SELECT lang, n_chars,
               AVG(n_chars) OVER (PARTITION BY lang) AS mu,
               STDDEV_SAMP(n_chars) OVER (PARTITION BY lang) AS sigma,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM t
    )
    SELECT lang, n_chars,
           round(CASE WHEN n < 2 OR sigma = 0 OR sigma IS NULL THEN 0.0
                      ELSE (n_chars - mu) / sigma END, 6) AS zscore
    FROM s
    """,
    tags=("groupmap", "stats"),
)
def q76_quality_zscore(spark, sf_dir):
    """Per-language z-score of doc length via grouped-map
    applyInPandas (oracle: the native window formulation in SQL)."""
    from rc_rag_spark.operators.groupstats import zscore_grouped_map
    from rc_rag_spark.sources import table

    d = table(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("double").alias("n_chars")
    )
    out = zscore_grouped_map(d, ["lang"], "n_chars")
    return out.withColumn("zscore", F.round("zscore", 6))


@register(
    "q105_trimmed_mean",
    sql="""
    WITH o AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
        WHERE value IS NOT NULL
    )
    SELECT event_type,
           COUNT(*) AS n_kept,
           round(AVG(value), 6) AS trimmed_mean_value
    FROM o
    WHERE rn > CAST(floor(n * 0.1) AS BIGINT)
      AND rn <= n - CAST(floor(n * 0.1) AS BIGINT)
    GROUP BY event_type
    """,
    tags=("udf", "grouped-agg"),
)
def q105_trimmed_mean(spark, sf_dir):
    """Grouped-agg pandas UDF surface: 10%-trimmed mean of value per
    event_type (no native Spark aggregate). The oracle trims by sorted
    row position — identical multiset since ties at the cut share the
    same value. n_kept comes from a native count with the same trim
    arithmetic. Spark disallows mixing a grouped-agg pandas UDF with
    native aggregates in one agg(), so the two run as separate
    aggregations joined on the (5-row) group key — both share the same
    hash partitioning, and the tiny native side broadcasts. NULL
    values are dropped up front in BOTH engines: SQL AVG would skip
    them silently while the pandas UDF's float64 cast would turn them
    into NaN and poison the whole group (the q192/q203 discipline)."""
    from rc_rag_spark.operators.groupstats import trimmed_mean
    from rc_rag_spark.sources import table

    e = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    n = F.count("*")
    k = F.floor(n * 0.1).cast("long")
    counts = e.groupBy("event_type").agg((n - 2 * k).alias("n_kept"))
    means = e.groupBy("event_type").agg(
        F.round(trimmed_mean("value"), 6).alias("trimmed_mean_value")
    )
    return means.join(F.broadcast(counts), "event_type").select(
        "event_type", "n_kept", "trimmed_mean_value"
    )


@register(
    "q124_grouped_linear_fit",
    sql="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sxx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sxy
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) AS slope,
           (sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * sx)
               / n AS intercept
    FROM s
    """,
    tags=("ml", "regression"),
)
def q124_grouped_linear_fit(spark, sf_dir):
    """Closed-form OLS per group: extendedprice ~ quantity fit from
    the normal equations, one distributed pass of exact-decimal moment
    sums (n, Σx, Σy, Σx², Σxy) then driver-free scalar algebra. This
    is the 100 TB shape for single-feature regression: no MLlib
    iteration, no second scan, partial aggregation collapses each
    partition to one moment row per group. The moment sums are exact
    decimals cast to double, and slope/intercept are spelled with the
    identical operation order on both engines, so results are
    bit-deterministic."""
    from rc_rag_spark.queries.core import dec
    from rc_rag_spark.sources import wide_table

    li = wide_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity", 18, 2), dec("l_extendedprice", 18, 2)
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    # Zero x-variance makes the denominator 0.0: Spark's non-ANSI
    # double division already yields NULL there, but DuckDB's IEEE
    # division would give inf/nan — both sides now NULLIF/when-guard
    # so degenerate groups emit NULL slope AND intercept identically.
    denom = F.nullif(n * sxx - sx * sx, F.lit(0.0))
    slope = (n * sxy - sx * sy) / denom
    return s.select(
        "l_returnflag", "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


@register(
    "q129_audio_chunking",
    sql="""
    WITH m AS (
      SELECT i AS media_id, 128 + i AS len,
             4000 + 500 * (i % 5) AS dur
      FROM generate_series(0, 95) t(i) WHERE i % 3 = 1
    ),
    s AS (SELECT media_id, len, dur,
                 greatest(1, CAST(ceil(dur / 500.0) AS BIGINT)) AS nc
          FROM m),
    ch AS (SELECT media_id, len, dur, nc,
                  greatest(1, len // nc) AS step,
                  unnest(generate_series(0, nc - 1)) AS k
           FROM s)
    SELECT media_id, COUNT(*) AS n_chunks,
           CAST(SUM(greatest(0, (CASE WHEN k = nc - 1 THEN len
                                 ELSE least(len, (k+1)*step) END)
                                - least(len, k*step))) AS BIGINT)
               AS total_bytes,
           CAST(SUM(least(500, dur - k*500)) AS BIGINT) AS total_ms
    FROM ch GROUP BY media_id
    """,
    tags=("multimodal", "audio"),
)
def q129_audio_chunking(spark, sf_dir):
    """Audio chunking explode pattern (500 ms windows) over the
    synthetic media table; the oracle reproduces the ceil-division
    chunk-count, byte-slice and remainder-ms arithmetic per chunk."""
    media = MM.synthesize_media(spark, n=96)
    chunks = MM.chunk_audio(media, window_ms=500)
    return chunks.groupBy("media_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.length("chunk_payload")).cast("bigint").alias("total_bytes"),
        F.sum("chunk_ms").cast("bigint").alias("total_ms"),
    )


_PR_ITERS = 3
_PR_DAMP = 0.85


def _pr_oracle_sql() -> str:
    """Unrolled-iteration DuckDB twin of q139's PageRank: identical
    quantized arithmetic per step (contributions rounded to 12
    decimals, summed exactly in DECIMAL, rank re-quantized), so the
    float path is a single deterministic op sequence on both
    engines."""
    ctes = ["""
    edges0 AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                        's' || CAST(l.l_suppkey AS VARCHAR) AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    edges AS (SELECT src, dst FROM edges0
              UNION ALL SELECT dst, src FROM edges0),
    deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges
            GROUP BY src),
    r0 AS (SELECT node, 1.0 AS rank FROM deg)"""]
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        ctes.append(f"""
    r{i} AS (
        SELECT e.dst AS node,
               round(0.15 + {_PR_DAMP} * CAST(SUM(CAST(
                   round(r.rank / d.outdeg, 12) AS DECIMAL(28,12)))
                   AS DOUBLE), 12) AS rank
        FROM edges e
        JOIN {prev} r ON r.node = e.src
        JOIN deg d ON d.node = e.src
        GROUP BY e.dst)""")
        prev = f"r{i}"
    return (
        "WITH " + ",".join(ctes)
        + f" SELECT node, round(rank, 9) AS rank FROM {prev}"
    )


@register("q139_pagerank_trade_graph", sql=_pr_oracle_sql(),
          tags=("graph", "iterative", "pagerank"))
def q139_pagerank_trade_graph(spark, sf_dir):
    """PageRank (3 iterations, d=0.85) over the undirected
    customer↔supplier trade graph derived from orders⋈lineitem —
    the 'iterative distributed algorithm' surface, HASH-CHECKED: each
    iteration is one equi-join + partial-agg shuffle on the node key
    (the standard scalable PageRank step; no driver-side state beyond
    the loop counter), and determinism comes from quantizing each
    contribution to 12 decimals and summing in exact DECIMAL, so
    partitioning cannot reorder float addition. The oracle unrolls
    the same three iterations as chained CTEs. At 100 TB the edge
    list is the shuffle cost driver; pre-partitioning edges by src
    lets every iteration reuse one exchange."""
    from rc_rag_spark.sources import table

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # one shuffle on src reused by every iteration's join
    edges = edges.join(deg, "src").transform(_ckpt)
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select(
                F.col("dst"),
                F.round(F.col("rank") / F.col("outdeg"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        ranks = contrib.groupBy("dst").agg(
            F.round(
                F.lit(0.15) + F.lit(_PR_DAMP) * F.sum("c").cast("double"),
                12,
            ).alias("rank")
        ).select(F.col("dst").alias("node"), "rank")
    return ranks.select("node", F.round("rank", 9).alias("rank"))


@register(
    "q143_video_keyframes",
    sql="""
    WITH m AS (
      SELECT i AS media_id, 128 + i AS len,
             greatest(1, (4000 + 500 * (i % 5)) // 1000) AS nf
      FROM generate_series(0, 95) t(i) WHERE i % 3 = 2
    ),
    s AS (SELECT media_id, len, nf, greatest(1, len // nf) AS step FROM m),
    hexes AS (
      SELECT i AS media_id, array_to_string(
          [printf('%02x', (i*31 + j) % 256)
           for j in generate_series(0, 127 + i)], '') AS hx
      FROM generate_series(0, 95) t(i) WHERE i % 3 = 2
    ),
    fr0 AS (SELECT media_id, len, step, nf,
                   unnest(generate_series(0, nf - 1)) AS k
            FROM s),
    fr AS (SELECT f.media_id, f.k, f.nf,
                  substr(h.hx, 2 * f.k * f.step + 1,
                         2 * (least(f.len, (f.k + 1) * f.step)
                              - least(f.len, f.k * f.step))) AS fhx
           FROM fr0 f JOIN hexes h USING (media_id)),
    feat AS (SELECT media_id, k, nf,
                    CAST(CAST(('0x' || substr(sha256(fhx || '-0'), 1, 8))
                              AS BIGINT) / 4294967296.0 AS FLOAT) AS f0
             FROM fr)
    SELECT media_id, CAST(k AS INTEGER) AS best_frame,
           round(f0, 9) AS best_f0, CAST(nf AS BIGINT) AS n_frames
    FROM (SELECT *, row_number() OVER (
              PARTITION BY media_id ORDER BY f0 DESC, k) AS rk
          FROM feat)
    WHERE rk = 1
    """,
    tags=("multimodal", "video", "keyframe"),
)
def q143_video_keyframes(spark, sf_dir):
    """Keyframe selection: sample frames from each video, score each
    frame (deterministic fake kernel — a CLIP-style scorer drops into
    the same slot), keep the argmax frame per video. Exercises the
    TWO-stage multimodal pipeline (mapInPandas explode → mapInPandas
    score → window argmax) hash-checked end to end; the oracle
    re-derives frame byte-slices as hex substrings and the sha256
    feature from first principles. Scale shape: both UDF stages are
    narrow Arrow passes, the argmax is one window shuffle on
    media_id."""
    from pyspark.sql.window import Window

    frames = MM.sample_frames(MM.synthesize_media(spark, n=96), every_ms=1000)
    feats = MM.frame_features(frames)
    w = Window.partitionBy("media_id").orderBy(F.col("f0").desc(), "frame_idx")
    wc = Window.partitionBy("media_id")
    return (
        feats.withColumn("rk", F.row_number().over(w))
        .withColumn("n_frames", F.count("*").over(wc))
        .where(F.col("rk") == 1)
        .select(
            "media_id",
            F.col("frame_idx").alias("best_frame"),
            F.round("f0", 9).alias("best_f0"),
            "n_frames",
        )
    )


def _gd_sql_step(k: int) -> str:
    """One unrolled gradient step k -> k+1 over the fx rows (oracle
    side). Expression text mirrors the Spark column chain exactly —
    same op order, so the IEEE results are bit-identical."""
    return f"""
    s{k} AS (
        SELECT label, x1, x2, x3, x4,
               wb + w1*x1 + w2*x2 + w3*x3 + w4*x4 AS z,
               1 + abs(wb + w1*x1 + w2*x2 + w3*x3 + w4*x4) AS dd
        FROM fx CROSS JOIN w{k}),
    r{k} AS (
        SELECT x1, x2, x3, x4,
               label - (0.5 + z / (2*dd)) AS r,
               1 / ((2*dd) * dd) AS ds
        FROM s{k}),
    g{k} AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(round(2*r*ds, 12) AS DECIMAL(28,12))) AS gb,
               SUM(CAST(round(2*r*ds*x1, 12) AS DECIMAL(28,12))) AS g1,
               SUM(CAST(round(2*r*ds*x2, 12) AS DECIMAL(28,12))) AS g2,
               SUM(CAST(round(2*r*ds*x3, 12) AS DECIMAL(28,12))) AS g3,
               SUM(CAST(round(2*r*ds*x4, 12) AS DECIMAL(28,12))) AS g4
        FROM r{k}),
    w{k + 1} AS (
        SELECT round(wb + CAST(gb AS DOUBLE) / n, 12) AS wb,
               round(w1 + CAST(g1 AS DOUBLE) / n, 12) AS w1,
               round(w2 + CAST(g2 AS DOUBLE) / n, 12) AS w2,
               round(w3 + CAST(g3 AS DOUBLE) / n, 12) AS w3,
               round(w4 + CAST(g4 AS DOUBLE) / n, 12) AS w4
        FROM g{k} CROSS JOIN w{k})"""


_GD_STEPS = 3

_Q168_SQL = (
    "WITH feats AS (" + _RETRIEVAL_FEATURES_SQL + "),\n"
    """fx AS (
        SELECT label,
               CAST(overlap AS DOUBLE) / 10.0 AS x1,
               jaccard AS x2,
               CAST(tf_dot AS DOUBLE) / 50.0 AS x3,
               CAST(rare_overlap AS DOUBLE) / 5.0 AS x4
        FROM feats),
    w0 AS (SELECT 0.0 AS wb, 0.0 AS w1, 0.0 AS w2,
                  0.0 AS w3, 0.0 AS w4),"""
    + ",".join(_gd_sql_step(k) for k in range(_GD_STEPS))
    + f"""
    , final AS (
        SELECT label,
               wb + w1*x1 + w2*x2 + w3*x3 + w4*x4 AS z
        FROM fx CROSS JOIN w{_GD_STEPS})
    SELECT round(wb, 9) AS w_bias, round(w1, 9) AS w_overlap,
           round(w2, 9) AS w_jaccard, round(w3, 9) AS w_tfdot,
           round(w4, 9) AS w_rare,
           (SELECT COUNT(*) FROM final) AS n_pairs,
           (SELECT CAST(SUM(CASE WHEN (z > 0) = (label > 0.5)
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM final) AS n_correct
    FROM w{_GD_STEPS}
    """
)


@register(
    "q168_retrieval_gd_training",
    sql=_Q168_SQL,
    tags=("ml", "retrieval", "training", "iterative"),
)
def q168_retrieval_gd_training(spark, sf_dir):
    """Hash-checked TRAINED retrieval scorer — the upgrade that closes
    q72's 'training itself is rows-only' gap (MLlib LR's internal
    optimizer isn't SQL-reproducible; this is). A linear relevance
    model over the q72a feature matrix is trained by 3 unrolled
    full-batch gradient steps on squared loss with a RATIONAL
    sigmoid-like link σ̃(z) = 0.5 + z/(2(1+|z|)) — every op is one
    IEEE +,*,/,abs, so both engines compute bit-identical gradients
    (no libm exp), and each step's gradient terms are quantized to
    DECIMAL(28,12) before the exact mean (the q139 quantized-iteration
    discipline), so partial-agg order can't drift the weights. The
    oracle unrolls the identical 3 steps as chained CTEs. Output:
    final weights + training accuracy (z>0 ⇔ σ̃>0.5). Scale: each
    step is one broadcast of 5 weights + one partial-agg scan of the
    feature table — gradient descent as 3 map-reduce passes, the
    textbook distributed-GD shape.

    Optimization round 16 (guide §2.6/§5, the q263 discipline): each
    step used to localCheckpoint a 1-row weight table and crossJoin
    it back (a broadcast exchange + BroadcastNestedLoopJoin per
    reference). Now the step's gradient job COLLECTS the updated
    5-double weight row — Spark evaluates the identical round-at-12
    update expressions inside the collect, the driver only ferries
    the literal doubles into the next step's projection (exact IEEE
    bits re-injected via lit), so the weights are bit-identical and
    the per-step plan is scan->project->partial-agg with no join at
    all. Same number of passes over fx; strictly less per-step
    machinery."""
    feats = q72a_retrieval_features(spark, sf_dir).transform(_ckpt)
    fx = feats.select(
        "label",
        (F.col("overlap").cast("double") / 10.0).alias("x1"),
        F.col("jaccard").alias("x2"),
        (F.col("tf_dot").cast("double") / 50.0).alias("x3"),
        (F.col("rare_overlap").cast("double") / 5.0).alias("x4"),
    )
    names = ["wb", "w1", "w2", "w3", "w4"]
    w = {c: 0.0 for c in names}

    def wlit(c):
        return F.lit(w[c]).cast("double")

    def z_col():
        return (
            wlit("wb")
            + wlit("w1") * F.col("x1")
            + wlit("w2") * F.col("x2")
            + wlit("w3") * F.col("x3")
            + wlit("w4") * F.col("x4")
        )

    def gterm(x=None):
        base = F.lit(2.0) * F.col("r") * F.col("ds")
        if x is not None:
            base = base * F.col(x)
        return F.sum(F.round(base, 12).cast("decimal(28,12)"))

    pairs_wg = [("wb", "gb"), ("w1", "g1"), ("w2", "g2"),
                ("w3", "g3"), ("w4", "g4")]
    for _ in range(_GD_STEPS):
        s = fx.select(
            "label", "x1", "x2", "x3", "x4",
            z_col().alias("z"),
            (F.lit(1) + F.abs(z_col())).alias("dd"),
        )
        r = s.select(
            "x1", "x2", "x3", "x4",
            (
                F.col("label")
                - (F.lit(0.5) + F.col("z") / (F.lit(2) * F.col("dd")))
            ).alias("r"),
            (
                F.lit(1)
                / ((F.lit(2) * F.col("dd")) * F.col("dd"))
            ).alias("ds"),
        )
        g = r.agg(
            F.count("*").alias("n"),
            gterm().alias("gb"),
            gterm("x1").alias("g1"),
            gterm("x2").alias("g2"),
            gterm("x3").alias("g3"),
            gterm("x4").alias("g4"),
        )
        row = g.select(
            *[
                F.round(
                    wlit(wc) + F.col(gc).cast("double") / F.col("n"), 12
                ).alias(wc)
                for wc, gc in pairs_wg
            ]
        ).collect()[0]
        w = {c: row[c] for c in names}

    final = fx.select("label", z_col().alias("z"))
    acc = final.agg(
        F.count("*").alias("n_pairs"),
        F.sum(
            ((F.col("z") > 0) == (F.col("label") > 0.5)).cast("int")
        )
        .cast("bigint")
        .alias("n_correct"),
    )
    return acc.select(
        F.round(wlit("wb"), 9).alias("w_bias"),
        F.round(wlit("w1"), 9).alias("w_overlap"),
        F.round(wlit("w2"), 9).alias("w_jaccard"),
        F.round(wlit("w3"), 9).alias("w_tfdot"),
        F.round(wlit("w4"), 9).alias("w_rare"),
        "n_pairs",
        "n_correct",
    )


@register(
    "q213_image_decode_stats",
    sql="""
    WITH p AS (
        SELECT doc_id, rpad(substr(text, 1, 64), 64, 'x') AS s
        FROM documents WHERE text IS NOT NULL),
    u AS (
        SELECT doc_id, i, ord(substr(s, i, 1)) AS b
        FROM p, (SELECT unnest(generate_series(1, 64)) AS i) g)
    SELECT doc_id,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           round(SUM(b) / 64.0, 6) AS mean_px,
           round(SUM(CASE WHEN ((i-1) // 8) % 2 = 0
                           AND ((i-1) % 8) % 2 = 0
                          THEN b END) / 16.0, 6) AS mean_resized
    FROM u GROUP BY doc_id
    """,
    tags=("multimodal", "decode"),
)
def q213_image_decode_stats(spark, sf_dir):
    """REAL image decode, oracle-checked end to end (closes the gap
    where multimodal parity only covered fake-kernel arithmetic): each
    document's first 64 ASCII chars become the pixel plane of an 8x8
    binary PGM (P5) payload; the stdlib codec (operators/imagecodec.py)
    parses the header, decodes the plane, and nearest-neighbor-resizes
    to 4x4 — and because PGM pixels ARE the text bytes, DuckDB can
    recompute both the full-plane mean and the resized mean (the
    resize picks exactly the even (row, col) positions: src index =
    dst*8//4 = 2*dst) from ord() arithmetic with no image code at all.
    Integer pixel sums divide by constants, so the doubles agree
    bit-for-bit. Scale shape: payload construction is codegen'd
    string/binary concat; decode runs in Arrow-batched mapInPandas
    with per-image cost bounded by the 75-byte payload; the output is
    one row per document — no shuffle anywhere until a downstream agg
    asks for one."""
    from rc_rag_spark.sources import table as _table

    d = _table(spark, sf_dir, "documents")
    px = F.rpad(F.substring("text", 1, 64), 64, "x")
    media = d.select(
        "doc_id",
        F.concat(
            F.encode(F.lit("P5\n8 8\n255\n"), "UTF-8"),
            F.encode(px, "UTF-8"),
        ).alias("payload"),
    )

    def run(batches):
        import pandas as pd

        from rc_rag_spark.operators import imagecodec

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "mean_px": [], "mean_resized": [],
            }
            for _, row in pdf.iterrows():
                if row["payload"] is None:
                    continue  # missing blob (NULL payload): no media to decode
                img = imagecodec.decode(bytes(row["payload"]))
                small = img.resize((4, 4))
                out["doc_id"].append(row["doc_id"])
                out["width"].append(img.size[0])
                out["height"].append(img.size[1])
                # exact integer sums / constant: bit-identical to SQL
                out["mean_px"].append(sum(img.data) / 64.0)
                out["mean_resized"].append(sum(small.data) / 16.0)
            yield pd.DataFrame(out)

    out = media.mapInPandas(
        run,
        "doc_id long, width int, height int, "
        "mean_px double, mean_resized double",
    )
    return out.select(
        "doc_id", "width", "height",
        F.round("mean_px", 6).alias("mean_px"),
        F.round("mean_resized", 6).alias("mean_resized"),
    )


@register(
    "q215_audio_decode_stats",
    sql="""
    WITH p AS (
        SELECT doc_id, rpad(substr(text, 1, 64), 64, 'x') AS s
        FROM documents WHERE text IS NOT NULL),
    u AS (
        SELECT doc_id, i, ord(substr(s, i, 1)) AS b
        FROM p, (SELECT unnest(generate_series(1, 64)) AS i) g)
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(64 AS INTEGER) AS n_samples,
           CAST(8 AS INTEGER) AS duration_ms,
           round(SUM(b) / 64.0, 6) AS mean_amp,
           round(SUM(b * b) / 64.0, 6) AS mean_sq,
           CAST(MAX(b) AS INTEGER) AS peak,
           round(SUM(CASE WHEN (i - 1) % 4 = 0 THEN b END) / 16.0, 6)
               AS mean_resampled
    FROM u GROUP BY doc_id
    """,
    tags=("multimodal", "decode"),
)
def q215_audio_decode_stats(spark, sf_dir):
    """REAL audio decode, oracle-checked end to end (closes the last
    multimodal stub — the q213 move applied to sound): each document's
    first 64 ASCII chars become the sample plane of an 8-bit PCM mono
    8 kHz RIFF/WAVE payload; the stdlib codec
    (operators/audiocodec.py) walks the chunks, decodes the samples,
    and nearest-neighbor-resamples to 2 kHz — and because 8-bit PCM
    samples ARE the text bytes, DuckDB recomputes amplitude mean,
    power (mean of b²), peak, and the resampled mean (the resample
    picks src frame i*64//16 = 4i, i.e. every 4th sample) from ord()
    arithmetic with no audio code at all. Integer sums divide by
    constants, so the doubles agree bit-for-bit. Scale shape: payload
    construction is codegen'd binary concat (the 44-byte header is a
    binary literal); decode runs in Arrow-batched mapInPandas with
    per-clip cost bounded by the 108-byte payload; one row out per
    document — no shuffle until a downstream agg asks for one.
    Reference parity: /root/reference/code/utils.py is text-only; this
    is the brief's multimodal mandate, not a reference operator."""
    import struct as _struct

    from rc_rag_spark.sources import table as _table

    header = (
        b"RIFF" + _struct.pack("<I", 36 + 64) + b"WAVE"
        + b"fmt " + _struct.pack("<I", 16)
        + _struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        + b"data" + _struct.pack("<I", 64)
    )
    d = _table(spark, sf_dir, "documents")
    px = F.rpad(F.substring("text", 1, 64), 64, "x")
    media = d.select(
        "doc_id",
        F.concat(F.lit(header), F.encode(px, "UTF-8")).alias("payload"),
    )

    def run(batches):
        import pandas as pd

        from rc_rag_spark.operators import audiocodec

        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "duration_ms": [], "mean_amp": [], "mean_sq": [],
                "peak": [], "mean_resampled": [],
            }
            for _, row in pdf.iterrows():
                if row["payload"] is None:
                    continue  # missing blob (NULL payload): no media to decode
                clip = audiocodec.decode(bytes(row["payload"]))
                small = clip.resample(2000)
                out["doc_id"].append(row["doc_id"])
                out["sample_rate"].append(clip.sample_rate)
                out["n_samples"].append(len(clip.samples))
                out["duration_ms"].append(clip.duration_ms)
                # exact integer sums / constant: bit-identical to SQL
                out["mean_amp"].append(sum(clip.samples) / 64.0)
                out["mean_sq"].append(
                    sum(s * s for s in clip.samples) / 64.0
                )
                out["peak"].append(max(clip.samples))
                out["mean_resampled"].append(sum(small.samples) / 16.0)
            yield pd.DataFrame(out)

    out = media.mapInPandas(
        run,
        "doc_id long, sample_rate int, n_samples int, duration_ms int, "
        "mean_amp double, mean_sq double, peak int, "
        "mean_resampled double",
    )
    return out.select(
        "doc_id", "sample_rate", "n_samples", "duration_ms",
        F.round("mean_amp", 6).alias("mean_amp"),
        F.round("mean_sq", 6).alias("mean_sq"),
        "peak",
        F.round("mean_resampled", 6).alias("mean_resampled"),
    )


@register(
    "q216_audio_stereo_downmix",
    sql="""
    WITH p AS (
        SELECT doc_id, rpad(substr(text, 1, 64), 64, 'x') AS s
        FROM documents WHERE text IS NOT NULL),
    v AS (
        SELECT doc_id, f,
               (ord(substr(s, f, 1)) - 100) * 257 AS l,
               (ord(substr(s, 32 + f, 1)) - 100) * 257 AS r
        FROM p, (SELECT unnest(generate_series(1, 32)) AS f) g),
    m AS (
        SELECT doc_id, f, l, r,
               CAST(floor((l + r) / 2.0) AS BIGINT) AS mono
        FROM v)
    SELECT doc_id,
           CAST(32 AS INTEGER) AS n_frames,
           round(SUM(mono) / 32.0, 6) AS mean_mono,
           round(SUM(l * l + r * r) / 64.0, 6) AS mean_sq,
           CAST(MAX(greatest(abs(l), abs(r))) AS INTEGER) AS peak_abs,
           round(SUM(CASE WHEN (f - 1) % 4 = 0 THEN mono END) / 8.0, 6)
               AS mean_resampled
    FROM m GROUP BY doc_id
    """,
    tags=("multimodal", "decode"),
)
def q216_audio_stereo_downmix(spark, sf_dir):
    """Signed 16-bit STEREO WAV through the full codec round trip —
    covers the paths q215's unsigned-8-bit-mono query can't: int16
    little-endian sample packing/unpacking with negative values,
    channel interleaving, floor-division downmix, and resample over
    multi-channel frames. Each document's first 64 ASCII chars become
    two 32-sample channels (sample = (byte-100)·257, spanning
    -17476..+6682 so sign handling is exercised); the executor
    ENCODES a real RIFF container (audiocodec.encode_wav), DECODES it
    back (audiocodec.decode), downmixes to mono (floor mean — Python
    // is floor; the oracle spells floor((l+r)/2.0) because DuckDB's
    // truncates toward zero), and resamples 8 kHz -> 2 kHz (frame
    i*32//8 = 4i). DuckDB recomputes every stat from ord() arithmetic
    — integer sums over constants, bit-identical doubles. Scale
    shape: one Arrow-batched mapInPandas pass, ~172-byte payloads,
    one row out per document, no shuffle."""
    from rc_rag_spark.sources import table as _table

    d = _table(spark, sf_dir, "documents")
    src = d.select(
        "doc_id", F.rpad(F.substring("text", 1, 64), 64, "x").alias("s")
    )

    def run(batches):
        import pandas as pd

        from rc_rag_spark.operators import audiocodec

        for pdf in batches:
            out = {
                "doc_id": [], "n_frames": [], "mean_mono": [],
                "mean_sq": [], "peak_abs": [], "mean_resampled": [],
            }
            for _, row in pdf.iterrows():
                if row["s"] is None:
                    continue  # NULL text: no samples to synthesize
                b = row["s"].encode("utf-8")
                left = [(b[i] - 100) * 257 for i in range(32)]
                right = [(b[32 + i] - 100) * 257 for i in range(32)]
                inter = [x for lr in zip(left, right) for x in lr]
                wav = audiocodec.encode_wav(
                    audiocodec.SimpleAudio(8000, 2, 2, inter)
                )
                clip = audiocodec.decode(wav)  # real container round trip
                mono = clip.to_mono()
                small = mono.resample(2000)
                out["doc_id"].append(row["doc_id"])
                out["n_frames"].append(clip.n_frames)
                out["mean_mono"].append(sum(mono.samples) / 32.0)
                out["mean_sq"].append(
                    sum(s * s for s in clip.samples) / 64.0
                )
                out["peak_abs"].append(max(abs(s) for s in clip.samples))
                out["mean_resampled"].append(sum(small.samples) / 8.0)
            yield pd.DataFrame(out)

    out = src.mapInPandas(
        run,
        "doc_id long, n_frames int, mean_mono double, mean_sq double, "
        "peak_abs int, mean_resampled double",
    )
    return out.select(
        "doc_id", "n_frames",
        F.round("mean_mono", 6).alias("mean_mono"),
        F.round("mean_sq", 6).alias("mean_sq"),
        "peak_abs",
        F.round("mean_resampled", 6).alias("mean_resampled"),
    )


@register(
    "q218_video_decode_stats",
    sql="""
    WITH p AS (
        SELECT doc_id, rpad(substr(text, 1, 128), 128, 'x') AS s
        FROM documents WHERE text IS NOT NULL),
    u AS (
        SELECT doc_id, i, ord(substr(s, i, 1)) AS b
        FROM p, (SELECT unnest(generate_series(1, 128)) AS i) g),
    pair AS (
        SELECT a.doc_id, a.i, a.b AS b0, c.b AS b1
        FROM u a JOIN u c ON c.doc_id = a.doc_id AND c.i = a.i + 64
        WHERE a.i <= 64)
    SELECT doc_id,
           CAST(2 AS INTEGER) AS n_frames,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(80 AS INTEGER) AS duration_ms,
           round(SUM(b0) / 64.0, 6) AS mean_f0,
           round(SUM(b1) / 64.0, 6) AS mean_f1,
           round(SUM(abs(b1 - b0)) / 64.0, 6) AS motion,
           round(SUM(CASE WHEN ((i - 1) // 8) % 2 = 0
                           AND ((i - 1) % 8) % 2 = 0
                          THEN b1 END) / 16.0, 6) AS mean_resized_f1
    FROM pair GROUP BY doc_id
    """,
    tags=("multimodal", "decode"),
)
def q218_video_decode_stats(spark, sf_dir):
    """REAL video decode, oracle-checked end to end — the q213/q215
    move applied to the third modality: each document's first 128
    ASCII chars become the two 8x8 luma planes of a YUV4MPEG2 clip
    (25 fps, Cmono — the uncompressed interchange format ffmpeg emits
    with `-f yuv4mpeg`); the stdlib codec (operators/videocodec.py)
    parses the stream header, splits the FRAME records, and hands back
    SimpleImage rasters, from which per-frame means, the
    nearest-neighbor 4x4 resize of frame 1 (src index 2*dst — even
    (row, col) positions), and a mean-absolute-difference MOTION
    metric (the keyframe-selection signal) are computed. Because mono
    Y4M pixels ARE the text bytes, DuckDB recomputes everything from
    ord() arithmetic with a positional self-join (i vs i+64) and no
    video code at all; integer sums over constants keep the doubles
    bit-identical. Scale shape: payload construction is codegen'd
    binary concat; decode runs in Arrow-batched mapInPandas with
    per-clip cost bounded by the 177-byte payload; one row out per
    document — no shuffle until a downstream agg asks for one."""
    from rc_rag_spark.sources import table as _table

    d = _table(spark, sf_dir, "documents")
    px = F.rpad(F.substring("text", 1, 128), 128, "x")
    media = d.select(
        "doc_id",
        F.concat(
            F.encode(F.lit("YUV4MPEG2 W8 H8 F25:1 Ip A1:1 Cmono\n"), "UTF-8"),
            F.encode(F.lit("FRAME\n"), "UTF-8"),
            F.encode(F.substring(px, 1, 64), "UTF-8"),
            F.encode(F.lit("FRAME\n"), "UTF-8"),
            F.encode(F.substring(px, 65, 64), "UTF-8"),
        ).alias("payload"),
    )

    def run(batches):
        import pandas as pd

        from rc_rag_spark.operators import videocodec

        for pdf in batches:
            out = {
                "doc_id": [], "n_frames": [], "width": [], "height": [],
                "duration_ms": [], "mean_f0": [], "mean_f1": [],
                "motion": [], "mean_resized_f1": [],
            }
            for _, row in pdf.iterrows():
                if row["payload"] is None:
                    continue  # missing blob (NULL payload): no media to decode
                clip = videocodec.decode(bytes(row["payload"]))
                f0, f1 = clip.frames[0].data, clip.frames[1].data
                small = clip.frames[1].resize((4, 4)).data
                out["doc_id"].append(row["doc_id"])
                out["n_frames"].append(clip.n_frames)
                out["width"].append(clip.size[0])
                out["height"].append(clip.size[1])
                out["duration_ms"].append(clip.duration_ms)
                # exact integer sums / constant: bit-identical to SQL
                out["mean_f0"].append(sum(f0) / 64.0)
                out["mean_f1"].append(sum(f1) / 64.0)
                out["motion"].append(
                    sum(abs(a - b) for a, b in zip(f0, f1)) / 64.0
                )
                out["mean_resized_f1"].append(sum(small) / 16.0)
            yield pd.DataFrame(out)

    out = media.mapInPandas(
        run,
        "doc_id long, n_frames int, width int, height int, "
        "duration_ms int, mean_f0 double, mean_f1 double, "
        "motion double, mean_resized_f1 double",
    )
    return out.select(
        "doc_id", "n_frames", "width", "height", "duration_ms",
        F.round("mean_f0", 6).alias("mean_f0"),
        F.round("mean_f1", 6).alias("mean_f1"),
        F.round("motion", 6).alias("motion"),
        F.round("mean_resized_f1", 6).alias("mean_resized_f1"),
    )


@register(
    "q219_video_keyframe_real",
    sql="""
    WITH p AS (
        SELECT doc_id, rpad(substr(text, 1, 256), 256, 'x') AS s
        FROM documents WHERE text IS NOT NULL),
    u AS (
        SELECT doc_id, i, ord(substr(s, i, 1)) AS b
        FROM p, (SELECT unnest(generate_series(1, 256)) AS i) g),
    f AS (
        SELECT doc_id, CAST((i - 1) // 64 AS INTEGER) AS k,
               ((i - 1) % 64) + 1 AS j, b
        FROM u),
    m AS (
        SELECT a.doc_id, a.k AS k,
               round(SUM(abs(a.b - c.b)) / 64.0, 6) AS motion
        FROM f a JOIN f c ON c.doc_id = a.doc_id AND c.j = a.j
                         AND c.k = a.k - 1
        WHERE a.k >= 1
        GROUP BY a.doc_id, a.k)
    SELECT doc_id, CAST(k AS INTEGER) AS keyframe_idx,
           motion AS max_motion
    FROM (SELECT doc_id, k, motion,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY motion DESC, k) AS rn
          FROM m)
    WHERE rn = 1
    """,
    tags=("multimodal", "decode", "window"),
)
def q219_video_keyframe_real(spark, sf_dir):
    """Keyframe selection over REAL decoded frames — the multi-stage
    composition q143 runs on fake features, now on actual pixels:
    each document's first 256 chars become a 4-frame 8x8 mono Y4M
    clip; the GENERIC sample_frames operator takes its real-decode
    branch (operators/videocodec.py) and emits the four luma planes
    as PGM payloads; consecutive frames meet in a (media_id, k)
    equi-join; an Arrow-batched pandas UDF decodes both PGMs
    (operators/imagecodec.py) and scores mean-absolute-difference
    motion; a per-clip window argmax (motion DESC, k ASC tiebreak)
    picks the keyframe. DuckDB recomputes the whole pipeline from
    ord() arithmetic — frame k is chars 64k+1..64k+64, so the motion
    join is a positional self-join and the argmax the same window.
    Scale shape: explode is Arrow-batched with ~75-byte frame
    payloads, the self-join is a key-bounded equi-join (4 rows per
    clip), and the window partitions by clip — no global sort, no
    driver round-trip."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    from rc_rag_spark.operators import multimodal as MM
    from rc_rag_spark.sources import table as _table

    d = _table(spark, sf_dir, "documents")
    px = F.rpad(F.substring("text", 1, 256), 256, "x")
    parts = [F.encode(F.lit("YUV4MPEG2 W8 H8 F25:1 Ip A1:1 Cmono\n"), "UTF-8")]
    for k in range(4):
        parts.append(F.encode(F.lit("FRAME\n"), "UTF-8"))
        parts.append(F.encode(F.substring(px, 64 * k + 1, 64), "UTF-8"))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.concat(*parts).alias("payload"),
        F.struct(
            F.lit(8).alias("width"), F.lit(8).alias("height"),
            F.lit(160).alias("duration_ms"), F.lit("y4m").alias("codec"),
        ).alias("meta"),
    )
    # 25 fps x 40 ms sampling = every source frame, re-encoded as PGM
    frames = MM.sample_frames(media, every_ms=40)

    @pandas_udf("double")
    def mad(prv, cur):
        import pandas as pd

        from rc_rag_spark.operators import imagecodec

        out = []
        for a, b in zip(prv, cur):
            fa = imagecodec.decode_pnm(bytes(a)).data
            fb = imagecodec.decode_pnm(bytes(b)).data
            # exact integer sum / constant: bit-identical to SQL
            out.append(sum(abs(x - y) for x, y in zip(fa, fb)) / 64.0)
        return pd.Series(out)

    cur = frames.select(
        "media_id", F.col("frame_idx").alias("k"),
        F.col("frame_payload").alias("cur"),
    )
    prv = frames.select(
        "media_id", (F.col("frame_idx") + 1).alias("k"),
        F.col("frame_payload").alias("prv"),
    )
    motion = cur.join(prv, ["media_id", "k"]).select(
        "media_id", "k", F.round(mad("prv", "cur"), 6).alias("motion")
    )
    w = Window.partitionBy("media_id").orderBy(
        F.col("motion").desc(), F.col("k")
    )
    return (
        motion.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("media_id").alias("doc_id"),
            F.col("k").cast("int").alias("keyframe_idx"),
            F.col("motion").alias("max_motion"),
        )
    )


@register(
    "q220_multimodal_dispatch",
    sql="""
    WITH p AS (
        SELECT doc_id, rpad(substr(text, 1, 128), 128, 'x') AS s
        FROM documents WHERE text IS NOT NULL),
    u AS (
        SELECT doc_id, i, ord(substr(s, i, 1)) AS b
        FROM p, (SELECT unnest(generate_series(1, 128)) AS i) g),
    agg AS (
        SELECT doc_id,
               SUM(CASE WHEN i <= 64 THEN b END) AS s64,
               MAX(CASE WHEN i <= 64 THEN b END) AS m64,
               SUM(b) AS s128
        FROM u GROUP BY doc_id),
    mot AS (
        SELECT a.doc_id,
               SUM(abs(c.b - a.b)) AS sdiff
        FROM u a JOIN u c ON c.doc_id = a.doc_id AND c.i = a.i + 64
        WHERE a.i <= 64 GROUP BY a.doc_id)
    SELECT g.doc_id,
           CASE g.doc_id % 3 WHEN 0 THEN 'image'
                             WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind_detected,
           round(CASE g.doc_id % 3
                 WHEN 0 THEN g.s64 / 64.0
                 WHEN 1 THEN g.s64 / 64.0
                 ELSE g.s128 / 128.0 END, 6) AS f_level,
           round(CASE g.doc_id % 3
                 WHEN 0 THEN CAST(g.m64 AS DOUBLE)
                 WHEN 1 THEN CAST(g.m64 AS DOUBLE)
                 ELSE m.sdiff / 64.0 END, 6) AS f_shape
    FROM agg g JOIN mot m ON m.doc_id = g.doc_id
    UNION ALL
    SELECT doc_id, 'unknown' AS kind_detected,
           CAST(NULL AS DOUBLE) AS f_level,
           CAST(NULL AS DOUBLE) AS f_shape
    FROM documents WHERE text IS NULL
    """,
    tags=("multimodal", "decode", "dispatch"),
)
def q220_multimodal_dispatch(spark, sf_dir):
    """Mixed-modality corpus through ONE dispatching pass
    (extract_features_real): documents become PGM images (doc_id%3=0,
    64 chars), 8-bit PCM WAVs (=1, 64 chars), or 2-frame Y4M clips
    (=2, 128 chars); a single Arrow mapInPandas sniffs each
    container's magic, decodes with the matching stdlib codec, and
    emits [level, shape] features — mean pixel/sample/luma and max
    pixel/sample or inter-frame motion. The oracle recomputes all
    three branches from ord() arithmetic keyed on doc_id % 3 (the
    image and audio branches share numbers by construction — the
    DISPATCH is what distinguishes them, pinned by kind_detected).
    Scale shape: payload synthesis is codegen'd binary concat chosen
    by a CASE; decode cost is bounded per payload; one row out per
    document, no shuffle."""
    import struct as _struct

    from rc_rag_spark.operators import multimodal as MM
    from rc_rag_spark.sources import table as _table

    wav_header = (
        b"RIFF" + _struct.pack("<I", 36 + 64) + b"WAVE"
        + b"fmt " + _struct.pack("<I", 16)
        + _struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        + b"data" + _struct.pack("<I", 64)
    )
    d = _table(spark, sf_dir, "documents")
    px64 = F.rpad(F.substring("text", 1, 64), 64, "x")
    px128 = F.rpad(F.substring("text", 1, 128), 128, "x")
    image = F.concat(
        F.encode(F.lit("P5\n8 8\n255\n"), "UTF-8"), F.encode(px64, "UTF-8")
    )
    audio = F.concat(F.lit(wav_header), F.encode(px64, "UTF-8"))
    video = F.concat(
        F.encode(F.lit("YUV4MPEG2 W8 H8 F25:1 Ip A1:1 Cmono\n"), "UTF-8"),
        F.encode(F.lit("FRAME\n"), "UTF-8"),
        F.encode(F.substring(px128, 1, 64), "UTF-8"),
        F.encode(F.lit("FRAME\n"), "UTF-8"),
        F.encode(F.substring(px128, 65, 64), "UTF-8"),
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("media").alias("kind"),
        F.when(F.col("doc_id") % 3 == 0, image)
        .when(F.col("doc_id") % 3 == 1, audio)
        .otherwise(video)
        .alias("payload"),
        F.struct(
            F.lit(8).alias("width"), F.lit(8).alias("height"),
            F.lit(0).alias("duration_ms"), F.lit("mixed").alias("codec"),
        ).alias("meta"),
    )
    feats = MM.extract_features_real(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "kind_detected",
        F.round(F.element_at("feature", 1), 6).alias("f_level"),
        F.round(F.element_at("feature", 2), 6).alias("f_shape"),
    )


# --------------------------------------------------------------------------
# q258 — synchronous label propagation (community detection), 3 unrolled
# iterations over the customer↔supplier trade graph

_LPA_ITERS = 3

_LPA_BASE = """
    e0 AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    edges AS (
        SELECT src, dst FROM e0
        UNION ALL
        SELECT dst, src FROM e0),
    l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges)"""


def _lpa_oracle_sql() -> str:
    ctes = [_LPA_BASE]
    for k in range(1, _LPA_ITERS + 1):
        ctes.append(f"""
    n{k} AS (
        SELECT e.src, l.lbl, COUNT(*) AS c
        FROM edges e JOIN l{k - 1} l ON e.dst = l.node
        GROUP BY e.src, l.lbl),
    l{k} AS (
        SELECT src AS node, lbl
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY src ORDER BY c DESC, lbl) AS rn
              FROM n{k})
        WHERE rn = 1)""")
    return (
        "WITH " + ",".join(ctes) + f"""
    SELECT lbl AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN node LIKE 'c%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN node LIKE 's%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_suppliers
    FROM l{_LPA_ITERS} GROUP BY lbl
    """
    )


@register(
    "q258_label_propagation",
    sql=_lpa_oracle_sql(),
    tags=("graph", "community", "iterative"),
)
def q258_label_propagation(spark, sf_dir):
    """Synchronous label propagation (community detection) — the
    missing sibling of the corpus's other graph kernels (q139
    PageRank = eigenvector, q102 min-label = connectivity): every
    node starts as its own label, and each of 3 unrolled iterations
    reassigns every node to its neighbors' MAJORITY label. LPA is
    notoriously nondeterministic in textbook form; here it is fully
    pinned — synchronous updates (iteration k reads only k-1's
    labels) and total tie-break (max count, then lexicographically
    smallest label) — so the oracle's identical unrolled walk
    hash-matches. Per iteration the plan is exactly one equi-join of
    the edge list against the |nodes|-row label table plus one
    (src, lbl) count and one per-src top-1 window — the same
    join+partial-agg shuffle shape as a PageRank step, so the 100 TB
    cost driver is the edge list; pre-partitioning edges by dst lets
    every iteration reuse one exchange (the localCheckpoint pins the
    deduped edges exactly like q139). Output: per-community size and
    bipartite composition."""
    from rc_rag_spark.sources import table
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(_ckpt)
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w = Window.partitionBy("src").orderBy(F.col("c").desc(), "lbl")
    for _ in range(_LPA_ITERS):
        nb = edges.join(
            labels, edges.dst == labels.node
        ).select("src", "lbl")
        cnt = nb.groupBy("src", "lbl").agg(F.count("*").alias("c"))
        labels = (
            cnt.select("src", "lbl", F.row_number().over(w).alias("rn"))
            .where(F.col("rn") == 1)
            .select(F.col("src").alias("node"), "lbl")
        )
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum(F.col("node").startswith("c").cast("long"))
        .cast("bigint")
        .alias("n_customers"),
        F.sum(F.col("node").startswith("s").cast("long"))
        .cast("bigint")
        .alias("n_suppliers"),
    )


# --------------------------------------------------------------------------
# q265 — perceptual-hash (dHash) image near-dup, banded Hamming join

_DHASH_HEADER = "P5\n9 8\n255\n"


@register(
    "q265_image_dhash_neardup",
    sql="""
    WITH p AS (
        SELECT doc_id, rpad(substr(text, 1, 72), 72, 'x') AS s
        FROM documents WHERE text IS NOT NULL),
    grid AS (
        SELECT doc_id, (k // 8) AS r, (k % 8) AS c
        FROM p, UNNEST(generate_series(0, 63)) AS g(k)),
    bits AS (
        SELECT p.doc_id, (r // 2) AS band_idx,
               CASE WHEN ord(substr(p.s, r * 9 + c + 2, 1))
                         > ord(substr(p.s, r * 9 + c + 1, 1))
                    THEN 1 << ((r % 2) * 8 + c) ELSE 0 END AS bit
        FROM grid JOIN p USING (doc_id)),
    bands AS (
        SELECT doc_id, band_idx,
               CAST(SUM(bit) AS INTEGER) AS val
        FROM bits GROUP BY doc_id, band_idx),
    wide AS (
        SELECT doc_id,
               MAX(CASE WHEN band_idx = 0 THEN val END) AS b0,
               MAX(CASE WHEN band_idx = 1 THEN val END) AS b1,
               MAX(CASE WHEN band_idx = 2 THEN val END) AS b2,
               MAX(CASE WHEN band_idx = 3 THEN val END) AS b3
        FROM bands GROUP BY doc_id),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.val = b.val
         AND a.doc_id < b.doc_id)
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
              + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
              AS INTEGER) AS hamming
    FROM cand c
    JOIN wide wa ON wa.doc_id = c.doc_a
    JOIN wide wb ON wb.doc_id = c.doc_b
    WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
        + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3)) <= 8
    """,
    tags=("multimodal", "dedup", "lsh"),
)
def q265_image_dhash_neardup(spark, sf_dir):
    """Perceptual-hash image near-dup — the multimodal member of the
    dedup family: every document's first 72 chars become the pixel
    plane of a 9x8 binary PGM; the REAL stdlib codec
    (operators/imagecodec.py) decodes it and the classic dHash
    (difference hash) emits one bit per horizontally adjacent pixel
    pair — 64 bits, robust to brightness shifts because only the
    SIGN of the gradient survives. The 64-bit hash splits into 4
    16-bit bands; an equi-join on (band, value) generates candidate
    pairs (the q179 banded-Hamming move on image content), and the
    full Hamming distance — sum of per-band popcounts of XOR — keeps
    pairs <= 8. By pigeonhole the band join is EXACT (recall 1.0)
    for Hamming <= 3: any such pair agrees on >= 1 whole band;
    4 < h <= 8 pairs are best-effort candidates, the standard LSH
    trade. The DuckDB oracle replays decode-free: PGM pixels ARE the
    text bytes, so ord() arithmetic rebuilds the same bands and the
    same popcounts — the real decode path is hash-checked end to
    end. Scale shape: decode + hash in Arrow-batched mapInPandas
    (75-byte payloads); the shuffle carries 4 small ints per image,
    never pixels; candidate volume is sum of band-bucket C(n,2) —
    with 16-bit bands that is n^2/2^17 per band on random content,
    and at billion-image scale you widen to 8 bands of 16 from a
    128-bit hash, the same plan shape."""
    from rc_rag_spark.sources import table as _table

    d = _table(spark, sf_dir, "documents")
    px = F.rpad(F.substring("text", 1, 72), 72, "x")
    media = d.select(
        "doc_id",
        F.concat(
            F.encode(F.lit(_DHASH_HEADER), "UTF-8"), F.encode(px, "UTF-8")
        ).alias("payload"),
    )

    def run(batches):
        import pandas as pd

        from rc_rag_spark.operators import imagecodec

        for pdf in batches:
            out = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for _, row in pdf.iterrows():
                if row["payload"] is None:
                    continue  # missing blob (NULL payload): no media to decode
                img = imagecodec.decode(bytes(row["payload"]))
                w = img.size[0]
                data = img.data
                bands = [0, 0, 0, 0]
                for r in range(8):
                    for c in range(8):
                        if data[r * w + c + 1] > data[r * w + c]:
                            bands[r // 2] |= 1 << ((r % 2) * 8 + c)
                out["doc_id"].append(row["doc_id"])
                for t in range(4):
                    out[f"b{t}"].append(bands[t])
            yield pd.DataFrame(out)

    wide = media.mapInPandas(
        run, "doc_id long, b0 int, b1 int, b2 int, b3 int"
    )
    bands = wide.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("band_idx"), F.col(f"b{t}").alias("val")
                )
                for t in range(4)
            ])
        ).alias("bv"),
    ).select("doc_id", "bv.band_idx", "bv.val")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    wa = wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{t}").alias(f"a{t}") for t in range(4)],
    )
    wb = wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{t}").alias(f"c{t}") for t in range(4)],
    )
    hamming = sum(
        F.bit_count(F.expr(f"a{t} ^ c{t}")) for t in range(4)
    )
    return (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select(
            "doc_a", "doc_b", hamming.cast("int").alias("hamming")
        )
        .where(F.col("hamming") <= 8)
    )


# --------------------------------------------------------------------------
# q268 — audio silence segmentation (real decode -> gaps-and-islands)

_SIL_THRESH = 112   # unsigned 8-bit: |amp-128| < 16  <=>  byte > 112
_SIL_MINRUN = 3


@register(
    "q268_audio_silence_segments",
    sql=f"""
    WITH p AS (
        SELECT doc_id, rpad(substr(text, 1, 64), 64, 'x') AS s
        FROM documents WHERE text IS NOT NULL),
    u AS (
        SELECT doc_id, i, ord(substr(s, i, 1)) AS b
        FROM p, (SELECT unnest(generate_series(1, 64)) AS i) g),
    sil AS (
        SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
                   AS island
        FROM u WHERE b > {_SIL_THRESH}),
    runs AS (
        SELECT doc_id, island,
               CAST(COUNT(*) AS BIGINT) AS len,
               CAST(MIN(i) AS BIGINT) AS start
        FROM sil GROUP BY doc_id, island),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(CASE WHEN len >= {_SIL_MINRUN} THEN 1 END)
                    AS BIGINT) AS n_segments,
               CAST(SUM(len) AS BIGINT) AS total_silent,
               CAST(MAX(len) AS BIGINT) AS longest_run,
               CAST(COALESCE(MIN(CASE WHEN len >= {_SIL_MINRUN}
                                      THEN start END), 0) AS BIGINT)
                   AS first_start
        FROM runs GROUP BY doc_id)
    SELECT p.doc_id,
           COALESCE(a.n_segments, 0) AS n_segments,
           COALESCE(a.total_silent, 0) AS total_silent,
           COALESCE(a.longest_run, 0) AS longest_run,
           COALESCE(a.first_start, 0) AS first_start
    FROM p LEFT JOIN agg a ON a.doc_id = p.doc_id
    """,
    tags=("multimodal", "decode", "segmentation"),
)
def q268_audio_silence_segments(spark, sf_dir):
    """Silence segmentation over REAL decoded audio — the
    voice-activity-detection primitive a speech-data pipeline runs
    before chunking: decode the clip (the q215 8-bit mono WAV byte
    trick, so DuckDB can replay from ord()), mark samples within 16
    of the 128 midline as silent, and extract MAXIMAL silent runs
    (>= {_SIL_MINRUN} samples) — classic gaps-and-islands, but with
    the run detection done sample-local inside the SAME Arrow batch
    that decoded the clip, so no per-sample row ever exists in the
    engine: one row in (payload), one row out (doc_id, segment
    stats). The oracle builds the islands relationally (i minus
    row_number) to pin the exact same runs. Scale shape: decode +
    segmentation cost is linear in clip length inside mapInPandas;
    the only shuffle is whatever the caller aggregates next. At real
    sample rates you'd window the VAD per second and emit (doc_id,
    segment) rows instead — same kernel, coarser rows."""
    import struct as _struct

    header = (
        b"RIFF" + _struct.pack("<I", 36 + 64) + b"WAVE"
        + b"fmt " + _struct.pack("<I", 16)
        + _struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        + b"data" + _struct.pack("<I", 64)
    )
    from rc_rag_spark.sources import table as _table

    d = _table(spark, sf_dir, "documents")
    px = F.rpad(F.substring("text", 1, 64), 64, "x")
    media = d.select(
        "doc_id",
        F.concat(F.lit(header), F.encode(px, "UTF-8")).alias("payload"),
    )

    def run(batches):
        import pandas as pd

        from rc_rag_spark.operators import audiocodec

        for pdf in batches:
            out = {
                "doc_id": [], "n_segments": [], "total_silent": [],
                "longest_run": [], "first_start": [],
            }
            for _, row in pdf.iterrows():
                if row["payload"] is None:
                    continue  # missing blob (NULL payload): no media to decode
                clip = audiocodec.decode(bytes(row["payload"]))
                n_seg = total = longest = first = 0
                run_len = 0
                for idx, s in enumerate(clip.samples, start=1):
                    if s > _SIL_THRESH:
                        run_len += 1
                        total += 1
                        if run_len > longest:
                            longest = run_len
                        if run_len == _SIL_MINRUN:
                            n_seg += 1
                            if first == 0:
                                first = idx - _SIL_MINRUN + 1
                    else:
                        run_len = 0
                out["doc_id"].append(row["doc_id"])
                out["n_segments"].append(n_seg)
                out["total_silent"].append(total)
                out["longest_run"].append(longest)
                out["first_start"].append(first)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run,
        "doc_id long, n_segments long, total_silent long, "
        "longest_run long, first_start long",
    )


# --------------------------------------------------------------------------
# q273 — video scene segmentation (real decode -> MAD cuts -> scenes)

_SCN_FRAMES = 6
_SCN_T = 500   # scene-cut threshold on the 64-px sum of |f_{k+1}-f_k|


@register(
    "q273_video_scene_segments",
    sql=f"""
    WITH p AS (
        SELECT doc_id,
               rpad(substr(text, 1, {_SCN_FRAMES * 64}),
                    {_SCN_FRAMES * 64}, 'x') AS s
        FROM documents WHERE text IS NOT NULL),
    u AS (
        SELECT doc_id, i, ord(substr(s, i, 1)) AS b
        FROM p, (SELECT unnest(generate_series(1,
                      {_SCN_FRAMES * 64})) AS i) g),
    pair AS (
        SELECT a.doc_id, (a.i - 1) // 64 AS k,
               abs(c.b - a.b) AS d
        FROM u a JOIN u c
          ON c.doc_id = a.doc_id AND c.i = a.i + 64
        WHERE a.i <= {(_SCN_FRAMES - 1) * 64}),
    mad AS (
        SELECT doc_id, k, CAST(SUM(d) AS BIGINT) AS mad
        FROM pair GROUP BY doc_id, k),
    cuts AS (
        SELECT doc_id, k, mad,
               CASE WHEN mad > {_SCN_T} THEN 1 ELSE 0 END AS cut
        FROM mad),
    -- frame j belongs to scene_id = number of cuts strictly before j;
    -- frame 0 always opens scene 0
    frames AS (
        SELECT doc_id, j FROM (SELECT DISTINCT doc_id FROM p),
             (SELECT unnest(generate_series(0, {_SCN_FRAMES - 1})) AS j) g),
    assigned AS (
        SELECT f.doc_id, f.j,
               COALESCE(SUM(c.cut), 0) AS scene_id
        FROM frames f LEFT JOIN cuts c
          ON c.doc_id = f.doc_id AND c.k < f.j
        GROUP BY f.doc_id, f.j),
    scenes AS (
        SELECT doc_id, scene_id, COUNT(*) AS scene_len
        FROM assigned GROUP BY doc_id, scene_id)
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_scenes,
           CAST(MAX(s.scene_len) AS BIGINT) AS longest_scene,
           CAST(COALESCE((SELECT MIN(k) + 1 FROM cuts c
                          WHERE c.doc_id = s.doc_id AND c.cut = 1), 0)
                AS BIGINT) AS first_cut,
           CAST((SELECT SUM(mad) FROM mad m WHERE m.doc_id = s.doc_id)
                AS BIGINT) AS total_motion
    FROM scenes s GROUP BY s.doc_id
    """,
    tags=("multimodal", "decode", "segmentation"),
)
def q273_video_scene_segments(spark, sf_dir):
    """Scene segmentation over REAL decoded video — the shot-boundary
    detector a video-data pipeline runs before sampling training
    frames (one keyframe per SCENE beats one per N frames): each
    document's first {_SCN_FRAMES * 64} chars become a
    {_SCN_FRAMES}-frame 8x8 mono Y4M clip; the stdlib codec decodes
    real frames, consecutive frames score mean-absolute-difference,
    and a cut fires where the 64-px MAD sum exceeds {_SCN_T} —
    scenes are the islands between cuts (the q268 audio-VAD move on
    the third modality, completing segmentation coverage across
    image/audio/video). Everything per clip happens INSIDE the Arrow
    batch that decoded it: frame diffs, cut detection, scene
    bookkeeping — one row in, one row out, integer-exact. The DuckDB
    oracle rebuilds frames from ord() arithmetic with a positional
    +64 self-join (the q218 pairing), then assigns frames to scenes
    relationally (scene_id = cuts strictly before the frame). Scale
    shape: at real resolutions the decode+MAD kernel is linear in
    pixels and embarrassingly parallel; only (doc_id, 4 ints) ever
    leave the executor — a 100 TB video corpus segments at scan
    speed with zero shuffle."""
    from rc_rag_spark.sources import table as _table

    d = _table(spark, sf_dir, "documents")
    px = F.rpad(
        F.substring("text", 1, _SCN_FRAMES * 64), _SCN_FRAMES * 64, "x"
    )
    frame_parts = [F.encode(F.lit("YUV4MPEG2 W8 H8 F25:1 Ip A1:1 Cmono\n"),
                            "UTF-8")]
    for k in range(_SCN_FRAMES):
        frame_parts.append(F.encode(F.lit("FRAME\n"), "UTF-8"))
        frame_parts.append(
            F.encode(F.substring(px, k * 64 + 1, 64), "UTF-8")
        )
    media = d.select(
        "doc_id", F.concat(*frame_parts).alias("payload")
    )

    def run(batches):
        import pandas as pd

        from rc_rag_spark.operators import videocodec

        for pdf in batches:
            out = {
                "doc_id": [], "n_scenes": [], "longest_scene": [],
                "first_cut": [], "total_motion": [],
            }
            for _, row in pdf.iterrows():
                if row["payload"] is None:
                    continue  # missing blob (NULL payload): no media to decode
                clip = videocodec.decode(bytes(row["payload"]))
                planes = [f.data for f in clip.frames]
                mads = [
                    sum(
                        abs(b1 - b0)
                        for b0, b1 in zip(planes[k], planes[k + 1])
                    )
                    for k in range(len(planes) - 1)
                ]
                cuts = [k for k, m in enumerate(mads) if m > _SCN_T]
                bounds = [0] + [k + 1 for k in cuts] + [len(planes)]
                lens = [
                    bounds[i + 1] - bounds[i]
                    for i in range(len(bounds) - 1)
                ]
                out["doc_id"].append(row["doc_id"])
                out["n_scenes"].append(len(lens))
                out["longest_scene"].append(max(lens))
                out["first_cut"].append(cuts[0] + 1 if cuts else 0)
                out["total_motion"].append(sum(mads))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run,
        "doc_id long, n_scenes long, longest_scene long, "
        "first_cut long, total_motion long",
    )
