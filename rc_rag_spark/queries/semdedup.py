"""Semantic-dedup batch: SemDeDup, prefix-filter set-similarity join,
and a bigram LM surprisal filter.

Three more first-class training-corpus operators, each with the
100 TB question answered up front:

  q175_semdedup            SemDeDup (Abbas et al. 2023, public): one
                           k-means assignment pass partitions the
                           embedding space, then cosine near-dup
                           removal runs ONLY within clusters — the
                           pairwise stage is an equi-join on cluster
                           id, so the quadratic blow-up is bounded by
                           the largest cluster instead of the corpus.
  q176_prefix_filter_jaccard
                           Exact Jaccard-threshold self-join via
                           prefix filtering (PPJoin family, public):
                           tokens are ordered rarest-first and only
                           each set's first |x|-ceil(t|x|)+1 tokens
                           generate candidates. The oracle spells the
                           naive all-pairs theta join — a genuinely
                           independent construction — while the
                           engine's shape is an ordinary hash-shuffle
                           equi-join on rare tokens that survives a
                           10^9-document corpus.
  q177_bigram_surprisal    Add-one-smoothed bigram LM scored over its
                           own training corpus — the stronger
                           perplexity-proxy quality filter next to
                           q158's unigram LM.
  q178_pq_codes            Product quantization (4 × 16-dim
                           subspaces, 4 codes each): the fine
                           quantizer that completes the ANN
                           index-build story next to q75 IVF and
                           q174 scalar int8.
  q179_srp_signatures      Signed-random-projection LSH: 16-bit sign
                           signatures, banded candidate join, exact
                           popcount-Hamming verify — the cosine-LSH
                           family member.
  q180_cluster_balanced_sample
                           Diversity-preserving subsample: ≈T rows
                           per k-means cluster via a pure-integer
                           hash-rate predicate, no per-cluster sort.

Determinism discipline follows queries/core.py: integer counts
everywhere possible; every float term (distances, -ln p) is quantized
to DECIMAL before an order-independent exact SUM; threshold compares
happen far from float boundaries (planted dups sit at cosine ~= 1 /
Jaccard >= 0.9 vs a background well below the cut).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.functions.text import simple_tokenize
from rc_rag_spark.functions.vectors import dot, l2_norm
from rc_rag_spark.operators.dedup import shingles_from_tokens
from rc_rag_spark.queries.core import register
from rc_rag_spark.queries.dedup_sim import _sql_minhash_grams
from rc_rag_spark.sources import table, wide_table
from rc_rag_spark.checkpoints import ckpt as _ckpt


# --------------------------------------------------------------------------
# q175 — SemDeDup: cluster-then-dedup over embeddings ∪ planted copies.

_SD_K = 4            # clusters; seeds = embeddings of vec_id 0..k-1


def _assign_packed(corpus_v, k):
    """Shared packed k-means assignment (round-7): (vec_id, cid) by
    argmin over the first-k seed vectors, each distance one zip_with +
    exact-decimal fold per (vector, seed) pair — n·k rows through the
    aggregation instead of the exploded form's n·d·k. The fold adds
    the same round-at-1e-12 decimal(28,12) terms, so assignments are
    hash-identical to the chained-CTE oracles. `corpus_v` must carry
    (vec_id, v: array<double>). A NULL vector has no position in the
    space (the r12 engine contract — the oracles' unnest() drops such
    rows for free): without the filter its NULL fold distance would
    row_number into cid 0 (caught by the sfnulls value gate, r13)."""
    corpus_v = corpus_v.where(F.col("v").isNotNull())
    seeds = corpus_v.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("v").alias("cv"),
        F.lit(1).alias("_jk"),
    )
    d = corpus_v.withColumn("_jk", F.lit(1)).join(
        F.broadcast(seeds), "_jk"
    ).select(
        "vec_id", "cid",
        F.aggregate(
            F.zip_with(
                F.col("v"), F.col("cv"),
                lambda x, c: F.round((x - c) * (x - c), 12).cast(
                    "decimal(28,12)"
                ),
            ),
            F.lit(0).cast("decimal(28,12)"),
            lambda acc, t: (acc + t).cast("decimal(28,12)"),
        ).alias("dist"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
_SD_THRESHOLD = 0.95  # cosine cut inside a cluster


@register(
    "q175_semdedup",
    sql="""
    WITH corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE embedding IS NOT NULL
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding::DOUBLE[], x -> x * 1.002) AS v
        FROM embeddings WHERE vec_id % 10 = 0 AND embedding IS NOT NULL
    ),
    x AS (
        SELECT vec_id,
               CAST(generate_subscripts(v, 1) AS INTEGER) AS pos,
               CAST(unnest(v) AS DOUBLE) AS x
        FROM corpus),
    c AS (SELECT CAST(vec_id AS INTEGER) AS cid, pos, x AS c
          FROM x WHERE vec_id < 4),
    d AS (
        SELECT x.vec_id, c.cid,
               SUM(CAST(round((x.x - c.c) * (x.x - c.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM x JOIN c ON c.pos = x.pos
        GROUP BY x.vec_id, c.cid),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d)
        WHERE rn = 1),
    removed AS (
        SELECT DISTINCT ab.vec_id AS vec_id
        FROM assign aa JOIN assign ab
          ON ab.cid = aa.cid AND aa.vec_id < ab.vec_id
        JOIN corpus ca ON ca.vec_id = aa.vec_id
        JOIN corpus cb ON cb.vec_id = ab.vec_id
        WHERE list_dot_product(ca.v, cb.v)
              / (sqrt(list_dot_product(ca.v, ca.v))
                 * sqrt(list_dot_product(cb.v, cb.v))) >= 0.95
    )
    SELECT a.vec_id, a.cid,
           CASE WHEN r.vec_id IS NULL THEN 1 ELSE 0 END AS kept
    FROM assign a LEFT JOIN removed r ON r.vec_id = a.vec_id
    """,
    tags=("dedup", "semantic", "embeddings", "kmeans"),
)
def q175_semdedup(spark, sf_dir):
    """SemDeDup over embeddings ∪ planted scaled copies (vec_id%10==0,
    x*1.002 — cosine is scale-invariant so each copy sits at sim≈1 to
    its source, while random 64-dim pairs stay far below 0.95): one
    k-means assignment pass (exact DECIMAL distances to the k=4 seed
    centroids, argmin with cid tiebreak — the q169 discipline), then
    cosine-threshold pairs are searched ONLY within a cluster and the
    lexicographically-larger member of each pair is dropped (greedy
    min-id representative). Scale: assignment is broadcast(k·d) + one
    partial agg; the pair stage shuffles on cid, so cost is
    Σ|cluster|² not |corpus|² — the whole point of SemDeDup. The
    oracle reproduces the identical construction in DuckDB CTEs."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planted = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("v", lambda x: x * 1.002).alias("v"),
    )
    corpus = e.unionByName(planted).transform(_ckpt)

    # Exploded long-form assignment kept deliberately (measured): with
    # the checkpointed corpus feeding BOTH this stage and the pair
    # stage, the codegen'd pos-join sum beats the interpreted
    # _assign_packed fold here (7.0 s vs 8.2 s at sf0.1) — the packed
    # kernel wins where it removes an eager exploded checkpoint or an
    # md5 storm (q169/q178/q179/q214) or a raw scan (q180), not where
    # the exploded sum already ran inside whole-stage codegen.
    x = corpus.select(
        "vec_id", F.posexplode("v").alias("pos", "x")
    ).withColumn("pos", (F.col("pos") + 1).cast("int"))
    c = x.where(F.col("vec_id") < _SD_K).select(
        F.col("vec_id").cast("int").alias("cid"), "pos", F.col("x").alias("c")
    )
    dist_term = F.round(
        (F.col("x") - F.col("c")) * (F.col("x") - F.col("c")), 12
    ).cast("decimal(28,12)")
    d = (
        x.join(F.broadcast(c), "pos")
        .groupBy("vec_id", "cid")
        .agg(F.sum(dist_term).alias("dist"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    assign = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cid")
    )

    # Members carry their vector + norm once; the pair stage is an
    # equi-join on cid (quadratic only within a cluster).
    m = assign.join(corpus, "vec_id").select(
        "vec_id", "cid", "v", l2_norm("v").alias("norm")
    )
    a, b = m.alias("a"), m.alias("b")
    removed = (
        a.join(
            b,
            (F.col("b.cid") == F.col("a.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(
            dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.norm") * F.col("b.norm"))
            >= _SD_THRESHOLD
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("_rm", F.lit(1))
    )
    return assign.join(removed, "vec_id", "left").select(
        "vec_id",
        "cid",
        F.when(F.col("_rm").isNull(), 1).otherwise(0).alias("kept"),
    )


# --------------------------------------------------------------------------
# q176 — exact Jaccard-threshold self-join with prefix filtering.

_PF_NUM, _PF_DEN = 4, 5  # Jaccard threshold 4/5 = 0.8, kept integer


@register(
    "q176_prefix_filter_jaccard",
    sql=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(
                   string_split(text, ' ')[1:greatest(
                       len(string_split(text, ' ')) - 2, 1)], ' ') AS text
        FROM documents WHERE doc_id % 20 = 0
    ),
    sh AS (SELECT doc_id, {_sql_minhash_grams("text")} AS grams FROM corpus),
    t2 AS (SELECT doc_id, unnest(grams) AS tok FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM t2 GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM t2 a JOIN t2 b ON b.tok = a.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
    SELECT i.id_a, i.id_b,
           CAST(i.c AS INTEGER) AS inter_size,
           CAST(sa.n + sb.n - i.c AS INTEGER) AS union_size,
           round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 9) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE 5 * i.c >= 4 * (sa.n + sb.n - i.c)
    """,
    tags=("dedup", "jaccard", "prefix-filter", "ppjoin"),
)
def q176_prefix_filter_jaccard(spark, sf_dir):
    """Exact shingle-set Jaccard >= 0.8 self-join over documents ∪
    planted truncations (doc_id%20==0, last two words dropped —
    guaranteed high-Jaccard pairs), PPJoin-style over word-3-gram
    shingles (word sets are useless here: this corpus's docs share
    most of a tiny vocabulary, so unigram Jaccard >= 0.9 holds for a
    MILLION background pairs, while trigram-shingle Jaccard >= 0.8
    holds for ~500 — shingling IS the selectivity, exactly why the
    minhash pipeline q62 shingles too). Shingles are ranked
    rarest-first (df asc, gram asc — a strict total order), each set
    keeps only its first n - ceil(0.8·n) + 1 as the candidate prefix,
    and candidates come from a plain equi-join on prefix shingles.
    Any pair with J >= t has overlap >= ceil(t·|x|), so a pair
    sharing NO prefix shingle cannot reach the threshold — the filter
    is lossless (tested against a pure-Python brute force). Verify
    re-joins full shingle sets by id and keeps the threshold compare
    in pure integers (5c >= 4(sa+sb-c)), so no float boundary exists.
    Scale: df ranking is one shingle-key partial agg; the per-doc
    ordering window partitions by doc_id (never global); candidate
    volume is bounded by rare-shingle postings, the standard prefix-
    filter bound. The oracle spells the naive all-pairs join — an
    independent construction at sf-test scale."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    planted = d.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1))), " "
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(planted)

    # Stage the token array as a real column before shingling (HOF
    # lambdas are interpreted; an inline tokenizer would re-run per
    # shingle element — the minhash_det_pairs discipline).
    toks = (
        corpus.select("doc_id", simple_tokenize("text").alias("_tk"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles_from_tokens(F.col("_tk")))
            ).alias("tok"),
        )
        .transform(_ckpt)
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))

    ranked = toks.join(dfreq, "tok")
    w_rank = Window.partitionBy("doc_id").orderBy("df", "tok")
    w_size = Window.partitionBy("doc_id")
    prefix = (
        ranked.select(
            "doc_id",
            "tok",
            F.row_number().over(w_rank).alias("rn"),
            F.count("*").over(w_size).alias("n"),
        )
        # prefix length n - ceil(4n/5) + 1, all-integer arithmetic
        .where(F.expr("rn <= n - ((4 * n + 4) div 5) + 1"))
        .select("doc_id", "tok")
    )

    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pb.tok") == F.col("pa.tok"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(
            F.col("pa.doc_id").alias("id_a"), F.col("pb.doc_id").alias("id_b")
        )
        .distinct()
    )

    ta, tb = toks.alias("ta"), toks.alias("tb")
    inter = (
        cand.join(ta, F.col("ta.doc_id") == F.col("id_a"))
        .join(
            tb,
            (F.col("tb.doc_id") == F.col("id_b"))
            & (F.col("tb.tok") == F.col("ta.tok")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(
            _PF_DEN * F.col("c")
            >= _PF_NUM * (F.col("na") + F.col("nb") - F.col("c"))
        )
        .select(
            "id_a",
            "id_b",
            F.col("c").cast("int").alias("inter_size"),
            (F.col("na") + F.col("nb") - F.col("c"))
            .cast("int")
            .alias("union_size"),
            F.round(
                F.col("c").cast("double")
                / (F.col("na") + F.col("nb") - F.col("c")),
                9,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# q177 — add-one-smoothed bigram LM surprisal per document.


@register(
    "q177_bigram_surprisal",
    sql="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i])) AS w1,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i+1])) AS w2
        FROM t),
    bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
    uc AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    vocab AS (
        SELECT COUNT(DISTINCT tok) AS v
        FROM (SELECT unnest(toks) AS tok FROM t)),
    scored AS (
        SELECT bg.doc_id,
               CAST(round(-ln(CAST(bc.c12 + 1 AS DOUBLE) / (uc.c1 + vocab.v)),
                          12) AS DECIMAL(24,12)) AS nll
        FROM bg
        JOIN bc ON bc.w1 = bg.w1 AND bc.w2 = bg.w2
        JOIN uc ON uc.w1 = bg.w1
        CROSS JOIN vocab)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 9) AS mean_nll
    FROM scored GROUP BY doc_id
    """,
    tags=("corpus", "quality", "lm", "bigram"),
)
def q177_bigram_surprisal(spark, sf_dir):
    """Bigram language-model surprisal per document (add-one
    smoothing, conditioning counts from the corpus itself) — the
    stronger perplexity-proxy quality filter next to q158's unigram
    LM: p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V). Single-token documents
    have no bigrams and drop from the output on BOTH engines (the
    q120 lesson: the bigram generator is guarded so size<2 yields an
    empty array, never a sequence(1,0) artifact). Scale: bigram and
    unigram LMs are token-key partial aggs; V is one broadcastable
    scalar; the scoring join shuffles on the bigram key; every -ln p
    term is quantized to DECIMAL before the exact per-doc sum."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    bigrams = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1),"
            " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    bg = t.select("doc_id", F.explode(bigrams).alias("b")).select(
        "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    ).transform(_ckpt)

    bc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uc = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        t.select(F.explode("toks").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    nll = F.round(
        -F.log(
            (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("v"))
        ),
        12,
    ).cast("decimal(24,12)")
    return (
        bg.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum("nll").cast("double") / F.count("*"), 9
            ).alias("mean_nll"),
        )
    )


# --------------------------------------------------------------------------
# q178 — product quantization codes over the embedding table.

_PQ_SUB = 4       # subspaces (64-dim → 4 × 16-dim subvectors)
_PQ_DIM = 16      # dims per subspace
_PQ_K = 4         # codes per subspace; codebook = subvectors of vec_id 0..3


@register(
    "q178_pq_codes",
    sql="""
    WITH x AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
    xs AS (SELECT vec_id, pos, CAST((pos - 1) // 16 AS INTEGER) AS s, x
           FROM x),
    cb AS (SELECT CAST(vec_id AS INTEGER) AS cid, s, pos, x AS c
           FROM xs WHERE vec_id < 4),
    d AS (
        SELECT xs.vec_id, xs.s, cb.cid,
               SUM(CAST(round((xs.x - cb.c) * (xs.x - cb.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM xs JOIN cb ON cb.pos = xs.pos
        GROUP BY xs.vec_id, xs.s, cb.cid),
    a AS (
        SELECT vec_id, s, cid, dist FROM (
            SELECT vec_id, s, cid, dist,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, cid) AS rn
            FROM d)
        WHERE rn = 1)
    SELECT vec_id,
           MAX(CASE WHEN s = 0 THEN cid END) AS code_0,
           MAX(CASE WHEN s = 1 THEN cid END) AS code_1,
           MAX(CASE WHEN s = 2 THEN cid END) AS code_2,
           MAX(CASE WHEN s = 3 THEN cid END) AS code_3,
           round(CAST(SUM(dist) AS DOUBLE), 9) AS sq_err
    FROM a GROUP BY vec_id
    """,
    tags=("ann", "quantization", "pq", "embeddings"),
)
def q178_pq_codes(spark, sf_dir):
    """Product quantization of the embedding table: the 64-dim vector
    splits into 4 × 16-dim subvectors, each assigned to its nearest
    of 4 per-subspace codebook centroids (codebook = the first k
    vectors' subvectors; a trained codebook would run q169's Lloyd
    steps per subspace first — assignment is the part that touches
    the corpus). Output per vector: the 4-way code tuple + exact
    reconstruction squared error. Completes the ANN index-build
    story next to q75 IVF (coarse cells) and q174 scalar int8
    quantization: PQ is the fine-quantizer that makes billion-vector
    serving RAM-resident (4 codes = 4 bytes vs 256 float bytes).
    Scale: one broadcast of the S·k·(d/S) codebook + a (vec_id, s,
    cid) partial agg — the corpus never shuffles to be coded; codes
    pivot back via conditional agg on a fixed subspace list. Exact
    DECIMAL distance terms keep assignment and error hash-identical
    under any partitioning (the q169 discipline)."""
    e = table(spark, sf_dir, "embeddings")
    # Packed subvector assignment (round-7, the q214 kernel shape):
    # (vec, s) slices join the 16-row packed codebook on s and each
    # distance is one zip_with + exact-decimal fold — n·S·k rows flow
    # through the aggregation instead of n·d·k exploded ones. Same
    # round-at-1e-12 decimal terms ⇒ identical codes and sq_err.
    # NULL embeddings have no PQ codes / no cell (r12 contract; the
    # oracle's unnest() drops them for free)
    ev = e.where(F.col("embedding").isNotNull()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).transform(_ckpt)

    def subspaces(df):
        return df.select(
            "vec_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(_PQ_SUB - 1))
            ).alias("s"),
            "v",
        ).select(
            "vec_id", "s",
            F.slice("v", F.col("s") * _PQ_DIM + 1, _PQ_DIM).alias("sv"),
        )

    cb_p = subspaces(ev.where(F.col("vec_id") < _PQ_K)).select(
        F.col("vec_id").cast("int").alias("cid"), "s",
        F.col("sv").alias("csv"),
    )
    d = subspaces(ev).join(F.broadcast(cb_p), "s").select(
        "vec_id", "s", "cid",
        F.aggregate(
            F.zip_with(
                F.col("sv"), F.col("csv"),
                lambda x, c: F.round((x - c) * (x - c), 12).cast(
                    "decimal(28,12)"
                ),
            ),
            F.lit(0).cast("decimal(28,12)"),
            lambda acc, t: (acc + t).cast("decimal(28,12)"),
        ).alias("dist"),
    )
    w = Window.partitionBy("vec_id", "s").orderBy("dist", "cid")
    a = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "s", "cid", "dist")
    )
    code_cols = [
        F.max(F.when(F.col("s") == i, F.col("cid"))).alias(f"code_{i}")
        for i in range(_PQ_SUB)
    ]
    return a.groupBy("vec_id").agg(
        *code_cols,
        F.round(F.sum("dist").cast("double"), 9).alias("sq_err"),
    )


# --------------------------------------------------------------------------
# q179 — signed-random-projection signatures + Hamming-band near-dup.

_SRP_BITS = 16     # hyperplanes → 16-bit signature
_SRP_BANDS = 4     # 4 bands × 4 bits; pigeonhole-complete for ham <= 3
_SRP_HAM = 3       # max Hamming distance reported


@register(
    "q179_srp_signatures",
    sql="""
    WITH corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding::DOUBLE[], x -> x * 1.001) AS v
        FROM embeddings WHERE vec_id % 25 = 0
    ),
    x AS (
        SELECT vec_id,
               CAST(generate_subscripts(v, 1) AS INTEGER) AS pos,
               CAST(unnest(v) AS DOUBLE) AS x
        FROM corpus),
    terms AS (
        SELECT x.vec_id, j.j,
               CAST(round((CAST(('0x' || substr(md5('srp#' || CAST(j.j AS VARCHAR)
                               || '#' || CAST(x.pos AS VARCHAR)), 1, 8)) AS BIGINT)
                           % 2001 - 1000) * x.x, 12) AS DECIMAL(28,12)) AS t
        FROM x CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j),
    bits AS (
        SELECT vec_id, j, CASE WHEN SUM(t) >= 0 THEN 1 ELSE 0 END AS bit
        FROM terms GROUP BY vec_id, j),
    codes AS (
        SELECT vec_id, CAST(SUM(bit * (1 << j)) AS BIGINT) AS code
        FROM bits GROUP BY vec_id),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
               a.code AS code_a, b.code AS code_b
        FROM codes a JOIN codes b ON a.vec_id < b.vec_id
        JOIN (SELECT unnest(generate_series(0, 3)) AS band) bd
          ON (a.code // (1 << (4 * bd.band))) % 16
             = (b.code // (1 << (4 * bd.band))) % 16)
    SELECT id_a, id_b,
           CAST(bit_count(xor(code_a, code_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(code_a, code_b)) <= 3
    """,
    tags=("ann", "lsh", "srp", "embeddings"),
)
def q179_srp_signatures(spark, sf_dir):
    """Signed-random-projection (SRP) LSH over embeddings ∪ planted
    scaled copies: 16 md5-derived integer hyperplanes (r ∈ [-1000,
    1000] per (plane, dim) — deterministic cross-engine), each
    vector's projection sign becomes one signature bit, candidates
    come from an equi-join on 4-bit bands, and survivors verify by
    exact popcount Hamming ≤ 3. Pigeonhole: ≤3 bit errors can dirty
    at most 3 of the 4 bands, so every qualifying pair shares an
    intact band — the candidate set is complete. Planted copies are
    positive-scaled (signs invariant) ⇒ Hamming 0 to their source.
    This is the cosine-LSH family (vs q65's Euclidean
    BucketedRandomProjection and q63's token SimHash): signatures
    are 2 bytes/vector, and the banded join shuffles signatures,
    never vectors. At production bit-widths (64–256 bits) band
    buckets stay small; 16 bits here keeps the oracle's all-pairs
    check cheap. Exact DECIMAL projection sums make every bit
    partition-independent; the sign compare sits at an exact-decimal
    boundary, never a float one."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planted = e.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("v", lambda x: x * 1.001).alias("v"),
    )
    # NULL embeddings carry no signature (operator-family policy);
    # without the filter the dim probe below can also land on a NULL
    # row and die on int(None)
    corpus = e.unionByName(planted).where(F.col("v").isNotNull())

    # Packed projection (round-7): the 16 hyperplanes are materialized
    # ONCE as a 16-row broadcast table of md5-derived coefficient
    # arrays — the exploded form recomputed an interpreted md5 for
    # every (vector, plane, dim) row (n·16·d of them); now there are
    # exactly 16·d md5 calls total and each signature bit is one
    # zip_with + exact-decimal fold over the packed vector (n·16 rows
    # through the aggregation, no d-factor). Same round-at-1e-12
    # decimal terms ⇒ identical sign decisions ⇒ identical codes.
    dim_row = corpus.select(F.size("v").alias("d")).first()
    if dim_row is None or dim_row["d"] is None:
        # empty embeddings table: the hyperplane width is unknowable
        # and irrelevant — no vectors, no candidate pairs
        from pyspark.sql import types as T

        from rc_rag_spark.operators.similarity import _empty_pairs_result

        return _empty_pairs_result(
            corpus, "vec_id", "hamming", T.IntegerType()
        )
    dim = int(dim_row["d"])

    def r_of(j_col, pos_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "#",
                            F.lit("srp"),
                            j_col.cast("string"),
                            pos_col.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2001
            - 1000
        )

    planes = spark.range(_SRP_BITS).select(
        F.col("id").cast("int").alias("j"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda p: r_of(F.col("id"), p),
        ).alias("rv"),
        F.lit(1).alias("_jk"),
    )
    proj = F.aggregate(
        F.zip_with(
            F.col("v"), F.col("rv"),
            lambda x, r: F.round(r * x, 12).cast("decimal(28,12)"),
        ),
        F.lit(0).cast("decimal(28,12)"),
        lambda acc, t: (acc + t).cast("decimal(28,12)"),
    )
    bits = corpus.withColumn("_jk", F.lit(1)).join(
        F.broadcast(planes), "_jk"
    ).select(
        "vec_id", "j",
        F.when(proj >= 0, 1).otherwise(0).alias("bit"),
    )
    codes = (
        bits.groupBy("vec_id")
        .agg(
            F.sum(F.expr("bit * shiftleft(1L, j)"))
            .cast("bigint")
            .alias("code")
        )
        .transform(_ckpt)
    )

    banded = codes.select(
        "vec_id",
        "code",
        F.explode(F.sequence(F.lit(0), F.lit(_SRP_BANDS - 1))).alias("band"),
    ).withColumn(
        "band_val", F.expr("(code div shiftleft(1L, band * 4)) % 16")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("b.band") == F.col("a.band"))
            & (F.col("b.band_val") == F.col("a.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.code").alias("code_a"),
            F.col("b.code").alias("code_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("code_a").bitwiseXOR(F.col("code_b")))
    return cand.where(ham <= _SRP_HAM).select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    )


# --------------------------------------------------------------------------
# q180 — cluster-balanced subsample (no window, pure hash-rate).

_CB_TARGET = 40  # expected rows kept per cluster


@register(
    "q180_cluster_balanced_sample",
    sql="""
    WITH x AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
    c AS (SELECT CAST(vec_id AS INTEGER) AS cid, pos, x AS c
          FROM x WHERE vec_id < 4),
    d AS (
        SELECT x.vec_id, c.cid,
               SUM(CAST(round((x.x - c.c) * (x.x - c.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM x JOIN c ON c.pos = x.pos
        GROUP BY x.vec_id, c.cid),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d)
        WHERE rn = 1),
    sizes AS (SELECT cid, COUNT(*) AS n_c FROM assign GROUP BY cid)
    SELECT a.vec_id, a.cid
    FROM assign a JOIN sizes s ON s.cid = a.cid
    WHERE (CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 10000) * s.n_c < 40 * 10000
    """,
    tags=("curation", "sampling", "clustering"),
)
def q180_cluster_balanced_sample(spark, sf_dir):
    """Cluster-balanced subsample of the embedding table: assign each
    vector to its nearest seed centroid (q175's assignment pass),
    then keep each row with probability T/n_c — so every cluster
    contributes ≈T rows regardless of size, the diversity-preserving
    counterweight to frequency-proportional sampling (big boilerplate
    clusters stop dominating the training mix). The keep decision is
    a pure integer predicate — (md5(vec_id) % 10⁴)·n_c < T·10⁴ —
    deterministic across engines, runs, and partitionings, with NO
    per-cluster window or sort: at 100 TB the only data movement is
    the assignment partial-agg plus a broadcast of the k-row size
    table. (A per-cluster exact-T variant would row_number within
    cid; the rate form avoids that skew-prone sort entirely.)"""
    e = table(spark, sf_dir, "embeddings")
    assign = _assign_packed(
        e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        _SD_K,
    )
    sizes = assign.groupBy("cid").agg(F.count("*").alias("n_c"))
    h = (
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 10_000
    )
    return (
        assign.join(F.broadcast(sizes), "cid")
        .where(h * F.col("n_c") < _CB_TARGET * 10_000)
        .select("vec_id", "cid")
    )


# --------------------------------------------------------------------------
# q212 — parameterized SemDeDup: auto-k + cluster-size cap (salted split).

_SD2_TARGET = 100   # target cluster size -> k = ceil(n / 100)
_SD2_CAP = 150      # clusters past this split into hash-salted buckets
_SD2_THRESHOLD = 0.95


@register(
    "q212_semdedup_scaled",
    sql=f"""
    WITH corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE embedding IS NOT NULL
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding::DOUBLE[], x -> x * 1.002) AS v
        FROM embeddings WHERE vec_id % 10 = 0 AND embedding IS NOT NULL
    ),
    n_tot AS (SELECT COUNT(*) AS n FROM corpus),
    seeds AS (
        SELECT vec_id, v,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                   AS INTEGER) - 1 AS cid
        FROM corpus
        QUALIFY ROW_NUMBER() OVER (
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
            <= (SELECT CAST(ceil(n / {_SD2_TARGET}.0) AS BIGINT) FROM n_tot)
    ),
    x AS (
        SELECT vec_id,
               CAST(generate_subscripts(v, 1) AS INTEGER) AS pos,
               CAST(unnest(v) AS DOUBLE) AS x
        FROM corpus),
    cx AS (
        SELECT cid,
               CAST(generate_subscripts(v, 1) AS INTEGER) AS pos,
               CAST(unnest(v) AS DOUBLE) AS c
        FROM seeds),
    d AS (
        SELECT x.vec_id, cx.cid,
               SUM(CAST(round((x.x - cx.c) * (x.x - cx.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM x JOIN cx ON cx.pos = x.pos
        GROUP BY x.vec_id, cx.cid),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM d)
        WHERE rn = 1),
    sizes AS (SELECT cid, COUNT(*) AS n_c FROM assign GROUP BY cid),
    salted AS (
        SELECT a.vec_id, a.cid,
               CASE WHEN s.n_c <= {_SD2_CAP} THEN 0
                    ELSE CAST(CAST(('0x' || substr(
                             md5(CAST(a.vec_id AS VARCHAR)), 1, 8))
                             AS BIGINT)
                         % CAST(ceil(s.n_c / {_SD2_CAP}.0) AS BIGINT)
                         AS INTEGER)
               END AS salt
        FROM assign a JOIN sizes s ON s.cid = a.cid),
    nn AS (
        SELECT vec_id,
               SUM(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS nn
        FROM x GROUP BY vec_id),
    removed AS (
        SELECT DISTINCT sb.vec_id AS vec_id
        FROM salted sa
        JOIN salted sb
          ON sb.cid = sa.cid AND sb.salt = sa.salt
         AND sa.vec_id < sb.vec_id
        JOIN (SELECT a.vec_id AS ia, b.vec_id AS ib,
                     SUM(CAST(round(a.x * b.x, 12) AS DECIMAL(28,12))) AS dp
              FROM x a JOIN x b ON b.pos = a.pos
              GROUP BY a.vec_id, b.vec_id) p
          ON p.ia = sa.vec_id AND p.ib = sb.vec_id
        JOIN nn na ON na.vec_id = sa.vec_id
        JOIN nn nb ON nb.vec_id = sb.vec_id
        WHERE round(CAST(p.dp AS DOUBLE)
                    / (sqrt(CAST(na.nn AS DOUBLE))
                       * sqrt(CAST(nb.nn AS DOUBLE))), 9)
              >= {_SD2_THRESHOLD}
    )
    SELECT s.vec_id, s.cid, s.salt,
           CASE WHEN r.vec_id IS NULL THEN 1 ELSE 0 END AS kept
    FROM salted s LEFT JOIN removed r ON r.vec_id = s.vec_id
    """,
    tags=("dedup", "semantic", "embeddings", "kmeans", "scale"),
)
def q212_semdedup_scaled(spark, sf_dir):
    """SemDeDup via the PARAMETERIZED operator (operators/semdedup.py)
    — the scale answer to q175's fixed k=4: k = ceil(n/100) grows with
    the corpus so expected cluster size stays constant, and any
    cluster past 150 members splits into md5-salted sub-buckets BEFORE
    the pair stage, hard-bounding the largest quadratic block (the
    documented recall trade: pairs across sub-buckets of one
    mega-cluster are skipped). Same planted-copy corpus as q175
    (vec_id%10==0 scaled x1.002). Assignment distances and pair
    cosines use per-term round-at-1e-12 + exact int64 sums inside the
    NumPy kernels — value-identical to the oracle's DECIMAL(28,12)
    arithmetic, so argmin and the 0.95 compare agree bit-for-bit.
    The oracle replicates auto-k, md5-ordered seeds, the salt split,
    and within-bucket removal in DuckDB CTEs. Scale shape: broadcast
    centroids + one Arrow assignment pass + k-row size agg +
    applyInPandas over (cid, salt) with every block <= cap."""
    from rc_rag_spark.operators.semdedup import semdedup

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planted = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("v", lambda x: x * 1.002).alias("v"),
    )
    corpus = e.unionByName(planted).transform(_ckpt)
    return semdedup(
        corpus,
        id_col="vec_id",
        vec_col="v",
        threshold=_SD2_THRESHOLD,
        target_cluster_size=_SD2_TARGET,
        max_cluster_size=_SD2_CAP,
    )


# --------------------------------------------------------------------------
# q214 — IVF-PQ ADC search: coarse probe + PQ lookup-table distances.

_ADC_K = 5        # neighbors returned per query
_ADC_PROBE = 2    # coarse cells probed per query


@register(
    "q214_ivf_pq_adc",
    sql=f"""
    WITH x AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
    xs AS (SELECT vec_id, pos, CAST((pos - 1) // 16 AS INTEGER) AS s, x
           FROM x),
    seeds AS (SELECT CAST(vec_id AS INTEGER) AS cid, pos, x AS c
              FROM x WHERE vec_id < 4),
    cb AS (SELECT CAST(vec_id AS INTEGER) AS pcid, s, pos, x AS c
           FROM xs WHERE vec_id < 4),
    -- corpus coarse-cell assignment (exact DECIMAL distances)
    dc AS (
        SELECT x.vec_id, seeds.cid,
               SUM(CAST(round((x.x - seeds.c) * (x.x - seeds.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM x JOIN seeds ON seeds.pos = x.pos
        WHERE x.vec_id >= 5
        GROUP BY x.vec_id, seeds.cid),
    cell AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM dc) WHERE rn = 1),
    -- corpus PQ codes (q178 assignment, corpus side only)
    dpq AS (
        SELECT xs.vec_id, xs.s, cb.pcid,
               SUM(CAST(round((xs.x - cb.c) * (xs.x - cb.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM xs JOIN cb ON cb.pos = xs.pos AND cb.s = xs.s
        WHERE xs.vec_id >= 5
        GROUP BY xs.vec_id, xs.s, cb.pcid),
    codes AS (
        SELECT vec_id, s, pcid AS code FROM (
            SELECT vec_id, s, pcid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, pcid) AS rn
            FROM dpq) WHERE rn = 1),
    -- query coarse probe: {_ADC_PROBE} nearest cells
    dq AS (
        SELECT x.vec_id AS query_id, seeds.cid,
               SUM(CAST(round((x.x - seeds.c) * (x.x - seeds.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM x JOIN seeds ON seeds.pos = x.pos
        WHERE x.vec_id < 5
        GROUP BY x.vec_id, seeds.cid),
    probe AS (
        SELECT query_id, cid AS cell FROM (
            SELECT query_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY dist, cid) AS rn
            FROM dq) WHERE rn <= {_ADC_PROBE}),
    -- ADC lookup table: query-subvector -> codebook-centroid distance
    lut AS (
        SELECT xs.vec_id AS query_id, xs.s, cb.pcid,
               SUM(CAST(round((xs.x - cb.c) * (xs.x - cb.c), 12)
                        AS DECIMAL(28,12))) AS pdist
        FROM xs JOIN cb ON cb.pos = xs.pos AND cb.s = xs.s
        WHERE xs.vec_id < 5
        GROUP BY xs.vec_id, xs.s, cb.pcid),
    cand AS (
        SELECT p.query_id, c.vec_id, k.s, k.code
        FROM probe p
        JOIN cell c ON c.cell = p.cell
        JOIN codes k ON k.vec_id = c.vec_id),
    adc AS (
        SELECT cand.query_id, cand.vec_id AS neighbor_id,
               SUM(l.pdist) AS approx_dist
        FROM cand
        JOIN lut l ON l.query_id = cand.query_id AND l.s = cand.s
                  AND l.pcid = cand.code
        GROUP BY cand.query_id, cand.vec_id)
    SELECT query_id, neighbor_id,
           round(CAST(approx_dist AS DOUBLE), 9) AS approx_dist,
           CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY approx_dist, neighbor_id) AS rank
          FROM adc)
    WHERE rank <= {_ADC_K}
    """,
    tags=("ann", "ivf", "pq", "adc", "embeddings"),
)
def q214_ivf_pq_adc(spark, sf_dir):
    """IVF-PQ ADC search — the serving-side query that completes the
    ANN index story (q75 coarse IVF cells + q178 PQ codes were the
    build side): each query probes its 2 nearest coarse cells, builds
    a 4x4 subspace lookup table of exact query-subvector-to-centroid
    distances ONCE, and scores every candidate as the SUM of 4 LUT
    entries keyed by the candidate's PQ codes — the asymmetric
    distance computation (Jegou et al. 2011, public) that makes
    billion-vector search RAM-resident: candidates are scored from
    4-byte codes, never their float vectors. Scale shape: seeds +
    codebook + LUT are broadcast-size (k·d, S·k·(d/S), q·S·k); corpus
    codes and cells come from partial aggs; the candidate join
    shuffles codes (4 ints/vector), not embeddings; per-query top-k is
    one window over probed-cell candidates. Exact DECIMAL distance
    terms (q169 discipline) make cell choice, code choice, and the
    final ranking hash-identical on both engines; ties break by id.
    wide_table (r15): the coarse-assign and PQ-code decimal folds
    chain on this scan (one task on the single-row-group fixture,
    ~2x the anchor, measured); the conditional rebalance spreads
    them and adds no exchange on multi-split layouts."""
    e = wide_table(spark, sf_dir, "embeddings")
    # PACKED-VECTOR kernels (round-7 rewrite of the exploded
    # (vec_id, pos)-row form): every distance is one zip_with +
    # decimal fold over whole arrays, so the coarse stage flows n·k
    # rows instead of n·k·d and the PQ stage n·S·k instead of n·d·k —
    # the d-factor never hits a shuffle or an aggregation. The fold
    # adds the SAME round-at-1e-12 decimal(28,12) terms the exploded
    # form summed (decimal addition is exact, so grouping/order can't
    # change the value) — cell choice, codes, LUT, and the final
    # ranking stay hash-identical to the DuckDB oracle.
    # NULL embeddings have no PQ codes / no cell (r12 contract; the
    # oracle's unnest() drops them for free)
    ev = e.where(F.col("embedding").isNotNull()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).transform(_ckpt)

    def sq_dist(a, b):
        return F.aggregate(
            F.zip_with(
                a, b,
                lambda x, c: F.round((x - c) * (x - c), 12).cast(
                    "decimal(28,12)"
                ),
            ),
            F.lit(0).cast("decimal(28,12)"),
            lambda acc, t: (acc + t).cast("decimal(28,12)"),
        )

    def subspaces(df, out_id):
        """(id, s, sv): the S=4 16-dim subvector slices of v."""
        return df.select(
            out_id,
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("s"),
            "v",
        ).select(
            out_id, "s",
            F.slice("v", F.col("s") * 16 + 1, 16).alias("sv"),
        )

    seeds_p = ev.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("v").alias("cv"),
        F.lit(1).alias("_j"),
    )
    cb_p = subspaces(
        ev.where(F.col("vec_id") < 4).select(
            F.col("vec_id").cast("int").alias("pcid"), "v"
        ),
        "pcid",
    ).select("pcid", "s", F.col("sv").alias("csv"))

    corpus_v = ev.where(F.col("vec_id") >= 5).withColumn("_j", F.lit(1))
    queries_v = ev.where(F.col("vec_id") < 5).withColumn("_j", F.lit(1))

    dc = corpus_v.join(F.broadcast(seeds_p), "_j").select(
        "vec_id", "cid", sq_dist(F.col("v"), F.col("cv")).alias("dist")
    )
    w_cell = Window.partitionBy("vec_id").orderBy("dist", "cid")
    cell = (
        dc.withColumn("rn", F.row_number().over(w_cell))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cell"))
    )

    corpus_sub = subspaces(corpus_v, "vec_id")
    dpq = corpus_sub.join(F.broadcast(cb_p), "s").select(
        "vec_id", "s", "pcid",
        sq_dist(F.col("sv"), F.col("csv")).alias("dist"),
    )
    w_code = Window.partitionBy("vec_id", "s").orderBy("dist", "pcid")
    codes = (
        dpq.withColumn("rn", F.row_number().over(w_code))
        .where(F.col("rn") == 1)
        .select("vec_id", "s", F.col("pcid").alias("code"))
    )

    dq = queries_v.join(F.broadcast(seeds_p), "_j").select(
        "vec_id", "cid", sq_dist(F.col("v"), F.col("cv")).alias("dist")
    )
    w_probe = Window.partitionBy("vec_id").orderBy("dist", "cid")
    probe = (
        dq.withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= _ADC_PROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("cell"))
    )

    queries_sub = subspaces(queries_v, "vec_id")
    lut = queries_sub.join(F.broadcast(cb_p), "s").select(
        F.col("vec_id").alias("query_id"), "s", "pcid",
        sq_dist(F.col("sv"), F.col("csv")).alias("pdist"),
    )

    cand = (
        probe.join(cell, "cell")
        .join(codes, "vec_id")
        .select(
            "query_id",
            "vec_id",
            "s",
            F.col("code").alias("pcid"),
        )
    )
    adc = (
        cand.join(F.broadcast(lut), ["query_id", "s", "pcid"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pdist").alias("approx_dist"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "approx_dist",
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        "approx_dist", "neighbor_id"
    )
    return (
        adc.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .where(F.col("rank") <= _ADC_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("approx_dist").cast("double"), 9).alias(
                "approx_dist"
            ),
            "rank",
        )
    )


# --------------------------------------------------------------------------
# q217 — hierarchical SemDeDup: two-level seeding under a broadcast budget.

_SD3_TARGET = 50    # leaf target cluster size
_SD3_CAP = 75       # leaf clusters past this split into salted buckets
_SD3_SUPER = 200    # super-cell target (super_factor 4 x target 50)
_SD3_SUPER_CAP = 300  # super-cells past this split before level 2


@register(
    "q217_semdedup_hierarchical",
    sql=f"""
    WITH corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE embedding IS NOT NULL
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding::DOUBLE[], x -> x * 1.002) AS v
        FROM embeddings WHERE vec_id % 10 = 0 AND embedding IS NOT NULL
    ),
    n_tot AS (SELECT COUNT(*) AS n FROM corpus),
    sseeds AS (
        SELECT vec_id, v,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                   AS INTEGER) - 1 AS scell
        FROM corpus
        QUALIFY ROW_NUMBER() OVER (
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
            <= (SELECT CAST(ceil(n / {_SD3_SUPER}.0) AS BIGINT) FROM n_tot)
    ),
    x AS (
        SELECT vec_id,
               CAST(generate_subscripts(v, 1) AS INTEGER) AS pos,
               CAST(unnest(v) AS DOUBLE) AS x
        FROM corpus),
    scx AS (
        SELECT scell,
               CAST(generate_subscripts(v, 1) AS INTEGER) AS pos,
               CAST(unnest(v) AS DOUBLE) AS c
        FROM sseeds),
    sd AS (
        SELECT x.vec_id, scx.scell,
               SUM(CAST(round((x.x - scx.c) * (x.x - scx.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM x JOIN scx ON scx.pos = x.pos
        GROUP BY x.vec_id, scx.scell),
    sassign AS (
        SELECT vec_id, scell FROM (
            SELECT vec_id, scell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, scell) AS rn
            FROM sd)
        WHERE rn = 1),
    ssizes AS (SELECT scell, COUNT(*) AS n_c FROM sassign GROUP BY scell),
    ssalted AS (
        SELECT a.vec_id, a.scell,
               CASE WHEN s.n_c <= {_SD3_SUPER_CAP} THEN 0
                    ELSE CAST(CAST(('0x' || substr(
                             md5(CAST(a.vec_id AS VARCHAR)), 1, 8))
                             AS BIGINT)
                         % CAST(ceil(s.n_c / {_SD3_SUPER_CAP}.0) AS BIGINT)
                         AS INTEGER)
               END AS ssalt
        FROM sassign a JOIN ssizes s ON s.scell = a.scell),
    l2rank AS (
        SELECT vec_id, scell, ssalt,
               ROW_NUMBER() OVER (PARTITION BY scell, ssalt
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn,
               COUNT(*) OVER (PARTITION BY scell, ssalt) AS cnt
        FROM ssalted),
    l2seeds AS (
        SELECT vec_id, scell, ssalt, CAST(rn AS INTEGER) - 1 AS cid
        FROM l2rank
        WHERE rn <= ceil(cnt / {_SD3_TARGET}.0)),
    l2d AS (
        SELECT m.vec_id, s.scell, s.ssalt, s.cid,
               SUM(CAST(round((xm.x - xs.x) * (xm.x - xs.x), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM ssalted m
        JOIN l2seeds s ON s.scell = m.scell AND s.ssalt = m.ssalt
        JOIN x xm ON xm.vec_id = m.vec_id
        JOIN x xs ON xs.vec_id = s.vec_id AND xs.pos = xm.pos
        GROUP BY m.vec_id, s.scell, s.ssalt, s.cid),
    l2assign AS (
        SELECT vec_id, scell, ssalt, cid FROM (
            SELECT vec_id, scell, ssalt, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM l2d)
        WHERE rn = 1),
    csizes AS (
        SELECT scell, ssalt, cid, COUNT(*) AS n_c
        FROM l2assign GROUP BY scell, ssalt, cid),
    csalted AS (
        SELECT a.vec_id, a.scell, a.ssalt, a.cid,
               CASE WHEN s.n_c <= {_SD3_CAP} THEN 0
                    ELSE CAST(CAST(('0x' || substr(
                             md5(CAST(a.vec_id AS VARCHAR)), 1, 8))
                             AS BIGINT)
                         % CAST(ceil(s.n_c / {_SD3_CAP}.0) AS BIGINT)
                         AS INTEGER)
               END AS salt
        FROM l2assign a
        JOIN csizes s ON s.scell = a.scell AND s.ssalt = a.ssalt
                     AND s.cid = a.cid),
    nn AS (
        SELECT vec_id,
               SUM(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS nn
        FROM x GROUP BY vec_id),
    removed AS (
        SELECT DISTINCT sb.vec_id AS vec_id
        FROM csalted sa
        JOIN csalted sb
          ON sb.scell = sa.scell AND sb.ssalt = sa.ssalt
         AND sb.cid = sa.cid AND sb.salt = sa.salt
         AND sa.vec_id < sb.vec_id
        JOIN (SELECT a.vec_id AS ia, b.vec_id AS ib,
                     SUM(CAST(round(a.x * b.x, 12) AS DECIMAL(28,12))) AS dp
              FROM x a JOIN x b ON b.pos = a.pos
              GROUP BY a.vec_id, b.vec_id) p
          ON p.ia = sa.vec_id AND p.ib = sb.vec_id
        JOIN nn na ON na.vec_id = sa.vec_id
        JOIN nn nb ON nb.vec_id = sb.vec_id
        WHERE round(CAST(p.dp AS DOUBLE)
                    / (sqrt(CAST(na.nn AS DOUBLE))
                       * sqrt(CAST(nb.nn AS DOUBLE))), 9)
              >= {_SD2_THRESHOLD}
    )
    SELECT s.vec_id, s.scell, s.ssalt, s.cid, s.salt,
           CASE WHEN r.vec_id IS NULL THEN 1 ELSE 0 END AS kept
    FROM csalted s LEFT JOIN removed r ON r.vec_id = s.vec_id
    """,
    tags=("dedup", "semantic", "embeddings", "kmeans", "scale"),
)
def q217_semdedup_hierarchical(spark, sf_dir):
    """SemDeDup via TWO-LEVEL seeding (semdedup_hierarchical) — the
    implemented escape hatch for the flat operator's seed-broadcast
    budget: only m = ceil(n/200) super-seeds are ever collected and
    broadcast; the ceil(size/50) leaf seeds of every (scell, ssalt)
    bucket are computed IN-TASK from the bucket's own members (md5
    rank) inside the same applyInPandas that assigns them — no window,
    no cogroup, no driver round-trip, per-task memory bounded by the
    300-member super-cap. Leaf clusters past 75 split into salted
    buckets before the greedy min-id pair stage, as in q212. Same
    planted-copy corpus and determinism discipline as q212 (md5
    orderings, round-at-1e-12 exact-int distance/cosine kernels), so
    the oracle replays every stage — super-assignment, ssalt split,
    windowed leaf seeding, leaf assignment, cap salt, removal — in
    DuckDB CTEs and the whole five-column labeling hash-matches."""
    from rc_rag_spark.operators.semdedup import semdedup_hierarchical

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planted = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("v", lambda x: x * 1.002).alias("v"),
    )
    corpus = e.unionByName(planted).transform(_ckpt)
    return semdedup_hierarchical(
        corpus,
        id_col="vec_id",
        vec_col="v",
        threshold=_SD2_THRESHOLD,
        target_cluster_size=_SD3_TARGET,
        max_cluster_size=_SD3_CAP,
        super_factor=4,
        max_super_size=_SD3_SUPER_CAP,
    )


# --------------------------------------------------------------------------
# q221 — IVFADC with RESIDUAL PQ encoding (the full Jegou formulation).


@register(
    "q221_ivfadc_residual",
    sql=f"""
    WITH x AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
    seeds AS (SELECT CAST(vec_id AS INTEGER) AS cid, pos, x AS c
              FROM x WHERE vec_id < 4),
    dc AS (
        SELECT x.vec_id, seeds.cid,
               SUM(CAST(round((x.x - seeds.c) * (x.x - seeds.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM x JOIN seeds ON seeds.pos = x.pos
        WHERE x.vec_id >= 5
        GROUP BY x.vec_id, seeds.cid),
    cell AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM dc) WHERE rn = 1),
    -- corpus residuals w.r.t. the assigned coarse centroid
    res AS (
        SELECT x.vec_id, x.pos,
               CAST((x.pos - 1) // 16 AS INTEGER) AS s,
               x.x - sc.c AS r
        FROM x
        JOIN cell ON cell.vec_id = x.vec_id
        JOIN seeds sc ON sc.cid = cell.cell AND sc.pos = x.pos
        WHERE x.vec_id >= 5),
    -- codebook: residual subvectors of vectors 5..8 (pcid = id-5)
    cb AS (SELECT CAST(vec_id - 5 AS INTEGER) AS pcid, s, pos, r AS c
           FROM res WHERE vec_id < 9),
    dpq AS (
        SELECT res.vec_id, res.s, cb.pcid,
               SUM(CAST(round((res.r - cb.c) * (res.r - cb.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM res JOIN cb ON cb.pos = res.pos AND cb.s = res.s
        GROUP BY res.vec_id, res.s, cb.pcid),
    codes AS (
        SELECT vec_id, s, pcid AS code FROM (
            SELECT vec_id, s, pcid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, pcid) AS rn
            FROM dpq) WHERE rn = 1),
    dq AS (
        SELECT x.vec_id AS query_id, seeds.cid,
               SUM(CAST(round((x.x - seeds.c) * (x.x - seeds.c), 12)
                        AS DECIMAL(28,12))) AS dist
        FROM x JOIN seeds ON seeds.pos = x.pos
        WHERE x.vec_id < 5
        GROUP BY x.vec_id, seeds.cid),
    probe AS (
        SELECT query_id, cid AS cell FROM (
            SELECT query_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY dist, cid) AS rn
            FROM dq) WHERE rn <= {_ADC_PROBE}),
    -- query residual PER PROBED CELL (this is what raw-PQ ADC skips)
    qres AS (
        SELECT p.query_id, p.cell, x.pos,
               CAST((x.pos - 1) // 16 AS INTEGER) AS s,
               x.x - sc.c AS r
        FROM probe p
        JOIN x ON x.vec_id = p.query_id
        JOIN seeds sc ON sc.cid = p.cell AND sc.pos = x.pos),
    lut AS (
        SELECT q.query_id, q.cell, q.s, cb.pcid,
               SUM(CAST(round((q.r - cb.c) * (q.r - cb.c), 12)
                        AS DECIMAL(28,12))) AS pdist
        FROM qres q JOIN cb ON cb.pos = q.pos AND cb.s = q.s
        GROUP BY q.query_id, q.cell, q.s, cb.pcid),
    cand AS (
        SELECT p.query_id, p.cell, c.vec_id, k.s, k.code
        FROM probe p
        JOIN cell c ON c.cell = p.cell
        JOIN codes k ON k.vec_id = c.vec_id),
    adc AS (
        SELECT cand.query_id, cand.vec_id AS neighbor_id,
               SUM(l.pdist) AS approx_dist
        FROM cand
        JOIN lut l ON l.query_id = cand.query_id AND l.cell = cand.cell
                  AND l.s = cand.s AND l.pcid = cand.code
        GROUP BY cand.query_id, cand.vec_id)
    SELECT query_id, neighbor_id,
           round(CAST(approx_dist AS DOUBLE), 9) AS approx_dist,
           CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY approx_dist, neighbor_id) AS rank
          FROM adc)
    WHERE rank <= {_ADC_K}
    """,
    tags=("ann", "ivf", "pq", "adc", "residual", "embeddings"),
)
def q221_ivfadc_residual(spark, sf_dir):
    """IVFADC with RESIDUAL product quantization — the full Jegou et
    al. 2011 formulation that q214 simplifies: PQ codes are learned on
    r = x − c(cell) rather than on raw vectors, which is what makes
    the fine quantizer's budget go to the DELTA around each coarse
    centroid instead of re-describing the centroid itself; the query
    side must therefore build one LUT PER PROBED CELL (q − c(cell) vs
    the codebook) — the extra lut key that distinguishes real IVFADC
    from raw-PQ ADC. All stages are the q214 packed kernels: coarse
    assignment and per-subspace code choice are zip_with +
    exact-decimal folds (n·k and n·S·k agg rows — no d-factor), the
    residual subtraction is a plain per-element double subtraction
    (bit-identical in both engines), and candidates are scored from
    4-int codes with a broadcast LUT — codes-only shuffle. The oracle
    replays assignment, residuals, codebook, codes, per-cell LUTs,
    and ranking in DuckDB CTEs; hash-identical at three SFs."""
    e = table(spark, sf_dir, "embeddings")
    # NULL embeddings have no PQ codes / no cell (r12 contract; the
    # oracle's unnest() drops them for free)
    ev = e.where(F.col("embedding").isNotNull()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).transform(_ckpt)

    def fold_sq(a, b):
        return F.aggregate(
            F.zip_with(
                a, b,
                lambda x, c: F.round((x - c) * (x - c), 12).cast(
                    "decimal(28,12)"
                ),
            ),
            F.lit(0).cast("decimal(28,12)"),
            lambda acc, t: (acc + t).cast("decimal(28,12)"),
        )

    def subspaces(df, keys, vec="rv"):
        return df.select(
            *keys,
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("s"),
            vec,
        ).select(
            *keys, "s",
            F.slice(vec, F.col("s") * 16 + 1, 16).alias("sv"),
        )

    seeds_p = ev.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("v").alias("cv"),
        F.lit(1).alias("_j"),
    )
    corpus_v = ev.where(F.col("vec_id") >= 5).withColumn("_j", F.lit(1))
    queries_v = ev.where(F.col("vec_id") < 5).withColumn("_j", F.lit(1))

    dc = corpus_v.join(F.broadcast(seeds_p), "_j").select(
        "vec_id", "cid", fold_sq(F.col("v"), F.col("cv")).alias("dist")
    )
    w_cell = Window.partitionBy("vec_id").orderBy("dist", "cid")
    cell = (
        dc.withColumn("rn", F.row_number().over(w_cell))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cell"))
    )

    # corpus residuals: one zip_with against the assigned centroid
    resid = (
        corpus_v.join(cell, "vec_id")
        .join(
            F.broadcast(
                seeds_p.select(F.col("cid").alias("cell"), "cv")
            ),
            "cell",
        )
        .select(
            "vec_id", "cell",
            F.zip_with(
                F.col("v"), F.col("cv"), lambda x, c: x - c
            ).alias("rv"),
        )
    )
    cb_p = subspaces(
        resid.where(F.col("vec_id") < 9).select(
            (F.col("vec_id") - 5).cast("int").alias("pcid"), "rv"
        ),
        ["pcid"],
    ).select("pcid", "s", F.col("sv").alias("csv"))

    dpq = subspaces(resid, ["vec_id"]).join(F.broadcast(cb_p), "s").select(
        "vec_id", "s", "pcid",
        fold_sq(F.col("sv"), F.col("csv")).alias("dist"),
    )
    w_code = Window.partitionBy("vec_id", "s").orderBy("dist", "pcid")
    codes = (
        dpq.withColumn("rn", F.row_number().over(w_code))
        .where(F.col("rn") == 1)
        .select("vec_id", "s", F.col("pcid").alias("code"))
    )

    dq = queries_v.join(F.broadcast(seeds_p), "_j").select(
        "vec_id", "cid", fold_sq(F.col("v"), F.col("cv")).alias("dist")
    )
    w_probe = Window.partitionBy("vec_id").orderBy("dist", "cid")
    probe = (
        dq.withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= _ADC_PROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("cell"))
    )

    # query residual per probed cell -> one LUT per (query, cell)
    qres = (
        probe.join(
            queries_v.select(F.col("vec_id").alias("query_id"), "v"),
            "query_id",
        )
        .join(
            F.broadcast(
                seeds_p.select(F.col("cid").alias("cell"), "cv")
            ),
            "cell",
        )
        .select(
            "query_id", "cell",
            F.zip_with(
                F.col("v"), F.col("cv"), lambda x, c: x - c
            ).alias("rv"),
        )
    )
    lut = subspaces(qres, ["query_id", "cell"]).join(
        F.broadcast(cb_p), "s"
    ).select(
        "query_id", "cell", "s", "pcid",
        fold_sq(F.col("sv"), F.col("csv")).alias("pdist"),
    )

    cand = (
        probe.join(cell, "cell")
        .join(codes, "vec_id")
        .select(
            "query_id", "cell", "vec_id", "s",
            F.col("code").alias("pcid"),
        )
    )
    adc = (
        cand.join(F.broadcast(lut), ["query_id", "cell", "s", "pcid"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pdist").alias("approx_dist"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "approx_dist",
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        "approx_dist", "neighbor_id"
    )
    return (
        adc.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .where(F.col("rank") <= _ADC_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("approx_dist").cast("double"), 9).alias(
                "approx_dist"
            ),
            "rank",
        )
    )
