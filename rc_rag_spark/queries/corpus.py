"""Corpus-construction query entries (operators/corpus.py): inverted
index, BM25, TF-IDF keywords, token-budget packing, stratified
sampling — each hash-checked against an independent DuckDB
formulation over the documents table."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.checkpoints import ckpt as _ckpt
from rc_rag_spark.operators import corpus as C
from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table

# DuckDB twin of functions/text.py simple_tokenize (same idiom as the
# dedup_sim module)
_TOKS_SQL = "regexp_extract_all(lower(text), '[\\pL\\pN\\pM]+|[^\\pZ\\pC]')"


@register(
    "q106_inverted_index",
    sql=f"""
    WITH t AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
    )
    SELECT token, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS total_tf,
           array_to_string(list_sort(list_distinct(list(doc_id))), ',')
               AS postings
    FROM t GROUP BY token
    """,
    tags=("corpus", "index"),
)
def q106_inverted_index(spark, sf_dir):
    """Posting lists over the documents table: per token, document
    frequency, total occurrences, sorted doc-id list."""
    return C.inverted_index(table(spark, sf_dir, "documents"))


_BM25_TERMS = ("spark", "hash", "vector")
_BM25_K1, _BM25_B = 1.2, 0.75

# Shared DuckDB BM25 CTE chain (q108 final-scores + q154's lexical arm
# both interpolate this — one home for the oracle-side formulation).
_BM25_SQL_CTES = f"""
    d AS (
        SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ),
    docs AS (SELECT doc_id, len(toks) AS dl, toks FROM d),
    stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM docs),
    tf AS (
        SELECT doc_id, dl, token, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS token FROM docs)
        WHERE token IN {tuple(_BM25_TERMS)!r}
        GROUP BY doc_id, dl, token
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    scored AS (
        SELECT doc_id,
               CAST(round(
                   ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
                   * tf * {_BM25_K1 + 1.0}
                   / (tf + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B} * dl
                          / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))),
                   9) AS DECIMAL(28,9)) AS s
        FROM tf JOIN dfreq USING (token) CROSS JOIN stats
    )"""


@register(
    "q108_bm25_scores",
    sql=f"""
    WITH {_BM25_SQL_CTES}
    SELECT doc_id, COUNT(*) AS n_hits,
           round(CAST(SUM(s) AS DOUBLE), 6) AS score
    FROM scored GROUP BY doc_id
    """,
    tags=("corpus", "retrieval", "bm25"),
)
def q108_bm25_scores(spark, sf_dir):
    """Lexical BM25 retrieval scores for a 3-term query over the
    documents table (Lucene idf; per-term scores summed exactly in
    DECIMAL so partial-agg order cannot drift the total)."""
    return C.bm25_scores(
        table(spark, sf_dir, "documents"),
        _BM25_TERMS, k1=_BM25_K1, b=_BM25_B,
    )


@register(
    "q109_tfidf_keywords",
    sql=f"""
    WITH t AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    scored AS (
        SELECT doc_id, token, tf, df,
               round(tf * ln(CAST(n AS DOUBLE) / df), 9) AS tfidf
        FROM tf JOIN dfreq USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, tfidf, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
    tags=("corpus", "keywords"),
)
def q109_tfidf_keywords(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (rounded score ordering,
    term-string tiebreak on both sides)."""
    return C.tfidf_topk_terms(table(spark, sf_dir, "documents"), k=3)


_PACK_BUDGET = 2000


@register(
    "q107_pack_batches",
    sql=f"""
    WITH RECURSIVE d AS (
        SELECT doc_id, lang, len({_TOKS_SQL}) AS n_tokens FROM documents
    ),
    -- MATERIALIZED: the recursive walk joins `numbered` once per
    -- recursion level; inlining would re-tokenize the corpus each level
    numbered AS MATERIALIZED (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY doc_id)
            AS rn
        FROM d
    ),
    walk(lang, rn, n_tokens, acc, batch) AS (
        SELECT lang, rn, n_tokens, n_tokens, 0 FROM numbered WHERE rn = 1
        UNION ALL
        SELECT n.lang, n.rn, n.n_tokens,
               CASE WHEN w.acc > 0 AND w.acc + n.n_tokens > {_PACK_BUDGET}
                    THEN n.n_tokens ELSE w.acc + n.n_tokens END,
               CASE WHEN w.acc > 0 AND w.acc + n.n_tokens > {_PACK_BUDGET}
                    THEN w.batch + 1 ELSE w.batch END
        FROM walk w JOIN numbered n
          ON n.lang IS NOT DISTINCT FROM w.lang AND n.rn = w.rn + 1
    )
    SELECT lang, batch AS batch_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
    FROM walk GROUP BY lang, batch
    """,
    tags=("corpus", "packing"),
)
def q107_pack_batches(spark, sf_dir):
    """Token-budget training-batch packing, sharded by language: greedy
    sequential fill in doc_id order (grouped-map pandas walk per
    shard); the oracle replays the identical walk as a recursive CTE —
    an entirely different formulation of the same sequential state."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.size(C.simple_tokenize("text")).alias("n_tokens"),
    )
    packed = C.pack_token_budget(
        d, _PACK_BUDGET, token_count_col="n_tokens", shard_col="lang"
    )
    return packed.groupBy("lang", "batch_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("batch_tokens"),
    )


_SAMPLE_RATES = {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.75, "zh": 0.0}


@register(
    "q110_stratified_sample",
    sql=f"""
    WITH u AS (
        SELECT doc_id, lang,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept,
           array_to_string(list_sort(list_distinct(list(doc_id))), ',')
               AS kept_ids
    FROM u
    WHERE u < CASE lang {' '.join(f"WHEN '{s}' THEN {r}"
                                  for s, r in sorted(_SAMPLE_RATES.items()))}
              ELSE 0.0 END
    GROUP BY lang
    """,
    tags=("corpus", "sampling"),
)
def q110_stratified_sample(spark, sf_dir):
    """Per-language deterministic downsampling by key hash (up/down
    mix: de keeps all, zh drops all, others fractional); the kept-id
    list is part of the check so the exact membership — not just the
    counts — is pinned."""
    kept = C.stratified_hash_sample(
        table(spark, sf_dir, "documents"), _SAMPLE_RATES,
        strata_col="lang", id_col="doc_id",
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set(F.col("doc_id"))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("kept_ids"),
    )


@register(
    "q120_repetition_stats",
    sql="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
    u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM u GROUP BY doc_id, tok),
    ts AS (SELECT doc_id, MAX(c) AS max_c, SUM(c) AS n,
                  COUNT(*) AS n_distinct
           FROM tc GROUP BY doc_id),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1]))
                      AS bigram
           FROM t),
    bc AS (SELECT doc_id, bigram, COUNT(*) AS c
           FROM bg GROUP BY doc_id, bigram),
    bs AS (SELECT doc_id, MAX(c) AS max_bg, SUM(c) AS n_bg
           FROM bc GROUP BY doc_id)
    SELECT ts.doc_id,
           CAST(ts.max_c AS DOUBLE) / ts.n AS top_token_frac,
           CAST(ts.n_distinct AS DOUBLE) / ts.n AS distinct_ratio,
           CAST(bs.max_bg AS DOUBLE) / bs.n_bg AS top_bigram_frac
    FROM ts JOIN bs ON bs.doc_id = ts.doc_id
    """,
    tags=("corpus", "quality", "repetition"),
)
def q120_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals per document: most-frequent
    token fraction, distinct-token ratio, most-frequent-bigram
    fraction. Pure explode→groupBy — the shuffle key is
    (doc_id, token), so at 100 TB this is an ordinary partial-agg
    shuffle with no per-doc data ever concentrated on one task (unlike
    a collect_list formulation, which would OOM on a pathological
    doc). Counts are exact integers; each ratio divides the same two
    integers on both engines, so hashes can't drift."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_toks")
    )
    tok_stats = (
        t.select("doc_id", F.explode("_toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("max_c"),
            F.sum("c").alias("n"),
            F.count("*").alias("n_distinct"),
        )
    )
    bigram_stats = (
        t.select(
            "doc_id",
            F.explode(
                # size(_toks)=1 would make sequence(1, 0) step DOWN and
                # emit two phantom NULL bigrams; DuckDB's range(1, 1) is
                # empty, so guard to an empty array (explode drops the
                # row) and single-token docs fall out of the inner join
                # on both engines.
                F.expr(
                    "CASE WHEN size(_toks) >= 2 THEN"
                    " transform(sequence(1, size(_toks) - 1),"
                    " i -> concat(_toks[i-1], ' ', _toks[i]))"
                    " ELSE array() END"
                )
            ).alias("bigram"),
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bg"), F.sum("c").alias("n_bg"))
    )
    return tok_stats.join(bigram_stats, "doc_id").select(
        "doc_id",
        (F.col("max_c").cast("double") / F.col("n")).alias("top_token_frac"),
        (F.col("n_distinct").cast("double") / F.col("n"))
        .alias("distinct_ratio"),
        (F.col("max_bg").cast("double") / F.col("n_bg"))
        .alias("top_bigram_frac"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"555-[0-9]{4}"


@register(
    "q121_pii_scrub",
    sql=f"""
    WITH payload AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com tel 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS INTEGER)
               AS n_phones,
           regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
    FROM payload
    """,
    tags=("corpus", "pii"),
)
def q121_pii_scrub(spark, sf_dir):
    """PII redaction pass: detect-and-replace emails and phone-shaped
    strings, with per-doc match counts for audit. The fixture corpus
    carries no real PII, so the payload plants one deterministic
    email + phone per row — the operator under test is the scrub
    itself (global regexp_replace; Spark replaces all matches by
    default, the DuckDB twin needs the 'g' flag). Narrow per-row
    projection: no shuffle at any scale."""
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    p = d.select("doc_id", raw.alias("_raw"))
    return p.select(
        "doc_id",
        F.size(F.regexp_extract_all("_raw", F.lit(_EMAIL_RE), F.lit(0)))
        .alias("n_emails"),
        F.size(F.regexp_extract_all("_raw", F.lit(_PHONE_RE), F.lit(0)))
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("_raw", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("scrubbed"),
    )


@register(
    "q135_chunk_documents",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    c AS (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks), 24)) AS start
          FROM t)
    SELECT doc_id,
           CAST((start - 1) / 24 AS INTEGER) AS chunk_idx,
           CAST(len(toks[start:start + 31]) AS INTEGER) AS n_chunk_tokens,
           array_to_string(toks[start:start + 31], ' ') AS chunk_text
    FROM c
    """,
    tags=("corpus", "chunking"),
)
def q135_chunk_documents(spark, sf_dir):
    """Training-corpus chunking: fixed 32-token windows with stride 24
    (8-token overlap so no span is lost at a boundary), the standard
    LLM-pretraining document split. Pure explode over per-row token
    offsets — bounded fan-out ceil(n/stride) per doc, no shuffle at
    all until a downstream groupBy, so at 100 TB this runs at scan
    speed with chunk rows streaming straight to the sink. Exact
    membership and ordering are hash-checked."""
    d = table(spark, sf_dir, "documents")
    chunk, stride = 32, 24
    t = d.select("doc_id", F.split("text", " ").alias("toks"))
    # NULL text must chunk to ZERO rows (the oracle's
    # generate_series(1, NULL, 24) unnests to nothing); greatest(size,
    # 1) alone would turn size(NULL)=NULL into one phantom chunk.
    starts = F.when(
        F.col("toks").isNotNull(),
        F.sequence(
            F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(stride)
        ),
    ).otherwise(F.array().cast("array<int>"))
    c = t.select("doc_id", "toks", F.explode(starts).alias("start"))
    piece = F.slice("toks", F.col("start"), chunk)
    return c.select(
        "doc_id",
        ((F.col("start") - 1) / stride).cast("int").alias("chunk_idx"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


@register(
    "q137_fixed_size_sample",
    sql="""
    WITH r AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
    SELECT lang, COUNT(*) AS n_kept,
           array_to_string(list_transform(list_sort(list(doc_id)),
                                          x -> CAST(x AS VARCHAR)), ',')
        AS kept_ids
    FROM r WHERE rk <= 5 GROUP BY lang
    """,
    tags=("corpus", "sampling", "reservoir"),
)
def q137_fixed_size_sample(spark, sf_dir):
    """Fixed-SIZE deterministic sample per stratum (q110 is
    fixed-RATE): rank docs by md5(doc_id) within each language and
    keep the first 5 — a deterministic, partition-independent
    'reservoir' that any re-run reproduces exactly. Scale shape: one
    window shuffle on the stratum key; at 100 TB replace the full
    window sort with per-partition top-k then a final merge (the
    brute_force_topk_pruned trick) — but the membership contract
    stays identical, which is what the hash check pins."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    kept = d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
    return (
        kept.where(F.col("rk") <= 5)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("kept_ids"),
        )
    )


@register(
    "q154_rrf_hybrid_fusion",
    sql=f"""
    WITH {_BM25_SQL_CTES},
    lex AS (SELECT doc_id, round(CAST(SUM(s) AS DOUBLE), 6) AS score
            FROM scored GROUP BY doc_id),
    lexrank AS (
        SELECT doc_id, CAST(r AS INTEGER) AS r_lex
        FROM (SELECT doc_id, row_number() OVER (
                  ORDER BY score DESC, doc_id) AS r FROM lex)
        WHERE r <= 100),
    qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
    dense AS (
        SELECT e.vec_id AS doc_id,
               list_dot_product(e.embedding::DOUBLE[], qv.v)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                        e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(qv.v, qv.v))) AS sim
        FROM embeddings e CROSS JOIN qv WHERE e.vec_id != 0),
    denserank AS (
        SELECT doc_id, CAST(r AS INTEGER) AS r_dense
        FROM (SELECT doc_id, row_number() OVER (
                  ORDER BY sim DESC, doc_id) AS r FROM dense)
        WHERE r <= 100),
    fused AS (
        SELECT coalesce(l.doc_id, dn.doc_id) AS doc_id,
               l.r_lex, dn.r_dense,
               round(coalesce(1.0 / (60 + l.r_lex), 0.0)
                     + coalesce(1.0 / (60 + dn.r_dense), 0.0), 9) AS rrf
        FROM lexrank l FULL OUTER JOIN denserank dn
          ON dn.doc_id = l.doc_id)
    SELECT doc_id, r_lex, r_dense, rrf
    FROM (SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rk
          FROM fused)
    WHERE rk <= 20
    """,
    tags=("retrieval", "hybrid", "rrf"),
)
def q154_rrf_hybrid_fusion(spark, sf_dir):
    """Hybrid retrieval via Reciprocal Rank Fusion: the lexical arm is
    q108's BM25 ranking, the dense arm is exact cosine against a fixed
    query embedding (vec_id 0), and each document's fused score is
    Σ 1/(60+rank) over the arms it appears in (missing arm = 0
    contribution), top-20 emitted. This is the standard
    sparse-'+'-dense RAG retrieval shape. Scale: each arm is
    truncated to its top-100 list BEFORE ranking — Spark-side that's
    a TakeOrdered per-partition heap merge, never a global sort or a
    corpus-wide rank window — so the fusion join and the final rank
    window see ≤100 rows per arm regardless of corpus size (the dense
    arm swaps in the q90 pruned top-k at scale). RRF terms are single
    IEEE divides of exact integers, so the fused scores
    hash-match."""
    from pyspark.sql.window import Window

    from rc_rag_spark.functions.vectors import cosine

    lex = (
        C.bm25_scores(
            table(spark, sf_dir, "documents"),
            _BM25_TERMS, k1=_BM25_K1, b=_BM25_B,
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(100)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), "doc_id"))
            .cast("int")
            .alias("r_lex"),
        )
    )
    e = table(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("_qvec")
    )
    dense = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("_qvec")).alias("sim"),
        )
        .orderBy(F.desc("sim"), "doc_id")
        .limit(100)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("sim"), "doc_id"))
            .cast("int")
            .alias("r_dense"),
        )
    )
    fused = (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_lex",
            "r_dense",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(60) + F.col("r_lex")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(60) + F.col("r_dense")), F.lit(0.0)
                ),
                9,
            ).alias("rrf"),
        )
    )
    w = Window.orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 20)
        .drop("rk")
    )


@register(
    "q155_pmi_collocations",
    sql="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
    uni AS (
        SELECT tok, COUNT(*) AS c
        FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok),
    tot AS (SELECT SUM(c) AS t_uni FROM uni),
    bgx AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i+1]))
                   AS bigram
        FROM t WHERE len(toks) >= 2),
    bga AS (SELECT bigram, COUNT(*) AS c FROM bgx GROUP BY bigram),
    btot AS (SELECT SUM(c) AS t_bg FROM bga),
    scored AS (
        SELECT split_part(bigram, ' ', 1) AS w1,
               split_part(bigram, ' ', 2) AS w2,
               bga.c AS n_pair,
               round(ln((CAST(bga.c AS DOUBLE) / t_bg)
                        / ((CAST(u1.c AS DOUBLE) / t_uni)
                           * (CAST(u2.c AS DOUBLE) / t_uni))), 9) AS pmi
        FROM bga
        JOIN uni u1 ON u1.tok = split_part(bigram, ' ', 1)
        JOIN uni u2 ON u2.tok = split_part(bigram, ' ', 2)
        CROSS JOIN tot CROSS JOIN btot
        WHERE bga.c >= 5)
    SELECT w1, w2, n_pair, pmi
    FROM (SELECT *, row_number() OVER (
              ORDER BY pmi DESC, w1, w2) AS rk FROM scored)
    WHERE rk <= 20
    """,
    tags=("corpus", "collocations", "pmi"),
)
def q155_pmi_collocations(spark, sf_dir):
    """Top-20 PMI collocations: adjacent-token bigrams with count ≥ 5
    scored ln(p(ab)/(p(a)p(b))) against corpus unigram/bigram totals —
    the classic phrase-mining signal for tokenizer/vocab curation.
    Same explode→partial-agg shuffles as q120 (no per-doc
    concentration); the totals attach as broadcast scalars; ranking
    happens on the rounded score with a (w1, w2) tiebreak so the
    top-20 membership is deterministic on both engines."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_toks")
    )
    uni = (
        t.select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("t_uni"))
    bg = (
        t.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(_toks) >= 2 THEN"
                    " transform(sequence(1, size(_toks) - 1),"
                    " i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))"
                    " ELSE array() END"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 5)
    )
    btot = (
        t.select(
            F.greatest(F.size("_toks") - 1, F.lit(0)).alias("nb")
        ).agg(F.sum("nb").alias("t_bg"))
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("u1c"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("u2c"))
    pmi = F.round(
        F.log(
            (F.col("c").cast("double") / F.col("t_bg"))
            / (
                (F.col("u1c").cast("double") / F.col("t_uni"))
                * (F.col("u2c").cast("double") / F.col("t_uni"))
            )
        ),
        9,
    )
    scored = (
        bg.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select("w1", "w2", F.col("c").alias("n_pair"), pmi.alias("pmi"))
    )
    w = Window.orderBy(F.desc("pmi"), "w1", "w2")
    return (
        scored.select("*", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 20)
        .drop("rk")
    )


_DECON_N = 5  # shingle width (tokens); benchmark = doc_id < 10


@register(
    "q157_decontamination",
    sql=f"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
    sh AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(toks) - {_DECON_N} + 2),
                   i -> array_to_string(toks[i:i+{_DECON_N}-1], ' ')))
                   AS s
        FROM t WHERE len(toks) >= {_DECON_N}),
    bench AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id < 10),
    corp  AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id >= 10),
    hits AS (
        SELECT c.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
        FROM corp c JOIN bench b ON b.s = c.s
        GROUP BY c.doc_id, b.doc_id)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_benchmark_docs,
           CAST(SUM(n_shared) AS BIGINT) AS n_shared_shingles,
           array_to_string(list_transform(list_sort(list(bench_id)),
                                          x -> CAST(x AS VARCHAR)), ',')
               AS benchmark_ids
    FROM hits GROUP BY doc_id
    """,
    tags=("corpus", "decontamination", "dedup"),
)
def q157_decontamination(spark, sf_dir):
    """Benchmark decontamination — the training-pipeline step that
    drops documents sharing verbatim n-grams with an eval set. The
    benchmark (doc_id < 10 here) and the corpus are both shingled into
    5-token windows; contamination = a shingle equi-join, grouped per
    (corpus doc, benchmark doc) with the exact shared-shingle count
    and benchmark membership in the hash. Scale shape: identical to
    MinHash candidate generation — the shuffle moves (shingle, id)
    pairs, the join key is the shingle hash, and the benchmark side is
    tiny (broadcastable); never an all-pairs comparison."""
    d = table(spark, sf_dir, "documents")
    n = _DECON_N
    # Stage the token array BEFORE the shingle lambda (the q176 /
    # minhash_det_pairs discipline): HOF lambdas are interpreted, so
    # an inline split() would re-tokenize the document once per
    # shingle element — O(d²) per doc instead of O(d).
    sh = (
        d.select("doc_id", F.expr("split(trim(text), '\\\\s+')").alias("_tk"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN size(_tk) >= {n} THEN"
                    f" transform(sequence(1, size(_tk) - {n} + 1),"
                    f" i -> array_join(slice(_tk, i, {n}), ' '))"
                    " ELSE array() END"
                )
            ).alias("s"),
        )
        .distinct()
    )
    bench = sh.where(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id"), "s"
    )
    corp = sh.where(F.col("doc_id") >= 10)
    hits = (
        corp.join(F.broadcast(bench), "s")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_benchmark_docs"),
        F.sum("n_shared").cast("bigint").alias("n_shared_shingles"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("bench_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("benchmark_ids"),
    )


@register(
    "q158_unigram_logprob",
    sql="""
    WITH t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
                   AS tok
        FROM documents),
    uni AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok),
    tot AS (SELECT SUM(c) AS n FROM uni),
    scored AS (
        SELECT t.doc_id,
               CAST(round(-ln(CAST(uni.c AS DOUBLE) / tot.n), 12)
                    AS DECIMAL(24,12)) AS nll
        FROM t JOIN uni ON uni.tok = t.tok CROSS JOIN tot)
    SELECT doc_id, COUNT(*) AS n_tokens,
           round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 9)
               AS mean_nll
    FROM scored GROUP BY doc_id
    """,
    tags=("corpus", "quality", "lm"),
)
def q158_unigram_logprob(spark, sf_dir):
    """Unigram language-model surprisal per document — the
    perplexity-proxy quality filter (KenLM-style filtering with the
    simplest possible LM): corpus unigram probabilities, then each
    document's mean negative log-likelihood. High-NLL docs are
    gibberish/rare-token soup; low-NLL docs are repetitive boilerplate
    — both filter targets. Scale: one (token) partial-agg for the LM,
    one broadcast-joinable total, one (doc, token) shuffle for the
    per-doc fold; each -ln(p) term is quantized to DECIMAL before the
    exact per-doc sum so partial-agg order can't drift the mean."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    uni = t.groupBy("tok").agg(F.count("*").alias("c"))
    tot = uni.agg(F.sum("c").alias("n"))
    nll = F.round(
        -F.log(F.col("c").cast("double") / F.col("n")), 12
    ).cast("decimal(24,12)")
    return (
        t.join(uni, "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum("nll").cast("double") / F.count("*"), 9
            ).alias("mean_nll"),
        )
    )


@register(
    "q159_mixture_weights",
    sql="""
    WITH tok AS (
        SELECT source, lang,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_toks
        FROM documents),
    grp AS (SELECT source, lang, SUM(n_toks) AS toks
            FROM tok GROUP BY source, lang),
    tot AS (SELECT SUM(toks) AS t FROM grp),
    w AS (
        SELECT source, lang, toks,
               CAST(round(sqrt(CAST(toks AS DOUBLE) / tot.t), 12)
                    AS DECIMAL(24,12)) AS raw_w
        FROM grp CROSS JOIN tot),
    z AS (SELECT SUM(raw_w) AS zsum FROM w)
    SELECT source, lang, CAST(toks AS BIGINT) AS n_tokens,
           round(CAST(raw_w AS DOUBLE) / CAST(zsum AS DOUBLE), 9)
               AS sample_weight
    FROM w CROSS JOIN z
    """,
    tags=("corpus", "mixture", "sampling"),
)
def q159_mixture_weights(spark, sf_dir):
    """Training-mixture sampling weights per (source, lang) domain:
    token share raised to temperature τ=0.5 (sqrt — temperature
    flattening upweights small domains, and sqrt is the one
    non-rational power both engines compute identically under IEEE),
    renormalized to sum to 1. This is the domain-reweighting table a
    data loader consumes. Tiny result; the only real work is the
    per-domain token count — one partial-agg scan. The sqrt terms are
    quantized to DECIMAL before the normalizing sum, so the weights
    are bit-stable under any partitioning."""
    d = table(spark, sf_dir, "documents")
    grp = (
        d.select(
            "source", "lang",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_toks"),
        )
        .groupBy("source", "lang")
        .agg(F.sum("n_toks").alias("toks"))
    )
    tot = grp.agg(F.sum("toks").alias("t"))
    w = grp.crossJoin(F.broadcast(tot)).select(
        "source", "lang", "toks",
        F.round(
            F.sqrt(F.col("toks").cast("double") / F.col("t")), 12
        )
        .cast("decimal(24,12)")
        .alias("raw_w"),
    )
    z = w.agg(F.sum("raw_w").alias("zsum"))
    return w.crossJoin(F.broadcast(z)).select(
        "source", "lang",
        F.col("toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.col("raw_w").cast("double") / F.col("zsum").cast("double"), 9
        ).alias("sample_weight"),
    )


# --------------------------------------------------------------------------
# q222 — content-defined chunking (rolling-hash CDC) + cross-doc dup chunks.

_CDC_W = 8          # rolling window (chars)
_CDC_B = 31         # polynomial base
_CDC_MOD = 1048573  # prime modulus
_CDC_MASK = 64      # boundary when h % 64 == 0 -> expected ~64-char chunks
_CDC_LEN = 256      # analyzed prefix per document


def _cdc_chunk_batches(batches):
    """The q222 CDC kernel, module-level so tests can drive it
    directly on pandas batches (Spark-free) — e.g. the
    shift-robustness property test in tests/test_governance_ops.py.
    Expects columns (doc_id, s) with s exactly _CDC_LEN chars;
    yields (doc_id, ch, clen) at chunk granularity."""
    import hashlib

    import numpy as np
    import pandas as pd

    from rc_rag_spark.faultinject import maybe_inject_fault

    maybe_inject_fault('cdc_chunk')
    for pdf in batches:
        ids, chs, lens = [], [], []
        # NULL text has no content to chunk: drop those rows before
        # the codepoint pack ("".join would choke on None)
        pdf = pdf[pdf["s"].notna()]
        if len(pdf):
            # utf-32-le -> one uint32 CODEPOINT per char, matching the
            # oracle's ord() for ALL text (latin-1 raised on any
            # codepoint > U+00FF and killed the task)
            arr = np.frombuffer(
                "".join(pdf["s"]).encode("utf-32-le"), dtype=np.uint32
            ).reshape(len(pdf), _CDC_LEN).astype(np.int64)
            acc = np.zeros(
                (len(pdf), _CDC_LEN - _CDC_W + 1), dtype=np.int64
            )
            for j in range(_CDC_W):
                acc += (
                    arr[:, _CDC_W - 1 - j : _CDC_LEN - j]
                    * (_CDC_B ** j)
                )
            is_end = (acc % _CDC_MOD) % _CDC_MASK == 0
            is_end[:, -1] = True
            for row, (doc_id, s) in enumerate(
                zip(pdf["doc_id"], pdf["s"])
            ):
                b = 0
                for k in np.nonzero(is_end[row])[0]:
                    e = int(k) + _CDC_W  # 1-based end position
                    piece = s[b:e]
                    ids.append(doc_id)
                    chs.append(
                        hashlib.md5(piece.encode("utf-8")).hexdigest()
                    )
                    lens.append(e - b)
                    b = e
        yield pd.DataFrame(
            {"doc_id": ids, "ch": chs, "clen": lens}
        )


@register(
    "q222_cdc_chunking",
    sql=f"""
    WITH p AS (
        SELECT doc_id, rpad(substr(text, 1, {_CDC_LEN}), {_CDC_LEN}, 'x') AS s
        FROM documents),
    h AS (
        SELECT doc_id, s, i,
               ({' + '.join(f"CAST(ord(substr(s, i - {j}, 1)) AS BIGINT)"
                            f" * {_CDC_B**j}"
                            for j in range(_CDC_W))}) % {_CDC_MOD} AS hv
        FROM p, (SELECT unnest(generate_series({_CDC_W}, {_CDC_LEN})) AS i) g),
    ends AS (
        SELECT doc_id, s, i AS e FROM h
        WHERE hv % {_CDC_MASK} = 0 OR i = {_CDC_LEN}),
    chunks AS (
        SELECT doc_id, e,
               COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0)
                   + 1 AS b,
               s
        FROM ends),
    cs AS (
        SELECT doc_id, md5(substr(s, b, e - b + 1)) AS ch,
               e - b + 1 AS clen
        FROM chunks),
    global_cnt AS (
        SELECT ch, COUNT(DISTINCT doc_id) AS nd FROM cs GROUP BY ch)
    SELECT cs.doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_chunks,
           CAST(SUM(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END) AS INTEGER)
               AS dup_chunks,
           round(AVG(cs.clen), 6) AS avg_len,
           CAST(MAX(cs.clen) AS INTEGER) AS max_len
    FROM cs JOIN global_cnt g ON g.ch = cs.ch
    GROUP BY cs.doc_id
    """,
    tags=("corpus", "dedup", "cdc", "chunking"),
)
def q222_cdc_chunking(spark, sf_dir):
    """Content-defined chunking — the rolling-hash primitive behind
    shift-robust corpus dedup (Rabin/FastCDC lineage, public): a
    boundary lands wherever the polynomial hash of the trailing
    {_CDC_W}-char window satisfies h % {_CDC_MASK} == 0, so an edit
    moves only the boundaries NEAR it and unchanged content re-chunks
    identically — which is exactly what lets duplicated passages be
    found across documents regardless of offset. Each document's
    {_CDC_LEN}-char prefix is chunked, chunks are md5-keyed, and a
    global distinct-doc count per key flags cross-document duplicate
    chunks (dup_chunks per doc). Everything is integer arithmetic +
    md5 on identical substrings, so DuckDB replays it exactly. Scale
    shape: the position stream is a bounded explode per document
    (native, codegen'd hash polynomial — no UDF), boundaries collapse
    it ~{_CDC_MASK}:1 before the only shuffle (the chunk-hash count),
    and the per-doc report is one partial agg. A production variant
    with min/max chunk clamps drops into the same plan."""
    d = table(spark, sf_dir, "documents")
    p = d.select(
        "doc_id",
        F.rpad(F.substring("text", 1, _CDC_LEN), _CDC_LEN, "x").alias("s"),
    )

    # Boundary scan + chunk hashing as ONE vectorized Arrow batch
    # kernel. Two slower shapes were measured and rejected:
    #   - position explode + window lag (r7): duplicates the 256-char
    #     payload once per position and shuffles it — 6.45x growth at
    #     10x documents (SCALING.md);
    #   - native higher-order filter/zip_with: no explode, but Spark
    #     evaluates HOF lambdas INTERPRETED per element (249
    #     positions x 8 substr calls per doc) — measured 15x slower
    #     than the explode at sf0.1.
    # The numpy kernel computes all window hashes for a whole Arrow
    # batch with 8 vectorized shift-multiply passes, then md5s the
    # ~len/mask chunks per doc; rows leave the kernel already at
    # chunk granularity (32-hex key + length), so nothing downstream
    # ever carries the payload.
    # Optimization round 16 (guide §5 reuse): the chunk stream is
    # referenced TWICE (the global per-chunk distinct-doc count and
    # the per-doc join), so the Arrow kernel — the whole cost of this
    # anchor — executed twice per run; the checkpoint materializes
    # the narrow (doc_id, ch, clen) rows once. At 100 TB this is the
    # persisted chunk table every CDC dedup pipeline keeps anyway.
    cs = p.mapInPandas(
        _cdc_chunk_batches, "doc_id long, ch string, clen int"
    ).transform(_ckpt)
    global_cnt = cs.groupBy("ch").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        cs.join(global_cnt, "ch")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum((F.col("nd") > 1).cast("int")).cast("int").alias(
                "dup_chunks"
            ),
            F.round(F.avg("clen"), 6).alias("avg_len"),
            F.max("clen").cast("int").alias("max_len"),
        )
    )


@register(
    "q237_temperature_source_mixing",
    sql="""
    WITH c AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    w AS (
        SELECT source, n_docs,
               CAST(round(sqrt(n_docs), 9) AS DECIMAL(28,9)) AS w
        FROM c),
    t AS (
        SELECT CAST(SUM(w) AS DOUBLE) AS tw, SUM(n_docs) AS nt FROM w),
    r AS (
        SELECT source, n_docs,
               least(1.0,
                     CAST(CAST(floor(0.5 * nt) AS BIGINT) AS DOUBLE)
                     * (CAST(w AS DOUBLE) / tw) / n_docs) AS rate
        FROM w, t),
    u AS (
        SELECT source,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        FROM documents)
    SELECT r.source, r.n_docs,
           COUNT(CASE WHEN u.u < r.rate THEN 1 END) AS n_sampled,
           round(r.rate, 6) AS rate
    FROM u JOIN r ON u.source = r.source
    GROUP BY r.source, r.n_docs, r.rate
    """,
    tags=("curation", "mixing", "sampling"),
)
def q237_temperature_source_mixing(spark, sf_dir):
    """Temperature-scaled source mixing — the data-recipe operator
    behind multi-source LLM corpora (sample source s with probability
    ∝ n_s^α, α=0.5 here, so small sources are up-weighted relative to
    their share): per-source acceptance rate r_s = min(1, N·p_s/n_s)
    for a target budget N = ⌊half the corpus⌋, applied as a
    DETERMINISTIC hash-Bernoulli (md5-prefix uniform in [0,1), the
    q96 idiom) instead of RNG — reproducible across engines, runs,
    partitionings. Numeric discipline: √n_s is rounded then summed as
    DECIMAL so the normalizer is order-independent; every division is
    a single double op replicated verbatim in the oracle. Plan shape:
    tiny per-source dim (aggregate → 20 rows) broadcast back onto the
    fact table — one fact shuffle for the source counts, one
    broadcast join, one final agg; at 100 TB the dim stays tiny, and
    the sample itself never materializes on the driver."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = counts.withColumn(
        "w", F.round(F.sqrt("n_docs"), 9).cast("decimal(28,9)")
    )
    tot = w.agg(
        F.sum("w").cast("double").alias("tw"),
        F.sum("n_docs").alias("nt"),
    )
    rates = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.floor(F.lit(0.5) * F.col("nt")).cast("double")
                * (F.col("w").cast("double") / F.col("tw"))
                / F.col("n_docs"),
            ),
        )
        .select("source", "n_docs", "rate")
    )
    u = d.select(
        "source",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10,
            ).cast("bigint").cast("double")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    return (
        u.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "rate")
        .agg(
            F.count(F.when(F.col("u") < F.col("rate"), 1)).alias(
                "n_sampled"
            )
        )
        .select(
            "source", "n_docs", "n_sampled", F.round("rate", 6).alias("rate")
        )
    )


@register(
    "q238_epoch_shuffle_shards",
    sql="""
    WITH k AS (
        SELECT doc_id, n_chars,
               md5(CAST(doc_id AS VARCHAR) || ':7') AS key,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'),
                                         1, 8)) AS BIGINT) % 8 AS INTEGER)
                   AS shard
        FROM documents),
    p AS (
        SELECT shard, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id)
                   AS pos
        FROM k)
    SELECT shard, COUNT(*) AS n_docs,
           MIN(CASE WHEN pos = 1 THEN doc_id END) AS first_doc,
           CAST(SUM(CAST(pos AS DECIMAL(18,0)) * n_chars) AS DOUBLE)
               AS order_checksum
    FROM p
    GROUP BY shard
    """,
    tags=("curation", "shuffle", "sharding"),
)
def q238_epoch_shuffle_shards(spark, sf_dir):
    """Deterministic epoch shuffle + sharding — the training-order
    operator: every document gets a pseudorandom key md5(doc_id:seed)
    (seed=7 = the epoch), is assigned to one of 8 shards by key
    bucket, and receives its within-shard position by key order. This
    is how a 100 TB corpus is re-shuffled per epoch WITHOUT an RNG or
    a global sort: the md5 key is reproducible on any engine, shard
    assignment is a narrow per-row expression, and ordering is a
    per-shard (partition-local) sort — one hash exchange on shard,
    never a single-partition global ORDER BY. The order_checksum
    (Σ pos·n_chars, exact decimal) pins the COMPLETE per-shard
    permutation: any engine that orders differently breaks the hash;
    first_doc pins the head element directly. Changing the seed
    re-permutes everything; same seed is bit-stable across runs."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":7")))
    k = d.select(
        "doc_id",
        "n_chars",
        key.alias("key"),
        (
            F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % 8
        ).cast("int").alias("shard"),
    )
    p = k.withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("shard").orderBy("key", "doc_id")
        ),
    )
    return p.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.min(F.when(F.col("pos") == 1, F.col("doc_id"))).alias(
            "first_doc"
        ),
        F.sum(F.col("pos").cast("decimal(18,0)") * F.col("n_chars"))
        .cast("double")
        .alias("order_checksum"),
    )


# --------------------------------------------------------------------------
# q246 — preference-pair construction (the DPO/RLHF data-prep shape)


@register(
    "q246_preference_pairs",
    sql="""
    WITH ranked AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rb,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value ASC, event_id) AS rw
        FROM events),
    best AS (SELECT user_id, event_id AS chosen_event_id,
                    value AS chosen_value
             FROM ranked WHERE rb = 1),
    worst AS (SELECT user_id, event_id AS rejected_event_id,
                     value AS rejected_value
              FROM ranked WHERE rw = 1)
    SELECT b.user_id, b.chosen_event_id, w.rejected_event_id,
           b.chosen_value, w.rejected_value,
           CAST(CAST(b.chosen_value AS DECIMAL(18,2))
                - CAST(w.rejected_value AS DECIMAL(18,2))
                AS DOUBLE) AS margin
    FROM best b JOIN worst w ON b.user_id = w.user_id
    WHERE b.chosen_event_id != w.rejected_event_id
      AND CAST(b.chosen_value AS DECIMAL(18,2))
          - CAST(w.rejected_value AS DECIMAL(18,2)) >= 50
    """,
    tags=("training", "preference", "dpo"),
)
def q246_preference_pairs(spark, sf_dir):
    """Preference-pair (chosen, rejected) construction — the data-prep
    step behind DPO/RLHF reward modeling, mapped onto the events table
    (user_id = the prompt group, value = the per-response reward):
    within every group take the highest- and lowest-reward responses
    (fully tie-broken on event_id so the pair is deterministic), keep
    groups whose reward MARGIN clears a threshold (weak pairs teach
    nothing), and emit the pair with its margin. The margin arithmetic
    runs in DECIMAL(18,2) — rewards carry two decimals, so chosen
    minus rejected is exact and the >= 50 gate can never flip on
    float noise between engines.

    Scale shape: one hash shuffle on the group key; both extremes come
    from the SAME per-group window sort (Catalyst computes rb and rw
    in one Window node over one Exchange), then a self-join of two
    one-row-per-group sides — at 100 TB this is the standard
    pair-mining plan, and heavy prompt groups (many responses) cost
    only their own partition's sort, never a cross product."""
    e = table(spark, sf_dir, "events")
    wb = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), "event_id"
    )
    ww = Window.partitionBy("user_id").orderBy(
        F.col("value").asc(), "event_id"
    )
    ranked = e.select(
        "user_id", "event_id", "value",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
    )
    best = ranked.where(F.col("rb") == 1).select(
        "user_id",
        F.col("event_id").alias("chosen_event_id"),
        F.col("value").alias("chosen_value"),
    )
    worst = ranked.where(F.col("rw") == 1).select(
        "user_id",
        F.col("event_id").alias("rejected_event_id"),
        F.col("value").alias("rejected_value"),
    )
    margin = F.col("chosen_value").cast("decimal(18,2)") - F.col(
        "rejected_value"
    ).cast("decimal(18,2)")
    return (
        best.join(worst, "user_id")
        .where(
            (F.col("chosen_event_id") != F.col("rejected_event_id"))
            & (margin >= 50)
        )
        .select(
            "user_id", "chosen_event_id", "rejected_event_id",
            "chosen_value", "rejected_value",
            margin.cast("double").alias("margin"),
        )
    )


# --------------------------------------------------------------------------
# q247 — token-budget corpus selection (quality-threshold knapsack)

# Integer-exact quality bucket: letters-per-kilochar, via integer div.
# Spark interpolates this verbatim; the DuckDB twin needs the 'g'
# flag (DuckDB regexp_replace is first-match-only by default).
_Q247_LETTERS = "length(regexp_replace(text, '[^A-Za-z]', ''))"
_Q247_LETTERS_DUCK = "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"


# Selection tail shared by q247 (proxy tokens) and q276 (real BPE
# tokens): expects a CTE `d(doc_id, source, tokens, bucket)` to be in
# scope; spends half the corpus's total tokens best-bucket-first.
_BUDGET_SEL_CTES = """
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) // 2 AS budget FROM d),
    grid AS (
        SELECT bucket, CAST(SUM(tokens) AS BIGINT) AS btok,
               CAST(SUM(CAST(SUM(tokens) AS BIGINT)) OVER (
                   ORDER BY bucket DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM d GROUP BY bucket),
    marked AS (
        SELECT g.bucket, g.btok, g.cum, t.budget,
               CASE WHEN g.cum <= t.budget THEN 'full'
                    WHEN g.cum - g.btok < t.budget THEN 'boundary'
                    ELSE 'out' END AS cls
        FROM grid g, tot t),
    bsel AS (
        SELECT d.doc_id, d.source, d.tokens,
               CAST(SUM(d.tokens) OVER (
                   ORDER BY d.doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS bcum,
               m.budget - (m.cum - m.btok) AS remaining
        FROM d JOIN marked m ON d.bucket = m.bucket
        WHERE m.cls = 'boundary'),
    sel AS (
        SELECT d.doc_id, d.source, d.tokens, 0 AS from_boundary
        FROM d JOIN marked m ON d.bucket = m.bucket
        WHERE m.cls = 'full'
        UNION ALL
        SELECT doc_id, source, tokens, 1
        FROM bsel WHERE bcum <= remaining)"""

# q247/q276 final over the sel CTE; q284 substitutes its own final.
_BUDGET_TAIL_SQL = _BUDGET_SEL_CTES + """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(tokens) AS BIGINT) AS tokens_selected,
           CAST(SUM(from_boundary) AS BIGINT) AS n_from_boundary
    FROM sel GROUP BY source
    """


@register(
    "q247_token_budget_selection",
    sql=f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(ceil(n_chars / 4.0) AS BIGINT) AS tokens,
               (1000 * {_Q247_LETTERS_DUCK}) // n_chars AS bucket
        FROM documents),{_BUDGET_TAIL_SQL}""",
    tags=("training", "selection", "budget"),
)
def q247_token_budget_selection(spark, sf_dir):
    """Quality-filtered corpus selection under a global TOKEN BUDGET —
    the data-curation step that decides which half of a crawl a
    training run actually sees. Naive formulation ("sort all docs by
    quality, take the prefix whose tokens fit the budget") is a global
    sort over every document: dead at 100 TB. The scalable shape used
    here is QUANTILE-THRESHOLD selection:

      1. score every doc with an integer-exact quality bucket
         (letters-per-kilochar via integer division — no float
         boundary can flip a bucket between engines);
      2. aggregate tokens per bucket (grid of <= 1001 rows), and walk
         the grid best-first with a cumulative window: buckets that
         fit entirely are taken whole ('full'), the single bucket
         where the budget crosses becomes the 'boundary';
      3. ONLY the boundary bucket — ~1/1000 of the corpus — gets a
         per-doc ordered prefix-sum to spend the remaining budget
         (deterministic doc_id order).

    So the one true sort touches a thousandth of the data, everything
    else is hash aggregation; this is exactly how budgeted selection
    (quality pruning, dataset mixing under a token cap) runs on real
    pretraining corpora. Output: per-source selected doc/token counts
    plus how many rode the boundary bucket.

    Optimization round 16 (guide §5 reuse): ``d`` is referenced four
    times inside budget_selected_docs, so the full-text quality regexp
    used to run 4x per pass; the checkpoint materializes the narrow
    (doc_id, source, tokens, bucket) rows once. Same values, same
    oracle."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("tokens"),
        F.expr(f"(1000 * {_Q247_LETTERS}) div n_chars").alias("bucket"),
    ).transform(_ckpt)
    return token_budget_select(d)


def token_budget_select(d):
    """Quantile-threshold budget selection over a
    (doc_id, source, tokens, bucket) DataFrame — the q247 kernel,
    shared with q276 (real BPE tokens) and q284 (funnel tail).
    Spends half the corpus's total tokens best-bucket-first; only the
    boundary bucket pays a per-doc ordered prefix sum."""
    return (
        budget_selected_docs(d)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_selected"),
            F.sum("tokens").alias("tokens_selected"),
            F.sum("from_boundary").cast("bigint").alias("n_from_boundary"),
        )
    )


def budget_selected_docs(d):
    """The selected-document set (doc_id, source, tokens,
    from_boundary) BEFORE the per-source rollup — q284's funnel joins
    against this."""
    budget = d.agg(
        F.expr("CAST(SUM(tokens) AS BIGINT) div 2").alias("budget")
    )
    wgrid = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    grid = (
        d.groupBy("bucket")
        .agg(F.sum("tokens").alias("btok"))
        .select("bucket", "btok", F.sum("btok").over(wgrid).alias("cum"))
    )
    marked = grid.crossJoin(F.broadcast(budget)).select(
        "bucket", "btok", "cum", "budget",
        F.when(F.col("cum") <= F.col("budget"), "full")
        .when(F.col("cum") - F.col("btok") < F.col("budget"), "boundary")
        .otherwise("out")
        .alias("cls"),
    )
    full = d.join(
        F.broadcast(marked.where(F.col("cls") == "full").select("bucket")),
        "bucket",
    ).select("doc_id", "source", "tokens", F.lit(0).alias("from_boundary"))
    wb = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    bsel = (
        d.join(
            F.broadcast(
                marked.where(F.col("cls") == "boundary").select(
                    "bucket",
                    (
                        F.col("budget") - (F.col("cum") - F.col("btok"))
                    ).alias("remaining"),
                )
            ),
            "bucket",
        )
        .select(
            "doc_id", "source", "tokens", "remaining",
            F.sum("tokens").over(wb).alias("bcum"),
        )
        .where(F.col("bcum") <= F.col("remaining"))
        .select("doc_id", "source", "tokens", F.lit(1).alias("from_boundary"))
    )
    return full.unionByName(bsel)


# --------------------------------------------------------------------------
# q248 — length-bucketed batching and the padding waste it saves


@register(
    "q248_length_bucket_batching",
    sql="""
    WITH d AS (
        SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS tokens
        FROM documents),
    b AS (
        SELECT doc_id, tokens,
               ntile(8) OVER (ORDER BY tokens NULLS FIRST, doc_id) AS bucket
        FROM d),
    g AS (SELECT CAST(MAX(tokens) AS BIGINT) AS gmax FROM d)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
           CAST(COUNT(*) * MAX(tokens) AS BIGINT) AS padded_tokens,
           CAST(COUNT(*) * g.gmax AS BIGINT) AS padded_global,
           round(CAST(COUNT(*) * MAX(tokens) - SUM(tokens) AS DOUBLE)
                 / (COUNT(*) * MAX(tokens)), 6) AS waste_bucketed,
           round(CAST(COUNT(*) * g.gmax - SUM(tokens) AS DOUBLE)
                 / (COUNT(*) * g.gmax), 6) AS waste_global
    FROM b, g GROUP BY bucket, g.gmax
    """,
    tags=("training", "batching", "padding"),
)
def q248_length_bucket_batching(spark, sf_dir):
    """Length-bucketed batching — the inference/training BATCHER's
    core decision: group sequences of similar token length so each
    batch pads to its own max instead of the corpus max, and measure
    the padding waste each policy burns. Docs are ntile'd into 8
    equal-count buckets over (tokens, doc_id) — the full tie-break
    makes the bucket assignment, and hence every downstream number,
    engine-deterministic. Per bucket: the padded token bill under
    bucketed batching (n x bucket max) vs naive global batching
    (n x corpus max), and both waste ratios.

    Scale note: ntile over a global ORDER BY is a single-partition
    sort — fine for this 500-row demo table, but the 100 TB form
    replaces it with range partitioning on approx token-count
    quantiles (approxQuantile / RangePartitioner), which yields the
    same equal-mass buckets without ever totally ordering the data;
    the per-bucket aggregate is identical from there on. The corpus
    max rides a broadcast one-row cross join, not a second scan
    shuffle."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("tokens"),
    )
    b = d.select(
        "tokens",
        F.ntile(8).over(Window.orderBy("tokens", "doc_id")).alias("bucket"),
    )
    g = d.agg(F.max("tokens").alias("gmax"))
    agg = b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("tokens").alias("min_tokens"),
        F.max("tokens").alias("max_tokens"),
        F.sum("tokens").alias("sum_tokens"),
    )
    return agg.crossJoin(F.broadcast(g)).select(
        "bucket", "n_docs", "min_tokens", "max_tokens", "sum_tokens",
        (F.col("n_docs") * F.col("max_tokens")).alias("padded_tokens"),
        (F.col("n_docs") * F.col("gmax")).alias("padded_global"),
        F.round(
            (F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens"))
            .cast("double")
            / (F.col("n_docs") * F.col("max_tokens")),
            6,
        ).alias("waste_bucketed"),
        F.round(
            (F.col("n_docs") * F.col("gmax") - F.col("sum_tokens"))
            .cast("double")
            / (F.col("n_docs") * F.col("gmax")),
            6,
        ).alias("waste_global"),
    )


# --------------------------------------------------------------------------
# q255 — capped mixture allocation by water-filling (sqrt temperature)


@register(
    "q255_capped_mixture_waterfill",
    sql="""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               sqrt(CAST(COUNT(*) AS DOUBLE)) AS w
        FROM documents GROUP BY source),
    tot AS (
        SELECT CAST(3 * SUM(n) AS BIGINT) // 5 AS budget,
               CAST(SUM(n) AS BIGINT) AS ntot,
               SUM(w) AS wtot
        FROM s),
    g AS (
        SELECT s.source, s.n, s.w, t.budget,
               CAST(SUM(s.n) OVER (
                   ORDER BY s.n, s.source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT) AS cum_n,
               SUM(s.w) OVER (
                   ORDER BY s.n, s.source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS cum_w
        FROM s, tot t),
    lam AS (
        SELECT g.source, g.n, g.w,
               (g.budget - COALESCE(g.cum_n, 0))
               / (t.wtot - COALESCE(g.cum_w, 0.0)) AS lam
        FROM g, tot t),
    crit AS (SELECT MAX(lam) AS lamstar FROM lam)
    SELECT l.source, l.n,
           CAST(least(CAST(l.n AS DOUBLE),
                      floor(c.lamstar * l.w)) AS BIGINT) AS allocated,
           l.n <= CAST(floor(c.lamstar * l.w) AS BIGINT) AS saturated,
           round(c.lamstar, 6) AS lambda_star
    FROM lam l, crit c
    """,
    tags=("training", "mixture", "waterfill"),
)
def q255_capped_mixture_waterfill(spark, sf_dir):
    """Capped mixture allocation by WATER-FILLING — the solver behind
    temperature sampling when sources can RUN OUT: allocate a global
    document budget across sources proportionally to sqrt(n)
    (temperature 0.5) subject to the availability cap a_i <= n_i.
    Plain proportional allocation over-asks small sources; the
    correct answer is a_i = min(n_i, lambda * w_i) with lambda chosen
    so the total spends the budget — small sources saturate, their
    unspent share re-floods the big ones.

    lambda is found in closed form on the per-source grid: sort
    sources by saturation order (ratio n/w = sqrt(n), so smallest
    first), prefix-sum docs and weights, and for each candidate
    saturated-prefix compute lambda_k = (budget - cum_n)/(W - cum_w);
    lambda* is the largest fixed point (MAX over candidates where the
    source's own ratio clears it). Everything after the one groupBy
    runs on the |sources| grid (20 rows), so the 100 TB cost is ONE
    count-by-source scan; sqrt is IEEE-exact in both engines and the
    ordered prefix-sums add in the same sequence, so lambda* and
    every floor() land bit-identically. Output: per-source
    allocation, saturation flag, and lambda* (the oracle replays the
    identical walk)."""
    d = table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n")).select(
        "source", "n", F.sqrt(F.col("n").cast("double")).alias("w")
    )
    tot = s.agg(
        F.expr("CAST(3 * SUM(n) AS BIGINT) div 5").alias("budget"),
        F.sum("w").alias("wtot"),
    )
    wg = Window.orderBy("n", "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    g = s.crossJoin(F.broadcast(tot)).select(
        "source", "n", "w", "budget", "wtot",
        F.sum("n").over(wg).alias("cum_n"),
        F.sum("w").over(wg).alias("cum_w"),
    )
    lam = g.select(
        "source", "n", "w",
        (
            (F.col("budget") - F.coalesce(F.col("cum_n"), F.lit(0)))
            / (F.col("wtot") - F.coalesce(F.col("cum_w"), F.lit(0.0)))
        ).alias("lam"),
    )
    crit = lam.agg(F.max("lam").alias("lamstar"))
    return lam.crossJoin(F.broadcast(crit)).select(
        "source", "n",
        F.least(
            F.col("n").cast("double"), F.floor(F.col("lamstar") * F.col("w"))
        ).cast("bigint").alias("allocated"),
        (
            F.col("n")
            <= F.floor(F.col("lamstar") * F.col("w")).cast("bigint")
        ).alias("saturated"),
        F.round(F.col("lamstar"), 6).alias("lambda_star"),
    )


# --------------------------------------------------------------------------
# q256 — rendezvous (HRW) sharding and its minimal-movement property


_HRW_SHARDS = 8


def _hrw_weight_sql(shard_expr: str) -> str:
    """DuckDB 60-bit md5 weight for (doc_id, shard) — same digest
    recipe as the q110/q237 hash-sampling twins."""
    return (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || "
        f"CAST({shard_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
    )


@register(
    "q256_rendezvous_sharding",
    sql=f"""
    WITH pairs AS (
        SELECT doc_id, n_chars, s.shard,
               {_hrw_weight_sql('s.shard')} AS wt
        FROM documents
        CROSS JOIN (SELECT unnest(range({_HRW_SHARDS})) AS shard) s),
    a8 AS (
        SELECT doc_id, n_chars, shard AS shard8
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY wt DESC, shard) AS rn
              FROM pairs)
        WHERE rn = 1),
    a7 AS (
        SELECT doc_id, shard AS shard7
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY wt DESC, shard) AS rn
              FROM pairs WHERE shard != {_HRW_SHARDS - 1})
        WHERE rn = 1)
    SELECT a8.shard8 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(a8.n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(CASE WHEN a8.shard8 != a7.shard7 THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_if_shard7_lost
    FROM a8 JOIN a7 ON a8.doc_id = a7.doc_id
    GROUP BY a8.shard8
    """,
    tags=("sharding", "rendezvous", "consistent-hashing"),
)
def q256_rendezvous_sharding(spark, sf_dir):
    """Rendezvous (highest-random-weight) sharding — how a 100 TB
    corpus is assigned to N storage/training shards so that LOSING a
    shard moves only that shard's documents, never reshuffles the
    world (mod-N hashing moves ~(N-1)/N of ALL docs on resize; HRW
    moves exactly 1/N). Each (doc, shard) pair gets a deterministic
    60-bit md5 weight; a doc lives on its argmax shard. The query
    computes the assignment for 8 shards AND the counterfactual
    assignment with shard 7 removed, then proves the minimal-movement
    property in-band: moved_if_shard7_lost is nonzero ONLY for docs
    whose 8-shard argmax was shard 7 (they re-land on their runner-up
    shard; every other doc's argmax is untouched by construction).

    Scale shape: the pair fan-out is a broadcast-range cross join
    (x N, map-side, no shuffle), the argmax is one per-doc reduce —
    in production N weights are computed inline per row and max_by
    picks the shard with zero fan-out at all. Balance (n_docs,
    n_chars per shard) comes out of the same aggregate."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    shards = spark.range(_HRW_SHARDS).select(
        F.col("id").cast("int").alias("shard")
    )
    pairs = d.crossJoin(F.broadcast(shards)).select(
        "doc_id", "n_chars", "shard",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("#"),
                        F.col("shard").cast("string"),
                    )
                ),
                1, 15,
            ),
            16, 10,
        ).cast("bigint").alias("wt"),
    )
    a8 = pairs.groupBy("doc_id").agg(
        F.expr("max_by(shard, struct(wt, -shard))").alias("shard8"),
        F.first("n_chars").alias("n_chars"),
    )
    a7 = (
        pairs.where(F.col("shard") != _HRW_SHARDS - 1)
        .groupBy("doc_id")
        .agg(F.expr("max_by(shard, struct(wt, -shard))").alias("shard7"))
    )
    return (
        a8.join(a7, "doc_id")
        .groupBy(F.col("shard8").alias("shard"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.sum(
                (F.col("shard8") != F.col("shard7")).cast("long")
            ).cast("bigint").alias("moved_if_shard7_lost"),
        )
    )
