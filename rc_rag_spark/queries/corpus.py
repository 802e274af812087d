"""Corpus-construction query entries (operators/corpus.py): inverted
index, BM25, TF-IDF keywords, token-budget packing, stratified
sampling — each hash-checked against an independent DuckDB
formulation over the documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

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


@register(
    "q108_bm25_scores",
    sql=f"""
    WITH d AS (
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
    )
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
    numbered AS (
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
        FROM walk w JOIN numbered n ON n.lang = w.lang AND n.rn = w.rn + 1
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
