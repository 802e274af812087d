"""Dedup / similarity / text-analysis query corpus (SURVEY §2.2 rows
'Dedup', 'Similarity search', 'Text analysis').

SQL-expressible variants are oracle-checked; LSH-based operators
(MinHash, SimHash, random-projection) are algorithmically approximate
candidate generators — they get rows-only driver checks here and exact
verification against brute-force ground truth in tests/test_dedup_sim.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rc_rag_spark.functions.vectors import cosine
from rc_rag_spark.operators import dedup as DD
from rc_rag_spark.operators import similarity as SIM
from rc_rag_spark.operators import textstats as TS
from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table, wide_table


@register(
    "q60_exact_dedup_stats",
    sql="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_unique_texts,
           COUNT(DISTINCT md5(text)) AS n_unique_fps
    FROM documents GROUP BY source
    """,
    tags=("dedup",),
)
def q60_exact_dedup_stats(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("text").alias("n_unique_texts"),
        F.count_distinct(F.md5("text")).alias("n_unique_fps"),
    )


@register(
    "q61_word_jaccard_neighbors",
    sql="""
    WITH t AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS words
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CASE WHEN len(list_distinct(list_concat(a.words, b.words))) = 0
                      THEN 0.0
                      ELSE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
                           / len(list_distinct(list_concat(a.words, b.words)))
                 END, 9) AS jaccard
    FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    """,
    tags=("dedup", "jaccard"),
)
def q61_word_jaccard_neighbors(spark, sf_dir):
    """Exact word-set Jaccard between neighboring doc ids (the verify
    step of any near-dup pipeline, exercised as an equi-join)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("words")
    )
    a, b = d.alias("a"), d.alias("b")
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.round(
            DD.jaccard(F.col("a.words"), F.col("b.words")), 9
        ).alias("jaccard"),
    )


def _sql_minhash_grams(text: str, n: int = 3) -> str:
    """DuckDB word-shingle expression matching DD.word_shingles:
    simple_tokenize then space-joined n-grams (distinct)."""
    toks = f"regexp_extract_all(lower({text}), '[\\pL\\pN\\pM]+|[^\\pZ\\pC]')"
    gram = " || ' ' || ".join(f"tk[i+{j}]" for j in range(n))
    return (
        f"list_distinct((SELECT CASE WHEN len(tk) < {n} THEN []::VARCHAR[] "
        f"ELSE [{gram} for i in generate_series(1, len(tk) - {n - 1})] END "
        f"FROM (SELECT {toks} AS tk)))"
    )


# CTE chain ending in sig(doc_id, grams, sig) — the deterministic
# md5-minhash signature over documents ∪ planted mutations; shared by
# q62/q102 (r=1 OR-bands) and q289 (r=4 AND-bands).
_Q62_SIG_CTES = f"""corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(
                   string_split(text, ' ')[1:greatest(
                       len(string_split(text, ' ')) - 3, 1)], ' ') AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    sh AS (
        SELECT doc_id, {_sql_minhash_grams("text")} AS grams FROM corpus
    ),
    hs AS (
        SELECT doc_id, grams,
               list_transform(grams, s ->
                   CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS h
        FROM sh WHERE len(grams) > 0
    ),
    -- MATERIALIZED: sig self-joins (a×b) and pairs feeds both edge
    -- directions — without it DuckDB re-inlines the whole md5-minhash
    -- pipeline per reference (measured 96 s -> oracle-side at sf0.1)
    sig AS MATERIALIZED (
        SELECT doc_id, grams,
               [list_min(list_transform(h, x ->
                    ((1000003 * (j + 1) + 12345) * x + 7919 * (j + 1) + 17)
                    % 2147483647))
                for j in generate_series(0, 7)] AS sig
        FROM hs
    )"""

# pairs(id_a, id_b, jaccard) via r=1 OR-bands (any of the 8 minima
# equal) — the q62/q102 contract.
_Q62_PAIRS_CTES = f"""{_Q62_SIG_CTES},
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.grams AS ga, b.grams AS gb
        FROM sig a JOIN sig b
          ON a.doc_id < b.doc_id
         AND len(list_filter(generate_series(1, 8),
                             i -> a.sig[i] = b.sig[i])) > 0
    ),
    pj AS (
        SELECT id_a, id_b,
               CASE WHEN len(list_distinct(list_concat(ga, gb))) = 0
                    THEN 0.0
                    ELSE CAST(len(list_intersect(ga, gb)) AS DOUBLE)
                         / len(list_distinct(list_concat(ga, gb)))
               END AS jaccard
        FROM cand
    ),
    pairs AS MATERIALIZED (SELECT * FROM pj WHERE jaccard >= 0.5)"""


def _q62_corpus_pairs(spark, sf_dir):
    """documents ∪ planted mutations → deterministic minhash pairs —
    the Spark twin of _Q62_PAIRS_CTES, shared by q62 and q102 (the
    mutation recipe and LSH parameters must stay in lockstep with the
    SQL)."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    mutated = (
        d.where(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(F.slice(words, 1, F.greatest(F.size(words) - 3, F.lit(1))), " ").alias("text"),
        )
    )
    corpus = d.select("doc_id", "text").unionByName(mutated)
    return DD.minhash_det_pairs(
        corpus, "doc_id", "text", shingle_n=3,
        num_hashes=8, jaccard_threshold=0.5,
    )


@register(
    "q62_minhash_near_dup",
    sql=f"""
    WITH {_Q62_PAIRS_CTES}
    SELECT id_a, id_b, round(jaccard, 9) AS jaccard FROM pairs
    """,
    tags=("dedup", "lsh"),
)
def q62_minhash_near_dup(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs over documents ∪ mutated copies
    (the fixture corpus has no natural dups, so we plant deterministic
    near-dups: every 10th doc with its last 3 words dropped). Uses the
    deterministic md5-based MinHash (operators/dedup.py) so the full
    signature → band-collision → exact-Jaccard-verify pipeline is
    hash-checked against DuckDB.

    plan-change: round 11 moved the signature kernel from interpreted
    array HOFs to an explode + codegen'd 8-minima hash aggregate
    (operators/dedup.py _minhash_stage) — one extra map-side-combined
    (_id) exchange in the plan, 5x less signature CPU (values
    identical; band-table checksum pinned in the A/B). Allowed:
    hash-exchanges<=5 shuffle-joins<=2."""
    pairs = _q62_corpus_pairs(spark, sf_dir)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 9).alias("jaccard")
    )


@register(
    "q102_dedup_clusters",
    sql=f"""
    WITH RECURSIVE {_Q62_PAIRS_CTES},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, lab) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.lab FROM edges e JOIN reach r ON r.id = e.d
    ),
    comp AS (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id)
    SELECT id AS doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS INTEGER)
               AS cluster_size
    FROM comp
    """,
    tags=("dedup", "clusters"),
)
def q102_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER formation: the q62 pair graph collapsed into
    connected components (operators/dedup.py dedup_clusters — iterative
    min-label propagation, O(diameter) rounds of equi-joins). The
    oracle computes the same components via a recursive transitive
    closure, an entirely different formulation. cluster_id = min doc_id
    of the component — the canonical survivor a dedup pass would keep.

    Measured cost model (round-15 decade probe): the r=1 OR-band
    contract makes candidate volume ~n²·J̄ on corpora whose docs share
    any shingles — fine through sf10 (100x bench: 139 s, exp 0.97),
    but at sf100 the exact-Jaccard verify's candidate shuffle exceeded
    60 GB of local disk before completing (run recorded ERR
    no-space in SCALING.md). That wall is the BAND SHAPE, not the
    plan: every stage is linear in candidates, and candidates are
    quadratic by the r=1 S-curve. The sixth-decade path is
    q289_minhash_banded_pairs (r=4 AND-banding, candidates ~linear)
    feeding the same dedup_clusters; q102 stays as-is because its
    oracle contract (and the q62 pair semantics it shares) pin r=1.

    plan-change: inherits _minhash_stage's r11 explode+agg signature
    kernel (see q62) — one extra map-side-combined exchange, less CPU,
    identical pairs. Allowed: hash-exchanges<=1 shuffle-joins<=0."""
    from pyspark.sql.window import Window

    labels = DD.dedup_clusters(_q62_corpus_pairs(spark, sf_dir))
    w = Window.partitionBy("cluster_id")
    return labels.select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        F.count("*").over(w).cast("int").alias("cluster_size"),
    )


def _sql_simhash64(text: str) -> str:
    """DuckDB expression computing the same 64-bit SimHash as
    DD.simhash64: md5 of each whitespace token, first 8 bytes
    big-endian, per-bit majority vote. Returned as UBIGINT (the signed
    reinterpretation only matters for storage, not for XOR/popcount)."""
    hs = (
        f"list_transform(regexp_extract_all(lower({text}), '[^\\s]+'), "
        f"t -> CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT))"
    )
    # DuckDB's << checks signed overflow at bit 63 — emit the power of
    # two as a UBIGINT decimal literal instead
    bit = (
        "(CASE WHEN 2 * coalesce(list_sum(list_transform(hs, "
        "h -> CAST((h >> {b}) & 1 AS BIGINT))), 0) > len(hs) "
        "THEN CAST('{p}' AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)"
    )
    total = " + ".join(bit.format(b=b, p=1 << b) for b in range(64))
    return f"(SELECT {total} FROM (SELECT {hs} AS hs))"


@register(
    "q63_simhash_near_dup",
    sql=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(
                   string_split(text, ' ')[1:greatest(
                       len(string_split(text, ' ')) - 2, 1)], ' ') AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    -- NULL text: Spark simhash64 yields NULL (never pairs); exclude
    -- here so the oracle can't emit a pair the engine doesn't
    sh AS (SELECT doc_id, {_sql_simhash64("text")} AS s FROM corpus
           WHERE text IS NOT NULL)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
    """,
    tags=("dedup", "simhash"),
)
def q63_simhash_near_dup(spark, sf_dir):
    """SimHash band-bucketed near-dup pairs on the same planted corpus.
    max_hamming(3) < num_bands(4) makes the band join exhaustive
    (pigeonhole), so the all-pairs Hamming filter is an exact oracle."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    mutated = (
        d.where(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1))), " ").alias("text"),
        )
    )
    corpus = d.select("doc_id", "text").unionByName(mutated)
    out = DD.simhash_near_dup_pairs(corpus, "doc_id", "text", max_hamming=3)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


@register(
    "q64_knn_bruteforce",
    sql="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id >= 5 AND embedding IS NOT NULL),
         scored AS (
           SELECT q.query_id, c.vec_id AS neighbor_id,
                  list_dot_product(c.cv, q.qv)
                  / (sqrt(list_dot_product(c.cv, c.cv))
                     * sqrt(list_dot_product(q.qv, q.qv))) AS similarity
           FROM c CROSS JOIN q
         )
    SELECT query_id, neighbor_id, round(similarity, 9) AS similarity,
           CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY similarity DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
    tags=("similarity", "knn"),
)
def q64_knn_bruteforce(spark, sf_dir):
    """Exact top-5 cosine neighbors for 5 query vectors via the
    PRUNED exact path (per-partition NumPy block top-k — the 100 TB
    shape: the final window sees O(partitions x queries x k) rows,
    never the full corpus x queries candidate set). The unpruned
    brute_force_topk stays available as the small-n ground-truth
    baseline behind its own max_queries guard."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.where(F.col("vec_id") >= 5)
    out = SIM.brute_force_topk_pruned(corpus, queries, k=5)
    return out.select(
        "query_id", "neighbor_id",
        F.round("similarity", 9).alias("similarity"), "rank",
    )


@register("q65_knn_lsh", tags=("similarity", "lsh"))
def q65_knn_lsh(spark, sf_dir):
    """Approximate top-5 via random-projection LSH + exact re-rank
    (recall vs q64 asserted in tests)."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.where(F.col("vec_id") >= 5)
    out = SIM.lsh_topk_join(
        corpus, queries, k=5, bucket_length=4.0, num_hash_tables=6, max_l2=3.0
    )
    return out.select(
        "query_id", "neighbor_id",
        F.round("similarity", 9).alias("similarity"), "rank",
    )


@register(
    "q66_embedding_neighbor_cosine",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 9) AS similarity,
           list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) > 0.2 AS near_dup
    FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
    """,
    tags=("similarity", "dedup"),
)
def q66_embedding_neighbor_cosine(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    a, b = e.alias("a"), e.alias("b")
    sim = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.round(sim, 9).alias("similarity"),
        (sim > 0.2).alias("near_dup"),
    )


@register(
    "q67_lang_stats",
    sql="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words
    FROM documents GROUP BY lang
    """,
    tags=("textstats",),
)
def q67_lang_stats(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_words"),
    )


_TOKS_SQL = "regexp_extract_all(lower(text), '[\\pL\\pN\\pM]+|[^\\pZ\\pC]')"
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in TS.STOPWORDS) + "]"

# the n_tokens guard matters on NULL text: DuckDB's least()/greatest()
# SKIP NULL arguments (non-standard), so without it a NULL-text row
# would score 0.4 instead of NULL (Spark NULL-propagates)
_QUALITY_EXPR_SQL = """(CASE WHEN n_tokens IS NULL THEN NULL ELSE
                 round(0.4 * least(n_tokens / 100.0, 1.0)
                 + 0.4 * greatest(0.0, 1.0 - 4.0 * (punct_ratio + digit_ratio))
                 + 0.2 * CAST(mean_token_len >= 2.5 AND mean_token_len <= 9.0
                              AS DOUBLE), 6) END)"""


def _sql_quality_ctes(src: str = "documents", carry: str = "") -> str:
    """CTE pair (t, r): the q68 quality features over `src`; `carry`
    threads extra columns through (e.g. ", lang, text")."""
    return f"""t AS (
        SELECT doc_id{carry},
               {_TOKS_SQL} AS toks,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '[[:punct:]]')) AS n_punct,
               len(regexp_extract_all(text, '[0-9]')) AS n_digit
        FROM {src}
    ),
    r AS (
        SELECT doc_id{carry},
               CAST(len(toks) AS INTEGER) AS n_tokens,
               round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 6)
                   AS punct_ratio,
               round(CAST(n_digit AS DOUBLE) / greatest(n_chars, 1), 6)
                   AS digit_ratio,
               round(CAST(len(list_filter(toks,
                   x -> list_contains({_STOP_SQL}, x))) AS DOUBLE)
                   / greatest(len(toks), 1), 6) AS stopword_ratio,
               CASE WHEN toks IS NULL THEN NULL ELSE
               round(CAST(coalesce(list_sum(list_transform(
                       list_filter(toks, x -> regexp_matches(x, '^[\\pL\\pN]')),
                       x -> length(x))), 0) AS DOUBLE)
                   / greatest(len(list_filter(toks,
                       x -> regexp_matches(x, '^[\\pL\\pN]'))), 1), 6)
               END AS mean_token_len
        FROM t
    )"""


@register(
    "q68_quality_scores",
    sql=f"""
    WITH {_sql_quality_ctes()}
    SELECT doc_id, n_tokens, punct_ratio, digit_ratio, stopword_ratio,
           mean_token_len,
           {_QUALITY_EXPR_SQL} AS quality
    FROM r
    """,
    tags=("textstats", "quality"),
)
def q68_quality_scores(spark, sf_dir):
    from rc_rag_spark.functions.text import simple_tokenize

    d = wide_table(spark, sf_dir, "documents")
    # Stage tokens, then the features struct; six getFields plus the
    # composite score would otherwise each inline the tokenizer subtree.
    q = F.col("q")
    return d.select(
        "doc_id", "text", simple_tokenize("text").alias("_toks")
    ).select(
        "doc_id",
        TS.quality_features_from_tokens("text", F.col("_toks")).alias("q"),
    ).select(
        "doc_id",
        q.getField("n_tokens").alias("n_tokens"),
        q.getField("punct_ratio").alias("punct_ratio"),
        q.getField("digit_ratio").alias("digit_ratio"),
        q.getField("stopword_ratio").alias("stopword_ratio"),
        q.getField("mean_token_len").alias("mean_token_len"),
        TS.quality_score_from_features(q).alias("quality"),
    )


@register(
    "q69_token_counts",
    sql="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text),
                '[\\pL\\pN\\pM]+|[^\\pZ\\pC]')) AS INTEGER) AS n_tokens,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                AS INTEGER) AS n_words,
           CAST(coalesce(list_sum(list_transform(
                    regexp_extract_all(lower(text), '[a-z0-9]+'),
                    r -> CAST(ceil(length(r) / 4.0) AS INTEGER))), 0)
                + len(regexp_extract_all(text, '[^\\sa-zA-Z0-9]'))
                AS INTEGER) AS n_bpe_ish
    FROM documents
    """,
    tags=("textstats", "tokens"),
)
def q69_token_counts(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TS.token_count("text").alias("n_tokens"),
        TS.word_count("text").alias("n_words"),
        TS.bpe_ish_token_count("text").alias("n_bpe_ish"),
    )


def _langid_ratio_exprs() -> list[str]:
    """Per-language marker-hit-ratio select expressions over a `toks`
    column (the q70 language-ID features)."""
    ratios = []
    for lang in sorted(TS.LANG_MARKERS):
        markers = ", ".join(f"'{m}'" for m in TS.LANG_MARKERS[lang])
        ratios.append(
            f"CAST(len(list_filter(toks, x -> x IN ({markers}))) AS DOUBLE)"
            f" / greatest(len(toks), 1) AS s_{lang}"
        )
    return ratios


def _langid_case_expr() -> str:
    """Argmax over the s_<lang> ratios, alphabetical-first tie-break,
    'und' when all zero."""
    langs = sorted(TS.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    return "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{lg} = {best} THEN '{lg}'" for lg in langs
    ) + " ELSE 'und' END"


def _langid_sql() -> str:
    """DuckDB mirror of textstats.language_id: per-language marker-hit
    ratios, argmax with alphabetical-first tie-break, 'und' when all
    zero."""
    return f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents),
    r AS (SELECT doc_id, lang, {', '.join(_langid_ratio_exprs())} FROM t)
    SELECT doc_id, lang, {_langid_case_expr()} AS lang_pred FROM r
    """


@register("q70_language_id", sql=_langid_sql(), tags=("textstats", "langid"))
def q70_language_id(spark, sf_dir):
    """Heuristic language ID (marker-ratio argmax), oracle-checked
    against an independent SQL formulation."""
    from rc_rag_spark.functions.text import simple_tokenize

    d = wide_table(spark, sf_dir, "documents")
    # stage tokens → scores → argmax: each struct references its staged
    # input several times, which keeps CollapseProject from re-inlining
    # the tokenizer into the interpreted filter lambdas
    return (
        d.select("doc_id", "lang", simple_tokenize("text").alias("_toks"))
        .select(
            "doc_id", "lang",
            TS.language_scores_from_tokens(F.col("_toks")).alias("ls"),
        )
        .select(
            "doc_id",
            "lang",
            TS.language_id_from_scores(F.col("ls")).alias("lang_pred"),
        )
    )


_Q71_NORM = (
    "trim(regexp_replace(regexp_replace(regexp_replace("
    "lower(text), '[[:punct:]]', '', 'g'),"
    " '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g'))"
)


@register(
    "q71_rolling_fingerprint",
    sql=f"""
    WITH t AS (SELECT doc_id, {_Q71_NORM} AS s FROM documents)
    SELECT doc_id,
           CASE WHEN length(s) - 15 <= 0 THEN md5(s)
                ELSE list_aggregate(list_transform(
                         generate_series(1, length(s) - 15),
                         i -> md5(substr(s, i, 16))), 'min')
           END AS fingerprint
    FROM t
    """,
    tags=("textstats", "fingerprint"),
)
def q71_rolling_fingerprint(spark, sf_dir):
    """Winnowing-style fingerprint: min md5 over 16-char windows of
    the normalized text (portable variant; xxhash64 variant is the
    cheaper engine-internal path)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", TS.rolling_md5_fingerprint("text").alias("fingerprint")
    )


@register(
    "q90_knn_pruned",
    sql="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id >= 5 AND embedding IS NOT NULL),
         scored AS (
           SELECT q.query_id, c.vec_id AS neighbor_id,
                  list_dot_product(c.cv, q.qv)
                  / (sqrt(list_dot_product(c.cv, c.cv))
                     * sqrt(list_dot_product(q.qv, q.qv))) AS similarity
           FROM c CROSS JOIN q
         )
    SELECT query_id, neighbor_id, round(similarity, 6) AS similarity,
           CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY similarity DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
    tags=("similarity", "knn", "pruned"),
)
def q90_knn_pruned(spark, sf_dir):
    """Exact top-5 via the per-partition-pruned scale path (NumPy block
    scoring + local heaps; set-equivalence to q64 asserted in tests).
    Same oracle as q64, rounded at 1e-6: the NumPy float64 matmul and
    the SQL sequential fold differ only in summation order."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.where(F.col("vec_id") >= 5)
    out = SIM.brute_force_topk_pruned(corpus, queries, k=5)
    return out.select(
        "query_id", "neighbor_id",
        F.round("similarity", 6).alias("similarity"), "rank",
    )


@register(
    "q94_char_ngram_jaccard",
    sql="""
    WITH g AS (
        SELECT doc_id,
               CASE WHEN len(text) < 3 THEN [text]
                    ELSE list_distinct([substr(text, i, 3)
                         for i in generate_series(1, len(text) - 2)])
               END AS grams
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) = 0
                      THEN 0.0
                      ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                           / len(list_distinct(list_concat(a.grams, b.grams)))
                 END, 9) AS jaccard
    FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
    """,
    tags=("dedup", "jaccard", "ngram"),
)
def q94_char_ngram_jaccard(spark, sf_dir):
    """Character-3-gram (shingle) Jaccard between neighboring docs —
    the n-gram flavor of q61's word-set Jaccard; the same shingling
    that feeds MinHash (q62), checked here exactly."""
    d = table(spark, sf_dir, "documents")
    grams = F.when(F.length("text") < 3, F.array(F.col("text"))).otherwise(
        F.array_distinct(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            )
        )
    )
    t = d.select("doc_id", grams.alias("grams"))
    a, b = t.alias("a"), t.alias("b")
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.round(DD.jaccard(F.col("a.grams"), F.col("b.grams")), 9).alias(
            "jaccard"
        ),
    )


_Q95_CORPUS_SQL = """corpus AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL
        SELECT -doc_id - 1 AS doc_id, lang, text FROM documents
        WHERE doc_id % 20 = 0
    )"""


@register(
    "q95_corpus_curation",
    sql=f"""
    WITH {_Q95_CORPUS_SQL},
    {_sql_quality_ctes(src="corpus")},
    lr AS (SELECT doc_id, {', '.join(_langid_ratio_exprs())} FROM t),
    lp AS (SELECT doc_id, {_langid_case_expr()} AS lang_pred FROM lr),
    dk AS (SELECT doc_id,
                  CAST(row_number() OVER (
                      PARTITION BY md5(text) ORDER BY abs(doc_id), doc_id)
                  AS INTEGER) AS dup_rank
           FROM corpus),
    scored AS (
        SELECT r.doc_id, lp.lang_pred, {_QUALITY_EXPR_SQL} AS quality,
               dk.dup_rank
        FROM r JOIN lp USING (doc_id) JOIN dk USING (doc_id)
    )
    SELECT doc_id, lang_pred, quality, dup_rank,
           CASE WHEN dup_rank > 1 THEN 'duplicate'
                WHEN quality < 0.75 THEN 'low_quality'
                WHEN lang_pred = 'und' THEN 'und_language'
           END AS drop_reason,
           (dup_rank <= 1 AND quality >= 0.75 AND lang_pred <> 'und') AS keep
    FROM scored
    """,
    tags=("dedup", "textstats", "curation"),
)
def q95_corpus_curation(spark, sf_dir):
    """End-to-end training-corpus curation: exact-dedup (planted exact
    copies of every 20th doc, in the negative-id namespace so no corpus
    size can collide with real ids), quality-score filter, language-ID
    filter — every per-doc decision tagged with its drop reason. The
    dedup window orders by abs(doc_id) so the original always outranks
    its planted copy. One scan + one window shuffle on the fingerprint;
    at 100 TB each stage stays a narrow map except the dedup window
    (hash-partitioned on md5, no skew: fingerprints are uniform)."""
    from pyspark.sql.window import Window

    d = wide_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    planted = d.where(F.col("doc_id") % 20 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"), "lang", "text"
    )
    corpus = d.unionByName(planted)
    # abs(doc_id) can tie (planted copy of doc d has abs id d+1, same as
    # natural doc d+1 if both texts collide) — doc_id breaks the tie
    # identically on both engine and oracle.
    w = Window.partitionBy(F.md5("text")).orderBy(
        F.abs(F.col("doc_id")), F.col("doc_id")
    )
    # Stage tokens, then the marker-score and quality-feature structs,
    # as named columns before the argmax/composite-score expressions
    # reference them repeatedly — each staged alias is referenced
    # several times downstream, so CollapseProject can't re-inline the
    # tokenizer into the interpreted filter lambdas (which would re-run
    # it ~9× per row).
    from rc_rag_spark.functions.text import simple_tokenize

    feats = corpus.select(
        "doc_id", "text", simple_tokenize("text").alias("_toks")
    ).select(
        "doc_id",
        TS.language_scores_from_tokens(F.col("_toks")).alias("ls"),
        TS.quality_features_from_tokens("text", F.col("_toks")).alias("qf"),
        F.row_number().over(w).cast("int").alias("dup_rank"),
    )
    scored = feats.select(
        "doc_id",
        TS.language_id_from_scores(F.col("ls")).alias("lang_pred"),
        TS.quality_score_from_features(F.col("qf")).alias("quality"),
        "dup_rank",
    )
    drop = (
        F.when(F.col("dup_rank") > 1, "duplicate")
        .when(F.col("quality") < 0.75, "low_quality")
        .when(F.col("lang_pred") == "und", "und_language")
    )
    return scored.select(
        "doc_id", "lang_pred", "quality", "dup_rank",
        drop.alias("drop_reason"),
        (
            (F.col("dup_rank") <= 1)
            & (F.col("quality") >= 0.75)
            & (F.col("lang_pred") != "und")
        ).alias("keep"),
    )


@register(
    "q96_hash_split",
    sql="""
    WITH b AS (
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 100 AS INTEGER) AS bucket
        FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    tags=("curation", "split"),
)
def q96_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment by hashing the stable
    key (md5-prefix mod 100 → 80/10/10) — reproducible across engines,
    runs, and partitionings, unlike RNG sampling. A narrow per-row
    expression: no shuffle, no state, any scale."""
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    ).cast("int")
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "q97_embedding_near_dup",
    sql="""
    WITH corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE embedding IS NOT NULL
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding::DOUBLE[], x -> x * 1.001) AS v
        FROM embeddings WHERE vec_id % 25 = 0 AND embedding IS NOT NULL
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS similarity
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= 0.8
    """,
    tags=("dedup", "similarity", "embedding"),
)
def q97_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs over embeddings ∪ planted
    scaled copies (cosine is scale-invariant, so every planted copy
    pairs with its source at sim≈1; random 64-dim vectors never reach
    0.8). Exact blocked-matmul ground truth (exact_near_dup_pairs);
    the LSH candidate path (embedding_near_dup) is the web-scale
    variant, recall-tested in test_dedup_sim.py. Rounded at 1e-6:
    NumPy matmul vs SQL fold differ only in summation order."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planted = e.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("v", lambda x: x * 1.001).alias("v"),
    )
    corpus = e.unionByName(planted)
    pairs = SIM.exact_near_dup_pairs(
        corpus, id_col="vec_id", vec_col="v", cosine_threshold=0.8
    )
    return pairs.select(
        "id_a", "id_b", F.round("similarity", 6).alias("similarity")
    )


@register(
    "q126_edit_distance_pairs",
    sql="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
     AND levenshtein(a.p_name, b.p_name) <= 2
    """,
    tags=("dedup", "edit-distance", "blocking"),
)
def q126_edit_distance_pairs(spark, sf_dir):
    """Edit-distance self-join (lev <= 2) over the part-name
    dictionary, PassJoin-style: split each left name into k+1 = 3
    segments — by pigeonhole, any match within 2 edits keeps at least
    one segment intact, shifted by at most 2 — and have each right
    name emit the substrings a matching segment could align to
    (lengths within +-2, positions within +-2). Candidates come from
    a plain EQUI-join on (length, segment-id, piece); the exact
    levenshtein verifies only candidates. Fan-out per right name is
    <= 5 lengths x 3 segments x 5 shifts (bounded), so at a 10^9-name
    dictionary this is an ordinary hash-shuffle join — never the
    O(n^2) theta join the oracle spells. Segment boundaries: earlier
    segments take the remainder (ceil split), identically on both
    sides."""
    k = 2
    names = table(spark, sf_dir, "part").select("p_name").distinct()

    # segment start/len for a string of length L split into 3 pieces:
    # lengths = ceil-split (first L%3 segments get base+1)
    def seg_bounds(L, i):
        base, rem = L / F.lit(3), L % 3
        blen = F.floor(base).cast("int")
        slen = F.when(F.lit(i) < rem, blen + 1).otherwise(blen)
        start = (
            F.least(F.lit(i), rem) * (blen + 1)
            + F.greatest(F.lit(i) - rem, F.lit(0)) * blen
        )
        return start.cast("int"), slen.cast("int")

    L = F.length("p_name")
    seg_rows = []
    for i in range(3):
        st, ln = seg_bounds(L, i)
        seg_rows.append(
            F.struct(
                F.lit(i).alias("i"), st.alias("st"), ln.alias("ln")
            )
        )
    left = (
        names.select(
            F.col("p_name").alias("name_a"),
            L.alias("la"),
            F.explode(F.array(*seg_rows)).alias("s"),
        )
        .where(F.col("s.ln") > 0)
        .select(
            "name_a", "la", F.col("s.i").alias("i"),
            F.substring(
                F.col("name_a"), F.col("s.st") + 1, F.col("s.ln")
            ).alias("piece"),
        )
    )
    # right side probes every (candidate-left-length, segment, shift)
    right = (
        names.select(F.col("p_name").alias("name_b"), L.alias("lb"))
        .select(
            "name_b", "lb",
            F.explode(
                F.sequence(F.col("lb") - k, F.col("lb") + k)
            ).alias("la"),
        )
        .where(F.col("la") >= 3)
    )
    probe_rows = []
    for i in range(3):
        st, ln = seg_bounds(F.col("la"), i)
        probe_rows.append(
            F.struct(F.lit(i).alias("i"), st.alias("st"), ln.alias("ln"))
        )
    right = (
        right.select(
            "name_b", "lb", "la",
            F.explode(F.array(*probe_rows)).alias("s"),
        )
        .where(F.col("s.ln") > 0)
        .select(
            "name_b", "lb", "la", F.col("s.i").alias("i"),
            F.col("s.ln").alias("ln"),
            F.explode(
                F.sequence(F.col("s.st") - k, F.col("s.st") + k)
            ).alias("p"),
        )
        .where(
            (F.col("p") >= 0) & (F.col("p") + F.col("ln") <= F.col("lb"))
        )
        .select(
            "name_b", "la", "i",
            F.substring(
                F.col("name_b"), F.col("p") + 1, F.col("ln")
            ).alias("piece"),
        )
        .distinct()
    )
    # Pigeonhole needs 3 non-empty segments, so blocking is only
    # complete for names of length >= 3 (and the probe side skips
    # candidate lengths < 3). Names shorter than that get a dedicated
    # brute-force arm: the short dictionary is bounded by the alphabet
    # (|Σ|² entries at most), so broadcasting it against the full
    # dictionary is a linear pass, never a real cross product.
    # (Expressed as a length-bucket EQUI-join — each short name emits
    # its <= 2k+1 candidate partner lengths — so the plan stays free
    # of nested-loop/cartesian joins.)
    short = names.where(F.length("p_name") < 3).select(
        F.col("p_name").alias("s_name"),
        F.explode(
            F.sequence(
                F.greatest(F.length("p_name") - k, F.lit(0)),
                F.length("p_name") + k,
            )
        ).alias("lo"),
    )
    bf = (
        names.select(
            F.col("p_name").alias("o_name"),
            F.length("p_name").alias("lo"),
        )
        .join(F.broadcast(short), "lo")
        .where(F.col("s_name") != F.col("o_name"))
        .select(
            F.least("s_name", "o_name").alias("name_a"),
            F.greatest("s_name", "o_name").alias("name_b"),
        )
    )
    cand = (
        left.join(right, ["la", "i", "piece"])
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .unionByName(bf)
        .distinct()
    )
    return cand.select(
        "name_a", "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).where(F.col("dist") <= k)


_KNN_EXACT_TOPK_SQL = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id >= 5 AND embedding IS NOT NULL),
         scored AS (
           SELECT q.query_id, c.vec_id AS neighbor_id,
                  list_dot_product(c.cv, q.qv)
                  / (sqrt(list_dot_product(c.cv, c.cv))
                     * sqrt(list_dot_product(q.qv, q.qv))) AS similarity
           FROM c CROSS JOIN q
         ),
         topk AS (
           SELECT query_id, neighbor_id
           FROM (SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY query_id
                     ORDER BY similarity DESC, neighbor_id) AS rank
                 FROM scored)
           WHERE rank <= 5
         )
    SELECT CAST(5 AS INTEGER) AS k,
           CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
           TRUE AS recall_ok
    FROM topk
"""


def _knn_recall_row(spark, sf_dir, approx, k=5, threshold=0.9):
    """One-row recall@k summary of an approximate KNN result against
    the exact pruned-brute-force neighbor set. n_queries/n_exact_pairs
    are fully oracle-checkable from the parquet; recall_ok is the
    hash-checked invariant — if the approximate path's recall drops
    below `threshold`, the Spark side emits false and the driver's
    value-hash diverges from the oracle's TRUE."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.where(F.col("vec_id") >= 5)
    exact = SIM.brute_force_topk_pruned(corpus, queries, k=k).select(
        "query_id", "neighbor_id"
    )
    hits = approx.select(
        "query_id", "neighbor_id", F.lit(1).alias("_hit")
    ).dropDuplicates(["query_id", "neighbor_id"])
    return (
        exact.join(hits, ["query_id", "neighbor_id"], "left")
        .agg(
            F.lit(k).cast("int").alias("k"),
            F.count_distinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_exact_pairs"),
            # try_divide + coalesce(TRUE): with zero exact pairs
            # (empty corpus) recall is vacuously OK — matching the
            # oracle's literal TRUE — instead of an ANSI
            # DIVIDE_BY_ZERO at runtime
            F.coalesce(
                F.try_divide(
                    F.sum(F.coalesce(F.col("_hit"), F.lit(0))),
                    F.count(F.lit(1)),
                )
                >= threshold,
                F.lit(True),
            ).alias("recall_ok"),
        )
    )


@register(
    "q130_lsh_recall_bound",
    sql=_KNN_EXACT_TOPK_SQL,
    tags=("similarity", "lsh", "recall"),
)
def q130_lsh_recall_bound(spark, sf_dir):
    """Oracle-checkable recall bound for the q65 LSH path (r2 judge
    item: the approximate variants were rows-only). Joins the LSH
    top-5 (same parameters as q65) against the exact neighbor set and
    emits recall >= 0.9 as a hash-checked scalar."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.where(F.col("vec_id") >= 5)
    approx = SIM.lsh_topk_join(
        corpus, queries, k=5, bucket_length=4.0, num_hash_tables=6, max_l2=3.0
    )
    return _knn_recall_row(spark, sf_dir, approx)


@register(
    "q131_ivf_recall_bound",
    sql=_KNN_EXACT_TOPK_SQL,
    tags=("similarity", "ivf", "recall"),
)
def q131_ivf_recall_bound(spark, sf_dir):
    """Oracle-checkable recall bound for the q75 IVF path: the IVF
    top-5 (same parameters as q75) must recover >= 80% of the exact
    neighbor pairs; emitted as a hash-checked scalar row. The bound is
    0.8 (not 0.9 like LSH's q130) because the synthetic embeddings are
    near-uniform — cell boundaries cut true neighborhoods — and the
    measured recall with q75's parameters is 0.88–0.96 across gate
    SFs; seeded KMeans makes the value deterministic per dataset."""
    from rc_rag_spark.operators.ann import ivf_topk

    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.where(F.col("vec_id") >= 5)
    approx = ivf_topk(corpus, queries, k=5, n_clusters=16, n_probe=10)
    return _knn_recall_row(spark, sf_dir, approx, threshold=0.8)


@register(
    "q136_dedup_retention",
    sql=f"""
    WITH RECURSIVE {_Q62_PAIRS_CTES},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, lab) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.lab FROM edges e JOIN reach r ON r.id = e.d
    ),
    comp AS (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
    dropped AS (SELECT id FROM comp WHERE id != cluster_id)
    SELECT CAST((SELECT COUNT(*) FROM corpus) AS BIGINT) AS n_total,
           CAST((SELECT COUNT(*) FROM corpus) -
                (SELECT COUNT(*) FROM dropped) AS BIGINT) AS n_kept,
           CAST((SELECT COUNT(*) FROM dropped) AS BIGINT) AS n_dropped,
           (SELECT coalesce(array_to_string(
                list_transform(list_sort(list(id)),
                               x -> CAST(x AS VARCHAR)), ','), '')
            FROM dropped) AS dropped_ids
    """,
    tags=("dedup", "retention"),
)
def q136_dedup_retention(spark, sf_dir):
    """The APPLY step of near-dup dedup: q102 forms clusters, this
    query enforces the retention policy — keep the canonical member
    (min doc_id) of every cluster, anti-join the rest out of the
    corpus. The exact dropped-id membership is part of the hash check,
    not just counts. Scale shape: the pair graph and label propagation
    are q102's bounded equi-joins; the final anti-join is one hash
    shuffle on doc_id — the whole pass never materializes anything on
    the driver."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    mutated = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(words, 1, F.greatest(F.size(words) - 3, F.lit(1))), " "
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(mutated)
    labels = DD.dedup_clusters(_q62_corpus_pairs(spark, sf_dir))
    dropped = labels.where(F.col("id") != F.col("cluster_id")).select("id")
    kept = corpus.join(
        dropped, corpus.doc_id == dropped.id, "left_anti"
    )
    stats = corpus.agg(F.count("*").alias("n_total")).crossJoin(
        kept.agg(F.count("*").alias("n_kept"))
    )
    drop_list = dropped.agg(
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ),
            F.lit(""),
        ).alias("dropped_ids")
    )
    return stats.crossJoin(drop_list).select(
        "n_total",
        "n_kept",
        (F.col("n_total") - F.col("n_kept")).alias("n_dropped"),
        "dropped_ids",
    )


@register(
    "q145_curriculum_order",
    sql=f"""
    WITH {_sql_quality_ctes()},
    scored AS (
        SELECT doc_id, {_QUALITY_EXPR_SQL} AS quality FROM r),
    thr AS (
        SELECT quantile_cont(quality, 0.25) AS q1,
               quantile_cont(quality, 0.50) AS q2,
               quantile_cont(quality, 0.75) AS q3
        FROM scored)
    SELECT s.doc_id, s.quality,
           CAST(CASE WHEN s.quality > t.q3 THEN 1
                     WHEN s.quality > t.q2 THEN 2
                     WHEN s.quality > t.q1 THEN 3
                     ELSE 4 END AS INTEGER) AS stage,
           CAST(s.doc_id % 8 AS INTEGER) AS shard
    FROM scored s CROSS JOIN thr t
    """,
    tags=("corpus", "curriculum", "quality"),
)
def q145_curriculum_order(spark, sf_dir):
    """Curriculum assignment for training: quality-quartile stages
    (stage 1 = cleanest quartile first) plus a deterministic hash
    shard. Deliberately NOT a global sort: the quartile thresholds
    come from one exact-percentile aggregate (q29-proven identical to
    DuckDB's quantile_cont) broadcast back over the corpus, so stage
    assignment is a narrow per-row comparison at any scale — the
    100 TB shape, vs the single-partition global-NTILE formulation
    documented as a small-result-only operator (SCALE.md)."""
    from rc_rag_spark.functions.text import simple_tokenize

    d = wide_table(spark, sf_dir, "documents")
    scored = (
        d.select("doc_id", "text", simple_tokenize("text").alias("_toks"))
        .select(
            "doc_id",
            TS.quality_features_from_tokens("text", F.col("_toks")).alias("q"),
        )
        .select(
            "doc_id",
            TS.quality_score_from_features(F.col("q")).alias("quality"),
        )
    )
    thr = scored.agg(
        F.expr("percentile(quality, 0.25)").alias("q1"),
        F.expr("percentile(quality, 0.50)").alias("q2"),
        F.expr("percentile(quality, 0.75)").alias("q3"),
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id", "quality",
        F.when(F.col("quality") > F.col("q3"), 1)
        .when(F.col("quality") > F.col("q2"), 2)
        .when(F.col("quality") > F.col("q1"), 3)
        .otherwise(4)
        .cast("int")
        .alias("stage"),
        (F.col("doc_id") % 8).cast("int").alias("shard"),
    )


@register(
    "q239_incremental_minhash_dedup",
    sql=f"""
    WITH idx AS (SELECT doc_id, text FROM documents),
    inc AS (
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(
                   string_split(text, ' ')[1:greatest(
                       len(string_split(text, ' ')) - 3, 1)], ' ') AS text
        FROM documents WHERE doc_id % 10 = 0
    ),
    shi AS (
        SELECT doc_id, {_sql_minhash_grams("text")} AS grams FROM idx
    ),
    shn AS (
        SELECT doc_id, {_sql_minhash_grams("text")} AS grams FROM inc
    ),
    hsi AS (
        SELECT doc_id, grams,
               list_transform(grams, s ->
                   CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS h
        FROM shi WHERE len(grams) > 0
    ),
    hsn AS (
        SELECT doc_id, grams,
               list_transform(grams, s ->
                   CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS h
        FROM shn WHERE len(grams) > 0
    ),
    sigi AS MATERIALIZED (
        SELECT doc_id, grams,
               [list_min(list_transform(h, x ->
                    ((1000003 * (j + 1) + 12345) * x + 7919 * (j + 1) + 17)
                    % 2147483647))
                for j in generate_series(0, 7)] AS sig
        FROM hsi
    ),
    sign AS MATERIALIZED (
        SELECT doc_id, grams,
               [list_min(list_transform(h, x ->
                    ((1000003 * (j + 1) + 12345) * x + 7919 * (j + 1) + 17)
                    % 2147483647))
                for j in generate_series(0, 7)] AS sig
        FROM hsn
    ),
    cand AS (
        SELECT n.doc_id AS new_id, i.doc_id AS index_id,
               n.grams AS gn, i.grams AS gi
        FROM sign n JOIN sigi i
          ON len(list_filter(generate_series(1, 8),
                             k -> n.sig[k] = i.sig[k])) > 0
    ),
    pj AS (
        SELECT new_id, index_id,
               CASE WHEN len(list_distinct(list_concat(gn, gi))) = 0
                    THEN 0.0
                    ELSE CAST(len(list_intersect(gn, gi)) AS DOUBLE)
                         / len(list_distinct(list_concat(gn, gi)))
               END AS jaccard
        FROM cand
    )
    SELECT new_id, index_id, round(jaccard, 9) AS jaccard
    FROM pj WHERE jaccard >= 0.5
    """,
    tags=("dedup", "lsh", "incremental"),
)
def q239_incremental_minhash_dedup(spark, sf_dir):
    """Incremental near-dup probe — the production shape q62 doesn't
    cover: an arriving BATCH (every 10th doc, last-3-words-mutated,
    new ids) is checked against the EXISTING corpus index, with the
    candidate join strictly new-bands ⋈ index-bands (never
    index × index, never new × new). Per arriving batch the work is
    O(n_new) signatures + an equi-join probe into the banded index —
    at 100 TB the index's shingle/band tables are persisted & bucketed
    once, and each daily increment pays only its own probe; re-running
    full-corpus dedup per batch would redo the O(n_index²/bands)
    self-join daily. New rows with no emitted pair are novel
    (admitted + appended to the index). Same deterministic md5-minhash
    family as q62, so the full probe is hash-checked; mutated docs
    must rediscover their originals.

    plan-change: inherits _minhash_stage's r11 explode+agg signature
    kernel (see q62) — one extra map-side-combined exchange per staged
    side, less CPU, identical pairs. Allowed: hash-exchanges<=5
    shuffle-joins<=2."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    increment = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(words, 1, F.greatest(F.size(words) - 3, F.lit(1))),
            " ",
        ).alias("text"),
    )
    pairs = DD.minhash_incremental_pairs(
        d.select("doc_id", "text"), increment, "doc_id", "text",
        shingle_n=3, num_hashes=8, jaccard_threshold=0.5,
    )
    return pairs.select(
        "new_id", "index_id", F.round("jaccard", 9).alias("jaccard")
    )


# --------------------------------------------------------------------------
# q267 — hard-negative mining (contrastive-training data prep)


@register(
    "q267_hard_negative_mining",
    sql="""
    WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, label, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id >= 8),
         scored AS (
           SELECT q.query_id, q.qlabel,
                  c.vec_id AS neighbor_id, c.label AS neighbor_group,
                  list_dot_product(c.cv, q.qv)
                  / (sqrt(list_dot_product(c.cv, c.cv))
                     * sqrt(list_dot_product(q.qv, q.qv))) AS similarity
           FROM c CROSS JOIN q
           WHERE c.label != q.qlabel)
    SELECT query_id, qlabel, neighbor_id, neighbor_group,
           round(similarity, 9) AS similarity,
           CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY similarity DESC, neighbor_id) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """,
    tags=("similarity", "training", "contrastive"),
)
def q267_hard_negative_mining(spark, sf_dir):
    """Hard-negative mining — the contrastive-training data-prep
    step: for each anchor embedding, the 5 most-similar vectors from
    a DIFFERENT class (operators/similarity.py hard_negative_topk).
    Random negatives are trivially separable and teach nothing; the
    near-miss negatives this emits are what make an embedding model
    learn margins (the standard recipe behind dense-retriever
    training, e.g. DPR/ANCE-style mining, public literature). Scale
    shape: identical to the pruned exact-kNN path — the 8-anchor
    matrix broadcasts with its label vector, each corpus partition
    does one NumPy matmul, masks SAME-class columns to -inf
    (positives must never leak into the negative set), and ships
    only its local top-5 per anchor; the final window sees
    O(partitions x anchors x 5) rows. The DuckDB oracle replays it
    as the label-filtered cross join — exhaustive at sf, while the
    engine path stays the partition-pruned kernel that survives a
    billion-vector corpus."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    corpus = e.where(F.col("vec_id") >= 8)
    out = SIM.hard_negative_topk(corpus, queries, k=5)
    qlab = queries.select(
        "query_id", F.col("label").alias("qlabel")
    )
    return (
        out.join(F.broadcast(qlab), "query_id")
        .select(
            "query_id", "qlabel", "neighbor_id", "neighbor_group",
            F.round("similarity", 9).alias("similarity"),
            F.col("rank").alias("rnk"),
        )
    )


@register(
    "q289_minhash_banded_pairs",
    sql=f"""
    WITH {_Q62_SIG_CTES},
    bnd AS (
        SELECT doc_id, grams, bb,
               CAST(sig[bb * 4 + 1] AS VARCHAR) || '|' ||
               CAST(sig[bb * 4 + 2] AS VARCHAR) || '|' ||
               CAST(sig[bb * 4 + 3] AS VARCHAR) || '|' ||
               CAST(sig[bb * 4 + 4] AS VARCHAR) AS bsig
        FROM sig, generate_series(0, 1) t(bb)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bnd a JOIN bnd b
          ON a.bb = b.bb AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    ),
    pj AS (
        SELECT c.id_a, c.id_b,
               CASE WHEN len(list_distinct(
                        list_concat(sa.grams, sb.grams))) = 0
                    THEN 0.0
                    ELSE CAST(len(list_intersect(sa.grams, sb.grams))
                              AS DOUBLE)
                         / len(list_distinct(
                               list_concat(sa.grams, sb.grams)))
               END AS jaccard
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.id_a
        JOIN sig sb ON sb.doc_id = c.id_b
    )
    SELECT id_a, id_b, round(jaccard, 9) AS jaccard
    FROM pj WHERE jaccard >= 0.5
    """,
    tags=("dedup", "lsh", "scale"),
)
def q289_minhash_banded_pairs(spark, sf_dir):
    """MinHash-LSH pairs with r=4 AND-banding (2 bands x 4 minima) —
    the 100 TB-shape variant of q62, added after the round-15 sf100
    decade probe measured the r=1 OR-construction's candidate set
    growing ~n²·J̄ (any shared shingle gives each of 8 single-hash
    bands a J-sized collision rate; at 5.5M docs the exact-Jaccard
    verify drowns). ANDing 4 minima per band drops unrelated-pair
    candidate probability from ~J to ~J⁴ (J=0.2: 1.6e-3 per band)
    while keeping planted near-dups (J≳0.8) at 1-(1-J⁴)² ≈ 66-90%
    recall per the standard S-curve — candidate volume stays ~linear
    in corpus size, which is the property that survives the last two
    decades. Same deterministic signature pipeline as q62 (the first
    8 md5-minhash minima), so both engines band the identical
    signature; same same-corpus mutation planting; oracle bands via
    an equi-join on the concatenated band signature, exactly the
    engine's shuffle key."""
    from rc_rag_spark.operators import dedup as DD

    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    mutated = (
        d.where(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(
                F.slice(
                    words, 1, F.greatest(F.size(words) - 3, F.lit(1))
                ),
                " ",
            ).alias("text"),
        )
    )
    corpus = d.select("doc_id", "text").unionByName(mutated)
    pairs = DD.minhash_det_pairs(
        corpus, "doc_id", "text", shingle_n=3,
        num_hashes=8, jaccard_threshold=0.5, rows_per_band=4,
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 9).alias("jaccard")
    )
