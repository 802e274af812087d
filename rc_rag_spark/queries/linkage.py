"""Record linkage + closed-form text classification batch.

Three operator families a curation/linkage pipeline needs beyond
token-level dedup:

  - q186: multinomial naive-Bayes language classifier trained and
    scored entirely in closed form (count aggregates + Laplace
    smoothing) — "train on half the corpus, score the other half"
    with no iterative solver, so the whole model fit is
    hash-checkable against SQL.
  - q187: blocked Jaro-Winkler record linkage — the standard
    entity-resolution shape (block, pair within block, score with a
    string kernel). The kernel is a vectorized pandas UDF proven
    bit-identical to DuckDB's jaro_winkler_similarity.
  - q188: duplicated token-span detection (the core join of
    exact-substring dedup a la "Deduplicating Training Data Makes
    Language Models Better"): explode 5-gram spans, group, keep spans
    seen in ≥2 documents.

Scale notes (100 TB):
  - q186's model tables (per-lang token counts) are the broadcast
    side; the test-token fan-out is |tokens|·|langs| with langs tiny.
    One shuffle to build the model, one broadcast join to score.
  - q187 never forms a cross product: candidate pairs are bounded by
    block sizes (salt oversized blocks before pairing, same playbook
    as the salted join operator).
  - q188 is the canonical shingle-group shape: shuffle moves
    (gram, doc) pairs once; map-side combine collapses within-doc
    repeats; at scale you'd hash grams to 64-bit before the shuffle
    (the q62 minhash pipeline already demonstrates that staging).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table


# --------------------------------------------------------------------------
# q186 — closed-form multinomial naive Bayes language ID


# Shared naive-Bayes posterior CTEs (train → per-(doc, lang) exact-
# DECIMAL log posterior `wp`). q186 ranks them into predictions; q199
# (queries/linalg_stats.py) bins the softmax confidence for the
# calibration report — one home for the model's oracle formulation.
_NB_CTES = """
    train AS (SELECT doc_id, lang, text FROM documents
                   WHERE doc_id % 2 = 0),
    test AS (SELECT doc_id, lang, text FROM documents
             WHERE doc_id % 2 = 1),
    ttok AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
             FROM train),
    ttk AS (SELECT lang, tok FROM ttok WHERE tok <> ''),
    wc AS (SELECT lang, tok, COUNT(*) AS c FROM ttk GROUP BY 1, 2),
    nl AS (SELECT lang, COUNT(*) AS n_tok FROM ttk GROUP BY 1),
    vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM ttk),
    prior AS (SELECT lang, COUNT(*) AS n_docs FROM train GROUP BY 1),
    ptot AS (SELECT COUNT(*) AS n_train FROM train),
    stok AS (SELECT doc_id, lang AS lang_true,
                    unnest(string_split(text, ' ')) AS tok
             FROM test),
    stk AS (SELECT doc_id, lang_true, tok, COUNT(*) AS tf
            FROM stok WHERE tok <> '' GROUP BY 1, 2, 3),
    cand AS (SELECT s.doc_id, s.lang_true, s.tok, s.tf, p.lang
             FROM stk s CROSS JOIN prior p),
    terms AS (SELECT c.doc_id, c.lang_true, c.lang,
                     CAST(c.tf AS DECIMAL(6,0))
                       * CAST(round(ln((coalesce(w.c, 0) + 1)
                                       / CAST(n.n_tok + v.v AS DOUBLE)),
                                    12) AS DECIMAL(16,12))
                         AS term
              FROM cand c
              LEFT JOIN wc w ON w.lang = c.lang AND w.tok = c.tok
              JOIN nl n ON n.lang = c.lang
              CROSS JOIN vocab v),
    scores AS (SELECT doc_id, lang_true, lang,
                      CAST(SUM(term) AS DECIMAL(28,12)) AS ll
               FROM terms GROUP BY 1, 2, 3),
    wp AS (SELECT s.doc_id, s.lang_true, s.lang,
                  s.ll + CAST(round(ln(p.n_docs
                                       / CAST(t.n_train AS DOUBLE)), 12)
                              AS DECIMAL(28,12)) AS post
           FROM scores s
           JOIN prior p ON p.lang = s.lang
           CROSS JOIN ptot t)"""


def nb_posteriors(spark, sf_dir):
    """Per-(test doc, lang) exact-DECIMAL naive-Bayes log posterior —
    the shared scoring stage behind q186 (argmax predictions) and
    q199 (calibration bins). Columns: doc_id, lang_true, lang, post
    (DECIMAL(28,12))."""
    d = table(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 2 == 0)
    test = d.where(F.col("doc_id") % 2 == 1)
    ttk = (
        train.select(
            "lang", F.explode(F.split("text", " ")).alias("tok")
        ).where(F.col("tok") != "")
    )
    wc = ttk.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    nl = ttk.groupBy("lang").agg(F.count("*").alias("n_tok"))
    vocab = ttk.agg(F.countDistinct("tok").alias("v"))
    prior = train.groupBy("lang").agg(F.count("*").alias("n_docs"))
    ptot = train.agg(F.count("*").alias("n_train"))
    stk = (
        test.select(
            "doc_id",
            F.col("lang").alias("lang_true"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "lang_true", "tok")
        .agg(F.count("*").alias("tf"))
    )
    cand = stk.crossJoin(F.broadcast(prior.select("lang")))
    terms = (
        cand.join(F.broadcast(wc), ["lang", "tok"], "left")
        .join(F.broadcast(nl), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "lang_true",
            "lang",
            (
                F.col("tf").cast("decimal(6,0)")
                * F.round(
                    F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + 1)
                        / (F.col("n_tok") + F.col("v")).cast("double")
                    ),
                    12,
                ).cast("decimal(16,12)")
            ).alias("term"),
        )
    )
    scores = terms.groupBy("doc_id", "lang_true", "lang").agg(
        F.sum("term").cast("decimal(28,12)").alias("ll")
    )
    return (
        scores.join(F.broadcast(prior), "lang")
        .crossJoin(F.broadcast(ptot))
        .select(
            "doc_id",
            "lang_true",
            "lang",
            (
                F.col("ll")
                + F.round(
                    F.log(
                        F.col("n_docs") / F.col("n_train").cast("double")
                    ),
                    12,
                ).cast("decimal(28,12)")
            ).alias("post"),
        )
    )


@register(
    "q186_naive_bayes_langid",
    sql=f"""
    WITH {_NB_CTES},
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY post DESC, lang) AS rk
          FROM wp)
    SELECT doc_id, lang_true, lang AS lang_pred,
           round(CAST(post AS DOUBLE), 6) AS log_posterior
    FROM r WHERE rk = 1
    """,
    tags=("ml", "naive-bayes", "langid"),
)
def q186_naive_bayes_langid(spark, sf_dir):
    """Multinomial naive Bayes language classifier, fully closed-form:
    train on even doc_ids (per-lang token counts + Laplace smoothing +
    log priors), score odd doc_ids by summing tf·log-likelihood terms,
    argmax per doc tie-broken by lang. Each log-likelihood is
    quantized to DECIMAL(28,12) BEFORE the tf multiply (decimal·int
    is exact) and the per-doc SUM is exact DECIMAL; the argmax
    compares exact DECIMALs and the posterior is reported at 1e-6,
    which absorbs the residual round-half tie a raw double can hit at
    the 12th digit. Train AND inference hash-match SQL — the
    'batch-inference without a solver' counterpart to the MLlib path
    (q72). Model tables (wc/nl/prior) are the broadcast side at any
    scale; scoring is one broadcast join over test tokens with a
    |langs|-wide fan-out."""
    wp = nb_posteriors(spark, sf_dir)
    rk = Window.partitionBy("doc_id").orderBy(
        F.col("post").desc(), F.col("lang")
    )
    return (
        wp.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select(
            "doc_id",
            "lang_true",
            F.col("lang").alias("lang_pred"),
            F.round(F.col("post").cast("double"), 6).alias("log_posterior"),
        )
    )


# --------------------------------------------------------------------------
# q187 — blocked Jaro-Winkler record linkage over part names


@register(
    "q187_jaro_winkler_linkage",
    sql="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blocked AS (SELECT p_name,
                       split_part(p_name, ' ', -1) AS blk
                FROM names),
    pairs AS (SELECT a.p_name AS name_a, b.p_name AS name_b,
                     jaro_winkler_similarity(a.p_name, b.p_name) AS jw
              FROM blocked a JOIN blocked b
                ON a.blk = b.blk AND a.p_name < b.p_name)
    SELECT name_a, name_b, round(jw, 9) AS jw
    FROM pairs WHERE jw >= 0.5
    """,
    tags=("linkage", "jaro-winkler", "blocking"),
)
def q187_jaro_winkler_linkage(spark, sf_dir):
    """Blocked record linkage: distinct part names blocked on their
    last token (the product type), all within-block pairs scored with
    Jaro-Winkler, threshold 0.5. The pandas-UDF kernel
    (functions/strsim.py) is fuzz-proven bit-identical to DuckDB's
    jaro_winkler_similarity, so a string-kernel UDF query still
    hash-matches. Candidate volume is sum of block-size^2 — never the
    corpus cross product; oversized blocks get salted/split exactly
    like skewed join keys."""
    from rc_rag_spark.functions.strsim import jaro_winkler_udf

    p = table(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    blocked = names.select(
        "p_name", F.element_at(F.split("p_name", " "), -1).alias("blk")
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_name") < F.col("b.p_name")),
    ).select(
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
    )
    scored = pairs.withColumn(
        "jw", jaro_winkler_udf(F.col("name_a"), F.col("name_b"))
    )
    return scored.where(F.col("jw") >= 0.5).select(
        "name_a", "name_b", F.round("jw", 9).alias("jw")
    )


# --------------------------------------------------------------------------
# q188 — duplicated token spans across documents


@register(
    "q188_duplicate_ngram_spans",
    sql="""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(text, ' '),
                                  x -> x <> '') AS toks
               FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) - 3),
                        i -> array_to_string(toks[i:i+4], ' '))) AS gram
          FROM t WHERE len(toks) >= 5)
    SELECT gram,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM g GROUP BY gram
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    tags=("dedup", "ngram-span", "exact-substring"),
)
def q188_duplicate_ngram_spans(spark, sf_dir):
    """Duplicated 5-token spans appearing in >=2 documents — the
    candidate join at the heart of exact-substring training-data
    dedup (Lee et al. 2022): any repeated span longer than the
    threshold shows up as a repeated shingle. One explode + one
    grouped count; map-side combine collapses within-partition
    repeats, so the shuffle carries near-distinct (gram, doc) pairs.
    At 100 TB the gram string would be xxhash64-ed before the shuffle
    (collision-checked after), exactly as the minhash pipeline (q62)
    stages its shingles."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = d.select("doc_id", toks.alias("toks")).where(F.size("toks") >= 5)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 4),
        lambda i: F.array_join(F.slice("toks", i, 5), " "),
    )
    g = t.select("doc_id", F.explode(grams).alias("gram"))
    return (
        g.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occ"),
        )
        .where(F.col("n_docs") >= 2)
    )
