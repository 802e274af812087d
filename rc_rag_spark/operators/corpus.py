"""Training-corpus construction operators (north-star extension,
SURVEY §2.2): the relational machinery a large-scale LLM data pipeline
needs between raw documents and training shards.

  inverted_index         token -> document-frequency stats + posting
                         list. One explode + one hash agg keyed on the
                         token — the classic map-side-combinable shape.
  bm25_scores            BM25 relevance of every document against a
                         (small) bag of query terms — the lexical
                         retrieval scorer complementing the MLlib
                         relevance model (operators/retrieval.py) and
                         the embedding kNN (operators/similarity.py).
  tfidf_topk_terms       per-document top-k keywords by TF-IDF.
  pack_token_budget      greedy sequential packing of documents into
                         token-budget-bounded training batches,
                         parallel across shards.
  stratified_hash_sample per-stratum deterministic sampling by key
                         hash — reproducible across engines, runs and
                         partitionings, unlike RNG sampling.

None of these exist in the reference (its retrieval is an external
dense retriever, /root/reference/code/run_llm_ours.py:13-17 merely
selects the passage column); all are first-class corpus ops at 100 TB.

Scale notes sit on each operator. Common discipline: token explosion
always flows into a partial-aggregable groupBy on the exploded key
(never a collect), per-document state is a window or grouped-map over
the document key, and cross-engine float determinism follows
queries/core.py (exact DECIMAL sums; single-expression scores rounded
on both sides).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.functions.text import simple_tokenize


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) pairs — one row per token OCCURRENCE."""
    return df.select(
        F.col(id_col), F.explode(simple_tokenize(text_col)).alias("token")
    )


def inverted_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Posting lists: for every token, the number of documents it
    appears in, its total occurrence count, and the sorted document id
    list (comma-joined string — the sink-friendly representation).

    Scale: explode -> groupBy(token) is one shuffle with map-side
    partial aggregation; the posting list is the only unbounded cell,
    and a production sink would write it as an array column bucketed
    by token. Hot tokens (stopwords) are the skew risk — cap or filter
    them upstream, or salt the agg (operators/skew.py).
    """
    t = _tokens(df, id_col, text_col)
    return t.groupBy("token").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count("*").alias("total_tf"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set(F.col(id_col))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of each document against a bag of query terms
    (Robertson/Sparck-Jones idf as used by Lucene:
    idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    Returns (id, n_hits, score) for documents matching >= 1 term.

    Physical shape: the corpus-wide stats (N, avgdl) are a 1-row
    broadcast; per-term document frequencies are a tiny broadcast too
    (bounded by |query_terms|); the only corpus-sized shuffles are the
    (id, term) tf aggregation and the final per-id sum — both keyed on
    the document id, both map-side combinable. Nothing quadratic,
    nothing collected.

    Determinism: each per-term score is a single arithmetic expression
    (bit-identical across engines); the cross-term sum is rounded to 9
    decimals per term and summed EXACTLY in DECIMAL so partial-agg
    order cannot drift the total (queries/core.py discipline).
    """
    terms = [t.lower() for t in query_terms]
    if not terms:
        raise ValueError("bm25_scores: need at least one query term")

    docs = df.select(
        F.col(id_col), F.size(simple_tokenize(text_col)).alias("_dl"),
        simple_tokenize(text_col).alias("_toks"),
    )
    # corpus stats: exact ints -> avgdl is the same double everywhere
    stats = docs.agg(
        F.count("*").alias("_n"), F.sum("_dl").alias("_sumdl")
    )
    tf = (
        docs.select(F.col(id_col), F.col("_dl"),
                    F.explode("_toks").alias("_term"))
        .where(F.col("_term").isin(terms))
        .groupBy(id_col, "_dl", "_term")
        .agg(F.count("*").alias("_tf"))
    )
    dfreq = tf.groupBy("_term").agg(F.count("*").alias("_df"))

    n = F.col("_n").cast("double")
    avgdl = F.col("_sumdl").cast("double") / n
    idf = F.log(
        F.lit(1.0)
        + (n - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    tfn = F.col("_tf").cast("double")
    denom = tfn + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl").cast("double") / avgdl
    )
    term_score = F.round(idf * tfn * F.lit(k1 + 1.0) / denom, 9)

    scored = (
        tf.join(F.broadcast(dfreq), "_term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            term_score.cast("decimal(28,9)").alias("_s"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_hits"),
        F.round(F.sum("_s").cast("double"), 6).alias("score"),
    )


def tfidf_topk_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k keywords per document by TF-IDF (tf = occurrences in doc,
    idf = ln(N/df), df = docs containing the term). Ties break on the
    term string, so the output is deterministic.

    Scale: two shuffles — (id, term) tf agg and the per-id top-k
    window; df-per-term joins in broadcast when the vocabulary is small
    and degrades to a shuffle join (still keyed, still combinable)
    when it is not. The window sees only distinct (id, term) rows.
    """
    t = _tokens(df, id_col, text_col)
    tf = t.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("_n"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    score = F.round(
        F.col("tf").cast("double")
        * F.log(F.col("_n").cast("double") / F.col("df").cast("double")),
        9,
    )
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col), F.col("token"), F.col("tf"), F.col("df"),
            score.alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def pack_token_budget(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    shard_col: Optional[str] = None,
) -> DataFrame:
    """Greedy sequential packing of documents into training batches:
    walk documents in id order, accumulate token counts, and open a new
    batch whenever adding the next document would exceed `budget`
    (an over-budget single document still gets its own batch).

    Returns the input plus batch_id (0-based, per shard).

    Packing is inherently sequential, so parallelism comes from the
    shard key: each shard packs independently inside one grouped-map
    pandas batch (Arrow in, Arrow out, no driver involvement). At
    100 TB the shard key is whatever the training job already shards
    by (language × source × bucket); a shard must fit one executor's
    memory — the same contract as any applyInPandas group.
    """
    if budget <= 0:
        raise ValueError("pack_token_budget: budget must be positive")
    shard = shard_col or "_shard"
    src = df if shard_col else df.withColumn("_shard", F.lit(0))
    cols = src.columns

    def pack(pdf):
        import pandas as pd

        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("pack_token_budget")
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        batch, acc, out = 0, 0, []
        for tok in pdf[token_count_col]:
            # a NULL token count (NULL text upstream) packs as a
            # zero-token doc — it occupies its batch slot but never
            # pushes the accumulator over budget (pd.isna covers
            # NaN, None, AND pd.NA from nullable dtypes)
            tok = 0 if pd.isna(tok) else int(tok)
            if acc > 0 and acc + tok > budget:
                batch += 1
                acc = tok
            else:
                acc += tok
            out.append(batch)
        return pdf.assign(batch_id=out)

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    ) + ", batch_id int"
    packed = src.groupBy(shard).applyInPandas(pack, schema=schema)
    return packed.select(*cols, "batch_id") if shard_col else packed.select(
        *[c for c in cols if c != "_shard"], "batch_id"
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    md5(id)-derived uniform-[0,1) < rate(stratum). The up/down-sampling
    mix a curation pipeline applies per language/source/quality tier.

    A narrow per-row expression — no shuffle, no state, reproducible
    across engines and partitionings (same idiom as the train/val/test
    hash split). Rates are fractions in [0, 1]; strata absent from
    `rates` use default_rate.
    """
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"stratified_hash_sample: rate {r} for {s!r} "
                             "outside [0, 1]")
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        / F.lit(float(2**32))
    )
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return df.where(u < rate)
