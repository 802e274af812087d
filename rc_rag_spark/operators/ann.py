"""IVF (inverted-file) approximate nearest neighbor — the scale path
for similarity search when LSH recall tuning is awkward.

Index: KMeans (MLlib, seeded) partitions the corpus into n_clusters
cells. Query: score each query against the (tiny, broadcast) centroid
table, probe the n_probe nearest cells, exact-rank only those cells'
vectors. Shuffle cost is O(corpus) once at index build (cluster
assignment) and O(candidates) per query batch — never O(n_q × n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.functions.vectors import cosine


class EmptyCorpusError(ValueError):
    """Raised by build_ivf_index when the (NULL-filtered) corpus has
    zero vectors. A dedicated subclass so callers that short-circuit
    to an empty result (ivf_topk) catch ONLY this signal — any other
    ValueError (future param validation, MLlib errors) propagates."""


def build_ivf_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Returns (assigned_corpus, centroids): corpus + `_cell` column,
    and a small centroids table (cell, centroid array<double>)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    # NULL embeddings: array_to_vector NPEs on NULL — a vector that
    # doesn't exist belongs to no cell
    corpus = corpus.where(F.col(vec_col).isNotNull())
    feat = corpus.withColumn(
        "_v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    if feat.isEmpty():
        raise EmptyCorpusError(
            "build_ivf_index: corpus is empty — KMeans cannot place "
            "centroids with zero points. Query-level callers (ivf_topk) "
            "short-circuit to an empty result instead."
        )
    km = KMeans(k=n_clusters, seed=seed, featuresCol="_v", predictionCol="_cell")
    model = km.fit(feat)
    assigned = model.transform(feat).drop("_v")
    centroids = assigned.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe the n_probe nearest IVF cells per
    query, exact cosine re-rank inside them."""
    queries = queries.where(F.col(vec_col).isNotNull())
    # build_ivf_index applies the NULL filter and the (one) isEmpty
    # probe itself; an empty/all-NULL corpus surfaces as its
    # EmptyCorpusError rather than paying a second filter + action here
    try:
        assigned, centroids = build_ivf_index(
            corpus, vec_col, n_clusters, seed
        )
    except EmptyCorpusError:
        from rc_rag_spark.operators.similarity import _empty_topk_result

        return _empty_topk_result(corpus, queries, id_col, query_id_col)

    # rank cells per query against the broadcast centroid table
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    )
    cell_scores = q.crossJoin(F.broadcast(centroids)).select(
        "_qid", "_qvec", "cell",
        cosine(F.col("centroid"), F.col("_qvec")).alias("_csim"),
    )
    wc = Window.partitionBy("_qid").orderBy(F.col("_csim").desc(), F.col("cell"))
    probed = (
        cell_scores.withColumn("_crank", F.row_number().over(wc))
        .where(F.col("_crank") <= n_probe)
        .select("_qid", "_qvec", F.col("cell").alias("_cell"))
    )

    # exact rank within probed cells only
    cand = assigned.join(F.broadcast(probed), "_cell")
    scored = cand.select(
        F.col("_qid").alias(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col), F.col("_qvec")).alias("similarity"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
