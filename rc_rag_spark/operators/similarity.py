"""Similarity search over embedding columns (north-star extension,
SURVEY §2.2 'Similarity search').

  brute_force_topk        exact top-k cosine/dot: broadcast query set,
                          codegen'd scoring, per-query window (all
                          scored rows reach the window — the small-n
                          exact baseline).
  brute_force_topk_pruned exact top-k at scale: per-partition NumPy
                          block scoring + local top-k, the final
                          window sees O(partitions·queries·k) rows.
  lsh_topk_join           approximate: BucketedRandomProjectionLSH
                          candidate join, exact re-rank of candidates.
  embedding_near_dup      cosine-threshold near-duplicate pairs via
                          LSH candidates + exact verify.

All exact math is native Catalyst (functions/vectors.py) — sequential
folds, deterministic, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rc_rag_spark.functions.vectors import dot, l2_norm


def _dense_matrix(values, dtype=None):
    """Rows of array-likes -> 2-D float64 ndarray. EMPTY input yields
    shape (0, 0) — np.array([]) is 1-D and every axis-1 reduction
    (norms, matmuls) would raise AxisError the moment a query or
    corpus side is empty, which at 100 TB is just a day with no
    data, not an exceptional state."""
    import numpy as np

    dtype = dtype or np.float64
    rows = [np.asarray(v, dtype=dtype) for v in values]
    if not rows:
        return np.zeros((0, 0), dtype=dtype)
    return np.array(rows)


def _empty_pairs_result(df, id_col, extra_name, extra_type):
    """Zero-row (id_a, id_b, <extra>) frame — the empty-input return
    of the pair-emitting operators (near-dup pairs, SRP signatures),
    typed from the real id column so downstream unions/joins
    resolve."""
    from pyspark.sql import types as T

    id_t = df.schema[id_col].dataType
    return df.sparkSession.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("id_a", id_t),
                T.StructField("id_b", id_t),
                T.StructField(extra_name, extra_type),
            ]
        ),
    )


def _empty_topk_result(corpus, queries, id_col, query_id_col):
    """Zero-row DataFrame with the exact top-k output schema
    (query_id, neighbor_id, similarity double, rank int) — the
    empty-input return of every *_topk operator, typed from the real
    input columns so unions/joins downstream still resolve."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(
                query_id_col, queries.schema[query_id_col].dataType
            ),
            T.StructField("neighbor_id", corpus.schema[id_col].dataType),
            T.StructField("similarity", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    return corpus.sparkSession.createDataFrame([], schema)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    metric: str = "cosine",
    max_queries: int = 64,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Plan shape: broadcast-nested-loop join (queries are broadcast —
    they must be small), similarity evaluated in codegen, then a
    row_number window partitioned by query. The corpus itself never
    shuffles, but all n_queries × n_corpus scored candidate rows do
    flow into the per-query window — this is the exact baseline; use
    brute_force_topk_pruned (identical results, local top-k before the
    window) or lsh_topk_join / ann.ivf_topk when that candidate volume
    is the bottleneck.

    Scale guard: the candidate volume is n_queries × n_corpus, so a
    large query set silently turns this into an all-pairs shape. The
    query side is counted first (limit(max_queries+1).count() — Spark
    can stop the scan early) and anything over `max_queries` raises
    toward the pruned/ANN paths instead of melting the shuffle.
    """
    if metric not in ("cosine", "dot"):
        raise ValueError(f"unknown metric: {metric}")
    # NULL embeddings score NULL similarity and would still rank;
    # exclude them on both sides (SQL-NULL: no match for NULL keys)
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    n_q = queries.limit(max_queries + 1).count()
    if n_q > max_queries:
        raise ValueError(
            f"brute_force_topk scores n_queries x n_corpus candidate "
            f"rows and the query set exceeds max_queries={max_queries}. "
            f"Use brute_force_topk_pruned (exact, per-partition local "
            f"top-k) or lsh_topk_join/ann.ivf_topk, or raise "
            f"max_queries explicitly for a ground-truth run."
        )
    # Stage the norms BELOW the cross join: each is an interpreted HOF
    # fold over the whole vector, so computing them per input row
    # (n + q folds) instead of per scored pair (2·n·q folds) removes
    # most of the non-codegen work. dot/(cn·qn) keeps the exact float
    # op order of cosine(c, q), so results stay bit-identical.
    want_norm = metric == "cosine"
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            *([l2_norm(F.col(vec_col)).alias("_qn")] if want_norm else []),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        *([l2_norm(F.col(vec_col)).alias("_cn")] if want_norm else []),
    )
    d = dot(F.col("_cvec"), F.col("_qvec"))
    sim = d / (F.col("_cn") * F.col("_qn")) if want_norm else d
    scored = c.crossJoin(q).select(
        F.col("_qid").alias(query_id_col),
        F.col("_cid").alias("neighbor_id"),
        sim.alias("similarity"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def _to_ml_vector(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out_col, array_to_vector(F.col(vec_col).cast("array<double>")))


def lsh_topk_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    max_l2: float = 10.0,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-projection LSH: bucket join on
    hash bands (no cross product), exact cosine re-rank of candidates.
    Recall is tunable via num_hash_tables / bucket_length / max_l2."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    # NULL embeddings: array_to_vector NPEs on NULL — excluded on
    # both sides (SQL-NULL: no match for NULL keys)
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    # MLlib's LSH fit() needs >=1 row to size its hyperplanes ("head
    # of empty array"); an empty corpus is a legal input (empty
    # partition / fresh table), not a fit error
    if corpus.isEmpty():
        return _empty_topk_result(corpus, queries, id_col, query_id_col)

    # stage norms below the candidate join (same rationale and float-op
    # order as brute_force_topk)
    c = _to_ml_vector(
        corpus.withColumn("_n", l2_norm(F.col(vec_col))), vec_col, "_v"
    )
    q = _to_ml_vector(
        queries.withColumn("_n", l2_norm(F.col(vec_col))), vec_col, "_v"
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(c)
    cand = model.approxSimilarityJoin(c, q, max_l2, distCol="_l2")
    scored = cand.select(
        F.col(f"datasetB.{query_id_col}").alias(query_id_col),
        F.col(f"datasetA.{id_col}").alias("neighbor_id"),
        (
            dot(F.col(f"datasetA.{vec_col}"), F.col(f"datasetB.{vec_col}"))
            / (F.col("datasetA._n") * F.col("datasetB._n"))
        ).alias("similarity"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.95,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. LSH self-join generates
    candidates (cosine ≥ t on unit-norm vectors ⇔ L2 ≤ √(2-2t)),
    exact cosine verifies. Returns (id_a, id_b, similarity)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    df = df.where(F.col(vec_col).isNotNull())  # NULL vec: no pairs
    if df.isEmpty():  # see lsh_topk_join: fit() cannot size an
        # empty corpus, and no rows means no pairs
        from pyspark.sql import types as T

        return _empty_pairs_result(df, id_col, "similarity", T.DoubleType())

    # compute the norm ONCE per row — an aggregate inside the
    # per-element transform lambda would re-fold the whole array for
    # every element (O(d²))
    normed = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v64"))
        .withColumn("_norm", l2_norm(F.col("_v64")))
        .select(
            F.col(id_col),
            F.transform(F.col("_v64"), lambda x: x / F.col("_norm")).alias("_unit"),
        )
    )
    c = _to_ml_vector(normed, "_unit", "_v")
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(c)
    max_l2 = float((2.0 - 2.0 * cosine_threshold) ** 0.5)
    cand = model.approxSimilarityJoin(c, c, max_l2, distCol="_l2")
    return (
        cand.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            dot(F.col("datasetA._unit"), F.col("datasetB._unit")).alias(
                "similarity"
            ),
        )
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.col("similarity") >= cosine_threshold)
    )


def exact_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.8,
    max_rows: int = 1_000_000,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs — the ground-truth
    baseline for embedding_near_dup (LSH): every pair (a < b) with
    cosine >= threshold.

    Physical shape mirrors brute_force_topk_pruned: the full normalized
    matrix is broadcast (it must fit on an executor — the exact path is
    for ground-truth/verification corpora; use embedding_near_dup when
    n is web-scale), each corpus partition scores its block against the
    matrix with one float64 matmul and emits only above-threshold
    pairs, so nothing quadratic is ever shuffled or collected. The
    LINEAR driver materialization is still the scale bound, so the
    corpus is counted first and anything over `max_rows` raises toward
    the LSH path instead of OOMing the driver.
    """
    import numpy as np
    import pandas as pd

    # NULL embeddings cannot be scored — the SQL-NULL contract (a
    # NULL key never matches) applied to similarity: exclude them
    df = df.where(F.col(vec_col).isNotNull())
    # limit(max_rows+1).count() instead of a full count(): Spark can
    # stop scanning after max_rows+1 rows, so the guard doesn't pay a
    # second full evaluation of the upstream plan before the collect.
    n_rows = df.limit(max_rows + 1).count()
    if n_rows > max_rows:
        raise ValueError(
            f"exact_near_dup_pairs is the ground-truth baseline and "
            f"materializes the corpus on the driver: >{max_rows} rows "
            f"(max_rows={max_rows}). Use embedding_near_dup (LSH "
            f"candidates + exact verify) for large tables, or raise "
            f"max_rows explicitly if the driver can hold the matrix."
        )
    spark = df.sparkSession
    pdf = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).toPandas()
    ids = pdf["id"].to_numpy()
    mat = _dense_matrix(pdf["v"])
    if len(ids):
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat, cosine_threshold))

    def block_pairs(batches):
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault('block_pairs')
        ids_b, mat_b, thr = bc.value
        order = {i: k for k, i in enumerate(ids_b)}
        for pdf_b in batches:
            if len(pdf_b) == 0:
                continue
            rows = [order[i] for i in pdf_b[id_col]]
            sims = mat_b[rows] @ mat_b.T
            out_a, out_b, out_s = [], [], []
            for r, sim_row in zip(rows, sims):
                hit = np.nonzero(sim_row >= thr)[0]
                for c in hit:
                    # emit each pair once, from the smaller-id side
                    if ids_b[r] < ids_b[c]:
                        out_a.append(ids_b[r])
                        out_b.append(ids_b[c])
                        out_s.append(sim_row[c])
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "similarity": out_s}
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col).mapInPandas(
        block_pairs,
        schema=f"id_a {id_type}, id_b {id_type}, similarity double",
    )


def brute_force_topk_pruned(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    metric: str = "cosine",
    max_queries: int = 4096,
) -> DataFrame:
    """Exact top-k with per-partition pruning — the 100 TB shape of
    brute_force_topk: each corpus partition scores its block against
    the (small) query matrix with one NumPy matmul and emits only its
    LOCAL top-k per query, so the final per-query window sees
    O(partitions × queries × k) rows instead of O(corpus × queries).
    Results are identical to brute_force_topk up to float-summation
    order in the similarity values (neighbor sets match on non-tied
    data).

    Scale guard: the query side is materialized on the driver
    (toPandas) and broadcast as one dense matrix, so its size is a
    driver/executor-memory budget, not a shuffle budget. As with
    brute_force_topk, the query side is counted first
    (limit(max_queries+1).count() — Spark can stop the scan early) and
    anything over `max_queries` raises toward lsh_topk_join /
    ann.ivf_topk, which keep the query side distributed. The default
    (4096 queries) bounds the broadcast at 4096·d doubles (~24 MB at
    d=768); raise it explicitly for a larger ground-truth run."""
    import numpy as np
    import pandas as pd

    if metric not in ("cosine", "dot"):
        raise ValueError(f"unknown metric: {metric}")
    # NULL embeddings: see brute_force_topk — excluded on both sides
    # (np.asarray(None) would kill the executor-side kernel)
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    n_q = queries.limit(max_queries + 1).count()
    if n_q > max_queries:
        raise ValueError(
            f"brute_force_topk_pruned collects the query side to the "
            f"driver and broadcasts it as a dense matrix; the query set "
            f"exceeds max_queries={max_queries}. Use lsh_topk_join or "
            f"ann.ivf_topk (query side stays distributed), or raise "
            f"max_queries explicitly for a ground-truth run."
        )
    spark = corpus.sparkSession
    q_pdf = queries.select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).toPandas()
    q_ids = q_pdf["qid"].to_numpy()
    q_mat = _dense_matrix(q_pdf["qv"])
    q_norm = np.linalg.norm(q_mat, axis=1)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm, metric))

    def local_topk(batches):
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault('brute_force_topk_pruned')
        q_ids_b, q_mat_b, q_norm_b, metric_b = bc.value
        if len(q_ids_b) == 0:
            return  # no queries -> no candidates (and (n,d)@(0,0).T
            # would be a shape error, not an empty result)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            sims = c_mat @ q_mat_b.T
            if metric_b == "cosine":
                c_norm = np.linalg.norm(c_mat, axis=1)
                sims = sims / np.outer(c_norm, q_norm_b)
            ids = pdf[id_col].to_numpy()
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids_b):
                col = sims[:, j]
                # tie-break on id asc (mirrors the final window ordering
                # — without it, tied similarities at the k boundary keep
                # partition-order ids and the global result diverges
                # from brute_force_topk)
                top = np.lexsort((ids, -col))[:k]
                out_q.extend([qid] * len(top))
                out_n.extend(ids[top])
                out_s.extend(col[top])
            yield pd.DataFrame(
                {
                    query_id_col: out_q,
                    "neighbor_id": out_n,
                    "similarity": out_s,
                }
            )

    # derive output id types from the inputs — ids need not be bigint
    qid_type = dict(queries.dtypes)[query_id_col]
    nid_type = dict(corpus.dtypes)[id_col]
    local = corpus.select(id_col, vec_col).mapInPandas(
        local_topk,
        schema=f"{query_id_col} {qid_type}, neighbor_id {nid_type}, similarity double",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    query_id_col: str = "query_id",
    max_queries: int = 4096,
) -> DataFrame:
    """Label-aware exact top-k: for every query, the k most-similar
    corpus vectors whose `group_col` DIFFERS from the query's — the
    hard-negative mining step of contrastive/embedding training
    (in-batch negatives are easy; the negatives that teach are the
    near-misses from OTHER classes). Same 100 TB shape as
    brute_force_topk_pruned: the query matrix (plus its group vector)
    broadcasts once, each corpus partition scores its block with one
    NumPy matmul, same-group candidates are masked out of the score
    matrix, and only the local top-k per query crosses the shuffle —
    O(partitions x queries x k) rows, never corpus x queries. The
    same max_queries budget applies (hard-negative mining typically
    runs per training batch, comfortably under it)."""
    import numpy as np
    import pandas as pd

    # NULL embeddings: see brute_force_topk — excluded on both sides
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    n_q = queries.limit(max_queries + 1).count()
    if n_q > max_queries:
        raise ValueError(
            f"hard_negative_topk broadcasts the query side; the query "
            f"set exceeds max_queries={max_queries}. Mine negatives in "
            f"query batches, or use lsh_topk_join buckets per group."
        )
    spark = corpus.sparkSession
    q_pdf = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(group_col).alias("qg"),
        F.col(vec_col).alias("qv"),
    ).toPandas()
    q_ids = q_pdf["qid"].to_numpy()
    q_grp = q_pdf["qg"].to_numpy()
    q_mat = _dense_matrix(q_pdf["qv"])
    q_norm = np.linalg.norm(q_mat, axis=1)
    bc = spark.sparkContext.broadcast((q_ids, q_grp, q_mat, q_norm))

    def local_topk(batches):
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault('hard_negative_topk')
        q_ids_b, q_grp_b, q_mat_b, q_norm_b = bc.value
        if len(q_ids_b) == 0:
            return  # no queries -> no negatives to mine
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            c_grp = pdf[group_col].to_numpy()
            c_norm = np.linalg.norm(c_mat, axis=1)
            # clamped denominator: zero-norm vectors would otherwise
            # divide 0/0 -> NaN + RuntimeWarnings and silently shrink
            # the top-k through the isfinite filter
            denom = np.outer(
                np.maximum(c_norm, 1e-300), np.maximum(q_norm_b, 1e-300)
            )
            sims = (c_mat @ q_mat_b.T) / denom
            # mask same-group candidates (positives, never in top-k)
            # and zero-norm rows/columns (cosine undefined) explicitly
            mask = (
                (c_grp[:, None] == q_grp_b[None, :])
                | (c_norm[:, None] == 0.0)
                | (q_norm_b[None, :] == 0.0)
            )
            sims = np.where(mask, -np.inf, sims)
            ids = pdf[id_col].to_numpy()
            out = {query_id_col: [], "neighbor_id": [],
                   "neighbor_group": [], "similarity": []}
            for j, qid in enumerate(q_ids_b):
                col = sims[:, j]
                top = np.lexsort((ids, -col))[:k]
                top = top[np.isfinite(col[top])]
                out[query_id_col].extend([qid] * len(top))
                out["neighbor_id"].extend(ids[top])
                out["neighbor_group"].extend(c_grp[top])
                out["similarity"].extend(col[top])
            yield pd.DataFrame(out)

    qid_type = dict(queries.dtypes)[query_id_col]
    nid_type = dict(corpus.dtypes)[id_col]
    grp_type = dict(corpus.dtypes)[group_col]
    local = corpus.select(id_col, group_col, vec_col).mapInPandas(
        local_topk,
        schema=(
            f"{query_id_col} {qid_type}, neighbor_id {nid_type}, "
            f"neighbor_group {grp_type}, similarity double"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
