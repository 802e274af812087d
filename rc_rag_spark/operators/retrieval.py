"""Retrieval-model training + batch inference via MLlib (north-star
row 'Retrieval model + batch inference', SURVEY §2.2).

TF-IDF featurization of (question, passage) pairs → logistic
regression relevance scorer → distributed batch scoring. All MLlib
Pipeline stages — fit once on the driver, transform as distributed
jobs; the fitted model broadcasts to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_pair_features(
    pairs: DataFrame,
    text_cols=("question", "passage"),
    num_features: int = 1 << 12,
):
    """Tokenize + hash-TF + IDF each text column, assemble features.
    Returns (pipeline_stages, feature_col).

    num_features sizes the hashing space AND the LR gradient (every
    iteration tree-aggregates a dense vector of 2*num_features+2
    doubles): 4096 covers a few-thousand-token vocabulary with few
    collisions; raise it for real corpora."""
    from pyspark.ml.feature import (
        HashingTF,
        IDF,
        RegexTokenizer,
        SQLTransformer,
        VectorAssembler,
    )

    stages, vec_cols = [], []
    for c in text_cols:
        stages.append(
            RegexTokenizer(
                inputCol=c, outputCol=f"_{c}_toks",
                pattern=r"[^\p{L}\p{N}]+", toLowercase=True,
            )
        )
        stages.append(
            HashingTF(
                inputCol=f"_{c}_toks", outputCol=f"_{c}_tf",
                numFeatures=num_features,
            )
        )
        stages.append(IDF(inputCol=f"_{c}_tf", outputCol=f"_{c}_tfidf"))
        vec_cols.append(f"_{c}_tfidf")
    # question↔passage interaction features (token overlap count +
    # Jaccard) — a linear model over separate TF-IDF vectors cannot
    # express "query term appears in passage"
    qc, pc = text_cols[0], text_cols[1]
    stages.append(
        SQLTransformer(
            statement=f"""
            SELECT *,
              CAST(size(array_intersect(
                  split(lower({qc}), '\\\\s+'),
                  split(lower({pc}), '\\\\s+'))) AS DOUBLE) AS _overlap,
              CAST(size(array_intersect(
                  split(lower({qc}), '\\\\s+'),
                  split(lower({pc}), '\\\\s+'))) AS DOUBLE)
              / greatest(size(array_union(
                  split(lower({qc}), '\\\\s+'),
                  split(lower({pc}), '\\\\s+'))), 1) AS _jaccard
            FROM __THIS__
            """
        )
    )
    vec_cols += ["_overlap", "_jaccard"]
    stages.append(VectorAssembler(inputCols=vec_cols, outputCol="features"))
    return stages


def train_relevance_model(
    train_pairs: DataFrame,
    label_col: str = "label",
    text_cols=("question", "passage"),
    max_iter: int = 20,
    reg_param: float = 0.01,
):
    """Fit the TF-IDF + LogisticRegression relevance pipeline."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    stages = build_pair_features(train_pairs, text_cols)
    stages.append(
        LogisticRegression(
            featuresCol="features", labelCol=label_col,
            maxIter=max_iter, regParam=reg_param,
        )
    )
    return Pipeline(stages=stages).fit(train_pairs)


def score_pairs(model, pairs: DataFrame) -> DataFrame:
    """Batch inference: relevance probability per (question, passage)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(pairs)
    return scored.withColumn(
        "relevance", F.round(vector_to_array("probability")[1], 9)
    ).drop(
        *[c for c in scored.columns if c.startswith("_")],
        "features", "rawPrediction", "probability",
    )


def synthesize_training_pairs(spark, sf_dir: str, limit: int = 400) -> DataFrame:
    """Deterministic (question, passage, label) pairs from documents:
    positive = passage drawn from the doc the question is about,
    negative = passage from the next doc."""
    from rc_rag_spark.sources import table

    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < limit)
    words = F.split("text", " ")
    # entity marker ties a question to its document (the fixture's
    # shared word-soup vocabulary alone is not separable)
    marker = F.concat(F.lit("entity"), (F.col("doc_id") % 50).cast("string"))
    q = F.concat(
        F.lit("what is "),
        F.array_join(F.slice(words, 1, 3), " "),
        F.lit(" about "), marker,
    )
    pos = d.select(
        F.col("doc_id").alias("pair_id"),
        q.alias("question"),
        F.concat(
            F.array_join(F.slice(words, 1, 12), " "), F.lit(" "), marker
        ).alias("passage"),
        F.lit(1.0).alias("label"),
    )
    neg_src = d.select(
        F.col("doc_id").alias("_nid"),
        F.concat(
            F.array_join(F.slice(words, 13, 12), " "),
            F.lit(" entity"),
            ((F.col("doc_id") + 17) % 50).cast("string"),
        ).alias("neg_passage"),
    )
    neg = (
        pos.join(
            neg_src,
            pos.pair_id == (neg_src._nid + 1) % limit,
        )
        .select(
            (F.col("pair_id") + 1_000_000).alias("pair_id"),
            "question",
            F.col("neg_passage").alias("passage"),
            F.lit(0.0).alias("label"),
        )
    )
    return pos.unionByName(neg)
