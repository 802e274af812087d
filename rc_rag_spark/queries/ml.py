"""MLlib + multimodal query corpus entries (rows-only driver checks;
exact behavior covered in tests/test_multimodal_retrieval.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rc_rag_spark.operators import multimodal as MM
from rc_rag_spark.operators import retrieval as R
from rc_rag_spark.queries.core import register


@register("q72_retrieval_scoring", tags=("ml", "retrieval"))
def q72_retrieval_scoring(spark, sf_dir):
    """TF-IDF + overlap-feature logistic-regression relevance model:
    train on synthesized (question, passage, label) pairs, batch-score
    them (north-star 'MLlib retrieval model + batch inference')."""
    pairs = R.synthesize_training_pairs(spark, sf_dir, limit=200)
    model = R.train_relevance_model(pairs)
    return R.score_pairs(model, pairs).select(
        "pair_id", "label", (F.col("relevance") > 0.5).alias("predicted_relevant")
    )


@register("q73_media_features", tags=("multimodal",))
def q73_media_features(spark, sf_dir):
    """Multimodal plumbing: synthetic binary media → Arrow-batched
    feature extraction → per-kind stats (decode kernels stubbed, Spark
    path real)."""
    media = MM.synthesize_media(spark, n=96)
    return MM.media_stats(MM.extract_features(media))


@register("q74_video_frame_sample", tags=("multimodal",))
def q74_video_frame_sample(spark, sf_dir):
    """Frame-sampling explode pattern over video rows."""
    media = MM.synthesize_media(spark, n=96)
    frames = MM.sample_frames(media, every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.length("frame_payload")).cast("bigint").alias("total_bytes"),
    )
