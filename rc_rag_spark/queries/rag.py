"""RAG decision-pipeline query corpus (SURVEY §2.1 D1–D5, A1–A2, L1).

q40 exercises the A1/A2 aggregation shape against the DuckDB oracle on
synthesized decisions. q41/q42 run the full mock-LLM pipeline
(driver-side iterative loop + pandas-UDF backend); with the mock
backend every response is a deterministic function of the fixture row,
so the ENTIRE pipeline is spelled as one DuckDB query in rag_oracle.py
and both are hash-checked — plus exact golden-simulation checks in
tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rc_rag_spark.pipeline import decisions as D
from rc_rag_spark.queries import rag_oracle as RO
from rc_rag_spark.queries.core import register
from rc_rag_spark.sources import table


@register(
    "q40_risk_metrics",
    sql="""
    WITH d AS (
        SELECT CASE WHEN o_orderstatus = 'O' THEN 'keep' ELSE 'discard' END
                   AS label_decision,
               CASE WHEN CAST(floor(o_totalprice) AS BIGINT) % 2 = 0
                    THEN 'keep' ELSE 'discard' END AS pred_decision
        FROM orders
    ),
    c AS (
        SELECT
          CAST(SUM(CASE WHEN label_decision='keep' AND pred_decision='keep'
                   THEN 1 ELSE 0 END) AS BIGINT) AS AK,
          CAST(SUM(CASE WHEN label_decision='keep' AND pred_decision='discard'
                   THEN 1 ELSE 0 END) AS BIGINT) AS AD,
          CAST(SUM(CASE WHEN label_decision='discard' AND pred_decision='keep'
                   THEN 1 ELSE 0 END) AS BIGINT) AS UK,
          CAST(SUM(CASE WHEN label_decision='discard' AND pred_decision='discard'
                   THEN 1 ELSE 0 END) AS BIGINT) AS UD
        FROM d
    )
    SELECT AK, AD, UK, UD,
           CASE WHEN AK + UK != 0 THEN CAST(UK AS DOUBLE) / (AK + UK) END
               AS risk,
           CASE WHEN UD + AD != 0 THEN CAST(AD AS DOUBLE) / (UD + AD) END
               AS overcaution,
           CASE WHEN AK + AD != 0 THEN CAST(AK AS DOUBLE) / (AK + AD) END
               AS recall,
           CASE WHEN UK + UD != 0 THEN CAST(UD AS DOUBLE) / (UK + UD) END
               AS carefulness,
           CAST(AK + UD AS DOUBLE) / (AK + AD + UK + UD) AS alignment,
           CAST(AK + UK AS DOUBLE) / (AK + AD + UK + UD) AS coverage
    FROM c
    """,
    tags=("rag", "a1", "a2"),
)
def q40_risk_metrics(spark, sf_dir):
    """A1 confusion fold + A2 risk ratios over synthesized decisions.
    The fold is a partial+final hash agg — one row out of any number of
    input partitions, no shuffle of raw rows."""
    o = table(spark, sf_dir, "orders")
    d = o.select(
        F.when(F.col("o_orderstatus") == "O", "keep")
        .otherwise("discard")
        .alias("label_decision"),
        F.when(F.floor("o_totalprice").cast("bigint") % 2 == 0, "keep")
        .otherwise("discard")
        .alias("pred_decision"),
    )
    return D.risk_metrics(D.confusion_cells(d))


def samples_from_documents(spark, sf_dir, limit: int | None = None):
    """Deterministic QA samples derived from the documents fixture:
    passages are word-slices of the text, gold answers are drawn from
    passage words (so the mock backend's passage-derived answers are
    sometimes right, sometimes wrong, deterministically)."""
    # NOTE: the fixture scan is one partition, so the 5 LLM UDF stages
    # run as one python task each. A wide_table rebalance here measured
    # SLOWER end-to-end at fixture scale (5 stages × 32 tasks of ~16
    # rows each — per-task Arrow/python overhead dominates); on a real
    # corpus the input arrives multi-partition and the stages
    # parallelize naturally.
    d = table(spark, sf_dir, "documents")
    if limit:
        d = d.where(F.col("doc_id") < limit)
    words = F.split(F.col("text"), " ")
    seg = lambda a: F.array_join(F.slice(words, a, 8), " ")  # noqa: E731
    w = lambda i: F.element_at(words, i)  # noqa: E731
    # a doc with no text has no passages -> it cannot form a sample
    # (the reference pipeline requires ctxs; reference:
    # code/prompt.py:32-39 indexes sample[ra_type] unconditionally)
    d = d.where(F.col("text").isNotNull())
    return d.select(
        F.col("doc_id").alias("id"),
        F.concat(
            F.lit("What is mentioned in document "),
            F.col("doc_id").cast("string"),
            F.lit("?"),
        ).alias("question"),
        F.array(
            F.concat_ws(" ", w(1), w(2)),
            F.concat(w(5), F.lit(" or "), w(6)),
        ).alias("reference"),
        F.array(seg(1), seg(9), seg(17)).alias("ctxs"),
    )


_PIPELINE_CACHE: dict = {}


def _mock_pipeline_run(spark, sf_dir):
    """q41 and q42 consume the SAME deterministic pipeline run (mock
    backend, 1 iteration, probability fusion). The result DataFrame
    ends in a localCheckpoint, so memoizing it per (gateway, sf_dir)
    means the 5 LLM stages execute once per session instead of once
    per query — the output is deterministic either way."""
    # Keyed on the SparkContext INSTANCE (not the py4j gateway): the
    # cached DataFrame holds localCheckpoint blocks owned by the
    # context, and PySpark reuses the gateway/JVM across
    # stop()/rebuild — a context-lifetime object needs a
    # context-identity key.
    sc = spark.sparkContext
    cached = _PIPELINE_CACHE.get(sf_dir)
    if cached is None or cached[0] is not sc:
        samples = samples_from_documents(spark, sf_dir)
        out = D.run_pipeline(samples, backend="mock", num_iteration=1,
                             fusion_strategy="probability")
        cached = (sc, out)
        _PIPELINE_CACHE[sf_dir] = cached
    return cached[1]


@register("q41_rag_pipeline_mock", sql=RO.sql_pipeline_output(),
          tags=("rag", "pipeline", "mock"))
def q41_rag_pipeline_mock(spark, sf_dir):
    """Full pipeline (rag → counterfactual ×2 → probability fusion →
    override) with the deterministic mock backend; flattened output."""
    out = _mock_pipeline_run(spark, sf_dir)
    return out.select(
        "id",
        F.col("rag.reject").alias("rag_reject"),
        F.col("rag.answer").alias("rag_answer"),
        F.col("rag.evidence").alias("rag_evidence"),
        F.col("cf_use.pred_decision").alias("cf_use_decision"),
        F.col("cf_quality.pred_decision").alias("cf_quality_decision"),
        "label_decision",
        "pred_decision",
    )


@register("q42_pipeline_eval", sql=RO.sql_pipeline_eval(),
          tags=("rag", "pipeline", "mock"))
def q42_pipeline_eval(spark, sf_dir):
    """End-to-end eval record (A2 over the mock pipeline run) —
    reference entry point 3 (run_llm_ours.py:275-306). Reuses q41's
    memoized pipeline run (same parameters, deterministic)."""
    out = _mock_pipeline_run(spark, sf_dir)
    return D.risk_metrics(D.confusion_cells(out))
