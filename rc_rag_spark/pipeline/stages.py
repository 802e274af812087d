"""Staged-pipeline persistence (reference C1: do_annotate /
do_inference / re_fusion flags + save/reload,
code/run_llm_ours.py:53-55,67,217-275).

The reference re-runs stages by reloading JSONL files and indexing by
position. Here every stage writes a Parquet stage table; re-running a
downstream stage reads the persisted upstream — incremental
recomputation with explicit lineage barriers. At scale, stage tables
are partitioned sinks (partitionBy on a stable key-hash bucket).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from rc_rag_spark.pipeline import decisions as D

ANNOTATED = "annotated"
DECISIONS = "decisions"
EVAL = "eval"


class StagedPipeline:
    """Filesystem-backed staged run: each stage materializes under
    <workdir>/<stage>/ and is reused when present (the reference's
    do_* flags become cache-presence checks + `force`)."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir

    def _path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def has(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def _save(self, df: DataFrame, stage: str) -> DataFrame:
        df.write.mode("overwrite").parquet(self._path(stage))
        return self.load(stage)

    def annotate(self, samples: DataFrame, backend: str = "mock",
                 num_passage: int = 3, force: bool = False,
                 **backend_kw) -> DataFrame:
        """Stage 1 (rag + label). Reused unless force — the reference's
        do_annotate=False path (run_llm_ours.py:217-218,236-238)."""
        if self.has(ANNOTATED) and not force:
            return self.load(ANNOTATED)
        df = D.rag_annotate(samples, backend, num_passage, **backend_kw)
        return self._save(df, ANNOTATED)

    def _params_path(self) -> str:
        return os.path.join(self.workdir, "pipeline_params.json")

    def _check_params(self, params: dict, force: bool) -> None:
        """A cached decisions stage is only valid for the parameters it
        was computed with — on mismatch, demand force rather than
        silently serving stale-strategy results."""
        import json

        os.makedirs(self.workdir, exist_ok=True)
        if os.path.exists(self._params_path()):
            with open(self._params_path()) as f:
                prior = json.load(f)
            if prior != params and self.has(DECISIONS) and not force:
                raise ValueError(
                    f"decisions stage in {self.workdir} was computed with "
                    f"{prior}, requested {params}; pass force=True to "
                    "recompute"
                )
        with open(self._params_path(), "w") as f:
            json.dump(params, f)

    def infer(self, samples: DataFrame, backend: str = "mock",
              num_iteration: int = 1, fusion_strategy: str = "probability",
              num_passage: int = 3, force: bool = False,
              **backend_kw) -> DataFrame:
        """Stages 2+3 on top of (possibly cached) annotation.
        ``backend_kw`` reaches ONLY the LLM backend factory — pipeline
        knobs are explicit parameters, never forwarded."""
        self._check_params(
            {
                "backend": backend,
                "num_iteration": num_iteration,
                "fusion_strategy": fusion_strategy,
                "num_passage": num_passage,
            },
            force,
        )
        if self.has(DECISIONS) and not force:
            return self.load(DECISIONS)
        df = self.annotate(samples, backend, num_passage=num_passage,
                           force=force, **backend_kw)
        df = D.counterfactual_branch(df, "cf_use", backend, num_iteration, **backend_kw)
        df = D.counterfactual_branch(df, "cf_quality", backend, num_iteration, **backend_kw)
        df = D.fuse(df, fusion_strategy, backend, **backend_kw)
        out = df.select(
            "id", "rag", "cf_use", "cf_quality", "label_decision",
            "pred_decision",
        )
        return self._save(out, DECISIONS)

    def refuse_only_refusion(self, strategy: str, backend: str = "mock",
                             **kw) -> DataFrame:
        """The reference's re_fusion entry point: recompute ONLY the
        fusion decision from the saved decisions stage
        (run_llm_ours.py:253-273). Safety strategy needs no LLM calls;
        prompt/probability would need the saved conversations — out of
        scope for the persisted schema, so only 'safety' is supported
        here (the full-run path covers the others)."""
        if strategy != "safety":
            raise ValueError("re-fusion from stage tables supports 'safety'")
        from pyspark.sql import functions as F

        df = self.load(DECISIONS)
        use_dec = F.col("cf_use.pred_decision")
        q_dec = F.col("cf_quality.pred_decision")
        fused = (
            F.when(use_dec == q_dec, use_dec)
            .when((use_dec == "discard") | (q_dec == "discard"), "discard")
            .otherwise("keep")
        )
        fused = F.when(
            (fused == "keep") & F.col("rag.reject"), "discard"
        ).otherwise(fused)
        return df.withColumn("pred_decision", fused)

    def evaluate(self, force: bool = False) -> DataFrame:
        if self.has(EVAL) and not force:
            return self.load(EVAL)
        cells = D.confusion_cells(self.load(DECISIONS))
        return self._save(D.risk_metrics(cells), EVAL)
