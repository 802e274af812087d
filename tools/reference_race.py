"""Reference-vs-engine throughput race on identical inputs.

The reference (`/root/reference/code/run_llm_ours.py:227`) processes
samples in a single-threaded Python row loop; the engine runs the same
semantics as 5 Arrow-batched distributed LLM stages. The repo already
carries a faithful pure-Python reimplementation of the reference's
per-sample control flow (tests/test_pipeline.golden_pipeline — the
row-for-row golden the engine is verified against), so the fairest
possible single-node comparison is: SAME machine, SAME deterministic
in-process mock backend (no network, so this isolates data-processing
throughput — with a real LLM endpoint both sides add identical API
latency per call, but the engine overlaps calls across all cores while
the reference's loop serializes them), SAME samples.

    python tools/reference_race.py [n_samples]

Appends a results section to SCALING.md.
"""

from __future__ import annotations

import datetime
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"  # 5,000 documents; replicated beyond


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000

    from pyspark.sql import functions as F

    from rc_rag_spark.pipeline import decisions as D
    from rc_rag_spark.queries.rag import samples_from_documents
    from rc_rag_spark.session import build_session
    from tests.test_pipeline import golden_pipeline

    spark = build_session(app_name="rc-rag-reference-race")
    spark.sparkContext.setLogLevel("ERROR")

    base = samples_from_documents(spark, SF_DIR)
    n_base = base.count()
    factor = max(1, (n + n_base - 1) // n_base)
    if factor > 1:
        reps = spark.range(factor).select(F.col("id").alias("_rep"))
        base = base.crossJoin(F.broadcast(reps)).select(
            (F.col("id") + F.col("_rep") * 10_000_000).alias("id"),
            "question", "reference", "ctxs",
        )
    samples = base.where(F.col("id") % 10_000_000 < n // factor)
    # multi-partition input: the engine parallelizes LLM stages across
    # cores exactly as a real corpus (which never arrives as one file)
    samples = samples.repartition(32).localCheckpoint(eager=True)
    n_rows = samples.count()

    # --- engine: 5 distributed mock-LLM stages -------------------------
    # warmup (JIT/codegen), then measure
    D.run_pipeline(samples, backend="mock", num_iteration=1,
                   fusion_strategy="probability").write.format(
        "noop").mode("overwrite").save()
    t0 = time.perf_counter()
    D.run_pipeline(samples, backend="mock", num_iteration=1,
                   fusion_strategy="probability").write.format(
        "noop").mode("overwrite").save()
    t_engine = time.perf_counter() - t0

    # --- reference shape: single-threaded Python row loop --------------
    rows = [r.asDict() for r in samples.collect()]
    t0 = time.perf_counter()
    for sample in rows:
        golden_pipeline(sample)
    t_ref = time.perf_counter() - t0

    r_engine = n_rows / t_engine
    r_ref = n_rows / t_ref
    stamp = f"{datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M}"
    lines = [
        "",
        f"## Reference race — {n_rows:,} samples, mock backend — {stamp} UTC",
        "",
        "Same machine, same samples, same deterministic in-process mock",
        "LLM (no network): the engine's 5 Arrow-batched distributed",
        "stages vs the reference's single-threaded per-sample loop",
        "(tests/test_pipeline.golden_pipeline — the row-for-row golden",
        "the engine is verified against).",
        "",
        "| pipeline | wall | samples/s |",
        "|---|---|---|",
        f"| engine (Spark, local[{spark.sparkContext.defaultParallelism}], warm) | {t_engine:.1f} s "
        f"| {r_engine:,.0f} |",
        f"| reference-style Python row loop | {t_ref:.1f} s "
        f"| {r_ref:,.0f} |",
        "",
        f"**Engine/reference throughput ratio: {r_engine / r_ref:.1f}×.**",
        "With a real LLM endpoint the gap widens: the loop issues one",
        "request at a time while the batched UDF keeps every core's",
        "client issuing concurrently.",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
