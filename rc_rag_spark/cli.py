"""Reference-style entry point (mirrors code/run_llm_ours.py:190-308's
three entry points): JSONL samples in → staged pipeline → JSONL
inference + eval records out.

    python -m rc_rag_spark.cli --samples samples.jsonl \
        --workdir /tmp/run1 --fusion probability --backend mock

Entry-point mapping:
  fresh run             = do_inference + do_annotate
  rerun with --workdir  = reuses annotated/decisions stage tables
  --refusion-safety     = re_fusion (fusion-only recompute from the
                          persisted decisions stage)
"""

from __future__ import annotations

import argparse
import json
import os


SAMPLE_SCHEMA = (
    "id bigint, question string, reference array<string>, "
    "sparse_ctxs array<string>, dense_ctxs array<string>, "
    "gold_ctxs array<string>"
)

RA_COLUMNS = {  # reference ra_dict, run_llm_ours.py:13-17
    "sparse": "sparse_ctxs",
    "dense": "dense_ctxs",
    "gold": "gold_ctxs",
}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--samples", required=True, help="JSONL sample file")
    ap.add_argument("--workdir", required=True, help="stage-table directory")
    ap.add_argument("--backend", default="mock")
    ap.add_argument("--ra", default="dense", choices=sorted(RA_COLUMNS))
    ap.add_argument("--num-passage", type=int, default=3)
    ap.add_argument("--num-iteration", type=int, default=1)
    ap.add_argument(
        "--fusion", default="probability",
        choices=["safety", "prompt", "probability"],
    )
    ap.add_argument("--refusion-safety", action="store_true",
                    help="recompute only the fusion from saved decisions")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from rc_rag_spark.pipeline import decisions as D
    from rc_rag_spark.pipeline.stages import StagedPipeline
    from rc_rag_spark.session import build_session
    from rc_rag_spark.sources import read_jsonl, write_jsonl

    spark = build_session(app_name="rc-rag-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    samples = read_jsonl(spark, args.samples, schema=SAMPLE_SCHEMA)
    ctx_col = RA_COLUMNS[args.ra]
    samples = samples.select(
        "id", "question", "reference", F.col(ctx_col).alias("ctxs")
    )

    sp = StagedPipeline(spark, args.workdir)
    if args.refusion_safety:
        decisions = sp.refuse_only_refusion("safety", backend=args.backend)
    else:
        decisions = sp.infer(
            samples,
            backend=args.backend,
            num_iteration=args.num_iteration,
            fusion_strategy=args.fusion,
            num_passage=args.num_passage,
            force=args.force,
        )

    inference_path = os.path.join(args.workdir, "inference_jsonl")
    write_jsonl(decisions, inference_path, mode="overwrite")

    ev = D.risk_metrics(D.confusion_cells(decisions))
    eval_path = os.path.join(args.workdir, "eval_jsonl")
    write_jsonl(ev, eval_path, mode="overwrite")
    print(json.dumps(ev.collect()[0].asDict()))


if __name__ == "__main__":
    main()
