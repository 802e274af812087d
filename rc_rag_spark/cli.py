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

Two additional subcommands expose the north-star surface:

    python -m rc_rag_spark.cli query q01_pricing_summary \
        --sf-dir /root/testdata/sf0.01 [--out /tmp/q01.parquet]
    python -m rc_rag_spark.cli curate --docs docs.parquet \
        --workdir /tmp/cur1 [--benchmark bench.parquet] \
        [--min-quality 0.3] [--jaccard 0.5]
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


def _query_main(argv) -> None:
    ap = argparse.ArgumentParser(prog="rc_rag_spark.cli query")
    ap.add_argument("name", help="registered query name (see queries())")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", help="parquet output path (default: show)")
    ap.add_argument("--show", type=int, default=20)
    args = ap.parse_args(argv)

    import rc_rag_spark.queries as q
    from rc_rag_spark.session import build_session

    if args.name not in q.REGISTRY:
        raise SystemExit(
            f"unknown query {args.name!r}; {len(q.REGISTRY)} available — "
            "e.g. " + ", ".join(sorted(q.REGISTRY)[:5]) + ", …"
        )
    spark = build_session(app_name=f"rc-rag-query-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = q.REGISTRY[args.name].fn(spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"query": args.name, "out": args.out,
                          "rows": spark.read.parquet(args.out).count()}))
    else:
        df.show(args.show, truncate=False)


def _curate_main(argv) -> None:
    ap = argparse.ArgumentParser(prog="rc_rag_spark.cli curate")
    ap.add_argument("--docs", required=True,
                    help="parquet with (doc_id, text, ...)")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--benchmark", help="parquet eval set to decontaminate "
                                        "against")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--out", help="final curated parquet (default: "
                                  "<workdir>/curated)")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args(argv)

    from rc_rag_spark.pipeline.curation import CurationPipeline
    from rc_rag_spark.session import build_session

    spark = build_session(app_name="rc-rag-curate")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.docs)
    pipe = (
        CurationPipeline(spark, args.workdir)
        .exact_dedup()
        .near_dedup(jaccard_threshold=args.jaccard)
        .quality_filter(min_score=args.min_quality)
    )
    if args.benchmark:
        pipe.decontaminate(spark.read.parquet(args.benchmark))
    curated = pipe.run(docs, force=args.force)
    out = args.out or os.path.join(args.workdir, "curated")
    curated.write.mode("overwrite").parquet(out)
    print(json.dumps({
        "out": out,
        "report": [
            {"stage": n, "rows_in": i, "rows_out": o, "dropped": d}
            for n, i, o, d in pipe.report()
        ],
    }))


def main(argv=None) -> None:
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "query":
        return _query_main(argv[1:])
    if argv and argv[0] == "curate":
        return _curate_main(argv[1:])
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
