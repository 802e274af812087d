"""Beyond-fixture stress for the round-9 governance/selection family.

The fixtures stop at sf0.1 (5,000 docs / 600k lineitem). This tool
builds 10x inputs — 50,000 documents (deterministically mutated
replicas, same recipe as stress_docs.py) and a 6M-row lineitem
(replicated with shifted order keys so per-order fan-out is
preserved, never multiplied) — then times the operators whose scale
behavior is the round-9 story:

  - q261 snapshot diff            (full-outer key join)
  - q262 Gopher quality rules     (single-scan rule audit)
  - q264 DSIR selection           (bigram explode + 1024-bucket stats)
  - q265 image dHash near-dup     (decode + banded Hamming join)
  - q263 Bradley-Terry            (order-level pair mining at 6M rows
                                   -> ~21M comparisons, then MM)

    python tools/stress_round9.py [factor]

Appends a results section to SCALING.md.
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.1"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from rc_rag_spark.queries import REGISTRY
    from rc_rag_spark.session import build_session

    spark = build_session(
        app_name="rc-rag-stress-round9",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="stress_r9_")
    reps = spark.range(factor).select(F.col("id").alias("_rep"))

    # --- 10x documents (mutated replicas, near-dup structure kept)
    base_docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    docs = (
        base_docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("_rep") * 1_000_000).alias("doc_id"),
            F.when(F.col("_rep") == 0, F.col("text"))
            .otherwise(
                F.concat(
                    F.lit("rep"), F.col("_rep").cast("string"),
                    F.lit(" "), F.col("text"),
                )
            )
            .alias("text"),
            "lang", "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    # 32 output files: a single-file 10x corpus would serialize the
    # scan into one task and measure file-layout skew, not the plan
    docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(workdir, "documents.parquet")
    )

    # --- 10x lineitem: shift order keys per replica so orders stay
    # the same SIZE (pair fan-out per order is preserved; total pairs
    # scale linearly with rows, the honest 10x for q263)
    base_li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    li = base_li.crossJoin(F.broadcast(reps)).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("_rep") * 100_000_000
    ).drop("_rep")
    li.repartition(32).write.mode("overwrite").parquet(
        os.path.join(workdir, "lineitem.parquet")
    )

    # q263 also reads supplier + nation — link them unchanged
    for t in ("supplier", "nation"):
        spark.read.parquet(os.path.join(SF, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(workdir, f"{t}.parquet"))

    n_docs = spark.read.parquet(
        os.path.join(workdir, "documents.parquet")
    ).count()
    n_li = spark.read.parquet(
        os.path.join(workdir, "lineitem.parquet")
    ).count()

    results = []

    def timed(name):
        fn = REGISTRY[name].fn
        fn(spark, workdir).count()  # warm (JIT, page cache)
        t0 = time.perf_counter()
        n = fn(spark, workdir).count()
        dt = time.perf_counter() - t0
        # baseline at sf0.1 for the growth column
        fn(spark, SF).count()
        t0 = time.perf_counter()
        fn(spark, SF).count()
        dt_base = time.perf_counter() - t0
        results.append((name, dt_base, dt, n))
        print(
            f"{name}: sf0.1 {dt_base:.2f} s -> {factor}x {dt:.2f} s "
            f"({dt / max(dt_base, 1e-9):.2f}x, {n} rows)",
            file=sys.stderr,
        )

    for name in (
        "q261_snapshot_diff",
        "q262_gopher_quality_rules",
        "q264_dsir_selection",
        "q265_image_dhash_neardup",
        "q263_bradley_terry",
    ):
        timed(name)

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M UTC"
    )
    lines = [
        "",
        f"## Round-9 governance family at {factor}x (tools/stress_round9.py)",
        "",
        f"Generated {stamp}: documents x{factor} = {n_docs:,} rows "
        f"(mutated replicas), lineitem x{factor} = {n_li:,} rows "
        "(orders replicated with shifted keys — per-order fan-out "
        "preserved, so q263's pair volume grows linearly, the honest "
        "scale-up). Warm wall time, local[32]:",
        "",
        "| query | sf0.1 | " + f"{factor}x | growth |",
        "|---|---|---|---|",
    ]
    for name, dt_base, dt, _ in results:
        lines.append(
            f"| {name} | {dt_base:.2f} s | {dt:.2f} s | "
            f"{dt / max(dt_base, 1e-9):.2f}x |"
        )
    with open(os.path.join(REPO, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
