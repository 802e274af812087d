"""Measured stress evidence for the two plan-level scale claims that
fixtures never exercise (VERDICT r4 items 4 and 5):

1. SemDeDup cluster-size cap: a planted mega-cluster (most of the
   corpus in ONE k-means cell) with and without the salted split —
   wall time + the largest quadratic block each way.
2. Skew-join salting: a hot key owning 20% of a shuffle-joined fact,
   plain sort-merge join vs split_salted_join vs AQE skew handling —
   measured wall time, not a plan assertion.

    python tools/stress_skew_semdedup.py [n_vectors] [n_fact_rows]

Appends a results section to SCALING.md.
"""

from __future__ import annotations

import datetime
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    # 12k default: the UNCAPPED control materializes a (0.8n)² cosine
    # block in one task (the failure mode being demonstrated), so the
    # control run bounds the demo size — the capped path itself scales.
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000
    n_fact = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000_000

    import numpy as np
    from pyspark.sql import functions as F

    from rc_rag_spark.operators.semdedup import semdedup
    from rc_rag_spark.operators.skew import split_salted_join
    from rc_rag_spark.session import build_session

    spark = build_session(
        app_name="rc-rag-stress-skew-semdedup",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    lines: list[str] = []

    # ---------------------------------------------------- SemDeDup cap
    # 80% of vectors are IDENTICAL (the boilerplate mega-cluster case:
    # think repeated page headers embedded to the same point), 20%
    # random. Identical vectors tie on distance to every seed, and the
    # tie breaks to the lowest seed rank — the whole mega-mass lands in
    # ONE k-means cell, exactly the case the cap exists for.
    rng = np.random.RandomState(42)
    base = (rng.rand(64) + 0.5).tolist()
    n_mega = int(n_vec * 0.8)
    rows = [(i, base) for i in range(n_mega)]
    for i in range(n_mega, n_vec):
        rows.append((i, rng.randn(64).tolist()))
    vec_df = spark.createDataFrame(
        rows, "vec_id long, v array<double>"
    ).repartition(32).localCheckpoint(eager=True)

    def run_semdedup(cap: int | None, label: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        out = semdedup(
            vec_df, id_col="vec_id", vec_col="v",
            target_cluster_size=512,
            max_cluster_size=cap if cap else 10**9,
            bit_exact=False,  # production kernel; exact mode is for oracles
        )
        biggest = (
            out.groupBy("cid", "salt").count()
            .agg(F.max("count")).first()[0]
        )
        n_kept = out.where(F.col("kept") == 1).count()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f}s biggest-block={biggest} kept={n_kept}",
              file=sys.stderr)
        lines.append(
            f"| {label} | {dt:.1f} s | {biggest:,} | {n_kept:,} |"
        )
        return dt, biggest

    hdr = [
        "",
        f"## SemDeDup mega-cluster stress — {n_vec:,} vectors, 80% in one "
        f"cell — {datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M} UTC",
        "",
        "operators/semdedup.py with auto-k (target 512). 'uncapped' lets",
        "the mega-cluster hit the pair stage whole; 'cap 1024' splits it",
        "into md5-salted sub-buckets first. The bound is the point: the",
        "largest quadratic block — cap² — no longer grows with the corpus.",
        "",
        "| run | wall | largest pair block | kept |",
        "|---|---|---|---|",
    ]
    lines.extend(hdr)
    run_semdedup(None, "uncapped")
    run_semdedup(1024, "cap 1024")

    # Hierarchical variant on the same mega-cluster corpus: the
    # super-cap bounds level-2 task memory BEFORE leaf assignment, and
    # only m = ceil(n/(64*512)) super-seeds are ever broadcast.
    from rc_rag_spark.operators.semdedup import semdedup_hierarchical

    t0 = time.perf_counter()
    hout = semdedup_hierarchical(
        vec_df, id_col="vec_id", vec_col="v",
        target_cluster_size=512, max_cluster_size=1024,
        super_factor=4, max_super_size=4096,
        bit_exact=False,
    )
    hbiggest = (
        hout.groupBy("scell", "ssalt", "cid", "salt").count()
        .agg(F.max("count")).first()[0]
    )
    hkept = hout.where(F.col("kept") == 1).count()
    hdt = time.perf_counter() - t0
    print(f"hierarchical cap 1024: {hdt:.1f}s biggest-block={hbiggest} "
          f"kept={hkept}", file=sys.stderr)
    lines.append(
        f"| hierarchical (super-cap 4096, cap 1024) | {hdt:.1f} s "
        f"| {hbiggest:,} | {hkept:,} |"
    )

    # ------------------------------------------------------- skew join
    # fact: n_fact rows, key 0 owns 20%; dim: 2,000 keys. Broadcast is
    # disabled so the join must shuffle — the regime the salting claim
    # is about (at 100 TB the dim side here stands in for a mid-size
    # table past broadcast range).
    n_keys = 2_000
    fact = spark.range(n_fact).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .otherwise((F.xxhash64("id") % (n_keys - 1) + n_keys - 1)
                   % (n_keys - 1) + 1)
        .alias("k"),
        (F.col("id") % 97).alias("val"),
    ).localCheckpoint(eager=True)
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 31).alias("w")
    ).localCheckpoint(eager=True)

    def run_join(label: str, salted: bool, aqe: bool) -> float:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(aqe).lower()
        )
        t0 = time.perf_counter()
        if salted:
            j = split_salted_join(fact, dim, "k", hot_keys=[0],
                                  salt_buckets=32)
        else:
            j = fact.join(dim, "k")
        j.groupBy().agg(F.sum(F.col("val") * F.col("w"))).collect()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f}s", file=sys.stderr)
        lines.append(f"| {label} | {dt:.1f} s |")
        return dt

    lines += [
        "",
        f"## Skew-join stress — {n_fact:,}-row fact, key 0 = 20% of rows, "
        f"{n_keys:,}-key dim, broadcast disabled — "
        f"{datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M} UTC",
        "",
        "Shuffle sort-merge join + full aggregate, local[32], warm",
        "localCheckpointed inputs. 'salted' = split_salted_join",
        "(operators/skew.py): hot key fans over 32 salt buckets, cold",
        "keys take the plain join.",
        "",
        "| run | wall |",
        "|---|---|",
    ]
    t_plain = run_join("plain join, AQE off", salted=False, aqe=False)
    t_salt = run_join("salted hot key, AQE off", salted=True, aqe=False)
    t_aqe = run_join("plain join, AQE skew-join on", salted=False, aqe=True)
    t_both = run_join("salted + AQE on", salted=True, aqe=True)
    lines += [
        "",
        f"Salting speed-up over plain (AQE off): "
        f"**{t_plain / t_salt:.2f}×**; AQE-only handles it at "
        f"{t_plain / t_aqe:.2f}×; salted+AQE {t_plain / t_both:.2f}×.",
    ]

    with open(os.path.join(REPO, "SCALING.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
