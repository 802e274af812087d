"""Fifth/sixth-decade probe: bench anchors at sf1 / sf10 / sf100.

Round-15 headline item (VERDICT r14 #1): measured scaling previously
topped out at sf1 = 10x the bench SF while the design target is
100 TB. This probe runs the 11 bench anchors at sf10 (100x bench) and
sf100 (1000x bench) fixtures built by tools/make_sfN.py, records the
per-decade growth factor and its exponent (log10 of the factor — 1.0
means exactly linear in data volume, <1 sublinear, >1 superlinear),
and appends the table to SCALING.md.

Runaway protection: each timed run executes in its own Python thread
under a cancellable job group (PYSPARK_PIN_THREAD, the Spark 3.2+
default, makes setJobGroup thread-local-correct); a run that exceeds
--timeout is cancelled and recorded as TIMEOUT, and larger SFs for
that anchor are skipped — a quadratic regression must not wedge the
probe. --global-budget stops launching new runs once the probe has
spent its wall budget, so partial evidence still lands.

    python tools/stress_decades.py [--sfs sf1,sf10,sf100]
        [--timeout 900] [--global-budget 7200] [query ...]
"""

from __future__ import annotations

import argparse
import datetime
import json
import math
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/tmp/rc_rag_sf1",
    "sf10": "/tmp/rc_rag_sf10",
    "sf100": "/tmp/rc_rag_sf100",
}
#: replicas of sf0.1 each step represents (for exponent math)
SF_FACTOR = {"sf0.1": 1, "sf1": 10, "sf10": 100, "sf100": 1000}
#: warm repetitions per SF (first run is cold; min over all runs)
REPS = {"sf0.1": 3, "sf1": 3, "sf10": 2, "sf100": 1}
#: at sf100, add one warm rep only when the cold run was cheap —
#: re-running a 10-minute anchor to shave JIT noise is a bad trade
SF100_WARM_IF_UNDER = 120.0

ANCHORS = [
    "q102_dedup_clusters",
    "q168_retrieval_gd_training",
    "q172_bpe_merges",
    "q212_semdedup_scaled",
    "q214_ivf_pq_adc",
    "q222_cdc_chunking",
    "q263_bradley_terry",
    "q275_bpe_encode_tokens",
    "q284_crawl_curation_funnel",
    "q287_skewed_domain_quota",
    "q288_skewed_join_enrich",
    "q289_minhash_banded_pairs",
]


def timed_run(spark, fn, sf_dir: str, timeout: float):
    """One wall-clocked execution with a cancellable job group.

    Returns seconds, or None on timeout, or a 'err:...' string."""
    out: dict = {}
    group = f"decade-probe-{time.monotonic_ns()}"

    def work():
        spark.sparkContext.setJobGroup(group, "decade probe", True)
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out["t"] = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001 — recorded, not fatal
            out["err"] = f"{type(exc).__name__}: {exc}"[:300]

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        th.join(60)
        return None
    if "err" in out:
        return "err:" + out["err"]
    return out["t"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--sfs", default="sf0.1,sf1,sf10,sf100")
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--global-budget", type=float, default=7200.0)
    ap.add_argument("--json-out", default="/tmp/decades.json")
    ap.add_argument("--md", action="store_true",
                    help="append the markdown section to SCALING.md")
    args = ap.parse_args()

    sfs = [s for s in args.sfs.split(",") if s]
    for s in sfs:
        d = SF_DIRS[s]
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            sys.exit(f"fixture missing: {d} (run tools/make_sfN.py)")

    names = args.queries or ANCHORS

    import rc_rag_spark.queries as q
    from rc_rag_spark.session import build_session

    spark = build_session(app_name="rc-rag-decade-probe")
    spark.sparkContext.setLogLevel("ERROR")

    start = time.monotonic()
    results: dict[str, dict[str, object]] = {n: {} for n in names}
    # SF-major order: all anchors finish sf10 before any starts sf100,
    # so a blown budget costs the tail of the LAST decade, not random
    # holes across decades.
    for sf in sfs:
        for name in names:
            if time.monotonic() - start > args.global_budget:
                print("global budget exhausted; stopping", flush=True)
                break
            prev = results[name]
            if any(v in (None,) or isinstance(v, str)
                   for v in prev.values()):
                continue  # timed out / errored at a smaller SF
            spec = q.REGISTRY[name]
            reps = REPS[sf]
            best = None
            for i in range(reps):
                t = timed_run(spark, spec.fn, SF_DIRS[sf], args.timeout)
                if t is None or isinstance(t, str):
                    best = t
                    break
                best = t if best is None else min(best, t)
                if (
                    sf == "sf100"
                    and i == 0
                    and t > SF100_WARM_IF_UNDER
                ):
                    break
            if sf == "sf100" and isinstance(best, float) \
                    and best <= SF100_WARM_IF_UNDER and reps == 1:
                t = timed_run(spark, spec.fn, SF_DIRS[sf], args.timeout)
                if isinstance(t, float):
                    best = min(best, t)
            results[name][sf] = best
            shown = (
                f"{best:.2f}s" if isinstance(best, float)
                else ("TIMEOUT" if best is None else best)
            )
            print(f"{name} @ {sf}: {shown}", flush=True)
            with open(args.json_out, "w") as f:
                json.dump(results, f, indent=1)

    spark.stop()

    if args.md:
        stamp = (
            f"{datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M}"
            " UTC"
        )
        lines = [
            "",
            f"## Fifth and sixth decades — sf10 / sf100 — {stamp}",
            "",
            "`tools/stress_decades.py` over the 11 bench anchors;",
            "fixtures by `tools/make_sfN.py` (sf10 = 100× bench SF,",
            "sf100 = 1000×; mutated text / rotated+sign-striped",
            "embeddings / fresh event users so dedup and ANN keep",
            "realistic rates). Warm best-of-N, noop sink, local[32].",
            "exp = log10(time factor per 10× data); 1.0 = linear,",
            "<1 sublinear. TIMEOUT = cancelled at "
            f"{args.timeout:.0f}s.",
            "",
            "| query | " + " | ".join(sfs)
            + " | " + " | ".join(
                f"exp({a}→{b})" for a, b in zip(sfs, sfs[1:])
            ) + " |",
            "|---" * (2 * len(sfs)) + "|",
        ]
        for name in names:
            r = results[name]
            cells, exps = [], []
            for sf in sfs:
                v = r.get(sf)
                cells.append(
                    f"{v:.2f} s" if isinstance(v, float)
                    else ("TIMEOUT" if v is None
                          else ("—" if sf not in r else "ERR"))
                )
            for a, b in zip(sfs, sfs[1:]):
                va, vb = r.get(a), r.get(b)
                if isinstance(va, float) and isinstance(vb, float) and va > 0:
                    decades = math.log10(SF_FACTOR[b] / SF_FACTOR[a])
                    exps.append(f"{math.log10(vb / va) / decades:+.2f}")
                else:
                    exps.append("—")
            lines.append(
                "| " + name + " | " + " | ".join(cells) + " | "
                + " | ".join(exps) + " |"
            )
        lines.append("")
        with open(os.path.join(REPO, "SCALING.md"), "a") as f:
            f.write("\n".join(lines))
        print("appended section to SCALING.md", flush=True)


if __name__ == "__main__":
    main()
