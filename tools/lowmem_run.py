"""Memory-pressure evidence (VERDICT r12 item 4): the 128 GiB sandbox
hides spill behavior, so this runner executes the bench anchors plus
the broadcast-budget operators (q212/q217) at sf0.1 in a session with
a DELIBERATELY SMALL heap (default --driver-memory 2g — in local mode
the driver hosts every executor thread, so 2g bounds the whole
engine) and DEFAULT shuffle parallelism (200 — none of the bench's
small-data tuning), and records completion + per-stage spill metrics
from the app status store.

    python tools/lowmem_run.py [--driver-memory 2g] [--sf-dir ...]

Prints ONE JSON line:
    {"driver_memory": "2g", "queries": {name: {"sec": s, "rows": n}},
     "spill": {"memory_bytes_spilled": n, "disk_bytes_spilled": n},
     "failed": {name: "error"}}

Success criterion is NOT speed (a 2g heap at sf0.1 SHOULD spill and
slow down) — it is completion: every anchor finishes, nothing OOMs,
and the collect()-budget guards never trip because nothing in the
anchor set materializes corpus-sized data on the driver.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    # the 10 bench anchors
    "q212_semdedup_scaled",
    "q214_ivf_pq_adc",
    "q172_bpe_merges",
    "q168_retrieval_gd_training",
    "q102_dedup_clusters",
    "q222_cdc_chunking",
    "q263_bradley_terry",
    "q275_bpe_encode_tokens",
    "q284_crawl_curation_funnel",
    "q287_skewed_domain_quota",
    # the broadcast-budget operator not already in the anchor set
    "q217_semdedup_hierarchical",
]


def spill_totals(spark):
    """Sum memory/disk spill and peak execution memory across all
    stages via the public status REST API (the session enables the UI
    for exactly this)."""
    try:
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages", timeout=30
        ) as r:
            stages = json.load(r)
        return {
            "n_stages": len(stages),
            "memory_bytes_spilled": sum(
                s.get("memoryBytesSpilled", 0) for s in stages
            ),
            "disk_bytes_spilled": sum(
                s.get("diskBytesSpilled", 0) for s in stages
            ),
            "peak_execution_memory": max(
                (s.get("peakExecutionMemory", 0) for s in stages),
                default=0,
            ),
        }
    except Exception as exc:  # noqa: BLE001
        return {"error": str(exc)[:120]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--driver-memory", default="2g", dest="mem")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from rc_rag_spark.session import build_session
    import rc_rag_spark.queries as q

    spark = build_session(
        app_name="rc-rag-lowmem",
        extra_conf={
            "spark.driver.memory": args.mem,
            # Spark's own default parallelism, not the bench's
            # small-data tuning — more partitions, smaller each,
            # which is also the honest spill-avoidance story
            "spark.sql.shuffle.partitions": "200",
            # the status REST API is how spill metrics are read
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # spark.driver.memory only binds if THIS call launched the JVM; a
    # warm process reusing an existing gateway would silently collect
    # "2g evidence" against the full default heap (ADVICE r13). Verify
    # the actual JVM heap and fail loudly on mismatch. -Xmx2g maps to
    # Runtime.maxMemory() slightly under 2 GiB (survivor-space
    # accounting), so accept [0.5x, 1.25x] of the requested bound.
    unit = args.mem[-1].lower()
    req_bytes = int(args.mem[:-1]) * {
        "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4
    }[unit]
    jvm_max = spark._jvm.java.lang.Runtime.getRuntime().maxMemory()
    if not (0.5 * req_bytes <= jvm_max <= 1.25 * req_bytes):
        print(json.dumps({
            "error": "driver-memory bound NOT in effect",
            "requested": args.mem,
            "jvm_max_bytes": jvm_max,
            "hint": "an existing gateway/SparkSession was reused; run "
                    "in a fresh process so --driver-memory binds",
        }))
        sys.exit(2)

    timings, failed = {}, {}
    for name in QUERIES:
        t0 = time.time()
        try:
            rows = len(q.REGISTRY[name].fn(spark, args.sf_dir).collect())
            timings[name] = {
                "sec": round(time.time() - t0, 2), "rows": rows
            }
        except Exception as exc:  # noqa: BLE001
            failed[name] = " ".join(str(exc).split())[:200]
    print(json.dumps({
        "driver_memory": args.mem,
        "sf_dir": args.sf_dir,
        "queries": timings,
        "spill": spill_totals(spark),
        "failed": failed,
    }))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
