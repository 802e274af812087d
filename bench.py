"""Headline benchmark. Prints ONE JSON line:
{"metric": "total_sec", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores).

Each query is forced through a noop sink so the full plan executes
(collect() would add driver-transfer cost that isn't the engine's)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "q01_pricing_summary",
    "q02_revenue_forecast",
    "q07_customer_geography",
    "q08_regional_revenue",
    "q15_top_orders_per_customer",
    "q16_running_spend",
    "q24_json_extract",
    # text / parsing
    "q31_token_stats",
    "q34_parse_predictions",
    "q39_doc_fingerprint",
    # dedup / similarity
    "q61_word_jaccard_neighbors",
    "q64_knn_bruteforce",
    # event-time windows
    "q50_tumbling_hourly",
    "q52_session_windows",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from rc_rag_spark.session import build_session
    import rc_rag_spark.queries as q

    # Size shuffle parallelism to the data: sf0.1 shuffles are a few MB,
    # where 32 reduce tasks are pure scheduling overhead. At cluster
    # scale this knob is per-job (AQE coalesces downward, not upward).
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    spark = build_session(
        app_name="rc-rag-spark-bench",
        extra_conf={"spark.sql.shuffle.partitions": shuffle_parts},
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in q.REGISTRY]
    extra = os.environ.get("RC_RAG_BENCH_QUERIES")
    if extra:
        names = [n for n in (s.strip() for s in extra.split(",")) if n in q.REGISTRY]
    if not names:
        print(json.dumps({"error": "no matching queries", "metric": "total_sec",
                          "value": -1.0, "unit": "sec", "queries": {}, "sf": sf}))
        return

    timings: dict[str, float] = {}
    # warm up the JVM + parquet footer caches on the smallest query
    q.REGISTRY[names[0]].fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    for name in names:
        t0 = time.perf_counter()
        df = q.REGISTRY[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
