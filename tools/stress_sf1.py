"""Fourth-decade probe: time registered queries at sf0.1 vs sf1.

SCALING.md's main table stops at sf0.1; SCALE.md pins the seven bench
anchors at sf1 (/tmp/rc_rag_sf1, built by tools/make_sf1.py). This
tool extends the 4th-decade evidence to any registered query: warm
best-of-3 wall time at sf0.1 and sf1 (10x rows), growth factor per
10x, appended as a "## " section to SCALING.md (which scale_probe.py
preserves across regeneration).

Default query set: the round-10 additions whose sf1 behavior is not
already covered by the bench anchors — BPE encode + real-token budget
(q275/q276), the URL/domain curation family (q277-q280, q282), batch
transformWithState (q281, the per-key Python-state-server path whose
overhead is per-DISTINCT-KEY, not per-row), KMV joinability (q283),
the end-to-end crawl-curation funnel (q284), and executed compaction
(q285, whose rewrite width is chosen from the file census and so
should grow file counts linearly at fixed target_bytes).

    python tools/stress_sf1.py [query ...]
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/rc_rag_sf1"

DEFAULT = [
    "q275_bpe_encode_tokens",
    "q276_token_budget_real_bpe",
    "q277_url_parse",
    "q278_registrable_domain_rollup",
    "q279_domain_blocklist_filter",
    "q280_url_canonical_dedup",
    "q281_transform_with_state_batch",
    "q282_domain_quota_sample",
    "q283_kmv_joinability",
    "q284_crawl_curation_funnel",
    "q285_compaction_roundtrip",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT

    if not os.path.exists(os.path.join(SF1, "events.parquet")):
        print("building sf1 fixture via tools/make_sf1.py ...",
              file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_sf1.py"), SF1],
            check=True,
        )

    import rc_rag_spark.queries as q
    from rc_rag_spark.session import build_session

    spark = build_session(
        app_name="rc-rag-stress-sf1",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_warm(name: str, sf_dir: str) -> float:
        spec = q.REGISTRY[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = []
    for name in names:
        if name not in q.REGISTRY:
            print(f"skip (unregistered): {name}", file=sys.stderr)
            continue
        t01 = run_warm(name, SF01)
        t1 = run_warm(name, SF1)
        g = t1 / t01 if t01 > 0 else float("nan")
        rows.append((name, t01, t1, g))
        print(f"{name}: sf0.1 {t01:.3f}s  sf1 {t1:.3f}s  (x{g:.2f})",
              file=sys.stderr)

    stamp = f"{datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M} UTC"
    lines = [
        "",
        f"## Fourth decade — sf1 (10× sf0.1, /tmp/rc_rag_sf1) — {stamp}",
        "",
        "`tools/stress_sf1.py`: warm best-of-3, noop sink, local[32],",
        "sf1 built by `tools/make_sf1.py` (key-shifted replicas, mutated",
        "text / rotated embeddings / fresh event users — see its",
        "docstring for why naive replication would distort dedup rates).",
        "",
        "| query | sf0.1 | sf1 | ×(0.1→1) |",
        "|---|---|---|---|",
    ]
    for name, t01, t1, g in rows:
        lines.append(f"| {name} | {t01:.3f} s | {t1:.3f} s | {g:.2f}× |")
    lines.append("")
    with open(os.path.join(REPO, "SCALING.md"), "a") as f:
        f.write("\n".join(lines))
    print("appended section to SCALING.md", file=sys.stderr)

    spark.stop()


if __name__ == "__main__":
    main()
