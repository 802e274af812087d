"""Price the reliable-checkpoint knob (round 15, VERDICT r14 item 5).

``spark.rc_rag.checkpoint.reliable=true`` is the mandatory posture
for unplanned executor loss at 100 TB (checkpoints.py) — parity- and
kill-proven in round 14, but never BENCHED. This tool measures the
overhead per bench anchor by running default (localCheckpoint) and
reliable (disk checkpoint dir) back-to-back in the SAME window,
alternating A/B/A/B so the host's ±30% cross-hour drift cancels out
of the ratio (the knob is runtime-readable, so one session serves
both arms). Anchors that never checkpoint should price at ~1.0x; the
iterative ones (q102's label propagation, q172's BPE loop, q168's
gradient loop) pay the disk write per iteration.

Appends the A/B table to SCALE.md.

    python tools/checkpoint_ab.py [--sf-dir DIR] [--reps 3]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else ANCHORS

    import rc_rag_spark.queries as q
    from rc_rag_spark.session import build_session

    ckpt_dir = tempfile.mkdtemp(prefix="rc_rag_ab_ckpt_")
    spark = build_session(
        app_name="rc-rag-checkpoint-ab",
        extra_conf={"spark.rc_rag.checkpoint.dir": ckpt_dir},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(name: str, reliable: bool) -> float:
        spark.conf.set(
            "spark.rc_rag.checkpoint.reliable",
            "true" if reliable else "false",
        )
        t0 = time.perf_counter()
        q.REGISTRY[name].fn(spark, args.sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    rows = []
    for name in names:
        # warm both arms once, then alternate: A B A B ... taking mins
        run_once(name, False)
        run_once(name, True)
        a = min(run_once(name, False) for _ in range(args.reps))
        b = min(run_once(name, True) for _ in range(args.reps))
        ratio = b / a if a > 0 else float("nan")
        rows.append((name, a, b, ratio))
        print(f"{name}: default {a:.3f}s reliable {b:.3f}s "
              f"(x{ratio:.2f})", flush=True)

    stamp = f"{datetime.datetime.now(datetime.timezone.utc):%Y-%m-%d %H:%M} UTC"
    lines = [
        "",
        f"## Reliable-checkpoint knob A/B — {stamp}",
        "",
        "`tools/checkpoint_ab.py`: same-window alternating A/B, warm",
        f"best-of-{args.reps}, noop sink, local[32], "
        f"{args.sf_dir}. 'reliable'",
        "checkpoints every lineage-truncation site to a disk dir",
        "(the executor-loss-survivable posture, checkpoints.py);",
        "'default' is localCheckpoint. Anchors without checkpoint",
        "sites price at ~1.0x (window noise); the iterative anchors",
        "pay the per-iteration durable write.",
        "",
        "| query | default | reliable | overhead |",
        "|---|---|---|---|",
    ]
    for name, a, b, r in rows:
        lines.append(f"| {name} | {a:.3f} s | {b:.3f} s | {r:.2f}× |")
    worst = max(rows, key=lambda t: t[3])
    lines += [
        "",
        f"Worst overhead: {worst[0]} at {worst[3]:.2f}×.",
        "",
    ]
    with open(os.path.join(REPO, "SCALE.md"), "a") as f:
        f.write("\n".join(lines))
    print(json.dumps({n: {"default": round(a, 3), "reliable": round(b, 3)}
                      for n, a, b, _ in rows}))
    print("appended A/B section to SCALE.md", flush=True)


if __name__ == "__main__":
    main()
