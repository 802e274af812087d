"""Concurrent-query and multi-session correctness proof (round 15,
VERDICT r14 item 4).

Everything before this round ran queries ONE AT A TIME. Real
deployments multiplex: N queries share one SparkSession from
different threads (with FAIR scheduler pools so a long scan doesn't
starve short queries), and several SparkSessions share one JVM
(separate SQL conf / temp-view namespaces over one SparkContext).
The round-14 pyds active-session pinning bug and the r13 soak-cleanup
cross-talk bug both lived exactly in this class, so it gets a
dedicated harness:

phase serial    hash every anchor alone — the reference answers.
phase fair      the 11 bench anchors run SIMULTANEOUSLY from 11
                threads of ONE session built with
                spark.scheduler.mode=FAIR, each thread in its own
                pool (spark.scheduler.pool is a thread-local property
                under PYSPARK_PIN_THREAD, the Spark 3.2+ default).
                Every hash must equal its serial twin.
phase sessions  two spark.newSession() children of the same context
                interleave on separate threads: one drives the
                Python-DataSource 2PC writer query (q230) then batch
                transformWithState (q281), the other a LIVE stateful
                stream (applyInPandasWithState through a checkpoint +
                foreachBatch) plus two anchors — the DS API + TWS +
                stream trio the round-14 bugs implicate. Hashes must
                equal serial; the stream must equal its batch twin.

    python tools/concurrent_run.py [--sf-dir DIR] [--out JSON]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
SESSION_ANCHORS = ["q222_cdc_chunking", "q263_bradley_terry"]


def _run_threads(workers: list) -> list:
    """Run callables on daemon threads; re-raise the first error."""
    errs: list = []
    ths = []

    def wrap(fn):
        def inner():
            try:
                fn()
            except BaseException as exc:  # noqa: BLE001
                errs.append(exc)

        return inner

    for fn in workers:
        th = threading.Thread(target=wrap(fn), daemon=True)
        th.start()
        ths.append(th)
    for th in ths:
        th.join()
    if errs:
        raise errs[0]
    return errs


def phase_fair(spark, sf_dir: str, names: list[str]) -> dict[str, str]:
    import rc_rag_spark.queries as q
    from fault_run import result_hash

    hashes: dict[str, str] = {}
    lock = threading.Lock()

    def worker(name: str, pool: str):
        def run():
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", pool
            )
            h = result_hash(q.REGISTRY[name].fn(spark, sf_dir))
            with lock:
                hashes[name] = h

        return run

    _run_threads(
        [worker(n, f"pool{i}") for i, n in enumerate(names)]
    )
    return hashes


def _stream_in_session(sess, sf_dir: str) -> str:
    """The cluster_run stateful-stream special, runnable on a child
    session: 5 micro-batches through applyInPandasWithState with a
    checkpoint + foreachBatch sink; returns 'hash;twin_match=...'."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql.functions import col

    from fault_run import result_hash
    from rc_rag_spark.sources import table
    from rc_rag_spark.streaming import windows as W

    events_dir = tempfile.mkdtemp(prefix="rc_rag_conc_ev_")
    ckpt = tempfile.mkdtemp(prefix="rc_rag_conc_ck_")
    out_dir = tempfile.mkdtemp(prefix="rc_rag_conc_out_")
    try:
        ev = table(sess, sf_dir, "events").select(
            "event_id", "user_id", "ts", "value"
        ).localCheckpoint(eager=True)
        for i in range(5):
            ev.where(col("event_id") % 5 == i).coalesce(1).write.mode(
                "append"
            ).parquet(events_dir)
        sch = sess.read.parquet(events_dir).schema
        stream = W.stateful_user_totals(
            sess.readStream.schema(sch)
            .option("maxFilesPerTrigger", "1")
            .parquet(events_dir)
        )

        def sink(df, batch_id):
            df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"b{batch_id:05d}")
            )

        sq = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(300)
        sq.stop()
        rows = []
        for d in sorted(glob.glob(os.path.join(out_dir, "b*"))):
            rows.extend(sess.read.parquet(d).collect())
        latest = {}
        for r in rows:
            prev = latest.get(r["user_id"])
            if prev is None or r["n_events"] > prev[0]:
                latest[r["user_id"]] = (r["n_events"], r["sum_value"])
        got = sess.createDataFrame(
            [(k, v[0], v[1]) for k, v in latest.items()],
            "user_id bigint, n_events bigint, sum_value double",
        )
        twin = W.stateful_user_totals(sess.read.parquet(events_dir))
        h_got, h_twin = result_hash(got), result_hash(twin)
        return f"{h_got};twin_match={h_got == h_twin}"
    finally:
        shutil.rmtree(events_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


def phase_sessions(spark, sf_dir: str) -> dict[str, str]:
    import rc_rag_spark.queries as q
    from fault_run import result_hash

    s1, s2 = spark.newSession(), spark.newSession()
    out: dict[str, str] = {}
    lock = threading.Lock()

    def put(k: str, v: str) -> None:
        with lock:
            out[k] = v

    def side_a():
        put(
            "s1:q230_python_datasource_writer",
            result_hash(
                q.REGISTRY["q230_python_datasource_writer"].fn(s1, sf_dir)
            ),
        )
        put(
            "s1:q281_transform_with_state_batch",
            result_hash(
                q.REGISTRY["q281_transform_with_state_batch"].fn(s1, sf_dir)
            ),
        )

    def side_b():
        put("s2:stream", _stream_in_session(s2, sf_dir))
        for name in SESSION_ANCHORS:
            put(f"s2:{name}", result_hash(q.REGISTRY[name].fn(s2, sf_dir)))

    _run_threads([side_a, side_b])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/concurrent.json")
    args = ap.parse_args()

    import rc_rag_spark.queries as q
    from fault_run import result_hash
    from rc_rag_spark.session import build_session

    spark = build_session(
        app_name="rc-rag-concurrent",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {"sf_dir": args.sf_dir}

    t0 = time.perf_counter()
    serial = {
        n: result_hash(q.REGISTRY[n].fn(spark, args.sf_dir))
        for n in ANCHORS
    }
    serial["q230_python_datasource_writer"] = result_hash(
        q.REGISTRY["q230_python_datasource_writer"].fn(spark, args.sf_dir)
    )
    serial["q281_transform_with_state_batch"] = result_hash(
        q.REGISTRY["q281_transform_with_state_batch"].fn(spark, args.sf_dir)
    )
    report["serial_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    fair = phase_fair(spark, args.sf_dir, ANCHORS)
    report["fair_sec"] = round(time.perf_counter() - t0, 2)
    fair_mism = [n for n in ANCHORS if fair.get(n) != serial[n]]
    report["fair_mismatches"] = fair_mism

    t0 = time.perf_counter()
    sess = phase_sessions(spark, args.sf_dir)
    report["sessions_sec"] = round(time.perf_counter() - t0, 2)
    sess_mism = [
        k
        for k, v in sess.items()
        if k.split(":", 1)[1] in serial
        and v != serial[k.split(":", 1)[1]]
    ]
    if "twin_match=True" not in sess.get("s2:stream", ""):
        sess_mism.append("s2:stream")
    report["session_mismatches"] = sess_mism

    ok = not fair_mism and not sess_mism
    report["match"] = ok
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
