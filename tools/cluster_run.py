"""Multi-JVM execution proof (VERDICT r13 next-round #1).

Every byte of evidence through round 13 ran in ONE JVM (local[N]):
the driver hosted all executor threads, so task closures were never
serialized across process boundaries, shuffle blocks never crossed
Netty, broadcasts never left the process, and ONE Python worker pool
served everything. A real 1000-executor cluster does none of that.

Spark's ``local-cluster[E,C,M]`` master simulates exactly the missing
topology on one machine: E separate executor JVMs with C cores and
M MB each, launched by a real (in-process) Master/Worker pair —
serialized closures, Netty shuffle fetch, broadcast over IPC, and a
per-executor Python worker pool.

This harness runs the bench anchors + a one-per-§2.2-family parity
sample + the mock-LLM pipeline + three SPECIAL checks (Python-DS 2PC
writer, a live stateful stream, a full-wave fault-injection retry)
under BOTH masters — each in its own subprocess so no state leaks —
with parallelism knobs pinned identical, and hash-compares every
result. Divergence = a single-JVM assumption in the engine.

Usage:
    python tools/cluster_run.py [--sf-dir DIR] [--quick] [--out F]
    python tools/cluster_run.py --child --master M --names a,b --sf-dir DIR

Prints one JSON line: {"match": bool, "compared": n, "mismatches":
{...}, "errors": {...}, "masters": [...], per-master timings}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOCAL_MASTER = "local[8]"
CLUSTER_MASTER = "local-cluster[2,2,2048]"

# one query per §2.2 family not already covered by the bench anchors
FAMILY_SAMPLE = [
    "q28_slice_scan",                    # range/slice scan + pushdown
    "q09_orders_per_customer",           # keyed join
    "q05_cube",                          # multi-dim aggregation
    "q103_rule_sessionize",              # window functions
    "q19_top20_orders",                  # sort/limit/top-k
    "q20_set_ops",                       # set operations
    "q24_json_extract",                  # scalar/JSON functions
    "q31_token_stats",                   # unicode tokenizer
    "q36_prompt_render",                 # prompt templating
    "q101_error_recovery_asof_forward",  # temporal as-of join
    "q104_null_functions",               # NULL scalar surface
    "q105_trimmed_mean",                 # pandas grouped-agg UDF
    "q108_bm25_scores",                  # text analysis / BM25
    "q124_grouped_linear_fit",           # grouped-map ML
    "q126_edit_distance_pairs",          # pairwise text similarity
    "q129_audio_chunking",               # multimodal decode kernel
    "q130_lsh_recall_bound",             # ANN + recall bound
    "q132_rolling_distinct_hll",         # sketch aggregation
    "q266_bucketed_colocated_join",      # bucketed zero-exchange join
    # transformWithStateInPandas through the vendored pbshim — the
    # r13 suspect: per-executor Python workers must resolve
    # google.protobuf via executorEnv PYTHONPATH in SEPARATE JVMs
    "q281_transform_with_state_batch",
    "q41_rag_pipeline_mock",             # full mock-LLM pipeline
]

SPECIALS = [
    "special:pyds_writer",   # Python-DS 2PC writer on real executors
    "special:stream_stateful",  # live stream + checkpoint + foreachBatch
    "special:fault_wave",    # full-wave injected retry, hash vs clean
]

QUICK = [
    "q105_trimmed_mean",
    "q41_rag_pipeline_mock",
    "q132_rolling_distinct_hll",
    "q266_bucketed_colocated_join",
] + SPECIALS


def bench_anchors() -> list[str]:
    import bench

    return sorted(bench.ANCHORS)


# ------------------------------- child -------------------------------


def _special_pyds_writer(spark) -> str:
    """The Python Data Source 2PC writer with write tasks on real
    executor JVMs: per-task Arrow batches -> per-attempt uuid files ->
    commit messages over the wire -> ONE driver-side manifest
    publish. Hash = manifest row count + read-back content."""
    from rc_rag_spark.sources import pyds
    from fault_run import result_hash

    pyds.register_all(spark)
    d = tempfile.mkdtemp(prefix="rc_rag_cluster_pyds_")
    try:
        src = pyds.series_batch_df(spark, 5000).repartition(4)
        src.write.format("rc_rag_jsonldir").option("path", d).mode(
            "append"
        ).save()
        files, n_rows = pyds.manifest_files(d)
        back = spark.read.schema(pyds.ROW_SCHEMA).json(
            [os.path.join(d, f) for f in files]
        )
        return f"n={n_rows};files={len(files)};{result_hash(back)}"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _special_stream_stateful(spark, sf_dir: str) -> str:
    """A live stateful stream (applyInPandasWithState user totals) fed
    5 single-file micro-batches through a checkpoint, foreachBatch
    parquet sink; hash of the final per-user state vs the batch twin
    computed in the SAME topology (parent compares across
    topologies)."""
    from pyspark.sql.functions import col

    from rc_rag_spark.sources import table
    from rc_rag_spark.streaming import windows as W
    from fault_run import result_hash

    events_dir = tempfile.mkdtemp(prefix="rc_rag_cluster_sev_")
    ckpt = tempfile.mkdtemp(prefix="rc_rag_cluster_sck_")
    out_dir = tempfile.mkdtemp(prefix="rc_rag_cluster_sout_")
    try:
        ev = table(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "value"
        ).localCheckpoint(eager=True)
        for i in range(5):
            ev.where(col("event_id") % 5 == i).coalesce(1).write.mode(
                "append"
            ).parquet(events_dir)
        sch = spark.read.parquet(events_dir).schema
        stream = W.stateful_user_totals(
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", "1")
            .parquet(events_dir)
        )

        def sink(df, batch_id):
            df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"b{batch_id:05d}")
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
        import glob as _glob

        rows = []
        for d in sorted(_glob.glob(os.path.join(out_dir, "b*"))):
            rows.extend(spark.read.parquet(d).collect())
        latest = {}
        for r in rows:
            prev = latest.get(r["user_id"])
            if prev is None or r["n_events"] > prev[0]:
                latest[r["user_id"]] = (r["n_events"], r["sum_value"])
        got = spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in latest.items()],
            "user_id bigint, n_events bigint, sum_value double",
        )
        twin = W.stateful_user_totals(spark.read.parquet(events_dir))
        h_got, h_twin = result_hash(got), result_hash(twin)
        return f"stream={h_got};twin_match={h_got == h_twin}"
    finally:
        shutil.rmtree(events_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


def _special_fault_wave(spark, sf_dir: str) -> str:
    """Full-wave first-attempt task failure (partition=-1) against a
    Python-kernel query: under local-cluster the killed-and-retried
    attempts run in SEPARATE executor JVMs — shuffle refetch and
    closure re-deserialization included. Hash must equal the clean
    run's, and the marker must prove the wave actually fired."""
    import rc_rag_spark.queries as q
    from rc_rag_spark.faultinject import (
        inject_task_failures,
        marker_firings,
    )
    from fault_run import result_hash

    name = "q105_trimmed_mean"
    clean = result_hash(q.REGISTRY[name].fn(spark, sf_dir))
    marker = os.path.join(
        tempfile.gettempdir(), f"rc_rag_cluster_fault_{uuid.uuid4().hex}"
    )
    try:
        with inject_task_failures(spark, partition=-1, marker=marker):
            injected = result_hash(q.REGISTRY[name].fn(spark, sf_dir))
        fired = len(marker_firings(marker))
        return f"clean={clean};match={clean == injected};fired>0={fired > 0}"
    finally:
        if os.path.exists(marker):
            os.unlink(marker)


def run_child(master: str, names: list[str], sf_dir: str) -> dict:
    from rc_rag_spark.session import build_session
    import rc_rag_spark.queries as q
    from fault_run import result_hash

    extra = {
        # pin every parallelism knob so the ONLY variable between the
        # two children is the execution topology
        "spark.default.parallelism": "8",
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": "4g",
    }
    spark = build_session(
        app_name=f"rc-rag-cluster-run", master=master, extra_conf=extra
    )
    spark.sparkContext.setLogLevel("ERROR")
    results, errors = {}, {}
    for name in names:
        t0 = time.time()
        try:
            if name == "special:pyds_writer":
                h = _special_pyds_writer(spark)
            elif name == "special:stream_stateful":
                h = _special_stream_stateful(spark, sf_dir)
            elif name == "special:fault_wave":
                h = _special_fault_wave(spark, sf_dir)
            else:
                h = result_hash(q.REGISTRY[name].fn(spark, sf_dir))
            results[name] = {
                "hash": h, "sec": round(time.time() - t0, 2)
            }
        except Exception as exc:  # noqa: BLE001
            errors[name] = " ".join(str(exc).split())[:400]
        print(f"[{master}] {name} {round(time.time() - t0, 1)}s",
              file=sys.stderr, flush=True)
    spark.stop()
    return {"master": master, "results": results, "errors": errors}


# ------------------------------- parent ------------------------------


def run_parent(names: list[str], sf_dir: str, out: str | None) -> int:
    reports = {}
    for master in (LOCAL_MASTER, CLUSTER_MASTER):
        cmd = [
            sys.executable, os.path.abspath(__file__), "--child",
            "--master", master, "--names", ",".join(names),
            "--sf-dir", sf_dir,
        ]
        t0 = time.time()
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, timeout=3600
        )
        last = [
            ln for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")
        ]
        if proc.returncode != 0 or not last:
            print(json.dumps({
                "match": False,
                "error": f"child for {master} failed rc={proc.returncode}",
                "stderr_tail": proc.stderr[-2000:],
            }))
            return 2
        reports[master] = json.loads(last[-1])
        reports[master]["wall_sec"] = round(time.time() - t0, 1)

    loc, clu = reports[LOCAL_MASTER], reports[CLUSTER_MASTER]
    mismatches = {}
    compared = 0
    for name in names:
        a = loc["results"].get(name, {}).get("hash")
        b = clu["results"].get(name, {}).get("hash")
        if a is None or b is None:
            continue
        compared += 1
        if a != b:
            mismatches[name] = {"local": a, "local_cluster": b}
    errors = {
        "local": loc["errors"], "local_cluster": clu["errors"]
    }
    verdict = {
        "match": not mismatches and not loc["errors"] and not clu["errors"],
        "compared": compared,
        "mismatches": mismatches,
        "errors": errors,
        "masters": [LOCAL_MASTER, CLUSTER_MASTER],
        "sf_dir": sf_dir,
        "local_sec": {
            n: r["sec"] for n, r in loc["results"].items()
        },
        "cluster_sec": {
            n: r["sec"] for n, r in clu["results"].items()
        },
        "wall_sec": {
            "local": loc["wall_sec"], "local_cluster": clu["wall_sec"]
        },
    }
    line = json.dumps(verdict)
    print(line)
    if out:
        with open(out, "w") as fh:
            fh.write(line + "\n")
    return 0 if verdict["match"] else 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--master", default=CLUSTER_MASTER)
    ap.add_argument("--names", default="")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--quick", action="store_true",
                    help="small subset (for the gated pytest)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.child:
        names = [n for n in args.names.split(",") if n]
        print(json.dumps(run_child(args.master, names, args.sf_dir)))
        return

    if args.quick:
        names = QUICK
    else:
        names = bench_anchors() + [
            n for n in FAMILY_SAMPLE if n not in set(bench_anchors())
        ] + SPECIALS
    sys.exit(run_parent(names, args.sf_dir, args.out))


if __name__ == "__main__":
    main()
