"""Task-retry determinism harness (VERDICT r12 item 1).

Runs each named query twice in a session whose local master allows
task retries (``local[N, maxFailures]``): once clean, once with
rc_rag_spark.faultinject armed so the FIRST attempt of partition 0 of
every engine Python kernel raises. If Spark's retry machinery plus the
engine's RNG-free, partition-deterministic design hold, the two runs
hash identically; any duplicate, dropped, or reordered row from a
retried task flips the hash. Also supports a live-stream mode: the
applyInPandasWithState running-totals operator over a file stream with
injection armed for the whole run, compared against its batch twin.

    python tools/fault_run.py --sf-dir /root/testdata/sf0.01 \
        --queries q212_semdedup_scaled,q222_cdc_chunking
    python tools/fault_run.py --sf-dir /root/testdata/sf0.01 --streaming

Prints ONE JSON line:
    {"queries": {name: {"match": bool, "fired": int}},
     "streaming": {"match": bool, "fired": int} | null}

``fired`` counts actual injected raises (recorded by the kernel via
the marker file BEFORE raising) — a query with fired == 0 proves
nothing about retries (its plan had no Python kernel on partition 0),
which the caller must judge, not hide.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def result_hash(df) -> str:
    """Order-insensitive value hash via the same canonicalizer the
    oracle-parity harness uses (column-name sort, row sort, floats to
    9 places) — so 'identical under retry' means identical by the
    driver's own comparison rules."""
    from tests.oracle import canonicalize

    rows = canonicalize(df.toPandas())
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return f"{len(rows)}:{h.hexdigest()}"


def run_queries(spark, sf_dir: str, names: list[str], partition: int):
    import rc_rag_spark.queries as q
    from rc_rag_spark.faultinject import (
        inject_task_failures,
        marker_firings,
    )

    def drop_result_caches():
        """q41/q42 memoize the (localCheckpoint'd) pipeline result per
        sf_dir — correct for the registry, but it would make the
        injected run replay the CLEAN run's materialization and prove
        nothing. Force every run to recompute through the kernels."""
        import rc_rag_spark.queries.rag as rag

        rag._PIPELINE_CACHE.clear()

    out = {}
    for name in names:
        spec = q.REGISTRY[name]
        drop_result_caches()
        clean = result_hash(spec.fn(spark, sf_dir))
        marker = os.path.join(
            tempfile.gettempdir(), f"rc_rag_fault_{uuid.uuid4().hex}"
        )
        try:
            drop_result_caches()
            with inject_task_failures(spark, partition, marker):
                injected = result_hash(spec.fn(spark, sf_dir))
            out[name] = {
                "match": clean == injected,
                "fired": len(marker_firings(marker)),
            }
        finally:
            if os.path.exists(marker):
                os.unlink(marker)
    return out


def run_streaming(spark, sf_dir: str, partition: int):
    """Live applyInPandasWithState stream with injection armed for the
    WHOLE run (source read + every micro-batch's state update), vs the
    batch twin computed clean. Exactly-once across an injected task
    failure means the totals still agree."""
    from rc_rag_spark.faultinject import (
        inject_task_failures,
        marker_firings,
    )
    from rc_rag_spark.sources import table
    from rc_rag_spark.streaming import windows as W

    events_dir = tempfile.mkdtemp(prefix="rc_rag_fault_events_")
    marker = os.path.join(
        tempfile.gettempdir(), f"rc_rag_fault_{uuid.uuid4().hex}"
    )
    try:
        table(spark, sf_dir, "events").repartition(4).write.mode(
            "overwrite"
        ).parquet(events_dir)
        batch_df = W.stateful_user_totals(spark.read.parquet(events_dir))
        clean = result_hash(batch_df)

        schema = spark.read.parquet(events_dir).schema
        name = "mem_" + uuid.uuid4().hex[:8]
        with inject_task_failures(spark, partition, marker):
            stream = W.stateful_user_totals(
                W.read_stream_dir(spark, events_dir, schema)
            )
            q = (
                stream.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            q.stop()
        # update mode re-emits a user's row each time its total moves;
        # the FINAL emission per user is the one with the largest
        # n_events (strictly increasing per user — don't trust memory
        # sink row order)
        rows = spark.table(name).collect()
        latest = {}
        for r in rows:
            prev = latest.get(r["user_id"])
            if prev is None or r["n_events"] > prev[0]:
                latest[r["user_id"]] = (r["n_events"], r["sum_value"])
        got = spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in latest.items()],
            "user_id bigint, n_events bigint, sum_value double",
        )
        injected = result_hash(got)
        return {
            "match": clean == injected,
            "fired": len(marker_firings(marker)),
        }
    finally:
        shutil.rmtree(events_dir, ignore_errors=True)
        if os.path.exists(marker):
            os.unlink(marker)


def run_soak(spark, sf_dir: str, partition: int):
    """~20-micro-batch SOAK of the applyInPandasWithState running-
    totals operator (VERDICT r12 item 6): the events table is split
    into 20 single-file tranches streamed one file per micro-batch,
    with (a) fault injection armed for the ENTIRE run — the first
    attempt of the target partition of every state-update kernel
    raises, the retry passes — and (b) one full STOP/RESTART midway:
    the second query starts on the SAME checkpoint with a fresh
    memory sink and must resume from committed state without
    reprocessing. Exactly-once = the final per-user totals (last
    emission per user across both query incarnations) equal the batch
    twin over the full input."""
    from rc_rag_spark.faultinject import (
        inject_task_failures,
        marker_firings,
    )
    from rc_rag_spark.sources import table
    from rc_rag_spark.streaming import windows as W

    events_dir = tempfile.mkdtemp(prefix="rc_rag_soak_events_")
    ckpt = tempfile.mkdtemp(prefix="rc_rag_soak_ckpt_")
    marker = os.path.join(
        tempfile.gettempdir(), f"rc_rag_fault_{uuid.uuid4().hex}"
    )
    out_dir = None
    try:
        from pyspark.sql.functions import col

        ev = table(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "value"
        ).localCheckpoint(eager=True)

        def write_tranche(i):
            ev.where(col("event_id") % 20 == i).coalesce(1).write.mode(
                "append"
            ).parquet(events_dir)

        out_dir = tempfile.mkdtemp(prefix="rc_rag_soak_out_")

        def sink(df, batch_id):
            # overwrite per batch path: a replayed batch after the
            # restart lands on the same dir — idempotent by design
            df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"b{batch_id:05d}")
            )

        def run_phase():
            sch = spark.read.parquet(events_dir).schema
            stream = W.stateful_user_totals(
                spark.readStream.schema(sch)
                .option("maxFilesPerTrigger", "1")
                .parquet(events_dir)
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
            return len([p for p in q.recentProgress])

        for i in range(10):
            write_tranche(i)
        with inject_task_failures(spark, partition, marker):
            b1 = run_phase()
            for i in range(10, 20):
                write_tranche(i)
            b2 = run_phase()

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
        return {
            "match": result_hash(got) == result_hash(twin),
            "fired": len(marker_firings(marker)),
            "batches_phase1": b1,
            "batches_phase2": b2,
        }
    finally:
        shutil.rmtree(events_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        # delete ONLY this run's out_dir — globbing the shared
        # rc_rag_soak_out_* prefix would rip a concurrent soak run's
        # foreachBatch output out from under it (ADVICE r13)
        if out_dir is not None:
            shutil.rmtree(out_dir, ignore_errors=True)
        if os.path.exists(marker):
            os.unlink(marker)


def run_writer(spark, partition: int):
    """The Data-Source-API 2PC writer under a MID-WRITE task failure:
    the injected raise fires AFTER rows of the first Arrow batch hit
    disk, so the failed attempt strands a real partial file. Spark
    retries the task (fresh uuid name); exactly-once means the
    manifest lists only committed attempts' files, their row total
    equals the input, and the stranded orphan is present on disk but
    EXCLUDED — the two-phase-commit shield working, not luck."""
    import glob as _glob
    import json as _json

    from rc_rag_spark.faultinject import (
        inject_task_failures,
        marker_firings,
    )
    from rc_rag_spark.sources.pyds import register_all, series_batch_df

    register_all(spark)
    out_dir = tempfile.mkdtemp(prefix="rc_rag_fault_writer_")
    marker = os.path.join(
        tempfile.gettempdir(), f"rc_rag_fault_{uuid.uuid4().hex}"
    )
    try:
        df = series_batch_df(spark, 10_000).repartition(4)
        with inject_task_failures(spark, partition, marker):
            df.write.format("rc_rag_jsonldir").mode("append").option(
                "path", out_dir
            ).save()
        with open(os.path.join(out_dir, "_MANIFEST")) as f:
            manifest = _json.load(f)
        on_disk = {
            os.path.basename(p)
            for p in _glob.glob(os.path.join(out_dir, "part-*.jsonl"))
        }
        committed = set(manifest["files"])
        rows_in_committed = 0
        for fn in committed:
            with open(os.path.join(out_dir, fn)) as f:
                rows_in_committed += sum(1 for _ in f)
        return {
            "match": manifest["rows"] == 10_000
            and rows_in_committed == 10_000
            and committed <= on_disk,
            "fired": len(marker_firings(marker)),
            "orphans_on_disk": len(on_disk - committed),
        }
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        if os.path.exists(marker):
            os.unlink(marker)


def run_pyworker_kill(spark, sf_dir: str, name: str) -> dict:
    """Kill the PYTHON WORKER DAEMONS mid-kernel (SIGKILL to every
    pyspark.daemon process) — the fourth failure granularity after
    injected raises, executor death, and decommission: the JVM loses
    its Python sockets mid-Arrow-stream, fails the running tasks,
    respawns workers, and retries. Result must be hash-identical
    (requires spark.task.maxFailures >= 2)."""
    import signal
    import subprocess
    import threading

    def daemon_pids():
        """Only THIS session's daemons (children of OUR driver JVM,
        which is a child of this process) — killing every
        pyspark.daemon on the machine would take down a concurrent
        run's workers too (the soak-cleanup lesson, ADVICE r13)."""
        out = subprocess.run(
            ["ps", "-eo", "pid,ppid,args"], capture_output=True,
            text=True,
        ).stdout
        rows = [l.split(None, 2) for l in out.splitlines()[1:]]
        me = os.getpid()
        jvms = {
            int(p)
            for p, pp, args in rows
            if int(pp) == me and "java" in args
        }
        return {
            int(p)
            for p, pp, args in rows
            if int(pp) in jvms and "pyspark.daemon" in args
        }

    import rc_rag_spark.queries as q

    spec = q.REGISTRY[name]
    clean = result_hash(spec.fn(spark, sf_dir))
    res: dict = {}

    def work():
        res["h"] = result_hash(spec.fn(spark, sf_dir))

    th = threading.Thread(target=work)
    th.start()
    time.sleep(1.0)
    killed = 0
    for pid in sorted(daemon_pids()):
        try:
            os.kill(pid, signal.SIGKILL)
            killed += 1
        except ProcessLookupError:
            pass
    mid_flight = th.is_alive()
    th.join(600)
    return {
        "match": res.get("h") == clean,
        "killed": killed,
        "mid_flight": mid_flight,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default="")
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--soak", action="store_true")
    ap.add_argument("--writer", action="store_true")
    ap.add_argument("--pyworker-kill", default="", dest="pyworker_kill",
                    help="query name: SIGKILL all pyspark.daemon "
                         "processes mid-run, assert identical hash")
    ap.add_argument("--partition", type=int, default=0)
    ap.add_argument("--master", default="local[8, 2]")
    ap.add_argument(
        "--shuffle-partitions", default="8", dest="shuffle_partitions"
    )
    args = ap.parse_args()

    from rc_rag_spark.session import build_session

    spark = build_session(
        app_name="rc-rag-fault-run",
        master=args.master,
        extra_conf={
            "spark.sql.shuffle.partitions": args.shuffle_partitions
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    names = [n for n in (s.strip() for s in args.queries.split(",")) if n]
    result = {
        "queries": run_queries(spark, args.sf_dir, names, args.partition)
        if names
        else {},
        "streaming": run_streaming(spark, args.sf_dir, args.partition)
        if args.streaming
        else None,
        "soak": run_soak(spark, args.sf_dir, args.partition)
        if args.soak
        else None,
        "writer": run_writer(spark, args.partition)
        if args.writer
        else None,
        "pyworker_kill": run_pyworker_kill(
            spark, args.sf_dir, args.pyworker_kill
        )
        if args.pyworker_kill
        else None,
        "elapsed_sec": round(time.time() - t0, 1),
        "master": args.master,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
