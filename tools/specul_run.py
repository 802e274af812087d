"""Speculative-execution determinism proof (VERDICT r13 #2).

Task RETRY (fault_run.py) proves recovery after a DEAD first attempt.
``spark.speculation`` — routinely enabled at 100-node scale — creates
a different, nastier shape: TWO LIVE ATTEMPTS of the same task running
concurrently, racing to finish, the loser killed mid-flight. Results
must be identical anyway, and non-idempotent commit paths (the Python
DS 2PC writer, foreachBatch sinks) must publish exactly-once even when
a duplicate attempt has already written bytes to disk.

Mechanism: faultinject's STRAGGLER mode (``delay=<ms>``) makes the
first attempt of the target partition of every engine Python kernel
SLEEP; with speculation armed aggressively (interval 100ms, quantile
0.25, multiplier 1.05) the scheduler launches a genuine speculative
duplicate while attempt 0 is still alive. Marker lines record every
attempt, so ``attempt>0`` entries with zero task failures prove the
race actually happened (not a vacuous pass).

Runs under ``local-cluster[2,2,2048]`` by default: the duplicate
attempts live in SEPARATE executor JVMs with their own Python worker
pools — the real topology of the race.

SINGLE-HOST RESTRICTION (measured here, r14): Spark's scheduler
refuses to place a speculative copy on a host that already has a live
attempt of the same task, and every probe configuration (quantile
0.1, multiplier 1.01, efficiency gate off, hard 1s duration
threshold, 12s straggler) produced zero speculative attempts on this
one-machine local-cluster — the same-host exclusion makes genuine
scheduler speculation PHYSICALLY IMPOSSIBLE in a single-host sandbox.
So this harness proves the STRAGGLER half (delayed-but-alive tasks
change nothing, speculation confs on), and the duplicate-attempt
RACE half is proven deterministically at the commit-protocol level in
tests/test_pyds.py::test_writer_duplicate_attempt_race_* — two live
concurrent attempts of the same task driven directly against the 2PC
writer. ``speculation_seen`` stays in the report so a future
multi-host run can flip it to a live-scheduler proof.

Usage:
    python tools/specul_run.py [--sf-dir D] [--queries a,b] [--writer]
                               [--streaming] [--master M] [--delay-ms N]

Prints one JSON line:
{"queries": {name: {"match": bool, "attempts": n, "speculative": n}},
 "writer": {...}, "streaming": {...}, "speculation_seen": bool}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fault_run import result_hash  # noqa: E402


def _attempt_stats(marker: str) -> tuple[int, int]:
    """(total marker lines, lines with attempt>0) — the latter are
    speculative duplicates: straggler mode never fails a task, so no
    retry can explain a second attempt."""
    from rc_rag_spark.faultinject import marker_firings

    lines = marker_firings(marker)
    spec = sum(
        1
        for ln in lines
        if "attempt=" in ln and not ln.endswith("attempt=0")
    )
    return len(lines), spec


def run_queries(spark, sf_dir: str, names: list[str], delay_ms: int):
    import rc_rag_spark.queries as q

    from rc_rag_spark.faultinject import inject_task_failures

    def drop_result_caches():
        import rc_rag_spark.queries.rag as rag

        rag._PIPELINE_CACHE.clear()

    out = {}
    for name in names:
        spec = q.REGISTRY[name]
        drop_result_caches()
        clean = result_hash(spec.fn(spark, sf_dir))
        marker = os.path.join(
            tempfile.gettempdir(), f"rc_rag_spec_{uuid.uuid4().hex}"
        )
        try:
            drop_result_caches()
            with inject_task_failures(
                spark, partition=0, marker=marker, delay_ms=delay_ms
            ):
                raced = result_hash(spec.fn(spark, sf_dir))
            attempts, speculative = _attempt_stats(marker)
            out[name] = {
                "match": clean == raced,
                "attempts": attempts,
                "speculative": speculative,
            }
        finally:
            if os.path.exists(marker):
                os.unlink(marker)
    return out


def run_writer(spark, delay_ms: int):
    """The DS-API 2PC writer with a LIVE duplicate-attempt race: the
    straggling attempt has already flushed rows to its uuid file when
    the speculative duplicate starts writing its own. Exactly-once =
    the manifest lists exactly one committed file per task, their row
    total equals the input, the read-back content equals the source,
    and the losing attempt's bytes sit orphaned on disk, excluded."""
    import glob as _glob

    from rc_rag_spark.faultinject import inject_task_failures
    from rc_rag_spark.sources import pyds

    pyds.register_all(spark)
    d = tempfile.mkdtemp(prefix="rc_rag_spec_writer_")
    marker = os.path.join(
        tempfile.gettempdir(), f"rc_rag_spec_{uuid.uuid4().hex}"
    )
    try:
        src = pyds.series_batch_df(spark, 5000).repartition(4)
        src_hash = result_hash(src)
        with inject_task_failures(
            spark, partition=0, marker=marker, delay_ms=delay_ms
        ):
            src.write.format("rc_rag_jsonldir").option("path", d).mode(
                "append"
            ).save()
        files, n_rows = pyds.manifest_files(d)
        back = spark.read.schema(pyds.ROW_SCHEMA).json(
            [os.path.join(d, f) for f in files]
        )
        on_disk = {
            os.path.basename(p)
            for p in _glob.glob(os.path.join(d, "part-*.jsonl"))
        }
        attempts, speculative = _attempt_stats(marker)
        return {
            "match": result_hash(back) == src_hash,
            "manifest_rows": n_rows,
            "manifest_files": len(files),
            "orphans": len(on_disk - set(files)),
            "attempts": attempts,
            "speculative": speculative,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
        if os.path.exists(marker):
            os.unlink(marker)


def run_streaming(spark, sf_dir: str, delay_ms: int):
    """Stateful stream + foreachBatch parquet sink with straggler
    injection live for the whole run: duplicate attempts race inside
    micro-batches; the final per-user totals must equal the batch
    twin (exactly-once through Spark's sink commit protocol).

    The injected sleep is capped at 1s here: the stream fires the
    straggler hook in EVERY micro-batch's source+state stages (~75
    times over the run), so a 4s sleep alone exceeds the
    awaitTermination window and the stop() interrupt strands a
    half-written foreachBatch directory (measured r14)."""
    delay_ms = min(delay_ms, 1000)
    import glob as _glob

    from pyspark.sql.functions import col

    from rc_rag_spark.faultinject import inject_task_failures
    from rc_rag_spark.sources import table
    from rc_rag_spark.streaming import windows as W

    events_dir = tempfile.mkdtemp(prefix="rc_rag_spec_sev_")
    ckpt = tempfile.mkdtemp(prefix="rc_rag_spec_sck_")
    out_dir = tempfile.mkdtemp(prefix="rc_rag_spec_sout_")
    marker = os.path.join(
        tempfile.gettempdir(), f"rc_rag_spec_{uuid.uuid4().hex}"
    )
    try:
        ev = table(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "value"
        ).localCheckpoint(eager=True)
        for i in range(5):
            ev.where(col("event_id") % 5 == i).coalesce(1).write.mode(
                "append"
            ).parquet(events_dir)
        twin = W.stateful_user_totals(spark.read.parquet(events_dir))
        clean = result_hash(twin)

        sch = spark.read.parquet(events_dir).schema

        def sink(df, batch_id):
            df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"b{batch_id:05d}")
            )

        with inject_task_failures(
            spark, partition=0, marker=marker, delay_ms=delay_ms
        ):
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
        attempts, speculative = _attempt_stats(marker)
        return {
            "match": result_hash(got) == clean,
            "attempts": attempts,
            "speculative": speculative,
        }
    finally:
        shutil.rmtree(events_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        if os.path.exists(marker):
            os.unlink(marker)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default="")
    ap.add_argument("--writer", action="store_true")
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--master", default="local-cluster[2,2,2048]")
    ap.add_argument("--delay-ms", type=int, default=4000)
    args = ap.parse_args()

    from rc_rag_spark.session import build_session

    spark = build_session(
        app_name="rc-rag-speculation",
        master=args.master,
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.default.parallelism": "8",
            "spark.sql.shuffle.partitions": "8",
            # aggressive speculation: check every 100ms, consider a
            # task a straggler at 1.05x the median once 25% of its
            # stage is done — the injected 4s sleep vs ~100ms medians
            # clears that bar by 40x
            "spark.speculation": "true",
            "spark.speculation.interval": "100ms",
            "spark.speculation.quantile": "0.25",
            "spark.speculation.multiplier": "1.05",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {}
    failures: dict = {}

    def section(name, fn, *a):
        try:
            report[name] = fn(*a)
        except Exception as exc:  # noqa: BLE001
            failures[name] = " ".join(str(exc).split())[:400]

    if args.queries:
        names = [n for n in args.queries.split(",") if n]
        section(
            "queries", run_queries, spark, args.sf_dir, names, args.delay_ms
        )
    if args.writer:
        section("writer", run_writer, spark, args.delay_ms)
    if args.streaming:
        section(
            "streaming", run_streaming, spark, args.sf_dir, args.delay_ms
        )

    spec_total = 0
    for sec in report.values():
        if "speculative" in sec:
            spec_total += sec["speculative"]
        else:
            spec_total += sum(r["speculative"] for r in sec.values())
    report["speculation_seen"] = spec_total > 0
    if failures:
        report["failures"] = failures
    print(json.dumps(report))

    ok = not failures and all(
        r["match"]
        for sec in report.values()
        if isinstance(sec, dict)
        for r in (
            sec.values()
            if "match" not in sec
            else [sec]
        )
    )
    # speculation_seen is reported, not required: on a single host the
    # scheduler's same-host exclusion makes a live speculative copy
    # impossible (see module docstring) — the race half of the proof
    # lives in the protocol-level tests.
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
