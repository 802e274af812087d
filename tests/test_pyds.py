"""Python Data Source API — streaming-reader and writer halves
(rc_rag_spark/sources/pyds.py).

Contract mirrors the rate-source live tests in test_streaming.py:
every streaming check runs a REAL unbounded StreamingQuery through
>= 4 live micro-batches and compares the committed prefix against a
native batch twin; the writer check is a full write -> manifest ->
read-back -> exact-content round trip."""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F

from rc_rag_spark.sources import pyds


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pyds.register_all(spark)


def _run_live(stream_df, min_batches=4, timeout=120):
    """Unbounded query (processingTime trigger), stop after
    >= min_batches committed. Returns (rows, max committed batchId)."""
    name = "mem_" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    spark = stream_df.sparkSession
    t0 = time.time()
    while time.time() - t0 < timeout:
        lp = q.lastProgress
        if lp is not None and lp["batchId"] >= min_batches:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    committed = [p["batchId"] for p in q.recentProgress]
    assert committed and max(committed) >= min_batches, (
        f"only {committed} batches committed within {timeout}s"
    )
    return spark.table(name).collect(), max(committed)


def _twin_map(spark, n):
    return {
        r["id"]: (r["k"], r["v"])
        for r in pyds.series_batch_df(spark, n).collect()
    }


def _assert_prefix(spark, rows, max_batch, rows_per_batch):
    """Committed rows == the series prefix for the committed batches
    (one batch of slack: stop() can land after we read lastProgress)."""
    n_committed = (max_batch + 1) * rows_per_batch
    twin = _twin_map(spark, n_committed + rows_per_batch)
    got = {r["id"]: (r["k"], r["v"]) for r in rows}
    assert len(got) == len(rows), "duplicate ids emitted"
    # soundness: every emitted row is the twin's row at that id
    for rid, kv in got.items():
        assert kv == twin[rid], (rid, kv, twin[rid])
    # completeness: everything from fully-committed batches arrived
    missing = [i for i in range(n_committed) if i not in got]
    assert not missing, f"gaps in committed prefix: {missing[:10]}"


def test_partitioned_stream_live_micro_batches_match_batch_twin(spark):
    """rc_rag_rangestream (partitioned DataSourceStreamReader, Arrow
    RecordBatch per partition) through >= 4 live micro-batches: the
    committed prefix must equal the native spark.range twin exactly —
    every id exactly once, every (k, v) bit-identical."""
    R = 20
    rows, max_batch = _run_live(
        spark.readStream.format("rc_rag_rangestream")
        .option("rowsPerBatch", R)
        .option("numPartitions", 3)
        .load()
    )
    _assert_prefix(spark, rows, max_batch, R)


def test_partitioned_stream_plans_real_partitions():
    """The offset span of each micro-batch splits into numPartitions
    contiguous, disjoint, covering InputPartitions — the property that
    makes the scan parallel instead of a driver funnel."""
    r = pyds._RangeStreamReader(
        {"rowsperbatch": "20", "numpartitions": "3"}
    )
    parts = r.partitions({"index": 40}, {"index": 60})
    spans = [p.value for p in parts]
    assert len(spans) == 3
    # disjoint + covering
    covered = sorted(i for lo, hi in spans for i in range(lo, hi))
    assert covered == list(range(40, 60))
    # and the reader yields exactly the span, as one Arrow batch
    batch = next(iter(r.read(parts[0])))
    assert batch.num_rows == spans[0][1] - spans[0][0]
    assert batch.column(0).to_pylist() == list(range(*spans[0]))


def test_simple_stream_live_micro_batches_match_batch_twin(spark):
    """rc_rag_simplerangestream (SimpleDataSourceStreamReader) through
    >= 4 live micro-batches == batch twin on the committed prefix."""
    R = 10
    rows, max_batch = _run_live(
        spark.readStream.format("rc_rag_simplerangestream")
        .option("rowsPerBatch", R)
        .load()
    )
    _assert_prefix(spark, rows, max_batch, R)


def test_simple_stream_read_between_offsets_replays_exactly():
    """readBetweenOffsets(a, b) — the checkpoint-recovery path Spark
    calls when restarting a query whose batch [a, b) was planned but
    not committed — must replay exactly the rows read() produced for
    the same span, or recovery silently corrupts."""
    r = pyds._SimpleRangeStreamReader({"rowsperbatch": "7"})
    it, nxt = r.read({"index": 14})
    first = list(it)
    assert nxt == {"index": 21}
    replay = list(r.readBetweenOffsets({"index": 14}, {"index": 21}))
    assert replay == first
    assert [t[0] for t in replay] == list(range(14, 21))


def test_simple_stream_checkpoint_restart_exactly_once(spark):
    """Stop a checkpointed query mid-stream and restart it from the
    same checkpoint into a fault-tolerant FILE sink: the combined
    output must be a contiguous id prefix with NO gaps and NO
    duplicates. This is the path that exercises readBetweenOffsets —
    on restart Spark replays the planned-but-uncommitted batch from
    the offset log through it — composed with the file sink's own
    commit manifest for end-to-end exactly-once."""
    ckpt = tempfile.mkdtemp(prefix="rc_rag_pyds_ckpt_")
    out = tempfile.mkdtemp(prefix="rc_rag_pyds_out_")
    R = 10
    try:
        def start():
            return (
                spark.readStream.format("rc_rag_simplerangestream")
                .option("rowsPerBatch", R)
                .load()
                .writeStream.format("json")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(processingTime="0 seconds")
                .start()
            )

        def run_until(q, min_batches):
            t0 = time.time()
            while time.time() - t0 < 120:
                lp = q.lastProgress
                if lp is not None and lp["batchId"] >= min_batches:
                    break
                time.sleep(0.3)
            q.stop()
            q.awaitTermination(30)

        q1 = start()
        run_until(q1, 2)
        b1 = max(p["batchId"] for p in q1.recentProgress)
        ids1 = sorted(
            r["id"]
            for r in spark.read.schema(pyds.ROW_SCHEMA).json(out).collect()
        )
        assert ids1, "first run wrote nothing"

        q2 = start()
        run_until(q2, b1 + 2)
        rows = spark.read.schema(pyds.ROW_SCHEMA).json(out).collect()
        ids = sorted(r["id"] for r in rows)
        assert len(ids) == len(set(ids)), "duplicates after restart"
        assert ids == list(range(len(ids))), "gap after restart"
        # run 2 genuinely resumed past run 1's frontier
        assert max(ids) > max(ids1)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_partitioned_reader_fast_forwards_after_restart():
    """A FRESH reader object (what checkpoint restart constructs) whose
    first engine calls carry a committed offset must fast-forward its
    synthetic tail: the next latestOffset() must be AHEAD of the
    committed position, never behind it — the regression where a
    restarted rc_rag_rangestream re-planned (and an append sink
    re-emitted) already-committed rows."""
    r = pyds._RangeStreamReader({"rowsperbatch": "20", "numpartitions": "2"})
    # restart path 1: engine re-plans the uncommitted batch [40, 60)
    r.partitions({"index": 40}, {"index": 60})
    assert r.latestOffset() == {"index": 80}
    # restart path 2: engine only calls commit(end) first
    r2 = pyds._RangeStreamReader({"rowsperbatch": "20", "numpartitions": "2"})
    r2.commit({"index": 100})
    assert r2.latestOffset() == {"index": 120}
    # stale-state clamp: a span behind the tail yields no negative work
    assert r2.partitions({"index": 120}, {"index": 100}) == []


def test_partitioned_stream_checkpoint_restart_exactly_once(spark):
    """rc_rag_rangestream twin of the simple-reader restart test: stop
    a checkpointed query mid-stream, restart from the same checkpoint
    into a file sink — combined output must be a contiguous id prefix
    with no gaps and no duplicates, and run 2 must advance past run
    1's frontier (i.e. the restarted reader's latestOffset resumed
    AHEAD of the committed offset instead of resetting to 0)."""
    ckpt = tempfile.mkdtemp(prefix="rc_rag_pyds_pckpt_")
    out = tempfile.mkdtemp(prefix="rc_rag_pyds_pout_")
    R = 10
    try:
        def start():
            return (
                spark.readStream.format("rc_rag_rangestream")
                .option("rowsPerBatch", R)
                .option("numPartitions", 2)
                .load()
                .writeStream.format("json")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(processingTime="0 seconds")
                .start()
            )

        def run_until(q, min_batches):
            t0 = time.time()
            while time.time() - t0 < 120:
                lp = q.lastProgress
                if lp is not None and lp["batchId"] >= min_batches:
                    break
                time.sleep(0.3)
            q.stop()
            q.awaitTermination(30)

        q1 = start()
        run_until(q1, 2)
        b1 = max(p["batchId"] for p in q1.recentProgress)
        ids1 = sorted(
            r["id"]
            for r in spark.read.schema(pyds.ROW_SCHEMA).json(out).collect()
        )
        assert ids1, "first run wrote nothing"

        q2 = start()
        run_until(q2, b1 + 2)
        rows = spark.read.schema(pyds.ROW_SCHEMA).json(out).collect()
        ids = sorted(r["id"] for r in rows)
        assert len(ids) == len(set(ids)), "duplicates after restart"
        assert ids == list(range(len(ids))), "gap after restart"
        assert max(ids) > max(ids1)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_jsonldir_writer_roundtrip_exact(spark):
    """Write a 4-partition DataFrame through the custom Arrow sink,
    read back ONLY the manifest-committed files: content must match
    the source exactly (id-keyed full-row comparison), the manifest
    row count must match, and one committed file per input partition
    must exist."""
    d = tempfile.mkdtemp(prefix="rc_rag_pyds_sink_")
    try:
        src = pyds.series_batch_df(spark, 5000).repartition(4)
        src.write.format("rc_rag_jsonldir").option("path", d).mode(
            "append"
        ).save()
        files, n_rows = pyds.manifest_files(d)
        assert n_rows == 5000 and len(files) == 4
        # a dangling file (failed/speculative attempt) must be invisible
        with open(os.path.join(d, "part-dangling.jsonl"), "w") as f:
            f.write(json.dumps({"id": 999999, "k": 0, "v": 0.0}) + "\n")
        back = spark.read.schema(pyds.ROW_SCHEMA).json(
            [os.path.join(d, f) for f in files]
        )
        got = {r["id"]: (r["k"], r["v"]) for r in back.collect()}
        want = {r["id"]: (r["k"], r["v"]) for r in src.collect()}
        assert got == want
        assert 999999 not in got
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_jsonldir_writer_requires_path(spark):
    df = pyds.series_batch_df(spark, 10)
    with pytest.raises(Exception, match="path"):
        df.write.format("rc_rag_jsonldir").mode("append").save()


def test_jsonldir_stream_writer_per_epoch_manifests(spark):
    """Custom STREAMING sink (DataSourceStreamArrowWriter): the
    rc_rag_rangestream source written through rc_rag_jsonldir for
    >= 4 live micro-batches. Each committed epoch publishes its own
    _MANIFEST-<batchId>; the union of manifest-listed files must be
    exactly the series prefix covered by the committed epochs —
    custom source -> custom sink end to end, no built-in connector on
    either side."""
    out = tempfile.mkdtemp(prefix="rc_rag_pyds_ssink_")
    R = 20
    try:
        q = (
            spark.readStream.format("rc_rag_rangestream")
            .option("rowsPerBatch", R)
            .option("numPartitions", 2)
            .load()
            .writeStream.format("rc_rag_jsonldir")
            .option("path", out)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="rc_rag_pyds_ssink_ckpt_"),
            )
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        t0 = time.time()
        while time.time() - t0 < 120:
            lp = q.lastProgress
            if lp is not None and lp["batchId"] >= 4:
                break
            time.sleep(0.3)
        q.stop()
        q.awaitTermination(30)

        files, n_rows, epochs = pyds.stream_manifest_files(out)
        assert len(epochs) >= 4
        assert epochs == list(range(len(epochs))), "epoch gap"
        # every committed epoch contributed numPartitions files
        assert len(files) == 2 * len(epochs)
        back = spark.read.schema(pyds.ROW_SCHEMA).json(
            [os.path.join(out, f) for f in files]
        )
        got = {r["id"]: (r["k"], r["v"]) for r in back.collect()}
        assert len(got) == n_rows == len(epochs) * R
        twin = _twin_map(spark, len(epochs) * R)
        assert got == twin
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_writer_abort_removes_partial_files(tmp_path):
    """abort() — called by Spark when any task of a batch write fails —
    must delete the files the succeeded tasks already wrote, so a
    failed job leaves no orphan data a manifest-less reader could
    mistake for output. Driven directly (no Spark): write two task
    outputs, abort with their commit messages, assert both gone and
    no _MANIFEST exists."""
    import pyarrow as pa

    d = str(tmp_path / "sink")
    w = pyds._JsonlDirWriter({"path": d}, overwrite=False)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2]), pa.array([0, 1]), pa.array([0.0, 3.1])],
        names=["id", "k", "v"],
    )
    msgs = [w.write(iter([batch])), w.write(iter([batch]))]
    assert sorted(os.listdir(d)) == sorted(m.filename for m in msgs)
    w.abort(msgs + [None])  # a failed task reports None
    assert os.listdir(d) == []


def test_writer_kill_during_commit_publishes_nothing(tmp_path):
    """Driver death BETWEEN task writes and commit() (the two-phase
    gap): data files exist on disk, but no _MANIFEST was published —
    a manifest-respecting reader must see ZERO rows, and a later
    successful job in the same directory must publish a manifest
    listing ONLY its own files. This is the crash window that makes
    naive directory-listing readers wrong and the manifest contract
    necessary."""
    import pyarrow as pa

    import pytest as _pytest

    d = str(tmp_path / "ksink")
    w = pyds._JsonlDirWriter({"path": d}, overwrite=False)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2]), pa.array([0, 1]), pa.array([0.0, 3.1])],
        names=["id", "k", "v"],
    )
    orphan_msgs = [w.write(iter([batch])), w.write(iter([batch]))]
    # driver "dies" here: neither commit() nor abort() runs
    assert len(os.listdir(d)) == 2  # orphans are on disk...
    with _pytest.raises(FileNotFoundError):
        pyds.manifest_files(d)      # ...but unreachable via manifest

    # a later job over the same path commits only its own files
    w2 = pyds._JsonlDirWriter({"path": d}, overwrite=False)
    m = w2.write(iter([batch]))
    w2.commit([m])
    files, rows = pyds.manifest_files(d)
    assert files == [m.filename] and rows == 2
    for orphan in orphan_msgs:
        assert orphan.filename not in files


def test_stream_writer_kill_during_epoch_commit_replays_cleanly(tmp_path):
    """Streaming twin: a crash after epoch N's task writes but before
    its _MANIFEST-N lands leaves orphans; on restart Spark REPLAYS the
    epoch (offsets were never committed), and the replay's manifest
    must supersede — committed union = exactly epoch 0 + the replayed
    epoch 1, never the orphaned first attempt."""
    import pyarrow as pa

    d = str(tmp_path / "kssink")
    w = pyds._JsonlDirStreamWriter({"path": d})
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1]), pa.array([1]), pa.array([3.1])],
        names=["id", "k", "v"],
    )
    m0 = w.write(iter([batch]))
    w.commit([m0], batchId=0)
    orphan = w.write(iter([batch]))  # epoch 1 attempt; driver dies here
    files, rows, epochs = pyds.stream_manifest_files(d)
    assert epochs == [0] and files == [m0.filename]  # orphan invisible
    # restart: epoch 1 replays through a fresh writer
    w2 = pyds._JsonlDirStreamWriter({"path": d})
    m1 = w2.write(iter([batch]))
    w2.commit([m1], batchId=1)
    files, rows, epochs = pyds.stream_manifest_files(d)
    assert epochs == [0, 1] and rows == 2
    assert set(files) == {m0.filename, m1.filename}
    assert orphan.filename not in files


def test_stream_writer_abort_and_epoch_replay(tmp_path):
    """Streaming abort for epoch N must remove that epoch's partial
    files and leave earlier committed epochs intact; a subsequent
    successful replay of epoch N must publish _MANIFEST-N shadowing
    nothing from epoch N-1."""
    import pyarrow as pa

    d = str(tmp_path / "ssink")
    w = pyds._JsonlDirStreamWriter({"path": d})
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1]), pa.array([1]), pa.array([3.1])],
        names=["id", "k", "v"],
    )
    m0 = w.write(iter([batch]))
    w.commit([m0], batchId=0)
    # epoch 1 fails mid-flight
    m1_bad = w.write(iter([batch]))
    w.abort([m1_bad, None], batchId=1)
    assert not os.path.exists(os.path.join(d, m1_bad.filename))
    # replay epoch 1 successfully
    m1 = w.write(iter([batch]))
    w.commit([m1], batchId=1)
    files, rows, epochs = pyds.stream_manifest_files(d)
    assert epochs == [0, 1] and rows == 2
    assert set(files) == {m0.filename, m1.filename}


def _batch():
    import pyarrow as pa

    return pa.RecordBatch.from_arrays(
        [pa.array([1, 2]), pa.array([0, 1]), pa.array([0.0, 3.1])],
        names=["id", "k", "v"],
    )


def test_vacuum_removes_only_unreferenced_orphans(tmp_path):
    """vacuum_sink deletes exactly the crash-window debris: files no
    manifest references. Manifest-listed files (batch _MANIFEST and
    every streaming _MANIFEST-N) and the manifests themselves must
    survive, and committed content must be byte-identical after."""
    d = str(tmp_path / "vsink")
    w = pyds._JsonlDirWriter({"path": d}, overwrite=False)
    orphan = w.write(iter([_batch()]))  # attempt whose driver died
    m = w.write(iter([_batch()]))
    w.commit([m])
    sw = pyds._JsonlDirStreamWriter({"path": d})
    sm = sw.write(iter([_batch()]))
    sw.commit([sm], batchId=0)
    stream_orphan = sw.write(iter([_batch()]))  # epoch 1, never committed

    before = {
        f: open(os.path.join(d, f)).read()
        for f in (m.filename, sm.filename)
    }
    deleted = pyds.vacuum_sink(d)
    assert sorted(deleted) == sorted(
        [orphan.filename, stream_orphan.filename]
    )
    left = sorted(os.listdir(d))
    assert left == sorted(
        ["_MANIFEST", "_MANIFEST-0", m.filename, sm.filename]
    )
    for f, content in before.items():
        assert open(os.path.join(d, f)).read() == content
    # manifest readers are unaffected
    assert pyds.manifest_files(d)[0] == [m.filename]
    assert pyds.stream_manifest_files(d)[0] == [sm.filename]


def test_vacuum_retention_spares_young_inflight_files(tmp_path):
    """The retention window: a file younger than retention_seconds is
    kept even though unreferenced — it may belong to an IN-FLIGHT
    epoch whose commit hasn't landed yet. Aging it past the window
    (mtime rewind) makes the next vacuum reclaim it."""
    d = str(tmp_path / "rsink")
    w = pyds._JsonlDirWriter({"path": d}, overwrite=False)
    inflight = w.write(iter([_batch()]))
    assert pyds.vacuum_sink(d, retention_seconds=3600) == []
    assert os.path.exists(os.path.join(d, inflight.filename))
    old = os.path.join(d, inflight.filename)
    past = os.path.getmtime(old) - 7200
    os.utime(old, (past, past))
    assert pyds.vacuum_sink(d, retention_seconds=3600) == [
        inflight.filename
    ]
    assert not os.path.exists(old)


def test_vacuum_idempotent_and_empty_sink(tmp_path):
    """Vacuum twice = vacuum once; a sink with only manifests (or an
    empty dir) is a no-op, not an error."""
    d = str(tmp_path / "esink")
    os.makedirs(d)
    assert pyds.vacuum_sink(d) == []
    w = pyds._JsonlDirWriter({"path": d}, overwrite=False)
    orphan = w.write(iter([_batch()]))
    m = w.write(iter([_batch()]))
    w.commit([m])
    assert pyds.vacuum_sink(d) == [orphan.filename]
    assert pyds.vacuum_sink(d) == []


def test_pushdown_reader_absorbs_id_range_and_prunes_partitions():
    """pushFilters absorbed-vs-yielded split, driven directly: id
    comparisons narrow [lo, hi) (exact off-by-one semantics per
    operator), non-id filters come back for Spark, and partitions()
    emits only splits overlapping the surviving range."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        StringStartsWith,
    )

    r = pyds._PushdownRangeReader({"n": "20000", "parts": "8"})
    residual = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("id",), 2500),
                LessThan(("id",), 9000),
                EqualTo(("k",), 3),            # non-id -> Spark's
                StringStartsWith(("v",), "1"),  # unsupported -> Spark's
            ]
        )
    )
    assert (r.lo, r.hi) == (2500, 9000)
    assert {type(f).__name__ for f in residual} == {
        "EqualTo",
        "StringStartsWith",
    }
    # chunk stays the PRE-pushdown width (20000/8 = 2500), so the
    # surviving range [2500, 9000) needs exactly 3 of 8 splits
    parts = r.partitions()
    assert [p.value for p in parts] == [
        (2500, 5000),
        (5000, 7500),
        (7500, 9000),
    ]
    # strict > and = have their own boundary arithmetic
    r2 = pyds._PushdownRangeReader({"n": "100", "parts": "4"})
    assert list(r2.pushFilters([GreaterThan(("id",), 10)])) == []
    assert r2.lo == 11
    r3 = pyds._PushdownRangeReader({"n": "100", "parts": "4"})
    assert list(r3.pushFilters([EqualTo(("id",), 42)])) == []
    assert (r3.lo, r3.hi) == (42, 43)
    assert [p.value for p in r3.partitions()] == [(42, 43)]
    # contradiction -> empty scan, not a crash
    r4 = pyds._PushdownRangeReader({"n": "100", "parts": "4"})
    list(r4.pushFilters([GreaterThanOrEqual(("id",), 90),
                         LessThan(("id",), 10)]))
    assert [p.value for p in r4.partitions()] == [(0, 0)]
    assert list(r4.read(r4.partitions()[0])) == []


def test_pushdown_source_end_to_end_matches_unfiltered_twin(spark):
    """Through the engine: the pushdown source under a mixed predicate
    must equal the same predicate applied to an unpushed materialized
    twin, and the scan must plan only the surviving partitions."""
    pyds.register_all(spark)
    conf_key = "spark.sql.python.filterPushdown.enabled"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        base = (
            spark.read.format("rc_rag_pushrange")
            .option("n", "20000")
            .option("parts", "8")
        )
        pred = "id >= 2500 AND id < 9000 AND k <> 3"
        got = base.load().where(pred)
        twin = pyds.series_batch_df(spark, 20000).where(pred)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, twin.collect())
        )
        # pruning is visible in the physical scan's partition count
        assert got.rdd.getNumPartitions() == 3
        assert base.load().rdd.getNumPartitions() == 8
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)


def test_pushdown_range_absorption_property():
    """Property (hypothesis): for ANY conjunction of id comparisons,
    the reader's surviving [lo, hi) × its partition tiling covers
    exactly the ids a brute-force evaluation keeps — no off-by-one on
    any operator, no gap or overlap between partition splits."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    OPS = [
        (GreaterThan, lambda i, v: i > v),
        (GreaterThanOrEqual, lambda i, v: i >= v),
        (LessThan, lambda i, v: i < v),
        (LessThanOrEqual, lambda i, v: i <= v),
        (EqualTo, lambda i, v: i == v),
    ]

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=300),
        parts=st.integers(min_value=1, max_value=9),
        specs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=4),
                st.integers(min_value=-5, max_value=305),
            ),
            max_size=5,
        ),
    )
    def check(n, parts, specs):
        r = pyds._PushdownRangeReader({"n": str(n), "parts": str(parts)})
        residual = list(
            r.pushFilters([OPS[op][0](("id",), v) for op, v in specs])
        )
        assert residual == []  # every id comparison is absorbable
        want = {
            i
            for i in range(n)
            if all(OPS[op][1](i, v) for op, v in specs)
        }
        tiles = [p.value for p in r.partitions()]
        got = set()
        for lo, hi in tiles:
            span = set(range(lo, hi))
            assert not (span & got), "overlapping partition splits"
            got |= span
        assert got == want

    check()


def test_register_all_multi_session_thread_pinning(spark):
    """ADVICE r13: two JVM quirks measured on this Spark build —
    (1) registerPython resolves through the CALLING THREAD's active
    session, so register_all(B) from a thread pinned to A used to
    land B's sources in A's manager and leave B's own manager empty
    (B writes → DATA_SOURCE_NOT_FOUND); (2) register_all must not
    silently repoint a thread's deliberate multi-session pinning.
    The fix pins active=B only for the duration of B's registration.
    Asserts: B's OWN manager holds the source, the thread stays
    pinned to A, and writes on BOTH sessions succeed from that
    thread."""
    import threading

    b = spark.newSession()
    d = tempfile.mkdtemp(prefix="rc_rag_pyds_ms_")
    errs: list[str] = []

    def dsm(s):
        return s._jsparkSession.sessionState().dataSourceManager()

    def work():
        try:
            jss = spark._jvm.org.apache.spark.sql.SparkSession
            pyds.register_all(spark)  # fresh thread: pins active = A
            pyds.register_all(b)
            assert jss.getActiveSession().get().equals(
                spark._jsparkSession
            ), "register_all(b) repointed the thread's pinning"
            assert dsm(b).dataSourceExists(
                "rc_rag_jsonldir"
            ), "B's own manager is empty — registration leaked to A"
            b.createDataFrame(
                [(1, "x"), (2, "y")], "id bigint, s string"
            ).write.format("rc_rag_jsonldir").mode("append").option(
                "path", os.path.join(d, "ob")
            ).save()
            spark.createDataFrame(
                [(3, "z")], "id bigint, s string"
            ).write.format("rc_rag_jsonldir").mode("append").option(
                "path", os.path.join(d, "oa")
            ).save()
        except Exception:  # noqa: BLE001
            import traceback

            errs.append(traceback.format_exc())

    try:
        t = threading.Thread(target=work)
        t.start()
        t.join(120)
        assert not errs, errs[0]
        files_b, n_b = pyds.manifest_files(os.path.join(d, "ob"))
        files_a, n_a = pyds.manifest_files(os.path.join(d, "oa"))
        assert n_b == 2 and n_a == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _race_batches(n_batches=3, rows_per=4, seed=0):
    import pyarrow as pa

    out = []
    base = seed * 1000
    for b in range(n_batches):
        ids = [base + b * rows_per + i for i in range(rows_per)]
        out.append(
            pa.RecordBatch.from_arrays(
                [
                    pa.array(ids),
                    pa.array([i % 7 for i in ids]),
                    pa.array([float(i) * 0.5 for i in ids]),
                ],
                names=["id", "k", "v"],
            )
        )
    return out


def test_writer_duplicate_attempt_race_exactly_once(tmp_path):
    """Speculative execution creates TWO LIVE CONCURRENT attempts of
    the same write task — the race retry-mode testing can never
    produce (retry implies attempt 0 is dead). Spark's scheduler
    refuses to place a speculative copy on the same host, so a
    single-machine local-cluster can NEVER schedule one
    (tools/specul_run.py documents the probes); this drives the exact
    interleaving at the protocol level instead: two attempts of task
    0 run in parallel threads, interleaving their batch writes; Spark
    delivers exactly ONE commit message per task index to commit().
    Exactly-once = the manifest lists only the winner's file, row
    total equals the logical input (no duplication from the live
    loser), and the loser's completed bytes sit orphaned, invisible
    to the manifest reader."""
    import threading

    d = str(tmp_path / "racesink")
    w = pyds._JsonlDirWriter({"path": d}, overwrite=False)

    barrier = threading.Barrier(2)
    msgs = {}

    def attempt(tag):
        barrier.wait()  # both attempts of task 0 genuinely live at once
        msgs[tag] = w.write(iter(_race_batches(seed=0)))

    t0 = threading.Thread(target=attempt, args=("a0",))
    t1 = threading.Thread(target=attempt, args=("a1",))
    t0.start(); t1.start(); t0.join(60); t1.join(60)
    assert set(msgs) == {"a0", "a1"}
    # distinct uuid files — concurrent attempts never clobber
    assert msgs["a0"].filename != msgs["a1"].filename
    assert msgs["a0"].rows == msgs["a1"].rows == 12

    # other (non-raced) tasks of the job
    others = [w.write(iter(_race_batches(seed=s))) for s in (1, 2, 3)]

    # the scheduler picks ONE winner for task 0 (say a1 — the
    # speculative copy finished first); the zombie a0 has ALREADY
    # completed its file, but its message is dropped, not committed
    winner = msgs["a1"]
    w.commit([winner] + others)

    files, rows = pyds.manifest_files(d)
    assert rows == 4 * 12, "duplicate attempt leaked rows into commit"
    assert len(files) == 4
    assert winner.filename in files
    assert msgs["a0"].filename not in files  # loser excluded
    # loser bytes ARE on disk (speculation kill is async) — the
    # manifest contract, not file absence, is what keeps them out
    assert os.path.exists(os.path.join(d, msgs["a0"].filename))


def test_stream_writer_duplicate_attempt_race_exactly_once(tmp_path):
    """Same duplicate-attempt race against the STREAMING epoch writer:
    a speculative copy inside micro-batch N must not leak rows into
    _MANIFEST-N, and a replay of epoch N (restart after crash)
    publishes the same logical content regardless of which attempt
    won before."""
    import threading

    d = str(tmp_path / "racestream")
    w = pyds._JsonlDirStreamWriter({"path": d})

    barrier = threading.Barrier(2)
    msgs = {}

    def attempt(tag):
        barrier.wait()
        msgs[tag] = w.write(iter(_race_batches(seed=9)))

    t0 = threading.Thread(target=attempt, args=("a0",))
    t1 = threading.Thread(target=attempt, args=("a1",))
    t0.start(); t1.start(); t0.join(60); t1.join(60)
    other = w.write(iter(_race_batches(seed=8)))

    w.commit([msgs["a0"], other], batchId=5)  # a0 won this time
    with open(os.path.join(d, "_MANIFEST-5")) as fh:
        m5 = json.load(fh)
    assert m5["rows"] == 24
    assert msgs["a1"].filename not in m5["files"]

    # epoch replay after restart: same epoch id, fresh attempts —
    # rewrites _MANIFEST-5 in place, shadowing the old file set
    replay = [
        w.write(iter(_race_batches(seed=9))),
        w.write(iter(_race_batches(seed=8))),
    ]
    w.commit(replay, batchId=5)
    with open(os.path.join(d, "_MANIFEST-5")) as fh:
        m5b = json.load(fh)
    assert m5b["rows"] == 24
    assert set(m5b["files"]) == {m.filename for m in replay}
