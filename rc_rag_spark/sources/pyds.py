"""Python Data Source API (Spark 4.0, SPARK-44076) — the streaming
and writer halves, completing the extension point whose batch-read
third is pinned by q229 (rc_rag_spark/queries/spark4.py).

Three sources/sinks, all deterministic so batch twins can replay them:

- ``rc_rag_rangestream`` — a PARTITIONED streaming source
  (DataSourceStreamReader): each micro-batch advances the offset by
  ``rowsPerBatch`` rows and splits the batch's row range into
  ``numPartitions`` InputPartitions, so every micro-batch is read by
  N parallel Python readers, each yielding one Arrow RecordBatch.
  This is the scale shape — offsets are planned on the driver but the
  DATA never moves through it.
- ``rc_rag_simplerangestream`` — the same row stream through
  SimpleDataSourceStreamReader, the driver-side convenience API for
  low-rate feeds (read + latest-offset planning in one call, plus
  readBetweenOffsets for checkpoint replay). Kept deliberately tiny:
  its documented use is control-plane-rate feeds only.
- ``rc_rag_jsonldir`` — a writer-only sink in BOTH modes: batch
  (DataSourceArrowWriter) and streaming (DataSourceStreamArrowWriter).
  Each executor task serializes its Arrow RecordBatches to one
  JSON-lines file, returns the file name + row count as its
  WriterCommitMessage, and the driver's commit() publishes a manifest
  listing exactly the committed files (`_MANIFEST` for batch, one
  `_MANIFEST-<batchId>` per streaming epoch) — the two-phase-commit
  contract (task write → driver commit) that makes a custom sink
  exactly-once under task retries and micro-batch replays:
  uncommitted files are absent from the manifests, and a replayed
  epoch rewrites its own manifest.

Row schema shared by the synthetic sources (same arithmetic series as
q229, so DuckDB generate_series / spark.range twins replay it):

    id bigint, k int, v double
    k = id % 7,  v = ((id * 31) % 1000) / 10.0

Tests: tests/test_pyds.py — live >=4-micro-batch runs against batch
twins (the same harness contract as the rate-source streaming tests),
checkpoint-recovery replay via readBetweenOffsets, and a writer
round-trip hash check against the source DataFrame.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

ROW_SCHEMA = "id bigint, k int, v double"


def _arrow_batch(lo: int, hi: int):
    """One Arrow RecordBatch for the synthetic series rows [lo, hi)."""
    import numpy as np
    import pyarrow as pa

    ids = np.arange(lo, hi, dtype=np.int64)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(ids, type=pa.int64()),
            pa.array((ids % 7).astype(np.int32), type=pa.int32()),
            pa.array((ids * 31) % 1000 / 10.0, type=pa.float64()),
        ],
        names=["id", "k", "v"],
    )


def series_batch_df(spark, n: int):
    """Batch twin: the first n rows of the synthetic series as a
    native spark.range plan (what any committed stream prefix must
    equal)."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).cast("int").alias("k"),
        ((F.col("id") * 31) % 1000 / 10.0).alias("v"),
    )


# --------------------------------------------------------------------------
# Batch source with FILTER PUSHDOWN (Spark 4.1, pushFilters)
# --------------------------------------------------------------------------


class _PushdownRangeReader(DataSourceReader):
    """Batch reader for the synthetic series with pushFilters support
    (Spark 4.1): comparison predicates on ``id`` — the source's
    physical ordering key — are ABSORBED by narrowing the generated
    [lo, hi) row range, so pruning happens at PLAN time and pruned
    partitions are never scheduled (the 100 TB semantic: a predicate
    on the sort/partition key must cut work, not just rows after the
    scan). Everything else (predicates on k/v, disjunctions, IN) is
    yielded back per the API contract — Spark evaluates those post
    scan, which keeps correctness independent of what the source
    understands. partitions() splits only the SURVIVING range and
    drops empty splits, so len(partitions()) is the observable
    pruning proof pinned by tests/test_pyds.py."""

    def __init__(self, options):
        self.n = int(options.get("n", 0))
        self.parts = int(options.get("parts", 8))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            v = getattr(f, "value", None)
            if getattr(f, "attribute", None) == ("id",) and isinstance(
                v, int
            ) and not isinstance(v, bool):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, v + 1)
                elif isinstance(f, EqualTo):
                    self.lo = max(self.lo, v)
                    self.hi = min(self.hi, v + 1)
                else:
                    yield f  # unsupported comparison shape on id
            else:
                yield f  # non-id column / non-integer — Spark's job

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        chunk = max(1, -(-(self.n or 1) // self.parts))  # pre-pushdown width
        out = []
        p_lo = lo
        while p_lo < hi:
            p_hi = min(p_lo + chunk, hi)
            out.append(InputPartition((p_lo, p_hi)))
            p_lo = p_hi
        return out or [InputPartition((0, 0))]

    def read(self, partition):
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("pyds_range_read")
        lo, hi = partition.value
        if hi > lo:
            yield _arrow_batch(lo, hi)


class PushdownRangeDataSource(DataSource):
    """format("rc_rag_pushrange") — the synthetic series as a batch
    source whose reader implements pushFilters (id-range absorption +
    partition pruning)."""

    @classmethod
    def name(cls):
        return "rc_rag_pushrange"

    def schema(self):
        return ROW_SCHEMA

    def reader(self, schema):
        return _PushdownRangeReader(self.options)


# --------------------------------------------------------------------------
# Partitioned streaming source (the scale path)
# --------------------------------------------------------------------------


class _RangeStreamReader(DataSourceStreamReader):
    """Offset = {"index": next unread row id}. Each micro-batch spans
    [start, start + rowsPerBatch) unless maxRows caps the stream; the
    span splits into numPartitions contiguous InputPartitions.

    Restart safety: a fresh reader object starts with ``_latest = 0``,
    so the synthetic tail pointer must be FAST-FORWARDED from every
    engine-supplied offset (``partitions(start, end)`` and
    ``commit(end)`` both carry the checkpointed position). Without
    that, the first post-restart ``latestOffset()`` would report an
    end BEHIND the committed start and the engine would re-plan (and an
    append sink would re-emit) already-committed rows. ``partitions``
    additionally clamps ``hi >= lo`` so a stale tail can never produce
    a negative span. Pinned by
    tests/test_pyds.py::test_partitioned_stream_checkpoint_restart_exactly_once."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 20))
        self.num_partitions = int(options.get("numpartitions", 2))
        self.max_rows = int(options.get("maxrows", 0))  # 0 = unbounded
        self._latest = 0

    def _fast_forward(self, offset: dict) -> None:
        self._latest = max(self._latest, int(offset["index"]))

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        # advances one batch per poll; a real feed would report its
        # tail here (e.g. the topic's end offset)
        self._latest = self._latest + self.rows_per_batch
        if self.max_rows:
            self._latest = min(self._latest, self.max_rows)
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict):
        self._fast_forward(start)
        self._fast_forward(end)
        lo, hi = start["index"], end["index"]
        hi = max(hi, lo)  # never a negative span, even on stale state
        n = max(self.num_partitions, 1)
        chunk = max((hi - lo + n - 1) // n, 1)
        return [
            InputPartition((p_lo, min(p_lo + chunk, hi)))
            for p_lo in range(lo, hi, chunk)
        ]

    def read(self, partition):
        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault("pyds_range_read")
        lo, hi = partition.value
        if hi > lo:
            yield _arrow_batch(lo, hi)

    def commit(self, end: dict):
        # nothing to release (the series is recomputable from offsets),
        # but the committed position fast-forwards the tail pointer so
        # a restarted reader never plans behind the checkpoint
        self._fast_forward(end)


class _SimpleRangeStreamReader(SimpleDataSourceStreamReader):
    """Driver-side simple reader: read() returns (rows, next offset)
    in one call; readBetweenOffsets() replays a committed span after
    restart. Row-tuple form is acceptable HERE ONLY because the simple
    API is documented for low-rate feeds — the partitioned Arrow
    reader above is the data-plane shape."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 20))
        self.max_rows = int(options.get("maxrows", 0))

    def initialOffset(self):
        return {"index": 0}

    def _rows(self, lo: int, hi: int):
        return [
            (i, i % 7, (i * 31) % 1000 / 10.0) for i in range(lo, hi)
        ]

    def read(self, start: dict):
        lo = start["index"]
        hi = lo + self.rows_per_batch
        if self.max_rows:
            hi = min(hi, self.max_rows)
        return iter(self._rows(lo, hi)), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["index"], end["index"]))


class RangeStreamDataSource(DataSource):
    """format("rc_rag_rangestream") — partitioned streaming source."""

    @classmethod
    def name(cls):
        return "rc_rag_rangestream"

    def schema(self):
        return ROW_SCHEMA

    def streamReader(self, schema):
        return _RangeStreamReader(self.options)


class SimpleRangeStreamDataSource(DataSource):
    """format("rc_rag_simplerangestream") — simple streaming source."""

    @classmethod
    def name(cls):
        return "rc_rag_simplerangestream"

    def schema(self):
        return ROW_SCHEMA

    def simpleStreamReader(self, schema):
        return _SimpleRangeStreamReader(self.options)


# --------------------------------------------------------------------------
# Writer-only sink (two-phase commit)
# --------------------------------------------------------------------------


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    rows: int


class _JsonlDirWriter(DataSourceArrowWriter):
    """Each task streams its Arrow batches into one .jsonl file named
    by task UUID (so a retried task never collides with the attempt it
    replaces), then reports the name to the driver. Files from failed
    or speculative attempts are left dangling but NEVER appear in
    _MANIFEST — readers of the sink must go through the manifest."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rc_rag_jsonldir requires a path option")
        self.overwrite = overwrite

    def write(self, iterator):
        from rc_rag_spark.faultinject import maybe_inject_fault

        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, fname), "w") as f:
            for batch in iterator:
                for rec in batch.to_pylist():
                    f.write(json.dumps(rec, default=str) + "\n")
                    n += 1
                # MID-write injection point — after rows have hit
                # disk, so a first-attempt failure strands a real
                # partial file that ONLY the manifest 2PC keeps out
                # of readers (the retry writes a fresh uuid name)
                f.flush()
                maybe_inject_fault("pyds_jsonl_write")
        return _FileCommit(fname, n)

    def commit(self, messages):
        files = sorted(
            (m.filename, m.rows) for m in messages if m is not None
        )
        manifest = {
            "files": [f for f, _ in files],
            "rows": sum(r for _, r in files),
        }
        with open(os.path.join(self.path, "_MANIFEST"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class _JsonlDirStreamWriter(DataSourceStreamArrowWriter):
    """Streaming half of the sink: identical per-task file writes, but
    commit() is PER EPOCH — it publishes _MANIFEST-<batchId> listing
    that micro-batch's committed files. Exactly-once composes from two
    facts: (a) a replayed micro-batch rewrites the SAME manifest name,
    shadowing the aborted attempt's files, and (b) readers union only
    manifest-listed files. abort() deletes the epoch's partial files."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rc_rag_jsonldir requires a path option")

    def write(self, iterator):
        from rc_rag_spark.faultinject import maybe_inject_fault

        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, fname), "w") as f:
            for batch in iterator:
                for rec in batch.to_pylist():
                    f.write(json.dumps(rec, default=str) + "\n")
                    n += 1
                # MID-write injection point — after rows have hit
                # disk, so a first-attempt failure strands a real
                # partial file that ONLY the manifest 2PC keeps out
                # of readers (the retry writes a fresh uuid name)
                f.flush()
                maybe_inject_fault("pyds_jsonl_write")
        return _FileCommit(fname, n)

    def commit(self, messages, batchId: int):
        files = sorted(
            (m.filename, m.rows) for m in messages if m is not None
        )
        manifest = {
            "files": [f for f, _ in files],
            "rows": sum(r for _, r in files),
            "batch_id": batchId,
        }
        with open(
            os.path.join(self.path, f"_MANIFEST-{batchId}"), "w"
        ) as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId: int):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlDirDataSource(DataSource):
    """format("rc_rag_jsonldir") — manifest-committed JSONL sink,
    usable as a batch sink (df.write) and a streaming sink
    (df.writeStream; one manifest per micro-batch epoch)."""

    @classmethod
    def name(cls):
        return "rc_rag_jsonldir"

    def writer(self, schema, overwrite: bool):
        return _JsonlDirWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _JsonlDirStreamWriter(self.options)


def manifest_files(path: str) -> tuple[list[str], int]:
    """Read a sink directory's _MANIFEST → (committed files, rows)."""
    with open(os.path.join(path, "_MANIFEST")) as f:
        m = json.load(f)
    return m["files"], m["rows"]


def stream_manifest_files(path: str) -> tuple[list[str], int, list[int]]:
    """Union a streaming sink's per-epoch manifests → (committed
    files across all epochs, total rows, sorted epoch ids)."""
    files: list[str] = []
    rows = 0
    epochs: list[int] = []
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_MANIFEST-"):
            with open(os.path.join(path, entry)) as f:
                m = json.load(f)
            files += m["files"]
            rows += m["rows"]
            epochs.append(m["batch_id"])
    return files, rows, sorted(epochs)


def vacuum_sink(path: str, retention_seconds: float = 0.0) -> list[str]:
    """VACUUM for the manifest-committed sink: delete data files that
    no manifest references — the debris failed/speculative attempts
    and crash-window replays leave behind (write() ran, commit()
    didn't; abort() is best-effort and a SIGKILL'd executor never
    runs it). Correctness needs no vacuum — readers union only
    manifest-listed files — but at 100 TB the orphans are real bytes
    and real LIST pressure, so the maintenance op exists for the same
    reason Delta's VACUUM does.

    ``retention_seconds`` keeps files younger than the threshold even
    when unreferenced: an in-flight task's file is unreferenced until
    its epoch commits, so a zero-retention vacuum racing a live write
    would eat uncommitted work (Delta's retention-window rationale).
    Driver-side listing of ONE directory — manifest-scale, not
    data-scale. Returns the deleted filenames."""
    referenced: set[str] = set()
    batch_manifest = os.path.join(path, "_MANIFEST")
    if os.path.exists(batch_manifest):
        referenced.update(manifest_files(path)[0])
    for entry in os.listdir(path):
        if entry.startswith("_MANIFEST-"):
            with open(os.path.join(path, entry)) as f:
                referenced.update(json.load(f)["files"])
    now = time.time()
    deleted = []
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_MANIFEST") or entry in referenced:
            continue
        full = os.path.join(path, entry)
        try:
            if now - os.path.getmtime(full) < retention_seconds:
                continue
            os.remove(full)
            deleted.append(entry)
        except OSError:
            pass  # concurrent vacuum/cleanup already removed it
    return deleted


_REGISTER_LOCK = threading.Lock()
_REGISTERED_FLAG = "_rc_rag_pyds_registered"
_ALL_SOURCES = None  # filled below the class definitions


def _register_sources(session) -> None:
    for src in _ALL_SOURCES:
        try:
            session.dataSource.register(src)
        except Exception as exc:  # noqa: BLE001
            # the Python-DS registry can be SHARED across newSession()
            # siblings (one static manager per JVM in this Spark
            # build), where a re-register of the same name raises
            # DATA_SOURCE_ALREADY_EXISTS — which means the source is
            # reachable, i.e. exactly the state we want. Anything else
            # is a real failure.
            if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
                raise


def register_all(spark) -> None:
    """Idempotently register every Data Source in this module — ONCE
    per session, under a lock (a concurrent lookup landing in a
    registration window sees DATA_SOURCE_NOT_FOUND).

    Two JVM quirks this function absorbs (both measured on this Spark
    build, tests/test_pyds.py::test_register_all_multi_session_*):

    1. The Python-DS lookup on the WRITE path resolves through
       SparkSession.getActiveSession — a JVM ThreadLocal that is EMPTY
       in the fresh JVM thread py4j creates for every new Python
       thread — so `df.write.format("rc_rag_jsonldir")` from a thread
       that didn't create the session dies DATA_SOURCE_NOT_FOUND even
       though the source is registered. Fix: pin the calling thread's
       active session to `spark` when it has none.
    2. registerPython itself ALSO resolves through the active session:
       calling B.dataSource.register from a thread whose active
       session is A dup-checks/registers against A's manager and
       leaves B's own manager EMPTY — so B's writes then fail
       DATA_SOURCE_NOT_FOUND "even though B registered" (ADVICE r13).
       Fix: pin active = `spark` FOR THE DURATION of the registration,
       then restore the thread's previous pinning, so registration
       always lands in `spark`'s own manager and the caller's
       deliberate multi-session pinning is never silently repointed."""
    if getattr(spark, _REGISTERED_FLAG, False):
        # once-flag lives ON the session object (not a module set
        # keyed by id(spark): a recycled address after GC would
        # silently skip registration for a brand-new session)
        _pin_active_if_empty(spark)
        return
    with _REGISTER_LOCK:
        if getattr(spark, _REGISTERED_FLAG, False):
            _pin_active_if_empty(spark)
            return
        prev = None
        try:
            jss = spark._jvm.org.apache.spark.sql.SparkSession
            active = jss.getActiveSession()
            prev = None if active.isEmpty() else active.get()
            jss.setActiveSession(spark._jsparkSession)
        except Exception:  # noqa: BLE001 — connect mode has no _jvm
            jss = None
        try:
            _register_sources(spark)
        finally:
            # restore a DIFFERENT session's deliberate pinning; a
            # previously-unpinned thread stays pinned to `spark`
            # (quirk-1 fix) — that's the state it needs for writes
            if (
                jss is not None
                and prev is not None
                and not prev.equals(spark._jsparkSession)
            ):
                jss.setActiveSession(prev)
        setattr(spark, _REGISTERED_FLAG, True)


def _pin_active_if_empty(spark) -> None:
    """Quirk-1 fix for already-registered sessions: a fresh py4j
    thread has no active session, and the write-path lookup needs
    one."""
    try:
        jss = spark._jvm.org.apache.spark.sql.SparkSession
        if jss.getActiveSession().isEmpty():
            jss.setActiveSession(spark._jsparkSession)
    except Exception:  # noqa: BLE001 — connect mode has no _jvm
        pass


_ALL_SOURCES = (
    RangeStreamDataSource,
    SimpleRangeStreamDataSource,
    JsonlDirDataSource,
    PushdownRangeDataSource,
)
