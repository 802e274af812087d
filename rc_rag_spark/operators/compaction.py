"""Small-file compaction (the OPTIMIZE / bin-packing maintenance op).

Streaming ingest and over-parallel writes leave partitions fragmented
into kilobyte files; at 100 TB that means millions of parquet footers
per scan, task-scheduling overhead dominating I/O, and NameNode/
listing pressure. Compaction rewrites each partition's files into
~target_bytes outputs while preserving content exactly.

Two pieces:

- ``audit_files``: per-partition file census (count, bytes, smallest/
  largest) read from the hidden ``_metadata`` columns — the same
  census a lakehouse table format keeps in its manifest; the scan is
  column-pruned to metadata only.
- ``compact``: per partition, choose n_out = ceil(bytes / target)
  and rewrite through ``repartition(n_out)``. The driver loop is over
  PARTITIONS (metadata-scale, not data-scale); each rewrite is a
  distributed job. Partitions already at or under one target file are
  copied through with a single-file rewrite only when fragmented
  (n_files > n_out) — an already-compact partition is left alone.

Related planning-only query: q245_compaction_binpack (next-fit bin
packing over a file manifest). This module EXECUTES the rewrite;
q285_compaction_roundtrip pins content preservation against a DuckDB
oracle, and tests/test_compaction.py pins the file-count mechanics.

``compact`` writes to a FRESH destination. ``compact_in_place`` is
the real OPTIMIZE shape — rewrite under concurrent readers — and uses
the same manifest-publication discipline as sources/pyds.py's 2PC
sink: readers go through ``read_manifested`` (the _MANIFEST lists the
committed file set), compaction stages new files invisibly, moves
them into the live partition directories, and publishes with ONE
atomic manifest replace. A crash anywhere before that replace leaves
the old manifest — and therefore the old bytes — serving;
``vacuum_manifested`` later reclaims the orphans, never the committed
set. tests/test_compaction.py's crash-matrix pins the window.
"""

from __future__ import annotations

import json
import math
import os
import re
import tempfile
import uuid

from pyspark.sql import functions as F

_MANIFEST = "_MANIFEST"


class CompactionReclaimedError(RuntimeError):
    """A compaction's staged-and-moved output was reclaimed (by
    vacuum_manifested's inflight_max_age_sec ceiling) before its
    manifest publish. The previous generation is still committed and
    serving; the compaction is safe to retry."""


def audit_files(spark, path: str):
    """Per-partition file census via the hidden _metadata column:
    (partition, n_files, total_bytes, min_bytes, max_bytes).
    ``partition`` is the file's parent directory relative to ``path``
    ('' for unpartitioned layouts). A dataset directory with no data
    files (an empty table's write leaves only _SUCCESS) yields an
    empty census, not UNABLE_TO_INFER_SCHEMA — zero files is a valid
    answer to "how fragmented is this table"."""
    base = os.path.abspath(path)
    try:
        src = spark.read.parquet(path)
    except Exception as exc:  # noqa: BLE001
        # prefer the structured error class (stable across Spark
        # versions/locales); fall back to the message substring for
        # exception types that don't carry one
        cond = None
        for probe in ("getCondition", "getErrorClass"):
            fn = getattr(exc, probe, None)
            if callable(fn):
                try:
                    cond = fn()
                except Exception:  # noqa: BLE001
                    cond = None
                if cond:
                    break
        empty_table = (
            cond == "UNABLE_TO_INFER_SCHEMA"
            if cond
            else "UNABLE_TO_INFER_SCHEMA" in str(exc)
        )
        if not empty_table:
            raise
        return spark.createDataFrame(
            [],
            "partition string, n_files bigint, total_bytes bigint, "
            "min_bytes bigint, max_bytes bigint",
        )
    files = (
        src
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .distinct()
    )
    # length-based strip, not regexp: the base path is data, and a
    # regex-metacharacter in a directory name must not corrupt the
    # census
    prefix = f"file:{base}/"
    rel = F.substring("file_path", len(prefix) + 1, 1 << 30)
    part = F.when(
        rel.contains("/"), F.regexp_extract(rel, r"^(.*)/[^/]+$", 1)
    ).otherwise(F.lit(""))
    return (
        files.select(part.alias("partition"), "file_size")
        .groupBy("partition")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("file_size").cast("bigint").alias("total_bytes"),
            F.min("file_size").cast("bigint").alias("min_bytes"),
            F.max("file_size").cast("bigint").alias("max_bytes"),
        )
    )


def compact(
    spark,
    src: str,
    dst: str,
    target_bytes: int,
    max_concurrency: int = 4,
) -> list[dict]:
    """Rewrite ``src`` (optionally hive-partitioned parquet) into
    ``dst`` with ~target_bytes files per partition. Returns the
    per-partition plan that was executed:
    [{partition, n_files_before, total_bytes, n_files_planned}, ...].

    Each partition's rewrite is an INDEPENDENT Spark job, so they are
    submitted from a small thread pool (``max_concurrency``) — Spark's
    scheduler interleaves concurrent jobs across executors, which is
    the difference between "one maintenance window" and "one job per
    partition, serially" when a table has thousands of hive
    partitions. The driver-side plan list itself stays metadata-scale.

    Skip rule: a partition whose file count already matches its
    planned count is rewritten anyway only if dst != src semantics
    require a full copy — here dst is always a fresh directory, so
    every partition is written exactly once with its planned width."""
    from concurrent.futures import ThreadPoolExecutor

    plan_rows = sorted(
        (r.asDict() for r in audit_files(spark, src).collect()),
        key=lambda r: r["partition"],
    )

    def rewrite(row: dict) -> dict:
        part = row["partition"]
        n_out = max(1, math.ceil(row["total_bytes"] / target_bytes))
        part_src = os.path.join(src, part) if part else src
        part_dst = os.path.join(dst, part) if part else dst
        (
            spark.read.parquet(part_src)
            .repartition(n_out)
            .write.mode("overwrite")
            .parquet(part_dst)
        )
        return {
            "partition": part,
            "n_files_before": row["n_files"],
            "total_bytes": row["total_bytes"],
            "n_files_planned": n_out,
        }

    workers = max(1, min(max_concurrency, len(plan_rows) or 1))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        executed = list(pool.map(rewrite, plan_rows))
    return executed


# --------------------------------------------------------------------------
# In-place compaction: manifest-published atomic swap under readers.


def _read_manifest(path: str) -> dict | None:
    """The committed state: {"generation": N, "files": [rel, ...]} —
    None when the table has never been manifested."""
    mpath = os.path.join(path, _MANIFEST)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        return json.load(f)


def _publish_manifest(path: str, manifest: dict) -> None:
    """Atomic pointer flip: serialize to a same-directory temp file,
    fsync, os.replace over _MANIFEST, then fsync the DIRECTORY — the
    rename itself is only durable once the directory entry is synced;
    without it a power loss could revert to the old manifest after a
    vacuum already reclaimed old-generation files against the new
    one. Readers see the old file set or the new one, never a partial
    list."""
    fd, staging = tempfile.mkstemp(
        prefix="._manifest_", suffix=".tmp", dir=path
    )
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(staging, os.path.join(path, _MANIFEST))
        try:
            dfd = os.open(path, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            # some filesystems (and non-POSIX platforms) refuse
            # directory fsync; the replace is still atomic, just not
            # power-loss-durable there
            pass
    except BaseException:
        try:
            os.unlink(staging)
        except OSError:
            pass
        raise


def _list_data_files(path: str) -> list[str]:
    """Relative paths of all visible parquet data files under path
    (hidden _/. entries pruned at every level, like Spark's lister)."""
    out = []
    base = os.path.abspath(path)
    for root, dirs, files in os.walk(base):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for fn in files:
            if not fn.startswith(("_", ".")) and fn.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(root, fn), base))
    return sorted(out)


def ensure_manifest(path: str) -> dict:
    """Bootstrap generation 0 from the directory listing when absent
    (adopting a plain parquet table into manifested maintenance)."""
    m = _read_manifest(path)
    if m is None:
        m = {"generation": 0, "files": _list_data_files(path)}
        _publish_manifest(path, m)
    return m


def read_manifested(spark, path: str):
    """The reader contract for in-place-maintained tables: scan
    exactly the committed file set (basePath recovers hive partition
    columns). Files staged or moved by an in-flight compaction are
    invisible until its manifest publish."""
    m = ensure_manifest(path)
    if not m["files"]:
        raise ValueError(
            f"manifest at {path!r} (generation {m['generation']}) lists "
            "zero data files — nothing to read. If the table is "
            "genuinely empty, read it with an explicit schema instead "
            "of through the manifest."
        )
    files = [os.path.join(path, f) for f in m["files"]]
    return spark.read.option("basePath", os.path.abspath(path)).parquet(
        *files
    )


def compact_in_place(
    spark,
    path: str,
    target_bytes: int,
    max_concurrency: int = 4,
    publish_hook=None,
) -> dict:
    """OPTIMIZE under readers: rewrite each fragmented partition of a
    manifested table to ~target_bytes files WITHOUT taking the table
    offline, publishing the swap with one atomic manifest replace.

    Protocol (crash-safe at every step boundary):
      1. plan from the COMMITTED manifest's census (orphans from a
         previous crashed attempt never pollute the plan);
      2. rewrite each planned partition into a hidden staging dir
         (underscore prefix: invisible to any lister) — independent
         Spark jobs from a thread pool, as in ``compact``;
      3. move the staged files into the live partition directories
         under generation-tagged names (same-filesystem renames; the
         old manifest does not list them, so readers still resolve
         the old bytes);
      4. ``publish_hook()`` if given (the crash-injection seam the
         tests kill in);
      5. atomically replace _MANIFEST with generation N+1 listing the
         new files for rewritten partitions plus the untouched files
         of skipped partitions.
    A crash during/before 5 leaves generation N fully serving; the
    stranded generation-N+1 files are reclaimed by vacuum_manifested.
    Old generation-N files replaced by the swap stay on disk until
    vacuum (time-travel window, and any reader that loaded the old
    manifest keeps resolving its files).

    Returns {"generation", "rewritten": [plan rows], "skipped": n}.
    Partitions already at their planned file count are skipped —
    their files carry over into the new manifest untouched."""
    from concurrent.futures import ThreadPoolExecutor

    base = os.path.abspath(path)
    m = ensure_manifest(base)
    gen = m["generation"] + 1

    by_part: dict[str, list[str]] = {}
    for rel in m["files"]:
        part = os.path.dirname(rel)
        by_part.setdefault(part, []).append(rel)

    def census(part: str, rels: list[str]) -> dict:
        sizes = [os.path.getsize(os.path.join(base, r)) for r in rels]
        return {
            "partition": part,
            "n_files": len(rels),
            "total_bytes": sum(sizes),
        }

    plans = []
    for part in sorted(by_part):
        row = census(part, by_part[part])
        row["n_files_planned"] = max(
            1, math.ceil(row["total_bytes"] / target_bytes)
        )
        plans.append(row)

    staging_root = os.path.join(
        base, f"_staging_gen-{gen:06d}-{uuid.uuid4().hex[:8]}"
    )
    to_rewrite = [p for p in plans if p["n_files"] > p["n_files_planned"]]

    def rewrite(row: dict) -> tuple[str, list[str]]:
        part = row["partition"]
        files = [os.path.join(base, r) for r in by_part[part]]
        stage_dir = os.path.join(staging_root, part) if part else staging_root
        # explicit file-path read: no partition discovery, so the
        # partition column never leaks into the rewritten files
        (
            spark.read.parquet(*files)
            .repartition(row["n_files_planned"])
            .write.mode("overwrite")
            .parquet(stage_dir)
        )
        staged = sorted(
            fn
            for fn in os.listdir(stage_dir)
            if fn.endswith(".parquet") and not fn.startswith(("_", "."))
        )
        moved = []
        live_dir = os.path.join(base, part) if part else base
        for i, fn in enumerate(staged):
            new_rel = os.path.join(
                part, f"gen-{gen:06d}-{i:05d}-{uuid.uuid4().hex[:8]}.parquet"
            ) if part else (
                f"gen-{gen:06d}-{i:05d}-{uuid.uuid4().hex[:8]}.parquet"
            )
            os.makedirs(live_dir, exist_ok=True)
            os.rename(os.path.join(stage_dir, fn), os.path.join(base, new_rel))
            moved.append(new_rel)
        return part, moved

    workers = max(1, min(max_concurrency, len(to_rewrite) or 1))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        results = dict(pool.map(rewrite, to_rewrite))

    if publish_hook is not None:
        publish_hook()

    new_files: list[str] = []
    for part in sorted(by_part):
        new_files.extend(results.get(part, by_part[part]))
    # Pre-publish verification: a compaction that stalled longer than
    # vacuum_manifested's inflight_max_age_sec ceiling (default 7 d)
    # can have its moved-but-unpublished gen files reclaimed out from
    # under it. Publishing a manifest that lists reclaimed files would
    # leave the table unreadable — so verify every listed file still
    # exists and abort (retryable: generation N is still fully
    # serving) if any were taken.
    # Re-touch every file first: vacuum_manifested reclaims unmanifested
    # files older than inflight_max_age_sec, so bumping mtimes restarts
    # that ceiling and shrinks the reclaim/publish race to the touch→
    # publish window (milliseconds) instead of the whole compaction
    # duration. Residual window: a vacuum that already stat()ed a file
    # before the touch can still unlink it after; the existence check
    # below narrows that further, and _publish_manifest being a single
    # atomic rename means a loss inside the final window surfaces as a
    # read error on one file, repaired by re-running compaction — it
    # cannot torn-write the manifest itself.
    now = None
    for f in new_files:
        try:
            os.utime(os.path.join(base, f), now)
        except OSError:
            pass  # vanished — caught by the existence check below
    missing = [f for f in new_files if not os.path.exists(os.path.join(base, f))]
    if missing:
        raise CompactionReclaimedError(
            f"compact_in_place at {base!r}: {len(missing)} staged/carried "
            f"file(s) vanished before manifest publish (first: "
            f"{missing[0]!r}) — most likely vacuum_manifested's "
            "inflight_max_age_sec ceiling reclaimed an over-long "
            "compaction's output. Generation "
            f"{m['generation']} is still committed and serving; retry the "
            "compaction (and raise the ceiling above the longest plausible "
            "compaction duration)."
        )
    _publish_manifest(base, {"generation": gen, "files": sorted(new_files)})

    # staging skeleton is empty now (files were moved out); drop it
    import shutil

    shutil.rmtree(staging_root, ignore_errors=True)
    return {
        "generation": gen,
        "rewritten": to_rewrite,
        "skipped": len(plans) - len(to_rewrite),
    }


#  \d{6,}: generations are %06d-padded but NOT capped — at gen
#  1,000,000 the format emits 7 digits and a {6}-only pattern would
#  stop matching, letting vacuum delete an in-flight generation
_GEN_FILE_RE = re.compile(r"^gen-(\d{6,})-")
_GEN_STAGING_RE = re.compile(r"^_staging_gen-(\d{6,})-")


def vacuum_manifested(
    path: str,
    retention_sec: float = 24 * 3600.0,
    inflight_max_age_sec: float = 7 * 24 * 3600.0,
) -> list[str]:
    """Reclaim data files NOT listed in the committed manifest —
    superseded generations and the debris of crashed compactions —
    once older than ``retention_sec`` (the time-travel / in-flight-
    reader window; mirrors sources/pyds.py's sink VACUUM). Also prunes
    abandoned staging directories. Never touches manifest-listed
    files. Returns the deleted relative paths.

    Two guards protect a CONCURRENTLY RUNNING compact_in_place:
    generation-tagged files and staging dirs whose generation is
    NEWER than the committed manifest's are an in-flight attempt's
    moved-but-unpublished output and are skipped — until
    ``inflight_max_age_sec`` (default 7 days): an "in-flight"
    generation that old is the debris of a compaction that crashed
    and was never retried, and without this ceiling it would leak
    FOREVER on tables that stop being compacted (no later commit ever
    supersedes its generation number). Pass ``float('inf')`` to
    restore the never-reclaim behavior. The default retention (24 h)
    additionally covers readers that loaded the old manifest;
    ``retention_sec=0.0`` is a TEST-ONLY setting — with untagged
    orphans (e.g. pre-adoption part-* files) it races any concurrent
    writer."""
    import shutil
    import time

    base = os.path.abspath(path)
    m = _read_manifest(base)
    if m is None:
        return []
    keep = set(m["files"])
    committed_gen = int(m["generation"])
    now = time.time()
    cutoff = now - retention_sec
    inflight_cutoff = now - inflight_max_age_sec
    deleted = []
    for rel in _list_data_files(base):
        if rel in keep:
            continue
        full = os.path.join(base, rel)
        gm = _GEN_FILE_RE.match(os.path.basename(rel))
        if (
            gm
            and int(gm.group(1)) > committed_gen
            and os.path.getmtime(full) > inflight_cutoff
        ):
            continue  # in-flight compaction's unpublished generation
        if os.path.getmtime(full) <= cutoff:
            os.unlink(full)
            deleted.append(rel)
    for entry in os.listdir(base):
        full = os.path.join(base, entry)
        sm = _GEN_STAGING_RE.match(entry)
        if not sm or not os.path.isdir(full):
            continue
        if (
            int(sm.group(1)) > committed_gen
            and os.path.getmtime(full) > inflight_cutoff
        ):
            continue  # live staging dir of an in-flight compaction
        if os.path.getmtime(full) <= cutoff:
            shutil.rmtree(full, ignore_errors=True)
            deleted.append(entry + "/")
    return sorted(deleted)
