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
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F


def audit_files(spark, path: str):
    """Per-partition file census via the hidden _metadata column:
    (partition, n_files, total_bytes, min_bytes, max_bytes).
    ``partition`` is the file's parent directory relative to ``path``
    ('' for unpartitioned layouts)."""
    base = os.path.abspath(path)
    files = (
        spark.read.parquet(path)
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
