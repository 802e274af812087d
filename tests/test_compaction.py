"""Small-file compaction mechanics (rc_rag_spark/operators/
compaction.py): the _metadata file census, the per-partition plan,
and the executed rewrite's file counts — content preservation is
hash-pinned by q285's oracle parity."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from rc_rag_spark.operators.compaction import audit_files, compact
from rc_rag_spark.sources import table


def _parquet_files(path):
    return [
        p
        for p in glob.glob(os.path.join(path, "**", "*.parquet"),
                           recursive=True)
        if os.path.basename(p).startswith("part-")
    ]


def test_audit_census_matches_filesystem(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="rc_rag_compact_audit_")
    try:
        (
            table(spark, sf_dir, "events")
            .repartition(9)
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(d)
        )
        audit = {r["partition"]: r for r in audit_files(spark, d).collect()}
        for part_dir in glob.glob(os.path.join(d, "event_type=*")):
            part = os.path.basename(part_dir)
            files = _parquet_files(part_dir)
            assert audit[part]["n_files"] == len(files), part
            assert audit[part]["total_bytes"] == sum(
                os.path.getsize(f) for f in files
            ), part
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_reduces_files_and_preserves_content(spark, sf_dir):
    """17 fragments per partition -> planned width per partition;
    every partition's output file count equals the plan, total files
    drop, and the full content (id-keyed) survives exactly."""
    frag = tempfile.mkdtemp(prefix="rc_rag_compact_frag_")
    out = tempfile.mkdtemp(prefix="rc_rag_compact_out_")
    try:
        ev = table(spark, sf_dir, "events")
        ev.repartition(17).write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(frag)
        plan = compact(spark, frag, out, target_bytes=8 * 1024 * 1024)
        assert plan, "no partitions planned"
        for row in plan:
            part_dir = os.path.join(out, row["partition"])
            got_files = len(_parquet_files(part_dir))
            assert got_files == row["n_files_planned"], row
            assert row["n_files_before"] == 17, row
        assert len(_parquet_files(out)) < len(_parquet_files(frag))
        # content identical, id-keyed (partition col re-derives from dirs)
        want = {
            r["event_id"]: (r["event_type"], r["user_id"], r["value"])
            for r in ev.collect()
        }
        got = {
            r["event_id"]: (r["event_type"], r["user_id"], r["value"])
            for r in spark.read.parquet(out).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(frag, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_compact_respects_target_bytes(spark, sf_dir):
    """A tiny target must yield MORE output files (finer packing), a
    huge target exactly one file per partition."""
    frag = tempfile.mkdtemp(prefix="rc_rag_compact_tb_")
    fine = tempfile.mkdtemp(prefix="rc_rag_compact_fine_")
    one = tempfile.mkdtemp(prefix="rc_rag_compact_one_")
    try:
        table(spark, sf_dir, "events").repartition(5).write.mode(
            "overwrite"
        ).parquet(frag)
        total = sum(os.path.getsize(f) for f in _parquet_files(frag))
        # fine target = a third of the data => at least 3 planned files
        plan_fine = compact(spark, frag, fine, target_bytes=max(1, total // 3))
        plan_one = compact(spark, frag, one, target_bytes=1 << 40)
        assert plan_one[0]["n_files_planned"] == 1
        assert len(_parquet_files(one)) == 1
        assert (
            plan_fine[0]["n_files_planned"] > plan_one[0]["n_files_planned"]
        )
        assert len(_parquet_files(fine)) == plan_fine[0]["n_files_planned"]
        # unpartitioned layout reports the '' partition
        assert plan_one[0]["partition"] == ""
    finally:
        for d in (frag, fine, one):
            shutil.rmtree(d, ignore_errors=True)


def test_compact_concurrency_levels_agree(spark, sf_dir):
    """The thread-pooled rewrite is a pure parallelization: plans and
    output content at max_concurrency=1 and =8 must be identical
    (plan order is sorted by partition, so the returned list is
    deterministic regardless of completion order)."""
    frag = tempfile.mkdtemp(prefix="rc_rag_compact_cc_frag_")
    seq = tempfile.mkdtemp(prefix="rc_rag_compact_cc_seq_")
    par = tempfile.mkdtemp(prefix="rc_rag_compact_cc_par_")
    try:
        table(spark, sf_dir, "events").repartition(7).write.mode(
            "overwrite"
        ).partitionBy("event_type").parquet(frag)
        plan_seq = compact(
            spark, frag, seq, target_bytes=1 << 20, max_concurrency=1
        )
        plan_par = compact(
            spark, frag, par, target_bytes=1 << 20, max_concurrency=8
        )
        assert plan_seq == plan_par and len(plan_seq) >= 2
        key = lambda d: sorted(
            (r["event_id"], r["user_id"]) for r in
            spark.read.parquet(d).collect()
        )
        assert key(seq) == key(par)
    finally:
        for d in (frag, seq, par):
            shutil.rmtree(d, ignore_errors=True)
