"""End-to-end corpus-curation pipeline: the chained operators must
equal composing them by hand, stages must resume from disk, and the
attrition report must reconcile."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rc_rag_spark.operators import dedup as DD
from rc_rag_spark.operators import textstats as TS
from rc_rag_spark.pipeline.curation import (
    CurationPipeline,
    contaminated_ids,
    near_dup_drop_ids,
)
from rc_rag_spark.sources import table


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="curation_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs_with_dups(spark, sf_dir):
    """Documents plus planted exact and near duplicates."""
    d = table(spark, sf_dir, "documents")
    exact = d.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    words = F.split("text", " ")
    near = d.where(F.col("doc_id") % 23 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.array_join(
            F.concat(F.slice(words, 1, 40), F.array(F.lit("zzz"))), " "
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    return d.unionByName(exact).unionByName(near)


def test_pipeline_matches_manual_composition(spark, sf_dir, workdir):
    docs = _docs_with_dups(spark, sf_dir)
    bench = table(spark, sf_dir, "documents").where(F.col("doc_id") < 10)

    pipe = (
        CurationPipeline(spark, workdir)
        .exact_dedup()
        .near_dedup(jaccard_threshold=0.5)
        .quality_filter(min_score=0.3)
        .decontaminate(bench)
    )
    got = {r["doc_id"] for r in pipe.run(docs).select("doc_id").collect()}

    # manual composition of the same operators — raw md5, NOT
    # DD.fingerprint: exact_dedup deliberately keys on the raw text
    # (the normalizing fingerprint would collapse case/punctuation
    # variants, a different spec than the pipeline implements)
    keep = (
        docs.groupBy(F.md5(F.col("text")).alias("_fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s1 = docs.join(keep, "doc_id", "left_semi")
    s2 = s1.join(near_dup_drop_ids(s1), "doc_id", "left_anti")
    s3 = s2.where(TS.quality_score(F.col("text")) >= 0.3)
    s4 = s3.join(contaminated_ids(s3, bench), "doc_id", "left_anti")
    want = {r["doc_id"] for r in s4.select("doc_id").collect()}

    assert got == want and len(got) > 0

    # the planted exact dups must be gone (min-id retention keeps the
    # original), and at least one planted near-dup must be dropped
    assert not any(i >= 1_000_000 and i < 2_000_000 for i in got)
    assert any(i >= 2_000_000 for i in {r["doc_id"] for r in docs.collect()})
    # report reconciles: in - dropped == out per step, chained
    rep = pipe.report()
    assert [n for n, *_ in rep] == [
        "exact_dedup", "near_dedup", "quality_filter", "decontaminate"
    ]
    for name, rows_in, rows_out, dropped in rep:
        assert rows_in - dropped == rows_out, name
    assert rep[0][1] == docs.count()
    assert rep[-1][2] == len(got)


def test_pipeline_resumes_from_stages(spark, sf_dir, workdir):
    """A second run with the same workdir must reuse the persisted
    stages (no recompute) and return identical membership."""
    docs = _docs_with_dups(spark, sf_dir)

    def build():
        return (
            CurationPipeline(spark, workdir)
            .exact_dedup()
            .near_dedup()
        )

    first = {r["doc_id"] for r in build().run(docs).collect()}
    import os
    import time

    stage0 = os.path.join(workdir, "00_exact_dedup", "_SUCCESS")
    mtime = os.path.getmtime(stage0)
    time.sleep(0.05)
    second = {r["doc_id"] for r in build().run(docs).collect()}
    assert second == first
    assert os.path.getmtime(stage0) == mtime  # stage not rewritten


def test_pipeline_invalidates_on_param_change(spark, sf_dir, workdir):
    """Re-running with different step parameters must recompute the
    stage (and cascade), never serve the stale-parameter table."""
    import os

    docs = _docs_with_dups(spark, sf_dir)

    def run_with(threshold):
        return (
            CurationPipeline(spark, workdir)
            .exact_dedup()
            .near_dedup(jaccard_threshold=threshold)
            .run(docs)
        )

    first = {r["doc_id"] for r in run_with(0.5).collect()}
    stage1 = os.path.join(workdir, "01_near_dedup", "_SUCCESS")
    mtime = os.path.getmtime(stage1)
    import time as _t

    _t.sleep(0.05)
    # different threshold -> manifest mismatch -> stage recomputed
    loose = {r["doc_id"] for r in run_with(0.05).collect()}
    assert os.path.getmtime(stage1) != mtime
    # a looser jaccard threshold can only drop MORE docs
    assert loose <= first and len(loose) < len(first)
