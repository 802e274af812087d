"""Staged-pipeline persistence (C1) + JSONL source/sink (S1/S2) tests."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rc_rag_spark.pipeline.stages import StagedPipeline
from rc_rag_spark.queries.rag import samples_from_documents
from rc_rag_spark.sources import read_jsonl, write_jsonl, table


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="rc_rag_stage_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_staged_pipeline_reuse_and_refusion(spark, sf_dir, workdir):
    samples = samples_from_documents(spark, sf_dir, limit=30)
    sp = StagedPipeline(spark, workdir)

    dec1 = sp.infer(samples, fusion_strategy="safety")
    assert sp.has("annotated") and sp.has("decisions")
    n1 = dec1.count()
    assert n1 == 30

    # reuse: annotation stage must NOT be recomputed (cache presence)
    dec2 = sp.infer(samples, fusion_strategy="safety")
    assert dec2.count() == n1
    rows1 = {r["id"]: r["pred_decision"] for r in dec1.collect()}
    rows2 = {r["id"]: r["pred_decision"] for r in dec2.collect()}
    assert rows1 == rows2

    # re-fusion from the stage table only (entry point 3)
    refused = sp.refuse_only_refusion("safety")
    assert refused.count() == n1
    ev = sp.evaluate().collect()[0]
    assert ev["AK"] + ev["AD"] + ev["UK"] + ev["UD"] == n1


def test_jsonl_roundtrip(spark, sf_dir, workdir):
    src = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    path = f"{workdir}/docs_jsonl"
    write_jsonl(src, path, mode="overwrite")
    back = read_jsonl(spark, path, schema=src.schema)
    assert back.count() == src.count()
    a = {r["doc_id"]: (r["text"], r["lang"]) for r in src.collect()}
    b = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
    assert a == b
    # append semantics (reference S2 appends one line per record)
    write_jsonl(src.limit(5), path, mode="append")
    assert read_jsonl(spark, path, schema=src.schema).count() == src.count() + 5
