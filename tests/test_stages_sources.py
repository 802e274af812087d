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


def test_partitioned_sink_prunes(spark, sf_dir, workdir):
    from rc_rag_spark.sources.registry import write_partitioned

    o = table(spark, sf_dir, "orders")
    path = f"{workdir}/orders_part"
    write_partitioned(o, path, ["o_orderstatus"])
    back = spark.read.parquet(path)
    assert back.count() == o.count()
    pruned = back.where(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan[:800]
    want = o.where(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == want


def test_unknown_llm_backend_raises(spark):
    import pytest as _pytest

    from rc_rag_spark.pipeline.llm import BACKENDS, llm_call

    assert set(BACKENDS) == {"mock", "echo", "openai", "vllm", "http"}
    with _pytest.raises(KeyError):
        llm_call("x", backend="nope")


def test_vllm_backend_stub_raises():
    import pytest as _pytest

    from rc_rag_spark.pipeline.llm import _vllm_chat_factory

    with _pytest.raises(NotImplementedError):
        _vllm_chat_factory("/no/model")


def test_cli_end_to_end(spark, sf_dir, workdir, capsys):
    import json as _json
    import os as _os

    from rc_rag_spark import cli
    from rc_rag_spark.queries.rag import samples_from_documents
    from rc_rag_spark.sources import write_jsonl

    samples = samples_from_documents(spark, sf_dir, limit=20).withColumnRenamed(
        "ctxs", "dense_ctxs"
    )
    samples = samples.withColumn("sparse_ctxs", F.col("dense_ctxs")).withColumn(
        "gold_ctxs", F.col("dense_ctxs")
    )
    src = f"{workdir}/samples_jsonl"
    write_jsonl(samples, src, mode="overwrite")

    wd = f"{workdir}/cli_wd"
    cli.main(["--samples", src, "--workdir", wd, "--fusion", "safety"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    ev = _json.loads(out)
    assert ev["AK"] + ev["AD"] + ev["UK"] + ev["UD"] == 20
    assert _os.path.exists(f"{wd}/inference_jsonl")
    # entry point 3: fusion-only recompute from stage tables
    cli.main(["--samples", src, "--workdir", wd, "--refusion-safety"])
    ev2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ev2["AK"] + ev2["AD"] + ev2["UK"] + ev2["UD"] == 20


def test_stage_cache_param_mismatch_raises(spark, sf_dir, workdir):
    import pytest as _pytest

    samples = samples_from_documents(spark, sf_dir, limit=10)
    sp = StagedPipeline(spark, workdir)
    sp.infer(samples, fusion_strategy="safety")
    with _pytest.raises(ValueError, match="computed with"):
        sp.infer(samples, fusion_strategy="probability")
    # force recomputes and updates the fingerprint
    out = sp.infer(samples, fusion_strategy="probability", force=True)
    assert out.count() == 10


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    """CSV sink → schema'd CSV scan reproduces values and types for a
    mixed-type projection (strings with commas get quoted)."""
    from rc_rag_spark.sources import read_csv, write_csv

    src = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .limit(50)
    )
    path = str(tmp_path / "orders_csv")
    write_csv(src, path)
    back = read_csv(spark, path, schema=src.schema)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from rc_rag_spark.sources import read_orc, table, write_orc

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = str(tmp_path / "docs_orc")
    write_orc(d, path)
    back = read_orc(spark, path)
    assert back.schema == d.schema
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in d.collect()
    )


def test_overwrite_changed_partitions(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite: rewriting one partition's data must
    not touch sibling partitions."""
    from pyspark.sql import functions as F

    from rc_rag_spark.sources import overwrite_changed_partitions, table

    path = str(tmp_path / "events_by_type")
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    overwrite_changed_partitions(ev, path, ["event_type"])
    before = spark.read.parquet(path)
    n_total = before.count()
    n_click = before.where(F.col("event_type") == "click").count()

    # reprocess ONLY the click partition: halve its rows
    clicks_half = (
        table(spark, sf_dir, "events")
        .where((F.col("event_type") == "click") & (F.col("event_id") % 2 == 0))
        .select("event_id", "event_type", "value")
    )
    n_half = clicks_half.count()
    overwrite_changed_partitions(clicks_half, path, ["event_type"])

    after = spark.read.parquet(path)
    assert after.where(F.col("event_type") == "click").count() == n_half
    # every other partition untouched
    assert after.count() == n_total - n_click + n_half


def test_jsonl_malformed_line_policies(spark, tmp_path):
    """A corrupt line in a JSONL input must follow the declared
    policy: PERMISSIVE quarantines it in the corrupt column,
    DROPMALFORMED drops it, FAILFAST raises."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from rc_rag_spark.sources import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "text": "ok"}\n'
        "{broken json line\n"
        '{"id": 2, "text": "also ok"}\n'
    )
    schema = "id bigint, text string, _bad string"

    perm = read_jsonl(
        spark, str(p), schema=schema, corrupt_column="_bad"
    ).collect()
    assert len(perm) == 3
    bad = [r for r in perm if r["_bad"] is not None]
    assert len(bad) == 1 and bad[0]["id"] is None
    assert "{broken" in bad[0]["_bad"]

    dropped = read_jsonl(
        spark, str(p), schema="id bigint, text string",
        mode="DROPMALFORMED",
    ).collect()
    assert sorted(r["id"] for r in dropped) == [1, 2]

    with pytest.raises((PySparkException, Py4JJavaError)):
        read_jsonl(
            spark, str(p), schema="id bigint, text string",
            mode="FAILFAST",
        ).collect()


def test_file_metadata_columns_multifile(spark, sf_dir, tmp_path):
    """Hidden `_metadata` columns over a MULTI-file table (the case
    q236's single-file oracle can't express): file_name distributes
    rows across the part files it names, and row_index is a dense
    0..n_i-1 range WITHIN each file — the per-file lineage a curation
    pipeline uses to attribute rows back to shards."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "multi")
    table(spark, sf_dir, "orders").repartition(4).write.parquet(d)
    df = spark.read.parquet(d)
    per_file = (
        df.select(
            F.col("_metadata.file_name").alias("fn"),
            F.col("_metadata.row_index").alias("ri"),
        )
        .groupBy("fn")
        .agg(
            F.count("*").alias("n"),
            F.min("ri").alias("lo"),
            F.max("ri").alias("hi"),
            F.countDistinct("ri").alias("n_distinct"),
        )
        .collect()
    )
    assert len(per_file) == 4
    total = 0
    for r in per_file:
        # dense per-file range [0, n)
        assert (r["lo"], r["hi"], r["n_distinct"]) == (0, r["n"] - 1, r["n"])
        assert r["fn"].endswith(".parquet")
        total += r["n"]
    assert total == table(spark, sf_dir, "orders").count()
