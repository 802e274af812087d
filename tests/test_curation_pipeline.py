"""CurationPipeline (pipeline/curation.py): chained operators must
equal composing them by hand, stages must resume from disk, parameter
changes must invalidate (with cascade), and the URL stages must be
membership-equivalent to the q284 funnel's own window formulations.

(Restored as its own file after the r10 rewrite of test_curation.py
replaced these with the q275-q284 query-family tests — the pipeline
is a live shipped module and needs its regression coverage.)
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

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
    stage0 = os.path.join(workdir, "00_exact_dedup", "_SUCCESS")
    mtime = os.path.getmtime(stage0)
    time.sleep(0.05)
    second = {r["doc_id"] for r in build().run(docs).collect()}
    assert second == first
    assert os.path.getmtime(stage0) == mtime  # stage not rewritten


def test_pipeline_invalidates_on_param_change(spark, sf_dir, workdir):
    """Re-running with different step parameters must recompute the
    stage (and cascade), never serve the stale-parameter table."""
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
    time.sleep(0.05)
    # different threshold -> manifest mismatch -> stage recomputed
    loose = {r["doc_id"] for r in run_with(0.05).collect()}
    assert os.path.getmtime(stage1) != mtime
    # a looser jaccard threshold can only drop MORE docs
    assert loose <= first and len(loose) < len(first)


# --- URL stages (round-11: the q277-q282 family as resumable stages) --


def _docs_with_urls(spark, sf_dir):
    from rc_rag_spark.queries.curation import _URL_EXPR

    return table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.expr(_URL_EXPR).alias("url")
    )


def test_url_stages_match_q284_funnel(spark, sf_dir, workdir):
    """The resumable url_canonical_dedup -> domain_quota stages must
    reproduce the q284 funnel's per-source n_dedup / n_quota counts
    EXACTLY — same canonical form, same PSL matching, same md5-ordered
    quota — so the production pipeline and the hash-checked funnel
    query can never drift apart."""
    import rc_rag_spark.queries as q
    from rc_rag_spark.queries.curation import _Q282_QUOTA

    docs = _docs_with_urls(spark, sf_dir)
    pipe = (
        CurationPipeline(spark, workdir)
        .url_canonical_dedup()
        .domain_quota(max_per_domain=_Q282_QUOTA)
    )
    pipe.run(docs)

    def per_source(path):
        return {
            r["source"]: r["n"]
            for r in spark.read.parquet(os.path.join(workdir, path))
            .groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    funnel = {
        r["source"]: (r["n_dedup"], r["n_quota"])
        for r in q.REGISTRY["q284_crawl_curation_funnel"]
        .fn(spark, sf_dir)
        .collect()
    }
    dedup_counts = per_source("00_url_canonical_dedup")
    quota_counts = per_source("01_domain_quota")
    assert dedup_counts == {s: v[0] for s, v in funnel.items()}
    assert quota_counts == {s: v[1] for s, v in funnel.items()}


def test_url_blocklist_stage_matches_inline_antijoin(spark, sf_dir, workdir):
    """The blocklist stage's kept set must equal the q279-style
    registrable-domain anti-join composed by hand, and a stage with an
    empty blocklist must be the identity."""
    from rc_rag_spark.queries.curation import (
        _BLOCKLIST,
        _with_registrable,
        parse_urls,
    )

    docs = _docs_with_urls(spark, sf_dir)
    pipe = CurationPipeline(spark, workdir).url_blocklist(list(_BLOCKLIST))
    got = {r["doc_id"] for r in pipe.run(docs).select("doc_id").collect()}

    reg = _with_registrable(parse_urls(docs.select("doc_id", "url")))
    bl = spark.createDataFrame(
        [(s,) for s in _BLOCKLIST], "registrable string"
    )
    want = {
        r["doc_id"]
        for r in reg.join(F.broadcast(bl), "registrable", "left_anti")
        .select("doc_id")
        .collect()
    }
    assert got == want
    assert 0 < len(got) < docs.count()  # the blocklist actually bites

    pipe2 = CurationPipeline(spark, workdir + "_id").url_blocklist([])
    assert pipe2.run(docs).count() == docs.count()
    shutil.rmtree(workdir + "_id", ignore_errors=True)


def test_url_stage_params_invalidate(spark, sf_dir, workdir):
    """Changing the quota K must recompute the stage — the manifest
    records max_per_domain, so a stale K=3 table can never serve a
    K=1 run. (After canonical dedup the fixture corpus holds one doc
    per domain, so same-domain distinct-path variants are planted to
    make the quota bite.)"""
    base = _docs_with_urls(spark, sf_dir)

    def variant(shift):
        return base.where(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + shift).alias("doc_id"),
            "source", "text",
            F.concat(
                "url", F.lit(f"/v{shift}"),
            ).alias("url"),
        )

    docs = base.unionByName(variant(3_000_000)).unionByName(
        variant(4_000_000)
    )

    def run_with(k):
        return (
            CurationPipeline(spark, workdir)
            .url_canonical_dedup()
            .domain_quota(max_per_domain=k)
            .run(docs)
        )

    n3 = run_with(3).count()
    stage1 = os.path.join(workdir, "01_domain_quota", "_SUCCESS")
    mtime = os.path.getmtime(stage1)
    time.sleep(0.05)
    n1 = run_with(1).count()
    assert os.path.getmtime(stage1) != mtime  # stage recomputed
    assert n1 < n3


def test_url_stages_pass_null_and_unparseable_urls_through(
    spark, sf_dir, workdir
):
    """Docs whose URL is NULL or unparseable must NOT be silently
    dropped (ADVICE r11: canonical_url_col's concat yields NULL for
    them, and groupBy(canonical) used to collapse ALL of them into
    one group keeping only min(id); domain_quota's NULL registrable
    pseudo-domain likewise capped them at K). Both stages now key on
    per-doc sentinels for NULL, so every such doc survives."""
    junk_ids = {9_000_001, 9_000_002, 9_000_003, 9_000_004, 9_000_005}
    junk = spark.createDataFrame(
        [
            (9_000_001, "junk", "text a", None),
            (9_000_002, "junk", "text b", None),
            (9_000_003, "junk", "text c", "not a url at all"),
            (9_000_004, "junk", "text d", "http://:bad:port/::"),
            (9_000_005, "junk", "text e", "also spaces here"),
        ],
        "doc_id bigint, source string, text string, url string",
    )
    docs = _docs_with_urls(spark, sf_dir).unionByName(junk)

    # the junk really is unparseable: canonical comes out NULL
    from rc_rag_spark.queries.curation import canonical_url_col, parse_urls

    canon = (
        parse_urls(junk.select("doc_id", "url"))
        .select("doc_id", canonical_url_col())
        .collect()
    )
    assert all(r["canonical"] is None for r in canon)

    kept = (
        CurationPipeline(spark, workdir)
        .url_canonical_dedup()
        .domain_quota(max_per_domain=1)
        .run(docs)
    )
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert junk_ids <= kept_ids, (
        f"unparseable-URL docs dropped: {sorted(junk_ids - kept_ids)}"
    )
    # and the blocklist stage (NULL registrable never equi-matches)
    # is likewise a pass-through for them
    kept_bl = (
        CurationPipeline(spark, workdir + "_bl")
        .url_blocklist(["evil.example"])
        .run(docs)
    )
    bl_ids = {r["doc_id"] for r in kept_bl.select("doc_id").collect()}
    assert junk_ids <= bl_ids
    shutil.rmtree(workdir + "_bl", ignore_errors=True)


def test_funnel_and_pipeline_agree_on_dirty_urls(spark, sf_dir, workdir):
    """ADVICE r12: the query corpus and the resumable pipeline must
    give the SAME answer on exactly the dirty input the sentinel
    semantics exist for. Drives q284's own factored URL stages
    (funnel_url_stages — the code the registered funnel query runs)
    and the pipeline's url_canonical_dedup -> domain_quota stages over
    fixture docs + NULL-URL + unparseable-URL + duplicate-junk rows,
    and asserts doc_id-set equality stage by stage (stronger than the
    per-source counts the clean-input test checks)."""
    from rc_rag_spark.queries.curation import (
        _Q282_QUOTA,
        canonical_url_col,
        funnel_url_stages,
        parse_urls,
    )

    junk = spark.createDataFrame(
        [
            # NULL urls
            (9_000_001, "junk", None),
            (9_000_002, "junk", None),
            # unparseable urls (try_parse_url -> NULL host)
            (9_000_003, "junk", "not a url at all"),
            (9_000_004, "junk", "http://:bad:port/::"),
            (9_000_005, "junk", "also spaces here"),
            # an unparseable TEXT-duplicate pair: same garbage string
            # twice — sentinel keying must keep BOTH (per-doc key),
            # where the old NULL-group semantics kept only the min id
            (9_000_006, "junk", "dup garbage ::"),
            (9_000_007, "junk", "dup garbage ::"),
        ],
        "doc_id bigint, source string, url string",
    )
    docs = (
        _docs_with_urls(spark, sf_dir)
        .select("doc_id", "source", "url")
        .unionByName(junk)
    )
    junk_ids = {r["doc_id"] for r in junk.collect()}

    # all junk really is canonical-NULL (the sentinel branch)
    canon = (
        parse_urls(junk.select("doc_id", "url"))
        .select("doc_id", canonical_url_col())
        .collect()
    )
    assert all(r["canonical"] is None for r in canon)

    q_dedup, q_quota = funnel_url_stages(docs)
    q_dedup_ids = {r["doc_id"] for r in q_dedup.select("doc_id").collect()}
    q_quota_ids = {r["doc_id"] for r in q_quota.select("doc_id").collect()}

    pipe = (
        CurationPipeline(spark, workdir)
        .url_canonical_dedup()
        .domain_quota(max_per_domain=_Q282_QUOTA)
    )
    pipe.run(docs)

    def stage_ids(path):
        return {
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(workdir, path))
            .select("doc_id")
            .collect()
        }

    p_dedup_ids = stage_ids("00_url_canonical_dedup")
    p_quota_ids = stage_ids("01_domain_quota")

    assert q_dedup_ids == p_dedup_ids
    assert q_quota_ids == p_quota_ids
    # and the unified semantic itself: every junk doc survives both
    # stages on both surfaces (per-doc sentinel keys)
    assert junk_ids <= q_quota_ids


# --- chaos-resume (VERDICT r13 #8): crash inside each URL stage ------


from rc_rag_spark.queries.curation import _BLOCKLIST as _BL


def _url_pipeline(spark, workdir):
    return (
        CurationPipeline(spark, workdir)
        .url_canonical_dedup()
        .url_blocklist(list(_BL))
        .domain_quota(max_per_domain=50)
    )


def test_pipeline_resumes_after_mid_write_task_crash(
    spark, sf_dir, workdir
):
    """A REAL mid-write kill: a flag-gated UDF in the input lineage
    raises inside the stage-0 write job's tasks (Spark's committer
    leaves a stage directory with no _SUCCESS), the run() call dies,
    and the RESUMED run — same pipeline, same logical input, flag
    cleared — must recompute the dead stage, reuse nothing stale, and
    produce EXACTLY the clean-workdir baseline: same kept doc_ids,
    same attrition report (no duplicated, no lost rows)."""
    from pyspark.sql.functions import udf

    flag = os.path.join(workdir, "poison_flag")
    with open(flag, "w") as fh:
        fh.write("armed")

    @udf("long")
    def poison(doc_id):
        import os as _os

        if _os.path.exists(flag):
            raise RuntimeError("injected mid-write crash")
        return doc_id

    docs = _docs_with_urls(spark, sf_dir)
    poisoned = docs.where(poison(F.col("doc_id")) >= 0)

    stage_dir = os.path.join(workdir, "pipe", "00_url_canonical_dedup")
    with pytest.raises(Exception, match="injected mid-write crash"):
        _url_pipeline(spark, os.path.join(workdir, "pipe")).run(poisoned)
    assert not os.path.exists(os.path.join(stage_dir, "_SUCCESS"))

    os.unlink(flag)  # the "restart": the fault condition is gone
    resumed = _url_pipeline(spark, os.path.join(workdir, "pipe"))
    got = {r["doc_id"] for r in resumed.run(poisoned).collect()}

    baseline = _url_pipeline(spark, os.path.join(workdir, "base"))
    want = {r["doc_id"] for r in baseline.run(docs).collect()}
    assert got == want
    assert resumed.report() == baseline.report()


@pytest.mark.parametrize("crash_stage", [0, 1, 2])
@pytest.mark.parametrize("window", ["mid_parquet", "pre_manifest",
                                    "torn_manifest"])
def test_pipeline_resume_after_each_crash_window(
    spark, sf_dir, workdir, crash_stage, window
):
    """Every resumable URL stage x every crash window of run()'s
    write-then-publish sequence:

      - mid_parquet:   stage dir left WITHOUT _SUCCESS and with a
                       partial file set (one committed part deleted,
                       as a mid-write crash leaves);
      - pre_manifest:  parquet complete (_SUCCESS present) but the
                       params manifest never written;
      - torn_manifest: the manifest create() started and died —
                       truncated JSON on disk.

    The resumed run must recompute the crashed stage AND everything
    after it (stale-cascade), reuse the stages before it untouched,
    and reproduce the clean run's membership and attrition exactly."""
    import glob as _glob
    import json as _json

    docs = _docs_with_urls(spark, sf_dir)
    names = ["00_url_canonical_dedup", "01_url_blocklist",
             "02_domain_quota"]

    clean = _url_pipeline(spark, workdir)
    want = {r["doc_id"] for r in clean.run(docs).collect()}
    want_report = clean.report()

    sdir = os.path.join(workdir, names[crash_stage])
    manifest = sdir + "_params.json"
    if window == "mid_parquet":
        os.unlink(os.path.join(sdir, "_SUCCESS"))
        parts = sorted(_glob.glob(os.path.join(sdir, "part-*")))
        os.unlink(parts[0])  # stranded-partial shape
    elif window == "pre_manifest":
        os.unlink(manifest)
    else:
        full = _json.dumps({"x": 1})
        with open(manifest, "w") as fh:
            fh.write(full[: len(full) // 2])

    before = {
        n: os.path.getmtime(os.path.join(workdir, n, "_SUCCESS"))
        for n in names[:crash_stage]
    }
    time.sleep(0.05)

    resumed = _url_pipeline(spark, workdir)
    got = {r["doc_id"] for r in resumed.run(docs).collect()}
    assert got == want
    # attrition: identical counts for every stage from the crashed one
    # on; upstream stages are resumed so their rows_in may be None
    assert [r[2] for r in resumed.report()] == [
        r[2] for r in want_report
    ]
    # crashed stage recomputed...
    assert os.path.exists(os.path.join(sdir, "_SUCCESS"))
    with open(manifest) as fh:
        _json.load(fh)  # manifest is whole again
    # ...and the stages BEFORE it were reused, not rewritten
    for n, mt in before.items():
        assert os.path.getmtime(
            os.path.join(workdir, n, "_SUCCESS")
        ) == mt, f"upstream stage {n} was needlessly recomputed"
