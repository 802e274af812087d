"""Corpus-construction operator tests (operators/corpus.py): property
checks against independent pure-Python references, plus the oracle
parity the driver will re-run at sf0.01."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import rc_rag_spark.queries as q
from rc_rag_spark.operators import corpus as C
from rc_rag_spark.sources import table
from tests.oracle import assert_parity


def _docs(spark):
    rows = [
        (1, "alpha beta beta gamma", "en"),
        (2, "alpha alpha delta", "en"),
        (3, "beta beta beta", "de"),
        (4, "", "de"),
        (5, "gamma delta epsilon zeta", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_q120_single_token_docs_drop_on_both_engines(spark, sf_dir):
    """Regression (r2 advice): a single-token document must produce NO
    bigram rows — Spark's sequence(1, 0) would otherwise step DOWN and
    emit two phantom NULL bigrams while DuckDB's range(1, 1) is empty.
    Fixture overrides `documents` with one-token/empty/whitespace docs
    and re-runs the full oracle parity."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="rc_rag_q120_")
    from rc_rag_spark.sources import TABLES

    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if t != "documents" and os.path.exists(src):
            os.symlink(src, os.path.join(d, f"{t}.parquet"))
    rows = [
        (1, "solo", "en"),            # single token: no bigrams
        (2, "  padded  ", "en"),      # whitespace-padded single token
        (3, "two tokens", "en"),      # exactly one bigram
        (4, "a b a b", "de"),         # repeated bigram
    ]
    import pandas as pd

    # single-file parquet (pandas) so the DuckDB side of the oracle can
    # read the same path a Spark directory-write would break
    pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).to_parquet(
        os.path.join(d, "documents.parquet")
    )
    spec = q.REGISTRY["q120_repetition_stats"]
    assert_parity(spark, "q120_repetition_stats", spec, d)
    got = {r["doc_id"]: r for r in spec.fn(spark, d).collect()}
    assert set(got) == {3, 4}  # single-token docs dropped
    assert got[4]["top_bigram_frac"] == pytest.approx(2 / 3)


def test_inverted_index_postings(spark):
    out = {
        r["token"]: r
        for r in C.inverted_index(_docs(spark)).collect()
    }
    assert out["beta"]["n_docs"] == 2
    assert out["beta"]["total_tf"] == 5
    assert out["beta"]["postings"] == "1,3"
    assert out["epsilon"]["postings"] == "5"
    assert "" not in out  # empty doc contributes nothing


def test_bm25_matches_pure_python(spark):
    docs = {
        1: "alpha beta beta gamma".split(),
        2: "alpha alpha delta".split(),
        3: "beta beta beta".split(),
        4: [],
        5: "gamma delta epsilon zeta".split(),
    }
    terms, k1, b = ["alpha", "beta"], 1.2, 0.75
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {t: sum(1 for toks in docs.values() if t in toks) for t in terms}
    expected = {}
    for d, toks in docs.items():
        score, hits = 0.0, 0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s = idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(toks) / avgdl)
            )
            score += round(s, 9)
        if hits:
            expected[d] = (hits, round(score, 6))

    got = {
        r["doc_id"]: (r["n_hits"], r["score"])
        for r in C.bm25_scores(_docs(spark), terms, k1=k1, b=b).collect()
    }
    assert got == expected


def test_tfidf_topk_rank_and_ties(spark):
    out = C.tfidf_topk_terms(_docs(spark), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == (
            list(range(1, len(rows) + 1))
        )
    # doc 3: only 'beta' (df=2) -> single keyword
    assert [r["token"] for r in by_doc[3]] == ["beta"]
    # doc 5: four distinct df=... terms; ties must break on token asc
    d5 = sorted(by_doc[5], key=lambda r: r["rank"])
    assert len(d5) == 2
    same_score = [r for r in d5 if r["tfidf"] == d5[0]["tfidf"]]
    assert [r["token"] for r in same_score] == sorted(
        r["token"] for r in same_score
    )


def test_pack_token_budget_greedy_reset(spark):
    rows = [(i, n) for i, n in enumerate([5, 5, 5, 12, 1, 9, 10])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = {
        r["doc_id"]: r["batch_id"]
        for r in C.pack_token_budget(df, 10, token_count_col="n_tokens")
        .collect()
    }
    # walk: 5 -> b0(5); +5 -> b0(10); +5 would exceed -> b1(5);
    # +12 exceeds -> b2(12, overweight alone); +1 exceeds (12+1) -> b3(1);
    # +9 -> b3(10); +10 exceeds -> b4(10)
    assert out == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 3, 6: 4}


def test_pack_token_budget_sharded_independent(spark):
    rows = [(1, "a", 8), (2, "a", 8), (3, "b", 8), (4, "b", 8)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tokens int")
    out = C.pack_token_budget(
        df, 10, token_count_col="n_tokens", shard_col="shard"
    ).collect()
    assert {(r["shard"], r["doc_id"], r["batch_id"]) for r in out} == {
        ("a", 1, 0), ("a", 2, 1), ("b", 3, 0), ("b", 4, 1)
    }


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    rates = {"en": 1.0, "de": 0.0}
    kept = C.stratified_hash_sample(d, rates, strata_col="lang")
    counts = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("en") == totals["en"]  # rate 1.0 keeps all
    assert "de" not in counts                # rate 0.0 drops all
    assert set(counts) <= {"en"}             # default_rate drops the rest
    # same inputs -> identical membership on a different partitioning
    again = C.stratified_hash_sample(
        d.repartition(7), rates, strata_col="lang"
    )
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in kept.collect()
    )


def test_stratified_sample_rejects_bad_rate(spark):
    with pytest.raises(ValueError):
        C.stratified_hash_sample(_docs(spark), {"en": 1.5})


@pytest.mark.parametrize(
    "name",
    [
        "q106_inverted_index",
        "q107_pack_batches",
        "q108_bm25_scores",
        "q109_tfidf_keywords",
        "q110_stratified_sample",
    ],
)
def test_corpus_query_oracle_parity(spark, sf_dir, name):
    assert_parity(spark, name, q.REGISTRY[name], sf_dir)


def test_chunking_covers_every_token_with_overlap(spark, sf_dir):
    """q135: stride 24 / width 32 ⇒ every token of every doc appears
    in ≥1 chunk, consecutive chunks overlap by exactly 8 tokens (when
    full), and concatenating the stride-prefixes reconstructs the
    document."""
    rows = q.REGISTRY["q135_chunk_documents"].fn(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        toks = docs[doc_id].split(" ")
        # every chunk matches the slice it claims
        rebuilt = []
        for r in chunks:
            start = r["chunk_idx"] * 24
            assert r["chunk_text"].split(" ") == toks[start:start + 32]
            rebuilt.extend(toks[start:start + 24])
        # stride-prefix concatenation covers the doc exactly
        assert rebuilt[: len(toks)] == toks


def test_fixed_size_sample_deterministic_and_bounded(spark, sf_dir):
    """q137: ≤5 docs per language, identical membership across runs."""
    run = lambda: {  # noqa: E731
        r["lang"]: r["kept_ids"]
        for r in q.REGISTRY["q137_fixed_size_sample"].fn(spark, sf_dir).collect()
    }
    a, b = run(), run()
    assert a == b
    for lang, ids in a.items():
        assert 1 <= len(ids.split(",")) <= 5
