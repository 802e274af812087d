"""Semantic guarantees of the semantic-dedup batch (q175/q176/q177)
beyond DuckDB hash parity: SemDeDup removes the planted copies and
never an original, the prefix filter is lossless vs a pure-Python
brute force, and the bigram LM drops bigram-less docs with exact
per-doc bigram counts."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

import rc_rag_spark.queries as q


def test_semdedup_removes_planted_copies(spark, sf_dir):
    out = q.REGISTRY["q175_semdedup"].fn(spark, sf_dir).collect()
    by_id = {r.vec_id: r for r in out}
    n_orig = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    n_planted = len([v for v in by_id if v >= 100_000])
    # every corpus member appears exactly once with a 0/1 keep flag
    assert len(out) == n_orig + n_planted
    assert all(r.kept in (0, 1) for r in out)
    # no original is ever removed: random 64-dim pairs never reach
    # cosine 0.95, so the only pairs are (source, planted copy) and
    # the greedy keeps the smaller id — the source.
    assert all(r.kept == 1 for r in out if r.vec_id < 100_000)
    # a planted copy is removed whenever it landed in its source's
    # cluster (the 1.002 scaling can flip a borderline assignment;
    # those escapes are the documented SemDeDup recall trade-off)
    removed = {v for v, r in by_id.items() if r.kept == 0}
    expected = {
        v
        for v in by_id
        if v >= 100_000 and by_id[v].cid == by_id[v - 100_000].cid
    }
    assert removed == expected
    # and the overwhelming majority of copies do land with their source
    assert len(expected) >= 0.8 * n_planted


def test_prefix_filter_matches_python_bruteforce(spark, sf_dir):
    """Independent losslessness check: recompute the planted corpus and
    ALL-pairs shingle Jaccard in pure Python; the prefix-filtered
    engine result must be the identical pair set (no false negatives
    from the filter, no false positives from the verify)."""
    from tests.golden_ref import TOKEN_RE

    rows = q.REGISTRY["q176_prefix_filter_jaccard"].fn(spark, sf_dir).collect()
    got = {(r.id_a, r.id_b): (r.inter_size, r.union_size) for r in rows}

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    corpus = {}
    for _, row in docs.iterrows():
        corpus[row.doc_id] = row.text
        if row.doc_id % 20 == 0:
            words = row.text.split(" ")
            corpus[row.doc_id + 1_000_000] = " ".join(
                words[: max(len(words) - 2, 1)]
            )

    def shingles(text):
        tk = [m.group() for m in TOKEN_RE.finditer(text.lower())]
        return {
            " ".join(tk[i : i + 3]) for i in range(len(tk) - 2)
        }

    sets = {i: shingles(t) for i, t in corpus.items()}
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if u and 5 * c >= 4 * u:
                want[(a, b)] = (c, u)
    assert got == want
    assert want, "fixture must produce at least one qualifying pair"


def test_bigram_surprisal_counts_and_drops(spark, sf_dir):
    out = q.REGISTRY["q177_bigram_surprisal"].fn(spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in out}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for _, row in docs.iterrows():
        toks = row.text.strip().split()
        if len(toks) >= 2:
            assert by_id[row.doc_id].n_bigrams == len(toks) - 1
            assert by_id[row.doc_id].mean_nll > 0
        else:
            assert row.doc_id not in by_id
    # add-one smoothing upper bound: p <= c12+1 over c1+V with V >= 1
    # implies every mean_nll is finite
    assert all(math.isfinite(r.mean_nll) for r in out)


def test_pq_codes_invariants(spark, sf_dir):
    out = q.REGISTRY["q178_pq_codes"].fn(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(out) == n_vecs
    by_id = {r.vec_id: r for r in out}
    for r in out:
        assert all(
            getattr(r, f"code_{s}") in range(4) for s in range(4)
        )
        assert r.sq_err >= 0
    # each codebook seed reconstructs itself exactly: own code in
    # every subspace, zero error
    for seed in range(4):
        r = by_id[seed]
        assert [r.code_0, r.code_1, r.code_2, r.code_3] == [seed] * 4
        assert r.sq_err == 0.0


def test_srp_planted_copies_at_hamming_zero(spark, sf_dir):
    rows = q.REGISTRY["q179_srp_signatures"].fn(spark, sf_dir).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in rows}
    assert all(h <= 3 for h in pairs.values())
    # positive scaling never flips a projection sign, so every planted
    # copy sits at Hamming 0 from its source
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    planted = [v for v in range(0, n_vecs, 25)]
    assert planted
    for src in planted:
        assert pairs[(src, src + 100_000)] == 0


def test_cluster_balanced_sample_rate(spark, sf_dir):
    kept = q.REGISTRY["q180_cluster_balanced_sample"].fn(spark, sf_dir)
    kept_rows = kept.collect()
    # keep decision is per-row deterministic: kept set is a subset of
    # the corpus and stable across runs
    again = {
        (r.vec_id, r.cid)
        for r in q.REGISTRY["q180_cluster_balanced_sample"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert {(r.vec_id, r.cid) for r in kept_rows} == again
    # a cluster smaller than the target keeps every member (rate >= 1);
    # at sf0.001 all 4 clusters are under the target of 40
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    if n_vecs <= 4 * 40:
        assert len(kept_rows) == n_vecs


def test_choose_k_scales_with_corpus():
    from rc_rag_spark.operators.semdedup import choose_k

    assert choose_k(100, 512) == 1
    assert choose_k(512, 512) == 1
    assert choose_k(513, 512) == 2
    assert choose_k(1_000_000, 512) == 1954
    # expected cluster size stays ~target as n grows 100x
    assert abs(1_000_000 / choose_k(1_000_000, 512) - 512) < 1


def test_semdedup_operator_mega_cluster_split(spark):
    """A planted mega-cluster (every vector near-identical -> one
    k-means cell) must split into ceil(size/cap) salted sub-buckets,
    bounding the quadratic pair stage; within each bucket only the
    smallest id survives."""
    import numpy as np

    from rc_rag_spark.operators.semdedup import semdedup

    rng = np.random.RandomState(7)
    base = rng.rand(64)
    rows = [
        (i, (base * (1.0 + 0.0001 * (i % 5))).tolist()) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = semdedup(
        df, id_col="vec_id", vec_col="v", k=1, max_cluster_size=100
    ).collect()
    assert len(out) == 600
    salts = {r.salt for r in out}
    assert salts == set(range(6))  # ceil(600/100) buckets
    per_bucket = {}
    for r in out:
        per_bucket.setdefault(r.salt, []).append(r)
    for salt, members in per_bucket.items():
        # positive-scaled copies: cosine == 1 -> exactly one survivor
        # per bucket, the smallest id (the cross-bucket misses are the
        # documented recall trade of the cap)
        kept = [r.vec_id for r in members if r.kept == 1]
        assert kept == [min(r.vec_id for r in members)], salt
        assert len(members) <= 130  # hash variance stays near cap


def test_semdedup_operator_no_split_below_cap(spark):
    """Distinct random vectors in small clusters: nothing splits
    (salt==0 everywhere), nothing is removed."""
    import numpy as np

    from rc_rag_spark.operators.semdedup import semdedup

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(16).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = semdedup(
        df, id_col="vec_id", vec_col="v",
        target_cluster_size=40, max_cluster_size=100,
    ).collect()
    assert len(out) == 80
    assert all(r.salt == 0 for r in out)
    assert all(r.kept == 1 for r in out)
    # auto-k: ceil(80/40) = 2 clusters, both represented
    assert {r.cid for r in out} <= {0, 1}


def test_semdedup_bit_exact_matches_fast_path(spark):
    """The rounded-int oracle kernel and the plain-matmul fast path
    agree on well-separated data (everything far from the 0.95
    boundary)."""
    import numpy as np

    from rc_rag_spark.operators.semdedup import semdedup

    rng = np.random.RandomState(3)
    originals = [(i, rng.randn(32).tolist()) for i in range(60)]
    copies = [(1000 + i, [x * 1.01 for x in v]) for i, v in originals[:15]]
    df = spark.createDataFrame(
        originals + copies, "vec_id long, v array<double>"
    )
    kw = dict(id_col="vec_id", vec_col="v", k=1, max_cluster_size=1000)
    a = {(r.vec_id, r.kept) for r in semdedup(df, bit_exact=True, **kw).collect()}
    b = {(r.vec_id, r.kept) for r in semdedup(df, bit_exact=False, **kw).collect()}
    assert a == b
    assert {v for v, kept in a if kept == 0} == {1000 + i for i in range(15)}


def test_semdedup_seed_broadcast_budget(spark):
    """The seed collect+broadcast is k·d·8 bytes and grows with the
    corpus; past the stated budget it must raise (toward a larger
    target_cluster_size or hierarchical seeding) instead of shipping
    gigabytes through the driver."""
    import numpy as np
    import pytest

    from rc_rag_spark.operators.semdedup import semdedup

    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(16).tolist()) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    # target=4 -> k=16 seeds of dim 16 = 2048 bytes > a 1 KB budget
    with pytest.raises(ValueError, match="max_seed_broadcast_bytes"):
        semdedup(
            df, id_col="vec_id", vec_col="v", target_cluster_size=4,
            max_seed_broadcast_bytes=1024,
        )
    # raising the budget explicitly re-enables the run
    out = semdedup(
        df, id_col="vec_id", vec_col="v", target_cluster_size=4,
        max_seed_broadcast_bytes=1 << 20,
    ).collect()
    assert len(out) == 64


def test_semdedup_hierarchical_removes_planted_copies(spark):
    """Two-level seeding must still remove planted near-copies that
    land in their source's leaf cluster, and never an original."""
    import numpy as np

    from rc_rag_spark.operators.semdedup import semdedup_hierarchical

    rng = np.random.RandomState(11)
    originals = [(i, rng.randn(24).tolist()) for i in range(120)]
    copies = [(1000 + i, [x * 1.01 for x in v]) for i, v in originals[:30]]
    df = spark.createDataFrame(
        originals + copies, "vec_id long, v array<double>"
    )
    out = semdedup_hierarchical(
        df, id_col="vec_id", vec_col="v",
        target_cluster_size=10, super_factor=4,  # super target 40 -> 4 cells
    ).collect()
    assert len(out) == 150  # every member exactly once
    assert all(r.kept in (0, 1) for r in out)
    by_id = {r.vec_id: r for r in out}
    # random 24-dim originals never reach cosine 0.95 of each other
    assert all(r.kept == 1 for r in out if r.vec_id < 1000)
    # a copy is removed iff it landed in its source's leaf bucket
    leaf = lambda r: (r.scell, r.ssalt, r.cid, r.salt)  # noqa: E731
    removed = {v for v, r in by_id.items() if r.kept == 0}
    expected = {
        v for v in by_id
        if v >= 1000 and leaf(by_id[v]) == leaf(by_id[v - 1000])
    }
    assert removed == expected
    # and the overwhelming majority of copies do land with their source
    assert len(expected) >= 0.8 * 30


def test_semdedup_hierarchical_fits_budget_where_flat_raises():
    """The point of the hierarchy: with the same broadcast budget, the
    flat operator must raise (k seeds over budget) while the
    hierarchical one runs (only m = k/super_factor super-seeds are
    broadcast)."""
    import numpy as np
    import pytest

    from rc_rag_spark.operators.semdedup import (
        semdedup,
        semdedup_hierarchical,
    )
    from rc_rag_spark.session import build_session

    spark = build_session(app_name="hier-budget")
    rng = np.random.RandomState(13)
    rows = [(i, rng.randn(16).tolist()) for i in range(256)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    # flat: k = ceil(256/4) = 64 seeds x 16 dims x 8 B = 8192 B > 4 KB
    budget = 4096
    with pytest.raises(ValueError, match="max_seed_broadcast_bytes"):
        semdedup(
            df, id_col="vec_id", vec_col="v", target_cluster_size=4,
            max_seed_broadcast_bytes=budget,
        )
    # hierarchical: m = ceil(256/(16*4)) = 4 super-seeds = 512 B, fits
    out = semdedup_hierarchical(
        df, id_col="vec_id", vec_col="v", target_cluster_size=4,
        super_factor=16, max_seed_broadcast_bytes=budget,
    ).collect()
    assert len(out) == 256
    # leaf clusters honor the auto-k shape: >= number of super-cells
    assert len({(r.scell, r.ssalt, r.cid) for r in out}) >= 4


def test_semdedup_hierarchical_super_cell_split(spark):
    """A super-cell past max_super_size must split into md5-salted
    ssalt sub-buckets (bounding level-2 task memory), with every
    member still labeled exactly once."""
    import numpy as np

    from rc_rag_spark.operators.semdedup import semdedup_hierarchical

    rng = np.random.RandomState(17)
    rows = [(i, rng.randn(8).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = semdedup_hierarchical(
        df, id_col="vec_id", vec_col="v",
        target_cluster_size=5, super_factor=8,  # super target 40
        max_super_size=25,  # force ceil(size/25) sub-buckets
    ).collect()
    assert len(out) == 200
    assert len({r.vec_id for r in out}) == 200
    assert max(r.ssalt for r in out) > 0
    # every (scell, ssalt) bucket respects the cap
    from collections import Counter

    sizes = Counter((r.scell, r.ssalt) for r in out)
    assert max(sizes.values()) <= 25 + 5  # salt is hash-balanced, small slack
