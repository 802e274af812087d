"""Semantic guarantees of the scale-batch queries (q169/q170/q171)
beyond the DuckDB hash parity that test_oracle_parity already runs:
k-means invariants and partition-independence, the count-min
overestimate bound, and Morton-key bijectivity / bounding-box
containment."""

from __future__ import annotations

from pyspark.sql import functions as F

import rc_rag_spark.queries as q
from rc_rag_spark.queries.scale_batch import _KM_K, _Z_BITS


def test_kmeans_invariants(spark, sf_dir):
    out = q.REGISTRY["q169_kmeans_embeddings"].fn(spark, sf_dir).collect()
    cids = {r.cid for r in out}
    assert cids == set(range(_KM_K))
    # one centroid coordinate per (cid, pos); 64-dim embeddings
    assert len(out) == _KM_K * 64
    # every vector is assigned exactly once: sizes sum to corpus size
    n_vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    sizes = {r.cid: r.n_members for r in out}
    assert sum(sizes.values()) == n_vecs
    # centroids are finite and quantized to 9 decimals
    for r in out:
        assert r.centroid == round(r.centroid, 9)


def test_kmeans_partition_independent(spark, sf_dir):
    """Repartitioning the input must not change a single assignment or
    centroid bit — the DECIMAL quantization discipline is load-bearing."""
    base = sorted(
        map(tuple, q.REGISTRY["q169_kmeans_embeddings"].fn(spark, sf_dir).collect())
    )
    import rc_rag_spark.queries.scale_batch as sb
    orig_table = sb.table

    def shuffled_table(spark_, sf_dir_, name):
        df = orig_table(spark_, sf_dir_, name)
        return df.repartition(13) if name == "embeddings" else df

    sb.table = shuffled_table
    try:
        alt = sorted(
            map(tuple, q.REGISTRY["q169_kmeans_embeddings"].fn(spark, sf_dir).collect())
        )
    finally:
        sb.table = orig_table
    assert base == alt


def test_countmin_overestimate_bound(spark, sf_dir):
    rows = q.REGISTRY["q170_countmin_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        # count-min never underestimates
        assert r.cms_est >= r.true_cnt
        assert r.overcount == r.cms_est - r.true_cnt
        assert r.overcount >= 0


def test_bpe_matches_pure_python_golden(spark, sf_dir):
    """The distributed windowed BPE must agree step-for-step with a
    sequential pure-Python greedy BPE over the same vocabulary."""
    import re
    from collections import Counter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    words = Counter()
    for r in docs:
        for t in re.split(r"\s+", r.text.lower()):
            if t:
                words[t] += 1

    def golden_merges(words, steps):
        seqs = {w: list(w) for w in words}
        out = []
        for _ in range(steps):
            pc = Counter()
            for w, syms in seqs.items():
                wc = words[w]
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += wc
            (l, r), cnt = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((l, r, cnt))
            for w, syms in seqs.items():
                ns, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == l
                        and syms[i + 1] == r
                    ):
                        ns.append(l + r)
                        i += 2
                    else:
                        ns.append(syms[i])
                        i += 1
                seqs[w] = ns
        return out

    expect = golden_merges(words, 3)
    got = sorted(
        q.REGISTRY["q172_bpe_merges"].fn(spark, sf_dir).collect(),
        key=lambda r: r.step,
    )
    assert [
        (r.left_sym, r.right_sym, r.pair_count) for r in got
    ] == expect


def test_bloom_no_false_negatives(spark, sf_dir):
    rows = q.REGISTRY["q173_bloom_membership"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.actually_present:
            # a bloom filter can overclaim, never underclaim
            assert r.bloom_maybe


def test_scalar_quantization_error_bound(spark, sf_dir):
    """Midpoint decoding bounds per-coordinate error by half a cell, so
    per-vector MSE is bounded by max_dim_range^2 / (4 * 256^2)."""
    from pyspark.sql import functions as FF

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = e.select(
        FF.posexplode(FF.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        )
    )
    spans = (
        x.groupBy("pos")
        .agg((FF.max("x") - FF.min("x")).alias("span"))
        .agg(FF.max("span"))
        .collect()[0][0]
    )
    bound = (spans / 256.0) ** 2 / 4.0 + 1e-12
    rows = q.REGISTRY["q174_scalar_quantization"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mse <= bound


def test_morton_bijective():
    """Interleave then deinterleave recovers both bucket ranks for the
    full 8-bit x 8-bit key space."""
    def interleave(b1, b2):
        m = 0
        for i in range(_Z_BITS):
            m += ((b1 >> i) & 1) << (2 * i + 1)
            m += ((b2 >> i) & 1) << (2 * i)
        return m

    def deinterleave(m):
        b1 = b2 = 0
        for i in range(_Z_BITS):
            b1 |= ((m >> (2 * i + 1)) & 1) << i
            b2 |= ((m >> (2 * i)) & 1) << i
        return b1, b2

    seen = set()
    for b1 in range(0, 256, 17):
        for b2 in range(0, 256, 13):
            m = interleave(b1, b2)
            assert 0 <= m < 65536
            assert deinterleave(m) == (b1, b2)
            seen.add(m)
    assert len(seen) == len(range(0, 256, 17)) * len(range(0, 256, 13))


def test_zorder_boxes_cover_all_rows(spark, sf_dir):
    out = q.REGISTRY["q171_zorder_layout"].fn(spark, sf_dir)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    total = li.count()
    agg = out.agg(
        F.sum("n_rows").alias("n"),
        F.min("min_pk").alias("mnp"),
        F.max("max_pk").alias("mxp"),
    ).collect()[0]
    assert agg.n == total
    pk = li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
    assert agg.mnp == pk[0] and agg.mxp == pk[1]
    # the Z-order signature: per-file boxes are (much) tighter than the
    # global range on BOTH dimensions for the median file
    rows = out.collect()
    if len(rows) >= 8:
        pk_range = pk[1] - pk[0] + 1
        spans = sorted(r.pk_span for r in rows)
        assert spans[len(spans) // 2] < pk_range * 0.6


def test_bpe_fold_apply_matches_python_encoder(spark):
    """The r15 JVM array-fold merge application (scale_batch
    bpe_induce/_bpe_apply_merge) must segment every vocabulary word
    exactly like the pure-Python greedy encoder q275's removed Arrow
    kernel wrapped (curation._bpe_encode_segments) — including the
    odd-offset-within-run rule for self-merges and rank-order
    application across steps. size(syms) is what bpe_doc_token_counts
    now broadcasts as n_tok, so this pins the encode semantics."""
    from rc_rag_spark.queries.curation import _bpe_encode_segments
    from rc_rag_spark.queries.scale_batch import bpe_induce

    vocab = [
        ("aaaa", 5), ("aaab", 4), ("abab", 3), ("baab", 2),
        ("x", 9), ("aa", 1), ("bbbb", 2), ("abc", 7),
    ]
    words = spark.createDataFrame(vocab, ["word", "wc"])
    syms, tops = bpe_induce(words, steps=3)
    merges = [(t.first()["l"], t.first()["r"]) for t in tops]
    encode = _bpe_encode_segments(merges)
    got = {r["word"]: r["syms"] for r in syms.collect()}
    for word, _ in vocab:
        assert got[word] == encode(word), (word, merges)
