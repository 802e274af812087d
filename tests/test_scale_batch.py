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
