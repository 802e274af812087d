"""Branch-coverage tests for the round-9 operators beyond what the
uniform fixtures can exercise: the water-filling SATURATION branch
(every fixture source has identical counts, so parity alone never
trips a cap), sweep-line invariants, bin-packing bounds, and the
k-anonymity generalization-ladder monotonicity."""

from __future__ import annotations

import os

import duckdb
import pytest

from rc_rag_spark.queries import REGISTRY


def _mk_docs_dir(tmp_path, spark, counts):
    """Write a synthetic documents.parquet with skewed per-source
    counts into a temp sf_dir."""
    rows = []
    did = 0
    for src, n in counts.items():
        for _ in range(n):
            rows.append((did, f"doc text {did}", "en", src, 40 + did % 13))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    out = os.path.join(str(tmp_path), "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_waterfill_saturation_branch(spark, tmp_path):
    """Skewed sources: tiny sources must SATURATE (allocated == n),
    big ones take the refloated remainder, total stays <= budget and
    within |sources| floor-slops of it."""
    counts = {"tiny_a": 4, "tiny_b": 9, "mid": 400, "big": 2000}
    d = _mk_docs_dir(tmp_path, spark, counts)
    out = {
        r["source"]: r
        for r in REGISTRY["q255_capped_mixture_waterfill"].fn(spark, d).collect()
    }
    total_docs = sum(counts.values())
    budget = 3 * total_docs // 5
    assert out["tiny_a"]["saturated"] and out["tiny_a"]["allocated"] == 4
    assert out["tiny_b"]["saturated"] and out["tiny_b"]["allocated"] == 9
    assert not out["big"]["saturated"]
    assert out["big"]["allocated"] < counts["big"]
    alloc = sum(r["allocated"] for r in out.values())
    assert alloc <= budget
    assert budget - alloc <= len(counts)  # floor slop only
    # parity on the skewed fixture too: the oracle must agree where
    # the saturation branch is live, not just on uniform data
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    oracle = {
        r[0]: r
        for r in con.execute(
            REGISTRY["q255_capped_mixture_waterfill"].sql
        ).fetchall()
    }
    for src in counts:
        assert oracle[src][2] == out[src]["allocated"], src
        assert oracle[src][3] == out[src]["saturated"], src


def test_peak_concurrency_invariants(spark, sf_dir):
    rows = REGISTRY["q244_peak_concurrency"].fn(spark, sf_dir).collect()
    assert rows
    total_starts = sum(r["n_starts"] for r in rows)
    total_ends = sum(r["n_ends"] for r in rows)
    assert total_starts == total_ends  # every interval closes
    for r in rows:
        assert r["peak"] >= r["carry_in"] >= 0
        assert r["peak"] >= 1 or r["n_starts"] == 0


def test_binpack_bounds(spark, sf_dir):
    """Next-fit guarantees: never more bins than files, every bin's
    bytes < target + max file (a file never splits), fill ratio in
    (0, 1]."""
    for r in REGISTRY["q245_compaction_binpack"].fn(spark, sf_dir).collect():
        assert 1 <= r["n_bins"] <= r["n_files"]
        assert r["max_bin_bytes"] <= r["total_bytes"]
        assert 0.0 < r["fill_ratio"] <= 1.0
        # bins (except possibly the last) are filled past nothing —
        # weak global bound: average bin bytes <= target + largest
        # possible overshoot, i.e. n_bins >= total/target rounded up
        # minus 1 can't hold strictly for next-fit; assert the sane
        # direction instead:
        assert r["n_bins"] * r["target"] >= r["total_bytes"] - r["target"]


def test_k_anonymity_ladder_monotone(spark, sf_dir):
    """Generalizing (coarser rungs) can only merge groups: rows at
    risk and small-group counts must be non-increasing up the
    ladder."""
    out = {
        r["level"]: r
        for r in REGISTRY["q251_k_anonymity"].fn(spark, sf_dir).collect()
    }
    l0, l1, l2 = out["L0:band100"], out["L1:band1000"], out["L2:no_band"]
    assert l0["n_groups"] >= l1["n_groups"] >= l2["n_groups"]
    assert l0["n_rows_at_risk"] >= l1["n_rows_at_risk"] >= l2["n_rows_at_risk"]
    assert l0["min_group_size"] <= l1["min_group_size"] <= l2["min_group_size"]


def test_rendezvous_minimal_movement(spark, sf_dir):
    """Only the lost shard's docs move."""
    rows = REGISTRY["q256_rendezvous_sharding"].fn(spark, sf_dir).collect()
    by_shard = {r["shard"]: r for r in rows}
    for s, r in by_shard.items():
        if s == 7:
            assert r["moved_if_shard7_lost"] == r["n_docs"]
        else:
            assert r["moved_if_shard7_lost"] == 0


def test_preference_pairs_margins(spark, sf_dir):
    for r in REGISTRY["q246_preference_pairs"].fn(spark, sf_dir).collect():
        assert r["margin"] >= 50
        assert r["chosen_value"] > r["rejected_value"]
        assert r["chosen_event_id"] != r["rejected_event_id"]
