"""Independent reimplementations for q193–q196."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

import rc_rag_spark.queries as q


def _run(spark, sf_dir, name):
    return q.REGISTRY[name].fn(spark, sf_dir).toPandas()


def test_activity_streaks_match_python(spark, sf_dir):
    out = _run(spark, sf_dir, "q193_activity_streaks").set_index("user_id")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.normalize()
    for user, grp in ev.groupby("user_id"):
        days = sorted(set(grp["day"]))
        streaks = []
        cur = 1
        for a, b in zip(days, days[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        row = out.loc[user]
        assert row.longest_streak == max(streaks)
        assert row.n_streaks == len(streaks)
        assert row.active_days == len(days)


def test_abc_classification_shares(spark, sf_dir):
    out = _run(spark, sf_dir, "q194_abc_classification").set_index("abc")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    rev = li.groupby("l_partkey")["l_extendedprice"].sum().sort_values(
        ascending=False
    )
    total = rev.sum()
    n_parts = rev.size
    assert out.n_parts.sum() == n_parts
    assert out.revenue.sum() == pytest.approx(total, rel=1e-6)
    # A-class revenue share is the largest, C-class per-part revenue
    # is the smallest
    if {"A", "C"} <= set(out.index):
        assert out.loc["A", "revenue"] / out.loc["A", "n_parts"] > (
            out.loc["C", "revenue"] / out.loc["C", "n_parts"]
        )
        assert out.loc["A", "revenue"] <= 0.80 * total * (1 + 1e-9)


def test_top_movers_match_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "q195_top_movers")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["mon"] = pd.to_datetime(j["o_orderdate"]).dt.to_period("M").dt.start_time
    m = j.groupby(["n_name", "mon"])["o_totalprice"].sum().reset_index()
    m = m.sort_values(["n_name", "mon"])
    m["prev"] = m.groupby("n_name")["o_totalprice"].shift(1)
    m = m[m["prev"].notna() & (m["prev"] != 0)].copy()
    m["change"] = (m["o_totalprice"] - m["prev"]) / m["prev"]
    for mon, grp in m.groupby("mon"):
        top = grp.reindex(
            grp.assign(a=grp.change.abs())
            .sort_values(["a", "n_name"], ascending=[False, True])
            .index
        ).head(3)
        got = out[out.mon == mon].sort_values("rank")
        assert list(got.n_name) == list(top.n_name)
        for a, b in zip(got["pct_change"], top.change):
            assert a == pytest.approx(b, abs=1e-6)


def test_kmv_sketch_matches_python(spark, sf_dir):
    out = _run(spark, sf_dir, "q196_kmv_distinct")
    assert len(out) == 1
    row = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    users = sorted(set(ev["user_id"]))
    hashes = sorted(
        int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) for u in users
    )
    k = int(row.k)
    assert k == min(64, len(hashes))
    assert row.kth_hash == hashes[k - 1]
    est = (k - 1) / (hashes[k - 1] / 2**60)
    assert row.estimate == pytest.approx(est, rel=1e-9)
    assert row.n_exact == len(users)
    # KMV with k=64 has ~1/sqrt(62) relative std error; 0.5 is a loose
    # determinism-friendly sanity bound (k saturated to the distinct
    # count means the sketch holds every key and stays near-exact)
    assert row.rel_error < 0.5
