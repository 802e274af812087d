"""Independent replicas for q208–q210."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import rc_rag_spark.queries as q


def _run(spark, sf_dir, name):
    return q.REGISTRY[name].fn(spark, sf_dir).toPandas()


def test_markov_stationary_matches_numpy(spark, sf_dir):
    out = _run(spark, sf_dir, "q208_markov_stationary")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    trans = {}
    for _, g in ev.groupby("user_id"):
        ts = list(g["event_type"])
        for a, b in zip(ts, ts[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    states = sorted({a for a, _ in trans})
    row_sums = {
        s: sum(n for (a, _), n in trans.items() if a == s) for s in states
    }
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(3):
        nxt = {}
        for (a, b), n in trans.items():
            term = round(pi.get(a, 0.0) * (n / row_sums[a]), 12)
            nxt[b] = nxt.get(b, 0.0) + term
        pi = nxt
    got = dict(zip(out.state, out.pi))
    assert set(got) == set(pi)
    for s in pi:
        assert got[s] == pytest.approx(pi[s], abs=1e-6)
    # mass approximately conserved (row-stochastic P, quantized terms)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-3)


def test_windowed_funnel_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "q209_windowed_funnel")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    v = ev[ev.event_type == "view"]
    p = ev[ev.event_type == "purchase"]
    viewers = v.user_id.nunique()
    j = p.merge(v, on="user_id", suffixes=("_p", "_v"))
    hit = j[
        (j.ts_p > j.ts_v)
        & (j.ts_p <= j.ts_v + pd.Timedelta(hours=1))
    ].user_id.nunique()
    row = out.iloc[0]
    assert row.n_viewers == viewers
    assert row.n_converted == hit
    assert row.rate_1h == pytest.approx(hit / viewers, abs=1e-6)


def test_joinability_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "q210_joinability_audit")
    tbl = {
        t: pd.read_parquet(f"{sf_dir}/{t}.parquet")
        for t in ["lineitem", "orders", "part", "supplier", "customer",
                  "nation"]
    }
    for row in out.itertuples():
        ta, ca = row.col_a.split(".")
        tb, cb = row.col_b.split(".")
        a = set(tbl[ta][ca].dropna())
        b = set(tbl[tb][cb].dropna())
        assert row.nd_a == len(a)
        assert row.nd_b == len(b)
        assert row.n_common == len(a & b)
        assert row.containment_a == pytest.approx(
            len(a & b) / len(a), abs=1e-9
        )
    # FK integrity of the fixture: every lineitem orderkey exists in
    # orders, every o_custkey in customer
    fk = out.set_index("col_a")
    assert fk.loc["lineitem.l_orderkey", "containment_a"] == 1.0
    assert fk.loc["orders.o_custkey", "containment_a"] == 1.0
