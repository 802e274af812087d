"""Independent (pandas/numpy) reimplementations for q189–q192 —
catches bugs mirrored into both the Spark query and its SQL oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import rc_rag_spark.queries as q


def _run(spark, sf_dir, name):
    return q.REGISTRY[name].fn(spark, sf_dir).toPandas()


def test_column_profile_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "q189_column_profile").set_index("col_name")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
              "l_linenumber"]:
        row = out.loc[c]
        assert row.n_rows == len(li)
        assert row.n_null == li[c].isna().sum()
        assert row.n_distinct == li[c].nunique()
        assert row.min_v == pytest.approx(li[c].min(), abs=1e-6)
        assert row.max_v == pytest.approx(li[c].max(), abs=1e-6)


def test_max_drawdown_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "q190_max_drawdown")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["day"] = pd.to_datetime(o["o_orderdate"]).dt.normalize()
    daily = o.groupby("day")["o_totalprice"].sum().reset_index()
    daily["yr"] = daily["day"].dt.year
    for row in out.itertuples():
        g = daily[daily.yr == row.yr].sort_values("day")
        crev = g["o_totalprice"].cumsum()
        draw = crev.cummax() - crev
        assert row.max_drawdown == pytest.approx(draw.max(), abs=1e-4)
        assert row.trough_day == g.loc[draw.round(4).idxmax(), "day"]
        assert row.max_drawdown >= 0


def test_pareto_frontier_matches_bruteforce(spark, sf_dir):
    out = _run(spark, sf_dir, "q191_pareto_frontier")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    price = p["p_retailprice"].to_numpy()
    size = p["p_size"].to_numpy()
    keep = []
    for i in range(len(p)):
        dominated = (
            (price <= price[i])
            & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        ).any()
        if not dominated:
            keep.append(p["p_partkey"].iloc[i])
    assert set(out.p_partkey) == set(keep)
    # frontier is an antichain: no pair dominates another
    f = out.sort_values("price")
    sizes = f["size"].to_numpy()
    prices = f["price"].to_numpy()
    for i in range(1, len(f)):
        if prices[i] > prices[i - 1]:
            assert sizes[i] > sizes[: i][prices[: i] < prices[i]].max()


def test_decision_stump_matches_bruteforce(spark, sf_dir):
    out = _run(spark, sf_dir, "q192_decision_stump")
    assert len(out) == 1
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    v = e["value"].to_numpy()
    pos = (e["event_type"] == "purchase").to_numpy().astype(int)
    n, np_ = len(v), pos.sum()
    best = None
    for thr in np.unique(v)[:-1]:
        m = v <= thr
        nl, lp = int(m.sum()), int(pos[m].sum())
        ln_, rp = nl - lp, np_ - lp
        rn = (n - nl) - rp
        score = round((lp * lp + ln_ * ln_) / nl
                      + (rp * rp + rn * rn) / (n - nl), 9)
        if best is None or score > best[0] or (
            score == best[0] and thr < best[1]
        ):
            best = (score, thr, nl, lp, rp)
    score, thr, nl, lp, rp = best
    row = out.iloc[0]
    assert row.threshold == pytest.approx(thr, abs=1e-6)
    assert row.n_left == nl
    assert row.pos_left == lp
    assert row.pos_right == rp
    assert row.purity == pytest.approx(score, abs=1e-6)
