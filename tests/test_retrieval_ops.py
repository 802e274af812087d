"""Independent replicas for q205–q207."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

import rc_rag_spark.queries as q


def _run(spark, sf_dir, name):
    return q.REGISTRY[name].fn(spark, sf_dir).toPandas()


def test_mmr_matches_numpy_greedy(spark, sf_dir):
    out = _run(spark, sf_dir, "q205_mmr_rerank").sort_values("pick")
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    qv = X[ids == 0][0]
    mask = ids >= 1
    cids, C = ids[mask], X[mask]

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    qsim = np.array([cos(c, qv) for c in C])
    order = np.lexsort((cids, -qsim))[:20]
    cand = [(int(cids[i]), C[i], qsim[i]) for i in order]
    sel = [cand[0]]
    rest = cand[1:]
    lam = 0.7
    while len(sel) < 5:
        best = max(
            rest,
            key=lambda c: (
                lam * c[2] - (1 - lam) * max(cos(c[1], s[1]) for s in sel),
                -c[0],
            ),
        )
        sel.append(best)
        rest = [c for c in rest if c[0] != best[0]]
    assert list(out.vec_id) == [c[0] for c in sel]
    for got, exp in zip(out.qsim, [c[2] for c in sel]):
        assert got == pytest.approx(exp, abs=1e-6)
    # diversity: MMR picks differ from plain top-5 unless top-5 is
    # already diverse; at minimum the seed is the global argmax
    assert out.iloc[0].vec_id == cand[0][0]


def test_time_to_convert_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "q206_time_to_convert")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    fv = ev[ev.event_type == "view"].groupby("user_id")["ts"].min()
    buys = ev[ev.event_type == "purchase"].merge(
        fv.rename("first_view"), on="user_id"
    )
    buys = buys[buys.ts > buys.first_view]
    fp = buys.groupby("user_id")["ts"].min()
    lag = (
        fp.dt.as_unit("us").astype("int64") / 1e6
        - fv.loc[fp.index].dt.as_unit("us").astype("int64") / 1e6
    )
    row = out.iloc[0]
    assert row.n_users == len(fv)
    assert row.n_converted == len(lag)
    for p, col in [(0.25, "p25_sec"), (0.5, "p50_sec"),
                   (0.75, "p75_sec"), (0.9, "p90_sec")]:
        assert getattr(row, col) == pytest.approx(
            np.quantile(lag.to_numpy(), p, method="linear"), rel=1e-6
        )
    assert row.p25_sec <= row.p50_sec <= row.p75_sec <= row.p90_sec


def test_weighted_reservoir_matches_python(spark, sf_dir):
    out = _run(spark, sf_dir, "q207_weighted_reservoir").sort_values("rank")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_totalprice > 0]
    keys = []
    for row in o.itertuples():
        h = int(
            hashlib.md5(str(row.o_orderkey).encode()).hexdigest()[:15], 16
        )
        u = (h + 1) / 2**60
        keys.append((np.log(u) / row.o_totalprice, row.o_orderkey))
    top = sorted(keys, key=lambda t: (-t[0], t[1]))[:10]
    assert list(out.o_orderkey) == [k for _, k in top]
    # weighted sampling should overselect heavy orders: the sample's
    # mean weight exceeds the population mean (deterministic fixture)
    assert out.weight.mean() > o.o_totalprice.mean()
