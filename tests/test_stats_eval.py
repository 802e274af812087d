"""Independent reimplementations for q201–q204."""

from __future__ import annotations

import hashlib
import os
from collections import Counter

import numpy as np
import pandas as pd
import pytest

import rc_rag_spark.queries as q


def _run(spark, sf_dir, name):
    return q.REGISTRY[name].fn(spark, sf_dir).toPandas()


def test_zipf_fit_matches_numpy(spark, sf_dir):
    out = _run(spark, sf_dir, "q201_zipf_fit")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    c = Counter()
    for t in docs["text"]:
        c.update(w for w in t.split(" ") if w)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log(np.arange(1, len(ranked) + 1))
    y = np.log([f for _, f in ranked])
    slope, intercept = np.polyfit(x, y, 1)
    row = out.iloc[0]
    assert row.n_ranks == len(ranked)
    assert row.slope == pytest.approx(slope, abs=1e-4)
    assert row.intercept == pytest.approx(intercept, abs=1e-4)
    assert row.slope < 0  # frequency decreases with rank


def test_nb_confusion_consistent_with_predictions(spark, sf_dir):
    cm = _run(spark, sf_dir, "q202_nb_confusion")
    pred = _run(spark, sf_dir, "q186_naive_bayes_langid")
    ct = pred.groupby(["lang_true", "lang_pred"]).size()
    assert cm.n.sum() == len(pred)
    for row in cm.itertuples():
        assert row.n == ct.loc[(row.lang_true, row.lang_pred)]
    # row rates sum to 1 per true lang
    sums = cm.groupby("lang_true")["rate"].sum()
    assert (abs(sums - 1.0) < 1e-6).all()


def test_ks_matches_numpy(spark, sf_dir):
    out = _run(spark, sf_dir, "q203_ks_uniformity")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for row in out.itertuples():
        g = ev[ev.event_type == row.event_type].sort_values(
            ["value", "event_id"]
        )
        v = g["value"].to_numpy()
        n = len(v)
        lo, hi = v.min(), v.max()
        fcdf = (v - lo) / (hi - lo)
        i = np.arange(1, n + 1)
        d = np.maximum(np.abs(i / n - fcdf), np.abs((i - 1) / n - fcdf))
        assert row.n == n
        assert row.ks_stat == pytest.approx(d.max(), abs=1e-6)
        assert 0 <= row.ks_stat <= 1


def test_bootstrap_matches_python_replica(spark, sf_dir):
    out = _run(spark, sf_dir, "q204_bootstrap_ci")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["day"] = pd.to_datetime(o["o_orderdate"]).dt.normalize()
    daily = (
        o.groupby("day")["o_totalprice"].sum().round(2).sort_index()
    )
    rev = daily.to_numpy()
    n = len(rev)
    means = []
    for b in range(1, 201):
        tot = 0.0
        for i in range(1, n + 1):
            h = int(hashlib.md5(f"{b}_{i}".encode()).hexdigest()[:15], 16)
            tot += rev[h % n]
        means.append(tot / n)
    row = out.iloc[0]
    assert row.n_resamples == 200
    assert row.point_estimate == pytest.approx(rev.mean(), abs=1e-4)
    assert row.ci_lo == pytest.approx(
        np.quantile(means, 0.025, method="linear"), abs=1e-4
    )
    assert row.ci_hi == pytest.approx(
        np.quantile(means, 0.975, method="linear"), abs=1e-4
    )
    assert row.ci_lo <= row.point_estimate <= row.ci_hi


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory, sf_dir):
    """A fixture dir identical to sf0.001 except events.value is NULL
    on every 7th row — the fixtures themselves contain zero NULL
    values, so without this the NULL-drop branches in q105/q192/q203
    (and the cross-engine null-ordering hazard they guard against)
    are exercised by nothing."""
    import duckdb

    d = tmp_path_factory.mktemp("nullsf")
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        os.symlink(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT event_id, ts, user_id, event_type,
                   CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
                       AS value,
                   props
            FROM read_parquet('{sf_dir}/events.parquet')
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["q105_trimmed_mean", "q192_decision_stump", "q203_ks_uniformity"],
)
def test_null_value_rows_keep_parity(spark, null_sf_dir, name):
    """Spark and the DuckDB oracle must agree when events.value is
    nullable: the explicit IS NOT NULL drop runs on both engines
    before any sort window (null-ordering defaults differ) or pandas
    float64 cast (NULL would become NaN and poison a whole group)."""
    from tests.oracle import assert_parity

    assert_parity(spark, name, q.REGISTRY[name], null_sf_dir)


def test_null_rows_actually_dropped(spark, null_sf_dir, sf_dir):
    """The NULL branch is live: the null-bearing fixture has fewer
    kept rows in q105 than the pristine one, and no NaN output."""
    import math

    out = {
        r["event_type"]: r
        for r in q.REGISTRY["q105_trimmed_mean"].fn(spark, null_sf_dir).collect()
    }
    base = {
        r["event_type"]: r
        for r in q.REGISTRY["q105_trimmed_mean"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(base)
    assert sum(r["n_kept"] for r in out.values()) < sum(
        r["n_kept"] for r in base.values()
    )
    for r in out.values():
        assert not math.isnan(r["trimmed_mean_value"])
