"""Independent checks for q197–q200 (numpy/pandas twins)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import rc_rag_spark.queries as q


def _run(spark, sf_dir, name):
    return q.REGISTRY[name].fn(spark, sf_dir).toPandas()


def test_correlation_matrix_matches_numpy(spark, sf_dir):
    out = _run(spark, sf_dir, "q197_correlation_matrix")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    for row in out.itertuples():
        r = np.corrcoef(li[row.col_a], li[row.col_b])[0, 1]
        assert row.r == pytest.approx(r, abs=1e-6)
    assert len(out) == 6  # C(4,2) pairs
    assert (out.r.abs() <= 1.0 + 1e-9).all()


def test_hhi_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "q198_market_hhi")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = li.merge(s, left_on="l_suppkey", right_on="s_suppkey").merge(
        n, left_on="s_nationkey", right_on="n_nationkey"
    )
    rev = j.groupby(["n_name", "s_suppkey"])["l_extendedprice"].sum()
    for row in out.itertuples():
        g = rev.loc[row.n_name]
        shares = g / g.sum()
        assert row.hhi == pytest.approx((shares**2).sum(), abs=1e-6)
        assert row.n_suppliers == len(g)
        # HHI bounds: 1/n (uniform) .. 1 (monopoly)
        assert 1 / len(g) - 1e-9 <= row.hhi <= 1.0 + 1e-9


def test_nb_calibration_consistent_with_predictions(spark, sf_dir):
    cal = _run(spark, sf_dir, "q199_nb_calibration")
    pred = _run(spark, sf_dir, "q186_naive_bayes_langid")
    assert cal.n.sum() == len(pred)
    assert cal.n_correct.sum() == (pred.lang_true == pred.lang_pred).sum()
    assert ((cal.mean_conf > 0) & (cal.mean_conf <= 1.0 + 1e-9)).all()
    assert ((cal.accuracy >= 0) & (cal.accuracy <= 1)).all()
    assert set(cal.bin) <= set(range(10))
    for row in cal.itertuples():
        # bin b holds confidences in [b/10, (b+1)/10) (bin 9 includes 1.0)
        assert row.mean_conf >= row.bin / 10 - 1e-9
        if row.bin < 9:
            assert row.mean_conf < (row.bin + 1) / 10 + 1e-9


def test_power_iteration_matches_numpy_twin(spark, sf_dir):
    """Re-run the SAME three quantized power-iteration steps in
    numpy and require the same vector. (The synthetic embeddings'
    Gram matrix has a flat spectrum, so 3 steps do not — and are not
    expected to — converge to the true eigenvector; the property
    that IS guaranteed is that each step increases the Rayleigh
    quotient, asserted below.)"""
    out = _run(spark, sf_dir, "q200_power_iteration_pc1").sort_values("dim")
    v = out["component"].to_numpy()
    assert len(v) == 64
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-4)
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    G = X.T @ X
    rq_prev = float(np.full(64, 0.125) @ G @ np.full(64, 0.125))
    vk = np.full(64, 0.125)
    for _ in range(3):
        s = np.round(X * vk, 12).sum(axis=1)  # s_i = x_i · v, quantized
        av = np.round(X * s[:, None], 12).sum(axis=0)
        nrm = np.sqrt(np.round(av * av, 12).sum())
        vk = np.round(av / nrm, 12)
        rq = float(vk @ G @ vk)
        assert rq >= rq_prev - 1e-6  # power iteration ascends
        rq_prev = rq
    assert np.abs(v - np.round(vk, 6)).max() < 1e-5
