"""Behavioral tests for the stats_ts + linkage batches (q181–q188).

The DuckDB oracle parity (tests/test_oracle_parity.py) is the primary
gate; these tests add INDEPENDENT reimplementations (pandas/pure
Python) of the statistical semantics, so a bug mirrored into both the
Spark query and its SQL oracle still gets caught.
"""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

import rc_rag_spark.queries as q


def _run(spark, sf_dir, name):
    return q.REGISTRY[name].fn(spark, sf_dir).toPandas()


# --------------------------------------------------------------------------
# Jaro-Winkler kernel: bit-equality with DuckDB over a fuzz corpus


def test_jaro_winkler_bit_equal_to_duckdb():
    import duckdb

    from rc_rag_spark.functions.strsim import jaro_winkler

    rng = random.Random(7)
    pairs = [("", ""), ("", "a"), ("a", ""), ("a", "a"),
             ("martha", "marhta"), ("dwayne", "duane"),
             ("dixon", "dicksonx"), ("abc", "xyz")]
    for _ in range(800):
        a = "".join(rng.choices("abcdef ", k=rng.randint(0, 12)))
        b = "".join(rng.choices("abcdef ", k=rng.randint(0, 12)))
        pairs.append((a, b))
    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    duck = con.execute("SELECT jaro_winkler_similarity(a, b) FROM p").fetchall()
    for (a, b), (dv,) in zip(pairs, duck):
        assert jaro_winkler(a, b) == dv, (a, b)


# --------------------------------------------------------------------------
# q181 Kaplan-Meier: independent pure-Python estimator


def _km_reference(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_custkey", "o_orderkey", "o_orderdate"]
    ]
    o["d"] = pd.to_datetime(o["o_orderdate"]).dt.normalize()
    mx = o["d"].max()
    o = o.sort_values(["o_custkey", "d", "o_orderkey"])
    durations = []
    for _, grp in o.groupby("o_custkey"):
        ds = list(grp["d"])
        for cur, nxt in zip(ds, ds[1:]):
            durations.append(((nxt - cur).days, 1))
        durations.append(((mx - ds[-1]).days, 0))
    n = len(durations)
    from collections import defaultdict

    d_at = defaultdict(int)
    all_at = defaultdict(int)
    for t, ev in durations:
        all_at[t] += 1
        d_at[t] += ev
    surv = {}
    s = 1.0
    at_risk = n
    for t in sorted(all_at):
        if d_at[t] > 0:
            s *= 1 - d_at[t] / at_risk
            surv[t] = (at_risk, d_at[t], s)
        at_risk -= all_at[t]
    return surv


def test_km_matches_pure_python(spark, sf_dir):
    out = _run(spark, sf_dir, "q181_survival_km")
    ref = _km_reference(sf_dir)
    assert set(out["t_days"]) == set(ref)
    for row in out.itertuples():
        n_risk, d_events, s = ref[row.t_days]
        assert row.n_risk == n_risk
        assert row.d_events == d_events
        # engine quantizes ln terms at 1e-12; allow float-path slack
        assert row.survival == pytest.approx(s, abs=1e-6)
    # survival is non-increasing in t
    srt = out.sort_values("t_days")["survival"].tolist()
    assert all(a >= b - 1e-12 for a, b in zip(srt, srt[1:]))


# --------------------------------------------------------------------------
# q182 CUSUM: pandas recomputation of the peak


def test_cusum_peak_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "q182_cusum_changepoint")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.normalize()
    daily = ev.groupby(["event_type", "day"]).size().rename("n").reset_index()
    for row in out.itertuples():
        g = daily[daily.event_type == row.event_type].sort_values("day")
        mu = g["n"].sum() / len(g)
        cusum = (g["n"] - mu).cumsum()
        peak_idx = cusum.abs().round(9).idxmax()
        assert abs(row.cusum_peak) == pytest.approx(
            cusum.abs().max(), abs=1e-6
        )
        assert row.n_days == len(g)
        assert row.peak_day == g.loc[peak_idx, "day"]


# --------------------------------------------------------------------------
# q183 decomposition: components re-add to the original series


def test_seasonal_decompose_reconstructs(spark, sf_dir):
    out = _run(spark, sf_dir, "q183_seasonal_decompose")
    # total = trend + seasonal + remainder (within rounding slack)
    resid = out.total - (out.trend + out.seasonal + out.remainder)
    assert resid.abs().max() < 1e-6
    # seasonal depends only on dow
    assert (out.groupby("dow")["seasonal"].nunique() == 1).all()
    # one row per day, days contiguous
    assert out["day"].is_unique


# --------------------------------------------------------------------------
# q184 Gini: pandas recomputation + bounds


def test_gini_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "q184_gini_concentration")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    spend = (
        o.groupby("o_custkey")["o_totalprice"].sum().rename("s").reset_index()
    )
    j = spend.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    for row in out.itertuples():
        g = j[j.n_name == row.n_name].sort_values(["s", "c_custkey"])
        x = g["s"].to_numpy()
        nn = len(x)
        i = pd.RangeIndex(1, nn + 1).to_numpy()
        gini = (2 * (i * x).sum() - (nn + 1) * x.sum()) / (nn * x.sum())
        assert row.n_customers == nn
        assert row.gini == pytest.approx(gini, abs=1e-6)
        assert 0.0 <= row.gini < 1.0


# --------------------------------------------------------------------------
# q185 Benford: distribution sanity


def test_benford_frequencies(spark, sf_dir):
    out = _run(spark, sf_dir, "q185_benford_audit")
    assert set(out.digit) <= set(range(1, 10))
    assert out.obs_freq.sum() == pytest.approx(1.0, abs=1e-6)
    assert (out.chi2_term >= 0).all()
    for row in out.itertuples():
        assert row.exp_freq == pytest.approx(
            math.log10(1 + 1 / row.digit), abs=1e-9
        )


# --------------------------------------------------------------------------
# q186 naive Bayes: structural invariants


def test_naive_bayes_structure(spark, sf_dir):
    out = _run(spark, sf_dir, "q186_naive_bayes_langid")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    test_ids = set(docs[docs.doc_id % 2 == 1].doc_id)
    assert set(out.doc_id) == test_ids
    assert out.doc_id.is_unique
    assert (out.log_posterior < 0).all()
    # predicted langs come from the training label set
    train_langs = set(docs[docs.doc_id % 2 == 0].lang)
    assert set(out.lang_pred) <= train_langs


# --------------------------------------------------------------------------
# q187 blocked linkage: blocking + threshold semantics


def test_jw_linkage_blocks_and_threshold(spark, sf_dir):
    out = _run(spark, sf_dir, "q187_jaro_winkler_linkage")
    from rc_rag_spark.functions.strsim import jaro_winkler

    assert (out.jw >= 0.5).all()
    for row in out.itertuples():
        assert row.name_a < row.name_b
        assert row.name_a.split(" ")[-1] == row.name_b.split(" ")[-1]
        assert row.jw == pytest.approx(
            jaro_winkler(row.name_a, row.name_b), abs=1e-9
        )


# --------------------------------------------------------------------------
# q188 duplicated spans: every reported span really is in >= 2 docs


def test_duplicate_spans_exist_in_corpus(spark, sf_dir):
    out = _run(spark, sf_dir, "q188_duplicate_ngram_spans")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tok_docs = [
        (row.doc_id, [t for t in row.text.split(" ") if t])
        for row in docs.itertuples()
    ]
    from collections import defaultdict

    span_docs = defaultdict(set)
    span_occ = defaultdict(int)
    for doc_id, toks in tok_docs:
        for i in range(len(toks) - 4):
            gram = " ".join(toks[i : i + 5])
            span_docs[gram].add(doc_id)
            span_occ[gram] += 1
    expected = {g for g, ds in span_docs.items() if len(ds) >= 2}
    assert set(out.gram) == expected
    for row in out.itertuples():
        assert row.n_docs == len(span_docs[row.gram])
        assert row.n_occ == span_occ[row.gram]


def test_jaro_winkler_properties():
    """Symmetry, range, identity/empty edges — independent of DuckDB."""
    import random

    from rc_rag_spark.functions.strsim import jaro_winkler

    rng = random.Random(11)
    for _ in range(300):
        a = "".join(rng.choices("abcde", k=rng.randint(0, 10)))
        b = "".join(rng.choices("abcde", k=rng.randint(0, 10)))
        s = jaro_winkler(a, b)
        assert s == jaro_winkler(b, a)
        assert 0.0 <= s <= 1.0
    assert jaro_winkler("same", "same") == 1.0
    assert jaro_winkler("", "") == 0.0  # DuckDB edge semantics
    assert jaro_winkler("x", "") == 0.0


def test_holt_matches_python_replica(spark, sf_dir):
    """Replicate the fold (floor-based 1e-6 half-up quantizer) in
    pure Python and require the same level/trend path."""
    import math

    out = (
        q.REGISTRY["q211_holt_linear_trend"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("day")
    )
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["day"] = pd.to_datetime(o["o_orderdate"]).dt.normalize()
    daily = (
        o.groupby("day")["o_totalprice"].sum().round(2).sort_index()
    )

    def q6(v):
        return math.floor(v * 1000000 + 0.5) / 1000000

    xs = daily.to_numpy()
    l, b = xs[0], 0.0
    levels, trends = [l], [b]
    for x in xs[1:]:
        ln = q6(0.5 * x + 0.5 * (l + b))
        b = q6(0.3 * (ln - l) + 0.7 * b)
        l = ln
        levels.append(l)
        trends.append(b)
    assert len(out) == len(xs)
    for got_l, got_b, got_f, exp_l, exp_b in zip(
        out.level, out.trend, out.forecast_next, levels, trends
    ):
        assert got_l == pytest.approx(exp_l, abs=1e-6)
        assert got_b == pytest.approx(exp_b, abs=1e-6)
        assert got_f == pytest.approx(q6(exp_l + exp_b), abs=1e-6)


def test_guarded_series_ceiling(spark):
    """guarded_series passes small arrays through unchanged and raises
    in-plan when the folded series exceeds the ceiling (q211's guard
    against mis-reduced fold input)."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from rc_rag_spark.queries.stats_ts import guarded_series

    df = spark.range(1).select(
        F.sequence(F.lit(1), F.lit(10)).alias("s")
    )
    ok = df.select(guarded_series(F.col("s"), ceiling=10).alias("g"))
    assert ok.collect()[0]["g"] == list(range(1, 11))
    bad = df.select(guarded_series(F.col("s"), ceiling=9).alias("g"))
    with pytest.raises(Exception, match="exceeds ceiling 9"):
        bad.collect()
