"""asof_join / banded_range_join semantics: ties, tolerance, direction,
join modes, tiebreaks, theta-join equivalence, and plan shape (the
banded join must stay an equi-join — no nested-loop fallback)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rc_rag_spark.operators.temporal import asof_join, banded_range_join
from rc_rag_spark.sources import table


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "l0"),
            (1, _ts("2024-01-01 10:30:00"), "l1"),
            (2, _ts("2024-01-01 09:00:00"), "l2"),
            (3, _ts("2024-01-01 12:00:00"), "l3"),
        ],
        "k int, t timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:59:00"), "r0"),
            (1, _ts("2024-01-01 10:30:00"), "r1"),  # exact tie with l1
            (2, _ts("2024-01-01 11:00:00"), "r2"),  # after l2 only
        ],
        "k int, rt timestamp, rv string",
    )
    return left, right


def test_asof_backward_basic_and_ties(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "t", "rt").orderBy("lv")
    rows = {r["lv"]: (r["rv"], r["rt"]) for r in out.collect()}
    assert rows["l0"][0] == "r0"
    # equal timestamp matches (>= semantics)
    assert rows["l1"] == ("r1", _ts("2024-01-01 10:30:00"))
    assert rows["l2"] == (None, None)  # only future right rows
    assert rows["l3"] == (None, None)  # key absent from right


def test_asof_inner_drops_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "t", "rt", how="inner")
    assert sorted(r["lv"] for r in out.collect()) == ["l0", "l1"]


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "t", "rt", direction="forward")
    rows = {r["lv"]: r["rv"] for r in out.collect()}
    assert rows["l0"] == "r1"  # earliest right at-or-after 10:00
    assert rows["l1"] == "r1"  # tie matches forward too
    assert rows["l2"] == "r2"
    assert rows["l3"] is None


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, ["k"], "t", "rt",
        tolerance_expr="INTERVAL 5 MINUTES",
    )
    rows = {r["lv"]: r["rv"] for r in out.collect()}
    assert rows["l0"] == "r0"  # 1 minute back: inside tolerance
    assert rows["l1"] == "r1"  # 0 back
    # inner + tolerance drops the nulled matches
    inner = asof_join(
        left, right, ["k"], "t", "rt", how="inner",
        tolerance_expr="INTERVAL 30 SECONDS",
    )
    assert sorted(r["lv"] for r in inner.collect()) == ["l1"]


def test_asof_tiebreak_deterministic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "k int, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 10, "low"),
            (1, _ts("2024-01-01 09:00:00"), 20, "high"),
        ],
        "k int, rt timestamp, pri int, rv string",
    )
    out = asof_join(
        left, right, ["k"], "t", "rt", right_tiebreak="pri"
    )
    assert out.collect()[0]["rv"] == "high"  # greatest tiebreak wins


def test_asof_name_collision_suffix(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "L")], "k int, t timestamp, v string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), "R")], "k int, t timestamp, v string"
    )
    out = asof_join(left, right, ["k"], "t", "t")
    row = out.collect()[0]
    assert row["v"] == "L" and row["v_right"] == "R"
    assert row["t_right"] == _ts("2024-01-01 09:00:00")


def test_banded_matches_theta_join(spark, sf_dir):
    """Bucketed formulation ≡ naive theta join, for several bucket
    widths (narrower buckets = more fan-out, same result)."""
    e = table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    naive = (
        errors.alias("e")
        .join(
            clicks.alias("c"),
            (F.col("c.user_id") == F.col("e.user_id"))
            & (F.col("c.click_ts") >= F.col("e.ts") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("c.click_ts") < F.col("e.ts")),
        )
        .select("e.event_id", "c.click_ts")
    )
    expected = sorted((r["event_id"], r["click_ts"]) for r in naive.collect())
    for bucket in (None, 60, 47):
        got = banded_range_join(
            errors, clicks, ["user_id"], "ts", "click_ts",
            lower_seconds=-300, upper_seconds=0, bucket_seconds=bucket,
        ).select("event_id", "click_ts")
        assert (
            sorted((r["event_id"], r["click_ts"]) for r in got.collect())
            == expected
        )


def test_banded_plan_is_equi_join(spark, sf_dir):
    """The scale contract: a hash/sort-merge equi-join, never a
    cartesian or broadcast-nested-loop theta join."""
    e = table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    plan = (
        banded_range_join(
            errors, clicks, ["user_id"], "ts", "click_ts",
            lower_seconds=-300, upper_seconds=0,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_single_shuffle(spark, sf_dir):
    """asof_join adds exactly one exchange over the union (plus scans):
    the window sort reuses the same hash partitioning."""
    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    plan = (
        asof_join(clicks, views, ["user_id"], "click_ts", "view_ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized pin against an independent implementation:
    pandas.merge_asof(by=key, direction=backward/forward) on frames
    with unique (key, time) pairs (both sides resolve exact-duplicate
    ties arbitrarily, so the generator avoids them)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    for trial in range(3):
        def mk(n, tag):
            keys = rng.integers(0, 5, n)
            times = rng.choice(
                np.arange(0, 10_000, 7), size=n, replace=False
            )
            return pd.DataFrame(
                {
                    "k": keys.astype("int64"),
                    "t": pd.to_datetime(times * 1_000_000_0),
                    f"{tag}v": np.arange(n, dtype="int64"),
                }
            )

        lpdf, rpdf = mk(80, "l"), mk(60, "r")
        for direction in ("backward", "forward", "nearest"):
            expected = pd.merge_asof(
                lpdf.sort_values("t"),
                rpdf.sort_values("t").rename(columns={"t": "rt"}),
                left_on="t",
                right_on="rt",
                by="k",
                direction=direction,
            ).sort_values("lv")
            got = (
                asof_join(
                    spark.createDataFrame(lpdf),
                    spark.createDataFrame(rpdf.rename(columns={"t": "rt"})),
                    ["k"],
                    "t",
                    "rt",
                    direction=direction,
                )
                .orderBy("lv")
                .toPandas()
            )
            exp_pairs = list(
                zip(expected["lv"], expected["rv"].fillna(-1).astype("int64"))
            )
            got_pairs = list(
                zip(got["lv"], got["rv"].fillna(-1).astype("int64"))
            )
            assert got_pairs == exp_pairs, (trial, direction)


def test_asof_null_keys_never_match(spark):
    """SQL equality semantics: NULL keys equal nothing — a NULL-key
    left row comes out unmatched even when NULL-key right rows exist
    (DuckDB ASOF LEFT JOIN ON l.k = r.k behaves identically)."""
    left = spark.createDataFrame(
        [(None, _ts("2024-01-01 10:00:00"), "l0"),
         (1, _ts("2024-01-01 10:00:00"), "l1")],
        "k int, t timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(None, _ts("2024-01-01 09:00:00"), "r_null"),
         (1, _ts("2024-01-01 09:00:00"), "r1")],
        "k int, rt timestamp, rv string",
    )
    rows = {r["lv"]: r["rv"] for r in
            asof_join(left, right, ["k"], "t", "rt").collect()}
    assert rows == {"l0": None, "l1": "r1"}


def test_asof_null_times_never_match(spark):
    """NULL time comparisons never match (DuckDB ASOF / merge_asof
    parity): a NULL-time RIGHT row is never a match candidate — even
    when it would sort adjacent to a left row — and a NULL-time LEFT
    row matches nothing, in both directions."""
    left = spark.createDataFrame(
        [(1, None, "l_null"),
         (1, _ts("2024-01-01 10:00:00"), "l1"),
         (2, _ts("2024-01-01 10:00:00"), "l2")],
        "k int, t timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, None, "r_null"),          # must never match anything
         (1, _ts("2024-01-01 09:00:00"), "r1"),
         (2, None, "r_null2")],        # k=2's only right row
        "k int, rt timestamp, rv string",
    )
    for direction, want_l1 in (("backward", "r1"), ("forward", None)):
        rows = {
            r["lv"]: r["rv"]
            for r in asof_join(
                left, right, ["k"], "t", "rt", direction=direction
            ).collect()
        }
        assert rows == {"l_null": None, "l1": want_l1, "l2": None}, direction


def test_temporal_joins_reject_reserved_names(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError, match="reserved internal column"):
        asof_join(left.withColumn("_asof_t", F.lit(1)), right,
                  ["k"], "t", "rt")
    with pytest.raises(ValueError, match="reserved internal column"):
        asof_join(left, right.withColumn("_asof_payload", F.lit(1)),
                  ["k"], "t", "rt")
    with pytest.raises(ValueError, match="reserved internal column"):
        banded_range_join(left.withColumn("_band_b", F.lit(1)), right,
                          ["k"], "t", "rt", -60, 0)


def test_temporal_joins_validate_inputs(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError, match="key columns missing"):
        asof_join(left.drop("k"), right, ["k"], "t", "rt")
    with pytest.raises(ValueError, match="left_time"):
        asof_join(left, right, ["k"], "nope", "rt")
    with pytest.raises(ValueError, match="collide"):
        # left has rv AND rv_right: right's rv suffixes to rv_right,
        # which still collides — must fail fast, not emit duplicates
        asof_join(
            left.withColumn("rv", F.lit(1)).withColumn("rv_right", F.lit(1)),
            right, ["k"], "t", "rt",
        )
    with pytest.raises(ValueError, match="key columns missing"):
        banded_range_join(
            left.drop("k"), right, ["k"], "t", "rt", -60, 0
        )


def test_asof_forward_tolerance_tiebreak(spark):
    """Forward + tolerance + right_tiebreak: tied right timestamps pin
    to the greatest tiebreak value; matches beyond tolerance null out."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "l1"),
         (1, _ts("2024-01-01 12:00:00"), "l2")],
        "k int, t timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:05:00"), 7, "rA"),
         (1, _ts("2024-01-01 10:05:00"), 9, "rB"),   # tie: larger id wins
         (1, _ts("2024-01-01 13:30:00"), 1, "rC")],  # 90min after l2
        "k int, rt timestamp, rid int, rv string",
    )
    rows = {
        r["lv"]: (r["rv"], r["rid"])
        for r in asof_join(
            left, right, ["k"], "t", "rt",
            direction="forward", tolerance_expr="INTERVAL 30 MINUTES",
            right_tiebreak="rid",
        ).collect()
    }
    assert rows["l1"] == ("rB", 9)
    assert rows["l2"] == (None, None)


def test_asof_nearest_picks_closer_and_breaks_ties_backward(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "l0")], "k int, t timestamp, lv string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:58:00"), "rb"),   # 2 min before
            (1, _ts("2024-01-01 10:01:00"), "rf"),   # 1 min after (closer)
        ],
        "k int, rt timestamp, rv string",
    )
    got = asof_join(left, right, ["k"], "t", "rt", direction="nearest")
    assert got.select("rv").first()[0] == "rf"

    tie = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:59:00"), "rb"),
            (1, _ts("2024-01-01 10:01:00"), "rf"),  # equal 1-min distance
        ],
        "k int, rt timestamp, rv string",
    )
    got = asof_join(left, tie, ["k"], "t", "rt", direction="nearest")
    assert got.select("rv").first()[0] == "rb"  # tie -> at-or-before


def test_asof_nearest_tolerance_each_side(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "l0")], "k int, t timestamp, lv string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), "rb"),  # 60 min before
            (1, _ts("2024-01-01 10:05:00"), "rf"),  # 5 min after
        ],
        "k int, rt timestamp, rv string",
    )
    got = asof_join(
        left, right, ["k"], "t", "rt", direction="nearest",
        tolerance_expr="INTERVAL 10 MINUTES",
    )
    # backward candidate is out of tolerance; forward survives
    assert got.select("rv").first()[0] == "rf"
    got = asof_join(
        left, right, ["k"], "t", "rt", direction="nearest",
        tolerance_expr="INTERVAL 1 MINUTE",
    )
    assert got.select("rv").first()[0] is None


def test_asof_nearest_null_times_never_match(spark):
    left = spark.createDataFrame(
        [(1, None, "l0"), (1, _ts("2024-01-01 10:00:00"), "l1")],
        "k int, t timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, None, "rnull"), (1, _ts("2024-01-01 10:02:00"), "r0")],
        "k int, rt timestamp, rv string",
    )
    got = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, ["k"], "t", "rt", direction="nearest"
        ).collect()
    }
    assert got == {"l0": None, "l1": "r0"}


def test_hll_rolling_distinct_within_sketch_error(spark, sf_dir):
    """q132 (HLL sketch twin) must track the exact q125 within HLL
    error bounds: lgConfigK=12 gives ~1.6% typical relative error, so
    5% is a comfortable deterministic bound on the fixture."""
    import rc_rag_spark.queries as q

    exact = {
        r["day"]: r["users_7d"]
        for r in q.REGISTRY["q125_rolling_distinct_users"]
        .fn(spark, sf_dir)
        .collect()
    }
    rows = q.REGISTRY["q132_rolling_distinct_hll"].fn(spark, sf_dir).collect()
    got = {r["day"]: (r["users_7d"], r["within_5pct"]) for r in rows}
    assert set(exact) == set(got)
    for day, n in exact.items():
        assert got[day][0] == n, (day, n, got[day])
        assert got[day][1] is True, (day, got[day])


def test_quantile_sketch_tracks_exact(spark, sf_dir):
    """q133 (approx_percentile sketch) must track exact q29 within
    rank-error tolerance; with accuracy=10000 on the fixture the
    medians should be near-identical."""
    import rc_rag_spark.queries as q

    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"])
        for r in q.REGISTRY["q29_quantity_percentiles"].fn(spark, sf_dir).collect()
    }
    rows = q.REGISTRY["q133_quantiles_sketch"].fn(spark, sf_dir).collect()
    got = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p50_within"], r["p90_within"])
        for r in rows
    }
    assert set(exact) == set(got)
    for k, (p50, p90) in exact.items():
        g50, g90, w50, w90 = got[k]
        assert g50 == p50 and g90 == p90, (k, p50, p90, got[k])
        assert w50 is True and w90 is True, (k, got[k])
