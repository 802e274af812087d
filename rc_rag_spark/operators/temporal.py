"""Temporal join operators Spark lacks as built-ins: as-of join and
banded range join.

Neither exists in the reference (its only join is a keyed dict lookup,
/root/reference/code/run_llm_ours.py:236-238); both are core
LLM-training-data-pipeline operators (event attribution, leakage
windows, time-aligned feature joins), so they are part of the derived
operator surface (SURVEY §2.2).

Both are compositions of built-in DataFrame ops — no UDFs, no
driver-side loops — so Catalyst/Tungsten and AQE apply end to end.

asof_join            one shuffle + one window sort per call: union the
                     two inputs, sort by (key, time, side), and carry
                     the last-seen right payload forward with
                     last(ignorenulls). This is the sort-merge as-of —
                     O(n log n) per key group, never a per-key cross
                     product.
banded_range_join    equi-join prefilter on (key, time-bucket) with the
                     exact band predicate as a residual. The left side
                     is exploded over the (bounded) bucket range its
                     band spans, so the shuffle stays an equi-shuffle
                     and the per-row fan-out is (band/bucket_width)+1 —
                     at bucket_width == band span that is ≤ 2×. A plain
                     theta join on (key, band) degrades to a per-key
                     cross product when keys are hot; this bounds the
                     blow-up by time density instead.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_T = "_asof_t"
_SIDE = "_asof_is_left"
_PAYLOAD = "_asof_payload"


def _check_reserved(op, names, left, right):
    """Inputs must not already use our internal column names — catching
    it here gives a clear error instead of a duplicate-column analysis
    failure deep inside the plan."""
    for side, df in (("left", left), ("right", right)):
        hit = [c for c in names if c in df.columns]
        if hit:
            raise ValueError(
                f"{op}: {side} input uses reserved internal column "
                f"name(s) {hit}; rename them before joining"
            )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    how: str = "left",
    direction: str = "backward",
    tolerance_expr: Optional[str] = None,
    right_tiebreak: Optional[str] = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for every left row, attach the single right row with
    the same key whose time is the nearest at-or-before (backward),
    at-or-after (forward), or closest in either direction (nearest,
    exact-distance ties going to the at-or-before match) relative to
    the left row's time.

    Equal timestamps on opposite sides DO match (>= / <= semantics,
    matching DuckDB's ASOF JOIN and pandas.merge_asof defaults).

    tolerance_expr: optional SQL interval ("INTERVAL 10 MINUTES") — a
    match farther than this from the left time is nulled out (left) or
    dropped (inner), like merge_asof's tolerance.

    right_tiebreak: column of `right` used to break ties when several
    right rows share (key, time) — the greatest value wins. Without it,
    tied right rows resolve arbitrarily (document or dedupe upstream).

    Output: all left columns plus right's non-key, non-time columns
    (suffixed on name collision) and `right_time` (suffixed if it
    collides with a left column).

    Scale: one hash-exchange of left∪right on `on` + one sort — the
    same cost envelope as a sort-merge join, with no risk of a per-key
    quadratic intermediate. Hot keys are ordinary sort skew (AQE
    handles them); at 100 TB pre-bucketing both sides on `on` removes
    the exchange entirely.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be left|inner, got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "asof_join: direction must be backward|forward|nearest, "
            f"got {direction!r}"
        )
    on = list(on)
    if not on:
        raise ValueError("asof_join: need at least one key column")
    missing_l = [c for c in on if c not in left.columns]
    missing_r = [c for c in on if c not in right.columns]
    if missing_l or missing_r:
        raise ValueError(
            f"asof_join: key columns missing (left: {missing_l}, "
            f"right: {missing_r})"
        )
    if left_time not in left.columns:
        raise ValueError("asof_join: left_time must be a left column")
    _check_reserved("asof_join", (_T, _SIDE, _PAYLOAD, "_asof_tb"),
                    left, right)

    payload_cols = [c for c in right.columns if c not in on]
    if right_time not in payload_cols:
        raise ValueError("asof_join: right_time must be a right column")
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }
    clashes = [
        n for n in out_names.values()
        if n in left.columns or list(out_names.values()).count(n) > 1
    ]
    if clashes:
        raise ValueError(
            f"asof_join: suffixed output name(s) still collide: {clashes}"
        )

    tb = [F.col(right_tiebreak).alias("_asof_tb")] if right_tiebreak else []
    # SQL equality semantics: a NULL key equals nothing, so NULL-key
    # right rows can never be matched — drop them up front. NULL-key
    # left rows then share a partition containing no right rows and
    # come out unmatched, exactly like ASOF LEFT JOIN ON l.k = r.k.
    # A NULL right TIME likewise compares false against every left time
    # (DuckDB ASOF / merge_asof never match NULL timestamps), so those
    # rows are dropped too.
    null_free = right.where(F.col(right_time).isNotNull())
    for c in on:
        null_free = null_free.where(F.col(c).isNotNull())
    r = null_free.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias(_T),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias(_PAYLOAD),
        *tb,
    )
    payload_type = r.schema[_PAYLOAD].dataType
    l = left.select(
        "*",
        F.col(left_time).alias(_T),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Sort so every right row a left row may match precedes it:
    # backward = ascending time; right (side 0) before left (side 1) on
    # equal times so >= matches include ties. Forward flips the time
    # order only. NULLs sort FIRST in both directions: right NULL-time
    # rows are already gone, so a NULL left-time row precedes every
    # right row and sees no match — NULL time comparisons never match.
    def directional_match(d: str) -> Column:
        t_order = (
            F.col(_T).asc_nulls_first()
            if d == "backward"
            else F.col(_T).desc_nulls_first()
        )
        order = [t_order, F.col(_SIDE).asc()]
        if right_tiebreak:
            order.append(F.col("_asof_tb").asc_nulls_first())
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = F.last(_PAYLOAD, ignorenulls=True).over(w)
        if tolerance_expr:
            tol = F.expr(tolerance_expr)
            rt = m.getField(right_time)
            in_tol = (
                (F.col(_T) - rt <= tol)
                if d == "backward"
                else (rt - F.col(_T) <= tol)
            )
            m = F.when(in_tol, m)
        return m

    if direction == "nearest":
        # Both directions from ONE hash exchange: the two windows share
        # partitionBy(on), so Spark plans a single shuffle with two
        # in-partition sorts (asc + desc) — never a self-join. Each
        # side honors tolerance independently; the closer survivor
        # wins, an exact distance tie going to the at-or-before match
        # (merge_asof convention).
        mb, mf = directional_match("backward"), directional_match("forward")
        db = F.col(_T) - mb.getField(right_time)
        df_fwd = mf.getField(right_time) - F.col(_T)
        matched = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(df_fwd < db, mf)
            .otherwise(mb)
        )
    else:
        matched = directional_match(direction)

    out = (
        u.withColumn(_PAYLOAD, matched)
        .where(F.col(_SIDE) == 1)
        .drop(_T, _SIDE, *(["_asof_tb"] if right_tiebreak else []))
    )
    if how == "inner":
        out = out.where(F.col(_PAYLOAD).isNotNull())
    out = out.select(
        *[F.col(c) for c in left.columns],
        *[
            F.col(_PAYLOAD).getField(c).alias(out_names[c])
            for c in payload_cols
        ],
    )
    return out


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
    bucket_seconds: Optional[int] = None,
) -> DataFrame:
    """Inner band join: pairs (l, r) with equal keys and
    ``r.time ∈ [l.time + lower, l.time + upper)`` (seconds offsets,
    lower < upper).

    Physical strategy: bucket right rows by
    ``floor(epoch_micros / bucket)`` and explode each left row over the
    bucket ids its band can touch (a bounded ``sequence``), join
    equi on (key…, bucket) with the exact band predicate as a residual.
    The shuffle is a plain hash exchange — no theta join, no nested
    loop — and AQE sees an ordinary equi-join it can re-plan.

    bucket_seconds defaults to the band span, making the fan-out ≤ 2×.

    Output: all left columns + right's non-key columns (right_time
    suffixed with ``_right`` on collision).
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("banded_range_join: need lower < upper")
    on = list(on)
    if not on:
        raise ValueError("banded_range_join: need at least one key column")
    span = upper_seconds - lower_seconds
    bucket = int(bucket_seconds or span)
    if bucket <= 0:
        raise ValueError("banded_range_join: bucket_seconds must be > 0")
    bucket_us = bucket * 1_000_000

    missing_l = [c for c in on if c not in left.columns]
    missing_r = [c for c in on if c not in right.columns]
    if missing_l or missing_r:
        raise ValueError(
            f"banded_range_join: key columns missing (left: {missing_l}, "
            f"right: {missing_r})"
        )
    if left_time not in left.columns:
        raise ValueError("banded_range_join: left_time must be a left column")
    if right_time not in right.columns or right_time in on:
        raise ValueError("banded_range_join: right_time must be a non-key "
                         "right column")
    _check_reserved("banded_range_join", ("_band_b",), left, right)

    payload_cols = [c for c in right.columns if c not in on]
    out_names = {
        c: (c + "_right" if c in left.columns else c) for c in payload_cols
    }
    clashes = [
        n for n in out_names.values()
        if n in left.columns or list(out_names.values()).count(n) > 1
    ]
    if clashes:
        raise ValueError(
            f"banded_range_join: suffixed output name(s) still collide: "
            f"{clashes}"
        )

    def bucket_of(us: Column) -> Column:
        # exact floor division on integers: bigint/bigint in Spark is a
        # DOUBLE division, which rounds above 2^53 µs (~year 2255) and
        # could put a row one bucket off; (x - pmod(x, b)) is an exact
        # multiple of b, so dividing via DECIMAL stays integral.
        return (
            ((us - F.pmod(us, F.lit(bucket_us))).cast("decimal(30,0)")
             / bucket_us)
            .cast("long")
        )

    def epoch_us(df: DataFrame, name: str) -> Column:
        # unix_micros only accepts TIMESTAMP; TIMESTAMP_NTZ columns
        # (e.g. parquet written with isAdjustedToUTC=false) go through
        # timestamp_diff against an NTZ epoch — timezone-free, so the
        # band stays exact regardless of session timezone. Mixing an
        # NTZ side with a TZ side interprets the NTZ wall clock as UTC.
        if dict(df.dtypes)[name] == "timestamp_ntz":
            epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
            return F.timestamp_diff("MICROSECOND", epoch, F.col(name))
        return F.unix_micros(F.col(name))

    r = right.select(
        *on,
        bucket_of(epoch_us(right, right_time)).alias("_band_b"),
        *[F.col(c).alias(out_names[c]) for c in payload_cols],
    )
    lt_us = epoch_us(left, left_time)
    lo_b = bucket_of(lt_us + lower_seconds * 1_000_000)
    # upper bound is exclusive: the last reachable right time is
    # upper - 1 microsecond
    hi_b = bucket_of(lt_us + upper_seconds * 1_000_000 - 1)
    l = left.withColumn("_band_b", F.explode(F.sequence(lo_b, hi_b)))

    if dict(right.dtypes)[right_time] == "timestamp_ntz":
        rt_us = F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col(out_names[right_time]),
        )
    else:
        rt_us = F.unix_micros(F.col(out_names[right_time]))
    band = (rt_us >= lt_us + lower_seconds * 1_000_000) & (
        rt_us < lt_us + upper_seconds * 1_000_000
    )
    return (
        l.join(r, on=[*on, "_band_b"], how="inner")
        .where(band)
        .drop("_band_b")
    )
