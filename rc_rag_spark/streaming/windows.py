"""Structured-Streaming surface over the events table (SURVEY §2.2
'Streaming'). Every transformation here is written against the unified
DataFrame API so the SAME function runs in batch and streaming — the
batch run is the oracle for the streaming run (Spark's unified
semantics make batch-equivalence a strict check).

Scale posture: watermarks bound state; aggregation state is keyed by
(window, group) — partitioned by the shuffle on the group key; AQE
does not apply to streaming, so shuffle partitions are sized by
spark.sql.shuffle.partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rc_rag_spark.queries.core import dec


def with_watermark(df: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Event-time watermark on ts (late data beyond `delay` dropped)."""
    return df.withWatermark("ts", delay) if df.isStreaming else df


def tumbling_counts(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Per-(window, event_type) counts + exact value sums."""
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value", 12, 2)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Overlapping sliding-window counts (each event lands in
    window/slide windows)."""
    return (
        df.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value", 12, 2)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "sum_value",
        )
    )


def session_aggregate(df: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows (gap-merged). Session end is
    last-event + gap (Spark session_window semantics)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value", 12, 2)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def daily_user_activity(df: DataFrame) -> DataFrame:
    """Distinct users + counts per day (streaming-safe distinct via
    approx in streaming mode is out of scope here; exact count for
    batch oracle, per-day grouping)."""
    return (
        df.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def dedup_events(df: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming-safe exact dedup by event_id. In streaming mode the
    watermark bounds the dedup state (dropDuplicatesWithinWatermark);
    in batch it degenerates to dropDuplicates."""
    if df.isStreaming:
        return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return df.dropDuplicates(["event_id"])


def stateful_user_totals(df: DataFrame) -> DataFrame:
    """Custom stateful operator (reference-free north-star surface):
    running per-user totals via applyInPandasWithState in streaming,
    plain aggregation in batch (identical final answer on a bounded
    input — asserted in tests)."""
    if not df.isStreaming:
        return df.groupBy("user_id").agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(dec("value", 12, 2)).cast("double").alias("sum_value"),
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import decimal

        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault('stateful_user_totals')

        import pandas as pd

        n, nv, total = state.get if state.exists else (0, 0, "0")
        total = decimal.Decimal(total)
        for pdf in pdfs:
            n += len(pdf)
            # HALF_UP matches Spark's decimal(12,2) cast in the batch
            # twin (Python Decimal.quantize defaults to HALF_EVEN and
            # would diverge on e.g. 0.125); NULL values are skipped,
            # matching F.sum — and nv tracks whether ANY non-null value
            # was seen, because F.sum of an all-NULL group is NULL,
            # not 0
            vals = [
                decimal.Decimal(str(v)).quantize(
                    decimal.Decimal("0.01"),
                    rounding=decimal.ROUND_HALF_UP,
                )
                for v in pdf["value"]
                if v is not None and v == v
            ]
            nv += len(vals)
            total += sum(vals, decimal.Decimal(0))
        state.update((n, nv, str(total)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [float(total) if nv else None],
            }
        )

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        stateStructType="n bigint, nv bigint, total string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval equi-join: pairs with equal
    keys and ``right_time ∈ [left_time + lower, left_time + upper)``.
    ``how``: inner or left_outer — outer rows emit with NULL right
    columns once the watermark passes their join interval (batch mode
    emits them immediately).

    In streaming mode both inputs get event-time watermarks and the
    interval condition itself bounds join state: Spark retains only
    rows inside watermark + interval, so state is O(rate × interval),
    independent of history. In batch mode the same expression runs as
    an ordinary join — for large batch inputs prefer
    operators.temporal.banded_range_join, which rewrites this exact
    predicate as a bucketed equi-join (the two are equivalence-tested
    in tests/test_streaming.py)."""
    if upper_seconds <= lower_seconds:
        raise ValueError("interval_join: need lower < upper")
    if not on:
        raise ValueError("interval_join: need at least one key column")
    if how not in ("inner", "left_outer"):
        raise ValueError(f"interval_join: how must be inner|left_outer, got {how!r}")
    l = (
        left.withWatermark(left_time, left_watermark)
        if left.isStreaming else left
    )
    r = (
        right.withWatermark(right_time, right_watermark)
        if right.isStreaming else right
    )
    cond = None
    for k in on:
        c = l[k] == r[k]
        cond = c if cond is None else (cond & c)
    lt, rt = l[left_time], r[right_time]
    cond = (
        cond
        & (rt >= lt + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (rt < lt + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return l.join(r, cond, how)


def read_stream_dir(spark, path: str, schema) -> DataFrame:
    """File-source streaming read of a parquet directory with an
    explicit schema (file streams require one — no inference pass)."""
    return spark.readStream.schema(schema).parquet(path)


def foreach_batch_sink(
    stream_df: DataFrame,
    batch_fn,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Production sink pattern: route each micro-batch through an
    arbitrary BATCH writer (upserts, partitioned parquet, JDBC — the
    sinks Structured Streaming lacks natively). batch_fn(df, batch_id)
    runs on the driver per micro-batch with a normal batch DataFrame;
    exactly-once comes from the checkpoint + an idempotent batch_fn
    (key on batch_id). Returns the started StreamingQuery."""
    writer = stream_df.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_user_totals_tws(df: DataFrame) -> DataFrame:
    """Spark-4 `transformWithStateInPandas` twin of
    ``stateful_user_totals``: the same running per-user totals written
    against the new StatefulProcessor API (typed value state, timer
    support, state TTL — the successor to applyInPandasWithState).
    Batch input degenerates to the identical plain aggregation.

    Requires the RocksDB state-store provider in streaming mode (the
    operator's state lives off-heap and scales past executor memory —
    exactly the 100 TB posture; HDFS-backed in-memory state would cap
    per-executor key cardinality).
    """
    if not df.isStreaming:
        return df.groupBy("user_id").agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(dec("value", 12, 2)).cast("double").alias("sum_value"),
        )
    return _tws_totals(df)


def user_totals_tws_batch(df: DataFrame) -> DataFrame:
    """The REAL transformWithStateInPandas path driven by a BATCH
    DataFrame (Spark 4 executes the operator with a per-query RocksDB
    state store and the same Python state-server protocol as
    streaming) — unlike stateful_user_totals_tws, which degenerates
    batch input to a plain aggregation. Batch mode needs the
    StateStoreCoordinator that the StreamingQueryManager owns; merely
    touching spark.streams instantiates it (otherwise every task dies
    with RpcEndpointNotFoundException: StateStoreCoordinator)."""
    _ = df.sparkSession.streams.active
    return _tws_totals(df)


def _tws_totals(df: DataFrame) -> DataFrame:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, nv BIGINT, total STRING"
            )

        def handleInputRows(self, key, rows, timerValues):
            import decimal

            import pandas as pd

            if self._state.exists():
                n, nv, total = self._state.get()
            else:
                n, nv, total = 0, 0, "0"
            total = decimal.Decimal(total)
            for pdf in rows:
                n += len(pdf)
                # HALF_UP + NULL-skip + all-NULL-is-NULL: see
                # stateful_user_totals
                vals = [
                    decimal.Decimal(str(v)).quantize(
                        decimal.Decimal("0.01"),
                        rounding=decimal.ROUND_HALF_UP,
                    )
                    for v in pdf["value"]
                    if v is not None and v == v
                ]
                nv += len(vals)
                total += sum(vals, decimal.Decimal(0))
            self._state.update((n, nv, str(total)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [float(total) if nv else None],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


def cdc_latest(df: DataFrame) -> DataFrame:
    """CDC 'latest record wins' compaction (the q162 semantics) in
    both modes: per primary key (user_id), keep the max-(ts, event_id)
    change; error-typed events act as deletes. Batch = one window over
    the pk shuffle. Streaming = applyInPandasWithState holding one
    (ts, id, value, op) tuple per key — O(keys) state, emitted in
    update mode; downstream consumers drop keys whose latest op is a
    delete (the batch twin filters them directly)."""
    if not df.isStreaming:
        from pyspark.sql.window import Window as W_

        chg = df.select(
            "event_id",
            F.col("user_id").alias("pk"),
            "ts",
            "value",
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("upsert")
            .alias("op"),
        )
        w = W_.partitionBy("pk").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            chg.select("*", F.row_number().over(w).alias("rn"))
            .where(F.col("rn") == 1)
            .select("pk", F.col("event_id").alias("last_event_id"),
                    F.col("ts").alias("last_ts"),
                    F.col("value").alias("last_value"), "op")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        from rc_rag_spark.faultinject import maybe_inject_fault

        maybe_inject_fault('stateful_latest_by_pk')
        cur = state.get if state.exists else None
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                op = "delete" if row.event_type == "error" else "upsert"
                ts_us = int(row.ts.value // 1_000)  # pandas ns -> µs
                # NULL value must flow through as NULL (the batch twin
                # emits last_value NULL), not crash the state task
                v = None if row.value is None or row.value != row.value                     else float(row.value)
                cand = (ts_us, int(row.event_id), v, op)
                if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                    cur = cand
        state.update(cur)
        yield pd.DataFrame(
            {
                "pk": [key[0]],
                "last_event_id": [cur[1]],
                "last_ts": [pd.Timestamp(cur[0], unit="us")],
                "last_value": [cur[2]],
                "op": [cur[3]],
            }
        )

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "pk bigint, last_event_id bigint, last_ts timestamp, "
            "last_value double, op string"
        ),
        stateStructType=(
            "ts_us bigint, event_id bigint, value double, op string"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
