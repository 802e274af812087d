"""Structured-Streaming batch-equivalence tests: each windowing
function run as a file-source stream (availableNow) must produce
exactly the batch result on the same data."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from rc_rag_spark.sources import table
from rc_rag_spark.streaming import windows as W


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    """Events re-written as clean µs-timestamp parquet (file streams
    need a plain schema) split into several files to get multiple
    input splits."""
    d = tempfile.mkdtemp(prefix="rc_rag_events_")
    table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def run_stream(spark, stream_df, output_mode="complete"):
    name = "mem_" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table(name).collect()
    q.stop()
    return out


def canon(rows, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in rows)


def batch_events(spark, events_dir):
    return spark.read.parquet(events_dir)


def stream_events(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return W.read_stream_dir(spark, events_dir, schema)


@pytest.mark.parametrize(
    "fn,cols",
    [
        (lambda df: W.tumbling_counts(df, "1 hour"),
         ["window_start", "window_end", "event_type", "n", "sum_value"]),
        (lambda df: W.sliding_counts(df, "1 hour", "30 minutes"),
         ["window_start", "window_end", "n", "sum_value"]),
        (lambda df: W.session_aggregate(df, "10 minutes"),
         ["user_id", "session_start", "session_end", "n_events", "sum_value"]),
    ],
    ids=["tumbling", "sliding", "session"],
)
def test_stream_batch_equivalence(spark, events_dir, fn, cols):
    batch = fn(batch_events(spark, events_dir)).collect()
    stream = run_stream(spark, fn(W.with_watermark(stream_events(spark, events_dir))))
    assert canon(stream, cols) == canon(batch, cols)


def test_streaming_dedup(spark, events_dir):
    """Duplicate every event into a second file set; the streaming
    dedup must restore exact-once counts."""
    d = tempfile.mkdtemp(prefix="rc_rag_dup_")
    try:
        ev = batch_events(spark, events_dir)
        ev.write.mode("overwrite").parquet(d)
        ev.write.mode("append").parquet(d)  # every event twice
        schema = spark.read.parquet(d).schema
        stream = W.read_stream_dir(spark, d, schema)
        deduped = W.dedup_events(stream, watermark="365 days")
        counts = deduped.groupBy("event_type").agg(F.count("*").alias("n"))
        got = run_stream(spark, counts, output_mode="complete")
        want = (
            ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
        )
        assert canon(got, ["event_type", "n"]) == canon(want, ["event_type", "n"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stateful_user_totals_stream(spark, events_dir):
    """applyInPandasWithState running totals == batch aggregation on a
    bounded input (update mode: take the last emitted row per user)."""
    stream = W.stateful_user_totals(stream_events(spark, events_dir))
    rows = run_stream(spark, stream, output_mode="update")
    last = {}
    for r in rows:  # memory sink appends update-mode emissions in order
        last[r["user_id"]] = (r["n_events"], r["sum_value"])
    want = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in W.stateful_user_totals(batch_events(spark, events_dir)).collect()
    }
    assert last == want


def test_late_data_dropped_with_watermark(spark, events_dir):
    """Append-mode tumbling agg with watermark emits only finalized
    windows; with availableNow over one bounded input the final
    watermark covers all but the tail — emitted windows must MATCH the
    batch result for those windows (prefix-correctness)."""
    stream = W.tumbling_counts(
        W.with_watermark(stream_events(spark, events_dir), "1 hour")
    )
    got = run_stream(spark, stream, output_mode="append")
    batch = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in W.tumbling_counts(batch_events(spark, events_dir)).collect()
    }
    assert len(got) > 0
    for r in got:
        key = (str(r["window_start"]), r["event_type"])
        assert batch[key] == (r["n"], r["sum_value"]), key


def test_session_append_mode_prefix_correct(spark, events_dir):
    """Session windows in append mode (watermark-finalized sessions
    only) must be a subset of the batch sessions with equal aggregates."""
    stream = W.session_aggregate(
        W.with_watermark(stream_events(spark, events_dir), "30 minutes"),
        "10 minutes",
    )
    got = run_stream(spark, stream, output_mode="append")
    batch = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]), r["n_events"], r["sum_value"]
        )
        for r in W.session_aggregate(
            batch_events(spark, events_dir), "10 minutes"
        ).collect()
    }
    assert len(got) > 0
    for r in got:
        key = (r["user_id"], str(r["session_start"]))
        assert key in batch, key
        assert batch[key] == (
            str(r["session_end"]), r["n_events"], r["sum_value"]
        ), key


def test_stream_stream_interval_join_matches_banded(spark, events_dir):
    """Equivalence triangle: the streaming interval join, the same
    expression in batch, and the bucketed banded_range_join must all
    produce the same (error, prior-click) pair multiset."""
    from rc_rag_spark.operators.temporal import banded_range_join

    def split(df):
        errors = df.where(F.col("event_type") == "error").select(
            "event_id", F.col("user_id").alias("user_id"), "ts"
        )
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("user_id"), F.col("ts").alias("click_ts")
        )
        return errors, clicks

    # batch: banded (bucketed equi-join) formulation
    be, bc = split(batch_events(spark, events_dir))
    banded = banded_range_join(
        be, bc, on=["user_id"], left_time="ts", right_time="click_ts",
        lower_seconds=-300, upper_seconds=0,
    ).select("event_id", "click_ts")

    # streaming: interval join over two streams of the same source
    se, sc = split(stream_events(spark, events_dir))
    joined = W.interval_join(
        se, sc, on=["user_id"], left_time="ts", right_time="click_ts",
        lower_seconds=-300, upper_seconds=0,
    ).select("event_id", "click_ts")
    stream_rows = run_stream(spark, joined, output_mode="append")

    cols = ["event_id", "click_ts"]
    assert canon(stream_rows, cols) == canon(banded.collect(), cols)


def test_foreach_batch_sink_writes_batches(spark, events_dir, tmp_path):
    """foreachBatch routes micro-batches through a batch writer: the
    union of written batches must equal the input."""
    from rc_rag_spark.streaming.windows import foreach_batch_sink

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(df, batch_id):
        df.write.mode("append").parquet(out_dir)

    stream = stream_events(spark, events_dir).select("event_id", "user_id")
    q = foreach_batch_sink(stream, write_batch, ckpt)
    q.awaitTermination(120)
    q.stop()
    got = sorted(r["event_id"] for r in spark.read.parquet(out_dir).collect())
    want = sorted(
        r["event_id"]
        for r in batch_events(spark, events_dir).select("event_id").collect()
    )
    assert got == want


def test_stream_stream_left_outer_interval_join(spark, events_dir):
    """Left-outer stream-stream join, prefix-correct: every emitted row
    matches the batch left-outer result, and only tail rows whose join
    interval the FINAL watermark never passes may be withheld (Spark
    emits outer NULLs only once the watermark clears the interval — on
    a bounded input the last events' intervals are never cleared)."""

    def split(df):
        errors = df.where(F.col("event_type") == "error").select(
            "event_id", "user_id", "ts"
        )
        clicks = df.where(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("click_ts")
        )
        return errors, clicks

    be, bc = split(batch_events(spark, events_dir))
    batch = W.interval_join(
        be, bc, on=["user_id"], left_time="ts", right_time="click_ts",
        lower_seconds=-300, upper_seconds=0, how="left_outer",
    ).select("event_id", "click_ts")

    se, sc = split(stream_events(spark, events_dir))
    joined = W.interval_join(
        se, sc, on=["user_id"], left_time="ts", right_time="click_ts",
        lower_seconds=-300, upper_seconds=0, how="left_outer",
    ).select("event_id", "click_ts")
    stream_rows = run_stream(spark, joined, output_mode="append")

    cols = ["event_id", "click_ts"]
    got = canon(stream_rows, cols)
    want = canon(batch.collect(), cols)
    # emitted rows are exactly a sub-multiset of the batch result…
    from collections import Counter

    missing = Counter(want) - Counter(got)
    extra = Counter(got) - Counter(want)
    assert not extra, f"rows not in batch result: {list(extra)[:3]}"
    # …and only a handful of watermark-tail rows may be withheld
    assert sum(missing.values()) <= 3, f"too many withheld: {list(missing)[:5]}"
    assert len(got) >= 0.95 * len(want)


def test_session_late_event_beyond_watermark_dropped(spark):
    """Explicit late-data drop (SURVEY §5.5): an event arriving in a
    LATER micro-batch, with event time inside an already-finalized
    session but behind the watermark, must be excluded from the
    session's aggregate — batch mode (no watermark) would count it.

    THREE parquet files processed as separate micro-batches
    (maxFilesPerTrigger=1, mtime-ordered). File 1 carries the session
    (10:00/10:02/10:04) plus a 14:00 watermark-driver event; file 2 a
    second 14:01 driver event; file 3 only the 10:01 straggler. Spark
    filters late rows with the PREVIOUS batch's watermark
    (watermarkForLateEvents lags watermarkForEviction by one batch
    since the 3.4 multi-stateful-operator rework), so the straggler
    must land in batch 2 — where the late-events watermark is already
    13:30, far past the session's 10:14 end — to be dropped; the
    finalized session keeps n_events=3."""
    import time

    d = tempfile.mkdtemp(prefix="rc_rag_late_")
    try:
        schema = "event_id long, user_id long, ts timestamp, value double"

        def write_one(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            time.sleep(1.1)  # distinct mtimes order the micro-batches

        ts = lambda s: __import__("datetime").datetime.fromisoformat(s)  # noqa: E731
        write_one(
            [
                (1, 1, ts("2024-01-01 10:00:00"), 1.0),
                (2, 1, ts("2024-01-01 10:02:00"), 2.0),
                (3, 1, ts("2024-01-01 10:04:00"), 3.0),
                (4, 99, ts("2024-01-01 14:00:00"), 9.0),  # drives watermark
            ]
        )
        write_one([(6, 99, ts("2024-01-01 14:01:00"), 9.0)])  # batch 1
        write_one([(5, 1, ts("2024-01-01 10:01:00"), 50.0)])  # late straggler

        src_schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(src_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        sess = W.session_aggregate(
            W.with_watermark(stream, "30 minutes"), "10 minutes"
        )
        got = run_stream(spark, sess, output_mode="append")
        by_user = {r["user_id"]: r for r in got}
        # the user-1 session finalized WITHOUT the straggler
        assert 1 in by_user, got
        assert by_user[1]["n_events"] == 3
        assert by_user[1]["sum_value"] == pytest.approx(6.0)
        # sanity: batch mode (no watermark) WOULD absorb the straggler
        batch = {
            r["user_id"]: r
            for r in W.session_aggregate(
                spark.read.parquet(d), "10 minutes"
            ).collect()
        }
        assert batch[1]["n_events"] == 4
        assert batch[1]["sum_value"] == pytest.approx(56.0)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stateful_user_totals_transform_with_state(spark, events_dir):
    """transformWithStateInPandas (Spark-4 StatefulProcessor) running
    totals == batch aggregation == the applyInPandasWithState twin.
    Needs the RocksDB state store provider (scoped to this test) and a
    protobuf runtime for the state-server wire format: where the real
    google.protobuf is absent, rc_rag_spark.vendor's pbshim (a minimal
    pure-Python wire-format runtime) stands in — this live run IS its
    end-to-end validation, since the JVM state server parses every
    request the shim serializes and the shim parses every JVM
    response."""
    from rc_rag_spark.vendor import ensure_protobuf_shim

    ensure_protobuf_shim(spark)  # no-op when real protobuf installed
    conf = spark.conf
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = conf.get(key, None)
    try:
        conf.set(
            key,
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
        stream = W.stateful_user_totals_tws(stream_events(spark, events_dir))
        rows = run_stream(spark, stream, output_mode="update")
        last = {}
        for r in rows:
            last[r["user_id"]] = (r["n_events"], r["sum_value"])
        want = {
            r["user_id"]: (r["n_events"], r["sum_value"])
            for r in W.stateful_user_totals_tws(
                batch_events(spark, events_dir)
            ).collect()
        }
        assert last == want
    finally:
        if saved is None:
            conf.unset(key)
        else:
            conf.set(key, saved)


def test_tws_list_and_map_state_batch(spark, events_dir):
    """transformWithStateInPandas with LIST state and MAP state in
    batch mode — exercises the remaining state-server wire surface
    (ListStateCall appendValue/get, MapStateCall containsKey/getValue/
    updateValue/keys) through whatever protobuf runtime is active (the
    vendored shim here), checked against a plain aggregation twin."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from rc_rag_spark.vendor import ensure_protobuf_shim

    ensure_protobuf_shim(spark)
    _ = spark.streams.active  # StateStoreCoordinator for batch mode

    class PerTypeCounts(StatefulProcessor):
        def init(self, handle):
            self._chunks = handle.getListState("chunks", "n BIGINT")
            self._by_type = handle.getMapState(
                "by_type", "et STRING", "c BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            for pdf in rows:
                self._chunks.appendValue((len(pdf),))
                for et, cnt in pdf["event_type"].value_counts().items():
                    prev = (
                        self._by_type.getValue((et,))[0]
                        if self._by_type.containsKey((et,))
                        else 0
                    )
                    self._by_type.updateValue((et,), (prev + int(cnt),))
            list_sum = sum(t[0] for t in self._chunks.get())
            n_types = sum(1 for _ in self._by_type.keys())
            map_sum = sum(v[0] for _, v in self._by_type.iterator())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "list_sum": [list_sum],
                    "n_types": [n_types],
                    "map_sum": [map_sum],
                }
            )

        def close(self):
            pass

    ev = batch_events(spark, events_dir)
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=PerTypeCounts(),
        outputStructType=(
            "user_id bigint, list_sum bigint, n_types bigint, "
            "map_sum bigint"
        ),
        outputMode="Update",
        timeMode="None",
    )
    got = {
        r["user_id"]: (r["list_sum"], r["n_types"], r["map_sum"])
        for r in out.collect()
    }
    want = {
        r["user_id"]: (r["n"], r["t"], r["n"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("event_type").alias("t"),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_tws_initial_state_seeds_totals(spark, events_dir):
    """transformWithStateInPandas with INITIAL STATE — the warm-start
    path a migration uses (seed the new stateful query from a batch
    snapshot instead of reprocessing history): totals seeded from the
    first half of events via handleInitialState, then the second half
    processed as input, must equal one aggregation over ALL events."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from rc_rag_spark.vendor import ensure_protobuf_shim

    ensure_protobuf_shim(spark)
    _ = spark.streams.active  # StateStoreCoordinator for batch mode

    ev = batch_events(spark, events_dir)
    cut = ev.agg(F.expr("percentile(event_id, 0.5)")).first()[0]
    first_half = ev.where(F.col("event_id") <= cut)
    second_half = ev.where(F.col("event_id") > cut)
    seed = first_half.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n0")
    )

    class SeededCounts(StatefulProcessor):
        def init(self, handle):
            self._n = handle.getValueState("n", "n BIGINT")

        def handleInitialState(self, key, initialState, timerValues):
            self._n.update((int(initialState["n0"]),))

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

        def close(self):
            pass

    out = second_half.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SeededCounts(),
        outputStructType="user_id bigint, n bigint",
        outputMode="Update",
        timeMode="None",
        initialState=seed.groupBy("user_id"),
    )
    got = {r["user_id"]: r["n"] for r in out.collect()}
    want = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        # keys with no second-half rows emit nothing in update mode
        if r["user_id"] in got
    }
    assert got == want and len(got) > 0
    # and the seed genuinely contributed: totals exceed second-half-only
    second_only = {
        r["user_id"]: r["n"]
        for r in second_half.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert any(got[u] > second_only.get(u, 0) for u in got)


def test_tws_event_time_timers_fire_on_watermark(spark):
    """transformWithStateInPandas with EVENT-TIME TIMERS: each key
    registers a timer 5 minutes after its first event; when the
    watermark passes the timer, handleExpiredTimer emits the key's
    finalized count. Deterministic by construction: user 1's events
    sit hours before user 99's, so the batch-1 watermark (13:30)
    expires user 1's 10:05 timer while user 99's own 14:05 timer is
    never reached. Exercises the RegisterTimer / ExpiryTimerRequest /
    TimerValueRequest wire paths end-to-end through the active
    protobuf runtime (the vendored shim here)."""
    import time as _time

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from rc_rag_spark.vendor import ensure_protobuf_shim

    ensure_protobuf_shim(spark)

    d = tempfile.mkdtemp(prefix="rc_rag_twstimer_")
    conf = spark.conf
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = conf.get(key, None)
    conf.set(
        key,
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        schema = "event_id long, user_id long, ts timestamp, value double"

        def write_one(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            _time.sleep(1.1)  # distinct mtimes order the micro-batches

        ts = lambda s: __import__("datetime").datetime.fromisoformat(s)  # noqa: E731
        write_one(
            [
                (1, 1, ts("2024-01-01 10:00:00"), 1.0),
                (2, 1, ts("2024-01-01 10:02:00"), 2.0),
                (3, 1, ts("2024-01-01 10:04:00"), 3.0),
                (4, 99, ts("2024-01-01 14:00:00"), 9.0),
            ]
        )
        write_one([(5, 99, ts("2024-01-01 14:01:00"), 9.0)])
        write_one([(6, 99, ts("2024-01-01 14:02:00"), 9.0)])

        class FinalizeAfterQuiet(StatefulProcessor):
            def init(self, handle):
                self._handle = handle
                self._n = handle.getValueState("n", "n BIGINT")

            def handleInputRows(self, key, rows, timerValues):
                import pandas as pd

                first = not self._n.exists()
                n = 0 if first else self._n.get()[0]
                first_ts = None
                for pdf in rows:
                    n += len(pdf)
                    t = pdf["ts"].min()
                    if first_ts is None or t < first_ts:
                        first_ts = t
                if first:
                    expiry_ms = int(first_ts.timestamp() * 1000) + 300_000
                    self._handle.registerTimer(expiry_ms)
                self._n.update((n,))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "phase": ["live"], "n": [n]}
                )

            def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
                import pandas as pd

                n = self._n.get()[0] if self._n.exists() else 0
                self._n.clear()
                yield pd.DataFrame(
                    {"user_id": [key[0]], "phase": ["final"], "n": [n]}
                )

            def close(self):
                pass

        src_schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(src_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .withWatermark("ts", "30 minutes")
        )
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=FinalizeAfterQuiet(),
            outputStructType="user_id bigint, phase string, n bigint",
            outputMode="Update",
            timeMode="EventTime",
        )
        rows = run_stream(spark, out, output_mode="update")
        finals = {
            r["user_id"]: r["n"] for r in rows if r["phase"] == "final"
        }
        lives = [r for r in rows if r["phase"] == "live"]
        assert finals == {1: 3}, rows  # user 1 finalized with all 3
        assert any(r["user_id"] == 99 for r in lives)  # 99 stayed live
    finally:
        if saved is None:
            conf.unset(key)
        else:
            conf.set(key, saved)
        shutil.rmtree(d, ignore_errors=True)


def test_cdc_latest_stream_matches_batch(spark, events_dir):
    """Streaming latest-wins CDC compaction == the batch window form
    (update mode: last emission per key is the compacted state)."""
    stream = W.cdc_latest(stream_events(spark, events_dir))
    rows = run_stream(spark, stream, output_mode="update")
    last = {}
    for r in rows:
        last[r["pk"]] = (
            r["last_event_id"], str(r["last_ts"]), r["last_value"], r["op"]
        )
    want = {
        r["pk"]: (
            r["last_event_id"], str(r["last_ts"]), r["last_value"], r["op"]
        )
        for r in W.cdc_latest(batch_events(spark, events_dir)).collect()
    }
    assert last == want and len(want) > 0


def test_cdc_latest_null_value_survives(spark, events_dir):
    """A NULL `value` on the latest change must flow through the
    streaming state as NULL (matching the batch twin), not crash the
    state task; NULL values inside totals are skipped like F.sum."""
    import tempfile as _tf

    d = _tf.mkdtemp(prefix="rc_rag_nullv_")
    try:
        ev = batch_events(spark, events_dir).limit(50)
        # null out value on the globally-latest rows per a few users
        nulled = ev.withColumn(
            "value",
            F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
                F.col("value")
            ),
        )
        nulled.write.mode("overwrite").parquet(d)
        schema = spark.read.parquet(d).schema
        stream = W.cdc_latest(W.read_stream_dir(spark, d, schema))
        rows = run_stream(spark, stream, output_mode="update")
        last = {}
        for r in rows:
            last[r["pk"]] = (r["last_event_id"], r["last_value"])
        want = {
            r["pk"]: (r["last_event_id"], r["last_value"])
            for r in W.cdc_latest(spark.read.parquet(d)).collect()
        }
        assert last == want and len(want) > 0
        assert any(v[1] is None for v in want.values())  # nulls exercised

        totals_stream = W.stateful_user_totals(
            W.read_stream_dir(spark, d, schema)
        )
        got = {}
        for r in run_stream(spark, totals_stream, output_mode="update"):
            got[r["user_id"]] = (r["n_events"], r["sum_value"])
        want_t = {
            r["user_id"]: (r["n_events"], r["sum_value"])
            for r in W.stateful_user_totals(spark.read.parquet(d)).collect()
        }
        assert got == want_t
    finally:
        import shutil as _sh

        _sh.rmtree(d, ignore_errors=True)


def _rate_stream(spark, rows_per_batch=20):
    """Deterministic rate source: batch b emits value ∈
    [b·R, (b+1)·R) — so the exact input prefix any committed batch
    has seen is reconstructable, and a batch twin can run on it."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", 2)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )


def _run_live_batches(stream_df, output_mode, min_batches=4, timeout=300):
    """Run a REAL unbounded StreamingQuery (processingTime trigger, not
    availableNow) until >= min_batches micro-batches committed, then
    stop. Returns (rows, max committed batchId)."""
    import time

    name = "mem_" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(processingTime="0 seconds")
        .start()
    )
    spark = stream_df.sparkSession
    t0 = time.time()
    while time.time() - t0 < timeout:
        lp = q.lastProgress
        if lp is not None and lp["batchId"] >= min_batches:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    committed = [p["batchId"] for p in q.recentProgress]
    assert committed and max(committed) >= min_batches, (
        f"only {committed} batches committed within {timeout}s"
    )
    return spark.table(name).collect(), max(committed)


def _cdc_events(df):
    """Map rate rows to the CDC event schema by pure functions of
    `value`, so stream and batch twin derive identical rows."""
    return df.select(
        F.col("value").alias("event_id"),
        (F.col("value") % 7).alias("user_id"),
        F.timestamp_seconds(F.col("value")).alias("ts"),
        F.when(F.col("value") % 11 == 0, "error")
        .otherwise("click")
        .alias("event_type"),
        (F.col("value") * 1.5).alias("value"),
    )


def test_cdc_latest_live_micro_batches_match_batch_twin(spark):
    """cdc_latest through >= 4 LIVE micro-batches of a rate source
    (unbounded query, processingTime trigger — not availableNow):
    folding the update-mode emissions per key must equal the batch
    twin over exactly the committed input prefix."""
    R = 20
    rows, max_batch = _run_live_batches(
        W.cdc_latest(_cdc_events(_rate_stream(spark, R))), "update"
    )
    n_input = (max_batch + 1) * R
    # fold emissions: per key, the max-(ts, event_id) emission is the
    # final state; drop rows from any batch past the last committed
    # one (stop() can abort a batch mid-flight)
    last = {}
    for r in rows:
        if r["last_event_id"] >= n_input:
            continue
        key = r["pk"]
        cand = (str(r["last_ts"]), r["last_event_id"], r["last_value"], r["op"])
        if key not in last or (cand[0], cand[1]) > (last[key][0], last[key][1]):
            last[key] = cand
    twin = {
        r["pk"]: (str(r["last_ts"]), r["last_event_id"], r["last_value"], r["op"])
        for r in W.cdc_latest(
            _cdc_events(spark.range(n_input).select(F.col("id").alias("value")))
        ).collect()
    }
    assert len(twin) == 7  # every user_id mod-7 class seen
    assert last == twin


def test_interval_join_live_micro_batches_match_batch_twin(spark):
    """Stream-stream interval join across >= 4 LIVE micro-batches of
    two rate sources. Key = value % 5, click at t=10v, purchase at
    t=10w+5, window [0, 60) -> pairs (v, v) and (v, v+5); the latter
    crosses a micro-batch boundary for the last 5 clicks of every
    batch, so join state must survive between batches. Soundness:
    every emitted pair is in the batch twin. Completeness: every twin
    pair whose BOTH sides were committed must have been emitted (inner
    join emits when the later side arrives; watermark only evicts)."""
    R = 20
    # +1000s offset: a row with event time exactly at the epoch sits ON
    # the initial watermark (0) and is filtered as late in batch 0
    clicks = _rate_stream(spark, R).select(
        (F.col("value") % 5).alias("k"),
        F.col("value").alias("click_v"),
        F.timestamp_seconds(F.col("value") * 10 + 1000).alias("click_ts"),
    )
    purchases = _rate_stream(spark, R).select(
        (F.col("value") % 5).alias("k"),
        F.col("value").alias("purchase_v"),
        F.timestamp_seconds(F.col("value") * 10 + 1005).alias("purchase_ts"),
    )
    joined = W.interval_join(
        clicks, purchases, on=["k"],
        left_time="click_ts", right_time="purchase_ts",
        lower_seconds=0, upper_seconds=60,
        left_watermark="10 seconds", right_watermark="10 seconds",
    ).select("click_v", "purchase_v")
    rows, max_batch = _run_live_batches(joined, "append")
    got = {(r["click_v"], r["purchase_v"]) for r in rows}

    def twin_pairs(n):
        return {
            (v, w)
            for v in range(n)
            for w in (v, v + 5)
            if w < n
        }

    n_committed = (max_batch + 1) * R
    # soundness: nothing outside the twin over the committed input
    # (+1 batch of slack for a stop()-aborted in-flight batch)
    assert got <= twin_pairs(n_committed + R)
    # completeness: both-sides-committed pairs all emitted
    must_have = twin_pairs(n_committed)
    assert must_have <= got
    # and the cross-batch pairs specifically arrived
    cross = {(v, v + 5) for b in range(max_batch)
             for v in range(b * R + R - 5, b * R + R)}
    assert cross <= got


def test_statestore_reader_matches_batch_counts(spark, events_dir):
    """State-store data source (`spark.read.format("statestore")`,
    SPARK-45511): after an availableNow streaming aggregation drains a
    file source, reading the checkpoint's state directly must yield
    exactly the batch groupBy counts — the ops surface for inspecting
    (and debugging) live streaming state without stopping a job."""
    import tempfile as _tf

    ckpt = _tf.mkdtemp(prefix="rc_rag_ss_ckpt_")
    try:
        schema = spark.read.parquet(events_dir).schema
        stream = (
            W.read_stream_dir(spark, events_dir, schema)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
        )
        name = "mem_" + uuid.uuid4().hex[:8]
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        state = spark.read.format("statestore").load(ckpt)
        got = {
            r["key"]["user_id"]: r["value"]["count"]
            for r in state.collect()
        }
        want = {
            r["user_id"]: r["n"]
            for r in spark.read.parquet(events_dir)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want and len(want) > 0
    finally:
        import shutil as _sh

        _sh.rmtree(ckpt, ignore_errors=True)


def test_tws_gap_sessionization_matches_builtin_session_window(
    spark, events_dir
):
    """A custom transformWithStateInPandas gap sessionizer must
    reproduce the built-in session_window aggregation exactly (per
    user: sessions split on >30-minute idle gaps; compare session
    start, end = last event + gap, and event count). Built-in and
    custom implementations share no code path — the built-in is a
    Catalyst aggregate, the custom one splits inside an Arrow batch —
    so agreement pins the gap semantics themselves."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from rc_rag_spark.vendor import ensure_protobuf_shim

    ensure_protobuf_shim(spark)
    _ = spark.streams.active  # StateStoreCoordinator for batch mode

    gap = "30 minutes"
    ev = batch_events(spark, events_dir)
    want = (
        ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "n",
        )
    )

    class GapSessions(StatefulProcessor):
        def init(self, handle):
            # batch mode still requires at least one state handle
            self._seen = handle.getValueState("seen", "seen BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            ts = (
                pd.concat([pdf["ts"] for pdf in rows])
                .sort_values()
                .reset_index(drop=True)
            )
            self._seen.update((len(ts),))
            new_session = ts.diff() > pd.Timedelta(minutes=30)
            sid = new_session.cumsum()
            g = ts.groupby(sid)
            out = pd.DataFrame(
                {
                    "user_id": key[0],
                    "s_start": g.min(),
                    "s_end": g.max() + pd.Timedelta(minutes=30),
                    "n": g.count().astype("int64"),
                }
            )
            yield out

        def close(self):
            pass

    got = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=GapSessions(),
        outputStructType="user_id bigint, s_start timestamp, "
        "s_end timestamp, n bigint",
        outputMode="Update",
        timeMode="None",
    )
    cols = ["user_id", "s_start", "s_end", "n"]
    assert canon(got.collect(), cols) == canon(want.collect(), cols)
    # non-trivial: some user actually has >1 session and >1 event
    import collections

    per_user = collections.Counter(r["user_id"] for r in want.collect())
    assert max(per_user.values()) > 1


def test_tws_checkpoint_restart_restores_state_and_timers(spark):
    """transformWithStateInPandas across a STOP/RESTART — the
    streaming mirror of the DS-API kill-during-commit discipline: a
    second query started on the SAME checkpoint with a FRESH processor
    instance must (a) restore the RocksDB value state (the running
    total continues from 3, it does not reset), (b) not reprocess the
    already-committed input file (the file-source log is part of the
    checkpoint), and (c) fire a timer REGISTERED BEFORE THE RESTART
    once the post-restart watermark passes it — i.e. timers are
    replayed from the state store, not from the processor object."""
    import time as _time

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from rc_rag_spark.vendor import ensure_protobuf_shim

    ensure_protobuf_shim(spark)

    d = tempfile.mkdtemp(prefix="rc_rag_twsrestart_src_")
    ckpt = tempfile.mkdtemp(prefix="rc_rag_twsrestart_ckpt_")
    conf = spark.conf
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = conf.get(key, None)
    conf.set(
        key,
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        schema = "event_id long, user_id long, ts timestamp, value double"

        def write_one(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            _time.sleep(1.1)  # distinct mtimes order the micro-batches

        ts = lambda s: __import__("datetime").datetime.fromisoformat(s)  # noqa: E731

        class FinalizeAfterQuiet(StatefulProcessor):
            """n-per-key value state; a timer at first event + 5 min;
            'live' rows while counting, one 'final' row on expiry."""

            def init(self, handle):
                self._handle = handle
                self._n = handle.getValueState("n", "n BIGINT")

            def handleInputRows(self, key, rows, timerValues):
                import pandas as pd

                first = not self._n.exists()
                n = 0 if first else self._n.get()[0]
                first_ts = None
                for pdf in rows:
                    n += len(pdf)
                    t = pdf["ts"].min()
                    if first_ts is None or t < first_ts:
                        first_ts = t
                if first:
                    expiry_ms = int(first_ts.timestamp() * 1000) + 300_000
                    self._handle.registerTimer(expiry_ms)
                self._n.update((n,))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "phase": ["live"], "n": [n]}
                )

            def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
                import pandas as pd

                n = self._n.get()[0] if self._n.exists() else 0
                self._n.clear()
                yield pd.DataFrame(
                    {"user_id": [key[0]], "phase": ["final"], "n": [n]}
                )

            def close(self):
                pass

        def run_once(sink: list):
            src_schema = spark.read.parquet(d).schema
            stream = (
                spark.readStream.schema(src_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
                .withWatermark("ts", "30 minutes")
            )
            out = stream.groupBy("user_id").transformWithStateInPandas(
                statefulProcessor=FinalizeAfterQuiet(),
                outputStructType="user_id bigint, phase string, n bigint",
                outputMode="Update",
                timeMode="EventTime",
            )

            def collect(batch_df, _bid):
                sink.extend(
                    (r["user_id"], r["phase"], r["n"])
                    for r in batch_df.collect()
                )

            q = (
                out.writeStream.foreachBatch(collect)
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            q.stop()

        # ---- run 1: three events for user 1; timer lands at 10:05
        write_one(
            [
                (1, 1, ts("2024-01-01 10:00:00"), 1.0),
                (2, 1, ts("2024-01-01 10:02:00"), 2.0),
                (3, 1, ts("2024-01-01 10:04:00"), 3.0),
            ]
        )
        rows1: list = []
        run_once(rows1)
        assert (1, "live", 3) in rows1
        assert not any(p == "final" for _, p, _n in rows1)

        # ---- between runs: one more user-1 event, then a far-future
        # user-99 file that will push the watermark past the timer
        write_one(
            [
                (4, 1, ts("2024-01-01 10:10:00"), 4.0),
                (5, 99, ts("2024-01-01 14:00:00"), 9.0),
            ]
        )
        write_one([(6, 99, ts("2024-01-01 14:01:00"), 9.0)])

        # ---- run 2: fresh processor object, same checkpoint
        rows2: list = []
        run_once(rows2)
        # (a) state restored: the total CONTINUES (3 + 1 = 4); a state
        #     loss would re-register and report 1
        assert (1, "live", 4) in rows2, rows2
        # (b) exactly-once input: file 1's rows are not reprocessed,
        #     so no (1, live, 3) can reappear after restart
        assert (1, "live", 3) not in rows2, rows2
        # (c) the PRE-RESTART timer (10:05) fires once the watermark
        #     (13:30 after the 14:00 file) passes it — with the
        #     restored count, not a reset one
        assert (1, "final", 4) in rows2, rows2
    finally:
        if saved is None:
            conf.unset(key)
        else:
            conf.set(key, saved)
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_survives_empty_files_and_null_fields(spark, events_dir):
    """Degenerate input through the LIVE streaming surface (round 12):
    the input directory contains an EMPTY parquet file (a micro-batch
    with nothing in it — routine for file streams) and rows whose
    value/user_id/event_type are NULL (event time present — event
    logs always stamp time, payload fields go missing). The windowed
    aggregate, watermark dedup, and stateful totals must complete and
    match their batch twins on the SAME dirty input — the
    batch-equivalence oracle applied to the degenerate shape."""
    import pyarrow.parquet as papq

    d = tempfile.mkdtemp(prefix="rc_rag_dirty_stream_")
    try:
        ev = batch_events(spark, events_dir)
        ev.write.mode("overwrite").parquet(d)
        # one file of NULL-field rows (valid ts, every payload column
        # missing) — built generically so schema additions keep working
        dtypes = dict(ev.dtypes)
        nulls = ev.limit(7).select(
            *[
                (F.col("event_id") + 10_000_000).alias("event_id")
                if c == "event_id"
                else F.col("ts").alias("ts")
                if c == "ts"
                else F.lit(None).cast(dtypes[c]).alias(c)
                for c in ev.columns
            ]
        )
        nulls.coalesce(1).write.mode("append").parquet(d)
        # and one genuinely EMPTY parquet file in the stream directory
        schema = papq.read_schema(
            next(
                p for p in sorted(
                    __import__("glob").glob(d + "/part-*.parquet")
                )
            )
        )
        papq.write_table(
            schema.empty_table(), d + "/part-99999-empty.parquet"
        )

        batch = spark.read.parquet(d)
        schema_df = batch.schema
        stream = W.read_stream_dir(spark, d, schema_df)

        # tumbling agg: count(*) per window x type (NULL type is its
        # own group on both sides)
        got = run_stream(
            spark, W.tumbling_counts(W.with_watermark(stream), "1 hour")
        )
        want = W.tumbling_counts(batch, "1 hour").collect()
        cols = ["window_start", "window_end", "event_type", "n"]
        assert canon(got, cols) == canon(want, cols)

        # watermark dedup: exact-once by event_id, NULL fields intact
        got_n = len(
            run_stream(
                spark,
                W.dedup_events(stream, watermark="365 days"),
                output_mode="append",
            )
        )
        assert got_n == batch.dropDuplicates(["event_id"]).count()

        # stateful totals: NULL user_id is a real state key
        rows = run_stream(
            spark, W.stateful_user_totals(stream), output_mode="update"
        )
        last = {}
        for r in rows:
            last[r["user_id"]] = r["n_events"]
        want_totals = {
            r["user_id"]: r["n_events"]
            for r in W.stateful_user_totals(batch).collect()
        }
        assert last == want_totals
        assert None in want_totals  # the NULL key genuinely flowed
    finally:
        shutil.rmtree(d, ignore_errors=True)
