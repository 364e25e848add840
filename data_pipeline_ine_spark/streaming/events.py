"""Streaming over the events table: file-source ingestion, watermarked
tumbling windows, and gap-based sessionization with custom state.

Batch/stream symmetry: ``tumbling_counts`` produces the same result as the
batch ``q_tumbling_6h`` query when the stream is drained with
``Trigger.AvailableNow`` — the property tests/test_streaming.py asserts.

Scale notes:
- Watermark bounds state: late events beyond the watermark are dropped and
  window state is evicted, so state size tracks the watermark horizon, not
  the stream length.
- ``maxFilesPerTrigger`` paces micro-batches for backfill over a large
  landing directory.
- Sessionization uses ``applyInPandasWithState`` — per-key state travels
  with the shuffle, so it scales horizontally with key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Logical schema of the events stream with ``ts`` left as a placeholder —
# streaming sources can't infer, and the physical timestamp type varies by
# generator (TIMESTAMP(NANOS) lands as raw int64 under the legacy flag;
# MICROS lands as TimestampType or TimestampNTZType). ``read_event_stream``
# probes the landing files once and fills in the real ``ts`` type.
_EVENT_FIELDS = (
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),  # placeholder; replaced per probe
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events landing directory (new parquet
    files become micro-batches).

    The physical ``ts`` type is probed from the landing files with one
    static read — the same schema-driven branch the batch registry uses
    (``sources/registry.py``), never a unit assumption:

    - TIMESTAMP(NANOS): the legacy flag reads it as raw int64; the stream
      declares LongType and rebuilds event time at microsecond precision.
    - TIMESTAMP(MICROS): declared at its probed type directly; an NTZ
      variant is cast to TIMESTAMP because watermarks reject NTZ
      (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).

    Values are treated as UTC instants; run streaming jobs with
    ``spark.sql.session.timeZone=UTC`` (the session factory default) for
    wall-clock-stable window bounds.

    An EMPTY landing directory (stream started before the first file
    lands — the normal deploy order) falls back to the LongType
    placeholder schema instead of failing stream construction; the
    raw-int64 branch then handles the first files when they arrive
    (ADVICE r3). Producers that write non-nanos timestamps must have
    landed at least one file first, since the probe is construction-time.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ts_type = spark.read.parquet(path).schema["ts"].dataType
    except Exception:
        # no files yet — schema can't be inferred; keep the declared
        # placeholder (int64 nanos, the generator's physical type)
        ts_type = T.LongType()
    schema = T.StructType(
        [
            T.StructField("ts", ts_type) if f.name == "ts" else f
            for f in _EVENT_FIELDS
        ]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts(
    events: DataFrame, window: str = "6 hours", watermark: str = "1 day"
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type — the
    streaming twin of the batch ``tumbling_6h`` contract query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key arriving
    within the watermark horizon (at-least-once source → effectively-once
    sink). ``dropDuplicatesWithinWatermark`` evicts key state once the
    watermark passes, so state is bounded by horizon × key arrival rate —
    a plain ``dropDuplicates`` on a stream would grow state forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: the static dimension broadcasts to
    every micro-batch; no stream-side state, no shuffle of the stream."""
    return events.join(F.broadcast(dim), on=on, how="left")


def stream_stream_attribution(
    events: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: purchases matched to clicks by the same
    user within the preceding ``window_seconds`` — the streaming twin of the
    batch ``windowed_range_join`` query.

    Both sides carry a watermark and the join condition bounds event-time
    distance, so the state store can evict: a click's state lives only until
    the watermark passes ``click_ts + window`` — without the time bound a
    stream-stream join's state grows forever."""
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS"))
        & (F.col("click_ts") < F.col("purchase_ts"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", F.col("p_user").alias("user_id"), "purchase_ts",
        "click_ts", "click_value",
    )


def write_stream_layered(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str | None = None,
):
    """Stream → layered parquet via ``foreachBatch``: each micro-batch
    appends through the same batch writer the rest of the engine uses, so
    one sink implementation serves both modes (the lambda-architecture
    killer). The checkpoint makes delivery effectively-once: a replayed
    micro-batch overwrites its own output deterministically rather than
    appending twice only when the sink itself is idempotent — for plain
    appends, rely on the checkpoint's exactly-once batch tracking.

    Returns the started StreamingQuery (AvailableNow trigger: drain
    everything pending, then stop — the backfill/cron shape)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.mode("append")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(path)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


SESSION_SCHEMA = (
    "user_id long, session_start timestamp_ntz, session_end timestamp_ntz, n_events int"
)
_STATE_SCHEMA = "start long, last long, n int"


def sessionize(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 day"
) -> DataFrame:
    """Gap-based sessionization with explicit per-user state
    (``applyInPandasWithState``): a session closes when no event arrives
    within ``gap_minutes``; closed sessions are emitted, the open one stays
    in state until the event-time timeout fires.

    State is bounded: each update arms an ``EventTimeTimeout`` at
    ``last_event + gap``, so once the watermark passes a user's gap horizon
    the open session is emitted and the state entry removed. (With
    ``NoTimeout`` a user who stops sending events would pin state forever
    and their final session would never be emitted.)

    The state function is fully self-contained (local imports only): Python
    workers don't share the driver's sys.path (see operators/multimodal.py).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as _pd

        (user_id,) = key

        def emit(rows):
            df = _pd.DataFrame(
                rows, columns=["user_id", "session_start", "session_end", "n_events"]
            )
            df["session_start"] = _pd.to_datetime(df["session_start"], unit="us")
            df["session_end"] = _pd.to_datetime(df["session_end"], unit="us")
            return df

        if state.hasTimedOut:
            # watermark passed last+gap with no new events: the open
            # session is final — emit it and drop the state entry
            start, last, n = state.get
            state.remove()
            if start is not None:
                yield emit([(user_id, start, last, n)])
            return

        ts_list = []
        for pdf in pdfs:
            ts_list.extend(int(t.value) // 1000 for t in _pd.to_datetime(pdf["ts"]))
        ts_list.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        out = []
        for t in ts_list:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                out.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        if last is not None:
            # event-time timeout timestamps are epoch MILLIseconds; a late
            # event can put last+gap behind the watermark, and a timeout in
            # the past is rejected — clamp to just past the watermark so
            # the session closes on the next watermark advance instead
            timeout_ms = last // 1000 + gap_minutes * 60 * 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
        if out:
            yield emit(out)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
