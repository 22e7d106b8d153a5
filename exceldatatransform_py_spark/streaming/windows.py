"""Event-time windowed aggregation (SURVEY.md §2.7 — streaming).

The reference has nothing temporal beyond date arithmetic; the engine
surfaces Spark Structured Streaming's windowing model. Every transform
here is *mode-agnostic*: ``F.window`` / ``F.session_window`` build the
same logical plan on a batch DataFrame and on a streaming DataFrame,
so one implementation serves both, and the batch run doubles as the
oracle-checkable twin of the stream (same operator, same results once
the stream drains — exactly how Structured Streaming defines its
semantics: "the result table equals running the batch query on the
data seen so far").

Streaming specifics (watermarks, late-data drop, output modes) only
attach in ``stream_tumbling_counts`` — the ``readStream`` wrapper used
by the tests, which replays the parquet events table as a file stream.

Scale posture: windowed aggregation shuffles on (key, window) — at
100 TB the state store partitions by the same key, AQE handles skewed
keys in batch, and watermarks bound state size in streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _dec_sum(col: str) -> Column:
    return F.sum(F.col(col).cast("decimal(18,6)")).cast("double")


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "5 minutes",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Fixed, non-overlapping event-time windows.

    Output: ``(window_start, window_end, *keys, n_events, sum_value)``.
    Batch-SQL twin: ``GROUP BY time_bucket(duration, ts)``.
    """
    w = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(w.alias("w"), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n_events"), _dec_sum(value_col).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows
    (an Expand node — same trick as the unpivot, no pre-shuffle
    blow-up past the aggregate).

    Batch-SQL twin: UNION ALL of duration/slide phase-shifted
    ``time_bucket`` groupings.
    """
    w = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(w.alias("w"), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n_events"), _dec_sum(value_col).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    keys: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Dynamic gap-based sessions per key: events closer than ``gap``
    merge into one session; ``window_end`` = last event + gap (Spark's
    session_window definition).

    Output: ``(*keys, session_start, session_end, n_events,
    sum_value)``. Batch-SQL twin: gaps-and-islands (lag + cumulative
    new-session flags) — the classic SQL restatement.
    """
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("w"), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n_events"), _dec_sum(value_col).alias("sum_value"))
        .select(
            *keys,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_tumbling_counts(
    spark: SparkSession,
    events_path: str,
    schema: str,
    ts_col: str = "ts",
    duration: str = "5 minutes",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """The streaming twin of ``tumbling_counts``: file-source replay of
    the events table with a watermark bounding state / dropping late
    data. Callers start it with ``writeStream`` (tests drain it into a
    memory sink with ``trigger(availableNow=True)`` and compare to the
    batch result — the Structured Streaming equivalence contract).
    """
    stream = spark.readStream.schema(schema).format("parquet").load(events_path)
    # Watermarks track an instant, so the event-time column must be
    # TIMESTAMP (with zone), not TIMESTAMP_NTZ; the session runs in
    # UTC so the cast does not move the clock.
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    stream = stream.withWatermark(ts_col, watermark)
    return tumbling_counts(
        stream, ts_col=ts_col, duration=duration, keys=keys, value_col=value_col
    )


def stream_dedup_within_watermark(
    spark: SparkSession,
    events_path: str,
    schema,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it, so state size is O(keys per watermark window)
    instead of O(all keys ever) — the way exactly-once event streams
    are deduped at scale (at-least-once sources re-deliver).

    Batch twin: ``dropDuplicates(id_cols)`` (the batch run of the same
    data has no late arrivals, so the results agree).
    """
    stream = spark.readStream.schema(schema).format("parquet").load(events_path)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    stream = stream.withWatermark(ts_col, watermark)
    return stream.dropDuplicatesWithinWatermark(list(id_cols))


def stateful_user_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    timeout_conf: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running (count, exact decimal-cents sum) maintained in the state
    store across micro-batches; emits the updated totals for every key
    touched by a batch.

    The state is two integers — constant size per key; partitioning is
    by ``key_col`` (the state store shards the same way), so this
    scales like any keyed aggregation. Batch twin: plain
    ``groupBy(key).agg(count, sum)`` once the stream drains.
    """
    import pandas as pd  # local import: only the streaming path needs it
    from pyspark.sql.streaming.state import GroupState

    out_schema = f"{key_col} bigint, n_events bigint, sum_value double"
    state_schema = "n bigint, cents bigint"

    def update(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # exact integer cents (value has ≤6 decimals in testdata);
            # floats would drift across batch boundaries.
            cents += int(round(float(pdf[value_col].sum()) * 1_000_000))
        state.update((n, cents))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "sum_value": [cents / 1_000_000]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout_conf
    )


def stateful_user_totals_tws(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """The same per-key running (count, exact-cents sum) as
    ``stateful_user_totals``, on Spark 4's ``transformWithStateInPandas``
    — the arbitrary-state successor to ``applyInPandasWithState``:
    named, independently-evolvable state variables behind a
    ``StatefulProcessorHandle`` instead of one opaque tuple, plus
    timers/TTL when needed. Requires the RocksDB state store provider
    (the API validates this at query start) AND ``google.protobuf``
    (the JVM↔Python state-server protocol — absent in this container,
    so the drain-equivalence test asserts this twin only where the
    module imports; the ``applyInPandasWithState`` twin above runs
    everywhere).
    State remains sharded by the grouping key, so it scales exactly
    like the keyed aggregation it implements. Batch twin:
    ``groupBy(key).agg(count, sum)``.
    """
    import pandas as pd  # local import: only the streaming path needs it
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n bigint, cents bigint")

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                # exact integer cents (value has <=6 decimals in
                # testdata); floats would drift across batch boundaries.
                cents += int(round(float(pdf[value_col].sum()) * 1_000_000))
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "sum_value": [cents / 1_000_000],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=f"{key_col} bigint, n_events bigint, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


def purchase_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
) -> DataFrame:
    """Interval join: attribute each purchase to same-user clicks in
    the preceding ``attribution_window``. One transform, two modes:
    pass batch DataFrames and it's a plain range join; pass streaming
    DataFrames (both watermarked) and Spark runs it as a stream-stream
    inner join whose state is bounded by the watermark + interval —
    the time bound is what makes unbounded-stream joins finite.

    Output: one row per (click, purchase) match.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}"))
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def stream_purchase_attribution(
    spark: SparkSession,
    path: str,
    schema,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of ``purchase_attribution_join``: two readers on
    the same replayed event log, filtered to each side, watermarked so
    Spark can discard click state older than watermark + interval.
    """
    src = spark.readStream.schema(schema).format("parquet").load(path)
    clicks = src.filter(F.col("event_type") == "click").withWatermark(
        "ts", watermark
    )
    purchases = src.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    return purchase_attribution_join(
        clicks, purchases, attribution_window=attribution_window
    )


def windowed_value_histogram(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "6 hours",
    value_col: str = "value",
    bucket_width: float = 20.0,
    bucket_cap: int = 30,
) -> DataFrame:
    """Per-window histogram of ``value_col`` — the aggregation under a
    streaming drift monitor (the per-window bucket counts a consumer
    compares against a reference distribution; see
    ``plans.queries_events.windowed_drift_curve`` for the batch drift
    curve computed from exactly this shape).

    Output: ``(window_start, window_end, bucket, n_events)``. Bucket =
    ``least(floor(value / width), cap)`` — fixed-width with an
    overflow cap so the per-window state is bounded (cap+1 buckets per
    window) no matter the value distribution. One groupBy, partial
    map-side aggregation; at scale state size = windows-in-watermark ×
    (cap+1) rows.
    """
    w = F.window(F.col(ts_col), duration)
    bucket = F.least(
        F.floor(F.col(value_col) / bucket_width), F.lit(bucket_cap)
    ).cast("bigint")
    return (
        df.groupBy(w.alias("w"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "n_events",
        )
    )


def stream_value_histogram(
    spark: SparkSession,
    events_path: str,
    schema: str,
    ts_col: str = "ts",
    duration: str = "6 hours",
    watermark: str = "30 minutes",
    value_col: str = "value",
    bucket_width: float = 20.0,
    bucket_cap: int = 30,
) -> DataFrame:
    """Streaming twin of ``windowed_value_histogram`` — the live side
    of a drift monitor: file-source replay, watermarked event-time
    windows, bounded per-window bucket state. The drift consumer joins
    the (static, broadcast) reference histogram downstream and alerts
    on the per-window distance; the equivalence test drains this into
    a memory sink and matches the batch histogram exactly."""
    stream = spark.readStream.schema(schema).format("parquet").load(events_path)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    stream = stream.withWatermark(ts_col, watermark)
    return windowed_value_histogram(
        stream,
        ts_col=ts_col,
        duration=duration,
        value_col=value_col,
        bucket_width=bucket_width,
        bucket_cap=bucket_cap,
    )
