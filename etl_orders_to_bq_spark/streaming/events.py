"""Structured Streaming over event streams.

The reference is batch-only (SURVEY.md §2.2: no streaming anywhere), so
this module is a scale extension: the same event-table semantics exposed
as an unbounded stream with event-time watermarks. The transformations
are built once and shared between batch and streaming DataFrames —
Structured Streaming's contract is exactly that a streaming query is the
incrementalized version of the batch plan.

Scale notes
-----------
- watermark bounds state: without it a windowed agg keeps every window
  open forever; 10 min lateness here, tune per pipeline.
- ``windowed_event_counts`` shuffles on (window, event_type) — the
  standard streaming-agg exchange; state lives in the state store
  partitioned the same way.
- ``sessionize_events`` uses ``session_window`` (gap-based), Spark's
  native session operator — no custom state management needed. The
  fully custom-state path (applyInPandasWithState) is demonstrated in
  tests for API parity, with the same gap semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based event stream: each new parquet file in ``path`` is a
    micro-batch. In production this is the same code with a Kafka source."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data bound.

    Works on both batch and streaming inputs (same plan, incrementalized
    when streaming).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_event_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup: duplicate events (retries,
    at-least-once sources) are dropped; the watermark bounds the dedup
    state (a key older than the watermark can be forgotten — Spark's
    dropDuplicatesWithinWatermark).

    Batch inputs fall back to plain dropDuplicates (no state to bound).
    """
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: pair each left event with right events of
    the same key within ``within`` AFTER the left event.

    Both sides carry watermarks + the time-range join condition — that
    pair is what lets Spark bound join state (left rows older than
    watermark+range are evicted). The canonical funnel/attribution op.

    ``how="left_outer"`` additionally emits unmatched left events once
    the watermark has passed the end of their match window (state
    eviction time) — attribution with explicit "no conversion" rows.
    ``how="full_outer"`` also emits unmatched RIGHT events once the
    watermark passes their timestamp (no earlier left can still
    arrive) — conversions with no attributable click.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(f"unsupported stream-stream join type: {how}")
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).select(
        # full_outer's right-unmatched rows have a null l_key
        F.coalesce("l_key", "r_key").alias(key),
        "l_event_id",
        "r_event_id",
        "l_ts",
        "r_ts",
        "r_value",
    )


def sessionize_events(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other
    merge into one session; emits session bounds + activity rollup."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def quota_flags(
    events: DataFrame,
    quota: int,
    window: str = "6 hours",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user rate-limit violations over tumbling windows — the
    abuse/throttling detector an event platform runs continuously:
    any (window, user) whose event count exceeds ``quota`` is
    flagged with its count and overage.

    Works on batch and streaming inputs (same plan, incrementalized
    when streaming); streaming runs append-mode, so only
    watermark-finalized windows emit — a flag is final, never
    retracted. State is one counter per (window, user): bounded by
    active users per window and evicted by the watermark.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", window).alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") > int(quota))
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
            (F.col("n_events") - F.lit(int(quota))).alias("overage"),
        )
    )
