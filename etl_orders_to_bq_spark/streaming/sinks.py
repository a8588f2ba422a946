"""Streaming sinks with exactly-once delivery.

``stream_to_parquet`` wires the checkpointed file sink: offsets + sink
metadata live in ``checkpoint_dir``, so a restarted query resumes from
the last committed micro-batch and never duplicates output — the
exactly-once contract Structured Streaming gives for file sinks.

``foreach_batch_writer`` is the escape hatch for sinks without native
streaming support (JDBC, BigQuery): the wrapped batch function receives
(DataFrame, batch_id); idempotency across restarts is the writer's job,
keyed on batch_id (the checkpoint replays the LAST uncommitted batch).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_to_parquet(
    df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """Checkpointed parquet sink; ``available_now`` drains all pending
    input then stops (batch-style run of a streaming pipeline)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_writer(
    df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run ``batch_fn(batch_df, batch_id)`` per micro-batch with
    checkpoint tracking (use batch_id for idempotent writes)."""
    writer = df.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
