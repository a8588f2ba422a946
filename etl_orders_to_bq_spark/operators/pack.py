"""Sequence packing — concat-and-chop chunks into fixed token windows.

The last step of a training-data pipeline: chunks are concatenated in
a deterministic order and the token stream is chopped into
``capacity``-token bins (GPT-style document packing; items may
straddle a bin boundary, the trainer masks across the seam).

Scale shape: a GLOBAL packing order would serialize on one task (a
window with no partition key), so the stream is first split into
``buckets`` deterministic md5 partitions and packed independently —
one shuffle, per-bucket windows, at most ``buckets - 1`` partially
filled tail bins of waste. 100 TB of chunks with 1024 buckets packs
in parallel with negligible padding overhead.

Reference: the engine's dedup/chunk operators produce the input; the
md5 bucket uses the same engine-portable idiom as hash_sample so the
SQL oracle reproduces the partitioning bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    chunks: DataFrame,
    token_col: str = "n_tokens",
    order_cols: list[str] | None = None,
    capacity: int = 512,
    buckets: int = 8,
) -> DataFrame:
    """Assign each chunk a (pack_bucket, bin_idx, bin_offset).

    Within a bucket, chunks are laid out end to end in ``order_cols``
    order; ``bin_idx`` = which capacity-window the chunk STARTS in,
    ``bin_offset`` = its start position inside that window. One
    shuffle (the bucket/window exchange); running sum is a streaming
    frame, O(1) state per bucket.
    """
    order_cols = order_cols or ["doc_id", "chunk_idx"]
    bucket = (
        F.conv(F.substring(F.md5(F.col(order_cols[0]).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    ).alias("pack_bucket")
    staged = chunks.withColumn("pack_bucket", bucket)
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(token_col).over(w) - F.col(token_col)).alias("__start")
    staged = staged.withColumn("__start", start)
    return (
        staged.withColumn(
            "bin_idx", F.floor(F.col("__start") / capacity).cast("long")
        )
        .withColumn(
            "bin_offset", (F.col("__start") % capacity).cast("long")
        )
        .drop("__start")
    )
