"""Table maintenance: small-file compaction.

Streaming sinks and fine-grained partition writes produce many small
files; at scale the NameNode/listing cost and per-file open overhead
dominate scans long before data size does. ``compact_parquet``
rewrites a parquet directory into ~``target_mb`` files.

Safety: writes to a temp sibling dir, validates the row count, then
swaps via two renames. The original is never removed before the
compacted output is validated; there remains a brief window between the
two renames where a new reader sees no directory — plain parquet has no
atomic swap (table formats with transactions — Delta/Iceberg — close
that window natively; use them where concurrent readers matter).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
) -> dict:
    """Rewrite ``path`` (a parquet dir) into ceil(bytes/target_mb)
    files. Returns {files_before, files_after, bytes}."""

    def _parquet_files(p: str) -> list[str]:
        out = []
        for root, _, files in os.walk(p):
            out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
        return out

    before = _parquet_files(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    rows_before = df.count()
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)

    # validate the rewrite BEFORE touching the original: a corrupt or
    # short compacted output must never cost the source data
    rows_after = spark.read.parquet(tmp).count()
    if rows_after != rows_before:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction produced {rows_after} rows, expected {rows_before}; "
            f"original left untouched at {path}"
        )

    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)

    return {
        "files_before": len(before),
        "files_after": len(_parquet_files(path)),
        "bytes": total_bytes,
    }
