"""Streaming MERGE upsert — maintain a keyed table from a CDC stream
via ``foreachBatch``, the standard pattern for sinks without native
streaming MERGE (the Structured Streaming guide's documented shape for
"stream into a warehouse table"; Delta/Iceberg provide the same loop
natively with file-level transactions).

State model (versioned parquet snapshots):

- the current table lives at ``{root}/v{batch_id}`` — each micro-batch
  writes a FULL new version merging its changes into the previous one;
- readers pick the highest ``v*`` directory containing ``_SUCCESS``;
- a replayed micro-batch (restart after crash: the checkpoint re-runs
  the last uncommitted batch) rewrites ITS OWN version directory —
  idempotent, so the sink is effectively exactly-once without relying
  on the writer being transactional.

Merge semantics (sequence-protected log compaction):

- within a batch, the highest-``seq`` change per key wins;
- across the target, a change applies only if its ``seq`` is >= the
  stored row's ``seq`` — so the FINAL state is the global
  max-``seq``-per-key row regardless of how the stream was cut into
  micro-batches (batch boundaries carry no meaning);
- deletes are kept as TOMBSTONES (a flag column, filtered at read
  time) rather than physically removed: a late-arriving update older
  than the delete must lose, which requires remembering the delete's
  ``seq``. Tombstone compaction (dropping tombstones older than the
  source's max lateness) is a retention policy knob at scale.

Scale notes (100 TB)
--------------------
- each batch costs one key-shuffle full-outer join of (snapshot,
  batch-compacted changes) — the identical cost envelope as batch
  ``operators/merge.py``; bucket the snapshot versions on the key to
  make successive merges exchange-free;
- full-snapshot rewrite per batch is the no-transactional-format
  price; on Delta/Iceberg the same ``foreachBatch`` body becomes a
  MERGE INTO with file-level pruning. The versioned-directory scheme
  is exactly what those formats automate;
- the within-batch compaction window partitions on the key — bounded
  by per-batch change volume, no global window.

Reference: the reference engine's sink truncates or appends only
(etl/bq_client.py:20-32); upsert maintenance is an explicit-absence
extension (SURVEY.md §2.2 streaming family).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .sinks import foreach_batch_writer


def _latest_version_dir(root: str, before_batch: int | None = None) -> str | None:
    """Highest committed ``v*`` directory; ``before_batch`` excludes
    versions >= that batch id — a REPLAYED micro-batch must merge into
    its predecessor's state, never read the version it is about to
    overwrite (Spark's lazy scan would otherwise read a directory the
    write is deleting)."""
    if not os.path.isdir(root):
        return None
    best = None
    for name in sorted(os.listdir(root)):
        if not name.startswith("v"):
            continue
        try:
            num = int(name[1:])
        except ValueError:
            continue
        if before_batch is not None and num >= before_batch:
            continue
        if os.path.exists(os.path.join(root, name, "_SUCCESS")):
            best = os.path.join(root, name)
    return best


def read_merged_table(spark: SparkSession, root: str) -> DataFrame | None:
    """Current table state: latest committed version minus tombstones.
    None when no version has committed yet."""
    latest = _latest_version_dir(root)
    if latest is None:
        return None
    return (
        spark.read.parquet(latest)
        .filter(~F.col("__tombstone"))
        .drop("__tombstone")
    )


def stream_merge_upsert(
    stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the keyed table at ``root`` from a CDC stream whose
    rows carry ``op`` ('I'/'U'/'D') and a monotone ``seq``. Returns
    the streaming query (caller awaits termination); read the result
    with ``read_merged_table``."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
        src = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("__tombstone", F.col(op_col) == "D")
            .drop(op_col)
        )
        cur = None
        latest = _latest_version_dir(root, before_batch=batch_id)
        if latest is not None:
            cur = spark.read.parquet(latest)
        if cur is None:
            new = src
        else:
            non_keys = [c for c in cur.columns if c not in keys]
            t = cur.withColumn("__t_present", F.lit(True))
            s = src.select(
                *[F.col(k).alias(f"__s_{k}") for k in keys],
                *[F.col(c).alias(f"__s_{c}") for c in non_keys],
            ).withColumn("__s_present", F.lit(True))
            cond = t[keys[0]].eqNullSafe(F.col(f"__s_{keys[0]}"))
            for k in keys[1:]:
                cond = cond & t[k].eqNullSafe(F.col(f"__s_{k}"))
            joined = t.join(s, on=cond, how="full_outer")
            # source wins on a new key, or when its seq is >= the
            # stored row's (late old changes lose; replays are no-ops)
            src_wins = F.col("__s_present").isNotNull() & (
                F.col("__t_present").isNull()
                | (F.col(f"__s_{seq_col}") >= t[seq_col])
            )
            out = [
                F.when(src_wins, F.col(f"__s_{k}")).otherwise(t[k]).alias(k)
                for k in keys
            ] + [
                F.when(src_wins, F.col(f"__s_{c}")).otherwise(t[c]).alias(c)
                for c in non_keys
            ]
            new = joined.select(*out)
        target = os.path.join(root, f"v{batch_id:020d}")
        new.write.mode("overwrite").parquet(target)

    return foreach_batch_writer(
        stream, apply_batch, checkpoint_dir, available_now
    )
