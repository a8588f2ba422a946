"""Durable staging for iterative / reused intermediate frames.

Iterative operators (LSH banding, connected components, PageRank) must
materialize an intermediate once and reuse it across rounds — otherwise
Catalyst re-executes the producing pipeline per round and the unrolled
plan grows without bound. Two staging strategies:

- ``localCheckpoint``: stores RDD blocks on executors. Fast (no
  serialization to a filesystem), fine on local[*] and for tests, but
  has NO fault tolerance — on a real cluster, losing one executor
  mid-query kills the job. This is the default for parity with the
  in-memory behavior.
- parquet round-trip (``checkpoint_path=``): write the frame to
  ``{checkpoint_path}/{name}`` and read it back. Durable, resumable,
  and the shape production dedup pipelines use at 100 TB ("write
  signatures, then band"); also gives the reread scan real column
  pruning/pushdown. Slightly slower locally; strictly safer at scale.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def stage(
    df: DataFrame,
    checkpoint_path: str | None = None,
    name: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Materialize ``df`` for reuse across actions/rounds.

    With ``checkpoint_path`` set, writes parquet to
    ``{checkpoint_path}/{name}_{uuid}`` and returns the reread frame —
    durable on any shared filesystem / object store. The per-call uuid
    suffix means two operator invocations sharing a ``checkpoint_path``
    NEVER clobber each other's staged files (an overwrite of a fixed
    path would silently corrupt earlier lazily-returned frames that
    still reference it); retention of the directory is the caller's
    concern, like any checkpoint location. Otherwise falls back to
    ``localCheckpoint(eager=eager)``.
    """
    if checkpoint_path is None:
        return df.localCheckpoint(eager=eager)
    stem = f"{name}_" if name else ""
    target = f"{checkpoint_path.rstrip('/')}/{stem}{uuid.uuid4().hex[:12]}"
    df.write.mode("error").parquet(target)
    return df.sparkSession.read.parquet(target)
