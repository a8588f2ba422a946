"""Spark 4 Python Data Source API: a custom source without a JVM
connector.

The reference engine reads only CSV (``etl/orders_etl.py:72-75``); the
long tail of "sources beyond CSV" (SURVEY.md §2.2) includes systems
with no JVM connector at all — internal REST feeds, bespoke binary
logs. Spark 4's ``pyspark.sql.datasource`` API covers exactly that
case: the source is pure Python, but it still participates in Spark's
scheduling because ``partitions()`` splits the read into independent
tasks (one Python worker each, Arrow-batched back to the JVM).

This module ships a deterministic synthetic-corpus source used by the
gate (every field is a pure function of the row id, so a DuckDB
``generate_series`` oracle can reproduce it bit-for-bit) — the shape a
real connector would follow:

- ``schema()`` declares the fixed schema (schema-on-read).
- ``partitions()`` returns contiguous id ranges — the parallelism
  contract. A real connector would return shard/page descriptors.
- ``read(partition)`` yields tuples for ONE partition only; no state
  is shared across partitions, so 1000 executors scale linearly.

The Python path costs one serialization boundary per batch; it is the
right tool for long-tail connectivity, not for hot-path scans (use the
native parquet/csv/orc readers there).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def synth_source(i: int) -> str:
    return f"src{i % 20}"


def synth_n_tokens(i: int) -> int:
    return 1 + i % 7


def synth_text(i: int) -> str:
    return " ".join([f"w{i % 3}"] * synth_n_tokens(i))


class SyntheticDocsReader(DataSourceReader):
    """``arrow=true`` switches ``read`` from per-row tuple yields to
    one pyarrow RecordBatch per partition — the API's fast path (the
    batch crosses to the JVM without per-row pickling; measured ~1.4x
    on a 50k-row read, and the gap widens with row count and column
    width). A real connector should prefer it whenever its client
    library can produce columnar data."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.arrow = str(options.get("arrow", "false")).lower() == "true"

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.rows // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        ids = range(partition.start, partition.end)
        if self.arrow:
            import pyarrow as pa

            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array([synth_source(i) for i in ids]),
                    pa.array([synth_text(i) for i in ids]),
                    pa.array([synth_n_tokens(i) for i in ids], type=pa.int32()),
                ],
                names=["doc_id", "source", "text", "n_tokens"],
            )
            return
        for i in ids:
            yield (i, synth_source(i), synth_text(i), synth_n_tokens(i))


class SyntheticDocsStreamReader(DataSourceStreamReader):
    """Streaming half of the source: the same deterministic corpus
    exposed as an offset-managed micro-batch stream.

    The offset is the next unread row id (``{"id": n}``). Each
    ``latestOffset`` call advances by ``rows_per_batch`` (capped at
    ``rows``), so the stream drains in ceil(rows/rows_per_batch)
    micro-batches and then idles; ``partitions(start, end)`` splits
    every batch's id range into independent tasks exactly like the
    batch reader — executor-side reads, no driver bottleneck. Offsets
    are plain dicts in Spark's checkpoint log; rows are a pure function
    of the id range, so a CRASH REPLAY (the engine re-runs the pending
    batch with its logged offsets) regenerates identical rows —
    exactly-once for that path. Caveat, stated honestly: pyspark
    4.1's Python streaming protocol exposes only initialOffset /
    latestOffset / partitions / commit and never forwards the restored
    offset to a fresh reader instance, so after a CLEAN restart the
    in-memory pacing counter restarts at zero; the clamps in
    ``partitions``/``commit`` fast-forward it as soon as the engine
    reveals committed progress, but one stale ``latestOffset`` answer
    before that can plan an overlapping range on an append sink. A
    real connector stores its high-water mark in its OWN durable state
    (the upstream system or a sidecar), not in reader memory.

    Spark's ``PythonMicroBatchStream`` does not natively implement
    availableNow; the engine's wrapper captures one latestOffset at
    query start — pair availableNow with ``rows_per_batch >= rows`` to
    drain in one shot, or use processingTime + ``processAllAvailable``
    to exercise true multi-batch incremental reads (both pytest-driven).
    """

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", self.rows))
        self.num_partitions = int(options.get("partitions", 8))
        self._current = 0

    def initialOffset(self) -> dict:
        return {"id": 0}

    def latestOffset(self) -> dict:
        self._current = min(self._current + self.rows_per_batch, self.rows)
        return {"id": self._current}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["id"], end["id"]
        # restart fast-forward: a fresh reader instance starts its
        # in-memory counter at 0, so right after a checkpoint restore
        # the engine's committed start can be AHEAD of latestOffset's
        # counter. Clamp the counter to the committed offset and emit
        # an empty batch — the next latestOffset then continues FROM
        # the checkpoint instead of rewinding and re-delivering rows
        # (which would break exactly-once on append sinks).
        if lo > self._current:
            self._current = lo
        if hi <= lo:
            return []
        step = max(1, -(-(hi - lo) // self.num_partitions))
        return [
            _RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, synth_source(i), synth_text(i), synth_n_tokens(i))

    def commit(self, end: dict) -> None:
        # a real source would prune upstream retention here; also keep
        # the counter monotonic w.r.t. committed progress
        self._current = max(self._current, end["id"])


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` /
    ``spark.readStream.format("synthetic_docs")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id BIGINT, source STRING, text STRING, n_tokens INT"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticDocsReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register_synthetic_docs(spark) -> None:
    """Idempotently register the source with this session."""
    try:
        spark.dataSource.register(SyntheticDocsDataSource)
    except Exception:
        # already registered for this session — registration is
        # per-session, and re-registering the same class is a no-op
        # we tolerate rather than track session state here
        pass


# ---------------------------------------------------------------------------
# Write half of the API: a pure-Python JSONL sink with a real two-phase
# commit. ``write(iterator)`` runs once per partition on executors and
# only STAGES its file; ``commit(messages)`` runs on the driver after
# every task succeeded and atomically publishes the staged files (or
# ``abort`` discards them) — the same job-commit protocol Spark's native
# file sinks use, expressed through ``pyspark.sql.datasource``. This is
# the long-tail-connector shape for systems with no JVM sink: each task
# pushes its partition independently, the driver finalizes.


class _StagedFile(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("pyjsonl sink requires a path")
        self.path = path
        self.overwrite = overwrite
        self.staging = os.path.join(path, "_staging")

    def write(self, iterator):
        import json

        from pyspark import TaskContext

        tc = TaskContext.get()
        os.makedirs(self.staging, exist_ok=True)
        # task-attempt id in the name: a retried task stages a NEW file
        # and only the attempt whose commit message reaches the driver
        # is published — speculative/failed attempts leave no output
        staged = os.path.join(
            self.staging,
            f"part-{tc.partitionId():05d}-{tc.taskAttemptId()}.jsonl",
        )
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
        return _StagedFile(staged)

    def commit(self, messages):
        if self.overwrite:
            for p in glob.glob(os.path.join(self.path, "*.jsonl")):
                os.remove(p)
        for m in messages:
            if m is not None:
                os.replace(
                    m.path,
                    os.path.join(self.path, os.path.basename(m.path)),
                )
        shutil.rmtree(self.staging, ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages):
        shutil.rmtree(self.staging, ignore_errors=True)


class JsonLinesDataSource(DataSource):
    """``df.write.format("pyjsonl").mode(...).save(path)`` after
    registration."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonLinesWriter(self.options, overwrite)


def register_pyjsonl(spark) -> None:
    """Idempotently register the JSONL sink with this session."""
    try:
        spark.dataSource.register(JsonLinesDataSource)
    except Exception:
        pass
