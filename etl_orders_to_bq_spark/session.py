"""SparkSession factory.

Defaults are chosen for correctness-on-local / efficiency-at-scale:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting)
  so the same plan survives a 100x scale-up without retuning.
- Arrow on, so any unavoidable Python stage (pandas UDFs) moves data in
  columnar batches instead of pickled rows.
- Session timezone pinned to UTC so timestamp semantics are stable across
  driver machines (and match the DuckDB oracle).
- ``shuffle_partitions`` defaults to the local core count; on a real
  cluster callers pass ~2-3x total executor cores, and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-orders-to-bq-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime (bloom) filters: on fact-fact joins where one side is
        # selectively filtered (e.g. orders-by-date joining lineitem),
        # inject a bloom filter built from the filtered side into the
        # other side's scan — at 100 TB this prunes most of the probe
        # side before the shuffle. Creation threshold lowered so the
        # mid-size filtered sides in our TPC-H shapes qualify.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            str(64 * 1024 * 1024),
        )
        # keep local runs quiet and fast to start
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
