"""MERGE (upsert) as a batch operator.

The reference has no upsert path (its sink truncates or appends,
etl/bq_client.py:20-32); a warehouse engine needs MERGE: update rows
matched by key, insert unmatched source rows, keep unmatched target
rows. Expressed as ONE full-outer shuffle join on the key — the same
cost envelope as any key join, so everything Spark does for joins
(AQE skew splitting, storage-partitioned joins on bucketed tables)
applies. Transactional table formats (Delta/Iceberg) add file-level
conflict handling on top; the row-level semantics are exactly this
plan.

Scale notes
-----------
- one shuffle of each side on the key; bucket both tables on the key
  to make repeated merges exchange-free (sinks/writers.py
  ``write_bucketed_table``);
- the matched-row test is a row-presence flag, not ``coalesce`` on a
  value — a legitimately-NULL source value must still overwrite its
  target, and NULL keys must match via ``eqNullSafe``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a CDC log to a snapshot: each change row carries ``op``
    ('I'/'U'/'D') and a monotone ``seq``; the LAST op per key wins.
    Insert/update upsert the row, delete removes the key.

    Shape: one window (last-op per key, the same WindowGroupLimit
    top-1 as first-occurrence dedup) + one full-outer merge join —
    the standard log-compaction-then-apply plan. At scale, compact the
    log segment first (it is usually << snapshot) and bucket both
    sides on the key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = last.filter(F.col(op_col) != "D").drop(op_col, seq_col)
    deletes = last.filter(F.col(op_col) == "D").select(
        *[F.col(k).alias(f"__d_{k}") for k in keys],
        F.lit(True).alias("__deleted"),
    )
    merged = merge_upsert(snapshot, upserts, keys)
    cond = merged[keys[0]].eqNullSafe(F.col(f"__d_{keys[0]}"))
    for k in keys[1:]:
        cond = cond & merged[k].eqNullSafe(F.col(f"__d_{k}"))
    return (
        merged.join(deletes, on=cond, how="left")
        .filter(F.col("__deleted").isNull())
        .select(*[merged[c] for c in merged.columns])
    )


def merge_aggregates(
    partial_a: DataFrame,
    partial_b: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    count_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Merge two PARTIAL aggregate tables into one — the incremental-
    aggregation primitive: maintain agg(base ∪ delta) as
    merge(agg(base), agg(delta)) without rescanning base. Works for
    any algebraic aggregate (sum/count/min/max; avg = sum/count at
    read time). One union + one map-side-combinable groupBy on keys."""
    both = partial_a.unionByName(partial_b)
    aggs = (
        [F.sum(c).alias(c) for c in (sum_cols or [])]
        + [F.sum(c).alias(c) for c in (count_cols or [])]
        + [F.min(c).alias(c) for c in (min_cols or [])]
        + [F.max(c).alias(c) for c in (max_cols or [])]
    )
    return both.groupBy(*keys).agg(*aggs)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE ``source`` into ``target`` on ``keys``.

    - key matched: take ``update_cols`` (default: every non-key column)
      from source, everything else from target;
    - source-only key: insert the source row;
    - target-only key: keep the target row.

    ``source`` must share the target's schema so inserted rows are
    well-formed.
    """
    non_keys = [c for c in target.columns if c not in keys]
    update_cols = non_keys if update_cols is None else update_cols
    t = target.withColumn("__t_present", F.lit(True))
    s = source.select(
        *[F.col(k).alias(f"__s_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in non_keys],
        F.lit(True).alias("__s_present"),
    )
    cond = t[keys[0]].eqNullSafe(F.col(f"__s_{keys[0]}"))
    for k in keys[1:]:
        cond = cond & t[k].eqNullSafe(F.col(f"__s_{k}"))
    joined = t.join(s, on=cond, how="full_outer")

    matched = F.col("__s_present").isNotNull()
    in_target = F.col("__t_present").isNotNull()
    out_cols = [
        F.when(matched, F.col(f"__s_{k}")).otherwise(t[k]).alias(k)
        for k in keys
    ]
    for c in non_keys:
        src_wins = matched if c in update_cols else ~in_target
        out_cols.append(
            F.when(src_wins, F.col(f"__s_{c}")).otherwise(t[c]).alias(c)
        )
    return joined.select(*out_cols)
