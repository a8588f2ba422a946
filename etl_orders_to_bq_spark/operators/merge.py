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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of a table into a change log: one row per key
    that changed, with ``op`` in ``I`` (insert: key only in ``new``),
    ``U`` (update: key in both, any compared column differs null-safely),
    ``D`` (delete: key only in ``old``) — the inverse of ``apply_cdc``
    (``apply_cdc(old, snapshot_diff(old, new)) == new``), which is how
    incremental pipelines turn vendor full-dumps into CDC streams.

    Output carries the key columns, ``op``, and the NEW values of the
    compared columns (null for deletes). Unchanged keys are absent.
    ``compare_cols=[]`` gives a membership-only diff (I/D, never U).
    NULL key values never join (standard equality), so a null-keyed
    row surfaces as D from the old side / I from the new side rather
    than pairing up.

    Scale: one full-outer join on the key — the one unavoidable
    shuffle; change detection is a null-safe column comparison
    projection. Snapshots of 100 TB diff at the cost of one
    co-partitioned join; bucket both snapshots on the key to make it
    exchange-free.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # compare_cols=[] is a legitimate membership-only diff — only None
    # means "every non-key column"
    cmp_cols = (
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )

    # presence is tracked with explicit literal flags, NOT key
    # null-ness: a corrupt row with a NULL key column must still show
    # up as I (new side) / D (old side), not be misclassified
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in cmp_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in cmp_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        e = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = e if cond is None else (cond & e)
    j = o.join(n, cond, "full_outer")

    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    changed = F.lit(False)
    for c in cmp_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    op = (
        F.when(in_old & in_new, F.when(changed, F.lit("U")))
        .when(in_new, F.lit("I"))
        .otherwise(F.lit("D"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
                for k in keys
            ],
            "op",
            *[F.col(f"__n_{c}").alias(c) for c in cmp_cols],
        )
    )


def survivorship(
    df: DataFrame,
    key_cols: list[str] | str,
    order_col: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Golden-record construction: collapse duplicate records per key
    into one survivor by taking, for EACH value column independently,
    the first non-null value in ``order_col`` priority order
    (descending — highest priority / most recent first). This is the
    standard MDM survivorship rule: a fresher record wins per FIELD,
    but its nulls never erase an older record's data — which is why
    plain first-occurrence dedup (whole-row winner) is the wrong tool
    for merging partial duplicates.

    Output: one row per key with the surviving value columns and
    ``n_merged`` (how many records collapsed).

    Scale: ONE groupBy on the key with per-column max_by over
    (value-is-not-null, priority) — map-side combinable, no window
    sort, no per-key collect.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # None means "all non-key columns"; an explicit [] is a caller bug
    # (a survivor with no value columns is just dedup) — reject it
    # rather than silently reinterpreting it, mirroring snapshot_diff's
    # None-vs-[] distinction.
    if value_cols is not None and len(value_cols) == 0:
        raise ValueError(
            "survivorship: value_cols=[] selects no columns; pass None "
            "for all non-key columns"
        )
    vals = (
        list(value_cols)
        if value_cols is not None
        else [c for c in df.columns if c not in keys and c != order_col]
    )
    aggs = []
    for c in vals:
        # rank null-valued records below every non-null one, then by
        # priority: max_by picks the highest-priority NON-NULL value
        # (or null if the column is null in every duplicate)
        rank = F.struct(
            F.col(c).isNotNull().cast("int").alias("has"),
            F.col(order_col).alias("pri"),
        )
        aggs.append(F.max_by(c, rank).alias(c))
    aggs.append(F.count("*").alias("n_merged"))
    return df.groupBy(*keys).agg(*aggs)
