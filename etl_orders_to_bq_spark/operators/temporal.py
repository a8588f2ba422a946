"""Temporal join operators Spark lacks natively: as-of join.

``asof_join`` matches each left row to the most recent right row at or
before its timestamp, per key — the classic quotes-to-trades join.

Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
formulations collapse at scale: a range join explodes to O(n·m) pairs
per key, and a windowed "latest right per left" via join+filter+rank
shuffles the cross product. This implementation uses the union trick:

    tag left(0)/right(1) rows -> union -> one window per key ordered by
    (ts, tag) -> last non-null right value via last(ignorenulls=True)
    -> keep left rows

Cost: ONE shuffle of |left|+|right| rows and a per-key sort — the same
complexity as a sort-merge join, no pair explosion, no skew beyond the
key histogram. This is the standard scalable as-of pattern on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` sharing key ``on``; nulls when none.

    ``tolerance`` (e.g. "30 minutes") drops matches older than
    left_ts - tolerance, like pandas ``merge_asof(tolerance=...)``.
    """
    l_tagged = left.withColumn("__tag", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_tagged = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        )
        .withColumn("__tag", F.lit(0))
    )

    l_cols = [f for f in l_tagged.columns if f not in ("__tag", "__ts")]
    unioned = l_tagged.select(
        *l_cols,
        "__tag",
        "__ts",
        *[F.lit(None).cast(dict(r_tagged.dtypes)[f"__r_{c}"]).alias(f"__r_{c}") for c in value_cols],
    ).unionByName(
        r_tagged.select(
            *[F.lit(None).cast(dict(l_tagged.dtypes)[c]).alias(c) for c in l_cols if c != on],
            F.col(on),
            "__tag",
            "__ts",
            *[f"__r_{c}" for c in value_cols],
        )
    )

    # right rows (__tag=0) sort before left rows at identical ts, so a
    # right row at exactly left_ts IS matched (<= semantics, like
    # pandas merge_asof and DuckDB ASOF)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *unioned.columns,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
        F.last(
            F.when(F.col("__tag") == 0, F.col("__ts")), ignorenulls=True
        )
        .over(w)
        .alias("__match_ts"),
    )

    out = filled.filter(F.col("__tag") == 1)
    if tolerance is not None:
        in_tol = F.col("__match_ts") >= F.col("__ts") - F.expr(
            f"INTERVAL {tolerance}"
        )
        value_exprs = [
            F.when(in_tol, F.col(f"__f_{c}")).alias(c) for c in value_cols
        ]
    else:
        value_exprs = [F.col(f"__f_{c}").alias(c) for c in value_cols]

    return out.select(*l_cols, *value_exprs)


def merge_intervals(
    df: DataFrame,
    key_cols: list[str] | str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into maximal
    "islands": ``(keys..., island_start, island_end, n_merged)``.

    The interval form of gaps-and-islands: order intervals by
    ``(start, end)`` within each key, flag a new island whenever a
    row's start exceeds the running max end of everything before it,
    and turn the running sum of flags into an island id. Handles
    intervals nested inside earlier ones (the running MAX end, not the
    previous row's end, is what closes an island).

    Scale: one window shuffle on the key, then a groupBy on
    (key, island) that reuses the same partitioning — AQE sees the
    window exchange satisfies the aggregation's distribution. The
    running-max and running-sum frames are streaming (no per-row frame
    rescan).
    """
    gc = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*gc).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new",
        F.when(
            prev_max.isNull() | (F.col(start_col) > prev_max), 1
        ).otherwise(0),
    )
    island = F.sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("__island", island)
        .groupBy(*gc, "__island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count("*").alias("n_merged"),
        )
        .drop("__island")
    )


def interval_audit(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Validity-interval integrity audit — the SCD2/timeline QA an
    entity store runs after every merge: per key, do consecutive
    intervals overlap (double-counted history) or leave gaps
    (lost history)?

    Definition: intervals are ordered per key by (start, end); a pair
    is an OVERLAP when the next start < previous end, a GAP when the
    next start > previous end (half-open [start, end) semantics —
    touching intervals are neither). One global summary row:
    ``(n_keys, n_intervals, n_overlaps, n_gaps, total_gap_days,
    max_gap_days)`` — gap lengths in exact integer days
    (datediff), so the sums are exact.

    Scale: ONE per-key ordered window (partitioned — parallel across
    keys, a key's history bounds its task) for the lag comparisons,
    then a map-side-combinable global rollup. The per-key detail
    frame is the intermediate — callers wanting per-key rows stop
    before the final agg.
    """
    w = Window.partitionBy("__k").orderBy(F.col("__s"), F.col("__e"))
    lagged = df.select(
        F.col(key_col).alias("__k"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
    ).withColumn("__pe", F.lag("__e").over(w))
    flagged = lagged.select(
        "__k",
        F.when(F.col("__pe").isNotNull() & (F.col("__s") < F.col("__pe")), 1)
        .otherwise(0)
        .alias("__ov"),
        F.when(F.col("__pe").isNotNull() & (F.col("__s") > F.col("__pe")), 1)
        .otherwise(0)
        .alias("__gap"),
        F.when(
            F.col("__pe").isNotNull() & (F.col("__s") > F.col("__pe")),
            F.datediff(F.col("__s"), F.col("__pe")),
        )
        .otherwise(0)
        .cast("long")
        .alias("__gapd"),
    )
    return flagged.agg(
        F.count_distinct("__k").cast("long").alias("n_keys"),
        F.count("*").cast("long").alias("n_intervals"),
        F.sum("__ov").cast("long").alias("n_overlaps"),
        F.sum("__gap").cast("long").alias("n_gaps"),
        F.sum("__gapd").cast("long").alias("total_gap_days"),
        F.max("__gapd").cast("long").alias("max_gap_days"),
    )
