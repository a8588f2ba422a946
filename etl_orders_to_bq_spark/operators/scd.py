"""Slowly-changing dimension type 2 (SCD2) merge.

The warehouse-history pattern the reference's overwrite-only BigQuery
sink cannot express: instead of replacing a dimension row, close the
old version (valid_to = change date) and open a new one. One batch of
updates is applied per call.

Plan shape: updates are usually small vs the dimension — the join
broadcasts the updates; output is a union of four disjoint row sets
(untouched / still-open-unchanged / closed-old / new-version), all
computed from ONE join pass. No UDFs, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# open-row sentinel; 2261 (not 9999) so values survive conversion to
# nanosecond timestamps (pandas datetime64[ns] tops out at 2262-04-11)
OPEN_END = "2261-12-31 00:00:00"


def scd2_init(snapshot: DataFrame, effective: str) -> DataFrame:
    """Bootstrap a history table from a first snapshot."""
    return snapshot.withColumn(
        "valid_from", F.lit(effective).cast("timestamp")
    ).withColumn("valid_to", F.lit(OPEN_END).cast("timestamp"))


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective: str,
) -> DataFrame:
    """Apply one update batch at ``effective`` time.

    - changed attrs -> old open row closed at ``effective``, new open
      row inserted;
    - unchanged rows and closed history -> untouched;
    - brand-new keys -> inserted open.
    ``updates`` must be unique per key.
    """
    eff = F.lit(effective).cast("timestamp")
    open_rows = history.filter(F.col("valid_to") == F.lit(OPEN_END).cast("timestamp"))
    closed_rows = history.subtract(open_rows)

    u = broadcast(
        updates.select(
            F.col(key).alias("__u_key"),
            *[F.col(c).alias(f"__u_{c}") for c in attrs],
        )
    )
    j = open_rows.join(u, open_rows[key] == u["__u_key"], "left")

    changed_pred = F.col("__u_key").isNotNull() & ~F.struct(
        *[F.col(c) for c in attrs]
    ).eqNullSafe(F.struct(*[F.col(f"__u_{c}") for c in attrs]))

    hist_cols = history.columns
    untouched_open = j.filter(~changed_pred).select(*hist_cols)
    closed_now = j.filter(changed_pred).select(
        *[F.col(c) for c in hist_cols if c != "valid_to"],
        eff.alias("valid_to"),
    ).select(*hist_cols)
    new_versions = j.filter(changed_pred).select(
        F.col(key),
        *[F.col(f"__u_{c}").alias(c) for c in attrs],
        eff.alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
    ).select(*hist_cols)

    existing_keys = open_rows.select(F.col(key).alias("__k"))
    brand_new = (
        updates.join(existing_keys, updates[key] == F.col("__k"), "left_anti")
        .select(
            F.col(key),
            *[F.col(c) for c in attrs],
            eff.alias("valid_from"),
            F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        )
        .select(*hist_cols)
    )

    return (
        closed_rows.unionByName(untouched_open)
        .unionByName(closed_now)
        .unionByName(new_versions)
        .unionByName(brand_new)
    )
