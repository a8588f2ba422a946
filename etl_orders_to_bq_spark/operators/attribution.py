"""Marketing attribution: assign each conversion event the first and
last touch event (ad click, page view, ...) that preceded it for the
same user.

This is the event-log shape of the as-of join: "latest touch at or
before the conversion time" (last-touch) and "earliest touch overall"
(first-touch), both per user. Rather than joining conversions against
touches (a range join that explodes on active users), the operator
unions both kinds into ONE per-user ordered stream and computes running
first/last non-null touch with a single window — one shuffle on the
user key, linear in events.

No counterpart in the reference engine (SURVEY.md §2.2 — no windows).

Scale notes
-----------
- One window shuffle on ``user_col``; the frame is
  ``rowsBetween(unboundedPreceding, currentRow)``, which Spark
  evaluates streamingly (running accumulator) — no per-row frame scan.
- Hot users (bots) concentrate a partition; cap or salt upstream like
  any hot aggregation key.
- Deterministic total order: ``(ts, is_conversion, event_id)`` — a
  touch that shares the conversion's timestamp sorts before it and is
  therefore attributable; ties between touches resolve by event id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attribute_conversions(
    events: DataFrame,
    touch_types: Sequence[str] = ("click", "view"),
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per conversion: ``(conv_id, user, conv_ts, first_touch_id,
    first_touch_type, last_touch_id, last_touch_type)``.

    Conversions with no preceding touch keep null touch columns (the
    "direct / unattributed" bucket every attribution report carries).
    """
    if conversion_type in touch_types:
        # such a row would be both touch and conversion and attribute
        # to ITSELF as its own last touch — always a config error
        raise ValueError(
            f"conversion_type {conversion_type!r} must not appear in "
            f"touch_types {list(touch_types)!r}"
        )
    is_touch = F.col(type_col).isin(list(touch_types))
    is_conv = F.col(type_col) == conversion_type
    base = events.filter(is_touch | is_conv).select(
        F.col(user_col), F.col(ts_col), F.col(id_col),
        is_conv.cast("int").alias("__is_conv"),
        F.when(is_touch, F.col(id_col)).alias("__tid"),
        F.when(is_touch, F.col(type_col)).alias("__ttype"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, "__is_conv", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.select(
            F.col(id_col).alias("conv_id"),
            F.col(user_col),
            F.col(ts_col).alias("conv_ts"),
            F.col("__is_conv"),
            F.first("__tid", ignorenulls=True).over(w).alias("first_touch_id"),
            F.first("__ttype", ignorenulls=True).over(w).alias("first_touch_type"),
            F.last("__tid", ignorenulls=True).over(w).alias("last_touch_id"),
            F.last("__ttype", ignorenulls=True).over(w).alias("last_touch_type"),
        )
        .filter(F.col("__is_conv") == 1)
        .drop("__is_conv")
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Cohort lifetime-value triangle — the revenue companion to the
    retention triangle (standard growth-accounting practice, public
    literature): users cohorted by first-active ISO week, revenue
    rolled up per (cohort, week offset), and the running cumulative
    divided by cohort size gives LTV-per-user at each age.

    Output: ``(cohort_week, week_offset, cohort_users,
    period_revenue, cum_revenue, ltv_per_user)``.

    Exactness: revenue sums and the running cumulative are DECIMAL —
    exact and order-free — collapsing to double once; LTV is one
    rounded division. The cumulative window partitions by cohort
    over week offsets (calendar-bounded, never data-sized).

    Scale: one per-user min (map-side combinable), one join to tag
    activity with its cohort, one (cohort, offset) groupBy; the
    triangle is |cohorts| x |offsets| rows.
    """
    wk = F.to_date(F.date_trunc("week", F.col(ts_col)))
    first = df.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(wk).alias("__cw")
    )
    dec = F.col(value_col).cast("decimal(18,2)")
    act = df.select(
        F.col(user_col).alias("__u"), wk.alias("__aw"), dec.alias("__v")
    )
    tagged = act.join(first, "__u")
    cells = tagged.groupBy(
        F.col("__cw").alias("cohort_week"),
        F.floor(F.datediff(F.col("__aw"), F.col("__cw")) / 7)
        .cast("int")
        .alias("week_offset"),
    ).agg(F.sum("__v").alias("__rev"))
    sizes = first.groupBy(F.col("__cw").alias("cohort_week")).agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        cells.withColumn("__cum", F.sum("__rev").over(w))
        .join(sizes, "cohort_week")
    )
    return out.select(
        "cohort_week",
        "week_offset",
        "cohort_users",
        F.col("__rev").cast("double").alias("period_revenue"),
        F.col("__cum").cast("double").alias("cum_revenue"),
        F.round(
            F.col("__cum").cast("double") / F.col("cohort_users"), ndigits
        ).alias("ltv_per_user"),
    )
