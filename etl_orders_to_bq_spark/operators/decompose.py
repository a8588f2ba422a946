"""Metric decomposition: why did revenue move between two periods?

The rate/mix (price-volume) decomposition every business review
runs (standard index-number accounting; see e.g. the Laspeyres
decomposition, public literature): with per-segment volume v and
rate r = revenue/volume,

    ΔR_s = (v_B - v_A) · r_A      (volume / mix effect, at OLD rate)
         +  v_B · (r_B - r_A)     (rate effect, at NEW volume)

which telescopes exactly: volume_effect + rate_effect =
rev_B - rev_A per segment (the two-term split assigns the
interaction to the rate term — stated, not hidden).

Determinism: volumes are integer counts, revenues DECIMAL-exact
sums; each rate is ONE rounded division, and the effects are
fixed-order double expressions over those rounded rates, rounded
once. Per-segment rows — no cross-row float accumulation.

Scale: one groupBy(segment, period) over the filtered scan
(map-side combinable), then a |segments|-row self-pivot via
conditional aggregation. Nothing after the first aggregate is
data-sized.

No counterpart in the reference engine (SURVEY.md §2.2 — no
aggregation family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mix_shift(
    df: DataFrame,
    segment_col: str,
    period_col: Column,
    revenue_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Decompose the revenue move between two periods per segment.

    ``period_col`` must evaluate to 'A' / 'B' (rows mapping to
    neither are dropped). Output per segment: ``(segment, vol_a,
    vol_b, rev_a, rev_b, rate_a, rate_b, volume_effect,
    rate_effect)``; a segment absent from a period carries zero
    volume/revenue and a NULL rate, which the formulas treat as
    rate 0 — so a NEW segment's whole move lands in the RATE term
    (volume_effect = vol_b·0 = 0, rate_effect = vol_b·rate_b =
    rev_b) and a DISAPPEARED segment's in the volume term
    (-vol_a·rate_a = -rev_a). Explicit zeros, never NaN.
    """
    dec = F.col(revenue_col).cast("decimal(18,2)")
    tagged = df.withColumn("__p", period_col).filter(
        F.col("__p").isin(["A", "B"])
    )
    cells = tagged.groupBy(F.col(segment_col).alias("segment")).agg(
        F.sum(F.when(F.col("__p") == "A", 1).otherwise(0))
        .cast("long")
        .alias("vol_a"),
        F.sum(F.when(F.col("__p") == "B", 1).otherwise(0))
        .cast("long")
        .alias("vol_b"),
        F.coalesce(
            F.sum(F.when(F.col("__p") == "A", dec)), F.lit(0)
        )
        .cast("decimal(18,2)")
        .alias("rev_a"),
        F.coalesce(
            F.sum(F.when(F.col("__p") == "B", dec)), F.lit(0)
        )
        .cast("decimal(18,2)")
        .alias("rev_b"),
    )
    rate_a = F.when(
        F.col("vol_a") > 0,
        F.round(F.col("rev_a").cast("double") / F.col("vol_a"), ndigits),
    )
    rate_b = F.when(
        F.col("vol_b") > 0,
        F.round(F.col("rev_b").cast("double") / F.col("vol_b"), ndigits),
    )
    rated = cells.withColumn("rate_a", rate_a).withColumn("rate_b", rate_b)
    ra0 = F.coalesce(F.col("rate_a"), F.lit(0.0))
    rb0 = F.coalesce(F.col("rate_b"), F.lit(0.0))
    vol_eff = F.round(
        (F.col("vol_b") - F.col("vol_a")).cast("double") * ra0, ndigits
    )
    rate_eff = F.round(
        F.col("vol_b").cast("double") * (rb0 - ra0), ndigits
    )
    return rated.select(
        "segment",
        "vol_a",
        "vol_b",
        F.col("rev_a").cast("double").alias("rev_a"),
        F.col("rev_b").cast("double").alias("rev_b"),
        "rate_a",
        "rate_b",
        vol_eff.alias("volume_effect"),
        rate_eff.alias("rate_effect"),
    )
