"""Skew-mitigation operators.

At 100 TB a handful of hot keys (the null key, a default id, one viral
user) can pin an entire shuffle on one task. AQE's skew-join splitting
handles sort-merge joins; these helpers cover the cases AQE does not:
hot-key aggregation and broadcast-ineligible joins with a known skewed
probe side.

- ``salted_agg``: two-stage aggregation — stage 1 groups on
  (key, salt) spreading a hot key over N reducers, stage 2 merges the
  partials. Works for any algebraic aggregate (sum/count/min/max).
- ``salted_left_join``: explodes the build side N ways and salts the
  probe side, so one hot probe key hashes to N tasks instead of 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, buckets) — deterministic per row via
    a hash of the whole row is NOT used on purpose: ``rand`` spreads
    identical rows too, which is exactly what a hot key needs."""
    return df.withColumn(col_name, (F.rand(seed=42) * buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps column -> {"sum","count","min","max"}; the result
    column is named ``{fn}_{col}``. Equivalent to a direct groupBy
    (same result, bit-for-bit for count/min/max; sum differs only by
    float re-association) but no single reducer ever sees more than
    ~1/buckets of a hot key's rows.
    """
    stage1_aggs = []
    stage2_aggs = []
    for c, fn in aggs.items():
        name = f"{fn}_{c}"
        if fn == "count":
            stage1_aggs.append(F.count(c).alias(name))
            stage2_aggs.append(F.sum(name).alias(name))
        elif fn == "sum":
            stage1_aggs.append(F.sum(c).alias(name))
            stage2_aggs.append(F.sum(name).alias(name))
        elif fn == "min":
            stage1_aggs.append(F.min(c).alias(name))
            stage2_aggs.append(F.min(name).alias(name))
        elif fn == "max":
            stage1_aggs.append(F.max(c).alias(name))
            stage2_aggs.append(F.max(name).alias(name))
        else:
            raise ValueError(f"unsupported agg: {fn}")
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*stage1_aggs)
    return partial.groupBy(*keys).agg(*stage2_aggs)


def salted_left_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe left equi-join for a broadcast-ineligible dim.

    Probe side gets a random salt; build side is exploded ``buckets``
    times (one copy per salt value) so every (key, salt) pair finds its
    match. Build-side cost: x``buckets`` rows shuffled — use only when
    the probe side's key histogram is actually skewed.
    """
    salted_left = with_salt(left, buckets)
    exploded_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_left.join(exploded_right, on=[on, "__salt"], how="left")
    return out.drop("__salt")
