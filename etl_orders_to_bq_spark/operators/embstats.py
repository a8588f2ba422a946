"""Embedding-distribution statistics — the data-quality layer for
vector columns: a corpus whose per-source embedding MEANS drift apart
is mixing sources with different semantics (encoder version change,
domain shift, a broken preprocessing branch), which silently degrades
both dedup thresholds and ANN recall.

``embedding_drift`` reports, per group, the L1 distance between the
group's per-dimension mean vector and the global one. Means fold over
SORTED values (the repo's cross-engine float discipline — ``F.avg``
is shuffle-order-dependent and flakes 6dp hash gates at a few
thousand rows per group, measured in round 5) and are snapped to 6dp
before differencing, so a SQL oracle replays the report exactly.

Scale: one posexplode projection (rows x dim), one map-side-combinable
(group, dim) aggregation, a broadcast join against the dim-sized
global means; the drift sum folds 64 doubles per group in dimension
order. At 100 TB swap the exact sorted-fold means for plain avg — at
billions of values per (group, dim) cell the ULP drift argument holds
without sorting and nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_drift(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """Per-group embedding-mean drift vs the global mean:
    ``(group, n_vecs, l1_drift, max_dim_drift)``.

    Null embeddings are dropped; every vector in a group must share
    the dimensionality (enforced upstream by the writer — posexplode
    simply yields whatever positions exist).
    """
    f = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "dim", "v"
        ),
    )

    def sorted_mean() -> F.Column:
        vals = F.sort_array(F.collect_list("v"))
        return F.round(
            F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x)
            / F.size(vals),
            ndigits,
        )

    per_group = f.groupBy("grp", "dim").agg(
        sorted_mean().alias("__m"), F.count("*").alias("__n")
    )
    global_means = f.groupBy("dim").agg(sorted_mean().alias("__g"))
    diffs = per_group.join(F.broadcast(global_means), "dim").select(
        "grp",
        "dim",
        "__n",
        F.round(F.abs(F.col("__m") - F.col("__g")), ndigits).alias("__d"),
    )
    # fold the per-dim gaps in DIMENSION order (engine-identical sum)
    ds = F.sort_array(
        F.collect_list(F.struct(F.col("dim"), F.col("__d")))
    )
    drift_sum = F.aggregate(
        F.transform(ds, lambda s: s["__d"]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        diffs.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.max("__n").alias("n_vecs"),
            F.round(drift_sum, ndigits).alias("l1_drift"),
            F.max("__d").alias("max_dim_drift"),
        )
        .orderBy(group_col)
    )
