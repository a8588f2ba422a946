"""Poisson-bootstrap confidence intervals — uncertainty estimates the
way they are actually computed at data scale.

The classic bootstrap (resample n rows WITH replacement, B times)
needs global coordinated sampling — impossible to do cheaply on a
distributed table. The standard trick (Poisson bootstrap: per row and
replicate, an independent Poisson(1) weight; public literature, e.g.
Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
Google 2012) makes each replicate a WEIGHTED pass needing no
coordination at all: E[weight] = 1 reproduces the resample
distribution asymptotically, and every (row, replicate) weight is an
independent pure function of (id, b, seed) — deterministic,
partitioning-invariant, and replayable by a SQL oracle.

Exactness contract: weights are integers from an inverse-CDF table of
repr'd cumulative literals; weighted sums run in DECIMAL(18,2) (exact,
order-free), so replicate means are identical on any engine at any
parallelism; CI bounds are order statistics of the B means (type-1
quantile — no interpolation to diverge).

Scale: the explode is x B rows of (group, b, weight, value) — at
100 TB run B=100 on a table sample or pre-aggregated groups; the
aggregate is ONE map-side-combinable groupBy (group, b) followed by a
B-sized rollup per group. No counterpart in the reference engine
(SURVEY.md §2.2 aggregation absence family).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _poisson1_cdf_literals(max_k: int = 8) -> list[float]:
    """Cumulative P(X <= k) for Poisson(1), k = 0..max_k-1 — repr'd
    into both engines so the inverse-CDF table is bit-identical."""
    out, acc, term = [], 0.0, math.exp(-1.0)
    for k in range(max_k):
        acc += term
        out.append(acc)
        term /= k + 1
    return out


def poisson_weight(u, max_k: int = 8):
    """Inverse-CDF Poisson(1) draw from a uniform column ``u`` in
    [0, 1): the smallest k with cdf(k) >= u (draws beyond ``max_k``
    clamp — P(X > 8) < 1e-6, immaterial to a bootstrap)."""
    cdf = _poisson1_cdf_literals(max_k)
    expr = F.lit(max_k)
    for k in reversed(range(max_k)):
        expr = F.when(u < F.lit(cdf[k]), F.lit(k)).otherwise(expr)
    return expr


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    b: int = 100,
    ci: float = 0.95,
    seed: int = 42,
    ndigits: int = 6,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-group mean with a Poisson-bootstrap ``ci`` confidence
    interval: ``(group..., n_rows, mean, ci_lo, ci_hi, b)``.

    Each of the ``b`` replicates weights every row by an independent
    deterministic Poisson(1) draw (hash of (id, replicate, seed)) and
    takes the weighted mean in DECIMAL (exact); ``ci_lo``/``ci_hi``
    are the type-1 lower/upper quantile order statistics of the B
    replicate means. Replicates whose total weight is zero (possible
    only for tiny groups) are dropped from the order statistics.

    ``hash_fn`` is the draw family (the hashed-classifier contract:
    the family is part of the model): ``"md5"`` is SQL-replayable (the
    oracle family; ~md5-bound at n x B draws), ``"xxhash64"`` is the
    production family — one codegen'd JVM hash per draw, measured ~5x
    faster at sf0.1 x B=100, statistically equivalent but not
    replayable by a DuckDB oracle.
    """
    if b < 2:
        raise ValueError(f"b must be >= 2, got {b}")
    if not (0.0 < ci < 1.0):
        raise ValueError(f"ci must be in (0, 1), got {ci}")
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    groups = [F.col(c) for c in (group_cols or [])]
    val = F.col(value_col).cast("decimal(18,2)")
    rep = df.select(
        *groups,
        F.col(id_col).alias("__id"),
        val.alias("__v"),
        F.explode(
            F.sequence(F.lit(0), F.lit(b - 1))
        ).alias("__b"),
    )
    # ONE md5 serves FOUR replicates (its four 8-hex chunks — the
    # minhash _mh_sql pattern), and u materializes in its own
    # projection so the inverse-CDF CASE chain references a cheap
    # column, not the hash expression (CollapseProject keeps the
    # boundary for non-cheap multi-referenced expressions; measured:
    # inlined chain re-evaluates the hash 9x, 20.8s -> 10.3s at sf0.1,
    # and chunking cuts the md5 count 4x on top)
    if hash_fn == "xxhash64":
        # (h mod 2^32 + 2^32) mod 2^32 maps the signed 64-bit hash
        # onto [0, 2^32) uniformly
        u = (
            F.pmod(
                F.xxhash64(F.col("__id"), F.col("__b"), F.lit(seed)),
                F.lit(1 << 32),
            )
            / F.lit(float(1 << 32))
        )
    else:
        md5c = F.md5(
            F.concat_ws(
                "|",
                F.col("__id").cast("string"),
                F.floor(F.col("__b") / 4).cast("long").cast("string"),
                F.lit(str(seed)),
            )
        )
        chunk_start = (F.col("__b") % 4) * 8 + 1
        u = (
            F.conv(
                md5c.substr(chunk_start, F.lit(8)), 16, 10
            ).cast("long")
            / F.lit(float(1 << 32))
        )
    with_u = rep.select(
        *[F.col(c) for c in (group_cols or [])],
        "__b",
        "__v",
        u.alias("__u"),
    )
    weighted = with_u.select(
        *[F.col(c) for c in (group_cols or [])],
        "__b",
        poisson_weight(F.col("__u")).alias("__w"),
        F.col("__v"),
    )
    gb = (group_cols or []) + ["__b"]
    reps = (
        weighted.groupBy(*gb)
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__ws"),
            F.sum("__w").alias("__wn"),
        )
        .filter(F.col("__wn") > 0)
        .select(
            *[F.col(c) for c in (group_cols or [])],
            # decimal SUM is exact; convert to double BEFORE dividing
            # so both engines perform the same single double division
            # (decimal-division scale rules differ between engines)
            F.round(
                F.col("__ws").cast("double") / F.col("__wn"), ndigits
            ).alias("__mean_b"),
        )
    )
    lo_q, hi_q = (1.0 - ci) / 2.0, 1.0 - (1.0 - ci) / 2.0
    means = reps.groupBy(*(group_cols or [])).agg(
        F.sort_array(F.collect_list("__mean_b")).alias("__ms")
    )
    nb = F.size("__ms")
    # type-1 (ceil-rank) order statistics — exact selection, no
    # interpolation for engines to disagree on
    lo_i = F.greatest(F.ceil(nb * F.lit(lo_q)).cast("int"), F.lit(1))
    hi_i = F.greatest(F.ceil(nb * F.lit(hi_q)).cast("int"), F.lit(1))
    base = df.groupBy(*(group_cols or [])).agg(
        F.count("*").alias("n_rows"),
        F.round(
            F.sum(val).cast("double") / F.count("*"), ndigits
        ).alias("mean"),
    )
    out = base.join(means, group_cols or [], "inner") if group_cols else (
        base.crossJoin(means)
    )
    return out.select(
        *[F.col(c) for c in (group_cols or [])],
        "n_rows",
        "mean",
        F.element_at("__ms", lo_i).alias("ci_lo"),
        F.element_at("__ms", hi_i).alias("ci_hi"),
        F.lit(b).alias("b"),
    )
