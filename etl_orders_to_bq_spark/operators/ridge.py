"""Closed-form ridge regression via distributed normal equations.

The 100-TB shape of least squares: the DATA never leaves the cluster
— one full scan computes the Gram matrix X'X and moment vector X'y as
map-side-combinable SUMS (p=2 features + intercept here: 9 scalar
aggregates), and the solve is a p+1 x p+1 problem, O(1) in the data,
done exactly on the driver (the same bounded-collect discipline as
``embstats`` PCA's dim^2 scatter and ``ann`` k-means' k centroids).

Exactness contract: features and target are integer-quantized by the
caller, so every Gram/moment sum is an exact int64; the driver solve
runs Cramer's rule in unbounded Python ints and rounds the final
coefficients half-away-from-zero to 6dp — bit-identical on any
engine, any partitioning, any row order (a float Gram matrix is
partition-order dependent; this one is not). A SQL oracle replays the
identical sums and determinants in hugeint.

No counterpart in the reference engine (SURVEY.md §2.2 — the
reference has no model fitting at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round_half_away_6dp(num: int, den: int) -> float:
    """Exact rational num/den -> 6dp half-away-from-zero float."""
    if den < 0:
        num, den = -num, -den
    sign = -1 if num < 0 else 1
    n = abs(num)
    micro = (2 * n * 1_000_000 + den) // (2 * den)
    return sign * micro / 1_000_000.0


def ridge_normal(
    df: DataFrame,
    x1: Column | str,
    x2: Column | str,
    y: Column | str,
    lam: int = 1,
) -> DataFrame:
    """Fit ``y ~ b0 + b1*x1 + b2*x2`` with an L2 penalty ``lam`` on
    b1/b2 (never the intercept, per the standard recipe), by the
    normal equations ``(X'X + lam*J) b = X'y`` (J = diag(0, 1, 1)).

    ``x1``/``x2``/``y`` must be integer-valued columns (quantize
    upstream); ``lam`` an integer. Returns ONE row: ``(n_rows, b0,
    b1, b2)`` with the coefficients rounded half-away to 6dp (the
    determinant stays internal — it exceeds int64 at real scales and
    a hugeint->double cast is a cross-engine rounding risk).
    Quantize so every sum fits int64: Spark 4's ANSI mode throws
    loudly on overflow rather than wrapping.

    Scale: the scan is ONE aggregate (9 sums, map-side partial), the
    collect is 1 row, the solve is 3x3 — nothing downstream of the
    scan grows with the data. p features generalize to (p+1)(p+2)/2
    sums and a driver-side exact solve; p stays model-sized, not
    data-sized.
    """
    c1 = F.col(x1) if isinstance(x1, str) else x1
    c2 = F.col(x2) if isinstance(x2, str) else x2
    cy = F.col(y) if isinstance(y, str) else y
    c1, c2, cy = c1.cast("long"), c2.cast("long"), cy.cast("long")
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c1).alias("s1"),
        F.sum(c2).alias("s2"),
        F.sum(c1 * c1).alias("s11"),
        F.sum(c1 * c2).alias("s12"),
        F.sum(c2 * c2).alias("s22"),
        F.sum(cy).alias("sy"),
        F.sum(c1 * cy).alias("s1y"),
        F.sum(c2 * cy).alias("s2y"),
    ).first()
    n, s1, s2 = int(row.n), int(row.s1), int(row.s2)
    s11, s12, s22 = int(row.s11), int(row.s12), int(row.s22)
    sy, s1y, s2y = int(row.sy), int(row.s1y), int(row.s2y)
    lam = int(lam)
    # A = X'X + lam*diag(0,1,1); rows [n s1 s2; s1 s11+l s12; s2 s12 s22+l]
    a = [
        [n, s1, s2],
        [s1, s11 + lam, s12],
        [s2, s12, s22 + lam],
    ]
    b = [sy, s1y, s2y]

    def det3(m: list[list[int]]) -> int:
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    d = det3(a)
    if d == 0:
        raise ValueError("singular penalized Gram matrix")
    coefs = []
    for j in range(3):
        m = [
            [b[i] if k == j else a[i][k] for k in range(3)]
            for i in range(3)
        ]
        coefs.append(_round_half_away_6dp(det3(m), d))
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(n, coefs[0], coefs[1], coefs[2])],
        "n_rows long, b0 double, b1 double, b2 double",
    )
    return out


def ransac_line(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    eps: float = 2.0,
    n_trials: int = 64,
    seed: str = "rl17",
    ndigits: int = 6,
    subsample_mod: int | None = None,
    coord_bound: float | None = None,
) -> DataFrame:
    """RANSAC line fit (Fischler & Bolles 1981, public literature) —
    the robust regressor for data where a MINORITY of rows follow no
    model at all (bot traffic, sensor glitches, merged corpora): fit
    the line with the most inliers over ``n_trials`` minimal samples,
    where least squares would chase the outliers and Theil-Sen's
    breakdown tops out at 29%.

    Determinism contract: each row hashes ONCE per arm
    (md5(seed:arm:id) -> a 31-bit integer) and trial t remixes it
    with the odd-multiplier bijection k = (h*(2t+1) + 1000003*t) mod
    2^31-ish — so the 9.6M-row trial expansion does CHEAP modular
    arithmetic, not 128 md5s per row (measured 19 s -> ~2 s at
    sf0.1); the per-trial argmin is a min(struct(key, id, x, y))
    with the id as the deterministic collision tie-break. No RNG
    state, no partition dependence, no long overflow (h < 2^31,
    multiplier < 2^8 — ANSI-safe). Degenerate trials (same point
    twice, vertical pair) are discarded. The inlier test
    is EXACT decimal arithmetic — |(y-y1)*dx - (x-x1)*dy| <=
    eps*|dx| clears the division — so not one float enters the count;
    slope/intercept of the winning trial (max inliers, trial-index
    tie-break) are fixed-order doubles over exact decimals, rounded
    once.

    Output: one row ``(n, best_trial, n_inliers, slope, intercept)``;
    no valid trial (all degenerate) yields NULL fit columns.

    Scale: the trial-draw stage crossJoins n_trials x rows but
    map-side combines to 2*n_trials struct minima per task (the
    permutation_test shape — shuffle carries O(n_trials), not
    O(rows)); the inlier count broadcasts the n_trials-row line table
    against the data, one map-side-combinable groupBy. n_trials is a
    confidence knob, not a data knob.

    ``subsample_mod`` (advisor r11, the standard RANSAC shortcut):
    when set to d > 1, the deterministic 1/d row subset
    (md5(seed:s:id) mod d == 0 — its own hash arm) feeds BOTH the
    minimal-sample draws and the trial scoring, the argmax trial
    wins on subset inliers (trial-index tie-break), and only the
    winning line is re-counted on the FULL data — so ``n_inliers``
    stays exact for the reported fit while the n_trials x rows
    expansion (draw + score, the dominant cost) drops d-fold to
    n_trials x rows/d + rows. Drawing from a deterministic subset is
    simply a different (equally valid) sampling scheme; the winner
    can differ from the exhaustive argmax — the documented
    trade-off, with the fit itself verified on everything.

    ``coord_bound`` (r13 optimization): when the caller can assert
    |x|, |y| <= coord_bound (after the 2dp quantization), the inlier
    test runs in exact integer CENTS (longs) instead of decimal(38)
    cross-multiplication. The booleans — and therefore every count
    and the reported fit — are bit-identical (both arithmetics are
    exact; the final slope/intercept doubles reproduce the decimal
    path's two-step rounding), but the per-row cost drops from four
    BigDecimal ``toPrecision`` calls (precision 38 is not long-backed;
    measured as the entire hot stage of the 64x trial expansion) to
    two long multiplies. A wrong assertion fails LOUDLY (ANSI long
    overflow), never silently: results cannot be corrupted. Bounds
    are validated so every product keeps 2x headroom under int64;
    callers with |coords| > 50,000 units get the decimal path.
    """
    eps_str = repr(float(eps))
    # exact micro-eps for the integer path: must equal Spark's
    # cast(eps_str as decimal(18,6)) — HALF_UP at 6dp
    from decimal import ROUND_HALF_UP
    from decimal import Decimal as _D

    eps_micro6 = int(
        _D(eps_str).scaleb(6).to_integral_value(rounding=ROUND_HALF_UP)
    )
    int_path = (
        coord_bound is not None
        and 0 < float(coord_bound) <= 50_000.0
        # lhs: |L| * 10000 with L <= 2*(2B*100)^2 = 8e4*B^2
        and 8e8 * float(coord_bound) ** 2 <= 4.6e18
        # rhs: eps_micro6 * |dx_cents| <= eps_micro6 * 2B*100
        and eps_micro6 * 200.0 * float(coord_bound) <= 4.6e18
    )
    if int_path:
        xy = lambda c: (  # noqa: E731
            (F.col(c).cast("decimal(18,2)") * 100).cast("long")
        )
    else:
        xy = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    base = df.filter(
        F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).cast("string").alias("__id"),
        xy(x_col).alias("__x"),
        xy(y_col).alias("__y"),
    )
    trials = df.sparkSession.range(int(n_trials)).select(
        F.col("id").cast("int").alias("__t")
    )
    rowh = lambda arm: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed), F.lit(f":{arm}:"), F.col("__id")
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % F.lit(2147483648)
    )
    # with subsample_mod, the deterministic 1/d subset feeds BOTH the
    # minimal-sample draws and the trial scoring — the 64x trial
    # expansion is the dominant cost and it must shrink with d, not
    # just the scoring scan (drawing from a deterministic subset is
    # just a different, equally valid sampling scheme; the winning
    # line still re-verifies on the full data)
    subbed = base
    if subsample_mod is not None and int(subsample_mod) > 1:
        subbed = (
            base.withColumn("__hs", rowh("s"))
            .filter(F.col("__hs") % int(subsample_mod) == 0)
            .drop("__hs")
        )
    hashed = subbed.withColumns({"__ha": rowh("a"), "__hb": rowh("b")})
    remix = lambda hc: (  # noqa: E731
        hc * (2 * F.col("__t") + 1) + F.lit(1000003) * F.col("__t")
    ) % F.lit(2147483647)
    # SLIM draw payload (r12 verdict #2): the n_trials x rows
    # expansion carries only (remixed hash, id) per arm — ids are
    # unique, so min(struct(h, id)) picks the same winner as the old
    # min(struct(h, id, x, y)) while the per-row expansion builds
    # half-size structs (measured 1.69 s -> 1.17 s for the draw stage
    # at sf0.1) and the map-side combine payload drops to 2 longs +
    # a string per trial. Coordinates join back afterwards: one scan
    # of the (subsampled) base against a broadcast of the <= 2 *
    # n_trials winning ids.
    drawn = hashed.crossJoin(trials).groupBy("__t").agg(
        F.min(
            F.struct(remix(F.col("__ha")).alias("h"), "__id")
        ).alias("__p1"),
        F.min(
            F.struct(remix(F.col("__hb")).alias("h"), "__id")
        ).alias("__p2"),
    )
    winners = drawn.select(
        "__t",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("__arm"),
                    F.col("__p1.__id").alias("__id"),
                ),
                F.struct(
                    F.lit(2).alias("__arm"),
                    F.col("__p2.__id").alias("__id"),
                ),
            )
        ).alias("__w"),
    ).select("__t", F.col("__w.__arm").alias("__arm"),
             F.col("__w.__id").alias("__id"))
    coords = (
        subbed.join(F.broadcast(winners), "__id")
        .groupBy("__t")
        .agg(
            F.min(
                F.when(F.col("__arm") == 1, F.struct("__x", "__y"))
            ).alias("__c1"),
            F.min(
                F.when(F.col("__arm") == 2, F.struct("__x", "__y"))
            ).alias("__c2"),
        )
    )
    lines = coords.select(
        "__t",
        F.col("__c1.__x").alias("__x1"),
        F.col("__c1.__y").alias("__y1"),
        (F.col("__c2.__x") - F.col("__c1.__x")).alias("__dx"),
        (F.col("__c2.__y") - F.col("__c1.__y")).alias("__dy"),
    ).filter(F.col("__dx") != 0)
    if int_path:
        # exact cents: |L| * 1e4 <= eps_micro6 * |dx_cents| is the
        # decimal condition cleared of its 1e-4 / 1e-8 scale factors
        inl_cond = (
            F.abs(
                (F.col("__y") - F.col("__y1")) * F.col("__dx")
                - (F.col("__x") - F.col("__x1")) * F.col("__dy")
            )
            * F.lit(10_000).cast("long")
            <= F.lit(eps_micro6).cast("long") * F.abs(F.col("__dx"))
        )
    else:
        inl_cond = (
            F.abs(
                (F.col("__y") - F.col("__y1")) * F.col("__dx")
                - (F.col("__x") - F.col("__x1")) * F.col("__dy")
            )
            <= F.expr(f"cast({eps_str} as decimal(18,6))")
            * F.abs(F.col("__dx"))
        )
    if subsample_mod is not None and int(subsample_mod) > 1:
        scored_sub = (
            subbed.crossJoin(F.broadcast(lines))
            .filter(inl_cond)
            .groupBy("__t")
            .agg(F.count("*").alias("__inl_sub"))
        )
        best_line = (
            lines.join(scored_sub, "__t", "left")
            .select(
                "__t", "__x1", "__y1", "__dx", "__dy",
                F.coalesce(F.col("__inl_sub"), F.lit(0))
                .alias("__inl_sub"),
            )
            .orderBy(F.desc("__inl_sub"), "__t")
            .limit(1)
        )
        # exact full-data inlier count for the ONE winning line
        recount = (
            base.crossJoin(F.broadcast(best_line))
            .filter(inl_cond)
            .groupBy("__t")
            .agg(F.count("*").alias("__inl"))
        )
        best = best_line.join(recount, "__t", "left").select(
            "__t", "__x1", "__y1", "__dx", "__dy",
            F.coalesce(F.col("__inl"), F.lit(0)).alias("__inl"),
        )
    else:
        scored = (
            base.crossJoin(F.broadcast(lines))
            .filter(inl_cond)
            .groupBy("__t")
            .agg(F.count("*").alias("__inl"))
        )
        best = (
            lines.join(scored, "__t", "left")
            .select(
                "__t", "__x1", "__y1", "__dx", "__dy",
                F.coalesce(F.col("__inl"), F.lit(0)).alias("__inl"),
            )
            .orderBy(F.desc("__inl"), "__t")
            .limit(1)
        )
    n = base.agg(F.count("*").cast("long").alias("n"))
    if int_path:
        # cents -> units via ONE double division each: IEEE division
        # is correctly rounded, so cents/100.0 is the same double as
        # Decimal(18,2).toDouble — slope/intercept stay bit-identical
        dxd = F.col("__dx").cast("double") / F.lit(100.0)
        dyd = F.col("__dy").cast("double") / F.lit(100.0)
        x1d = F.col("__x1").cast("double") / F.lit(100.0)
        y1d = F.col("__y1").cast("double") / F.lit(100.0)
    else:
        dxd = F.col("__dx").cast("double")
        dyd = F.col("__dy").cast("double")
        x1d = F.col("__x1").cast("double")
        y1d = F.col("__y1").cast("double")
    slope = dyd / dxd
    # LEFT join on true: an all-degenerate trial set leaves `best`
    # empty and the contract is one row with NULL fit, not zero rows
    return n.join(F.broadcast(best), F.lit(True), "left").select(
        "n",
        F.col("__t").cast("long").alias("best_trial"),
        F.col("__inl").cast("long").alias("n_inliers"),
        F.round(slope, ndigits).alias("slope"),
        F.round(y1d - x1d * slope, ndigits).alias("intercept"),
    )
