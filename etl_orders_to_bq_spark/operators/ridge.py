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
