"""Survey-style raking (iterative proportional fitting) for
distribution matching.

A training-data pipeline that must hit a target mix over two
attributes (e.g. source x language) without resampling attaches
WEIGHTS: raking (Deming & Stephan 1940, public literature) scales
row-marginal factors then column-marginal factors so the weighted
marginals match the targets. One row-then-column pass (the classic
first IPF sweep) already matches the column marginal exactly and
gets the row marginal close; production raking iterates, but a
deterministic single sweep is what a SQL-replayable gate can pin
digit-for-digit.

Exactness contract: the raw cell counts are integers; the row
factor is ONE rounded double division per row category; the column
marginal of the row-scaled table is a SORTED-FOLD of the (<=
|rows|) per-cell products — the repo's float discipline, identical
fold order in both engines — and the column factor again one
rounded division. Final cell weight = n * f_row * f_col, pure IEEE
products of identical literals.

Scale: everything after the first groupBy operates on the |R x C|
CELL table (bounded by the attribute domains, not the data);
factors broadcast back onto rows if per-row weights are needed.
No counterpart in the reference engine (surface =
`etl/orders_etl.py:17-198`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rake_weights(
    df: DataFrame,
    row_col: str,
    col_col: str,
    row_targets: dict[str, float],
    col_targets: dict[str, float],
    ndigits: int = 6,
) -> DataFrame:
    """One row-then-column raking sweep over the ``row_col`` x
    ``col_col`` contingency table.

    ``row_targets`` / ``col_targets`` map category -> target SHARE
    (each dict should sum to 1; categories absent from a dict get
    share 0 and weight 0). Returns one row per observed cell:
    ``(row_col, col_col, n, f_row, f_col, weight)`` where ``weight``
    is the raked per-unit weight for every original row in that
    cell (so sum over a column category of n*weight hits the target
    exactly, by construction of ``f_col``).
    """
    cells = df.groupBy(row_col, col_col).agg(
        F.count("*").alias("n")
    )
    total = F.broadcast(df.agg(F.count("*").alias("__N")))

    def _share(mapping: dict[str, float], key: str):
        expr = F.lit(0.0)
        for k, v in mapping.items():
            expr = F.when(F.col(key) == k, F.lit(float(v))).otherwise(
                expr
            )
        return expr

    # row sweep: f_r = target_r * N / sum(n in row r) — integer
    # marginal, one rounded division
    wr = Window.partitionBy(row_col)
    rowed = (
        cells.crossJoin(total)
        .withColumn("__row_n", F.sum("n").over(wr))
        .withColumn(
            "f_row",
            F.round(
                _share(row_targets, row_col)
                * F.col("__N")
                / F.col("__row_n"),
                ndigits,
            ),
        )
        .withColumn("__w1", F.col("n") * F.col("f_row"))
    )
    # column marginal of the row-scaled table: SORTED-FOLD over the
    # <= |row domain| per-cell products so both engines add the same
    # doubles in the same order
    col_marg = (
        rowed.groupBy(col_col)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("__w1")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__col_w"),
        )
    )
    out = (
        rowed.join(F.broadcast(col_marg), col_col)
        .withColumn(
            "f_col",
            F.round(
                _share(col_targets, col_col)
                * F.col("__N")
                / F.col("__col_w"),
                ndigits,
            ),
        )
        .withColumn(
            "weight",
            F.round(F.col("f_row") * F.col("f_col"), ndigits),
        )
    )
    return out.select(
        row_col,
        col_col,
        F.col("n").cast("long").alias("n"),
        "f_row",
        "f_col",
        "weight",
    )
