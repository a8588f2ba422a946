"""Information-theoretic dependence between two categorical columns.

Mutual information is the feature-selection / leakage-detection
statistic (Cover & Thomas, public literature): MI(X;Y) = H(X) + H(Y)
- H(X,Y) in bits. A data platform uses it to rank candidate features
against a label, detect near-duplicate columns, and flag train/serve
leakage (a feature with MI ≈ H(label) IS the label).

Determinism contract: every probability comes from exact integer
counts; each entropy is a SORTED FOLD — counts sorted ASCENDING AS
LONGS (ties carry equal terms, so intra-tie order is irrelevant),
transformed to -(c/n)·log2(c/n) and left-folded — so float addition
order is pinned, the same discipline as rake_weights' column
marginal. The oracle replays it with
``list_reduce(list_transform(list_sort(...)))``; DuckDB's seedless
reduce seeds with the first element, Spark folds from 0.0 — IEEE
``0.0 + x == x`` for the nonnegative terms, so the results are
bit-identical. Each entropy rounds once at ``ndigits``; MI/NMI are
fixed-order double expressions over the three rounded entropies.

Scale: ONE groupBy to |X|x|Y| cells; marginals re-aggregate the cell
table (bounded domain), never rescan the input. The folds run over
the categorical domain, not the data.

No counterpart in the reference engine (SURVEY.md §2.2 — no
aggregation family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _entropy(counts_col: Column, n: Column, ndigits: int) -> Column:
    """round(Σ -(c/n)*log2(c/n), ndigits) over counts sorted as longs."""
    terms = F.transform(
        F.sort_array(counts_col),
        lambda c: -(c.cast("double") / n.cast("double"))
        * F.log2(c.cast("double") / n.cast("double")),
    )
    return F.round(
        F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t), ndigits
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """One-row summary ``(n, h_x, h_y, h_xy, mi_bits, nmi)`` of the
    dependence between two categorical columns (nulls are a category
    via a sentinel, mirroring dp_noisy_counts' null discipline).

    ``mi_bits = h_x + h_y - h_xy`` over the individually-rounded
    entropies; ``nmi = 2*mi/(h_x+h_y)`` (symmetric uncertainty,
    Witten & Frank), 0 when both marginal entropies vanish.
    """
    x = F.coalesce(F.col(x_col).cast("string"), F.lit("␀"))
    y = F.coalesce(F.col(y_col).cast("string"), F.lit("␀"))
    cells = df.groupBy(x.alias("__x"), y.alias("__y")).agg(
        F.count("*").alias("__c")
    )
    joint = cells.agg(
        F.sum("__c").cast("long").alias("n"),
        F.collect_list("__c").alias("__cxy"),
    )
    xs = (
        cells.groupBy("__x")
        .agg(F.sum("__c").alias("__c"))
        .agg(F.collect_list("__c").alias("__cx"))
    )
    ys = (
        cells.groupBy("__y")
        .agg(F.sum("__c").alias("__c"))
        .agg(F.collect_list("__c").alias("__cy"))
    )
    j = joint.crossJoin(F.broadcast(xs)).crossJoin(F.broadcast(ys))
    n = F.col("n")
    out = j.select(
        n,
        _entropy(F.col("__cx"), n, ndigits).alias("h_x"),
        _entropy(F.col("__cy"), n, ndigits).alias("h_y"),
        _entropy(F.col("__cxy"), n, ndigits).alias("h_xy"),
    )
    mi = F.round(F.col("h_x") + F.col("h_y") - F.col("h_xy"), ndigits)
    out = out.withColumn("mi_bits", mi)
    nmi = F.when(
        (F.col("h_x") + F.col("h_y")) > 0,
        F.round(
            F.lit(2.0) * F.col("mi_bits") / (F.col("h_x") + F.col("h_y")),
            ndigits,
        ),
    ).otherwise(F.lit(0.0))
    return out.withColumn("nmi", nmi)
