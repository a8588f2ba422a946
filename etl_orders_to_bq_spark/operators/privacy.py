"""Privacy-release risk operators.

``l_diversity`` complements the k-anonymity census (class SIZE risk)
with the orthogonal attack k-anonymity misses: a class can be large yet
expose everyone in it when all members share one sensitive value
(homogeneity attack — Machanavajjhala et al. 2007, public literature).
A release gate needs both reports.

Scale notes: one groupBy over the quasi-identifier projection computes
class size AND distinct-sensitive count together (``count_distinct``
per group — bounded by the sensitive domain, map-side partial via the
distinct expand); the census rollup is a second tiny groupBy. Row data
never shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """Distinct-l-diversity census: per equivalence class (unique
    quasi-identifier combination) count members and DISTINCT sensitive
    values, then report the census ``(n_sensitive, n_classes,
    n_rows, at_risk)`` — classes with fewer than ``l`` distinct
    sensitive values are homogeneity risks regardless of their size.
    The census (not the raw risky classes) is the output: a privacy
    report must not itself leak the quasi-identifiers it flags.
    """
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    classes = df.groupBy(*quasi_cols).agg(
        F.count("*").alias("__size"),
        F.count_distinct(F.col(sensitive_col)).alias("__nsens"),
    )
    return (
        classes.groupBy(F.col("__nsens").alias("n_sensitive"))
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("__size").alias("n_rows"),
            (F.max("__nsens") < l).alias("at_risk"),
        )
        .orderBy("n_sensitive")
    )
