"""Token-budget corpus mixing — the dataset-mixing step of a training
pipeline: given per-source token budgets (the mixture weights times the
total token target), keep a deterministic sample of each source until
its budget fills.

Mechanics: one window per source partition computes the running token
sum over a deterministic order; a row is kept while the cumulative
count BEFORE it is under budget, so the document that crosses the
budget line is the last one in ("fill until full" — budgets are
approximate by up to one document, never undershot while docs remain).

Ordering choices:
- ``md5(id)`` — an unbiased deterministic shuffle (the usual choice for
  mixing: every doc equally likely near the front, reproducible across
  runs and engines);
- a quality score descending — curation ("best docs first until the
  budget is spent");
any total order works as long as it is tie-broken to uniqueness.

Scale: ONE hash shuffle on the source key; the running sum is a
streaming frame (no whole-partition buffering). Hot sources are
bounded by their budget only after the shuffle — if one source is
90% of the corpus, pre-filter it (hash_sample) down to O(budget)
before mixing rather than shuffling rows the budget can never admit.

No counterpart in the reference engine (SURVEY.md §2.2 — the
reference has no sampling at all); standard practice in public
training-data pipelines (mixture weights over sources).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_budget_mix(
    df: DataFrame,
    source_col: str,
    token_col: str,
    budget: Column | int,
    order_cols: list,
    cum_col: str | None = None,
) -> DataFrame:
    """Keep rows per ``source_col`` group, in ``order_cols`` order,
    while the group's cumulative ``token_col`` before the row is under
    ``budget`` (an int for a uniform budget, or a Column — e.g. a map
    lookup on the source — for per-source budgets).

    Pass ``cum_col`` to keep the cumulative-tokens-before column in the
    output (useful for auditing how full each budget ran)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = (
        Window.partitionBy(source_col)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    budget_expr = budget if isinstance(budget, Column) else F.lit(budget)
    name = cum_col or "__cum_before"
    out = df.withColumn(name, cum_before).filter(F.col(name) < budget_expr)
    return out if cum_col else out.drop(name)
