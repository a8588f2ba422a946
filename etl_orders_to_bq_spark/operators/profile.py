"""ANALYZE-style column profiler.

``column_profile`` emits the per-column statistics block a query
optimizer (or a data-quality reviewer) reads before planning: row
count, null count, exact distinct count, min/max rendered as
strings. The ``stack``-based unpivot keeps it ONE aggregate pass +
one tiny explode — the table is scanned once regardless of column
count.

Scale note: ``count_distinct`` over many columns in one aggregate
expands partials per distinct-column; at 100 TB swap in
``approx_count_distinct`` (HLL, one pass, no expand) via
``exact=False`` — the profile is advisory there, and the gate pins
the exact path at fixture scale. No counterpart in the reference
engine (surface = `etl/orders_etl.py:17-198`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """One row per column: ``(column, n_rows, n_null, n_distinct,
    min_value, max_value)`` with min/max cast to string (the
    catalog-stats convention — orderable render, type-erased)."""
    cols = cols or df.columns
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}")
        )
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            ).alias(f"__ndv_{c}")
        )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.extend(
            [
                F.lit(c),
                F.col(f"__null_{c}"),
                F.col(f"__ndv_{c}"),
                F.col(f"__min_{c}"),
                F.col(f"__max_{c}"),
            ]
        )
    return one.select(
        F.col("__n").alias("n_rows"),
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column", "n_null", "n_distinct", "min_value", "max_value"),
    ).select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


# Fixed-priority semantic detectors. Every pattern uses ONLY
# explicit character classes and anchors that mean the same thing in
# Java regex (Spark) and RE2 (DuckDB oracles) — no \d/\s/\w, no
# unicode properties (functions/text.py tokenize documents the
# divergences), and \z rather than $ for end-of-value (Java $
# matches BEFORE a final newline, RE2 $ does not — verified
# divergent on 'x\n'; \z is absolute end in both). Order matters:
# first match wins.
SEMANTIC_DETECTORS: list[tuple[str, str]] = [
    ("json_object", r"^\{.*\}\z"),
    ("url", r"^https?://[^ ]+\z"),
    ("email", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+\z"),
    ("uuid", r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
             r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\z"),
    ("date", r"^[0-9]{4}-[0-9]{2}-[0-9]{2}"),
    ("integer", r"^-?[0-9]+\z"),
    ("decimal", r"^-?[0-9]+\.[0-9]+\z"),
    ("prefixed_id", r"^[A-Za-z]+#[0-9]+\z"),
]


def semantic_types(
    df: DataFrame,
    columns: list[str],
    table_name: str = "",
    ndigits: int = 6,
) -> DataFrame:
    """Semantic-type census of string-rendered columns — the
    profiling step that discovers WHAT a column holds (emails, URLs,
    JSON blobs, prefixed entity ids …), feeding masking policy and
    parser routing; the classifier side of column_profile's
    statistics (same profiling literature: Abedjan et al., VLDB J.
    2015).

    Each value is tagged with the FIRST matching detector from
    ``SEMANTIC_DETECTORS`` (nulls -> "null", no match -> "text");
    output one row per (table, column, sem_type) with count and one
    rounded-division share.

    Scale: ONE scan — the native unpivot widens rows by |columns|
    inside the same stage (a union of per-column selects would scan
    the table |columns| times; Spark does not fuse union branches
    into one scan), then a map-side-combinable groupBy to
    |columns| x |types| rows. Profile a column sample (hash_sample)
    when |columns| is wide at 100 TB.
    """
    strcols = df.select(
        *[F.col(c).cast("string").alias(c) for c in columns]
    )
    unpiv = strcols.unpivot([], columns, "column_name", "__v")
    v = F.col("__v")
    t = F.lit("text")
    for name, pat in reversed(SEMANTIC_DETECTORS):
        t = F.when(v.rlike(pat), F.lit(name)).otherwise(t)
    t = F.when(v.isNull(), F.lit("null")).otherwise(t)
    out = unpiv.select(
        F.lit(table_name).alias("table_name"),
        F.col("column_name"),
        t.alias("sem_type"),
    )
    counted = out.groupBy("table_name", "column_name", "sem_type").agg(
        F.count("*").alias("n")
    )
    tot = counted.groupBy("table_name", "column_name").agg(
        F.sum("n").alias("__tot")
    )
    return counted.join(tot, ["table_name", "column_name"]).select(
        "table_name",
        "column_name",
        "sem_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("__tot"), ndigits).alias("share"),
    )


def inclusion_dependencies(
    columns: list[tuple[str, DataFrame, str]],
) -> DataFrame:
    """Unary inclusion-dependency discovery — foreign-key CANDIDATE
    mining (De Marchi et al. 2002, public literature): for every
    ordered pair of profiled columns, does every distinct value of A
    appear in B? The schema-archaeology pass a platform runs on an
    undocumented lake before trusting any join (``fk_coverage``
    checks a DECLARED key; this finds the candidates).

    ``columns`` is a bounded, curated list of (label, frame, column)
    triples — the discovery matrix is O(|columns|^2) anti-joins by
    design, so the contract is profiling a schema's plausible key
    columns (tens), not every column of a lake.

    Exactness: per pair, ``n_distinct`` and ``n_violations`` (distinct
    A-values absent from B) are exact integers from one distinct
    projection per column (computed once, reused across pairs) and
    one left-anti join per pair; ``holds`` is n_violations = 0.

    Output per ordered pair: ``(from_col, to_col, n_distinct,
    n_violations, holds)``, ordered — a compatible-type pair only
    (cross-type pairs are skipped, not reported false).

    Scale (r13 optimization — this operator's previously documented
    "upgrade path when |columns| grows", now the implementation): ONE
    inverted (value, column-bit) table per dtype group, ONE
    map-side-combinable ``bit_or`` groupBy(value) building each
    value's membership mask, then a mask CENSUS (<= 2^k rows) from
    which every ordered pair's exact (n_distinct, n_violations)
    derives as conditional sums — one value shuffle per dtype group
    total, instead of O(k^2) anti-joins each re-running its operands'
    distinct projections (the old 42-branch union plan cost ~2.5 s of
    driver analysis alone at k=7). Limit: 63 columns per dtype group
    (long bitmask) — far above the curated-tens contract.
    """
    typed: dict[str, list[tuple[str, DataFrame, str]]] = {}
    for label, frame, col in columns:
        dtype = dict(frame.dtypes)[col]
        typed.setdefault(dtype, []).append((label, frame, col))
    spark = columns[0][1].sparkSession
    rows = None
    for dtype, cols in typed.items():
        if len(cols) < 2:
            continue
        if len(cols) > 63:
            raise ValueError(
                f"inclusion_dependencies: > 63 columns of type "
                f"{dtype} (bitmask bound)"
            )
        inv = None
        for i, (label, frame, col) in enumerate(cols):
            part = (
                frame.select(F.col(col).alias("__v"))
                .filter(F.col("__v").isNotNull())
                .select(
                    "__v", F.lit(1 << i).cast("long").alias("__bit")
                )
            )
            inv = part if inv is None else inv.unionByName(part)
        masks = inv.groupBy("__v").agg(F.bit_or("__bit").alias("__m"))
        census = masks.groupBy("__m").agg(
            F.count("*").cast("long").alias("__c")
        )
        spec = spark.createDataFrame(
            [
                (la, lb, 1 << i, 1 << j)
                for i, (la, _, _) in enumerate(cols)
                for j, (lb, _, _) in enumerate(cols)
                if i != j
            ],
            "from_col string, to_col string, __ba long, __bb long",
        )
        zl = F.lit(0).cast("long")
        pair = (
            spec.crossJoin(census)
            .groupBy("from_col", "to_col")
            .agg(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("__m").bitwiseAND(F.col("__ba"))
                            != 0,
                            F.col("__c"),
                        )
                    ),
                    zl,
                ).alias("n_distinct"),
                F.coalesce(
                    F.sum(
                        F.when(
                            (
                                F.col("__m").bitwiseAND(F.col("__ba"))
                                != 0
                            )
                            & (
                                F.col("__m").bitwiseAND(F.col("__bb"))
                                == 0
                            ),
                            F.col("__c"),
                        )
                    ),
                    zl,
                ).alias("n_violations"),
            )
            .select(
                "from_col",
                "to_col",
                "n_distinct",
                "n_violations",
                (F.col("n_violations") == 0).alias("holds"),
            )
        )
        rows = pair if rows is None else rows.unionByName(pair)
    if rows is None:
        raise ValueError(
            "inclusion_dependencies needs >= 2 same-typed columns"
        )
    return rows.orderBy("from_col", "to_col")


def fd_discovery(
    df: DataFrame,
    columns: list[str],
) -> DataFrame:
    """Unary functional-dependency discovery over a bounded column
    list (Huhtala et al. TANE 1999 / Abedjan et al. VLDB J. 2015,
    public literature): for every ordered pair (A, B), does A -> B
    hold (every A value maps to exactly one B value)? The
    schema-archaeology complement to ``inclusion_dependencies`` —
    that finds JOIN candidates, this finds KEY/denormalization
    structure (``audit.fd_violations`` then audits a CHOSEN FD in
    row-level detail).

    ``columns`` is a bounded, curated list by design (the discovery
    matrix is O(k^2) aggregates over the k-column projection); the
    documented lake-scale upgrade is the same as
    inclusion_dependencies' inverted-table path.

    Exactness: A -> B holds iff |distinct A| = |distinct (A, B)| —
    two exact countDistincts; ``n_violating_lhs`` (A values mapping
    to >1 B) comes from ONE groupBy(A) countDistinct(B), so the
    violation census and the verdict are the same integers the TANE
    partition refinement would produce.

    Output per ordered pair: ``(det, dep, n_distinct_det,
    n_distinct_pair, n_violating_det, holds)``, ordered (det, dep);
    NULLs in either column ignore that row for the pair (the SQL
    FD-on-non-null convention, documented).

    Scale: one projection of the k columns feeds k^2 small aggregate
    plans; each is a map-side-combinable groupBy on its determinant.
    No counterpart in the reference engine (SURVEY.md §2.2).
    """
    base = df.select(*[F.col(c) for c in columns])
    out = None
    for a in columns:
        for b in columns:
            if a == b:
                continue
            pair = (
                base.filter(
                    F.col(a).isNotNull() & F.col(b).isNotNull()
                )
                .groupBy(F.col(a).alias("__a"))
                .agg(F.countDistinct(F.col(b)).alias("__nb"))
                .agg(
                    F.count("*").cast("long").alias("n_distinct_det"),
                    F.sum("__nb").cast("long").alias("n_distinct_pair"),
                    F.sum(
                        F.when(F.col("__nb") > 1, 1).otherwise(0)
                    ).cast("long").alias("n_violating_det"),
                )
                .select(
                    F.lit(a).alias("det"),
                    F.lit(b).alias("dep"),
                    "n_distinct_det",
                    "n_distinct_pair",
                    "n_violating_det",
                    (F.col("n_violating_det") == 0).alias("holds"),
                )
            )
            out = pair if out is None else out.unionByName(pair)
    return out.orderBy("det", "dep")
