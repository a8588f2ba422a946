"""Physical-plan introspection.

The engine's performance rules ("one shuffle per semantic need",
"broadcast the dims", "push filters into scans") are testable claims
about the physical plan. These helpers parse ``executedPlan`` so tests
and tooling can assert plan shape instead of eyeballing ``.explain``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _full_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = _executed_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan))


def join_strategies(df: DataFrame) -> list[str]:
    """Join operators in execution order, e.g. ['BroadcastHashJoin',
    'SortMergeJoin']."""
    plan = _executed_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def scan_info(df: DataFrame) -> list[dict]:
    """Per file-scan: pushed filters and read schema column count."""
    plan = _full_plan(df)
    scans = []
    # the plan printer truncates long filter lists with "...", so the
    # closing bracket may be missing — stop at bracket OR next field
    for m in re.finditer(r"PushedFilters: \[([^\]\n]*)", plan):
        raw = m.group(1).split(", ReadSchema")[0]
        filters = [f for f in raw.split(", ") if f and f != "..."]
        scans.append({"pushed_filters": filters})
    for i, m in enumerate(re.finditer(r"ReadSchema: struct<(.*?)>", plan)):
        cols = [c for c in m.group(1).split(",") if c]
        if i < len(scans):
            scans[i]["read_columns"] = len(cols)
        else:
            scans.append({"pushed_filters": [], "read_columns": len(cols)})
    return scans


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True if at least one WholeStageCodegen subtree compiles for this
    plan. Uses the codegen explain mode because under AQE the
    pre-execution executedPlan string hides codegen annotations."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    return "WholeStageCodegen" in buf.getvalue()


def plan_summary(df: DataFrame) -> dict:
    """One-call summary used in tests and perf review."""
    plan = _executed_plan(df)
    return {
        "exchanges": count_exchanges(df),
        "joins": join_strategies(df),
        "scans": scan_info(df),
        "has_whole_stage_codegen": has_whole_stage_codegen(df),
        "take_ordered": "TakeOrderedAndProject" in plan,
    }
