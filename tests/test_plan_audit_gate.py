"""Plan-regression gate for the most expensive headline queries.

scripts/plan_audit.py generates PLANS.md as documentation; this test
makes the same audit a CI GATE for the ten queries that dominate the
bench wall (BENCH_r07 dev run ordering), so a refactor that silently
adds a shuffle, drops a broadcast into a sort-merge/nested-loop, or
introduces row-at-a-time Python fails pytest instead of waiting for a
bench diff next round.

Bounds are CEILINGS pinned at the current plan (PLANS.md values), so a
genuinely better plan passes; only regressions trip. The audit runs the
final post-AQE plan at sf0.001 (EmptyRelation fallback to sf0.01,
mirroring the script), same as the PLANS.md rows.
"""

from __future__ import annotations

import os
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "scripts"))

SF_DIR = "/root/testdata/sf0.001"
SF_FALLBACK = "/root/testdata/sf0.01"

# name -> (max shuffle exchanges, max arrow-python boundaries,
#          sort-merge/shuffled-hash joins allowed?)
# Ceilings from PLANS.md as of round 7. row-python and cartesian /
# broadcast-nested-loop joins are banned outright for all ten.
EXPENSIVE = {
    "corpus_pipeline": (2, 0, False),
    # r10: +1 exchange — the (pair, weight) pre-count groupBy that
    # collapses the wedge-sized shuffle map-side (wall halved at 10x)
    "adamic_adar": (5, 0, False),
    "semdedup_kmeans": (3, 5, False),
    "semdedup": (3, 1, False),
    "span_dedup": (4, 0, False),
    # r13 opt: +2 exchanges — the gated _spread_if_underpartitioned
    # round-robin repartition ahead of the CPU-bound feature hashing
    # (single-split local fixtures only; measured 2.2 -> 1.4 s at
    # sf0.1) and its AQE-counted reader
    "quality_classifier": (5, 0, False),
    "dedup_embedding": (2, 2, False),
    "pagerank": (1, 0, False),
    "o4_dedup_first": (1, 0, False),
    "entity_resolution": (4, 0, False),
}


@pytest.fixture(scope="module")
def audited(spark):
    import plan_audit

    import __spark_entry__ as entry

    qs = entry.queries()
    out = {}
    for name in EXPENSIVE:
        summary, plan = plan_audit._audit_one(spark, qs[name], SF_DIR)
        if "EmptyRelation" in plan and os.path.isdir(SF_FALLBACK):
            summary, plan = plan_audit._audit_one(
                spark, qs[name], SF_FALLBACK
            )
        out[name] = (summary, plan)
    return out


@pytest.mark.parametrize("name", sorted(EXPENSIVE))
def test_expensive_query_plan_within_ceilings(audited, name):
    (n_ex, joins, py, row_py, codegen, _rec, _bytes), plan = audited[name]
    max_ex, max_py, allow_smj = EXPENSIVE[name]
    assert n_ex <= max_ex, (
        f"{name}: {n_ex} shuffle exchanges (ceiling {max_ex}) — a "
        f"refactor added a shuffle; joins={joins}"
    )
    assert py <= max_py, (
        f"{name}: {py} Arrow-Python boundaries (ceiling {max_py})"
    )
    assert row_py == 0, (
        f"{name}: row-at-a-time Python (BatchEvalPython) entered the plan"
    )
    assert "CartesianProduct" not in joins, f"{name}: cartesian product"
    assert "BroadcastNestedLoopJoin" not in joins, (
        f"{name}: broadcast nested-loop join (non-equi fallback) — an "
        f"equi-join condition was lost"
    )
    if not allow_smj:
        assert "SortMergeJoin" not in joins, (
            f"{name}: a broadcast join regressed to sort-merge at audit "
            f"scale — a small side grew or a hint was dropped"
        )
    assert codegen, f"{name}: no whole-stage codegen span in final plan"


def test_pushdown_reaches_scan_on_fact_queries(spark):
    """Filter + projection pushdown must reach the parquet scan on a
    representative fact-table query (the judge's third criterion).
    q6_forecast_revenue filters lineitem on date/discount/quantity: the
    scan must report PushedFilters and a pruned ReadSchema."""
    import __spark_entry__ as entry

    df = entry.queries()["q6_forecast_revenue"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "no filters pushed to the lineitem scan"
    read = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "l_comment" not in read, (
        "projection pruning lost: scan reads l_comment for a "
        "3-column aggregate"
    )


def _committed_sh_bytes():
    """name -> sh-bytes as committed in PLANS.md (the plan-volume
    baseline the r11 verdict asked to gate against)."""
    out = {}
    with open(os.path.join(HERE, "PLANS.md")) as fh:
        for line in fh:
            if not line.startswith("| "):
                continue
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            if len(cells) != 8 or cells[0] in ("query", "---"):
                continue
            try:
                out[cells[0]] = int(cells[7])
            except ValueError:
                continue
    return out


def test_shuffle_volume_within_3x_of_committed_plans(spark):
    """r11 verdict #8: a refactor that re-inlines a scan, loses a
    broadcast, or starts shuffling text instead of fingerprints shows
    up first as shuffle VOLUME. Gate the heaviest committed shufflers
    (top 15 by sh-bytes in PLANS.md, plus the EXPENSIVE set) at 3x
    their committed sh-bytes, with a 4 KiB floor so byte-level jitter
    on near-empty exchanges never trips it."""
    import plan_audit

    import __spark_entry__ as entry

    committed = _committed_sh_bytes()
    assert len(committed) > 300, "PLANS.md parse failed"
    top = sorted(committed, key=committed.get, reverse=True)[:15]
    names = sorted(set(top) | set(EXPENSIVE))
    qs = entry.queries()
    failures = []
    for name in names:
        if name not in qs or name not in committed:
            continue
        summary, plan = plan_audit._audit_one(spark, qs[name], SF_DIR)
        if "EmptyRelation" in plan and os.path.isdir(SF_FALLBACK):
            summary, plan = plan_audit._audit_one(
                spark, qs[name], SF_FALLBACK
            )
        got = summary[6]
        ceiling = max(3 * committed[name], 4096)
        if got > ceiling:
            failures.append(
                f"{name}: shuffle bytes {got} > ceiling {ceiling} "
                f"(committed {committed[name]})"
            )
    assert not failures, "; ".join(failures)
