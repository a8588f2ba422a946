"""Driver-contract invariants for __spark_entry__.py: every oracle has
a query, aliases stay aligned, and the snapshot-ordering discipline
(never-driver-verified entries first) cannot silently regress."""

import glob
import json
import os

import __spark_entry__ as entry


def test_every_oracle_key_has_a_query():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs), set(os_) - set(qs)


def test_no_rows_only_queries_remain():
    """Every registry entry carries an oracle — the former rows-only
    trio (sketch_agg, ann_ivf_topk, sketch_rollup_merge) now gates via
    bounded-error oracles (exact reference columns + within-published-
    error booleans the oracle pins true). Growing this set back
    silently weakens the correctness gate."""
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(qs) - set(os_) == set()


def test_driver_verified_names_remain_registered():
    """CORRECTNESS history only accumulates if past driver-verified
    query names stay registered under the same name — check every
    recorded round, not a hardcoded list."""
    qs = set(entry.queries())
    here = os.path.dirname(os.path.abspath(entry.__file__))
    records = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    assert records, "no CORRECTNESS_r*.json found next to __spark_entry__.py"
    for path in records:
        verified = set(json.load(open(path)))
        assert verified <= qs, f"{os.path.basename(path)}: {verified - qs}"


def test_plans_md_covers_every_query():
    """PLANS.md (the plan-audit artifact the perf claims cite) must
    carry exactly one row per registry entry — a query added without
    regenerating the audit would otherwise silently escape the
    row-at-a-time-Python and shuffle-count inventory."""
    here = os.path.dirname(os.path.abspath(entry.__file__))
    path = os.path.join(here, "PLANS.md")
    assert os.path.exists(path), "PLANS.md missing — run scripts/plan_audit.py"
    names = set()
    with open(path) as fh:
        for line in fh:
            if line.startswith("| ") and not line.startswith("| query"):
                cell = line.split("|")[1].strip().strip("`")
                if cell and not set(cell) <= {"-", " "}:
                    names.add(cell)
    qs = set(entry.queries())
    assert names == qs, (
        f"PLANS.md drift — missing rows: {sorted(qs - names)}; "
        f"stale rows: {sorted(names - qs)} (run scripts/plan_audit.py)"
    )


def test_never_driver_verified_entries_lead_the_registry():
    """The driver snapshots a 50-entry prefix of queries(), so every
    entry with no CORRECTNESS row yet must sort BEFORE every entry that
    already has one — otherwise new work silently never gets driver
    rows (the rotation discipline)."""
    here = os.path.dirname(os.path.abspath(entry.__file__))
    covered = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        covered |= set(json.load(open(path)))
    names = list(entry.queries())
    unverified = [n for n in names if n not in covered]
    if not unverified:
        return
    last_unverified = max(names.index(n) for n in unverified)
    first_verified = min(
        (names.index(n) for n in names if n in covered), default=len(names)
    )
    assert last_unverified < first_verified, (
        f"never-driver-verified entries must lead the registry; "
        f"{names[last_unverified]} at {last_unverified} sits after "
        f"verified {names[first_verified]} at {first_verified}"
    )
    assert len(unverified) <= 50, (
        "more never-verified entries than one driver snapshot covers — "
        "rotation will strand some; keep the front <= 50"
    )
