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


def test_registry_is_stalest_verified_first():
    """The driver snapshots a 50-entry prefix of queries(), so the
    registry must order entries stalest-first: never-driver-verified
    entries lead (new work always gets rows), then NON-DECREASING by
    the round each entry was last verified in — bounding every query's
    re-verification age to ~|registry|/50 rounds instead of letting
    r1-r2 verifications go stale forever. scripts/registry_rotate.py
    regenerates the ordering; this test pins it."""
    here = os.path.dirname(os.path.abspath(entry.__file__))
    by_round: dict[int, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int(
            os.path.basename(path).removeprefix("CORRECTNESS_r")
            .removesuffix(".json")
        )
        by_round[rnd] = set(json.load(open(path)))
    names = list(entry.queries())

    def drift_at(max_round):
        last: dict[str, int] = {}
        for rnd, verified in by_round.items():
            if rnd > max_round:
                continue
            for name in verified:
                last[name] = max(last.get(name, 0), rnd)
        rounds = [last.get(n, 0) for n in names]  # 0 = never verified
        for i in range(1, len(rounds)):
            if rounds[i] < rounds[i - 1]:
                return i, rounds
        return None, rounds

    # The driver writes CORRECTNESS_r{N}.json AFTER the builder's last
    # commit of round N, so at judge time there is always one more
    # round file than the last rotation could have seen. Accept an
    # ordering consistent with EITHER the full history (just rotated)
    # or the history minus the newest file (rotated last round, the
    # newest file landed afterwards) — both mean rotation is current.
    newest = max(by_round)
    drift_full, rounds_full = drift_at(newest)
    drift_prev, _ = drift_at(newest - 1)
    assert drift_full is None or drift_prev is None, (
        f"registry not stalest-verified-first even ignoring "
        f"CORRECTNESS_r{newest:02d}.json: {names[drift_full]!r} (last "
        f"verified r{rounds_full[drift_full]}) sits after "
        f"{names[drift_full - 1]!r} (r{rounds_full[drift_full - 1]}); "
        f"run scripts/registry_rotate.py"
    )
    rounds = rounds_full
    unverified = sum(1 for r in rounds if r == 0)
    # One driver snapshot verifies 50; never-verified entries always
    # lead, so a backlog > 50 simply drains over ceil(n/50) rounds —
    # age stays bounded. Cap at two snapshots so a high-velocity
    # round (30+ new operators) passes, while a runaway backlog
    # (> 100 = 3+ rounds of debt) still fails loudly.
    assert unverified <= 100, (
        "never-verified backlog exceeds two driver snapshots — new "
        "work would wait 3+ rounds for its first verification; slow "
        "down additions or split the round"
    )
