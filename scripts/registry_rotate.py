"""Regenerate the queries() dict literal in __spark_entry__.py in
stalest-verified-first order.

The driver snapshots a 50-entry prefix of queries() each round, so the
rotation discipline is: entries with NO CORRECTNESS_r*.json row yet
lead (new work always gets driver rows), then everything else ascending
by the round it was LAST driver-verified in — bounding re-verification
staleness to ~|registry|/50 rounds. Within a staleness group the
previous registry order is kept (stable), so diffs stay reviewable.

Run after adding queries or after a new CORRECTNESS_r*.json lands:

    python scripts/registry_rotate.py          # rewrite in place
    python scripts/registry_rotate.py --check  # exit 1 if stale
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(HERE, "__spark_entry__.py")


def last_verified_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, rec in json.load(open(path)).items():
            # a recorded row counts as driver coverage whatever its
            # verdict — failures get FIXED, not silently re-queued
            last[name] = max(last.get(name, 0), rnd)
    return last


def parse_dict_body(src: str) -> tuple[str, list[tuple[str, str]], str, str]:
    m = re.search(
        r'(def queries\(\).*?"""\n)(.*?\n)(    \}\n)', src, re.S
    )
    if not m:
        raise SystemExit("queries() dict literal not found")
    head, body, tail = m.group(1), m.group(2), m.group(3)
    entries = re.findall(r'"([\w]+)": (q_\w+),', body)
    if len(set(n for n, _ in entries)) != len(entries):
        raise SystemExit("duplicate registry names")
    return src[: m.start(2)], entries, src[m.end(2) :], body


def desired_order(
    entries: list[tuple[str, str]], last: dict[str, int]
) -> list[tuple[str, str]]:
    pos = {n: i for i, (n, _) in enumerate(entries)}
    return sorted(
        entries, key=lambda e: (last.get(e[0], 0), pos[e[0]])
    )


def render(entries: list[tuple[str, str]], last: dict[str, int]) -> str:
    out = ["    return {\n"]
    prev = object()
    for name, fn in entries:
        rnd = last.get(name, 0)
        if rnd != prev:
            label = (
                "never driver-verified (new work leads the snapshot)"
                if rnd == 0
                else f"last driver-verified in round {rnd}"
            )
            out.append(f"        # -- {label} --\n")
            prev = rnd
        out.append(f'        "{name}": {fn},\n')
    return "".join(out)


def main() -> int:
    check = "--check" in sys.argv
    src = open(ENTRY).read()
    last = last_verified_rounds()
    pre, entries, post, old_body = parse_dict_body(src)
    want = desired_order(entries, last)
    # the parsed body starts at "    return {" (first line after the
    # docstring) and render() re-emits that opener, so old and new
    # bodies are directly comparable
    new_body = render(want, last)
    if not old_body.lstrip().startswith("return {"):
        raise SystemExit("unexpected dict body shape")
    if new_body == old_body:
        print(f"registry already stalest-first ({len(entries)} entries)")
        return 0
    if check:
        cur = [n for n, _ in entries]
        tgt = [n for n, _ in want]
        drift = next(
            (i for i, (a, b) in enumerate(zip(cur, tgt)) if a != b), None
        )
        print(
            f"registry order stale (first drift at index {drift}: "
            f"{cur[drift]!r} vs {tgt[drift]!r}); run "
            "scripts/registry_rotate.py"
            if drift is not None
            else "registry order ok but comments stale; run "
            "scripts/registry_rotate.py"
        )
        return 1
    open(ENTRY, "w").write(pre + new_body + post)
    fronts = [n for n, _ in want[:50]]
    print(
        f"rewrote {len(entries)} entries; 50-entry driver snapshot now: "
        f"{fronts[:8]} ... (staleness r{last.get(fronts[0], 0)}-"
        f"r{last.get(fronts[-1], 0)})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
