"""Driver-contract invariants for __spark_entry__.py: every oracle has
a query, aliases stay aligned, and the snapshot-ordering discipline
(never-driver-verified entries first) cannot silently regress."""

import json
import os

import __spark_entry__ as entry


def test_every_oracle_key_has_a_query():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs), set(os_) - set(qs)


def test_rows_only_queries_are_the_documented_ones():
    """Queries without an oracle are a deliberate, documented set —
    growing it silently weakens the correctness gate."""
    qs, os_ = entry.queries(), entry.oracle_sql()
    rows_only = set(qs) - set(os_)
    assert rows_only == {"sketch_agg", "ann_ivf_topk", "sketch_rollup_merge"}


def test_driver_verified_names_remain_registered():
    """CORRECTNESS history only accumulates if past driver-verified
    query names stay registered under the same name."""
    qs = set(entry.queries())
    here = os.path.dirname(os.path.abspath(entry.__file__))
    for rec in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        path = os.path.join(here, rec)
        if os.path.exists(path):
            verified = set(json.load(open(path)))
            assert verified <= qs, f"{rec}: {verified - qs}"
