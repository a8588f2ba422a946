"""Tests for round-7 batch-7 operators: interval_audit,
abc_classification."""

import datetime

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.ranking import abc_classification
from etl_orders_to_bq_spark.operators.temporal import interval_audit


def _d(s):
    return datetime.date.fromisoformat(s)


def test_interval_audit_overlaps_gaps_touching(spark):
    rows = [
        # key 1: overlap (2nd starts before 1st ends), then a 5-day
        # gap, then a TOUCHING interval (neither overlap nor gap)
        (1, _d("2024-01-01"), _d("2024-01-10")),
        (1, _d("2024-01-05"), _d("2024-01-12")),
        (1, _d("2024-01-17"), _d("2024-01-20")),
        (1, _d("2024-01-20"), _d("2024-01-25")),
        # key 2: single interval, nothing to compare
        (2, _d("2024-02-01"), _d("2024-02-02")),
    ]
    df = spark.createDataFrame(rows, "k int, s date, e date")
    r = interval_audit(df, "k", "s", "e").collect()[0]
    assert r["n_keys"] == 2 and r["n_intervals"] == 5
    assert r["n_overlaps"] == 1
    assert r["n_gaps"] == 1
    assert r["total_gap_days"] == 5 and r["max_gap_days"] == 5


def test_interval_audit_clean_timeline(spark):
    rows = [(1, _d("2024-01-01"), _d("2024-01-02")),
            (1, _d("2024-01-02"), _d("2024-01-03"))]
    df = spark.createDataFrame(rows, "k int, s date, e date")
    r = interval_audit(df, "k", "s", "e").collect()[0]
    assert r["n_overlaps"] == 0 and r["n_gaps"] == 0


def test_abc_classification_hand_case(spark):
    # weights 80, 15, 4, 1 (total 100): cumulative 80/95/99/100
    # -> A (80<=80), B (95<=95), C (99>95), C
    rows = [(1, 80), (2, 15), (3, 4), (4, 1)]
    df = spark.createDataFrame(rows, "k int, w long")
    out = {r["k"]: r for r in abc_classification(df, "k", "w").collect()}
    assert out[1]["abc_class"] == "A"
    assert out[2]["abc_class"] == "B"
    assert out[3]["abc_class"] == "C" and out[4]["abc_class"] == "C"
    assert out[1]["cum_share"] == 0.8
    assert out[4]["cum_share"] == 1.0


def test_abc_classification_tie_break_deterministic(spark):
    # equal weights: ties cut by key ascending, reruns identical
    df = spark.createDataFrame([(k, 10) for k in range(10)], "k int, w long")
    a = [(r["k"], r["abc_class"]) for r in
         abc_classification(df, "k", "w").orderBy("k").collect()]
    b = [(r["k"], r["abc_class"]) for r in
         abc_classification(df, "k", "w").orderBy("k").collect()]
    assert a == b
    # 10 equal weights: cum shares 10%..100% -> 8 A's, 1 B, 1 C
    classes = [c for _k, c in a]
    assert classes.count("A") == 8 and classes.count("B") == 1
    assert classes.count("C") == 1


def test_abc_classification_aggregates_duplicate_keys(spark):
    df = spark.createDataFrame(
        [(1, 50), (1, 30), (2, 20)], "k int, w long"
    )
    out = {r["k"]: r for r in abc_classification(df, "k", "w").collect()}
    assert out[1]["w"] == 80 and out[1]["abc_class"] == "A"
    assert out[2]["abc_class"] == "C"
