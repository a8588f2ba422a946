"""Tests for round-7 batch-9 operators: cohort_ltv,
period_over_period."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.attribution import cohort_ltv
from etl_orders_to_bq_spark.operators.timeseries import period_over_period


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, ts string, value double"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "value")


def test_cohort_ltv_hand_triangle(spark):
    # cohort of 2024-01-01 week: users 1,2. user 1 spends 10 in w0,
    # 20 in w1; user 2 spends 5 in w0. LTV/user: w0 7.5, w1 17.5
    rows = [
        (1, "2024-01-01 10:00:00", 10.0),
        (1, "2024-01-08 10:00:00", 20.0),
        (2, "2024-01-02 10:00:00", 5.0),
    ]
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r
        for r in cohort_ltv(_events(spark, rows), "user_id", "ts", "value").collect()
    }
    r0 = out[("2024-01-01", 0)]
    r1 = out[("2024-01-01", 1)]
    assert r0["cohort_users"] == 2 and r0["period_revenue"] == 15.0
    assert r0["ltv_per_user"] == 7.5
    assert r1["cum_revenue"] == 35.0 and r1["ltv_per_user"] == 17.5


def test_cohort_ltv_separate_cohorts(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (2, "2024-01-08 00:00:00", 2.0),
    ]
    out = cohort_ltv(_events(spark, rows), "user_id", "ts", "value").collect()
    assert len(out) == 2
    assert all(r["week_offset"] == 0 and r["cohort_users"] == 1 for r in out)


def test_period_over_period_known_growth(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 100.0),
        (1, "2024-01-08 00:00:00", 150.0),
        (1, "2024-01-15 00:00:00", 75.0),
        # gap: skip week of 01-22; next is 01-29 -> pct NULL
        (1, "2024-01-29 00:00:00", 80.0),
    ]
    df = _events(spark, rows)
    out = {str(r["week"]): r for r in
           period_over_period(df, "ts", "value").collect()}
    assert out["2024-01-01"]["wow_pct"] is None
    assert out["2024-01-08"]["wow_pct"] == 0.5
    assert out["2024-01-15"]["wow_pct"] == -0.5
    assert out["2024-01-29"]["wow_pct"] is None  # calendar gap
    assert out["2024-01-29"]["prev_revenue"] is None
