"""Tests for round-7 batch-8 operators: cross_class_dups,
backtest_snaive."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.dedup import cross_class_dups
from etl_orders_to_bq_spark.operators.timeseries import backtest_snaive


def test_cross_class_dups_finds_only_cross_class(spark):
    rows = [
        (1, "en", "same text"),
        (2, "fr", "same  TEXT "),     # normalizes equal -> cross-class
        (3, "en", "other text"),
        (4, "en", "other text"),      # same-class dup: NOT flagged
        (5, "de", "unique thing"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    out = cross_class_dups(df, "lang", "text").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 2 and r["n_classes"] == 2
    assert r["classes"] == "en,fr"


def test_cross_class_dups_empty_when_clean(spark):
    df = spark.createDataFrame(
        [(1, "en", "a"), (2, "fr", "b")], "doc_id int, lang string, text string"
    )
    assert cross_class_dups(df, "lang").count() == 0


def test_backtest_snaive_perfect_weekly_cycle(spark):
    # strict period-7 series: lag-7 forecast is exact -> mae/mape/bias 0
    rows = [
        (f"2024-01-{d:02d} 00:00:00", float(100 + (d % 7) * 10))
        for d in range(1, 29)
    ]
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), "v"
    )
    r = backtest_snaive(df, "ts", "v", season=7).collect()[0]
    assert r["n_days"] == 28 and r["n_scored"] == 21
    assert r["mae"] == 0.0 and r["mape"] == 0.0 and r["bias"] == 0.0


def test_backtest_snaive_known_errors(spark):
    # two weeks, week2 = week1 + 7 exactly: mae 7, bias 7,
    # mape = mean(7/actual) over week-2 days
    vals1 = [70.0, 140.0, 70.0, 140.0, 70.0, 140.0, 70.0]
    rows = []
    for d in range(7):
        rows.append((f"2024-01-{d+1:02d} 00:00:00", vals1[d]))
        rows.append((f"2024-01-{d+8:02d} 00:00:00", vals1[d] + 7.0))
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), "v"
    )
    r = backtest_snaive(df, "ts", "v", season=7).collect()[0]
    assert r["n_scored"] == 7
    assert r["mae"] == 7.0 and r["bias"] == 7.0
    # actuals: 77,147 alternating (4x 77, 3x 147)
    expect_mape = round(
        (4 * round(1e6 * 7 / 77) + 3 * round(1e6 * 7 / 147)) / (7 * 1e6), 6
    )
    assert r["mape"] == expect_mape
