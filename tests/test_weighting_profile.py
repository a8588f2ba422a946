"""Tests for raking (IPF) weights and the column profiler."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.profile import column_profile
from etl_orders_to_bq_spark.operators.weighting import rake_weights


def test_rake_one_sweep_matches_column_targets_exactly(spark):
    # 2x2 table: rows a/b, cols x/y — counts 1,3 / 2,2 (N=8)
    rows = (
        [("a", "x")] * 1 + [("a", "y")] * 3
        + [("b", "x")] * 2 + [("b", "y")] * 2
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = {
        (x["r"], x["c"]): x
        for x in rake_weights(
            df, "r", "c",
            {"a": 0.5, "b": 0.5}, {"x": 0.5, "y": 0.5},
        ).collect()
    }
    # row sweep: f_a = 0.5*8/4 = 1.0, f_b = 1.0 (rows already even)
    assert out[("a", "x")]["f_row"] == 1.0
    # col marginal after row sweep: x -> 3, y -> 5
    # f_x = 0.5*8/3, f_y = 0.5*8/5
    assert out[("a", "x")]["f_col"] == round(4 / 3, 6)
    assert out[("a", "y")]["f_col"] == round(4 / 5, 6)
    # column sweep lands the column marginal on target EXACTLY:
    # sum over col x of n*weight = 1*4/3 + 2*4/3 = 4 = 0.5*8
    wx = sum(
        out[(r, "x")]["n"] * out[(r, "x")]["weight"] for r in "ab"
    )
    assert abs(wx - 4.0) < 1e-4


def test_rake_unlisted_category_gets_zero_weight(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("zzz", "x")], "r string, c string"
    )
    out = {
        (x["r"], x["c"]): x
        for x in rake_weights(
            df, "r", "c", {"a": 1.0}, {"x": 1.0}
        ).collect()
    }
    assert out[("zzz", "x")]["f_row"] == 0.0
    assert out[("zzz", "x")]["weight"] == 0.0
    assert out[("a", "x")]["weight"] > 0


def test_column_profile_counts_nulls_ndv_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "a", 7.5), (4, None, 2.0)],
        "id long, s string, v double",
    )
    out = {r["column"]: r for r in column_profile(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["v"]["n_null"] == 1 and out["v"]["n_distinct"] == 3
    assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "4"
    assert out["v"]["min_value"] == "2.0" and out["v"]["max_value"] == "7.5"


def test_column_profile_subset_and_approx_mode(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(100)], "id long, s string"
    )
    out = column_profile(df, cols=["s"], exact=False).collect()
    assert len(out) == 1
    # HLL estimate of 3 distinct short strings is exact at this size
    assert out[0]["n_distinct"] == 3
