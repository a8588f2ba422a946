"""Skew operators must produce results identical to their naive
equivalents while spreading hot keys."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.skew import (
    salted_agg,
    salted_left_join,
    with_salt,
)


def _skewed_df(spark):
    # key 1 is hot: 5000 of 5100 rows
    rows = [(1, i * 1.0) for i in range(5000)] + [
        (k, float(k)) for k in range(2, 102)
    ]
    return spark.createDataFrame(rows, "k long, v double")


def test_salted_agg_matches_naive(spark):
    df = _skewed_df(spark)
    naive = {
        r["k"]: (r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["count_v"], r["min_v"], r["max_v"])
        for r in salted_agg(df, ["k"], {"v": "count"}, buckets=8)
        .join(
            salted_agg(df, ["k"], {"v": "min"}, buckets=8), "k"
        )
        .join(salted_agg(df, ["k"], {"v": "max"}, buckets=8), "k")
        .collect()
    }
    assert salted == naive


def test_salted_agg_sum_close(spark):
    df = _skewed_df(spark)
    naive = df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    salted = {
        r["k"]: r["sum_v"] for r in salted_agg(df, ["k"], {"v": "sum"}).collect()
    }
    for r in naive:
        assert abs(salted[r["k"]] - r["s"]) < 1e-6


def test_salt_actually_spreads(spark):
    df = with_salt(_skewed_df(spark), buckets=8)
    per_salt = (
        df.filter(F.col("k") == 1).groupBy("__salt").count().collect()
    )
    assert len(per_salt) == 8  # hot key hits every bucket
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 5000  # no single bucket holds the whole key


def test_salted_left_join_matches_naive(spark):
    left = _skewed_df(spark)
    right = spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 50)], "k long, name string"
    )
    naive = left.join(right, "k", "left")
    salted = salted_left_join(left, right, "k", buckets=4)
    assert salted.count() == naive.count()
    n_naive = {
        (r["k"], r["name"]): r["c"]
        for r in naive.groupBy("k", "name").agg(F.count("*").alias("c")).collect()
    }
    n_salted = {
        (r["k"], r["name"]): r["c"]
        for r in salted.groupBy("k", "name").agg(F.count("*").alias("c")).collect()
    }
    assert n_naive == n_salted


def test_quality_profile_and_expectations(spark):
    from etl_orders_to_bq_spark.operators.quality import (
        QualityError,
        expect,
        profile,
    )
    import pytest as pt

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (2, "b", 3.0)],
        "id long, s string, v double",
    )
    m = {
        (r["column"], r["metric"]): r["value"] for r in profile(df).collect()
    }
    assert m[("_table", "rows")] == "3"
    assert m[("v", "nulls")] == "1"
    assert m[("id", "distinct")] == "2"
    assert m[("s", "min")] == "a"

    expect(df, not_null=["id"], accepted_values={"s": ["a", "b"]})  # passes
    with pt.raises(QualityError, match="unique:id"):
        expect(df, unique=["id"])
    with pt.raises(QualityError, match="not_null:v"):
        expect(df, not_null=["v"])
    with pt.raises(QualityError, match="accepted:s"):
        expect(df, accepted_values={"s": ["a"]})
