"""Tests for round-7 batch-5 operators: semantic_types,
join_cardinality, xcorr_lags, uplift_deciles."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.audit import join_cardinality
from etl_orders_to_bq_spark.operators.experiment import uplift_deciles
from etl_orders_to_bq_spark.operators.profile import semantic_types
from etl_orders_to_bq_spark.operators.timeseries import xcorr_lags


def test_semantic_types_detectors(spark):
    rows = [
        ("a@b.com", '{"k":1}', "Customer#0042"),
        ("x@y.org", "http://e.com/p", "2024-01-02"),
        (None, "123", "-4.5"),
    ]
    df = spark.createDataFrame(rows, "c1 string, c2 string, c3 string")
    out = {
        (r["column_name"], r["sem_type"]): r["n"]
        for r in semantic_types(df, ["c1", "c2", "c3"], "t").collect()
    }
    assert out[("c1", "email")] == 2 and out[("c1", "null")] == 1
    assert out[("c2", "json_object")] == 1
    assert out[("c2", "url")] == 1
    assert out[("c2", "integer")] == 1
    assert out[("c3", "prefixed_id")] == 1
    assert out[("c3", "date")] == 1
    assert out[("c3", "decimal")] == 1


def test_semantic_types_priority_first_match_wins(spark):
    # a json object that also starts with a digit-free text: json wins
    df = spark.createDataFrame([("{}",), ("42",)], "c string")
    out = {
        r["sem_type"]: r["share"]
        for r in semantic_types(df, ["c"], "t").collect()
    }
    assert out == {"json_object": 0.5, "integer": 0.5}


def test_join_cardinality_exact_prediction(spark):
    a = spark.createDataFrame([(1,), (1,), (2,), (3,), (None,)], "k int")
    b = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k int")
    r = join_cardinality(a, "k", b, "k", "t").collect()[0]
    # predicted = 2*1 (k=1) + 1*2 (k=2) = 4 == actual inner join rows
    actual = a.join(b, "k").count()
    assert r["predicted_rows"] == 4 == actual
    assert r["n_keys_left"] == 3 and r["n_keys_right"] == 3
    assert r["n_keys_shared"] == 2
    assert r["max_key_rows"] == 2
    assert r["skew_share"] == 0.5


def test_join_cardinality_disjoint(spark):
    a = spark.createDataFrame([(1,)], "k int")
    b = spark.createDataFrame([(2,)], "k int")
    r = join_cardinality(a, "k", b, "k").collect()[0]
    assert r["predicted_rows"] == 0 and r["skew_share"] is None


def test_xcorr_lags_shifted_series(spark):
    # b is a copied one day later: xcorr at lag +1 must be exactly 1
    rows = []
    vals = [5.0, 9.0, 2.0, 7.0, 4.0, 8.0, 1.0, 6.0]
    for i, v in enumerate(vals):
        rows.append((f"2024-02-{i+1:02d} 00:00:00", "a", v))
        rows.append((f"2024-02-{i+2:02d} 00:00:00", "b", v))
    df = spark.createDataFrame(rows, "ts string, k string, v double").select(
        F.to_timestamp("ts").alias("ts"), "k", "v"
    )
    out = {
        r["lag"]: r
        for r in xcorr_lags(df, "ts", "v", "k", "a", "b", max_lag=2).collect()
    }
    assert out[1]["xcorr"] == 1.0 and out[1]["n_pairs"] == 8
    assert out[-1]["n_pairs"] == 6  # overlap shrinks off-alignment
    assert set(out) == {-2, -1, 0, 1, 2}


def test_uplift_deciles_known_uplift(spark):
    # 40 units, scores descending with id; treated evens convert in
    # the top half only -> top deciles carry the uplift
    rows = []
    for i in range(40):
        treat = i % 2
        converted = 1 if (treat == 1 and i < 20) else 0
        rows.append((i, treat, float(1000 - i), converted))
    df = spark.createDataFrame(rows, "u int, treat int, score double, y int")
    out = {
        r["bucket"]: r
        for r in uplift_deciles(df, "u", "treat", "score", "y", 10).collect()
    }
    assert len(out) == 10 and all(out[b]["n"] == 4 for b in out)
    for b in range(1, 6):  # top half: treated all convert
        assert out[b]["rate_treat"] == 1.0 and out[b]["rate_ctrl"] == 0.0
        assert out[b]["uplift"] == 1.0
    for b in range(6, 11):
        assert out[b]["uplift"] == 0.0


def test_uplift_deciles_empty_arm_is_null(spark):
    df = spark.createDataFrame(
        [(1, 1, 1.0, 1), (2, 1, 2.0, 0)], "u int, treat int, score double, y int"
    )
    rows = uplift_deciles(df, "u", "treat", "score", "y", 2).collect()
    for r in rows:
        assert r["rate_ctrl"] is None and r["uplift"] is None
