"""Tests for the round-7 batch-3 operators: scalable rank statistics
(global_cumsum_before, mann_whitney_u), mutual information, ACF,
constraint audits (fd_violations, fk_coverage), and code_likeness."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from etl_orders_to_bq_spark.functions.text import code_likeness
from etl_orders_to_bq_spark.operators.audit import fd_violations, fk_coverage
from etl_orders_to_bq_spark.operators.infotheory import mutual_information
from etl_orders_to_bq_spark.operators.multitest import mann_whitney_u
from etl_orders_to_bq_spark.operators.ranking import global_cumsum_before
from etl_orders_to_bq_spark.operators.timeseries import acf_lags


def test_global_cumsum_before_exact(spark):
    # values 1..20 keyed by v; cum_before(v) = sum(1..v-1) regardless
    # of how many range partitions the two-pass uses
    df = spark.createDataFrame([(v, v) for v in range(1, 21)], "k int, v long")
    out = {
        r["k"]: r["cum_before"]
        for r in global_cumsum_before(df, ["k"], "v", num_partitions=4).collect()
    }
    for v in range(1, 21):
        assert out[v] == v * (v - 1) // 2


def test_global_cumsum_before_empty(spark):
    df = spark.createDataFrame([], "k int, v long")
    assert global_cumsum_before(df, ["k"], "v").count() == 0


def test_mann_whitney_matches_rank_reference(spark):
    # deterministic skewed data WITH ties across both groups
    rows = [("a", float(i % 7)) for i in range(60)] + [
        ("b", float((i % 7) + (1 if i % 3 == 0 else 0))) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    got = mann_whitney_u(df, "g", "value", "a", "b").collect()[0]
    pdf = pd.DataFrame(rows, columns=["g", "value"])
    ranks = pdf["value"].rank(method="average")
    na = (pdf.g == "a").sum()
    nb = (pdf.g == "b").sum()
    ra = ranks[pdf.g == "a"].sum()
    ua = ra - na * (na + 1) / 2
    t = pdf["value"].value_counts()
    ties = float((t**3 - t).sum())
    n = na + nb
    var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (ua - na * nb / 2) / np.sqrt(var)
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["u_stat"] == ua
    assert abs(got["z"] - round(z, 6)) < 1e-9
    assert 0.0 <= got["p_value"] <= 1.0


def test_mann_whitney_identical_distributions(spark):
    rows = [(g, float(v)) for g in ("a", "b") for v in range(100)]
    df = spark.createDataFrame(rows, "g string, value double")
    got = mann_whitney_u(df, "g", "value", "a", "b").collect()[0]
    # same values in both groups: U = n*n/2 exactly, z = 0
    assert got["u_stat"] == 100 * 100 / 2
    assert got["z"] == 0.0
    assert got["p_value"] == 1.0


def test_mutual_information_independent_and_identical(spark):
    # x uniform over 4, y constant -> MI 0; y == x -> MI == H(x)
    rows = [(i % 4, 1) for i in range(400)]
    df = spark.createDataFrame(rows, "x int, y int")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi_bits"] == 0.0 and r["h_y"] == 0.0 and r["nmi"] == 0.0
    df2 = spark.createDataFrame([(i % 4, i % 4) for i in range(400)], "x int, y int")
    r2 = mutual_information(df2, "x", "y").collect()[0]
    assert r2["h_x"] == 2.0 and r2["mi_bits"] == 2.0 and r2["nmi"] == 1.0


def test_mutual_information_nulls_are_a_category(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", "x"), ("b", "x")],
        "x string, y string",
    )
    r = mutual_information(df, "x", "y").collect()[0]
    # y is fully determined by x: MI == H(x) == 1 bit
    assert r["mi_bits"] == 1.0 and r["h_xy"] == 1.0


def test_acf_lags_periodic_series(spark):
    # strict period-2 alternation over 40 consecutive days:
    # lag-2 pairs are identical series -> acf 1; lag-1 anti-phase
    rows = [
        (f"2024-01-{d:02d} 00:00:00", 100.0 if d % 2 == 0 else 10.0)
        for d in range(1, 29)
    ]
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), F.col("v")
    )
    out = {r["lag"]: r for r in acf_lags(df, "ts", "v", max_lag=3).collect()}
    assert out[2]["acf"] == 1.0
    assert out[1]["acf"] == -1.0
    assert out[1]["n_pairs"] == 27 and out[2]["n_pairs"] == 26


def test_acf_lags_gap_reduces_pairs(spark):
    rows = [("2024-01-01 00:00:00", 1.0), ("2024-01-02 00:00:00", 2.0),
            ("2024-01-04 00:00:00", 4.0)]
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), F.col("v")
    )
    out = {r["lag"]: r["n_pairs"] for r in acf_lags(df, "ts", "v", 3).collect()}
    # lag1: (1,2) only; lag2: (2,4); lag3: (1,4)
    assert out == {1: 1, 2: 1, 3: 1}


def test_fd_violations_holds_and_violated(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "y"), (3, None)],
        "lhs int, rhs string",
    )
    r = fd_violations(df, ["lhs"], "rhs", "t").collect()[0]
    # lhs=1 one variant, lhs=2 two variants, lhs=3 zero non-null
    assert r["n_lhs"] == 3
    assert r["n_violating"] == 1
    assert r["max_rhs_variants"] == 2
    assert r["violation_rate"] == round(1 / 3, 6)


def test_fk_coverage_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (9,), (None,)], "k int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    r = fk_coverage(child, "k", parent, "k", "t").collect()[0]
    assert r["n_child_rows"] == 6  # null excluded
    assert r["n_child_keys"] == 3
    assert r["n_orphan_keys"] == 1 and r["n_orphan_rows"] == 3
    assert r["coverage"] == 0.5


def test_fk_coverage_full(spark):
    child = spark.createDataFrame([(1,), (2,)], "k int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    r = fk_coverage(child, "k", parent, "k").collect()[0]
    assert r["n_orphan_rows"] == 0 and r["coverage"] == 1.0


def test_code_likeness_discriminates(spark):
    rows = [
        ("code", "def f(x):\n  return {x: 1};\n\tvar y = x;\nclass A:"),
        ("prose", "the quick brown fox jumps over the lazy dog again"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    out = {
        r["k"]: r
        for r in df.select("k", code_likeness("text").alias("c"))
        .select("k", "c.*")
        .collect()
    }
    assert out["code"]["is_code"] is True
    assert out["prose"]["is_code"] is False
    assert out["prose"]["score"] == 0.0
    assert out["empty"]["score"] == 0.0  # no division blowup
    assert out["code"]["keyword_ratio"] > 0.2


def test_mann_whitney_all_tied_returns_null_not_crash(spark):
    # every value identical across both groups: variance 0 -> z and p
    # must be NULL (ANSI mode would otherwise throw DIVIDE_BY_ZERO)
    rows = [("a", 5.0)] * 3 + [("b", 5.0)] * 3
    df = spark.createDataFrame(rows, "g string, value double")
    r = mann_whitney_u(df, "g", "value", "a", "b").collect()[0]
    assert r["z"] is None and r["p_value"] is None
    assert r["u_stat"] == 4.5  # ranks still well-defined


def test_acf_constant_series_is_null_not_nan(spark):
    import math

    rows = [(f"2024-01-{d:02d} 00:00:00", 10.0) for d in range(1, 15)]
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), "v"
    )
    out = acf_lags(df, "ts", "v", max_lag=2).collect()
    for r in out:
        assert r["acf"] is None  # undefined, not NaN
        assert not (r["acf"] is not None and math.isnan(r["acf"]))


def test_semantic_types_trailing_newline_is_text(spark):
    from etl_orders_to_bq_spark.operators.profile import semantic_types

    # Java $ matches before a final newline; the detectors use \z so
    # '123\n' must NOT classify as integer (matches the RE2 oracle)
    df = spark.createDataFrame([("123\n",), ("123",)], "c string")
    out = {
        r["sem_type"]: r["n"]
        for r in semantic_types(df, ["c"], "t").collect()
    }
    assert out == {"integer": 1, "text": 1}
