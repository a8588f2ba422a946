"""Tests for round-7 batch-13 operators: rbo_overlap,
ks_two_sample."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.lm import rbo_overlap
from etl_orders_to_bq_spark.operators.multitest import ks_two_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_rbo_identical_rankings_is_one(spark):
    rows = []
    # identical corpora -> identical top-k -> RBO@k = (1-p)Σp^(d-1)
    text = "aa aa aa bb bb cc"
    rows.append(("s0", text))
    rows.append(("s1", text))
    r = rbo_overlap(_docs(spark, rows), "source", "s0", "s1", k=3, p=0.9
                    ).collect()[0]
    expect = round(sum(0.1 * (0.9 ** (d - 1)) for d in range(1, 4)), 6)
    assert r["n_shared"] == 3
    assert r["rbo"] == expect


def test_rbo_disjoint_rankings_is_zero(spark):
    rows = [("s0", "aa bb cc"), ("s1", "xx yy zz")]
    r = rbo_overlap(_docs(spark, rows), "source", "s0", "s1", k=3
                    ).collect()[0]
    assert r["n_shared"] == 0 and r["rbo"] == 0.0


def test_rbo_hand_case(spark):
    # s0 top: aa(3) bb(2) cc(1); s1 top: aa(3) cc(2) dd(1)
    rows = [("s0", "aa aa aa bb bb cc"), ("s1", "aa aa aa cc cc dd")]
    r = rbo_overlap(_docs(spark, rows), "source", "s0", "s1", k=3, p=0.9
                    ).collect()[0]
    # shared: aa (max rank 1), cc (max rank 3)
    # overlap(1)=1, overlap(2)=1, overlap(3)=2
    expect = round(0.1 * 1 + 0.1 * 0.9 / 2 * 1 + 0.1 * 0.81 / 3 * 2, 6)
    assert r["n_shared"] == 2
    assert r["rbo"] == expect


def test_ks_two_sample_identical_and_shifted(spark):
    rows = [("a", float(v)) for v in range(100)] + [
        ("b", float(v)) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    r = ks_two_sample(df, "g", "value", "a", "b").collect()[0]
    assert r["d_stat"] == 0.0 and r["reject_95"] is False
    # b fully shifted above a: D = 1, certain rejection
    rows2 = [("a", float(v)) for v in range(100)] + [
        ("b", float(v + 1000)) for v in range(100)
    ]
    df2 = spark.createDataFrame(rows2, "g string, value double")
    r2 = ks_two_sample(df2, "g", "value", "a", "b").collect()[0]
    assert r2["d_stat"] == 1.0 and r2["reject_95"] is True
    assert r2["n_a"] == 100 and r2["n_b"] == 100


def test_ks_two_sample_reference_parity(spark):
    # against an independent numpy ECDF computation with ties
    import numpy as np

    a = [float(v % 13) for v in range(80)]
    b = [float((v % 13) + (1 if v % 4 == 0 else 0)) for v in range(60)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, value double")
    r = ks_two_sample(df, "g", "value", "a", "b").collect()[0]
    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    d_ref = np.max(np.round(np.abs(fa - fb), 6))
    assert r["d_stat"] == round(float(d_ref), 6)
