"""Tests for the deterministic normal CDF and Benjamini-Hochberg
FDR operator."""

import math

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.multitest import fdr_bh, norm_sf


def test_norm_sf_matches_erfc_reference(spark):
    # engine Φ-complement vs math.erfc ground truth: A&S 26.2.17
    # guarantees |eps| < 7.5e-8, our exp adds ~1e-13 — assert 1e-7
    zs = [0.0, 0.5, 1.0, 1.645, 1.96, 2.575, 3.5, 5.0]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {
        r["z"]: r["sf"]
        for r in df.select("z", norm_sf(F.col("z")).alias("sf")).collect()
    }
    for z in zs:
        truth = 0.5 * math.erfc(z / math.sqrt(2.0))
        assert abs(got[z] - truth) < 1e-7, (z, got[z], truth)


def test_fdr_bh_rejects_only_the_shifted_group(spark):
    rows = []
    # three large null groups at mean 10; one SMALL group shifted +3
    # (small enough not to drag the global mean, big enough shift to
    # be the lone discovery)
    for g, mu, n in [("a", 10, 200), ("b", 10, 200),
                     ("c", 10, 200), ("shifted", 13, 8)]:
        for j in range(n):
            rows.append((g, float(mu + (j % 5) - 2)))  # spread +-2
    df = spark.createDataFrame(rows, "g string, value double")
    out = {r["g"]: r for r in fdr_bh(df, "g", "value", q=0.05).collect()}
    assert out["shifted"]["rejected"] is True
    assert out["shifted"]["p_rank"] == 1
    assert out["shifted"]["p_value"] < 1e-4
    for g in ("a", "b", "c"):
        assert out[g]["rejected"] is False
        assert out[g]["p_value"] > 0.05


def test_fdr_bh_constant_metric_yields_null_not_p1(spark):
    # globally constant metric: pooled variance m2 - m0*m0 is zero (or
    # slightly negative after independent 6dp rounding) -> z undefined.
    # The test that never ran must report NULL p, never a confident 1.0.
    rows = [(g, 7.0) for g in "abcd" for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, value double")
    out = fdr_bh(df, "g", "value", q=0.1).collect()
    assert len(out) == 4
    for r in out:
        assert r["z"] is None
        assert r["p_value"] is None
        assert r["rejected"] is False


def test_fdr_bh_null_data_rejects_nothing(spark):
    # all groups identical -> z = 0, p = 1 -> no rejections
    rows = [(g, float(v)) for g in "abcd" for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, value double")
    out = fdr_bh(df, "g", "value", q=0.1).collect()
    assert all(r["rejected"] is False for r in out)
    assert all(r["p_value"] == 1.0 for r in out)
