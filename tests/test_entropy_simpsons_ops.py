"""Tests for round-7 batch-11 operators: char_entropy,
simpsons_check, freshness_audit."""

import math

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.functions.text import char_entropy
from etl_orders_to_bq_spark.operators.experiment import simpsons_check
from etl_orders_to_bq_spark.operators.quality import freshness_audit


def test_char_entropy_known_values(spark):
    rows = [
        (1, "aaaa"),        # one symbol -> 0 bits
        (2, "abab"),        # two equiprobable -> 1 bit
        (3, "abcd"),        # four equiprobable -> 2 bits
        (4, ""),            # empty -> NULL
        (5, "aaab"),        # H(3/4, 1/4)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: r["e"]
        for r in df.select("doc_id", char_entropy("text").alias("e")).collect()
    }
    assert out[1] == 0.0
    assert out[2] == 1.0
    assert out[3] == 2.0
    assert out[4] is None
    expect = round(-(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25)), 6)
    assert out[5] == expect


def test_simpsons_check_textbook_reversal(spark):
    # classic: treatment better in BOTH segments, worse pooled
    # (segment sizes confounded with assignment)
    rows = []
    # segment A: treat 90 units 90% conv; ctrl 10 units 100%... build
    # the standard kidney-stone-style table:
    # seg small: treat n=87 conv=81 (93%); ctrl n=270 conv=234 (87%)
    # seg large: treat n=263 conv=192 (73%); ctrl n=80 conv=55 (69%)
    # pooled: treat 273/350 (78%) < ctrl 289/350 (83%) -> reversal
    def add(seg, treat, conv, n):
        for i in range(n):
            rows.append((treat, 1 if i < conv else 0, seg))
    add("small", 1, 81, 87)
    add("small", 0, 234, 270)
    add("large", 1, 192, 263)
    add("large", 0, 55, 80)
    df = spark.createDataFrame(rows, "treat int, y int, seg string")
    out = {r["segment"]: r for r in
           simpsons_check(df, "treat", "y", "seg").collect()}
    assert out["small"]["rate_diff"] > 0
    assert out["large"]["rate_diff"] > 0
    assert out["OVERALL"]["rate_diff"] < 0
    assert out["small"]["reverses_overall"] is True
    assert out["large"]["reverses_overall"] is True
    assert out["OVERALL"]["reverses_overall"] is False


def test_freshness_audit_lags(spark):
    rows = [
        ("a", "2024-01-01 10:00:00"),
        ("a", "2024-01-01 12:00:00"),   # freshest overall
        ("b", "2024-01-01 11:45:30"),   # 14.5 min behind -> 14, fresh
        ("c", "2024-01-01 10:30:00"),   # 90 min behind -> stale
    ]
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.to_timestamp("ts").alias("ts")
    )
    out = {r["k"]: r for r in
           freshness_audit(df, "k", "ts", stale_minutes=30).collect()}
    assert out["a"]["lag_minutes"] == 0 and out["a"]["is_stale"] is False
    assert out["b"]["lag_minutes"] == 14 and out["b"]["is_stale"] is False
    assert out["c"]["lag_minutes"] == 90 and out["c"]["is_stale"] is True
    assert out["a"]["n_events"] == 2


def test_simpsons_check_survives_overall_named_segment(spark):
    # a DATA segment literally named 'OVERALL' must not corrupt the
    # pooled comparison (marker column, not the label, drives it)
    rows = [(1, 1, "OVERALL"), (1, 0, "OVERALL"), (0, 0, "OVERALL"),
            (1, 1, "x"), (0, 1, "x"), (0, 0, "x")]
    df = spark.createDataFrame(rows, "treat int, y int, seg string")
    out = simpsons_check(df, "treat", "y", "seg").collect()
    # 2 data segments + 1 pooled row, never duplicated
    assert len(out) == 3
    labels = sorted(r["segment"] for r in out)
    assert labels == ["OVERALL", "OVERALL", "x"]
    for r in out:
        assert r["reverses_overall"] in (True, False)


def test_char_entropy_unicode_line_separators_parity(spark):
    # U+2028/U+0085 would vanish Spark-side (Java '.' excludes them)
    # while RE2 counts them — the strip makes both engines see 5 chars
    t = "ab" + chr(0x2028) + "ab" + chr(0x85) + "x"
    df = spark.createDataFrame([(t,)], "text string")
    import math

    got = df.select(char_entropy("text").alias("e")).collect()[0]["e"]
    expect = round(
        -(0.4 * math.log2(0.4) + 0.4 * math.log2(0.4)
          + 0.2 * math.log2(0.2)), 6
    )
    assert got == expect
