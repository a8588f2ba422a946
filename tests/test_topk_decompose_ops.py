"""Tests for round-7 batch-6 operators: topk_per_group, mix_shift,
median_ci, streaming quota_flags."""

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.decompose import mix_shift
from etl_orders_to_bq_spark.operators.ranking import (
    _Z975,
    median_ci,
    topk_per_group,
)
from etl_orders_to_bq_spark.streaming.events import quota_flags


def test_topk_per_group_equals_window_formulation(spark):
    # many groups, planted ties (same value, different ids), spread
    # over several partitions
    rows = [(i % 7, float((i * 37) % 50), i) for i in range(500)]
    df = spark.createDataFrame(rows, "g int, v double, id int").repartition(8)
    got = [
        tuple(r)
        for r in topk_per_group(df, ["g"], "v", "id", k=5)
        .orderBy("g", "rank")
        .collect()
    ]
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    ref = [
        tuple(r)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 5")
        .select("g", "rank", "v", "id")
        .orderBy("g", "rank")
        .collect()
    ]
    assert got == ref and len(got) == 35


def test_topk_per_group_ascending(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 1), (1, 2.0, 2), (1, 9.0, 3)], "g int, v double, id int"
    )
    got = topk_per_group(df, ["g"], "v", "id", k=2, descending=False).collect()
    assert [(r["rank"], r["v"]) for r in sorted(got, key=lambda r: r["rank"])] == [
        (1, 2.0),
        (2, 5.0),
    ]


def test_mix_shift_telescopes(spark):
    rows = [
        ("s1", "A", 10.0), ("s1", "A", 20.0), ("s1", "B", 40.0),
        ("s2", "B", 8.0),   # appears only in B
        ("s3", "A", 6.0),   # disappears in B
        ("sX", "C", 99.0),  # outside both periods: dropped
    ]
    df = spark.createDataFrame(rows, "seg string, p string, rev double")
    out = {
        r["segment"]: r
        for r in mix_shift(df, "seg", F.col("p"), "rev").collect()
    }
    assert "sX" not in out
    for s, r in out.items():
        # volume_effect + rate_effect == rev_b - rev_a (exact split)
        assert abs(
            (r["volume_effect"] + r["rate_effect"])
            - (r["rev_b"] - r["rev_a"])
        ) < 1e-6, s
    assert out["s1"]["vol_a"] == 2 and out["s1"]["rate_a"] == 15.0
    assert out["s2"]["rate_a"] is None and out["s2"]["volume_effect"] == 0.0
    assert out["s3"]["vol_b"] == 0 and out["s3"]["rate_b"] is None


def test_median_ci_known_values(spark):
    n = 100
    df = spark.createDataFrame([(float(i),) for i in range(1, n + 1)], "v double")
    r = median_ci(df, "v").collect()[0]
    hw = _Z975 * math.sqrt(n)
    lo = max(1, math.floor((n - hw) / 2.0))
    hi = min(n, math.ceil(1.0 + (n + hw) / 2.0))
    assert r["n"] == n
    assert r["median"] == float((n + 1) // 2)
    assert r["ci_lo"] == float(lo) and r["ci_hi"] == float(hi)
    assert r["ci_lo"] < r["median"] < r["ci_hi"]


def test_median_ci_empty(spark):
    df = spark.createDataFrame([], "v double")
    r = median_ci(df, "v").collect()[0]
    assert r["n"] == 0 and r["median"] is None


def test_quota_flags_batch_semantics(spark):
    rows = []
    # user 1: 4 events in one window (flagged, overage 2);
    # user 2: 2 events (not flagged)
    for i in range(4):
        rows.append((i, f"2024-03-01 00:0{i}:00", 1))
    rows.append((10, "2024-03-01 00:10:00", 2))
    rows.append((11, "2024-03-01 00:11:00", 2))
    df = spark.createDataFrame(
        rows, "event_id int, ts string, user_id int"
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "user_id")
    out = quota_flags(df, quota=2, window="6 hours").collect()
    assert len(out) == 1
    assert out[0]["user_id"] == 1
    assert out[0]["n_events"] == 4 and out[0]["overage"] == 2


def test_topk_per_group_null_values_match_window(spark):
    # NULL order values: window desc = nulls LAST; the combiner must
    # agree row-for-row (and asc = nulls FIRST)
    rows = [(1, 5.0, 1), (1, None, 2), (1, 9.0, 3), (1, 7.0, 4),
            (2, None, 5), (2, None, 6)]
    df = spark.createDataFrame(rows, "g int, v double, id int")
    for desc in (True, False):
        order = (
            [F.desc("v"), F.asc("id")] if desc else [F.asc("v"), F.asc("id")]
        )
        w = Window.partitionBy("g").orderBy(*order)
        ref = [
            tuple(r)
            for r in df.withColumn("rank", F.row_number().over(w))
            .filter("rank <= 3")
            .select("g", "rank", "v", "id")
            .orderBy("g", "rank")
            .collect()
        ]
        got = [
            tuple(r)
            for r in topk_per_group(df, ["g"], "v", "id", k=3,
                                    descending=desc)
            .orderBy("g", "rank")
            .collect()
        ]
        assert got == ref, ("desc" if desc else "asc", got, ref)
