"""Skew operators must produce results identical to their naive
equivalents while spreading hot keys."""

import pytest
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


def test_scd2_lifecycle(spark):
    """Init -> change -> re-apply same -> new key: version history must
    be exact."""
    from etl_orders_to_bq_spark.operators.scd import (
        OPEN_END,
        scd2_apply,
        scd2_init,
    )

    snap = spark.createDataFrame(
        [(1, "alice", "NYC"), (2, "bob", "LA")], "id long, name string, city string"
    )
    h = scd2_init(snap, "2024-01-01 00:00:00")
    assert h.count() == 2

    # day 2: alice moves; bob unchanged; carol appears
    upd = spark.createDataFrame(
        [(1, "alice", "SF"), (2, "bob", "LA"), (3, "carol", "CHI")],
        "id long, name string, city string",
    )
    h2 = scd2_apply(h, upd, "id", ["name", "city"], "2024-01-02 00:00:00")
    rows = {(r["id"], str(r["valid_from"]), str(r["valid_to"])): r["city"]
            for r in h2.collect()}
    assert len(rows) == 4
    # alice: closed NYC + open SF
    assert rows[(1, "2024-01-01 00:00:00", "2024-01-02 00:00:00")] == "NYC"
    assert rows[(1, "2024-01-02 00:00:00", OPEN_END)] == "SF"
    # bob: still one open row
    assert rows[(2, "2024-01-01 00:00:00", OPEN_END)] == "LA"
    # carol: new open row
    assert rows[(3, "2024-01-02 00:00:00", OPEN_END)] == "CHI"

    # idempotence: re-applying identical state changes nothing
    h3 = scd2_apply(h2, upd, "id", ["name", "city"], "2024-01-03 00:00:00")
    assert h3.count() == 4
    assert {tuple(sorted(r.asDict().items())) for r in h3.collect()} == {
        tuple(sorted(r.asDict().items())) for r in h2.collect()
    }


def test_observed_write_collects_metrics_in_one_pass(spark, tmp_path):
    """observe-based metrics must match a separate validation query,
    collected during the write itself (no second scan)."""
    from etl_orders_to_bq_spark.operators.quality import observed_write

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.5), (None, 2.0)],
        "k long, amount double",
    )
    path = str(tmp_path / "observed")
    m = observed_write(
        df,
        path,
        {
            "rows": F.count(F.lit(1)),
            "null_keys": F.count(F.when(F.col("k").isNull(), 1)),
            "total_amount": F.sum("amount"),
        },
    )
    assert m["rows"] == 4
    assert m["null_keys"] == 1
    assert abs(m["total_amount"] - 17.5) < 1e-9
    assert spark.read.parquet(path).count() == 4


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE must detect a hot join key at runtime and split its
    partition (skew=true in the final plan) — the zero-code skew path;
    operators/skew.py salting is for the cases AQE can't see."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.rand(1).alias("v"),
        )
        right = spark.range(0, 10000).select(
            F.col("id").alias("k"), F.rand(2).alias("w")
        )
        j = left.join(right, "k")
        j.collect()
        plan = (
            j._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_merge_upsert_semantics(spark):
    """MERGE edge cases: a legitimately-NULL source value must
    overwrite (presence flag, not coalesce); NULL keys match null-safe;
    update_cols limits which columns the source wins."""
    from etl_orders_to_bq_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (None, "nk", 5.0)],
        "k int, name string, val double",
    )
    source = spark.createDataFrame(
        [(1, "a2", None), (None, "nk2", 7.0), (9, "new", 99.0)],
        "k int, name string, val double",
    )
    got = {
        r["k"]: (r["name"], r["val"])
        for r in merge_upsert(target, source, keys=["k"]).collect()
    }
    assert got[1] == ("a2", None)       # matched: source wins, null included
    assert got[2] == ("b", 20.0)        # target-only: kept
    assert got[None] == ("nk2", 7.0)    # null key matched null-safe
    assert got[9] == ("new", 99.0)      # source-only: inserted

    partial = {
        r["k"]: (r["name"], r["val"])
        for r in merge_upsert(
            target, source, keys=["k"], update_cols=["val"]
        ).collect()
    }
    assert partial[1] == ("a", None)    # name NOT updated, val is


def test_apply_cdc_delete_wins_by_seq(spark):
    """A later delete must beat an earlier update on the same key; ops
    on distinct keys apply independently."""
    from etl_orders_to_bq_spark.operators.merge import apply_cdc

    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    log = spark.createDataFrame(
        [
            (1, 11.0, "U", 1), (1, 0.0, "D", 2),   # delete wins
            (2, 22.0, "U", 5), (2, 21.0, "U", 3),  # latest update wins
            (9, 99.0, "I", 1),                      # insert
        ],
        "k long, v double, op string, seq long",
    )
    got = {r["k"]: r["v"] for r in apply_cdc(snap, log, ["k"]).collect()}
    assert got == {2: 22.0, 3: 30.0, 9: 99.0}


def test_mad_outliers_resists_masking_and_handles_degenerate_groups(spark):
    """The MAD rule must catch outliers a mean/stddev rule would mask
    (two huge values inflate sigma enough to hide each other), and a
    group where >half the values are identical (MAD=0) must flag
    nothing rather than divide by zero."""
    import statistics

    from etl_orders_to_bq_spark.operators.quality import mad_outliers

    base = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 10.0]
    spiked = base + [1000.0, 1200.0]
    rows = [("a", i, v) for i, v in enumerate(spiked)]
    rows += [("b", 100 + i, 5.0) for i in range(6)] + [("b", 110, 50.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")

    out = mad_outliers(df, "v", "g", k=3.0).collect()
    flagged = {r["id"] for r in out if r["is_outlier"]}
    assert flagged == {10, 11}  # both spikes caught

    # classic z-score would mask: sigma is inflated by the spikes
    mu = statistics.mean(spiked)
    sigma = statistics.pstdev(spiked)
    assert abs(1000.0 - mu) / sigma < 3.0

    # degenerate group: MAD = 0 -> null z, nothing flagged
    b_rows = [r for r in out if r["g"] == "b"]
    assert all(r["robust_z"] is None for r in b_rows)
    assert not any(r["is_outlier"] for r in b_rows)


def test_winsorize_robust_fences_and_degenerate_iqr(spark):
    """Tail values must be pulled to the group's exact [p05, p95]
    fences (never dropped — row count is preserved), the in-fence
    values pass through untouched, and a group with IQR=0 (over half
    identical) gets robust_z = 0.0 rather than a division blow-up."""
    from etl_orders_to_bq_spark.operators.quality import winsorize_robust

    # group a: 0..20 plus a huge spike; group b: constant
    rows = [("a", i, float(i)) for i in range(21)] + [("a", 99, 1000.0)]
    rows += [("b", 200 + i, 7.0) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, id long, v double")

    out = {r["id"]: r for r in winsorize_robust(df, "v", "g").collect()}
    assert len(out) == len(rows)  # winsorize clips, never drops

    # exact type-7 percentiles of the 22 values: rank = p * 21
    import statistics

    vals = sorted([float(i) for i in range(21)] + [1000.0])
    q = statistics.quantiles(vals, n=100, method="inclusive")
    p05, q1, med, q3, p95 = q[4], q[24], q[49], q[74], q[94]
    assert out[99]["wins"] == pytest.approx(p95)  # spike pulled down
    assert out[0]["wins"] == pytest.approx(p05)  # low tail pulled up
    assert out[10]["wins"] == 10.0  # in-fence untouched
    assert out[10]["robust_z"] == pytest.approx(
        round((10.0 - med) / (q3 - q1), 6)
    )
    assert all(out[200 + i]["robust_z"] == 0.0 for i in range(5))

    with pytest.raises(ValueError):
        winsorize_robust(df, "v", "g", lower=0.9, upper=0.1)


def test_attribution_first_last_touch_and_unattributed(spark):
    """First/last-touch selection, same-timestamp touch counts toward
    the conversion, and purchases with no prior touch stay (nulls)."""
    from datetime import datetime

    from etl_orders_to_bq_spark.operators.attribution import (
        attribute_conversions,
    )

    t = lambda s: datetime.fromisoformat(f"2024-01-01 {s}")
    rows = [
        # user 1: view, click, purchase, later click, second purchase
        (1, 1, t("09:00:00"), "view"),
        (2, 1, t("09:05:00"), "click"),
        (3, 1, t("09:10:00"), "purchase"),
        (4, 1, t("09:20:00"), "click"),
        (5, 1, t("09:30:00"), "purchase"),
        # user 2: touch EXACTLY at conversion time -> attributable
        (6, 2, t("10:00:00"), "click"),
        (7, 2, t("10:00:00"), "purchase"),
        # user 3: purchase with no touch at all
        (8, 3, t("11:00:00"), "purchase"),
        # user 4: touch AFTER the purchase -> not attributable
        (9, 4, t("12:00:00"), "purchase"),
        (10, 4, t("12:01:00"), "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    ).repartition(4)
    out = {r["conv_id"]: r for r in attribute_conversions(df).collect()}

    assert set(out) == {3, 5, 7, 8, 9}
    assert (out[3]["first_touch_id"], out[3]["last_touch_id"]) == (1, 2)
    # second purchase: first touch unchanged, last touch advances
    assert (out[5]["first_touch_id"], out[5]["last_touch_id"]) == (1, 4)
    assert out[7]["last_touch_id"] == 6  # same-ts touch counts
    assert out[8]["first_touch_id"] is None and out[8]["last_touch_id"] is None
    assert out[9]["first_touch_id"] is None  # later touch doesn't count


def test_merge_intervals_nested_touching_disjoint(spark):
    """Islands must close on the running MAX end (nested intervals
    can't reopen one), touching intervals merge, disjoint don't."""
    from etl_orders_to_bq_spark.operators.temporal import merge_intervals

    rows = [
        # key a: [0,10] contains [2,3]; [10,12] touches; [20,25] is new
        ("a", 0, 10), ("a", 2, 3), ("a", 10, 12), ("a", 20, 25),
        # key b: chain via overlap
        ("b", 1, 5), ("b", 4, 9), ("b", 8, 11),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long").repartition(3)
    got = {
        (r["k"], r["island_start"], r["island_end"]): r["n_merged"]
        for r in merge_intervals(df, "k", "s", "e").collect()
    }
    assert got == {("a", 0, 12): 3, ("a", 20, 25): 1, ("b", 1, 11): 3}


def test_snapshot_diff_roundtrips_through_apply_cdc(spark):
    """snapshot_diff is the inverse of apply_cdc: applying the diff of
    (old, new) onto old must reproduce new exactly — including a
    null-valued update, a delete, and an insert."""
    from etl_orders_to_bq_spark.operators.merge import (
        apply_cdc,
        snapshot_diff,
    )
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id long, name string, bal double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged -> absent from diff
         (2, "b2", 20.0),     # update (name)
         (3, "c", 30.0),      # update (null -> value)
         (5, "e", 50.0)],     # insert; 4 deleted
        "id long, name string, bal double",
    )
    diff = snapshot_diff(old, new, "id")
    ops = {r["id"]: r["op"] for r in diff.collect()}
    assert ops == {2: "U", 3: "U", 4: "D", 5: "I"}

    log = diff.withColumn("seq", F.lit(1))
    rebuilt = apply_cdc(old, log, ["id"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_quarantine_routes_rows_by_failed_rules(spark):
    """violations must list EVERY failed rule in rule order; clean rows
    get an empty array (not null); null predicate results don't flag."""
    from etl_orders_to_bq_spark.operators.quality import quarantine
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -5.0, "ok"), (3, 2e9, "bad"), (4, None, "ok")],
        "id long, amount double, status string",
    )
    out = {
        r["id"]: r["violations"]
        for r in quarantine(
            df,
            {
                "positive": F.col("amount") > 0,
                "capped": F.col("amount") < 1e9,
                "status_ok": F.col("status") == "ok",
            },
        ).collect()
    }
    assert out[1] == []
    assert out[2] == ["positive"]
    assert out[3] == ["capped", "status_ok"]
    # null comparison -> null predicate -> not flagged (three-valued
    # logic; add an explicit isNotNull rule to catch nulls)
    assert out[4] == []


def test_snapshot_diff_null_keys_and_membership_only(spark):
    """A null-keyed new row must surface as I (not D); compare_cols=[]
    must give a pure membership diff with no U rows."""
    from etl_orders_to_bq_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (None, "ghost_old")], "id long, name string"
    )
    new = spark.createDataFrame(
        [(1, "a2"), (None, "ghost_new")], "id long, name string"
    )
    ops = [(r["id"], r["op"], r["name"])
           for r in snapshot_diff(old, new, "id").collect()]
    assert (1, "U", "a2") in ops
    assert (None, "I", "ghost_new") in ops  # null key: insert, not delete
    assert (None, "D", None) in ops         # old ghost leaves as delete

    membership = {(r["id"], r["op"])
                  for r in snapshot_diff(old, new, "id", []).collect()}
    # value change on id=1 is invisible to a membership-only diff
    assert membership == {(None, "I"), (None, "D")}


def test_survivorship_field_level_merge(spark):
    """The survivor must take each FIELD independently: the freshest
    record's nulls never erase an older record's value, and a column
    null in every duplicate stays null."""
    from etl_orders_to_bq_spark.operators.merge import survivorship

    rows = [
        (1, "old@x.com", "Alice", None, 1),
        (1, None, "Alicia", "555", 2),   # fresher, but email null
        (2, None, None, None, 1),        # all-null fields
        (3, "c@x.com", "Carol", "111", 1),
    ]
    df = spark.createDataFrame(
        rows, "id long, email string, name string, phone string, pri int"
    ).repartition(3)
    out = {r["id"]: r for r in survivorship(df, "id", "pri").collect()}

    assert out[1]["email"] == "old@x.com"  # null in pri-2 didn't erase
    assert out[1]["name"] == "Alicia"      # fresher non-null wins
    assert out[1]["phone"] == "555"
    assert out[1]["n_merged"] == 2
    assert out[2]["email"] is None and out[2]["n_merged"] == 1
    assert out[3]["name"] == "Carol"
