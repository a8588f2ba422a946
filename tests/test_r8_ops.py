"""Round-8 operators: prefix-filter set-similarity join, Matryoshka
two-stage ANN, Theil-Sen robust trend, Holt linear smoothing, MMR
diversity re-ranking."""

import math

import pytest
from pyspark.sql import functions as F


def test_set_similarity_join_finds_only_true_pairs(spark):
    from etl_orders_to_bq_spark.operators.setjoin import (
        set_similarity_join,
    )

    base = " ".join(f"w{i}" for i in range(20))
    near = " ".join(f"w{i}" for i in range(19)) + " zz"
    other = " ".join(f"q{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    out = set_similarity_join(df, threshold=0.5, ngram=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    # bigrams: base has 19, near has 19 (18 shared + 'w18 zz'),
    # intersection 18, union 20
    assert r["jaccard"] == round(18 / 20, 6)


def test_set_similarity_join_prefix_filter_is_complete(spark):
    """Prefix-filtered result == brute-force Jaccard over ALL pairs —
    the lossless claim, checked on a fixture where many docs share
    common tokens (so prefixes genuinely prune)."""
    from etl_orders_to_bq_spark.operators.setjoin import (
        set_similarity_join,
    )

    rows = []
    for d in range(12):
        toks = [f"common{i}" for i in range(6)] + [
            f"rare{d}_{i}" for i in range(d % 4)
        ]
        rows.append((d, " ".join(toks)))
    # two planted near-dups of doc 0
    rows.append((100, rows[0][1]))
    rows.append((101, rows[0][1] + " extraword"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.6
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_similarity_join(df, threshold=t, ngram=2).collect()
    }

    # brute force in python
    import itertools

    def bigrams(s):
        w = s.split()
        return {f"{a} {b}" for a, b in zip(w, w[1:])}

    sets = {d: bigrams(s) for d, s in rows}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        j = round(len(sa & sb) / len(sa | sb), 6)
        if j >= t:
            want[(a, b)] = j
    assert got == want
    assert (0, 100) in got  # exact dup present


def test_set_similarity_join_strategies_agree(spark):
    """prefix / count / auto produce the identical pair set — the
    two physical plans implement one logical operator."""
    from etl_orders_to_bq_spark.operators.setjoin import (
        set_similarity_join,
    )

    rows = [
        (d, " ".join(f"w{(d * 7 + i) % 25}" for i in range(15)))
        for d in range(20)
    ]
    rows.append((99, rows[4][1]))  # planted exact dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = {}
    for strat in ("prefix", "count", "auto"):
        res[strat] = sorted(
            tuple(r)
            for r in set_similarity_join(
                df, threshold=0.5, ngram=2, strategy=strat
            ).collect()
        )
    assert res["prefix"] == res["count"] == res["auto"]
    assert any(p[:2] == (4, 99) for p in res["count"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="strategy"):
        set_similarity_join(df, strategy="bogus")


def test_ann_matryoshka_matches_bruteforce_at_full_recall(spark):
    from etl_orders_to_bq_spark.operators.ann import (
        ann_topk_bruteforce,
        ann_topk_matryoshka,
    )

    rows = [
        (i, [math.sin(0.1 * i * (j + 1)) for j in range(32)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[7][1]
    brute = [
        (r["vec_id"], r["cos_sim"])
        for r in ann_topk_bruteforce(df, q, k=5).collect()
    ]
    # coarse_m = n -> stage 1 keeps everything -> exact recovery
    full = [
        (r["vec_id"], r["cos_sim"])
        for r in ann_topk_matryoshka(
            df, q, k=5, coarse_dim=8, coarse_m=60
        ).collect()
    ]
    assert full == brute
    # tiny coarse_m: result is still deterministic top-k OF THE
    # SURVIVORS (two-stage definition), k rows, sorted by cos desc
    small = ann_topk_matryoshka(df, q, k=5, coarse_dim=8, coarse_m=5).collect()
    assert len(small) == 5
    sims = [r["cos_sim"] for r in small]
    assert sims == sorted(sims, reverse=True)
    with pytest.raises(ValueError, match="coarse_dim"):
        ann_topk_matryoshka(df, q, coarse_dim=64)


def test_theilsen_trend_robust_to_outlier(spark):
    from etl_orders_to_bq_spark.operators.timeseries import theilsen_trend

    # y = 3t except one wild outlier; OLS would bend, Theil-Sen holds
    pts = [("a", float(t), 3.0 * t) for t in range(10)]
    pts[5] = ("a", 5.0, 500.0)
    df = spark.createDataFrame(pts, "g string, t double, y double")
    r = theilsen_trend(df, "g", "t", "y").collect()[0]
    assert r["n_points"] == 10
    assert r["n_pairs"] == 45
    assert r["ts_slope"] == 3.0


def test_theilsen_trend_even_pair_count_averages_middles(spark):
    from etl_orders_to_bq_spark.operators.timeseries import theilsen_trend

    # 4 points -> 6 slopes (even): median = mean of 3rd and 4th
    pts = [("a", 0.0, 0.0), ("a", 1.0, 1.0), ("a", 2.0, 4.0),
           ("a", 3.0, 9.0)]
    df = spark.createDataFrame(pts, "g string, t double, y double")
    slopes = sorted(
        round((y2 - y1) / (t2 - t1), 6)
        for i, (_, t1, y1) in enumerate(pts)
        for (_, t2, y2) in pts[i + 1:]
    )
    want = round((slopes[2] + slopes[3]) / 2, 6)
    r = theilsen_trend(df, "g", "t", "y").collect()[0]
    assert r["n_pairs"] == 6
    assert r["ts_slope"] == want
    # single-point group: NULL slope, not a crash
    df1 = spark.createDataFrame(
        [("b", 0.0, 1.0)], "g string, t double, y double"
    )
    r1 = theilsen_trend(df1, "g", "t", "y").collect()[0]
    assert r1["n_points"] == 1 and r1["ts_slope"] is None


def test_holt_linear_matches_integer_reference(spark):
    from etl_orders_to_bq_spark.operators.timeseries import holt_linear

    ys = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0]
    df = spark.createDataFrame(
        [("a", float(t), y) for t, y in enumerate(ys)],
        "g string, t double, y double",
    )
    # reference: exact micro-unit recurrence, alpha=1/2 beta=3/10
    mu = [round(y * 1_000_000) for y in ys]
    l, b = mu[0], mu[1] - mu[0]
    for y in mu[1:]:
        l_new = math.floor((1 * y + 1 * (l + b)) / 2.0)
        b = math.floor((3 * (l_new - l) + 7 * b) / 10.0)
        l = l_new
    r = holt_linear(df, "g", "t", "y", horizon=2).collect()[0]
    assert r["n_points"] == 6
    assert r["level"] == l / 1e6
    assert r["trend"] == b / 1e6
    assert r["forecast"] == (l + 2 * b) / 1e6
    # n = 1 -> NULLs
    d1 = spark.createDataFrame(
        [("b", 0.0, 5.0)], "g string, t double, y double"
    )
    r1 = holt_linear(d1, "g", "t", "y").collect()[0]
    assert r1["level"] is None and r1["forecast"] is None
    with pytest.raises(ValueError, match="denominator"):
        holt_linear(df, "g", "t", "y", alpha=0.123456789)


def test_mmr_rerank_prefers_diversity(spark):
    from etl_orders_to_bq_spark.operators.fusion import mmr_rerank

    # candidates: 10/11 nearly identical high-relevance, 12 distinct
    # mid-relevance. Plain top-2 by rel = {10, 11}; MMR at lambda 0.5
    # must pick the distinct one second.
    rows = [
        (0, 10, [1.0, 0.0, 0.0], 0.99),
        (0, 11, [0.999, 0.01, 0.0], 0.98),
        (0, 12, [0.0, 1.0, 0.0], 0.70),
    ]
    df = spark.createDataFrame(
        rows,
        "query_id long, vec_id long, embedding array<double>, rel double",
    )
    out = sorted(
        mmr_rerank(df, k=3, lam=0.5).collect(), key=lambda r: r["rank"]
    )
    assert [r["vec_id"] for r in out] == [10, 12, 11]
    assert out[0]["mmr_score"] == round(0.5 * 0.99, 6)
    # rank-2 score: lam*rel - (1-lam)*cos(12, 10) = 0.5*0.7 - 0.5*0.0
    assert out[1]["mmr_score"] == round(0.5 * 0.70, 6)


def test_mmr_rerank_k_exceeds_pool(spark):
    from etl_orders_to_bq_spark.operators.fusion import mmr_rerank

    rows = [(0, 1, [1.0, 0.0], 0.9), (0, 2, [0.0, 1.0], 0.8)]
    df = spark.createDataFrame(
        rows,
        "query_id long, vec_id long, embedding array<double>, rel double",
    )
    out = mmr_rerank(df, k=5, lam=0.7).collect()
    assert len(out) == 2  # truncates at pool size, no crash


def test_msprt_is_conservative_under_null_and_fires_on_effect(spark):
    from etl_orders_to_bq_spark.operators.experiment import msprt_test

    rows = []
    for i in range(400):
        rows.append(("a", 10.0 + (i % 7)))
        rows.append(("b", 10.0 + ((i + 3) % 7)))   # same distribution
        rows.append(("c", 25.0 + (i % 7)))         # big shift
    df = spark.createDataFrame(rows, "g string, value double")
    null = msprt_test(df, "g", "value", "a", "b").collect()[0]
    assert null["p_always_valid"] > 0.5
    assert null["reject"] is False
    eff = msprt_test(df, "g", "value", "a", "c").collect()[0]
    assert eff["p_always_valid"] < 0.05
    assert eff["reject"] is True
    # constant metric: V = 0 -> NULL p, never a confident number
    const = spark.createDataFrame(
        [("a", 5.0)] * 10 + [("b", 5.0)] * 10, "g string, value double"
    )
    deg = msprt_test(const, "g", "value", "a", "b").collect()[0]
    assert deg["p_always_valid"] is None and deg["reject"] is None


def test_msprt_subgrid_variance_still_scores(spark):
    """V below the 6dp grid (large-n / tiny-variance regime) must
    still produce a p-value — the exponent uses UNROUNDED V (review
    finding r8: rounding V to 6dp NULLed decisively powered tests)."""
    from etl_orders_to_bq_spark.operators.experiment import msprt_test

    # values live on the operator's decimal(18,2) cent grid; the
    # +-0.005 wiggle gives per-arm var 2.5e-5, so V = var*2/n ~ 2.5e-7
    # — below the 6dp display grid
    rows = []
    for i in range(400):
        rows.append(("a", 10.0 + (i % 2) * 0.01))
        rows.append(("b", 10.5 + (i % 2) * 0.01))  # clear shift
    df = spark.createDataFrame(rows, "g string, value double")
    r = msprt_test(df, "g", "value", "a", "b").collect()[0]
    assert r["v_n"] == 0.0          # display column rounds to grid
    assert r["p_always_valid"] is not None
    assert r["p_always_valid"] < 0.05 and r["reject"] is True


def test_twap_ignores_null_values(spark):
    """NULL-value observations carry no price: they must not hold an
    interval (review finding r8: a NULL tied on ts also orders
    differently across engines)."""
    from etl_orders_to_bq_spark.operators.timeseries import twap

    rows = [
        ("x", "2024-03-01 00:00:00", None),
        ("x", "2024-03-01 00:00:00", 100.0),
        ("x", "2024-03-01 12:00:00", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "g string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = twap(df, "g", "ts", "value").collect()[0]
    assert r["n_events"] == 2
    assert r["twap"] == 50.0


def test_twap_weights_by_holding_time(spark):
    from etl_orders_to_bq_spark.operators.timeseries import twap

    # value 100 holds 6h, value 0 holds the remaining 18h:
    # twap = (100*21600 + 0*64800) / 86400 = 25.0
    rows = [
        ("x", "2024-03-01 00:00:00", 100.0),
        ("x", "2024-03-01 06:00:00", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "g string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = twap(df, "g", "ts", "value").collect()[0]
    assert r["n_events"] == 2
    assert r["twap"] == 25.0
    # plain avg would say 50.0 — the whole point
    assert r["twap"] != 50.0


def test_dispersion_index_poisson_vs_bursty(spark):
    from etl_orders_to_bq_spark.operators.timeseries import (
        dispersion_index,
    )

    rows = []
    for d in range(1, 11):
        for _ in range(5):  # metronomic: 5/day, var 0
            rows.append(("steady", f"2024-01-{d:02d} 12:00:00"))
        n = 46 if d == 1 else 1  # bursty: one huge day
        for _ in range(n):
            rows.append(("bursty", f"2024-01-{d:02d} 12:00:00"))
    df = spark.createDataFrame(rows, "g string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {r["g"]: r for r in dispersion_index(df, "g", "ts").collect()}
    assert out["steady"]["fano"] == 0.0
    assert out["steady"]["overdispersed"] is False
    assert out["bursty"]["fano"] > 10
    assert out["bursty"]["overdispersed"] is True
    assert out["bursty"]["n_days"] == 10


def test_rarity_weighted_jaccard_upranks_rare_overlap(spark):
    from etl_orders_to_bq_spark.operators.setjoin import (
        rarity_weighted_jaccard,
    )

    # docs 1/2 share only a RARE token; docs 1/3 share only a COMMON
    # token (present in every doc). Weighted similarity must rank
    # (1,2) far above (1,3); unweighted Jaccard would tie them.
    rows = [
        (1, "common rareAB fill1a fill1b"),
        (2, "common rareAB fill2a fill2b"),
        (3, "common other3 fill3a fill3b"),
        (4, "common other4 fill4a fill4b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r["w_jaccard"]
        for r in rarity_weighted_jaccard(
            df, threshold=0.0001, ngram=1
        ).collect()
    }
    assert out[(1, 2)] > 3 * out[(1, 3)]


def test_norm_sf_clamps_beyond_taylor_region(spark):
    """z > 8: true tail rounds to 0 at 6dp anyway, and past ~11.3 the
    Taylor kernel diverges — the clamp returns exact 0.0 instead of
    garbage (and the oracle SQL replays the same cliff)."""
    import duckdb

    from etl_orders_to_bq_spark.operators.multitest import (
        norm_sf,
        norm_sf_sql,
    )

    zs = [7.9, 8.5, 20.0, 40.0]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {
        r["z"]: r["sf"]
        for r in df.select("z", norm_sf(F.col("z")).alias("sf")).collect()
    }
    assert got[8.5] == 0.0 and got[20.0] == 0.0 and got[40.0] == 0.0
    assert 0 < got[7.9] < 1e-14
    con = duckdb.connect()
    for z in zs:
        sql_val = con.execute(
            f"select {norm_sf_sql(repr(z))}"
        ).fetchone()[0]
        assert abs(sql_val - got[z]) < 1e-18, z


def test_window_funnel_depth_and_window(spark):
    from etl_orders_to_bq_spark.operators.seqmine import window_funnel

    rows = [
        # u1: full chain inside the window -> 3
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:00:10", "click"),
        (1, "2024-01-01 00:00:20", "purchase"),
        # u2: click arrives past the window from its view -> 1
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 00:02:00", "click"),
        # u3: a LATER view restarts the chain; click then fits -> 2
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-01 00:01:20", "view"),
        (3, "2024-01-01 00:01:40", "click"),
        # u4: purchase with no prior chain -> 0 (events counted, no level)
        (4, "2024-01-01 00:00:00", "purchase"),
        # u5: out-of-order steps (click before view) -> 1 (view only)
        (5, "2024-01-01 00:00:00", "click"),
        (5, "2024-01-01 00:00:10", "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["user_id"]: r
        for r in window_funnel(
            df, "user_id", "ts", "event_type",
            ["view", "click", "purchase"], window_seconds=60,
        ).collect()
    }
    assert out[1]["funnel_level"] == 3
    assert out[2]["funnel_level"] == 1
    assert out[3]["funnel_level"] == 2
    assert out[4]["funnel_level"] == 0 and out[4]["n_step_events"] == 1
    assert out[5]["funnel_level"] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distinct"):
        window_funnel(df, "user_id", "ts", "event_type", ["a", "a"], 60)


def test_holt_winters_seasonal_matches_integer_reference(spark):
    from etl_orders_to_bq_spark.operators.timeseries import (
        holt_winters_seasonal,
    )

    m = 3
    # trend + additive period-3 season + deterministic wiggle
    ys = [10 + 0.5 * t + [3, -1, -2][t % m] + (t % 2) * 0.25
          for t in range(9)]
    rows = [("a", float(t), ys[t], t % m) for t in range(9)]
    df = spark.createDataFrame(
        rows, "g string, t double, y double, j int"
    )
    # python reference: exact micro recurrence, a=1/2 B=G=3/10
    mu = [round(y * 1_000_000) for y in ys]
    l = math.floor(sum(mu[:m]) / float(m))
    b = math.floor((sum(mu[m:2 * m]) - sum(mu[:m])) / float(m * m))
    s = [0] * m
    for t in range(m):
        s[t % m] = mu[t] - l
    for t in range(m, 9):
        j = t % m
        l_new = math.floor((1 * (mu[t] - s[j]) + 1 * (l + b)) / 2.0)
        b = math.floor((3 * (l_new - l) + 7 * b) / 10.0)
        s[j] = math.floor((3 * (mu[t] - l_new) + 7 * s[j]) / 10.0)
        l = l_new
    nxt = (8 % m + 1) % m
    r = holt_winters_seasonal(
        df, "g", "t", "y", "j", m=m, alpha=0.5, beta=0.3, gamma=0.3
    ).collect()[0]
    assert r["n_points"] == 9
    assert r["level"] == l / 1e6
    assert r["trend"] == b / 1e6
    assert r["forecast"] == (l + b + s[nxt]) / 1e6
    # short series (< 2m): NULLs, not garbage
    short = spark.createDataFrame(
        rows[:4], "g string, t double, y double, j int"
    )
    r0 = holt_winters_seasonal(
        short, "g", "t", "y", "j", m=m
    ).collect()[0]
    assert r0["level"] is None and r0["forecast"] is None


def test_changepoint_level_finds_planted_shift(spark):
    from etl_orders_to_bq_spark.operators.timeseries import (
        changepoint_level,
    )

    # level 10 for 12 points, then 25 for 8 — cp at k=12
    ys = [10.0] * 12 + [25.0] * 8
    df = spark.createDataFrame(
        [("a", float(t), y) for t, y in enumerate(ys)],
        "g string, t double, y double",
    )
    r = changepoint_level(df, "g", "t", "y").collect()[0]
    assert r["cp_k"] == 12
    assert r["cp_t"] == 11.0  # last point of the left segment
    assert r["left_mean"] == 10.0
    assert r["right_mean"] == 25.0
    assert r["shift"] == 15.0
    # constant series: SOME k is reported (d = 0 everywhere, ties to
    # k=1) with zero shift — not a crash, not a false level
    const = spark.createDataFrame(
        [("b", float(t), 5.0) for t in range(6)],
        "g string, t double, y double",
    )
    rc = changepoint_level(const, "g", "t", "y").collect()[0]
    assert rc["cp_k"] == 1 and rc["shift"] == 0.0
    # single point: NULLs
    one = spark.createDataFrame(
        [("c", 0.0, 3.0)], "g string, t double, y double"
    )
    ro = changepoint_level(one, "g", "t", "y").collect()[0]
    assert ro["cp_k"] is None and ro["shift"] is None


def test_gini_stump_finds_separating_threshold(spark):
    from etl_orders_to_bq_spark.operators.classifier import gini_stump

    # feature < 10 -> label 0, feature >= 10 -> label 1 (perfectly
    # separable): the best cut is the largest left-side value 9.0
    # with gain == parent gini
    rows = [(float(v), 0) for v in range(10)] + [
        (float(v), 1) for v in range(10, 25)
    ]
    df = spark.createDataFrame(rows, "f double, y int")
    r = gini_stump(df, "f", "y").collect()[0]
    assert r["threshold"] == 9.0
    assert r["n_left"] == 10 and r["n_right"] == 15
    assert r["pos_left"] == 0 and r["pos_right"] == 15
    # parent gini = 1 - (15/25)^2 - (10/25)^2 = 0.48; perfect split
    # leaves zero child impurity -> gain == parent
    assert r["parent_gini"] == 0.48
    assert r["gain"] == 0.48
    # constant feature: no valid cut -> NULLs
    const = spark.createDataFrame(
        [(1.0, 0), (1.0, 1)], "f double, y int"
    )
    rc = gini_stump(const, "f", "y").collect()[0]
    assert rc["threshold"] is None and rc["gain"] is None
