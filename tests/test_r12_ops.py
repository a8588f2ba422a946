"""Round-12 operator goldens: chi-square independence + Cramér's V,
Mood's median test, Benford first-digit conformity,
functional-dependency discovery, unigram encode."""

from __future__ import annotations

import pytest


def test_chi2_independence_2x2_golden(spark):
    """Hand-computed 2x2: cells (30,10 / 10,30), N=80 — the classic
    shortcut chi2 = N(ad-bc)^2 / (r1 r2 c1 c2) = 80*640000/2560000
    = 20.0; Cramér's V = sqrt(20/80) = 0.5; dof 1."""
    from etl_orders_to_bq_spark.operators.multitest import (
        chi2_independence,
    )

    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 30
    )
    r = chi2_independence(
        spark.createDataFrame(rows, ["g", "o"]), "g", "o"
    ).collect()[0]
    assert (r.n, r.n_rows, r.n_cols, r.dof) == (80, 2, 2, 1)
    assert r.chi2 == pytest.approx(20.0, abs=1e-6)
    assert r.cramers_v == pytest.approx(0.5, abs=1e-6)


def test_chi2_independence_zero_cell_and_degenerate(spark):
    """A never-observed cell still carries expected mass through the
    marginal cross join; a single-category column yields dof 0 and
    NULL chi2/V."""
    from etl_orders_to_bq_spark.operators.multitest import (
        chi2_independence,
    )

    rows = [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 5
    r = chi2_independence(
        spark.createDataFrame(rows, ["g", "o"]), "g", "o"
    ).collect()[0]
    # 2x2 shortcut: chi2 = N(ad-bc)^2/(r1 r2 c1 c2)
    #             = 15*(5*0-5*5)^2/(10*5*10*5) = 3.75
    assert r.chi2 == pytest.approx(3.75, abs=1e-6)
    const = spark.createDataFrame([("a", "x"), ("a", "y")], ["g", "o"])
    r2 = chi2_independence(const, "g", "o").collect()[0]
    assert r2.dof == 0 and r2.chi2 is None and r2.cramers_v is None


def test_mood_median_perfect_split_golden(spark):
    """Groups 1..10 vs 11..20: pooled lower median = 10 (rank-10
    value), split (0,10 / 10,0), chi2 = 20 exactly; k=2 p via
    z = sqrt(20): two-sided Phi = 7.7e-06 (scipy cross-check)."""
    from etl_orders_to_bq_spark.operators.multitest import (
        mood_median_test,
    )

    rows = [("a", float(v)) for v in range(1, 11)] + [
        ("b", float(v)) for v in range(11, 21)
    ]
    r = mood_median_test(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert (r.n, r.k_groups, r.grand_median, r.n_above) == (
        20, 2, 10.0, 10,
    )
    assert r.chi2 == pytest.approx(20.0, abs=1e-6)
    assert r.df == 1
    assert r.p_value == pytest.approx(7.7e-06, abs=2e-6)
    # constant metric: every value on one side -> NULL chi2/p
    const = [("a", 5.0)] * 3 + [("b", 5.0)] * 3
    r2 = mood_median_test(
        spark.createDataFrame(const, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert r2.chi2 is None and r2.p_value is None


def test_benford_digit_extraction_and_uniform_stats(spark):
    """Digit comes from the decimal STRING: 0.05 -> 5, 123.45 -> 1,
    -23 -> 2, 0/NULL excluded. A uniform 1..9 census has p_obs = 1/9
    each; chi2 and MAD equal the literal-derived constants (computed
    here from the same shared BENFORD_P)."""
    from etl_orders_to_bq_spark.operators.audit import (
        BENFORD_P,
        benford_digits,
    )

    vals = [(0.05,), (123.45,), (-23.0,), (0.0,), (None,)]
    got = {
        r.digit: r.n_obs
        for r in benford_digits(
            spark.createDataFrame(vals, ["v"]), "v"
        ).collect()
    }
    assert got[5] == 1 and got[1] == 1 and got[2] == 1
    assert sum(got.values()) == 3

    uni = [(float(d),) for d in range(1, 10)]
    rows = benford_digits(
        spark.createDataFrame(uni, ["v"]), "v"
    ).collect()
    chi2_ref = 9.0 * sum(
        (1 / 9 - p) ** 2 / p for p in BENFORD_P
    )
    mad_ref = sum(abs(1 / 9 - p) for p in BENFORD_P) / 9
    assert rows[0].chi2 == pytest.approx(chi2_ref, abs=1e-5)
    assert rows[0].mad == pytest.approx(mad_ref, abs=1e-6)
    assert all(r.p_obs == pytest.approx(1 / 9, abs=1e-6) for r in rows)


def test_fd_discovery_key_vs_denormalized(spark):
    """id -> g holds (id is a key); g -> id is violated by the 'a'
    group (2 ids), with the violating-determinant census exact."""
    from etl_orders_to_bq_spark.operators.profile import fd_discovery

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "b", "x")],
        ["id", "g", "c"],
    )
    got = {
        (r.det, r.dep): (
            r.n_distinct_det,
            r.n_distinct_pair,
            r.n_violating_det,
            r.holds,
        )
        for r in fd_discovery(df, ["id", "g", "c"]).collect()
    }
    assert got[("id", "g")] == (3, 3, 0, True)
    assert got[("g", "id")] == (2, 3, 1, False)
    assert got[("g", "c")] == (2, 2, 0, True)
    assert got[("c", "g")] == (1, 2, 1, False)
    assert len(got) == 6


def test_unigram_encode_segments_left_to_right(spark):
    """The trained 'ab' piece segments abab as 'ab ab' (2 pieces,
    left-to-right order after the backtrack reversal); the noise word
    'bandana' mixes trained pieces and char floor."""
    from etl_orders_to_bq_spark.operators.lm import unigram_encode

    docs = [("abab abab ab",), ("banana bandana ab",), ("abab banana",)]
    got = {
        r.word: (r.n_pieces, r.pieces)
        for r in unigram_encode(
            spark.createDataFrame(docs, ["text"]),
            "text",
            seed_size=12,
            vocab_size=8,
            rounds=2,
            max_piece=3,
            max_word=16,
        ).collect()
    }
    assert got["abab"] == (2, "ab ab")
    assert got["ab"] == (1, "ab")
    assert got["banana"] == (2, "b ana") or got["banana"][1].startswith(
        "ban"
    )


def test_lof_flags_planted_outlier(spark):
    """A tight 6-point cluster plus one far point: the far point's
    LOF is far above 1 (its density is a fraction of its neighbors'),
    cluster members sit near 1, and k_dist is on the 6dp grid."""
    from etl_orders_to_bq_spark.operators.ann import lof_scores

    pts = [
        (1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1]),
        (4, [0.1, 0.1]), (5, [0.05, 0.05]), (6, [0.0, 0.05]),
        (99, [5.0, 5.0]),
    ]
    rows = lof_scores(
        spark.createDataFrame(pts, ["vec_id", "embedding"]), k=3
    ).collect()
    byid = {r.vec_id: r for r in rows}
    assert rows[0].vec_id == 99  # ordered lof desc
    assert byid[99].lof > 5.0
    assert all(
        0.5 < byid[i].lof < 2.0 for i in (1, 2, 3, 4, 5, 6)
    )


def test_lof_null_propagates_through_duplicate_neighbors(spark):
    """>= k exact duplicates give each duplicate reach-sum 0, hence
    NULL lrd (infinite density). A point whose kNN include such a
    duplicate must report NULL lof — not a mean silently shrunk by
    skipping the NULL while still dividing by k (advisor r12)."""
    from etl_orders_to_bq_spark.operators.ann import lof_scores

    pts = [
        # k+1 = 4 exact duplicates: each one's kNN are the OTHER three
        # duplicates (dist 0, k_dist 0), so its reach-sum is 0
        (1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 0.0]),
        (4, [0.0, 0.0]),
        (5, [0.1, 0.0]),     # kNN = three of the duplicates
        (6, [5.0, 5.0]), (7, [5.1, 5.0]),
        (8, [5.0, 5.1]), (9, [5.1, 5.1]),
    ]
    byid = {
        r.vec_id: r
        for r in lof_scores(
            spark.createDataFrame(pts, ["vec_id", "embedding"]), k=3
        ).collect()
    }
    # duplicates themselves: reach-sum 0 -> NULL lrd -> NULL lof
    assert all(byid[i].lrd is None and byid[i].lof is None
               for i in (1, 2, 3, 4))
    # point 5 has defined lrd but NULL-lrd neighbors -> NULL lof
    assert byid[5].lrd is not None and byid[5].lof is None
    # the far blob is unaffected and stays near 1
    assert all(byid[i].lof is not None and 0.5 < byid[i].lof < 2.0
               for i in (6, 7, 8, 9))


def test_dbscan_two_blobs_border_and_noise(spark):
    """Two separated blobs cluster under their smallest core id; a
    point within eps of exactly one core (but itself sub-min_pts)
    is border; a far point is noise."""
    from etl_orders_to_bq_spark.operators.ann import dbscan_labels

    pts = [
        (1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1]),
        (10, [5.0, 5.0]), (11, [5.1, 5.0]), (12, [5.0, 5.1]),
        (20, [0.45, 0.0]),   # border: within eps of (2) only
        (99, [9.0, 9.0]),    # noise
    ]
    got = {
        r.vec_id: (r.label, r.role)
        for r in dbscan_labels(
            spark.createDataFrame(pts, ["vec_id", "embedding"]),
            eps=0.4,
            min_pts=3,
        ).collect()
    }
    assert got[1] == (1, "core") and got[2] == (1, "core")
    assert got[3] == (1, "core")
    assert got[10] == (10, "core") and got[11] == (10, "core")
    assert got[12] == (10, "core")
    assert got[20] == (1, "border")
    assert got[99] == (None, "noise")


def test_dbscan_min_pts_one_isolated_point_is_singleton_core(spark):
    """Classic DBSCAN with min_pts=1 makes EVERY point core (it is
    its own neighborhood), so an isolated point is a singleton core
    cluster, never noise (advisor r12 — counts previously came only
    from the eps-pair table, which omits zero-neighbor points)."""
    from etl_orders_to_bq_spark.operators.ann import dbscan_labels

    pts = [
        (1, [0.0, 0.0]), (2, [0.1, 0.0]),
        (99, [9.0, 9.0]),    # no eps-neighbor at all
    ]
    got = {
        r.vec_id: (r.label, r.role)
        for r in dbscan_labels(
            spark.createDataFrame(pts, ["vec_id", "embedding"]),
            eps=0.4,
            min_pts=1,
        ).collect()
    }
    assert got[1] == (1, "core") and got[2] == (1, "core")
    assert got[99] == (99, "core")


def test_jaro_winkler_classic_goldens(spark):
    """Literature values: MARTHA/MARHTA 0.961111, DIXON/DICKSONX
    0.813333 (Winkler 1990 examples); slow/sort stays at its plain
    jaro 2/3 because the prefix boost applies only above the 0.7
    boost threshold; identical strings 1.0; disjoint strings 0.0."""
    from etl_orders_to_bq_spark.operators.fuzzy import jaro_winkler

    pairs = [
        ("martha", "marhta"), ("dixon", "dicksonx"),
        ("slow", "sort"), ("same", "same"), ("abc", "xyz"),
        ("", "abc"),
    ]
    got = {
        (r.a, r.b): r.jw
        for r in spark.createDataFrame(pairs, ["a", "b"])
        .withColumn("jw", jaro_winkler("a", "b"))
        .collect()
    }
    assert got[("martha", "marhta")] == pytest.approx(0.961111, abs=1e-6)
    assert got[("dixon", "dicksonx")] == pytest.approx(0.813333, abs=1e-6)
    assert got[("slow", "sort")] == pytest.approx(2 / 3, abs=1e-6)
    assert got[("same", "same")] == 1.0
    assert got[("abc", "xyz")] == 0.0
    assert got[("", "abc")] == 0.0


def test_shapley_attribution_hand_golden_and_efficiency(spark):
    """Two channels: u1 converts touching {A}, u2 converts touching
    {A,B}, u3 touches {B} without converting, u4 converts untouched.
    v(A)=1, v(B)=0, v(AB)=2 -> phi_A = 0.5*1 + 0.5*(2-0) = 1.5,
    phi_B = 0.5*0 + 0.5*(2-1) = 0.5; efficiency: sum = v(AB) = 2;
    the untouched conversion lands in the unattributable bucket."""
    from etl_orders_to_bq_spark.operators.attribution import (
        shapley_attribution,
    )

    rows = [
        ("u1", "A"), ("u1", "purchase"),
        ("u2", "A"), ("u2", "B"), ("u2", "purchase"),
        ("u3", "B"),
        ("u4", "purchase"),
    ]
    got = {
        r.channel: (r.shapley, r.n_attributable, r.n_unattributable)
        for r in shapley_attribution(
            spark.createDataFrame(rows, ["user_id", "event_type"])
        ).collect()
    }
    assert got["A"] == (1.5, 2, 1)
    assert got["B"] == (0.5, 2, 1)
    assert sum(v[0] for v in got.values()) == 2.0  # efficiency


def test_pps_systematic_hand_golden(spark):
    """Weights (1,1,2), n=2, T=4: centered points at 1 and 3 land in
    unit 1 (covers (0,1]) and unit 3 (covers (2,4]); a unit holding
    more than T/n of the mass is hit multiply (weights (10,1,1),
    n=3: points 2,6,10 all fall in the first unit)."""
    from etl_orders_to_bq_spark.operators.sampling import (
        pps_systematic_sample,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 2.0)], ["id", "w"]
    )
    got = {
        r.id: (r.n_hits, r.pi)
        for r in pps_systematic_sample(df, "id", "w", n=2).collect()
    }
    assert got == {1: (1, 0.5), 3: (1, 1.0)}

    big = spark.createDataFrame(
        [(1, 10.0), (2, 1.0), (3, 1.0)], ["id", "w"]
    )
    got2 = {
        r.id: r.n_hits
        for r in pps_systematic_sample(big, "id", "w", n=3).collect()
    }
    assert got2 == {1: 3}
    # total hits always equal n
    assert sum(got2.values()) == 3


def test_holm_stops_at_first_failure(spark):
    """Step-down property: Holm rejects a PREFIX of the p-ordering —
    once a rank fails alpha/(m-r+1), later (larger) p-values cannot
    be rejected even if they'd pass their own bar. On a fixture with
    one extreme group and several null groups, exactly the extreme
    groups at the head of the ordering reject."""
    from etl_orders_to_bq_spark.operators.multitest import (
        holm_bonferroni,
    )

    rows = (
        [("hot", 1000.0 + i) for i in range(40)]
        + [("a", 10.0 + (i % 3)) for i in range(40)]
        + [("b", 11.0 + (i % 3)) for i in range(40)]
        + [("c", 9.0 + (i % 3)) for i in range(40)]
    )
    res = {
        r[0]: (r.p_rank, r.rejected)
        for r in holm_bonferroni(
            spark.createDataFrame(rows, ["g", "v"]), "g", "v"
        ).collect()
    }
    assert res["hot"][1] is True
    # the rejected set is a prefix of the p_rank order
    ranks_rejected = sorted(
        rank for rank, rej in res.values() if rej
    )
    assert ranks_rejected == list(range(1, len(ranks_rejected) + 1))


def test_jw_length_ratio_bound_tightness(spark):
    """r14 optimization audit: the only lossless length prefilter for
    jw >= 0.7 is s/l >= 0.1 (3J = m/s + m/l + (m-t)/m <= 2 + s/l with
    m <= s, and the Winkler boost is gated on jaro > 0.7, so any
    passing pair needs 2 + s/l >= 2.1). This pins the bound TIGHT on
    the engine: the ratio-exactly-0.1 prefix pair survives the 0.7
    threshold (so any filter stricter than 0.1 is lossy) while the
    just-under-ratio pair falls below it. Documented in
    OPTIMIZATION_r14.md (item closed: the 10x ratio prunes nothing on
    word-shaped vocabularies)."""
    from etl_orders_to_bq_spark.operators.fuzzy import jaro_winkler

    df = spark.createDataFrame(
        [
            ("ab", "ab" + "x" * 18),   # s/l = 0.1 exactly
            ("ab", "ab" + "x" * 19),   # s/l just under 0.1
        ],
        "a string, b string",
    )
    got = {
        r["b"][:2] + str(len(r["b"])): r["jw"]
        for r in df.withColumn("jw", jaro_winkler("a", "b")).collect()
    }
    # jaro((1 + 0.1 + 1)/3) lands one ulp above 0.7 -> boost fires:
    # jw = 0.7 + 0.1*2*(1-0.7) = 0.76 (DuckDB native agrees)
    assert got["ab20"] >= 0.7 and got["ab20"] == 0.76
    assert got["ab21"] < 0.7
