"""Round-13 operator goldens: agreement coefficients, dependence-robust
FDR, heteroscedastic/ordered rank tests, trend test, ROUGE/JSD eval
scores, SAX symbolization, Mahalanobis outliers.

Reference values come from the public literature (Fleiss 1971 worked
example, scipy's brunnermunzel docstring example, Lin 2004 clipped
counting) or from an independent brute-force implementation in the
test body.
"""

from __future__ import annotations

import math

import pytest


def test_brunner_munzel_scipy_docstring_example(spark):
    """scipy.stats.brunnermunzel's documented example: W must match
    the published statistic to 6dp; the normal-approximation p is the
    engine's documented choice (scipy defaults to the t
    approximation, so only W is cross-checked)."""
    from etl_orders_to_bq_spark.operators.multitest import brunner_munzel

    x1 = [1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1]
    x2 = [3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4]
    rows = [("a", float(v)) for v in x1] + [("b", float(v)) for v in x2]
    got = brunner_munzel(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b"
    ).collect()[0]
    assert got.n_a == 14 and got.n_b == 11
    assert got.w_stat == pytest.approx(3.137467, abs=1e-6)
    assert 0 < got.p_value < 0.01


def test_brunner_munzel_degenerate_constant_arms(spark):
    """Both arms constant at the same value: variance is 0, W/p NULL,
    counts still real."""
    from etl_orders_to_bq_spark.operators.multitest import brunner_munzel

    rows = [("a", 5.0)] * 4 + [("b", 5.0)] * 3
    got = brunner_munzel(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b"
    ).collect()[0]
    assert got.n_a == 4 and got.n_b == 3
    assert got.w_stat is None and got.p_value is None


def test_jonckheere_matches_brute_force(spark):
    """Doubled JT and the tie-corrected z against an exhaustive
    pairwise count on a small 3-group fixture with ties across and
    within groups."""
    import itertools
    from collections import Counter

    from etl_orders_to_bq_spark.operators.multitest import (
        jonckheere_terpstra,
    )

    data = {
        "g1": [19, 20, 60, 130, 21],
        "g2": [21, 61, 80, 129],
        "g3": [40, 99, 100, 149, 130, 61],
    }
    rows = [(g, float(v)) for g, vs in data.items() for v in vs]
    got = jonckheere_terpstra(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    names = sorted(data)
    jt2 = sum(
        2 * (x < y) + (x == y)
        for i, j in itertools.combinations(range(3), 2)
        for x in data[names[i]]
        for y in data[names[j]]
    )
    n = sum(len(v) for v in data.values())
    ns = [len(data[g]) for g in names]
    tie = Counter(v for vs in data.values() for v in vs)
    e2 = (n * n - sum(k * k for k in ns)) / 2
    t2 = sum(t * (t - 1) * (2 * t + 5) for t in tie.values())
    g2 = sum(k * (k - 1) * (2 * k + 5) for k in ns)
    t3 = sum(t * (t - 1) * (t - 2) for t in tie.values())
    g3 = sum(k * (k - 1) * (k - 2) for k in ns)
    t1 = sum(t * (t - 1) for t in tie.values())
    g1 = sum(k * (k - 1) for k in ns)
    var = (
        (n * (n - 1) * (2 * n + 5) - g2 - t2) / 72
        + g3 * t3 / (36 * n * (n - 1) * (n - 2))
        + g1 * t1 / (8 * n * (n - 1))
    )
    assert got.jt2 == jt2 and got.n == n and got.n_groups == 3
    assert got.z == pytest.approx((jt2 - e2) / (2 * math.sqrt(var)),
                                  abs=1e-6)


def test_cochran_armitage_hand_example(spark):
    """Three doses with rising success rates 2/10, 5/10, 8/10: z
    matches the textbook closed form and p the two-sided normal."""
    from etl_orders_to_bq_spark.operators.multitest import cochran_armitage

    rows = []
    for w, r, n in [(0, 2, 10), (1, 5, 10), (2, 8, 10)]:
        rows += [(w, 1)] * r + [(w, 0)] * (n - r)
    got = cochran_armitage(
        spark.createDataFrame(rows, ["score", "y"]), "score", "y"
    ).collect()[0]
    assert got.n == 30 and got.n_success == 15
    assert got.z == pytest.approx(2.683282, abs=1e-6)
    assert got.p_value == pytest.approx(0.00729, abs=1e-6)


def test_benjamini_yekutieli_stricter_than_bh(spark):
    """BY divides the BH threshold by the harmonic number, so its
    rejection set is a subset of BH's on identical data, and the
    shared columns (p_value, p_rank) agree row-for-row; a Python
    replay of the BY step-up on the engine's own p-values pins the
    rejected flags exactly."""
    from etl_orders_to_bq_spark.operators.multitest import (
        benjamini_yekutieli,
        fdr_bh,
    )

    rows = []
    for g, mu in [("a", 0.0), ("b", 4.0), ("c", 0.4), ("d", 3.0),
                  ("e", 0.1)]:
        rows += [(g, mu + (i % 5) * 0.5) for i in range(40)]
    df = spark.createDataFrame(rows, ["g", "v"])
    by = {r.g: r for r in benjamini_yekutieli(df, "g", "v", q=0.2).collect()}
    bh = {r.g: r for r in fdr_bh(df, "g", "v", q=0.2).collect()}
    assert all(by[g].p_value == bh[g].p_value for g in by)
    assert all(by[g].p_rank == bh[g].p_rank for g in by)
    assert all(bh[g].rejected or not by[g].rejected for g in by)
    m = len(by)
    cm = sum(1.0 / i for i in range(1, m + 1))
    ps = sorted((r.p_rank, r.p_value, r.g) for r in by.values())
    rstar = max(
        (rk for rk, p, _ in ps if p is not None
         and p <= rk / (m * cm) * 0.2),
        default=0,
    )
    for rk, _, g in ps:
        assert by[g].rejected == (rk <= rstar)


def test_fleiss_kappa_1971_worked_example(spark):
    """The canonical 10-item / 14-rater / 5-category table: kappa
    0.2099 (published 0.210), po 0.378, pe 0.213."""
    from etl_orders_to_bq_spark.operators.classifier import fleiss_kappa

    table = [
        [0, 0, 0, 0, 14], [0, 2, 6, 4, 2], [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0], [2, 2, 8, 1, 1], [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0], [2, 5, 3, 2, 2], [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7],
    ]
    rows = [
        (i, str(c))
        for i, cnts in enumerate(table)
        for c, k in enumerate(cnts)
        for _ in range(k)
    ]
    got = fleiss_kappa(
        spark.createDataFrame(rows, ["item", "cat"]), "item", "cat"
    ).collect()[0]
    assert got.n_items == 10 and got.n_raters == 14
    assert got.po == pytest.approx(0.378022, abs=1e-6)
    assert got.pe == pytest.approx(0.212755, abs=1e-6)
    assert got.kappa == pytest.approx(0.209931, abs=1e-6)


def test_fleiss_kappa_rejects_varying_rater_counts(spark):
    from etl_orders_to_bq_spark.operators.classifier import fleiss_kappa

    rows = [(1, "a"), (1, "b"), (2, "a")]
    with pytest.raises(ValueError, match="SAME rater count"):
        fleiss_kappa(
            spark.createDataFrame(rows, ["item", "cat"]), "item", "cat"
        ).collect()


def test_krippendorff_alpha_matches_brute_force(spark):
    """Nominal alpha with varying raters (1..4 per unit; the m=1 unit
    drops as unpairable) against an independent implementation of the
    canonical formula."""
    from collections import Counter

    from etl_orders_to_bq_spark.operators.classifier import (
        krippendorff_alpha,
    )

    units = {
        1: ["a", "a", "a"], 2: ["a", "b"], 3: ["b", "b", "b", "b"],
        4: ["a", "b", "b"], 5: ["b"], 6: ["a", "a"],
    }
    rows = [(u, c) for u, cs in units.items() for c in cs]
    got = krippendorff_alpha(
        spark.createDataFrame(rows, ["item", "cat"]), "item", "cat"
    ).collect()[0]
    pu = {u: cs for u, cs in units.items() if len(cs) >= 2}
    n = sum(len(cs) for cs in pu.values())
    marg = Counter(c for cs in pu.values() for c in cs)
    od = sum(
        (len(cs) ** 2 - sum(v * v for v in Counter(cs).values()))
        / (len(cs) - 1)
        for cs in pu.values()
    )
    alpha = 1 - (n - 1) * od / (n * n - sum(v * v for v in marg.values()))
    assert got.n_units == 5 and got.n_pairable == n
    assert got.alpha == pytest.approx(alpha, abs=1e-6)


def test_rouge2_clipped_counting_golden(spark):
    """Lin 2004 clipped counting on the classic cat-sat/cat-is pair:
    3 shared bigrams over 5 each -> p = r = f1 = 0.6; an empty
    candidate yields NULL ratios."""
    from etl_orders_to_bq_spark.operators.lm import rouge_n

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "the cat is on the mat"),
            (2, "", "the cat is on the mat"),
        ],
        ["id", "cand", "ref"],
    )
    got = {r.id: r for r in rouge_n(df, "id", "cand", "ref", n=2).collect()}
    assert got[1].clip == 3 and got[1].n_cand == 5 and got[1].n_ref == 5
    assert got[1].precision == got[1].recall == got[1].f1 == 0.6
    assert got[2].n_cand == 0 and got[2].precision is None
    assert got[2].f1 is None


def test_jensen_shannon_hand_computed(spark):
    """Two 4-token sources over a 5-word union vocabulary: JSD matches
    the hand-evaluated smoothed log2 sum; identical sources give
    0.0."""
    from etl_orders_to_bq_spark.operators.lm import (
        jensen_shannon_divergence,
    )

    df = spark.createDataFrame(
        [("a", "x y z x"), ("b", "x q q r")], ["src", "text"]
    )
    got = jensen_shannon_divergence(
        df, "src", "text", "a", "b"
    ).collect()[0]
    assert got.n_tokens_a == 4 and got.n_tokens_b == 4
    assert got.jsd == pytest.approx(0.09086, abs=1e-5)
    same = spark.createDataFrame(
        [("a", "x y"), ("b", "x y")], ["src", "text"]
    )
    assert jensen_shannon_divergence(
        same, "src", "text", "a", "b"
    ).collect()[0].jsd == 0.0


def test_sax_ramp_and_constant_series(spark):
    """A 16-point ramp maps to 'abcd' at 4 segments / alphabet 4; a
    constant series z-degenerates to the all-'b' word (z = 0 on the
    <= 0 breakpoint)."""
    from etl_orders_to_bq_spark.operators.timeseries import sax_symbolize

    rows = [("s1", t, float(t)) for t in range(16)] + [
        ("s2", t, 5.0) for t in range(8)
    ]
    got = {
        r[0]: (r.n_segments_out, r.word)
        for r in sax_symbolize(
            spark.createDataFrame(rows, ["s", "t", "v"]),
            "s", "t", "v", n_segments=4, alphabet=4,
        ).collect()
    }
    assert got["s1"] == (4, "abcd")
    assert got["s2"] == (4, "bbbb")


def test_mahalanobis_matches_numpy_inverse_covariance(spark):
    """Every d2 equals the numpy inv-covariance quadratic form; the
    planted anti-correlation point dominates."""
    import numpy as np

    from etl_orders_to_bq_spark.operators.quality import (
        mahalanobis_outliers_2d,
    )

    pts = [
        (i, float(i % 10), float((i % 10) * 2 + (i % 3)))
        for i in range(30)
    ] + [(99, 2.0, 18.0)]
    got = {
        r[0]: r.d2
        for r in mahalanobis_outliers_2d(
            spark.createDataFrame(pts, ["id", "x", "y"]),
            "id", "x", "y", threshold=0.0,
        ).collect()
    }
    X = np.array([[p[1], p[2]] for p in pts])
    mu = X.mean(axis=0)
    ci = np.linalg.inv(np.cov(X.T))
    for i, p in enumerate(pts):
        want = float((X[i] - mu) @ ci @ (X[i] - mu))
        assert got[p[0]] == pytest.approx(want, abs=1e-4)
    assert max(got, key=got.get) == 99


def test_page_trend_perfect_ascending_blocks(spark):
    """Four complete blocks with a perfect ascending treatment trend:
    L = sum j*R_j = 56 (doubled 112), z = sqrt(8) under the classic
    no-tie moments."""
    from etl_orders_to_bq_spark.operators.multitest import page_trend

    rows = [
        (f"b{b}", t, float(j * 10 + b))
        for b in range(4)
        for j, t in enumerate(["t1", "t2", "t3"])
    ]
    got = page_trend(
        spark.createDataFrame(rows, ["blk", "trt", "v"]),
        "blk", "trt", "v",
    ).collect()[0]
    assert got.n_blocks == 4 and got.n_complete == 4
    assert got.k_treatments == 3 and got.l2 == 112
    assert got.z == pytest.approx(math.sqrt(8), abs=1e-6)


def test_brown_forsythe_matches_brute_force_median_centering(spark):
    """W against an independent numpy implementation (median-centered
    Levene) on three 10-point groups; the 9e-6 slack is the
    documented 6dp intermediate rounding of SSB/SSW (the anova
    discipline)."""
    import numpy as np

    from etl_orders_to_bq_spark.operators.multitest import (
        brown_forsythe_levene,
    )

    g1 = [8.88, 9.12, 9.04, 8.98, 9.00, 9.08, 9.01, 8.85, 9.06, 8.99]
    g2 = [8.88, 8.95, 9.29, 9.44, 9.15, 9.58, 8.36, 9.18, 8.67, 9.05]
    g3 = [8.95, 9.12, 8.95, 8.85, 9.03, 8.84, 9.07, 8.98, 8.86, 8.98]
    rows = (
        [("a", v) for v in g1]
        + [("b", v) for v in g2]
        + [("c", v) for v in g3]
    )
    got = brown_forsythe_levene(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    Z = [np.abs(np.array(g) - np.median(g)) for g in (g1, g2, g3)]
    allz = np.concatenate(Z)
    N, k = len(allz), 3
    num = sum(len(z) * (z.mean() - allz.mean()) ** 2 for z in Z) / (k - 1)
    den = sum(((z - z.mean()) ** 2).sum() for z in Z) / (N - k)
    assert got.k_groups == 3 and got.n == 30
    assert got.w_stat == pytest.approx(num / den, abs=1e-4)


def test_bartlett_matches_brute_force(spark):
    import numpy as np

    from etl_orders_to_bq_spark.operators.multitest import bartlett_test

    g1 = [8.88, 9.12, 9.04, 8.98, 9.00, 9.08, 9.01, 8.85, 9.06, 8.99]
    g2 = [8.88, 8.95, 9.29, 9.44, 9.15, 9.58, 8.36, 9.18, 8.67, 9.05]
    g3 = [8.95, 9.12, 8.95, 8.85, 9.03, 8.84, 9.07, 8.98, 8.86, 8.98]
    rows = (
        [("a", v) for v in g1]
        + [("b", v) for v in g2]
        + [("c", v) for v in g3]
    )
    got = bartlett_test(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    groups = [g1, g2, g3]
    k, N = 3, 30
    s2 = [np.var(g, ddof=1) for g in groups]
    sp2 = sum((len(g) - 1) * v for g, v in zip(groups, s2)) / (N - k)
    T = (N - k) * math.log(sp2) - sum(
        (len(g) - 1) * math.log(v) for g, v in zip(groups, s2)
    )
    C = 1 + (sum(1 / (len(g) - 1) for g in groups) - 1 / (N - k)) / (
        3 * (k - 1)
    )
    assert got.t_stat == pytest.approx(T / C, abs=1e-5)


def test_sax_mindist_lower_bound_and_adjacency(spark):
    """Ramp ('abcd') vs constant ('bbbb'): only the d/b cell is
    non-adjacent, so MINDIST = sqrt(min(n)/w) * (bp_2 - bp_1); the
    lower-bound property holds against the true z-euclidean."""
    from etl_orders_to_bq_spark.operators.timeseries import sax_mindist

    rows = [("s1", t, float(t)) for t in range(16)] + [
        ("s2", t, 5.0) for t in range(8)
    ]
    got = sax_mindist(
        spark.createDataFrame(rows, ["s", "t", "v"]),
        "s", "t", "v", n_segments=4, alphabet=4,
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.series_a, r.series_b) == ("s1", "s2")
    assert (r.word_a, r.word_b) == ("abcd", "bbbb")
    assert r.mindist == pytest.approx(
        math.sqrt(8 / 4) * 0.674490, abs=1e-6
    )


def test_welch_anova_matches_brute_force(spark):
    """F* against an independent numpy implementation of Welch 1951
    on three heteroscedastic 10-point groups."""
    import numpy as np

    from etl_orders_to_bq_spark.operators.multitest import welch_anova

    g1 = [8.88, 9.12, 9.04, 8.98, 9.00, 9.08, 9.01, 8.85, 9.06, 8.99]
    g2 = [8.88, 8.95, 9.29, 9.44, 9.15, 9.58, 8.36, 9.18, 8.67, 9.05]
    g3 = [8.95, 9.12, 8.95, 8.85, 9.03, 8.84, 9.07, 8.98, 8.86, 8.98]
    rows = (
        [("a", v) for v in g1]
        + [("b", v) for v in g2]
        + [("c", v) for v in g3]
    )
    got = welch_anova(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    groups, k = [g1, g2, g3], 3
    w = [len(g) / np.var(g, ddof=1) for g in groups]
    xb = [float(np.mean(g)) for g in groups]
    W = sum(w)
    xbs = sum(wi * x for wi, x in zip(w, xb)) / W
    A = sum(wi * (x - xbs) ** 2 for wi, x in zip(w, xb)) / (k - 1)
    B = 1 + (2 * (k - 2) / (k * k - 1)) * sum(
        (1 - wi / W) ** 2 / (len(g) - 1) for wi, g in zip(w, groups)
    )
    assert got.k_groups == 3 and got.n == 30
    assert got.f_stat == pytest.approx(A / B, abs=1e-5)


def test_quade_conover_textbook_dataset(spark):
    """Conover's 7-block 3-treatment dataset: the published Quade
    F = 20.69 (exact integer replay gives 20.692483)."""
    from etl_orders_to_bq_spark.operators.multitest import quade_test

    data = [
        [52, 45, 38], [63, 62, 45], [45, 46, 33], [53, 47, 36],
        [47, 21, 12], [62, 58, 44], [49, 32, 27],
    ]
    rows = [
        (f"b{i}", f"t{j}", float(v))
        for i, blk in enumerate(data)
        for j, v in enumerate(blk)
    ]
    got = quade_test(
        spark.createDataFrame(rows, ["blk", "trt", "v"]),
        "blk", "trt", "v",
    ).collect()[0]
    assert got.k_treatments == 3 and got.n_complete == 7
    assert got.f_stat == pytest.approx(20.692483, abs=1e-6)


def test_ansari_bradley_matches_brute_force_with_ties(spark):
    """Inward-rank midscores against an independent positional
    implementation, on data with cross-group ties."""
    from collections import defaultdict

    from etl_orders_to_bq_spark.operators.multitest import ansari_bradley

    x = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    y = [2.0, 4.0, 9.0, 11.0, -1.0, 2.5]
    rows = [("a", v) for v in x] + [("b", v) for v in y]
    got = ansari_bradley(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b"
    ).collect()[0]
    allv = sorted(x + y)
    N = len(allv)
    pos = defaultdict(list)
    for r, v in enumerate(allv, 1):
        pos[v].append(min(r, N + 1 - r))
    avg = {v: sum(ps) / len(ps) for v, ps in pos.items()}
    assert got.n_a == 6 and got.n_b == 6
    assert got.ab_stat == pytest.approx(sum(avg[v] for v in x),
                                        abs=1e-6)


def test_grubbs_flags_the_planted_extreme(spark):
    import numpy as np

    from etl_orders_to_bq_spark.operators.quality import grubbs_test

    vals = [8.0, 8.1, 8.05, 7.95, 8.02, 12.0]
    got = grubbs_test(
        spark.createDataFrame([(v,) for v in vals], ["v"]), "v"
    ).collect()[0]
    x = np.array(vals)
    assert got.suspect_value == 12.0
    assert got.g_stat == pytest.approx(
        float(max(abs(x - x.mean())) / x.std(ddof=1)), abs=1e-6
    )


def test_dixon_q_gap_ratios_and_duplicate_extremes(spark):
    from etl_orders_to_bq_spark.operators.quality import dixon_q

    vals = [8.0, 8.1, 8.05, 7.95, 8.02, 12.0]
    got = dixon_q(
        spark.createDataFrame([(v,) for v in vals], ["v"]), "v"
    ).collect()[0]
    s = sorted(vals)
    assert got.q_low == pytest.approx(
        (s[1] - s[0]) / (s[-1] - s[0]), abs=1e-6
    )
    assert got.q_high == pytest.approx(
        (s[-1] - s[-2]) / (s[-1] - s[0]), abs=1e-6
    )
    # duplicated max: the neighbor order statistic IS the extreme
    dup = dixon_q(
        spark.createDataFrame(
            [(1.0,), (2.0,), (9.0,), (9.0,)], ["v"]
        ),
        "v",
    ).collect()[0]
    assert dup.q_high == 0.0
