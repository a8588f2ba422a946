"""Round-9 operators: exact substring dedup (suffix.py) and CCNet
per-paragraph quality filtering (paragraphs.py) — hand-computed
goldens in the reference's test style (SURVEY.md §5)."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.paragraphs import (
    paragraph_quality_filter,
)
from etl_orders_to_bq_spark.operators.suffix import (
    exact_substring_dedup,
    exact_substring_spans,
)


def test_exact_substring_spans_cross_doc(spark):
    # docs 0 and 1 share the 10-token prefix a..j; doc 2 is unique
    df = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j k l"),
            (1, "a b c d e f g h i j x y"),
            (2, "u v w x1 y1 z1 q r s t"),
        ],
        ["doc_id", "text"],
    )
    rows = sorted(
        exact_substring_spans(df, min_tokens=10).collect(),
        key=lambda r: (r.doc_id, r.span_start),
    )
    assert [(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in rows] == [
        (0, 0, 10, 10),
        (1, 0, 10, 10),
    ]


def test_exact_substring_spans_merges_overlaps(spark):
    # doc 0 repeats an 11-token run inside itself twice -> windows at
    # consecutive positions merge into ONE maximal span per occurrence
    # region (here the occurrences are adjacent so they fuse)
    run = "p q r s t u v w x y"
    df = spark.createDataFrame(
        [(0, f"{run} {run}"), (1, "n o filler words only here m1 m2 m3 m4")],
        ["doc_id", "text"],
    )
    rows = exact_substring_spans(df, min_tokens=10).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in rows] == [(0, 0, 20)]


def test_exact_substring_dedup_removes_all_occurrences(spark):
    df = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j k l"),
            (1, "a b c d e f g h i j x y"),
            (2, ""),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans, r.clean_text)
        for r in exact_substring_dedup(df, min_tokens=10).collect()
    }
    # BOTH copies of the shared prefix die (Lee et al. remove-all)
    assert got[0] == (12, 10, 1, "k l")
    assert got[1] == (12, 10, 1, "x y")
    assert got[2] == (0, 0, 0, "")


def test_exact_substring_self_repeat(spark):
    # a document repeating one token 12 times: every 10-window inside
    # it has the same content -> duplicated -> the whole doc is one span
    df = spark.createDataFrame(
        [(0, " ".join(["z"] * 12)), (1, "b c d e f g h i j k")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans)
        for r in exact_substring_dedup(df, min_tokens=10).collect()
    }
    assert got[0] == (12, 12, 1)
    assert got[1] == (10, 0, 0)


def test_dedup_keep_best_string_ids(spark):
    from etl_orders_to_bq_spark.operators.dedup import dedup_keep_best

    pairs = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
    scored = spark.createDataFrame(
        [("a", 0.3), ("b", 0.8)], ["doc_id", "quality"]
    )
    row = dedup_keep_best(pairs, scored).collect()[0]
    assert row.rep_id == "b" and row.n_members == 2


def test_auto_region_lloyd_branch_matches_lloyd_kmeans(spark):
    # force the Lloyd branch (degeneracy_factor=0 makes ANY histogram
    # fail the probe) and check the inlined first round reproduces
    # lloyd_kmeans-from-seeds exactly
    from etl_orders_to_bq_spark.operators.ann import (
        _hyperplanes,
        assign_ivf_clusters,
        lloyd_kmeans,
    )
    from etl_orders_to_bq_spark.operators.semdedup import (
        auto_region_assign,
    )

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(200)
        .localCheckpoint()
    )
    got = (
        auto_region_assign(
            e, dim=64, target_bucket=128, seed=42,
            degeneracy_factor=0.0, kmeans_rounds=2,
        )
        .select("vec_id", "ivf_cluster")
        .orderBy("vec_id")
        .collect()
    )
    cents, _ = lloyd_kmeans(
        e, _hyperplanes(64, 8, 42), rounds=2, round_ndigits=6,
        method="numpy",
    )
    ref = (
        assign_ivf_clusters(e, cents, "embedding", "numpy")
        .select("vec_id", "ivf_cluster")
        .orderBy("vec_id")
        .collect()
    )
    assert [(r.vec_id, r.ivf_cluster) for r in got] == [
        (r.vec_id, r.ivf_cluster) for r in ref
    ]


def test_pca_pc1_excludes_ragged_rows(spark):
    from etl_orders_to_bq_spark.operators.embstats import pca_pc1_scores

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 0.5, -1.0]),
            (1, [1.1, 2.1, 0.4, -0.9]),
            (2, [9.0, 9.0]),  # wrong length: excluded, no crash
            (3, None),
        ],
        ["vec_id", "embedding"],
    )
    sc = pca_pc1_scores(df, dim=4, rounds=4).toPandas()
    assert sorted(sc.vec_id.tolist()) == [0, 1]


def test_hard_negatives_excludes_self_and_positives(spark):
    from etl_orders_to_bq_spark.operators.ann import hard_negatives

    # 4-dim toy: vec 0 is the query; 1 is its positive (closest); 2 is
    # nearly identical to 0 (the hard negative); 3 is orthogonal-ish
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),
        (2, [0.98, 0.05, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qs = spark.createDataFrame([(0,)], ["query_id"])
    pos = spark.createDataFrame([(0, 1)], ["query_id", "pos_id"])
    got = [
        (r.neg_id, r.rank)
        for r in hard_negatives(e, qs, pos, dim=4, k=2)
        .orderBy("rank")
        .collect()
    ]
    ids = [g[0] for g in got]
    assert 0 not in ids and 1 not in ids  # self + positive excluded
    assert ids[0] == 2  # the near-duplicate is the top hard negative


def test_dedup_keep_best_picks_max_quality(spark):
    from etl_orders_to_bq_spark.operators.dedup import dedup_keep_best

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    scored = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5), (11, 0.4)],
        ["doc_id", "quality"],
    )
    got = {
        r.component: (r.rep_id, r.n_members, r.rep_score)
        for r in dedup_keep_best(pairs, scored).collect()
    }
    # cluster {1,2,3}: quality tie 2 vs 3 -> smaller id 2 wins
    assert got[1] == (2, 3, 0.9)
    assert got[10] == (10, 2, 0.5)


def test_curriculum_order_round_robin(spark):
    from etl_orders_to_bq_spark.operators.ranking import curriculum_order

    # 7 rows, 3 buckets: T=7 -> q=2, r=1 -> bucket sizes [3, 2, 2]
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 8)], ["id", "difficulty"]
    )
    rows = curriculum_order(
        df, ["difficulty", "id"], n_buckets=3
    ).collect()
    got = {r.id: (r.bucket, r.cycle, r.curriculum_key) for r in rows}
    # bucket 1 = ids 1-3 (cycles 1-3), bucket 2 = ids 4-5, bucket 3 = 6-7
    assert got[1] == (1, 1, 1) and got[4] == (2, 1, 2) and got[6] == (3, 1, 3)
    assert got[2] == (1, 2, 4) and got[5] == (2, 2, 5) and got[7] == (3, 2, 6)
    assert got[3] == (1, 3, 7)
    # sorting by curriculum_key interleaves one item per bucket per cycle
    order = [r.id for r in sorted(rows, key=lambda r: r.curriculum_key)]
    assert order == [1, 4, 6, 2, 5, 7, 3]


def test_zipf_slope_exact_power_law(spark):
    import math

    from etl_orders_to_bq_spark.operators.lm import zipf_slope

    # construct counts following freq(r) = 1000 / r exactly for 4 terms
    # (w_r repeated 1000/r times) -> slope should be ~-1
    words = []
    for r, w in enumerate(["a", "b", "c", "d"], start=1):
        words += [w] * (1000 // r)
    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    row = zipf_slope(df, top_k=10).collect()[0]
    assert row.n_terms == 4
    # freq = [1000, 500, 333, 250]: not a perfect power law (floor on
    # 1000/3), so allow a small band around -1
    assert -1.01 < row.slope < -0.98
    # intercept ~ log10(1000) = 3
    assert abs(row.intercept - math.log10(1000)) < 0.02


def test_corpus_diff_statuses(spark):
    from etl_orders_to_bq_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "s", "a"), (2, "s", "b"), (3, "s", "c"), (4, "t", "d")],
        ["doc_id", "source", "text"],
    )
    # doc 4 moves group t -> u (unchanged text): the new group sees
    # n_moved_in + the unchanged count, the OLD group sees n_moved_out
    # (r10 advisor finding: moves used to be invisible to the old
    # group's census)
    new = spark.createDataFrame(
        [(2, "s", "b"), (3, "s", "c2"), (5, "s", "e"), (4, "u", "d")],
        ["doc_id", "source", "text"],
    )
    got = {
        r.source: (
            r.n_added,
            r.n_removed,
            r.n_changed,
            r.n_unchanged,
            r.n_moved_in,
            r.n_moved_out,
        )
        for r in corpus_diff(old, new).collect()
    }
    assert got["s"] == (1, 1, 1, 1, 0, 0)
    assert got["t"] == (0, 0, 0, 0, 0, 1)
    assert got["u"] == (0, 0, 0, 1, 1, 0)


def test_corpus_manifest_order_insensitive_and_binding(spark):
    from etl_orders_to_bq_spark.operators.dedup import corpus_manifest

    a = spark.createDataFrame(
        [(1, "s", "x"), (2, "s", "y"), (3, "s", None)],
        ["doc_id", "source", "text"],
    )
    b = spark.createDataFrame(  # same rows, different order
        [(3, "s", None), (2, "s", "y"), (1, "s", "x")],
        ["doc_id", "source", "text"],
    )
    swapped = spark.createDataFrame(  # texts exchanged between ids
        [(1, "s", "y"), (2, "s", "x"), (3, "s", None)],
        ["doc_id", "source", "text"],
    )
    ma = corpus_manifest(a).collect()[0]
    mb = corpus_manifest(b).collect()[0]
    ms = corpus_manifest(swapped).collect()[0]
    assert ma.manifest == mb.manifest and ma.n_null_text == 1
    assert ms.manifest != ma.manifest  # id<->text swap is visible


def test_bpe_encode_hand_case(spark):
    from etl_orders_to_bq_spark.operators.lm import bpe_encode

    df = spark.createDataFrame(
        [(0, "the then than"), (1, "aaa the")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_words, r.n_subwords, r.fertility, r.encoded_text)
        for r in bpe_encode(
            df, [("t", "h"), ("th", "e</w>"), ("a", "a")]
        ).collect()
    }
    # the->the</w>; then->th,e,n</w>; than->th,a,n</w>
    assert got[0] == (3, 7, 2.333333, "the</w> th e n</w> th a n</w>")
    # greedy left-to-right: aaa + (a,a) -> [aa, a</w>], not [a, aa</w>]
    assert got[1] == (2, 3, 1.5, "aa a</w> the</w>")


def test_stupid_backoff_hand_case(spark):
    import math

    from etl_orders_to_bq_spark.operators.lm import stupid_backoff_scores

    train = spark.createDataFrame(
        [(0, "a b c a b c a b d")], ["doc_id", "text"]
    )
    # train: N=9 tokens, V=4; c(abc)=2, c(ab)=3, c(cab)=2, c(ca)=2
    test = spark.createDataFrame(
        [(1, "a b c"), (2, "a b x"), (3, "c a b")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.sb_logprob
        for r in stupid_backoff_scores(test, train).collect()
    }
    assert got[1] == round(round(math.log10(2 / 3), 6), 6)
    # abx: trigram unseen, bigram bx unseen, x OOV -> a^2 * 1/(9+4)
    assert got[2] == round(round(math.log10(0.4 * 0.4 / 13), 6), 6)
    assert got[3] == 0.0  # S(b|ca) = 2/2 = 1


def test_pca_pc1_matches_numpy_direction(spark):
    import numpy as np

    from etl_orders_to_bq_spark.operators.embstats import (
        _pc1_fit,
        pca_pc1_scores,
    )

    rng = np.random.RandomState(7)
    d = 8
    base = np.array([1.0, 2.0, 0.5, -1.0, 0.0, 0.3, -0.2, 1.5])
    base /= np.linalg.norm(base)
    X = np.outer(rng.randn(200) * 2.0, base) + rng.randn(200, d) * 0.05
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)],
        ["vec_id", "embedding"],
    )
    v = np.array(_pc1_fit(df, dim=d, rounds=8), dtype=float)
    v /= np.linalg.norm(v)
    Xq = np.round(X * 1e6) / 1e6
    evals, evecs = np.linalg.eigh(np.cov(Xq.T, bias=True))
    assert abs(float(v @ evecs[:, -1])) > 0.9999
    sc = pca_pc1_scores(df, dim=d, rounds=8).orderBy("vec_id").toPandas()
    assert len(sc) == 200 and sc.pc1_score.abs().max() > 0


def test_pca_pc1_degenerate_all_equal(spark):
    # identical vectors -> zero scatter -> w = 0 every round -> v stays
    # at v0 and scores are the (equal) v0 projections, no crash
    from etl_orders_to_bq_spark.operators.embstats import pca_pc1_scores

    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(5)],
        ["vec_id", "embedding"],
    )
    sc = pca_pc1_scores(df, dim=4, rounds=8).toPandas()
    assert len(sc) == 5 and sc.pc1_score.nunique() == 1


def test_benchmark_ngram_contamination(spark):
    from etl_orders_to_bq_spark.operators.suffix import (
        benchmark_ngram_contamination,
    )

    train = spark.createDataFrame(
        [
            (0, "a b c d e LEAK1 LEAK2 LEAK3 LEAK4 LEAK5 tail words"),
            (1, "all clean training words nothing shared here at all ok"),
            (2, "x y"),  # shorter than ngram -> 0 windows, clean
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "LEAK1 LEAK2 LEAK3 LEAK4 LEAK5")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (
            r.n_windows,
            r.flagged_windows,
            r.n_eval_docs,
            r.contaminated,
        )
        for r in benchmark_ngram_contamination(
            train, ev, ngram=5
        ).collect()
    }
    assert got[0] == (8, 1, 1, True)  # one 5-window matches, at pos 5
    assert got[1] == (6, 0, 0, False)
    assert got[2] == (0, 0, 0, False)


def test_paragraph_filter_dedup_then_quality(spark):
    good = "the quick brown fox is a good long paragraph right here"
    df = spark.createDataFrame(
        [
            (0, f"{good}\nzz qq 123\n{good}"),
            (1, f"{good}\nanother decent paragraph with the usual words in it"),
            (2, "zz\n\n  "),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (
            r.n_paras,
            r.n_dropped_dup,
            r.n_dropped_quality,
            r.clean_text,
        )
        for r in paragraph_quality_filter(df, min_quality=0.35).collect()
    }
    # doc 0: 3 non-blank paras; its own repeat of `good` dies as dup,
    # "zz qq 123" dies on quality
    assert got[0] == (3, 1, 1, good)
    # doc 1: its copy of `good` lost keep-first to doc 0
    assert got[1][0:2] == (2, 1)
    assert got[1][3].startswith("another decent paragraph")
    # doc 2: blanks are not paragraphs; "zz" fails quality -> empty doc
    assert got[2] == (1, 0, 1, "")


def test_paragraph_filter_no_dedup(spark):
    good = "the quick brown fox is a good long paragraph right here"
    df = spark.createDataFrame(
        [(0, f"{good}\n{good}")], ["doc_id", "text"]
    )
    row = paragraph_quality_filter(
        df, min_quality=0.35, dedup=False
    ).collect()[0]
    assert (row.n_paras, row.n_dropped_dup, row.n_dropped_quality) == (
        2,
        0,
        0,
    )
    assert row.clean_text == f"{good}\n{good}"


def test_paragraph_filter_census_complete_and_literal_delim(spark):
    # empty/blank docs keep their row (n_paras = 0); a regex-special
    # delimiter is treated literally
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "the quick brown fox is a good long paragraph right here|zz")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_paras, r.clean_text)
        for r in paragraph_quality_filter(
            df, min_quality=0.35, delimiter="|"
        ).collect()
    }
    assert got[0] == (0, "") and got[1] == (0, "")
    assert got[2][0] == 2 and got[2][1].startswith("the quick")


def test_paragraph_filter_keep_first_is_global(spark):
    # the SAME paragraph in two docs: only the (smaller doc_id, idx)
    # occurrence survives, corpus-wide
    p = "the quick brown fox is a good long paragraph right here"
    df = spark.createDataFrame(
        [(7, p), (3, p)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.clean_text
        for r in paragraph_quality_filter(df, min_quality=0.35).collect()
    }
    assert got[3] == p and got[7] == ""
