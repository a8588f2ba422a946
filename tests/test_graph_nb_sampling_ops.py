"""Tests for round-7 batch-4 operators: graph_modularity,
reciprocity, naive_bayes_train, class_balance_sample,
weighted_median."""

import math

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.classifier import naive_bayes_train
from etl_orders_to_bq_spark.operators.graph import (
    graph_modularity,
    reciprocity,
)
from etl_orders_to_bq_spark.operators.ranking import weighted_median
from etl_orders_to_bq_spark.operators.sampling import class_balance_sample


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


def test_modularity_two_cliques(spark):
    # two disjoint triangles, communities = the cliques: the textbook
    # high-modularity case. m=6, each community: e_in=3, d_tot=6
    # contribution = 3/6 - (6/12)^2 = 0.25; Q = 0.5
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    com = spark.createDataFrame(
        [(n, n // 4) for n in range(1, 7)], "node int, community int"
    )
    out = {
        r["community"]: r
        for r in graph_modularity(_edges(spark, pairs), com).collect()
    }
    for c in (0, 1):
        assert out[c]["e_in"] == 3 and out[c]["d_tot"] == 6
        assert out[c]["contribution"] == 0.25
    assert sum(r["n_nodes"] for r in out.values()) == 6


def test_modularity_single_community_is_zero(spark):
    # all nodes in one community: Q = 1 - 1 = 0 exactly
    pairs = [(1, 2), (2, 3), (3, 4)]
    com = spark.createDataFrame([(n, 0) for n in range(1, 5)],
                                "node int, community int")
    r = graph_modularity(_edges(spark, pairs), com).collect()[0]
    assert r["contribution"] == 0.0


def test_modularity_dedupes_and_drops_self_loops(spark):
    pairs = [(1, 2), (2, 1), (1, 2), (1, 1)]
    com = spark.createDataFrame([(1, 0), (2, 0)], "node int, community int")
    r = graph_modularity(_edges(spark, pairs), com).collect()[0]
    assert r["e_in"] == 1 and r["d_tot"] == 2


def test_reciprocity_counts_mutual_pairs(spark):
    # (1,2)/(2,1) mutual; (3,4) one-way; dup + self-loop ignored
    pairs = [(1, 2), (2, 1), (3, 4), (1, 2), (5, 5)]
    r = reciprocity(_edges(spark, pairs)).collect()[0]
    assert r["n_edges"] == 3
    assert r["n_reciprocated"] == 2
    assert r["reciprocity"] == round(2 / 3, 6)


def test_reciprocity_empty(spark):
    r = reciprocity(_edges(spark, [])).collect()[0]
    assert r["n_edges"] == 0 and r["reciprocity"] is None


def test_naive_bayes_hand_counts(spark):
    rows = [
        ("en", "the cat the dog"),
        ("en", "the cat"),
        ("fr", "le chat"),
        ("fr", "le chien le chat"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {
        (r["lang"], r["token"]): r
        for r in naive_bayes_train(df, "lang", "text", top_k=3).collect()
    }
    # en: the=3, cat=2, dog=1 (tot=6); vocab = {the,cat,dog,le,chat,chien}=6
    r = out[("en", "the")]
    assert r["n"] == 3
    assert r["loglik"] == round(math.log10(4 / 12), 6)
    assert r["prior"] == round(math.log10(2 / 4), 6)
    assert out[("fr", "le")]["n"] == 3
    # top_k respected: at most 3 tokens per class
    langs = {}
    for (lang, _t) in out:
        langs[lang] = langs.get(lang, 0) + 1
    assert all(v <= 3 for v in langs.values())


def test_class_balance_sample_caps_at_minority(spark):
    rows = [("a", i) for i in range(10)] + [("b", 100 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "cls string, id int")
    out = class_balance_sample(df, "cls", "id").collect()
    per = {}
    for r in out:
        per.setdefault(r["cls"], []).append(r["id"])
    assert len(per["a"]) == 3 and len(per["b"]) == 3
    # deterministic: rerun picks the same ids
    out2 = class_balance_sample(df, "cls", "id").collect()
    assert sorted((r["cls"], r["id"]) for r in out) == sorted(
        (r["cls"], r["id"]) for r in out2
    )


def test_weighted_median_exact(spark):
    # values 1..4 with weights 1,1,1,7: total 10, median = smallest v
    # with cum >= 5 -> v=4; unweighted-equal case -> lower median
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 7)], "v double, w long"
    )
    r = weighted_median(df, "v", "w").collect()[0]
    assert r["total_weight"] == 10 and r["weighted_median"] == 4.0
    df2 = spark.createDataFrame([(1.0, 1), (2.0, 1)], "v double, w long")
    r2 = weighted_median(df2, "v", "w").collect()[0]
    assert r2["weighted_median"] == 1.0  # lower median by definition


def test_weighted_median_empty_and_nulls(spark):
    df = spark.createDataFrame([(None, 5), (1.0, None)], "v double, w long")
    r = weighted_median(df, "v", "w").collect()[0]
    assert r["total_weight"] == 0 and r["weighted_median"] is None
