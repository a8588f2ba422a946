"""Tests for the round-7 batch-2 operators: perplexity buckets,
sequential-pattern support, diff-in-diff, and the positional
inverted index."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.bm25 import inverted_index
from etl_orders_to_bq_spark.operators.experiment import diff_in_diff
from etl_orders_to_bq_spark.operators.lm import perplexity_buckets
from etl_orders_to_bq_spark.operators.seqmine import (
    seq_pattern_support,
)


# ------------------------------------------------------- seq patterns


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long"
    )


def test_seq_patterns_non_adjacent_precedence(spark):
    # user 1: a -> x -> b  (a before b even though not adjacent)
    # user 2: b -> a       (b before a, NOT a before b)
    rows = [
        (1, "a", 1, 1), (1, "x", 2, 2), (1, "b", 3, 3),
        (2, "b", 1, 4), (2, "a", 2, 5),
    ]
    out = {
        (r["from_type"], r["to_type"]): r["n_users"]
        for r in seq_pattern_support(
            _events(spark, rows), "user_id", "event_type", "ts",
            "event_id",
        ).collect()
    }
    assert out[("a", "b")] == 1
    assert out[("b", "a")] == 1
    assert out[("a", "x")] == 1 and out[("x", "b")] == 1
    # diagonal: nobody fired the same type twice
    assert ("a", "a") not in out


def test_seq_patterns_diagonal_counts_repeats(spark):
    rows = [(1, "a", 1, 1), (1, "a", 2, 2), (2, "a", 1, 3)]
    out = {
        (r["from_type"], r["to_type"]): (
            r["n_users"], r["support_ratio"]
        )
        for r in seq_pattern_support(
            _events(spark, rows), "user_id", "event_type", "ts",
            "event_id",
        ).collect()
    }
    # only user 1 fired `a` twice; ratio over 2 users total
    assert out[("a", "a")] == (1, 0.5)


def test_seq_patterns_min_support_filters(spark):
    rows = [
        (1, "a", 1, 1), (1, "b", 2, 2),
        (2, "a", 1, 3), (2, "b", 2, 4),
        (3, "b", 1, 5), (3, "a", 2, 6),
    ]
    out = seq_pattern_support(
        _events(spark, rows), "user_id", "event_type", "ts",
        "event_id", min_support=2,
    ).collect()
    pairs = {(r["from_type"], r["to_type"]) for r in out}
    assert pairs == {("a", "b")}


# ------------------------------------------------------------------ DiD


def test_diff_in_diff_hand_values(spark):
    # control: 10 -> 12 (+2); treated: 20 -> 27 (+7); did = +5
    rows = [
        (0, 0, 10.0), (0, 1, 12.0),
        (1, 0, 20.0), (1, 1, 27.0),
    ]
    df = spark.createDataFrame(rows, "v int, p int, value double")
    out = diff_in_diff(
        df, variant_col=F.col("v"), period_col=F.col("p")
    ).collect()[0]
    assert out["mean_c0"] == 10.0 and out["mean_t1"] == 27.0
    assert out["did"] == 5.0
    assert (out["n_c0"], out["n_t1"]) == (1, 1)


def test_diff_in_diff_multi_rows_per_cell(spark):
    rows = [
        (0, 0, 1.0), (0, 0, 3.0),      # mean 2
        (0, 1, 4.0), (0, 1, 6.0),      # mean 5  (+3)
        (1, 0, 10.0), (1, 0, 10.0),    # mean 10
        (1, 1, 20.0), (1, 1, 22.0),    # mean 21 (+11)
    ]
    df = spark.createDataFrame(rows, "v int, p int, value double")
    out = diff_in_diff(
        df, variant_col=F.col("v"), period_col=F.col("p")
    ).collect()[0]
    assert out["did"] == 8.0 and out["n_c0"] == 2


# --------------------------------------------------- inverted index


def test_inverted_index_positions_and_guard(spark):
    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["term"]: r for r in inverted_index(df, max_postings=2).collect()
    }
    assert out["apple"]["df"] == 2 and out["apple"]["cf"] == 3
    assert out["apple"]["postings"] == "1:0|2,3:0"
    assert out["banana"]["postings"] == "1:1,2:0"
    assert out["cherry"]["postings"] == "2:1"
    # guard: raise df above max_postings -> NULL payload, exact counts
    guarded = {
        r["term"]: r
        for r in inverted_index(df, max_postings=1).collect()
    }
    assert guarded["apple"]["postings"] is None
    assert guarded["apple"]["df"] == 2 and guarded["apple"]["cf"] == 3
    assert guarded["cherry"]["postings"] == "2:1"


def test_inverted_index_normalizes_case_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "  Apple   APPLE  ")], "doc_id long, text string"
    )
    out = inverted_index(df).collect()
    assert len(out) == 1
    assert out[0]["term"] == "apple" and out[0]["cf"] == 2
    assert out[0]["postings"] == "1:0|1"


# ----------------------------------------------- perplexity buckets


def test_perplexity_buckets_shares_sum_to_one(spark):
    docs = [
        (i, " ".join(["common"] * 5 + [f"rare{i}"]), 30)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, n_chars long"
    )
    out = perplexity_buckets(df, n_buckets=4).collect()
    assert len(out) == 4
    assert sum(r["n_docs"] for r in out) == 20
    assert abs(sum(r["char_share"] for r in out) - 1.0) < 1e-4
    # scores ordered: bucket 1 holds the lowest scores
    by_bucket = sorted(out, key=lambda r: r["bucket"])
    for prev, nxt in zip(by_bucket, by_bucket[1:]):
        assert prev["hi_score"] <= nxt["lo_score"]


def test_perplexity_buckets_empty_doc_excluded(spark):
    df = spark.createDataFrame(
        [(1, "w w w", 5), (2, "", 0), (3, "w q", 3)],
        "doc_id long, text string, n_chars long",
    )
    out = perplexity_buckets(df, n_buckets=2).collect()
    # doc 2 has no tokens -> unscored -> absent
    assert sum(r["n_docs"] for r in out) == 2
