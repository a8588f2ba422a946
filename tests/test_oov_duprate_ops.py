"""Tests for round-7 batch-10 operators: oov_rate,
dup_rate_by_source."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.dedup import dup_rate_by_source
from etl_orders_to_bq_spark.operators.lm import oov_rate


def test_oov_rate_hand_counts(spark):
    # vocab_size=2 -> vocab = {'aa' (4), 'bb' (2)} (count desc);
    # 'cc'/'dd' are OOV
    rows = [(1, "aa aa bb cc"), (2, "aa bb dd"), (3, "aa aa")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in oov_rate(df, "text", "doc_id", 2).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1
    assert out[1]["oov_ratio"] == 0.25
    assert out[2]["n_oov"] == 1
    assert out[3]["n_oov"] == 0 and out[3]["oov_ratio"] == 0.0


def test_oov_rate_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in oov_rate(df, "text", "doc_id", 10).collect()}
    assert out[2]["n_tokens"] == 0
    assert out[2]["oov_ratio"] is None


def test_dup_rate_by_source_cross_and_within(spark):
    rows = [
        (1, "s1", "copy me"),
        (2, "s2", "copy me"),      # cross-source dup with doc 1
        (3, "s1", "twice here"),
        (4, "s1", "twice here"),   # within-source dup
        (5, "s2", "unique a"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = {r["source"]: r for r in
           dup_rate_by_source(df, "source", "text").collect()}
    s1, s2 = out["s1"], out["s2"]
    assert s1["n_docs"] == 3 and s1["n_dup_docs"] == 3
    assert s1["n_crosssource_docs"] == 1
    assert s1["dup_rate"] == 1.0
    assert s1["crosssource_rate"] == round(1 / 3, 6)
    assert s2["n_dup_docs"] == 1 and s2["n_crosssource_docs"] == 1
    assert s2["dup_rate"] == 0.5


def test_dup_rate_by_source_null_text_counted_not_dup(spark):
    rows = [
        (1, "s1", None),
        (2, "s1", None),
        (3, "s1", "real doc"),
        (4, "s2", "real doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = {r["source"]: r for r in
           dup_rate_by_source(df, "source", "text").collect()}
    s1 = out["s1"]
    # nulls stay in the denominator, surfaced, never mutual dups
    assert s1["n_docs"] == 3 and s1["n_null_text"] == 2
    assert s1["n_dup_docs"] == 1  # only the real cross-source dup
    assert s1["dup_rate"] == round(1 / 3, 6)
