"""User-facing UDF surface tests: scalar pandas UDF, grouped-agg UDAF,
SQL registration — including hypothesis property tests that pin the
engine's core custom semantics against independent Python oracles."""

import html

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def test_scalar_udf_roundtrip(spark):
    from etl_orders_to_bq_spark.functions.udf import scalar_udf

    @scalar_udf("double")
    def plus_one(s: pd.Series) -> pd.Series:
        return s + 1.0

    df = spark.createDataFrame([(1.0,), (2.5,), (-3.0,)], ["x"])
    assert [r[0] for r in df.select(plus_one("x")).collect()] == [2.0, 3.5, -2.0]


def test_grouped_agg_udaf(spark):
    from etl_orders_to_bq_spark.functions.udf import grouped_agg_udf

    @grouped_agg_udf("double")
    def trimmed_mean(s: pd.Series) -> float:
        s = s.sort_values()
        k = max(1, len(s) // 10)
        return float(s.iloc[k:-k].mean()) if len(s) > 2 * k else float(s.mean())

    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4, 1000]] + [("b", 5.0)], ["g", "v"]
    )
    got = {
        r["g"]: r["tm"]
        for r in df.groupBy("g").agg(trimmed_mean("v").alias("tm")).collect()
    }
    assert got["a"] == 3.0  # outlier 1000 trimmed
    assert got["b"] == 5.0


def test_sql_registration(spark):
    from etl_orders_to_bq_spark.functions.udf import (
        register_sql_function,
        scalar_udf,
    )

    @scalar_udf("string")
    def shout(s: pd.Series) -> pd.Series:
        return s.str.upper() + "!"

    register_sql_function(spark, "shout", shout)
    spark.createDataFrame([("hi",)], ["w"]).createOrReplaceTempView("words")
    assert spark.sql("select shout(w) as s from words").first()["s"] == "HI!"


# ---------------------------------------------------------------------------
# property tests: engine Column semantics vs independent Python oracles
# ---------------------------------------------------------------------------

_name_chars = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "абвгдеєжзиіїйклмнопрстуфхцчшщьюяАБВГДЕЄЖЗИІЇЙ0123456789 -'&#;",
    min_size=0,
    max_size=20,
)


def _clean_name_oracle(v: str) -> str:
    """Independent reimplementation of the reference's _clean_names
    semantics (html.unescape -> lower -> drop digits -> blanking regex),
    using Python's regex engine as the oracle."""
    import re

    v = html.unescape(v).lower()
    v = re.sub(r"\d", "", v)
    pattern = (
        r"\d|\s|^(-)$|(^\w{1}$)|(^[aoueiyаяєоуиіїе]{0,}$)"
        r"|(^[^aoueiyаяєоуиіїе]{0,}$)"
    )
    return re.sub(pattern, "", v)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_name_chars, min_size=1, max_size=20))
def test_clean_name_property(spark, values):
    from etl_orders_to_bq_spark.functions.names import clean_name

    df = spark.createDataFrame([(v,) for v in values], ["name"])
    got = [r[0] for r in df.select(clean_name("name")).collect()]
    expected = [_clean_name_oracle(v) for v in values]
    assert got == expected


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
    )
)
def test_first_occurrence_dedup_property(spark, rows):
    """first_occurrence_dedup == pandas drop_duplicates(keep='first')
    for any key/order data, at any partitioning."""
    from etl_orders_to_bq_spark.operators.dedup import first_occurrence_dedup

    # make the order column a total order within keys (pandas relies on
    # row order; Spark needs the explicit column) — use unique ord ids
    uniq = [(k, i, v) for i, (k, _, v) in enumerate(rows)]
    pdf = pd.DataFrame(uniq, columns=["k", "ord", "v"])
    expected = (
        pdf.sort_values("ord").drop_duplicates(subset="k", keep="first")
    )
    df = spark.createDataFrame(pdf).repartition(5)
    got = (
        first_occurrence_dedup(df, ["k"], "ord")
        .orderBy("k")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = expected.sort_values("k").reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(got, exp)


def test_table_udf_fanout_and_sql(spark):
    """UDTF: one document row fans out to one row per sentence, usable
    from both the DataFrame API and the SQL surface."""
    from etl_orders_to_bq_spark.functions.udf import (
        register_table_function,
        table_udf,
    )

    @table_udf("doc_id bigint, sent_idx int, sentence string")
    class SplitSentences:
        def eval(self, doc_id, text):
            if text is None:
                return
            for i, s in enumerate(x.strip() for x in text.split(".")):
                if s:
                    yield (doc_id, i, s)

    df = spark.createDataFrame(
        [(1, "First. Second. "), (2, None), (3, "Only one")],
        "doc_id bigint, text string",
    )
    df.createOrReplaceTempView("docs_udtf_in")

    out = SplitSentences(F.lit(1), F.lit("First. Second. ")).collect()
    assert [(r["doc_id"], r["sent_idx"], r["sentence"]) for r in out] == [
        (1, 0, "First"),
        (1, 1, "Second"),
    ]

    register_table_function(spark, "split_sentences", SplitSentences)
    sql_out = spark.sql(
        "select s.* from docs_udtf_in, "
        "lateral split_sentences(doc_id, text) s"
    ).collect()
    got = sorted((r["doc_id"], r["sent_idx"], r["sentence"]) for r in sql_out)
    assert got == [(1, 0, "First"), (1, 1, "Second"), (3, 0, "Only one")]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 30), st.integers(-9, 9)),
        min_size=1,
        max_size=50,
    )
)
def test_dedup_strategies_agree_property(spark, rows):
    """The window and min_by strategies of first_occurrence_dedup must
    return identical rows for ANY key/order data (they are two shuffle
    profiles of one semantic)."""
    from etl_orders_to_bq_spark.operators.dedup import first_occurrence_dedup

    uniq = [(k, i, v) for i, (k, _, v) in enumerate(rows)]
    df = spark.createDataFrame(uniq, "k long, ord long, v long").repartition(4)
    win = {
        (r["k"], r["ord"], r["v"])
        for r in first_occurrence_dedup(df, ["k"], "ord").collect()
    }
    mb = {
        (r["k"], r["ord"], r["v"])
        for r in first_occurrence_dedup(
            df, ["k"], "ord", strategy="min_by"
        ).collect()
    }
    assert win == mb
