"""Golden-value ports of the reference's operator tests (SURVEY.md §5).

The golden values come from reference tests/test_orders_etl.py and
define the semantics our engine must reproduce exactly.
"""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.functions import (
    clean_name,
    repair_decimal_comma,
    strip_non_digits,
)


def test_repair_decimal_comma(spark):
    df = spark.createDataFrame([("1300,65",), ("17.50",), ("0,1",)], ["sum"])
    got = [
        r[0]
        for r in df.select(repair_decimal_comma("sum").cast("double")).collect()
    ]
    assert got == [1300.65, 17.50, 0.1]


def test_strip_non_digits(spark):
    # dirty ids observed in reference input_data/orders_s.csv: letter
    # suffix/prefix/infix (FIXTURES.md F1)
    df = spark.createDataFrame(
        [("529629c",), ("345f56",), ("d59954",), ("123456",)], ["product_id"]
    )
    got = [r[0] for r in df.select(strip_non_digits("product_id").cast("long")).collect()]
    assert got == [529629, 34556, 59954, 123456]


def test_clean_names_golden(spark):
    """Reference tests/test_orders_etl.py:76-104 golden pairs (FIXTURES.md F3)."""
    cases = [
        ("Olena", "olena"),  # lowercase
        ("-", ""),  # lone dash blanked
        ("в&#039;ячеславівна", "в'ячеславівна"),  # HTML entity unescape
        ("я", ""),  # single char blanked
        ("мар&#039;яна", "мар'яна"),  # entity + survives
        ("кіт", "кіт"),  # normal word survives
        ("ddd", ""),  # all-consonants blanked
        ("m", ""),  # single Latin char
        ("с", ""),  # single Cyrillic char
        ("іванова-шипак", "іванова-шипак"),  # inner hyphen survives
        ("abc123", "abc"),  # digits deleted anywhere
        ("aiy", ""),  # all-vowels blanked
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["name"])
    got = [r[0] for r in df.select(clean_name("name")).collect()]
    assert got == [c[1] for c in cases]


def test_clean_name_column_only_variant(spark):
    """unescape=False path (pure-Column, oracle-reproducible) matches on
    entity-free inputs."""
    df = spark.createDataFrame([("Olena",), ("ddd",), ("іванова-шипак",)], ["n"])
    got = [r[0] for r in df.select(clean_name("n", unescape=False)).collect()]
    assert got == ["olena", "", "іванова-шипак"]


def test_csv_corrupt_record_capture(spark, tmp_path):
    """PERMISSIVE capture: structurally broken lines are quarantined in
    the corrupt-record column, clean lines parse normally."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_orders_to_bq_spark.sources.csv import (
        CORRUPT_RECORD_COL,
        read_csv_raw,
    )

    p = tmp_path / "dirty.csv"
    p.write_text('a,b\n1,x\n"unclosed quote,zzz\n2,y\n')
    schema = T.StructType(
        [T.StructField("a", T.StringType()), T.StructField("b", T.StringType())]
    )
    df = read_csv_raw(spark, str(p), schema, keep_corrupt=True).cache()
    bad = df.filter(F.col(CORRUPT_RECORD_COL).isNotNull())
    good = df.filter(F.col(CORRUPT_RECORD_COL).isNull())
    assert bad.count() == 1
    assert "unclosed" in bad.first()[CORRUPT_RECORD_COL]
    assert sorted(r["a"] for r in good.collect()) == ["1", "2"]
