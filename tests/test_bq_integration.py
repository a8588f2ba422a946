"""BigQuery sink integration smoke — skip-unless-configured.

The reference actually uploads to BigQuery (reference etl/bq_client.py:
20-32 via pandas-gbq); this container ships neither the spark-bigquery
connector jar nor credentials, so sinks/writers.py's mode/option
mapping is covered by the parquet-path tests and THIS test closes the
end-to-end gap wherever a jar + credentials exist. Configure with:

    export SPARK_BQ_SMOKE=1
    export SPARK_BQ_JAR=/path/to/spark-bigquery-with-dependencies_2.13-<ver>.jar
        # Maven: com.google.cloud.spark:spark-bigquery-with-dependencies_2.13
        # (Scala 2.13 builds for Spark 4.x; 0.42+ supports Spark 4)
    export SPARK_BQ_DATASET=<project>.<dataset>   # test dataset, writable
    export GOOGLE_APPLICATION_CREDENTIALS=/path/to/sa.json

Then: pytest tests/test_bq_integration.py -q
"""

from __future__ import annotations

import os
import uuid

import pytest

_REQUIRED = ("SPARK_BQ_SMOKE", "SPARK_BQ_JAR", "SPARK_BQ_DATASET")
_missing = [k for k in _REQUIRED if not os.environ.get(k)]

pytestmark = pytest.mark.skipif(
    bool(_missing),
    reason=(
        "BigQuery smoke not configured (set "
        + ", ".join(_missing or _REQUIRED)
        + " — see module docstring for jar coordinates)"
    ),
)


@pytest.fixture(scope="module")
def bq_spark():
    """A dedicated session with the connector jar on the classpath
    (the shared test session can't add jars after start)."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("bq-smoke")
        .config("spark.jars", os.environ["SPARK_BQ_JAR"])
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_bq_write_replace_append_roundtrip(bq_spark):
    """The reference call shape end-to-end: write_table(df, dataset.tbl,
    fmt='bigquery', if_exists=replace/append) must land rows readable
    back through the connector, with replace resetting and append
    accumulating — the same semantics pandas-gbq gives the reference."""
    from etl_orders_to_bq_spark.sinks.writers import write_table

    dataset = os.environ["SPARK_BQ_DATASET"]
    table = f"{dataset}.smoke_{uuid.uuid4().hex[:8]}"
    df = bq_spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    )

    def read_back():
        return (
            bq_spark.read.format("bigquery").option("table", table).load()
        )

    # the connector needs a GCS staging bucket for the indirect write
    # path; use the direct (Storage Write API) path to avoid it
    opts = {"writeMethod": "direct"}
    write_table(df, table, fmt="bigquery", if_exists="replace", **opts)
    assert read_back().count() == 3

    write_table(df, table, fmt="bigquery", if_exists="append", **opts)
    assert read_back().count() == 6

    write_table(
        df.limit(1), table, fmt="bigquery", if_exists="replace", **opts
    )
    got = read_back().collect()
    assert len(got) == 1 and got[0]["id"] == 1

    with pytest.raises(Exception):
        write_table(df, table, fmt="bigquery", if_exists="fail", **opts)
