"""Source-format roundtrips: JSONL (with corrupt-record quarantine),
ORC, and text. Widens the reference's CSV-only surface
(etl/orders_etl.py:72-75) to the formats a lake actually holds."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from etl_orders_to_bq_spark.sources import (
    read_jsonl,
    read_orc,
    read_text,
    read_xml,
    register_synthetic_docs,
)


def test_jsonl_explicit_schema_and_corrupt_capture(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "amount": 10.5, "tag": "a"}\n'
        '{"id": 2, "amount": 20.0, "tag": "b"}\n'
        "this line is not json at all\n"
        '{"id": "not_a_number", "amount": 1.0, "tag": "c"}\n'
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("amount", DoubleType()),
            StructField("tag", StringType()),
        ]
    )
    df = read_jsonl(spark, str(p), schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 2  # malformed line + type-mismatched record
    assert {r["id"] for r in good.collect()} == {1, 2}
    # quarantined raw lines are preserved verbatim for repair
    raws = [r["_corrupt_record"] for r in bad.collect()]
    assert any("not json at all" in r for r in raws)
    df.unpersist()


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    src = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"), F.rand(42).alias("v")
    )
    path = str(tmp_path / "t.orc")
    src.write.orc(path)
    back = read_orc(spark, path).filter(F.col("grp") == 3).select("id", "grp")
    assert back.count() == src.filter(F.col("id") % 7 == 3).count()
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "OrcScan" in plan or "orc" in plan.lower()


def test_text_source_line_per_row(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("first line\nsecond line\n\nfourth line\n")
    df = read_text(spark, str(p))
    assert df.columns == ["value"]
    assert df.count() == 4  # empty line is a row, not dropped
    tokens = df.select(
        F.explode(F.split(F.trim("value"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    assert tokens.count() == 6


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Appending files with an evolved schema (new column) must read
    back as one unified schema under mergeSchema — old rows null-fill.
    At 100 TB schema evolution is routine; rewriting history is not."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    v1.write.parquet(path)
    v2 = spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None  # pre-evolution rows null-fill
    assert rows[3]["score"] == 9.5


def test_nanos_parquet_read_restores_conf_and_normalizes(spark, tmp_path):
    """Reading a genuine TIMESTAMP(NANOS) fixture must (1) hand back a
    usable frame with the ts column normalized to session-tz
    TimestampType, and (2) leave NO trace of the nanosAsLong legacy
    conf on the shared session — a leaked conf makes later unrelated
    parquet reads order-dependent (an INT64(NANOS) column elsewhere
    silently arriving as long instead of erroring)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_orders_to_bq_spark.sources.parquet import read_table

    sf_dir = str(tmp_path)
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [1700000000_000000001, 1700000360_000000002, 1700000720_500000003],
                pa.timestamp("ns"),
            ),
        }
    )
    # version 2.6 keeps INT64(NANOS) instead of coercing to micros
    pq.write_table(table, f"{sf_dir}/events.parquet", version="2.6")

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(conf_key, None)
    df = read_table(spark, sf_dir, "events")
    assert spark.conf.get(conf_key, None) == prev, "legacy conf leaked"

    assert isinstance(df.schema["ts"].dataType, TimestampType)
    rows = df.orderBy("event_id").collect()
    assert len(rows) == 3
    # nanos truncate toward micros (matching DuckDB's read behavior)
    assert rows[2]["ts"].microsecond == 500000
    # the frame must stay executable on a fresh action after restore
    assert df.filter(F.col("event_id") > 1).count() == 2

    # and a subsequent read of a DIFFERENT nanos file without the
    # normalizing reader must fail loudly (no silent long column)
    import pytest as _pytest

    with _pytest.raises(Exception, match="(?i)parquet|nanos|INT64"):
        spark.read.parquet(f"{sf_dir}/events.parquet").collect()


def test_bigquery_mode_and_option_mapping(spark, monkeypatch):
    """The BigQuery dispatch (reference etl/bq_client.py:20-32) can't run
    without the connector jar, so assert the writer wiring instead:
    if_exists replace/append/fail must map to Spark save modes
    overwrite/append/errorifexists, options must pass through, and the
    target must land in the table option."""
    from pyspark.sql.readwriter import DataFrameWriter

    from etl_orders_to_bq_spark.sinks.writers import write_table

    calls = {}

    def fake_format(self, source):
        calls["format"] = source
        return self

    def fake_save(self, path=None, **kw):
        calls["saved"] = True

    real_mode = DataFrameWriter.mode
    real_option = DataFrameWriter.option

    def spy_mode(self, saveMode):
        calls["mode"] = saveMode
        return real_mode(self, saveMode)

    def spy_option(self, key, value):
        calls.setdefault("options", {})[key] = value
        return real_option(self, key, value)

    monkeypatch.setattr(DataFrameWriter, "format", fake_format)
    monkeypatch.setattr(DataFrameWriter, "save", fake_save)
    monkeypatch.setattr(DataFrameWriter, "mode", spy_mode)
    monkeypatch.setattr(DataFrameWriter, "option", spy_option)

    df = spark.range(3)
    for if_exists, want_mode in [
        ("replace", "overwrite"),
        ("append", "append"),
        ("fail", "errorifexists"),
    ]:
        calls.clear()
        write_table(
            df, "dataset.orders_products", fmt="bigquery",
            if_exists=if_exists, writeMethod="direct",
        )
        assert calls["mode"] == want_mode
        assert calls["format"] == "bigquery"
        assert calls["options"]["table"] == "dataset.orders_products"
        assert calls["options"]["writeMethod"] == "direct"
        assert calls["saved"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="if_exists"):
        write_table(df, "t", fmt="bigquery", if_exists="upsert")


def test_xml_file_source_with_explicit_schema(spark, tmp_path):
    (tmp_path / "orders.xml").write_text(
        "<orders>"
        "<order><id>1</id><status>O</status><total>10.5</total></order>"
        "<order><id>2</id><status>F</status><total>20.0</total></order>"
        "</orders>"
    )
    df = read_xml(
        spark, str(tmp_path), row_tag="order",
        schema="id BIGINT, status STRING, total DOUBLE",
    )
    rows = {r["id"]: (r["status"], r["total"]) for r in df.collect()}
    assert rows == {1: ("O", 10.5), 2: ("F", 20.0)}


def test_python_datasource_partitions_and_values(spark):
    register_synthetic_docs(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", "100")
        .option("partitions", "4")
        .load()
    )
    # partitions() is the parallelism contract: 4 ranges -> 4 tasks
    assert df.rdd.getNumPartitions() == 4
    got = df.orderBy("doc_id").limit(8).collect()
    for i, r in enumerate(got):
        assert r["doc_id"] == i
        assert r["source"] == f"src{i % 20}"
        assert r["n_tokens"] == 1 + i % 7
        assert r["text"] == " ".join([f"w{i % 3}"] * (1 + i % 7))
    assert df.count() == 100
    # registration is idempotent per session
    register_synthetic_docs(spark)


def test_pyjsonl_writer_two_phase_commit(spark, tmp_path):
    from etl_orders_to_bq_spark.sources import register_pyjsonl

    register_pyjsonl(spark)
    out = str(tmp_path / "out")
    df = spark.range(0, 20, 1, 4).selectExpr(
        "id", "concat('u', id % 3) as user"
    )
    df.write.format("pyjsonl").mode("append").save(out)
    # one staged-then-published file per partition + job-level _SUCCESS
    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    assert "_staging" not in files  # staging dir cleaned at commit
    assert sum(f.endswith(".jsonl") for f in files) == 4
    back = spark.read.json(out)
    assert back.count() == 20
    assert {r["user"] for r in back.select("user").distinct().collect()} == {
        "u0", "u1", "u2"
    }

    # overwrite clears previously published files, not just appends
    df.limit(5).repartition(1).write.format("pyjsonl").mode(
        "overwrite"
    ).save(out)
    assert spark.read.json(out).count() == 5


def test_python_datasource_stream_incremental_batches(spark, tmp_path):
    """The streaming half of the Python data source must deliver the
    corpus INCREMENTALLY — multiple micro-batches, offset-managed —
    and the drained total must equal the batch read."""
    import time

    from pyspark.sql import functions as F

    register_synthetic_docs(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("rows", "1000")
        .option("rows_per_batch", "300")  # -> 4 micro-batches
        .option("partitions", "4")
        .load()
    )
    agg = stream.agg(
        F.count("*").alias("n"), F.sum("n_tokens").alias("sum_tokens")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("pysrc_incr")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            row = spark.table("pysrc_incr").first()
            if row is not None and row["n"] == 1000:
                break
            time.sleep(0.5)
        row = spark.table("pysrc_incr").first()
        assert row["n"] == 1000
        batches = {p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0}
        assert len(batches) >= 2, f"expected multi-batch drain, got {batches}"
    finally:
        q.stop()
    expected = (
        spark.read.format("synthetic_docs").option("rows", "1000").load()
        .agg(F.sum("n_tokens")).first()[0]
    )
    assert row["sum_tokens"] == expected


def test_python_datasource_arrow_path_identical(spark):
    """The RecordBatch fast path must return exactly the rows of the
    tuple path."""
    register_synthetic_docs(spark)

    def rows(arrow):
        df = (
            spark.read.format("synthetic_docs")
            .option("rows", "999")
            .option("partitions", "4")
            .option("arrow", arrow)
            .load()
        )
        return sorted(tuple(r) for r in df.collect())

    a, b = rows("true"), rows("false")
    assert a == b and len(a) == 999
