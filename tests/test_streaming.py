"""Structured Streaming tests: file-source micro-batches into a memory
sink, and batch/streaming plan equivalence for the shared transforms."""

import shutil

import pytest
from pyspark.sql import functions as F

from etl_orders_to_bq_spark.sources.parquet import read_table
from etl_orders_to_bq_spark.streaming import (
    read_event_stream,
    sessionize_events,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-write the events fixture as 4 parquet files (4 micro-batches),
    with micro-second timestamps so the stream source can read them."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(path, ignore_errors=True)
    read_table(spark, SF, "events").repartition(4).write.mode("overwrite").parquet(
        path
    )
    return path


def test_windowed_counts_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_event_counts(batch).collect()
    }

    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got == expected


def test_sessionize_stream_runs_and_bounds_sessions(spark, events_dir):
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=2)
    q = (
        sessionize_events(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sessions").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
    # batch equivalence
    batch_rows = sessionize_events(spark.read.parquet(events_dir)).collect()
    assert len(batch_rows) == len(rows)


def test_late_data_outside_watermark_dropped(spark, tmp_path):
    """Append mode + watermark: a window only emits once the watermark
    passes it; data later than the watermark is dropped."""
    import time

    src = str(tmp_path / "late_src")
    out_name = "late_out"
    df1 = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", 10, "click", 1.0, "{}"),
         (2, "2024-01-01 02:00:00", 10, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=10)
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"select * from {out_name}").collect()
    # the 00:00 window is final (watermark @ 01:50); the 02:00 window is
    # still open, so append mode emits only the closed one
    starts = {str(r["window_start"]) for r in rows}
    assert "2024-01-01 00:00:00" in starts
    assert "2024-01-01 02:00:00" not in starts


def test_stateful_running_totals_across_batches(spark, events_dir):
    """applyInPandasWithState: totals must accumulate across
    micro-batches and match the batch groupBy."""
    from etl_orders_to_bq_spark.streaming import running_user_totals

    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per user per touched batch; the LAST
    # emission per user carries the final cumulative totals
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.sql(
            """select user_id, n_events, sum_value from (
                 select *, row_number() over (partition by user_id
                                              order by n_events desc) rn
                 from user_totals) where rn = 1"""
        ).collect()
    }
    batch = spark.read.parquet(events_dir)
    expected = {
        r["user_id"]: (r["n"], r["s"])
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert got == expected


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Restarting a checkpointed file-sink query must process ONLY new
    input — no duplicates, no loss (exactly-once for file sinks)."""
    from etl_orders_to_bq_spark.streaming import (
        read_event_stream,
        stream_to_parquet,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    ev = read_table(spark, SF, "events")
    first, second = ev.randomSplit([0.5, 0.5], seed=7)
    first.coalesce(1).write.mode("append").parquet(src)

    q1 = stream_to_parquet(
        read_event_stream(spark, src).select("event_id", "ts", "value"),
        dst,
        ckpt,
    )
    q1.awaitTermination(120)
    n1 = spark.read.parquet(dst).count()
    assert n1 == first.count()

    # new data arrives while the query is DOWN; restart from checkpoint
    second.coalesce(1).write.mode("append").parquet(src)
    q2 = stream_to_parquet(
        read_event_stream(spark, src).select("event_id", "ts", "value"),
        dst,
        ckpt,
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(dst)
    assert out.count() == ev.count()  # no loss
    assert out.select("event_id").distinct().count() == ev.count()  # no dupes


def test_foreach_batch_receives_batches(spark, tmp_path):
    from etl_orders_to_bq_spark.streaming import (
        foreach_batch_writer,
        read_event_stream,
    )

    src = str(tmp_path / "fb_src")
    read_table(spark, SF, "events").repartition(3).write.mode("append").parquet(src)
    seen: list[tuple[int, int]] = []

    def collect_batch(bdf, bid):
        seen.append((bid, bdf.count()))

    q = foreach_batch_writer(
        read_event_stream(spark, src, max_files_per_trigger=1),
        collect_batch,
        str(tmp_path / "fb_ckpt"),
    )
    q.awaitTermination(120)
    assert len(seen) == 3  # one call per micro-batch (3 files)
    assert sum(n for _, n in seen) == 1000
    assert [b for b, _ in seen] == [0, 1, 2]  # monotonically numbered


def test_stream_static_join(spark, events_dir):
    """Stream-static join: streaming events enriched with a static dim
    (the dim is re-read per micro-batch; no watermark needed)."""
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=2)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue"), ("signup", "growth"), ("error", "ops")],
        "event_type string, category string",
    )
    enriched = stream.join(dim, "event_type").groupBy("category").count()
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["category"]: r["count"] for r in spark.sql("select * from enriched").collect()}
    batch = spark.read.parquet(events_dir).join(dim, "event_type").groupBy("category").count()
    expected = {r["category"]: r["count"] for r in batch.collect()}
    assert got == expected


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids across micro-batches must be dropped."""
    from etl_orders_to_bq_spark.streaming.events import dedup_event_stream

    src = str(tmp_path / "dup_src")
    ev = read_table(spark, SF, "events").limit(200)
    ev.coalesce(1).write.mode("append").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # exact duplicates

    q = (
        dedup_event_stream(read_event_stream(spark, src, max_files_per_trigger=1))
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from dedup_stream")
    assert out.count() == 200  # 400 in, dupes dropped
    assert out.select("event_id").distinct().count() == 200


def test_stream_stream_join(spark, tmp_path):
    """Stream-stream time-range join must equal the batch join."""
    from etl_orders_to_bq_spark.streaming.events import correlate_streams

    src = str(tmp_path / "ss_src")
    ev = read_table(spark, SF, "events")
    ev.repartition(2).write.mode("append").parquet(src)

    def split(df):
        clicks = df.filter(F.col("event_type") == "click")
        purchases = df.filter(F.col("event_type") == "purchase")
        return clicks, purchases

    # batch expectation
    bc, bp = split(spark.read.parquet(src))
    expected = correlate_streams(bc, bp).count()
    assert expected > 0

    sc_, sp_ = split(read_event_stream(spark, src, max_files_per_trigger=1))
    q = (
        correlate_streams(sc_, sp_)
        .writeStream.format("memory")
        .queryName("funnel")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select count(*) n from funnel").first()["n"]
    assert got == expected


def test_stateful_streaming_on_rocksdb_state_store(spark, events_dir):
    """The production state-store backend: at 100 TB-scale streaming
    state (millions of keys x sessions), the default HDFS-backed
    in-memory provider OOMs executors; RocksDB keeps state on local
    disk with incremental (changelog) checkpointing. The same stateful
    query must produce identical results under RocksDB."""
    from etl_orders_to_bq_spark.streaming import running_user_totals

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
        q = (
            running_user_totals(stream)
            .writeStream.format("memory")
            .queryName("user_totals_rocks")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.sql(
            """select user_id, n_events, sum_value from (
                 select *, row_number() over (partition by user_id
                                              order by n_events desc) rn
                 from user_totals_rocks) where rn = 1"""
        ).collect()
    }
    batch = spark.read.parquet(events_dir)
    expected = {
        r["user_id"]: (r["n"], r["s"])
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert got == expected


def _cdc_stream(spark, src):
    return (
        spark.readStream.schema("k long, op string, seq long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_stream_merge_upsert_final_state(spark, tmp_path):
    from etl_orders_to_bq_spark.streaming.merge import (
        read_merged_table,
        stream_merge_upsert,
    )

    src = str(tmp_path / "cdc_src")
    f1 = spark.createDataFrame(
        [(1, "I", 1, 10.0), (2, "I", 2, 20.0)],
        "k long, op string, seq long, v double",
    )
    f2 = spark.createDataFrame(
        # delete of 2 (seq 6) beats its older update (seq 4) whether
        # they land in the same or different micro-batches
        [(1, "U", 5, 11.0), (2, "D", 6, None), (2, "U", 4, 21.0),
         (3, "I", 3, 30.0)],
        "k long, op string, seq long, v double",
    )
    f1.coalesce(1).write.mode("append").parquet(src)
    f2.coalesce(1).write.mode("append").parquet(src)

    root = str(tmp_path / "merge_root")
    q = stream_merge_upsert(
        _cdc_stream(spark, src), root, str(tmp_path / "ck1"), ["k"]
    )
    q.awaitTermination(120)
    state = {
        r["k"]: (r["seq"], r["v"])
        for r in read_merged_table(spark, root).collect()
    }
    assert state == {1: (5, 11.0), 3: (3, 30.0)}  # 2 tombstoned


def test_stream_merge_upsert_replay_is_idempotent(spark, tmp_path):
    from etl_orders_to_bq_spark.streaming.merge import (
        read_merged_table,
        stream_merge_upsert,
    )

    src = str(tmp_path / "cdc_src2")
    for batch in (
        [(1, "I", 1, 1.0), (2, "I", 2, 2.0)],
        [(1, "U", 3, 1.5), (2, "D", 4, None)],
    ):
        spark.createDataFrame(
            batch, "k long, op string, seq long, v double"
        ).coalesce(1).write.mode("append").parquet(src)

    root = str(tmp_path / "merge_root2")
    q = stream_merge_upsert(
        _cdc_stream(spark, src), root, str(tmp_path / "ck_a"), ["k"]
    )
    q.awaitTermination(120)
    first = sorted(read_merged_table(spark, root).collect())

    # replay EVERYTHING with a fresh checkpoint into the same root —
    # every micro-batch rewrites its own version dir; the state must
    # come out identical (the crash-replay idempotence contract)
    q2 = stream_merge_upsert(
        _cdc_stream(spark, src), root, str(tmp_path / "ck_b"), ["k"]
    )
    q2.awaitTermination(120)
    second = sorted(read_merged_table(spark, root).collect())
    assert first == second == [(1, 3, 1.5)]


def test_transform_with_state_backend_gate(spark, events_dir):
    """running_user_totals_tws is the transformWithStateInPandas twin
    of the applyInPandasWithState operator. Its runner needs protobuf
    (absent in this container): without it the operator must fail
    FAST with an actionable message, never a mid-query worker error;
    with it, the real backend runs and must reproduce the
    applyInPandasWithState totals. Both branches of the gate are
    exercised — which one depends on the environment, no skip."""
    from etl_orders_to_bq_spark.streaming.stateful import (
        running_user_totals,
        running_user_totals_tws,
    )

    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False

    events = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    if not has_protobuf:
        with pytest.raises(RuntimeError, match="protobuf"):
            running_user_totals_tws(events)
        # the timer-backed eviction path gates identically
        with pytest.raises(RuntimeError, match="protobuf"):
            running_user_totals_tws(events, timeout_minutes=5)
        return

    name = "tws_totals"
    q = (
        running_user_totals_tws(events)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits per touched batch; totals are monotone in
    # n_events, so the final cumulative row is the arg-max per user
    final_sql = (
        "select user_id, n_events, sum_value from ("
        " select *, row_number() over (partition by user_id"
        " order by n_events desc) rn from {t}) where rn = 1"
    )
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.sql(final_sql.format(t=name)).collect()
    }
    name2 = "apws_totals"
    q2 = (
        running_user_totals(
            read_event_stream(spark, events_dir, max_files_per_trigger=1)
        )
        .writeStream.format("memory")
        .queryName(name2)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    want = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.sql(final_sql.format(t=name2)).collect()
    }
    assert got == want
