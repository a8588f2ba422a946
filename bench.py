"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the `noop` sink — full plan execution
(scan → shuffle → agg) without driver-side collection, so the number
measures the engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: covers the ETL path (cast/repair, dedup, join), the
# relational core (agg, window, topk), and the scale extensions
# (minhash, ann, text). Names match queries() in __spark_entry__.py.
HEADLINE = [
    "o2_cast_repair",
    "o4_dedup_first",
    "o6_clean_name",
    "o7_left_join",
    "o11_similarity",
    "q1_pricing_summary",
    "q3_top_revenue",
    "window_rank",
    "rollup_agg",
    "topk_orders",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_simhash",
    "text_quality",
    "text_language_id",
    "ann_cosine_topk",
    "embedding_neighbors",
    "events_window",
    "sessionize",
    "asof_join",
    "window_frames",
    "q7_nation_volume",
    "q18_large_orders",
    "q21_suppliers_waiting",
    "pagerank",
    "corpus_pipeline",
    # round-4 curation additions (each heavy enough to track)
    "span_dedup",
    "dedup_embedding",
    "semdedup",
    "entity_resolution",
    # round-4 analytics additions (linear ops over the big fixtures)
    "simhash_hamming",
    "skipgram_pairs",
    "attribution",
    "interval_merge",
]

# Iterative queries run driver-side rounds (with checkpoints) while the
# DataFrame is CONSTRUCTED, so the timer must wrap construction + force
# and rebuild per run — forcing a prebuilt frame would time only the
# final projection over already-materialized checkpoint blocks.
ITERATIVE = {
    "pagerank",
    "corpus_pipeline",
    # CC rounds + the staged SemDeDup assignment run at construction
    "entity_resolution",
    "semdedup",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entry
    from etl_orders_to_bq_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup on the smallest fixture (not counted)
    force(qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        rebuild = name in ITERATIVE
        df = None if rebuild else qs[name](spark, sf_dir)
        best = float("inf")
        for _ in range(2):  # best-of-2: shields against host noise
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir) if rebuild else df)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # end-to-end reference-parity pipeline (CSV scan -> repair -> dedup
    # -> clean -> broadcast join -> parquet sink) on the reference data;
    # the reference's own pandas run of the same work is the
    # single-node baseline this must match or beat
    import shutil
    import tempfile

    from etl_orders_to_bq_spark.pipeline import OrdersEtl

    out_dir = tempfile.mkdtemp(prefix="bench_pipeline_")
    try:
        etl = OrdersEtl(
            spark,
            "/root/reference/input_data/orders_s.csv",
            "/root/reference/input_data/products_s.csv",
            table_name=f"{out_dir}/out",
        )
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            etl.process()
            etl.write(if_exists="replace")
            best = min(best, time.perf_counter() - t0)
        timings["orders_pipeline_e2e"] = round(best, 3)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    # dedup at production parameters (128 hashes, 16 bands — the demo
    # gate queries use 4/2): asserts the signature+banding cost stays
    # linear and the bucket-size guard holds at real LSH settings.
    # Reported SEPARATELY from the headline total (it's a stress probe,
    # not a headline query): md5 = the oracle-portable path, xxhash64 =
    # the production fast path.
    from etl_orders_to_bq_spark.operators.dedup import minhash_lsh_candidates
    from etl_orders_to_bq_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents").repartition(int(cpus))
    # warm the Python/Arrow worker pool before timing the numpy path:
    # md5/xxhash64 are pure-Column (no Python workers), so without this
    # the numpy number charges daemon startup to the operator (~2.5s
    # observed cold vs ~0.9s warm at sf0.1)
    force(
        minhash_lsh_candidates(
            docs, text_col="text", id_col="doc_id",
            num_hashes=8, bands=2, hash_fn="numpy",
        )
    )
    stress: dict[str, float] = {}
    for fn in ("md5", "xxhash64", "numpy"):
        best = float("inf")
        for _ in range(2):
            # rebuild per run: the operator checkpoints signatures, so
            # re-forcing one frame would time the cache, not the work
            prod = minhash_lsh_candidates(
                docs, text_col="text", id_col="doc_id",
                num_hashes=128, bands=16, hash_fn=fn,
            )
            t0 = time.perf_counter()
            force(prod)
            best = min(best, time.perf_counter() - t0)
        stress[f"dedup_minhash_lsh_128x16_{fn}"] = round(best, 3)

    # k-core peel stress: the registry's fixed k=93 does ZERO peel
    # rounds on the much denser sf0.1 graph (min degree is far above
    # it), so the iterative path is timed here with a DATA-DEPENDENT k
    # (p75 of degrees) that guarantees real peeling at this fixture
    from pyspark.sql import functions as F

    from etl_orders_to_bq_spark.operators.graph import kcore

    kli = read_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 1000).alias("src"),
        (F.col("l_partkey") % 1000).alias("dst"),
    )
    kdeg = (
        kli.select("src", "dst")
        .unionByName(kli.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.count("*").alias("d"))
    )
    k75 = int(kdeg.agg(F.percentile_approx("d", 0.75)).first()[0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        force(kcore(kli, k=k75))
        best = min(best, time.perf_counter() - t0)
    stress["kcore_peel_p75"] = round(best, 3)

    # skew stress: one hot key carrying 90% of sf0.1 lineitem, so the
    # SCALING.md skew-mitigation claims are tracked numbers, not prose.
    # Three join configs isolate each mitigation: the naive plan (AQE
    # skew split off), manual salting (operators/skew.py) under the
    # same handicap, and AQE's automatic skew-join split. Broadcast is
    # disabled throughout — a broadcastable dim would dodge the skew
    # entirely, and the helpers exist for the broadcast-INELIGIBLE
    # case. The agg pair documents that map-side partial aggregation
    # already absorbs algebraic hot-key aggs (salting is for the
    # non-combinable shapes).
    from pyspark.sql import functions as F

    from etl_orders_to_bq_spark.operators.skew import salted_agg, salted_left_join

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    skewed = li.withColumn(
        "k",
        F.when(F.rand(seed=7) < 0.9, F.lit(0).cast("long")).otherwise(
            (F.rand(seed=11) * 1000).cast("long")
        ),
    ).localCheckpoint(eager=True)
    dim = (
        spark.range(1000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("grp"))
        .localCheckpoint(eager=True)
    )

    def timed_best2(build) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(build())
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    conf = spark.conf
    prev_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        stress["skew_join_hotkey_naive"] = timed_best2(
            lambda: skewed.join(dim, "k", "left")
        )
        stress["skew_join_hotkey_salted"] = timed_best2(
            lambda: salted_left_join(skewed, dim, "k", buckets=16)
        )
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        stress["skew_join_hotkey_aqe_split"] = timed_best2(
            lambda: skewed.join(dim, "k", "left")
        )
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
    stress["skew_agg_hotkey_direct"] = timed_best2(
        lambda: skewed.groupBy("k").agg(
            F.sum("l_extendedprice").alias("s"),
            F.count("l_orderkey").alias("n"),
        )
    )
    stress["skew_agg_hotkey_salted"] = timed_best2(
        lambda: salted_agg(
            skewed, ["k"], {"l_extendedprice": "sum", "l_orderkey": "count"}
        )
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "stress": stress,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
