"""Spike reproducer: force a fixed set of suite frames in a loop and
print per-force walls with timestamps, so a parallel jcmd watchdog can
be correlated with a slow window. Diagnostics only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_orders_to_bq_spark.session import get_spark  # noqa: E402

NAMES = [
    "q3_top_revenue", "rollup_agg", "window_rank", "topk_orders",
    "dunning_llr", "capture_recapture", "spearman_corr",
    "boilerplate_lines", "hill_diversity", "perplexity_buckets",
    "q1_pricing_summary", "q18_large_orders", "q21_suppliers_waiting",
    "span_corrupt", "paragraph_quality_filter", "ransac_line",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    extra = {"spark.sql.codegen.cache.maxEntries": "16384"}
    cc = os.environ.get("SPIKE_CODE_CACHE")
    if cc:
        extra["spark.driver.extraJavaOptions"] = (
            f"-XX:ReservedCodeCacheSize={cc}"
        )
    spark = get_spark(
        app_name="spike_repro",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    frames = {n: qs[n](spark, sf_dir) for n in NAMES}
    print("JVMPID", spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid(), flush=True)
    for p in range(int(os.environ.get("SPIKE_PASSES", "8"))):
        for n in NAMES:
            t0 = time.perf_counter()
            force(frames[n])
            w = time.perf_counter() - t0
            print(f"{time.time():.1f} p{p} {n:26s} {w:7.2f}s", flush=True)


if __name__ == "__main__":
    main()
