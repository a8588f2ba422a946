"""Attribution probe for the suite's 32-core anti-scaling (r14).

Replays a bench-shaped workload (heavy headline entries, interleaved
passes, same session config as bench.py) while sampling driver-JVM
health counters through JMX after every query:

- JIT: total compilation time, code-cache pool usage/max (three
  CodeHeap pools on JDK 17), compiles disabled?
- GC: collection count/time per collector
- codegen: CodegenMetrics source-compile count/time

Usage:
    python scripts/jit_probe.py [n_queries] [passes]

Prints a per-query line and a final summary; pure diagnostics, no
engine behavior touched.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = int(sys.argv[1]) if len(sys.argv) > 1 else 40
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CODE_CACHE = sys.argv[3] if len(sys.argv) > 3 else None

import __spark_entry__ as entry  # noqa: E402
from etl_orders_to_bq_spark.session import get_spark  # noqa: E402


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    comp = mf.getCompilationMXBean()
    out = {
        "jit_ms": comp.getTotalCompilationTime(),
        "gc": {},
        "pools": {},
    }
    gcs = mf.getGarbageCollectorMXBeans()
    for i in range(gcs.size()):
        g = gcs.get(i)
        out["gc"][g.getName()] = {
            "count": g.getCollectionCount(),
            "ms": g.getCollectionTime(),
        }
    pools = mf.getMemoryPoolMXBeans()
    for i in range(pools.size()):
        p = pools.get(i)
        name = p.getName()
        if "CodeHeap" in name or "Metaspace" in name:
            u = p.getUsage()
            out["pools"][name] = {
                "used_mb": round(u.getUsed() / 1048576, 1),
                "max_mb": round(u.getMax() / 1048576, 1),
            }
    # Spark's own codegen compile metrics (source -> class via janino)
    try:
        cm = jvm.org.apache.spark.metrics.source.CodegenMetrics
        out["janino_compiles"] = (
            cm.METRIC_SOURCE_CODE_SIZE().getCount()
        )
        out["janino_compile_ms"] = (
            cm.METRIC_COMPILATION_TIME().getSnapshot().getMean()
        )
    except Exception:
        pass
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    extra = {"spark.sql.codegen.cache.maxEntries": "16384"}
    if CODE_CACHE:
        extra["spark.driver.extraJavaOptions"] = (
            f"-XX:ReservedCodeCacheSize={CODE_CACHE}"
        )
    spark = get_spark(
        app_name="jit_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    import bench

    names = [n for n in bench.HEADLINE if n in qs][:N_QUERIES]
    # always end each pass with the two sentinels we are attributing
    for sentinel in ("phash_neardup", "ransac_line"):
        if sentinel in names:
            names.remove(sentinel)
        names.append(sentinel)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))
    base = jvm_stats(spark)
    print("BASE", json.dumps(base))

    frames: dict[str, object] = {}
    for p in range(PASSES):
        for name in names:
            t0 = time.perf_counter()
            if name in bench.ITERATIVE or name in bench.CTOR_TIMED:
                force(qs[name](spark, sf_dir))
            else:
                if name not in frames:
                    frames[name] = qs[name](spark, sf_dir)
                force(frames[name])
            wall = time.perf_counter() - t0
            s = jvm_stats(spark)
            tot_gc = sum(g["ms"] for g in s["gc"].values())
            cc_used = sum(
                v["used_mb"]
                for k, v in s["pools"].items()
                if "CodeHeap" in k
            )
            cc_max = sum(
                v["max_mb"]
                for k, v in s["pools"].items()
                if "CodeHeap" in k
            )
            print(
                f"p{p} {name:28s} {wall:7.2f}s jit={s['jit_ms']/1000:7.1f}s "
                f"gc={tot_gc/1000:6.1f}s cc={cc_used:.0f}/{cc_max:.0f}MB "
                f"janino={s.get('janino_compiles', '?')}",
                flush=True,
            )
    print("FINAL", json.dumps(jvm_stats(spark)))


if __name__ == "__main__":
    main()
