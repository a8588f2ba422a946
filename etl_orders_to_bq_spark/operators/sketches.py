"""Re-aggregatable sketch rollups (DataSketches HLL / KLL / Theta).

THE production pattern for 100 TB metric serving: sketch each
partition/day ONCE at ingest, persist the (tiny, fixed-size) sketch
binaries, and answer any coarser rollup later by MERGING sketches —
never re-scanning the raw data. Spark 4 exposes the Apache DataSketches
family as native aggregates, so the whole path is JVM-side codegen:

- HLL (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`):
  approximate COUNT DISTINCT. Merging per-partition sketches yields the
  IDENTICAL register state (and therefore the identical estimate) as a
  single pass over the union — the merge is lossless with a common
  ``lg_k``; per-sketch size is 2^lg_k registers regardless of cardinality.
- KLL (`kll_sketch_agg_double` / grouped n-way `kll_merge_agg_double` /
  `kll_sketch_get_quantile_double`): approximate quantiles with a priori
  rank-error bounds, mergeable the same way (merge order can perturb the
  retained-sample state, unlike HLL's max-register merge).
- Theta (`theta_sketch_agg` / `theta_sketch_estimate`): distinct-count
  sketches supporting set algebra across sketches.

The estimates are engine-specific, so the registry gates them with
BOUNDED-ERROR oracles (exact counts/quantile windows computed cross-
engine, estimate-within-published-error pinned as a boolean) plus the
merge-consistency property tests (tests/test_dedup_ops.py).

No counterpart in the reference engine (SURVEY.md §2.2 "aggregations"
absence family — the reference computes nothing approximate;
reference etl/orders_etl.py has only pandas groupby aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Fine-grained rollup: one HLL sketch binary per group.

    This is the frame to PERSIST (partitioned by the group columns):
    each sketch is <= 2^lg_k bytes however many distinct values it saw,
    and any coarser grouping is answerable from it via ``hll_merge``
    without touching the raw table again.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch"),
        F.count("*").alias("n_rows"),
    )


def hll_merge(
    rollup: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Merge persisted sketches up to a coarser grouping and estimate.

    Register-wise max union: associative, commutative, idempotent — the
    merged estimate equals a fresh single-pass sketch of the union, so
    late-arriving partitions can be folded in at any time.
    """
    return rollup.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(
            "approx_distinct"
        ),
        F.sum("n_rows").alias("n_rows"),
    )


def kll_quantile_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """One KLL(double) quantile sketch per group (persist-and-merge
    companion to ``hll_rollup`` for latency/size percentile serving)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("kll_sketch"),
    )


def kll_quantiles(
    rollup: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Merge KLL sketches to a coarser grouping and read off quantiles
    (one ``q_<pct>`` column per requested quantile).

    Uses the native grouped n-way merge AGGREGATE
    (``kll_merge_agg_double``) — map-side combinable like any Spark
    aggregate, so at scale each executor folds its local sketches
    before the shuffle and only one fixed-size binary per (group,
    mapper) crosses the wire. (The earlier collect_list + in-row fold
    formulation shipped every finer-bucket sketch to one reducer; the
    two-sketch scalar ``kll_sketch_merge_double`` remains available for
    pairwise in-row use.)"""
    merged = rollup.groupBy(*group_cols).agg(
        F.kll_merge_agg_double(sketch_col).alias("__kll"),
    )
    def _qname(q: float) -> str:
        # q_50, q_95, q_99_9 — keep the full precision so sub-percent
        # quantiles (p99.9 vs p99) never collide into one column name
        pct = ("%g" % (q * 100)).replace(".", "_")
        return f"q_{pct}"

    cols = [
        F.kll_sketch_get_quantile_double("__kll", F.lit(q)).alias(_qname(q))
        for q in quantiles
    ]
    return merged.select(*group_cols, *cols)


def theta_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Theta-sketch distinct estimate per group (the sketch family to
    reach for when downstream needs set algebra across sketches)."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_estimate(F.theta_sketch_agg(value_col)).alias(
            "approx_distinct"
        ),
        F.count("*").alias("n_rows"),
    )


_INT_MASK = 0xFFFFFFFF
_LONG_MASK = 0xFFFFFFFFFFFFFFFF


def _i32(v: int) -> int:
    """Wrap to Java int (signed 32-bit) semantics."""
    v &= _INT_MASK
    return v - (1 << 32) if v >= (1 << 31) else v


def _i64(v: int) -> int:
    """Wrap to Java long (signed 64-bit) semantics."""
    v &= _LONG_MASK
    return v - (1 << 64) if v >= (1 << 63) else v


def _rotl32(v: int, n: int) -> int:
    v &= _INT_MASK
    return ((v << n) | (v >> (32 - n))) & _INT_MASK


def _spark_murmur3_bytes(data: bytes, seed: int) -> int:
    """Spark's Murmur3_x86_32.hashUnsafeBytes over a byte array
    (sql/catalyst Murmur3_x86_32.java — intentionally NOT standard
    murmur3: the 4-byte-aligned prefix hashes by little-endian int,
    then each TAIL byte is sign-extended and fully mixed as its own
    word). Returns a signed Java int."""
    h1 = seed & _INT_MASK
    aligned = len(data) - len(data) % 4
    for off in range(0, aligned, 4):
        k1 = int.from_bytes(data[off : off + 4], "little")
        k1 = (k1 * 0xCC9E2D51) & _INT_MASK
        k1 = _rotl32(k1, 15)
        k1 = (k1 * 0x1B873593) & _INT_MASK
        h1 = _rotl32(h1 ^ k1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _INT_MASK
    for off in range(aligned, len(data)):
        b = data[off]
        k1 = b - 256 if b >= 128 else b  # Java byte sign-extension
        k1 = (k1 * 0xCC9E2D51) & _INT_MASK
        k1 = _rotl32(k1, 15)
        k1 = (k1 * 0x1B873593) & _INT_MASK
        h1 = _rotl32(h1 ^ k1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _INT_MASK
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _INT_MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _INT_MASK
    h1 ^= h1 >> 16
    return _i32(h1)


class CountMinSketchBytes:
    """Pure-Python reader for Spark's serialized CountMinSketch (the
    bytes the ``count_min_sketch`` SQL aggregate returns).

    Parses the public V1 wire format written by
    ``org.apache.spark.util.sketch.CountMinSketchImpl.writeTo`` —
    big-endian: int version(=1), long totalCount, int depth, int
    width, long hashA[depth], long table[depth][width] — and
    replicates its two probe paths bit-for-bit:

    - longs: ``hash = hashA[i] * item; hash += hash >> 32;
      hash &= (2^31 - 1); bucket = (int) hash % width`` (Java
      overflow/arithmetic-shift semantics);
    - strings/binary: Spark-variant murmur3 double hashing,
      ``abs((h1 + i * h2) % width)`` with Java int wraparound.

    Why: probing through ``spark._jvm`` is a private py4j bridge that
    breaks under Spark Connect and costs a JVM round-trip per key;
    this reader runs anywhere the bytes do (pytest asserts parity
    against the JVM readback when a classic session is available).
    """

    _PRIME_MODULUS = (1 << 31) - 1

    def __init__(self, raw: bytes):
        import struct

        ver, self.total_count, self.depth, self.width = (
            struct.unpack_from(">iqii", raw, 0)
        )
        if ver != 1:
            raise ValueError(f"unsupported CountMinSketch version {ver}")
        off = 20
        self.hash_a = list(
            struct.unpack_from(f">{self.depth}q", raw, off)
        )
        off += self.depth * 8
        n = self.depth * self.width
        flat = struct.unpack_from(f">{n}q", raw, off)
        self.table = [
            flat[i * self.width : (i + 1) * self.width]
            for i in range(self.depth)
        ]

    def _buckets_long(self, item: int) -> list[int]:
        out = []
        for a in self.hash_a:
            h = _i64(a * item)
            h = _i64(h + (h >> 32))
            h &= self._PRIME_MODULUS
            out.append(h % self.width)
        return out

    def _buckets_binary(self, data: bytes) -> list[int]:
        h1 = _spark_murmur3_bytes(data, 0)
        h2 = _spark_murmur3_bytes(data, h1 & _INT_MASK)
        out = []
        for i in range(self.depth):
            v = _i32(h1 + i * h2)
            # Java % keeps the dividend's sign; Math.abs then flips it
            r = v % self.width if v >= 0 else -((-v) % self.width)
            out.append(abs(r))
        return out

    def estimate(self, item) -> int:
        """Point-frequency estimate, dispatching exactly like
        ``CountMinSketch.estimateCount``: str -> UTF-8 binary path,
        bytes -> binary path, int/bool -> long path."""
        if isinstance(item, str):
            buckets = self._buckets_binary(item.encode("utf-8"))
        elif isinstance(item, (bytes, bytearray)):
            buckets = self._buckets_binary(bytes(item))
        elif isinstance(item, (int, bool)):
            buckets = self._buckets_long(int(item))
        else:
            raise TypeError(f"unsupported key type {type(item)}")
        return min(
            self.table[i][b] for i, b in enumerate(buckets)
        )


def countmin_check(
    df: "DataFrame",
    value_col: str,
    eps: float = 0.005,
    confidence: float = 0.99,
    seed: int = 42,
    max_keys: int = 100_000,
    top_keys: int | None = None,
) -> "DataFrame":
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005,
    public literature; Spark's built-in ``count_min_sketch``
    aggregate) verified against exact counts — the bounded-error gate
    shape (``heavy_hitters``, ``ann_ivf_topk``): the sketch estimate
    itself is engine-specific, its PUBLISHED CONTRACT is not. Returns
    one row per key: ``(key, exact_n, never_undercounts,
    eps_bound_ok)`` where

    - ``never_undercounts``: estimate >= exact — CM's deterministic
      guarantee (hash collisions only ADD); any false row is a broken
      sketch;
    - ``eps_bound_ok``: the NUMBER of keys whose estimate exceeds
      exact + ceil(eps*N) stays within the confidence slack
      (2x the expected miss count) — a distribution-level flag
      repeated on every row so the oracle can pin it true.

    Plan: one map-side-combinable exact groupBy + ONE sketch
    aggregate over the same scan; point queries evaluate driver-side
    on the (KB-sized) sketch over the collected key domain — the
    sketch-serving pattern. ``max_keys`` bounds that collect
    (limit-probe first, the graph-operator discipline): this gate
    shape is for BOUNDED key domains; at 100 TB query only the keys
    you care about against the broadcast sketch bytes.
    """
    import math

    # null keys are excluded up front: the sketch aggregate skips
    # nulls anyway, and CountMinSketch.estimateCount(null) NPEs
    df = df.filter(F.col(value_col).isNotNull())
    exact = df.groupBy(F.col(value_col).alias("key")).agg(
        F.count("*").alias("exact_n")
    )
    probe = exact.limit(max_keys + 1).collect()
    if len(probe) > max_keys:
        raise ValueError(
            f"key domain exceeds max_keys={max_keys}; countmin_check "
            "is for bounded domains — query specific keys instead"
        )
    raw = df.agg(
        F.count_min_sketch(
            value_col, F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(seed),
        ).alias("s")
    ).first()["s"]
    spark = df.sparkSession
    # pure-Python readback of the public V1 wire format — no private
    # spark._jvm bridge (Connect-safe) and no per-key py4j round-trip
    cms = CountMinSketchBytes(bytes(raw))
    n_total = sum(r["exact_n"] for r in probe)
    slack = math.ceil(eps * n_total)
    if top_keys is not None:
        probe = sorted(
            probe, key=lambda r: (-r["exact_n"], r["key"])
        )[:top_keys]
    rows = []
    violations = 0
    for r in probe:
        est = cms.estimate(r["key"])
        if est > r["exact_n"] + slack:
            violations += 1
        rows.append((r["key"], r["exact_n"], est >= r["exact_n"]))
    allowed = max(5, math.ceil(2 * (1 - confidence) * len(probe)))
    bound_ok = violations <= allowed
    from pyspark.sql import types as T

    # key keeps the INPUT column's type (the semdedup grouped-schema
    # rule: never silently coerce ids/keys to string)
    schema = T.StructType(
        [
            T.StructField("key", df.schema[value_col].dataType, True),
            T.StructField("exact_n", T.LongType(), False),
            T.StructField("never_undercounts", T.BooleanType(), False),
        ]
    )
    out = spark.createDataFrame(rows, schema)
    return out.withColumn("eps_bound_ok", F.lit(bound_ok))
