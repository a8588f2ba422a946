"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator from SURVEY.md §2 (plus
the scale-extension operators) to a (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` carries the DuckDB-runnable ANSI-SQL
equivalent used by the driver's t2 correctness gate.

Conventions (so the driver's sorted-column value-hash matches):
- every computed column is aliased identically on both sides;
- every accumulated double (sum) is rounded to 2 dp, every ratio/avg
  to 4-6 dp, absorbing cross-engine/partition-order float jitter;
- top-k queries always carry a unique tie-break column on the ROUNDED
  score so the selected row set is deterministic on both engines.
"""

from __future__ import annotations

import atexit
import math

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from etl_orders_to_bq_spark.sources.parquet import read_table

    return read_table(spark, sf_dir, name)


def _spread_if_underpartitioned(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition ONLY when the scan yields fewer splits than cores.

    Single-file local fixtures arrive as one input split, which would
    serialize CPU-heavy projections (shingling, simhash votes) onto one
    core; at real scale the input has many splits and an unconditional
    repartition would be a gratuitous full shuffle of the corpus — so
    the exchange is gated on the actual split count and the registry
    plan is the plan you'd ship."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# entry: flagship query (smoke check at sf0.001)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue rollup by region x market segment.

    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with broadcast dims;
    demonstrates scan pruning, broadcast joins, and a partial-agg
    pipeline — the plan shape the whole engine is built around.
    """
    li = _t(spark, SF_SMOKE, "lineitem")
    orders = _t(spark, SF_SMOKE, "orders")
    cust = _t(spark, SF_SMOKE, "customer")
    nation = _t(spark, SF_SMOKE, "nation")
    region = _t(spark, SF_SMOKE, "region")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "c_mktsegment")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# reference-parity operators (SURVEY.md §2.1) over the fixture tables
# ---------------------------------------------------------------------------


def q_o2_cast_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: regex repair (decimal comma, non-digit strip) then cast.

    Fixture parquet is clean, so dirty strings are synthesized
    deterministically (comma-ize o_totalprice, letter-suffix o_orderkey)
    and repaired back — the repair expressions are the ones under test.
    """
    from etl_orders_to_bq_spark.functions.repair import (
        repair_decimal_comma,
        strip_non_digits,
    )

    o = _t(spark, sf_dir, "orders")
    dirty_sum = F.regexp_replace(F.col("o_totalprice").cast("string"), r"\.", ",")
    dirty_id = F.concat(F.col("o_orderkey").cast("string"), F.lit("x7"))
    return o.select(
        F.col("o_orderkey"),
        repair_decimal_comma(dirty_sum).cast("double").alias("sum_repaired"),
        strip_non_digits(dirty_id).cast("long").alias("id_repaired"),
    )


def q_o4_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/O5: first-occurrence dedup on (l_orderkey, l_partkey), ordered
    by l_linenumber (the explicit ingest-order column at scale)."""
    from etl_orders_to_bq_spark.operators.dedup import first_occurrence_dedup

    li = _t(spark, sf_dir, "lineitem")
    # l_linenumber alone is not a total order in the fixture (7 exact
    # ties at sf0.01) — extend with value columns so the kept row is
    # deterministic on any engine.
    return first_occurrence_dedup(
        li,
        ["l_orderkey", "l_partkey"],
        ["l_linenumber", "l_quantity", "l_extendedprice", "l_suppkey"],
    ).select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")


def q_o6_clean_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: the reference's name-cleaning function (pure-Column variant —
    the html-unescape pandas UDF path is locked by golden unit tests)."""
    from etl_orders_to_bq_spark.functions.names import clean_name

    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey"), clean_name("c_name", unescape=False).alias("cleaned_name")
    )


def q_o6_clean_name_unescape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 with the html-unescape path live (reference
    etl/orders_etl.py:187 ``df_column.apply(html.unescape)``): names are
    synthesized with the entity set observed in the reference corpus
    (``&#039;`` etc.), unescaped by the Arrow pandas UDF, then cleaned
    by the same Column chain. The oracle expresses the closed entity set
    as a replace chain (``&amp;`` last, mirroring html.unescape's
    single pass), so the UDF path itself is hash-checked."""
    from etl_orders_to_bq_spark.functions.names import clean_name

    c = _t(spark, sf_dir, "customer")
    entity_name = F.concat(
        F.col("c_name"), F.lit("&#039;s &amp; &quot;Co&lt;x&gt;")
    )
    return c.select(
        F.col("c_custkey"),
        clean_name(entity_name, unescape=True).alias("cleaned_name"),
    )


def q_o7_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7: broadcast left equi-join with probe-side misses -> nulls
    (dim filtered to acctbal > 0 to create misses, as in the reference's
    orders-with-unknown-product rows)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return o.join(broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment"
    )


def q_o11_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9-O11: point-lookup target + weighted attribute similarity as
    pure column math (reference weight-swap preserved), over `part`."""
    from etl_orders_to_bq_spark.operators.similarity import similar_products

    p = _t(spark, sf_dir, "part")
    return similar_products(
        p,
        target_id=1,
        candidate_ids=None,
        id_col="p_partkey",
        price_col="p_retailprice",
        group_col="p_brand",
        manufacturer_col="p_type",
    ).select(F.col("p_partkey"), F.col("score"))


# ---------------------------------------------------------------------------
# core relational coverage (SURVEY.md §2.2 categories, Spark builtins)
# ---------------------------------------------------------------------------


def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style grouped aggregation with partial (map-side) aggs."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def q_q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + agg + deterministic top-10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: top-3 orders per customer by totalprice."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup (grouping sets) over returnflag x linestatus."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no order above 400k."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one URGENT order."""
    c = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: high-value customers EXCEPT BUILDING segment."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    high = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return high.distinct().exceptAll(building.distinct())


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + limit (TakeOrderedAndProject): global top-5 orders."""
    o = _t(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(5).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_date_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions + agg: daily event counts per type."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions: extract props.k, aggregate per event type."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators (documents / embeddings)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint (hash-groupBy, min-id rep)."""
    from etl_orders_to_bq_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").select("doc_id", "lang", "n_chars")


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus refresh: a NEW batch (odd doc ids) deduped
    within itself AND against the persisted fingerprint side table of
    the EXISTING corpus (even ids) — the corpus text is never
    re-scanned, only its 32-byte fingerprints join. One small-batch
    shuffle + one anti join; at 100 TB the seen table is
    fingerprint-bucketed so the anti join co-locates."""
    from etl_orders_to_bq_spark.functions.text import doc_fingerprint
    from etl_orders_to_bq_spark.operators.dedup import incremental_exact_dedup

    d = _t(spark, sf_dir, "documents")
    existing = d.filter(F.col("doc_id") % 2 == 0)
    new_batch = d.filter(F.col("doc_id") % 2 == 1)
    seen = existing.select(
        doc_fingerprint("text").alias("fingerprint")
    ).distinct()
    return incremental_exact_dedup(new_batch, seen, "text", "doc_id").select(
        "doc_id", "lang", "n_chars"
    )


def q_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-refresh CAPSTONE: an arriving batch (odd doc ids)
    against an existing corpus (even ids) end-to-end — (1) exact
    incremental dedup vs the corpus fingerprint table, (2) LSH banding
    vs the corpus band table, (3) n-gram Jaccard verification of only
    the banded candidates, (4) keep batch docs with no verified corpus
    near-dup. Only the batch is fingerprinted/signed; corpus text is
    touched ONLY for docs that banded with a candidate (semi-filtered
    inside ngram_jaccard_pairs) — the at-scale contract of continuous
    corpus ingestion."""
    from etl_orders_to_bq_spark.operators.dedup import (
        incremental_exact_dedup,
        incremental_lsh_matches,
        minhash_band_keys,
        ngram_jaccard_pairs,
    )
    from etl_orders_to_bq_spark.functions.text import doc_fingerprint

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)

    seen = corpus.select(doc_fingerprint("text").alias("fingerprint")).distinct()
    exact_surv = incremental_exact_dedup(batch, seen, "text", "doc_id")

    corpus_bands = minhash_band_keys(corpus, num_hashes=4, bands=2)
    matches = incremental_lsh_matches(
        exact_surv, corpus_bands, num_hashes=4, bands=2
    )
    cands = matches.select(
        F.col("new_id").alias("id_a"), F.col("corpus_id").alias("id_b")
    )
    docs_all = exact_surv.select("doc_id", "text").unionByName(
        corpus.select("doc_id", "text")
    )
    near_dup = (
        ngram_jaccard_pairs(cands, docs_all, n=3, threshold=0.8)
        .select(F.col("id_a").alias("doc_id"))
        .distinct()
    )
    return exact_surv.join(near_dup, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


def q_dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (4 hashes over word 3-gram shingles)."""
    from etl_orders_to_bq_spark.operators.dedup import minhash_signature

    d = _spread_if_underpartitioned(spark, _t(spark, sf_dir, "documents"))
    return minhash_signature(d, "text", num_hashes=4, shingle_len=3).select(
        "doc_id", "mh_0", "mh_1", "mh_2", "mh_3"
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish subword estimate."""
    from etl_orders_to_bq_spark.functions.text import bpe_ish_token_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_subwords"),
    )


def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword-hit argmax)."""
    from etl_orders_to_bq_spark.functions.text import language_id

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", language_id("text").alias("lang_pred"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality score (stopword/alpha/length heuristic)."""
    from etl_orders_to_bq_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text)."""
    from etl_orders_to_bq_spark.functions.text import doc_fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF through the SQL lateral surface: one document row
    fans out to one row per '.'-separated sentence (original part
    index kept, empty parts skipped) — the user-defined-table-function
    extension point, driver-gated against a lateral-unnest oracle."""
    from etl_orders_to_bq_spark.functions.udf import (
        register_table_function,
        table_udf,
    )

    @table_udf("doc_id bigint, sent_idx int, sentence string")
    class SplitSentences:
        def eval(self, doc_id, text):
            if text is None:
                return
            for i, part in enumerate(text.split(".")):
                s = part.strip()
                if s:
                    yield (doc_id, i, s)

    register_table_function(spark, "split_sentences_gate", SplitSentences)
    _t(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        "select s.doc_id, s.sent_idx, s.sentence "
        "from __udtf_docs, lateral split_sentences_gate(doc_id, text) s"
    )


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log application: updates (seq 2), deletes (seq 3, winning
    over earlier updates on the same key), inserts (seq 1) — last op
    per key wins, then one merge join."""
    from etl_orders_to_bq_spark.operators.merge import apply_cdc

    t = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    upd = t.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", "c_name",
        F.round(F.col("c_acctbal") + 50, 2).alias("c_acctbal"),
        F.lit("U").alias("op"), F.lit(2).alias("seq"),
    )
    dels = t.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey", "c_name", "c_acctbal",
        F.lit("D").alias("op"), F.lit(3).alias("seq"),
    )
    ins = t.filter(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW_"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
    )
    changes = upd.unionByName(dels).unionByName(ins)
    out = apply_cdc(t, changes, keys=["c_custkey"])
    return out.withColumn("c_acctbal", F.round("c_acctbal", 2))


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation: merge(agg(base), agg(delta)) must equal
    agg(base ∪ delta) — the maintain-without-rescan primitive."""
    from etl_orders_to_bq_spark.operators.merge import merge_aggregates

    o = _t(spark, sf_dir, "orders")
    def part(df):
        return df.groupBy("o_orderpriority").agg(
            F.sum("o_totalprice").alias("sum_price"),
            F.count("*").alias("n_orders"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )

    base = part(o.filter(F.year("o_orderdate") < 1997))
    delta = part(o.filter(F.year("o_orderdate") >= 1997))
    merged = merge_aggregates(
        base, delta, ["o_orderpriority"],
        sum_cols=["sum_price"], count_cols=["n_orders"],
        min_cols=["first_order"], max_cols=["last_order"],
    )
    return merged.withColumn("sum_price", F.round("sum_price", 2))


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (entity resolution): part names with one
    character deleted must re-match their originals within edit
    distance 1 via the (first char, length-bucket neighborhood)
    equi-join — candidates-then-verify, never cartesian."""
    from etl_orders_to_bq_spark.operators.fuzzy import fuzzy_join

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    corrupted = p.filter(F.col("p_partkey") % 5 == 0).select(
        (F.col("p_partkey") + 1000000).alias("c_key"),
        F.concat(
            F.substring("p_name", 1, 3), F.expr("substr(p_name, 5)")
        ).alias("c_name"),
    )
    return fuzzy_join(corrupted, p, "c_name", "p_name", max_dist=1).select(
        "c_key", "p_partkey", "c_name", "p_name", "edit_dist"
    )


def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style robust fingerprints (4 smallest hashes of char
    8-grams — stable under small edits), exploded to scalar rows.
    Normalized text is staged behind an exchange (which also spreads
    the single-file fixture across cores) so the per-gram lambda sees
    an attribute, not the normalization expression — inline, the regex
    re-runs once per gram (measured ~50x slower)."""
    from etl_orders_to_bq_spark.functions.text import (
        normalize_text,
        rolling_fingerprints,
    )

    d = _t(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", normalize_text("text").alias("__nt")
    ).repartition(spark.sparkContext.defaultParallelism)
    fps = staged.select(
        "doc_id",
        rolling_fingerprints("__nt", k=8, keep=4, pre_normalized=True).alias(
            "fp"
        ),
    )
    return fps.select(
        "doc_id", F.posexplode("fp").alias("fp_idx", "fp_hash")
    )


def q_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 1-hour windows every 15 minutes —
    each event lands in exactly 4 windows; the overlap factor is the
    shuffle-volume cost of sliding windows at scale."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


def _inbasket_pairs(parts_col: str = "parts") -> "F.Column":
    """Ordered in-basket pairs from a SORTED array column: for each
    element x at index i, pair it with every later element — the
    no-fact-self-join combinator shared by basket_pairs,
    item_similarity, and assoc_rules (one definition, three gates)."""
    parts = F.col(parts_col)
    return F.flatten(
        F.transform(
            parts,
            lambda x, i: F.transform(
                F.slice(parts, i + F.lit(2), F.size(parts)),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top 20 part pairs appearing in the
    same order. Parts are collected per order (bounded by a basket-size
    guard, same combinatorial bound as LSH max_bucket) and pairs are
    generated in-basket with array combinators — one groupBy, no
    self-join of the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter((F.size("parts") >= 2) & (F.size("parts") <= 20))
    )
    pair_arrays = _inbasket_pairs("parts")
    pairs = baskets.select(F.explode(pair_arrays).alias("p")).select(
        "p.part_a", "p.part_b"
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


def q_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering similarity: cosine-normalized
    co-occurrence (co / sqrt(n_a * n_b)) over the same guarded basket
    set as basket_pairs — normalization turns raw co-counts into the
    classic item-CF score so popular parts stop dominating. Per-item
    basket counts broadcast onto the pair table; min co-count 3 prunes
    noise before ranking. No fact self-join anywhere."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter((F.size("parts") >= 2) & (F.size("parts") <= 20))
    )
    pair_arrays = _inbasket_pairs("parts")
    co = (
        baskets.select(F.explode(pair_arrays).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("co"))
        .filter(F.col("co") >= 3)
    )
    item_n = (
        baskets.select(F.explode("parts").alias("part"))
        .groupBy("part")
        .agg(F.count("*").alias("n"))
    )
    na = item_n.select(F.col("part").alias("part_a"), F.col("n").alias("n_a"))
    nb = item_n.select(F.col("part").alias("part_b"), F.col("n").alias("n_b"))
    sim = F.round(
        F.col("co") / F.sqrt(F.col("n_a").cast("double") * F.col("n_b")), 6
    )
    return (
        co.join(broadcast(na), "part_a")
        .join(broadcast(nb), "part_b")
        .select("part_a", "part_b", "co", sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 history: each order event
    picks the dimension version valid AT its as-of instant
    (valid_from <= t < valid_to) — the feature-store join that
    prevents label leakage. Equi-join on the key + range predicate,
    so the dimension side shuffles once on the key."""
    hist = q_scd2_history(spark, sf_dir)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.to_timestamp(
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                (F.col("o_orderkey") % 60).cast("int"),
            )
        ).alias("asof_ts"),
    )
    j = o.join(
        hist,
        (o.o_custkey == hist.c_custkey)
        & (F.col("asof_ts") >= F.col("valid_from"))
        & (F.col("asof_ts") < F.col("valid_to")),
        "inner",
    )
    return j.select("o_orderkey", "o_custkey", "c_acctbal", "asof_ts")


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (class prototypes / IVF seeding):
    posexplode to (label, dim, value), one partial-aggregated groupBy —
    vector aggregation without ever materializing vectors driver-side."""
    e = _t(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        )
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg("v"), 6).alias("centroid_v"),
        F.count("*").alias("n_vectors"),
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 embedding."""
    from etl_orders_to_bq_spark.operators.ann import ann_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return ann_topk_bruteforce(emb, list(target["embedding"]), k=10)


def _docs_with_planted_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ copy of the first 10 docs (shifted ids) — gives the
    near-dup operators deterministic positives to find."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    planted = d.filter(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    # single-file fixture arrives as one split; the downstream shingle/
    # hash projections are the CPU cost, so spread them across cores
    # (real multi-split inputs need no explicit exchange)
    return d.unionByName(planted).repartition(
        spark.sparkContext.defaultParallelism
    )


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH banding: candidate near-dup pairs (4 hashes, 2 bands).
    Planted exact dups must collide in every band."""
    from etl_orders_to_bq_spark.operators.dedup import minhash_lsh_candidates

    d = _docs_with_planted_dups(spark, sf_dir)
    return minhash_lsh_candidates(
        d, text_col="text", id_col="doc_id", num_hashes=4, bands=2, shingle_len=3
    )


def q_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup candidates: a new batch (odd doc ids) is
    signed and banded, then joined against the persisted band table of
    the existing corpus (even ids) — the corpus is never re-signed.
    Pairs sharing any LSH band bucket go on to Jaccard verification
    (see ngram_jaccard); the oracle reproduces the identical md5-minima
    band keys in SQL and joins odd-side vs even-side."""
    from etl_orders_to_bq_spark.operators.dedup import (
        incremental_lsh_matches,
        minhash_band_keys,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    new_batch = d.filter(F.col("doc_id") % 2 == 1)
    corpus_bands = minhash_band_keys(
        corpus, text_col="text", id_col="doc_id", num_hashes=4, bands=2
    )
    return incremental_lsh_matches(
        new_batch, corpus_bands, text_col="text", id_col="doc_id",
        num_hashes=4, bands=2,
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit) per document."""
    from etl_orders_to_bq_spark.operators.dedup import simhash

    d = _spread_if_underpartitioned(spark, _t(spark, sf_dir, "documents"))
    return simhash(d, "text", bits=16).select("doc_id", "simhash")


def q_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs by Hamming distance <= 3 over a 32-bit
    hash, found via pigeonhole blocking (operators/dedup.py::
    simhash_hamming_pairs): 4 contiguous 8-bit blocks — any pair within
    distance 3 agrees exactly on >= 1 block, so candidates come from an
    equi-join on (block_index, block_value), never all-pairs; the
    bit_count(xor) verify is a projection over candidates. Positives:
    the first 10 docs re-planted with a short appended tail — long docs
    flip only the bit positions whose vote margin was thin. The oracle
    replays hash, blocking, and verify with DuckDB's >>/&/xor/
    bit_count."""
    from etl_orders_to_bq_spark.operators.dedup import simhash_hamming_pairs

    d = _t(spark, sf_dir, "documents")
    planted = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate tail")).alias("text"),
    )
    docs2 = d.select("doc_id", "text").unionByName(planted)
    docs2 = _spread_if_underpartitioned(spark, docs2)
    return simhash_hamming_pairs(
        docs2, text_col="text", id_col="doc_id", bits=32, max_dist=3
    ).orderBy("id_a", "id_b")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard verification over MinHash-LSH candidate pairs;
    only the planted duplicates clear the 0.8 threshold. Candidates
    come from LSH banding (bounded buckets), so the whole chain is
    linear in candidates — no all-pairs stage anywhere."""
    from etl_orders_to_bq_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _docs_with_planted_dups(spark, sf_dir)
    cands = minhash_lsh_candidates(
        d, text_col="text", id_col="doc_id", num_hashes=4, bands=2, shingle_len=3
    )
    return ngram_jaccard_pairs(cands, d, n=3, threshold=0.8)


def q_embedding_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup scan: top-20 most similar pairs within
    each LSH bucket. The bucket (sign pattern of random-hyperplane
    projections) is the blocking key — bucket population is bounded by
    construction (~n/2^bits in expectation, content-hash distributed),
    unlike a categorical label where one popular value is a cartesian
    bomb at scale. More bits => smaller buckets; bits=6 keeps the
    expected in-bucket join quadratic term 16x smaller than bits=4 (the
    round-2 setting that cost 1.72x wall at sf0.1)."""
    from etl_orders_to_bq_spark.functions.vectors import dot, l2_norm
    from etl_orders_to_bq_spark.operators.ann import with_lsh_bucket

    e = _t(spark, sf_dir, "embeddings")
    # norms and buckets are computed ONCE per row before the pair join
    # (O(n) array traversals instead of O(pairs)); repartition ONLY when
    # the source is under-split (the single-file fixture) — a
    # well-partitioned production table must not eat an extra full
    # shuffle of the embeddings here
    par = spark.sparkContext.defaultParallelism
    if e.rdd.getNumPartitions() < par:
        e = e.repartition(par)
    e = with_lsh_bucket(e, dim=64, bits=6).select(
        "vec_id", "bucket", "embedding", l2_norm("embedding").alias("norm")
    )
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("bucket").alias("bucket_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    pairs = a.join(
        b,
        (F.col("bucket_a") == F.col("bucket_b")) & (F.col("id_a") < F.col("id_b")),
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(
                dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b")), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (30 min), batch mode."""
    from etl_orders_to_bq_spark.streaming import sessionize_events

    e = _t(spark, sf_dir, "events")
    return sessionize_events(e, gap="30 minutes")


# ---------------------------------------------------------------------------
# Streaming gate queries: the REAL Structured Streaming path (file
# source -> availableNow trigger -> memory sink), hash-checked against
# batch-equivalent oracles. The stream stages a Spark-rewritten copy of
# the events table (the fixture's nano timestamps are normalized to
# micros, and the dedup variant plants duplicate rows), then the driver
# collects the memory-sink table like any batch result.
# ---------------------------------------------------------------------------

_STREAM_STAGE_CACHE: dict = {}


def _stage_event_stream(spark: SparkSession, sf_dir: str, variant: str) -> str:
    """Write the events table into a temp dir for the file-stream source.
    ``variant="dups"`` appends an exact copy of the first 500 events
    (same event_id, same payload) — at-least-once delivery simulated."""
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir, variant)
    if key in _STREAM_STAGE_CACHE:
        return _STREAM_STAGE_CACHE[key]
    e = _t(spark, sf_dir, "events")
    if variant == "dups":
        e = e.unionByName(e.filter(F.col("event_id") < 500))
    path = tempfile.mkdtemp(prefix=f"evstream_{variant}_")
    e.coalesce(1).write.mode("overwrite").parquet(path)
    _STREAM_STAGE_CACHE[key] = path
    return path


def _stream_to_batch(sdf: DataFrame, prefix: str, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink and return the sink table."""
    import tempfile
    import uuid

    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{name}_"))
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sdf.sparkSession.table(name)


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup (dropDuplicatesWithinWatermark) over
    a stream with planted duplicate deliveries: the sink must hold each
    event exactly once == the original batch table."""
    from etl_orders_to_bq_spark.streaming.events import dedup_event_stream

    path = _stage_event_stream(spark, sf_dir, "dups")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    deduped = dedup_event_stream(stream, keys=["event_id"], watermark="1 hour")
    out = _stream_to_batch(deduped, "sdedup", "append")
    return out.select("event_id", "user_id", "event_type", "value")


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (clicks x purchases within 30 min after,
    per user) with watermark-bounded state, through the real engine."""
    from etl_orders_to_bq_spark.streaming.events import correlate_streams

    path = _stage_event_stream(spark, sf_dir, "plain")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    clicks = (
        spark.readStream.schema(schema)
        .parquet(path)
        .filter(F.col("event_type") == "click")
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(path)
        .filter(F.col("event_type") == "purchase")
    )
    joined = correlate_streams(
        clicks, purchases, key="user_id", within="30 minutes",
        watermark="10 minutes",
    )
    out = _stream_to_batch(joined, "ssjoin", "append")
    return out.select("user_id", "l_event_id", "r_event_id", "r_value")


def q_streaming_window_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts in APPEND mode: only windows
    the watermark has finalized (end <= max(ts) - 10 min) reach the
    sink — the oracle expresses exactly that filter in batch SQL."""
    from etl_orders_to_bq_spark.streaming.events import windowed_event_counts

    path = _stage_event_stream(spark, sf_dir, "plain")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    counts = windowed_event_counts(stream, window="1 hour", watermark="10 minutes")
    return _stream_to_batch(counts, "swindow", "append")


def q_streaming_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars through the real streaming engine: watermarked 1-hour
    tumbling windows with min_by/max_by INSIDE the streaming
    aggregation (open/close keyed on the deterministic (ts, event_id)
    order), append mode emitting only watermark-finalized bars — the
    streaming form of ohlc_bars, state merging incrementally across
    micro-batches instead of re-sorting ticks. The oracle computes the
    batch bars and applies the same finalization filter."""
    path = _stage_event_stream(spark, sf_dir, "plain")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    okey = F.struct(F.col("ts"), F.col("event_id"))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", okey).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count("*").alias("volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "open", "high", "low", "close", "volume",
        )
    )
    return _stream_to_batch(agg, "sohlc", "append").orderBy(
        "window_start", "event_type"
    )


def q_streaming_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cardinality serving: watermarked tumbling windows with
    approx_count_distinct (HLL++) INSIDE the streaming aggregation —
    per-window sketch state merges incrementally across micro-batches,
    the way a 100 TB/day pipeline answers distinct-users-per-hour
    without keeping user sets in state. Append mode emits only
    watermark-finalized windows. BOUNDED-ERROR oracle (same contract
    as sketch_agg): the query joins each emitted window back to the
    exact batch distinct count and reduces the HLL accuracy contract
    to a boolean; the oracle recomputes exact counts for the same
    finalized-window filter and pins the boolean true."""
    path = _stage_event_stream(spark, sf_dir, "plain")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.approx_count_distinct("user_id", 0.016).alias("__approx"),
            F.count("*").alias("n_events"),
        )
        .select(F.col("w.start").alias("w_start"), "__approx", "n_events")
    )
    out = _stream_to_batch(agg, "shll", "append")
    ev = _t(spark, sf_dir, "events")
    exact = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .select(F.col("w.start").alias("w_start"), "exact_users")
    )
    return (
        out.join(exact, "w_start")
        .select(
            "w_start",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                <= F.greatest(F.col("exact_users") * 0.05, F.lit(1.0))
            ).alias("hll_within_bound"),
        )
        .orderBy("w_start")
    )


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram (equal-count buckets) of lineitem prices —
    the optimizer-statistics / data-profiling companion to the
    equal-width histogram_bucket query — built on scalable_ntile, so
    the global total order costs a range shuffle + per-partition
    numbering instead of a single-partition window. The oracle replays
    exact SQL ntile over the same unique total order."""
    from etl_orders_to_bq_spark.operators.ranking import scalable_ntile

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price"),
    )
    order = [F.asc("price"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    tiled = scalable_ntile(li, order, 10, out_col="bucket")
    return (
        tiled.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("price"), 2).alias("lo"),
            F.round(F.max("price"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


def q_streaming_kll_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quantile serving: KLL(k=200) sketches INSIDE a
    watermarked 6-hour window aggregation — per-window sketch state
    merges across micro-batches, answering median-latency-per-window
    questions without buffering window contents. Append emits only
    finalized windows. BOUNDED-ERROR oracle on the RANK contract
    (DataSketches guarantees the returned quantile's true rank within
    the a-priori error): the sketch median's exact rank interval
    [#(v < p50)/n, #(v <= p50)/n] must intersect [0.44, 0.56] — a
    value-window check like the batch KLL gates breaks on small
    windows, where interpolated percentiles can exclude every actual
    data value. Pinned true by the oracle under the same
    finalized-window filter."""
    path = _stage_event_stream(spark, sf_dir, "plain")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.kll_sketch_get_quantile_double(
                F.kll_sketch_agg_double("value", F.lit(200)), F.lit(0.5)
            ).alias("__p50"),
            F.count("*").alias("n_events"),
        )
        .select(F.col("w.start").alias("w_start"), "__p50", "n_events")
    )
    out = _stream_to_batch(agg, "skll", "append")
    ev = _t(spark, sf_dir, "events")
    evw = ev.select(
        F.window("ts", "6 hours").alias("w"), "value"
    ).select(F.col("w.start").alias("w_start"), "value")
    ranks = (
        out.join(evw, "w_start")
        .groupBy("w_start", "n_events")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("__p50"), 1).otherwise(0)
            ).alias("__lt"),
            F.sum(
                F.when(F.col("value") <= F.col("__p50"), 1).otherwise(0)
            ).alias("__le"),
            F.count("*").alias("__n"),
        )
    )
    return ranks.select(
        "w_start",
        "n_events",
        (
            (F.col("__lt") / F.col("__n") <= 0.56)
            & (F.col("__le") / F.col("__n") >= 0.44)
        ).alias("kll_median_within_bound"),
    ).orderBy("w_start")


def _planted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings plus 20 planted near-dup copies (ids +100000): the
    copy of vec_id v has its FIRST element shifted by (v % 5) * 0.4,
    giving a deterministic cosine spread (~1.0, ~0.92, ~0.8, ~0.6,
    ~0.5 vs the original) that exercises the similarity threshold from
    both sides. The synthetic fixture's natural pairwise cosine tops
    out at ~0.51, so no un-planted pair crosses a 0.75 threshold. The
    perturbation is pure SQL-reproducible arithmetic."""
    emb = _t(spark, sf_dir, "embeddings")
    c = F.col("embedding")
    pert = F.concat(
        F.array(
            F.element_at(c, 1).cast("double")
            + (F.col("vec_id") % 5).cast("double") * F.lit(0.4)
        ),
        F.slice(c, 2, 63).cast("array<double>"),
    )
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        pert.alias("embedding"),
        "label",
    )
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    return base.unionByName(planted)


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs
    (operators/semdedup.py): deterministic hyperplane-LSH buckets ->
    within-bucket pairwise cosine >= 0.75 — the semantic twin of
    MinHash banding (blocking first, exact check on candidates only).
    Planted perturbed copies provide pairs on both sides of the
    threshold; the oracle replays bucket assignment, the bucket-size
    guard, and the 6dp-rounded cosine in SQL."""
    from etl_orders_to_bq_spark.operators.semdedup import (
        embedding_neardup_pairs,
    )

    allv = _planted_embeddings(spark, sf_dir)
    return embedding_neardup_pairs(
        allv, dim=64, threshold=0.75, bits=8, seed=42
    ).orderBy("id_a", "id_b")


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep-set (operators/semdedup.py): fixed-centroid
    clusters -> drop items with a lower-id same-cluster neighbor at
    cosine >= 0.75 — cluster-bounded semantic dedup per Abbas et al.
    2023. Fixed centroids (the ivf_search_fixed discipline) make the
    whole path oracle-reproducible: the oracle replays assignment and
    the NOT-EXISTS shadow rule in SQL."""
    from etl_orders_to_bq_spark.operators.ann import _hyperplanes
    from etl_orders_to_bq_spark.operators.semdedup import semdedup_keep

    allv = _planted_embeddings(spark, sf_dir)
    keep = semdedup_keep(
        allv, _hyperplanes(dim=64, bits=8, seed=7), threshold=0.75
    )
    return keep.orderBy("vec_id")


def q_semdedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over LEARNED k-means clusters — the production scaling
    fix documented in SCALING.md: data-oblivious hyperplane buckets
    leave dense embedding clumps in one cluster (the quadratic term),
    while k-means places centroids proportional to density and splits
    them by construction. Two deterministic Lloyd rounds (fixed seed-7
    init, 6dp-snapped means — the kmeans_lloyd contract) feed
    semdedup_keep's shadow rule. The oracle replays the ENTIRE fit
    (unrolled assignment/means CTEs) plus the NOT-IN shadow rule, so
    the composed pipeline is value-verified end-to-end."""
    from etl_orders_to_bq_spark.operators.ann import _hyperplanes, lloyd_kmeans
    from etl_orders_to_bq_spark.operators.semdedup import semdedup_keep

    # localCheckpoint: the planted frame feeds 2 Lloyd scans + the
    # keep stage's assignment — materializing once saves ~20% wall
    # (measured at sf0.1); results are identical (same rows, the fit
    # is deterministic under any partitioning of the same input).
    # Assignment kernel pinned to numpy: at this config (8 centroids x
    # 64 dims) the column expression costs ~0.5s of DRIVER-side
    # construction per assign call (512 literals) — measured r6: the
    # two kernels agree on EVERY row at sf0.01 and sf0.1 (0 diffs),
    # so the SQL-argmax oracle is unaffected.
    allv = _planted_embeddings(spark, sf_dir).localCheckpoint()
    cents, _ = lloyd_kmeans(
        allv, _hyperplanes(64, 8, seed=7), rounds=2, round_ndigits=6,
        method="numpy",
    )
    return semdedup_keep(
        allv, cents, threshold=0.75, assign_method="numpy"
    ).orderBy("vec_id")


def q_semdedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degeneracy-robust SemDeDup default (operators/semdedup.py
    semdedup_auto): k derived from the corpus (max(8, ceil(n/128)) —
    8 at the gate SFs), one probe assignment to seed-11 directions,
    Lloyd fallback only if the realized per-row pair work Σs²/n blows
    the 4×target budget. On this fixture the seeds balance (work/row
    ~67 at sf0.01, budget 512), so the oracle replays the CHEAP
    branch: seed-11 argmax assignment + the NOT-IN shadow rule at
    0.85 — and thereby value-pins the probe's branch decision too (a
    Lloyd fit would move centroids and change the keep-set)."""
    from etl_orders_to_bq_spark.operators.semdedup import semdedup_auto

    allv = _planted_embeddings(spark, sf_dir).localCheckpoint()
    return semdedup_auto(
        allv, dim=64, threshold=0.85, seed=11
    ).orderBy("vec_id")


def q_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs Jaccard join via prefix filtering
    (operators/setjoin.py, Bayardo et al. 2007): word-bigram sets,
    rarity-ordered prefixes of length |s| - ceil(t|s|) + 1, prefix-
    token equi-join candidates, exact verify at t=0.4. Unlike MinHash
    LSH this is lossless — the oracle proves it by brute-forcing ALL
    shared-token pairs (complete for J >= t > 0) and must get the
    identical pair set."""
    from etl_orders_to_bq_spark.operators.setjoin import (
        set_similarity_join,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return set_similarity_join(
        d, threshold=0.4, ngram=2
    ).orderBy("id_a", "id_b")


def q_ann_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage Matryoshka retrieval (operators/ann.py
    ann_topk_matryoshka, Kusupati et al. 2022): coarse top-40 on the
    first 16 dims, exact 64-dim rerank to top-10 — the truncated-dim
    prefilter pattern for MRL embeddings. Both stages 6dp-rounded
    with id tie-breaks; the oracle replays the identical two-stage
    pipeline with list slicing."""
    from etl_orders_to_bq_spark.operators.ann import ann_topk_matryoshka

    emb = _t(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return ann_topk_matryoshka(
        emb, list(target["embedding"]), k=10, coarse_dim=16, coarse_m=40
    )


def _daily_event_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day-number, daily count) series — the shared
    fixture for the trend/forecast operators; t is integer days since
    2020-01-01 so slopes are per-day units."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("__d")
    ).agg(F.count("*").alias("y")).select(
        "event_type",
        F.datediff(F.col("__d"), F.lit("2020-01-01").cast("date"))
        .cast("double")
        .alias("t"),
        F.col("y").cast("double").alias("y"),
    )


def q_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Theil-Sen daily trend (operators/timeseries.py
    theilsen_trend): median of all pairwise slopes over the daily
    count series — the outlier-robust slope vs regression_agg's OLS.
    Slopes 6dp-rounded; the median averages the (slope, t1, t2)-ranked
    middle pair; the oracle replays rank -> middle -> avg exactly."""
    from etl_orders_to_bq_spark.operators.timeseries import theilsen_trend

    s = _daily_event_series(spark, sf_dir)
    return theilsen_trend(s, "event_type", "t", "y").orderBy("event_type")


def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing per event type
    (operators/timeseries.py holt_linear): level+trend recurrence
    folded over the sorted daily series as EXACT integer micro-units
    (alpha=1/2, beta=3/10 rationals, floor-quantized per step —
    per-step 6dp float rounding hits midpoint ties where the engines
    disagree; measured before switching), 7-day-ahead forecast. The
    oracle folds the identical integer arithmetic with a [level,
    trend] bigint list accumulator in list_reduce."""
    from etl_orders_to_bq_spark.operators.timeseries import holt_linear

    s = _daily_event_series(spark, sf_dir)
    return holt_linear(
        s, "event_type", "t", "y", alpha=0.5, beta=0.3, horizon=7
    ).orderBy("event_type")


def q_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential p-value (operators/experiment.py
    msprt_test, Johari et al. 2017): mixture-SPRT on the click-vs-
    error mean difference with a N(0,1) effect prior — the p-value a
    platform can PEEK at continuously without inflating type-I.
    Moments are decimal-exact with one 6dp division each; the exp is
    the engine's staged Taylor-Horner kernel, replayed textually by
    the oracle (multitest._det_exp_sql)."""
    from etl_orders_to_bq_spark.operators.experiment import msprt_test

    e = _t(spark, sf_dir, "events")
    return msprt_test(e, "event_type", "value", "click", "error", tau=1.0)


def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (event_type, day)
    (operators/timeseries.py twap): each observation weighted by the
    integer seconds it remained current (lead() to the next event,
    last one to day end) — decimal-exact weighted sums, one 6dp
    division. The oracle replays the identical lead/weight/ratio."""
    from etl_orders_to_bq_spark.operators.timeseries import twap

    e = _t(spark, sf_dir, "events")
    return twap(e, "event_type", "ts", "value").orderBy(
        "event_type", "day"
    )


def q_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion) of daily event counts per
    type (operators/timeseries.py dispersion_index): var/mean of an
    arrival process — ~1 Poisson, >>1 bursty, <<1 metronomic. Exact
    integer count moments, two 6dp divisions, fdr_bh's moment
    discipline."""
    from etl_orders_to_bq_spark.operators.timeseries import (
        dispersion_index,
    )

    e = _t(spark, sf_dir, "events")
    return dispersion_index(e, "event_type", "ts").orderBy("event_type")


def q_rarity_weighted_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rarity-weighted set-similarity join (operators/setjoin.py
    rarity_weighted_jaccard): bigram sets with integer micro-weights
    floor(1e6/df) — idf's ordering without libm log, so weight sums
    stay exact longs and the whole join is order-free. The oracle
    replays weights, shared-weight sums, and the single rounded
    division."""
    from etl_orders_to_bq_spark.operators.setjoin import (
        rarity_weighted_jaccard,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return rarity_weighted_jaccard(
        d, threshold=0.2, ngram=2
    ).orderBy("id_a", "id_b")


def q_gini_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision stump / best Gini split (operators/classifier.py
    gini_stump): is n_chars predictive of lang=='en' at all — the
    one-node CART split on the two-pass cumulative-count primitive
    (no single-partition window). Exact integer counts, two rounded
    Ginis per cut, argmax on the rounded gain with smallest-threshold
    ties; the oracle replays the full gain curve."""
    from etl_orders_to_bq_spark.operators.classifier import gini_stump

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        F.col("n_chars").cast("double").alias("f"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    return gini_stump(base, "f", "y")


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift changepoint localizer per event type
    (operators/timeseries.py changepoint_level): argmax over the
    division-cleared CUSUM curve |n*S_k - k*S_n| on the daily count
    series — exact decimal integers end-to-end, ties to the smallest
    k; cusum_drift ALARMS, this LOCATES. The oracle replays the
    integer curve, the (d desc, k) argmax, and the two rounded
    segment means."""
    from etl_orders_to_bq_spark.operators.timeseries import (
        changepoint_level,
    )

    s = _daily_event_series(spark, sf_dir)
    return changepoint_level(s, "event_type", "t", "y").orderBy(
        "event_type"
    )


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters per event type (operators/timeseries.py
    holt_winters_seasonal): level + trend + 7-slot weekly seasonal
    profile over the daily count series, season = day-number % 7 (NOT
    dayofweek — engine origins differ). Same exact-integer
    micro-state discipline as holt_linear; init from the first 2m
    observations; the oracle folds a bigint[9] accumulator
    ([l, b, s0..s6]) with identical floor arithmetic."""
    from etl_orders_to_bq_spark.operators.timeseries import (
        holt_winters_seasonal,
    )

    s = _daily_event_series(spark, sf_dir).withColumn(
        "j", F.col("t").cast("int") % 7
    )
    return holt_winters_seasonal(
        s, "event_type", "t", "y", "j", m=7,
        alpha=0.5, beta=0.3, gamma=0.3,
    ).orderBy("event_type")


def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window funnel depth per user (operators/seqmine.py
    window_funnel, ClickHouse windowFunnel semantics): deepest
    view->click->purchase chain fitting inside 6 hours of its own
    first step — one in-row integer fold per user, no self-joins.
    The oracle replays the fold with a bigint-list accumulator
    (chain-start micros, -1 unset) over the identical (ts, step)
    order."""
    from etl_orders_to_bq_spark.operators.seqmine import window_funnel

    e = _t(spark, sf_dir, "events")
    return window_funnel(
        e, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], window_seconds=6 * 3600,
    ).orderBy("user_id")


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL BPE training loop, value-verified end-to-end
    (operators/lm.py learn_bpe_merges, Sennrich et al. 2016): three
    rounds of count-pairs -> take the (n desc, a, b) argmax -> greedy
    left-to-right re-merge over the VOCABULARY symbol arrays. The
    registry's bpe_pair_counts entry pins one round's statistic; this
    entry pins the ITERATION — selection ties, the sequential merge
    fold ('aaa' + (a,a) -> [aa, a]), and the re-count after each
    merge — via three unrolled oracle rounds (the kmeans_lloyd unroll
    discipline). The list-returning trainer is wrapped to a DataFrame
    at the API shim, like the reference's similarity dict."""
    from etl_orders_to_bq_spark.operators.lm import learn_bpe_merges

    d = _t(spark, sf_dir, "documents").select("text")
    merges = learn_bpe_merges(d, 3)
    rows = [
        (i + 1, a, b, int(n)) for i, (a, b, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "merge_rank int, sym_a string, sym_b string, n_pair long"
    ).orderBy("merge_rank")


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversity re-ranking
    (operators/fusion.py mmr_rerank, Carbonell & Goldstein 1998):
    three queries (vec_id 0/1/2), candidate pools vec_id % 3 == q
    (ids >= 3), rel = 6dp cosine to the query, greedy k=3 at
    lambda=0.7 with id tie-breaks. One applyInPandas over
    groupBy(query) — the greedy loop never leaves the executor; the
    oracle unrolls the 3 selection steps as CTEs."""
    from etl_orders_to_bq_spark.operators.fusion import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries_df = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__q")
    )
    cands = emb.filter(F.col("vec_id") >= 3).withColumn(
        "query_id", (F.col("vec_id") % 3).cast("long")
    )
    from etl_orders_to_bq_spark.functions.vectors import dot, l2_norm

    joined = cands.join(F.broadcast(queries_df), "query_id")
    denom = l2_norm(F.col("embedding")) * l2_norm(F.col("__q"))
    rel = F.when(
        denom > 0, F.round(dot(F.col("embedding"), F.col("__q")) / denom, 6)
    ).otherwise(F.lit(0.0))
    pool = joined.select(
        "query_id", "vec_id", "embedding", rel.alias("rel")
    )
    return mmr_rerank(
        pool, k=3, lam=0.7
    ).orderBy("query_id", "rank")


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality filter
    (operators/classifier.py): unigram+bigram features hashed to 256
    md5 buckets, one broadcast weight join, one map-side-combinable
    doc sum, sigmoid + threshold — the CCNet-shaped page scorer every
    pretraining pipeline runs. Weights are the seeded LCG stand-in
    model (inlined as literals in the oracle, the lloyd-centroid
    discipline); empty docs score sigmoid(bias) via the distinct-id
    left join."""
    from etl_orders_to_bq_spark.operators.classifier import (
        hashed_linear_score,
        seeded_weights,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return hashed_linear_score(
        d, seeded_weights(256, seed=17), bias=0.05, threshold=0.52
    ).orderBy("doc_id")


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup (operators/spans.py): 20-token spans,
    corpus-wide first-occurrence keep, document reassembly — the
    Dolma-paragraph-dedup shape. Full-text copies of docs 0-9 are
    planted (ids +200000) so cross-document span kills have real work;
    the oracle replays chunk slicing, the (doc_id, span_idx)
    first-occurrence rule, and ordered reassembly in SQL."""
    from etl_orders_to_bq_spark.operators.spans import span_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    return span_dedup(
        d.unionByName(planted), span_tokens=20
    ).orderBy("doc_id")


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval rank fusion (operators/fusion.py): BM25 top-50
    (lexical) + brute-force cosine top-50 against a fixed query vector
    (semantic), fused with Reciprocal Rank Fusion (k=60), final top-20.
    Ranks are taken over 6dp-rounded scores with id tie-breaks, so the
    oracle can replay both rankings and the 1/(60+rank) sum exactly."""
    from etl_orders_to_bq_spark.operators.ann import (
        _hyperplanes,
        ann_topk_bruteforce,
    )
    from etl_orders_to_bq_spark.operators.bm25 import bm25_scores
    from etl_orders_to_bq_spark.operators.fusion import ranked_topn, rrf_fuse

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    lex = ranked_topn(
        bm25_scores(d, ["the", "data", "query", "stream"]),
        "doc_id",
        "bm25",
        50,
    )
    query = _hyperplanes(dim=64, bits=1, seed=99)[0]
    sem = ranked_topn(
        ann_topk_bruteforce(e, query, k=50).select(
            F.col("vec_id").alias("doc_id"), "cos_sim"
        ),
        "doc_id",
        "cos_sim",
        50,
    )
    fused = rrf_fuse([lex, sem], "doc_id")
    return fused.orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    ).limit(20)


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shape data-selection weights (operators/lm.py): every
    document scored by avg log10 ratio of target-domain ('src0')
    unigram probabilities over whole-corpus probabilities, both
    Laplace-smoothed over the corpus vocabulary. The target counts
    ride the SAME word-count shuffle as the corpus counts; the oracle
    replays counts, smoothing, and the log average in SQL."""
    from etl_orders_to_bq_spark.operators.lm import importance_weights

    d = _t(spark, sf_dir, "documents")
    return importance_weights(d, F.col("source") == "src0").orderBy("doc_id")


def q_streaming_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE upsert (streaming/merge.py): a CDC stream
    (op/seq per user derived from events) drains through foreachBatch
    in FOUR micro-batches (maxFilesPerTrigger=1 over 4 range-split
    files) into a versioned parquet table with sequence-protected
    merges and delete tombstones. The final state is the global
    max-seq row per user minus deletes — independent of how the
    stream was cut into batches, which is exactly what the oracle's
    batch SQL computes."""
    import tempfile

    from etl_orders_to_bq_spark.streaming.merge import (
        read_merged_table,
        stream_merge_upsert,
    )

    cdc = _t(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_type") == "purchase", "D")
        .when(F.col("event_type") == "click", "U")
        .otherwise("I")
        .alias("op"),
        F.col("event_id").alias("seq"),
        F.round("value", 6).alias("value"),
    )
    src_dir = tempfile.mkdtemp(prefix="cdcstream_")
    cdc.repartitionByRange(4, "seq").write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(
            "user_id long, op string, seq long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    root = tempfile.mkdtemp(prefix="mergetgt_")
    q = stream_merge_upsert(
        stream, root, tempfile.mkdtemp(prefix="ckpt_mu_"), ["user_id"]
    )
    q.awaitTermination(300)
    return read_merged_table(spark, root).orderBy("user_id")


_ER_FIRST = [
    "marisol", "benedict", "okonkwo", "theodora", "ezequiel",
    "hortensia", "jeremiah", "wilhelmina", "anastasia", "bartholomew",
    "clementine", "demetrius", "evangeline", "fitzgerald", "guinevere",
    "humphrey", "isadora",
]
_ER_LAST = [
    "abernathy", "blackwood", "cavendish", "dunmore", "everhart",
    "fairbanks", "galloway", "hawthorne", "ironwood", "jellicoe",
    "kingsley", "lockhart", "montague",
]


def _synth_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity table for resolution: word-pair names derived from
    c_custkey (TPC-H's sequential "Customer#0000N" names are 1 edit
    apart — useless for fuzzy matching), plus dirty variants: ids
    +10000 drop the last character (distance 1), ids +20000 append
    'zz' (distance 2). Variants are 3 edits from EACH OTHER, so they
    cluster only transitively through their base — exercising the
    connected-components step, not just pairwise matching."""
    first = F.element_at(
        F.array(*[F.lit(w) for w in _ER_FIRST]),
        (F.col("c_custkey") % 17 + 1).cast("int"),
    )
    last = F.element_at(
        F.array(*[F.lit(w) for w in _ER_LAST]),
        ((F.col("c_custkey") * 7) % 13 + 1).cast("int"),
    )
    base = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ent_id"),
        F.concat_ws(" ", first, last).alias("name"),
    )
    v1 = base.filter(F.col("ent_id") < 30).select(
        (F.col("ent_id") + 10000).alias("ent_id"),
        F.expr("substr(name, 1, length(name) - 1)").alias("name"),
    )
    v2 = base.filter(F.col("ent_id") < 15).select(
        (F.col("ent_id") + 20000).alias("ent_id"),
        F.concat(F.col("name"), F.lit("zz")).alias("name"),
    )
    return base.unionByName(v1).unionByName(v2)


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution capstone: blocked fuzzy self-match
    (operators/fuzzy.py, levenshtein <= 2 on candidates only) ->
    connected components (operators/graph.py) -> canonical id per
    entity (min id in the cluster; unmatched entities canonicalize to
    themselves). The relational twin of the corpus dedup capstone —
    same candidates-then-verify-then-cluster shape over entity names
    instead of document shingles. The oracle replays the symmetric
    blocking condition, the edit-distance verify, and a recursive-CTE
    transitive closure."""
    from etl_orders_to_bq_spark.operators.fuzzy import fuzzy_join
    from etl_orders_to_bq_spark.operators.graph import connected_components

    ents = _synth_entities(spark, sf_dir)
    # exact-collapse BEFORE fuzzy: identical names are trivially the
    # same entity, so only one representative (min id) per distinct
    # name enters the quadratic fuzzy stage — the same discipline as
    # exact dedup before MinHash. Semantics are unchanged (identical
    # names are distance 0 and would merge anyway); at sf0.1 this cut
    # the query from 52s to ~1s because same-name groups (~68 members
    # here) no longer form quadratic in-block cliques.
    reps = ents.groupBy("name").agg(F.min("ent_id").alias("rep_id"))
    l = reps.select(
        F.col("rep_id").alias("id_a"), F.col("name").alias("name_a")
    )
    r = reps.select(
        F.col("rep_id").alias("id_b"), F.col("name").alias("name_b")
    )
    pairs = (
        fuzzy_join(l, r, "name_a", "name_b", max_dist=2)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs, "id_a", "id_b")
    canon = reps.join(comp, reps.rep_id == comp.id, "left").select(
        "name",
        F.coalesce("component", F.col("rep_id")).alias("canonical_id"),
    )
    return (
        ents.join(broadcast(canon), "name")
        .select("ent_id", "name", "canonical_id")
        .orderBy("ent_id")
    )


def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase-mining PMI (operators/lm.py): top-20 adjacent token
    pairs by pointwise mutual information, min pair count 5 — bigrams
    from a zip-with-shifted projection (no lag window), word-count
    shuffles for the statistics. The oracle replays the identical
    log-difference arithmetic in SQL."""
    from etl_orders_to_bq_spark.operators.lm import pmi_bigrams

    d = _t(spark, sf_dir, "documents")
    return (
        pmi_bigrams(d, min_count=5)
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch conversion attribution (operators/
    attribution.py): every purchase event gets the earliest and the
    latest click/view by the same user at-or-before it — computed as
    running first/last-non-null over ONE per-user ordered window (one
    shuffle), not a conversions-x-touches range join. Unattributed
    purchases keep null touches. The oracle states the semantics
    independently: a left range-join with min_by/max_by over
    (ts, event_id), so the window formulation is checked against the
    declarative definition, not a replay of itself."""
    from etl_orders_to_bq_spark.operators.attribution import (
        attribute_conversions,
    )

    e = _t(spark, sf_dir, "events")
    return (
        attribute_conversions(e)
        .select(
            "conv_id", "user_id", "first_touch_id", "first_touch_type",
            "last_touch_id", "last_touch_type",
        )
        .orderBy("conv_id")
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection (operators/quality.py::mad_outliers):
    events whose value sits more than 3 scaled-MADs from their event
    type's median — the outlier rule that survives the outliers
    themselves (mean/stddev rules don't; the heavy tail of `value`
    would inflate sigma and mask its own members). Two grouped exact
    medians + joins, all keyed on the group column. The oracle replays
    median/MAD/threshold in SQL."""
    from etl_orders_to_bq_spark.operators.quality import mad_outliers

    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return (
        mad_outliers(e, "value", "event_type", k=3.0)
        .filter(F.col("is_outlier"))
        .select("event_id", "event_type", "value", "robust_z")
        .orderBy("event_id")
    )


def _geo_coord(key: str, pos: int, span: int, offset: float):
    """Deterministic synthetic coordinate from an id column: an 8-hex
    slice of md5, modulo a milli-degree span — identical arithmetic is
    replayed in the DuckDB oracle."""
    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), pos, 8), 16, 10
    ).cast("long")
    return (h % span) / 1000.0 + offset


def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join (operators/geo.py::grid_radius_join):
    customer and supplier points (deterministic md5-derived coords in a
    [40,60)x[-10,30) degree region) paired within 100 km via
    equirectangular grid-cell blocking — build side emits one cell,
    probe side explodes its circle's bounding-box cells (latitude-aware
    longitude reach), exact haversine verify over candidates only.
    The oracle is SEMANTIC, not a replay: DuckDB brute-forces all
    pairs, so a blocking bug that drops any in-radius pair
    hash-mismatches."""
    from etl_orders_to_bq_spark.operators.geo import grid_radius_join

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        _geo_coord("c_custkey", 1, 20000, 40.0).alias("clat"),
        _geo_coord("c_custkey", 9, 40000, -10.0).alias("clon"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _geo_coord("s_suppkey", 1, 20000, 40.0).alias("slat"),
        _geo_coord("s_suppkey", 9, 40000, -10.0).alias("slon"),
    )
    return (
        grid_radius_join(
            cust, supp, 100.0, "clat", "clon", "slat", "slon"
        )
        .select("c_custkey", "s_suppkey", "dist_km")
        .orderBy("c_custkey", "s_suppkey")
    )


def q_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation audit — the header-vs-detail check
    every financial close runs: per order, the header total against
    the sum of its line extended prices, bucketed into a census
    (match within tolerance / detail-higher / header-higher /
    childless header / orphaned lines). One aggregation per side +
    one full-outer key join; the census is what ships, not 1.5M
    per-order diffs. The oracle replays the bucketing."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("line_total")
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "full_outer")
    diff = F.round(F.col("line_total") - F.col("o_totalprice"), 2)
    status = (
        F.when(F.col("o_orderkey").isNull(), "orphaned_lines")
        .when(F.col("l_orderkey").isNull(), "childless_header")
        .when(F.abs(diff) <= 0.01, "match")
        .when(diff > 0, "detail_higher")
        .otherwise("header_higher")
    )
    return (
        j.withColumn("status", status)
        .groupBy("status")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.coalesce(F.abs(diff), F.lit(0.0))), 2).alias(
                "abs_discrepancy"
            ),
        )
        .orderBy("status")
    )


def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase latency percentiles: each purchase pairs with
    the SAME user's most recent prior click (running last-non-null
    over one per-user window — the attribution trick, not a range
    join), latencies in exact integer microseconds, then p50/p90/p99
    via the exact interpolated percentile aggregate. The oracle
    states the pairing declaratively (max click ts at-or-before) and
    applies the same quantile definition."""
    e = _t(spark, sf_dir, "events")
    is_click = F.col("event_type") == "click"
    is_conv = F.col("event_type") == "purchase"
    base = e.filter(is_click | is_conv)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", is_conv.cast("int"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click_us = F.last(
        F.when(is_click, F.unix_micros("ts")), ignorenulls=True
    ).over(w)
    lat_min = (F.unix_micros("ts") - F.col("__lc")) / 60000000.0
    lats = (
        base.withColumn("__lc", last_click_us)
        .filter(is_conv & F.col("__lc").isNotNull())
        .select(lat_min.alias("lat"))
    )
    return lats.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.percentile("lat", F.lit(0.5)), 6).alias("p50_min"),
        F.round(F.percentile("lat", F.lit(0.9)), 6).alias("p90_min"),
        F.round(F.percentile("lat", F.lit(0.99)), 6).alias("p99_min"),
    )


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream (split at the median day): the model-monitoring
    drift metric PSI = sum((p_b - p_a) * ln(p_b / p_a)) over fixed
    value buckets, epsilon-smoothed so empty buckets stay finite
    (PSI > 0.2 is the standard retrain alarm). Two conditional
    bucket counts ride ONE groupBy; the bucket spine keeps zero
    buckets present. The oracle replays bucketing and formula."""
    e = _t(spark, sf_dir, "events")
    med = e.agg(F.median(F.unix_micros("ts")).alias("m"))
    bucket = F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("int")
    counts = (
        e.crossJoin(broadcast(med))
        .select(
            bucket.alias("bucket"),
            (F.unix_micros("ts") <= F.col("m")).cast("int").alias("is_a"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_a").alias("n_a"),
            F.sum(1 - F.col("is_a")).alias("n_b"),
        )
    )
    spine = spark.range(0, 10).select(F.col("id").cast("int").alias("bucket"))
    full = (
        spine.join(counts, "bucket", "left")
        .withColumn("n_a", F.coalesce("n_a", F.lit(0)))
        .withColumn("n_b", F.coalesce("n_b", F.lit(0)))
    )
    full = full.localCheckpoint(eager=False)
    tot = full.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    eps = 1e-6
    p_a = F.col("n_a") / F.col("ta") + eps
    p_b = F.col("n_b") / F.col("tb") + eps
    term = (p_b - p_a) * F.log(p_b / p_a)
    return (
        full.crossJoin(broadcast(tot))
        .select(
            "bucket", "n_a", "n_b", F.round(term, 8).alias("psi_term")
        )
        .orderBy("bucket")
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk census over quasi-identifiers (market segment,
    nation, order year): equivalence classes smaller than k=5 are
    re-identification risks a release pipeline must suppress or
    generalize. One groupBy over the joined quasi-identifier
    projection; output is the per-class-size census plus the risky
    class count — the report, not the raw risky rows (which a privacy
    report must not itself leak). The oracle replays the census."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    )
    q = o.join(broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "c_nationkey", "yr"
    )
    classes = q.groupBy("c_mktsegment", "c_nationkey", "yr").agg(
        F.count("*").alias("class_size")
    )
    return (
        classes.groupBy("class_size")
        .agg(
            F.count("*").alias("n_classes"),
            (F.max("class_size") < 5).alias("at_risk"),
        )
        .orderBy("class_size")
    )


def q_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits/token) of each source's unigram
    distribution — the vocabulary-diversity companion to source_kl:
    low entropy flags template/boilerplate farms before they skew a
    training mix. One corpus scan into a staged (source, word) count
    table; H = -sum(p log2 p) is a rollup of it. The oracle replays
    the formula."""
    from etl_orders_to_bq_spark.functions.text import (
        normalize_text,
        tokenize,
    )

    d = _spread_if_underpartitioned(spark, _t(spark, sf_dir, "documents"))
    toks = d.select(
        "source", F.explode(tokenize(normalize_text("text"))).alias("w")
    )
    per_sw = toks.groupBy("source", "w").agg(F.count("*").alias("c"))
    per_sw = per_sw.localCheckpoint(eager=False)
    totals = per_sw.groupBy("source").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t")
    return (
        per_sw.join(broadcast(totals), "source")
        .groupBy("source")
        .agg(
            F.max("t").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
        )
        .orderBy("source")
    )


def q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill maximum-likelihood estimate of the power-law exponent for
    the projection graph's degree distribution (alpha = 1 + n /
    sum(ln(d / (dmin - 0.5))), the standard Clauset-Shalizi-Newman
    continuous correction) — the one-number test of whether a graph is
    scale-free enough to need hub-aware (salted) processing. One
    degree groupBy, one 1-row aggregate. The oracle replays the
    estimator."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 1000).alias("a"),
        (F.col("l_partkey") % 1000).alias("b"),
    )
    und = (
        li.unionByName(
            li.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy("a").agg(F.count("*").alias("d"))
    dmin = deg.agg(F.min("d").alias("dmin"))
    return deg.crossJoin(broadcast(dmin)).agg(
        F.count("*").alias("n_nodes"),
        F.max("dmin").alias("d_min"),
        F.round(
            1.0
            + F.count("*")
            / F.sum(F.log(F.col("d") / (F.col("dmin") - 0.5))),
            6,
        ).alias("alpha"),
    )


def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic Lloyd k-means rounds (operators/ann.py::
    lloyd_kmeans, k=8, fixed seed-7 init — the same centroids as
    ivf_assign) over the embeddings table, reported as per-cluster
    population and centroid norm. Because init is fixed and the
    argmax tie-break is first-index, and each round's centroid
    means are snapped to 6dp (identical literals both engines — see
    lloyd_kmeans's round_ndigits note on avg's ULP drift), the ENTIRE
    fit — every assignment of every round — is replayed EXACTLY by
    the DuckDB oracle's unrolled CTEs, not merely scored. Per round: one projection
    assign + one combinable means groupBy + a k-row driver read."""
    from etl_orders_to_bq_spark.operators.ann import _hyperplanes, lloyd_kmeans

    e = _t(spark, sf_dir, "embeddings")
    cents, assigned = lloyd_kmeans(
        e, _hyperplanes(64, 8, seed=7), rounds=3, round_ndigits=6
    )
    norm_expr = None
    for j, c in enumerate(cents):
        n = sum(x * x for x in c) ** 0.5
        branch = F.when(F.col("ivf_cluster") == j, F.lit(n))
        norm_expr = branch if norm_expr is None else norm_expr.when(
            F.col("ivf_cluster") == j, F.lit(n)
        )
    return (
        assigned.groupBy("ivf_cluster")
        .agg(F.count("*").alias("n"))
        .withColumn("centroid_norm", F.round(norm_expr, 6))
        .orderBy("ivf_cluster")
    )


def q_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality + residual anomalies: daily event volumes
    decomposed against their weekday mean (the simplest seasonal-naive
    model), flagging days whose residual exceeds 2 residual-sigmas —
    the screen that catches a quiet Tuesday a raw threshold misses
    because Tuesdays are always quiet. Two tiny rollups of one daily
    aggregate; the day table is staged so its consumers share the
    scan. The oracle replays the decomposition."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    daily = daily.localCheckpoint(eager=False)
    wd = F.dayofweek("day")
    by_wd = daily.groupBy(wd.alias("weekday")).agg(
        F.avg("n").alias("wd_mean")
    )
    j = daily.withColumn("weekday", wd).join(broadcast(by_wd), "weekday")
    resid = F.col("n") - F.col("wd_mean")
    stats = j.agg(F.stddev_samp(resid).alias("rsd"))
    return (
        j.crossJoin(broadcast(stats))
        .select(
            "day",
            "weekday",
            "n",
            F.round("wd_mean", 4).alias("wd_mean"),
            F.round(resid, 4).alias("residual"),
            (F.abs(resid) > 2.0 * F.col("rsd")).alias("anomaly"),
        )
        .orderBy("day")
    )


def q_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: per nation, the smallest customer
    fraction whose (revenue-descending) cumulative share reaches 80%
    — the '80/20' readout that complements the Gini coefficient with
    an actionable cut-off. One revenue rollup, one per-nation window
    pass, one min aggregate. The oracle replays the cumulative-share
    scan."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    j = rev.join(broadcast(c), rev.o_custkey == c.c_custkey).select(
        "c_nationkey", "o_custkey", "rev"
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("rev"), F.asc("o_custkey")
    )
    wtot = Window.partitionBy("c_nationkey")
    cum = F.sum("rev").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = j.select(
        "c_nationkey",
        F.row_number().over(w).alias("rk"),
        (cum / F.sum("rev").over(wtot)).alias("cum_share"),
        F.count("*").over(wtot).alias("n_cust"),
    )
    return (
        ranked.filter(F.col("cum_share") >= 0.8)
        .groupBy("c_nationkey")
        .agg(
            F.min("rk").alias("top_customers"),
            F.max("n_cust").alias("n_customers"),
            F.round(
                F.min("rk") / F.max("n_cust").cast("double"), 6
            ).alias("pareto_fraction"),
        )
        .orderBy("c_nationkey")
    )


def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-defined scalar function (CREATE FUNCTION ... RETURN
    expr): the discounted-charge formula lives as a named, reusable,
    CATALYST-INLINED SQL UDF — unlike a Python UDF it stays inside
    whole-stage codegen, so a shared metric definition costs nothing
    at 100 TB. Used here inside an aggregate over lineitem. The
    oracle inlines the same expression."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charge("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE "
        "RETURN p * (1.0 - d) * (1.0 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(charge(l_extendedprice, l_discount, l_tax)), 2)
                 AS total_charge,
               count(*) AS n
        FROM v_lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


def q_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (|> operators): the same relational
    plan as a chained FROM ... |> WHERE ... |> AGGREGATE pipeline —
    the readability surface ANSI picked up from GoogleSQL; it
    compiles to the identical Catalyst plan as the classic form, which
    is exactly what the classic-SQL oracle checks."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        FROM v_orders
        |> WHERE o_orderstatus = 'F'
        |> EXTEND year(o_orderdate) AS yr
        |> AGGREGATE count(*) AS n,
                     round(sum(o_totalprice), 2) AS revenue
           GROUP BY o_orderpriority, yr
        |> WHERE n > 10
        |> ORDER BY o_orderpriority, yr
        """
    )


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive-CUSUM drift detection on daily per-type event volumes:
    C_t = max(0, C_{t-1} + (x_t - mean - slack)) flags sustained
    upward shifts a spike threshold misses. The reset recursion is NOT
    a running sum, but it has the classic prefix-minimum identity
    C_t = S_t - min(0, min_{i<=t} S_i) with S the plain cumsum of
    deviations — so the whole detector is two stacked windows per
    event type (cumsum, then running min), no recursion, no UDF.
    Slack = 0.5σ, alarm at 4σ (standard CUSUM tuning). The oracle
    replays the identity."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    j = daily.join(broadcast(stats), "event_type")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = F.sum(
        F.col("n") - F.col("mu") - 0.5 * F.col("sd")
    ).over(w)
    staged = j.withColumn("__s", s)
    run_min = F.min("__s").over(w)
    cusum = F.col("__s") - F.least(F.lit(0.0), run_min)
    return (
        staged.select(
            "event_type",
            "day",
            "n",
            F.round(cusum, 4).alias("cusum_pos"),
            (cusum > 4.0 * F.col("sd")).alias("drift"),
        )
        .orderBy("event_type", "day")
    )


def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment conversion rate with a Wilson 95% confidence
    interval — the binomial interval that behaves at small n and
    extreme p where the naive normal interval collapses (the reporting
    shape for per-segment KPIs). Conversion = customer placed >= 1
    urgent order (one semi-join flag via left join presence), then a
    per-segment count aggregate and the Wilson algebra as a 1-row-per-
    segment projection. The oracle replays the algebra."""
    z = 1.959964
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    flagged = c.join(
        urgent.withColumnRenamed("o_custkey", "c_custkey").withColumn(
            "__conv", F.lit(1)
        ),
        "c_custkey",
        "left",
    )
    agg = flagged.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.coalesce("__conv", F.lit(0))).alias("x"),
    )
    n, x = F.col("n").cast("double"), F.col("x").cast("double")
    p = x / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2.0 * n)) / denom
    half = (
        F.lit(z)
        * F.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
        / denom
    )
    return agg.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        F.col("x").cast("long").alias("x"),
        F.round(p, 6).alias("rate"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    ).orderBy("c_mktsegment")


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring per document — the readability
    band of a corpus-quality dashboard: 206.835 - 1.015*(words/
    sentences) - 84.6*(syllables/words), with syllables approximated
    as vowel-group runs per token (the standard hyphenation-free
    heuristic) and sentences as [.!?]+ splits. Entirely Column
    regex/array arithmetic over one scan — no Python, no shuffle
    before the final sort. The oracle replays both regex counts."""
    from etl_orders_to_bq_spark.functions.text import tokenize

    d = _t(spark, sf_dir, "documents")
    toks = tokenize(F.lower(F.col("text")))
    n_words = F.size(toks)
    n_sent = F.size(
        F.filter(
            F.split(F.col("text"), r"[.!?]+"),
            lambda s: F.trim(s) != "",
        )
    )
    n_syll = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.greatest(
            F.regexp_count(t, F.lit("[aeiouy]+")), F.lit(1)
        ),
    )
    flesch = (
        F.lit(206.835)
        - 1.015 * (n_words / F.greatest(n_sent, F.lit(1)))
        - 84.6 * (n_syll / F.greatest(n_words, F.lit(1)))
    )
    return (
        d.select(
            "doc_id",
            n_words.alias("n_words"),
            n_sent.alias("n_sentences"),
            n_syll.alias("n_syllables"),
            F.round(flesch, 4).alias("flesch"),
        )
        .filter(F.col("n_words") > 0)
        .orderBy("doc_id")
    )


def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup→purchase conversion
    time, WITH right-censoring (users who never purchase are at-risk
    until the end of observation, not dropped — dropping them is the
    classic conversion-analysis bias). Per user: first signup, first
    purchase at-or-after it; duration in minutes. At each event time
    t: d = conversions, n = users still at risk (duration >= t);
    S(t) = prod(1 - d/n) over event times <= t, computed as
    exp(running-sum(ln)) — one user-level shuffle, one tiny
    event-time table, windows over it. The oracle replays the
    estimator with SQL windows."""
    e = _t(spark, sf_dir, "events")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    pu = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    obs_end = e.agg(F.max("ts").alias("end_ts"))
    # the >= condition lives IN the join: a user whose purchases all
    # precede signup must stay as a CENSORED row, not vanish
    durs = (
        su.join(
            pu,
            (su.user_id == F.col("p_uid")) & (F.col("p_ts") >= su.s_ts),
            "left",
        )
        .groupBy("user_id", "s_ts")
        .agg(F.min("p_ts").alias("first_p"))
        .crossJoin(broadcast(obs_end))
        .select(
            # exact integer microseconds: groups identically in both
            # engines (float durations could split groups at 1-ulp)
            F.when(
                F.col("first_p").isNotNull(),
                F.unix_micros("first_p") - F.unix_micros("s_ts"),
            )
            .otherwise(F.unix_micros("end_ts") - F.unix_micros("s_ts"))
            .alias("dur"),
            F.col("first_p").isNotNull().cast("int").alias("event"),
        )
    )
    durs = durs.localCheckpoint(eager=False)
    n_total = durs.agg(F.count("*").alias("n_total"))
    per_t = durs.groupBy("dur").agg(
        F.sum("event").alias("d"), F.count("*").alias("c")
    )
    w = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = F.col("n_total") - F.coalesce(F.sum("c").over(w), F.lit(0))
    ranked = (
        per_t.crossJoin(broadcast(n_total))
        .withColumn("n_risk", at_risk)
        .filter(F.col("d") > 0)
    )
    ws = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # when every remaining at-risk user converts at one time
    # (d == n_risk) the curve drops to EXACTLY 0 — flag it instead of
    # ln(0): the log term goes null (skipped by the sum) and the flag
    # pins survival to 0 from that step on
    one_minus = 1.0 - F.col("d") / F.col("n_risk")
    term = F.log(F.when(one_minus > 0, one_minus))
    hit_zero = F.max((F.col("d") >= F.col("n_risk")).cast("int")).over(ws)
    surv = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(term).over(ws))
    )
    return ranked.select(
        F.round(F.col("dur") / 60000000.0, 2).alias("t_minutes"),
        F.col("d").cast("long").alias("d"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.round(surv, 6).alias("survival"),
    ).orderBy("t_minutes")


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit drift over order totals — the classic
    fabricated-numbers screen: observed first-digit shares vs the
    log10(1 + 1/d) law, with each digit's chi-squared contribution.
    The leading digit is extracted NUMERICALLY (floor(x / 10^floor(
    log10 x))) so no engine-specific float formatting enters the
    comparison; one map-side-combinable groupBy over the scan. (The
    fixture's uniform prices should and do FAIL Benford — the gate
    checks the statistic, not conformance.)"""
    o = _t(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    observed = o.groupBy(digit.alias("digit")).agg(F.count("*").alias("n"))
    # full 1-9 spine: a digit that NEVER occurs is the strongest
    # possible Benford violation — its (0 - E)^2/E term must appear,
    # not silently vanish with the groupBy
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    counts = spine.join(observed, "digit", "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    counts = counts.localCheckpoint(eager=False)
    total = counts.agg(F.sum("n").alias("t"))
    p = F.log10(1.0 + 1.0 / F.col("digit"))
    exp_n = F.col("t") * p
    return (
        counts.crossJoin(broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("t"), 6).alias("obs_p"),
            F.round(p, 6).alias("benford_p"),
            F.round(
                (F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core extraction (operators/graph.py::kcore, k=93) over the
    1000-node lineitem projection graph: iterative peeling of sub-k
    nodes to the maximal subgraph where everyone keeps degree >= 93
    (5 peel rounds on this fixture). Per round: one degree groupBy +
    two semi-joins, staged. The oracle unrolls the peeling into
    chained CTEs past the fixpoint depth."""
    from etl_orders_to_bq_spark.operators.graph import kcore

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 1000).alias("src"),
        (F.col("l_partkey") % 1000).alias("dst"),
    )
    return kcore(li, k=93).orderBy("node")


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content-overlap matrix: pairwise Jaccard of the
    sources' document-fingerprint sets — the contamination census run
    before mixing corpora (a high-overlap pair means one source is
    republishing another). Distinct (source, fingerprint) first
    (cardinality drop), then the self-join meets ONLY on equal
    fingerprints (never all-pairs); set sizes broadcast back for the
    |A∩B| / (|A|+|B|-|A∩B|) arithmetic. Planted overlap: docs are
    re-attributed to synthetic odd/even sources so the oracle has
    non-trivial intersections to check."""
    d = _t(spark, sf_dir, "documents")
    # synthetic re-attribution: each doc lands in 1-2 of 4 overlapping
    # pools, deterministically
    pool_a = F.concat(F.lit("pool"), (F.col("doc_id") % 4).cast("string"))
    pool_b = F.concat(
        F.lit("pool"), ((F.col("doc_id") + 1) % 4).cast("string")
    )
    fp = F.md5(F.col("text"))
    sf_ = (
        d.select(pool_a.alias("source"), fp.alias("fp"))
        .unionByName(
            d.filter(F.col("doc_id") % 3 == 0).select(
                pool_b.alias("source"), fp.alias("fp")
            )
        )
        .distinct()
    )
    sf_ = sf_.localCheckpoint(eager=False)
    sizes = sf_.groupBy("source").agg(F.count("*").alias("n"))
    a = sf_.select(F.col("source").alias("src_a"), "fp")
    b = sf_.select(F.col("source").alias("src_b"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    jac = F.round(
        F.col("n_common")
        / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        6,
    )
    return (
        inter.join(broadcast(na), "src_a")
        .join(broadcast(nb), "src_b")
        .select("src_a", "src_b", "n_common", jac.alias("jaccard"))
        .orderBy("src_a", "src_b")
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: lead() pairs each event with the user's next one (one
    window shuffle on the user key, deterministic (ts, event_id)
    order), then transition counts and row-normalized probabilities —
    the navigation-analysis / next-event-model statistic. Row totals
    come from a rollup of the (tiny) transition-count table, broadcast
    back. The oracle replays lead + normalization."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = trans.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n")
    )
    counts = counts.localCheckpoint(eager=False)
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        counts.join(broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


def q_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship (operators/merge.py::survivorship):
    three simulated source systems contribute partial customer records
    (each with different nulls and priorities); the survivor takes,
    per FIELD, the highest-priority non-null value — a fresher
    record's nulls never erase older data, which whole-row dedup gets
    wrong. One map-side-combinable groupBy (max_by on a
    (has-value, priority) rank), no window. The oracle replays the
    rank with a numeric composite key."""
    from etl_orders_to_bq_spark.operators.merge import survivorship

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    s1 = c.select(
        "c_custkey",
        F.col("c_name"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit(None)).otherwise(
            F.col("c_acctbal")
        ).alias("c_acctbal"),
        F.lit(1).alias("pri"),
    )
    s2 = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.round(F.col("c_acctbal") + 5.0, 2).alias("c_acctbal"),
        F.lit(2).alias("pri"),
    )
    s3 = c.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.concat(F.lit("S3-"), F.col("c_name")).alias("c_name"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(3).alias("pri"),
    )
    recs = s1.unionByName(s2).unionByName(s3)
    return survivorship(recs, "c_custkey", "pri").orderBy("c_custkey")


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diffing (operators/merge.py::snapshot_diff): two
    deterministic 'versions' of the customer table (modular filters
    simulate inserts/deletes, a balance bump simulates updates) diffed
    into an I/U/D change log — the inverse of apply_cdc, the way
    incremental pipelines turn vendor full-dumps into CDC streams. One
    full-outer key join; null-safe change detection is a projection.
    The oracle replays the diff declaratively in SQL."""
    from etl_orders_to_bq_spark.operators.merge import snapshot_diff

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    old = c.filter(F.col("c_custkey") % 11 != 3)
    new = c.filter(F.col("c_custkey") % 13 != 5).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 10 == 0,
            F.round(F.col("c_acctbal") + 10.0, 2),
        ).otherwise(F.col("c_acctbal")),
    )
    return snapshot_diff(
        old, new, "c_custkey", ["c_name", "c_acctbal"]
    ).orderBy("c_custkey")


def q_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake detection + repair (functions/encoding.py, the ftfy
    shape): five planted damage classes per doc_id % 7 — Latin-1
    mojibake (control-char bytes included), sloppy-cp1252 mojibake
    (curly quotes through the UNDEFINED 0x9D byte), genuine accented
    text whose round-trip is invalid UTF-8 (must NOT be touched), CJK
    text (unmappable, untouched), and a bare invalid lead (untouched).
    The oracle replays the cp1252 translate table, the byte
    round-trip, and a full strict UTF-8 DFA (overlongs/surrogates
    rejected, matching Spark's is_valid_utf8)."""
    from etl_orders_to_bq_spark.functions.encoding import (
        is_mojibake,
        repair_mojibake,
        sloppy_cp1252_mojibake,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    m_latin1 = "caf\u00e9 cr\u00e8me \u2014 na\u00efve\u2026".encode(
        "utf-8"
    ).decode("latin-1")
    m_1252 = sloppy_cp1252_mojibake(
        "it\u2019s \u201cfine\u201d \u2013 ok"
    )
    did = F.col("doc_id")
    planted = (
        F.when(did % 7 == 0, F.concat(F.lit(m_latin1 + " "), F.col("source")))
        .when(did % 7 == 1, F.concat(F.lit(m_1252 + " "), F.col("source")))
        .when(
            did % 7 == 2,
            F.concat(
                F.lit("d\u00e9j\u00e0 vu \u2013 caf\u00e9 "),
                F.col("source"),
            ),
        )
        .when(
            did % 7 == 3,
            F.concat(F.lit("\u6c49\u5b57 mixed \u6587\u672c "), F.col("source")),
        )
        .when(did % 7 == 4, F.concat(F.lit("broken \u00c3 lone "), F.col("source")))
        .otherwise(F.col("text"))
    )
    base = d.select("doc_id", planted.alias("text"))
    return base.select(
        "doc_id",
        F.coalesce(is_mojibake("text"), F.lit(False)).alias(
            "was_mojibake"
        ),
        repair_mojibake("text").alias("text_fixed"),
    ).orderBy("doc_id")


def _multiline_fixture(d):
    """Deterministic multi-line text over documents for the line-rule
    entries (gopher_quality / c4_line_filter): 8-word lines from the
    raw token stream; (doc_id + line) % 7 plants a bullet prefix,
    % 3 a terminal period, % 11 a 'javascript.' tail, % 5 an
    ellipsis; doc_id % 41 / % 43 plant the C4 page-level offenders.
    Both oracles replay this construction verbatim."""
    did = F.col("doc_id")
    # regexp tokenizer, NOT split-on-trim: split('') is [''] while the
    # oracle's regexp_extract_all('') is [] — a latent divergence on
    # empty docs (r10 review)
    toks = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
    nl = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")

    def line(i):
        prefix = F.when(
            (did + i) % 7 == 0, F.lit("\u2022 ")
        ).otherwise(F.lit(""))
        suffix = (
            F.when((did + i) % 3 == 0, F.lit("."))
            .when((did + i) % 11 == 0, F.lit(" javascript."))
            .when((did + i) % 5 == 0, F.lit("..."))
            .otherwise(F.lit(""))
        )
        return F.concat(
            prefix, F.array_join(F.slice(toks, i * 8 + 1, 8), " "), suffix
        )

    # sequence(0, -1) counts DOWN in Spark — guard the empty doc
    t2 = F.when(
        nl > 0,
        F.array_join(
            F.transform(F.sequence(F.lit(0), nl - 1), line), "\n"
        ),
    ).otherwise(F.lit(""))
    t2 = (
        F.when(
            did % 41 == 0,
            F.concat(t2, F.lit("\nlorem ipsum dolor sit amet ok.")),
        )
        .when(
            did % 43 == 0,
            F.concat(t2, F.lit("\nif (x) { return x } done ok.")),
        )
        .otherwise(t2)
    )
    # the synthetic corpus has no English function words, which would
    # make the Gopher stop-word rule vacuously all-false — plant a
    # stopword-bearing lead line on the even half so the rule
    # discriminates
    t2 = F.when(
        did % 2 == 0,
        F.concat(
            F.lit("the counts of that run have to be read with care.\n"),
            t2,
        ),
    ).otherwise(t2)
    return d.select("doc_id", t2.alias("text"))


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveWeb quality rule battery (functions/text.py
    gopher_quality_flags; Rae et al. 2021 App. A): every ratio rule
    evaluated as an exact integer cross-multiply, so the oracle is
    bit-exact with zero float handling. Runs on the synthesized
    multi-line fixture so the bullet/ellipsis LINE rules carry real
    signal."""
    from etl_orders_to_bq_spark.functions.text import (
        gopher_quality_flags,
    )

    d = _multiline_fixture(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    g = gopher_quality_flags("text")
    return d.select(
        "doc_id",
        g["n_words"].alias("n_words"),
        g["word_count_ok"].alias("word_count_ok"),
        g["mean_word_len_ok"].alias("mean_word_len_ok"),
        g["symbol_ratio_ok"].alias("symbol_ratio_ok"),
        g["bullet_ok"].alias("bullet_ok"),
        g["ellipsis_ok"].alias("ellipsis_ok"),
        g["alpha_ok"].alias("alpha_ok"),
        g["stopword_ok"].alias("stopword_ok"),
        g["passes"].alias("passes"),
    ).orderBy("doc_id")


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (functions/text.py c4_line_clean;
    Raffel et al. 2020 \u00a72.2): terminal-punctuation / five-word /
    javascript line rules, three-kept-lines + lorem-ipsum +
    curly-brace page rules, cleaned text re-joined. Same synthesized
    multi-line fixture as gopher_quality."""
    from etl_orders_to_bq_spark.functions.text import c4_line_clean

    d = _multiline_fixture(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    s = c4_line_clean("text")
    return d.select(
        "doc_id",
        s["n_lines"].alias("n_lines"),
        s["n_kept"].alias("n_kept"),
        s["page_ok"].alias("page_ok"),
        s["cleaned"].alias("cleaned"),
    ).orderBy("doc_id")


def q_mlm_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic BERT-style MLM masking (operators/lm.py mlm_mask;
    Devlin et al. 2019, 15% / 80-10-10): per (doc, position) decisions
    from one md5-derived integer, so masking is reproducible across
    engines/partitionings and the oracle replays every branch — mask
    token, document-local random replacement, keep-as-label."""
    from etl_orders_to_bq_spark.operators.lm import mlm_mask

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return mlm_mask(d).orderBy("doc_id")


def q_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (operators/embstats.py
    jl_project): 64-dim embeddings onto 8 seeded LCG unit directions
    (the shared _hyperplanes stream), flattened to (id, component,
    value) scalars, 6dp components. The oracle inlines the same plane
    literals as list_dot_product structs."""
    from etl_orders_to_bq_spark.operators.embstats import jl_project

    e = _t(spark, sf_dir, "embeddings")
    return jl_project(e, dim=64, out_dim=8, seed=31).orderBy(
        "vec_id", "component"
    )


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (operators/lm.py vocab_coverage):
    corpus-token share covered by the top-k frequency types, ranked
    via the ranged global_row_number (never an unpartitioned window),
    exact micro-unit coverage division. ks include one above the
    fixture's 31-type vocabulary so the n_types clamp is exercised."""
    from etl_orders_to_bq_spark.operators.lm import vocab_coverage

    d = _t(spark, sf_dir, "documents").select("text")
    return vocab_coverage(d, ks=(5, 10, 20, 40)).orderBy("k")


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document line-frequency boilerplate removal
    (operators/paragraphs.py boilerplate_line_filter, the RefinedWeb
    rule): every line whose trimmed form appears in >= 5 distinct
    documents dies in ALL of them. Runs on the shared multi-line
    fixture, whose planted stopword lead line (half the corpus) and
    lorem-ipsum / brace lines are exactly such boilerplate."""
    from etl_orders_to_bq_spark.operators.paragraphs import (
        boilerplate_line_filter,
    )

    d = _multiline_fixture(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return boilerplate_line_filter(d, min_docs=5).orderBy("doc_id")


def q_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (operators/lm.py span_corrupt, Raffel
    et al. 2020): deterministic greedy non-overlapping spans from
    per-position md5 integers (5% start rate, span length 1..5 —
    ~15% corruption), ordered <extra_id_k> sentinels + the targets
    string. The oracle replays the hash stream, the in-row greedy
    fold, and both reassemblies."""
    from etl_orders_to_bq_spark.operators.lm import span_corrupt

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return span_corrupt(d).orderBy("doc_id")


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling (operators/mix.py
    temperature_sample, the mC4/mT5 alpha-mixing recipe at alpha=0.5
    so the weight is IEEE-exact sqrt): sources remapped to three big
    groups plus a rare one (doc_id % 50 == 0), whose keep RATE the
    boost visibly raises relative to its natural share. Oracle
    replays the source-ordered sqrt fold, the micro-rate floor, and
    the md5 keep predicate."""
    from etl_orders_to_bq_spark.operators.mix import temperature_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 50 == 0, F.lit("rare"))
        .otherwise(
            F.concat(F.lit("g"), (F.col("doc_id") % 3).cast("string"))
        )
        .alias("source"),
    )
    return temperature_sample(d, target_total=300).orderBy("source")


def q_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar family: parse_url HOST/PATH/QUERY-param extraction
    plus url_decode over deterministic per-document URLs, rolled up to
    per-host doc counts — the URL-keyed shape of web-corpus curation
    (C4/RefinedWeb dedupe and quota by registered domain). Pure
    Column functions; one rollup shuffle. The oracle rebuilds the URL
    and extracts with regexes."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("&q=a%20b%2Bc"),
    )
    parsed = d.select(
        F.col("doc_id"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("qlang"),
        F.url_decode(F.parse_url(url, F.lit("QUERY"), F.lit("q"))).alias("q"),
    )
    return (
        parsed.groupBy("host", "qlang", "q")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .orderBy("host", "qlang")
    )


def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval merging (operators/temporal.py::
    merge_intervals): each order opens a 30-day activity window;
    windows per customer that overlap or touch merge into maximal
    active periods. One window shuffle on the customer key; the
    island groupBy reuses the partitioning. The oracle replays the
    running-max-end island construction with SQL windows."""
    from etl_orders_to_bq_spark.operators.temporal import merge_intervals

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").alias("active_from"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("active_to"),
    )
    return (
        merge_intervals(o, "o_custkey", "active_from", "active_to")
        .orderBy("o_custkey", "island_start")
    )


def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counts (operators/lm.py): top-20
    (center, context) pairs within a ±2 token window — the word2vec
    training-pair table. Generation is in-row (indexed transform
    slicing its own neighborhood, no self-join); the single shuffle is
    the final word-count-profile groupBy. The oracle rebuilds the
    neighborhood with nested DuckDB list comprehensions."""
    from etl_orders_to_bq_spark.operators.lm import skipgram_pairs

    d = _spread_if_underpartitioned(spark, _t(spark, sf_dir, "documents"))
    return (
        skipgram_pairs(d, window=2)
        .orderBy(F.desc("n_pair"), F.asc("center"), F.asc("context"))
        .limit(20)
    )


def q_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS shortest paths (operators/graph.py::
    shortest_paths) over the 300-node lineitem projection graph
    (edge = (orderkey mod 300, partkey mod 300), undirected): hop
    distance from node 0 for every reachable node. Frontier-driven
    joins with per-round staging and empty-frontier early exit. The
    oracle is an independent declarative formulation: a recursive CTE
    enumerating (node, depth) walks with min(depth) per node."""
    from etl_orders_to_bq_spark.operators.graph import shortest_paths

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 300).alias("src"),
        (F.col("l_partkey") % 300).alias("dst"),
    )
    return shortest_paths(li, 0, directed=False, max_hops=10).orderBy("node")


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE trainer round-1 statistics (operators/lm.py): top-20
    adjacent character-pair counts over the word vocabulary, weighted
    by word frequency — the argmax a byte-pair-encoding tokenizer
    trainer takes each merge round. The corpus token stream is touched
    once (word count); the pair stage runs over the distinct-word
    table, which is what keeps BPE training tractable at corpus scale.
    The oracle rebuilds symbols and pairs with DuckDB list
    comprehensions."""
    from etl_orders_to_bq_spark.operators.lm import (
        bpe_pair_counts,
        bpe_word_symbols,
    )

    d = _spread_if_underpartitioned(spark, _t(spark, sf_dir, "documents"))
    return (
        bpe_pair_counts(bpe_word_symbols(d))
        .orderBy(F.desc("n_pair"), F.asc("sym_a"), F.asc("sym_b"))
        .limit(20)
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (operators/graph.py): oriented-wedge
    enumeration over a 300-node projection graph derived from
    lineitem (edge = (orderkey mod 300, partkey mod 300)) — each
    triangle counted once via low->high edge orientation, two
    int-pair shuffles. Top-10 nodes by triangle participation; the
    oracle replays the identical joins in SQL."""
    from etl_orders_to_bq_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 300).alias("a"),
        (F.col("l_partkey") % 300).alias("b"),
    )
    return (
        triangle_count(li)
        .orderBy(F.desc("n_triangles"), F.asc("node"))
        .limit(10)
    )


def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance scoring (operators/bm25.py) of every
    document against a fixed query term set, using the corpus's own
    df/avgdl statistics — the retrieval-shape companion to the unigram
    perplexity filter. The oracle replays the identical formula in
    SQL (ln-based idf, k1=1.2, b=0.75, 6-dp round)."""
    from etl_orders_to_bq_spark.operators.bm25 import bm25_scores

    d = _t(spark, sf_dir, "documents")
    return bm25_scores(
        d, ["the", "data", "query", "stream"], k1=1.2, b=0.75
    ).orderBy("doc_id")


def q_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join: a selective dim filter on a shuffle
    join makes the optimizer inject bloom_filter_agg/might_contain on
    the fact side — row-level runtime pruning that cuts a 100 TB
    probe-side shuffle to candidate rows (broadcast disabled so the
    shuffle-join path is actually exercised; the row-level result is
    EXACT — the bloom only prunes, membership is rechecked by the
    join). The confs are snapshotted and restored after an eager
    materialization (same discipline as the nanos parquet reader), so
    nothing leaks into the shared gate session; the plan injection
    itself is asserted in tests/test_scale_plans.py."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = _t(spark, sf_dir, "lineitem")
        o = _t(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .select(
                "l_orderkey",
                "l_linenumber",
                F.round("l_extendedprice", 2).alias("l_extendedprice"),
                F.round("o_totalprice", 2).alias("o_totalprice"),
            )
            # materialize while the runtime-filter confs are live, so
            # the executed plan really carries the bloom
            .localCheckpoint(eager=True)
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-filter shape (operators/lm.py): every document scored
    by avg log10 unigram probability under the corpus's own token
    distribution — explode, one word-count shuffle, token-key join,
    per-doc aggregate, total kept lazy. The oracle replays the same
    counts and log average in SQL."""
    from etl_orders_to_bq_spark.operators.lm import unigram_logprob_scores

    d = _t(spark, sf_dir, "documents")
    return unigram_logprob_scores(d).orderBy("doc_id")


def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing by token budget (operators/mix.py): every source
    keeps a deterministic md5-ordered sample until its per-source token
    budget fills — budgets vary by source (500..1500 tokens, derived
    from the source index) so the per-source budget path is exercised.
    "Fill until full": the doc crossing the budget line is included.
    One window shuffle on the source key; the oracle replays the same
    running-sum arithmetic."""
    from etl_orders_to_bq_spark.functions.text import token_count
    from etl_orders_to_bq_spark.operators.mix import token_budget_mix

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    budget = (
        F.lit(500)
        + (F.substring("source", 4, 10).cast("int") % 5) * 250
    ).cast("long")
    kept = token_budget_mix(
        d,
        "source",
        "n_tokens",
        budget,
        [F.md5(F.col("doc_id").cast("string")).asc(), F.asc("doc_id")],
        cum_col="cum_before",
    )
    return kept.select(
        "source", "doc_id", "n_tokens", "cum_before"
    ).orderBy("source", "doc_id")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (Karp-style misra-gries via
    DataFrame.stat.freqItems) on a synthetically skewed route column
    (70% one hot value + a 997-value tail). The sketch's published
    contract is NO FALSE NEGATIVES: every item with true frequency >
    support*n must appear (false positives allowed). BOUNDED-ERROR
    gate in that shape: the query computes the EXACT heavy hitters
    (cross-engine comparable) and flags each as found-by-sketch; the
    oracle recomputes the exact set and pins the flag true, so a
    sketch that drops a real heavy hitter fails the value hash."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("t"), (F.col("l_orderkey") % 997).cast("string"))
        )
        .alias("route")
    )
    # ONE scan of lineitem: the route projection is staged, then the
    # sketch pass and the exact-count pass read the staged blocks; the
    # total comes from summing the (≤ 998-row) grouped counts, not a
    # third scan
    li = li.localCheckpoint(eager=True)
    support = 0.5
    # freqItems returns ONE row holding a small array (≤ 1/support
    # items) — a bounded driver-side read like IVF centroid ranking
    sketch_items = list(
        li.stat.freqItems(["route"], support).first()["route_freqItems"]
    )
    counts = li.groupBy("route").agg(F.count("*").alias("cnt"))
    counts = counts.localCheckpoint(eager=False)
    total = counts.agg(F.sum("cnt").alias("t"))
    exact_hh = counts.crossJoin(F.broadcast(total)).filter(
        F.col("cnt") > F.col("t") * support
    )
    return exact_hh.select(
        "route",
        "cnt",
        F.col("route").isin(sketch_items).alias("found_by_sketch"),
    ).orderBy("route")


def q_streaming_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once checkpointed parquet sink: drain the event stream
    into files (availableNow), read the committed output back — must
    equal the batch table exactly (no loss, no duplication)."""
    import tempfile

    from etl_orders_to_bq_spark.streaming.sinks import stream_to_parquet

    path = _stage_event_stream(spark, sf_dir, "plain")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    out_dir = tempfile.mkdtemp(prefix="evsink_")
    q = stream_to_parquet(
        stream, f"{out_dir}/data", f"{out_dir}/ckpt", available_now=True
    )
    q.awaitTermination(300)
    back = spark.read.parquet(f"{out_dir}/data")
    return back.select("event_id", "user_id", "event_type", "value")


def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window through the real streaming engine: append mode
    emits only sessions the watermark has closed (session end = last
    event + gap <= max(ts) - watermark); the oracle filters the batch
    sessionization the same way."""
    from etl_orders_to_bq_spark.streaming.events import sessionize_events

    path = _stage_event_stream(spark, sf_dir, "plain")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    sess = sessionize_events(stream, gap="30 minutes", watermark="10 minutes")
    return _stream_to_batch(sess, "ssess", "append")


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the streaming side enriches against a batch
    dim re-read per micro-batch (no state, no watermark needed)."""
    path = _stage_event_stream(spark, sf_dir, "plain")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = stream.join(dim, "user_id", "inner").select(
        "event_id", "user_id", "event_type", "c_mktsegment"
    )
    return _stream_to_batch(joined, "sstatic", "append")


def q_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) through the
    real engine: per-user cumulative totals; with all files in one
    availableNow batch the final update per user equals the batch
    groupBy."""
    from etl_orders_to_bq_spark.streaming.stateful import running_user_totals

    path = _stage_event_stream(spark, sf_dir, "plain")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    totals = running_user_totals(stream)
    return _stream_to_batch(totals, "stotals", "update")


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over priority x status."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def q_intersect_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers both in BUILDING and holding urgent orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.intersect(urgent)


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): high-balance ∪ MACHINERY customers."""
    c = _t(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    return rich.union(machinery).distinct()


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string function family over part."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    )


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math function family over lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow("l_discount", 2), 6).alias("disc_sq"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over the embedding column."""
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(emb, 1), 6).alias("first_val"),
        F.round(F.element_at(emb, -1), 6).alias("last_val"),
        F.round(F.array_max(emb), 6).alias("max_val"),
        F.round(
            F.aggregate(F.slice(emb, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head_sum"),
    )


def q_percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile aggregates: median and p90 order value by priority."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.5), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90_price"),
        F.count("*").alias("n"),
    )


def q_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE bucketing: order-value histogram."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .when(F.col("o_totalprice") < 300000, "high")
        .otherwise("vhigh")
    )
    return o.groupBy(bucket.alias("price_band")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


def q_coalesce_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null handling (coalesce / null flags) over join misses."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", "c_name"
    )
    j = o.join(broadcast(c), o.o_custkey == c.c_custkey, "left")
    return j.select(
        "o_orderkey",
        F.coalesce("c_name", F.lit("UNKNOWN")).alias("cust_name"),
        F.col("c_custkey").isNull().alias("is_miss"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union+window, one shuffle): each error event picks up
    the same user's most recent purchase value at or before it."""
    from etl_orders_to_bq_spark.operators.temporal import asof_join

    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round("value", 2).alias("purchase_value")
    )
    return asof_join(
        errors,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
    ).select("event_id", "user_id", "purchase_value")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range predicate join: lineitems priced within ±10% of
    their part's retail price (broadcast dim, filter fused into join)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    j = li.join(
        broadcast(p),
        (li.l_partkey == p.p_partkey)
        & (li.l_extendedprice >= p.p_retailprice * 0.9)
        & (li.l_extendedprice <= p.p_retailprice * 1.1),
    )
    return j.groupBy("l_partkey").agg(
        F.count("*").alias("n_close"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )


def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL string surface: same engine, spark.sql text in, DataFrame
    out (reference has no SQL layer; Spark gives it for free once views
    are registered — SURVEY.md §2.2)."""
    from etl_orders_to_bq_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        select c_mktsegment,
               count(*) as n_orders,
               round(sum(o_totalprice), 2) as total_value
        from orders join customer on o_custkey = c_custkey
        where o_orderstatus = 'F'
        group by c_mktsegment
        """
    )


def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window frames: per-customer running order total and
    3-order moving average, ordered by date."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(running), 2).alias("running_total"),
        F.round(F.avg("o_totalprice").over(moving), 4).alias("moving_avg3"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.rank().over(w).alias("rk"),
    )


def q_sketch_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (HLL++ approx distinct) under a BOUNDED-ERROR
    oracle: the estimate itself is engine-specific, but its published
    accuracy contract is not. The query returns the exact distinct count
    (cross-engine comparable) plus a boolean asserting the HLL++
    estimate landed within 3x the configured rsd (1.6% -> 5% bound);
    the oracle recomputes the exact counts and pins the boolean true,
    so a drifting sketch fails the value hash instead of hiding behind
    a rows-only gate."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.016).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "n",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.greatest(F.col("exact_parts") * 0.05, F.lit(1.0))
        ).alias("hll_within_bound"),
    ).orderBy("l_returnflag")


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan-only filter + single agg —
    the query where predicate pushdown is the whole game."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )


def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + count by priority."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_q10_returned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation/covariance/stddev/variance."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qp"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("stddev_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
    )


def q_fuzzy_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: levenshtein distance (identical DP
    algorithm on both engines -> exact integer parity)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000042")).alias("lev_to_42"),
        F.levenshtein("c_name", F.reverse("c_name")).alias("lev_palindrome"),
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history: init from the customer snapshot, then
    apply one update batch (acctbal +100 for every 10th customer).
    Closed/open validity ranges verified against closed-form SQL."""
    from etl_orders_to_bq_spark.operators.scd import scd2_apply, scd2_init

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    hist = scd2_init(c, "2024-01-01 00:00:00")
    updates = c.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 10 == 0, F.round(F.col("c_acctbal") + 100, 2)
        ).otherwise(F.col("c_acctbal")),
    ).withColumn("c_acctbal", F.round("c_acctbal", 2))
    out = scd2_apply(
        hist, updates, "c_custkey", ["c_name", "c_acctbal"], "2024-02-01 00:00:00"
    )
    return out.withColumn("c_acctbal", F.round("c_acctbal", 2))


_IVF_INDEX_CACHE: dict = {}


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search (k-means coarse quantizer, 2-probe) under a
    RECALL oracle: k-means initialization is engine-specific so the
    exact hit list has no cross-engine twin, but the quality contract
    does — recall@10 vs the exact brute-force cosine top-10 must be
    >= 0.9 at 2 probes of 8 clusters. The query vector is the centroid
    of the fitted index's MOST POPULATED cluster: the synthetic
    embeddings are near-uniform (arbitrary vectors' top-10 cosine sims
    are ~0.3 noise spread across all clusters, where NO probe-pruned
    method can have high recall), a dense-region query is exactly the
    case IVF's contract covers, and k-means can leave near-empty
    clusters whose centroids sit far from any data (centroid 0 is one
    at sf0.001) — the populated-cluster pick is the deterministic
    dense-region query at every fixture SF.
    The query computes BOTH paths in Spark and returns
    (n_vectors, k, recall_ok); the oracle pins the corpus size from the
    same parquet and the boolean true, so a broken quantizer or pruning
    bug fails the value hash. The index is built ONCE per table
    (build/search split — search is centroid ranking driver-side + a
    pruned scan, no k-means fit)."""
    from etl_orders_to_bq_spark.operators.ann import (
        ann_topk_bruteforce,
        ann_topk_ivf,
        build_ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVF_INDEX_CACHE:
        _IVF_INDEX_CACHE[key] = build_ivf_index(emb, n_clusters=8)
    index = _IVF_INDEX_CACHE[key]
    sizes = {
        r["ivf_cluster"]: r["n"]
        for r in index.assigned.groupBy("ivf_cluster")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # first-maximal in ascending cluster order -> deterministic
    densest = max(sorted(sizes), key=lambda c: sizes[c])
    qvec = list(index.centroids[densest])
    ivf = ann_topk_ivf(_IVF_INDEX_CACHE[key], qvec, k=10, n_probe=2).select(
        "vec_id"
    )
    exact = ann_topk_bruteforce(emb, qvec, k=10).select("vec_id")
    hits = ivf.join(exact, "vec_id", "inner").agg(F.count("*").alias("__hits"))
    return (
        emb.agg(F.count("*").alias("n_vectors"))
        .crossJoin(hits)
        .select(
            "n_vectors",
            F.lit(10).cast("long").alias("k"),
            (F.col("__hits") >= 9).alias("recall_ok"),
        )
    )


def q_dedup_first_minby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 via the min_by strategy (map-side-combinable shuffle — the
    right choice for heavy-dup corpora): must equal the window strategy
    row for row, so it shares o4's oracle shape."""
    from etl_orders_to_bq_spark.operators.dedup import first_occurrence_dedup

    li = _t(spark, sf_dir, "lineitem")
    return first_occurrence_dedup(
        li,
        ["l_orderkey", "l_partkey"],
        ["l_linenumber", "l_quantity", "l_extendedprice", "l_suppkey"],
        strategy="min_by",
    ).select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation (salt spreads hot keys over N
    reducers): must equal the direct groupBy. Exact for count/min/max;
    the summed column is integral-valued so re-association is exact too."""
    from etl_orders_to_bq_spark.operators.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {"l_quantity": "sum", "l_orderkey": "count", "l_extendedprice": "max"},
        buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_l_quantity", 2).alias("sum_l_quantity"),
        "count_l_orderkey",
        F.round("max_l_extendedprice", 2).alias("max_l_extendedprice"),
    )


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe left join (probe side salted, build side exploded
    per-salt): must equal the plain left join. The lever for
    broadcast-ineligible dims under a hot probe key."""
    from etl_orders_to_bq_spark.operators.skew import salted_left_join

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    return salted_left_join(o, c, on="o_custkey", buckets=8)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics: update every 7th customer's balance, insert
    synthetic new customers, keep the rest — one full-outer shuffle
    join (operators/merge.py)."""
    from etl_orders_to_bq_spark.operators.merge import merge_upsert

    t = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    updates = (
        t.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 50, 2))
    )
    inserts = (
        t.filter(F.col("c_custkey") % 11 == 0)
        .select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.concat(F.lit("NEW_"), F.col("c_name")).alias("c_name"),
            F.lit(0.0).alias("c_acctbal"),
        )
    )
    merged = merge_upsert(t, updates.unionByName(inserts), keys=["c_custkey"])
    return merged.withColumn("c_acctbal", F.round("c_acctbal", 2))


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling (one row -> N frame rows through the
    Arrow mapInPandas explode); text bytes stand in for video payloads,
    the deterministic stub hash IS the oracle contract."""
    from etl_orders_to_bq_spark.multimodal import frame_sample_video

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("id"), F.encode("text", "UTF-8").alias("content")
    )
    return frame_sample_video(media, every_n=10, max_frames=3)


def q_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 quantize -> dequantize -> exact cosine top-10: the 4x-
    smaller vector path, oracle-checked end to end (quantization math
    replicated in SQL)."""
    from etl_orders_to_bq_spark.operators.ann import (
        ann_topk_bruteforce,
        dequantize_embeddings,
        quantize_embeddings_int8,
    )

    emb = _t(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    dq = dequantize_embeddings(quantize_embeddings_int8(emb))
    return ann_topk_bruteforce(
        dq, list(target["embedding"]), k=10, vec_col="dq_embedding"
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN search with Hamming-1 multi-probe: scans only
    the query's bucket plus its single-bit-flip neighbors (9 of 256
    buckets at 8 bits). The oracle reproduces the probe set with
    xor() over the inlined-hyperplane bucket expression."""
    from etl_orders_to_bq_spark.operators.ann import ann_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return ann_topk_lsh(
        emb, list(target["embedding"]), k=10, bits=8, multi_probe=1
    )


def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cluster assignment as a pure Column projection (argmax of
    2*x.c - |c|^2 over fixed centroids): the k-means-free half of the
    IVF index build, oracle-checked with the centroids inlined."""
    from etl_orders_to_bq_spark.operators.ann import _hyperplanes, assign_ivf_clusters

    emb = _t(spark, sf_dir, "embeddings")
    centroids = _hyperplanes(dim=64, bits=8, seed=7)
    return assign_ivf_clusters(emb, centroids).select("vec_id", "ivf_cluster")


def _ivf_fixed_setup():
    """Shared fixed-centroid IVF search setup: deterministic centroids
    and query vector, plus the driver-side probe ranking (identical in
    the query and the oracle generator)."""
    from etl_orders_to_bq_spark.operators.ann import _hyperplanes

    centroids = _hyperplanes(dim=64, bits=8, seed=7)
    query = _hyperplanes(dim=64, bits=1, seed=99)[0]
    probe = sorted(
        range(len(centroids)),
        key=lambda i: sum(
            (a - b) * (a - b) for a, b in zip(centroids[i], query)
        ),
    )[:3]
    return centroids, query, probe


def q_ivf_search_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF SEARCH path end-to-end with FIXED centroids: assign
    (pure Column argmax), driver-side probe ranking over <=8 tiny
    centroid vectors (no Spark job), brute-force cosine top-k over only
    the 3 probed clusters. With data-independent centroids the whole
    path is oracle-reproducible — closing the gap that keeps
    ann_ivf_topk (k-means-fit centroids) rows-only."""
    from etl_orders_to_bq_spark.operators.ann import (
        IvfIndex,
        ann_topk_ivf,
        assign_ivf_clusters,
    )

    centroids, query, _ = _ivf_fixed_setup()
    emb = _t(spark, sf_dir, "embeddings")
    idx = IvfIndex(
        assign_ivf_clusters(emb, centroids), centroids, "vec_id", "embedding"
    )
    return ann_topk_ivf(idx, query, k=10, n_probe=3)


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar family: extraction + arithmetic."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.hour("o_orderdate").alias("hr"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition: language filter -> quality gate -> exact
    dedup -> near-dup cluster removal -> chunking, end-to-end as one
    plan. Near-dups are planted (suffixed copies of 10 docs) so the
    cluster-removal stage has real work in the gate."""
    from etl_orders_to_bq_spark.pipeline.corpus import build_training_corpus

    # the regex-heavy filter + fingerprint stage is CPU-bound: spread a
    # single-split local fixture across cores (no-op on multi-split
    # input — see _spread_if_underpartitioned)
    d = _spread_if_underpartitioned(
        spark, _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    planted = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq ww ee")).alias("text"),
    )
    corpus = build_training_corpus(
        d.unionByName(planted),
        lang="en",
        min_quality=0.5,
        chunk_tokens=64,
        overlap=8,
    )
    return corpus


def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe casting (try_cast): dirty values become null instead of
    failing the job — the complement of O2's repair-then-cast (repair
    recovers the value; try_cast quarantines it)."""
    o = _t(spark, sf_dir, "orders")
    dirty = F.when(
        F.col("o_orderkey") % 7 == 0,
        F.concat(F.col("o_orderkey").cast("string"), F.lit("x")),
    ).otherwise(F.col("o_orderkey").cast("string"))
    return o.select(
        "o_orderkey",
        dirty.try_cast("long").alias("maybe_key"),
        F.col("o_orderstatus").try_cast("double").alias("never_num"),
    )


def q_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: sorted distinct set per group (joined to
    a string so the cross-engine hash sees identical values)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.count("*").alias("n"),
    )


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): how many orders
    of the same customer fall within 10k below this order's price."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-10000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).alias("n_close_below"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_close_below"),
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing over real binary columns: text bytes
    stand in for image payloads (no codec libs in the container — the
    deterministic md5-derived fake IS the contract), so the full
    mapInPandas Arrow path is oracle-checked, not just row-counted."""
    from etl_orders_to_bq_spark.multimodal import decode_image_batch

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("id"), F.encode("text", "UTF-8").alias("content")
    )
    # codec pinned to the stub: the DuckDB oracle mirrors the md5
    # arithmetic, and these payloads are text bytes, not images
    return decode_image_batch(media, codec="stub")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature-extraction plumbing (binary -> fixed-size
    vector via Arrow mapInPandas), exploded to scalar rows so the
    md5-derived stub features hash-check against the oracle."""
    from etl_orders_to_bq_spark.multimodal import extract_image_features

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("id"), F.encode("text", "UTF-8").alias("content")
    )
    feats = extract_image_features(media, dim=8)
    return feats.select(
        "id", F.posexplode("feature").alias("dim_idx", "feat")
    ).withColumn("feat", F.round("feat", 6))


def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality profile of orders (nulls/distinct/min/max
    per column + row count, long form)."""
    from etl_orders_to_bq_spark.operators.quality import profile

    o = _t(spark, sf_dir, "orders")
    return profile(o, ["o_orderkey", "o_orderstatus", "o_totalprice"])


def q_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with region filter, revenue by nation
    (local-supplier condition c_nationkey = s_nationkey included)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates to a join):
    parts priced below their brand's average."""
    from etl_orders_to_bq_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir, ["part"])
    return spark.sql(
        """
        select p_partkey, p_brand, p_retailprice
        from part p
        where p_retailprice < (select avg(p2.p_retailprice)
                               from part p2
                               where p2.p_brand = p.p_brand)
        """
    )


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling (~10%): the scalable reproducible
    sample — same rows selected on any engine, any partitioning, any
    run (unlike rand()-based TABLESAMPLE)."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    return o.filter(bucket == 0).select("o_orderkey", "o_custkey", "o_totalprice")


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking: 40-token windows, 10-token overlap."""
    from etl_orders_to_bq_spark.operators.chunk import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=40, overlap=10)


def q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling (training-mix curation): keep the top
    20 docs per source by quality score, deterministic tie-break.
    WindowGroupLimit keeps the per-group sort a streaming top-k."""
    from etl_orders_to_bq_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", F.round(quality_score("text"), 6).alias("quality")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("source", "doc_id", "quality", "rk")
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: chunks laid end to end per md5 bucket, chopped
    into 512-token windows (bin index + offset per chunk). Bucketed so
    packing never serializes on a global order."""
    from etl_orders_to_bq_spark.operators.chunk import chunk_documents
    from etl_orders_to_bq_spark.operators.pack import pack_sequences

    d = _t(spark, sf_dir, "documents")
    ch = chunk_documents(d, chunk_tokens=40, overlap=10).select(
        "doc_id", "chunk_idx", "n_tokens"
    )
    return pack_sequences(
        ch, capacity=512, buckets=8, order_cols=["doc_id", "chunk_idx"]
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + grouping() marker via the SQL surface."""
    from etl_orders_to_bq_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        select o_orderpriority, o_orderstatus,
               cast(grouping(o_orderpriority) as int) as g_pri,
               count(*) as n,
               round(sum(o_totalprice), 2) as sum_price
        from orders
        group by grouping sets ((o_orderpriority), (o_orderstatus), ())
        """
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide numeric columns to (metric, value) rows."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "value",
    )


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract with capture group: customer number from c_name."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).alias("cust_num"),
    )


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map type construction + lookup (create_map / element_at). The
    oracle computes the same scalars directly — it validates output
    semantics, not internal representation."""
    o = _t(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"),
        F.col("o_orderstatus"),
        F.lit("priority"),
        F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "priority").alias("priority_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline tail: LSH candidate pairs -> connected
    components -> (doc, cluster representative). Iterative min-label
    propagation; oracle is a recursive-CTE transitive closure."""
    from etl_orders_to_bq_spark.operators.dedup import minhash_lsh_candidates
    from etl_orders_to_bq_spark.operators.graph import connected_components

    d = _docs_with_planted_dups(spark, sf_dir)
    pairs = minhash_lsh_candidates(
        d, text_col="text", id_col="doc_id", num_hashes=4, bands=2, shingle_len=3
    )
    return connected_components(pairs, "id_a", "id_b").select(
        F.col("id").alias("doc_id"), F.col("component")
    )


_DEDUP_STAGE_DIRS: list[str] = []


@atexit.register
def _cleanup_dedup_stage_dirs() -> None:
    import shutil

    for d in _DEDUP_STAGE_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def q_dedup_clusters_durable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q_dedup_clusters pipeline run through the DURABLE staging
    path: signatures and per-round CC labels are parquet write+reread
    (``checkpoint_path=``) instead of executor-block localCheckpoint —
    the fault-tolerant shape a real cluster needs (losing one executor
    mid-query invalidates localCheckpoint blocks). Same oracle, same
    clusters: proves the staging strategy is semantics-neutral."""
    import tempfile

    from etl_orders_to_bq_spark.operators.dedup import minhash_lsh_candidates
    from etl_orders_to_bq_spark.operators.graph import connected_components

    # a fresh mkdtemp per invocation: clearing a shared per-pid dir at
    # construction time would delete parquet files a still-live frame
    # from an EARLIER invocation references (safe only under strict
    # build-then-consume sequencing). All dirs from this process are
    # reclaimed at exit instead.
    stage_dir = tempfile.mkdtemp(prefix="dedup_stage_")
    _DEDUP_STAGE_DIRS.append(stage_dir)
    d = _docs_with_planted_dups(spark, sf_dir)
    pairs = minhash_lsh_candidates(
        d, text_col="text", id_col="doc_id", num_hashes=4, bands=2,
        shingle_len=3, checkpoint_path=f"{stage_dir}/lsh",
    )
    return connected_components(
        pairs, "id_a", "id_b", checkpoint_path=f"{stage_dir}/cc"
    ).select(F.col("id").alias("doc_id"), F.col("component"))


def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>): joins where null keys match null keys
    (standard equality drops them)."""
    o = _t(spark, sf_dir, "orders")
    # derive a nullable key: null for non-F orders on both sides
    keyed = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", F.col("o_custkey")).alias("k"),
    )
    counts = keyed.groupBy("k").agg(F.count("*").alias("n_same_key"))
    return keyed.join(counts, keyed.k.eqNullSafe(counts.k), "inner").select(
        "o_orderkey", "n_same_key"
    )


def q_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/filtered aggregation: one pass, many predicates."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.count(F.when(F.col("l_tax") > 0.04, 1)).alias("n_taxed"),
        F.round(
            F.sum(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice"))), 2
        ).alias("bulk_revenue"),
        F.count("*").alias("n"),
    )


def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode (lateral view): top-10 most frequent tokens across the
    corpus — the token-histogram primitive of corpus analysis."""
    from etl_orders_to_bq_spark.functions.text import tokenize

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokenize("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(10)
    )


def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts, one column per event type."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    day = F.date_trunc("day", F.col("ts")).alias("day")
    return (
        e.groupBy(day)
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )


def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-segment z-score of account
    balance — the per-group Python escape hatch (Arrow batch per group;
    a built-in window expresses this too, which is what the oracle
    uses to cross-check the UDF path)."""
    import pandas as pd

    c = _t(spark, sf_dir, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["c_acctbal"].std(ddof=1)
        z = (pdf["c_acctbal"] - pdf["c_acctbal"].mean()) / std
        return pd.DataFrame(
            {"c_custkey": pdf["c_custkey"], "zscore": z.round(4)}
        )

    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, schema="c_custkey long, zscore double"
    )


def q_ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (8 bits, seed 42) — the
    file-pruning key for the scale ANN path. Deterministic LCG planes,
    reproducible in the SQL oracle as literal arrays."""
    from etl_orders_to_bq_spark.operators.ann import with_lsh_bucket

    e = _t(spark, sf_dir, "embeddings")
    return with_lsh_bucket(e, dim=64, bits=8).select("vec_id", "bucket")


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (streaming-style, batch mode)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_analytic_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window family beyond ranking: ntile quartiles,
    percent_rank, cume_dist, lead — one pass, one shuffle on o_custkey."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
    )


def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small dims (the one join shape with no
    key): at scale only ever small x small, executed as broadcast
    nested loop."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return n.crossJoin(F.broadcast(r)).select(
        "n_nationkey",
        "r_regionkey",
        F.concat_ws("-", "n_name", "r_name").alias("pair"),
    )


def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family: shifts, and/or/xor — used by the engine
    itself for simhash and LSH bucket arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.shiftleft(F.col("l_linenumber"), 3).alias("ln_shl3"),
        F.shiftright(F.col("l_orderkey"), 2).alias("ok_shr2"),
        (F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("ok_and_255"),
        (F.col("l_linenumber").bitwiseOR(F.lit(8))).alias("ln_or_8"),
        (F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber"))).alias("ok_xor_ln"),
    )


def q_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date interval arithmetic: add_months, last_day, quarter,
    month-truncation — the partition-key derivations of a time-
    partitioned lake layout."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months(F.col("o_orderdate"), 3).alias("plus_3mo"),
        F.last_day(F.col("o_orderdate")).alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.trunc(F.col("o_orderdate"), "mm").alias("month_start"),
        F.weekofyear("o_orderdate").alias("iso_week"),
    )


def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: token + 0-based position per document —
    the lateral-view shape used for n-gram/window feature extraction."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
    )


def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct ordering semantics: max(struct(price, key)) per customer
    is a one-pass argmax — no window, no second shuffle; fields are
    unpacked to scalars for the oracle compare."""
    o = _t(spark, sf_dir, "orders")
    best = o.groupBy("o_custkey").agg(
        F.max(F.struct("o_totalprice", "o_orderkey")).alias("best")
    )
    return best.select(
        "o_custkey",
        F.col("best.o_totalprice").alias("best_price"),
        F.col("best.o_orderkey").alias("best_orderkey"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-stratum rates via md5
    bucketing (URGENT 50%, HIGH 20%, rest 5%) — reproducible on any
    engine/partitioning, unlike rand()-based sampleBy."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    rate = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 50)
        .when(F.col("o_orderpriority") == "2-HIGH", 20)
        .otherwise(5)
    )
    return o.filter(bucket < rate).select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )


def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.
    Two broadcast dims (supplier-nation, customer-nation) around the
    lineitem–orders fact-fact join; nation filters push below the
    joins, pruning both fact scans."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cust = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    pairs = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .filter(pairs)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month —
    conditional aggregate over a fact–dim join; the date filter prunes
    the fact scan before the join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with any single order above a
    quantity threshold. The HAVING runs on the lineitem agg FIRST
    (shrinks to a handful of keys), then joins climb back out — the
    reduce-before-join discipline at fact scale."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


def q_q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted to fixture columns): revenue under
    OR-of-ANDs predicates spanning both join sides. Catalyst extracts
    the common p_partkey equi-condition so this stays a hash join with
    a residual filter — never a nested-loop theta join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 20))
        | (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity").between(10, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def q_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: reconcile each order's header total
    against the sum of its line items — both sides arrive at the same
    Python worker pre-shuffled on the key, one Arrow batch per group
    side. Demonstrates the cogroup API; the same semantics in pure SQL
    is the oracle (and the faster plan — cogroup is for logic SQL
    can't express, this query just proves the plumbing at parity)."""
    import pandas as pd

    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 20 == 0)
        .select("l_orderkey", "l_extendedprice")
    )

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["o_orderkey", "o_totalprice", "line_sum", "diff"]
            )
        key = left["o_orderkey"].iloc[0]
        total = left["o_totalprice"].iloc[0]
        line_sum = float(right["l_extendedprice"].sum())
        return pd.DataFrame(
            {
                "o_orderkey": [key],
                "o_totalprice": [total],
                "line_sum": [line_sum],
            }
        )

    raw = (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            reconcile,
            "o_orderkey long, o_totalprice double, line_sum double",
        )
    )
    # round Spark-side: Python's round() is banker's rounding, Spark/SQL
    # round half away from zero — keep one rounding rule end-to-end
    return raw.select(
        "o_orderkey",
        "o_totalprice",
        F.round("line_sum", 2).alias("line_sum"),
        F.round(F.col("o_totalprice") - F.col("line_sum"), 2).alias("diff"),
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF): carry each user's last purchase value
    forward over non-purchase events — last_value(ignoreNulls) over an
    unbounded-preceding frame. The standard sensor/time-series repair;
    one shuffle on user_id, streaming frame, O(1) state per row."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date spine: generate every month in the data's range (sequence +
    explode — no table needed), left-join monthly order counts, zero-
    fill empty months. The reporting-calendar shape; the spine is tiny
    and broadcasts, the agg side shuffles months not rows."""
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 month"))
        ).alias("month_start")
    )
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start")
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    return (
        spine.join(monthly, "month_start", "left")
        .select(
            F.to_date("month_start").alias("month_start"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("revenue", F.lit(0.0)), 2).alias("revenue"),
        )
    )


def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via VariantType (Spark 4): parse once into
    the binary variant encoding, then typed path extraction — no schema
    declaration, no per-access re-parse (vs get_json_object which
    re-parses the string per call). The open-table-format answer to
    schemaless event payloads at scale."""
    e = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        "event_type",
        F.variant_get(v, "$.k", "int").alias("k"),
    ).filter(F.col("k") % 3 == 0)


_RECURSIVE_ANCESTORS_SQL = """
    with recursive ancestors(start_key, node, depth) as (
      select c_custkey, c_custkey, 0
      from customer where c_custkey % 97 = 0
      union all
      select start_key, cast(floor(node / 2) as bigint), depth + 1
      from ancestors where node > 1
    )
    select start_key,
           cast(max(depth) as int) as root_depth,
           cast(count(*) as bigint) as chain_len
    from ancestors
    group by start_key
"""


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): ancestor walk over the implicit binary
    tree parent(k)=k//2 — iterative plans expressed declaratively,
    executed as repeated union steps until fixpoint. The same SQL text
    is the oracle (DuckDB shares the dialect here), which is the point:
    the SQL surface covers iteration without hand-rolled loops."""
    from etl_orders_to_bq_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir, ["customer"])
    return spark.sql(_RECURSIVE_ANCESTORS_SQL)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: emails/URLs/phones/IPs replaced with typed
    placeholders — chained regexp_replace, zero UDF. The fixture text
    is PII-free, so PII is synthesized deterministically per doc (the
    redaction expressions are what's under test, as with
    o2_cast_repair's synthesized dirt)."""
    from etl_orders_to_bq_spark.functions.text import redact_pii

    d = _t(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@example.com or call 555-123-"),
        F.lpad(F.col("doc_id") % 10000, 4, "0"),
        F.lit(" docs at https://ex.com/d/"),
        F.col("doc_id"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256),
        F.lit(".7"),
    )
    return d.select(
        "doc_id",
        redact_pii(dirty).alias("clean_text"),
    )


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: 3-gram shingles occurring in many
    distinct documents (the repeated header/footer/nav text a corpus
    cleaner strips). Shuffles 32-byte-ish shingle keys, never
    documents; map-side distinct before the count."""
    from etl_orders_to_bq_spark.functions.text import word_ngrams

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(word_ngrams("text", 3)).alias("shingle"))
        .distinct()
        .groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 5)
    )


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: per corpus document, how many of its
    distinct 3-gram shingles also occur in the benchmark set (doc_id <
    10 stands in for the eval suite). The shingle-level inner join is
    the scalable form — benchmark shingles are tiny and broadcast."""
    from etl_orders_to_bq_spark.functions.text import word_ngrams

    d = _t(spark, sf_dir, "documents")
    shingled = d.select(
        "doc_id", F.explode(word_ngrams("text", 3)).alias("shingle")
    ).distinct()
    bench = (
        shingled.filter(F.col("doc_id") < 10).select("shingle").distinct()
    )
    corpus = shingled.filter(F.col("doc_id") >= 10)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_shingles"))
    )


def q_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: per user, the time-ordered event-type path and a
    signup→purchase conversion flag. collect_list carries no ordering
    guarantee, so order is imposed by sorting struct(ts, event_id, ·)
    AFTER collection — deterministic at any partitioning, one shuffle
    on user_id."""
    e = _t(spark, sf_dir, "events")
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ),
        lambda x: x["event_type"],
    )
    path = F.array_join(ordered, ">")
    return (
        e.groupBy("user_id")
        .agg(path.alias("path"), F.count("*").alias("n_events"))
        .select(
            "user_id",
            "n_events",
            "path",
            (
                F.locate("purchase", F.col("path"))
                > F.when(
                    F.locate("signup", F.col("path")) > 0,
                    F.locate("signup", F.col("path")),
                ).otherwise(F.lit(2**31 - 1))
            ).alias("converted"),
        )
    )


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: exact global top-20 tokens by document
    frequency. Two-level agg (distinct doc-token, then token count)
    with TakeOrderedAndProject — per-partition heaps, no global sort;
    the exact baseline a count-min sketch would approximate at 100 TB."""
    from etl_orders_to_bq_spark.functions.text import tokenize

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokenize("text")).alias("token"))
        .distinct()
        .groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("token"))
        .limit(20)
    )


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5 suppliers' share of ASIA's STANDARD-part
    market by order year. Four dims broadcast (two nation roles),
    conditional-sum ratio in one shuffle on the year key; part filter
    applied before the fact join so the scan is pruned first."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nkey"), "n_regionkey"
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n1), F.col("c_nationkey") == F.col("cust_nkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n2), F.col("s_nationkey") == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution via left outer
    join with a join-time predicate, then a two-level aggregation.
    Customers with zero (non-urgent) orders survive the outer join and
    land in the c_count=0 bucket."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (~F.col("o_orderpriority").startswith("1-")),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, then the
    supplier(s) hitting the global max — a scalar-subquery max joined
    back (broadcast, 1 row) instead of a global sort. Revenue is
    rounded to 2 dp BEFORE the max comparison so the selected row set
    is identical on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(broadcast(mx), rev.total_revenue == mx.max_revenue)
        .join(broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average re-expressed as the
    scalable pre-aggregate + equi-join. lineitem is semi-filtered to the
    brand's parts BEFORE the per-part average, so the heavy agg runs on
    the reduced set (the correlated subquery only ever needs those
    parts)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    brand_li = li.join(broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey")).drop(
        "p_partkey"
    )
    thresh = brand_li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        brand_li.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


def q_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers above the global
    average balance (scalar subquery, broadcast 1-row join) with no
    RECENT orders (anti join against the date-filtered fact — the
    filter is pushed below the anti join), rolled up by market
    segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1999-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q_q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the quadruple-correlation EXISTS / NOT EXISTS
    query, decorrelated to one LEFT SEMI + one LEFT ANTI join — no
    per-row subquery execution anywhere in the plan.

    The fixture schema has no l_commitdate/l_receiptdate, so "kept the
    order waiting" is re-expressed on the available columns: a lineitem
    is LATE when it ships >60 days after its order date. For suppliers
    in NATION_7, count lineitems of finished ('F') orders where the
    supplier was late, ANOTHER supplier contributed to the same order
    (EXISTS -> semi join), and NO OTHER supplier was late on that order
    (NOT EXISTS -> anti join).

    Scale shape: the nation filter lands on l1 FIRST via a broadcast
    semi (cuts the probe side ~25x before the heavy order-level joins);
    the semi/anti sides carry only (orderkey, suppkey) pairs."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nation_supp = s.join(
        broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", "s_name")

    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    late_pairs = late.select("l_orderkey", "l_suppkey").distinct()

    l1 = late.join(broadcast(nation_supp), li.l_suppkey == F.col("s_suppkey"))
    other_supp = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    ).distinct()
    l1 = l1.join(
        other_supp,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    other_late = late_pairs.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    l1 = l1.join(
        other_late,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        l1.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def q_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN with a correlated aggregate subquery,
    decorrelated to aggregate + join + semi-join.

    No partsupp table in the fixture schema, so "holds excess stock of
    a forest part" becomes: a NATION_3 supplier qualifies when for SOME
    red part they shipped more than 30% of that part's total 1997
    volume (their per-part 1997 sum vs the correlated all-supplier
    per-part 1997 sum). The oracle states it as the literal nested
    IN + correlated HAVING; this side pre-aggregates both levels and
    joins — the only scalable execution of that SQL."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    red_li = li.join(broadcast(red), li.l_partkey == F.col("p_partkey"), "left_semi")
    per_supp_part = red_li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_part = red_li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("part_qty")
    )
    qualifying = (
        per_supp_part.join(per_part, "l_partkey")
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


def q_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: orders x lineitem fact-fact join with a
    lateness predicate, conditional-sum priority split.

    The fixture has no l_shipmode/l_receiptdate; the group key is
    l_linestatus and "received late" is l_shipdate > orderdate+45d
    within ship-year 1998. Priority split is the canonical
    URGENT|HIGH vs rest conditional aggregation."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


def q_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation x order year over a
    part-name pattern, five-way join with broadcast dims.

    No partsupp.ps_supplycost in the fixture, so unit cost is proxied
    by 1% of p_retailprice: amount = extprice*(1-disc) -
    0.01*p_retailprice*l_quantity. Part filter (name contains 'red')
    lands on the scan before any join. The per-row amount is cast to
    DECIMAL(18,4) before summing: the double sum of ~60k signed terms
    lands within float jitter of the 2dp rounding boundary (~2 of 175
    groups flip pennies vs the oracle); decimal accumulation is exact
    and partition-order-independent, so both engines agree exactly."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.01
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(amount.cast("decimal(18,4)")).cast("double"), 2
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


def q_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one nation's suppliers,
    kept only above a scalar-subquery threshold over the whole set.

    partsupp value is re-expressed as shipped revenue by NATION_1
    suppliers; "important" = value above 2x the average per-part value
    (a scale-invariant threshold — the fixture has no part skew, so
    TPC-H's fraction-of-total form selects 0 rows at sf>=0.1). The
    scalar reuses the SAME aggregated frame (self-scalar), broadcast
    as a 1-row frame — no second scan of lineitem at scale (the agg
    input is the already-reduced per-part frame)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nation_li = li.join(
        broadcast(
            s.join(broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
        ),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    )
    per_part = nation_li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val")
    )
    total = per_part.agg((F.avg("val") * F.lit(2.0)).alias("thresh"))
    return (
        per_part.join(broadcast(total))
        .filter(F.col("val") > F.col("thresh"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("val", 2).alias("value"),
        )
        .orderBy(F.desc("value"), F.asc("partkey"))
    )


def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery (cheapest supplier per
    part within a region), decorrelated to a groupBy-min + equality
    join back.

    partsupp.ps_supplycost is re-expressed as the observed unit price
    min(l_extendedprice/l_quantity) per (part, supplier) from EUROPE
    suppliers' shipments of SMALL parts sized 1-10. MIN is an exact
    selection (no float accumulation), so the equality join back on the
    double is deterministic across engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_supp = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(broadcast(eur_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    min_cost = offers.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        offers.join(
            min_cost,
            (offers.p_partkey == F.col("mc_partkey"))
            & (offers.unit_cost == F.col("min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("p_partkey").alias("partkey"),
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "partkey")
        .limit(100)
    )


def q_q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: count-distinct suppliers per part attribute
    bucket, excluding a NOT-IN supplier set (anti join).

    "Customer complaints" is re-expressed as negative account balance.
    The exclusion is a broadcast LEFT ANTI (s_suppkey is non-null so
    NOT IN == anti join); supplier-part relationships come from
    lineitem, distinct-aggregated after the part broadcast join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events stream: users are
    cohorted by first-active week, activity is reduced to distinct
    user-weeks FIRST (the big cardinality drop), then one join + one
    rollup produce the (cohort, week_offset) retention triangle."""
    e = _t(spark, sf_dir, "events")
    first_week = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        activity.join(first_week, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def q_decile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-spend decile report with EXACT ntile(10) semantics but
    NO single-partition window: operators/ranking.py's scalable_ntile
    (repartitionByRange + per-partition row_number + broadcast prefix
    offsets) — every stage partition-parallel, bit-for-bit equal to the
    window ntile the oracle computes. The pre-aggregated frame is one
    row per customer, so the old global window was survivable locally,
    but at 100 TB customers this is the shape that actually scales."""
    from etl_orders_to_bq_spark.operators.ranking import scalable_ntile

    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    tiled = scalable_ntile(
        spend, [F.desc("spend"), F.asc("o_custkey")], 10, out_col="decile"
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
            F.round(F.avg("spend"), 4).alias("avg_spend"),
        )
        .orderBy("decile")
    )


def q_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive active days via
    the row_number subtraction trick (day - rn is constant within a
    run). Distinct user-days first, one window partitioned by user, one
    groupBy — both shuffles on the user key."""
    e = _t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        days.withColumn("anchor", F.date_sub(F.col("day"), F.row_number().over(w)))
        .groupBy("user_id", "anchor")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count("*").alias("streak_days"),
        )
        .drop("anchor")
        .orderBy("user_id", "streak_start")
    )


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per active day. Events are
    collapsed to distinct user-days first, then a bounded range join
    (each day joins ≤7 days back) feeds a distinct count. The range
    span is a constant 7 days, so the join fan-out is bounded — at
    scale this keys on day and stays a small-side broadcast."""
    e = _t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    ends = days.select("day").distinct()
    # each user-day contributes to exactly 7 window-ends: EXPLODE the
    # bounded sequence (a projection, fan-out = 7) instead of a
    # nested-loop range join (O(rows x days) comparisons at scale),
    # then keep only window-ends that are observed active days via a
    # broadcast hash equi-join on the tiny day list
    contrib = days.withColumn(
        "win_end",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))),
    )
    return (
        contrib.join(
            broadcast(ends.withColumnRenamed("day", "win_end")), "win_end"
        )
        .groupBy("win_end")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .orderBy("win_end")
    )


def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Gini coefficient) per nation over
    customer lifetime revenue — the inequality readout of a
    concentration dashboard, computed from the sorted-rank identity
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n (x ascending): one window
    rank per nation + one aggregation, both on the nation key. The
    customer-revenue rollup shuffles once on custkey before joining
    the (broadcast) customer dim. The oracle replays the identity."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    j = rev.join(
        broadcast(c), rev.o_custkey == c.c_custkey
    ).select("c_nationkey", "o_custkey", "rev")
    w = Window.partitionBy("c_nationkey").orderBy("rev", "o_custkey")
    ranked = j.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("rev"))
                / (F.count("*") * F.sum("rev"))
                - (F.count("*") + 1.0) / F.count("*"),
                6,
            ).alias("gini"),
        )
        .orderBy("c_nationkey")
    )


def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=5 per source, via the
    Efraimidis-Spirakis exponential-key trick: key = -ln(u)/w with u a
    deterministic md5-uniform and w = n_chars; the k SMALLEST keys per
    stratum are exactly a weighted reservoir draw — fully distributed
    (a per-row projection + per-group top-k WindowGroupLimit), where a
    sequential reservoir would serialize the stream. Deterministic
    across engines and runs; the oracle replays key and ranking."""
    d = _t(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1.0
    ) / 4294967297.0  # (hash+1)/(2^32+1): u in (0,1), never 0 or 1
    key = -F.log(u) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy("key", "doc_id")
    return (
        d.select("doc_id", "source", "n_chars", key.alias("key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "rk", "doc_id", "n_chars")
        .orderBy("source", "rk")
    )


def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary drift (operators/lm.py::
    source_kl_divergence): KL(source || corpus) over add-one-smoothed
    unigram distributions, summed over the WHOLE vocabulary so absent
    words carry their smoothed mass. One corpus scan; the |S| x |V|
    grid is the honest exact-KL cost (truncate the vocab at extreme
    scale). The oracle replays the smoothing and the ln-difference
    sum in SQL."""
    from etl_orders_to_bq_spark.operators.lm import source_kl_divergence

    d = _spread_if_underpartitioned(spark, _t(spark, sf_dir, "documents"))
    return source_kl_divergence(d).orderBy("source")


def q_rule_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quality routing (operators/quality.py::quarantine):
    orders checked against four expectation rules in ONE projection
    pass (price cap, date horizon, priority allowlist, referential
    customer existence via a broadcast semi-join flag prepared
    upstream); output is the violation census — per-rule counts plus
    the clean-row count — that a quarantine pipeline reports before
    routing. The oracle recomputes each census row with conditional
    counts."""
    from etl_orders_to_bq_spark.operators.quality import quarantine

    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    flagged = o.join(
        broadcast(cust.withColumn("__known_cust", F.lit(True))),
        "o_custkey",
        "left",
    )
    rules = {
        "price_cap": F.col("o_totalprice") <= 400000.0,
        "date_horizon": F.col("o_orderdate") < F.lit("1998-06-01").cast(
            "timestamp"
        ),
        "priority_allowed": F.col("o_orderpriority").isin(
            "1-URGENT", "2-HIGH", "3-MEDIUM"
        ),
        "known_customer": F.col("__known_cust").isNotNull(),
    }
    ann = quarantine(flagged, rules)
    per_rule = (
        ann.select(F.explode("violations").alias("rule"))
        .groupBy("rule")
        .agg(F.count("*").alias("n_rows"))
    )
    clean = ann.filter(F.size("violations") == 0).agg(
        F.lit("__clean").alias("rule"), F.count("*").alias("n_rows")
    )
    return per_rule.unionByName(clean).orderBy("rule")


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to OHLC bars: per (event_type, hour),
    open/close via min_by/max_by on a deterministic (ts, event_id)
    order key, high/low/volume as plain aggregates — ONE map-side-
    combinable groupBy, the resample shape that turns a tick stream
    into bars without a window sort. The oracle replays min_by/max_by
    with a fixed-width sortable key (DuckDB's min_by can't take a
    struct key)."""
    e = _t(spark, sf_dir, "events")
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bar_hour")
        )
        .agg(
            F.min_by("value", okey).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count("*").alias("volume"),
        )
        .orderBy("event_type", "bar_hour")
    )


def q_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-eval metrics (operators/fusion.py::ranking_metrics):
    per-language ranked lists (docs ranked by length, deterministic
    tie-break) scored against a graded relevance label (source-suffix
    derived) — NDCG@10 with whole-list ideal normalization, MRR, and
    precision@10. One window + one groupBy, both on the query key.
    The oracle replays discount, ideal re-rank, and reciprocal rank
    in SQL."""
    from etl_orders_to_bq_spark.operators.fusion import ranking_metrics

    d = _t(spark, sf_dir, "documents")
    rank_w = Window.partitionBy("lang").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    rel = (
        F.when(F.col("source").endswith("0"), 2)
        .when(F.col("source").endswith("5"), 1)
        .otherwise(0)
    )
    ranked = d.select(
        "lang",
        F.row_number().over(rank_w).alias("rank"),
        rel.alias("relevance"),
    )
    return ranking_metrics(
        ranked, group_col="lang", k=10
    ).orderBy("lang")


def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence test over the source x lang
    contingency table — the categorical-drift check of a data-quality
    gate. The expected-count grid is the (tiny) cross join of the row
    and column marginals so ZERO-observed cells contribute their
    (0-E)^2/E term (dropping them understates the statistic); observed
    counts left-join on. One groupBy over the data; everything after
    runs on marginal-sized frames. The oracle replays the grid."""
    d = _t(spark, sf_dir, "documents")
    # ONE groupBy over the data; marginals are exact rollups of the
    # (tiny) cell table, staged so its three consumers don't re-scan
    cells = d.groupBy("source", "lang").agg(F.count("*").alias("obs"))
    cells = cells.localCheckpoint(eager=False)
    rows = cells.groupBy("source").agg(F.sum("obs").alias("rt"))
    cols = cells.groupBy("lang").agg(F.sum("obs").alias("ct"))
    total = cells.agg(F.sum("obs").alias("n"))
    grid = (
        rows.crossJoin(broadcast(cols))
        .join(cells, ["source", "lang"], "left")
        .crossJoin(broadcast(total))
        .withColumn("obs", F.coalesce("obs", F.lit(0)))
        .withColumn("exp", F.col("rt") * F.col("ct") / F.col("n"))
    )
    term = (F.col("obs") - F.col("exp")) * (F.col("obs") - F.col("exp")) / F.col("exp")
    return grid.agg(
        F.round(F.sum(term), 6).alias("chi2"),
        (
            (F.count_distinct("source") - 1) * (F.count_distinct("lang") - 1)
        ).alias("dof"),
        F.max("n").alias("n"),
    )


def q_exact_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified train/val/test split: per source, documents are
    ranked in deterministic md5 order and cut at exactly 80%/90% of the
    stratum count — the reproducible-split contract ML pipelines need
    (Bernoulli hash sampling only hits the proportions in expectation;
    this hits them exactly, any engine, any run). One window shuffle
    per stratum; the oracle replays rank + thresholds in SQL."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wc = Window.partitionBy("source")
    rn = F.row_number().over(w)
    cnt = F.count("*").over(wc)
    split = (
        F.when(rn <= F.floor(cnt * 0.8), "train")
        .when(rn <= F.floor(cnt * 0.9), "val")
        .otherwise("test")
    )
    return (
        d.select("doc_id", "source", split.alias("split"))
        .orderBy("doc_id")
    )


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout in one aggregation pass: users hash-split
    into control/treatment (md5 parity — the deterministic assignment
    real experiment frameworks use), per-arm n/mean/sample-variance of
    purchase values via conditional aggregates (no join, no second
    scan), then Welch's t statistic and its Satterthwaite degrees of
    freedom as a projection over the 1-row aggregate. The oracle
    replays the identical formula; both engines' var_samp agree at the
    6-dp rounding."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
    )
    t_val = F.when(arm == 1, F.col("value"))
    c_val = F.when(arm == 0, F.col("value"))
    agg = e.agg(
        F.count(c_val).alias("n_c"),
        F.count(t_val).alias("n_t"),
        F.avg(c_val).alias("mean_c"),
        F.avg(t_val).alias("mean_t"),
        F.var_samp(c_val).alias("var_c"),
        F.var_samp(t_val).alias("var_t"),
    )
    se2_c = F.col("var_c") / F.col("n_c")
    se2_t = F.col("var_t") / F.col("n_t")
    t_stat = (F.col("mean_t") - F.col("mean_c")) / F.sqrt(se2_t + se2_c)
    dof = (se2_t + se2_c) * (se2_t + se2_c) / (
        se2_t * se2_t / (F.col("n_t") - 1) + se2_c * se2_c / (F.col("n_c") - 1)
    )
    return agg.select(
        "n_c",
        "n_t",
        F.round("mean_c", 6).alias("mean_c"),
        F.round("mean_t", 6).alias("mean_t"),
        F.round(F.col("mean_t") - F.col("mean_c"), 6).alias("lift"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round(dof, 3).alias("dof"),
    )


def q_rolling_active_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-merged form of rolling_active_users — the shape
    SCALING.md prescribes when exact sliding-window distincts stop
    map-side combining: ONE HLL sketch per day (lgK=12), each day's
    SKETCH (a few KB, not its user-days) explodes to the ≤7 window
    ends it serves, hll_union_agg merges 7 sketches per end. The exact
    count rides the same query so the estimate gates against its
    published error (3x rsd ≈ 5%) via the bounded-error-oracle
    pattern; the oracle recomputes the exact rolling distincts and
    pins the boolean."""
    e = _t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    ends = days.select("day").distinct()
    daily = days.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    contrib = daily.withColumn(
        "win_end",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))),
    )
    approx = (
        contrib.join(
            broadcast(ends.withColumnRenamed("day", "win_end")), "win_end"
        )
        .groupBy("win_end")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_7d"))
    )
    exact_contrib = days.withColumn(
        "win_end",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))),
    )
    exact = (
        exact_contrib.join(
            broadcast(ends.withColumnRenamed("day", "win_end")), "win_end"
        )
        .groupBy("win_end")
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )
    return (
        exact.join(approx, "win_end")
        .select(
            "win_end",
            "active_7d",
            (
                F.abs(F.col("approx_7d") - F.col("active_7d"))
                <= F.greatest(F.col("active_7d") * 0.05, F.lit(1.0))
            ).alias("hll_within_bound"),
        )
        .orderBy("win_end")
    )


def q_histogram_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: bucket index as a pure
    projection (floor divide, capped top bucket) feeding one map-side
    combinable aggregation — the scan-shaped profile query."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / F.lit(50000.0)), F.lit(9)).cast(
        "int"
    )
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("bucket")
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sampling for training-mix
    curation: keep probability depends on the source (md5-uniform <
    per-source weight), reproducible across engines and runs — the
    seeded complement to source_quota's fixed-N-per-source."""
    d = _t(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    weight = (F.lit(1.0) + (src_num % 5)) / F.lit(10.0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|ws"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return (
        d.filter(u < weight)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def q_ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range similarity search: ALL vectors within cosine >= 0.2 of the
    vec_id=0 query (not top-k). One linear scan, norms as projections,
    threshold on the ROUNDED score so both engines select the same row
    set. Range search has no ranking contract, so the result is returned
    UNSORTED — at 100 TB with a loose threshold the match set is
    unbounded and a global sort over it would be a full-shuffle
    scale-killer (the gate hash is order-insensitive; the oracle keeps
    its ORDER BY only for its own determinism).

    NOTE: this is a deliberate EXACT linear scan — the oracle-grade
    baseline for range semantics. At scale, point users at the indexed
    paths instead: operators/ann.py ann_topk_ivf (cluster-partitioned,
    probe-bounded) or ann_topk_lsh/PQ — range search over an IVF index
    is the same search with the distance filter replacing top-k."""
    from etl_orders_to_bq_spark.functions.vectors import dot, l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = F.array(*[F.lit(float(x)) for x in target["embedding"]])
    cos = F.round(
        dot(F.col("embedding"), qvec) / (l2_norm("embedding") * l2_norm(qvec)), 6
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.2)
    )


def q_regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (slope/intercept/r2/count of
    extendedprice vs quantity per return flag) — single-pass
    map-side-combinable moments, the OLS profile an optimizer or
    quality monitor runs over a fact column pair."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
                "slope"
            ),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
                "intercept"
            ),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
        )
        .orderBy("l_returnflag")
    )


def q_mode_median_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() and median() per order priority. The mode target
    (o_orderstatus, 3 heavily skewed values) has a unique winner per
    group, so the tie-arbitrary mode is deterministic here."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.mode("o_orderstatus").alias("modal_status"),
            F.round(F.median("o_totalprice"), 4).alias("median_price"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with LIMIT: per region, the top-2
    nations by total customer balance. Catalyst rewrites the lateral
    into a ranked join (DomainJoin -> window), so it scales like the
    window top-k it denotes."""
    from etl_orders_to_bq_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir, ["region", "nation", "customer"])
    return spark.sql(
        """
        select r.r_name, l.n_name, l.total_bal
        from region r,
        lateral (
          select n_name,
                 round(sum(c_acctbal), 2) as total_bal
          from nation join customer on c_nationkey = n_nationkey
          where n_regionkey = r.r_regionkey
          group by n_name
          order by total_bal desc, n_name asc
          limit 2
        ) l
        order by r.r_name, l.total_bal desc, l.n_name asc
        """
    )


def q_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface: orders serialized to XML strings, parsed back with
    from_xml (schema-on-read), fields extracted from the struct — the
    ingest shape for XML feeds. Roundtrip parity makes the oracle the
    identity projection."""
    o = _t(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<order><id>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</id><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><total>"),
        F.col("o_totalprice").cast("string"),
        F.lit("</total></order>"),
    )
    parsed = o.select(
        "o_orderkey", F.from_xml(xml, "id BIGINT, status STRING, total DOUBLE").alias("x")
    )
    return parsed.select(
        "o_orderkey",
        F.col("x.id").alias("xml_id"),
        F.col("x.status").alias("xml_status"),
        F.round(F.col("x.total"), 2).alias("xml_total"),
    )


def q_streaming_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join through the real engine: clicks
    with purchases within 30 min after, per user; clicks with no
    matching purchase are emitted with nulls once the watermark passes
    the end of their match window (the availableNow run's final
    no-data micro-batch advances the watermark to max(ts) - 10 min and
    flushes evictable state)."""
    from etl_orders_to_bq_spark.streaming.events import correlate_streams

    path = _stage_event_stream(spark, sf_dir, "plain")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    clicks = (
        spark.readStream.schema(schema)
        .parquet(path)
        .filter(F.col("event_type") == "click")
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(path)
        .filter(F.col("event_type") == "purchase")
    )
    joined = correlate_streams(
        clicks, purchases, key="user_id", within="30 minutes",
        watermark="10 minutes", how="left_outer",
    )
    out = _stream_to_batch(joined, "ssojoin", "append")
    return out.select("user_id", "l_event_id", "r_event_id", "r_value")


def q_streaming_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream join through the real engine —
    completes the stream-stream matrix (inner / left-outer /
    full-outer). Unmatched clicks flush when the watermark passes the
    end of their 30-min match window; unmatched purchases flush when
    it passes their own timestamp (no earlier click can still
    arrive). The oracle states both eviction rules in batch SQL."""
    from etl_orders_to_bq_spark.streaming.events import correlate_streams

    path = _stage_event_stream(spark, sf_dir, "plain")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    clicks = (
        spark.readStream.schema(schema)
        .parquet(path)
        .filter(F.col("event_type") == "click")
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(path)
        .filter(F.col("event_type") == "purchase")
    )
    joined = correlate_streams(
        clicks, purchases, key="user_id", within="30 minutes",
        watermark="10 minutes", how="full_outer",
    )
    out = _stream_to_batch(joined, "ssfojoin", "append")
    return out.select("user_id", "l_event_id", "r_event_id", "r_value")


def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python Data Source API: a pure-Python partitioned source
    (no JVM connector) feeding a normal Catalyst agg. Every field is a
    deterministic function of the row id, so the DuckDB oracle rebuilds
    the same corpus from generate_series."""
    from etl_orders_to_bq_spark.sources.pydatasource import register_synthetic_docs

    register_synthetic_docs(spark)
    src = (
        spark.read.format("synthetic_docs")
        .option("rows", "5000")
        .option("partitions", "8")
        .load()
    )
    return (
        src.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum(F.length("text")).alias("sum_chars"),
        )
        .orderBy("source")
    )


def q_python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python Data Source STREAMING reader: the same pure-Python
    synthetic source consumed through the real micro-batch engine
    (offset-managed readStream -> stateful complete-mode agg -> memory
    sink). Deterministic row ids make the DuckDB generate_series oracle
    exact; the availableNow wrapper drains the capped stream in one
    batch (multi-batch incrementality is pytest-driven)."""
    from etl_orders_to_bq_spark.sources.pydatasource import register_synthetic_docs

    register_synthetic_docs(spark)
    src = (
        spark.readStream.format("synthetic_docs")
        .option("rows", "5000")
        .option("partitions", "8")
        .load()
    )
    agg = (
        src.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum(F.length("text")).alias("sum_chars"),
        )
    )
    return _stream_to_batch(agg, "pysrc_stream", "complete").orderBy("source")


def q_sketch_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable sketch rollup (DataSketches HLL + KLL): per-
    (type, day) sketches merged up to per-type rollups — the persist-
    sketches-once, merge-for-any-rollup pattern that answers 100 TB
    cardinality/quantile questions without re-scanning raw data.
    BOUNDED-ERROR oracle: estimates are engine-specific, but their
    accuracy contracts are not. The query returns the exact per-type
    distinct count and row count (cross-engine comparable) plus two
    booleans — the merged HLL (lgK=12) estimate within 5% of exact,
    and the KLL(k=200)-merged median inside the exact [p47, p53] value
    window (3x the ~1.65% a-priori rank error) — which the oracle pins
    true. The KLL path exercises the grouped n-way merge aggregate
    (kll_merge_agg_double), the shape a rollup pipeline needs."""
    from etl_orders_to_bq_spark.operators.sketches import (
        hll_merge,
        hll_rollup,
        kll_quantile_rollup,
        kll_quantiles,
    )

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    fine = hll_rollup(ev, ["event_type", "day"], "user_id", lg_k=12)
    merged = hll_merge(fine, ["event_type"])
    kfine = kll_quantile_rollup(ev, ["event_type", "day"], "value", k=200)
    kmerged = kll_quantiles(kfine, ["event_type"], [0.5])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("percentile(value, 0.47D)").alias("__p47"),
        F.expr("percentile(value, 0.53D)").alias("__p53"),
    )
    return (
        merged.join(kmerged, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_rows",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_users"))
                <= F.greatest(F.col("exact_users") * 0.05, F.lit(1.0))
            ).alias("hll_within_bound"),
            (
                (F.col("q_50") >= F.col("__p47"))
                & (F.col("q_50") <= F.col("__p53"))
            ).alias("kll_median_within_bound"),
        )
        .orderBy("event_type")
    )


def q_kll_quantile_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped quantile serving from persisted KLL sketches: per-
    (type, day) KLL(k=200) sketches merged per type with the native
    grouped n-way merge aggregate (kll_merge_agg_double), then p50/p95
    read off the merged sketch — the persist-once, answer-any-rollup
    quantile pattern. BOUNDED-ERROR oracle: each quantile must land
    inside the exact value window at rank +/- 3% (3x the ~1.65%
    a-priori rank error of k=200), pinned true by the oracle alongside
    cross-engine-exact group counts."""
    from etl_orders_to_bq_spark.operators.sketches import (
        kll_quantile_rollup,
        kll_quantiles,
    )

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    fine = kll_quantile_rollup(ev, ["event_type", "day"], "value", k=200)
    merged = kll_quantiles(fine, ["event_type"], [0.5, 0.95])
    exact = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.expr("percentile(value, 0.47D)").alias("__p47"),
        F.expr("percentile(value, 0.53D)").alias("__p53"),
        F.expr("percentile(value, 0.92D)").alias("__p92"),
        F.expr("percentile(value, 0.98D)").alias("__p98"),
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n",
            (
                (F.col("q_50") >= F.col("__p47"))
                & (F.col("q_50") <= F.col("__p53"))
            ).alias("kll_p50_within_bound"),
            (
                (F.col("q_95") >= F.col("__p92"))
                & (F.col("q_95") <= F.col("__p98"))
            ).alias("kll_p95_within_bound"),
        )
        .orderBy("event_type")
    )


def q_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra — the sketch family whose ENTIRE point
    is cross-sketch set operations: distinct click users union/
    intersect/minus distinct purchase users, each answered from two
    persisted sketch binaries instead of re-scanning events. BOUNDED-
    ERROR oracle: the exact cardinalities are computed cross-engine
    (one flags groupBy per user), and each theta estimate must land
    within 5% of its exact counterpart (below ~4k retained entries the
    sketch is in exact mode, so locally the estimates are exact; the
    bound is the contract that survives estimation mode at scale)."""
    ev = _t(spark, sf_dir, "events")
    sk = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("s_click"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("s_purch"),
    )
    est = sk.select(
        F.theta_sketch_estimate(
            F.theta_union("s_click", "s_purch")
        ).alias("__e_union"),
        F.theta_sketch_estimate(
            F.theta_intersection("s_click", "s_purch")
        ).alias("__e_int"),
        F.theta_sketch_estimate(
            F.theta_difference("s_click", "s_purch")
        ).alias("__e_diff"),
    )
    flags = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("c"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
    )
    exact = flags.agg(
        F.count(F.when(F.col("c") + F.col("p") > 0, 1)).alias("exact_union"),
        F.count(
            F.when((F.col("c") == 1) & (F.col("p") == 1), 1)
        ).alias("exact_int"),
        F.count(
            F.when((F.col("c") == 1) & (F.col("p") == 0), 1)
        ).alias("exact_diff"),
    )

    def _within(est_col: str, exact_col: str) -> Column:
        return F.abs(F.col(est_col) - F.col(exact_col)) <= F.greatest(
            F.col(exact_col) * 0.05, F.lit(1.0)
        )

    return est.crossJoin(exact).select(
        "exact_union",
        "exact_int",
        "exact_diff",
        _within("__e_union", "exact_union").alias("theta_union_within_bound"),
        _within("__e_int", "exact_int").alias("theta_int_within_bound"),
        _within("__e_diff", "exact_diff").alias("theta_diff_within_bound"),
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: word-level duplicate
    fraction and most-frequent-bigram fraction, the standard degenerate-
    document filters for training corpora. In-row Column algebra (the
    top-bigram count is the longest equal-run in the sorted bigram
    array) — a pure projection, zero shuffles; the oracle computes the
    same numbers with an unnest + group-by formulation."""
    from etl_orders_to_bq_spark.functions.text import repetition_stats

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", repetition_stats("text").alias("r"))
        .select("doc_id", "r.n_words", "r.dup_word_frac", "r.top_bigram_frac")
        .orderBy("doc_id")
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation trade graph (distinct customer-nation →
    supplier-nation edges from the order/lineitem fact): the second
    iterative algorithm after connected components. 10 fixed iterations,
    damping 0.85, dangling mass not redistributed — the exact formula an
    unrolled-CTE DuckDB oracle reproduces. Edge build broadcasts both
    dimension sides; each iteration is one |edges| shuffle."""
    from etl_orders_to_bq_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    r = pagerank(edges, "src", "dst", iterations=10, damping=0.85)
    return r.select(
        F.col("id").alias("nationkey"),
        F.round("rank", 6).alias("pagerank"),
    ).orderBy("nationkey")


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) data-layout census (functions/zorder.py): the
    multi-dimensional file-skipping layout behind Delta/Iceberg
    OPTIMIZE ZORDER. Interleave 8 bits each of normalized
    (o_custkey, o_totalprice) into one key — pure codegen'd Column bit
    math, no UDF — then range-bucket on the key's top 4 bits and report
    each bucket's min/max rectangle on BOTH dimensions: tight spans are
    exactly what parquet footer pruning needs, and a plain sort key
    only narrows one of them (tests/test_scale_plans.py measures the
    difference). Normalization bounds come from a 1-row stats agg (the
    catalog-stats stand-in — at 100 TB these are free table-level
    min/max, never a data scan). The oracle replays the identical
    scale-clip-interleave in SQL bit ops. No counterpart in the
    reference engine (SURVEY.md §2.2 — single-file pandas, no layout
    control)."""
    from etl_orders_to_bq_spark.functions.zorder import (
        normalize_to_bits,
        zorder_key,
    )

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    lo_c, hi_c, lo_p, hi_p = o.agg(
        F.min("o_custkey"),
        F.max("o_custkey"),
        F.min("o_totalprice"),
        F.max("o_totalprice"),
    ).first()
    z = o.withColumn(
        "zkey",
        zorder_key(
            normalize_to_bits(F.col("o_custkey"), lo_c, hi_c, bits=8),
            normalize_to_bits(F.col("o_totalprice"), lo_p, hi_p, bits=8),
            bits=8,
        ),
    )
    return (
        z.groupBy(F.shiftright("zkey", 12).cast("int").alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("bucket")
    )


def q_winsorize_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorize + robust scale (operators/quality.py):
    order totals clipped to their priority class's exact [p05, p95]
    fences and re-expressed as (wins - median) / IQR — the
    outlier-immune conditioning pass heavy-tailed metrics need before
    z-thresholds mean anything. One percentile-array groupBy (5 order
    statistics in one aggregate) broadcast back onto the fact; the
    oracle recomputes the same type-7 interpolated quantiles via
    DuckDB's quantile_cont."""
    from etl_orders_to_bq_spark.operators.quality import winsorize_robust

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return winsorize_robust(
        o, "o_totalprice", "o_orderpriority"
    ).orderBy("o_orderkey")


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM scoring (operators/lm.py): the
    KenLM-shaped perplexity filter one rung above unigram_logprob —
    Jelinek-Mercer mix of add-one-smoothed bigram and unigram
    probabilities, self-trained on the corpus, per-document mean over
    SORTED per-position values (the shuffle-order-stable fold). Word
    salad passes unigram filters; it fails this one."""
    from etl_orders_to_bq_spark.operators.lm import bigram_logprob_scores

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_logprob_scores(d, lam=0.7).orderBy("doc_id")


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LPA communities (operators/graph.py) over the SPARSE nation
    trade graph — each nation keeps only its top-3 trade partners by
    order-line volume (rank ties broken on dst for determinism), so
    real community structure survives instead of one dense clique. 4
    fixed synchronous rounds, min-label tie-break; the oracle unrolls
    the identical deliver-count-argmax rounds as CTEs."""
    from etl_orders_to_bq_spark.operators.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count("*").alias("v"))
    )
    w = Window.partitionBy("src").orderBy(
        F.col("v").desc(), F.col("dst").asc()
    )
    top3 = vol.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= 3
    )
    labels = label_propagation(top3, "src", "dst", rounds=4)
    return labels.select(
        F.col("id").alias("nationkey"), F.col("label").alias("community")
    ).orderBy("nationkey")


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (operators/graph.py) over a
    customer-order bipartite contraction of ``orders`` (custkey mod
    150 x orderkey mod 97 — sparse at every fixture SF, so degrees
    vary and scores discriminate). 2-hop pairs scored by
    sum 1/ln(deg(z)) over common neighbors, sorted-fold summed;
    existing edges excluded (prediction = NEW links). The oracle
    replays the symmetrize/degree/wedge joins and folds the same
    ascending weight list with list_reduce."""
    from etl_orders_to_bq_spark.operators.graph import adamic_adar

    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 150).alias("src"),
        (F.lit(1000) + F.col("o_orderkey") % 97).alias("dst"),
    )
    return adamic_adar(o).orderBy("node_a", "node_b")


def q_ewma_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA level (operators/timeseries.py): the value series
    sorted by (ts, value) folded through y <- 0.3x + 0.7y — the
    smoothing pass feeding drift detectors. The fold is the repo's
    sorted-fold float discipline, so the oracle replays it exactly
    with DuckDB's list_reduce over the identically-ordered list."""
    from etl_orders_to_bq_spark.operators.timeseries import ewma_last

    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return ewma_last(
        e, "user_id", "ts", "value", alpha=0.3
    ).orderBy("user_id")


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization (operators/quality.py):
    event values mapped from their per-event_type rank onto the global
    101-point exact-percentile grid — the calibration step for
    per-source score drift. Grid built in ONE percentile-array agg
    (broadcast back), ranks in one source-partitioned window; the grid
    index is floor((r-1)*100/(n-1) + 0.5) with multiply-before-divide
    so both engines land the identical integer."""
    from etl_orders_to_bq_spark.operators.quality import quantile_normalize

    e = _t(spark, sf_dir, "events")
    return quantile_normalize(
        e, "value", "event_type", "event_id", grid=101
    ).orderBy("event_id")


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-25 (operators/ann.py): 64-dim
    embeddings compressed to 8 codes over seeded 16-codeword books
    (the lloyd-centroid literal discipline — production fits books
    with per-subspace k-means), query LUT built driver-side, distance
    = s-ordered fold of LUT lookups. The oracle re-derives codebooks
    from the same literals, replays the argmin encode (left-assoc
    per-dim accumulation on both engines) and the prepend-0 fold."""
    from etl_orders_to_bq_spark.operators.ann import ann_topk_pq, pq_codebooks

    emb = _t(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    books = pq_codebooks(dim=64, subspaces=8, codewords=16, seed=23)
    return ann_topk_pq(emb, books, list(target["embedding"]), k=25)


def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs: binary payloads -> 64-bit perceptual hash
    (multimodal/binary.py, stub codec pinned: md5-top-64 — the
    deterministic fake the oracle mirrors; Pillow swaps in the real
    locality-sensitive average-hash) -> pigeonhole Hamming pairs
    (operators/dedup.py hamming_pairs, the simhash machinery
    generalized to any fingerprint). Planted byte-identical payloads
    are the guaranteed distance-0 positives. The oracle computes the
    same signed md5-top-64 and verifies ALL pairs by bit_count(xor)
    (exact at oracle scale; the pigeonhole join finds the identical
    <= max_dist set by construction). Branch accounting: THIS GATE
    always runs the stub branch (pinned, oracle-exact);
    multimodal.codec_branch("auto") reports what production would run
    on the host, and tests/test_multimodal.py asserts the REAL
    Pillow decode + aHash against genuine in-repo PNG fixtures
    whenever Pillow imports (stub assertions otherwise)."""
    from etl_orders_to_bq_spark.multimodal import perceptual_hash
    from etl_orders_to_bq_spark.operators.dedup import hamming_pairs

    d = _docs_with_planted_dups(spark, sf_dir)
    media = d.select(
        F.col("doc_id").alias("id"), F.encode("text", "UTF-8").alias("content")
    )
    ph = perceptual_hash(media, codec="stub")
    return hamming_pairs(
        ph, "phash", "id", bits=64, max_dist=3
    ).orderBy("id_a", "id_b")


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity census (operators/privacy.py) over the
    SAME quasi-identifiers as the k-anonymity report (mktsegment,
    nation, order year) with o_orderpriority as the sensitive
    attribute — the homogeneity-attack check k-anonymity misses: a
    big class whose members all share one priority still exposes it.
    Census shape (not raw risky classes), l=3."""
    from etl_orders_to_bq_spark.operators.privacy import l_diversity

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", F.year("o_orderdate").alias("yr")
    )
    q = o.join(broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "c_nationkey", "yr", "o_orderpriority"
    )
    return l_diversity(
        q, ["c_mktsegment", "c_nationkey", "yr"], "o_orderpriority", l=3
    )


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov drift per event_type vs the
    global value distribution (operators/quality.py): 64 equal-width
    bins from one global min/max agg, per-(group, bin) counts, zero-
    filled cumulative ECDF gap — the shape-drift score PSI's deciles
    smear. The oracle replays the identical integer bin math and
    count-ratio gaps."""
    from etl_orders_to_bq_spark.operators.quality import ks_drift

    e = _t(spark, sf_dir, "events")
    return ks_drift(e, "value", "event_type", bins=64)


def q_hash_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training prep
    (operators/sampling.py): 5 pseudo-random negative doc_ids per
    document, md5(id|rank|seed) mapped onto the dense id-rank space
    with self-hit shift — partitioning-independent and replayed
    bit-for-bit by the oracle (the stratified-sample md5 discipline)."""
    from etl_orders_to_bq_spark.operators.sampling import hash_negatives

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return hash_negatives(d, "doc_id", k=5, seed=11).orderBy(
        "doc_id", "neg_rank"
    )


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN composition end-to-end (operators/ann.py
    ann_topk_multiprobe_pq): hyperplane-bucketed candidates (4 bits,
    query bucket + every 1-bit flip — multi-probe LSH), then PQ/ADC
    scoring of survivors. Query vector and codebooks are deterministic
    seeded literals, so the oracle replays bucketing (sign tests),
    probe-set pruning, PQ encode, and the LUT fold exactly."""
    from etl_orders_to_bq_spark.operators.ann import (
        _hyperplanes,
        ann_topk_multiprobe_pq,
        pq_codebooks,
    )

    emb = _t(spark, sf_dir, "embeddings")
    books = pq_codebooks(dim=64, subspaces=8, codewords=16, seed=23)
    qv = _hyperplanes(64, 1, seed=99)[0]
    return ann_topk_multiprobe_pq(
        emb, books, qv, dim=64, bits=4, seed=42, k=15
    )


def q_linkage_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage
    (operators/fuzzy.py linkage_score) over (nation, market-segment)-
    blocked customer pairs: three field comparators (name prefix,
    account-balance sign, thousand-unit balance bucket) with fixed
    (m, u) parameters — the log2-odds sum plus the match decision at
    threshold 2. Weights are Python-computed literals, so the oracle
    replays identical doubles; agreement is null-safe equality on
    both engines. Blocking on two keys keeps the candidate set
    linear-ish at every fixture SF (the production discipline:
    blocking bounds pairs, scoring ranks them)."""
    from etl_orders_to_bq_spark.operators.fuzzy import linkage_score

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.substring("c_name", 1, 4).alias("name4"),
        (F.col("c_acctbal") >= 0).alias("bal_pos"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_k"),
    )
    a = c.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.col("name4").alias("ph_a"),
        F.col("bal_pos").alias("bp_a"),
        F.col("bal_k").alias("bk_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.col("name4").alias("ph_b"),
        F.col("bal_pos").alias("bp_b"),
        F.col("bal_k").alias("bk_b"),
    )
    pairs = a.join(b, ["nk", "seg"]).filter(F.col("id_a") < F.col("id_b"))
    scored = linkage_score(
        pairs,
        [("ph_a", "ph_b"), ("bp_a", "bp_b"), ("bk_a", "bk_b")],
        m_probs=[0.85, 0.95, 0.8],
        u_probs=[0.1, 0.5, 0.15],
        threshold=2.0,
    )
    return scored.select(
        "id_a", "id_b", "fs_score", "is_match"
    ).orderBy("id_a", "id_b")


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics for the top-20 market-basket pairs
    (support / confidence / lift — the classic trio over the
    basket_pairs co-occurrence counts): in-basket pair generation via
    array combinators (no fact self-join), item supports from the
    same basket-filtered projection, metrics as integer-count ratios
    rounded at 6dp."""
    li = _t(spark, sf_dir, "lineitem")
    p = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        p.groupBy("l_orderkey")
        .agg(F.count("*").alias("__sz"))
        .filter((F.col("__sz") >= 2) & (F.col("__sz") <= 20))
        .select("l_orderkey")
    )
    q = p.join(sized, "l_orderkey", "left_semi")
    nb = sized.agg(F.count("*").alias("__nb"))
    items = q.groupBy("l_partkey").agg(F.count("*").alias("__ni"))
    baskets = q.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pair_arrays = _inbasket_pairs("parts")
    pc = (
        baskets.select(F.explode(pair_arrays).alias("pr"))
        .groupBy("pr.part_a", "pr.part_b")
        .agg(F.count("*").alias("n_orders"))
    )
    top = pc.orderBy(
        F.desc("n_orders"), F.asc("part_a"), F.asc("part_b")
    ).limit(20)
    ia = items.select(
        F.col("l_partkey").alias("part_a"), F.col("__ni").alias("__na")
    )
    ib = items.select(
        F.col("l_partkey").alias("part_b"), F.col("__ni").alias("__nbp")
    )
    out = (
        top.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(nb))
    )
    return out.select(
        "part_a",
        "part_b",
        "n_orders",
        F.round(F.col("n_orders") / F.col("__nb"), 6).alias("support"),
        F.round(F.col("n_orders") / F.col("__na"), 6).alias("confidence"),
        F.round(
            (F.col("n_orders") * F.col("__nb"))
            / (F.col("__na") * F.col("__nbp")),
            6,
        ).alias("lift"),
    ).orderBy(F.desc("n_orders"), "part_a", "part_b")


def q_corpus_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus data-card report — the one-query dashboard a
    training-data pipeline publishes with every corpus snapshot:
    document count, total/average whitespace tokens, English share,
    and exact-duplicate rate (md5 fingerprint seen more than once
    corpus-wide, attributed back to each source). One fingerprint
    groupBy + one source groupBy; ratios are integer-count math
    rounded at 6dp."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    fp = F.md5(F.col("text"))
    with_fp = d.withColumn("__fp", fp)
    dup_fps = (
        with_fp.groupBy("__fp")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > 1)
        .select("__fp")
    )
    flagged = with_fp.join(
        F.broadcast(dup_fps).withColumn("__dup", F.lit(1)), "__fp", "left"
    )
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_tokens = F.when(F.length(F.trim(F.col("text"))) == 0, 0).otherwise(
        toks
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tokens).alias("total_tokens"),
            F.round(
                F.sum(n_tokens).cast("double") / F.count("*"), 6
            ).alias("avg_tokens"),
            F.round(
                F.count(F.when(F.col("lang") == "en", 1)).cast("double")
                / F.count("*"),
                6,
            ).alias("en_share"),
            F.round(
                F.count(F.when(F.col("__dup") == 1, 1)).cast("double")
                / F.count("*"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


def q_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation harness — the 'measure, don't
    guess' artifact for dedup configs: MinHash-LSH (4 hashes, 2
    bands) candidates scored against the PLANTED exact-dup ground
    truth (ids i ↔ i+100000): planted_found / planted_missed /
    extra_pairs plus planted_recall and candidate_precision. Extra
    pairs are candidates outside the planted set (possibly real
    natural near-dups — the metric names say what is measured). The
    oracle replays the full signature+banding pipeline and the same
    full-outer-join scoring."""
    from etl_orders_to_bq_spark.operators.dedup import minhash_lsh_candidates

    d = _docs_with_planted_dups(spark, sf_dir)
    found = minhash_lsh_candidates(
        d, text_col="text", id_col="doc_id", num_hashes=4, bands=2,
        shingle_len=3,
    ).select("id_a", "id_b")
    truth = d.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 100000).alias("id_b"),
    )
    j = truth.withColumn("__t", F.lit(1)).join(
        found.withColumn("__f", F.lit(1)), ["id_a", "id_b"], "full"
    )
    res = j.agg(
        F.count(
            F.when(F.col("__t").isNotNull() & F.col("__f").isNotNull(), 1)
        ).alias("planted_found"),
        F.count(
            F.when(F.col("__t").isNotNull() & F.col("__f").isNull(), 1)
        ).alias("planted_missed"),
        F.count(F.when(F.col("__t").isNull(), 1)).alias("extra_pairs"),
    )
    pf = F.col("planted_found").cast("double")
    return res.select(
        F.lit("minhash_4x2").alias("method"),
        "planted_found",
        "planted_missed",
        "extra_pairs",
        F.round(
            pf / F.greatest(
                F.col("planted_found") + F.col("planted_missed"), F.lit(1)
            ).cast("double"),
            6,
        ).alias("planted_recall"),
        F.round(
            pf / F.greatest(
                F.col("planted_found") + F.col("extra_pairs"), F.lit(1)
            ).cast("double"),
            6,
        ).alias("candidate_precision"),
    )


def q_countmin_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch under the bounded-error gate
    (operators/sketches.py countmin_check): exact per-route counts
    (cross-engine comparable) + the sketch's published contract as
    pinned booleans — never-undercounts per key (deterministic CM
    guarantee) and the eps-bound miss count within confidence slack.
    Same skewed route synthesis as heavy_hitters."""
    from etl_orders_to_bq_spark.operators.sketches import countmin_check

    li = _t(spark, sf_dir, "lineitem")
    routed = li.select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit("hot"))
        .otherwise(
            F.concat(
                F.lit("r"), (F.col("l_partkey") % 997).cast("string")
            )
        )
        .alias("route")
    )
    return countmin_check(routed, "route", top_keys=100).orderBy("key")


def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold assignment (k=5): per source,
    documents rank in md5 order and folds cycle rank % k — every fold
    gets an EXACT 1/k share per stratum (plus-minus one), reproducible
    on any engine at any parallelism (the exact_split contract
    extended to cross-validation). The summary reports per
    (source, fold) counts, so a broken assignment shows up as count
    skew, not hidden per-row noise."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    fold = F.pmod(F.row_number().over(w) - 1, F.lit(5))
    return (
        d.select("doc_id", "source", fold.alias("fold"))
        .groupBy("source", "fold")
        .agg(F.count("*").alias("n"))
        .orderBy("source", "fold")
    )


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-mean drift report (operators/embstats.py):
    L1 distance between each label's per-dimension mean vector and
    the global one, with sorted-fold means snapped at 6dp — the
    encoder-drift / domain-shift check a vector corpus publishes with
    every snapshot. The oracle replays the sorted folds and
    dimension-ordered gap sum with list_reduce."""
    from etl_orders_to_bq_spark.operators.embstats import embedding_drift

    e = _t(spark, sf_dir, "embeddings")
    return embedding_drift(e, "label", "embedding")


def q_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard link prediction (operators/graph.py
    neighbor_jaccard) over the same customer-order bipartite
    contraction as adamic_adar — the normalized companion score
    (common / union of neighborhoods), integer-count math until one
    rounded division, existing edges excluded."""
    from etl_orders_to_bq_spark.operators.graph import neighbor_jaccard

    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 150).alias("src"),
        (F.lit(1000) + F.col("o_orderkey") % 97).alias("dst"),
    )
    return neighbor_jaccard(o).orderBy("node_a", "node_b")


def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism DP count release (operators/privacy.py) of
    the per-event-type histogram at epsilon=0.5: counts + seeded
    inverse-CDF Laplace pseudo-noise (md5-derived uniform — the
    deterministic-release discipline; production swaps in a real RNG
    with the identical mechanism). Completes the privacy trio with
    k_anonymity and l_diversity. The oracle replays the hash, the
    inverse CDF, and the operand order exactly."""
    from etl_orders_to_bq_spark.operators.privacy import dp_noisy_counts

    e = _t(spark, sf_dir, "events")
    return dp_noisy_counts(
        e, ["event_type"], epsilon=0.5, seed=42
    ).orderBy("event_type")


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER blocking (operators/fuzzy.py) over the
    synthetic dirty-entity fixture: rank by name (id tie-break), pair
    each record with its next 3 sort neighbors, verify with
    Levenshtein <= 2 — the classic complement to fuzzy_join's hash
    blocking (first-character typos break prefix buckets but not sort
    locality). The oracle replays rank, offset join, and verify."""
    from etl_orders_to_bq_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    ents = _synth_entities(spark, sf_dir)
    return sorted_neighborhood_pairs(
        ents, "name", "ent_id", window=3, max_dist=2
    ).orderBy("id_a", "id_b")


def q_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-span report (operators/spans.py
    repeated_ngram_spans — the diagnostic half of substring-level
    dedup, Lee et al. 2021 shape): OVERLAPPING 20-token windows at
    stride 10 over the span_dedup planted corpus (copies of the first
    10 docs guarantee cross-doc repeats), fingerprint, count, top-100
    by occurrences with span-text tie-break. Only FULL windows
    participate. The oracle replays windowing, the full-window filter,
    and the ranked cut in SQL."""
    from etl_orders_to_bq_spark.operators.spans import (
        repeated_ngram_spans,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    base = d.unionByName(dup)
    return repeated_ngram_spans(
        base, span_tokens=20, stride=10, min_occurrences=2, top_n=100
    )


def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script composition per document (functions/text.py
    script_counts): latin/digit/space/cyrillic/han/other fractions and
    a dominant-script label — the language-routing cut multilingual
    pipelines (CCNet/mC4 shapes) apply before any model-based langid.
    The ASCII fixture gets deterministic Cyrillic/Han/digit suffixes
    planted by doc_id%4 so every class exercises. Java spells the
    classes \\p{IsHan}/\\p{IsCyrillic} and RE2 \\p{Han}/\\p{Cyrillic};
    both read the same Unicode tables, so counts match exactly
    (measured r7)."""
    from etl_orders_to_bq_spark.functions.text import script_counts

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 0, F.lit(" кириллица"))
            .when(F.col("doc_id") % 4 == 1, F.lit(" 汉字 123"))
            .when(F.col("doc_id") % 4 == 2, F.lit(" mixed мир 世界"))
            .otherwise(F.lit("")),
        ).alias("t"),
    )
    sc = script_counts("t")
    prof = d.select("doc_id", sc.alias("s")).select(
        "doc_id",
        F.col("s.n_chars").alias("n_chars"),
        *[
            F.when(
                F.col("s.n_chars") > 0,
                F.round(F.col(f"s.{c}") / F.col("s.n_chars"), 6),
            ).alias(f"frac_{c}")
            for c in ("latin", "digit", "space", "cyrillic", "han", "other")
        ],
        F.when(
            (F.col("s.latin") >= F.col("s.digit"))
            & (F.col("s.latin") >= F.col("s.cyrillic"))
            & (F.col("s.latin") >= F.col("s.han")),
            F.lit("latin"),
        )
        .when(
            (F.col("s.cyrillic") >= F.col("s.digit"))
            & (F.col("s.cyrillic") >= F.col("s.han")),
            F.lit("cyrillic"),
        )
        .when(F.col("s.han") >= F.col("s.digit"), F.lit("han"))
        .otherwise(F.lit("digit"))
        .alias("dominant_script"),
    )
    return prof.orderBy("doc_id")


def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + URL-level dedup (functions/urls.py):
    three deterministic raw spellings per logical page — mixed-case
    scheme/host with the default :443 port, utm_*/fbclid tracking
    params in shuffled positions, a fragment — must collapse to ONE
    canonical key with sorted surviving params. The oracle replays the
    regex split, the tracking filter, the param sort, and the rollup;
    n_raw_forms counts the distinct spellings each canonical absorbed
    (3 per page by construction)."""
    from etl_orders_to_bq_spark.functions.urls import url_canonical_dedup

    d = _t(spark, sf_dir, "documents")
    page = (F.col("doc_id") / 3).cast("long")
    variant = F.col("doc_id") % 3
    url = (
        F.when(
            variant == 0,
            F.concat(
                F.lit("HTTPS://"), F.col("source"),
                F.lit(".Example.COM:443/docs/"), page.cast("string"),
                F.lit("?b=2&utm_source=feed&a=1"),
            ),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".example.com/docs/"), page.cast("string"),
                F.lit("?a=1&fbclid=XYZ&b=2#frag"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".EXAMPLE.com/docs/"), page.cast("string"),
                F.lit("?b=2&a=1"),
            ),
        )
    )
    raw = d.select("doc_id", url.alias("url"))
    return url_canonical_dedup(raw, "url", "doc_id").orderBy(
        "canonical_url"
    )


def q_domain_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain governance census (functions/urls.py
    domain_census + registrable_domain — the PSL eTLD+1 walk C4 /
    RefinedWeb blocklists and per-domain caps operate on). Four host
    shapes per doc_id % 4: a multi-label ccTLD suffix
    ({source}-shop.co.uk), a merging generic TLD (everything under
    example.com), a private multi-label suffix (cdn.{source}.github.io
    -> {source}.github.io), and an unlisted TLD hitting the PSL
    implicit-* rule ({source}.internal). Tracking params / fragments
    collapse pairs of raw urls into one canonical page; doc_id % 10
    < 3 plants exact-dup texts per source. The oracle replays url
    construction, canonicalization, the longest-suffix walk over the
    same suffix VALUES, and the exact micro-unit dup rate."""
    from etl_orders_to_bq_spark.functions.urls import domain_census

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    page = F.floor(F.col("doc_id") / 40).cast("long").cast("string")
    host = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("www."), F.col("source"), F.lit("-shop.CO.UK:443")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.col("source"), F.lit(".Example.com")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("cdn."), F.col("source"), F.lit(".github.io")),
        )
        .otherwise(F.concat(F.col("source"), F.lit(".internal")))
    )
    q = F.when(
        F.col("doc_id") % 2 == 0,
        F.lit("?b=2&utm_source=feed&a=1"),
    ).otherwise(F.lit("?a=1&b=2#f"))
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), page, q)
    text = F.when(
        F.col("doc_id") % 10 < 3,
        F.concat(F.lit("dup "), F.col("source")),
    ).otherwise(F.col("text"))
    raw = d.select("doc_id", url.alias("url"), text.alias("text"))
    return domain_census(raw).orderBy("domain")


def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free group split (operators/sampling.py group_split):
    ORDERS assigned to train/val/test by a pure hash of o_custkey —
    every customer's orders land in one split BY CONSTRUCTION (the
    group-k-fold discipline; row-level exact_split would leak entities
    across splits). The report rolls up per-split order/customer
    counts plus leakage_free: customers summed across splits equal
    distinct customers overall, pinned true. The oracle replays the
    md5 hash, the float cuts (identical accumulated literals), and the
    rollup."""
    from etl_orders_to_bq_spark.operators.sampling import group_split

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    assigned = group_split(o, "o_custkey", seed=42)
    per = assigned.groupBy("split").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
    totals = per.agg(
        F.sum("n_customers").alias("__sum_c")
    ).crossJoin(
        o.agg(F.countDistinct("o_custkey").alias("__tot_c"))
    )
    return per.crossJoin(totals).select(
        "split",
        "n_orders",
        "n_customers",
        (F.col("__sum_c") == F.col("__tot_c")).alias("leakage_free"),
    ).orderBy("split")


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (operators/graph.py hits_scores) over the
    customer-order bipartite contraction (the adamic_adar graph,
    directed src->dst): two fixed rounds of integer mutual
    reinforcement — auth = in-sum of hub, hub = out-sum of auth —
    normalized by the max only at the END, so every intermediate is an
    exact integer and the oracle replays the whole iteration with
    bigint sums (no float accumulation order anywhere)."""
    from etl_orders_to_bq_spark.operators.graph import hits_scores

    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 150).alias("src"),
        (F.lit(1000) + F.col("o_orderkey") % 97).alias("dst"),
    )
    return hits_scores(o, rounds=2).orderBy("id")


def q_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity/coreset sampling, degeneracy-robust default
    (operators/semdedup.py bucket_medoids_auto): one MEDOID per
    region — max mean cosine to region peers, id tie-break — the
    keep-one-exemplar complement of SemDeDup's drop-near-dups. Regions
    come from the semdedup_auto policy (k = max(8, ceil(n/128)) seeded
    directions, Σs²/n probe, Lloyd fallback), NOT caller-fixed LSH
    bits — the r8-measured 3.9× scale trap. At the gate SFs n=500 →
    k=8 and the seed-42 probe balances (work/row ~65, budget 512), so
    the oracle replays the CHEAP branch: seed-42 argmax assignment +
    6dp pair cosines + sorted-fold means + argmax-by-id — and thereby
    value-pins the probe's branch decision too (a Lloyd fit would move
    centroids and change every bucket)."""
    from etl_orders_to_bq_spark.operators.semdedup import (
        bucket_medoids_auto,
    )

    e = _t(spark, sf_dir, "embeddings")
    return bucket_medoids_auto(
        e, dim=64, seed=42, pair_method="numpy"
    ).orderBy("bucket")


def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT on LSH candidates (operators/dedup.py
    ngram_containment): C(A,B) = |A n B| / |A| over distinct word
    3-grams — the subsumption measure resemblance-based dedup misses
    (a 15-token PREFIX of each of the first 10 docs is planted, so
    short-in-long pairs score containment 1.0 while their Jaccard is
    low). Candidates are the 4-hash/2-band MinHash pipeline; the
    oracle replays signatures, banding, and the exact set
    intersection."""
    from etl_orders_to_bq_spark.operators.dedup import ngram_containment

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    prefix = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 15), " "
        ).alias("text"),
    )
    base = d.unionByName(prefix)
    return ngram_containment(
        base, num_hashes=4, bands=2, shingle_len=3, hash_fn="md5"
    ).orderBy("id_a", "id_b")


def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced range-shard planning (operators/ranking.py shard_plan):
    16 shards over orders ordered by (o_totalprice, o_orderkey) —
    exact cut points via the two-pass global numbering (no
    single-partition window), shard sizes within one row of each
    other, per-shard key bounds for the writer/partitioner. The oracle
    replays rank -> floor((r-1)*k/n) -> bounds."""
    from etl_orders_to_bq_spark.operators.ranking import shard_plan

    o = _t(spark, sf_dir, "orders")
    return shard_plan(
        o, ["o_totalprice", "o_orderkey"], num_shards=16
    ).orderBy("shard_id")




def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-10 TF-IDF terms (operators/bm25.py
    tfidf_topterms): smooth sklearn-style idf = ln((1+N)/(1+df)) + 1
    over normalized whitespace tokens, score = tf * idf rounded 6dp,
    ranked per source with a term tie-break. One explode feeds both
    aggregates; df broadcasts (vocab-sized). The oracle replays
    tokenization, both counts, the ln, and the ranked cut."""
    from etl_orders_to_bq_spark.operators.bm25 import tfidf_topterms

    d = _t(spark, sf_dir, "documents")
    return tfidf_topterms(d, top_n=10).orderBy(
        "source", F.desc("score"), "term"
    )


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical census (operators/bm25.py vocab_growth):
    token count, vocabulary, hapax count/fraction, type-token ratio —
    the Heaps'-law QA report (template spam collapses hapax_frac; OCR
    noise explodes TTR). Two combinable groupBys over one explode."""
    from etl_orders_to_bq_spark.operators.bm25 import vocab_growth

    d = _t(spark, sf_dir, "documents")
    return vocab_growth(d).orderBy("source")


def q_time_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal split with an embargo gap (operators/sampling.py
    time_split_embargo): orders before 1997-01-01 minus 30 days train,
    at/after the cutoff test, the 30-day gap excluded as 'embargo' —
    the backtesting rule that stops boundary-straddling features
    leaking the future (hash splits train on the future by
    construction). Report: per-split counts and date bounds."""
    from etl_orders_to_bq_spark.operators.sampling import (
        time_split_embargo,
    )

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    out = time_split_embargo(o, "o_orderdate", "1997-01-01", 30)
    return (
        out.groupBy("split")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
        .orderBy("split")
    )







def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for mean order value per priority
    (operators/bootstrap.py): B=100 deterministic replicates — each
    row's per-replicate weight is an inverse-CDF Poisson(1) draw from
    md5(id|b|seed), weighted sums run in DECIMAL (exact, order-free),
    replicate means are one double division rounded at 6dp, and the CI
    bounds are type-1 order statistics of the sorted means. Every
    stage is a pure function of the data, so the oracle replays the
    ENTIRE bootstrap — weights, sums, quantiles — bit-for-bit."""
    from etl_orders_to_bq_spark.operators.bootstrap import bootstrap_ci

    o = _t(spark, sf_dir, "orders")
    return bootstrap_ci(
        o,
        value_col="o_totalprice",
        id_col="o_orderkey",
        group_cols=["o_orderpriority"],
        b=100,
        ci=0.95,
        seed=42,
    ).orderBy("o_orderpriority")


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (operators/timeseries.py resample_ffill):
    monthly revenue per customer bucket (custkey % 200); each key's
    month spine is generated from min..max observed month and gap months
    FORWARD-FILLED with the last observed value — pandas
    resample().ffill() as sequence-explode + last-ignorenulls window
    (one shuffle, streaming frame). Revenue pre-aggregates in DECIMAL
    so the filled values are exact on both engines."""
    from etl_orders_to_bq_spark.operators.timeseries import (
        resample_ffill,
    )

    o = _t(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            (F.col("o_custkey") % 200).alias("key"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        )
        .agg(
            F.sum(
                F.col("o_totalprice").cast("decimal(18,2)")
            ).cast("double").alias("revenue")
        )
    )
    return resample_ffill(
        monthly, "key", "month", "revenue", step="1 month"
    ).orderBy("key", "month")


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed leave-one-out target encoding (operators/encode.py):
    o_orderpriority encoded against o_totalprice with pseudo-count
    m=20 — the row's own label subtracted from its category sum so the
    feature never leaks it. Category sums in DECIMAL, prior and te
    each ONE rounded double division; the oracle replays the exact
    formula per row."""
    from etl_orders_to_bq_spark.operators.encode import (
        target_encode_loo,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return target_encode_loo(
        o, "o_orderpriority", "o_totalprice", m=20.0
    ).orderBy("o_orderkey")


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorizer (operators/encode.py feature_hash):
    normalized whitespace tokens of each document land in 64 signed
    buckets — bucket from the first 8 md5 hex chars, sign from the
    9th's parity — summed per (doc, bucket) with zero cells dropped.
    No vocabulary pass; output bounded at 64 rows/doc at any corpus
    size. The oracle recomputes the identical md5 arithmetic."""
    from etl_orders_to_bq_spark.operators.encode import feature_hash

    d = _t(spark, sf_dir, "documents")
    return feature_hash(d, "doc_id", "text", n_buckets=64).orderBy(
        "doc_id", "bucket"
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (operators/encode.py rfm_segments):
    recency/frequency/monetary per customer, each scored 1..5 by
    EXACT ntile semantics via ranking.scalable_ntile (two-pass prefix
    offsets — no single-partition global window), ties broken on
    custkey. The oracle uses the window ntile directly, so the gate
    re-proves the scalable tiling IS ntile."""
    from etl_orders_to_bq_spark.operators.encode import rfm_segments

    o = _t(spark, sf_dir, "orders")
    return rfm_segments(o).orderBy("o_custkey")


def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / Pareto frontier (operators/skyline.py): parts no
    other part beats on BOTH price and size (min-min, non-strict
    dominance with one strict axis). Relational frontier: per-price
    min size, strict-prefix running min over ascending price (two-pass
    range-partitioned — no global window), broadcast join-back. The
    oracle states the same frontier with one window."""
    from etl_orders_to_bq_spark.operators.skyline import skyline_2d

    p = _t(spark, sf_dir, "part")
    return skyline_2d(p, "p_retailprice", "p_size").orderBy(
        "p_partkey"
    )


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (operators/experiment.py): events
    split at 2024-01-16 into pre-period covariate x and experiment
    metric y per user, variant = user_id % 2; theta = cov/var from
    five DECIMAL-exact cross-moments each collapsed by one rounded
    division, adjusted means via the mean-identity (no per-row float
    re-aggregation). The oracle replays moments, theta, rho² and the
    adjusted means literal-for-literal."""
    from etl_orders_to_bq_spark.operators.experiment import (
        cuped_adjust,
    )

    e = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return cuped_adjust(
        e,
        unit_col="user_id",
        variant_col=(F.col("user_id") % 2).cast("int"),
        metric_col=F.when(F.col("ts") >= cut, F.col("value")),
        covariate_col=F.when(F.col("ts") < cut, F.col("value")),
    ).orderBy("variant")


def q_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree-assortativity coefficient (operators/graph.py) over the
    same bipartite orders contraction adamic_adar uses (custkey mod
    150 x orderkey mod 97). Pearson correlation of endpoint degrees
    over all 2|E| half-edges; the five cross-moments sum exactly in
    DECIMAL(38,0) (degrees are integers) so r is one double
    expression the oracle evaluates identically."""
    from etl_orders_to_bq_spark.operators.graph import (
        degree_assortativity,
    )

    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 150).alias("src"),
        (F.lit(1000) + F.col("o_orderkey") % 97).alias("dst"),
    )
    return degree_assortativity(o)


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness census (operators/privacy.py): per
    (o_orderpriority, o_orderstatus) equivalence class, the ordered
    Earth-Mover's Distance between the class's o_totalprice
    distribution and the global one over 10 equal-width bins —
    completing the k-anonymity / l-diversity / t-closeness release
    trio. Every |cumP - cumQ| term is exact DECIMAL integer
    arithmetic; the EMD is ONE rounded division."""
    from etl_orders_to_bq_spark.operators.privacy import t_closeness

    o = _t(spark, sf_dir, "orders")
    return t_closeness(
        o,
        ["o_orderpriority", "o_orderstatus"],
        "o_totalprice",
        n_bins=10,
        t=0.2,
    ).orderBy("o_orderpriority", "o_orderstatus")


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-filter decision table (operators/lm.py
    perplexity_buckets): documents scored by corpus unigram
    log-probability, cut into 10 EXACT deciles via
    ranking.scalable_ntile (rounded score + doc_id tie-break, no
    global window — the oracle's plain ntile re-proves equivalence),
    then per-bucket doc counts, score range, and char share. The
    curation pipeline reads this to pick which band to keep."""
    from etl_orders_to_bq_spark.operators.lm import perplexity_buckets

    d = _t(spark, sf_dir, "documents")
    return perplexity_buckets(d, n_buckets=10).orderBy("bucket")


def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit (functions/text.py): per (lang,
    source), whitespace tokens vs BPE-ish subwords vs chars —
    fertility (subwords per word) and compression (chars per subword)
    are the two numbers a tokenizer review reads per language slice.
    Integer sums exact; each ratio ONE rounded division."""
    from etl_orders_to_bq_spark.functions.text import (
        bpe_ish_token_count,
        token_count,
    )

    d = _t(spark, sf_dir, "documents")
    agg = d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("n_tokens"),
        F.sum(bpe_ish_token_count("text")).alias("n_subwords"),
        F.sum("n_chars").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_subwords").cast("long").alias("n_subwords"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(
            F.col("n_subwords")
            / F.nullif(F.col("n_tokens"), F.lit(0)),
            6,
        ).alias("fertility"),
        F.round(
            F.col("n_chars")
            / F.nullif(F.col("n_subwords"), F.lit(0)),
            6,
        ).alias("chars_per_subword"),
    ).orderBy("lang", "source")


def q_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support (operators/seqmine.py): for every
    ordered event-type pair (a, b), the number of users who fired an
    `a` strictly before a `b` — non-adjacent precedence, the
    length-2 GSP/PrefixSpan statistic (event_transitions covers only
    CONSECUTIVE pairs). Events pair at the (user, type) summary
    level, never event x event. The oracle replays the row_number /
    min / max / join pipeline."""
    from etl_orders_to_bq_spark.operators.seqmine import (
        seq_pattern_support,
    )

    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return seq_pattern_support(
        e, "user_id", "event_type", "ts", "event_id", min_support=2
    ).orderBy("from_type", "to_type")


def q_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (operators/experiment.py
    diff_in_diff): events split at 2024-01-16 into pre/post and
    user_id parity into control/treated; the 2x2 cell means are
    DECIMAL-exact sums with one rounded division each, did is pure
    double arithmetic over the rounded means. Completes the causal
    pair with CUPED."""
    from etl_orders_to_bq_spark.operators.experiment import (
        diff_in_diff,
    )

    e = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return diff_in_diff(
        e,
        variant_col=(F.col("user_id") % 2).cast("int"),
        period_col=(F.col("ts") >= cut).cast("int"),
        value_col="value",
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index (operators/bm25.py inverted_index):
    term -> (df, cf, postings "doc:p1|p2,doc:p4") with the
    stopword-class hub guard — df > 20 keeps exact counts but a NULL
    postings payload (explicit census, bounded shuffle payload). The
    oracle rebuilds the identical strings with ordered string_agg."""
    from etl_orders_to_bq_spark.operators.bm25 import inverted_index

    d = _t(spark, sf_dir, "documents")
    return inverted_index(d, max_postings=20).orderBy("term")


def q_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR over per-event-type mean z-tests
    (operators/multitest.py fdr_bh). p-values come from the ENGINE'S
    deterministic Φ (A&S 26.2.17 with a Taylor-Horner exp — pure
    +,*,/ over repr'd literals, bit-identical in any engine; libm exp
    is NOT portable), on 6dp-rounded z from DECIMAL-exact moments.
    The oracle rebuilds the identical expression via norm_sf_sql from
    the SAME Python literals — the shared-literal discipline of the
    Poisson bootstrap, extended to special functions."""
    from etl_orders_to_bq_spark.operators.multitest import fdr_bh

    e = _t(spark, sf_dir, "events")
    return fdr_bh(e, "event_type", "value", q=0.1).orderBy(
        "event_type"
    )


def q_rake_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking / iterative proportional fitting, one row-then-column
    sweep (operators/weighting.py rake_weights): weights that move
    the (o_orderpriority x o_orderstatus) mix toward a uniform row
    target and a fixed 70/20/10 column target. Cell counts are
    integers, each factor ONE rounded division, and the column
    marginal of the row-scaled table a SORTED-FOLD — the oracle
    replays the identical fold with list_reduce."""
    from etl_orders_to_bq_spark.operators.weighting import rake_weights

    o = _t(spark, sf_dir, "orders")
    row_targets = {
        "1-URGENT": 0.2,
        "2-HIGH": 0.2,
        "3-MEDIUM": 0.2,
        "4-NOT SPECIFIED": 0.2,
        "5-LOW": 0.2,
    }
    col_targets = {"O": 0.7, "F": 0.2, "P": 0.1}
    return rake_weights(
        o, "o_orderpriority", "o_orderstatus", row_targets, col_targets
    ).orderBy("o_orderpriority", "o_orderstatus")


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiler (operators/profile.py): one scan
    of orders -> per-column row/null/exact-distinct counts and
    min/max rendered as strings (catalog-stats convention). The
    stack unpivot keeps it one aggregate + a 6-row explode; at
    100 TB the exact NDV swaps to HLL via exact=False."""
    from etl_orders_to_bq_spark.operators.profile import column_profile

    o = _t(spark, sf_dir, "orders")
    return column_profile(o).orderBy("column")


def q_snips_ope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation (operators/experiment.py offpolicy_eval):
    IPS + SNIPS value of the deterministic target policy "even users
    get click, odd users get view" from the logged events, with the
    ESS overlap diagnostic. Logged propensities are the synthetic
    rational family p = (md5(event_id) mod 9 + 1)/10, so all three
    weighted sums run EXACTLY (integer weights c = 25200/(k+1) after
    clearing denominators) — each estimator is one rounded double
    division the oracle reproduces digit-for-digit."""
    from etl_orders_to_bq_spark.operators.experiment import (
        offpolicy_eval,
    )

    e = _t(spark, sf_dir, "events")
    target = F.when(
        F.col("user_id") % 2 == 0, F.lit("click")
    ).otherwise(F.lit("view"))
    return offpolicy_eval(
        e,
        match_col=(F.col("event_type") == target).cast("int"),
        reward_col="value",
        id_col="event_id",
    )


def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient (operators/graph.py
    local_clustering) over the mod-6000 lineitem projection — wedge
    self-join + closing-edge semi-join, with the explicit
    max_degree=150 hub guard (censored nodes keep exact degree, NULL
    triangles/lcc; at sf0.1 the guard censors the saturated graph —
    that IS the policy under test). Top-100 by (lcc, node) so the
    gate payload stays bounded; integer counts, one rounded
    division."""
    from etl_orders_to_bq_spark.operators.graph import local_clustering

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 6000).alias("src"),
        (F.col("l_partkey") % 6000).alias("dst"),
    )
    return (
        local_clustering(li, max_degree=150)
        .orderBy(F.desc_nulls_last("lcc"), F.asc("node"))
        .limit(100)
    )


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (functions/text.py language_id vs
    the fixture's lang label): per (truth, prediction) cell counts
    and the within-truth recall share — the QA table a corpus
    pipeline reads before trusting the cheap classifier for routing.
    Integer counts; share is one rounded division."""
    from etl_orders_to_bq_spark.functions.text import language_id

    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy(
        F.col("lang"), language_id("text").alias("lang_pred")
    ).agg(F.count("*").alias("n"))
    totals = cells.groupBy("lang").agg(F.sum("n").alias("__tot"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "lang_pred",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("__tot"), 6).alias("share"),
            (F.col("lang") == F.col("lang_pred")).alias("is_correct"),
        )
        .orderBy("lang", "lang_pred")
    )


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test, click vs error event values
    (operators/multitest.py mann_whitney_u). Ranks never touch
    floats: per-distinct-value integer counts + the scalable two-pass
    global_cumsum_before (NO single-partition rank window), doubled
    rank sums as decimal(38,0), exact tie correction, and the
    engine's deterministic Φ for the p-value. The oracle replays the
    identical integer/decimal arithmetic with a window cumulative
    (fine in an oracle — semantics, not plan) and norm_sf_sql."""
    from etl_orders_to_bq_spark.operators.multitest import mann_whitney_u

    e = _t(spark, sf_dir, "events")
    return mann_whitney_u(e, "event_type", "value", "click", "error")


def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information / symmetric uncertainty between the event
    type and a user cohort (user_id % 7) — the feature-vs-label
    dependence score (operators/infotheory.py). Each entropy is a
    sorted fold over integer counts (counts sorted AS LONGS, then
    transformed to -(c/n)log2(c/n) — ties carry equal terms, so the
    order is fully pinned); the oracle replays the fold with
    list_reduce(list_transform(list_sort(...)))."""
    from etl_orders_to_bq_spark.operators.infotheory import (
        mutual_information,
    )

    e = _t(spark, sf_dir, "events").withColumn(
        "cohort", F.col("user_id") % 7
    )
    return mutual_information(e, "event_type", "cohort")


def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily order revenue at lags 1..7
    (operators/timeseries.py acf_lags): decimal-exact daily sums, the
    per-lag pair build is a self-equi-join on day arithmetic over the
    calendar-bounded daily table, and Pearson r comes from six exact
    sufficient statistics collapsed once to double — no float
    accumulation anywhere, so the oracle replays every digit."""
    from etl_orders_to_bq_spark.operators.timeseries import acf_lags

    o = _t(spark, sf_dir, "orders")
    return acf_lags(o, "o_orderdate", "o_totalprice", max_lag=7)


def q_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit across four candidate FDs — one
    that genuinely holds (nation key -> region key) and three that
    are violated (operators/audit.py fd_violations): per FD the
    distinct-lhs count, violating-lhs count, worst rhs variant count,
    and one rounded-division violation rate. ONE groupBy per FD."""
    from etl_orders_to_bq_spark.operators.audit import fd_violations

    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    parts = [
        fd_violations(n, ["n_nationkey"], "n_regionkey", "nation_region"),
        fd_violations(o, ["o_custkey"], "o_orderpriority", "cust_priority"),
        fd_violations(c, ["c_nationkey"], "c_mktsegment", "nation_segment"),
        fd_violations(li, ["l_orderkey"], "l_returnflag", "order_returnflag"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fd")


def q_fk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency (FK) coverage audit (operators/audit.py
    fk_coverage): three true FKs that must be fully covered
    (lineitem->part, lineitem->supplier, orders->customer) plus the
    reverse probe customer->events.user_id, which is genuinely
    partial in this corpus — the discovery direction a profiler
    actually reports. Distinct key sets, broadcast anti joins, orphan
    ROW counts riding the child key table."""
    from etl_orders_to_bq_spark.operators.audit import fk_coverage

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    e = _t(spark, sf_dir, "events")
    parts = [
        fk_coverage(li, "l_partkey", p, "p_partkey", "lineitem_part"),
        fk_coverage(li, "l_suppkey", s, "s_suppkey", "lineitem_supplier"),
        fk_coverage(o, "o_custkey", c, "c_custkey", "orders_customer"),
        fk_coverage(c, "c_custkey", e, "user_id", "customer_active"),
    ]
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out.orderBy("fk")


def q_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing score (functions/text.py code_likeness)
    over the documents PLUS a deterministically code-ified copy of
    each (the fixture corpus is pure prose, so the gate must see both
    classes to be non-degenerate): symbol/indent/keyword ratios from
    exact integer counts — translate + substring + token membership,
    no engine-divergent regex classes — fixed-weight score, threshold
    flag. The oracle rebuilds both branches with list ops."""
    from etl_orders_to_bq_spark.functions.text import code_likeness

    d = _t(spark, sf_dir, "documents")
    prose = d.select(
        F.col("doc_id"), F.lit("prose").alias("kind"), F.col("text")
    )
    codeish = d.select(
        F.col("doc_id"),
        F.lit("codeified").alias("kind"),
        F.concat(
            F.lit("def f():\n  return {"), F.col("text"), F.lit("};\n\tvar x = 1;")
        ).alias("text"),
    )
    both = prose.unionByName(codeish)
    return (
        both.select(
            "doc_id", "kind", code_likeness("text").alias("__c")
        )
        .select("doc_id", "kind", "__c.*")
        .orderBy("kind", "doc_id")
    )


def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes training head, top-10 tokens per
    language (operators/classifier.py naive_bayes_train): Laplace-
    smoothed log10 likelihoods and class priors from exact integer
    counts — one (class, token) groupBy, marginals re-aggregated,
    vocabulary a 1-row broadcast. The oracle replays the identical
    single-division log arguments (pmi discipline)."""
    from etl_orders_to_bq_spark.operators.classifier import (
        naive_bayes_train,
    )

    d = _t(spark, sf_dir, "documents")
    return naive_bayes_train(d, "lang", "text", top_k=10).orderBy(
        "lang", "token"
    )


def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community modularity decomposition of a fixed partition
    (node % 8) over the lineitem-derived interaction graph
    (operators/graph.py graph_modularity): per community the exact
    intra-edge and degree totals and its e/m - (d/2m)^2 contribution
    — integer counts, one fixed-order double expression per row, no
    cross-row float accumulation."""
    from etl_orders_to_bq_spark.operators.graph import graph_modularity

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 6000).alias("src"),
        (F.col("l_partkey") % 6000).alias("dst"),
    )
    nodes = (
        li.select(F.col("src").alias("node"))
        .unionByName(li.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("community", F.col("node") % 8)
    )
    return graph_modularity(li, nodes).orderBy("community")


def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-graph reciprocity of the lineitem-derived edge set
    folded to 500 nodes (operators/graph.py reciprocity): distinct
    directed edges, ONE reversed-key self-semi-join, one rounded
    division — mutual-link rate with int-pair shuffles only."""
    from etl_orders_to_bq_spark.operators.graph import reciprocity

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 500).alias("src"),
        (F.col("l_partkey") % 500).alias("dst"),
    )
    return reciprocity(li)


def q_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic minority-size class rebalancing of documents by
    language (operators/sampling.py class_balance_sample): every
    language keeps exactly min-class-count docs picked by md5(id)
    order — seedless, engine-portable, rerun-stable. The min cap is
    a 1-row broadcast, never a collect."""
    from etl_orders_to_bq_spark.operators.sampling import (
        class_balance_sample,
    )

    d = _t(spark, sf_dir, "documents")
    return class_balance_sample(d, "lang", "doc_id").orderBy(
        "lang", "pick_rank"
    )


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower weighted median of lineitem extended price
    weighted by quantity (operators/ranking.py weighted_median):
    per-distinct-value integer weight sums + the two-pass
    global_cumsum_before, decision by exact long comparison — no
    global window, no float arithmetic, partitioning-invariant by
    construction. The oracle states the same definition with a
    window cumulative."""
    from etl_orders_to_bq_spark.operators.ranking import weighted_median

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return weighted_median(li, "l_extendedprice", "qty")


def q_semantic_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-type census over customer and events columns
    (operators/profile.py semantic_types): first-match detector
    tagging with engine-portable regexes (explicit classes only — no
    Java/RE2 divergent shorthands), integer counts, one rounded
    division per share. Float columns are deliberately excluded:
    double->string rendering is NOT engine-portable."""
    from etl_orders_to_bq_spark.operators.profile import semantic_types

    c = _t(spark, sf_dir, "customer")
    e = _t(spark, sf_dir, "events")
    out = semantic_types(
        c, ["c_custkey", "c_name", "c_mktsegment"], "customer"
    ).unionByName(
        semantic_types(e, ["props", "event_type", "user_id"], "events")
    )
    return out.orderBy("table_name", "column_name", "sem_type")


def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality profiles for orders⋈lineitem and
    part⋈lineitem (operators/audit.py join_cardinality): exact
    predicted rows Σ ca·cb in decimal(38,0), key overlap, hot-key
    skew share — per-key count aggregates and a |keys|-row join,
    data rows never joined."""
    from etl_orders_to_bq_spark.operators.audit import join_cardinality

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    out = join_cardinality(
        o, "o_orderkey", li, "l_orderkey", "orders_lineitem"
    ).unionByName(
        join_cardinality(p, "p_partkey", li, "l_partkey", "part_lineitem")
    )
    return out.orderBy("join_name")


def q_xcorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between click and purchase daily
    value at lags -7..7 (operators/timeseries.py xcorr_lags):
    decimal-exact daily sums per key, explicit both-days-exist
    pairs, Pearson r from six exact sufficient statistics collapsed
    once — the acf_lags discipline generalized to two series."""
    from etl_orders_to_bq_spark.operators.timeseries import xcorr_lags

    e = _t(spark, sf_dir, "events")
    return xcorr_lags(
        e, "ts", "value", "event_type", "click", "purchase", max_lag=7
    )


def q_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-by-decile targeting review (operators/experiment.py
    uplift_deciles): per-user spend/conversion rollup, exact ntile
    cuts via the two-pass scalable_ntile (bit-identical to SQL
    ntile, no global window), per-bucket treated/control rates and
    their difference — integer counts, one rounded division each."""
    from etl_orders_to_bq_spark.operators.experiment import uplift_deciles

    e = _t(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("spend"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    ).withColumn("treat", (F.col("user_id") % 2).cast("int"))
    return uplift_deciles(
        users, "user_id", "treat", "spend", "converted", n_buckets=10
    )


def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combiner-style per-group top-k (operators/ranking.py
    topk_per_group): per-partition top-3 survivors then one bounded
    merge — at most k rows per group per input partition ever
    shuffle. The MEMORY-bounded alternative to the window form (the
    docstring records the honest wall-time measurement: window wins
    locally; this one survives a group too big for one task).
    Row-for-row equal to the window top-k (tie order (value desc,
    id asc)); the oracle IS the window form."""
    from etl_orders_to_bq_spark.operators.ranking import topk_per_group

    o = _t(spark, sf_dir, "orders")
    return topk_per_group(
        o, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=3
    ).orderBy("o_orderpriority", "rank")


def q_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate/mix revenue decomposition 1995 -> 1996 by order priority
    (operators/decompose.py mix_shift): integer volumes, decimal-
    exact revenues, one rounded division per rate, and the exact
    two-term split (volume at old rate + rate at new volume) whose
    sum telescopes to rev_b - rev_a per segment."""
    from etl_orders_to_bq_spark.operators.decompose import mix_shift

    o = _t(spark, sf_dir, "orders")
    period = F.when(F.year("o_orderdate") == 1995, F.lit("A")).when(
        F.year("o_orderdate") == 1996, F.lit("B")
    )
    return mix_shift(o, "o_orderpriority", period, "o_totalprice").orderBy(
        "segment"
    )


def q_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% CI for the median of lineitem extended
    price (operators/ranking.py median_ci): order-statistic rank
    bounds from the repr'd z-constant, ranks via the two-pass
    global_row_number (no single-partition sort), one rank-selection
    pass. The oracle replays the identical rank formulas with a
    window over the value order."""
    from etl_orders_to_bq_spark.operators.ranking import median_ci

    li = _t(spark, sf_dir, "lineitem")
    return median_ci(li, "l_extendedprice")


def q_streaming_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rate-limit flags through the real streaming engine
    (streaming/events.py quota_flags): watermarked 6-hour tumbling
    windows, count-per-(window, user) state, append mode emitting
    only finalized violations (> 2 events). The oracle computes the
    batch flags and applies the same finalization filter."""
    from etl_orders_to_bq_spark.streaming.events import quota_flags

    path = _stage_event_stream(spark, sf_dir, "plain")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    flags = quota_flags(stream, quota=2, window="6 hours",
                        watermark="10 minutes")
    return _stream_to_batch(flags, "squota", "append")


def q_interval_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity-interval integrity audit (operators/temporal.py
    interval_audit) over per-customer 30-day order coverage windows:
    overlap = double-counted history, gap = lost history, half-open
    semantics; gap lengths in exact integer days. ONE per-key
    ordered window + a map-side-combinable rollup."""
    from etl_orders_to_bq_spark.operators.temporal import interval_audit

    o = _t(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey"),
        F.to_date("o_orderdate").alias("start_d"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("end_d"),
    )
    return interval_audit(iv, "o_custkey", "start_d", "end_d")


def q_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification of parts by revenue cents
    (operators/ranking.py abc_classification): exact integer
    cumulative over the two-pass global_cumsum_before (weight desc,
    key asc — no single-partition window), class cut by the exact
    comparison 100·cum ≤ pct·total, share one rounded division."""
    from etl_orders_to_bq_spark.operators.ranking import (
        abc_classification,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    return abc_classification(li, "l_partkey", "cents").orderBy(
        "cum_share", "l_partkey"
    )


def q_crosslang_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-class duplicate contamination census (operators/dedup.py
    cross_class_dups) with planted cross-language copies (every
    doc_id % 25 == 0 re-labeled 'xx' — the fixture corpus has no
    natural cross-lang dups, so the gate must see both classes):
    fingerprint groupBy, HAVING distinct classes > 1, sorted label
    list. Shuffles hashes + labels, never text."""
    from etl_orders_to_bq_spark.operators.dedup import cross_class_dups

    d = _t(spark, sf_dir, "documents")
    planted = d.filter(F.col("doc_id") % 25 == 0).withColumn(
        "lang", F.lit("xx")
    )
    both = d.select("doc_id", "lang", "text").unionByName(
        planted.select("doc_id", "lang", "text")
    )
    return cross_class_dups(both, "lang", "text").orderBy(
        "fingerprint"
    )


def q_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (lag-7) forecast backtest over daily order
    revenue (operators/timeseries.py backtest_snaive): decimal-exact
    error sums for MAE/bias, per-day integer micro-unit APEs for
    MAPE (the boundary-proof discipline), one rounded collapse
    each. The baseline every forecast model must beat."""
    from etl_orders_to_bq_spark.operators.timeseries import (
        backtest_snaive,
    )

    o = _t(spark, sf_dir, "orders")
    return backtest_snaive(o, "o_orderdate", "o_totalprice", season=7)


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle over the events stream (operators/
    attribution.py cohort_ltv): first-active-week cohorts, decimal-
    exact per-(cohort, age) revenue and running cumulative, one
    rounded division for LTV-per-user. The cumulative window is
    calendar-bounded (offsets), never data-sized."""
    from etl_orders_to_bq_spark.operators.attribution import cohort_ltv

    e = _t(spark, sf_dir, "events")
    return cohort_ltv(e, "user_id", "ts", "value").orderBy(
        "cohort_week", "week_offset"
    )


def q_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth (operators/timeseries.py
    period_over_period): ISO-week decimal sums, adjacency-checked
    lag (a calendar gap yields NULL, not a misleading jump), one
    rounded division per pct."""
    from etl_orders_to_bq_spark.operators.timeseries import (
        period_over_period,
    )

    o = _t(spark, sf_dir, "orders")
    return period_over_period(o, "o_orderdate", "o_totalprice")


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate against the corpus's own top-200 tokens
    (operators/lm.py oov_rate): deterministic vocabulary (count
    desc, token asc TakeOrdered over the aggregated vocab table),
    broadcast membership join, one rounded division per doc."""
    from etl_orders_to_bq_spark.operators.lm import oov_rate

    d = _t(spark, sf_dir, "documents")
    return oov_rate(d, "text", "doc_id", vocab_size=200).orderBy(
        "doc_id"
    )


def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication census (operators/dedup.py
    dup_rate_by_source) with planted copies (every doc_id % 20 == 0
    re-sourced to 'dupsrc' — the fixture has no natural dups, so the
    gate must see both dup classes): corpus-wide dup share and
    cross-source collision share per source, hash-only shuffles."""
    from etl_orders_to_bq_spark.operators.dedup import dup_rate_by_source

    d = _t(spark, sf_dir, "documents")
    planted = d.filter(F.col("doc_id") % 20 == 0).withColumn(
        "source", F.lit("dupsrc")
    )
    both = d.select("doc_id", "source", "text").unionByName(
        planted.select("doc_id", "source", "text")
    )
    return dup_rate_by_source(both, "source", "text").orderBy("source")


def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL `GROUP BY ALL` + `ORDER BY ALL` (SQL-interface
    family, alongside sql_pipe / sql_udf): the analyst-ergonomics
    form resolves every non-aggregate select item as a grouping key
    — identical text runs on DuckDB, which pioneered the syntax."""
    from etl_orders_to_bq_spark.sources.parquet import load_tables

    load_tables(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        select o_orderpriority, o_orderstatus,
               count(*) as n_orders,
               cast(round(sum(cast(o_totalprice as decimal(18,2))),
                          2) as double) as total_price
        from orders
        group by all
        order by all
        """
    )


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution entropy (functions/text.py
    char_entropy) — the cheap junk detector: fully in-row (no
    shuffle), counts over the distinct charset, and the
    mutual-information sorted-fold discipline so the oracle replays
    every float. '.' extraction is Java/RE2-identical (newline-free
    after normalize_text)."""
    from etl_orders_to_bq_spark.functions.text import char_entropy

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", char_entropy("text").alias("char_entropy")
    ).orderBy("doc_id")


def q_simpsons_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit of purchase rate by a user cohort
    segment (operators/experiment.py simpsons_check): per-segment
    and pooled treated/control rates from ONE groupBy (the overall
    row re-aggregates the cells), sign-reversal flag against the
    broadcast pooled diff. Integer counts, one rounded division per
    rate."""
    from etl_orders_to_bq_spark.operators.experiment import simpsons_check

    e = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("treat"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("converted"),
        (F.col("user_id") % 3).alias("cohort"),
    )
    return simpsons_check(e, "treat", "converted", "cohort").orderBy(
        "segment"
    )


def q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type freshness audit (operators/quality.py
    freshness_audit): newest event anywhere is the clock (no
    wall-clock call — deterministic and replayable), integer-minute
    lags, staleness flag at 30 minutes. One groupBy + a 1-row
    broadcast."""
    from etl_orders_to_bq_spark.operators.quality import freshness_audit

    e = _t(spark, sf_dir, "events")
    return freshness_audit(e, "event_type", "ts", stale_minutes=30).orderBy(
        "event_type"
    )


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification of the vec_id % 50 == 0
    probe set against the labeled embedding corpus (operators/ann.py
    knn_classify): exact cosine, top-10 by (cos desc, id asc),
    majority label with label-asc ties — deterministic end to end;
    probes broadcast, per-probe windows parallel. For corpus-scale
    classification the IVF/LSH paths apply; this is the exact
    bounded-probe audit tool."""
    from etl_orders_to_bq_spark.operators.ann import knn_classify

    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") % 50 == 0)
    return knn_classify(e, probes, k=10).orderBy("probe_id")


def q_group_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact type-1 quartiles of event value per event type
    (operators/quality.py group_quartiles): value at rank ceil(q*n)
    — always an actual data value, no interpolation drift between
    engines; per-group windows, one conditional rollup."""
    from etl_orders_to_bq_spark.operators.quality import group_quartiles

    e = _t(spark, sf_dir, "events")
    return group_quartiles(e, "event_type", "value").orderBy(
        "event_type"
    )


def q_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily revenue anomaly flags (operators/timeseries.py
    daily_anomalies): median/MAD rank picks over the calendar-
    bounded daily table (decimal-exact totals), |x - med| > 3*MAD
    rule, NULL score when MAD degenerates."""
    from etl_orders_to_bq_spark.operators.timeseries import (
        daily_anomalies,
    )

    o = _t(spark, sf_dir, "orders")
    return daily_anomalies(o, "o_orderdate", "o_totalprice", k=3.0)


def q_ip_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 scalar family (functions/net.py): dotted-quad <-> uint32
    round trip and CIDR containment over per-user synthesized
    addresses plus one malformed probe (the NULL-not-error
    contract). Pure integer/string column math — identical
    arithmetic replayed by the oracle."""
    from etl_orders_to_bq_spark.functions.net import (
        ip_in_cidr,
        ipv4_to_long,
        long_to_ipv4,
    )

    e = _t(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    ips = users.select(
        F.col("user_id"),
        F.concat_ws(
            ".",
            F.lit("10"),
            (F.col("user_id") % 128).cast("string"),
            ((F.col("user_id") * 7) % 256).cast("string"),
            ((F.col("user_id") * 13) % 256).cast("string"),
        ).alias("ip"),
    ).unionByName(
        spark.createDataFrame(
            [(-1, "bad.ip")], "user_id long, ip string"
        )
    )
    return ips.select(
        "user_id",
        "ip",
        ipv4_to_long("ip").alias("ip_num"),
        long_to_ipv4(ipv4_to_long("ip")).alias("ip_roundtrip"),
        # the FUNCTION yields NULL for malformed input (unit-tested);
        # the gate coalesces to false because engines render null
        # booleans differently client-side (the simpsons_check lesson)
        F.coalesce(
            ip_in_cidr("ip", "10.64.0.0/10"), F.lit(False)
        ).alias("in_tenant_block"),
    ).orderBy("user_id")


def q_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap between two sources' top-20 vocabularies
    (operators/lm.py rbo_overlap): deterministic rankings, ONE join
    census (a shared term enters both prefixes at max(rank_a,
    rank_b)), repr'd (1-p)p^(d-1)/d literals, and a fixed d-ascending
    20-term sum the oracle replays left-to-right."""
    from etl_orders_to_bq_spark.operators.lm import rbo_overlap

    d = _t(spark, sf_dir, "documents")
    return rbo_overlap(d, "source", "src0", "src1", k=20, p=0.9)


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift test, click vs error
    values (operators/multitest.py ks_two_sample): empirical CDFs
    from exact integer cumulatives via the scalable two-pass
    global_cumsum_before (twice — one per group's counts), per-value
    gaps rounded BEFORE the max, asymptotic 95% bound from a repr'd
    Smirnov coefficient."""
    from etl_orders_to_bq_spark.operators.multitest import ks_two_sample

    e = _t(spark, sf_dir, "events")
    return ks_two_sample(e, "event_type", "value", "click", "error")


def q_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array-exact duplicated spans (operators/suffix.py): every
    maximal token span [start, end) whose positions lie under some
    corpus-duplicated 15-token window — the ExactSubstr detection
    stage of Lee et al. 2021, via the window equivalence (see module
    docstring). The fixture has ~850 naturally duplicated 15-grams, so
    the workload is real without planting. Pure integer/string plan;
    the oracle replays windows, corpus group-count, covered-position
    islands."""
    from etl_orders_to_bq_spark.operators.suffix import (
        exact_substring_spans,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_substring_spans(d, min_tokens=15).orderBy(
        "doc_id", "span_start"
    )


def q_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal (operators/suffix.py): per document, delete
    ALL occurrences of every corpus-duplicated >= 15-token span (the
    Lee et al. 2021 contract) and re-join survivors — (doc_id,
    n_tokens, dup_tokens, n_spans, clean_text). The oracle rebuilds
    clean_text by filtering token indices against the covered-position
    list."""
    from etl_orders_to_bq_spark.operators.suffix import (
        exact_substring_dedup,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_substring_dedup(d, min_tokens=15).orderBy("doc_id")


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum interleave (operators/ranking.py curriculum_order):
    documents difficulty-tiled by (quality_score 6dp, doc_id) into 10
    exact ntiles, round-robin curriculum_key = (cycle-1)*10 + bucket —
    everything a closed-form projection over ONE global row number (no
    global or per-bucket window). Oracle replays the window ntile
    arithmetic and both derived columns."""
    from etl_orders_to_bq_spark.functions.text import quality_score
    from etl_orders_to_bq_spark.operators.ranking import (
        curriculum_order,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.round(quality_score("text"), 6).alias("difficulty")
    )
    return curriculum_order(
        d, ["difficulty", "doc_id"], n_buckets=10
    ).select(
        "doc_id", "difficulty", "bucket", "cycle", "curriculum_key"
    ).orderBy("doc_id")


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head fit (operators/lm.py zipf_slope): least-squares
    log10(freq) ~ log10(rank) over the top-1000 terms — top-k via
    TakeOrderedAndProject (no vocabulary-wide rank window), 6dp
    micro-unit logs, EXACT decimal regression sums, one double
    division. The oracle replays ranks, quantization, sums, and both
    formulas."""
    from etl_orders_to_bq_spark.operators.lm import zipf_slope

    d = _t(spark, sf_dir, "documents").select("text")
    return zipf_slope(d, top_k=1000)


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot delta census (operators/dedup.py corpus_diff): old =
    the documents table; new = the same minus doc_id % 97 == 0
    (removed), with ' v2' appended to text where doc_id % 13 == 0
    (changed), moved to the neighboring source group where
    doc_id % 11 == 0 (n_moved_in at the new group / n_moved_out at
    the old), plus five re-keyed copies of docs 0-4 (added). One
    full-outer hash join on 16-byte fingerprints; the oracle replays
    the synthetic snapshot, the status case and the move rows."""
    from etl_orders_to_bq_spark.operators.dedup import corpus_diff

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    new = (
        d.filter(F.col("doc_id") % 97 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit("src"),
                    ((F.col("doc_id") + 1) % 20).cast("string"),
                ),
            )
            .otherwise(F.col("source"))
            .alias("source"),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(F.col("text"), F.lit(" v2")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            d.filter(F.col("doc_id") < 5).select(
                (F.col("doc_id") + 500000).alias("doc_id"),
                "source",
                "text",
            )
        )
    )
    return corpus_diff(d, new).orderBy("source")


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch hard-negative mining (operators/ann.py hard_negatives,
    the DPR recipe): queries = vec_id % 100 == 0, positives = (q,
    q+1); per query the top-3 same-region cosine neighbors excluding
    self and positives. Regions come from the shared
    auto_region_assign policy (seed-42 cheap branch at the gate SFs,
    same count-driven k as diverse_sample), so the oracle replays
    assignment, the anti-join, 6dp cosines, and the rank window."""
    from etl_orders_to_bq_spark.operators.ann import hard_negatives

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id")
    )
    pos = qs.select(
        "query_id", (F.col("query_id") + 1).alias("pos_id")
    )
    return hard_negatives(e, qs, pos, dim=64, k=3).orderBy(
        "query_id", "rank"
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based near-dup representative selection
    (operators/dedup.py dedup_keep_best, the RefinedWeb/FineWeb keep
    rule): the dedup_clusters pipeline (planted dups, 4-hash/2-band
    MinHash, connected components) but the kept member is the MAX
    quality_score (6dp), ties to the smaller id — not min-id. Oracle
    replays signatures, banding, the recursive-CTE closure, and the
    argmax."""
    from etl_orders_to_bq_spark.functions.text import quality_score
    from etl_orders_to_bq_spark.operators.dedup import (
        dedup_keep_best,
        minhash_lsh_candidates,
    )

    d = _docs_with_planted_dups(spark, sf_dir)
    pairs = minhash_lsh_candidates(
        d, text_col="text", id_col="doc_id", num_hashes=4, bands=2,
        shingle_len=3,
    )
    scored = d.select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality")
    )
    return dedup_keep_best(pairs, scored).orderBy("component")


def q_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive reproducibility manifest (operators/dedup.py
    corpus_manifest): per source, an exact commutative content digest
    (sum of 60-bit md5 values binding id+text) + row census — equal
    corpora give equal manifests under ANY partitioning or engine.
    Oracle replays the hex-parse sum exactly."""
    from etl_orders_to_bq_spark.operators.dedup import corpus_manifest

    d = _t(spark, sf_dir, "documents")
    return corpus_manifest(d).orderBy("source")


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE inference (operators/lm.py bpe_encode): apply a fixed
    5-merge list — the artifact a trained tokenizer ships as — to
    every document; vocabulary encoded once (one staged vocab-sized
    fold per merge), token stream pays a word join + one reassembly
    groupBy. Merges chosen to cascade on the fixture vocabulary
    (k+e -> ke, ke+y</w> -> key</w>, ...). The oracle replays the
    per-merge greedy fold with wrapped-element list_reduce and the
    in-order flatten."""
    from etl_orders_to_bq_spark.operators.lm import bpe_encode

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    merges = [
        ("k", "e"), ("ke", "y</w>"), ("a", "g"),
        ("ag", "g</w>"), ("t", "a"),
    ]
    return bpe_encode(d, merges).orderBy("doc_id")


def q_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out Stupid Backoff trigram scoring (operators/lm.py
    stupid_backoff_scores, Brants et al. 2007): even doc_ids train the
    count tables, odd doc_ids are scored — the split makes the backoff
    cascade actually fire (self-scoring never leaves the trigram
    level). Per-position 6dp rounding before the sorted fold; the
    oracle replays counts, the three-level case cascade, and the
    fold."""
    from etl_orders_to_bq_spark.operators.lm import stupid_backoff_scores

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    return stupid_backoff_scores(test, train).orderBy("doc_id")


def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram scoring (operators/lm.py
    kneser_ney_scores; Kneser & Ney 1995, Chen & Goodman 1999 — the
    KenLM/CCNet smoothing): even doc_ids train the count + continuation
    tables, odd doc_ids are scored, same held-out split as
    stupid_backoff so the interpolation cascade carries real mass.
    Every probability is a fixed +,-,*,/ dag over exact integer counts
    (D = 0.75 binary-exact); per-position 6dp rounding before the
    sorted fold. The oracle replays the five type censuses and the
    two-level interpolation verbatim."""
    from etl_orders_to_bq_spark.operators.lm import kneser_ney_scores

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    return kneser_ney_scores(test, train).orderBy("doc_id")


def q_pca_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA, first component (operators/embstats.py
    pca_pc1_scores): integer-exact scatter matrix (one dim²-key
    aggregation of micro-unit products — no float accumulation in any
    shuffle), 8 driver-side power-iteration rounds with per-round
    trunc-rescale + exact-integer norm + micro re-quantization, then a
    pure-integer projection. Every arithmetic step is replayed by the
    oracle bit-for-bit (the only float ops are sqrt/divide on
    bit-identical inputs), so the gate pins the full eigensolve, not
    just the scores' shape."""
    from etl_orders_to_bq_spark.operators.embstats import pca_pc1_scores

    e = _t(spark, sf_dir, "embeddings")
    return pca_pc1_scores(e, dim=64, rounds=8).orderBy("vec_id")


def q_benchmark_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train/eval n-gram decontamination census (operators/suffix.py
    benchmark_ngram_contamination): docs with doc_id % 50 == 0 play
    the benchmark suite, the rest are the training corpus; a train doc
    is contaminated when it shares any 10-token window with any eval
    doc (the GPT-3/PaLM hygiene check). A 12-token passage of eval doc
    0 is PLANTED into train docs 1-9 (broadcast 1-row leak string, no
    collect) so verbatim leaks sit alongside the fixture's thin
    natural overlap; both flag states are populated. Oracle replays
    the plant, the distinct eval-gram join, and the per-doc distinct
    counts."""
    from etl_orders_to_bq_spark.operators.suffix import (
        benchmark_ngram_contamination,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ev = d.filter(F.col("doc_id") % 50 == 0)
    leak = ev.filter(F.col("doc_id") == 0).select(
        F.array_join(
            F.slice(
                F.regexp_extract_all(
                    F.trim(F.col("text")), F.lit(r"(\S+)"), 1
                ),
                1,
                12,
            ),
            " ",
        ).alias("__leak")
    )
    # left join on TRUE + concat_ws: a fixture without doc 0 leaves
    # __leak NULL, which concat_ws skips — train survives un-planted
    # (matching the oracle's coalesce) instead of being emptied by a
    # 0-row crossJoin or NULLed by concat
    train = (
        d.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(leak), F.lit(True), "left")
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") < 10,
                F.concat_ws(" ", F.col("text"), F.col("__leak")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return benchmark_ngram_contamination(train, ev, ngram=10).orderBy(
        "doc_id"
    )


def q_paragraph_quality_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet-style per-paragraph curation (operators/paragraphs.py):
    paragraph split -> corpus-wide exact paragraph dedup (keep first
    by (doc_id, idx)) -> per-paragraph quality filter at 0.35 ->
    reassemble. The fixture has no newlines, so the query SYNTHESIZES
    paragraph structure the oracle replays exactly: 12-word chunks
    joined by newline (96 naturally duplicated paragraphs; the 0.35
    threshold keeps ~25% — both drop rules exercised)."""
    from etl_orders_to_bq_spark.operators.paragraphs import (
        paragraph_quality_filter,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.regexp_extract_all(F.trim(F.col("text")), F.lit(r"(\S+)"), 1)
    nchunks = F.greatest(F.ceil(F.size(w) / 12).cast("int"), F.lit(1))
    para_text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), nchunks - 1),
            lambda i: F.array_join(F.slice(w, i * 12 + 1, 12), " "),
        ),
        "\n",
    )
    docs = d.select("doc_id", para_text.alias("text"))
    return paragraph_quality_filter(docs, min_quality=0.35).orderBy(
        "doc_id"
    )


def q_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve data-layout census (functions/zorder.py
    with_hilbert_key) — the locality-preserving upgrade over
    q_zorder_layout's Morton key (same bucket shape on purpose, so
    the two entries are directly comparable): normalize
    (o_custkey, o_totalprice) to 8 bits each, walk the public xy2d
    loop as staged Column bit math (one withColumns projection per
    bit level — never one janino-busting nested expression), bucket
    on the key's top 4 bits and report each bucket's min/max
    rectangle on BOTH dimensions. tests/test_r11_ops.py proves the
    Hilbert buckets' total span <= Morton's on a full grid. The
    oracle replays the normalization and all 8 loop levels as
    chained CTEs. No counterpart in the reference engine (SURVEY.md
    §2.2 — single-file pandas, no layout control)."""
    from etl_orders_to_bq_spark.functions.zorder import (
        normalize_to_bits,
        with_hilbert_key,
    )

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    lo_c, hi_c, lo_p, hi_p = o.agg(
        F.min("o_custkey"),
        F.max("o_custkey"),
        F.min("o_totalprice"),
        F.max("o_totalprice"),
    ).first()
    h = with_hilbert_key(
        o,
        normalize_to_bits(F.col("o_custkey"), lo_c, hi_c, bits=8),
        normalize_to_bits(F.col("o_totalprice"), lo_p, hi_p, bits=8),
        bits=8,
    )
    return (
        h.groupBy(F.shiftright("hkey", 12).cast("int").alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("bucket")
    )


def q_ridge_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression via distributed normal equations
    (operators/ridge.py): extendedprice ~ quantity + discount-cents
    over lineitem, lam=10. ONE 9-sum scan (exact int64 Gram/moment
    sums — features quantized with floor(x+0.5)/floor(x*100+0.5),
    pure double ops identical on both engines, never round()),
    driver-side Cramer in unbounded Python ints, half-away 6dp
    coefficients. The oracle replays the sums and determinants in
    hugeint with // division. Nothing downstream of the single scan
    grows with the data."""
    from etl_orders_to_bq_spark.operators.ridge import ridge_normal

    li = _t(spark, sf_dir, "lineitem")
    d = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("x2"),
        F.floor(F.col("l_extendedprice") + 0.5).cast("long").alias("y"),
    )
    return ridge_normal(d, "x1", "x2", "y", lam=10)


def q_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (operators/
    timeseries.py classical_decompose) of the daily event count:
    trend = centered 7-day moving average, weekly seasonal effects
    from per-slot means of the detrended series (re-centered to sum
    ~0), remainder = y - trend - seasonal. Every mean is an exact
    integer half-away micro division, so the oracle replays the
    identical windows and slot means bit-for-bit. Edge days (no full
    window) report NULL trend/remainder by construction."""
    import datetime

    from etl_orders_to_bq_spark.operators.timeseries import (
        classical_decompose,
    )

    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.datediff(
                F.to_date("ts"), F.lit(datetime.date(1970, 1, 1))
            ).alias("t")
        )
        .agg(F.count("*").alias("y"))
        .withColumn("g", F.lit("all"))
    )
    return classical_decompose(daily, "g", "t", "y", m=7).orderBy("t")


def q_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling (operators/sampling.py
    neyman_allocation): a 100-doc audit budget split across the 20
    sources in proportion to N_h*S_h (exact integer variance sums;
    sqrt of identical integer-derived operands is one correctly-
    rounded double on both engines), drawn per stratum by md5 rank.
    The oracle replays the moments, the stratum-ordered normalizer
    fold, the floor(+0.5) allocation, and the qualify-style ranked
    draw."""
    from etl_orders_to_bq_spark.operators.sampling import (
        neyman_allocation,
    )

    d = _t(spark, sf_dir, "documents")
    return neyman_allocation(
        d, "source", "n_chars", "doc_id", total_n=100
    ).orderBy("source")


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/chunk.py
    cdc_chunk_documents — the LBFS/FastCDC boundary idea): chunk
    boundaries fall where the hash of the trailing 8-char window is
    = 0 mod 64, so chunk hashes survive insertions and power
    chunk-level near-dup detection; >256-char runs force-split.
    Scan-shaped in-row array work, zero shuffle. The oracle replays
    boundaries, cuts, force-splits and chunk md5s with DuckDB list
    functions (list_transform/list_filter — the vectorized-safe
    family, NOT list_reduce)."""
    from etl_orders_to_bq_spark.operators.chunk import (
        cdc_chunk_documents,
    )

    d = _spread_if_underpartitioned(
        spark, _t(spark, sf_dir, "documents")
    )
    # no orderBy: the compare is order-insensitive and a range sort
    # would sample-evaluate the hash projection a second time (the
    # empty-doc filter lives INSIDE the operator as a cheap length
    # predicate — a size(pairs) filter pushed the whole boundary
    # scan below the spread exchange; see cdc_chunk_documents)
    return cdc_chunk_documents(d)


def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the en-vs-de mean document length
    difference (operators/multitest.py permutation_test): 200
    deterministic md5 relabelings; stat_j >= stat_obs decided by
    cross-multiplied decimal(38,0) integers (no float touches the
    decision) and the 6dp stat via integral decimal div. The oracle
    replays every permutation in hugeint."""
    from etl_orders_to_bq_spark.operators.multitest import (
        permutation_test,
    )

    d = _t(spark, sf_dir, "documents")
    return permutation_test(
        d, "lang", "n_chars", "en", "de", "doc_id", n_perms=200
    )


def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language split-conformal prediction intervals (operators/
    experiment.py conformal_interval) on document length: md5 60/20/
    20 split, train-mean regressor, q_hat = the exact k-th smallest
    calibration residual (k = ceil((n+1)*0.9), partitioned window,
    id tie-break), observed test coverage as an exact micro ratio.
    Languages whose calibration set is too small for the level
    report NULL (infinite interval) on both engines."""
    from etl_orders_to_bq_spark.operators.experiment import (
        conformal_interval,
    )

    d = _t(spark, sf_dir, "documents")
    return conformal_interval(
        d, "lang", "n_chars", "doc_id", alpha_pct=10
    ).orderBy("lang")


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins + per-bin Brier (operators/
    classifier.py calibration_bins) over a synthetic well-calibrated
    scorer: p = md5('p:'||doc_id) micro-probability, y ~
    Bernoulli(p) via an independent md5 draw — E[y|p] = p by
    construction, so the bins hug the diagonal. All means are exact
    half-away micro divisions; the Brier mean runs as integral
    decimal div (its micro^2 sums pass 2^53 at ~4e3 rows/bin). The
    oracle rebuilds the same fixture and folds in hugeint."""
    from etl_orders_to_bq_spark.operators.classifier import (
        calibration_bins,
    )

    d = _t(spark, sf_dir, "documents")
    h = lambda pfx: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.lit(pfx), F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long") % 1000001
    scored = d.select(
        h("p").alias("p_micro"),
        F.when(h("y") < h("p"), 1).otherwise(0).alias("y"),
    )
    return calibration_bins(scored, "p_micro", "y").orderBy("bin")


def q_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC curve (operators/classifier.py roc_curve) for the
    weak length-predicts-English classifier: one point per distinct
    n_chars threshold, cumulative >= counts from the scalable
    two-pass global_cumsum_before (never a single-partition rank
    window), TPR/FPR as exact half-away micro ratios. The oracle
    replays the cumulative counts with a window (fixture-sized
    curve; the engine path stays partitioned)."""
    from etl_orders_to_bq_spark.operators.classifier import roc_curve

    d = _t(spark, sf_dir, "documents").select(
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    return roc_curve(d, "n_chars", "y")


def q_doremi_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain mixture reweighting (operators/mix.py
    doremi_mixture_weights, Xie et al. 2023): 3 exponentiated-
    gradient rounds over per-source unigram cross-entropy, reference
    loss re-weighted by the CURRENT alpha each round. Losses are
    exact half-away micro means of 6dp token logprobs; the array
    stage folds in source order and the exp is the engine's staged
    Taylor-Horner kernel (shared literals with the oracle's
    _det_exp_sql replay). Upweights hard domains — the mixture knob
    of a pretraining data pipeline."""
    from etl_orders_to_bq_spark.operators.mix import (
        doremi_mixture_weights,
    )

    d = _t(spark, sf_dir, "documents")
    return doremi_mixture_weights(d, "source", "text")


def q_adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaBoost.M1 over threshold stumps (operators/classifier.py
    adaboost_stumps — the original Freund-Schapire beta form, chosen
    BECAUSE beta = err/(1-err) is a ratio of exact integers here):
    3 boosting rounds on a planted length rule with 10% md5 label
    noise, so round 1 recovers the split and later rounds fight the
    reweighted noise. Per round: one groupBy(feature), the two-pass
    partitioned cumsum for the threshold sweep, a 1-row argmin
    collect; weights update by exact integral decimal div. The
    oracle replays all three rounds as chained CTEs in hugeint."""
    from etl_orders_to_bq_spark.operators.classifier import (
        adaboost_stumps,
    )

    d = _t(spark, sf_dir, "documents")
    noise = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % 10
        == 0
    )
    planted = F.col("n_chars") >= 250
    lab = d.select(
        F.col("n_chars").alias("x"),
        F.when(planted != noise, 1).otherwise(0).alias("y"),
    )
    return adaboost_stumps(lab, "x", "y", rounds=3)


def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) recalibration via the closed minimax form
    (operators/classifier.py isotonic_calibration) of a deliberately
    NON-monotone scorer: p = md5 micro-probability but y fires at
    the tent-map rate f(p) = p below 0.5 and 1-p above, so the upper
    deciles' rates fall and the fit must pool them. Interval
    averages quantize half-away to the 6dp grid before the min/max;
    the input is the model-sized decile table, so the bins^3 minimax
    join is constant work. iso_rate is monotone by construction."""
    from etl_orders_to_bq_spark.operators.classifier import (
        isotonic_calibration,
    )

    d = _t(spark, sf_dir, "documents")
    h = lambda pfx: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.lit(pfx), F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long") % 1000001
    p = h("p")
    tent = F.when(p < 500000, p).otherwise(F.lit(1000000) - p)
    scored = d.select(
        F.floor(p * 10 / 1000001.0).cast("int").alias("bin"),
        F.when(h("y") < tent, 1).otherwise(0).alias("y"),
    )
    bins = scored.groupBy("bin").agg(
        F.sum("y").alias("pos"), F.count("*").alias("n")
    )
    return isotonic_calibration(bins, "bin", "pos", "n")


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths via the MM algorithm
    (operators/preference.py bradley_terry, Hunter 2004 — the
    pairwise-preference fit behind reward-model data work): each
    document synthesizes one comparison between its source and an
    md5-drawn opponent source, with the winner drawn by the EXACT
    integer rational h % (s_a+s_b) < s_a against planted strengths
    s(srcK) = K+1 — so the fit must recover an increasing ladder.
    The comparison stream collapses to the item-PAIR table first
    (one map-side groupBy); 3 MM rounds run on the 20-item table
    with opponent-ordered folds and per-round 6dp re-quantization.
    The oracle replays the draw and all rounds in list arithmetic."""
    from etl_orders_to_bq_spark.operators.preference import (
        bradley_terry,
    )

    d = _t(spark, sf_dir, "documents")
    h = lambda pfx: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.lit(pfx), F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    bk = h("b") % 20
    sa = F.substring(F.col("source"), 4, 10).cast("long") + 1
    sb = bk + 1
    comp = d.select(
        F.col("source").alias("a"),
        F.concat(F.lit("src"), bk.cast("string")).alias("b"),
        F.when(h("w") % (sa + sb) < sa, 1).otherwise(0).alias("win"),
    ).filter(F.col("a") != F.col("b"))
    return bradley_terry(comp, "a", "b", "win", rounds=3)


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across every event_type's value distribution
    (operators/multitest.py kruskal_wallis) — the k-group rank test.
    Same exact-rank machinery as mann_whitney (two-pass
    global_cumsum_before, doubled decimal(38,0) rank sums, exact tie
    correction); the cross-group sum R_g^2/n_g is a SORTED FOLD over
    the bounded group domain so float order is engine-pinned. The
    oracle replays the cumsum with a window (semantics, not plan) and
    the fold with list_reduce(list_transform(list_sort(...)))."""
    from etl_orders_to_bq_spark.operators.multitest import kruskal_wallis

    e = _t(spark, sf_dir, "events")
    return kruskal_wallis(e, "event_type", "value")


def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F over lineitem revenue by return flag
    (operators/multitest.py anova_oneway). Group moments are EXACT
    decimal sums (S_g at (38,2), sum of squares at (38,4) — the
    money-exact fixture contract); the only float mixing,
    sum_g S_g^2/n_g, is the sorted-fold-over-groups discipline, and
    F is a fixed-order double expression over the two 6dp-rounded
    sums of squares."""
    from etl_orders_to_bq_spark.operators.multitest import anova_oneway

    li = _t(spark, sf_dir, "lineitem")
    return anova_oneway(li, "l_returnflag", "l_extendedprice")


def q_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudomedian of supplier balances per nation
    (operators/multitest.py hodges_lehmann): median of all n(n+1)/2
    Walsh averages via a bounded within-group self-join, the two
    middle order statistics picked by a row_number tie-broken on
    (i, j), collapsed with ONE rounded /4 division over exact
    decimal(38,2) sums. Groups are nation-sized (bounded-domain
    contract, documented)."""
    from etl_orders_to_bq_spark.operators.multitest import hodges_lehmann

    s = _t(spark, sf_dir, "supplier")
    return hodges_lehmann(s, "s_nationkey", "s_acctbal", "s_suppkey")


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Spearman rho between quantity and revenue per return
    flag (operators/rankcorr.py spearman_rho). Ranks never touch
    floats: doubled average ranks (2r = 2*below + t + 1) from
    per-group distinct-value cumsums, six exact decimal(38,0)
    moments, ONE rounded double expression. The oracle replays the
    identical rank/moment arithmetic with window cumsums."""
    from etl_orders_to_bq_spark.operators.rankcorr import spearman_rho

    li = _t(spark, sf_dir, "lineitem")
    return spearman_rho(li, "l_returnflag", "l_quantity", "l_extendedprice")


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between customer count and balance mass across
    nations, per market segment (operators/rankcorr.py kendall_tau):
    exact concordant/discordant/tie-pair integers from a bounded
    within-group pair join over the nation-level cell table
    (25 rows/group — the documented bounded-domain contract), tau_b
    one rounded double."""
    from etl_orders_to_bq_spark.operators.rankcorr import kendall_tau

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cells = (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("bal"),
        )
    )
    return kendall_tau(cells, "c_mktsegment", "cnt", "bal", "n_nationkey")


def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing adjusted counts r* = (r+1)N_{r+1}/N_r over the
    corpus trigram-shingle stream (operators/lm.py good_turing —
    the fixture's closed 31-word vocabulary makes unigram GT
    degenerate, so the entry smooths the dedup-relevant shingle
    distribution): explode, one
    vocabulary groupBy, one counts-of-counts groupBy (O(sqrt N)
    rows), a self-join on r+1 over that tiny table. Every N_r is an
    exact integer; r*/p_gt are single rounded doubles. N_{r+1}=0
    reports the literal GT estimate 0, not NULL."""
    from etl_orders_to_bq_spark.operators.lm import good_turing

    d = _t(spark, sf_dir, "documents")
    return good_turing(d, "text", max_r=15, ngram=3)


def q_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness + Turing coverage of the corpus trigram-shingle
    space (operators/lm.py chao1_richness): bias-corrected
    S_obs + f1(f1-1)/(2(f2+1)) and 1 - f1/N from exact singleton/
    doubleton integers — the vocabulary-sizing / crawl-saturation
    report."""
    from etl_orders_to_bq_spark.operators.lm import chao1_richness

    d = _t(spark, sf_dir, "documents")
    return chao1_richness(d, "text", ngram=3)


def q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified IPW treatment effect of urgent order priority on
    order value, strata = market segment (operators/experiment.py
    ipw_ate): exact decimal(38,2) per-stratum outcome sums, Hajek
    normalization collapsing the weight denominators to exact stratum
    sizes, per-stratum divisions as a sorted fold over the bounded
    stratum domain; overlap-violating strata dropped and counted."""
    from etl_orders_to_bq_spark.operators.experiment import ipw_ate

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(
        broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(
        (F.substring("o_orderpriority", 1, 1) <= "2")
        .cast("int")
        .alias("treated"),
        "o_totalprice",
        "c_mktsegment",
    )
    return ipw_ate(j, "treated", "o_totalprice", "c_mktsegment")


def q_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-truss of the 1000-node lineitem projection graph
    (operators/graph.py k_truss): iterative support peeling — each
    round one oriented-wedge triangle enumeration (Cohen plan, each
    triangle found once), one exploded support groupBy, one filter at
    support >= 6, staged per round, fixpoint by edge count (4 rounds
    on this fixture at sf0.01). The oracle unrolls 6 peel rounds as
    chained materialized CTEs with an error() fixpoint guard and
    recomputes the surviving edges' support inside the truss."""
    from etl_orders_to_bq_spark.operators.graph import k_truss

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 1000).alias("src"),
        (F.col("l_partkey") % 1000).alias("dst"),
    )
    return k_truss(li, k=8).orderBy("a", "b")


def q_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match segmentation of the corpus
    vocabulary (operators/lm.py wordpiece_segment): piece vocab =
    prefixes + ##-substrings of the top-10 words (count desc, word
    tie-break), encoding on DISTINCT words only (the bpe_encode
    discipline) — bounded candidate explode, one broadcast vocab
    join, per-position maximal-munch jump table, one bounded fold
    per word; whole-word [UNK] on any failure. The oracle replays
    the greedy walk as a RECURSIVE CTE over the jump table (the
    span_corrupt relational-replay pattern — never a full-chunk
    list_reduce)."""
    from etl_orders_to_bq_spark.operators.lm import wordpiece_segment

    d = _t(spark, sf_dir, "documents")
    return wordpiece_segment(d, "text", top_k=10, max_piece=6, max_word=24)


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement between the fixture's lang label
    and the engine's cheap language_id classifier
    (operators/classifier.py cohens_kappa): confusion cells, row/col
    marginals over the label UNION, and kappa as ONE rounded division
    of two exact decimal(38,0) integers (the algebraic clearing of
    (po-pe)/(1-pe)) — the annotator/LLM-judge agreement gate."""
    from etl_orders_to_bq_spark.functions.text import language_id
    from etl_orders_to_bq_spark.operators.classifier import cohens_kappa

    d = _t(spark, sf_dir, "documents").select(
        "lang", language_id("text").alias("lang_pred")
    )
    return cohens_kappa(d, "lang", "lang_pred")


def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar marginal-homogeneity test between two cheap document
    classifiers on the same corpus (operators/classifier.py
    mcnemar_test): exact discordant counts, continuity-corrected
    chi2, and the two-sided p via z = sqrt(chi2) through the engine's
    deterministic Phi (shared literals with the oracle)."""
    from etl_orders_to_bq_spark.functions.text import token_count
    from etl_orders_to_bq_spark.operators.classifier import mcnemar_test

    d = _t(spark, sf_dir, "documents").select(
        (F.col("n_chars") > 300).alias("clf_a"),
        (token_count(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))) > 55).alias("clf_b"),
    )
    return mcnemar_test(d, "clf_a", "clf_b")


def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect multi-touch attribution over the first-order
    Markov journey model (operators/attribution.py
    markov_attribution): Spark builds exact per-user journey
    transition counts (two keyed windows + one groupBy); the
    absorption solve runs 25 synchronous micro-integer value-iteration
    rounds over the (|channels|+2)^2-bounded count table driver-side
    (ridge/kmeans bounded-collect discipline). The oracle rebuilds
    the transitions and unrolls all 25 rounds as chained CTEs in
    hugeint arithmetic — every digit replays."""
    from etl_orders_to_bq_spark.operators.attribution import (
        markov_attribution,
    )

    e = _t(spark, sf_dir, "events")
    return markov_attribution(e).orderBy("channel")


def q_pacf_durbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily event-value series via
    Durbin-Levinson (operators/timeseries.py pacf_durbin): day-indexed
    daily sums, lag covariances EXACT at scale n^2 (decimal products
    of centered terms), rho as one rounded division per lag, and the
    recursion over the rounded rho literals driver-side (ridge Cramer
    discipline). The oracle replays the identical chained-subtraction
    IEEE expression tree level by level — float order is part of the
    contract."""
    from etl_orders_to_bq_spark.operators.timeseries import pacf_durbin

    e = _t(spark, sf_dir, "events")
    return pacf_durbin(e, "ts", "value", max_lag=5)


def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Burrows' Delta style distance between sources
    (operators/stylometry.py burrows_delta) — provenance forensics:
    exact micro-integer relative frequencies (decimal div), per-word
    moments from exact integer sums, z-scores as fixed-order doubles,
    and the per-pair |dz| sum as a sorted fold over the bounded
    top-word list. Only the token explode + (source, word) groupBy
    are corpus-sized."""
    from etl_orders_to_bq_spark.operators.stylometry import burrows_delta

    d = _t(spark, sf_dir, "documents")
    return burrows_delta(d, "source", "text", top_n=20)


def q_ransac_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC line recovery through planted gross outliers
    (operators/ridge.py ransac_line): y = 3x + 5 with deterministic
    half-unit noise and every 7th order shifted +500 — least squares
    would chase the shift, RANSAC's 64 md5-argmin minimal samples
    recover the line. Trial draws map-side combine to 2 struct minima
    per trial (permutation_test shuffle shape); the inlier test is
    exact decimal cross-multiplication, no division until the winning
    trial's one rounded slope/intercept."""
    from etl_orders_to_bq_spark.operators.ridge import ransac_line

    o = _spread_if_underpartitioned(spark, _t(spark, sf_dir, "orders"))
    pts = o.select(
        F.col("o_orderkey").alias("pid"),
        (F.col("o_orderkey") % 100).cast("double").alias("x"),
        (
            3.0 * (F.col("o_orderkey") % 100).cast("double")
            + 5.0
            + ((F.col("o_orderkey") % 3) - 1).cast("double") * 0.5
            + F.when(F.col("o_orderkey") % 7 == 0, 500.0).otherwise(0.0)
        ).alias("y"),
    )
    # single-file local fixtures arrive as ONE split; the 64x trial
    # expansion would serialize on one core without the spread
    return ransac_line(pts, "x", "y", "pid", eps=2.0, n_trials=64)


def q_ransac_subsampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC with deterministic 1/8 subset scoring (advisor r12:
    operators/ridge.py ransac_line subsample_mod) — every trial is
    scored on the md5(seed:s:id) mod 8 == 0 rows, the argmax line
    alone is re-counted on the FULL data, so n_inliers stays exact
    while trial-scoring work drops ~8x. Same planted y = 3x + 5
    fixture as ransac_line."""
    from etl_orders_to_bq_spark.operators.ridge import ransac_line

    o = _spread_if_underpartitioned(spark, _t(spark, sf_dir, "orders"))
    pts = o.select(
        F.col("o_orderkey").alias("pid"),
        (F.col("o_orderkey") % 100).cast("double").alias("x"),
        (
            3.0 * (F.col("o_orderkey") % 100).cast("double")
            + 5.0
            + ((F.col("o_orderkey") % 3) - 1).cast("double") * 0.5
            + F.when(F.col("o_orderkey") % 7 == 0, 500.0).otherwise(0.0)
        ).alias("y"),
    )
    return ransac_line(
        pts, "x", "y", "pid", eps=2.0, n_trials=64, subsample_mod=8
    )



def _unigram_lm_oracle_sql(
    seed_size: int, vocab_size: int, rounds: int, mp: int, mw: int,
    final: str = "vocab",
) -> str:
    """DuckDB replay of unigram_lm_train (operators/lm.py): the hard-EM
    Viterbi loop with the DP UNROLLED into mw pure-projection steps per
    round (DuckDB 1.0 mis-binds correlated subqueries and join columns
    inside recursive CTEs — verified with a 2-word repro — so the
    recursion is replaced by a fixed-depth chain over a per-word
    key->prob map, which is also exactly the Spark side's fold shape).
    All scores are fixed-order IEEE double products, so decisions are
    bit-identical to the engine's."""
    K = mp + 1

    def cand(k: int, l: int) -> str:
        key = k * K + l
        return (
            f"case when {l} <= {k} and "
            f"list_extract(m[{key}], 1) is not null then "
            f"struct_pack(s := list_extract(dp, {k - l + 1}).s * "
            f"list_extract(m[{key}], 1), bl := {l}) end"
        )

    sql = f"""
        with tok as (
          select unnest(regexp_extract_all(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g')), '\\S+')) as w
          from documents
        ),
        words as materialized (
          select w, count(*)::bigint as n, length(w) as len from tok
          group by w
          having length(w) between 1 and {mw}
        ),
        cand as materialized (
          select w, n, pos, l, substr(w, pos::int, l::int) as piece
          from words,
               unnest(range(1, len + 1)) as tp(pos),
               unnest(range(1, least({mp}, len - pos + 1) + 1)) as tl(l)
        ),
        chars as materialized (
          select distinct piece from cand where l = 1
        ),
        seed as materialized (
          select piece, sum(n)::bigint as c from cand group by piece
          order by c desc, piece limit {seed_size}
        ),
        vocab0 as materialized (
          select piece, c from seed
          union all
          select piece, 1::bigint as c from chars
          where piece not in (select piece from seed)
        )"""
    for r in range(1, rounds + 1):
        prev = f"vocab{r - 1}"
        sql += f""",
        probs{r} as materialized (
          select piece,
                 c::double / (select sum(c)::double from {prev}) as prob
          from {prev}
        ),
        pm{r} as materialized (
          select c.w,
                 map_from_entries(list(struct_pack(
                   k := ((c.pos + c.l - 1) * {K} + c.l)::bigint,
                   v := p.prob))) as m
          from cand c join probs{r} p using (piece)
          group by c.w
        ),
        fwd{r}_0 as materialized (
          select w.w, w.n, w.len, p.m,
                 [struct_pack(s := 1.0, bl := 0)] as dp
          from words w join pm{r} p using (w)
        )"""
        for k in range(1, mw + 1):
            cands = ", ".join(cand(k, l) for l in range(1, mp + 1))
            sql += f""",
        fwd{r}_{k} as materialized (
          select w, n, len, m,
            case when len < {k} then dp else list_append(dp,
              coalesce(list_reduce(
                list_filter([{cands}], x -> x.bl is not null),
                (a, b) -> case when b.s > a.s
                                 or (b.s = a.s and b.bl > a.bl)
                          then b else a end),
                struct_pack(s := -1.0, bl := 0))) end as dp
          from fwd{r}_{k - 1}
        )"""
        sql += f""",
        bt{r}_0 as materialized (
          select w, n, len as pos, dp,
                 cast([] as varchar[]) as ps
          from fwd{r}_{mw}
        )"""
        for k in range(1, mw + 1):
            sql += f""",
        bt{r}_{k} as materialized (
          select w, n,
            case when pos <= 0 then pos
                 else pos - list_extract(dp, pos + 1).bl end as pos,
            dp,
            case when pos <= 0 then ps
                 else list_append(ps, substr(w,
                   (pos - list_extract(dp, pos + 1).bl + 1)::int,
                   list_extract(dp, pos + 1).bl::int)) end as ps
          from bt{r}_{k - 1}
        )"""
        sql += f""",
        seg{r} as materialized (
          select w, n, unnest(ps) as piece from bt{r}_{mw}
        ),
        cnt{r} as materialized (
          select piece, sum(n)::bigint as c from seg{r} group by piece
        ),
        top{r} as materialized (
          select piece, c from cnt{r}
          order by c desc, piece limit {vocab_size}
        ),
        vocab{r} as materialized (
          select piece, c from top{r}
          union all
          select piece, 1::bigint as c from chars
          where piece not in (select piece from top{r})
        )"""
    if final == "encode":
        # one more Viterbi pass under the FINAL vocabulary, output in
        # the wordpiece_segment shape (pieces left-to-right, so the
        # end->start backtrack list reverses once)
        r = rounds + 1
        prev = f"vocab{rounds}"
        sql += f""",
        probs{r} as materialized (
          select piece,
                 c::double / (select sum(c)::double from {prev}) as prob
          from {prev}
        ),
        pm{r} as materialized (
          select c.w,
                 map_from_entries(list(struct_pack(
                   k := ((c.pos + c.l - 1) * {K} + c.l)::bigint,
                   v := p.prob))) as m
          from cand c join probs{r} p using (piece)
          group by c.w
        ),
        fwd{r}_0 as materialized (
          select w.w, w.n, w.len, p.m,
                 [struct_pack(s := 1.0, bl := 0)] as dp
          from words w join pm{r} p using (w)
        )"""
        for k in range(1, mw + 1):
            cands = ", ".join(cand(k, l) for l in range(1, mp + 1))
            sql += f""",
        fwd{r}_{k} as materialized (
          select w, n, len, m,
            case when len < {k} then dp else list_append(dp,
              coalesce(list_reduce(
                list_filter([{cands}], x -> x.bl is not null),
                (a, b) -> case when b.s > a.s
                                 or (b.s = a.s and b.bl > a.bl)
                          then b else a end),
                struct_pack(s := -1.0, bl := 0))) end as dp
          from fwd{r}_{k - 1}
        )"""
        sql += f""",
        bt{r}_0 as materialized (
          select w, n, len as pos, dp,
                 cast([] as varchar[]) as ps
          from fwd{r}_{mw}
        )"""
        for k in range(1, mw + 1):
            sql += f""",
        bt{r}_{k} as materialized (
          select w, n,
            case when pos <= 0 then pos
                 else pos - list_extract(dp, pos + 1).bl end as pos,
            dp,
            case when pos <= 0 then ps
                 else list_append(ps, substr(w,
                   (pos - list_extract(dp, pos + 1).bl + 1)::int,
                   list_extract(dp, pos + 1).bl::int)) end as ps
          from bt{r}_{k - 1}
        )"""
        sql += f"""
        select w as word, n,
               len(ps)::bigint as n_pieces,
               array_to_string(list_reverse(ps), ' ') as pieces
        from bt{r}_{mw}
        order by n desc, word
    """
        return sql
    sql += f"""
        select piece, c as "count",
               round(c::double / (select sum(c)::double from
                     vocab{rounds}), 6) as p
        from vocab{rounds}
        order by "count" desc, piece
    """
    return sql


def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) subword vocabulary training
    (operators/lm.py unigram_lm_train): 3 hard-EM rounds — Viterbi
    re-segmentation of the distinct words under the current piece
    probabilities, exact integer recounts, prune to 16 pieces with
    single-char coverage floor. All DP scores are fixed-order IEEE
    double products of count ratios, so the oracle's recursive-CTE
    replay is bit-identical."""
    from etl_orders_to_bq_spark.operators.lm import unigram_lm_train

    d = _t(spark, sf_dir, "documents")
    return unigram_lm_train(
        d, "text", seed_size=40, vocab_size=16, rounds=3,
        max_piece=4, max_word=16,
    )


def q_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi segmentation of the distinct words under the trained
    unigram LM (operators/lm.py unigram_encode) — the encode half of
    the bpe_train/bpe_encode pairing; same fit as unigram_lm plus one
    final DP pass, output in the wordpiece_segment shape."""
    from etl_orders_to_bq_spark.operators.lm import unigram_encode

    d = _t(spark, sf_dir, "documents")
    return unigram_encode(
        d, "text", seed_size=40, vocab_size=16, rounds=3,
        max_piece=4, max_word=16,
    )


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square + Cramér's V between order status and
    priority (operators/multitest.py chi2_independence): exact
    decimal(38,0) cell numerators, one double division per cell,
    SORTED fold over the bounded category grid."""
    from etl_orders_to_bq_spark.operators.multitest import (
        chi2_independence,
    )

    o = _t(spark, sf_dir, "orders")
    return chi2_independence(o, "o_orderstatus", "o_orderpriority")


def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test of account balances across market segments
    (operators/multitest.py mood_median_test): exact lower grand
    median from the fused two-pass cumsum, k x 2 above/not-above
    table, exact-integer chi-square cells, sorted fold."""
    from etl_orders_to_bq_spark.operators.multitest import (
        mood_median_test,
    )

    c = _t(spark, sf_dir, "customer")
    return mood_median_test(c, "c_mktsegment", "c_acctbal")


def q_benford_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformity of extended prices
    (operators/audit.py benford_digits): digits from the decimal
    STRING (never log10), expected probabilities as fixed shared
    literals, chi2 + Nigrini MAD via one sorted 9-row fold."""
    from etl_orders_to_bq_spark.operators.audit import benford_digits

    li = _t(spark, sf_dir, "lineitem")
    return benford_digits(li, "l_extendedprice")


def q_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down FWER control over per-segment balance z-tests
    (operators/multitest.py holm_bonferroni): same deterministic-Phi
    p-values as fdr_bh, the stricter family-wise rejection rule —
    the first rank failing alpha/(m-r+1) stops all later
    rejections."""
    from etl_orders_to_bq_spark.operators.multitest import (
        holm_bonferroni,
    )

    c = _t(spark, sf_dir, "customer")
    return holm_bonferroni(
        c, "c_mktsegment", "c_acctbal", alpha=0.05
    ).orderBy("c_mktsegment")


def q_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered systematic PPS sample of orders by total price
    (operators/sampling.py pps_systematic_sample): n=200 sample
    points at the interval midpoints, every selection decision exact
    integer arithmetic over cumulative cents (decimal div), big
    units hit multiply (the PPS-with-certainty property)."""
    from etl_orders_to_bq_spark.operators.sampling import (
        pps_systematic_sample,
    )

    o = _t(spark, sf_dir, "orders")
    return pps_systematic_sample(o, "o_orderkey", "o_totalprice", n=200)


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value multi-touch attribution over the events journeys
    (operators/attribution.py shapley_attribution): per-mask converted
    user counts, driver-side exact zeta transform + factorial-weighted
    marginals over the 2^C coalition lattice (C = distinct touch
    types, model-sized), one exact micro division per channel. The
    oracle rebuilds the lattice with data-derived C (recursive
    factorial CTE, bit_count weights, hugeint sums)."""
    from etl_orders_to_bq_spark.operators.attribution import (
        shapley_attribution,
    )

    e = _t(spark, sf_dir, "events")
    return shapley_attribution(e).orderBy("channel")


def q_jaro_winkler_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler near-name pairs over the part-name color
    vocabulary (operators/fuzzy.py jaro_winkler): the record-linkage
    metric as a pure Column fold (window matching, transpositions,
    prefix boost). The oracle scores the same pairs with DuckDB's
    NATIVE jaro_winkler_similarity — two independent implementations
    agreeing to 6dp, not a replay."""
    from etl_orders_to_bq_spark.functions.text import (
        normalize_text,
        tokenize,
    )
    from etl_orders_to_bq_spark.operators.fuzzy import jaro_winkler

    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(tokenize(normalize_text("text"))).alias("w")
    ).distinct()
    pairs = words.crossJoin(
        words.select(F.col("w").alias("w2"))
    ).filter(F.col("w") < F.col("w2"))
    return (
        pairs.select(
            F.col("w").alias("name_a"),
            F.col("w2").alias("name_b"),
            jaro_winkler("w", "w2").alias("jw"),
        )
        .filter(F.col("jw") >= 0.7)
        .orderBy(F.desc("jw"), "name_a", "name_b")
    )


def q_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density clusters over the deterministic embedding
    subset (operators/ann.py dbscan_labels): eps-graph on the 6dp
    distance grid, core = >= 3 in-eps neighbors (self included),
    clusters = min-id connected components, border ties to the
    smallest core label, noise explicit."""
    from etl_orders_to_bq_spark.operators.ann import dbscan_labels

    e = _t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 8 == 0
    )
    return dbscan_labels(e, eps=1.25, min_pts=3)


def q_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor over a deterministic embedding subset
    (operators/ann.py lof_scores): exact euclidean kNN with 6dp-grid
    distances, micro-integer reachability/lrd sums (order-free), LOF
    as one double division — the density-relative anomaly score."""
    from etl_orders_to_bq_spark.operators.ann import lof_scores

    e = _t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 8 == 0
    )
    return lof_scores(e, k=5)


def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unary functional-dependency mining over four orders columns
    (operators/profile.py fd_discovery): A -> B iff
    |distinct A| = |distinct (A,B)|, with the violating-determinant
    census from the same groupBy — the KEY-structure complement to
    inclusion_dependencies."""
    from etl_orders_to_bq_spark.operators.profile import fd_discovery

    o = _t(spark, sf_dir, "orders")
    return fd_discovery(
        o,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )


def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: do the event types keep a consistent daily
    magnitude ordering (operators/multitest.py friedman_test)?
    Blocks = days, treatments = event types, values = exact daily
    decimal sums; doubled within-block ranks from a bounded k^2
    self-join, and the tie-general statistic as ONE division of exact
    decimal(38,0) integers; Kendall's W alongside. Incomplete days
    are dropped and counted."""
    from etl_orders_to_bq_spark.operators.multitest import friedman_test

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    return friedman_test(daily, "day", "event_type", "v")


def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette of the deterministic Lloyd fit
    (operators/ann.py simplified_silhouette over lloyd_kmeans, k=8,
    seed-7 init): per-point distances to all centroids as fixed-order
    folds against the 6dp-snapped centroid literals, s = (b-a)/max
    quantized half-away to micro integers, per-cluster means as exact
    integer divisions. One linear projection + one groupBy — the
    O(n^2) pairwise silhouette collapsed against the k-row centroid
    list. The oracle replays the ENTIRE fit (the kmeans_lloyd
    unrolled chain) and then the same distance/micro arithmetic."""
    from etl_orders_to_bq_spark.operators.ann import (
        _hyperplanes,
        lloyd_kmeans,
        simplified_silhouette,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents, assigned = lloyd_kmeans(
        e, _hyperplanes(64, 8, seed=7), rounds=3, round_ndigits=6
    )
    return simplified_silhouette(assigned, cents)


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across the event types' daily success indicators
    (did the type spike past 150 that day) —
    operators/multitest.py cochran_q: the k-ary paired-binary test,
    ONE rounded division of exact decimal(38,0) row/column/total
    sums; incomplete days dropped and surfaced."""
    from etl_orders_to_bq_spark.operators.multitest import cochran_q

    e = _t(spark, sf_dir, "events")
    cells = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg((F.max("value") > 150).alias("spiked"))
    return cochran_q(cells, "day", "event_type", "spiked")


def q_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise z after Kruskal-Wallis, over every
    event-type pair (operators/multitest.py dunn_posthoc): the SAME
    global mean ranks as kruskal_wallis (doubled decimal rank sums,
    two-pass cumsum, exact tie sum); each pair's z is one fixed-order
    double over exact integers, p through the shared deterministic
    Phi. The pair build self-joins the k-row group table, never the
    data."""
    from etl_orders_to_bq_spark.operators.multitest import dunn_posthoc

    e = _t(spark, sf_dir, "events")
    return dunn_posthoc(e, "event_type", "value")


def q_streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming funnel (CEP-lite) through the real engine
    (streaming/stateful.py funnel_stream, applyInPandasWithState):
    per user a greedy non-overlapping view->click->purchase stage
    machine over the (ts, event_id)-ordered stream — two integers of
    state per user. One availableNow batch => the final update per
    user equals the batch greedy machine, which the oracle replays
    as a recursive CTE over per-user ordered step events."""
    from etl_orders_to_bq_spark.streaming.stateful import funnel_stream

    path = _stage_event_stream(spark, sf_dir, "plain")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path)
    out = _stream_to_batch(funnel_stream(stream), "sfunnel", "update")
    return out.orderBy("user_id")


def q_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-1 jackknife SE for revenue-per-unit by return flag
    (operators/bootstrap.py jackknife_ratio): the closed-form one-pass
    jackknife — exact cent-integer leave-one-out sums, half-away
    micro pseudo-values via decimal div, variance from exact micro
    moments. The honest uncertainty for a ratio metric."""
    from etl_orders_to_bq_spark.operators.bootstrap import jackknife_ratio

    li = _t(spark, sf_dir, "lineitem")
    return jackknife_ratio(
        li, "l_returnflag", "l_extendedprice", "l_quantity"
    )


def q_james_stein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-nation customer balance means
    (operators/experiment.py james_stein_means): method-of-moments
    tau2 from sorted folds over the bounded nation domain, exact
    micro-integer group means, per-group precision weights — the
    small-segment dashboard fix."""
    from etl_orders_to_bq_spark.operators.experiment import (
        james_stein_means,
    )

    c = _t(spark, sf_dir, "customer")
    return james_stein_means(c, "c_nationkey", "c_acctbal")


def q_dunning_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by Dunning's log-likelihood ratio
    (operators/lm.py dunning_llr_collocations): exact 2x2 contingency
    integers per pair, LLR one fixed-order double over the four
    cells (the mutual_information ln-parity precedent), top-k on the
    ROUNDED score with (w1, w2) tie-break."""
    from etl_orders_to_bq_spark.operators.lm import (
        dunning_llr_collocations,
    )

    d = _t(spark, sf_dir, "documents")
    return dunning_llr_collocations(d, "text", top_k=20)


def q_hill_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill-number diversity profile of the trigram-shingle
    distribution (operators/lm.py hill_diversity): q0/q1/q2 effective
    vocabulary sizes + Pielou evenness — Shannon H as a sorted fold,
    exp through the engine's deterministic Taylor-Horner kernel,
    inverse Simpson from exact decimal sums. Completes the
    chao1_richness corpus-saturation report."""
    from etl_orders_to_bq_spark.operators.lm import hill_diversity

    d = _t(spark, sf_dir, "documents")
    return hill_diversity(d, "text", ngram=3)


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the true corpus size
    from two simulated overlapping crawls (operators/dedup.py
    capture_recapture): crawl A keeps docs with md5(a:id) % 3 < 2,
    crawl B with md5(b:id) % 3 < 2 (independent 2/3 samples), keys =
    doc fingerprints; N_hat must land near the actual 100-per-sf0.001
    document count. Exact integer counts, one rounded expression per
    estimate."""
    from etl_orders_to_bq_spark.operators.dedup import capture_recapture

    d = _t(spark, sf_dir, "documents")
    h = lambda pfx: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.lit(pfx), F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    a = d.filter(h("a") % 3 < 2).select(F.md5("text").alias("fp"))
    b = d.filter(h("b") % 3 < 2).select(F.md5("text").alias("fp"))
    return capture_recapture(a, b, "fp")


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic trend test on daily event value sums
    (operators/timeseries.py mann_kendall_trend): exact integer S and
    tie sums from a pair join over the calendar-bounded daily table,
    continuity-corrected z, p through the shared deterministic Phi —
    the hypothesis-test companion to theilsen_trend."""
    from etl_orders_to_bq_spark.operators.timeseries import (
        mann_kendall_trend,
    )

    e = _t(spark, sf_dir, "events")
    return mann_kendall_trend(e, "ts", "value")


def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of customer lifetime revenue, decomposed
    within/between nations (operators/inequality.py
    theil_decomposition) — the decomposable alternative to
    gini_concentration, with the additivity identity reported as the
    __TOTAL__ row. Per-row terms quantize half-away to micro
    integers before summation (order-free exact sums); the between
    term folds over the bounded nation domain."""
    from etl_orders_to_bq_spark.operators.inequality import (
        theil_decomposition,
    )

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    j = rev.join(broadcast(c), rev.o_custkey == c.c_custkey).select(
        "c_nationkey", "rev"
    )
    return theil_decomposition(j, "c_nationkey", "rev")


def q_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-cohort log-rank test on signup->purchase conversion time
    with right-censoring (operators/survival.py log_rank_test,
    cohorts = user parity): risk sets from the fused two-pass cumsum
    over the distinct-duration table, per-time E/V terms quantized to
    micro integers before order-free exact summation, z through the
    shared deterministic Phi — the hypothesis-test companion to the
    Kaplan-Meier survival_curve entry."""
    from etl_orders_to_bq_spark.operators.survival import log_rank_test

    e = _t(spark, sf_dir, "events")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    pu = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    obs_end = e.agg(F.max("ts").alias("end_ts"))
    subj = (
        su.join(
            pu,
            (su.user_id == F.col("p_uid")) & (F.col("p_ts") >= su.s_ts),
            "left",
        )
        .groupBy("user_id", "s_ts")
        .agg(F.min("p_ts").alias("first_p"))
        .crossJoin(broadcast(obs_end))
        .select(
            F.when(F.col("user_id") % 2 == 0, "even")
            .otherwise("odd")
            .alias("cohort"),
            F.floor(
                (
                    F.unix_timestamp(
                        F.coalesce(F.col("first_p"), F.col("end_ts"))
                    )
                    - F.unix_timestamp(F.col("s_ts"))
                )
                / 60
            ).cast("long").alias("minutes"),
            F.col("first_p").isNotNull().cast("int").alias("converted"),
        )
    )
    return log_rank_test(
        subj, "cohort", "minutes", "converted", "even", "odd"
    )


def q_inclusion_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-candidate mining over the schema's key columns
    (operators/profile.py inclusion_dependencies): every ordered
    same-typed pair of 7 curated key columns gets an exact
    (n_distinct, n_violations, holds) verdict from one distinct
    projection per column + one anti-join per pair — the true FKs
    (custkey -> c_custkey, l_orderkey -> o_orderkey, nationkeys)
    must hold and the reversed/unrelated directions must not."""
    from etl_orders_to_bq_spark.operators.profile import (
        inclusion_dependencies,
    )

    cols = [
        ("nation.n_nationkey", _t(spark, sf_dir, "nation"),
         "n_nationkey"),
        ("customer.c_custkey", _t(spark, sf_dir, "customer"),
         "c_custkey"),
        ("customer.c_nationkey", _t(spark, sf_dir, "customer"),
         "c_nationkey"),
        ("supplier.s_nationkey", _t(spark, sf_dir, "supplier"),
         "s_nationkey"),
        ("orders.o_orderkey", _t(spark, sf_dir, "orders"),
         "o_orderkey"),
        ("orders.o_custkey", _t(spark, sf_dir, "orders"), "o_custkey"),
        ("lineitem.l_orderkey", _t(spark, sf_dir, "lineitem"),
         "l_orderkey"),
    ]
    # int vs bigint keys profile as distinct dtypes; align to long so
    # same-domain candidates actually pair up
    cols = [
        (lab, fr.withColumn(c, F.col(c).cast("long")), c)
        for lab, fr, c in cols
    ]
    return inclusion_dependencies(cols)


def q_metric_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson matrix of the event types' daily value series
    (operators/timeseries.py daily_metric_corr): per unordered pair,
    exact decimal sufficient statistics over the days both reported,
    one rounded expression — the metrics-that-move-together
    dashboard."""
    from etl_orders_to_bq_spark.operators.timeseries import (
        daily_metric_corr,
    )

    e = _t(spark, sf_dir, "events")
    return daily_metric_corr(e, "ts", "event_type", "value")


def q_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D earth mover's distance between click and error value
    distributions (operators/multitest.py wasserstein_1d) — the
    integral drift companion to ks_two_sample, in the metric's own
    units. FULLY exact: per-segment |CDF gap| numerators and value
    gaps are exact decimals, the sum is exact, and W1 is ONE rounded
    division by N_a*N_b; cumulative counts via the fused two-pass
    cumsum, consecutive values via global_row_number + rn+1 join (no
    single-partition lead window)."""
    from etl_orders_to_bq_spark.operators.multitest import wasserstein_1d

    e = _t(spark, sf_dir, "events")
    return wasserstein_1d(e, "event_type", "value", "click", "error")


def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta effect size between click and error value
    distributions (operators/multitest.py cliffs_delta) — the number
    to gate on once everything is "significant": exact decimal(38,0)
    greater/less pair counts from the mann_whitney cumsum machinery,
    ONE rounded division, Romano magnitude bands on the rounded
    value."""
    from etl_orders_to_bq_spark.operators.multitest import cliffs_delta

    e = _t(spark, sf_dir, "events")
    return cliffs_delta(e, "event_type", "value", "click", "error")


def q_two_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion conversion-rate z-test between the md5-parity
    experiment arms (operators/multitest.py two_proportion_test):
    converted = user made a purchase; exact integer successes/trials,
    micro-exact proportions via decimal div, pooled-variance z over
    the micro literals, p through the shared deterministic Phi — the
    RATE readout next to ab_test's Welch t on values."""
    from etl_orders_to_bq_spark.operators.multitest import (
        two_proportion_test,
    )

    e = _t(spark, sf_dir, "events")
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 2 == 0,
        "control",
    ).otherwise("treatment")
    per_user = e.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("converted")
    ).select(arm.alias("arm"), "converted", "user_id")
    return two_proportion_test(
        per_user, "arm", "converted", "control", "treatment"
    )


def q_benjamini_yekutieli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BY FDR control under arbitrary dependence
    (operators/multitest.py benjamini_yekutieli): fdr_bh's per-event-
    type z-tests with the threshold divided by the harmonic number
    c(m) — the harmonic fold runs ascending i=1..m in both engines,
    so the cut is bit-identical; p comes from the engine's
    deterministic Φ (norm_sf_sql shared-literal discipline)."""
    from etl_orders_to_bq_spark.operators.multitest import (
        benjamini_yekutieli,
    )

    e = _t(spark, sf_dir, "events")
    return benjamini_yekutieli(e, "event_type", "value", q=0.1).orderBy(
        "event_type"
    )


def q_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel heteroscedastic rank test, click vs error
    values (operators/multitest.py brunner_munzel): doubled midranks
    from the fused cumsum, variance deviations scaled to exact
    decimal(38,0) integers (A_i = 2*n_i*deviation), one fixed-order
    double for W and the engine Φ for p — the oracle replays the
    identical integer machinery with window sums."""
    from etl_orders_to_bq_spark.operators.multitest import brunner_munzel

    e = _t(spark, sf_dir, "events")
    return brunner_munzel(e, "event_type", "value", "click", "error")


def q_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered trend across the five event types
    (alphabetical order — data-derived, operators/multitest.py
    jonckheere_terpstra): doubled JT from per-distinct-value group
    counts riding ONE fused cumsum as k parallel columns; the
    tie-corrected variance is three exact integer censuses. The
    oracle replays on a dense value x group grid with window
    cumsums and dense_rank-derived group ordinals."""
    from etl_orders_to_bq_spark.operators.multitest import (
        jonckheere_terpstra,
    )

    e = _t(spark, sf_dir, "events")
    return jonckheere_terpstra(e, "event_type", "value")


def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend of a binary rate over the 1..5 priority
    tiers (operators/multitest.py cochran_armitage): integer scores
    from the priority prefix digit, outcome = order value above 200k;
    T*N and Var*N^3 exact decimal integers, one double z, engine Φ
    p."""
    from etl_orders_to_bq_spark.operators.multitest import cochran_armitage

    o = _t(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("tier"),
        (F.col("o_totalprice") > 200000).alias("big"),
    )
    return cochran_armitage(o, "tier", "big")


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over a synthesized 3-judge panel
    (operators/classifier.py fleiss_kappa): every order is an item
    with EXACTLY three integer-derived categorical votes (key mod 5,
    key//7 mod 5, cents mod 5 — deterministic, engine-free), so the
    constant-rater contract holds by construction. po/pe/kappa are
    each one rounded division of exact decimal integers."""
    from etl_orders_to_bq_spark.operators.classifier import fleiss_kappa

    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    votes = None
    for expr in (
        F.col("o_orderkey") % 5,
        (F.col("o_orderkey") / 7).cast("long") % 5,
        cents % 5,
    ):
        part = o.select(
            F.col("o_orderkey").alias("item"),
            expr.cast("string").alias("cat"),
        )
        votes = part if votes is None else votes.unionByName(part)
    return fleiss_kappa(votes, "item", "cat")


def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's nominal alpha with VARYING raters per item
    (operators/classifier.py krippendorff_alpha): vote 1 always,
    vote 2 on even keys, vote 3 on keys divisible by 3 — m_u in
    {1,2,3}, the m_u=1 units dropping as unpairable per the canonical
    rule. O_d folds the per-rater-count census sorted by m (the
    sorted-fold discipline)."""
    from etl_orders_to_bq_spark.operators.classifier import (
        krippendorff_alpha,
    )

    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v1 = o.select(
        F.col("o_orderkey").alias("item"),
        (F.col("o_orderkey") % 5).cast("string").alias("cat"),
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("item"),
        ((F.col("o_orderkey") / 7).cast("long") % 5)
        .cast("string")
        .alias("cat"),
    )
    v3 = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("item"),
        (cents % 5).cast("string").alias("cat"),
    )
    return krippendorff_alpha(
        v1.unionByName(v2).unionByName(v3), "item", "cat"
    )


def q_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between src0 and src1 unigram
    distributions (operators/lm.py jensen_shannon_divergence):
    add-one smoothing over the union vocabulary, log2 terms summed
    once, one rounded division — the symmetric bounded companion to
    source_kl_divergence on the same census plan."""
    from etl_orders_to_bq_spark.operators.lm import (
        jensen_shannon_divergence,
    )

    d = _t(spark, sf_dir, "documents")
    return jensen_shannon_divergence(d, "source", "text", "src0", "src1")


def q_rouge_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 of each document against its doc_id+1 neighbor
    (operators/lm.py rouge_n): clipped bigram counts from one
    exploded census per side joined on (id, gram) — integer clip,
    three rounded ratios. Ordered by id; the self-join fixture keeps
    the pair table data-derived at every SF."""
    from etl_orders_to_bq_spark.operators.lm import rouge_n

    # single-file local fixtures arrive as ONE split; the two exploded
    # bigram censuses would serialize on one core without the spread
    d = _spread_if_underpartitioned(
        spark, _t(spark, sf_dir, "documents")
    )
    pairs = (
        d.select(F.col("doc_id"), F.col("text").alias("cand"))
        .join(
            d.select(
                (F.col("doc_id") - 1).alias("doc_id"),
                F.col("text").alias("ref"),
            ),
            "doc_id",
        )
    )
    return rouge_n(pairs, "doc_id", "cand", "ref", n=2).orderBy("doc_id")


def q_sax_symbolize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX words per event-type series (operators/timeseries.py
    sax_symbolize): 8-segment PAA over the (ts, value)-ordered
    series, alphabet-4 letters cut at the shared 6dp Gaussian
    breakpoints; mu/sigma from exact decimal sums so both engines
    build identical doubles."""
    from etl_orders_to_bq_spark.operators.timeseries import sax_symbolize

    e = _t(spark, sf_dir, "events")
    return sax_symbolize(
        e, "event_type", "ts", "value", n_segments=8, alphabet=4
    )


def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation-aware outliers over (quantity, extendedprice)
    (operators/quality.py mahalanobis_outliers_2d): moment sums are
    exact decimals, the 2x2 inverse is the cleared adjugate form,
    d2 one fixed-order double per row; threshold 4.61 = chi2(2df)
    90% (the synthetic pair is well-conditioned — d2 tops out near
    5.9, so the 99% cut would be an empty, trivially-matching
    oracle). Row ids pack (orderkey, linenumber) uniquely."""
    from etl_orders_to_bq_spark.operators.quality import (
        mahalanobis_outliers_2d,
    )

    li = _spread_if_underpartitioned(
        spark, _t(spark, sf_dir, "lineitem")
    ).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )
    return mahalanobis_outliers_2d(
        li, "rid", "qty", "price", threshold=4.61
    )


def q_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley scale statistic, click vs error values
    (operators/multitest.py ansari_bradley): inward-counting midrank
    scores from the closed-form triangular prefix over the fused
    cumsum — every S(x) an exact long, each tied-block average ONE
    double division of identical integers, quantized to micro-longs
    before the sum. Statistic-only (bartlett convention)."""
    from etl_orders_to_bq_spark.operators.multitest import ansari_bradley

    e = _t(spark, sf_dir, "events")
    return ansari_bradley(e, "event_type", "value", "click", "error")


def q_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' worst-point outlier score over order totals
    (operators/quality.py grubbs_test): the suspect argmax decides on
    the EXACT decimal |n*x - S| with a value tie-break; one final
    double division for G. Statistic-only."""
    from etl_orders_to_bq_spark.operators.quality import grubbs_test

    o = _t(spark, sf_dir, "orders")
    return grubbs_test(o, "o_totalprice")


def q_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q gap ratios over order totals (operators/quality.py
    dixon_q): four exact decimal order-statistic picks (duplicated
    extremes give the gap-0 convention), two rounded divisions.
    Statistic-only."""
    from etl_orders_to_bq_spark.operators.quality import dixon_q

    o = _t(spark, sf_dir, "orders")
    return dixon_q(o, "o_totalprice")


def q_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way F* across event types
    (operators/multitest.py welch_anova): exact decimal group
    moments, per-group fixed-order mean/s^2 doubles, sorted folds
    for W / the weighted mean / the B sum. Statistic only — the
    anova_oneway no-portable-F-CDF convention."""
    from etl_orders_to_bq_spark.operators.multitest import welch_anova

    e = _t(spark, sf_dir, "events")
    return welch_anova(e, "event_type", "value")


def q_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade range-weighted block test on the friedman fixture
    (blocks = days, treatments = event types;
    operators/multitest.py quade_test): doubled within-block and
    block-range midranks make 4*S_ij exact integers, and F is ONE
    rounded division of exact decimal aggregates."""
    from etl_orders_to_bq_spark.operators.multitest import quade_test

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    return quade_test(daily, "day", "event_type", "v")


def q_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L ordered trend over the friedman fixture (blocks =
    days, treatments = event types alphabetically, values = exact
    daily decimal sums; operators/multitest.py page_trend): doubled
    within-block midranks from the bounded k^2 self-join, 2L exact,
    classic no-tie moments for z, engine Φ for p."""
    from etl_orders_to_bq_spark.operators.multitest import page_trend

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    return page_trend(daily, "day", "event_type", "v")


def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) spread-homogeneity W
    across event types (operators/multitest.py brown_forsythe_levene):
    exact per-group medians from integer cumulative counts (two
    order-statistic picks averaged at decimal(19,3)), exact deviation
    moments, anova's cleared identity with the sorted-fold mixing
    discipline. Statistic only — the anova_oneway no-portable-F-CDF
    convention."""
    from etl_orders_to_bq_spark.operators.multitest import (
        brown_forsythe_levene,
    )

    e = _t(spark, sf_dir, "events")
    return brown_forsythe_levene(e, "event_type", "value")


def q_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's variance-homogeneity T across event types
    (operators/multitest.py bartlett_test): exact decimal group
    moments, per-group fixed-order s^2 doubles, three sorted folds
    (pooled numerator, ln terms, reciprocals), one rounded T.
    Statistic only — the kruskal_wallis no-portable-chi2-CDF
    convention."""
    from etl_orders_to_bq_spark.operators.multitest import bartlett_test

    e = _t(spark, sf_dir, "events")
    return bartlett_test(e, "event_type", "value")


def q_sax_mindist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINDIST between every pair of event-type SAX words
    (operators/timeseries.py sax_mindist over the sax_symbolize
    fixture): per-position cell distances from the shared 6dp
    breakpoint literals, sqrt(min(n)/w) scaling, one rounded double
    per pair — the lower-bounding screen that makes the words
    useful."""
    from etl_orders_to_bq_spark.operators.timeseries import sax_mindist

    e = _t(spark, sf_dir, "events")
    return sax_mindist(
        e, "event_type", "ts", "value", n_segments=8, alphabet=4
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry of every implemented query/operator (SURVEY.md §2).

    Ordering note: the correctness driver snapshots a prefix of this
    dict, so entries are STALEST-VERIFIED-FIRST — never-verified new
    work leads, then ascending by last CORRECTNESS round, bounding
    every query's re-verification age to ~|registry|/50 rounds.
    scripts/registry_rotate.py regenerates the ordering (run it after
    adding queries or when a new CORRECTNESS_r*.json lands);
    tests/test_registry.py pins it. Names are stable across rounds so
    history accumulates.
    """
    return {
        # -- never driver-verified (new work leads the snapshot) --
        "ansari_bradley": q_ansari_bradley,
        "grubbs_test": q_grubbs_test,
        "dixon_q": q_dixon_q,
        "welch_anova": q_welch_anova,
        "quade_test": q_quade_test,
        "page_trend": q_page_trend,
        "brown_forsythe": q_brown_forsythe,
        "bartlett": q_bartlett,
        "sax_mindist": q_sax_mindist,
        "benjamini_yekutieli": q_benjamini_yekutieli,
        "brunner_munzel": q_brunner_munzel,
        "jonckheere_terpstra": q_jonckheere_terpstra,
        "cochran_armitage": q_cochran_armitage,
        "fleiss_kappa": q_fleiss_kappa,
        "krippendorff_alpha": q_krippendorff_alpha,
        "jensen_shannon": q_jensen_shannon,
        "rouge_n": q_rouge_n,
        "sax_symbolize": q_sax_symbolize,
        "mahalanobis_outliers": q_mahalanobis_outliers,
        # -- last driver-verified in round 4 --
        "variant_json": q_variant_json,
        "pii_redact": q_pii_redact,
        "boilerplate_ngrams": q_boilerplate_ngrams,
        "contamination_check": q_contamination_check,
        "funnel_paths": q_funnel_paths,
        "top_terms": q_top_terms,
        "cohort_retention": q_cohort_retention,
        "decile_report": q_decile_report,
        "activity_islands": q_activity_islands,
        "rolling_active_users": q_rolling_active_users,
        "histogram_bucket": q_histogram_bucket,
        "weighted_sample": q_weighted_sample,
        "ann_range_search": q_ann_range_search,
        "regression_agg": q_regression_agg,
        "mode_median_agg": q_mode_median_agg,
        "lateral_topn": q_lateral_topn,
        "xml_funcs": q_xml_funcs,
        "streaming_outer_join": q_streaming_outer_join,
        "text_repetition": q_text_repetition,
        "sketch_agg": q_sketch_agg,
        "ann_ivf_topk": q_ann_ivf_topk,
        "sketch_rollup_merge": q_sketch_rollup_merge,
        "kll_quantile_groups": q_kll_quantile_groups,
        "theta_set_ops": q_theta_set_ops,
        "streaming_approx_distinct": q_streaming_approx_distinct,
        "heavy_hitters": q_heavy_hitters,
        "token_budget_mix": q_token_budget_mix,
        "unigram_logprob": q_unigram_logprob,
        "bloom_filter_join": q_bloom_filter_join,
        "bm25_scores": q_bm25_scores,
        # -- last driver-verified in round 5 --
        "ab_test": q_ab_test,
        "exact_split": q_exact_split,
        "chi2_independence": q_chi2_independence,
        "ranking_metrics": q_ranking_metrics,
        "ohlc_bars": q_ohlc_bars,
        "item_similarity": q_item_similarity,
        "rule_quarantine": q_rule_quarantine,
        "source_kl": q_source_kl,
        "weighted_reservoir": q_weighted_reservoir,
        "gini_concentration": q_gini_concentration,
        "streaming_ohlc": q_streaming_ohlc,
        "survivorship": q_survivorship,
        "event_transitions": q_event_transitions,
        "source_overlap": q_source_overlap,
        "kcore": q_kcore,
        "benford_digits": q_benford_digits,
        "survival_curve": q_survival_curve,
        "readability": q_readability,
        "wilson_ci": q_wilson_ci,
        "cusum_drift": q_cusum_drift,
        "sql_udf": q_sql_udf,
        "sql_pipe": q_sql_pipe,
        "seasonality_profile": q_seasonality_profile,
        "pareto_share": q_pareto_share,
        "kmeans_lloyd": q_kmeans_lloyd,
        "source_entropy": q_source_entropy,
        "powerlaw_alpha": q_powerlaw_alpha,
        "psi_drift": q_psi_drift,
        # -- last driver-verified in round 6 --
        "k_anonymity": q_k_anonymity,
        "funnel_latency": q_funnel_latency,
        "reconciliation": q_reconciliation,
        "semdedup_kmeans": q_semdedup_kmeans,
        "quality_classifier": q_quality_classifier,
        "zorder_layout": q_zorder_layout,
        "winsorize_robust": q_winsorize_robust,
        "bigram_logprob": q_bigram_logprob,
        "label_propagation": q_label_propagation,
        "adamic_adar": q_adamic_adar,
        "ewma_level": q_ewma_level,
        "quantile_normalize": q_quantile_normalize,
        "ann_pq_topk": q_ann_pq_topk,
        "phash_neardup": q_phash_neardup,
        "l_diversity": q_l_diversity,
        "ks_drift": q_ks_drift,
        "hash_negatives": q_hash_negatives,
        "sorted_neighborhood": q_sorted_neighborhood,
        "dp_noisy_counts": q_dp_noisy_counts,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        "countmin_check": q_countmin_check,
        "dedup_eval": q_dedup_eval,
        "corpus_stats_report": q_corpus_stats_report,
        "linkage_score": q_linkage_score,
        "assoc_rules": q_assoc_rules,
        "neighbor_jaccard": q_neighbor_jaccard,
        "embedding_drift": q_embedding_drift,
        "kfold_assign": q_kfold_assign,
        "streaming_kll_median": q_streaming_kll_median,
        "equidepth_histogram": q_equidepth_histogram,
        "dedup_embedding": q_dedup_embedding,
        "semdedup": q_semdedup,
        "span_dedup": q_span_dedup,
        "rrf_fusion": q_rrf_fusion,
        "importance_weights": q_importance_weights,
        "streaming_merge_upsert": q_streaming_merge_upsert,
        "entity_resolution": q_entity_resolution,
        "triangle_count": q_triangle_count,
        "pmi_bigrams": q_pmi_bigrams,
        "simhash_hamming": q_simhash_hamming,
        "bpe_pair_counts": q_bpe_pair_counts,
        "geo_radius_join": q_geo_radius_join,
        "mad_outliers": q_mad_outliers,
        "attribution": q_attribution,
        "shortest_paths": q_shortest_paths,
        "skipgram_pairs": q_skipgram_pairs,
        "interval_merge": q_interval_merge,
        "url_funcs": q_url_funcs,
        "snapshot_diff": q_snapshot_diff,
        "rolling_active_hll": q_rolling_active_hll,
        # -- last driver-verified in round 7 --
        "rbo_overlap": q_rbo_overlap,
        "ks_two_sample": q_ks_two_sample,
        "knn_classify": q_knn_classify,
        "group_quartiles": q_group_quartiles,
        "daily_anomalies": q_daily_anomalies,
        "ip_funcs": q_ip_funcs,
        "char_entropy": q_char_entropy,
        "simpsons_check": q_simpsons_check,
        "freshness_audit": q_freshness_audit,
        "oov_rate": q_oov_rate,
        "dup_rate_by_source": q_dup_rate_by_source,
        "sql_group_by_all": q_sql_group_by_all,
        "cohort_ltv": q_cohort_ltv,
        "period_over_period": q_period_over_period,
        "crosslang_dups": q_crosslang_dups,
        "backtest_snaive": q_backtest_snaive,
        "interval_audit": q_interval_audit,
        "abc_class": q_abc_class,
        "topk_pergroup": q_topk_pergroup,
        "mix_shift": q_mix_shift,
        "median_ci": q_median_ci,
        "streaming_quota": q_streaming_quota,
        "semantic_types": q_semantic_types,
        "join_cardinality": q_join_cardinality,
        "xcorr_lags": q_xcorr_lags,
        "uplift_deciles": q_uplift_deciles,
        "naive_bayes": q_naive_bayes,
        "graph_modularity": q_graph_modularity,
        "reciprocity": q_reciprocity,
        "class_balance": q_class_balance,
        "weighted_median": q_weighted_median,
        "mann_whitney": q_mann_whitney,
        "mutual_info": q_mutual_info,
        "acf_lags": q_acf_lags,
        "fd_violations": q_fd_violations,
        "fk_coverage": q_fk_coverage,
        "code_detect": q_code_detect,
        "fdr_bh": q_fdr_bh,
        "rake_weights": q_rake_weights,
        "column_profile": q_column_profile,
        "snips_ope": q_snips_ope,
        "local_clustering": q_local_clustering,
        "langid_confusion": q_langid_confusion,
        "perplexity_buckets": q_perplexity_buckets,
        "token_fertility": q_token_fertility,
        "seq_patterns": q_seq_patterns,
        "did_estimator": q_did_estimator,
        "inverted_index": q_inverted_index,
        "target_encoding": q_target_encoding,
        "feature_hash": q_feature_hash,
        # -- last driver-verified in round 8 --
        "semdedup_auto": q_semdedup_auto,
        "set_similarity_join": q_set_similarity_join,
        "ann_matryoshka": q_ann_matryoshka,
        "theilsen_trend": q_theilsen_trend,
        "holt_linear": q_holt_linear,
        "mmr_rerank": q_mmr_rerank,
        "msprt": q_msprt,
        "twap": q_twap,
        "dispersion_index": q_dispersion_index,
        "rarity_weighted_jaccard": q_rarity_weighted_jaccard,
        "bpe_merges": q_bpe_merges,
        "window_funnel": q_window_funnel,
        "holt_winters": q_holt_winters,
        "changepoint": q_changepoint,
        "gini_stump": q_gini_stump,
        "rfm_segments": q_rfm_segments,
        "skyline_parts": q_skyline_parts,
        "cuped": q_cuped,
        "degree_assortativity": q_degree_assortativity,
        "t_closeness": q_t_closeness,
        "bootstrap_ci": q_bootstrap_ci,
        "resample_ffill": q_resample_ffill,
        "tfidf_topterms": q_tfidf_topterms,
        "vocab_growth": q_vocab_growth,
        "time_split_embargo": q_time_split_embargo,
        "repeated_ngram_spans": q_repeated_ngram_spans,
        "script_profile": q_script_profile,
        "url_canonical_dedup": q_url_canonical_dedup,
        "group_split": q_group_split,
        "hits_scores": q_hits_scores,
        "diverse_sample": q_diverse_sample,
        "ngram_containment": q_ngram_containment,
        "shard_plan": q_shard_plan,
        "text_fingerprint": q_text_fingerprint,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_bucket": q_ann_lsh_bucket,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "sql_interface": q_sql_interface,
        "window_frames": q_window_frames,
        "q6_forecast_revenue": q_q6_forecast_revenue,
        "q4_order_priority": q_q4_order_priority,
        "q10_returned_topk": q_q10_returned_topk,
        "stats_agg": q_stats_agg,
        "fuzzy_funcs": q_fuzzy_funcs,
        "scd2_history": q_scd2_history,
        "date_funcs": q_date_funcs,
        "o2_cast_repair": q_o2_cast_repair,
        "o4_dedup_first": q_o4_dedup_first,
        "dedup_first_minby": q_dedup_first_minby,
        # -- last driver-verified in round 9 --
        "stupid_backoff": q_stupid_backoff,
        "bpe_encode": q_bpe_encode,
        "corpus_manifest": q_corpus_manifest,
        "dedup_keep_best": q_dedup_keep_best,
        "hard_negatives": q_hard_negatives,
        "corpus_diff": q_corpus_diff,
        "zipf_slope": q_zipf_slope,
        "curriculum_order": q_curriculum_order,
        "pca_pc1": q_pca_pc1,
        "benchmark_decontaminate": q_benchmark_decontaminate,
        "exact_substring_spans": q_exact_substring_spans,
        "exact_substring_dedup": q_exact_substring_dedup,
        "paragraph_quality_filter": q_paragraph_quality_filter,
        "salted_agg": q_salted_agg,
        "salted_join": q_salted_join,
        "merge_upsert": q_merge_upsert,
        "frame_sample": q_frame_sample,
        "ann_quantized_topk": q_ann_quantized_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ivf_assign": q_ivf_assign,
        "o6_clean_name": q_o6_clean_name,
        "o6_clean_name_unescape": q_o6_clean_name_unescape,
        "o7_left_join": q_o7_left_join,
        "o11_similarity": q_o11_similarity,
        "q1_pricing_summary": q_q1_pricing_summary,
        "q3_top_revenue": q_q3_top_revenue,
        "window_rank": q_window_rank,
        "rollup_agg": q_rollup_agg,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "set_ops": q_set_ops,
        "topk_orders": q_topk_orders,
        "date_trunc_agg": q_date_trunc_agg,
        "json_extract": q_json_extract,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_sig": q_dedup_minhash_sig,
        "dedup_minhash_pairs": q_dedup_minhash_pairs,
        "dedup_simhash": q_dedup_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_neighbors": q_embedding_neighbors,
        "sessionize": q_sessionize,
        "streaming_dedup": q_streaming_dedup,
        "stream_stream_join": q_stream_stream_join,
        "streaming_window_watermark": q_streaming_window_watermark,
        "streaming_running_totals": q_streaming_running_totals,
        "streaming_sessionize": q_streaming_sessionize,
        "streaming_file_sink": q_streaming_file_sink,
        "stream_static_join": q_stream_static_join,
        "cube_agg": q_cube_agg,
        "intersect_ops": q_intersect_ops,
        # -- last driver-verified in round 10 --
        "kneser_ney": q_kneser_ney,
        "domain_census": q_domain_census,
        "mojibake_repair": q_mojibake_repair,
        "gopher_quality": q_gopher_quality,
        "c4_line_filter": q_c4_line_filter,
        "mlm_mask": q_mlm_mask,
        "jl_project": q_jl_project,
        "vocab_coverage": q_vocab_coverage,
        "boilerplate_lines": q_boilerplate_lines,
        "span_corrupt": q_span_corrupt,
        "temperature_mix": q_temperature_mix,
        "union_distinct": q_union_distinct,
        "string_funcs": q_string_funcs,
        "math_funcs": q_math_funcs,
        "array_funcs": q_array_funcs,
        "percentile_agg": q_percentile_agg,
        "case_bucket": q_case_bucket,
        "coalesce_funcs": q_coalesce_funcs,
        "text_stats": q_text_stats,
        "text_language_id": q_text_language_id,
        "text_quality": q_text_quality,
        "corpus_pipeline": q_corpus_pipeline,
        "pagerank": q_pagerank,
        "dedup_clusters": q_dedup_clusters,
        "recursive_cte": q_recursive_cte,
        "python_datasource": q_python_datasource,
        "pit_join": q_pit_join,
        "cdc_apply": q_cdc_apply,
        "dedup_clusters_durable": q_dedup_clusters_durable,
        "python_datasource_stream": q_python_datasource_stream,
        "incremental_dedup": q_incremental_dedup,
        "incremental_lsh": q_incremental_lsh,
        "ivf_search_fixed": q_ivf_search_fixed,
        "streaming_full_outer_join": q_streaming_full_outer_join,
        "incremental_refresh": q_incremental_refresh,
        "q21_suppliers_waiting": q_q21_suppliers_waiting,
        "q20_potential_promotion": q_q20_potential_promotion,
        "q12_late_shipments": q_q12_late_shipments,
        "q9_product_type_profit": q_q9_product_type_profit,
        "q11_important_parts": q_q11_important_parts,
        "q2_min_cost_supplier": q_q2_min_cost_supplier,
        "q16_parts_supplier_relationship": q_q16_parts_supplier_relationship,
        "q5_region_revenue": q_q5_region_revenue,
        "q7_nation_volume": q_q7_nation_volume,
        "q8_market_share": q_q8_market_share,
        "q13_custdist": q_q13_custdist,
        "q14_promo_revenue": q_q14_promo_revenue,
        "q15_top_supplier": q_q15_top_supplier,
        "q17_small_quantity": q_q17_small_quantity,
        "q18_large_orders": q_q18_large_orders,
        # -- last driver-verified in round 11 --
        "two_proportion": q_two_proportion,
        "cliffs_delta": q_cliffs_delta,
        "wasserstein": q_wasserstein,
        "metric_corr": q_metric_corr,
        "inclusion_deps": q_inclusion_deps,
        "log_rank": q_log_rank,
        "mann_kendall": q_mann_kendall,
        "theil_index": q_theil_index,
        "dunning_llr": q_dunning_llr,
        "hill_diversity": q_hill_diversity,
        "capture_recapture": q_capture_recapture,
        "jackknife_ratio": q_jackknife_ratio,
        "james_stein": q_james_stein,
        "streaming_funnel": q_streaming_funnel,
        "cochran_q": q_cochran_q,
        "dunn_posthoc": q_dunn_posthoc,
        "silhouette": q_silhouette,
        "friedman_test": q_friedman_test,
        "ransac_line": q_ransac_line,
        "burrows_delta": q_burrows_delta,
        "pacf_durbin": q_pacf_durbin,
        "markov_attribution": q_markov_attribution,
        "cohens_kappa": q_cohens_kappa,
        "mcnemar": q_mcnemar,
        "wordpiece_encode": q_wordpiece_encode,
        "k_truss": q_k_truss,
        "ipw_ate": q_ipw_ate,
        "good_turing": q_good_turing,
        "chao1_richness": q_chao1_richness,
        "spearman_corr": q_spearman_corr,
        "kendall_tau": q_kendall_tau,
        "kruskal_wallis": q_kruskal_wallis,
        "anova_oneway": q_anova_oneway,
        "hodges_lehmann": q_hodges_lehmann,
        "hilbert_layout": q_hilbert_layout,
        "ridge_normal": q_ridge_normal,
        "stl_decompose": q_stl_decompose,
        "neyman_sample": q_neyman_sample,
        "cdc_chunks": q_cdc_chunks,
        "permutation_test": q_permutation_test,
        "conformal_interval": q_conformal_interval,
        "calibration_bins": q_calibration_bins,
        "roc_curve": q_roc_curve,
        "doremi_mix": q_doremi_mix,
        "adaboost_stumps": q_adaboost_stumps,
        "isotonic_calibration": q_isotonic_calibration,
        "bradley_terry": q_bradley_terry,
        "q19_disjunctive_join": q_q19_disjunctive_join,
        "q22_sales_opportunity": q_q22_sales_opportunity,
        "text_winnow": q_text_winnow,
        # -- last driver-verified in round 12 --
        "ransac_subsampled": q_ransac_subsampled,
        "unigram_lm": q_unigram_lm,
        "unigram_encode": q_unigram_encode,
        "cramers_v": q_cramers_v,
        "mood_median": q_mood_median,
        "benford_mad": q_benford_mad,
        "holm_bonferroni": q_holm_bonferroni,
        "pps_systematic": q_pps_systematic,
        "shapley_attribution": q_shapley_attribution,
        "jaro_winkler_pairs": q_jaro_winkler_pairs,
        "dbscan": q_dbscan,
        "lof_outliers": q_lof_outliers,
        "fd_discovery": q_fd_discovery,
        "fuzzy_join": q_fuzzy_join,
        "udtf_sentences": q_udtf_sentences,
        "incremental_agg": q_incremental_agg,
        "embedding_centroids": q_embedding_centroids,
        "basket_pairs": q_basket_pairs,
        "events_hopping": q_events_hopping,
        "try_cast": q_try_cast,
        "collect_agg": q_collect_agg,
        "window_range_frame": q_window_range_frame,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_features": q_multimodal_features,
        "data_quality": q_data_quality,
        "correlated_subquery": q_correlated_subquery,
        "hash_sample": q_hash_sample,
        "chunk_documents": q_chunk_documents,
        "pack_sequences": q_pack_sequences,
        "source_quota": q_source_quota,
        "grouping_sets": q_grouping_sets,
        "unpivot": q_unpivot,
        "regex_extract": q_regex_extract,
        "map_funcs": q_map_funcs,
        "nullsafe_join": q_nullsafe_join,
        "filtered_agg": q_filtered_agg,
        "explode_tokens": q_explode_tokens,
        "pivot_agg": q_pivot_agg,
        "grouped_zscore": q_grouped_zscore,
        "events_window": q_events_window,
        "analytic_funcs": q_analytic_funcs,
        "cross_join": q_cross_join,
        "bitwise_funcs": q_bitwise_funcs,
        "interval_arith": q_interval_arith,
        "posexplode_tokens": q_posexplode_tokens,
        "struct_funcs": q_struct_funcs,
        "stratified_sample": q_stratified_sample,
        "cogroup_reconcile": q_cogroup_reconcile,
        "gap_fill": q_gap_fill,
        "date_spine": q_date_spine,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_CLEAN_PATTERN = (
    r"\d|\s|^(-)$|(^\w{1}$)|(^[aoueiyаяєоуиіїе]{0,}$)|(^[^aoueiyаяєоуиіїе]{0,}$)"
)

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKENS = "regexp_extract_all(text, '\\S+')"


def _mh_sql(i: int) -> str:
    """MinHash i: min over word-3-gram shingles of the (i%4)-th 8-hex
    chunk of md5(shingle || '|' || i//4) — mirrors operators/dedup.py's
    multi-hash-from-one-digest scheme exactly."""
    toks = f"regexp_extract_all({_NORM}, '\\S+')"
    shingles = (
        f"[t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]"
    )
    group, chunk = i // 4, i % 4
    return (
        f"(select list_min(list_transform({shingles},"
        f" s -> substr(md5(s || '|{group}'), {1 + 8 * chunk}, 8)))"
        f" from (select {toks} as t) _)"
    )


def _lsh_bucket_sql(
    dim: int = 64,
    bits: int = 8,
    seed: int = 42,
    vec_expr: str = "cast(embedding as double[])",
) -> str:
    """Bucket expression with the hyperplanes inlined as literals —
    byte-identical doubles to the Spark side (same LCG)."""
    from etl_orders_to_bq_spark.operators.ann import _hyperplanes

    planes = _hyperplanes(dim, bits, seed)
    terms = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
        terms.append(
            f"case when list_dot_product({vec_expr}, {lit}) > 0 "
            f"then {2**i} else 0 end"
        )
    return "(" + " + ".join(terms) + ")"


def _ivf_assign_sql(
    dim: int = 64,
    n: int = 8,
    seed: int = 7,
    vec_expr: str = "cast(embedding as double[])",
) -> str:
    """argmax(2*x.c_i - |c_i|^2) with the fixed centroids inlined —
    byte-identical doubles to assign_ivf_clusters' Column projection."""
    from etl_orders_to_bq_spark.operators.ann import _hyperplanes

    cents = _hyperplanes(dim, n, seed)
    scores = []
    for c in cents:
        lit = "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]"
        c2 = sum(float(x) * float(x) for x in c)
        scores.append(
            f"list_dot_product({vec_expr}, {lit}) * 2.0"
            f" - {repr(c2)}"
        )
    arr = "list_value(" + ", ".join(scores) + ")"
    return f"(list_position({arr}, list_max({arr})) - 1)"


def _ivf_assign_autok_sql(
    dim: int = 64,
    max_k: int = 32,
    seed: int = 42,
    vec_expr: str = "cast(embedding as double[])",
    count_sql: str = "(select count(*) from embeddings)",
    target: int = 128,
) -> str:
    """Count-driven auto-k argmax assignment, k = max(8,
    ceil(n/target)), exact for EVERY realizable k <= max_k in one
    expression: the LCG hyperplane stream is prefix-stable
    (_hyperplanes(d, k) == _hyperplanes(d, max_k)[:k]), so slicing the
    max_k score array to the count-driven k is bit-identical to
    generating k centroids. Replaces the two-arm CASE (k=8 / k=16)
    that was wrong for fixtures with 1024 < n <= 1920 (engine k =
    9..15 there — r10 advisor finding). Past n > target*max_k the
    expression yields NULL so the sweep fails LOUDLY instead of
    silently truncating the centroid set."""
    from etl_orders_to_bq_spark.operators.ann import _hyperplanes

    cents = _hyperplanes(dim, max_k, seed)
    scores = []
    for c in cents:
        lit = "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]"
        c2 = sum(float(x) * float(x) for x in c)
        scores.append(
            f"list_dot_product({vec_expr}, {lit}) * 2.0"
            f" - {repr(c2)}"
        )
    arr = "list_value(" + ", ".join(scores) + ")"
    # guard the K EXPRESSION, not just n: greatest(8, ...) can exceed
    # max_k even when n <= target*max_k (r10 review — list_slice would
    # then silently truncate the centroid set, the exact failure this
    # NULL exists to surface)
    k_raw = f"greatest(8, cast(ceil({count_sql} / {target}.0) as int))"
    k = f"case when {k_raw} <= {max_k} then {k_raw} else null end"
    sliced = f"list_slice({arr}, 1, {k})"
    return f"(list_position({sliced}, list_max({sliced})) - 1)"


def _pca_pc1_sql(dim: int = 64, rounds: int = 8) -> str:
    """Oracle for q_pca_pc1: the ENTIRE eigensolve replayed in SQL on
    hugeint arithmetic — exact integer scatter matrix (n*P - S*S'),
    per-round matvec / trunc-rescale (`//` truncates toward zero,
    mirrored by the engine's sign-aware floor) / exact norm² / 6dp
    re-quantization (round() is half-away on both engines), and the
    pure-integer final projection. The only floats are sqrt and a
    division on bit-identical integers."""
    import math

    v0 = int(round(1e6 / math.sqrt(dim)))
    parts = [
        f"""
        with m as materialized (
          select vec_id,
                 list_transform(cast(embedding as double[]),
                                x -> cast(round(x * 1000000, 0)
                                          as hugeint)) as xm
          from embeddings
          where embedding is not null
            and len(cast(embedding as double[])) = {dim}
        ),
        nn as materialized (select cast(count(*) as hugeint) as n from m),
        su as materialized (
          select u.i as i, sum(xm[u.i + 1])::hugeint as s
          from m, lateral (select unnest(range(0, {dim})) as i) u
          group by 1
        ),
        pu as materialized (
          select i, j, sum(p)::hugeint as p
          from (
            select u1.i as i, u2.j as j,
                   xm[u1.i + 1] * xm[u2.j + 1] as p
            from m,
                 lateral (select unnest(range(0, {dim})) as i) u1,
                 lateral (select unnest(range(0, {dim})) as j) u2
            where u2.j >= u1.i
          ) group by i, j
        ),
        ct as materialized (
          select pu.i, pu.j, (select n from nn) * p - si.s * sj.s as c
          from pu
          join su si on si.i = pu.i
          join su sj on sj.i = pu.j
        ),
        cm as materialized (
          select i, j, c from ct
          union all
          select j as i, i as j, c from ct where i <> j
        ),
        v0 as materialized (select unnest(range(0, {dim})) as i,
                      cast({v0} as hugeint) as v)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
        w{r} as materialized (
          select cm.i, sum(cm.c * vp.v)::hugeint as w
          from cm join v{r - 1} vp on vp.i = cm.j
          group by 1
        ),
        p{r} as materialized (
          select max(abs(w)) as m,
                 greatest(len(cast(max(abs(w)) as varchar)) - 7, 0) as k
          from w{r}
        ),
        s{r} as materialized (
          -- exact 10^k: power() is a double (inexact at k >= 23,
          -- i.e. ~30-digit matvec magnitudes); build the literal
          select i, w // cast('1' || repeat('0', (select k from p{r}))
                              as hugeint) as w2
          from w{r}
        ),
        q{r} as materialized (select sum(w2 * w2)::hugeint as norm2 from s{r}),
        v{r} as materialized (
          select s{r}.i,
                 case when (select m from p{r}) = 0
                      then (select v from v{r - 1} vv
                            where vv.i = s{r}.i)
                      else cast(round((cast(w2 as double)
                                       / sqrt(cast((select norm2
                                                    from q{r})
                                                   as double)))
                                      * 1000000, 0) as hugeint)
                 end as v
          from s{r}
        )"""
        )
    parts.append(
        f""",
        vl as materialized (select list(v order by i) as vl from v{rounds})
        select m.vec_id,
               round(cast(list_reduce(
                       list_prepend(cast(0 as hugeint),
                         list_transform(range(0, {dim}),
                                        i -> xm[i + 1] * vl[i + 1])),
                       (a, b) -> a + b) as double)
                     / 1000000000000.0, 6) as pc1_score
        from m, vl
        order by m.vec_id"""
    )
    return "".join(parts)


def _pq_topk_sql() -> str:
    """Oracle for q_ann_pq_topk: codebooks re-derived from the same
    seeded LCG literals; encode distances accumulate per-dim in the
    SAME left-associative order as the numpy kernel; the per-vector
    ADC distance folds LUT entries in subspace order from a prepended
    0.0 — exactly the Spark expression ``lit(0.0) + l1 + ... + l8``."""
    from etl_orders_to_bq_spark.operators.ann import pq_codebooks

    books = pq_codebooks(dim=64, subspaces=8, codewords=16, seed=23)
    sub = len(books[0][0])
    rows = []
    for s, book in enumerate(books):
        for c, w in enumerate(book):
            vals = ", ".join(repr(float(x)) for x in w)
            rows.append(f"({s}, {c}, [{vals}]::double[])")
    cw_values = ",\n          ".join(rows)

    def dist(vec: str) -> str:
        terms = []
        for j in range(sub):
            e = f"{vec}[cw.s * {sub} + {j + 1}]::double"
            terms.append(f"(({e} - cw.v[{j + 1}]) * ({e} - cw.v[{j + 1}]))")
        return "\n                 + ".join(terms)

    return f"""
        with cw(s, c, v) as (values
          {cw_values}
        ),
        e as (
          select vec_id, embedding from embeddings
          where embedding is not null
        ),
        q as (select embedding as qv from embeddings where vec_id = 0),
        lut as (
          select cw.s, cw.c,
                 {dist('q.qv')} as ld
          from cw, q
        ),
        encd as (
          select vec_id, s, c from (
            select e.vec_id, cw.s, cw.c,
                   {dist('e.embedding')} as d
            from e, cw
          ) t
          qualify row_number() over (partition by vec_id, s
                                     order by d, c) = 1
        ),
        dist as (
          select vec_id,
                 round(list_reduce(
                   list_prepend(0.0::double, list(ld order by s)),
                   (acc, x) -> acc + x), 6) as pq_dist
          from encd join lut using (s, c)
          group by vec_id
        )
        select vec_id, pq_dist from dist
        order by pq_dist, vec_id
        limit 25
    """


def _ivfpq_topk_sql() -> str:
    """Oracle for q_ann_ivfpq_topk: probe buckets and the ADC LUT are
    the SAME Python constants the operator derives (query bucket sign
    tests and the left-assoc squared-distance loop), inlined as
    literals; the SQL replays corpus bucketing, probe pruning, PQ
    argmin encode, and the prepend-0 subspace fold."""
    from etl_orders_to_bq_spark.operators.ann import (
        _hyperplanes,
        pq_codebooks,
    )

    dim, bits, seed, k = 64, 4, 42, 15
    books = pq_codebooks(dim=dim, subspaces=8, codewords=16, seed=23)
    sub = len(books[0][0])
    qv = _hyperplanes(dim, 1, seed=99)[0]
    planes = _hyperplanes(dim, bits, seed)
    qb = 0
    for i, plane in enumerate(planes):
        acc = 0.0
        for a, b in zip(qv, plane):
            acc += float(a) * float(b)
        if acc > 0:
            qb |= 1 << i
    probes = sorted({qb} | {qb ^ (1 << i) for i in range(bits)})
    probe_list = ", ".join(str(p) for p in probes)

    def _sq_l2(c, s):
        acc = 0.0
        for j in range(sub):
            d = float(qv[s * sub + j]) - c[j]
            acc = acc + d * d
        return acc

    lut_rows = ",\n          ".join(
        f"({s}, {c}, {_sq_l2(w, s)!r})"
        for s, book in enumerate(books)
        for c, w in enumerate(book)
    )
    cw_rows = ",\n          ".join(
        f"({s}, {c}, [{', '.join(repr(float(x)) for x in w)}]::double[])"
        for s, book in enumerate(books)
        for c, w in enumerate(book)
    )

    def dist(vec: str) -> str:
        terms = []
        for j in range(sub):
            e = f"{vec}[cw.s * {sub} + {j + 1}]::double"
            terms.append(f"(({e} - cw.v[{j + 1}]) * ({e} - cw.v[{j + 1}]))")
        return "\n                 + ".join(terms)

    return f"""
        with cw(s, c, v) as (values
          {cw_rows}
        ),
        lut(s, c, ld) as (values
          {lut_rows}
        ),
        cand as (
          select vec_id, embedding from embeddings
          where embedding is not null
            and cast({_lsh_bucket_sql(dim, bits, seed)} as int)
                in ({probe_list})
        ),
        encd as (
          select vec_id, s, c from (
            select cand.vec_id, cw.s, cw.c,
                   {dist('cand.embedding')} as d
            from cand, cw
          ) t
          qualify row_number() over (partition by vec_id, s
                                     order by d, c) = 1
        ),
        dist as (
          select vec_id,
                 round(list_reduce(
                   list_prepend(0.0::double, list(ld order by s)),
                   (acc, x) -> acc + x), 6) as pq_dist
          from encd join lut using (s, c)
          group by vec_id
        )
        select vec_id, pq_dist from dist
        order by pq_dist, vec_id
        limit {k}
    """


def _ivf_search_fixed_sql() -> str:
    """Oracle for q_ivf_search_fixed: probe ids and the query vector
    are deterministic Python constants, inlined as literals; the row
    norm divides by the SAME driver-side sequential q_norm float the
    Spark operator uses, so the doubles agree bitwise."""
    import math

    _, query, probe = _ivf_fixed_setup()
    qlit = "[" + ", ".join(repr(float(x)) for x in query) + "]::DOUBLE[]"
    q_norm = 0.0
    for x in query:
        q_norm += float(x) * float(x)
    q_norm = math.sqrt(q_norm)
    probe_list = ", ".join(str(p) for p in probe)
    return f"""
        select vec_id,
               round(list_dot_product(cast(embedding as double[]), {qlit})
                     / (sqrt(list_dot_product(cast(embedding as double[]),
                                              cast(embedding as double[])))
                        * {q_norm!r}), 6) as cos_sim
        from embeddings
        where {_ivf_assign_sql(dim=64, n=8, seed=7)} in ({probe_list})
        order by cos_sim desc, vec_id asc
        limit 10
    """


def _simhash_sql(bits: int) -> str:
    """Sum of per-bit sign votes over token hashes (column ``th``)."""
    terms = []
    for i in range(bits):
        vote = (
            f"list_sum(list_transform(th, h -> "
            f"case when (h >> {i}) & 1 = 1 then 1 else -1 end))"
        )
        terms.append(f"case when coalesce({vote}, 0) > 0 then {2**i} else 0 end")
    return "(" + " + ".join(terms) + ")"


_STOPWORD_SQL = {
    "en": r"\b(the|and|of|to|is|in|that|it)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|zu)\b",
    "fr": r"\b(le|la|les|et|est|pas|une|que)\b",
    "es": r"\b(el|los|las|es|una|que|por|con)\b",
}


def _lang_hits(lang: str) -> str:
    return f"len(regexp_extract_all(lower(text), '{_STOPWORD_SQL[lang]}'))"


def _lloyd_oracle_sql(dim: int = 64, k: int = 8, seed: int = 7,
                      rounds: int = 3,
                      final_select: str | None = None) -> str:
    """Unrolled Lloyd k-means oracle: per round, assignment replays the
    engine's argmax exactly (scores LISTED in cluster order, first-max
    index — the same tie-break as Spark's array_position) and new
    centroids are per-dim averages; empty clusters coalesce to the
    previous centroid. Init centroids are inlined as byte-identical
    double literals from the shared seeded generator."""
    from etl_orders_to_bq_spark.operators.ann import _hyperplanes

    cents = _hyperplanes(dim, k, seed)
    c0_rows = ", ".join(
        f"({j}, [" + ", ".join(repr(x) for x in c) + "]::DOUBLE[])"
        for j, c in enumerate(cents)
    )
    avg_list = (
        "[" + ", ".join(f"round(avg(v[{i + 1}]), 6)" for i in range(dim)) + "]"
    )
    sql = [f"""
        with e as materialized (
          select vec_id, cast(embedding as double[]) as v from embeddings
        ),
        c0 as materialized (
          select * from (values {c0_rows}) t(cluster, vec)
        )"""]
    for r in range(rounds):
        sql.append(f""",
        a{r} as materialized (
          select vec_id, v,
                 list_position(s, list_aggregate(s, 'max')) - 1 as cluster
          from (
            select vec_id, v,
                   (select list(2.0 * list_dot_product(e2.v, c.vec)
                                - list_dot_product(c.vec, c.vec)
                          order by c.cluster)
                    from c{r} c) as s
            from e e2
          )
        ),
        m{r} as materialized (
          select cluster, {avg_list} as vec from a{r} group by cluster
        ),
        c{r + 1} as materialized (
          select c.cluster, coalesce(m.vec, c.vec) as vec
          from c{r} c left join m{r} m using (cluster)
        )""")
    sql.append(f""",
        afinal as materialized (
          select vec_id, v,
                 list_position(s, list_aggregate(s, 'max')) - 1 as cluster
          from (
            select vec_id, v,
                   (select list(2.0 * list_dot_product(e2.v, c.vec)
                                - list_dot_product(c.vec, c.vec)
                          order by c.cluster)
                    from c{rounds} c) as s
            from e e2
          )
        )""")
    if final_select is None:
        final_select = f"""
        select a.cluster as ivf_cluster, count(*) as n,
               round(sqrt(list_dot_product(c.vec, c.vec)), 6)
                 as centroid_norm
        from afinal a join c{rounds} c on c.cluster = a.cluster
        group by a.cluster, c.vec
        order by ivf_cluster"""
    sql.append(final_select)
    return "".join(sql)


def _kcore_oracle_sql(k: int = 93, rounds: int = 10) -> str:
    """Unrolled-CTE k-core peeling oracle (DuckDB disallows aggregates
    in recursive terms, same constraint as the PageRank oracle): each
    unrolled round keeps nodes with degree >= k and restricts the edge
    set to them. ``rounds`` exceeds the fixpoint depth on the fixture
    (measured 5 peels), and a converged core is stable under extra
    rounds, so the unroll equals the engine's run-to-fixpoint. The
    final select CROSS-JOINS a 1-row stability probe that calls
    duckdb's ``error()`` unless the last two unrolled edge sets are
    identical — so running the gate on a denser fixture where the
    fixed depth is insufficient fails LOUDLY instead of hash-
    mismatching for an unrelated-looking reason."""
    sql = [
        """
        with base as materialized (
          select distinct l_orderkey % 1000 as a, l_partkey % 1000 as b
          from lineitem
          where l_orderkey % 1000 <> l_partkey % 1000
        ),
        u0 as materialized (
          select a, b from base union select b, a from base
        )"""
    ]
    for i in range(rounds):
        # `materialized` keeps DuckDB from inlining each CTE into its
        # consumers — the inlined unroll re-opened the parquet once per
        # reference and blew the fd limit
        sql.append(
            f""",
        n{i} as materialized (
          select a from u{i} group by a having count(*) >= {k}
        ),
        u{i + 1} as materialized (
          select a, b from u{i}
          where a in (select a from n{i}) and b in (select a from n{i})
        )"""
        )
    sql.append(
        f""",
        stable as (
          select case when (select count(*) from u{rounds}) =
                      (select count(*) from u{rounds - 1})
                 then 1
                 else error('kcore oracle: unroll depth {rounds} not at '
                            'fixpoint on this fixture - raise rounds')
            end as ok
        )
        select a as node, cast(count(*) as bigint) as degree
        from u{rounds}, stable group by a, stable.ok order by node"""
    )
    return "".join(sql)


def _pagerank_oracle_sql(iterations: int = 10) -> str:
    """Unrolled-CTE PageRank oracle. DuckDB 1.0 disallows aggregates in
    the recursive term of a recursive CTE, so the fixed iteration count
    is unrolled into a chain of CTEs r0..rN — arithmetic is forced to
    double (``::double`` on every literal) so each step performs the
    same IEEE ops as the Spark operator and the 6dp rounding agrees."""
    head = """
        with edges as materialized (
          select distinct c.c_nationkey as src, s.s_nationkey as dst
          from lineitem l
          join orders o on l.l_orderkey = o.o_orderkey
          join customer c on o.o_custkey = c.c_custkey
          join supplier s on l.l_suppkey = s.s_suppkey
          where c.c_nationkey <> s.s_nationkey
        ),
        nodes as materialized (select src as id from edges
                               union select dst from edges),
        p as (select count(*)::double as n from nodes),
        outdeg as materialized (select src, count(*) as od
                                from edges group by src),
        r0 as (select id, 1.0::double / p.n as pr from nodes, p)
    """
    steps = []
    for k in range(1, iterations + 1):
        steps.append(
            f""",
        r{k} as (
          select n.id,
                 (1.0::double - 0.85::double) / p.n
                 + 0.85::double * coalesce(c.s, 0.0::double) as pr
          from nodes n
          cross join p
          left join (
            select e.dst, sum(r.pr / o.od) as s
            from edges e
            join r{k - 1} r on r.id = e.src
            join outdeg o on o.src = e.src
            group by e.dst
          ) c on c.dst = n.id
        )"""
        )
    tail = f"""
        select id as nationkey, round(pr, 6) as pagerank
        from r{iterations}
        order by nationkey
    """
    return head + "".join(steps) + tail


def oracle_sql() -> dict[str, str]:
    langs = list(_STOPWORD_SQL)
    hits = {l: _lang_hits(l) for l in langs}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    lang_case = (
        "case "
        + " ".join(
            f"when {hits[l]} > 0 and {hits[l]} = {best} then '{l}'" for l in langs
        )
        + " else 'und' end"
    )
    from etl_orders_to_bq_spark.functions.text import LANG_STOPWORDS

    all_stop = (
        r"\b(" + "|".join(w for ws in LANG_STOPWORDS.values() for w in ws) + r")\b"
    )
    quality_expr = f"""round(0.4::double * least(1.0::double,
                             len(regexp_extract_all(lower(text), '{all_stop}'))
                             / cast(greatest(len({_TOKENS}), 1) as double))
                         + 0.3::double * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                             / cast(greatest(length(text), 1) as double))
                         + 0.3::double * least(1.0::double, len({_TOKENS}) / 50.0::double),
                         6)"""
    out = {
        "o2_cast_repair": """
            select o_orderkey,
                   cast(replace(regexp_replace(cast(o_totalprice as varchar), '\\.', ','), ',', '.') as double) as sum_repaired,
                   cast(regexp_replace(cast(o_orderkey as varchar) || 'x7', '\\D', '', 'g') as bigint) as id_repaired
            from orders
        """,
        "o4_dedup_first": """
            select l_orderkey, l_partkey, l_linenumber, l_quantity
            from (select l_orderkey, l_partkey, l_linenumber, l_quantity,
                         row_number() over (partition by l_orderkey, l_partkey
                                            order by l_linenumber, l_quantity,
                                                     l_extendedprice, l_suppkey) as rn
                  from lineitem)
            where rn = 1
        """,
        "o6_clean_name": f"""
            select c_custkey,
                   regexp_replace(regexp_replace(lower(c_name), '\\d', '', 'g'),
                                  '{_CLEAN_PATTERN}', '', 'g') as cleaned_name
            from customer
        """,
        "dedup_first_minby": """
            select l_orderkey, l_partkey, l_linenumber, l_quantity
            from (select l_orderkey, l_partkey, l_linenumber, l_quantity,
                         row_number() over (partition by l_orderkey, l_partkey
                                            order by l_linenumber, l_quantity,
                                                     l_extendedprice, l_suppkey) as rn
                  from lineitem)
            where rn = 1
        """,
        "salted_agg": """
            select l_returnflag,
                   round(sum(l_quantity), 2) as sum_l_quantity,
                   count(l_orderkey) as count_l_orderkey,
                   round(max(l_extendedprice), 2) as max_l_extendedprice
            from lineitem group by l_returnflag
        """,
        "salted_join": """
            select o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
            from (select o_orderkey, o_custkey, o_totalprice from orders) o
            left join (select c_custkey, c_name, c_mktsegment from customer) c
              on o.o_custkey = c.c_custkey
        """,
        "merge_upsert": """
            with t as (select c_custkey, c_name, c_acctbal from customer),
            src as (
                select c_custkey, c_name,
                       round(c_acctbal + 50, 2) as c_acctbal
                from customer where c_custkey % 7 = 0
                union all
                select c_custkey + 1000000, 'NEW_' || c_name, 0.0
                from customer where c_custkey % 11 = 0
            )
            select coalesce(s.c_custkey, t.c_custkey) as c_custkey,
                   case when s.c_custkey is not null then s.c_name
                        else t.c_name end as c_name,
                   round(case when s.c_custkey is not null then s.c_acctbal
                              else t.c_acctbal end, 2) as c_acctbal
            from t full outer join src s on t.c_custkey = s.c_custkey
        """,
        "frame_sample": """
            select doc_id as id,
                   10 * (i - 1) as frame_idx,
                   md5(text || cast(10 * (i - 1) as varchar)) as frame_hash
            from documents,
                 lateral (select unnest(range(1, 4)) as i) u
        """,
        "ann_quantized_topk": """
            with e as (select vec_id, cast(embedding as double[]) as v
                       from embeddings),
            q as (
                select vec_id, v,
                       case when list_max(list_transform(v, x -> abs(x))) > 0
                            then list_max(list_transform(v, x -> abs(x))) / 127.0
                            else 1.0 end as scale
                from e
            ),
            dq as (select vec_id,
                          list_transform(v, x -> round(x / scale) * scale) as w
                   from q),
            t as (select v as tv from e where vec_id = 0)
            select vec_id,
                   round(case when sqrt(list_dot_product(w, w))
                                   * sqrt(list_dot_product(tv, tv)) > 0
                              then list_dot_product(w, tv)
                                   / (sqrt(list_dot_product(w, w))
                                      * sqrt(list_dot_product(tv, tv)))
                         end, 6) as cos_sim
            from dq, t
            order by cos_sim desc, vec_id asc
            limit 10
        """,
        "embedding_centroids": """
            select label, i - 1 as dim,
                   round(avg(v[i]), 6) as centroid_v,
                   count(*) as n_vectors
            from (select label, cast(embedding as double[]) as v
                  from embeddings) e,
                 lateral (select unnest(range(1, 1 + len(v))) as i) u
            group by label, i - 1
        """,
        "ann_lsh_topk": f"""
            with e as (select vec_id, cast(embedding as double[]) as v,
                              {_lsh_bucket_sql(dim=64, bits=8)} as bucket
                       from embeddings),
            q as (select v as qv, bucket as qb from e where vec_id = 0)
            select vec_id,
                   round(case when sqrt(list_dot_product(v, v))
                                   * sqrt(list_dot_product(qv, qv)) > 0
                              then list_dot_product(v, qv)
                                   / (sqrt(list_dot_product(v, v))
                                      * sqrt(list_dot_product(qv, qv)))
                         end, 6) as cos_sim
            from e, q
            where {" or ".join(
                ["e.bucket = q.qb"]
                + [f"e.bucket = xor(q.qb, {1 << i})" for i in range(8)]
            )}
            order by cos_sim desc, vec_id asc
            limit 10
        """,
        "ivf_assign": f"""
            select vec_id, {_ivf_assign_sql(dim=64, n=8, seed=7)} as ivf_cluster
            from embeddings
        """,
        "o6_clean_name_unescape": f"""
            select c_custkey,
                   regexp_replace(regexp_replace(lower(
                       replace(replace(replace(replace(replace(
                           c_name || '&#039;s &amp; &quot;Co&lt;x&gt;',
                           '&#039;', chr(39)), '&quot;', '"'),
                           '&lt;', '<'), '&gt;', '>'), '&amp;', '&')
                   ), '\\d', '', 'g'),
                   '{_CLEAN_PATTERN}', '', 'g') as cleaned_name
            from customer
        """,
        "o7_left_join": """
            select o_orderkey, o_custkey, c_name, c_mktsegment
            from orders left join (select * from customer where c_acctbal > 0) c
              on o_custkey = c_custkey
        """,
        "o11_similarity": """
            with t as (select p_brand as tb, p_type as tt,
                              p_retailprice as tp
                       from part where p_partkey = 1)
            select p_partkey,
                   round(case when p_brand = tb then 0.5::double else 0.0::double end
                         + case when p_type = tt then 0.2::double else 0.0::double end
                         + (1.0::double - abs(tp - p_retailprice) / greatest(tp, p_retailprice)) * 0.3::double,
                         5) as score
            from part, t
        """,
        "q1_pricing_summary": """
            select l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) as sum_qty,
                   round(sum(l_extendedprice), 2) as sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
                   round(avg(l_quantity), 4) as avg_qty,
                   round(avg(l_discount), 4) as avg_disc,
                   count(*) as count_order
            from lineitem
            group by l_returnflag, l_linestatus
        """,
        "q3_top_revenue": """
            select o_orderkey, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
            from lineitem
            join orders on l_orderkey = o_orderkey
            join customer on o_custkey = c_custkey
            where c_mktsegment = 'BUILDING'
            group by o_orderkey, o_orderpriority
            order by revenue desc, o_orderkey asc
            limit 10
        """,
        "window_rank": """
            select o_custkey, o_orderkey, o_totalprice, rn
            from (select o_custkey, o_orderkey, o_totalprice,
                         row_number() over (partition by o_custkey
                                            order by o_totalprice desc, o_orderkey asc) as rn
                  from orders)
            where rn <= 3
        """,
        "rollup_agg": """
            select l_returnflag, l_linestatus,
                   count(*) as n, round(sum(l_quantity), 2) as sum_qty
            from lineitem
            group by rollup (l_returnflag, l_linestatus)
        """,
        "anti_join": """
            select c_custkey, c_name from customer
            where not exists (select 1 from orders
                              where o_custkey = c_custkey and o_totalprice > 400000)
        """,
        "semi_join": """
            select c_custkey, c_mktsegment from customer
            where exists (select 1 from orders
                          where o_custkey = c_custkey and o_orderpriority = '1-URGENT')
        """,
        "set_ops": """
            select distinct o_custkey as custkey from orders where o_totalprice > 300000
            except
            select distinct c_custkey as custkey from customer where c_mktsegment = 'BUILDING'
        """,
        "topk_orders": """
            select o_orderkey, o_custkey, o_totalprice
            from orders order by o_totalprice desc, o_orderkey asc limit 5
        """,
        "date_trunc_agg": """
            select event_type, date_trunc('day', ts) as day,
                   count(*) as n, round(sum(value), 2) as sum_value
            from events group by 1, 2
        """,
        "json_extract": """
            select event_type,
                   round(avg(cast(props->>'$.k' as bigint)), 4) as avg_k,
                   max(cast(props->>'$.k' as bigint)) as max_k,
                   count(*) as n
            from events group by event_type
        """,
        "incremental_dedup": f"""
            with new_batch as (
              select * from documents where doc_id % 2 = 1
            ),
            batch_unique as (
              select doc_id, lang, n_chars, md5({_NORM}) as fp
              from new_batch
              where doc_id in (select min(doc_id) from new_batch
                               group by md5({_NORM}))
            )
            select doc_id, lang, n_chars from batch_unique b
            where not exists (
              select 1 from documents e
              where e.doc_id % 2 = 0 and md5({_NORM.replace("text", "e.text")}) = b.fp)
        """,
        "dedup_exact": f"""
            select doc_id, lang, n_chars from documents
            where doc_id in (select min(doc_id) from documents
                             group by md5({_NORM}))
        """,
        "dedup_minhash_sig": f"""
            select doc_id,
                   {_mh_sql(0)} as mh_0, {_mh_sql(1)} as mh_1,
                   {_mh_sql(2)} as mh_2, {_mh_sql(3)} as mh_3
            from documents
        """,
        "text_stats": f"""
            select doc_id,
                   len({_TOKENS}) as n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|\\d|[^\\sA-Za-z\\d]')) as n_subwords
            from documents
        """,
        "text_language_id": f"""
            select doc_id, {lang_case} as lang_pred from documents
        """,
        "source_quota": f"""
            with scored as (
                select doc_id, source, round({quality_expr}, 6) as quality
                from documents
            )
            select source, doc_id, quality, rk from (
                select *, row_number() over (partition by source
                             order by quality desc, doc_id asc) as rk
                from scored
            ) where rk <= 20
        """,
        "text_quality": f"""
            select doc_id, {quality_expr} as quality from documents
        """,
        "udtf_sentences": """
            with s as (select doc_id, string_split(text, '.') as parts
                       from documents)
            select doc_id, i - 1 as sent_idx,
                   trim(parts[i], ' \t\n\r\f\v') as sentence
            from s, lateral (select unnest(range(1, 1 + len(parts))) as i) u
            where trim(parts[i], ' \t\n\r\f\v') <> ''
        """,
        "cdc_apply": """
            select c_custkey,
                   c_name,
                   round(case when c_custkey % 7 = 0 then c_acctbal + 50
                              else c_acctbal end, 2) as c_acctbal
            from customer where c_custkey % 13 <> 0
            union all
            select c_custkey + 1000000, 'NEW_' || c_name, 0.0
            from customer where c_custkey % 11 = 0
        """,
        "incremental_agg": """
            select o_orderpriority,
                   round(sum(o_totalprice), 2) as sum_price,
                   count(*) as n_orders,
                   min(o_orderdate) as first_order,
                   max(o_orderdate) as last_order
            from orders group by o_orderpriority
        """,
        "fuzzy_join": """
            with corrupted as (
                select p_partkey + 1000000 as c_key,
                       substr(p_name, 1, 3) || substr(p_name, 5) as c_name
                from part where p_partkey % 5 = 0
            )
            select c_key, p_partkey, c_name, p_name,
                   levenshtein(c_name, p_name) as edit_dist
            from corrupted, part
            where substr(regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g'), 1, 1)
                  = substr(regexp_replace(lower(p_name), '[^a-z0-9]', '', 'g'), 1, 1)
              and floor(length(p_name) / 3)
                  between floor(length(c_name) / 3) - 1
                      and floor(length(c_name) / 3) + 1
              and levenshtein(c_name, p_name) <= 1
        """,
        "text_winnow": f"""
            with nt as (select doc_id, {_NORM} as t from documents),
            fps as (
                select doc_id,
                       list_sort(list_transform(
                           [substr(t, i, 8)
                            for i in range(1, greatest(len(t) - 6, 1))],
                           g -> md5(g)))[1:4] as fp
                from nt
            )
            select doc_id, i - 1 as fp_idx, fp[i] as fp_hash
            from fps, lateral (select unnest(range(1, 1 + len(fp))) as i) u
        """,
        "text_fingerprint": f"""
            select doc_id, md5({_NORM}) as fingerprint from documents
        """,
        "ann_cosine_topk": """
            with t as (select cast(embedding as double[]) as q
                       from embeddings where vec_id = 0)
            select vec_id,
                   round(list_dot_product(cast(embedding as double[]), q)
                         / (sqrt(list_dot_product(cast(embedding as double[]),
                                                  cast(embedding as double[])))
                            * sqrt(list_dot_product(q, q))), 6) as cos_sim
            from embeddings, t
            order by cos_sim desc, vec_id asc
            limit 10
        """,
        "events_window": """
            select date_trunc('hour', ts) as window_start, event_type,
                   count(*) as n, round(sum(value), 2) as sum_value
            from events group by 1, 2
        """,
        "ann_lsh_bucket": f"""
            select vec_id, cast({_lsh_bucket_sql(64, 8, 42)} as int) as bucket
            from embeddings
        """,
        "q6_forecast_revenue": """
            select round(sum(l_extendedprice * l_discount), 2) as revenue,
                   count(*) as n
            from lineitem
            where l_shipdate >= '1997-01-01' and l_shipdate < '1998-01-01'
              and l_discount >= 0.05 and l_quantity < 25
        """,
        "q4_order_priority": """
            select o_orderpriority, count(*) as order_count
            from orders
            where exists (select 1 from lineitem
                          where l_orderkey = o_orderkey and l_returnflag = 'R')
            group by o_orderpriority
        """,
        "q10_returned_topk": """
            select c_custkey, c_name, c_mktsegment,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
            from lineitem
            join orders on l_orderkey = o_orderkey
            join customer on o_custkey = c_custkey
            where l_returnflag = 'R'
            group by c_custkey, c_name, c_mktsegment
            order by revenue desc, c_custkey asc
            limit 20
        """,
        "stats_agg": """
            select l_returnflag,
                   round(corr(l_quantity, l_extendedprice), 6) as corr_qty_price,
                   round(covar_samp(l_quantity, l_extendedprice), 4) as covar_qp,
                   round(stddev_samp(l_extendedprice), 4) as stddev_price,
                   round(var_samp(l_discount), 6) as var_disc
            from lineitem group by l_returnflag
        """,
        "fuzzy_funcs": """
            select c_custkey,
                   levenshtein(c_name, 'Customer#000000042') as lev_to_42,
                   levenshtein(c_name, reverse(c_name)) as lev_palindrome
            from customer
        """,
        "events_hopping": """
            with k as (select unnest(range(0, 4)) as i)
            select time_bucket(interval 15 minute, ts)
                       - (k.i * interval 15 minute) as window_start,
                   event_type,
                   count(*) as n,
                   round(sum(value), 2) as sum_value
            from events, k
            group by 1, 2
        """,
        "basket_pairs": """
            with p as (select distinct l_orderkey, l_partkey from lineitem),
            sized as (
                select l_orderkey from p
                group by l_orderkey
                having count(*) between 2 and 20
            )
            select a.l_partkey as part_a, b.l_partkey as part_b,
                   count(*) as n_orders
            from p a
            join p b on a.l_orderkey = b.l_orderkey
                    and a.l_partkey < b.l_partkey
            join sized s on a.l_orderkey = s.l_orderkey
            group by 1, 2
            order by n_orders desc, part_a asc, part_b asc
            limit 20
        """,
        "item_similarity": """
            with p as (select distinct l_orderkey, l_partkey from lineitem),
            sized as (
                select l_orderkey from p
                group by l_orderkey
                having count(*) between 2 and 20
            ),
            q as (select p.* from p join sized using (l_orderkey)),
            co as (
                select a.l_partkey as part_a, b.l_partkey as part_b,
                       count(*) as co
                from q a
                join q b on a.l_orderkey = b.l_orderkey
                        and a.l_partkey < b.l_partkey
                group by 1, 2
                having count(*) >= 3
            ),
            n as (select l_partkey, count(*) as n from q group by 1)
            select part_a, part_b, co,
                   round(co / sqrt(na.n * cast(nb.n as double)), 6) as cosine
            from co
            join n na on na.l_partkey = co.part_a
            join n nb on nb.l_partkey = co.part_b
            order by cosine desc, part_a asc, part_b asc
            limit 20
        """,
        "pit_join": """
            with hist as (
                select c_custkey, round(c_acctbal, 2) as c_acctbal,
                       timestamp '2024-01-01 00:00:00' as valid_from,
                       case when c_custkey % 10 = 0
                            then timestamp '2024-02-01 00:00:00'
                            else timestamp '2261-12-31 00:00:00' end as valid_to
                from customer
                union all
                select c_custkey, round(c_acctbal + 100, 2),
                       timestamp '2024-02-01 00:00:00',
                       timestamp '2261-12-31 00:00:00'
                from customer where c_custkey % 10 = 0
            ),
            o as (
                select o_orderkey, o_custkey,
                       timestamp '2024-01-01 00:00:00'
                           + (cast(o_orderkey % 60 as int) * interval 1 day)
                           as asof_ts
                from orders
            )
            select o.o_orderkey, o.o_custkey, h.c_acctbal, o.asof_ts
            from o join hist h
              on o.o_custkey = h.c_custkey
             and o.asof_ts >= h.valid_from
             and o.asof_ts < h.valid_to
        """,
        "scd2_history": """
            select c_custkey, c_name, round(c_acctbal, 2) as c_acctbal,
                   timestamp '2024-01-01 00:00:00' as valid_from,
                   case when c_custkey % 10 = 0
                        then timestamp '2024-02-01 00:00:00'
                        else timestamp '2261-12-31 00:00:00' end as valid_to
            from customer
            union all
            select c_custkey, c_name, round(c_acctbal + 100, 2),
                   timestamp '2024-02-01 00:00:00',
                   timestamp '2261-12-31 00:00:00'
            from customer where c_custkey % 10 = 0
        """,
        "date_funcs": """
            select o_orderkey,
                   cast(year(o_orderdate) as int) as yr,
                   cast(month(o_orderdate) as int) as mo,
                   cast(day(o_orderdate) as int) as dom,
                   cast(hour(o_orderdate) as int) as hr,
                   cast(date_diff('day', cast(o_orderdate as date),
                                  date '2002-01-01') as int) as days_to_2002,
                   strftime(o_orderdate, '%Y-%m') as ym
            from orders
        """,
        "corpus_pipeline": f"""
            with recursive base as (
                select doc_id, text from documents
                union all
                select doc_id + 100000, text || ' qq ww ee'
                from documents where doc_id < 10
            ),
            kept as (
                select doc_id, text from base
                where {lang_case} = 'en' and {quality_expr} >= 0.5
            ),
            fp as (select doc_id, text, md5({_NORM}) as f from kept),
            exact as (
                select doc_id, text from fp
                where doc_id in (select min(doc_id) from fp group by f)
            ),
            sig as (
                select doc_id, text,
                       {_mh_sql(0)} as mh_0, {_mh_sql(1)} as mh_1,
                       {_mh_sql(2)} as mh_2, {_mh_sql(3)} as mh_3
                from exact
            ),
            banded as (
                select doc_id, md5('0' || '|' || mh_0 || '|' || mh_1) as bk
                from sig where mh_0 is not null
                union all
                select doc_id, md5('1' || '|' || mh_2 || '|' || mh_3) as bk
                from sig where mh_0 is not null
            ),
            pairs as (
                select distinct l.doc_id as id_a, r.doc_id as id_b
                from banded l join banded r
                  on l.bk = r.bk and l.doc_id < r.doc_id
            ),
            edges as (
                select id_a as a, id_b as b from pairs
                union
                select id_b as a, id_a as b from pairs
            ),
            reach as (
                select a, a as b from edges
                union
                select a, b from edges
                union
                select r.a, e.b from reach r join edges e on r.b = e.a
            ),
            comp as (select a as id, min(b) as component from reach group by a),
            losers as (select id from comp where id <> component),
            surv as (
                select doc_id, text from exact
                where doc_id not in (select id from losers)
            ),
            toks as (
                select doc_id, regexp_extract_all(text, '\\S+') as t from surv
            ),
            sized as (
                select doc_id, t,
                       cast(ceil((len(t) - 8) / 56.0) as int) as n_chunks
                from toks where len(t) > 0
            )
            select doc_id, u.i - 1 as chunk_idx,
                   array_to_string(t[(u.i-1)*56 + 1 : (u.i-1)*56 + 64], ' ')
                       as chunk_text,
                   len(t[(u.i-1)*56 + 1 : (u.i-1)*56 + 64]) as n_tokens
            from sized,
                 lateral (select unnest(range(1, 1 + greatest(n_chunks, 1))) as i) u
        """,
        "try_cast": """
            select o_orderkey,
                   try_cast(case when o_orderkey % 7 = 0
                                 then cast(o_orderkey as varchar) || 'x'
                                 else cast(o_orderkey as varchar) end as bigint)
                       as maybe_key,
                   try_cast(o_orderstatus as double) as never_num
            from orders
        """,
        "collect_agg": """
            select l_returnflag,
                   array_to_string(list_sort(list(distinct l_linestatus)), ',')
                       as statuses,
                   count(*) as n
            from lineitem group by l_returnflag
        """,
        "window_range_frame": """
            select o_orderkey, o_custkey,
                   count(*) over w as n_close_below,
                   round(sum(o_totalprice) over w, 2) as sum_close_below
            from orders
            window w as (partition by o_custkey order by o_totalprice
                         range between 10000 preceding and current row)
        """,
        "multimodal_decode": """
            select doc_id as id,
                   ['png', 'jpeg', 'webp'][('0x' || substr(md5(text), 1, 2))::int % 3 + 1]
                       as format,
                   64 + ('0x' || substr(md5(text), 3, 2))::int as width,
                   64 + ('0x' || substr(md5(text), 5, 2))::int as height,
                   strlen(text) as size_bytes
            from documents
        """,
        "multimodal_features": """
            select doc_id as id, i as dim_idx,
                   round(('0x' || substr(md5(text), 2 * i + 1, 2))::int
                         / 255.0, 6) as feat
            from documents,
                 lateral (select unnest(range(0, 8)) as i) u
        """,
        "data_quality": """
            with m as (
                select count(*) as rows_,
                       count(case when o_orderkey is null then 1 end) as k_nulls,
                       count(distinct o_orderkey) as k_distinct,
                       cast(min(o_orderkey) as varchar) as k_min,
                       cast(max(o_orderkey) as varchar) as k_max,
                       count(case when o_orderstatus is null then 1 end) as s_nulls,
                       count(distinct o_orderstatus) as s_distinct,
                       cast(min(o_orderstatus) as varchar) as s_min,
                       cast(max(o_orderstatus) as varchar) as s_max,
                       count(case when o_totalprice is null then 1 end) as p_nulls,
                       count(distinct o_totalprice) as p_distinct,
                       cast(min(o_totalprice) as varchar) as p_min,
                       cast(max(o_totalprice) as varchar) as p_max
                from orders
            )
            select 'o_orderkey' as "column", 'nulls' as metric, cast(k_nulls as varchar) as value from m
            union all select 'o_orderkey', 'distinct', cast(k_distinct as varchar) from m
            union all select 'o_orderkey', 'min', k_min from m
            union all select 'o_orderkey', 'max', k_max from m
            union all select 'o_orderstatus', 'nulls', cast(s_nulls as varchar) from m
            union all select 'o_orderstatus', 'distinct', cast(s_distinct as varchar) from m
            union all select 'o_orderstatus', 'min', s_min from m
            union all select 'o_orderstatus', 'max', s_max from m
            union all select 'o_totalprice', 'nulls', cast(p_nulls as varchar) from m
            union all select 'o_totalprice', 'distinct', cast(p_distinct as varchar) from m
            union all select 'o_totalprice', 'min', p_min from m
            union all select 'o_totalprice', 'max', p_max from m
            union all select '_table', 'rows', cast(rows_ as varchar) from m
        """,
        "q5_region_revenue": """
            select n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
            from lineitem
            join orders on l_orderkey = o_orderkey
            join customer on o_custkey = c_custkey
            join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
            join nation on s_nationkey = n_nationkey
            join region on n_regionkey = r_regionkey
            where r_name = 'ASIA'
            group by n_name
        """,
        "correlated_subquery": """
            select p_partkey, p_brand, p_retailprice
            from part p
            where p_retailprice < (select avg(p2.p_retailprice)
                                   from part p2
                                   where p2.p_brand = p.p_brand)
        """,
        "hash_sample": """
            select o_orderkey, o_custkey, o_totalprice
            from orders
            where ('0x' || substr(md5(cast(o_orderkey as varchar)), 1, 8))::UBIGINT
                  % 10 = 0
        """,
        "pack_sequences": """
            with t as (
                select doc_id, regexp_extract_all(text, '\\S+') as toks
                from documents
            ),
            sized as (
                select doc_id, toks, len(toks) as n,
                       cast(ceil((len(toks) - 10) / 30.0) as int) as n_chunks
                from t where len(toks) > 0
            ),
            ch as (
                select doc_id, u.i - 1 as chunk_idx,
                       len(toks[(u.i-1)*30 + 1 : (u.i-1)*30 + 40]) as n_tokens,
                       ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::UBIGINT
                           % 8 as pack_bucket
                from sized,
                     lateral (select unnest(range(1, 1 + greatest(n_chunks, 1))) as i) u
            ),
            pos as (
                select *,
                       sum(n_tokens) over (partition by pack_bucket
                                           order by doc_id, chunk_idx
                                           rows unbounded preceding)
                           - n_tokens as start
                from ch
            )
            select doc_id, chunk_idx, n_tokens,
                   cast(pack_bucket as bigint) as pack_bucket,
                   cast(floor(start / 512) as bigint) as bin_idx,
                   cast(start % 512 as bigint) as bin_offset
            from pos
        """,
        "chunk_documents": """
            with t as (
                select doc_id, regexp_extract_all(text, '\\S+') as toks
                from documents
            ),
            sized as (
                select doc_id, toks, len(toks) as n,
                       cast(ceil((len(toks) - 10) / 30.0) as int) as n_chunks
                from t where len(toks) > 0
            )
            select doc_id, u.i - 1 as chunk_idx,
                   array_to_string(toks[(u.i-1)*30 + 1 : (u.i-1)*30 + 40], ' ')
                       as chunk_text,
                   len(toks[(u.i-1)*30 + 1 : (u.i-1)*30 + 40]) as n_tokens
            from sized,
                 lateral (select unnest(range(1, 1 + greatest(n_chunks, 1))) as i) u
        """,
        "grouping_sets": """
            select o_orderpriority, o_orderstatus,
                   cast(grouping(o_orderpriority) as int) as g_pri,
                   count(*) as n,
                   round(sum(o_totalprice), 2) as sum_price
            from orders
            group by grouping sets ((o_orderpriority), (o_orderstatus), ())
        """,
        "unpivot": """
            select l_orderkey, l_linenumber, metric, value
            from (select l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
                  from lineitem)
            unpivot include nulls (value for metric in (l_quantity, l_discount, l_tax))
        """,
        "regex_extract": """
            select c_custkey,
                   regexp_extract(c_name, 'Customer#(\\d+)', 1) as cust_num
            from customer
        """,
        "map_funcs": """
            select o_orderkey,
                   o_orderstatus as status_val,
                   o_orderpriority as priority_val,
                   2 as n_keys
            from orders
        """,
        "dedup_clusters": f"""
            with recursive docs2 as (
                select doc_id, text from documents
                union all
                select doc_id + 100000, text from documents where doc_id < 10
            ),
            sig as (
                select doc_id,
                       {_mh_sql(0)} as mh_0, {_mh_sql(1)} as mh_1,
                       {_mh_sql(2)} as mh_2, {_mh_sql(3)} as mh_3
                from docs2
            ),
            banded as (
                select doc_id, md5('0' || '|' || mh_0 || '|' || mh_1) as bk
                from sig where mh_0 is not null
                union all
                select doc_id, md5('1' || '|' || mh_2 || '|' || mh_3) as bk
                from sig where mh_0 is not null
            ),
            pairs as (
                select distinct l.doc_id as id_a, r.doc_id as id_b
                from banded l join banded r
                  on l.bk = r.bk and l.doc_id < r.doc_id
            ),
            edges as (
                select id_a as a, id_b as b from pairs
                union
                select id_b as a, id_a as b from pairs
            ),
            reach as (
                select a, a as b from edges
                union
                select a, b from edges
                union
                select r.a, e.b
                from reach r join edges e on r.b = e.a
            )
            select a as doc_id, min(b) as component
            from reach group by a
        """,
        "nullsafe_join": """
            with keyed as (
                select o_orderkey,
                       case when o_orderstatus = 'F' then o_custkey end as k
                from orders
            ),
            counts as (select k, count(*) as n_same_key from keyed group by k)
            select o_orderkey, n_same_key
            from keyed join counts on keyed.k is not distinct from counts.k
        """,
        "filtered_agg": """
            select l_returnflag,
                   count(case when l_discount > 0.05 then 1 end) as n_discounted,
                   count(case when l_tax > 0.04 then 1 end) as n_taxed,
                   round(sum(case when l_quantity > 25 then l_extendedprice end), 2)
                       as bulk_revenue,
                   count(*) as n
            from lineitem group by l_returnflag
        """,
        "explode_tokens": """
            select token, count(*) as n
            from (select unnest(regexp_extract_all(text, '\\S+')) as token
                  from documents)
            group by token
            order by n desc, token asc
            limit 10
        """,
        "pivot_agg": """
            select date_trunc('day', ts) as day,
                   count(case when event_type = 'click' then 1 end) as click,
                   count(case when event_type = 'error' then 1 end) as error,
                   count(case when event_type = 'purchase' then 1 end) as purchase,
                   count(case when event_type = 'signup' then 1 end) as signup,
                   count(case when event_type = 'view' then 1 end) as view
            from events group by 1
        """,
        "grouped_zscore": """
            select c_custkey,
                   round((c_acctbal - avg(c_acctbal) over w)
                         / stddev_samp(c_acctbal) over w, 4) as zscore
            from customer
            window w as (partition by c_mktsegment)
        """,
        "asof_join": """
            select e.event_id, e.user_id, p.purchase_value
            from (select event_id, user_id, ts from events
                  where event_type = 'error') e
            asof left join (select user_id, ts, round(value, 2) as purchase_value
                            from events where event_type = 'purchase') p
              on e.user_id = p.user_id and e.ts >= p.ts
        """,
        "range_join": """
            select l_partkey, count(*) as n_close,
                   round(avg(l_extendedprice), 4) as avg_price
            from lineitem join part
              on l_partkey = p_partkey
             and l_extendedprice >= p_retailprice * 0.9
             and l_extendedprice <= p_retailprice * 1.1
            group by l_partkey
        """,
        "sql_interface": """
            select c_mktsegment, count(*) as n_orders,
                   round(sum(o_totalprice), 2) as total_value
            from orders join customer on o_custkey = c_custkey
            where o_orderstatus = 'F'
            group by c_mktsegment
        """,
        "window_frames": """
            select o_custkey, o_orderkey,
                   round(sum(o_totalprice) over (partition by o_custkey
                         order by o_orderdate, o_orderkey
                         rows between unbounded preceding and current row), 2)
                       as running_total,
                   round(avg(o_totalprice) over (partition by o_custkey
                         order by o_orderdate, o_orderkey
                         rows between 2 preceding and current row), 4)
                       as moving_avg3,
                   lag(o_totalprice, 1) over (partition by o_custkey
                         order by o_orderdate, o_orderkey) as prev_price,
                   rank() over (partition by o_custkey
                         order by o_orderdate, o_orderkey) as rk
            from orders
        """,
        "incremental_lsh": f"""
            with sig as (
                select doc_id,
                       {_mh_sql(0)} as mh_0, {_mh_sql(1)} as mh_1,
                       {_mh_sql(2)} as mh_2, {_mh_sql(3)} as mh_3
                from documents
            ),
            banded as (
                select doc_id, md5('0' || '|' || mh_0 || '|' || mh_1) as bk
                from sig where mh_0 is not null
                union all
                select doc_id, md5('1' || '|' || mh_2 || '|' || mh_3) as bk
                from sig where mh_0 is not null
            ),
            -- mirror the engine's corpus-side degenerate-bucket guard
            -- (incremental_lsh_matches max_bucket=1000): band keys shared
            -- by more corpus docs than that are dropped before the join
            -- (bk embeds the band index, so grouping by bk alone matches
            -- the engine's per-(band, bk) count)
            ok_bk as (
                select bk from banded where doc_id % 2 = 0
                group by bk having count(*) <= 1000
            )
            select distinct n.doc_id as new_id, c.doc_id as corpus_id
            from banded n
            join banded c on n.bk = c.bk
            join ok_bk o on c.bk = o.bk
            where n.doc_id % 2 = 1 and c.doc_id % 2 = 0
        """,
        "incremental_refresh": f"""
            with corpus as (
              select doc_id, lang, n_chars, text from documents
              where doc_id % 2 = 0
            ),
            new_batch as (
              select doc_id, lang, n_chars, text from documents
              where doc_id % 2 = 1
            ),
            batch_unique as (
              select doc_id, lang, n_chars, text, md5({_NORM}) as fp
              from new_batch
              where doc_id in (select min(doc_id) from new_batch
                               group by md5({_NORM}))
            ),
            exact_surv as (
              select b.* from batch_unique b
              where not exists (select 1 from corpus e
                                where md5({_NORM.replace("text", "e.text")}) = b.fp)
            ),
            sig_n as (
              select doc_id,
                     {_mh_sql(0)} as mh_0, {_mh_sql(1)} as mh_1,
                     {_mh_sql(2)} as mh_2, {_mh_sql(3)} as mh_3
              from exact_surv
            ),
            sig_c as (
              select doc_id,
                     {_mh_sql(0)} as mh_0, {_mh_sql(1)} as mh_1,
                     {_mh_sql(2)} as mh_2, {_mh_sql(3)} as mh_3
              from corpus
            ),
            banded_n as (
              select doc_id, md5('0' || '|' || mh_0 || '|' || mh_1) as bk
              from sig_n where mh_0 is not null
              union all
              select doc_id, md5('1' || '|' || mh_2 || '|' || mh_3) as bk
              from sig_n where mh_0 is not null
            ),
            banded_c as (
              select doc_id, md5('0' || '|' || mh_0 || '|' || mh_1) as bk
              from sig_c where mh_0 is not null
              union all
              select doc_id, md5('1' || '|' || mh_2 || '|' || mh_3) as bk
              from sig_c where mh_0 is not null
            ),
            -- mirror the engine's corpus-side degenerate-bucket guard
            -- (incremental_lsh_matches max_bucket=1000)
            ok_bk as (
              select bk from banded_c
              group by bk having count(*) <= 1000
            ),
            cand as (
              select distinct n.doc_id as new_id, c.doc_id as corpus_id
              from banded_n n
              join banded_c c on n.bk = c.bk
              join ok_bk o on c.bk = o.bk
            ),
            sh as (
              select doc_id,
                     list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                    for i in range(1, len(t) - 1)]) as s
              from (select doc_id, regexp_extract_all({_NORM}, '\\S+') as t
                    from (select doc_id, text from exact_surv
                          union all
                          select doc_id, text from corpus) _) _
            ),
            near_dup as (
              select distinct p.new_id
              from cand p
              join sh a on p.new_id = a.doc_id
              join sh b on p.corpus_id = b.doc_id
              where round(case when len(list_distinct(list_concat(a.s, b.s))) > 0
                               then cast(len(list_intersect(a.s, b.s)) as double)
                                    / len(list_distinct(list_concat(a.s, b.s)))
                               else 0.0 end, 6) >= 0.8
            )
            select doc_id, lang, n_chars from exact_surv s
            where not exists (select 1 from near_dup d
                              where d.new_id = s.doc_id)
        """,
        "dedup_minhash_pairs": f"""
            with docs2 as (
                select doc_id, text from documents
                union all
                select doc_id + 100000, text from documents where doc_id < 10
            ),
            sig as (
                select doc_id,
                       {_mh_sql(0)} as mh_0, {_mh_sql(1)} as mh_1,
                       {_mh_sql(2)} as mh_2, {_mh_sql(3)} as mh_3
                from docs2
            ),
            banded as (
                select doc_id, md5('0' || '|' || mh_0 || '|' || mh_1) as bk
                from sig where mh_0 is not null
                union all
                select doc_id, md5('1' || '|' || mh_2 || '|' || mh_3) as bk
                from sig where mh_0 is not null
            )
            select distinct l.doc_id as id_a, r.doc_id as id_b
            from banded l join banded r
              on l.bk = r.bk and l.doc_id < r.doc_id
        """,
        "dedup_simhash": f"""
            with t as (
                select doc_id,
                       list_transform(regexp_extract_all({_NORM}, '\\S+'),
                                      s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) as th
                from documents
            )
            select doc_id, cast({_simhash_sql(16)} as bigint) as simhash from t
        """,
        "simhash_hamming": f"""
            with docs2 as (
                select doc_id, text from documents
                union all
                select doc_id + 200000, text || ' near duplicate tail'
                from documents where doc_id < 10
            ),
            t as (
                select doc_id,
                       list_transform(regexp_extract_all({_NORM}, '\\S+'),
                                      s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) as th
                from docs2
            ),
            sh as (
                select doc_id, cast({_simhash_sql(32)} as bigint) as sim from t
            ),
            keyed as (
                select doc_id, sim, bi, (sim >> (bi * 8)) & 255 as bv
                from sh, (select unnest(range(4)) as bi)
            ),
            cand as (
                select distinct l.doc_id as id_a, r.doc_id as id_b,
                                l.sim as sim_a, r.sim as sim_b
                from keyed l
                join keyed r on l.bi = r.bi and l.bv = r.bv
                            and l.doc_id < r.doc_id
            )
            select id_a, id_b,
                   cast(bit_count(xor(sim_a, sim_b)) as int) as hamming
            from cand
            where bit_count(xor(sim_a, sim_b)) <= 3
            order by id_a, id_b
        """,
        "ngram_jaccard": f"""
            with docs2 as (
                select doc_id, text from documents
                union all
                select doc_id + 100000, text from documents where doc_id < 10
            ),
            sig as (
                select doc_id,
                       {_mh_sql(0)} as mh_0, {_mh_sql(1)} as mh_1,
                       {_mh_sql(2)} as mh_2, {_mh_sql(3)} as mh_3
                from docs2
            ),
            banded as (
                select doc_id, md5('0' || '|' || mh_0 || '|' || mh_1) as bk
                from sig where mh_0 is not null
                union all
                select doc_id, md5('1' || '|' || mh_2 || '|' || mh_3) as bk
                from sig where mh_0 is not null
            ),
            pairs as (
                select distinct l.doc_id as id_a, r.doc_id as id_b
                from banded l join banded r
                  on l.bk = r.bk and l.doc_id < r.doc_id
            ),
            sh as (
                select doc_id,
                       list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                      for i in range(1, len(t) - 1)]) as s
                from (select doc_id,
                             regexp_extract_all({_NORM}, '\\S+') as t
                      from docs2) _
            )
            select id_a, id_b, jaccard from (
                select p.id_a, p.id_b,
                       round(case when len(list_distinct(list_concat(a.s, b.s))) > 0
                                  then cast(len(list_intersect(a.s, b.s)) as double)
                                       / len(list_distinct(list_concat(a.s, b.s)))
                                  else 0.0 end, 6) as jaccard
                from pairs p
                join sh a on p.id_a = a.doc_id
                join sh b on p.id_b = b.doc_id
            ) where jaccard >= 0.8
        """,
        "embedding_neighbors": f"""
            with e as (select vec_id, cast(embedding as double[]) as v,
                              {_lsh_bucket_sql(dim=64, bits=6)} as bucket
                       from embeddings)
            select a.vec_id as id_a, b.vec_id as id_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 6) as cos_sim
            from e a join e b on a.bucket = b.bucket and a.vec_id < b.vec_id
            order by cos_sim desc, id_a asc, id_b asc
            limit 20
        """,
        "streaming_dedup": """
            select event_id, user_id, event_type, value from events
        """,
        "stream_stream_join": """
            select l.user_id, l.event_id as l_event_id,
                   r.event_id as r_event_id, r.value as r_value
            from (select * from events where event_type = 'click') l
            join (select * from events where event_type = 'purchase') r
              on l.user_id = r.user_id
             and r.ts >= l.ts
             and r.ts <= l.ts + interval 30 minute
        """,
        "streaming_window_watermark": """
            with m as (select max(ts) as mx from events)
            select ws as window_start, event_type, n, sum_value
            from (
                select time_bucket(interval 1 hour, ts) as ws, event_type,
                       count(*) as n, round(sum(value), 2) as sum_value
                from events group by 1, 2
            ), m
            where ws + interval 1 hour <= mx - interval 10 minute
        """,
        "streaming_ohlc": """
            with m as (select max(ts) as mx from events),
            e as (
              select event_type, time_bucket(interval 1 hour, ts) as ws, value,
                     strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                     || '|' || lpad(cast(event_id as varchar), 12, '0') as sk
              from events
            )
            select ws as window_start, event_type, open, high, low, close,
                   volume
            from (
                select ws, event_type,
                       min_by(value, sk) as open,
                       round(max(value), 2) as high,
                       round(min(value), 2) as low,
                       max_by(value, sk) as close,
                       count(*) as volume
                from e group by 1, 2
            ), m
            where ws + interval 1 hour <= mx - interval 10 minute
            order by window_start, event_type
        """,
        "streaming_file_sink": """
            select event_id, user_id, event_type, value from events
        """,
        "streaming_sessionize": """
            with x as (
                select user_id, ts, value,
                       case when lag(ts) over w is null
                                 or ts - lag(ts) over w > interval 30 minute
                            then 1 else 0 end as new_s
                from events
                window w as (partition by user_id order by ts, event_id)
            ),
            y as (
                select *, sum(new_s) over (partition by user_id order by ts
                                           rows unbounded preceding) as sid
                from x
            ),
            s as (
                select user_id, min(ts) as session_start,
                       max(ts) + interval 30 minute as session_end,
                       count(*) as n_events, round(sum(value), 2) as sum_value
                from y group by user_id, sid
            ),
            m as (select max(ts) as mx from events)
            select user_id, session_start, session_end, n_events, sum_value
            from s, m where session_end <= mx - interval 10 minute
        """,
        "stream_static_join": """
            select event_id, user_id, event_type, c_mktsegment
            from events join customer on user_id = c_custkey
        """,
        "streaming_running_totals": """
            select user_id, count(*) as n_events,
                   round(sum(value), 2) as sum_value
            from events group by user_id
        """,
        "sessionize": """
            with x as (
                select user_id, ts, value,
                       case when lag(ts) over w is null
                                 or ts - lag(ts) over w > interval 30 minute
                            then 1 else 0 end as new_s
                from events
                window w as (partition by user_id order by ts, event_id)
            ),
            y as (
                select *, sum(new_s) over (partition by user_id order by ts
                                           rows unbounded preceding) as sid
                from x
            )
            select user_id, min(ts) as session_start,
                   max(ts) + interval 30 minute as session_end,
                   count(*) as n_events, round(sum(value), 2) as sum_value
            from y group by user_id, sid
        """,
        "cube_agg": """
            select o_orderpriority, o_orderstatus,
                   count(*) as n, round(sum(o_totalprice), 2) as sum_price
            from orders group by cube (o_orderpriority, o_orderstatus)
        """,
        "intersect_ops": """
            select c_custkey as custkey from customer where c_mktsegment = 'BUILDING'
            intersect
            select o_custkey as custkey from orders where o_orderpriority = '1-URGENT'
        """,
        "union_distinct": """
            select c_custkey from customer where c_acctbal > 5000
            union
            select c_custkey from customer where c_mktsegment = 'MACHINERY'
        """,
        "string_funcs": """
            select p_partkey,
                   upper(p_name) as name_upper,
                   substr(p_name, 1, 5) as name_pfx,
                   length(p_name) as name_len,
                   regexp_replace(p_type, ' ', '_', 'g') as type_snake,
                   lpad(cast(p_partkey as varchar), 8, '0') as key_padded,
                   reverse(p_brand) as brand_rev,
                   concat_ws('/', p_brand, p_type) as brand_type
            from part
        """,
        "math_funcs": """
            select l_orderkey, l_linenumber,
                   round(sqrt(l_extendedprice), 6) as sqrt_price,
                   round(ln(l_extendedprice), 6) as ln_price,
                   round(power(l_discount, 2), 6) as disc_sq,
                   cast(ceil(l_extendedprice) as bigint) as price_ceil,
                   cast(floor(l_extendedprice) as bigint) as price_floor,
                   abs(l_quantity - 25) as qty_dev,
                   l_orderkey % 7 as key_mod7
            from lineitem
        """,
        "array_funcs": """
            select vec_id,
                   len(embedding) as dim,
                   round((cast(embedding as double[]))[1], 6) as first_val,
                   round((cast(embedding as double[]))[-1], 6) as last_val,
                   round(list_max(cast(embedding as double[])), 6) as max_val,
                   round(list_sum((cast(embedding as double[]))[1:8]), 6) as head_sum
            from embeddings
        """,
        "percentile_agg": """
            select o_orderpriority,
                   round(quantile_cont(o_totalprice, 0.5), 4) as median_price,
                   round(quantile_cont(o_totalprice, 0.9), 4) as p90_price,
                   count(*) as n
            from orders group by o_orderpriority
        """,
        "case_bucket": """
            select case when o_totalprice < 50000 then 'low'
                        when o_totalprice < 150000 then 'mid'
                        when o_totalprice < 300000 then 'high'
                        else 'vhigh' end as price_band,
                   count(*) as n, round(avg(o_totalprice), 4) as avg_price
            from orders group by 1
        """,
        "coalesce_funcs": """
            select o_orderkey,
                   coalesce(c_name, 'UNKNOWN') as cust_name,
                   c_custkey is null as is_miss
            from orders left join (select c_custkey, c_name from customer
                                   where c_acctbal > 5000) c
              on o_custkey = c_custkey
        """,
        "analytic_funcs": """
            select o_custkey, o_orderkey,
                   ntile(4) over w as quartile,
                   round(percent_rank() over w, 6) as pct_rank,
                   round(cume_dist() over w, 6) as cume,
                   lead(o_totalprice, 1) over w as next_price
            from orders
            window w as (partition by o_custkey
                         order by o_totalprice, o_orderkey)
        """,
        "cross_join": """
            select n_nationkey, r_regionkey,
                   n_name || '-' || r_name as pair
            from nation cross join region
        """,
        "bitwise_funcs": """
            select l_orderkey, l_linenumber,
                   cast(l_linenumber << 3 as int) as ln_shl3,
                   l_orderkey >> 2 as ok_shr2,
                   l_orderkey & 255 as ok_and_255,
                   cast(l_linenumber | 8 as int) as ln_or_8,
                   xor(l_orderkey, cast(l_linenumber as bigint)) as ok_xor_ln
            from lineitem
        """,
        "interval_arith": """
            select o_orderkey,
                   cast(o_orderdate + interval 3 month as date) as plus_3mo,
                   last_day(cast(o_orderdate as date)) as month_end,
                   cast(quarter(o_orderdate) as int) as qtr,
                   cast(date_trunc('month', o_orderdate) as date) as month_start,
                   cast(weekofyear(o_orderdate) as int) as iso_week
            from orders
        """,
        "posexplode_tokens": """
            select doc_id, pos, token from (
              select doc_id,
                     cast(generate_subscripts(toks, 1) - 1 as int) as pos,
                     unnest(toks) as token
              from (select doc_id, string_split(text, ' ') as toks
                    from documents where doc_id < 200))
            where token is distinct from ''
        """,
        "struct_funcs": """
            select o_custkey, o_totalprice as best_price,
                   o_orderkey as best_orderkey
            from (select o_custkey, o_totalprice, o_orderkey,
                         row_number() over (partition by o_custkey
                                            order by o_totalprice desc,
                                                     o_orderkey desc) as rn
                  from orders)
            where rn = 1
        """,
        "stratified_sample": """
            select o_orderkey, o_custkey, o_orderpriority, o_totalprice
            from orders
            where ('0x' || substr(md5(cast(o_orderkey as varchar)), 1, 8))::UBIGINT
                  % 100
                  < case when o_orderpriority = '1-URGENT' then 50
                         when o_orderpriority = '2-HIGH' then 20
                         else 5 end
        """,
        "q7_nation_volume": """
            select supp_nation, cust_nation, l_year,
                   round(sum(volume), 2) as revenue
            from (
              select ns.n_name as supp_nation, nc.n_name as cust_nation,
                     cast(year(l_shipdate) as int) as l_year,
                     l_extendedprice * (1 - l_discount) as volume
              from lineitem
              join supplier on l_suppkey = s_suppkey
              join nation ns on s_nationkey = ns.n_nationkey
              join orders on l_orderkey = o_orderkey
              join customer on o_custkey = c_custkey
              join nation nc on c_nationkey = nc.n_nationkey
              where (ns.n_name = 'NATION_1' and nc.n_name = 'NATION_2')
                 or (ns.n_name = 'NATION_2' and nc.n_name = 'NATION_1')
            ) shipping
            group by supp_nation, cust_nation, l_year
        """,
        "q14_promo_revenue": """
            select round(
                     100.0 * sum(case when p_type like 'PROMO%'
                                      then l_extendedprice * (1 - l_discount)
                                      else 0 end)
                     / sum(l_extendedprice * (1 - l_discount)), 6
                   ) as promo_revenue_pct
            from lineitem join part on l_partkey = p_partkey
            where l_shipdate >= '1995-09-01' and l_shipdate < '1995-10-01'
        """,
        "q18_large_orders": """
            select c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
                   round(total_qty, 2) as total_qty
            from (select l_orderkey, sum(l_quantity) as total_qty
                  from lineitem group by l_orderkey
                  having sum(l_quantity) > 150) big
            join orders on big.l_orderkey = o_orderkey
            join customer on o_custkey = c_custkey
        """,
        "q19_disjunctive_join": """
            select round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
                   count(*) as n_lines
            from lineitem join part on l_partkey = p_partkey
            where (p_brand = 'Brand#1' and p_size between 1 and 15
                   and l_quantity between 1 and 20)
               or (p_brand = 'Brand#3' and p_size between 10 and 30
                   and l_quantity between 10 and 40)
        """,
        "cogroup_reconcile": """
            select o_orderkey, o_totalprice,
                   round(coalesce(line_sum, 0), 2) as line_sum,
                   round(o_totalprice - coalesce(line_sum, 0), 2) as diff
            from orders
            left join (select l_orderkey, sum(l_extendedprice) as line_sum
                       from lineitem group by l_orderkey) li
              on o_orderkey = l_orderkey
            where o_orderkey % 20 = 0
        """,
        "gap_fill": """
            select event_id, user_id, event_type,
                   last_value(case when event_type = 'purchase' then value end
                              ignore nulls)
                     over (partition by user_id order by ts, event_id
                           rows between unbounded preceding and current row)
                     as last_purchase_value
            from events
        """,
        "date_spine": """
            with bounds as (
              select date_trunc('month', min(o_orderdate)) as lo,
                     date_trunc('month', max(o_orderdate)) as hi
              from orders
            ),
            spine as (
              select unnest(generate_series(lo, hi, interval 1 month))
                       as month_start
              from bounds
            ),
            monthly as (
              select date_trunc('month', o_orderdate) as month_start,
                     count(*) as n_orders,
                     round(sum(o_totalprice), 2) as revenue
              from orders group by 1
            )
            select cast(s.month_start as date) as month_start,
                   coalesce(n_orders, 0) as n_orders,
                   round(coalesce(revenue, 0), 2) as revenue
            from spine s left join monthly m
              on s.month_start = m.month_start
        """,
        "variant_json": """
            select event_id, event_type,
                   cast(json_extract(props, '$.k') as int) as k
            from events
            where cast(json_extract(props, '$.k') as int) % 3 = 0
        """,
        "recursive_cte": _RECURSIVE_ANCESTORS_SQL,
        "pii_redact": """
            select doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           text || ' contact user' || doc_id
                                || '@example.com or call 555-123-'
                                || lpad(cast(doc_id % 10000 as varchar), 4, '0')
                                || ' docs at https://ex.com/d/' || doc_id
                                || ' from 10.0.' || (doc_id % 256) || '.7',
                           'https?://\\S+', '<URL>', 'g'),
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\\+?\\d{3}[-. ]\\d{3}[-. ]\\d{4}', '<PHONE>', 'g'),
                     '\\b\\d{1,3}(\\.\\d{1,3}){3}\\b', '<IP>', 'g')
                     as clean_text
            from documents
        """,
        "boilerplate_ngrams": """
            with shingled as (
              select distinct doc_id, shingle from (
                select doc_id,
                       unnest(list_transform(
                         generate_series(1, greatest(len(t) - 2, 0)),
                         i -> array_to_string(t[i:i+2], ' '))) as shingle
                from (select doc_id, string_split(text, ' ') as t
                      from documents)
              )
            )
            select shingle, count(*) as n_docs
            from shingled group by shingle having count(*) >= 5
        """,
        "contamination_check": """
            with shingled as (
              select distinct doc_id, shingle from (
                select doc_id,
                       unnest(list_transform(
                         generate_series(1, greatest(len(t) - 2, 0)),
                         i -> array_to_string(t[i:i+2], ' '))) as shingle
                from (select doc_id, string_split(text, ' ') as t
                      from documents)
              )
            )
            select c.doc_id,
                   count(*) as n_contaminated_shingles
            from shingled c
            join (select distinct shingle from shingled where doc_id < 10) b
              on c.shingle = b.shingle
            where c.doc_id >= 10
            group by c.doc_id
        """,
        "funnel_paths": """
            select user_id,
                   cast(count(*) as bigint) as n_events,
                   string_agg(event_type, '>' order by ts, event_id) as path,
                   case when position('signup' in
                            string_agg(event_type, '>' order by ts, event_id))
                          > 0
                        then position('purchase' in
                            string_agg(event_type, '>' order by ts, event_id))
                          > position('signup' in
                            string_agg(event_type, '>' order by ts, event_id))
                        else false end as converted
            from events
            group by user_id
        """,
        "top_terms": """
            select token, count(*) as doc_freq
            from (select distinct doc_id, token
                  from (select doc_id,
                               unnest(string_split(text, ' ')) as token
                        from documents)
                  where token is distinct from '')
            group by token
            order by doc_freq desc, token asc
            limit 20
        """,
        "q8_market_share": """
            select cast(year(o_orderdate) as int) as o_year,
                   round(sum(case when n2.n_name = 'NATION_5'
                                  then l_extendedprice * (1 - l_discount)
                                  else 0.0 end)
                         / sum(l_extendedprice * (1 - l_discount)), 6)
                     as mkt_share
            from lineitem
            join part     on l_partkey = p_partkey
            join orders   on l_orderkey = o_orderkey
            join customer on o_custkey = c_custkey
            join nation n1 on c_nationkey = n1.n_nationkey
            join region   on n1.n_regionkey = r_regionkey
            join supplier on l_suppkey = s_suppkey
            join nation n2 on s_nationkey = n2.n_nationkey
            where p_type = 'STANDARD'
              and r_name = 'ASIA'
              and o_orderdate >= timestamp '1996-01-01'
              and o_orderdate <  timestamp '1998-01-01'
            group by 1
            order by o_year
        """,
        "q13_custdist": """
            select c_count, count(*) as custdist
            from (select c_custkey, count(o_orderkey) as c_count
                  from customer
                  left outer join orders
                    on c_custkey = o_custkey
                   and o_orderpriority not like '1-%'
                  group by c_custkey)
            group by c_count
            order by custdist desc, c_count desc
        """,
        "q15_top_supplier": """
            with rev as (
              select l_suppkey,
                     round(sum(l_extendedprice * (1 - l_discount)), 2)
                       as total_revenue
              from lineitem
              where l_shipdate >= timestamp '1996-01-01'
                and l_shipdate <  timestamp '1996-04-01'
              group by l_suppkey
            )
            select s_suppkey, s_name, total_revenue
            from supplier join rev on s_suppkey = l_suppkey
            where total_revenue = (select max(total_revenue) from rev)
            order by s_suppkey
        """,
        "q17_small_quantity": """
            with brand_li as (
              select l_partkey, l_quantity, l_extendedprice
              from lineitem
              join part on l_partkey = p_partkey
              where p_brand = 'Brand#1'
            ),
            thresh as (
              select l_partkey, 0.2 * avg(l_quantity) as qty_thresh
              from brand_li
              group by l_partkey
            )
            select round(sum(l_extendedprice) / 7.0, 2) as avg_yearly,
                   count(*) as n_small
            from brand_li join thresh using (l_partkey)
            where l_quantity < qty_thresh
        """,
        "q22_sales_opportunity": """
            select c_mktsegment,
                   count(*) as numcust,
                   round(sum(c_acctbal), 2) as totacctbal
            from customer
            where c_acctbal > (select avg(c_acctbal)
                               from customer where c_acctbal > 0)
              and not exists (select 1 from orders
                              where o_custkey = c_custkey
                                and o_orderdate >= timestamp '1999-01-01')
            group by c_mktsegment
            order by c_mktsegment
        """,
        "q21_suppliers_waiting": """
            select s_name, count(*) as numwait
            from lineitem l1
            join orders o on o.o_orderkey = l1.l_orderkey
                         and o.o_orderstatus = 'F'
            join supplier s on s.s_suppkey = l1.l_suppkey
            join nation n on n.n_nationkey = s.s_nationkey
                         and n.n_name = 'NATION_7'
            where l1.l_shipdate > o.o_orderdate + interval 60 day
              and exists (
                select 1 from lineitem l2
                where l2.l_orderkey = l1.l_orderkey
                  and l2.l_suppkey <> l1.l_suppkey)
              and not exists (
                select 1 from lineitem l3
                join orders o3 on o3.o_orderkey = l3.l_orderkey
                where l3.l_orderkey = l1.l_orderkey
                  and l3.l_suppkey <> l1.l_suppkey
                  and o3.o_orderstatus = 'F'
                  and l3.l_shipdate > o3.o_orderdate + interval 60 day)
            group by s_name
            order by numwait desc, s_name
            limit 20
        """,
        "q20_potential_promotion": """
            select s_name, round(s_acctbal, 2) as s_acctbal
            from supplier
            join nation on s_nationkey = n_nationkey
                       and n_name = 'NATION_3'
            where s_suppkey in (
              select l_suppkey from lineitem
              where l_partkey in (select p_partkey from part
                                  where p_name like 'red%')
                and l_shipdate >= timestamp '1997-01-01'
                and l_shipdate <  timestamp '1998-01-01'
              group by l_suppkey, l_partkey
              having sum(l_quantity) > 0.3 * (
                select sum(l2.l_quantity) from lineitem l2
                where l2.l_partkey = lineitem.l_partkey
                  and l2.l_shipdate >= timestamp '1997-01-01'
                  and l2.l_shipdate <  timestamp '1998-01-01')
            )
            order by s_name
        """,
        "q12_late_shipments": """
            select l_linestatus as ship_class,
                   count(*) filter (where o_orderpriority
                                    in ('1-URGENT', '2-HIGH'))
                       as high_line_count,
                   count(*) filter (where o_orderpriority
                                    not in ('1-URGENT', '2-HIGH'))
                       as low_line_count
            from lineitem join orders on l_orderkey = o_orderkey
            where l_shipdate >= timestamp '1998-01-01'
              and l_shipdate <  timestamp '1999-01-01'
              and l_shipdate > o_orderdate + interval 45 day
            group by ship_class
            order by ship_class
        """,
        "q9_product_type_profit": """
            select n_name as nation,
                   year(o_orderdate) as o_year,
                   round(cast(sum(cast(l_extendedprice * (1 - l_discount)
                                       - 0.01 * p_retailprice * l_quantity
                                       as decimal(18,4))) as double), 2)
                       as sum_profit
            from lineitem
            join part on l_partkey = p_partkey and p_name like '%red%'
            join supplier on l_suppkey = s_suppkey
            join nation on s_nationkey = n_nationkey
            join orders on l_orderkey = o_orderkey
            group by n_name, year(o_orderdate)
            order by nation, o_year desc
        """,
        "q11_important_parts": """
            with per_part as (
              select l_partkey,
                     sum(l_extendedprice * (1 - l_discount)) as val
              from lineitem
              where l_suppkey in (
                select s_suppkey from supplier
                join nation on s_nationkey = n_nationkey
                where n_name = 'NATION_1')
              group by l_partkey
            )
            select l_partkey as partkey, round(val, 2) as value
            from per_part
            where val > (select avg(val) * 2.0 from per_part)
            order by value desc, partkey
        """,
        "q2_min_cost_supplier": """
            with eur_supp as (
              select s_suppkey, s_name, s_acctbal, n_name
              from supplier
              join nation on s_nationkey = n_nationkey
              join region on n_regionkey = r_regionkey
              where r_name = 'EUROPE'
            ),
            offers as (
              select l_partkey as p_partkey, s_suppkey, s_name, s_acctbal,
                     n_name,
                     min(l_extendedprice / l_quantity) as unit_cost
              from lineitem
              join part on l_partkey = part.p_partkey
                       and p_type = 'SMALL' and p_size <= 10
              join eur_supp on l_suppkey = s_suppkey
              group by all
            )
            select round(s_acctbal, 2) as s_acctbal, s_name, n_name,
                   p_partkey as partkey, round(unit_cost, 4) as unit_cost
            from offers o
            where unit_cost = (select min(unit_cost) from offers i
                               where i.p_partkey = o.p_partkey)
            order by s_acctbal desc, n_name, s_name, partkey
            limit 100
        """,
        "q16_parts_supplier_relationship": """
            select p_brand, p_type, p_size,
                   count(distinct l_suppkey) as supplier_cnt
            from lineitem
            join part on l_partkey = p_partkey
            where p_brand <> 'Brand#1'
              and p_type not like 'PROMO%'
              and p_size in (1, 4, 9, 14, 19, 24, 29, 34)
              and l_suppkey not in (select s_suppkey from supplier
                                    where s_acctbal < 0)
            group by p_brand, p_type, p_size
            order by supplier_cnt desc, p_brand, p_type, p_size
        """,
        "cohort_retention": """
            with first_week as (
              select user_id, min(date_trunc('week', ts)) as cohort_week
              from events group by user_id
            ),
            activity as (
              select distinct user_id, date_trunc('week', ts) as act_week
              from events
            )
            select cohort_week,
                   cast(floor(date_diff('day', cohort_week, act_week) / 7)
                        as int) as week_offset,
                   count(*) as n_users
            from activity join first_week using (user_id)
            group by cohort_week, week_offset
            order by cohort_week, week_offset
        """,
        "decile_report": """
            with spend as (
              select o_custkey, round(sum(o_totalprice), 2) as spend
              from orders group by o_custkey
            ),
            deciled as (
              select spend,
                     cast(ntile(10) over (order by spend desc, o_custkey asc)
                          as int) as decile
              from spend
            )
            select decile,
                   count(*) as n_cust,
                   round(sum(spend), 2) as total_spend,
                   round(avg(spend), 4) as avg_spend
            from deciled
            group by decile
            order by decile
        """,
        "activity_islands": """
            with days as (
              select distinct user_id, cast(ts as date) as day
              from events
            ),
            anchored as (
              select user_id, day,
                     day - cast(row_number() over (
                       partition by user_id order by day) as int) as anchor
              from days
            )
            select user_id,
                   min(day) as streak_start,
                   max(day) as streak_end,
                   count(*) as streak_days
            from anchored
            group by user_id, anchor
            order by user_id, streak_start
        """,
        "rolling_active_users": """
            with days as (
              select distinct user_id, cast(ts as date) as day
              from events
            ),
            ends as (select distinct day as win_end from days)
            select win_end,
                   count(distinct user_id) as active_7d
            from ends join days
              on day <= win_end and day > win_end - 7
            group by win_end
            order by win_end
        """,
        "gini_concentration": """
            with rev as (
              select o_custkey, sum(o_totalprice) as rev
              from orders group by 1
            ),
            j as (
              select c.c_nationkey, r.o_custkey, r.rev
              from rev r join customer c on r.o_custkey = c.c_custkey
            ),
            ranked as (
              select c_nationkey, rev,
                     row_number() over (partition by c_nationkey
                                        order by rev, o_custkey) as i
              from j
            )
            select c_nationkey,
                   count(*) as n_customers,
                   round(2.0 * sum(i * rev) / (count(*) * sum(rev))
                         - (count(*) + 1.0) / count(*), 6) as gini
            from ranked
            group by c_nationkey
            order by c_nationkey
        """,
        "weighted_reservoir": """
            with keyed as (
              select source, doc_id, n_chars,
                     -ln((('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint
                          + 1.0) / 4294967297.0) / n_chars as key
              from documents
            ),
            ranked as (
              select source, doc_id, n_chars,
                     row_number() over (partition by source
                                        order by key, doc_id) as rk
              from keyed
            )
            select source, rk, doc_id, n_chars
            from ranked where rk <= 5
            order by source, rk
        """,
        "source_kl": f"""
            with toks as (
              select source, unnest(regexp_extract_all({_NORM}, '\\S+')) as w
              from documents
            ),
            per_sw as (
              select source, w, count(*) as c_sw from toks group by 1, 2
            ),
            vocab as (select w, count(*) as c_all from toks group by 1),
            totals_s as (select source, count(*) as t_s from toks group by 1),
            consts as (select count(*) as v, sum(c_all) as t from vocab),
            grid as (
              select ts.source, ts.t_s, vo.w, vo.c_all, c.v, c.t,
                     coalesce(p.c_sw, 0) as c_sw
              from totals_s ts
              cross join vocab vo
              cross join consts c
              left join per_sw p on p.source = ts.source and p.w = vo.w
            )
            select source, max(t_s) as n_tokens,
                   round(sum(((c_sw + 1.0) / (t_s + v))
                             * (ln((c_sw + 1.0) / (t_s + v))
                                - ln((c_all + 1.0) / (t + v)))), 6) as kl
            from grid
            group by source
            order by source
        """,
        "rule_quarantine": """
            with c as (
              select 'price_cap' as rule,
                     count(case when o_totalprice > 400000.0 then 1 end)
                       as n_rows
              from orders
              union all
              select 'date_horizon',
                     count(case when o_orderdate >= timestamp '1998-06-01'
                           then 1 end)
              from orders
              union all
              select 'priority_allowed',
                     count(case when o_orderpriority not in
                           ('1-URGENT', '2-HIGH', '3-MEDIUM') then 1 end)
              from orders
              union all
              select 'known_customer',
                     (select count(*) from orders o
                      where not exists (select 1 from customer c
                                        where c.c_custkey = o.o_custkey))
              union all
              select '__clean',
                     (select count(*) from orders o
                      where o_totalprice <= 400000.0
                        and o_orderdate < timestamp '1998-06-01'
                        and o_orderpriority in
                            ('1-URGENT', '2-HIGH', '3-MEDIUM')
                        and exists (select 1 from customer c
                                    where c.c_custkey = o.o_custkey))
            )
            select rule, n_rows from c
            where n_rows > 0 or rule = '__clean'
            order by rule
        """,
        "ohlc_bars": """
            with e as (
              select event_type, date_trunc('hour', ts) as bar_hour, value,
                     strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                     || '|' || lpad(cast(event_id as varchar), 12, '0') as sk
              from events
            )
            select event_type, bar_hour,
                   min_by(value, sk) as open,
                   round(max(value), 2) as high,
                   round(min(value), 2) as low,
                   max_by(value, sk) as close,
                   count(*) as volume
            from e
            group by 1, 2
            order by event_type, bar_hour
        """,
        "ranking_metrics": """
            with ranked as (
              select lang,
                     row_number() over (partition by lang
                                        order by n_chars desc, doc_id) as rank,
                     case when source like '%0' then 2
                          when source like '%5' then 1
                          else 0 end as rel
              from documents
            ),
            ideal as (
              select lang, rank, rel,
                     row_number() over (partition by lang
                                        order by rel desc, rank) as irank
              from ranked
            )
            select lang,
                   round(case when sum(case when irank <= 10
                                    then rel / log2(irank + 1.0)
                                    else 0 end) > 0
                         then sum(case when rank <= 10
                                  then rel / log2(rank + 1.0)
                                  else 0 end)
                              / sum(case when irank <= 10
                                    then rel / log2(irank + 1.0)
                                    else 0 end)
                         else 0 end, 6) as ndcg_at_k,
                   round(coalesce(max(case when rel > 0
                                      then 1.0 / rank end), 0.0), 6) as mrr,
                   round(count(case when rel > 0 and rank <= 10 then 1 end)
                         / 10.0, 6) as precision_at_k
            from ideal
            group by lang
            order by lang
        """,
        "chi2_independence": """
            with cells as (
              select source, lang, count(*) as obs
              from documents group by 1, 2
            ),
            rt as (select source, count(*) as rt from documents group by 1),
            ct as (select lang, count(*) as ct from documents group by 1),
            n as (select count(*) as n from documents),
            grid as (
              select rt.source, ct.lang, rt.rt, ct.ct, n.n,
                     coalesce(cells.obs, 0) as obs,
                     rt.rt * ct.ct / cast(n.n as double) as exp
              from rt cross join ct cross join n
              left join cells on cells.source = rt.source
                             and cells.lang = ct.lang
            )
            select round(sum((obs - exp) * (obs - exp) / exp), 6) as chi2,
                   cast((count(distinct source) - 1)
                        * (count(distinct lang) - 1) as bigint) as dof,
                   max(n) as n
            from grid
        """,
        "exact_split": """
            with r as (
              select doc_id, source,
                     row_number() over (
                       partition by source
                       order by md5(cast(doc_id as varchar)), doc_id
                     ) as rn,
                     count(*) over (partition by source) as cnt
              from documents
            )
            select doc_id, source,
                   case when rn <= floor(cnt * 0.8) then 'train'
                        when rn <= floor(cnt * 0.9) then 'val'
                        else 'test' end as split
            from r
            order by doc_id
        """,
        "ab_test": """
            with p as (
              select value,
                     (('0x' || substr(md5(cast(user_id as varchar)), 1, 8))::bigint
                      % 2) as arm
              from events where event_type = 'purchase'
            ),
            agg as (
              select count(case when arm = 0 then 1 end) as n_c,
                     count(case when arm = 1 then 1 end) as n_t,
                     avg(case when arm = 0 then value end) as mean_c,
                     avg(case when arm = 1 then value end) as mean_t,
                     var_samp(case when arm = 0 then value end) as var_c,
                     var_samp(case when arm = 1 then value end) as var_t
              from p
            )
            select n_c, n_t,
                   round(mean_c, 6) as mean_c,
                   round(mean_t, 6) as mean_t,
                   round(mean_t - mean_c, 6) as lift,
                   round((mean_t - mean_c)
                         / sqrt(var_t / n_t + var_c / n_c), 6) as t_stat,
                   round(pow(var_t / n_t + var_c / n_c, 2)
                         / (pow(var_t / n_t, 2) / (n_t - 1)
                            + pow(var_c / n_c, 2) / (n_c - 1)), 3) as dof
            from agg
        """,
        "rolling_active_hll": """
            with days as (
              select distinct user_id, cast(ts as date) as day
              from events
            ),
            ends as (select distinct day as win_end from days)
            select win_end,
                   count(distinct user_id) as active_7d,
                   true as hll_within_bound
            from ends join days
              on day <= win_end and day > win_end - 7
            group by win_end
            order by win_end
        """,
        "histogram_bucket": """
            select least(cast(floor(o_totalprice / 50000.0) as int), 9)
                     as bucket,
                   count(*) as n_orders,
                   round(min(o_totalprice), 2) as min_price,
                   round(max(o_totalprice), 2) as max_price,
                   round(sum(o_totalprice), 2) as sum_price
            from orders
            group by bucket
            order by bucket
        """,
        "weighted_sample": """
            select doc_id, source
            from documents
            where ('0x' || substr(md5(cast(doc_id as varchar) || '|ws'), 1, 8))
                    ::UBIGINT / 4294967296.0
                  < (1.0 + (cast(regexp_extract(source, '(\\d+)', 1) as int)
                            % 5)) / 10.0
            order by doc_id
        """,
        "python_datasource": """
            select 'src' || (i % 20) as source,
                   count(*) as n_docs,
                   cast(sum(1 + i % 7) as bigint) as sum_tokens,
                   cast(sum(3 * (1 + i % 7) - 1) as bigint) as sum_chars
            from generate_series(0, 4999) t(i)
            group by 1
            order by source
        """,
        # the most-frequent-bigram count is computed by unnest+group
        # here vs the in-row sorted-run fold in Spark — same number,
        # different (shuffle-free) plan shape on the Spark side
        "text_repetition": r"""
            with w as (
              select doc_id, regexp_extract_all(text, '\S+') as words
              from documents
            ),
            b as (
              select doc_id, len(words) as n_words,
                     round(1 - len(list_distinct(words))::double
                               / len(words), 4) as dup_word_frac,
                     words
              from w
            ),
            bi as (
              select doc_id, words[i] || ' ' || words[i+1] as bg
              from b, lateral unnest(range(1, n_words)) t(i)
            ),
            cnt as (
              select doc_id, bg, count(*) as c from bi group by 1, 2
            ),
            top as (select doc_id, max(c) as mc from cnt group by 1)
            select b.doc_id, cast(b.n_words as bigint) as n_words,
                   b.dup_word_frac,
                   round(top.mc::double / (b.n_words - 1), 4)
                     as top_bigram_frac
            from b join top using (doc_id)
            order by doc_id
        """,
        "pagerank": _pagerank_oracle_sql(iterations=10),
        # Bounded-error oracles: the sketch/ANN estimates are engine-
        # specific, but their published accuracy contracts are not. The
        # Spark queries compute exact references alongside the estimates
        # and reduce the contract to booleans; the oracle recomputes the
        # exact columns cross-engine and pins the booleans true, so a
        # drifting estimate fails the value hash.
        "sketch_agg": """
            select l_returnflag,
                   count(distinct l_partkey) as exact_parts,
                   count(*) as n,
                   true as hll_within_bound
            from lineitem
            group by l_returnflag
            order by l_returnflag
        """,
        "sketch_rollup_merge": """
            select event_type,
                   count(distinct user_id) as exact_users,
                   count(*) as n_rows,
                   true as hll_within_bound,
                   true as kll_median_within_bound
            from events
            group by event_type
            order by event_type
        """,
        "ann_ivf_topk": """
            select count(*) as n_vectors,
                   10 as k,
                   true as recall_ok
            from embeddings
        """,
        "equidepth_histogram": """
            with t as (
              select l_orderkey, l_linenumber,
                     round(l_extendedprice, 2) as price
              from lineitem
            ),
            r as (
              select price,
                     ntile(10) over (
                       order by price, l_orderkey, l_linenumber
                     ) as bucket
              from t
            )
            select bucket, count(*) as n,
                   round(min(price), 2) as lo,
                   round(max(price), 2) as hi
            from r group by bucket order by bucket
        """,
        "streaming_kll_median": """
            with m as (select max(ts) as mx from events)
            select ws as w_start,
                   count(*) as n_events,
                   true as kll_median_within_bound
            from (select time_bucket(interval 6 hour, ts) as ws
                  from events), m
            where ws + interval 6 hour <= mx - interval 10 minute
            group by ws
            order by ws
        """,
        "bm25_scores": f"""
            with tok as (
              select doc_id,
                     unnest(regexp_extract_all({_NORM}, '\\S+')) as w
              from documents
            ),
            lens as (select doc_id, count(*) as dl from tok group by doc_id),
            stats as (select count(*) as n_docs, avg(dl) as avgdl from lens),
            hits as (
              select doc_id, w from tok
              where w in ('the', 'data', 'query', 'stream')
            ),
            tf as (select doc_id, w, count(*) as tf
                   from hits group by doc_id, w),
            dfq as (select w, count(distinct doc_id) as dfr
                    from hits group by w),
            idf as (
              select w,
                     ln(1 + (n_docs - dfr + 0.5) / (dfr + 0.5)) as idf,
                     avgdl
              from dfq, stats
            )
            select t.doc_id,
                   round(sum(i.idf * (t.tf * 2.2)
                             / (t.tf + 1.2 * (1 - 0.75
                                              + 0.75 * l.dl / i.avgdl))), 6)
                     as bm25
            from tf t
            join idf i using (w)
            join lens l using (doc_id)
            group by t.doc_id
            order by t.doc_id
        """,
        "bloom_filter_join": """
            select l.l_orderkey,
                   l.l_linenumber,
                   round(l.l_extendedprice, 2) as l_extendedprice,
                   round(o.o_totalprice, 2) as o_totalprice
            from lineitem l
            join orders o on l.l_orderkey = o.o_orderkey
            where o.o_totalprice > 400000
        """,
        "unigram_logprob": f"""
            with tok as (
              select doc_id,
                     unnest(regexp_extract_all({_NORM}, '\\S+')) as w
              from documents
            ),
            v as (select w, count(*) as c from tok group by w),
            n as (select count(*) as total from tok)
            select doc_id,
                   round(avg(log10(c::double / total)), 6)
                     as unigram_logprob
            from tok join v using (w), n
            group by doc_id
            order by doc_id
        """,
        "token_budget_mix": f"""
            with t as (
              select doc_id, source,
                     len({_TOKENS}) as n_tokens,
                     md5(cast(doc_id as varchar)) as h
              from documents
            ),
            c as (
              select doc_id, source, n_tokens,
                     cast(coalesce(sum(n_tokens) over (
                       partition by source order by h, doc_id
                       rows between unbounded preceding and 1 preceding
                     ), 0) as bigint) as cum_before,
                     500 + (cast(substr(source, 4) as int) % 5) * 250
                       as budget
              from t
            )
            select source, doc_id, n_tokens, cum_before
            from c
            where cum_before < budget
            order by source, doc_id
        """,
        "heavy_hitters": """
            with d as (
              select case when l_orderkey % 10 < 7 then 'hot'
                          else 't' || cast(l_orderkey % 997 as varchar)
                     end as route
              from lineitem
            ),
            n as (select count(*) as total from d)
            select route,
                   count(*) as cnt,
                   true as found_by_sketch
            from d, n
            group by route, total
            having count(*) > total * 0.5
            order by route
        """,
        "streaming_approx_distinct": """
            with m as (select max(ts) as mx from events)
            select ws as w_start,
                   count(distinct user_id) as exact_users,
                   count(*) as n_events,
                   true as hll_within_bound
            from (select time_bucket(interval 1 hour, ts) as ws, user_id
                  from events), m
            where ws + interval 1 hour <= mx - interval 10 minute
            group by ws
            order by ws
        """,
        "kll_quantile_groups": """
            select event_type,
                   count(*) as n,
                   true as kll_p50_within_bound,
                   true as kll_p95_within_bound
            from events
            group by event_type
            order by event_type
        """,
        "theta_set_ops": """
            with flags as (
              select user_id,
                     max(case when event_type = 'click' then 1 else 0 end) as c,
                     max(case when event_type = 'purchase' then 1 else 0 end) as p
              from events
              group by user_id
            )
            select count(case when c + p > 0 then 1 end) as exact_union,
                   count(case when c = 1 and p = 1 then 1 end) as exact_int,
                   count(case when c = 1 and p = 0 then 1 end) as exact_diff,
                   true as theta_union_within_bound,
                   true as theta_int_within_bound,
                   true as theta_diff_within_bound
            from flags
        """,
        "regression_agg": """
            select l_returnflag,
                   round(regr_slope(l_extendedprice, l_quantity), 4) as slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 4)
                     as intercept,
                   round(regr_r2(l_extendedprice, l_quantity), 6) as r2,
                   regr_count(l_extendedprice, l_quantity) as n_pairs
            from lineitem
            group by l_returnflag
            order by l_returnflag
        """,
        "mode_median_agg": """
            select o_orderpriority,
                   mode(o_orderstatus) as modal_status,
                   round(median(o_totalprice), 4) as median_price,
                   count(*) as n
            from orders
            group by o_orderpriority
            order by o_orderpriority
        """,
        "lateral_topn": """
            with bal as (
              select n_regionkey, n_name,
                     round(sum(c_acctbal), 2) as total_bal
              from nation join customer on c_nationkey = n_nationkey
              group by n_regionkey, n_name
            ),
            ranked as (
              select r_name, n_name, total_bal,
                     row_number() over (partition by r_name
                       order by total_bal desc, n_name asc) as rn
              from region join bal on r_regionkey = n_regionkey
            )
            select r_name, n_name, total_bal
            from ranked where rn <= 2
            order by r_name, total_bal desc, n_name asc
        """,
        "xml_funcs": """
            select o_orderkey,
                   o_orderkey as xml_id,
                   o_orderstatus as xml_status,
                   round(o_totalprice, 2) as xml_total
            from orders
        """,
        "streaming_outer_join": """
            with clicks as (select * from events where event_type = 'click'),
                 purch  as (select * from events
                            where event_type = 'purchase'),
                 wm as (select least((select max(ts) from clicks),
                                     (select max(ts) from purch))
                               - interval 10 minute as w)
            select l.user_id, l.event_id as l_event_id,
                   r.event_id as r_event_id, r.value as r_value
            from clicks l join purch r
              on l.user_id = r.user_id
             and r.ts >= l.ts
             and r.ts <= l.ts + interval 30 minute
            union all
            select l.user_id, l.event_id, null, null
            from clicks l, wm
            where not exists (select 1 from purch r
                              where r.user_id = l.user_id
                                and r.ts >= l.ts
                                and r.ts <= l.ts + interval 30 minute)
              and l.ts + interval 30 minute < wm.w
        """,
        "streaming_full_outer_join": """
            with clicks as (select * from events where event_type = 'click'),
                 purch  as (select * from events
                            where event_type = 'purchase'),
                 wm as (select least((select max(ts) from clicks),
                                     (select max(ts) from purch))
                               - interval 10 minute as w)
            select l.user_id, l.event_id as l_event_id,
                   r.event_id as r_event_id, r.value as r_value
            from clicks l join purch r
              on l.user_id = r.user_id
             and r.ts >= l.ts
             and r.ts <= l.ts + interval 30 minute
            union all
            select l.user_id, l.event_id, null, null
            from clicks l, wm
            where not exists (select 1 from purch r
                              where r.user_id = l.user_id
                                and r.ts >= l.ts
                                and r.ts <= l.ts + interval 30 minute)
              and l.ts + interval 30 minute < wm.w
            union all
            select r.user_id, null, r.event_id, r.value
            from purch r, wm
            where not exists (select 1 from clicks l
                              where l.user_id = r.user_id
                                and r.ts >= l.ts
                                and r.ts <= l.ts + interval 30 minute)
              and r.ts < wm.w
        """,
        "ann_range_search": """
            with t as (select cast(embedding as double[]) as q
                       from embeddings where vec_id = 0)
            select vec_id,
                   round(list_dot_product(cast(embedding as double[]), q)
                         / (sqrt(list_dot_product(cast(embedding as double[]),
                                                  cast(embedding as double[])))
                            * sqrt(list_dot_product(q, q))), 6) as cos_sim
            from embeddings, t
            where vec_id != 0
              and round(list_dot_product(cast(embedding as double[]), q)
                        / (sqrt(list_dot_product(cast(embedding as double[]),
                                                 cast(embedding as double[])))
                           * sqrt(list_dot_product(q, q))), 6) >= 0.2
            order by cos_sim desc, vec_id asc
        """,
    }
    # -- embedding near-dup family: planted perturbed copies (see
    #    _planted_embeddings) replayed as pure SQL arithmetic --
    plant = """
              select vec_id, cast(embedding as double[]) as v from embeddings
              union all
              select vec_id + 100000 as vec_id,
                     list_concat(
                       [embedding[1]::double + (vec_id % 5)::double * 0.4],
                       embedding[2:64]::double[]) as v
              from embeddings where vec_id < 20
    """

    def cos6(a: str, b: str) -> str:
        na = f"sqrt(list_dot_product({a}, {a}))"
        nb = f"sqrt(list_dot_product({b}, {b}))"
        return (
            f"round(case when {na} * {nb} > 0 then "
            f"list_dot_product({a}, {b}) / ({na} * {nb}) end, 6)"
        )

    out["dedup_embedding"] = f"""
        with allv as ({plant}),
        b as (select vec_id, v,
                     {_lsh_bucket_sql(dim=64, bits=8, seed=42, vec_expr="v")}
                       as bucket
              from allv),
        ok as (select bucket from b group by bucket
               having count(*) <= 100000),
        g as (select b.* from b join ok using (bucket)),
        p as (
          select a.vec_id as id_a, c.vec_id as id_b,
                 {cos6("a.v", "c.v")} as cos_sim
          from g a join g c on a.bucket = c.bucket and a.vec_id < c.vec_id
        )
        select id_a, id_b, cos_sim from p
        where cos_sim >= 0.75
        order by id_a, id_b
    """
    out["semdedup"] = f"""
        with allv as ({plant}),
        a as (select vec_id, v,
                     {_ivf_assign_sql(dim=64, n=8, seed=7, vec_expr="v")}
                       as cluster
              from allv),
        ok as (select cluster from a group by cluster
               having count(*) <= 1000000),
        g as (select a.* from a join ok using (cluster)),
        sh as (
          select distinct y.vec_id
          from g y join g x on x.cluster = y.cluster and x.vec_id < y.vec_id
          where {cos6("y.v", "x.v")} >= 0.75
        )
        select g.vec_id, g.cluster from g
        where g.vec_id not in (select vec_id from sh)
        order by g.vec_id
    """
    # semdedup_auto cheap branch: n<=1024 at the gate SFs so
    # k = max(8, ceil(n/128)) = 8, and the seed-11 probe histogram is
    # balanced (work/row 67 < 512) -> assignment stays on the seeds
    out["semdedup_auto"] = f"""
        with allv as ({plant}),
        a as (select vec_id, v,
                     {_ivf_assign_sql(dim=64, n=8, seed=11, vec_expr="v")}
                       as cluster
              from allv),
        ok as (select cluster from a group by cluster
               having count(*) <= 1000000),
        g as (select a.* from a join ok using (cluster)),
        sh as (
          select distinct y.vec_id
          from g y join g x on x.cluster = y.cluster and x.vec_id < y.vec_id
          where {cos6("y.v", "x.v")} >= 0.85
        )
        select g.vec_id, g.cluster from g
        where g.vec_id not in (select vec_id from sh)
        order by g.vec_id
    """
    # exact prefix-filter Jaccard join: the oracle brute-forces ALL
    # shared-token pairs (complete for J >= t > 0 — any pair above
    # threshold shares a token), which must equal the prefix-filtered
    # engine result exactly; tokenization replays normalize+bigram
    out["set_similarity_join"] = """
        with tok as (
          select distinct doc_id, t
          from (
            select doc_id,
                   unnest([w[i] || ' ' || w[i+1]
                           for i in range(1, len(w))]) as t
            from (select doc_id,
                         regexp_extract_all(
                           trim(regexp_replace(lower(text),
                                               '\\s+', ' ', 'g')),
                           '\\S+') as w
                  from documents) _
          ) _
        ),
        sizes as (select doc_id, count(*) as s from tok group by 1),
        pairs as (
          select a.doc_id as ia, b.doc_id as ib, count(*) as inter
          from tok a join tok b on a.t = b.t and a.doc_id < b.doc_id
          group by 1, 2
        ),
        j as (
          select ia as id_a, ib as id_b,
                 round(inter::double / (sa.s + sb.s - inter), 6)
                   as jaccard
          from pairs
          join sizes sa on sa.doc_id = ia
          join sizes sb on sb.doc_id = ib
        )
        select id_a, id_b, jaccard from j
        where jaccard >= 0.4 order by id_a, id_b
    """
    # Matryoshka two-stage: coarse 16-dim cosine top-40, full rerank
    # top-10 — identical slicing, rounding, and tie-breaks
    out["ann_matryoshka"] = """
        with t as (select cast(embedding as double[]) as q
                   from embeddings where vec_id = 0),
        scored as (
          select vec_id, cast(embedding as double[]) as v, q,
                 round(list_dot_product(
                         cast(embedding as double[])[1:16], q[1:16])
                       / (sqrt(list_dot_product(
                            cast(embedding as double[])[1:16],
                            cast(embedding as double[])[1:16]))
                          * sqrt(list_dot_product(q[1:16], q[1:16]))),
                       6) as coarse_sim
          from embeddings, t
        ),
        survivors as (
          select * from scored
          order by coarse_sim desc, vec_id asc limit 40
        )
        select vec_id, coarse_sim,
               round(list_dot_product(v, q)
                     / (sqrt(list_dot_product(v, v))
                        * sqrt(list_dot_product(q, q))), 6) as cos_sim
        from survivors
        order by cos_sim desc, vec_id asc limit 10
    """
    # shared daily series for the trend/forecast oracles
    _series = """
          select event_type,
                 cast(datediff('day', date '2020-01-01',
                               date_trunc('day', ts)) as double) as t,
                 cast(count(*) as double) as y
          from events group by event_type, date_trunc('day', ts)
    """
    out["theilsen_trend"] = f"""
        with s as ({_series}),
        p as (
          select a.event_type as g, a.t as t1, b.t as t2,
                 round((b.y - a.y) / (b.t - a.t), 6) as sl
          from s a join s b
            on a.event_type = b.event_type and a.t < b.t
        ),
        r as (
          select *,
                 row_number() over
                   (partition by g order by sl, t1, t2) as rn,
                 count(*) over (partition by g) as n
          from p
        ),
        m as (
          select g, max(n) as n_pairs, round(avg(sl), 6) as ts_slope
          from r
          where rn = (n + 1) // 2 or rn = (n + 2) // 2
          group by g
        ),
        pts as (select event_type, count(*) as n_points
                from s group by 1)
        select pts.event_type, cast(n_points as bigint) as n_points,
               cast(m.n_pairs as bigint) as n_pairs, m.ts_slope
        from pts left join m on m.g = pts.event_type
        order by pts.event_type
    """
    # Holt linear: EXACT integer micro-unit recurrence (alpha=1/2,
    # beta=3/10 as rationals, floor-quantized per step) — per-step
    # 6dp float rounding is NOT engine-replayable (midpoint ties);
    # the [level, trend] bigint list accumulator replays the
    # identical floor(num/q) arithmetic
    _hl = "cast(floor((1*e[1] + 1*(acc[1]+acc[2])) / 2.0) as bigint)"
    out["holt_linear"] = f"""
        with s as ({_series}),
        arr as (
          select event_type,
                 -- tie-break on the ROUNDED micro value: Spark's
                 -- struct sort compares (t, y_micro), not raw y
                 list(cast(round(y * 1000000) as bigint)
                      order by t,
                               cast(round(y * 1000000) as bigint))
                   as ys,
                 count(*) as n
          from s group by event_type
        ),
        f as (
          select event_type, n,
                 case when n >= 2 then
                   list_reduce(
                     list_prepend(
                       [ys[1], ys[2] - ys[1]]::bigint[],
                       list_transform(ys[2:], x -> [x])),
                     (acc, e) -> [
                       {_hl},
                       cast(floor((3*({_hl} - acc[1])
                                   + 7*acc[2]) / 10.0) as bigint)
                     ])
                 end as st
          from arr
        )
        select event_type, cast(n as bigint) as n_points,
               st[1] / 1000000.0 as level,
               st[2] / 1000000.0 as trend,
               case when n >= 2
                    then (st[1] + 7*st[2]) / 1000000.0 end as forecast
        from f order by event_type
    """
    # MMR greedy unrolled: 3 selection steps as CTEs; maxsim is the
    # running greatest of 6dp-rounded cosines; 1-lambda is the Python
    # double 1.0-0.7
    _ml, _m1l = repr(0.7), repr(1.0 - 0.7)

    def _mcos(a: str, b: str) -> str:
        den = (
            f"(sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))"
        )
        return (
            f"round(case when {den} > 0 then "
            f"list_dot_product({a}, {b}) / {den} else 0.0 end, 6)"
        )

    out["mmr_rerank"] = f"""
        with emb as (select vec_id, cast(embedding as double[]) as v
                     from embeddings),
        q as (select vec_id as query_id, v as qv from emb
              where vec_id < 3),
        pool as (
          select e.vec_id % 3 as query_id, e.vec_id, e.v,
                 {_mcos("e.v", "q.qv")} as rel
          from emb e join q on e.vec_id % 3 = q.query_id
          where e.vec_id >= 3
        ),
        s1 as (
          select query_id, vec_id, v, round({_ml}*rel, 6) as score
          from pool
          qualify row_number() over (partition by query_id
            order by round({_ml}*rel, 6) desc, vec_id asc) = 1
        ),
        p2 as (
          select p.query_id, p.vec_id, p.v, p.rel,
                 {_mcos("p.v", "s1.v")} as msim
          from pool p join s1 using (query_id)
          where p.vec_id <> s1.vec_id
        ),
        s2 as (
          select query_id, vec_id, v, msim,
                 round({_ml}*rel - {_m1l}*msim, 6) as score
          from p2
          qualify row_number() over (partition by query_id
            order by round({_ml}*rel - {_m1l}*msim, 6) desc,
                     vec_id asc) = 1
        ),
        p3 as (
          select p2.query_id, p2.vec_id, p2.rel,
                 greatest(p2.msim, {_mcos("p2.v", "s2.v")}) as msim
          from p2 join s2 using (query_id)
          where p2.vec_id <> s2.vec_id
        ),
        s3 as (
          select query_id, vec_id,
                 round({_ml}*rel - {_m1l}*msim, 6) as score
          from p3
          qualify row_number() over (partition by query_id
            order by round({_ml}*rel - {_m1l}*msim, 6) desc,
                     vec_id asc) = 1
        )
        select query_id, 1 as rank, vec_id, score as mmr_score from s1
        union all
        select query_id, 2, vec_id, score from s2
        union all
        select query_id, 3, vec_id, score from s3
        order by query_id, rank
    """
    # mSPRT always-valid p: decimal moments, 6dp delta/V literals,
    # the deterministic exp replayed textually, convergence clamp
    # y < -64 -> 0 mirrored
    from etl_orders_to_bq_spark.operators.multitest import _det_exp_sql

    _msp_exp = _det_exp_sql("yv")
    out["msprt"] = f"""
        with a as (
          select cast(count(*) as bigint) as n_a,
                 round(cast(sum(cast(value as decimal(18,2)))
                            as double) / count(*), 6) as m0_a,
                 round(cast(sum(cast(value as decimal(18,2))
                                * cast(value as decimal(18,2)))
                            as double) / count(*), 6) as m2_a
          from events
          where event_type = 'click' and value is not null
        ),
        b as (
          select cast(count(*) as bigint) as n_b,
                 round(cast(sum(cast(value as decimal(18,2)))
                            as double) / count(*), 6) as m0_b,
                 round(cast(sum(cast(value as decimal(18,2))
                                * cast(value as decimal(18,2)))
                            as double) / count(*), 6) as m2_b
          from events
          where event_type = 'error' and value is not null
        ),
        s as (
          select n_a, n_b, m0_a, m0_b,
                 m2_a - m0_a * m0_a as var_a,
                 m2_b - m0_b * m0_b as var_b
          from a, b
        ),
        d as (
          select n_a, n_b, round(m0_a - m0_b, 6) as delta,
                 case when n_a > 0 and n_b > 0
                           and var_a >= 0 and var_b >= 0
                      then var_a / n_a + var_b / n_b
                 end as vfull
          from s
        ),
        yc as (
          select *, round(vfull, 6) as v_n,
                 case when vfull > 0 then
                   -(delta * delta * 1.0)
                   / (2.0 * vfull * (vfull + 1.0)) end as yv
          from d
        ),
        pc as (
          select *, case when yv is not null then
                   case when yv < -64.0 then 0.0
                        else round(least(1.0,
                               sqrt((vfull + 1.0) / vfull)
                               * {_msp_exp}), 6)
                   end end as p_always_valid
          from yc
        )
        select 'click' as group_a, 'error' as group_b,
               n_a, n_b, delta, v_n, p_always_valid,
               case when p_always_valid is not null
                    then p_always_valid < 0.05 end as reject
        from pc
    """
    # TWAP: lead() to the next same-(type, day) observation, integer
    # seconds, decimal-exact weighted sum, one rounded division
    out["twap"] = """
        with base as (
          select event_type, ts, value,
                 date_trunc('day', ts) as day,
                 lead(ts) over (partition by event_type,
                                date_trunc('day', ts)
                                order by ts, value) as nxt
          from events where value is not null
        ),
        w as (
          select event_type, day,
                 cast(value as decimal(18,2)) as v,
                 date_diff('second', ts,
                           coalesce(nxt, day + interval 1 day)) as secs
          from base
        ),
        agg as (
          select event_type, day,
                 cast(count(*) as bigint) as n_events,
                 cast(sum(secs) as bigint) as tw,
                 sum(v * secs) as tvw
          from w group by 1, 2
        )
        select event_type, day, n_events,
               case when tw > 0
                    then round(cast(tvw as double) / tw, 6)
               end as twap
        from agg order by event_type, day
    """
    # Fano factor of daily counts: exact integer moments
    out["dispersion_index"] = """
        with daily as (
          select event_type, date_trunc('day', ts) as d,
                 count(*) as c
          from events group by 1, 2
        ),
        mom as (
          select event_type, cast(count(*) as bigint) as n_days,
                 round(cast(sum(c) as double) / count(*), 6)
                   as mean_daily,
                 round(cast(sum(c * c) as double) / count(*), 6)
                   as m2
          from daily group by 1
        )
        select event_type, n_days, mean_daily,
               case when mean_daily > 0 then
                 round((m2 - mean_daily * mean_daily) / mean_daily, 6)
               end as fano,
               case when mean_daily > 0 then
                 round((m2 - mean_daily * mean_daily) / mean_daily, 6)
                 > 1.0
               end as overdispersed
        from mom order by event_type
    """
    # decision stump: full Gini gain curve from cumulative integer
    # counts (window cumulative is fine in an oracle — semantics, not
    # plan), identical rounding and smallest-threshold ties
    out["gini_stump"] = """
        with vc as (
          select cast(n_chars as double) as v, count(*) as n,
                 sum(case when lang = 'en' then 1 else 0 end) as p
          from documents
          where n_chars is not null and lang is not null
          group by 1
        ),
        cum as (
          select v, n, p,
                 coalesce(sum(n) over (order by v
                   rows between unbounded preceding
                   and 1 preceding), 0) as bn,
                 coalesce(sum(p) over (order by v
                   rows between unbounded preceding
                   and 1 preceding), 0) as bp,
                 sum(n) over () as tn, sum(p) over () as tp
          from vc
        ),
        g as (
          select v,
                 cast(bn + n as double) as nl,
                 cast(bp + p as double) as pl,
                 cast(tn as double) - cast(bn + n as double) as nr,
                 cast(tp as double) - cast(bp + p as double) as pr,
                 cast(tn as double) as tnd, cast(tp as double) as tpd
          from cum
        ),
        k as (
          select v, nl, nr, pl, pr,
                 round(1.0 - (tpd/tnd)*(tpd/tnd)
                           - ((tnd-tpd)/tnd)*((tnd-tpd)/tnd), 6)
                   as parent,
                 round((nl * (1.0 - (pl/nl)*(pl/nl)
                              - ((nl-pl)/nl)*((nl-pl)/nl))
                        + nr * (1.0 - (pr/nr)*(pr/nr)
                                - ((nr-pr)/nr)*((nr-pr)/nr)))
                       / tnd, 6) as weighted
          from g where nr > 0
        ),
        best as (
          select v as threshold,
                 round(parent - weighted, 6) as gain,
                 cast(nl as bigint) as n_left,
                 cast(nr as bigint) as n_right,
                 cast(pl as bigint) as pos_left,
                 cast(pr as bigint) as pos_right,
                 parent as parent_gini
          from k
          order by round(parent - weighted, 6) desc, v asc
          limit 1
        )
        -- one-row anchor LEFT JOIN mirrors the engine's groupless agg:
        -- an empty gain curve (single distinct value / empty input)
        -- yields one all-NULL row, not zero rows
        select b.threshold, b.gain, b.n_left, b.n_right,
               b.pos_left, b.pos_right, b.parent_gini
        from (select 1 as __one) a left join best b on true
    """
    # changepoint localizer: division-cleared CUSUM argmax on exact
    # decimal integers; ROWS frame spelled out (DuckDB's ordered-sum
    # default is RANGE, which merges ties)
    out["changepoint"] = f"""
        with s as ({_series}),
        c as (
          select event_type, t,
                 cast(round(y * 1000000) as decimal(38,0)) as ymu
          from s
        ),
        cum as (
          select event_type, t, ymu,
                 sum(ymu) over (partition by event_type
                                order by t, ymu
                                rows between unbounded preceding
                                and current row) as sk,
                 row_number() over (partition by event_type
                                    order by t, ymu) as k,
                 count(*) over (partition by event_type) as n,
                 sum(ymu) over (partition by event_type) as tot
          from c
        ),
        cand as (
          select *,
                 abs(n::decimal(38,0) * sk
                     - k::decimal(38,0) * tot) as d
          from cum where k < n
        ),
        best as (
          select event_type, k, t, sk, n, tot
          from cand
          qualify row_number() over (partition by event_type
            order by d desc, k asc) = 1
        ),
        pts as (select event_type,
                       cast(count(*) as bigint) as n_points
                from c group by 1),
        rep as (
          select pts.event_type, n_points,
                 case when n_points >= 2
                      then cast(k as bigint) end as cp_k,
                 case when n_points >= 2 then t end as cp_t,
                 case when n_points >= 2 then
                   round(cast(sk as double) / (k * 1000000.0), 6)
                 end as left_mean,
                 case when n_points >= 2 then
                   round(cast(tot - sk as double)
                         / ((n - k) * 1000000.0), 6)
                 end as right_mean
          from pts left join best using (event_type)
        )
        select *, round(right_mean - left_mean, 6) as shift
        from rep order by event_type
    """
    # Holt-Winters: bigint[9] accumulator [l, b, s0..s6] folded with
    # the identical floor-quantized rational arithmetic; l' is
    # textually inlined where referenced (same expression -> same
    # value). alpha=1/2, beta=gamma=3/10.
    _hw_l = (
        "cast(floor((1*(e[1] - acc[e[2] + 3])"
        " + 1*(acc[1] + acc[2])) / 2.0) as bigint)"
    )
    out["holt_winters"] = f"""
        with s as ({_series}),
        -- positive-mod the season slot exactly like the engine's pmod
        -- (DuckDB % is sign-of-dividend; a fixture with t before the
        -- epoch origin would otherwise index slot <= 0 -> NULL and
        -- sort with a different tie-break)
        sj as (select event_type, t, y,
                      (((cast(t as int) % 7) + 7) % 7)::bigint as j
               from s),
        arr as (
          select event_type,
                 -- tie-break on (rounded micro, j) — the Spark struct
                 -- sort order, not raw y
                 list([cast(round(y * 1000000) as bigint), j]
                      order by t,
                               cast(round(y * 1000000) as bigint),
                               j) as es,
                 cast(count(*) as bigint) as n
          from sj group by event_type
        ),
        pre as (
          select event_type, n, es,
                 list_reduce(
                   list_prepend(0::bigint,
                                list_transform(es[1:7], e -> e[1])),
                   (a, x) -> a + x) as sum1,
                 list_reduce(
                   list_prepend(0::bigint,
                                list_transform(es[8:14], e -> e[1])),
                   (a, x) -> a + x) as sum2
          from arr
        ),
        ini as (
          select event_type, n, es,
                 cast(floor(sum1 / 7.0) as bigint) as l0,
                 cast(floor((sum2 - sum1) / 49.0) as bigint) as b0
          from pre
        ),
        s0 as (
          select event_type, n, es, l0, b0,
                 list_reduce(
                   list_prepend([0,0,0,0,0,0,0]::bigint[], es[1:7]),
                   (acc, e) -> [case when k = e[2] + 1
                                     then e[1] - l0
                                     else acc[k] end
                                for k in range(1, 8)]) as sv
          from ini
        ),
        f as (
          select event_type, n, es,
                 list_reduce(
                   list_prepend(([l0, b0] || sv)::bigint[], es[8:]),
                   (acc, e) -> [
                     {_hw_l},
                     cast(floor((3*({_hw_l} - acc[1])
                                 + 7*acc[2]) / 10.0) as bigint)
                   ] || [case when k = e[2] + 3 then
                           cast(floor((3*(e[1] - {_hw_l})
                                       + 7*acc[e[2] + 3]) / 10.0)
                                as bigint)
                         else acc[k] end
                         for k in range(3, 10)]) as st
          from s0
        )
        select event_type, n as n_points,
               case when n >= 14 then st[1] / 1000000.0 end as level,
               case when n >= 14 then st[2] / 1000000.0 end as trend,
               case when n >= 14 then
                 (st[1] + st[2]
                  + st[((es[len(es)][2] + 1) % 7 + 3)::int])
                 / 1000000.0
               end as forecast
        from f order by event_type
    """
    # windowFunnel: the chain-start fold replayed with a bigint-list
    # accumulator; elements are [epoch_us, step] pairs sorted (t, k)
    _wf_win = 6 * 3600 * 1_000_000
    out["window_funnel"] = f"""
        with ev as (
          select user_id, epoch_us(ts) as t,
                 case event_type when 'view' then 0
                                 when 'click' then 1
                                 when 'purchase' then 2 end as k
          from events
          where event_type in ('view', 'click', 'purchase')
            and ts is not null
        ),
        arr as (
          select user_id,
                 list([t, k]::bigint[] order by t, k) as es,
                 cast(count(*) as bigint) as n_step_events
          from ev group by user_id
        ),
        f as (
          select user_id, n_step_events,
                 list_reduce(
                   list_prepend([-1, -1, -1]::bigint[], es),
                   (acc, e) -> [
                     case when e[2] = 0 then e[1] else acc[1] end,
                     case when e[2] = 1 and acc[1] <> -1
                               and e[1] - acc[1] <= {_wf_win}
                          then acc[1] else acc[2] end,
                     case when e[2] = 2 and acc[2] <> -1
                               and e[1] - acc[2] <= {_wf_win}
                          then acc[2] else acc[3] end
                   ]
                 ) as st
          from arr
        )
        select user_id, n_step_events,
               cast(case when st[3] <> -1 then 3
                         when st[2] <> -1 then 2
                         when st[1] <> -1 then 1
                         else 0 end as int) as funnel_level
        from f order by user_id
    """
    # BPE training loop: 3 unrolled rounds (pair counts -> argmax with
    # (n desc, a, b) ties -> greedy left-to-right merge fold), the
    # kmeans_lloyd unroll discipline. The merge fold replays
    # lm._apply_bpe_merge with a varchar[] list_reduce accumulator.
    def _bpe_pairs(sym_cte: str) -> str:
        return f"""
          select u.p.a as a, u.p.b as b,
                 cast(sum(n_word) as bigint) as n
          from {sym_cte},
               unnest([{{'a': s[i], 'b': s[i + 1]}}
                       for i in range(1, len(s))]) as u(p)
          group by 1, 2
        """

    def _bpe_merge_round(prev: str, m: str) -> str:
        return f"""
          select n_word,
                 list_reduce(
                   list_prepend([]::varchar[],
                                list_transform(s, x -> [x])),
                   (acc, e) -> case
                     when len(acc) > 0
                          and acc[len(acc)] = {m}.sym_a
                          and e[1] = {m}.sym_b
                     then list_concat(acc[1:len(acc) - 1],
                                      [{m}.sym_a || {m}.sym_b])
                     else list_append(acc, e[1]) end
                 ) as s
          from {prev}, {m}
        """

    _bpe_rounds = []
    for _r in range(1, 4):
        _bpe_rounds.append(f""",
        p{_r} as ({_bpe_pairs(f"s{_r - 1}")}),
        m{_r} as (
          select a as sym_a, b as sym_b, n as n_pair
          from p{_r} order by n desc, a, b limit 1
        ),
        s{_r} as ({_bpe_merge_round(f"s{_r - 1}", f"m{_r}")})""")
    out["bpe_merges"] = f"""
        with toks as (
          select unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        wc as (select w, count(*) as n_word from toks group by w),
        s0 as (
          select n_word,
                 [case when i = length(w) then substr(w, i, 1) || '</w>'
                       else substr(w, i, 1) end
                  for i in range(1, length(w) + 1)] as s
          from wc
        ){"".join(_bpe_rounds)}
        select 1 as merge_rank, sym_a, sym_b, n_pair from m1
        union all
        select 2, sym_a, sym_b, n_pair from m2
        union all
        select 3, sym_a, sym_b, n_pair from m3
        order by merge_rank
    """
    # rarity-weighted Jaccard: integer micro-weights floor(1e6/df),
    # exact long weight sums, one rounded division
    out["rarity_weighted_jaccard"] = """
        with w as (
          select doc_id,
                 regexp_extract_all(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   '\\S+') as ws
          from documents
        ),
        tok as (
          select distinct doc_id, ws[i] || ' ' || ws[i+1] as t
          from w, unnest(generate_series(1, len(ws) - 1)) as g(i)
        ),
        wt as (
          select t, cast(floor(1000000 / count(*)) as bigint) as wv
          from tok group by t
        ),
        tw as (select doc_id, tok.t, wv from tok join wt using (t)),
        dw as (select doc_id, sum(wv) as dwv from tw group by 1),
        iw as (
          select a.doc_id as ia, b.doc_id as ib, sum(a.wv) as iwv
          from tw a join tw b on a.t = b.t and a.doc_id < b.doc_id
          group by 1, 2
        ),
        j as (
          select ia as id_a, ib as id_b,
                 round(cast(iwv as double)
                       / (da.dwv + db.dwv - iwv), 6) as w_jaccard
          from iw
          join dw da on da.doc_id = ia
          join dw db on db.doc_id = ib
        )
        select id_a, id_b, w_jaccard from j
        where w_jaccard >= 0.2 order by id_a, id_b
    """
    # semdedup over LEARNED centroids: the kmeans_lloyd unroll (2
    # rounds over the planted set, byte-identical init literals,
    # 6dp-snapped means, first-max-index argmax) produces c2; the
    # final assignment + shadow rule then mirror the semdedup oracle
    from etl_orders_to_bq_spark.operators.ann import (
        _hyperplanes as _hp_for_oracle,
    )

    _sk_cents = _hp_for_oracle(64, 8, seed=7)
    _sk_c0 = ", ".join(
        f"({j}, [" + ", ".join(repr(x) for x in c) + "]::DOUBLE[])"
        for j, c in enumerate(_sk_cents)
    )
    _sk_avg = (
        "[" + ", ".join(f"round(avg(v[{i + 1}]), 6)" for i in range(64)) + "]"
    )
    _sk_rounds = []
    for _r in range(2):
        _sk_rounds.append(f""",
        a{_r} as materialized (
          select vec_id, v,
                 list_position(s, list_aggregate(s, 'max')) - 1 as cluster
          from (
            select vec_id, v,
                   (select list(2.0 * list_dot_product(e2.v, c.vec)
                                - list_dot_product(c.vec, c.vec)
                          order by c.cluster)
                    from c{_r} c) as s
            from allv e2
          )
        ),
        m{_r} as materialized (
          select cluster, {_sk_avg} as vec from a{_r} group by cluster
        ),
        c{_r + 1} as materialized (
          select c.cluster, coalesce(m.vec, c.vec) as vec
          from c{_r} c left join m{_r} m using (cluster)
        )""")
    out["semdedup_kmeans"] = f"""
        with allv as materialized ({plant}),
        c0 as materialized (
          select * from (values {_sk_c0}) t(cluster, vec)
        ){"".join(_sk_rounds)},
        a as materialized (
          select vec_id, v,
                 list_position(s, list_aggregate(s, 'max')) - 1 as cluster
          from (
            select vec_id, v,
                   (select list(2.0 * list_dot_product(e2.v, c.vec)
                                - list_dot_product(c.vec, c.vec)
                          order by c.cluster)
                    from c2 c) as s
            from allv e2
          )
        ),
        ok as (select cluster from a group by cluster
               having count(*) <= 1000000),
        g as (select a.* from a join ok using (cluster)),
        sh as (
          select distinct y.vec_id
          from g y join g x on x.cluster = y.cluster and x.vec_id < y.vec_id
          where {cos6("y.v", "x.v")} >= 0.75
        )
        select g.vec_id, g.cluster from g
        where g.vec_id not in (select vec_id from sh)
        order by g.vec_id
    """
    out["span_dedup"] = """
        with base as (
          select doc_id, text from documents
          union all
          select doc_id + 200000 as doc_id, text
          from documents where doc_id < 10
        ),
        t as (select doc_id, regexp_extract_all(text, '\\S+') as toks
              from base),
        sized as (select doc_id, toks,
                         cast(ceil(len(toks) / 20.0) as int) as nsp
                  from t where len(toks) > 0),
        spans as (
          select doc_id, u.i - 1 as span_idx,
                 array_to_string(
                   toks[(u.i-1)*20 + 1 : (u.i-1)*20 + 20], ' ') as span_text
          from sized,
               lateral (select unnest(range(1, 1 + greatest(nsp, 1))) as i) u
        ),
        k as (
          select doc_id, span_idx, span_text,
                 row_number() over (partition by md5(span_text)
                                    order by doc_id, span_idx) as rn
          from spans
        ),
        rebuilt as (
          select doc_id, count(*) as n_kept,
                 string_agg(span_text, ' ' order by span_idx) as dedup_text
          from k where rn = 1 group by doc_id
        ),
        totals as (select doc_id, count(*) as n_spans
                   from spans group by doc_id)
        select t.doc_id, t.n_spans,
               coalesce(r.n_kept, 0) as n_kept,
               coalesce(r.dedup_text, '') as dedup_text
        from totals t left join rebuilt r using (doc_id)
        order by t.doc_id
    """
    _rrf_q = _ivf_fixed_setup()[1]
    _rrf_qlit = "[" + ", ".join(repr(float(x)) for x in _rrf_q) + "]::DOUBLE[]"
    _rrf_qnorm = 0.0
    for _x in _rrf_q:
        _rrf_qnorm += float(_x) * float(_x)
    _rrf_qnorm = math.sqrt(_rrf_qnorm)
    out["rrf_fusion"] = f"""
        with tok as (
          select doc_id,
                 unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        lens as (select doc_id, count(*) as dl from tok group by doc_id),
        stats as (select count(*) as n_docs, avg(dl) as avgdl from lens),
        hits as (
          select doc_id, w from tok
          where w in ('the', 'data', 'query', 'stream')
        ),
        tf as (select doc_id, w, count(*) as tf
               from hits group by doc_id, w),
        dfq as (select w, count(distinct doc_id) as dfr
                from hits group by w),
        idf as (
          select w,
                 ln(1 + (n_docs - dfr + 0.5) / (dfr + 0.5)) as idf,
                 avgdl
          from dfq, stats
        ),
        bm25 as (
          select t.doc_id,
                 round(sum(i.idf * (t.tf * 2.2)
                           / (t.tf + 1.2 * (1 - 0.75
                                            + 0.75 * l.dl / i.avgdl))), 6)
                   as s
          from tf t
          join idf i using (w)
          join lens l using (doc_id)
          group by t.doc_id
        ),
        lex as (
          select doc_id,
                 row_number() over (order by round(s, 6) desc, doc_id) as rank
          from bm25
        ),
        cosd as (
          select vec_id as doc_id,
                 round(list_dot_product(cast(embedding as double[]),
                                        {_rrf_qlit})
                       / (sqrt(list_dot_product(cast(embedding as double[]),
                                                cast(embedding as double[])))
                          * {_rrf_qnorm!r}), 6) as s
          from embeddings
        ),
        semtop as (
          select doc_id, s,
                 row_number() over (order by s desc, doc_id) as rank
          from cosd
        ),
        sem as (
          select doc_id,
                 row_number() over (order by round(s, 6) desc, doc_id) as rank
          from (select doc_id, s from semtop where rank <= 50)
        ),
        unioned as (
          select doc_id, rank from lex where rank <= 50
          union all
          select doc_id, rank from sem where rank <= 50
        )
        select doc_id, count(*) as n_lists,
               round(sum(1.0 / (60 + rank)), 6) as rrf_score
        from unioned
        group by doc_id
        order by rrf_score desc, doc_id
        limit 20
    """
    out["pmi_bigrams"] = f"""
        with tok as (
          select regexp_extract_all({_NORM}, '\\S+') as ts
          from documents
        ),
        uni as (select unnest(ts) as w from tok),
        uc as (select w, count(*) as cw from uni group by w),
        t as (select count(*) as tt from uni),
        bi as (
          select ts[u.i] as w1, ts[u.i + 1] as w2
          from tok,
               lateral (select unnest(range(1, greatest(len(ts), 1))) as i) u
          where len(ts) > 1
        ),
        bc as (
          select w1, w2, count(*) as n_pair
          from bi group by w1, w2
          having count(*) >= 5
        ),
        b as (select count(*) as bt from bi)
        select w1, w2, n_pair,
               round(log10(n_pair / b.bt)
                     - log10(c1.cw / t.tt)
                     - log10(c2.cw / t.tt), 6) as pmi
        from bc
        join uc c1 on bc.w1 = c1.w
        join uc c2 on bc.w2 = c2.w, t, b
        order by pmi desc, w1, w2
        limit 20
    """
    out["bpe_pair_counts"] = f"""
        with toks as (
          select unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        wc as (select w, count(*) as n_word from toks group by w),
        syms as (
          select n_word,
                 [case when i = length(w) then substr(w, i, 1) || '</w>'
                       else substr(w, i, 1) end
                  for i in range(1, length(w) + 1)] as s
          from wc
        ),
        pairs as (
          select n_word, u.p as p
          from syms,
               unnest([{{'a': s[i], 'b': s[i + 1]}}
                       for i in range(1, len(s))]) as u(p)
        )
        select p.a as sym_a, p.b as sym_b,
               cast(sum(n_word) as bigint) as n_pair
        from pairs
        group by 1, 2
        order by n_pair desc, sym_a, sym_b
        limit 20
    """
    out["reconciliation"] = """
        with lt as (
          select l_orderkey, round(sum(l_extendedprice), 2) as line_total
          from lineitem group by 1
        ),
        j as (
          select o.o_orderkey, o.o_totalprice, lt.l_orderkey, lt.line_total,
                 round(lt.line_total - o.o_totalprice, 2) as diff
          from orders o
          full outer join lt on o.o_orderkey = lt.l_orderkey
        )
        select case when o_orderkey is null then 'orphaned_lines'
                    when l_orderkey is null then 'childless_header'
                    when abs(diff) <= 0.01 then 'match'
                    when diff > 0 then 'detail_higher'
                    else 'header_higher' end as status,
               count(*) as n_orders,
               round(sum(coalesce(abs(diff), 0.0)), 2) as abs_discrepancy
        from j
        group by 1
        order by status
    """
    out["funnel_latency"] = """
        with conv as (
          select event_id, user_id, ts from events
          where event_type = 'purchase'
        ),
        clk as (
          select user_id, ts from events where event_type = 'click'
        ),
        paired as (
          select c.event_id,
                 (epoch_us(c.ts) - max(epoch_us(k.ts))) / 60000000.0 as lat
          from conv c
          join clk k on k.user_id = c.user_id and k.ts <= c.ts
          group by c.event_id, c.ts
        )
        select count(*) as n_pairs,
               round(quantile_cont(lat, 0.5), 6) as p50_min,
               round(quantile_cont(lat, 0.9), 6) as p90_min,
               round(quantile_cont(lat, 0.99), 6) as p99_min
        from paired
    """
    out["psi_drift"] = """
        with med as (select median(epoch_us(ts)) as m from events),
        c as (
          select cast(least(floor(value / 50.0), 9) as int) as bucket,
                 sum(case when epoch_us(ts) <= m then 1 else 0 end) as n_a,
                 sum(case when epoch_us(ts) <= m then 0 else 1 end) as n_b
          from events, med
          group by 1
        ),
        fb as (
          select s.bucket, coalesce(c.n_a, 0) as n_a,
                 coalesce(c.n_b, 0) as n_b
          from (select unnest(range(0, 10)) as bucket) s
          left join c on c.bucket = s.bucket
        ),
        t as (select sum(n_a) as ta, sum(n_b) as tb from fb)
        select cast(bucket as int) as bucket,
               cast(n_a as bigint) as n_a, cast(n_b as bigint) as n_b,
               round(((n_b / cast(tb as double) + 1e-6)
                      - (n_a / cast(ta as double) + 1e-6))
                     * ln((n_b / cast(tb as double) + 1e-6)
                          / (n_a / cast(ta as double) + 1e-6)), 8)
                 as psi_term
        from fb, t
        order by bucket
    """
    out["k_anonymity"] = """
        with q as (
          select c.c_mktsegment, c.c_nationkey, year(o.o_orderdate) as yr
          from orders o join customer c on o.o_custkey = c.c_custkey
        ),
        classes as (
          select c_mktsegment, c_nationkey, yr, count(*) as class_size
          from q group by 1, 2, 3
        )
        select class_size, count(*) as n_classes,
               max(class_size) < 5 as at_risk
        from classes
        group by class_size
        order by class_size
    """
    out["source_entropy"] = f"""
        with toks as (
          select source, unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        per_sw as (
          select source, w, count(*) as c from toks group by 1, 2
        ),
        totals as (select source, sum(c) as t from per_sw group by 1)
        select source,
               cast(max(t) as bigint) as n_tokens,
               count(*) as vocab,
               round(-sum((c / cast(t as double))
                          * log2(c / cast(t as double))), 6)
                 as entropy_bits
        from per_sw join totals using (source)
        group by source
        order by source
    """
    out["powerlaw_alpha"] = """
        with base as (
          select l_orderkey % 1000 as a, l_partkey % 1000 as b
          from lineitem where l_orderkey % 1000 <> l_partkey % 1000
        ),
        und as (select a, b from base union select b, a from base),
        deg as (select a, count(*) as d from und group by a),
        dm as (select min(d) as dmin from deg)
        select count(*) as n_nodes,
               cast(max(dmin) as bigint) as d_min,
               round(1.0 + count(*)
                     / sum(ln(d / (dmin - 0.5))), 6) as alpha
        from deg, dm
    """
    out["kmeans_lloyd"] = _lloyd_oracle_sql(dim=64, k=8, seed=7, rounds=3)
    out["seasonality_profile"] = """
        with daily as (
          select cast(ts as date) as day, count(*) as n
          from events group by 1
        ),
        wdm as (
          select dayofweek(day) + 1 as weekday, avg(n) as wd_mean
          from daily group by 1
        ),
        j as (
          select day, dayofweek(day) + 1 as weekday, n, wd_mean,
                 n - wd_mean as residual
          from daily join wdm on wdm.weekday = dayofweek(day) + 1
        ),
        st as (select stddev_samp(residual) as rsd from j)
        select day, cast(weekday as int) as weekday, n,
               round(wd_mean, 4) as wd_mean,
               round(residual, 4) as residual,
               abs(residual) > 2.0 * rsd as anomaly
        from j, st
        order by day
    """
    out["pareto_share"] = """
        with rev as (
          select o_custkey, sum(o_totalprice) as rev
          from orders group by 1
        ),
        j as (
          select c.c_nationkey, r.o_custkey, r.rev
          from rev r join customer c on r.o_custkey = c.c_custkey
        ),
        ranked as (
          select c_nationkey,
                 row_number() over (partition by c_nationkey
                                    order by rev desc, o_custkey) as rk,
                 sum(rev) over (partition by c_nationkey
                                order by rev desc, o_custkey
                                rows between unbounded preceding
                                         and current row)
                   / sum(rev) over (partition by c_nationkey)
                   as cum_share,
                 count(*) over (partition by c_nationkey) as n_cust
          from j
        )
        select c_nationkey,
               cast(min(rk) as bigint) as top_customers,
               cast(max(n_cust) as bigint) as n_customers,
               round(min(rk) / cast(max(n_cust) as double), 6)
                 as pareto_fraction
        from ranked
        where cum_share >= 0.8
        group by c_nationkey
        order by c_nationkey
    """
    out["sql_udf"] = """
        select l_returnflag,
               round(sum(l_extendedprice * (1.0 - l_discount)
                         * (1.0 + l_tax)), 2) as total_charge,
               count(*) as n
        from lineitem
        group by l_returnflag
        order by l_returnflag
    """
    out["sql_pipe"] = """
        select o_orderpriority, year(o_orderdate) as yr,
               count(*) as n, round(sum(o_totalprice), 2) as revenue
        from orders
        where o_orderstatus = 'F'
        group by 1, 2
        having count(*) > 10
        order by o_orderpriority, yr
    """
    out["cusum_drift"] = """
        with daily as (
          select event_type, cast(ts as date) as day, count(*) as n
          from events group by 1, 2
        ),
        stats as (
          select event_type, avg(n) as mu, stddev_samp(n) as sd
          from daily group by 1
        ),
        s1 as (
          select d.event_type, d.day, d.n, s.mu, s.sd,
                 sum(d.n - s.mu - 0.5 * s.sd) over (
                   partition by d.event_type order by d.day
                   rows between unbounded preceding and current row) as s
          from daily d join stats s using (event_type)
        )
        select event_type, day, n,
               round(s - least(0.0, min(s) over (
                 partition by event_type order by day
                 rows between unbounded preceding and current row)), 4)
                 as cusum_pos,
               (s - least(0.0, min(s) over (
                 partition by event_type order by day
                 rows between unbounded preceding and current row)))
                 > 4.0 * sd as drift
        from s1
        order by event_type, day
    """
    out["wilson_ci"] = """
        with conv as (
          select distinct o_custkey from orders
          where o_orderpriority = '1-URGENT'
        ),
        agg as (
          select c_mktsegment,
                 count(*) as n,
                 cast(sum(case when conv.o_custkey is not null
                          then 1 else 0 end) as bigint) as x
          from customer
          left join conv on conv.o_custkey = c_custkey
          group by 1
        )
        select c_mktsegment, n, x,
               round(x / cast(n as double), 6) as rate,
               round(((x / cast(n as double))
                      + 1.959964 * 1.959964 / (2.0 * n)
                      - 1.959964 * sqrt((x / cast(n as double))
                          * (1.0 - x / cast(n as double)) / n
                          + 1.959964 * 1.959964 / (4.0 * n * n)))
                     / (1.0 + 1.959964 * 1.959964 / n), 6) as ci_lo,
               round(((x / cast(n as double))
                      + 1.959964 * 1.959964 / (2.0 * n)
                      + 1.959964 * sqrt((x / cast(n as double))
                          * (1.0 - x / cast(n as double)) / n
                          + 1.959964 * 1.959964 / (4.0 * n * n)))
                     / (1.0 + 1.959964 * 1.959964 / n), 6) as ci_hi
        from agg
        order by c_mktsegment
    """
    out["readability"] = """
        with t as (
          select doc_id,
                 regexp_extract_all(lower(text), '\\S+') as toks,
                 len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                 s -> trim(s) != '')) as n_sentences
          from documents
        ),
        m as (
          select doc_id,
                 len(toks) as n_words,
                 n_sentences,
                 cast(coalesce(list_sum(list_transform(toks,
                      x -> greatest(len(regexp_extract_all(x, '[aeiouy]+')),
                                    1))), 0) as int) as n_syllables
          from t
        )
        select doc_id, n_words, n_sentences, n_syllables,
               round(206.835
                     - 1.015 * (n_words
                                / cast(greatest(n_sentences, 1) as double))
                     - 84.6 * (n_syllables
                               / cast(greatest(n_words, 1) as double)),
                     4) as flesch
        from m
        where n_words > 0
        order by doc_id
    """
    out["survival_curve"] = """
        with su as (
          select user_id, min(ts) as s_ts from events
          where event_type = 'signup' group by 1
        ),
        pu as (
          select user_id as p_uid, ts as p_ts from events
          where event_type = 'purchase'
        ),
        oe as (select max(ts) as end_ts from events),
        fp as (
          select su.user_id, su.s_ts, min(p_ts) as first_p
          from su
          left join pu on su.user_id = pu.p_uid and pu.p_ts >= su.s_ts
          group by 1, 2
        ),
        durs as (
          select case when first_p is not null
                      then epoch_us(first_p) - epoch_us(s_ts)
                      else epoch_us(end_ts) - epoch_us(s_ts) end as dur,
                 case when first_p is not null then 1 else 0 end as event
          from fp, oe
        ),
        nt as (select count(*) as n_total from durs),
        per_t as (
          select dur, sum(event) as d, count(*) as c
          from durs group by 1
        ),
        ranked as (
          select dur, d,
                 n_total - coalesce(sum(c) over (order by dur
                   rows between unbounded preceding and 1 preceding), 0)
                   as n_risk
          from per_t, nt
        )
        select round(dur / 60000000.0, 2) as t_minutes,
               cast(d as bigint) as d,
               cast(n_risk as bigint) as n_risk,
               round(case when max(case when d >= n_risk then 1 else 0 end)
                          over cum = 1 then 0.0
                     else exp(sum(ln(nullif(
                            1.0 - d / cast(n_risk as double), 0.0)))
                          over cum) end, 6) as survival
        from ranked
        where d > 0
        window cum as (order by dur rows between unbounded preceding
                       and current row)
        order by t_minutes
    """
    out["benford_digits"] = """
        with obs as (
          select cast(floor(o_totalprice
                      / pow(10.0, floor(log10(o_totalprice)))) as int)
                   as digit,
                 count(*) as n
          from orders group by 1
        ),
        c as (
          select s.digit, coalesce(obs.n, 0) as n
          from (select unnest(range(1, 10)) as digit) s
          left join obs on obs.digit = s.digit
        ),
        t as (select sum(n) as t from c)
        select digit, n,
               round(n / cast(t as double), 6) as obs_p,
               round(log10(1.0 + 1.0 / digit), 6) as benford_p,
               round((n - t * log10(1.0 + 1.0 / digit))
                     * (n - t * log10(1.0 + 1.0 / digit))
                     / (t * log10(1.0 + 1.0 / digit)), 6) as chi2_term
        from c, t
        order by digit
    """
    out["kcore"] = _kcore_oracle_sql(k=93, rounds=10)
    out["source_overlap"] = """
        with sf as (
          select distinct source, fp from (
            select 'pool' || cast(doc_id % 4 as varchar) as source,
                   md5(text) as fp
            from documents
            union all
            select 'pool' || cast((doc_id + 1) % 4 as varchar), md5(text)
            from documents where doc_id % 3 = 0
          )
        ),
        sizes as (select source, count(*) as n from sf group by 1),
        inter as (
          select a.source as src_a, b.source as src_b, count(*) as n_common
          from sf a join sf b on a.fp = b.fp and a.source < b.source
          group by 1, 2
        )
        select src_a, src_b, n_common,
               round(n_common
                     / cast(na.n + nb.n - n_common as double), 6) as jaccard
        from inter
        join sizes na on na.source = src_a
        join sizes nb on nb.source = src_b
        order by src_a, src_b
    """
    out["event_transitions"] = """
        with t as (
          select event_type as from_type,
                 lead(event_type) over (partition by user_id
                                        order by ts, event_id) as to_type
          from events
        ),
        c as (
          select from_type, to_type, count(*) as n
          from t where to_type is not null
          group by 1, 2
        ),
        tot as (select from_type, sum(n) as tot from c group by 1)
        select c.from_type, c.to_type, c.n,
               round(c.n / cast(tot.tot as double), 6) as p
        from c join tot using (from_type)
        order by from_type, to_type
    """
    out["survivorship"] = """
        with recs as (
          select c_custkey,
                 c_name,
                 case when c_custkey % 3 = 0 then null
                      else c_acctbal end as c_acctbal,
                 1 as pri
          from customer
          union all
          select c_custkey, null, round(c_acctbal + 5.0, 2), 2
          from customer where c_custkey % 2 = 0
          union all
          select c_custkey, 'S3-' || c_name, null, 3
          from customer where c_custkey % 5 = 0
        )
        select c_custkey,
               max_by(c_name,
                      case when c_name is not null then 1 else 0 end * 10
                      + pri) as c_name,
               max_by(c_acctbal,
                      case when c_acctbal is not null then 1 else 0 end * 10
                      + pri) as c_acctbal,
               count(*) as n_merged
        from recs
        group by c_custkey
        order by c_custkey
    """
    out["snapshot_diff"] = """
        with c as (select c_custkey, c_name, c_acctbal from customer),
        old as (select * from c where c_custkey % 11 <> 3),
        new as (
          select c_custkey, c_name,
                 case when c_custkey % 10 = 0
                      then round(c_acctbal + 10.0, 2)
                      else c_acctbal end as c_acctbal
          from c where c_custkey % 13 <> 5
        )
        select coalesce(n.c_custkey, o.c_custkey) as c_custkey,
               case when o.c_custkey is not null and n.c_custkey is not null
                    then 'U'
                    when n.c_custkey is not null then 'I'
                    else 'D' end as op,
               n.c_name as c_name, n.c_acctbal as c_acctbal
        from old o
        full outer join new n on o.c_custkey = n.c_custkey
        where o.c_custkey is null or n.c_custkey is null
           or (o.c_acctbal is distinct from n.c_acctbal
               or o.c_name is distinct from n.c_name)
        order by c_custkey
    """
    out["url_funcs"] = """
        with u as (
          select doc_id,
                 'https://' || source || '.example.com/docs/'
                 || cast(doc_id as varchar) || '?lang=' || lang
                 || '&q=a%20b%2Bc' as url
          from documents
        ),
        parsed as (
          select doc_id,
                 regexp_extract(url, '^https://([^/]+)/', 1) as host,
                 regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) as path,
                 regexp_extract(url, '[?&]lang=([^&]*)', 1) as qlang,
                 replace(replace(regexp_extract(url, '[?&]q=([^&]*)', 1),
                                 '%20', ' '), '%2B', '+') as q
          from u
        )
        select host, qlang, q, count(*) as n_docs, min(doc_id) as min_doc
        from parsed
        group by 1, 2, 3
        order by host, qlang
    """
    out["interval_merge"] = """
        with iv as (
          select o_custkey, o_orderdate as s,
                 o_orderdate + interval 30 day as e
          from orders
        ),
        m as (
          select o_custkey, s, e,
                 max(e) over (partition by o_custkey order by s, e
                              rows between unbounded preceding
                                       and 1 preceding) as pm
          from iv
        ),
        fl as (
          select o_custkey, s, e,
                 case when pm is null or s > pm then 1 else 0 end as nw
          from m
        ),
        isl as (
          select o_custkey, s, e,
                 sum(nw) over (partition by o_custkey order by s, e
                               rows between unbounded preceding
                                        and current row) as island
          from fl
        )
        select o_custkey, min(s) as island_start, max(e) as island_end,
               count(*) as n_merged
        from isl
        group by o_custkey, island
        order by o_custkey, island_start
    """
    out["skipgram_pairs"] = f"""
        with toked as (
          select regexp_extract_all({_NORM}, '\\S+') as ts from documents
        ),
        pairs as (
          select u.p as p
          from toked, unnest(flatten(
            [[{{'c': ts[i], 'x': ts[j]}}
              for j in range(greatest(1, i - 2), least(len(ts), i + 2) + 1)
              if j != i]
             for i in range(1, len(ts) + 1)]
          )) as u(p)
        )
        select p.c as center, p.x as context, count(*) as n_pair
        from pairs
        group by 1, 2
        order by n_pair desc, center, context
        limit 20
    """
    out["shortest_paths"] = """
        with recursive e as (
          select distinct a, b from (
            select l_orderkey % 300 as a, l_partkey % 300 as b from lineitem
            union all
            select l_partkey % 300, l_orderkey % 300 from lineitem
          ) where a <> b
        ),
        bfs as (
          select cast(0 as bigint) as node, 0 as d
          union
          select e.b, bfs.d + 1
          from bfs join e on e.a = bfs.node
          where bfs.d < 10
        )
        select node, cast(min(d) as int) as distance
        from bfs group by node order by node
    """
    out["attribution"] = """
        with conv as (
          select event_id, user_id, ts from events
          where event_type = 'purchase'
        ),
        touch as (
          select user_id, ts, event_type, event_id from events
          where event_type in ('click', 'view')
        )
        select c.event_id as conv_id, c.user_id,
               min_by(t.event_id, k.sk) as first_touch_id,
               min_by(t.event_type, k.sk) as first_touch_type,
               max_by(t.event_id, k.sk) as last_touch_id,
               max_by(t.event_type, k.sk) as last_touch_type
        from conv c
        left join touch t on c.user_id = t.user_id and t.ts <= c.ts,
        lateral (select strftime(t.ts, '%Y-%m-%d %H:%M:%S.%f')
                        || '|' || lpad(cast(t.event_id as varchar), 12, '0')
                 as sk) k
        group by 1, 2
        order by conv_id
    """
    out["mad_outliers"] = """
        with med as (
          select event_type, median(value) as med
          from events group by 1
        ),
        j as (
          select event_id, e.event_type, value, med
          from events e join med using (event_type)
        ),
        mad as (
          select event_type, median(abs(value - med)) as mad
          from j group by 1
        ),
        scored as (
          select event_id, j.event_type, value,
                 round(abs(value - med) / (1.4826 * mad), 6) as robust_z
          from j join mad using (event_type)
          where mad > 0
        )
        select * from scored where robust_z > 3.0 order by event_id
    """
    out["geo_radius_join"] = """
        with c as (
          select c_custkey,
                 (('0x' || substr(md5(cast(c_custkey as varchar)), 1, 8))::bigint
                  % 20000) / 1000.0 + 40.0 as clat,
                 (('0x' || substr(md5(cast(c_custkey as varchar)), 9, 8))::bigint
                  % 40000) / 1000.0 - 10.0 as clon
          from customer
        ),
        s as (
          select s_suppkey,
                 (('0x' || substr(md5(cast(s_suppkey as varchar)), 1, 8))::bigint
                  % 20000) / 1000.0 + 40.0 as slat,
                 (('0x' || substr(md5(cast(s_suppkey as varchar)), 9, 8))::bigint
                  % 40000) / 1000.0 - 10.0 as slon
          from supplier
        ),
        pairs as (
          select c_custkey, s_suppkey,
                 round(2.0 * 6371.0088 * asin(sqrt(
                     sin(radians(slat - clat) / 2) * sin(radians(slat - clat) / 2)
                   + cos(radians(clat)) * cos(radians(slat))
                   * sin(radians(slon - clon) / 2) * sin(radians(slon - clon) / 2)
                 )), 6) as dist_km
          from c, s
        )
        select c_custkey, s_suppkey, dist_km
        from pairs
        where dist_km <= 100.0
        order by c_custkey, s_suppkey
    """
    out["triangle_count"] = """
        with e0 as (
          select distinct
                 least(l_orderkey % 300, l_partkey % 300) as a,
                 greatest(l_orderkey % 300, l_partkey % 300) as b
          from lineitem
          where l_orderkey % 300 != l_partkey % 300
        ),
        tri as (
          select e1.a as x, e1.b as y, e2.b as z
          from e0 e1
          join e0 e2 on e1.b = e2.a
          join e0 e3 on e3.a = e1.a and e3.b = e2.b
        ),
        nodes as (
          select x as node from tri
          union all select y from tri
          union all select z from tri
        )
        select node, count(*) as n_triangles
        from nodes group by node
        order by n_triangles desc, node
        limit 10
    """
    _er_wf = "[" + ", ".join(f"'{w}'" for w in _ER_FIRST) + "]"
    _er_wl = "[" + ", ".join(f"'{w}'" for w in _ER_LAST) + "]"
    out["entity_resolution"] = f"""
        with recursive w as (select {_er_wf} as wf, {_er_wl} as wl),
        base as (
          select c_custkey as ent_id,
                 wf[(c_custkey % 17) + 1] || ' ' ||
                 wl[((c_custkey * 7) % 13) + 1] as name
          from customer, w
        ),
        ents as (
          select ent_id, name from base
          union all
          select ent_id + 10000, substr(name, 1, length(name) - 1)
          from base where ent_id < 30
          union all
          select ent_id + 20000, name || 'zz'
          from base where ent_id < 15
        ),
        reps as (
          -- exact-collapse BEFORE the closure, mirroring the operator:
          -- identical names are one node. This is also what keeps the
          -- recursive CTE sound — the entity-level closure ran over a
          -- same-name-clique graph (~1M edges at sf0.1) and duckdb
          -- 1.0's recursion returned PHANTOM reachability there
          -- (entity 55 "reached" a distance-15 name class with zero
          -- bridging pairs; correct at sf0.01's graph size). 266
          -- name-level nodes / 45 edges closes correctly and ~50x
          -- faster.
          select min(ent_id) as rep_id, name from ents group by name
        ),
        pairs as (
          -- the operator's (first char, length-bucket neighborhood)
          -- blocking is symmetric when both orderings are probed, so
          -- one symmetric condition reproduces it
          select a.rep_id as id_a, b.rep_id as id_b
          from reps a join reps b on a.rep_id < b.rep_id
          where substr(regexp_replace(lower(a.name), '[^a-z0-9]', '', 'g'), 1, 1)
                = substr(regexp_replace(lower(b.name), '[^a-z0-9]', '', 'g'), 1, 1)
            and floor(length(b.name) / 5)
                between floor(length(a.name) / 5) - 1
                    and floor(length(a.name) / 5) + 1
            and levenshtein(a.name, b.name) <= 2
        ),
        edges as (
          select id_a as a, id_b as b from pairs
          union
          select id_b as a, id_a as b from pairs
        ),
        reach as (
          select a, a as b from edges
          union
          select a, b from edges
          union
          select r.a, e.b
          from reach r join edges e on r.b = e.a
        ),
        comp as (select a as rep_id, min(b) as component
                 from reach group by a)
        select e.ent_id, e.name,
               coalesce(c.component, r.rep_id) as canonical_id
        from ents e
        join reps r using (name)
        left join comp c using (rep_id)
        order by e.ent_id
    """
    out["streaming_merge_upsert"] = """
        with last as (
          select user_id, event_id as seq, round(value, 6) as value,
                 event_type,
                 row_number() over (partition by user_id
                                    order by event_id desc) as rn
          from events
        )
        select user_id, seq, value
        from last
        where rn = 1 and event_type != 'purchase'
        order by user_id
    """
    out["importance_weights"] = f"""
        with tok as (
          select doc_id, source = 'src0' as in_t,
                 unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        v as (select w, count(*) as c_all,
                     count(case when in_t then 1 end) as c_t
              from tok group by w),
        k as (select count(*) as vv, sum(c_all) as tot_all,
                     sum(c_t) as tot_t
              from v)
        select doc_id,
               -- fold over the SORTED per-token ratios, mirroring the
               -- operator: a shuffle-order avg() can flip a 6dp
               -- rounding boundary between runs/engines (r5 flake).
               -- `+ 0.0` normalizes IEEE -0.0 (duckdb's round keeps
               -- the sign of zero; Spark's does not)
               round(list_reduce(
                       list_sort(list(log10((c_t + 1.0) / (tot_t + vv))
                                      - log10((c_all + 1.0) / (tot_all + vv)))),
                       (a, b) -> a + b) / count(*), 6) + 0.0
                 as log_ratio
        from tok join v using (w), k
        group by doc_id
        order by doc_id
    """
    # fastText-style hashed linear scorer: the seeded stand-in weights
    # are inlined as literals (the lloyd-centroid discipline) and the
    # md5-bucket hash replays exactly; empty docs rejoin at
    # sigmoid(bias)
    from etl_orders_to_bq_spark.operators.classifier import seeded_weights

    _qc_w = ", ".join(
        f"({i}, {w!r})" for i, w in enumerate(seeded_weights(256, seed=17))
    )
    out["quality_classifier"] = f"""
        with w as (select * from (values {_qc_w}) t(bucket, wt)),
        tok as (
          select doc_id, regexp_extract_all({_NORM}, '\\S+') as toks
          from documents
        ),
        grams as (
          select doc_id, unnest(list_concat(
            list_transform(toks, t -> t || '|u'),
            list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i + 1] || '|b')
          )) as g
          from tok
        ),
        dots as (
          select doc_id, sum(wt) as dot
          from grams
          join w on ('0x' || substr(md5(g), 1, 8))::bigint % 256 = w.bucket
          group by doc_id
        )
        select d.doc_id,
               round(1.0 / (1.0 + exp(-(coalesce(dot, 0.0) + 0.05))), 6)
                 as score,
               round(1.0 / (1.0 + exp(-(coalesce(dot, 0.0) + 0.05))), 6)
                 >= 0.52 as keep
        from (select distinct doc_id from documents) d
        left join dots using (doc_id)
        order by d.doc_id
    """
    # Z-order layout: replay normalize_to_bits (scale, clip, floor) and
    # the 8-bit interleave (a at odd positions, b at even) in SQL bit
    # ops; same left-assoc (x-lo)/span*256 so the doubles match exactly
    _z_interleave = " | ".join(
        f"(((a >> {i}) & 1) << {2 * i + 1}) | (((b >> {i}) & 1) << {2 * i})"
        for i in range(8)
    )
    out["zorder_layout"] = f"""
        with bounds as (
          select min(o_custkey)::double as lo_c,
                 max(o_custkey)::double as hi_c,
                 min(o_totalprice)::double as lo_p,
                 max(o_totalprice)::double as hi_p
          from orders
        ),
        norm as (
          select o_custkey, o_totalprice,
                 greatest(0, least(255, floor(
                   (o_custkey::double - lo_c) / (hi_c - lo_c) * 256
                 )))::bigint as a,
                 greatest(0, least(255, floor(
                   (o_totalprice::double - lo_p) / (hi_p - lo_p) * 256
                 )))::bigint as b
          from orders, bounds
        ),
        z as (
          select o_custkey, o_totalprice,
                 ({_z_interleave}) as zkey
          from norm
        )
        select (zkey >> 12)::int as bucket,
               count(*) as n_rows,
               min(o_custkey) as min_custkey,
               max(o_custkey) as max_custkey,
               min(o_totalprice) as min_price,
               max(o_totalprice) as max_price
        from z
        group by 1
        order by 1
    """
    # LPA communities: same sparse top-3 trade graph, then the
    # deliver-count-argmax round unrolled as CTE pairs (row_number with
    # cnt desc, label asc == min_by(label, (-cnt, label)))
    _lpa_round_ctes = "".join(
        f""",
        c{r} as (
          select e.dst as id, l.label, count(*) as cnt
          from sym e join l{r - 1} l on e.src = l.id
          group by 1, 2
        ),
        l{r} as (
          select id, label from (
            select id, label,
                   row_number() over (partition by id
                                      order by cnt desc, label asc) as rn
            from c{r}) t
          where rn = 1
        )"""
        for r in range(1, 5)
    )
    out["label_propagation"] = f"""
        with vol as (
          select c.c_nationkey as src, s.s_nationkey as dst,
                 count(*) as v
          from lineitem l
          join orders o on l.l_orderkey = o.o_orderkey
          join customer c on o.o_custkey = c.c_custkey
          join supplier s on l.l_suppkey = s.s_suppkey
          where c.c_nationkey <> s.s_nationkey
          group by 1, 2
        ),
        top3 as (
          select src, dst from (
            select src, dst,
                   row_number() over (partition by src
                                      order by v desc, dst asc) as rn
            from vol) t
          where rn <= 3
        ),
        sym as (
          select src, dst from top3
          union
          select dst, src from top3
        ),
        l0 as (select distinct src as id, src as label from sym)
        {_lpa_round_ctes}
        select id as nationkey, label as community
        from l4
        order by nationkey
    """
    # interpolated-bigram LM scores: same add-one/Jelinek-Mercer
    # formula, same sorted fold; (1 - lam) is computed in Python on the
    # Spark side, so its exact double repr is inlined here
    _bl_lam, _bl_one_minus = 0.7, repr(1.0 - 0.7)
    out["bigram_logprob"] = f"""
        with tok as (
          select doc_id, regexp_extract_all({_NORM}, '\\S+') as ts
          from documents
        ),
        uni as (select unnest(ts) as w from tok),
        uc as (select w, count(*) as cw from uni group by w),
        k as (select count(*) as vv, sum(cw) as total from uc),
        big as (
          select doc_id,
                 unnest(list_transform(
                   range(1, len(ts)),
                   i -> struct_pack(w1 := ts[i], w2 := ts[i + 1])
                 )) as p
          from tok
        ),
        bigf as (select doc_id, p.w1 as w1, p.w2 as w2 from big),
        bc as (select w1, w2, count(*) as cb from bigf group by w1, w2),
        ctx as (select w1, sum(cb) as cstart from bc group by w1)
        select doc_id,
               round(list_reduce(
                 list_sort(list(log10(
                   {_bl_lam} * ((cb + 1.0) / (cstart + vv))
                   + {_bl_one_minus} * ((cw + 1.0) / (total + vv))
                 ))),
                 (a, b) -> a + b) / count(*), 6) + 0.0
                 as bigram_logprob
        from bigf
        join bc using (w1, w2)
        join ctx using (w1)
        join uc on (bigf.w2 = uc.w), k
        group by doc_id
        order by doc_id
    """
    # winsorize + robust scale: DuckDB quantile_cont matches Spark's
    # exact percentile (both type-7 linear interpolation at p*(n-1))
    out["winsorize_robust"] = """
        with stats as (
          select o_orderpriority,
                 quantile_cont(o_totalprice, 0.05) as p_lo,
                 quantile_cont(o_totalprice, 0.25) as q1,
                 quantile_cont(o_totalprice, 0.50) as med,
                 quantile_cont(o_totalprice, 0.75) as q3,
                 quantile_cont(o_totalprice, 0.95) as p_hi
          from orders
          group by 1
        )
        select o_orderkey, o_orderpriority, o_totalprice,
               least(greatest(o_totalprice, p_lo), p_hi) as wins,
               case when q3 - q1 > 0 then round(
                 (least(greatest(o_totalprice, p_lo), p_hi) - med)
                   / (q3 - q1), 6)
               else 0.0 end as robust_z
        from orders
        join stats using (o_orderpriority)
        order by o_orderkey
    """
    # Adamic-Adar: replay symmetrize/degree/wedge joins; the per-pair
    # sum folds the ASCENDING weight list from 0.0 exactly like the
    # Spark sort_array+aggregate
    out["adamic_adar"] = """
        with e0 as (
          select o_custkey % 150 as src, 1000 + o_orderkey % 97 as dst
          from orders
        ),
        sym as (
          select src as a, dst as b from e0 where src <> dst
          union
          select dst as a, src as b from e0 where src <> dst
        ),
        deg as (select a, count(*) as d from sym group by a),
        mid as (
          select s.a as z, s.b as nb, deg.d
          from sym s join deg using (a) where deg.d >= 2
        ),
        wed as (
          select l.nb as node_a, r.nb as node_b,
                 1.0 / ln(l.d::double) as w
          from mid l join mid r on l.z = r.z
          where l.nb < r.nb
        ),
        aa as (
          select node_a, node_b, count(*) as common_neighbors,
                 round(list_reduce(
                   list_prepend(0.0::double, list(w order by w)),
                   (acc, x) -> acc + x), 6) as aa_score
          from wed group by node_a, node_b
        )
        select node_a, node_b, common_neighbors, aa_score from aa
        where not exists (
          select 1 from sym
          where sym.a = aa.node_a and sym.b = aa.node_b
        )
        order by node_a, node_b
    """
    # EWMA: list_reduce is the identical left fold (seed = first
    # element, acc-first lambda) over the identically-ordered series
    out["ewma_level"] = """
        with f as (
          select user_id, ts, value from events
          where value is not null and ts is not null
        ),
        p as (
          select user_id, count(*) as n_points,
                 list(value::double order by ts, value) as vs
          from f group by user_id
        )
        select user_id, n_points,
               round(list_reduce(vs, (acc, x) -> 0.3 * x + 0.7 * acc), 6)
                 as ewma
        from p order by user_id
    """
    # quantile normalization: quantile_cont == Spark exact percentile
    # (type-7, the winsorize_robust precedent); the grid index is the
    # multiply-before-divide floor on both engines
    out["quantile_normalize"] = """
        with f as (
          select event_id, event_type, value from events
          where value is not null and event_id is not null
        ),
        garr as (
          select quantile_cont(value,
            list_transform(range(0, 101), k -> k / 100.0)) as qs
          from f
        ),
        g as (
          select k, round(qs[k + 1], 6) as gval
          from garr, (select unnest(range(0, 101)) as k) ks
        ),
        r as (
          select event_id, event_type, value,
                 row_number() over (partition by event_type
                                    order by value, event_id) as rr,
                 count(*) over (partition by event_type) as n
          from f
        ),
        m as (
          select event_id, event_type, value,
                 case when n = 1 then 50
                      else cast(floor(((rr - 1) * 100.0) / (n - 1) + 0.5)
                                as int) end as k
          from r
        )
        select event_id, event_type, value, gval as normalized
        from m join g using (k)
        order by event_id
    """
    out["ann_pq_topk"] = _pq_topk_sql()
    out["ann_ivfpq_topk"] = _ivfpq_topk_sql()
    # perceptual-hash near-dups: same signed md5-top-64 stub hash; the
    # oracle verifies ALL pairs by bit_count(xor) — exact, and equal to
    # the pigeonhole join's result for distance <= max_dist
    out["phash_neardup"] = """
        with docs2 as (
          select doc_id, text from documents
          union all
          select doc_id + 100000, text from documents where doc_id < 10
        ),
        ph as (
          select doc_id as id,
                 (('0x' || substr(md5(text), 1, 16))::ubigint::hugeint
                  - case when ('0x' || substr(md5(text), 1, 16))::ubigint
                              >= 9223372036854775808::ubigint
                         then 18446744073709551616::hugeint
                         else 0::hugeint end)::bigint as phash
          from docs2
        )
        select a.id as id_a, b.id as id_b,
               cast(bit_count(xor(a.phash, b.phash)) as int) as hamming
        from ph a join ph b on a.id < b.id
        where bit_count(xor(a.phash, b.phash)) <= 3
        order by id_a, id_b
    """
    # l-diversity census: same quasi-identifier join as k_anonymity
    # plus a count(distinct sensitive) per class
    out["l_diversity"] = """
        with q as (
          select c.c_mktsegment, c.c_nationkey,
                 extract(year from o.o_orderdate) as yr,
                 o.o_orderpriority
          from orders o join customer c on o.o_custkey = c.c_custkey
        ),
        classes as (
          select c_mktsegment, c_nationkey, yr,
                 count(*) as sz,
                 count(distinct o_orderpriority) as nsens
          from q group by 1, 2, 3
        )
        select nsens as n_sensitive,
               count(*) as n_classes,
               cast(sum(sz) as bigint) as n_rows,
               max(nsens) < 3 as at_risk
        from classes group by nsens
        order by n_sensitive
    """
    # binned KS: identical integer bin math, zero-filled cumulative
    # ECDF gap at global bins
    out["ks_drift"] = """
        with f as (
          select event_type as grp, value as v from events
          where value is not null
        ),
        st as (select min(v) as lo, max(v) as hi from f),
        binned as (
          select grp,
                 case when hi = lo then 0
                      else least(63, cast(floor((v - lo) / (hi - lo)
                                               * 64.0) as int)) end as b,
                 count(*) as c
          from f, st group by 1, 2
        ),
        gbin as (select b, sum(c) as cg from binned group by b),
        cum_all as (
          select b,
                 sum(cg) over (order by b rows between unbounded
                               preceding and current row) as cum_all,
                 sum(cg) over () as n_all
          from gbin
        ),
        groups as (select grp, sum(c) as n_g from binned group by grp),
        axis as (select * from cum_all cross join groups),
        filled as (
          select axis.grp, axis.b, axis.cum_all, axis.n_all, axis.n_g,
                 sum(coalesce(binned.c, 0)) over (
                   partition by axis.grp order by axis.b
                   rows between unbounded preceding and current row
                 ) as cum_g
          from axis left join binned
            on axis.grp = binned.grp and axis.b = binned.b
        )
        select grp as event_type,
               cast(max(n_g) as bigint) as n,
               round(max(abs(cum_g::double / n_g
                             - cum_all::double / n_all)), 6) as ks_d
        from filled group by grp
        order by event_type
    """
    # hash negative sampling: identical md5(id|rank|seed) draw over the
    # dense id-rank space with self-hit shift
    out["hash_negatives"] = """
        with ids as (select distinct doc_id from documents),
        ranked as (
          select doc_id,
                 row_number() over (order by doc_id) - 1 as rnk
          from ids
        ),
        n as (select count(*) as n from ranked),
        draws as (
          select r.doc_id, r.rnk as self, i as neg_rank,
                 ('0x' || substr(md5(r.doc_id::varchar || '|'
                                     || i::varchar || '|' || '11'),
                                 1, 8))::bigint % n.n as cand
          from ranked r, n,
               (select unnest(range(1, 6)) as i) ks
        )
        select d.doc_id as doc_id, d.neg_rank, t.doc_id as neg_id
        from (
          select doc_id, neg_rank,
                 case when cand = self then (cand + 1) % (select n from n)
                      else cand end as pick
          from draws
        ) d
        join ranked t on t.rnk = d.pick
        order by d.doc_id, d.neg_rank
    """
    # sorted-neighborhood blocking over the dirty-entity fixture:
    # rank by (name, id), join on rank+offset, Levenshtein verify
    out["sorted_neighborhood"] = f"""
        with w as (select {_er_wf} as wf, {_er_wl} as wl),
        base as (
          select c_custkey as ent_id,
                 wf[(c_custkey % 17) + 1] || ' ' ||
                 wl[((c_custkey * 7) % 13) + 1] as name
          from customer, w
        ),
        ents as (
          select ent_id, name from base
          union all
          select ent_id + 10000, substr(name, 1, length(name) - 1)
          from base where ent_id < 30
          union all
          select ent_id + 20000, name || 'zz'
          from base where ent_id < 15
        ),
        ranked as (
          select ent_id, name,
                 row_number() over (order by name, ent_id) as rnk
          from ents
        ),
        probes as (
          select ent_id as id_a, name as key_a, rnk + i as rnk,
                 i as rank_dist
          from ranked, (select unnest(range(1, 4)) as i) ks
        )
        select p.id_a, r.ent_id as id_b, p.key_a, r.name as key_b,
               p.rank_dist,
               cast(levenshtein(p.key_a, r.name) as int) as edit_dist
        from probes p join ranked r on p.rnk = r.rnk
        where levenshtein(p.key_a, r.name) <= 2
        order by id_a, id_b
    """
    # k-fold: identical md5 rank + rank % k cycle
    out["kfold_assign"] = """
        with r as (
          select doc_id, source,
                 row_number() over (
                   partition by source
                   order by md5(cast(doc_id as varchar)), doc_id
                 ) - 1 as rn
          from documents
        )
        select source, rn % 5 as fold, count(*) as n
        from r group by source, fold
        order by source, fold
    """
    # embedding drift: sorted-fold means at 6dp, dim-ordered gap fold
    out["embedding_drift"] = """
        with f as (
          select label as grp, u.i - 1 as dim,
                 embedding[u.i]::double as v
          from embeddings,
               lateral (select unnest(range(1, 1 + len(embedding))) as i) u
          where embedding is not null
        ),
        pg as (
          select grp, dim, count(*) as n,
                 round(list_reduce(
                   list_prepend(0.0::double, list(v order by v)),
                   (acc, x) -> acc + x) / count(*), 6) as m
          from f group by grp, dim
        ),
        gm as (
          select dim,
                 round(list_reduce(
                   list_prepend(0.0::double, list(v order by v)),
                   (acc, x) -> acc + x) / count(*), 6) as g
          from f group by dim
        ),
        d as (
          select pg.grp, pg.dim, pg.n,
                 round(abs(pg.m - gm.g), 6) as gap
          from pg join gm using (dim)
        )
        select grp as label,
               cast(max(n) as bigint) as n_vecs,
               round(list_reduce(
                 list_prepend(0.0::double, list(gap order by dim)),
                 (acc, x) -> acc + x), 6) as l1_drift,
               max(gap) as max_dim_drift
        from d group by grp
        order by label
    """
    # neighborhood Jaccard: same wedge replay, integer counts, one
    # rounded division
    out["neighbor_jaccard"] = """
        with e0 as (
          select o_custkey % 150 as src, 1000 + o_orderkey % 97 as dst
          from orders
        ),
        sym as (
          select src as a, dst as b from e0 where src <> dst
          union
          select dst as a, src as b from e0 where src <> dst
        ),
        deg as (select a, count(*) as d from sym group by a),
        mid as (
          select s.a as z, s.b as nb
          from sym s join deg using (a) where deg.d >= 2
        ),
        common as (
          select l.nb as node_a, r.nb as node_b, count(*) as cn
          from mid l join mid r on l.z = r.z
          where l.nb < r.nb
          group by 1, 2
        ),
        scored as (
          select c.node_a, c.node_b, c.cn as common_neighbors,
                 round(c.cn / (da.d + db.d - c.cn), 6) as jaccard
          from common c
          join deg da on da.a = c.node_a
          join deg db on db.a = c.node_b
        )
        select * from scored
        where not exists (
          select 1 from sym
          where sym.a = scored.node_a and sym.b = scored.node_b
        )
        order by node_a, node_b
    """
    # Fellegi-Sunter: log2-odds weights DERIVED from the same (m, u)
    # params q_linkage_score passes (repr of math.log2, so the oracle
    # replays bit-identical IEEE doubles — never hand-copied literals)
    _fs_mu = [(0.85, 0.1), (0.95, 0.5), (0.8, 0.15)]  # ph, bp, bk
    _fs_w = [
        (repr(math.log2(m / u)), repr(math.log2((1.0 - m) / (1.0 - u))))
        for m, u in _fs_mu
    ]
    _fs_sum = " + ".join(
        f"(case when a.{f} is not distinct from b.{f}"
        f" then {aw} else {dw} end)"
        for f, (aw, dw) in zip(("ph", "bp", "bk"), _fs_w)
    )
    out["linkage_score"] = f"""
        with c as (
          select c_custkey, c_nationkey, c_mktsegment,
                 substr(c_name, 1, 4) as ph, c_acctbal >= 0 as bp,
                 cast(floor(c_acctbal / 1000) as bigint) as bk
          from customer
        )
        select a.c_custkey as id_a, b.c_custkey as id_b,
               round({_fs_sum}, 6) as fs_score,
               round({_fs_sum}, 6) >= 2.0 as is_match
        from c a join c b
          on a.c_nationkey = b.c_nationkey
         and a.c_mktsegment = b.c_mktsegment
         and a.c_custkey < b.c_custkey
        order by id_a, id_b
    """
    # association rules: same basket construction as basket_pairs plus
    # item supports and the support/confidence/lift ratios
    out["assoc_rules"] = """
        with p as (select distinct l_orderkey, l_partkey from lineitem),
        sized as (
            select l_orderkey from p
            group by l_orderkey having count(*) between 2 and 20
        ),
        q as (select p.* from p join sized using (l_orderkey)),
        nb as (select count(*) as nb from sized),
        items as (select l_partkey, count(*) as ni from q group by 1),
        pc as (
            select a.l_partkey as part_a, b.l_partkey as part_b,
                   count(*) as n_orders
            from q a join q b
              on a.l_orderkey = b.l_orderkey
             and a.l_partkey < b.l_partkey
            group by 1, 2
        ),
        top as (
            select * from pc
            order by n_orders desc, part_a asc, part_b asc
            limit 20
        )
        select part_a, part_b, n_orders,
               round(n_orders / nb.nb, 6) as support,
               round(n_orders / ia.ni, 6) as confidence,
               round((n_orders * nb.nb) / (ia.ni * ib.ni), 6) as lift
        from top, nb
        join items ia on top.part_a = ia.l_partkey
        join items ib on top.part_b = ib.l_partkey
        order by n_orders desc, part_a, part_b
    """
    # data-card report: same fingerprint + source aggregations
    out["corpus_stats_report"] = """
        with fp as (
            select doc_id, text, lang, source, md5(text) as f
            from documents
        ),
        dups as (
            select f from fp group by f having count(*) > 1
        ),
        flagged as (
            select fp.*, case when dups.f is not null then 1 end as dup
            from fp left join dups on fp.f = dups.f
        ),
        toked as (
            select source, lang, dup,
                   case when length(trim(text)) = 0 then 0
                        else len(regexp_extract_all(trim(text), '\\S+'))
                   end as n_tokens
            from flagged
        )
        select source,
               count(*) as n_docs,
               cast(sum(n_tokens) as bigint) as total_tokens,
               round(sum(n_tokens)::double / count(*), 6) as avg_tokens,
               round(count(case when lang = 'en' then 1 end)::double
                     / count(*), 6) as en_share,
               round(count(case when dup = 1 then 1 end)::double
                     / count(*), 6) as dup_rate
        from toked group by source
        order by source
    """
    # blocking-eval harness: full signature+banding replay + the same
    # full-outer scoring join
    out["dedup_eval"] = f"""
        with docs2 as (
            select doc_id, text from documents
            union all
            select doc_id + 100000, text from documents where doc_id < 10
        ),
        sig as (
            select doc_id,
                   {_mh_sql(0)} as mh_0, {_mh_sql(1)} as mh_1,
                   {_mh_sql(2)} as mh_2, {_mh_sql(3)} as mh_3
            from docs2
        ),
        banded as (
            select doc_id, md5('0' || '|' || mh_0 || '|' || mh_1) as bk
            from sig where mh_0 is not null
            union all
            select doc_id, md5('1' || '|' || mh_2 || '|' || mh_3) as bk
            from sig where mh_0 is not null
        ),
        found as (
            select distinct l.doc_id as id_a, r.doc_id as id_b
            from banded l join banded r
              on l.bk = r.bk and l.doc_id < r.doc_id
        ),
        truth as (
            select doc_id as id_a, doc_id + 100000 as id_b
            from documents where doc_id < 10
        ),
        j as (
            select t.id_a as t_a, f.id_a as f_a
            from truth t full join found f
              on t.id_a = f.id_a and t.id_b = f.id_b
        ),
        c as (
            select
              count(case when t_a is not null and f_a is not null
                         then 1 end) as planted_found,
              count(case when t_a is not null and f_a is null
                         then 1 end) as planted_missed,
              count(case when t_a is null then 1 end) as extra_pairs
            from j
        )
        select 'minhash_4x2' as method,
               planted_found, planted_missed, extra_pairs,
               round(planted_found::double
                     / greatest(planted_found + planted_missed, 1), 6)
                 as planted_recall,
               round(planted_found::double
                     / greatest(planted_found + extra_pairs, 1), 6)
                 as candidate_precision
        from c
    """
    # Count-Min bounded-error gate: exact counts are cross-engine;
    # the sketch contract flags are pinned true
    out["countmin_check"] = """
        with routed as (
          select case when l_orderkey % 10 < 7 then 'hot'
                      else 'r' || cast(l_partkey % 997 as varchar)
                 end as route
          from lineitem
        )
        select key, exact_n,
               true as never_undercounts, true as eps_bound_ok
        from (
          select route as key, count(*) as exact_n
          from routed group by route
          qualify row_number() over (order by exact_n desc, key) <= 100
        )
        order by key
    """
    # DP count release: identical md5 uniform + inverse-CDF Laplace
    out["dp_noisy_counts"] = """
        with counts as (
          select event_type, count(*) as n from events group by 1
        ),
        noise as (
          select event_type, n,
                 ('0x' || substr(md5(coalesce(event_type, '␀')
                                     || '|' || '42'),
                                 1, 8))::bigint as h
          from counts
        )
        select event_type,
               round(n + (-2.0) * sign((h + 0.5) / 4294967296.0 - 0.5)
                     * ln(1.0 - 2.0
                           * abs((h + 0.5) / 4294967296.0 - 0.5)), 6)
                 as released
        from noise order by event_type
    """

    # -- round-7 additions --
    # repeated-span report: overlapping full windows, ranked cut
    out["repeated_ngram_spans"] = """
        with base as (
          select doc_id, text from documents
          union all
          select doc_id + 200000 as doc_id, text
          from documents where doc_id < 10
        ),
        t as (select doc_id, regexp_extract_all(text, '\\S+') as toks
              from base),
        sized as (
          select doc_id, toks,
                 cast(floor((len(toks) - 20) / 10.0) as int) + 1 as nw
          from t where len(toks) >= 20
        ),
        w as (
          select doc_id,
                 array_to_string(
                   toks[(u.i-1)*10 + 1 : (u.i-1)*10 + 20], ' ') as span_text
          from sized,
               lateral (select unnest(range(1, 1 + nw)) as i) u
        ),
        rep as (
          select span_text, count(*) as n_occurrences,
                 count(distinct doc_id) as n_docs,
                 min(doc_id) as first_doc
          from w group by span_text having count(*) >= 2
        )
        select span_text, n_occurrences, n_docs, first_doc
        from rep order by n_occurrences desc, span_text limit 100
    """
    # script census: identical Unicode classes, RE2 spelling
    out["script_profile"] = """
        with d as (
          select doc_id,
                 text || (case
                   when doc_id % 4 = 0 then ' кириллица'
                   when doc_id % 4 = 1 then ' 汉字 123'
                   when doc_id % 4 = 2 then ' mixed мир 世界'
                   else '' end) as t
          from documents
        ),
        c as (
          select doc_id, length(t) as n,
                 length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')) as latin,
                 length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) as digit,
                 length(t) - length(regexp_replace(t, '[ \\t\\n\\x0B\\f\\r]', '', 'g')) as space,
                 length(t) - length(regexp_replace(t, '\\p{Cyrillic}', '', 'g')) as cyrillic,
                 length(t) - length(regexp_replace(t, '\\p{Han}', '', 'g')) as han
          from d
        )
        select doc_id, cast(n as bigint) as n_chars,
               case when n > 0 then round(latin / n, 6) end as frac_latin,
               case when n > 0 then round(digit / n, 6) end as frac_digit,
               case when n > 0 then round(space / n, 6) end as frac_space,
               case when n > 0 then round(cyrillic / n, 6) end as frac_cyrillic,
               case when n > 0 then round(han / n, 6) end as frac_han,
               case when n > 0 then
                 round((n - latin - digit - space - cyrillic - han) / n, 6)
               end as frac_other,
               case
                 when latin >= digit and latin >= cyrillic and latin >= han
                   then 'latin'
                 when cyrillic >= digit and cyrillic >= han then 'cyrillic'
                 when han >= digit then 'han'
                 else 'digit' end as dominant_script
        from c order by doc_id
    """
    # URL canonicalization: same regex groups, same tracking filter,
    # same param sort
    _url_re = (
        "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)"
        "(?:\\?([^#]*))?.*$"
    )
    _trk_re = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"
    out["url_canonical_dedup"] = f"""
        with raw as (
          select doc_id,
                 case doc_id % 3
                   when 0 then 'HTTPS://' || source ||
                        '.Example.COM:443/docs/' ||
                        cast(cast(floor(doc_id / 3) as bigint) as varchar) ||
                        '?b=2&utm_source=feed&a=1'
                   when 1 then 'https://' || source ||
                        '.example.com/docs/' ||
                        cast(cast(floor(doc_id / 3) as bigint) as varchar) ||
                        '?a=1&fbclid=XYZ&b=2#frag'
                   else 'https://' || source ||
                        '.EXAMPLE.com/docs/' ||
                        cast(cast(floor(doc_id / 3) as bigint) as varchar) ||
                        '?b=2&a=1' end as url
          from documents
        ),
        parts as (
          select doc_id, url,
                 lower(regexp_extract(url, '{_url_re}', 1)) as scheme,
                 lower(regexp_extract(url, '{_url_re}', 2)) as host0,
                 regexp_extract(url, '{_url_re}', 3) as path,
                 regexp_extract(url, '{_url_re}', 4) as query
          from raw
        ),
        canon as (
          select doc_id, url,
                 case when scheme = '' then url else
                   scheme || '://' ||
                   (case when scheme = 'http'
                              and regexp_matches(host0, ':80$')
                         then regexp_replace(host0, ':80$', '')
                         when scheme = 'https'
                              and regexp_matches(host0, ':443$')
                         then regexp_replace(host0, ':443$', '')
                         else host0 end) ||
                   (case when path = '' then '/' else path end) ||
                   (case when len(list_filter(string_split(query, '&'),
                           p -> p <> '' and
                                not regexp_matches(p, '{_trk_re}'))) > 0
                    then '?' || array_to_string(
                           list_sort(list_filter(string_split(query, '&'),
                             p -> p <> '' and
                                  not regexp_matches(p, '{_trk_re}'))),
                           '&')
                    else '' end)
                 end as canonical_url
          from parts
        )
        select canonical_url, count(*) as n_urls,
               count(distinct url) as n_raw_forms,
               min(doc_id) as first_id
        from canon group by canonical_url order by canonical_url
    """
    # domain census: same canonicalizer macros + the PSL longest-match
    # walk over the engine's PUBLIC_SUFFIXES_MIN values; exact
    # micro-unit dup rate (floor half-away) mirrors the engine
    from etl_orders_to_bq_spark.functions.urls import (
        PUBLIC_SUFFIXES_MIN as _psl_min,
    )

    _suf_values = ", ".join(
        f"('{s}', {s.count('.') + 1})" for s in _psl_min
    )
    out["domain_census"] = f"""
        with d0 as (
          select doc_id,
                 case when doc_id % 10 < 3 then 'dup ' || source
                      else text end as text,
                 'https://' ||
                 (case when doc_id % 4 = 0
                       then 'www.' || source || '-shop.CO.UK:443'
                       when doc_id % 4 = 1
                       then source || '.Example.com'
                       when doc_id % 4 = 2
                       then 'cdn.' || source || '.github.io'
                       else source || '.internal' end) ||
                 '/p/' ||
                 cast(cast(floor(doc_id / 40) as bigint) as varchar) ||
                 (case when doc_id % 2 = 0
                       then '?b=2&utm_source=feed&a=1'
                       else '?a=1&b=2#f' end) as url
          from documents
        ),
        parts as (
          select doc_id, text,
                 lower(regexp_extract(url, '{_url_re}', 1)) as scheme,
                 lower(regexp_extract(url, '{_url_re}', 2)) as host0,
                 regexp_extract(url, '{_url_re}', 3) as path,
                 regexp_extract(url, '{_url_re}', 4) as query
          from d0
        ),
        base as (
          select doc_id,
                 scheme || '://' ||
                 (case when scheme = 'http'
                            and regexp_matches(host0, ':80$')
                       then regexp_replace(host0, ':80$', '')
                       when scheme = 'https'
                            and regexp_matches(host0, ':443$')
                       then regexp_replace(host0, ':443$', '')
                       else host0 end) ||
                 (case when path = '' then '/' else path end) ||
                 (case when len(list_filter(string_split(query, '&'),
                         p -> p <> '' and
                              not regexp_matches(p, '{_trk_re}'))) > 0
                  then '?' || array_to_string(
                         list_sort(list_filter(string_split(query, '&'),
                           p -> p <> '' and
                                not regexp_matches(p, '{_trk_re}'))),
                         '&')
                  else '' end) as canon,
                 regexp_replace(host0, ':[0-9]+$', '') as host,
                 md5(coalesce(text, chr(0) || 'null')) as fp,
                 len(regexp_extract_all({_NORM}, '\\S+')) as ntok
          from parts
        ),
        suf(sfx, sk) as (values {_suf_values}),
        hosts as (select distinct host from base),
        dom as (
          select host,
                 case when len(l) > best
                      then array_to_string(
                             l[len(l) - best : len(l)], '.')
                      else host end as domain
          from (
            select host, string_split(host, '.') as l,
                   coalesce(
                     (select max(s.sk) from suf s
                      where s.sk <= len(string_split(host, '.'))
                        and s.sfx = array_to_string(
                              (string_split(host, '.'))[
                                len(string_split(host, '.'))
                                  - s.sk + 1
                                : len(string_split(host, '.'))], '.')),
                     1) as best
            from hosts)
        )
        select dom.domain as domain,
               cast(count(*) as bigint) as n_docs,
               cast(count(distinct canon) as bigint) as n_pages,
               cast(sum(ntok) as bigint) as n_tokens,
               cast(count(*) - count(distinct fp) as bigint)
                 as n_dup_docs,
               floor((2 * (count(*) - count(distinct fp)) * 1000000
                      + count(*)) / (2.0 * count(*))) / 1000000.0
                 as dup_rate,
               cast(sum(case when ntok >= 20 then 1 else 0 end)
                    as bigint) as n_quality
        from base join dom using (host)
        group by 1 order by 1
    """
    # mojibake repair: cp1252 translate table, byte round-trip, and a
    # full strict UTF-8 DFA (overlongs + surrogates rejected — the
    # is_valid_utf8 semantics) replayed over the planted damage classes
    from etl_orders_to_bq_spark.functions.encoding import (
        CP1252_BYTE_TO_CHAR as _cp1252,
        sloppy_cp1252_mojibake as _sloppy,
    )

    def _sql_lit(s: str) -> str:
        parts: list[str] = []
        run: list[str] = []

        def _flush() -> None:
            if run:
                parts.append(
                    "'" + "".join(run).replace("'", "''") + "'"
                )
                run.clear()

        for ch in s:
            o = ord(ch)
            if o < 0x20 or 0x7F <= o <= 0xA0:
                _flush()
                parts.append(f"chr({o})")
            else:
                run.append(ch)
        _flush()
        if not parts:
            return "''"
        return (
            "(" + " || ".join(parts) + ")"
            if len(parts) > 1
            else parts[0]
        )

    _m_latin1 = (
        "caf\u00e9 cr\u00e8me \u2014 na\u00efve\u2026".encode("utf-8").decode("latin-1")
    )
    _m_1252 = _sloppy("it\u2019s \u201cfine\u201d \u2013 ok")
    _lit0 = _sql_lit(_m_latin1 + " ")
    _lit1 = _sql_lit(_m_1252 + " ")
    _lit2 = _sql_lit("d\u00e9j\u00e0 vu \u2013 caf\u00e9 ")
    _lit3 = _sql_lit("\u6c49\u5b57 mixed \u6587\u672c ")
    _lit4 = _sql_lit("broken \u00c3 lone ")
    _sig_re = "[\u00c2-\u00f4]" 
    _mapped = "text"
    for _b, _ch in _cp1252.items():
        _mapped = f"replace({_mapped}, {_sql_lit(_ch)}, chr({_b}))"
    out["mojibake_repair"] = f"""
        with d0 as (
          select doc_id,
                 case when doc_id % 7 = 0
                      then {_lit0} || source
                      when doc_id % 7 = 1
                      then {_lit1} || source
                      when doc_id % 7 = 2
                      then {_lit2} || source
                      when doc_id % 7 = 3
                      then {_lit3} || source
                      when doc_id % 7 = 4
                      then {_lit4} || source
                      else text end as text
          from documents
        ),
        tr as (select doc_id, text, {_mapped} as mapped from d0),
        b as (select doc_id, text,
                     list_transform(range(1, len(mapped) + 1),
                                    i -> unicode(substr(mapped, i, 1)))
                       as bl
              from tr),
        g as (select doc_id, text, bl,
                     coalesce(regexp_matches(text, '{_sig_re}'), false)
                       as sig,
                     len(list_filter(bl, x -> x > 255)) = 0 as mappable,
                     list_reduce(
                       list_prepend([0, 0, 0, 1],
                                    list_transform(bl, x -> [x])),
                       (acc, xe) -> case
                         when acc[4] = 0 then [0, 0, 0, 0]
                         when acc[1] > 0 then
                           (case when xe[1] >= acc[2] and xe[1] <= acc[3]
                                 then [acc[1] - 1, 128, 191, 1]
                                 else [0, 0, 0, 0] end)
                         else (case
                           when xe[1] <= 127 then [0, 0, 0, 1]
                           when xe[1] >= 194 and xe[1] <= 223
                                then [1, 128, 191, 1]
                           when xe[1] = 224 then [2, 160, 191, 1]
                           when xe[1] >= 225 and xe[1] <= 236
                                then [2, 128, 191, 1]
                           when xe[1] = 237 then [2, 128, 159, 1]
                           when xe[1] >= 238 and xe[1] <= 239
                                then [2, 128, 191, 1]
                           when xe[1] = 240 then [3, 144, 191, 1]
                           when xe[1] >= 241 and xe[1] <= 243
                                then [3, 128, 191, 1]
                           when xe[1] = 244 then [3, 128, 143, 1]
                           else [0, 0, 0, 0] end) end) as st
              from b),
        a as (select doc_id, text, bl,
                     sig and mappable and st[4] = 1 and st[1] = 0 as hit
              from g)
        select doc_id,
               coalesce(hit, false) as was_mojibake,
               case when coalesce(hit, false)
                    then decode(from_hex(array_to_string(
                           list_transform(bl,
                             x -> format('{{:02x}}', x)), '')))
                    else text end as text_fixed
        from a order by doc_id
    """
    # JL projection: the 8 seeded plane literals inlined, same dot
    from etl_orders_to_bq_spark.operators.ann import (
        _hyperplanes as _hp_jl,
    )

    import math as _math_jl

    _jl_scale = repr(float(_math_jl.sqrt(64 / 8)))
    _jl_structs = ", ".join(
        "struct_pack(c := {i}, v := round(list_dot_product(v, [{lits}]"
        "::DOUBLE[]) * {s}, 6))".format(
            i=i, lits=", ".join(repr(x) for x in p), s=_jl_scale
        )
        for i, p in enumerate(_hp_jl(64, 8, 31))
    )
    out["jl_project"] = f"""
        with b as (
          select vec_id, cast(embedding as double[]) as v
          from embeddings
        ),
        e as (
          select vec_id, unnest(list_value({_jl_structs})) as s from b
        )
        select vec_id, s.c as component, s.v as value
        from e order by vec_id, component
    """
    # vocab coverage: frequency rank + per-k covered sums, exact
    # micro-unit half-away coverage
    out["vocab_coverage"] = f"""
        with tok as (
          select unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        c as (select w, count(*) as c from tok group by w),
        r as (select w, c,
                     row_number() over (order by c desc, w) as rn
              from c),
        t as (select sum(c) as total, count(*) as v from c),
        ks(k) as (values (5), (10), (20), (40)),
        agg as (
          select ks.k as k,
                 least(cast(ks.k as bigint), (select v from t))
                   as n_types,
                 coalesce((select sum(c) from r where rn <= ks.k), 0)
                   as covered,
                 (select total from t) as total
          from ks
        )
        select k,
               cast(n_types as bigint) as n_types,
               cast(covered as bigint) as covered_tokens,
               cast(total as bigint) as total_tokens,
               floor((2 * covered * 1000000 + total) / (2.0 * total))
                 / 1000000.0 as coverage
        from agg order by k
    """
    # T5 span corruption: hash stream + the greedy no-overlap fold
    # (list-wrapped positions, acc = [next_free, s1, l1, ...]) + both
    # reassemblies; all-bigint acc, nonneg // == floor
    out["span_corrupt"] = f"""
        with recursive tok as (
          select doc_id,
                 regexp_extract_all({_NORM}, '\\S+') as ts
          from documents
        ),
        -- fully RELATIONAL replay (no list_reduce): DuckDB 1.0's
        -- vectorized list_reduce returns garbage for sporadic rows in
        -- full-size chunks (correct under a pushed-down row filter —
        -- r10 trap, one poisoned doc per ~500). The greedy no-overlap
        -- scan is a per-doc recursive CTE over candidate positions;
        -- corrupted/targets reassemble via range joins + ordered
        -- string_agg (which skips the NULL span interiors).
        pos as (
          select doc_id, u.p as p, ts[u.p] as w,
                 ('0x' || substr(md5(doc_id || ':' || u.p
                                     || ':11'), 1, 8))::bigint as h
          from tok,
               lateral (select unnest(range(1, len(ts) + 1)) as p) u
        ),
        cand as (
          select doc_id, p, (h // 100) % 5 + 1 as len_
          from pos where h % 100 < 5
        ),
        spans(doc_id, p, len_) as (
          select doc_id, p, len_ from cand
          qualify row_number() over (partition by doc_id
                                     order by p) = 1
          union all
          select c.doc_id, c.p, c.len_
          from spans s join cand c
            on c.doc_id = s.doc_id and c.p >= s.p + s.len_
          qualify row_number() over (partition by c.doc_id
                                     order by c.p) = 1
        ),
        sp2 as (
          select doc_id, p as s, len_,
                 row_number() over (partition by doc_id
                                    order by p) - 1 as k
          from spans
        ),
        cj as (
          select pos.doc_id, pos.p,
                 case when sp2.s = pos.p
                      then '<extra_id_' || sp2.k || '>'
                      when sp2.s is not null then null
                      else pos.w end as val
          from pos left join sp2
            on sp2.doc_id = pos.doc_id
           and pos.p >= sp2.s and pos.p <= sp2.s + sp2.len_ - 1
        ),
        corr as (
          select doc_id, string_agg(val, ' ' order by p) as corrupted
          from cj group by doc_id
        ),
        tg1 as (
          select sp2.doc_id, sp2.k,
                 '<extra_id_' || sp2.k || '> ' ||
                 string_agg(pos.w, ' ' order by pos.p) as t
          from sp2 join pos
            on pos.doc_id = sp2.doc_id
           and pos.p >= sp2.s and pos.p <= sp2.s + sp2.len_ - 1
          group by sp2.doc_id, sp2.k
        ),
        tg as (
          select doc_id, string_agg(t, ' ' order by k) as targets
          from tg1 group by doc_id
        ),
        nsp as (select doc_id, count(*) as ns from sp2 group by doc_id)
        select b.doc_id,
               cast(len(b.ts) as bigint) as n_tokens,
               cast(coalesce(nsp.ns, 0) as bigint) as n_spans,
               coalesce(corr.corrupted, '') as corrupted,
               coalesce(tg.targets, '') as targets
        from tok b
        left join nsp using (doc_id)
        left join corr using (doc_id)
        left join tg using (doc_id)
        order by b.doc_id
    """
    # temperature mixing: source-ordered sqrt fold (single-row
    # list_reduce, the safe ewma class), micro-rate floor, md5 keep
    out["temperature_mix"] = """
        with d as (
          select doc_id,
                 case when doc_id % 50 = 0 then 'rare'
                      else 'g' || cast(doc_id % 3 as varchar) end
                   as src
          from documents
        ),
        c as (select src, count(*) as n from d group by src),
        k as (
          select list_reduce(
                   list_prepend(0.0::double,
                     list(sqrt(cast(n as double)) order by src)),
                   (a, b) -> a + b) as sw
          from c
        ),
        r as (
          select src, n,
                 least(cast(floor(300.0 * sqrt(cast(n as double))
                                  / (select sw from k) / n
                                  * 1000000.0) as bigint),
                       1000000) as rate_micro
          from c
        ),
        j as (select d.doc_id, d.src, r.n, r.rate_micro
              from d join r using (src))
        select src as source,
               cast(max(n) as bigint) as n_docs,
               max(rate_micro) as rate_micro,
               cast(sum(case when ('0x' || substr(md5(doc_id
                        || ':ts17'), 1, 8))::bigint % 1000000
                        < rate_micro then 1 else 0 end) as bigint)
                 as n_kept
        from j group by src order by src
    """
    # MLM masking: the md5 decision integer, both branch digits and
    # the in-doc random index replayed; '0x'-prefix through ::bigint
    # (the r9 hugeint-cast trap); empty array_to_string coalesced
    _mh10 = "('0x' || substr(md5(doc_id || ':' || p || ':7'), 1, 8))::bigint"
    out["mlm_mask"] = f"""
        with tok as (
          select doc_id,
                 regexp_extract_all({_NORM}, '\\S+') as ts
          from documents
        ),
        m as (
          select doc_id, len(ts) as n,
                 list_transform(range(1, len(ts) + 1), p ->
                   case when {_mh10} % 100 < 15
                        then (case
                          when ({_mh10} // 100) % 10 <= 7 then '[MASK]'
                          when ({_mh10} // 100) % 10 = 8
                               then ts[cast(({_mh10} // 1000) % len(ts)
                                           as int) + 1]
                          else ts[p] end)
                        else ts[p] end) as masked,
                 list_filter(
                   list_transform(range(1, len(ts) + 1), p ->
                     case when {_mh10} % 100 < 15
                          then p || ':' || ts[p] else null end),
                   x -> x is not null) as labs
          from tok
        )
        select doc_id,
               cast(n as bigint) as n_tokens,
               cast(len(labs) as bigint) as n_masked,
               coalesce(array_to_string(masked, ' '), '')
                 as masked_text,
               coalesce(array_to_string(labs, ' '), '') as labels
        from m order by doc_id
    """
    # the multiline fixture CTE shared by gopher_quality and
    # c4_line_filter (hoisted — r10 review: the two copies had to be
    # hand-mirrored); empty docs coalesce to '' matching the Spark
    # fixture's empty-sequence guard
    _mlfix_cte = """
        with t0 as (
          select doc_id, regexp_extract_all(trim(text), '\\S+') as toks
          from documents
        ),
        t1 as (
          select doc_id,
                 list_transform(
                   range(0, cast(ceil(len(toks) / 8.0) as int)),
                   i -> (case when (doc_id + i) % 7 = 0
                              then '\u2022 ' else '' end)
                        || array_to_string(
                             toks[i * 8 + 1
                                  : least((i + 1) * 8, len(toks))],
                             ' ')
                        || (case when (doc_id + i) % 3 = 0 then '.'
                                 when (doc_id + i) % 11 = 0
                                 then ' javascript.'
                                 when (doc_id + i) % 5 = 0 then '...'
                                 else '' end)) as lines0
          from t0
        ),
        fix as (
          select doc_id,
                 (case when doc_id % 2 = 0
                       then 'the counts of that run have to be read '
                            || 'with care.' || chr(10)
                       else '' end) ||
                 coalesce(array_to_string(lines0, chr(10)), '') ||
                 (case when doc_id % 41 = 0
                       then chr(10) || 'lorem ipsum dolor sit amet ok.'
                       when doc_id % 43 = 0
                       then chr(10) || 'if (x) ' || chr(123)
                            || ' return x ' || chr(125) || ' done ok.'
                       else '' end) as t2
          from t1
        )"""
    # Gopher rule battery: integer cross-multiplied ratios over the
    # shared multi-line fixture CTE — zero floats, trivially bit-exact
    out["gopher_quality"] = f"""{_mlfix_cte},
        g as (
          select doc_id, t2,
                 regexp_extract_all(trim(t2), '\\S+') as words,
                 list_filter(string_split(t2, chr(10)),
                             ln -> trim(ln) <> '') as lines
          from fix
        ),
        m as (
          select doc_id,
                 len(words) as nw,
                 coalesce(list_aggregate(
                   list_transform(words, w -> len(w)), 'sum'), 0)
                   as total_chars,
                 len(regexp_extract_all(t2,
                     '(#|\\.\\.\\.|\u2026)')) as nsym,
                 greatest(len(lines), 1) as nl,
                 len(list_filter(lines, ln ->
                   regexp_matches(trim(ln),
                     '^([\u2022\u2023\u25aa-]\\s)'))) as nb,
                 len(list_filter(lines, ln ->
                   regexp_matches(ln,
                     '(\\.\\.\\.|\u2026)\\s*$'))) as ne,
                 len(list_filter(words, w ->
                   regexp_matches(w, '[A-Za-z]'))) as na,
                 len(list_distinct(regexp_extract_all(lower(t2),
                   '\\b(the|be|to|of|and|that|have|with)\\b')))
                   as ns
          from g
        )
        select doc_id,
               cast(nw as bigint) as n_words,
               nw >= 50 and nw <= 100000 as word_count_ok,
               total_chars >= 3 * nw and total_chars <= 10 * nw
                 as mean_word_len_ok,
               10 * nsym <= nw as symbol_ratio_ok,
               10 * nb <= 9 * nl as bullet_ok,
               10 * ne <= 3 * nl as ellipsis_ok,
               5 * na >= 4 * nw as alpha_ok,
               ns >= 2 as stopword_ok,
               (nw >= 50 and nw <= 100000)
                 and (total_chars >= 3 * nw and total_chars <= 10 * nw)
                 and 10 * nsym <= nw
                 and 10 * nb <= 9 * nl
                 and 10 * ne <= 3 * nl
                 and 5 * na >= 4 * nw
                 and ns >= 2 as passes
        from m order by doc_id
    """
    # C4 line rules: same fixture CTE; empty-kept array_to_string is
    # NULL in DuckDB vs '' in Spark — coalesce (r9 trap)
    out["c4_line_filter"] = f"""{_mlfix_cte},
        g as (
          select doc_id, t2,
                 list_filter(string_split(t2, chr(10)),
                             ln -> trim(ln) <> '') as lines
          from fix
        ),
        k as (
          select doc_id, t2, lines,
                 list_filter(lines, ln ->
                   regexp_matches(trim(ln), '[.!?\"]$')
                   and len(regexp_extract_all(trim(ln), '\\S+')) >= 5
                   and not regexp_matches(ln, '(?i)javascript'))
                   as kept
          from g
        )
        select doc_id,
               cast(len(lines) as bigint) as n_lines,
               cast(len(kept) as bigint) as n_kept,
               len(kept) >= 3 and not regexp_matches(t2,
                 '(?i)(lorem ipsum|' || chr(123) || ')') as page_ok,
               coalesce(array_to_string(kept, chr(10)), '') as cleaned
        from k order by doc_id
    """
    # boilerplate lines: doc-frequency census on 16-byte line hashes,
    # anti-join, order-preserving string_agg reassembly
    out["boilerplate_lines"] = f"""{_mlfix_cte},
        lx as (
          select doc_id, j - 1 as i,
                 string_split(t2, chr(10))[j] as ln
          from fix, lateral (
            select unnest(range(1, len(string_split(t2, chr(10))) + 1))
              as j)
          where trim(string_split(t2, chr(10))[j]) <> ''
        ),
        fr as (
          select md5(trim(ln)) as h, count(distinct doc_id) as dfc
          from lx group by 1
        ),
        banned as (select h from fr where dfc >= 5),
        kept as (
          select doc_id, i, ln from lx
          where md5(trim(ln)) not in (select h from banned)
        ),
        tot as (
          select f.doc_id, coalesce(c.n_lines, 0) as n_lines
          from (select distinct doc_id from fix) f
          left join (select doc_id, count(*) as n_lines
                     from lx group by 1) c using (doc_id)
        ),
        rb as (
          select doc_id, count(*) as nk,
                 string_agg(ln, chr(10) order by i) as cleaned
          from kept group by 1
        )
        select t.doc_id,
               cast(t.n_lines as bigint) as n_lines,
               cast(t.n_lines - coalesce(rb.nk, 0) as bigint)
                 as n_removed,
               coalesce(rb.cleaned, '') as cleaned
        from tot t left join rb using (doc_id)
        order by doc_id
    """
    # group split: identical md5 hash + the SAME accumulated cut
    # literals (repr'd floats, the linkage_score lesson)
    _gs_cuts = []
    _gs_acc = 0.0
    for _f in (0.8, 0.1):
        _gs_acc += _f
        _gs_cuts.append(repr(_gs_acc))
    out["group_split"] = f"""
        with assigned as (
          select o_orderkey, o_custkey,
                 (('0x' || substr(md5(cast(o_custkey as varchar)
                                      || '|' || '42'), 1, 8))::bigint
                  / 4294967296.0) as u
          from orders
        ),
        labeled as (
          select o_orderkey, o_custkey,
                 case when u < {_gs_cuts[0]} then 'train'
                      when u < {_gs_cuts[1]} then 'val'
                      else 'test' end as split
          from assigned
        ),
        per as (
          select split, count(*) as n_orders,
                 count(distinct o_custkey) as n_customers
          from labeled group by split
        ),
        tot as (
          select (select sum(n_customers) from per) as sum_c,
                 (select count(distinct o_custkey) from orders) as tot_c
        )
        select split, cast(n_orders as bigint) as n_orders,
               cast(n_customers as bigint) as n_customers,
               (select sum_c = tot_c from tot) as leakage_free
        from per order by split
    """
    # HITS: two unrolled integer rounds, max-normalized at the end
    out["hits_scores"] = """
        with e as (
          select distinct (o_custkey % 150) as a,
                 1000 + (o_orderkey % 97) as b
          from orders
        ),
        nodes as (select a as id from e union select b as id from e),
        a1 as (
          select n.id, coalesce(x.auth, 0) as auth
          from nodes n left join (
            select b as id, cast(count(*) as bigint) as auth
            from e group by b) x using (id)
        ),
        h1 as (
          select n.id, coalesce(x.hub, 0) as hub
          from nodes n left join (
            select e.a as id, cast(sum(a1.auth) as bigint) as hub
            from e join a1 on a1.id = e.b group by e.a) x using (id)
        ),
        a2 as (
          select n.id, coalesce(x.auth, 0) as auth
          from nodes n left join (
            select e.b as id, cast(sum(h1.hub) as bigint) as auth
            from e join h1 on h1.id = e.a group by e.b) x using (id)
        ),
        h2 as (
          select n.id, coalesce(x.hub, 0) as hub
          from nodes n left join (
            select e.a as id, cast(sum(a2.auth) as bigint) as hub
            from e join a2 on a2.id = e.b group by e.a) x using (id)
        ),
        mx as (
          select greatest((select max(auth) from a2), 1) as ma,
                 greatest((select max(hub) from h2), 1) as mh
        )
        select n.id,
               round(a2.auth / (select ma from mx), 6) as auth,
               round(h2.hub / (select mh from mx), 6) as hub
        from nodes n join a2 on a2.id = n.id join h2 on h2.id = n.id
        order by n.id
    """
    # bucket medoids (auto): cheap branch pinned — the seed-42 probe
    # balances at every fixture (work/row 65/65/129 vs budget 512), so
    # buckets are the argmax assignment over k = max(8, ceil(n/128))
    # seed directions. k is DATA-DEPENDENT, so the oracle replays the
    # auto-k rule exactly for every k <= 32 via the count-driven slice
    # (_ivf_assign_autok_sql — the r9 two-arm CASE false-covered
    # 1024 < n <= 1920); 6dp pair cosines, sorted-fold means
    out["diverse_sample"] = f"""
        with b as (
          select vec_id, cast(embedding as double[]) as v,
                 sqrt(list_dot_product(cast(embedding as double[]),
                                       cast(embedding as double[]))) as nrm,
                 {_ivf_assign_autok_sql(dim=64, max_k=32, seed=42)}
                   as bucket
          from embeddings
        ),
        guarded as (
          select * from b
          where bucket in (
            select bucket from b group by bucket
            having count(*) <= 100000)
        ),
        pairs as (
          select l.bucket, l.vec_id as ida,
                 case when l.nrm * r.nrm > 0
                      then round(list_dot_product(l.v, r.v)
                                 / (l.nrm * r.nrm), 6)
                      else 0.0 end as cos
          from guarded l join guarded r
            on l.bucket = r.bucket and l.vec_id <> r.vec_id
        ),
        means as (
          select bucket, ida,
                 round(list_reduce(
                         list_concat([0.0], list(cos order by cos)),
                         (a, x) -> a + x) / count(*), 6) as m
          from pairs group by bucket, ida
        ),
        best as (
          select bucket, ida, m
          from means
          qualify row_number() over (partition by bucket
                                     order by m desc, ida) = 1
        ),
        sizes as (
          select bucket, count(*) as bucket_size,
                 min(vec_id) as only_id
          from guarded group by bucket
        )
        select s.bucket, cast(s.bucket_size as bigint) as bucket_size,
               coalesce(b2.ida, s.only_id) as medoid_id,
               coalesce(b2.m, 0.0) as mean_cos
        from sizes s left join best b2 using (bucket)
        order by s.bucket
    """
    # containment: the 4-hash/2-band candidates + exact distinct-shingle
    # intersection, prefix docs planted as in the query
    out["ngram_containment"] = """
        with base as (
          select doc_id, text from documents
          union all
          select doc_id + 300000 as doc_id,
                 array_to_string(
                   (regexp_extract_all(trim(text), '\\S+'))[1:15], ' ')
                 as text
          from documents where doc_id < 10
        ),
        sig as (
          select doc_id,
                 (select list_min(list_transform([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)], s -> substr(md5(s || '|0'), 1, 8))) from (select regexp_extract_all(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\S+') as t) _) as mh_0,
                 (select list_min(list_transform([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)], s -> substr(md5(s || '|0'), 9, 8))) from (select regexp_extract_all(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\S+') as t) _) as mh_1,
                 (select list_min(list_transform([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)], s -> substr(md5(s || '|0'), 17, 8))) from (select regexp_extract_all(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\S+') as t) _) as mh_2,
                 (select list_min(list_transform([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)], s -> substr(md5(s || '|0'), 25, 8))) from (select regexp_extract_all(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\S+') as t) _) as mh_3
          from base
        ),
        banded as (
          select doc_id, md5('0' || '|' || mh_0 || '|' || mh_1) as bk
          from sig where mh_0 is not null
          union all
          select doc_id, md5('1' || '|' || mh_2 || '|' || mh_3) as bk
          from sig where mh_0 is not null
        ),
        ok_bk as (
          -- mirror the engine's max_bucket=1000 guard: oversized band
          -- buckets are dropped BEFORE pair generation (bk embeds the
          -- band index, so grouping by bk alone matches per-(band, bk))
          select bk from banded group by bk having count(*) <= 1000
        ),
        cand as (
          select distinct l.doc_id as id_a, r.doc_id as id_b
          from banded l
          join ok_bk o on l.bk = o.bk
          join banded r on l.bk = r.bk and l.doc_id < r.doc_id
        ),
        sh as (
          select doc_id,
                 (select list_distinct(list_transform([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)], s -> s)) from (select regexp_extract_all(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\S+') as t) _) as s
          from base
        )
        select c.id_a, c.id_b,
               cast(len(a.s) as int) as n_shingles_a,
               cast(len(b.s) as int) as n_shingles_b,
               cast(len(list_filter(a.s, x -> list_contains(b.s, x)))
                    as int) as n_common,
               case when len(a.s) > 0 then
                 round(len(list_filter(a.s, x -> list_contains(b.s, x)))
                       / len(a.s), 6) end as containment_a_in_b,
               case when len(b.s) > 0 then
                 round(len(list_filter(a.s, x -> list_contains(b.s, x)))
                       / len(b.s), 6) end as containment_b_in_a
        from cand c join sh a on a.doc_id = c.id_a
                    join sh b on b.doc_id = c.id_b
        order by c.id_a, c.id_b
    """
    # shard plan: rank -> floor((r-1)*k/n) -> per-shard bounds
    out["shard_plan"] = """
        with r as (
          select o_totalprice, o_orderkey,
                 row_number() over (order by o_totalprice, o_orderkey)
                   as rn,
                 count(*) over () as n
          from orders
        )
        select cast(floor((rn - 1) * 16.0 / n) as int) as shard_id,
               count(*) as n_rows,
               min(o_totalprice) as lo_o_totalprice,
               max(o_totalprice) as hi_o_totalprice,
               min(o_orderkey) as lo_o_orderkey,
               max(o_orderkey) as hi_o_orderkey
        from r group by 1 order by 1
    """


    # TF-IDF top terms: same tokenization, smooth idf, ranked cut
    out["tfidf_topterms"] = f"""
        with toks as (
          select source, doc_id,
                 unnest(regexp_extract_all({_NORM}, '\\S+')) as term
          from documents
        ),
        tf as (select source, term, count(*) as tf
               from toks group by source, term),
        dfreq as (
          select term, count(*) as df from (
            select distinct doc_id, term from toks) _ group by term
        ),
        n as (select count(distinct doc_id) as nd from documents),
        scored as (
          select tf.source, tf.term, tf.tf, dfreq.df,
                 round(tf.tf * (ln((1.0 + (select nd from n))
                                   / (1.0 + dfreq.df)) + 1.0), 6)
                   as score
          from tf join dfreq using (term)
        )
        select source, term, cast(tf as bigint) as tf,
               cast(df as bigint) as df, score
        from scored
        qualify row_number() over (partition by source
                                   order by score desc, term) <= 10
        order by source, score desc, term
    """
    # lexical census: one explode, two rollups
    out["vocab_growth"] = f"""
        with toks as (
          select source,
                 unnest(regexp_extract_all({_NORM}, '\\S+')) as term
          from documents
        ),
        per_term as (select source, term, count(*) as n
                     from toks group by source, term)
        select source,
               cast(sum(n) as bigint) as n_tokens,
               cast(count(*) as bigint) as vocab,
               cast(sum(case when n = 1 then 1 else 0 end) as bigint)
                 as hapax,
               round(sum(case when n = 1 then 1 else 0 end)
                     / count(*), 6) as hapax_frac,
               round(count(*) / sum(n), 6) as type_token_ratio
        from per_term group by source order by source
    """
    # temporal embargo split: literal date cuts, per-split census
    out["time_split_embargo"] = """
        with labeled as (
          select o_orderkey, o_orderdate,
                 case
                   when o_orderdate < date '1997-01-01'
                                      - interval 30 day then 'train'
                   when o_orderdate >= date '1997-01-01' then 'test'
                   else 'embargo' end as split
          from orders
        )
        select split, count(*) as n_orders,
               min(o_orderdate) as first_date,
               max(o_orderdate) as last_date
        from labeled group by split order by split
    """


    # Poisson bootstrap: identical inverse-CDF literals, decimal sums,
    # type-1 order statistics
    from etl_orders_to_bq_spark.operators.bootstrap import (
        _poisson1_cdf_literals,
    )

    _cdf = _poisson1_cdf_literals(8)
    _wcase = "case " + " ".join(
        f"when u < {repr(c)} then {k}" for k, c in enumerate(_cdf)
    ) + " else 8 end"
    out["bootstrap_ci"] = f"""
        with rep as (
          select o_orderpriority as grp, o_orderkey as id,
                 cast(o_totalprice as decimal(18,2)) as v, u.b
          from orders,
               lateral (select unnest(range(0, 100)) as b) u
        ),
        uni as (
          -- one md5 serves four replicates: chunk b%4 of md5(id|b//4|seed)
          select grp, b, v,
                 (('0x' || substr(md5(cast(id as varchar) || '|' ||
                                      cast(cast(floor(b / 4) as bigint)
                                           as varchar) || '|' || '42'),
                                  (b % 4) * 8 + 1, 8))::bigint
                  / 4294967296.0) as u
          from rep
        ),
        w as (select grp, b, v, {_wcase} as w from uni),
        reps as (
          select grp, b,
                 round(cast(sum(w * v) as double) / sum(w), 6) as mb
          from w group by grp, b having sum(w) > 0
        ),
        ms as (
          select grp, list(mb order by mb) as ms from reps group by grp
        ),
        base as (
          select o_orderpriority as grp,
                 count(*) as n_rows,
                 round(cast(sum(cast(o_totalprice as decimal(18,2)))
                            as double) / count(*), 6) as mean
          from orders group by 1
        )
        select base.grp as o_orderpriority,
               cast(base.n_rows as bigint) as n_rows, base.mean,
               ms.ms[greatest(cast(ceil(len(ms.ms) * 0.025) as int), 1)]
                 as ci_lo,
               ms.ms[greatest(cast(ceil(len(ms.ms) * 0.975) as int), 1)]
                 as ci_hi,
               100 as b
        from base join ms using (grp)
        order by o_orderpriority
    """
    # gap fill: per-key month spine + last-ignorenulls forward fill
    out["resample_ffill"] = """
        with monthly as (
          select o_custkey % 200 as key,
                 date_trunc('month', o_orderdate) as month,
                 cast(sum(cast(o_totalprice as decimal(18,2)))
                      as double) as revenue
          from orders group by 1, 2
        ),
        span as (
          select key, min(month) as lo, max(month) as hi
          from monthly group by key
        ),
        spine as (
          select key, unnest(generate_series(
            lo, hi, interval 1 month)) as month
          from span
        )
        select s.key, s.month,
               last_value(m.revenue ignore nulls) over (
                 partition by s.key order by s.month
                 rows between unbounded preceding and current row)
                 as revenue,
               m.revenue is not null as is_observed
        from spine s left join monthly m
          on m.key = s.key and m.month = s.month
        order by s.key, s.month
    """

    # BH-FDR: the oracle rebuilds the engine's deterministic Φ from
    # the same literals (norm_sf_sql)
    from etl_orders_to_bq_spark.operators.multitest import norm_sf_sql

    # Mann-Whitney: exact integer/decimal rank arithmetic; the window
    # cumulative is fine ORACLE-side (semantics, not plan); z and p
    # mirror the operator's fixed-order double expressions, p via the
    # shared deterministic Φ literals
    _mw_p = norm_sf_sql("abs(z)")
    out["mann_whitney"] = f"""
        with f as (
          select event_type as g, value as v from events
          where event_type in ('click', 'error') and value is not null
        ),
        vc as (
          select v,
                 sum(case when g = 'click' then 1 else 0 end) as na,
                 sum(case when g = 'error' then 1 else 0 end) as nb,
                 count(*) as nt
          from f group by v
        ),
        cum as (
          select *,
                 coalesce(sum(nt) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as below
          from vc
        ),
        agg as (
          select
            cast(sum(cast(na as decimal(38,0))
                     * cast(2 * below + nt + 1 as decimal(38,0)))
                 as decimal(38,0)) as two_ra,
            cast(sum(na) as bigint) as n_a,
            cast(sum(nb) as bigint) as n_b,
            cast(sum(cast(nt as decimal(38,0))
                     * cast(nt as decimal(38,0))
                     * cast(nt as decimal(38,0))
                     - cast(nt as decimal(38,0)))
                 as decimal(38,0)) as ties
          from cum
        ),
        s as (
          select 'click' as group_a, 'error' as group_b, n_a, n_b,
                 cast(two_ra as double) / 2.0
                   - cast(n_a as double)
                     * (cast(n_a as double) + 1.0) / 2.0 as u_stat,
                 case when n_a > 0 and n_b > 0
                       and (4.0
                            * (cast(n_a as double)
                               * cast(n_b as double) / 12.0)
                            * ((cast(n_a as double)
                                + cast(n_b as double) + 1.0)
                               - cast(ties as double)
                                 / ((cast(n_a as double)
                                     + cast(n_b as double))
                                    * (cast(n_a as double)
                                       + cast(n_b as double) - 1.0))))
                           > 0 then
                   round(
                     ((cast(two_ra as double)
                       - cast(n_a as double)
                         * (cast(n_a as double) + 1.0))
                      - cast(n_a as double) * cast(n_b as double))
                     / sqrt(4.0
                            * (cast(n_a as double)
                               * cast(n_b as double) / 12.0)
                            * ((cast(n_a as double)
                                + cast(n_b as double) + 1.0)
                               - cast(ties as double)
                                 / ((cast(n_a as double)
                                     + cast(n_b as double))
                                    * (cast(n_a as double)
                                       + cast(n_b as double) - 1.0)))),
                     6)
                 end as z
          from agg
        )
        select group_a, group_b, n_a, n_b, u_stat, z,
               case when z is not null then
                 round(least(1.0, 2.0 * {_mw_p}), 6) end as p_value
        from s
    """
    # mutual information: sorted folds over integer counts — counts
    # sorted as longs, transformed to -(c/n)log2(c/n), seedless
    # list_reduce (first element seeds; 0.0 + x == x for the
    # nonnegative terms, so it matches Spark's 0.0-seeded aggregate)
    _mi_ent = (
        "round(list_reduce(list_transform(list_sort({lst}), "
        "c -> -(cast(c as double) / cast(nn as double)) "
        "* log2(cast(c as double) / cast(nn as double))), "
        "(a, b) -> a + b), 6) + 0.0"
    )
    out["mutual_info"] = f"""
        with e as (
          select coalesce(cast(event_type as varchar), '␀') as x,
                 coalesce(cast(user_id % 7 as varchar), '␀') as y
          from events
        ),
        cells as (select x, y, count(*) as c from e group by x, y),
        t as (select sum(c) as nn from cells),
        ents as (
          select cast(nn as bigint) as n,
                 {_mi_ent.format(lst="(select list(c) from (select x, sum(c) as c from cells group by x))")} as h_x,
                 {_mi_ent.format(lst="(select list(c) from (select y, sum(c) as c from cells group by y))")} as h_y,
                 {_mi_ent.format(lst="(select list(c) from cells)")} as h_xy
          from t
        ),
        mi as (
          select *, round(h_x + h_y - h_xy, 6) as mi_bits from ents
        )
        select n, h_x, h_y, h_xy, mi_bits,
               case when h_x + h_y > 0
                    then round(2.0 * mi_bits / (h_x + h_y), 6)
                    else 0.0 end as nmi
        from mi
    """
    # ACF: decimal-exact daily sums and sufficient statistics, each
    # cast to double ONCE, Pearson r in the operator's exact
    # expression order
    out["acf_lags"] = """
        with daily as (
          select cast(o_orderdate as date) as d,
                 sum(cast(o_totalprice as decimal(18,2))) as v
          from orders group by 1
        ),
        l as (select unnest(range(1, 8)) as lag),
        pairs as (
          select l.lag, a.v as x, b.v as y
          from daily a join l on true
          join daily b on b.d = a.d + l.lag * interval 1 day
        ),
        agg as (
          select lag, cast(count(*) as bigint) as n_pairs,
                 cast(count(*) as double) as n,
                 cast(sum(x) as double) as sx,
                 cast(sum(y) as double) as sy,
                 cast(sum(x * y) as double) as sxy,
                 cast(sum(x * x) as double) as sxx,
                 cast(sum(y * y) as double) as syy
          from pairs group by lag
        )
        select cast(lag as int) as lag, n_pairs,
               case when (n * sxx - sx * sx) > 0
                         and (n * syy - sy * sy) > 0
                    then round((n * sxy - sx * sy)
                               / (sqrt(n * sxx - sx * sx)
                                  * sqrt(n * syy - sy * sy)), 6)
               end as acf
        from agg order by lag
    """
    # FD audit: one grouped count-distinct per FD, integer counts,
    # one rounded division
    _fd = (
        "select '{name}' as fd, cast(count(*) as bigint) as n_lhs, "
        "cast(sum(case when k > 1 then 1 else 0 end) as bigint) "
        "as n_violating, cast(max(k) as bigint) as max_rhs_variants, "
        "round(sum(case when k > 1 then 1 else 0 end) / count(*), 6) "
        "as violation_rate from (select count(distinct {rhs}) as k "
        "from {tbl} group by {lhs})"
    )
    out["fd_violations"] = (
        "select * from ("
        + " union all ".join(
            [
                _fd.format(
                    name="nation_region",
                    tbl="nation",
                    lhs="n_nationkey",
                    rhs="n_regionkey",
                ),
                _fd.format(
                    name="cust_priority",
                    tbl="orders",
                    lhs="o_custkey",
                    rhs="o_orderpriority",
                ),
                _fd.format(
                    name="nation_segment",
                    tbl="customer",
                    lhs="c_nationkey",
                    rhs="c_mktsegment",
                ),
                _fd.format(
                    name="order_returnflag",
                    tbl="lineitem",
                    lhs="l_orderkey",
                    rhs="l_returnflag",
                ),
            ]
        )
        + ") order by fd"
    )
    # FK coverage: distinct child keys with row counts, anti-join
    # orphans, one rounded division
    _fk = (
        "select '{name}' as fk, "
        "cast((select coalesce(sum(r), 0) from k) as bigint) "
        "as n_child_rows, "
        "cast((select count(*) from k) as bigint) as n_child_keys, "
        "cast((select count(*) from o) as bigint) as n_orphan_keys, "
        "cast((select coalesce(sum(r), 0) from o) as bigint) "
        "as n_orphan_rows, "
        "case when (select coalesce(sum(r), 0) from k) > 0 then "
        "round(1.0 - (select coalesce(sum(r), 0) from o) "
        "/ (select coalesce(sum(r), 0) from k), 6) end as coverage"
    )
    _fk_body = (
        "(with k as (select {ck} as kk, count(*) as r from {child} "
        "where {ck} is not null group by 1), "
        "o as (select kk, r from k where kk not in "
        "(select {pk} from {parent} where {pk} is not null)) "
        + _fk
        + ")"
    )
    out["fk_coverage"] = (
        "select * from ("
        + " union all ".join(
            [
                _fk_body.format(
                    name="lineitem_part",
                    child="lineitem",
                    ck="l_partkey",
                    parent="part",
                    pk="p_partkey",
                ),
                _fk_body.format(
                    name="lineitem_supplier",
                    child="lineitem",
                    ck="l_suppkey",
                    parent="supplier",
                    pk="s_suppkey",
                ),
                _fk_body.format(
                    name="orders_customer",
                    child="orders",
                    ck="o_custkey",
                    parent="customer",
                    pk="c_custkey",
                ),
                _fk_body.format(
                    name="customer_active",
                    child="customer",
                    ck="c_custkey",
                    parent="events",
                    pk="user_id",
                ),
            ]
        )
        + ") order by fk"
    )
    # code-likeness: both branches rebuilt with pure string/list ops
    # (translate + substring + token membership — no Java/RE2
    # divergent classes); score from the ROUNDED ratios, the
    # operator's weight literals
    from etl_orders_to_bq_spark.functions.text import _CODE_KEYWORDS

    _kw_list = ", ".join(f"'{w}'" for w in _CODE_KEYWORDS)
    out["code_detect"] = f"""
        with twoclass as (
          select doc_id, 'prose' as kind, text from documents
          union all
          select doc_id, 'codeified' as kind,
                 'def f():' || chr(10) || '  return {{' || text
                 || '}};' || chr(10) || chr(9) || 'var x = 1;' as text
          from documents
        ),
        feat as (
          select doc_id, kind,
            cast(round(1000000.0 * (length(text)
                   - length(translate(text, '{{}}();=<>[]', '')))
                  / greatest(length(text), 1), 0) as bigint) as s6,
            cast(round(1000000.0
                  * len(list_filter(string_split(text, chr(10)),
                    l -> substring(l, 1, 2) = '  '
                         or substring(l, 1, 1) = chr(9)))
                  / greatest(len(string_split(text, chr(10))), 1), 0)
              as bigint) as i6,
            cast(round(1000000.0 * len(list_filter(
                    regexp_extract_all(lower(text), '\\S+'),
                    t -> list_contains([{_kw_list}], t)))
                  / greatest(len(regexp_extract_all(lower(text),
                                                    '\\S+')), 1), 0)
              as bigint) as k6
          from twoclass
        ),
        scored as (
          select doc_id, kind, s6, i6, k6,
                 40 * s6 + 35 * i6 + 25 * k6 as score_int
          from feat
        )
        select doc_id, kind,
               s6 / 1000000.0 as symbol_ratio,
               i6 / 1000000.0 as indent_ratio,
               k6 / 1000000.0 as keyword_ratio,
               score_int / 100000000.0 as score,
               score_int >= 25000000 as is_code
        from scored order by kind, doc_id
    """

    # Naive Bayes head: token counts from the shared normalized
    # tokenizer, single-division log arguments (pmi discipline)
    out["naive_bayes"] = f"""
        with tok as (
          select lang,
                 unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        tc as (select lang, w, count(*) as c from tok group by 1, 2),
        tot as (select lang, sum(c) as t from tc group by 1),
        v as (select count(distinct w) as v from tc),
        d as (select lang, count(*) as nd from documents group by 1),
        nall as (select count(*) as n from documents),
        ranked as (
          select *, row_number() over (partition by lang
                      order by c desc, w asc) as rk
          from tc
        )
        select r.lang, r.w as token, cast(r.c as bigint) as n,
               round(log10((r.c + 1) / cast(tot.t + v.v as double)), 6)
                 as loglik,
               round(log10(d.nd / cast(nall.n as double)), 6) as prior
        from ranked r
        join tot using (lang) join d using (lang), v, nall
        where r.rk <= 10
        order by lang, token
    """
    # modularity: exact integer e_c/d_c over the low->high distinct
    # edge set, one fixed-order double expression per community
    out["graph_modularity"] = """
        with e0 as (
          select l_orderkey % 6000 as src, l_partkey % 6000 as dst
          from lineitem
        ),
        und as (
          select distinct least(src, dst) as a, greatest(src, dst) as b
          from e0 where src <> dst
        ),
        tagged as (
          select a, b, a % 8 as ca, b % 8 as cb from und
        ),
        m as (select count(*) as m from tagged),
        ein as (
          select ca as community, count(*) as e_in
          from tagged where ca = cb group by 1
        ),
        half as (
          select a as n, ca as community from tagged
          union all
          select b as n, cb as community from tagged
        ),
        d as (
          select community, count(*) as d_tot,
                 count(distinct n) as n_nodes
          from half group by 1
        )
        select d.community,
               cast(d.n_nodes as bigint) as n_nodes,
               cast(coalesce(ein.e_in, 0) as bigint) as e_in,
               cast(d.d_tot as bigint) as d_tot,
               case when m.m > 0 then
                 round(cast(coalesce(ein.e_in, 0) as double)
                         / cast(m.m as double)
                       - (cast(d.d_tot as double)
                          / (2.0 * cast(m.m as double)))
                         * (cast(d.d_tot as double)
                            / (2.0 * cast(m.m as double))), 6)
               end as contribution
        from d left join ein using (community), m
        order by community
    """
    # reciprocity: distinct directed edges, reversed self-join count
    out["reciprocity"] = """
        with e as (
          select distinct l_orderkey % 500 as a, l_partkey % 500 as b
          from lineitem where l_orderkey % 500 <> l_partkey % 500
        ),
        t as (select count(*) as n_edges from e),
        r as (
          select count(*) as n_reciprocated
          from e x where exists (
            select 1 from e y where y.a = x.b and y.b = x.a)
        )
        select cast(t.n_edges as bigint) as n_edges,
               cast(r.n_reciprocated as bigint) as n_reciprocated,
               case when t.n_edges > 0
                    then round(r.n_reciprocated / t.n_edges, 6)
               end as reciprocity
        from t, r
    """
    # class rebalance: md5-ordered row_number per class, min-count cap
    out["class_balance"] = """
        with counts as (select lang, count(*) as n from documents
                        group by 1),
        cap as (select min(n) as cap from counts),
        ranked as (
          select lang, doc_id,
                 row_number() over (partition by lang
                   order by md5(cast(doc_id as varchar)), doc_id)
                   as pick_rank
          from documents
        )
        select lang, doc_id, cast(pick_rank as int) as pick_rank
        from ranked, cap where pick_rank <= cap
        order by lang, pick_rank
    """
    # weighted median: same exact-integer decision rule, window
    # cumulative oracle-side
    out["weighted_median"] = """
        with vc as (
          select l_extendedprice as v,
                 sum(cast(cast(l_quantity as bigint) as bigint)) as w
          from lineitem
          where l_extendedprice is not null and l_quantity is not null
          group by 1
        ),
        cum as (
          select *, coalesce(sum(w) over (order by v
                      rows between unbounded preceding
                      and 1 preceding), 0) as below
          from vc
        ),
        t as (select cast(coalesce(sum(w), 0) as bigint)
                as total_weight from vc)
        select t.total_weight,
               (select min(v) from cum, t
                where 2 * (below + w) >= t.total_weight)
                 as weighted_median
        from t
    """

    # semantic types: the CASE replays the operator's first-match
    # detector priority from the SAME pattern literals
    from etl_orders_to_bq_spark.operators.profile import (
        SEMANTIC_DETECTORS,
    )

    _sem_whens = " ".join(
        f"when regexp_matches(v, '{pat}') then '{nm}'"
        for nm, pat in SEMANTIC_DETECTORS
    )
    _sem_case = (
        f"case when v is null then 'null' {_sem_whens} else 'text' end"
    )
    _sem_branches = " union all ".join(
        f"select '{tn}' as tn, '{cn}' as cn, cast({cn} as varchar) as v "
        f"from {tn}"
        for tn, cols in [
            ("customer", ["c_custkey", "c_name", "c_mktsegment"]),
            ("events", ["props", "event_type", "user_id"]),
        ]
        for cn in cols
    )
    out["semantic_types"] = f"""
        with vals as ({_sem_branches}),
        tagged as (select tn, cn, {_sem_case} as st from vals),
        counted as (
          select tn as table_name, cn as column_name, st as sem_type,
                 count(*) as n
          from tagged group by 1, 2, 3
        ),
        tot as (select table_name, column_name, sum(n) as t
                from counted group by 1, 2)
        select c.table_name, c.column_name, c.sem_type,
               cast(n as bigint) as n, round(n / t, 6) as share
        from counted c join tot using (table_name, column_name)
        order by 1, 2, 3
    """
    # join cardinality: per-key counts, decimal(38,0) products
    _jc = (
        "(with ka as (select {lk} as k, count(*) as ca from {lt} "
        "where {lk} is not null group by 1), "
        "kb as (select {rk} as k, count(*) as cb from {rt} "
        "where {rk} is not null group by 1), "
        "s as (select count(*) as ns, "
        "coalesce(sum(cast(ca as decimal(38,0)) "
        "* cast(cb as decimal(38,0))), 0) as pr, "
        "max(cast(ca as decimal(38,0)) * cast(cb as decimal(38,0))) "
        "as mx from ka join kb using (k)) "
        "select '{name}' as join_name, "
        "cast((select count(*) from ka) as bigint) as n_keys_left, "
        "cast((select count(*) from kb) as bigint) as n_keys_right, "
        "cast(ns as bigint) as n_keys_shared, "
        "try_cast(pr as bigint) as predicted_rows, "
        "try_cast(mx as bigint) as max_key_rows, "
        "case when pr > 0 then round(cast(mx as double) "
        "/ cast(pr as double), 6) end as skew_share from s)"
    )
    out["join_cardinality"] = (
        "select * from ("
        + _jc.format(
            name="orders_lineitem",
            lt="orders",
            lk="o_orderkey",
            rt="lineitem",
            rk="l_orderkey",
        )
        + " union all "
        + _jc.format(
            name="part_lineitem",
            lt="part",
            lk="p_partkey",
            rt="lineitem",
            rk="l_partkey",
        )
        + ") order by join_name"
    )
    # cross-correlation: the acf oracle generalized to two keys and
    # negative lags
    out["xcorr_lags"] = """
        with daily as (
          select cast(ts as date) as d, event_type as k,
                 sum(cast(value as decimal(18,2))) as v
          from events where event_type in ('click', 'purchase')
          group by 1, 2
        ),
        a as (select d, v as x from daily where k = 'click'),
        b as (select d as d2, v as y from daily where k = 'purchase'),
        l as (select unnest(range(-7, 8)) as lag),
        pairs as (
          select l.lag, a.x, b.y
          from a join l on true
          join b on b.d2 = a.d + l.lag * interval 1 day
        ),
        agg as (
          select lag, cast(count(*) as bigint) as n_pairs,
                 cast(count(*) as double) as n,
                 cast(sum(x) as double) as sx,
                 cast(sum(y) as double) as sy,
                 cast(sum(x * y) as double) as sxy,
                 cast(sum(x * x) as double) as sxx,
                 cast(sum(y * y) as double) as syy
          from pairs group by lag
        )
        select cast(lag as int) as lag, n_pairs,
               case when (n * sxx - sx * sx) > 0
                         and (n * syy - sy * sy) > 0
                    then round((n * sxy - sx * sy)
                               / (sqrt(n * sxx - sx * sx)
                                  * sqrt(n * syy - sy * sy)), 6)
               end as xcorr
        from agg order by lag
    """
    # uplift deciles: ntile replays scalable_ntile exactly (same
    # total order, same SQL ntile fill rule)
    out["uplift_deciles"] = """
        with users as (
          select user_id,
                 sum(cast(value as decimal(18,2))) as spend,
                 max(case when event_type = 'purchase' then 1
                     else 0 end) as converted,
                 cast(user_id % 2 as int) as treat
          from events group by user_id
        ),
        b as (select *, ntile(10) over (order by spend desc, user_id)
                as bucket from users),
        agg as (
          select bucket, count(*) as n,
                 sum(case when treat = 1 then 1 else 0 end) as n_treat,
                 sum(case when treat <> 1 then 1 else 0 end) as n_ctrl,
                 sum(case when treat = 1 and converted = 1 then 1
                     else 0 end) as ct,
                 sum(case when treat <> 1 and converted = 1 then 1
                     else 0 end) as cc
          from b group by 1
        ),
        rates as (
          select bucket, n, n_treat, n_ctrl,
                 case when n_treat > 0
                      then round(ct / n_treat, 6) end as rate_treat,
                 case when n_ctrl > 0
                      then round(cc / n_ctrl, 6) end as rate_ctrl
          from agg
        )
        select cast(bucket as int) as bucket, cast(n as bigint) as n,
               cast(n_treat as bigint) as n_treat,
               cast(n_ctrl as bigint) as n_ctrl,
               rate_treat, rate_ctrl,
               round(rate_treat - rate_ctrl, 6) as uplift
        from rates order by bucket
    """

    # RBO: d-major fixed-order 20-term sum from the SAME repr'd
    # literals; overlap(d) via the max-rank census
    _rbo_p = 0.9
    _rbo_k = 20
    _rbo_sum = " + ".join(
        f"{(1.0 - _rbo_p) * (_rbo_p ** (d - 1)) / d!r}"
        f" * (select count(*) from sh where m <= {d})"
        for d in range(1, _rbo_k + 1)
    )
    out["rbo_overlap"] = f"""
        with ta as (
          select unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents where source = 'src0'
        ),
        ra0 as (select w, count(*) as c from ta group by w),
        ra as (select w, row_number() over (order by c desc, w) as r
               from ra0),
        tb as (
          select unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents where source = 'src1'
        ),
        rb0 as (select w, count(*) as c from tb group by w),
        rb as (select w, row_number() over (order by c desc, w) as r
               from rb0),
        sh as (
          select greatest(a.r, b.r) as m
          from (select * from ra where r <= {_rbo_k}) a
          join (select * from rb where r <= {_rbo_k}) b using (w)
        )
        select 'src0' as class_a, 'src1' as class_b,
               {_rbo_k} as k,
               cast((select count(*) from sh) as bigint) as n_shared,
               round(0.0 + {_rbo_sum}, 6) as rbo
    """
    # KS two-sample: exact integer cumulatives, gaps rounded before
    # the max, repr'd Smirnov bound
    from etl_orders_to_bq_spark.operators.multitest import _KS_C95

    out["ks_two_sample"] = f"""
        with f as (
          select event_type as g, value as v from events
          where event_type in ('click', 'error') and value is not null
        ),
        vc as (
          select v,
                 sum(case when g = 'click' then 1 else 0 end) as na,
                 sum(case when g = 'error' then 1 else 0 end) as nb
          from f group by v
        ),
        cum as (
          select *,
                 coalesce(sum(na) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as ba,
                 coalesce(sum(nb) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as bb
          from vc
        ),
        t as (select cast(sum(na) as bigint) as n_a,
                     cast(sum(nb) as bigint) as n_b from vc),
        gaps as (
          select round(abs(cast(ba + na as double)
                             / cast(n_a as double)
                           - cast(bb + nb as double)
                             / cast(n_b as double)), 6) as gap
          from cum, t
        )
        select 'click' as group_a, 'error' as group_b, n_a, n_b,
               case when n_a > 0 and n_b > 0
                    then (select max(gap) from gaps) end as d_stat,
               case when n_a > 0 and n_b > 0 then
                 round({_KS_C95!r}
                       * sqrt((cast(n_a as double)
                               + cast(n_b as double))
                              / (cast(n_a as double)
                                 * cast(n_b as double))), 6)
               end as d_crit_95,
               case when n_a > 0 and n_b > 0 then
                 (select max(gap) from gaps)
                 > round({_KS_C95!r}
                         * sqrt((cast(n_a as double)
                                 + cast(n_b as double))
                                / (cast(n_a as double)
                                   * cast(n_b as double))), 6)
               end as reject_95
        from t
    """
    # kNN vote: same cosine expression order as the operator
    # (dot / (sqrt(pp) * sqrt(cc))), window + vote replayed
    out["knn_classify"] = """
        with p as (
          select vec_id as pid, cast(embedding as double[]) as pv,
                 label as tl
          from embeddings where vec_id % 50 = 0
        ),
        c as (
          select vec_id as cid, cast(embedding as double[]) as cv,
                 label as cl
          from embeddings
        ),
        s as (
          select pid, tl, cid, cl,
                 case when sqrt(list_dot_product(pv, pv))
                           * sqrt(list_dot_product(cv, cv)) > 0 then
                   round(list_dot_product(pv, cv)
                         / (sqrt(list_dot_product(pv, pv))
                            * sqrt(list_dot_product(cv, cv))), 6)
                 end as cos
          from c, p where cid <> pid
        ),
        r as (
          select *, row_number() over (partition by pid
                      order by cos desc nulls last, cid) as rk
          from s
        ),
        v as (
          select pid, tl, cl, count(*) as votes
          from r where rk <= 10 group by 1, 2, 3
        ),
        b as (
          select *, row_number() over (partition by pid
                      order by votes desc, cl) as vr
          from v
        )
        select pid as probe_id, tl as true_label,
               cl as predicted_label, cast(votes as bigint) as votes,
               cl = tl as is_correct
        from b where vr = 1 order by probe_id
    """
    # exact type-1 group quartiles: value at rank ceil(q*n)
    out["group_quartiles"] = """
        with v as (select event_type as g, value as v from events
                   where value is not null),
        r as (
          select g, v,
                 row_number() over (partition by g order by v) as rn,
                 count(*) over (partition by g) as n
          from v
        )
        select g as event_type, cast(max(n) as bigint) as n,
               min(case when rn = ceil(0.25 * n) then v end) as p25,
               min(case when rn = ceil(0.5 * n) then v end) as p50,
               min(case when rn = ceil(0.75 * n) then v end) as p75
        from r group by g order by event_type
    """
    # robust daily anomalies: median/MAD rank picks on the daily table
    out["daily_anomalies"] = """
        with daily as (
          select cast(o_orderdate as date) as day,
                 sum(cast(o_totalprice as decimal(18,2))) as value
          from orders group by 1
        ),
        r as (
          select *, row_number() over (order by value, day) as rn,
                 count(*) over () as n
          from daily
        ),
        m as (select value as med from r where rn = ceil(n / 2)),
        wm as (
          select d.day, d.value, med, abs(value - med) as ad
          from daily d, m
        ),
        r2 as (
          select *, row_number() over (order by ad, day) as rn,
                 count(*) over () as n
          from wm
        ),
        md as (select ad as mad from r2 where rn = ceil(n / 2))
        select day, cast(value as double) as value,
               cast(med as double) as med,
               cast(mad as double) as mad,
               case when mad > 0 then
                 round(cast(ad as double) / cast(mad as double), 6)
               end as robust_z,
               case when mad > 0 then
                 round(cast(ad as double) / cast(mad as double), 6)
                 > 3.0
               end as is_anomaly
        from wm, md order by day
    """
    # IPv4 family: identical split + multiply-add arithmetic, digit
    # guard mirrored with \\z
    _ip_num = (
        "case when len(string_split(ip, '.')) = 4"
        + "".join(
            f" and regexp_matches(string_split(ip, '.')[{i}],"
            f" '^[0-9]{{1,3}}\\z')"
            f" and try_cast(string_split(ip, '.')[{i}] as bigint) <= 255"
            for i in (1, 2, 3, 4)
        )
        + " then try_cast(string_split(ip, '.')[1] as bigint) * 16777216"
        " + try_cast(string_split(ip, '.')[2] as bigint) * 65536"
        " + try_cast(string_split(ip, '.')[3] as bigint) * 256"
        " + try_cast(string_split(ip, '.')[4] as bigint) end"
    )
    from etl_orders_to_bq_spark.functions.net import cidr_bounds

    _cidr_lo, _cidr_hi = cidr_bounds("10.64.0.0/10")
    out["ip_funcs"] = f"""
        with users as (select distinct user_id from events),
        ips as (
          select user_id,
                 '10.' || cast(user_id % 128 as varchar) || '.'
                 || cast((user_id * 7) % 256 as varchar) || '.'
                 || cast((user_id * 13) % 256 as varchar) as ip
          from users
          union all
          select -1, 'bad.ip'
        ),
        n as (select user_id, ip, {_ip_num} as ip_num from ips)
        select user_id, ip, ip_num,
               case when ip_num is not null then
                 cast(ip_num // 16777216 as varchar) || '.'
                 || cast((ip_num // 65536) % 256 as varchar) || '.'
                 || cast((ip_num // 256) % 256 as varchar) || '.'
                 || cast(ip_num % 256 as varchar)
               end as ip_roundtrip,
               coalesce(case when ip_num is not null then
                 ip_num >= {_cidr_lo} and ip_num <= {_cidr_hi}
               end, false) as in_tenant_block
        from n order by user_id
    """
    # char entropy: in-row distinct-count fold, the MI discipline
    out["char_entropy"] = f"""
        with c as (
          select doc_id,
                 regexp_extract_all(
                   regexp_replace({_NORM},
                     '[\u0085\u2028\u2029]', '', 'g'),
                   '.') as chars
          from documents
        )
        select doc_id,
               case when len(chars) > 0 then
                 round(list_reduce(list_transform(
                   list_sort(list_transform(list_distinct(chars),
                     ch -> len(list_filter(chars, x -> x = ch)))),
                   cc -> -(cast(cc as double) / len(chars))
                         * log2(cast(cc as double) / len(chars))),
                   (a, b) -> a + b), 6) + 0.0
               end as char_entropy
        from c order by doc_id
    """
    # Simpson audit: one segment groupBy, pooled row re-aggregated
    out["simpsons_check"] = """
        with base as (
          select user_id % 2 as treat,
                 case when event_type = 'purchase' then 1 else 0 end
                   as converted,
                 user_id % 3 as cohort
          from events
        ),
        cells as (
          select cast(cohort as varchar) as segment,
                 sum(case when treat = 1 then 1 else 0 end) as n_treat,
                 sum(case when treat <> 1 then 1 else 0 end) as n_ctrl,
                 sum(case when treat = 1 and converted = 1 then 1
                     else 0 end) as ct,
                 sum(case when treat <> 1 and converted = 1 then 1
                     else 0 end) as cc
          from base group by 1
        ),
        both_rows as (
          select * from cells
          union all
          select 'OVERALL', sum(n_treat), sum(n_ctrl), sum(ct),
                 sum(cc) from cells
        ),
        rated as (
          select segment, cast(n_treat as bigint) as n_treat,
                 cast(n_ctrl as bigint) as n_ctrl,
                 case when n_treat > 0
                      then round(ct / n_treat, 6) end as rate_treat,
                 case when n_ctrl > 0
                      then round(cc / n_ctrl, 6) end as rate_ctrl
          from both_rows
        ),
        d as (
          select *, round(rate_treat - rate_ctrl, 6) as rate_diff
          from rated
        ),
        o as (select rate_diff as od from d where segment = 'OVERALL')
        select segment, n_treat, n_ctrl, rate_treat, rate_ctrl,
               rate_diff,
               case when segment = 'OVERALL' then false
                    when rate_diff is not null and od is not null
                    then (rate_diff * od) < 0 end as reverses_overall
        from d, o order by segment
    """
    # freshness: epoch-second diffs (date_diff == the unix_timestamp
    # truncation Spark applies), integer minutes
    out["freshness_audit"] = """
        with per as (
          select event_type, cast(count(*) as bigint) as n_events,
                 max(ts) as last_ts
          from events group by 1
        ),
        g as (select max(last_ts) as mx from per)
        select event_type, n_events, last_ts,
               cast(floor(date_diff('second', last_ts, mx) / 60)
                    as bigint) as lag_minutes,
               floor(date_diff('second', last_ts, mx) / 60) > 30
                 as is_stale
        from per, g order by event_type
    """
    # OOV rate: deterministic top-N vocab, left-join membership
    out["oov_rate"] = f"""
        with tok as (
          select doc_id,
                 unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        vc as (select w, count(*) as c from tok group by w),
        vocab as (select w from vc order by c desc, w asc limit 200),
        scored as (
          select t.doc_id, count(*) as n_tokens,
                 sum(case when v.w is null then 1 else 0 end) as n_oov
          from tok t left join vocab v on t.w = v.w
          group by t.doc_id
        )
        select d.doc_id,
               cast(coalesce(n_tokens, 0) as bigint) as n_tokens,
               cast(coalesce(n_oov, 0) as bigint) as n_oov,
               case when coalesce(n_tokens, 0) > 0
                    then round(n_oov / n_tokens, 6) end as oov_ratio
        from (select distinct doc_id from documents) d
        left join scored using (doc_id)
        order by doc_id
    """
    # per-source dup census with planted 'dupsrc' copies
    out["dup_rate_by_source"] = f"""
        with d2 as (
          select doc_id, source, text from documents
          union all
          select doc_id, 'dupsrc' as source, text from documents
          where doc_id % 20 = 0
        ),
        fp as (select md5({_NORM}) as f, source from d2),
        stats as (select f, count(*) as n,
                         count(distinct source) as ns
                  from fp where f is not null group by f),
        tagged as (select fp.source, fp.f, n, ns
                   from fp left join stats using (f))
        select source, cast(count(*) as bigint) as n_docs,
               cast(sum(case when f is null then 1 else 0 end)
                    as bigint) as n_null_text,
               cast(sum(case when n > 1 then 1 else 0 end) as bigint)
                 as n_dup_docs,
               cast(sum(case when ns > 1 then 1 else 0 end) as bigint)
                 as n_crosssource_docs,
               round(sum(case when n > 1 then 1 else 0 end)
                     / count(*), 6) as dup_rate,
               round(sum(case when ns > 1 then 1 else 0 end)
                     / count(*), 6) as crosssource_rate
        from tagged group by source order by source
    """
    # GROUP BY ALL / ORDER BY ALL: the identical text runs on DuckDB
    out["sql_group_by_all"] = """
        select o_orderpriority, o_orderstatus,
               count(*) as n_orders,
               cast(round(sum(cast(o_totalprice as decimal(18,2))),
                          2) as double) as total_price
        from orders
        group by all
        order by all
    """
    # cohort LTV: decimal-exact revenue cells + running cumulative,
    # one rounded division for LTV-per-user
    out["cohort_ltv"] = """
        with first_week as (
          select user_id,
                 min(cast(date_trunc('week', ts) as date)) as cw
          from events group by user_id
        ),
        act as (
          select user_id, cast(date_trunc('week', ts) as date) as aw,
                 cast(value as decimal(18,2)) as v
          from events
        ),
        cells as (
          select f.cw as cohort_week,
                 cast((a.aw - f.cw) // 7 as int) as week_offset,
                 sum(v) as rev
          from act a join first_week f using (user_id)
          group by 1, 2
        ),
        sizes as (select cw as cohort_week,
                         cast(count(*) as bigint) as cohort_users
                  from first_week group by 1),
        cum as (
          select *, sum(rev) over (partition by cohort_week
                     order by week_offset
                     rows between unbounded preceding and current row)
                   as cumrev
          from cells
        )
        select c.cohort_week, c.week_offset, s.cohort_users,
               cast(rev as double) as period_revenue,
               cast(cumrev as double) as cum_revenue,
               round(cast(cumrev as double) / s.cohort_users, 6)
                 as ltv_per_user
        from cum c join sizes s using (cohort_week)
        order by cohort_week, week_offset
    """
    # WoW growth: adjacency-checked lag over the weekly table
    out["period_over_period"] = """
        with weekly as (
          select cast(date_trunc('week', o_orderdate) as date) as week,
                 sum(cast(o_totalprice as decimal(18,2))) as rev
          from orders group by 1
        ),
        lagged as (
          select *, lag(rev) over (order by week) as prev,
                 lag(week) over (order by week) as prev_wk
          from weekly
        )
        select week, cast(rev as double) as revenue,
               case when prev_wk is not null and week - prev_wk = 7
                    then cast(prev as double) end as prev_revenue,
               case when prev_wk is not null and week - prev_wk = 7
                         and prev > 0
                    then round(cast(rev - prev as double)
                               / cast(prev as double), 6)
               end as wow_pct
        from lagged order by week
    """
    # cross-class dup census: fingerprint groupBy with planted 'xx'
    # copies, sorted distinct label list
    out["crosslang_dups"] = f"""
        with d2 as (
          select doc_id, lang, text from documents
          union all
          select doc_id, 'xx' as lang, text from documents
          where doc_id % 25 = 0
        ),
        f as (
          select md5({_NORM}) as fingerprint, lang from d2
        )
        select fingerprint, cast(count(*) as bigint) as n_docs,
               cast(count(distinct lang) as bigint) as n_classes,
               array_to_string(list_sort(list(distinct lang)), ',')
                 as classes
        from f group by fingerprint
        having count(distinct lang) > 1
        order by fingerprint
    """
    # seasonal-naive backtest: decimal error sums, micro-unit APEs
    out["backtest_snaive"] = """
        with daily as (
          select cast(o_orderdate as date) as d,
                 sum(cast(o_totalprice as decimal(18,2))) as v
          from orders group by 1
        ),
        fc as (select d + 7 as d, v as f from daily),
        scored as (select daily.d, v, f from daily join fc using (d)),
        e as (select v - f as err, v from scored),
        nd as (select cast(count(*) as bigint) as n_days from daily),
        agg as (
          select cast(count(*) as bigint) as n_scored,
                 sum(abs(err)) as sae, sum(err) as se,
                 sum(case when v > 0 then
                   cast(round(1000000.0 * cast(abs(err) as double)
                              / cast(v as double), 0) as bigint) end)
                   as sape,
                 count(case when v > 0 then 1 end) as n_mape
          from e
        )
        select n_days, n_scored,
               case when n_scored > 0 then
                 round(cast(sae as double) / n_scored, 6) end as mae,
               case when n_mape > 0 then
                 round(cast(sape as double)
                       / (cast(n_mape as double) * 1000000.0), 6)
                 end as mape,
               case when n_scored > 0 then
                 round(cast(se as double) / n_scored, 6) end as bias
        from nd, agg
    """
    # interval audit: lag window over per-key ordered intervals,
    # integer day arithmetic (date - date)
    out["interval_audit"] = """
        with iv as (
          select o_custkey as k, cast(o_orderdate as date) as s,
                 cast(o_orderdate as date) + 30 as e
          from orders
        ),
        l as (
          select k, s, e,
                 lag(e) over (partition by k order by s, e) as pe
          from iv
        ),
        f as (
          select k,
                 case when pe is not null and s < pe then 1 else 0 end
                   as ov,
                 case when pe is not null and s > pe then 1 else 0 end
                   as gp,
                 case when pe is not null and s > pe then s - pe
                      else 0 end as gd
          from l
        )
        select cast(count(distinct k) as bigint) as n_keys,
               cast(count(*) as bigint) as n_intervals,
               cast(sum(ov) as bigint) as n_overlaps,
               cast(sum(gp) as bigint) as n_gaps,
               cast(sum(gd) as bigint) as total_gap_days,
               cast(max(gd) as bigint) as max_gap_days
        from f
    """
    # ABC classification: exact integer cumulative + integer class
    # cut, one rounded division for the share
    out["abc_class"] = """
        with cents as (
          select l_partkey,
                 cast(round(l_extendedprice * 100, 0) as bigint) as c
          from lineitem
        ),
        per as (select l_partkey, sum(c) as w from cents group by 1),
        cum as (
          select *,
                 coalesce(sum(w) over (order by w desc, l_partkey
                   rows between unbounded preceding and 1 preceding),
                   0) as below
          from per
        ),
        t as (select sum(w) as tot from per)
        select l_partkey, cast(w as bigint) as cents,
               case when tot > 0
                    then round((below + w) / tot, 6) end as cum_share,
               case when 100 * (below + w) <= 80 * tot then 'A'
                    when 100 * (below + w) <= 95 * tot then 'B'
                    else 'C' end as abc_class
        from cum, t
        order by cum_share, l_partkey
    """
    # combiner top-k: the oracle IS the window formulation the
    # operator must equal row-for-row
    out["topk_pergroup"] = """
        select o_orderpriority, cast(rn as int) as rank,
               o_totalprice, o_orderkey
        from (
          select o_orderpriority, o_totalprice, o_orderkey,
                 row_number() over (partition by o_orderpriority
                   order by o_totalprice desc, o_orderkey) as rn
          from orders
        )
        where rn <= 3
        order by o_orderpriority, rank
    """
    # mix shift: integer volumes, decimal revenues, one rounded
    # division per rate, the operator's exact two-term split
    out["mix_shift"] = """
        with cells as (
          select o_orderpriority as segment,
                 sum(case when year(o_orderdate) = 1995 then 1
                     else 0 end) as vol_a,
                 sum(case when year(o_orderdate) = 1996 then 1
                     else 0 end) as vol_b,
                 coalesce(sum(case when year(o_orderdate) = 1995
                   then cast(o_totalprice as decimal(18,2)) end), 0)
                   as rev_a,
                 coalesce(sum(case when year(o_orderdate) = 1996
                   then cast(o_totalprice as decimal(18,2)) end), 0)
                   as rev_b
          from orders
          where year(o_orderdate) in (1995, 1996)
          group by 1
        ),
        rated as (
          select *,
                 case when vol_a > 0 then
                   round(cast(rev_a as double) / vol_a, 6) end as rate_a,
                 case when vol_b > 0 then
                   round(cast(rev_b as double) / vol_b, 6) end as rate_b
          from cells
        )
        select segment, cast(vol_a as bigint) as vol_a,
               cast(vol_b as bigint) as vol_b,
               cast(rev_a as double) as rev_a,
               cast(rev_b as double) as rev_b,
               rate_a, rate_b,
               round(cast(vol_b - vol_a as double)
                     * coalesce(rate_a, 0.0), 6) as volume_effect,
               round(cast(vol_b as double)
                     * (coalesce(rate_b, 0.0) - coalesce(rate_a, 0.0)),
                     6) as rate_effect
        from rated order by segment
    """
    # median CI: identical rank formulas over the repr'd z constant
    from etl_orders_to_bq_spark.operators.ranking import _Z975

    out["median_ci"] = f"""
        with v as (select l_extendedprice as v from lineitem
                   where l_extendedprice is not null),
        n as (select count(*) as n from v),
        r as (select v, row_number() over (order by v) as rn from v),
        k as (
          select n,
                 greatest(1, cast(floor((n - {_Z975!r} * sqrt(n))
                   / 2.0) as bigint)) as lo,
                 least(n, cast(ceil(1.0 + (n + {_Z975!r} * sqrt(n))
                   / 2.0) as bigint)) as hi,
                 (n + 1) // 2 as med
          from n
        )
        select cast(k.n as bigint) as n,
               min(case when rn = lo then v end) as ci_lo,
               min(case when rn = med then v end) as median,
               min(case when rn = hi then v end) as ci_hi
        from r, k group by k.n
    """
    # streaming quota flags: batch flags + the finalized-window filter
    out["streaming_quota"] = """
        with m as (select max(ts) as mx from events),
        c as (
          select time_bucket(interval 6 hour, ts) as ws, user_id,
                 count(*) as n
          from events group by 1, 2
        )
        select ws as window_start, user_id,
               cast(n as bigint) as n_events,
               cast(n - 2 as bigint) as overage
        from c, m
        where n > 2 and ws + interval 6 hour <= mx - interval 10 minute
    """

    _psf = norm_sf_sql("abs(z)")

    # Benjamini-Yekutieli: the fdr_bh replay with the threshold divided
    # by the harmonic number c(m); the harmonic folds ascending i=1..m
    # as ONE single-row list fold (bounded m — the r10 full-chunk
    # list_reduce trap does not apply), seed 0.0 like the engine's
    # F.aggregate, so the cut is bit-identical.
    out["benjamini_yekutieli"] = f"""
        with g as (
          select event_type, count(value) as n,
                 round(cast(sum(cast(value as decimal(18,2)))
                            as double) / count(value), 6) as mean
          from events group by 1
        ),
        gl as (
          select round(cast(sum(cast(value as decimal(18,2)))
                            as double) / count(value), 6) as m0,
                 round(cast(sum(cast(value as decimal(18,2))
                                * cast(value as decimal(18,2)))
                            as double) / count(value), 6) as m2
          from events
        ),
        s as (
          select g.*, round(case when m2 - m0 * m0 > 0
                            then (mean - m0)
                                 / sqrt((m2 - m0 * m0) / n) end, 6) as z
          from g, gl
        ),
        p as (
          select *, case when z is not null then
                 round(least(1.0, 2.0 * {_psf}), 6) end as p_value
          from s
        ),
        mm as (select count(*) as m from p),
        hm as (
          select list_reduce(
                   list_prepend(0.0::double,
                     list_transform(range(1, (select m from mm) + 1),
                                    i -> 1.0 / cast(i as double))),
                   (a, x) -> a + x) as cm
        ),
        r as (
          select p.*, (select m from mm) as m, (select cm from hm) as cm,
                 row_number() over (order by p_value nulls last,
                                    event_type)
                   as p_rank
          from p
        ),
        rs as (
          select *,
                 max(case when p_value <= p_rank / (m * cm) * 0.1
                     then p_rank end) over () as rstar
          from r
        )
        select event_type, cast(n as bigint) as n, mean, z,
               p_value, p_rank,
               coalesce(p_rank <= rstar, false) as rejected
        from rs order by event_type
    """

    _wpsf = norm_sf_sql("abs(w_round)")
    out["brunner_munzel"] = f"""
        with f as (
          select event_type as g, value as v from events
          where event_type in ('click', 'error') and value is not null
        ),
        vc as (
          select v,
                 sum(case when g = 'click' then 1 else 0 end) as na,
                 sum(case when g = 'error' then 1 else 0 end) as nb,
                 count(*) as nt
          from f group by v
        ),
        cum as (
          select *,
                 coalesce(sum(nt) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as bt,
                 coalesce(sum(na) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as ba,
                 coalesce(sum(nb) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as bb
          from vc
        ),
        tot as (
          select cast(sum(na) as bigint) as n_a,
                 cast(sum(nb) as bigint) as n_b,
                 cast(sum(cast(na as decimal(38,0))
                          * cast(2*bt + nt + 1 as decimal(38,0)))
                      as decimal(38,0)) as ta,
                 cast(sum(cast(nb as decimal(38,0))
                          * cast(2*bt + nt + 1 as decimal(38,0)))
                      as decimal(38,0)) as tb
          from cum
        ),
        ss as (
          select
            cast(sum(cast(na as decimal(38,0))
                     * (cast(n_a as decimal(38,0))
                        * cast(2*(bt - ba) + (nt - na) as decimal(38,0))
                        - ta
                        + cast(n_a as decimal(38,0))
                          * cast(n_a + 1 as decimal(38,0)))
                     * (cast(n_a as decimal(38,0))
                        * cast(2*(bt - ba) + (nt - na) as decimal(38,0))
                        - ta
                        + cast(n_a as decimal(38,0))
                          * cast(n_a + 1 as decimal(38,0))))
                 as decimal(38,0)) as ssa,
            cast(sum(cast(nb as decimal(38,0))
                     * (cast(n_b as decimal(38,0))
                        * cast(2*(bt - bb) + (nt - nb) as decimal(38,0))
                        - tb
                        + cast(n_b as decimal(38,0))
                          * cast(n_b + 1 as decimal(38,0)))
                     * (cast(n_b as decimal(38,0))
                        * cast(2*(bt - bb) + (nt - nb) as decimal(38,0))
                        - tb
                        + cast(n_b as decimal(38,0))
                          * cast(n_b + 1 as decimal(38,0))))
                 as decimal(38,0)) as ssb
          from cum, tot
        ),
        stat as (
          select n_a, n_b,
                 cast(ssa as double)
                   / (4.0 * n_a * n_a * (n_a - 1.0)) as s_a,
                 cast(ssb as double)
                   / (4.0 * n_b * n_b * (n_b - 1.0)) as s_b,
                 (cast(tb as double) / n_b
                  - cast(ta as double) / n_a) / 2.0 as rdiff,
                 (cast(tb as double) / n_b - (n_b + 1.0))
                   / (2.0 * n_a) as phat
          from tot, ss
        ),
        wv as (
          select *,
                 n_a * s_a + n_b * s_b as var_term
          from stat
        ),
        wr as (
          select *,
                 case when n_a > 1 and n_b > 1 and var_term > 0 then
                   round((n_a * n_b * rdiff)
                         / ((n_a + n_b) * sqrt(var_term)), 6)
                 end as w_round
          from wv
        )
        select 'click' as group_a, 'error' as group_b, n_a, n_b,
               case when n_a > 0 and n_b > 0
                    then round(phat, 6) end as p_hat,
               w_round as w_stat,
               case when w_round is not null then
                 round(least(1.0, 2.0 * {_wpsf}), 6) end as p_value
        from wr
    """

    out["jonckheere_terpstra"] = f"""
        with f as (
          select event_type as g, value as v from events
          where value is not null
        ),
        gi as (
          select g, dense_rank() over (order by g) - 1 as j
          from (select distinct g from f)
        ),
        cnt as (
          select v, j, count(*) as n
          from f join gi using (g) group by 1, 2
        ),
        grid as (
          select v, j, coalesce(n, 0) as n
          from (select distinct v from cnt)
          cross join (select j from gi)
          left join cnt using (v, j)
        ),
        cum as (
          select *,
                 coalesce(sum(n) over (partition by j order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as below
          from grid
        ),
        prev as (
          select *,
                 coalesce(sum(cast(2*below + n as decimal(38,0)))
                   over (partition by v order by j
                     rows between unbounded preceding and 1 preceding),
                   cast(0 as decimal(38,0))) as prevterm
          from cum
        ),
        jt as (
          select cast(sum(cast(n as decimal(38,0)) * prevterm)
                      as decimal(38,0)) as jt2
          from prev
        ),
        gsz as (select j, sum(n) as gn from grid group by j),
        tsz as (select v, sum(n) as tn from grid group by v),
        cg as (
          select cast(sum(cast(gn as decimal(38,0))
                          * cast(gn - 1 as decimal(38,0))
                          * cast(2*gn + 5 as decimal(38,0)))
                      as decimal(38,0)) as g2,
                 cast(sum(cast(gn as decimal(38,0))
                          * cast(gn - 1 as decimal(38,0))
                          * cast(gn - 2 as decimal(38,0)))
                      as decimal(38,0)) as g3,
                 cast(sum(cast(gn as decimal(38,0))
                          * cast(gn - 1 as decimal(38,0)))
                      as decimal(38,0)) as g1,
                 cast(sum(cast(gn as decimal(38,0))
                          * cast(gn as decimal(38,0)))
                      as decimal(38,0)) as sumsq,
                 cast(sum(gn) as bigint) as n,
                 cast(count(*) as bigint) as k
          from gsz
        ),
        ct as (
          select cast(sum(cast(tn as decimal(38,0))
                          * cast(tn - 1 as decimal(38,0))
                          * cast(2*tn + 5 as decimal(38,0)))
                      as decimal(38,0)) as t2,
                 cast(sum(cast(tn as decimal(38,0))
                          * cast(tn - 1 as decimal(38,0))
                          * cast(tn - 2 as decimal(38,0)))
                      as decimal(38,0)) as t3,
                 cast(sum(cast(tn as decimal(38,0))
                          * cast(tn - 1 as decimal(38,0)))
                      as decimal(38,0)) as t1
          from tsz
        ),
        vz as (
          select jt2, n, k,
                 cast(cast(n as decimal(38,0)) * cast(n as decimal(38,0))
                      - sumsq as double) / 2.0 as e2,
                 cast(cast(n as decimal(38,0))
                      * cast(n - 1 as decimal(38,0))
                      * cast(2*n + 5 as decimal(38,0))
                      - g2 - t2 as double) / 72.0
                 + case when n > 2 then
                     cast(g3 * t3 as double)
                     / (36.0 * n * (n - 1.0) * (n - 2.0))
                   else 0.0 end
                 + case when n > 1 then
                     cast(g1 * t1 as double)
                     / (8.0 * n * (n - 1.0))
                   else 0.0 end as var
          from jt, cg, ct
        ),
        zr as (
          select n, k, jt2,
                 case when var > 0 then
                   round((cast(jt2 as double) - e2)
                         / (2.0 * sqrt(var)), 6)
                 end as z
          from vz
        )
        select n, k as n_groups, cast(jt2 as bigint) as jt2, z,
               case when z is not null then
                 round(least(1.0, 2.0 * {_psf}), 6) end as p_value
        from zr
    """

    out["cochran_armitage"] = f"""
        with g as (
          select cast(substr(o_orderpriority, 1, 1) as bigint) as w,
                 case when o_totalprice > 200000 then 1 else 0 end as y
          from orders
          where o_orderpriority is not null
        ),
        cen as (
          select w, count(*) as n, sum(y) as r from g group by w
        ),
        agg as (
          select cast(sum(n) as bigint) as n,
                 cast(sum(r) as bigint) as n_success,
                 cast(sum(cast(w as decimal(38,0))
                          * cast(n as decimal(38,0)))
                      as decimal(38,0)) as swn,
                 cast(sum(cast(w as decimal(38,0))
                          * cast(w as decimal(38,0))
                          * cast(n as decimal(38,0)))
                      as decimal(38,0)) as sw2n,
                 cast(sum(cast(w as decimal(38,0))
                          * cast(r as decimal(38,0)))
                      as decimal(38,0)) as swr
          from cen
        ),
        st as (
          select n, n_success,
                 swr * cast(n as decimal(38,0))
                   - swn * cast(n_success as decimal(38,0)) as tn,
                 cast(n_success as decimal(38,0))
                   * cast(n - n_success as decimal(38,0))
                   * (cast(n as decimal(38,0)) * sw2n - swn * swn)
                   as vn3
          from agg
        ),
        zr as (
          select n, n_success,
                 case when vn3 > 0 then
                   round(cast(tn as double) * sqrt(cast(n as double))
                         / sqrt(cast(vn3 as double)), 6)
                 end as z
          from st
        )
        select n, n_success, z,
               case when z is not null then
                 round(least(1.0, 2.0 * {_psf}), 6) end as p_value
        from zr
    """

    # shared 3-vote panel fixture for the agreement coefficients
    _votes3 = """
          select o_orderkey as item,
                 cast(o_orderkey % 5 as varchar) as cat from orders
          union all
          select o_orderkey,
                 cast((o_orderkey // 7) % 5 as varchar) from orders
          union all
          select o_orderkey,
                 cast(cast(round(o_totalprice * 100, 0) as bigint) % 5
                      as varchar) from orders
    """
    out["fleiss_kappa"] = f"""
        with votes as ({_votes3}),
        cells as (
          select item, cat, count(*) as c from votes group by 1, 2
        ),
        per_item as (
          select item, sum(c) as m, sum(c * c) as s
          from cells group by item
        ),
        margins as (select cat, sum(c) as cc from cells group by cat),
        ia as (
          select cast(count(*) as bigint) as n_items,
                 cast(sum(s) as decimal(38,0)) as ssum
          from per_item
        ),
        mb as (
          select cast(sum(cast(cc as decimal(38,0))
                          * cast(cc as decimal(38,0)))
                      as decimal(38,0)) as b
          from margins
        ),
        st as (
          select n_items, ssum, b,
                 cast(n_items as decimal(38,0)) * 3 as nn,
                 ssum - cast(n_items as decimal(38,0)) * 3 as a
          from ia, mb
        ),
        st2 as (
          select *, nn * 2 as den_o, nn * nn as nn2 from st
        )
        select n_items, cast(3 as bigint) as n_raters,
               round(cast(a as double) / cast(den_o as double), 6)
                 as po,
               round(cast(b as double) / cast(nn2 as double), 6) as pe,
               case when nn2 != b then
                 round(cast(a * nn2 - b * den_o as double)
                       / cast(den_o * (nn2 - b) as double), 6)
               end as kappa
        from st2
    """

    out["krippendorff_alpha"] = """
        with votes as (
          select o_orderkey as item,
                 cast(o_orderkey % 5 as varchar) as cat from orders
          union all
          select o_orderkey,
                 cast((o_orderkey // 7) % 5 as varchar) from orders
          where o_orderkey % 2 = 0
          union all
          select o_orderkey,
                 cast(cast(round(o_totalprice * 100, 0) as bigint) % 5
                      as varchar) from orders
          where o_orderkey % 3 = 0
        ),
        cells as (
          select item, cat, count(*) as c from votes group by 1, 2
        ),
        per_item as (
          select item, sum(c) as m, sum(c * c) as s
          from cells group by item
          having sum(c) >= 2
        ),
        margins as (
          select cat, sum(c) as cc
          from cells join per_item using (item)
          group by cat
        ),
        bym as (
          select m,
                 cast(sum(cast(m as decimal(38,0))
                          * cast(m as decimal(38,0))
                          - cast(s as decimal(38,0)))
                      as decimal(38,0)) as anum
          from per_item group by m
        ),
        od as (
          select list_reduce(
                   list_prepend(0.0::double,
                     list(cast(anum as double) / (m - 1.0) order by m)),
                   (a, x) -> a + x) as od
          from bym
        ),
        tots as (
          select cast(count(*) as bigint) as n_units,
                 cast(sum(m) as bigint) as n_pairable
          from per_item
        ),
        mb as (
          select cast(sum(cast(cc as decimal(38,0))
                          * cast(cc as decimal(38,0)))
                      as decimal(38,0)) as b
          from margins
        )
        select n_units, n_pairable,
               case when cast(cast(n_pairable as decimal(38,0))
                             * cast(n_pairable as decimal(38,0))
                             - b as double) > 0 then
                 round(1.0 - (n_pairable - 1.0) * od
                       / cast(cast(n_pairable as decimal(38,0))
                              * cast(n_pairable as decimal(38,0))
                              - b as double), 6)
               end as alpha
        from tots, od, mb
    """

    out["jensen_shannon"] = """
        with toks as (
          select source as g,
                 unnest(regexp_extract_all(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   '\\S+')) as w
          from documents where source in ('src0', 'src1')
        ),
        cnt as (
          select w,
                 sum(case when g = 'src0' then 1 else 0 end) as ca,
                 sum(case when g = 'src1' then 1 else 0 end) as cb
          from toks group by w
        ),
        consts as (
          select count(*) as v, sum(ca) as ta, sum(cb) as tb from cnt
        ),
        terms as (
          select ((ca + 1.0) / (ta + v)) as p,
                 ((cb + 1.0) / (tb + v)) as q,
                 ta, tb
          from cnt, consts
        )
        select 'src0' as group_a, 'src1' as group_b,
               cast(max(ta) as bigint) as n_tokens_a,
               cast(max(tb) as bigint) as n_tokens_b,
               round(sum(p * (log2(p) - log2((p + q) / 2.0))
                         + q * (log2(q) - log2((p + q) / 2.0))) / 2.0,
                     6) as jsd
        from terms
    """

    out["rouge_n"] = """
        with pairs as (
          select a.doc_id, a.text as cand, b.text as ref
          from documents a join documents b on b.doc_id = a.doc_id + 1
        ),
        toked as (
          select doc_id,
                 regexp_extract_all(trim(regexp_replace(lower(cand),
                   '\\s+', ' ', 'g')), '\\S+') as ct,
                 regexp_extract_all(trim(regexp_replace(lower(ref),
                   '\\s+', ' ', 'g')), '\\S+') as rt
          from pairs
        ),
        grammed as (
          select doc_id,
                 case when len(ct) >= 2 then
                   [ct[i] || ' ' || ct[i+1] for i in range(1, len(ct))]
                 else [] end as cg,
                 case when len(rt) >= 2 then
                   [rt[i] || ' ' || rt[i+1] for i in range(1, len(rt))]
                 else [] end as rg
          from toked
        ),
        cand_c as (
          select doc_id, g, count(*) as cc
          from (select doc_id, unnest(cg) as g from grammed)
          group by 1, 2
        ),
        ref_c as (
          select doc_id, g, count(*) as rc
          from (select doc_id, unnest(rg) as g from grammed)
          group by 1, 2
        ),
        clipt as (
          select doc_id, sum(least(cc, rc)) as clip
          from ref_c join cand_c using (doc_id, g)
          group by doc_id
        ),
        tots as (
          select doc_id, len(cg) as n_cand, len(rg) as n_ref
          from grammed
        ),
        scored as (
          select t.doc_id,
                 cast(t.n_cand as bigint) as n_cand,
                 cast(t.n_ref as bigint) as n_ref,
                 cast(coalesce(c.clip, 0) as bigint) as clip,
                 case when t.n_cand > 0 then
                   coalesce(c.clip, 0) / cast(t.n_cand as double) end
                   as p,
                 case when t.n_ref > 0 then
                   coalesce(c.clip, 0) / cast(t.n_ref as double) end
                   as r
          from tots t left join clipt c using (doc_id)
        )
        select doc_id, n_cand, n_ref, clip,
               round(p, 6) as precision,
               round(r, 6) as recall,
               case when (p + r) > 0 then
                 round(2.0 * p * r / (p + r), 6)
               when p is not null and r is not null then 0.0
               end as f1
        from scored order by doc_id
    """

    # shared SAX word pipeline (events, 8 segments, alphabet 4) —
    # ONE constant interpolated into both sax oracles (the _mlfix_cte
    # shared-fixture discipline)
    _sax_cte = """base as (
          select event_type as s, ts as t,
                 cast(value as decimal(18,2)) as v
          from events where value is not null and ts is not null
        ),
        ranked as (
          select *, row_number() over (partition by s order by t, v)
                     as rn
          from base
        ),
        stats as (
          select s, cast(count(*) as bigint) as n,
                 sum(v) as vsum,
                 sum(cast(v as decimal(38,4)) * v) as vsumsq
          from base group by s
        ),
        seg as (
          select r.s, ((r.rn - 1) * 8) // st.n as sg,
                 sum(r.v) as segsum, count(*) as segn
          from ranked r join stats st using (s)
          group by 1, 2
        ),
        zs as (
          select seg.s, seg.sg,
                 case when (cast(vsumsq as double)
                            - n * (cast(vsum as double) / n)
                                * (cast(vsum as double) / n)) / n > 0
                 then (cast(segsum as double) / segn
                       - cast(vsum as double) / n)
                      / sqrt((cast(vsumsq as double)
                              - n * (cast(vsum as double) / n)
                                  * (cast(vsum as double) / n)) / n)
                 else 0.0 end as z
          from seg join stats using (s)
        ),
        lettered as (
          select s, sg,
                 case when z <= -0.674490 then 'a'
                      when z <= 0.0 then 'b'
                      when z <= 0.674490 then 'c'
                      else 'd' end as l
          from zs
        ),
        saxwords as (
          select s,
                 cast(count(*) as bigint) as n_segments_out,
                 string_agg(l, '' order by sg) as word
          from lettered group by s
        )"""
    out["sax_symbolize"] = f"""
        with {_sax_cte}
        select s as event_type, n_segments_out, word
        from saxwords order by s
    """

    # MINDIST cell: bp(hi-1) - bp(lo) over the alphabet-4 breakpoints,
    # zero for adjacent letters; one term per word position
    _sax_bps = [-0.674490, 0.0, 0.674490]

    def _mind_cell(i: int) -> str:
        r = f"(ascii(substr(word_a, {i}, 1)) - 97)"
        c = f"(ascii(substr(word_b, {i}, 1)) - 97)"
        hi = f"greatest({r}, {c})"
        lo = f"least({r}, {c})"
        bp_hi = "0.0"
        bp_lo = "0.0"
        for j, v in enumerate(_sax_bps):
            bp_hi = (
                f"case when {hi} - 1 = {j} then {v!r} else {bp_hi} end"
            )
            bp_lo = f"case when {lo} = {j} then {v!r} else {bp_lo} end"
        return (
            f"power(case when {hi} - {lo} <= 1 then 0.0 "
            f"else ({bp_hi}) - ({bp_lo}) end, 2)"
        )

    _mind_sum = " + ".join(_mind_cell(i) for i in range(1, 9))
    out["sax_mindist"] = f"""
        with {_sax_cte},
        lens as (
          select s, cast(count(*) as bigint) as len from base group by s
        ),
        wt as (
          select saxwords.s, word, n_segments_out, len
          from saxwords join lens using (s)
        ),
        pairs as (
          select a.s as series_a, b.s as series_b,
                 a.word as word_a, b.word as word_b,
                 a.len as na, b.len as nb,
                 a.n_segments_out as wa, b.n_segments_out as wb
          from wt a, wt b where a.s < b.s
        )
        select series_a, series_b, word_a, word_b,
               case when wa = 8 and wb = 8 then
                 round(sqrt(least(na, nb) / 8.0)
                       * sqrt({_mind_sum}), 6)
               end as mindist
        from pairs order by series_a, series_b
    """

    out["page_trend"] = f"""
        with daily as (
          select cast(ts as date) as b, event_type as j,
                 sum(cast(value as decimal(18,2))) as v
          from events
          where ts is not null and event_type is not null
            and value is not null
          group by 1, 2
        ),
        kk as (select count(distinct j)::bigint as k from daily),
        ord as (
          select j, dense_rank() over (order by j) as oj
          from (select distinct j from daily)
        ),
        bc as (
          select b, count(*) as nb, count(distinct j) as nj
          from daily group by b
        ),
        nblocks as (select count(*)::bigint as n_blocks from bc),
        complete as (
          select b from bc, kk where nb = k and nj = k
        ),
        kept as (select d.* from daily d join complete using (b)),
        ranked as (
          select a.b, a.j,
                 cast(2 * sum(case when c.v < a.v then 1 else 0 end)
                      + sum(case when c.v = a.v then 1 else 0 end)
                      + 1 as bigint) as r2
          from kept a join kept c on a.b = c.b
          group by a.b, a.j
        ),
        agg as (
          select cast(sum(cast(oj as decimal(38,0))
                          * cast(r2 as decimal(38,0)))
                      as decimal(38,0)) as l2,
                 cast(count(*) / max(k) as bigint) as n_complete
          from ranked join ord using (j), kk
        ),
        zr as (
          select n_blocks, n_complete, k as k_treatments, l2,
                 case when k >= 2 and n_complete > 0
                           and n_complete * k * k * (k + 1.0)
                               * (k * k - 1.0) / 144.0 > 0 then
                   round((cast(l2 as double)
                          - n_complete * k * (k + 1.0) * (k + 1.0)
                            / 2.0)
                         / (2.0 * sqrt(n_complete * k * k * (k + 1.0)
                                       * (k * k - 1.0) / 144.0)), 6)
                 end as z
          from agg, kk, nblocks
        )
        select n_blocks, n_complete, k_treatments,
               cast(l2 as bigint) as l2, z,
               case when z is not null then
                 round(least(1.0, 2.0 * {_psf}), 6) end as p_value
        from zr
    """

    out["brown_forsythe"] = """
        with base as (
          select event_type as g, cast(value as decimal(18,2)) as v
          from events
          where value is not null and event_type is not null
        ),
        vc as (
          select g, v, count(*) as c from base group by 1, 2
        ),
        cum as (
          select *, sum(c) over (partition by g order by v
                   rows between unbounded preceding and current row)
                 as cm
          from vc
        ),
        tot as (select g, cast(sum(c) as bigint) as n from vc group by g),
        med as (
          select cum.g,
                 cast((min(case when cm >= (n + 1) // 2 then v end)
                         ::decimal(19,3)
                       + min(case when cm >= n // 2 + 1 then v end)
                         ::decimal(19,3)) / 2
                      as decimal(19,3)) as med
          from cum join tot using (g)
          group by cum.g
        ),
        z as (
          select base.g,
                 abs(cast(v as decimal(19,3)) - med) as z
          from base join med using (g)
        ),
        perg as (
          select g, cast(count(*) as bigint) as n,
                 cast(sum(z) as decimal(38,3)) as s,
                 cast(sum(cast(z as decimal(38,6)) * z)
                      as decimal(38,6)) as q
          from z group by g
        ),
        folded as (
          select cast(count(*) as bigint) as k_groups,
                 cast(sum(n) as bigint) as n,
                 cast(sum(s) as decimal(38,3)) as stot,
                 cast(sum(q) as decimal(38,6)) as qtot,
                 list_reduce(
                   list_prepend(0.0::double,
                     list(cast(s as double) * cast(s as double)
                          / cast(n as double) order by g)),
                   (a, x) -> a + x) as mix
          from perg
        ),
        ss as (
          select k_groups, n,
                 round(mix - cast(stot as double) * cast(stot as double)
                             / n, 6) as ssb,
                 round(cast(qtot as double) - mix, 6) as ssw
          from folded
        )
        select k_groups, n,
               case when k_groups >= 2 and n > k_groups and ssw > 0
               then round((ssb / (k_groups - 1.0))
                          / (ssw / (n - cast(k_groups as double))), 6)
               end as w_stat
        from ss
    """

    out["ansari_bradley"] = """
        with f as (
          select event_type as g, value as v from events
          where event_type in ('click', 'error') and value is not null
        ),
        vc as (
          select v,
                 sum(case when g = 'click' then 1 else 0 end) as na,
                 count(*) as nt
          from f group by v
        ),
        cum as (
          select *,
                 coalesce(sum(nt) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as bt
          from vc
        ),
        tot as (
          select cast(sum(na) as bigint) as n_a,
                 cast(sum(nt) - sum(na) as bigint) as n_b,
                 cast(sum(nt) as bigint) as nn
          from vc
        ),
        seg as (
          select na, nt, bt, nn, n_a, n_b,
                 (nn + 1) // 2 as h
          from cum, tot
        ),
        sc as (
          select *,
                 -- S(x) = tri(min(x,h)) + [x>h] * (cnt*first - tri(cnt-1))
                 (least(bt + nt, h) * (least(bt + nt, h) + 1)) // 2
                   + case when (bt + nt) - h > 0 then
                       ((bt + nt) - h) * (nn - h)
                       - (((bt + nt) - h - 1) * ((bt + nt) - h)) // 2
                     else 0 end
                 - ((least(bt, h) * (least(bt, h) + 1)) // 2
                   + case when bt - h > 0 then
                       (bt - h) * (nn - h)
                       - ((bt - h - 1) * (bt - h)) // 2
                     else 0 end) as rs
          from seg
        ),
        ab as (
          select max(n_a) as n_a, max(n_b) as n_b,
                 sum(na * cast(round(cast(rs as double)
                                     / cast(nt as double) * 1e6, 0)
                               as bigint)) as ab_micro
          from sc
        )
        select 'click' as group_a, 'error' as group_b, n_a, n_b,
               case when n_a > 0 and n_b > 0 then
                 round(cast(ab_micro as double) / 1e6, 6)
               end as ab_stat
        from ab
    """

    out["grubbs_test"] = """
        with base as (
          select cast(o_totalprice as decimal(18,2)) as v
          from orders where o_totalprice is not null
        ),
        mom as (
          select cast(count(*) as bigint) as n,
                 cast(sum(v) as decimal(38,2)) as s,
                 cast(sum(cast(v as decimal(38,4)) * v)
                      as decimal(38,4)) as q
          from base
        ),
        picked as (
          select max(struct_pack(
                   d := abs(cast(n as decimal(38,4))
                            * cast(v as decimal(38,4))
                            - cast(s as decimal(38,4))),
                   v := v)) as top,
                 max(n) as n, max(s) as s, max(q) as q
          from base, mom
        ),
        st as (
          select n, s, q, top,
                 cast(s as double) / n as mean,
                 (cast(q as double)
                  - cast(s as double) * cast(s as double) / n)
                 / (n - 1.0) as var
          from picked
        )
        select n,
               round(mean, 6) as mean,
               case when var > 0 then round(sqrt(var), 6) end as stddev,
               case when n >= 3 and var > 0
                    then cast(top.v as double) end as suspect_value,
               case when n >= 3 and var > 0 then
                 round(cast(top.d as double) / (n * sqrt(var)), 6)
               end as g_stat
        from st
    """

    out["dixon_q"] = """
        with base as (
          select cast(o_totalprice as decimal(18,2)) as v
          from orders where o_totalprice is not null
        ),
        ext as (
          select cast(count(*) as bigint) as n,
                 min(v) as lo, max(v) as hi
          from base
        ),
        stats as (
          select max(n) as n, max(lo) as lo, max(hi) as hi,
                 sum(case when v = lo then 1 else 0 end) as nlo,
                 sum(case when v = hi then 1 else 0 end) as nhi,
                 min(case when v > lo then v end) as x2,
                 max(case when v < hi then v end) as xn1
          from base, ext
        )
        select n,
               cast(lo as double) as x_min,
               cast(hi as double) as x_max,
               case when n >= 3 and hi > lo then
                 round(cast((case when nlo > 1 then lo else x2 end) - lo
                            as double)
                       / cast(hi - lo as double), 6)
               end as q_low,
               case when n >= 3 and hi > lo then
                 round(cast(hi - (case when nhi > 1 then hi else xn1 end)
                            as double)
                       / cast(hi - lo as double), 6)
               end as q_high
        from stats
    """

    out["welch_anova"] = """
        with base as (
          select event_type as g, cast(value as decimal(18,2)) as v
          from events
          where value is not null and event_type is not null
        ),
        perg as (
          select g, cast(count(*) as bigint) as n,
                 cast(sum(v) as decimal(38,2)) as s,
                 cast(sum(cast(v as decimal(38,4)) * v)
                      as decimal(38,4)) as q
          from base group by g
        ),
        scored as (
          select g, n,
                 cast(s as double) / cast(n as double) as mean,
                 (cast(q as double)
                  - cast(s as double) * cast(s as double)
                    / cast(n as double))
                 / (cast(n as double) - 1.0) as s2
          from perg
        ),
        folded as (
          select cast(count(*) as bigint) as k_groups,
                 cast(sum(n) as bigint) as n,
                 cast(min(n) as bigint) as minn,
                 min(s2) as mins2,
                 list_reduce(
                   list_prepend(0.0::double,
                     list(n / s2 order by g)),
                   (a, x) -> a + x) as w,
                 list_reduce(
                   list_prepend(0.0::double,
                     list((n / s2) * mean order by g)),
                   (a, x) -> a + x) as wm
          from scored
        ),
        terms as (
          select s.g, f.k_groups, f.n, f.minn, f.mins2,
                 (s.n / s.s2) * (s.mean - f.wm / f.w)
                   * (s.mean - f.wm / f.w) as aterm,
                 (1.0 - (s.n / s.s2) / f.w)
                   * (1.0 - (s.n / s.s2) / f.w)
                   / (s.n - 1.0) as bterm
          from scored s, folded f
        ),
        final as (
          select k_groups, n, minn, mins2,
                 list_reduce(
                   list_prepend(0.0::double, list(aterm order by g)),
                   (a, x) -> a + x) as asum,
                 list_reduce(
                   list_prepend(0.0::double, list(bterm order by g)),
                   (a, x) -> a + x) as bsum
          from terms group by 1, 2, 3, 4
        )
        select k_groups, n,
               case when k_groups >= 2 and minn >= 2 and mins2 > 0
               then round(
                 (asum / (k_groups - 1.0))
                 / (1.0 + (2.0 * (k_groups - 2.0)
                           / (cast(k_groups as double) * k_groups - 1.0))
                        * bsum), 6)
               end as f_stat
        from final
    """

    out["quade_test"] = """
        with daily as (
          select cast(ts as date) as b, event_type as j,
                 sum(cast(value as decimal(18,2))) as v
          from events
          where ts is not null and event_type is not null
            and value is not null
          group by 1, 2
        ),
        kk as (select count(distinct j)::bigint as k from daily),
        bc as (
          select b, count(*) as nb, count(distinct j) as nj
          from daily group by b
        ),
        nblocks as (select count(*)::bigint as n_blocks from bc),
        complete as (
          select b from bc, kk where nb = k and nj = k
        ),
        kept as (select d.* from daily d join complete using (b)),
        ranked as (
          select a.b, a.j,
                 cast(2 * sum(case when c.v < a.v then 1 else 0 end)
                      + sum(case when c.v = a.v then 1 else 0 end)
                      + 1 as bigint) as r2
          from kept a join kept c on a.b = c.b
          group by a.b, a.j
        ),
        ranges as (
          select b, max(v) - min(v) as d from kept group by b
        ),
        qrank as (
          select a.b,
                 cast(2 * sum(case when c.d < a.d then 1 else 0 end)
                      + sum(case when c.d = a.d then 1 else 0 end)
                      + 1 as bigint) as q2
          from ranges a cross join ranges c
          group by a.b
        ),
        scored as (
          select r.b, r.j,
                 cast(q2 as decimal(38,0))
                   * cast(r2 - (k + 1) as decimal(38,0)) as s4
          from ranked r join qrank using (b), kk
        ),
        perj as (
          select j, cast(sum(s4) as decimal(38,0)) as s4j
          from scored group by j
        ),
        a16 as (
          select cast(sum(s4 * s4) as decimal(38,0)) as a16,
                 cast(count(*) / max(k) as bigint) as n_complete,
                 max(k) as k_treatments
          from scored, kk
        ),
        b16b as (
          select cast(sum(s4j * s4j) as decimal(38,0)) as b16b
          from perj
        )
        select k_treatments,
               (select n_blocks from nblocks) as n_blocks,
               n_complete,
               case when k_treatments >= 2 and n_complete > 1
                         and cast(n_complete as decimal(38,0)) * a16
                             - b16b > 0 then
                 round(cast(cast(n_complete - 1 as decimal(38,0)) * b16b
                            as double)
                       / cast(cast(n_complete as decimal(38,0)) * a16
                              - b16b as double), 6)
               end as f_stat
        from a16, b16b
    """

    out["bartlett"] = """
        with base as (
          select event_type as g, cast(value as decimal(18,2)) as v
          from events
          where value is not null and event_type is not null
        ),
        perg as (
          select g, cast(count(*) as bigint) as n,
                 cast(sum(v) as decimal(38,2)) as s,
                 cast(sum(cast(v as decimal(38,4)) * v)
                      as decimal(38,4)) as q
          from base group by g
        ),
        scored as (
          select g, n,
                 (cast(q as double)
                  - cast(s as double) * cast(s as double)
                    / cast(n as double))
                 / (cast(n as double) - 1.0) as s2
          from perg
        ),
        folded as (
          select cast(count(*) as bigint) as k_groups,
                 cast(sum(n) as bigint) as n,
                 cast(min(n) as bigint) as minn,
                 min(s2) as mins2,
                 list_reduce(
                   list_prepend(0.0::double,
                     list((n - 1.0) * s2 order by g)),
                   (a, x) -> a + x) as pool_num,
                 list_reduce(
                   list_prepend(0.0::double,
                     list((n - 1.0) * (case when s2 > 0 then ln(s2)
                                       else 0.0 end) order by g)),
                   (a, x) -> a + x) as ln_sum,
                 list_reduce(
                   list_prepend(0.0::double,
                     list(1.0 / (n - 1.0) order by g)),
                   (a, x) -> a + x) as recip
          from scored
        )
        select k_groups, n,
               case when k_groups >= 2 and minn >= 2 and mins2 > 0
               then round(
                 ((n - cast(k_groups as double))
                    * ln(pool_num / (n - cast(k_groups as double)))
                  - ln_sum)
                 / (1.0 + (recip - 1.0 / (n - cast(k_groups as double)))
                          / (3.0 * (k_groups - 1.0))), 6)
               end as t_stat
        from folded
    """

    out["mahalanobis_outliers"] = """
        with base as (
          select l_orderkey * 10 + l_linenumber as rid,
                 cast(l_quantity as decimal(18,2)) as x,
                 cast(l_extendedprice as decimal(18,2)) as y
          from lineitem
          where l_quantity is not null and l_extendedprice is not null
        ),
        mom as (
          select cast(count(*) as bigint) as n,
                 sum(x) as sx, sum(y) as sy,
                 sum(cast(x as decimal(38,4)) * x) as sxx,
                 sum(cast(y as decimal(38,4)) * y) as syy,
                 sum(cast(x as decimal(38,4)) * y) as sxy
          from base
        ),
        cen as (
          select n,
                 n * cast(sxx as double)
                   - cast(sx as double) * cast(sx as double) as cxx,
                 n * cast(syy as double)
                   - cast(sy as double) * cast(sy as double) as cyy,
                 n * cast(sxy as double)
                   - cast(sx as double) * cast(sy as double) as cxy,
                 cast(sx as double) as sxd, cast(sy as double) as syd
          from mom
        ),
        scored as (
          select rid, cast(x as double) as x, cast(y as double) as y,
                 round((n - 1.0)
                       * (cyy * (n * cast(b.x as double) - sxd)
                            * (n * cast(b.x as double) - sxd)
                          - 2.0 * cxy * (n * cast(b.x as double) - sxd)
                            * (n * cast(b.y as double) - syd)
                          + cxx * (n * cast(b.y as double) - syd)
                            * (n * cast(b.y as double) - syd))
                       / (n * (cxx * cyy - cxy * cxy)), 6) as d2
          from base b, cen
          where n >= 3 and cxx * cyy - cxy * cxy > 0
        )
        select rid, x, y, d2 from scored
        where d2 > 4.61
        order by d2 desc, rid
    """

    out["fdr_bh"] = f"""
        with g as (
          select event_type, count(value) as n,
                 round(cast(sum(cast(value as decimal(18,2)))
                            as double) / count(value), 6) as mean
          from events group by 1
        ),
        gl as (
          select round(cast(sum(cast(value as decimal(18,2)))
                            as double) / count(value), 6) as m0,
                 round(cast(sum(cast(value as decimal(18,2))
                                * cast(value as decimal(18,2)))
                            as double) / count(value), 6) as m2
          from events
        ),
        s as (
          select g.*, round(case when m2 - m0 * m0 > 0
                            then (mean - m0)
                                 / sqrt((m2 - m0 * m0) / n) end, 6) as z
          from g, gl
        ),
        p as (
          select *, case when z is not null then
                 round(least(1.0, 2.0 * {_psf}), 6) end as p_value
          from s
        ),
        r as (
          select *,
                 row_number() over (order by p_value nulls last,
                                    event_type)
                   as p_rank,
                 count(*) over () as m
          from p
        ),
        rs as (
          select *,
                 max(case when p_value <= p_rank / m * 0.1
                     then p_rank end) over () as rstar
          from r
        )
        select event_type, cast(n as bigint) as n, mean, z,
               p_value, p_rank,
               coalesce(p_rank <= rstar, false) as rejected
        from rs order by event_type
    """
    # raking: integer row marginal, sorted-fold column marginal,
    # one rounded division per factor
    _rt = (
        "case r when '1-URGENT' then 0.2 when '2-HIGH' then 0.2 "
        "when '3-MEDIUM' then 0.2 when '4-NOT SPECIFIED' then 0.2 "
        "when '5-LOW' then 0.2 else 0.0 end"
    )
    _ct = (
        "case c when 'O' then 0.7 when 'F' then 0.2 "
        "when 'P' then 0.1 else 0.0 end"
    )
    out["rake_weights"] = f"""
        with cells as (
          select o_orderpriority as r, o_orderstatus as c,
                 count(*) as n
          from orders group by 1, 2
        ),
        tot as (select count(*) as nn from orders),
        rowm as (select r, sum(n) as row_n from cells group by r),
        f1 as (
          select cells.r, cells.c, cells.n,
                 round(({_rt}) * nn / row_n, 6) as f_row
          from cells join rowm using (r), tot
        ),
        w1 as (select *, n * f_row as w1 from f1),
        colm as (
          select c as cc,
                 list_reduce(
                   list_prepend(0.0::double, list(w1 order by w1)),
                   (acc, x) -> acc + x) as col_w
          from w1 group by c
        )
        select w1.r as o_orderpriority, w1.c as o_orderstatus,
               cast(n as bigint) as n, f_row,
               round(({_ct}) * nn / col_w, 6) as f_col,
               round(f_row * round(({_ct}) * nn / col_w, 6), 6)
                 as weight
        from w1 join colm on w1.c = colm.cc, tot
        order by o_orderpriority, o_orderstatus
    """
    # column profiler: per-column union, catalog-stats string render
    _prof_cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    out["column_profile"] = "\nunion all\n".join(
        f"""
        select '{c}' as "column", count(*) as n_rows,
               cast(count(*) - count({c}) as bigint) as n_null,
               cast(count(distinct {c}) as bigint) as n_distinct,
               cast(min({c}) as varchar) as min_value,
               cast(max({c}) as varchar) as max_value
        from orders
        """
        for c in _prof_cols
    ) + '\norder by "column"'

    # off-policy eval: integer-weight rationals clear the propensity
    # denominators, so every sum is exact until one rounded division
    out["snips_ope"] = """
        with w as (
          select cast(value as decimal(18,2)) as r,
                 case when event_type = (case when user_id % 2 = 0
                                         then 'click' else 'view' end)
                      then 1 else 0 end as m,
                 cast(25200 / (('0x' || substr(md5(cast(event_id
                        as varchar)), 1, 8))::bigint % 9 + 1)
                      as bigint) as c
          from events
        ),
        a as (
          select count(*) as n_logged, sum(m) as n_matched,
                 sum(case when m = 1 then r * c
                     else cast(0 as decimal(18,2)) end) as wsum_r,
                 sum(c * m) as wsum,
                 sum(c * c * m) as w2sum
          from w
        )
        select cast(n_logged as bigint) as n_logged,
               cast(n_matched as bigint) as n_matched,
               round(cast(wsum_r as double) / 2520.0 / n_logged, 6)
                 as ips_value,
               round(case when wsum > 0 then
                     cast(wsum_r as double) / cast(wsum as double)
                     end, 6) as snips_value,
               round(case when w2sum > 0 then
                     cast(wsum as double) * cast(wsum as double)
                     / cast(w2sum as double) end, 6) as ess
        from a
    """
    # local clustering: wedge join + closing-edge join, hub guard
    # censoring mirrored
    out["local_clustering"] = """
        with e0 as (
          select distinct l_orderkey % 6000 as src,
                 l_partkey % 6000 as dst
          from lineitem
        ),
        sym as (
          select src as a, dst as b from e0 where src <> dst
          union
          select dst as a, src as b from e0 where src <> dst
        ),
        deg as (select a, count(*) as degree from sym group by a),
        capped as (
          select sym.a, sym.b from sym join deg using (a)
          where degree <= 150
        ),
        wedges as (
          select l.a as v, l.b as n1, r.b as n2
          from capped l join capped r
            on l.a = r.a and l.b < r.b
        ),
        closed as (
          select v, count(*) as triangles
          from wedges
          join (select a as n1, b as n2 from sym) ce
            using (n1, n2)
          group by v
        ),
        o as (
          select deg.a as node, deg.degree,
                 case when deg.degree > 150 then null
                      else coalesce(c.triangles, 0) end as triangles
          from deg left join closed c on c.v = deg.a
        )
        select node, cast(degree as bigint) as degree,
               cast(triangles as bigint) as triangles,
               case when degree > 150 then null
                    when degree < 2 then 0.0
                    else round(2.0 * triangles
                               / (degree * (degree - 1)), 6)
               end as lcc
        from o
        order by lcc desc nulls last, node
        limit 100
    """
    # language-ID confusion matrix: shared lang_case macro
    out["langid_confusion"] = f"""
        with cells as (
          select lang, {lang_case} as lang_pred, count(*) as n
          from documents group by 1, 2
        ),
        tot as (select lang, sum(n) as t from cells group by lang)
        select cells.lang, lang_pred, cast(n as bigint) as n,
               round(n / t, 6) as share,
               cells.lang = lang_pred as is_correct
        from cells join tot using (lang)
        order by lang, lang_pred
    """

    # perplexity deciles: the window ntile IS the spec for
    # scalable_ntile; unigram scoring shared with unigram_logprob
    out["perplexity_buckets"] = f"""
        with tok as (
          select doc_id,
                 unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        v as (select w, count(*) as c from tok group by w),
        n as (select count(*) as total from tok),
        scored as (
          select doc_id,
                 round(avg(log10(c::double / total)), 6) as s
          from tok join v using (w), n
          group by doc_id
        ),
        tiled as (
          select d.n_chars, sc.s,
                 ntile(10) over (order by sc.s, sc.doc_id) as bucket
          from scored sc join documents d using (doc_id)
        )
        select bucket, count(*) as n_docs,
               min(s) as lo_score, max(s) as hi_score,
               cast(sum(n_chars) as bigint) as chars,
               round(sum(n_chars)
                     / (select sum(n_chars) from tiled), 6)
                 as char_share
        from tiled group by bucket order by bucket
    """
    # tokenizer fertility: integer sums, two rounded ratios
    out["token_fertility"] = f"""
        select lang, source, count(*) as n_docs,
               cast(sum(len({_TOKENS})) as bigint) as n_tokens,
               cast(sum(len(regexp_extract_all(text,
                    '[A-Za-z]{{1,4}}|\\d|[^\\sA-Za-z\\d]')))
                    as bigint) as n_subwords,
               cast(sum(n_chars) as bigint) as n_chars,
               round(sum(len(regexp_extract_all(text,
                     '[A-Za-z]{{1,4}}|\\d|[^\\sA-Za-z\\d]')))
                     / nullif(sum(len({_TOKENS})), 0), 6)
                 as fertility,
               round(sum(n_chars)
                     / nullif(sum(len(regexp_extract_all(text,
                       '[A-Za-z]{{1,4}}|\\d|[^\\sA-Za-z\\d]'))), 0),
                     6) as chars_per_subword
        from documents
        group by lang, source
        order by lang, source
    """
    # sequential-pattern support: per-user positions, (user, type)
    # summary self-join — never event x event
    out["seq_patterns"] = """
        with pos as (
          select user_id as u, event_type as t,
                 row_number() over (partition by user_id
                                    order by ts, event_id) as rn
          from events where ts is not null
        ),
        s as (
          select u, t, min(rn) as first_rn, max(rn) as last_rn
          from pos group by 1, 2
        ),
        tot as (select count(distinct u) as nu from s),
        sup as (
          select a.t as from_type, b.t as to_type,
                 count(*) as n_users
          from s a join s b on a.u = b.u
                           and a.first_rn < b.last_rn
          group by 1, 2
        )
        select from_type, to_type,
               cast(n_users as bigint) as n_users,
               round(n_users / nu, 6) as support_ratio
        from sup, tot
        where n_users >= 2
        order by from_type, to_type
    """
    # diff-in-diff: four decimal-exact cell means, double arithmetic
    out["did_estimator"] = """
        with cells as (
          select cast(user_id % 2 as int) as variant,
                 cast(ts >= timestamp '2024-01-16 00:00:00' as int)
                   as period,
                 sum(cast(value as decimal(18,2))) as s,
                 count(value) as n
          from events group by 1, 2
        ),
        p as (
          select
            sum(case when variant = 0 and period = 0 then n end)
              as n_c0,
            sum(case when variant = 0 and period = 1 then n end)
              as n_c1,
            sum(case when variant = 1 and period = 0 then n end)
              as n_t0,
            sum(case when variant = 1 and period = 1 then n end)
              as n_t1,
            round(cast(sum(case when variant = 0 and period = 0
                           then s end) as double)
                  / sum(case when variant = 0 and period = 0
                        then n end), 6) as mean_c0,
            round(cast(sum(case when variant = 0 and period = 1
                           then s end) as double)
                  / sum(case when variant = 0 and period = 1
                        then n end), 6) as mean_c1,
            round(cast(sum(case when variant = 1 and period = 0
                           then s end) as double)
                  / sum(case when variant = 1 and period = 0
                        then n end), 6) as mean_t0,
            round(cast(sum(case when variant = 1 and period = 1
                           then s end) as double)
                  / sum(case when variant = 1 and period = 1
                        then n end), 6) as mean_t1
          from cells
        )
        select cast(n_c0 as bigint) as n_c0,
               cast(n_c1 as bigint) as n_c1,
               cast(n_t0 as bigint) as n_t0,
               cast(n_t1 as bigint) as n_t1,
               mean_c0, mean_c1, mean_t0, mean_t1,
               round((mean_t1 - mean_t0) - (mean_c1 - mean_c0), 6)
                 as did
        from p
    """
    # positional inverted index: ordered string_agg rebuilds the
    # identical postings strings; df > 20 hub guard mirrored
    out["inverted_index"] = f"""
        with toks as (
          select doc_id as doc,
                 cast(generate_subscripts(l, 1) - 1 as int) as pos,
                 unnest(l) as term
          from (select doc_id,
                       regexp_extract_all({_NORM}, '\\S+') as l
                from documents)
        ),
        pd as (
          select term, doc, count(*) as tf,
                 cast(doc as varchar) || ':'
                   || string_agg(cast(pos as varchar), '|'
                                 order by pos) as entry
          from toks group by term, doc
        ),
        t as (
          select term, count(*) as df,
                 cast(sum(tf) as bigint) as cf,
                 string_agg(entry, ',' order by doc)
                   as postings_raw
          from pd group by term
        )
        select term, cast(df as bigint) as df, cf,
               case when df <= 20 then postings_raw end as postings
        from t order by term
    """

    # smoothed LOO target encoding: decimal category sums, one
    # rounded division for prior and te
    out["target_encoding"] = """
        with stats as (
          select o_orderpriority,
                 sum(cast(o_totalprice as decimal(18,2))) as s,
                 count(*) as c
          from orders group by 1
        ),
        g as (
          select round(cast(sum(cast(o_totalprice as decimal(18,2)))
                            as double) / count(*), 6) as prior
          from orders
        )
        select o.o_orderkey, o.o_orderpriority, o.o_totalprice,
               round((cast(s - cast(o_totalprice as decimal(18,2))
                           as double) + prior * 20.0)
                     / (c - 1 + 20.0), 6) as te
        from orders o join stats using (o_orderpriority), g
        order by o.o_orderkey
    """
    # hashing trick: bucket = first 8 md5 hex chars mod 64, sign =
    # 9th hex digit parity — identical arithmetic both engines
    out["feature_hash"] = f"""
        with toks as (
          select doc_id,
                 unnest(regexp_extract_all({_NORM}, '\\S+')) as tok
          from documents
        ),
        h as (
          select doc_id,
                 ('0x' || substr(md5(tok), 1, 8))::bigint % 64
                   as bucket,
                 case when ('0x' || substr(md5(tok), 9, 1))::bigint
                           % 2 = 0
                      then 1 else -1 end as sgn
          from toks
        )
        select doc_id, bucket, cast(sum(sgn) as bigint) as weight
        from h group by 1, 2
        having sum(sgn) <> 0
        order by doc_id, bucket
    """
    # RFM: the window ntile IS the spec — the gate proves
    # scalable_ntile reproduces it bit-for-bit
    out["rfm_segments"] = """
        with pc as (
          select o_custkey, max(o_orderdate) as last_o,
                 count(*) as frequency,
                 round(cast(sum(cast(o_totalprice as decimal(18,2)))
                            as double), 2) as monetary
          from orders group by 1
        ),
        g as (select max(o_orderdate) as gmax from orders),
        base as (
          select o_custkey,
                 date_diff('day', last_o, gmax) as recency_days,
                 frequency, monetary
          from pc, g
        ),
        scored as (
          select o_custkey,
                 cast(recency_days as int) as recency_days,
                 frequency, monetary,
                 ntile(5) over (order by recency_days desc,
                                o_custkey) as r_score,
                 ntile(5) over (order by frequency, o_custkey)
                   as f_score,
                 ntile(5) over (order by monetary, o_custkey)
                   as m_score
          from base
        )
        select *,
               r_score::varchar || '-' || f_score::varchar || '-'
                 || m_score::varchar as segment
        from scored order by o_custkey
    """
    # 2-D skyline: per-price min size beating every cheaper price's
    # min size (strict-prefix window states the frontier directly)
    out["skyline_parts"] = """
        with g as (
          select p_retailprice as price, min(p_size) as s
          from part group by 1
        ),
        r as (
          select price, s,
                 min(s) over (order by price
                              rows between unbounded preceding
                              and 1 preceding) as pm
          from g
        ),
        sky as (select price, s from r where pm is null or s < pm)
        select p.*
        from part p
        join sky on p.p_retailprice = sky.price
                and p.p_size = sky.s
        order by p.p_partkey
    """
    # CUPED: decimal per-user sums, five rounded moments, pure
    # double theta/rho2/mean identities — literal-for-literal
    out["cuped"] = """
        with pu as (
          select user_id as unit,
                 cast(user_id % 2 as int) as variant,
                 coalesce(sum(case when ts < timestamp
                                        '2024-01-16 00:00:00'
                              then cast(value as decimal(18,2)) end),
                          cast(0 as decimal(18,2))) as x,
                 coalesce(sum(case when ts >= timestamp
                                        '2024-01-16 00:00:00'
                              then cast(value as decimal(18,2)) end),
                          cast(0 as decimal(18,2))) as y
          from events group by 1, 2
        ),
        mom as (
          select round(cast(sum(x) as double) / count(*), 6) as m_x,
                 round(cast(sum(y) as double) / count(*), 6) as m_y,
                 round(cast(sum(x * y) as double) / count(*), 6)
                   as m_xy,
                 round(cast(sum(x * x) as double) / count(*), 6)
                   as m_xx,
                 round(cast(sum(y * y) as double) / count(*), 6)
                   as m_yy
          from pu
        ),
        pv as (
          select variant, count(*) as n_units,
                 round(cast(sum(y) as double) / count(*), 6)
                   as mean_y,
                 round(cast(sum(x) as double) / count(*), 6)
                   as mean_x_v
          from pu group by 1
        )
        select variant, n_units, mean_y,
               round(mean_y - round((m_xy - m_x * m_y)
                                    / (m_xx - m_x * m_x), 6)
                              * (mean_x_v - m_x), 6) as mean_y_adj,
               round((m_xy - m_x * m_y) / (m_xx - m_x * m_x), 6)
                 as theta,
               round((m_xy - m_x * m_y) * (m_xy - m_x * m_y)
                     / ((m_xx - m_x * m_x) * (m_yy - m_y * m_y)), 6)
                 as rho2
        from pv, mom
        order by variant
    """
    # degree assortativity: exact decimal cross-moments over the
    # 2|E| half-edges, one double expression
    out["degree_assortativity"] = """
        with e0 as (
          select distinct o_custkey % 150 as src,
                 1000 + o_orderkey % 97 as dst
          from orders
        ),
        sym as (
          select src as a, dst as b from e0 where src <> dst
          union
          select dst as a, src as b from e0 where src <> dst
        ),
        deg as (select a, count(*) as deg from sym group by a),
        pairs as (
          select sym.a, da.deg as dx, db.deg as dy
          from sym
          join deg da on sym.a = da.a
          join deg db on sym.b = db.a
        ),
        mo as (
          select count(*) as m,
                 count(distinct a) as n_nodes,
                 sum(cast(dx as decimal(38,0))) as sx,
                 sum(cast(dy as decimal(38,0))) as sy,
                 sum(cast(dx * dy as decimal(38,0))) as sxy,
                 sum(cast(dx * dx as decimal(38,0))) as sxx,
                 sum(cast(dy * dy as decimal(38,0))) as syy
          from pairs
        ),
        f as (
          select cast(n_nodes as bigint) as n_nodes,
                 cast(m // 2 as bigint) as n_edges,
                 cast(sxy as double)
                   - cast(sx as double) * cast(sy as double)
                     / cast(m as double) as num,
                 sqrt((cast(sxx as double)
                       - cast(sx as double) * cast(sx as double)
                         / cast(m as double))
                      * (cast(syy as double)
                         - cast(sy as double) * cast(sy as double)
                           / cast(m as double))) as den
          from mo
        )
        select n_nodes, n_edges,
               round(case when den > 0 then num / den end, 6)
                 as assortativity
        from f
    """
    # t-closeness: exact integer |cum_c*N - cum_C*n| terms, one
    # rounded division per class
    out["t_closeness"] = """
        with rng as (
          select min(o_totalprice) as lo, max(o_totalprice) as hi,
                 count(*) as gn
          from orders where o_totalprice is not null
        ),
        binned as (
          select o_orderpriority, o_orderstatus,
                 cast(least(floor((o_totalprice - lo)
                                  / (case when hi - lo = 0 then 1.0
                                          else hi - lo end) * 10),
                            9) as int) as bin
          from orders, rng
          where o_totalprice is not null
        ),
        hist as (
          select o_orderpriority, o_orderstatus, bin,
                 count(*) as c
          from binned group by 1, 2, 3
        ),
        classes as (
          select o_orderpriority, o_orderstatus,
                 sum(c) as n_rows
          from hist group by 1, 2
        ),
        bins as (select unnest(range(0, 10)) as bin),
        dense as (
          select cl.o_orderpriority, cl.o_orderstatus, cl.n_rows,
                 b.bin, coalesce(h.c, 0) as c
          from classes cl
          cross join bins b
          left join hist h
            on h.o_orderpriority = cl.o_orderpriority
           and h.o_orderstatus = cl.o_orderstatus
           and h.bin = b.bin
        ),
        ghist as (
          select bin, count(*) as gc from binned group by 1
        ),
        gdense as (
          select b.bin, coalesce(g.gc, 0) as gc
          from bins b left join ghist g on g.bin = b.bin
        ),
        cum as (
          select d.o_orderpriority, d.o_orderstatus, d.n_rows,
                 (select gn from rng) as gn,
                 sum(d.c) over (partition by d.o_orderpriority,
                                d.o_orderstatus order by d.bin
                                rows between unbounded preceding
                                and current row) as cum_c,
                 sum(gd.gc) over (partition by d.o_orderpriority,
                                  d.o_orderstatus order by d.bin
                                  rows between unbounded preceding
                                  and current row) as cum_gc
          from dense d join gdense gd on gd.bin = d.bin
        )
        select o_orderpriority, o_orderstatus,
               cast(n_rows as bigint) as n_rows,
               round(cast(sum(abs(cast(cum_c as decimal(38,0))
                                  * cast(gn as decimal(38,0))
                                  - cast(cum_gc as decimal(38,0))
                                  * cast(n_rows as decimal(38,0))))
                          as double)
                     / (cast(n_rows as double) * cast(gn as double)
                        * 9.0), 6) as t_emd,
               round(cast(sum(abs(cast(cum_c as decimal(38,0))
                                  * cast(gn as decimal(38,0))
                                  - cast(cum_gc as decimal(38,0))
                                  * cast(n_rows as decimal(38,0))))
                          as double)
                     / (cast(n_rows as double) * cast(gn as double)
                        * 9.0), 6) <= 0.2 as within_t
        from cum
        group by o_orderpriority, o_orderstatus, n_rows, gn
        order by 1, 2
    """

    # ExactSubstr (Lee et al. 2021) via the window equivalence: a
    # position is covered by a repeated >=15-token substring iff it is
    # covered by a repeated 15-token window; spans = islands over the
    # covered-position set (identical to the engine's interval merge —
    # every interval has length 15, so intervals merge iff their
    # covered positions touch)
    _ess_cov = """
        toks as (select doc_id,
                        regexp_extract_all(trim(text), '\\S+') as t
                 from documents),
        w as (
          select doc_id, u.pos as pos,
                 array_to_string(t[u.pos + 1 : u.pos + 15], ' ') as wstr
          from toks,
               lateral (select unnest(range(0, greatest(len(t) - 14, 0)))
                        as pos) u
        ),
        dup as (select wstr from w group by wstr having count(*) >= 2),
        hit as (select w.doc_id, w.pos from w join dup using (wstr)),
        cov as (
          select distinct doc_id, pos + k.k as p
          from hit, lateral (select unnest(range(0, 15)) as k) k
        ),
        isl as (
          select doc_id, p,
                 p - row_number() over (partition by doc_id
                                        order by p) as g
          from cov
        )"""
    out["exact_substring_spans"] = f"""
        with {_ess_cov}
        select doc_id,
               min(p) as span_start,
               max(p) + 1 as span_end,
               max(p) + 1 - min(p) as span_tokens
        from isl group by doc_id, g
        order by doc_id, span_start
    """
    out["exact_substring_dedup"] = f"""
        with {_ess_cov},
        cova as (select doc_id, list(p order by p) as ps
                 from cov group by doc_id),
        spc as (
          select doc_id, count(*) as n_spans
          from (select doc_id, g from isl group by doc_id, g)
          group by doc_id
        )
        select t.doc_id,
               len(t.t) as n_tokens,
               coalesce(len(c.ps), 0) as dup_tokens,
               coalesce(s.n_spans, 0) as n_spans,
               -- coalesce: DuckDB array_to_string([]) is NULL, the
               -- engine's array_join([]) is ''
               coalesce(array_to_string(
                 list_transform(
                   list_filter(range(0, len(t.t)),
                               i -> c.ps is null
                                    or not list_contains(c.ps, i)),
                   i -> t.t[i + 1]),
                 ' '), '') as clean_text
        from toks t
        left join cova c using (doc_id)
        left join spc s using (doc_id)
        order by t.doc_id
    """
    # curriculum interleave: window ntile arithmetic + derived columns
    out["curriculum_order"] = f"""
        with d as (select doc_id, {quality_expr} as difficulty
                   from documents),
        rn as (
          select doc_id, difficulty,
                 row_number() over (order by difficulty, doc_id) as rn,
                 count(*) over () as t
          from d
        ),
        p as (
          select *,
                 t // 10 as q, t % 10 as r,
                 (t % 10) * (t // 10 + 1) as head
          from rn
        ),
        b as (
          select *,
                 case when q = 0 then rn
                      when rn <= head then (rn - 1) // (q + 1) + 1
                      else r + (rn - 1 - head) // q + 1 end as bucket,
                 case when q = 0 then rn - 1
                      when rn <= head then
                        ((rn - 1) // (q + 1)) * (q + 1)
                      else head
                           + ((rn - 1 - head) // q) * q end as start
          from p
        )
        select doc_id, difficulty,
               cast(bucket as int) as bucket,
               cast(rn - start as bigint) as cycle,
               cast((rn - start - 1) * 10 + bucket as bigint)
                 as curriculum_key
        from b order by doc_id
    """
    # Zipf head fit: top-1000 terms, 6dp micro logs, exact decimal sums
    out["zipf_slope"] = f"""
        with uni as (
          select unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        wc as (select w, count(*) as c from uni group by w),
        topk as (
          select w, c,
                 row_number() over (order by c desc, w asc) as r
          from wc
          qualify row_number() over (order by c desc, w asc) <= 1000
        ),
        pts as (
          select cast(round(log10(cast(r as double)) * 1000000, 0)
                      as hugeint) as x,
                 cast(round(log10(cast(c as double)) * 1000000, 0)
                      as hugeint) as y
          from topk
        ),
        s as (
          select cast(count(*) as hugeint) as n,
                 sum(x)::hugeint as sx, sum(y)::hugeint as sy,
                 sum(x * y)::hugeint as sxy,
                 sum(x * x)::hugeint as sxx
          from pts
        )
        select cast(n as bigint) as n_terms,
               case when n * sxx - sx * sx <> 0 then
                 round(cast(n * sxy - sx * sy as double)
                       / cast(n * sxx - sx * sx as double), 6)
               end as slope,
               case when n * sxx - sx * sx <> 0 then
                 round((cast(sy as double) / 1000000.0
                        - round(cast(n * sxy - sx * sy as double)
                                / cast(n * sxx - sx * sx as double), 6)
                          * (cast(sx as double) / 1000000.0))
                       / cast(n as double), 6)
               end as intercept
        from s
    """
    # snapshot diff: synthetic new snapshot (removals, edits, group
    # moves, additions) + full-outer status census with per-group
    # moved_in/moved_out rows on both sides of each move
    out["corpus_diff"] = """
        with old_ as (select doc_id, source, text from documents),
        new_ as (
          select doc_id,
                 case when doc_id % 11 = 0
                      then 'src' || cast((doc_id + 1) % 20 as varchar)
                      else source end as source,
                 case when doc_id % 13 = 0 then text || ' v2'
                      else text end as text
          from documents where doc_id % 97 <> 0
          union all
          select doc_id + 500000 as doc_id, source, text
          from documents where doc_id < 5
        ),
        ho as (select doc_id as id, source as g_old,
                      md5(coalesce(cast(doc_id as varchar), '') || '|'
                          || coalesce(text, chr(0) || 'null')) as h_old
               from old_),
        hn as (select doc_id as id, source as g_new,
                      md5(coalesce(cast(doc_id as varchar), '') || '|'
                          || coalesce(text, chr(0) || 'null')) as h_new
               from new_),
        j as (select * from ho full outer join hn using (id)),
        st as (
          select coalesce(g_new, g_old) as grp,
                 case when h_old is null then 'added'
                      when h_new is null then 'removed'
                      when h_old <> h_new then 'changed'
                      else 'unchanged' end as s,
                 case when h_old is not null and h_new is not null
                           and g_old is distinct from g_new
                      then 1 else 0 end as mi,
                 0 as mo
          from j
          union all
          select g_old as grp, null as s, 0 as mi, 1 as mo
          from j
          where h_old is not null and h_new is not null
            and g_old is distinct from g_new
        )
        select grp as source,
               cast(sum(case when s = 'added' then 1 else 0 end)
                    as bigint) as n_added,
               cast(sum(case when s = 'removed' then 1 else 0 end)
                    as bigint) as n_removed,
               cast(sum(case when s = 'changed' then 1 else 0 end)
                    as bigint) as n_changed,
               cast(sum(case when s = 'unchanged' then 1 else 0 end)
                    as bigint) as n_unchanged,
               cast(sum(mi) as bigint) as n_moved_in,
               cast(sum(mo) as bigint) as n_moved_out
        from st group by grp order by grp
    """
    # hard negatives: region assign (count-driven auto-k slice like
    # diverse_sample), self/positive exclusion, 6dp cosine topk
    out["hard_negatives"] = f"""
        with b as (
          select vec_id, cast(embedding as double[]) as v,
                 sqrt(list_dot_product(cast(embedding as double[]),
                                       cast(embedding as double[])))
                   as nrm,
                 {_ivf_assign_autok_sql(dim=64, max_k=32, seed=42)}
                   as r
          from embeddings
        ),
        q as (select vec_id as qid, v as qv, nrm as qn, r
              from b where vec_id % 100 = 0),
        cand as (
          select q.qid, b.vec_id as neg_id,
                 case when q.qn * b.nrm > 0
                      then round(list_dot_product(q.qv, b.v)
                                 / (q.qn * b.nrm), 6)
                      else -2.0 end as cos_sim
          from q join b on b.r = q.r
          where b.vec_id <> q.qid and b.vec_id <> q.qid + 1
        )
        select qid as query_id, neg_id,
               cast(rn as int) as rank, cos_sim
        from (
          select *, row_number() over (partition by qid
                       order by cos_sim desc, neg_id asc) as rn
          from cand
        ) where rn <= 3
        order by query_id, rank
    """
    # keep-best rep: the dedup_clusters closure + quality argmax
    out["dedup_keep_best"] = f"""
        with recursive docs2 as (
            select doc_id, text from documents
            union all
            select doc_id + 100000, text from documents where doc_id < 10
        ),
        sig as (
            select doc_id,
                   {_mh_sql(0)} as mh_0, {_mh_sql(1)} as mh_1,
                   {_mh_sql(2)} as mh_2, {_mh_sql(3)} as mh_3
            from docs2
        ),
        banded as (
            select doc_id, md5('0' || '|' || mh_0 || '|' || mh_1) as bk
            from sig where mh_0 is not null
            union all
            select doc_id, md5('1' || '|' || mh_2 || '|' || mh_3) as bk
            from sig where mh_0 is not null
        ),
        prs as (
            select distinct l.doc_id as id_a, r.doc_id as id_b
            from banded l join banded r
              on l.bk = r.bk and l.doc_id < r.doc_id
        ),
        edges as (
            select id_a as a, id_b as b from prs
            union
            select id_b as a, id_a as b from prs
        ),
        reach as (
            select a, a as b from edges
            union
            select a, b from edges
            union
            select r.a, e.b from reach r join edges e on r.b = e.a
        ),
        comp as (select a as id, min(b) as component
                 from reach group by a),
        q as (select doc_id as id, {quality_expr} as quality
              from (select doc_id, text from docs2) documents_alias
                   (doc_id, text)),
        mem as (select comp.component, comp.id, q.quality
                from comp join q using (id))
        select component, id as rep_id,
               cast(nm as bigint) as n_members,
               mq as rep_score
        from (
          select component, id, quality,
                 row_number() over (partition by component
                                    order by quality desc, id asc) as rn,
                 count(*) over (partition by component) as nm,
                 max(quality) over (partition by component) as mq
          from mem
        ) where rn = 1
        order by component
    """
    # order-insensitive manifest: commutative 60-bit md5 sum, exact
    out["corpus_manifest"] = """
        select source,
               cast(count(*) as bigint) as n_docs,
               cast(sum(case when text is null then 1 else 0 end)
                    as bigint) as n_null_text,
               cast(sum(case when text is null
                             then cast(0 as hugeint)
                             else cast(('0x' || substr(
                                     md5(coalesce(cast(doc_id as varchar), '')
                                         || '|' || text),
                                     1, 15))::bigint as hugeint)
                        end) as varchar) as content_sum,
               md5(cast(sum(case when text is null
                                 then cast(0 as hugeint)
                                 else cast(('0x' || substr(
                                         md5(coalesce(cast(doc_id as varchar), '')
                                             || '|' || text),
                                         1, 15))::bigint as hugeint)
                            end) as varchar)
                   || ':' || cast(count(*) as varchar)) as manifest
        from documents
        group by source
        order by source
    """
    # BPE inference: the 5-merge cascade applied per DISTINCT word via
    # wrapped-element greedy folds (acc/elements both varchar[] so
    # list_reduce type-checks), then the in-order flatten per doc
    _bpe_enc_merges = [
        ("k", "e"), ("ke", "y</w>"), ("a", "g"),
        ("ag", "g</w>"), ("t", "a"),
    ]
    _bpe_enc_steps = []
    for _i, (_a, _b) in enumerate(_bpe_enc_merges):
        _bpe_enc_steps.append(f""",
        v{_i + 1} as (
          select w,
                 list_reduce(
                   list_prepend([]::varchar[],
                                list_transform(syms, s -> [s])),
                   (acc, x) -> case
                     when len(acc) > 0 and acc[-1] = '{_a}'
                          and x[1] = '{_b}'
                     then acc[1:len(acc) - 1] || ['{_a}{_b}']
                     else acc || x end) as syms
          from v{_i}
        )""")
    out["bpe_encode"] = f"""
        with tok as (
          select doc_id, regexp_extract_all({_NORM}, '\\S+') as ts
          from documents
        ),
        words as (select distinct unnest(ts) as w from tok),
        v0 as (
          select w,
                 list_append(
                   c[1:len(c) - 1],
                   c[-1] || '</w>') as syms
          from (select w, regexp_extract_all(w, '.') as c from words)
          where len(c) > 0
        ){"".join(_bpe_enc_steps)},
        toks as (
          select doc_id, u.i - 1 as pos, ts[u.i] as w
          from tok,
               lateral (select unnest(range(1, len(ts) + 1)) as i) u
        ),
        j as (select doc_id, pos, syms
              from toks join v{len(_bpe_enc_merges)} using (w)),
        g as (
          select doc_id,
                 cast(count(*) as bigint) as n_words,
                 list(syms order by pos) as ss
          from j group by doc_id
        )
        select doc_id, n_words,
               cast(list_reduce(
                 list_prepend(0::bigint,
                   list_transform(ss, s -> cast(len(s) as bigint))),
                 (a, b) -> a + b) as bigint) as n_subwords,
               round(list_reduce(
                 list_prepend(0::bigint,
                   list_transform(ss, s -> cast(len(s) as bigint))),
                 (a, b) -> a + b) / cast(n_words as double), 6)
                 as fertility,
               array_to_string(flatten(ss), ' ') as encoded_text
        from g order by doc_id
    """
    # held-out Stupid Backoff: counts from even docs, odd docs scored;
    # raw ratios at tri/bi levels, add-one floor at the unigram level,
    # alpha = 0.4 per backoff step; 6dp per-position round BEFORE the
    # sorted fold so sort keys and sums are engine-identical
    out["stupid_backoff"] = f"""
        with tok as (
          select doc_id, regexp_extract_all({_NORM}, '\\S+') as ts
          from documents
        ),
        tr as (select * from tok where doc_id % 2 = 0),
        te as (select * from tok where doc_id % 2 = 1),
        uni as (select unnest(ts) as w from tr),
        uc as (select w, count(*) as c1 from uni group by w),
        k as (select count(*) as vv, sum(c1) as n from uc),
        bgr as (
          select unnest(list_transform(
                   range(1, len(ts)),
                   i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) as p
          from tr
        ),
        bc as (select p.w1 as w1, p.w2 as w2, count(*) as c2
               from bgr group by 1, 2),
        tgr as (
          select unnest(list_transform(
                   range(1, len(ts) - 1),
                   i -> struct_pack(w1 := ts[i], w2 := ts[i + 1],
                                    w3 := ts[i + 2]))) as p
          from tr
        ),
        tc as (select p.w1 as w1, p.w2 as w2, p.w3 as w3,
                      count(*) as c3
               from tgr group by 1, 2, 3),
        pos as (
          select doc_id,
                 unnest(list_transform(
                   range(1, len(ts) - 1),
                   i -> struct_pack(w1 := ts[i], w2 := ts[i + 1],
                                    w3 := ts[i + 2]))) as p
          from te
        ),
        posf as (select doc_id, p.w1 as w1, p.w2 as w2, p.w3 as w3
                 from pos),
        sc as (
          select doc_id,
                 round(log10(
                   case when coalesce(tc.c3, 0) > 0
                             and coalesce(b12.c2, 0) > 0
                        then tc.c3 / cast(b12.c2 as double)
                        else 0.4 * (
                          case when coalesce(b23.c2, 0) > 0
                                    and coalesce(u2.c1, 0) > 0
                               then b23.c2 / cast(u2.c1 as double)
                               else 0.4 * ((coalesce(u3.c1, 0) + 1.0)
                                           / (k.n + k.vv))
                          end)
                   end), 6) as v
          from posf
          left join tc using (w1, w2, w3)
          left join bc b12 on b12.w1 = posf.w1 and b12.w2 = posf.w2
          left join bc b23 on b23.w1 = posf.w2 and b23.w2 = posf.w3
          left join uc u2 on u2.w = posf.w2
          left join uc u3 on u3.w = posf.w3, k
        )
        select doc_id,
               round(list_reduce(
                       list_prepend(0.0, list(v order by v)),
                       (a, b) -> a + b) / count(*), 6) + 0.0
                 as sb_logprob
        from sc group by doc_id order by doc_id
    """
    # Kneser-Ney: type censuses + the two-level interpolation cascade,
    # operation-for-operation the engine's double dag (left-assoc
    # D*f/den*p products, greatest-with-0.0 discounts, add-one floor)
    out["kneser_ney"] = f"""
        with tok as (
          select doc_id, regexp_extract_all({_NORM}, '\\S+') as ts
          from documents
        ),
        tr as (select * from tok where doc_id % 2 = 0),
        te as (select * from tok where doc_id % 2 = 1),
        uc as (select unnest(ts) as w from tr),
        bc as (
          select p.w1 as w1, p.w2 as w2, count(*) as c2
          from (
            select unnest(list_transform(
                     range(1, len(ts)),
                     i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) as p
            from tr) group by 1, 2
        ),
        tc as (
          select p.w1 as w1, p.w2 as w2, p.w3 as w3, count(*) as c3
          from (
            select unnest(list_transform(
                     range(1, len(ts) - 1),
                     i -> struct_pack(w1 := ts[i], w2 := ts[i + 1],
                                      w3 := ts[i + 2]))) as p
            from tr) group by 1, 2, 3
        ),
        f3 as (select w1, w2, count(*) as f3 from tc group by 1, 2),
        k32 as (select w2, w3, count(*) as k32 from tc group by 1, 2),
        mid as (select w2, count(*) as mid from tc group by 1),
        f2 as (select w1 as w2, count(*) as f2 from bc group by 1),
        ku as (select w2 as w3, count(*) as ku from bc group by 1),
        k as (select (select count(distinct w) from uc) as vv,
                     (select count(*) from bc) as btot),
        posf as (
          select doc_id, p.w1 as w1, p.w2 as w2, p.w3 as w3
          from (
            select doc_id,
                   unnest(list_transform(
                     range(1, len(ts) - 1),
                     i -> struct_pack(w1 := ts[i], w2 := ts[i + 1],
                                      w3 := ts[i + 2]))) as p
            from te)
        ),
        sc as (
          select doc_id,
                 round(log10(
                   case when coalesce(b12.c2, 0) > 0
                             and coalesce(f3.f3, 0) > 0
                        then greatest(coalesce(tc.c3, 0) - 0.75, 0.0)
                               / cast(b12.c2 as double)
                             + 0.75 * f3.f3 / cast(b12.c2 as double)
                               * (case when coalesce(mid.mid, 0) > 0
                                  then greatest(coalesce(k32.k32, 0)
                                                - 0.75, 0.0)
                                         / cast(mid.mid as double)
                                       + 0.75 * coalesce(f2.f2, 0)
                                         / cast(mid.mid as double)
                                         * ((coalesce(ku.ku, 0) + 1.0)
                                            / (k.btot + k.vv + 1.0))
                                  else (coalesce(ku.ku, 0) + 1.0)
                                       / (k.btot + k.vv + 1.0) end)
                        else (case when coalesce(mid.mid, 0) > 0
                              then greatest(coalesce(k32.k32, 0)
                                            - 0.75, 0.0)
                                     / cast(mid.mid as double)
                                   + 0.75 * coalesce(f2.f2, 0)
                                     / cast(mid.mid as double)
                                     * ((coalesce(ku.ku, 0) + 1.0)
                                        / (k.btot + k.vv + 1.0))
                              else (coalesce(ku.ku, 0) + 1.0)
                                   / (k.btot + k.vv + 1.0) end)
                   end), 6) as v
          from posf
          left join tc using (w1, w2, w3)
          left join bc b12 on b12.w1 = posf.w1 and b12.w2 = posf.w2
          left join f3 on f3.w1 = posf.w1 and f3.w2 = posf.w2
          left join k32 on k32.w2 = posf.w2 and k32.w3 = posf.w3
          left join mid on mid.w2 = posf.w2
          left join f2 on f2.w2 = posf.w2
          left join ku on ku.w3 = posf.w3, k
        )
        , micro as (
          select doc_id,
                 sum(cast(round(v * 1000000, 0) as bigint)) as s,
                 count(*) as n
          from sc group by doc_id
        )
        select doc_id,
               (case when s >= 0
                     then floor((2 * s + n) / (2.0 * n))
                     else -floor((2 * (-s) + n) / (2.0 * n)) end
                / 1000000.0) + 0.0 as kn_logprob
        from micro order by doc_id
    """
    # distributed PCA: full integer-exact eigensolve replay
    out["pca_pc1"] = _pca_pc1_sql(dim=64, rounds=8)
    # GPT-3/PaLM decontamination: distinct eval 10-grams joined to
    # train windows, per-doc distinct position/eval-doc counts
    out["benchmark_decontaminate"] = """
        with leak as (
          select array_to_string(
                   (regexp_extract_all(trim(text), '\\S+'))[1:12], ' ')
                   as s
          from documents where doc_id = 0
        ),
        base as (
          select doc_id,
                 case when doc_id % 50 <> 0 and doc_id < 10
                      then text
                           || coalesce(' ' || (select s from leak), '')
                      else text end as text
          from documents
        ),
        toks as (select doc_id,
                        regexp_extract_all(trim(text), '\\S+') as t
                 from base),
        w as (
          select doc_id, u.pos as pos,
                 array_to_string(t[u.pos + 1 : u.pos + 10], ' ') as wstr
          from toks,
               lateral (select unnest(range(0, greatest(len(t) - 9, 0)))
                        as pos) u
        ),
        ew as (select distinct wstr, doc_id as eid from w
               where doc_id % 50 = 0),
        tw as (select * from w where doc_id % 50 <> 0),
        fl as (
          select tw.doc_id,
                 count(distinct tw.pos) as flagged_windows,
                 count(distinct ew.eid) as n_eval_docs
          from tw join ew using (wstr)
          group by tw.doc_id
        )
        select t.doc_id,
               cast(greatest(len(t.t) - 9, 0) as bigint) as n_windows,
               cast(coalesce(f.flagged_windows, 0) as bigint)
                 as flagged_windows,
               cast(coalesce(f.n_eval_docs, 0) as bigint) as n_eval_docs,
               coalesce(f.flagged_windows, 0) > 0 as contaminated
        from toks t left join fl f using (doc_id)
        where t.doc_id % 50 <> 0
        order by t.doc_id
    """
    # CCNet per-paragraph curation: replay the query's synthetic
    # 12-word paragraphing, keep-first dedup by (doc_id, idx), the
    # quality threshold (paragraph aliased as `text` so quality_expr
    # applies verbatim), and the in-order reassembly
    out["paragraph_quality_filter"] = f"""
        with toks as (select doc_id,
                             regexp_extract_all(trim(text), '\\S+') as w
                      from documents),
        docp as (
          select doc_id,
                 array_to_string(
                   list_transform(
                     range(0, greatest(cast(ceil(len(w) / 12.0) as int),
                                       1)),
                     i -> array_to_string(w[i*12 + 1 : i*12 + 12], ' ')),
                   chr(10)) as dtext
          from toks
        ),
        split_ as (select doc_id, string_split(dtext, chr(10)) as ps
                   from docp),
        paras as (
          select doc_id, u.i - 1 as idx, trim(ps[u.i]) as text
          from split_,
               lateral (select unnest(range(1, len(ps) + 1)) as i) u
          where trim(ps[u.i]) <> ''
        ),
        -- census-complete like the engine: totals driven by the input
        -- docs, not by surviving paragraphs
        totals as (
          select d.doc_id, coalesce(c.n, 0) as n_paras
          from docp d
          left join (select doc_id, count(*) as n from paras
                     group by doc_id) c using (doc_id)
        ),
        firsts as (
          select doc_id, idx, text from paras
          qualify row_number() over (partition by text
                                     order by doc_id, idx) = 1
        ),
        after_dedup as (select doc_id, count(*) as n_dedup
                        from firsts group by doc_id),
        kept as (
          select doc_id, idx, text from firsts
          where {quality_expr} >= 0.35
        ),
        kept_g as (
          select doc_id, count(*) as n_kept,
                 array_to_string(list(text order by idx), chr(10))
                   as clean_text
          from kept group by doc_id
        )
        select t.doc_id,
               cast(t.n_paras as bigint) as n_paras,
               cast(t.n_paras - coalesce(a.n_dedup, 0) as bigint)
                 as n_dropped_dup,
               cast(coalesce(a.n_dedup, 0) - coalesce(k.n_kept, 0)
                    as bigint) as n_dropped_quality,
               coalesce(k.clean_text, '') as clean_text
        from totals t
        left join after_dedup a using (doc_id)
        left join kept_g k using (doc_id)
        order by t.doc_id
    """

    # identical pipeline through the durable parquet staging path —
    # same clusters, same oracle
    out["ivf_search_fixed"] = _ivf_search_fixed_sql()
    out["dedup_clusters_durable"] = out["dedup_clusters"]
    # the streaming read drains the identical synthetic corpus
    out["python_datasource_stream"] = out["python_datasource"]
    # ---- round 11 oracles ----
    # Hilbert layout: replay normalize_to_bits, then all 8 levels of
    # the public xy2d loop as chained CTEs (reflect-then-swap frame
    # transform; integer-only, so nothing can drift)
    _hil_ctes = []
    _hprev = "hnorm"
    for _idx, _i in enumerate(range(7, -1, -1)):
        _s = 1 << _i
        _hil_ctes.append(f"""
        h{_idx} as (
          select o_custkey, o_totalprice,
                 case when ry = 0
                      then case when rx = 1 then {_s - 1} - hy
                                else hy end
                      else hx end as hx,
                 case when ry = 0
                      then case when rx = 1 then {_s - 1} - hx
                                else hx end
                      else hy end as hy,
                 hd + {_s * _s} * xor(3 * rx, ry) as hd
          from (
            select o_custkey, o_totalprice, hx, hy, hd,
                   case when (hx & {_s}) > 0 then 1 else 0 end as rx,
                   case when (hy & {_s}) > 0 then 1 else 0 end as ry
            from {_hprev}
          )
        )""")
        _hprev = f"h{_idx}"
    out["hilbert_layout"] = f"""
        with bounds as (
          select min(o_custkey)::double as lo_c,
                 max(o_custkey)::double as hi_c,
                 min(o_totalprice)::double as lo_p,
                 max(o_totalprice)::double as hi_p
          from orders
        ),
        hnorm as (
          select o_custkey, o_totalprice,
                 greatest(0, least(255, floor(
                   (o_custkey::double - lo_c) / (hi_c - lo_c) * 256
                 )))::bigint as hx,
                 greatest(0, least(255, floor(
                   (o_totalprice::double - lo_p) / (hi_p - lo_p) * 256
                 )))::bigint as hy,
                 0::bigint as hd
          from orders, bounds
        ),{",".join(_hil_ctes)}
        select (hd >> 12)::int as bucket,
               count(*) as n_rows,
               min(o_custkey) as min_custkey,
               max(o_custkey) as max_custkey,
               min(o_totalprice) as min_price,
               max(o_totalprice) as max_price
        from {_hprev}
        group by 1
        order by 1
    """
    # ridge via hugeint Cramer; coefficients as half-away 6dp using
    # exact // integral division (sign split because // truncates)
    _rg_half = (
        "case when {n} >= 0 "
        "then ((2 * {n} * 1000000 + {d}) // (2 * {d})) "
        "else -((2 * (-({n})) * 1000000 + {d}) // (2 * {d})) end"
        " / 1000000.0"
    )
    out["ridge_normal"] = f"""
        with q as (
          select l_quantity::bigint as x1,
                 floor(l_discount * 100 + 0.5)::bigint as x2,
                 floor(l_extendedprice + 0.5)::bigint as y
          from lineitem
        ),
        s as (
          select count(*)::hugeint as n,
                 sum(x1)::hugeint as s1, sum(x2)::hugeint as s2,
                 sum(x1 * x1)::hugeint as s11,
                 sum(x1 * x2)::hugeint as s12,
                 sum(x2 * x2)::hugeint as s22,
                 sum(y)::hugeint as sy,
                 sum(x1 * y)::hugeint as s1y,
                 sum(x2 * y)::hugeint as s2y
          from q
        ),
        d as (
          select n, s1, s2, s11 + 10 as a11, s12, s22 + 10 as a22,
                 sy, s1y, s2y,
                 n * ((s11 + 10) * (s22 + 10) - s12 * s12)
                 - s1 * (s1 * (s22 + 10) - s12 * s2)
                 + s2 * (s1 * s12 - (s11 + 10) * s2) as det,
                 sy * ((s11 + 10) * (s22 + 10) - s12 * s12)
                 - s1 * (s1y * (s22 + 10) - s12 * s2y)
                 + s2 * (s1y * s12 - (s11 + 10) * s2y) as det0,
                 n * (s1y * (s22 + 10) - s12 * s2y)
                 - sy * (s1 * (s22 + 10) - s12 * s2)
                 + s2 * (s1 * s2y - s1y * s2) as det1,
                 n * ((s11 + 10) * s2y - s1y * s12)
                 - s1 * (s1 * s2y - s1y * s2)
                 + sy * (s1 * s12 - (s11 + 10) * s2) as det2
          from s
        ),
        e as (
          select n,
                 case when det >= 0 then det0 else -det0 end as n0,
                 case when det >= 0 then det1 else -det1 end as n1,
                 case when det >= 0 then det2 else -det2 end as n2,
                 abs(det) as dd
          from d
        )
        select n::bigint as n_rows,
               {_rg_half.format(n="n0", d="dd")} as b0,
               {_rg_half.format(n="n1", d="dd")} as b1,
               {_rg_half.format(n="n2", d="dd")} as b2
        from e
    """
    # classical decomposition: same centered window, same half-away
    # integer means, same slot re-centering
    _sd_half = (
        "case when {s} >= 0 "
        "then ((2 * {s} + {n}) // (2 * {n})) "
        "else -((2 * (-({s})) + {n}) // (2 * {n})) end"
    )
    out["stl_decompose"] = f"""
        with daily as (
          select date_diff('day', DATE '1970-01-01', ts::date)
                   as t,
                 count(*)::bigint as y
          from events group by 1
        ),
        base as (
          select 'all' as g, t, ((t % 7) + 7) % 7 as j,
                 y * 1000000 as ym
          from daily
        ),
        tr as (
          select g, t, j, ym,
                 case when count(*) over w = 7
                      then {_sd_half.format(s="sum(ym) over w", n="7")}
                 end as trend
          from base
          window w as (partition by g order by t
                       rows between 3 preceding and 3 following)
        ),
        raw as (
          select g, j,
                 {_sd_half.format(s="sum(ym - trend)",
                                  n="count(*)")} as sraw
          from tr where trend is not null
          group by g, j
        ),
        cent as (
          select g, j,
                 sraw - {_sd_half.format(
                     s="sum(sraw) over (partition by g)", n="7"
                 )} as seas
          from raw
        )
        select tr.g as g, tr.t as t,
               ym / 1000000.0 as y,
               trend / 1000000.0 as trend,
               seas / 1000000.0 as seasonal,
               (ym - trend - seas) / 1000000.0 as remainder
        from tr left join cent on tr.g = cent.g and tr.j = cent.j
        order by t
    """
    # Neyman: exact integer moments, one correctly-rounded sqrt,
    # stratum-ordered normalizer fold (short list — list_reduce is
    # safe at stratum cardinality), qualify-style ranked draw
    out["neyman_sample"] = """
        with m as (
          select source as s, count(*)::bigint as n,
                 sum(n_chars)::bigint as sy,
                 sum(n_chars * n_chars)::bigint as syy
          from documents group by 1
        ),
        sd as (
          select s, n,
                 case when n > 1
                      then sqrt((n * syy - sy * sy)::double
                                / (n * (n - 1))::double)
                      else 0.0 end as sdev
          from m
        ),
        w as (select s, n, sdev, n::double * sdev as w from sd),
        k as (
          select list_reduce(
                   list_prepend(0.0::double,
                                list(w order by s)),
                   (a, b) -> a + b) as wsum
          from w
        ),
        alloc as (
          select s, n, sdev,
                 case when (select wsum from k) > 0
                      then least(n, floor(100.0 * w
                                 / (select wsum from k)
                                 + 0.5)::bigint)
                      else 0 end as n_alloc
          from w
        ),
        ranked as (
          select source as s, n_chars as y,
                 row_number() over (
                   partition by source
                   order by md5(doc_id::varchar || ':ney17')
                 ) as rn
          from documents
        ),
        kept as (
          select r.s, count(*)::bigint as ns,
                 sum(r.y)::bigint as ssum
          from ranked r join alloc a on r.s = a.s
          where r.rn <= a.n_alloc
          group by r.s
        )
        select a.s as source,
               a.n as n_pop,
               floor(abs(a.sdev) * 1000000 + 0.5) / 1000000.0
                 as s_dev,
               a.n_alloc as n_alloc,
               coalesce(k.ns, 0)::bigint as n_sampled,
               case when k.ns > 0 then
                 (case when k.ssum >= 0
                       then ((2 * k.ssum * 1000000 + k.ns)
                             // (2 * k.ns))
                       else -((2 * (-k.ssum) * 1000000 + k.ns)
                              // (2 * k.ns)) end) / 1000000.0
               end as sample_y_mean
        from alloc a left join kept k on a.s = k.s
        order by a.s
    """
    # CDC chunking: boundaries via list_filter over range (the
    # vectorized-SAFE list family), cuts, force-split, chunk md5s
    out["cdc_chunks"] = """
        with d as (
          select doc_id, text, length(text)::bigint as n
          from documents
        ),
        b as (
          select doc_id, text, n,
                 case when n >= 9 then
                   list_filter(range(8, n), p ->
                     ('0x' || substr(md5(substr(text,
                        (p - 7)::int, 8)), 1, 8))::bigint % 64 = 0)
                 else [] end as bounds
          from d where n > 0
        ),
        c as (
          select doc_id, text,
                 list_concat(list_concat([0::bigint], bounds),
                             [n]) as cuts
          from b
        ),
        pr as (
          select doc_id, text,
                 flatten(list_transform(range(1, len(cuts)), i ->
                   list_transform(
                     range(0, ceil((cuts[(i + 1)::int]
                                    - cuts[i::int]) / 256.0)::bigint),
                     j -> struct_pack(
                       s := cuts[i::int] + j * 256,
                       e := least(cuts[(i + 1)::int],
                                  cuts[i::int] + (j + 1) * 256))
                   ))) as ps
          from c
        ),
        px as (
          select doc_id, text,
                 unnest(list_transform(range(1, len(ps) + 1), i ->
                   struct_pack(idx := i - 1,
                               s := ps[i::int].s,
                               e := ps[i::int].e))) as p
          from pr
        )
        select doc_id,
               p.idx::int as chunk_idx,
               (p.s + 1)::bigint as chunk_start,
               (p.e - p.s)::bigint as chunk_len,
               md5(substr(text, (p.s + 1)::int,
                          (p.e - p.s)::int)) as chunk_hash
        from px
        order by doc_id, chunk_idx
    """
    # permutation test: every relabeling replayed; the >= decision in
    # hugeint cross-multiplication, the 6dp stat via exact //
    out["permutation_test"] = """
        with base as (
          select doc_id::varchar as id, n_chars::bigint as y,
                 (lang = 'en') as isa
          from documents where lang in ('en', 'de')
        ),
        obs as (
          select sum(case when isa then 1 else 0 end)::hugeint as na,
                 sum(case when isa then 0 else 1 end)::hugeint as nb,
                 sum(case when isa then y else 0 end)::hugeint as sa,
                 sum(case when isa then 0 else y end)::hugeint as sb
          from base
        ),
        obs2 as (
          select na, nb, sa, sb,
                 abs(sa * nb - sb * na) as num_o,
                 na * nb as den_o
          from obs
        ),
        asg as (
          select b.id, b.y, j.j,
                 ('0x' || substr(md5(b.id || ':' || j.j
                    || ':pt17'), 1, 8))::bigint % 2 as side
          from base b, (select unnest(range(0, 200)) as j) j
        ),
        perj as (
          select j,
                 sum(case when side = 0 then 1 else 0 end)::hugeint
                   as pna,
                 sum(case when side = 1 then 1 else 0 end)::hugeint
                   as pnb,
                 sum(case when side = 0 then y else 0 end)::hugeint
                   as psa,
                 sum(case when side = 1 then y else 0 end)::hugeint
                   as psb
          from asg group by j
        ),
        ge as (
          select count(*) filter (
                   where pna > 0 and pnb > 0
                     and abs(psa * pnb - psb * pna) * den_o
                         >= num_o * (pna * pnb)
                 )::bigint as n_ge
          from perj, obs2
        )
        select na::bigint as n_a, nb::bigint as n_b,
               (case when sa >= 0
                     then ((2 * sa * 1000000 + na) // (2 * na))
                     else -((2 * (-sa) * 1000000 + na)
                            // (2 * na)) end) / 1000000.0 as mean_a,
               (case when sb >= 0
                     then ((2 * sb * 1000000 + nb) // (2 * nb))
                     else -((2 * (-sb) * 1000000 + nb)
                            // (2 * nb)) end) / 1000000.0 as mean_b,
               ((2 * num_o * 1000000 + den_o) // (2 * den_o))
                 / 1000000.0 as stat_obs,
               200::bigint as n_perms,
               n_ge,
               ((2 * (1 + n_ge) * 1000000 + 201) // (2 * 201))
                 / 1000000.0 as p_value
        from obs2, ge
    """
    # split-conformal: same md5 buckets, exact train-mean micro, the
    # k-th order statistic via row_number, exact coverage ratio
    out["conformal_interval"] = """
        with base as (
          select lang as g, n_chars::bigint as y,
                 doc_id::varchar as id,
                 ('0x' || substr(md5(doc_id::varchar || ':cf17'),
                                 1, 8))::bigint % 5 as b
          from documents
        ),
        model as (
          select g, count(*)::bigint as n_train,
                 ((2 * sum(y) * 1000000 + count(*))
                  // (2 * count(*)))::bigint as yhat
          from base where b <= 2 group by g
        ),
        cal as (
          select c.g, abs(c.y * 1000000 - m.yhat) as r, c.id
          from base c join model m using (g) where c.b = 3
        ),
        ranked as (
          select g, r,
                 row_number() over (partition by g
                                    order by r, id) as rn,
                 count(*) over (partition by g) as ncal
          from cal
        ),
        q as (
          select g, max(ncal)::bigint as n_calib,
                 max(case when rn = ((ncal + 1) * 90 + 99) // 100
                          then r end) as qh
          from ranked group by g
        ),
        tst as (
          select t.g, count(*)::bigint as n_test,
                 sum(case when q.qh is not null
                          and abs(t.y * 1000000 - m.yhat) <= q.qh
                          then 1 else 0 end)::bigint as ncov
          from base t
          join model m using (g) join q using (g)
          where t.b = 4
          group by t.g
        )
        select m.g as lang,
               m.n_train as n_train,
               q.n_calib as n_calib,
               t.n_test as n_test,
               m.yhat / 1000000.0 as y_hat,
               q.qh / 1000000.0 as q_hat,
               case when q.qh is not null and t.n_test > 0 then
                 ((2 * t.ncov * 1000000 + t.n_test)
                  // (2 * t.n_test)) / 1000000.0
               end as coverage
        from model m join q using (g) join tst t using (g)
        order by m.g
    """
    # calibration bins: rebuild the synthetic calibrated scorer from
    # the same md5 draws; exact micro means, hugeint Brier //
    out["calibration_bins"] = """
        with scored as (
          select ('0x' || substr(md5('p:' || doc_id::varchar),
                                 1, 8))::bigint % 1000001 as p,
                 case when ('0x' || substr(md5('y:'
                        || doc_id::varchar), 1, 8))::bigint % 1000001
                      < ('0x' || substr(md5('p:'
                        || doc_id::varchar), 1, 8))::bigint % 1000001
                      then 1 else 0 end as y
          from documents
        ),
        agged as (
          select floor(p * 10 / 1000001.0)::int as bin,
                 count(*)::bigint as n,
                 sum(p)::bigint as sp,
                 sum(y)::bigint as sy,
                 sum((p - y * 1000000)::hugeint
                     * (p - y * 1000000)) as ssq
          from scored group by 1
        )
        select bin, n,
               ((2 * sp + n) // (2 * n)) / 1000000.0 as p_mean,
               ((2 * sy * 1000000 + n) // (2 * n)) / 1000000.0
                 as y_rate,
               (((2 * sp + n) // (2 * n))
                - ((2 * sy * 1000000 + n) // (2 * n)))
                 / 1000000.0 as gap,
               ((2 * ssq + n::hugeint * 1000000)
                // (2 * n::hugeint * 1000000)) / 1000000.0 as brier
        from agged
        order by bin
    """

    # ROC curve: cumulative ">= threshold" counts; the oracle may use
    # a plain window (fixture-sized curve), the engine path is the
    # two-pass partitioned cumsum
    out["roc_curve"] = """
        with per as (
          select n_chars::bigint as s,
                 sum(case when lang = 'en' then 1 else 0 end)::bigint
                   as np,
                 sum(case when lang = 'en' then 0 else 1 end)::bigint
                   as nn
          from documents group by 1
        ),
        tot as (
          select sum(np)::bigint as tp, sum(nn)::bigint as tn
          from per
        ),
        cum as (
          select s, np, nn,
                 coalesce(sum(np) over (order by s
                   rows between unbounded preceding
                   and 1 preceding), 0) as bp,
                 coalesce(sum(nn) over (order by s
                   rows between unbounded preceding
                   and 1 preceding), 0) as bn
          from per
        )
        select s as score,
               (tp - bp)::bigint as n_pos_ge,
               (tn - bn)::bigint as n_neg_ge,
               case when tp > 0 then
                 ((2 * (tp - bp) * 1000000 + tp) // (2 * tp))
                   / 1000000.0 end as tpr,
               case when tn > 0 then
                 ((2 * (tn - bn) * 1000000 + tn) // (2 * tn))
                   / 1000000.0 end as fpr
        from cum, tot
        order by score desc
    """
    # DoReMi: per-domain unigram cross-entropy, then 3 rounds of the
    # exponentiated-gradient update in source-ordered list arithmetic
    # (k = 20 elements — the SAFE short-list regime for list_reduce);
    # exp is the shared Taylor-Horner kernel, textually inlined
    from etl_orders_to_bq_spark.operators.multitest import (
        _det_exp_sql,
    )

    _dm_exp = _det_exp_sql("(1.0 * ((e) - mx))")
    _dm_rounds = []
    _dm_prev = "r0"
    for _t_ in range(1, 4):
        _dm_rounds.append(f"""
        s{_t_}a as (
          select *, list_reduce(list_prepend(0.0::double,
                   list_transform(range(1, k + 1),
                     i -> alpha[i::int] * L[i::int])),
                 (x, y) -> x + y) as lref
          from {_dm_prev}
        ),
        s{_t_}b as (
          select *, list_transform(L, l ->
                   case when l - lref > 0.0
                        then l - lref else 0.0 end) as ex
          from s{_t_}a
        ),
        s{_t_}c as (
          select *, list_reduce(list_prepend(0.0::double, ex),
                 (x, y) -> case when y > x then y else x end) as mx
          from s{_t_}b
        ),
        s{_t_}d as (
          select *, list_transform(ex, e -> {_dm_exp}) as tt
          from s{_t_}c
        ),
        s{_t_}e as (
          select *, list_transform(range(1, k + 1),
                   i -> alpha[i::int] * tt[i::int]) as wgt
          from s{_t_}d
        ),
        s{_t_}f as (
          select *, list_reduce(list_prepend(0.0::double, wgt),
                 (x, y) -> x + y) as z
          from s{_t_}e
        ),
        r{_t_} as (
          select a, k, L,
                 list_transform(wgt,
                   w -> 0.9 * (w / z) + 0.1 / k) as alpha
          from s{_t_}f
        )""")
        _dm_prev = f"r{_t_}"
    out["doremi_mix"] = f"""
        with tok as (
          select source as d,
                 unnest(regexp_extract_all({_NORM}, '\\S+')) as w
          from documents
        ),
        cnt as (select w, count(*)::bigint as c from tok group by w),
        tt0 as (select sum(c)::bigint as t from cnt),
        sc as (
          select d,
                 cast(round(round(log10(c / (select t from tt0)), 6)
                            * 1000000, 0) as bigint) as lp
          from tok join cnt using (w)
        ),
        dom as (
          select d, count(*)::bigint as n,
                 ((2 * -sum(lp) + count(*))
                  // (2 * count(*)))::bigint as lm
          from sc group by d
        ),
        one as (
          select list(struct_pack(d := d, n := n, lm := lm)
                      order by d) as a
          from dom
        ),
        r0 as (
          select a, len(a) as k,
                 list_transform(a, x -> x.lm / 1000000.0) as L,
                 list_transform(a, x -> 1.0 / len(a)) as alpha
          from one
        ),{",".join(_dm_rounds)},
        numbered as (
          select d, n, lm,
                 row_number() over (order by d) as rn
          from dom
        )
        select numbered.d as source,
               numbered.n as n_tokens,
               numbered.lm / 1000000.0 as loss,
               round(alpha[numbered.rn::int], 6) as alpha
        from numbered, {_dm_prev}
        order by source
    """

    # AdaBoost.M1: all three rounds replayed as chained CTEs — per
    # round a weighted class-sum per threshold, a window cumsum
    # threshold sweep, the (err, s, pol) argmin, and the exact
    # hugeint // downweight of correct rows
    _ab_rounds = []
    _ab_finals = []
    for _t_ in range(1, 4):
        _ab_rounds.append(f"""
        per{_t_} as (
          select x,
                 sum(case when p then w else 0 end)::hugeint as wp,
                 sum(case when p then 0 else w end)::hugeint as wn
          from w{_t_} group by x
        ),
        cum{_t_} as (
          select x, wp, wn,
                 coalesce(sum(wp) over (order by x
                   rows between unbounded preceding
                   and 1 preceding), 0) as cp,
                 coalesce(sum(wn) over (order by x
                   rows between unbounded preceding
                   and 1 preceding), 0) as cn
          from per{_t_}
        ),
        tot{_t_} as (
          select sum(wp)::hugeint as tp, sum(wn)::hugeint as tn
          from per{_t_}
        ),
        cand{_t_} as (
          select e, s, pol from (
            select (cp + tn - cn) as e, x as s, 0 as pol
            from cum{_t_}, tot{_t_}
            union all
            select (tp + tn) - (cp + tn - cn) as e, x as s, 1 as pol
            from cum{_t_}, tot{_t_}
          )
        ),
        best{_t_} as (
          select e, s, pol,
                 (select tp + tn from tot{_t_}) as wt,
                 greatest(e, 1) as en,
                 (select tp + tn from tot{_t_}) - greatest(e, 1)
                   as ed
          from cand{_t_}
          order by e, s, pol limit 1
        ),
        w{_t_ + 1} as (
          select w.x, w.p,
                 case when (b.pol = 0 and ((w.x >= b.s) = w.p))
                        or (b.pol = 1 and ((w.x < b.s) = w.p))
                      then (w.w::hugeint * b.en) // b.ed
                      else w.w end as w
          from w{_t_} w, best{_t_} b
        )""")
        _ab_finals.append(f"""
        select {_t_} as round, s::bigint as split_at,
               case when pol = 0 then 'ge' else 'lt' end as polarity,
               ((2 * e * 1000000 + wt) // (2 * wt)) / 1000000.0
                 as weighted_err,
               ((2 * en * 1000000 + ed) // (2 * ed)) / 1000000.0
                 as beta
        from best{_t_}""")
    out["adaboost_stumps"] = f"""
        with lab as (
          select n_chars::bigint as x,
                 ((n_chars >= 250)
                  != (('0x' || substr(md5('ab:' || doc_id::varchar),
                       1, 8))::bigint % 10 = 0)) as p
          from documents
        ),
        w1 as (select x, p, 1000000::bigint as w from lab),
        {",".join(_ab_rounds)}
        {" union all ".join(_ab_finals)}
        order by round
    """
    # isotonic minimax: same prefix sums, same 6dp-grid interval
    # rates, same max-of-min over the (i <= k <= j) lattice
    out["isotonic_calibration"] = """
        with scored as (
          select floor((('0x' || substr(md5('p:' || doc_id::varchar),
                   1, 8))::bigint % 1000001) * 10 / 1000001.0)::int
                   as bin,
                 case when ('0x' || substr(md5('y:'
                        || doc_id::varchar), 1, 8))::bigint % 1000001
                      < (case when ('0x' || substr(md5('p:'
                           || doc_id::varchar), 1, 8))::bigint
                           % 1000001 < 500000
                         then ('0x' || substr(md5('p:'
                           || doc_id::varchar), 1, 8))::bigint
                           % 1000001
                         else 1000000 - ('0x' || substr(md5('p:'
                           || doc_id::varchar), 1, 8))::bigint
                           % 1000001 end)
                      then 1 else 0 end as y
          from documents
        ),
        bins as (
          select bin, sum(y)::bigint as p, count(*)::bigint as n
          from scored group by bin
        ),
        pref as (
          select bin, p, n,
                 row_number() over (order by bin) as rn,
                 sum(p) over (order by bin
                   rows between unbounded preceding
                   and current row) as cp,
                 sum(n) over (order by bin
                   rows between unbounded preceding
                   and current row) as cn
          from bins
        ),
        iv as (
          select li.rn as i, rj.rn as j,
                 (rj.cp - (li.cp - li.p)) as ip,
                 (rj.cn - (li.cn - li.n)) as xn
          from pref li join pref rj on li.rn <= rj.rn
        ),
        ivr as (
          select i, j,
                 ((2 * ip * 1000000 + xn) // (2 * xn)) as r
          from iv
        ),
        fitted as (
          select k, max(mn) as iso from (
            select g.rn as k, ivr.i, min(ivr.r) as mn
            from ivr join pref g
              on ivr.i <= g.rn and g.rn <= ivr.j
            group by g.rn, ivr.i
          ) group by k
        )
        select pref.bin as bin,
               pref.p as pos,
               pref.n as n,
               ((2 * pref.p * 1000000 + pref.n) // (2 * pref.n))
                 / 1000000.0 as rate,
               fitted.iso / 1000000.0 as iso_rate
        from pref join fitted on pref.rn = fitted.k
        order by bin
    """

    # Bradley-Terry: the comparison fixture (exact integer-rational
    # winner draw), the undirected pair census, and 3 MM rounds with
    # opponent-ordered folds + per-round micro re-quantization
    _bt_rounds = []
    _bt_prev = "w0"
    for _t_ in range(1, 4):
        _bt_rounds.append(f"""
        d{_t_} as (
          select dd.i,
                 list_reduce(list_prepend(0.0::double,
                   list(dd.n::double
                        / ((wi.s + wj.s) / 1000000.0)
                        order by dd.j)),
                   (x, y) -> x + y) as den
          from directed dd
          join {_bt_prev} wi on dd.i = wi.i
          join {_bt_prev} wj on dd.j = wj.i
          group by dd.i
        ),
        r{_t_} as (
          select t.i, t.wins::double / d{_t_}.den as r
          from totals t join d{_t_} using (i)
        ),
        n{_t_} as (
          select count(*)::bigint as k,
                 list_reduce(list_prepend(0.0::double,
                   list(r order by i)), (x, y) -> x + y) as s
          from r{_t_}
        ),
        w{_t_} as (
          select i,
                 floor(r * (select k from n{_t_})
                       / (select s from n{_t_})
                       * 1000000.0 + 0.5)::bigint as s
          from r{_t_}
        )""")
        _bt_prev = f"w{_t_}"
    out["bradley_terry"] = f"""
        with comp as (
          select source as a,
                 'src' || cast(('0x' || substr(md5('b:'
                    || doc_id::varchar), 1, 8))::bigint % 20
                    as varchar) as b,
                 case when ('0x' || substr(md5('w:'
                        || doc_id::varchar), 1, 8))::bigint
                      % ((cast(substr(source, 4) as bigint) + 1)
                         + (('0x' || substr(md5('b:'
                            || doc_id::varchar), 1, 8))::bigint % 20
                            + 1))
                      < cast(substr(source, 4) as bigint) + 1
                      then 1 else 0 end as win
          from documents
        ),
        filt as (select * from comp where a != b),
        pairs as (
          select least(a, b) as lo, greatest(a, b) as hi,
                 count(*)::bigint as n,
                 sum(case when a < b then win
                          else 1 - win end)::bigint as wlo
          from filt group by 1, 2
        ),
        directed as (
          select lo as i, hi as j, n, wlo as w from pairs
          union all
          select hi as i, lo as j, n, n - wlo as w from pairs
        ),
        totals as (
          select i, sum(n)::bigint as nc, sum(w)::bigint as wins
          from directed group by i
        ),
        w0 as (select i, 1000000::bigint as s from totals),
        {",".join(_bt_rounds)}
        select t.i as item,
               t.nc as n_comparisons,
               t.wins as n_wins,
               w.s / 1000000.0 as strength
        from totals t join {_bt_prev} w using (i)
        order by item
    """

    out["kruskal_wallis"] = """
        with f as (
          select event_type as g, value as v from events
          where value is not null and event_type is not null
        ),
        vc as (
          select v, g, count(*) as ngv from f group by v, g
        ),
        vt as (select v, sum(ngv) as nt from vc group by v),
        cum as (
          select *,
                 coalesce(sum(nt) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as below
          from vt
        ),
        perg as (
          select g,
                 cast(sum(cast(ngv as decimal(38,0))
                          * cast(2 * below + nt + 1 as decimal(38,0)))
                      as decimal(38,0)) as two_rg,
                 cast(sum(ngv) as bigint) as ng
          from vc join cum using (v) group by g
        ),
        tie as (
          select cast(sum(cast(nt as decimal(38,0))
                          * cast(nt as decimal(38,0))
                          * cast(nt as decimal(38,0))
                          - cast(nt as decimal(38,0)))
                      as decimal(38,0)) as ties,
                 cast(sum(nt) as bigint) as n
          from cum
        ),
        folded as (
          select count(*)::bigint as k_groups,
                 list_sort(list(struct_pack(g := g,
                                            two_rg := two_rg,
                                            ng := ng))) as gs
          from perg
        ),
        j as (select * from folded cross join tie),
        hh as (
          select k_groups, n,
                 12.0 / (cast(n as double) * (cast(n as double) + 1.0))
                   * list_reduce(
                       list_transform(gs, s ->
                         (cast(s.two_rg as double)
                          * cast(s.two_rg as double))
                         / (4.0 * cast(s.ng as double))),
                       (acc, t) -> acc + t)
                 - 3.0 * (cast(n as double) + 1.0) as h,
                 1.0 - cast(ties as double)
                   / (cast(n as double) * cast(n as double)
                      * cast(n as double) - cast(n as double)) as c
          from j
        )
        select k_groups, n,
               case when k_groups >= 2 and n > k_groups
                    then round(h, 6) end as h_stat,
               case when k_groups >= 2 and n > k_groups and c > 0
                    then round(h / c, 6) end as h_adj
        from hh
    """

    out["anova_oneway"] = """
        with f as (
          select l_returnflag as g,
                 cast(l_extendedprice as decimal(18,2)) as y
          from lineitem
          where l_extendedprice is not null
            and l_returnflag is not null
        ),
        perg as (
          select g, count(*)::bigint as ng,
                 cast(sum(y) as decimal(38,2)) as sg,
                 cast(sum(y * y) as decimal(38,4)) as qg
          from f group by g
        ),
        folded as (
          select count(*)::bigint as k_groups,
                 cast(sum(ng) as bigint) as n,
                 cast(sum(sg) as decimal(38,2)) as s,
                 cast(sum(qg) as decimal(38,4)) as q,
                 list_sort(list(struct_pack(g := g, sg := sg,
                                            ng := ng))) as gs
          from perg
        ),
        mid as (
          select k_groups, n,
                 list_reduce(
                   list_transform(gs, t ->
                     (cast(t.sg as double) * cast(t.sg as double))
                     / cast(t.ng as double)),
                   (acc, t) -> acc + t) as sg2,
                 cast(s as double) as sd,
                 cast(q as double) as qd
          from folded
        ),
        ss as (
          select k_groups, n,
                 case when n > 0 then
                   round(sg2 - sd * sd / cast(n as double), 6)
                 end as ssb,
                 case when n > 0 then round(qd - sg2, 6) end as ssw
          from mid
        )
        select k_groups, n, ssb, ssw,
               case when k_groups >= 2 and n > k_groups and ssw > 0
                    then round(
                      (ssb / (cast(k_groups as double) - 1.0))
                      / (ssw / (cast(n as double)
                                - cast(k_groups as double))), 6)
               end as f_stat
        from ss
    """

    out["hodges_lehmann"] = """
        with base as (
          select cast(s_nationkey as varchar) as g,
                 cast(s_suppkey as bigint) as i,
                 cast(s_acctbal as decimal(18,2)) as y
          from supplier
          where s_acctbal is not null and s_nationkey is not null
            and s_suppkey is not null
        ),
        pairs as (
          select a.g, a.i, b.i as j,
                 cast(a.y + b.y as decimal(38,2)) as w
          from base a join base b on a.g = b.g and a.i <= b.i
        ),
        ranked as (
          select *, row_number() over (
            partition by g order by w, i, j) as rn
          from pairs
        ),
        counts as (select g, count(*)::bigint as m from pairs group by g),
        mid as (
          select g, max(m) as n_pairs,
                 cast(sum(case when rn = (m + 1) // 2
                                and rn = (m + 2) // 2
                               then w + w else w end)
                      as decimal(38,2)) as wmid
          from ranked join counts using (g)
          where rn = (m + 1) // 2 or rn = (m + 2) // 2
          group by g
        ),
        ns as (
          select g, count(*)::bigint as n from base group by g
        )
        select ns.g as "group", n, n_pairs,
               round(cast(wmid as double) / 4.0, 6) as hl_estimate
        from ns join mid using (g)
        order by "group"
    """

    out["spearman_corr"] = """
        with base as (
          select l_returnflag as g, l_quantity as x,
                 l_extendedprice as y
          from lineitem
          where l_returnflag is not null and l_quantity is not null
            and l_extendedprice is not null
        ),
        cx as (
          select g, x, count(*) as t from base group by g, x
        ),
        rx as (
          select g, x,
                 cast(2 * coalesce(sum(t) over (partition by g order by x
                        rows between unbounded preceding and 1 preceding), 0)
                      + t + 1 as bigint) as a
          from cx
        ),
        cy as (
          select g, y, count(*) as t from base group by g, y
        ),
        ry as (
          select g, y,
                 cast(2 * coalesce(sum(t) over (partition by g order by y
                        rows between unbounded preceding and 1 preceding), 0)
                      + t + 1 as bigint) as b
          from cy
        ),
        ranked as (
          select base.g, a, b
          from base join rx using (g, x) join ry using (g, y)
        ),
        m as (
          select g as "group", count(*)::bigint as n,
                 cast(sum(cast(a as decimal(38,0))) as decimal(38,0)) as sa,
                 cast(sum(cast(b as decimal(38,0))) as decimal(38,0)) as sb,
                 cast(sum(cast(a as decimal(38,0))
                          * cast(b as decimal(38,0))) as decimal(38,0)) as sab,
                 cast(sum(cast(a as decimal(38,0))
                          * cast(a as decimal(38,0))) as decimal(38,0)) as saa,
                 cast(sum(cast(b as decimal(38,0))
                          * cast(b as decimal(38,0))) as decimal(38,0)) as sbb
          from ranked group by g
        )
        select "group", n,
               case when cast(n as double) * cast(saa as double)
                         - cast(sa as double) * cast(sa as double) > 0
                     and cast(n as double) * cast(sbb as double)
                         - cast(sb as double) * cast(sb as double) > 0
                    then round(
                      (cast(n as double) * cast(sab as double)
                       - cast(sa as double) * cast(sb as double))
                      / sqrt((cast(n as double) * cast(saa as double)
                              - cast(sa as double) * cast(sa as double))
                             * (cast(n as double) * cast(sbb as double)
                                - cast(sb as double) * cast(sb as double))),
                      6)
               end as rho
        from m
        order by "group"
    """

    out["kendall_tau"] = """
        with cells as (
          select n_nationkey, c_mktsegment,
                 count(*)::bigint as cnt,
                 cast(sum(cast(c_acctbal as decimal(18,2)))
                      as decimal(38,2)) as bal
          from customer join nation on c_nationkey = n_nationkey
          group by n_nationkey, c_mktsegment
        ),
        base as (
          select c_mktsegment as g, cast(n_nationkey as bigint) as i,
                 cnt as x, bal as y
          from cells
          where c_mktsegment is not null and cnt is not null
            and bal is not null and n_nationkey is not null
        ),
        pairs as (
          select a.g,
                 case when a.x < b.x then 1
                      when a.x > b.x then -1 else 0 end
                 * case when a.y < b.y then 1
                        when a.y > b.y then -1 else 0 end as s
          from base a join base b on a.g = b.g and a.i < b.i
        ),
        cd as (
          select g as "group",
                 cast(sum(case when s > 0 then 1 else 0 end) as bigint)
                   as concordant,
                 cast(sum(case when s < 0 then 1 else 0 end) as bigint)
                   as discordant
          from pairs group by g
        ),
        t1 as (
          select g as "group",
                 cast(sum(t * (t - 1) // 2) as bigint) as n1
          from (select g, x, count(*) as t from base group by g, x)
          group by g
        ),
        t2 as (
          select g as "group",
                 cast(sum(t * (t - 1) // 2) as bigint) as n2
          from (select g, y, count(*) as t from base group by g, y)
          group by g
        ),
        ns as (
          select g as "group", count(*)::bigint as n from base group by g
        )
        select "group", n, concordant, discordant,
               case when cast(n as double) * (cast(n as double) - 1.0) / 2.0
                         - cast(n1 as double) > 0
                     and cast(n as double) * (cast(n as double) - 1.0) / 2.0
                         - cast(n2 as double) > 0
                    then round(
                      (cast(concordant as double)
                       - cast(discordant as double))
                      / sqrt((cast(n as double) * (cast(n as double) - 1.0)
                              / 2.0 - cast(n1 as double))
                             * (cast(n as double) * (cast(n as double) - 1.0)
                                / 2.0 - cast(n2 as double))),
                      6)
               end as tau_b
        from ns join cd using ("group") join t1 using ("group")
               join t2 using ("group")
        order by "group"
    """

    out["good_turing"] = """
        with tw as (
          select regexp_extract_all(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g')), '\\S+') as ws
          from documents
        ),
        tok as (
          select ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] as w
          from tw, unnest(range(1, greatest(len(ws) - 1, 1))) as t(i)
        ),
        vocab as (select w, count(*) as r from tok group by w),
        cc as (select r, count(*) as nr from vocab group by r),
        tot as (select cast(sum(r * nr) as bigint) as n from cc)
        select cast(cc.r as bigint) as r,
               cast(cc.nr as bigint) as n_r,
               round((cc.r + 1)::double * coalesce(nx.nr, 0)::double
                     / cc.nr::double, 6) as r_star,
               round((cc.r + 1)::double * coalesce(nx.nr, 0)::double
                     / (cc.nr::double * tot.n::double), 9) as p_gt
        from cc left join cc nx on nx.r = cc.r + 1, tot
        where cc.r <= 15
        order by r
    """

    out["chao1_richness"] = """
        with tw as (
          select regexp_extract_all(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g')), '\\S+') as ws
          from documents
        ),
        tok as (
          select ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] as w
          from tw, unnest(range(1, greatest(len(ws) - 1, 1))) as t(i)
        ),
        vocab as (select w, count(*) as r from tok group by w),
        agg as (
          select cast(sum(r) as bigint) as n_tokens,
                 count(*)::bigint as s_obs,
                 cast(sum(case when r = 1 then 1 else 0 end) as bigint) as f1,
                 cast(sum(case when r = 2 then 1 else 0 end) as bigint) as f2
          from vocab
        )
        select n_tokens, s_obs, f1, f2,
               round(s_obs::double
                     + f1::double * (f1::double - 1.0)
                       / (2.0 * (f2::double + 1.0)), 6) as chao1,
               case when n_tokens > 0
                    then round(1.0 - f1::double / n_tokens::double, 6)
               end as coverage
        from agg
    """

    out["ipw_ate"] = """
        with base as (
          select case when substr(o_orderpriority, 1, 1) <= '2'
                      then 1 else 0 end as t,
                 cast(o_totalprice as decimal(18,2)) as y,
                 c_mktsegment as s
          from orders join customer on o_custkey = c_custkey
          where o_totalprice is not null and c_mktsegment is not null
        ),
        per_s as (
          select s,
                 count(*)::bigint as n,
                 cast(sum(t) as bigint) as ts,
                 cast(sum(case when t = 1 then y else 0 end)
                      as decimal(38,2)) as y1,
                 cast(sum(case when t = 0 then y else 0 end)
                      as decimal(38,2)) as y0
          from base group by s
        ),
        folded as (
          select count(*)::bigint as n_strata,
                 cast(sum(case when ts > 0 and ts < n then 1 else 0 end)
                      as bigint) as n_used_strata,
                 cast(sum(case when ts > 0 and ts < n then n else 0 end)
                      as bigint) as n,
                 cast(sum(case when ts > 0 and ts < n then ts else 0 end)
                      as bigint) as n_treated,
                 list_sort(list(struct_pack(s := s, y1 := y1, y0 := y0,
                                            n := n, ts := ts))
                           filter (ts > 0 and ts < n)) as gs
          from per_s
        ),
        m as (
          select n_strata, n_used_strata, n, n_treated,
                 case when n > 0 then round(
                   list_reduce(list_transform(gs, g ->
                     cast(g.y1 as double) * cast(g.n as double)
                     / cast(g.ts as double)), (acc, v) -> acc + v)
                   / cast(n as double), 6) end as mu_treated,
                 case when n > 0 then round(
                   list_reduce(list_transform(gs, g ->
                     cast(g.y0 as double) * cast(g.n as double)
                     / (cast(g.n as double) - cast(g.ts as double))),
                     (acc, v) -> acc + v)
                   / cast(n as double), 6) end as mu_control
          from folded
        )
        select n_strata, n_used_strata, n, n_treated,
               mu_treated, mu_control,
               round(mu_treated - mu_control, 6) as ate
        from m
    """

    _kt_depth = 6
    _kt_parts = ["""
        with base as materialized (
          select distinct least(l_orderkey % 1000, l_partkey % 1000) as a,
                 greatest(l_orderkey % 1000, l_partkey % 1000) as b
          from lineitem
          where l_orderkey % 1000 <> l_partkey % 1000
        ),
        u0 as materialized (select a, b from base)"""]
    for _i in range(_kt_depth):
        _kt_parts.append(f"""
        t{_i} as materialized (
          select e1.a as x, e1.b as y, e2.b as z
          from u{_i} e1
          join u{_i} e2 on e1.a = e2.a and e1.b < e2.b
          join u{_i} e3 on e3.a = e1.b and e3.b = e2.b
        ),
        s{_i} as materialized (
          select a, b, count(*) as sup from (
            select x as a, y as b from t{_i}
            union all select x as a, z as b from t{_i}
            union all select y as a, z as b from t{_i}
          ) group by a, b
        ),
        u{_i + 1} as materialized (
          select u.a, u.b
          from u{_i} u join s{_i} using (a, b)
          where sup >= 6
        )""")
    _kt_final = f"""
        stable as (
          select case when (select count(*) from u{_kt_depth}) =
                      (select count(*) from u{_kt_depth - 1})
                 then 1
                 else error('k_truss oracle: unroll depth {_kt_depth} not '
                            'at fixpoint on this fixture - raise rounds')
            end as ok
        ),
        tf as materialized (
          select e1.a as x, e1.b as y, e2.b as z
          from u{_kt_depth} e1
          join u{_kt_depth} e2 on e1.a = e2.a and e1.b < e2.b
          join u{_kt_depth} e3 on e3.a = e1.b and e3.b = e2.b
        ),
        sf as materialized (
          select a, b, count(*) as sup from (
            select x as a, y as b from tf
            union all select x as a, z as b from tf
            union all select y as a, z as b from tf
          ) group by a, b
        )
        select u.a, u.b, cast(sf.sup as bigint) as support
        from u{_kt_depth} u join sf using (a, b), stable
        where stable.ok = 1
        order by a, b
    """
    out["k_truss"] = ",".join(_kt_parts) + "," + _kt_final

    out["wordpiece_encode"] = """
        with tok as (
          select unnest(regexp_extract_all(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g')), '\\S+')) as w
          from documents
        ),
        words as materialized (
          select w, count(*)::bigint as n from tok group by w
        ),
        topk as materialized (
          select w from words order by n desc, w limit 10
        ),
        init as (
          select substr(w, 1, l) as p
          from topk, unnest(range(1, least(length(w), 6) + 1)) as t(l)
        ),
        cont as (
          select '##' || substr(w, i, l) as p
          from topk,
               unnest(range(2, length(w) + 1)) as ti(i),
               unnest(range(1, least(6, length(w) - i + 1) + 1)) as tl(l)
          where length(w) >= 2
        ),
        vocab as materialized (
          select distinct p from init union select distinct p from cont
        ),
        inlen as materialized (
          select w, n from words where length(w) <= 24
        ),
        cand as (
          select w, i as pos, l,
                 case when i = 1 then substr(w, 1, l)
                      else '##' || substr(w, i, l) end as piece
          from inlen,
               unnest(range(1, length(w) + 1)) as ti(i),
               unnest(range(1, least(6, length(w) - i + 1) + 1)) as tl(l)
        ),
        jumps as materialized (
          select w, pos, max(l) as jump
          from cand join vocab on piece = p
          group by w, pos
        ),
        rec as (
          with recursive walk as (
            select w, 1 as pos, ''::varchar as pieces, 0 as np, true as ok
            from inlen
            union all
            select r.w,
                   cast(r.pos + coalesce(j.jump, 0) as int),
                   case when j.jump is null then r.pieces
                        when r.pos = 1 then substr(r.w, 1, j.jump)
                        else r.pieces || ' ##'
                             || substr(r.w, r.pos, j.jump) end,
                   case when j.jump is null then r.np else r.np + 1 end,
                   j.jump is not null
            from walk r
            left join jumps j on j.w = r.w and j.pos = r.pos
            where r.ok and r.pos <= length(r.w)
          )
          select * from walk
        ),
        term as (
          select w, pieces, np, ok from rec
          where not ok or pos > length(w)
        ),
        encoded as (
          select i.w as word, i.n,
                 case when t.ok then cast(t.np as bigint)
                      else 1 end as n_pieces,
                 case when t.ok then t.pieces else '[UNK]' end as pieces
          from inlen i join term t on t.w = i.w
          union all
          select w as word, n, 1 as n_pieces, '[UNK]' as pieces
          from words where length(w) > 24
        )
        select word, n, n_pieces, pieces
        from encoded
        order by n desc, word
    """

    out["cohens_kappa"] = f"""
        with base as (
          select lang as a, {lang_case} as b from documents
          where lang is not null
        ),
        cells as (
          select a, b, count(*) as c from base group by a, b
        ),
        r as (select a, sum(c) as r from cells group by a),
        k as (select b, sum(c) as k from cells group by b),
        marg as (
          select count(*)::bigint as n_categories,
                 cast(sum(cast(coalesce(r.r, 0) as decimal(38,0))
                          * cast(coalesce(k.k, 0) as decimal(38,0)))
                      as decimal(38,0)) as rc
          from r full join k on r.a = k.b
        ),
        diag as (
          select cast(sum(c) as bigint) as n,
                 cast(sum(case when a = b then c else 0 end)
                      as bigint) as agree
          from cells
        )
        select n, n_categories,
               case when n > 0
                    then round(agree::double / n::double, 6) end as po,
               case when n > 0
                    then round(cast(rc as double)
                               / (n::double * n::double), 6) end as pe,
               case when cast(cast(n as decimal(38,0))
                             * cast(n as decimal(38,0)) - rc as double)
                         != 0
                    then round(
                      cast(cast(n as decimal(38,0))
                           * cast(agree as decimal(38,0)) - rc as double)
                      / cast(cast(n as decimal(38,0))
                             * cast(n as decimal(38,0)) - rc as double), 6)
               end as kappa
        from diag, marg
    """

    from etl_orders_to_bq_spark.operators.multitest import (
        norm_sf_sql as _nsf,
    )

    _mcn_p = _nsf("sqrt(chi2)")
    out["mcnemar"] = f"""
        with base as (
          select n_chars > 300 as a,
                 len(regexp_extract_all(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g')), '\\S+')) > 55 as b
          from documents
        ),
        agg as (
          select count(*)::bigint as n,
                 cast(sum(case when a and not b then 1 else 0 end)
                      as bigint) as b,
                 cast(sum(case when not a and b then 1 else 0 end)
                      as bigint) as c
          from base
        ),
        s as (
          select n, b, c,
                 case when b + c > 0 then round(
                   greatest(abs(b::double - c::double) - 1.0, 0.0)
                   * greatest(abs(b::double - c::double) - 1.0, 0.0)
                   / (b::double + c::double), 6) end as chi2
          from agg
        )
        select n, b, c, chi2,
               case when chi2 is not null
                    then round(least(1.0, 2.0 * {_mcn_p}), 6)
               end as p_value
        from s
    """

    _mk_rounds = 25
    _mk_parts = ["""
        with base as materialized (
          select user_id as u, ts, event_id as id, event_type as c,
                 event_type = 'purchase' as conv
          from events
          where event_type in ('click', 'view', 'signup', 'purchase')
        ),
        pu as materialized (
          select u, min(case when conv then ts end) as cts
          from base group by u
        ),
        puid as materialized (
          select b.u, p.cts, min(b.id) as cid
          from base b join pu p on b.u = p.u and b.conv
                               and b.ts = p.cts
          group by b.u, p.cts
        ),
        touches as materialized (
          select b.u, b.ts, b.id, b.c, (p.u is not null) as conv_user
          from base b
          left join puid p on b.u = p.u
          where not b.conv
            and (p.u is null
                 or b.ts < p.cts
                 or (b.ts = p.cts and b.id < p.cid))
        ),
        seq as materialized (
          select u, conv_user,
                 coalesce(lag(c) over (partition by u
                            order by ts, id), '__START__') as src,
                 c as dst,
                 lead(c) over (partition by u order by ts, id)
                   is null as is_last
          from touches
        ),
        trans as materialized (
          select src, dst, count(*)::bigint as n from (
            select src, dst from seq
            union all
            select dst as src,
                   case when conv_user then '__CONV__'
                        else '__NULL__' end as dst
            from seq where is_last
            union all
            select '__START__' as src, '__CONV__' as dst
            from puid p
            where not exists (select 1 from touches t where t.u = p.u)
          ) group by src, dst
        ),
        chan as materialized (
          select distinct src as ch from trans where src <> '__START__'
          union
          select distinct dst from trans
          where dst not in ('__CONV__', '__NULL__')
        ),
        scen as materialized (
          select '__FULL__' as sc union all select ch from chan
        ),
        strans as materialized (
          select s.sc, t.src as f,
                 case when t.dst = s.sc then '__NULL__'
                      else t.dst end as t,
                 sum(n)::bigint as n
          from trans t cross join scen s
          where t.src <> s.sc
          group by 1, 2, 3
        ),
        outs as materialized (
          select sc, f, sum(n)::bigint as o from strans group by sc, f
        ),
        states as materialized (
          select distinct sc, f as st from strans
          union select sc, '__CONV__' from scen
          union select sc, '__NULL__' from scen
        ),
        v0 as materialized (
          select sc, st,
                 case when st = '__CONV__' then 1000000::hugeint
                      else 0::hugeint end as v
          from states
        )"""]
    for _r in range(1, _mk_rounds + 1):
        _mk_parts.append(f"""
        v{_r} as materialized (
          select v.sc, v.st,
                 case when v.st in ('__CONV__', '__NULL__') then v.v
                      when upd.nv is not null then upd.nv
                      else v.v end as v
          from v{_r - 1} v
          left join (
            select s.sc, s.f as st,
                   (2 * sum(s.n::hugeint * pv.v)
                    + max(o.o)::hugeint)
                   // (2 * max(o.o)::hugeint) as nv
            from strans s
            join v{_r - 1} pv on pv.sc = s.sc and pv.st = s.t
            join outs o on o.sc = s.sc and o.f = s.f
            group by s.sc, s.f
          ) upd on upd.sc = v.sc and upd.st = v.st
        )""")
    _mk_final = f"""
        pf as (
          select v as p_full from v{_mk_rounds}
          where sc = '__FULL__' and st = '__START__'
        ),
        pr as (
          select sc as channel, v as p_rem from v{_mk_rounds}
          where sc <> '__FULL__' and st = '__START__'
        ),
        rem as (
          select channel, greatest(p_full - p_rem, 0) as r, p_full
          from pr, pf
        ),
        tot as (select sum(r)::hugeint as tr from rem)
        select channel,
               cast(p_full as double) / 1000000.0 as p_full,
               cast(p_full - r as double) / 1000000.0 as p_removed,
               cast(r as double) / 1000000.0 as removal_effect,
               case when tr > 0 then
                 cast((2 * r * 1000000::hugeint + tr) // (2 * tr)
                      as double) / 1000000.0
               end as share
        from rem, tot
        order by channel
    """
    out["markov_attribution"] = (
        ",".join(_mk_parts) + "," + _mk_final
    )

    _pd_m = 5
    _pd_head = f"""
        with daily as (
          select cast(ts as date) as d,
                 sum(cast(value as decimal(18,2))) as v
          from events group by 1
        ),
        idx as (
          select row_number() over (order by d) as t, v from daily
        ),
        tot as (
          select count(*)::bigint as n,
                 cast(sum(v) as decimal(38,2)) as s
          from idx
        ),
        cent as (
          select t, cast(tot.n * v - tot.s as decimal(19,2)) as c
          from idx, tot
        ),
        cl as materialized (
          select tl.lag, count(*)::bigint as n_pairs,
                 cast(sum(a.c * b.c) as decimal(38,4)) as c
          from cent a, unnest(range(0, {_pd_m + 1})) as tl(lag)
          join cent b on a.t + tl.lag = b.t
          group by tl.lag
        ),
        rho as (
          select lag, n_pairs,
                 case when (select cast(c as double) from cl
                            where lag = 0) != 0
                      then round(cast(c as double)
                                 / (select cast(c as double) from cl
                                    where lag = 0), 6)
                 end as rho
          from cl where lag >= 1
        ),
        rl as (
          select list(rho order by lag) as r,
                 list(n_pairs order by lag) as np
          from rho
        ),
        l1 as (
          select r, np, [r[1]]::double[] as phi, r[1] as pk1 from rl
        )"""
    _pd_parts = [_pd_head]
    for _k in range(2, _pd_m + 1):
        _prev_pks = ", ".join(f"pk{_j}" for _j in range(1, _k))
        _num = f"r[{_k}]"
        for _j in range(1, _k):
            _num = f"({_num} - phi[{_j}] * r[{_k - _j}])"
        _den = "1.0"
        for _j in range(1, _k):
            _den = f"({_den} - phi[{_j}] * r[{_j}])"
        _newphi = ", ".join(
            [f"phi[{_j}] - pk * phi[{_k - _j}]" for _j in range(1, _k)]
            + ["pk"]
        )
        _pd_parts.append(f"""
        l{_k} as (
          select r, np, {_prev_pks},
                 [{_newphi}]::double[] as phi,
                 pk as pk{_k}
          from (
            select r, np, phi, {_prev_pks},
                   case when {_den} != 0
                        then {_num} / {_den} end as pk
            from l{_k - 1}
          )
        )""")
    _pd_final = "\n        union all\n".join(
        f"""
        select {_l} as lag, np[{_l}] as n_pairs, r[{_l}] as rho,
               round(pk{_l}, 6) as pacf
        from l{_pd_m}"""
        for _l in range(1, _pd_m + 1)
    )
    out["pacf_durbin"] = (
        ",".join(_pd_parts) + _pd_final + " order by lag"
    )

    out["burrows_delta"] = """
        with tok as (
          select source as s,
                 unnest(regexp_extract_all(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g')), '\\S+')) as w
          from documents where source is not null
        ),
        cnt as (
          select s, w, count(*)::bigint as c from tok group by s, w
        ),
        tot as (select s, sum(c)::bigint as t from cnt group by s),
        topw as (
          select w from (
            select w, sum(c) as cw from cnt group by w
            order by cw desc, w limit 20
          )
        ),
        dense as (
          select tot.s, topw.w, tot.t,
                 cast((2 * coalesce(cnt.c, 0)::hugeint * 1000000
                       + tot.t)
                      // (2 * tot.t::hugeint) as bigint) as f
          from tot cross join topw
          left join cnt on cnt.s = tot.s and cnt.w = topw.w
        ),
        stats as (
          select w, count(*)::bigint as nsrc,
                 cast(sum(cast(f as decimal(38,0)))
                      as decimal(38,0)) as sf,
                 cast(sum(cast(f as decimal(38,0))
                          * cast(f as decimal(38,0)))
                      as decimal(38,0)) as sff
          from dense group by w
        ),
        z as (
          select d.s, d.w,
                 (cast(d.f as double) - cast(sf as double) / nsrc)
                 / sqrt(cast(cast(nsrc as decimal(38,0)) * sff
                             - sf * sf as double)
                        / (cast(nsrc as double)
                           * cast(nsrc as double))) as z
          from dense d join stats using (w)
          where cast(cast(nsrc as decimal(38,0)) * sff - sf * sf
                     as double)
                / (cast(nsrc as double) * cast(nsrc as double)) > 0
        ),
        folded as (
          select a.s as source_a, b.s as source_b,
                 count(*)::bigint as n_words,
                 list_sort(list(struct_pack(w := a.w,
                                            d := abs(a.z - b.z))))
                   as ds
          from z a join z b on a.w = b.w and a.s < b.s
          group by a.s, b.s
        )
        select source_a, source_b, n_words,
               case when n_words > 0 then
                 round(list_reduce(list_transform(ds, x -> x.d),
                                   (acc, v) -> acc + v)
                       / cast(n_words as double), 6)
               end as delta
        from folded
        order by source_a, source_b
    """

    out["ransac_line"] = """
        with base as (
          select cast(o_orderkey as varchar) as id,
                 cast(cast(o_orderkey % 100 as double)
                      as decimal(18,2)) as x,
                 cast(3.0 * cast(o_orderkey % 100 as double) + 5.0
                      + cast((o_orderkey % 3) - 1 as double) * 0.5
                      + case when o_orderkey % 7 = 0
                             then 500.0 else 0.0 end
                      as decimal(18,2)) as y
          from orders
        ),
        trials as (select unnest(range(0, 64))::int as t),
        hashed as (
          select id, x, y,
                 ('0x' || substr(md5('rl17:a:' || id), 1, 8))::bigint
                   % 2147483648 as ha,
                 ('0x' || substr(md5('rl17:b:' || id), 1, 8))::bigint
                   % 2147483648 as hb
          from base
        ),
        drawn as (
          select t,
                 min(struct_pack(
                   h := (ha * (2 * t + 1) + 1000003 * t) % 2147483647,
                   id := id, x := x, y := y)) as p1,
                 min(struct_pack(
                   h := (hb * (2 * t + 1) + 1000003 * t) % 2147483647,
                   id := id, x := x, y := y)) as p2
          from hashed cross join trials
          group by t
        ),
        lines as (
          select t, p1.x as x1, p1.y as y1,
                 p2.x - p1.x as dx, p2.y - p1.y as dy
          from drawn where p2.x - p1.x <> 0
        ),
        scored as (
          select l.t, count(*)::bigint as inl
          from base b cross join lines l
          where abs((b.y - l.y1) * l.dx - (b.x - l.x1) * l.dy)
                <= cast(2.0 as decimal(18,6)) * abs(l.dx)
          group by l.t
        ),
        best as (
          select l.t, l.x1, l.y1, l.dx, l.dy,
                 coalesce(s.inl, 0) as inl
          from lines l left join scored s using (t)
          order by inl desc, t limit 1
        ),
        nn as (select count(*)::bigint as n from base)
        select n,
               cast(t as bigint) as best_trial,
               cast(inl as bigint) as n_inliers,
               round(cast(dy as double) / cast(dx as double), 6)
                 as slope,
               round(cast(y1 as double)
                     - cast(x1 as double)
                       * (cast(dy as double) / cast(dx as double)), 6)
                 as intercept
        from nn left join best on true
    """

    out["ransac_subsampled"] = """
        with base as (
          select cast(o_orderkey as varchar) as id,
                 cast(cast(o_orderkey % 100 as double)
                      as decimal(18,2)) as x,
                 cast(3.0 * cast(o_orderkey % 100 as double) + 5.0
                      + cast((o_orderkey % 3) - 1 as double) * 0.5
                      + case when o_orderkey % 7 = 0
                             then 500.0 else 0.0 end
                      as decimal(18,2)) as y
          from orders
        ),
        trials as (select unnest(range(0, 64))::int as t),
        sub as (
          select * from base
          where ('0x' || substr(md5('rl17:s:' || id), 1, 8))::bigint
                % 2147483648 % 8 = 0
        ),
        hashed as (
          select id, x, y,
                 ('0x' || substr(md5('rl17:a:' || id), 1, 8))::bigint
                   % 2147483648 as ha,
                 ('0x' || substr(md5('rl17:b:' || id), 1, 8))::bigint
                   % 2147483648 as hb
          from sub
        ),
        drawn as (
          select t,
                 min(struct_pack(
                   h := (ha * (2 * t + 1) + 1000003 * t) % 2147483647,
                   id := id, x := x, y := y)) as p1,
                 min(struct_pack(
                   h := (hb * (2 * t + 1) + 1000003 * t) % 2147483647,
                   id := id, x := x, y := y)) as p2
          from hashed cross join trials
          group by t
        ),
        lines as (
          select t, p1.x as x1, p1.y as y1,
                 p2.x - p1.x as dx, p2.y - p1.y as dy
          from drawn where p2.x - p1.x <> 0
        ),
        scored_sub as (
          select l.t, count(*)::bigint as inl_sub
          from sub b cross join lines l
          where abs((b.y - l.y1) * l.dx - (b.x - l.x1) * l.dy)
                <= cast(2.0 as decimal(18,6)) * abs(l.dx)
          group by l.t
        ),
        best_line as (
          select l.t, l.x1, l.y1, l.dx, l.dy,
                 coalesce(s.inl_sub, 0) as inl_sub
          from lines l left join scored_sub s using (t)
          order by inl_sub desc, t limit 1
        ),
        recount as (
          select l.t, count(*)::bigint as inl
          from base b cross join best_line l
          where abs((b.y - l.y1) * l.dx - (b.x - l.x1) * l.dy)
                <= cast(2.0 as decimal(18,6)) * abs(l.dx)
          group by l.t
        ),
        best as (
          select l.t, l.x1, l.y1, l.dx, l.dy,
                 coalesce(r.inl, 0) as inl
          from best_line l left join recount r using (t)
        ),
        nn as (select count(*)::bigint as n from base)
        select n,
               cast(t as bigint) as best_trial,
               cast(inl as bigint) as n_inliers,
               round(cast(dy as double) / cast(dx as double), 6)
                 as slope,
               round(cast(y1 as double)
                     - cast(x1 as double)
                       * (cast(dy as double) / cast(dx as double)), 6)
                 as intercept
        from nn left join best on true
    """

    out["unigram_lm"] = _unigram_lm_oracle_sql(40, 16, 3, 4, 16)
    out["unigram_encode"] = _unigram_lm_oracle_sql(
        40, 16, 3, 4, 16, final="encode"
    )

    out["cramers_v"] = """
        with base as (
          select cast(o_orderstatus as varchar) as a,
                 cast(o_orderpriority as varchar) as b
          from orders
          where o_orderstatus is not null
            and o_orderpriority is not null
        ),
        cells as (
          select a, b, count(*)::bigint as n from base group by a, b
        ),
        ra as (select a, sum(n)::bigint as r from cells group by a),
        cb as (select b, sum(n)::bigint as c from cells group by b),
        grid as (
          select ra.a, cb.b, coalesce(cells.n, 0)::bigint as n,
                 ra.r, cb.c
          from ra cross join cb
          left join cells on cells.a = ra.a and cells.b = cb.b
        ),
        folded as (
          select count(distinct a)::bigint as n_rows,
                 count(distinct b)::bigint as n_cols,
                 sum(n)::bigint as n,
                 list(struct_pack(a := a, b := b, n := n,
                                  r := r, c := c)
                      order by a, b, n, r, c) as cells
          from grid
        ),
        stat as (
          select n, n_rows, n_cols,
                 (n_rows - 1) * (n_cols - 1) as dof,
                 list_reduce(list_transform(cells, t ->
                   cast((n::hugeint * t.n::hugeint
                         - t.r::hugeint * t.c::hugeint)
                        * (n::hugeint * t.n::hugeint
                           - t.r::hugeint * t.c::hugeint) as double)
                   / cast(n::hugeint * t.r::hugeint * t.c::hugeint
                          as double)),
                   (acc, v) -> acc + v) as chi2_raw
          from folded
        )
        select n, n_rows, n_cols, cast(dof as bigint) as dof,
               case when dof > 0 and n > 0
                    then round(chi2_raw, 6) end as chi2,
               case when dof > 0 and n > 0 then
                 round(sqrt(round(chi2_raw, 6)
                   / (n::double
                      * least(n_rows - 1, n_cols - 1)::double)), 6)
               end as cramers_v
        from stat
    """

    _mood_p = norm_sf_sql("sqrt(chi2)")
    out["mood_median"] = f"""
        with filt as (
          select cast(c_mktsegment as varchar) as g,
                 cast(c_acctbal as decimal(18,2)) as v
          from customer
          where c_mktsegment is not null and c_acctbal is not null
        ),
        vt as (select v, count(*)::bigint as nt from filt group by v),
        cum as (
          select v, nt,
                 coalesce(sum(nt) over (order by v
                   rows between unbounded preceding
                   and 1 preceding), 0) as below
          from vt
        ),
        tot as (select count(*)::bigint as N from filt),
        med as (
          select v as med from cum, tot
          where below + nt >= (N + 1) // 2
          order by v limit 1
        ),
        split as (
          select g,
                 sum(case when v > med then 1 else 0 end)::bigint
                   as ab,
                 sum(case when v <= med then 1 else 0 end)::bigint
                   as le
          from filt, med group by g
        ),
        folded as (
          select count(*)::bigint as k_groups,
                 sum(ab + le)::bigint as n,
                 sum(ab)::bigint as n_above,
                 list(struct_pack(g := g, ab := ab, le := le)
                      order by g, ab, le) as rows_
          from split
        ),
        stat as (
          select n, k_groups, n_above,
                 list_reduce(list_transform(rows_, t ->
                   cast((n::hugeint * t.ab::hugeint
                         - (t.ab + t.le)::hugeint * n_above::hugeint)
                        * (n::hugeint * t.ab::hugeint
                           - (t.ab + t.le)::hugeint
                             * n_above::hugeint) as double)
                   / cast(n::hugeint * (t.ab + t.le)::hugeint
                          * n_above::hugeint as double)
                   + cast((n::hugeint * t.le::hugeint
                           - (t.ab + t.le)::hugeint
                             * (n - n_above)::hugeint)
                          * (n::hugeint * t.le::hugeint
                             - (t.ab + t.le)::hugeint
                               * (n - n_above)::hugeint) as double)
                   / cast(n::hugeint * (t.ab + t.le)::hugeint
                          * (n - n_above)::hugeint as double)),
                   (acc, v) -> acc + v) as chi2_raw
          from folded
        ),
        res as (
          select n, k_groups,
                 cast(med as double) as grand_median, n_above,
                 case when k_groups > 1 and n_above > 0
                       and n_above < n
                      then round(chi2_raw, 6) end as chi2,
                 case when k_groups > 1
                      then cast(k_groups - 1 as bigint) end as df
          from stat, med
        )
        select n, k_groups, grand_median, n_above, chi2, df,
               case when k_groups = 2 and chi2 is not null
                    then round(least(1.0, 2.0 * {_mood_p}), 6)
               end as p_value
        from res
    """

    from etl_orders_to_bq_spark.operators.audit import BENFORD_P

    _bp = ", ".join(
        f"({d + 1}, {p!r})" for d, p in enumerate(BENFORD_P)
    )
    out["benford_mad"] = f"""
        with digits as (
          select d::varchar as d, e
          from (values {_bp}) v(d, e)
        ),
        base as (
          select regexp_extract(
                   cast(abs(cast(l_extendedprice as decimal(18,2)))
                        as varchar), '[1-9]', 0) as d
          from lineitem
        ),
        obs as (
          select d, count(*)::bigint as n from base
          where d <> '' group by d
        ),
        grid as (
          select digits.d, digits.e, coalesce(obs.n, 0)::bigint as n
          from digits left join obs using (d)
        ),
        folded as (
          select sum(n)::bigint as N,
                 list(struct_pack(d := d, n := n, e := e)
                      order by d, n, e) as rows_
          from grid
        ),
        stat as (
          select N,
                 list_reduce(list_transform(rows_, t ->
                   (t.n::double / N::double - t.e)
                   * (t.n::double / N::double - t.e) / t.e),
                   (acc, v) -> acc + v) * N::double as chi2_raw,
                 list_reduce(list_transform(rows_, t ->
                   abs(t.n::double / N::double - t.e)),
                   (acc, v) -> acc + v) / 9.0 as mad_raw
          from folded
        )
        select cast(g.d as int) as digit, g.n as n_obs,
               case when s.N > 0
                    then round(g.n::double / s.N::double, 6)
               end as p_obs,
               round(g.e, 6) as p_expected,
               case when s.N > 0 then round(s.chi2_raw, 6) end as chi2,
               case when s.N > 0 then round(s.mad_raw, 6) end as mad
        from grid g, stat s
        order by digit
    """

    out["fd_discovery"] = """
        with cols as (
          select cast(o_orderkey as varchar) as c1,
                 cast(o_custkey as varchar) as c2,
                 cast(o_orderstatus as varchar) as c3,
                 cast(o_orderpriority as varchar) as c4
          from orders
        ),
        longf as (
          select 'o_orderkey' as col, c1 as v, c2, c3, c4 from cols
        ),
        pairs as (
          select det, dep, a, nb from (
            select 'o_orderkey' as det, 'o_custkey' as dep,
                   c1 as a, count(distinct c2) as nb
            from cols where c1 is not null and c2 is not null
            group by c1
            union all
            select 'o_orderkey', 'o_orderstatus', c1,
                   count(distinct c3)
            from cols where c1 is not null and c3 is not null
            group by c1
            union all
            select 'o_orderkey', 'o_orderpriority', c1,
                   count(distinct c4)
            from cols where c1 is not null and c4 is not null
            group by c1
            union all
            select 'o_custkey', 'o_orderkey', c2, count(distinct c1)
            from cols where c2 is not null and c1 is not null
            group by c2
            union all
            select 'o_custkey', 'o_orderstatus', c2,
                   count(distinct c3)
            from cols where c2 is not null and c3 is not null
            group by c2
            union all
            select 'o_custkey', 'o_orderpriority', c2,
                   count(distinct c4)
            from cols where c2 is not null and c4 is not null
            group by c2
            union all
            select 'o_orderstatus', 'o_orderkey', c3,
                   count(distinct c1)
            from cols where c3 is not null and c1 is not null
            group by c3
            union all
            select 'o_orderstatus', 'o_custkey', c3,
                   count(distinct c2)
            from cols where c3 is not null and c2 is not null
            group by c3
            union all
            select 'o_orderstatus', 'o_orderpriority', c3,
                   count(distinct c4)
            from cols where c3 is not null and c4 is not null
            group by c3
            union all
            select 'o_orderpriority', 'o_orderkey', c4,
                   count(distinct c1)
            from cols where c4 is not null and c1 is not null
            group by c4
            union all
            select 'o_orderpriority', 'o_custkey', c4,
                   count(distinct c2)
            from cols where c4 is not null and c2 is not null
            group by c4
            union all
            select 'o_orderpriority', 'o_orderstatus', c4,
                   count(distinct c3)
            from cols where c4 is not null and c3 is not null
            group by c4
          )
        )
        select det, dep,
               count(*)::bigint as n_distinct_det,
               sum(nb)::bigint as n_distinct_pair,
               sum(case when nb > 1 then 1 else 0 end)::bigint
                 as n_violating_det,
               sum(case when nb > 1 then 1 else 0 end) = 0 as holds
        from pairs
        group by det, dep
        order by det, dep
    """

    out["lof_outliers"] = """
        with e as (
          select vec_id as id,
                 list_transform(cast(embedding as double[]),
                   x -> cast(round(x * 1e6, 0) as bigint)) as v
          from embeddings where vec_id % 8 = 0
        ),
        pairs as (
          select a.id as a, b.id as b,
                 round(sqrt(list_dot_product(
                   list_transform(list_zip(a.v, b.v),
                                  x -> x[1] - x[2]),
                   list_transform(list_zip(a.v, b.v),
                                  x -> x[1] - x[2]))) / 1e6, 6)
                   as dist
          from e a, e b where a.id <> b.id
        ),
        knn as (
          select a, b, dist from (
            select a, b, dist,
                   row_number() over (partition by a
                     order by dist, b) as rk
            from pairs
          ) where rk <= 5
        ),
        kd as (
          select a, max(dist) as k_dist, count(*)::bigint as keff
          from knn group by a
        ),
        reach as (
          select k.a,
                 cast(round(greatest(kb.k_dist, k.dist) * 1e6, 0)
                      as bigint) as reach_mu
          from knn k join kd kb on kb.a = k.b
        ),
        rsum as (
          select a, sum(reach_mu)::bigint as rsum_mu
          from reach group by a
        ),
        lrd as (
          select kd.a, kd.k_dist, kd.keff,
                 case when r.rsum_mu > 0 then
                   round(kd.keff::double * 1e6 / r.rsum_mu::double, 6)
                 end as lrd
          from kd join rsum r using (a)
        ),
        nbr as (
          select k.a,
                 cast(round(lb.lrd * 1e6, 0) as bigint) as lrd_b_mu
          from knn k join lrd lb on lb.a = k.b
        ),
        nsum as (
          -- count() skips NULL lrd (duplicate-cluster neighbors);
          -- LOF is NULL unless every neighbor lrd is defined
          -- (mirrors operators/ann.py lof_scores, advisor r12)
          select a, sum(lrd_b_mu)::bigint as nsum_mu,
                 count(lrd_b_mu)::bigint as ncnt
          from nbr group by a
        )
        select l.a as vec_id, l.k_dist, l.lrd,
               case when l.lrd is not null and l.lrd > 0
                         and n.ncnt = l.keff then
                 round(n.nsum_mu::double
                       / (l.keff::double * l.lrd * 1e6), 6)
               end as lof
        from lrd l join nsum n using (a)
        order by lof desc, vec_id
    """

    out["dbscan"] = """
        with recursive e as (
          select vec_id as id,
                 list_transform(cast(embedding as double[]),
                   x -> cast(round(x * 1e6, 0) as bigint)) as v
          from embeddings where vec_id % 8 = 0
        ),
        near as (
          select a.id as a, b.id as b
          from e a, e b
          where a.id <> b.id
            and round(sqrt(list_dot_product(
                  list_transform(list_zip(a.v, b.v), x -> x[1] - x[2]),
                  list_transform(list_zip(a.v, b.v), x -> x[1] - x[2])
                )) / 1e6, 6) <= 1.25
        ),
        core as (
          select a from near group by a
          having count(*) + 1 >= 3
        ),
        ce as (
          select n.a, n.b from near n
          join core ca on ca.a = n.a
          join core cb on cb.a = n.b
          where n.a < n.b
        ),
        sym as (
          select a, b from ce union select b as a, a as b from ce
        ),
        reach as (
          select a, a as b from sym
          union
          select a, b from sym
          union
          select r.a, s.b from reach r join sym s on r.b = s.a
        ),
        comp0 as (
          select a, min(b) as label from reach group by a
        ),
        comp as (
          select a, label from comp0
          union all
          select core.a, core.a as label from core
          where core.a not in (select a from comp0)
        ),
        border as (
          select n.a, min(c.label) as label
          from near n join comp c on c.a = n.b
          where n.a not in (select a from comp)
          group by n.a
        ),
        labeled as (
          select a, label, 'core' as role from comp
          union all
          select a, label, 'border' as role from border
        )
        select e.id as vec_id, l.label,
               coalesce(l.role, 'noise') as role
        from e left join labeled l on l.a = e.id
        order by label nulls last, vec_id
    """

    out["jaro_winkler_pairs"] = """
        with words as (
          select distinct unnest(regexp_extract_all(trim(
                   regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   '\\S+')) as w
          from documents
        ),
        pairs as (
          select a.w as name_a, b.w as name_b,
                 round(jaro_winkler_similarity(a.w, b.w), 6) as jw
          from words a, words b where a.w < b.w
        )
        select name_a, name_b, jw from pairs
        where jw >= 0.7
        order by jw desc, name_a, name_b
    """

    out["shapley_attribution"] = """
        with recursive conv_users as (
          select distinct user_id as u from events
          where event_type = 'purchase'
        ),
        touches as (
          select distinct user_id as u, event_type as c from events
          where event_type is not null and event_type <> 'purchase'
        ),
        chans as (
          select c, (row_number() over (order by c) - 1)::int as i
          from (select distinct c from touches)
        ),
        cc as (select count(*)::int as nc from chans),
        fact as (
          select 0 as k, 1::hugeint as f
          union all
          select k + 1, f * (k + 1)::hugeint
          from fact, cc where k < nc
        ),
        masks as (
          select cu.u,
                 coalesce(bit_or(1::bigint << ch.i), 0) as mask
          from conv_users cu
          left join touches t on t.u = cu.u
          left join chans ch on ch.c = t.c
          group by cu.u
        ),
        mc as (
          select mask, count(*)::bigint as n from masks group by mask
        ),
        subsets as (
          select unnest(range(0,
            (select 1::bigint << nc from cc))) as s
        ),
        vtab as (
          select s.s, coalesce(sum(mc.n), 0)::hugeint as v
          from subsets s
          left join mc on mc.mask > 0 and (mc.mask & s.s) = mc.mask
          group by s.s
        ),
        unattr as (
          select coalesce(
            (select n from mc where mask = 0), 0)::bigint as un
        ),
        tot as (
          select v.v as total from vtab v, cc
          where v.s = (1::bigint << nc) - 1
        ),
        contrib as (
          select ch.c as channel,
                 sum(f1.f * f2.f * (v2.v - v1.v))::hugeint as num
          from chans ch
          cross join cc
          join vtab v1 on (v1.s & (1::bigint << ch.i)) = 0
          join vtab v2 on v2.s = (v1.s | (1::bigint << ch.i))
          join fact f1 on f1.k = bit_count(v1.s)
          join fact f2 on f2.k = nc - 1 - bit_count(v1.s)
          group by ch.c
        )
        select co.channel,
               cast((2 * co.num * 1000000 + cf.f) // (2 * cf.f)
                    as double) / 1000000.0 as shapley,
               (select total from tot)::bigint as n_attributable,
               (select un from unattr) as n_unattributable
        from contrib co, cc
        join fact cf on cf.k = nc
        order by channel
    """

    _hb_sf = norm_sf_sql("abs(z)")
    out["holm_bonferroni"] = f"""
        with g as (
          select c_mktsegment, count(c_acctbal) as n,
                 round(cast(sum(cast(c_acctbal as decimal(18,2)))
                            as double) / count(c_acctbal), 6) as mean
          from customer group by 1
        ),
        gl as (
          select round(cast(sum(cast(c_acctbal as decimal(18,2)))
                            as double) / count(c_acctbal), 6) as m0,
                 round(cast(sum(cast(c_acctbal as decimal(18,2))
                                * cast(c_acctbal as decimal(18,2)))
                            as double) / count(c_acctbal), 6) as m2
          from customer
        ),
        s as (
          select g.*, round(case when m2 - m0 * m0 > 0
                            then (mean - m0)
                                 / sqrt((m2 - m0 * m0) / n) end, 6) as z
          from g, gl
        ),
        p as (
          select *, case when z is not null then
                 round(least(1.0, 2.0 * {_hb_sf}), 6) end as p_value
          from s
        ),
        r as (
          select *,
                 row_number() over (order by p_value nulls last,
                                    c_mktsegment) as p_rank,
                 count(*) over () as m
          from p
        ),
        flagged as (
          select *, case when p_value <= 0.05 / (m - p_rank + 1)
                         then 1 else 0 end as ok
          from r
        ),
        stepped as (
          select *, min(ok) over (order by p_value nulls last,
                        c_mktsegment rows between unbounded preceding
                        and current row) as all_ok
          from flagged
        )
        select c_mktsegment, cast(n as bigint) as n, mean, z,
               p_value, p_rank, all_ok = 1 as rejected
        from stepped order by c_mktsegment
    """

    out["pps_systematic"] = """
        with base as (
          select o_orderkey as id,
                 cast(cast(o_totalprice as decimal(18,2)) * 100
                      as bigint) as w
          from orders
          where o_totalprice is not null
            and cast(o_totalprice as decimal(18,2)) > 0
            and o_orderkey is not null
        ),
        cum as (
          select id, w,
                 coalesce(sum(w) over (order by id
                   rows between unbounded preceding
                   and 1 preceding), 0) as below
          from base
        ),
        tot as (select sum(w)::bigint as tw from base),
        scored as (
          select id, w, tw,
            case when 400::hugeint * (below + w)::hugeint < tw
                 then -1
                 else ((400::hugeint * (below + w)::hugeint
                        - tw::hugeint) // (2 * tw::hugeint))::bigint
            end as khi,
            case when 400::hugeint * below::hugeint < tw then -1
                 else ((400::hugeint * below::hugeint
                        - tw::hugeint) // (2 * tw::hugeint))::bigint
            end as klo
          from cum, tot
        )
        select id as o_orderkey, w::double / 100.0 as weight,
               (least(khi, 199) - least(klo, 199))::bigint as n_hits,
               round(least(1.0,
                 200.0 * w::double / tw::double), 6) as pi
        from scored
        where least(khi, 199) - least(klo, 199) > 0
        order by o_orderkey
    """



    out["friedman_test"] = """
        with daily as (
          select cast(ts as date) as b, event_type as j,
                 sum(cast(value as decimal(18,2))) as v
          from events
          where ts is not null and event_type is not null
            and value is not null
          group by 1, 2
        ),
        kk as (select count(distinct j)::bigint as k from daily),
        bc as (
          select b, count(*) as nb, count(distinct j) as nj
          from daily group by b
        ),
        nblocks as (select count(*)::bigint as n_blocks from bc),
        complete as (
          select b from bc, kk where nb = k and nj = k
        ),
        kept as (select d.* from daily d join complete using (b)),
        ranked as (
          select a.b, a.j,
                 cast(2 * sum(case when c.v < a.v then 1 else 0 end)
                      + sum(case when c.v = a.v then 1 else 0 end)
                      + 1 as bigint) as r2
          from kept a join kept c on a.b = c.b
          group by a.b, a.j
        ),
        perj as (
          select j,
                 cast(sum(r2) as decimal(38,0)) as R2,
                 count(*)::bigint as n
          from ranked group by j
        ),
        ssq as (
          select cast(sum(cast(r2 as decimal(38,0))
                          * cast(r2 as decimal(38,0)))
                      as decimal(38,0)) as ssq
          from ranked
        ),
        agg as (
          select max(k) as k_treatments,
                 max(n)::bigint as n_blocks_used,
                 cast(sum((R2 - cast(n * (k + 1) as decimal(38,0)))
                          * (R2 - cast(n * (k + 1) as decimal(38,0))))
                      as decimal(38,0)) as sdev
          from perj, kk
        ),
        q as (
          select k_treatments, n_blocks_used,
                 case when cast(ssq - cast(n_blocks_used * k_treatments
                        * (k_treatments + 1) * (k_treatments + 1)
                        as decimal(38,0)) as double) > 0
                      then round(
                        cast(k_treatments - 1 as double)
                        * cast(sdev as double)
                        / cast(ssq - cast(n_blocks_used * k_treatments
                            * (k_treatments + 1) * (k_treatments + 1)
                            as decimal(38,0)) as double), 6)
                 end as q_stat
          from agg, ssq
        )
        select k_treatments, n_blocks,
               coalesce(n_blocks_used, 0) as n_blocks_used, q_stat,
               case when n_blocks_used > 0 and k_treatments > 1
                         and q_stat is not null
                    then round(q_stat
                               / cast(n_blocks_used
                                      * (k_treatments - 1) as double),
                               6)
               end as kendalls_w
        from q, nblocks
    """

    _sil_final = """
        ,
        sil as (
          select cluster,
                 case when s >= 0
                      then cast(floor(s * 1000000 + 0.5) as bigint)
                      else -cast(floor(-s * 1000000 + 0.5) as bigint)
                 end as sm
          from (
            select cluster,
                   case when greatest(ld[cluster + 1], bo) > 0
                        then (bo - ld[cluster + 1])
                             / greatest(ld[cluster + 1], bo)
                        else 0.0 end as s
            from (
              select a.cluster,
                     (select list(sqrt(greatest(
                          list_dot_product(a.v, a.v)
                          - 2.0 * list_dot_product(a.v, c.vec)
                          + list_dot_product(c.vec, c.vec), 0.0))
                            order by c.cluster)
                      from c3 c) as ld
              from afinal a
            ),
            lateral (select list_aggregate(
                       list_filter(ld, (x, i) -> i != cluster + 1),
                       'min') as bo)
          )
        ),
        agg as (
          select cluster, count(*)::bigint as n,
                 sum(sm)::hugeint as ssum
          from sil group by cluster
        )
        select cluster, n,
               cast(case when ssum >= 0
                         then (2 * abs(ssum) + n) // (2 * n::hugeint)
                         else -((2 * abs(ssum) + n) // (2 * n::hugeint))
                    end as double) / 1000000.0 as mean_silhouette
        from agg
        order by cluster
    """
    out["silhouette"] = _lloyd_oracle_sql(
        dim=64, k=8, seed=7, rounds=3, final_select=_sil_final
    )

    _cq_sf = norm_sf_sql("sqrt(q_stat)")
    out["cochran_q"] = f"""
        with cells as (
          select cast(ts as date) as b, event_type as j,
                 case when max(value) > 150 then 1 else 0 end as x
          from events
          where ts is not null and event_type is not null
          group by 1, 2
        ),
        kk as (select count(distinct j)::bigint as k from cells),
        bc as (
          select b, count(*) as nb, count(distinct j) as nj,
                 sum(x) as r
          from cells group by b
        ),
        nblocks as (select count(*)::bigint as n_blocks from bc),
        complete as (select * from bc, kk where nb = k and nj = k),
        rows_agg as (
          select count(*)::bigint as n_blocks_used,
                 cast(sum(r) as decimal(38,0)) as n_tot,
                 cast(sum(cast(r as decimal(38,0))
                          * cast(r as decimal(38,0)))
                      as decimal(38,0)) as sr2
          from complete
        ),
        cols_agg as (
          select cast(sum(cast(c as decimal(38,0))
                          * cast(c as decimal(38,0)))
                      as decimal(38,0)) as sc2
          from (
            select j, sum(x) as c
            from cells join (select b from complete) using (b)
            group by j
          )
        ),
        base as (
          select k as k_treatments, n_blocks,
                 coalesce(n_blocks_used, 0) as n_blocks_used,
                 case when k > 1 then cast(k - 1 as bigint) end as df,
                 case when k > 1
                       and cast(cast(k as decimal(38,0)) * n_tot - sr2
                                as double) > 0
                      then round(
                        cast(cast(k - 1 as decimal(38,0))
                             * (cast(k as decimal(38,0)) * sc2
                                - n_tot * n_tot) as double)
                        / cast(cast(k as decimal(38,0)) * n_tot - sr2
                               as double), 6)
                 end as q_stat
          from rows_agg, cols_agg, kk, nblocks
        )
        select k_treatments, n_blocks, n_blocks_used, df, q_stat,
               case when k_treatments = 2 and q_stat is not null
                    then round(least(1.0,
                      2.0 * {_cq_sf}), 6)
               end as p_value
        from base
    """

    _dn_p = _nsf("abs(z)")
    out["dunn_posthoc"] = f"""
        with f as (
          select event_type as g, value as v from events
          where value is not null and event_type is not null
        ),
        vc as (
          select v, g, count(*) as ngv from f group by v, g
        ),
        vt as (select v, sum(ngv) as nt from vc group by v),
        cum as (
          select *,
                 coalesce(sum(nt) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as below
          from vt
        ),
        perg as (
          select g,
                 cast(sum(cast(ngv as decimal(38,0))
                          * cast(2 * below + nt + 1 as decimal(38,0)))
                      as decimal(38,0)) as two_rg,
                 cast(sum(ngv) as bigint) as ng
          from vc join cum using (v) group by g
        ),
        tie as (
          select cast(sum(cast(nt as decimal(38,0))
                          * cast(nt as decimal(38,0))
                          * cast(nt as decimal(38,0))
                          - cast(nt as decimal(38,0)))
                      as decimal(38,0)) as ties,
                 cast(sum(nt) as bigint) as n
          from cum
        ),
        pairs as (
          select a.g as group_a, b.g as group_b,
                 a.ng as n_a, b.ng as n_b,
                 cast(a.two_rg as double) / (2.0 * cast(a.ng as double))
                   as ra,
                 cast(b.two_rg as double) / (2.0 * cast(b.ng as double))
                   as rb,
                 cast(n as double) * (cast(n as double) + 1.0) / 12.0
                   - cast(ties as double)
                     / (12.0 * (cast(n as double) - 1.0)) as s2,
                 n
          from perg a join perg b on a.g < b.g, tie
        ),
        staged as (
          select group_a, group_b, n_a, n_b,
                 round(ra, 6) as mean_rank_a,
                 round(rb, 6) as mean_rank_b,
                 case when n > 1 and s2 > 0 then
                   round((ra - rb)
                         / sqrt(s2 * (1.0 / cast(n_a as double)
                                      + 1.0 / cast(n_b as double))),
                         6)
                 end as z
          from pairs
        )
        select group_a, group_b, n_a, n_b, mean_rank_a, mean_rank_b,
               z,
               case when z is not null
                    then round(least(1.0, 2.0 * {_dn_p}), 6)
               end as p_value
        from staged
        order by group_a, group_b
    """

    out["streaming_funnel"] = """
        with steps as (
          select user_id,
                 row_number() over (partition by user_id
                                    order by ts, event_id) as rn,
                 event_type
          from events
          where event_type in ('view', 'click', 'purchase')
        ),
        nper as (
          select user_id, count(*) as nr from steps group by user_id
        ),
        users as (select distinct user_id from events),
        m as (
          with recursive walk as (
            select user_id, 0 as rn, 0 as stage,
                   0::bigint as done
            from users
            union all
            select w.user_id, w.rn + 1,
                   case when s.event_type =
                          case w.stage when 0 then 'view'
                                       when 1 then 'click'
                                       else 'purchase' end
                        then case when w.stage = 2 then 0
                                  else w.stage + 1 end
                        else w.stage end,
                   case when w.stage = 2 and s.event_type = 'purchase'
                        then w.done + 1 else w.done end
            from walk w
            join steps s on s.user_id = w.user_id
                        and s.rn = w.rn + 1
          )
          select * from walk
        )
        select m.user_id, m.done as n_completions,
               cast(m.stage as int) as stage
        from m join nper on nper.user_id = m.user_id
                        and nper.nr = m.rn
        union all
        select u.user_id, 0 as n_completions, 0 as stage
        from users u
        where not exists (select 1 from steps s
                          where s.user_id = u.user_id)
        order by user_id
    """

    out["jackknife_ratio"] = """
        with base as (
          select l_returnflag as g,
                 cast(cast(l_extendedprice as decimal(18,2)) * 100
                      as hugeint) as y,
                 cast(cast(l_quantity as decimal(18,2)) * 100
                      as hugeint) as x
          from lineitem
          where l_returnflag is not null
            and l_extendedprice is not null and l_quantity is not null
        ),
        sums as (
          select g, count(*)::bigint as n,
                 sum(y)::hugeint as sy, sum(x)::hugeint as sx
          from base group by g
        ),
        pseudo as (
          select base.g, n, sy, sx,
                 case when sx - x <> 0 then
                   (case when ((sy - y) < 0) != ((sx - x) < 0)
                         then -1 else 1 end)
                   * ((2 * abs(sy - y) * 1000000 + abs(sx - x))
                      // (2 * abs(sx - x)))
                 end as r
          from base join sums using (g)
        ),
        agg as (
          select g as "group", max(n) as n,
                 cast(sum(case when r is not null then 1 else 0 end)
                      as bigint) as n_defined,
                 sum(r)::hugeint as sr,
                 sum(r * r)::hugeint as srr,
                 max(sy) as sy, max(sx) as sx
          from pseudo group by g
        )
        select "group", n, n_defined,
               case when cast(sx as double) != 0
                    then round(cast(sy as double) / cast(sx as double),
                               6) end as ratio,
               case when n_defined = n and n > 1 then
                 round(sqrt(greatest(
                   (cast(n as double) - 1.0) / cast(n as double)
                   * (cast(srr as double)
                      - cast(sr as double) * cast(sr as double)
                        / cast(n as double)), 0.0)) / 1000000, 6)
               end as se_jackknife
        from agg
        order by "group"
    """

    out["james_stein"] = """
        with perg as (
          select cast(c_nationkey as varchar) as g,
                 count(*)::bigint as n,
                 cast(sum(cast(c_acctbal as decimal(18,2)))
                      as decimal(38,2)) as s,
                 cast(sum(cast(c_acctbal as decimal(18,2))
                          * cast(c_acctbal as decimal(18,2)))
                      as decimal(38,4)) as q
          from customer
          where c_nationkey is not null and c_acctbal is not null
          group by 1
        ),
        pg as (
          select g, n, s, q,
                 (case when s >= 0 then 1 else -1 end)
                 * cast((2 * cast(abs(s) * 100 as hugeint) * 10000
                         + cast(n as hugeint))
                        // (2 * cast(n as hugeint)) as bigint)
                   as mean_micro,
                 case when n > 1 then
                   cast(cast(n as decimal(38,0)) * q - s * s as double)
                   / (cast(n as double) * cast(n as double)
                      * (cast(n as double) - 1.0))
                 end as se2
          from perg
        ),
        folded as (
          select sum(case when n > 1 then 1 else 0 end)::bigint as k2,
                 sum(case when n > 1 then mean_micro end)::hugeint
                   as sm2,
                 list_sort(list(struct_pack(g := g,
                                            mm := mean_micro,
                                            se2 := se2))) as gs
          from pg
        ),
        hyper as (
          select k2,
                 list_filter(gs, t -> t.se2 is not null) as gs2,
                 case when k2 > 0 then
                   (case when sm2 >= 0 then 1 else -1 end)
                   * cast((2 * abs(sm2) + k2)
                          // (2 * greatest(k2, 1)::hugeint)
                          as bigint)
                 end as m_micro
          from folded
        ),
        hyper2 as (
          select m_micro,
                 case when k2 > 0 then greatest(
                   list_reduce(list_transform(gs2, t ->
                     (cast(t.mm - m_micro as double) / 1000000.0)
                     * (cast(t.mm - m_micro as double) / 1000000.0)),
                     (acc, v) -> acc + v)
                   / greatest(cast(k2 as double) - 1.0, 1.0)
                   - list_reduce(list_transform(gs2, t ->
                       coalesce(t.se2, 0.0)), (acc, v) -> acc + v)
                     / greatest(cast(k2 as double), 1.0),
                   0.0) end as tau2
          from hyper
        )
        select g as "group", n,
               cast(mean_micro as double) / 1000000 as mean,
               case when n > 1 then
                 round(case when tau2 + se2 > 0
                            then tau2 / (tau2 + se2) else 0.0 end, 6)
               end as weight,
               case when n > 1 then
                 round(cast(m_micro as double) / 1000000
                       + (case when tau2 + se2 > 0
                               then tau2 / (tau2 + se2) else 0.0 end)
                         * (cast(mean_micro as double) / 1000000
                            - cast(m_micro as double) / 1000000), 6)
               end as shrunk_mean
        from pg, hyper2
        order by "group"
    """

    out["dunning_llr"] = """
        with tw as (
          select regexp_extract_all(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g')), '\\S+') as ws
          from documents
        ),
        bg as (
          select ws[i] as w1, ws[i+1] as w2
          from tw, unnest(range(1, greatest(len(ws), 1))) as t(i)
        ),
        pairs as (
          select w1, w2, count(*)::bigint as c12 from bg group by w1, w2
        ),
        lefts as (select w1, sum(c12) as c1 from pairs group by w1),
        rights as (select w2, sum(c12) as c2 from pairs group by w2),
        tot as (select cast(sum(c12) as bigint) as n from pairs),
        scored as (
          select w1, w2, c12,
                 round(2.0 * (
                   (case when c12::double > 0 then c12::double
                     * ln(c12::double * n::double
                          / (c1::double * c2::double)) else 0.0 end)
                   + (case when (c1 - c12)::double > 0
                      then (c1 - c12)::double
                        * ln((c1 - c12)::double * n::double
                             / (c1::double * (n - c2)::double))
                      else 0.0 end)
                   + (case when (c2 - c12)::double > 0
                      then (c2 - c12)::double
                        * ln((c2 - c12)::double * n::double
                             / ((n - c1)::double * c2::double))
                      else 0.0 end)
                   + (case when (n - c1 - c2 + c12)::double > 0
                      then (n - c1 - c2 + c12)::double
                        * ln((n - c1 - c2 + c12)::double * n::double
                             / ((n - c1)::double * (n - c2)::double))
                      else 0.0 end)
                 ), 6) as llr
          from pairs join lefts using (w1) join rights using (w2), tot
        )
        select w1, w2, c12 as n_pair, llr
        from scored
        order by llr desc, w1, w2
        limit 20
    """

    _hd_exp = _det_exp_sql("h")
    out["hill_diversity"] = f"""
        with tw as (
          select regexp_extract_all(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g')), '\\S+') as ws
          from documents
        ),
        tok as (
          select ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] as w
          from tw, unnest(range(1, greatest(len(ws) - 1, 1))) as t(i)
        ),
        vocab as (select w, count(*)::bigint as c from tok group by w),
        agg as (
          select cast(sum(c) as bigint) as n_units,
                 count(*)::bigint as q0_richness,
                 cast(sum(cast(c as decimal(38,0))
                          * cast(c as decimal(38,0)))
                      as decimal(38,0)) as sc2,
                 list_sort(list(c)) as cs
          from vocab
        ),
        hh as (
          select *,
                 round(-list_reduce(list_transform(cs, c ->
                   (c::double / n_units::double)
                   * ln(c::double / n_units::double)),
                   (acc, t) -> acc + t), 6) as h
          from agg
        )
        select n_units, q0_richness, h as shannon_h,
               round({_hd_exp}, 6) as q1_shannon_eff,
               round(n_units::double * n_units::double
                     / cast(sc2 as double), 6) as q2_inv_simpson,
               case when q0_richness > 1
                    then round(h / ln(q0_richness::double), 6)
               end as pielou_evenness
        from hh
    """

    out["capture_recapture"] = """
        with a as (
          select distinct md5(text) as fp from documents
          where ('0x' || substr(md5('a:' || doc_id::varchar), 1, 8))
                ::bigint % 3 < 2
        ),
        b as (
          select distinct md5(text) as fp from documents
          where ('0x' || substr(md5('b:' || doc_id::varchar), 1, 8))
                ::bigint % 3 < 2
        ),
        counts as (
          select (select count(*) from a)::bigint as n1,
                 (select count(*) from b)::bigint as n2,
                 (select count(*) from a join b using (fp))::bigint as m
        )
        select n1, n2, m as m_overlap,
               round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 6)
                 as n_hat,
               round(sqrt((n1 + 1.0) * (n2 + 1.0)
                          * (n1 - m) * (n2 - m)
                          / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 6)
                 as se,
               case when (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0 > 0
                    then round((n1 + n2 - m)
                               / ((n1 + 1.0) * (n2 + 1.0)
                                  / (m + 1.0) - 1.0), 6)
               end as coverage
        from counts
    """

    _mk2_p = _nsf("abs(z)")
    out["mann_kendall"] = f"""
        with daily as (
          select cast(ts as date) as d,
                 sum(cast(value as decimal(18,2))) as v
          from events group by 1
        ),
        s as (
          select cast(sum(case when b.v > a.v then 1
                               when b.v < a.v then -1
                               else 0 end) as bigint) as s_stat
          from daily a join daily b on a.d < b.d
        ),
        tie as (
          select cast(sum(t * (t - 1) * (2 * t + 5)) as bigint)
                   as tsum
          from (select v, count(*) as t from daily group by v)
        ),
        nr as (select count(*)::bigint as n_days from daily),
        j as (
          select n_days, s_stat,
                 (cast(n_days as double) * (cast(n_days as double) - 1.0)
                  * (2.0 * cast(n_days as double) + 5.0)
                  - cast(tsum as double)) / 18.0 as vs
          from nr, s, tie
        ),
        staged as (
          select n_days, s_stat, round(vs, 6) as var_s,
                 case when vs > 0 then round(
                   (case when s_stat > 0
                         then cast(s_stat as double) - 1.0
                         when s_stat < 0
                         then cast(s_stat as double) + 1.0
                         else 0.0 end) / sqrt(vs), 6)
                 end as z
          from j
        )
        select n_days, s_stat, var_s, z,
               case when z is not null
                    then round(least(1.0, 2.0 * {_mk2_p}), 6)
               end as p_value
        from staged
    """

    out["theil_index"] = """
        with rev as (
          select o_custkey, sum(o_totalprice) as rv
          from orders group by o_custkey
        ),
        base as (
          select cast(c_nationkey as varchar) as g,
                 cast(rv as decimal(18,2)) as x
          from rev join customer on o_custkey = c_custkey
          where c_nationkey is not null and rv is not null
            and cast(rv as double) > 0
        ),
        totals as (
          select g, count(*)::bigint as ng,
                 cast(sum(x) as decimal(38,2)) as xg
          from base group by g
        ),
        terms as (
          select b.g,
                 (cast(b.x as double) / cast(t.xg as double))
                 * ln(cast(b.x as double) * cast(t.ng as double)
                      / cast(t.xg as double)) as term
          from base b join totals t using (g)
        ),
        perg as (
          select g,
                 cast(sum(case when term >= 0
                          then cast(floor(term * 1000000 + 0.5)
                                    as bigint)
                          else -cast(floor(-term * 1000000 + 0.5)
                                     as bigint) end)
                      as decimal(38,0)) as tsum
          from terms group by g
        ),
        grand as (
          select cast(sum(ng) as bigint) as n,
                 cast(sum(xg) as decimal(38,2)) as xx
          from totals
        ),
        g_rows as (
          select p.g as "group", t.ng as n,
                 round(cast(t.xg as double) / cast(xx as double), 6)
                   as share,
                 round(cast(tsum as double) / 1000000.0, 6) as theil
          from perg p join totals t using (g), grand
        ),
        folded as (
          select max(n) as n,
                 list_sort(list(struct_pack(
                   g := p.g,
                   s := cast(t.xg as double) / cast(xx as double),
                   ng := t.ng,
                   tw := cast(tsum as double) / 1000000.0))) as gs
          from perg p join totals t using (g), grand
        ),
        summ as (
          select n,
                 list_reduce(list_transform(gs, e ->
                   e.s * ln(e.s * cast(n as double)
                            / cast(e.ng as double))),
                   (acc, v) -> acc + v) as between_t,
                 list_reduce(list_transform(gs, e -> e.s * e.tw),
                   (acc, v) -> acc + v) as within_t
          from folded
        )
        select * from (
          select "group", n, share, theil from g_rows
          union all
          select '__BETWEEN__', n, 1.0, round(between_t, 6) from summ
          union all
          select '__TOTAL__', n, 1.0, round(between_t + within_t, 6)
          from summ
        )
        order by "group"
    """

    _lr_p = _nsf("abs(z)")
    out["log_rank"] = f"""
        with su as (
          select user_id, min(ts) as s_ts from events
          where event_type = 'signup' group by user_id
        ),
        oe as (select max(ts) as end_ts from events),
        subj as (
          select case when su.user_id % 2 = 0 then 'even'
                      else 'odd' end as cohort,
                 cast(floor((epoch(coalesce(fp.first_p, oe.end_ts))
                             - epoch(su.s_ts)) / 60) as bigint)
                   as d,
                 (fp.first_p is not null) as e
          from su
          left join (
            select su2.user_id, min(p.ts) as first_p
            from su su2 join events p
              on p.user_id = su2.user_id
             and p.event_type = 'purchase' and p.ts >= su2.s_ts
            group by su2.user_id
          ) fp on fp.user_id = su.user_id, oe
        ),
        isa as (
          select cohort = 'even' as a, d, e from subj
        ),
        vc as (
          select d,
                 sum(case when a and e then 1 else 0 end) as ea,
                 sum(case when not a and e then 1 else 0 end) as eb,
                 sum(case when a then 1 else 0 end) as ta,
                 sum(case when not a then 1 else 0 end) as tb
          from isa group by d
        ),
        cum as (
          select *,
                 coalesce(sum(ta) over (order by d
                   rows between unbounded preceding and 1 preceding),
                   0) as below_a,
                 coalesce(sum(tb) over (order by d
                   rows between unbounded preceding and 1 preceding),
                   0) as below_b
          from vc
        ),
        tot as (
          select cast(sum(ta) as bigint) as n_a,
                 cast(sum(tb) as bigint) as n_b
          from vc
        ),
        terms as (
          select cum.*, n_a, n_b,
                 cast(n_a - below_a as double) as nat,
                 cast(n_b - below_b as double) as nbt
          from cum, tot
          where ea + eb > 0
        ),
        agg as (
          select max(n_a) as n_a, max(n_b) as n_b,
                 cast(sum(ea + eb) as bigint) as n_events,
                 cast(sum(ea) as bigint) as observed_a,
                 cast(sum(floor(nat * cast(ea + eb as double)
                                / (nat + nbt) * 1000000 + 0.5))
                      as decimal(38,0)) as em,
                 cast(sum(floor(case when nat + nbt > 1.0 then
                     cast(ea + eb as double)
                     * (nat + nbt - cast(ea + eb as double))
                     * nat * nbt
                     / ((nat + nbt) * (nat + nbt)
                        * (nat + nbt - 1.0))
                   else 0.0 end * 1000000 + 0.5))
                      as decimal(38,0)) as vm
          from terms
        ),
        staged as (
          select n_a, n_b, n_events, observed_a,
                 round(cast(em as double) / 1000000, 6) as expected_a,
                 case when cast(vm as double) / 1000000 > 0 then
                   round((cast(observed_a as double)
                          - cast(em as double) / 1000000)
                         / sqrt(cast(vm as double) / 1000000), 6)
                 end as z
          from agg
        )
        select n_a, n_b, n_events, observed_a, expected_a, z,
               case when z is not null
                    then round(least(1.0, 2.0 * {_lr_p}), 6)
               end as p_value
        from staged
    """

    _id_cols = [
        ("nation.n_nationkey", "nation", "n_nationkey"),
        ("customer.c_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey", "customer", "c_nationkey"),
        ("supplier.s_nationkey", "supplier", "s_nationkey"),
        ("orders.o_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ]
    _id_pairs = []
    for _la, _tba, _ca in _id_cols:
        for _lb, _tbb, _cb in _id_cols:
            if _la == _lb:
                continue
            _id_pairs.append(f"""
        select '{_la}' as from_col, '{_lb}' as to_col,
               (select count(*) from (
                  select distinct cast({_ca} as bigint) as v
                  from {_tba} where {_ca} is not null))::bigint
                 as n_distinct,
               (select count(*) from (
                  select distinct cast({_ca} as bigint) as v
                  from {_tba} where {_ca} is not null) a
                where not exists (
                  select 1 from {_tbb} b
                  where cast(b.{_cb} as bigint) = a.v))::bigint
                 as n_violations""")
    out["inclusion_deps"] = (
        "select from_col, to_col, n_distinct, n_violations, "
        "n_violations = 0 as holds from ("
        + " union all ".join(_id_pairs)
        + ") order by from_col, to_col"
    )

    out["metric_corr"] = """
        with daily as (
          select cast(ts as date) as d, event_type as k,
                 sum(cast(value as decimal(18,2))) as v
          from events where event_type is not null
          group by 1, 2
        ),
        pairs as (
          select a.k as key_a, b.k as key_b, a.v as x, b.v as y
          from daily a join daily b on a.d = b.d and a.k < b.k
        ),
        agg as (
          select key_a, key_b, count(*)::bigint as n_days,
                 sum(x) as sx, sum(y) as sy, sum(x * y) as sxy,
                 sum(x * x) as sxx, sum(y * y) as syy
          from pairs group by key_a, key_b
        )
        select key_a, key_b, n_days,
               case when n_days > 1
                     and cast(n_days as double) * cast(sxx as double)
                         - cast(sx as double) * cast(sx as double) > 0
                     and cast(n_days as double) * cast(syy as double)
                         - cast(sy as double) * cast(sy as double) > 0
                    then round(
                      (cast(n_days as double) * cast(sxy as double)
                       - cast(sx as double) * cast(sy as double))
                      / sqrt((cast(n_days as double)
                              * cast(sxx as double)
                              - cast(sx as double) * cast(sx as double))
                             * (cast(n_days as double)
                                * cast(syy as double)
                                - cast(sy as double)
                                  * cast(sy as double))), 6)
               end as corr
        from agg
        order by key_a, key_b
    """

    out["wasserstein"] = """
        with f as (
          select event_type as g,
                 cast(value as decimal(18,2)) as v
          from events
          where event_type in ('click', 'error') and value is not null
        ),
        vc as (
          select v,
                 sum(case when g = 'click' then 1 else 0 end) as na,
                 sum(case when g = 'error' then 1 else 0 end) as nb
          from f group by v
        ),
        cum as (
          select *,
                 coalesce(sum(na) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as ba,
                 coalesce(sum(nb) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as bb,
                 lead(v) over (order by v) as vn
          from vc
        ),
        tot as (
          select cast(sum(na) as bigint) as n_a,
                 cast(sum(nb) as bigint) as n_b
          from vc
        ),
        agg as (
          -- counts come from tot, NOT max() over this segment table:
          -- with one distinct value overall there are no consecutive
          -- segments, this CTE is empty, and max() would misreport
          -- (0, 0, NULL) where the engine returns (n_a, n_b, 0.0)
          -- (advisor r12; mirrors operators/multitest.py wasserstein_1d)
          select cast(sum(abs(cast(ba + na as decimal(38,0))
                              * cast(n_b as decimal(38,0))
                              - cast(bb + nb as decimal(38,0))
                                * cast(n_a as decimal(38,0)))
                          * cast(vn - v as decimal(18,2)))
                      as decimal(38,2)) as num
          from cum, tot
          where vn is not null
        )
        select coalesce(tot.n_a, 0) as n_a, coalesce(tot.n_b, 0) as n_b,
               case when tot.n_a > 0 and tot.n_b > 0 then
                 round(cast(coalesce(agg.num,
                                     cast(0 as decimal(38,2))) as double)
                       / (cast(tot.n_a as double)
                          * cast(tot.n_b as double)),
                       6)
               end as w1_distance
        from tot, agg
    """

    out["cliffs_delta"] = """
        with f as (
          select event_type as g, value as v from events
          where event_type in ('click', 'error') and value is not null
        ),
        vc as (
          select v,
                 sum(case when g = 'click' then 1 else 0 end) as na,
                 sum(case when g = 'error' then 1 else 0 end) as nb
          from f group by v
        ),
        cum as (
          select *,
                 coalesce(sum(nb) over (order by v
                   rows between unbounded preceding and 1 preceding),
                   0) as bb
          from vc
        ),
        tot as (
          select cast(sum(na) as bigint) as n_a,
                 cast(sum(nb) as bigint) as n_b
          from vc
        ),
        agg as (
          select max(n_a) as n_a, max(n_b) as n_b,
                 cast(sum(cast(na as decimal(38,0))
                          * cast(bb as decimal(38,0)))
                      as decimal(38,0)) as n_greater,
                 cast(sum(cast(na as decimal(38,0))
                          * cast(n_b - bb - nb as decimal(38,0)))
                      as decimal(38,0)) as n_less
          from cum, tot
        ),
        staged as (
          select n_a, n_b,
                 cast(n_greater as bigint) as n_greater,
                 cast(n_less as bigint) as n_less,
                 case when n_a > 0 and n_b > 0 then
                   round(cast(n_greater - n_less as double)
                         / (cast(n_a as double) * cast(n_b as double)),
                         6)
                 end as delta
          from agg
        )
        select *,
               case when delta is null then null
                    when abs(delta) < 0.147 then 'negligible'
                    when abs(delta) < 0.33 then 'small'
                    when abs(delta) < 0.474 then 'medium'
                    else 'large' end as magnitude
        from staged
    """

    _tp_p = _nsf("abs(z)")
    out["two_proportion"] = f"""
        with per_user as (
          select case when ('0x' || substr(md5('ab:'
                   || user_id::varchar), 1, 8))::bigint % 2 = 0
                 then 'control' else 'treatment' end as arm,
                 max(case when event_type = 'purchase'
                     then 1 else 0 end) as converted
          from events group by user_id
        ),
        agg as (
          select cast(sum(case when arm = 'control' then 1 else 0 end)
                      as bigint) as n_a,
                 cast(sum(case when arm = 'treatment' then 1 else 0 end)
                      as bigint) as n_b,
                 cast(sum(case when arm = 'control' then converted
                          else 0 end) as bigint) as successes_a,
                 cast(sum(case when arm = 'treatment' then converted
                          else 0 end) as bigint) as successes_b
          from per_user
        ),
        mic as (
          select *,
                 case when n_a > 0 then
                   cast((2 * cast(successes_a as hugeint) * 1000000
                         + n_a) // (2 * cast(n_a as hugeint))
                        as bigint) end as pam,
                 case when n_b > 0 then
                   cast((2 * cast(successes_b as hugeint) * 1000000
                         + n_b) // (2 * cast(n_b as hugeint))
                        as bigint) end as pbm,
                 case when n_a + n_b > 0 then
                   cast((2 * cast(successes_a + successes_b as hugeint)
                         * 1000000 + (n_a + n_b))
                        // (2 * cast(n_a + n_b as hugeint))
                        as bigint) end as ppm
          from agg
        ),
        staged as (
          select n_a, n_b, successes_a, successes_b,
                 cast(pam as double) / 1000000 as p_a,
                 cast(pbm as double) / 1000000 as p_b,
                 cast(ppm as double) / 1000000 as p_pool,
                 case when n_a > 0 and n_b > 0
                       and (cast(ppm as double) / 1000000)
                           * (1.0 - cast(ppm as double) / 1000000)
                           * (1.0 / cast(n_a as double)
                              + 1.0 / cast(n_b as double)) > 0
                      then round(
                        (cast(pam as double) / 1000000
                         - cast(pbm as double) / 1000000)
                        / sqrt((cast(ppm as double) / 1000000)
                               * (1.0 - cast(ppm as double) / 1000000)
                               * (1.0 / cast(n_a as double)
                                  + 1.0 / cast(n_b as double))), 6)
                 end as z
          from mic
        )
        select n_a, n_b, successes_a, successes_b, p_a, p_b, p_pool,
               z,
               case when z is not null
                    then round(least(1.0, 2.0 * {_tp_p}), 6)
               end as p_value
        from staged
    """

    return out
