"""Exact substring deduplication — the ExactSubstr shape of Lee et
al. 2021 ("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): find every maximal token span of length >=
``min_tokens`` whose content occurs more than once ANYWHERE in the
corpus (same document included), and remove ALL its occurrences.

The paper's single-node tool builds a suffix array over the
concatenated corpus and walks LCP runs. That data structure is the
wrong primitive for a shuffle-based engine; the Spark-first design
rests on the window equivalence instead:

    a position is covered by some repeated substring of length >= L
    iff it is covered by some repeated L-token window.

(=>: a repeated substring of length m >= L repeats each of its
L-windows; <=: a repeated L-window IS a repeated substring of length
L.) So stride-1 L-token windows + a corpus-wide window-content
group-count + island-merging of the duplicated windows reproduces the
suffix-array answer EXACTLY — not an approximation — while every step
is a scan, a map-side-combinable groupBy, or a per-document window.
``repeated_ngram_spans`` (spans.py) is the strided sampling variant of
the same idea; this operator is the stride-1 exact one.

No counterpart in the reference engine (SURVEY.md §2.2 — whole-row
dedup only, ``etl/orders_etl.py:77-85``).

Scale notes (100 TB)
--------------------
- window extraction is scan-shaped: per-doc token array + in-row
  slices, no shuffle, n_windows ~ n_tokens per doc;
- duplicate detection is TWO-STAGE so the wide shuffle never carries
  window text: stage 1 groups 8-byte xxhash64 fingerprints (map-side
  combine; the only corpus-sized shuffle), stage 2 re-groups the REAL
  window strings of fingerprint-duplicated candidates only —
  candidates are bounded by true duplicate volume (collisions add
  ~n^2/2^64 ~ 0 rows), so exactness costs a candidate-sized shuffle,
  not a corpus-sized one;
- island merge is one per-document window (shuffle keyed by doc id,
  carrying (doc_id, pos) ints for duplicated windows only);
- span removal is an in-row higher-order filter against the doc's own
  merged-span array — no explode, no range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dup_window_hits(
    df: DataFrame, min_tokens: int, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """(tokenized docs, duplicated-window hit positions).

    Tokenized docs: (id, __t) with ``__t`` the ``\\S+`` token array
    (empty for blank text — ``regexp_extract_all``, matching the
    oracle's tokenizer, NOT ``split`` which yields ``[""]``).
    Hits: (id, __pos) for every stride-1 window of ``min_tokens``
    tokens whose joined content occurs >= 2 times corpus-wide.
    """
    toks = df.select(
        F.col(id_col),
        F.regexp_extract_all(F.trim(F.col(text_col)), F.lit(r"(\S+)"), 1).alias(
            "__t"
        ),
    )
    w = (
        toks.filter(F.size("__t") >= min_tokens)
        .select(
            id_col,
            "__t",
            F.posexplode(
                F.sequence(F.lit(0), F.size("__t") - min_tokens)
            ).alias("__i", "__pos"),
        )
        .select(
            id_col,
            F.col("__pos"),
            F.array_join(
                F.slice("__t", F.col("__pos") + 1, min_tokens), " "
            ).alias("__w"),
        )
    )
    # stage 1: fingerprint-duplicated candidates (8-byte shuffle keys)
    w = w.withColumn("__fp", F.xxhash64("__w"))
    dup_fp = (
        w.groupBy("__fp")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__fp")
    )
    cand = w.join(F.broadcast(dup_fp), "__fp", "left_semi")
    # stage 2: exact content verify on candidates only
    dup_w = (
        cand.groupBy("__w")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__w")
    )
    hits = cand.join(F.broadcast(dup_w), "__w", "left_semi").select(
        id_col, "__pos"
    )
    return toks, hits


def _merged_spans(
    hits: DataFrame, min_tokens: int, id_col: str
) -> DataFrame:
    """Merge overlapping/adjacent ``[pos, pos + min_tokens)`` hit
    intervals into maximal spans: (id, span_start, span_end). Standard
    gaps-and-islands on the running max end — identical output to
    islanding the covered-position set (each interval has length L, so
    two intervals merge iff their covered positions touch)."""
    wd = Window.partitionBy(id_col).orderBy("__pos")
    prev_end = F.max(F.col("__pos") + min_tokens).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hits.withColumn(
        "__new",
        F.when(
            prev_end.isNull() | (F.col("__pos") > prev_end), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__isl",
        F.sum("__new").over(
            wd.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return marked.groupBy(id_col, "__isl").agg(
        F.min("__pos").alias("span_start"),
        (F.max("__pos") + min_tokens).alias("span_end"),
    )


def exact_substring_spans(
    df: DataFrame,
    min_tokens: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated spans: (id, span_start, span_end,
    span_tokens), one row per maximal token span [start, end) whose
    every position lies under some corpus-duplicated ``min_tokens``
    window. Token positions are 0-based over the ``\\S+``
    tokenization. Pure integer/string plan — oracle-exact."""
    toks, hits = _dup_window_hits(df, min_tokens, text_col, id_col)
    return _merged_spans(hits, min_tokens, id_col).select(
        id_col,
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
    )


def exact_substring_dedup(
    df: DataFrame,
    min_tokens: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr removal: one row per document — (id, n_tokens,
    dup_tokens, n_spans, clean_text) where ``clean_text`` is the
    document with every duplicated span deleted (ALL occurrences die,
    the Lee et al. contract — a keep-first variant would be the same
    plan with a min-(id,pos)-occurrence exemption) and surviving
    tokens re-joined with single spaces. Documents with no duplicated
    span pass through whitespace-normalized with ``dup_tokens = 0``.
    """
    toks, hits = _dup_window_hits(df, min_tokens, text_col, id_col)
    spans = (
        _merged_spans(hits, min_tokens, id_col)
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            ).alias("__spans")
        )
    )
    joined = toks.join(spans, id_col, "left").withColumn(
        "__spans", F.coalesce("__spans", F.array())
    )
    kept = F.filter(
        F.col("__t"),
        lambda x, i: ~F.exists(
            F.col("__spans"),
            lambda s: (i >= s["s"]) & (i < s["e"]),
        ),
    )
    return joined.select(
        id_col,
        F.size("__t").alias("n_tokens"),
        (F.size("__t") - F.size(kept)).alias("dup_tokens"),
        F.size("__spans").alias("n_spans"),
        F.array_join(kept, " ").alias("clean_text"),
    )
