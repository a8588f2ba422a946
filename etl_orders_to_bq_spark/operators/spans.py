"""Span-level exact deduplication — dedup at sub-document granularity,
the way public corpus pipelines (Dolma's paragraph dedup, RefinedWeb's
line dedup) remove boilerplate that repeats ACROSS documents without
dropping the documents themselves.

Pipeline: split each document into fixed-token spans (non-overlapping
chunks via ``operators/chunk.py``) -> fingerprint each span -> keep
only the FIRST occurrence of every fingerprint corpus-wide (ordered by
(doc_id, span index) — deterministic and oracle-reproducible) ->
reassemble each document from its surviving spans.

Natural-text pipelines split on paragraph/newline boundaries; the
fixed-token splitter here is the same operator shape with a boundary
rule swap (one ``F.split`` change), and it is what the synthetic
fixture (no newlines) can exercise.

No counterpart in the reference engine (SURVEY.md §2.2 — the reference
dedups whole rows only, ``etl/orders_etl.py:117-128``).

Scale notes (100 TB)
--------------------
- chunking is scan-shaped (no shuffle; see ``chunk_documents``);
- first-occurrence-per-fingerprint is ONE ``min_by``-style shuffle on
  the fingerprint key with map-side partial aggregation — the same
  1-shuffle contract as ``dedup.dedup_exact``; the shuffle carries
  (fingerprint, doc_id, span_idx), 48 bytes/row, never span text;
- the keep-join back is an equi-join on (fingerprint, doc_id,
  span_idx); reassembly is one groupBy(doc_id) whose payload is only
  SURVIVING span text — boilerplate-heavy corpora shrink before the
  widest shuffle, which is the point of running this early.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .chunk import chunk_documents


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 20,
) -> DataFrame:
    """Remove corpus-wide repeated spans, keeping first occurrences.

    Output: one row per input document that has at least one token —
    (id_col, n_spans, n_kept, dedup_text) where ``dedup_text`` is the
    document's surviving spans joined in original order (empty string
    when every span was seen earlier in some lower-id document).
    """
    spans = chunk_documents(
        df, text_col=text_col, id_col=id_col,
        chunk_tokens=span_tokens, overlap=0,
    ).select(
        id_col,
        F.col("chunk_idx").alias("span_idx"),
        F.col("chunk_text").alias("span_text"),
        F.md5(F.col("chunk_text")).alias("fp"),
    )
    # ONE shuffle: min(struct) is map-side combinable, unlike a window
    first = spans.groupBy("fp").agg(
        F.min(F.struct(id_col, "span_idx")).alias("__first")
    ).select(
        "fp",
        F.col(f"__first.{id_col}").alias(id_col),
        F.col("__first.span_idx").alias("span_idx"),
    )
    kept = spans.join(first, ["fp", id_col, "span_idx"], "left_semi")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("span_idx", "span_text"))
                ),
                lambda s: s["span_text"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    totals = spans.groupBy(id_col).agg(F.count("*").alias("n_spans"))
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_spans",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
    )


def repeated_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 20,
    stride: int = 10,
    min_occurrences: int = 2,
    top_n: int = 100,
) -> DataFrame:
    """Report corpus-wide REPEATED token spans — the diagnostic half of
    substring-level dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better", public literature): before
    removing repeated passages, a pipeline wants to SEE them ranked by
    how often they repeat (boilerplate headers, license blocks, quoted
    chain letters).

    Unlike :func:`span_dedup` (non-overlapping chunks, destructive),
    this slides an OVERLAPPING window (``stride`` < ``span_tokens``)
    so passages that straddle chunk boundaries are still caught — the
    stride/window trade mirrors the suffix-array method's sensitivity
    at 1/stride the index size. Only FULL windows participate (a short
    tail window would false-match its containing window's prefix).

    Output: (span_text, n_occurrences, n_docs, first_doc) for spans
    seen >= ``min_occurrences`` times, top ``top_n`` by occurrence
    count (ties broken on span_text — deterministic on any engine).

    Scale: windowing is scan-shaped (in-row array ops, no shuffle);
    the ONE shuffle groups 16-byte fingerprints with map-side partial
    aggregation; span text rides only on the surviving (repeated)
    fingerprints via the final min() — at 100 TB the shuffle carries
    counts, not the corpus. top_n is a TakeOrdered, never a global
    sort.
    """
    if stride < 1 or stride > span_tokens:
        raise ValueError("need 1 <= stride <= span_tokens")
    from ..functions.text import tokenize

    # windows generated directly (not chunk_documents + a tail filter):
    # only FULL windows exist by construction — n_windows =
    # floor((n - span)/stride) + 1 — which also sidesteps a Spark 4.1
    # optimizer bug (filter on a Generate-derived arithmetic column
    # over a Union loses an attribute: "key not found: text#N")
    toks = tokenize(text_col)
    n = F.size(toks)
    nw = (
        F.floor((n - F.lit(span_tokens)) / F.lit(stride)).cast("int") + 1
    )
    wins = F.when(
        n >= span_tokens,
        F.transform(
            F.sequence(F.lit(0), nw - 1),
            lambda i: F.array_join(
                F.slice(toks, i * stride + 1, span_tokens), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    spans = (
        df.select(F.col(id_col).alias("__id"), wins.alias("__w"))
        .select("__id", F.explode("__w").alias("chunk_text"))
        .select(
            F.md5("chunk_text").alias("fp"), "__id", "chunk_text"
        )
    )
    rep = (
        spans.groupBy("fp")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("__id").alias("n_docs"),
            F.min("__id").alias("first_doc"),
            F.min("chunk_text").alias("span_text"),
        )
        .filter(F.col("n_occurrences") >= min_occurrences)
    )
    return (
        rep.select("span_text", "n_occurrences", "n_docs", "first_doc")
        .orderBy(F.desc("n_occurrences"), "span_text")
        .limit(top_n)
    )
