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
