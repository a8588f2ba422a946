"""CCNet-style PER-PARAGRAPH curation (Wenzek et al. 2020,
arXiv:1911.00359): quality decisions at paragraph granularity instead
of document granularity — a mostly-good document keeps its good
paragraphs even when a boilerplate block would sink its document-level
score, and repeated boilerplate dies everywhere without dropping its
host documents.

CCNet's order of operations, reproduced here: split into paragraphs ->
corpus-wide exact paragraph dedup (hash, keep FIRST occurrence) ->
per-paragraph quality filter (CCNet uses an LM perplexity band; this
engine scores with the same ``functions.text.quality_score`` heuristic
its document-level filter uses — swap in ``unigram_logprob_scores``
for the LM-scored variant) -> reassemble surviving paragraphs in
original order.

The document-level counterpart is ``pipeline/corpus.py``'s first two
stages; the paragraph-hash dedup is ``spans.span_dedup``'s rule on
natural boundaries instead of fixed-token chunks.

No counterpart in the reference engine (SURVEY.md §2.2).

Scale notes (100 TB)
--------------------
- the split is scan-shaped (posexplode, paragraphs bounded by doc
  size); scoring is pure Column arithmetic on the paragraph string;
- dedup is ONE map-side-combinable groupBy on the paragraph hash
  carrying (hash, doc_id, para_idx) — 48 bytes/row, never text — then
  an equi-join back (keep rows equal to their hash's min occurrence);
- reassembly is one groupBy(doc_id) whose payload is only SURVIVING
  paragraph text; boilerplate-heavy corpora shrink before this widest
  shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score


def paragraph_quality_filter(
    df: DataFrame,
    min_quality: float = 0.35,
    delimiter: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup: bool = True,
) -> DataFrame:
    """One row per input document: (id, n_paras, n_dropped_dup,
    n_dropped_quality, clean_text).

    Paragraphs are ``delimiter``-separated non-blank segments.
    ``dedup=True`` first drops every paragraph whose exact trimmed
    content appeared earlier in the corpus (earlier = smaller
    (doc_id, para_idx), the deterministic keep-first rule); survivors
    with ``quality_score < min_quality`` are then dropped — the drop
    counters attribute each paragraph to the FIRST rule that killed
    it, CCNet's stage order. ``clean_text`` re-joins survivors with
    the delimiter in original order ('' when nothing survives — the
    row is kept so the census is complete).
    """
    # \Q...\E-quote the delimiter: F.split takes a Java REGEX, but the
    # reassembly join below uses the delimiter literally — an unquoted
    # '.' or '|' would shred the text while rejoining with the literal
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + delimiter + "\\E")
        ).alias("__idx", "__p"),
    ).withColumn("__p", F.trim("__p")).filter(F.col("__p") != "")

    # census-complete: drive totals from the INPUT docs so an
    # empty/all-blank document keeps its row (n_paras = 0)
    totals = df.select(id_col).join(
        paras.groupBy(id_col).agg(F.count("*").alias("__n")),
        id_col,
        "left",
    ).select(id_col, F.coalesce("__n", F.lit(0)).alias("n_paras"))

    if dedup:
        first = paras.groupBy("__p").agg(
            F.min(F.struct(F.col(id_col), F.col("__idx"))).alias("__f")
        )
        survivors = paras.join(first, "__p").filter(
            (F.col(f"__f.{id_col}") == F.col(id_col))
            & (F.col("__f.__idx") == F.col("__idx"))
        ).drop("__f")
    else:
        survivors = paras
    after_dedup = survivors.groupBy(id_col).agg(
        F.count("*").alias("__n_dedup")
    )

    kept = survivors.filter(
        quality_score(F.col("__p")) >= F.lit(min_quality)
    )
    kept_g = kept.groupBy(id_col).agg(
        F.count("*").alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("__idx"), F.col("__p"))
                    )
                ),
                lambda s: s["__p"],
            ),
            delimiter,
        ).alias("__clean"),
    )

    return (
        totals.join(after_dedup, id_col, "left")
        .join(kept_g, id_col, "left")
        .select(
            id_col,
            "n_paras",
            (
                F.col("n_paras") - F.coalesce("__n_dedup", F.lit(0))
            ).alias("n_dropped_dup"),
            (
                F.coalesce("__n_dedup", F.lit(0))
                - F.coalesce("__n_kept", F.lit(0))
            ).alias("n_dropped_quality"),
            F.coalesce("__clean", F.lit("")).alias("clean_text"),
        )
    )


def boilerplate_line_filter(
    df: DataFrame,
    min_docs: int = 5,
    delimiter: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document line-FREQUENCY boilerplate removal (the
    RefinedWeb / MassiveWeb rule, Penedo et al. 2023 — public): a line
    whose trimmed form appears in at least ``min_docs`` DISTINCT
    documents is navigation/cookie-banner/footer boilerplate and is
    dropped from EVERY document — unlike keep-first paragraph dedup
    (:func:`paragraph_quality_filter`), which would keep the first
    copy of the cookie banner as if it were content.

    One row per input document — INCLUDING documents with no
    non-empty lines, which census as ``(id, 0, 0, '')`` (r10 review:
    building totals from the exploded frame silently dropped them).
    Output: ``(id, n_lines, n_removed, cleaned)`` with surviving
    lines re-joined in original order. ``delimiter`` is taken
    LITERALLY (regex-quoted for the split — F.split takes a regex,
    the r9 trap — and joined back verbatim).

    Scale: lines explode scan-shaped; the doc-frequency census is a
    two-stage map-side-combinable aggregate on 16-byte line hashes
    (distinct (hash, doc) pairs, then counts — text never shuffles);
    membership is a hash equi-join back (NOT a broadcast — the banned
    set of a 100 TB crawl is itself large); reassembly is one
    groupBy(doc) whose payload is only surviving text.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + delimiter + "\\E")
        ).alias("__i", "__ln"),
    ).filter(F.trim("__ln") != "")
    keyed = lines.withColumn("__h", F.md5(F.trim("__ln")))
    freq = (
        keyed.select("__h", id_col)
        .distinct()
        .groupBy("__h")
        .agg(F.count("*").alias("__df"))
    )
    banned = freq.filter(F.col("__df") >= min_docs).select("__h")
    kept = keyed.join(banned, "__h", "left_anti")
    line_counts = keyed.groupBy(id_col).agg(
        F.count("*").alias("__ntot")
    )
    totals = df.select(F.col(id_col)).distinct().join(
        line_counts, id_col, "left"
    ).select(
        id_col,
        F.coalesce("__ntot", F.lit(0)).alias("n_lines"),
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("__nk"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__i"), F.col("__ln")))
                ),
                lambda s: s["__ln"],
            ),
            delimiter,
        ).alias("cleaned"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.col("n_lines").cast("long").alias("n_lines"),
        (
            F.col("n_lines") - F.coalesce(F.col("__nk"), F.lit(0))
        ).cast("long").alias("n_removed"),
        F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned"),
    )
