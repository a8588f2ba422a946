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


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, __t) with ``__t`` the shared ``\\S+`` token array (empty
    for blank text — extraction, NOT ``split`` which yields ``[""]``;
    VT caveat documented at ``functions.text.tokenize``)."""
    from ..functions.text import tokenize

    return df.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__t")
    )


def _token_windows(toks: DataFrame, L: int, id_col: str) -> DataFrame:
    """Stride-1 ``L``-token windows of a ``_tokenized`` frame:
    (id, __pos, __w) — scan-shaped (in-row slices, no shuffle)."""
    return (
        toks.filter(F.size("__t") >= L)
        .select(
            id_col,
            "__t",
            F.posexplode(F.sequence(F.lit(0), F.size("__t") - L)).alias(
                "__i", "__pos"
            ),
        )
        .select(
            id_col,
            F.col("__pos"),
            F.array_join(F.slice("__t", F.col("__pos") + 1, L), " ").alias(
                "__w"
            ),
        )
    )


def _dup_window_hits(
    df: DataFrame, min_tokens: int, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """(tokenized docs, duplicated-window hit positions).

    Hits: (id, __pos) for every stride-1 window of ``min_tokens``
    tokens whose joined content occurs >= 2 times corpus-wide.
    """
    toks = _tokenized(df, text_col, id_col)
    w = _token_windows(toks, min_tokens, id_col)
    # stage 1: fingerprint-duplicated candidates (8-byte shuffle keys).
    # NO forced broadcast: the duplicated-fingerprint set scales with
    # corpus duplicate volume (boilerplate-heavy crawls reach 10^8+
    # distinct duplicated windows, past the 8 GB broadcast ceiling) —
    # Catalyst/AQE picks broadcast when the set is actually small
    w = w.withColumn("__fp", F.xxhash64("__w"))
    dup_fp = (
        w.groupBy("__fp")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__fp")
    )
    cand = w.join(dup_fp, "__fp", "left_semi")
    # stage 2: exact content verify on candidates only
    dup_w = (
        cand.groupBy("__w")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__w")
    )
    hits = cand.join(dup_w, "__w", "left_semi").select(id_col, "__pos")
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


def benchmark_ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    ngram: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train/eval n-gram overlap decontamination census — the GPT-3 /
    PaLM evaluation-hygiene check (Brown et al. 2020 App. C; public
    literature): a training document is CONTAMINATED when it shares
    any ``ngram``-token window with any benchmark document.

    One row per train document: (id, n_windows, flagged_windows,
    n_eval_docs, contaminated) — ``flagged_windows`` counts distinct
    overlapping train positions, ``n_eval_docs`` the distinct
    benchmark documents hit (the triage column: one eval doc hit 50
    times is a verbatim leak; 50 eval docs hit once is boilerplate).
    Documents shorter than ``ngram`` tokens have ``n_windows = 0`` and
    are trivially clean. Removal is policy: drop flagged docs
    (`filter(~contaminated)`), or feed the flagged windows to
    ``_merged_spans`` for surgical span excision — the census is the
    operator, exactly as the papers report it.

    Scale: train windows are scan-shaped; the eval side (benchmark
    suites are ~10^5-10^6 windows, corpus-independent) is DISTINCTED
    then broadcast, so the overlap join touches each train window
    in-place — no corpus-sized shuffle; the per-doc rollup ships only
    flagged (id, pos, eval_id) rows. ``broadcast_eval=True`` (the
    documented default, sized for benchmark suites) FORCES that
    broadcast; an eval corpus past the executor broadcast ceiling
    (~100s of MB of distinct windows) would fail the job there — pass
    ``broadcast_eval=False`` to let AQE pick the join strategy, the
    same discipline as the sibling dedup path in this module.
    """
    eval_text_col = eval_text_col or text_col
    eval_id_col = eval_id_col or id_col

    ttoks = _tokenized(train, text_col, id_col)
    tw = _token_windows(ttoks, ngram, id_col)
    ev = eval_df.select(
        F.col(eval_id_col).alias("__eid"),
        F.col(eval_text_col).alias("__etext"),
    )
    ew = (
        _token_windows(_tokenized(ev, "__etext", "__eid"), ngram, "__eid")
        .select("__w", "__eid")
        .distinct()
    )
    if broadcast_eval:
        ew = F.broadcast(ew)
    flagged = tw.join(ew, "__w").groupBy(id_col).agg(
        F.count_distinct("__pos").cast("long").alias("flagged_windows"),
        F.count_distinct("__eid").cast("long").alias("n_eval_docs"),
    )
    totals = ttoks.select(
        id_col,
        F.greatest(
            F.size("__t") - ngram + 1, F.lit(0)
        ).cast("long").alias("n_windows"),
    )
    return totals.join(flagged, id_col, "left").select(
        id_col,
        "n_windows",
        F.coalesce("flagged_windows", F.lit(0)).alias("flagged_windows"),
        F.coalesce("n_eval_docs", F.lit(0)).alias("n_eval_docs"),
        (F.coalesce("flagged_windows", F.lit(0)) > 0).alias(
            "contaminated"
        ),
    )
