"""BM25 document scoring — the retrieval/relevance shape of corpus
processing: score every document against a query term set using the
corpus's own document-frequency statistics (the standard Okapi BM25
with k1/b defaults).

    idf(t)   = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
    score(d) = sum over query terms t of
               idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1 - b + b*|d|/avgdl))

Data flow (all shuffles keyed, no driver loops):

1. explode normalized tokens, keep only query terms — the per-doc term
   frequencies are one groupBy(doc, term) with map-side combine;
2. document frequencies df(t): distinct docs per term — one tiny agg
   over the (doc, term) pairs (|terms| rows out);
3. corpus stats (N, avgdl): a 1-row aggregate kept lazy via broadcast
   cross join;
4. score: join tf to the broadcast df/idf table and aggregate per doc.

At scale the df table is |vocab∩query| rows (tiny — broadcast), the tf
shuffle carries only query-term hits, and the length stats ride the
same first pass. A full-vocabulary BM25 index (all terms, not a query
subset) is the same plan with step 1's filter removed and the df join
shuffled on the term key instead of broadcast.

No counterpart in the reference engine (SURVEY.md §2.2 — no text
processing beyond name cleaning); the formula follows the public Okapi
BM25 definition used by Lucene/Elasticsearch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokenize


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    out_col: str = "bm25",
    ndigits: int = 6,
) -> DataFrame:
    """Score each document against ``query_terms`` (matched on the
    normalized token form). Documents hitting no query term are absent
    from the output (score would be 0; union them back with a left
    join if a dense result is needed)."""
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col),
        F.explode(tokenize(normalize_text(text_col))).alias("w"),
    )
    # per-doc lengths ride the same exploded pass
    lengths = toks.groupBy(id_col).agg(F.count("*").alias("__dl"))
    stats = lengths.agg(
        F.count("*").alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )
    hits = toks.filter(F.col("w").isin(terms))
    tf = hits.groupBy(id_col, "w").agg(F.count("*").alias("__tf"))
    dfreq = hits.groupBy("w").agg(
        F.countDistinct(id_col).alias("__df")
    )
    idf = (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "w",
            F.log(
                1.0
                + (F.col("__n_docs") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5)
            ).alias("__idf"),
            "__avgdl",
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(lengths, id_col)
        .select(
            F.col(id_col),
            (
                F.col("__idf")
                * (F.col("__tf") * (k1 + 1.0))
                / (
                    F.col("__tf")
                    + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
                )
            ).alias("__term_score"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum("__term_score"), ndigits).alias(out_col)
    )
