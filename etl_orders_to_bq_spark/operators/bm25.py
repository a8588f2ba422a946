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

from pyspark.sql import DataFrame, Window
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


def tfidf_topterms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    top_n: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Top TF-IDF terms per group — the standard corpus-characterization
    report ("what is each source actually about"): per group g and term
    t, ``score = tf(t, g) * idf(t)`` with the smooth sklearn-style
    ``idf = ln((1 + N) / (1 + df)) + 1`` (N = total docs, df = docs
    containing t), top ``top_n`` by (score desc, term) per group.

    Returns ``(group, term, tf, df, score)``; score ``ndigits``-rounded
    (one ln + one multiply per term — Spark and DuckDB agree at 6dp,
    the adamic_adar ln-parity precedent).

    Scale: one explode projection feeds both aggregates — per-(group,
    term) tf and per-term df are map-side-combinable groupBys; the
    per-group top-k is a window over the (|vocab| x |groups|)-row term
    table, never the corpus; df and the 1-row N aggregate ride
    broadcast joins, kept LAZY (the ``bm25_scores`` pattern — building
    the plan runs no job, and N's count(distinct) ignores null ids
    exactly like SQL).
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("__id"),
        F.explode(tokenize(normalize_text(text_col))).alias("term"),
    )
    tf = toks.groupBy("grp", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.select("__id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    n_docs = df.agg(
        F.countDistinct(F.col(id_col)).alias("__n_docs")
    )
    idf_tab = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        "df",
        (
            F.log(
                (1.0 + F.col("__n_docs")) / (1.0 + F.col("df"))
            )
            + 1.0
        ).alias("__idf"),
    )
    scored = tf.join(F.broadcast(idf_tab), "term").select(
        "grp",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.col("__idf"), ndigits).alias("score"),
    )
    w = Window.partitionBy("grp").orderBy(
        F.desc("score"), F.col("term")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_n)
        .drop("__rn")
        .withColumnRenamed("grp", group_col)
    )


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    ndigits: int = 6,
) -> DataFrame:
    """Per-group lexical census: token count, vocabulary size, hapax
    count (terms occurring exactly once in the group), hapax fraction,
    and type-token ratio — the Heaps'-law corner of corpus QA (a
    source whose hapax fraction collapses is template spam; one whose
    TTR explodes is OCR noise).

    Two map-side-combinable groupBys over one explode pass; report is
    |groups| rows.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(tokenize(normalize_text(text_col))).alias("term"),
    )
    per_term = toks.groupBy("grp", "term").agg(F.count("*").alias("n"))
    return (
        per_term.groupBy("grp")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.sum((F.col("n") == 1).cast("long")).alias("hapax"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_tokens",
            "vocab",
            "hapax",
            F.round(F.col("hapax") / F.col("vocab"), ndigits).alias(
                "hapax_frac"
            ),
            F.round(F.col("vocab") / F.col("n_tokens"), ndigits).alias(
                "type_token_ratio"
            ),
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 50,
) -> DataFrame:
    """Positional inverted index — the retrieval-side data structure
    a corpus pipeline materializes next to BM25 stats: one row per
    term with document frequency, collection frequency, and a
    deterministic postings string ``"doc:p1|p2,doc:p4"`` (docs
    ascending, 0-based token positions ascending).

    Hub guard: a term with df > ``max_postings`` (stopword-class)
    keeps its exact df/cf but a NULL postings string — postings
    payloads stay bounded per term at any corpus size, the same
    explicit-census policy as the LSH ``max_bucket`` and graph
    ``max_degree`` guards (the caller sees WHICH terms were cut,
    nothing is silently wrong).

    Scale: posexplode + one (term, doc) groupBy (positions
    sort_array'd inside the group, bounded by per-doc term count)
    + one term groupBy whose payload is bounded by ``max_postings``.
    Shuffles carry positions as ints, never text.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokenize(normalize_text(F.col(text_col)))).alias(
            "pos", "term"
        ),
    )
    per_doc = toks.groupBy("term", "doc").agg(
        F.count("*").alias("tf"),
        F.array_join(
            F.sort_array(F.collect_list("pos")), "|"
        ).alias("plist"),
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("doc"),
                            F.concat_ws(
                                ":",
                                F.col("doc").cast("string"),
                                F.col("plist"),
                            ).alias("entry"),
                        )
                    )
                ).getField("entry"),
                ",",
            ).alias("postings_raw"),
        )
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
            F.when(
                F.col("df") <= max_postings, F.col("postings_raw")
            ).alias("postings"),
        )
    )
