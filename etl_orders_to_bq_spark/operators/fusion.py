"""Rank fusion — combine multiple retrieval rankings (lexical BM25,
embedding cosine, ...) into one list with Reciprocal Rank Fusion
(Cormack, Clarke & Buettcher 2009):

    rrf(d) = sum over rankings r of 1 / (k + rank_r(d))

Items missing from a ranking contribute nothing for it (the standard
RRF convention), so the fused score never needs score normalization
across heterogeneous scorers — only ranks enter the formula, which is
what makes RRF the default hybrid-search combiner in public engines
(Elasticsearch, Vespa, Weaviate all ship this exact formula).

No counterpart in the reference engine (SURVEY.md §2.2 — no ranking at
all); companion to ``operators/bm25.py`` and ``operators/ann.py``.

Scale notes (100 TB)
--------------------
- rankings are PER-QUERY CANDIDATE LISTS (a retrieval stage's top-n),
  so the rank window partitions on the query key — bounded partitions,
  no global-window cliff; for a corpus-wide global ranking use
  ``ranking.global_row_number`` instead (same output contract);
- the fuse itself is one union + one groupBy on (query, id) — rows in
  = sum of candidate-list sizes, a few hundred per query, so the
  shuffle is negligible next to the retrieval stages feeding it;
- scores are rounded before ranking so rank boundaries are stable
  across engines/partitionings (ties broken by id ascending).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_topn(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n: int,
    partition_cols: list[str] | None = None,
    rank_col: str = "rank",
    ndigits: int = 6,
) -> DataFrame:
    """Top-``n`` rows by (score desc, id asc) with a 1-based ``rank``
    column. ``partition_cols`` (e.g. the query key) keeps the window
    partition-parallel; with None the input must be a bounded candidate
    list (one query's results), not a corpus."""
    w = Window.partitionBy(*(partition_cols or [])).orderBy(
        F.desc(F.round(F.col(score_col), ndigits)), F.asc(id_col)
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    group_cols: list[str] | None = None,
    k: int = 60,
    out_col: str = "rrf_score",
    ndigits: int = 6,
) -> DataFrame:
    """Fuse ranked lists: each input carries (group_cols..., id_col,
    rank_col). Output: (group_cols..., id_col, n_lists, rrf_score)
    with rrf_score = sum of 1/(k + rank) over the lists the id appears
    in, rounded to ``ndigits``."""
    keys = [*(group_cols or []), id_col]
    parts = [r.select(*keys, rank_col) for r in rankings]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy(*keys).agg(
        F.count("*").alias("n_lists"),
        F.round(
            F.sum(1.0 / (F.lit(float(k)) + F.col(rank_col))), ndigits
        ).alias(out_col),
    )


def ranking_metrics(
    ranked: DataFrame,
    group_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "relevance",
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Retrieval-quality metrics per ranked list: ``(group, ndcg_at_k,
    mrr, precision_at_k)`` — the offline eval loop of a search / RAG
    retrieval stack.

    - NDCG@k: DCG with the standard ``rel / log2(rank + 1)`` discount,
      normalized by the IDEAL DCG of the same list (its relevances
      re-sorted descending over the WHOLE list, not just the top k —
      truncating first would overstate quality when good documents
      rank below k). Lists with no relevant document get 0.
    - MRR: reciprocal rank of the first relevant document (0 if none).
    - precision@k: relevant-in-top-k / k.

    Input is one row per (group, ranked item) with an explicit
    ``rank_col`` (1-based) and graded ``rel_col``. One window (ideal
    re-rank) and one groupBy, both keyed on ``group_col`` — a single
    partitioning reused.
    """
    ideal_w = Window.partitionBy(group_col).orderBy(
        F.desc(rel_col), F.asc(rank_col)
    )
    df = ranked.withColumn("__ideal_rank", F.row_number().over(ideal_w))
    rel = F.col(rel_col).cast("double")
    rank = F.col(rank_col)
    dcg = F.sum(
        F.when(rank <= k, rel / F.log2(rank + 1)).otherwise(F.lit(0.0))
    )
    idcg = F.sum(
        F.when(
            F.col("__ideal_rank") <= k,
            rel / F.log2(F.col("__ideal_rank") + 1),
        ).otherwise(F.lit(0.0))
    )
    mrr = F.coalesce(
        F.max(F.when(rel > 0, F.lit(1.0) / rank)), F.lit(0.0)
    )
    prec = (
        F.count(F.when((rel > 0) & (rank <= k), 1)).cast("double") / k
    )
    return df.groupBy(group_col).agg(
        F.round(
            F.when(idcg > 0, dcg / idcg).otherwise(F.lit(0.0)), ndigits
        ).alias("ndcg_at_k"),
        F.round(mrr, ndigits).alias("mrr"),
        F.round(prec, ndigits).alias("precision_at_k"),
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 3,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking per query (Carbonell &
    Goldstein 1998, public literature): greedily select ``k`` items,
    each maximizing

        mmr(c) = lam * rel(c) - (1 - lam) * max_{s in S} cos(c, s)

    over the already-selected set S — the diversity step between
    retrieval and context assembly in every RAG stack (near-identical
    top hits waste the token budget).

    Determinism contract: rel is consumed as given (callers round it;
    the gate query feeds 6dp cosines), every pairwise cosine is
    6dp-rounded before entering the max, the mmr margin is one
    fixed-order double expression, and ties break on the smaller id —
    an oracle can replay the greedy loop as k unrolled CTEs.

    Scale: inherently sequential in k but embarrassingly parallel
    over queries — ONE ``applyInPandas`` over groupBy(query), each
    group a (candidates x dim) matrix; candidate lists are bounded
    by the upstream retrieval top-n (the contract of rrf_fuse), so
    the greedy O(k * n * dim) per query is Arrow-batched numpy, not
    row-Python. The selection never leaves the executor.

    Output: (query, rank, id, mmr_score) with rank 1..k in selection
    order; rank 1's score is its (lam-scaled) relevance.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    lam_f, nd = float(lam), int(ndigits)
    pow10 = 10.0 ** nd

    def _round_away(x):
        # round-half-AWAY-from-zero on the scaled double — mirrors
        # DuckDB's round() (std::round) and Spark's HALF_UP, unlike
        # np.round's half-to-even: a midpoint tie inside the greedy
        # loop would otherwise flip an argmax and change the whole
        # selection suffix
        return np.copysign(np.floor(np.abs(x) * pow10 + 0.5), x) / pow10

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        m = len(pdf)
        X = np.stack(
            [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
        )
        norms = np.sqrt(np.einsum("ij,ij->i", X, X))
        rel = pdf[rel_col].to_numpy(dtype="float64")
        ids = pdf[id_col].to_numpy()
        chosen: list[int] = []
        maxsim = np.full(m, -np.inf)
        rows = []
        for rank in range(1, min(k, m) + 1):
            if chosen:
                last = chosen[-1]
                denom = norms * norms[last]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(denom > 0, X @ X[last] / denom, 0.0)
                cos = _round_away(cos)
                maxsim = np.maximum(maxsim, cos)
                score = lam_f * rel - (1.0 - lam_f) * maxsim
            else:
                score = lam_f * rel
            score = _round_away(score)
            score[chosen] = -np.inf
            # argmax with smaller-id tie-break: ids ascend with the
            # row index (sorted above), np.argmax returns the FIRST max
            pick = int(np.argmax(score))
            rows.append(
                (
                    pdf[query_col].iloc[0],
                    rank,
                    ids[pick],
                    float(score[pick]),
                )
            )
            chosen.append(pick)
        return pd.DataFrame(
            rows, columns=[query_col, "rank", id_col, "mmr_score"]
        )

    schema = T.StructType(
        [
            T.StructField(
                query_col, candidates.schema[query_col].dataType, True
            ),
            T.StructField("rank", T.IntegerType(), True),
            T.StructField(
                id_col, candidates.schema[id_col].dataType, True
            ),
            T.StructField("mmr_score", T.DoubleType(), True),
        ]
    )
    return candidates.groupBy(query_col).applyInPandas(
        _greedy, schema=schema
    )
