"""Embedding-space near-duplicate removal — the semantic counterpart
of the MinHash/SimHash lexical dedup stack (``operators/dedup.py``).

Two shapes, both blocking-first (never all-pairs):

- ``embedding_neardup_pairs``: random-hyperplane LSH buckets (the same
  deterministic planes as ``operators/ann.py``) -> within-bucket
  pairwise cosine -> threshold. The embedding analogue of MinHash
  banding: candidate generation is a bucket equi-join whose shuffle
  carries only bucketed vectors, and the exact cosine check runs on
  candidates only. Recall is tunable with ``bits`` (fewer bits = bigger
  buckets = higher recall, more compute), same knob as LSH band count.

- ``semdedup_keep``: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) —
  k-means-cluster the embeddings, then inside each cluster drop every
  item whose cosine similarity to a LOWER-ID item of the same cluster
  exceeds the threshold (keep-first-by-id, the deterministic stand-in
  for the paper's keep-lowest-centroid-distance). Clustering bounds the
  candidate set the same way LSH buckets do; centroids are supplied by
  the caller (fit them with ``ann.fit_ivf_centroids`` or bring fixed
  ones for reproducibility).

No counterpart in the reference engine (SURVEY.md §2.2 — no similarity
machinery at all beyond the weighted scorer); the brief's
"embedding-cosine near-dup" line item.

Scale notes (100 TB)
--------------------
- bucket/cluster assignment is a pure Column projection — a scan-shaped
  map stage; persist the assigned table partitioned by bucket/cluster
  so re-runs prune files (same discipline as ``write_ivf_index``);
- the pairwise stage is quadratic ONLY within a bucket, so oversized
  buckets (degenerate embeddings, all-zeros) are dropped via
  ``max_bucket`` — mirror the guard in any oracle, the same contract
  as ``dedup.lsh_candidate_pairs``;
- the per-bucket self-join shuffles each vector once per side; with
  d=64 float vectors that is 256 bytes/row — the candidate join, not
  the corpus text, pays the shuffle (text never enters this operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm
from .ann import assign_ivf_clusters, with_lsh_bucket
from .staging import stage


def _bucket_guarded(
    bucketed: DataFrame, bucket_col: str, max_bucket: int
) -> DataFrame:
    """Drop buckets with more than ``max_bucket`` members (quadratic
    blow-up guard). One tiny agg on the bucket key, broadcast back."""
    sizes = (
        bucketed.groupBy(bucket_col)
        .agg(F.count("*").alias("__bsize"))
        .filter(F.col("__bsize") <= max_bucket)
        .select(bucket_col)
    )
    return bucketed.join(F.broadcast(sizes), bucket_col, "left_semi")


def embedding_neardup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.85,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 100_000,
) -> DataFrame:
    """Candidate near-dup pairs by embedding cosine: (id_a, id_b,
    cos_sim) with id_a < id_b, cos_sim rounded to 6dp and >= threshold,
    both endpoints in the same LSH bucket.

    The threshold compares the ROUNDED similarity, so an oracle
    replaying the arithmetic at 6dp agrees exactly at the boundary.
    """
    v = F.col(vec_col).cast("array<double>")
    # norms are computed ONCE per row here, not per pair — the pair
    # stage is the quadratic part, so it must only pay one dot product
    bucketed = with_lsh_bucket(embeddings, dim, bits, vec_col, seed).select(
        F.col(id_col),
        v.alias("__v"),
        l2_norm(v).alias("__n"),
        "bucket",
    )
    bucketed = _bucket_guarded(bucketed, "bucket", max_bucket)
    a = bucketed.select(
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        "bucket",
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        "bucket",
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    denom = F.col("__na") * F.col("__nb")
    cos = F.when(denom > 0, dot(F.col("__va"), F.col("__vb")) / denom)
    return (
        pairs.select(
            "id_a", "id_b", F.round(cos, 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semdedup_keep(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.85,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 1_000_000,
    checkpoint_path: str | None = None,
) -> DataFrame:
    """SemDeDup keep-set: (id, cluster) for every item NOT dropped.

    An item is dropped iff some lower-id item in the same cluster has
    cosine similarity >= threshold with it (6dp-rounded, same boundary
    contract as ``embedding_neardup_pairs``). Keep-first-by-id makes
    the result order-free and oracle-reproducible; the paper's variant
    (keep the item closest to the centroid) is the same plan with a
    different tie-break column.

    One cluster-key self-join (quadratic within a cluster only, guarded
    by ``max_cluster``) + one anti-join — no iteration: unlike
    connected-components dedup this is NOT transitive (a dropped item
    still shadows its own neighbors), which is exactly SemDeDup's
    semantics and what makes it embarrassingly parallel per cluster.

    The assigned table is STAGED once (``staging.stage``; pass
    ``checkpoint_path`` for the durable parquet variant): it feeds
    three plan branches (both self-join sides + the anti-join), and
    without staging Catalyst duplicates the k×dim centroid argmax
    expression into each — measured 2x slower end-to-end at the gate
    SF purely from optimizing/evaluating the copies. At 100 TB the
    staged frame is the cluster-partitioned persisted assignment
    (``ann.write_ivf_index`` discipline).
    """
    v = F.col(vec_col).cast("array<double>")
    # same one-norm-per-row discipline as embedding_neardup_pairs
    assigned = assign_ivf_clusters(embeddings, centroids, vec_col).select(
        F.col(id_col),
        v.alias("__v"),
        l2_norm(v).alias("__n"),
        F.col("ivf_cluster").alias("cluster"),
    )
    assigned = _bucket_guarded(assigned, "cluster", max_cluster)
    assigned = stage(assigned, checkpoint_path, "semdedup_assigned")
    lower = assigned.select(
        F.col(id_col).alias("__lid"),
        F.col("__v").alias("__lv"),
        F.col("__n").alias("__ln"),
        "cluster",
    )
    denom = F.col("__n") * F.col("__ln")
    cos = F.when(denom > 0, dot(F.col("__v"), F.col("__lv")) / denom)
    shadowed = (
        assigned.join(lower, "cluster")
        .filter(F.col("__lid") < F.col(id_col))
        .filter(F.round(cos, 6) >= threshold)
        .select(id_col)
        .distinct()
    )
    return (
        assigned.join(shadowed, id_col, "left_anti")
        .select(id_col, "cluster")
    )
