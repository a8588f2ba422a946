"""Feature-engineering encoders for ML-training pipelines.

Three encoders a feature platform runs over event/transaction tables
before model training — none exist in the reference engine
(SURVEY.md §2.2 absence families: aggregation + scalar transforms;
reference surface is `etl/orders_etl.py:17-198` only):

- ``target_encode_loo`` — smoothed leave-one-out target (mean)
  encoding of a categorical column. The LOO form subtracts the row's
  own target from its category aggregate so the feature never leaks
  the row's label (the standard trick from the Kaggle/CatBoost
  literature; CatBoost's "ordered boosting" paper, Prokhorenkova et
  al. 2018, motivates why plain mean encoding overfits).
- ``feature_hash`` — the hashing trick (Weinberger et al. 2009):
  tokens land in ``n_buckets`` signed buckets via a hash, giving a
  fixed-width sparse vector with no vocabulary pass at all.
- ``rfm_segments`` — recency/frequency/monetary quintile scoring, the
  classic customer-segmentation feature triple.

Exactness contract (the repo's oracle discipline): every aggregate
that feeds a division is summed in DECIMAL (exact, order-free), each
ratio is ONE double division rounded at 6dp, and hash buckets come
from md5 hex arithmetic both engines compute bit-identically.

Scale notes:
- target encoding: ONE map-side-combinable groupBy over the category
  (|categories| rows out) + a broadcast join back — no row-data
  second shuffle. High-cardinality categories stay a plain shuffle
  join (drop the broadcast hint via ``broadcast_stats=False``).
- feature hashing: explode + ONE (id, bucket) groupBy; output is
  bounded by ``n_buckets`` per document regardless of vocabulary.
- RFM: per-customer aggregate (one shuffle), then three
  ``scalable_ntile`` passes — exact ntile semantics with NO global
  single-partition window (ranking.py two-pass prefix offsets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokenize
from .ranking import scalable_ntile


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 20.0,
    broadcast_stats: bool = True,
    ndigits: int = 6,
) -> DataFrame:
    """Append ``te`` — smoothed leave-one-out target encoding:

        te = (cat_sum - y_i + prior * m) / (cat_cnt - 1 + m)

    where ``prior`` is the global target mean and ``m`` the smoothing
    pseudo-count. A singleton category degrades gracefully to the
    prior (numerator = prior*m, denominator = m). Sums run in
    DECIMAL(18,2); ``prior`` and ``te`` are each ONE double division
    rounded at ``ndigits``.
    """
    y_dec = F.col(target_col).cast("decimal(18,2)")
    stats = df.groupBy(cat_col).agg(
        F.sum(y_dec).alias("__cat_sum"),
        F.count(target_col).alias("__cat_cnt"),
    )
    if broadcast_stats:
        stats = F.broadcast(stats)
    glob = F.broadcast(
        df.agg(
            F.round(
                F.sum(y_dec).cast("double") / F.count(target_col),
                ndigits,
            ).alias("__prior")
        )
    )
    return (
        df.join(stats, cat_col, "left")
        .crossJoin(glob)
        .withColumn(
            "te",
            F.round(
                (
                    (F.col("__cat_sum") - y_dec).cast("double")
                    + F.col("__prior") * F.lit(m)
                )
                / (F.col("__cat_cnt") - F.lit(1) + F.lit(m)),
                ndigits,
            ),
        )
        .drop("__cat_sum", "__cat_cnt", "__prior")
    )


def _md5_bucket(tok: Column, n_buckets: int) -> Column:
    """Unsigned 32-bit value from the first 8 md5 hex chars, mod
    ``n_buckets`` — the engine-portable hash family (md5 is the only
    hash both Spark and the SQL oracle spell identically)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def _md5_sign(tok: Column) -> Column:
    """±1 from the parity of the 9th md5 hex digit — independent of
    the bucket bits (chars 1-8), as the hashing trick requires."""
    parity = F.conv(F.substring(F.md5(tok), 9, 1), 16, 10).cast(
        "long"
    ) % 2
    return F.when(parity == 0, F.lit(1)).otherwise(F.lit(-1))


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Hashing-trick vectorizer: whitespace tokens of the normalized
    text land in ``(bucket, ±1)`` cells; returns the sparse vector as
    ``(id, bucket, weight)`` rows with zero-sum cells dropped (a +1
    and a -1 colliding cancel — that is the estimator, not an error).

    One explode + ONE map-side-combinable groupBy; no vocabulary
    scan, output ≤ ``n_buckets`` rows per document at any corpus
    size.
    """
    tok = F.explode(tokenize(normalize_text(F.col(text_col)))).alias(
        "__tok"
    )
    toks = df.select(F.col(id_col), tok)
    return (
        toks.groupBy(
            id_col,
            _md5_bucket(F.col("__tok"), n_buckets).alias("bucket"),
        )
        .agg(F.sum(_md5_sign(F.col("__tok"))).alias("weight"))
        .filter(F.col("weight") != 0)
    )


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> DataFrame:
    """Per-customer RFM quintiles: recency (days since the customer's
    last order, measured from the global max order date), frequency
    (order count), monetary (DECIMAL-exact revenue), each scored
    1..``n_tiles`` by exact ntile semantics (``scalable_ntile`` —
    ranking.py two-pass, no single-partition window), plus the
    concatenated ``segment`` code.

    Score direction: higher is better — R orders by recency_days
    DESC (most recent customers land in the last, highest tile), F/M
    ascending (biggest spenders highest). Ties break on the customer
    key so the tiling is total and engine-independent.
    """
    per_cust = orders.groupBy(cust_col).agg(
        F.max(date_col).alias("__last"),
        F.count("*").alias("frequency"),
        F.round(
            F.sum(F.col(amount_col).cast("decimal(18,2)")).cast(
                "double"
            ),
            2,
        ).alias("monetary"),
    )
    glob = F.broadcast(orders.agg(F.max(date_col).alias("__gmax")))
    base = per_cust.crossJoin(glob).select(
        F.col(cust_col),
        F.datediff("__gmax", "__last").alias("recency_days"),
        "frequency",
        "monetary",
    )
    scored = scalable_ntile(
        base,
        [F.col("recency_days").desc(), F.col(cust_col)],
        n_tiles,
        out_col="r_score",
    )
    scored = scalable_ntile(
        scored,
        [F.col("frequency"), F.col(cust_col)],
        n_tiles,
        out_col="f_score",
    )
    scored = scalable_ntile(
        scored,
        [F.col("monetary"), F.col(cust_col)],
        n_tiles,
        out_col="m_score",
    )
    return scored.withColumn(
        "segment",
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )
