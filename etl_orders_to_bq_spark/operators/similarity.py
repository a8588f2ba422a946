"""Product-similarity scorer (reference O9-O11).

The reference scores candidates against a target product with a
row-at-a-time Python loop (reference etl/orders_etl.py:94-147):

    score = 0.5*[goods_group ==] + 0.2*[manufacturer ==]
          + 0.3*(1 - |p_t - p_c| / max(p_t, p_c)),   rounded to 5 dp

**The reference's constant swap is intentional behavior**: the
manufacturer match adds PRICE_WEIGHT (0.2) and the price term is scaled
by MANUFACTURER_WEIGHT (0.3) — reference etl/orders_etl.py:140-145,
locked in by its golden test (tests/test_orders_etl.py:185-200). We
reproduce it exactly.

Here the scorer is pure column arithmetic over a broadcast 1-row target
(cross join) — whole-stage codegen, no UDF, no Python loop — so the same
operator scores 8 candidates or 8 billion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

GROUP_WEIGHT = 0.5
PRICE_WEIGHT = 0.2  # added on manufacturer match (reference swap)
MANUFACTURER_WEIGHT = 0.3  # scales the price closeness term (reference swap)


def score_similarity(
    price: Column,
    goods_group: Column,
    manufacturer: Column,
    target_price: Column,
    target_group: Column,
    target_manufacturer: Column,
) -> Column:
    """The reference scoring expression as a single Column."""
    group_term = F.when(goods_group == target_group, F.lit(GROUP_WEIGHT)).otherwise(
        F.lit(0.0)
    )
    manu_term = F.when(
        manufacturer == target_manufacturer, F.lit(PRICE_WEIGHT)
    ).otherwise(F.lit(0.0))
    price_term = (
        F.lit(1.0) - F.abs(target_price - price) / F.greatest(target_price, price)
    ) * F.lit(MANUFACTURER_WEIGHT)
    return F.round(group_term + manu_term + price_term, 5)


def similar_products(
    products: DataFrame,
    target_id: int,
    candidate_ids: list[int] | None = None,
    id_col: str = "product_id",
    price_col: str = "price",
    group_col: str = "goods_group",
    manufacturer_col: str = "manufacturer",
) -> DataFrame:
    """Score candidates against ``target_id``; returns (id, score).

    The 1-row target is broadcast onto every candidate (BroadcastNested-
    LoopJoin of a single row — effectively free); candidates are a
    ``isin`` filter for short id lists, the whole table when None.
    """
    target = broadcast(
        products.filter(F.col(id_col) == target_id).select(
            F.col(price_col).alias("__t_price"),
            F.col(group_col).alias("__t_group"),
            F.col(manufacturer_col).alias("__t_manu"),
        )
    )
    cands = products
    if candidate_ids is not None:
        cands = cands.filter(F.col(id_col).isin(candidate_ids))
    return cands.crossJoin(target).select(
        F.col(id_col),
        score_similarity(
            F.col(price_col),
            F.col(group_col),
            F.col(manufacturer_col),
            F.col("__t_price"),
            F.col("__t_group"),
            F.col("__t_manu"),
        ).alias("score"),
    )


def top_k_similar(
    products: DataFrame, target_id: int, k: int = 10, id_col: str = "product_id", **kw
) -> DataFrame:
    """Scored top-k over the full table. ``orderBy(desc).limit(k)``
    compiles to TakeOrderedAndProject — per-partition heaps of size k,
    no global sort, no full shuffle."""
    scored = similar_products(products, target_id, candidate_ids=None, id_col=id_col, **kw)
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
