"""Full-frame e2e parity: the Spark pipeline output must equal an
independent pandas implementation of the reference semantics
(reference etl/orders_etl.py:70-116) row for row, value for value."""

import html
import re

import pandas as pd
import pytest

ORDERS_CSV = "/root/reference/input_data/orders_s.csv"
PRODUCTS_CSV = "/root/reference/input_data/products_s.csv"

ORDERS_COLS = [
    "order_source_id",
    "order_created_datetime",
    "customer_id",
    "status",
    "sum",
    "quantity",
    "name",
    "surname",
    "patronymic",
    "product_id",
]


def _pandas_oracle() -> pd.DataFrame:
    """Independent reimplementation (modern pandas, no reference code):
    read -> repair/cast -> first-occurrence dedup -> clean names ->
    left join."""
    orders = pd.read_csv(ORDERS_CSV, usecols=ORDERS_COLS, dtype=str)
    products = pd.read_csv(
        PRODUCTS_CSV,
        usecols=["product_id", "price", "goods_group", "manufacturer"],
        dtype=str,
    )

    orders["sum"] = orders["sum"].str.replace(",", ".", regex=False).astype(float)
    orders["product_id"] = (
        orders["product_id"].str.replace(r"\D", "", regex=True).astype("int64")
    )
    orders["order_source_id"] = orders["order_source_id"].astype("int64")
    orders["customer_id"] = orders["customer_id"].astype("int64")
    orders["quantity"] = orders["quantity"].astype("int64")
    orders["order_created_datetime"] = pd.to_datetime(
        orders["order_created_datetime"]
    )
    orders = orders.drop_duplicates(
        subset=["order_source_id", "product_id"], keep="first"
    )

    pattern = (
        r"\d|\s|^(-)$|(^\w{1}$)|(^[aoueiyаяєоуиіїе]{0,}$)"
        r"|(^[^aoueiyаяєоуиіїе]{0,}$)"
    )

    def clean(v):
        if pd.isna(v):
            return v
        v = html.unescape(v).lower()
        v = re.sub(r"\d", "", v)
        return re.sub(pattern, "", v)

    for c in ["name", "surname", "patronymic"]:
        orders[c] = orders[c].map(clean)

    products["product_id"] = products["product_id"].astype("int64")
    products["price"] = products["price"].astype(float)
    products = products.drop_duplicates(subset="product_id", keep="first")

    return orders.merge(products, how="left", on="product_id")


def test_full_frame_parity(spark):
    from etl_orders_to_bq_spark.pipeline import OrdersEtl

    etl = OrdersEtl(spark, ORDERS_CSV, PRODUCTS_CSV)
    got = etl.process().toPandas()
    exp = _pandas_oracle()

    assert list(got.columns) == list(exp.columns)
    key = ["order_source_id", "product_id"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_join_matches_pandas_merge_asof(spark):
    """asof_join == pd.merge_asof (backward, inclusive) on random data."""
    import numpy as np

    from etl_orders_to_bq_spark.operators.temporal import asof_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "id": range(300),
            "k": rng.randint(0, 5, 300),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, 300), unit="s"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 100),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, 100), unit="s"),
            "v": rng.rand(100).round(4),
        }
    )
    # merge_asof requires sorted inputs; drop duplicate (k, ts) on the
    # right so "latest at tie" is well-defined on both engines
    right = right.drop_duplicates(subset=["k", "ts"]).sort_values("ts")
    left_sorted = left.sort_values("ts")

    exp = pd.merge_asof(
        left_sorted, right, on="ts", by="k", direction="backward"
    ).sort_values("id")

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            left_ts="ts",
            right_ts="ts",
            value_cols=["v"],
        )
        .toPandas()
        .sort_values("id")
    )
    assert list(got["v"].fillna(-1)) == list(exp["v"].fillna(-1))
