"""Executable entry point — parity with the reference's ``etl/run.py``
(orders+products CSV -> processed table -> sink, plus a similarity
lookup example), generalized to any sink the engine supports.

Usage::

    python -m etl_orders_to_bq_spark.run \
        --orders input_data/orders_s.csv \
        --products input_data/products_s.csv \
        --table /tmp/orders_out            # path (parquet/csv) or
                                           # dataset.table (bigquery)
        --sink-format parquet --if-exists replace
"""

from __future__ import annotations

import argparse

from .pipeline import OrdersEtl
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--orders", required=True, help="orders CSV path")
    ap.add_argument("--products", required=True, help="products CSV path")
    ap.add_argument("--table", required=True, help="sink target")
    ap.add_argument(
        "--sink-format",
        default="parquet",
        choices=["parquet", "csv", "bigquery"],
    )
    ap.add_argument(
        "--if-exists", default="replace", choices=["replace", "append", "fail"]
    )
    ap.add_argument(
        "--similar-to",
        type=int,
        default=None,
        help="optional product id: print its top-10 similar products",
    )
    args = ap.parse_args(argv)

    spark = get_spark(app_name="orders-etl")
    etl = OrdersEtl(
        spark,
        args.orders,
        args.products,
        table_name=args.table,
        sink_format=args.sink_format,
    )
    etl.process()
    etl.write(if_exists=args.if_exists)
    print(f"wrote {etl.output_df.count()} rows to {args.table}")

    if args.similar_to is not None:
        from .operators.similarity import top_k_similar

        for row in top_k_similar(etl.products_df, args.similar_to, k=10).collect():
            print(f"{row['product_id']}\t{row['score']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
