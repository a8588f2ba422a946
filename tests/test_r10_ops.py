"""Round-10 goldens: oracle-generator fixes and new operators."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_autok_slice_oracle_matches_engine_at_unrealized_k(spark):
    """The count-driven slice oracle (_ivf_assign_autok_sql) must equal
    the engine's assignment at a k NO fixture realizes (n=1200 ->
    k=10) — the exact hole the r9 two-arm CASE left open (advisor
    finding: 1024 < n <= 1920 used k=16 while the engine uses 9..15).
    """
    import math

    from __spark_entry__ import _ivf_assign_autok_sql
    from etl_orders_to_bq_spark.operators.ann import (
        _hyperplanes,
        assign_ivf_clusters,
    )

    n, dim = 1200, 8
    # deterministic synthetic embeddings (LCG, same discipline as
    # _hyperplanes) — no fixture has 1024 < n <= 1920 rows
    state, rows = 12345, []
    for i in range(n):
        vec = []
        for _ in range(dim):
            state = (
                state * 6364136223846793005 + 1442695040888963407
            ) % (2**63)
            vec.append((state / float(2**63)) * 2.0 - 1.0)
        rows.append((i, vec))
    k = max(8, math.ceil(n / 128))
    assert k == 10  # the unrealized arm under test
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    eng = (
        assign_ivf_clusters(df, _hyperplanes(dim, k, 42), "embedding")
        .select("vec_id", "ivf_cluster")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "embeddings", pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    sql = _ivf_assign_autok_sql(dim=dim, max_k=32, seed=42)
    ora = con.execute(
        f"select vec_id, {sql} as ivf_cluster from embeddings "
        "order by vec_id"
    ).df()
    assert list(eng["ivf_cluster"]) == list(ora["ivf_cluster"])


def test_autok_slice_oracle_nulls_loudly_past_bound():
    """Past n > target*max_k the slice expression must yield NULL (a
    loud sweep failure), never a silently truncated centroid set."""
    from __spark_entry__ import _ivf_assign_autok_sql

    con = duckdb.connect()
    con.execute(
        "create table embeddings as "
        "select i as vec_id, [0.1, 0.2]::DOUBLE[] as embedding "
        "from range(5000) t(i)"
    )
    sql = _ivf_assign_autok_sql(
        dim=2, max_k=4, seed=42, target=128
    )  # bound: 512 rows << 5000
    out = con.execute(
        f"select {sql} as b from embeddings limit 1"
    ).fetchone()
    assert out[0] is None
