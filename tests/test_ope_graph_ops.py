"""Tests for the round-7 batch-3 operators: off-policy evaluation
(IPS/SNIPS/ESS) and the per-node local clustering coefficient."""

import hashlib

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.experiment import offpolicy_eval
from etl_orders_to_bq_spark.operators.graph import local_clustering


def _k(event_id: int) -> int:
    h = hashlib.md5(str(event_id).encode()).hexdigest()
    return int(h[:8], 16) % 9


def test_offpolicy_eval_replays_rational_weights(spark):
    rows = [
        # id, matched, reward
        (1, 1, 2.0),
        (2, 0, 5.0),
        (3, 1, 4.0),
        (4, 1, 1.0),
        (5, 0, 3.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, m int, value double")
    out = offpolicy_eval(
        df, match_col=F.col("m"), reward_col="value", id_col="event_id"
    ).collect()[0]
    n = len(rows)
    cs = {i: 25200 // (_k(i) + 1) for i, _, _ in rows}
    wsum_r = sum(cs[i] * r for i, m, r in rows if m)
    wsum = sum(cs[i] for i, m, _ in rows if m)
    w2sum = sum(cs[i] ** 2 for i, m, _ in rows if m)
    assert out["n_logged"] == n and out["n_matched"] == 3
    assert out["ips_value"] == round(wsum_r / 2520.0 / n, 6)
    assert out["snips_value"] == round(wsum_r / wsum, 6)
    assert out["ess"] == round(wsum * wsum / w2sum, 6)
    # ESS is at most the matched count, reached only for equal weights
    assert out["ess"] <= out["n_matched"]


def test_offpolicy_eval_no_matches_yields_nulls(spark):
    df = spark.createDataFrame(
        [(1, 0, 2.0)], "event_id long, m int, value double"
    )
    out = offpolicy_eval(
        df, match_col=F.col("m"), reward_col="value", id_col="event_id"
    ).collect()[0]
    assert out["n_matched"] == 0
    assert out["ips_value"] == 0.0
    assert out["snips_value"] is None and out["ess"] is None


def test_local_clustering_triangle_plus_tail(spark):
    # triangle 0-1-2 plus pendant 3 hanging off node 0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3)], "src long, dst long"
    )
    out = {r["node"]: r for r in local_clustering(edges).collect()}
    # node 0: deg 3, 1 closed wedge of 3 -> lcc = 2*1/(3*2) = 1/3
    assert out[0]["degree"] == 3 and out[0]["triangles"] == 1
    assert out[0]["lcc"] == round(1 / 3, 6)
    # nodes 1, 2: deg 2, their single wedge closes -> lcc 1.0
    assert out[1]["lcc"] == 1.0 and out[2]["lcc"] == 1.0
    # pendant: deg 1 -> lcc 0, zero triangles
    assert out[3]["lcc"] == 0.0 and out[3]["triangles"] == 0


def test_local_clustering_clique_is_all_ones(spark):
    nodes = range(4)
    edges = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a < b],
        "src long, dst long",
    )
    out = local_clustering(edges).collect()
    assert all(r["lcc"] == 1.0 for r in out)
    assert all(r["triangles"] == 3 for r in out)  # C(3,2) wedges all closed


def test_local_clustering_hub_guard_censors(spark):
    # star center degree 5 > cap 4 -> censored; leaves keep real zeros
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    out = {
        r["node"]: r
        for r in local_clustering(edges, max_degree=4).collect()
    }
    assert out[0]["degree"] == 5
    assert out[0]["triangles"] is None and out[0]["lcc"] is None
    assert out[1]["lcc"] == 0.0 and out[1]["triangles"] == 0
