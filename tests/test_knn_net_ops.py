"""Tests for round-7 batch-12 operators: knn_classify,
group_quartiles, daily_anomalies, IPv4 functions."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.functions.net import (
    cidr_bounds,
    ip_in_cidr,
    ipv4_to_long,
    long_to_ipv4,
)
from etl_orders_to_bq_spark.operators.ann import knn_classify
from etl_orders_to_bq_spark.operators.quality import group_quartiles
from etl_orders_to_bq_spark.operators.timeseries import daily_anomalies


def test_knn_classify_separable_clusters(spark):
    # two tight clusters on orthogonal axes: every probe must take
    # its own cluster's label
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.0, 0.01 * i], "a"))
        rows.append((100 + i, [0.0, 1.0, 0.01 * i], "b"))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>, label string")
    probes = df.filter(F.col("vec_id").isin([0, 100]))
    out = {r["probe_id"]: r for r in knn_classify(df, probes, k=5).collect()}
    assert out[0]["predicted_label"] == "a" and out[0]["is_correct"] is True
    assert out[100]["predicted_label"] == "b"
    assert out[0]["votes"] == 5


def test_knn_classify_excludes_self(spark):
    # probe's own row must not vote: 1 'a' probe among 3 'b's -> 'b'
    rows = [(0, [1.0, 0.0], "a"), (1, [0.9, 0.1], "b"),
            (2, [0.8, 0.2], "b"), (3, [0.7, 0.3], "b")]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>, label string")
    probes = df.filter("vec_id = 0")
    r = knn_classify(df, probes, k=3).collect()[0]
    assert r["predicted_label"] == "b" and r["is_correct"] is False


def test_group_quartiles_type1_semantics(spark):
    # 1..8 in one group: ceil(.25*8)=2, ceil(.5*8)=4, ceil(.75*8)=6
    rows = [("g", float(v)) for v in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = group_quartiles(df, "g", "v").collect()[0]
    assert (r["p25"], r["p50"], r["p75"]) == (2.0, 4.0, 6.0)
    assert r["n"] == 8


def test_daily_anomalies_flags_spike(spark):
    rows = [(f"2024-01-{d:02d} 00:00:00", 100.0 + (d % 3)) for d in range(1, 20)]
    rows.append(("2024-01-20 00:00:00", 1000.0))  # the spike
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), "v"
    )
    out = {str(r["day"]): r for r in
           daily_anomalies(df, "ts", "v", k=3.0).collect()}
    assert out["2024-01-20"]["is_anomaly"] is True
    normal = [r for d, r in out.items() if d != "2024-01-20"]
    assert all(r["is_anomaly"] is False for r in normal)


def test_daily_anomalies_degenerate_mad_is_null(spark):
    rows = [(f"2024-01-{d:02d} 00:00:00", 5.0) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.to_timestamp("ts").alias("ts"), "v"
    )
    for r in daily_anomalies(df, "ts", "v").collect():
        assert r["mad"] == 0.0 and r["is_anomaly"] is None


def test_ipv4_roundtrip_and_cidr(spark):
    import socket
    import struct

    ips = ["0.0.0.0", "10.64.0.0", "10.127.255.255", "10.128.0.0",
           "192.168.1.1", "255.255.255.255"]
    df = spark.createDataFrame([(i,) for i in ips], "ip string")
    out = {
        r["ip"]: r
        for r in df.select(
            "ip",
            ipv4_to_long("ip").alias("n"),
            long_to_ipv4(ipv4_to_long("ip")).alias("rt"),
            ip_in_cidr("ip", "10.64.0.0/10").alias("inb"),
        ).collect()
    }
    for ip in ips:
        assert out[ip]["n"] == struct.unpack("!I", socket.inet_aton(ip))[0]
        assert out[ip]["rt"] == ip
    assert out["10.64.0.0"]["inb"] is True
    assert out["10.127.255.255"]["inb"] is True
    assert out["10.128.0.0"]["inb"] is False
    assert out["192.168.1.1"]["inb"] is False


def test_ipv4_malformed_is_null(spark):
    bad = ["bad.ip", "1.2.3", "1.2.3.4.5", "1.2.3.999", "a.b.c.d", ""]
    df = spark.createDataFrame([(i,) for i in bad], "ip string")
    for r in df.select(ipv4_to_long("ip").alias("n"),
                       ip_in_cidr("ip", "10.0.0.0/8").alias("b")).collect():
        assert r["n"] is None and r["b"] is None


def test_cidr_bounds():
    import socket
    import struct

    lo, hi = cidr_bounds("10.64.0.0/10")
    assert lo == struct.unpack("!I", socket.inet_aton("10.64.0.0"))[0]
    assert hi == lo + (1 << 22) - 1  # /10 leaves 22 host bits
    assert cidr_bounds("0.0.0.0/0") == (0, 4294967295)
    assert cidr_bounds("1.2.3.4/32") == (16909060, 16909060)


def test_cidr_bounds_malformed_messages():
    import pytest

    for bad, kind in [("a.b.c.d/8", "base"), ("1.2.3/8", "base"),
                      ("10.0.0.0/", "mask"), ("10.0.0.0/xx", "mask"),
                      ("10.0.0.0/33", "mask")]:
        with pytest.raises(ValueError, match=f"bad CIDR {kind}"):
            cidr_bounds(bad)
