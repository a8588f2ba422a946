"""Grid-cell-blocked spatial radius join."""

import math

import pytest
from pyspark.sql import functions as F

from etl_orders_to_bq_spark.operators.geo import (
    EARTH_RADIUS_KM,
    grid_radius_join,
    haversine_km,
)


def _hav(lat1, lon1, lat2, lon2):
    dphi = math.radians(lat2 - lat1)
    dlmb = math.radians(lon2 - lon1)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlmb / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def test_grid_radius_join_complete_vs_bruteforce(spark):
    """Blocking must lose NOTHING: every pair brute force finds within
    the radius must come out of the cell equi-join, including pairs
    straddling cell boundaries and at high latitude where longitude
    degrees shrink."""
    lpts = [
        (i, 55.0 + (i * 37 % 100) / 10.0, -5.0 + (i * 53 % 300) / 10.0)
        for i in range(80)
    ]
    rpts = [
        (j, 55.0 + (j * 71 % 100) / 10.0, -5.0 + (j * 29 % 300) / 10.0)
        for j in range(60)
    ]
    left = spark.createDataFrame(lpts, "lid long, llat double, llon double")
    right = spark.createDataFrame(rpts, "rid long, rlat double, rlon double")

    got = {
        (r["lid"], r["rid"])
        for r in grid_radius_join(
            left, right, 150.0, "llat", "llon", "rlat", "rlon"
        ).collect()
    }
    expect = {
        (i, j)
        for (i, la, lo) in lpts
        for (j, ra, ro) in rpts
        if round(_hav(la, lo, ra, ro), 6) <= 150.0
    }
    assert got == expect
    assert expect, "fixture must contain in-radius pairs"


def test_grid_radius_join_antimeridian_and_polar(spark):
    """Pairs straddling the ±180° seam must match (wrapped cx), and
    pairs near the pole must not be lost to the lon-reach cutoff."""
    lpts = [
        (1, 0.0, 179.9),    # west of the seam
        (2, 0.0, -179.95),
        (3, 87.0, 10.0),    # polar
        (4, 86.5, -170.0),
        (5, 0.0, 0.0),      # control, far from everything else
    ]
    rpts = [
        (11, 0.0, -179.9),  # 22 km from lid 1 across the seam
        (12, 87.2, 150.0),  # near the pole: lon gap is huge in degrees,
                            # small in km
        (13, 0.1, 0.1),
    ]
    left = spark.createDataFrame(lpts, "lid long, llat double, llon double")
    right = spark.createDataFrame(rpts, "rid long, rlat double, rlon double")
    got = {
        (r["lid"], r["rid"])
        for r in grid_radius_join(
            left, right, 400.0, "llat", "llon", "rlat", "rlon"
        ).collect()
    }
    expect = {
        (i, j)
        for (i, la, lo) in lpts
        for (j, ra, ro) in rpts
        if round(_hav(la, lo, ra, ro), 6) <= 400.0
    }
    assert got == expect
    assert (1, 11) in expect and (2, 11) in expect  # seam pairs exist
    assert any(i in (3, 4) for i, _ in expect)      # polar pair exists


def test_grid_radius_join_rejects_column_overlap(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lat double, lon double")
    with pytest.raises(ValueError, match="disjoint"):
        grid_radius_join(df, df, 10.0)


def test_haversine_known_distance(spark):
    # London (51.5074, -0.1278) -> Paris (48.8566, 2.3522) ~= 343.5 km
    row = (
        spark.range(1)
        .select(
            haversine_km(
                F.lit(51.5074), F.lit(-0.1278), F.lit(48.8566), F.lit(2.3522)
            ).alias("d")
        )
        .first()
    )
    assert abs(row["d"] - 343.5) < 1.0
