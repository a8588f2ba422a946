"""Geospatial radius join via grid-cell blocking.

The scalable shape for "find all (left, right) point pairs within R
km": block both sides onto an equirectangular lat/lon grid, equi-join
on the cell key, verify candidates with the exact haversine distance.
The probe side emits every cell its R-km circle's bounding box touches
(a bounded, per-row-computed set — wider near the poles where
longitude degrees shrink), the build side emits exactly one cell, so
candidate generation is one shuffle on small int-pair keys and NEVER
all-pairs. This is the same blocking idea as LSH banding applied to
geometry; production systems (e.g. GeoSpark/Sedona, Uber's H3
pipelines) use hexagonal or quad-tree cells, but the join topology —
cell equi-join then exact verify over candidates only — is identical.

No counterpart in the reference engine (SURVEY.md §2.2 — no joins
beyond the single left-equi merge).

Scale notes
-----------
- Cell size defaults to the radius in latitude degrees (snapped so an
  integer number of cells tiles 360° of longitude — cx wraps cleanly
  across the antimeridian): the bounding box touches <= 3 rows of
  cells in y and a per-latitude bounded count in x; circles touching
  the polar caps (|lat| >= 85°) cover all n_lon cells of their rows —
  still a bounded constant, never data-dependent.
- The verify is a pure-Column trig projection over candidates — no
  UDF, fully codegen'd.
- Skewed geography (everyone in one city) concentrates one cell key;
  shrink ``cell_deg`` to re-spread, or salt the hot cell like any hot
  aggregation key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG_LAT = 111.045


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine). Operation order is
    fixed so cross-engine oracles can reproduce the doubles bit-for-bit
    before rounding."""
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlmb / 2)
        * F.sin(dlmb / 2)
    )
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_lat: str = "lat",
    left_lon: str = "lon",
    right_lat: str = "lat",
    right_lon: str = "lon",
    cell_deg: float | None = None,
    dist_col: str = "dist_km",
    ndigits: int = 6,
) -> DataFrame:
    """All (left row, right row) pairs within ``radius_km``.

    ``left`` is the build side (one cell per row); ``right`` is the
    probe side (explodes its circle's bounding-box cells). Column names
    must be disjoint between the two frames (alias beforehand). The
    returned frame carries all columns of both plus ``dist_col``
    (rounded to ``ndigits``); the pair qualifies when the ROUNDED
    distance is <= radius, which keeps the boundary decision identical
    across engines.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, got overlap {overlap}")

    r_lat_deg = radius_km / KM_PER_DEG_LAT
    req = cell_deg if cell_deg is not None else r_lat_deg
    # snap the cell so an INTEGER number of lon cells tiles 360° — the
    # grid is then uniform modulo the antimeridian and wrapped cx
    # indices line up exactly (snapping only grows the cell, which
    # affects efficiency, never candidate completeness)
    n_lon = max(1, int(360.0 // req))
    cell = 360.0 / n_lon

    def _wrap(cx: Column) -> Column:
        return ((cx % n_lon) + n_lon) % n_lon

    l_cell = F.struct(
        _wrap(F.floor(F.col(left_lon) / cell).cast("long")).alias("cx"),
        F.floor(F.col(left_lat) / cell).cast("long").alias("cy"),
    )
    lhs = left.withColumn("__cell", l_cell)

    lat_lo = F.col(right_lat) - F.lit(r_lat_deg)
    lat_hi = F.col(right_lat) + F.lit(r_lat_deg)
    # longitude degrees shrink with latitude: size the lon reach at the
    # worst (most poleward) latitude the circle touches. Above 85° the
    # cosine correction explodes, so circles touching the polar caps
    # simply cover EVERY lon cell of their lat rows (n_lon cells,
    # a bounded constant) instead of under-covering via a clamp.
    worst_abs = F.greatest(F.abs(lat_lo), F.abs(lat_hi))
    r_lon_deg = F.when(worst_abs >= 85.0, F.lit(180.0)).otherwise(
        F.least(
            F.lit(radius_km)
            / (F.lit(KM_PER_DEG_LAT) * F.cos(F.radians(worst_abs))),
            F.lit(180.0),
        )
    )
    cells = F.array_distinct(
        F.flatten(
            F.transform(
                F.sequence(
                    F.floor(lat_lo / cell).cast("long"),
                    F.floor(lat_hi / cell).cast("long"),
                ),
                lambda cy: F.transform(
                    F.sequence(
                        F.floor((F.col(right_lon) - r_lon_deg) / cell).cast(
                            "long"
                        ),
                        F.floor((F.col(right_lon) + r_lon_deg) / cell).cast(
                            "long"
                        ),
                    ),
                    lambda cx: F.struct(_wrap(cx).alias("cx"), cy.alias("cy")),
                ),
            )
        )
    )
    rhs = right.withColumn("__cell", F.explode(cells))

    dist = F.round(
        haversine_km(
            F.col(left_lat), F.col(left_lon), F.col(right_lat), F.col(right_lon)
        ),
        ndigits,
    )
    return (
        lhs.join(rhs, "__cell")
        .withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= radius_km)
        .drop("__cell")
    )
