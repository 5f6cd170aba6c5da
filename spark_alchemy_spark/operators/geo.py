"""Geospatial primitives: grid-cell bucketed radius joins.

Spark core ships no spatial operators; the scalable shape for "all
pairs of points within r km" is the 2-D analogue of the banded range
join used in operators/temporal.py — bucket points into grid cells
sized >= the radius, generate candidates from the 3x3 neighbor cells,
verify with the exact haversine distance.  Candidate volume is
points x 9 x cell occupancy, never the n^2 cross join, and the cell
key join is an ordinary shuffle-hash/sort-merge join Catalyst can
plan, prune, and AQE-skew-split like any other.

Latitude degrees are a constant ~111.32 km, but LONGITUDE degrees
shrink with cos(latitude) — a cell grid sized only in degrees silently
breaks the 3x3 cover away from the equator.  ``radius_join`` therefore
takes independent lat/lon cell sizes; callers spanning wide latitude
ranges should band by latitude and pick the lon cell per band (or
conservatively for the highest latitude in range).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
KM_PER_DEG_LAT = 111.32


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km (double math, codegen'd built-ins)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def radius_join(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    cell_lat_deg: float | None = None,
    cell_lon_deg: float | None = None,
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) with haversine distance <
    ``radius_km``, via grid-cell candidate generation.

    Cell sizes default to the smallest degree width that still covers
    ``radius_km`` at ``max_abs_lat`` (the highest latitude the data
    reaches): lat cells at radius/111.32 deg, lon cells widened by
    1/cos(max_abs_lat).  An undersized lon cell at high latitude would
    drop true pairs — callers with polar data must band by latitude
    instead (cos -> 0).

    Returns (id_a, id_b, dist_km).
    """
    import math

    if not (0 <= max_abs_lat < 90):
        raise ValueError("max_abs_lat must be in [0, 90)")
    if cell_lat_deg is None:
        cell_lat_deg = radius_km / KM_PER_DEG_LAT
    if cell_lon_deg is None:
        cell_lon_deg = radius_km / (
            KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat))
        )

    spark = points.sparkSession
    pts = points.select(
        F.col(id_col).alias("__id"),
        F.col(lat_col).cast("double").alias("__lat"),
        F.col(lon_col).cast("double").alias("__lon"),
    )
    with_cell = pts.withColumn(
        "cx", F.floor(F.col("__lon") / F.lit(cell_lon_deg)).cast("long")
    ).withColumn("cy", F.floor(F.col("__lat") / F.lit(cell_lat_deg)).cast("long"))
    offsets = (
        spark.range(9)
        .select(
            (F.col("id") % 3 - 1).alias("dx"),
            ((F.col("id") / 3).cast("long") - 1).alias("dy"),
        )
    )
    probe = with_cell.crossJoin(F.broadcast(offsets)).select(
        F.col("__id").alias("id_a"),
        F.col("__lat").alias("lat_a"),
        F.col("__lon").alias("lon_a"),
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    cand = probe.join(
        with_cell.select(
            F.col("__id").alias("id_b"),
            F.col("__lat").alias("lat_b"),
            F.col("__lon").alias("lon_b"),
            "cx",
            "cy",
        ),
        ["cx", "cy"],
    ).filter(F.col("id_a") < F.col("id_b"))
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        cand.withColumn("dist_km", dist)
        .filter(F.col("dist_km") < radius_km)
        .select("id_a", "id_b", "dist_km")
    )
