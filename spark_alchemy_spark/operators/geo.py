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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..localframe import local_frame

EARTH_RADIUS_KM = 6371.0
#: km per degree of latitude CONSISTENT WITH the haversine's sphere
#: (pi*R/180 = 111.195).  The popular 111.32 figure is the WGS84
#: equatorial value — on this sphere it makes default cells ~0.11%
#: smaller than the radius, which breaks the 3x3 cover guarantee for
#: pairs just inside the radius.
KM_PER_DEG_LAT = math.pi * EARTH_RADIUS_KM / 180.0


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
    reaches): lat cells at radius/(pi*R/180) deg; lon cells from the
    exact same-parallel inversion ``2*asin(sin(r/2R)/cos(max_abs_lat))``
    (the naive ``r/(111.195*cos)`` slightly UNDERSIZES lon cells — a
    great-circle arc of length r spans marginally more longitude than
    the parallel arc).  Callers with polar data must band by latitude
    instead (cos -> 0).

    Longitude cells wrap modulo the cell count, so pairs straddling the
    +/-180 antimeridian stay adjacent; latitude does not wrap (capped
    below the poles by ``max_abs_lat``).

    Returns (id_a, id_b, dist_km).
    """
    if not (0 <= max_abs_lat < 90):
        raise ValueError("max_abs_lat must be in [0, 90)")
    if cell_lat_deg is None:
        cell_lat_deg = radius_km / KM_PER_DEG_LAT
    if cell_lon_deg is None:
        half_angle = math.sin(radius_km / (2 * EARTH_RADIUS_KM)) / math.cos(
            math.radians(max_abs_lat)
        )
        if half_angle >= 1:
            raise ValueError(
                "radius_km spans all longitudes at max_abs_lat — band by "
                "latitude or pass cell_lon_deg explicitly"
            )
        cell_lon_deg = math.degrees(2 * math.asin(half_angle))
    # UNIFORM cells: floor (not ceil) so every cell — including the one
    # closing the wrap at +/-180 — is >= the required width.  ceil left
    # a final NARROW cell; a pair whose lon gap spanned that whole
    # sliver landed in cells (n-2) and 0, two apart mod n, and the
    # +/-1 neighbor probe silently missed it.
    n_lon_cells = max(1, int(math.floor(360.0 / cell_lon_deg)))
    if n_lon_cells < 4:
        # with < 4 wrapped cells the +/-1 offsets alias (the same cell
        # reached two ways would emit duplicate pairs); collapse to ONE
        # lon cell — correct (a superset of candidates), and radii this
        # coarse are latitude-band scans anyway
        n_lon_cells = 1
    cell_lon_deg = 360.0 / n_lon_cells

    spark = points.sparkSession
    # lon cells are sized for cos(max_abs_lat); a point beyond that
    # latitude would silently lose boundary pairs, so violating rows
    # RAISE at execution instead (branch used in the computation, so
    # Catalyst cannot prune it; zero extra passes)
    lat_checked = F.when(
        F.abs(F.col(lat_col).cast("double")) <= F.lit(float(max_abs_lat)),
        F.col(lat_col).cast("double"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "radius_join: |lat| %s exceeds max_abs_lat "
                + str(max_abs_lat),
                F.col(lat_col).cast("string"),
            )
        )
    )
    pts = points.select(
        F.col(id_col).alias("__id"),
        lat_checked.alias("__lat"),
        F.col(lon_col).cast("double").alias("__lon"),
    )
    # lon cells index [0, n) from -180 so adjacency wraps at the
    # antimeridian via modulo; the final (possibly narrower) cell is
    # still adjacent to cell 0, which only ever ADDS candidates
    with_cell = pts.withColumn(
        "cx",
        (
            F.floor((F.col("__lon") + 180.0) / F.lit(cell_lon_deg)).cast("long")
            % n_lon_cells
        ),
    ).withColumn("cy", F.floor(F.col("__lat") / F.lit(cell_lat_deg)).cast("long"))
    dxs = [-1, 0, 1] if n_lon_cells > 1 else [0]
    offsets = local_frame(spark, 
        [(dx, dy) for dx in dxs for dy in (-1, 0, 1)], "dx long, dy long"
    )
    probe = with_cell.crossJoin(F.broadcast(offsets)).select(
        F.col("__id").alias("id_a"),
        F.col("__lat").alias("lat_a"),
        F.col("__lon").alias("lon_a"),
        ((F.col("cx") + F.col("dx") + n_lon_cells) % n_lon_cells).alias("cx"),
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
