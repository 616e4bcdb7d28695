"""Geo expression library (reference locUtils.js / pathCreator.js).

All pure Column expressions — trig runs JVM-side inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def parse_geo_loc(geo: Column) -> tuple[Column, Column]:
    """Split a ``"lat,lon"`` string into typed (lat, lon) doubles
    (reference locUtils.js:25-30, functions.js:125-127)."""
    parts = F.split(geo, ",")
    return parts[0].cast("double"), parts[1].cast("double")


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, R=6371 (reference locUtils.js:2-16)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    c = 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))
    return F.lit(EARTH_RADIUS_KM) * c


def trip_days(dist_km: Column) -> Column:
    """Trip length in days: ``max(1, floor(km/100))``
    (reference locUtils.js:18-22)."""
    return F.greatest(F.lit(1).cast("long"), F.floor(dist_km / 100))


def wrap_lon_diff(lon1: Column, lon2: Column) -> Column:
    """Shortest longitude difference with ±180 wrap-around
    (reference pathCreator.js:178-199)."""
    d = lon2 - lon1
    return F.when(d > 180, d - 360).when(d < -180, d + 360).otherwise(d)
