"""Spherical geometry as Spark SQL column expressions.

Reference: include/gunrock/algorithms/geo.hxx:30-36,71-123 —
radians/degrees/haversine/midpoint used by the geolocation app. All
built from pyspark.sql.functions primitives (radians, sin, cos,
atan2, sqrt) so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (geo.hxx:71-90 analogue)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = F.sin(dp / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) ** 2
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def spherical_midpoint(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> tuple[Column, Column]:
    """Midpoint along the great circle (geo.hxx:92-123 analogue);
    returns (lat, lon) in degrees."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    l1 = F.radians(lon1)
    dl = F.radians(lon2 - lon1)
    bx = F.cos(p2) * F.cos(dl)
    by = F.cos(p2) * F.sin(dl)
    lat = F.atan2(F.sin(p1) + F.sin(p2), F.sqrt((F.cos(p1) + bx) ** 2 + by**2))
    lon = l1 + F.atan2(by, F.cos(p1) + bx)
    return F.degrees(lat), F.degrees(lon)
