"""Scalar function surface (SURVEY §2.9)."""

from essentials_spark.functions.geo_math import haversine_km, spherical_midpoint  # noqa: F401
