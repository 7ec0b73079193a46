"""Great-circle distance as a native Column expression.

The reference measures bbox edges with geopy's geodesic distance
(reference overpass.py:199-204). We use the haversine formula instead —
it stays inside whole-stage codegen (no Python), and differs from the
geodesic by <0.5% at the sub-10 km scales every threshold in the
reference uses (100 m / 1000 m / 3000 m / 10 km). Fixtures keep a ≥5%
margin around each threshold so the approximation never flips a result
(FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_008.8  # mean Earth radius (IUGG)


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Distance in meters between two WGS84 points, pure Spark SQL."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    # clamp guards fp noise at antipodal / identical points
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Same formula as ANSI SQL text (for DuckDB oracle parity)."""
    return (
        f"2 * {EARTH_RADIUS_M} * asin(sqrt(least(1.0,"
        f" pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))"
    )
