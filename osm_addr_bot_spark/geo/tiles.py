"""XYZ (slippy-map) raster tile assignment — native Column expressions.

Standard Web-Mercator tiling formula; stays fully inside whole-stage
codegen (no UDF). Used for the raster↔vector overlap report
(SURVEY.md §2 'custom physical work', north rule: raster tile
assignment for media spans).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def xyz_tile_cols(lat: Column, lon: Column, zoom: int) -> tuple[Column, Column]:
    """(tile_x, tile_y) at ``zoom`` for WGS84 lat/lon, slippy-map scheme."""
    n = F.lit(float(2**zoom))
    x = F.floor(n * ((lon + 180.0) / 360.0)).cast("long")
    lat_rad = F.radians(lat)
    y = F.floor(
        n * (1.0 - (F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / F.lit(3.141592653589793))) / 2.0
    ).cast("long")
    # clamp to the valid tile range (poles / antimeridian edge cases)
    max_t = F.lit((2**zoom) - 1)
    return (
        F.greatest(F.lit(0).cast("long"), F.least(x, max_t)),
        F.greatest(F.lit(0).cast("long"), F.least(y, max_t)),
    )


def xyz_tile_ref(lat: Column, lon: Column, zoom: int) -> Column:
    """'z/x/y' string ref, matching the media_ref convention."""
    x, y = xyz_tile_cols(lat, lon, zoom)
    return F.concat_ws("/", F.lit(str(zoom)), x.cast("string"), y.cast("string"))


def xyz_tile_sql(lat: str, lon: str, zoom: int) -> str:
    """Same computation as SQL text for the DuckDB oracle."""
    n = float(2**zoom)
    x = f"greatest(0, least(cast(floor({n} * (({lon}) + 180.0) / 360.0) as bigint), {2**zoom - 1}))"
    y = (
        f"greatest(0, least(cast(floor({n} * (1.0 - (ln(tan(radians({lat}))"
        f" + 1.0 / cos(radians({lat}))) / pi())) / 2.0) as bigint), {2**zoom - 1}))"
    )
    return x, y
