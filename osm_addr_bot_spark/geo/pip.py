"""Point-in-polygon, Spark-native.

The exact even-odd (ray casting) test is a single native expression:
`F.aggregate` folds over the ring's edges counting crossings — it runs
inside whole-stage codegen per candidate (point, polygon) pair, no UDF
and no extra shuffle. Candidate pairs come from a hex-cell equi-join:
polygons pre-explode their covering cells (native bbox-lattice sample
+ 1-ring margin since r6; the numpy/pandas-UDF form remains for tests
and batch pre-indexing), points probe with their own cell.

This replaces the reference's remote `is_in` queries
(reference overpass.py:112-140) with a cell-prefix hash join +
native refine.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm_addr_bot_spark.geo import hexgrid as hg


def point_in_ring(lat: Column, lon: Column, ring: Column) -> Column:
    """Even-odd PIP as a native fold over ring edges.

    Convention: ring is array<struct<lat,lon>>, implicitly closed
    (last->first edge included). Points exactly on an edge are
    implementation-defined (fixtures stay off boundaries).
    """
    n = F.size(ring)
    idx = F.sequence(F.lit(1), n)  # element_at is 1-based

    def step(acc: Column, i: Column) -> Column:
        p1 = F.element_at(ring, i)
        p2 = F.element_at(ring, F.when(i == n, F.lit(1)).otherwise(i + 1))
        y1, x1 = p1["lat"], p1["lon"]
        y2, x2 = p2["lat"], p2["lon"]
        # crossing iff edge straddles the horizontal line through the
        # point and the intersection lies to the east; the division is
        # only meaningful when the straddle condition holds (y1 != y2)
        straddles = (y1 > lat) != (y2 > lat)
        x_int = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        return acc + F.when(straddles & (lon < x_int), 1).otherwise(0)

    return F.aggregate(idx, F.lit(0), step) % 2 == 1


@lru_cache(maxsize=None)
def ring_cover_udf(res: int):
    """pandas UDF: ring array -> covering hex cells at ``res``.

    Lattice-samples the ring bbox at 0.8x cell inradius then adds a
    1-ring margin — a superset of every cell whose area intersects the
    polygon (bbox superset + margin absorbs sampling gaps), which is
    all the join needs (exact PIP refines after).
    """
    edge = hg.EDGE_M[res]
    step_deg_lat = (edge * 0.8) / 111_194.9

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(ring: pd.Series) -> pd.Series:
        out = []
        for verts in ring:
            lats = np.asarray([v["lat"] for v in verts])
            lons = np.asarray([v["lon"] for v in verts])
            la0, la1 = lats.min(), lats.max()
            lo0, lo1 = lons.min(), lons.max()
            step_lon = step_deg_lat / max(np.cos(np.radians((la0 + la1) / 2)), 0.1)
            glat = np.arange(la0, la1 + step_deg_lat, step_deg_lat)
            glon = np.arange(lo0, lo1 + step_lon, step_lon)
            mlat = np.repeat(glat, len(glon))
            mlon = np.tile(glon, len(glat))
            cells = np.unique(hg.cell_of(mlat, mlon, res))
            cells = np.unique(hg.kring(cells, 1).ravel())
            out.append(cells)
        return pd.Series(out)

    return _udf


def polygons_with_cells(polygons: DataFrame, res: int) -> DataFrame:
    """Polygon dim exploded by covering cell — the build side of every
    PIP join. At scale this is computed once and reused (cacheable).

    r6: native lattice (bbox extents -> sequence explodes -> codegen'd
    cell_expr -> 1-ring margin) instead of the pandas UDF — the cover
    is a candidate SUPERSET refined by exact point_in_ring downstream,
    so any valid cover yields identical stage output, and the UDF's
    real cost was spawning Python workers inside the pipeline's first
    broadcast builds (2 serial ~1.8 s single-task stages, r6 event-log
    audit; the numpy form stays for tests/batch use). dropDuplicates
    mirrors the UDF's np.unique so overlapping k-rings don't multiply
    downstream PIP candidate pairs.
    """
    edge = hg.EDGE_M[res]
    step_lat = (edge * 0.8) / 111_194.9
    lats = F.transform(F.col("ring"), lambda v: v["lat"])
    lons = F.transform(F.col("ring"), lambda v: v["lon"])
    c = F.col
    out_cols = polygons.columns
    p = polygons.withColumns(
        {
            "_pc_la0": F.array_min(lats),
            "_pc_la1": F.array_max(lats),
            "_pc_lo0": F.array_min(lons),
            "_pc_lo1": F.array_max(lons),
        }
    ).withColumn(
        "_pc_slon",
        F.lit(step_lat)
        / F.greatest(F.cos(F.radians((c("_pc_la0") + c("_pc_la1")) / 2)), F.lit(0.1)),
    )
    p = (
        p.withColumn(
            "_pc_i",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil((c("_pc_la1") - c("_pc_la0")) / step_lat).cast("int"),
                )
            ),
        )
        .withColumn(
            "_pc_j",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil((c("_pc_lo1") - c("_pc_lo0")) / c("_pc_slon")).cast("int"),
                )
            ),
        )
        .withColumn(
            "_pc_base",
            hg.cell_expr(
                c("_pc_la0") + c("_pc_i") * step_lat,
                c("_pc_lo0") + c("_pc_j") * c("_pc_slon"),
                res,
            ),
        )
        .withColumn("_cell", F.explode(hg.kring_expr(c("_pc_base"), 1)))
    )
    # dedup key: the polygon identity column when present (polygon_id is
    # unique in the dim; keying the ring struct would be needlessly wide)
    key = ["polygon_id"] if "polygon_id" in out_cols else list(out_cols)
    return p.select(*out_cols, "_cell").dropDuplicates([*key, "_cell"])
