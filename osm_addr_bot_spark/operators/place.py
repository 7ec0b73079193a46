"""J2 + J3 — place containment / proximity stages.

J2 (`place_not_in_area_stage`) internalizes the reference's
``query_place_not_in_area`` (overpass.py:112-127 compile, 276-307 exec):
a BAD_CITY_WITH_PLACE issue is EXONERATED when either

  arm A: it lies inside a non-admin polygon whose ``name`` equals its
         ``addr:place`` exactly (``area.i[!admin_level][name=...]``;
         alt_name does NOT count here), or
  arm B: any place node named exactly ``addr:place`` lies within 10 km
         (``nwr[place][name=...](around.a:10000)`` — no admin
         restriction on this arm).

Survivors (no hit on either arm) stay flagged — a left-anti join.
Large elements are excluded from the stage (reference @skip_large).

J3 (`place_mistype_stage`) internalizes ``query_place_mistype``
(overpass.py:130-140, 309-345): collect name+alt_name of every
*enclosing* non-admin named polygon; the issue is flagged iff the exact
``addr:place`` is absent from that set AND its normalized form equals
some normalized member (quirk Q3: exact-miss + normalized-hit). No
skip_large on this stage (reference has only @batch).

Geometry note: the reference tests way/relation containment via member
nodes (``node(w); is_in`` — overpass.py:117,133); this engine uses the
element's representative point. Fixtures place geometries so both
interpretations agree (FIXTURES.md §4).

Physical plan: polygons explode covering hex cells once (res 7 —
town-sized polygons); issues probe with their own cell. Arm A joins on
(cell, name) so only same-named pairs survive the shuffle; arm B joins
place nodes on (cell, name) at res 5 (10 km cover = 7 cells). Exact
PIP / distance refine are native exprs after the equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_addr_bot_spark.config import PLACE_PROXIMITY_M
from osm_addr_bot_spark.checks.selectors import normalize_expr
from osm_addr_bot_spark.geo import haversine_m
from osm_addr_bot_spark.geo.hexgrid import cell_expr, pick_res, with_cover
from osm_addr_bot_spark.geo.pip import point_in_ring, polygons_with_cells
from osm_addr_bot_spark.operators.duplicates import skip_large_expr

_PIP_RES = 7
_ISSUE_KEY = ["category", "check_id", "changeset_id", "uid"]


def _pip_hits(issues: DataFrame, polygons: DataFrame, name_equi: bool) -> DataFrame:
    """(issue key cols + polygon name/alt_name) for issues inside a
    non-admin polygon. ``name_equi`` additionally equi-joins on
    name == addr:place (arm A of J2)."""
    polys = polygons.filter(F.col("admin_level").isNull())
    poly_cells = polygons_with_cells(polys, _PIP_RES)

    probe = issues.withColumn("_cell", cell_expr(F.col("lat"), F.col("lon"), _PIP_RES))
    if name_equi:
        probe = probe.withColumn("_name", F.element_at(F.col("tags"), F.lit("addr:place")))
        cond = ["_cell", "_name"]
        poly_cells = poly_cells.withColumn("_name", F.col("name"))
    else:
        cond = ["_cell"]

    pairs = probe.join(
        poly_cells.select(*cond, "polygon_id", "name", "alt_name", "ring"), cond
    )
    return pairs.filter(point_in_ring(F.col("lat"), F.col("lon"), F.col("ring")))


def place_not_in_area_stage(
    issues: DataFrame,
    polygons: DataFrame,
    place_nodes: DataFrame,
    radius_m: float = PLACE_PROXIMITY_M,
) -> DataFrame:
    """J2: keep only issues with no containment (arm A) nor proximity
    (arm B) hit."""
    iss = issues.filter(skip_large_expr())

    hit_a = _pip_hits(iss, polygons, name_equi=True).select(*_ISSUE_KEY)

    res = pick_res(radius_m)
    probe = with_cover(
        iss.withColumn("_name", F.element_at(F.col("tags"), F.lit("addr:place"))), radius_m, res
    )
    nodes = place_nodes.select(
        cell_expr(F.col("lat"), F.col("lon"), res).alias("_cell"),
        F.col("name").alias("_name"),
        F.col("lat").alias("p_lat"),
        F.col("lon").alias("p_lon"),
    )
    hit_b = (
        probe.join(nodes, ["_cell", "_name"])
        .filter(
            haversine_m(F.col("lat"), F.col("lon"), F.col("p_lat"), F.col("p_lon"))
            <= F.lit(float(radius_m))
        )
        .select(*_ISSUE_KEY)
    )

    # anti join tolerates duplicate keys on the build side — no distinct
    hits = hit_a.unionByName(hit_b)
    return iss.join(hits, _ISSUE_KEY, "left_anti")


def place_mistype_stage(issues: DataFrame, polygons: DataFrame) -> DataFrame:
    """J3: flag issues whose addr:place mismatches every enclosing name
    exactly but matches one after normalization."""
    pairs = _pip_hits(issues, polygons.filter(F.col("name").isNotNull()), name_equi=False)

    names = (
        pairs.withColumn("_n", F.explode(F.array(F.col("name"), F.col("alt_name"))))
        .filter(F.col("_n").isNotNull())
        .groupBy(*_ISSUE_KEY)
        .agg(F.collect_set("_n").alias("_names"))
    )

    place = F.element_at(F.col("tags"), F.lit("addr:place"))
    flagged_keys = (
        issues.select(*_ISSUE_KEY, F.col("tags"))
        .join(names, _ISSUE_KEY)
        .filter(
            ~F.array_contains(F.col("_names"), place)
            & F.exists(
                F.col("_names"), lambda n: normalize_expr(n) == normalize_expr(place)
            )
        )
        .select(*_ISSUE_KEY)
    )
    return issues.join(flagged_keys, _ISSUE_KEY, "left_semi")
