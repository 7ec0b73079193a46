"""J4 — tiered street-name proximity anti-join cascade.

Internalizes the reference's ``query_street_names``
(overpass.py:143-151 compile, 347-382 exec, tier driver 37-55):
an UNKNOWN_STREET_NAME issue is CLEARED when a named highway within the
current tier radius (500 -> 1000 -> 3000 m) carries its ``addr:street``
as ``name`` or ``alt_name`` — EXACT string match, no normalization
(quirk Q3, overpass.py:379). Issues cleared at a tier leave the
cascade; the rest escalate; whoever survives tier 3000 stays flagged.
Large elements never enter (reference @skip_large).

Physical plan per tier: street polylines pre-explode to vertices and
name variants, indexed by hex cell at the tier's resolution (built once
per resolution and reusable across runs — at 100 TB this is a static
index table). Issues explode their disk-cover cells and equi-join on
(cell, name) so the shuffle carries only same-named candidates; the
haversine refine is native. Matched = left_semi, remainder = left_anti
— the reference's tier() loop as three shrinking anti-joins (P5:
deliberate driver-side loop, no Catalyst analog).

Distance note: point-to-way distance is approximated by min distance
to the way's vertices (generator emits 100 m-spaced vertices; fixtures
keep >=5% margins, FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_addr_bot_spark.config import STREET_TIERS_M
from osm_addr_bot_spark.geo import haversine_m, hex_cell_udf, hex_cover_udf
from osm_addr_bot_spark.geo.hexgrid import pick_res
from osm_addr_bot_spark.operators.duplicates import skip_large_expr

_ISSUE_KEY = ["category", "check_id", "changeset_id", "uid"]


def street_vertex_index(streets: DataFrame, res: int) -> DataFrame:
    """(cell, name, v_lat, v_lon): one row per (vertex, name-variant)."""
    return (
        streets.select(
            "way_id",
            F.explode(F.array(F.col("name"), F.col("alt_name"))).alias("_name"),
            F.col("points"),
        )
        .filter(F.col("_name").isNotNull())
        .select("way_id", "_name", F.explode("points").alias("p"))
        .select(
            "_name",
            F.col("p.lat").alias("v_lat"),
            F.col("p.lon").alias("v_lon"),
        )
        .withColumn("_cell", hex_cell_udf(res)(F.col("v_lat"), F.col("v_lon")))
    )


def street_names_stage(
    issues: DataFrame,
    streets: DataFrame,
    tiers: tuple[int, ...] = STREET_TIERS_M,
) -> DataFrame:
    """J4: returns the issues still flagged after the full cascade."""
    remaining = issues.filter(skip_large_expr()).withColumn(
        "_street", F.element_at(F.col("tags"), F.lit("addr:street"))
    )

    for radius in tiers:
        res = pick_res(radius)
        index = street_vertex_index(streets, res)
        probe = remaining.withColumn(
            "_cell", F.explode(hex_cover_udf(float(radius), res)(F.col("lat"), F.col("lon")))
        ).withColumn("_name", F.col("_street"))
        matched = (
            probe.join(index, ["_cell", "_name"])
            .filter(
                haversine_m(F.col("lat"), F.col("lon"), F.col("v_lat"), F.col("v_lon"))
                <= F.lit(float(radius))
            )
            .select(*_ISSUE_KEY)
            .distinct()
        )
        remaining = remaining.join(matched, _ISSUE_KEY, "left_anti")
        # NOTE: the reference early-exits when a tier clears everything
        # (overpass.py:46-47); Spark's lazy plan makes the remaining
        # tiers no-ops on an empty side automatically (AQE empty-relation
        # propagation), so no driver-side count is spent here.

    return remaining.drop("_street")
