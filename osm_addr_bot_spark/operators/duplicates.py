"""J1 — duplicate-address radius join (100 m), the reference's
``query_duplicates`` internalized as a salted hex-cell hash join.

Reference semantics (overpass.py:101-109 compile, 223-274 exec,
duplicate_search.py:21-56 predicate):

  * issues: DUPLICATED check hits (have addr:housenumber), excluding
    large elements (bbox >= 1000 m either dim, strict '<' keeps —
    overpass.py:58-70) and non-whitelist-clean tags (overpass.py:226)
  * candidate pool: the whole element universe with addr:housenumber,
    of the OPPOSITE geometry family — node issues search ways+relations,
    way/relation issues search nodes (overpass.py:103-104: ``wr[...]``
    vs ``node[...]``)
  * match: within 100 m AND whitelist-clean AND null-safe equal on the
    five EQUAL_TAGS AND a different element (uid !=)
  * any match -> keep issue AND emit the duplicates, which inherit the
    issue's timestamp/changeset_id and a zeroed bbox (overpass.py:250-259,
    quirk Q4); no match -> drop the issue
  * set semantics on uid across the check's result (overpass.py:239,
    270-272) — here deterministic: min (changeset_id, timestamp) wins

Physical plan: candidates keep their parse-time res-9 hex cell; issues
explode cell x k-ring-1 (7 cells — proven sufficient for 100 m in
tests/test_geo.py) x a deterministic salt sequence; candidates carry
``pmod(hash(uid), k)`` salt. The (cell, salt) equi-join bounds per-task
fan-in under urban skew; AQE skew-join remains as backstop. Distance +
tag equality refine after the join, all native exprs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osm_addr_bot_spark.config import (
    DUPLICATE_RADIUS_M,
    EQUAL_TAGS,
    LARGE_ELEMENT_MAX_SIZE,
    SALT_BUCKETS,
    WHITELIST_TAGS,
)
from osm_addr_bot_spark.geo import haversine_m
from osm_addr_bot_spark.geo.hexgrid import cover_k, kring_expr


def whitelist_expr(tags: Column) -> Column:
    """Every tag key starts with a whitelisted prefix
    (reference duplicate_search.py:30-37)."""

    def _ok(k: Column) -> Column:
        acc = F.lit(False)
        for w in WHITELIST_TAGS:
            acc = acc | k.startswith(w)
        return acc

    return F.forall(F.map_keys(tags), _ok)


def equal_tags_expr(left: Column, right: Column) -> Column:
    """Null-safe equality on the five address tags
    (reference duplicate_search.py:21-27, 40-44): absent == absent."""
    acc = F.lit(True)
    for k in EQUAL_TAGS:
        acc = acc & F.element_at(left, F.lit(k)).eqNullSafe(F.element_at(right, F.lit(k)))
    return acc


def skip_large_expr() -> Column:
    """bbox strictly under 1000 m in both dims keeps
    (reference overpass.py:58-70, config.py:48)."""
    return (F.col("bb_width_m") < LARGE_ELEMENT_MAX_SIZE) & (
        F.col("bb_height_m") < LARGE_ELEMENT_MAX_SIZE
    )


def duplicates_stage(
    issues: DataFrame,
    elements: DataFrame,
    radius_m: float = DUPLICATE_RADIUS_M,
    salt_buckets: int = SALT_BUCKETS,
    hot_cell_threshold: int = 4000,
) -> DataFrame:
    """Run J1 for the DUPLICATED check's issue rows; returns the check's
    new issue set in the same long format."""
    issue_cols = issues.columns

    iss = issues.filter(skip_large_expr()).filter(whitelist_expr(F.col("tags")))

    k = cover_k(radius_m, 9)

    cand_base = elements.filter(
        F.map_contains_key(F.col("tags"), F.lit("addr:housenumber"))
    ).filter(whitelist_expr(F.col("tags")))

    # Targeted salting: only cells whose candidate count exceeds the
    # threshold are split into salt buckets (build side) and probed with
    # all salts (probe side). Cold cells — the overwhelming majority —
    # keep salt 0 and pay no replication. The hot-cell list is one cheap
    # aggregate, tiny even at 10^12 rows (bounded by #cells above the
    # threshold), broadcast into both sides. AQE skew-join stays on as
    # the backstop for skew this static rule can't see.
    hot = (
        cand_base.groupBy(F.col("hex9").alias("_cell"))
        .count()
        .filter(F.col("count") > hot_cell_threshold)
        .select("_cell", F.lit(True).alias("_hot"))
    )

    iss_probe = (
        iss.withColumn("_cell", F.explode(kring_expr(F.col("hex9"), k)))
        .join(F.broadcast(hot), "_cell", "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot"), F.sequence(F.lit(0), F.lit(salt_buckets - 1))
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("_hot")
    )

    cand = (
        cand_base.join(
            F.broadcast(hot.withColumnRenamed("_cell", "hex9")), "hex9", "left"
        )
        .select(
            F.col("hex9").alias("_cell"),
            F.when(F.col("_hot"), F.pmod(F.hash(F.col("uid")), F.lit(salt_buckets)))
            .otherwise(F.lit(0))
            .alias("_salt"),
            F.col("uid").alias("c_uid"),
            F.col("element_type").alias("c_element_type"),
            F.col("element_id").alias("c_element_id"),
            F.col("tags").alias("c_tags"),
            F.col("lat").alias("c_lat"),
            F.col("lon").alias("c_lon"),
            F.col("hex9").alias("c_hex9"),
            F.col("s2_15").alias("c_s2_15"),
            F.col("doc_id").alias("c_doc_id"),
            F.col("span_offset").alias("c_span_offset"),
        )
    )

    opposite_family = F.when(
        F.col("element_type") == "node", F.col("c_element_type") != "node"
    ).otherwise(F.col("c_element_type") == "node")

    pairs = (
        iss_probe.join(cand, ["_cell", "_salt"])
        .filter(opposite_family)
        .filter(F.col("c_uid") != F.col("uid"))
        .filter(
            haversine_m(F.col("lat"), F.col("lon"), F.col("c_lat"), F.col("c_lon"))
            <= F.lit(float(radius_m))
        )
        .filter(equal_tags_expr(F.col("tags"), F.col("c_tags")))
    )

    # issues that found >= 1 duplicate survive (left_semi dedups the
    # build side itself — no distinct shuffle needed)
    hit_keys = pairs.select("category", "check_id", "changeset_id", "uid")
    surviving = iss.join(hit_keys, ["category", "check_id", "changeset_id", "uid"], "left_semi")

    # duplicates inherit issue provenance + zeroed bbox (quirk Q4)
    dup_rows = pairs.select(
        *[c for c in issue_cols if not c.startswith("c_") and c not in (
            "uid", "element_type", "element_id", "tags", "lat", "lon",
            "minlat", "minlon", "maxlat", "maxlon", "bb_width_m", "bb_height_m",
            "hex9", "s2_15", "doc_id", "span_offset",
        )],
        F.col("c_doc_id").alias("doc_id"),
        F.col("c_span_offset").alias("span_offset"),
        F.col("c_element_type").alias("element_type"),
        F.col("c_element_id").alias("element_id"),
        F.col("c_tags").alias("tags"),
        F.col("c_lat").alias("lat"),
        F.col("c_lon").alias("lon"),
        F.lit(0.0).alias("minlat"),
        F.lit(0.0).alias("minlon"),
        F.lit(0.0).alias("maxlat"),
        F.lit(0.0).alias("maxlon"),
        F.lit(0.0).alias("bb_width_m"),
        F.lit(0.0).alias("bb_height_m"),
        F.col("c_uid").alias("uid"),
        F.col("c_hex9").alias("hex9"),
        F.col("c_s2_15").alias("s2_15"),
    ).select(*issue_cols)

    out = surviving.select(*issue_cols).withColumn("_is_dup", F.lit(0)).unionByName(
        dup_rows.withColumn("_is_dup", F.lit(1))
    )

    # set semantics on uid within the check (reference result:set): the
    # reference builds set(issues) FIRST and then .update(duplicates)
    # (overpass.py:239-272) — an element that is both a surviving issue
    # and someone else's duplicate keeps its OWN provenance (first-in
    # wins). Order issue rows before dup rows, then deterministic
    # tie-break within each class.
    w = Window.partitionBy("category", "check_id", "uid").orderBy(
        "_is_dup", "changeset_id", "timestamp", "doc_id", "span_offset"
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_dup")
    )
