"""Canonical schemas for every table the engine reads or produces.

The primary input is the interleaved-documents table (BASELINE.json
``input_hint``); everything else is derived or a small dimension.
Field-by-field provenance cites /root/reference/.
"""

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Primary input (FIXTURES.md §1): one document per changeset, spans carry
# interleaved text (JSON-encoded OSM elements) and media (XYZ tile refs).
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # 'text' | 'media'
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),   # 'z/x/y' or ''
        T.StructField("offset", T.IntegerType(), False),    # 0-based in doc
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# JSON payload of a kind='text' span — mirrors OverpassEntry
# (reference overpass_entry.py:19-50); bbox degenerate for nodes
# (reference overpass.py:189-197).
ELEMENT_JSON = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("changeset_id", T.LongType(), False),
        T.StructField("element_type", T.StringType(), False),
        T.StructField("element_id", T.LongType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("minlat", T.DoubleType(), True),
        T.StructField("minlon", T.DoubleType(), True),
        T.StructField("maxlat", T.DoubleType(), True),
        T.StructField("maxlon", T.DoubleType(), True),
    ]
)

# JSON payload of a kind='media' span — anchor point for raster overlap.
MEDIA_JSON = T.StructType(
    [
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
    ]
)

# --------------------------------------------------------------------------
# World-table DDLs (datagen.py layout) so the pipeline can read with
# explicit schemas: parquet schema inference costs a footer read + JVM
# round trip PER TABLE per run (~0.9 s across the seven tables,
# measured r6) and contributes driver-serial time at any scale. Pinned
# against datagen output by tests/test_datagen_guards.py.
TABLE_DDL = {
    "documents": (
        "doc_id STRING, spans ARRAY<STRUCT<kind: STRING, text: STRING, "
        "media_ref: STRING, offset: INT>>"
    ),
    "changesets": (
        "changeset_id BIGINT, cs_uid BIGINT, open BOOLEAN, created_by STRING, "
        "discussion ARRAY<STRUCT<uid: BIGINT, text: STRING>>"
    ),
    "users": "user_uid BIGINT, display_name STRING, changesets_count BIGINT",
    "polygons": (
        "polygon_id BIGINT, name STRING, alt_name STRING, admin_level STRING, "
        "ring ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>"
    ),
    "streets": (
        "way_id BIGINT, name STRING, alt_name STRING, "
        "points ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>"
    ),
    "place_nodes": "node_id BIGINT, name STRING, lat DOUBLE, lon DOUBLE",
    "elements_history": (
        "element_type STRING, element_id BIGINT, valid_from BIGINT, "
        "valid_to BIGINT, tags MAP<STRING, STRING>"
    ),
}

# --------------------------------------------------------------------------
# Parsed elements (engine-internal, long format). uid derivation per
# reference overpass_entry.py:44-50.
ELEMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_offset", T.IntegerType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("changeset_id", T.LongType(), False),
        T.StructField("element_type", T.StringType(), False),
        T.StructField("element_id", T.LongType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("minlat", T.DoubleType(), False),
        T.StructField("minlon", T.DoubleType(), False),
        T.StructField("maxlat", T.DoubleType(), False),
        T.StructField("maxlon", T.DoubleType(), False),
        T.StructField("bb_width_m", T.DoubleType(), False),
        T.StructField("bb_height_m", T.DoubleType(), False),
        T.StructField("uid", T.LongType(), False),
        T.StructField("hex9", T.LongType(), False),    # hex cell, res 9-like
        T.StructField("s2_15", T.LongType(), False),   # S2 cell id, level 15
    ]
)

# --------------------------------------------------------------------------
# Dimensions (FIXTURES.md §2)
CHANGESETS = T.StructType(
    [
        T.StructField("changeset_id", T.LongType(), False),
        T.StructField("cs_uid", T.LongType(), False),          # author user id
        T.StructField("open", T.BooleanType(), False),
        T.StructField("created_by", T.StringType(), True),
        T.StructField(
            "discussion",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("uid", T.LongType(), False),
                        T.StructField("text", T.StringType(), False),
                    ]
                )
            ),
            True,
        ),
    ]
)

USERS = T.StructType(
    [
        T.StructField("user_uid", T.LongType(), False),
        T.StructField("display_name", T.StringType(), False),
        T.StructField("changesets_count", T.LongType(), False),
    ]
)

POLYGONS = T.StructType(
    [
        T.StructField("polygon_id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("alt_name", T.StringType(), True),
        T.StructField("admin_level", T.StringType(), True),
        T.StructField(
            "ring",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("lat", T.DoubleType(), False),
                        T.StructField("lon", T.DoubleType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

STREETS = T.StructType(
    [
        T.StructField("way_id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("alt_name", T.StringType(), True),
        T.StructField(
            "points",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("lat", T.DoubleType(), False),
                        T.StructField("lon", T.DoubleType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

PLACE_NODES = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
    ]
)

# Pre-change snapshots for the guilt check (reference overpass.py:384-421)
ELEMENTS_HISTORY = T.StructType(
    [
        T.StructField("element_type", T.StringType(), False),
        T.StructField("element_id", T.LongType(), False),
        T.StructField("valid_from", T.LongType(), False),
        T.StructField("valid_to", T.LongType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
    ]
)
