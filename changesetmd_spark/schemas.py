"""Explicit schemas — no inference anywhere (SURVEY.md §1.3).

Mirrors the reference DDL (queries.py:6-33) with the nullability rules
from README.md:206 ("all fields except for id and created_at can be
null"; comment columns NOT NULL), plus the target image table from
BASELINE.json input_hint.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# BASELINE.json input_hint, exact shape:
# images(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
#        caption:string, phash:int64)
IMAGES = StructType(
    [
        StructField("image_id", StringType(), nullable=False),
        StructField("bytes", BinaryType(), nullable=False),
        StructField("w", IntegerType(), nullable=False),
        StructField("h", IntegerType(), nullable=False),
        StructField("fmt", StringType(), nullable=False),
        StructField("caption", StringType(), nullable=False),
        StructField("phash", LongType(), nullable=False),
    ]
)

# osm_changeset (reference queries.py:7-20) — bbox as doubles (the
# engine's geometry math is double; DecimalType(10,7) ingest precision
# is preserved because all fixture coords have ≤7 decimals).
CHANGESETS = StructType(
    [
        StructField("id", LongType(), nullable=False),
        StructField("user_id", LongType(), nullable=True),
        StructField("created_at", TimestampType(), nullable=False),
        StructField("closed_at", TimestampType(), nullable=True),
        StructField("open", BooleanType(), nullable=True),
        StructField("num_changes", IntegerType(), nullable=True),
        StructField("user_name", StringType(), nullable=True),
        StructField("min_lat", DoubleType(), nullable=True),
        StructField("max_lat", DoubleType(), nullable=True),
        StructField("min_lon", DoubleType(), nullable=True),
        StructField("max_lon", DoubleType(), nullable=True),
        StructField("tags", MapType(StringType(), StringType()), nullable=True),
    ]
)

# osm_changeset_comment (queries.py:21-27) — all NOT NULL.
COMMENTS = StructType(
    [
        StructField("comment_changeset_id", LongType(), nullable=False),
        StructField("comment_user_id", LongType(), nullable=False),
        StructField("comment_user_name", StringType(), nullable=False),
        StructField("comment_date", TimestampType(), nullable=False),
        StructField("comment_text", StringType(), nullable=False),
    ]
)

# osm_changeset_state (queries.py:28-32), init (-1, null, 0)
# (queries.py:35) — the replication watermark/checkpoint row.
STATE = StructType(
    [
        StructField("last_sequence", LongType(), nullable=False),
        StructField("last_timestamp", TimestampType(), nullable=True),
        StructField("update_in_progress", ShortType(), nullable=False),
    ]
)

# Derived geo columns the engine attaches to images (SURVEY.md §1.2 geom
# row): lat/lon doubles + cell-index longs replace the PostGIS geometry
# column + GiST index.
GEOTAGGED_EXTRAS = StructType(
    [
        StructField("lat", DoubleType(), nullable=False),
        StructField("lon", DoubleType(), nullable=False),
        StructField("hex_cell", LongType(), nullable=False),
        StructField("s2_cell", LongType(), nullable=False),
    ]
)

# Per-micro-batch metrics row (reference progress reporting,
# changesetmd.py:97-114, re-expressed as a metrics *table* per
# north_rule).
METRICS = StructType(
    [
        StructField("batch_id", LongType(), nullable=False),
        StructField("snapshot_id", LongType(), nullable=False),
        StructField("partition_id", IntegerType(), nullable=False),
        StructField("rows", LongType(), nullable=False),
        StructField("bytes", LongType(), nullable=False),
        StructField("wall_ms", LongType(), nullable=False),
        StructField("rows_per_s", DoubleType(), nullable=False),
    ]
)

EMBEDDING = ArrayType(DoubleType())
