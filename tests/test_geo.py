"""Geo column-expression unit tests (SURVEY.md §2.b B5/B8, §2.c)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from changesetmd_spark.functions import geo


def test_phash_geotag_deterministic_and_in_range(spark):
    df = (
        spark.range(1000)
        .withColumn("phash", F.col("id") * 9222222222222 + 7)
        .select(
            geo.phash_to_lat(F.col("phash")).alias("lat"),
            geo.phash_to_lon(F.col("phash")).alias("lon"),
        )
    )
    rows = df.collect()
    assert all(-95.0 <= r.lat < 95.0 for r in rows)
    assert all(-180.0 <= r.lon < 180.0 for r in rows)
    # deterministic: same expr twice → identical
    rows2 = df.collect()
    assert rows == rows2


def test_clamp_and_wrap(spark):
    df = spark.createDataFrame(
        [(-93.0, 185.0), (91.0, -181.0), (45.0, 45.0)], "lat double, lon double"
    ).select(
        geo.clamp_lat(F.col("lat")).alias("lat"),
        geo.wrap_lon(F.col("lon")).alias("lon"),
    )
    got = [(r.lat, r.lon) for r in df.collect()]
    assert got[0] == (-90.0, -175.0)
    assert got[1] == (90.0, 179.0)
    assert got[2] == (45.0, 45.0)


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) ↔ NYC (40.7128, -74.0060) ≈ 5837 km
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 40.7128, -74.0060)], "a double, b double, c double, d double"
    ).select(geo.haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km"))
    km = df.collect()[0].km
    assert abs(km - 5837.0) < 10.0


def test_bbox_area_sphere_total(spark):
    # whole sphere = 4πR² ≈ 5.10065e8 km²
    df = spark.createDataFrame([(-90.0, 90.0, -180.0, 180.0)], "a double,b double,c double,d double").select(
        geo.bbox_area_km2(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("area")
    )
    area = df.collect()[0].area
    assert abs(area - 4 * math.pi * geo.EARTH_RADIUS_KM**2) < 1.0


def test_tiles_known_values(spark):
    # lon=0, lat=0 at zoom 1 → tile (1, 1); lat>85 clamps to row 0
    df = spark.createDataFrame([(0.01, 0.01), (89.0, -179.0)], "lat double, lon double").select(
        geo.tile_x(F.col("lon"), 1).alias("x"), geo.tile_y(F.col("lat"), 1).alias("y")
    )
    got = [(r.x, r.y) for r in df.collect()]
    assert got[0] == (1, 0)
    assert got[1] == (0, 0)


def test_box_predicates(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 1.0, 2.0, 0.0, 3.0, 0.0, 3.0)],
        "a double,b double,c double,d double,e double,f double,g double,h double",
    )
    r = df.select(
        geo.box_covered_by(
            F.col("a"), F.col("b"), F.col("c"), F.col("d"),
            F.col("e"), F.col("f"), F.col("g"), F.col("h"),
        ).alias("cov"),
        geo.boxes_overlap(
            F.col("a"), F.col("b"), F.col("c"), F.col("d"),
            F.col("e"), F.col("f"), F.col("g"), F.col("h"),
        ).alias("ov"),
    ).collect()[0]
    assert r.cov and r.ov
