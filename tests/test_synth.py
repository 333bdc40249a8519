"""Synthetic-data determinism + fixture edge-case coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark import schemas, synth


def test_images_schema_and_determinism(spark):
    df = synth.images(spark, 200)
    assert df.schema == schemas.IMAGES
    a = {r.image_id: (bytes(r.bytes), r.phash, r.caption) for r in df.collect()}
    b = {r.image_id: (bytes(r.bytes), r.phash, r.caption) for r in synth.images(spark, 200).collect()}
    assert a == b
    assert len(a) == 200
    sample = a["img000000000003"]
    blob = sample[0]
    assert blob[:4] == synth.MAGIC
    assert len(blob) == 9 + 16 * 16 * 3
    # odd ids are lossy → all pixel bytes quantized to &0xFC
    assert all(px & 0x03 == 0 for px in blob[9:])


def test_images_phash_nonnegative_and_spread(spark):
    df = synth.images(spark, 500).select("phash")
    stats = df.select(
        F.min("phash").alias("mn"),
        F.max("phash").alias("mx"),
        F.countDistinct("phash").alias("d"),
    ).collect()[0]
    assert stats.mn >= 0
    assert stats.d == 500
    assert stats.mx > 2**55  # hi bits exercised


def test_changesets_edge_cases(spark):
    df = synth.changesets(spark, 1264).cache()
    assert df.count() == 1264
    assert df.filter(F.col("min_lat") > F.col("max_lat")).count() > 0  # inverted
    assert df.filter(F.col("max_lat") > 90.0).count() > 0  # out of range
    assert df.filter(F.size("tags") == 0).count() > 0  # empty tag maps
    assert df.filter(F.col("tags")["created_by"].startswith("JOSM")).count() > 0
    assert df.filter(F.col("user_id").isNull()).count() > 0
    df.unpersist()


def test_comments_hot_key(spark):
    df = synth.comments(spark, n=40)
    assert df.count() == 40
    hot = df.groupBy("comment_changeset_id").count().orderBy(F.desc("count")).first()
    assert hot["count"] >= 15  # skewed parent for salting tests
