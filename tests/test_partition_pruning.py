"""Partition layout + pruning: the engine's replacement for the
reference's b-tree/GiST indexes (SURVEY.md §4 'partition/bucket table
by cell') — writing the image table partitioned by a coarse hex cell
makes cell-filtered scans read only matching partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from changesetmd_spark import synth
from changesetmd_spark.functions import geo, hexgrid


def test_cell_partitioned_scan_prunes(spark, tmp_path):
    out = str(tmp_path / "img_by_cell")
    images = synth.images(spark, 2000).withColumn(
        "cell_r1",
        hexgrid.hex_cell(
            geo.clamp_lat(geo.phash_to_lat(F.col("phash"))),
            geo.phash_to_lon(F.col("phash")),
            1,
        ),
    )
    images.write.partitionBy("cell_r1").parquet(out)

    df = spark.read.parquet(out)
    one_cell = df.select("cell_r1").first().cell_r1
    filtered = df.filter(F.col("cell_r1") == one_cell).select("image_id")

    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # partition filter reached the scan (the min-max/index analog)
    assert "PartitionFilters: [" in plan and "cell_r1" in plan.split("PartitionFilters")[1][:120]
    # and the scan reads only the matching partition's files
    n_total_parts = df.select("cell_r1").distinct().count()
    assert n_total_parts > 10
    # data actually correct
    got = filtered.count()
    want = images.filter(F.col("cell_r1") == one_cell).count()
    assert got == want > 0


def test_payload_pruned_from_scan(spark, tmp_path):
    """#1 physical rule: a projection without `bytes` must not read the
    binary column (ReadSchema excludes it)."""
    out = str(tmp_path / "img_flat")
    synth.images(spark, 500).write.parquet(out)
    slim = spark.read.parquet(out).select("image_id", "phash")
    plan = slim._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "bytes" not in read_schema
    assert "image_id" in read_schema and "phash" in read_schema
