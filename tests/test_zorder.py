"""Z-order clustering (plans/zorder.py): key correctness against an
independent scalar rederivation, and the pruning payoff measured from
real parquet footers — the lake-layout analog of the reference's GiST
spatial index (queries.py:57-59)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from changesetmd_spark.plans import zorder as Z


def test_z_value_matches_scalar_rederivation(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "lat": np.concatenate([rng.uniform(-90, 90, 500), [-90.0, 90.0, 0.0]]),
            "lon": np.concatenate([rng.uniform(-180, 180, 500), [-180.0, 180.0, 0.0]]),
        }
    )
    got = (
        spark.createDataFrame(pdf)
        .select("lat", "lon", Z.z_value(F.col("lat"), F.col("lon")).alias("z"))
        .collect()
    )
    for r in got:
        assert r.z == Z.z_value_py(r.lat, r.lon), (r.lat, r.lon)


def test_z_value_preserves_locality():
    """Points inside one small box span a far narrower z-range than the
    global key space (the property file-level min/max pruning needs)."""
    rng = np.random.default_rng(11)
    lat = rng.uniform(40.0, 41.0, 1000)
    lon = rng.uniform(10.0, 11.0, 1000)
    zs = [Z.z_value_py(a, b) for a, b in zip(lat, lon)]
    assert (max(zs) - min(zs)) < (1 << 32) * 0.001


def _files_touched_by_box(path: str, lat_lo, lat_hi, lon_lo, lon_hi) -> tuple[int, int]:
    """(#files whose footer lat/lon envelope intersects the box, #files)
    — exactly the stat-based pruning decision a parquet/Iceberg scan
    makes per file."""
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    touched = 0
    for f in files:
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        lat_min = lat_max = lon_min = lon_max = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None or name not in ("lat", "lon"):
                    continue
                if name == "lat":
                    lat_min = st.min if lat_min is None else min(lat_min, st.min)
                    lat_max = st.max if lat_max is None else max(lat_max, st.max)
                else:
                    lon_min = st.min if lon_min is None else min(lon_min, st.min)
                    lon_max = st.max if lon_max is None else max(lon_max, st.max)
        if not (lat_hi < lat_min or lat_max < lat_lo or lon_hi < lon_min or lon_max < lon_lo):
            touched += 1
    return touched, len(files)


def test_zorder_layout_prunes_bbox_scans(spark, tmp_path):
    """Same rows, two layouts: round-robin (what a naive write produces)
    vs Morton-clustered. A small bbox predicate must be answerable from
    a small fraction of the clustered files while the naive layout
    forces reading (nearly) all of them."""
    rng = np.random.default_rng(3)
    n = 40_000
    pdf = pd.DataFrame(
        {
            "point_id": np.arange(n),
            "lat": rng.uniform(-90, 90, n),
            "lon": rng.uniform(-180, 180, n),
        }
    )
    df = spark.createDataFrame(pdf)
    naive = str(tmp_path / "naive")
    clustered = str(tmp_path / "clustered")
    df.repartition(16).write.parquet(naive)
    Z.cluster_by_z(df, "lat", "lon", n_partitions=16).write.parquet(clustered)

    box = (40.0, 45.0, 10.0, 15.0)  # 5°x5°
    naive_touch, naive_total = _files_touched_by_box(naive, *box)
    clus_touch, clus_total = _files_touched_by_box(clustered, *box)
    assert naive_total == clus_total == 16
    assert naive_touch >= 15  # round-robin: every file spans the globe
    assert clus_touch <= 4    # clustered: tight envelopes, >75% pruned

    # and the layouts hold identical data
    a = spark.read.parquet(naive)
    b = spark.read.parquet(clustered)
    assert a.count() == b.count() == n
    assert a.exceptAll(b).count() == 0

    # Spark-side e2e: under a pushed bbox predicate, rows come from few
    # clustered files but from (nearly) every naive file. A wider box
    # than the footer probe (10°x40°, ~500 expected rows) so every
    # naive file almost surely contributes at least one row — the
    # footer assertion above already covers the envelope property.
    pred = (
        (F.col("lat") >= 30.0) & (F.col("lat") <= 40.0)
        & (F.col("lon") >= 0.0) & (F.col("lon") <= 40.0)
    )
    n_files_naive = a.filter(pred).select(F.input_file_name()).distinct().count()
    n_files_clus = b.filter(pred).select(F.input_file_name()).distinct().count()
    assert n_files_naive == 16 and n_files_clus <= 5


def test_snapstore_create_zorder_by(spark, tmp_path):
    """SnapStore.create(zorder_by=...) lays the initial snapshot out in
    Morton order; reads are unchanged, and the snapshot's files carry
    tight envelopes."""
    from changesetmd_spark.sources.snapstore import SnapStore

    rng = np.random.default_rng(5)
    n = 20_000
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "lat": rng.uniform(-90, 90, n),
            "lon": rng.uniform(-180, 180, n),
        }
    )
    store = SnapStore(spark, str(tmp_path / "pts"), key="id")
    store.create(spark.createDataFrame(pdf).repartition(8), zorder_by=("lat", "lon"))
    assert store.read().count() == n
    snap_path = store.snapshots()[0]["path"]
    touched, total = _files_touched_by_box(snap_path, 40.0, 45.0, 10.0, 15.0)
    # few files at test parallelism (defaultParallelism range parts) —
    # still at least half of them must be prunable for a tiny box
    assert total >= 4 and touched <= total // 2
