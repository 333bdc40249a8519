"""Flagship spatial-join correctness vs a brute-force oracle
(SURVEY.md §5: "envelope-containment join results vs a brute-force
pandas oracle")."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from changesetmd_spark import synth
from changesetmd_spark.functions import geo
from changesetmd_spark.operators import spatial_join as sj


def _points_df(spark, n=3000, seed=11):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "point_id": np.arange(n),
            "lat": rng.uniform(-89, 89, n),
            "lon": rng.uniform(-179, 179, n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def _boxes_df(spark, n=300, seed=12):
    rng = np.random.default_rng(seed)
    clat = rng.uniform(-85, 85, n)
    clon = rng.uniform(-175, 175, n)
    dlat = rng.uniform(0.01, 4.0, n)
    dlon = rng.uniform(0.01, 4.0, n)
    pdf = pd.DataFrame(
        {
            "box_id": np.arange(n),
            "min_lat": clat - dlat,
            "max_lat": clat + dlat,
            "min_lon": clon - dlon,
            "max_lon": clon + dlon,
        }
    )
    # poison a few rows: inverted / out-of-range (the ST_MakeValid cases)
    pdf.loc[0, ["min_lat", "max_lat"]] = [50.0, 40.0]
    pdf.loc[1, "max_lat"] = 94.0
    pdf.loc[1, "min_lat"] = 88.0
    return spark.createDataFrame(pdf), pdf


def _oracle_pairs(points: pd.DataFrame, boxes: pd.DataFrame) -> set[tuple[int, int]]:
    b = boxes.copy()
    lo_lat = np.minimum(b.min_lat, b.max_lat).clip(-90, 90)
    hi_lat = np.maximum(b.min_lat, b.max_lat).clip(-90, 90)
    lo_lon = np.minimum(b.min_lon, b.max_lon)
    hi_lon = np.maximum(b.min_lon, b.max_lon)
    out = set()
    for pid, plat, plon in points[["point_id", "lat", "lon"]].itertuples(index=False):
        hit = (plat >= lo_lat) & (plat <= hi_lat) & (plon >= lo_lon) & (plon <= hi_lon)
        for bid in b.box_id[hit.to_numpy()]:
            out.add((int(pid), int(bid)))
    return out


def test_contains_join_matches_oracle_all_strategies(spark):
    points, ppdf = _points_df(spark)
    boxes, bpdf = _boxes_df(spark)
    want = _oracle_pairs(ppdf, bpdf)
    assert len(want) > 100  # non-trivial workload

    for kwargs in (
        dict(broadcast_boxes=True),
        dict(broadcast_boxes=False),
        dict(broadcast_boxes=False, salt_buckets=4, point_salt_key="point_id"),
    ):
        got = {
            (r.point_id, r.box_id)
            for r in sj.contains_join(points, boxes, res=3, **kwargs)
            .select("point_id", "box_id")
            .collect()
        }
        assert got == want, f"mismatch for {kwargs}"


def test_contains_join_res_invariance(spark):
    """Result must not depend on the index resolution (only the plan
    shape does)."""
    points, _ = _points_df(spark, n=800, seed=21)
    boxes, _ = _boxes_df(spark, n=60, seed=22)
    results = []
    for res in (2, 3, 5):
        got = {
            (r.point_id, r.box_id)
            for r in sj.contains_join(points, boxes, res=res, broadcast_boxes=True)
            .select("point_id", "box_id")
            .collect()
        }
        results.append(got)
    assert results[0] == results[1] == results[2]


def test_no_duplicate_pairs(spark):
    points, _ = _points_df(spark, n=2000, seed=31)
    boxes, _ = _boxes_df(spark, n=150, seed=32)
    out = sj.contains_join(points, boxes, res=3, broadcast_boxes=True)
    n = out.count()
    d = out.select("point_id", "box_id").distinct().count()
    assert n == d


def test_assign_images_payload_pruned_and_reattached(spark):
    images = synth.images(spark, 400)
    boxes, _ = _boxes_df(spark, n=80, seed=41)
    slim = sj.assign_images(images, boxes, res=3, broadcast_boxes=True)
    assert "bytes" not in slim.columns
    full = sj.assign_images(images, boxes, res=3, broadcast_boxes=True, keep_payload=True)
    assert "bytes" in full.columns
    assert full.count() == slim.count()
    # geotag parity: recompute lat from phash and compare
    chk = full.select(
        (F.abs(geo.clamp_lat(geo.phash_to_lat(F.col("phash"))) - F.col("lat")) < 1e-12).alias("ok")
    )
    assert chk.filter(~F.col("ok")).count() == 0


def test_broadcast_join_plan_is_shuffle_free_on_points(spark):
    """The broadcast path must not shuffle the (big) point side."""
    points, _ = _points_df(spark, n=500, seed=51)
    boxes, _ = _boxes_df(spark, n=40, seed=52)
    out = sj.contains_join(points, boxes, res=3, broadcast_boxes=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_compact_build_matches_default(spark):
    points, ppdf = _points_df(spark, n=1500, seed=61)
    boxes, bpdf = _boxes_df(spark, n=120, seed=62)
    want = {
        (r.point_id, r.box_id)
        for r in sj.contains_join(points, boxes, res=3, broadcast_boxes=True)
        .select("point_id", "box_id").collect()
    }
    got = {
        (r.point_id, r.box_id)
        for r in sj.contains_join(points, boxes, res=3, broadcast_boxes=True, compact_build=True)
        .select("point_id", "box_id").collect()
    }
    assert got == want


def test_skewed_hot_cell_salted_parity(spark):
    """Hot-cell skew (city effect): 40% of points in one 0.5-degree
    spot. The salted shuffle path must agree with broadcast exactly."""
    rng = np.random.default_rng(77)
    n = 4000
    hot = rng.random(n) < 0.4
    lat = np.where(hot, 48.85 + rng.uniform(-0.25, 0.25, n), rng.uniform(-80, 80, n))
    lon = np.where(hot, 2.35 + rng.uniform(-0.25, 0.25, n), rng.uniform(-170, 170, n))
    points = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(n), "lat": lat, "lon": lon})
    )
    boxes, _ = _boxes_df(spark, n=100, seed=78)
    ref = {
        (r.point_id, r.box_id)
        for r in sj.contains_join(points, boxes, res=3, broadcast_boxes=True)
        .select("point_id", "box_id").collect()
    }
    salted = {
        (r.point_id, r.box_id)
        for r in sj.contains_join(
            points, boxes, res=3, broadcast_boxes=False,
            salt_buckets=8, point_salt_key="point_id",
        ).select("point_id", "box_id").collect()
    }
    assert salted == ref and len(ref) > 50


def test_antimeridian_wrap_split_matches_bruteforce(spark):
    """Boxes crossing ±180° (min_lon > max_lon wrap convention):
    split_antimeridian + cover join must equal the straight wraparound
    predicate, and a wrapping box must NOT match points on the far
    side of the globe (the failure mode of naive min/max swapping)."""
    rng = np.random.default_rng(31)
    n = 4000
    pts_pdf = pd.DataFrame(
        {
            "point_id": np.arange(n),
            "lat": rng.uniform(-80, 80, n),
            "lon": rng.uniform(-180, 180, n),
        }
    )
    # boxes centered on the seam: half wrap, half don't
    m = 60
    clat = rng.uniform(-70, 70, m)
    clon = rng.uniform(170, 190, m)  # raw, pre-wrap
    slat = rng.uniform(0.5, 5, m)
    slon = rng.uniform(0.5, 8, m)
    w = lambda x: (x + 180.0) % 360.0 - 180.0  # noqa: E731
    boxes_pdf = pd.DataFrame(
        {
            "box_id": np.arange(m),
            "min_lat": clat - slat,
            "max_lat": clat + slat,
            "min_lon": w(clon - slon),
            "max_lon": w(clon + slon),
        }
    )
    assert (boxes_pdf.min_lon > boxes_pdf.max_lon).any()

    halves = sj.split_antimeridian(spark.createDataFrame(boxes_pdf))
    got_rows = [
        (r.point_id, r.box_id)
        for r in sj.contains_join(
            spark.createDataFrame(pts_pdf), halves,
            res=3, broadcast_boxes=True, normalize=False,
        ).select("point_id", "box_id").collect()
    ]
    got = set(got_rows)
    want = set()
    for b in boxes_pdf.itertuples(index=False):
        in_lat = (pts_pdf.lat >= b.min_lat) & (pts_pdf.lat <= b.max_lat)
        if b.min_lon <= b.max_lon:
            in_lon = (pts_pdf.lon >= b.min_lon) & (pts_pdf.lon <= b.max_lon)
        else:
            in_lon = (pts_pdf.lon >= b.min_lon) | (pts_pdf.lon <= b.max_lon)
        for pid in pts_pdf.point_id[(in_lat & in_lon).to_numpy()]:
            want.add((int(pid), int(b.box_id)))
    assert got == want and len(want) > 100
    # a point matches a split box at most once (halves are disjoint) —
    # checked on the raw row list, before set-dedup could mask it
    assert len(got_rows) == len(got)
