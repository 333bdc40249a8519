"""kNN join + overlay operator tests (SURVEY.md §2.c)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from changesetmd_spark.operators import knn as K
from changesetmd_spark.operators import overlay as ov


def _pts(spark, n=4000, seed=5):
    rng = np.random.default_rng(seed)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": np.arange(n),
                "lat": rng.uniform(-80, 80, n),
                "lon": rng.uniform(-175, 175, n),
            }
        )
    )


def _queries(spark, n=25, seed=6):
    rng = np.random.default_rng(seed)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.arange(n),
                "q_lat": rng.uniform(-70, 70, n),
                "q_lon": rng.uniform(-160, 160, n),
            }
        )
    )


def test_ring_knn_equals_exact(spark):
    """The cell-ring accelerated kNN must return exactly the global
    kNN when the ring guarantee covers the k-th neighbor distance."""
    pts, qs = _pts(spark), _queries(spark)
    exact = {
        (r.query_id, r.point_id, r.knn_rank)
        for r in K.knn_join_exact(qs, pts, 5).select("query_id", "point_id", "knn_rank").collect()
    }
    rings = {
        (r.query_id, r.point_id, r.knn_rank)
        for r in K.knn_join_rings(qs, pts, 5, res=2, rings=4, broadcast_queries=True)
        .select("query_id", "point_id", "knn_rank")
        .collect()
    }
    assert rings == exact
    assert len(exact) == 25 * 5
    # sanity on the guarantee the params promise
    assert K.min_ring_guarantee_km(2, 4) > 400


def test_knn_ranks_are_distance_ordered(spark):
    pts, qs = _pts(spark, 800), _queries(spark, 5)
    out = K.knn_join_exact(qs, pts, 4).toPandas().sort_values(["query_id", "knn_rank"])
    for _, grp in out.groupby("query_id"):
        d = grp.dist_km.to_numpy()
        assert (np.diff(d) >= -1e-9).all()


def test_overlay_matches_bruteforce(spark):
    rng = np.random.default_rng(9)

    def boxes(n, seed):
        r = np.random.default_rng(seed)
        clat, clon = r.uniform(-70, 70, n), r.uniform(-160, 160, n)
        dlat, dlon = r.uniform(0.1, 5, n), r.uniform(0.1, 5, n)
        return pd.DataFrame(
            {
                "box_id": np.arange(n),
                "min_lat": clat - dlat,
                "max_lat": clat + dlat,
                "min_lon": clon - dlon,
                "max_lon": clon + dlon,
            }
        )
    A, B = boxes(120, 1), boxes(60, 2)
    got = {
        (r.a_box_id, r.b_box_id)
        for r in ov.overlay_join(
            spark.createDataFrame(A), spark.createDataFrame(B), zoom=5, broadcast_b=True
        ).select("a_box_id", "b_box_id").collect()
    }
    want = set()
    for a in A.itertuples(index=False):
        hit = ~(
            (a.max_lon < B.min_lon) | (B.max_lon < a.min_lon)
            | (a.max_lat < B.min_lat) | (B.max_lat < a.min_lat)
        )
        for b in B.box_id[hit.to_numpy()]:
            want.add((int(a.box_id), int(b)))
    assert got == want and len(want) > 20


def test_safe_knn_exact_at_sparse_density(spark):
    """knn_join_safe must equal exact even when rings alone fail
    (sparse points, distant queries — the sf0.001 regression)."""
    rng = np.random.default_rng(13)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": np.arange(120),  # very sparse globally
                "lat": rng.uniform(-80, 80, 120),
                "lon": rng.uniform(-175, 175, 120),
            }
        )
    )
    qs = _queries(spark, n=15, seed=14)
    exact = {
        (r.query_id, r.point_id, r.knn_rank)
        for r in K.knn_join_exact(qs, pts, 5).select("query_id", "point_id", "knn_rank").collect()
    }
    rings_only = {
        (r.query_id, r.point_id, r.knn_rank)
        for r in K.knn_join_rings(qs, pts, 5, res=2, rings=4, broadcast_queries=True)
        .select("query_id", "point_id", "knn_rank").collect()
    }
    safe = {
        (r.query_id, r.point_id, r.knn_rank)
        for r in K.knn_join_safe(qs, pts, 5, res=2, rings=4)
        .select("query_id", "point_id", "knn_rank").collect()
    }
    assert rings_only != exact  # rings alone genuinely insufficient here
    assert safe == exact        # fallback certifies and repairs
