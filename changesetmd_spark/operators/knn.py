"""kNN join — cell-ring expansion + window top-k (SURVEY.md §2.c).

The reference has no kNN (its spatial surface is containment, B4);
this operator is part of the north_rule generalization ("kNN via
cell-ring expansion").

Two implementations, one semantic:

- ``knn_join_rings`` (the scale path): each query point explodes into
  its ``grid_disk(cell, rings)`` hex cells; candidates equi-join on
  cell; haversine + ``row_number() ≤ k`` pick winners per query.
  Cost: |queries|·(1+3r(r+1)) join keys — independent of the big-table
  size, shuffle partitioned by cell. EXACT iff the true k-th neighbor
  lies within the ring radius; ``min_ring_guarantee_km`` documents the
  radius the chosen (res, rings) guarantees, and the property test
  compares against the exact oracle.
- ``knn_join_exact`` (the oracle path): broadcast cross join + window.
  Right when the query side is small (it is broadcast); used by tests
  and the DuckDB-gated query at sf0.01.

Determinism: ties broken by quantized distance then candidate id, so
row_number is stable across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import geo, hexgrid
from ..plans import strategy


def _topk(
    pairs: DataFrame, query_id: str, cand_id: str, k: int, dist_col: str = "dist_km"
) -> DataFrame:
    # quantize to 1 µm before ordering → rank identical across engines
    order = [F.floor(F.col(dist_col) * 1e9).asc(), F.col(cand_id).asc()]
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        pairs.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )


def knn_join_exact(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    *,
    q_id: str = "query_id",
    q_lat: str = "q_lat",
    q_lon: str = "q_lon",
    p_id: str = "point_id",
    p_lat: str = "lat",
    p_lon: str = "lon",
) -> DataFrame:
    """Exact kNN: broadcast the (small) query side, cross join, window."""
    pairs = points.crossJoin(F.broadcast(queries)).withColumn(
        "dist_km",
        geo.haversine_km(F.col(q_lat), F.col(q_lon), F.col(p_lat), F.col(p_lon)),
    )
    return _topk(pairs, q_id, p_id, k)


def knn_join_rings(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    *,
    res: int = 2,
    rings: int = 2,
    q_id: str = "query_id",
    q_lat: str = "q_lat",
    q_lon: str = "q_lon",
    p_id: str = "point_id",
    p_lat: str = "lat",
    p_lon: str = "lon",
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Ring-accelerated kNN: candidates restricted to the query's
    ``rings``-disk of hex cells at ``res``. Exact when the k-th
    neighbor is within the guaranteed radius (see module docstring);
    verified against ``knn_join_exact`` in tests at the densities the
    engine is benchmarked at."""
    q = queries.withColumn(
        "_qcell", hexgrid.hex_cell(geo.clamp_lat(F.col(q_lat)), F.col(q_lon), res)
    ).withColumn("hex_cell", F.explode(hexgrid.grid_disk(F.col("_qcell"), rings))).drop(
        "_qcell"
    )
    p = points.withColumn(
        "hex_cell", hexgrid.hex_cell(geo.clamp_lat(F.col(p_lat)), F.col(p_lon), res)
    )
    q = strategy.maybe_broadcast(q, hint=broadcast_queries)
    pairs = p.join(q, "hex_cell").withColumn(
        "dist_km",
        geo.haversine_km(F.col(q_lat), F.col(q_lon), F.col(p_lat), F.col(p_lon)),
    )
    return _topk(pairs, q_id, p_id, k).drop("hex_cell")


def knn_join_safe(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    *,
    res: int = 2,
    rings: int = 4,
    q_id: str = "query_id",
    q_lat: str = "q_lat",
    q_lon: str = "q_lon",
    p_id: str = "point_id",
    p_lat: str = "lat",
    p_lon: str = "lon",
) -> DataFrame:
    """EXACT kNN at any density: ring-accelerated candidates, then an
    exact fallback for precisely the queries the rings cannot certify.

    A query's ring result is provably global iff it found ≥ k
    candidates AND its k-th distance ≤ the ring guarantee radius
    (every point within that radius is guaranteed to share the disk).
    Certified queries keep their (cheap) ring answer; the remainder —
    typically none at production density — re-run via broadcast cross
    join. Output identical to ``knn_join_exact`` by construction."""
    guarantee = min_ring_guarantee_km(res, rings)
    ringed = knn_join_rings(
        queries, points, k, res=res, rings=rings,
        q_id=q_id, q_lat=q_lat, q_lon=q_lon, p_id=p_id, p_lat=p_lat, p_lon=p_lon,
        broadcast_queries=True,
    )
    per_q = ringed.groupBy(q_id).agg(
        F.count("*").alias("_n"), F.max("dist_km").alias("_dk")
    )
    unsafe_ids = per_q.filter(
        (F.col("_n") < k) | (F.col("_dk") > guarantee)
    ).select(q_id)
    # queries with ZERO candidates never reach per_q — catch via anti join
    no_cand = queries.join(ringed.select(q_id).distinct(), q_id, "left_anti").select(q_id)
    unsafe_ids = unsafe_ids.unionByName(no_cand).distinct()

    safe_part = ringed.join(F.broadcast(unsafe_ids), q_id, "left_anti")
    unsafe_queries = queries.join(F.broadcast(unsafe_ids), q_id, "left_semi")
    exact_part = knn_join_exact(
        unsafe_queries, points, k,
        q_id=q_id, q_lat=q_lat, q_lon=q_lon, p_id=p_id, p_lat=p_lat, p_lon=p_lon,
    )
    return safe_part.unionByName(exact_part.select(*safe_part.columns))


def min_ring_guarantee_km(res: int, rings: int) -> float:
    """Lower bound on the radius (km, at the equator in the worst
    latitude-direction) inside which ``knn_join_rings`` provably sees
    every candidate: (rings − 1) disks of hexes whose inradius is
    √3/2·size (degrees), 1° lat ≈ 111.19 km. Conservative."""
    size = hexgrid.size_deg(res)
    return max(0, rings - 1) * (3**0.5 / 2) * size * 111.19
