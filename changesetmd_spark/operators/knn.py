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

import math

from pyspark.sql import Column, DataFrame, Window
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
    min_parallelism: int | None = None,
) -> DataFrame:
    """Ring-accelerated kNN: candidates restricted to the query's
    ``rings``-disk of hex cells at ``res``. Exact when the k-th
    neighbor is within the guaranteed radius (see module docstring);
    verified against ``knn_join_exact`` in tests at the densities the
    engine is benchmarked at.

    ``min_parallelism``: when set, round-robin repartition the slim
    (id, lat, lon) points relation to at least this many partitions
    before the hex encode + broadcast join. The join's parallelism
    otherwise equals the scan's split count, and a small parquet input
    (one row group) scans as ONE task no matter what
    ``maxPartitionBytes`` says — serializing the dominant stage. One
    cheap shuffle of 24-byte rows buys full-cluster parallelism; at
    real scale (many row groups) the input splits already provide it,
    so leave unset."""
    if min_parallelism:
        points = points.repartition(min_parallelism)
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
    min_parallelism: int | None = None,
) -> DataFrame:
    """EXACT kNN at any density and any latitude: ring-accelerated
    candidates, then an exact fallback for precisely the queries the
    rings cannot certify. ``min_parallelism`` repartitions the slim
    points relation ONCE (see ``knn_join_rings``); both the ring join
    and the exact fallback reuse that partitioning.

    A query's ring result is provably global iff it found ≥ k
    candidates AND its k-th distance ≤ its *per-query* guarantee
    radius ``ring_guarantee_km`` — which shrinks with |latitude| (a km
    of longitude spans ever more degrees toward the poles, where the
    degree-space hex disk covers ever less physical ground) and
    vanishes for queries near the poles or within the disk's reach of
    the antimeridian (the grid does not wrap), forcing those to the
    exact path. Certified queries keep their (cheap) ring answer; the
    remainder — typically none at production density — re-run via
    broadcast cross join. Output identical to ``knn_join_exact`` by
    construction.

    Single-pass plan: the ring join + top-k window materializes ONCE
    (``localCheckpoint`` — the output is ≤ |Q|·k slim rows) and the
    certificate is computed with windows over the SAME q_id
    partitioning (no extra shuffle); the three consumers (certified
    rows, failed ids, zero-candidate anti-join) all read the
    checkpointed blocks instead of re-running the join."""
    if min_parallelism:
        # repartition AND materialize the slim points once: the ring
        # join and the exact fallback both consume points, and without
        # this each re-runs the (possibly single-task, see
        # knn_join_rings) scan + shuffle. Measured 4.6s → 2.7s at
        # sf0.1/local[32]. Only with min_parallelism set — it is the
        # small-input escape hatch; at real scale points don't fit in
        # block-manager memory and input splits already parallelize,
        # so leave unset and the plan stays fully streaming.
        points = points.repartition(min_parallelism).localCheckpoint()
    ringed = knn_join_rings(
        queries, points, k, res=res, rings=rings,
        q_id=q_id, q_lat=q_lat, q_lon=q_lon, p_id=p_id, p_lat=p_lat, p_lon=p_lon,
        broadcast_queries=True,
    ).localCheckpoint()
    guarantee = ring_guarantee_km(F.col(q_lat), F.col(q_lon), res, rings)
    wq = Window.partitionBy(q_id)
    certed = (
        ringed.withColumn("_nk", F.count("*").over(wq))
        .withColumn("_dk", F.max("dist_km").over(wq))
        .withColumn("_cert", (F.col("_nk") >= k) & (F.col("_dk") <= guarantee))
    )
    safe_part = certed.filter(F.col("_cert")).drop("_nk", "_dk", "_cert")
    # Short-circuit: at production density every query certifies and
    # the whole fallback subplan (anti-join, two broadcasts, a points
    # band join) would execute only to produce zero rows. Two scalar
    # aggregates decide that — both over slim relations (certed reads
    # the ≤|Q|·k checkpointed ring rows; the query count is one pass
    # over the slim query relation) — so skipping the dead subplan
    # costs O(|Q|) and saves its stages + codegen. Same output by
    # construction: no uncertified and no zero-candidate queries ⇒
    # safe_part IS the exact answer.
    stats = certed.agg(
        F.countDistinct(q_id).alias("nq"),
        F.countDistinct(F.when(~F.col("_cert"), F.col(q_id))).alias("nu"),
    ).collect()[0]
    if stats.nu == 0 and stats.nq == queries.select(q_id).distinct().count():
        return safe_part
    # uncertified queries carry their ring k-th distance as a BAND: the
    # ring candidates are a subset of all points, so the global k-th
    # distance is ≤ _dk — every global top-k point satisfies
    # |Δlat| ≤ _dk/111.19 (meridian arc lower-bounds haversine), and
    # the exact fallback only scores points inside that band. Queries
    # with < k ring candidates get no band (full scan — correct, rare).
    unsafe_bands = (
        certed.filter(~F.col("_cert"))
        .groupBy(q_id)
        .agg(
            F.max(F.when(F.col("_nk") >= k, F.col("_dk") / F.lit(_KM_PER_DEG_LAT))).alias(
                "_band_deg"
            )
        )
    )
    # queries with ZERO candidates never appear in ringed — anti join
    no_cand = (
        queries.join(ringed.select(q_id).distinct(), q_id, "left_anti")
        .select(q_id)
        .withColumn("_band_deg", F.lit(None).cast("double"))
    )
    unsafe = unsafe_bands.unionByName(no_cand)

    unsafe_queries = queries.join(F.broadcast(unsafe), q_id, "inner")
    pairs = points.join(
        F.broadcast(unsafe_queries),
        F.col("_band_deg").isNull()
        | (F.abs(F.col(p_lat) - F.col(q_lat)) <= F.col("_band_deg")),
        "inner",
    ).withColumn(
        "dist_km",
        geo.haversine_km(F.col(q_lat), F.col(q_lon), F.col(p_lat), F.col(p_lon)),
    )
    exact_part = _topk(pairs, q_id, p_id, k).drop("_band_deg")
    return safe_part.unionByName(exact_part.select(*safe_part.columns))


# mean earth radius used by geo.haversine_km — certificates must bound
# the SAME metric the join ranks by
_R_KM = 6371.0088
_KM_PER_DEG_LAT = 111.19  # < π·R/180 = 111.1949 → conservative


def ring_disk_radius_deg(res: int, rings: int) -> float:
    """Euclidean degree radius provably covered by the rings-disk:
    points within (rings − 1) hex inradii (√3/2·size) of the query are
    in a covered cell. Property-tested against the exact oracle."""
    return max(0, rings - 1) * (3**0.5 / 2) * hexgrid.size_deg(res)


def ring_guarantee_km(q_lat: Column, q_lon: Column, res: int, rings: int) -> Column:
    """Per-query certificate radius: every point whose haversine
    distance to (q_lat, q_lon) is ≤ this many km provably lies inside
    the query's rings-disk. Derivation (G = disk radius in Euclidean
    degrees, g = G/√2): a point OUTSIDE the disk has degree-distance
    > G, hence |Δlat| > g or |Δlon| > g. If |Δlat| > g its haversine
    distance exceeds 111.19·g km (meridian arc). Else |Δlat| ≤ g pins
    the point's latitude to |q_lat| + g, and haversine ≥
    2R·√(cos φ_q·cos φ_p)·sin(Δλ/2) > 2R·cos_min·sin(g/2) with
    cos_min = cos(min(90°, |q_lat| + g)). The guarantee is the min of
    the two branch bounds — any point within it must be inside the
    disk. Near the poles cos_min → 0 and within G degrees of the
    antimeridian the no-wraparound grid loses coverage, so the
    guarantee is 0 there: those queries always take the exact path."""
    G = ring_disk_radius_deg(res, rings)
    g = G / math.sqrt(2.0)
    cos_min = F.cos(F.radians(F.abs(q_lat) + F.lit(g)))
    lat_branch = F.lit(_KM_PER_DEG_LAT * g)
    lon_branch = F.lit(2.0 * _R_KM * math.sin(math.radians(g) / 2.0)) * cos_min
    # |q_lat| + g must stay strictly below 90°: past it the candidate's
    # cos φ is no longer bounded below by cos_min (pole degeneracy)
    ok = (F.abs(q_lon) <= F.lit(180.0 - G)) & (F.abs(q_lat) + F.lit(g) < F.lit(90.0))
    return F.when(ok, F.least(lat_branch, lon_branch)).otherwise(F.lit(0.0))


def min_ring_guarantee_km(res: int, rings: int) -> float:
    """Scalar equator-value of ``ring_guarantee_km`` (documentation /
    sizing aid; the join itself certifies per query)."""
    G = ring_disk_radius_deg(res, rings)
    g = G / math.sqrt(2.0)
    return min(
        _KM_PER_DEG_LAT * g,
        2.0 * _R_KM * math.sin(math.radians(g) / 2.0) * math.cos(math.radians(g)),
    )
