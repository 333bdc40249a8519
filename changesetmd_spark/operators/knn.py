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


# queries at |lat| ≥ this threshold join against the full polar-cap
# cell set instead of their ring disk: the disk's km guarantee
# provably collapses toward the poles (cos(|lat|+g) → 0), so without
# cap coverage every high-latitude query pays the exact fallback at
# ANY density. With it, the certificate becomes a pure latitude bound
# (no cos factor) and polar queries certify like everyone else.
# Scale note: a polar query's candidates = all same-hemisphere points
# above lat0 = polar_lat − g; dense-pole workloads should raise the
# threshold (or res) rather than scan a fat cap.
POLAR_LAT_DEG = 80.0


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
    polar_lat: float = POLAR_LAT_DEG,
) -> DataFrame:
    """Ring-accelerated kNN: candidates restricted to the query's
    ``rings``-disk of hex cells at ``res`` — except queries poleward of
    ``polar_lat``, which explode over the precomputed polar-cap cell
    list (hexgrid.polar_cap_cells, an array LITERAL: same equi-join,
    no extra join branch) so their candidate set is every
    same-hemisphere point above lat0 = polar_lat − g. Exact when the
    k-th neighbor is within the per-query guaranteed radius (see
    ``ring_guarantee_km``); verified against ``knn_join_exact`` in
    tests at the densities the engine is benchmarked at.

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
    g = ring_disk_radius_deg(res, rings) / math.sqrt(2.0)
    lat0 = polar_lat - g
    is_polar = F.abs(F.col(q_lat)) >= F.lit(polar_lat)
    # non-polar queries explode their ring disk; polar queries pick up
    # the cap cells via a tiny cross-shaped join on the (already small)
    # BUILD side — both land in the SAME hex_cell equi-join, so the big
    # probe side is scanned once. (A first cut inlined the cap as two
    # ~1.3k-element array LITERALS in a CASE — measured +0.5-1.0s per
    # run: huge literal arrays are poison for codegen.)
    q_normal = (
        queries.filter(~is_polar)
        .withColumn("_qcell", hexgrid.hex_cell(geo.clamp_lat(F.col(q_lat)), F.col(q_lon), res))
        .withColumn("hex_cell", F.explode(hexgrid.grid_disk(F.col("_qcell"), rings)))
        .drop("_qcell")
    )
    spark = queries.sparkSession
    cap = spark.createDataFrame(
        [(c, True) for c in hexgrid.polar_cap_cells(res, lat0, True)]
        + [(c, False) for c in hexgrid.polar_cap_cells(res, lat0, False)],
        "hex_cell long, _north boolean",
    )
    q_polar = (
        queries.filter(is_polar)
        .join(F.broadcast(cap), (F.col(q_lat) >= 0) == F.col("_north"), "inner")
        .drop("_north")
        .select(*q_normal.columns)
    )
    q = q_normal.unionByName(q_polar)
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
    max_cert_rows: int = 5_000_000,
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

    Lean two-job plan (round-5 rework; the old one derived the
    certificate and fallback bands as FOUR extra Spark subplans —
    window recompute + countDistinct agg + anti-join + lineage-derived
    band groupBy — whose codegen dominated first-invocation latency,
    and at benched densities the fallback ran for EVERY query): the
    ring join + top-k window materializes ONCE (``localCheckpoint`` —
    ≤ |Q|·k slim rows, guarantee riding as one extra column), the
    checkpointed rows are COLLECTED and the certificate is decided
    driver-side in plain Python — no further Spark job. The query side
    is broadcast-small by contract (the ring join already ships it to
    every executor), so collecting ≤|Q|·k slim rows is the same order
    of driver traffic as that broadcast. If every query certifies, the
    checkpointed ring result IS the answer — zero further plans.
    Otherwise the uncertified rows (id, coords, band) are re-emitted
    as a literal DataFrame and ONE broadcast band join against the
    checkpointed points repairs exactly those queries."""
    if min_parallelism:
        # repartition AND materialize the slim points once (the
        # single-row-group escape hatch, see knn_join_rings). Keeping
        # this as its own eager job is MEASURED faster than an inline
        # repartition in the ring plan (r4: 3.4s vs 5.4s warm;
        # re-confirmed r5: 3.0s vs 4.5s) — the checkpoint's dedicated
        # materialization buys fully parallel downstream stages. At
        # real scale leave min_parallelism unset: input splits already
        # parallelize and the plan stays fully streaming.
        points = points.repartition(min_parallelism).localCheckpoint()
    # guarantee rides the ring plan as one extra column (constant per
    # query) so certification needs NO further Spark job: the per-query
    # stats fold in plain Python over the collected checkpoint rows.
    guarantee = ring_guarantee_km(F.col(q_lat), F.col(q_lon), res, rings)
    ringed_g = (
        knn_join_rings(
            queries, points, k, res=res, rings=rings,
            q_id=q_id, q_lat=q_lat, q_lon=q_lon, p_id=p_id, p_lat=p_lat, p_lon=p_lon,
            broadcast_queries=True,
        )
        .withColumn("_g", guarantee)
        .localCheckpoint()
    )
    # driver-side certificate guard (r6, ADVICE): the certify fold
    # collects ≤ |Q|·k slim rows under the broadcast-small-queries
    # contract — which nothing enforced. A huge query side would hit a
    # silent driver-memory cliff here; fail LOUDLY instead.
    cert_rows = ringed_g.count()
    if cert_rows > max_cert_rows:
        raise ValueError(
            f"knn_join_safe certificate would collect {cert_rows} rows "
            f"(> max_cert_rows={max_cert_rows}): the query side exceeds "
            "the broadcast-small contract this operator is designed for "
            "— partition the query set and join per slice, or raise "
            "max_cert_rows explicitly if the driver has the memory"
        )
    per_q: dict = {}
    for r in ringed_g.select(q_id, "dist_km", "_g").collect():
        st = per_q.setdefault(r[0], {"_nk": 0, "_dk": 0.0, "_g": r[2]})
        st["_nk"] += 1
        st["_dk"] = max(st["_dk"], r[1])
    ringed = ringed_g.drop("_g")
    # uncertified queries carry their ring k-th distance as a BAND: the
    # ring candidates are a subset of all points, so the global k-th
    # distance is ≤ _dk — every global top-k point satisfies
    # |Δlat| ≤ _dk/111.19 (meridian arc lower-bounds haversine), and
    # the exact fallback only scores points inside that band. Queries
    # with < k ring candidates get no band (full scan — correct, rare);
    # queries with ZERO candidates never appear in ringed at all.
    unsafe: list[tuple] = []
    for row in queries.select(q_id, q_lat, q_lon).collect():
        st = per_q.get(row[0])
        if st is None:
            unsafe.append((row[0], row[1], row[2], None))
        elif not (st["_nk"] >= k and st["_dk"] <= st["_g"]):
            band = st["_dk"] / _KM_PER_DEG_LAT if st["_nk"] >= k else None
            unsafe.append((row[0], row[1], row[2], band))
    if not unsafe:
        return ringed  # every query certified: the ring result is exact
    from pyspark.sql.types import DoubleType, StructField, StructType

    # (r6, ADVICE fix) rebuild the fallback side by joining the
    # uncertified (id, band) pairs BACK to the full queries relation:
    # the r5 literal DataFrame carried only (id, lat, lon, band), so a
    # caller whose queries had extra columns got an AnalysisException
    # from the final union's column projection.
    unsafe_ids = queries.sparkSession.createDataFrame(
        [(u[0], u[3]) for u in unsafe],
        StructType(
            [
                StructField(q_id, queries.schema[q_id].dataType, True),
                StructField("_band_deg", DoubleType(), True),
            ]
        ),
    )
    unsafe_df = queries.join(F.broadcast(unsafe_ids), q_id, "inner")
    pairs = points.join(
        F.broadcast(unsafe_df),
        F.col("_band_deg").isNull()
        | (F.abs(F.col(p_lat) - F.col(q_lat)) <= F.col("_band_deg")),
        "inner",
    ).withColumn(
        "dist_km",
        geo.haversine_km(F.col(q_lat), F.col(q_lon), F.col(p_lat), F.col(p_lon)),
    )
    exact_part = _topk(pairs, q_id, p_id, k).drop("_band_deg")
    safe_part = ringed.filter(~F.col(q_id).isin([u[0] for u in unsafe]))
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


def ring_guarantee_km(
    q_lat: Column, q_lon: Column, res: int, rings: int, polar_lat: float = POLAR_LAT_DEG
) -> Column:
    """Per-query certificate radius: every point whose haversine
    distance to (q_lat, q_lon) is ≤ this many km provably lies inside
    the query's rings-disk. Derivation (G = disk radius in Euclidean
    degrees, g = G/√2): a point OUTSIDE the disk has degree-distance
    > G, hence |Δlat| > g or |Δlon| > g. If |Δlat| > g its haversine
    distance exceeds 111.19·g km (meridian arc). Else |Δlat| ≤ g pins
    the point's latitude to |q_lat| + g, and haversine =
    2R·asin(√(sin²(Δφ/2) + cos φ_q·cos φ_p·sin²(Δλ/2))) ≥
    2R·√(cos φ_q·cos_min)·sin(g/2) with cos_min = cos(|q_lat| + g)
    (asin x ≥ x; cos φ_p ≥ cos_min on the branch). The √(cos φ_q·
    cos_min) factor — rather than the looser plain cos_min — is ~2×
    stronger near the poles, where it decides whether high-latitude
    queries certify at all. The guarantee is the min of the two branch
    bounds — any point within it must be inside the disk.

    POLAR regime (|q_lat| ≥ polar_lat): the disk bound is useless
    there (cos_min → 0), but these queries join against the full
    polar-cap cell set (knn_join_rings), a proven superset of every
    cell holding a point with |φ| ≥ lat0 = polar_lat − g. A
    non-candidate point therefore has |φ| < lat0, i.e. Δφ >
    |q_lat| − lat0, and its haversine distance exceeds
    111.19·(|q_lat| − lat0) km — a pure meridian bound with no cos
    collapse and no antimeridian exclusion (the cap spans all
    longitudes), so polar queries certify like mid-latitude ones."""
    G = ring_disk_radius_deg(res, rings)
    g = G / math.sqrt(2.0)
    lat0 = polar_lat - g
    cos_min = F.cos(F.radians(F.abs(q_lat) + F.lit(g)))
    lat_branch = F.lit(_KM_PER_DEG_LAT * g)
    lon_branch = F.lit(2.0 * _R_KM * math.sin(math.radians(g) / 2.0)) * F.sqrt(
        F.cos(F.radians(q_lat)) * cos_min
    )
    # |q_lat| + g must stay strictly below 90°: past it the candidate's
    # cos φ is no longer bounded below by cos_min (pole degeneracy)
    ok = (F.abs(q_lon) <= F.lit(180.0 - G)) & (F.abs(q_lat) + F.lit(g) < F.lit(90.0))
    return F.when(
        F.abs(q_lat) >= F.lit(polar_lat),
        F.lit(_KM_PER_DEG_LAT) * (F.abs(q_lat) - F.lit(lat0)),
    ).otherwise(F.when(ok, F.least(lat_branch, lon_branch)).otherwise(F.lit(0.0)))


def min_ring_guarantee_km(res: int, rings: int) -> float:
    """Scalar equator-value of ``ring_guarantee_km`` (documentation /
    sizing aid; the join itself certifies per query)."""
    G = ring_disk_radius_deg(res, rings)
    g = G / math.sqrt(2.0)
    return min(
        _KM_PER_DEG_LAT * g,
        2.0 * _R_KM * math.sin(math.radians(g) / 2.0) * math.sqrt(math.cos(math.radians(g))),
    )
