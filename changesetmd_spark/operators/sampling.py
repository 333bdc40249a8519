"""Stratified sampling for training-data pipelines.

Corpus mixing (so much en, so much zh, ...) is a per-stratum Bernoulli
sample. Requirements at 100 TB: deterministic (re-runs and retried
tasks pick the SAME rows — no rand()), single-pass, no shuffle (a pure
filter that pushes into the scan pipeline), and exact cross-engine so
the DuckDB oracle can replay it bit-for-bit.

Mechanism: u(id) = md5-prefix hash of the id, reduced mod 1e6 — a
uniform integer in [0, 1e6) independent of the stratum column — and a
row is kept iff u < fraction_ppm(stratum). Fractions are parts-per-
million integers (no float thresholds, no engine rounding drift). The
stratum → ppm table is a literal ``create_map`` (stays inside
whole-stage codegen; strata sets are small by definition — for
thousands of strata swap in a broadcast join, same semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def sample_uniform_ppm(id_col: Column) -> Column:
    """Deterministic uniform integer in [0, 1e6) from a row id —
    md5-prefix hash (engine-portable, same family as token_hash)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
        % PPM
    )


def SAMPLE_UNIFORM_PPM_SQL(id_expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8)) AS BIGINT) % {PPM}"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions_ppm: dict[str, int],
    id_col: str,
    default_ppm: int = 0,
) -> DataFrame:
    """Keep each row with probability fractions_ppm[stratum]/1e6
    (default_ppm for unlisted strata), deterministically in the row id.
    Pure narrow filter: no shuffle, pushes to the scan."""
    items = [x for kv in fractions_ppm.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    frac = F.coalesce(
        F.create_map(*items).getItem(F.col(strata_col)), F.lit(default_ppm)
    )
    return df.filter(sample_uniform_ppm(F.col(id_col)) < frac)


def STRATIFIED_SAMPLE_SQL(
    strata_col: str,
    fractions_ppm: dict[str, int],
    id_expr: str,
    table: str,
    default_ppm: int = 0,
    select: str = "*",
) -> str:
    """Oracle twin — identical hash, identical integer thresholds."""
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in fractions_ppm.items()
    )
    return f"""
        SELECT {select} FROM {table}
        WHERE {SAMPLE_UNIFORM_PPM_SQL(id_expr)}
              < CASE {strata_col} {cases} ELSE {default_ppm} END
    """


def quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str,
) -> DataFrame:
    """Exact per-stratum budget: keep the ``quota`` rows of each
    stratum with the smallest hash rank — a deterministic uniform
    draw WITHOUT replacement (corpus mixing by absolute row counts,
    the fixed-budget counterpart to ``stratified_sample``'s rates).

    Rank = (md5-ppm hash, id) — the id tie-break makes the order
    total, so the kept set is unique and identical cross-engine.
    One shuffle on the stratum key with a windowed row_number; at
    scale this is the standard top-k-per-group plan (rank pushdown
    via WindowGroupLimit keeps per-partition heaps of ``quota`` rows,
    so the shuffle carries candidates, not whole strata).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        sample_uniform_ppm(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )


def QUOTA_SAMPLE_SQL(
    strata_col: str,
    quota: int,
    id_expr: str,
    table: str,
    select: str = "*",
) -> str:
    """Oracle twin — identical hash rank + id tie-break."""
    return f"""
        SELECT {select} FROM (
            SELECT *, row_number() OVER (
                PARTITION BY {strata_col}
                ORDER BY {SAMPLE_UNIFORM_PPM_SQL(id_expr)} ASC, {id_expr} ASC
            ) AS _rk
            FROM {table}
        ) WHERE _rk <= {quota}
    """
