"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship spatial containment join at sf0.001.
queries()     — operator registry (changesetmd_spark.entry_queries).
oracle_sql()  — DuckDB-equivalent ANSI SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from changesetmd_spark import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: phash-geotagged points
    spatially joined against polygon envelopes via hex-cell covers,
    rolled up to per-polygon counts."""
    return EQ.q_spatial_contains_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
