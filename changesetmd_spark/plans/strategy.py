"""Broadcast-vs-shuffle selection + explicit hot-key salting.

The reference delegates all join planning to the Postgres optimizer
(SURVEY.md §4 "Join strategy selection: absent"). In Spark, Catalyst +
AQE already pick broadcast joins below
``spark.sql.autoBroadcastJoinThreshold`` and split skewed sort-merge
partitions at runtime; this module adds the two knobs the north_rule
demands explicitly:

- ``maybe_broadcast``: force a broadcast hint when the caller *knows*
  the dimension side is small (e.g. a polygon cover set of a few
  thousand query envelopes) — cheaper and more reliable than waiting
  for AQE's runtime statistics, and it survives cover explosion which
  inflates size estimates.
- ``salt``/``explode_salt``: shuffle-key salting for hot cells (cities:
  millions of images land in one hex cell). The big (probe) side gets a
  deterministic salt from a stable row key; the small (build) side is
  exploded across all salt values, so the hot cell's rows spread over
  ``buckets`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def maybe_broadcast(df: DataFrame, *, hint: bool | None) -> DataFrame:
    """Apply a broadcast hint. ``hint=True`` forces the hint (caller
    knows the side is small), ``hint=False`` forbids it (exercise the
    shuffle path), ``hint=None`` leaves the plan unhinted so Catalyst's
    size estimate + AQE's runtime statistics decide — deliberately NOT
    a probe job: an eager count per join call costs a scheduling round
    trip and AQE already re-plans to broadcast when the built side
    turns out small."""
    if hint is True:
        return F.broadcast(df)
    return df


def salt_column(key: Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from a stable row key."""
    return F.pmod(F.xxhash64(key), F.lit(buckets)).cast("int")


def with_salt(df: DataFrame, key: str, buckets: int, out: str = "_salt") -> DataFrame:
    """Attach a salt column to the big/probe side."""
    return df.withColumn(out, salt_column(F.col(key), buckets))


def explode_salt(df: DataFrame, buckets: int, out: str = "_salt") -> DataFrame:
    """Replicate the small/build side across every salt value."""
    return df.withColumn(
        out, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>"))
    )


def widen_if_narrow(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition a slim relation iff its current plan
    would run on fewer partitions than the cluster offers.

    Why: a small parquet input is often ONE row group, and a row group
    is Spark's atomic split — at any ``maxPartitionBytes`` the scan is
    a single task, serializing every narrow stage chained onto it
    (hex encode, broadcast-join probe, partial agg). One cheap shuffle
    of the slim rows buys full parallelism (measured 4.9s → 3.2s on
    the flagship containment gate at sf0.1/local[32]).

    Scale-safe by construction: the check reads the PLANNED partition
    count (no job runs), so at production scale — where the scan has
    hundreds of splits — the condition is false and NO shuffle is
    added; this is not a blanket repartition.
    """
    spark = df.sparkSession
    n = min_parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
