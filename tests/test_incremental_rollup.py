"""Incremental rollup (hypertable continuous-aggregate analog) tests:
additive fold over snapshot deltas == full recompute, idempotent
refresh, crash-replay safety, append-only enforcement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changesetmd_spark.operators.rollup import IncrementalRollup
from changesetmd_spark.sources.snapstore import SnapStore


def _facts(spark, seq: int, n: int = 40):
    return (
        spark.range(n)
        .select(
            (F.col("id") + seq * 1000).alias("fact_id"),
            F.pmod(F.col("id"), 5).cast("string").alias("grp"),
            (F.col("id") * 3 + seq).cast("double").alias("amount"),
        )
    )


def _expected(base):
    return {
        r.grp: (r.n, float(r.s))
        for r in base.read()
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum(F.col("amount").cast("decimal(28,6)")).alias("s"))
        .collect()
    }


def _got(ru):
    return {r.grp: (r.n_rows, float(r.sum_amount)) for r in ru.read().collect()}


def test_incremental_fold_equals_full_recompute(spark, tmp_path):
    base = SnapStore(spark, str(tmp_path / "facts"), key="fact_id")
    base.create(_facts(spark, 0))
    ru = IncrementalRollup(base, str(tmp_path / "ru"), ["grp"], ["amount"])

    out = ru.refresh()
    assert out["folded_snapshots"] == 1
    assert _got(ru) == _expected(base)

    # three more appends, refresh after each batch of activity
    base.append(_facts(spark, 1))
    base.append(_facts(spark, 2))
    assert ru.refresh()["folded_snapshots"] == 2
    assert _got(ru) == _expected(base)

    base.append(_facts(spark, 3, n=7))
    ru.refresh()
    assert _got(ru) == _expected(base)

    # nothing new → no-op
    assert ru.refresh() == {"folded_snapshots": 0, "upto": base.current_snapshot_id()}


def test_crash_between_commit_and_watermark_does_not_double_count(spark, tmp_path):
    base = SnapStore(spark, str(tmp_path / "facts"), key="fact_id")
    base.create(_facts(spark, 0))
    ru = IncrementalRollup(base, str(tmp_path / "ru"), ["grp"], ["amount"])
    ru.refresh()
    base.append(_facts(spark, 1))
    ru.refresh()
    # simulate the crash: rewind the watermark as if the state write
    # never landed, then replay refresh
    st = ru.store.read_state()
    st["last_sequence"] = 0
    ru.store.write_state(st)
    out = ru.refresh()
    assert out["folded_snapshots"] == 0  # committed meta wins, no re-fold
    assert _got(ru) == _expected(base)


def test_refuses_nonappend_range_and_full_refresh_recovers(spark, tmp_path):
    base = SnapStore(spark, str(tmp_path / "facts"), key="fact_id")
    base.create(_facts(spark, 0))
    ru = IncrementalRollup(base, str(tmp_path / "ru"), ["grp"], ["amount"])
    ru.refresh()
    base.merge(_facts(spark, 0).withColumn("amount", F.col("amount") + 100.0))
    with pytest.raises(ValueError, match="append-only"):
        ru.refresh()
    ru.full_refresh()
    assert _got(ru) == _expected(base)
    # incremental maintenance resumes cleanly after the rebuild
    base.append(_facts(spark, 5, n=13))
    ru.refresh()
    assert _got(ru) == _expected(base)


def test_all_null_delta_does_not_wipe_accumulated_sum(spark, tmp_path):
    """SQL SUM ignores NULLs and is NULL only when every input is NULL.
    A refresh delta whose values for a group are all NULL must leave the
    previously accumulated sum intact (and vice versa: a NULL prior sum
    must not poison a non-NULL delta)."""
    base = SnapStore(spark, str(tmp_path / "facts"), key="fact_id")
    schema = "fact_id int, grp string, amount double"
    # g=a starts non-NULL; g=b starts all-NULL
    base.create(
        spark.createDataFrame([(1, "a", 10.0), (2, "b", None)], schema)
    )
    ru = IncrementalRollup(base, str(tmp_path / "ru"), ["grp"], ["amount"])
    ru.refresh()
    # delta: g=a all-NULL (must NOT wipe 10.0); g=b non-NULL (must NOT
    # stay NULL); g=c all-NULL (brand new, must be NULL like one-shot SUM)
    base.append(
        spark.createDataFrame(
            [(3, "a", None), (4, "b", 7.0), (5, "c", None)], schema
        )
    )
    ru.refresh()
    got = {
        r.grp: (r.n_rows, None if r.sum_amount is None else float(r.sum_amount))
        for r in ru.read().collect()
    }
    assert got == {"a": (2, 10.0), "b": (2, 7.0), "c": (1, None)}
    assert got == {
        r.grp: (r.n, None if r.s is None else float(r.s))
        for r in base.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("amount").cast("decimal(28,6)")).alias("s"),
        )
        .collect()
    }


def test_null_groups_do_not_collide(spark):
    """Groups differing only in NULL placement (or containing separator
    bytes) must stay distinct — the group key is a JSON-struct hash,
    not a string concat that drops NULLs."""
    import tempfile

    base_root = tempfile.mkdtemp(prefix="ru_null_base_")
    ru_root = tempfile.mkdtemp(prefix="ru_null_ru_")
    base = SnapStore(spark, base_root, key="fact_id")
    base.create(
        spark.createDataFrame(
            [(1, "x", None, 10.0), (2, None, "x", 20.0), (3, "a\x01b", "c", 1.0), (4, "a", "b\x01c", 2.0)],
            "fact_id int, g1 string, g2 string, amount double",
        )
    )
    ru = IncrementalRollup(base, ru_root, ["g1", "g2"], ["amount"])
    ru.refresh()
    base.append(spark.createDataFrame([(5, "x", None, 5.0)], "fact_id int, g1 string, g2 string, amount double"))
    ru.refresh()
    got = {(r.g1, r.g2): (r.n_rows, float(r.sum_amount)) for r in ru.read().collect()}
    assert got == {
        ("x", None): (2, 15.0),
        (None, "x"): (1, 20.0),
        ("a\x01b", "c"): (1, 1.0),
        ("a", "b\x01c"): (1, 2.0),
    }
