"""Incremental rollup — the hypertable continuous-aggregate analog
(task brief: "hypertable rollup" under custom operators).

Maintains a group-by aggregate (counts + sums) over a SnapStore fact
table WITHOUT rescanning it: each ``refresh()`` aggregates only the
snapshots appended since the last refresh (``SnapStore.incremental``)
and folds them ADDITIVELY into the rollup store — count' = count + Δn,
sum' = sum + Δs. This is exactly how TimescaleDB continuous aggregates
and materialized-view maintenance work for distributive aggregates,
and the 100 TB shape is right: refresh cost is O(new data), the merge
is a key-equi-join against the (small) touched-group set, and the
rollup itself lives in a SnapStore (snapshot-logged, time-travelable).

Restriction (standard for additive maintenance): the BASE table must
be append-only over the refreshed range — merge/delete deltas are not
invertible from the delta rows alone, so ``refresh`` refuses them
(``ValueError``) rather than silently double-counting; compact
snapshots are skipped by ``incremental`` already.

Watermark: the rollup store's state row tracks the last folded base
snapshot id (``last_sequence``), so refresh is idempotent and
crash-safe in the same way replication is: re-running after a crash
re-reads from the recorded watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.snapstore import OP_APPEND, OP_COMPACT, SnapStore

_KEY = "_gkey"


class IncrementalRollup:
    def __init__(
        self,
        base: SnapStore,
        root: str,
        group_cols: list[str],
        sum_cols: list[str],
    ):
        self.base = base
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.store = SnapStore(base.spark, root, key=_KEY)

    # -- internals -----------------------------------------------------

    def _gkey(self) -> F.Column:
        """Collision-safe group key: md5 of the JSON-serialized group
        struct. NOT concat_ws — that drops NULLs (distinct groups
        differing only in NULL placement would collide on the store
        key) and a separator character inside a value could forge
        another group's key; JSON field names + escaping rule both
        out."""
        return F.md5(F.to_json(F.struct(*[F.col(c) for c in self.group_cols])))

    def _aggregate(self, df: DataFrame) -> DataFrame:
        aggs = [F.count("*").alias("n_rows")] + [
            F.sum(F.col(c).cast("decimal(28,6)")).alias(f"sum_{c}") for c in self.sum_cols
        ]
        return (
            df.groupBy(*self.group_cols)
            .agg(*aggs)
            .withColumn(_KEY, self._gkey())
        )

    def _fold_touched(self, cur: DataFrame, delta: DataFrame) -> DataFrame:
        """delta ⊕ cur for the TOUCHED groups only: the delta LEFT
        JOINs the current rollup (group labels always come from the
        delta, which defines the touched set), so refresh work scales
        with the delta — never with the rollup's total group count."""
        c = cur.select(
            F.col(_KEY),
            F.col("n_rows").alias("_cn"),
            *[F.col(f"sum_{x}").alias(f"_cs_{x}") for x in self.sum_cols],
        )
        j = delta.join(c, _KEY, "left")
        return j.select(
            F.col(_KEY),
            *[F.col(g) for g in self.group_cols],
            (F.col("n_rows") + F.coalesce(F.col("_cn"), F.lit(0))).alias("n_rows"),
            *[
                # SQL SUM ignores NULLs and is NULL only when every input is
                # NULL, so the fold must stay NULL-safe on BOTH sides: a delta
                # whose values are all NULL (delta sum NULL) must not wipe a
                # previously accumulated sum, and vice versa.
                F.when(
                    F.col(f"sum_{x}").isNull() & F.col(f"_cs_{x}").isNull(),
                    F.lit(None).cast("decimal(28,6)"),
                )
                .otherwise(
                    F.coalesce(F.col(f"sum_{x}"), F.lit(0).cast("decimal(28,6)"))
                    + F.coalesce(F.col(f"_cs_{x}"), F.lit(0).cast("decimal(28,6)"))
                )
                .alias(f"sum_{x}")
                for x in self.sum_cols
            ],
        )

    # -- API -------------------------------------------------------------

    def refresh(self) -> dict:
        """Fold all base snapshots newer than the watermark into the
        rollup. Returns {'folded_snapshots': k, 'upto': snapshot_id}.
        Takes the rollup store's single-writer mutex for the whole
        read-fold-merge-watermark cycle: an additive fold is not
        idempotent, so two concurrent refreshes would double-count."""
        self.store.acquire()
        try:
            return self._refresh_locked()
        finally:
            self.store.release()

    def _refresh_locked(self) -> dict:
        st = self.store.read_state()
        # crash-safety: an additive fold is NOT idempotent, so the
        # watermark alone is not enough — every rollup commit records
        # the base snapshot it folded up to (``base_snapshot`` meta); a
        # crash between commit and watermark resumes from the LATER of
        # the two instead of double-counting the committed delta.
        committed = max(
            (s.get("base_snapshot", -1) for s in self.store.snapshots()), default=-1
        )
        last = max(st["last_sequence"], committed)
        head = self.base.current_snapshot_id()
        if head <= last:
            st["last_sequence"] = last
            self.store.write_state(st)
            return {"folded_snapshots": 0, "upto": last}
        new_snaps = [
            s
            for s in self.base.snapshots()
            if s["id"] > last and s["op"] != OP_COMPACT
        ]
        bad = [s["id"] for s in new_snaps if s["op"] != OP_APPEND]
        if bad:
            raise ValueError(
                f"additive rollup needs an append-only range; snapshots {bad} "
                "are merge/delete — rebuild with full_refresh() instead"
            )
        delta_rows = self.base.incremental(last, head)
        delta_agg = self._aggregate(delta_rows.drop("_snap", "_deleted"))
        if self.store.snapshots():
            touched = self._fold_touched(self.store.read(), delta_agg)
            self.store.merge(touched, base_snapshot=head)
        else:
            self.store.create(delta_agg, base_snapshot=head)
        st = self.store.read_state()
        st["last_sequence"] = head
        self.store.write_state(st)
        return {"folded_snapshots": len(new_snaps), "upto": head}

    def full_refresh(self) -> None:
        """Rebuild from the base table's current state (the escape
        hatch for ranges containing merges/deletes): one full aggregate
        merged over every existing group. Same single-writer mutex as
        refresh()."""
        self.store.acquire()
        try:
            self._full_refresh_locked()
        finally:
            self.store.release()

    def _full_refresh_locked(self) -> None:
        fresh = self._aggregate(self.base.read())
        if self.store.snapshots():
            # latest keyed snapshot owns every key it carries; stale
            # groups that vanished from the base are tombstoned
            gone = self.store.read().join(fresh, _KEY, "left_anti").select(_KEY)
            self.store.delete_keys(gone, reason="full_refresh")
            self.store.merge(fresh, base_snapshot=self.base.current_snapshot_id())
        else:
            self.store.create(fresh, base_snapshot=self.base.current_snapshot_id())
        st = self.store.read_state()
        st["last_sequence"] = self.base.current_snapshot_id()
        self.store.write_state(st)

    def read(self) -> DataFrame:
        return self.store.read().drop(_KEY)
