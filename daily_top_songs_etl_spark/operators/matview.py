"""Incremental materialized aggregate views: exactly-once IVM over the
versioned catalog.

The reference's Postgres views recompute on read; the 100 TB analogue is
a continuously-maintained aggregate state table (operators/incremental)
plus an APPLIED-BATCH LEDGER for exactly-once semantics: scalar monoid
state (count/sum) is NOT idempotent under replay (unlike the HLL sketch
state), so at-least-once delivery needs bookkeeping. The ledger is a
tiny catalog table of applied batch ids; a replayed batch is detected
and skipped before any state mutation. Both the state and the ledger
ride the Catalog's versioned snapshots, so a failed refresh never
half-applies (the pointer flips after both writes; on crash, the ledger
check re-admits the batch and the merge re-derives from the last good
snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Catalog
from .incremental import STATE_COLS, agg_state, finalize, merge_states


class IncrementalView:
    """A named, catalog-backed incrementally-maintained aggregate."""

    def __init__(
        self,
        catalog: Catalog,
        name: str,
        keys: list[str],
        value_col: str,
    ) -> None:
        self.catalog = catalog
        self.name = name
        self.keys = keys
        self.value_col = value_col
        self._ledger = f"{name}__applied_batches"

    def applied_batches(self) -> set[str]:
        if not self.catalog.exists(self._ledger):
            return set()
        return {
            r["batch_id"] for r in self.catalog.read(self._ledger).collect()
        }

    def refresh(self, batch: DataFrame, batch_id: str) -> bool:
        """Merge one batch into the view state. Returns False (no state
        touched) if ``batch_id`` was already applied — the exactly-once
        guard; True once the new snapshot is committed."""
        if batch_id in self.applied_batches():
            return False
        delta = agg_state(batch, self.keys, self.value_col)
        if self.catalog.exists(self.name):
            merged = merge_states(
                self.catalog.read(self.name), delta, self.keys
            )
        else:
            merged = delta
        # state snapshot first, ledger second: a crash between the two
        # re-admits the batch, and re-merging onto the PRE-crash snapshot
        # is what the version pointer still references — no double count.
        self.catalog.write(
            merged.select(*self.keys, *STATE_COLS), self.name
        )
        ledger_row = batch.sparkSession.createDataFrame(
            [(batch_id,)], "batch_id string"
        )
        if self.catalog.exists(self._ledger):
            self.catalog.append(ledger_row, self._ledger)
        else:
            self.catalog.write(ledger_row, self._ledger)
        return True

    def read(self) -> DataFrame:
        """The user-facing finalized view (avg/sum/min/max projection)."""
        return finalize(self.catalog.read(self.name), self.keys)
