"""Incremental materialized aggregate views: exactly-once IVM over the
versioned catalog.

The reference's Postgres views recompute on read; the 100 TB analogue is
a continuously-maintained aggregate state table (operators/incremental)
plus an APPLIED-BATCH LEDGER for exactly-once semantics: scalar monoid
state (count/sum) is NOT idempotent under replay (unlike the HLL sketch
state), so at-least-once delivery needs bookkeeping. The ledger is the
compacted applied-batch state (``operators/ledger`` — per-prefix
high-water marks, constant meta size across any number of batches)
carried in the state snapshot's ``_meta.json``
sidecar: a replayed batch is detected and skipped before any state
mutation, and because the ledger commits INSIDE the same snapshot
directory the Catalog's single pointer flip makes state + ledger
atomic — a crash at any point leaves the pointer referencing a snapshot
whose ledger exactly matches its contents, so replay either re-merges
onto the true pre-batch state or is refused. (An earlier design wrote
the ledger as a second catalog table; a crash between the two writes
could double-count the in-flight batch.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..pins import release_new_pins, snapshot_pins
from .incremental import STATE_COLS, agg_state, finalize, merge_states
from .ledger import ledger_add, ledger_load, ledger_meta, ledger_seen


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

    def applied_count(self) -> int:
        """Total batches ever applied (ledger observability — the ledger
        itself is compacted to per-prefix high-water marks)."""
        return ledger_load(self.catalog.read_meta(self.name))["count"]

    def refresh(self, batch: DataFrame, batch_id: str) -> bool:
        """Merge one batch into the view state. Returns False (no state
        touched) if ``batch_id`` was already applied — the exactly-once
        guard; True once the new snapshot is committed."""
        led = ledger_load(self.catalog.read_meta(self.name))
        if ledger_seen(led, batch_id):
            return False
        delta = agg_state(batch, self.keys, self.value_col)
        if self.catalog.exists(self.name):
            merged = merge_states(
                self.catalog.read(self.name), delta, self.keys
            )
        else:
            merged = delta
        # state and ledger commit together: both live inside the new
        # version directory, made visible by ONE pointer flip — a crash
        # anywhere leaves the previous snapshot (without this batch in its
        # ledger) current, so replay re-merges onto the true pre-batch
        # state. No window exists where state includes the batch but the
        # ledger doesn't (or vice versa).
        ledger_add(led, batch_id)
        self.catalog.write(
            merged.select(*self.keys, *STATE_COLS),
            self.name,
            meta=ledger_meta(led),
        )
        return True

    def read(self) -> DataFrame:
        """The user-facing finalized view (avg/sum/min/max projection)."""
        return finalize(self.catalog.read(self.name), self.keys)


class PartitionedIncrementalView:
    """Incrementally-maintained aggregate whose state table is
    PARTITIONED by one of its group keys (a date/month bucket in
    practice) and refreshed partition-scoped: a micro-batch reads only
    the state partitions its rows fall in (partition-pruned scan),
    merges, and stages a version where every untouched partition is
    reused byte-identically (``Catalog.stage_partition_delta`` —
    hardlink here, manifest reuse on an object store). The state
    HISTORY is never rescanned (the monoid-merge property all
    IncrementalViews share) **nor rewritten** (what this class adds) —
    the 100 TB daily-batch shape, composing the round-9 fact-commit
    machinery with IVM (round-9 verdict next-round #8).

    Exactly-once rides the same in-snapshot applied-batch ledger as
    :class:`IncrementalView`: the updated ledger is written INSIDE the
    staged version directory (``stage_partition_delta(meta=...)``) and
    becomes visible under the same atomic publication as the state, so
    no crash window exists where state includes a batch the ledger
    doesn't know (or vice versa)."""

    def __init__(
        self,
        catalog: Catalog,
        name: str,
        keys: list[str],
        value_col: str,
        partition_key: str,
    ) -> None:
        if partition_key not in keys:
            raise ValueError(
                f"partition_key {partition_key!r} must be one of the "
                f"group keys {keys} — a partition column outside the "
                "grouping would split groups across partitions"
            )
        self.catalog = catalog
        self.name = name
        self.keys = keys
        self.value_col = value_col
        self.partition_key = partition_key

    def applied_count(self) -> int:
        """Total batches ever applied (ledger observability)."""
        return ledger_load(self.catalog.read_meta(self.name))["count"]

    def _canon(self, state: DataFrame) -> DataFrame:
        """Pin the stored state schema. The full-rewrite views tolerate
        merge_states widening sum_val's decimal precision per merge
        (every file is rewritten at the new type together); here old
        partition files SURVIVE refreshes, so a widening write would
        leave one snapshot mixing decimal(28,6) and decimal(38,6)
        footers — an unreadable table. Every write goes through this
        fixed shape instead."""
        return state.select(
            *self.keys,
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("sum_val").cast("decimal(38,6)").alias("sum_val"),
            F.col("min_val").alias("min_val"),
            F.col("max_val").alias("max_val"),
        )

    def stage_refresh(self, batch: DataFrame, batch_id: str) -> dict | None:
        """Stage (WITHOUT publishing) one batch's partition-scoped merge
        and return ``{table: staged_version}`` for
        ``Catalog.commit_tables(staged=...)`` — so a daily batch can
        publish its fact delta AND its downstream materializations under
        ONE intent manifest (no crash window where the fact shows a day
        the matview doesn't). Returns None if ``batch_id`` was already
        applied. Call under a held ``catalog.writer_lock()``; nothing is
        visible (and the ledger does not advance) until the caller's
        ``commit_tables`` flips the pointer — the staged version carries
        the updated ledger inside it, so an uncommitted stage is simply
        re-staged by the replay."""
        led = ledger_load(self.catalog.read_meta(self.name))
        if ledger_seen(led, batch_id):
            return None
        pk = self.partition_key
        # Pin the batch-sized delta once (consumed twice: touched-partition
        # listing + merge). localCheckpoint blocks outlive
        # DataFrame.unpersist(), so release exactly the RDD ids pinned here
        # after the commit — the run_daily_batch pattern, via the shared
        # pins helper (loud on failure).
        sc = batch.sparkSession.sparkContext
        pre_pin_ids = snapshot_pins(sc)
        delta = agg_state(batch, self.keys, self.value_col).localCheckpoint(
            eager=True
        )
        try:
            ledger_add(led, batch_id)
            if not self.catalog.exists(self.name):
                # staged first write: version dir exists, pointer not
                # flipped — commit_tables publishes it like any other
                staged_v = self.catalog._write_version(
                    self._canon(delta),
                    self.name,
                    meta=ledger_meta(led),
                    partition_by=[pk],
                )
                return {self.name: staged_v}
            touched = [
                r[0] for r in delta.select(pk).distinct().collect()
            ]  # bounded: one value per partition the batch touches
            state = self.catalog.read(self.name)
            # Partition-column type inference can read pk back as a
            # DIFFERENT type than the delta carries (date-like strings
            # come back as DATE) — normalize to the delta's type AFTER
            # the pruning filter, so the filter still sits on the raw
            # partition column (literals coerce; PartitionFilters
            # survive) while the merge unions consistent key types.
            pruned = state.filter(F.col(pk).isin(touched))
            pk_type = delta.schema[pk].dataType
            if state.schema[pk].dataType != pk_type:
                pruned = pruned.withColumn(pk, F.col(pk).cast(pk_type))
            merged = merge_states(
                # the pruned scan is the whole point: the merge never
                # reads untouched history
                pruned,
                delta,
                self.keys,
            )
            staged_v = self.catalog.stage_partition_delta(
                self._canon(merged),
                self.name,
                touched,
                partition_by=[pk],
                meta=ledger_meta(led),
            )
            return {self.name: staged_v}
        finally:
            release_new_pins(
                sc, pre_pin_ids, "PartitionedIncrementalView.stage_refresh"
            )

    def refresh(self, batch: DataFrame, batch_id: str) -> bool:
        """Standalone merge of one batch into only the state partitions
        it touches: :meth:`stage_refresh` + immediate publication under
        its own manifest, with the writer lock held across both (the
        stage+commit pair is one logical transaction — a concurrent
        writer interleaving between them fails loudly). Returns False
        (no state touched) if ``batch_id`` was already applied."""
        with self.catalog.writer_lock():
            staged = self.stage_refresh(batch, batch_id)
            if staged is None:
                return False
            self.catalog.commit_tables({}, staged=staged)
        return True

    def compact(self, max_files_per_partition: int) -> list:
        """Rewrite only the partitions holding more than
        ``max_files_per_partition`` data files into one file each,
        reusing the rest byte-identically; content, finalized view, and
        ledger are unchanged (see :func:`compact_view_partitions`)."""
        return compact_view_partitions(
            self.catalog,
            self.name,
            self.partition_key,
            self._canon,
            max_files_per_partition,
        )

    def read(self) -> DataFrame:
        """The user-facing finalized view (avg/sum/min/max projection)."""
        return finalize(self.catalog.read(self.name), self.keys)


#: Retractable state carries only the GROUP-invertible measures: count
#: and sum form a group (every element has an inverse), so deletes merge
#: as negated deltas. min/max are deliberately absent — they are
#: monoid-only (no inverse: retracting the current max requires the
#: full history to find the runner-up), the classic IVM limitation.
RETRACT_STATE_COLS = ("cnt", "sum_val")


class RetractableView:
    """Incrementally-maintained aggregate that also supports DELETE
    batches — the reference's retention-purge semantics
    (``delete_old_ranking_records_fn``) maintained incrementally: a
    delete batch merges as a NEGATED delta instead of forcing a
    recompute of the surviving history. Exactly-once via the same
    in-snapshot applied-batch ledger as :class:`IncrementalView`;
    insert and delete batches share one id namespace, so a replayed
    delete is refused the same way a replayed insert is.

    Keys whose count reaches zero are dropped at merge time, so a
    fully-retracted group disappears from the view exactly as it would
    from a recompute."""

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

    def applied_count(self) -> int:
        """Total batches ever applied (see :meth:`IncrementalView.applied_count`)."""
        return ledger_load(self.catalog.read_meta(self.name))["count"]

    def _delta(self, batch: DataFrame, sign: int) -> DataFrame:
        v = F.col(self.value_col).cast("decimal(18,6)")
        cnt = F.count(F.lit(1)).cast("bigint")
        sm = F.sum(v)
        if sign < 0:
            cnt, sm = -cnt, -sm
        return batch.groupBy(*self.keys).agg(
            cnt.alias("cnt"), sm.alias("sum_val")
        )

    def refresh(
        self, batch: DataFrame, batch_id: str, delete: bool = False
    ) -> bool:
        """Merge one insert (or, with ``delete=True``, retract) batch.
        Returns False untouched if ``batch_id`` was already applied."""
        led = ledger_load(self.catalog.read_meta(self.name))
        if ledger_seen(led, batch_id):
            return False
        delta = self._delta(batch, -1 if delete else 1)
        if self.catalog.exists(self.name):
            merged = (
                self.catalog.read(self.name)
                .select(*self.keys, *RETRACT_STATE_COLS)
                .unionByName(delta.select(*self.keys, *RETRACT_STATE_COLS))
                .groupBy(*self.keys)
                .agg(
                    F.sum("cnt").cast("bigint").alias("cnt"),
                    F.sum("sum_val").alias("sum_val"),
                )
                # fully-retracted keys leave the state, as in a recompute
                .filter(F.col("cnt") != 0)
            )
        else:
            merged = delta
        ledger_add(led, batch_id)
        self.catalog.write(
            merged.select(*self.keys, *RETRACT_STATE_COLS),
            self.name,
            meta=ledger_meta(led),
        )
        return True

    def read(self) -> DataFrame:
        """Finalized view: n_rows / sum_value / avg_value (the
        group-invertible measures only)."""
        state = self.catalog.read(self.name)
        return state.select(
            *self.keys,
            F.col("cnt").cast("bigint").alias("n_rows"),
            F.col("sum_val").cast("double").alias("sum_value"),
            F.round(
                F.col("sum_val").cast("double") / F.col("cnt").cast("double"),
                6,
            ).alias("avg_value"),
        )


class PartitionedRetractableView:
    """IVM with DELETE batches over a state table PARTITIONED by one of
    its group keys — the composition the round-10 verdict named as the
    retention-purge-at-scale shape (next-round #3): the reference's
    delete_old_ranking_records_fn (create_schema_behavior.sql:74-80)
    composed with a downstream materialization must retract ONLY the
    date partitions the expired slice falls in, not rewrite the view.

    Algebra: the group-invertible measures only (count/sum —
    ``RETRACT_STATE_COLS``; min/max have no inverse, see
    :class:`RetractableView`). A delete batch merges as a NEGATED delta
    into exactly the partitions it touches; keys whose count reaches
    zero drop at merge time, and a partition whose every key fully
    retracts disappears from the staged version entirely (the merged
    frame carries no rows for it, so ``stage_partition_delta`` neither
    rewrites nor reuses it) — partition-level deletion falls out of the
    row-level algebra with no special case.

    Exactly-once, staging, and publication are identical to
    :class:`PartitionedIncrementalView`: in-snapshot applied-batch
    ledger (insert and delete batches share one id namespace), state
    schema pinned via ``_canon`` (old partition files survive
    refreshes, so a widening write would mix decimal footers in one
    snapshot), untouched partitions republished byte-identically."""

    def __init__(
        self,
        catalog: Catalog,
        name: str,
        keys: list[str],
        value_col: str,
        partition_key: str,
    ) -> None:
        if partition_key not in keys:
            raise ValueError(
                f"partition_key {partition_key!r} must be one of the "
                f"group keys {keys} — a partition column outside the "
                "grouping would split groups across partitions"
            )
        self.catalog = catalog
        self.name = name
        self.keys = keys
        self.value_col = value_col
        self.partition_key = partition_key

    def applied_count(self) -> int:
        """Total batches ever applied (ledger observability)."""
        return ledger_load(self.catalog.read_meta(self.name))["count"]

    def _canon(self, state: DataFrame) -> DataFrame:
        """Pin the stored state schema (see
        :meth:`PartitionedIncrementalView._canon` — surviving partition
        files make per-merge decimal widening an unreadable table)."""
        return state.select(
            *self.keys,
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("sum_val").cast("decimal(38,6)").alias("sum_val"),
        )

    def _delta(self, batch: DataFrame, sign: int) -> DataFrame:
        v = F.col(self.value_col).cast("decimal(18,6)")
        cnt = F.count(F.lit(1)).cast("bigint")
        sm = F.sum(v)
        if sign < 0:
            cnt, sm = -cnt, -sm
        return batch.groupBy(*self.keys).agg(
            cnt.alias("cnt"), sm.alias("sum_val")
        )

    def stage_refresh(
        self, batch: DataFrame, batch_id: str, delete: bool = False
    ) -> dict | None:
        """Stage (WITHOUT publishing) one insert — or, with
        ``delete=True``, retract — batch's partition-scoped merge;
        contract identical to
        :meth:`PartitionedIncrementalView.stage_refresh` (call under a
        held writer lock, publish via ``commit_tables(staged=...)``,
        None = already applied)."""
        led = ledger_load(self.catalog.read_meta(self.name))
        if ledger_seen(led, batch_id):
            return None
        pk = self.partition_key
        if delete and not self.catalog.exists(self.name):
            raise ValueError(
                f"cannot retract from {self.name!r}: no state exists — "
                "a delete batch can only negate previously-applied rows"
            )
        sc = batch.sparkSession.sparkContext
        pre_pin_ids = snapshot_pins(sc)
        delta = self._delta(batch, -1 if delete else 1).localCheckpoint(
            eager=True
        )
        try:
            ledger_add(led, batch_id)
            if not self.catalog.exists(self.name):
                staged_v = self.catalog._write_version(
                    self._canon(delta),
                    self.name,
                    meta=ledger_meta(led),
                    partition_by=[pk],
                )
                return {self.name: staged_v}
            touched = [
                r[0] for r in delta.select(pk).distinct().collect()
            ]  # bounded: one value per partition the batch touches
            state = self.catalog.read(self.name)
            # partition-column inference may read pk back as a different
            # type (date-shaped strings come back as DATE): filter on the
            # raw column first so PartitionFilters prune, cast after
            pruned = state.filter(F.col(pk).isin(touched))
            pk_type = delta.schema[pk].dataType
            if state.schema[pk].dataType != pk_type:
                pruned = pruned.withColumn(pk, F.col(pk).cast(pk_type))
            cols = [*self.keys, *RETRACT_STATE_COLS]
            merged = (
                pruned.select(*cols)
                .unionByName(delta.select(*cols))
                .groupBy(*self.keys)
                .agg(
                    F.sum("cnt").cast("bigint").alias("cnt"),
                    F.sum("sum_val").alias("sum_val"),
                )
                # fully-retracted keys leave the state, as in a recompute;
                # a fully-retracted PARTITION then has no rows here and
                # its dir is simply absent from the staged version
                .filter(F.col("cnt") != 0)
            )
            staged_v = self.catalog.stage_partition_delta(
                self._canon(merged),
                self.name,
                touched,
                partition_by=[pk],
                meta=ledger_meta(led),
            )
            return {self.name: staged_v}
        finally:
            release_new_pins(
                sc, pre_pin_ids, "PartitionedRetractableView.stage_refresh"
            )

    def refresh(
        self, batch: DataFrame, batch_id: str, delete: bool = False
    ) -> bool:
        """Standalone merge: :meth:`stage_refresh` + immediate
        publication, writer lock held across the pair. Returns False
        (no state touched) if ``batch_id`` was already applied."""
        with self.catalog.writer_lock():
            staged = self.stage_refresh(batch, batch_id, delete=delete)
            if staged is None:
                return False
            self.catalog.commit_tables({}, staged=staged)
        return True

    def compact(self, max_files_per_partition: int) -> list:
        """Rewrite only the partitions holding more than
        ``max_files_per_partition`` data files into one file each,
        reusing the rest byte-identically; content, finalized view, and
        ledger are unchanged (see :func:`compact_view_partitions`)."""
        return compact_view_partitions(
            self.catalog,
            self.name,
            self.partition_key,
            self._canon,
            max_files_per_partition,
        )

    def read(self) -> DataFrame:
        """Finalized view: n_rows / sum_value / avg_value (the
        group-invertible measures only)."""
        state = self.catalog.read(self.name)
        return state.select(
            *self.keys,
            F.col("cnt").cast("bigint").alias("n_rows"),
            F.col("sum_val").cast("double").alias("sum_value"),
            F.round(
                F.col("sum_val").cast("double") / F.col("cnt").cast("double"),
                6,
            ).alias("avg_value"),
        )


def compact_view_partitions(
    catalog: Catalog,
    name: str,
    partition_key: str,
    canon,
    max_files_per_partition: int,
) -> list:
    """Partition-local compaction for the partitioned matviews
    (round-10 verdict next-round #7): rewrite ONLY the partitions whose
    data-file count exceeds ``max_files_per_partition`` — each merged
    refresh writes a touched partition with one file per shuffle task
    carrying rows for it, so a hot partition can sit at dozens of tiny
    files — and republish every other partition byte-identically via
    ``stage_partition_delta``. The rewrite repartitions by the
    partition column, so every compacted partition lands as ONE file.

    Pure physical reorganization: row content, the finalized view, and
    the applied-batch ledger are all unchanged (``meta=None`` rides the
    current ``_meta.json`` into the new version), which the face's
    recompute oracle and the unit test's hash check both pin. File
    counts come from :meth:`Catalog.file_sizes` — the sanctioned
    physical-info boundary — never a filesystem walk. Returns the list
    of partition values rewritten (empty = nothing over bound, no new
    version committed)."""
    if max_files_per_partition < 1:
        raise ValueError("max_files_per_partition must be >= 1")
    prefix = f"{partition_key}="
    counts: dict[str, int] = {}
    for rel in catalog.file_sizes(name):
        head, _, _tail = rel.partition("/")
        if head.startswith(prefix):
            counts[head[len(prefix):]] = counts.get(head[len(prefix):], 0) + 1
    over = sorted(v for v, n in counts.items() if n > max_files_per_partition)
    if not over:
        return []
    with catalog.writer_lock():
        state = catalog.read(name)
        pruned = state.filter(F.col(partition_key).isin(over))
        compacted = canon(pruned).repartition(F.col(partition_key))
        staged_v = catalog.stage_partition_delta(
            compacted, name, over, partition_by=[partition_key]
        )
        catalog.commit_tables({}, staged={name: staged_v})
    return over
