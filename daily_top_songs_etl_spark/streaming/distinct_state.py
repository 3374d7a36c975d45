"""Streaming face of the incremental HLL distinct-count state.

Each drained micro-batch contributes a per-key delta sketch that is
merged into a versioned parquet state table. Two properties make this
the right streaming shape:

- **Replay safety without dedup bookkeeping**: HLL union is idempotent —
  re-merging a batch already represented in the state leaves every
  register unchanged (max(x, x) = x), so at-least-once delivery needs no
  anti-join against processed-batch ids (the upsert family needs one;
  sketches don't).
- **Bounded state**: the state table is |keys| rows × O(2^lgk) bytes per
  sketch regardless of stream length — no watermark needed because no
  per-event state is retained.

State versions are written as ``state_dir/v{batch_id}`` and the largest
version wins (same snapshot pattern as the Catalog); the merge reads the
previous version while writing the next, so no read-overwrite hazard.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.incremental import distinct_state, merge_distinct_states


def _latest_version(state_dir: str) -> str | None:
    if not os.path.isdir(state_dir):
        return None
    versions = [
        d for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    ]
    if not versions:
        return None
    return os.path.join(state_dir, max(versions, key=lambda d: int(d[1:])))


def run_distinct_state_stream(
    spark: SparkSession,
    landing_dir: str,
    landing_schema,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
) -> None:
    """Drain all available landed files, merging each micro-batch's delta
    sketches into the versioned state table; blocks until drained."""
    stream = (
        spark.readStream.schema(landing_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = distinct_state(batch_df, keys, value_col)
        prev = _latest_version(state_dir)
        if prev is not None:
            merged = merge_distinct_states(
                spark.read.parquet(prev), delta, keys
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_distinct_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest sketch state snapshot (raises if the stream never ran)."""
    latest = _latest_version(state_dir)
    if latest is None:
        raise FileNotFoundError(f"no state versions under {state_dir}")
    return spark.read.parquet(latest)


def run_incremental_view_stream(
    spark: SparkSession,
    landing_dir: str,
    landing_schema,
    view,
    checkpoint_dir: str,
) -> None:
    """Maintain an :class:`..operators.matview.IncrementalView` from a
    landing stream: ``foreachBatch`` hands each micro-batch a stable
    ``batch_id`` (Structured Streaming replays a failed batch under the
    SAME id), which becomes the view's ledger key — so the
    at-least-once replay of foreachBatch composes with the view's
    exactly-once ledger into end-to-end exactly-once aggregate state.

    ``checkpoint_dir`` is REQUIRED for that composition to hold: the
    ledger deduplicates by batch id, and batch ids are only stable when
    the stream's offset log survives restarts. Without a checkpoint a
    restarted drain renumbers from 0, so a prior run's ``stream-0`` key
    can collide with a NEW batch holding different files — the ledger
    would then silently refuse real data. The checkpoint also skips
    re-reading already-committed files, making restarts O(new data).
    """
    stream = (
        spark.readStream.schema(landing_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        view.refresh(batch_df, batch_id=f"stream-{batch_id}")

    (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
