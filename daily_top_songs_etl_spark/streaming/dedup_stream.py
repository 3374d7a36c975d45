"""Streaming face of the persisted dedup signature index.

``dropDuplicatesWithinWatermark`` handles duplicates WITHIN a stream's
watermark horizon; it cannot answer "have we ever ingested something
like this document" — that requires history. This module composes the
persisted MinHash signature index (``extensions.dedup.build_dedup_index``
family) with ``foreachBatch``: each micro-batch is

1. deduped WITHIN the batch (LSH pairs → keep one representative),
2. matched against the PERSISTED corpus signatures (batch-sized shingle
   work; corpus text never re-read),
3. routed — near-dups of history (or non-representatives of a batch
   cluster) to ``out_dir/duplicates``, fresh docs to
   ``out_dir/accepted`` — and
4. the ACCEPTED docs' signatures are folded into the index append-only,
   so later batches dedup against earlier ones too.

Replay safety: foreachBatch is at-least-once; Structured Streaming
replays a failed batch under the SAME batch_id with the same rows.
Three mechanisms make the whole funnel converge under replay:

- a marker file per processed batch id short-circuits fully-processed
  replays at the TOP of the batch function (checked before any work —
  steps 1-3 are NOT idempotent once step 4 has run, because a re-match
  against an index that already holds the batch's own signatures would
  self-match every accepted doc and overwrite ``accepted/batch_{id}``
  with an empty set);
- the history match excludes corpus rows whose doc_id is a member of
  the batch itself, so even a replay that races past the marker (crash
  after the index append, before the marker write) routes identically;
- the index append goes through ``catalog.append_once`` keyed by
  batch_id — a replayed append converges to ONE copy of the signature
  rows instead of doubling them.

Scale shape: identical to the batch operator — the only per-batch work
proportional to history is the stored-signature scan (~0.3% of corpus
bytes, bucket-clusterable for pruning); everything else is batch-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.dedup import (
    append_to_dedup_index,
    dedup_apply,
    match_against_dedup_index,
    minhash_lsh_star_edges,
)


def run_dedup_index_stream(
    spark: SparkSession,
    landing_dir: str,
    landing_schema,
    catalog,
    name: str,
    checkpoint_dir: str,
    out_dir: str,
    min_est: float = 0.5,
) -> None:
    """Drain all landed document files, routing each micro-batch through
    the dedup-index funnel; blocks until drained. Documents need
    ``doc_id`` and ``text`` columns; extra columns ride along."""
    marker_dir = os.path.join(out_dir, "_processed")
    os.makedirs(marker_dir, exist_ok=True)

    stream = (
        spark.readStream.schema(landing_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        marker = os.path.join(marker_dir, f"batch_{batch_id}")
        if os.path.exists(marker):
            return  # fully processed: outputs routed, signatures appended
        batch_df = batch_df.localCheckpoint(eager=True)  # pin files of THIS batch
        # 1. within-batch near-dup: dedup_apply returns the surviving ids
        #    (one representative per cluster + every unclustered doc).
        #    Star edges, not pairs: clustering only needs connectivity,
        #    and a boilerplate-heavy batch makes the pair graph quadratic
        #    while star edges stay <= n_bands x batch rows.
        keep = dedup_apply(
            batch_df.select("doc_id"), minhash_lsh_star_edges(batch_df)
        ).select("doc_id")
        survivors = batch_df.join(keep, "doc_id")
        # 2. batch-vs-history: any stored doc with est >= min_est kills.
        #    Exclude corpus rows that ARE batch members: a replay that
        #    crashed after the index append would otherwise see the
        #    batch's own signatures and self-match everything.
        hist_hits = (
            match_against_dedup_index(catalog, name, survivors)
            .filter(F.col("est_jaccard") >= min_est)
            .join(
                batch_df.select(F.col("doc_id").alias("corpus_doc_id")),
                "corpus_doc_id",
                "left_anti",
            )
            .select(F.col("batch_doc_id").alias("doc_id"))
            .distinct()
        )
        accepted = survivors.join(hist_hits, "doc_id", "left_anti")
        duplicates = batch_df.join(
            accepted.select("doc_id"), "doc_id", "left_anti"
        )
        # 3. idempotent per-batch outputs (replay overwrites in place)
        accepted.write.mode("overwrite").parquet(
            os.path.join(out_dir, "accepted", f"batch_{batch_id}")
        )
        duplicates.write.mode("overwrite").parquet(
            os.path.join(out_dir, "duplicates", f"batch_{batch_id}")
        )
        # 4. exactly-once index growth: idempotent per-batch append +
        #    the marker ledger (marker last — everything above converges
        #    under replay, so the marker is pure work-skipping)
        append_to_dedup_index(catalog, name, accepted, batch_id=batch_id)
        with open(marker, "w") as fh:
            fh.write("done\n")

    (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_routed(spark: SparkSession, out_dir: str, route: str) -> DataFrame:
    """All batches' rows for a route ("accepted" | "duplicates")."""
    return spark.read.parquet(os.path.join(out_dir, route, "batch_*"))
