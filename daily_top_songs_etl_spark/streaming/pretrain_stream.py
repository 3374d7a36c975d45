"""Streaming corpus ingest: the pretrain funnel as an incremental
micro-batch pipeline.

`plans/pretrain.py` prepares a STATIC corpus. A production ingest never
sees the whole corpus at once — documents land continuously, and each
batch must be gated, deduplicated against everything already accepted,
decontaminated, and appended, without recomputing history. This module
composes the engine's incremental pieces into that funnel, per
micro-batch:

1. **quality gate** — inline passthrough filter (pure projection);
2. **within-batch dedup** — star-edge LSH clustering (linear even on
   boilerplate-heavy batches) → one representative per cluster;
3. **dedup vs history** — probe the PERSISTED signature index
   (batch-sized shingle work; corpus text never re-read);
4. **benchmark decontamination** — broadcast eval-gram match;
5. **append** — accepted docs land in the corpus table and their
   signatures fold into the dedup index, BOTH via
   ``catalog.append_once`` keyed by batch_id, so a replayed batch
   converges to one copy of its rows; per-batch funnel counts are
   recorded keyed by batch_id (the reader keeps the last line per id).

Replay safety: foreachBatch is at-least-once; the marker ledger
short-circuits fully-processed batch ids, the history match excludes
the batch's own doc_ids (a replay that crashed after the index append
but before the marker must not self-match), and the per-batch
idempotent appends close the marker-vs-append window — growth is
exactly-once, not merely "narrowed" at-least-once.

Every per-batch stage cost is batch-sized except the stored-signature
scan (~0.3% of corpus bytes, partition-prunable via
``build_dedup_index(probe_partitions=...)``) — the property that makes
the funnel viable at 100 TB: ingesting a batch costs O(batch), not
O(corpus).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.dedup import (
    append_to_dedup_index,
    dedup_apply,
    match_against_dedup_index,
    minhash_lsh_star_edges,
)
from ..extensions.text import decontaminate, quality_gate


def run_pretrain_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    landing_schema,
    catalog,
    index_name: str,
    corpus_table: str,
    benchmark: DataFrame,
    checkpoint_dir: str,
    state_dir: str,
    min_est: float = 0.5,
) -> None:
    """Drain all landed document files through the incremental funnel;
    blocks until drained. ``benchmark`` is the eval set to decontaminate
    against (tiny — broadcast). Per-batch stage counts append to
    ``state_dir/funnel_counts.jsonl``."""
    marker_dir = os.path.join(state_dir, "_processed")
    os.makedirs(marker_dir, exist_ok=True)
    bench = benchmark.localCheckpoint(eager=True)

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
            return  # replayed batch: corpus + index already carry it
        batch_df = batch_df.localCheckpoint(eager=True)
        n_raw = batch_df.count()
        # 1. quality gate: inline filter, no shuffle
        gated = (
            quality_gate(batch_df, passthrough=True)
            .filter(F.col("passes_all"))
            .select(*batch_df.columns)
        )
        # 2. within-batch dedup (star edges: linear on boilerplate)
        keep = dedup_apply(
            gated.select("doc_id"), minhash_lsh_star_edges(gated)
        ).select("doc_id")
        batch_unique = gated.join(keep, "doc_id")
        # 3. dedup vs everything already accepted (minus the batch's own
        #    ids — a crash-replay that already appended this batch's
        #    signatures must not self-match)
        hist_hits = (
            match_against_dedup_index(catalog, index_name, batch_unique)
            .filter(F.col("est_jaccard") >= min_est)
            .join(
                batch_df.select(F.col("doc_id").alias("corpus_doc_id")),
                "corpus_doc_id",
                "left_anti",
            )
            .select(F.col("batch_doc_id").alias("doc_id"))
            .distinct()
        )
        fresh = batch_unique.join(hist_hits, "doc_id", "left_anti")
        # 4. benchmark decontamination (broadcast eval grams)
        contaminated = (
            decontaminate(fresh, bench)
            .filter(F.col("contaminated"))
            .select("doc_id")
        )
        accepted = fresh.join(
            contaminated, "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        n_accepted = accepted.count()
        # 5. exactly-once growth: both appends are idempotent per batch
        #    id (append_once), so even a replay that raced past the
        #    marker cannot double corpus or signature rows
        if n_accepted:
            catalog.append_once(accepted, corpus_table, batch_id)
            append_to_dedup_index(
                catalog, index_name, accepted, batch_id=batch_id
            )
        counts = {
            "batch_id": batch_id,
            "raw": n_raw,
            "quality": gated.count(),
            "batch_unique": batch_unique.count(),
            "fresh_vs_history": fresh.count(),
            "accepted": n_accepted,
        }
        with open(os.path.join(state_dir, "funnel_counts.jsonl"), "a") as fh:
            fh.write(json.dumps(counts) + "\n")
        with open(marker, "w") as fh:
            fh.write("done\n")

    (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_funnel_counts(state_dir: str) -> list[dict]:
    """Per-batch funnel counts; a replay that crashed between the counts
    line and the marker re-appends its line, so keep the LAST line per
    batch_id (both lines carry identical counts — the replay recomputes
    the same batch)."""
    path = os.path.join(state_dir, "funnel_counts.jsonl")
    if not os.path.exists(path):
        return []
    by_id: dict = {}
    with open(path) as fh:
        for line in fh:
            if line.strip():
                row = json.loads(line)
                by_id[row["batch_id"]] = row
    return [by_id[k] for k in sorted(by_id)]
