"""End-to-end pretraining-corpus pipeline: the composition proof.

Every stage is an existing oracle-verified operator; this plan chains
them the way a production data pipeline would — filter, dedup,
decontaminate, rebalance, chunk, pack — and emits a per-stage funnel
(stage, rows surviving) so rejection rates are auditable.

Scale shape: each stage is the operator's own documented plan; the
chain adds no new shuffles beyond the per-stage ones. Intermediate
survivor id-sets are key-only projections (never the text payload) and
persist between their two consumers (the stage count and the next
stage's semi-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extensions.dedup import dedup_apply, exact_dedup, minhash_lsh_pairs
from ..extensions.mixture import mixture_sample
from ..extensions.text import chunk_documents, decontaminate, pack_chunks, quality_gate


def pretrain_corpus_funnel(
    documents: DataFrame,
    benchmark: DataFrame,
    mixture_rates: dict[str, float] | None = None,
    chunk_tokens: int = 50,
    stride: int = 25,
    token_budget: int = 512,
) -> DataFrame:
    """Run the full corpus-preparation chain and return the stage funnel
    ``(stage_idx, stage, n_rows)``:

    raw → quality gate → exact dedup → near-dup removal (MinHash LSH +
    connected components) → benchmark decontamination → mixture
    rebalancing → chunking → packed bins.
    """
    mixture_rates = mixture_rates or {"en": 0.5}

    # Stage counts are collected as the chain materializes: each
    # intermediate is persisted, counted ONCE (that count is also its
    # cache materialization), consumed by the next stage, then dropped.
    # Building the funnel as one lazy 8-branch union instead measured ~2×
    # slower: branches racing to fill the same cache partitions recompute
    # work, and the fused plan's codegen is itself multi-second.
    counts: list[tuple[int, str, int]] = []
    live: list[DataFrame] = []

    def stage(idx: int, name: str, df: DataFrame) -> int:
        n = df.count()
        counts.append((idx, name, n))
        return n

    stage(1, "raw", documents)

    def persist_stage(idx: int, name: str, df: DataFrame) -> DataFrame:
        df = df.persist()
        live.append(df)
        stage(idx, name, df)  # the count doubles as cache materialization
        return df

    # quality gate is a pure projection → filter INLINE (passthrough
    # columns) instead of computing the id set and semi-joining back;
    # the join was a gratuitous corpus shuffle at any scale
    quality_docs = persist_stage(
        2,
        "quality_gate",
        quality_gate(documents, passthrough=True)
        .filter(F.col("passes_all"))
        .select(*documents.columns),
    )

    # exact dedup: keep the min doc_id per content fingerprint
    keep_exact = exact_dedup(quality_docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    exact_docs = persist_stage(
        3, "exact_dedup", quality_docs.join(keep_exact, "doc_id", "left_semi")
    )

    # near-dup removal: banded MinHash candidates → cluster reps survive
    survivors = dedup_apply(exact_docs, minhash_lsh_pairs(exact_docs))
    neardup_docs = persist_stage(
        4,
        "near_dedup",
        exact_docs.join(survivors.select("doc_id"), "doc_id", "left_semi"),
    )

    clean_ids = (
        decontaminate(neardup_docs, benchmark)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    clean_docs = persist_stage(
        5, "decontaminated", neardup_docs.join(clean_ids, "doc_id", "left_semi")
    )

    mixed = persist_stage(
        6, "mixture", mixture_sample(clean_docs, mixture_rates, domain_col="lang")
    )

    # pack_chunks is row-preserving (one output row per chunk), so the
    # packed table doubles as the chunk count — one persisted
    # materialization serves stages 7 AND 8 instead of two
    chunks = chunk_documents(mixed, chunk_tokens=chunk_tokens, stride=stride)
    packed = persist_stage(7, "chunks", pack_chunks(chunks, token_budget=token_budget))
    stage(8, "packed_bins", packed.select("bucket", "bin_id").distinct())

    for df in live:
        df.unpersist()
    spark = documents.sparkSession
    return spark.createDataFrame(
        counts, "stage_idx int, stage string, n_rows bigint"
    )
