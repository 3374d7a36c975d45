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

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..extensions.dedup import dedup_apply, exact_dedup, minhash_lsh_star_edges
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

    # Stage counts are collected as the chain materializes. Stages with
    # TWO consumers (the next stage's build references them twice, e.g.
    # both sides of a dedup semi-join) are persisted and counted once —
    # that count doubles as the cache materialization. Stages consumed
    # by exactly ONE downstream subtree are NOT persisted or counted
    # separately: a CollectMetrics observation rides the subtree and the
    # count falls out of the next materialization's own full scan. The
    # observe trick is ONLY safe on single-reference, un-cached nodes
    # whose first covering action scans every partition — a node
    # referenced twice in one plan (or raced into a cache) would
    # double-count, and a limit-style action would under-count. Building
    # the funnel as one lazy 8-branch union instead measured ~2× slower
    # (branches racing to fill the same cache partitions), so this
    # persist-or-observe split is the minimum-barrier layout.
    counts: list[tuple[int, str, int]] = []
    live: list[DataFrame] = []

    def stage(idx: int, name: str, df: DataFrame) -> int:
        n = df.count()
        counts.append((idx, name, n))
        return n

    def persist_stage(idx: int, name: str, df: DataFrame) -> DataFrame:
        df = df.persist()
        live.append(df)
        stage(idx, name, df)  # the count doubles as cache materialization
        return df

    # stage 1 (raw): observed on the scan — the quality stage's single
    # pass over documents produces the raw count for free
    obs_raw = Observation()
    documents_obs = documents.observe(
        obs_raw, F.count(F.lit(1)).alias("n_rows")
    )

    # quality gate is a pure projection → filter INLINE (passthrough
    # columns) instead of computing the id set and semi-joining back;
    # the join was a gratuitous corpus shuffle at any scale
    quality_docs = persist_stage(
        2,
        "quality_gate",
        quality_gate(documents_obs, passthrough=True)
        .filter(F.col("passes_all"))
        .select(*documents.columns),
    )
    counts.insert(0, (1, "raw", int(obs_raw.get["n_rows"])))

    # exact dedup: keep the min doc_id per content fingerprint
    keep_exact = exact_dedup(quality_docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    exact_docs = persist_stage(
        3, "exact_dedup", quality_docs.join(keep_exact, "doc_id", "left_semi")
    )

    # near-dup removal: banded MinHash candidates → cluster reps
    # survive. Star edges, not pairs: the funnel only needs the cluster
    # partition, and star edges stay ≤ n_bands·N on boilerplate-heavy
    # corpora where the pair graph is Σ|bucket|² (same components, same
    # survivors — the funnel oracle hash-match is unchanged).
    survivors = dedup_apply(exact_docs, minhash_lsh_star_edges(exact_docs))
    neardup_docs = persist_stage(
        4,
        "near_dedup",
        exact_docs.join(survivors.select("doc_id"), "doc_id", "left_semi"),
    )

    # stages 5 and 6 each have exactly ONE downstream consumer, so their
    # counts ride observations fired by the packed materialization below
    # (neither is persisted — each is computed exactly once, inside the
    # chain that needs it anyway)
    clean_ids = (
        decontaminate(neardup_docs, benchmark)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    obs_clean = Observation()
    clean_docs = neardup_docs.join(clean_ids, "doc_id", "left_semi").observe(
        obs_clean, F.count(F.lit(1)).alias("n_rows")
    )

    obs_mixed = Observation()
    mixed = mixture_sample(
        clean_docs, mixture_rates, domain_col="lang"
    ).observe(obs_mixed, F.count(F.lit(1)).alias("n_rows"))

    # pack_chunks is row-preserving (one output row per chunk), so the
    # packed table doubles as the chunk count — one persisted
    # materialization serves stages 5, 6, 7 AND 8
    chunks = chunk_documents(mixed, chunk_tokens=chunk_tokens, stride=stride)
    packed = pack_chunks(chunks, token_budget=token_budget).persist()
    live.append(packed)
    n7 = packed.count()
    counts.append((5, "decontaminated", int(obs_clean.get["n_rows"])))
    counts.append((6, "mixture", int(obs_mixed.get["n_rows"])))
    counts.append((7, "chunks", n7))
    stage(8, "packed_bins", packed.select("bucket", "bin_id").distinct())

    for df in live:
        df.unpersist()
    spark = documents.sparkSession
    counts.sort()
    return spark.createDataFrame(
        counts, "stage_idx int, stage string, n_rows bigint"
    )
