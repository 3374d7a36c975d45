"""Text-analysis operators over a documents table.

All pure column expressions (codegen'd, shuffle-free, scale linearly):
tokenization, language-ID heuristic, quality scoring, fingerprinting.
Ratios are single divisions of exact integers, so values are bit-identical
across engines (the DuckDB-oracle requirement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Tiny high-frequency English word list for the n-gram/stopword heuristic.
EN_STOPWORDS = [
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
]


def tokens(col: Column | str = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_stats(documents: DataFrame) -> DataFrame:
    """Token count (whitespace) + a BPE-ish subword count proxy: words are
    split at 4-char boundaries, the common "bytes-per-token ≈ 4" heuristic,
    computed as ceil(len(word)/4) summed — all integer math."""
    t = tokens()
    return documents.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.aggregate(
            t,
            F.lit(0).cast("bigint"),
            lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("bigint"),
        ).alias("n_subword_est"),
        F.length("text").alias("n_chars_measured"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: fraction of tokens that are high-frequency
    English words. Deterministic single division; threshold 0.05."""
    t = tokens()
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda w: F.array_contains(stop_arr, w)))
    ratio = n_stop.cast("double") / F.size(t).cast("double")
    return documents.select(
        "doc_id",
        "lang",
        n_stop.alias("n_stopwords"),
        F.size(t).alias("n_tokens"),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= 0.05, "en").otherwise("other").alias("lang_pred"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Length / punctuation / mean-word-length quality signals (the
    C4/Gopher-style filters), all exact-integer derived."""
    t = tokens()
    n_tok = F.size(t)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    mean_wl = (n_chars - n_tok + 1).cast("double") / n_tok.cast("double")
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        n_punct.alias("n_punct"),
        F.round(n_punct.cast("double") / n_chars.cast("double"), 6).alias(
            "punct_ratio"
        ),
        F.round(mean_wl, 6).alias("mean_word_len"),
        (
            n_tok.between(50, 100000)
            & (n_punct.cast("double") / n_chars.cast("double") < 0.1)
        ).alias("passes_quality"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (the content-defined dedup key; md5 is available in every engine)."""
    normalized = F.array_join(tokens(), " ")
    return documents.select(
        "doc_id", F.md5(normalized).alias("fingerprint")
    )


def hash_split(
    documents: DataFrame,
    id_col: str = "doc_id",
    test_pct: int = 20,
) -> DataFrame:
    """Deterministic train/test split by content-independent key hash —
    the reproducible doc-level holdout a training pipeline needs (no RNG
    state, stable across engines/runs/partitionings: md5 of the id, first
    two hex digits → bucket 0-255, test iff bucket < 256·pct/100).
    """
    nib = lambda i: F.expr(  # noqa: E731
        f"instr('0123456789abcdef', substring(md5(cast({id_col} as string)), {i}, 1)) - 1"
    )
    bucket = nib(1) * 16 + nib(2)
    threshold = 256 * test_pct // 100
    return documents.select(
        id_col,
        bucket.cast("int").alias("hash_bucket"),
        F.when(bucket < threshold, "test").otherwise("train").alias("split"),
    )


def winnow_fingerprints(
    documents: DataFrame, k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash
    every k-gram in position order, slide a window of ``w`` consecutive
    hashes, keep the min hash of each window, emit the distinct mins.

    Robust-to-edit dedup key: near-identical docs share most fingerprints.
    Implementation stays entirely in the array domain (per-row higher-order
    functions): gram hashes as an array, each window's min via
    ``array_min(slice(...))``, per-doc dedup via ``array_distinct`` — NO
    explode-then-window, therefore NO shuffle at all; the operator scales
    embarrassingly parallel with the scan. Docs with fewer than k+w-1
    tokens produce no full window and hence no fingerprints (strict
    winnowing; identical rule in the SQL oracle).
    """
    # Let-binding via single-element arrays: a column referenced inside a
    # higher-order-function lambda is RE-EVALUATED per element, so the token
    # array and the gram-hash array are bound as lambda variables (computed
    # once per row) rather than referenced as expressions.
    def _gram_hashes(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(k - 1), F.lit(0))),
            lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, k))),
        )

    def _window_mins(gh: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(gh) - F.lit(w - 1), F.lit(0))),
            lambda j: F.array_min(F.slice(gh, j, w)),
        )

    fps = F.array_distinct(
        F.flatten(
            F.transform(
                F.array(tokens()),
                lambda t: F.flatten(
                    F.transform(F.array(_gram_hashes(t)), _window_mins)
                ),
            )
        )
    )
    return documents.select("doc_id", F.explode(fps).alias("fp"))
