"""Byte-pair-encoding tokenizer: distributed merge training + codegen
encode.

The train step is the classic BPE loop (Sennrich et al. 2016, public
algorithm): represent each distinct word as a space-separated symbol
sequence, repeatedly find the corpus-frequency-weighted most frequent
adjacent symbol pair, fuse it, repeat. Like k-means, it is an iterative
fixpoint the driver must sequence — but each iteration is fully
distributed (one explode+groupBy over the *distinct-word* table, which is
vocabulary-sized, not corpus-sized) and only the single argmax row ever
reaches the driver.

The encode step is pure column expressions: one ``regexp_replace`` per
learned merge, chained — codegen'd, shuffle-free, linear in corpus size.

Engine-portable merge semantics (no regex lookarounds, so the same
expression runs on RE2-based engines like DuckDB): symbol sequences are
rendered with DOUBLE-space separators and a double-space border. Every
symbol is then flanked by two spaces, so the pattern ``" a  b "`` (one
space consumed on each side) leaves one space on each side after every
non-overlapping left-to-right match — adjacent occurrences never steal
each other's separator, and greedy left-to-right matching is exactly the
standard BPE merge order.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: Merges used by the static-vocabulary encode query (common English
#: letter pairs) — fixed so the encode is expressible as the same chain
#: of replaces in any SQL engine.
FIXED_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("an", "d"), ("o", "n"), ("r", "e"), ("a", "t"), ("s", "t"),
]


def _spaced_symbols(word: Column) -> Column:
    """Render a word as its double-space-separated character sequence with
    a double-space border: "low" → "  l  o  w  ".

    Implemented as a single regexp_replace (each char → " char ", so
    adjacent chars share a double space and the borders pick up the
    outer concat spaces) — the identical expression runs on RE2-based
    engines (DuckDB oracle uses ``\\1`` in place of ``$1``)."""
    return F.concat(
        F.lit(" "), F.regexp_replace(word, "(.)", " $1 "), F.lit(" ")
    )


def _merge_pattern(left: str, right: str) -> str:
    return " " + re.escape(left) + "  " + re.escape(right) + " "


def _merge_replacement(left: str, right: str) -> str:
    # Java replacement strings treat \ and $ specially (Matcher rules).
    fused = (left + right).replace("\\", "\\\\").replace("$", "\\$")
    return " " + fused + " "


def apply_merges(
    seq: Column, merges: list[tuple[str, str]]
) -> Column:
    """Apply a learned merge list, in order, to a double-spaced symbol
    sequence — one codegen'd regexp_replace per merge."""
    out = seq
    for left, right in merges:
        out = F.regexp_replace(
            out, _merge_pattern(left, right), _merge_replacement(left, right)
        )
    return out


def word_symbol_counts(documents: DataFrame) -> DataFrame:
    """Distinct-word frequency table with initial character-split symbol
    sequences — the training working set (vocabulary-sized)."""
    from .fanout import fan_out_small_scan

    return (
        fan_out_small_scan(documents)
        .select(F.explode(tokens()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", _spaced_symbols(F.col("word")))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol-pair frequencies, weighted by word frequency.

    The symbol array is let-bound (single-element-array transform) so the
    split runs once per word — a bare split expression inside the pair
    lambda would re-split per element (O(symbols²) per word)."""
    pairs = F.transform(
        F.array(F.split(F.trim("syms"), "  ")),
        lambda sa: F.when(
            F.size(sa) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(sa) - 1),
                lambda i: F.struct(
                    F.element_at(sa, i).alias("left"),
                    F.element_at(sa, i + 1).alias("right"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<left:string,right:string>>")),
    )[0]
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .groupBy("p.left", "p.right")
        .agg(F.sum("freq").cast("bigint").alias("pair_freq"))
    )


def bpe_train(
    documents: DataFrame, n_merges: int = 10
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges, final_words): merges as ``(left, right, pair_freq)``
    in learned order (ties broken lexicographically for determinism), and
    the final distinct-word table with fully merged symbol sequences.

    Driver involvement per iteration: ONE row (the argmax pair). The
    vocabulary table is cached ONCE; each iteration re-derives the
    current symbol state by chaining the learned merges as codegen
    regexes over that cached table — k chained regexes over a
    vocabulary-sized table beat k persist+materialize jobs for any
    practical merge count (at very large k, checkpoint the chain every
    ~64 merges to bound expression depth).
    """
    base = word_symbol_counts(documents).persist()
    base.count()  # materialize once; every iteration reuses this table
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        current = base.withColumn(
            "syms",
            apply_merges(F.col("syms"), [(l, r) for l, r, _ in merges]),
        )
        top = (
            _pair_counts(current)
            .orderBy(F.col("pair_freq").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, freq = top[0]["left"], top[0]["right"], top[0]["pair_freq"]
        merges.append((left, right, int(freq)))
    words = base.withColumn(
        "syms", apply_merges(F.col("syms"), [(l, r) for l, r, _ in merges])
    ).persist()
    words.count()  # materialize BEFORE dropping base: consuming the
    # returned final_words hits this cache, never a corpus recompute
    base.unpersist()
    # words stays persisted for the caller (vocabulary-sized); callers
    # done with it release it via final_words.unpersist()
    return merges, words


#: Word-boundary marker symbol: rides the symbol stream like any other
#: symbol (so the double-space invariant holds) but appears in no merge
#: rule, so merges can never fuse across a word boundary.
WORD_MARKER = "¤"  # ¤


def encode_with_merges(
    documents: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Encode documents with a (trained or fixed) merge list. Pure
    projection: no shuffle, no Python.

    The merges run over the WHOLE document in one regex pass per merge —
    words are joined with :data:`WORD_MARKER` before the char split, so
    the marker is itself a symbol that no merge rule touches and merges
    cannot cross word boundaries. One long-string regex per (doc, merge)
    beats one short-string regex per (word, merge) by the per-invocation
    matcher overhead (~|doc|/|word| fewer invocations).

    The marker character is stripped from the WHOLE text before
    tokenization: ``tokens()`` splits on whitespace only, so input text
    containing the marker would otherwise make word boundaries ambiguous
    (the ``n_markers`` subtraction would undercount and merges could
    conceptually cross a boundary). Stripping pre-split is equivalent to
    stripping per token (the marker is not whitespace, so removal never
    merges or splits tokens) and costs ONE codegen regex pass over the
    text — a per-token strip inside a higher-order-function lambda runs
    interpreted per element (measured 15× slower at sf0.1).
    """
    t = tokens(F.regexp_replace(F.col("text"), WORD_MARKER, ""))
    doc_syms = F.trim(
        apply_merges(_spaced_symbols(F.array_join(t, WORD_MARKER)), merges)
    )
    # symbols (incl. one marker per word gap) are "  "-separated
    n_with_markers = F.when(doc_syms == "", F.lit(0)).otherwise(
        F.size(F.split(doc_syms, "  "))
    )
    n_markers = F.when(F.size(t) > 0, F.size(t) - 1).otherwise(F.lit(0))
    rendered = F.regexp_replace(doc_syms, f"  {WORD_MARKER}  ", " | ")
    return documents.select(
        "doc_id",
        (n_with_markers - n_markers).cast("bigint").alias("n_bpe_tokens"),
        F.substring(rendered, 1, 80).alias("encoded_prefix"),
    )


def encode_with_merges_by_vocab(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    prefix_words: int = 40,
) -> DataFrame:
    """Output-identical alternative to :func:`encode_with_merges` that
    runs the merge chain over the DISTINCT-WORD table instead of every
    document: tokenize once, encode each vocabulary entry (Heaps'-law
    sized — grows far slower than the corpus), join token counts back,
    and rebuild the 80-char rendered prefix from the first
    ``prefix_words`` words only (each word contributes ≥4 rendered
    chars, so 40 words always cover 80 — or the document ends first).

    Merge-per-word equals merge-per-document because no merge rule
    contains :data:`WORD_MARKER`, so a pair can never span a word
    boundary — the same invariant the whole-document chain relies on.

    Trade-off (measured at sf0.1 and 10×, BENCH_sf1.json round 4): for
    the FULL output the chain wins outright (0.75s vs 5.5s at 10× —
    rebuilding the ordered prefix costs a posexplode + struct
    collect_list that dwarfs the saved regex work) and its 10× slope is
    1.2, so the chain stays the registered default. This variant wins
    only when the consumer needs TOKEN COUNTS alone (packing, budget
    accounting): Catalyst prunes the prefix aggregate away and the merge
    regex runs over vocabulary chars instead of corpus chars — 1.2s vs
    2.7s at 10×, and flatter with scale by Heaps' law. It also adds two
    corpus-token shuffles (vocabulary group-by + word join, stop-word
    skew handled by AQE) where the chain is a shuffle-free projection."""
    w = documents.select(
        "doc_id",
        F.posexplode(
            tokens(F.regexp_replace(F.col("text"), WORD_MARKER, ""))
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")
    enc = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "word",
            F.trim(
                apply_merges(_spaced_symbols(F.col("word")), merges)
            ).alias("enc"),
        )
        .withColumn("n_toks", F.size(F.split("enc", "  ")))
    )
    per_doc = (
        w.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_toks").cast("bigint").alias("n_bpe_tokens"),
            F.substring(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("pos") < prefix_words,
                                    F.struct("pos", "enc"),
                                )
                            )
                        ),
                        lambda s: s["enc"],
                    ),
                    " | ",
                ),
                1,
                80,
            ).alias("encoded_prefix"),
        )
    )
    # NULL text propagates NULL outputs (the chain's behavior: every
    # expression over a NULL column is NULL); token-less non-NULL text
    # yields (0, "").
    return (
        documents.select("doc_id", F.col("text").isNull().alias("_tnull"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_tnull"), F.lit(None).cast("bigint"))
            .otherwise(F.coalesce("n_bpe_tokens", F.lit(0)))
            .alias("n_bpe_tokens"),
            F.when(F.col("_tnull"), F.lit(None).cast("string"))
            .otherwise(F.coalesce("encoded_prefix", F.lit("")))
            .alias("encoded_prefix"),
        )
    )
