"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

All engine-portable by construction: hashing is md5 (present in Spark,
DuckDB, Postgres, Trino), min-hashing exploits lexicographic MIN over hex
digests, and similarity ratios are single divisions of exact integers.

Scale design (the 100 TB story):

- exact:   one hash-partitioned groupBy on the fingerprint — the minimum
           possible shuffle (key = 16-byte digest, combiner-friendly).
- MinHash: shingle explode → per-doc signature agg (map-side combinable
           MIN) → band join. The band join is the only pairwise step and
           only compares documents sharing a band bucket — candidate count
           scales with true-duplicate density, not |docs|².
- Jaccard: restricted to LSH candidates (or a shingle-share semi-join at
           small scale); never all-pairs.
- SimHash: pure per-row column math; near-dup lookup = band the bit-vector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .text import tokens

SHINGLE_N = 3
N_HASHES = 8
BAND_SIZE = 2  # 8 hashes -> 4 bands of 2: ~near-dup-friendly thresholds


def shingles(col: Column | str = "text", n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles per document (array column).

    Guarded for short documents: Spark's ``sequence(1, 0)`` produces a
    *descending* [1, 0], not an empty array, so size < n is special-cased.

    The token array is let-bound as a lambda variable (single-element-array
    trick): referencing the tokenizer expression directly inside the
    n-gram lambda would re-run the whole split per shingle — O(doc²).
    """

    def _grams(t: Column) -> Column:
        gram = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            )
        )
        return F.when(F.size(t) >= n, gram).otherwise(
            F.array().cast("array<string>")
        )

    return F.flatten(F.transform(F.array(tokens(col)), _grams))


def exact_dedup(documents: DataFrame, keep: str = "min") -> DataFrame:
    """Exact dedup on normalized-content fingerprint: one survivor per
    fingerprint (lowest doc_id — deterministic), plus the group size."""
    normalized = F.array_join(tokens(), " ")
    agg = F.min if keep == "min" else F.max
    return (
        documents.select("doc_id", F.md5(normalized).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            agg("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingled(documents: DataFrame) -> DataFrame:
    # Every consumer aggregates/joins after the explode (a shuffle is
    # already in the plan), so widening an under-partitioned scan first
    # costs nothing at scale and parallelizes the tokenize+shingle CPU
    # at small file counts.
    from .fanout import fan_out_small_scan

    return fan_out_small_scan(documents).select(
        "doc_id", F.explode(shingles()).alias("shingle")
    )


def _dominant_units(units: DataFrame, documents: DataFrame, unit_col: str,
                    max_df_ratio: float | None,
                    top_k: int | None) -> DataFrame:
    """The corpus-dominant (boilerplate) unit set over a distinct
    (doc_id, unit) relation: units present in more than ``max_df_ratio``
    of all documents, unioned with the ``top_k`` by document frequency
    (ties broken by the unit string — deterministic in any engine).
    Returns a single-column DataFrame of the dominant units.

    Plan shape: one map-side-combinable groupBy over the unit stream
    (bounded by vocabulary size, not corpus size); the ratio rule joins
    a broadcast one-row count; the top-k rule compiles to
    TakeOrderedAndProject (per-partition k rows, no full sort). The
    result is boilerplate vocabulary — tiny by definition — so every
    consumer broadcasts it."""
    df_rel = units.groupBy(unit_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    out = None
    if max_df_ratio is not None:
        n_docs = documents.agg(
            F.count(F.lit(1)).cast("bigint").alias("__nd")
        )
        out = (
            df_rel.crossJoin(F.broadcast(n_docs))
            .filter(
                F.col("df")
                > F.col("__nd").cast("double") * F.lit(float(max_df_ratio))
            )
            .select(unit_col)
        )
    if top_k is not None:
        topk = (
            df_rel.orderBy(F.col("df").desc(), F.col(unit_col).asc())
            .limit(int(top_k))
            .select(unit_col)
        )
        out = topk if out is None else out.union(topk).distinct()
    if out is None:
        raise ValueError("pass max_df_ratio and/or top_k")
    return out


def dominant_shingles(documents: DataFrame,
                      max_df_ratio: float | None = None,
                      top_k: int | None = None) -> DataFrame:
    """Corpus-dominant shingles — the boilerplate set the strip
    pre-pass removes before pair generation. On a boilerplate-heavy
    crawl these are the near-universal header/footer/license shingles
    that make every document a near-duplicate of every other and blow
    exact pair enumeration up to Θ(n²) (the round-7 hot-shape finding:
    4 shingles in 90% of docs made the naive pair oracle spill 79 GB);
    stripping them first restores near-dup density — and pair cost —
    to the content signal. C4/CCNet strip boilerplate by line; this
    corpus has no line structure, so the shingle (and token) domain is
    the unit."""
    return _dominant_units(
        _shingled(documents), documents, "shingle", max_df_ratio, top_k
    )


def dominant_tokens(documents: DataFrame,
                    max_df_ratio: float | None = None,
                    top_k: int | None = None) -> DataFrame:
    """Corpus-dominant tokens — the token-domain analogue of
    :func:`dominant_shingles` for consumers that fingerprint tokens,
    not shingles (:func:`simhash`)."""
    toks = documents.select(
        "doc_id", F.explode(F.array_distinct(tokens())).alias("token")
    )
    return _dominant_units(toks, documents, "token", max_df_ratio, top_k)


def _shingled_stripped(documents: DataFrame,
                       max_df_ratio: float | None,
                       top_k: int | None,
                       hot: DataFrame | None = None) -> DataFrame:
    """The (doc_id, shingle) stream with dominant shingles removed —
    the composable pre-pass every pair generator threads through its
    ``max_df_ratio``/``top_k`` knobs. Identity when both are None.
    ``hot`` overrides the dominant set (cross-corpus consumers like
    :func:`fuzzy_decontaminate` must strip BOTH sides with the SAME
    set or their signatures stop being comparable).

    The dominant set is recomputed from the stream's own lineage (a
    second tokenize pass) rather than checkpointing the exploded
    shingle stream: at 100 TB re-running the CPU is cheaper than
    materializing the full (doc, shingle) explosion, and the df
    aggregation itself collapses map-side to vocabulary size."""
    sh = _shingled(documents)
    if hot is None:
        if max_df_ratio is None and top_k is None:
            return sh
        hot = _dominant_units(sh, documents, "shingle", max_df_ratio, top_k)
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


def strip_boilerplate_stats(documents: DataFrame,
                            max_df_ratio: float | None = None,
                            top_k: int | None = None) -> DataFrame:
    """Per-document effect of the boilerplate strip: how many distinct
    shingles the document has, how many survive, how many were
    corpus-dominant. The registered face of the strip pre-pass — the
    per-doc accounting a pipeline uses to audit how much of each
    document was boilerplate before committing to a stripped dedup
    run. Docs with fewer than SHINGLE_N tokens have no shingles and
    are absent (consistent with every shingle consumer)."""
    sh = _shingled(documents)
    hot = _dominant_units(sh, documents, "shingle", max_df_ratio, top_k)
    flagged = sh.join(
        F.broadcast(hot.withColumn("__hot", F.lit(1))), "shingle", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(F.when(F.col("__hot").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("__hot").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_stripped"),
    )


def duplicated_span_stats(documents: DataFrame) -> DataFrame:
    """Per-document duplicated-span fraction — the corpus-level
    exact-substring-dedup signal (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL'22, §3: spans occurring in
    more than one document are cut): for each doc, how many of its
    distinct shingles occur in at least one OTHER document, and the
    ratio. Pipelines threshold the ratio to route docs to span-cutting.

    Scale shape: O(corpus shingles), never O(pairs) — a groupBy on the
    8-byte shingle hash counts distinct docs per shingle (two-phase agg),
    joins back on the same hash key (exchange reuse: both sides are
    already partitioned by ``sh``), and re-aggregates per doc. Docs with
    fewer than 3 tokens have no shingles and produce no row (strict —
    same rule as the SQL oracle).
    """
    keyed = _shingled(documents).select(
        "doc_id", F.xxhash64("shingle").alias("sh")
    )
    freq = keyed.groupBy("sh").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    shared = (F.col("n_docs") >= 2).cast("int")
    return (
        keyed.join(freq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(shared).cast("bigint").alias("n_shared_spans"),
            F.round(
                F.sum(shared).cast("double") / F.count(F.lit(1)), 6
            ).alias("shared_ratio"),
        )
    )


def minhash_signatures(documents: DataFrame, n_hashes: int = N_HASHES,
                       max_df_ratio: float | None = None,
                       top_k: int | None = None,
                       hot: DataFrame | None = None) -> DataFrame:
    """MinHash signature per document.

    Hash family i = md5(i || ' ' || shingle); the signature component is the
    lexicographic MIN hex digest — a valid min-wise permutation family and
    exactly reproducible in any engine with md5 + string MIN. The agg is a
    plain groupBy MIN: map-side partials keep the shuffle tiny.

    ``max_df_ratio``/``top_k`` apply the boilerplate strip pre-pass
    (:func:`dominant_shingles`) before signing, so signatures measure
    content similarity, not shared boilerplate.
    """
    sh = _shingled_stripped(documents, max_df_ratio, top_k, hot)
    aggs = [
        F.min(F.md5(F.concat_ws(" ", F.lit(str(i)), F.col("shingle")))).alias(
            f"mh_{i}"
        )
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_rel(sig: DataFrame, n_bands: int, band_size: int) -> DataFrame:
    """(doc_id, bucket) band relation from a signature relation. The
    band id is folded into one 8-byte xxhash64 bucket key, so band
    joins shuffle on a single bigint instead of (int, 32-char md5).
    Bucket equality ⟺ full-band signature equality (modulo 2⁻⁶⁴
    collisions); the emitted pair set is identical to the md5-bucket
    formulation the DuckDB oracles use."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.col(f"mh_{b * band_size + j}")
                            for j in range(band_size)
                        ],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    max_df_ratio: float | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs agreeing on any full band of signature
    components. Returns (doc_id_a < doc_id_b, n_shared_bands).
    ``max_df_ratio``/``top_k`` strip boilerplate shingles before
    signing."""
    # Checkpoint the signatures: the band relation feeds BOTH sides of the
    # candidate self-join, which would otherwise recompute the whole
    # shingle-explode aggregation twice.
    sig = minhash_signatures(
        documents, n_hashes, max_df_ratio, top_k
    ).localCheckpoint(eager=False)
    n_bands = n_hashes // band_size
    bands = _band_rel(sig, n_bands, band_size)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def minhash_lsh_star_edges(
    documents: DataFrame,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Star-shaped LSH candidate edges: per band bucket, every member
    connects to the bucket's MINIMUM doc_id instead of to every other
    member. The transitive closure is IDENTICAL to the full pair graph
    (within a bucket all members reach each other through the bucket
    rep; across buckets shared docs chain components exactly as pairs
    do), so connected components — and therefore ``dedup_apply``'s
    survivor set — are bit-identical.

    This is the UNCONDITIONALLY linear formulation: ≤ n_bands·N edges
    regardless of duplicate density, where the pair graph degenerates to
    Σ|bucket|² (100 identical docs → 99 star edges vs 4 950 pairs; a
    boilerplate-heavy crawl at 100 TB makes that difference the job).
    Use :func:`minhash_lsh_pairs` only when the PAIRS themselves are the
    product (similarity reporting); use this for clustering/dedup."""
    sig = minhash_signatures(documents, n_hashes).localCheckpoint(eager=False)
    n_bands = n_hashes // band_size
    bands = _band_rel(sig, n_bands, band_size)
    reps = bands.groupBy("bucket").agg(F.min("doc_id").alias("rep"))
    return (
        bands.join(reps, "bucket")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(
            F.col("rep").alias("doc_id_a"), F.col("doc_id").alias("doc_id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame, min_jaccard: float = 0.2,
    max_df_ratio: float | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle (a semi-join
    pre-filter; at scale, feed LSH candidates instead of the shingle join).

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) — exact ints, one division.

    The self-join key is xxhash64(shingle) (8 bytes) rather than the raw
    shingle string — same matches modulo 2⁻⁶⁴ collisions, much smaller
    shuffle.

    ``max_df_ratio``/``top_k`` apply the boilerplate strip pre-pass
    before pair generation: sizes and intersections are computed over
    the STRIPPED shingle sets, so the jaccard is content similarity.
    On boilerplate-heavy corpora the strip is also what keeps the
    shared-shingle self-join from degenerating to Θ(n²) on the
    near-universal shingles (round-7 hot-shape finding).
    """
    sh = _shingled_stripped(documents, max_df_ratio, top_k).select(
        "doc_id", F.xxhash64("shingle").alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_shingles").alias("size_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("n_common")
    ).cast("double")
    return (
        inter.join(F.broadcast(sa), "doc_id_a")
        .join(F.broadcast(sb), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_common",
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def lsh_recall_stats(
    documents: DataFrame,
    min_jaccard: float = 0.2,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    sample_mod: int = 1,
) -> DataFrame:
    """Banding-quality eval: how much of the exact-Jaccard ground truth
    do the MinHash-LSH candidate pairs recover? Returns ONE row
    (n_true, n_candidates, n_hit): true pairs at the threshold, distinct
    band-bucket candidate pairs, and their intersection — recall =
    n_hit/n_true, precision headroom = n_hit/n_candidates, both
    derivable from the exact integers. This is the measurement that
    justifies a (n_hashes, band_size) choice before a production dedup
    run; the standard S-curve math says P(candidate) = 1−(1−j^r)^b, and
    this query checks the REAL corpus against it.

    Ground truth requires the exact all-pairs computation
    (:func:`ngram_jaccard_pairs`), which is quadratic in popular-shingle
    frequency — by nature this is an EVAL operator: at 100 TB you run it
    on a uniform document SAMPLE (recall estimates concentrate fast) and
    apply the chosen banding corpus-wide. ``sample_mod`` IS that sample,
    in code: both sides run on the deterministic slice
    ``doc_id % sample_mod == 0`` (a pair of sampled docs is a band
    candidate iff it shares a band bucket — independent of other docs —
    so banding only the sample yields the identical candidate set on
    sample pairs), and ``n_sample_docs`` rides in the output row so the
    measurement records its own scope. The default 1 is the whole
    corpus (eval-rig scale only). Both pair relations are pair-bounded
    and referenced twice (own count + intersection), so each is eagerly
    checkpointed.
    """
    if sample_mod > 1:
        documents = documents.filter(F.col("doc_id") % sample_mod == 0)
    n_sample = documents.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample_docs")
    )
    true_pairs = (
        ngram_jaccard_pairs(documents, min_jaccard)
        .select("doc_id_a", "doc_id_b")
        .localCheckpoint(eager=True)
    )
    cand = (
        minhash_lsh_pairs(documents, n_hashes, band_size)
        .select("doc_id_a", "doc_id_b")
        .localCheckpoint(eager=True)
    )
    hit = true_pairs.join(cand, ["doc_id_a", "doc_id_b"], "left_semi")
    n_true = true_pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    n_cand = cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    n_hit = hit.agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    return (
        n_true.crossJoin(n_cand).crossJoin(n_hit).crossJoin(n_sample)
    )


def ngram_containment_pairs(
    documents: DataFrame, min_containment: float = 0.5,
    max_df_ratio: float | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Asymmetric containment dedup (Broder's resemblance companion):
    containment(A→B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|.
    Catches the pair class Jaccard misses — a short document swallowed
    whole by a much longer one (boilerplate page + article, quoted post
    + thread), where the union term drowns the overlap. A pair is
    emitted when EITHER direction clears the threshold; both directions
    ride along so the caller can tell "A inside B" from "B inside A".

    Exact integer intersection counts, one rounded double division per
    direction. Same scale posture as :func:`ngram_jaccard_pairs`: the
    shared-shingle self-join keys on xxhash64(shingle); at 100 TB feed
    MinHash-LSH candidates instead (swap the pair source exactly as
    :func:`ngram_jaccard_lsh` does — downstream is unchanged).
    ``max_df_ratio``/``top_k`` strip boilerplate shingles first (sizes
    and intersections are over the stripped sets).
    """
    sh = _shingled_stripped(documents, max_df_ratio, top_k).select(
        "doc_id", F.xxhash64("shingle").alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_id_a"), F.col("n_shingles").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_id_b"), F.col("n_shingles").alias("size_b")
    )
    c_a = F.round(
        F.col("n_common").cast("double") / F.col("size_a").cast("double"), 6
    )
    c_b = F.round(
        F.col("n_common").cast("double") / F.col("size_b").cast("double"), 6
    )
    return (
        inter.join(F.broadcast(sa), "doc_id_a")
        .join(F.broadcast(sb), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_common",
            c_a.alias("containment_a"),
            c_b.alias("containment_b"),
        )
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= min_containment
        )
    )


def ngram_jaccard_lsh(
    documents: DataFrame,
    min_jaccard: float = 0.2,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    max_df_ratio: float | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """The scale path for n-gram Jaccard: exact Jaccard re-rank restricted
    to MinHash-LSH candidate pairs (docs sharing ≥1 signature band).

    At 100 TB the all-shared-shingle self-join of
    :func:`ngram_jaccard_pairs` is quadratic in popular-shingle frequency;
    this variant's only pairwise step is the band bucket join, whose
    candidate count scales with true near-duplicate density. Semantics:
    pairs are (LSH candidates) ∩ (jaccard ≥ threshold) — recall < 1 by LSH
    design, precision exact.

    ``max_df_ratio``/``top_k`` apply the boilerplate strip pre-pass to
    BOTH stages (the signatures the candidates come from AND the exact
    verify sets) — on boilerplate-heavy corpora this is what keeps the
    band buckets content-selective instead of funneling the whole
    corpus through the universal-shingle bands.
    """
    cand = minhash_lsh_pairs(
        documents, n_hashes, band_size, max_df_ratio, top_k
    ).select("doc_id_a", "doc_id_b")
    sh = _shingled_stripped(documents, max_df_ratio, top_k).select(
        "doc_id", F.xxhash64("shingle").alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # Count common shingles only for candidate pairs: explode candidates to
    # (pair, shingle-hash) via two semi-restricted joins on the shingle
    # table (8-byte hash key, not the raw shingle string).
    a = sh.select(F.col("doc_id").alias("doc_id_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_id_b"), "sh")
    inter = (
        cand.join(a, "doc_id_a")
        .join(b, ["doc_id_b", "sh"])
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_shingles").alias("size_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("n_common")
    ).cast("double")
    return (
        inter.join(F.broadcast(sa), "doc_id_a")
        .join(F.broadcast(sb), "doc_id_b")
        .select(
            "doc_id_a", "doc_id_b", "n_common", F.round(jac, 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    min_jaccard: float = 0.2,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    max_df_ratio: float | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """NEAR-DUPLICATE benchmark decontamination — the fuzzy upgrade of
    :func:`extensions.text.decontaminate`'s exact n-gram rule: a
    training document is contaminated when it is a MinHash-LSH
    candidate of any eval document AND clears an exact shingle-Jaccard
    threshold. Exact n-gram overlap misses reworded eval items
    (paraphrased questions, renumbered answers); near-dup matching is
    the standard second pass (GPT-3 appendix C dedups eval overlap at
    the document level the same way).

    Returns one row per CONTAMINATED corpus doc: ``(doc_id,
    n_eval_matches, max_jaccard)`` — the drop list plus the evidence.

    Scale shape: the benchmark side is tiny relative to the corpus
    (eval suites are KBs against TBs), so its band relation, shingle
    relation and sizes are all BROADCAST — the corpus side never
    shuffles for the candidate join; exact verification is
    candidate-scoped (never all-pairs), and the final per-doc
    aggregate partial-aggregates map-side. The strip knobs
    (``max_df_ratio``/``top_k``, computed over the corpus side) apply
    to BOTH sides so boilerplate shared with the benchmark can't
    produce false contamination flags."""
    n_bands = n_hashes // band_size
    # ONE dominant set, computed over the corpus (the side with the
    # boilerplate mass), stripping BOTH sides — asymmetric stripping
    # would make the two signature universes incomparable
    hot = None
    if max_df_ratio is not None or top_k is not None:
        hot = _dominant_units(
            _shingled(corpus), corpus, "shingle", max_df_ratio, top_k
        ).localCheckpoint(eager=True)  # tiny by definition
    sig_c = minhash_signatures(corpus, n_hashes, hot=hot).localCheckpoint(
        eager=False
    )
    sig_b = minhash_signatures(benchmark, n_hashes, hot=hot).localCheckpoint(
        eager=False
    )
    bands_c = _band_rel(sig_c, n_bands, band_size).select(
        F.col("doc_id").alias("cid"), "bucket"
    )
    bands_b = _band_rel(sig_b, n_bands, band_size).select(
        F.col("doc_id").alias("bid"), "bucket"
    )
    cand = (
        bands_c.join(F.broadcast(bands_b), "bucket")
        .select("cid", "bid")
        .distinct()
    )
    sh_c = _shingled_stripped(corpus, None, None, hot).select(
        F.col("doc_id").alias("cid"), F.xxhash64("shingle").alias("sh")
    )
    sh_b = _shingled_stripped(benchmark, None, None, hot).select(
        F.col("doc_id").alias("bid"), F.xxhash64("shingle").alias("sh")
    )
    sizes_c = sh_c.groupBy("cid").agg(F.count(F.lit(1)).alias("size_c"))
    sizes_b = sh_b.groupBy("bid").agg(F.count(F.lit(1)).alias("size_b"))
    inter = (
        cand.join(sh_c, "cid")
        .join(F.broadcast(sh_b), ["bid", "sh"])
        .groupBy("cid", "bid")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.round(
        F.col("n_common").cast("double")
        / (F.col("size_c") + F.col("size_b") - F.col("n_common")).cast(
            "double"
        ),
        6,
    )
    return (
        inter.join(sizes_c, "cid")
        .join(F.broadcast(sizes_b), "bid")
        .withColumn("__j", jac)
        .filter(F.col("__j") >= min_jaccard)
        .groupBy(F.col("cid").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_matches"),
            F.max("__j").alias("max_jaccard"),
        )
    )


def suggested_n_planes(n_rows: int, target_bucket: int = 100) -> int:
    """Size the SRP plane count so expected bucket occupancy stays near
    ``target_bucket``: candidate volume is Σ|bucket|² ≈ N²/2^planes, so
    planes must grow with log2(N) to keep per-bucket work (and therefore
    total work) LINEAR in the corpus — asymptotically ≈ target_bucket·N
    candidate dot products regardless of N. Measured at 10× sf0.1
    embeddings (round 4): fixed n_planes=4 → 5.8s pair join; auto-sized
    (20k rows → 8 planes) → 1.3s, flat against the 1.3s sf0.1 wall —
    slope ~1.0 vs the fixed default's 5×. More planes trade recall for
    cost — the standard LSH dial; pass an explicit plane count when
    reproducing a previously-committed pair set."""
    import math

    if n_rows <= target_bucket:
        return 1
    return max(4, math.ceil(math.log2(n_rows / target_bucket)))


def remove_dominant_direction(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    col: str = "embedding",
    out: str = "qvec",
) -> DataFrame:
    """Common-component removal for embeddings — the vector-space face
    of boilerplate stripping (the all-but-the-top / SIF trick, with the
    corpus MEAN direction as the component estimate): subtract each
    vector's projection onto the dominant direction so that a corpus
    where a large fraction of embeddings collapse onto one direction
    (near-universal template content — the round-7 hot shape, where
    ~half the vectors were near-parallel and every pair enumeration
    over them was Θ(n²) by semantics) regains content-scoped cosine
    structure.

    Cross-engine exact by construction: vectors are quantized to
    bigint (``QUANT_SCALE``); the direction is the component-wise
    BIGINT sum over the corpus (order-independent, exact); each
    vector's projection coefficient is a BIGINT dot; the residual is
    ONE fixed-shape double expression per element
    (``floor(q - p·d/|d|² + 0.5)``, identical IEEE ops in any engine —
    floor(x+0.5) instead of round() to sidestep HALF_UP/half-even
    divergence) re-quantized to bigint, so every downstream consumer
    stays on the integer-exact cosine machinery.

    Scale shape: one map-side-combinable component-sum aggregate
    (``dim`` rows collected — the same bounded driver read as a
    centroid table), then a single embarrassingly-parallel projection
    pass; no shuffle, no pairwise work. Returns (``id_col``, ``out``)
    with ``out`` an ``array<bigint>`` drop-in for
    ``quantize_embeddings`` output.

    A residual can be exactly zero only for a vector fully explained
    by the dominant direction (pure template); measured zero
    occurrences across every test corpus — guard upstream if your
    corpus can contain bit-exact template embeddings."""
    from .similarity import _dot, quantize_embeddings

    q = quantize_embeddings(embeddings, col, "q").select(id_col, "q")
    comp = (
        q.select(F.posexplode("q").alias("j", "x"))
        .groupBy("j")
        .agg(F.sum("x").alias("d"))
        .collect()
    )
    d = [0] * (max(r["j"] for r in comp) + 1)
    for r in comp:
        d[r["j"]] = int(r["d"])
    dd = float(sum(x * x for x in d))
    if dd == 0.0:
        return q.withColumnRenamed("q", out)
    d_arr = F.array(*[F.lit(x).cast("bigint") for x in d])
    # projection coefficient precomputed as its own column — inside the
    # zip_with lambda it would re-evaluate the 64-term dot per element
    proj = q.withColumn("p", _dot(F.col("q"), d_arr).cast("double"))
    resid = F.zip_with(
        F.col("q"),
        d_arr,
        lambda x, dj: F.floor(
            x.cast("double")
            - F.col("p") * dj.cast("double") / F.lit(dd)
            + F.lit(0.5)
        ).cast("bigint"),
    )
    return proj.select(id_col, resid.alias(out))


def embedding_cosine_pairs(
    embeddings: DataFrame,
    min_cosine: float = 0.3,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    target_bucket: int = 100,
    remove_dominant: bool = False,
) -> DataFrame:
    """Embedding-based near-duplicate pairs: exact cosine over
    sign-random-projection LSH candidates (same bucket), keeping pairs with
    cosine ≥ threshold.

    The bucket join replaces the |N|² cross product with Σ bucket² — at
    scale the bucket id is also the corpus table's natural cluster key so
    the join is shuffle-free. Cosine math is the quantized-integer scheme
    of ``extensions.similarity`` (bit-identical across engines).

    ``n_planes`` must scale with the corpus (≈ log2(N / bucket_target),
    see :func:`suggested_n_planes`) — a FIXED plane count makes bucket
    occupancy, and therefore the candidate join, quadratic in N. The
    DEFAULT (``n_planes=None``) is therefore scale-safe: it auto-sizes
    from a cheap corpus ``count()`` (one columnar-metadata job, the same
    statistic an ANALYZE would supply) so callers who never touch the dial
    stay on the linear slope at any N. Pass an explicit plane count only
    to reproduce a previously-committed pair set bit-for-bit (more planes
    trade recall for cost — the standard LSH dial).
    """
    from .similarity import _dot, _norm, _sign_bucket, quantize_embeddings

    if n_planes is None:
        n_planes = suggested_n_planes(embeddings.count(), target_bucket)

    # remove_dominant applies the common-component strip BEFORE both the
    # SRP buckets and the exact cosine — with a dominant direction in
    # place the bucket join itself degenerates (near-parallel vectors
    # all land in one bucket), so the strip must precede the hash.
    src = (
        remove_dominant_direction(embeddings, id_col)
        if remove_dominant
        else quantize_embeddings(embeddings)
    )
    # Norm computed once per vector BEFORE the self-join (per-pair work is
    # one dot product, not three array aggregations); the relation is
    # checkpointed so the self-join doesn't evaluate the 4×64-term bucket
    # projection twice.
    base = src.select(
        F.col(id_col).alias("id"),
        F.col("qvec").alias("v"),
        _norm(F.col("qvec")).alias("nrm"),
        _sign_bucket("qvec", n_planes, dim).alias("bucket"),
    ).localCheckpoint(eager=False)
    a = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "bucket",
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    cosine = _dot(F.col("va"), F.col("vb")).cast("double") / (
        F.col("na") * F.col("nb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine, 6).alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )


def simhash_pairs(
    documents: DataFrame, max_hamming: int = 3, n_bits: int = 60,
    max_df_ratio: float | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs: candidates share at least one of 4
    bands of the fingerprint (pigeonhole: hamming ≤ 3 ⇒ some band is
    identical), then the exact Hamming distance filters.

    Band width is the selectivity lever (Manku et al., WWW'07): simhash
    bits are heavily CORRELATED on natural corpora (common tokens drive
    the same sign pattern everywhere), so narrow bands funnel large
    corpus fractions into single buckets — 60-bit fingerprints with
    15-bit bands keep buckets small while the pigeonhole recall guarantee
    (4 bands > 3 flips) is unchanged. 60 bits = 15 hex chars, so the
    value parses into a BIGINT in every engine.

    The signature relation is checkpointed before the band self-join —
    otherwise both join sides would recompute the whole token-explode
    aggregation; the join (not bucket-local array expansion) is what
    spreads a skewed bucket's pair fan-out across the cluster.
    """
    sig = simhash(
        documents, n_bits, max_df_ratio, top_k
    ).localCheckpoint(eager=False)
    n_bands = 4
    band_bits = n_bits // n_bands
    mask = (1 << band_bits) - 1
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_bits)
                        .bitwiseAND(mask)
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.val")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id_a", "doc_id_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over a candidate
    pair graph via min-label propagation. Returns (doc_id, cluster_id)
    where cluster_id = min doc_id in the component.

    The iterative driver loop converges in O(component diameter) rounds —
    near-dup clusters are shallow (most are 2-3 docs), so 2-4 rounds in
    practice. Each round is one shuffle on the node id; the edge list
    (candidate pairs, NOT all doc pairs) bounds the work. This is the
    step that turns pairwise dedup verdicts into keep/drop decisions.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # Hybrid execution: the candidate-pair graph is tiny relative to the
    # corpus (only docs appearing in a candidate pair are nodes — dedup
    # edge lists are ~0.1-1% of corpus rows even at heavy duplication).
    # When it fits comfortably on the driver, union-find there replaces
    # O(component diameter) distributed rounds of ~4 jobs each; the
    # min-label-propagation loop below remains the big-graph path and
    # computes the identical (doc_id, min-label) assignment.
    #
    # ONE limit-collect both sizes the graph and fetches it: ≤ LIMIT rows
    # back means the collected head IS the complete edge list (no separate
    # count pass — one job instead of two on the common small path).
    SMALL_EDGE_LIMIT = 200_000
    head = edges.limit(SMALL_EDGE_LIMIT + 1).collect()
    if len(head) <= SMALL_EDGE_LIMIT:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for row in head:
            a, b = row["a"], row["b"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp_min: dict = {}
        for node in parent:
            r = find(node)
            m = comp_min.get(r)
            comp_min[r] = node if m is None or node < m else m
        out = [(node, comp_min[find(node)]) for node in sorted(parent)]
        # Schema derives from the input node column so both execution paths
        # return identical types (string keys, ints, ...) — the distributed
        # path below inherits the type through the plan; hardcoding bigint
        # here would make the output type depend on the edge COUNT.
        node_type = edges.schema["a"].dataType
        out_schema = T.StructType(
            [
                T.StructField("doc_id", node_type),
                T.StructField("cluster_id", node_type),
            ]
        )
        return pairs.sparkSession.createDataFrame(out, out_schema)
    # big-graph path: the edge list feeds every propagation round — persist
    # it here (the small path above never pays the cache write)
    edges = edges.persist()
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(max_iter):
        # label each node with the min of (its label, its neighbors' labels)
        propagated = (
            edges.join(labels.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"), "lbl")
            .union(labels)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        propagated = propagated.localCheckpoint(eager=True)  # cut lineage
        changed = (
            propagated.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = propagated
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


def simhash(documents: DataFrame, n_bits: int = 16,
            max_df_ratio: float | None = None,
            top_k: int | None = None) -> DataFrame:
    """SimHash over word tokens: bit j of the fingerprint is the sign of the
    sum over tokens of (±1 by bit j of md5(token)).

    Bits come from hex nibbles via position-in-alphabet (portable: strpos /
    instr exist everywhere); 16 bits = first 4 nibbles. Integer math only.

    ``max_df_ratio``/``top_k`` strip corpus-dominant TOKENS
    (:func:`dominant_tokens` — simhash fingerprints tokens, not
    shingles) before signing: near-universal tokens drive every
    document's sign pattern the same way, collapsing fingerprints
    corpus-wide (the round-7 hot-shape failure in the token domain).
    """
    t = F.array_distinct(tokens())
    exploded = documents.select("doc_id", F.explode(t).alias("token"))
    if max_df_ratio is not None or top_k is not None:
        hot = dominant_tokens(documents, max_df_ratio, top_k)
        exploded = exploded.join(F.broadcast(hot), "token", "left_anti")
    # One hex→integer parse per token (the first n_bits/4 digest chars,
    # big-endian, so bit j of the fingerprint = bit (n_bits-1-j) of v) —
    # bit-identical to per-nibble extraction but one conv + cheap integer
    # shifts instead of n_bits string probes per row. Portable: DuckDB
    # reproduces v with CAST('0x' || substring(md5(...)) AS BIGINT).
    exploded = exploded.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, n_bits // 4), 16, 10)
        .cast("bigint")
        .alias("v"),
    )
    bit_cols = [
        F.sum(
            F.shiftright("v", n_bits - 1 - j).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"s_{j}")
        for j in range(n_bits)
    ]
    sums = exploded.groupBy("doc_id").agg(*bit_cols)
    sig = F.lit(0).cast("bigint")
    for j in range(n_bits):
        sig = sig + F.when(F.col(f"s_{j}") > 0, F.lit(2 ** j)).otherwise(0)
    return sums.select("doc_id", sig.cast("bigint").alias("simhash"))


def dedup_apply(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """Materialize the keep/drop decision: given candidate near-dup pairs,
    keep exactly one representative (the min doc_id) per duplicate cluster
    and every unclustered doc. Returns the surviving corpus ids with an
    ``is_cluster_rep`` flag (true = this doc won its cluster).

    This is the step that turns pairwise verdicts into the deduplicated
    training corpus. Plan shape: the cluster relation is tiny relative to
    the corpus (only docs that appear in a candidate pair), so both the
    drop-list anti-join and the rep-flag left join broadcast at scale —
    the full corpus is never shuffled.
    """
    clusters = connected_components(pairs)
    dropped = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    reps = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id", F.lit(True).alias("is_cluster_rep")
    )
    return (
        documents.select("doc_id")
        .join(F.broadcast(dropped), "doc_id", "left_anti")
        .join(F.broadcast(reps), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("is_cluster_rep"), F.lit(False)).alias(
                "is_cluster_rep"
            ),
        )
    )


def dedup_apply_priority(
    documents: DataFrame,
    pairs: DataFrame,
    priority_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware survivor selection: the same keep/drop contract as
    :func:`dedup_apply`, but each cluster's representative is the member
    with the HIGHEST ``priority_col`` (ties: lowest id) instead of the
    lowest id — the production choice ("keep the best copy": longest
    text, highest quality score, freshest crawl). The priority must be
    engine-portable for oracle comparison — exact integers (n_chars) or
    fixed-order float expressions qualify.

    Plan shape matches dedup_apply: the cluster relation is pair-bounded
    (tiny), so it broadcasts INTO the corpus for the priority lookup and
    the winner aggregate runs on that tiny relation; the corpus itself
    never shuffles."""
    clusters = connected_components(pairs)
    members = documents.select(id_col, priority_col).join(
        F.broadcast(clusters), id_col
    )
    winners = (
        members.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col(priority_col).alias("p"),
                    (-F.col(id_col)).alias("nid"),
                )
            ).alias("b")
        )
        .select((-F.col("b.nid")).alias(id_col))
    )
    dropped = members.join(winners, id_col, "left_anti").select(id_col)
    reps = winners.select(id_col, F.lit(True).alias("is_cluster_rep"))
    return (
        documents.select(id_col)
        .join(F.broadcast(dropped), id_col, "left_anti")
        .join(F.broadcast(reps), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("is_cluster_rep"), F.lit(False)).alias(
                "is_cluster_rep"
            ),
        )
    )


def dedup_apply_soft(
    documents: DataFrame,
    pairs: DataFrame,
    priority_col: str,
    keep_k: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """SOFT dedup: keep up to ``keep_k`` members per near-dup cluster,
    ranked by quality — the keep-fraction policy (SemDeDup / D4 style)
    between hard dedup (k=1, :func:`dedup_apply_priority`) and no dedup.
    Hard dedup throws away genuinely different copies of popular content;
    modern pretraining mixes keep a bounded number of near-duplicates so
    natural popularity still shows up in the data without letting one
    template dominate. Rank is (priority DESC, id ASC) — engine-portable
    for exact integer priorities like n_chars.

    Returns surviving ids with ``keep_rank``: 1..keep_k for kept cluster
    members (1 = the cluster's best copy), 0 for unclustered docs.

    Plan shape: the cluster relation is pair-bounded (tiny vs corpus), so
    the priority lookup broadcasts the clusters INTO the corpus and the
    per-cluster rank window runs on that tiny relation only; the corpus
    itself never shuffles — the drop-list anti-join and the rank left
    join are both broadcasts, exactly the dedup_apply shape.
    """
    clusters = connected_components(pairs)
    members = documents.select(id_col, priority_col).join(
        F.broadcast(clusters), id_col
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(priority_col), F.asc(id_col)
    )
    ranked = members.withColumn("keep_rank", F.row_number().over(w))
    dropped = ranked.filter(F.col("keep_rank") > keep_k).select(id_col)
    kept = ranked.filter(F.col("keep_rank") <= keep_k).select(
        id_col, F.col("keep_rank").cast("int").alias("keep_rank")
    )
    return (
        documents.select(id_col)
        .join(F.broadcast(dropped), id_col, "left_anti")
        .join(F.broadcast(kept), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("keep_rank"), F.lit(0))
            .cast("int")
            .alias("keep_rank"),
        )
    )


def fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    max_dist: int = 2,
    block_chars: int = 2,
) -> DataFrame:
    """Blocked edit-distance matching (entity-resolution style fuzzy
    dedup): distinct values of ``text_col`` whose Levenshtein distance is
    ≤ ``max_dist``, compared only within a blocking bucket (leading
    ``block_chars`` characters + length band).

    Blocking is the scale lever: the quadratic comparison runs per
    bucket, so candidate volume is Σ|bucket|², not |values|². The
    length-band half of the key is sound (edit distance ≥ length
    difference, so a pair at distance ≤ k always shares a ⌊len/ (k+1)⌋
    band with |Δlen| ≤ k — we join adjacent bands); the prefix half is
    the standard recall trade-off of blocking, documented, not hidden:
    pairs differing inside the first ``block_chars`` characters are not
    compared.

    Returns ``(left_value, right_value, distance)`` with
    ``left_value < right_value`` (each unordered pair once).
    """
    vals = df.select(F.col(text_col).alias("v")).distinct()
    # adjacent length bands: a value at length L joins bands
    # {L div (k+1), with neighbors covered by emitting L±k's band set}
    k = max_dist
    banded = vals.select(
        "v",
        F.substring("v", 1, block_chars).alias("_prefix"),
        F.explode(
            F.array_distinct(
                F.array(
                    # floor(), never a double->int cast: Spark casts
                    # truncate while other engines round — floor is the
                    # portable integer division
                    F.floor(F.length("v") / (k + 1)).cast("int"),
                    F.floor((F.length("v") + k) / (k + 1)).cast("int"),
                    F.floor((F.length("v") - k) / (k + 1)).cast("int"),
                )
            )
        ).alias("_band"),
    )
    left = banded.select(
        F.col("v").alias("left_value"), "_prefix", "_band"
    )
    right = banded.select(
        F.col("v").alias("right_value"), "_prefix", "_band"
    )
    return (
        left.join(right, ["_prefix", "_band"])
        .filter(F.col("left_value") < F.col("right_value"))
        .select("left_value", "right_value")
        .distinct()
        .filter(
            F.levenshtein("left_value", "right_value") <= max_dist
        )
        .select(
            "left_value",
            "right_value",
            F.levenshtein("left_value", "right_value").alias("distance"),
        )
    )


def minhash_jaccard_estimates(
    documents: DataFrame,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Signature-agreement Jaccard ESTIMATE for every LSH candidate pair:
    E[fraction of agreeing MinHash components] = true Jaccard, so
    ``n_agree / n_hashes`` is the unbiased sketch estimate that decides
    near-dup verdicts WITHOUT touching the shingle sets again — the
    second half of the MinHash contract (the pairs operator finds
    candidates; this scores them from the signatures alone).

    One signature pass (checkpointed — it feeds the band join twice and
    the scoring join twice), bucket-join candidates, then a
    signature-width agreement sum. est values are exact multiples of
    1/n_hashes (binary fractions — no cross-engine rounding hazard).

    Caller-must-clear contract: the signature localCheckpoint's RDD
    blocks outlive this call (the returned plan references them lazily,
    so they cannot be dropped here) and are NOT freed by
    ``spark.catalog.clearCache()``. Long-lived sessions issuing many
    calls should release them between calls via
    ``[rdd.unpersist() for rdd in
    spark.sparkContext._jsc.getPersistentRDDs().values()]`` once the
    result is fully consumed (bench.py does exactly this).
    """
    sig = minhash_signatures(documents, n_hashes).localCheckpoint(eager=False)
    n_bands = n_hashes // band_size
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.col(f"mh_{b * band_size + j}")
                            for j in range(band_size)
                        ],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_id_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(n_hashes)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_id_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(n_hashes)],
    )
    n_agree = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    return (
        cand.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            n_agree.cast("int").alias("n_agree"),
            (n_agree.cast("double") / F.lit(float(n_hashes))).alias(
                "est_jaccard"
            ),
        )
    )


# --------------------------------------------------------------------------
# Persisted dedup signature index: build once over the historical corpus,
# match every incoming batch against it — the incremental-ingest dedup
# lifecycle (mirrors extensions.ann_index / pq's train-once pattern).
# --------------------------------------------------------------------------
def _band_buckets(
    sig: DataFrame, id_alias: str, n_hashes: int, band_size: int
) -> DataFrame:
    """(doc, bucket) relation from a signature table — one 8-byte
    xxhash64 key per band, identical folding to minhash_lsh_pairs."""
    n_bands = n_hashes // band_size
    return sig.select(
        F.col("doc_id").alias(id_alias),
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.col(f"mh_{b * band_size + j}")
                            for j in range(band_size)
                        ],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )


def build_dedup_index(
    catalog,
    name: str,
    documents: DataFrame,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    probe_partitions: int | None = None,
) -> None:
    """Persist the corpus MinHash signatures as the catalog table
    ``{name}__signatures`` — the historical half of incremental dedup.
    Signatures are ~32 bytes × n_hashes per document regardless of text
    size, so the stored index is a small constant fraction of the corpus
    and each batch probe scans signatures, never corpus text. Rebuilds
    write a new snapshot version (queries racing a rebuild read a
    consistent older index); per-batch growth goes through
    :func:`append_to_dedup_index` instead of a rebuild.

    ``probe_partitions=N`` additionally materializes the band-exploded
    layout ``{name}__bands`` — (doc_id, bucket, signature columns),
    PARTITIONED by ``bucket_mod = pmod(bucket, N)``. A batch probe then
    joins on (bucket_mod, bucket), and Spark's dynamic partition pruning
    reads only the partitions holding the batch's own bucket mods — the
    IVF-posting-list read pattern for dedup (the unpartitioned path
    scans the whole signature table per probe). Costs n_bands× storage
    of the (already tiny) signature index."""
    meta = {
        "n_hashes": n_hashes,
        "band_size": band_size,
        "probe_partitions": probe_partitions,
    }
    sig = minhash_signatures(documents, n_hashes)
    if not probe_partitions:
        catalog.write(sig, f"{name}__signatures", meta=meta)
        return
    # signatures are referenced twice (their own table + the band
    # explode) — pin so the shingle/minhash pass executes once (this
    # replaces the old write-then-read-back materialization). Both
    # layouts publish under ONE staged multi-table commit: no crash
    # window where the band layout is visible without (or next to a
    # different version of) its signature table.
    sig = sig.localCheckpoint(eager=True)
    bands = (
        _band_buckets(sig, "doc_id", n_hashes, band_size)
        .join(sig, "doc_id")
        .withColumn("bucket_mod", F.pmod("bucket", F.lit(probe_partitions)))
    )
    catalog.commit_tables(
        {f"{name}__signatures": sig, f"{name}__bands": bands},
        metas={f"{name}__signatures": meta},
        partition_bys={f"{name}__bands": ["bucket_mod"]},
    )


def append_to_dedup_index(
    catalog,
    name: str,
    batch: DataFrame,
    n_hashes: int = N_HASHES,
    batch_id: int | str | None = None,
) -> None:
    """Fold an accepted batch into the index: append-only (no
    read-modify-write of the historical signatures) — the fact-table
    fast path of the catalog. Keeps the partitioned probe layout in
    sync when the index was built with ``probe_partitions``. Pass
    ``batch_id`` from an at-least-once caller (foreachBatch): the
    append then goes through ``catalog.append_once``, so a replayed
    batch converges to ONE copy of its signature rows instead of
    doubling them."""
    sig = minhash_signatures(batch, n_hashes).localCheckpoint(eager=True)
    if batch_id is None:
        catalog.append(sig, f"{name}__signatures")
    else:
        catalog.append_once(sig, f"{name}__signatures", batch_id)
    meta = catalog.read_meta(f"{name}__signatures") or {}
    nparts = meta.get("probe_partitions")
    if nparts:
        band_size = meta.get("band_size", BAND_SIZE)
        bands = (
            _band_buckets(sig, "doc_id", n_hashes, band_size)
            .join(sig, "doc_id")
            .withColumn("bucket_mod", F.pmod("bucket", F.lit(nparts)))
        )
        if batch_id is None:
            catalog.append(bands, f"{name}__bands", partition_by=["bucket_mod"])
        else:
            catalog.append_once(
                bands, f"{name}__bands", batch_id, partition_by=["bucket_mod"]
            )


def match_against_dedup_index(
    catalog,
    name: str,
    batch: DataFrame,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Near-duplicate matches of a NEW batch against the PERSISTED
    corpus index: signatures are computed for the batch only
    (batch-sized shingle work), band buckets join against the stored
    table, and the signature-agreement estimate scores each candidate —
    the corpus text is never re-read and corpus signatures are never
    recomputed. Returns (batch_doc_id, corpus_doc_id, n_agree,
    est_jaccard); est values are exact multiples of 1/n_hashes (binary
    fractions — no cross-engine rounding hazard).

    Within-batch duplicates are out of scope here (run
    :func:`minhash_lsh_pairs` on the small batch for those); this is
    the batch×history half that would otherwise cost a full-corpus
    recompute per ingest. Scale shape: the probe is a shuffle join on
    the 8-byte bucket key between a batch-sized relation and the
    band-exploded signature scan; at 100 TB the signature table is the
    scan (≲0.5% of corpus bytes), and laying it out bucket-clustered
    (operators/layout.py) turns each probe into a partition-pruned read
    — the IVF-posting-list analogue for dedup.

    When the index was built with ``probe_partitions``, the probe uses
    the PARTITIONED ``{name}__bands`` layout: the batch's own bucket
    mods (a bounded set — at most ``probe_partitions`` values, collected
    from the batch-sized signature relation) become a STATIC partition
    filter on the stored scan, so only the partitions holding those mods
    are read (``PartitionFilters: bucket_mod IN (...)``, verified by
    plan test). A static filter is used deliberately instead of relying
    on dynamic partition pruning: the checkpointed batch side hides its
    selective predicate from DPP's benefit heuristic, while the
    collected mod set prunes unconditionally. Output is identical to the
    unpartitioned path."""
    bsig = minhash_signatures(batch, n_hashes).localCheckpoint(eager=False)
    meta = catalog.read_meta(f"{name}__signatures") or {}
    nparts = meta.get("probe_partitions")
    bbands = _band_buckets(bsig, "batch_doc_id", n_hashes, band_size)
    if nparts and catalog.exists(f"{name}__bands"):
        stored_bands = catalog.read(f"{name}__bands")
        bb = bbands.withColumn(
            "bucket_mod", F.pmod("bucket", F.lit(nparts))
        )
        # ≤ probe_partitions distinct values, from the (tiny) batch side
        mods = [
            r.bucket_mod for r in bb.select("bucket_mod").distinct().collect()
        ]
        cand = (
            stored_bands.filter(F.col("bucket_mod").isin(mods))
            .join(F.broadcast(bb.drop("bucket_mod")), "bucket")
            .select(
                "batch_doc_id",
                F.col("doc_id").alias("corpus_doc_id"),
                # signature columns ride in the bands layout, so the
                # probe never touches the unpartitioned table
                *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(n_hashes)],
            )
            .distinct()
        )
    else:
        stored = catalog.read(f"{name}__signatures")
        sb = stored.select(
            F.col("doc_id").alias("corpus_doc_id"),
            *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(n_hashes)],
        )
        cand = (
            bbands.join(
                _band_buckets(stored, "corpus_doc_id", n_hashes, band_size),
                "bucket",
            )
            .select("batch_doc_id", "corpus_doc_id")
            .distinct()
            .join(sb, "corpus_doc_id")
        )
    sa = bsig.select(
        F.col("doc_id").alias("batch_doc_id"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(n_hashes)],
    )
    n_agree = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    return (
        cand.join(sa, "batch_doc_id")
        .select(
            "batch_doc_id",
            "corpus_doc_id",
            n_agree.cast("int").alias("n_agree"),
            (n_agree.cast("double") / F.lit(float(n_hashes))).alias(
                "est_jaccard"
            ),
        )
    )


def merge_dedup_index(
    catalog,
    dst: str,
    src: str,
    batch_id: int | str | None = None,
) -> None:
    """Fold shard index ``src``'s signatures (and band layout, when
    present) into ``dst`` — completing shard-parallel build + merge
    across all three persisted indexes (`ann_index.merge_ann_index`,
    `text.merge_text_index`). The dedup index is the EASY case:
    MinHash signatures are content-deterministic with NO trained state
    (no quantizer, no corpus stats), so shard-build + merge is
    row-identical to a one-shot build of the union corpus, and the
    whole merge reduces to idempotent FILE-level appends — every move
    is an ``append_once_files`` keyed by ``batch_id`` (default
    ``"merge-{src}"``), reusing src's stored data files (hardlink /
    manifest reuse, no Spark read+write), so a replay or crash-window
    rerun converges with NO applied-batch ledger and no ordering
    argument.

    Guards: ``n_hashes`` / ``band_size`` / ``probe_partitions`` must
    match — signatures hashed differently are not comparable, and
    stored ``bucket_mod`` values only transfer between equal moduli.
    Shards must be doc-disjoint (the append contract).

    Scale shape: signature rows move as a file-level append (the
    signature table is ~0.3% of corpus bytes); the band layout appends
    partition-aligned on ``bucket_mod`` — no shuffle, neither corpus
    re-shingled, neither index re-read beyond src's rows."""
    dmeta = catalog.read_meta(f"{dst}__signatures") or {}
    smeta = catalog.read_meta(f"{src}__signatures") or {}
    for k in ("n_hashes", "band_size"):
        # A side with MISSING hashing params (older build, lost sidecar)
        # must refuse, not merge: None == None would silently combine
        # indexes whose signature universes were never verified to match.
        if dmeta.get(k) is None or smeta.get(k) is None:
            raise ValueError(
                f"merge_dedup_index: {src!r} or {dst!r} lacks required "
                f"meta key {k!r} (src={smeta.get(k)!r}, "
                f"dst={dmeta.get(k)!r}) — hashing parameters unverifiable; "
                "rebuild the side with missing meta"
            )
    for k in ("n_hashes", "band_size", "probe_partitions"):
        if dmeta.get(k) != smeta.get(k):
            raise ValueError(
                f"merge_dedup_index: {src!r} and {dst!r} disagree on "
                f"{k} ({smeta.get(k)!r} vs {dmeta.get(k)!r}) — "
                "signatures/buckets are not comparable; rebuild one side"
            )
    if batch_id is None:
        batch_id = f"merge-{src}"
    # FILE-level appends: the n_hashes/band_size/probe_partitions
    # equality guard above makes src's stored signature and band files
    # layout-aligned with dst's, so both merges reuse the bytes as-is
    # (hardlink / manifest reuse) instead of re-encoding every src row
    # through a Spark read+write.
    catalog.append_once_files(
        f"{dst}__signatures", catalog.path(f"{src}__signatures"), batch_id
    )
    if dmeta.get("probe_partitions"):
        src_bands = catalog.path(f"{src}__bands")
        # file-level reuse assumes src's bands files physically live
        # under bucket_mod= partition dirs; a src snapshot stored FLAT
        # (pre-partitioned-layout build) would hardlink its files to
        # dst's top level and produce a mixed flat+partitioned dir that
        # Spark's partition discovery rejects. Fall back to the
        # row-level append (which normalizes any layout) in that case.
        # Listed through the catalog's swappable primitive, never a
        # direct filesystem walk in operator code.
        if src_bands is not None and any(
            rel.startswith("bucket_mod=")
            for rel in catalog._list_files(src_bands)
        ):
            catalog.append_once_files(f"{dst}__bands", src_bands, batch_id)
        else:
            catalog.append_once(
                catalog.read(f"{src}__bands"),
                f"{dst}__bands",
                batch_id,
                partition_by=["bucket_mod"],
            )


def compact_dedup_index(
    catalog, name: str, target_file_bytes: int = 128 << 20
) -> None:
    """Maintenance pass for a long-lived index: per-batch appends
    accumulate small files whose per-file open/footer cost eventually
    dominates every probe's stored-signature scan. Rewrite both layouts
    as a NEW bin-packed snapshot version (the catalog's pointer flip is
    the atomic swap, so probes racing the compaction read a consistent
    older version). The signature table's ``_meta.json`` (n_hashes,
    band_size, probe_partitions) is carried into the new version — a
    compaction must never silently drop the partitioned-probe layout."""
    import math

    def n_files(table: str) -> int:
        # each table bin-packs against its OWN byte size — the bands
        # layout is ~n_bands× the signatures table, so reusing one
        # count would leave its files n_bands× over target. Sizing
        # goes through the catalog (object-store-safe), never a direct
        # filesystem walk in operator code.
        total = sum(catalog.file_sizes(table).values())
        return max(1, math.ceil(total / target_file_bytes))

    sig_table = f"{name}__signatures"
    meta = catalog.read_meta(sig_table) or {}
    catalog.write(
        catalog.read(sig_table).repartition(n_files(sig_table)),
        sig_table,
        meta=meta,
    )
    if meta.get("probe_partitions") and catalog.exists(f"{name}__bands"):
        # repartition ON the partition column: every bucket_mod lives in
        # exactly one shuffle partition, so each partition directory is
        # written by one task → few bin-packed files per directory. A
        # keyless repartition(n) would spray each directory's rows
        # across up to n tasks — up to n files PER directory, more
        # fragmentation than the appends being compacted away.
        bands_table = f"{name}__bands"
        catalog.write(
            catalog.read(bands_table).repartition(
                n_files(bands_table), "bucket_mod"
            ),
            bands_table,
            partition_by=["bucket_mod"],
        )


def leakage_safe_split(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    test_pct: int = 20,
) -> DataFrame:
    """Near-duplicate-aware train/test split: documents are split by the
    hash of their duplicate-CLUSTER representative, so a whole near-dup
    cluster always lands on one side. A doc-level hash split leaks —
    two near-copies straddle the boundary and the eval set scores the
    training set; splitting on the component representative is the
    standard fix (the decontamination argument applied to your own
    holdout).

    ``pairs`` is any candidate pair relation (MinHash-LSH bands, SimHash
    buckets, embedding-cosine…). Components come from min-label
    propagation; singleton documents are their own representative via a
    left join + coalesce — no extra pass. The split itself is the same
    md5-bucket contract as :func:`..text.hash_split` (content-
    independent, engine-portable, nested across pct values).

    Returns (doc_id, rep, hash_bucket, split).
    """
    comps = connected_components(pairs).select(
        F.col("doc_id").alias(id_col), F.col("cluster_id").alias("rep")
    )
    with_rep = documents.select(id_col).join(
        comps, id_col, "left"
    ).select(
        id_col,
        F.coalesce("rep", F.col(id_col)).cast("bigint").alias("rep"),
    )
    nib = lambda i: F.expr(  # noqa: E731
        f"instr('0123456789abcdef', substring(md5(cast(rep as string)), {i}, 1)) - 1"
    )
    bucket = nib(1) * 16 + nib(2)
    threshold = 256 * test_pct // 100
    return with_rep.select(
        id_col,
        "rep",
        bucket.cast("int").alias("hash_bucket"),
        F.when(bucket < threshold, "test").otherwise("train").alias(
            "split"
        ),
    )
