"""Data-mixture operators: domain-weighted sampling, model-based quality
scoring, and collocation (PMI) mining over a documents corpus.

These are the "decide what goes into the training set" steps of a
large-scale pipeline: rebalance the per-domain mix (e.g. upsample
low-resource languages), score documents with a (linear) quality model,
and surface corpus-level collocations.

Scale design:
- ``mixture_sample`` is a broadcast join against a tiny rates table plus a
  codegen'd deterministic hash filter — no shuffle of the corpus, no RNG
  state, reproducible across runs/engines/partitionings (same md5-bucket
  contract as :func:`..text.hash_split`).
- ``linear_quality_score`` is a pure column expression (the "apply a small
  linear classifier" pattern: with a real model the weight vector rides in
  as a broadcast array; with 4 features it folds into literals). All
  arithmetic is fixed-order IEEE double ops, so scores are bit-identical
  across engines.
- ``pmi_topk`` shuffles on the term key only (unigram and bigram count
  tables are corpus-vocabulary sized, NOT assumed broadcastable — the
  joins are ordinary shuffle joins keyed by term, the same layout the
  tf-idf operator uses). The only broadcast is the one-row corpus-total
  aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import _let_tokens, tokens


def _md5_bucket256(col: str) -> Column:
    """Deterministic engine-portable bucket 0-255: first md5 hex byte of
    the stringified key (identical expression to text.hash_split)."""
    nib = lambda i: F.expr(  # noqa: E731
        f"instr('0123456789abcdef', substring(md5(cast({col} as string)), {i}, 1)) - 1"
    )
    return (nib(1) * 16 + nib(2)).cast("int")


def mixture_sample(
    documents: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    domain_col: str = "lang",
) -> DataFrame:
    """Deterministic per-domain downsampling to a target mixture.

    ``rates`` maps domain value → keep probability in [0, 1]. A document
    is kept iff its content-independent hash bucket (md5 of the id,
    0-255) falls below ``floor(256 * rate)`` for its domain — so the kept
    set is reproducible, nested (rate 0.25 ⊂ rate 0.5), and independent
    of partitioning. Domains absent from ``rates`` use ``default_rate``.

    The rates ride as a broadcast-joined one-row-per-domain table (the
    realistic shape: mixture configs come from a file, not literals).
    """
    spark = documents.sparkSession
    rows = [(d, int(256 * r)) for d, r in sorted(rates.items())]
    rates_df = spark.createDataFrame(
        rows, f"{domain_col} string, __keep_below int"
    )
    bucket = _md5_bucket256(id_col)
    default_below = int(256 * default_rate)
    return (
        documents.join(F.broadcast(rates_df), domain_col, "left")
        .withColumn("hash_bucket", bucket)
        .filter(
            F.col("hash_bucket")
            < F.coalesce(F.col("__keep_below"), F.lit(default_below))
        )
        .drop("__keep_below")
    )


def temperature_mixture(
    documents: DataFrame,
    alpha_halves: int = 1,
    budget_tokens: int = 1_000_000,
    group_col: str = "lang",
) -> DataFrame:
    """α-temperature source weighting — the multilingual-pretraining
    mixing rule (mT5 / XLM-R, public method): sample source ``i`` with
    probability ``w_i ∝ p_i^α`` where ``p_i`` is the source's token
    share. α<1 flattens the distribution (low-resource sources are
    upsampled relative to their natural share); α=1 is proportional.
    Returns per source: exact token count, sampling ``weight``, the
    ``allocated_tokens`` out of ``budget_tokens``, and ``epochs`` —
    allocated/available, i.e. how many times the source repeats (>1 =
    upsampling).

    ``alpha_halves`` expresses α in HALF units (1 → α=0.5, 2 → α=1,
    3 → α=1.5): ``p^(h/2)`` then evaluates as an integer-power multiply
    chain times one ``sqrt`` — every step an IEEE correctly-rounded
    operation, so weights are bit-identical across engines. A general
    float α needs ``pow``, whose last ulp differs between libm
    implementations — that variant would not be oracle-exact, which is
    why the parameter is rational by construction. The normalizing
    ``Σ p_j^α`` runs as an ordered fold over the group-sorted array —
    never an unordered float SUM() — the same fixed-order float-addition
    discipline as the BM25 operator.

    Scale shape: one token-count aggregate over the corpus (map-side
    combinable), then everything else happens on the ≤|groups| row
    relation with two one-row broadcasts; the corpus shuffles once and
    only (group) keys move."""
    if alpha_halves < 1:
        raise ValueError("alpha_halves must be >= 1")
    t = tokens("text")
    per = documents.groupBy(group_col).agg(
        F.sum(F.size(t)).alias("n_tokens")
    )
    total = per.agg(F.sum("n_tokens").alias("__N"))
    j = per.join(F.broadcast(total))
    p = F.col("n_tokens").cast("double") / F.col("__N").cast("double")
    # p^(h/2) as a multiply chain × one sqrt: odd h → sqrt(p)·p^((h-1)/2),
    # even h → p^(h/2). Every step correctly rounded → engine-portable.
    temp = F.sqrt(p) if alpha_halves % 2 else p
    for _ in range(alpha_halves // 2 - (0 if alpha_halves % 2 else 1)):
        temp = temp * p
    j = j.select(group_col, "n_tokens", temp.alias("__t"))
    s = j.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(group_col, F.col("__t")))),
            F.lit(0.0),
            lambda a, x: a + x["__t"],
        ).alias("__S")
    )
    w = F.col("__t") / F.col("__S")
    return (
        j.join(F.broadcast(s))
        .select(
            group_col,
            "n_tokens",
            w.alias("weight"),
            F.floor(F.lit(float(budget_tokens)) * w)
            .cast("bigint")
            .alias("allocated_tokens"),
            (
                F.floor(F.lit(float(budget_tokens)) * w)
                / F.col("n_tokens").cast("double")
            ).alias("epochs"),
        )
    )


#: Feature weights for the linear quality margin: (weight, bias) over
#: [n_tokens/100, stopword_ratio, punct_ratio, mean_word_len/10].
DEFAULT_QUALITY_WEIGHTS = (0.35, 2.0, -4.0, -0.8)
DEFAULT_QUALITY_BIAS = -0.15


def linear_quality_score(
    documents: DataFrame,
    weights: tuple[float, float, float, float] = DEFAULT_QUALITY_WEIGHTS,
    bias: float = DEFAULT_QUALITY_BIAS,
) -> DataFrame:
    """Score documents with a linear quality model (the classifier-filter
    step, e.g. a fastText/logreg quality model distilled to its weights).

    Emits the raw linear margin w·x + b (NOT a sigmoid: exp() rounding
    differs across engines, while fixed-order double multiply/add does
    not), rounded to 6 places, and ``keep = margin > 0``. Pure projection
    — codegen'd, shuffle-free, scales linearly.
    """
    t = tokens()
    n_tok = F.size(t)
    n_chars = F.length("text")
    from .text import EN_STOPWORDS

    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda w: F.array_contains(stop_arr, w)))
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))

    x0 = n_tok.cast("double") / F.lit(100.0)
    x1 = n_stop.cast("double") / n_tok.cast("double")
    x2 = n_punct.cast("double") / n_chars.cast("double")
    x3 = ((n_chars - n_tok + 1).cast("double") / n_tok.cast("double")) / F.lit(10.0)
    w0, w1, w2, w3 = weights
    margin = (
        F.lit(w0) * x0 + F.lit(w1) * x1 + F.lit(w2) * x2 + F.lit(w3) * x3
        + F.lit(bias)
    )
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(margin, 6).alias("quality_margin"),
        (margin > 0).alias("keep"),
    )


def pmi_topk(
    documents: DataFrame, k: int = 20, min_count: int = 5
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information.

    PMI = log p(xy) / (p(x)·p(y)) with p(xy) = c_xy/N_bi, p(x) = c_x/N_uni.
    Emitted as the rounded PMI *ratio* (no log — log() rounding differs
    across engines; the ranking is identical since log is monotone):

        pmi_ratio = (c_xy / N_bi) · (N_uni / c_x) · (N_uni / c_y)

    computed in that exact association order on both engines. Rounded to
    6 places BEFORE ranking so the rank compare is engine-portable; ties
    break on the bigram text.

    Shuffle layout: unigram and bigram counts each shuffle once on the
    term key; the bigram→unigram joins are shuffle joins on the term key
    (vocabulary is corpus-sized — never assumed broadcastable). The two
    corpus totals are a one-row broadcast.

    Fully lazy — no persist, no eager collect. The unigram count table
    feeds three consumers (the corpus total and both sides of the bigram
    join), but its subplans are byte-identical, so AQE's runtime exchange
    reuse materializes the shuffle once and replays it (verified: 8
    ReusedExchange nodes in the finalized plan; 2× faster than the former
    persist+collect variant at sf0.1 and nothing left cached in the
    caller's session).
    """
    from .fanout import fan_out_small_scan

    documents = fan_out_small_scan(documents)
    t = tokens()
    uni = (
        documents.select(F.explode(t).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    # Bigram pairs via a let-bound token array (_let_tokens): a bare
    # tokens() expression inside the lambda would re-split the text once
    # per element — O(tokens²) regex work per document.
    bigrams = _let_tokens(
        lambda tt: F.when(
            F.size(tt) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(tt) - 1),
                lambda i: F.struct(
                    F.element_at(tt, i).alias("w1"),
                    F.element_at(tt, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    )
    bi = (
        documents.select(F.explode(bigrams).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    totals = uni.agg(
        F.sum("c_w").cast("bigint").alias("n_uni"),
    )
    n_bi_df = documents.select(
        F.sum(F.greatest(F.size(t) - 1, F.lit(0))).cast("bigint").alias("n_bi")
    )
    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_y")), "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_bi_df))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("bigint").alias("c_xy"),
            F.round(
                (F.col("c_xy").cast("double") / F.col("n_bi").cast("double"))
                * (F.col("n_uni").cast("double") / F.col("c_x").cast("double"))
                * (F.col("n_uni").cast("double") / F.col("c_y").cast("double")),
                6,
            ).alias("pmi_ratio"),
        )
    )
    return scored.orderBy(
        F.col("pmi_ratio").desc(), F.col("w1"), F.col("w2")
    ).limit(k)


def mixture_upsample(
    documents: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    domain_col: str = "lang",
) -> DataFrame:
    """Deterministic per-domain UP-sampling by repetition — mixture
    weights above 1 (e.g. 2.5× a low-resource language) emit each
    document ⌊rate⌋ or ⌈rate⌉ times so the expected multiplicity equals
    the rate exactly: copies = floor(rate) + 1 extra iff the document's
    hash bucket < 256·frac(rate). Same md5-bucket determinism contract as
    :func:`mixture_sample` (nested, partition-independent, no RNG);
    rates below 1 degenerate to downsampling (0 or 1 copies).

    Output: one row per emitted copy with ``copy_idx`` (1-based) — the
    epoch-repetition shape a data loader consumes. Pure projection +
    explode after a broadcast rates join; no corpus shuffle.
    """
    spark = documents.sparkSession
    rows = [
        (d, int(r), int(256 * (r - int(r)))) for d, r in sorted(rates.items())
    ]
    rates_df = spark.createDataFrame(
        rows, f"{domain_col} string, __base int, __extra_below int"
    )
    bucket = _md5_bucket256(id_col)
    d_base, d_extra = int(default_rate), int(256 * (default_rate - int(default_rate)))
    n_copies = (
        F.coalesce(F.col("__base"), F.lit(d_base))
        + F.when(
            bucket < F.coalesce(F.col("__extra_below"), F.lit(d_extra)),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    return (
        documents.join(F.broadcast(rates_df), domain_col, "left")
        .withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(1), F.col("n_copies")))
        )
        .drop("__base", "__extra_below")
    )


#: Portable integer-hash parameters shared with the CMS sketch family:
#: everything stays inside BIGINT and reproduces identically in any
#: engine with 64-bit integer arithmetic.
_PS_PRIME = 2147483647
_PS_A = 1000003
_PS_B = 12345


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int = 50,
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM'07): draw a
    weight-proportional without-replacement sample of size n with an
    unbiased per-item total estimator — the principled way to keep a
    small sample whose Σŵ still estimates the corpus total (subset-sum
    queries over sampled training data, cost attribution, debugging
    slices).

    q_i = w_i/u_i with u_i ~ U(0,1]; keep the n largest priorities;
    τ = the (n+1)-th priority; each kept item's estimator is
    ŵ_i = max(w_i, τ). Here u_i = (h(key)+1)/P from the portable
    integer hash, so q_i = (w_i·P) div (h+1) is EXACT BIGINT — the
    sample is deterministic, reproducible cross-engine, and re-drawable
    byte-identically at any later audit.

    Scale shape: one per-row integer expression, a TakeOrderedAndProject
    top-(n+1) (each partition keeps n+1 rows — no global sort), τ rides
    a one-row broadcast. Keys must be non-negative integers; weights
    positive integers (scale fixed-point weights upstream).
    """
    pr = df.select(
        F.col(key_col),
        F.col(weight_col).cast("bigint").alias("weight"),
        F.expr(
            f"(CAST({weight_col} AS BIGINT) * {_PS_PRIME}) div "
            f"((((CAST({key_col} AS BIGINT) % {_PS_PRIME}) * {_PS_A} "
            f"+ {_PS_B}) % {_PS_PRIME}) + 1)"
        ).alias("priority"),
    )
    topn1 = pr.orderBy(F.desc("priority"), F.asc(key_col)).limit(n + 1)
    w = Window.orderBy(F.desc("priority"), F.asc(key_col))
    ranked = topn1.withColumn("rank", F.row_number().over(w))
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rank") == n + 1, F.col("priority"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("tau")
    )
    return (
        ranked.filter(F.col("rank") <= n)
        .crossJoin(F.broadcast(tau))
        .select(
            key_col,
            "weight",
            "priority",
            "rank",
            F.greatest(F.col("weight"), F.col("tau")).alias("w_est"),
        )
    )


def budget_allocation(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Allocate an integer budget across groups proportionally to their
    exact weight mass, largest-remainder (Hamilton) rounding — the
    sampling-quota assignment a mixture plan turns into concrete
    per-source document counts, with Σalloc == budget EXACTLY (floor
    shares, then one extra unit to the largest remainders, ties on the
    smaller group id).

    All integer arithmetic (budget·w div W, budget·w mod W), so the
    allocation is engine-reproducible; the remainder-rank window runs
    over the GROUPS relation only (dimension-bounded, like every
    broadcast dim). Returns (group, weight_sum, base, remainder,
    alloc).
    """
    w = df.groupBy(group_col).agg(
        F.sum(F.col(weight_col).cast("bigint")).alias("weight_sum")
    )
    tot = w.agg(F.sum("weight_sum").cast("bigint").alias("__w"))
    shares = w.crossJoin(F.broadcast(tot)).select(
        group_col,
        "weight_sum",
        F.expr(f"({budget} * weight_sum) div __w").alias("base"),
        F.expr(f"({budget} * weight_sum) % __w").alias("remainder"),
    )
    used = shares.agg(F.sum("base").cast("bigint").alias("__used"))
    win = Window.orderBy(F.desc("remainder"), F.asc(group_col))
    return (
        shares.crossJoin(F.broadcast(used))
        .withColumn("__rk", F.row_number().over(win))
        .select(
            group_col,
            "weight_sum",
            F.col("base").cast("bigint").alias("base"),
            F.col("remainder").cast("bigint").alias("remainder"),
            (
                F.col("base")
                + F.when(
                    F.col("__rk") <= F.lit(budget) - F.col("__used"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
        )
    )


def _md5_bucket64k(col: str) -> Column:
    """Deterministic engine-portable bucket 0-65535: first four md5 hex
    nibbles of the stringified key (the 2-nibble :func:`_md5_bucket256`
    widened so per-group hash order has few ties to break by id)."""
    nib = lambda i: F.expr(  # noqa: E731
        f"instr('0123456789abcdef', substring(md5(cast({col} as string)), {i}, 1)) - 1"
    )
    return (
        ((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)
    ).cast("int")


def source_quota(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 20,
    fanout: int = 32,
) -> DataFrame:
    """Per-source document cap — the domain-balancing pre-pass every web
    corpus needs (C4/RefinedWeb cap pages per host so one crawler-friendly
    domain cannot dominate the mixture): keep at most ``cap`` documents per
    ``group_col``, chosen by content-independent key-hash order so the kept
    subset is a reproducible uniform sample of the group, not its first
    ``cap`` ids.

    Determinism: the order key is the 4-nibble md5 bucket of the id (ties
    broken by the id itself) — the same portable-hash family as
    ``hash_split`` / ``mixture_sample``, identical on any engine.

    Scale shape — the exact two-level top-k merge, NOT one window over the
    raw group: a hot domain with 10^8 pages would otherwise funnel through
    a single row_number task. Level 1 ranks within (group, id % fanout) —
    each salted slice holds ~1/fanout of the group — and truncates at
    ``cap``; level 2 ranks the ≤ fanout·cap survivors per group. Exact
    because a group's true top-``cap`` by (bucket, id) is contained in the
    union of its per-slice top-``cap``s. Both windows shuffle once; the
    second one moves at most fanout·cap rows per group regardless of group
    size.
    """
    bucket = _md5_bucket64k(id_col)
    salted = df.select(
        F.col(group_col),
        F.col(id_col),
        bucket.alias("hash_bucket"),
        F.pmod(F.col(id_col).cast("bigint"), F.lit(fanout)).alias("__slice"),
    )
    w1 = Window.partitionBy(group_col, "__slice").orderBy(
        "hash_bucket", id_col
    )
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= cap)
        .drop("__slice", "__r1")
    )
    w2 = Window.partitionBy(group_col).orderBy("hash_bucket", id_col)
    return (
        survivors.withColumn(
            "quota_rank", F.row_number().over(w2).cast("int")
        )
        .filter(F.col("quota_rank") <= cap)
        .select(group_col, id_col, "hash_bucket", "quota_rank")
    )
