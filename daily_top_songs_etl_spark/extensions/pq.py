"""Product quantization (PQ) for embedding compression.

The classic ANN storage trick (Jégou et al. 2011, public method): split
each D-dim vector into ``m`` subvectors, k-means each subspace
independently (the same broadcast-centroid Lloyd math as
:func:`similarity.kmeans_fit`), and store each vector as ``m`` small
integer codes. With m=4, k=16 a 64-dim float vector compresses
256 bytes → 4 half-byte codes (PQ16x4 shape).

Scale shape:
- **train**: ONE fused Lloyd loop over the exploded (vec, subspace)
  relation — per iteration the m·k codeword table broadcasts and the
  assignment + per-(subspace, cluster, dim) centroid update are a
  single shuffle, i.e. one corpus pass per iteration rather than m
  per-subspace jobs.
- **encode**: the full m-subspace codebook is m×k rows — broadcast onto
  the corpus; the argmin per (vector, subspace) folds into ONE hash
  aggregate on vec_id (min-of-struct per subspace via conditional
  aggregates), so encode costs one map-side-combinable shuffle of
  |vectors| rows.

Determinism: identical to kmeans_fit — quantized-integer distance math,
lowest-id initialization, struct-ordered tie-breaks.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import QUANT_SCALE


def _dim(embeddings: DataFrame, col: str) -> int:
    row = embeddings.select(F.size(col).alias("d")).first()
    if row is None:
        raise ValueError("empty embeddings table")
    return int(row["d"])


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    col: str = "embedding",
    d: int | None = None,
    centroid_state: str = "recompute",
) -> DataFrame:
    """Train all ``m`` subspace codebooks in ONE fused Lloyd loop.

    Semantically this is m independent k-means fits (one per subspace),
    and the math is bit-identical to running :func:`similarity.kmeans_fit`
    per sliced subvector (same quantization, same lowest-id init per
    subspace, same exact-BIGINT distances, same struct-ordered
    tie-breaks, same centroid rounding) — the per-subspace DuckDB unroll
    oracle keeps hash-matching. Physically it is a single loop over an
    exploded (vec, subspace, qsvec) relation: per iteration the m·k
    codeword table broadcasts once and the assignment + centroid update
    are ONE shuffle keyed on (subspace, cluster, dim) instead of m
    separate per-subspace jobs — at 100 TB that is one corpus pass per
    iteration rather than m, and locally it collapses ~4× the stage
    count the sequential unionByName plan paid.

    Returns (subspace, code, centroid array<double>, n_vectors).

    ``d`` — the (constant) embedding dimension; pass it when the caller
    already knows it to skip the one-row probe job ``_dim`` costs.

    ``centroid_state`` — the same measured materialization knob as
    :func:`similarity.kmeans_fit` (both paths bit-identical):
    ``"recompute"`` keeps the codewords a lazily chained relation
    (round i re-executes rounds 1..i-1 from the cached melted corpus —
    measured faster at local scale); ``"driver"`` collects the m·k
    BIGINT codewords each round and inlines them as literals —
    O(iters) corpus scans instead of O(iters²), the cluster-scale
    path, and ~3× fewer driver-sequenced jobs."""
    if centroid_state not in ("recompute", "driver"):
        raise ValueError(f"unknown centroid_state {centroid_state!r}")
    if d is None:
        d = _dim(embeddings, col)
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    subs = (
        embeddings.select(
            id_col,
            F.posexplode(
                F.array(*[F.slice(col, j * sub + 1, sub) for j in range(m)])
            ).alias("subspace", "svec_f"),
        )
        .select(
            id_col,
            "subspace",
            F.transform(
                "svec_f",
                lambda x: F.round(x.cast("double") * QUANT_SCALE, 0).cast(
                    "bigint"
                ),
            ).alias("qvec"),
        )
        .cache()
    )
    w = Window.partitionBy("subspace").orderBy(id_col)
    centroids = (
        subs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "subspace",
            (F.col("rn") - 1).alias("cluster"),
            F.col("qvec").alias("cvec"),
        )
    )
    # Per-iteration assignment is a PURE PROJECTION: the m·k codewords
    # collapse to one broadcast row holding an array of (subspace,
    # cluster, cvec) structs; each melted (vec, subspace) row filters its
    # subspace's codewords and takes array_min(struct(d, cluster)) —
    # identical exact-BIGINT distances and struct-ordered tie-break to
    # the previous broadcast-join + groupBy(id, subspace) shape, WITHOUT
    # that shape's per-iteration corpus-wide shuffle. The only exchange
    # left per iteration is the (subspace, cluster, dim) partial-sum
    # centroid update.
    def _cb_arr(cent: DataFrame) -> DataFrame:
        return cent.agg(
            F.array_sort(
                F.collect_list(F.struct("subspace", "cluster", "cvec"))
            ).alias("__cb")
        )

    def _best_cluster(cb_col: Column) -> Column:
        return F.array_min(
            F.transform(
                F.filter(
                    cb_col,
                    lambda c: c["subspace"] == F.col("subspace"),
                ),
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("qvec"),
                            c["cvec"],
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0).cast("bigint"),
                        lambda a, x: a + x,
                    ).alias("d"),
                    c["cluster"].alias("cluster"),
                ),
            )
        )["cluster"]

    def _per_dim_update(assigned: DataFrame) -> DataFrame:
        per_dim = (
            assigned.select(
                "subspace", "cluster", F.posexplode("qvec").alias("pos", "v")
            )
            .groupBy("subspace", "cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        )
        return per_dim.groupBy("subspace", "cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s", "c"))),
                lambda x: F.round(
                    x["s"].cast("double") / x["c"].cast("double"), 0
                ).cast("bigint"),
            ).alias("cvec")
        )

    def _finish(centroids: DataFrame, sizes: DataFrame) -> DataFrame:
        return (
            centroids.join(sizes, ["subspace", "cluster"], "left")
            .select(
                "subspace",
                F.col("cluster").alias("code"),
                F.transform(
                    "cvec", lambda x: x.cast("double") / QUANT_SCALE
                ).alias("centroid"),
                F.coalesce("n_vectors", F.lit(0)).alias("n_vectors"),
            )
        )

    if centroid_state == "driver":
        spark = embeddings.sparkSession

        def _cb_df(rows) -> DataFrame:
            return spark.createDataFrame(
                [(s, c, cv) for s, c, cv in rows],
                "subspace int, cluster int, cvec array<bigint>",
            )

        def _assign(rows) -> DataFrame:
            # driver-held codewords re-enter as a LITERAL one-row
            # broadcast relation (not inline literal expressions — a
            # constant array this size embedded in the plan defeats
            # whole-stage codegen and ran 2-5x slower when measured):
            # same broadcast + array_min projection as the recompute
            # path, but the subtree under the broadcast is a local
            # literal relation instead of the prior iterations' nested
            # aggregation lineage.
            if not rows:  # empty corpus: no codewords, empty assignment
                return subs.select(
                    id_col,
                    "subspace",
                    "qvec",
                    F.lit(None).cast("int").alias("cluster"),
                ).filter(F.lit(False))
            return subs.crossJoin(
                F.broadcast(_cb_arr(_cb_df(rows)))
            ).select(
                id_col,
                "subspace",
                "qvec",
                _best_cluster(F.col("__cb")).alias("cluster"),
            )

        cb_rows = sorted(
            (int(r["subspace"]), int(r["cluster"]), [int(x) for x in r["cvec"]])
            for r in centroids.collect()
        )
        for _ in range(iters):
            cb_rows = sorted(
                (int(r["subspace"]), int(r["cluster"]), [int(x) for x in r["cvec"]])
                for r in _per_dim_update(_assign(cb_rows)).collect()
            )
        sizes = (
            _assign(cb_rows)
            .groupBy("subspace", "cluster")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
        )
        return _finish(_cb_df(cb_rows), sizes)

    for _ in range(iters):
        assigned = subs.crossJoin(F.broadcast(_cb_arr(centroids))).select(
            id_col,
            "subspace",
            "qvec",
            _best_cluster(F.col("__cb")).alias("cluster"),
        )
        centroids = _per_dim_update(assigned)
    # The FINAL codeword relation (m·k tiny rows) is referenced twice —
    # the occupancy pass's broadcast and the returned join's left side —
    # and each reference re-derives the whole nested iteration tree over
    # the cached melted corpus. Pin it so the train lineage executes
    # once (the kmeans_fit shape).
    centroids = centroids.localCheckpoint(eager=True)
    sizes = (
        subs.crossJoin(F.broadcast(_cb_arr(centroids)))
        .select("subspace", _best_cluster(F.col("__cb")).alias("cluster"))
        .groupBy("subspace", "cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    return _finish(centroids, sizes)


def pq_encode(
    embeddings: DataFrame,
    codebook: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    col: str = "embedding",
    d: int | None = None,
) -> DataFrame:
    """Encode vectors as m integer codes (columns ``code_0..code_{m-1}``)
    plus the total quantization error ``q_err`` (exact integer math in
    the quantized domain).

    PURE PROJECTION: the m·k codebook collapses to ONE broadcast row
    holding an array of (subspace, code, cvec) structs, and each vector
    computes all m argmins inline — per subspace j, ``array_min`` of
    ``struct(d2, code)`` over the filtered subspace-j codewords. This
    replaces the previous melt (m rows per vector) + broadcast join +
    corpus-wide hash re-aggregation on vec_id: same exact-BIGINT
    distances, same struct-ordered tie-break (min d2, then min code),
    but zero shuffle and zero row inflation.

    ``d`` — the (constant) embedding dimension; pass it when known to
    skip the one-row probe job ``_dim`` costs."""
    if d is None:
        d = _dim(embeddings, col)
    sub = d // m
    cb_arr = codebook.select(
        "subspace",
        "code",
        F.transform(
            "centroid",
            lambda x: F.round(x * QUANT_SCALE, 0).cast("bigint"),
        ).alias("cvec"),
    ).agg(
        F.array_sort(
            F.collect_list(F.struct("subspace", "code", "cvec"))
        ).alias("__cb")
    )

    def _best(j: int) -> Column:
        svec = F.transform(
            F.slice(col, j * sub + 1, sub),
            lambda x: F.round(x.cast("double") * QUANT_SCALE, 0).cast(
                "bigint"
            ),
        )
        return F.array_min(
            F.transform(
                F.filter(F.col("__cb"), lambda c: c["subspace"] == F.lit(j)),
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(
                            svec, c["cvec"], lambda x, y: (x - y) * (x - y)
                        ),
                        F.lit(0).cast("bigint"),
                        lambda a, x: a + x,
                    ).alias("d2"),
                    c["code"].alias("code"),
                ),
            )
        )

    enc = embeddings.crossJoin(F.broadcast(cb_arr)).select(
        id_col, *[_best(j).alias(f"_best_{j}") for j in range(m)]
    )
    # An EMPTY codebook must yield 0 rows (the pre-projection inner-join
    # shape's result), not N rows of NULL codes: collect_list over zero
    # codewords still emits one agg row holding an empty array, the
    # crossJoin keeps every vector, and array_min(empty) = NULL — filter
    # those out, mirroring _assign_clusters' isNotNull guard.
    enc = enc.filter(
        reduce(
            lambda a, b: a & b,
            [F.col(f"_best_{j}").isNotNull() for j in range(m)],
        )
    )
    total_err = reduce(
        lambda a, b: a + b, [F.col(f"_best_{j}.d2") for j in range(m)]
    )
    return enc.select(
        id_col,
        *[F.col(f"_best_{j}.code").alias(f"code_{j}") for j in range(m)],
        total_err.cast("bigint").alias("q_err"),
    )


def build_pq_index(
    catalog,
    name: str,
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> None:
    """Train the PQ codebook once and persist it as the catalog table
    ``{name}__codebook`` — the same train-once/apply-many lifecycle as
    :func:`ann_index.build_ann_index`. The codebook is m·k tiny rows;
    rebuilds write a new snapshot version, so encodes racing a retrain
    read a consistent older codebook."""
    d = _dim(embeddings, col)
    cb = pq_train(
        embeddings, m=m, k=k, iters=iters, id_col=id_col, col=col, d=d
    )
    # geometry as table metadata: steady-state encodes read m and d for
    # free instead of paying a one-row dimension-probe job per call
    catalog.write(cb, f"{name}__codebook", meta={"m": int(m), "d": int(d)})


def encode_with_pq_index(
    catalog,
    name: str,
    embeddings: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> DataFrame:
    """Steady-state PQ encode off the PERSISTED codebook: one catalog
    read (m·k rows, broadcast) + one hash aggregate over the corpus — no
    subspace training, which is what the inline train+encode pays on
    every call. This is the path a 100 TB ingest pipeline runs per
    batch; the codebook retrains only on drift."""
    cb = catalog.read(f"{name}__codebook")
    meta = catalog.read_meta(f"{name}__codebook") or {}
    return pq_encode(
        embeddings, cb, m=m, id_col=id_col, col=col,
        d=int(meta["d"]) if "d" in meta else None,
    )


def adc_lut(
    queries: DataFrame,
    codebook: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    col: str = "embedding",
    query_id_col: str = "query_id",
    d: int | None = None,
) -> DataFrame:
    """Per-query ADC lookup table: the quantized distance from each query
    subvector to every codeword — |Q|·m·k tiny rows, meant to be
    broadcast. The corpus side then pays m integer lookup-adds per
    (query, vector) instead of a D-dim multiply-accumulate. Shared by
    :func:`pq_topk` (flat ADC) and
    :func:`ann_index.query_ivfpq_index` (IVF-pruned ADC)."""
    if d is None:
        d = _dim(queries, col)
    sub = d // m
    qsubs = queries.select(
        F.col(id_col).alias(query_id_col),
        F.posexplode(
            F.array(*[F.slice(col, j * sub + 1, sub) for j in range(m)])
        ).alias("subspace", "svec_f"),
    ).select(
        query_id_col,
        "subspace",
        F.transform(
            "svec_f",
            lambda x: F.round(x.cast("double") * QUANT_SCALE, 0).cast("bigint"),
        ).alias("svec"),
    )
    cb = codebook.select(
        "subspace",
        "code",
        F.transform(
            "centroid", lambda x: F.round(x * QUANT_SCALE, 0).cast("bigint")
        ).alias("cvec"),
    )
    return qsubs.join(F.broadcast(cb), "subspace").select(
        query_id_col,
        "subspace",
        "code",
        F.aggregate(
            F.zip_with("svec", "cvec", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("d_part"),
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebook: DataFrame,
    m: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes.

    Per query, the distance to every subspace centroid is precomputed
    into a |Q|·m·k_codes lookup table (tiny — broadcast); the corpus side
    then needs only m table lookups + adds per (query, vector) instead of
    a D-dim multiply-accumulate — the actual PQ speedup. Plan: encode
    corpus → melt codes to (vec, subspace, code) → broadcast-join the
    lookup table → one hash aggregate on (query, vec) summing m partial
    distances → per-query top-k via WindowGroupLimit.

    Exact integer math throughout; ties break on neighbor id.
    """
    from pyspark.sql import Window

    d = _dim(embeddings, col)
    codes = pq_encode(embeddings, codebook, m=m, id_col=id_col, col=col, d=d)
    melted = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(
            F.array(*[F.col(f"code_{j}") for j in range(m)])
        ).alias("subspace", "code"),
    )
    lut = adc_lut(
        queries, codebook, m=m, id_col=id_col, col=col,
        query_id_col=query_id_col, d=d,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        melted.join(F.broadcast(lut), ["subspace", "code"])
        .groupBy(query_id_col, "neighbor_id")
        .agg(F.sum("d_part").alias("adc_dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "adc_dist", "rank")
    )
