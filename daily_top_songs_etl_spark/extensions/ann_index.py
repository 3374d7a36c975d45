"""Persisted ANN index lifecycle: train once, store in the catalog,
query many times.

The inline `ivf_topk` re-assigns the corpus per query call; a production
index amortizes that: `build_ann_index` fits k-means centroids and
materializes the inverted lists — each corpus vector stored WITH its
pre-quantized components and norm under its cluster key — into versioned
catalog tables. `query_ann_index` then touches only the centroid table
(tiny, broadcast) and the ~n_probe/n_centroids fraction of the stored
lists; no corpus-wide pass, no re-quantization. At scale the lists table
is partitioned/clustered by `cluster`, so a probe is a partition-pruned
scan — the Spark analogue of reading an IVF posting list.

Rebuilding writes new snapshot versions (catalog semantics), so queries
racing a rebuild read a consistent older index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from .similarity import QUANT_SCALE, _dot, _norm, kmeans_fit, quantize_embeddings


def _centroid_rel(centroids: DataFrame) -> DataFrame:
    return centroids.select(
        F.col("cluster").alias("cent_id"),
        F.transform(
            "centroid", lambda x: F.round(x * QUANT_SCALE, 0).cast("bigint")
        ).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))


def build_ann_index(
    catalog: Catalog,
    name: str,
    embeddings: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
) -> None:
    """Fit the coarse quantizer and materialize centroids + inverted
    lists as catalog tables ``{name}__centroids`` / ``{name}__lists``."""
    centroids = kmeans_fit(
        embeddings, k=n_centroids, iters=iters, id_col=id_col
    )
    catalog.write(
        centroids.select("cluster", "centroid", "n_vectors"),
        f"{name}__centroids",
    )
    cent = _centroid_rel(catalog.read(f"{name}__centroids"))
    base = quantize_embeddings(embeddings).select(
        F.col(id_col).alias("vec_id"),
        F.col("qvec").alias("v"),
        _norm(F.col("qvec")).alias("nv"),
    )
    cos_c = F.round(
        _dot(F.col("v"), F.col("cv")).cast("double")
        / (F.col("nv") * F.col("cn")),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__cos").desc(), F.col("cent_id")
    )
    lists = (
        base.crossJoin(F.broadcast(cent))
        .withColumn("__cos", cos_c)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", F.col("cent_id").alias("cluster"), "v", "nv")
    )
    # The inverted lists are PARTITIONED by cluster, so a probe is a
    # partition-pruned read of ~n_probe/n_centroids of the index — the
    # on-disk analogue of an IVF posting list (query_ann_index collects
    # the ≤ |Q|·n_probe probe clusters into a static partition filter).
    catalog.write(lists, f"{name}__lists", partition_by=["cluster"])


def query_ann_index(
    catalog: Catalog,
    name: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the stored index: per-query nearest ``n_probe`` centroids →
    join only those inverted lists → exact cosine re-rank off the
    PRE-QUANTIZED stored components."""
    cent = _centroid_rel(catalog.read(f"{name}__centroids"))
    lists = catalog.read(f"{name}__lists")
    q = quantize_embeddings(queries).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q"),
        _norm(F.col("qvec")).alias("nq"),
    )
    cos_c = F.round(
        _dot(F.col("q"), F.col("cv")).cast("double")
        / (F.col("nq") * F.col("cn")),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("cent_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("__cos", cos_c)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "q", "nq", F.col("cent_id").alias("cluster"))
    ).localCheckpoint(eager=False)  # feeds the partition filter AND the join
    # Static partition pruning: the probed cluster set (≤ |Q|·n_probe,
    # bounded by n_centroids) restricts the lists scan to its partitions —
    # PartitionFilters: [cluster IN (...)] instead of a full index read.
    probe_clusters = [
        r.cluster for r in probes.select("cluster").distinct().collect()
    ]
    cosine = _dot(F.col("q"), F.col("v")).cast("double") / (
        F.col("nq") * F.col("nv")
    )
    scored = (
        lists.filter(F.col("cluster").isin(probe_clusters))
        .join(F.broadcast(probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
