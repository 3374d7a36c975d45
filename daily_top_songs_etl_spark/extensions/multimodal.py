"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side contract (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested. The actual codecs (PIL/ffmpeg/librosa) are
not in this container, so the decode kernels are STUBBED: a deterministic
fake decoder behind ``fake=True`` (used by tests) and a clearly marked
``NotImplementedError`` on the real path.

Scale notes: binary payloads dominate row size, so ``mapInPandas`` with
``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned down (the default
10k rows × multi-MB payloads would blow executor memory); feature outputs
are tiny relative to inputs, so project early and drop the payload column
as soon as features are extracted.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

# feat is array<double>: the fake decoder emits d/255.0 in float64, and the
# DuckDB oracle computes the identical IEEE-double division — float32 would
# perturb the 9-significant-digit comparison.
FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, digest string, "
    "feat array<double>"
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake corpus for tests (payload = repeated digest
    bytes, metadata consistent with `kind`)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.md5(str(i).encode()).digest() * (i % 7 + 1)
        meta = {
            "width": 64 + i if kind != "audio" else None,
            "height": 48 + i if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": i % 30 + 1 if kind == "video" else None,
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    ``fake=True``: deterministic 8-dim feature from the payload digest —
    exercises the full distributed path (schema, batching, null payloads)
    without codecs. ``fake=False`` raises until real codecs exist.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not available "
                    "in this environment; use fake=True"
                )
            feats, digests, sizes = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    digests.append(None)
                    sizes.append(0)
                    feats.append(None)
                    continue
                d = hashlib.md5(bytes(payload)).hexdigest()
                digests.append(d)
                sizes.append(len(payload))
                feats.append([int(d[j : j + 2], 16) / 255.0 for j in range(0, 16, 2)])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "digest": digests,
                    "feat": feats,
                }
            )

    # The Python kernel is the per-core bottleneck: if the scan arrives
    # under-partitioned (small corpus = few files), fan out to the session
    # default parallelism so every core hosts a worker. At scale the scan
    # already has >= parallelism partitions and this is a no-op (no
    # shuffle is ever added for the big-corpus case).
    sc = media.sparkSession.sparkContext
    target = sc.defaultParallelism
    if media.rdd.getNumPartitions() < target:
        media = media.repartition(target)
    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """The resize operator's *plan* side: computes target dims from
    metadata JVM-side (no Python), so only rows actually needing decode
    reach the UDF — the predicate-pushdown pattern for media pipelines."""
    needs = (F.col("meta.width") > max_side) | (F.col("meta.height") > max_side)
    scale = F.least(
        F.lit(max_side) / F.col("meta.width"),
        F.lit(max_side) / F.col("meta.height"),
    )
    return media.withColumn("needs_resize", F.coalesce(needs, F.lit(False))).withColumn(
        "target_width",
        F.when(needs, F.floor(F.col("meta.width") * scale)).otherwise(
            F.col("meta.width")
        ).cast("int"),
    ).withColumn(
        "target_height",
        F.when(needs, F.floor(F.col("meta.height") * scale)).otherwise(
            F.col("meta.height")
        ).cast("int"),
    )


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per selected
    frame index, produced by sequence+explode JVM-side; the decode of the
    selected frames is the (stubbed) kernel above."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1,
                    F.lit(every_n),
                )
            ),
        )
        .select("media_id", "frame_idx", "meta")
    )
