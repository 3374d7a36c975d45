"""Generate a scaled synthetic SF by replicating sf0.1 with key offsets.

Usage: python tools/gen_sfx.py [N_REPLICAS] [OUT_DIR]

Used for the sf1 spot-bench (BENCH_sf1.json): each replica offsets every
join key consistently (orderkey/partkey/suppkey/custkey/doc_id), so joins
stay referentially intact within a replica and the data volume scales
linearly. Document text is per-replica character-rotated (10 distinct
rotations) so cross-replica docs share no shingles — near-dup pair
structure stays LINEAR in replicas instead of exploding quadratically on
identical copies. nation/region stay fixed (TPC-H dims that don't scale).
"""
from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx1"

KEY_OFFSETS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
}
# offset units: max key magnitude per keyed id space, from sf0.1 + headroom
OFFSET_UNIT = 10_000_000

ALPHA = "abcdefghij"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for tbl, keys in KEY_OFFSETS.items():
        base = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        parts = []
        for i in range(N):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * OFFSET_UNIT))
            if tbl == "documents":
                rot = ALPHA[i:] + ALPHA[:i]
                df = df.withColumn("text", F.translate("text", ALPHA, rot))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{OUT}/{tbl}.parquet"
        )
        print(f"{tbl}: {N}x written", flush=True)
    # embeddings: vec_id offset + per-replica dimension ROTATION — same
    # norms and value distribution, but cross-replica vectors differ in
    # every dimension, so cosine-pair structure stays linear in replicas
    # (identical copies would pair quadratically across replicas).
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    eparts = []
    for i in range(N):
        df = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFFSET_UNIT))
        if i > 0:
            df = df.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", i + 1, 64 - i),
                    F.slice("embedding", 1, i),
                ),
            )
        eparts.append(df)
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(32).write.mode("overwrite").parquet(
        f"{OUT}/embeddings.parquet"
    )
    print(f"embeddings: {N}x written", flush=True)
    for tbl in ("nation", "region"):
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{tbl}.parquet")
        print(f"{tbl}: copied", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
