"""Generate a scaled synthetic SF by replicating sf0.1 with key offsets.

Usage: python tools/gen_sfx.py [N_REPLICAS] [OUT_DIR] [MODE]

MODE selects the cardinality shape of the scale-up (both are real shapes
a 100 TB corpus can take; a scale-safe engine must stay linear on both):

- ``wide`` (default): every join key is offset per replica, so the data
  has N× MORE GROUPS of unchanged size — joins stay referentially intact
  within a replica. This is the shape of ingesting N independent tenants.
- ``grow``: only PRIMARY keys are offset (uniqueness preserved); foreign
  keys keep their base values, and the dimension tables are copied once,
  so every dimension key's fact group is N× BIGGER (each customer has
  N× orders, each supplier N× lineitems). This is the shape of a tenant
  accumulating history — it catches per-group quadratics (a window or
  join whose cost is quadratic in partition size) that ``wide``
  replication structurally hides.
- ``zipf``: like ``grow`` (PKs offset, dims copied once) but replica i
  FOLDS every foreign key into the first ``K >> i`` keys of its 0-based
  contiguous domain (``k % max(K>>i, 1)``). Key 0 collects rows from
  every replica at fold multiplicity 1,2,4,…,2^(N-1) — a heavy-tailed
  group-size distribution where the hottest keys hold ~2^N/N× the
  average — while grow/wide keep groups uniform. This is the organic
  shape (users/parts/suppliers are never uniform at 100 TB) and the one
  the salted-agg / salted-join / AQE-skew paths exist for; uniform
  replication structurally hides the skew they handle. Deterministic
  (no RNG) and referentially intact: folded keys always exist in the
  once-copied dimension tables.
- ``hot``: like ``grow`` for keys, but skews the INDEX-INGEST surfaces
  (round-7 verdict #6): replica i>0 documents get ``i`` copies of a
  fixed four-token hot phrase appended AFTER the rotation, so four
  terms appear in ~90% of the 10× corpus with huge tf — their
  ``term_mod`` hash partitions dominate the lexical-index postings (the
  Zipf-vocabulary shape). Replicas 5..9 embeddings collapse onto one
  near-constant direction (0.1 + tiny deterministic jitter per
  (vec_id, dim)), so ~half the corpus lands in one k-means cluster —
  the hot-inverted-list shape for ANN append. Deterministic, no RNG.

Used for the sf1 spot-bench (BENCH_sf1.json). Document text is
per-replica character-rotated (10 distinct rotations) in both modes so
cross-replica docs share no shingles — near-dup pair structure stays
LINEAR in replicas instead of exploding quadratically on identical
copies. nation/region stay fixed (TPC-H dims that don't scale).
"""
from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx1"
MODE = sys.argv[3] if len(sys.argv) > 3 else "wide"

#: wide mode: every join key offsets per replica (more groups).
KEY_OFFSETS_WIDE = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
}

#: grow mode: only primary keys offset; FKs keep base values so each
#: dimension key's group grows N×. Dims are copied once (below).
KEY_OFFSETS_GROW = {
    "lineitem": ["l_orderkey"],  # FK to replicated orders; part/supp stay
    "orders": ["o_orderkey"],  # PK; o_custkey stays → N× orders/customer
    "documents": ["doc_id"],
}

#: zipf mode: PK offsets identical to grow; these FK columns additionally
#: fold per replica into a shrinking key prefix (k % max(K>>i, 1)). The
#: fold domain K is each column's 0-based contiguous key-space size,
#: measured from the base data at runtime.
ZIPF_FOLD_FKS = {
    "lineitem": ["l_partkey", "l_suppkey"],
    "orders": ["o_custkey"],
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
    if MODE not in ("wide", "grow", "zipf", "hot"):
        raise SystemExit(f"unknown mode {MODE!r}; use wide|grow|zipf|hot")
    key_offsets = KEY_OFFSETS_WIDE if MODE == "wide" else KEY_OFFSETS_GROW
    copied = ["nation", "region"] + (
        ["customer", "part", "supplier"]
        if MODE in ("grow", "zipf", "hot")
        else []
    )
    # zipf fold domains: 0-based contiguous key-space size per FK column.
    fold_k: dict[str, int] = {}
    if MODE == "zipf":
        for tbl, fks in ZIPF_FOLD_FKS.items():
            base = spark.read.parquet(f"{SRC}/{tbl}.parquet")
            for k in fks:
                fold_k[k] = base.agg(F.max(k)).first()[0] + 1
        print(f"zipf fold domains: {fold_k}", flush=True)
    for tbl, keys in key_offsets.items():
        base = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        parts = []
        for i in range(N):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * OFFSET_UNIT))
            if MODE == "zipf":
                for k in ZIPF_FOLD_FKS.get(tbl, ()):
                    m = max(fold_k[k] >> i, 1)
                    df = df.withColumn(k, F.col(k) % F.lit(m))
            if tbl == "documents":
                rot = ALPHA[i:] + ALPHA[:i]
                df = df.withColumn("text", F.translate("text", ALPHA, rot))
                if MODE == "hot" and i > 0:
                    # Zipf vocabulary: four fixed terms land in ~90% of
                    # the scaled corpus with tf growing by replica — a
                    # handful of term_mod hash partitions dominate the
                    # postings (appended AFTER rotation so the hot terms
                    # are identical corpus-wide).
                    df = df.withColumn(
                        "text",
                        F.concat(
                            F.col("text"),
                            F.lit(" " + "zqhot0 zqhot1 zqhot2 zqhot3 " * i),
                        ),
                    )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{OUT}/{tbl}.parquet"
        )
        print(f"{tbl}: {N}x written ({MODE})", flush=True)
    # embeddings: vec_id offset + per-replica dimension ROTATION — same
    # norms and value distribution, but cross-replica vectors differ in
    # every dimension, so cosine-pair structure stays linear in replicas
    # (identical copies would pair quadratically across replicas).
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    eparts = []
    for i in range(N):
        df = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFFSET_UNIT))
        if MODE == "hot" and i >= N // 2:
            # hot inverted lists: the upper half of the replicas collapse
            # onto one near-constant direction (dominant 0.1 in every
            # dim, deterministic per-(vec_id, dim) jitter keeps vectors
            # distinct) — after k-means, ~half the corpus shares one
            # cluster, the worst-case list for ANN append/probe.
            df = df.withColumn(
                "embedding",
                F.expr(
                    "transform(sequence(1, 64), j -> CAST("
                    "0.1 + ((vec_id * 7 + j) % 13) * 0.0001 AS FLOAT))"
                ),
            )
        elif i > 0:
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
    # events: event_id (PK) always offsets; user_id offsets only in wide
    # mode — grow mode keeps it, so every user's event stream is N× longer
    # (the shape that stresses per-user windows/sessionization). ts shifts
    # i seconds per replica so replicated rows stay time-distinct without
    # changing the hour-scale gap structure. Read through the same nanos
    # normalization as the engine's loader.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif dict(ev.dtypes)["ts"] != "timestamp":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    u_dom = ev.agg(F.max("user_id")).first()[0] + 1 if MODE == "zipf" else 0
    vparts = []
    for i in range(N):
        df = ev.withColumn("event_id", F.col("event_id") + F.lit(i * OFFSET_UNIT))
        if MODE == "wide":
            df = df.withColumn("user_id", F.col("user_id") + F.lit(i * OFFSET_UNIT))
        elif MODE == "zipf":
            # fold each replica's users into a shrinking prefix — the
            # hottest users end up with ~2^N/N× the average event count
            # (per-user windows/sessionization under organic skew).
            df = df.withColumn(
                "user_id", F.col("user_id") % F.lit(max(u_dom >> i, 1))
            )
        if i > 0:
            df = df.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {i} SECOND")
            )
        vparts.append(df)
    vout = vparts[0]
    for p in vparts[1:]:
        vout = vout.unionByName(p)
    vout.repartition(32).write.mode("overwrite").parquet(
        f"{OUT}/events.parquet"
    )
    print(f"events: {N}x written ({MODE})", flush=True)
    for tbl in copied:
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{tbl}.parquet")
        print(f"{tbl}: copied", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
