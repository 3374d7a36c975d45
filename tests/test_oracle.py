"""Local mirror of the driver's DuckDB-oracle correctness gate.

For every entry in ``__spark_entry__.queries()`` with an oracle, run both
engines on the same parquet tables and compare row count, column names, and
the order-insensitive multiset of values (floats to 9 significant digits —
stricter than any reasonable hash the driver could use).
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    # Bound DuckDB and give it a spill location OUTSIDE the repo: an
    # uncapped run against a scaled dataset once filled the disk with an
    # 84 GB temp file in ./.tmp before the OS killed anything.
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill_tests'")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a DIRECTORY of part files (the
            # tools/gen_sfx.py 10x datasets) — DuckDB needs the glob.
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(v):
    """Canonicalize a cell for order-insensitive multiset comparison."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (dt.date,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


QUERY_NAMES = sorted(entrymod.queries().keys())

# Fast-tier oracle core (round-12 verdict item 1): the default suite run
# checks this band — the headline 7, every face the round-11/12
# optimization waves touched (index lifecycles, merges, matviews,
# streams, kmeans/pq families, the profiled §2 walls), and at least one
# face per remaining family — and defers the long tail of the 225-query
# sweep to the slow tier (SPARK_GRAFT_SLOW_TESTS=1 runs all of them,
# which the builder does in-session before committing; the driver's own
# oracle harness independently samples the full registry every round).
ORACLE_FAST = {
    # headline band
    "pricing_summary", "flagship_delta", "priority_dedup",
    "topk_per_group", "string_agg", "left_join", "window_gap",
    # index lifecycles + merges (round-11 waves; round-12 commit work)
    "ann_index_build", "ann_index_append", "ann_index_refine",
    "ann_index_delete", "ann_index_merge", "ann_index_query",
    "ivfpq_index_build", "ivfpq_append", "ivfpq_merge", "ivfpq_query",
    "pq_index_build", "pq_codes", "pq_encode_apply",
    "pq_subspace_assign", "pq_topk_adc",
    "text_index_build", "text_index_append", "text_index_compact",
    "text_index_merge", "text_index_query",
    "dedup_index_build", "dedup_index_compact", "dedup_index_merge",
    "dedup_index_query",
    # kmeans / similarity family (argmin-as-projection rewrites)
    "kmeans", "kmeans_assign", "kmeans_update", "cluster_drift",
    "embedding_centroids", "sim_topk_ivf", "sim_topk_bruteforce",
    # matviews + streams (exactly-once state)
    "matview_refresh", "matview_retract", "matview_partition_refresh",
    "matview_partition_retract", "sketch_stream_state",
    "vector_stream_state", "stream_dedup", "stream_source_quota",
    "incremental_agg", "cms_incremental", "cms_topk",
    # round-12 profiled walls (§2/§3 targets this round)
    "dedup_apply", "robust_outliers", "triangle_count",
    "funnel_conversion", "gapfill_daily", "fuzzy_pairs", "dedup_exact",
    # one per remaining family
    "bm25_topk", "tfidf_topk", "decontaminate", "bloom_decontaminate",
    "dedup_jaccard_lsh", "dedup_simhash", "sessionize", "pagerank",
    "bpe_train", "bpe_encode", "vocab_build", "mixture_sample",
    "source_quota", "multimodal_features", "exact_quartiles",
    "heavy_hitters", "asof_join", "range_join", "scd2_apply",
    "pretrain_funnel", "text_normalize", "pack_chunks", "pmi_topk",
}


def test_oracle_fast_band_is_a_registry_subset():
    """Every ORACLE_FAST name must exist in the registry — a renamed or
    dropped face must fail HERE, not silently shrink the fast gate."""
    missing = ORACLE_FAST - set(QUERY_NAMES)
    assert not missing, f"ORACLE_FAST names not in registry: {sorted(missing)}"


QUERY_PARAMS = [
    name
    if name in ORACLE_FAST
    else pytest.param(name, marks=pytest.mark.slow)
    for name in QUERY_NAMES
]


@pytest.mark.parametrize("name", QUERY_PARAMS)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        # Non-SQL-expressible op: the driver records a rows-only check.
        assert len(srows) >= 0
        return
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    # Vacuity guard (round 4): a hash-match over EMPTY result sets proves
    # nothing — four queries silently compared 0=0 for three rounds, one
    # of them masking a DuckDB date-pushdown quirk that would have become
    # a spurious driver mismatch the day the Spark side turned nonempty.
    # Every oracle-paired query must return rows at every tested SF; a
    # genuinely-empty-by-design query needs an explicit exemption here.
    assert len(srows) > 0, f"{name}: vacuous check — 0 rows on both engines"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sm = _rows_to_multiset(scols, [[r[c] for c in scols] for r in srows])
    dm = _rows_to_multiset(dcols, drows)
    mism = [(a, b) for a, b in zip(sm, dm) if a != b]
    assert not mism, f"{name}: {len(mism)} value mismatches; first: {mism[:3]}"

    # Second face: the PANDAS conversion path an external harness uses
    # (toPandas vs duckdb .df() + string formatting). This catches
    # representation hazards the native-row compare above structurally
    # cannot: nullable DATE → object-None (Spark) vs datetime64-NaT
    # (DuckDB), DECIMAL(38,0) → exact Decimal vs lossy float64, etc.
    spdf = sdf.toPandas().reindex(sorted(scols), axis=1)
    dpdf = duck.execute(sql).df().reindex(sorted(dcols), axis=1)
    sset = sorted("|".join(r) for r in spdf.astype(str).values.tolist())
    dset = sorted("|".join(r) for r in dpdf.astype(str).values.tolist())
    pmism = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not pmism, (
        f"{name}: pandas-path mismatch "
        f"(dtypes spark={dict(spdf.dtypes.astype(str))} "
        f"duck={dict(dpdf.dtypes.astype(str))}); first: {pmism[:2]}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns


def test_rows_only_annotation_is_exactly_the_unpaired_set():
    """rows_only() must name EXACTLY the registry queries without an
    oracle — no silent drift in either direction (round-6 verdict #5:
    no query whose verification status is implicit)."""
    unpaired = set(entrymod.queries()) - set(entrymod.oracle_sql())
    assert unpaired == set(entrymod.rows_only())


def test_rows_only_epsilon_bounds(spark, duck):
    """Engine-side statistical/invariant bounds for the 5 rows-only
    queries, at the SAME scale factor the oracle sweep runs (so both
    the sf0.01 and sf0.1 sweeps exercise them) — the verification these
    queries carry INSTEAD of a value hash."""
    from pyspark.sql import functions as F

    qs = entrymod.queries()

    # approx_distinct_users / incremental_distinct: HLL estimate within
    # 10% of the exact distinct count per event_type (exact from DuckDB)
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    for qname, col in (
        ("approx_distinct_users", "n_users_approx"),
        ("incremental_distinct", "approx_n_distinct"),
    ):
        got = {r["event_type"]: r[col] for r in qs[qname](spark, SF_DIR).collect()}
        assert set(got) == set(exact), qname
        for k, est in got.items():
            assert abs(est - exact[k]) / exact[k] <= 0.10, (qname, k, est, exact[k])

    # approx_percentile: within 2% of the exact per-group percentile
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    ex = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for r in qs["approx_percentile"](spark, SF_DIR).collect():
        e = ex[r["l_returnflag"]]
        for ap, exv in (
            (r["p50_approx"], e["p50"]),
            (r["p95_approx"], e["p95"]),
            (r["p99_approx"], e["p99"]),
        ):
            assert abs(ap - exv) / exv < 0.02, (r["l_returnflag"], ap, exv)

    # text_compress_ratio: one row per document; ratio in (0, 1.2] for
    # non-empty docs (zlib overhead can exceed 1 only on tiny inputs),
    # NULL ratio exactly when the doc is empty
    crows = qs["text_compress_ratio"](spark, SF_DIR).collect()
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(crows) == n_docs
    for r in crows:
        if r["n_bytes"] == 0:
            assert r["compress_ratio"] is None
        else:
            assert 0.0 < r["compress_ratio"] <= 1.2, r

    # text_normalize: row-preserving, and IDEMPOTENT — normalizing the
    # normalized text changes nothing (changed=False on every row of a
    # second pass)
    from daily_top_songs_etl_spark.extensions.text import normalize_unicode

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    norm1 = normalize_unicode(docs)
    assert norm1.count() == n_docs
    norm2 = normalize_unicode(
        norm1.select("doc_id", F.col("norm_text").alias("text"))
    )
    assert norm2.filter(F.col("changed")).count() == 0
    # unchanged rows really are byte-identical to their input
    bad = (
        norm1.join(docs.select("doc_id", "text"), "doc_id")
        .filter(
            (~F.col("changed")) & F.col("text").isNotNull()
            & (F.col("norm_text") != F.col("text"))
        )
        .count()
    )
    assert bad == 0
