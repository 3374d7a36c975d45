"""Additional dataset formats: JSONL (with corrupt-record capture), ORC,
and raw text.

The reference consumes JSON payloads (Spotify API responses,
``etl_pipeline.py:326-363``; ld+json blocks, ``:472-484``) and re-emits
CSV; a standalone engine must also ingest those payloads when they arrive
as files. JSONL is the landing format for API-response archives, ORC the
interchange format with Hive-era warehouses, raw text the corpus format
for the document pipeline.

Scale notes: all three readers are Spark's native vectorized sources —
schema declared up front (never runtime inference, which costs an extra
full scan and can drift between runs), splittable by file, predicate/
column pruning intact. Corrupt JSONL rows are CAPTURED, not dropped:
PERMISSIVE mode routes unparseable lines into a quarantine column so a
load can report exactly what it rejected (the reference's staging-table
pattern, ``create_temporary_tables.sql`` — land everything, validate
explicitly)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_jsonl", "write_jsonl", "read_orc", "write_orc", "read_text"]

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON with a declared schema.

    Returns ``(good, quarantined)``: rows parsing cleanly under the
    schema, and raw lines that did not (one string column with the
    original line), mirroring the reference's land-then-validate staging
    hop. The two scans share Spark's file index; the quarantine side
    prunes to the corrupt column only.
    """
    # Parse via text + from_json rather than the JSON file source: Spark
    # refuses plans whose scan references only the internal corrupt
    # column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is exactly what a
    # quarantine query does. A text scan has no such restriction, stays
    # splittable, and parses each line once.
    full = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    raw = spark.read.text(path).select(
        "value",
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_p"),
    )
    good = raw.filter(F.col(f"_p.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"_p.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = raw.filter(F.col(f"_p.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write newline-delimited JSON (one object per line, UTF-8)."""
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC scan with declared schema — vectorized, predicate-pushdown
    capable (ORC carries per-stripe min/max like Parquet row groups)."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_text(
    spark: SparkSession, path: str, doc_per_file: bool = False
) -> DataFrame:
    """Raw text corpus: one row per line (default) or per file
    (``wholetext`` — for the document pipeline where a file IS a
    document; non-splittable, so per-file parallelism only)."""
    return spark.read.text(path, wholetext=doc_per_file)


def read_parquet_resilient(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    ignore_corrupt: bool = True,
) -> DataFrame:
    """Parquet scan that survives corrupt/truncated files in the input
    layout — the operational reality of petabyte landing zones (a failed
    upload leaves a torn file; one bad object must not kill a 100 TB
    job). Spark's ``ignoreCorruptFiles`` skips unreadable FILES at scan
    time (footer/magic-byte validation); pair with the JSONL quarantine
    reader for row-level corruption.

    Scoped per-read via DataFrameReader options, NOT session-wide conf:
    a global ignoreCorruptFiles silently masks real data loss in jobs
    that should fail loudly.
    """
    reader = spark.read.option(
        "ignoreCorruptFiles", "true" if ignore_corrupt else "false"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
