"""daily_top_songs_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL (``jarell-santella/daily-top-songs-etl``), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, columnar
Parquet storage, set-level batch operators in place of per-row triggers, and
incremental micro-batch ingestion in place of a daily cron.

Subpackages
-----------
- ``session``     SparkSession factory (AQE, UTC, sized shuffle partitions)
- ``schemas``     explicit StructTypes for every table and in-flight record
- ``catalog``     Parquet-backed table catalog (partitioning, read/write)
- ``operators``   upsert/merge/maintain/top-k/delta — the §2 operator core
- ``functions``   scalar expression library (song-info, escaping, enum sort)
- ``plans``       the three canonical views + report rendering
- ``sources``     CSV seed bootstrap, offline-first HTTP ingest shim, sinks
- ``streaming``   Structured-Streaming incremental ingestion + window ops
- ``extensions``  large-scale training-data ops: dedup, ANN, text, multimodal
"""

__version__ = "0.1.0"
