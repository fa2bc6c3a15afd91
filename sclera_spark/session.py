"""SparkSession factory tuned for the engine.

The reference (scleradb/sclera) executes everything on a single thread with
H2 round-trips (see SURVEY.md §4.2); here the session is the execution
engine, so the knobs below are the scale story:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast conversion replace Sclera's (absent) cost-based planning.
- Arrow on: every pandas-UDF-backed custom operator (MATCH, ALIGN, SPLIT)
  moves data in columnar batches, not pickled rows.
- shuffle.partitions sized by caller: tests use small counts for tiny SFs;
  at 100 TB a deployment would set this (or rely on AQE target size) so that
  post-shuffle partitions land in the 100-200 MB range.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "sclera-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # --- scale/perf posture ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # deterministic session timezone so timestamp semantics match DuckDB
        .config("spark.sql.session.timeZone", "UTC")
        # read TIMESTAMP(NANOS) parquet columns as long; Catalog converts
        # them to microsecond timestamps (DuckDB-compatible truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write timestamps as TIMESTAMP_MICROS, not legacy INT96: INT96
        # columns carry NO parquet column statistics, which blinds both
        # row-group pruning and the manifest tier's file-level data
        # skipping on every timestamp column
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        # heap CAP, not a commitment: 16g forced GC churn between bench
        # queries in one warm session (measured: split_intervals median
        # 3.3 s at 16g vs 1.4 s at 48g in the full suite, identical in
        # isolation) — single-JVM local mode on a 128 GiB box wants room
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
