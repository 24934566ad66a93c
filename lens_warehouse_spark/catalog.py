"""Catalog: scale-factor directory -> named DataFrames / temp views.

Reference parity: lens-warehouse's "catalog" is its Datomic schema — a
fixed set of entity types declared up front (public repo
``src/lens/schema.clj``; SURVEY.md §2.1 S1/S5). Here the fixed set is the
ten driver tables; schemas come from parquet footers (never inferred).

Scale notes: ``spark.read.parquet`` is the vectorized reader; predicate
pushdown + column pruning reach the row-group level for free once plans
are declarative. At 100 TB these tables would be date-partitioned
directories — the API stays identical, only the path layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
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
]

# Dims small enough to always broadcast in joins (SURVEY.md §2.3 J2).
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (S1). Lazy; Catalyst prunes columns/predicates.

    Timestamp discipline (two on-disk generations seen from the driver):

    - tz-naive ``timestamp[us]/[ms]`` columns (current data): Spark 4
      infers these as TIMESTAMP_NTZ by default, which is session-tz
      dependent under functions like ``unix_millis`` and rejected by
      ``withWatermark``. We disable NTZ inference so they read as legacy
      TIMESTAMP (LTZ): raw micros interpreted as UTC instants —
      session-tz independent and exactly what DuckDB's ``epoch_ms`` sees
      in the same file.
    - ``events.ts`` nanosecond-precision (earlier data): Spark's reader
      rejects ns (PARQUET_TYPE_ILLEGAL); read as raw INT64 nanos via the
      legacy conf and rebuild a microsecond timestamp with exact integer
      arithmetic (``div 1000`` floors, matching DuckDB's ns->us
      truncation of the same file).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """S5: register all tables as session temp views for spark.sql()."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
