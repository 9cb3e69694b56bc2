"""Fixture-table loaders.

The driver testdata is one parquet file per table under an ``sf`` dir
(``TESTDATA.md``). At 100 TB each "table" would be a partitioned parquet
/ Delta directory; ``spark.read.parquet`` takes directories the same way,
so nothing here changes at scale — Catalyst still gets pushdown, pruning
and split planning from the parquet footers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; one of {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _normalize_event_ts(df)
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as long nanos.
    Truncate (floor) to µs timestamps — exactly what DuckDB does when it
    reads the same file, so oracle comparisons line up."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]
