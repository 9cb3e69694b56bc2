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
    """Normalize events.ts to session-TZ TIMESTAMP regardless of how the
    fixture was written.

    Two writer generations exist: parquet TIMESTAMP(NANOS) (rejected by
    Spark's reader; ``spark.sql.legacy.parquet.nanosAsLong`` surfaces it
    as long nanos, truncated here to µs exactly like DuckDB truncates) and
    parquet timestamp[us] with isAdjustedToUTC=false, which Spark reads as
    TIMESTAMP_NTZ — a type strict functions like ``unix_micros`` reject.
    With the session TZ pinned to UTC (session.py), casting NTZ→TIMESTAMP
    maps wall-clock to the same instants DuckDB's naive reading produces,
    so oracle comparisons line up either way."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]
