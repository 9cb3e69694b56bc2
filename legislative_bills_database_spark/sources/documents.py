"""JSON document-model ingestion: the reference's core data model.

One JSON file per bill / per person, laid out as
``data/<session title>/CA/<session_title_underscored>/{bill,people}/*.json``
(legiscan_search_all_bills.R:71-78; legislator_bill_counts_run.R:54-75).
Schemas are DECLARED (FIXTURES.md §A) — schema inference at 100 TB is a
full extra pass over the data; ``spark.read.json`` with an explicit
StructType prunes unread fields at the parser.

The directory tree IS the catalog: the session partition is recovered
from ``input_file_name()`` and the document key from the file name, which
is exactly the reference's ``list.files`` + ``gsub('.json','',...)``
catalog scan re-expressed so Catalyst sees it as ordinary columns.

Scale note: millions of tiny JSON files are an HDFS/S3 anti-pattern;
:func:`legislative_bills_database_spark.sources.cache.memo_parquet` is the
staging path — read the tree once, persist parquet, query the staging
table thereafter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# FIXTURES.md §A.1 — fields the reference actually reads, with citations.
BILL_SCHEMA = StructType(
    [
        StructField(
            "bill",
            StructType(
                [
                    StructField("bill_number", StringType()),
                    StructField("bill_type", StringType()),
                    StructField("status", IntegerType()),
                    StructField("status_date", StringType()),
                    StructField("title", StringType()),
                    StructField("description", StringType()),
                    StructField(
                        "session",
                        StructType([StructField("session_name", StringType())]),
                    ),
                    StructField(
                        "texts",
                        ArrayType(
                            StructType(
                                [
                                    StructField("doc_id", LongType()),
                                    StructField("type", StringType()),
                                    StructField("state_link", StringType()),
                                ]
                            )
                        ),
                    ),
                    StructField(
                        "sponsors",
                        ArrayType(
                            StructType(
                                [
                                    StructField("people_id", LongType()),
                                    StructField("sponsor_type_id", IntegerType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)

# FIXTURES.md §A.2 — legislator_bill_counts_run.R:77-81.
PERSON_SCHEMA = StructType(
    [
        StructField(
            "person",
            StructType(
                [
                    StructField("people_id", LongType()),
                    StructField("role", StringType()),
                    StructField("name", StringType()),
                    StructField("district", StringType()),
                    StructField("committee_id", IntegerType()),
                ]
            ),
        )
    ]
)


def session_title(start_year: int) -> str:
    """'2023-2024 Regular Session' — sessions start on odd years
    (legiscan_search_all_bills.R:71-73)."""
    return f"{start_year}-{start_year + 1} Regular Session"


def session_dir(data_root: str, title: str, kind: str) -> str:
    """data/<title>/CA/<title_underscored>/<kind> (legislator_bill_counts_run.R:59,74)."""
    return f"{data_root}/{title}/CA/{title.replace(' ', '_')}/{kind}"


def _with_catalog_columns(df: DataFrame) -> DataFrame:
    """Recover (session, doc_key) from the file path — the reference's
    list.files catalog (legiscan_search_all_bills.R:74-75) as columns.

    input_file_name() yields URL-encoded URIs ('%20' for the spaces in
    session titles) — decode before extracting."""
    path = F.url_decode(F.input_file_name())
    return df.withColumn(
        "session", F.regexp_extract(path, r"/([^/]+)/CA/", 1)
    ).withColumn(
        "doc_key", F.regexp_extract(path, r"/([^/]+)\.json$", 1)
    )


def read_bills(
    spark: SparkSession,
    data_root: str,
    sessions: list[str] | None = None,
) -> DataFrame:
    """Flat bill table from the JSON document tree.

    ``sessions`` restricts the read to those session directories —
    partition pruning by path, the engine twin of the reference reading
    only configured sessions (legiscan_search_all_bills.R:48,71-73).
    """
    if sessions is None:
        paths = [f"{data_root}/*/CA/*/bill/*.json"]
    else:
        paths = [f"{session_dir(data_root, s, 'bill')}/*.json" for s in sessions]
    raw = spark.read.schema(BILL_SCHEMA).option("multiLine", True).json(paths)
    return _with_catalog_columns(raw).select(
        "session",
        "doc_key",
        F.col("bill.bill_number").alias("bill_number"),
        F.col("bill.bill_type").alias("bill_type"),
        F.col("bill.status").alias("status"),
        F.col("bill.status_date").alias("status_date"),
        F.col("bill.title").alias("title"),
        F.col("bill.description").alias("description"),
        F.col("bill.session.session_name").alias("session_name"),
        F.col("bill.texts").alias("texts"),
        F.col("bill.sponsors").alias("sponsors"),
    )


def stage_document_model(
    spark: SparkSession,
    data_root: str,
    staging_dir: str,
    force: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(bills, people) from parquet staging, built from the JSON tree on
    first use (sources.cache.memo_parquet).

    This is the 100 TB entry point: the JSON tree (millions of small
    files) is read ONCE, landed as columnar parquet with footer stats,
    and every query thereafter scans the staging tables — the engine twin
    of the reference's RDS memo-cache (legiscan_data_pull.R:17-35) minus
    its stale-path bug."""
    from .cache import memo_parquet

    bills = memo_parquet(
        spark, f"{staging_dir}/bills", lambda: read_bills(spark, data_root), force
    )
    people = memo_parquet(
        spark, f"{staging_dir}/people", lambda: read_people(spark, data_root), force
    )
    return bills, people


def read_people(
    spark: SparkSession,
    data_root: str,
    sessions: list[str] | None = None,
) -> DataFrame:
    """Flat person table from the JSON document tree
    (legislator_bill_counts_run.R:72-87)."""
    if sessions is None:
        paths = [f"{data_root}/*/CA/*/people/*.json"]
    else:
        paths = [f"{session_dir(data_root, s, 'people')}/*.json" for s in sessions]
    raw = spark.read.schema(PERSON_SCHEMA).option("multiLine", True).json(paths)
    return _with_catalog_columns(raw).select(
        "session",
        "doc_key",
        F.col("person.people_id").alias("people_id"),
        F.col("person.role").alias("role"),
        F.col("person.name").alias("name"),
        F.col("person.district").alias("district"),
        F.col("person.committee_id").alias("committee_id"),
    )
