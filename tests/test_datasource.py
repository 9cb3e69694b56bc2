"""Custom Python DataSource tests: format registration, partition-per-
session parallelism, agreement with the declared-schema JSON reader."""

from __future__ import annotations

from pyspark.sql import functions as F

from legislative_bills_database_spark.sources.documents import read_bills
from legislative_bills_database_spark.sources.legiscan_datasource import register

# reuse the synthetic document tree fixture
from tests.test_pipelines import S21, S23, data_root  # noqa: F401


def _load(spark, root):
    register(spark)
    return spark.read.format("legiscan_bills").option("path", root).load()


def test_datasource_reads_tree(spark, data_root):  # noqa: F811
    df = _load(spark, data_root)
    assert df.count() == 7
    row = df.filter(F.col("doc_key") == "AB128").collect()[0]
    assert row["session"] == S21
    assert row["last_doc_id"] == 23  # chaptered = last texts entry
    assert row["first_state_link"] == "http://x/ab128"
    assert row["primary_sponsor_id"] == 16285


def test_datasource_partition_per_session(spark, data_root):  # noqa: F811
    df = _load(spark, data_root)
    # one input partition per session directory
    assert df.rdd.getNumPartitions() == 2
    per_session = {
        r["session"]: r["n"]
        for r in df.groupBy("session").agg(F.count("*").alias("n")).collect()
    }
    assert per_session == {S21: 2, S23: 5}


def test_datasource_agrees_with_json_reader(spark, data_root):  # noqa: F811
    ds = _load(spark, data_root).select(
        "session", "doc_key", "bill_number", "status"
    )
    js = read_bills(spark, data_root).select(
        "session", "doc_key", "bill_number", "status"
    )
    assert sorted(map(tuple, ds.collect())) == sorted(map(tuple, js.collect()))


def test_datasource_missing_path_option(spark):
    register(spark)
    import pytest

    with pytest.raises(Exception, match="path"):
        spark.read.format("legiscan_bills").load().collect()
