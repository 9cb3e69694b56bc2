"""DSIR importance weights and the one-pass column profiler."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from legislative_bills_database_spark.io import load_table
from legislative_bills_database_spark.operators.importance import (
    dsir_weights,
    token_bucket,
)
from legislative_bills_database_spark.operators.profile import profile_columns

SF_DIR = "/root/testdata/sf0.001"


def test_token_bucket_range_and_determinism(spark):
    df = spark.createDataFrame(
        [(w,) for w in ["alpha", "beta", "gamma", "", "Zebra", "123"]],
        "tok string",
    )
    rows = df.select(token_bucket(F.col("tok")).alias("b")).collect()
    assert all(0 <= r["b"] <= 255 for r in rows)
    assert rows == df.select(token_bucket(F.col("tok")).alias("b")).collect()


def test_dsir_target_docs_score_higher(spark):
    # target docs use a disjoint vocabulary → their weights must be
    # strictly positive and higher than the off-target docs'
    rows = [
        (1, "alpha beta alpha beta gamma", "tgt"),
        (2, "alpha gamma beta alpha", "tgt"),
        (3, "delta epsilon zeta delta", "other"),
        (4, "epsilon zeta zeta delta", "other"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r["logweight"] for r in dsir_weights(docs, ("tgt",)).collect()}
    assert min(out[1], out[2]) > max(out[3], out[4])


def test_dsir_token_counts(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = dsir_weights(docs, ("src0",))
    total = out.agg(F.sum("n_tokens")).collect()[0][0]
    expected = docs.select(
        F.size(F.split("text", " ")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total == expected
    assert out.count() == docs.count()


def test_profile_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "x int, y string",
    )
    out = {r["col_name"]: r for r in profile_columns(df, ["x", "y"]).collect()}
    assert out["x"]["n_nulls"] == 1 and out["x"]["n_distinct"] == 2
    assert out["y"]["n_nulls"] == 1 and out["y"]["n_distinct"] == 2


def test_profile_single_scan(spark):
    orders = load_table(spark, SF_DIR, "orders")
    df = profile_columns(orders, ["o_orderkey", "o_orderstatus"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "Expand" in plan  # multi-distinct via expand, not multi-pass
