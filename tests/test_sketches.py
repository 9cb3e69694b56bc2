"""HLL sketch mergeability: union-of-shard-sketches vs direct vs exact,
including the lgConfigK headroom caveat the operator documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.sketches import hll_merge_report

SF = "/root/testdata/sf0.001"


def test_merged_equals_direct_with_headroom(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row = hll_merge_report(docs, "source", "doc_id", lg_config_k=14).collect()[0]
    assert row.exact == 500
    assert row.merged_est == row.direct_est == 500  # exact at this cardinality
    assert row.rel_err == 0.0
    assert row.n_groups == docs.select("source").distinct().count()


def test_lg12_union_loses_sparse_exactness(spark):
    """The documented caveat: at lgConfigK=12 the union path leaves
    sparse-exact mode and the merged estimate drops below exact — if a
    Spark upgrade makes this exact, the operator's warning (and this
    pin) should be revisited."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row = hll_merge_report(docs, "source", "doc_id", lg_config_k=12).collect()[0]
    assert row.exact == 500
    assert row.rel_err < 0.05  # still a good estimate...
    assert row.merged_est != row.exact  # ...but no longer exact


def test_merge_is_order_independent(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = hll_merge_report(docs, "source", "doc_id").collect()[0]
    b = hll_merge_report(
        docs.orderBy(F.desc("doc_id")), "source", "doc_id"
    ).collect()[0]
    assert a.merged_est == b.merged_est
