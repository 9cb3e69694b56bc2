"""As-of and range join edge semantics."""

from __future__ import annotations

from legislative_bills_database_spark.operators.temporal import (
    asof_join,
    range_join_fixed_buckets,
)


def test_asof_inclusive_and_null_before_first(spark):
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 7, "d")],
        "k int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0)], "k int, ts int, rate double"
    )
    out = {r["tag"]: r["asof_rate"] for r in asof_join(left, right, "k").collect()}
    assert out == {
        "a": None,    # before any right row
        "b": 100.0,   # equal ts is INCLUSIVE (<=)
        "c": 150.0,   # latest prior
        "d": None,    # key with no right rows at all
    }


def test_asof_carries_multiple_value_cols(spark):
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 5, 1.0, "x")], "k int, ts int, rate double, label string"
    )
    row = asof_join(left, right, "k").collect()[0]
    assert (row["asof_rate"], row["asof_label"]) == (1.0, "x")


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 99.999), (3, 100.0), (4, 250.0), (5, 500.0)],
        "pid int, value double",
    )
    ranges = spark.createDataFrame(
        [(0.0, 100.0, "t0"), (100.0, 200.0, "t1"), (200.0, 300.0, "t2")],
        "lo double, hi double, tier string",
    )
    out = {
        r["pid"]: r["tier"]
        for r in range_join_fixed_buckets(
            points, ranges, "value", "lo", "hi", 100.0
        ).collect()
    }
    # lo inclusive, hi exclusive; out-of-range points drop
    assert out == {1: "t0", 2: "t0", 3: "t1", 4: "t2"}


def test_range_join_cross_bucket_range(spark):
    """A range spanning a bucket boundary still catches points in both
    buckets (the explode maps it to every overlapped bucket)."""
    points = spark.createDataFrame([(1, 95.0), (2, 105.0)], "pid int, value double")
    ranges = spark.createDataFrame([(90.0, 110.0, "mid")], "lo double, hi double, tier string")
    out = {r["pid"] for r in range_join_fixed_buckets(
        points, ranges, "value", "lo", "hi", 100.0).collect()}
    assert out == {1, 2}
