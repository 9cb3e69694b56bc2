"""SCD2 merge and FK-orphan audit semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.scd import (
    fk_orphan_audit,
    scd2_merge,
)

EMPTY_SCHEMA = (
    "k long, attr string, valid_from timestamp, valid_to timestamp, "
    "is_current boolean"
)


def _d(day):
    return dt.datetime(2024, 1, day)


def _merge(spark, current, updates):
    upd = spark.createDataFrame(updates, "k long, attr string, effective_ts timestamp")
    return scd2_merge(current, upd, "k", ["attr"], "effective_ts")


def test_scd2_versions_and_noop_collapse(spark):
    empty = spark.createDataFrame([], EMPTY_SCHEMA)
    out = _merge(
        spark,
        empty,
        [
            (1, "gold", _d(1)),
            (1, "gold", _d(5)),   # no-op update: collapsed
            (1, "silver", _d(9)),
            (2, "bronze", _d(2)),
        ],
    ).orderBy("k", "valid_from").collect()
    got = [(r.k, r.attr, r.valid_from.day, r.valid_to and r.valid_to.day, r.is_current) for r in out]
    assert got == [
        (1, "gold", 1, 9, False),
        (1, "silver", 9, None, True),
        (2, "bronze", 2, None, True),
    ]


def test_scd2_incremental_equals_full(spark):
    empty = spark.createDataFrame([], EMPTY_SCHEMA)
    batch1 = [(1, "a", _d(1)), (1, "b", _d(3)), (2, "x", _d(2))]
    batch2 = [(1, "c", _d(7)), (2, "x", _d(8)), (3, "q", _d(4))]
    full = _merge(spark, empty, batch1 + batch2)
    step1 = _merge(spark, empty, batch1)
    incr = _merge(spark, step1, batch2)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, incr.collect()))
    # idempotence: re-applying the same batch changes nothing
    again = _merge(spark, incr, batch2)
    assert sorted(map(tuple, incr.collect())) == sorted(map(tuple, again.collect()))


def test_fk_orphan_audit_counts(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = fk_orphan_audit([("child.fk", child, "fk", parent, "pk")]).collect()[0]
    assert (row.child_rows, row.null_fk, row.orphans) == (4, 1, 1)


def test_fk_orphan_audit_single_plan(spark):
    # the whole multi-relationship audit is ONE lazy plan — no action
    # until collect; four relationships → four union branches
    c = spark.createDataFrame([(1, 1)], "id long, fk long")
    p = spark.createDataFrame([(1,)], "pk long")
    df = fk_orphan_audit([(f"r{i}", c, "fk", p, "pk") for i in range(4)])
    assert df.count() == 4
    assert [r.orphans for r in df.collect()] == [0, 0, 0, 0]
