"""dq_check and snapshot_diff semantics with violations present."""

from __future__ import annotations

import pytest

from legislative_bills_database_spark.operators.quality import (
    dq_check,
    snapshot_diff,
)


def test_dq_check_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (1, -5.0, "B"),   # dup key, below range
            (2, 20.0, "X"),   # disallowed value
            (None, None, "A"),  # null key, null range value
        ],
        "k long, v double, s string",
    )
    parent = spark.createDataFrame([(1,)], "pk long")
    rows = {
        r.constraint: r
        for r in dq_check(
            df,
            [
                ("k_not_null", "not_null", "k"),
                ("k_unique", "unique", "k"),
                ("v_range", "range", "v", 0, 100),
                ("s_allowed", "allowed", "s", ["A", "B"]),
                ("k_fk", "foreign_key", "k", parent, "pk"),
            ],
        ).collect()
    }
    assert (rows["k_not_null"].checked, rows["k_not_null"].violations) == (4, 1)
    assert (rows["k_unique"].checked, rows["k_unique"].violations) == (3, 1)
    assert (rows["v_range"].checked, rows["v_range"].violations) == (4, 2)
    assert (rows["s_allowed"].checked, rows["s_allowed"].violations) == (4, 1)
    assert (rows["k_fk"].checked, rows["k_fk"].violations) == (4, 1)


def test_dq_check_unknown_kind_raises(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="unknown constraint"):
        dq_check(df, [("x", "regex", "k")]).collect()


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string"
    )
    got = {r.status: r.n for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert got == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}
