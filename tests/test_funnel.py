"""Funnel operator unit tests: ordering strictness, stage monotonicity,
NULL propagation for users who stall mid-funnel."""

from __future__ import annotations

import datetime as dt

from legislative_bills_database_spark.operators.funnel import (
    funnel_census,
    funnel_stage_times,
)


def _ts(m):
    return dt.datetime(2026, 1, 1, 0, m)


def test_funnel_requires_strict_stage_order(spark):
    rows = [
        # u1 completes in order
        (1, "signup", _ts(0)), (1, "click", _ts(5)), (1, "purchase", _ts(9)),
        # u2 purchases BEFORE clicking → stalls at click... but then
        # never purchases after the click
        (2, "signup", _ts(0)), (2, "purchase", _ts(1)), (2, "click", _ts(2)),
        # u3 clicks before signup AND after → the post-signup click counts
        (3, "click", _ts(0)), (3, "signup", _ts(1)), (3, "click", _ts(3)),
        # u4 never signs up → not in the funnel at all
        (4, "click", _ts(0)), (4, "purchase", _ts(1)),
    ]
    events = spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp"
    )
    times = {
        r["user_id"]: (r["t_0"], r["t_1"], r["t_2"])
        for r in funnel_stage_times(
            events, ["signup", "click", "purchase"]
        ).collect()
    }
    assert set(times) == {1, 2, 3}
    assert times[1] == (_ts(0), _ts(5), _ts(9))
    assert times[2] == (_ts(0), _ts(2), None)  # purchase@1 predates click
    assert times[3] == (_ts(1), _ts(3), None)  # pre-signup click ignored

    census = {
        r["stage"]: r["n_users"]
        for r in funnel_census(events, ["signup", "click", "purchase"]).collect()
    }
    assert census == {"signup": 3, "click": 3, "purchase": 1}


def test_funnel_ties_do_not_advance(spark):
    # same-timestamp events: strict '>' means a simultaneous next-stage
    # event does NOT count (deterministic, engine-agnostic tie rule)
    events = spark.createDataFrame(
        [(1, "signup", _ts(0)), (1, "click", _ts(0))],
        "user_id int, event_type string, ts timestamp",
    )
    row = funnel_stage_times(events, ["signup", "click"]).first()
    assert row["t_0"] == _ts(0) and row["t_1"] is None
