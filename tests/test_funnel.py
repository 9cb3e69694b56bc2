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


def test_timed_funnel_gap_boundary(spark):
    """max_gap churns a user whose next stage lands past the window;
    landing exactly AT the boundary still converts (<=)."""
    import datetime as dt

    from legislative_bills_database_spark.operators.funnel import (
        funnel_census,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    events = spark.createDataFrame(
        [
            # user 1: click exactly 2h after signup → converts (<=)
            (1, t0, "signup"), (1, t0 + dt.timedelta(hours=2), "click"),
            # user 2: click 2h01m after signup → churns at signup
            (2, t0, "signup"), (2, t0 + dt.timedelta(hours=2, minutes=1), "click"),
            # user 3: an early unqualifying click (before signup) plus a
            # qualifying one → converts
            (3, t0 - dt.timedelta(hours=1), "click"),
            (3, t0, "signup"), (3, t0 + dt.timedelta(minutes=30), "click"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r.stage: r.n_users
        for r in funnel_census(
            events, ["signup", "click"], max_gap="INTERVAL 2 HOUR"
        ).collect()
    }
    assert got == {"signup": 3, "click": 2}
