"""Funnel analysis: ordered-stage conversion over an event stream.

"How many users did A, then B after A, then C after B" — the canonical
product-analytics question and a genuinely relational-awkward one: each
stage's timestamp depends on the previous stage's, so the naive form is
a correlated subquery per stage.

Shape chosen here: one conditional-min aggregate per stage, each joined
back to the shrinking set of users who reached the previous stage —
``stages`` small and fixed, so the plan is ``len(stages)`` hash
aggregates and hash joins ALL keyed on user_id: the first shuffle
establishes the partitioning and every later agg/join reuses it
(exchange reuse, no re-shuffle), and each stage's input is filtered to
one event type BEFORE its shuffle. The alternative — collect each
user's full event array and fold it — ships every event through one
shuffle into per-user arrays; fine for short sessions, quadratic memory
hazard for power users. Stage-wise aggregation never materializes a
user's history anywhere.

Expressible identically in ANSI SQL (cascading CTEs), so the census
hash-matches a relational oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap: str | None = None,
) -> DataFrame:
    """(user, t_0 … t_{n-1}): the earliest time each user completed each
    stage IN ORDER — ``t_i`` is the min ``ts`` of a stage-``i`` event
    strictly after ``t_{i-1}``; NULL once a stage was never reached
    (and stays NULL for all later stages by construction).

    ``max_gap`` (a SQL interval literal, e.g. ``"INTERVAL 2 HOUR"``)
    bounds each transition: stage i must land within the gap AFTER
    t_{i-1} or the user churns at stage i-1 — the timed-conversion
    variant every growth report actually wants ("purchased within 2
    hours of the click", not "eventually"). Note the earliest-qualifying
    -time greedy is the STANDARD funnel semantics, not a global search
    over event combinations: a later stage-i event might satisfy the
    window where the earliest didn't, but t_{i-1} is fixed as the
    earliest reachable, matching the relational oracle exactly.
    """
    reached = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, stage in enumerate(stages[1:], start=1):
        in_order = F.col(ts_col) > F.col(f"t_{i - 1}")
        if max_gap is not None:
            in_order = in_order & (
                F.col(ts_col) <= F.col(f"t_{i - 1}") + F.expr(max_gap)
            )
        nxt = (
            events.filter(F.col(type_col) == stage)
            .join(reached.select(user_col, f"t_{i - 1}"), user_col)
            .filter(in_order)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        reached = reached.join(nxt, user_col, "left")
    return reached


def funnel_census(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap: str | None = None,
) -> DataFrame:
    """One row per funnel stage: (stage_idx, stage, n_users who got at
    least this far, in order). The standard conversion report;
    ``max_gap`` makes it the timed-conversion variant."""
    times = funnel_stage_times(
        events, stages, user_col, type_col, ts_col, max_gap
    )
    counts = times.agg(
        *[
            F.count(F.col(f"t_{i}")).alias(f"n_{i}")
            for i in range(len(stages))
        ]
    )
    stage_rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("stage_idx"),
                    F.lit(s).alias("stage"),
                    F.col(f"n_{i}").alias("n_users"),
                )
                for i, s in enumerate(stages)
            ]
        )
    )
    return counts.select(stage_rows.alias("r")).select(
        F.col("r.stage_idx").alias("stage_idx"),
        F.col("r.stage").alias("stage"),
        F.col("r.n_users").cast("bigint").alias("n_users"),
    )


def sql_funnel_census(stages: list[str], max_gap: str | None = None) -> str:
    """DuckDB twin of :func:`funnel_census` over the ``events`` view."""
    ctes = [
        f"s0 AS (SELECT user_id, min(ts) AS t_0 FROM events"
        f" WHERE event_type = '{stages[0]}' GROUP BY user_id)"
    ]
    for i, stage in enumerate(stages[1:], start=1):
        gap = (
            f" AND e.ts <= p.t_{i - 1} + {max_gap}" if max_gap is not None else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t_{i} FROM events e"
            f" JOIN s{i - 1} p ON e.user_id = p.user_id"
            f" WHERE e.event_type = '{stage}' AND e.ts > p.t_{i - 1}{gap}"
            f" GROUP BY e.user_id)"
        )
    selects = [
        f"SELECT {i} AS stage_idx, '{s}' AS stage,"
        f" CAST((SELECT count(*) FROM s{i}) AS BIGINT) AS n_users"
        for i, s in enumerate(stages)
    ]
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)
