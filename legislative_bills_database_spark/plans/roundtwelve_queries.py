"""Round-12 phases 88+: banded global alignment (Needleman-Wunsch),
HMM forward probabilities, row-group-skipping layout certificate,
composite approximate inclusion dependencies.

VERDICT r11 "Next round" items 2-4, 6 and 8: the wavefront template
q_dtw introduced (anti-diagonal DP as a transform-inside-aggregate
fold) instantiated for symbol alignment; the sum-product sibling of
q_viterbi's max-plus decode; the rowgroup-grain sibling of
q_partition_pruning_census; and the tolerance tier over the phase-74
composite-IND domain.

Discipline as everywhere: exact-integer arithmetic wherever a value
crosses engines, bounded per-key arrays (the 30-day event window
bounds daily grids at any SF), one data-sized shuffle per query with
small frames broadcast back.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from .registry import query

# ---------------------------------------------------------------------------
# banded Needleman-Wunsch global alignment (anti-diagonal wavefront)
# ---------------------------------------------------------------------------

_NW_NEG = -(1 << 50)  # out-of-band sentinel; real scores are |.| ≤ ~200
_NW_MATCH = 3
_NW_MISMATCH = -1
_NW_GAP = -2

# modal event type with deterministic lexicographic tiebreak, spelled
# once: min over (-count, type) struct picks max count, then min type
_NW_MODAL_DUCK = "(min({'a': -cnt, 'b': event_type})).b"


@query(
    "q_needleman",
    f"""
    WITH RECURSIVE dayc AS (
      SELECT user_id, CAST(date_part('day', ts) AS BIGINT) AS day,
             event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2, 3
    ), umod AS (
      SELECT user_id, day, {_NW_MODAL_DUCK} AS ty
      FROM dayc GROUP BY 1, 2
    ), xs AS (
      SELECT user_id, list(ty ORDER BY day) AS x,
             CAST(len(list(ty ORDER BY day)) AS BIGINT) AS n
      FROM umod GROUP BY 1
    ), gmod AS (
      SELECT day, {_NW_MODAL_DUCK} AS ty
      FROM (SELECT day, event_type, CAST(SUM(cnt) AS BIGINT) AS cnt
            FROM dayc GROUP BY 1, 2)
      GROUP BY 1
    ), ref AS (
      SELECT list(ty ORDER BY day) AS r,
             CAST(count(*) AS BIGINT) AS m
      FROM gmod
    ), base AS (
      SELECT x.user_id, x.x, x.n, ref.r, ref.m,
             ABS(x.n - ref.m) + 3 AS w
      FROM xs x CROSS JOIN ref
    ), it AS (
      SELECT user_id, x, n, r, m, w, 0 AS d,
             [CASE WHEN i = 0 THEN 0 ELSE {_NW_NEG} END
              FOR i IN generate_series(0, n)] AS prev,
             [{_NW_NEG} FOR i IN generate_series(0, n)] AS prev2
      FROM base
      UNION ALL
      SELECT user_id, x, n, r, m, w, d + 1,
             [CASE
                WHEN d + 1 - i < 0 OR d + 1 - i > m
                     OR ABS(i - (d + 1 - i)) > w THEN {_NW_NEG}
                WHEN i = 0 THEN {_NW_GAP} * (d + 1)
                WHEN d + 1 - i = 0 THEN {_NW_GAP} * i
                ELSE GREATEST(
                  prev2[i] + CASE WHEN x[i] = r[d + 1 - i]
                                  THEN {_NW_MATCH}
                                  ELSE {_NW_MISMATCH} END,
                  prev[i] + {_NW_GAP},
                  prev[i + 1] + {_NW_GAP})
              END FOR i IN generate_series(0, n)] AS prev,
             prev AS prev2
      FROM it WHERE d < n + m
    )
    SELECT user_id, n, m, prev[n + 1] AS nw_score
    FROM it WHERE d = n + m
    """,
)
def q_needleman(spark, sf_dir):
    """Banded Needleman-Wunsch global alignment (Needleman & Wunsch
    1970, Sakoe-Chiba band) between each user's daily modal-event-type
    sequence and the fleet's daily modal sequence — the edit-script
    primitive the capped edit-distance join family approximates at
    block grain, here as an exact per-key alignment SCORE (match +3,
    mismatch −1, gap −2, band w = |n−m|+3 ≥ |n−m| so the global cell
    is always reachable). A high score means the user's day-by-day
    behaviour tracks the fleet's; gaps absorb inactive days without
    the frame-shift penalty Hamming/DTW-style measures pay.

    Same wavefront decomposition as q_dtw (the template its docstring
    promised): cells on anti-diagonal i+j = d depend only on d−1 (gap
    moves) and d−2 (the diagonal match/mismatch move), so the O(n·m)
    table is a fold over n+m wavefronts carrying two diagonals — with
    GREATEST replacing LEAST (alignment maximizes) and boundary cells
    H[0][j] = j·gap, H[i][0] = i·gap materialized per wavefront
    inside the band. All scores exact BIGINTs; out-of-band cells
    carry a −2⁵⁰ sentinel no in-band path can reach, so the driver
    hash certifies every wavefront. The modal-type tiebreak is the
    same struct-min in both engines: (−count, type) ascending.

    Scale shape: one (user, day, type) count aggregate feeding both
    the per-user sequences and the 1-row broadcast reference (shared
    via lazy localCheckpoint — the plan-census ≤2-BNLJ rule), arrays
    calendar-bounded at ≤31 symbols per key, the whole DP in JVM
    codegen (transform inside aggregate) — no UDF, no per-step
    shuffle, per key O((n+m)·n) ≈ 2k cell updates at any SF."""
    events = load_table(spark, sf_dir, "events")
    dayc = (
        events.groupBy(
            "user_id",
            F.dayofmonth("ts").cast("long").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)  # xs + ref share it
    )
    modal = F.min(
        F.struct(
            (-F.col("cnt")).alias("a"), F.col("event_type").alias("b")
        )
    )["b"].alias("ty")
    umod = dayc.groupBy("user_id", "day").agg(modal)
    xs = (
        umod.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "ty"))),
                lambda s: s["ty"],
            ).alias("x")
        )
        .withColumn("n", F.size("x").cast("long"))
    )
    ref = (
        dayc.groupBy("day", "event_type")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .groupBy("day")
        .agg(modal)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "ty"))),
                lambda s: s["ty"],
            ).alias("r")
        )
        .withColumn("m", F.size("r").cast("long"))
    )
    base = xs.crossJoin(F.broadcast(ref)).withColumn(
        "w", F.abs(F.col("n") - F.col("m")) + 3
    )
    NEG = F.lit(_NW_NEG).cast("long")
    GAP = F.lit(_NW_GAP).cast("long")
    x, r = F.col("x"), F.col("r")
    n, m, w = F.col("n"), F.col("m"), F.col("w")
    idx = F.sequence(F.lit(0).cast("long"), n)
    diag0 = F.transform(
        idx, lambda i: F.when(i == 0, F.lit(0).cast("long")).otherwise(NEG)
    )
    negs = F.transform(idx, lambda i: NEG)

    def step(acc, d):
        prev, prev2 = acc["p"], acc["q"]
        new = F.transform(
            idx,
            lambda i: F.when(
                (d - i < 0) | (d - i > m) | (F.abs(i - (d - i)) > w), NEG
            )
            .when(i == 0, GAP * d)
            .when(d - i == 0, GAP * i)
            .otherwise(
                F.greatest(
                    F.element_at(prev2, i.cast("int"))
                    + F.when(
                        F.element_at(x, i.cast("int"))
                        == F.element_at(r, (d - i).cast("int")),
                        F.lit(_NW_MATCH).cast("long"),
                    ).otherwise(F.lit(_NW_MISMATCH).cast("long")),
                    F.element_at(prev, i.cast("int")) + GAP,
                    F.element_at(prev, (i + 1).cast("int")) + GAP,
                )
            ),
        )
        return F.struct(new.alias("p"), prev.alias("q"))

    final = F.aggregate(
        F.sequence(F.lit(1).cast("long"), n + m),
        F.struct(diag0.alias("p"), negs.alias("q")),
        step,
    )
    return base.select(
        "user_id",
        "n",
        "m",
        F.element_at(final["p"], (n + 1).cast("int")).alias("nw_score"),
    )
