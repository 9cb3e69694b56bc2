"""Round-11 phases 72+: seasonal smoothing, DAG scheduling, tier-2
profiling (approximate FDs, composite INDs), scale-grain isotonic.

The round-12 leads from ROUND_NOTES, pulled forward into round 11:
additive Holt-Winters closes the one seasonal gap in the timeseries
family (EWMA → Holt → Holt-Winters is now a complete chunked-affine
ladder); DAG critical path is the max-plus sibling of q_sssp's
min-plus relaxation; approximate FDs and composite INDs extend the
phase-70 schema-constraint tier from exact verdicts to
tolerance-quantified ones; isotonic regression leaves the binned grain
(q_isotonic_calibration) for per-key point series.

Discipline as everywhere: exact-integer or identically-ordered IEEE
arithmetic wherever a value crosses engines, bounded per-key arrays
(the 30-day event window bounds daily grids at any SF), and ONE
data-sized shuffle per query with small frames broadcast back.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from .registry import query

# ---------------------------------------------------------------------------
# additive Holt-Winters (triple exponential smoothing)
# ---------------------------------------------------------------------------


@query(
    "q_holt_winters",
    # sequential oracle: recursive CTE with a LIST-valued seasonal
    # state (the m-slot buffer rotates via s[2:m] || [s_new]); one
    # Holt-Winters step per iteration, all keys advance together.
    # Seed = mean of the first m observations (left-associated sum),
    # b=0, s_i = x_i − l0 — written in the identical IEEE operation
    # order as the Spark seed fold.
    """
    WITH RECURSIVE vals AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id HAVING COUNT(*) >= 4
    ), it AS (
      SELECT user_id, 4 AS k,
             (((vs[1] + vs[2]) + vs[3]) + vs[4]) / 4.0 AS l,
             CAST(0.0 AS DOUBLE) AS b,
             [vs[1] - (((vs[1] + vs[2]) + vs[3]) + vs[4]) / 4.0,
              vs[2] - (((vs[1] + vs[2]) + vs[3]) + vs[4]) / 4.0,
              vs[3] - (((vs[1] + vs[2]) + vs[3]) + vs[4]) / 4.0,
              vs[4] - (((vs[1] + vs[2]) + vs[3]) + vs[4]) / 4.0] AS s,
             n
      FROM vals
      UNION ALL
      SELECT it.user_id, it.k + 1,
             0.5 * (v.vs[it.k + 1] - it.s[1])
               + 0.5 * (it.l + it.b) AS l,
             0.3 * ((0.5 * (v.vs[it.k + 1] - it.s[1])
                      + 0.5 * (it.l + it.b)) - it.l)
               + 0.7 * it.b AS b,
             it.s[2:4] || [0.4 * (v.vs[it.k + 1]
                                   - (0.5 * (v.vs[it.k + 1] - it.s[1])
                                      + 0.5 * (it.l + it.b)))
                           + 0.6 * it.s[1]] AS s,
             it.n
      FROM it JOIN vals v USING (user_id)
      WHERE it.k < it.n
    )
    SELECT user_id, n AS n_obs,
           ROUND(l, 4) AS level,
           ROUND(b, 4) AS trend,
           ROUND(s[1], 4) AS s_next,
           ROUND(l + b + s[1], 4) AS forecast_1
    FROM it WHERE k = n
    """,
)
def q_holt_winters(spark, sf_dir):
    """Additive Holt-Winters level+trend+seasonal per user — the
    SEASONAL completion of the chunked-affine smoother ladder
    (EWMA: scalar map, Holt: 2×2 matrix, Holt-Winters: (m+2)×(m+2)
    matrix with the seasonal buffer rotating inside the state vector;
    operators/timeseries.holt_winters_chunked). chunk_size=16 forces
    multi-chunk matrix composition at every sf (~67 events/user → 5
    chunks); the oracle is DuckDB's genuinely SEQUENTIAL recursive CTE
    with a list-valued seasonal state, so the green hash proves
    chunked flat-matrix folds == one-pass triple smoothing. α=0.5,
    β=0.3, γ=0.4, m=4; discounts chosen so (1−β)=0.7 and (1−γ)=0.6
    are EXACT double round-trips — the Python-side constants and the
    SQL literals denote the same IEEE values (pinned in pytest)."""
    from ..operators.timeseries import holt_winters_chunked

    events = load_table(spark, sf_dir, "events")
    return holt_winters_chunked(
        events, "user_id", "ts", "value", "event_id",
        alpha=0.5, beta=0.3, gamma=0.4, period=4, chunk_size=16,
    )
