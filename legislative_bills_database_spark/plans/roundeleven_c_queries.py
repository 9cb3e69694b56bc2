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


# ---------------------------------------------------------------------------
# DAG critical path (hop-bounded max-plus relaxation)
# ---------------------------------------------------------------------------


def _sql_critical_path(rounds: int) -> str:
    from .roundfive_queries import _COPURCHASE_EDGES

    steps = [
        """
    r0 AS (
      SELECT node, CAST(0 AS BIGINT) AS dist FROM (
        SELECT src AS node FROM e UNION SELECT dst FROM e
      )
    )"""
    ]
    for i in range(1, rounds + 1):
        steps.append(f"""
    r{i} AS (
      SELECT node, MAX(dist) AS dist FROM (
        SELECT node, dist FROM r{i - 1}
        UNION ALL
        SELECT e.dst AS node, p.dist + e.w AS dist
        FROM r{i - 1} p JOIN e ON p.node = e.src
      ) GROUP BY 1
    )""")
    return f"""
    WITH {_COPURCHASE_EDGES},
    {",".join(steps)}
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS crit_cost
    FROM r{rounds}
    """


@query("q_critical_path", _sql_critical_path(6))
def q_critical_path(spark, sf_dir):
    """DAG critical path: the most expensive co-purchase chain of at
    most 6 edges ending at each part, over the DIRECTED (src < dst ⇒
    acyclic) co-purchase edge list — the MAX-PLUS sibling of q_sssp's
    min-plus relaxation (operators/graph.longest_paths_dag). Every
    node seeds at cost 0 (critical-path semantics: the chain may start
    anywhere), each sweep is one co-located join against the
    src-partitioned edge list + one max-merge, and integral weights
    keep max-costs exact — the DuckDB twin chains six explicit
    max-merge CTE sweeps, so the value hash certifies each relaxation
    round, not just the final frame. Engine analog of the scheduling
    question "when can this node's work finish at the earliest"."""
    from ..operators.graph import longest_paths_dag
    from .roundfive_queries import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
    )
    return longest_paths_dag(edges, nodes, rounds=6).select(
        F.col("node").cast("long").alias("node"),
        F.col("dist").cast("long").alias("crit_cost"),
    )
