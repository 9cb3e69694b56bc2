"""Round-10 queries.

Opens with the weighted-jaccard scale escape hatch ordered by VERDICT r9
item #4: ``q_weighted_jaccard`` is the one remaining exact-quadratic plan
whose measured skew cliff (5.83× under a Zipf hot key, the worst cell in
BENCH_SF1_SKEW) had a documented but UNIMPLEMENTED degree-cap sibling.
``q_weighted_jaccard_approx`` runs the identical Σmin/(tot_a+tot_b−Σmin)
pipeline on the md5-degree-capped weighted edge list (the
q_graph_jaccard_approx twin discipline — operators/basket.
degree_capped_edges with the adaptive p95 cap), and
``q_weighted_jaccard_recall`` is the driver-visible quality certificate
comparing the capped top-50 pair set against the exact top-50.

The md5 sampler is portable hex in both engines, so the capped subgraph
— and the weighted similarity computed on it — is fully
DuckDB-oracle-checkable: the approximation lives in the graph, not the
engine. Totals AND intersections both come from the capped subgraph
(within-sample consistency — capping only intersections while keeping
exact totals biases WJ downward on capped keys; same negative result as
the unweighted twin, operators/basket.cooccurrence_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import load_tables
from ..operators.basket import degree_capped_edges
from .registry import query
from .roundseven_queries import (
    _GJ_MIN_CAP,
    _SQL_RECALL_TAIL,
    _adaptive_cap,
    _memo_sim,
    _set_recall,
)

# ---------------------------------------------------------------------------
# weighted (cust, supp, qty) edge list + capped twin, memoized like the
# unweighted CF/jaccard chain (one materialization per sweep)
# ---------------------------------------------------------------------------

_SQL_W = """w AS (
      SELECT o.o_custkey AS cust, l.l_suppkey AS supp,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    )"""

# Degree-adaptive p95 cap over the weighted edge list — the (cust, supp)
# key set of `w` equals the unweighted `cs` exactly (same join, same
# DISTINCT pair grain), so the cap value matches q_graph_jaccard_approx's
# and the same md5(cust:supp) order picks the same surviving edges.
_SQL_WCAPPED = f"""wdegc AS (
      SELECT cust, CAST(COUNT(*) AS BIGINT) AS dc FROM w GROUP BY 1
    ), wdhist AS (
      SELECT dc, CAST(COUNT(*) AS BIGINT) AS c FROM wdegc GROUP BY 1
    ), wdthr AS (
      SELECT CAST((19 * SUM(c) + 19) // 20 AS BIGINT) AS k FROM wdhist
    ), wcapv AS (
      SELECT GREATEST(MIN(dc), {_GJ_MIN_CAP}) AS cap
      FROM (SELECT dc, SUM(c) OVER (ORDER BY dc) AS cum FROM wdhist), wdthr
      WHERE cum >= k
    ), wcapped AS (
      SELECT cust, supp, qty FROM (
        SELECT cust, supp, qty,
               ROW_NUMBER() OVER (
                 PARTITION BY cust
                 ORDER BY md5(CAST(cust AS VARCHAR) || ':'
                              || CAST(supp AS VARCHAR)), supp
               ) AS rk
        FROM w)
      WHERE rk <= (SELECT cap FROM wcapv)
    )"""


def _sql_wtop50(edge_cte: str, tag: str) -> str:
    """CTE chain wtot{tag}/winter{tag}/wtop{tag}: top-50 supplier pairs
    by quantity-weighted Jaccard over a (cust, supp, qty) edge CTE —
    q_weighted_jaccard's exact math (roundeight_queries.py),
    parameterized on the edge set."""
    return f"""wtot{tag} AS (
      SELECT supp, CAST(SUM(qty) AS BIGINT) AS t FROM {edge_cte} GROUP BY 1
    ), winter{tag} AS (
      SELECT a.supp AS s1, b.supp AS s2,
             CAST(SUM(LEAST(a.qty, b.qty)) AS BIGINT) AS minsum,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM {edge_cte} a JOIN {edge_cte} b
        ON a.cust = b.cust AND a.supp < b.supp
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ), wtop{tag} AS (
      SELECT i.s1, i.s2, i.n_shared,
             ROUND(CAST(i.minsum AS DOUBLE)
                   / (t1.t + t2.t - i.minsum), 6) AS wjaccard
      FROM winter{tag} i
      JOIN wtot{tag} t1 ON i.s1 = t1.supp
      JOIN wtot{tag} t2 ON i.s2 = t2.supp
      ORDER BY wjaccard DESC, i.s1, i.s2
      LIMIT 50
    )"""


def _w_edges(spark, sf_dir) -> DataFrame:
    """Memoized (cust, supp, qty) weighted edge list (exact integer
    quantities; one orders⋈lineitem grouped pass)."""

    def build():
        orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
        return (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy(
                F.col("o_custkey").alias("cust"),
                F.col("l_suppkey").alias("supp"),
            )
            .agg(
                F.sum(F.col("l_quantity").cast("long"))
                .cast("long")
                .alias("qty")
            )
        )

    return _memo_sim(spark, sf_dir, "wedges", build)


def _w_capped(spark, sf_dir) -> DataFrame:
    w = _w_edges(spark, sf_dir)
    return _memo_sim(
        spark,
        sf_dir,
        "wcapped",
        lambda: degree_capped_edges(w, "cust", "supp", _adaptive_cap(w)),
    )


def _wtop50(edges: DataFrame) -> DataFrame:
    """Top-50 supplier pairs by weighted Jaccard over (cust, supp, qty)
    edges — within-sample totals AND intersections, Σmax folded to
    tot_a + tot_b − Σmin so the customer union never materializes."""
    tot = edges.groupBy("supp").agg(F.sum("qty").cast("long").alias("t"))
    a = edges.select(
        F.col("cust").alias("ca"),
        F.col("supp").alias("s1"),
        F.col("qty").alias("qa"),
    )
    b = edges.select(
        F.col("cust").alias("cb"),
        F.col("supp").alias("s2"),
        F.col("qty").alias("qb"),
    )
    inter = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(
            F.sum(F.least("qa", "qb")).cast("long").alias("minsum"),
            F.count(F.lit(1)).cast("long").alias("n_shared"),
        )
        .filter(F.col("n_shared") >= 2)
    )
    t1 = tot.select(F.col("supp").alias("s1"), F.col("t").alias("t1"))
    t2 = tot.select(F.col("supp").alias("s2"), F.col("t").alias("t2"))
    return (
        inter.join(F.broadcast(t1), "s1")
        .join(F.broadcast(t2), "s2")
        .select(
            "s1",
            "s2",
            "n_shared",
            F.round(
                F.col("minsum").cast("double")
                / (F.col("t1") + F.col("t2") - F.col("minsum")),
                6,
            ).alias("wjaccard"),
        )
        .orderBy(F.col("wjaccard").desc(), "s1", "s2")
        .limit(50)
    )


def _w_exact_top50(spark, sf_dir) -> DataFrame:
    return _memo_sim(
        spark, sf_dir, "wtope", lambda: _wtop50(_w_edges(spark, sf_dir))
    )


def _w_capped_top50(spark, sf_dir) -> DataFrame:
    return _memo_sim(
        spark, sf_dir, "wtopa", lambda: _wtop50(_w_capped(spark, sf_dir))
    )


@query(
    "q_weighted_jaccard_approx",
    f"""
    WITH {_SQL_W},
    {_SQL_WCAPPED},
    {_sql_wtop50("wcapped", "a")}
    SELECT s1, s2, n_shared, wjaccard FROM wtopa
    ORDER BY wjaccard DESC, s1, s2
    """,
)
def q_weighted_jaccard_approx(spark, sf_dir):
    """q_weighted_jaccard's scale sibling (VERDICT r9 item #4 — the
    5.83× worst cell in BENCH_SF1_SKEW finally gets its implemented
    escape hatch): the identical quantity-weighted top-50 pipeline on
    the md5-degree-capped weighted edge list, so the pair self-join's
    per-customer fan-out is bounded at cap²/2 — hot customers cost a
    constant, not d²/2. The cap is the exact p95 of the per-customer
    degree distribution (integer histogram quantile, floor 30 —
    operators/basket.degree_capped_edges + roundseven _adaptive_cap);
    totals and intersections both come from the capped subgraph, keeping
    WJ a consistent within-sample estimate. Portable md5 sampling makes
    the whole approximation oracle-checkable; quality certified by
    q_weighted_jaccard_recall."""
    return _w_capped_top50(spark, sf_dir)


@query(
    "q_weighted_jaccard_recall",
    f"""
    WITH {_SQL_W},
    {_SQL_WCAPPED},
    {_sql_wtop50("w", "e")},
    {_sql_wtop50("wcapped", "a")},
    {_SQL_RECALL_TAIL.format(k="s1, s2", knums="1, 2",
                             exact="wtope", approx="wtopa")}
    """,
)
def q_weighted_jaccard_recall(spark, sf_dir):
    """Driver-visible quality certificate for q_weighted_jaccard_approx:
    one (n_exact, n_approx, n_overlap, recall) row comparing the capped
    top-50 weighted-Jaccard pair set against the exact top-50 — the
    q_graph_jaccard_recall twin discipline, fully oracle-checked because
    the md5 sampler is portable. A quality regression in the capped
    variant flips a driver hash instead of hiding; pytest pins the
    recall floor."""
    exact = _w_exact_top50(spark, sf_dir)
    approx = _w_capped_top50(spark, sf_dir)
    return _set_recall(exact, approx, ["s1", "s2"])
