"""Round-14 phases 113+: the entity-resolution endgame (Fellegi-Sunter
match pairs → connected components → survivorship golden records),
SAX motif discovery, and the round's scale escapes.

VERDICT r13 "Next round" items 2-3 and 6-8. Discipline as everywhere:
exact-integer arithmetic wherever a value crosses engines, blocked /
bucketed candidate generation (never all-pairs), one data-sized
shuffle per query, quadratic-capable plans behind measured-refusal
interlocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import query
from .roundthirteen_queries import (
    _FS_MATCH,
    _FS_SCORE_DUCK,
    _FS_WA,
    _FS_WD,
    _FSB_BAND_A,
    _FSB_BAND_B,
)

# ---------------------------------------------------------------------------
# phase 113: entity-resolution clusters (FS matches -> CC -> survivorship)
# ---------------------------------------------------------------------------


def _fs_match_pairs(cust: DataFrame) -> DataFrame:
    """(id_a, id_b) customer pairs the fine-blocked Fellegi-Sunter
    scorer classifies as matches (score ≥ _FS_MATCH) — the candidate
    generator of q_fellegi_blocked (roundthirteen_queries.py) re-emitted
    at PAIR grain instead of score-histogram grain. Same blocking
    (nation × segment × $1000 band), same four-field integer weights,
    so the pair set is exactly the one the blocked scorer's pinned
    histogram counts."""
    a = cust.alias("a")
    b = cust.alias("b")
    pa = F.round(F.col("a.c_acctbal") * 100).cast("long")
    pb = F.round(F.col("b.c_acctbal") * 100).cast("long")
    den = F.lit(100_000).cast("long")
    band_a = ((pa - pa % den) / den).cast("long")
    band_b = ((pb - pb % den) / den).cast("long")
    agree = [
        band_a == band_b,  # constant True inside a fine block
        pa % F.lit(100).cast("long") == pb % F.lit(100).cast("long"),
        F.expr("right(a.c_name, 3)") == F.expr("right(b.c_name, 3)"),
        (F.col("a.c_acctbal") >= 0) == (F.col("b.c_acctbal") >= 0),
    ]
    score = None
    for cond, wa, wd in zip(agree, _FS_WA, _FS_WD):
        term = F.when(cond, F.lit(wa).cast("long")).otherwise(
            F.lit(wd).cast("long")
        )
        score = term if score is None else score + term
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (band_a == band_b)
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= _FS_MATCH)
        .select("id_a", "id_b")
    )


@query(
    "q_er_clusters",
    f"""
    WITH RECURSIVE mp AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
       AND {_FSB_BAND_A} = {_FSB_BAND_B}
       AND a.c_custkey < b.c_custkey
      WHERE {_FS_SCORE_DUCK} >= {_FS_MATCH}
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM mp
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM mp
    ), cc AS (
      SELECT src AS node, src AS lbl FROM edges
      UNION
      SELECT e.dst AS node, cc.lbl AS lbl
      FROM cc JOIN edges e ON e.src = cc.node
    ), lab AS (
      SELECT node, MIN(lbl) AS cluster_id FROM cc GROUP BY node
    ), mem AS (
      SELECT l.cluster_id, c.c_custkey, c.c_name, c.c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY l.cluster_id
               ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY l.cluster_id)
                  AS BIGINT) AS n_members,
             CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) OVER (
                  PARTITION BY l.cluster_id) AS BIGINT) AS total_cents
      FROM lab l JOIN customer c ON c.c_custkey = l.node
    )
    SELECT cluster_id, n_members,
           c_custkey AS canon_custkey,
           c_name AS canon_name,
           ROUND(c_acctbal, 2) AS canon_acctbal,
           total_cents
    FROM mem WHERE rn = 1
    """,
)
def q_er_clusters(spark, sf_dir):
    """Entity-resolution clusters — the ER endgame the Fellegi-Sunter
    scorer exists for (its match verdicts are pair-grain; an MDM system
    needs ENTITY grain): fine-blocked FS match pairs
    (q_fellegi_blocked's exact pair set) → connected components
    (operators/dedup.connected_components — min-label propagation with
    pointer jumping, the MinHash-CC machinery reused on linkage edges)
    → survivorship golden record per cluster (q_survivorship's
    discipline: highest acctbal wins, custkey the deterministic
    tiebreak), with the cluster census (n_members, exact integer cents
    total) riding the same window shuffle.

    Hash-certified against a DuckDB RECURSIVE-CTE transitive closure:
    the oracle enumerates (node, reachable-label) pairs and takes
    MIN(label) per node — literally the definition of the min-label
    component — so the certificate is algorithm-independent: Spark's
    pointer-jumping loop and the oracle's naive closure must land on
    the IDENTICAL clustering. A pytest pin additionally replays
    union-find over the collected match pairs and checks membership +
    size histogram.

    Scale shape: pair generation is blocking-bounded (the measured
    q_fellegi_blocked escape — never all-pairs), CC is the distributed
    O(log diameter) loop with the ≤2M-edge driver fast path, and
    survivorship is ONE window shuffle at member grain. Matched-node
    count ≪ |customers| (only pair-participating ids enter CC), so
    every post-blocking frame is match-set-sized — at 100 TB the big
    surfaces are one blocked self-join plus a member-grain window.
    """
    cust = load_table(spark, sf_dir, "customer")
    pairs = _fs_match_pairs(cust).persist()
    from ..operators.dedup import connected_components

    nodes = (
        pairs.select(F.col("id_a").alias("node"))
        .unionByName(pairs.select(F.col("id_b").alias("node")))
        .distinct()
    )
    labels = connected_components(
        pairs, nodes, id_col="node", label_col="cluster_id"
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("cluster_id")
    w_rank = w.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    mem = (
        labels.join(cust, labels["node"] == cust["c_custkey"])
        .select(
            "cluster_id",
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_members"),
            F.sum(cents).over(w).cast("long").alias("total_cents"),
        )
    )
    return mem.filter(F.col("rn") == 1).select(
        "cluster_id",
        "n_members",
        F.col("c_custkey").alias("canon_custkey"),
        F.col("c_name").alias("canon_name"),
        F.round("c_acctbal", 2).alias("canon_acctbal"),
        "total_cents",
    )
