"""Distributed PageRank over an edge list.

Companion to connected_components (operators/dedup.py) in the iterative-
graph family: where CC labels near-duplicate clusters, PageRank scores
node centrality — the classic importance prior for corpus curation
(rank-weighted sampling of a link graph, authority scoring of sources).

Scale posture, mirroring the hard-won CC lessons (VERDICT r2):

- weighted edges (dst, 1/out_deg) are computed ONCE, hash-partitioned on
  src, and persisted: the per-iteration join reuses that layout (no edge
  re-shuffle per round — only the small rank frame moves), so each
  iteration is one co-located join + one groupBy(dst) shuffle.
- dangling mass (nodes with no out-edges) enters the plan as a 1-row
  broadcast aggregate instead of a per-iteration driver collect — ONE
  Spark job per iteration (the eager checkpoint), not two.
- ranks are ``localCheckpoint``-ed every iteration: lineage is truncated,
  so plan depth stays O(1) regardless of iteration count (the round-2
  CC lesson — unbounded lineage is a planning-time scale hazard).
- the iteration count is FIXED (power iteration, not convergence-tested)
  so results are deterministic and reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Exact triangle count of the undirected graph ``edges``.

    Canonical orientation (a<b after dedup) makes each triangle appear
    exactly once as a<b<c: one wedge join (ab ⋈ bc) + one closing
    semi-equi-join against the edge set — three hash joins total, no
    theta join, no enumeration of both directions. At 100 TB the known
    refinement is DEGREE-based orientation (orient low→high degree, which
    bounds wedge fan-out by √m instead of max-degree); id orientation is
    used here because the co-occurrence graphs we feed it have bounded
    per-key degree by construction.

    Returns one row (n_nodes, n_edges, n_triangles).
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # the canonical edge set feeds THREE joins; materialize it once
        # (an expensive upstream — e.g. a similarity-pair generator —
        # would otherwise run three times; ReusedExchange doesn't cross
        # the differing join keys)
        .localCheckpoint(eager=True)
    )
    ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = ab.join(bc, "y").select("x", "y", "z")  # x<y<z by construction
    closed = wedges.join(
        e, (wedges.x == e.a) & (wedges.z == e.b), "left_semi"
    )
    nodes = e.select(F.col("a").alias("n")).union(e.select("b")).distinct()
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    out = stats.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")
    return out


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Rank every node of the directed graph ``edges`` (duplicate edges
    count as parallel edges). Returns (node, rank) with sum(rank) ≈ 1."""
    raw = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    out_deg = raw.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # contribution weights are rank-independent: build once, co-locate on
    # the join key, persist — iterations never touch the raw edge list
    edges_w = (
        raw.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .repartition("src")
        .persist()
    )
    nodes = (
        raw.select(F.col("src").alias("node"))
        .union(raw.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    # (node, dangling, rank); dangling marks no-out-edge nodes
    ranks = (
        nodes.join(out_deg, nodes.node == out_deg.src, "left")
        .select(
            "node",
            F.col("out_deg").isNull().alias("dangling"),
            F.lit(1.0 / n_nodes).alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(n_iter):
            # 1-row aggregate, broadcast-joined into every row: keeps the
            # dangling correction inside the single per-iteration job
            dmass = ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("dangling"), F.col("rank"))), F.lit(0.0)
                ).alias("__dmass")
            )
            contribs = (
                edges_w.join(ranks, edges_w.src == ranks.node)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("inflow"))
            )
            ranks = (
                ranks.select("node", "dangling")
                .join(contribs, F.col("node") == contribs.dst, "left")
                .crossJoin(F.broadcast(dmass))
                .select(
                    "node",
                    "dangling",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.col("__dmass") / F.lit(float(n_nodes))
                        + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)  # truncate per-iteration lineage
            )
        return ranks.select("node", "rank")
    finally:
        edges_w.unpersist()
