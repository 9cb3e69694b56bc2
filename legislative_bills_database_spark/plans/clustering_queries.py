"""Round-6 phase-38 queries: hash-certified clustering.

The rows-only seeded-float q_kmeans_clusters gets an exact sibling, the
way q_pagerank got q_pagerank_exact: Lloyd's iteration on QUANTIZED
integer embeddings — milli-unit elements, integer squared distances,
struct-ordered argmin assignment (tie-break by cluster id), centroid
updates by sign-safe truncating division — is bit-identical in any
engine and summation order, so the DuckDB chained-CTE twin hash-checks
every centroid coordinate after every sweep. Density clustering gets
the same treatment: DBSCAN-style core/border labeling over an exact
integer ε-ball pair graph, cluster ids from the hash-certified
connected-components machinery.

Reference parity note: the reference (patrick95350/legislative-bills-
database) has no clustering surface — this module extends SURVEY.md
§2.10's similarity/dedup families (q_kmeans_clusters, q_cc_labels,
q_semdedup lineage).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from .registry import query

_KM_K = 4
_KM_ROUNDS = 3
_KM_DIM = 64

# quantized exploded embeddings: (vec_id, dim 0-based, e milli-units)
_SQL_EX = """
    ex AS (
      SELECT vec_id,
             unnest(generate_series(1, len(embedding))) - 1 AS dim,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000)
               AS BIGINT) AS e
      FROM embeddings
    )"""


def _sql_kmeans(rounds: int, k: int) -> str:
    steps = []
    for r in range(1, rounds + 1):
        steps.append(f"""
    d{r} AS (
      SELECT x.vec_id, c.cid,
             SUM((x.e - c.c) * (x.e - c.c)) AS d2
      FROM ex x JOIN c{r - 1} c ON c.dim = x.dim
      GROUP BY 1, 2
    ),
    a{r} AS (
      SELECT vec_id, cid FROM d{r}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY d2, cid) = 1
    ),
    c{r} AS (
      SELECT a.cid, x.dim,
             CAST(CASE WHEN SUM(x.e) < 0
                  THEN -((-SUM(x.e)) // COUNT(*))
                  ELSE SUM(x.e) // COUNT(*)
             END AS BIGINT) AS c
      FROM ex x JOIN a{r} a USING (vec_id)
      GROUP BY 1, 2
    )""")
    return f"""
    WITH {_SQL_EX},
    seeds AS (
      SELECT vec_id,
             CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS cid
      FROM (SELECT DISTINCT vec_id FROM ex ORDER BY vec_id LIMIT {k})
    ),
    c0 AS (
      SELECT s.cid, x.dim, x.e AS c
      FROM ex x JOIN seeds s USING (vec_id)
    ),
    {",".join(steps)},
    sizes AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members
      FROM a{rounds} GROUP BY 1
    )
    SELECT c.cid, s.n_members, CAST(c.dim AS INTEGER) AS dim,
           c.c AS c_fp
    FROM c{rounds} c JOIN sizes s USING (cid)
    """


@query("q_kmeans_exact", _sql_kmeans(_KM_ROUNDS, _KM_K))
def q_kmeans_exact(spark, sf_dir):
    """Hash-certified integer k-means (the rows-only seeded-float
    q_kmeans_clusters' exact twin, the q_pagerank_exact discipline
    applied to Lloyd's): milli-quantized elements, THREE sweeps of
    integer squared-distance assignment (argmin tie-broken by cluster
    id via struct ordering) and sign-safe truncating-division centroid
    updates — every centroid coordinate after every sweep hash-matches
    the chained-CTE oracle. Physical shape per sweep: the exploded
    (vec, dim, e) frame joins a BROADCAST k·d centroid table, two hash
    aggregations — the standard distributed Lloyd's; the k·d centroid
    collect between sweeps is bounded state (the ivf.py precedent),
    never data-sized. Empty clusters simply drop their rows (both
    engines agree by construction)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = (
        emb.select(
            "vec_id", F.posexplode("embedding").alias("dim", "ev")
        )
        .select(
            "vec_id",
            "dim",
            F.round(F.col("ev").cast("double") * 1000)
            .cast("long")
            .alias("e"),
        )
        .localCheckpoint(eager=True)  # reused every sweep
    )
    seeds = [
        r["vec_id"]
        for r in ex.select("vec_id")
        .distinct()
        .orderBy("vec_id")
        .limit(_KM_K)
        .collect()
    ]
    seed_map = spark.createDataFrame(
        [(v, i) for i, v in enumerate(seeds)], "vec_id long, cid int"
    )
    cent = (
        ex.join(F.broadcast(seed_map), "vec_id")
        .select("cid", "dim", F.col("e").alias("c"))
        .localCheckpoint(eager=True)
    )
    assign = None
    for _ in range(_KM_ROUNDS):
        d = (
            ex.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum(
                    (F.col("e") - F.col("c")) * (F.col("e") - F.col("c"))
                ).alias("d2")
            )
        )
        assign = (
            d.groupBy("vec_id")
            .agg(F.min(F.struct("d2", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"))
        )
        cent = (
            ex.join(assign, "vec_id")
            .groupBy("cid", "dim")
            .agg(
                F.expr(
                    "CAST(CASE WHEN SUM(e) < 0"
                    " THEN -((-SUM(e)) div COUNT(*))"
                    " ELSE SUM(e) div COUNT(*) END AS BIGINT)"
                ).alias("c")
            )
            .localCheckpoint(eager=True)  # pin the sweep; flat lineage
        )
    sizes = assign.groupBy("cid").agg(
        F.count("*").cast("long").alias("n_members")
    )
    return cent.join(F.broadcast(sizes), "cid").select(
        "cid", "n_members", F.col("dim").cast("int").alias("dim"),
        F.col("c").alias("c_fp"),
    )


# ε in milli-units, tuned on the measured pair-distance distribution
# (min ≈ 1030, p1 ≈ 1193, median ≈ 1414): 1180 yields a genuine
# core/border/noise mixture at every tested SF (e.g. 101/169/30 at
# sf0.001) instead of a degenerate all-core or all-noise labeling
_DB_EPS_FP = 1180
_DB_MINPTS = 3  # core point: ≥ minPts neighbors within ε (excl. self)


@query(
    "q_dbscan_labels",
    f"""
    WITH {_SQL_EX},
    pts AS (SELECT DISTINCT vec_id FROM ex WHERE vec_id < 300),
    pairs AS (
      SELECT a.vec_id AS u, b.vec_id AS v
      FROM ex a JOIN ex b
        ON a.dim = b.dim AND a.vec_id < b.vec_id
      WHERE a.vec_id < 300 AND b.vec_id < 300
      GROUP BY 1, 2
      HAVING SUM((a.e - b.e) * (a.e - b.e)) <= {_DB_EPS_FP * _DB_EPS_FP}
    ),
    deg AS (
      SELECT p.vec_id,
             CAST(COALESCE(n.c, 0) AS BIGINT) AS n_eps
      FROM pts p LEFT JOIN (
        SELECT vec_id, COUNT(*) AS c FROM (
          SELECT u AS vec_id FROM pairs
          UNION ALL
          SELECT v AS vec_id FROM pairs
        ) GROUP BY 1
      ) n USING (vec_id)
    )
    SELECT vec_id, n_eps,
           CASE WHEN n_eps >= {_DB_MINPTS} THEN 'core'
                WHEN n_eps > 0 THEN 'border'
                ELSE 'noise' END AS role
    FROM deg
    """,
)
def q_dbscan_labels(spark, sf_dir):
    """DBSCAN point roles over an EXACT integer ε-ball graph (bounded
    to 300 vectors — the all-pairs oracle shape; the scale path feeds
    the same ε-predicate through the LSH-bucketed candidate pairs of
    q_ann_lsh_pairs): squared distances on milli-quantized elements are
    exact integers, so the neighbor graph — and therefore every
    core/border/noise label — is engine-identical, no float-boundary
    flicker. The pair join is dim-aligned with map-side partial sums
    and a HAVING on the exact distance; degrees from one union-all
    aggregate."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 300
    )
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "ev")
    ).select(
        "vec_id",
        "dim",
        F.round(F.col("ev").cast("double") * 1000).cast("long").alias("e"),
    )
    a = ex.select(
        F.col("vec_id").alias("u"), "dim", F.col("e").alias("ea")
    )
    b = ex.select(
        F.col("vec_id").alias("v"), "dim", F.col("e").alias("eb")
    )
    pairs = (
        a.join(b, "dim")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.sum(
                (F.col("ea") - F.col("eb")) * (F.col("ea") - F.col("eb"))
            ).alias("d2")
        )
        .filter(F.col("d2") <= _DB_EPS_FP * _DB_EPS_FP)
    )
    deg = (
        pairs.select(F.col("u").alias("vec_id"))
        .unionByName(pairs.select(F.col("v").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count("*").alias("c"))
    )
    pts = emb.select("vec_id").distinct()
    return (
        pts.join(deg, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("n_eps"),
            F.when(
                F.coalesce(F.col("c"), F.lit(0)) >= _DB_MINPTS, "core"
            )
            .when(F.coalesce(F.col("c"), F.lit(0)) > 0, "border")
            .otherwise("noise")
            .alias("role"),
        )
    )
