"""Round-6 phase-36 queries: contrastive-training data operations.

The ops a representation-learning pipeline runs between curation and
training: hard-negative mining (nearest cross-label neighbor — the
contrastive batch builder's core primitive), deterministic negative
sampling (portable pseudo-random non-edges for recommender training),
dimension-truncation recall (the Matryoshka question: how much ranking
survives cutting 64 dims to 16), and quantile normalization (map each
group's score distribution onto the global one — batch-effect
correction for heterogeneous sources).

Reference parity note: the reference (patrick95350/legislative-bills-
database) has no training surface — this module extends the SURVEY.md
§2.10 similarity-search/curation families (q_cosine_topk,
q_knn_accuracy, q_stratified_sample lineage).

Engine-parity notes: cosine scoring rides functions/vectors (sequential
double folds, identical element order in both engines); sampling keys
are the md5-portable q_reservoir_sample idiom over collision-free
column sets; quantile normalization is ALL-INTEGER rank arithmetic
(floor-divided index mapping — no interpolation floats to drift).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm, sql_cosine
from ..io import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Hard-negative mining (nearest cross-label neighbors)
# ---------------------------------------------------------------------------

_HN_COS = sql_cosine("q.embedding", "n.embedding")


@query(
    "q_hard_negatives",
    f"""
    SELECT q.vec_id AS qid, q.label AS q_label,
           n.vec_id AS nid, n.label AS n_label,
           ROUND({_HN_COS}, 3) AS cosine,
           CAST(row_number() OVER (PARTITION BY q.vec_id
                ORDER BY {_HN_COS} DESC, n.vec_id ASC) AS INTEGER) AS rank
    FROM embeddings q
    JOIN embeddings n ON n.label <> q.label
    WHERE q.vec_id < 50
    QUALIFY rank <= 3
    """,
)
def q_hard_negatives(spark, sf_dir):
    """Top-3 hard negatives per query vector: the most cosine-similar
    vectors carrying a DIFFERENT label — the contrastive-training batch
    builder's core mining primitive (easy negatives teach nothing; the
    near-miss cross-label neighbors carry the gradient). Same plan
    family as q_cosine_topk: broadcast query side with precomputed
    norms, label-inequality residual on the pair join, per-query window
    top-k. Cosine is the sequential double fold both engines replay in
    identical element order."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < 50).select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("qv"),
            l2_norm(F.col("embedding")).alias("__qn"),
        )
    )
    n = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("nv"),
        l2_norm(F.col("embedding")).alias("__nn"),
    )
    scored = q.join(n, F.col("n_label") != F.col("q_label")).withColumn(
        "cos",
        dot(F.col("qv"), F.col("nv")) / (F.col("__qn") * F.col("__nn")),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "qid",
            "q_label",
            "nid",
            "n_label",
            F.round(F.col("cos"), 3).alias("cosine"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling (portable pseudo-random non-edges)
# ---------------------------------------------------------------------------

_NEG_KEY_SQL = "md5(c_custkey || ':' || p_partkey)"


@query(
    "q_negative_sampling",
    f"""
    WITH cust AS (
      SELECT c_custkey FROM customer WHERE c_custkey < 100
    ), pool AS (
      SELECT p_partkey FROM part WHERE p_partkey < 200
    ), bought AS (
      SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey < 100 AND l.l_partkey < 200
    ), cand AS (
      SELECT c.c_custkey, p.p_partkey
      FROM cust c CROSS JOIN pool p
      ANTI JOIN bought b
        ON b.c_custkey = c.c_custkey AND b.p_partkey = p.p_partkey
    )
    SELECT c_custkey, p_partkey,
           CAST(row_number() OVER (PARTITION BY c_custkey
                ORDER BY {_NEG_KEY_SQL}) AS INTEGER) AS neg_rank
    FROM cand
    QUALIFY neg_rank <= 5
    """,
)
def q_negative_sampling(spark, sf_dir):
    """Five deterministic negative parts per customer (items they never
    bought) for recommender/contrastive training: candidate pool ×
    customers minus the observed purchase edges (broadcast anti-join),
    then a portable md5 rank picks each customer's negatives — the
    q_reservoir_sample idiom per group, so the SAMPLED ROWS hash-match
    cross-engine, not just the counts. The bounded pool stands in for
    the production pattern (hash-bucketed candidate slices per user
    shard); the anti-join and per-group top-k shapes are the ones that
    scale."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select("c_custkey")
    )
    pool = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 200)
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 100
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < 200
    )
    bought = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_partkey").alias("p_partkey"),
        )
        .distinct()
    )
    cand = cust.crossJoin(F.broadcast(pool)).join(
        F.broadcast(bought), ["c_custkey", "p_partkey"], "left_anti"
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.md5(F.concat_ws(":", F.col("c_custkey"), F.col("p_partkey")))
    )
    return (
        cand.withColumn("neg_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("neg_rank") <= 5)
        .select("c_custkey", "p_partkey", "neg_rank")
    )


# ---------------------------------------------------------------------------
# Dimension-truncation recall (the Matryoshka question)
# ---------------------------------------------------------------------------

_FULL_COS = sql_cosine("q.embedding", "n.embedding")
_TR_COS = sql_cosine("q.embedding[1:16]", "n.embedding[1:16]")


@query(
    "q_dim_truncation_recall",
    f"""
    WITH full_k AS (
      SELECT q.vec_id AS qid, n.vec_id AS nid
      FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
      WHERE q.vec_id < 20
      QUALIFY row_number() OVER (PARTITION BY q.vec_id
              ORDER BY {_FULL_COS} DESC, n.vec_id ASC) <= 10
    ), trunc_k AS (
      SELECT q.vec_id AS qid, n.vec_id AS nid
      FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
      WHERE q.vec_id < 20
      QUALIFY row_number() OVER (PARTITION BY q.vec_id
              ORDER BY {_TR_COS} DESC, n.vec_id ASC) <= 10
    )
    SELECT f.qid,
           CAST(COALESCE(SUM(CASE WHEN t.nid IS NOT NULL THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS n_overlap,
           ROUND(COALESCE(SUM(CASE WHEN t.nid IS NOT NULL THEN 1 ELSE 0 END),
                          0) / 10.0, 6) AS recall_at_10
    FROM full_k f
    LEFT JOIN trunc_k t ON t.qid = f.qid AND t.nid = f.nid
    GROUP BY 1
    """,
)
def q_dim_truncation_recall(spark, sf_dir):
    """Recall@10 of 16-dim-truncated cosine search against the full
    64-dim ranking, per query vector — the measurement behind
    Matryoshka-style dimension cuts ('can we afford to index a prefix
    slice'). Two brute-force rankings (the q_cosine_topk plan) joined
    on (query, neighbor); the overlap count is exact integers over a
    10.0 division. Both rankings tie-break (cosine desc, id asc) so the
    top-10 SETS are engine-deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")

    def topk(vec_expr):
        q = F.broadcast(
            emb.filter(F.col("vec_id") < 20).select(
                F.col("vec_id").alias("qid"),
                vec_expr(F.col("embedding")).alias("qv"),
            )
        )
        n = emb.select(
            F.col("vec_id").alias("nid"),
            vec_expr(F.col("embedding")).alias("nv"),
        )
        scored = q.join(n, F.col("qid") != F.col("nid")).withColumn(
            "cos",
            dot(F.col("qv"), F.col("nv"))
            / (l2_norm(F.col("qv")) * l2_norm(F.col("nv"))),
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("qid", "nid")
        )

    full_k = topk(lambda c: c)
    trunc_k = topk(lambda c: F.slice(c, 1, 16)).withColumnRenamed(
        "nid", "t_nid"
    )
    hit = F.sum(
        F.when(F.col("t_nid").isNotNull(), 1).otherwise(0)
    )
    return (
        full_k.join(
            trunc_k,
            (full_k.qid == trunc_k.qid) & (full_k.nid == trunc_k.t_nid),
            "left",
        )
        .drop(trunc_k.qid)
        .groupBy("qid")
        .agg(
            F.coalesce(hit, F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.coalesce(hit, F.lit(0)) / 10.0, 6
            ).alias("recall_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# Quantile normalization (all-integer rank mapping)
# ---------------------------------------------------------------------------


@query(
    "q_quantile_normalize",
    """
    WITH g AS (
      SELECT c_custkey, c_nationkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                  ORDER BY c_acctbal, c_custkey) AS BIGINT) AS r,
             CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS gn
      FROM customer
    ), gq AS (
      SELECT c_acctbal AS gv,
             CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey)
               AS BIGINT) - 1 AS idx
      FROM customer
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM customer),
    gg AS (SELECT g.*, n.nn FROM g, n)
    SELECT gg.c_custkey, gg.c_nationkey, gg.c_acctbal,
           gq.gv AS norm_acctbal
    FROM gg
    JOIN gq
      ON gq.idx = ((gg.r - 1) * (gg.nn - 1)) // GREATEST(gg.gn - 1, 1)
    WHERE gg.c_custkey < 500
    """,
)
def q_quantile_normalize(spark, sf_dir):
    """Quantile normalization of account balances ACROSS nations: each
    customer's value is replaced by the global value at the same
    within-nation rank position — the batch-effect correction that puts
    heterogeneous source distributions on one scale before thresholding
    (the corpus analog: per-source quality scores onto the corpus
    distribution). ALL-INTEGER: within-group ranks ride partitioned
    windows (distributed by nation), the global order is
    ordering.global_sort_index (range sort + O(#partitions) offsets —
    no one-task window), and the index mapping is a floor-divided
    rank product — no interpolation floats to drift, so the oracle
    hash-matches row-for-row. Output bounded to the first 500 customers
    (the full mapping is data-sized)."""
    from ..operators.ordering import global_sort_index

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    wg = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    g = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(wg).cast("long").alias("r"),
        F.count("*")
        .over(Window.partitionBy("c_nationkey"))
        .cast("long")
        .alias("gn"),
    )
    glob = global_sort_index(
        cust.select(F.col("c_acctbal").alias("gv"), "c_custkey"),
        [F.col("gv"), F.col("c_custkey")],
        index_col="idx",
    ).select("gv", "idx")
    n1 = cust.agg(F.count("*").cast("long").alias("nn"))
    return (
        g.join(F.broadcast(n1))  # 1-row broadcast: allowed BNLJ shape
        .withColumn(
            "t_idx",
            F.expr("((r - 1) * (nn - 1)) div GREATEST(gn - 1, 1)"),
        )
        .join(glob, F.col("t_idx") == glob.idx)
        .filter(F.col("c_custkey") < 500)
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.col("gv").alias("norm_acctbal"),
        )
    )
