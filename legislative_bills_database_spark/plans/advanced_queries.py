"""Round-4 phase-5 queries: join pruning, multi-objective frontiers,
feature-engineering statistics, and neighborhood similarity.

The families here round out the analytics surface with the ops a
warehouse/feature-store team reaches for next: Bloom semi-join
reduction (the scan-side answer to "join 100 TB of facts against a 6%
dim slice"), Pareto skylines, one-pass correlation matrices, WOE/IV
predictive-power encoding, and co-occurrence Jaccard between graph
nodes. Reference analog: the R pipeline's merge()-then-filter joins and
single-key rankings (legiscan_main.R, CA_Legislation_Topic_Modeling.R)
— semantics generalized, physical strategy rebuilt for scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.compat import exact_sum, sql_exact_sum
from ..io import load_table, load_tables
from .registry import query


@query(
    "q_bloom_join",
    f"""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_exact_sum("l.l_extendedprice * (1 - l.l_discount)")}
             AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 48
    GROUP BY 1
    """,
)
def q_bloom_join(spark, sf_dir):
    """Bloom-pruned fact-dim join (operators/bloom.py): the build side
    (parts with p_size ≥ 48, ~6% of the dim) folds into a 2^20-bit
    bitset via distributed bit_or aggregation; the bitset rides the plan
    as an array<long> literal and drops non-matching lineitem rows AT
    THE SCAN, inside whole-stage codegen, before any exchange. False
    positives are eliminated by the real (broadcast) join, false
    negatives are impossible — this oracle hash is the machine proof
    that pruned == unpruned. At cluster scale the pattern turns
    "shuffle the fact table, then drop 94%" into "drop 94% during the
    Parquet scan"."""
    from ..operators.bloom import bloom_pruned_join

    part, lineitem = load_tables(spark, sf_dir, "part", "lineitem")
    dim = part.filter(F.col("p_size") >= 48).select("p_partkey", "p_brand")
    joined = bloom_pruned_join(
        lineitem, dim, "l_partkey", "p_partkey", num_bits=1 << 20, k=3
    )
    return joined.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_items"),
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
    )


@query(
    "q_skyline",
    """
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def q_skyline(spark, sf_dir):
    """Pareto frontier of parts — cheapest-per-size skyline (min
    p_retailprice, max p_size), operators/skyline.py: per-partition
    exact 2-D sort-scan discards every partition-dominated row at the
    scan, then one task re-scans the tiny candidate union. The oracle is
    the QUADRATIC NOT EXISTS dominance test — a value-hash match is a
    completeness proof that the two-phase plan loses no frontier point
    (including duplicate frontier points, which are mutually
    non-dominating and must all survive)."""
    from ..operators.skyline import skyline

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return skyline(part, minimize="p_retailprice", maximize="p_size")


_CORR_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_pairs() -> list[tuple[str, str]]:
    ms = _CORR_MEASURES
    return [(a, b) for i, a in enumerate(ms) for b in ms[i + 1 :]]


@query(
    "q_corr_matrix",
    "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y,"
        f" ROUND(CORR({a}, {b}), 6) AS r FROM lineitem"
        for a, b in _corr_pairs()
    ),
)
def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix of the lineitem measures in
    ONE aggregation pass: all 6 upper-triangle CORR aggregates share a
    single map-side-combined scan (no per-pair jobs — the naive loop
    would re-read the fact table C(n,2) times), then a stack() unpivots
    the 1×6 row to long form driver-side-free. The co-moment sums are
    centered by Spark's streaming covariance update, stable at
    100 TB row counts; ROUND(6) absorbs the cross-engine accumulation
    order."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = _corr_pairs()
    wide = li.agg(
        *[F.corr(a, b).alias(f"c_{i}") for i, (a, b) in enumerate(pairs)]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', round(c_{i}, 6)" for i, (a, b) in enumerate(pairs)
    )
    return wide.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) as (col_x, col_y, r)")
    )


@query(
    "q_woe_iv",
    """
    WITH labeled AS (
      SELECT LEAST(CAST(FLOOR(l_quantity / 10) AS BIGINT), 4) AS bin,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ), per_bin AS (
      SELECT bin,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(SUM(1 - y) AS BIGINT) AS n_neg
      FROM labeled GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n_pos) AS BIGINT) AS t_pos,
             CAST(SUM(n_neg) AS BIGINT) AS t_neg
      FROM per_bin
    )
    SELECT b.bin, b.n_pos, b.n_neg,
           ROUND(LN(((b.n_pos + 0.5) / t.t_pos)
                    / ((b.n_neg + 0.5) / t.t_neg)), 6) AS woe,
           ROUND((CAST(b.n_pos AS DOUBLE) / t.t_pos
                  - CAST(b.n_neg AS DOUBLE) / t.t_neg)
                 * LN(((b.n_pos + 0.5) / t.t_pos)
                      / ((b.n_neg + 0.5) / t.t_neg)), 6) AS iv_term
    FROM per_bin b CROSS JOIN tot t
    """,
)
def q_woe_iv(spark, sf_dir):
    """Weight-of-evidence / information-value encoding of a binned
    feature (quantity deciles-of-10, capped at bin 4) against the
    l_returnflag='R' target — the predictive-power screen credit-risk
    and feature-store pipelines run before model training. One grouped
    count pass; the class totals come back as a 1-row BROADCAST (never a
    full-frame window re-sort); +0.5 Laplace smoothing keeps empty
    cells finite. iv_term per bin sums to the classic IV statistic."""
    li = load_table(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.least(F.floor(F.col("l_quantity") / 10).cast("long"), F.lit(4)).alias(
            "bin"
        ),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    per_bin = labeled.groupBy("bin").agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
    )
    tot = per_bin.agg(
        F.sum("n_pos").cast("long").alias("t_pos"),
        F.sum("n_neg").cast("long").alias("t_neg"),
    )
    j = per_bin.join(F.broadcast(tot))
    woe = F.log(
        ((F.col("n_pos") + 0.5) / F.col("t_pos"))
        / ((F.col("n_neg") + 0.5) / F.col("t_neg"))
    )
    share_gap = (
        F.col("n_pos").cast("double") / F.col("t_pos")
        - F.col("n_neg").cast("double") / F.col("t_neg")
    )
    return j.select(
        "bin",
        "n_pos",
        "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round(share_gap * woe, 6).alias("iv_term"),
    )


@query(
    "q_graph_jaccard",
    """
    WITH cs AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), deg AS (
      SELECT supp, CAST(COUNT(*) AS BIGINT) AS d FROM cs GROUP BY 1
    ), inter AS (
      SELECT a.supp AS s1, b.supp AS s2, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM cs a JOIN cs b ON a.cust = b.cust AND a.supp < b.supp
      GROUP BY 1, 2
    )
    SELECT i.s1, i.s2, i.n_shared,
           ROUND(CAST(i.n_shared AS DOUBLE)
                 / (d1.d + d2.d - i.n_shared), 6) AS jaccard
    FROM inter i
    JOIN deg d1 ON i.s1 = d1.supp
    JOIN deg d2 ON i.s2 = d2.supp
    WHERE i.n_shared >= 2
    ORDER BY jaccard DESC, i.s1, i.s2
    LIMIT 100
    """,
)
def q_graph_jaccard(spark, sf_dir):
    """Neighborhood Jaccard between suppliers in the customer⋈supplier
    bipartite purchase graph: |shared customers| / |union of customers|,
    top-100 most-overlapping pairs. The co-occurrence self-join runs on
    the slim DISTINCT (cust, supp) edge list co-partitioned on the
    customer key — intersection counts and per-node degrees are the only
    shuffled aggregates; node payloads never move. Scale posture: the
    per-customer fan-out is quadratic in customer degree, so at real
    scale hot customers get degree-capped (sample their incident edges)
    exactly as hot shingles do in the MinHash band join — the supplier
    fan-in here is naturally bounded (≤ |suppliers|), documented rather
    than capped."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    cs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    deg = cs.groupBy("supp").agg(F.count("*").cast("long").alias("d"))
    a, b = cs.alias("a"), cs.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.supp") < F.col("b.supp")),
        )
        .groupBy(
            F.col("a.supp").alias("s1"), F.col("b.supp").alias("s2")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    d1 = deg.select(F.col("supp").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("supp").alias("s2"), F.col("d").alias("d2"))
    return (
        inter.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1",
            "s2",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("d1") + F.col("d2") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "s1", "s2")
        .limit(100)
    )


@query("q_stream_join")  # runs a real availableNow stream → rows-only
def q_stream_join(spark, sf_dir):
    """Driver-visible stream-stream JOIN parity census — the last
    stateful-streaming shape without one (aggregation, sessionization,
    and dedup censuses landed earlier this round). Purchase events
    self-join against later same-user events within 30 minutes, run as
    an append-mode availableNow stream over 4 time-ordered micro-batches
    (cross-batch buffered-state matches genuinely exercised: a purchase
    landing in batch k must match followers arriving in batch k+1) and
    as the identical batch join; one (n_batch, n_stream, n_mismatch,
    equal) row (streaming/joins.join_parity_report)."""
    from ..streaming.joins import join_parity_report

    return join_parity_report(spark, sf_dir)
