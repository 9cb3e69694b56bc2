"""Round-4 phase-5 queries: join pruning, multi-objective frontiers,
feature-engineering statistics, and neighborhood similarity.

The families here round out the analytics surface with the ops a
warehouse/feature-store team reaches for next: Bloom semi-join
reduction (the scan-side answer to "join 100 TB of facts against a 6%
dim slice"), Pareto skylines, one-pass correlation matrices, WOE/IV
predictive-power encoding, and co-occurrence Jaccard between graph
nodes. Reference analog: the R pipeline's list-lookup joins and
grepl-based filters (legiscan_main.R:158-235,
legislator_bill_counts_run.R:97-126) — semantics generalized, physical
strategy rebuilt for scale.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.compat import exact_sum, sql_exact_sum
from ..io import load_table, load_tables
from ..operators.basket import cooccurrence_triples
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
    (parts with p_size ≥ 48, ~6% of the dim) folds into a right-sized
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
    # m = 2^14 bits ≈ 14×n at the bench dim slice (fp < 1%). Size m to
    # ~16n, not "as big as possible": the bitset is a PLAN LITERAL, and
    # an oversized array literal (2^20 bits = 16k longs) measurably
    # poisons codegen/plan handling — 9.2s → sub-second at sf0.1 for
    # identical output
    joined = bloom_pruned_join(
        lineitem, dim, "l_partkey", "p_partkey", num_bits=1 << 14, k=3
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
    than capped. A blanket per-customer top-N cap was measured and
    REJECTED for this query (r6): 1.8×/3.4× faster at N=30/20, but
    only 24/15 of the exact top-100 pairs survive — see the negative
    result at operators/basket.cooccurrence_pairs."""
    # the pipeline (slim DISTINCT edge list -> co-partitioned
    # cooccurrence_pairs -> broadcast degrees -> top-100) lives in
    # roundseven._jaccard_top100, memoized per (applicationId, sf_dir)
    # together with the edge list so the recall certificates and this
    # query share ONE materialization per sweep (ADVICE r8 item #5)
    from .roundseven_queries import _exact_top100

    return _exact_top100(spark, sf_dir)


@query("q_stream_join")  # runs a real availableNow stream → rows-only
def q_stream_join(spark, sf_dir):
    """Driver-visible stream-stream JOIN parity census — the last
    stateful-streaming shape without one (aggregation, sessionization,
    and dedup censuses landed earlier this round). Purchase events
    self-join against later same-user events within 30 minutes, run as
    an append-mode availableNow stream over 3 time-ordered micro-batches
    (cross-batch buffered-state matches genuinely exercised: a purchase
    landing in batch k must match followers arriving in batch k+1) and
    as the identical batch join; one (n_batch, n_stream, n_mismatch,
    equal) row (streaming/joins.join_parity_report)."""
    from ..streaming.joins import join_parity_report

    return join_parity_report(spark, sf_dir)


# ---------------------------------------------------------------------------
# Phase 6: itemset mining, robust preprocessing, anomaly baselines,
# privacy gates, and attribution weighting
# ---------------------------------------------------------------------------


@query(
    "q_frequent_triples",
    """
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS oid, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), minsup AS (
      SELECT CAST(CEIL(COUNT(DISTINCT oid) * 0.003) AS BIGINT) AS s
      FROM items
    ), l1 AS (
      SELECT item FROM items CROSS JOIN minsup
      GROUP BY item, minsup.s HAVING COUNT(*) >= minsup.s
    ), freq AS (
      SELECT i.oid, i.item FROM items i JOIN l1 ON i.item = l1.item
    )
    SELECT a.item AS i1, b.item AS i2, c.item AS i3,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM freq a
    JOIN freq b ON a.oid = b.oid AND a.item < b.item
    JOIN freq c ON b.oid = c.oid AND b.item < c.item
    CROSS JOIN minsup
    GROUP BY 1, 2, 3, minsup.s
    HAVING COUNT(*) >= minsup.s
    """,
)
def q_frequent_triples(spark, sf_dir):
    """Frequent 3-itemset mining (apriori shape) over brand baskets: the
    market-basket generalization of q_basket_lift's pairs. Min-support
    is RELATIVE (0.3% of baskets, a 1-row broadcast) so selectivity is
    scale-invariant — an absolute threshold silently degrades to
    "every candidate is frequent" as the data grows. The L1 prune (drop
    items below min-support BEFORE the candidate joins) is the apriori
    monotonicity step — on a long-tailed catalog it collapses the
    candidate space by orders of magnitude; the two self-joins then run
    basket-key-co-partitioned on the slim (oid, item) frame (one
    shuffle, reused by both joins), items ordered i1<i2<i3 so each
    triple counts once."""
    part, lineitem = load_tables(spark, sf_dir, "part", "lineitem")
    # checkpoint: minsup, l1, and freq each reference items — without it
    # the lineitem⋈part distinct re-executes three times (measured: most
    # of an 8 s wall at sf0.1 was this replay, not the triple joins)
    items = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("oid"), F.col("p_brand").alias("item"))
        .distinct()
        # r14: eager, not lazy — AQE materializes independent query
        # stages concurrently, and a lazy checkpoint shared by three
        # consumers is recomputed in parallel before its cache fills
        # (the minhash_lsh_pairs lesson)
    ).localCheckpoint(eager=True)
    minsup = items.agg(
        F.ceil(F.count_distinct("oid") * 0.003).cast("long").alias("s")
    )
    # l1 is eagerly checkpointed so its 1-row minsup BNLJ executes once
    # and stays OUT of freq's lineage (the persisted freq below is
    # referenced three times, which would replicate the BNLJ subtree in
    # the plan — the test_plan_audit BNLJ budget)
    l1 = (
        items.groupBy("item")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(minsup))
        .filter(F.col("n") >= F.col("s"))
        .select("item")
        .localCheckpoint(eager=True)
    )
    # localCheckpoint truncates the 1-row minsup broadcast out of freq's
    # lineage (BNLJ budget; the triple self-join references freq three
    # times and would replay it otherwise)
    # repartition("oid")+persist rather than a checkpoint: the triple
    # self-join probes freq three times on oid, and the persisted
    # layout keeps its hash partitioning (a checkpoint drops it), so
    # the candidate joins run exchange-free (guide §2.4). NOT
    # unpersisted (ADVICE r14, documented intentional): the returned
    # lazy triple join still reads freq at the caller's first action,
    # so an in-function unpersist would defeat the layout; the frame is
    # (oid, item)-grain over frequent items only — bounded, and the
    # session GCs it.
    freq = (
        items.join(F.broadcast(l1), "item")
        .select("oid", "item")
        .repartition("oid")
        .persist()
    )
    return (
        cooccurrence_triples(freq, "oid", "item")
        .join(F.broadcast(minsup))
        .filter(F.col("support") >= F.col("s"))
        .drop("s")
    )


@query(
    "q_winsorize",
    f"""
    WITH bounds AS (
      SELECT c_mktsegment,
             quantile_cont(c_acctbal, 0.05) AS lo,
             quantile_cont(c_acctbal, 0.95) AS hi
      FROM customer GROUP BY 1
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(b.lo, 4) AS p05,
           ROUND(b.hi, 4) AS p95,
           ROUND({sql_exact_sum("c.c_acctbal")} / COUNT(*), 4) AS mean_raw,
           ROUND({sql_exact_sum(
               "LEAST(GREATEST(c.c_acctbal, b.lo), b.hi)"
           )} / COUNT(*), 4) AS mean_winsorized,
           CAST(SUM(CASE WHEN c.c_acctbal < b.lo OR c.c_acctbal > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM customer c JOIN bounds b USING (c_mktsegment)
    GROUP BY 1, b.lo, b.hi
    """,
)
def q_winsorize(spark, sf_dir):
    """Per-segment winsorization (clip at exact [p05, p95]) — the robust
    preprocessing step feature pipelines apply before scale-sensitive
    models. EXACT percentiles (not the sketch — this is the
    calibration-quality variant; q_approx_quantiles is the 100 TB
    rollup), computed per group and broadcast back onto the rows: the
    per-group bounds table is |segments| rows, so the join-back is a
    broadcast, never a second full-frame window sort. Means via exact
    decimal sums; the clip itself is two branch-free LEAST/GREATEST
    expressions inside codegen."""
    cust = load_table(spark, sf_dir, "customer")
    bounds = cust.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", F.lit(0.05)).alias("lo"),
        F.percentile("c_acctbal", F.lit(0.95)).alias("hi"),
    )
    j = cust.join(F.broadcast(bounds), "c_mktsegment")
    clipped = F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi"))
    return j.groupBy("c_mktsegment", "lo", "hi").agg(
        F.count("*").cast("long").alias("n"),
        exact_sum("c_acctbal").alias("__sraw"),
        exact_sum(clipped).alias("__swin"),
        F.sum(
            (
                (F.col("c_acctbal") < F.col("lo"))
                | (F.col("c_acctbal") > F.col("hi"))
            ).cast("int")
        )
        .cast("long")
        .alias("n_clipped"),
    ).select(
        "c_mktsegment",
        "n",
        F.round("lo", 4).alias("p05"),
        F.round("hi", 4).alias("p95"),
        F.round(F.col("__sraw") / F.col("n"), 4).alias("mean_raw"),
        F.round(F.col("__swin") / F.col("n"), 4).alias("mean_winsorized"),
        "n_clipped",
    )


@query(
    "q_seasonal_anomaly",
    """
    WITH cells AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hr,
             avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY 1, 2
    )
    SELECT e.event_id, e.event_type, EXTRACT(hour FROM e.ts) AS hr,
           ROUND((e.value - c.mu) / c.sigma, 3) AS z
    FROM events e
    JOIN cells c ON e.event_type = c.event_type
                AND EXTRACT(hour FROM e.ts) = c.hr
    WHERE c.sigma > 0 AND abs((e.value - c.mu) / c.sigma) > 2.5
    """,
)
def q_seasonal_anomaly(spark, sf_dir):
    """Seasonality-adjusted anomaly detection: the baseline is the
    (event_type × hour-of-day) cell mean/σ — a diurnal profile — so a
    value that is normal at peak hour but aberrant at 3am flags, which
    a global per-type z-score (q_zscore_outliers) structurally cannot
    see. The cell table is |types|×24 rows: aggregated once,
    BROADCAST back onto the stream — scoring is a map-only stage, no
    second shuffle of the fact table."""
    events = load_table(spark, sf_dir, "events")
    pts = events.select(
        "event_id", "event_type", F.hour("ts").alias("hr"), "value"
    )
    cells = pts.groupBy("event_type", "hr").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        pts.join(F.broadcast(cells), ["event_type", "hr"])
        .filter((F.col("sigma") > 0) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "event_type",
            F.col("hr").cast("long").alias("hr"),
            F.round(z, 3).alias("z"),
        )
    )


@query(
    "q_k_anonymity",
    """
    WITH qi AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS grp_n
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(SUM(grp_n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unsafe_groups,
           CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           ROUND(CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END)
                      AS DOUBLE) / SUM(grp_n), 6) AS suppression_rate
    FROM qi
    """,
)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity census over quasi-identifiers (segment × nation ×
    $1000 balance band), k=5 — the privacy gate a training-data release
    runs before shipping user-derived records: every row whose QI group
    has <k members is re-identifiable and must be suppressed or
    generalized. Two map-side-combined aggregations (rows → groups →
    1-row census); only 5 numbers reach the driver at any scale. All
    SUMs cast to BIGINT (the r3 HUGEINT lesson)."""
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(F.count("*").cast("long").alias("grp_n"))
    unsafe = F.col("grp_n") < 5
    return qi.agg(
        F.sum("grp_n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum(unsafe.cast("int")).cast("long").alias("n_unsafe_groups"),
        F.sum(F.when(unsafe, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.round(
            F.sum(F.when(unsafe, F.col("grp_n")).otherwise(0)).cast("double")
            / F.sum("grp_n"),
            6,
        ).alias("suppression_rate"),
    )


@query(
    "q_time_decay_attribution",
    """
    WITH purchases AS (
      SELECT event_id AS pid, user_id, ts AS pts FROM events
      WHERE event_type = 'purchase'
    ), touches AS (
      SELECT event_id AS tid, user_id, event_type, ts AS tts FROM events
      WHERE event_type <> 'purchase'
    ), pairs AS (
      SELECT p.pid, t.event_type,
             POWER(2, -CAST(FLOOR(CAST(epoch_us(p.pts) - epoch_us(t.tts)
                                       AS DOUBLE) / 86400000000.0)
                            AS BIGINT)) AS w
      FROM purchases p
      JOIN touches t
        ON p.user_id = t.user_id
       AND t.tts < p.pts
       AND t.tts >= p.pts - INTERVAL 7 DAY
    ), shared AS (
      SELECT pid, event_type, w,
             SUM(w) OVER (PARTITION BY pid) AS total_w
      FROM pairs
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(CAST(SUM(CAST(w / total_w AS DECIMAL(18,6)))
                      AS DOUBLE), 4) AS credit
    FROM shared GROUP BY 1
    """,
)
def q_time_decay_attribution(spark, sf_dir):
    """Time-decay multi-touch attribution: each purchase distributes one
    unit of credit over the user's preceding 7 days of touches, halving
    per day of age — the marketing-science upgrade of q_attribution's
    first/last heuristic. Determinism by construction: the decay weight
    is 2^(-whole days), an EXACT power of two, so per-purchase weight
    sums are IEEE-exact in any accumulation order and the credit shares
    are bit-identical cross-engine; only the final per-channel sum needs
    the decimal cast. The user-key range join is the q_asof_join
    shape: co-partitioned on user_id, interval predicate pushed into
    the join condition."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    touches = events.filter(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("tid"),
        "user_id",
        "event_type",
        F.col("ts").alias("tts"),
    )
    age_days = F.floor(
        (F.unix_micros("pts") - F.unix_micros("tts")).cast("double")
        / 86400000000.0
    ).cast("long")
    pairs = purchases.join(
        touches,
        (purchases.user_id == touches.user_id)
        & (touches.tts < purchases.pts)
        & (touches.tts >= purchases.pts - F.expr("INTERVAL 7 DAYS")),
    ).select("pid", "event_type", F.pow(F.lit(2.0), -age_days).alias("w"))
    w_tot = Window.partitionBy("pid")
    shared = pairs.withColumn("total_w", F.sum("w").over(w_tot))
    return shared.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_touches"),
        F.round(
            F.sum((F.col("w") / F.col("total_w")).cast("decimal(18,6)")).cast(
                "double"
            ),
            4,
        ).alias("credit"),
    )


from ..operators.tfidf import doc_keyphrases, sql_doc_keyphrases  # noqa: E402


@query("q_doc_keyphrases", sql_doc_keyphrases(min_count=5, per_doc=3))
def q_doc_keyphrases(spark, sf_dir):
    """Per-document keyphrase extraction: each document's top-3 bigrams
    ranked by corpus-level PMI (operators/tfidf.doc_keyphrases) — the
    collocation table q_bigram_pmi mines globally, applied back to the
    documents that contain each collocation. The score table is
    vocabulary-bounded and broadcast; the only fact-side shuffle is the
    per-doc rank window over the (doc, w1, w2) triples."""
    docs = load_table(spark, sf_dir, "documents")
    return doc_keyphrases(docs, min_count=5, per_doc=3)


# ---------------------------------------------------------------------------
# Phase 7: sampled closeness centrality, activity streaks, degree census
# ---------------------------------------------------------------------------


# r15 optimization (VERDICT r14 #2, guide §2.4 + the _cs_edges memo
# discipline): q_closeness and q_harmonic_centrality each rebuilt,
# re-persisted, and unpersisted the IDENTICAL symmetrized purchase
# graph inside multi_source_bfs — ~2 s of each query's wall was the
# orders⋈lineitem + distinct + repartition("src") layout build. One
# src-partitioned layout per (applicationId, sf_dir), materialized
# eagerly on first use (count() — the r14 multi-consumer rule: an
# unmaterialized cache shared by AQE-concurrent stages is computed
# more than once), INTENTIONALLY session-lifetime (the ivf
# _CENTROID_CACHE precedent: executor storage holds one ~1.17 M-row
# (src, dst) frame per dataset, bounded and reused by every bench/
# preflight invocation of both queries).
_PURCHASE_SYM_CACHE: dict[tuple[str, str], "DataFrame"] = {}


def _purchase_sym(spark, sf_dir):
    from ..operators.graph import symmetrized_layout

    key = (spark.sparkContext.applicationId, str(sf_dir))
    cached = _PURCHASE_SYM_CACHE.get(key)
    if cached is not None:
        return cached
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    edges = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    sym = symmetrized_layout(edges)
    sym.count()  # materialize once, before any fan-out consumer
    _PURCHASE_SYM_CACHE[key] = sym
    return sym


@query(
    "q_closeness",
    """
    WITH RECURSIVE e AS (
      SELECT DISTINCT concat('c', o_custkey) AS src,
                      concat('s', l_suppkey) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), sym AS (
      SELECT src, dst FROM e UNION SELECT dst, src FROM e
    ), bfs AS (
      SELECT seed, seed AS node, 0 AS dist
      FROM (VALUES ('s1'), ('s2'), ('s3'), ('s4')) AS seeds(seed)
      UNION
      SELECT b.seed, s.dst, b.dist + 1
      FROM bfs b JOIN sym s ON b.node = s.src
      WHERE b.dist < 6
    ), md AS (
      SELECT seed, node, MIN(dist) AS dist FROM bfs GROUP BY 1, 2
    )
    SELECT seed,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
           CAST(SUM(dist) AS BIGINT) AS total_dist,
           ROUND(CAST(COUNT(*) - 1 AS DOUBLE) / SUM(dist), 6) AS closeness
    FROM md GROUP BY 1
    """,
)
def q_closeness(spark, sf_dir):
    """Sampled closeness centrality of four landmark suppliers over the
    customer↔supplier purchase graph (operators/graph.multi_source_bfs):
    closeness = (reached−1) / Σ hop-distances. All four BFS trees grow
    in ONE frontier loop keyed (seed, node) — rounds bounded by graph
    diameter, not diameter × seeds, the property that makes sampled
    centrality affordable on a big graph. Second iterative operator
    with a FULL value-hash oracle (DuckDB recursive CTE), so the hash
    certifies the loop's per-seed visited bookkeeping, not just counts.
    The symmetrized graph layout is the shared per-(app, sf_dir) memo
    (_purchase_sym) — one build per session for this query AND
    q_harmonic_centrality."""
    from ..operators.graph import multi_source_bfs

    sym = _purchase_sym(spark, sf_dir)
    # edges arg only types the empty-panel schema; the loop probes sym
    seeds = spark.createDataFrame([("s1",), ("s2",), ("s3",), ("s4",)], "seed string")
    dists = multi_source_bfs(sym, seeds, max_hops=6, sym_layout=sym)
    return dists.groupBy("seed").agg(
        (F.count("*") - 1).cast("long").alias("n_reached"),
        F.sum("dist").cast("long").alias("total_dist"),
        F.round(
            (F.count("*") - 1).cast("double") / F.sum("dist"), 6
        ).alias("closeness"),
    )


@query(
    "q_streaks",
    """
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), grp AS (
      SELECT user_id, d,
             CAST(d - CAST('1970-01-01' AS DATE) AS BIGINT)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
               AS island
      FROM daily
    ), runs AS (
      SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM grp GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(run_len) AS BIGINT) AS active_days,
           CAST(MAX(run_len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY 1
    """,
)
def q_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands rewrite: day_number − row_number is constant
    exactly within a consecutive run, so one user-key window + two
    grouped counts replace any per-user iteration. All three shuffles
    share the user_id key (AQE coalesces them onto one layout); the
    per-user window sorts only that user's distinct days."""
    events = load_table(spark, sf_dir, "events")
    daily = events.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = daily.select(
        "user_id",
        (
            F.datediff("d", F.lit("1970-01-01").cast("date")).cast("long")
            - F.row_number().over(w)
        ).alias("island"),
    )
    runs = grp.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("long").alias("active_days"),
        F.max("run_len").cast("long").alias("longest_streak"),
        F.count("*").cast("long").alias("n_streaks"),
    )


@query(
    "q_degree_distribution",
    """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), degs AS (
      SELECT 'customer' AS side, cust AS node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM e GROUP BY 1, 2
      UNION ALL
      SELECT 'supplier', supp, CAST(COUNT(*) AS BIGINT) FROM e GROUP BY 1, 2
    )
    SELECT side, deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM degs GROUP BY 1, 2
    """,
)
def q_degree_distribution(spark, sf_dir):
    """Degree distribution of both sides of the bipartite purchase
    graph — the skew census run before any graph algorithm is launched
    (it is what justifies q_triangle_count's degree orientation and the
    salting thresholds): distinct-edge degrees per node, then node
    counts per degree. Two map-side-combined aggregations over the slim
    edge list; output is |distinct degrees| rows regardless of graph
    size."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    e = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    degs = (
        e.groupBy(F.col("cust").alias("node"))
        .agg(F.count("*").cast("long").alias("deg"))
        .select(F.lit("customer").alias("side"), "deg")
        .unionByName(
            e.groupBy(F.col("supp").alias("node"))
            .agg(F.count("*").cast("long").alias("deg"))
            .select(F.lit("supplier").alias("side"), "deg")
        )
    )
    return degs.groupBy("side", "deg").agg(
        F.count("*").cast("long").alias("n_nodes")
    )


# ---------------------------------------------------------------------------
# Phase 8: clamped scans, exact integer allocation, change-point detection
# ---------------------------------------------------------------------------


@query(
    "q_capped_runsum",
    """
    WITH d AS (
      SELECT user_id,
             list(CAST(ROUND(value * 100) AS BIGINT)
                  * CASE WHEN event_type = 'purchase' THEN -1 ELSE 1 END
                  ORDER BY ts, event_id) AS deltas
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(deltas) AS BIGINT) AS n_obs,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT), deltas),
             (a, x) -> GREATEST(a + x, CAST(0 AS BIGINT))
           ) AS final_balance
    FROM d
    """,
)
def q_capped_runsum(spark, sf_dir):
    """Floor-clamped running balance (inventory/wallet semantics: the
    balance can't go negative — purchases debit, everything else
    credits, in exact cents). NOT a window sum: the clamp is non-linear.
    operators/timeseries.capped_runsum_chunked exploits that the step
    map a→max(a+Δ,0) composes associatively ((s,m) transforms), so
    fixed chunks fold independently and reduce in order —
    O(chunk + n/chunk) per-key memory, and because deltas are integers
    every composition is EXACT: the oracle is DuckDB's genuinely
    sequential list_reduce, so a green hash proves chunked == one-pass
    bit-for-bit. chunk_size=16 forces multi-chunk composition at every
    sf."""
    from ..operators.timeseries import capped_runsum_chunked

    events = load_table(spark, sf_dir, "events")
    deltas = events.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.round(F.col("value") * 100).cast("long")
            * F.when(F.col("event_type") == "purchase", -1).otherwise(1)
        ).alias("delta"),
    )
    return capped_runsum_chunked(
        deltas, "user_id", "ts", "delta", "event_id", chunk_size=16
    )


@query(
    "q_allocation",
    """
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p
      FROM lineitem
    ), tot AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total
      FROM orders
    ), base AS (
      SELECT li.l_orderkey, li.l_linenumber,
             (tot.total * li.p) // SUM(li.p) OVER w AS base_cents,
             (tot.total * li.p) % SUM(li.p) OVER w AS rem,
             tot.total
      FROM li JOIN tot ON li.l_orderkey = tot.o_orderkey
      WINDOW w AS (PARTITION BY li.l_orderkey)
    ), ranked AS (
      SELECT *,
             total - SUM(base_cents) OVER (PARTITION BY l_orderkey)
               AS shortfall,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY rem DESC, l_linenumber) AS rr
      FROM base
    )
    SELECT l_orderkey, l_linenumber,
           CAST(base_cents + CASE WHEN rr <= shortfall THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM ranked
    """,
)
def q_allocation(spark, sf_dir):
    """Largest-remainder integer allocation: split each order's total
    (exact cents) across its lineitems proportional to item price so the
    parts sum EXACTLY to the whole — the financial proration every
    billing/revenue-recognition pipeline needs (floor-and-distribute;
    naive rounding drifts by up to n/2 cents per order). Pure integer
    arithmetic (64-bit products, DIV/MOD), so cross-engine equality is
    bit-exact with no rounding slop; two windows and one rank, all
    sharing the order-key partitioning — one shuffle total."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    li = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
    )
    tot = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total"),
    )
    w = Window.partitionBy("l_orderkey")
    j = li.join(tot, li.l_orderkey == tot.o_orderkey).select(
        "l_orderkey", "l_linenumber", "p", "total"
    )
    sp = F.sum("p").over(w)
    base = j.select(
        "l_orderkey",
        "l_linenumber",
        "total",
        F.expr("total * p DIV sum(p) OVER (PARTITION BY l_orderkey)").alias(
            "base_cents"
        ),
        F.expr("(total * p) % sum(p) OVER (PARTITION BY l_orderkey)").alias(
            "rem"
        ),
    )
    ranked = base.select(
        "l_orderkey",
        "l_linenumber",
        "base_cents",
        (F.col("total") - F.sum("base_cents").over(w)).alias("shortfall"),
        F.row_number()
        .over(
            Window.partitionBy("l_orderkey").orderBy(
                F.col("rem").desc(), "l_linenumber"
            )
        )
        .alias("rr"),
    )
    return ranked.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("base_cents")
            + F.when(F.col("rr") <= F.col("shortfall"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_cents"),
    )


@query(
    "q_cusum",
    """
    WITH pts AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS x,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS k,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS prefix
      FROM events
    ), tot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS t
      FROM pts GROUP BY 1
    ), scored AS (
      SELECT p.event_type, tot.n, p.k,
             abs(tot.n * p.prefix - p.k * tot.t) AS dev_scaled
      FROM pts p JOIN tot USING (event_type)
    )
    SELECT event_type, n,
           CAST(k AS BIGINT) AS cp_index,
           ROUND(CAST(dev_scaled AS DOUBLE) / n / 100.0, 4) AS peak_dev
    FROM scored
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY dev_scaled DESC, k) = 1
    """,
)
def q_cusum(spark, sf_dir):
    """CUSUM change-point detection per event type: the k maximizing
    |Σ_{i≤k}(x_i − μ)| — where the cumulative deviation from the mean
    peaks — locates the most likely level shift in the series. The
    textbook statistic needs μ upfront; multiplying through by n turns
    it into n·prefix_k − k·T, ALL 64-bit integer (cents), so the
    running sum, the argmax, and the tie-break are bit-exact
    cross-engine — no floating CUSUM drift. One ordered window per
    type + a |types|-row broadcast of (n, T); peak_dev converts back to
    mean-units only at the output."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pts = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.row_number().over(w).alias("k"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("prefix"),
    )
    tot = pts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("t"),
    )
    scored = pts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "n",
        "k",
        F.abs(F.col("n") * F.col("prefix") - F.col("k") * F.col("t")).alias(
            "dev_scaled"
        ),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("dev_scaled").desc(), "k"
    )
    return (
        scored.withColumn("rr", F.row_number().over(pick))
        .filter(F.col("rr") == 1)
        .select(
            "event_type",
            "n",
            F.col("k").cast("long").alias("cp_index"),
            F.round(
                F.col("dev_scaled").cast("double") / F.col("n") / 100.0, 4
            ).alias("peak_dev"),
        )
    )


@query("q_stream_late")  # runs a real availableNow stream → rows-only
def q_stream_late(spark, sf_dir):
    """Watermark late-data accounting census — the inverse of the parity
    censuses (which run unbounded watermarks so nothing is evicted):
    out-of-order arrival (files partitioned by user, each spanning the
    full time range) under a PRODUCTION 2-hour watermark, append-mode
    tumbling counts. One row quantifies what the watermark did: tail
    windows withheld (never finalized), common windows short-counted,
    and exactly how many rows were dropped as late
    (streaming/events.late_data_report). Completes the streaming
    contract suite: merge (q_stream_parity), sessions
    (q_stream_sessions), lookup (q_stream_join), dedup (q_stream_dedup),
    and now eviction/late accounting — all driver-visible."""
    from ..streaming.events import late_data_report

    return late_data_report(spark, sf_dir)


# ---------------------------------------------------------------------------
# Phase 9: bigram LM scoring, item-CF recommendations, rolling correlation
# ---------------------------------------------------------------------------


@query(
    "q_lm_perplexity",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ), docbig AS (
      SELECT doc_id,
             unnest([l[i] FOR i IN generate_series(1, len(l) - 1)]) AS w1,
             unnest([l[i + 1] FOR i IN generate_series(1, len(l) - 1)]) AS w2
      FROM toks WHERE len(l) >= 2
    ), ucnt AS (
      SELECT w1 AS w, CAST(COUNT(*) AS DOUBLE) AS c FROM docbig GROUP BY 1
    ), vsize AS (
      SELECT CAST(COUNT(DISTINCT w2) AS DOUBLE) AS v FROM docbig
    ), bcnt AS (
      SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS cb
      FROM docbig GROUP BY 1, 2
    ), scored AS (
      SELECT d.doc_id,
             CAST(ln((b.cb + 0.5) / (u.c + 0.5 * vs.v))
                  AS DECIMAL(18,6)) AS lp
      FROM docbig d
      JOIN bcnt b ON d.w1 = b.w1 AND d.w2 = b.w2
      JOIN ucnt u ON d.w1 = u.w
      CROSS JOIN vsize vs
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(EXP(-CAST(SUM(lp) AS DOUBLE) / COUNT(*)), 4) AS ppl
    FROM scored GROUP BY 1
    """,
)
def q_lm_perplexity(spark, sf_dir):
    """Bigram-LM perplexity per document — the CCNet-style language-model
    quality filter: a +0.5-smoothed bigram model is fit on the corpus
    itself and every document is scored by exp(−mean log P(w₂|w₁)).
    High perplexity = the document's word transitions are unlike the
    corpus = boilerplate/garble candidate. The conditional-probability
    upgrade of q_unigram_score. Count tables are slim triples
    co-partitioned on w1 (never the text); V is a 1-row broadcast;
    per-doc log-prob sums go through DECIMAL so accumulation order
    can't smear the hash; EXP applied once at the end."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = docs.select("doc_id", toks.alias("l")).filter(F.size("l") >= 2)
    docbig = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l") - 1),
                lambda i: F.struct(
                    F.element_at("l", i).alias("w1"),
                    F.element_at("l", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    ucnt = docbig.groupBy(F.col("w1").alias("w")).agg(
        F.count("*").cast("double").alias("c")
    )
    vsize = docbig.agg(
        F.count_distinct("w2").cast("double").alias("v")
    )
    bcnt = docbig.groupBy("w1", "w2").agg(
        F.count("*").cast("double").alias("cb")
    )
    lp = F.log(
        (F.col("cb") + 0.5) / (F.col("c") + 0.5 * F.col("v"))
    ).cast("decimal(18,6)")
    scored = (
        docbig.join(bcnt, ["w1", "w2"])
        .join(F.broadcast(ucnt), docbig.w1 == ucnt.w)
        .join(F.broadcast(vsize))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(
            F.exp(-(F.sum("lp").cast("double")) / F.count("*")), 4
        ).alias("ppl"),
    )


@query(
    "q_item_cf_recs",
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
    ), simtop AS (
      SELECT i.s1, i.s2,
             ROUND(CAST(i.n_shared AS DOUBLE)
                   / (d1.d + d2.d - i.n_shared), 6) AS sim
      FROM inter i
      JOIN deg d1 ON i.s1 = d1.supp
      JOIN deg d2 ON i.s2 = d2.supp
      WHERE i.n_shared >= 2
      ORDER BY sim DESC, i.s1, i.s2
      LIMIT 100
    ), sym AS (
      SELECT s1 AS a, s2 AS b, sim FROM simtop
      UNION ALL
      SELECT s2, s1, sim FROM simtop
    ), cand AS (
      SELECT cs.cust, sym.b AS rec,
             CAST(SUM(CAST(sym.sim AS DECIMAL(18,6))) AS DOUBLE) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_paths
      FROM cs JOIN sym ON cs.supp = sym.a
      GROUP BY 1, 2
    ), novel AS (
      SELECT c.cust, c.rec, ROUND(c.score, 6) AS score, c.n_paths
      FROM cand c
      WHERE NOT EXISTS (
        SELECT 1 FROM cs WHERE cs.cust = c.cust AND cs.supp = c.rec)
    )
    SELECT cust, rec, score, n_paths FROM novel
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY cust ORDER BY score DESC, rec) <= 3
    """,
)
def q_item_cf_recs(spark, sf_dir):
    """Item-based collaborative filtering: recommend up to 3 NEW
    suppliers per customer by summing the Jaccard similarity of their
    current suppliers' top-100 most-similar pairs (q_graph_jaccard's
    table) — the classic 'customers like you also buy from' engine.
    The similarity table is k-bounded (top-100) and BROADCAST, so the
    candidate generation is one map-side join over the slim edge list
    regardless of graph size; the anti-join removes already-used
    suppliers; decimal-summed scores keep the ranking deterministic.
    Edge list and similarity table come from the roundseven memoized
    chains (ADVICE r8 item #5) — this query, q_graph_jaccard and the
    recall certificates share one materialization per sweep."""
    from .roundseven_queries import _cf_recs, _cs_edges, _exact_top100

    cs = _cs_edges(spark, sf_dir)
    return _cf_recs(cs, _exact_top100(spark, sf_dir))


@query(
    "q_rolling_corr",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END)
                  AS DOUBLE) AS buy_v,
             CAST(SUM(CASE WHEN event_type <> 'purchase'
                      THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END)
                  AS DOUBLE) AS other_v
      FROM events GROUP BY 1
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           ROUND(corr(buy_v, other_v) OVER (
             ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW
           ), 4) AS r24
    FROM hourly
    """,
)
def q_rolling_corr(spark, sf_dir):
    """Rolling 24-hour correlation between purchase value and
    non-purchase activity — the co-movement monitor behind 'did the
    relationship between engagement and spend break this morning'
    alerts. The window correlation rides the ALREADY-AGGREGATED hourly
    frame (|hours| rows, decimal-exact cell sums), so the ordered
    window is tiny regardless of event volume; at true scale the hourly
    rollup is the only fact-table pass. The single-series global window
    is acceptable exactly because its input is pre-aggregated —
    documented deliberately (same posture as q_gini's global rank)."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("buy_v"),
        F.sum(
            F.when(
                F.col("event_type") != "purchase",
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("other_v"),
    )
    w = Window.orderBy("h").rowsBetween(-23, 0)
    return hourly.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.round(F.corr("buy_v", "other_v").over(w), 4).alias("r24"),
    )


# ---------------------------------------------------------------------------
# Phase 10: quarantine side-output, partition-gap audit, hash bootstrap
# ---------------------------------------------------------------------------

from ..functions import text as T  # noqa: E402


@query(
    "q_quarantine",
    f"""
    WITH rep AS (
      SELECT doc_id, floor(CAST(max(n) AS DOUBLE) / sum(n) * 10000.0 + 0.5)
               / 10000.0 AS top_frac
      FROM (
        SELECT doc_id, gram, count(*) AS n
        FROM (
          SELECT doc_id,
                 unnest({{ngrams}}) AS gram
          FROM documents
        ) GROUP BY doc_id, gram
      ) GROUP BY doc_id
    ), reasons AS (
      SELECT d.doc_id, d.n_chars,
             CASE
               WHEN len(string_split(d.text, ' ')) < 20 THEN 'too_short'
               WHEN {{quality}} < 0.5 THEN 'low_quality'
               WHEN r.top_frac > 0.06 THEN 'repetitive'
               WHEN {{langid}} = 'und' THEN 'lang_unknown'
               ELSE 'kept'
             END AS reason
      FROM documents d JOIN rep r USING (doc_id)
    )
    SELECT reason,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 2) AS avg_chars
    FROM reasons GROUP BY 1
    """.format(
        ngrams=T.sql_ngrams_all("string_split(text, ' ')", 2),
        quality=T.sql_quality_score("d.text"),
        langid=T.sql_lang_id("string_split(lower(d.text), ' ')"),
    ),
)
def q_quarantine(spark, sf_dir):
    """Quarantine census — the OTHER half of q_corpus_filter_pipeline:
    production cleaning pipelines never silently drop, they side-output
    every rejected document with its FIRST-failing gate (fixed priority:
    too_short → low_quality → repetitive → lang_unknown) so operators
    can see what each gate costs and regressions in one gate don't hide
    behind another. Identical single-pass physical shape (scalar gates
    in the scan stage, one repetition join-back); the multiplexed
    reason CASE replaces the filter, so kept + 4 reject classes come
    out of ONE pass, not five."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(T.ngrams_all(T.tokens(F.col("text")), 2)).alias("gram"),
    )
    rep = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(
            (
                F.floor(F.max("n").cast("double") / F.sum("n") * 10000.0 + 0.5)
                / 10000.0
            ).alias("top_frac")
        )
    )
    tok = T.tokens(F.col("text"))
    reason = (
        F.when(F.size(tok) < 20, "too_short")
        .when(T.quality_score(F.col("text")) < 0.5, "low_quality")
        .when(F.col("top_frac") > 0.06, "repetitive")
        .when(
            T.lang_id(T.tokens(F.lower(F.col("text")))) == "und",
            "lang_unknown",
        )
        .otherwise("kept")
    )
    return (
        docs.join(rep, "doc_id")
        .select(reason.alias("reason"), "n_chars")
        .groupBy("reason")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("n_chars").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                2,
            ).alias("avg_chars"),
        )
    )


@query(
    "q_partition_gaps",
    """
    WITH feed AS (
      SELECT date_trunc('hour', ts) AS h FROM events
      WHERE user_id = (SELECT MIN(user_id) FROM events)
    ), hourly AS (
      SELECT DISTINCT h FROM feed
    ), span AS (
      SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly
    ), cal AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM span
    ), missing AS (
      SELECT c.h FROM cal c
      WHERE NOT EXISTS (SELECT 1 FROM hourly x WHERE x.h = c.h)
    ), runs AS (
      SELECT h,
             CAST(epoch(h) AS BIGINT) // 3600
               - ROW_NUMBER() OVER (ORDER BY h) AS island
      FROM missing
    )
    SELECT strftime(MIN(h), '%Y-%m-%d %H:%M:%S') AS gap_start,
           strftime(MAX(h), '%Y-%m-%d %H:%M:%S') AS gap_end,
           CAST(COUNT(*) AS BIGINT) AS n_hours
    FROM runs GROUP BY island
    """,
)
def q_partition_gaps(spark, sf_dir):
    """Ingest-completeness audit: which HOURLY partitions are missing
    from a feed, reported as contiguous gap ranges — the first thing a
    backfill planner asks of a time-partitioned 100 TB table. Audited
    feed = the lowest-id user's event stream (events-per-user is
    scale-invariant in the fixtures, so gaps exist at EVERY sf; a
    whole-table audit is vacuously complete). The expected calendar is
    generated from the observed span executor-side (sequence + explode
    — no driver loop); missing hours fall out of an anti-join;
    consecutive missing hours collapse to ranges via the q_streaks
    gaps-and-islands rewrite. Every frame after the feed filter is
    |hours|-sized, so the global window is bounded by wall-clock span,
    not data volume."""
    events = load_table(spark, sf_dir, "events")
    minu = events.agg(F.min("user_id").alias("mu"))
    feed = events.join(
        F.broadcast(minu), events.user_id == F.col("mu")
    ).select(F.date_trunc("hour", "ts").alias("h"))
    hourly = feed.distinct()
    span = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    cal = span.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h")
    )
    missing = cal.join(hourly, "h", "left_anti")
    w = Window.orderBy("h")
    runs = missing.select(
        "h",
        (
            (F.unix_seconds("h") / 3600).cast("long")
            - F.row_number().over(w)
        ).alias("island"),
    )
    return (
        runs.groupBy("island")
        .agg(
            F.date_format(F.min("h"), "yyyy-MM-dd HH:mm:ss").alias("gap_start"),
            F.date_format(F.max("h"), "yyyy-MM-dd HH:mm:ss").alias("gap_end"),
            F.count("*").cast("long").alias("n_hours"),
        )
        .drop("island")
    )


@query(
    "q_bootstrap_ci",
    """
    WITH x AS (
      SELECT (l_orderkey * 10 + l_linenumber) % 2147483647 AS rid,
             CAST(l_quantity AS DECIMAL(18,6)) AS v
      FROM lineitem
    ), reps AS (
      SELECT b.b,
             CAST(SUM(x.v * w.w) AS DOUBLE) / SUM(w.w) AS mean_b
      FROM x
      CROSS JOIN (SELECT unnest(generate_series(1, 50)) AS b) b
      CROSS JOIN LATERAL (
        SELECT (x.rid * 1103515245 + b.b * 2654435761) % 2147483647 AS u
      ) uu
      CROSS JOIN LATERAL (
        SELECT (uu.u * uu.u % 2147483647 + uu.u) % 2147483647 AS hv
      ) hh
      CROSS JOIN LATERAL (
        SELECT CASE
          WHEN hh.hv < 790015412 THEN 0
          WHEN hh.hv < 1580030823 THEN 1
          WHEN hh.hv < 1974922834 THEN 2
          ELSE 3 END AS w
      ) w
      WHERE w.w > 0
      GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
           ROUND(AVG(mean_b), 4) AS boot_mean,
           ROUND(quantile_cont(mean_b, 0.025), 4) AS ci_lo,
           ROUND(quantile_cont(mean_b, 0.975), 4) AS ci_hi
    FROM reps
    """,
)
def q_bootstrap_ci(spark, sf_dir):
    """Deterministic hash-bootstrap 95% CI for mean(l_quantity): 50
    resamples where each row's multiplicity in replicate b is a
    Poisson(1)-approximating step function of md5(row_id:b) —
    ENGINE-PORTABLE randomness, so Spark and the oracle draw the
    IDENTICAL resamples and the CI hash-matches. The hash is pure
    64-bit ARITHMETIC (LCG mix + middle-square, mod 2^31−1): rid is
    reduced mod 2^31−1 BEFORE the LCG multiply, so every intermediate
    product stays < 2^61 at ANY scale factor — without the reduction,
    l_orderkey above ~8.3e8 would overflow signed 64-bit, which Spark
    wraps silently while DuckDB's checked BIGINT errors —
    the earlier md5-based variant was semantically identical but spent
    59.7 s at sf0.1 on 30M short-string digests, vs ~2 s for the
    integer mix in codegen; distribution vs the Poisson(1) step targets
    (0.368/0.368/0.184/0.080) checked to ±0.001. Physical shape: one
    50× executor-side explode (no data movement — the fan-out happens
    in the scan stage), decimal-exact weighted sums, one |reps|-row
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    # r14 optimization (guide §2.3 "narrower types"): quantities ride as
    # exact LONG micro-units instead of decimal(18,6) — Spark's decimal
    # sum was 3.6× the long sum on the 30M-row exploded frame (measured
    # 6.7 s vs 1.9 s with the noop sink). The micro-unit sum converts to
    # double and divides by 1e6 before the weight division: long→double
    # is exact below 2^53 and the /1e6 is one correctly-rounded IEEE op,
    # which equals BigDecimal(18,6).doubleValue() of the same exact
    # rational — mean_b is BIT-IDENTICAL to the decimal path (verified
    # at sf0.001/0.01/0.1), and the DuckDB twin is untouched. Bound:
    # exact while Σ(v·w) per replicate < 2^53 µ-units (≈ sf 30); the
    # fixture sums are ~1.5e12 at sf0.1.
    x = li.select(
        (
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")) % 2147483647
        ).alias("rid"),
        (F.col("l_quantity").cast("decimal(18,6)") * 1000000)
        .cast("long")
        .alias("v"),
    )
    reps = x.select(
        "rid",
        "v",
        F.explode(F.sequence(F.lit(1), F.lit(50))).alias("b"),
    )
    M = 2147483647
    u = (F.col("rid") * 1103515245 + F.col("b") * 2654435761) % M
    hv = (u * u % M + u) % M
    w = (
        F.when(hv < 790015412, 0)
        .when(hv < 1580030823, 1)
        .when(hv < 1974922834, 2)
        .otherwise(3)
    )
    weighted = reps.select("b", "v", w.alias("w")).filter(F.col("w") > 0)
    # r15 (ADVICE r14): the long→double exactness bound (Σ(v·w) per
    # replicate < 2^53 µ-units) now fails LOUDLY instead of silently
    # diverging from the decimal-exact oracle past ~sf 30 — assert_true
    # over the B≈50 replicate sums costs nothing; the guarded value is
    # the identical expression (same casts, same division order).
    guard = F.assert_true(
        F.col("s_micro") < F.lit(1 << 53),
        F.lit(
            "q_bootstrap_ci: per-replicate micro-unit sum reached 2^53;"
            " the long fast path is no longer bit-identical to the"
            " decimal oracle — restore the decimal(18,6) sum for this"
            " scale"
        ),
    )
    means = (
        weighted.groupBy("b")
        .agg(
            F.sum(F.col("v") * F.col("w")).alias("s_micro"),
            F.sum("w").alias("sw"),
        )
        .select(
            "b",
            F.when(
                guard.isNull(),
                F.col("s_micro").cast("double")
                / F.lit(1000000.0)
                / F.col("sw"),
            ).alias("mean_b"),
        )
    )
    return means.agg(
        F.count("*").cast("long").alias("n_reps"),
        F.round(F.avg("mean_b"), 4).alias("boot_mean"),
        F.round(F.percentile("mean_b", F.lit(0.025)), 4).alias("ci_lo"),
        F.round(F.percentile("mean_b", F.lit(0.975)), 4).alias("ci_hi"),
    )


@query(
    "q_holt_trend",
    # sequential oracle as a recursive CTE (one Holt step per iteration,
    # all keys advance together). NOT list_reduce with a struct
    # accumulator: DuckDB 1.0.0 evaluates struct fields against the
    # PARTIALLY-UPDATED accumulator (b := f(acc.l) sees the new l —
    # verified with a marker fold), silently corrupting any recurrence
    # whose fields read each other.
    """
    WITH RECURSIVE vals AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ), it AS (
      SELECT user_id, 1 AS k, vs[1] AS l, CAST(0.0 AS DOUBLE) AS b, n
      FROM vals
      UNION ALL
      SELECT it.user_id, it.k + 1,
             0.5 * v.vs[it.k + 1] + 0.5 * (it.l + it.b),
             0.3 * ((0.5 * v.vs[it.k + 1] + 0.5 * (it.l + it.b)) - it.l)
               + 0.7 * it.b,
             it.n
      FROM it JOIN vals v USING (user_id)
      WHERE it.k < it.n
    )
    SELECT user_id, n AS n_obs,
           ROUND(l, 4) AS level,
           ROUND(b, 4) AS trend,
           ROUND(l + b, 4) AS forecast_1
    FROM it WHERE k = n
    """,
)
def q_holt_trend(spark, sf_dir):
    """Holt double-exponential level+trend per user — the MATRIX
    generalization of the chunked-EWMA scale path
    (operators/timeseries.holt_linear_chunked): the 2-component state
    recurrence is linear, so each observation is an affine map s→As+cx
    and fixed chunks fold to composable (M,v) transforms — the template
    for ANY state-linear recurrence (Kalman-style filters included) at
    unbounded per-key history. chunk_size=16 forces multi-chunk matrix
    composition at every sf; the oracle is DuckDB's genuinely
    SEQUENTIAL struct-state list_reduce, so the green hash proves
    chunked == one-pass."""
    from ..operators.timeseries import holt_linear_chunked

    events = load_table(spark, sf_dir, "events")
    return holt_linear_chunked(
        events, "user_id", "ts", "value", "event_id",
        alpha=0.5, beta=0.3, chunk_size=16,
    )


# ---------------------------------------------------------------------------
# Phase 11: CDC changelog extraction + ranking-quality NDCG
# ---------------------------------------------------------------------------

from ..operators.ranking import bm25_topk, sql_bm25_topk  # noqa: E402

_NDCG_TERMS = ["table", "spark", "customer", "window", "stream"]


@query(
    "q_cdc_extract",
    """
    WITH old AS (
      SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
    ), new AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 50
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 11 <> 0
      UNION ALL
      SELECT c_custkey + 10000000, c_acctbal, 'NEW'
      FROM customer WHERE c_custkey % 13 = 0
    )
    SELECT 'I' AS op, n.c_custkey, n.c_acctbal, n.c_mktsegment
    FROM new n LEFT JOIN old o USING (c_custkey) WHERE o.c_custkey IS NULL
    UNION ALL
    SELECT 'D', o.c_custkey, o.c_acctbal, o.c_mktsegment
    FROM old o LEFT JOIN new n USING (c_custkey) WHERE n.c_custkey IS NULL
    UNION ALL
    SELECT 'U', n.c_custkey, n.c_acctbal, n.c_mktsegment
    FROM new n JOIN old o USING (c_custkey)
    WHERE n.c_acctbal <> o.c_acctbal OR n.c_mktsegment <> o.c_mktsegment
    """,
)
def q_cdc_extract(spark, sf_dir):
    """CDC changelog EXTRACTION — the inverse of q_cdc_apply: given two
    table versions, emit the minimal I/U/D row set that transforms old
    into new (what a change-data-feed produces when the upstream system
    can't). One full-outer join on the key, struct inequality for the
    update test, unchanged rows never leave the join; round-trips
    through operators/scd.cdc_apply back to the new snapshot
    (pinned in tests). Deterministic synthetic drift: +50 balance on %7
    keys, %11 keys deleted, %13 keys re-inserted under new ids."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    k = F.col("c_custkey")
    new = (
        base.filter(k % 11 != 0)
        .select(
            "c_custkey",
            F.when(k % 7 == 0, F.col("c_acctbal") + 50)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            "c_mktsegment",
        )
        .unionByName(
            base.filter(k % 13 == 0).select(
                (k + 10_000_000).alias("c_custkey"),
                "c_acctbal",
                F.lit("NEW").alias("c_mktsegment"),
            )
        )
    )
    from ..operators.scd import cdc_extract

    return cdc_extract(base, new, "c_custkey", ["c_acctbal", "c_mktsegment"])


@query(
    "q_ndcg",
    f"""
    WITH ranked AS (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
      FROM ({sql_bm25_topk(_NDCG_TERMS, k=20)})
    ), rel AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                  x -> list_contains({_NDCG_TERMS!r}, x))) AS BIGINT) AS rel
      FROM documents
    ), dcg AS (
      SELECT SUM(rel.rel / log2(ranked.r + 1)) AS dcg
      FROM ranked JOIN rel USING (doc_id)
    ), ideal AS (
      SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS r
      FROM rel ORDER BY rel DESC, doc_id LIMIT 20
    ), idcg AS (
      SELECT SUM(rel / log2(r + 1)) AS idcg FROM ideal
    )
    SELECT CAST(20 AS BIGINT) AS k,
           ROUND(dcg.dcg, 6) AS dcg,
           ROUND(idcg.idcg, 6) AS idcg,
           ROUND(dcg.dcg / idcg.idcg, 6) AS ndcg
    FROM dcg CROSS JOIN idcg
    """,
)
def q_ndcg(spark, sf_dir):
    """NDCG@20 of the BM25 ranking against a term-frequency relevance
    proxy — the standard search-quality gate (complements the ANN
    family's recall rows with a RANKING-quality metric): DCG discounts
    each ranked doc's relevance by log2(rank+1); the ideal ordering
    (relevance-sorted, id tie-break) normalizes to [0,1]. Relevance =
    total query-term occurrences, integer-exact both engines; the
    ideal top-20 is a TakeOrderedAndProject over the corpus, and all
    final frames are ≤20 rows."""
    docs = load_table(spark, sf_dir, "documents")
    top = bm25_topk(docs, _NDCG_TERMS, k=20)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    ranked = top.withColumn("r", F.row_number().over(w))
    terms_arr = F.array(*[F.lit(t) for t in _NDCG_TERMS])
    rel = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.col("text"), " "),
                lambda x: F.array_contains(terms_arr, x),
            )
        )
        .cast("long")
        .alias("rel"),
    )
    dcg = (
        ranked.join(rel, "doc_id")
        .agg(F.sum(F.col("rel") / F.log2(F.col("r") + 1)).alias("dcg"))
    )
    ideal = (
        rel.orderBy(F.col("rel").desc(), "doc_id")
        .limit(20)
        .withColumn(
            "r", F.row_number().over(Window.orderBy(F.col("rel").desc(), "doc_id"))
        )
    )
    idcg = ideal.agg(F.sum(F.col("rel") / F.log2(F.col("r") + 1)).alias("idcg"))
    return (
        dcg.join(F.broadcast(idcg))
        .select(
            F.lit(20).cast("long").alias("k"),
            F.round("dcg", 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )


# ---------------------------------------------------------------------------
# Phase 12: declared bucketed join + difference-in-differences
# ---------------------------------------------------------------------------


@query(
    "q_bucketed_join",
    f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_exact_sum("o.o_totalprice")} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q_bucketed_join(spark, sf_dir):
    """Exchange-free co-located join via bucketed staging
    (sources/cache.stage_bucketed): both sides land bucketBy(custkey)
    so the join needs NO shuffle — with broadcast disabled the executed
    plan contains zero Exchange operators before the final aggregate's
    (asserted in tests/test_bucketing.py and re-checked here at build
    time). This is the storage-layout answer to repeated big-big joins
    at 100 TB: pay the layout once, join shuffle-free forever. The
    per-segment result is checkpointed before the staging tables drop,
    so the returned frame outlives the cleanup."""
    import tempfile
    import uuid

    from ..sources.cache import stage_bucketed

    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    tag = uuid.uuid4().hex[:8]
    tmp = tempfile.mkdtemp(prefix="q_bucketed_join_")
    to, tc = f"t_bj_orders_{tag}", f"t_bj_cust_{tag}"
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        bo = stage_bucketed(
            spark,
            orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            to,
            ["o_custkey"],
            8,
            f"{tmp}/o",
        )
        bc = stage_bucketed(
            spark,
            customer.select("c_custkey", "c_mktsegment"),
            tc,
            ["c_custkey"],
            8,
            f"{tmp}/c",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        from ..functions.compat import exact_sum as _es

        result = joined.groupBy("c_mktsegment").agg(
            F.count("*").cast("long").alias("n_orders"),
            _es("o_totalprice").alias("revenue"),
        )
        # materialize before the staging tables are dropped
        return result.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {to}")
        spark.sql(f"DROP TABLE IF EXISTS {tc}")
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "q_did",
    """
    WITH span AS (
      SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid_us
      FROM events
    ), cells AS (
      SELECT (user_id % 2 = 1) AS treated,
             (epoch_us(ts) >= s.mid_us) AS post,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS mean_v,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events CROSS JOIN span s
      GROUP BY 1, 2
    )
    SELECT treated, post, n, ROUND(mean_v, 6) AS mean_v,
           ROUND(
             (SELECT (tp.mean_v - tc.mean_v) - (cp.mean_v - cc.mean_v)
              FROM cells tp, cells tc, cells cp, cells cc
              WHERE tp.treated AND tp.post
                AND tc.treated AND NOT tc.post
                AND cp.post AND NOT cp.treated
                AND NOT cc.treated AND NOT cc.post), 6) AS did
    FROM cells
    """,
)
def q_did(spark, sf_dir):
    """Difference-in-differences estimator — the causal-analysis
    workhorse beside q_ab_test's cross-sectional z-test: treatment =
    odd user ids, post = second half of the observed span (midpoint
    from a 1-row broadcast min/max), outcome = mean event value. DiD =
    (treated_post − treated_pre) − (control_post − control_pre) removes
    both the group baseline and the common time trend. One
    map-side-combined pass to 4 cells; the estimate is attached to
    every cell row from the 4-row aggregate."""
    events = load_table(spark, sf_dir, "events")
    # midpoint in integer MICROSECONDS (floor-div) — identical arithmetic
    # in the oracle, so boundary-event membership can't drift by 1 unit
    span = events.agg(
        F.floor(
            (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2
        )
        .cast("long")
        .alias("mid_us")
    )
    cells = (
        events.join(F.broadcast(span))
        .groupBy(
            (F.col("user_id") % 2 == 1).alias("treated"),
            (F.unix_micros("ts") >= F.col("mid_us")).alias("post"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("mean_v_raw"),
            F.count("*").cast("long").alias("n"),
        )
    ).localCheckpoint(eager=False)
    # DiD as ONE signed aggregation over the 4-row cell frame
    # (+ for concordant cells, − for discordant): (m11−m10)−(m01−m00).
    # Four filter-and-cross-join picks would plan 4 nested-loop joins —
    # over the whole-repo ≤2-BNLJ budget for what is a single scalar.
    sign = F.when(F.col("treated") == F.col("post"), 1.0).otherwise(-1.0)
    did = cells.agg(
        F.round(F.sum(sign * F.col("mean_v_raw")), 6).alias("did")
    )
    return cells.join(F.broadcast(did)).select(
        "treated",
        "post",
        "n",
        F.round("mean_v_raw", 6).alias("mean_v"),
        "did",
    )


# ---------------------------------------------------------------------------
# Phase 13: graph-profile statistics (assortativity, power-law tail)
# ---------------------------------------------------------------------------


@query(
    "q_assortativity",
    """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), cd AS (
      SELECT cust, CAST(COUNT(*) AS BIGINT) AS dc FROM e GROUP BY 1
    ), sd AS (
      SELECT supp, CAST(COUNT(*) AS BIGINT) AS ds FROM e GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           ROUND(corr(cd.dc, sd.ds), 6) AS assortativity
    FROM e JOIN cd USING (cust) JOIN sd USING (supp)
    """,
)
def q_assortativity(spark, sf_dir):
    """Degree assortativity of the bipartite purchase graph: the Pearson
    correlation between endpoint degrees across edges — do high-degree
    customers buy from high-degree suppliers (assortative > 0) or from
    the tail (disassortative < 0)? The pre-flight statistic for salting
    and partitioning decisions: strong disassortativity means hub-hub
    joins are rare and skew mitigation can target one side only. Both
    degree tables are node-sized broadcasts back onto the slim edge
    list; one corr aggregate."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    e = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    cd = e.groupBy("cust").agg(F.count("*").cast("long").alias("dc"))
    sd = e.groupBy("supp").agg(F.count("*").cast("long").alias("ds"))
    return (
        e.join(F.broadcast(cd), "cust")
        .join(F.broadcast(sd), "supp")
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.round(F.corr("dc", "ds"), 6).alias("assortativity"),
        )
    )


@query(
    "q_powerlaw_fit",
    """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), degs AS (
      SELECT cust, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1
    ), ccdf AS (
      SELECT deg,
             CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(COUNT(*)) OVER (
               ORDER BY deg DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS n_ge
      FROM degs GROUP BY deg
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(regr_slope(ln(CAST(n_ge AS DOUBLE)),
                            ln(CAST(deg AS DOUBLE))), 6) AS ccdf_slope,
           ROUND(regr_r2(ln(CAST(n_ge AS DOUBLE)),
                         ln(CAST(deg AS DOUBLE))), 6) AS r2
    FROM ccdf WHERE deg >= 2
    """,
)
def q_powerlaw_fit(spark, sf_dir):
    """Power-law tail fit of the customer degree distribution: OLS slope
    of the log-log complementary CDF (P[D ≥ d] ~ d^(−α+1), so
    ccdf_slope ≈ −(α−1)) with its R² — the quantitative verdict behind
    'this graph is power-law, degree-order the triangles'. The CCDF is
    a running sum over the |distinct degrees|-row aggregate (degree-
    grain, never node-grain), the regression is one map-side-combined
    pass with SQL aggregates."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    e = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    degs = e.groupBy("cust").agg(F.count("*").cast("long").alias("deg"))
    dist = degs.groupBy("deg").agg(F.count("*").alias("n_nodes"))
    w = Window.orderBy(F.col("deg").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ccdf = dist.select(
        "deg", F.sum("n_nodes").over(w).cast("long").alias("n_ge")
    ).filter(F.col("deg") >= 2)
    lx = F.log(F.col("deg").cast("double"))
    ly = F.log(F.col("n_ge").cast("double"))
    return ccdf.agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(F.regr_slope(ly, lx), 6).alias("ccdf_slope"),
        F.round(F.regr_r2(ly, lx), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Phase 14: stateful-custom-operator census + IVF tuning sweep
# ---------------------------------------------------------------------------


@query("q_stream_totals")  # runs a real availableNow stream → rows-only
def q_stream_totals(spark, sf_dir):
    """Driver-visible census for the CUSTOM stateful operator
    (streaming/stateful.running_user_totals via applyInPandasWithState)
    — the last streaming capability without a driver row: per-user
    running (count, value-total) state carried across 4 time-ordered
    micro-batches, final per-user totals diffed against the batch
    aggregate. A green row certifies the Arrow state-handoff path
    (get/update/timeout plumbing), not just the built-in operators the
    other censuses cover."""
    from ..streaming.stateful import running_user_totals

    # update-mode emits one row per user per batch; the LAST row per
    # user is the final running total — the census reduces to it
    # before diffing against the batch aggregate
    import shutil
    import tempfile
    import uuid as _uuid

    from ..io import load_table

    events = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="q_stream_totals_")
    name = "q_stream_totals_" + _uuid.uuid4().hex[:8]
    try:
        json_dir = f"{tmp}/events_json"
        events.select(
            "event_id", "ts", "user_id", "event_type", "value"
        ).repartitionByRange(4, "ts").write.json(json_dir)
        landed_schema = (
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double"
        )
        stream_df = (
            spark.readStream.format("json")
            .schema(landed_schema)
            .option("maxFilesPerTrigger", 1)
            .load(json_dir)
        )
        from ..streaming.events import _census_stream_confs

        # shuffle=8 (not lower): applyInPandasWithState pushes all rows
        # through Python workers, so partitions = parallel workers here —
        # 4 measured slower (9.7 s vs 8.0 s), state overhead is not the
        # bottleneck for this census
        with _census_stream_confs(spark, "8"):
            q = (
                running_user_totals(stream_df)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        n_batches = len(q.recentProgress)
        # last update per user = running total after the final batch
        # seen for that user; n_events is monotone so max() selects it
        streamed = (
            spark.table(name)
            .groupBy("user_id")
            .agg(
                F.max(F.struct("n_events", "total_value")).alias("s")
            )
            .select(
                "user_id",
                F.col("s.n_events").alias("n_events"),
                F.round(F.col("s.total_value"), 4).alias("total_value"),
            )
        )
        batch_df = (
            spark.read.schema(landed_schema)
            .json(json_dir)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("total_value"),
            )
        )
        row = (
            streamed.withColumn("__side", F.lit(1))
            .unionByName(batch_df.withColumn("__side", F.lit(0)))
            .groupBy("user_id", "n_events", "total_value")
            .agg(
                F.sum("__side").alias("ns"),
                F.sum(1 - F.col("__side")).alias("nb"),
            )
            .agg(
                F.coalesce(F.sum("nb"), F.lit(0)).alias("n_batch"),
                F.coalesce(F.sum("ns"), F.lit(0)).alias("n_stream"),
                F.coalesce(
                    F.sum(F.abs(F.col("ns") - F.col("nb"))), F.lit(0)
                ).alias("n_mismatch"),
            )
            .collect()[0]
        )
        equal = bool(
            row.n_mismatch == 0 and row.n_batch == row.n_stream
        )
        return spark.createDataFrame(
            [
                (
                    row.n_batch,
                    row.n_stream,
                    row.n_mismatch,
                    int(n_batches),
                    equal,
                )
            ],
            "n_batch long, n_stream long, n_mismatch long,"
            " n_microbatches long, equal boolean",
        )
    finally:
        spark.catalog.dropTempView(name) if name in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(tmp, ignore_errors=True)


@query("q_ivf_sweep")  # seeded IVF recall curve → rows-only
def q_ivf_sweep(spark, sf_dir):
    """IVF tuning curve, driver-visible: recall@5 for nprobe ∈ {1, 2, 4}
    against the exact cosine top-5 — the measure-don't-guess artifact
    behind choosing nprobe (recall must be monotone in nprobe since
    probed posting lists are nested; pinned in pytest). Exact side is
    the bounded brute-force baseline, computed ONCE for the whole sweep
    (r15, guide §2.3: per-point ivf_recall re-ran it twice per nprobe —
    6 brute-force executions for 3 sweep points); each sweep point
    reuses the same cached centroids AND the same scored candidate
    frame (probed posting lists are nested, so nprobe=n is a rank
    prefix — see ivf.ivf_recall_sweep), so the sweep costs one exact
    pass + one posting-list build + one ranking job, not three of
    each."""
    from ..operators.ivf import ivf_centroids_cached, ivf_recall_sweep

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    queries_df = emb.filter(F.col("vec_id") < 10)
    centroids = ivf_centroids_cached(emb, "embedding", (sf_dir, "lt500"), k=16)
    rows = [
        (nprobe, round(r, 4))
        for nprobe, r in ivf_recall_sweep(
            emb, queries_df, "vec_id", "embedding", centroids,
            nprobes=[1, 2, 4], k=5,
        )
    ]
    return spark.createDataFrame(rows, "nprobe long, recall_at_5 double")


# ---------------------------------------------------------------------------
# Phase 15: hybrid-retrieval fusion + multimodal curation pipeline
# ---------------------------------------------------------------------------


@query(
    "q_rrf_fusion",
    f"""
    WITH bm AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
      FROM ({sql_bm25_topk(_NDCG_TERMS, k=20)})
    ), rel AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                  x -> list_contains({_NDCG_TERMS!r}, x))) AS BIGINT) AS hits
      FROM documents
    ), tfrank AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY hits DESC, doc_id) AS r
      FROM rel WHERE hits > 0
      ORDER BY hits DESC, doc_id LIMIT 20
    ), fused AS (
      SELECT COALESCE(bm.doc_id, tf.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / (60 + bm.r), 0)
                   + COALESCE(1.0 / (60 + tf.r), 0), 6) AS rrf
      FROM bm FULL OUTER JOIN tfrank tf ON bm.doc_id = tf.doc_id
    )
    SELECT doc_id, rrf,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
             AS fused_rank
    FROM fused
    ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def q_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion — the standard hybrid-retrieval merge in
    RAG stacks: BM25's top-20 fused with a term-hit-count ranking via
    Σ 1/(60 + rank), which rewards agreement between retrievers without
    needing their scores on a common scale (the k=60 constant is the
    original Cormack et al. setting). Both candidate lists are ≤20
    rows, so the fusion join, the full-outer coalesce, and the final
    rank are all broadcast-sized; each retriever keeps its own
    scale-path (BM25: corpus stats broadcast, no fact shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    bm = bm25_topk(docs, _NDCG_TERMS, k=20).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .alias("r_bm"),
    )
    terms_arr = F.array(*[F.lit(t) for t in _NDCG_TERMS])
    rel = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.col("text"), " "),
                lambda x: F.array_contains(terms_arr, x),
            )
        )
        .cast("long")
        .alias("hits"),
    ).filter(F.col("hits") > 0)
    tf = (
        rel.orderBy(F.col("hits").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("hits").desc(), "doc_id"))
            .alias("r_tf"),
        )
    )
    fused = (
        bm.join(tf, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60 + F.col("r_bm")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("r_tf")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return (
        fused.withColumn(
            "fused_rank",
            F.row_number()
            .over(Window.orderBy(F.col("rrf").desc(), "doc_id"))
            .cast("long"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
    )


@query("q_multimodal_pipeline")  # pandas-UDF pipeline → rows-only
def q_multimodal_pipeline(spark, sf_dir):
    """The multimodal curation pipeline COMPOSED — the binary-modality
    twin of q_corpus_filter_pipeline: land (with PLANTED duplicates so
    every stage provably fires: 10% byte-exact copies under new ids +
    10% re-encoded copies, same content padded with trailing
    whitespace) → exact payload dedup (sha2 over raw bytes — catches
    the byte-exact class only) → canonicalize + feature extraction
    (Arrow mapInPandas over the TRIMMED payload, the stand-in for
    decode-normalization) → feature-digest near-dup (catches the
    re-encoded class exact hashing cannot) → size gate. One census row
    per stage (stage, n_in, n_out, n_dropped); payload bytes never
    reach the driver — only digests and counts leave the executors."""
    from ..sources.multimodal import fake_image_features

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text", "n_chars")
    planted = (
        base.unionByName(
            # byte-exact copies: same payload, new ids
            base.filter(F.col("doc_id") % 10 == 3).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "text",
                "n_chars",
            )
        )
        .unionByName(
            # re-encoded copies: same content, different bytes
            base.filter(F.col("doc_id") % 10 == 7).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit("   ")).alias("text"),
                "n_chars",
            )
        )
    )
    payloads = planted.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.col("n_chars").cast("long").alias("size_hint"),
        ).alias("meta"),
    )
    n0 = payloads.count()
    # stage 1: exact binary dedup (sha2 over RAW payload bytes)
    w = Window.partitionBy(F.sha2("payload", 256)).orderBy("doc_id")
    exact = (
        payloads.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    n1 = exact.count()
    # stage 2: canonicalize (decode-normalization stand-in: trim) →
    # feature extraction → feature-digest near-dup. Re-encoded copies
    # collapse HERE because their canonical features are identical even
    # though their raw bytes differ.
    canonical = exact.withColumn(
        "payload", F.encode(F.rtrim(F.decode("payload", "utf-8")), "utf-8")
    )
    feats = fake_image_features(canonical).withColumn(
        "__fd", F.sha2(F.to_json(F.col("features")), 256)
    )
    w2 = Window.partitionBy("__fd").orderBy("doc_id")
    near = (
        feats.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    n2 = near.count()
    # stage 3: size gate (canonical payload must be ≥ 200 bytes)
    kept = near.filter(F.col("n_bytes") >= 200)
    n3 = kept.count()
    return spark.createDataFrame(
        [
            ("landed", n0, n0, 0),
            ("exact_dedup", n0, n1, n0 - n1),
            ("feature_neardup", n1, n2, n1 - n2),
            ("size_gate", n2, n3, n2 - n3),
        ],
        "stage string, n_in long, n_out long, n_dropped long",
    )


# ---------------------------------------------------------------------------
# Phase 16: Benford audit + STL-lite decomposition
# ---------------------------------------------------------------------------


@query(
    "q_benford",
    """
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM digits
    )
    SELECT d,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / t.n, 6) AS share,
           ROUND(log10(1.0 + 1.0 / d), 6) AS benford_p,
           ROUND(POWER(COUNT(*) - t.n * log10(1.0 + 1.0 / d), 2)
                 / (t.n * log10(1.0 + 1.0 / d)), 6) AS chi2_term
    FROM digits CROSS JOIN tot t
    GROUP BY d, t.n
    """,
)
def q_benford(spark, sf_dir):
    """Benford's-law audit of order totals — the classic fabricated-data
    screen: the observed first-significant-digit distribution against
    log10(1 + 1/d), with per-digit chi-square contributions. The digit
    is extracted from the INTEGER cents string (scaling by 100 never
    changes the leading significant digit), not floor(log10(x)) — the
    float log of an exact power of ten can land at 2.999…96 and
    misbucket the row cross-engine. One map-side-combined digit count +
    a 1-row total broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("d")
    )
    tot = digits.agg(F.count("*").cast("long").alias("n"))
    p = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        digits.join(F.broadcast(tot))
        .groupBy("d", "n")
        .agg(F.count("*").cast("long").alias("n_obs"))
        .select(
            "d",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias(
                "share"
            ),
            F.round(p, 6).alias("benford_p"),
            F.round(
                F.pow(F.col("n_obs") - F.col("n") * p, 2) / (F.col("n") * p),
                6,
            ).alias("chi2_term"),
        )
    )


@query(
    "q_stl_decompose",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), trended AS (
      SELECT event_type, h, v,
             AVG(v) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING
             ) AS trend
      FROM hourly
    ), seasonal AS (
      SELECT event_type, EXTRACT(hour FROM h) AS hod,
             AVG(v - trend) AS s
      FROM trended GROUP BY 1, 2
    ), resid AS (
      SELECT t.event_type, t.v, t.trend, se.s,
             t.v - t.trend - se.s AS r
      FROM trended t
      JOIN seasonal se
        ON t.event_type = se.event_type
       AND EXTRACT(hour FROM t.h) = se.hod
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(stddev_samp(r), 3) AS sigma_resid,
           ROUND(1.0 - var_samp(r) / var_samp(v), 3) AS var_explained
    FROM resid GROUP BY 1
    """,
)
def q_stl_decompose(spark, sf_dir):
    """STL-lite decomposition of the hourly value series per event type:
    trend = centered 24-hour moving average, seasonal = mean hour-of-day
    deviation from trend, residual = the rest — summarized as residual
    σ and variance explained (how much of the raw variance the
    trend+seasonal structure absorbs; the go/no-go check before
    residual-based alerting replaces plain z-scores). Every window and
    join runs on the ALREADY-AGGREGATED hourly frame (≤ |types|×|hours|
    rows, decimal-exact cells); the seasonal profile is a ≤|types|×24
    broadcast."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-11, 12)
    )
    trended = hourly.select(
        "event_type", "h", "v", F.avg("v").over(w).alias("trend")
    )
    seasonal = trended.groupBy(
        F.col("event_type").alias("se_type"), F.hour("h").alias("se_hod")
    ).agg(F.avg(F.col("v") - F.col("trend")).alias("s"))
    resid = trended.withColumn("hod", F.hour("h")).join(
        F.broadcast(seasonal),
        (F.col("event_type") == F.col("se_type"))
        & (F.col("hod") == F.col("se_hod")),
    ).select(
        "event_type",
        "v",
        (F.col("v") - F.col("trend") - F.col("s")).alias("r"),
    )
    return resid.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.round(F.stddev_samp("r"), 3).alias("sigma_resid"),
        F.round(1.0 - F.var_samp("r") / F.var_samp("v"), 3).alias(
            "var_explained"
        ),
    )


# ---------------------------------------------------------------------------
# Phase 17: CEP-style event-pattern matching
# ---------------------------------------------------------------------------

# initials: signup/click/view/purchase/error → s c v p e
_CEP_PATTERN = "s[^p]*c[^p]*p"  # funnel completion with no purchase between


@query(
    "q_event_pattern",
    f"""
    WITH seqs AS (
      SELECT user_id,
             list_reduce(
               [substring(e, 1, 1)
                FOR e IN list(event_type ORDER BY ts, event_id)],
               (a, b) -> a || b
             ) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, '{_CEP_PATTERN}'))
                AS BIGINT) AS n_matches
    FROM seqs
    """,
)
def q_event_pattern(spark, sf_dir):
    """CEP-style sequence-pattern matching (the MATCH_RECOGNIZE / Flink
    CEP shape): each user's event history collapses to an ordered
    initials string and a regex counts non-overlapping occurrences of
    signup →(no purchase)→ click →(no purchase)→ purchase — ordering
    constraints with NEGATIVE gap conditions, which the stage-count
    funnel (q_funnel) structurally cannot express. One user-key
    shuffle; the pattern runs over a ≤n_events-char string per key, and
    the leftmost-non-overlapping match rule is identical in Java regex
    and RE2, making the count oracle-checkable. At true scale the
    per-key sequence is bounded by session windows first (q_sessionize)
    rather than whole-history strings — documented, same plan shape."""
    events = load_table(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
                )
            ),
            lambda s: s["c"],
        ),
        "",
    )
    return (
        events.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(
            "user_id",
            F.length("seq").cast("long").alias("n_events"),
            F.size(F.regexp_extract_all("seq", F.lit(_CEP_PATTERN), 0))
            .cast("long")
            .alias("n_matches"),
        )
    )


# ---------------------------------------------------------------------------
# Phase 18: join fan-out pre-audit + physical partition skew census
# ---------------------------------------------------------------------------


@query(
    "q_join_fanout",
    """
    WITH ak AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS ca
      FROM orders GROUP BY 1
    ), bk AS (
      SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cb
      FROM customer GROUP BY 1
    ), fan AS (
      SELECT ak.k, ak.ca, bk.cb, ak.ca * bk.cb AS out_rows
      FROM ak JOIN bk USING (k)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_join_keys,
           CAST(SUM(out_rows) AS BIGINT) AS predicted_rows,
           CAST(MAX(out_rows) AS BIGINT) AS max_key_rows,
           ROUND(CAST(MAX(out_rows) AS DOUBLE)
                 / (SUM(out_rows) / COUNT(*)), 2) AS skew_factor
    FROM fan
    """,
)
def q_join_fanout(spark, sf_dir):
    """Join fan-out PRE-audit — the planner-advisory census run BEFORE a
    big join: per-key counts on both sides multiply into the exact
    output cardinality per key (Σ cntA·cntB is the join size without
    running the join), plus the hottest key's share as a skew factor —
    the number that decides between plain, broadcast, and salted plans
    (q_salted_join is the remedy this census prescribes). Two
    map-side-combined key counts + a count-grain join; the fact tables
    are scanned once each and never joined."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    ak = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("long").alias("ca")
    )
    bk = customer.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count("*").cast("long").alias("cb")
    )
    fan = ak.join(bk, "k").select(
        "k", (F.col("ca") * F.col("cb")).alias("out_rows")
    )
    return fan.agg(
        F.count("*").cast("long").alias("n_join_keys"),
        F.sum("out_rows").cast("long").alias("predicted_rows"),
        F.max("out_rows").cast("long").alias("max_key_rows"),
        F.round(
            F.max("out_rows").cast("double")
            / (F.sum("out_rows") / F.count("*")),
            2,
        ).alias("skew_factor"),
    )


@query("q_partition_skew")  # physical introspection → rows-only
def q_partition_skew(spark, sf_dir):
    """Physical partition-skew census: per-task row counts of the events
    scan AFTER a user-key repartition, summarized as min/avg/max and a
    skew ratio — the empirical check that a chosen partitioning
    actually balances (hash collisions and hot keys both surface here;
    the straggler predictor for any downstream stage reusing the
    layout). Uses spark_partition_id(), so the census is inherently
    engine-physical (rows-only by design); only |partitions| count
    rows aggregate up."""
    events = load_table(spark, sf_dir, "events")
    per_part = (
        events.repartition(32, "user_id")
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("n"))
    )
    return per_part.agg(
        F.count("*").cast("long").alias("n_partitions"),
        F.min("n").cast("long").alias("min_rows"),
        F.round(F.avg("n"), 2).alias("avg_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.round(F.max("n") / F.avg("n"), 3).alias("skew_ratio"),
    )


# ---------------------------------------------------------------------------
# Phase 19: fiscal-calendar rollup + cumulative-distinct growth curve
# ---------------------------------------------------------------------------


@query(
    "q_fiscal_rollup",
    f"""
    WITH cal AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN EXTRACT(month FROM o_orderdate) >= 2
                  THEN EXTRACT(year FROM o_orderdate)
                  ELSE EXTRACT(year FROM o_orderdate) - 1 END AS fy,
             ((EXTRACT(month FROM o_orderdate) + 10) % 12) // 3 + 1 AS fq
      FROM orders
    )
    SELECT CAST(fy AS BIGINT) AS fy, CAST(fq AS BIGINT) AS fq,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_exact_sum("o_totalprice")} AS revenue
    FROM cal GROUP BY 1, 2
    """,
)
def q_fiscal_rollup(spark, sf_dir):
    """Fiscal-calendar revenue rollup (fiscal year starts February —
    the offset-calendar aggregation every finance warehouse needs and
    naive EXTRACT(quarter) gets wrong): fiscal year/quarter derived by
    pure month arithmetic INSIDE the scan stage (no calendar-dimension
    join — the derivation is a closed form, so the dim table a
    traditional warehouse materializes becomes two codegen
    expressions), one map-side-combined aggregate, exact-decimal
    revenue."""
    orders = load_table(spark, sf_dir, "orders")
    m = F.month("o_orderdate")
    fy = F.when(m >= 2, F.year("o_orderdate")).otherwise(
        F.year("o_orderdate") - 1
    )
    fq = F.floor(((m + 10) % 12) / 3) + 1
    return orders.groupBy(
        fy.cast("long").alias("fy"), fq.cast("long").alias("fq")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        exact_sum("o_totalprice").alias("revenue"),
    )


@query(
    "q_cumulative_users",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ), per_day AS (
      SELECT d0 AS day, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY 1
    )
    SELECT day, n_new,
           CAST(SUM(n_new) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM per_day
    """,
)
def q_cumulative_users(spark, sf_dir):
    """Cumulative converted-user growth curve (first PURCHASE per user)
    — the all-time-reach metric a naive per-day COUNT(DISTINCT) CANNOT
    produce without rescanning ever-growing history each day: each user
    contributes exactly once at their first conversion day, so the
    curve is a running sum over the |days|-row new-converter aggregate.
    One user-key shuffle (first-seen min) + one tiny day-grain window;
    the event stream is scanned once, ever. (Conversion, not first
    activity: the fixture's users are all active from day one, which
    would collapse the curve to a single point.)"""
    events = load_table(spark, sf_dir, "events")
    first_seen = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("d0"))
    )
    per_day = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").cast("long").alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cumulative_users"),
    )
