"""Round-6 phase-37 queries: distribution distance & reliability.

The drift family completed: exact 1-Wasserstein distance (the drift
metric WITH magnitude — q_ks_test sees only the max CDF gap, q_psi
needs bins), exact Spearman rank correlation (the monotone-association
twin of the Pearson q_corr_matrix), per-type burstiness of user event
streams (the Fano-style dispersion score behind rate-limit and
bot-detection gates), and expected calibration error (the scalar the
q_calibration_bins reliability table rolls up to).

Reference parity note: the reference (patrick95350/legislative-bills-
database) has no statistics surface — this module extends SURVEY.md
§2.10's drift/evaluation families.

Engine-parity notes: W1 and Spearman are integer-exact to the final
IEEE division (values quantized to cents, ranks unique via tiebreak);
burstiness/ECE ride exact integer sums composed through a handful of
deterministic double ops (the q_benford / q_zscore precedent).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Exact 1-Wasserstein distance (pre-1998 vs after order totals)
# ---------------------------------------------------------------------------


@query(
    "q_wasserstein",
    """
    WITH s AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END AS ia
      FROM orders WHERE o_totalprice IS NOT NULL
    ), pv AS (
      SELECT v, SUM(ia) AS a_n, SUM(1 - ia) AS b_n FROM s GROUP BY v
    ), t AS (
      SELECT CAST(SUM(a_n) AS BIGINT) AS na,
             CAST(SUM(b_n) AS BIGINT) AS nb
      FROM pv
    ), r AS (
      SELECT v,
             SUM(a_n) OVER w AS ca,
             SUM(b_n) OVER w AS cb,
             LEAD(v) OVER (ORDER BY v) AS nv
      FROM pv
      WINDOW w AS (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           ROUND(CAST(SUM(COALESCE(nv - v, 0)
                          * ABS(ca * t.nb - cb * t.na)) AS DOUBLE)
                 / (CAST(GREATEST(t.na, 1) AS DOUBLE) * GREATEST(t.nb, 1)),
                 6) AS w1
    FROM r, t GROUP BY t.na, t.nb
    """,
)
def q_wasserstein(spark, sf_dir):
    """Exact 1-Wasserstein (earth-mover) distance between pre-1998 and
    later order totals, in cents — the area between the two empirical
    CDFs (operators/stats.wasserstein_1). Same split as q_ks_test so
    the two drift metrics are directly comparable; where KS says 'the
    CDFs differ by at most D', W1 says BY HOW MUCH money. The oracle's
    running sums are one-task windows; the Spark side is the
    prefix-offset pattern plus an O(#partitions) boundary stitch for
    the value gaps — no global window, every term exact integer."""
    from ..operators.stats import wasserstein_1

    orders = load_table(spark, sf_dir, "orders")
    tagged = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("vc"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("is_a"),
    ).filter(F.col("o_totalprice").isNotNull())
    return wasserstein_1(tagged, "vc", "is_a")


# ---------------------------------------------------------------------------
# Exact Spearman rank correlation (order total vs order quantity)
# ---------------------------------------------------------------------------


@query(
    "q_spearman",
    """
    WITH oq AS (
      SELECT o.o_orderkey, o.o_totalprice,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), rx AS (
      SELECT o_orderkey,
             CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
               AS BIGINT) AS r
      FROM oq
    ), ry AS (
      SELECT o_orderkey,
             CAST(ROW_NUMBER() OVER (ORDER BY qty, o_orderkey)
               AS BIGINT) AS r
      FROM oq
    ), d AS (
      SELECT rx.r - ry.r AS d FROM rx JOIN ry USING (o_orderkey)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(d * d) AS BIGINT) AS sum_d2,
           ROUND(1.0 - (6.0 * SUM(d * d))
                 / (CAST(COUNT(*) AS DOUBLE)
                    * (COUNT(*) * COUNT(*) - 1)), 6) AS spearman_rho
    FROM d
    """,
)
def q_spearman(spark, sf_dir):
    """Exact Spearman rank correlation between order total and total
    ordered quantity — the monotone-association twin of the Pearson
    q_corr_matrix (robust to the price distribution's heavy tail).
    Ranks are made unique by the o_orderkey tiebreak (documented: tied
    values get distinct consecutive ranks, the deterministic variant —
    so ρ = 1 − 6Σd²/(n(n²−1)) is ALL-INTEGER to one division). Both
    global ranks ride ordering.global_sort_index (range sort +
    O(#partitions) offsets) — the oracle's two ROW_NUMBER windows are
    one-task; the Spark plan never is."""
    from ..operators.ordering import global_sort_index

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    oq = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    rx = global_sort_index(
        oq.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice"), F.col("o_orderkey")],
        index_col="ix",
    ).select("o_orderkey", (F.col("ix") + 1).alias("rx"))
    ry = global_sort_index(
        oq.select("o_orderkey", "qty"),
        [F.col("qty"), F.col("o_orderkey")],
        index_col="iy",
    ).select("o_orderkey", (F.col("iy") + 1).alias("ry"))
    d = rx.join(ry, "o_orderkey").select(
        (F.col("rx") - F.col("ry")).alias("d")
    )
    n = F.count("*")
    sum_d2 = F.sum(F.col("d") * F.col("d"))
    return d.agg(
        n.cast("long").alias("n_orders"),
        sum_d2.cast("long").alias("sum_d2"),
        F.round(
            F.lit(1.0)
            - (6.0 * sum_d2) / (n.cast("double") * (n * n - 1)),
            6,
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Burstiness of per-user event streams (Fano-style dispersion)
# ---------------------------------------------------------------------------


@query(
    "q_burstiness",
    """
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) // 1000000
               - LAG(epoch_us(ts) // 1000000) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id) AS gap
      FROM events
    ), m AS (
      SELECT event_type,
             CAST(COUNT(gap) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS sx,
             CAST(SUM(gap * gap) AS BIGINT) AS sxx
      FROM g WHERE gap IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n AS n_gaps,
           ROUND(CAST(sx AS DOUBLE) / n, 3) AS mean_gap_s,
           ROUND((sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                       / (CAST(n AS DOUBLE) * n))
                  - CAST(sx AS DOUBLE) / n)
                 / (sqrt((CAST(n AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx)
                         / (CAST(n AS DOUBLE) * n))
                    + CAST(sx AS DOUBLE) / n), 6) AS burstiness
    FROM m
    """,
)
def q_burstiness(spark, sf_dir):
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of per-user interarrival
    gaps, per event type — B→−1 is a metronome, 0 a Poisson process,
    →+1 maximally bursty; the dispersion score behind rate-limit
    tuning and bot detection. Gaps ride (type, user) partitioned
    windows (high-cardinality — never a per-type single task, the
    percent_rank_by_key lesson); moments are exact integer-second
    sums, σ and B a fixed dag of IEEE double ops replayed identically
    by the oracle."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    g = events.select(
        "event_type",
        (
            F.expr("unix_micros(ts) div 1000000")
            - F.lag(F.expr("unix_micros(ts) div 1000000")).over(w)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    m = g.groupBy("event_type").agg(
        F.count("gap").cast("long").alias("n"),
        F.sum("gap").cast("long").alias("sx"),
        F.sum(F.col("gap") * F.col("gap")).cast("long").alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    mu = sx_d / F.col("n")
    sigma = F.sqrt(
        (n_d * F.col("sxx") - sx_d * F.col("sx")) / (n_d * F.col("n"))
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.round(mu, 3).alias("mean_gap_s"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# Expected calibration error (the q_calibration_bins scalar)
# ---------------------------------------------------------------------------


@query(
    "q_ece",
    """
    WITH s AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS sc,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ), mm AS (
      SELECT MIN(sc) AS mn, MAX(sc) AS mx FROM s
    ), b AS (
      SELECT CAST(((sc - mm.mn) * 10) // (mm.mx - mm.mn + 1) AS INTEGER)
               AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS e,
             CAST(SUM(sc - mm.mn) AS BIGINT) AS ssc,
             CAST(MAX(mm.mx - mm.mn) AS BIGINT) AS span
      FROM s, mm GROUP BY 1
    ), t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM b)
    SELECT t.nt AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM((CAST(n AS DOUBLE) / t.nt)
                     * ABS(CAST(e AS DOUBLE) / n
                           - CAST(ssc AS DOUBLE) / (CAST(n AS DOUBLE)
                                                    * span))), 6) AS ece
    FROM b, t GROUP BY t.nt
    """,
)
def q_ece(spark, sf_dir):
    """Expected calibration error over the q_calibration_bins binning:
    Σ_b (n_b/N)·|accuracy_b − confidence_b|, confidence taken as the
    bin's mean min-max-normalized score — the single reliability
    number a probability-emitting quality classifier is gated on.
    Integer cent sums per bin; each bin contributes a fixed dag of
    IEEE ops (the q_benford precedent), summed over ten bins."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    mm = s.agg(F.min("sc").alias("mn"), F.max("sc").alias("mx"))
    b = (
        s.join(F.broadcast(mm))  # 1-row broadcast: allowed BNLJ shape
        .select(
            F.expr("CAST(((sc - mn) * 10) div (mx - mn + 1) AS INT)")
            .alias("bin"),
            (F.col("sc") - F.col("mn")).alias("sc0"),
            (F.col("mx") - F.col("mn")).alias("span"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("e"),
            F.sum("sc0").cast("long").alias("ssc"),
            F.max("span").cast("long").alias("span"),
        )
    )
    n_d = F.col("n").cast("double")
    conf = F.col("ssc").cast("double") / (n_d * F.col("span"))
    acc = F.col("e").cast("double") / F.col("n")
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )  # ten bin rows — bounded global window (the q_lorenz_curve shape)
    return (
        b.withColumn("nt", F.sum("n").over(w_all))
        .agg(
            F.max("nt").cast("long").alias("n_orders"),
            F.count("*").cast("long").alias("n_bins"),
            F.round(
                F.sum((n_d / F.col("nt")) * F.abs(acc - conf)), 6
            ).alias("ece"),
        )
    )
