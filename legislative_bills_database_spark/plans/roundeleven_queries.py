"""Round-11 queries.

Opens with the one canonical LLM-training-data dedup mode the inventory
still lacked (VERDICT r10 "What's missing" #1): exact-substring
(suffix-array-style) duplicate-span detection — Lee et al. 2022's
ExactSubstr — built from machinery already on the shelf (the
packing.sliding_chunks zero-UDF shingle posexplode + the q_streaks
gaps-and-islands run collapse), plus its removal-side companion at
paragraph grain (VERDICT r10 item #6). Later phases add the AQE
skew-join certificate and the fan-out refusal interlock for the exact
quadratic certificate trio.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..operators import corpus as Co
from .registry import query

# ---------------------------------------------------------------------------
# phase 63 — exact-substring dedup (ExactSubstr) + paragraph-grain removal
# ---------------------------------------------------------------------------

_SUBSTR_K = 8


@query("q_substr_dup_spans", Co.sql_substr_dup_spans(k=_SUBSTR_K))
def q_substr_dup_spans(spark, sf_dir):
    """Maximal verbatim repeated token spans across the whole corpus
    (operators/corpus.substr_dup_spans — the ExactSubstr of Lee et al.
    2022): sliding 8-token shingle digests, one digest aggregate for
    occurrence ≥ 2 + owner counts, per-document gaps-and-islands
    collapse into maximal spans. Span grain is what doc-level sha2 and
    MinHash dedup can't see: the 50-token license block shared by 3
    docs reports as one span per owner with min_owners=3; a chorus
    repeated inside one doc reports with min_owners=1. Fully
    deterministic → value-hash-checked against the DuckDB twin."""
    docs = load_table(spark, sf_dir, "documents")
    return Co.substr_dup_spans(docs, k=_SUBSTR_K)


@query("q_dedup_paragraphs", Co.sql_dedup_paragraphs(chunk_tokens=8))
def q_dedup_paragraphs(spark, sf_dir):
    """Within-document paragraph-grain exact dedup with order-restoring
    reassembly (operators/corpus.dedup_paragraphs) — the REMOVAL
    complement to the q_repetition signal, at the q_boilerplate_strip
    segmentation. Zero shuffle: the duplicate test is within-row, so
    the whole operator is one scan-side array expression (keep chunk i
    iff its first occurrence is itself); verified down to the sha256 of
    the reassembled text."""
    docs = load_table(spark, sf_dir, "documents")
    return Co.dedup_paragraphs(docs, chunk_tokens=8)


# ---------------------------------------------------------------------------
# phase 64 — AQE skew-join certificate (VERDICT r10 #4)
# ---------------------------------------------------------------------------

_AQE_SKEW_CONFS = {
    # force a shuffled SMJ (no broadcast), and thresholds low enough
    # that the census fixture's hot partition is skew-detected at every
    # test SF (production keeps the 256 MB defaults; the CONDITIONS are
    # what this census certifies, not the numbers)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "131072",
}


@query("q_aqe_skew_census")  # engine-physical → rows-only by design
def q_aqe_skew_census(spark, sf_dir):
    """AQE skew-join certificate — the adaptive sibling of
    q_join_strategy_census and the automatic counterpart of
    q_salted_join's manual remedy: run the SAME Zipf-hot join (80% of
    lineitem rows on one key, uncompressible 64-byte payloads) with
    ``spark.sql.adaptive.skewJoin.enabled`` on and off, and report
    whether Spark's own skew split actually fired (``skew=true`` on the
    SortMergeJoin, ``skewed`` AQEShuffleRead) plus result parity
    between the two runs. The operator's guide this row encodes: AQE
    handles shuffle-level skew on its own, so reach for q_salted_join
    only where AQE can't — broadcast-ineligible non-shuffle operators,
    or single-key windows.

    Two prerequisites this census had to discover (both documented
    because a real cluster operator WILL hit them): (1) AQE can only
    split a skewed reduce partition at MAP-OUTPUT boundaries, so a
    single-file scan (1 mapper — the known bench-SF shape) is
    unsplittable: the fact side round-robins to 16 partitions first,
    exactly like a real multi-executor scan. (2) the probe aggregate
    must be value-dependent (sum(length(payload))) — a count-only probe
    lets Catalyst prune the payload, the hot partition collapses to
    RLE-compressed key bytes, and nothing is skewed by SIZE anymore
    (the session.materialize_fully lesson, found here first)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = (
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10))
            < 8,
            F.lit(0),
        )
        .otherwise(F.pmod(F.xxhash64("l_orderkey"), F.lit(200)) + 1)
    )
    payload = F.concat(
        F.md5(F.col("l_orderkey").cast("string")),
        F.md5(F.col("l_linenumber").cast("string")),
    )
    fact = li.select(key.alias("k"), payload.alias("payload")).repartition(
        16
    )
    dim = spark.range(0, 201).select(
        F.col("id").alias("k"),
        F.concat(F.lit("label_"), F.col("id")).alias("lbl"),
    )

    def run() -> tuple[int, int, int, int]:
        agg = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("pbytes"),
        )
        row = agg.collect()[0]
        plan = agg._jdf.queryExecution().executedPlan().toString()
        return (
            int(row["n"]),
            int(row["pbytes"]),
            plan.count("skew=true"),
            plan.count("skewed"),
        )

    toggle = "spark.sql.adaptive.skewJoin.enabled"
    prev = {
        k: spark.conf.get(k, None)
        for k in [*_AQE_SKEW_CONFS, toggle]
    }
    try:
        for k, v in _AQE_SKEW_CONFS.items():
            spark.conf.set(k, v)
        spark.conf.set(toggle, "true")
        n_on, pb_on, smj_on, reads_on = run()
        spark.conf.set(toggle, "false")
        n_off, pb_off, smj_off, reads_off = run()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        [
            (
                n_on,
                pb_on,
                smj_on,
                reads_on,
                smj_off,
                reads_off,
                int(n_on == n_off and pb_on == pb_off),
            )
        ],
        "rows_out long, payload_bytes long, smj_skew_on long,"
        " skewed_reads_on long, smj_skew_off long, skewed_reads_off"
        " long, runs_agree long",
    )


# ---------------------------------------------------------------------------
# phase 65 — allocation / fairness / privacy: FIFO lot matching,
# disparate-impact audit, t-closeness census
# ---------------------------------------------------------------------------

from pyspark.sql import Window  # noqa: E402

from ..io import load_tables  # noqa: E402


@query(
    "q_fifo_allocation",
    """
    WITH ship AS (
      SELECT l_partkey AS part, l_orderkey AS s_ord, l_linenumber AS s_line,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_end
      FROM lineitem WHERE l_returnflag <> 'R'
    ), ret AS (
      SELECT l_partkey AS part, l_orderkey AS r_ord, l_linenumber AS r_line,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_end
      FROM lineitem WHERE l_returnflag = 'R'
    ), s2 AS (SELECT part, s_ord, s_line, cum_end - qty AS s_start,
                     cum_end AS s_end FROM ship),
       r2 AS (SELECT part, r_ord, r_line, cum_end - qty AS r_start,
                     cum_end AS r_end FROM ret)
    SELECT s.part, s.s_ord, s.s_line, r.r_ord, r.r_line,
           CAST(LEAST(s.s_end, r.r_end)
                - GREATEST(s.s_start, r.r_start) AS BIGINT) AS qty_matched
    FROM s2 s JOIN r2 r
      ON s.part = r.part AND s.s_start < r.r_end AND r.r_start < s.s_end
    """,
)
def q_fifo_allocation(spark, sf_dir):
    """FIFO lot matching — the classic hard-in-SQL allocation: per part,
    returned quantities draw down shipment lots strictly first-in-first-
    out (by shipdate), and the output says exactly which return consumed
    how much of which lot. The textbook trick makes it one join instead
    of a sequential loop: cumulative-quantity intervals on both sides
    ([cum−qty, cum) per lot / per claim) intersect precisely where FIFO
    assigns units, so matched qty = overlap length of integer intervals.

    Scale shape: two per-part windows (co-partitioned on part, fully
    parallel across parts) + one part-keyed join whose per-key fan-out
    is linear in lots-per-part (interval overlap, never cross). All
    BIGINT; window sums CAST from DuckDB's HUGEINT."""
    li = load_table(spark, sf_dir, "lineitem")

    def side(pred, tag):
        w = Window.partitionBy("part").orderBy(
            "l_shipdate", f"{tag}_ord", f"{tag}_line"
        )
        cum = (
            F.sum("qty").over(w).cast("long").alias("cum_end")
        )
        base = li.filter(pred).select(
            F.col("l_partkey").alias("part"),
            F.col("l_orderkey").alias(f"{tag}_ord"),
            F.col("l_linenumber").alias(f"{tag}_line"),
            F.col("l_quantity").cast("long").alias("qty"),
            "l_shipdate",
        )
        return base.select("part", f"{tag}_ord", f"{tag}_line", "qty", cum)

    s = side(F.col("l_returnflag") != "R", "s").select(
        "part", "s_ord", "s_line",
        (F.col("cum_end") - F.col("qty")).alias("s_start"),
        F.col("cum_end").alias("s_end"),
    )
    r = side(F.col("l_returnflag") == "R", "r").select(
        "part", "r_ord", "r_line",
        (F.col("cum_end") - F.col("qty")).alias("r_start"),
        F.col("cum_end").alias("r_end"),
    )
    return s.join(
        r,
        (s["part"] == r["part"])
        & (F.col("s_start") < F.col("r_end"))
        & (F.col("r_start") < F.col("s_end")),
    ).select(
        s["part"],
        "s_ord",
        "s_line",
        "r_ord",
        "r_line",
        (
            F.least("s_end", "r_end") - F.greatest("s_start", "r_start")
        ).cast("long").alias("qty_matched"),
    )


_DI_MIN_ORDERS = 10


@query(
    "q_disparate_impact",
    f"""
    WITH oc AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ), seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(CASE WHEN COALESCE(oc.n, 0) >= {_DI_MIN_ORDERS}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
      FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
      GROUP BY 1
    ), best AS (
      SELECT MAX(CAST(n_positive AS DOUBLE) / n_customers) AS b FROM seg
    )
    SELECT segment, n_customers, n_positive,
           ROUND(CAST(n_positive AS DOUBLE) / n_customers, 6)
             AS selection_rate,
           ROUND(CAST(n_positive AS DOUBLE) / n_customers / b, 6)
             AS impact_ratio,
           CAST(CASE WHEN CAST(n_positive AS DOUBLE) / n_customers
                          < 0.8 * b THEN 1 ELSE 0 END AS BIGINT)
             AS four_fifths_flag
    FROM seg, best
    """,
)
def q_disparate_impact(spark, sf_dir):
    """Disparate-impact audit (the EEOC four-fifths rule) over a
    'frequent buyer' outcome by market segment — the dataset-bias
    census an LLM-data pipeline owes any attribute it trains selection
    rules on: per-group selection rate, ratio to the best-off group,
    and the <0.8 flag. Counts are exact integers; the two divisions
    are IEEE-identical cross-engine and the flag compares UNROUNDED
    doubles so the boundary is the same in both engines. One grouped
    pass + a 1-row broadcast of the best rate."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    oc = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    seg = (
        customer.join(oc, oc["o_custkey"] == customer["c_custkey"], "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(
                F.when(
                    F.coalesce(F.col("n"), F.lit(0)) >= _DI_MIN_ORDERS, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_positive"),
        )
    )
    best = seg.agg(
        F.max(
            F.col("n_positive").cast("double") / F.col("n_customers")
        ).alias("b")
    )
    rate = F.col("n_positive").cast("double") / F.col("n_customers")
    return seg.crossJoin(F.broadcast(best)).select(
        "segment",
        "n_customers",
        "n_positive",
        F.round(rate, 6).alias("selection_rate"),
        F.round(rate / F.col("b"), 6).alias("impact_ratio"),
        (rate < 0.8 * F.col("b")).cast("long").alias("four_fifths_flag"),
    )


_TC_BUCKETS = 10


@query(
    "q_t_closeness",
    f"""
    WITH b AS (
      SELECT c_nationkey AS nation,
             NTILE({_TC_BUCKETS}) OVER (ORDER BY c_acctbal, c_custkey) - 1
               AS bucket
      FROM customer
    ), grid AS (
      SELECT n.nation, g.bucket
      FROM (SELECT DISTINCT nation FROM b) n
      CROSS JOIN (SELECT * FROM generate_series(0, {_TC_BUCKETS - 1})
                  AS t(bucket)) g
    ), cnt AS (
      SELECT g.nation, g.bucket,
             CAST(COALESCE(x.c, 0) AS BIGINT) AS c
      FROM grid g LEFT JOIN (
        SELECT nation, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2
      ) x ON x.nation = g.nation AND x.bucket = g.bucket
    ), cum AS (
      SELECT nation, bucket,
             CAST(SUM(c) OVER (PARTITION BY nation ORDER BY bucket)
                  AS BIGINT) AS cg,
             CAST(SUM(SUM(c)) OVER (ORDER BY bucket)
                  AS BIGINT) AS cglob
      FROM cnt GROUP BY nation, bucket, c
    ), tot AS (
      SELECT nation, CAST(COUNT(*) AS BIGINT) AS ng FROM b GROUP BY 1
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM b)
    SELECT c.nation, t.ng AS n_rows,
           ROUND(CAST(SUM(ABS(c.cg * n.nn - c.cglob * t.ng)) AS DOUBLE)
                 / (CAST(t.ng AS DOUBLE) * n.nn * {_TC_BUCKETS - 1}), 6)
             AS emd,
           CAST(CASE WHEN
             CAST(SUM(ABS(c.cg * n.nn - c.cglob * t.ng)) AS DOUBLE)
             / (CAST(t.ng AS DOUBLE) * n.nn * {_TC_BUCKETS - 1}) > 0.2
             THEN 1 ELSE 0 END AS BIGINT) AS t_flag
    FROM cum c JOIN tot t ON c.nation = t.nation, n
    WHERE c.bucket < {_TC_BUCKETS - 1}
    GROUP BY c.nation, t.ng, n.nn
    """,
)
def q_t_closeness(spark, sf_dir):
    """t-closeness census — the missing third of the k-anonymity /
    l-diversity privacy trio: per quasi-identifier group (nation), the
    earth-mover's distance between ITS ordered sensitive-attribute
    distribution (account-balance deciles) and the global one. For an
    ordered attribute EMD = mean |cumulative-share gap| over the first
    m−1 buckets; the comparison runs entirely in cross-multiplied
    BIGINTs (|cum_g·N − cum_glob·N_g|), one division at the end. A
    group with emd > 0.2 leaks balance information even if k-anonymous.
    Dense bucket grid via cross join so missing deciles count as 0."""
    customer = load_table(spark, sf_dir, "customer")
    b = customer.select(
        F.col("c_nationkey").alias("nation"),
        (
            F.ntile(_TC_BUCKETS).over(
                Window.orderBy("c_acctbal", "c_custkey")
            )
            - 1
        ).alias("bucket"),
    ).localCheckpoint(eager=False)
    nations = b.select("nation").distinct()
    # dense grid via explode(sequence), not a crossJoin — one less
    # nested-loop join in the plan (the ≤2-BNLJ census rule)
    grid = nations.select(
        "nation",
        F.explode(
            F.sequence(F.lit(0), F.lit(_TC_BUCKETS - 1))
        ).alias("bucket"),
    )
    raw = b.groupBy("nation", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cnt = grid.join(raw, ["nation", "bucket"], "left").select(
        "nation",
        "bucket",
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
    )
    wg = Window.partitionBy("nation").orderBy("bucket")
    glob = cnt.groupBy("bucket").agg(F.sum("c").cast("long").alias("gb"))
    wglob = Window.orderBy("bucket")
    glob = glob.select(
        "bucket", F.sum("gb").over(wglob).cast("long").alias("cglob")
    )
    cum = cnt.select(
        "nation",
        "bucket",
        F.sum("c").over(wg).cast("long").alias("cg"),
    ).join(glob, "bucket")
    tot = b.groupBy("nation").agg(F.count(F.lit(1)).cast("long").alias("ng"))
    nn = b.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    emd_num = F.sum(
        F.abs(F.col("cg") * F.col("nn") - F.col("cglob") * F.col("ng"))
    ).cast("double")
    emd = emd_num / (
        F.col("ng").cast("double") * F.col("nn") * (_TC_BUCKETS - 1)
    )
    return (
        cum.filter(F.col("bucket") < _TC_BUCKETS - 1)
        .join(tot, "nation")
        .crossJoin(F.broadcast(nn))
        .groupBy("nation", "ng", "nn")
        .agg(
            F.round(emd, 6).alias("emd"),
            (emd > 0.2).cast("long").alias("t_flag"),
        )
        .select(
            "nation",
            F.col("ng").alias("n_rows"),
            "emd",
            "t_flag",
        )
    )


# ---------------------------------------------------------------------------
# phase 66 — isotonic calibration (PAVA), sequential test (SPRT),
# kernel two-sample MMD, exact Shapley attribution
# ---------------------------------------------------------------------------


@query(
    "q_isotonic_calibration",
    """
    WITH s AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS sc,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ), mm AS (SELECT MIN(sc) AS mn, MAX(sc) AS mx FROM s),
    bins AS (
      SELECT CAST(((sc - mm.mn) * 10) // (mm.mx - mm.mn + 1) AS INTEGER)
               AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM s, mm GROUP BY 1
    ), cum AS (
      SELECT bin,
             CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
             CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS cp
      FROM bins
    ), iv AS (
      SELECT jm.bin + 1 AS j, k.bin AS k,
             CAST(k.cp - jm.cp AS DOUBLE) / (k.cn - jm.cn) AS r
      FROM cum k JOIN cum jm ON jm.bin < k.bin
      UNION ALL
      SELECT 0 AS j, k.bin AS k, CAST(k.cp AS DOUBLE) / k.cn AS r
      FROM cum k
    ), inner_min AS (
      SELECT b.bin, iv.j, MIN(iv.r) AS m
      FROM (SELECT bin FROM bins) b
      JOIN iv ON iv.j <= b.bin AND iv.k >= b.bin
      GROUP BY 1, 2
    )
    SELECT b.bin, b.n AS n_orders,
           ROUND(CAST(b.pos AS DOUBLE) / b.n, 6) AS raw_rate,
           ROUND(MAX(im.m), 6) AS iso_rate
    FROM inner_min im JOIN bins b ON b.bin = im.bin
    GROUP BY b.bin, b.n, b.pos
    """,
)
def q_isotonic_calibration(spark, sf_dir):
    """Isotonic (PAVA) calibration of the price→F-status reliability
    curve — the monotone regression a probability calibrator fits where
    Platt scaling's sigmoid is too rigid. Distributed form of pool-
    adjacent-violators via the min-max identity: iso(i) = max_{j≤i}
    min_{k≥i} rate(j..k), with interval rates from cumulative (n, pos)
    diffs, so the whole fit is two bounded joins over the ~10-bin frame
    (O(bins³) pairs total) — no sequential pooling loop, no driver
    state. Rates are single IEEE divisions of exact integers, so min/
    max/round agree cross-engine. Weighted correctly by construction
    (interval rates pool COUNTS, not bin averages)."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    mm = s.agg(F.min("sc").alias("mn"), F.max("sc").alias("mx"))
    bins = (
        s.crossJoin(F.broadcast(mm))
        .select(
            (
                (F.col("sc") - F.col("mn"))
                * 10
                / (F.col("mx") - F.col("mn") + 1)
            )
            .cast("int")
            .alias("bin"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
        .localCheckpoint(eager=False)  # reused by cum + final join
    )
    wc = Window.orderBy("bin")
    cum = bins.select(
        "bin",
        F.sum("n").over(wc).cast("long").alias("cn"),
        F.sum("pos").over(wc).cast("long").alias("cp"),
    ).localCheckpoint(eager=False)  # both interval-join sides
    k, jm = cum.alias("k"), cum.alias("jm")
    iv_mid = k.join(jm, F.col("jm.bin") < F.col("k.bin")).select(
        (F.col("jm.bin") + 1).alias("j"),
        F.col("k.bin").alias("k"),
        (
            (F.col("k.cp") - F.col("jm.cp")).cast("double")
            / (F.col("k.cn") - F.col("jm.cn"))
        ).alias("r"),
    )
    iv_zero = cum.select(
        F.lit(0).alias("j"),
        F.col("bin").alias("k"),
        (F.col("cp").cast("double") / F.col("cn")).alias("r"),
    )
    iv = iv_mid.unionAll(iv_zero)
    pos = bins.select("bin")
    inner_min = (
        pos.join(iv, (iv["j"] <= pos["bin"]) & (iv["k"] >= pos["bin"]))
        .groupBy("bin", "j")
        .agg(F.min("r").alias("m"))
    )
    return (
        inner_min.groupBy("bin")
        .agg(F.round(F.max("m"), 6).alias("iso_rate"))
        .join(bins, "bin")
        .select(
            "bin",
            F.col("n").alias("n_orders"),
            F.round(F.col("pos").cast("double") / F.col("n"), 6).alias(
                "raw_rate"
            ),
            "iso_rate",
        )
    )


# SPRT constants (precomputed literals so no engine evaluates ln at
# query time): H0 purchase share p0=0.2 vs H1 p1=0.3, alpha=beta=0.05.
# c1 = ln(p1/p0), c0 = ln((1-p1)/(1-p0)), A = ln((1-beta)/alpha).
_SPRT_C1 = "0.405465108"
_SPRT_C0 = "-0.133531393"
_SPRT_A = "2.944438979"


@query(
    "q_sprt_decision",
    f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS s,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
                  AS BIGINT) AS f
      FROM events GROUP BY 1
    ), llr AS (
      SELECT h,
             CAST(SUM(CAST(s AS DECIMAL(10,0))
                        * CAST({_SPRT_C1} AS DECIMAL(18,9))
                      + CAST(f AS DECIMAL(10,0))
                        * CAST({_SPRT_C0} AS DECIMAL(18,9)))
                  OVER (ORDER BY h) AS DECIMAL(38,9)) AS l
      FROM hourly
    ), marked AS (
      SELECT h, l,
             CASE WHEN l >= CAST({_SPRT_A} AS DECIMAL(18,9)) THEN 1
                  WHEN l <= -CAST({_SPRT_A} AS DECIMAL(18,9)) THEN -1
                  ELSE 0 END AS crossed
      FROM llr
    ), first_cross AS (
      SELECT h, crossed FROM marked WHERE crossed <> 0
      ORDER BY h LIMIT 1
    )
    SELECT CASE (SELECT crossed FROM first_cross)
             WHEN 1 THEN 'accept_h1' WHEN -1 THEN 'accept_h0'
             ELSE 'continue' END AS decision,
           CAST((SELECT strftime(h, '%Y-%m-%d %H:%M:%S')
                 FROM first_cross) AS VARCHAR) AS crossed_at,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(CAST(MAX_BY(l, h) AS DOUBLE), 6) AS final_llr
    FROM marked
    """,
)
def q_sprt_decision(spark, sf_dir):
    """Wald's sequential probability ratio test on the hourly purchase
    share — the always-valid early-stopping monitor batch A/B tests
    lack: the log-likelihood ratio random walk (H0 p=0.2 vs H1 p=0.3,
    α=β=0.05) crosses ln((1−β)/α) → accept H1, −ln(·) → accept H0.
    The ln constants are PRECOMPUTED 9dp decimal literals, so the walk
    is an exact integer-weighted decimal cumsum — no engine evaluates
    a transcendental at query time (the Woolf-CI lesson inverted). The
    window rides the pre-aggregated hourly frame (|hours| rows), the
    one-pass fact scan is the only data-sized stage."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("s"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 0).otherwise(1)
        )
        .cast("long")
        .alias("f"),
    )
    c1 = F.lit(_SPRT_C1).cast("decimal(18,9)")
    c0 = F.lit(_SPRT_C0).cast("decimal(18,9)")
    a = F.lit(_SPRT_A).cast("decimal(18,9)")
    w = Window.orderBy("h")
    # counts narrowed to DECIMAL(10,0) BEFORE the multiply: long ×
    # decimal(18,9) needs precision 39, so Spark would cap at 38 by
    # SHEDDING SCALE to 8 — every term silently truncated (measured
    # 7e-6 drift over 531 hours vs the exact DuckDB walk). 10+18+1=29
    # keeps all 9 fractional digits exact.
    sd = F.col("s").cast("decimal(10,0)")
    fd = F.col("f").cast("decimal(10,0)")
    llr = hourly.select(
        "h",
        F.sum(sd * c1 + fd * c0)
        .over(w)
        .cast("decimal(38,9)")
        .alias("l"),
    )
    marked = llr.select(
        "h",
        "l",
        F.when(F.col("l") >= a, 1)
        .when(F.col("l") <= -a, -1)
        .otherwise(0)
        .alias("crossed"),
    ).localCheckpoint(eager=False)  # reused: first-cross + summary
    fc = (
        marked.filter(F.col("crossed") != 0)
        .orderBy("h")
        .limit(1)
        .select(
            F.col("crossed").alias("fc"),
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("fh"),
        )
    )
    summary = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.round(F.max_by("l", "h").cast("double"), 6).alias("final_llr"),
    )
    return summary.join(fc, how="left").select(
        F.when(F.col("fc") == 1, "accept_h1")
        .when(F.col("fc") == -1, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
        F.col("fh").cast("string").alias("crossed_at"),
        "n_hours",
        "final_llr",
    )


_MMD_Q = 100  # quantization: every kernel sum stays far under 2^53


@query(
    "q_mmd_poly",
    f"""
    WITH emb AS (
      SELECT vec_id, CAST(vec_id % 2 AS INTEGER) AS grp,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * {_MMD_Q}) AS BIGINT))
               AS q
      FROM embeddings WHERE vec_id < 400
    ), qe AS (
      -- parallel unnests zip positionally (no WITH ORDINALITY needed)
      SELECT vec_id, grp,
             CAST(unnest(generate_series(1, len(q))) AS INTEGER) AS i,
             unnest(q) AS v
      FROM emb
    ), dots AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, a.grp AS ga, b.grp AS gb,
             CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      FROM qe a JOIN qe b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2, 3, 4
    ), terms AS (
      SELECT
        CAST(SUM(CASE WHEN ga = 0 AND gb = 0 THEN dot * dot END)
             AS BIGINT) AS s_aa,
        CAST(SUM(CASE WHEN ga = 1 AND gb = 1 THEN dot * dot END)
             AS BIGINT) AS s_bb,
        CAST(SUM(CASE WHEN ga <> gb THEN dot * dot END)
             AS BIGINT) AS s_ab,
        CAST(SUM(CASE WHEN ga = 0 AND gb = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_aa,
        CAST(SUM(CASE WHEN ga = 1 AND gb = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_bb,
        CAST(SUM(CASE WHEN ga <> gb THEN 1 ELSE 0 END)
             AS BIGINT) AS n_ab
      FROM dots
    )
    SELECT n_aa, n_bb, n_ab,
           ROUND(CAST(s_aa AS DOUBLE) / n_aa
                 + CAST(s_bb AS DOUBLE) / n_bb
                 - 2.0 * CAST(s_ab AS DOUBLE) / n_ab, 6) AS mmd2
    FROM terms
    """,
)
def q_mmd_poly(spark, sf_dir):
    """Kernel two-sample test: unbiased MMD² between the even- and
    odd-id embedding samples under the quadratic polynomial kernel
    k(x,y) = (x·y)² — the drift detector that sees DISTRIBUTIONAL
    differences cosine-mean drift (q_embedding_drift) can't (it
    compares mean embeddings; MMD compares all second-order feature
    moments). Integer-exact end to end: dims quantize to ×100 ints, so
    every dot, squared kernel, and pair sum stays far below 2⁵³ (the
    decimal→double portability bound) — three IEEE divisions at the
    end. The 200+200 samples are a bounded fixed-size two-sample draw
    (the standard MMD estimator shape), so Spark broadcasts one side
    onto UN-exploded arrays and folds integer dots via zip_with —
    never a join on the dim key (the q_silhouette scale lesson)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * _MMD_Q).cast("long"),
    )
    e = (
        emb.filter(F.col("vec_id") < 400)
        .select(
            "vec_id",
            (F.col("vec_id") % 2).cast("int").alias("grp"),
            q.alias("q"),
        )
        .localCheckpoint(eager=False)  # both pair sides
    )
    a = e.select(
        F.col("vec_id").alias("ia"),
        F.col("grp").alias("ga"),
        F.col("q").alias("qa"),
    )
    b = e.select(
        F.col("vec_id").alias("ib"),
        F.col("grp").alias("gb"),
        F.col("q").alias("qb"),
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).select(
        "ga", "gb", dot.alias("dot")
    )
    k2 = F.col("dot") * F.col("dot")
    terms = pairs.agg(
        F.sum(F.when((F.col("ga") == 0) & (F.col("gb") == 0), k2))
        .cast("long")
        .alias("s_aa"),
        F.sum(F.when((F.col("ga") == 1) & (F.col("gb") == 1), k2))
        .cast("long")
        .alias("s_bb"),
        F.sum(F.when(F.col("ga") != F.col("gb"), k2))
        .cast("long")
        .alias("s_ab"),
        F.sum(
            F.when((F.col("ga") == 0) & (F.col("gb") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_aa"),
        F.sum(
            F.when((F.col("ga") == 1) & (F.col("gb") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_bb"),
        F.sum(F.when(F.col("ga") != F.col("gb"), 1).otherwise(0))
        .cast("long")
        .alias("n_ab"),
    )
    return terms.select(
        "n_aa",
        "n_bb",
        "n_ab",
        F.round(
            F.col("s_aa").cast("double") / F.col("n_aa")
            + F.col("s_bb").cast("double") / F.col("n_bb")
            - 2.0 * F.col("s_ab").cast("double") / F.col("n_ab"),
            6,
        ).alias("mmd2"),
    )


# Fixed channel→bit map (the 4 non-purchase event types). A literal map
# — not data-discovered — so the mask semantics are stable across SFs
# and engines; unseen types simply contribute no bit.
_SHAP_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
_SHAP_N = len(_SHAP_CHANNELS)
# |S|!·(n−1−|S|)! for n=4, index by |S| — times 4! = 24 denominator
_SHAP_W = {0: 6, 1: 2, 2: 2, 3: 6}
_SHAP_FACT = 24  # 4!

_SHAP_SQL_BIT = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 "
    "WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END"
)
_SHAP_SQL_W = (
    "CASE bit_count(CAST(s.mask AS BIGINT)) "
    "WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 6 END"
)


@query(
    "q_shapley_attribution",
    f"""
    WITH ub AS (
      SELECT user_id,
             CAST(SUM(DISTINCT {_SHAP_SQL_BIT}) AS BIGINT) AS mask,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM events GROUP BY user_id
    ), masks AS (
      SELECT CAST(m AS BIGINT) AS mask
      FROM generate_series(0, {2 ** _SHAP_N - 1}) AS t(m)
    ), vm AS (
      SELECT masks.mask,
             CAST(COALESCE(x.nu, 0) AS BIGINT) AS nu,
             CASE WHEN COALESCE(x.nu, 0) = 0 THEN 0.0
                  ELSE CAST(x.nc AS DOUBLE) / x.nu END AS v
      FROM masks LEFT JOIN (
        SELECT mask, COUNT(*) AS nu, SUM(conv) AS nc FROM ub GROUP BY 1
      ) x ON x.mask = masks.mask
    ), ch AS (
      SELECT * FROM (VALUES ('click', 1), ('error', 2), ('signup', 4),
                            ('view', 8)) AS t(channel, bit)
    ), terms AS (
      SELECT ch.channel,
             CAST(ROUND({_SHAP_SQL_W} * (v1.v - v0.v), 9)
                  AS DECIMAL(18,9)) AS term
      FROM ch
      JOIN vm s ON (CAST(s.mask AS BIGINT) & ch.bit) = 0
      JOIN vm v0 ON v0.mask = s.mask
      JOIN vm v1 ON v1.mask = s.mask + ch.bit
    )
    SELECT channel,
           ROUND(CAST(SUM(term) AS DOUBLE) / {_SHAP_FACT}, 6)
             AS shapley
    FROM terms GROUP BY channel
    """,
)
def q_shapley_attribution(spark, sf_dir):
    """EXACT Shapley-value channel attribution — the game-theoretic
    answer to 'which touchpoint actually drives conversion' that
    last-touch (q_attribution) and time-decay (q_time_decay_attribution)
    only approximate: each user's exposure set of the 4 non-purchase
    channels becomes a coalition bitmask, v(S) = conversion rate of
    users exposed to exactly S, and φ(channel) enumerates ALL 2⁴
    coalitions with the closed-form |S|!(n−1−|S|)!/n! weights (×24 kept
    integer, one division at the end). Exact enumeration is affordable
    precisely because the channel set is bounded — the masks table is
    16 rows however many users exist; the only data-sized stage is one
    per-user grouped pass. Marginal terms are 9dp-rounded decimals
    summed exactly (the Woolf/odds-ratio discipline), so the group sum
    is order-independent and hash-stable."""
    events = load_table(spark, sf_dir, "events")
    bit = F.lit(0)
    for name, b in _SHAP_CHANNELS:
        bit = F.when(F.col("event_type") == name, F.lit(b)).otherwise(bit)
    ub = (
        events.select(
            "user_id",
            bit.alias("bit"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("p"),
        )
        .groupBy("user_id")
        .agg(
            F.sum_distinct(F.col("bit")).cast("long").alias("mask"),
            F.max("p").cast("long").alias("conv"),
        )
    )
    masks = spark.range(2**_SHAP_N).select(F.col("id").alias("mask"))
    raw = ub.groupBy("mask").agg(
        F.count(F.lit(1)).alias("nu"), F.sum("conv").alias("nc")
    )
    vm = (
        masks.join(raw, "mask", "left")
        .select(
            "mask",
            F.coalesce(F.col("nu"), F.lit(0)).cast("long").alias("nu"),
            F.when(F.coalesce(F.col("nu"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.col("nc").cast("double") / F.col("nu"))
            .alias("v"),
        )
        .localCheckpoint(eager=False)  # joined three times below
    )
    ch = spark.createDataFrame(
        _SHAP_CHANNELS, "channel string, bit int"
    )
    w_expr = F.lit(None).cast("int")
    pc = F.bit_count(F.col("s.mask"))
    w_expr = (
        F.when(pc == 0, _SHAP_W[0])
        .when(pc == 1, _SHAP_W[1])
        .when(pc == 2, _SHAP_W[2])
        .when(pc == 3, _SHAP_W[3])
    )
    s = vm.alias("s")
    v0 = vm.select(F.col("mask").alias("m0"), F.col("v").alias("va"))
    v1 = vm.select(F.col("mask").alias("m1"), F.col("v").alias("vb"))
    terms = (
        ch.join(s, (F.col("s.mask").bitwiseAND(F.col("bit"))) == 0)
        .join(v0, F.col("m0") == F.col("s.mask"))
        .join(v1, F.col("m1") == F.col("s.mask") + F.col("bit"))
        .select(
            "channel",
            F.round(w_expr * (F.col("vb") - F.col("va")), 9)
            .cast("decimal(18,9)")
            .alias("term"),
        )
    )
    return terms.groupBy("channel").agg(
        F.round(
            F.sum("term").cast("double") / _SHAP_FACT, 6
        ).alias("shapley")
    )


# ---------------------------------------------------------------------------
# phase 67 — checkpoint restart/resume exactly-once certificate
# ---------------------------------------------------------------------------


@query("q_stream_resume")  # runs two real streaming queries → rows-only
def q_stream_resume(spark, sf_dir):
    """Restart-from-checkpoint certificate (streaming/sinks.
    resume_report): the one streaming failure mode the availableNow
    parity censuses can't see — a query STOPPED after half its input
    and restarted as a new query object on the same checkpoint must
    process ONLY the unseen files, continue batch ids (so the
    idempotent batch=<id> sink never collides), and reproduce the
    input multiset with zero duplicates and zero loss. This is the
    actual 100 TB operational path: long-running ingestion restarts on
    every deploy; exactly-once across restarts is the contract that
    makes that safe."""
    from ..streaming.sinks import resume_report

    events = load_table(spark, sf_dir, "events")
    return resume_report(spark, events)


@query("q_substr_dedup_strip", Co.sql_substr_dedup_strip(k=_SUBSTR_K))
def q_substr_dedup_strip(spark, sf_dir):
    """ExactSubstr REMOVAL (operators/corpus.substr_dedup_strip): every
    duplicated 8-token window is cut from every document except its
    canonical (globally-first) occurrence, survivors reassembled in
    reading order — q_substr_dup_spans says where the corpus repeats
    itself, this produces the deduplicated corpus, hash-verified down
    to the sha256 of each rebuilt document. Window-grain retention
    semantics documented in the operator."""
    docs = load_table(spark, sf_dir, "documents")
    return Co.substr_dedup_strip(docs, k=_SUBSTR_K)


# ---------------------------------------------------------------------------
# phase 68 — multiple-testing control: Benjamini-Hochberg over
# per-segment permutation p-values
# ---------------------------------------------------------------------------

_BH_K = 60  # permutations (matches q_permutation_test's _PERM_K)
_BH_ALPHA = "0.10"
_BH_M = 5  # market segments = number of simultaneous tests


@query(
    "q_bh_fdr",
    f"""
    WITH u AS (
      SELECT c.c_custkey AS cust, c.c_mktsegment AS seg,
             CAST(COALESCE(SUM(
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)
               AS BIGINT) AS v
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS st
      FROM u
    ), gt AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(SUM(v) AS BIGINT) AS sa
      FROM u GROUP BY 1
    ), perm AS (
      SELECT s.seed, u.v,
             ROW_NUMBER() OVER (
               PARTITION BY s.seed
               ORDER BY md5(CAST(s.seed AS VARCHAR) || ':'
                            || CAST(u.cust AS VARCHAR)), u.cust) AS rn
      FROM u, (SELECT seed FROM range(1, {_BH_K + 1}) r(seed)) s
    ), cum AS (
      SELECT seed, rn,
             CAST(SUM(v) OVER (PARTITION BY seed ORDER BY rn)
                  AS BIGINT) AS cv
      FROM perm
    ), ps AS (
      SELECT g.seg, c.seed,
             CAST(c.cv AS DOUBLE) / g.n1
               - CAST(t.st - c.cv AS DOUBLE) / (t.n - g.n1) AS diff_s
      FROM cum c JOIN gt g ON c.rn = g.n1, tot t
    ), obs AS (
      SELECT g.seg, g.n1,
             CAST(g.sa AS DOUBLE) / g.n1
               - CAST(t.st - g.sa AS DOUBLE) / (t.n - g.n1) AS obs_d
      FROM gt g, tot t
    ), pv AS (
      SELECT o.seg, o.n1, ROUND(o.obs_d, 6) AS obs_diff_cents,
             ROUND((1.0 + SUM(CASE WHEN ABS(p.diff_s) >= ABS(o.obs_d)
                                   THEN 1 ELSE 0 END))
                   / (COUNT(*) + 1.0), 6) AS p_value
      FROM obs o JOIN ps p ON p.seg = o.seg
      GROUP BY o.seg, o.n1, o.obs_d
    ), ranked AS (
      SELECT seg, n1, obs_diff_cents, p_value,
             CAST(ROW_NUMBER() OVER (ORDER BY p_value, seg) AS BIGINT)
               AS bh_rank,
             CASE WHEN p_value
                       <= ROW_NUMBER() OVER (ORDER BY p_value, seg)
                          * {_BH_ALPHA} / {_BH_M}
                  THEN 1 ELSE 0 END AS passes
      FROM pv
    ), kmax AS (
      SELECT COALESCE(MAX(CASE WHEN passes = 1 THEN bh_rank END), 0)
               AS k
      FROM ranked
    )
    SELECT r.seg AS segment, r.n1 AS n_customers, r.obs_diff_cents,
           r.p_value, r.bh_rank,
           CAST(CASE WHEN r.bh_rank <= kmax.k THEN 1 ELSE 0 END
                AS BIGINT) AS discovery
    FROM ranked r, kmax
    """,
)
def q_bh_fdr(spark, sf_dir):
    """Benjamini-Hochberg FDR control over SIMULTANEOUS permutation
    tests — the multiple-testing discipline the per-test inference
    suite (q_permutation_test, q_ab_test, …) was missing: testing all
    5 market segments against the rest at once, 5 chances to false-
    alarm need a correction, and BH bounds the expected false-discovery
    RATE at α=0.10 instead of Bonferroni's power-killing family bound.

    Distributed shape: ONE md5 shuffle per seed serves all 5 tests —
    each seed ranks every customer once (the q_permutation_test
    portable-randomness discipline) and a per-seed cumulative sum makes
    'spend of the first n₁ shuffled customers' an O(1) lookup per
    segment (join on rn = n₁), so the B×N frame is built once, not per
    test. p-values are exact small-integer ratios; the BH step-up
    (max rank with p ≤ rank·α/m, everything below is a discovery) runs
    on the 5-row frame."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    u = (
        customer.join(
            orders, orders["o_custkey"] == customer["c_custkey"], "left"
        )
        .groupBy(
            F.col("c_custkey").alias("cust"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
                F.lit(0),
            )
            .cast("long")
            .alias("v")
        )
        .localCheckpoint(eager=False)  # perm fan-out + totals + groups
    )
    tot = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("st"),
    )
    gt = u.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.sum("v").cast("long").alias("sa"),
    )
    seeds = spark.range(1, _BH_K + 1).select(F.col("id").alias("seed"))
    wp = Window.partitionBy("seed").orderBy(
        F.md5(
            F.concat_ws(
                ":",
                F.col("seed").cast("string"),
                F.col("cust").cast("string"),
            )
        ),
        "cust",
    )
    # r14 optimization (guide §2.4): rn and the cumulative sum share
    # ONE window pass — the old second window ordered by rn re-sorted
    # the B×N frame, but rn is itself minted by wp's order and (seed,
    # cust) keys are unique, so the default RANGE frame over wp equals
    # the ROWS-cumulative over rn exactly. One Sort instead of two.
    cum = u.crossJoin(seeds).select(
        "seed",
        F.row_number().over(wp).alias("rn"),
        F.sum("v").over(wp).cast("long").alias("cv"),
    )
    ps = cum.join(gt, cum["rn"] == gt["n1"]).crossJoin(
        F.broadcast(tot)
    ).select(
        "seg",
        "seed",
        (
            F.col("cv").cast("double") / F.col("n1")
            - (F.col("st") - F.col("cv")).cast("double")
            / (F.col("n") - F.col("n1"))
        ).alias("diff_s"),
    )
    obs = gt.crossJoin(F.broadcast(tot)).select(
        "seg",
        "n1",
        (
            F.col("sa").cast("double") / F.col("n1")
            - (F.col("st") - F.col("sa")).cast("double")
            / (F.col("n") - F.col("n1"))
        ).alias("obs_d"),
    )
    pv = (
        obs.join(ps, "seg")
        .groupBy("seg", "n1", "obs_d")
        .agg(
            F.round(
                (
                    1.0
                    + F.sum(
                        F.when(
                            F.abs(F.col("diff_s")) >= F.abs(F.col("obs_d")),
                            1,
                        ).otherwise(0)
                    )
                )
                / (F.count(F.lit(1)) + 1.0),
                6,
            ).alias("p_value"),
        )
        .select(
            "seg",
            "n1",
            F.round(F.col("obs_d"), 6).alias("obs_diff_cents"),
            "p_value",
        )
    )
    wr = Window.orderBy("p_value", "seg")
    alpha = float(_BH_ALPHA)
    ranked = pv.select(
        "seg",
        "n1",
        "obs_diff_cents",
        "p_value",
        F.row_number().over(wr).cast("long").alias("bh_rank"),
    ).withColumn(
        "passes",
        (
            F.col("p_value")
            <= F.col("bh_rank") * alpha / _BH_M
        ).cast("int"),
    ).localCheckpoint(eager=False)  # reused: kmax + final select
    kmax = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("passes") == 1, F.col("bh_rank"))),
            F.lit(0),
        ).alias("k")
    )
    return ranked.crossJoin(F.broadcast(kmax)).select(
        F.col("seg").alias("segment"),
        F.col("n1").alias("n_customers"),
        "obs_diff_cents",
        "p_value",
        "bh_rank",
        (F.col("bh_rank") <= F.col("k")).cast("long").alias("discovery"),
    )
