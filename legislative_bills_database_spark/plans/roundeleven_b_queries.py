"""Round-11 phase 69: LM scoring, view maintenance, resharding,
causal stratification, local-DP collection.

Five extension operators in families a 100 TB training-data pipeline
exercises constantly but the inventory still lacked a row for:
interpolated Kneser-Ney bigram probabilities (the LM-scoring side of
the tokenizer/perplexity stack), signed-delta incremental view
maintenance (delta-sized refresh == full recompute, hash-proven),
rendezvous-hash resharding (the minimal-movement certificate for
growing a sharded corpus), propensity-stratified ATE (the adjusted
sibling of q_did/q_cuped), and randomized-response estimation (the
local-DP counterpart of the central-DP q_dp_counts).

All five keep the repo's integer/decimal discipline: every corpus
statistic is an exact BIGINT, and the only floating-point steps are
final divisions of exact integers written in the identical IEEE
operation order in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table, load_tables
from .registry import query

# ---------------------------------------------------------------------------
# Kneser-Ney bigram language model (interpolated, d = 3/4)
# ---------------------------------------------------------------------------

_KN_TOPK = 20


@query(
    "q_kneser_ney",
    f"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS l FROM documents
    ), big AS (
      -- parallel unnests zip positionally (no WITH ORDINALITY needed)
      SELECT unnest([l[i] FOR i IN generate_series(1, len(l) - 1)]) AS w1,
             unnest([l[i + 1] FOR i IN generate_series(1, len(l) - 1)]) AS w2
      FROM toks WHERE len(l) >= 2
    ), bcnt AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM big GROUP BY 1, 2
    ), left_c AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS nc_w1
      FROM bcnt GROUP BY 1
    ), right_c AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS np_w2 FROM bcnt GROUP BY 1
    ), tt AS (
      SELECT CAST(count(*) AS BIGINT) AS t_types FROM bcnt
    ), scored AS (
      SELECT b.w1, b.w2, b.c12, l.c1, l.nc_w1, r.np_w2, tt.t_types,
             (4 * b.c12 - 3) * tt.t_types
               + 3 * l.nc_w1 * r.np_w2 AS num
      FROM bcnt b
      JOIN left_c l USING (w1)
      JOIN right_c r USING (w2)
      CROSS JOIN tt
    )
    SELECT w1, w2, c12, c1, nc_w1, np_w2, t_types,
           ROUND(CAST(num AS DOUBLE) / (4.0 * c1 * t_types), 6) AS p_kn
    FROM scored
    ORDER BY c12 DESC, w1 ASC, w2 ASC
    LIMIT {_KN_TOPK}
    """,
)
def q_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    the smoothing every n-gram quality filter — CCNet's KenLM scorer
    included — rests on) for the corpus's top-20 bigrams:

        P(w2|w1) = (c12 - d)/c1 + (d·N1+(w1,·)/c1) · N1+(·,w2)/T

    with discount d = 3/4 chosen so ×4 keeps EVERY term integral:
    the scaled numerator (4·c12-3)·T + 3·N1+(w1,·)·N1+(·,w2) over
    denominator 4·c1·T is an exact BIGINT ratio (observed bigrams have
    c12 ≥ 1 > d, so the max(·,0) clamp is vacuous on this frame), and
    the single double division at the end is written in the identical
    operation order as the DuckDB twin. Continuation counts N1+ are
    what distinguish KN from plain absolute discounting — "francisco"
    is frequent but follows only "san", so its continuation probability
    is tiny.

    Distributed shape: ONE bigram shuffle (the data-sized stage)
    produces bcnt; the left/right marginal frames and the type total
    are vocabulary-bounded and BROADCAST back onto it, so corpus text
    travels exactly once. All statistics stay below 2^53 through sf10
    (num ≤ 4·c12·T ~ 4e6·5e6 at sf10), so the double division is exact
    in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = docs.select(toks.alias("l")).filter(F.size("l") >= 2)
    bigrams = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l") - 1),
                lambda i: F.struct(
                    F.element_at("l", i).alias("w1"),
                    F.element_at("l", i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bcnt = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .localCheckpoint(eager=False)  # reused: marginals ×2 + total + join
    )
    left_c = bcnt.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("nc_w1"),
    )
    right_c = bcnt.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("np_w2")
    )
    tt = bcnt.agg(F.count(F.lit(1)).cast("long").alias("t_types"))
    num = (4 * F.col("c12") - 3) * F.col("t_types") + 3 * F.col(
        "nc_w1"
    ) * F.col("np_w2")
    return (
        bcnt.join(F.broadcast(left_c), "w1")
        .join(F.broadcast(right_c), "w2")
        .crossJoin(F.broadcast(tt))
        .orderBy(F.col("c12").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(_KN_TOPK)
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "nc_w1",
            "np_w2",
            "t_types",
            F.round(
                num.cast("double")
                / (F.lit(4.0) * F.col("c1") * F.col("t_types")),
                6,
            ).alias("p_kn"),
        )
    )


# ---------------------------------------------------------------------------
# signed-delta incremental view maintenance
# ---------------------------------------------------------------------------


@query(
    "q_ivm_join",
    """
    WITH eff AS (
      SELECT l_orderkey,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
      WHERE (l_linenumber <= 4 AND l_orderkey % 101 <> 0)
         OR l_linenumber > 4
    )
    SELECT o.o_custkey AS custkey,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM eff JOIN orders o ON eff.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q_ivm_join(spark, sf_dir):
    """Incremental maintenance of a join-aggregate view under a mixed
    insert/delete CDC batch, certified equal to a from-scratch
    recompute (the oracle computes the final state directly; the Spark
    side MAINTAINS it). View = per-customer (count, cents) over
    lineitem ⋈ orders; base = line numbers 1-4; the delta batch inserts
    every line number > 4 and deletes base rows of every 101st order.

    The classic signed-delta algebra (Blakeley et al. 1986 view
    maintenance; the batch core of q_rollup_maintenance generalized to
    a JOIN view): deletes enter the delta stream with multiplicity -1,
    inserts with +1, the delta joins the dimension and pre-aggregates
    to per-key partials, and the merge is a key-wise full-outer
    coalesce-add against the stored view with groups at count 0
    dropped. At 100 TB this is the whole point: the refresh touches
    |delta| rows + |view| keys, never the base fact table — here the
    base aggregate runs once only because the test must build the
    "stored" view it maintains."""
    li, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    okey = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_custkey").alias("custkey"),
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    base = li.filter(F.col("l_linenumber") <= 4)
    # the "stored" materialization (production: a table the engine owns)
    v_base = (
        base.join(okey, "l_orderkey")
        .groupBy("custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(cents).cast("long").alias("sum_cents"),
        )
        .localCheckpoint(eager=False)
    )
    ins = li.filter(F.col("l_linenumber") > 4).select(
        "l_orderkey", cents.alias("cents"), F.lit(1).alias("mult")
    )
    dels = base.filter(F.col("l_orderkey") % 101 == 0).select(
        "l_orderkey", cents.alias("cents"), F.lit(-1).alias("mult")
    )
    delta = (
        ins.unionByName(dels)
        .join(okey, "l_orderkey")
        .groupBy("custkey")
        .agg(
            F.sum("mult").cast("long").alias("dn"),
            F.sum(F.col("mult") * F.col("cents")).cast("long").alias("ds"),
        )
    )
    merged = v_base.join(delta, "custkey", "full_outer").select(
        "custkey",
        (
            F.coalesce(F.col("n_items"), F.lit(0))
            + F.coalesce(F.col("dn"), F.lit(0))
        )
        .cast("long")
        .alias("n_items"),
        (
            F.coalesce(F.col("sum_cents"), F.lit(0))
            + F.coalesce(F.col("ds"), F.lit(0))
        )
        .cast("long")
        .alias("sum_cents"),
    )
    return merged.filter(F.col("n_items") > 0)


# ---------------------------------------------------------------------------
# rendezvous (highest-random-weight) resharding census
# ---------------------------------------------------------------------------

_HRW_BEFORE = 8
_HRW_AFTER = 9


def _sql_hrw(n: int) -> str:
    return (
        "list_max([{'h': md5('hrw:' || CAST(k AS VARCHAR) || ':' "
        f"|| CAST(s AS VARCHAR)), 's': CAST(s AS INTEGER)}} "
        f"FOR s IN generate_series(0, {n - 1})]).s"
    )


@query(
    "q_rendezvous_resharding",
    f"""
    WITH keys AS (
      SELECT c_custkey AS k FROM customer
    ), assigned AS (
      SELECT k,
             {_sql_hrw(_HRW_BEFORE)} AS shard_before,
             {_sql_hrw(_HRW_AFTER)} AS shard_after
      FROM keys
    )
    SELECT shard_before, shard_after,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM assigned GROUP BY 1, 2
    """,
)
def q_rendezvous_resharding(spark, sf_dir):
    """Rendezvous (highest-random-weight) hashing shard assignment
    before and after growing the shard count 8 → 9 (Thaler & Ravishankar
    1998) — the movement census behind every "add a shard without
    reshuffling the corpus" operation: under HRW only keys whose argmax
    hash lands on the NEW shard move, so the expected moved fraction is
    exactly 1/9, versus (mod-hash) ~8/9 total reshuffle. The transition
    matrix this census emits makes that auditable: every off-diagonal
    cell must have shard_after = 8.

    Portability: the per-(key, shard) weight is the lowercase-hex md5
    of 'hrw:key:shard' (the engine-portable randomness discipline) and
    the argmax is an array_max over (hex, shard) structs — Spark and
    DuckDB both order structs lexicographically field by field, and
    md5 ties are impossible on distinct strings in practice. The whole
    assignment is scan-side per-row array math: ZERO shuffle before
    the 72-cell census aggregate, so at 100 TB it is one pass."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )

    def hrw(n: int):
        arr = F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda s: F.struct(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit("hrw"),
                        F.col("k").cast("string"),
                        s.cast("string"),
                    )
                ).alias("h"),
                s.cast("int").alias("s"),
            ),
        )
        return F.array_max(arr)["s"]

    return (
        cust.select(
            hrw(_HRW_BEFORE).alias("shard_before"),
            hrw(_HRW_AFTER).alias("shard_after"),
        )
        .groupBy("shard_before", "shard_after")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    )


# ---------------------------------------------------------------------------
# propensity-stratified average treatment effect
# ---------------------------------------------------------------------------

_ATE_TREAT = ("1-URGENT", "2-HIGH")


@query(
    "q_stratified_ate",
    f"""
    WITH u AS (
      SELECT c.c_mktsegment AS seg,
             CASE WHEN o.o_orderpriority IN ('{_ATE_TREAT[0]}',
                                             '{_ATE_TREAT[1]}')
                  THEN 1 ELSE 0 END AS t,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), per_seg AS (
      SELECT seg,
             CAST(SUM(t) AS BIGINT) AS n_t,
             CAST(SUM(1 - t) AS BIGINT) AS n_c,
             CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS s_t,
             CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS s_c
      FROM u GROUP BY 1
    ), micro AS (
      SELECT seg, n_t, n_c,
             (1000000 * s_t) // n_t AS mean_t_micro,
             (1000000 * s_c) // n_c AS mean_c_micro
      FROM per_seg
    ), overall AS (
      SELECT CAST(SUM((n_t + n_c) * (mean_t_micro - mean_c_micro))
                  AS BIGINT) AS num,
             CAST(SUM(n_t + n_c) AS BIGINT) AS n_all
      FROM micro
    )
    SELECT m.seg, m.n_t, m.n_c, m.mean_t_micro, m.mean_c_micro,
           m.mean_t_micro - m.mean_c_micro AS diff_micro,
           ROUND(CAST(o.num AS DOUBLE) / o.n_all, 6) AS ate_stratified_micro
    FROM micro m CROSS JOIN overall o
    """,
)
def q_stratified_ate(spark, sf_dir):
    """Propensity-stratified average treatment effect (Rosenbaum &
    Rubin 1984 subclassification) — the confounding-adjusted sibling of
    q_did/q_cuped: 'treatment' = high order priority, outcome = order
    value in cents, strata = the customer's market segment (the
    coarsened propensity class). Within each stratum the treated/
    control means are compared, and the overall ATE weights the
    per-stratum differences by stratum size — so a segment that both
    orders urgently AND spends more no longer biases the contrast.

    Integer discipline: per-stratum means are quantized by BIGINT floor
    division to micro-cents ((1e6·sum) // n — identical on nonnegative
    operands in both engines), the overall numerator Σ n_s·diff_s is an
    exact BIGINT (so its cross-row sum order cannot matter, unlike a
    double sum), and the one double division is the final ATE. Shape:
    one fact-scan aggregate to 5 stratum rows; everything after is
    constant-size."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    u = orders.join(
        customer.select(
            F.col("c_custkey").alias("o_custkey"),
            F.col("c_mktsegment").alias("seg"),
        ),
        "o_custkey",
    ).select(
        "seg",
        F.when(F.col("o_orderpriority").isin(*_ATE_TREAT), 1)
        .otherwise(0)
        .alias("t"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    per_seg = u.groupBy("seg").agg(
        F.sum("t").cast("long").alias("n_t"),
        F.sum(1 - F.col("t")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("s_t"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("s_c"),
    )
    micro = per_seg.select(
        "seg",
        "n_t",
        "n_c",
        F.expr("(1000000 * s_t) div n_t").alias("mean_t_micro"),
        F.expr("(1000000 * s_c) div n_c").alias("mean_c_micro"),
    ).localCheckpoint(eager=False)  # reused: rows + overall
    overall = micro.agg(
        F.sum(
            (F.col("n_t") + F.col("n_c"))
            * (F.col("mean_t_micro") - F.col("mean_c_micro"))
        )
        .cast("long")
        .alias("num"),
        F.sum(F.col("n_t") + F.col("n_c")).cast("long").alias("n_all"),
    )
    return micro.crossJoin(F.broadcast(overall)).select(
        "seg",
        "n_t",
        "n_c",
        "mean_t_micro",
        "mean_c_micro",
        (F.col("mean_t_micro") - F.col("mean_c_micro")).alias("diff_micro"),
        F.round(F.col("num").cast("double") / F.col("n_all"), 6).alias(
            "ate_stratified_micro"
        ),
    )


# ---------------------------------------------------------------------------
# randomized response (local differential privacy)
# ---------------------------------------------------------------------------


def _sql_nib(x: str) -> str:
    c = f"ascii(substring(md5({x}), 1, 1))"
    return f"({c} - CASE WHEN {c} >= 97 THEN 87 ELSE 48 END)"


@query(
    "q_randomized_response",
    f"""
    WITH truth AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM events GROUP BY 1
    ), reported AS (
      SELECT b,
             CASE WHEN {_sql_nib("'rr1:' || CAST(user_id AS VARCHAR)")} < 12
                  THEN b
                  ELSE CASE WHEN
                    {_sql_nib("'rr2:' || CAST(user_id AS VARCHAR)")} < 8
                    THEN 1 ELSE 0 END
             END AS r
      FROM truth
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(SUM(r) AS BIGINT) AS n_reported,
           CAST(SUM(b) AS BIGINT) AS n_true,
           ROUND((8.0 * SUM(r) - count(*)) / (6.0 * count(*)), 6) AS pi_hat,
           ROUND(CAST(SUM(b) AS DOUBLE) / count(*), 6) AS pi_true
    FROM reported
    """,
)
def q_randomized_response(spark, sf_dir):
    """Warner-style randomized response (1965; the local-DP mechanism
    behind RAPPOR) over 'did this user ever purchase': each user tells
    the truth with probability 3/4, otherwise reports a fair coin —
    plausible deniability per user (ε = ln 5 local DP at these
    probabilities) — and the collector debiases the aggregate:
    E[p̂_reported] = 3π/4 + 1/8, so π̂ = (8·r − n)/(6·n), an exact
    integer ratio. The complement of q_dp_counts: noise enters at the
    CLIENT, so the aggregator never holds a true bit.

    Both coins are engine-portable md5 nibbles ('rr1:'/'rr2:' salted
    user ids — the q_permutation_test randomness discipline), so the
    realized noise, not just its distribution, is identical in Spark,
    DuckDB, and the pure-Python replay pin. One scan-side per-user
    aggregate, one census row out; the true rate rides along so the
    pin can bound |π̂ − π| by the 3-sigma binomial envelope."""
    events = load_table(spark, sf_dir, "events")
    truth = events.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("b")
    )

    def nib(prefix: str):
        a = F.ascii(
            F.substring(
                F.md5(F.concat(F.lit(prefix), F.col("user_id").cast("string"))),
                1,
                1,
            )
        )
        return a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))

    reported = truth.select(
        "b",
        F.when(nib("rr1:") < 12, F.col("b"))
        .otherwise(F.when(nib("rr2:") < 8, 1).otherwise(0))
        .alias("r"),
    )
    return reported.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("r").cast("long").alias("n_reported"),
        F.sum("b").cast("long").alias("n_true"),
        F.round(
            (F.lit(8.0) * F.sum("r") - F.count(F.lit(1)))
            / (F.lit(6.0) * F.count(F.lit(1))),
            6,
        ).alias("pi_hat"),
        F.round(
            F.sum("b").cast("double") / F.count(F.lit(1)), 6
        ).alias("pi_true"),
    )


# ---------------------------------------------------------------------------
# phase 70 — schema-constraint discovery (profiling family)
# ---------------------------------------------------------------------------

# Candidate inclusion dependencies (foreign-key hypotheses): a declared
# literal list — TANE/Metanome-style profilers enumerate candidates, the
# engine's job is verdicts at data scale. Mix of expected-hold (the
# star-schema FKs) and expected-fail (coverage and decoy hypotheses).
_IND_CANDIDATES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_custkey", "events", "user_id"),
    ("part", "p_partkey", "supplier", "s_suppkey"),
]


def _sql_ind_block(lt: str, lc: str, rt: str, rc: str) -> str:
    return f"""
    SELECT '{lt}.{lc}' AS lhs, '{rt}.{rc}' AS rhs,
           CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(SUM(CASE WHEN r.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing,
           CAST(CASE WHEN SUM(CASE WHEN r.k IS NULL THEN 1 ELSE 0 END) = 0
                THEN 1 ELSE 0 END AS INTEGER) AS holds,
           ROUND(CAST(count(*) - SUM(CASE WHEN r.k IS NULL THEN 1 ELSE 0
                 END) AS DOUBLE) / count(*), 6) AS containment
    FROM (SELECT DISTINCT {lc} AS k FROM {lt}) l
    LEFT JOIN (SELECT DISTINCT {rc} AS k FROM {rt}) r USING (k)
    """


@query(
    "q_inclusion_deps",
    "\nUNION ALL\n".join(
        _sql_ind_block(*cand) for cand in _IND_CANDIDATES
    ),
)
def q_inclusion_deps(spark, sf_dir):
    """Inclusion-dependency (foreign-key hypothesis) verdicts over a
    declared candidate list — the discovery half of q_fk_orphans
    (which audits a KNOWN FK; this one grades HYPOTHESES the way
    Metanome/TANE-family profilers do, with a containment fraction so
    near-misses are visible): for each lhs ⊆ rhs candidate, how many
    distinct lhs values are missing from rhs. The six candidates mix
    the star-schema FKs (must hold) with a coverage hypothesis
    (customer ⊆ event users — fails: most customers never produced an
    event) and a decoy (partkey ⊆ suppkey).

    Scale shape: each verdict is DISTINCT-project both sides →
    left-outer join at VALUE grain → one row; key cardinality, never
    row count, bounds the shuffle, and candidates are independent so
    the union evaluates them in parallel. At 100 TB this is the cheap
    pre-join sanity pass that catches a broken ingest before a silent
    inner-join row drop does."""
    out = None
    for lt, lc, rt, rc in _IND_CANDIDATES:
        lhs = (
            load_table(spark, sf_dir, lt)
            .select(F.col(lc).alias("k"))
            .distinct()
        )
        # r15 (guide §2.3): distinct over k ALONE, the constant hit
        # marker attached after — the old distinct aggregated and
        # shuffled (k, 1 AS 1) two-column rows. Plan-profiled first
        # (VERDICT r14 #6): the per-candidate shape is ALREADY minimal
        # — distinct lhs + distinct rhs + BroadcastHashJoin + 1-row agg
        # (plans/r15/q_inclusion_deps_*: 48 exchanges both sides, all
        # joins broadcast) — so this is a row-narrowing trim, not an
        # exchange elimination; identical rows either way.
        rhs = (
            load_table(spark, sf_dir, rt)
            .select(F.col(rc).alias("k"))
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        miss = F.sum(
            F.when(F.col("hit").isNull(), 1).otherwise(0)
        ).cast("long")
        n = F.count(F.lit(1)).cast("long")
        block = (
            lhs.join(rhs, "k", "left")
            .agg(
                F.lit(f"{lt}.{lc}").alias("lhs"),
                F.lit(f"{rt}.{rc}").alias("rhs"),
                n.alias("n_lhs"),
                miss.alias("n_missing"),
                F.when(miss == 0, 1).otherwise(0).cast("int").alias("holds"),
                F.round((n - miss).cast("double") / n, 6).alias(
                    "containment"
                ),
            )
            .select(
                "lhs", "rhs", "n_lhs", "n_missing", "holds", "containment"
            )
        )
        out = block if out is None else out.unionByName(block)
    return out


# Candidate functional dependencies lhs → rhs, same discovery posture:
# two true (the key FDs) and four false ones — including the composite
# (l_orderkey, l_linenumber) → l_partkey, which LOOKS like the TPC-H
# primary key but genuinely fails on this synthetic fixture (duplicate
# line numbers within an order at every SF) — exactly the kind of
# assumed-key-that-isn't a discovery pass exists to catch before a
# MERGE keyed on it silently multiplies rows.
_FD_CANDIDATES = [
    ("orders", ["o_orderkey"], "o_custkey"),
    ("events", ["event_id"], "user_id"),
    ("lineitem", ["l_orderkey", "l_linenumber"], "l_partkey"),
    ("customer", ["c_nationkey"], "c_mktsegment"),
    ("part", ["p_brand"], "p_type"),
    ("lineitem", ["l_partkey"], "l_suppkey"),
]


def _sql_fd_block(t: str, lhs: list[str], rhs: str) -> str:
    lhs_expr = ", ".join(lhs)
    name = f"{t}: {','.join(lhs)} -> {rhs}"
    return f"""
    SELECT '{name}' AS fd,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(MAX(d) AS BIGINT) AS max_rhs,
           CAST(CASE WHEN MAX(d) = 1 THEN 1 ELSE 0 END AS INTEGER) AS holds
    FROM (SELECT {lhs_expr}, count(DISTINCT {rhs}) AS d
          FROM {t} GROUP BY {lhs_expr})
    """


@query(
    "q_fd_check",
    "\nUNION ALL\n".join(_sql_fd_block(*cand) for cand in _FD_CANDIDATES),
)
def q_fd_check(spark, sf_dir):
    """Functional-dependency verdicts over a declared candidate list
    (TANE's per-candidate check, stripped of lattice search): lhs → rhs
    holds iff no lhs group carries two distinct rhs values; violating
    groups and the worst group's rhs cardinality quantify HOW broken a
    failed candidate is (1 bad group is a dirty row; thousands is a
    wrong model). Two keys that must hold and four false hypotheses —
    three planted (nation→segment, brand→type, part→supplier) and one
    DISCOVERED while pinning this query: (l_orderkey, l_linenumber)
    looks like the TPC-H primary key but is not unique in this
    fixture at any SF — the assumed-key-that-isn't a discovery pass
    exists to catch before a MERGE keyed on it multiplies rows.

    Each candidate is one grouped count-distinct — partial aggregation
    makes the map side absorb duplicate (lhs, rhs) pairs before the
    shuffle, so the exchange carries group-grain rows; candidates
    union in parallel. The profiling companion to q_dq_constraints:
    that one enforces declared rules, this one discovers which rules
    the data could even support."""
    out = None
    for t, lhs, rhs in _FD_CANDIDATES:
        name = f"{t}: {','.join(lhs)} -> {rhs}"
        grouped = (
            load_table(spark, sf_dir, t)
            .groupBy(*[F.col(c) for c in lhs])
            .agg(F.countDistinct(rhs).alias("d"))
        )
        block = grouped.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            F.max("d").cast("long").alias("max_rhs"),
            F.when(F.max("d") == 1, 1).otherwise(0).cast("int").alias(
                "holds"
            ),
        ).select("fd", "n_groups", "n_violating", "max_rhs", "holds")
        out = block if out is None else out.unionByName(block)
    return out


# ---------------------------------------------------------------------------
# phase 71 — sampled Brandes betweenness (quantized-exact)
# ---------------------------------------------------------------------------

_BW_SEEDS = ["s1", "s2", "s3", "s4"]
_BW_DEPTH = 4


def _sql_betweenness() -> str:
    from ..operators.graph import sql_betweenness_sampled

    return sql_betweenness_sampled(_BW_SEEDS, max_depth=_BW_DEPTH)


@query("q_betweenness_sample", _sql_betweenness())
def q_betweenness_sample(spark, sf_dir):
    """Sampled-source betweenness centrality over the customer↔supplier
    purchase graph (operators/graph.betweenness_sampled) — the broker
    metric the centrality suite lacked: q_closeness says who is NEAR
    everyone, betweenness says who sits ON the shortest paths between
    everyone (the cut vertex whose loss disconnects flows). Brandes'
    two-pass algorithm from the same 4 landmark suppliers as
    q_closeness: level-synchronous sigma fold forward, dependency
    accumulation backward — with the dependency recurrence floor-
    quantized to BIGINTs (×10⁶) so the ENTIRE iterative computation
    value-hash-matches a chained-CTE DuckDB twin (the q_pagerank_exact
    discipline applied to a two-pass algorithm; within 1/10⁶ per term
    of float Brandes, pinned against a pure-Python float replay).

    Scale posture: all seeds share one (seed, node)-keyed frontier, so
    rounds = graph diameter (3 here; depth fixed at 4) regardless of
    sample size; every level is an eagerly-checkpointed bounded frame;
    the backward join touches only consecutive levels — no node ever
    meets more than its neighborhood.

    r15: the symmetrized purchase-graph layout is the shared
    per-(app, sf_dir) memo (advanced_queries._purchase_sym — bipartite
    c*/s* node ids, so the self-loop-free precondition holds), built
    once per session for this query, q_closeness and
    q_harmonic_centrality; the per-call persist it replaces was never
    unpersisted (ADVICE r14)."""
    from ..operators.graph import betweenness_sampled
    from .advanced_queries import _purchase_sym

    sym = _purchase_sym(spark, sf_dir)
    seeds = spark.createDataFrame(
        [(s,) for s in _BW_SEEDS], "seed string"
    )
    return betweenness_sampled(
        sym, seeds, max_depth=_BW_DEPTH, sym_layout=sym
    )


__all__ = [
    "q_kneser_ney",
    "q_ivm_join",
    "q_rendezvous_resharding",
    "q_stratified_ate",
    "q_randomized_response",
    "q_inclusion_deps",
    "q_fd_check",
]
