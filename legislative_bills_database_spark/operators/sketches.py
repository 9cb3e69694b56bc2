"""Mergeable distinct-count sketches (Apache DataSketches HLL builtins).

THE 100 TB pattern for COUNT(DISTINCT): a global exact distinct is a
full shuffle of every key; a sketch is computed per shard/partition/day
(map-side, bytes-sized), MERGED without rescanning anything, and stored
next to the data so tomorrow's query unions yesterday's sketches instead
of re-reading 100 TB. Spark 4 ships the DataSketches HLL pair
(``hll_sketch_agg`` / ``hll_union_agg``) natively — this operator wires
them into the per-group → merged rollup with the exact count alongside,
so the error is observable.

Measured caveat (pinned in tests/test_sketches.py): union-of-sketches ==
direct-sketch requires headroom in lgConfigK — at lgConfigK=12 the union
path forces the sketch out of its exact sparse mode and the estimate
drops below the direct computation (493 vs 500 on the sf0.001 fixture);
at lgConfigK=14 both agree exactly at fixture cardinalities. Size the
config to the per-group cardinality you expect, not the global one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cm_sketch_report(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    top_k: int = 20,
) -> DataFrame:
    """Count-Min sketch frequency estimates vs exact counts for the
    ``top_k`` hottest keys — the mergeable point-frequency sketch next
    to HLL (distinct) and percentile_approx (quantiles): fixed
    depth×width integer state answers "how often did key x occur"
    within +ε·N, never undercounting.

    The sketch is RELATIONAL, not a UDF: bucket ids are
    ``pmod(xxhash64(key, row), width)`` per hash row, so the build is
    one explode(depth) + one map-side-combined groupBy collapsing to
    depth×width rows — and because Count-Min is a LINEAR sketch,
    per-shard sketches merge by plain element-wise ``SUM`` of those
    rows (a groupBy, no special union kernel), which is why it survives
    incremental/sharded ingestion at 100 TB. Estimates join the probe
    keys against the (broadcast-sized) sketch and take the per-key MIN
    across hash rows.

    Returns (key, exact_n, cm_est, overcount) for the top_k exact
    heavy keys, (exact_n DESC, key) ordered; overcount ≥ 0 always
    (one-sided error), expected ≤ e·N/width per the standard bound —
    both pinned in tests/test_sketches.py.
    """
    key = F.col(key_col).cast("string")
    rows = df.select(key.alias("k"))

    def buckets(col):
        c = F.col(col) if isinstance(col, str) else col
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.pmod(F.xxhash64(c, F.lit(i)), F.lit(width)).alias("b"),
                )
                for i in range(depth)
            ]
        )

    sketch = (
        rows.select(F.explode(buckets("k")).alias("hb"))
        .groupBy(F.col("hb.i").alias("i"), F.col("hb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact_top = (
        rows.groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "k")
        .limit(top_k)
    )
    probes = exact_top.select("k", F.explode(buckets("k")).alias("hb")).select(
        "k", F.col("hb.i").alias("i"), F.col("hb.b").alias("b")
    )
    est = (
        probes.join(F.broadcast(sketch), ["i", "b"])
        .groupBy("k")
        .agg(F.min("c").alias("cm_est"))
    )
    return (
        exact_top.join(est, "k")
        .select(
            F.col("k").alias("key"),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cm_est").cast("long").alias("cm_est"),
            (F.col("cm_est") - F.col("exact_n")).cast("long").alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), "key")
    )


def hll_merge_report(
    df: DataFrame,
    group_col: str,
    key_col: str,
    lg_config_k: int = 14,
) -> DataFrame:
    """One row comparing three distinct-counts of ``key_col``: the
    per-``group_col`` sketches union-merged, a direct global sketch, and
    the exact distinct — (n_groups, merged_est, direct_est, exact,
    rel_err). merged_est is the only one a shard-incremental pipeline
    would compute; the other two exist to make its error visible."""
    lg = F.lit(lg_config_k)
    per_group = df.groupBy(group_col).agg(
        F.hll_sketch_agg(key_col, lg).alias("__sk")
    )
    merged = per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.hll_sketch_estimate(F.hll_union_agg("__sk", F.lit(False))).alias(
            "merged_est"
        ),
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(key_col, lg)).alias("direct_est"),
        F.count_distinct(F.col(key_col)).alias("exact"),
    )
    return (
        merged.crossJoin(direct)  # two 1-row aggregates
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("merged_est") - F.col("exact"))
                / F.col("exact").cast("double"),
                4,
            ),
        )
    )


def kmv_distinct_report(
    df: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """K-minimum-values distinct-count sketch with an ENGINE-PORTABLE
    hash (md5 of the key's string form), so — unlike HLL, whose
    xxhash64-based registers no other engine reproduces — the estimate
    itself is value-hash-checkable against a SQL oracle: both engines
    rank the identical lowercase-hex digests.

    Estimator: with h(k-th smallest of n distinct hashes) mapped to
    (0,1) via its first 8 nibbles / 2^32, E[distinct] ≈ (k−1)/h_(k).
    Below k distinct values the sketch is EXACT (it holds every hash).

    Scale shape: the distinct pre-pass is the only key shuffle; the
    k-smallest selection is a TakeOrdered (per-partition top-k, O(k)
    rows to one reducer — the mergeability that lets per-shard sketches
    union without rescanning, same posture as the HLL rollup above).
    Returns one row: (n_exact, kmv_k, kmv_estimate, rel_err).
    """
    hashed = (
        df.select(F.col(col).cast("string").alias("s"))
        .na.drop()
        .distinct()
        .select(F.md5("s").alias("hx"))
        .persist()
    )
    n_exact = hashed.count()
    smallest = hashed.orderBy("hx").limit(k)

    def nib(pos: int):
        a = F.ascii(F.substring(F.col("hx"), pos, 1))
        return (a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))).cast(
            "long"  # 8 nibbles reach 2^32-1 — int32 would overflow
        )

    frac_num = nib(1)
    for p in range(2, 9):
        frac_num = frac_num * 16 + nib(p)
    out = (
        smallest.select(
            F.col("hx"), frac_num.cast("double").alias("num")
        )
        .agg(
            F.count("*").alias("kmv_k"),
            F.max("num").alias("kth_num"),
        )
        .select(
            F.lit(n_exact).cast("long").alias("n_exact"),
            F.col("kmv_k").cast("long").alias("kmv_k"),
            F.round(
                F.when(
                    F.col("kmv_k") < k, F.col("kmv_k").cast("double")
                ).otherwise(
                    # GREATEST(kth_num,1): if the k-th smallest digest
                    # starts with 8 zero nibbles (p ~ k*2^-32), Spark's
                    # /0 returns NULL while DuckDB errors — clamp both
                    (F.lit(float(k - 1)))
                    / (F.greatest(F.col("kth_num"), F.lit(1.0))
                       / F.lit(float(1 << 32)))
                ),
                2,
            ).alias("kmv_estimate"),
        )
        .select(
            "n_exact",
            "kmv_k",
            "kmv_estimate",
            F.round(
                F.abs(F.col("kmv_estimate") - F.col("n_exact"))
                / F.col("n_exact"),
                4,
            ).alias("rel_err"),
        )
    )
    out = out.localCheckpoint(eager=True)
    hashed.unpersist()
    return out


def sql_kmv_distinct(table: str, col: str, k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_distinct_report`."""

    def nib(pos: int) -> str:
        c = f"ascii(substring(hx, {pos}, 1))"
        return f"({c} - CASE WHEN {c} >= 97 THEN 87 ELSE 48 END)"

    # seed the fold as BIGINT: 8 nibbles reach 2^32-1, past INT32
    num = f"CAST({nib(1)} AS BIGINT)"
    for p in range(2, 9):
        num = f"({num} * 16 + {nib(p)})"
    return f"""
    WITH h AS (
      SELECT DISTINCT md5(CAST({col} AS VARCHAR)) AS hx
      FROM {table} WHERE {col} IS NOT NULL
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM h
    ), small AS (
      SELECT hx FROM h ORDER BY hx LIMIT {k}
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS kmv_k,
             MAX(CAST({num} AS DOUBLE)) AS kth_num
      FROM small
    ), est AS (
      SELECT t.n_exact, a.kmv_k,
             ROUND(CASE WHEN a.kmv_k < {k}
                        THEN CAST(a.kmv_k AS DOUBLE)
                        ELSE {float(k - 1)} / (GREATEST(a.kth_num, 1.0) / {float(1 << 32)})
                   END, 2) AS kmv_estimate
      FROM tot t CROSS JOIN agg a
    )
    SELECT n_exact, kmv_k, kmv_estimate,
           ROUND(ABS(kmv_estimate - n_exact) / n_exact, 4) AS rel_err
    FROM est
    """


def _fold8(hx):
    """First 8 nibbles of a lowercase-hex md5 column folded to a BIGINT
    in [0, 2^32) — the engine-portable 32-bit hash both DuckDB and Spark
    reproduce digit for digit (the kmv fold, factored for reuse; seeded
    long — 8 nibbles reach 2^32-1, past int32)."""

    def nib(pos: int):
        a = F.ascii(F.substring(hx, pos, 1))
        return (a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))).cast(
            "long"
        )

    num = nib(1)
    for p in range(2, 9):
        num = num * 16 + nib(p)
    return num


def _sql_fold8(hx: str) -> str:
    """DuckDB twin of :func:`_fold8` over hex expression ``hx``."""

    def nib(pos: int) -> str:
        c = f"ascii(substring({hx}, {pos}, 1))"
        return f"({c} - CASE WHEN {c} >= 97 THEN 87 ELSE 48 END)"

    num = f"CAST({nib(1)} AS BIGINT)"
    for p in range(2, 9):
        num = f"({num} * 16 + {nib(p)})"
    return num


def cm_sketch_portable_report(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    top_k: int = 20,
) -> DataFrame:
    """:func:`cm_sketch_report` with ENGINE-PORTABLE bucket hashes —
    ``fold8(md5(key ':' row)) % width`` instead of xxhash64 — so the
    whole sketch (bucket counters, probe minima, overcounts) is
    value-hash-checkable against a DuckDB oracle. Identical relational
    shape: explode(depth) + one map-side-combined groupBy to
    depth×width counter rows, mergeable by plain SUM; estimates are the
    per-key MIN across hash rows of the broadcast sketch. md5 costs
    more per row than xxhash64 — the xxhash64 original stays as the
    perf path; this twin certifies the algorithm.

    Returns (key, exact_n, cm_est, overcount), (exact_n DESC, key).
    """
    key = F.col(key_col).cast("string")
    rows = df.select(key.alias("k")).filter(F.col("k").isNotNull())

    def buckets(col):
        c = F.col(col) if isinstance(col, str) else col
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.pmod(
                        _fold8(F.md5(F.concat_ws(":", c, F.lit(i)))),
                        F.lit(width),
                    ).alias("b"),
                )
                for i in range(depth)
            ]
        )

    sketch = (
        rows.select(F.explode(buckets("k")).alias("hb"))
        .groupBy(F.col("hb.i").alias("i"), F.col("hb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact_top = (
        rows.groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "k")
        .limit(top_k)
    )
    probes = exact_top.select(
        "k", F.explode(buckets("k")).alias("hb")
    ).select("k", F.col("hb.i").alias("i"), F.col("hb.b").alias("b"))
    est = (
        probes.join(F.broadcast(sketch), ["i", "b"])
        .groupBy("k")
        .agg(F.min("c").alias("cm_est"))
    )
    return (
        exact_top.join(est, "k")
        .select(
            F.col("k").alias("key"),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cm_est").cast("long").alias("cm_est"),
            (F.col("cm_est") - F.col("exact_n"))
            .cast("long")
            .alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), "key")
    )


def sql_cm_sketch_portable(
    table: str,
    col: str,
    depth: int = 4,
    width: int = 256,
    top_k: int = 20,
) -> str:
    """DuckDB twin of :func:`cm_sketch_portable_report`."""
    def _bucket(key_expr: str, i_expr: str = "i") -> str:
        # Parameterized on the key/row-qualifier expressions (not a
        # textual rewrite of generated SQL) so a change to _sql_fold8's
        # shape can never silently miss the probe-side qualification.
        return (
            "("
            + _sql_fold8(f"md5({key_expr} || ':' || CAST({i_expr} AS VARCHAR))")
            + f") % {width}"
        )

    return f"""
    WITH rws AS (
      SELECT CAST({col} AS VARCHAR) AS k FROM {table}
      WHERE {col} IS NOT NULL
    ), hs AS (SELECT unnest(range({depth})) AS i),
    sk AS (
      SELECT i, {_bucket("k")} AS b, CAST(COUNT(*) AS BIGINT) AS c
      FROM rws, hs GROUP BY 1, 2
    ), exact_top AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM rws GROUP BY 1
      ORDER BY exact_n DESC, k LIMIT {top_k}
    ), probes AS (
      SELECT e.k, h.i, {_bucket("e.k", "h.i")} AS b
      FROM exact_top e, hs h
    ), est AS (
      SELECT p.k, MIN(s.c) AS cm_est
      FROM probes p JOIN sk s ON p.i = s.i AND p.b = s.b
      GROUP BY 1
    )
    SELECT e.k AS key, e.exact_n,
           CAST(est.cm_est AS BIGINT) AS cm_est,
           CAST(est.cm_est - e.exact_n AS BIGINT) AS overcount
    FROM exact_top e JOIN est ON e.k = est.k
    ORDER BY e.exact_n DESC, key
    """


def _hll_alpha(m: int) -> float:
    """Standard HLL bias constant α_m (Flajolet et al. 2007) for
    register count m ≥ 128 — embedded as the same Python-computed
    double literal in both engines (no query-time transcendentals)."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_portable_cert(
    df: DataFrame,
    group_col: str,
    key_col: str,
    p: int = 9,
) -> DataFrame:
    """Register-level certification of the HLL merge algebra with an
    ENGINE-PORTABLE hash — the certified twin of
    :func:`hll_merge_report`, whose DataSketches binaries no other
    engine can replay.

    The portable HLL is fully relational: h32 = fold8(md5(key)),
    bucket = h32 % m (low p bits), w = h32 // m (the remaining
    q = 32−p bits), register ρ = (leading zeros of w in q bits) + 1 via
    an integer threshold CASE — no floats anywhere in the registers.
    Three register sets are built: DIRECT (one pass), per-``group_col``
    shards, and their MAX-merge; max is associative, so
    merged ≡ direct is an ALGEBRAIC identity — n_regs_equal == n_regs
    is the merge certificate, and any engine/shuffle bug that breaks
    register mergeability flips it.

    The estimate avoids the classic float harmonic sum: Σ 2^{−ρ} over
    registers is a dyadic rational, so it rides the INTEGER
    s_int = Σ 2^{32−ρ} + (m − n_used)·2^32 exactly (max term 2^31·m ≪
    2^63), with the single double division α_m·m²·2^32 / s_int at the
    end — bit-identical cross-engine. Raw estimator only (no
    small/large-range correction) — this is an algebra certificate,
    not a production cardinality path; rel_err vs exact is emitted so
    the raw bias stays driver-visible.

    Returns one row: (m, n_regs_used, n_regs_equal, merge_exact,
    hll_est, exact, rel_err).
    """
    m = 1 << p
    key = F.col(key_col).cast("string")
    hashed = df.select(
        key.alias("s"), F.col(group_col).alias("g")
    ).filter(F.col("s").isNotNull())
    h32 = _fold8(F.md5("s"))
    q = 32 - p
    w = F.shiftright(h32, p)  # literal shift — the only kind F.shiftright takes

    def rho(wcol):
        expr = F.lit(q + 1)  # w == 0: all q bits zero
        for r in range(q, 0, -1):  # w >= 2^(q-r) → rho = r
            expr = F.when(wcol >= F.lit(1 << (q - r)), F.lit(r)).otherwise(
                expr
            )
        return expr

    base = hashed.select(
        "g", F.pmod(h32, F.lit(m)).alias("b"), rho(w).alias("r")
    ).localCheckpoint(eager=False)  # feeds direct + sharded registers
    direct = base.groupBy("b").agg(F.max("r").alias("rd"))
    merged = (
        base.groupBy("g", "b")
        .agg(F.max("r").alias("rs"))
        .groupBy("b")
        .agg(F.max("rs").alias("rm"))
    )
    regs = direct.join(merged, "b")
    pow_term = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.lit(32) - F.col("rm"))
    )
    stats = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_regs_used"),
        F.sum((F.col("rd") == F.col("rm")).cast("int"))
        .cast("long")
        .alias("n_regs_equal"),
        F.sum(pow_term).cast("long").alias("s_used"),
    )
    exact = hashed.agg(F.count_distinct("s").alias("exact"))
    alpha = _hll_alpha(m)
    est = (
        F.lit(alpha * m * m * float(1 << 32))
        / (
            F.col("s_used")
            + (F.lit(m) - F.col("n_regs_used")) * F.lit(1 << 32)
        ).cast("double")
    )
    return (
        stats.crossJoin(exact)  # two 1-row aggregates
        .select(
            F.lit(m).cast("long").alias("m"),
            "n_regs_used",
            "n_regs_equal",
            (F.col("n_regs_equal") == F.col("n_regs_used"))
            .cast("int")
            .alias("merge_exact"),
            F.round(est, 2).alias("hll_est"),
            F.col("exact").cast("long").alias("exact"),
            F.round(
                F.abs(est - F.col("exact")) / F.col("exact").cast("double"),
                4,
            ).alias("rel_err"),
        )
    )


def sql_hll_portable_cert(
    table: str, group_col: str, key_col: str, p: int = 9
) -> str:
    """DuckDB twin of :func:`hll_portable_cert`."""
    m = 1 << p
    q = 32 - p
    alpha = _hll_alpha(m)
    # the SAME Python-precomputed double numerator the Spark side embeds
    # (α·m²·2³²); CAST AS DOUBLE — a bare literal parses as DECIMAL in
    # DuckDB and its checked multiply overflows
    num = alpha * m * m * float(1 << 32)
    fold = _sql_fold8("md5(s)")
    rho = f"CASE WHEN w = 0 THEN {q + 1}"
    for r in range(1, q + 1):  # first match wins: largest threshold first
        rho += f" WHEN w >= {1 << (q - r)} THEN {r}"
    rho += " END"
    return f"""
    WITH hashed AS (
      SELECT CAST({key_col} AS VARCHAR) AS s, {group_col} AS g
      FROM {table} WHERE {key_col} IS NOT NULL
    ), hb AS (
      SELECT g, h32 % {m} AS b, (h32 // {m}) AS w
      FROM (SELECT g, {fold} AS h32 FROM hashed)
    ), base AS (
      SELECT g, b, {rho} AS r FROM hb
    ), direct AS (
      SELECT b, MAX(r) AS rd FROM base GROUP BY 1
    ), merged AS (
      SELECT b, MAX(rs) AS rm FROM (
        SELECT g, b, MAX(r) AS rs FROM base GROUP BY 1, 2
      ) GROUP BY 1
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_regs_used,
             CAST(SUM(CASE WHEN d.rd = mg.rm THEN 1 ELSE 0 END) AS BIGINT)
               AS n_regs_equal,
             CAST(SUM(CAST(1 AS BIGINT) << (32 - mg.rm)) AS BIGINT)
               AS s_used
      FROM direct d JOIN merged mg ON d.b = mg.b
    ), ex AS (
      SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS exact FROM hashed
    )
    SELECT CAST({m} AS BIGINT) AS m, n_regs_used, n_regs_equal,
           CAST(CASE WHEN n_regs_equal = n_regs_used THEN 1 ELSE 0 END
                AS INTEGER) AS merge_exact,
           ROUND(CAST({num!r} AS DOUBLE)
                 / CAST(s_used + ({m} - n_regs_used)
                        * CAST({1 << 32} AS BIGINT) AS DOUBLE), 2)
             AS hll_est,
           exact,
           ROUND(ABS(CAST({num!r} AS DOUBLE)
                     / CAST(s_used + ({m} - n_regs_used)
                            * CAST({1 << 32} AS BIGINT) AS DOUBLE)
                     - exact) / CAST(exact AS DOUBLE), 4) AS rel_err
    FROM stats, ex
    """
