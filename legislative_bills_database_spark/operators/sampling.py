"""Deterministic corpus sampling: stratified rates + target-mixture resampling.

Training-data pipelines constantly sample — downweight an over-represented
language, rebalance sources toward a target mixture, carve held-out slices.
At 100 TB the non-negotiables are (a) NO extra shuffle — sampling must be a
per-row filter that composes with scan pushdown, and (b) determinism — the
same row set on every run and every retry of a lost task, which rules out
``df.sample`` / ``rand()`` (per-task RNG, changes under re-execution and
partition re-planning).

Both operators therefore derive a uniform in [0,1) from a multiplicative
hash of the row id (Knuth 2654435761 mod 2^32): pure integer expression,
identical in Spark and DuckDB (which is what lets the oracle check the
exact row set), equidistributed for the sequential ids the fixtures use.
Production corpora with arbitrary string keys would swap in
``xxhash64(key) & mask`` — same shape, still one expression, no shuffle.

Generalizes the reference's fixed-fraction row filtering (session subsets
at legiscan_main.R:118-131) to per-stratum rates and target mixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / golden ratio, Knuth multiplicative hashing
M32 = 4294967296  # 2^32


def unit_hash(id_col: Column | str, seed: int = 0) -> Column:
    """Deterministic uniform in [0,1) from an integer id — bigint-exact
    ``((id * KNUTH + seed) % 2^32) / 2^32``, reproducible across engines,
    tasks, and retries (unlike ``rand()``)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        (c.cast("bigint") * F.lit(KNUTH) + F.lit(seed)) % F.lit(M32)
    ).cast("double") / F.lit(float(M32))


def sql_unit_hash(id_expr: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`unit_hash`."""
    return (
        f"(CAST((CAST({id_expr} AS BIGINT) * {KNUTH} + {seed}) % {M32}"
        f" AS DOUBLE) / {M32}.0)"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Keep each row with its stratum's probability — one deterministic
    per-row filter, zero shuffle, composes with column pruning.

    ``rates`` maps stratum value → keep probability; unlisted strata get
    ``default_rate``.
    """
    rate: Column = F.lit(float(default_rate))
    for value, r in rates.items():
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(
            rate
        )
    return df.filter(unit_hash(id_col, seed) < rate)


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    target_total: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Downsample toward a target mixture: stratum ``s`` keeps rate
    ``min(1, weights[s] * target_total / count[s])`` so the expected output
    composition matches ``weights`` at ~``target_total`` rows (strata too
    small for their target keep everything — rates cap at 1).

    Scale shape: per-stratum counts are ONE partial-aggregated shuffle
    whose output is stratum-cardinality (a handful of rows — bounded by
    the dimension, not the fact table), broadcast back onto the fact
    side; the sample itself is then a pure per-row filter. The fact table
    is scanned twice but never shuffled — at 100 TB you'd persist or
    reuse a catalog-level count instead of the first scan.
    """
    rate_when: Column = F.lit(None).cast("double")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    for value, w in weights.items():
        rate_when = F.when(
            F.col(strata_col) == value,
            F.least(
                F.lit(1.0), F.lit(float(w)) * F.lit(float(target_total)) / F.col("__n")
            ),
        ).otherwise(rate_when)
    rates = counts.select(
        strata_col, F.coalesce(rate_when, F.lit(0.0)).alias("__rate")
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(unit_hash(id_col, seed) < F.col("__rate"))
        .drop("__rate")
    )


def sql_mixture_rate(
    strata_expr: str, weights: dict[str, float], target_total: int
) -> str:
    """DuckDB twin of the per-stratum rate in :func:`mixture_sample`
    (``__n`` must be the stratum count column in scope)."""
    whens = " ".join(
        f"WHEN {strata_expr} = '{v}' THEN least(1.0, {float(w)!r} * {float(target_total)!r} / __n)"
        for v, w in weights.items()
    )
    return f"(COALESCE(CASE {whens} END, 0.0))"


def group_split(
    group_key: Column | str,
    splits: dict[str, float],
    seed: int = 0,
) -> Column:
    """Leakage-safe train/val/test assignment: the split is a function of
    the GROUP key (source, domain, cluster id), never the row, so near-
    duplicate or same-origin rows can't straddle splits and leak eval
    data into training. Returns a label Column to attach via ``select``/
    ``withColumn`` — zero shuffle, zero join.

    ``splits`` maps label → fraction (must sum to ≤ 1; any remainder
    falls into the last label). The group key must be numeric here (the
    cross-engine-reproducible multiplicative hash); for arbitrary string
    keys use ``F.xxhash64(key)`` as the input — same shape, engine-
    specific values.
    """
    u = unit_hash(group_key, seed)
    labels = list(splits)
    bounds: list[float] = []
    acc = 0.0
    for lab in labels[:-1]:
        acc += float(splits[lab])
        bounds.append(acc)
    expr = F.lit(labels[-1])
    for lab, hi in reversed(list(zip(labels[:-1], bounds))):
        expr = F.when(u < hi, F.lit(lab)).otherwise(expr)
    return expr


def sql_group_split(
    group_expr: str, splits: dict[str, float], seed: int = 0
) -> str:
    """DuckDB twin of :func:`group_split`."""
    u = sql_unit_hash(group_expr, seed)
    labels = list(splits)
    whens, acc = [], 0.0
    for lab in labels[:-1]:
        acc += float(splits[lab])
        whens.append(f"WHEN {u} < {acc!r} THEN '{lab}'")
    return f"(CASE {' '.join(whens)} ELSE '{labels[-1]}' END)"


def stratified_fixed_n(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_per_stratum: int,
    seed: int = 0,
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (or the whole stratum
    if smaller), chosen deterministically — rate-based sampling
    (``stratified_sample``) gives each stratum a *binomial* count, which
    a fixed-budget eval split can't tolerate.

    Selection order is ``((id + seed) * KNUTH mod 2^32, id)``: the seed
    shifts the input BEFORE the multiplicative scramble (appended after,
    as in ``unit_hash``, it would only offset every value by seed/2^32
    and leave the ORDER unchanged), so different seeds give genuinely
    different memberships while staying reproducible across engines,
    retries, and re-runs; the raw id is the total-order tie-break.

    Scale shape: one shuffle on the stratum + a per-stratum TOP-N window
    (row_number bounds state to the frame, not the stratum). Few huge
    strata skew the shuffle; the standard fix — pre-aggregate a salted
    per-salt top-N, then re-rank the #salts × N survivors — keeps the
    same contract and is noted here rather than implemented because the
    strata this feeds (eval splits, per-domain carve-outs) are
    many-and-moderate, not few-and-huge.
    """
    order_key = (
        (F.col(id_col).cast("bigint") + F.lit(seed)) * F.lit(KNUTH)
    ) % F.lit(M32)
    w = Window.partitionBy(stratum_col).orderBy(order_key, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def sql_stratified_fixed_n(
    table: str,
    stratum_expr: str,
    id_expr: str,
    n_per_stratum: int,
    cols: str,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`stratified_fixed_n` (returns ``cols``)."""
    u = f"((CAST({id_expr} AS BIGINT) + {seed}) * {KNUTH}) % {M32}"
    return f"""
    SELECT {cols} FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY {stratum_expr} ORDER BY {u}, {id_expr}
      ) AS __rk FROM {table}
    ) WHERE __rk <= {n_per_stratum}
    """


def weighted_sample_fixed_k(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """EXACTLY ``k`` rows sampled without replacement with probability
    proportional to weight — deterministic A-ES (Efraimidis–Spirakis,
    IPL 2006): each row draws a reproducible uniform u ∈ (0,1) and the
    k smallest keys ``−ln(u)/w`` win (equivalently the k largest
    u^(1/w) — exponential race with rate w).

    The uniform is the same seed-before-scramble multiplicative hash as
    ``stratified_fixed_n``, offset by +0.5 so u is strictly inside
    (0,1) — no ln(0) edge. Rows with weight ≤ 0 are excluded (they'd
    win never/always degenerately).

    Scale shape: zero shuffles before the selection — the key is a pure
    per-row expression — then ``orderBy(key, id).limit(k)`` plans
    TakeOrderedAndProject: every task keeps a k-row heap, the driver
    merges #partitions × k candidates; no global sort, no window over
    one partition. Selection is deterministic per (dataset, seed, k);
    the id tie-break pins the vanishing chance of equal keys. (ln is
    correct to ≤1 ulp in both engines, so the oracle's selected SET can
    differ only if two keys near the k-boundary collide within ~1e-16
    relative — vanishing, and fixed per dataset, verified at both gate
    SFs.)

    Returns (id, weight) for the k winners.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = (
        (F.col(id_col).cast("bigint") + F.lit(seed)) * F.lit(KNUTH)
    ) % F.lit(M32)
    u = (h.cast("double") + 0.5) / F.lit(float(M32))
    w = F.col(weight_col).cast("double")
    key = -F.log(u) / w
    return (
        df.filter(w > 0)
        .select(F.col(id_col).alias("id"), w.alias("weight"), key.alias("__k"))
        .orderBy("__k", "id")
        .limit(k)
        .select("id", "weight")
    )


def sql_weighted_sample_fixed_k(
    table: str, id_expr: str, weight_expr: str, k: int, seed: int = 0
) -> str:
    """DuckDB twin of :func:`weighted_sample_fixed_k`."""
    u = (
        f"((CAST(((CAST({id_expr} AS BIGINT) + {seed}) * {KNUTH}) % {M32}"
        f" AS DOUBLE) + 0.5) / {M32}.0)"
    )
    return f"""
    SELECT {id_expr} AS id, CAST({weight_expr} AS DOUBLE) AS weight
    FROM {table}
    WHERE CAST({weight_expr} AS DOUBLE) > 0
    ORDER BY -ln({u}) / CAST({weight_expr} AS DOUBLE), {id_expr}
    LIMIT {k}
    """


def token_budget_fill(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    quality_col: str,
    id_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
) -> DataFrame:
    """Fill each domain's EXACT token budget best-first: rows accumulate
    in (quality DESC, id) order until the running token total would
    exceed the domain's budget — the pretraining-mixture step after
    rate-based sampling gets you close ("give me the best 2B tokens of
    web, 1B of code"), deterministic and reproducible.

    Rate sampling (``mixture_sample``) hits a budget only in
    expectation; this hits it exactly (± one document), and takes the
    BEST documents rather than a random subset. One shuffle on the
    domain + a running-sum window over the same partitioning; the budget
    map enters as a literal CASE expression (dimension-sized, never a
    join). Rows whose cumulative total passes the line are cut; a
    document larger than its domain's remaining budget is skipped along
    with everything after it (contiguous prefix semantics — the oracle-
    matchable contract; bin-packing the tail is ``first_fit_pack``'s
    job, not a sampler's).

    Returns (id, domain, tokens, cum_tokens) for kept rows.
    """
    budget_expr: Column = F.lit(int(default_budget))
    for dom, b in budgets.items():
        budget_expr = (
            F.when(F.col(domain_col) == dom, F.lit(int(b))).otherwise(budget_expr)
        )
    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("__cum", F.sum(F.col(token_col)).over(w))
        .filter(F.col("__cum") <= budget_expr)
        .select(
            id_col,
            domain_col,
            F.col(token_col).cast("long").alias("tokens"),
            F.col("__cum").cast("long").alias("cum_tokens"),
        )
    )
