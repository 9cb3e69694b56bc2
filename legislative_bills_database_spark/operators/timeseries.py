"""Time-series regularization operators: calendar gap-fill with
forward-fill (LOCF) and exponentially-weighted moving averages.

The reference has no time-series surface (its "dates" are fiscal-year
strings, legiscan_main.R:228-231), but a metrics/training-data pipeline
over event streams needs a regular grid: ML feature tables want one row
per (key, day) even when no event landed that day, with the last
observation carried forward.

Scale posture:

- **gap-fill** generates the per-key calendar with ``sequence()`` +
  ``explode`` — the grid is produced *distributed, next to the data*
  (rows/key × days/key), never on the driver, and joins back on
  (key, day) — one shuffle. The LOCF pass is one window per key with
  ``last(..., ignorenulls=True)`` — a second shuffle-free pass over the
  same partitioning (Catalyst reuses the hash partitioning from the
  join for the window when keys match).
- **EWMA** is an inherently sequential recurrence (acc = (1-α)·acc +
  α·x), which a window function cannot express. Rather than a pandas
  UDF, each key's ordered values are gathered with ``collect_list`` and
  folded JVM-side with the ``aggregate`` higher-order function — one
  shuffle, whole-stage-codegen'd fold, no Python in the loop. Per-key
  history must fit in one array (fine for bounded keys like user
  sessions); **ewma_last_chunked** is the unbounded-history form — the
  affine recurrence composes associatively, so fixed-size chunks fold
  independently and reduce in chunk order, O(chunk + n/chunk) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an event stream to a dense per-key daily grid.

    Days between each key's first and last event with no observation get
    a row with ``daily_value`` NULL and ``filled_value`` carried forward
    from the most recent observed day (LOCF). The first day always has an
    observation by construction, so ``filled_value`` is never NULL.

    Returns (key, day, daily_value, filled_value, observed).
    """
    daily = (
        df.groupBy(key_col, F.to_date(ts_col).alias("day"))
        .agg(F.sum(value_col).alias("daily_value"))
    )
    # per-key calendar, generated executor-side: sequence() builds the
    # array of days inside the row, explode fans it out — no driver loop,
    # no cross join against a global calendar (which would shuffle every
    # key against every day)
    calendar = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            key_col,
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    grid = calendar.join(daily, [key_col, "day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.select(
        key_col,
        "day",
        "daily_value",
        F.last("daily_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("daily_value").isNotNull().alias("observed"),
    )


def rolling_time_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
) -> DataFrame:
    """Trailing event-time moving average per key: for every event, the
    mean (and count) of the key's values in the closed interval
    ``[ts - window_seconds, ts]``.

    This is a RANGE frame over ``unix_micros(ts)`` — microsecond-exact
    event time, not row counts, so bursts and gaps are handled correctly
    and timestamp peers get identical frames (deterministic regardless
    of peer order). One shuffle on the key, then a single sorted window
    pass; the frame is bounded by wall-clock span, not row count, so a
    hot key with 10⁹ events still streams through the frame with O(rows
    in window) state. Returns the input columns plus
    (rolling_avg, rolling_n).
    """
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return df.select(
        "*",
        F.round(F.avg(value_col).over(w), 4).alias("rolling_avg"),
        F.count("*").over(w).cast("long").alias("rolling_n"),
    )


def ewma_last(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Final EWMA value per key over the (ts, tiebreak)-ordered series.

    acc₀ = x₀; accᵢ = (1-α)·accᵢ₋₁ + α·xᵢ. The fold runs JVM-side via
    the ``aggregate`` higher-order function over the sorted per-key
    array — the recurrence a window frame can't express, without a
    pandas UDF. The (ts, tiebreak) sort key makes the fold order — and
    therefore the float result — deterministic even when timestamps tie.
    """
    beta = 1.0 - alpha
    gathered = (
        df.groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("ts"),
                        F.col(order_tiebreak).alias("tb"),
                        F.col(value_col).cast("double").alias("v"),
                    )
                )
            ).alias("series")
        )
    )
    vals = F.transform("series", lambda s: s["v"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(beta) + x * F.lit(alpha),
    )
    return gathered.select(
        key_col,
        F.size("series").alias("n_obs"),
        F.round(ewma, 4).alias("ewma"),
    )


def ewma_last_chunked(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    alpha: float = 0.3,
    chunk_size: int = 4096,
) -> DataFrame:
    """``ewma_last`` for UNBOUNDED per-key history: no full-series array.

    The recurrence acc ← β·acc + α·x is affine, and affine maps compose
    associatively: a whole segment of n values collapses to
    ``acc → β**n · acc + b`` where b is the segment's own fold from 0.
    So the series is chunked (row_number ÷ chunk_size), each chunk folds
    independently to its (m, b) transform, and the per-key reduction
    composes the ~n/chunk_size transforms in chunk order. Per-key memory
    drops from O(n) to O(chunk_size + n/chunk_size) — at 10⁹ events/key
    and the default chunk, two arrays of ≤4096 and ~244k entries instead
    of one 10⁹ array (recurse once more if even that is too wide).

    Chunk 0 seeds acc₀ = x₀ exactly like ``ewma_last``, so for n ≤
    chunk_size the fold is operation-for-operation identical; across
    chunks only float associativity differs (β**n via pow). Equality vs
    the sequential fold and pandas ewm(adjust=False) is pinned in
    tests/test_graph_timeseries.py, including a 100k-event single key.

    Returns (key, n_obs, ewma) — same schema as ``ewma_last``.
    """
    beta = 1.0 - alpha
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    rows = df.select(
        key_col,
        F.col(value_col).cast("double").alias("v"),
        (F.row_number().over(w) - 1).alias("rn"),
    ).withColumn("chunk", (F.col("rn") / F.lit(chunk_size)).cast("long"))
    chunks = rows.groupBy(key_col, "chunk").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rn").alias("rn"), F.col("v").alias("v")))
        ).alias("seg")
    )
    vals = F.transform("seg", lambda s: s["v"])
    n = F.size(vals)
    # segment as an affine transform acc → m·acc + b
    seg_m = F.pow(F.lit(beta), n.cast("double"))
    seg_b = F.aggregate(
        vals, F.lit(0.0), lambda acc, x: acc * F.lit(beta) + x * F.lit(alpha)
    )
    # chunk 0 instead folds directly from acc₀ = x₀ (the seed rule)
    seed_fold = F.aggregate(
        F.slice(vals, 2, F.greatest(n - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(beta) + x * F.lit(alpha),
    )
    summaries = chunks.select(
        key_col,
        "chunk",
        n.alias("n"),
        seg_m.alias("m"),
        F.when(F.col("chunk") == 0, seed_fold).otherwise(seg_b).alias("b"),
    )
    per_key = summaries.groupBy(key_col).agg(
        F.array_sort(F.collect_list(F.struct("chunk", "m", "b"))).alias("segs"),
        F.sum("n").alias("n_obs"),
    )
    first = F.element_at("segs", 1)
    rest = F.slice("segs", 2, F.greatest(F.size("segs") - 1, F.lit(0)))
    ewma = F.aggregate(
        rest, first["b"], lambda acc, s: acc * s["m"] + s["b"]
    )
    return per_key.select(
        key_col,
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(ewma, 4).alias("ewma"),
    )


def capped_runsum_chunked(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    delta_col: str = "delta",
    order_tiebreak: str = "event_id",
    chunk_size: int = 4096,
) -> DataFrame:
    """Floor-clamped running balance per key — acc ← max(acc + Δ, 0),
    acc₀ = 0 — without materializing any per-key series.

    The inventory/wallet recurrence ("stock can't go negative") is NOT a
    plain window sum: the clamp makes each step non-linear. But the step
    map a → max(a + s, m) is closed under composition —

        (s₂,m₂) ∘ (s₁,m₁) = (s₁+s₂, max(m₁+s₂, m₂))

    — so exactly like the affine EWMA maps (:func:`ewma_last_chunked`),
    fixed-size chunks fold independently to one (s, m) transform and the
    per-key reduction composes ~n/chunk transforms in chunk order:
    per-key memory O(chunk + n/chunk), not O(n). Deltas are INTEGER
    (cents), so every composition is exact 64-bit arithmetic — the
    chunked result is bit-identical to the sequential fold in ANY
    chunking, which the q_capped_runsum oracle (a genuinely sequential
    DuckDB list_reduce) proves driver-visibly.

    Returns (key, n_obs, final_balance); ``delta_col`` must be LONG.
    """
    neg_inf = -(1 << 62)
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    rows = df.select(
        key_col,
        F.col(delta_col).cast("long").alias("x"),
        (F.row_number().over(w) - 1).alias("rn"),
    ).withColumn("chunk", (F.col("rn") / F.lit(chunk_size)).cast("long"))
    chunks = rows.groupBy(key_col, "chunk").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rn").alias("rn"), F.col("x").alias("x")))
        ).alias("seg")
    )
    xs = F.transform("seg", lambda s: s["x"])
    ident = F.struct(
        F.lit(0).cast("long").alias("s"), F.lit(neg_inf).cast("long").alias("m")
    )
    # element x is the transform (s=x, m=0): acc → max(acc + x, 0)
    chunk_t = F.aggregate(
        xs,
        ident,
        lambda acc, x: F.struct(
            (acc["s"] + x).alias("s"),
            F.greatest(acc["m"] + x, F.lit(0).cast("long")).alias("m"),
        ),
    )
    summaries = chunks.select(
        key_col,
        "chunk",
        F.size(xs).alias("n"),
        chunk_t.alias("t"),
    )
    per_key = summaries.groupBy(key_col).agg(
        F.array_sort(F.collect_list(F.struct("chunk", "t"))).alias("segs"),
        F.sum("n").alias("n_obs"),
    )
    composed = F.aggregate(
        F.transform("segs", lambda s: s["t"]),
        ident,
        lambda acc, t: F.struct(
            (acc["s"] + t["s"]).alias("s"),
            F.greatest(acc["m"] + t["s"], t["m"]).alias("m"),
        ),
    )
    # apply the composed transform to a₀ = 0: max(0 + s, m)
    return per_key.select(
        key_col,
        F.col("n_obs").cast("long").alias("n_obs"),
        F.greatest(composed["s"], composed["m"]).alias("final_balance"),
    )


def holt_linear_chunked(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    alpha: float = 0.5,
    beta: float = 0.3,
    chunk_size: int = 4096,
    round_dp: int = 4,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per key —
    the MATRIX generalization of :func:`ewma_last_chunked`.

    The recurrence
        l' = α·x + (1−α)(l + b)
        b' = β(l' − l) + (1−β)·b
    is linear in the state (l, b): each observation x acts as the
    affine map  s → A·s + c·x  with constant 2×2 A. Affine maps compose
    associatively — (M₂,v₂)∘(M₁,v₁) = (M₂M₁, M₂v₁+v₂) — so exactly as
    in the scalar EWMA case, fixed-size chunks fold independently
    (chunk 0 folds straight from the seed state (x₁, 0); later chunks
    fold to one (M, v) transform) and the per-key reduction composes
    ~n/chunk transforms in chunk order: O(chunk + n/chunk) memory per
    key, no full-series array, ANY recurrence linear in its state gets
    the same treatment (Kalman filters and Fibonacci-style recurrences
    included — this operator is the template).

    Equality vs the genuinely sequential DuckDB struct list_reduce is
    the q_holt_trend oracle; cross-chunk float association differs only
    in the matrix products, absorbed by ``round_dp``.

    Returns (key, n_obs, level, trend, forecast_1 = level + trend).
    """
    a11 = 1.0 - alpha
    a12 = 1.0 - alpha
    a21 = -beta * alpha
    a22 = beta * (1.0 - alpha) + 1.0 - beta
    c1 = alpha
    c2 = beta * alpha

    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    rows = df.select(
        key_col,
        F.col(value_col).cast("double").alias("v"),
        (F.row_number().over(w) - 1).alias("rn"),
    ).withColumn("chunk", (F.col("rn") / F.lit(chunk_size)).cast("long"))
    chunks = rows.groupBy(key_col, "chunk").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rn").alias("rn"), F.col("v").alias("v")))
        ).alias("seg")
    )
    vals = F.transform("seg", lambda s: s["v"])
    n = F.size(vals)

    def compose_elem(acc, x):
        # transform-accumulator ∘ element: M' = A·M, v' = A·v + c·x
        return F.struct(
            (a11 * acc["m11"] + a12 * acc["m21"]).alias("m11"),
            (a11 * acc["m12"] + a12 * acc["m22"]).alias("m12"),
            (a21 * acc["m11"] + a22 * acc["m21"]).alias("m21"),
            (a21 * acc["m12"] + a22 * acc["m22"]).alias("m22"),
            (a11 * acc["v1"] + a12 * acc["v2"] + c1 * x).alias("v1"),
            (a21 * acc["v1"] + a22 * acc["v2"] + c2 * x).alias("v2"),
        )

    ident = F.struct(
        F.lit(1.0).alias("m11"),
        F.lit(0.0).alias("m12"),
        F.lit(0.0).alias("m21"),
        F.lit(1.0).alias("m22"),
        F.lit(0.0).alias("v1"),
        F.lit(0.0).alias("v2"),
    )
    chunk_t = F.aggregate(vals, ident, compose_elem)

    def step_state(acc, x):
        lp = c1 * x + a11 * (acc["l"] + acc["b"])
        return F.struct(
            lp.alias("l"),
            (beta * (lp - acc["l"]) + (1.0 - beta) * acc["b"]).alias("b"),
        )

    seed = F.struct(
        F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("b")
    )
    seed_state = F.aggregate(
        F.slice(vals, 2, F.greatest(n - 1, F.lit(0))), seed, step_state
    )
    summaries = chunks.select(
        key_col,
        "chunk",
        n.alias("n"),
        F.when(F.col("chunk") == 0, None).otherwise(chunk_t).alias("t"),
        F.when(F.col("chunk") == 0, seed_state).alias("s0"),
    )
    per_key = summaries.groupBy(key_col).agg(
        F.array_sort(F.collect_list(F.struct("chunk", "t", "s0"))).alias("segs"),
        F.sum("n").alias("n_obs"),
    )
    first = F.element_at("segs", 1)["s0"]
    rest = F.slice("segs", 2, F.greatest(F.size("segs") - 1, F.lit(0)))

    def apply_t(acc, seg):
        t = seg["t"]
        return F.struct(
            (t["m11"] * acc["l"] + t["m12"] * acc["b"] + t["v1"]).alias("l"),
            (t["m21"] * acc["l"] + t["m22"] * acc["b"] + t["v2"]).alias("b"),
        )

    final = F.aggregate(rest, first, apply_t)
    return per_key.select(
        key_col,
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(final["l"], round_dp).alias("level"),
        F.round(final["b"], round_dp).alias("trend"),
        F.round(final["l"] + final["b"], round_dp).alias("forecast_1"),
    )


def holt_winters_chunked(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.4,
    period: int = 4,
    chunk_size: int = 16,
    round_dp: int = 4,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) per key —
    the SEASONAL generalization of :func:`holt_linear_chunked`.

    The recurrence
        l' = α(x − s₋ₘ) + (1−α)(l + b)
        b' = β(l' − l) + (1−β)·b
        s' = γ(x − l') + (1−γ)·s₋ₘ
    is linear in the (m+2)-component state (l, b, s₀..s₋₁) once the
    seasonal buffer is part of the state vector: each observation x
    acts as the affine map  s → A·s + c·x  where A is a constant
    (m+2)×(m+2) matrix — the first two rows are Holt's level/trend
    update extended with a −α (resp. −βα) coefficient on the
    about-to-be-consumed seasonal slot, the middle rows are the
    seasonal buffer ROTATION (a shifted identity), and the last row
    writes the freshly updated seasonal. Affine maps compose
    associatively, so exactly as in the 2-state Holt case fixed-size
    chunks fold independently to one (M, v) transform (chunk 0 folds
    straight from the seed state) and the per-key reduction composes
    ~n/chunk transforms in chunk order: O(m² · (chunk + n/chunk))
    memory per key, no full-series array. M is carried as a flat
    row-major array<double> so the composition lambdas stay plain
    codegen arithmetic — no UDF anywhere.

    Seeding (both engines identically): l₀ = mean of the first m
    observations (left-associated sum / m), b₀ = 0, seasonal buffer
    sᵢ = xᵢ − l₀; the fold starts at observation m+1.

    Equality vs the genuinely sequential DuckDB recursive-CTE oracle
    (list-valued seasonal state) is the q_holt_winters driver gate;
    cross-chunk float association differs only in the matrix products,
    absorbed by ``round_dp``.

    Returns (key, n_obs, level, trend, s_next, forecast_1) where
    s_next is the next-to-use seasonal and forecast_1 = l + b + s_next.
    """
    assert chunk_size >= period, "chunk 0 must contain the seed window"
    d = period + 2
    # constant affine map: state ordering (l, b, s_next, ..., s_last)
    A = [[0.0] * d for _ in range(d)]
    c = [0.0] * d
    A[0][0] = A[0][1] = 1.0 - alpha
    A[0][2] = -alpha
    c[0] = alpha
    A[1][0] = -beta * alpha
    A[1][1] = beta * (1.0 - alpha) + (1.0 - beta)
    A[1][2] = -beta * alpha
    c[1] = beta * alpha
    for i in range(period - 1):  # buffer rotation
        A[2 + i][3 + i] = 1.0
    A[d - 1][0] = A[d - 1][1] = -gamma * (1.0 - alpha)
    A[d - 1][2] = gamma * alpha + (1.0 - gamma)
    c[d - 1] = gamma * (1.0 - alpha)

    def _lin(coeffs, getter, extra=None):
        """Σ_k coeffs[k]·getter(k) (+ extra), skipping zero terms."""
        acc = None
        for k, ck in enumerate(coeffs):
            if ck == 0.0:
                continue
            term = getter(k) if ck == 1.0 else F.lit(ck) * getter(k)
            acc = term if acc is None else acc + term
        if extra is not None:
            acc = extra if acc is None else acc + extra
        return acc if acc is not None else F.lit(0.0)

    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    rows = df.select(
        key_col,
        F.col(value_col).cast("double").alias("v"),
        (F.row_number().over(w) - 1).alias("rn"),
    ).withColumn("chunk", (F.col("rn") / F.lit(chunk_size)).cast("long"))
    chunks = rows.groupBy(key_col, "chunk").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rn").alias("rn"), F.col("v").alias("v")))
        ).alias("seg")
    )
    vals = F.transform("seg", lambda s: s["v"])
    n = F.size(vals)

    def compose_elem(acc, x):
        # (M, v) ∘ element x:  M' = A·M,  v' = A·v + c·x
        newm = F.array(
            *[
                _lin(
                    A[i],
                    lambda k, j=j: F.element_at(acc["m"], F.lit(k * d + j + 1)),
                )
                for i in range(d)
                for j in range(d)
            ]
        )
        newv = F.array(
            *[
                _lin(
                    A[i],
                    lambda k: F.element_at(acc["v"], F.lit(k + 1)),
                    extra=(F.lit(c[i]) * x) if c[i] != 0.0 else None,
                )
                for i in range(d)
            ]
        )
        return F.struct(newm.alias("m"), newv.alias("v"))

    ident = F.struct(
        F.array(
            *[
                F.lit(1.0 if i == j else 0.0)
                for i in range(d)
                for j in range(d)
            ]
        ).alias("m"),
        F.array(*[F.lit(0.0) for _ in range(d)]).alias("v"),
    )
    chunk_t = F.aggregate(vals, ident, compose_elem)

    # chunk 0: seed from the first `period` values, then fold the rest
    # sequentially on the (l, b, seasonal-array) state
    seed_sum = F.element_at(vals, 1)
    for i in range(2, period + 1):
        seed_sum = seed_sum + F.element_at(vals, i)
    seed_l = seed_sum / F.lit(float(period))

    def step_state(acc, x):
        s0 = F.element_at(acc["s"], 1)
        lp = F.lit(alpha) * (x - s0) + F.lit(1.0 - alpha) * (
            acc["l"] + acc["b"]
        )
        return F.struct(
            lp.alias("l"),
            (
                F.lit(beta) * (lp - acc["l"]) + F.lit(1.0 - beta) * acc["b"]
            ).alias("b"),
            F.concat(
                F.slice(acc["s"], 2, period - 1),
                F.array(F.lit(gamma) * (x - lp) + F.lit(1.0 - gamma) * s0),
            ).alias("s"),
        )

    seed = F.struct(
        seed_l.alias("l"),
        F.lit(0.0).alias("b"),
        F.transform(
            F.slice(vals, 1, period), lambda x: x - seed_l
        ).alias("s"),
    )
    seed_state = F.aggregate(
        F.slice(vals, period + 1, F.greatest(n - period, F.lit(0))),
        seed,
        step_state,
    )
    summaries = chunks.select(
        key_col,
        "chunk",
        n.alias("n"),
        F.when(F.col("chunk") == 0, None).otherwise(chunk_t).alias("t"),
        # the n >= period guard is load-bearing under ANSI mode: a key
        # shorter than the seed window would make element_at(vals, m)
        # THROW inside the seed fold (not return null) before the
        # per-key n_obs filter ever runs — CASE WHEN evaluates the
        # branch conditionally, so short keys skip the seed entirely
        F.when(
            (F.col("chunk") == 0) & (n >= period), seed_state
        ).alias("s0"),
    )
    per_key = (
        summaries.groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk", "t", "s0"))
            ).alias("segs"),
            F.sum("n").alias("n_obs"),
        )
        .filter(F.col("n_obs") >= period)
    )
    head = F.element_at("segs", 1)["s0"]
    first = F.concat(F.array(head["l"], head["b"]), head["s"])
    rest = F.slice("segs", 2, F.greatest(F.size("segs") - 1, F.lit(0)))

    def apply_t(acc, seg):
        # state' = M·state + v on the flat d-vector
        return F.array(
            *[
                _lin(
                    [1.0] * d,
                    lambda k, i=i: F.element_at(seg["t"]["m"], F.lit(i * d + k + 1))
                    * F.element_at(acc, k + 1),
                    extra=F.element_at(seg["t"]["v"], i + 1),
                )
                for i in range(d)
            ]
        )

    final = F.aggregate(rest, first, apply_t)
    lvl = F.element_at(final, 1)
    trd = F.element_at(final, 2)
    s_next = F.element_at(final, 3)
    return per_key.select(
        key_col,
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(lvl, round_dp).alias("level"),
        F.round(trd, round_dp).alias("trend"),
        F.round(s_next, round_dp).alias("s_next"),
        F.round(lvl + trd + s_next, round_dp).alias("forecast_1"),
    )
