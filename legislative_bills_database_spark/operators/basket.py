"""Market-basket co-occurrence analysis: pairwise support and lift.

The relational twin of the text-side PMI scorer (operators/tfidf.
bigram_pmi): which items land in the same basket more often than
independence predicts. lift(a,b) = P(a,b) / (P(a)·P(b)) =
n_ab·N / (n_a·n_b) over N baskets — >1 means affinity, <1 repulsion.

Scale shape: the only quadratic step is the within-basket self-join,
keyed on the basket id — both sides co-partition on one shuffle and the
fan-out is k² for a k-item basket, bounded by basket size, never corpus
size. Pair counts partial-aggregate map-side; the support filter runs
BEFORE the per-item count joins so only surviving pairs shuffle again;
the basket total rides a 1-row broadcast. All counts are integers, so
lift = n_ab·N / (n_a·n_b) is exact up to 2⁵³ and the final
round-to-4 is cross-engine deterministic.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-key degree past which the exact pair self-join's d²/2 in-task
# fan-out stops being a sane default (2000² / 2 = 2M pair rows from ONE
# key's task). The Zipf-skewed sf1.0 bench pins the failure mode: hot
# degree ~9000 degrades the exact plans 4.9-5.1× while the capped
# siblings run sub-1× (BENCH_SF1_SKEW.json).
MAX_EXACT_DEGREE = 2000

# TOTAL predicted pair volume past which the exact self-join REFUSES to
# run (VERDICT r10 #5 — the cluster-safety interlock, not a warning):
# 2e9 pairs is ~10 minutes of pure pair traffic on a 32-core box and
# sits 5× above the worst measured certificate fixture (the Zipf sf1.0
# skew graph predicts 403M pairs and is the baseline the recall
# certificates are ABOUT, so it must stay runnable). A 100×-scale hot
# key (d ≈ 90k → 4e9 pairs from one key) trips the refusal instead of
# an OOM three stages later.
MAX_EXACT_PAIRS = 2_000_000_000


def predicted_self_pairs(
    edges: DataFrame, key_col: str
) -> tuple[int, int]:
    """(max per-key degree, Σ d(d−1)/2) — the exact output volume of an
    ordered self-join on ``key_col`` (q_join_fanout's estimate at
    self-join grain), from ONE slim count aggregate. The probe is
    trivially cheap next to the pair join it guards, and on the
    memoized/checkpointed edge frames the trio uses it reads the
    already-materialized blocks."""
    row = (
        edges.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__d"))
        .agg(
            F.max("__d").alias("m"),
            F.sum(F.col("__d") * (F.col("__d") - 1) / 2)
            .cast("long")
            .alias("p"),
        )
        .collect()[0]
    )
    return int(row["m"] or 0), int(row["p"] or 0)


def refuse_excess_fanout(
    edges: DataFrame,
    key_col: str,
    max_pairs: int | None,
    route_hint: str,
) -> int:
    """Pre-flight interlock for exact quadratic pair plans: estimate the
    self-join output volume and raise ``ValueError`` naming the capped
    sibling when it exceeds ``max_pairs``. Pass ``max_pairs=None`` to
    skip (callers that already bounded degrees upstream). Returns the
    predicted pair count so call sites can log it."""
    if max_pairs is None:
        return -1
    _, pairs = predicted_self_pairs(edges, key_col)
    if pairs > max_pairs:
        raise ValueError(
            f"exact pair self-join REFUSED: predicted Σd(d-1)/2 = "
            f"{pairs:,} pairs on key '{key_col}' exceeds max_pairs="
            f"{max_pairs:,}. At this volume the exact plan is the "
            f"measured scale-killer (BENCH_SF1_SKEW.json: 4.9-6.0× "
            f"under a hot key at 403M predicted pairs). Use the "
            f"certified capped route instead: {route_hint}; or pass "
            f"max_pairs=None to force the exact plan deliberately."
        )
    return pairs


def basket_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
) -> DataFrame:
    """(item_a, item_b, n_ab, lift) for item pairs co-occurring in at
    least ``min_support`` baskets; item_a < item_b canonical."""
    items = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    n_baskets = items.agg(F.count_distinct("b").alias("nb"))
    item_counts = items.groupBy("i").agg(F.count("*").alias("ni"))
    a = items.select("b", F.col("i").alias("item_a"))
    c = items.select("b", F.col("i").alias("item_b"))
    pairs = (
        a.join(c, "b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    ia = item_counts.select(
        F.col("i").alias("item_a"), F.col("ni").alias("n_a")
    )
    ib = item_counts.select(
        F.col("i").alias("item_b"), F.col("ni").alias("n_b")
    )
    return (
        pairs.join(ia, "item_a")
        .join(ib, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                (F.col("n_ab") * F.col("nb")).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


def sql_basket_lift(
    table: str, basket_expr: str, item_expr: str, min_support: int = 3
) -> str:
    """DuckDB twin of :func:`basket_lift`."""
    return f"""
    WITH items AS (
      SELECT DISTINCT {basket_expr} AS b, {item_expr} AS i FROM {table}
    ), nb AS (SELECT COUNT(DISTINCT b) AS nb FROM items),
    ic AS (SELECT i, COUNT(*) AS ni FROM items GROUP BY 1),
    p AS (
      SELECT a.i AS item_a, c.i AS item_b, COUNT(*) AS n_ab
      FROM items a JOIN items c ON a.b = c.b AND a.i < c.i
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, CAST(n_ab AS BIGINT) AS n_ab,
           ROUND(CAST(n_ab * nb.nb AS DOUBLE) / (ia.ni * ib.ni), 4) AS lift
    FROM p
    JOIN ic ia ON p.item_a = ia.i
    JOIN ic ib ON p.item_b = ib.i, nb
    WHERE n_ab >= {min_support}
    """


def cooccurrence_pairs(
    edges: DataFrame,
    key_col: str,
    item_col: str,
    max_degree: int | None = MAX_EXACT_DEGREE,
    strict: bool = False,
    max_pairs: int | None = MAX_EXACT_PAIRS,
) -> DataFrame:
    """Ordered item co-occurrence counts (i1 < i2) per shared key.

    Physical form: key-equality SELF-JOIN of the slim (key, item) edge
    list with an i1 < i2 predicate, then a counted groupBy. The pair
    rows the join emits are partial-aggregated MAP-SIDE before the only
    pair exchange, so the shuffle carries |distinct pairs| counts, not
    the quadratic-in-degree raw pairs — the join's sort-merge pair
    generation lives fully inside codegen.

    Measured negative result (sf0.1, 587k edges, avg degree 39): the
    "zero-join" alternative — collect_set per key + nested higher-order
    transform() generating ordered pairs in-row + explode — ran 10.9 s
    vs 3.9 s for this join form. Generate + per-element struct
    construction through the non-codegen higher-order-function path
    costs far more than the SMJ pair merge; map-side combine equalizes
    the shuffle either way, so the join wins. (Same conclusion as the
    MinHash explode+groupBy-vs-transform measurement in dedup.py.)

    Skew note: a hot key with degree d still yields d²/2 in-task pair
    rows under either form; cap hot keys upstream (sample their
    incident edges) exactly as hot shingles are capped in the MinHash
    band join.

    Measured negative result (r6, sf0.1, 587k edges, avg degree 39,
    1000 items → the 499.5k-pair space is fully dense): a per-key
    top-N edge cap before pairing (row_number over hash(item)) runs
    the q_graph_jaccard top-100 1.8× faster at N=30 and 3.4× at N=20 —
    but only 24/100 (N=30) resp. 15/100 (N=20) of the exact top-100
    jaccard pairs survive, because n_shared shrinks per-pair while the
    uncapped degrees don't, reshuffling the entire ranking. The cap is
    therefore NOT applied anywhere an exact top-k is the contract; it
    remains the right guard for genuinely skewed keys (hot-customer
    d²/2 blowup) where approximate neighborhoods are acceptable and
    the threshold is documented at the call site.

    Hot-key guard (``max_degree``, default :data:`MAX_EXACT_DEGREE`):
    before building the quadratic self-join this probes the max per-key
    degree with one slim aggregate (groupBy key → count → max; trivially
    cheap next to the pair join it guards). Past the threshold the exact
    plan is the named scale-killer from BENCH_SF1_SKEW — the guard then
    raises ``ValueError`` when ``strict=True`` and otherwise emits a
    ``UserWarning`` naming the capped route (:func:`degree_capped_edges`
    + the certified q_graph_jaccard_approx / q_item_cf_recs_approx
    siblings and their recall certificates), so running the exact plan
    on a skewed graph is an explicit, logged decision, never a silent
    one. ``max_degree=None`` skips the probe for callers that already
    bounded degrees upstream (e.g. the approx twins, whose input IS the
    capped subgraph).

    Volume interlock (``max_pairs``, default :data:`MAX_EXACT_PAIRS`,
    VERDICT r10 #5): the same probe also predicts the TOTAL pair output
    Σ d(d−1)/2 and REFUSES (ValueError, not a warning) past the bound —
    the hot-degree warning catches one pathological key, this catches a
    graph whose whole degree distribution makes the exact join
    cluster-hostile. ``max_pairs=None`` forces the exact plan.

    Returns (i1, i2, n_shared).
    """
    if max_degree is not None or max_pairs is not None:
        dmax, pairs = predicted_self_pairs(edges, key_col)
        if max_pairs is not None and pairs > max_pairs:
            # the VOLUME interlock always refuses — unlike the degree
            # warning below, a predicted-output blowup is never a
            # proceed-by-default situation (VERDICT r10 #5)
            raise ValueError(
                f"cooccurrence_pairs REFUSED: predicted Σd(d-1)/2 = "
                f"{pairs:,} pairs on key '{key_col}' exceeds max_pairs="
                f"{max_pairs:,}. Use degree_capped_edges() — the "
                f"certified approx route (q_graph_jaccard_approx / "
                f"q_item_cf_recs_approx, recall-certified by "
                f"q_graph_jaccard_recall / q_item_cf_recall) — or pass "
                f"max_pairs=None to force the exact plan deliberately."
            )
        if max_degree is not None and dmax > max_degree:
            msg = (
                f"cooccurrence_pairs: max per-{key_col} degree {dmax} exceeds "
                f"max_degree={max_degree}; the exact pair self-join pays "
                f"d²/2 in-task fan-out per hot key (measured 4.9-5.1× "
                f"degradation under Zipf skew, BENCH_SF1_SKEW.json). Cap hot "
                f"keys with degree_capped_edges() — the certified approx "
                f"route (q_graph_jaccard_approx / q_item_cf_recs_approx, "
                f"recall-certified by q_graph_jaccard_recall / "
                f"q_item_cf_recall) — or pass max_degree=None/strict=False "
                f"to proceed exactly."
            )
            if strict:
                raise ValueError(msg)
            warnings.warn(msg, UserWarning, stacklevel=2)
    e = edges.select(F.col(key_col).alias("k"), F.col(item_col).alias("i"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k")) & (F.col("a.i") < F.col("b.i")),
        )
        .groupBy(F.col("a.i").alias("i1"), F.col("b.i").alias("i2"))
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def cooccurrence_triples(
    edges: DataFrame, key_col: str, item_col: str
) -> DataFrame:
    """Ordered item triple counts (i1 < i2 < i3) per shared key — the
    3-itemset analog of :func:`cooccurrence_pairs`, same physical
    reasoning (two key-co-partitioned self-joins, one shared key
    shuffle, map-side-combined support counts; the in-row
    higher-order-function variant measured no faster even at avg
    basket degree 3.8).

    Returns (i1, i2, i3, support).
    """
    e = edges.select(F.col(key_col).alias("k"), F.col(item_col).alias("i"))
    a, b, c = e.alias("a"), e.alias("b"), e.alias("c")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k")) & (F.col("a.i") < F.col("b.i")),
        )
        .join(
            c,
            (F.col("b.k") == F.col("c.k")) & (F.col("b.i") < F.col("c.i")),
        )
        .groupBy(
            F.col("a.i").alias("i1"),
            F.col("b.i").alias("i2"),
            F.col("c.i").alias("i3"),
        )
        .agg(F.count("*").cast("long").alias("support"))
    )


def degree_capped_edges(
    edges: DataFrame, key_col: str, item_col: str, cap: int
) -> DataFrame:
    """Deterministic per-key degree cap: keep at most ``cap`` incident
    edges per key, chosen by md5(key:item) rank — the hot-key guard for
    any downstream per-key-quadratic operator (cooccurrence_pairs' d²/2
    in-task pair fan-out, the scale-killer on skewed keys at 100×).

    md5 of the ``key:item`` string is a PORTABLE pseudo-random order
    (identical hex in Spark and DuckDB, unlike xxhash64/rand()), so the
    sampled subgraph — and everything computed on it — is bit-identical
    cross-engine and oracle-checkable: the approximation is in the
    GRAPH, not in the engine. The rank is a per-key window sort:
    O(d log d) per key, never d² — a hot key costs one big sort task,
    not a quadratic pair blowup.

    Items surviving the cap are an unbiased uniform sample of the key's
    incident edges (md5 order is independent of item identity), so
    per-key neighborhoods shrink proportionally and similarity measures
    computed WITHIN the capped graph (degrees AND intersections from
    the same sample) remain consistent estimates — cap only the
    intersections while keeping exact degrees and the ranking collapses
    (measured: 24/100 top-jaccard survival, see the negative result at
    :func:`cooccurrence_pairs`).
    """
    from pyspark.sql import Window

    h = F.md5(
        F.concat_ws(
            ":",
            F.col(key_col).cast("string"),
            F.col(item_col).cast("string"),
        )
    )
    w = Window.partitionBy(key_col).orderBy(h.asc(), F.col(item_col).asc())
    return (
        edges.withColumn("__dc_rk", F.row_number().over(w))
        .filter(F.col("__dc_rk") <= cap)
        .drop("__dc_rk")
    )
