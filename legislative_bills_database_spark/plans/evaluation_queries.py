"""Round-6 phase-34 queries: model/corpus evaluation metrics.

The training-data pipeline's closing loop: once data is curated and a
model (or retrieval system, or quality classifier) is trained on it,
the SAME engine scores the evaluation — exact ROC AUC for the quality
classifier, calibration bins for its probability estimates, the Lorenz
curve behind the q_gini inequality scalar, tokenizer fertility for the
q_bpe_vocab tokenizer choice, and the hash-certified dominant principal
direction of the embedding corpus (the anisotropy diagnostic).

Reference parity note: the reference (patrick95350/legislative-bills-
database, 737-line R scripts) has no evaluation surface — this module
belongs to the training-pipeline superset SURVEY.md §2 mandates
alongside dedup/ANN/text analysis.

Engine-parity notes carried from earlier phases: oracle SUMs over
integers are CAST AS BIGINT before output (DuckDB HUGEINT → pandas
float64 mismatch), integer division is ``//`` in DuckDB / ``div`` in
Spark with explicit parens, denominators carry GREATEST guards (the
KMV precedent), and the PCA power sweep follows the q_pagerank_exact
fixed-point discipline (quantized BIGINT arithmetic — floating-point
matvecs can never hash-match across engines).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..io import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Exact ROC AUC (Mann-Whitney, tie-aware)
# ---------------------------------------------------------------------------


@query(
    "q_auc",
    """
    WITH s AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders WHERE o_totalprice IS NOT NULL
    ), pv AS (
      SELECT v, SUM(y) AS p_n, SUM(1 - y) AS q_n FROM s GROUP BY v
    ), r AS (
      SELECT p_n, q_n,
             COALESCE(SUM(q_n) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS qb
      FROM pv
    ), t AS (
      SELECT CAST(SUM(p_n) AS BIGINT) AS np,
             CAST(SUM(q_n) AS BIGINT) AS nq
      FROM pv
    )
    SELECT t.np AS n_pos, t.nq AS n_neg,
           ROUND(CAST(SUM(2 * qb * p_n + p_n * q_n) AS DOUBLE)
                 / (2.0 * GREATEST(t.np * t.nq, 1)), 6) AS auc
    FROM r, t GROUP BY t.np, t.nq
    """,
)
def q_auc(spark, sf_dir):
    """Exact tie-aware ROC AUC of 'is the order urgent?' scored by order
    total — the rank statistic every trained quality/relevance
    classifier is graded with. The oracle's running negative count is a
    one-task global window; the Spark side is operators/stats.auc_exact:
    per-score pre-aggregation + the prefix-offset distributed running
    sum (the ks_statistic machinery), so no unpartitioned window ever
    runs. All-integer numerator, single IEEE division — the driver
    hash-checks the EXACT statistic."""
    from ..operators.stats import auc_exact

    orders = load_table(spark, sf_dir, "orders")
    scored = orders.select(
        "o_totalprice",
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    return auc_exact(scored, "o_totalprice", "y")


# ---------------------------------------------------------------------------
# Calibration bins (reliability diagram input)
# ---------------------------------------------------------------------------


@query(
    "q_calibration_bins",
    """
    WITH s AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS sc,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ), mm AS (
      SELECT MIN(sc) AS mn, MAX(sc) AS mx FROM s
    )
    SELECT CAST(((sc - mm.mn) * 10) // (mm.mx - mm.mn + 1) AS INTEGER)
             AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(y) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS event_rate,
           ROUND(CAST(SUM(sc) AS DOUBLE) / (100.0 * COUNT(*)), 2)
             AS avg_price
    FROM s, mm GROUP BY 1
    """,
)
def q_calibration_bins(spark, sf_dir):
    """Reliability-diagram input: equal-WIDTH score bins (per-bin count,
    event rate, mean score). Value-based binning on purpose — ntile/
    quantile bins need a global sort, while fixed-width bins are one
    broadcast (min, max) pair plus a map-side integer bin id, the shape
    that survives 100 TB. Bin edges, counts, and the exact integer cent
    sums are engine-exact; the two divisions are single IEEE ops."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    mm = s.agg(F.min("sc").alias("mn"), F.max("sc").alias("mx"))
    return (
        s.join(F.broadcast(mm))  # 1-row broadcast: the allowed BNLJ shape
        .select(
            F.expr("CAST(((sc - mn) * 10) div (mx - mn + 1) AS INT)")
            .alias("bin"),
            "sc",
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("y").cast("long").alias("n_events"),
            F.round(F.sum("y").cast("double") / F.count("*"), 6).alias(
                "event_rate"
            ),
            F.round(
                F.sum("sc").cast("double") / (100.0 * F.count("*")), 2
            ).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# Lorenz curve (the decile detail behind the q_gini scalar)
# ---------------------------------------------------------------------------


@query(
    "q_lorenz_curve",
    """
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS x
      FROM orders GROUP BY 1
    ), rk AS (
      SELECT x,
             ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS rn,
             COUNT(*) OVER () AS n
      FROM spend
    ), d AS (
      SELECT CAST(((rn - 1) * 10) // n AS INTEGER) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             SUM(x) AS sx
      FROM rk GROUP BY 1
    ), t AS (
      SELECT CAST(SUM(sx) AS DOUBLE) AS tot FROM d
    )
    SELECT decile, n_customers,
           ROUND(CAST(SUM(sx) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / t.tot, 6) AS cum_share
    FROM d, t
    """,
)
def q_lorenz_curve(spark, sf_dir):
    """Lorenz curve points (cumulative spend share per customer decile)
    — the curve q_gini integrates. The global customer rank reuses
    operators/ordering.global_sort_index (range sort + O(#partitions)
    offsets — no one-task window over customers); the only ordered
    window left runs over the TEN decile rows. Spend sums are exact
    decimal, so decile membership and the cumulative shares hash-match
    cross-engine."""
    from ..functions.compat import _DEC
    from ..operators.ordering import global_sort_index

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("x")
    )
    n1 = spend.agg(F.count("*").cast("long").alias("n"))
    ranked = (
        global_sort_index(
            spend, [F.col("x"), F.col("o_custkey")], index_col="i"
        )
        .join(F.broadcast(n1))  # 1-row broadcast: the allowed BNLJ shape
        .select(
            F.expr("CAST((i * 10) div n AS INT)").alias("decile"), "x"
        )
    )
    d = ranked.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("x").alias("sx"),
    )
    # both windows run over the TEN decile rows — the one place a global
    # window is genuinely bounded; the grand total rides the unbounded
    # frame instead of a second 1-row join (keeps the plan at one
    # nested-loop join, the n1 broadcast)
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return d.select(
        "decile",
        "n_customers",
        F.round(
            F.sum("sx").over(w).cast("double")
            / F.sum("sx").over(w_all).cast("double"),
            6,
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility (subword economics per language)
# ---------------------------------------------------------------------------


@query(
    "q_tokenizer_fertility",
    f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
           CAST(SUM(len(regexp_extract_all(lower(text), '{T.TOKEN_REGEX}')))
             AS BIGINT) AS n_subtokens,
           CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
           ROUND(CAST(SUM(len(regexp_extract_all(lower(text),
                                                 '{T.TOKEN_REGEX}')))
                   AS DOUBLE)
                 / SUM(len(string_split(text, ' '))), 6) AS fertility,
           ROUND(CAST(SUM(strlen(text)) AS DOUBLE)
                 / SUM(len(regexp_extract_all(lower(text),
                                              '{T.TOKEN_REGEX}'))), 6)
             AS bytes_per_subtoken
    FROM documents GROUP BY lang
    """,
)
def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility audit per language: subword-per-word ratio
    and bytes-per-subword under the q_token_count regex lexer — the
    numbers that decide whether a tokenizer under-serves a language
    (fertility >> 1 → more sequence length per sentence → less
    effective context). Pure JVM expression trees over one map-side-
    combined aggregation; integer token/byte sums with single IEEE
    divisions keep it hash-exact."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.sum(F.size(T.tokens("text")))
    subtok = F.sum(F.size(T.bpe_ish_tokens("text")))
    nbytes = F.sum(F.octet_length("text"))
    return docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        words.cast("long").alias("n_words"),
        subtok.cast("long").alias("n_subtokens"),
        nbytes.cast("long").alias("n_bytes"),
        F.round(subtok.cast("double") / words, 6).alias("fertility"),
        F.round(nbytes.cast("double") / subtok, 6).alias(
            "bytes_per_subtoken"
        ),
    )


# ---------------------------------------------------------------------------
# Hash-certified dominant principal direction (fixed-point power sweeps)
# ---------------------------------------------------------------------------

_PCA_DIM = 64
_PCA_ROUNDS = 6


def _sql_pca(rounds: int) -> str:
    steps = []
    for k in range(1, rounds + 1):
        steps.append(f"""
    raw{k} AS (
      SELECT g.i AS i, SUM(g.s * r.v) AS raw
      FROM gram g JOIN r{k - 1} r ON r.i = g.j GROUP BY 1
    ),
    m{k} AS (SELECT GREATEST(MAX(ABS(raw)), 1) AS m FROM raw{k}),
    r{k} AS (
      SELECT i,
             CAST(CASE WHEN raw < 0
                  THEN -((CAST(-raw AS HUGEINT) * 1000000) // m)
                  ELSE (CAST(raw AS HUGEINT) * 1000000) // m
             END AS BIGINT) AS v
      FROM raw{k}, m{k}
    )""")
    return f"""
    WITH ex AS (
      SELECT vec_id,
             unnest(generate_series(1, len(embedding))) - 1 AS i,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000)
               AS BIGINT) AS e
      FROM embeddings
    ),
    gram AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.e * b.e) AS BIGINT) AS s
      FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2
    ),
    r0 AS (
      SELECT i, CAST(1000000 AS BIGINT) AS v FROM range(0, {_PCA_DIM}) t(i)
    ),
    {",".join(steps)}
    SELECT CAST(i AS INTEGER) AS dim, v AS comp_fp,
           CAST(v AS DOUBLE) / 1000000 AS loading
    FROM r{rounds}
    """


@query("q_pca_power", _sql_pca(_PCA_ROUNDS))
def q_pca_power(spark, sf_dir):
    """Dominant principal direction of the embedding corpus by SIX
    fixed-point power sweeps over the quantized d×d Gram matrix,
    hash-certified against a chained-HUGEINT-CTE oracle (the
    q_pagerank_exact discipline applied to linear algebra). The only
    data-sized job is the Gram pass — operators/pca.gram_matrix_fp, an
    Arrow-batched per-partition partial outer-product aggregate whose
    shuffle carries d² rows per partition, never the 4096×-exploded
    pair stream. The iteration itself is O(d²) driver state (4 096
    entries — the ivf.py bounded-fit precedent) on arbitrary-precision
    ints, mirrored term-for-term by the oracle."""
    from ..operators.pca import SCALE, gram_matrix_fp, power_iteration_fp

    emb = load_table(spark, sf_dir, "embeddings")
    gram = gram_matrix_fp(emb, "embedding", dim=_PCA_DIM)
    rows = [
        (int(r["i"]), int(r["j"]), int(r["s"])) for r in gram.collect()
    ]  # bounded: d² = 4096 entries, never data-sized
    comps = power_iteration_fp(rows, _PCA_DIM, _PCA_ROUNDS)
    return spark.createDataFrame(
        [(i, c, c / SCALE) for i, c in comps],
        "dim int, comp_fp long, loading double",
    )
