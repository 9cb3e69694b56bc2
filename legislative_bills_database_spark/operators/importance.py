"""DSIR-style importance weighting for data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023 —
public literature): score every raw document by the log-likelihood ratio
of its hashed token features under a TARGET domain distribution vs the
RAW corpus distribution; resampling by these weights shifts the corpus
toward the target domain. This is the principled replacement for
keyword-filter data curation (the reference's term search,
legiscan_search_all_bills.R:88-93).

Feature hashing is a 256-bucket token hash built from the first two hex
nibbles of ``md5(token)`` — md5 exists verbatim in Spark AND DuckDB, so
the bucketing (and therefore every downstream probability) is
engine-portable and the whole operator value-hash-checks against the SQL
oracle. Collisions are part of the method (hashed n-gram features).

Scale shape: tokens explode to slim (doc_id, bucket) rows once; the
bucket histogram (256 rows, conditional target/raw sums in ONE pass)
broadcasts back; the per-doc weight is an exact-decimal sum so the
result is independent of partitioning and accumulation order. Two
shuffles total — (doc, bucket) count and the per-doc sum — both on
fixed-width keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.compat import exact_sum

N_BUCKETS = 256


def _nibble(c: Column) -> Column:
    """Hex char → 0..15, identical arithmetic in Spark and DuckDB."""
    a = F.ascii(c)
    return a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))


def token_bucket(tok: Column) -> Column:
    """Engine-portable 0..255 feature bucket from md5's first two nibbles."""
    h = F.md5(tok)
    return _nibble(F.substring(h, 1, 1)) * 16 + _nibble(F.substring(h, 2, 1))


def sql_token_bucket(tok_expr: str) -> str:
    def nib(pos: int) -> str:
        c = f"ascii(substring(md5({tok_expr}), {pos}, 1))"
        return f"({c} - CASE WHEN {c} >= 97 THEN 87 ELSE 48 END)"

    return f"({nib(1)} * 16 + {nib(2)})"


def dsir_weights(
    docs: DataFrame,
    target_sources: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    round_dp: int = 6,
) -> DataFrame:
    """Per-document DSIR log importance weight.

    weight(doc) = Σ_tokens ln(p_target[bucket] / p_raw[bucket]) with
    Laplace-smoothed bucket unigram distributions; the target
    distribution is estimated from rows whose ``source_col`` is in
    ``target_sources``, the raw distribution from the whole corpus.
    Positive → looks like the target domain.

    Returns (id_col, n_tokens, logweight) — logweight floor-rounded.
    """
    tb = docs.select(
        F.col(id_col),
        F.col(source_col).isin(*target_sources).alias("is_target"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select(
        id_col, "is_target", token_bucket(F.col("tok")).alias("b")
    )

    doc_b = tb.groupBy(id_col, "b").agg(F.count("*").alias("n"))

    hist = tb.groupBy("b").agg(
        F.sum(F.col("is_target").cast("bigint")).alias("ct"),
        F.count("*").alias("cr"),
    )
    totals = tb.agg(
        F.sum(F.col("is_target").cast("bigint")).alias("T"),
        F.count("*").alias("R"),
    )
    # ln(p_t/p_r) per bucket: smoothed counts; doubles built from exact
    # integers with one identical op sequence in both engines
    lr = F.log(
        (F.col("ct").cast("double") + 1.0)
        / (F.col("T").cast("double") + float(N_BUCKETS))
    ) - F.log(
        (F.col("cr").cast("double") + 1.0)
        / (F.col("R").cast("double") + float(N_BUCKETS))
    )
    bucket_lr = F.broadcast(
        hist.crossJoin(F.broadcast(totals)).select("b", lr.alias("lr"))
    )

    scale = float(10**round_dp)
    return (
        doc_b.join(bucket_lr, "b")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            (
                F.floor(
                    exact_sum(F.col("n").cast("double") * F.col("lr"))
                    * scale
                    + 0.5
                )
                / scale
            ).alias("logweight"),
        )
    )


def sql_dsir_weights(
    target_sources: tuple[str, ...], round_dp: int = 6
) -> str:
    """DuckDB twin of :func:`dsir_weights` over ``documents``."""
    from ..functions.compat import sql_exact_sum

    targets = ", ".join(f"'{s}'" for s in target_sources)
    scale = float(10**round_dp)
    return f"""
WITH tb AS (
  SELECT doc_id, source IN ({targets}) AS is_target,
         {sql_token_bucket("tok")} AS b
  FROM (SELECT doc_id, source,
               unnest(string_split(text, ' ')) AS tok FROM documents)
), doc_b AS (
  SELECT doc_id, b, count(*) AS n FROM tb GROUP BY doc_id, b
), hist AS (
  SELECT b, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
         count(*) AS cr
  FROM tb GROUP BY b
), totals AS (
  SELECT sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS T, count(*) AS R
  FROM tb
), bucket_lr AS (
  SELECT b,
         ln((CAST(ct AS DOUBLE) + 1.0) / (CAST(T AS DOUBLE) + {float(N_BUCKETS)!r}))
       - ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(R AS DOUBLE) + {float(N_BUCKETS)!r}))
           AS lr
  FROM hist CROSS JOIN totals
)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       floor({sql_exact_sum("CAST(n AS DOUBLE) * lr")} * {scale!r} + 0.5)
         / {scale!r} AS logweight
FROM doc_b JOIN bucket_lr USING (b)
GROUP BY doc_id
"""
