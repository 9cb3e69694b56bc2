"""BM25 relevance scoring over a document corpus — distributed, no UDFs.

The retrieval/quality-weighting primitive a training-data pipeline uses to
score documents against seed queries (data selection, domain filtering).
Generalizes the reference's boolean multi-term OR search
(legiscan_search_all_bills.R:88-93) to ranked retrieval.

Scale shape: corpus statistics (N, avgdl, per-term document frequencies)
are ONE partial-aggregated pass producing a single row, broadcast back
onto the fact side; per-document scores are then a pure expression tree
(whole-stage codegen), and top-k is TakeOrderedAndProject — no global
sort materialization, no shuffle of the fact table at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k documents by BM25 score against ``terms``.

    idf_t = ln(1 + (N - df_t + 0.5)/(df_t + 0.5)) (Robertson-Sparck Jones
    with the +1 floor, never negative); score = Σ_t idf_t · tf·(k1+1) /
    (tf + k1·(1 - b + b·dl/avgdl)). Scores are floor-rounded
    (``floor(x·10^dp + 0.5)/10^dp`` — identical IEEE sequence in Spark
    and DuckDB, unlike their ROUNDs) and ties break on ``id_col`` so the
    top-k set is deterministic and oracle-checkable.
    """
    tok = tokens(F.col(text_col))
    dl = F.size(tok).alias("dl")
    base = docs.select(F.col(id_col), tok.alias("__tok"), dl)

    stat_aggs = [
        F.count("*").cast("double").alias("N"),
        F.avg("dl").alias("avgdl"),
    ] + [
        F.sum(F.array_contains("__tok", t).cast("int"))
        .cast("double")
        .alias(f"df_{i}")
        for i, t in enumerate(terms)
    ]
    stats = base.agg(*stat_aggs)  # one row; broadcast nested-loop join below

    scored = base.crossJoin(F.broadcast(stats))

    def _tf(term: str):
        # single-arg lambda on purpose: a 2-arg lambda would be called by
        # F.filter as (element, index) and the closure default clobbered
        return F.size(F.filter("__tok", lambda x: x == F.lit(term))).cast(
            "double"
        )

    score = None
    for i, t in enumerate(terms):
        tf = _tf(t)
        idf = F.log(
            1.0
            + (F.col("N") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        part = idf * (
            tf
            * (k1 + 1.0)
            / (
                tf
                + k1
                * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
        score = part if score is None else score + part
    scale = float(10**round_dp)
    rounded = F.floor(score * scale + 0.5) / scale
    return (
        scored.select(F.col(id_col), rounded.alias("score"))
        .filter(F.col("score") > 0.0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def sql_bm25_topk(
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of :func:`bm25_topk` over the ``documents`` view."""
    tok = "string_split(text, ' ')"
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN list_contains({tok}, '{t}') THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i, t in enumerate(terms)
    )
    parts = []
    for i, t in enumerate(terms):
        tf = f"CAST(len(list_filter({tok}, x -> x = '{t}')) AS DOUBLE)"
        idf = f"ln(1.0 + (s.N - s.df_{i} + 0.5) / (s.df_{i} + 0.5))"
        parts.append(
            f"({idf} * ({tf} * ({k1!r} + 1.0) / ({tf} + {k1!r} *"
            f" (1.0 - {b!r} + {b!r} * CAST(len({tok}) AS DOUBLE) / s.avgdl))))"
        )
    score = " + ".join(parts)
    scale = float(10**round_dp)
    return f"""
WITH s AS (
  SELECT CAST(count(*) AS DOUBLE) AS N,
         avg(len({tok})) AS avgdl,
         {df_cols}
  FROM documents
)
SELECT doc_id, floor(({score}) * {scale!r} + 0.5) / {scale!r} AS score
FROM documents, s
WHERE floor(({score}) * {scale!r} + 0.5) / {scale!r} > 0.0
ORDER BY score DESC, doc_id
LIMIT {k}
"""
