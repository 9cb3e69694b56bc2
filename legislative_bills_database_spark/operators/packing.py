"""Sequence packing: lay tokenized documents into fixed-length training rows.

The last mile of an LLM pretraining pipeline: documents become
fixed-length token sequences. Two standard layouts, two operators:

- :func:`pack_chunks` — the "concat and chunk" layout (GPT-style): within
  a pack group, documents are concatenated in id order and the stream is
  cut into ``chunk_len``-token blocks; a document may span blocks. Pure
  window arithmetic (one shuffle on the group key, one in-partition sort),
  exactly SQL-expressible, so it carries a full value oracle.
- :func:`first_fit_pack` — whole-document bin packing (no splits):
  first-fit-decreasing within each group via ``applyInPandas``.
  Per-group greedy state is inherently sequential, which is exactly
  what the Arrow-batched per-group UDF is for; groups themselves run
  in parallel. Deterministic (sort by tokens desc, id asc) but the
  greedy assignment isn't window-expressible → rows-only + pytest
  invariants.

Scale shape for both: ONE shuffle on ``grp = id % n_groups`` — groups are
the parallelism unit, so ``n_groups`` scales with the cluster, group
boundaries only affect which sequences share a block (any grouping is
valid training data), and no state ever crosses groups. At 100 TB the
token counts come from the tokenizer pass already materialized upstream;
here they're computed from the text column.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PACK_SCHEMA = "grp int, doc_id bigint, n_tok int, bin int"


def pack_chunks(
    df: DataFrame,
    id_col: str,
    tok_col,
    n_groups: int = 32,
    chunk_len: int = 512,
) -> DataFrame:
    """Concat-and-chunk packing: per group (``id % n_groups``), documents
    are laid head-to-tail in id order; each gets its token span
    [cum_before, cum_before + n_tok) and the chunk ids that span covers:
    ``start_chunk = cum_before // chunk_len``,
    ``end_chunk = (cum_before + n_tok - 1) // chunk_len``.

    ``tok_col`` is a Column expression giving the document's token count.
    """
    grp = F.pmod(F.col(id_col), F.lit(n_groups)).cast("int")
    w = (
        Window.partitionBy("grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(F.col(id_col), grp.alias("grp"), tok_col.alias("n_tok"))
        .withColumn(
            "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("bigint")
        )
        .select(
            "grp",
            id_col,
            "n_tok",
            F.floor(F.col("cum_before") / chunk_len).alias("start_chunk"),
            F.floor(
                (F.col("cum_before") + F.greatest(F.col("n_tok"), F.lit(1)) - 1)
                / chunk_len
            ).alias("end_chunk"),
        )
    )


def first_fit_pack(
    df: DataFrame,
    id_col: str,
    tok_col,
    capacity: int = 256,
    n_groups: int = 32,
) -> DataFrame:
    """First-fit-decreasing whole-document packing within each group:
    documents sorted by (tokens desc, id asc) each go to the lowest-
    numbered bin with room; a document longer than ``capacity`` gets a
    bin of its own (never silently dropped). Returns (grp, doc_id,
    n_tok, bin).

    The per-group loop is pandas over one Arrow batch per group —
    bounded by group size, not corpus size; pick ``n_groups`` so groups
    fit an executor (fixture groups are tens of docs; at scale you'd
    also cap group row count upstream).
    """

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tok", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bin_free: list[int] = []  # free tokens per open bin
        assigned: list[int] = []
        for t in pdf["n_tok"]:
            t = int(t)
            for b, free in enumerate(bin_free):
                if t <= free:
                    bin_free[b] = free - t
                    assigned.append(b)
                    break
            else:
                bin_free.append(max(capacity - t, 0))
                assigned.append(len(bin_free) - 1)
        pdf["bin"] = pd.Series(assigned, dtype="int32")
        return pdf

    grp = F.pmod(F.col(id_col), F.lit(n_groups)).cast("int")
    slim = df.select(
        grp.alias("grp"),
        F.col(id_col).cast("bigint").alias("doc_id"),
        tok_col.cast("int").alias("n_tok"),
    )
    return slim.groupBy("grp").applyInPandas(_pack, PACK_SCHEMA)


def pack_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-group packing summary over :func:`first_fit_pack` output:
    (grp, n_docs, n_bins, tokens_total, fill_pct) — fill_pct is
    tokens/(bins*capacity) in integer percent, floor(x*100)."""
    return (
        packed.groupBy("grp")
        .agg(
            F.count("*").alias("n_docs"),
            (F.max("bin") + 1).alias("n_bins"),
            F.sum("n_tok").alias("tokens_total"),
        )
        .select(
            "grp",
            "n_docs",
            "n_bins",
            "tokens_total",
            F.floor(
                F.col("tokens_total") * 100 / (F.col("n_bins") * capacity)
            ).alias("fill_pct"),
        )
    )


def sliding_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG-ingest layout.

    Windows of ``chunk_tokens`` tokens advance by ``stride = chunk_tokens
    - overlap`` so consecutive chunks share ``overlap`` tokens (retrieval
    context never cuts mid-thought at a hard boundary). The final window
    is the remainder (shorter, never empty); every doc yields ≥1 chunk.

    Scale shape: pure scan-side expression tree + one posexplode — zero
    shuffle, zero UDF. The chunk TEXT is emitted as a sha2 digest plus
    token count so downstream verification is O(1)-width; swap the
    digest for ``array_join`` to materialize text.

    Returns (id_col, chunk_idx, n_tokens, chunk_sha).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # number of stride steps whose window START is inside the doc:
    # ceil((n - overlap) / stride), min 1
    n_chunks = F.greatest(
        F.ceil((n - overlap) / F.lit(float(stride))).cast("int"), F.lit(1)
    )
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunk_arr).alias("chunk_idx", "__toks")
    ).select(
        id_col,
        "chunk_idx",
        F.size("__toks").cast("bigint").alias("n_tokens"),
        F.sha2(F.array_join("__toks", " "), 256).alias("chunk_sha"),
    )


def sql_sliding_chunks(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """DuckDB twin of :func:`sliding_chunks` over ``documents``."""
    k, s = chunk_tokens, chunk_tokens - overlap
    n_hi = f"greatest(CAST(ceil((len(l) - {overlap}) / {s}.0) AS BIGINT), 1) - 1"
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
)
SELECT doc_id,
       CAST(unnest(generate_series(0, {n_hi})) AS INTEGER) AS chunk_idx,
       unnest([CAST(len(l[i * {s} + 1 : i * {s} + {k}]) AS BIGINT)
               FOR i IN generate_series(0, {n_hi})]) AS n_tokens,
       unnest([sha256(array_to_string(l[i * {s} + 1 : i * {s} + {k}], ' '))
               FOR i IN generate_series(0, {n_hi})]) AS chunk_sha
FROM toks
"""
