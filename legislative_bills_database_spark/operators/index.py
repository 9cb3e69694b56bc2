"""Inverted-index construction and positional phrase search.

The reference's search is a full-scan regex per term over every document
(legiscan_search_all_bills.R:88-92, legiscan_main.R:213). That is O(docs)
per query — fine for 2k bills, wrong at 100 TB. The standard scale answer
is an inverted index: explode documents into (term, doc, position)
postings once, then answer term and phrase queries by joining the
postings of the query terms only — work proportional to the posting
lists touched, not the corpus.

Scale posture:

- the postings build is one explode + one shuffle on term; at 100 TB the
  postings table is written bucketed by term (sources/cache.py
  ``stage_bucketed``) so every subsequent query joins co-located.
- phrase search filters postings to the phrase's terms FIRST (pushdown
  makes the join input the selectivity of the rarest term, mirroring the
  "rarest-term-first" rule of real search engines), then self-joins on
  (doc, position+1) — an equi-join, never a theta join.
- tokenization is a plain single-space split, identical to the DuckDB
  oracle's ``string_split`` + ``generate_subscripts``, so positions (and
  therefore phrase adjacency) are bit-for-bit comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, doc, pos) postings, pos 1-based over the raw space-split."""
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
                "pos0", "term"
            ),
        )
        .filter(F.col("term") != "")
        .select(id_col, "term", (F.col("pos0") + 1).alias("pos"))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_count: int = 2,
) -> DataFrame:
    """Term dictionary with posting-list statistics.

    Returns (term, doc_count, total_tf, min_doc, max_doc) — the scalar
    summary of each posting list (the full lists live in ``postings``;
    scalars keep the result oracle-hashable and driver-friendly).
    """
    return (
        postings(docs, id_col, text_col)
        .groupBy("term")
        .agg(
            F.countDistinct(id_col).alias("doc_count"),
            F.count(F.lit(1)).alias("total_tf"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .filter(F.col("doc_count") >= min_doc_count)
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents containing ``phrase`` as adjacent tokens, with match count.

    Exact-token adjacency over the single-space split (NOT substring
    match: "affordable" does not match phrase term "afford"). Each
    consecutive term pair is an equi-join on (doc, pos+1); k-term phrases
    chain k-1 joins, each input pre-filtered to one term's postings.
    """
    terms = [t for t in phrase.lower().split(" ") if t]
    if not terms:
        raise ValueError("empty phrase")
    post = postings(docs, id_col, text_col)
    # selectivity pushdown: only the phrase's own posting lists enter the
    # join graph; everything else dies at the scan/explode filter
    matched = (
        post.filter(F.col("term") == terms[0])
        .select(id_col, F.col("pos").alias("p1"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = post.filter(F.col("term") == t).select(
            F.col(id_col).alias("__d"), F.col("pos").alias("__p")
        )
        matched = (
            matched.join(
                nxt,
                (matched[id_col] == nxt["__d"])
                & (nxt["__p"] == matched["p1"] + i),
            )
            .select(id_col, "p1")
        )
    return (
        matched.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
