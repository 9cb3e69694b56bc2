"""Fuzzy (edit-distance) join with PassJoin-style pigeonhole blocking.

Entity resolution across dirty string keys — the record-linkage
primitive a training-data pipeline needs for source-metadata joins
(titles, author names, URLs with typos). Generalizes the reference's
exact fallback-key join (legislator_bill_counts_run.R:114-122) to
approximate string keys.

Blocking is the segment-pigeonhole scheme of PassJoin (Li, Deng, Feng —
"PASS-JOIN: a partition-based method for similarity joins", PVLDB 2011,
public literature): split every LEFT string of length m into k = d+1
contiguous segments; any RIGHT string within edit distance d MUST contain
at least one segment verbatim, starting within ±d of its left position.
So the candidate set is an EQUI-join on (segment_idx, left_len, substring)
— never a cross join — and is provably complete (no missed pairs).

Scale shape: each left row emits k keys, each right row at most
(2d+1)·k·(2d+1) keys (constant for fixed d) — linear explode, one
equi-join on slim (idx, len, substr) keys, candidates de-duplicated to
(lid, rid) id pairs BEFORE strings are re-joined for the levenshtein
verify (text never rides through the explode). Strings shorter than k
route through a single 'short' bucket (bounded: |s| < k means at most
k-1 chars), unioned in before verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _segment(i: Column, m: Column, k: int) -> tuple[Column, Column]:
    """(start, length) of even-split segment ``i`` of a length-``m``
    string, 1-based, first ``m % k`` segments one char longer."""
    base = (m / k).cast("int")
    rem = m % k
    length = base + (i < rem).cast("int")
    start = i * base + F.least(i, rem) + 1
    return start, length


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All (left_id, right_id, dist) pairs with edit distance ≤ ``max_dist``.

    Complete (the pigeonhole blocking misses nothing) and exact (every
    candidate is verified with ``levenshtein``). Output column names:
    ``lid``, ``rid``, ``dist``.
    """
    d, k = max_dist, max_dist + 1
    ls = left.select(
        F.col(left_id).alias("lid"), F.col(left_col).alias("ltext")
    )
    rs = right.select(
        F.col(right_id).alias("rid"), F.col(right_col).alias("rtext")
    )
    # The right side is the streamed side of the candidate join (the
    # left key side broadcasts), so ITS partition count is the
    # parallelism of the explode → join → levenshtein pipeline. A
    # single-file scan would run the whole verify on 1-2 cores
    # (measured 2 partitions carrying 90M candidate rows at sf0.1);
    # round-robin the pre-explode rows — the cheapest point, before
    # the ~50× key fan-out.
    # ADVICE r10 #4: don't probe rs.rdd.getNumPartitions() — the
    # DataFrame→RDD conversion costs an analysis pass and is unavailable
    # under Spark Connect. An unconditional round-robin repartition is a
    # trivial pre-fan-out shuffle of the raw (rid, rtext) rows, cheap
    # relative to the ~50× key explode it parallelizes.
    par = rs.sparkSession.sparkContext.defaultParallelism
    rs = rs.repartition(par)

    m = F.length("ltext")
    lstart, llen = _segment(F.col("i"), F.col("m"), k)
    lkeys = (
        ls.filter(m >= k)
        .select("lid", "ltext", m.alias("m"), F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i"))
        .select(
            "lid",
            F.struct(
                F.col("i"),
                F.col("m"),
                F.substring("ltext", lstart, llen).alias("sub"),
            ).alias("key"),
        )
    )

    # right side: for every plausible left length m in [n-d, n+d] (and
    # >= k), every segment index, every start the multi-match-aware
    # bound allows — constant keys per row (≈half of the naive ±d
    # window; see _rkeys_for_segment for the completeness argument)
    n = F.length("rtext")
    rkeys = (
        rs.filter(n >= 1)
        .select("rid", "rtext", n.alias("n"))
        .select(
            "rid",
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(
                            F.greatest(F.col("n") - d, F.lit(k)),
                            F.col("n") + d,
                        ),
                        lambda mm: F.flatten(
                            F.transform(
                                F.sequence(F.lit(0), F.lit(d)),
                                lambda i: _rkeys_for_segment(
                                    i, mm, F.col("n"), k, d
                                ),
                            )
                        ),
                    )
                )
            ).alias("key"),
        )
    )

    cand = lkeys.join(rkeys, "key").select("lid", "rid")

    # short-left bucket: |s| < k strings can't be segmented — pair them
    # with every right string of compatible length via one tiny bucket
    short_l = ls.filter(F.length("ltext") < k).select("lid")
    short_cand = short_l.crossJoin(
        rs.filter(F.length("rtext") <= k - 1 + d).select("rid")
    )

    # VERIFY FIRST, dedup LAST (r10 restructure): candidate pairs are
    # nearly distinct on self-similar corpora (measured 90.7M raw →
    # 71.8M distinct on sf0.1 part names — duplication factor 1.26),
    # so a distinct() BEFORE verification shuffles the full candidate
    # volume to save ~26% of the levenshtein calls — measured 146 s of
    # the operator's 165 s wall. Verifying first keeps the text joins
    # shuffle-free where the sides broadcast and shrinks the one
    # unavoidable dedup shuffle from |candidates| to |qualifying
    # pairs|; the 3-arg levenshtein is a banded DP with early exit
    # (O(d·len) cells, -1 above the threshold), so re-verifying a
    # duplicate candidate costs less than shuffling it.
    all_cand = cand.unionByName(short_cand)
    dist = F.levenshtein("ltext", "rtext", d)
    return (
        all_cand.join(ls, "lid")
        .join(rs, "rid")
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("lid", "rid", F.col("dist").cast("int").alias("dist"))
        .distinct()
    )


def _rkeys_for_segment(
    i: Column, mm: Column, n: Column, k: int, d: int
) -> Column:
    """Candidate (i, m, substring) keys of the right string for segment
    ``i`` of hypothetical left length ``mm`` — starts restricted to the
    multi-match-aware window (PassJoin §4.2, public literature).

    Completeness: take the FIRST segment index i that occurs verbatim
    in an alignment with ≤ d errors. With e_pre errors strictly before
    the segment and e_post after (e_pre + e_post ≤ d), the occurrence
    shift δ = p − start satisfies |δ| ≤ e_pre and |δ − Δ| ≤ e_post
    (Δ = n − m, the length gap), hence |δ| + |δ − Δ| ≤ d, i.e.
    δ ∈ [⌈(Δ−d)/2⌉, ⌊(Δ+d)/2⌋]. Because segments 0..i−1 each contain
    ≥ 1 error, e_pre ≥ i, so e_post ≤ d − i and |δ − Δ| ≤ d − i.
    Emitting exactly the δ satisfying both bounds finds that first
    matching segment — nothing qualifying is lost (the sf0.001/sf0.01
    hash vs the NAIVE quadratic oracle is the standing proof). Cuts
    per-row keys ≈2× vs the naive ±d window, and hot-segment candidate
    pairs with it."""
    start, length = _segment(i, mm, k)
    delta = n - mm
    # δ ∈ [ceil((Δ-d)/2), floor((Δ+d)/2)] ∩ [Δ-(d-i), Δ+(d-i)]
    lo = F.greatest(
        start + F.ceil((delta - d) / F.lit(2.0)).cast("int"),
        start + (delta - (d - i)),
        F.lit(1),
    )
    hi = F.least(
        start + F.floor((delta + d) / F.lit(2.0)).cast("int"),
        start + (delta + (d - i)),
        n - length + 1,
    )
    return F.when(
        (hi >= lo) & (length >= 1),
        F.transform(
            F.sequence(lo, hi),
            lambda p: F.struct(
                i.alias("i"),
                mm.alias("m"),
                F.substring(F.col("rtext"), p, length).alias("sub"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<i:int,m:int,sub:string>>"))


def sql_fuzzy_join(
    left_sql: str,
    right_sql: str,
    max_dist: int = 2,
) -> str:
    """DuckDB twin: the NAIVE quadratic join — equality with the blocked
    Spark result proves the blocking is complete, not just fast.

    ``left_sql`` / ``right_sql`` must yield (lid, ltext) / (rid, rtext).
    """
    return f"""
WITH l AS ({left_sql}), r AS ({right_sql})
SELECT l.lid, r.rid,
       CAST(levenshtein(l.ltext, r.rtext) AS INTEGER) AS dist
FROM l JOIN r ON abs(len(l.ltext) - len(r.rtext)) <= {max_dist}
WHERE levenshtein(l.ltext, r.rtext) <= {max_dist}
"""
