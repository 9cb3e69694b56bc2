"""Round-11 queries.

Opens with the one canonical LLM-training-data dedup mode the inventory
still lacked (VERDICT r10 "What's missing" #1): exact-substring
(suffix-array-style) duplicate-span detection — Lee et al. 2022's
ExactSubstr — built from machinery already on the shelf (the
packing.sliding_chunks zero-UDF shingle posexplode + the q_streaks
gaps-and-islands run collapse), plus its removal-side companion at
paragraph grain (VERDICT r10 item #6). Later phases add the AQE
skew-join certificate and the fan-out refusal interlock for the exact
quadratic certificate trio.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..operators import corpus as Co
from .registry import query

# ---------------------------------------------------------------------------
# phase 63 — exact-substring dedup (ExactSubstr) + paragraph-grain removal
# ---------------------------------------------------------------------------

_SUBSTR_K = 8


@query("q_substr_dup_spans", Co.sql_substr_dup_spans(k=_SUBSTR_K))
def q_substr_dup_spans(spark, sf_dir):
    """Maximal verbatim repeated token spans across the whole corpus
    (operators/corpus.substr_dup_spans — the ExactSubstr of Lee et al.
    2022): sliding 8-token shingle digests, one digest aggregate for
    occurrence ≥ 2 + owner counts, per-document gaps-and-islands
    collapse into maximal spans. Span grain is what doc-level sha2 and
    MinHash dedup can't see: the 50-token license block shared by 3
    docs reports as one span per owner with min_owners=3; a chorus
    repeated inside one doc reports with min_owners=1. Fully
    deterministic → value-hash-checked against the DuckDB twin."""
    docs = load_table(spark, sf_dir, "documents")
    return Co.substr_dup_spans(docs, k=_SUBSTR_K)


@query("q_dedup_paragraphs", Co.sql_dedup_paragraphs(chunk_tokens=8))
def q_dedup_paragraphs(spark, sf_dir):
    """Within-document paragraph-grain exact dedup with order-restoring
    reassembly (operators/corpus.dedup_paragraphs) — the REMOVAL
    complement to the q_repetition signal, at the q_boilerplate_strip
    segmentation. Zero shuffle: the duplicate test is within-row, so
    the whole operator is one scan-side array expression (keep chunk i
    iff its first occurrence is itself); verified down to the sha256 of
    the reassembled text."""
    docs = load_table(spark, sf_dir, "documents")
    return Co.dedup_paragraphs(docs, chunk_tokens=8)


# ---------------------------------------------------------------------------
# phase 64 — AQE skew-join certificate (VERDICT r10 #4)
# ---------------------------------------------------------------------------

_AQE_SKEW_CONFS = {
    # force a shuffled SMJ (no broadcast), and thresholds low enough
    # that the census fixture's hot partition is skew-detected at every
    # test SF (production keeps the 256 MB defaults; the CONDITIONS are
    # what this census certifies, not the numbers)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "131072",
}


@query("q_aqe_skew_census")  # engine-physical → rows-only by design
def q_aqe_skew_census(spark, sf_dir):
    """AQE skew-join certificate — the adaptive sibling of
    q_join_strategy_census and the automatic counterpart of
    q_salted_join's manual remedy: run the SAME Zipf-hot join (80% of
    lineitem rows on one key, uncompressible 64-byte payloads) with
    ``spark.sql.adaptive.skewJoin.enabled`` on and off, and report
    whether Spark's own skew split actually fired (``skew=true`` on the
    SortMergeJoin, ``skewed`` AQEShuffleRead) plus result parity
    between the two runs. The operator's guide this row encodes: AQE
    handles shuffle-level skew on its own, so reach for q_salted_join
    only where AQE can't — broadcast-ineligible non-shuffle operators,
    or single-key windows.

    Two prerequisites this census had to discover (both documented
    because a real cluster operator WILL hit them): (1) AQE can only
    split a skewed reduce partition at MAP-OUTPUT boundaries, so a
    single-file scan (1 mapper — the known bench-SF shape) is
    unsplittable: the fact side round-robins to 16 partitions first,
    exactly like a real multi-executor scan. (2) the probe aggregate
    must be value-dependent (sum(length(payload))) — a count-only probe
    lets Catalyst prune the payload, the hot partition collapses to
    RLE-compressed key bytes, and nothing is skewed by SIZE anymore
    (the session.materialize_fully lesson, found here first)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = (
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10))
            < 8,
            F.lit(0),
        )
        .otherwise(F.pmod(F.xxhash64("l_orderkey"), F.lit(200)) + 1)
    )
    payload = F.concat(
        F.md5(F.col("l_orderkey").cast("string")),
        F.md5(F.col("l_linenumber").cast("string")),
    )
    fact = li.select(key.alias("k"), payload.alias("payload")).repartition(
        16
    )
    dim = spark.range(0, 201).select(
        F.col("id").alias("k"),
        F.concat(F.lit("label_"), F.col("id")).alias("lbl"),
    )

    def run() -> tuple[int, int, int, int]:
        agg = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("pbytes"),
        )
        row = agg.collect()[0]
        plan = agg._jdf.queryExecution().executedPlan().toString()
        return (
            int(row["n"]),
            int(row["pbytes"]),
            plan.count("skew=true"),
            plan.count("skewed"),
        )

    toggle = "spark.sql.adaptive.skewJoin.enabled"
    prev = {
        k: spark.conf.get(k, None)
        for k in [*_AQE_SKEW_CONFS, toggle]
    }
    try:
        for k, v in _AQE_SKEW_CONFS.items():
            spark.conf.set(k, v)
        spark.conf.set(toggle, "true")
        n_on, pb_on, smj_on, reads_on = run()
        spark.conf.set(toggle, "false")
        n_off, pb_off, smj_off, reads_off = run()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        [
            (
                n_on,
                pb_on,
                smj_on,
                reads_on,
                smj_off,
                reads_off,
                int(n_on == n_off and pb_on == pb_off),
            )
        ],
        "rows_out long, payload_bytes long, smj_skew_on long,"
        " skewed_reads_on long, smj_skew_off long, skewed_reads_off"
        " long, runs_agree long",
    )
