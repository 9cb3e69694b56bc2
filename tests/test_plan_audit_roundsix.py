"""Physical-plan audits for the round-6 phases 29-30 — same contract as
tests/test_plan_audit.py (plan SHAPE pinned as a regression test, so a
refactor that silently degrades the 100 TB posture fails loudly)."""

from __future__ import annotations

from legislative_bills_database_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scd2_asof_enrich_broadcasts_dim_no_cartesian(spark):
    """The 2-versions-per-key dim must broadcast; the interval predicate
    is a residual on the key-equality hash join, never a theta join."""
    plan = _plan(spark, "q_scd2_asof_enrich")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_reservoir_sample_is_take_ordered_not_global_sort(spark):
    """Bottom-256 by hash rank = per-partition heaps + driver merge.
    A global Sort before the limit would shuffle the whole table."""
    plan = _plan(spark, "q_reservoir_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_gdpr_delete_audit_semi_joins_broadcast(spark):
    """Subject and order-key lists enter every fact scan as broadcast
    LEFT SEMI filters — fact tables never shuffle."""
    plan = _plan(spark, "q_gdpr_delete_audit")
    assert plan.count("LeftSemi") >= 3
    assert "SortMergeJoin" not in plan
    # single-row assembly is a tagged union + conditional-MAX fold, not
    # scalar cross-joins (which plan as BroadcastNestedLoopJoins)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pagerank_exact_no_python_in_loop(spark):
    plan = _plan(spark, "q_pagerank_exact")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_corpus_governance_pure_codegen(spark):
    """Dataset card / scrub / vocab / coverage are JVM expression trees
    end-to-end — any Python eval node is a 10-100x regression."""
    for name in ("q_dataset_card", "q_pii_scrub", "q_vocab_growth",
                 "q_ngram_coverage", "q_key_skew_audit"):
        plan = _plan(spark, name)
        assert "ArrowEvalPython" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_cross_source_overlap_broadcasts_sizes(spark):
    """Per-source shingle-set sizes are |sources| rows — they must ride
    broadcast joins back onto the pair counts."""
    plan = _plan(spark, "q_cross_source_overlap")
    assert "BroadcastHashJoin" in plan
