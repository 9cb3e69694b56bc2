"""Physical-plan audits for the round-3 analytics batch: gap-fill,
EWMA, phrase search, SCD2, FK audit — same contract as
tests/test_plan_audit.py (plan SHAPE as a regression test)."""

from __future__ import annotations

from legislative_bills_database_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_gap_fill_no_global_calendar_cross_join(spark):
    """The per-key calendar must come from sequence()+explode next to the
    data — a cross join against a global date table would shuffle every
    key against every day."""
    plan = _plan(spark, "q_gap_fill")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_ewma_single_shuffle_no_python_in_fold(spark):
    """One groupBy(user) shuffle; the recurrence folds JVM-side via the
    aggregate() HOF — no Python evaluation anywhere in the plan."""
    plan = _plan(spark, "q_ewma")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_phrase_search_filters_postings_before_join(spark):
    """Join inputs must be pre-filtered to the phrase's own terms (the
    rarest-term-first rule): every posting-side Filter carries a term
    equality, and no unfiltered full-postings join exists."""
    df = QUERIES["q_phrase_search"](spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "= table" in opt and "= scan" in opt
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_scd2_single_key_shuffle(spark):
    """Union + change-collapse window + lead(): everything partitions by
    the business key ONCE (both windows share the partitioning)."""
    plan = _plan(spark, "q_scd2_merge")
    assert plan.count("Exchange hashpartitioning") == 1


def test_fk_audit_is_one_lazy_plan_with_all_branches(spark):
    """All four relationship censuses live in one plan (union of
    join+agg branches) — no per-relationship driver actions."""
    df = QUERIES["q_fk_orphans"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Union") >= 1
    for rel_col in ("o_custkey", "l_orderkey", "l_suppkey", "c_nationkey"):
        assert rel_col in plan


def test_char_entropy_two_phase_partial_agg(spark):
    """The (doc, char) count must map-side combine before shuffling —
    a two-phase HashAggregate pair around the exchange."""
    plan = _plan(spark, "q_char_entropy")
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dq_constraints_single_lazy_plan(spark):
    """Five constraints, one plan: union branches, no driver actions —
    and the whole suite must execute as one collect."""
    df = QUERIES["q_dq_constraints"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan
    rows = df.collect()
    assert len(rows) == 5
    assert all(r.violations == 0 for r in rows)  # fixtures are clean


def test_snapshot_diff_one_join_no_cartesian(spark):
    plan = _plan(spark, "q_snapshot_diff")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin FullOuter" in plan or "full_outer" in plan.lower() or "FullOuter" in plan
