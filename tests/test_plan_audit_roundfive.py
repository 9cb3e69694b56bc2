"""Physical-plan audits for the round-5 phases 19-27 — same contract as
tests/test_plan_audit.py (plan SHAPE pinned as a regression test, so a
refactor that silently degrades the 100 TB posture fails loudly)."""

from __future__ import annotations

from legislative_bills_database_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_interval_join_is_hash_join_not_theta(spark):
    """The overlap predicate must ride a (user, bucket) HASH equi-join;
    a BETWEEN-driven nested-loop/cartesian would be quadratic per user."""
    plan = _plan(spark, "q_interval_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan or "Generate" in plan  # buckets


def test_tree_rollup_no_joins_at_all(spark):
    """Ancestor paths are closed-form arithmetic in the scan stage —
    any Join operator means the hierarchy got materialized."""
    plan = _plan(spark, "q_tree_rollup")
    assert "Join" not in plan
    assert "Generate" in plan  # the ancestor explode


def test_feature_hash_pure_codegen_no_python(spark):
    """Token bucketing is md5-nibble arithmetic — JVM expressions only."""
    plan = _plan(spark, "q_feature_hash")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_interval_coverage_single_exchange(spark):
    """Both windows and both aggregates share ONE user_id exchange."""
    plan = _plan(spark, "q_interval_coverage")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_survivorship_single_window_shuffle_no_self_join(spark):
    """Rank + census + merged sum all ride one (custkey, day) window
    partitioning — a join back to the group would double the shuffle."""
    plan = _plan(spark, "q_survivorship")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_fuzzy_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set is bounded by contract — it must enter
    the candidate join as a broadcast, never a shuffle side."""
    plan = _plan(spark, "q_fuzzy_decontaminate")
    assert "BroadcastHashJoin" in plan


def test_domain_cap_no_fact_side_join(spark):
    """Cap + census is one window + one aggregate at (source) grain."""
    plan = _plan(spark, "q_domain_cap")
    assert "Join" not in plan


def test_kmv_bottom_k_is_takeordered_not_global_sort(spark):
    """Bottom-k selection must be a TakeOrdered (per-partition top-k,
    O(k) merge) — a global Sort before limit would shuffle every hash.
    q_kmv_distinct's own executed plan is an ExistingRDD scan (the
    report checkpoints its 1-row result), so the audit pins the
    operator's internal orderBy+limit shape directly."""
    from pyspark.sql import functions as F

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    hashed = (
        lineitem.select(F.col("l_partkey").cast("string").alias("s"))
        .distinct()
        .select(F.md5("s").alias("hx"))
    )
    smallest = hashed.orderBy("hx").limit(256)
    plan = smallest._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_bitmap_rollup_joins_at_word_grain_only(spark):
    """The status-pair AND runs on word-grain bitset frames; no join
    touches the orders fact table itself."""
    df = QUERIES["q_bitmap_rollup"](spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # bit_or aggregation happens below every join in the plan tree
    assert "bit_or" in opt
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_autocorrelation_pairs_days_not_events(spark):
    """Lag pairing joins the |days|-grain aggregate with itself —
    the event-grain relation must appear only below aggregates."""
    df = QUERIES["q_autocorrelation"](spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # the join condition is on day-number arithmetic, post-aggregate
    assert "Join" in opt
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_epoch_shuffle_ranks_slim_keyed_frame(spark):
    """The two epoch ranks run over (doc_id, k1, k2) — text never
    enters the sort."""
    df = QUERIES["q_epoch_shuffle"](spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "text" not in opt.split("Relation")[0]  # pruned before sort


def test_join_strategy_census_values_pinned(spark):
    """VERDICT r6 #6: the one no-oracle query gets its values pinned —
    engine-physical by design (it reports what Catalyst chose), so the
    pin IS the verification: the small customer dim must broadcast
    under the default threshold, and disabling broadcast must fall back
    to a sort-merge join. A Spark upgrade or session-tuning change that
    alters planner behavior flips this test, not just a driver row."""
    row = QUERIES["q_join_strategy_census"](spark, SF_DIR).collect()[0]
    assert row["default_strategy"] == "BroadcastHashJoin"
    assert row["no_broadcast_strategy"] == "SortMergeJoin"
    assert row["broadcast_threshold"] == "10485760b"
