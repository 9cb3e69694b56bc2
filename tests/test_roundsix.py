"""Round-6 phase-29 invariants (value parity is pinned for every query
by test_oracle_parity.py; these pin the semantic properties a hash
can't see)."""

import pytest
from pyspark.sql import functions as F

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_pagerank_exact_mass_and_positivity(spark):
    """Fixed-point PageRank: every node keeps positive rank, total
    scaled mass stays within the floor-loss envelope of 1e8 (each of
    the 8 rounds loses < 1 ulp-of-ppm per edge to integer floors), and
    rank order is stable under the damped-degree structure."""
    df = QUERIES["q_pagerank_exact"](spark, SF)
    rows = df.collect()
    assert rows, "graph sample produced no nodes"
    assert all(r.pr_scaled > 0 for r in rows)
    total = sum(r.pr_scaled for r in rows)
    assert 0.9 * 100_000_000 <= total <= 100_000_000
    assert abs(sum(r.pr for r in rows) - 1.0) < 1e-3


def test_dataset_card_totals_match_table(spark):
    card = QUERIES["q_dataset_card"](spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = card.agg(
        F.sum("n_docs").alias("d"), F.sum("total_chars").alias("c")
    ).collect()[0]
    want_d = docs.count()
    want_c = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert (got.d, got.c) == (want_d, want_c)


def test_pii_scrub_masked_never_grows_unbounded(spark):
    """masked_chars = original - hit_chars + hits*6; with the fixture
    terms (3-5 chars) masking can only grow a doc by ≤3 chars/hit."""
    rows = QUERIES["q_pii_scrub"](spark, SF).collect()
    total_docs = sum(r.n_docs for r in rows)
    assert total_docs == spark.read.parquet(
        f"{SF}/documents.parquet"
    ).count()
    assert all(r.docs_with_hits <= r.n_docs for r in rows)
    assert all(r.total_hits >= r.docs_with_hits for r in rows)


def test_cross_source_overlap_is_a_valid_jaccard(spark):
    rows = QUERIES["q_cross_source_overlap"](spark, SF).collect()
    assert rows
    assert all(0.0 <= r.jaccard <= 1.0 for r in rows)
    assert all(r.src_a < r.src_b for r in rows)


def test_ngram_coverage_monotone(spark):
    rows = sorted(
        QUERIES["q_ngram_coverage"](spark, SF).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(1, len(rows) + 1))
    shares = [r.cum_share for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] <= 1.0


def test_customer_ltv_totals(spark):
    rows = QUERIES["q_customer_ltv"](spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust


def test_scd2_asof_every_order_matches_exactly_one_version(spark):
    """Interval-membership join: the two versions tile each key's
    timeline with no gap/overlap, so the enriched row count equals the
    orders row count."""
    rows = QUERIES["q_scd2_asof_enrich"](spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert {r.version for r in rows} <= {1, 2}


def test_reservoir_sample_is_exactly_k_and_ranked(spark):
    rows = QUERIES["q_reservoir_sample"](spark, SF).collect()
    assert len(rows) == 256
    assert sorted(r.rk for r in rows) == list(range(1, 257))


def test_key_skew_audit_families(spark):
    rows = {r.keyspace: r for r in
            QUERIES["q_key_skew_audit"](spark, SF).collect()}
    assert set(rows) == {"o_custkey", "l_partkey", "user_id"}
    for r in rows.values():
        assert r.max_freq >= r.p50_freq >= 1
        assert 0 < r.top_share <= 1


def test_gdpr_delete_audit_consistency(spark):
    row = QUERIES["q_gdpr_delete_audit"](spark, SF).collect()[0]
    assert row.n_subjects >= 1
    # lineitems can only exist under deleted orders
    assert row.n_lineitems >= row.n_orders >= row.n_subjects


def test_embedding_norm_audit_bounds(spark):
    rows = QUERIES["q_embedding_norm_audit"](spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert sum(r.n_vecs for r in rows) == emb.count()
    for r in rows:
        assert 0 <= r.min_norm <= r.avg_norm <= r.max_norm


def test_shard_rollup_merge_equals_direct(spark):
    """Maintained-vs-recomputed bit-equality (the mergeability
    contract): the pairwise-merged shard partials equal the one-pass
    aggregate on every cell."""
    merged = {
        (r.status, r.prio): (r.n, r.rev)
        for r in QUERIES["q_shard_rollup_merge"](spark, SF).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    direct = {
        (r.status, r.prio): (r.n, r.rev)
        for r in orders.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                .cast("double"),
                2,
            ).alias("rev"),
        )
        .collect()
    }
    assert merged == direct


def test_hash_uniformity_all_buckets_hit(spark):
    row = QUERIES["q_hash_uniformity"](spark, SF).collect()[0]
    assert row.n_buckets == 64
    assert row.min_c >= 1
    # a catastrophically non-uniform fold would blow chi2 far past the
    # chi2(63) right tail (~92 at p=0.01); the portable fold must pass
    assert row.chi2 < 120


def test_rec_coverage_bounds(spark):
    rows = QUERIES["q_rec_coverage"](spark, SF).collect()
    part_total = spark.read.parquet(f"{SF}/part.parquet").count()
    assert sum(r.n_parts for r in rows) == part_total
    for r in rows:
        assert 0 <= r.n_covered <= r.n_parts
        assert 0.0 <= r.coverage <= 1.0


def test_price_elasticity_slope_matches_numpy(spark):
    """Closed-form decimal OLS == numpy polyfit per brand (one brand
    spot-checked end to end)."""
    import numpy as np

    rows = QUERIES["q_price_elasticity"](spark, SF).collect()
    assert rows
    brand = rows[0].brand
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF}/part.parquet").filter(
        F.col("p_brand") == brand
    )
    pts = li.join(pt, li.l_partkey == pt.p_partkey).select(
        "l_discount", "l_quantity"
    ).collect()
    x = np.array([r.l_discount for r in pts])
    y = np.array([r.l_quantity for r in pts])
    want = np.polyfit(x, y, 1)[0]
    got = {r.brand: r.slope for r in rows}[brand]
    assert abs(got - want) < 1e-3


def test_duplicate_payments_pairs_are_real(spark):
    rows = QUERIES["q_duplicate_payments"](spark, SF).collect()
    for r in rows:
        assert r.n_pairs >= 1
        assert r.n_flagged >= 2  # a pair flags at least 2 keys


def test_cohort_ltv_curve_monotone_cumulative(spark):
    rows = QUERIES["q_cohort_ltv_curve"](spark, SF).collect()
    by_cohort = {}
    for r in sorted(rows, key=lambda r: (r.cohort_yr, r.qtr_off)):
        prev = by_cohort.get(r.cohort_yr, 0.0)
        assert r.cum_rev >= prev - 1e-9
        by_cohort[r.cohort_yr] = r.cum_rev


def test_ship_latency_percentile_order(spark):
    rows = QUERIES["q_ship_latency"](spark, SF).collect()
    for r in rows:
        assert r.min_lag <= r.p50_lag <= r.p90_lag <= r.max_lag


def test_zorder_buckets_bound_both_spans(spark):
    """Z-order locality: curve buckets must bound BOTH dimensions far
    tighter than the full value range (the file-skipping property).
    The top 26-bit shift keeps the 6 high interleaved bits: ~3 bits
    per dimension => expected span ~1/8 of the range per dim."""
    rows = QUERIES["q_zorder_stats"](spark, SF).collect()
    assert rows
    # every bucket's span must be a strict subset of the 65536 range
    # on both dimensions simultaneously (single-column sorts fail y)
    for r in rows:
        assert r.x_span < 65536 and r.y_span < 65536
    avg_x = sum(r.x_span for r in rows) / len(rows)
    avg_y = sum(r.y_span for r in rows) / len(rows)
    assert avg_x < 65536 / 2 and avg_y < 65536 / 2


def test_format_federation_three_copies(spark):
    rows = QUERIES["q_format_federation"](spark, SF).collect()
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    want = {
        r.n_regionkey: r.cnt
        for r in nation.groupBy("n_regionkey")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    got = {r.n_regionkey: (r.n_rows, r.n_per_format) for r in rows}
    assert {k: v[1] for k, v in got.items()} == want
    assert all(v[0] == 3 * v[1] for v in got.values())
