"""HLL sketch mergeability: union-of-shard-sketches vs direct vs exact,
including the lgConfigK headroom caveat the operator documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.sketches import hll_merge_report

SF = "/root/testdata/sf0.001"


def test_merged_equals_direct_with_headroom(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row = hll_merge_report(docs, "source", "doc_id", lg_config_k=14).collect()[0]
    assert row.exact == 500
    assert row.merged_est == row.direct_est == 500  # exact at this cardinality
    assert row.rel_err == 0.0
    assert row.n_groups == docs.select("source").distinct().count()


def test_lg12_union_loses_sparse_exactness(spark):
    """The documented caveat: at lgConfigK=12 the union path leaves
    sparse-exact mode and the merged estimate drops below exact — if a
    Spark upgrade makes this exact, the operator's warning (and this
    pin) should be revisited."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    row = hll_merge_report(docs, "source", "doc_id", lg_config_k=12).collect()[0]
    assert row.exact == 500
    assert row.rel_err < 0.05  # still a good estimate...
    assert row.merged_est != row.exact  # ...but no longer exact


def test_merge_is_order_independent(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = hll_merge_report(docs, "source", "doc_id").collect()[0]
    b = hll_merge_report(
        docs.orderBy(F.desc("doc_id")), "source", "doc_id"
    ).collect()[0]
    assert a.merged_est == b.merged_est


class TestCmSketch:
    def test_never_undercounts_and_bound(self, spark):
        """CM guarantees est >= exact always; expected overcount is
        e*N/width — allow 5x headroom for the small-width stress."""
        import math

        from legislative_bills_database_spark.operators.sketches import (
            cm_sketch_report,
        )

        rows = [(i % 50,) for i in range(2000)]  # 50 keys, heavy reuse
        df = spark.createDataFrame(rows, "k long")
        out = cm_sketch_report(df, "k", depth=4, width=64, top_k=50).collect()
        assert len(out) == 50
        assert all(r.overcount >= 0 for r in out)
        n = len(rows)
        bound = 5 * math.e * n / 64
        assert all(r.overcount <= bound for r in out)

    def test_exact_when_width_exceeds_keys(self, spark):
        """With width >> #keys and 4 independent rows, collisions in
        EVERY row are vanishingly unlikely — estimates are exact."""
        from legislative_bills_database_spark.operators.sketches import (
            cm_sketch_report,
        )

        rows = [(i % 10,) for i in range(500)]
        df = spark.createDataFrame(rows, "k long")
        out = cm_sketch_report(df, "k", depth=4, width=4096, top_k=10).collect()
        assert all(r.overcount == 0 for r in out)
        assert all(r.exact_n == 50 for r in out)

    def test_sharded_sum_merge_equals_direct(self, spark):
        """Linearity: summing per-shard sketches bucket-wise == the
        direct sketch (the property that makes CM incremental-safe)."""
        from pyspark.sql import functions as F

        width, depth = 64, 4
        rows = [(i % 30, i % 3) for i in range(900)]  # (key, shard)
        df = spark.createDataFrame(rows, "k long, shard int")

        def buckets(c):
            return F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.pmod(
                            F.xxhash64(F.col(c).cast("string"), F.lit(i)),
                            F.lit(width),
                        ).alias("b"),
                    )
                    for i in range(depth)
                ]
            )

        exploded = df.select("shard", F.explode(buckets("k")).alias("hb"))
        per_shard = exploded.groupBy(
            "shard", F.col("hb.i").alias("i"), F.col("hb.b").alias("b")
        ).agg(F.count(F.lit(1)).alias("c"))
        merged = per_shard.groupBy("i", "b").agg(F.sum("c").alias("c"))
        direct = exploded.groupBy(
            F.col("hb.i").alias("i"), F.col("hb.b").alias("b")
        ).agg(F.count(F.lit(1)).alias("c"))
        assert merged.exceptAll(direct).count() == 0
        assert direct.exceptAll(merged).count() == 0
