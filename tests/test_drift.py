"""Statistical drift/testing family: chi-square independence, PSI,
windowed trending top-k. Oracle parity runs in test_oracle_parity; these
pin the mathematical invariants the hash can't express.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_chi_square_invariants(spark):
    from legislative_bills_database_spark.plans import QUERIES

    row = QUERIES["q_chi_square"](spark, SF_DIR).collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_langs = docs.select("lang").distinct().count()
    n_sources = docs.select("source").distinct().count()
    # the grid covers EVERY (lang, source) combination, observed or not
    assert row.n_cells == n_langs * n_sources
    assert row.dof == (n_langs - 1) * (n_sources - 1)
    assert row.chi2 >= 0


def test_psi_terms_nonnegative_and_partition(spark):
    """(p_a − p_b)·ln(p_a/p_b) ≥ 0 for every bin (both factors share
    sign), so PSI ≥ 0 with equality iff the distributions match; the
    two populations partition the table exactly."""
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_psi"](spark, SF_DIR).collect()
    assert all(r.psi_term >= 0 for r in rows)
    assert all(0 <= r.bin <= 9 for r in rows)
    total = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r.n_a + r.n_b for r in rows) == total


def test_trending_rank_shape(spark):
    from collections import defaultdict

    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_trending"](spark, SF_DIR).collect()
    by_win = defaultdict(list)
    for r in rows:
        by_win[r.window_start].append(r)
    for win, rs in by_win.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        # counts non-increasing down the ranks
        ns = [r.n for r in rs]
        assert ns == sorted(ns, reverse=True)


class TestKsStatistic:
    def test_disjoint_samples_give_one(self, spark):
        from legislative_bills_database_spark.operators.stats import (
            ks_statistic,
        )

        df = spark.createDataFrame(
            [(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0)], "v double, ia int"
        )
        row = ks_statistic(df, "v", "ia").collect()[0]
        assert row.ks == 1.0
        assert row.ks_at == 2.0  # first value where the full gap opens
        assert (row.n_a, row.n_b) == (2, 2)

    def test_matches_numpy_bruteforce(self, spark):
        import numpy as np

        from legislative_bills_database_spark.operators.stats import (
            ks_statistic,
        )

        rng = np.random.default_rng(3)
        a = rng.normal(0, 1, 300)
        b = rng.normal(0.4, 1.2, 200)  # planted shift
        rows = [(float(x), 1) for x in a] + [(float(x), 0) for x in b]
        df = spark.createDataFrame(rows, "v double, ia int")
        row = ks_statistic(df, "v", "ia").collect()[0]

        allv = np.sort(np.unique(np.concatenate([a, b])))
        fa = np.searchsorted(np.sort(a), allv, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
        d = np.abs(fa - fb)
        assert row.ks == round(float(d.max()), 6)
        assert row.ks_at == float(allv[int(np.argmax(d))])

    def test_identical_samples_give_zero(self, spark):
        from legislative_bills_database_spark.operators.stats import (
            ks_statistic,
        )

        rows = [(float(i % 7), s) for i in range(70) for s in (0, 1)]
        df = spark.createDataFrame(rows, "v double, ia int")
        assert ks_statistic(df, "v", "ia").collect()[0].ks == 0.0


def test_mutual_info_nonnegative(spark):
    from legislative_bills_database_spark.plans import QUERIES

    row = QUERIES["q_mutual_info"](spark, SF_DIR).collect()[0]
    assert row.mi_nats >= 0


class TestGiniHhi:
    def _gini(self, spark, vals):
        from pyspark.sql import functions as F

        from legislative_bills_database_spark.operators.ordering import (
            global_sort_index,
        )

        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "c long, x double"
        )
        ranked = global_sort_index(
            df, [F.col("x"), F.col("c")], index_col="i"
        ).withColumn("rn", F.col("i") + 1)
        n = F.count("*")
        sx = F.sum("x")
        srx = F.sum(F.col("rn") * F.col("x"))
        return ranked.agg(
            F.round((2 * srx - (n + 1) * sx) / (n * sx), 6).alias("g")
        ).collect()[0].g

    def test_perfect_equality_is_zero(self, spark):
        assert self._gini(spark, [5.0] * 20) == 0.0

    def test_total_concentration_approaches_one(self, spark):
        # one holder of everything among n: gini = (n-1)/n
        assert self._gini(spark, [0.0] * 9 + [100.0]) == 0.9

    def test_hhi_limits(self, spark):
        from pyspark.sql import functions as F

        def hhi(vals):
            df = spark.createDataFrame(
                [(i, float(v)) for i, v in enumerate(vals)], "s long, r double"
            )
            t = df.agg(F.sum("r").alias("total"))
            share = F.col("r") / F.col("total")
            return (
                df.crossJoin(F.broadcast(t))
                .agg(F.round(F.sum(share * share) * 10000, 4))
                .collect()[0][0]
            )

        assert hhi([10.0] * 4 ) == 2500.0  # 4 equal firms
        assert hhi([100.0]) == 10000.0     # monopoly


def test_kaplan_meier_censoring_math(spark):
    """Hand-built cohort: durations (1,death) (1,death) (2,censor)
    (3,death) (5,censor). Censored users leave the risk set but never
    count as deaths: S(1)=3/5, S(3)=0.6*(1-1/2)=0.3."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    u = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 0), (3, 1), (5, 0)], "t int, death int"
    )
    per_t = u.groupBy("t").agg(
        F.sum("death").cast("long").alias("d"),
        F.count("*").cast("long").alias("leave_n"),
    )
    n_total = u.count()
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.select(
        "t",
        "d",
        (
            F.lit(n_total)
            - F.coalesce(F.sum("leave_n").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.log(1 - F.col("d").cast("double") / F.col("n_risk")),
    ).otherwise(0.0)
    out = {
        r.t: (r.n_risk, r.d, r.s)
        for r in risk.select(
            "t", "n_risk", "d",
            F.round(F.exp(F.sum(term).over(w_cum)), 6).alias("s"),
        )
        .filter(F.col("d") > 0)
        .collect()
    }
    assert out == {1: (5, 2, 0.6), 3: (2, 1, 0.3)}


def test_ab_test_arms_nondegenerate(spark):
    from legislative_bills_database_spark.plans import QUERIES

    row = QUERIES["q_ab_test"](spark, SF_DIR).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert 0 < row.p_a < 1 and 0 < row.p_b < 1  # pooled variance finite


class TestEncodingGrowthCentroids:
    def test_target_encode_loo_math(self, spark):
        from pyspark.sql import functions as F

        from legislative_bills_database_spark.functions.compat import exact_sum

        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 7.0)],
            "k long, g string, x double",
        )
        gg = df.groupBy("g").agg(
            F.count("*").cast("long").alias("n"), exact_sum("x").alias("s")
        )
        out = {
            r.k: r.te
            for r in df.join(F.broadcast(gg), "g")
            .select(
                "k",
                F.round(
                    F.when(
                        F.col("n") > 1,
                        (F.col("s") - F.col("x")) / (F.col("n") - 1),
                    ),
                    4,
                ).alias("te"),
            )
            .collect()
        }
        assert out[1] == 25.0 and out[2] == 20.0 and out[3] == 15.0
        assert out[4] is None  # singleton: no leave-one-out exists

    def test_growth_accounting_hand_cohort(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        from legislative_bills_database_spark.plans import QUERIES  # noqa: F401

        w1 = dt.datetime(2024, 1, 1, 12)   # Monday weeks
        w2 = w1 + dt.timedelta(days=7)
        w3 = w1 + dt.timedelta(days=14)
        rows = [
            ("A", w1), ("A", w2), ("A", w3),   # retained throughout
            ("B", w1),                          # churns at w2
            ("C", w1), ("C", w3),               # resurrected at w3
            ("D", w2),                          # new at w2
        ]
        ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
        from pyspark.sql import Window

        uw = ev.select(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
        ).distinct()
        wu = Window.partitionBy("user_id").orderBy("wk")
        tagged = uw.withColumn("prev_wk", F.lag("wk").over(wu))
        weekly = tagged.groupBy("wk").agg(
            F.count("*").alias("n_active"),
            F.sum(F.when(F.col("prev_wk").isNull(), 1).otherwise(0)).alias("n_new"),
            F.sum(F.when(F.col("prev_wk") == F.date_sub("wk", 7), 1).otherwise(0)).alias("n_retained"),
            F.sum(F.when(F.col("prev_wk").isNotNull() & (F.col("prev_wk") < F.date_sub("wk", 7)), 1).otherwise(0)).alias("n_resurrected"),
        )
        ww = Window.orderBy("wk")
        out = {
            str(r.wk): (r.n_active, r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
            for r in weekly.select(
                "*",
                (F.coalesce(F.lag("n_active").over(ww), F.lit(0)) - F.col("n_retained")).alias("n_churned"),
            ).collect()
        }
        assert out["2024-01-01"] == (3, 3, 0, 0, 0)
        assert out["2024-01-08"] == (2, 1, 1, 0, 2)  # B and C drop off
        assert out["2024-01-15"] == (2, 0, 1, 1, 1)  # D churns, C returns

    def test_label_centroid_cosine_exact(self, spark):
        from legislative_bills_database_spark.plans import QUERIES  # noqa: F401
        from pyspark.sql import functions as F

        rows = [
            (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),   # centroid (1,0)
            (3, [0.0, 2.0], 1),                        # centroid (0,2)
            (4, [2.0, 2.0], 2),                        # centroid (2,2)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        dims = (
            emb.select("label", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("label", (F.col("pos") + 1).alias("i"))
            .agg(F.avg("x").alias("c"))
        )
        norms = dims.groupBy("label").agg(
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm")
        )
        a = dims.select(F.col("label").alias("la"), "i", F.col("c").alias("ca"))
        b = dims.select(F.col("label").alias("lb"), "i", F.col("c").alias("cb"))
        na = norms.select(F.col("label").alias("la"), F.col("nrm").alias("na"))
        nb = norms.select(F.col("label").alias("lb"), F.col("nrm").alias("nb"))
        out = {
            (r.la, r.lb): r.cos
            for r in a.join(b, "i")
            .filter(F.col("la") < F.col("lb"))
            .groupBy("la", "lb")
            .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
            .join(na, "la")
            .join(nb, "lb")
            .select("la", "lb", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias("cos"))
            .collect()
        }
        assert out[(0, 1)] == 0.0        # orthogonal centroids
        assert out[(1, 2)] == 0.7071     # 45 degrees
        assert out[(0, 2)] == 0.7071


def test_growth_accounting_classes_partition_actives(spark):
    """Every active user is exactly one of new/retained/resurrected."""
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_growth_accounting"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected
        assert r.n_churned >= 0


def test_percent_rank_by_key_matches_window_with_ties(spark):
    """The value-grain rank computation == Spark's own row-grain
    percent_rank/cume_dist, on data WITH ties (the fixture's doubles
    rarely tie, so the oracle hash alone under-exercises tie rules)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from legislative_bills_database_spark.operators.stats import (
        percent_rank_by_key,
    )

    rows = [
        (i, k, float(v))
        for i, (k, v) in enumerate(
            [("a", 1), ("a", 2), ("a", 2), ("a", 3), ("a", 3), ("a", 3),
             ("b", 5), ("b", 5), ("c", 9)]
        )
    ]
    df = spark.createDataFrame(rows, "rid long, k string, v double")
    got = {
        r.rid: (r.pr, r.cd)
        for r in percent_rank_by_key(df, "k", "v").collect()
    }
    w = Window.partitionBy("k").orderBy("v")
    want = {
        r.rid: (round(r.pr, 6), round(r.cd, 6))
        for r in df.select(
            "rid",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    assert got == want
    # single-row partition: pr = 0 by convention
    assert got[8] == (0.0, 1.0)
