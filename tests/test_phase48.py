"""Phase-48 semantics pins (VERDICT r8 items #1 and #4).

Each experimentation/drift query already hash-matches its DuckDB twin;
these tests pin the MATH against an independent pure-Python recompute
from the same parquet (numpy/decimal, no Spark, no DuckDB) so an
engine+oracle twin bug cannot hide. Plus the promised zlib-parity test
for compression_ratio and the SURVEY↔registry structural sync.
"""

from __future__ import annotations

import decimal
import re
import zlib
from pathlib import Path

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

REPO = Path(__file__).resolve().parent.parent


def _pdread(table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/{table}.parquet")


def _round_half_up(x: float, nd: int) -> decimal.Decimal:
    """Spark F.round semantics on doubles: HALF_UP on the shortest
    decimal representation (BigDecimal.valueOf == Double.toString ==
    Python repr for finite doubles)."""
    return decimal.Decimal(repr(float(x))).quantize(
        decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP
    )


# ---------------------------------------------------------------------------
# compression_ratio: engine-vs-zlib parity (the claim the docstring makes)
# ---------------------------------------------------------------------------


def test_compression_ratio_zlib_parity(spark):
    """Engine gzip_bytes == len(zlib.compress(text, level)) recomputed
    row-for-row in plain Python on the real documents fixture."""
    from legislative_bills_database_spark.operators.quality import (
        compression_ratio,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    got = {
        r.doc_id: (r.raw_bytes, r.gzip_bytes)
        for r in compression_ratio(docs, "text").collect()
    }
    pdf = _pdread("documents").head(300)
    checked = 0
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        if doc_id not in got:
            continue
        raw, gz = got[doc_id]
        assert raw == len((text or "").encode("utf-8"))
        assert gz == len(zlib.compress((text or "").encode("utf-8"), 6))
        checked += 1
    assert checked >= 150


def test_compression_ratio_null_and_level(spark):
    """NULL text deflates as empty; a different level changes bytes."""
    from legislative_bills_database_spark.operators.quality import (
        compression_ratio,
    )

    df = spark.createDataFrame(
        [(1, "a" * 10_000), (2, None)], "doc_id long, text string"
    )
    r1 = {r.doc_id: r.gzip_bytes for r in compression_ratio(df).collect()}
    assert r1[1] == len(zlib.compress(b"a" * 10_000, 6))
    assert r1[2] == len(zlib.compress(b"", 6))
    r9 = {
        r.doc_id: r.gzip_bytes
        for r in compression_ratio(df, level=9).collect()
    }
    assert r9[1] == len(zlib.compress(b"a" * 10_000, 9))


def test_gzip_ratio_query_runs(spark):
    """The declared query builds a plan and returns the census schema
    (regression: r8 shipped it crashing at plan-build time)."""
    from legislative_bills_database_spark.plans import QUERIES

    df = QUERIES["q_gzip_ratio"](spark, SF_DIR)
    rows = df.collect()
    assert rows and df.columns == [
        "source",
        "n_docs",
        "mean_ratio",
        "n_incompressible",
        "n_boilerplate",
    ]
    assert all(0.0 < r.mean_ratio <= 1.1 for r in rows)


# ---------------------------------------------------------------------------
# q_cuped: θ and variance-reduction vs an exact-integer recompute
# ---------------------------------------------------------------------------


def test_cuped_matches_exact_python_recompute(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_cuped"](spark, SF_DIR).collect()[0]

    orders, customer = _pdread("orders"), _pdread("customer")
    cut = pd.Timestamp("1996-01-01")
    orders = orders.assign(
        cents=(orders["o_totalprice"] * 100).round().astype("int64")
    )
    pre = (
        orders[orders["o_orderdate"] < cut]
        .groupby("o_custkey")["cents"]
        .sum()
    )
    post = (
        orders[orders["o_orderdate"] >= cut]
        .groupby("o_custkey")["cents"]
        .sum()
    )
    xs, ys = [], []
    for ck in customer["c_custkey"]:
        xs.append(int(pre.get(ck, 0)))
        ys.append(int(post.get(ck, 0)))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    cov = float(n * sxy - sx * sy)  # exact ints until the cast
    vx = float(n * sxx - sx * sx)
    vy = float(n * syy - sy * sy)
    theta = cov / vx
    rho2 = (cov / (vx * vy) ** 0.5) ** 2
    assert got.n_units == n
    assert abs(float(got.theta) - theta) < 1e-5
    assert abs(float(got.var_reduction_pct) - rho2 * 100.0) < 1e-4
    # the adjustment must actually help on this fixture
    assert float(got.var_reduction_pct) > 0


# ---------------------------------------------------------------------------
# q_page_hinkley: three-way pin (pure-Python integer replay == Spark ==
# DuckDB, exact equality) — the r9 driver red cell came from the old
# double/decimal-mixed recurrence; the r10 form never leaves BIGINT, so
# all three engines must agree bit-for-bit with NO tolerance.
# ---------------------------------------------------------------------------


def _ph_replay_micro(days: list, rev: list, cnt: list, delta_micro: int):
    """Exact-integer replay of the micro-cents PH recurrence. Python //
    floors; every division here has nonnegative operands, so it equals
    both Spark's truncating `div` and DuckDB's flooring `//`."""
    px = 0
    mt = 0
    mn = None
    best, best_day = None, None
    for t, (d, r, c) in enumerate(zip(days, rev, cnt), start=1):
        xu = (r * 1_000_000) // c
        px += xu
        mt += xu - (px // t) - delta_micro
        mn = mt if mn is None or mt < mn else mn
        dt = mt - mn
        if best is None or dt > best:
            best, best_day = dt, d
    return best, best_day


def test_page_hinkley_three_way_exact(spark):
    """ph_stat_micro from Spark, DuckDB (the registered oracle SQL) and
    a pure-Python integer replay must be EXACTLY equal — the planned-
    divergence regression test ordered by the r9 verdict (item #6)."""
    from tests.oracle_util import duckdb_con
    from legislative_bills_database_spark.plans import ORACLE, QUERIES
    from legislative_bills_database_spark.plans.roundeight_queries import (
        _PH_DELTA_MICRO,
        _PH_LAMBDA_MICRO,
    )

    got = QUERIES["q_page_hinkley"](spark, SF_DIR).collect()[0]

    orders = _pdread("orders")
    orders = orders.assign(
        d=orders["o_orderdate"].dt.date,
        cents=(orders["o_totalprice"] * 100).round().astype("int64"),
    )
    g = (
        orders.groupby("d")
        .agg(c=("cents", "size"), rev=("cents", "sum"))
        .sort_index()
    )
    days = list(g.index)
    stat, peak = _ph_replay_micro(
        days,
        [int(r) for r in g["rev"]],
        [int(c) for c in g["c"]],
        _PH_DELTA_MICRO,
    )

    # Spark == replay, exact
    assert got.n_days == len(days)
    assert int(got.ph_stat_micro) == stat
    assert got.peak_day == peak
    assert got.alarm == (1 if stat > _PH_LAMBDA_MICRO else 0)

    # DuckDB == replay, exact (same oracle SQL the driver will run)
    con = duckdb_con(SF_DIR)
    try:
        drow = con.execute(ORACLE["q_page_hinkley"]).fetchall()[0]
    finally:
        con.close()
    dmap = dict(zip(("n_days", "ph_stat_micro", "alarm", "peak_day"), drow))
    assert int(dmap["ph_stat_micro"]) == stat
    assert dmap["n_days"] == len(days)
    assert dmap["peak_day"] == peak


def test_page_hinkley_recurrence_localizes_planted_shift():
    """PH semantics on a planted shift: a flat-then-jump series peaks
    at/after the shift and the statistic grows with post-shift length
    (the q_cusum planted-shift precedent, driver-free). Series values
    are daily (rev, cnt) pairs in cents with cnt=1."""
    import datetime

    d0 = datetime.date(2024, 1, 1)
    days = [d0 + datetime.timedelta(days=i) for i in range(120)]
    ones = [1] * 120
    series = [100] * 80 + [500] * 40  # shift at index 80 (cents)
    stat, peak = _ph_replay_micro(days, series, ones, delta_micro=1_000_000)
    assert peak == days[-1]  # drift keeps accumulating post-shift
    assert stat > 300 * 39 * 1_000_000  # ≈ (500−mean−δ)·run, micro-cents
    flat, _ = _ph_replay_micro(days, [100] * 120, ones, delta_micro=1_000_000)
    assert flat < 10 * 1_000_000  # no shift → statistic stays near zero


# ---------------------------------------------------------------------------
# q_smd_balance: per-stratum Cohen's d vs an exact-integer recompute
# ---------------------------------------------------------------------------


def test_smd_balance_matches_python_recompute(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = {
        r.n_name: r
        for r in QUERIES["q_smd_balance"](spark, SF_DIR).collect()
    }
    assert got, "fixture must produce at least one stratum"

    customer, nation, orders = (
        _pdread("customer"),
        _pdread("nation"),
        _pdread("orders"),
    )
    ocnt = orders.groupby("o_custkey").size()
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))
    per: dict[str, dict[int, list[int]]] = {}
    for ck, nk, bal in zip(
        customer["c_custkey"], customer["c_nationkey"], customer["c_acctbal"]
    ):
        tr = 1 if bal > 0 else 0
        per.setdefault(nmap[nk], {0: [], 1: []})[tr].append(
            int(ocnt.get(ck, 0))
        )
    for name, arms in per.items():
        n1, n0 = len(arms[1]), len(arms[0])
        if n1 < 2 or n0 < 2:
            assert name not in got
            continue
        s1, s0 = sum(arms[1]), sum(arms[0])
        q1 = sum(v * v for v in arms[1])
        q0 = sum(v * v for v in arms[0])
        v1 = float(n1 * q1 - s1 * s1) / float(n1 * (n1 - 1))
        v0 = float(n0 * q0 - s0 * s0) / float(n0 * (n0 - 1))
        smd = (s1 / n1 - s0 / n0) / (((v1 + v0) / 2.0) ** 0.5)
        r = got[name]
        assert (r.n_treat, r.n_ctrl) == (n1, n0)
        assert abs(float(r.smd_orders) - smd) < 1e-5, name


# ---------------------------------------------------------------------------
# SURVEY.md §2 ↔ registry structural sync (VERDICT r8 item #7)
# ---------------------------------------------------------------------------


def test_survey_and_registry_cannot_drift():
    """Every registered query id appears in SURVEY.md and every
    backticked q_* id in SURVEY.md is a registered query — the drift
    that let four phase-48 queries ship undocumented is structural now."""
    from legislative_bills_database_spark.plans import QUERIES

    survey_ids = set(
        re.findall(r"`(q_[a-z0-9_]+)`", (REPO / "SURVEY.md").read_text())
    )
    reg = set(QUERIES)
    assert reg - survey_ids == set(), (
        f"registered but missing from SURVEY.md: {sorted(reg - survey_ids)}"
    )
    assert survey_ids - reg == set(), (
        f"in SURVEY.md but not registered: {sorted(survey_ids - reg)}"
    )
