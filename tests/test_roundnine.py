"""Round-9 phase-49 semantics pins: each statistic recomputed
independently in pure Python/pandas (midranks via pandas.rank, moments
via float sums) from the same parquet — the engine+oracle twin can't
share a bug with this path.
"""

from __future__ import annotations

import pytest

import pandas as pd

from tests.conftest import SF_DIR


def _pdread(table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/{table}.parquet")


def _order_seg_values():
    orders, customer = _pdread("orders"), _pdread("customer")
    seg = dict(zip(customer["c_custkey"], customer["c_mktsegment"]))
    df = orders.assign(
        seg=orders["o_custkey"].map(seg),
        v=(orders["o_totalprice"] * 100).round().astype("int64"),
    )
    return df[["seg", "v"]]


def test_kruskal_wallis_matches_pandas_ranks(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_kruskal_wallis"](spark, SF_DIR).collect()[0]

    df = _order_seg_values()
    df = df.assign(r=df["v"].rank(method="average"))
    n = len(df)
    srr = sum(
        g["r"].sum() ** 2 / len(g) for _, g in df.groupby("seg")
    )
    h = 12.0 * srr / (n * (n + 1)) - 3.0 * (n + 1)
    tie = sum(
        t**3 - t for t in df["v"].value_counts().tolist()
    )
    h /= 1.0 - tie / float(n**3 - n)
    k = df["seg"].nunique()
    assert got.k_groups == k and got.n_total == n
    assert abs(float(got.h_stat) - h) < 1e-4
    assert abs(float(got.epsilon_sq) - (h - k + 1) / (n - k)) < 1e-6


def test_wilcoxon_signed_matches_pandas_ranks(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_wilcoxon_signed"](spark, SF_DIR).collect()[0]

    orders = _pdread("orders")
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
    d = (
        post.reindex(pre.index.union(post.index), fill_value=0)
        - pre.reindex(pre.index.union(post.index), fill_value=0)
    )
    d = d[d != 0]
    s = pd.DataFrame({"a": d.abs(), "pos": (d > 0).astype(int)})
    s = s.assign(r=s["a"].rank(method="average"))
    n = len(s)
    wplus = float(s.loc[s["pos"] == 1, "r"].sum())
    tie = sum(t**3 - t for t in s["a"].value_counts().tolist())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0
    z = (wplus - n * (n + 1) / 4.0) / var**0.5
    assert got.n_pairs == n
    assert got.n_pos == int(s["pos"].sum())
    assert abs(float(got.w_plus) - wplus) < 1e-6
    assert abs(float(got.z_score) - z) < 1e-5


def test_mcnemar_matches_python_counts(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_mcnemar"](spark, SF_DIR).collect()[0]

    orders = _pdread("orders")
    r1 = (orders["o_totalprice"] * 100).round().astype("int64") > 15_000_000
    r2 = orders["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    n10 = int((r1 & ~r2).sum())
    n01 = int((~r1 & r2).sum())
    assert (got.n10, got.n01) == (n10, n01)
    assert abs(float(got.chi2) - (n10 - n01) ** 2 / (n10 + n01)) < 1e-5
    cc = (abs(n10 - n01) - 1) ** 2 / (n10 + n01)
    assert abs(float(got.chi2_cc) - cc) < 1e-5
    assert got.reject_5pct == (1 if cc > 3.841459 else 0)


def test_jarque_bera_matches_numpy_moments(spark):
    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES

    got = {
        r.flag: r for r in QUERIES["q_jarque_bera"](spark, SF_DIR).collect()
    }
    lineitem = _pdread("lineitem")
    x_all = (lineitem["l_extendedprice"] * 100).round().astype("int64")
    for flag, grp in x_all.groupby(lineitem["l_returnflag"]):
        x = grp.to_numpy(dtype="float64")
        n = len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        sk = ((x - m) ** 3).mean() / m2**1.5
        ku = ((x - m) ** 4).mean() / m2**2 - 3.0
        jb = n / 6.0 * (sk * sk + ku * ku / 4.0)
        r = got[flag]
        assert r.n == n
        assert abs(float(r.jb_stat) - jb) / max(jb, 1.0) < 1e-6, flag
        assert r.reject_5pct == (1 if jb > 5.991465 else 0)
    # cent prices are heavy-tailed-ish: at least one flag must reject
    assert any(r.reject_5pct == 1 for r in got.values())


def test_cluster_agreement_matches_python_pair_counts(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_cluster_agreement"](spark, SF_DIR).collect()[0]

    customer, nation, region = (
        _pdread("customer"),
        _pdread("nation"),
        _pdread("region"),
    )
    nk2reg = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    rk2name = dict(zip(region["r_regionkey"], region["r_name"]))
    ct: dict[tuple, int] = {}
    for seg, nk in zip(customer["c_mktsegment"], customer["c_nationkey"]):
        key = (seg, rk2name[nk2reg[nk]])
        ct[key] = ct.get(key, 0) + 1
    n = sum(ct.values())
    comb2 = lambda c: c * (c - 1) // 2  # noqa: E731
    p = sum(comb2(v) for v in ct.values())
    ai: dict[str, int] = {}
    bj: dict[str, int] = {}
    for (a, b), v in ct.items():
        ai[a] = ai.get(a, 0) + v
        bj[b] = bj.get(b, 0) + v
    pa = sum(comb2(v) for v in ai.values())
    pb = sum(comb2(v) for v in bj.values())
    exp = pa * pb / comb2(n)
    ari = (p - exp) / ((pa + pb) / 2 - exp)
    fm = p / (pa * pb) ** 0.5
    purity = (
        sum(
            max(v for (a2, _), v in ct.items() if a2 == a) for a in ai
        )
        / n
    )
    assert got.n_units == n and got.n_pair_agree == p
    assert abs(float(got.ari) - ari) < 1e-6
    assert abs(float(got.fowlkes_mallows) - fm) < 1e-6
    assert abs(float(got.purity) - purity) < 1e-6


def test_brier_decomp_matches_numpy(spark):
    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_brier_decomp"](spark, SF_DIR).collect()[0]

    orders = _pdread("orders")
    sc = (orders["o_totalprice"] * 100).round().astype("int64").to_numpy()
    y = (orders["o_orderstatus"] == "F").astype("int64").to_numpy()
    mn, mx = sc.min(), sc.max()
    span = mx - mn
    s0 = sc - mn
    pprob = s0 / span
    n = len(sc)
    brier = float(((pprob - y) ** 2).mean())
    assert got.n_orders == n
    assert abs(float(got.brier) - brier) < 1e-5
    bins = (s0 * 10) // (span + 1)
    rel = res = 0.0
    ybar = y.mean()
    for k in np.unique(bins):
        m = bins == k
        nk = int(m.sum())
        conf = pprob[m].mean()
        acc = y[m].mean()
        rel += nk * (conf - acc) ** 2
        res += nk * (acc - ybar) ** 2
    assert abs(float(got.reliability) - rel / n) < 1e-5
    assert abs(float(got.resolution) - res / n) < 1e-5
    assert abs(float(got.uncertainty) - ybar * (1 - ybar)) < 1e-6
    # Murphy residual = mean within-bin variance of p (sanity bound)
    assert float(got.brier) >= float(got.reliability) - float(
        got.resolution
    ) + float(got.uncertainty) - 1e-4


def test_permutation_test_matches_hashlib_replay(spark):
    """Replay all 60 md5 permutations in pure Python (hashlib) — the
    portable-randomness claim verified outside both engines."""
    import hashlib

    from legislative_bills_database_spark.plans import QUERIES
    from legislative_bills_database_spark.plans.roundnine_queries import (
        _PERM_K,
    )

    got = QUERIES["q_permutation_test"](spark, SF_DIR).collect()[0]

    orders, customer = _pdread("orders"), _pdread("customer")
    cust = customer[
        customer["c_mktsegment"].isin(["BUILDING", "MACHINERY"])
    ]
    spend = (
        orders.assign(
            cents=(orders["o_totalprice"] * 100).round().astype("int64")
        )
        .groupby("o_custkey")["cents"]
        .sum()
    )
    units = [
        (
            int(ck),
            1 if seg == "BUILDING" else 0,
            int(spend.get(ck, 0)),
        )
        for ck, seg in zip(cust["c_custkey"], cust["c_mktsegment"])
    ]
    n = len(units)
    n1 = sum(ia for _, ia, _ in units)
    sa = sum(v for _, ia, v in units if ia)
    st = sum(v for _, _, v in units)
    obs = sa / n1 - (st - sa) / (n - n1)
    n_ext = 0
    for seed in range(1, _PERM_K + 1):
        ranked = sorted(
            units,
            key=lambda u: (
                hashlib.md5(f"{seed}:{u[0]}".encode()).hexdigest(),
                u[0],
            ),
        )
        sa_s = sum(v for _, _, v in ranked[:n1])
        diff = sa_s / n1 - (st - sa_s) / (n - n1)
        if abs(diff) >= abs(obs):
            n_ext += 1
    assert got.n_units == n
    assert abs(float(got.obs_diff_cents) - obs) < 1e-4
    assert got.n_perms == _PERM_K
    assert got.n_extreme == n_ext
    assert abs(float(got.p_value) - (1 + n_ext) / (_PERM_K + 1)) < 1e-6


# ---------------------------------------------------------------------------
# phase 50: reliability / agreement pins
# ---------------------------------------------------------------------------


def _three_raters():
    orders = _pdread("orders")
    r1 = (
        (orders["o_totalprice"] * 100).round().astype("int64") > 15_000_000
    ).astype(int)
    r2 = orders["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    r3 = (orders["o_orderstatus"] == "F").astype(int)
    return r1.to_numpy(), r2.to_numpy(), r3.to_numpy()


def test_fleiss_kappa_matches_python(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_fleiss_kappa"](spark, SF_DIR).collect()[0]
    r1, r2, r3 = _three_raters()
    k = r1 + r2 + r3
    n, m = len(k), 3
    p_i = (k**2 + (m - k) ** 2 - m) / (m * (m - 1))
    p_bar = float(p_i.mean())
    p1 = float(k.sum()) / (n * m)
    p_exp = p1**2 + (1 - p1) ** 2
    kappa = (p_bar - p_exp) / (1 - p_exp)
    assert got.n_subjects == n
    assert abs(float(got.p_bar) - p_bar) < 1e-6
    assert abs(float(got.p_exp) - p_exp) < 1e-6
    assert abs(float(got.kappa) - kappa) < 1e-5


def test_cochran_q_matches_python(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_cochran_q"](spark, SF_DIR).collect()[0]
    r1, r2, r3 = _three_raters()
    c = [int(r1.sum()), int(r2.sum()), int(r3.sum())]
    rsum = r1 + r2 + r3
    m = 3
    q = (
        (m - 1)
        * (m * sum(x * x for x in c) - int(rsum.sum()) ** 2)
        / (m * int(rsum.sum()) - int((rsum**2).sum()))
    )
    assert (got.c1, got.c2, got.c3) == tuple(c)
    assert abs(float(got.q_stat) - q) < 1e-4
    assert got.reject_5pct == (1 if q > 5.991465 else 0)


def test_cronbach_alpha_matches_python(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_cronbach_alpha"](spark, SF_DIR).collect()[0]
    orders = _pdread("orders")
    orders = orders.assign(
        cents=(orders["o_totalprice"] * 100).round().astype("int64"),
        yr=orders["o_orderdate"].dt.year,
    )
    items = []
    custs = None
    for y in (1994, 1995, 1996):
        s = (
            orders[orders["yr"] == y]
            .groupby("o_custkey")["cents"]
            .sum()
        )
        items.append(s)
    all_custs = sorted(orders["o_custkey"].unique())
    import numpy as np

    mat = np.array(
        [[int(s.get(c, 0)) for c in all_custs] for s in items],
        dtype="float64",
    )
    v_items = mat.var(axis=1, ddof=1).sum()
    v_tot = mat.sum(axis=0).var(ddof=1)
    alpha = 1.5 * (1 - v_items / v_tot)
    assert got.n_units == len(all_custs)
    assert abs(float(got.alpha) - alpha) < 1e-5
    # TPC-H yearly spends are near-independent draws, so alpha sits
    # near zero (can be slightly negative) — bound, don't sign-pin
    assert -1.0 < float(got.alpha) <= 1.0


def test_icc_matches_python(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_icc"](spark, SF_DIR).collect()[0]
    orders, customer = _pdread("orders"), _pdread("customer")
    ocnt = orders.groupby("o_custkey").size()
    groups: dict[int, list[int]] = {}
    for ck, nk in zip(customer["c_custkey"], customer["c_nationkey"]):
        groups.setdefault(int(nk), []).append(int(ocnt.get(ck, 0)))
    g = len(groups)
    n = sum(len(v) for v in groups.values())
    st = sum(sum(v) for v in groups.values())
    qt = sum(sum(x * x for x in v) for v in groups.values())
    sgb = sum(sum(v) ** 2 / len(v) for v in groups.values())
    msb = (sgb - st**2 / n) / (g - 1)
    msw = (qt - sgb) / (n - g)
    k0 = (n - sum(len(v) ** 2 for v in groups.values()) / n) / (g - 1)
    icc1 = (msb - msw) / (msb + (k0 - 1) * msw)
    assert (got.n_groups, got.n_units) == (g, n)
    assert abs(float(got.k0) - k0) < 1e-4
    assert abs(float(got.icc1) - icc1) < 1e-5


# ---------------------------------------------------------------------------
# phase 51: time-series diagnostics + integrity pins
# ---------------------------------------------------------------------------


def _daily_revenue():
    orders = _pdread("orders")
    g = (
        orders.assign(
            d=orders["o_orderdate"].dt.date,
            cents=(orders["o_totalprice"] * 100).round().astype("int64"),
        )
        .groupby("d")["cents"]
        .sum()
        .sort_index()
    )
    return g.to_numpy(dtype="float64")


def test_ljung_box_matches_numpy_acf(spark):
    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_ljung_box"](spark, SF_DIR).collect()[0]
    x = _daily_revenue()
    n = len(x)
    xc = x - x.mean()
    den = float((xc**2).sum())
    q = 0.0
    for k in range(1, 7):
        rho = float((xc[k:] * xc[:-k]).sum()) / den
        q += rho * rho / (n - k)
    q *= n * (n + 2)
    assert got.n_days == n
    assert abs(float(got.q_stat) - q) < 1e-3
    assert got.reject_5pct == (1 if q > 12.591587 else 0)


def test_durbin_watson_matches_numpy_ols(spark):
    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_durbin_watson"](spark, SF_DIR).collect()[0]
    y = _daily_revenue()
    n = len(y)
    t = np.arange(1, n + 1, dtype="float64")
    b = ((n * (t * y).sum()) - t.sum() * y.sum()) / (
        n * (t * t).sum() - t.sum() ** 2
    )
    a = (y.sum() - b * t.sum()) / n
    e = y - a - b * t
    dw = float(((e[1:] - e[:-1]) ** 2).sum() / (e**2).sum())
    assert got.n_days == n
    assert abs(float(got.dw_stat) - dw) < 1e-4
    assert abs(float(got.rho_hat) - (1 - dw / 2)) < 1e-4


def test_theil_sen_matches_python_median_of_slopes(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_theil_sen"](spark, SF_DIR).collect()[0]
    orders = _pdread("orders")
    g = (
        orders.assign(
            t=orders["o_orderdate"].dt.year * 12
            + orders["o_orderdate"].dt.month,
            cents=(orders["o_totalprice"] * 100).round().astype("int64"),
        )
        .groupby("t")["cents"]
        .sum()
        .sort_index()
    )
    ts = list(g.index)
    ys = [int(v) for v in g.to_numpy()]
    slopes = sorted(
        (ys[j] - ys[i]) / (ts[j] - ts[i])
        for i in range(len(ts))
        for j in range(i + 1, len(ts))
    )
    m = len(slopes)
    med = (slopes[(m + 1) // 2 - 1] + slopes[m // 2]) / 2
    resid = sorted(y - med * t for t, y in zip(ts, ys))
    n = len(resid)
    inter = (resid[(n + 1) // 2 - 1] + resid[n // 2]) / 2
    assert (got.n_months, got.n_pairs) == (len(ts), m)
    assert abs(float(got.slope_cents_per_month) - med) < 1e-4
    assert abs(float(got.intercept_cents) - inter) < 1e-3


def test_table_fingerprint_localizes_a_tampered_row(spark, tmp_path):
    """Copy the sf dir, flip ONE order's status, and the fingerprint
    must differ in EXACTLY the tampered key's bucket (sum+xor flip,
    count equal) — the replica-verification property, end to end."""
    import shutil

    from legislative_bills_database_spark.plans import QUERIES

    src = f"{SF_DIR}/orders.parquet"
    tdir = tmp_path / "sf_tampered"
    tdir.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", tdir / f"{t}.parquet")
    pdf = pd.read_parquet(src)
    key = int(pdf["o_orderkey"].iloc[17])
    pdf.loc[pdf["o_orderkey"] == key, "o_orderstatus"] = "Z"
    pdf.to_parquet(tdir / "orders.parquet", index=False)

    base = {
        r.bucket: r for r in QUERIES["q_table_fingerprint"](spark, SF_DIR).collect()
    }
    tam = {
        r.bucket: r
        for r in QUERIES["q_table_fingerprint"](spark, str(tdir)).collect()
    }
    assert set(base) == set(tam)
    diff = [b for b in base if base[b] != tam[b]]
    assert diff == [key % 64]
    b = diff[0]
    assert base[b].n_rows == tam[b].n_rows  # same cardinality
    assert base[b].hash_sum != tam[b].hash_sum
    assert base[b].hash_xor != tam[b].hash_xor


def test_table_fingerprint_row_hash_matches_hashlib(spark):
    """The per-row fold replays in pure Python: md5 of the canonical
    '|'-joined projection, first 8 hex nibbles as an int."""
    import hashlib

    from legislative_bills_database_spark.plans import QUERIES

    got = {
        r.bucket: r
        for r in QUERIES["q_table_fingerprint"](spark, SF_DIR).collect()
    }
    pdf = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    sums: dict[int, int] = {}
    xors: dict[int, int] = {}
    counts: dict[int, int] = {}
    for ok, ck, tp, st, dt in zip(
        pdf["o_orderkey"],
        pdf["o_custkey"],
        pdf["o_totalprice"],
        pdf["o_orderstatus"],
        pdf["o_orderdate"],
    ):
        cents = int(round(tp * 100))
        s = f"{ok}|{ck}|{cents}|{st}|{pd.Timestamp(dt).date()}"
        h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        b = int(ok) % 64
        sums[b] = sums.get(b, 0) + h
        xors[b] = xors.get(b, 0) ^ h
        counts[b] = counts.get(b, 0) + 1
    for b, r in got.items():
        assert r.n_rows == counts[b]
        assert r.hash_sum == sums[b], b
        assert r.hash_xor == xors[b], b


@pytest.mark.slow  # r15 fast-lane: measured-heavy (see pytest.ini)
def test_stream_state_census_certifies_store_size(spark):
    """The windowed-agg state store must hold exactly one row per
    (hour, event_type) group after the last micro-batch under BOTH
    providers (HDFS-backed and RocksDB — VERDICT r10 #7), report a
    positive measured footprint each, and the two providers' update
    streams must be row-identical."""
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_stream_state_census"](spark, SF_DIR).collect()[0]
    assert r.n_microbatches == 4
    assert r.rows_match == 1
    assert r.providers_agree == 1
    assert r.state_rows_final == r.n_groups_batch > 0
    assert r.hdfs_memory_bytes > 0
    assert 0 < r.hdfs_bytes_per_row < 10_000
    assert r.rocksdb_memory_bytes > 0
    assert 0 < r.rocksdb_bytes_per_row < 10_000


# ---------------------------------------------------------------------------
# phase 52: trend / changepoint / influence pins
# ---------------------------------------------------------------------------


def _monthly_revenue():
    orders = _pdread("orders")
    g = (
        orders.assign(
            t=orders["o_orderdate"].dt.year * 12
            + orders["o_orderdate"].dt.month,
            cents=(orders["o_totalprice"] * 100).round().astype("int64"),
        )
        .groupby("t")["cents"]
        .sum()
        .sort_index()
    )
    return [int(v) for v in g.to_numpy()]


def test_mann_kendall_matches_python(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_mann_kendall"](spark, SF_DIR).collect()[0]
    ys = _monthly_revenue()
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(
        c * (c - 1) * (2 * c + 5) for c in Counter(ys).values() if c > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    z = (s - 1) / var**0.5 if s > 0 else (s + 1) / var**0.5 if s < 0 else 0.0
    assert (got.n_months, got.s_stat) == (n, s)
    assert abs(float(got.var_s) - var) < 1e-4
    assert abs(float(got.z_score) - z) < 1e-5


def test_binseg_matches_python_argmax(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_binseg_changepoint"](spark, SF_DIR).collect()[0]
    y = [int(v) for v in _daily_revenue()]
    n = len(y)
    st = sum(y)
    best, best_t = None, None
    sp = 0
    for t in range(1, n):
        sp += y[t - 1]
        g = sp * sp / t + (st - sp) ** 2 / (n - t) - st * st / n
        if best is None or g > best + 1e-9:
            best, best_t = g, t
    assert got.n_days == n
    assert got.split_index == best_t
    assert abs(float(got.gain_dollars_sq) - best / 1e8) < 1e-2


def test_binseg_localizes_planted_shift(spark):
    """A synthetic flat-then-jump series: the argmax split must land
    exactly on the planted boundary."""
    import datetime

    from pyspark.sql import functions as F

    from legislative_bills_database_spark.plans.roundnine_queries import (
        q_binseg_changepoint,
    )

    # build a tampered orders table: one order per day, value 100 then 500
    d0 = datetime.date(2020, 1, 1)
    rows = [
        (
            i,
            1,
            "F",
            1.00 if i < 70 else 5.00,
            datetime.datetime(2020, 1, 1) + datetime.timedelta(days=i),
            "1-URGENT",
        )
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    import tempfile

    tmp = tempfile.mkdtemp(prefix="binseg_")
    for t in (
        "region nation customer supplier part lineitem events documents "
        "embeddings"
    ).split():
        import shutil

        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{tmp}/{t}.parquet")
    df.write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    r = q_binseg_changepoint(spark, tmp).collect()[0]
    assert r.split_index == 70  # last index of the low segment
    assert abs(r.mean_before_dollars - 1.00) < 0.01
    assert abs(r.mean_after_dollars - 5.00) < 0.01


def test_ols_influence_matches_numpy(spark):
    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_ols_influence"](spark, SF_DIR).collect()
    y = _daily_revenue()
    n = len(y)
    t = np.arange(1, n + 1, dtype="float64")
    b = ((n * (t * y).sum()) - t.sum() * y.sum()) / (
        n * (t * t).sum() - t.sum() ** 2
    )
    a = (y.sum() - b * t.sum()) / n
    e = y - a - b * t
    h = 1.0 / n + (t - t.mean()) ** 2 / ((t - t.mean()) ** 2).sum()
    s2 = (e**2).sum() / (n - 2)
    cook = e**2 / (2 * s2) * h / (1 - h) ** 2
    top = np.argsort(-cook)[:10]
    assert len(got) == 10
    assert abs(float(got[0].cook_d) - float(cook[top[0]])) < 1e-4
    # engine's top-10 cook values match numpy's (order-insensitive set)
    eng = sorted(float(r.cook_d) for r in got)
    ref = sorted(float(cook[i]) for i in top)
    for a_, b_ in zip(eng, ref):
        assert abs(a_ - b_) < 1e-4


def test_grubbs_matches_numpy(spark):
    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_grubbs"](spark, SF_DIR).collect()[0]
    y = _daily_revenue()
    n = len(y)
    z = np.abs(y - y.mean()) / y.std(ddof=1)
    assert got.n_days == n
    assert abs(float(got.g_stat) - float(z.max())) < 1e-5
    assert got.outlier_cents == int(y[int(np.argmax(z))])


# ---------------------------------------------------------------------------
# phase 53: sampling design, inequality, ordinal agreement pins
# ---------------------------------------------------------------------------


def test_neyman_allocation_matches_python(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = {
        r.seg: r
        for r in QUERIES["q_neyman_allocation"](spark, SF_DIR).collect()
    }
    df = _order_seg_values()
    import numpy as np

    shares = {}
    for seg, grp in df.groupby("seg"):
        v = grp["v"].to_numpy(dtype="float64")
        shares[seg] = len(v) * v.std(ddof=1)
    tot = sum(shares.values())
    assert set(got) == set(shares)
    for seg, w in shares.items():
        assert abs(float(got[seg].alloc_share) - w / tot) < 1e-5, seg
        assert abs(got[seg].alloc_n_of_1000 - round(1000 * w / tot)) <= 1
    # shares sum to 1 and bigger/more-volatile strata get more
    assert abs(sum(float(r.alloc_share) for r in got.values()) - 1) < 1e-4


def test_atkinson_matches_python(spark):
    import math

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_atkinson"](spark, SF_DIR).collect()[0]
    orders = _pdread("orders")
    per = (
        orders.assign(
            cents=(orders["o_totalprice"] * 100).round().astype("int64")
        )
        .groupby("o_custkey")["cents"]
        .sum()
    )
    vals = [int(v) for v in per.to_numpy()]
    mean = sum(vals) / len(vals)
    geo = math.exp(sum(math.log(v) for v in vals) / len(vals))
    atk = 1 - geo / mean
    assert got.n_customers == len(vals)
    assert abs(float(got.atkinson_eps1) - atk) < 1e-5
    assert 0 <= float(got.atkinson_eps1) < 1


def _ordinal_raters():
    orders = _pdread("orders")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    r1 = cents.map(lambda c: 2 if c > 25_000_000 else 1 if c > 10_000_000 else 0)
    pri = orders["o_orderpriority"]
    r2 = pri.map(
        lambda p: 2 if p in ("1-URGENT", "2-HIGH") else 1 if p == "3-MEDIUM" else 0
    )
    return [int(a) for a in r1], [int(b) for b in r2]


def test_weighted_kappa_matches_python(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_weighted_kappa"](spark, SF_DIR).collect()[0]
    r1, r2 = _ordinal_raters()
    n = len(r1)
    wo = sum(abs(a - b) for a, b in zip(r1, r2))
    from collections import Counter

    rm, cm = Counter(r1), Counter(r2)
    we = sum(
        abs(i - j) * rm[i] * cm[j] for i in rm for j in cm
    )
    kw = 1 - wo * n / we
    assert got.n_orders == n and got.disagree_weight == wo
    assert abs(float(got.kappa_w) - kw) < 1e-5


def test_somers_d_matches_python(spark):
    from collections import Counter

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_somers_d"](spark, SF_DIR).collect()[0]
    r1, r2 = _ordinal_raters()
    ct = Counter(zip(r1, r2))
    c = d = 0
    for (xa, ya), na in ct.items():
        for (xb, yb), nb in ct.items():
            if xb > xa and yb > ya:
                c += na * nb
            elif xb > xa and yb < ya:
                d += na * nb
    n = len(r1)
    rm = Counter(r1)
    tx = sum(v * (v - 1) // 2 for v in rm.values())
    gamma = (c - d) / (c + d)
    dyx = (c - d) / (n * (n - 1) / 2 - tx)
    assert (got.concordant, got.discordant) == (c, d)
    assert abs(float(got.gamma) - gamma) < 1e-6
    assert abs(float(got.somers_d_yx) - dyx) < 1e-6
    # value should positively predict priority? no real relation in
    # TPC-H synthetic data — bound only
    assert -1 <= float(got.somers_d_yx) <= 1


# ---------------------------------------------------------------------------
# phase 54: greedy selection pins (pure-Python replays)
# ---------------------------------------------------------------------------


def test_mmr_select_matches_python_greedy(spark):
    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES
    from legislative_bills_database_spark.plans.roundnine_queries import (
        _MMR_CANDS,
        _MMR_K,
        _MMR_LAMBDA,
    )

    got = QUERIES["q_mmr_select"](spark, SF_DIR).collect()
    emb = _pdread("embeddings")
    vecs = {
        int(v): np.asarray(e, dtype="float64")
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    probe = vecs[0]

    def cos(a, b):
        return float(a @ b) / (float(np.sqrt(a @ a)) * float(np.sqrt(b @ b)))

    rel = {
        v: round(cos(e, probe), 9) for v, e in vecs.items() if v != 0
    }
    cand = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_CANDS]
    sel = [min(cand, key=lambda v: (-rel[v], v))]
    for _k in range(2, _MMR_K + 1):
        best, best_s = None, None
        for c in cand:
            if c in sel:
                continue
            ms = max(round(cos(vecs[c], vecs[s]), 9) for s in sel)
            s = round(_MMR_LAMBDA * rel[c] - (1 - _MMR_LAMBDA) * ms, 9)
            if best is None or s > best_s or (s == best_s and c < best):
                best, best_s = c, s
        sel.append(best)
    assert [r.vec_id for r in sorted(got, key=lambda r: r.pick)] == sel
    # diversity property: MMR must deviate from pure top-k after pick 1
    topk = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_K]
    assert sel[0] == topk[0]


def test_greedy_coverage_matches_python_greedy(spark):
    from legislative_bills_database_spark.plans import QUERIES
    from legislative_bills_database_spark.plans.roundnine_queries import (
        _COV_DOCS,
        _COV_K,
    )

    got = QUERIES["q_greedy_coverage"](spark, SF_DIR).collect()
    docs = _pdread("documents")
    pool = docs.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).head(_COV_DOCS)

    def bigrams(text):
        ws = str(text).lower().split(" ")
        return {f"{a} {b}" for a, b in zip(ws, ws[1:])}

    toks = {int(r.doc_id): bigrams(r.text) for r in pool.itertuples()}
    covered: set = set()
    sel = []
    for k in range(1, _COV_K + 1):
        best, best_g = None, None
        for d, ts in toks.items():
            if d in [s[0] for s in sel]:
                continue
            g = len(ts - covered)
            if best is None or g > best_g or (g == best_g and d < best):
                best, best_g = d, g
        if best_g == 0:  # full coverage — the chain stops early
            break
        sel.append((best, k, best_g))
        covered |= toks[best]
    eng = [(r.doc_id, r.pick, r.new_tokens) for r in
           sorted(got, key=lambda r: r.pick)]
    assert eng == sel
    assert len(sel) >= 2  # bigram universe must be non-degenerate
    # submodularity: marginal gains must be non-increasing
    gains = [g for _, _, g in sel]
    assert all(a >= b for a, b in zip(gains, gains[1:]))


# ---------------------------------------------------------------------------
# phase 55: probability-model evaluation pins
# ---------------------------------------------------------------------------


def test_hosmer_lemeshow_matches_numpy(spark):
    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_hosmer_lemeshow"](spark, SF_DIR).collect()[0]
    orders = _pdread("orders")
    sc = (orders["o_totalprice"] * 100).round().astype("int64").to_numpy()
    y = (orders["o_orderstatus"] == "F").astype("int64").to_numpy()
    mn, mx = sc.min(), sc.max()
    span = mx - mn
    s0 = sc - mn
    bins = (s0 * 10) // (span + 1)
    h = 0.0
    g = 0
    for k in np.unique(bins):
        m = bins == k
        nk = int(m.sum())
        ok = int(y[m].sum())
        ek = float(s0[m].sum()) / span
        pbar = ek / nk
        h += (ok - ek) ** 2 / (ek * (1 - pbar))
        g += 1
    assert got.n_bins == g
    assert abs(float(got.hl_stat) - h) < 1e-3
    assert got.reject_5pct == (1 if h > 15.507313 else 0)


def test_gains_lift_matches_numpy(spark):
    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES

    got = {
        r.score_bin: r for r in QUERIES["q_gains_lift"](spark, SF_DIR).collect()
    }
    orders = _pdread("orders")
    sc = (orders["o_totalprice"] * 100).round().astype("int64").to_numpy()
    y = (orders["o_orderstatus"] == "F").astype("int64").to_numpy()
    mn, mx = sc.min(), sc.max()
    bins = ((sc - mn) * 10) // (mx - mn + 1)
    nt, et = len(y), int(y.sum())
    cn = ce = 0
    for k in sorted(np.unique(bins), reverse=True):
        m = bins == k
        cn += int(m.sum())
        ce += int(y[m].sum())
        r = got[int(k)]
        assert r.n_rows == int(m.sum()) and r.n_events == int(y[m].sum())
        assert abs(float(r.cum_capture) - ce / et) < 1e-6
        assert abs(float(r.cum_lift) - (ce / cn) / (et / nt)) < 1e-6
    # full-population row must have capture 1 and lift 1
    last = got[min(got)]
    assert abs(float(last.cum_capture) - 1.0) < 1e-9
    assert abs(float(last.cum_lift) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# phase 56: experiment-design pins
# ---------------------------------------------------------------------------


def _conv_arms():
    ev = _pdread("events")
    per = (
        ev.assign(p=(ev["event_type"] == "purchase").astype(int))
        .groupby("user_id")["p"]
        .sum()
    )
    conv = {int(u): 1 if c >= 14 else 0 for u, c in per.items()}
    a = [v for u, v in conv.items() if u % 2 == 0]
    b = [v for u, v in conv.items() if u % 2 == 1]
    return a, b


def test_tost_matches_python(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_tost_equivalence"](spark, SF_DIR).collect()[0]
    a, b = _conv_arms()
    na, nb = len(a), len(b)
    pa, pb = sum(a) / na, sum(b) / nb
    se = (pa * (1 - pa) / na + pb * (1 - pb) / nb) ** 0.5
    zl = (pa - pb + 0.05) / se
    zu = (pa - pb - 0.05) / se
    assert (got.n_a, got.n_b) == (na, nb)
    assert abs(float(got.z_lower) - zl) < 1e-5
    assert abs(float(got.z_upper) - zu) < 1e-5
    assert got.equivalent_5pct == (
        1 if zl > 1.644854 and zu < -1.644854 else 0
    )
    # at sf0.001 only ~15 users qualify — far too few to CERTIFY
    # equivalence (that is the point of TOST: small n ⇒ no certificate);
    # the decision just has to agree with the recompute (asserted above)
    assert got.equivalent_5pct in (0, 1)


def test_power_sample_size_matches_python(spark):
    import math

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_power_sample_size"](spark, SF_DIR).collect()[0]
    a, b = _conv_arms()
    pa, pb = sum(a) / len(a), sum(b) / len(b)
    zsum2 = (1.959964 + 0.841621) ** 2
    var = pa * (1 - pa) + pb * (1 - pb)
    assert got.n_per_arm_2pp == math.ceil(zsum2 * var / 0.02**2)
    assert got.n_per_arm_5pp == math.ceil(zsum2 * var / 0.05**2)
    # the 2pp design must need ~6.25x the 5pp design
    assert 5.5 < got.n_per_arm_2pp / got.n_per_arm_5pp < 7.0


def test_cramers_v_matches_python(spark):
    from collections import Counter

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_cramers_v"](spark, SF_DIR).collect()[0]
    customer, nation = _pdread("customer"), _pdread("nation")
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ct = Counter(
        (seg, nmap[nk])
        for seg, nk in zip(
            customer["c_mktsegment"], customer["c_nationkey"]
        )
    )
    rm = Counter()
    cm = Counter()
    for (a, b), n in ct.items():
        rm[a] += n
        cm[b] += n
    nt = sum(ct.values())
    chi2 = sum(
        (ct.get((a, b), 0) - rm[a] * cm[b] / nt) ** 2
        / (rm[a] * cm[b] / nt)
        for a in rm
        for b in cm
    )
    v = (chi2 / (nt * min(len(rm) - 1, len(cm) - 1))) ** 0.5
    assert got.n_customers == nt
    assert (got.n_rows_cat, got.n_cols_cat) == (len(rm), len(cm))
    assert abs(float(got.chi2) - chi2) < 1e-3
    assert abs(float(got.cramers_v) - v) < 1e-5
    # V is biased upward on sparse grids (125 cells / 150 customers at
    # sf0.001) — bound loosely; the exact value is pinned above
    assert 0.0 <= float(got.cramers_v) <= 1.0


# ---------------------------------------------------------------------------
# phase 57: effect sizes + interval estimation pins
# ---------------------------------------------------------------------------


def test_hedges_g_matches_numpy(spark):
    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_hedges_g"](spark, SF_DIR).collect()[0]
    df = _order_seg_values()
    a = df.loc[df["seg"] == "BUILDING", "v"].to_numpy(dtype="float64")
    b = df.loc[df["seg"] == "MACHINERY", "v"].to_numpy(dtype="float64")
    n1, n2 = len(a), len(b)
    sp = (
        ((a.var(ddof=1) * (n1 - 1)) + (b.var(ddof=1) * (n2 - 1)))
        / (n1 + n2 - 2)
    ) ** 0.5
    d = (a.mean() - b.mean()) / sp
    g = d * (1 - 3 / (4 * (n1 + n2) - 9))
    assert (got.n_building, got.n_machinery) == (n1, n2)
    assert abs(float(got.cohens_d) - d) < 1e-5
    assert abs(float(got.hedges_g) - g) < 1e-5
    assert abs(float(got.hedges_g)) < abs(float(got.cohens_d))


def test_corr_ci_matches_numpy(spark):
    import math

    import numpy as np

    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_corr_ci"](spark, SF_DIR).collect()[0]
    orders = _pdread("orders")
    per = orders.assign(
        cents=(orders["o_totalprice"] * 100).round().astype("int64")
    ).groupby("o_custkey").agg(x=("cents", "size"), y=("cents", "sum"))
    r = float(np.corrcoef(per["x"], per["y"])[0, 1])
    n = len(per)
    z = 0.5 * math.log((1 + r) / (1 - r))
    half = 1.959964 / (n - 3) ** 0.5
    lo, hi = math.tanh(z - half), math.tanh(z + half)
    assert got.n_customers == n
    assert abs(float(got.pearson_r) - r) < 1e-5
    assert abs(float(got.ci_lo) - lo) < 1e-5
    assert abs(float(got.ci_hi) - hi) < 1e-5
    # count and total spend must be strongly positively correlated
    assert float(got.ci_lo) > 0.5


def test_wilson_ci_matches_python(spark):
    from legislative_bills_database_spark.plans import QUERIES

    got = QUERIES["q_wilson_ci"](spark, SF_DIR).collect()[0]
    ev = _pdread("events")
    per = (
        ev.assign(p=(ev["event_type"] == "purchase").astype(int))
        .groupby("user_id")["p"]
        .sum()
    )
    n = len(per)
    k = int((per >= 14).sum())
    p = k / n
    z = 1.959964
    center = p + z * z / (2 * n)
    half = z * (p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5
    denom = 1 + z * z / n
    assert (got.n_users, got.n_converted) == (n, k)
    assert abs(float(got.wilson_lo) - (center - half) / denom) < 1e-6
    assert abs(float(got.wilson_hi) - (center + half) / denom) < 1e-6
    # Wilson interval must bracket p_hat and stay inside [0, 1]
    assert 0 <= float(got.wilson_lo) <= p <= float(got.wilson_hi) <= 1
