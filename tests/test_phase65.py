"""Round-11 phase-65/66 pins: FIFO allocation, fairness/privacy
censuses, isotonic calibration, SPRT, MMD, Shapley.

Each statistical query gets a pure-Python replay on the real sf0.001
fixture (the three-way-pin discipline: the registered DuckDB oracle
covers engine parity, the replay here pins the MATH — a bug shared by
both SQL twins would hash-match and still be wrong)."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


# ---------------------------------------------------------------------------
# FIFO allocation: conservation + no lot over-consumed
# ---------------------------------------------------------------------------


def test_fifo_allocation_conserves_quantities(spark):
    rows = QUERIES["q_fifo_allocation"](spark, SF).collect()
    per_part = defaultdict(int)
    per_lot = defaultdict(int)
    per_claim = defaultdict(int)
    for r in rows:
        assert r.qty_matched > 0
        per_part[r.part] += r.qty_matched
        per_lot[(r.part, r.s_ord, r.s_line)] += r.qty_matched
        per_claim[(r.part, r.r_ord, r.r_line)] += r.qty_matched
    con = _con()
    ship = {
        (p, o, ln): q
        for p, o, ln, q in con.execute(
            "SELECT l_partkey, l_orderkey, l_linenumber, "
            "CAST(l_quantity AS BIGINT) FROM lineitem "
            "WHERE l_returnflag <> 'R'"
        ).fetchall()
    }
    ret = {
        (p, o, ln): q
        for p, o, ln, q in con.execute(
            "SELECT l_partkey, l_orderkey, l_linenumber, "
            "CAST(l_quantity AS BIGINT) FROM lineitem "
            "WHERE l_returnflag = 'R'"
        ).fetchall()
    }
    tot_s, tot_r = defaultdict(int), defaultdict(int)
    for (p, _, _), q in ship.items():
        tot_s[p] += q
    for (p, _, _), q in ret.items():
        tot_r[p] += q
    # total matched per part = min(shipped, returned) — FIFO allocates
    # every unit it can, never more
    for p in set(tot_s) | set(tot_r):
        assert per_part.get(p, 0) == min(tot_s.get(p, 0), tot_r.get(p, 0))
    # no lot gives more than it holds; no claim takes more than it asks
    for k, q in per_lot.items():
        assert q <= ship[k]
    for k, q in per_claim.items():
        assert q <= ret[k]


# ---------------------------------------------------------------------------
# fairness + privacy censuses
# ---------------------------------------------------------------------------


def test_disparate_impact_best_group_is_one(spark):
    rows = QUERIES["q_disparate_impact"](spark, SF).collect()
    ratios = sorted(r.impact_ratio for r in rows)
    assert ratios[-1] == 1.0
    for r in rows:
        assert 0 <= r.selection_rate <= 1
        assert (r.four_fifths_flag == 1) == (
            r.n_positive / r.n_customers
            < 0.8 * max(x.n_positive / x.n_customers for x in rows)
        )


def test_t_closeness_bounds_and_python_replay(spark):
    rows = {r.nation: r for r in QUERIES["q_t_closeness"](spark, SF).collect()}
    con = _con()
    data = con.execute(
        "SELECT c_nationkey, NTILE(10) OVER (ORDER BY c_acctbal, "
        "c_custkey) - 1 AS b FROM customer"
    ).fetchall()
    glob = [0] * 10
    per = defaultdict(lambda: [0] * 10)
    for nat, b in data:
        glob[b] += 1
        per[nat][b] += 1
    n = sum(glob)
    for nat, cnts in per.items():
        ng = sum(cnts)
        cg = cglob = acc = 0
        for i in range(9):
            cg += cnts[i]
            cglob += glob[i]
            acc += abs(cg * n - cglob * ng)
        emd = acc / (ng * n * 9)
        assert abs(rows[nat].emd - round(emd, 6)) < 1e-9
        assert 0 <= rows[nat].emd <= 1
        assert rows[nat].t_flag == (1 if emd > 0.2 else 0)


# ---------------------------------------------------------------------------
# isotonic calibration: PAVA replay + monotonicity
# ---------------------------------------------------------------------------


def _pava(pairs):
    """Classic pool-adjacent-violators on (n, pos) bins in order."""
    blocks = [[n, p] for n, p in pairs]  # [weight, positives]
    out_idx = [[i] for i in range(len(pairs))]
    i = 0
    while i < len(blocks) - 1:
        r1 = blocks[i][1] / blocks[i][0]
        r2 = blocks[i + 1][1] / blocks[i + 1][0]
        if r1 <= r2:
            i += 1
            continue
        blocks[i][0] += blocks[i + 1][0]
        blocks[i][1] += blocks[i + 1][1]
        out_idx[i] += out_idx[i + 1]
        del blocks[i + 1], out_idx[i + 1]
        i = max(i - 1, 0)
    fitted = {}
    for blk, idxs in zip(blocks, out_idx):
        for j in idxs:
            fitted[j] = blk[1] / blk[0]
    return fitted


def test_isotonic_matches_pava_and_is_monotone(spark):
    got = sorted(
        QUERIES["q_isotonic_calibration"](spark, SF).collect(),
        key=lambda r: r.bin,
    )
    iso = [r.iso_rate for r in got]
    assert iso == sorted(iso), "isotonic fit must be non-decreasing"
    con = _con()
    bins = con.execute(
        """
        WITH s AS (
          SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS sc,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
          FROM orders
        ), mm AS (SELECT MIN(sc) AS mn, MAX(sc) AS mx FROM s)
        SELECT CAST(((sc - mm.mn) * 10) // (mm.mx - mm.mn + 1) AS INTEGER)
                 AS bin, COUNT(*) AS n, SUM(y) AS pos
        FROM s, mm GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    fitted = _pava([(n, p) for _, n, p in bins])
    for pos_idx, r in enumerate(got):
        assert abs(r.iso_rate - round(fitted[pos_idx], 6)) < 1e-9


# ---------------------------------------------------------------------------
# SPRT: pure-Decimal replay of the likelihood walk
# ---------------------------------------------------------------------------


def test_sprt_python_replay(spark):
    r = QUERIES["q_sprt_decision"](spark, SF).collect()[0]
    con = _con()
    hourly = con.execute(
        "SELECT date_trunc('hour', ts) AS h, "
        "SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) s, "
        "SUM(CASE WHEN event_type='purchase' THEN 0 ELSE 1 END) f "
        "FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    c1, c0, a = (
        Decimal("0.405465108"),
        Decimal("-0.133531393"),
        Decimal("2.944438979"),
    )
    l = Decimal(0)
    decision, crossed_at = "continue", None
    for h, s, f in hourly:
        l += s * c1 + f * c0
        if decision == "continue":
            if l >= a:
                decision, crossed_at = "accept_h1", h
            elif l <= -a:
                decision, crossed_at = "accept_h0", h
    assert r.decision == decision
    assert r.n_hours == len(hourly)
    assert abs(r.final_llr - round(float(l), 6)) < 1e-9
    if crossed_at is not None:
        assert r.crossed_at == crossed_at.strftime("%Y-%m-%d %H:%M:%S")


# ---------------------------------------------------------------------------
# MMD: integer replay; identical samples → exactly 0
# ---------------------------------------------------------------------------


def test_mmd_python_replay(spark):
    r = QUERIES["q_mmd_poly"](spark, SF).collect()[0]
    con = _con()
    vecs = con.execute(
        "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 400"
    ).fetchall()
    q = {
        vid: [int(round(float(x) * 100)) for x in emb]
        for vid, emb in vecs
    }
    ids = sorted(q)
    s = {"aa": 0, "bb": 0, "ab": 0}
    n = {"aa": 0, "bb": 0, "ab": 0}
    for i, ia in enumerate(ids):
        for ib in ids[i + 1 :]:
            d = sum(x * y for x, y in zip(q[ia], q[ib]))
            g = (
                "aa"
                if ia % 2 == 0 and ib % 2 == 0
                else "bb"
                if ia % 2 == 1 and ib % 2 == 1
                else "ab"
            )
            s[g] += d * d
            n[g] += 1
    assert (r.n_aa, r.n_bb, r.n_ab) == (n["aa"], n["bb"], n["ab"])
    mmd2 = s["aa"] / n["aa"] + s["bb"] / n["bb"] - 2.0 * s["ab"] / n["ab"]
    assert abs(r.mmd2 - round(mmd2, 6)) < 1e-9
    # every kernel sum stays in exact-double territory (the 2^53 bound
    # the ×100 quantization exists to guarantee)
    assert max(s.values()) < 2**53


# ---------------------------------------------------------------------------
# Shapley: pure-Python replay + efficiency axiom
# ---------------------------------------------------------------------------


def test_shapley_python_replay_and_efficiency(spark):
    got = {
        r.channel: r.shapley
        for r in QUERIES["q_shapley_attribution"](spark, SF).collect()
    }
    con = _con()
    users = con.execute(
        """
        SELECT user_id,
               SUM(DISTINCT CASE event_type WHEN 'click' THEN 1
                   WHEN 'error' THEN 2 WHEN 'signup' THEN 4
                   WHEN 'view' THEN 8 ELSE 0 END) AS mask,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM events GROUP BY 1
        """
    ).fetchall()
    nu, nc = defaultdict(int), defaultdict(int)
    for _, mask, conv in users:
        nu[int(mask)] += 1
        nc[int(mask)] += int(conv)
    v = {m: (nc[m] / nu[m] if nu.get(m) else 0.0) for m in range(16)}
    w = {0: 6, 1: 2, 2: 2, 3: 6}
    expect = {}
    for name, bitv in [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]:
        total = Decimal(0)
        for mask in range(16):
            if mask & bitv:
                continue
            term = w[bin(mask).count("1")] * (v[mask | bitv] - v[mask])
            total += Decimal(str(round(term, 9)))
        expect[name] = round(float(total) / 24, 6)
    assert got == expect
    # efficiency axiom: Σφ = v(full) − v(∅), up to the 9dp term rounding
    assert abs(sum(got.values()) - (v[15] - v[0])) < 1e-4


# ---------------------------------------------------------------------------
# BH FDR: python replay of the step-up rule + prefix property
# ---------------------------------------------------------------------------


def test_bh_fdr_step_up_replay(spark):
    rows = sorted(
        QUERIES["q_bh_fdr"](spark, SF).collect(), key=lambda r: r.bh_rank
    )
    assert [r.bh_rank for r in rows] == list(range(1, 6))
    # p-values sorted by rank; discoveries form a PREFIX of the ranking
    ps = [r.p_value for r in rows]
    assert ps == sorted(ps)
    flags = [r.discovery for r in rows]
    assert flags == sorted(flags, reverse=True)
    # replay the step-up rule on the reported p-values
    k = 0
    for i, p in enumerate(ps, start=1):
        if p <= i * 0.10 / 5:
            k = i
    assert flags == [1 if i <= k else 0 for i in range(1, 6)]
    # each p-value is a valid permutation p: in (0, 1], granular 1/61
    for p in ps:
        assert 0 < p <= 1
