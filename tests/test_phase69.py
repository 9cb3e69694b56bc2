"""Round-11 phase-69 pins: Kneser-Ney LM, incremental view
maintenance, rendezvous resharding, stratified ATE, randomized
response.

Each query gets a pure-Python replay on the real sf0.001 fixture (the
three-way-pin discipline: the registered DuckDB oracle covers engine
parity, the replay here pins the MATH — a bug shared by both SQL twins
would hash-match and still be wrong)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


# ---------------------------------------------------------------------------
# Kneser-Ney: full pure-Python replay of counts and probabilities
# ---------------------------------------------------------------------------


def test_kneser_ney_python_replay(spark):
    rows = QUERIES["q_kneser_ney"](spark, SF).collect()
    texts = [
        t
        for (t,) in _con().execute("SELECT text FROM documents").fetchall()
    ]
    bcnt: Counter = Counter()
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            bcnt[(a, b)] += 1
    c1 = Counter()
    nc = Counter()
    np_ = Counter()
    for (a, b), c in bcnt.items():
        c1[a] += c
        nc[a] += 1
        np_[b] += 1
    tt = len(bcnt)
    top = sorted(bcnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(rows) == 20
    for r, ((w1, w2), c12) in zip(rows, top):
        assert (r.w1, r.w2, r.c12) == (w1, w2, c12)
        assert (r.c1, r.nc_w1, r.np_w2, r.t_types) == (
            c1[w1],
            nc[w1],
            np_[w2],
            tt,
        )
        num = (4 * c12 - 3) * tt + 3 * nc[w1] * np_[w2]
        assert r.p_kn == round(num / (4.0 * c1[w1] * tt), 6)
        # a probability, and interpolation keeps it strictly positive
        assert 0 < r.p_kn <= 1


def test_kneser_ney_rows_sum_below_one_per_context(spark):
    # Σ_w2 P(w2|w1) over OBSERVED continuations < 1 (the reserved mass
    # is what interpolation redistributes to unseen bigrams)
    con = _con()
    df = con.execute(
        """
        WITH toks AS (SELECT string_split(text,' ') AS l FROM documents),
        big AS (
          SELECT unnest([l[i] FOR i IN generate_series(1,len(l)-1)]) AS w1,
                 unnest([l[i+1] FOR i IN generate_series(1,len(l)-1)]) AS w2
          FROM toks WHERE len(l) >= 2)
        SELECT w1, w2, count(*) AS c FROM big GROUP BY 1,2
        """
    ).fetchall()
    bcnt = {(a, b): c for a, b, c in df}
    c1 = Counter()
    nc = Counter()
    np_ = Counter()
    for (a, b), c in bcnt.items():
        c1[a] += c
        nc[a] += 1
        np_[b] += 1
    tt = len(bcnt)
    # observed-continuation mass telescopes to
    #   1 − (d·nc(w1)/c1(w1))·(1 − Σ_observed np(w2)/T) ≤ 1,
    # with equality iff w1 precedes EVERY distinct right-word (true for
    # the top context on this tiny fixture — its vocabulary is small
    # enough that 'window' precedes all 31 right-words). Check both
    # regimes: the saturated context sums to 1 (float eps), and any
    # context that misses at least one right-word is strictly below 1.
    def mass(w1: str) -> float:
        return sum(
            ((4 * c - 3) * tt + 3 * nc[w1] * np_[b])
            / (4.0 * c1[w1] * tt)
            for (a, b), c in bcnt.items()
            if a == w1
        )

    top = max(nc, key=lambda w: (nc[w], w))
    assert 0 < mass(top) <= 1 + 1e-9
    partial = [w for w in nc if nc[w] < len(np_)]
    assert partial, "fixture should have at least one unsaturated context"
    w = min(partial, key=lambda w: (nc[w], w))
    assert 0 < mass(w) < 1


# ---------------------------------------------------------------------------
# IVM: incremental merge equals direct recompute (python replay)
# ---------------------------------------------------------------------------


def test_ivm_join_python_replay(spark):
    rows = {
        r.custkey: (r.n_items, r.sum_cents)
        for r in QUERIES["q_ivm_join"](spark, SF).collect()
    }
    con = _con()
    li = con.execute(
        "SELECT l_orderkey, l_linenumber, "
        "CAST(ROUND(l_extendedprice*100) AS BIGINT) FROM lineitem"
    ).fetchall()
    cust = dict(
        con.execute("SELECT o_orderkey, o_custkey FROM orders").fetchall()
    )
    state = defaultdict(lambda: [0, 0])
    for okey, ln, cents in li:
        keep = (ln <= 4 and okey % 101 != 0) or ln > 4
        if keep and okey in cust:
            s = state[cust[okey]]
            s[0] += 1
            s[1] += cents
    expect = {k: (n, s) for k, (n, s) in state.items() if n > 0}
    assert rows == expect
    # the delta batch genuinely exercised both directions
    n_del = sum(
        1 for okey, ln, _ in li if ln <= 4 and okey % 101 == 0
    )
    n_ins = sum(1 for _, ln, _ in li if ln > 4)
    assert n_del > 0 and n_ins > 0


# ---------------------------------------------------------------------------
# rendezvous resharding: md5 replay + minimal-movement certificate
# ---------------------------------------------------------------------------


def _hrw(k: int, n: int) -> int:
    return max(
        range(n),
        key=lambda s: hashlib.md5(f"hrw:{k}:{s}".encode()).hexdigest(),
    )


def test_rendezvous_resharding_python_replay(spark):
    rows = QUERIES["q_rendezvous_resharding"](spark, SF).collect()
    keys = [
        k
        for (k,) in _con()
        .execute("SELECT c_custkey FROM customer")
        .fetchall()
    ]
    census: Counter = Counter()
    for k in keys:
        census[(_hrw(k, 8), _hrw(k, 9))] += 1
    got = {(r.shard_before, r.shard_after): r.n_keys for r in rows}
    assert got == dict(census)
    # HRW movement property: every mover lands on the NEW shard (8)
    moved = 0
    for (b, a), n in got.items():
        if b != a:
            assert a == 8, "HRW may only move keys to the added shard"
            moved += n
    total = sum(got.values())
    # expected moved fraction 1/9; allow a generous binomial envelope
    exp = total / 9.0
    sd = (total * (1 / 9) * (8 / 9)) ** 0.5
    assert abs(moved - exp) <= 4 * sd + 1


# ---------------------------------------------------------------------------
# stratified ATE: exact integer replay
# ---------------------------------------------------------------------------


def test_stratified_ate_python_replay(spark):
    rows = QUERIES["q_stratified_ate"](spark, SF).collect()
    con = _con()
    data = con.execute(
        """
        SELECT c.c_mktsegment,
               CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END,
               CAST(ROUND(o.o_totalprice*100) AS BIGINT)
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n_t, n_c, s_t, s_c
    for seg, t, y in data:
        a = agg[seg]
        if t:
            a[0] += 1
            a[2] += y
        else:
            a[1] += 1
            a[3] += y
    micro = {
        seg: (
            n_t,
            n_c,
            (1_000_000 * s_t) // n_t,
            (1_000_000 * s_c) // n_c,
        )
        for seg, (n_t, n_c, s_t, s_c) in agg.items()
    }
    num = sum(
        (n_t + n_c) * (mt - mc) for n_t, n_c, mt, mc in micro.values()
    )
    n_all = sum(n_t + n_c for n_t, n_c, _, _ in micro.values())
    ate = round(num / n_all, 6)
    assert len(rows) == len(micro)
    for r in rows:
        n_t, n_c, mt, mc = micro[r.seg]
        assert (r.n_t, r.n_c) == (n_t, n_c)
        assert (r.mean_t_micro, r.mean_c_micro) == (mt, mc)
        assert r.diff_micro == mt - mc
        assert r.ate_stratified_micro == ate


# ---------------------------------------------------------------------------
# randomized response: md5-coin replay + debiasing envelope
# ---------------------------------------------------------------------------


def _nib(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[0], 16)


def test_randomized_response_python_replay(spark):
    (row,) = QUERIES["q_randomized_response"](spark, SF).collect()
    con = _con()
    truth = dict(
        con.execute(
            "SELECT user_id, MAX(CASE WHEN event_type='purchase' "
            "THEN 1 ELSE 0 END) FROM events GROUP BY 1"
        ).fetchall()
    )
    n = len(truth)
    r = 0
    for uid, b in truth.items():
        if _nib(f"rr1:{uid}") < 12:
            r += b
        else:
            r += 1 if _nib(f"rr2:{uid}") < 8 else 0
    t = sum(truth.values())
    assert (row.n_users, row.n_reported, row.n_true) == (n, r, t)
    assert row.pi_hat == round((8.0 * r - n) / (6.0 * n), 6)
    assert row.pi_true == round(t / n, 6)
    # debiased estimate honest within the randomization's own noise:
    # Var[pi_hat] <= (16/9)·(1/4)/n  (worst-case report variance / q^2)
    sd = ((16 / 9) * 0.25 / n) ** 0.5
    assert abs(row.pi_hat - row.pi_true) <= 4 * sd
