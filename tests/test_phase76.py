"""Round-11 phase-76 pin: sequential-pattern support counting.

Pure-Python replay on the real sf0.001 (user, day) sequences using a
BRUTE-FORCE subsequence check (standard in-order scan, no greedy
shortcut) — so a green assert certifies the query's greedy
earliest-match probes against the definitional semantics, not against
themselves. Plus the anti-monotonicity property every support
counter must satisfy: support(a>b>c) ≤ min(support over its length-2
subpatterns present in the candidate tier).
"""

from __future__ import annotations

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
TYPES = ["click", "error", "purchase", "signup", "view"]


def _seqs():
    con = duckdb.connect()
    return [
        s
        for (s,) in con.execute(
            f"""
            SELECT list(event_type ORDER BY ts, event_id)
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY user_id, date_part('day', ts)
            """
        ).fetchall()
    ]


def _contains(seq, pat):
    it = iter(seq)
    return all(sym in it for sym in pat)


def test_seq_patterns_match_bruteforce_replay(spark):
    seqs = _seqs()
    n = len(seqs)
    expect = {}
    cands = [(a, b) for a in TYPES for b in TYPES] + [
        (a, b, c) for a in TYPES for b in TYPES for c in TYPES
    ]
    for pat in cands:
        sup = sum(1 for s in seqs if _contains(s, pat))
        if sup * 100 >= n:
            expect[">".join(pat)] = (len(pat), sup, n, round(sup / n, 6))
    got = {
        r.pattern: (r.plen, r.n_supported, r.n_seqs, r.support)
        for r in QUERIES["q_seq_patterns"](spark, SF).collect()
    }
    assert got == expect


def test_seq_patterns_anti_monotone(spark):
    rows = {
        r.pattern: r.n_supported
        for r in QUERIES["q_seq_patterns"](spark, SF).collect()
    }
    for pat, sup in rows.items():
        parts = pat.split(">")
        if len(parts) == 3:
            a, b, c = parts
            for sub in (f"{a}>{b}", f"{b}>{c}", f"{a}>{c}"):
                if sub in rows:
                    assert sup <= rows[sub], (pat, sub)
