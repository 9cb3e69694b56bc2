"""Round-11 phase-63 pins: exact-substring dedup (ExactSubstr) +
paragraph-grain removal.

The planted corpus is the VERDICT r10 item-#2 "done" contract: one
within-doc repeat, one cross-doc quote, one boilerplate block shared by
3 docs — each must surface as a MAXIMAL span with the right owner
count, and a brute-force pure-Python replay must agree with Spark
exactly (the q_page_hinkley three-way-pin discipline, minus DuckDB —
the registered oracle covers that side on the real fixtures at both
SFs via test_oracle_parity/preflight).
"""

from __future__ import annotations

import hashlib

from legislative_bills_database_spark.operators.corpus import (
    dedup_paragraphs,
    substr_dup_spans,
)

K = 8


def _fill(tag: str, n: int) -> list[str]:
    """n unique filler tokens no other doc shares."""
    return [f"{tag}{i:03d}" for i in range(n)]


QUOTE = [f"quote{i}" for i in range(12)]  # cross-doc 12-token quote
CHORUS = [f"chorus{i}" for i in range(10)]  # within-doc 10-token repeat
BOILER = [f"boiler{i}" for i in range(8)]  # exactly-k 3-owner block

DOCS = {
    # within-doc repeat: CHORUS appears twice, separated by unique fill
    1: _fill("a", 9) + CHORUS + _fill("b", 9) + CHORUS + _fill("c", 9),
    # cross-doc quote: docs 2 and 3 share QUOTE
    2: _fill("d", 9) + QUOTE + _fill("e", 9),
    3: _fill("f", 9) + QUOTE + _fill("g", 9),
    # boilerplate shared by 3 docs (4, 5, 6)
    4: BOILER + _fill("h", 9),
    5: _fill("i", 9) + BOILER,
    6: _fill("j", 9) + BOILER + _fill("k", 9),
    # no duplication at all
    7: _fill("m", 20),
    # shorter than one shingle
    8: _fill("n", 5),
}


def _expected_spans() -> set[tuple]:
    """Brute-force ExactSubstr replay: global k-gram occurrence counts,
    per-doc duplicated positions, consecutive-run collapse."""
    from collections import Counter, defaultdict

    grams: Counter = Counter()
    owners: defaultdict = defaultdict(set)
    pos_map: dict[int, list[tuple[int, tuple]]] = {}
    for d, toks in DOCS.items():
        entries = []
        for p in range(len(toks) - K + 1):
            g = tuple(toks[p : p + K])
            grams[g] += 1
            owners[g].add(d)
            entries.append((p, g))
        pos_map[d] = entries
    out = set()
    for d, entries in pos_map.items():
        dup = [(p, g) for p, g in entries if grams[g] > 1]
        run: list[tuple[int, tuple]] = []
        for p, g in dup + [(-99, ())]:  # sentinel flushes the last run
            if run and p != run[-1][0] + 1:
                ps = [q for q, _ in run]
                out.add(
                    (
                        d,
                        ps[0],
                        ps[-1] + K - 1,
                        ps[-1] - ps[0] + K,
                        len(ps),
                        min(len(owners[g]) for _, g in run),
                    )
                )
                run = []
            if p >= 0:
                run.append((p, g))
    return out


def _docs_df(spark):
    return spark.createDataFrame(
        [(d, " ".join(t)) for d, t in sorted(DOCS.items())],
        "doc_id long, text string",
    )


def test_substr_dup_spans_planted_corpus(spark):
    got = {
        tuple(r)
        for r in substr_dup_spans(_docs_df(spark), k=K).collect()
    }
    assert got == _expected_spans()
    # the three planted shapes, named:
    by_doc = {}
    for d, s, e_, tokens, nsh, own in got:
        by_doc.setdefault(d, []).append((s, e_, tokens, nsh, own))
    # doc 1: the 10-token chorus twice, each maximal, owners=1
    assert sorted(by_doc[1]) == [
        (9, 18, 10, 3, 1),
        (28, 37, 10, 3, 1),
    ]
    # docs 2/3: the 12-token quote once each, owners=2
    assert by_doc[2] == [(9, 20, 12, 5, 2)]
    assert by_doc[3] == [(9, 20, 12, 5, 2)]
    # docs 4/5/6: the exactly-k boilerplate, owners=3
    assert by_doc[4] == [(0, 7, 8, 1, 3)]
    assert by_doc[5] == [(9, 16, 8, 1, 3)]
    assert by_doc[6] == [(9, 16, 8, 1, 3)]
    # docs 7 (unique) and 8 (shorter than k): no spans
    assert 7 not in by_doc and 8 not in by_doc


def test_substr_spans_are_maximal(spark):
    """No two spans of one doc touch or overlap — islands collapsed."""
    rows = substr_dup_spans(_docs_df(spark), k=K).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for spans in per_doc.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            # gap of ≥1 duplicated-shingle START between runs; spans may
            # overlap textually by < k-1 only via distinct runs, which
            # the island collapse forbids entirely at shingle grain
            assert s2 > e1 - K + 1 + 1


def test_dedup_paragraphs_planted_repeat(spark):
    p = [f"p{i}" for i in range(8)]
    q = [f"q{i}" for i in range(8)]
    r = [f"r{i}" for i in range(8)]
    df = spark.createDataFrame(
        [
            (1, " ".join(p + q + p + r)),  # chunk repeat: P Q P R
            (2, " ".join(q + r)),  # no repeats
        ],
        "doc_id long, text string",
    )
    got = {row["doc_id"]: row for row in dedup_paragraphs(df).collect()}
    clean1 = " ".join(p + q + r)
    assert got[1]["n_paras_kept"] == 3
    assert got[1]["n_paras_dropped"] == 1
    assert (
        got[1]["clean_sha"]
        == hashlib.sha256(clean1.encode()).hexdigest()
    )
    # a repeat-free doc reassembles to ITSELF (partition-exact chunks)
    assert got[2]["n_paras_dropped"] == 0
    assert (
        got[2]["clean_sha"]
        == hashlib.sha256(" ".join(q + r).encode()).hexdigest()
    )


def test_dedup_paragraphs_zero_shuffle(spark):
    """The within-doc dedup must stay a pure scan-side map: no Exchange
    anywhere in the physical plan (the 100 TB posture IS the operator)."""
    from legislative_bills_database_spark.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        dedup_paragraphs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_substr_dedup_strip_planted_corpus(spark):
    """Removal keeps exactly the canonical (globally-first) occurrence
    of each duplicated window: doc 1 keeps its first chorus, doc 2
    keeps the quote (doc 3 loses it), doc 4 keeps the boilerplate
    (docs 5 and 6 lose it); unique text is untouched."""
    from legislative_bills_database_spark.operators.corpus import (
        substr_dedup_strip,
    )

    got = {
        r["doc_id"]: r
        for r in substr_dedup_strip(_docs_df(spark), k=K).collect()
    }

    def sha(tokens):
        return hashlib.sha256(" ".join(tokens).encode()).hexdigest()

    # doc 1: second chorus removed (10 tokens)
    d1 = _fill("a", 9) + CHORUS + _fill("b", 9) + _fill("c", 9)
    assert got[1]["n_tokens_removed"] == 10
    assert got[1]["clean_sha"] == sha(d1)
    # doc 2 canonical for the quote — untouched; doc 3 loses it
    assert got[2]["n_tokens_removed"] == 0
    assert got[2]["clean_sha"] == sha(DOCS[2])
    assert got[3]["n_tokens_removed"] == 12
    assert got[3]["clean_sha"] == sha(_fill("f", 9) + _fill("g", 9))
    # boilerplate: doc 4 canonical; 5 and 6 lose the 8-token block
    assert got[4]["n_tokens_removed"] == 0
    assert got[5]["n_tokens_removed"] == 8
    assert got[5]["clean_sha"] == sha(_fill("i", 9))
    assert got[6]["n_tokens_removed"] == 8
    assert got[6]["clean_sha"] == sha(_fill("j", 9) + _fill("k", 9))
    # unique and shorter-than-k docs are untouched
    assert got[7]["n_tokens_removed"] == 0
    assert got[8]["n_tokens_removed"] == 0
