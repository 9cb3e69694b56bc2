"""Property-based tests (SURVEY.md §5 item 4, hypothesis).

Each property pins an algebraic invariant of an operator family rather
than a fixed example: pivot row-totals equal the plain group count for
ANY data; keep_latest is deterministic and idempotent; the parity session
label round-trips its year; shingle counts follow the clamped formula.
Examples are kept small (Spark per-example overhead) — the value is in
the generated edge cases: empty groups, single rows, duplicate keys,
boundary years.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from legislative_bills_database_spark.functions.text import shingles, tokens
from legislative_bills_database_spark.operators.aggregates import pivot_count, row_total
from legislative_bills_database_spark.operators.dedup import keep_latest
from legislative_bills_database_spark.operators.joins import session_label_for_year

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

YEARS = [2000, 2001, 2002]


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.sampled_from(YEARS)),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_pivot_row_total_equals_group_count(spark, rows):
    df = spark.createDataFrame(rows, "g string, y int")
    wide = row_total(
        pivot_count(df, "g", "y", YEARS), [str(y) for y in YEARS], "total"
    )
    got = {r["g"]: r["total"] for r in wide.collect()}
    expected = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 5), st.integers(0, 1000)
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_keep_latest_deterministic_and_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k int, v int, payload int")
    order = [F.desc("v"), F.desc("payload")]  # total order → deterministic
    once = keep_latest(df, "k", order)
    twice = keep_latest(once, "k", order)
    a = sorted(tuple(r) for r in once.collect())
    b = sorted(tuple(r) for r in twice.collect())
    assert a == b  # idempotent
    assert len(a) == df.select("k").distinct().count()  # one row per key
    # deterministic winner: max by (v, payload) per key
    best = {}
    for k, v, p in rows:
        if k not in best or (v, p) > best[k]:
            best[k] = (v, p)
    assert {(k, *vp) for k, vp in best.items()} == set(a)


@given(year=st.integers(1900, 2100))
@settings(**SETTINGS)
def test_session_label_roundtrip(spark, year):
    df = spark.createDataFrame([(year,)], "y int")
    row = df.select(
        session_label_for_year(F.col("y")).alias("label")
    ).collect()[0]
    start, end = map(int, row["label"].split("-"))
    assert end == start + 1
    assert start % 2 == 1  # sessions start on odd years
    assert year in (start, end)


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=4), min_size=1, max_size=12
    ),
    n=st.integers(2, 4),
)
@settings(**SETTINGS)
def test_shingle_count_formula(spark, words, n):
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        F.size(shingles(tokens(F.col("t")), n)).alias("n_shingles"),
        F.size(F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(tokens(F.col("t"))) - (n - 1), F.lit(1)),
                ),
                lambda i: F.concat_ws(" ", F.slice(tokens(F.col("t")), i, n)),
            )
        )).alias("check"),
    ).collect()[0]
    # shingles are DISTINCT; count bounded by the clamped window count
    assert 1 <= row["n_shingles"] <= max(len(words) - n + 1, 1)
    assert row["n_shingles"] == row["check"]
