"""End-to-end pipeline tests on synthetic bill/person JSON trees
(SURVEY.md §5 item 3; fixture edge cases from FIXTURES.md §A.3).

The tree reproduces the reference's on-disk layout
data/<session>/CA/<session_underscored>/{bill,people}/*.json and covers:
legislator in multiple sessions (keep-latest), bill with no primary
sponsor (fallback), bill whose sponsors match no legislator (drop),
non-passed bill (filter), non-'B' type (all_bills gate), chaptered vs
non-chaptered texts, Rep/HD label cleanup, committee filter, and the
Bill Dodd side-collection.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from legislative_bills_database_spark.pipelines import (
    budget_bill_numbers,
    budget_bills_with_data,
    chaptered_doc_ids,
    legislator_bill_counts,
    search_all_bills,
    search_html_reports,
)
from legislative_bills_database_spark.sources.documents import (
    read_bills,
    read_people,
    session_dir,
)

S21 = "2021-2022 Regular Session"
S23 = "2023-2024 Regular Session"
SESSIONS = [S21, S23]


def _write(root: Path, session: str, kind: str, name: str, payload: dict) -> None:
    d = Path(session_dir(str(root), session, kind))
    d.mkdir(parents=True, exist_ok=True)
    (d / f"{name}.json").write_text(json.dumps(payload, indent=1))


def _person(pid, role, name, district, committee=0):
    return {
        "person": {
            "people_id": pid,
            "role": role,
            "name": name,
            "district": district,
            "committee_id": committee,
        }
    }


def _bill(number, btype, status, sponsors, texts, title="t", desc="d",
          session_name=None, date="2023-09-01"):
    return {
        "bill": {
            "bill_number": number,
            "bill_type": btype,
            "status": status,
            "status_date": date,
            "title": title,
            "description": desc,
            "session": {"session_name": session_name or "s"},
            "texts": [
                {"doc_id": i, "type": t, "state_link": link}
                for i, t, link in texts
            ],
            "sponsors": [
                {"people_id": p, "sponsor_type_id": st} for p, st in sponsors
            ],
        }
    }


@pytest.fixture(scope="module")
def data_root(tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("docmodel") / "data"

    # people — Alice serves both sessions (keep-latest must pick 2023 where
    # LegiScan labels her 'Rep'/'HD-09'); Carol is a committee record
    _write(root, S21, "people", "101", _person(101, "Sen", "Alice", "SD-03"))
    _write(root, S23, "people", "101", _person(101, "Rep", "Alice", "HD-09"))
    _write(root, S21, "people", "102", _person(102, "Rep", "Bob", "HD-11"))
    _write(root, S21, "people", "103", _person(103, "Sen", "Carol", "SD-05", 7))
    _write(root, S23, "people", "16285", _person(16285, "Sen", "Bill Dodd", "SD-03"))

    # bills, 2023-24 session
    _write(root, S23, "bill", "AB1", _bill(
        "AB1", "B", 4, [(101, 1), (16285, 1)],
        [(11, "Introduced", "http://x/ab1#frag"), (12, "Chaptered", "http://x/ab1c")],
        title="Affordable housing", desc="housing affordability program",
        session_name=S23))
    _write(root, S23, "bill", "AB2", _bill(
        "AB2", "B", 4, [(999, 1), (102, 2)],
        [(13, "Introduced", "http://x/ab2")], session_name=S23))  # drop: no match
    _write(root, S23, "bill", "SB3", _bill(
        "SB3", "B", 4, [(102, 2), (888, 2)],
        [(14, "Introduced", "http://x/sb3")], session_name=S23))  # fallback → Bob
    _write(root, S23, "bill", "AB4", _bill(
        "AB4", "B", 2, [(101, 1)],
        [(15, "Introduced", "http://x/ab4")], session_name=S23))  # not passed
    _write(root, S23, "bill", "SB5", _bill(
        "SB5", "R", 4, [(101, 1)],
        [(16, "Introduced", "http://x/sb5")], session_name=S23))  # type gate

    # bills, 2021-22 session
    _write(root, S21, "bill", "AB10", _bill(
        "AB10", "B", 4, [(102, 1)],
        [(21, "Introduced", "http://x/ab10")],
        title="Roads", desc="road funding", session_name=S21))
    _write(root, S21, "bill", "AB128", _bill(
        "AB128", "B", 4, [(16285, 1)],
        [(22, "Introduced", "http://x/ab128"), (23, "Chaptered", "http://x/ab128c")],
        title="Budget Act of 2021", desc="state budget", session_name=S21,
        date="2021-06-28"))
    return str(root)


def test_read_bills_catalog_columns(spark, data_root):
    bills = read_bills(spark, data_root)
    assert bills.count() == 7
    row = bills.filter(F.col("doc_key") == "AB128").collect()[0]
    assert row["session"] == S21 and row["bill_number"] == "AB128"
    assert [t["type"] for t in row["texts"]] == ["Introduced", "Chaptered"]
    # partition pruning by session list
    assert read_bills(spark, data_root, [S23]).count() == 5


def test_legislator_bill_counts_end_to_end(spark, data_root):
    bills = read_bills(spark, data_root)
    people = read_people(spark, data_root)
    counts, special = legislator_bill_counts(bills, people, SESSIONS)
    rows = {r["Name"]: r for r in counts.collect()}

    assert set(rows) == {"Alice", "Bob", "Bill Dodd"}  # Carol = committee
    # Alice: keep-latest picked the 2023 record → Rep→Asm, HD-→AD-
    assert rows["Alice"]["Chamber"] == "Asm"
    assert rows["Alice"]["District"] == "AD-09"
    # Alice: AB1 + SB5 in 2023 (all_bills=True), nothing in 2021
    assert (rows["Alice"][S23], rows["Alice"][S21]) == (2, 0)
    assert rows["Alice"]["Total"] == 2
    assert rows["Alice"]["Years in Data"] == 2
    assert rows["Alice"]["Bills per Year"] == 1.0
    # Bob: fallback credit for SB3 (no primary sponsor) + AB10 primary
    assert (rows["Bob"][S23], rows["Bob"][S21]) == (1, 1)
    assert rows["Bob"]["Years in Data"] == 4
    assert rows["Bob"]["Bills per Year"] == 0.5
    # Dodd: AB1 (co-primary — set semantics credits both) + AB128
    assert (rows["Bill Dodd"][S23], rows["Bill Dodd"][S21]) == (1, 1)

    dodd = {(r["session"], r["bill"]) for r in special.collect()}
    assert dodd == {(S23, "AB1"), (S21, "AB128")}


def test_legislator_bill_counts_type_gate(spark, data_root):
    bills = read_bills(spark, data_root)
    people = read_people(spark, data_root)
    counts, _ = legislator_bill_counts(
        bills, people, SESSIONS, all_bills=False, special_people_id=None
    )
    alice = counts.filter(F.col("Name") == "Alice").collect()[0]
    assert alice[S23] == 1  # SB5 (type 'R') gated out


def test_search_all_bills_end_to_end(spark, data_root):
    bills = read_bills(spark, data_root)
    out = search_all_bills(bills, ["affordab", "budget"])
    rows = {r["bill_number"]: r for r in out.collect()}
    # AB1 matches 'affordab' in description (case-sensitive: title
    # 'Affordable' does NOT match the lowercase stem); AB128 matches
    # 'budget' in description ('Budget Act' title does not)
    assert set(rows) == {"AB1", "AB128"}
    assert rows["AB1"]["link"] == "http://x/ab1"  # '#frag' stripped
    assert rows["AB1"]["session"] == S23


def test_budget_bill_pipeline_relational_core(spark, data_root):
    bills = read_bills(spark, data_root)
    pdf_lines = spark.createDataFrame(
        [
            (2021, "AB 128  Budget Act of 2021"),
            (2021, "Page 3 of 12"),           # no bill prefix
            (2021, "SCA 4  Some amendment"),  # matches but absent from data
            (2022, "AB 128  Budget Act carryover"),  # even-year parity
        ],
        "year int, line string",
    )
    numbers = budget_bill_numbers(pdf_lines)
    assert {(r["year"], r["bill"]) for r in numbers.collect()} == {
        (2021, "AB 128"), (2021, "SCA 4"), (2022, "AB 128"),
    }
    joined = budget_bills_with_data(numbers, bills)
    # 2021 (odd) and 2022 (even) both resolve to session 2021-2022; SCA 4
    # has no document → dropped by the lookup join
    assert {(r["year"], r["doc_key"]) for r in joined.collect()} == {
        (2021, "AB128"), (2022, "AB128"),
    }
    chaptered = chaptered_doc_ids(joined)
    rows = chaptered.collect()
    assert {r["doc_id"] for r in rows} == {23}  # LAST texts entry


def test_legislator_counts_golden_csv(spark, data_root, tmp_path):
    """Full run to a golden CSV (SURVEY §5 item 3): tree → staging
    parquet → pipeline → run-id CSV, byte-compared."""
    import glob
    from pathlib import Path

    from legislative_bills_database_spark.sources.documents import (
        stage_document_model,
    )
    from legislative_bills_database_spark.sources.sinks import write_csv_report

    bills, people = stage_document_model(
        spark, data_root, str(tmp_path / "staging")
    )
    counts, _ = legislator_bill_counts(bills, people, SESSIONS)
    path = write_csv_report(
        counts.orderBy("Name"), str(tmp_path), "all_legislators", run_id="RID"
    )
    got = Path(glob.glob(f"{path}/part-*.csv")[0]).read_text()
    golden = (
        "Chamber,Name,District,2021-2022 Regular Session,"
        "2023-2024 Regular Session,Total,Years in Data,Bills per Year\n"
        "Asm,Alice,AD-09,0,2,2,2,1.0\n"
        "Sen,Bill Dodd,SD-03,1,1,2,4,0.5\n"
        "Asm,Bob,AD-11,1,1,2,4,0.5\n"
    )
    assert got == golden


def test_search_html_reports(spark):
    html_docs = spark.createDataFrame(
        [
            ("/dl/2021_AB128.html", "An act about Housing Affordability."),
            ("/dl/2022_SB99.html", "Unrelated content."),
        ],
        "path string, text string",
    )
    out = search_html_reports(html_docs, ["housing affordability", "transit"])
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["term"] == "housing affordability"  # case-insensitive match
    assert r["Bill"] == "AB 128"
    assert r["fiscal_year"] == "2021-2022"
    assert r["link"].endswith("bill_id=202120220AB128")
