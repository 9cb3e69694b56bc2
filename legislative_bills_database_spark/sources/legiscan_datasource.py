"""Custom Spark 4 Python DataSource for the bill document tree.

``spark.read.format("legiscan_bills").option("path", root).load()`` —
the connector-API expression of sources/documents.read_bills (SURVEY §2.1
named this the one candidate for custom connector work). One
InputPartition per SESSION directory: the catalog scan happens on the
driver (directory names only — metadata), while file reads and JSON
parsing run inside each partition's executor task, so a 100-session tree
parses with 100-way parallelism and zero driver data transfer.

The flat schema matches read_bills minus the nested arrays: texts and
sponsors are surfaced as element COUNTS plus first/last projections
(the fields the reference actually consumes at legiscan_main.R:167-168,
legiscan_search_all_bills.R:84) — a deliberately pruned connector schema;
use read_bills for the full nested document model.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

BILLS_DS_NAME = "legiscan_bills"

_SCHEMA = (
    "session string, doc_key string, bill_number string, bill_type string,"
    " status int, status_date string, title string, description string,"
    " session_name string, n_texts int, first_state_link string,"
    " last_doc_id bigint, n_sponsors int, primary_sponsor_id bigint"
)


@dataclass
class _SessionPartition(InputPartition):
    bill_dir: str
    session: str


class _BillTreeReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("legiscan_bills requires .option('path', <data_root>)")
        self._root = path

    def partitions(self) -> list[_SessionPartition]:
        # driver-side METADATA scan only: session dir names, no file reads
        parts = []
        for session_dir in sorted(Path(self._root).iterdir()):
            if not session_dir.is_dir():
                continue
            under = session_dir.name.replace(" ", "_")
            bill_dir = session_dir / "CA" / under / "bill"
            if bill_dir.is_dir():
                parts.append(
                    _SessionPartition(str(bill_dir), session_dir.name)
                )
        # an empty partition list makes Spark call read(None) — hand it an
        # explicit empty sentinel so a sessionless tree yields zero rows
        return parts or [_SessionPartition("", "")]

    def read(self, partition: _SessionPartition) -> Iterator[tuple]:
        # executor-side: parse every bill JSON of ONE session
        if partition is None or not partition.bill_dir:
            return
        for f in sorted(Path(partition.bill_dir).glob("*.json")):
            try:
                bill = json.loads(f.read_text())["bill"]
            except (json.JSONDecodeError, KeyError):
                continue  # malformed docs skipped, mirroring PERMISSIVE
            texts = bill.get("texts") or []
            sponsors = bill.get("sponsors") or []
            primary = [
                s["people_id"] for s in sponsors if s.get("sponsor_type_id") == 1
            ]
            yield (
                partition.session,
                f.stem,
                bill.get("bill_number"),
                bill.get("bill_type"),
                bill.get("status"),
                bill.get("status_date"),
                bill.get("title"),
                bill.get("description"),
                (bill.get("session") or {}).get("session_name"),
                len(texts),
                texts[0].get("state_link") if texts else None,
                texts[-1].get("doc_id") if texts else None,
                len(sponsors),
                primary[0] if primary else None,
            )


class LegiScanBillsDataSource(DataSource):
    """spark.read.format('legiscan_bills') over a document tree."""

    @classmethod
    def name(cls) -> str:
        return BILLS_DS_NAME

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _BillTreeReader:
        return _BillTreeReader(self.options)


def register(spark) -> None:
    """Register the data source on a session (idempotent)."""
    spark.dataSource.register(LegiScanBillsDataSource)
