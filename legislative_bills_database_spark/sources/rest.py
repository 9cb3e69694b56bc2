"""Driver-side REST ingestion: the LegiScan-shaped API client.

Re-expresses the reference's ingestion library
(legiscan_data_pull.R:9-76; legiscan_main.R:170-175): GET with query
params against a bulk-data API, base64-decoded zip payloads unpacked into
the JSON document tree, with skip-if-exists idempotency.

HTTP NEVER runs inside an executor task: ingestion is a driver-side
(or foreachPartition-with-rate-limit, if ever distributed) concern. The
transport is injectable so tests exercise the full retry / rate-limit /
decode / unzip path with zero network.
"""

from __future__ import annotations

import base64
import io
import time
import zipfile
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

# (status_code, parsed_json) from (url, params)
Transport = Callable[[str, dict], tuple[int, dict]]


def _requests_transport(url: str, params: dict) -> tuple[int, dict]:
    import requests

    resp = requests.get(url, params=params, timeout=60)
    return resp.status_code, (resp.json() if resp.content else {})


@dataclass
class RestClient:
    """Retrying, rate-limited GET client (legiscan_data_pull.R:24-53).

    ``rate_limit_per_sec`` spaces calls out (the reference worries about
    over-taxing the API, legiscan_main.R:163); ``max_retries`` retries
    non-200s with exponential backoff.
    """

    base_url: str
    api_key: str
    transport: Transport = field(default=_requests_transport)
    max_retries: int = 3
    rate_limit_per_sec: float = 5.0
    _last_call: float = field(default=0.0, repr=False)

    def _get(self, op: str, **params) -> dict:
        query = {"key": self.api_key, "op": op, **params}
        delay = 0.5
        for attempt in range(self.max_retries + 1):
            min_gap = 1.0 / self.rate_limit_per_sec
            wait = self._last_call + min_gap - time.monotonic()
            if wait > 0:
                time.sleep(wait)
            self._last_call = time.monotonic()
            status, body = self.transport(self.base_url, query)
            if status == 200:
                return body
            if attempt < self.max_retries:
                time.sleep(delay)
                delay *= 2
        raise RuntimeError(
            f"GET {self.base_url} op={op} failed with status {status} "
            f"after {self.max_retries + 1} attempts"
        )

    # The reference's op set (legiscan_data_pull.R:24-28,49-53; legiscan_main.R:170-173)
    def get_dataset_list(self, state: str) -> list[dict]:
        return self._get("getDataSetList", state=state)["datasetlist"]

    def get_dataset(self, session_id: int, access_key: str) -> dict:
        return self._get("getDataSet", id=session_id, access_key=access_key)["dataset"]

    def get_bill_text(self, doc_id: int) -> dict:
        return self._get("getBillText", id=doc_id)["text"]

    def get_session_people(self, session_id: int) -> list[dict]:
        """Legislator roster for one session (legiscan_main.R:373-379 —
        the reference keeps this op as a commented-out scrap; the row
        shape is ``content(request)$sessionpeople$people``, most-recent
        session first in the dataset list)."""
        return self._get("getSessionPeople", id=session_id)[
            "sessionpeople"
        ]["people"]


def decode_zip_to_tree(b64_zip: str, dest_dir: str) -> list[str]:
    """base64 → zip → extracted file tree (legiscan_data_pull.R:58-62).

    Returns the extracted member names. Driver-side by design; a
    distributed variant would read the zips via the binaryFile source and
    flatMap an extraction UDF.
    """
    raw = base64.b64decode(b64_zip)
    dest = Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        names = zf.namelist()
        zf.extractall(dest)
    return names


def fetch_datasets(
    client: RestClient,
    data_root: str,
    state: str = "CA",
    force: bool = False,
) -> list[str]:
    """Pull every session dataset into the document tree, skipping
    sessions already on disk (legiscan_data_pull.R:43-46 skip-if-exists;
    the incremental-ingest manifest in its simplest, path-keyed form).

    Returns the session titles actually downloaded this call.
    """
    downloaded: list[str] = []
    for ds in client.get_dataset_list(state):
        title = ds["session_title"]
        session_path = Path(data_root) / title / state
        if session_path.exists() and not force:
            continue
        payload = client.get_dataset(ds["session_id"], ds["access_key"])
        decode_zip_to_tree(payload["zip"], f"{data_root}/{title}")
        downloaded.append(title)
    return downloaded


def fetch_bill_text_html(client: RestClient, doc_id: int) -> bytes:
    """getBillText → base64 doc payload → HTML bytes (legiscan_main.R:170-175)."""
    return base64.b64decode(client.get_bill_text(doc_id)["doc"])
