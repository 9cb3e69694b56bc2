"""Pipeline 2: multi-term keyword search over all bills.

Re-expresses /root/reference/src/legiscan_search_all_bills.R:65-99:
per-session JSON scan → 6-field nested projection → boolean match matrix
over terms × (title, description) → keep any-match rows → union →
URL-fragment strip → CSV.

In Spark the per-session loop disappears: one partition-pruned read over
all configured sessions, one filter expression (Catalyst folds the
term×field OR into the scan), zero shuffles end-to-end.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def search_all_bills(bills: DataFrame, terms: list[str]) -> DataFrame:
    """Bills whose title OR description contains ANY term.

    Matching is CASE-SENSITIVE substring (the reference's ``grepl``
    default, legiscan_search_all_bills.R:90-91); terms act as stems
    ('affordab', :52). The first texts.state_link is kept with its
    '#...' fragment stripped (:84,98).
    """
    proj = bills.select(
        "bill_number",
        F.col("session_name").alias("session"),
        "status",
        F.element_at(F.col("texts.state_link"), 1).alias("link"),
        "title",
        "description",
    )
    any_match = reduce(
        or_,
        [
            F.col(field).contains(term)
            for term in terms
            for field in ("title", "description")
        ],
    )
    return proj.filter(any_match).withColumn(
        "link", F.regexp_replace("link", "#.+$", "")
    )
