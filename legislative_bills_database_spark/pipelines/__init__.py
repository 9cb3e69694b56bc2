"""The reference's three analytic pipelines, end-to-end (SURVEY.md §3).

Each composes the operator layer over the JSON document model:

- :mod:`legislator_bill_counts` — per-legislator passed-bill counts
  pivoted by session (legislator_bill_counts_run.R:51-157).
- :mod:`search_all_bills` — multi-term keyword search over all bills
  (legiscan_search_all_bills.R:65-99).
- :mod:`budget_bill_search` — budget-bill full-text search over
  PDF-sourced bill lists and HTML bill texts (legiscan_main.R:65-237).
"""

from .legislator_bill_counts import (  # noqa: F401
    legislator_bill_counts,
    run_legislator_bill_counts,
)
from .search_all_bills import run_search_all_bills, search_all_bills  # noqa: F401
from .budget_bill_search import (  # noqa: F401
    budget_bill_numbers,
    budget_bills_with_data,
    chaptered_doc_ids,
    fetch_chaptered_html,
    run_budget_bill_search,
    search_html_reports,
)
