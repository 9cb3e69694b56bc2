"""Text-search filter operators (the reference's search surface).

- regex row filter           legiscan_main.R:90
- case-insensitive substring legiscan_main.R:213
- multi-term OR over fields  legiscan_search_all_bills.R:88-93

All are plain Column predicates → Catalyst pushes them into the scan.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def regex_filter(df: DataFrame, col: str, pattern: str) -> DataFrame:
    return df.filter(F.col(col).rlike(pattern))


def ci_contains(col: Column | str, term: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c).contains(term.lower())


def multiterm_or_predicate(cols: list[str], terms: list[str]) -> Column:
    """ANY term substring-matches ANY field (case-insensitive).

    Reference builds a (term × field) boolean matrix then rowSums>0
    (legiscan_search_all_bills.R:88-93); as a predicate Catalyst folds it
    into one codegen'd OR chain at the scan.
    """
    return reduce(
        operator.or_, [ci_contains(c, t) for t in terms for c in cols]
    )


def multiterm_search(df: DataFrame, cols: list[str], terms: list[str]) -> DataFrame:
    return df.filter(multiterm_or_predicate(cols, terms))
