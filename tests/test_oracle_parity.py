"""Oracle-differential test for every declared query (SURVEY.md §5 item 1).

Replicates the driver's check locally at sf0.001 (fast). Queries without
an oracle get a rows-run smoke (runs, has a schema, row count >= 0).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_util import compare


def _registry():
    from legislative_bills_database_spark.plans import ORACLE, QUERIES

    return QUERIES, ORACLE


QUERIES, ORACLE = _registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLE:
        problems = compare(df, ORACLE[name], SF_DIR)
        assert not problems, f"{name}: " + "; ".join(problems)
    else:
        # rows-only: runs end-to-end, stable schema, non-negative rows
        n = df.count()
        assert n >= 0
        assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
