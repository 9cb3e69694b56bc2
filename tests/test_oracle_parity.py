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


def test_no_pandas_lossy_oracle_dtypes():
    """DESCRIBE every oracle; fail on HUGEINT/UHUGEINT output columns.

    The round-3 driver hash-FAIL (q_dq_constraints): DuckDB SUM over int
    columns yields HUGEINT, which the driver's pandas canonicalizer
    coerces to float64 ("15000.0" vs Spark "15000"). This sweep makes the
    defect un-reintroducible: any oracle whose output schema pandas
    cannot hold losslessly fails here in <5 s, before a driver round.
    """
    from tests.oracle_util import lossy_oracle_columns

    bad = {}
    for name, sql in ORACLE.items():
        lossy = lossy_oracle_columns(sql, SF_DIR)
        if lossy:
            bad[name] = lossy
    assert not bad, f"oracles with pandas-lossy output dtypes: {bad}"


def test_lossy_dtype_guard_trips():
    """The guard actually fires: a bare SUM(int) oracle is rejected."""
    from tests.oracle_util import lossy_oracle_columns

    lossy = lossy_oracle_columns(
        "SELECT SUM(o_orderkey) AS s FROM orders", SF_DIR
    )
    assert lossy and lossy[0][0] == "s"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
