"""Physical-plan census over every declared query.

Prints one TSV row per query at sf0.001:
  name  exchanges  range_exch  bnlj  cartesian  python  take_ordered

The per-operator plan audits (tests/test_plan_audit*.py) pin specific
shapes; this sweep is the whole-repo view — run it after adding
operators to spot an accidental CartesianProduct, an un-broadcast
nested loop, or Python evaluation sneaking into a relational path.
tests/test_plan_census.py enforces the global invariants (no cartesian
products anywhere; Python eval only in the declared Arrow-batched set).

Usage:  python scripts/plan_census.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def census(plan: str) -> dict[str, int]:
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "range_exch": plan.count("Exchange rangepartitioning"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "python": plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
        + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
        "take_ordered": plan.count("TakeOrderedAndProject"),
    }


def main() -> int:
    from pyspark.sql import SparkSession

    from legislative_bills_database_spark.plans import QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cols = ["exchanges", "range_exch", "bnlj", "cartesian", "python", "take_ordered"]
    print("name\t" + "\t".join(cols))
    for name, fn in QUERIES.items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            c = census(plan)
            print(name + "\t" + "\t".join(str(c[k]) for k in cols))
        except Exception as ex:  # streaming-only / sink queries may defer
            print(f"{name}\tERR {type(ex).__name__}: {str(ex)[:60]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
