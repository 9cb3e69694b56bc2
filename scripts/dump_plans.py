"""Dump .explain('formatted') for named queries to plans/r15/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> <query> [query ...]
Planning-only (no execution) except queries whose construction runs
eager actions (iterative loops) — those still execute their loops.
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    from pyspark.sql import SparkSession
    from legislative_bills_database_spark.session import get_spark
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="dump-plans", cpus="16")
    spark.sparkContext.setLogLevel("ERROR")
    from legislative_bills_database_spark.plans import QUERIES
    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
