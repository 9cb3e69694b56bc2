"""Driver-style correctness pre-flight: every declared query at sf0.01.

Replicates the driver's gate locally (the driver itself checks only the
first 50 of queries(); this sweeps ALL of them): run the Spark query and
its DuckDB oracle side-by-side, strict sorted-cell comparison. Run before
ending a round:  python scripts/preflight.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    from pyspark.sql import SparkSession

    from oracle_util import compare
    import __spark_entry__ as e

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = e.queries(), e.oracle_sql()
    failures = []
    for i, name in enumerate(queries):
        df = queries[name](spark, sf_dir)
        if name in oracles:
            problems = compare(df, oracles[name], sf_dir)
            status = "PASS" if not problems else "FAIL"
            if problems:
                failures.append(name)
                print(f"{i:3d} {name}: FAIL {problems[0][:120]}", file=sys.stderr)
        else:
            df.count()
            status = "rows-only"
        print(f"{i:3d} {'*' if i < 50 else ' '} {name}: {status}", file=sys.stderr)
    print(
        f"preflight: {len(queries)} queries at {sf_dir}; "
        f"failures: {failures or 'NONE'}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
