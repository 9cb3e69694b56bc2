"""Solo min-of-N re-measure for named queries — the bench's exact
methodology (fresh warmed session, materialize_fully, min of N full
executions) isolated to a handful of queries so a flagged in-sweep cell
can be confirmed or cleared without a 370-query sweep.

Usage: python scripts/solo_measure.py [-n RUNS] <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from legislative_bills_database_spark.session import (
        get_spark,
        materialize_fully,
    )
    from legislative_bills_database_spark.plans import QUERIES

    spark = get_spark(app_name="solo-measure", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM + parquet footers + OS page cache
    for t in ["region", "customer", "orders", "events",
              "documents", "embeddings"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    for name in names:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            n = materialize_fully(df)
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(runs):.3f}s runs="
            f"{[round(r, 3) for r in runs]} ({n} rows)"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
