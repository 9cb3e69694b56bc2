"""Probe: connected_components distributed-loop layout (r15 item #8).

The ≤2 M-edge guard routes every local fixture to the driver union-find,
so the distributed pointer-jumping loop is bench-invisible — this probe
forces the loop (small_graph_threshold=0) on a synthetic 3 M-edge union
of rings and measures what the layout change is about: per-round Spark
stages (each Exchange materialization is a stage under AQE) and wall.

Usage: python scripts/probe_cc_layout.py [n_edges]
Prints one line: edges, rounds-ish, jobs, stages, wall_sec.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    from pyspark.sql import functions as F

    from legislative_bills_database_spark.session import get_spark
    from legislative_bills_database_spark.operators.dedup import (
        connected_components,
    )

    spark = get_spark(app_name="probe-cc-layout", cpus="16")
    spark.sparkContext.setLogLevel("ERROR")
    # rings of 64 nodes: id i connects to i+1 unless i ends a ring —
    # deep enough chains that pointer jumping runs several rounds
    ids = spark.range(n_edges).select(F.col("id"))
    pairs = (
        ids.filter(F.col("id") % 64 != 63)
        .select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        .localCheckpoint(eager=True)
    )
    nodes = spark.range(n_edges).select(F.col("id").alias("n"))
    st = spark.sparkContext.statusTracker()
    j0 = max(st.getJobIdsForGroup() or [0])
    t0 = time.perf_counter()
    out = connected_components(
        pairs, nodes, id_col="n", small_graph_threshold=0,
        label_col="component",
    )
    n = out.groupBy().agg(F.count(F.lit(1))).collect()[0][0]
    wall = time.perf_counter() - t0
    j1 = max(st.getJobIdsForGroup() or [0])
    n_stages = sum(
        len(st.getJobInfo(j).stageIds or [])
        for j in range(j0 + 1, j1 + 1)
        if st.getJobInfo(j) is not None
    )
    print(
        f"edges={n_edges} labeled_rows={n} jobs={j1 - j0} "
        f"stages={n_stages} wall={wall:.2f}s"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
