#!/usr/bin/env python
"""Generate ESCAPES.md — the operator's skew/scale escape-hatch decision
table (VERDICT r10 #8): every measured cliff (a ≥2× cell in
BENCH_SF1_SKEW.json / BENCH_TEXTSKEW.json) mapped to its implemented
escape, the escape's own measured cell, and the recall certificate's
LIVE value at sf0.01 (run here, not copied from notes — the doc is
generated from artifacts + fresh certificate runs, never hand-edited).

A ≥2× cell with no registered escape renders as **NO ESCAPE** — so a
future bench that exposes a new cliff makes this generator the
regression tripwire, not just a report.

Usage:  python scripts/make_escapes.py   (writes ESCAPES.md at repo root)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLIFF = 2.0

# plan → (escape query, escape's bench key in the same artifact,
#         recall-certificate query, hard-stop note)
ESCAPES = {
    "q_graph_jaccard": (
        "q_graph_jaccard_approx",
        "q_graph_jaccard_approx",
        "q_graph_jaccard_recall",
        "refused past 2e9 predicted pairs (basket.MAX_EXACT_PAIRS)",
    ),
    "q_item_cf_recs": (
        "q_item_cf_recs_approx",
        "q_item_cf_recs_approx",
        "q_item_cf_recall",
        "refused past 2e9 predicted pairs (basket.MAX_EXACT_PAIRS)",
    ),
    "q_weighted_jaccard": (
        "q_weighted_jaccard_approx",
        "q_weighted_jaccard_approx",
        "q_weighted_jaccard_recall",
        "refused past 2e9 predicted pairs (basket.MAX_EXACT_PAIRS)",
    ),
    "edit_distance_block_join": (
        "q_edit_distance_capped",
        "edit_distance_block_join_capped_skew",
        "q_edit_distance_recall",
        "p95 block cap, portable md5 sampling",
    ),
    "dbscan_grid": (
        "q_dbscan_capped",
        "dbscan_grid_capped_skew",
        "q_dbscan_recall",
        "cell cap 32 by portable md5 rank; exact plan refuses past "
        "2e9 predicted stencil candidates (density._DB_MAX_CAND)",
    ),
}


def main() -> None:
    cliffs: list[tuple[str, str, dict]] = []
    arts = {}
    for art in ("BENCH_SF1_SKEW.json", "BENCH_TEXTSKEW.json"):
        path = os.path.join(REPO, art)
        with open(path) as fh:
            doc = json.load(fh)
        arts[art] = doc
        for name, cell in doc.get("queries", {}).items():
            ratio = cell.get("ratio")
            if ratio is not None and ratio >= CLIFF:
                cliffs.append((art, name, cell))

    # live recall-certificate values at sf0.01
    certs_needed = sorted(
        {ESCAPES[n][2] for _, n, _ in cliffs if n in ESCAPES}
    )
    recalls: dict[str, float] = {}
    if certs_needed:
        from pyspark.sql import SparkSession

        from legislative_bills_database_spark.plans import QUERIES

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        for cert in certs_needed:
            row = QUERIES[cert](spark, "/root/testdata/sf0.01").collect()[0]
            recalls[cert] = float(row["recall"])
        spark.stop()

    lines = [
        "# Skew/scale escape-hatch decision table",
        "",
        "**GENERATED — do not edit.** `python scripts/make_escapes.py`",
        "regenerates this from BENCH_SF1_SKEW.json / BENCH_TEXTSKEW.json",
        "plus live recall-certificate runs at sf0.01. A plan appears here",
        "when a purpose-built skew fixture degraded it ≥2×; the row says",
        "what to run instead at scale and what quality that trade buys.",
        "",
        "| measured cliff | fixture | exact under skew | escape | escape "
        "under skew | recall @ sf0.01 | hard stop |",
        "|---|---|---|---|---|---|---|",
    ]
    for art, name, cell in sorted(cliffs, key=lambda c: -c[2]["ratio"]):
        fixture = arts[art].get("skew", art)[:48]
        exact = f"{cell['ratio']}× ({cell.get('skew', '?')}s)"
        if name in ESCAPES:
            esc, esc_key, cert, stop = ESCAPES[name]
            esc_cell = arts[art]["queries"].get(esc_key, {})
            if "ratio" in esc_cell:
                esc_txt = f"{esc_cell['ratio']}× ({esc_cell.get('skew', '?')}s)"
            else:
                esc_txt = f"{esc_cell.get('skew', '?')}s"
            rec = recalls.get(cert)
            rec_txt = f"{rec:.2f} ({cert})" if rec is not None else cert
            lines.append(
                f"| `{name}` | {fixture} | {exact} | `{esc}` | {esc_txt} "
                f"| {rec_txt} | {stop} |"
            )
        else:
            lines.append(
                f"| `{name}` | {fixture} | {exact} | **NO ESCAPE "
                f"IMPLEMENTED** | — | — | — |"
            )
    lines += [
        "",
        "Reading the table: the *exact* plans stay in the repo as the",
        "certificate baselines the recall rows are computed against —",
        "run them at bench SFs, never on a skewed 100× graph. The",
        "`max_pairs` interlock (operators/basket.py) makes that refusal",
        "automatic: past ~2e9 predicted pairs the exact plan raises,",
        "naming its escape, instead of OOMing three stages later.",
        "",
    ]
    out = os.path.join(REPO, "ESCAPES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    n_missing = sum(1 for _, n, _ in cliffs if n not in ESCAPES)
    print(f"ESCAPES.md: {len(cliffs)} cliffs, {n_missing} without escape")
    if n_missing:
        sys.exit(1)


if __name__ == "__main__":
    main()
