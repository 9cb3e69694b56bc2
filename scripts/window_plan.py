"""Compute the driver CORRECTNESS window mechanically (VERDICT r12 #7).

The driver's per-round correctness check caps at the first ~50 entries
of ``__spark_entry__.queries()``. Hand-maintained window lists drifted
three rounds running (r10 "43 vs 47", r11 alphabetical truncation, r12
"9 vs 11 newcomers"), so from r13 on the window is COMPUTED from the
CORRECTNESS_r*.json ledger and ``__spark_entry__._WINDOW`` is pinned
equal to this script's output by ``tests/test_window_plan.py``.

Policy (matches the judge's requested rotation):
  1. flagship first (``q_pivot_count`` — anchors driver t1/t2 parity);
  2. every declared query with NO driver row yet (newcomers), in
     registry order (i.e. phase order);
  3. remaining slots filled with refreshers, oldest latest-round first,
     alphabetical within a round;
  4. hard cap at 50 slots; everything that does not fit is the named
     spill for the next round.

Run: ``python scripts/window_plan.py [--json]`` from the repo root.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = "q_pivot_count"
CAP = 50


def latest_driver_round(repo: str = REPO) -> dict[str, int]:
    """Map query id -> round of its newest CORRECTNESS_r*.json row."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for q in rows:
            latest[q] = max(latest.get(q, 0), rnd)
    return latest


def plan(repo: str = REPO) -> dict[str, object]:
    sys.path.insert(0, repo)
    from legislative_bills_database_spark.plans import QUERIES

    latest = latest_driver_round(repo)
    declared = list(QUERIES)  # registry (phase) order
    newcomers = [q for q in declared if q not in latest and q != FLAGSHIP]
    refreshers = sorted(
        (q for q in declared if q in latest and q != FLAGSHIP),
        key=lambda q: (latest[q], q),
    )
    window = [FLAGSHIP] + newcomers
    room = max(0, CAP - len(window))
    window += refreshers[:room]
    spill = refreshers[room:]
    oldest = min((latest[q] for q in spill), default=None)
    return {
        "window": window[:CAP],
        "newcomers": newcomers,
        "spill_next_round": [q for q in spill if latest[q] == oldest],
        "spill_total": len(spill),
        "oldest_spill_round": oldest,
        "declared": len(declared),
    }


if __name__ == "__main__":
    out = plan()
    if "--json" in sys.argv:
        print(json.dumps(out, indent=2))
    else:
        print(f"declared={out['declared']}  window={len(out['window'])}")
        print(f"newcomers ({len(out['newcomers'])}): {out['newcomers']}")
        print(
            f"spill to next round ({out['spill_total']} total; "
            f"oldest era r{out['oldest_spill_round']}): "
            f"{out['spill_next_round']}"
        )
        for q in out["window"]:
            print(" ", q)
