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


def latest_driver_round(
    repo: str = REPO, max_round: int | None = None
) -> dict[str, int]:
    """Map query id -> round of its newest CORRECTNESS_r*.json row.

    ``max_round`` freezes the ledger as of that round: newer files are
    ignored. This makes the `_WINDOW` pin boundary-safe (VERDICT r13
    "What's wrong" #1): the driver drops the NEW round's CORRECTNESS
    file into the tree AFTER the builder's final commit, which used to
    flip tests/test_window_plan.py red at judge-time. The pin now
    replays the ledger as of ``__spark_entry__._WINDOW_LEDGER_ROUND``.
    """
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as fh:
            rows = json.load(fh)
        for q in rows:
            latest[q] = max(latest.get(q, 0), rnd)
    return latest


def plan(repo: str = REPO, max_round: int | None = None) -> dict[str, object]:
    sys.path.insert(0, repo)
    from legislative_bills_database_spark.plans import QUERIES

    latest = latest_driver_round(repo, max_round=max_round)
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
        "ledger_round": max(latest.values(), default=0),
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
    elif "--emit" in sys.argv:
        # Paste-ready literals for __spark_entry__.py.
        print(f"_WINDOW_LEDGER_ROUND = {out['ledger_round']}")
        print("_WINDOW = [")
        for q in out["window"]:
            print(f'    "{q}",')
        print("]")
    else:
        print(
            f"declared={out['declared']}  window={len(out['window'])}  "
            f"ledger_round={out['ledger_round']} (record this as "
            f"_WINDOW_LEDGER_ROUND beside _WINDOW)"
        )
        print(f"newcomers ({len(out['newcomers'])}): {out['newcomers']}")
        print(
            f"spill to next round ({out['spill_total']} total; "
            f"oldest era r{out['oldest_spill_round']}): "
            f"{out['spill_next_round']}"
        )
        for q in out["window"]:
            print(" ", q)
