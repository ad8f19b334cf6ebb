"""Driver-window rotation planner.

Reads every CORRECTNESS_r*.json, computes each registered query's
latest driver-green round, and prints the recommended next-round order:
stalest first, never-checked hashable queries prioritized, by-design
rows-only entries pinned to the tail. The queries() dict in
__spark_entry__.py is still edited by hand (the order IS the contract),
but this removes the bookkeeping errors from doing it by eye.

Usage: python tools/rotate_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

# the rows-only class is retired (r7); kept only so old CORRECTNESS
# rows for these names never rank
ROWS_ONLY_TAIL = ("media_features", "ivf_knn_vec0", "approx_event_value_stats")


def latest_green() -> dict[str, int]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, rec in json.load(open(path)).items():
            ok = rec.get("hash_match") or (
                rec.get("rows_match") and rec.get("err") is None
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    greens = latest_green()
    names = [q for q in entry_mod.queries() if q not in ROWS_ONLY_TAIL]
    oracles = set(entry_mod.oracle_sql())
    # stalest first; never-green hashable queries lead (round 0)
    ranked = sorted(names, key=lambda q: (greens.get(q, 0), q))
    print(f"# {len(names)} rankable queries; window = {window}")
    by_round: dict[int, int] = {}
    for q in ranked:
        by_round[greens.get(q, 0)] = by_round.get(greens.get(q, 0), 0) + 1
    print(f"# latest-green histogram: {dict(sorted(by_round.items()))}")
    for i, q in enumerate(ranked[:window]):
        tag = "" if q in oracles else "   (ROWS-ONLY — needs a hashable twin!)"
        print(f"{i + 1:3d}  r{greens.get(q, 0)}  {q}{tag}")
    print("# --- out of window ---")
    for q in ranked[window : window + 10]:
        print(f"     r{greens.get(q, 0)}  {q}")
    print(f"# rows-only tail (by design): {', '.join(ROWS_ONLY_TAIL)}")


if __name__ == "__main__":
    main()
