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

# Queries whose implementation or oracle CHANGED in the current round
# (ADVICE r11): pure staleness ranking rotates them OUT of the driver
# window in exactly the round they changed most, leaving only the local
# verify run covering them. Rank these as never-green (round 0) so they
# lead the window alongside genuinely new queries. EDIT EACH ROUND.
MODIFIED_THIS_ROUND: tuple[str, ...] = (
    # r12: ann_ingest.py gained the batch-id collision guard, the
    # snapshot-consistent vacuum, and the loud missing-dir contract —
    # the gate replays the full 7-epoch lifecycle over that code
    "ann_stream_maintenance",
    # r12: simhash multiprobe now delegates to the factored
    # banded_hamming_pairs — behavior-identical by test, but the code
    # path the driver hashes changed
    "simhash_pairs",
    "simhash_pairs_md5",
    # r12: connected_components gained pointer jumping + a convergence
    # guard (the sf1 long-chain fix) — same fixpoint, new code path for
    # every CC-consuming gate
    "dedup_clusters",
    "dedup_keep_corpus",
    "dedup_keep_best",
    "curate_corpus",
    "curate_web_corpus",
)


def rank_key(greens: dict[str, int]):
    """Sort key shared by rotate_window and apply_rotation: stalest
    first, with never-green and modified-this-round pinned to the
    front (round 0)."""
    def key(q: str):
        rnd = 0 if q in MODIFIED_THIS_ROUND else greens.get(q, 0)
        return (rnd, q)

    return key


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
    # stalest first; never-green and modified-this-round lead (round 0)
    ranked = sorted(names, key=rank_key(greens))
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
