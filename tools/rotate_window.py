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
# lead the window alongside genuinely new queries. EDIT EACH ROUND and
# bump MODIFIED_FOR_ROUND — modified_this_round() raises if the stamp
# is stale (ADVICE r12: a forgotten list would permanently pin these
# queries to the window front and displace genuinely stale ones).
MODIFIED_FOR_ROUND = 14
# r14: the index-lifecycle gates moved to shared seed-fixture builds
# (clone or probe-in-place instead of per-gate rebuilds), the postings
# delete gates feed set-based (DataFrame) delete inputs, the plain
# merge became size-tiered, and mmr's greedy loop was de-quadratified —
# all verified value-preserving locally, but these are exactly the
# queries whose code changed most this round, so they ride the window
# alongside the never-green rag_context_indexed. The 12 r9-stale
# queries (VERDICT r13 task 1) rank at r9 and fill the next slots by
# plain staleness; 12 + 11 + 1 new < 50, so nothing stale is displaced.
MODIFIED_THIS_ROUND: tuple[str, ...] = (
    "ann_index_update",
    "ann_stream_maintenance",
    "bm25_index_delete",
    "bm25_index_lifecycle",
    "bm25_index_update",
    "bm25_multi_indexed",
    "bm25_topk_indexed",
    "mmr_select",
    "phrase_index_lifecycle",
    "phrase_match_indexed",
    "search_snippets_indexed",
)


def current_round() -> int:
    """Next driver round = max committed CORRECTNESS round + 1."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    ]
    return max(rounds) + 1 if rounds else 1


def modified_this_round() -> tuple[str, ...]:
    """The MODIFIED list, validated against its round stamp — a stale
    list fails LOUDLY instead of silently reintroducing the staleness
    gap it exists to fix (ADVICE r12)."""
    cur = current_round()
    if MODIFIED_FOR_ROUND != cur:
        raise RuntimeError(
            f"MODIFIED_THIS_ROUND is stamped for r{MODIFIED_FOR_ROUND} but "
            f"the current round is r{cur} — rewrite the list (or empty it) "
            "and bump MODIFIED_FOR_ROUND before rotating"
        )
    return MODIFIED_THIS_ROUND


def rank_key(greens: dict[str, int]):
    """Sort key shared by rotate_window and apply_rotation: stalest
    first, with never-green and modified-this-round pinned to the
    front (round 0)."""
    modified = modified_this_round()

    def key(q: str):
        rnd = 0 if q in modified else greens.get(q, 0)
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
