"""sf1 AND sf10 measurement of the late-r13 additions: the
epoch-scoped-tombstone ANN update gate, the proximity-tier lifecycle
gate, the BM25 highlighter, and MMR selection — plus a re-measure of
ann_stream_maintenance, whose tombstone path changed semantics this
round (grouped (vec_id, del_before) reads + per-version liveness
joins) even though its hashes are unchanged.

Reuses tools/bench_sf1_full.py's synthesis (FK-consistent key-shifted
copies; text suffixed per copy except copy 0; embeddings shifted per
copy) at COPIES=10 (sf1) then COPIES=100 (sf10). Adjudication follows
bench_sf10_top: a linear query lands near 10x its sf1 wall at sf10.

Usage: python tools/bench_scale_r13b.py [--skip-sf10] [--keep]
Writes bench_scale_r13b.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_sf1_full as s1

import __spark_entry__ as entry_mod
from data_lake_for_e_commerce_analytics_spark.session import get_spark

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULT = os.path.join(_here, "bench_scale_r13b.json")

NAMES = [
    "ann_index_update",
    "ann_stream_maintenance",
    "phrase_index_lifecycle",
    "search_snippets",
    "mmr_select",
]


def _run_tier(tier: str, root: str, copies: int) -> dict[str, float]:
    s1.SF1 = root
    s1.COPIES = copies
    spark = get_spark(app_name=f"bench_scale_r13b_{tier}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    s1.build(spark)
    print(f"{tier} build: {time.time() - t0:.1f}s", flush=True)
    queries = entry_mod.queries()
    out: dict[str, float] = {}
    for name in NAMES:
        t0 = time.time()
        try:
            queries[name](spark, root).collect()
            out[name] = round(time.time() - t0, 2)
        except Exception as e:
            print(f"{tier} {name} FAILED: {e}", flush=True)
            out[name] = -1.0
        print(f"{tier} {name}: {out[name]}s (load1 "
              f"{os.getloadavg()[0]:.2f})", flush=True)
    spark.stop()
    return out


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    sf1_root, sf10_root = "/tmp/sgr13b_sf1", "/tmp/sgr13b_sf10"
    rows: dict[str, dict] = {n: {} for n in NAMES}
    sf1 = _run_tier("sf1", sf1_root, 10)
    for n, v in sf1.items():
        rows[n]["sf1_s"] = v
    if "--skip-sf10" not in sys.argv:
        sf10 = _run_tier("sf10", sf10_root, 100)
        for n, v in sf10.items():
            rows[n]["sf10_s"] = v
            if v >= 0 and rows[n].get("sf1_s", -1) > 0:
                rows[n]["ratio_10x"] = round(v / rows[n]["sf1_s"], 2)
    result = {
        "what": "late-r13 gates (ANN update flow, proximity lifecycle, "
                "snippets, MMR) + ann_stream_maintenance re-measure at "
                "sf1 (10 copies) and sf10 (100 copies of sf0.1); "
                "synthesis = bench_sf1_full",
        "queries": rows,
        "load1_end": round(os.getloadavg()[0], 2),
    }
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result), flush=True)
    if "--keep" not in sys.argv:
        shutil.rmtree(sf1_root, ignore_errors=True)
        shutil.rmtree(sf10_root, ignore_errors=True)


if __name__ == "__main__":
    main()
