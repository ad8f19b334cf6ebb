"""sf1/sf10 measurement of the four gates added AFTER the first r14
scale pass: filtered_bm25_indexed, hybrid_multi_indexed,
filtered_hybrid_indexed, ann_multi_probe — every registered gate gets
a 10x-step ratio (SCALING.md convention). Seeds (snip2seg, ivf_float,
ann_loose) are built first and timed separately so the gate numbers
are probe-only, the shape the bench records since the r14 fixture
reuse.

Usage: python tools/bench_scale_r14b.py [--skip-sf10] [--keep]
Writes bench_scale_r14b.json.
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
RESULT = os.path.join(_here, "bench_scale_r14b.json")

NAMES = [
    "filtered_bm25_indexed",
    "hybrid_multi_indexed",
    "filtered_hybrid_indexed",
    "ann_multi_probe",
]
SEEDS = ["snip2seg", "ivf_float", "ann_loose"]


def _run_tier(tier: str, root: str, copies: int) -> dict:
    s1.SF1 = root
    s1.COPIES = copies
    spark = get_spark(app_name=f"bench_scale_r14b_{tier}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    s1.build(spark)
    print(f"{tier} build: {time.time() - t0:.1f}s", flush=True)
    queries = entry_mod.queries()
    out: dict = {}
    for fam in SEEDS:
        t0 = time.time()
        entry_mod._seed_index(spark, root, fam)
        out[f"seed_{fam}_s"] = round(time.time() - t0, 2)
    for name in NAMES:
        t0 = time.time()
        try:
            queries[name](spark, root).collect()
            out[f"{name}_s"] = round(time.time() - t0, 2)
        except Exception as e:
            print(f"{tier} {name} FAILED: {e}", flush=True)
            out[f"{name}_s"] = -1.0
        print(f"{tier} {name}: {out[f'{name}_s']}s (load1 "
              f"{os.getloadavg()[0]:.2f})", flush=True)
    out["load1_end"] = round(os.getloadavg()[0], 2)
    spark.stop()
    for key in [k for k in entry_mod._SEED_INDEX_CACHE if k[0] == root]:
        shutil.rmtree(entry_mod._SEED_INDEX_CACHE[key], ignore_errors=True)
        del entry_mod._SEED_INDEX_CACHE[key]
    return out


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    sf1_root, sf10_root = "/tmp/sgr14b_sf1", "/tmp/sgr14b_sf10"
    result: dict = {"sf1": _run_tier("sf1", sf1_root, 10)}
    if "--skip-sf10" not in sys.argv:
        result["sf10"] = _run_tier("sf10", sf10_root, 100)
        ratios = {}
        for k, v in result["sf1"].items():
            if k.endswith("_s") and isinstance(v, float) and v > 0:
                w = result["sf10"].get(k)
                if isinstance(w, float) and w > 0:
                    ratios[k[:-2]] = round(w / v, 2)
        result["ratio_10x"] = ratios
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"written: {RESULT}", flush=True)
    if "--keep" not in sys.argv:
        for d in (sf1_root, sf10_root):
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
