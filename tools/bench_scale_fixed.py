"""Scale proof for the r11 plan-hygiene rewrites (VERDICT r10 tasks
1-3 + the two plan-screen findings): measure the affected queries at
sf1 (10x) AND sf10 (100x) and report the 10x step ratio between them.

The r10 verdict flagged these as correct-but-scale-weak:
- order_value_equidepth / rfm_segments — ntile via Exchange
  SinglePartition (one task sorting the whole relation);
- quality_percentile_filter — Window.partitionBy(lang) under
  dominant-language skew;
- bm25_topk / hybrid_search — F.broadcast of the corpus-cardinality
  per-doc-length relation;
- conversion_by_segment / url_incremental_dedup — broadcast hints on
  fact-tracking relations (plan-screen findings, d81c55f).

All seven were rewritten (operators/distributed_rank.py, semi-join
bounded dl, hints dropped). This tool is the measurement half of the
fix: each query runs once at sf1 and once at sf10 (the FK-consistent
replication from tools/bench_sf1_full.py), and a linear plan should
land near 10x between the two. The old single-partition ntile would
show its one-task sort directly in this ratio as data outgrows a task.

Usage:
    python tools/bench_scale_fixed.py [--skip-build] [--keep] [--out=NAME]

Writes bench_scale_fixed_r11.json.
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

SF1 = "/tmp/sparkgraft_sf1_full"
SF10 = "/tmp/sparkgraft_sf10"
_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULT = os.path.join(_here, "bench_scale_fixed_r11.json")
for _a in sys.argv[1:]:
    if _a.startswith("--out="):
        RESULT = os.path.join(_here, _a.split("=", 1)[1])

QUERIES = [
    "order_value_equidepth",
    "rfm_segments",
    "quality_filtered",  # registry name of text.quality_percentile_filter
    "bm25_topk",
    "hybrid_search",
    "conversion_by_segment",
    "url_incremental_dedup",
]


def _build(spark, dest: str, copies: int) -> float:
    s1.SF1 = dest
    s1.COPIES = copies
    t0 = time.time()
    s1.build(spark)
    return round(time.time() - t0, 1)


def main() -> None:
    # sf10's 60M-row lineitem needs the bigger driver heap (same
    # posture as tools/bench_sf10_top.py); other callers keep 8g
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(app_name="bench_scale_fixed")
    spark.sparkContext.setLogLevel("ERROR")

    build_s = {}
    if "--skip-build" not in sys.argv:
        if not os.path.exists(SF1):
            build_s["sf1"] = _build(spark, SF1, 10)
            print(f"sf1 build: {build_s['sf1']}s", flush=True)
        if not os.path.exists(SF10):
            build_s["sf10"] = _build(spark, SF10, 100)
            print(f"sf10 build: {build_s['sf10']}s", flush=True)

    queries = entry_mod.queries()
    # JVM/codegen warmup so the first measured query doesn't carry
    # session start-up in its sf1 wall
    for d in (SF1, SF10):
        spark.read.parquet(os.path.join(d, "orders.parquet")).count()

    rows = {}
    for name in QUERIES:
        if name not in queries:
            rows[name] = {"error": "not in queries()"}
            continue
        fn = queries[name]
        rec = {}
        for label, sfdir in (("sf1_s", SF1), ("sf10_s", SF10)):
            t0 = time.time()
            try:
                n = fn(spark, sfdir).count()
                rec[label] = round(time.time() - t0, 2)
                rec[label.replace("_s", "_rows")] = n
            except Exception as e:  # keep the rest of the proof alive
                rec[label.replace("_s", "_error")] = str(e)[:300]
        if "sf1_s" in rec and "sf10_s" in rec:
            rec["ratio_10x"] = round(rec["sf10_s"] / rec["sf1_s"], 2)
        rows[name] = rec
        print("ROW", name, json.dumps(rec), flush=True)

    out = {
        "what": "r11 plan-hygiene rewrites measured at sf1 AND sf10; "
                "ratio_10x is the 100x/10x step — linear ~ 10",
        "build_s": build_s,
        "queries": rows,
    }
    with open(RESULT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"written {RESULT}", flush=True)
    if "--keep" not in sys.argv:
        shutil.rmtree(SF10, ignore_errors=True)


if __name__ == "__main__":
    main()
