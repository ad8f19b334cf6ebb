"""100x posture check (VERDICT r9 task 5): run the 10 most expensive
queries by sf1 wall at sf10 — a 100-copy FK-consistent replication of
sf0.1 (~60M-row lineitem, 200k embeddings, 200k documents) — to catch
any quadratic tail a single 10x step can't separate from linear.

Reuses tools/bench_sf1_full.py's synthesis verbatim (same key shifts,
token suffixing, signed-permutation embeddings) with COPIES
monkeypatched to 100: the per-copy key strides were sized for >=100
copies from the start (10M/100M/1e9), so ids stay disjoint.

Adjudication contract: a linear query should land near 10x its sf1
wall; anything >=30x gets a fix or a by-construction proof in
SCALING.md.

Usage: python tools/bench_sf10_top.py [--skip-build] [--keep]
Writes bench_sf10_top_r10.json.
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

SF10 = "/tmp/sparkgraft_sf10"
_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_BENCH = os.path.join(_here, "bench_sf1_full_r09.json")
RESULT = os.path.join(_here, "bench_sf10_top_r10.json")
TOP_N = 10


def main() -> None:
    s1.COPIES = 100
    s1.SF1 = SF10
    # the sf10 posture run is the one caller that needs the bigger
    # driver heap (60M-row lineitem in a single JVM); everyone else
    # keeps session.py's 8g default (ADVICE r10)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(app_name="bench_sf10_top")
    spark.sparkContext.setLogLevel("ERROR")

    if "--skip-build" not in sys.argv:
        t0 = time.time()
        s1.build(spark)
        print(f"sf10 build: {time.time() - t0:.1f}s", flush=True)

    sf1 = json.load(open(SF1_BENCH))
    # top10_sf1 is a name->seconds dict; take the TOP_N slowest by sf1 wall
    top = [
        name
        for name, _ in sorted(
            sf1["top10_sf1"].items(), key=lambda kv: -kv[1]
        )[:TOP_N]
    ]
    queries = entry_mod.queries()

    # symmetric shared-cache prewarm (the r9 asymmetric-prewarm lesson)
    shared = {}
    try:
        shared = entry_mod.prewarm_shared(spark, SF10)
        print(f"prewarm: {shared}", flush=True)
    except Exception as e:
        print(f"prewarm failed: {e}", flush=True)

    # The registered embedding_near_dup_blocked gate pins
    # max_block_rows=16 — a correctness-forcing config that exercises
    # the sub-block pairing at tiny sf. At 200k rows / ~20k-row labels
    # that is ceil(20000/16)=1250 sub-blocks -> ~780k sub-block PAIRS
    # per label (7.8M Arrow groups, each row shuffled 1250x): quadratic
    # in GROUP COUNT by construction of the bound, not of the operator
    # (group count ~ (n/bound)^2/2). The sf10 posture row therefore
    # runs the PRODUCTION bound (2000, the r9 bench_blocked_neardup
    # config): 200k rows -> n_sub ~ 10-11 per label, ~60 group-pairs.
    # Substitution recorded in the artifact.
    def _blocked_production(spark_, sfdir):
        from data_lake_for_e_commerce_analytics_spark.operators import dedup
        from data_lake_for_e_commerce_analytics_spark.sources.tables import load_table
        return dedup.embedding_near_dup_pairs_auto(
            load_table(spark_, sfdir, "embeddings"),
            threshold=0.35,
            max_block_rows=2000,
        )

    substituted = {
        "embedding_near_dup_blocked": (
            _blocked_production,
            "registered gate pins max_block_rows=16 (sub-block-path "
            "correctness config; group count (n/16)^2 is quadratic by "
            "construction) — sf10 row uses the production bound 2000",
        )
    }

    rows = {}
    for name in top:
        sf1_s = sf1["queries"][name]["sf1_s"]
        fn = queries[name]
        note = None
        if name in substituted:
            fn, note = substituted[name]
        # a task OOM can stop the whole local SparkContext — recover so
        # one query's failure doesn't void the rest of the posture check
        if spark.sparkContext._jsc is None or spark.sparkContext._jsc.sc().isStopped():
            print(f"{name}: SparkContext stopped — rebuilding session", flush=True)
            spark = get_spark(app_name="bench_sf10_top")
            spark.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        try:
            fn(spark, SF10).collect()
            wall = round(time.time() - t0, 2)
            rows[name] = {
                "sf1_s": sf1_s,
                "sf10_s": wall,
                "ratio_10x": round(wall / sf1_s, 2),
                "load1": round(os.getloadavg()[0], 2),
            }
            if note:
                rows[name]["substitution"] = note
        except Exception as e:
            rows[name] = {"sf1_s": sf1_s, "error": str(e)[:300]}
        print("ROW", name, json.dumps(rows[name]), flush=True)

    out = {
        "what": "top-10-by-sf1-wall queries at sf10 (100 copies of sf0.1); "
                "ratio_10x is sf10_s/sf1_s — linear ~ 10, adjudicate >= 30",
        "shared_build_s": shared,
        "queries": rows,
    }
    with open(RESULT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"written {RESULT}", flush=True)
    if "--keep" not in sys.argv:
        shutil.rmtree(SF10, ignore_errors=True)


if __name__ == "__main__":
    main()
