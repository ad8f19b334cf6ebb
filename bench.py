"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is collected to the driver (same as the driver's harness), timed
end-to-end including scan. A warmup pass on sf0.001 triggers JVM/codegen
warmup so timings reflect steady-state plan execution, not JIT noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from data_lake_for_e_commerce_analytics_spark.session import get_spark

WARMUP_SF = "/root/testdata/sf0.001"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()

    # Warmup: run everything once at the smallest scale factor.
    for fn in queries.values():
        try:
            fn(spark, WARMUP_SF).collect()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0

    ok = {k: v for k, v in timings.items() if v >= 0}
    total = round(sum(ok.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
