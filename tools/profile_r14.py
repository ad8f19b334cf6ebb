"""Round-14 optimization profiler: per-query wall timing + formatted
physical plans + (optionally) Spark event logs for stage-level
attribution.

Usage:
    python tools/profile_r14.py [--plans-dir plans/r14] [--suffix _before]
                                [--no-warmup] [--sf SF_DIR] [query ...]

For every selected registry query this:
  * labels the jobs (``setJobDescription``) so the event log attributes
    stages to queries,
  * times ``fn(spark, sf)`` (graph/lifecycle construction — for the
    index-lifecycle gates this IS the measured work) and ``collect()``
    separately,
  * writes ``<plans-dir>/<name><suffix>.txt`` with
    ``explain("formatted")`` output,
  * appends one JSON line per query to stdout-as-artifact
    ``/tmp/profile_r14<suffix>.jsonl``.

Event logs land in /tmp/spark-events-r14 (parse with
tools/stage_attribution.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from data_lake_for_e_commerce_analytics_spark.session import get_spark

WARMUP_SF = "/root/testdata/sf0.001"


def explain_formatted(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default="plans/r14")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--no-eventlog", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    os.makedirs(args.plans_dir, exist_ok=True)
    evdir = "/tmp/spark-events-r14"
    os.makedirs(evdir, exist_ok=True)
    extra = {}
    if not args.no_eventlog:
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        }
    spark = get_spark(app_name="profile_r14", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    names = args.names or list(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if not args.no_warmup:
        for n in names:
            try:
                queries[n](spark, WARMUP_SF).collect()
            except Exception as e:
                print(f"warmup {n} failed: {e}", file=sys.stderr)
        try:
            entry_mod.prewarm_shared(spark, args.sf)
        except Exception as e:
            print(f"prewarm failed: {e}", file=sys.stderr)

    out_path = f"/tmp/profile_r14{args.suffix}.jsonl"
    with open(out_path, "w") as out:
        for n in names:
            spark.sparkContext.setJobDescription(n)
            t0 = time.perf_counter()
            try:
                df = queries[n](spark, args.sf)
                t1 = time.perf_counter()
                rows = len(df.collect())
                t2 = time.perf_counter()
                plan = explain_formatted(df)
                with open(
                    os.path.join(args.plans_dir, f"{n}{args.suffix}.txt"), "w"
                ) as pf:
                    pf.write(plan)
                rec = {
                    "q": n,
                    "build_s": round(t1 - t0, 3),
                    "collect_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                    "rows": rows,
                }
            except Exception as e:
                rec = {"q": n, "error": str(e)[:300]}
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(json.dumps(rec), file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
    print(f"profile written to {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
