"""Controlled A/B for the r12 cpu_s drift (VERDICT r12 task 6): four
queries untouched by r12 code regressed +38-58% cpu_s like-for-like in
the canonical artifacts (incremental_dedup 17.7->27.9, ivf_quality
19.2->26.6, ivf_sq8_quality 12.9->18.0, embedding_near_dup_blocked
10.3->14.2). The r8 precedent settles box-vs-code: run the r11 code
(5cef49f, via a git worktree) and the current code on the SAME box in
the SAME hour, interleaved, and compare.

Usage:
  git worktree add .ab_r11 5cef49f      # once
  python tools/ab_cpu_drift_r13.py /root/repo/.ab_r11   # runs A,B,A,B
  git worktree remove .ab_r11

Each tier is its own subprocess (the two code versions cannot share a
python process); each runs the 4 queries 3x at sf0.1 after an sf0.001
warmup and reports per-query wall list + proc-tree cpu_s (the
steal-immune column, sampled from /proc children jiffies like
bench.py). Verdict rule: if the r13/r11 cpu_s ratio per query is ~1.0
the r12 drift was box conditions; >1.2 on any query means code and
needs a bisect.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

NAMES = [
    "incremental_dedup",
    "ivf_quality",
    "ivf_sq8_quality",
    "embedding_near_dup_blocked",
]

CHILD = r"""
import json, os, sys, time
root = sys.argv[1]
sys.path.insert(0, root)
os.chdir(root)
from data_lake_for_e_commerce_analytics_spark.session import get_spark
import __spark_entry__ as em

def cpu_jiffies():
    # self + all live children (the JVM) utime+stime+cutime+cstime
    total = 0.0
    try:
        with open("/proc/self/stat") as f:
            p = f.read().split(")")[-1].split()
            total += sum(float(x) for x in p[11:15])
    except OSError:
        pass
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split(")")[-1].split()
            if int(parts[1]) == os.getpid():  # ppid
                total += float(parts[11]) + float(parts[12])
        except (OSError, ValueError, IndexError):
            continue
    return total / os.sysconf("SC_CLK_TCK")

spark = get_spark(app_name="ab_cpu_drift")
spark.sparkContext.setLogLevel("ERROR")
qs = em.queries()
names = json.loads(sys.argv[2])
for n in names:
    qs[n](spark, "/root/testdata/sf0.001").collect()  # warmup
out = {}
for n in names:
    walls, cpus = [], []
    for _ in range(3):
        c0, t0 = cpu_jiffies(), time.time()
        qs[n](spark, "/root/testdata/sf0.1").collect()
        walls.append(round(time.time() - t0, 2))
        cpus.append(round(cpu_jiffies() - c0, 1))
    out[n] = {"wall": walls, "cpu_s": cpus}
print("ABRESULT " + json.dumps(out))
"""


def run_tier(root: str) -> dict:
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, "-c", CHILD, root, json.dumps(NAMES)],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"tier {root} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old_root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(here, ".ab_r11")
    runs = []
    # interleaved A,B,A,B so slow box drift hits both tiers
    for tier, root in (("r11", old_root), ("r13", here)) * 2:
        print(f"== running {tier} ({root})", flush=True)
        runs.append((tier, run_tier(root)))
        print(f"   {runs[-1][1]}", flush=True)
    merged: dict[str, dict] = {n: {"r11": [], "r13": []} for n in NAMES}
    for tier, res in runs:
        for n, v in res.items():
            merged[n][tier].append(v)
    result = {"what": "r13 A/B vs r11 code (5cef49f), interleaved 2x3 runs, sf0.1",
              "queries": {}}
    for n, v in merged.items():
        min_cpu = {
            t: min(min(r["cpu_s"]) for r in v[t]) for t in ("r11", "r13")
        }
        min_wall = {
            t: min(min(r["wall"]) for r in v[t]) for t in ("r11", "r13")
        }
        result["queries"][n] = {
            "r11": v["r11"],
            "r13": v["r13"],
            "min_cpu_s": min_cpu,
            "min_wall_s": min_wall,
            "cpu_ratio_r13_over_r11": round(min_cpu["r13"] / min_cpu["r11"], 3)
            if min_cpu["r11"] else None,
        }
    out_path = os.path.join(here, "ab_cpu_drift_r13.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["queries"], indent=1))


if __name__ == "__main__":
    main()
