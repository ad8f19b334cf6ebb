"""Parse a Spark event log (written by tools/profile_r14.py) and
attribute stage/task time to the job descriptions (= query names).

Usage:
    python tools/stage_attribution.py /tmp/spark-events-r14/<app-id> [query]

Prints, per job description: job count, stage count, task count, sum of
task run time, shuffle bytes read/written, and the slowest stages with
their names — the "where does the time go" table the optimization guide
asks for (§1.1) without the UI.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    only = sys.argv[2] if len(sys.argv) > 2 else None

    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    stage_info: dict[int, dict] = {}
    stage_metrics: dict[int, dict] = defaultdict(
        lambda: {"tasks": 0, "run_ms": 0, "cpu_ms": 0, "sr_bytes": 0,
                 "sw_bytes": 0, "input_bytes": 0, "fetch_ms": 0,
                 "gc_ms": 0, "wall_ms": 0}
    )

    with open(path, errors="replace") as f:
        for line in f:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if not isinstance(ev, dict):
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                jid = ev["Job ID"]
                job_desc[jid] = desc
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stage_info[sid] = {
                    "name": si.get("Stage Name", ""),
                    "wall_ms": (si.get("Completion Time", 0)
                                - si.get("Submission Time", 0)),
                }
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                m = stage_metrics[sid]
                m["tasks"] += 1
                m["run_ms"] += tm.get("Executor Run Time", 0)
                m["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
                m["gc_ms"] += tm.get("JVM GC Time", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                m["sr_bytes"] += (srm.get("Remote Bytes Read", 0)
                                  + srm.get("Local Bytes Read", 0))
                m["fetch_ms"] += srm.get("Fetch Wait Time", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                m["sw_bytes"] += swm.get("Shuffle Bytes Written", 0)
                im = tm.get("Input Metrics") or {}
                m["input_bytes"] += im.get("Bytes Read", 0)

    per_desc: dict[str, dict] = defaultdict(
        lambda: {"jobs": set(), "stages": [], "run_ms": 0, "cpu_ms": 0,
                 "sr_mb": 0.0, "sw_mb": 0.0, "in_mb": 0.0, "tasks": 0,
                 "wall_ms": 0}
    )
    for sid, m in stage_metrics.items():
        jid = stage_job.get(sid)
        desc = job_desc.get(jid, "?") or "?"
        d = per_desc[desc]
        d["jobs"].add(jid)
        info = stage_info.get(sid, {})
        d["stages"].append(
            (m["run_ms"], sid, info.get("name", "?"), m["tasks"],
             round(m["sr_bytes"] / 1e6, 1), round(m["sw_bytes"] / 1e6, 1),
             info.get("wall_ms", 0))
        )
        d["run_ms"] += m["run_ms"]
        d["cpu_ms"] += m["cpu_ms"]
        d["tasks"] += m["tasks"]
        d["sr_mb"] += m["sr_bytes"] / 1e6
        d["sw_mb"] += m["sw_bytes"] / 1e6
        d["in_mb"] += m["input_bytes"] / 1e6
        d["wall_ms"] += info.get("wall_ms", 0)

    rows = sorted(per_desc.items(), key=lambda kv: -kv[1]["run_ms"])
    for desc, d in rows:
        if only and only not in desc:
            continue
        print(
            f"\n== {desc}: jobs={len(d['jobs'])} stages={len(d['stages'])} "
            f"tasks={d['tasks']} task_run={d['run_ms']/1000:.1f}s "
            f"cpu={d['cpu_ms']/1000:.1f}s stage_wall={d['wall_ms']/1000:.1f}s "
            f"shufR={d['sr_mb']:.0f}MB shufW={d['sw_mb']:.0f}MB "
            f"input={d['in_mb']:.0f}MB"
        )
        for run_ms, sid, name, tasks, sr, sw, wall in sorted(
            d["stages"], reverse=True
        )[:8]:
            print(
                f"   stage {sid:>4} run={run_ms/1000:6.2f}s wall={wall/1000:5.2f}s "
                f"tasks={tasks:>3} shufR={sr:7.1f}MB shufW={sw:7.1f}MB  {name[:90]}"
            )


if __name__ == "__main__":
    main()
