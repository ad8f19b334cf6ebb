"""The bench compact-line contract (r14): the driver records only a
2000-char output tail and parses JSON lines out of it — every
BENCH_r{1..13}.json carried parsed: null because the full result line
outgrew that tail by round 1. compact_summary must always serialize
within budget, keep the slowest queries, and degrade by OMITTING
queries, never by truncating JSON."""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _result():
    return {
        "metric": "total_query_wall_clock",
        "value": 123.4,
        "unit": "sec",
        "sf": 0.1,
        "steal_cpus_run": 0.01,
        "cpu_s_total": 456.7,
        "shared_build_total_s": 12.3,
    }


def test_compact_line_fits_budget_at_registry_scale():
    timings = {f"query_name_number_{i:04d}": round(0.1 * i, 3) for i in range(250)}
    c = bench.compact_summary(_result(), timings, 250, True, False,
                              "/x/bench_full_r14.json")
    line = json.dumps(c)
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    assert json.loads(line) == c  # valid JSON round-trip
    assert c["n_queries"] == 250
    assert c["queries_omitted"] == 250 - len(c["queries"])
    assert c["queries_omitted"] > 0  # 250 can't fit — must omit, not truncate
    # kept queries are exactly the slowest ones
    kept = set(c["queries"])
    cut = min(c["queries"].values())
    assert all(timings[n] <= cut for n in timings if n not in kept)
    assert c["full_artifact"] == "bench_full_r14.json"


def test_compact_line_small_registry_keeps_everything():
    timings = {f"q{i}": float(i) for i in range(10)}
    c = bench.compact_summary(_result(), timings, 9, False, True, None)
    assert c["queries_omitted"] == 0 and len(c["queries"]) == 10
    assert c["n_failed"] == 1
    assert c["run_contaminated"] is True and c["load_gate_clean"] is False
    assert len(json.dumps(c)) <= bench.COMPACT_LINE_BUDGET
