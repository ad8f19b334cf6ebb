"""Compare two bench artifacts and classify per-query deltas.

Usage:
    python tools/compare_bench.py OLD.json NEW.json [--wall-thresh=0.5] [--cpu-thresh=0.3]

Wall clock on this box moves with hypervisor steal and co-tenant load
(BASELINE.md round 8: same-code spread 169-298 s); CPU seconds
(``cpu_s_per_query``, recorded since round 8) do not. So a delta is:

- REAL        — cpu up by more than --cpu-thresh (fractional) AND wall up:
                the query genuinely does more work.
- ENVIRONMENT — wall up but cpu flat/down: the box, not the code. The
                per-query steal ticks, when present, are printed as the
                corroborating witness.
- IMPROVED    — cpu down by more than the threshold.
- (unclassified small deltas are suppressed)

Artifacts without cpu columns (pre-round-8) degrade to wall-only
reporting with an explicit warning.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    wall_thresh = 0.5
    cpu_thresh = 0.3
    paths = []
    for a in sys.argv[1:]:
        if a.startswith("--wall-thresh="):
            wall_thresh = float(a.split("=", 1)[1])
        elif a.startswith("--cpu-thresh="):
            cpu_thresh = float(a.split("=", 1)[1])
        else:
            paths.append(a)
    if len(paths) != 2:
        print(__doc__)
        return 2
    old = json.load(open(paths[0]))
    new = json.load(open(paths[1]))
    ow, nw = old["queries"], new["queries"]
    oc = old.get("cpu_s_per_query") or {}
    nc = new.get("cpu_s_per_query") or {}
    steal = new.get("steal_ticks_per_query") or {}
    common = [k for k in ow if k in nw and ow[k] >= 0 and nw[k] >= 0]
    print(
        f"common queries: {len(common)}  wall {sum(ow[k] for k in common):.1f}s"
        f" -> {sum(nw[k] for k in common):.1f}s"
        + (
            f"  cpu {sum(oc.get(k, 0) for k in common):.1f}s"
            f" -> {sum(nc.get(k, 0) for k in common):.1f}s"
            if oc and nc
            else ""
        )
    )
    if not (oc and nc):
        print("WARNING: cpu_s_per_query missing in one artifact — wall-only view,")
        print("         steal/load pollution cannot be separated from real change.")
    rows = []
    for k in common:
        dw = nw[k] - ow[k]
        if oc and nc:
            base = max(oc.get(k, 0.0), 0.2)
            dc_frac = (nc.get(k, 0.0) - oc.get(k, 0.0)) / base
            if dc_frac > cpu_thresh and dw > wall_thresh:
                cls = "REAL"
            elif dc_frac < -cpu_thresh:
                cls = "IMPROVED"
            elif dw > wall_thresh:
                cls = "ENVIRONMENT"
            else:
                continue
            rows.append((cls, abs(dw), k, dw, dc_frac))
        elif abs(dw) > wall_thresh:
            rows.append(("WALL-ONLY", abs(dw), k, dw, 0.0))
    for cls in ("REAL", "IMPROVED", "ENVIRONMENT", "WALL-ONLY"):
        grp = sorted((r for r in rows if r[0] == cls), key=lambda r: -r[1])
        if not grp:
            continue
        print(f"\n{cls}:")
        for _, _, k, dw, dc in grp:
            extra = f" steal={steal[k]}" if k in steal else ""
            print(f"  {k:34s} wall {dw:+6.2f}s cpu {dc:+5.0%}{extra}")
    only_new = sorted(set(nw) - set(ow))
    if only_new:
        print(f"\nnew queries: {only_new}")
    reals = [r for r in rows if r[0] == "REAL"]
    return 1 if reals else 0


if __name__ == "__main__":
    raise SystemExit(main())
