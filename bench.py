"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The printed line is COMPACT (r14): totals, hygiene flags, and the
slowest per-query timings up to an 1800-char budget — the driver
records only a 2000-char output tail and parses JSON lines from it, so
the full 200+-query line that grew past that by round 1 arrived
front-truncated and "parsed" stayed null for 13 rounds. The complete
per-query map (wall, cpu, steal, load, error bars) is persisted to
``bench_full_r{N}.json`` in the repo root.

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


def wait_for_quiet_box(
    max_load: float, timeout_s: float, poll_s: float = 20.0
) -> tuple[float, bool]:
    """Load-gate (VERDICT r5 task 8): co-tenant load is the dominant
    round-over-round variance (±15%, BASELINE.md), so refuse to start a
    timed pass on a dirty box — poll the 1-minute load average until it
    drops under ``max_load``. The driver still needs one JSON line per
    round, so the refusal is bounded: after ``timeout_s`` the run
    proceeds and is MARKED dirty instead of silently polluting the
    record. Returns (load_at_start, clean)."""
    deadline = time.monotonic() + timeout_s
    ncpu = os.cpu_count() or 32
    while True:
        load = os.getloadavg()[0]
        if load <= max_load:
            # load can't see hypervisor steal (round 8: same-code runs
            # spread 206->298s at load_gate_clean=True while /proc/stat
            # recorded ~0.5 stolen CPUs) — require the steal rate over a
            # short sample to be under ~2% of the box too.
            s0, t0 = read_steal_ticks(), time.monotonic()
            time.sleep(3.0)
            dt = time.monotonic() - t0
            steal_cpus = (read_steal_ticks() - s0) / 100.0 / dt
            if steal_cpus <= 0.02 * ncpu:
                return load, True
            print(
                f"bench: load ok but hypervisor steal {steal_cpus:.2f} "
                f"cpus — waiting",
                file=sys.stderr,
            )
        if time.monotonic() >= deadline:
            print(
                f"bench: box still dirty (load {load:.2f} > {max_load}) after "
                f"{timeout_s:.0f}s — proceeding, run marked dirty",
                file=sys.stderr,
            )
            return load, False
        print(
            f"bench: load {load:.2f} > {max_load}, waiting for a quiet box",
            file=sys.stderr,
        )
        time.sleep(poll_s)


def read_steal_ticks() -> int:
    """Cumulative hypervisor steal ticks from /proc/stat (field 9 of the
    aggregate cpu line). Steal is the one variance source neither the
    load gate nor per-query load can see — the host giving our vCPUs
    away shows up only here (round-8 spread 206->298s on same code was
    pinned to a measured ~173 stolen CPU-seconds per 330s window)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])
    except Exception:
        return 0


class ProcTreeCpuSampler:
    """Monotone CPU accounting for this process tree (the Spark JVM plus
    pyspark daemon/workers). Unlike wall clock this is STEAL-IMMUNE: the
    hypervisor taking our cores stretches elapsed time but not CPU time,
    so round-over-round regressions are judged on this column when the
    wall-clock spread is load/steal-polluted (BASELINE.md round 8).

    Round-8 postmortem: a stateless tree-total snapshot (sum of
    utime+stime+cutime+cstime over the live tree) went NEGATIVE between
    samples — a pyspark worker exiting mid-window drops its utime from
    the live sum before the daemon's cutime picks it up, so per-query
    deltas on Arrow-worker queries recorded values like -24.76 cpu_s.
    This sampler instead keeps per-(pid, starttime) cumulative ticks and
    folds only monotone, clamped deltas into a running total, so the
    total never decreases:

    - a live process contributes ``max(0, self_ticks - last_seen)``;
    - when a tracked process vanishes, the self-ticks we already
      attributed to it move into a repayment pool KEYED BY ITS PARENT;
      subsequent cutime jumps in that parent draw its own pool down
      first, so a reaped worker is never counted twice — and stale
      credit from an unreaped worker can never absorb a DIFFERENT
      parent's legitimate reap delta (round-9 ADVICE);
    - pool credit expires after ``POOL_EXPIRE_SAMPLES`` samples with no
      repayment: a parent that hasn't reaped by then almost certainly
      never will (the child was re-parented to init), and holding the
      credit would let it cancel a LATER sibling's reap under the same
      parent. Expired ticks are surfaced as ``pool_expired_ticks`` —
      if a parent does reap later than the horizon (rare; wait() is
      normally immediate), cpu_s OVERCOUNTS by that reap, visibly.
    - a worker that lives and dies entirely between samples is still
      caught through its parent's cutime delta;
    - ticks accrued by a vanished process AFTER its last sample are
      unrecoverable only if its parent never reaps it — those events
      are counted in ``gap_events``, and ``gap_bound_ticks`` carries a
      per-event loss bound: max(rate extrapolation over its last
      inter-sample window, wall time since the previous sample x ONE
      core). The wall term closes the r10 hole where an idle-at-death
      worker bounded to 0 while its true tail could be a full sample
      window; the 1-core cap is the pyspark worker/daemon model (the
      processes that churn are single-threaded Python — the JVM never
      vanishes mid-run).

    Error-bar reconciliation (VERDICT r10 "also noting"): the two
    bars bound OPPOSITE directions and together bracket cpu_s.
    ``cpu_gap_bound_s`` bounds UNDERcount (unseen tails of unreaped
    vanishes; nonzero whenever gap_events is). ``pool_expired_ticks``
    bounds OVERcount: expired credit was already counted once at
    attribution time, so totals are exact if the parent truly never
    reaps — the only error a late (post-horizon) reap can add is a
    double count of at most the expired credit, surfaced as
    ``cpu_overcount_bound_s``. ``pool_dropped_ticks`` (parent died
    first) can never double-count — there is no parent left to reap —
    so it belongs to neither bar.
    """

    POOL_EXPIRE_SAMPLES = 3

    def __init__(self) -> None:
        self._hz = os.sysconf("SC_CLK_TCK")
        self._self_seen: dict[tuple[int, int], int] = {}
        self._child_seen: dict[tuple[int, int], int] = {}
        self._attributed: dict[tuple[int, int], int] = {}
        self._last_delta: dict[tuple[int, int], int] = {}
        self._parent_key: dict[tuple[int, int], tuple[int, int] | None] = {}
        # parent key -> list of [born_sample_idx, remaining_ticks]
        self._pool: dict[tuple[int, int], list[list[int]]] = {}
        self._sample_idx = 0
        self._total_ticks = 0
        self._last_now: float | None = None
        self.gap_events = 0
        self.gap_bound_ticks = 0
        self.pool_expired_ticks = 0
        self.pool_dropped_ticks = 0  # parent itself gone at vanish time

    @staticmethod
    def read_proc_table() -> dict[int, tuple[int, int, int, int]]:
        """pid -> (ppid, self_ticks, child_ticks, starttime) for every
        readable /proc entry. starttime disambiguates recycled pids."""
        procs: dict[int, tuple[int, int, int, int]] = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    rest = f.read().rsplit(")", 1)[1].split()
                procs[int(pid)] = (
                    int(rest[1]),
                    int(rest[11]) + int(rest[12]),
                    int(rest[13]) + int(rest[14]),
                    int(rest[19]),
                )
            except Exception:
                continue
        return procs

    def advance(
        self,
        procs: dict[int, tuple[int, int, int, int]],
        root: int,
        now_s: float | None = None,
    ) -> float:
        """Fold one /proc snapshot into the running total; returns
        cumulative attributed CPU seconds. Pure on its inputs — the unit
        tests drive it with synthetic tables (tests/test_bench_sampler)
        and an explicit ``now_s`` where the wall-based gap bound is
        under test."""
        if now_s is None:
            now_s = time.monotonic()
        window_ticks = (
            0
            if self._last_now is None
            else max(0, int((now_s - self._last_now) * self._hz))
        )
        self._last_now = now_s
        self._sample_idx += 1
        kids: dict[int, list[int]] = {}
        for pid, (ppid, _s, _c, _t) in procs.items():
            kids.setdefault(ppid, []).append(pid)
        live: set[tuple[int, int]] = set()
        stack = [root]
        while stack:
            p = stack.pop()
            if p not in procs:
                continue
            live.add((p, procs[p][3]))
            stack.extend(kids.get(p, []))
        # Move vanished processes' live-attributed ticks into their
        # PARENT's repayment pool BEFORE folding deltas: the same
        # snapshot that drops a reaped worker also carries its parent's
        # cutime jump, and the repayment must see the pool first or the
        # worker counts twice.
        for key in [k for k in self._self_seen if k not in live]:
            self.gap_events += 1
            # unseen-tail bound: the larger of the last-window rate
            # extrapolation and one core for the whole sample window
            self.gap_bound_ticks += max(
                self._last_delta.pop(key, 0), window_ticks
            )
            credit = self._attributed.pop(key, 0)
            pkey = self._parent_key.pop(key, None)
            if pkey is not None and pkey in live:
                self._pool.setdefault(pkey, []).append(
                    [self._sample_idx, credit]
                )
            else:
                self.pool_dropped_ticks += credit
            self._self_seen.pop(key, None)
            self._child_seen.pop(key, None)
        stack = [root]
        while stack:
            p = stack.pop()
            if p not in procs:
                continue
            ppid, self_t, child_t, start = procs[p]
            key = (p, start)
            d_self = max(0, self_t - self._self_seen.get(key, 0))
            self._self_seen[key] = self_t
            self._last_delta[key] = d_self
            self._attributed[key] = self._attributed.get(key, 0) + d_self
            self._parent_key[key] = (
                (ppid, procs[ppid][3]) if ppid in procs else None
            )
            d_child = max(0, child_t - self._child_seen.get(key, 0))
            self._child_seen[key] = child_t
            repay = 0
            entries = self._pool.get(key, [])
            while entries and repay < d_child:
                take = min(entries[0][1], d_child - repay)
                entries[0][1] -= take
                repay += take
                if entries[0][1] == 0:
                    entries.pop(0)
            self._total_ticks += d_self + (d_child - repay)
            stack.extend(kids.get(p, []))
        # Expire unrepaid credit older than the horizon (ADVICE r9: a
        # never-reaped child's stale credit must not offset a later
        # sibling's reap under the same parent).
        horizon = self._sample_idx - self.POOL_EXPIRE_SAMPLES
        for pkey in list(self._pool):
            entries = self._pool[pkey]
            keep = []
            for e in entries:
                if e[0] <= horizon and e[1] > 0:
                    self.pool_expired_ticks += e[1]
                elif e[1] > 0:
                    keep.append(e)
            if keep:
                self._pool[pkey] = keep
            else:
                del self._pool[pkey]
        return self._total_ticks / self._hz

    def gap_bound_s(self) -> float:
        """Cumulative rate-extrapolation estimate (seconds) of CPU lost
        to unreaped vanishes — the error bar on the cpu_s column."""
        return self.gap_bound_ticks / self._hz

    def sample(self) -> float:
        return self.advance(self.read_proc_table(), os.getpid())


#: budget for the final compact stdout line: the driver records a
#: 2000-char output tail and parses JSON lines from it; 1800 leaves
#: headroom for a stray trailing log line inside that tail
COMPACT_LINE_BUDGET = 1800


def compact_summary(
    result: dict,
    timings: dict[str, float],
    n_ok: int,
    clean: bool,
    contaminated: bool,
    artifact_path: str | None,
) -> dict:
    """The final stdout JSON line: totals + hygiene flags + the slowest
    per-query timings, greedily added until the serialized line would
    exceed COMPACT_LINE_BUDGET (the rest lives in the full artifact).
    Pure on its inputs — unit-tested against the budget directly."""
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "sf": result["sf"],
        "n_queries": len(timings),
        "n_failed": len(timings) - n_ok,
        "load_gate_clean": clean,
        "run_contaminated": contaminated,
        "steal_cpus_run": result["steal_cpus_run"],
        "cpu_s_total": result["cpu_s_total"],
        "shared_build_total_s": result["shared_build_total_s"],
        "full_artifact": (
            os.path.basename(artifact_path) if artifact_path else None
        ),
    }
    qslow: dict[str, float] = {}
    for name in sorted(timings, key=lambda n: -timings[n]):
        trial = dict(compact)
        trial["queries"] = {**qslow, name: timings[name]}
        trial["queries_omitted"] = len(timings) - len(trial["queries"])
        if len(json.dumps(trial)) > COMPACT_LINE_BUDGET:
            break
        qslow[name] = timings[name]
    compact["queries"] = qslow
    compact["queries_omitted"] = len(timings) - len(qslow)
    return compact


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    max_load = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "1.0"))
    gate_timeout = float(os.environ.get("SPARK_GRAFT_LOAD_TIMEOUT", "600"))
    load_start, clean = wait_for_quiet_box(max_load, gate_timeout)

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()

    # Warmup: run everything once at the smallest scale factor.
    for fn in queries.values():
        try:
            fn(spark, WARMUP_SF).collect()
        except Exception:
            pass

    # One-time shared silver-zone materializations at the BENCH sf,
    # built outside the per-query timing and recorded separately
    # (VERDICT r8 task 6): steady-state per-query numbers should not
    # carry whichever cache build happened to land on them.
    shared_build: dict[str, float] = {}
    try:
        shared_build = entry_mod.prewarm_shared(spark, sf_dir)
    except Exception as e:
        print(f"bench: prewarm failed: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    loads: dict[str, float] = {}
    steals: dict[str, int] = {}
    cpu_s: dict[str, float] = {}
    gaps: dict[str, int] = {}
    gap_bounds: dict[str, float] = {}
    over_bounds: dict[str, float] = {}
    sampler = ProcTreeCpuSampler()
    steal_run0 = read_steal_ticks()
    wall_run0 = time.monotonic()
    cpu_run0 = sampler.sample()
    for name, fn in queries.items():
        steal0 = read_steal_ticks()
        cpu0, gap0 = sampler.sample(), sampler.gap_events
        gb0 = sampler.gap_bound_s()
        ex0 = sampler.pool_expired_ticks
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
        # ambient 1-min load AFTER each query: a co-tenant ramping
        # mid-run is then attributable per query, not just detectable
        # at the run boundaries (VERDICT r7 task 6)
        loads[name] = round(os.getloadavg()[0], 2)
        steals[name] = read_steal_ticks() - steal0
        cpu_s[name] = round(sampler.sample() - cpu0, 2)
        gaps[name] = sampler.gap_events - gap0
        gap_bounds[name] = round(sampler.gap_bound_s() - gb0, 2)
        over_bounds[name] = round(
            (sampler.pool_expired_ticks - ex0) / sampler._hz, 2
        )

    ok = {k: v for k, v in timings.items() if v >= 0}
    total = round(sum(ok.values()), 3)
    # In-run contamination verdict (VERDICT r11 task 6): the start gate
    # can pass and a co-tenant still ramp mid-run — r11's driver rerun
    # recorded 31k steal ticks (~310 stolen CPU-s) and overwrote the
    # clean committed artifact under the canonical name. Apply the
    # start-gate thresholds to the WHOLE timed window; a tripped run
    # writes to bench_full_r{N}.steal.json so it can never shadow a
    # clean canonical artifact.
    run_wall = max(time.monotonic() - wall_run0, 1e-9)
    steal_cpus_run = (read_steal_ticks() - steal_run0) / 100.0 / run_wall
    ncpu = os.cpu_count() or 32
    contaminated = (not clean) or steal_cpus_run > 0.02 * ncpu
    result = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load_avg_start": round(load_start, 2),
        "load_avg_end": round(os.getloadavg()[0], 2),
        "load_gate_clean": clean,
        "load_per_query": loads,
        "steal_ticks_per_query": steals,
        "steal_ticks_total": read_steal_ticks() - steal_run0,
        "steal_cpus_run": round(steal_cpus_run, 3),
        "run_contaminated": contaminated,
        "cpu_s_per_query": cpu_s,
        "cpu_s_total": round(sampler.sample() - cpu_run0, 2),
        # cpu_s error bars bracket the column from both sides (r10
        # reconciliation): UNDERcount — processes that vanished between
        # samples may have unseen tails; cpu_gap_bound_s bounds the loss
        # per query as max(last-window rate, 1 core x sample window), so
        # it is nonzero whenever cpu_gap_events is. OVERcount — expired
        # pool credit was already counted once at attribution; totals
        # are exact unless the parent reaps after the expiry horizon,
        # in which case the reap double-counts at most
        # cpu_overcount_bound_s (== the expired credit, also kept as
        # cpu_pool_expired_s for round-over-round diffability).
        "cpu_gap_events_per_query": gaps,
        "cpu_gap_events_total": sampler.gap_events,
        "cpu_gap_bound_s_per_query": gap_bounds,
        "cpu_gap_bound_s_total": round(sampler.gap_bound_s(), 2),
        "cpu_overcount_bound_s_per_query": over_bounds,
        "cpu_overcount_bound_s_total": round(
            sampler.pool_expired_ticks / sampler._hz, 2
        ),
        # pool hygiene: expired = unreaped credit aged out (the
        # overcount bar above); dropped = parent died first — that
        # credit can never double-count (no parent left to reap)
        "cpu_pool_expired_s": round(sampler.pool_expired_ticks / sampler._hz, 2),
        "cpu_pool_dropped_s": round(sampler.pool_dropped_ticks / sampler._hz, 2),
        "shared_build_s": shared_build,
        "shared_build_total_s": round(sum(shared_build.values()), 3),
    }

    # The driver records only a 2000-char tail of stdout+stderr and
    # parses JSON lines out of THAT tail — every BENCH_r{1..13}.json
    # carries "parsed": null because the full result line here grew past
    # 2000 chars by round 1 and arrived front-truncated (VERDICT r13
    # task 6). So: persist the COMPLETE map as the repo artifact (below),
    # and print ONE compact JSON line, guaranteed to fit inside the tail,
    # as the very LAST output — totals + flags + the slowest per-query
    # timings up to the size budget, with the artifact path for the rest.
    # Round number from $SPARK_GRAFT_ROUND if set, else the next free slot.
    try:
        import re

        rnd = os.environ.get("SPARK_GRAFT_ROUND")
        here = os.path.dirname(os.path.abspath(__file__))
        if rnd is None:
            # current round = latest driver-written BENCH_r{N}.json + 1;
            # repeated runs within a round overwrite (freshest wins)
            done = [
                int(m.group(1))
                for f in os.listdir(here)
                if (m := re.match(r"BENCH_r(\d+)\.json$", f))
            ]
            rnd = str(max(done, default=0) + 1)
        suffix = ".steal.json" if contaminated else ".json"
        path = os.path.join(here, f"bench_full_r{int(rnd):02d}{suffix}")
        with open(path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        print(f"bench: full artifact written to {path}", file=sys.stderr)
        if contaminated:
            print(
                f"bench: run contaminated (steal_cpus_run="
                f"{steal_cpus_run:.3f}, load_gate_clean={clean}) — the "
                "canonical bench_full artifact was NOT touched",
                file=sys.stderr,
            )
    except Exception as e:  # the artifact is best-effort; never fail the bench
        path = None
        print(f"bench: could not write full artifact: {e}", file=sys.stderr)

    sys.stderr.flush()
    print(
        json.dumps(
            compact_summary(
                result, timings, len(ok), clean, contaminated, path
            )
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
