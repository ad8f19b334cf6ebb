"""Unit tests for bench.ProcTreeCpuSampler (VERDICT r8 task 3).

The round-8 stateless tree-total snapshot recorded NEGATIVE per-query
cpu_s when pyspark workers exited between samples. These tests drive the
stateful fold with synthetic /proc tables and pin the invariants:
monotone total, no double-count across reaping, short-lived workers
caught via cutime, attribution gaps flagged rather than silent.

Table shape: pid -> (ppid, self_ticks, child_ticks, starttime).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ProcTreeCpuSampler

HZ = os.sysconf("SC_CLK_TCK")

ROOT = 100
JVM = 200
DAEMON = 300
WORKER = 400


def ticks(seconds: float) -> int:
    return int(round(seconds * HZ))


def test_live_accrual_is_incremental():
    s = ProcTreeCpuSampler()
    t0 = s.advance({ROOT: (1, ticks(1), 0, 5)}, ROOT)
    t1 = s.advance({ROOT: (1, ticks(4), 0, 5)}, ROOT)
    assert t0 == 1.0
    assert t1 == 4.0
    assert s.gap_events == 0


def test_worker_exit_unreaped_never_negative():
    """The r8 bug: worker utime drops out of the live sum before any
    cutime pickup. The fold must hold the total flat, not go negative."""
    s = ProcTreeCpuSampler()
    base = {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6)}
    s.advance({**base, WORKER: (DAEMON, ticks(30), 0, 7)}, ROOT)
    total_before = s.advance({**base, WORKER: (DAEMON, ticks(40), 0, 7)}, ROOT)
    assert total_before == 40.0
    # worker vanishes; daemon cutime never moves (re-parented / unreaped)
    total_after = s.advance(base, ROOT)
    assert total_after == total_before  # flat, NOT -40
    assert s.gap_events == 1


def test_reaped_worker_counted_exactly_once():
    """Live-attributed worker ticks must repay the parent's cutime jump
    when the worker is reaped, not stack on top of it."""
    s = ProcTreeCpuSampler()
    base = {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6)}
    s.advance({**base, WORKER: (DAEMON, ticks(100), 0, 7)}, ROOT)
    # worker exits with exactly the ticks we saw; daemon reaps -> cutime
    total = s.advance(
        {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, ticks(100), 6)}, ROOT
    )
    assert total == 100.0  # once, not 200


def test_reap_after_further_accrual_counts_the_tail():
    """Worker accrues past its last live sample, then is reaped: the
    cutime jump exceeds the repayment pool and the tail is recovered."""
    s = ProcTreeCpuSampler()
    base = {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6)}
    s.advance({**base, WORKER: (DAEMON, ticks(60), 0, 7)}, ROOT)
    total = s.advance(
        {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, ticks(90), 6)}, ROOT
    )
    assert total == 90.0  # 60 live + 30 tail via cutime, no double count


def test_short_lived_worker_caught_via_cutime():
    s = ProcTreeCpuSampler()
    s.advance({ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6)}, ROOT)
    total = s.advance({ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, ticks(50), 6)}, ROOT)
    assert total == 50.0


def test_out_of_tree_processes_ignored():
    s = ProcTreeCpuSampler()
    table = {ROOT: (1, ticks(2), 0, 5), 999: (1, ticks(500), ticks(500), 1)}
    assert s.advance(table, ROOT) == 2.0


def test_pid_reuse_distinguished_by_starttime():
    """A recycled pid with a new starttime is a new process: its ticks
    count from zero, not as a (clamped-negative) delta vs the old one."""
    s = ProcTreeCpuSampler()
    base = {ROOT: (1, 0, 0, 5)}
    s.advance({**base, WORKER: (ROOT, ticks(80), 0, 7)}, ROOT)
    s.advance(base, ROOT)  # old worker gone (pool = 80)
    total = s.advance({**base, WORKER: (ROOT, ticks(10), 0, 99)}, ROOT)
    assert total == 90.0  # 80 old (held) + 10 new
    assert s.gap_events == 1


def test_total_is_monotone_over_random_churn():
    """Fuzz: arbitrary spawn/accrue/exit/reap interleavings never drive
    the running total down."""
    import random

    rng = random.Random(42)
    s = ProcTreeCpuSampler()
    procs = {ROOT: [1, 0, 0, 5], DAEMON: [ROOT, 0, 0, 6]}
    next_pid, prev = 1000, 0.0
    for _ in range(200):
        for rec in procs.values():
            rec[1] += rng.randrange(0, 50)
        if rng.random() < 0.3:
            procs[next_pid] = [DAEMON, rng.randrange(0, 100), 0, next_pid]
            next_pid += 1
        workers = [p for p in procs if p not in (ROOT, DAEMON)]
        if workers and rng.random() < 0.3:
            w = rng.choice(workers)
            gone = procs.pop(w)
            if rng.random() < 0.7:  # daemon reaps it
                procs[DAEMON][2] += gone[1]
        total = s.advance({p: tuple(r) for p, r in procs.items()}, ROOT)
        assert total >= prev
        prev = total


DAEMON2 = 310


def test_stale_credit_cannot_offset_other_parents_reap():
    """r9 ADVICE: an unreaped worker under DAEMON must not absorb a
    legitimately-reaped worker's cutime jump under DAEMON2."""
    s = ProcTreeCpuSampler()
    base = {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6), DAEMON2: (ROOT, 0, 0, 8)}
    w2 = 410
    s.advance({**base, WORKER: (DAEMON, ticks(50), 0, 7), w2: (DAEMON2, ticks(20), 0, 9)}, ROOT)
    # WORKER vanishes unreaped (credit 50 pooled under DAEMON only)
    s.advance({**base, w2: (DAEMON2, ticks(20), 0, 9)}, ROOT)
    # w2 exits and DAEMON2 reaps it: its cutime jump must be fully
    # repaid by w2's OWN credit — and ONLY that — leaving total at 70
    total = s.advance(
        {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6), DAEMON2: (ROOT, 0, ticks(20), 8)},
        ROOT,
    )
    assert total == 70.0  # 50 (held for WORKER) + 20 (w2 once)


def test_sibling_reap_not_absorbed_by_stale_sibling_credit():
    """Same parent: unreaped sibling A's stale credit must EXPIRE before
    it can cancel sibling B's later reap delta."""
    s = ProcTreeCpuSampler()
    base = {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6)}
    wa, wb = 401, 402
    s.advance({**base, wa: (DAEMON, ticks(30), 0, 7)}, ROOT)
    s.advance(base, ROOT)  # A vanishes unreaped: credit 30 pooled
    # several quiet samples age the credit past the expiry horizon
    for _ in range(ProcTreeCpuSampler.POOL_EXPIRE_SAMPLES + 1):
        s.advance(base, ROOT)
    assert s.pool_expired_ticks == ticks(30)
    # B lives, dies, is reaped: its 25s must be counted despite A's
    # old 30-tick credit having once sat under the same parent
    s.advance({**base, wb: (DAEMON, ticks(25), 0, 12)}, ROOT)
    total = s.advance({ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, ticks(25), 6)}, ROOT)
    assert total == 30.0 + 25.0


def test_gap_bound_estimates_lost_tail():
    """The gap bound extrapolates a vanished worker's last-window rate:
    worker ran 30->40 ticks in its last window, so the unseen tail is
    estimated at 10 ticks (unit-test advances are micro-seconds apart,
    so the wall-window term stays ~0 and the rate term dominates)."""
    s = ProcTreeCpuSampler()
    base = {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6)}
    s.advance({**base, WORKER: (DAEMON, ticks(30), 0, 7)}, ROOT)
    s.advance({**base, WORKER: (DAEMON, ticks(40), 0, 7)}, ROOT)
    s.advance(base, ROOT)  # vanishes unreaped
    assert s.gap_events == 1
    assert s.gap_bound_s() == 10.0


def test_gap_bound_covers_idle_at_death_worker():
    """r10 reconciliation: a worker IDLE in its last window (rate
    extrapolation 0) that vanishes unreaped must still carry a nonzero
    loss bound — one core for the wall time since the previous sample —
    instead of the r10 behavior (bound 0 while the true tail could be a
    whole sample window)."""
    s = ProcTreeCpuSampler()
    base = {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6)}
    s.advance({**base, WORKER: (DAEMON, ticks(30), 0, 7)}, ROOT, now_s=100.0)
    s.advance({**base, WORKER: (DAEMON, ticks(30), 0, 7)}, ROOT, now_s=102.0)
    s.advance(base, ROOT, now_s=107.0)  # vanishes; idle since ts=100
    assert s.gap_events == 1
    assert s.gap_bound_s() == 5.0  # 1 core x the 5 s sample window


def test_gap_bound_takes_max_of_rate_and_window():
    """A busy worker's rate extrapolation can exceed one wall-core
    (multi-core bursts inside the JVM tree): the bound takes the max,
    never the min."""
    s = ProcTreeCpuSampler()
    base = {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6)}
    s.advance({**base, WORKER: (DAEMON, ticks(0), 0, 7)}, ROOT, now_s=10.0)
    s.advance({**base, WORKER: (DAEMON, ticks(8), 0, 7)}, ROOT, now_s=12.0)
    s.advance(base, ROOT, now_s=13.0)  # 8 ticks/2s rate > 1s window
    assert s.gap_bound_s() == 8.0


def test_prompt_reap_never_expires_credit():
    """The normal path — reap within one sample — must not leak into
    pool_expired_ticks or the gap bound beyond the last-window delta."""
    s = ProcTreeCpuSampler()
    base = {ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, 0, 6)}
    s.advance({**base, WORKER: (DAEMON, ticks(100), 0, 7)}, ROOT)
    total = s.advance({ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, ticks(100), 6)}, ROOT)
    assert total == 100.0
    for _ in range(5):
        total = s.advance({ROOT: (1, 0, 0, 5), DAEMON: (ROOT, 0, ticks(100), 6)}, ROOT)
    assert total == 100.0
    assert s.pool_expired_ticks == 0
