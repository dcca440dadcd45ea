"""Measurement hygiene shared by bench.py and jobs/scaling_bench.py.

This sandbox is a shared host: noisy-neighbor bursts show up as
/proc/stat steal and can double a wall-clock sample. Every recorded
number therefore follows the same protocol the scaling bench pioneered:
sample steal around each run, discard+retry runs whose average stolen
cores exceed the gate, and report the MEDIAN of the clean runs (which
also absorbs first-run JIT/page-cache warmup).
"""

from __future__ import annotations

import statistics
import time


def read_proc_stat() -> list[int]:
    """First /proc/stat line: user nice sys idle iowait irq softirq steal
    (clock ticks)."""
    with open("/proc/stat") as f:
        p = f.readline().split()
    return [int(x) for x in p[1:9]]


def steal_cores(s0: list[int], s1: list[int], wall: float) -> float:
    """Average cores stolen by the hypervisor during [s0, s1]."""
    return (s1[7] - s0[7]) / 100.0 / max(wall, 1e-9)


def timed_median(
    fn,
    runs: int = 3,
    steal_gate: float = 0.25,
    max_attempts: int | None = None,
    run_metrics=None,
    pre_run=None,
):
    """Median wall seconds over ``runs`` clean executions of ``fn``.

    A run with avg stolen cores > ``steal_gate`` is logged as discarded
    and retried (while attempts remain — the last attempts always count
    so a permanently-noisy host still yields a number, flagged in the
    log). ``run_metrics(s0, s1, wall) -> dict`` optionally folds extra
    per-run observations (e.g. achieved parallelism from the same
    /proc/stat samples) into each log record. ``pre_run`` runs OUTSIDE
    the timed window before every attempt — inter-run isolation (e.g.
    draining lingering shuffle files that a single long-lived JVM only
    reclaims on driver GC; a real cluster job exits and frees them for
    free, so carrying them into the next timed run measures an
    artifact, not the engine). This is THE shared protocol — bench.py
    and jobs/scaling_bench.py both call it, so the retry-budget and
    discard rules cannot drift between them.
    Returns (median_seconds, run_log).
    """
    max_attempts = max_attempts if max_attempts is not None else runs + 3
    walls: list[float] = []
    log: list[dict] = []
    attempts = 0
    while len(walls) < runs and attempts < max_attempts:
        attempts += 1
        if pre_run is not None:
            pre_run()
        s0 = read_proc_stat()
        t0 = time.time()
        fn()
        wall = time.time() - t0
        s1 = read_proc_stat()
        sc = steal_cores(s0, s1, wall)
        rec = {"wall": round(wall, 3), "steal_cores": round(sc, 3)}
        if run_metrics is not None:
            rec.update(run_metrics(s0, s1, wall))
        can_retry = attempts < max_attempts and (max_attempts - attempts) >= (
            runs - len(walls)
        )
        if sc > steal_gate and can_retry:
            rec["discarded"] = True
        else:
            walls.append(wall)
        log.append(rec)
    return statistics.median(walls), log
