"""Benchmark utilities: CPU-steal-aware timing.

This sandbox VM shows heavy, bursty hypervisor CPU steal (observed: ~97 s
stolen during a 100 s window), which can inflate any single wall-clock
measurement several-fold. Honest protocol: run N trials, report each with
its steal fraction, and use the minimum (the least-contended observation —
the standard estimator under external interference).
"""

from __future__ import annotations

import time
from collections.abc import Callable


def read_steal_jiffies() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    # cpu user nice system idle iowait irq softirq steal ...
    return int(parts[8]) if len(parts) > 8 else 0


def timed_trials(
    fn: Callable[[], None],
    n_trials: int = 3,
    *,
    steal_gate: float | None = 0.02,
    max_attempts: int | None = None,
    cores_used: int | None = None,
) -> list[dict]:
    """Run fn n times; per trial capture wall seconds + steal fraction
    (stolen CPU-seconds / (wall * ncpus)).

    Steal bursts stall the whole VM (all vCPUs pause together), so a sample
    taken during one measures the host, not the code. With ``steal_gate``,
    keep sampling (up to ``max_attempts``, default 3×n) until ``n_trials``
    quiet samples are collected; noisy samples are still recorded (marked
    ``gated``) for transparency.
    """
    import os

    ncpus = os.cpu_count() or 1
    hz = 100  # USER_HZ
    out: list[dict] = []
    quiet = 0
    attempts = 0
    cap = max_attempts if max_attempts is not None else 3 * n_trials
    while quiet < n_trials and attempts < cap:
        attempts += 1
        s0 = read_steal_jiffies()
        t0 = time.monotonic()
        fn()
        wall = time.monotonic() - t0
        stolen = (read_steal_jiffies() - s0) / hz
        # normalize by the cores the JOB uses, not the whole box: a local[2]
        # run losing 17 CPU-s to steal lost ~11% of its compute even though
        # that is <1% of 32 vCPUs (idle vCPUs accrue almost no steal)
        denom_cores = cores_used or ncpus
        frac = round(stolen / (wall * denom_cores), 3) if wall else 0.0
        rec = {
            "sec": round(wall, 2),
            "steal_cpu_sec": round(stolen, 1),
            "steal_frac": frac,
        }
        if steal_gate is not None and frac > steal_gate:
            rec["gated"] = True
        else:
            quiet += 1
        out.append(rec)
    return out


def best(trials: list[dict]) -> dict:
    return min(trials, key=lambda t: t["sec"])
