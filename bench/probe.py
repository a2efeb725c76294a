"""Quiet-window self-probe for the bench harnesses.

This VM shows intermittent sibling-tenant contention that slows
identical runs 30-70%. Before (and independent of) any Spark
measurement, run the ACTUAL geomedian kernel under plain
multiprocessing and report per-process throughput — a committed bench
number then carries its own noise context: quiet windows measure
~26-29 chunks/s/proc at 8 procs; degraded windows drop to ~17.

Used by bench.py and bench/scaling.py; numbers land in the JSON line
("probe") and in BENCH/BASELINE.md rows.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUIET_CHUNKS_PER_SEC = 24.0  # below this, treat the window as noisy


def _work(seconds: float) -> float:
    import numpy as np

    sys.path.insert(0, REPO)
    from vrtility_spark import composite

    rng = np.random.default_rng(0)
    X = rng.normal(1000, 100, size=(10, 5, 4096)).astype(np.float64)
    X[rng.random(X.shape) < 0.2] = np.nan
    t0 = time.perf_counter()
    cnt = 0
    while time.perf_counter() - t0 < seconds:
        composite.geomedian_mb(X)
        cnt += 1
    return cnt / (time.perf_counter() - t0)


def kernel_probe(procs: int = 8, seconds: float = 1.5) -> dict:
    """Measure per-process geomedian-kernel throughput at `procs` workers.

    Returns {"procs", "per_proc_chunks_per_sec_min/mean", "quiet"}.
    `quiet` is True when even the slowest worker saw a quiet window.
    """
    with mp.Pool(procs) as pool:
        rates = pool.map(_work, [seconds] * procs)
    return {
        "procs": procs,
        "per_proc_chunks_per_sec_min": round(min(rates), 1),
        "per_proc_chunks_per_sec_mean": round(sum(rates) / len(rates), 1),
        "quiet": min(rates) >= QUIET_CHUNKS_PER_SEC,
    }


if __name__ == "__main__":
    import json

    for procs in (2, 8):
        print(json.dumps(kernel_probe(procs=procs)))
