"""Quiet-window self-probe for the bench harnesses.

This VM shows intermittent sibling-tenant contention that slows
identical runs 30-70%. Before (and independent of) any Spark
measurement, run the ACTUAL geomedian kernel under plain
multiprocessing and report per-process throughput — a committed bench
number then carries its own noise context.

Calibration (recorded so the thresholds stay auditable): the probe
chunk is ``(T=10, B=5, P=4096) float64`` — one full-depth stack of
4096 pixels, the shape the incremental/stack composite paths actually
reduce. On this host, idle windows measure ~5.9-6.1 chunks/s/proc
(flat from 2 to 8 procs — the kernel itself scales at ~1.0);
historically degraded windows ran ~0.65x, so the quiet floor is set
at 5.0. An earlier ad-hoc probe (round 2) used a 4x-smaller
``(5, 5, 4096) float32`` chunk and read 26-29 chunks/s/proc quiet —
those figures are NOT comparable to this probe's scale; the round-3
BENCH/BASELINE.md history rows quoting ~24+ refer to that old shape.

The pool uses the *spawn* start method so workers pick up the same
glibc malloc tuning (``MALLOC_MMAP_THRESHOLD_``) the scaling harness
gives Spark's Python workers — without it, glibc mmaps every ~1.6 MiB
NumPy temporary and kernel page-zeroing costs ~25% of the probe.

Used by bench.py and bench/scaling.py; numbers land in the JSON line
("probe") and in BENCH/BASELINE.md rows.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUIET_CHUNKS_PER_SEC = 5.0  # below this, treat the window as noisy


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
    # spawn (not fork): children must re-init glibc with the malloc
    # tuning below, the same env the harnesses give Spark workers
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    ctx = mp.get_context("spawn")
    with ctx.Pool(procs) as pool:
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
