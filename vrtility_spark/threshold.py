"""Automatic histogram thresholding — Otsu (1979) and IsoData
(Ridler–Calvard 1978), the scikit-image ``threshold_otsu`` /
``threshold_isodata`` and GEE auto-threshold recipes — computed over
the EXACT global value histogram of a band and applied as a
zero-shuffle classify map.

The classic use is turning an index plane (NDWI, NDSI, change
magnitude, :mod:`vrtility_spark.mad`'s chi-square) into a mask without
hand-picking the cut: the threshold maximizes between-class variance
(Otsu) or is the fixpoint of "midpoint of the two class means"
(IsoData).

Spark-first shape: one narrow Arrow map emits per-tile ``(value,
count)`` rows for the selected band — integer-family payloads give an
EXACT discrete histogram (the same value-count partials as
:mod:`vrtility_spark.zonal`); float payloads quantize onto a
caller-set ``bins`` grid first (documented, deterministic). One
map-side-combinable ``groupBy(value)`` sum merges the histogram; the
driver-side criterion scan is O(distinct values) with exact integer
moments (int64 counts, float64 sums of exact products), so the chosen
threshold is BIT-IDENTICAL under any partitioning or cluster size.
Applying it is :func:`vrtility_spark.algebra.classify` — a
zero-shuffle map, giving 0/1 class tiles ready for
:func:`regions.polygonize` / :func:`sieve` / :func:`proximity`.

At 100 TB: tile bytes are scanned once; the shuffle is O(distinct
values per tile) tiny rows with map-side combine; the histogram at
the driver is at most 65536 rows (uint16 family) or ``bins`` rows
(float family). Nothing else moves.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec

METHODS = ("otsu", "isodata")


# --------------------------------------------------------- kernels ----

def otsu_np(values: np.ndarray, counts: np.ndarray) -> float:
    """Otsu's threshold over a discrete histogram: the cut maximizing
    between-class variance ``w0·w1·(μ0 − μ1)²``, evaluated exactly at
    every split of the sorted distinct values; ties keep the LOWEST
    threshold. Returns the midpoint of the two values flanking the
    best split (scikit-image convention: pixels ``<= t`` are class
    0). Requires >= 2 distinct values."""
    order = np.argsort(np.asarray(values, np.float64), kind="stable")
    v = np.asarray(values, np.float64)[order]
    c = np.asarray(counts, np.float64)[order]
    if len(v) < 2:
        raise ValueError(
            "otsu: need >= 2 distinct values to threshold")
    w0 = np.cumsum(c)[:-1]
    w1 = c.sum() - w0
    s0 = np.cumsum(c * v)[:-1]
    s1 = (c * v).sum() - s0
    mu0, mu1 = s0 / w0, s1 / w1
    crit = w0 * w1 * (mu0 - mu1) ** 2
    k = int(np.argmax(crit))           # first maximum -> lowest cut
    return float((v[k] + v[k + 1]) / 2.0)


def isodata_np(values: np.ndarray, counts: np.ndarray,
               max_iter: int = 100) -> float:
    """Ridler–Calvard IsoData threshold: iterate ``t ← (μ_below(t) +
    μ_above(t)) / 2`` from the histogram mean until the split of the
    discrete histogram stops moving — deterministic on the exact
    histogram (no sampling, no epsilon)."""
    order = np.argsort(np.asarray(values, np.float64), kind="stable")
    v = np.asarray(values, np.float64)[order]
    c = np.asarray(counts, np.float64)[order]
    if len(v) < 2:
        raise ValueError(
            "isodata: need >= 2 distinct values to threshold")
    t = float((c * v).sum() / c.sum())
    prev_split = -1
    for _ in range(int(max_iter)):
        below = v <= t
        split = int(below.sum())
        if split == prev_split:
            break
        prev_split = split
        if split == 0 or split == len(v):   # degenerate cut: recenter
            t = float((v[0] + v[-1]) / 2.0)
            continue
        mu0 = (c[below] * v[below]).sum() / c[below].sum()
        mu1 = (c[~below] * v[~below]).sum() / c[~below].sum()
        t = float((mu0 + mu1) / 2.0)
    return t


def histogram_naive(A: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Obviously-correct histogram of the finite entries (the oracle
    twin of the distributed value-count merge)."""
    vals = A[np.isfinite(A)]
    uniq, cnt = np.unique(vals, return_counts=True)
    return uniq, cnt.astype(np.int64)


# ---------------------------------------------------- distributed ----

def band_histogram(df: DataFrame, band: int = 0,
                   bins: int | None = None,
                   key: str = "cell_id") -> tuple[np.ndarray,
                                                  np.ndarray]:
    """Exact global ``(values, counts)`` histogram of one band: one
    Arrow pass emitting per-tile value counts, one combinable groupBy
    sum. ``bins`` quantizes float-family payloads onto
    ``floor(v / bin_width)`` buckets between the band's global min and
    max first (two cheap agg passes); integer-family payloads are
    exact with ``bins=None``."""
    for req in (key, "bytes", "w", "h", "fmt", "nodata"):
        if req not in df.columns:
            raise ValueError(f"band_histogram input is missing column "
                             f"{req!r}")
    band = int(band)

    def _plane(row):
        arr = codec.decode(row.bytes, int(row.w), int(row.h), row.fmt)
        nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                 codec.nodata_scalar(row.nodata))
        A = codec.to_float_masked(arr, nd)
        if band >= len(A):
            raise ValueError(
                f"band_histogram: tile has {len(A)} bands, "
                f"band={band} requested")
        return A[band]

    width = None
    lo = None
    if bins is not None:
        bins = int(bins)
        if bins < 2:
            raise ValueError("bins must be >= 2")

        def _minmax(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                rows = []
                for row in pdf.itertuples(index=False):
                    P = _plane(row)
                    if np.isfinite(P).any():
                        rows.append({"lo": float(np.nanmin(P)),
                                     "hi": float(np.nanmax(P))})
                if rows:
                    yield pd.DataFrame(rows, columns=["lo", "hi"])

        mm = (df.mapInPandas(_minmax, "lo double, hi double")
              .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
              .collect()[0])
        if mm["lo"] is None:
            raise ValueError("band_histogram: the band is all nodata")
        lo, hi = float(mm["lo"]), float(mm["hi"])
        width = (hi - lo) / bins if hi > lo else 1.0

    def _counts(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            vals: list[float] = []
            cnts: list[int] = []
            for row in pdf.itertuples(index=False):
                P = _plane(row)
                fin = P[np.isfinite(P)]
                if fin.size == 0:
                    continue
                if width is not None:
                    idx = np.minimum((fin - lo) / width,
                                     bins - 1).astype(np.int64)
                    fin = lo + (idx + 0.5) * width   # bin centers
                uniq, cnt = np.unique(fin, return_counts=True)
                vals.extend(uniq.tolist())
                cnts.extend(cnt.tolist())
            if vals:
                yield pd.DataFrame({
                    "val": np.asarray(vals, np.float64),
                    "n": np.asarray(cnts, np.int64)})

    agg = (df.mapInPandas(_counts, "val double, n long")
           .groupBy("val").agg(F.sum("n").alias("n"))
           .collect())
    if not agg:
        raise ValueError("band_histogram: the band is all nodata")
    values = np.array([float(r["val"]) for r in agg])
    counts = np.array([int(r["n"]) for r in agg], np.int64)
    order = np.argsort(values, kind="stable")
    return values[order], counts[order]


def auto_threshold(df: DataFrame, band: int = 0,
                   method: str = "otsu", bins: int | None = None,
                   key: str = "cell_id") -> float:
    """The selected band's automatic threshold (driver-side float) —
    see the module docstring for the exact-histogram plan."""
    if method not in METHODS:
        raise KeyError(f"unknown threshold method {method!r}; "
                       f"one of {METHODS}")
    values, counts = band_histogram(df, band, bins, key)
    fn = otsu_np if method == "otsu" else isodata_np
    return fn(values, counts)


def threshold_classify(df: DataFrame, band: int = 0,
                       method: str = "otsu", bins: int | None = None,
                       key: str = "cell_id") -> DataFrame:
    """Auto-threshold + apply: 0/1 class tiles (``value > t`` → 1) via
    :func:`vrtility_spark.algebra.classify` — the zero-shuffle
    thematic-mask one-liner. The chosen cut rides along as a
    ``threshold`` literal column for provenance."""
    from vrtility_spark.algebra import classify
    t = auto_threshold(df, band, method, bins, key)
    # classify uses v < break for class 0: shift the cut infinitesimally
    # above t so "value <= t" lands in class 0 (the otsu_np convention)
    out = classify(df, [float(np.nextafter(t, np.inf))], band=band,
                   key=key)
    return out.withColumn("threshold", F.lit(float(t)))
