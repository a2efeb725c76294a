"""Spatial nodata interpolation — gdal_fillnodata's job on the
distributed cell grid.

Cloud holes, scan-line gaps, and coverage seams that survive temporal
compositing need SPATIAL filling; the GDAL utility the reference
ecosystem reaches for (gdal_fillnodata.py / GDALFillNodata) is a
single-raster pass.  Here the same product is a cell-keyed stage:
every nodata pixel takes the inverse-distance-weighted mean of the
valid pixels within ``max_dist`` (Euclidean, pixel units), then
``smoothing`` iterations of a 3x3 mean relax the filled pixels only —
valid input pixels are never altered, and holes with NO valid sample
in range stay nodata (the cap is honest, not extrapolating).

Semantics are declared, not cloned: GDAL approximates "nearest valid
samples" with four directional scans; this operator weights ALL valid
pixels within the cap (``1/d^power``, default power 2) — rotationally
symmetric, deterministic, and loop-oracle testable.  Both agree on
the contract that matters: only data within ``max_dist`` influences a
fill, smoothing touches only filled pixels.

Scale shape: the cap is what makes the operator local (the same
argument as :mod:`proximity`) — a fill can only see ``max_dist``
pixels, so tiles need ``r + smoothing`` neighbor rows, exactly what
:func:`focal.focal_filter`'s halo exchange ships (one cell-keyed
shuffle of edge strips; tile payloads never shuffle).  Smoothing
iterations run INSIDE the padded window — each eats one pad ring, so
the halo is sized ``ceil(max_dist) + smoothing`` and the result is
byte-identical to filling one assembled mosaic whose void (pixels
past the zone edge or under a missing neighbor tile) is marked by the
``coverage`` mask: void pixels are not holes — they are never filled
and never feed a smoothing mean, exactly as pixels beyond a raster's
edge don't exist for gdal_fillnodata.  (The halo exchange reports
per-window coverage via ``meta["coverage"]``.)  The kernel itself is
an offset-loop accumulation (one vectorized pass per window offset,
O(K^2) passes of O(B*H*W)) — no (B,H,W,K,K) materialization, bounded
memory at any tile size.

Reference parity: the reference delegates nodata repair to GDAL
utilities outside its pipeline (R/gdal-options.R); vrt_gapfill
(timeseries.gapfill_periodic) fills along TIME — this fills along
SPACE, the missing half of the repair story.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from vrtility_spark.focal import focal_filter


def fillnodata_np(P: np.ndarray, max_dist: float, power: float = 2.0,
                  smoothing: int = 0, pad: int | None = None,
                  coverage: np.ndarray | None = None) -> np.ndarray:
    """Fill NaNs of a padded ``(B, Hp, Wp)`` array in place of the
    crop: returns the ``(B, Hp-2*pad, Wp-2*pad)`` interior after IDW
    filling every NaN from the valid pixels within ``max_dist`` and
    ``smoothing`` 3x3-mean relaxations of the filled pixels.  ``pad``
    defaults to ``required_pad(max_dist, smoothing)`` (the halo the
    distributed driver ships); the fill itself runs over the WHOLE
    padded array so relaxation near the crop boundary sees its
    neighbors' filled values — the mosaic-exactness invariant.

    ``coverage`` (optional ``(Hp, Wp)`` bool) marks pixels that belong
    to the data footprint: NaNs OUTSIDE it are the void past the
    raster/zone edge (or a missing neighbor tile), not holes — they
    are never filled and never feed a smoothing mean, exactly as
    pixels beyond a single raster's edge don't exist for
    gdal_fillnodata.  Default ``None`` = everything covered (the
    standalone-kernel case)."""
    if not float(max_dist) >= 1.0:
        raise ValueError("max_dist must be >= 1 pixel")
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    r = int(np.ceil(float(max_dist)))
    if pad is None:
        pad = required_pad(max_dist, smoothing)
    B, Hp, Wp = P.shape
    holes = np.isnan(P)
    if coverage is not None:
        holes &= np.asarray(coverage, bool)[None, :, :]
    num = np.zeros((B, Hp, Wp))
    den = np.zeros((B, Hp, Wp))
    # donors are the FINITE pixels (never void NaNs, which `holes`
    # already excludes from the fill targets when coverage is given)
    fin0 = np.isfinite(P)
    Pz = np.where(fin0, P, 0.0)
    val = fin0.astype(np.float64)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            d = float(np.hypot(dy, dx))
            if d > float(max_dist):
                continue
            w_ = d ** -float(power)
            # shifted views: neighbor (y+dy, x+dx) seen from (y, x)
            ys, yd = (dy, None) if dy >= 0 else (0, dy)
            xs, xd = (dx, None) if dx >= 0 else (0, dx)
            src = (slice(None), slice(ys, yd), slice(xs, xd))
            dst = (slice(None),
                   slice(0 if dy >= 0 else -dy, Hp - dy if dy >= 0 else Hp),
                   slice(0 if dx >= 0 else -dx, Wp - dx if dx >= 0 else Wp))
            num[dst] += Pz[src] * w_
            den[dst] += val[src] * w_
    with np.errstate(invalid="ignore"):
        filled = np.where(holes & (den > 0), num / den, P)
    fillable = holes & (den > 0)
    for _ in range(int(smoothing)):
        # 3x3 mean of finite values, applied to FILLED pixels only
        s = np.zeros_like(filled)
        c = np.zeros_like(filled)
        fin = np.isfinite(filled)
        Fz = np.where(fin, filled, 0.0)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                src = (slice(None),
                       slice(dy if dy >= 0 else 0,
                             None if dy >= 0 else dy),
                       slice(dx if dx >= 0 else 0,
                             None if dx >= 0 else dx))
                dst = (slice(None),
                       slice(0 if dy >= 0 else -dy,
                             Hp - dy if dy >= 0 else Hp),
                       slice(0 if dx >= 0 else -dx,
                             Wp - dx if dx >= 0 else Wp))
                s[dst] += Fz[src]
                c[dst] += fin[src].astype(np.float64)
        with np.errstate(invalid="ignore"):
            sm = s / c
        filled = np.where(fillable & (c > 0), sm, filled)
    return filled[:, pad:Hp - pad, pad:Wp - pad]


def required_pad(max_dist: float, smoothing: int = 0) -> int:
    """Halo rows a tile needs for mosaic-exact fill: the IDW search
    radius plus one ring per smoothing iteration (each 3x3 relaxation
    reads one more ring of its neighbors' FILLED pixels)."""
    return int(np.ceil(float(max_dist))) + int(smoothing)


def fillnodata(df: DataFrame, max_dist: float, power: float = 2.0,
               smoothing: int = 0, key: str = "cell_id") -> DataFrame:
    """Distributed gdal_fillnodata twin over a one-row-per-cell tile
    table: IDW-fill nodata pixels from the valid pixels within
    ``max_dist`` (pixels, Euclidean), then ``smoothing`` 3x3-mean
    relaxations of the filled pixels only.  Valid pixels pass through
    untouched (bit-exact); unreachable holes stay nodata.  One
    cell-keyed halo shuffle of ``required_pad()`` edge rows; output
    keeps the input's format and sentinels, so the stage chains with
    every other cell-keyed operator.  Reference: the reference leaves
    nodata repair to gdal_fillnodata outside its pipeline
    (R/gdal-options.R); its temporal twin here is
    timeseries.gapfill_periodic."""
    if not float(max_dist) >= 1.0:
        raise ValueError("max_dist must be >= 1 pixel")
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    pad = required_pad(max_dist, smoothing)

    def kernel(P: np.ndarray, meta: dict) -> np.ndarray:
        return fillnodata_np(P, max_dist, power=power,
                             smoothing=smoothing, pad=pad,
                             coverage=meta.get("coverage"))

    return focal_filter(df, op=kernel, radius=pad, fill=True, key=key)
