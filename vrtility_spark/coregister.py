"""Scene co-registration — per-scene (dy, dx) misalignment against a
reference layer, by windowed normalized cross-correlation.

Sensor geolocation error (a pixel or two of jitter between
acquisitions) blurs every temporal product: composites smear edges,
per-pixel trends see phantom change at land-cover boundaries.  The
standard repair estimates each scene's rigid shift against a stable
reference (usually the collection's own median composite) and rolls
the scene back before compositing — AROSICS-style grid registration,
scoped here to the translation term.

Estimator, chosen for determinism and loop-oracle testability: DIRECT
normalized cross-correlation over the ``(2·max_shift+1)²`` candidate
integer shifts (no FFT — bit-deterministic everywhere, and for the
small shift windows registration needs, ``O(s²·H·W)`` is cheap), on
the OVERLAPPING VALID pixels of each candidate (means/norms recomputed
per shift, so masked clouds and footprint pads never bias the score).
The best integer shift gets a closed-form 1-D parabolic refinement in
each axis (the classic subpixel peak interpolation), clamped to ±0.5.
Ties break on the SMALLEST (dy², dx², dy, dx) — deterministic.
Degenerate overlaps (fewer than ``min_overlap`` valid pixels, or zero
variance on either side) report NaN shift with ``peak = NaN``.

Spark-first shape: ONE cell-keyed equi join of the scene tiles
against the reference tiles (broadcast when the reference is small —
it is one row per cell) followed by a narrow Arrow map emitting one
METADATA row per scene: ``(image_id, cell_id, dy, dx, peak,
n_overlap)``.  Tile payloads never shuffle beyond the join;
``apply_shift`` is a separate zero-shuffle map that rolls payloads by
the chosen integer shift (NaN-filling the vacated rim), so estimation
and correction stay independently cacheable stages.

Reference parity: the reference delegates alignment to gdalwarp's
target-grid resampling (R/vrt-warp.R) and assumes the provider's
geolocation; this operator adds the data-driven registration step the
GDAL ecosystem gets from AROSICS/arop, re-expressed distributed.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec

SHIFT_SCHEMA = ("image_id string, cell_id long, dy double, dx double, "
                "peak double, n_overlap long")


def _ncc(a: np.ndarray, b: np.ndarray, min_overlap: int):
    """Normalized cross-correlation of two equal-shape planes over
    their common valid pixels; returns (ncc, n)."""
    m = np.isfinite(a) & np.isfinite(b)
    n = int(m.sum())
    if n < min_overlap:
        return np.nan, n
    av = a[m] - a[m].mean()
    bv = b[m] - b[m].mean()
    den = np.sqrt((av * av).sum() * (bv * bv).sum())
    if den <= 0.0:
        return np.nan, n
    return float((av * bv).sum() / den), n


def _parabolic(cm, c0, cp):
    """1-D parabolic peak refinement around the best integer offset;
    returns a sub-pixel delta clamped to [-0.5, 0.5]."""
    den = cm - 2.0 * c0 + cp
    if not np.isfinite(den) or den >= 0.0 or den == 0.0:
        return 0.0
    return float(np.clip(0.5 * (cm - cp) / den, -0.5, 0.5))


def register_np(ref: np.ndarray, img: np.ndarray, max_shift: int = 4,
                min_overlap: int = 16):
    """Estimate the (dy, dx) shift that best aligns ``img`` to ``ref``
    (both NaN-masked ``(H, W)`` planes): positive dy means the image
    content sits dy pixels DOWN from where the reference has it (roll
    by (-dy, -dx) to correct).  Returns ``(dy, dx, peak, n_overlap)``
    with subpixel parabolic refinement; NaNs when degenerate."""
    if ref.shape != img.shape:
        raise ValueError(f"shapes disagree: {ref.shape} vs {img.shape}")
    s = int(max_shift)
    if s < 1:
        raise ValueError(f"max_shift must be >= 1, got {max_shift}")
    H, W = ref.shape
    scores = np.full((2 * s + 1, 2 * s + 1), np.nan)
    counts = np.zeros((2 * s + 1, 2 * s + 1), dtype=np.int64)
    for iy in range(-s, s + 1):
        for ix in range(-s, s + 1):
            # candidate (iy, ix): image content sits (iy, ix)
            # down-right of the reference, i.e. img[y+iy, x+ix]
            # corresponds to ref[y, x]
            ry0, ry1 = max(0, -iy), min(H, H - iy)
            rx0, rx1 = max(0, -ix), min(W, W - ix)
            if ry1 <= ry0 or rx1 <= rx0:
                continue
            a = ref[ry0:ry1, rx0:rx1]
            b = img[ry0 + iy:ry1 + iy, rx0 + ix:rx1 + ix]
            c, n = _ncc(a, b, min_overlap)
            scores[iy + s, ix + s] = c
            counts[iy + s, ix + s] = n
    if not np.isfinite(scores).any():
        return np.nan, np.nan, np.nan, int(counts[s, s])
    # deterministic argmax: best score, then smallest shift
    best, by, bx = -np.inf, 0, 0
    for iy in range(-s, s + 1):
        for ix in range(-s, s + 1):
            c = scores[iy + s, ix + s]
            if not np.isfinite(c):
                continue
            key = (c, -(iy * iy + ix * ix), -iy, -ix)
            if key > (best, -(by * by + bx * bx), -by, -bx):
                best, by, bx = c, iy, ix
    dy, dx = float(by), float(bx)
    # subpixel refinement needs both neighbors inside the window
    if -s < by < s:
        cm = scores[by - 1 + s, bx + s]
        cp = scores[by + 1 + s, bx + s]
        if np.isfinite(cm) and np.isfinite(cp):
            dy += _parabolic(cm, best, cp)
    if -s < bx < s:
        cm = scores[by + s, bx - 1 + s]
        cp = scores[by + s, bx + 1 + s]
        if np.isfinite(cm) and np.isfinite(cp):
            dx += _parabolic(cm, best, cp)
    return dy, dx, float(best), int(counts[by + s, bx + s])


def shift_np(arr: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Shift a NaN-masked ``(B, H, W)`` tile by integer (dy, dx),
    NaN-filling the vacated rim (content moves down/right for
    positive shifts — the inverse of a measured (dy, dx) is applied
    by passing the negated values)."""
    B, H, W = arr.shape
    out = np.full_like(arr, np.nan)
    ry0, ry1 = max(0, dy), min(H, H + dy)
    rx0, rx1 = max(0, dx), min(W, W + dx)
    if ry1 <= ry0 or rx1 <= rx0:
        return out
    out[:, ry0:ry1, rx0:rx1] = arr[:, ry0 - dy:ry1 - dy,
                                   rx0 - dx:rx1 - dx]
    return out


def _ref_sel(reference: DataFrame, key: str):
    return reference.select(
        F.col(key).alias("_rkey"), F.col("bytes").alias("_rbytes"),
        F.col("w").alias("_rw"), F.col("h").alias("_rh"),
        F.col("fmt").alias("_rfmt"), F.col("nodata").alias("_rnodata"),
        *([F.col("band_nodata").alias("_rband_nodata")]
          if "band_nodata" in {f.name for f in reference.schema.fields}
          else []))


def coregister(scenes: DataFrame, reference: DataFrame, band: int = 0,
               max_shift: int = 4, min_overlap: int = 16,
               key: str = "cell_id",
               broadcast_reference: bool = True) -> DataFrame:
    """Per-scene shift table against the reference layer: ONE equi
    join on the cell key (broadcast by default — the reference is one
    row per cell) + a narrow Arrow map; returns SHIFT_SCHEMA rows."""
    rsel = _ref_sel(reference, key)
    rside = F.broadcast(rsel) if broadcast_reference else rsel
    joined = scenes.join(rside, scenes[key] == rsel["_rkey"])
    snames = [f.name for f in scenes.schema.fields]
    b = int(band)

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            rbnd_col = (pdf["_rband_nodata"] if "_rband_nodata" in pdf
                        else [None] * len(pdf))
            for row, rb, rw, rh, rfmt, rnd, rbnd in zip(
                    pdf[snames].itertuples(index=False),
                    pdf["_rbytes"], pdf["_rw"], pdf["_rh"],
                    pdf["_rfmt"], pdf["_rnodata"], rbnd_col):
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)[b]
                rarr = codec.decode(rb, int(rw), int(rh), rfmt)
                ndr = (np.asarray(rbnd, dtype=np.float64)
                       if rbnd is not None and not np.isscalar(rbnd)
                       and len(np.atleast_1d(rbnd)) == len(rarr)
                       else codec.nodata_scalar(rnd))
                R = codec.to_float_masked(rarr, ndr)[b]
                dy, dx, peak, n = register_np(R, A, max_shift,
                                              min_overlap)
                rows.append({"image_id": row.image_id,
                             "cell_id": int(getattr(row, key)),
                             "dy": dy, "dx": dx, "peak": peak,
                             "n_overlap": n})
            yield pd.DataFrame(rows)

    return joined.mapInPandas(run, schema=SHIFT_SCHEMA)


def apply_shifts(scenes: DataFrame, shifts: DataFrame,
                 key: str = "cell_id",
                 broadcast_shifts: bool = True) -> DataFrame:
    """Correct scenes by their measured shifts: rolls each payload by
    the NEGATED rounded (dy, dx), NaN-filling the rim (honest — no
    fabricated pixels).  Scenes without a finite shift row pass
    through unchanged.  One (broadcastable) join + a narrow map."""
    ssel = shifts.select(
        F.col("image_id").alias("_sid"), F.col(key).alias("_skey"),
        F.round("dy").cast("int").alias("_sdy"),
        F.round("dx").cast("int").alias("_sdx"),
        F.col("dy").alias("_srawdy"))
    sside = F.broadcast(ssel) if broadcast_shifts else ssel
    joined = scenes.join(
        sside, (scenes["image_id"] == ssel["_sid"])
        & (scenes[key] == ssel["_skey"]), "left")
    snames = [f.name for f in scenes.schema.fields]

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = []
            for row, sdy, sdx, raw in zip(
                    pdf[snames].itertuples(index=False),
                    pdf["_sdy"], pdf["_sdx"], pdf["_srawdy"]):
                if pd.isna(raw) or (sdy == 0 and sdx == 0):
                    blobs.append(row.bytes)
                    continue
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)
                out = shift_np(A, -int(sdy), -int(sdx))
                blobs.append(codec.encode(
                    codec.from_float(out, nd, codec.dtype_for(row.fmt)),
                    row.fmt))
            out_pdf = pdf[snames].copy()
            out_pdf["bytes"] = blobs
            yield out_pdf

    return joined.mapInPandas(run, schema=scenes.schema)
