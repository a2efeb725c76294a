"""Raster fidelity metrics — per-cell MSE / PSNR and windowed SSIM
between two tile collections.

The acceptance language of lossy raster pipelines (and of this
engine's own brief) is "decoded pixels within PSNR ≥ 40 dB": any
stage that re-encodes, resamples, compresses, corrects or blends
needs a distributed way to SCORE its output against a reference.
This operator is that gate as a first-class verb: joined per cell,
scored per band over the COMMON VALID pixels, emitted as metadata
rows (never payloads).

Definitions (per band):

- ``mse  = mean((a - b)²)`` over pixels valid on BOTH sides,
- ``psnr = 10·log10(peak² / mse)`` with ``peak`` explicit (defaults
  to the classic full-scale 65535 for uint16 payloads) — ``inf`` for
  identical planes is reported as NULL (NaN) with ``identical=1`` so
  downstream thresholds (``psnr >= 40``) stay well-defined,
- ``n`` common valid pixels; bands with none report NaN metrics.

Spark-first shape: the same cell-keyed equi join as
:func:`algebra.tile_algebra` (broadcast when one side is a small
reference) + a narrow Arrow map emitting ``(key, band, n, mse, psnr,
identical)`` rows — tile payloads never shuffle past the join, and
the output is a tiny metrics table ready for a threshold filter or a
global aggregate.

Reference parity: the reference validates composites with testthat
fixtures on decoded pixels (tests/testthat/ composite/masking
fixtures); this is the same contract made distributed and continuous.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec

PSNR_SCHEMA = ("cell_id long, band int, n long, mse double, "
               "psnr double, identical int")

#: classic full-scale peak for the uint16 payload family
DEFAULT_PEAK = 65535.0

#: uniform SSIM window half-width (5x5) — small enough that the halo
#: strips stay a sliver of the tile, large enough for stable moments
SSIM_RADIUS = 2


def ssim_np(Pa: np.ndarray, Pb: np.ndarray, radius: int = SSIM_RADIUS,
            peak: float = DEFAULT_PEAK, k1: float = 0.01,
            k2: float = 0.03) -> np.ndarray:
    """Windowed SSIM map of two PADDED NaN-masked ``(B, H+2r, W+2r)``
    arrays → ``(B, H, W)``.

    The uniform-window population-moment variant (Wang et al. 2004
    with a box window, as in ``tf.image.ssim(filter_sigma=None)``
    rather than scikit-image's sample-variance gaussian): per window,
    moments are taken over the samples valid on BOTH sides;
    ``C1=(k1*peak)²``, ``C2=(k2*peak)²``. A pixel is NaN when its own
    pair is not common-valid or its window holds fewer than 2 common
    samples (a 1-sample window has zero variance on both sides and
    would report a degenerate 1.0).
    """
    from vrtility_spark.focal import focal_np
    r = int(radius)
    if Pa.shape != Pb.shape:
        raise ValueError(f"tile shapes disagree: {Pa.shape} vs {Pb.shape}")
    if peak <= 0:
        raise ValueError(f"peak must be positive, got {peak}")
    m = np.isfinite(Pa) & np.isfinite(Pb)
    a = np.where(m, Pa.astype(np.float64), np.nan)
    b = np.where(m, Pb.astype(np.float64), np.nan)
    with np.errstate(invalid="ignore"):
        n = focal_np(a, "count", r)
        mu_a = focal_np(a, "mean", r)
        mu_b = focal_np(b, "mean", r)
        va = np.maximum(focal_np(a * a, "mean", r) - mu_a * mu_a, 0.0)
        vb = np.maximum(focal_np(b * b, "mean", r) - mu_b * mu_b, 0.0)
        cov = focal_np(a * b, "mean", r) - mu_a * mu_b
        c1 = (k1 * peak) ** 2
        c2 = (k2 * peak) ** 2
        out = ((2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)) / (
            (mu_a * mu_a + mu_b * mu_b + c1) * (va + vb + c2))
    out[(n < 2) | ~m[:, r:Pa.shape[1] - r, r:Pa.shape[2] - r]] = np.nan
    return out


def tile_ssim_map(left: DataFrame, right: DataFrame,
                  radius: int = SSIM_RADIUS, peak: float = DEFAULT_PEAK,
                  key: str = "cell_id",
                  broadcast_right: bool = False) -> DataFrame:
    """Per-pixel SSIM map between two ONE-ROW-PER-CELL tile
    collections (e.g. a processed composite vs its reference) as a
    chainable tile table: same schema as ``left``, payload replaced by
    the ``(B, H, W)`` SSIM plane (rawf32, -9999 sentinel where the
    pair is not common-valid).

    Spark-first plan — windows cross tile seams, so this is a focal
    operator, but it needs neighbor pixels of BOTH collections.
    Rather than two halo exchanges, the cell-keyed equi join (the
    :func:`tile_psnr` shape; ``broadcast_right`` for a small
    reference) stacks the pair into ONE ``2B``-plane rawf64 payload,
    and the single :func:`focal.focal_filter` exchange then ships
    strips that carry both sides at once — one shuffle total, halo
    bytes ~``4r/w`` of tile bytes. PSNR (pointwise) needs no halo;
    SSIM (windowed) is why this operator exists separately.

    Reference parity: the reference's fidelity checks are pointwise
    testthat fixture comparisons (tests/testthat/); SSIM is the
    structural twin single-node imaging stacks reach for
    (scikit-image/tf.image), here made seam-exact and distributed.
    """
    from vrtility_spark.focal import focal_filter
    r = int(radius)
    if r < 1:
        raise ValueError("radius must be >= 1")
    pk = float(peak)
    if pk <= 0:
        raise ValueError(f"peak must be positive, got {peak}")
    for side, df in (("left", left), ("right", right)):
        names = {f.name for f in df.schema.fields}
        for req in (key, "bytes", "w", "h", "fmt", "nodata"):
            if req not in names:
                raise ValueError(
                    f"tile_ssim_map {side} table is missing column {req!r}")
    lnames = [f.name for f in left.schema.fields]
    rnames = {f.name for f in right.schema.fields}
    rsel = right.select(
        F.col(key).alias("_rkey"), F.col("bytes").alias("_rbytes"),
        F.col("w").alias("_rw"), F.col("h").alias("_rh"),
        F.col("fmt").alias("_rfmt"), F.col("nodata").alias("_rnodata"),
        *([F.col("band_nodata").alias("_rband_nodata")]
          if "band_nodata" in rnames else []))
    rside = F.broadcast(rsel) if broadcast_right else rsel
    joined = left.join(rside, left[key] == rsel["_rkey"])
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields)

    def stack(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            rbnd_col = (pdf["_rband_nodata"] if "_rband_nodata" in pdf
                        else [None] * len(pdf))
            for row, rb, rw, rh, rfmt, rnd, rbnd in zip(
                    pdf[lnames].itertuples(index=False),
                    pdf["_rbytes"], pdf["_rw"], pdf["_rh"],
                    pdf["_rfmt"], pdf["_rnodata"], rbnd_col):
                w, h = int(row.w), int(row.h)
                if int(rw) != w or int(rh) != h:
                    raise ValueError(
                        f"tile_ssim_map: tile grids disagree at cell "
                        f"{getattr(row, key)}: {w}x{h} vs {rw}x{rh}")
                arr = codec.decode(row.bytes, w, h, row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)
                rarr = codec.decode(rb, w, h, rfmt)
                if len(rarr) != len(arr):
                    raise ValueError(
                        f"tile_ssim_map: band counts disagree at cell "
                        f"{getattr(row, key)}: {len(arr)} vs {len(rarr)}")
                ndr = codec.band_meta_or_scalar(
                    rbnd, len(rarr), codec.nodata_scalar(rnd))
                B = codec.to_float_masked(rarr, ndr)
                d = {c: getattr(row, c) for c in lnames}
                d["bytes"] = codec.encode(
                    np.concatenate([A, B], axis=0), "rawf64")
                d["fmt"] = "rawf64"
                d["nodata"] = float("nan")
                if "band_nodata" in d:
                    d["band_nodata"] = None
                rows.append(d)
            yield pd.DataFrame(rows, columns=lnames)

    stacked = joined.mapInPandas(stack, schema=out_fields)

    def kernel(P: np.ndarray, meta: dict) -> np.ndarray:
        nb = P.shape[0] // 2
        return ssim_np(P[:nb], P[nb:], r, pk)

    return focal_filter(stacked, op=kernel, radius=r, fill=True, key=key,
                        out_fmt="rawf32", out_nodata=-9999.0)


def tile_ssim(left: DataFrame, right: DataFrame,
              radius: int = SSIM_RADIUS, peak: float = DEFAULT_PEAK,
              key: str = "cell_id",
              broadcast_right: bool = False) -> DataFrame:
    """Global mean SSIM per band: the :func:`tile_ssim_map` plane
    reduced by a narrow Arrow partial pass (per-tile ``(band, n,
    sum)`` rows — fixed-size, payloads never shuffle again) and one
    tiny ``groupBy(band)`` agg → ``(band, n, mssim)``."""
    smap = tile_ssim_map(left, right, radius=radius, peak=peak, key=key,
                         broadcast_right=broadcast_right)

    def partials(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for buf, w, h, fmt in zip(pdf["bytes"], pdf["w"], pdf["h"],
                                      pdf["fmt"]):
                arr = codec.decode(buf, int(w), int(h), fmt)
                for bi in range(len(arr)):
                    v = arr[bi][arr[bi] != -9999.0].astype(np.float64)
                    rows.append({"band": bi, "n": int(v.size),
                                 "s": float(v.sum())})
            yield pd.DataFrame(rows, columns=["band", "n", "s"])

    part = smap.mapInPandas(partials, "band int, n long, s double")
    return (part.groupBy("band")
            .agg(F.sum("n").alias("n"),
                 (F.sum("s") / F.sum("n")).alias("mssim"))
            .orderBy("band"))


def psnr_np(a: np.ndarray, b: np.ndarray, peak: float = DEFAULT_PEAK):
    """Per-band (n, mse, psnr, identical) over common valid pixels of
    two NaN-masked ``(B, H, W)`` arrays.  ``psnr`` is NaN when the
    planes are identical (mse 0 → infinite PSNR; ``identical=1``
    flags it) or when no pixel is valid on both sides."""
    if a.shape != b.shape:
        raise ValueError(f"tile shapes disagree: {a.shape} vs {b.shape}")
    if peak <= 0:
        raise ValueError(f"peak must be positive, got {peak}")
    out = []
    for bi in range(a.shape[0]):
        m = np.isfinite(a[bi]) & np.isfinite(b[bi])
        n = int(m.sum())
        if n == 0:
            out.append((0, np.nan, np.nan, 0))
            continue
        d = a[bi][m].astype(np.float64) - b[bi][m].astype(np.float64)
        mse = float((d * d).mean())
        if mse == 0.0:
            out.append((n, 0.0, np.nan, 1))
        else:
            out.append((n, mse,
                        float(10.0 * np.log10(peak * peak / mse)), 0))
    return out


def tile_psnr(left: DataFrame, right: DataFrame,
              peak: float = DEFAULT_PEAK, key: str = "cell_id",
              broadcast_right: bool = False,
              passthrough: tuple = ()) -> DataFrame:
    """Distributed fidelity gate: inner join on the cell key, one
    narrow Arrow map, PSNR_SCHEMA metric rows per (LEFT row, band) —
    a many-scenes-vs-one-reference left side scores every scene
    (outlier screening); ``passthrough`` names left columns (e.g.
    ``("image_id",)``) copied onto the metric rows."""
    if peak <= 0:
        raise ValueError(f"peak must be positive, got {peak}")
    for side, df in (("left", left), ("right", right)):
        names = {f.name for f in df.schema.fields}
        for req in (key, "bytes", "w", "h", "fmt", "nodata"):
            if req not in names:
                raise ValueError(
                    f"tile_psnr {side} table is missing column {req!r}")
    lnames = [f.name for f in left.schema.fields]
    rsel = right.select(
        F.col(key).alias("_rkey"), F.col("bytes").alias("_rbytes"),
        F.col("w").alias("_rw"), F.col("h").alias("_rh"),
        F.col("fmt").alias("_rfmt"), F.col("nodata").alias("_rnodata"),
        *([F.col("band_nodata").alias("_rband_nodata")]
          if "band_nodata" in {f.name for f in right.schema.fields}
          else []))
    rside = F.broadcast(rsel) if broadcast_right else rsel
    joined = left.join(rside, left[key] == rsel["_rkey"])
    pk = float(peak)
    extra = tuple(str(c) for c in passthrough)
    by_name = {f.name: f for f in left.schema.fields}
    for c in extra:
        if c not in by_name:
            raise ValueError(f"passthrough column {c!r} not in the "
                             "left table")
    out_schema = PSNR_SCHEMA
    if extra:
        out_schema += ", " + ", ".join(
            f"{c} {by_name[c].dataType.simpleString()}" for c in extra)

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            rbnd_col = (pdf["_rband_nodata"] if "_rband_nodata" in pdf
                        else [None] * len(pdf))
            for row, rb, rw, rh, rfmt, rnd, rbnd in zip(
                    pdf[lnames].itertuples(index=False),
                    pdf["_rbytes"], pdf["_rw"], pdf["_rh"],
                    pdf["_rfmt"], pdf["_rnodata"], rbnd_col):
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)
                rarr = codec.decode(rb, int(rw), int(rh), rfmt)
                ndr = (np.asarray(rbnd, dtype=np.float64)
                       if rbnd is not None and not np.isscalar(rbnd)
                       and len(np.atleast_1d(rbnd)) == len(rarr)
                       else codec.nodata_scalar(rnd))
                B = codec.to_float_masked(rarr, ndr)
                cid = int(getattr(row, key))
                ex = {c: getattr(row, c) for c in extra}
                for bi, (n, mse, psnr, ident) in enumerate(
                        psnr_np(A, B, pk)):
                    rows.append({"cell_id": cid, "band": bi, "n": n,
                                 "mse": mse, "psnr": psnr,
                                 "identical": ident, **ex})
            yield pd.DataFrame(rows)

    return joined.mapInPandas(run, schema=out_schema)
