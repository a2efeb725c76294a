"""Raster fidelity metrics — per-cell MSE / PSNR between two tile
collections.

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
