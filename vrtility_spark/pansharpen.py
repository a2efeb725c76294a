"""Pan-sharpening: fuse a high-resolution single-band (pan) tile table
with a lower-resolution multispectral one on the same cell grid — the
classic multi-resolution fusion product (Brovey ratio / additive
detail injection), and this engine's pattern for ANY two-resolution
tile fusion.

The reference warps everything onto one grid before stacking
(R/vrt-warp.R); fusion across grids is the step beyond: at 100 TB the
only viable shape is the one used here — pan and MS tables are both
keyed by ``cell_id``, so the fusion is ONE cell-keyed equi-join plus a
narrow Arrow map (the :func:`algebra.tile_algebra` contract). The
upsample happens inside the map with the shared NaN-aware kernels
(:func:`warp.resample_plane_masked`), so nothing is rewritten to an
intermediate resolution first. Cells missing from either side drop
(inner join), either-side-invalid pixels poison to NaN.

Methods (per pixel, after upsampling MS to the pan grid):

* ``brovey``  — ``out_b = ms_b · pan / I`` where ``I`` is the
  (optionally weighted) mean of the MS bands: preserves band ratios,
  injects pan's spatial detail; ``I ≤ eps`` → NaN.
* ``additive`` — ``out_b = ms_b + (pan − I)``: detail injection that
  preserves the MS radiometry's scale.

Output is ``rawf32``/−9999 at the pan grid (same convention as
terrain/algebra), chainable with every cell-keyed operator.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vrtility_spark import codec
from vrtility_spark.warp import resample_plane_masked

OUT_NODATA = -9999.0
METHODS = ("brovey", "additive")
_EPS = 1e-9


def pansharpen_np(ms: np.ndarray, pan: np.ndarray,
                  method: str = "brovey",
                  weights: Sequence[float] | None = None,
                  resampling: str = "bilinear") -> np.ndarray:
    """Fuse ``(B, h, w)`` MS planes with a ``(H, W)`` pan plane (both
    NaN-masked float); returns ``(B, H, W)`` float64. ``H/h`` and
    ``W/w`` need not be integers — the shared resampling kernels
    handle any ratio ≥ 1."""
    if method not in METHODS:
        raise KeyError(f"unknown pansharpen method {method!r}; "
                       f"known: {METHODS}")
    B = ms.shape[0]
    H, W = pan.shape
    if H < ms.shape[1] or W < ms.shape[2]:
        raise ValueError(
            f"pan grid {H}x{W} is coarser than the MS grid "
            f"{ms.shape[1]}x{ms.shape[2]}; swap the inputs")
    w = (np.full(B, 1.0 / B) if weights is None
         else np.asarray(weights, dtype=np.float64))
    if w.shape != (B,):
        raise ValueError(f"weights shape {w.shape} != ({B},)")
    w = w / w.sum()
    up = np.stack([resample_plane_masked(p, H, W, resampling)
                   for p in ms])
    intensity = np.einsum("b,bhw->hw", w, up)
    with np.errstate(invalid="ignore", divide="ignore"):
        if method == "brovey":
            ratio = np.where(np.abs(intensity) > _EPS,
                             pan / intensity, np.nan)
            out = up * ratio[None]
        else:
            out = up + (pan - intensity)[None]
    out[:, np.isnan(pan)] = np.nan
    return out


def pansharpen(ms: DataFrame, pan: DataFrame, method: str = "brovey",
               ms_bands: Sequence[int] | None = None,
               weights: Sequence[float] | None = None,
               resampling: str = "bilinear",
               pan_band: int = 0, key: str = "cell_id") -> DataFrame:
    """Cell-keyed fusion of two tile tables: ONE equi-join on ``key``
    + a narrow Arrow map (tile bytes shuffle once each, co-partitioned
    by the join). ``ms_bands`` selects the MS planes to sharpen
    (default: all); ``pan_band`` picks the pan plane. Output rows keep
    the MS side's metadata with the payload replaced by the sharpened
    ``rawf32`` planes at the pan grid."""
    if method not in METHODS:
        raise KeyError(f"unknown pansharpen method {method!r}; "
                       f"known: {METHODS}")
    names = [f.name for f in ms.schema.fields]
    for req in (key, "bytes", "w", "h", "fmt", "nodata"):
        if req not in names:
            raise ValueError(f"pansharpen MS input is missing {req!r}")
    sel = None if ms_bands is None else [int(b) for b in ms_bands]
    wts = None if weights is None else [float(x) for x in weights]
    p = pan.select(
        F.col(key),
        F.col("bytes").alias("_p_bytes"), F.col("w").alias("_p_w"),
        F.col("h").alias("_p_h"), F.col("fmt").alias("_p_fmt"),
        F.col("nodata").alias("_p_nodata"),
        (F.col("band_nodata") if "band_nodata" in pan.columns
         else F.lit(None).cast("array<double>")).alias("_p_bn"))
    joined = ms.join(p, key)
    out_fields = [T.StructField(f.name, f.dataType, True)
                  for f in ms.schema.fields]
    out_schema = T.StructType(out_fields)
    pan_i = int(pan_band)

    def fuse(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples(index=False):
                d = dict(zip(pdf.columns, row))
                arr = codec.decode(d["bytes"], int(d["w"]), int(d["h"]),
                                   d["fmt"])
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         d["nodata"])
                A = codec.to_float_masked(arr, nd)
                if sel is not None:
                    A = A[sel]
                parr = codec.decode(d["_p_bytes"], int(d["_p_w"]),
                                    int(d["_p_h"]), d["_p_fmt"])
                # same length-vs-plane-count fallback every decode
                # path gets via codec.row_band_meta: a misaligned
                # array degrades to the scalar, never a broadcast crash
                pnd = d["_p_nodata"]
                if (d["_p_bn"] is not None
                        and len(d["_p_bn"]) == len(parr)):
                    pnd = np.asarray(d["_p_bn"], dtype=np.float64)
                P = codec.to_float_masked(parr, pnd)[pan_i]
                out = pansharpen_np(A, P, method=method, weights=wts,
                                    resampling=resampling)
                res = {n: d[n] for n in names}
                res["bytes"] = codec.encode(
                    codec.from_float(out, OUT_NODATA, "float32"),
                    "rawf32")
                res["w"], res["h"] = int(d["_p_w"]), int(d["_p_h"])
                res["fmt"], res["nodata"] = "rawf32", OUT_NODATA
                # the payload now holds only the sharpened planes:
                # subset the band NAMES alongside and null the per-band
                # scale/offset/nodata arrays — the fused rawf32 values
                # are no longer in the stored-integer domain those
                # described (apply set_scale BEFORE fusing if the MS
                # bands carry physical scale factors)
                if "bands" in names and d.get("bands") is not None:
                    bn = list(d["bands"])
                    res["bands"] = ([bn[i] for i in sel]
                                    if sel is not None
                                    and all(-len(bn) <= i < len(bn)
                                            for i in sel) else
                                    (bn if sel is None else None))
                for c in ("band_scale", "band_offset", "band_nodata"):
                    if c in names:
                        res[c] = None
                rows.append(res)
            yield pd.DataFrame(rows, columns=names)

    return joined.mapInPandas(fuse, schema=out_schema)
