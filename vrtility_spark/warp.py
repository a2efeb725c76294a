"""Grid alignment ("warp-lite") and deterministic tile→cell assignment.

The reference's ``vrt_warp`` (/root/reference/R/vrt-warp.R:34-246)
reprojects every scene onto one target grid so pixels align across
time — the normalization that makes everything downstream an equi-join.
Here the equivalent is:

1. :func:`assign_cells` — footprint → cell id, a pure ``Column``
   expression (Catalyst codegen, zero UDF, zero shuffle).
2. :func:`cells_cover` — footprint → *all* covering cells at a
   resolution, via built-in ``sequence``/``explode`` (still no UDF).
3. :func:`warp_to_grid` — resample pixel payloads onto a new (w, h)
   pixel grid inside an Arrow-batched ``mapInPandas``; mask/Byte planes
   always use nearest-neighbour, matching the reference's forced-NN
   rule for Byte bands (R/vrt-warp.R:404-415,449-456).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec
from vrtility_spark.cells import (
    MAX_RES,
    cell_size,
    parent_col,
    xy_to_cell_col,
)


def assign_cells(df: DataFrame, res: int, prefix_k: int = 2,
                 zone_col: str = "zone") -> DataFrame:
    """Add ``cell_id`` (cell of the footprint center at ``res``) and
    ``cell_prefix`` (ancestor ``prefix_k`` levels up — the hash-join
    key). Pure expressions → fused into the scan stage."""
    cx = (F.col("xmin") + F.col("xmax")) / 2
    cy = (F.col("ymin") + F.col("ymax")) / 2
    out = df.withColumn("cell_id", xy_to_cell_col(F.col(zone_col), cx, cy, res))
    return out.withColumn("cell_prefix", parent_col(F.col("cell_id"), prefix_k))


def cells_cover(df: DataFrame, res: int, zone_col: str = "zone",
                out_col: str = "cover_cell") -> DataFrame:
    """Explode each bbox to its covering cells at ``res`` with built-in
    ``sequence``+``explode`` — the cell-cover analogue of the
    reference's AOI windowing (projwin pushdown, R/vrt-warp.R:473-477).

    upper edges are exclusive (a bbox touching a boundary does not
    enter the next cell), matching
    :func:`vrtility_spark.cells.cover_bbox_np`.
    """
    size = F.lit(cell_size(res))
    n = F.lit((1 << res) - 1)

    def clipped(c):
        return F.greatest(F.lit(0), F.least(n, c)).cast("long")

    ix0 = clipped(F.floor(F.col("xmin") / size))
    ix1 = clipped(F.ceil(F.col("xmax") / size) - 1)
    iy0 = clipped(F.floor(F.col("ymin") / size))
    iy1 = clipped(F.ceil(F.col("ymax") / size) - 1)
    out = (
        df.withColumn("_ix", F.explode(F.sequence(ix0, ix1)))
        .withColumn("_iy", F.explode(F.sequence(iy0, iy1)))
    )
    zone = F.col(zone_col).cast("long")
    cell = ((zone * 16 + F.lit(res)) * 8192 + F.col("_iy")) * 8192 + F.col("_ix")
    return out.withColumn(out_col, cell).drop("_ix", "_iy")


# ------------------------------------------------- resampling kernels ----

def resample_plane(a: np.ndarray, out_h: int, out_w: int, method: str) -> np.ndarray:
    """Resample one 2-D plane. GDAL-style pixel-center convention:
    src = (dst + 0.5) * scale - 0.5."""
    h, w = a.shape
    if method == "nearest":
        yi = np.clip(((np.arange(out_h) + 0.5) * h / out_h - 0.5).round(), 0, h - 1).astype(int)
        xi = np.clip(((np.arange(out_w) + 0.5) * w / out_w - 0.5).round(), 0, w - 1).astype(int)
        return a[np.ix_(yi, xi)]
    if method == "bilinear":
        fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
        fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
        y0 = np.clip(np.floor(fy), 0, h - 1).astype(int)
        x0 = np.clip(np.floor(fx), 0, w - 1).astype(int)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = np.clip(fy - y0, 0, 1)[:, None]
        wx = np.clip(fx - x0, 0, 1)[None, :]
        af = a.astype(np.float64)
        top = af[np.ix_(y0, x0)] * (1 - wx) + af[np.ix_(y0, x1)] * wx
        bot = af[np.ix_(y1, x0)] * (1 - wx) + af[np.ix_(y1, x1)] * wx
        return top * (1 - wy) + bot * wy
    if method == "average":
        # exact block average when dims divide; else bilinear fallback
        if h % out_h == 0 and w % out_w == 0:
            bh, bw = h // out_h, w // out_w
            return a.astype(np.float64).reshape(out_h, bh, out_w, bw).mean(axis=(1, 3))
        return resample_plane(a, out_h, out_w, "bilinear")
    raise ValueError(f"unknown resampling {method!r}")


def warp_np(arr: np.ndarray, out_h: int, out_w: int, method: str,
            mask_plane: bool = True) -> np.ndarray:
    """Resample (B,H,W) → (B,out_h,out_w); the last plane (mask/class
    codes) always uses nearest (R/vrt-warp.R:449-456)."""
    planes = []
    for b in range(arr.shape[0]):
        m = "nearest" if (mask_plane and b == arr.shape[0] - 1) else method
        planes.append(resample_plane(arr[b], out_h, out_w, m))
    return np.stack(planes)


def warp_to_grid(df: DataFrame, out_w: int, out_h: int,
                 resampling: str = "bilinear") -> DataFrame:
    """vrt_warp analogue over payloads: narrow mapInPandas, no shuffle."""
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for row in pdf.itertuples(index=False):
                arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
                out = warp_np(arr, out_h, out_w, resampling)
                dtype = codec.dtype_for(row.fmt)
                info = np.iinfo(dtype)
                payloads.append(codec.encode(
                    np.clip(np.round(out), info.min, info.max).astype(dtype), row.fmt))
            pdf = pdf.copy()
            pdf["bytes"] = payloads
            pdf["w"] = out_w
            pdf["h"] = out_h
            if "res_x" in pdf.columns:
                pdf["res_x"] = (pdf["xmax"] - pdf["xmin"]) / out_w
                pdf["res_y"] = (pdf["ymax"] - pdf["ymin"]) / out_h
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
