"""Gridding: scattered points → raster tiles — the gdal_grid twin
(inverse-distance weighting plus the data-metrics family) on the
distributed cell grid.

Sensor networks, LIDAR returns, field plots, per-scene QC scores: the
step from a point table to a raster surface is `gdal_grid` in the
GDAL toolbox the reference leans on; at 100 TB of points it must run
without ever assembling a global grid OR a global point set.

The radius is the plan (same argument as :mod:`proximity`'s cap): a
point can only influence pixels within ``radius`` world units, so the
operator is tile-local once each point reaches every tile whose frame,
EXPANDED by the radius, contains it:

1. per-point cover explosion with pure expressions (the bbox
   ``[x−r, x+r]²`` → covering cells, :func:`warp.cells_cover`'s
   arithmetic — whole-stage codegen, no UDF). Points near a tile
   corner emit up to 4 rows; the duplication factor is
   ``(1 + 2r/size)²``, data-independent;
2. ONE ``groupBy(cell)`` grouped Arrow map computes the full surface
   for that tile from its point list — vectorized distance fields,
   points processed in sorted order so float accumulation is
   bit-deterministic under any partitioning;
3. output rows are real ``rawf32`` tiles of the cell index, chainable
   with every cell-keyed operator (zonal over an IDW surface = kriged
   AOI means; terrain over it = interpolated-DEM slopes).

No halo exchange exists here at all — the cover explosion IS the
communication, and it shuffles (point, cell-key) rows, never tiles.
Skew (a point cloud concentrated in one cell) is bounded by chunked
accumulation inside the kernel — at most :data:`_CHUNK` points at a
time, shrunk further for big tiles so one ``(points, h, w)``
temporary never exceeds :data:`_CHUNK_ELEMS` elements — so executor
memory scales with neither the cell's point count nor the tile area.

Algorithms (gdal_grid names): ``invdist`` (weight ``1/d^power``,
``smoothing`` regularizes, exact hits dominate at smoothing 0),
``average``, ``nearest``, ``count``, ``min``, ``max`` — the metrics
share one accumulation pass. Pixels with fewer than ``min_points``
neighbours inside the radius hold the nodata sentinel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import cells, codec

ALGORITHMS = ("invdist", "average", "nearest", "count", "min", "max")
OUT_NODATA = -9999.0
GRID_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double, n_points int")
_CHUNK = 4096  # max points per vectorized accumulation block
#: element budget for one (P, h, w) accumulation temporary — the chunk
#: shrinks with tile area so per-task peak memory stays ~tens of MB at
#: any tile size (4096 points x 256 px tiles = the historical shape;
#: a 256x256 tile gets 64-point chunks instead of 2 GB temporaries)
_CHUNK_ELEMS = 1 << 22


def _chunk_points(h: int, w: int) -> int:
    """Points per accumulation block for an ``h x w`` tile: bounded by
    both :data:`_CHUNK` and the :data:`_CHUNK_ELEMS` temp budget.
    Depends only on the tile dims (constant per operator call), so
    chunk boundaries — and therefore float accumulation order — stay
    deterministic under any partitioning of the point set."""
    return max(1, min(_CHUNK, _CHUNK_ELEMS // max(1, h * w)))


def grid_np(xs, ys, vs, x0: float, y0: float, size: float, w: int, h: int,
            algorithm: str = "invdist", radius: float = 1.0,
            power: float = 2.0, smoothing: float = 0.0,
            min_points: int = 1) -> np.ndarray:
    """One tile's surface from its candidate points (zone coords).
    ``(1, h, w)`` float64 with NaN where fewer than ``min_points``
    points fall inside ``radius`` of the pixel center. Points are
    accumulated in caller-supplied order in ``_CHUNK`` blocks — the
    distributed kernel sorts first, so any split of the same point
    set produces bit-identical surfaces."""
    if algorithm not in ALGORITHMS:
        raise KeyError(f"unknown algorithm {algorithm!r}; "
                       f"one of {ALGORITHMS}")
    if not float(radius) > 0:
        raise ValueError("radius must be > 0")
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    vs = np.asarray(vs, dtype=np.float64)
    px = size / w
    cx = x0 + (np.arange(w) + 0.5) * px          # pixel centers
    cy = y0 + (np.arange(h) + 0.5) * (size / h)
    r2 = float(radius) ** 2
    s2 = float(smoothing) ** 2
    cnt = np.zeros((h, w), dtype=np.int64)
    wsum = np.zeros((h, w))
    vsum = np.zeros((h, w))
    vmin = np.full((h, w), np.inf)
    vmax = np.full((h, w), -np.inf)
    nearest_d2 = np.full((h, w), np.inf)
    nearest_v = np.full((h, w), np.nan)
    hit0 = np.zeros((h, w), dtype=np.int64)      # exact-hit count
    hitv = np.zeros((h, w))                      # exact-hit value sum
    chunk = _chunk_points(h, w)
    for i0 in range(0, len(xs), chunk):
        X = xs[i0:i0 + chunk]
        Y = ys[i0:i0 + chunk]
        V = vs[i0:i0 + chunk]
        dx = cx[None, None, :] - X[:, None, None]      # (P, 1, w)
        dy = cy[None, :, None] - Y[:, None, None]      # (P, h, 1)
        d2 = dx * dx + dy * dy                          # (P, h, w)
        inside = d2 <= r2
        cnt += inside.sum(axis=0)
        if algorithm == "invdist":
            zero = inside & (d2 + s2 == 0.0)
            hit0 += zero.sum(axis=0)
            hitv += np.where(zero, V[:, None, None], 0.0).sum(axis=0)
            ok = inside & ~zero
            with np.errstate(divide="ignore"):
                wt = np.where(ok, (d2 + s2) ** (-power / 2.0), 0.0)
            wsum += wt.sum(axis=0)
            vsum += (wt * V[:, None, None]).sum(axis=0)
        elif algorithm == "average":
            vsum += np.where(inside, V[:, None, None], 0.0).sum(axis=0)
        elif algorithm in ("min", "max"):
            vals = np.where(inside, V[:, None, None], np.nan)
            with np.errstate(all="ignore"):
                import warnings
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", RuntimeWarning)
                    if algorithm == "min":
                        vmin = np.fmin(vmin, np.nanmin(
                            np.where(np.isnan(vals), np.inf, vals), axis=0))
                    else:
                        vmax = np.fmax(vmax, np.nanmax(
                            np.where(np.isnan(vals), -np.inf, vals), axis=0))
        elif algorithm == "nearest":
            d2m = np.where(inside, d2, np.inf)
            am = d2m.min(axis=0)
            better = am < nearest_d2
            # ties keep the EARLIER point (sorted order → deterministic)
            idx = d2m.argmin(axis=0)
            nearest_v = np.where(better, V[idx], nearest_v)
            nearest_d2 = np.where(better, am, nearest_d2)
    if algorithm == "count":
        # count is defined everywhere — the min_points gate is an
        # interpolation-quality knob and doesn't apply to a density
        return cnt.astype(np.float64)[None]
    out = np.full((h, w), np.nan)
    enough = cnt >= int(min_points)
    if algorithm == "invdist":
        exact = hit0 > 0
        with np.errstate(invalid="ignore"):
            out = np.where(exact, hitv / np.maximum(hit0, 1),
                           vsum / np.where(wsum > 0, wsum, np.nan))
    elif algorithm == "average":
        with np.errstate(invalid="ignore"):
            out = vsum / np.where(cnt > 0, cnt, np.nan)
    elif algorithm == "min":
        out = np.where(np.isinf(vmin), np.nan, vmin)
    elif algorithm == "max":
        out = np.where(np.isinf(vmax), np.nan, vmax)
    else:  # nearest
        out = nearest_v
    out = np.where(enough, out, np.nan)
    return out[None]


def demo_grid_points(n: int = 48):
    """Deterministic ``[(point_id, zone, x, y, value)]`` for driver
    queries and the constants oracle: :func:`pointsample.demo_points`'
    dyadic lattice plus an exact-binary value ramp (quarters), so the
    only rounding anywhere is the shared, order-fixed IDW division."""
    from vrtility_spark.pointsample import demo_points
    return [(pid, zone, x, y, float((pid * 73 + 29) % 400) / 4.0 + 10.0)
            for pid, zone, x, y in demo_points(n)]


def grid_points(points: DataFrame, res: int, w: int, h: int,
                algorithm: str = "invdist", radius: float = 1.0,
                power: float = 2.0, smoothing: float = 0.0,
                min_points: int = 1, value_col: str = "value",
                id_col: str | None = None, zone_col: str = "zone",
                x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Scattered points → one ``rawf32`` tile row per cell that has at
    least one candidate point within ``radius`` of its frame. Cells no
    point reaches produce no row — output scales with the data
    footprint, never the grid (``count`` surfaces are 0-filled only
    where candidates exist; a true global density map should rasterize
    a constant instead). ``id_col`` (or ``(x, y, value)`` when absent)
    fixes the in-kernel accumulation order."""
    if algorithm not in ALGORITHMS:
        raise KeyError(f"unknown algorithm {algorithm!r}; "
                       f"one of {ALGORITHMS}")
    r = float(radius)
    pts = points.select(
        F.col(zone_col).cast("long").alias("_zone"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
        F.col(value_col).cast("double").alias("_v"),
        *([F.col(id_col).cast("long").alias("_pid")] if id_col else []))
    bbox = pts.select(
        "*",
        (F.col("_x") - r).alias("xmin"), (F.col("_x") + r).alias("xmax"),
        (F.col("_y") - r).alias("ymin"), (F.col("_y") + r).alias("ymax"))
    from vrtility_spark.warp import cells_cover
    cover = cells_cover(bbox.withColumnRenamed("_zone", "zone"),
                        int(res), out_col="_gcell") \
        .select("_gcell", "_x", "_y", "_v",
                *(["_pid"] if id_col else []))
    sort_cols = ["_pid"] if id_col else ["_x", "_y", "_v"]
    alg, pw, sm, mp, rr = algorithm, float(power), float(smoothing), \
        int(min_points), r
    tw, th = int(w), int(h)

    def make_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf["_gcell"].iloc[0])
        zone, cres, ix, iy = (int(v) for v in cells.decode_np(cid))
        size = cells.cell_size(cres)
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        surf = grid_np(pdf["_x"].to_numpy(), pdf["_y"].to_numpy(),
                       pdf["_v"].to_numpy(), ix * size, iy * size, size,
                       tw, th, alg, rr, pw, sm, mp)
        return pd.DataFrame([{
            "cell_id": cid,
            "bytes": codec.encode(
                codec.from_float(surf, OUT_NODATA, "float32"), "rawf32"),
            "w": tw, "h": th, "fmt": "rawf32", "nodata": OUT_NODATA,
            "n_points": int(len(pdf)),
        }])

    return (cover.groupBy("_gcell")
            .applyInPandas(make_tile, schema=GRID_SCHEMA))
