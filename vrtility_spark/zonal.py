"""Zonal statistics — per-AOI pixel aggregates over a tile table.

The raster←vector reduction: for each AOI polygon, aggregate every
pixel whose CENTER falls inside the polygon across all tiles it
touches.  The reference reaches this with GDAL's warp-to-AOI +
driver-side R reductions (``projwin`` windowing,
/root/reference/R/vrt-warp.R:473-477, then ``multiband_reduce``
R/multiband_reduce.R); at 100 TB the polygon can cover millions of
tiles, so the reduction must be DECOMPOSABLE — nothing ever holds more
than one tile.

Spark-first plan (zero shuffle of tile bytes):

1. **Cover** — each AOI part explodes to its bbox's covering cells at
   the tile resolution (:func:`warp.cells_cover`, pure expressions).
   The AOI side is small by contract → ``broadcast()``.
2. **Join** — tiles ⋈ cover on ``cell_id``: a broadcast hash join, so
   tile rows never move and Catalyst prunes scanned columns.
3. **Partials** (``mapInPandas``, narrow): decode the tile once per
   matched AOI, test the tile's pixel-center grid against the polygon
   ring (:func:`join.points_in_polygon_np` — the same vectorized
   crossing-parity kernel the spatial join refines with), and emit one
   tiny row per band: ``(px_count, valid_count, sum, sumsq, min,
   max)`` over inside-pixels.  Integer-valued partial sums are exact
   in f64 (< 2**53), so the final merge is order-independent —
   hash-stable across partitionings.
4. **Merge** — ``groupBy(aoi_id, band)`` over the partial rows with
   built-in ``sum/min/max`` (JVM, whole-stage codegen); mean and
   population-std derive from the moments.  The shuffle carries only
   O(AOIs × tiles-touched × bands) 48-byte rows, never pixels.

Multipart AOIs (one row per part, the engine-wide contract —
join.py's spatial_join) aggregate across parts; parts are assumed
disjoint, as geometry parts are.  Pixel-center convention: row 0 is
the ymin edge (the regrid/overview convention), center offset +0.5 px.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vrtility_spark import cells, codec
from vrtility_spark.join import parse_wkt_polygon, points_in_polygon_np
from vrtility_spark.warp import cells_cover

_PARTIAL_SCHEMA = (
    "aoi_id string, band int, px_count long, valid_count long, "
    "px_sum double, px_sumsq double, px_min double, px_max double"
)


def zonal_partials_np(A: np.ndarray, ring: np.ndarray,
                      xmin: float, ymin: float, xmax: float, ymax: float):
    """Per-band partial moments of the NaN-masked ``(B, H, W)`` tile
    over pixels whose centers fall inside ``ring``.  Returns a list of
    ``(px_count, valid_count, sum, sumsq, min, max)`` tuples, one per
    band (min/max are ``+inf/-inf`` when no valid pixel — the merge
    identity elements)."""
    B, H, W = A.shape
    xs = xmin + (np.arange(W) + 0.5) * (xmax - xmin) / W
    ys = ymin + (np.arange(H) + 0.5) * (ymax - ymin) / H
    gx, gy = np.meshgrid(xs, ys)
    inside = points_in_polygon_np(gx, gy, ring)
    n_in = int(inside.sum())
    out = []
    for b in range(B):
        v = A[b][inside]
        v = v[np.isfinite(v)]
        if len(v):
            out.append((n_in, int(len(v)), float(v.sum()),
                        float((v * v).sum()), float(v.min()),
                        float(v.max())))
        else:
            out.append((n_in, 0, 0.0, 0.0, np.inf, -np.inf))
    return out


def _aoi_tile_join(tiles: DataFrame, aoi: DataFrame, res: int,
                   key: str, broadcast_aoi: bool) -> DataFrame:
    """tiles ⋈ (AOI parts exploded to cover cells): the shared front
    half of every zonal operator — broadcast by default so tile rows
    never move."""
    names = [f.name for f in tiles.schema.fields]
    for req in (key, "bytes", "w", "h", "fmt", "nodata"):
        if req not in names:
            raise ValueError(f"zonal tiles are missing column {req!r}")
    aoi_parts = aoi.select("aoi_id", "zone", "geom_wkt",
                           "xmin", "ymin", "xmax", "ymax")
    cover = (cells_cover(aoi_parts, int(res), out_col="_zcell")
             .select("aoi_id", "geom_wkt", "_zcell"))
    right = F.broadcast(cover) if broadcast_aoi else cover
    return tiles.join(right, tiles[key] == cover["_zcell"])


def histogram_np(A: np.ndarray, ring: np.ndarray,
                 xmin: float, ymin: float, xmax: float, ymax: float,
                 lo: float, hi: float, nbins: int):
    """Per-band histogram of inside-pixel values over ``nbins`` equal
    bins spanning ``[lo, hi)``; out-of-range values CLAMP into the edge
    bins (gdalinfo -hist semantics).  Returns an ``(B, nbins)`` int64
    array counting valid inside-pixels only."""
    B, H, W = A.shape
    xs = xmin + (np.arange(W) + 0.5) * (xmax - xmin) / W
    ys = ymin + (np.arange(H) + 0.5) * (ymax - ymin) / H
    gx, gy = np.meshgrid(xs, ys)
    inside = points_in_polygon_np(gx, gy, ring)
    width = (hi - lo) / nbins
    out = np.zeros((B, nbins), dtype=np.int64)
    for b in range(B):
        v = A[b][inside]
        v = v[np.isfinite(v)]
        if len(v):
            idx = np.clip(np.floor((v - lo) / width), 0,
                          nbins - 1).astype(np.int64)
            out[b] = np.bincount(idx, minlength=nbins)
    return out


def zonal_histogram(tiles: DataFrame, aoi: DataFrame, res: int,
                    lo: float, hi: float, nbins: int,
                    key: str = "cell_id",
                    broadcast_aoi: bool = True) -> DataFrame:
    """Per-(AOI, band, bin) pixel-value histogram over the tiles each
    AOI touches: ``nbins`` equal bins on ``[lo, hi)``, out-of-range
    values clamped into the edge bins, valid inside-pixels only.

    Long-form output ``(aoi_id, band, bin, count)`` — empty bins are
    omitted, so the shuffle carries at most ``AOIs × tiles-touched ×
    bands × nbins`` tiny rows and the merge is a plain ``sum``
    (decomposable; Catalyst adds the map-side partial combine).
    """
    if nbins < 1 or not (hi > lo):
        raise ValueError("need nbins >= 1 and hi > lo")
    joined = _aoi_tile_join(tiles, aoi, int(res), key, broadcast_aoi)
    lo_f, hi_f, nb_bins = float(lo), float(hi), int(nbins)

    def emit(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        ring_cache: dict[str, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples(index=False):
                cid = int(getattr(row, key))
                zone, r, ix, iy = (int(v) for v in cells.decode_np(cid))
                size = cells.cell_size(r)
                x0, y0 = ix * size, iy * size
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)
                ring = ring_cache.get(row.geom_wkt)
                if ring is None:
                    ring = parse_wkt_polygon(row.geom_wkt)
                    ring_cache[row.geom_wkt] = ring
                hb = histogram_np(A, ring, x0, y0, x0 + size, y0 + size,
                                  lo_f, hi_f, nb_bins)
                bs, ks = np.nonzero(hb)
                for b, k in zip(bs, ks):
                    rows.append((row.aoi_id, int(b), int(k),
                                 int(hb[b, k])))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "aoi_id", "band", "bin", "count"])

    partials = joined.mapInPandas(
        emit, schema="aoi_id string, band int, bin int, count long")
    return (partials.groupBy("aoi_id", "band", "bin")
            .agg(F.sum("count").alias("count")))


def value_counts_np(A: np.ndarray, ring: np.ndarray,
                    xmin: float, ymin: float, xmax: float, ymax: float):
    """Per-band exact value counts of valid inside-pixels: a list of
    ``(band, value, count)`` — the unbinned companion of
    :func:`histogram_np` for CLASS planes, where the mode must be a
    real class value, not a bin center."""
    B, H, W = A.shape
    xs = xmin + (np.arange(W) + 0.5) * (xmax - xmin) / W
    ys = ymin + (np.arange(H) + 0.5) * (ymax - ymin) / H
    gx, gy = np.meshgrid(xs, ys)
    inside = points_in_polygon_np(gx, gy, ring)
    out = []
    for b in range(B):
        v = A[b][inside]
        v = v[np.isfinite(v)]
        if len(v):
            vals, cnts = np.unique(v, return_counts=True)
            out.extend((b, float(val), int(c))
                       for val, c in zip(vals, cnts))
    return out


def _merged_value_counts(tiles: DataFrame, aoi: DataFrame, res: int,
                         key: str, broadcast_aoi: bool) -> DataFrame:
    """Exact per-(AOI, band, value) counts of valid inside-pixels —
    the shared back half of :func:`zonal_majority` and
    :func:`zonal_percentile`: the standard cover join, one narrow map
    emitting :func:`value_counts_np` rows, one decomposable-sum
    merge."""
    joined = _aoi_tile_join(tiles, aoi, int(res), key, broadcast_aoi)

    def emit(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        ring_cache: dict[str, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples(index=False):
                cid = int(getattr(row, key))
                zone, r, ix, iy = (int(v) for v in cells.decode_np(cid))
                size = cells.cell_size(r)
                x0, y0 = ix * size, iy * size
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)
                ring = ring_cache.get(row.geom_wkt)
                if ring is None:
                    ring = parse_wkt_polygon(row.geom_wkt)
                    ring_cache[row.geom_wkt] = ring
                for b, val, c in value_counts_np(
                        A, ring, x0, y0, x0 + size, y0 + size):
                    rows.append((row.aoi_id, b, val, c))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "aoi_id", "band", "value", "count"])

    partials = joined.mapInPandas(
        emit, schema="aoi_id string, band int, value double, count long")
    return (partials.groupBy("aoi_id", "band", "value")
            .agg(F.sum("count").alias("count")))


def zonal_majority(tiles: DataFrame, aoi: DataFrame, res: int,
                   key: str = "cell_id",
                   broadcast_aoi: bool = True) -> DataFrame:
    """Per-(AOI, band) modal pixel value — QGIS "zonal statistics:
    majority" / terra::zonal(fun=modal) for class planes (land-cover
    share reports, dominant-class maps). Continuous bands should be
    :func:`algebra.classify`-ed first; the partials here carry one row
    per DISTINCT value per (AOI, tile, band), which is tiny for class
    planes and degenerate for continuous data.

    Same broadcast cover join as every zonal operator (tile rows never
    move); partial value counts merge with a decomposable sum and the
    mode is one window argmax — ties break to the SMALLEST value, so
    the result is deterministic. Output: ``(aoi_id, band, value,
    count, total)`` where ``total`` counts all valid inside-pixels.
    """
    counts = _merged_value_counts(tiles, aoi, res, key, broadcast_aoi)
    win = Window.partitionBy("aoi_id", "band") \
        .orderBy(F.desc("count"), F.asc("value"))
    tot = Window.partitionBy("aoi_id", "band")
    return (counts
            .withColumn("total", F.sum("count").over(tot))
            .withColumn("_rn", F.row_number().over(win))
            .where("_rn = 1")
            .select("aoi_id", "band", "value", "count", "total"))


def zonal_percentile(tiles: DataFrame, aoi: DataFrame, res: int,
                     qs=(0.25, 0.5, 0.75), key: str = "cell_id",
                     broadcast_aoi: bool = True) -> DataFrame:
    """EXACT per-(AOI, band) percentiles — terra::zonal(fun=quantile)
    / QGIS zonal median, with ``numpy.percentile``'s default linear
    interpolation, but computed from decomposable value counts so no
    pixel multiset is ever gathered: the shared cover join + merged
    counts, then a cumulative window and pure interpolated-rank
    expressions. The same integer-family caveat as
    :func:`zonal_majority` applies (one count row per distinct value
    per tile — bounded ≤ 65536 for raw16/png payloads, degenerate for
    continuous rawf32; :func:`stretch`-bin or classify those first).

    Output: ``(aoi_id, band, q, value, total)``, one row per
    requested quantile, byte-deterministic (counts are exact integer
    sums; the interpolation reads only the sorted distinct values).
    """
    qs = [float(q) for q in qs]
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"qs must be fractions in [0, 1], got {qs}")
    if len(set(qs)) != len(qs):
        raise ValueError(f"duplicate quantiles: {qs}")
    counts = _merged_value_counts(tiles, aoi, res, key, broadcast_aoi)
    wcum = (Window.partitionBy("aoi_id", "band").orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wtot = Window.partitionBy("aoi_id", "band")
    d = (counts.withColumn("cum", F.sum("count").over(wcum))
         .withColumn("total", F.sum("count").over(wtot)))
    # numpy 'linear': rank r = q·(total−1); bracket the two distinct
    # values whose cumulative counts straddle floor(r)/ceil(r) and
    # interpolate by the fractional rank. min(when(...)) aggregates
    # are rank selections over the sorted value axis — no collect, no
    # second shuffle beyond the one tiny groupBy.
    aggs = []
    for i, q in enumerate(qs):
        r = F.lit(q) * (F.col("total") - F.lit(1))
        rlo = F.floor(r)
        aggs.append(F.min(F.when(F.col("cum") >= rlo + 1,
                                 F.col("value"))).alias(f"_vlo{i}"))
        aggs.append(F.min(F.when(F.col("cum") >= rlo + 2,
                                 F.col("value"))).alias(f"_vhi{i}"))
    g = d.groupBy("aoi_id", "band").agg(F.max("total").alias("total"),
                                        *aggs)
    vals = []
    for i, q in enumerate(qs):
        r = F.lit(q) * (F.col("total") - F.lit(1))
        frac = r - F.floor(r)
        vhi = F.coalesce(F.col(f"_vhi{i}"), F.col(f"_vlo{i}"))
        vals.append(F.round(
            F.col(f"_vlo{i}") + frac * (vhi - F.col(f"_vlo{i}")),
            9).alias(f"_p{i}"))
    g = g.select("aoi_id", "band", "total", *vals)
    stack = ", ".join(f"{q!r}D, _p{i}" for i, q in enumerate(qs))
    return g.select(
        "aoi_id", "band",
        F.expr(f"stack({len(qs)}, {stack})").alias("q", "value"),
        "total").select("aoi_id", "band", "q", "value", "total")


def zonal_stats(tiles: DataFrame, aoi: DataFrame, res: int,
                key: str = "cell_id",
                broadcast_aoi: bool = True) -> DataFrame:
    """Per-(AOI, band) pixel statistics over a one-row-per-cell tile
    table at resolution ``res``.

    Output: ``(aoi_id, band, px_count, valid_count, px_sum, mean,
    std, px_min, px_max)`` — ``px_count`` counts pixel centers inside
    the polygon (nodata included), ``valid_count``/moments cover valid
    pixels only; ``mean``/``std`` (population) are null when no valid
    pixel.  AOIs touching no tile yield no row.

    ``broadcast_aoi=False`` routes a huge AOI side through a shuffle
    hash join instead (both sides partition by cell; tiles are unique
    per cell so no salting is needed).
    """
    joined = _aoi_tile_join(tiles, aoi, int(res), key, broadcast_aoi)

    def emit(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        ring_cache: dict[str, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples(index=False):
                cid = int(getattr(row, key))
                zone, r, ix, iy = (int(v) for v in cells.decode_np(cid))
                size = cells.cell_size(r)
                x0, y0 = ix * size, iy * size
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)
                ring = ring_cache.get(row.geom_wkt)
                if ring is None:
                    ring = parse_wkt_polygon(row.geom_wkt)
                    ring_cache[row.geom_wkt] = ring
                parts = zonal_partials_np(A, ring, x0, y0,
                                          x0 + size, y0 + size)
                for b, p in enumerate(parts):
                    if p[0] == 0:
                        continue  # polygon misses every pixel center
                    rows.append((row.aoi_id, b) + p)
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "aoi_id", "band", "px_count", "valid_count",
                    "px_sum", "px_sumsq", "px_min", "px_max"])

    partials = joined.mapInPandas(emit, schema=_PARTIAL_SCHEMA)
    agg = (partials.groupBy("aoi_id", "band")
           .agg(F.sum("px_count").alias("px_count"),
                F.sum("valid_count").alias("valid_count"),
                F.sum("px_sum").alias("px_sum"),
                F.sum("px_sumsq").alias("_sumsq"),
                F.min("px_min").alias("_min"),
                F.max("px_max").alias("_max")))
    valid = F.col("valid_count")
    mean = F.col("px_sum") / valid
    var = F.greatest(F.lit(0.0), F.col("_sumsq") / valid - mean * mean)
    has = valid > 0
    return agg.select(
        "aoi_id", "band", "px_count", "valid_count",
        F.when(has, F.col("px_sum")).otherwise(F.lit(0.0)).alias("px_sum"),
        F.when(has, mean).alias("mean"),
        F.when(has, F.sqrt(var)).alias("std"),
        F.when(has, F.col("_min")).alias("px_min"),
        F.when(has, F.col("_max")).alias("px_max"))
