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
from pyspark.sql import types as T

from vrtility_spark import codec
from vrtility_spark.cells import (
    MAX_RES,
    ZONE_ORIGIN_STEP,
    cell_size,
    parent_col,
    xy_to_cell_col,
    zone_shift_cols,
)


def reproject_zone(df: DataFrame, target_zone: int,
                   point_cols: tuple[str, str] | None = None,
                   wkt_col: str | None = None) -> DataFrame:
    """Reproject every row's coordinates into ``target_zone``'s frame —
    the engine's ``vrt_warp`` cross-CRS normalization
    (/root/reference/R/vrt-warp.R:34-246): scenes born in different
    zones become joinable/compositable on ONE grid.

    Zones are affine parameterizations of a shared world plane
    (:data:`vrtility_spark.cells.zone_origin`), so the transform is the
    exact translation ``origin(src) - origin(dst)`` — a pure Column
    expression fused into the scan (zero UDF, zero shuffle, zero
    payload rewrite). Because zone origins are integer multiples of
    ``cell_size(4)``, a scene footprint that tiles one zone's grid
    tiles the target's too: pixels stay aligned and composites across
    former zones need no resampling. Footprints that do NOT tile the
    target grid (sub-tile shifts, foreign resolutions) go through
    :func:`regrid_to_cells` afterwards — reproject + regrid is the
    full cross-CRS vrt_warp with no alignment assumption. Rows already
    in ``target_zone`` pass through bit-unchanged.

    Shifts whichever of ``xmin/ymin/xmax/ymax`` exist, plus optional
    ``point_cols=(x, y)`` and a WKT polygon column (string rewrite via
    a vectorized pandas UDF); rewrites ``zone`` and (if present)
    ``srs``. Coordinates may leave [0, ZONE_SPAN) — the cell index
    clips identically in NumPy/Catalyst/SQL, so downstream joins stay
    deterministic; filter or re-window if clipping is unwanted."""
    dx, dy = zone_shift_cols(F.col("zone"), int(target_zone))
    out = df
    for c, d in (("xmin", dx), ("xmax", dx), ("ymin", dy), ("ymax", dy)):
        if c in out.columns:
            out = out.withColumn(c, F.col(c) + d)
    if point_cols is not None:
        px, py = point_cols
        out = (out.withColumn(px, F.col(px) + dx)
                  .withColumn(py, F.col(py) + dy))
    if wkt_col is not None:
        out = out.withColumn(wkt_col, _shift_wkt_udf(F.col(wkt_col), dx, dy))
    out = out.withColumn("zone", F.lit(int(target_zone)).cast("long"))
    if "srs" in out.columns:
        out = out.withColumn("srs", F.lit(f"ZONE:{int(target_zone)}"))
    return out


@F.pandas_udf(T.StringType())
def _shift_wkt_udf(wkt: pd.Series, dx: pd.Series, dy: pd.Series) -> pd.Series:
    """Translate every coordinate pair of a WKT geometry. Works on any
    ring structure — POLYGON outer ring, interior rings (holes), and
    MULTIPOLYGON — because it rewrites each ``x y`` pair in place
    rather than slicing between the first ``((`` and ``))``."""
    import re
    num = r"-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?"
    pair = re.compile(rf"({num})\s+({num})")
    out = []
    for w, sx, sy in zip(wkt, dx, dy):
        out.append(pair.sub(
            lambda m: f"{float(m.group(1)) + sx!r} {float(m.group(2)) + sy!r}",
            w))
    return pd.Series(out)


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

    def span(lo, hi):
        # Spark's sequence(a, b) runs DESCENDING when b < a (degenerate
        # boxes: xmin == xmax on a cell boundary) — emit an empty cover
        # instead, matching cover_bbox_np's empty arange
        return F.when(hi >= lo, F.sequence(lo, hi)) \
                .otherwise(F.array().cast("array<bigint>"))

    out = (
        df.withColumn("_ix", F.explode(span(ix0, ix1)))
        .withColumn("_iy", F.explode(span(iy0, iy1)))
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
    if method in _CONV_KERNELS:
        kfun, support = _CONV_KERNELS[method]
        return _resample_separable(a, out_h, out_w, kfun, support)
    if method in _BLOCK_AGGS:
        return _resample_blocks(a, out_h, out_w, _BLOCK_AGGS[method])
    raise ValueError(f"unknown resampling {method!r}")


# --- convolution kernels (cubic/cubicspline/lanczos), separable -----------
# GDAL's warp-kernel menu (R/vrt-warp.R:39-54); evaluated as two weight
# matrices so the whole plane resamples as vectorized gathers+sums.

def _cubic_keys(x: np.ndarray) -> np.ndarray:
    """Catmull-Rom (GDAL 'cubic', Keys a=-0.5)."""
    ax = np.abs(x)
    return np.where(
        ax <= 1, 1.5 * ax**3 - 2.5 * ax**2 + 1,
        np.where(ax < 2, -0.5 * ax**3 + 2.5 * ax**2 - 4 * ax + 2, 0.0))


def _cubic_bspline(x: np.ndarray) -> np.ndarray:
    """Cubic B-spline (GDAL 'cubicspline' — smoothing, non-interpolating)."""
    ax = np.abs(x)
    return np.where(
        ax <= 1, (4 - 6 * ax**2 + 3 * ax**3) / 6.0,
        np.where(ax < 2, (2 - ax) ** 3 / 6.0, 0.0))


def _lanczos(x: np.ndarray, a: int = 3) -> np.ndarray:
    return np.where(np.abs(x) < a, np.sinc(x) * np.sinc(x / a), 0.0)


_CONV_KERNELS = {
    "cubic": (_cubic_keys, 2),
    "cubicspline": (_cubic_bspline, 2),
    "lanczos": (_lanczos, 3),
}


def _resample_separable(a, out_h, out_w, kfun, support):
    def axis_weights(n_out, n_in):
        f = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
        offs = np.arange(-support + 1, support + 1)
        idx = np.floor(f)[:, None] + offs[None, :]
        w = kfun(idx - f[:, None])
        w = w / w.sum(axis=1, keepdims=True)  # partition of unity at edges
        return np.clip(idx, 0, n_in - 1).astype(int), w

    yi, wy = axis_weights(out_h, a.shape[0])
    xi, wx = axis_weights(out_w, a.shape[1])
    af = a.astype(np.float64)
    tmp = np.einsum("oky,ok->oy", af[yi, :], wy)   # rows: (out_h, w)
    return np.einsum("opk,pk->op", tmp[:, xi], wx)  # cols: (out_h, out_w)


# --- block-aggregation reducers (downsampling statistics) -----------------

def _mode_sorted(x: np.ndarray) -> np.ndarray:
    """Vectorized mode over the last axis (ties → smallest value):
    sort, find the longest equal run per row."""
    s = np.sort(x, axis=-1)
    n = s.shape[-1]
    flat = s.reshape(-1, n)
    best_val = flat[:, 0].astype(np.float64)
    best_run = np.ones(len(flat), dtype=int)
    run = np.ones(len(flat), dtype=int)
    for j in range(1, n):
        run = np.where(flat[:, j] == flat[:, j - 1], run + 1, 1)
        better = run > best_run
        best_run = np.where(better, run, best_run)
        best_val = np.where(better, flat[:, j], best_val)
    return best_val.reshape(x.shape[:-1])


def _nansum_strict(x):
    out = np.nansum(x, axis=-1)
    out[np.all(np.isnan(x), axis=-1)] = np.nan  # no data -> no data
    return out


# NaN-aware throughout: on fully-finite input these equal the plain
# reducers, and with nodata-as-NaN planes they exclude invalid pixels
# per block (all-invalid blocks -> NaN), the GDAL warp nodata contract
_BLOCK_AGGS = {
    "sum": _nansum_strict,
    "min": lambda x: np.nanmin(x, axis=-1),
    "max": lambda x: np.nanmax(x, axis=-1),
    "med": lambda x: np.nanmedian(x, axis=-1),
    "q1": lambda x: np.nanquantile(x, 0.25, axis=-1),
    "q3": lambda x: np.nanquantile(x, 0.75, axis=-1),
    "rms": lambda x: np.sqrt(np.nanmean(x.astype(np.float64) ** 2, axis=-1)),
    "mode": _mode_sorted,
    "average": lambda x: np.nanmean(x, axis=-1),
}


def _resample_blocks(a, out_h, out_w, agg):
    h, w = a.shape
    af = a.astype(np.float64)
    if h % out_h == 0 and w % out_w == 0:  # exact aligned blocks
        bh, bw = h // out_h, w // out_w
        blocks = af.reshape(out_h, bh, out_w, bw).transpose(0, 2, 1, 3)
        return agg(blocks.reshape(out_h, out_w, bh * bw))
    # non-divisible grids: per-output-pixel source boxes
    # (ceil-covering), vectorized as ONE gather into a max-box-sized
    # cube with NaN padding. Every reducer in _BLOCK_AGGS is NaN-aware
    # (mode's run counter never accumulates across NaN because
    # NaN != NaN), so the padding is invisible to the statistic —
    # no per-output-pixel Python loop.
    ylo = (np.arange(out_h) * h) // out_h
    yhi = -(-(np.arange(out_h) + 1) * h // out_h)
    xlo = (np.arange(out_w) * w) // out_w
    xhi = -(-(np.arange(out_w) + 1) * w // out_w)
    mh = int((yhi - ylo).max())
    mw = int((xhi - xlo).max())
    yi = ylo[:, None] + np.arange(mh)[None, :]           # (out_h, mh)
    xi = xlo[:, None] + np.arange(mw)[None, :]           # (out_w, mw)
    ymask = yi < yhi[:, None]
    xmask = xi < xhi[:, None]
    cube = af[np.clip(yi, 0, h - 1)[:, None, :, None],
              np.clip(xi, 0, w - 1)[None, :, None, :]]   # (oh, ow, mh, mw)
    cube = np.where(ymask[:, None, :, None] & xmask[None, :, None, :],
                    cube, np.nan)
    with np.errstate(all="ignore"):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            return agg(cube.reshape(out_h, out_w, mh * mw))


def resample_plane_masked(a: np.ndarray, out_h: int, out_w: int,
                          method: str) -> np.ndarray:
    """NaN-aware resample of one float plane: invalid (NaN) pixels are
    excluded — interpolating kernels renormalize weights over the valid
    contributors; block statistics ignore NaN; output pixels with no
    valid contributor stay NaN. This is the GDAL warp srcNodata
    contract: nodata never blends into valid values."""
    if method == "nearest" or method in _BLOCK_AGGS:
        with np.errstate(all="ignore"):
            import warnings
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                return resample_plane(a, out_h, out_w, method)
    if not np.any(np.isnan(a)):
        return resample_plane(a, out_h, out_w, method)
    valid = np.isfinite(a).astype(np.float64)
    az = np.where(valid > 0, a, 0.0)
    num = resample_plane(az, out_h, out_w, method)
    den = resample_plane(valid, out_h, out_w, method)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / den
    out[np.abs(den) < 1e-9] = np.nan
    return out


# class/flag band names forced to nearest regardless of position — the
# dtype/name-keyed twin of the reference's Byte→NearestNeighbour rule
# (R/vrt-warp.R:404-415 keys the rule off the band DATA TYPE, not its
# position; class planes here are identified by their canonical names)
CLASS_BAND_NAMES = {"SCL", "Fmask", "QA", "QA_PIXEL", "mask", "MSK", "CLM"}


def resolve_plane_methods(band_names, nb: int, default: str,
                          overrides=None, mask_plane: bool = True):
    """Per-plane (method, is_class) — the warp setup table of
    R/vrt-warp.R:418-491: explicit per-band resampling ``overrides``
    win, class planes (by name, or last-position when names are
    unknown) are forced to nearest and resampled on RAW codes, all
    other planes get ``default``."""
    methods, is_class = [], []
    for b in range(nb):
        name = band_names[b] if band_names is not None and b < len(band_names) \
            else None
        cls = (name in CLASS_BAND_NAMES) if name is not None else False
        cls = cls or (mask_plane and b == nb - 1)
        m = None
        if overrides:
            m = overrides.get(name, overrides.get("*"))
        if cls:
            m = "nearest"
        methods.append(m or default)
        is_class.append(cls)
    return methods, is_class


def warp_np(arr: np.ndarray, out_h: int, out_w: int, method: str,
            mask_plane: bool = True, nodata=None,
            band_names=None, overrides=None) -> np.ndarray:
    """Resample (B,H,W) → (B,out_h,out_w). Class planes (named in
    ``band_names`` per :data:`CLASS_BAND_NAMES`, or the last plane when
    ``mask_plane``) use nearest on raw codes (R/vrt-warp.R:404-456);
    ``overrides`` maps band name → method for per-band resampling
    choices (R/vrt-warp.R:418-491).

    With ``nodata`` given (scalar or per-band array), data planes are
    resampled NODATA-AWARE (sentinel → NaN → masked kernels → NaN back
    to sentinel by the caller); without it, raw values pass straight
    through the kernels (only safe for payloads with no sentinels)."""
    nd_arr = None if nodata is None else np.atleast_1d(
        np.asarray(nodata, dtype=np.float64))
    methods, is_class = resolve_plane_methods(
        band_names, arr.shape[0], method, overrides, mask_plane)
    planes = []
    for b in range(arr.shape[0]):
        if nodata is None or is_class[b]:
            planes.append(resample_plane(arr[b], out_h, out_w, methods[b]))
        else:
            ndb = float(nd_arr[b % len(nd_arr)])
            planes.append(resample_plane_masked(
                codec.to_float_masked(arr[b][None], ndb)[0],
                out_h, out_w, methods[b]))
    return np.stack(planes)


def sample_plane_masked(a: np.ndarray, fy: np.ndarray, fx: np.ndarray,
                        method: str) -> np.ndarray:
    """Sample one float plane (NaN = invalid) at fractional source
    coordinates — the windowed/affine gather behind regridding. ``fy``
    (H',) and ``fx`` (W') are source pixel-center coordinates of the
    target grid's rows/columns; points outside the source extent (or
    with no valid contributor) come back NaN. Bilinear renormalizes
    over valid contributors (the GDAL srcNodata contract: nodata never
    blends into valid values)."""
    h, w = a.shape
    if method == "nearest":
        yi = np.round(fy).astype(np.int64)
        xi = np.round(fx).astype(np.int64)
        vy = (yi >= 0) & (yi < h)
        vx = (xi >= 0) & (xi < w)
        out = a[np.clip(yi, 0, h - 1)[:, None], np.clip(xi, 0, w - 1)[None, :]]
        out = out.astype(np.float64, copy=True)
        out[~(vy[:, None] & vx[None, :])] = np.nan
        return out
    if method != "bilinear":
        raise ValueError(
            f"regrid sampling supports 'nearest'/'bilinear', got {method!r}")
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    ty = (fy - y0)[:, None]
    tx = (fx - x0)[None, :]
    num = np.zeros((len(fy), len(fx)))
    den = np.zeros((len(fy), len(fx)))
    for dy, wy in ((0, 1.0 - ty), (1, ty)):
        yi = y0 + dy
        vy = (yi >= 0) & (yi < h)
        yc = np.clip(yi, 0, h - 1)
        for dx, wx in ((0, 1.0 - tx), (1, tx)):
            xi = x0 + dx
            vx = (xi >= 0) & (xi < w)
            xc = np.clip(xi, 0, w - 1)
            v = a[yc[:, None], xc[None, :]]
            ok = vy[:, None] & vx[None, :] & np.isfinite(v)
            wgt = (wy * wx) * ok
            num += np.where(ok, v, 0.0) * wgt
            den += wgt
    with np.errstate(invalid="ignore", divide="ignore"):
        out = num / den
    out[den < 1e-12] = np.nan
    return out


def regrid_to_cells(df: DataFrame, res: int, out_w: int, out_h: int,
                    resampling: str | dict = "bilinear",
                    mask_plane: bool = True,
                    prefix_k: int = 2,
                    scene_fn=None,
                    precelled: bool = False) -> DataFrame:
    """The GENERAL warp: scenes with ARBITRARY footprints → one
    sentinel-padded tile per covering cell, all on the cell's canonical
    ``(out_w, out_h)`` grid — the full ``vrt_warp`` target-grid
    normalization (/root/reference/R/vrt-warp.R:34-246: every scene is
    reprojected/resampled onto ``(t_srs, te, tr)`` so pixels align).
    :func:`assign_cells` + :func:`warp_to_grid` cover the fast case
    where footprints already tile the grid; this operator removes that
    assumption: a scene straddling four cells yields four aligned
    tiles, each with out-of-footprint pixels at the plane's sentinel
    (masked out downstream), so :func:`vrtility_spark.composite.composite`
    works on ANY footprint layout.

    Plan shape: expression-only ``cells_cover`` explode (the fanout is
    footprint_area/cell_area per scene — bounded by geometry, never the
    table) followed by a narrow Arrow map; no shuffle. Data planes
    sample nodata-aware (bilinear/nearest); class planes (by name, or
    trailing when ``mask_plane``) sample nearest on raw codes.

    ``scene_fn(arr, nodata)`` (e.g. a pending mask) fuses into the same
    decode — one Arrow pass instead of a materialized masked copy
    feeding a second chained Python stage (the composite fusion
    policy, R/gdalraster-async.r:99-112).

    Caption provenance contract: a scene straddling N cells duplicates
    its row — caption included — into each of its N tiles. Downstream
    ``composite.caption_agg`` therefore lists the scene once PER CELL
    it contributes pixels to (correct per-cell provenance), not once
    globally; global dedup is a ``distinct`` over (caption) if a
    corpus-level list is wanted.

    ``precelled=True`` skips the cover explode: rows already carry ONE
    cover cell each in ``cell_id`` (e.g. a scenes table stored
    cover-exploded and partition-pruned at the scan — the streaming
    history path). The intersect filter still applies."""
    from vrtility_spark.cells import decode_np
    if isinstance(resampling, dict):
        overrides = dict(resampling)
        default = overrides.pop("*", "bilinear")
    else:
        overrides, default = None, resampling
    size = cell_size(res)
    if precelled:
        celled = df
    else:
        celled = cells_cover(df, res, out_col="cell_id")
    # cells_cover CLAMPS indices to the zone range: a footprint pushed
    # outside [0, ZONE_SPAN) (allowed by reproject_zone) would emit
    # clamped edge cells whose true extent does not touch the
    # footprint — all-sentinel tiles inflating n_scenes/caption_agg
    # downstream. Keep only cover cells that genuinely intersect.
    _ix = F.col("cell_id") % 8192
    _iy = F.floor(F.col("cell_id") / 8192) % 8192
    _cx0 = _ix.cast("double") * F.lit(size)
    _cy0 = _iy.cast("double") * F.lit(size)
    celled = celled.where(
        (_cx0 < F.col("xmax")) & (_cx0 + F.lit(size) > F.col("xmin"))
        & (_cy0 < F.col("ymax")) & (_cy0 + F.lit(size) > F.col("ymin")))
    celled = celled.withColumn("cell_prefix",
                               parent_col(F.col("cell_id"), prefix_k))
    out_schema = celled.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, nbs = [], []
            bxmin, bymin, bxmax, bymax = [], [], [], []
            for row in pdf.itertuples(index=False):
                arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
                names = (list(row.bands)
                         if getattr(row, "bands", None) is not None else None)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         row.nodata)
                if scene_fn is not None:
                    arr = scene_fn(arr, nd)
                nbs.append(len(arr))
                nd_arr = np.atleast_1d(np.asarray(nd, dtype=np.float64))
                methods, is_class = resolve_plane_methods(
                    names, len(arr), default, overrides, mask_plane)
                _, _, ix, iy = decode_np(row.cell_id)
                cx0, cy0 = float(ix) * size, float(iy) * size
                # source fractional coords of the cell grid's centers
                res_x = (row.xmax - row.xmin) / row.w
                res_y = (row.ymax - row.ymin) / row.h
                fx = (cx0 + (np.arange(out_w) + 0.5) * (size / out_w)
                      - row.xmin) / res_x - 0.5
                fy = (cy0 + (np.arange(out_h) + 0.5) * (size / out_h)
                      - row.ymin) / res_y - 0.5
                dtype = codec.dtype_for(row.fmt)
                planes = []
                for b in range(len(arr)):
                    ndb = float(nd_arr[b % len(nd_arr)])
                    if is_class[b]:
                        p = sample_plane_masked(
                            arr[b].astype(np.float64), fy, fx, "nearest")
                        planes.append(codec.from_float(p[None], ndb,
                                                       dtype)[0])
                    else:
                        p = sample_plane_masked(
                            codec.to_float_masked(arr[b][None], ndb)[0],
                            fy, fx, methods[b])
                        planes.append(codec.from_float(p[None], ndb,
                                                       dtype)[0])
                blobs.append(codec.encode(np.stack(planes), row.fmt))
                bxmin.append(cx0)
                bymin.append(cy0)
                bxmax.append(cx0 + size)
                bymax.append(cy0 + size)
            pdf = pdf.copy()
            pdf["bytes"] = blobs
            pdf["w"] = out_w
            pdf["h"] = out_h
            pdf["xmin"], pdf["ymin"] = bxmin, bymin
            pdf["xmax"], pdf["ymax"] = bxmax, bymax
            if "res_x" in pdf.columns:
                pdf["res_x"] = size / out_w
                pdf["res_y"] = size / out_h
            if scene_fn is not None:
                # a plane-dropping scene_fn (e.g. a mask spec with
                # drop_mask_band) must leave band metadata aligned with
                # the payload: trim bands/band_* to the OUTPUT plane
                # count (scene_fns only drop trailing planes)
                for c in ("bands", "band_scale", "band_offset",
                          "band_nodata"):
                    if c in pdf.columns:
                        pdf[c] = [None if v is None else list(v)[:n]
                                  for v, n in zip(pdf[c], nbs)]
            yield pdf

    return celled.mapInPandas(run, schema=out_schema)


def warp_to_grid(df: DataFrame, out_w: int, out_h: int,
                 resampling: str | dict = "bilinear",
                 mask_plane: bool = True) -> DataFrame:
    """vrt_warp analogue over payloads: narrow mapInPandas, no shuffle.
    Data planes resample nodata-aware (each plane's sentinel never
    blends into valid values); class planes (by name, or the trailing
    plane when ``mask_plane``) resample nearest on raw codes.

    ``resampling`` is one method for every data plane, or a dict of
    per-band choices — ``{"B08": "cubic", "*": "bilinear"}`` — the
    per-band warp table of R/vrt-warp.R:418-491. Set
    ``mask_plane=False`` when the payload no longer carries a class
    plane (e.g. after ``set_maskfun(drop_mask_band=True)``) so the
    last DATA band is not silently nearest-resampled."""
    out_schema = df.schema
    if isinstance(resampling, dict):
        overrides = dict(resampling)
        default = overrides.pop("*", "bilinear")
    else:
        overrides, default = None, resampling

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for row in pdf.itertuples(index=False):
                arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
                names = (list(row.bands)
                         if getattr(row, "bands", None) is not None else None)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         row.nodata)
                out = warp_np(arr, out_h, out_w, default,
                              mask_plane=mask_plane, nodata=nd,
                              band_names=names, overrides=overrides)
                dtype = codec.dtype_for(row.fmt)
                _, is_class = resolve_plane_methods(
                    names, len(arr), default, overrides, mask_plane)
                nd_arr = np.atleast_1d(np.asarray(nd, dtype=np.float64))
                # NaN (no valid contributor) -> the plane's sentinel;
                # class planes are already raw codes
                quant = np.stack([
                    out[b].astype(dtype) if is_class[b]
                    else codec.from_float(
                        out[b][None], float(nd_arr[b % len(nd_arr)]),
                        dtype)[0]
                    for b in range(len(arr))])
                payloads.append(codec.encode(quant, row.fmt))
            pdf = pdf.copy()
            pdf["bytes"] = payloads
            pdf["w"] = out_w
            pdf["h"] = out_h
            if "res_x" in pdf.columns:
                pdf["res_x"] = (pdf["xmax"] - pdf["xmin"]) / out_w
                pdf["res_y"] = (pdf["ymax"] - pdf["ymin"]) / out_h
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
