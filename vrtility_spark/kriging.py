"""Ordinary kriging: scattered points → geostatistically interpolated
raster tiles — the gstat/terra::interpolate / ArcGIS Kriging twin and
the model-based upgrade of :mod:`vrtility_spark.gridding`'s IDW
(gdal_grid has no kriging; the reference delegates interpolation to
external tooling entirely).

Three stages, each distributed-bounded:

1. **Empirical semivariogram** — pair generation rides the SAME
   cover-explosion trick as gridding (no all-pairs): each point
   anchors in its own pairing cell at the coarsest resolution whose
   cell size covers ``max_lag``, candidates explode into covering
   cells of their ``±max_lag`` bbox, and the (anchor-cell ==
   cover-cell) equi-join yields every unordered pair with
   ``0 < d <= max_lag`` exactly once (the ``id <`` filter dedupes the
   two orientations). Per-bin ``Σ (v_i − v_j)²``, ``Σ d`` and counts
   are quantized to the 1e-6 grid and summed as ``DECIMAL(38,6)`` —
   the :mod:`vrtility_spark.mad` exact-decimal policy, so the
   variogram (and everything fitted from it) is BIT-IDENTICAL under
   any partitioning, retry, or cluster size. Pair volume is bounded
   by point density × ``max_lag`` disk area, never n².
2. **Model fit** (driver-side, on ``n_lags`` tiny rows): weighted
   least squares of a ``spherical`` / ``exponential`` / ``gaussian``
   model — for each candidate range the (nugget, partial-sill) pair
   is the exact 2×2 weighted normal-equation solve (the model is
   LINEAR given the range), the range itself a deterministic scan
   over the bin-center candidate grid; ties break to the smallest
   range. No iterative optimizer, no seed, no convergence question.
3. **Krige** — the gridding plan again: candidate points explode to
   every tile within ``radius`` of their position, ONE
   ``groupBy(cell)`` grouped Arrow map solves each tile. Per pixel
   the ``max_points`` nearest candidates (stable-sorted by squared
   distance, then input order — deterministic under any shuffle of
   the same point set) form the classic OK system
   ``[[Γ, 1], [1ᵀ, 0]] [w, μ] = [γ*, 1]``; systems are solved in
   BATCHED ``np.linalg.solve`` over pixel chunks sized to a fixed
   element budget, so executor memory is flat in both tile area and
   point count. Pixels with fewer than ``min_points`` neighbours in
   ``radius`` hold the nodata sentinel; with ``nugget == 0`` the
   surface interpolates its data points exactly (the kriging
   property, closed-form-tested).

At 100 TB of points: nothing global is ever assembled — the variogram
shuffles ``n_lags`` decimal rows per partition, the solve shuffles
(point, cell) rows whose duplication factor is data-independent, and
the per-tile work is vectorized NumPy over a bounded candidate list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import cells, codec

OUT_NODATA = -9999.0
MODELS = ("spherical", "exponential", "gaussian")
GRID_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double, n_points int")

#: quantization grid shared with mad.py's decimal sufficient stats
_QDIGITS = 6
#: element budget for one (pixels, k+1, k+1) batched-solve temporary
_SOLVE_ELEMS = 1 << 22


# --------------------------------------------------------- kernels ----

def variogram_np(h, nugget: float, psill: float, rng: float,
                 model: str = "spherical") -> np.ndarray:
    """Semivariance of the fitted model at lag ``h`` (vectorized).
    ``γ(0) = 0`` exactly; for ``h > 0``, ``nugget + psill · g(h/rng)``
    with the standard spherical / exponential / gaussian ``g``."""
    if model not in MODELS:
        raise KeyError(f"unknown variogram model {model!r}; "
                       f"one of {MODELS}")
    h = np.asarray(h, np.float64)
    r = np.maximum(float(rng), 1e-300)
    x = h / r
    if model == "spherical":
        xc = np.minimum(x, 1.0)          # clip: inf lags would NaN the
        g = 1.5 * xc - 0.5 * xc ** 3     # unselected where-branch
    elif model == "exponential":
        g = 1.0 - np.exp(-3.0 * x)
    else:
        g = 1.0 - np.exp(-3.0 * x ** 2)
    out = float(nugget) + float(psill) * g
    return np.where(h > 0, out, 0.0)


def fit_variogram_np(lags, gamma, counts, model: str = "spherical",
                     candidates=None) -> dict:
    """Weighted-least-squares fit of ``(nugget, psill, range)`` to the
    binned empirical semivariogram. Deterministic: the range scans a
    finite candidate grid (default: the bin lags themselves), the
    other two parameters are the exact 2×2 weighted normal-equation
    solve at each candidate (clamped to ≥ 0), ties break to the
    smallest range. Bins with zero pairs are skipped."""
    lags = np.asarray(lags, np.float64)
    gamma = np.asarray(gamma, np.float64)
    wts = np.asarray(counts, np.float64)
    ok = (wts > 0) & np.isfinite(gamma)
    if ok.sum() < 2:
        raise ValueError(
            f"fit_variogram: only {int(ok.sum())} non-empty lag bins "
            "— need >= 2; widen max_lag or supply more points")
    lags, gamma, wts = lags[ok], gamma[ok], wts[ok]
    if candidates is None:
        candidates = lags[lags > 0]
    best = None
    for a in sorted(float(c) for c in candidates):
        g = variogram_np(lags, 0.0, 1.0, a, model)   # nugget 0, psill 1
        # weighted LS for gamma ~ c0 + c1 * g
        s0 = wts.sum()
        sg = (wts * g).sum()
        sgg = (wts * g * g).sum()
        sy = (wts * gamma).sum()
        sgy = (wts * g * gamma).sum()
        det = s0 * sgg - sg * sg
        if det <= 0:
            continue
        c1 = (s0 * sgy - sg * sy) / det
        c0 = (sy - c1 * sg) / s0
        c0, c1 = max(c0, 0.0), max(c1, 0.0)
        if c1 == 0.0:          # re-solve the pure-nugget degenerate
            c0 = max(sy / s0, 0.0)
        resid = gamma - (c0 + c1 * g)
        sse = float((wts * resid * resid).sum())
        if best is None or sse < best[0] - 1e-12:
            best = (sse, c0, c1, a)
    if best is None:
        raise ValueError("fit_variogram: every candidate range was "
                         "degenerate — the empirical variogram is "
                         "flat; use gridding.grid_points instead")
    _sse, nugget, psill, rng = best
    if nugget + psill <= 0:
        raise ValueError("fit_variogram: fitted sill is zero — the "
                         "field has no variance; kriging is "
                         "ill-posed, use gridding.grid_points")
    return {"model": model, "nugget": float(nugget),
            "psill": float(psill), "range": float(rng)}


def variogram_pairs_naive(xs, ys, vs, max_lag: float, n_lags: int):
    """Obviously-correct all-pairs empirical semivariogram (the oracle
    for the distributed pair generation): returns ``(sum_d, sum_dv2,
    counts)`` per bin over every unordered pair with
    ``0 < d <= max_lag``, each term quantized to the 1e-6 grid first
    (matching the distributed decimal sum exactly)."""
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    vs = np.asarray(vs, np.float64)
    width = float(max_lag) / int(n_lags)
    sum_d = np.zeros(n_lags)
    sum_dv2 = np.zeros(n_lags)
    counts = np.zeros(n_lags, np.int64)
    n = len(xs)
    for i in range(n):
        for j in range(i + 1, n):
            d = float(np.hypot(xs[i] - xs[j], ys[i] - ys[j]))
            if d <= 0 or d > max_lag:
                continue
            k = min(int(d / width), n_lags - 1)
            sum_d[k] += round(d, _QDIGITS)
            sum_dv2[k] += round((vs[i] - vs[j]) ** 2, _QDIGITS)
            counts[k] += 1
    return sum_d, sum_dv2, counts


def _chunk_pixels(k: int) -> int:
    return max(1, _SOLVE_ELEMS // max(1, (k + 1) * (k + 1)))


def krige_np(xs, ys, vs, x0: float, y0: float, size: float,
             w: int, h: int, vmodel: dict, radius: float,
             max_points: int = 16, min_points: int = 1) -> np.ndarray:
    """One tile's ordinary-kriging surface from its candidate points
    (zone coords, caller-fixed order). ``(1, h, w)`` float64 with NaN
    where fewer than ``min_points`` points fall inside ``radius`` of
    the pixel center. Per pixel: stable-nearest ``max_points``
    neighbours → the OK system with Lagrange multiplier → batched
    solve; prediction = wᵀv."""
    if not float(radius) > 0:
        raise ValueError("radius must be > 0")
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    vs = np.asarray(vs, np.float64)
    nugget, psill, rng, model = (vmodel["nugget"], vmodel["psill"],
                                 vmodel["range"], vmodel["model"])
    px = size / w
    cx = x0 + (np.arange(w) + 0.5) * px
    cy = y0 + (np.arange(h) + 0.5) * (size / h)
    CX, CY = np.meshgrid(cx, cy)              # (h, w)
    flat_cx, flat_cy = CX.ravel(), CY.ravel()
    n_px = flat_cx.size
    out = np.full(n_px, np.nan)
    P = len(xs)
    if P:
        k = min(int(max_points), P)
        r2 = float(radius) ** 2
        for i0 in range(0, n_px, _chunk_pixels(k)):
            sl = slice(i0, min(i0 + _chunk_pixels(k), n_px))
            dx = flat_cx[sl, None] - xs[None, :]
            dy = flat_cy[sl, None] - ys[None, :]
            d2 = dx * dx + dy * dy             # (px, P)
            inside = d2 <= r2
            cnt = inside.sum(axis=1)
            # stable k-nearest: ties and beyond-radius masked to +inf
            dmask = np.where(inside, d2, np.inf)
            order = np.argsort(dmask, axis=1, kind="stable")[:, :k]
            dsel = np.take_along_axis(dmask, order, axis=1)
            m = (cnt >= int(min_points)).nonzero()[0]
            if m.size == 0:
                continue
            o = order[m]
            npts = np.minimum(cnt[m], k)       # actual neighbours used
            # OK system per pixel: (k+1) x (k+1); absent slots (beyond
            # cnt) are padded to an identity row/col with a zero rhs
            # so they get weight 0 without branching
            pxs, pys, pvs = xs[o], ys[o], vs[o]
            ddx = pxs[:, :, None] - pxs[:, None, :]
            ddy = pys[:, :, None] - pys[:, None, :]
            G = variogram_np(np.sqrt(ddx * ddx + ddy * ddy),
                             nugget, psill, rng, model)
            rhs_g = variogram_np(np.sqrt(dsel[m]), nugget, psill, rng,
                                 model)
            A = np.zeros((m.size, k + 1, k + 1))
            A[:, :k, :k] = G
            A[:, k, :k] = 1.0
            A[:, :k, k] = 1.0
            b = np.zeros((m.size, k + 1))
            b[:, :k] = rhs_g
            b[:, k] = 1.0
            pad = np.arange(k)[None, :] >= npts[:, None]
            if pad.any():
                A[:, :k, :k][np.broadcast_to(
                    pad[:, :, None], (m.size, k, k))] = 0.0
                A[:, :k, :k][np.broadcast_to(
                    pad[:, None, :], (m.size, k, k))] = 0.0
                ii = np.nonzero(pad)
                A[ii[0], ii[1], ii[1]] = 1.0
                A[ii[0], k, ii[1]] = 0.0
                A[ii[0], ii[1], k] = 0.0
                b[ii[0], ii[1]] = 0.0
            try:
                wsol = np.linalg.solve(A, b[..., None])[..., 0]
            except np.linalg.LinAlgError:
                raise ValueError(
                    "krige: singular kriging system — duplicate "
                    "point coordinates in a neighbourhood; "
                    "deduplicate the point table first") from None
            seg = out[sl]                      # basic-slice view
            seg[m] = (wsol[:, :k] * pvs).sum(axis=1)
    return out.reshape(h, w)[None]


# ---------------------------------------------------- distributed ----

def _pair_res(max_lag: float) -> int:
    """Coarsest resolution whose cell size still covers ``max_lag`` —
    so a point's 3×3 pairing-cell neighbourhood always contains every
    partner within ``max_lag``."""
    if not float(max_lag) > 0:
        raise ValueError("max_lag must be > 0")
    res = 0
    while res + 1 <= 13 and cells.cell_size(res + 1) >= float(max_lag):
        res += 1
    if cells.cell_size(res) < float(max_lag):
        raise ValueError(
            f"max_lag {max_lag} exceeds the zone extent "
            f"{cells.cell_size(0)}")
    return res


def empirical_variogram(points: DataFrame, max_lag: float,
                        n_lags: int = 12, value_col: str = "value",
                        id_col: str = "point_id",
                        zone_col: str = "zone", x_col: str = "x",
                        y_col: str = "y"):
    """Distributed binned semivariogram (see the module docstring for
    the bounded pair plan). Returns ``(mean_lags, gamma, counts)``
    NumPy arrays of length ``n_lags`` (NaN gamma for empty bins) —
    bit-identical under any partitioning thanks to the decimal sums."""
    n_lags = int(n_lags)
    if n_lags < 2:
        raise ValueError("n_lags must be >= 2")
    r = float(max_lag)
    res = _pair_res(r)
    pts = points.select(
        F.col(zone_col).cast("long").alias("zone"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
        F.col(value_col).cast("double").alias("_v"),
        F.col(id_col).cast("long").alias("_pid"))
    anchors = pts.select(
        cells.xy_to_cell_col(F.col("zone"), F.col("_x"), F.col("_y"),
                             res).alias("_acell"),
        F.col("_x").alias("ax"), F.col("_y").alias("ay"),
        F.col("_v").alias("av"), F.col("_pid").alias("apid"))
    from vrtility_spark.warp import cells_cover
    cand = cells_cover(
        pts.select("zone", "_x", "_y", "_v", "_pid",
                   (F.col("_x") - r).alias("xmin"),
                   (F.col("_x") + r).alias("xmax"),
                   (F.col("_y") - r).alias("ymin"),
                   (F.col("_y") + r).alias("ymax")),
        res, out_col="_ccell") \
        .select(F.col("_ccell"), F.col("_x").alias("bx"),
                F.col("_y").alias("by"), F.col("_v").alias("bv"),
                F.col("_pid").alias("bpid"))
    d2 = ((F.col("ax") - F.col("bx")) ** 2
          + (F.col("ay") - F.col("by")) ** 2)
    width = r / n_lags
    pairs = (anchors.join(cand,
                          anchors["_acell"] == cand["_ccell"])
             .where((F.col("apid") < F.col("bpid"))
                    & (d2 > 0) & (d2 <= F.lit(r * r))))
    d = F.sqrt(d2)
    binc = F.least(F.floor(d / F.lit(width)).cast("int"),
                   F.lit(n_lags - 1))
    agg = (pairs.select(
        binc.alias("bin"),
        F.round(d, _QDIGITS).cast("decimal(38,6)").alias("d"),
        F.round((F.col("av") - F.col("bv")) ** 2, _QDIGITS)
         .cast("decimal(38,6)").alias("dv2"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("d").alias("sd"),
             F.sum("dv2").alias("sdv2"))
        .collect())
    counts = np.zeros(n_lags, np.int64)
    sum_d = np.zeros(n_lags)
    sum_dv2 = np.zeros(n_lags)
    for row in agg:
        counts[int(row["bin"])] = int(row["n"])
        sum_d[int(row["bin"])] = float(row["sd"])
        sum_dv2[int(row["bin"])] = float(row["sdv2"])
    with np.errstate(invalid="ignore"):
        mean_lags = np.where(counts > 0, sum_d / np.maximum(counts, 1),
                             np.nan)
        gamma = np.where(counts > 0,
                         sum_dv2 / (2.0 * np.maximum(counts, 1)),
                         np.nan)
    return mean_lags, gamma, counts


def krige_points(points: DataFrame, res: int, w: int, h: int,
                 variogram: dict | None = None,
                 max_lag: float | None = None, n_lags: int = 12,
                 model: str = "spherical", radius: float = 1.0,
                 max_points: int = 16, min_points: int = 1,
                 value_col: str = "value", id_col: str = "point_id",
                 zone_col: str = "zone", x_col: str = "x",
                 y_col: str = "y") -> DataFrame:
    """Scattered points → ordinary-kriging ``rawf32`` tiles at ``res``
    (one row per cell with a candidate point within ``radius``).
    ``variogram`` is a fitted model dict; pass ``None`` to fit one
    from the data first (``max_lag`` defaults to ``4 × radius``).
    Candidate order — and therefore every float in the surface — is
    fixed by ``id_col``."""
    if variogram is None:
        ml = float(max_lag) if max_lag is not None else 4.0 * radius
        lags, gamma, counts = empirical_variogram(
            points, ml, n_lags, value_col, id_col, zone_col, x_col,
            y_col)
        variogram = fit_variogram_np(lags, gamma, counts, model)
    else:
        variogram_np(np.zeros(1), variogram["nugget"],
                     variogram["psill"], variogram["range"],
                     variogram["model"])  # validate eagerly
    r = float(radius)
    pts = points.select(
        F.col(zone_col).cast("long").alias("zone"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
        F.col(value_col).cast("double").alias("_v"),
        F.col(id_col).cast("long").alias("_pid"),
        (F.col(x_col) - r).alias("xmin"),
        (F.col(x_col) + r).alias("xmax"),
        (F.col(y_col) - r).alias("ymin"),
        (F.col(y_col) + r).alias("ymax"))
    from vrtility_spark.warp import cells_cover
    cover = cells_cover(pts, int(res), out_col="_gcell") \
        .select("_gcell", "_x", "_y", "_v", "_pid")
    vm, rr, mp, mnp = dict(variogram), r, int(max_points), \
        int(min_points)
    tw, th = int(w), int(h)

    def make_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf["_gcell"].iloc[0])
        zone, cres, ix, iy = (int(v) for v in cells.decode_np(cid))
        size = cells.cell_size(cres)
        pdf = pdf.sort_values("_pid", kind="mergesort")
        surf = krige_np(pdf["_x"].to_numpy(), pdf["_y"].to_numpy(),
                        pdf["_v"].to_numpy(), ix * size, iy * size,
                        size, tw, th, vm, rr, mp, mnp)
        return pd.DataFrame([{
            "cell_id": cid,
            "bytes": codec.encode(
                codec.from_float(surf, OUT_NODATA, "float32"),
                "rawf32"),
            "w": tw, "h": th, "fmt": "rawf32", "nodata": OUT_NODATA,
            "n_points": int(len(pdf)),
        }])

    return (cover.groupBy("_gcell")
            .applyInPandas(make_tile, schema=GRID_SCHEMA))
