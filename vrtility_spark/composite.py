"""Temporal compositing — single-band and multiband (cross-band) reducers.

Single-band reducers (per band, per pixel, over the time axis) match
the reference's composite pixel functions exactly
(/root/reference/R/zvrt-pixel-funs-composite.R):

- ``median``/``mean``/``geomean``/``quantile(q)``/``mean_db`` — nodata
  sentinel masked out, reduce over time, refill sentinel (:7-169).
- ``mosaic`` — GDAL last-valid-source-wins stacking
  (/root/reference/R/vrt-compute.R:74-84): later scenes overlay earlier.
- the GDAL built-in pixfun family min/max/sum/sqrt/expression
  (/root/reference/R/vrt-set-gdal-pixfun.R:58-224).

Multiband reducers consume the per-pixel (time × band) matrix — the
``multiband_reduce`` path (/root/reference/R/multiband_reduce.R:103-259,
reducers R/multiband_reduce_funs.R):

- ``medoid``/``quantoid(p)``/``geomedoid`` — xoid family
  (multiband_reduce_funs.R:273-307): drop all-NA observations, exclude
  bands containing any NA from the distance, pick the observation
  nearest the per-band statistic, optionally impute remaining NAs.
  These *select real observations* → row-exact reproducibility.
- ``geomedian`` — geometric median. The reference's default (Gmedian
  SGD, :51-60) is stochastic; we implement the reference's own
  deterministic switch (``weizfeld=TRUE``, :61-82): Weiszfeld iteration
  with fixed ``nitermax``/``epsilon``, initialized at per-band medians.
  NA bands are imputed with per-band medians (deterministic stand-in
  for the Gmedian imputation — documented deviation).

All kernels are NumPy-vectorized over every pixel of a tile at once
(the two Rcpp pivot kernels, src/multiband-reduce.cpp and
src/restructure-cells.cpp, vanish into reshapes). The Spark wrapper is
one ``groupBy(cell_id).applyInPandas`` — the shuffle that brings a
pixel's full time series to one task (the reference's ``vrt_stack``,
R/vrt-stack.R:27-77).
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec

# ------------------------------------------------ single-band kernels ----
# stack: (T, B, H, W) float64 with NaN for nodata → (B, H, W) float64


def median_t(stack: np.ndarray) -> np.ndarray:
    return np.nanmedian(stack, axis=0)


def mean_t(stack: np.ndarray) -> np.ndarray:
    return np.nanmean(stack, axis=0)


def geomean_t(stack: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.exp(np.nanmean(np.log(stack), axis=0))


def quantile_t(q: float) -> Callable[[np.ndarray], np.ndarray]:
    def f(stack: np.ndarray) -> np.ndarray:
        return np.nanquantile(stack, q, axis=0)
    f.__name__ = f"quantile_{q}"
    return f


def mean_db_t(stack: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        return 10.0 * np.log10(np.nanmean(stack, axis=0))


def min_t(stack): return np.nanmin(stack, axis=0)
def max_t(stack): return np.nanmax(stack, axis=0)


def sum_t(stack):
    out = np.nansum(stack, axis=0)
    # nansum of all-NaN is 0 — an all-nodata pixel must stay nodata
    out[np.all(np.isnan(stack), axis=0)] = np.nan
    return out


def mosaic_t(stack: np.ndarray) -> np.ndarray:
    """Last valid observation wins (time ascending), per pixel per band."""
    out = np.full(stack.shape[1:], np.nan)
    for t in range(stack.shape[0]):
        valid = ~np.isnan(stack[t])
        out[valid] = stack[t][valid]
    return out


def first_t(stack: np.ndarray) -> np.ndarray:
    """First valid observation wins."""
    return mosaic_t(stack[::-1])


# ------------------------------------------------- multiband kernels ----
# X: (T, B, P) float64 with NaN → (B, P)


def _valid_rows(X: np.ndarray) -> np.ndarray:
    """~(all-NA observation) per pixel — the C++ pivot's row filter
    (src/multiband-reduce.cpp:39-77)."""
    return ~np.all(np.isnan(X), axis=1)  # (T, P)


def weiszfeld(X: np.ndarray, nitermax: int = 100, epsilon: float = 1e-8,
              col_w: np.ndarray | None = None) -> np.ndarray:
    """Geometric median over complete observations, vectorized per pixel.

    Init at per-band nanmedians (the reference's Gmedian init,
    multiband_reduce_funs.R:55); observations containing any NaN are
    excluded (Weiszfeld requires complete cases, :36-38).

    ``col_w`` (B,P in {0,1}) restricts the distance to an included-band
    subset — the xoid ``xc = x[, non_na_cols]`` semantics
    (multiband_reduce_funs.R:276-288). With ``col_w`` given, a row is
    usable iff it is not all-NaN (it is then complete within the
    included bands by construction).
    """
    T, B, P = X.shape
    if X.dtype not in (np.float32, np.float64):
        X = X.astype(np.float64)  # isnan/zeroing below need float
    dt = X.dtype
    if col_w is None:
        complete = ~np.any(np.isnan(X), axis=1)  # (T, P)
        cw = np.ones((1, B, P), dtype=dt)
    else:
        complete = ~np.all(np.isnan(X), axis=1)
        cw = col_w.reshape(1, B, P).astype(dt)
    Xz = np.where(np.isnan(X), dt.type(0.0), X)
    wrow = complete.astype(dt)[:, None, :]  # (T,1,P)
    with np.errstate(all="ignore"):
        y = np.nanmedian(X, axis=0)  # (B, P) init
    y = np.where(np.isnan(y), 0.0, y)
    for _ in range(nitermax):
        d = np.sqrt(np.sum(cw * (Xz - y[None]) ** 2, axis=1, keepdims=True))
        w = wrow / np.maximum(d, epsilon)
        denom = np.sum(w, axis=0)  # (1,P)
        y_new = np.sum(w * Xz, axis=0) / np.maximum(denom, epsilon)
        if np.nanmax(np.abs(y_new - y)) < epsilon:
            y = y_new
            break
        y = y_new
    no_obs = complete.sum(axis=0) == 0  # pixels with no usable obs
    if np.any(no_obs):
        with np.errstate(all="ignore"):
            fallback = np.nanmedian(X, axis=0)
        y[:, no_obs] = fallback[:, no_obs]
    return y


def geomedian_mb(X: np.ndarray, nitermax: int = 100, epsilon: float = 1e-8,
                 impute_na: bool = True) -> np.ndarray:
    y = weiszfeld(X, nitermax, epsilon)
    if impute_na:
        vr = _valid_rows(X)
        col_has_na = np.any(np.isnan(X) & vr[:, None, :], axis=0)  # (B,P)
        med = np.nanmedian(X, axis=0)
        y = np.where(col_has_na, med, y)
    return y


_DISTANCES = {}


def _register(name):
    def deco(f):
        _DISTANCES[name] = f
        return f
    return deco


@_register("euclidean")
def _d_euclid(X, stat, w):
    return np.sqrt(np.nansum(w * (X - stat[None]) ** 2, axis=1))


@_register("manhattan")
def _d_manhattan(X, stat, w):
    return np.nansum(w * np.abs(X - stat[None]), axis=1)


@_register("maximum")
def _d_maximum(X, stat, w):
    return np.nanmax(np.where(w > 0, np.abs(X - stat[None]), 0.0), axis=1)


@_register("canberra")
def _d_canberra(X, stat, w):
    denom = np.abs(X) + np.abs(stat[None])
    with np.errstate(divide="ignore", invalid="ignore"):
        term = np.abs(X - stat[None]) / denom
    return np.nansum(np.where((w > 0) & (denom > 0), term, 0.0), axis=1)


@_register("cosine")
def _d_cosine(X, stat, w):
    num = np.nansum(w * X * stat[None], axis=1)
    na = np.sqrt(np.nansum(w * X * X, axis=1))
    nb = np.sqrt(np.nansum(w * stat[None] ** 2, axis=1))
    with np.errstate(divide="ignore", invalid="ignore"):
        return 1.0 - num / np.maximum(na * nb, 1e-300)


# Remaining metrics of the reference's 21-type dista menu
# (multiband_reduce_funs.R:110-131). xoid only *argmins* the distance,
# so any strictly-monotone-equivalent form selects the same
# observation; constant-factor conventions (e.g. Hellinger's 1/sqrt(2))
# therefore don't affect output parity. Probability-style metrics
# (bhattacharyya, KL, JS, itakura_saito) assume positive inputs —
# radiometric pixel values are.

def _safe(x):
    return np.maximum(x, 1e-300)


@_register("minimum")
def _d_minimum(X, stat, w):
    return np.nanmin(np.where(w > 0, np.abs(X - stat[None]), np.inf), axis=1)


@_register("minkowski")
def _d_minkowski(X, stat, w, p=3.0):
    return np.nansum(w * np.abs(X - stat[None]) ** p, axis=1) ** (1.0 / p)


@_register("hellinger")
def _d_hellinger(X, stat, w):
    with np.errstate(invalid="ignore"):
        return np.nansum(w * (np.sqrt(np.abs(X)) -
                              np.sqrt(np.abs(stat[None]))) ** 2, axis=1)


@_register("chi_square")
def _d_chi_square(X, stat, w):
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (X - stat[None]) ** 2 / _safe(np.abs(X + stat[None]))
    return np.nansum(w * t, axis=1)


@_register("sorensen")
def _d_sorensen(X, stat, w):
    num = np.nansum(w * np.abs(X - stat[None]), axis=1)
    den = _safe(np.nansum(w * np.abs(X + stat[None]), axis=1))
    return num / den


@_register("soergel")
def _d_soergel(X, stat, w):
    num = np.nansum(w * np.abs(X - stat[None]), axis=1)
    den = _safe(np.nansum(w * np.maximum(X, stat[None]), axis=1))
    return num / den


@_register("kulczynski")
def _d_kulczynski(X, stat, w):
    num = np.nansum(w * np.abs(X - stat[None]), axis=1)
    den = _safe(np.nansum(w * np.minimum(X, stat[None]), axis=1))
    return num / den


@_register("wave_hedges")
def _d_wave_hedges(X, stat, w):
    with np.errstate(divide="ignore", invalid="ignore"):
        t = 1.0 - np.minimum(X, stat[None]) / _safe(np.maximum(X, stat[None]))
    return np.nansum(w * t, axis=1)


@_register("motyka")
def _d_motyka(X, stat, w):
    num = np.nansum(w * np.maximum(X, stat[None]), axis=1)
    den = _safe(np.nansum(w * (X + stat[None]), axis=1))
    return num / den


@_register("harmonic_mean")
def _d_harmonic_mean(X, stat, w):
    with np.errstate(divide="ignore", invalid="ignore"):
        t = X * stat[None] / _safe(X + stat[None])
    return -2.0 * np.nansum(w * t, axis=1)


@_register("bhattacharyya")
def _d_bhattacharyya(X, stat, w):
    with np.errstate(invalid="ignore"):
        bc = np.nansum(w * np.sqrt(np.abs(X * stat[None])), axis=1)
    return -np.log(_safe(bc))


@_register("jeffries_matusita")
def _d_jeffries_matusita(X, stat, w):
    with np.errstate(invalid="ignore"):
        bc = np.nansum(w * np.sqrt(np.abs(X * stat[None])), axis=1)
    norm = np.nansum(w * (X + stat[None]) / 2.0, axis=1)
    return 2.0 * norm - 2.0 * bc


@_register("kullback_leibler")
def _d_kullback_leibler(X, stat, w):
    with np.errstate(divide="ignore", invalid="ignore"):
        t = X * np.log(_safe(X) / _safe(stat[None]))
    return np.nansum(w * t, axis=1)


@_register("jensen_shannon")
def _d_jensen_shannon(X, stat, w):
    m = _safe((X + stat[None]) / 2.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (X * np.log(_safe(X) / m) + stat[None] * np.log(_safe(stat[None]) / m))
    return np.nansum(w * t, axis=1)


@_register("itakura_saito")
def _d_itakura_saito(X, stat, w):
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = _safe(X) / _safe(stat[None])
        t = ratio - np.log(ratio) - 1.0
    return np.nansum(w * t, axis=1)


@_register("gower")
def _d_gower(X, stat, w):
    nb = _safe(np.sum(w, axis=1))
    return np.nansum(w * np.abs(X - stat[None]), axis=1) / nb


def xoid_mb(X: np.ndarray, stat_fn: Callable[[np.ndarray], np.ndarray],
            distance_type: str = "euclidean", impute_na: bool = True,
            impute_fn: Callable[[np.ndarray], np.ndarray] | None = None) -> np.ndarray:
    """Vectorized xoid_generator (multiband_reduce_funs.R:273-307).

    Per pixel: drop all-NA observations; bands with any NA among the
    remaining observations are excluded from the distance (``na_cols``
    at :276-278); pick argmin (first on ties, like R ``which.min``);
    impute the selected row's NAs with ``impute_fn`` per band.
    """
    T, B, P = X.shape
    vr = _valid_rows(X)  # (T,P)
    dt = X.dtype if X.dtype in (np.float32, np.float64) else np.float64
    col_has_na = np.any(np.isnan(X) & vr[:, None, :], axis=0)  # (B,P)
    w = (~col_has_na).astype(dt)[None]  # (1,B,P) band inclusion
    with np.errstate(all="ignore"):
        stat = stat_fn(X, w[0])  # (B,P) per-band statistic over included cols
    stat_z = np.where(np.isnan(stat), 0.0, stat)
    Xz = np.where(np.isnan(X), 0.0, X)
    dist = _DISTANCES[distance_type](Xz, stat_z, w)  # (T,P)
    dist = np.where(vr, dist, np.inf)
    best = np.argmin(dist, axis=0)  # (P,)
    result = np.take_along_axis(X, best[None, None, :].repeat(B, axis=1), axis=0)[0]
    if impute_na:
        with np.errstate(all="ignore"):
            istat = (impute_fn or stat_fn)(X, w[0])
        result = np.where(np.isnan(result), istat, result)
    return result


def _nanmedian_stat(x, w=None):
    return np.nanmedian(x, axis=0)


def medoid_mb(X, distance_type="euclidean", impute_na=True):
    return xoid_mb(X, _nanmedian_stat, distance_type, impute_na)


def quantoid_mb(X, probability=0.4, distance_type="euclidean", impute_na=True):
    return xoid_mb(X, lambda x, w=None: np.nanquantile(x, probability, axis=0),
                   distance_type, impute_na)


def geomedoid_mb(X, distance_type="euclidean", impute_na=True,
                 nitermax=100, epsilon=1e-8):
    """Target = geometric median of the included-band subset; NAs in the
    selected observation are imputed with per-band medians (deterministic
    stand-in for the reference's stochastic Gmedian imputation)."""
    return xoid_mb(X, lambda x, w: weiszfeld(x, nitermax, epsilon, col_w=w),
                   distance_type, impute_na, impute_fn=_nanmedian_stat)


REDUCERS: dict[str, Callable[[np.ndarray], np.ndarray]] = {}


# pixels per multiband-reducer chunk: keeps the iterative kernels'
# working set (~T*B*chunk*8B*~6 temporaries) L2-resident, so the 100
# Weiszfeld iterations re-read cache instead of streaming DRAM. Without
# chunking, per-core throughput collapses as workers contend for memory
# bandwidth (measured: 8->32 workers gave only 1.5x). Chunk boundaries
# don't change results: every reducer is independent per pixel.
PIX_CHUNK = 4096


def _mb_as_stack(f):
    """Adapt an (T,B,P) multiband reducer to the (T,B,H,W) stack shape,
    processing pixels in cache-sized chunks."""
    def g(stack: np.ndarray) -> np.ndarray:
        T, B, H, W = stack.shape
        flat = stack.reshape(T, B, H * W)
        P = H * W
        if P <= PIX_CHUNK:
            return f(flat).reshape(B, H, W)
        out = np.empty((B, P), dtype=flat.dtype)
        for lo in range(0, P, PIX_CHUNK):
            hi = min(lo + PIX_CHUNK, P)
            out[:, lo:hi] = f(np.ascontiguousarray(flat[:, :, lo:hi]))
        return out.reshape(B, H, W)
    return g


REDUCERS.update(
    median=median_t, mean=mean_t, geomean=geomean_t, mean_db=mean_db_t,
    min=min_t, max=max_t, sum=sum_t, mosaic=mosaic_t, first=first_t,
    q25=quantile_t(0.25), q75=quantile_t(0.75),
    medoid=_mb_as_stack(medoid_mb),
    quantoid=_mb_as_stack(quantoid_mb),
    geomedoid=_mb_as_stack(geomedoid_mb),
    geomedian=_mb_as_stack(geomedian_mb),
)


def resolve_reducer(reducer):
    """Reducer lookup accepting ANY quantile by name — ``"q10"``,
    ``"q7"``, ``"quantile:0.375"`` — matching the reference's
    ``quantile_numpy(probability=...)`` taking arbitrary q
    (/root/reference/R/zvrt-pixel-funs-composite.R:99-141), not just
    the pre-registered q25/q75."""
    if callable(reducer):
        return reducer
    if reducer in REDUCERS:
        return REDUCERS[reducer]
    import re
    m = re.fullmatch(r"q(\d{1,2})", reducer)
    if m:
        return quantile_t(int(m.group(1)) / 100.0)
    m = re.fullmatch(r"quantile:(0(\.\d+)?|1(\.0+)?)", reducer)
    if m:
        return quantile_t(float(m.group(1)))
    raise KeyError(f"unknown reducer {reducer!r}; known: "
                   f"{sorted(REDUCERS)} or qNN / quantile:<q>")

COMPOSITE_SCHEMA = (
    "cell_id long, bytes binary, w int, h int, fmt string, n_scenes int, "
    "datetime_median timestamp, nodata double, band_nodata array<double>, "
    "caption_agg string"
)


CAPTION_CAP = 16  # captions folded into caption_agg before truncation


def composite(df: DataFrame, reducer: str | Callable[[np.ndarray], np.ndarray],
              key: str = "cell_id", compute_dtype: str = "float32",
              scene_fn: Callable[[np.ndarray, float], np.ndarray] | None = None,
              caption_cap: int = CAPTION_CAP,
              ) -> DataFrame:
    """``groupBy(cell).applyInPandas(reduce)`` — the whole
    multiband_reduce driver (R/multiband_reduce.R:103-259) as one
    shuffle + one Arrow-vectorized grouped map.

    Expects an images DataFrame carrying ``cell_id`` (see
    :func:`vrtility_spark.warp.assign_cells`); scenes in a group share
    the tile grid (the ``vrt_collection_warped`` invariant).
    Stamps the median acquisition datetime on each composite
    (R/vrt-compute.R:547-590) and carries captions through sorted (the
    caption-passthrough invariant of BASELINE.json).

    ``scene_fn(arr, nodata)`` is applied to each decoded scene before
    reduction — operator FUSION: masking (or any per-scene transform)
    evaluates inside the same read, exactly like the reference's nested
    VRT evaluating mask ∘ composite per block in one pass
    (R/gdalraster-async.r:99-112), skipping a full payload rewrite.
    """
    fn = resolve_reducer(reducer)

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("datetime", kind="mergesort")
        # the vrt_stack invariant: scenes in one stack must share the
        # grid (the reference errors on >1 SRS, R/vrt-stack.R:30; mixed
        # zones are impossible here because cell_id encodes the zone,
        # but mixed pixel grids / codecs must fail loudly, not corrupt)
        if (pdf.w.nunique() > 1 or pdf.h.nunique() > 1
                or pdf.fmt.nunique() > 1 or pdf.nodata.nunique(dropna=False) > 1):
            raise ValueError(
                f"cell {int(pdf[key].iloc[0])}: scenes disagree on pixel "
                f"grid/codec/nodata (w={sorted(pdf.w.unique())}, "
                f"h={sorted(pdf.h.unique())}, fmt={sorted(pdf.fmt.unique())}, "
                f"nodata={sorted(pdf.nodata.unique())}); "
                "normalize them onto one target grid/profile first")
        w, h, fmt = int(pdf.w.iloc[0]), int(pdf.h.iloc[0]), pdf.fmt.iloc[0]
        nodata = float(pdf.nodata.iloc[0])
        dtype = codec.dtype_for(fmt)
        # per-band sentinels (band_nodata) supersede the scalar when
        # present; scenes in a group must agree on them too
        rows = list(pdf.itertuples(index=False))
        first = rows[0]
        # plane count from the payload LENGTH for raw formats — a
        # decode just to count planes is one redundant full decode per
        # group (png payloads decode once and reuse it as stack[0])
        nb0 = codec.plane_count(first.bytes, w, h, fmt)
        first_arr = None
        if nb0 is None:
            first_arr = codec.decode(first.bytes, w, h, fmt)
            nb0 = len(first_arr)
        nd = codec.row_band_meta(first, nb0, "band_nodata", nodata)
        if "band_nodata" in pdf.columns:
            seen = {None if v is None or (np.isscalar(v) and codec.pd_isna(v))
                    else np.asarray(v, dtype=np.float64).tobytes()
                    for v in pdf["band_nodata"]}
            if len(seen) > 1:
                raise ValueError(
                    f"cell {int(pdf[key].iloc[0])}: scenes disagree on "
                    "band_nodata; normalize the profile first")
        # float32 compute by default: halves the kernels' memory
        # traffic (the scaling bottleneck at high parallelism) and
        # matches the reference's Float32 derived-band policy
        # (R/vrt-derived-block.R:123); pass compute_dtype="float64"
        # for bit-exact parity with the float64 NumPy oracle.
        def dec(r, pre=None):
            arr = codec.decode(r.bytes, r.w, r.h, r.fmt) if pre is None \
                else pre
            if scene_fn is not None:
                arr = scene_fn(arr, nd)
            return codec.to_float_masked(arr, nd).astype(compute_dtype)

        stack = np.stack([dec(r, first_arr if i == 0 else None)
                          for i, r in enumerate(rows)])
        # (T, B, H, W)
        out = fn(stack)
        payload = codec.from_float(out, nd, dtype)
        dt = pdf["datetime"].sort_values().reset_index(drop=True)
        n_dt = len(dt)
        if n_dt % 2 == 1:
            med_dt = dt.iloc[n_dt // 2]
        else:  # stats::median interpolates between the two middle times
            lo, hi = dt.iloc[n_dt // 2 - 1], dt.iloc[n_dt // 2]
            med_dt = lo + (hi - lo) / 2
        # bounded caption rollup: a dense cell at 100x scale (1e4+
        # scenes) must not emit a multi-MB string row — keep the first
        # ``caption_cap`` in sorted order plus an overflow count
        caps = sorted(pdf.caption.tolist())
        if len(caps) > caption_cap:
            agg = "|".join(caps[:caption_cap]) + \
                f"|+{len(caps) - caption_cap} more"
        else:
            agg = "|".join(caps)
        return pd.DataFrame([{
            "cell_id": int(pdf[key].iloc[0]),
            "bytes": codec.encode(payload, fmt),
            "w": w, "h": h, "fmt": fmt, "n_scenes": len(pdf),
            "datetime_median": med_dt, "nodata": nodata,
            "band_nodata": None if np.isscalar(nd) else list(nd),
            "caption_agg": agg,
        }])

    return df.groupBy(key).applyInPandas(reduce_group, schema=COMPOSITE_SCHEMA)


def scalar_composite_cols(reducer: str, col: str):
    """Expression-path twins for scalar columns (parity tests / SQL
    oracle): the same reductions via built-in functions only."""
    c = F.col(col)
    return {
        "median": F.median(c), "mean": F.avg(c),
        "geomean": F.exp(F.avg(F.log(c))),
        "mean_db": F.log10(F.avg(c)) * 10.0,
        "min": F.min(c), "max": F.max(c), "sum": F.sum(c),
    }[reducer]
