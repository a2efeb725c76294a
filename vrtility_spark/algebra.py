"""Raster algebra between two tile collections — change detection.

Pixel-wise combination of two one-row-per-cell tile tables on the same
grid (two epochs' composites, a scene vs a reference mosaic, a DEM vs
a water mask): ``diff``, ``abs_diff``, ``ratio``, ``ndiff`` (the
normalized-difference / NDVI-change form), or any callable.  The
reference expresses this as another nested-VRT pixel function over a
stacked pair (R/vrt-stack.R + R/zvrt-pixel-funs.R); here the pair
never stacks globally — it is ONE equi-join on ``cell_id``.

Spark-first plan: ``left ⋈ right`` on the cell key (shuffle hash /
sort-merge; co-located for bucketed tables, broadcastable when one
side is small) followed by a narrow Arrow map that decodes both
payloads once and emits the combined tile.  Join keys are the spatial
index, so Catalyst handles skew (AQE) and partition pruning exactly as
for every other cell-keyed operator.

NaN semantics: a pixel invalid on EITHER side is invalid in the
output (``ratio`` additionally yields NaN where the denominator is 0).
Outputs re-type to ``rawf32`` with the finite ``-9999`` sentinel (same
rationale as :mod:`terrain`).
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec

ALGEBRA_OPS = ("diff", "abs_diff", "ratio", "ndiff")

_SENTINEL = -9999.0


def algebra_np(A: np.ndarray, B: np.ndarray, op) -> np.ndarray:
    """Pixel-wise combine of two NaN-masked ``(B, H, W)`` arrays.
    Named ops require identical shapes; a callable may also pair a
    multi-band side with a single-plane side on the same pixel grid
    (NumPy plane broadcast — e.g. per-band correction by one
    illumination raster)."""
    plane_bcast = (callable(op) and A.shape[1:] == B.shape[1:]
                   and 1 in (A.shape[0], B.shape[0]))
    if A.shape != B.shape and not plane_bcast:
        raise ValueError(
            f"tile shapes disagree: {A.shape} vs {B.shape}; regrid or "
            "normalize band layout first")
    if callable(op):
        return np.asarray(op(A, B), dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        if op == "diff":
            return A - B
        if op == "abs_diff":
            return np.abs(A - B)
        if op == "ratio":
            out = A / B
            out[B == 0] = np.nan
            return out
        if op == "ndiff":
            den = A + B
            out = (A - B) / den
            out[den == 0] = np.nan
            return out
    raise KeyError(f"unknown algebra op {op!r}; known: {ALGEBRA_OPS}")


def tile_algebra(left: DataFrame, right: DataFrame, op="diff",
                 key: str = "cell_id",
                 broadcast_right: bool = False) -> DataFrame:
    """Combine two tile tables pixel-wise per cell.

    Inner join on ``key`` (cells present on only one side drop — the
    intersection is the only place the op is defined); output schema ==
    LEFT schema with the payload replaced by the ``rawf32`` result and
    the scalar ``-9999`` sentinel authoritative.  ``op`` is a name
    from :data:`ALGEBRA_OPS` or a callable ``(A, B) -> (B, H, W)``
    over NaN-masked float arrays.  ``broadcast_right=True`` skips the
    shuffle when the right side is a small reference layer.
    """
    if not callable(op) and op not in ALGEBRA_OPS:
        raise KeyError(f"unknown algebra op {op!r}; known: {ALGEBRA_OPS}")
    lnames = [f.name for f in left.schema.fields]
    for side, df in (("left", left), ("right", right)):
        names = {f.name for f in df.schema.fields}
        for req in (key, "bytes", "w", "h", "fmt", "nodata"):
            if req not in names:
                raise ValueError(
                    f"tile_algebra {side} table is missing column {req!r}")
    rsel = right.select(
        F.col(key).alias("_rkey"), F.col("bytes").alias("_rbytes"),
        F.col("w").alias("_rw"), F.col("h").alias("_rh"),
        F.col("fmt").alias("_rfmt"), F.col("nodata").alias("_rnodata"),
        *([F.col("band_nodata").alias("_rband_nodata")]
          if "band_nodata" in {f.name for f in right.schema.fields}
          else []))
    rside = F.broadcast(rsel) if broadcast_right else rsel
    joined = left.join(rside, left[key] == rsel["_rkey"])
    helper = [c for c in ("_rkey", "_rbytes", "_rw", "_rh", "_rfmt",
                          "_rnodata", "_rband_nodata")
              if c in {f.name for f in joined.schema.fields}]
    out_schema = left.schema

    def combine(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_rows = []
            # zip helper columns: itertuples mangles underscore names
            for row, rb, rw, rh, rfmt, rnd, rbnd in zip(
                    pdf[lnames].itertuples(index=False),
                    pdf["_rbytes"], pdf["_rw"], pdf["_rh"],
                    pdf["_rfmt"], pdf["_rnodata"],
                    (pdf["_rband_nodata"] if "_rband_nodata" in pdf
                     else [None] * len(pdf))):
                arrL = codec.decode(row.bytes, int(row.w), int(row.h),
                                    row.fmt)
                ndL = codec.row_band_meta(row, len(arrL), "band_nodata",
                                          codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arrL, ndL)
                arrR = codec.decode(rb, int(rw), int(rh), rfmt)
                ndR = (np.asarray(rbnd, dtype=np.float64)
                       if rbnd is not None and not np.isscalar(rbnd)
                       and len(np.atleast_1d(rbnd)) == len(arrR)
                       else codec.nodata_scalar(rnd))
                Bm = codec.to_float_masked(arrR, ndR)
                out = algebra_np(A, Bm, op)
                payload = codec.from_float(out, _SENTINEL, "float32")
                d = {n: getattr(row, n) for n in lnames}
                d["bytes"] = codec.encode(payload, "rawf32")
                d["fmt"] = "rawf32"
                d["nodata"] = _SENTINEL
                if "band_nodata" in lnames:
                    d["band_nodata"] = None
                out_rows.append(d)
            yield pd.DataFrame(out_rows, columns=lnames)

    return joined.mapInPandas(combine, schema=out_schema)


def topo_correct(bands: DataFrame, illum: DataFrame,
                 altitude: float = 45.0, c: float = 0.5,
                 key: str = "cell_id",
                 broadcast_illum: bool = False) -> DataFrame:
    """Topographic (C-) correction of a tile collection against an
    illumination raster (Teillet et al. 1982): ``ρ_corr = ρ ·
    (cos θz + c) / (cos i + c)`` with ``cos θz = sin(altitude)`` and
    ``cos i`` the single-plane output of ``terrain(op="illumination")``
    on the DEM — the standard slope/aspect radiometric normalization
    before mosaicking mountainous scenes (``c = 0`` is the plain
    cosine correction; the Teillet ``c`` damps its overcorrection at
    grazing incidence). One cell-keyed equi-join + a narrow Arrow map
    (tile_algebra); NaN where either side is invalid or the
    denominator vanishes."""
    cosz = float(np.sin(np.radians(altitude)))
    c = float(c)

    def corr(A, IL):
        den = IL + c
        with np.errstate(invalid="ignore", divide="ignore"):
            out = A * (cosz + c) / den
        out = np.where(den == 0, np.nan, out)
        return np.broadcast_to(out, (max(A.shape[0], IL.shape[0]),)
                               + A.shape[1:])

    return tile_algebra(bands, illum, op=corr, key=key,
                        broadcast_right=broadcast_illum)


def classify_np(A: np.ndarray, breaks) -> np.ndarray:
    """Digitize a NaN-masked array into class indices: ``0`` below
    ``breaks[0]``, ``i`` for ``breaks[i-1] <= v < breaks[i]``,
    ``len(breaks)`` at or above the last break. NaN stays NaN."""
    br = np.asarray(list(breaks), dtype=np.float64)
    if len(br) == 0 or np.any(np.diff(br) <= 0):
        raise ValueError("breaks must be non-empty and strictly increasing")
    out = np.digitize(A, br).astype(np.float64)
    out[~np.isfinite(A)] = np.nan
    return out


def classify(df: DataFrame, breaks, band: int = 0,
             key: str = "cell_id") -> DataFrame:
    """Reclassify a continuous band into level indices — the digitize
    step of gdal_contour's polygon mode and of any thematic-map
    recipe. ``band`` picks the plane; output is a single-plane
    ``rawf32`` tile table whose values are the class indices
    ``0..len(breaks)`` (``-9999`` sentinel where the input was
    nodata), ready for :func:`regions.polygonize` / :func:`zonal`.
    A narrow per-tile Arrow map — no shuffle, no join, pipelines into
    whatever stage precedes it."""
    br = tuple(float(b) for b in breaks)
    classify_np(np.zeros(1), br)  # validate eagerly
    from vrtility_spark.bands import subset_band_index
    one = subset_band_index(df, int(band))
    names = [f.name for f in one.schema.fields]

    def _map(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_rows = []
            for row in pdf.itertuples(index=False):
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)
                out = classify_np(A, br)
                d = {n: getattr(row, n) for n in names}
                d["bytes"] = codec.encode(
                    codec.from_float(out, _SENTINEL, "float32"), "rawf32")
                d["fmt"] = "rawf32"
                d["nodata"] = _SENTINEL
                if "band_nodata" in names:
                    d["band_nodata"] = None
                out_rows.append(d)
            yield pd.DataFrame(out_rows, columns=names)

    return one.mapInPandas(_map, schema=one.schema)


def zscore_anomaly(scenes: DataFrame, mean_df: DataFrame | None = None,
                   std_df: DataFrame | None = None, key: str = "cell_id",
                   scene_fn=None,
                   broadcast_stats: bool = False) -> DataFrame:
    """Per-scene standardized anomaly against the collection's own
    temporal climatology: ``z = (scene − mean) / std`` per pixel per
    band — the EO anomaly product (drought/flood/burn detection is a
    threshold on exactly this surface).

    Pure composition of existing operators, each already scale-shaped:
    the ``mean`` and ``std`` climatologies are DECOMPOSABLE composites
    (incremental accumulators, scenes never stack), and the two
    pixel-wise combines are :func:`tile_algebra` cell-keyed equi-joins
    (``diff`` then ``ratio`` — ``std == 0`` pixels yield NaN, as do
    pixels invalid on either side). Pass precomputed ``mean_df`` /
    ``std_df`` to reuse a stored climatology (the common production
    shape: this month's scenes vs a 10-year baseline);
    ``broadcast_stats=True`` skips both join shuffles when the
    climatology table is small.

    ``scenes`` should already carry the mask you want (e.g.
    ``masks.vrt_set_maskfun``); ``scene_fn`` is forwarded to the
    climatology composites so their statistics mask identically.
    Output: one rawf32/-9999 tile per input scene row, LEFT schema.
    """
    from vrtility_spark import composite as _composite
    if (mean_df is None) != (std_df is None):
        raise ValueError(
            "pass both mean_df and std_df (a stored climatology) or "
            "neither (computed from the scenes themselves)")
    if mean_df is None:
        mean_df = _composite.composite(scenes, "mean", key=key,
                                       scene_fn=scene_fn)
        std_df = _composite.composite(scenes, "std", key=key,
                                      scene_fn=scene_fn)
    dev = tile_algebra(scenes, mean_df, "diff", key=key,
                       broadcast_right=broadcast_stats)
    return tile_algebra(dev, std_df, "ratio", key=key,
                        broadcast_right=broadcast_stats)
