"""Per-band normalization / percent-cut stretch (SURVEY §2 F7).

The reference normalizes plotted tiles per band to [0, 1] — plain
min/max, an explicit ``minmax`` range, or a percent cut whose bounds
are R type-7 quantiles (``.gr_normalize`` / ``.gr_as_raster``,
/root/reference/R/gdalraster-internals.R:12-22,64-81, adapted there
from gdalraster). Values below/above the range clamp to 0/1; NaN
(nodata) pixels stay NaN.

The distributed twin stretches a whole tile COLLECTION against
collection-global per-band bounds (the reference's per-plot quantile,
computed over every valid pixel of every tile — what you want when a
mosaic must share one color scale):

* **stats pass** — one narrow Arrow map emits per-band value
  HISTOGRAM partials (map-side combined: one ``(band, value, count)``
  row per distinct value per partition). Integer payloads
  (raw16/raw16s/png/png8) have ≤ 65536 distinct values per band, so
  the partials are bounded and the type-7 quantile computed from the
  merged histogram is EXACT — order statistics fall out of the
  cumulative counts. Float payloads (rawf32) first take an exact
  min/max pass, then bin into ``N_BINS`` uniform bins (values
  represented by bin midpoints; quantile error ≤ half a bin width of
  the data range, documented and test-bounded).
* **apply pass** — a second narrow map rescales every pixel:
  ``clip((x - lo) / (hi - lo), 0, 1)``; output re-types to ``rawf32``
  in [0, 1] with the finite ``-9999`` sentinel for nodata (same
  rationale as :mod:`terrain` — a NaN nodata column breaks
  downstream cell-keyed operators through the Arrow boundary).

Nothing pixel-sized ever shuffles: the only exchange is the tiny
histogram merge (≤ bands × 65536 rows total).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec

#: finite output sentinel (see terrain.py:149 for the rationale)
_SENTINEL = -9999.0

#: float-payload histogram resolution (65536 bins ≙ integer exactness
#: for 16-bit data; quantile error ≤ (max-min)/N_BINS/2 for rawf32)
N_BINS = 65536

_INT_FMTS = ("raw16", "raw16s", "png", "png8")


def quantile_type7_from_hist(values: np.ndarray, counts: np.ndarray,
                             p: float) -> float:
    """R type-7 (= ``np.quantile`` ``method='linear'``) quantile from a
    value→count histogram — exact when ``values`` are the exact data
    values. ``values`` must be sorted ascending."""
    n = int(counts.sum())
    if n == 0:
        return float("nan")
    h = (n - 1) * float(p)
    lo_i, hi_i = int(np.floor(h)), int(np.ceil(h))
    cum = np.cumsum(counts)
    x_lo = float(values[np.searchsorted(cum, lo_i + 1)])
    x_hi = float(values[np.searchsorted(cum, hi_i + 1)])
    return x_lo + (h - lo_i) * (x_hi - x_lo)


def stretch_np(P: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Per-band normalize of a NaN-masked ``(B, H, W)`` stack to [0, 1]
    with clamping (``.gr_normalize`` with an explicit range). A
    degenerate band (``hi == lo``) yields NaN — R's 0/0 behavior."""
    lo = np.asarray(lo, dtype=np.float64).reshape(-1, 1, 1)
    hi = np.asarray(hi, dtype=np.float64).reshape(-1, 1, 1)
    if lo.shape[0] != P.shape[0] or hi.shape[0] != P.shape[0]:
        raise ValueError(
            f"stretch bounds cover {lo.shape[0]}/{hi.shape[0]} bands, "
            f"tile has {P.shape[0]}")
    with np.errstate(invalid="ignore", divide="ignore"):
        out = (P - lo) / (hi - lo)
        out[np.broadcast_to(hi == lo, out.shape)] = np.nan
    return np.clip(out, 0.0, 1.0)


def _decoded(d: dict):
    arr = codec.decode(d["bytes"], int(d["w"]), int(d["h"]), d["fmt"])
    nd = codec.row_band_meta(
        SimpleNamespace(band_nodata=d.get("band_nodata")), len(arr),
        "band_nodata", codec.nodata_scalar(d["nodata"]))
    return codec.to_float_masked(arr, nd)


def _hist_partials(edges_lo: np.ndarray | None,
                   edges_w: np.ndarray | None):
    """Arrow map → per-partition per-band value histograms. With
    ``edges_lo/edges_w`` set, ``rawf32`` rows are binned to bin
    midpoints; integer-payload rows stay exact even in a mixed
    collection (their pixels contribute exact histogram values — only
    the float tiles pay the half-bin resolution)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        acc: dict[tuple[int, float], int] = {}
        for pdf in batches:
            for row in pdf.itertuples(index=False, name=None):
                d = dict(zip(pdf.columns, row))
                P = _decoded(d)
                for b in range(len(P)):
                    x = P[b][np.isfinite(P[b])]
                    if x.size == 0:
                        continue
                    if edges_lo is not None and d["fmt"] == "rawf32":
                        w = edges_w[b]
                        if w > 0:
                            idx = np.clip(
                                ((x - edges_lo[b]) / w).astype(np.int64),
                                0, N_BINS - 1)
                            x = edges_lo[b] + (idx + 0.5) * w
                        else:  # constant band: one bin
                            x = np.full_like(x, edges_lo[b])
                    vals, cnts = np.unique(x, return_counts=True)
                    for v, c in zip(vals, cnts):
                        k = (b, float(v))
                        acc[k] = acc.get(k, 0) + int(c)
        if acc:
            yield pd.DataFrame(
                [{"band": b, "value": v, "n": c}
                 for (b, v), c in acc.items()])

    return run


def _minmax_partials():
    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        lo: dict[int, float] = {}
        hi: dict[int, float] = {}
        for pdf in batches:
            for row in pdf.itertuples(index=False, name=None):
                P = _decoded(dict(zip(pdf.columns, row)))
                for b in range(len(P)):
                    x = P[b][np.isfinite(P[b])]
                    if x.size == 0:
                        continue
                    m, M = float(x.min()), float(x.max())
                    lo[b] = m if b not in lo else min(lo[b], m)
                    hi[b] = M if b not in hi else max(hi[b], M)
        if lo:
            yield pd.DataFrame(
                [{"band": b, "lo": lo[b], "hi": hi[b]} for b in lo])

    return run


def _stats_input(df: DataFrame) -> DataFrame:
    cols = ["bytes", "w", "h", "fmt", "nodata"]
    if "band_nodata" in df.columns:
        cols.append("band_nodata")
    return df.select(*cols)


def band_minmax(df: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Exact collection-global per-band (min, max) over valid pixels —
    one narrow map, partials merge in one tiny aggregate."""
    rows = (_stats_input(df).mapInPandas(
        _minmax_partials(), "band int, lo double, hi double")
        .groupBy("band").agg(F.min("lo").alias("lo"),
                             F.max("hi").alias("hi"))
        .orderBy("band").collect())
    if not rows:
        raise ValueError("stretch: no valid pixels in the collection")
    nb = rows[-1].band + 1
    if [r.band for r in rows] != list(range(nb)):
        raise ValueError(
            "stretch: tiles disagree on plane count (some bands have "
            "no valid pixels anywhere); normalize band layout first")
    return (np.array([r.lo for r in rows]),
            np.array([r.hi for r in rows]))


def band_percentiles(df: DataFrame, pcts: Sequence[float]
                     ) -> list[np.ndarray]:
    """Collection-global per-band type-7 percentiles (``pcts`` in
    0-100). Exact for integer payloads; bin-midpoint resolution
    (``N_BINS`` over the exact min/max range) for rawf32. In a mixed
    collection each tile keeps its own regime — integer tiles
    contribute exact values, rawf32 tiles binned ones — so appending a
    float tile never degrades the integer pixels' exactness."""
    fmts = [r.fmt for r in df.select("fmt").distinct().collect()]
    unknown = [f for f in fmts if f not in _INT_FMTS + ("rawf32",)]
    if unknown:
        raise ValueError(f"stretch: unknown payload formats {unknown}")
    if any(f == "rawf32" for f in fmts):
        lo, hi = band_minmax(df)
        edges_lo, edges_w = lo, (hi - lo) / N_BINS
    else:
        edges_lo = edges_w = None
    hist = (_stats_input(df).mapInPandas(
        _hist_partials(edges_lo, edges_w),
        "band int, value double, n long")
        .groupBy("band", "value").agg(F.sum("n").alias("n"))
        .orderBy("band", "value").collect())
    if not hist:
        raise ValueError("stretch: no valid pixels in the collection")
    by_band: dict[int, list] = {}
    for r in hist:
        by_band.setdefault(r.band, []).append((r.value, r.n))
    nb = max(by_band) + 1
    if sorted(by_band) != list(range(nb)):
        raise ValueError(
            "stretch: tiles disagree on plane count (some bands have "
            "no valid pixels anywhere); normalize band layout first")
    out = []
    for p in pcts:
        q = np.empty(nb)
        for b in range(nb):
            vals = np.array([v for v, _ in by_band[b]])
            cnts = np.array([c for _, c in by_band[b]], dtype=np.int64)
            q[b] = quantile_type7_from_hist(vals, cnts, float(p) / 100.0)
        out.append(q)
    return out


def stretch(df: DataFrame, pct_cut: Sequence[float] | None = None,
            minmax: tuple | None = None) -> DataFrame:
    """Normalize every tile's bands to [0, 1] against one
    collection-global range (F7's ``.gr_normalize``, distributed).

    Exactly one policy applies: ``minmax=(lo, hi)`` (scalars or
    per-band sequences — no stats pass at all), ``pct_cut=(2, 98)``
    (type-7 percentile bounds), or neither (global min/max). Output
    payloads are ``rawf32`` in [0, 1] with the finite ``-9999``
    sentinel as nodata; out-of-range pixels clamp to 0/1 and degenerate
    (constant) bands go nodata.
    """
    if pct_cut is not None and minmax is not None:
        raise ValueError("stretch: pass pct_cut OR minmax, not both")
    if pct_cut is not None:
        p_lo, p_hi = (float(pct_cut[0]), float(pct_cut[1]))
        if not 0.0 <= p_lo < p_hi <= 100.0:
            raise ValueError(f"stretch: bad pct_cut {pct_cut!r}")
        lo, hi = band_percentiles(df, (p_lo, p_hi))
    elif minmax is not None:
        lo = np.atleast_1d(np.asarray(minmax[0], dtype=np.float64))
        hi = np.atleast_1d(np.asarray(minmax[1], dtype=np.float64))
        if np.any(lo > hi):
            raise ValueError(
                f"stretch: minmax lo > hi ({minmax!r}) — pass (lo, hi)")
    else:
        lo, hi = band_minmax(df)

    names = [f.name for f in df.schema.fields]
    out_schema = df.schema

    def apply(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples(index=False, name=None):
                # dict(zip(...)) not getattr: itertuples mangles
                # non-identifier / leading-underscore passthrough names
                d = dict(zip(pdf.columns, row))
                P = _decoded(d)
                blo = lo if len(lo) > 1 else np.repeat(lo, len(P))
                bhi = hi if len(hi) > 1 else np.repeat(hi, len(P))
                out = stretch_np(P, blo, bhi)
                d = {n: d[n] for n in names}
                d["bytes"] = codec.encode(
                    codec.from_float(out, _SENTINEL, "float32"), "rawf32")
                d["fmt"] = "rawf32"
                d["nodata"] = _SENTINEL
                if "band_nodata" in names:
                    d["band_nodata"] = None
                rows.append(d)
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(apply, schema=out_schema)
