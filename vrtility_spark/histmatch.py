"""Histogram matching: remap every tile's bands so the collection's
per-band value distribution matches a REFERENCE collection's — the
classic radiometric-normalization step (skimage
``match_histograms`` / GDAL workflows pairing ``gdalenhance``-style
LUTs) before mosaicking scenes from different sensors, dates, or
atmospheric conditions into one seamless composite.

Reference parity: the reference normalizes plotted tiles per band
(.gr_normalize, /root/reference/R/gdalraster-internals.R:12-22) and
leans on GDAL for anything stronger; cross-collection matching is the
natural completion of that family next to :mod:`stretch` (F7).

Semantics (``match_np``, loop-oracle-gated): for each band, a source
pixel with value ``v`` maps to
``interp(cdf_src(v), cdf_ref, ref_values)`` where both CDFs are
cumulative-count fractions over VALID pixels — the standard quantile-
matching transform (monotone; exact distribution equality when the
reference CDF is continuous). NaN (nodata) pixels stay nodata.

Distributed plan — identical shape to :mod:`stretch`, run twice:

* one narrow Arrow map per collection emits bounded per-band value
  histograms (integer payloads are exact — ≤ 65536 distinct values per
  band; ``rawf32`` bins to ``N_BINS`` midpoints over the exact global
  min/max, the same dual regime as stretch);
* the per-band LUT (distinct source value → matched value) is built on
  the driver from the two merged histograms (≤ bands × 65536 entries)
  and BROADCAST;
* one narrow apply map rewrites payloads via ``searchsorted`` into the
  LUT — nothing pixel-sized ever shuffles.

Output re-types to ``rawf32`` (matched values are interpolated
reference values, generally non-integer) with the finite ``-9999``
sentinel, chainable with every cell-keyed operator.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec
from vrtility_spark.stretch import (N_BINS, _decoded, _hist_partials,
                                    _stats_input, _INT_FMTS, _SENTINEL,
                                    band_minmax)


def match_lut(src_vals: np.ndarray, src_cnts: np.ndarray,
              ref_vals: np.ndarray, ref_cnts: np.ndarray) -> np.ndarray:
    """Matched output value for each distinct source value: quantile
    positions are inclusive cumulative fractions; the reference's
    inverse CDF is linearly interpolated (skimage's transform)."""
    src_q = np.cumsum(src_cnts) / float(src_cnts.sum())
    ref_q = np.cumsum(ref_cnts) / float(ref_cnts.sum())
    return np.interp(src_q, ref_q, np.asarray(ref_vals, dtype=np.float64))


def match_np(P: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Single-mosaic twin used by the loop oracle and the constants
    generator: match NaN-masked ``(B, H, W)`` source planes against
    same-band reference planes (any H/W). Exact value histograms (no
    binning) — callers with float payloads bin first, as the
    distributed stats pass does."""
    out = np.full(P.shape, np.nan)
    for b in range(P.shape[0]):
        x = P[b][np.isfinite(P[b])]
        r = R[b][np.isfinite(R[b])]
        if x.size == 0 or r.size == 0:
            continue
        sv, sc = np.unique(x, return_counts=True)
        rv, rc = np.unique(r, return_counts=True)
        lut = match_lut(sv, sc, rv, rc)
        plane = P[b]
        m = np.isfinite(plane)
        out[b][m] = lut[np.searchsorted(sv, plane[m])]
    return out


def _collect_hist(df: DataFrame, label: str
                  ) -> tuple[dict[int, tuple], np.ndarray | None,
                             np.ndarray | None]:
    """Merged per-band ``{band: (values, counts)}`` histogram of a
    collection plus the rawf32 bin edges used (None for all-integer
    collections) — the stretch dual regime."""
    fmts = [r.fmt for r in df.select("fmt").distinct().collect()]
    unknown = [f for f in fmts if f not in _INT_FMTS + ("rawf32",)]
    if unknown:
        raise ValueError(
            f"histogram_match: unknown payload formats {unknown} in "
            f"{label} collection")
    if any(f == "rawf32" for f in fmts):
        try:
            lo, hi = band_minmax(df)
        except ValueError as e:
            raise ValueError(
                f"histogram_match: {label} collection: {e}") from e
        edges_lo, edges_w = lo, (hi - lo) / N_BINS
    else:
        edges_lo = edges_w = None
    rows = (_stats_input(df).mapInPandas(
        _hist_partials(edges_lo, edges_w),
        "band int, value double, n long")
        .groupBy("band", "value").agg(F.sum("n").alias("n"))
        .orderBy("band", "value").collect())
    if not rows:
        raise ValueError(
            f"histogram_match: no valid pixels in {label} collection")
    by_band: dict[int, list] = {}
    for r in rows:
        by_band.setdefault(int(r.band), []).append((r.value, r.n))
    if sorted(by_band) != list(range(max(by_band) + 1)):
        raise ValueError(
            f"histogram_match: {label} tiles disagree on plane count "
            "(some bands have no valid pixels anywhere); normalize "
            "band layout first")
    hist = {b: (np.array([v for v, _ in lst]),
                np.array([c for _, c in lst], dtype=np.int64))
            for b, lst in by_band.items()}
    return hist, edges_lo, edges_w


def histogram_match(df: DataFrame, ref: DataFrame) -> DataFrame:
    """Match every band of ``df``'s tiles to ``ref``'s collection-global
    per-band distribution. Both are one-row-per-tile tables; bands are
    matched by POSITION (regrid/subset to a common layout first — a
    band present in only one side raises). Output payloads are
    ``rawf32`` with the ``-9999`` sentinel; schema otherwise
    unchanged."""
    src_h, edges_lo, edges_w = _collect_hist(df, "source")
    ref_h, _, _ = _collect_hist(ref, "reference")
    if sorted(src_h) != sorted(ref_h):
        raise ValueError(
            f"histogram_match: source bands {sorted(src_h)} != "
            f"reference bands {sorted(ref_h)}; align band layouts first")
    luts = {b: (src_h[b][0],
                match_lut(src_h[b][0], src_h[b][1], *ref_h[b]))
            for b in src_h}
    # matched values ARE reference values (interpolated), so they live
    # in an unbounded range — a matched value equal to the output
    # sentinel would silently become nodata downstream; refuse loudly
    # (stretch never hits this: its outputs clamp to [0, 1])
    if any(np.any(lut == _SENTINEL) for _, lut in luts.values()):
        raise ValueError(
            f"histogram_match: a matched value equals the {_SENTINEL} "
            "output sentinel — rescale the reference collection away "
            "from the sentinel first")

    names = [f.name for f in df.schema.fields]
    out_schema = df.schema

    def apply(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples(index=False, name=None):
                d = dict(zip(pdf.columns, row))
                P = _decoded(d)
                if len(P) != len(luts):
                    raise ValueError(
                        f"histogram_match: tile has {len(P)} planes, "
                        f"stats pass saw {len(luts)}")
                out = np.full(P.shape, np.nan)
                for b in range(len(P)):
                    sv, lut = luts[b]
                    m = np.isfinite(P[b])
                    if m.any():
                        x = P[b][m]
                        if edges_lo is not None and d["fmt"] == "rawf32":
                            # bin-snap exactly as the stats pass did, so
                            # every value hits its own LUT entry
                            w_ = edges_w[b]
                            if w_ > 0:
                                bi = np.clip(
                                    ((x - edges_lo[b]) / w_)
                                    .astype(np.int64), 0, N_BINS - 1)
                                x = edges_lo[b] + (bi + 0.5) * w_
                            else:
                                x = np.full_like(x, edges_lo[b])
                        idx = np.clip(np.searchsorted(sv, x),
                                      0, len(sv) - 1)
                        out[b][m] = lut[idx]
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
